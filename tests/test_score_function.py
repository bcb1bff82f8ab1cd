"""Score-function gradient validation (grad/score.py).

Setup chosen to make the pathwise gradient provably ZERO: cosine estimator
with RR active from depth 0 — then throughput f = albedo/p_max is scale-
invariant in a global albedo multiplier, so ALL of dE[f]/dscale flows
through the discrete survival decisions. The SF estimator must recover it
(validated against a finite difference of the seed-averaged render)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import small_pathtracer_tpu as spt
from small_pathtracer_tpu.grad.adjoint import render_linear
from small_pathtracer_tpu.grad.score import render_linear_sf

CFG = spt.RenderConfig(width=8, height=6, spp=2, estimator="cosine",
                       seed=0, rr_start_depth=0)
NB = 16
K = 256
EPS = 0.08


@pytest.fixture(scope="module")
def fns():
    scene0 = spt.get_scene("cornell_box")
    cam = spt.make_camera(aspect=8 / 6)

    def scaled(s):
        return scene0._replace(
            rects=scene0.rects._replace(albedo=scene0.rects.albedo * s)
        )

    @jax.jit
    def f(s, seed):
        return render_linear(scaled(s), cam, CFG, seed, NB).sum()

    @jax.jit
    def f_sf(s, seed):
        return render_linear_sf(scaled(s), cam, CFG, seed, NB).sum()

    return f, jax.jit(jax.grad(f)), jax.jit(jax.grad(f_sf))


def test_score_function_recovers_rr_gradient(fns):
    f, g_plain, g_sf = fns
    one = jnp.float32(1.0)
    seeds = [jnp.uint32(i + 1) for i in range(K)]
    fd = np.mean([
        (float(f(jnp.float32(1 + EPS), s)) - float(f(jnp.float32(1 - EPS), s)))
        / (2 * EPS)
        for s in seeds
    ])
    gp = np.mean([float(g_plain(one, s)) for s in seeds])
    gs = np.mean([float(g_sf(one, s)) for s in seeds])
    assert fd > 50  # the true gradient is large
    # Pathwise alone is blind to it (f = albedo/p cancels the scale).
    assert abs(gp) < 0.1 * fd, (gp, fd)
    # Score-function recovers it (tolerance covers FD curvature + MC noise).
    assert gs == pytest.approx(fd, rel=0.25), (gs, fd)


def test_sf_forward_value_unchanged():
    """The surrogate's VALUE must equal the plain render exactly."""
    scene = spt.get_scene("cornell_box")
    cam = spt.make_camera(aspect=8 / 6)
    a = render_linear(scene, cam, CFG, jnp.uint32(3), NB)
    b = render_linear_sf(scene, cam, CFG, jnp.uint32(3), NB)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
