"""Pixel-gradient parity vs the compiled C++ reference (BASELINE.json north
star: "image + pixel-gradient allclose vs C++ ref").

The reference has no AD; its pixel-gradients are central finite differences
of the patched oracle (oracle_harness overrides: light emission
smallpt.cpp:294, wall albedo :291, sphere center :297). Each test compares
a derivative of the mean linear image:

- emission, albedo: oracle central FD (common random numbers per seed,
  ensemble over seeds) vs ``jax.grad`` through ``render_linear`` — the
  parameters whose pathwise derivative is exact (grad/adjoint.py).
- sphere center: oracle FD vs OUR FD at the same offsets. Geometry FD
  includes the visibility-discontinuity (silhouette) term on both sides,
  so this validates the forward model's full geometry dependence; the
  pathwise AD intentionally omits that term (module docstring of
  grad/adjoint.py) and is checked against FD separately in test_grad.py /
  test_soft.py.

Slow (first run): ~24 oracle builds + several scan-path AD compiles; all
oracle renders cache in tests/_oracle_cache.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent))
import oracle_harness as oh

pytestmark = pytest.mark.skipif(
    not oh.available(), reason="C++ oracle unavailable"
)

W = H = 64
SPP_O = 64          # oracle spp per render
SEEDS = (1, 2, 3, 4)
EPS = 1e-3          # self-hit patch (see test_parity.py)
N_BOUNCES = 24


def _cfg(spp=64):
    import small_pathtracer_tpu as spt

    return spt.RenderConfig(width=W, height=H, spp=spp, estimator="nee")


def _oracle_fd(param: str, lo, hi, scale: float, scene: str = "box"):
    """Per-seed central FD of the mean UNCLAMPED image wrt the parameter;
    returns (mean, stderr) over the seed ensemble. Same srand/Xi streams on
    both sides of each seed (common random numbers)."""
    fds = []
    for s in SEEDS:
        p = oh.render_oracle(W, H, SPP_O, seed=s, estimator="nee",
                             self_hit_eps=EPS, scene=scene,
                             overrides={param: hi}, linear=True)
        m = oh.render_oracle(W, H, SPP_O, seed=s, estimator="nee",
                             self_hit_eps=EPS, scene=scene,
                             overrides={param: lo}, linear=True)
        fds.append((p.mean() - m.mean()) / scale)
    fds = np.asarray(fds)
    return float(fds.mean()), float(fds.std(ddof=1) / np.sqrt(len(fds)))


def test_emission_gradient_vs_oracle():
    """d(mean image)/d(emission scale): oracle FD vs jax.grad. The image is
    exactly linear in the light emission (paths terminate at the light, C13),
    so the FD has no curvature error — the only disagreement allowed is
    MC noise between the two RNG streams."""
    import small_pathtracer_tpu as spt
    from small_pathtracer_tpu.grad.adjoint import render_linear

    scene = spt.get_scene("cornell_box")
    cam = spt.make_camera()
    cfg = _cfg()

    def f(s, seed):
        sc = scene._replace(
            rects=scene.rects._replace(emission=scene.rects.emission * s)
        )
        return render_linear(sc, cam, cfg, jnp.uint32(seed), N_BOUNCES).mean()

    g_ad = float(jax.grad(f)(1.0, 7))
    # Internal consistency: linearity => d mean/ds == mean at s=1 (up to
    # f32 accumulation-order differences between forward and reverse).
    np.testing.assert_allclose(g_ad, float(f(1.0, 7)), rtol=1e-3)

    # Oracle: E = 12*(1 +- 0.5) -> d/ds with ds = 1.0.
    fd_mean, fd_se = _oracle_fd("light_emission", 6.0, 18.0, 1.0)
    # AD's own MC error, estimated from two seeds.
    g2 = float(jax.grad(f)(1.0, 8))
    ad_se = abs(g_ad - g2) / np.sqrt(2)
    tol = 4.0 * np.sqrt(fd_se**2 + ad_se**2) + 0.01 * abs(fd_mean)
    assert abs(g_ad - fd_mean) < tol, (g_ad, fd_mean, tol)


def test_albedo_gradient_vs_oracle():
    """d(mean image)/d(right-wall-albedo scale) — the pathwise throughput
    chain (T *= albedo/p with RR compensation) vs oracle FD."""
    import small_pathtracer_tpu as spt
    from small_pathtracer_tpu.grad.adjoint import render_linear

    scene = spt.get_scene("cornell_box")
    cam = spt.make_camera()
    cfg = _cfg()
    base = np.asarray(scene.rects.albedo)

    def f(s, seed):
        alb = scene.rects.albedo.at[3].set(
            jnp.asarray(base[3], jnp.float32) * s
        )
        sc = scene._replace(rects=scene.rects._replace(albedo=alb))
        return render_linear(sc, cam, cfg, jnp.uint32(seed), N_BOUNCES).mean()

    g_ad = float(jax.grad(f)(1.0, 7))
    g2 = float(jax.grad(f)(1.0, 8))
    ad_se = abs(g_ad - g2) / np.sqrt(2)

    # Oracle: right wall albedo (.75,.25,.25) * (1 +- 0.1) -> ds = 0.2.
    fd_mean, fd_se = _oracle_fd(
        "right_albedo",
        tuple(float(v) for v in base[3] * 0.9),
        tuple(float(v) for v in base[3] * 1.1),
        0.2,
    )
    assert fd_mean > 0 and g_ad > 0, (fd_mean, g_ad)
    tol = 4.0 * np.sqrt(fd_se**2 + ad_se**2) + 0.05 * abs(fd_mean)
    assert abs(g_ad - fd_mean) < tol, (g_ad, fd_mean, fd_se, ad_se, tol)


def test_sphere_center_fd_vs_oracle_fd():
    """d(mean image)/d(sphere0 center x) on the sphere scene: oracle FD vs
    our FD at the same +-1.0 offsets (both include the silhouette term)."""
    import small_pathtracer_tpu as spt
    from small_pathtracer_tpu.grad.adjoint import render_linear

    scene = spt.get_scene("cornell_spheres")
    cam = spt.make_camera()
    cfg = _cfg()
    c0 = np.asarray(scene.spheres.center)  # (2, 3); sphere0 = (27,16.5,47)

    def mean_img(cx, seed):
        ctr = scene.spheres.center.at[0, 0].set(cx)
        sc = scene._replace(spheres=scene.spheres._replace(center=ctr))
        return float(
            render_linear(sc, cam, cfg, jnp.uint32(seed), N_BOUNCES).mean()
        )

    ours = []
    for seed in (7, 8, 9, 10):
        ours.append((mean_img(28.0, seed) - mean_img(26.0, seed)) / 2.0)
    ours = np.asarray(ours)
    our_mean = float(ours.mean())
    our_se = float(ours.std(ddof=1) / np.sqrt(len(ours)))

    fd_mean, fd_se = _oracle_fd(
        "sphere0_center", (26.0, 16.5, 47.0), (28.0, 16.5, 47.0), 2.0,
        scene="spheres",
    )
    tol = 4.0 * np.sqrt(fd_se**2 + our_se**2) + 0.1 * abs(fd_mean)
    assert abs(our_mean - fd_mean) < tol, (
        our_mean, our_se, fd_mean, fd_se, tol
    )
