"""Adjoint-pass tests (SURVEY.md section 4.3, "Gradient tests").

Finite-difference vs AD on a deterministic (fixed-seed) low-spp render.
Material/emission parameters have exact reparameterized gradients along fixed
paths; geometry parameters omit the silhouette term (documented in
grad/adjoint.py), so those only get existence/finiteness checks here.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from small_pathtracer_tpu import RenderConfig, get_scene, make_camera
from small_pathtracer_tpu.grad.adjoint import (
    loss_and_grads,
    make_sharded_train_step,
    mse_loss,
    render_linear,
)
from small_pathtracer_tpu.parallel.mesh import make_mesh

CFG = RenderConfig(width=16, height=12, spp=4, estimator="nee", seed=11)
N_BOUNCES = 8
SEED = jnp.uint32(11)


@pytest.fixture(scope="module")
def scene():
    return get_scene("cornell_box")


@pytest.fixture(scope="module")
def cam():
    return make_camera(aspect=CFG.width / CFG.height)


@pytest.fixture(scope="module")
def target(scene, cam):
    # Target = render at a perturbed emission, so the loss is non-trivial.
    bright = scene._replace(
        rects=scene.rects._replace(emission=scene.rects.emission * 1.5)
    )
    return render_linear(bright, cam, CFG, SEED, N_BOUNCES)


def _loss_at(scene, cam, target, emission_scale):
    s = scene._replace(
        rects=scene.rects._replace(
            emission=scene.rects.emission * emission_scale
        )
    )
    img = render_linear(s, cam, CFG, SEED, N_BOUNCES)
    return float(mse_loss(img, target))


def test_emission_grad_matches_fd(scene, cam, target):
    """d loss / d (emission scale): emission enters radiance linearly along
    fixed paths, so AD must match FD tightly."""

    def loss_fn(scale):
        s = scene._replace(
            rects=scene.rects._replace(emission=scene.rects.emission * scale)
        )
        img = render_linear(s, cam, CFG, SEED, N_BOUNCES)
        return mse_loss(img, target)

    g_ad = float(jax.grad(loss_fn)(jnp.float32(1.0)))
    eps = 1e-2
    g_fd = (_loss_at(scene, cam, target, 1.0 + eps)
            - _loss_at(scene, cam, target, 1.0 - eps)) / (2 * eps)
    assert g_fd == pytest.approx(g_ad, rel=2e-2, abs=1e-7)


def test_albedo_grad_matches_fd(scene, cam, target):
    def loss_fn(scale):
        s = scene._replace(
            rects=scene.rects._replace(albedo=scene.rects.albedo * scale)
        )
        img = render_linear(s, cam, CFG, SEED, N_BOUNCES)
        return mse_loss(img, target)

    g_ad = float(jax.grad(loss_fn)(jnp.float32(1.0)))
    eps = 5e-3
    deltas = []
    for sgn in (1.0, -1.0):
        s = scene._replace(
            rects=scene.rects._replace(albedo=scene.rects.albedo * (1 + sgn * eps))
        )
        deltas.append(float(mse_loss(render_linear(s, cam, CFG, SEED, N_BOUNCES), target)))
    g_fd = (deltas[0] - deltas[1]) / (2 * eps)
    # Albedo also moves RR thresholds; allow a looser tolerance.
    assert g_fd == pytest.approx(g_ad, rel=5e-2, abs=1e-6)


def test_full_scene_camera_grads_finite(scene, cam, target):
    loss, (g_scene, g_cam) = loss_and_grads(
        scene, cam, CFG, SEED, target, N_BOUNCES
    )
    assert np.isfinite(float(loss))
    for leaf in jax.tree.leaves(g_scene) + jax.tree.leaves(g_cam):
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f":
            assert np.all(np.isfinite(arr)), arr
    # Emission gradient on the light (object 6) must be nonzero.
    assert np.abs(np.asarray(g_scene.rects.emission)[6]).max() > 0


def test_camera_translation_grad_is_interior_only(scene, cam, target):
    """Pins the documented limitation (grad/adjoint.py docstring): the
    pathwise camera-ORIGIN gradient omits the edge-advection term, which
    DOMINATES camera sensitivity (moving the camera sweeps object edges
    across pixels; smooth-region shading barely changes). Measured: FD ~13
    vs AD ~-0.04 on the box scene. Asserted so the finite camera
    cotangents are never mistaken for usable translation gradients —
    train steps freeze the camera by default (train_cam=False)."""
    from small_pathtracer_tpu.grad.adjoint import mse_loss, render_linear

    def loss(dy):
        c2 = cam._replace(origin=cam.origin.at[1].add(dy))
        return mse_loss(
            render_linear(scene, c2, CFG, SEED, N_BOUNCES), target
        )

    g_ad = float(jax.grad(loss)(0.0))
    eps = 1e-2
    g_fd = (float(loss(eps)) - float(loss(-eps))) / (2 * eps)
    assert np.isfinite(g_ad)
    # The edge term FD sees is an order of magnitude beyond pathwise AD.
    assert abs(g_fd) > 10.0 * abs(g_ad), (g_fd, g_ad)


def test_sphere_center_grad_exists():
    scene = get_scene("cornell_spheres")
    cam = make_camera(aspect=CFG.width / CFG.height)
    target = render_linear(scene, cam, CFG, SEED, N_BOUNCES) * 0.9

    def loss_fn(center):
        s = scene._replace(spheres=scene.spheres._replace(center=center))
        return mse_loss(render_linear(s, cam, CFG, SEED, N_BOUNCES), target)

    g = np.asarray(jax.grad(loss_fn)(scene.spheres.center))
    assert np.all(np.isfinite(g))
    assert np.abs(g).max() > 0


def test_sharded_train_step_decreases_loss(scene, cam, target):
    mesh = make_mesh(mesh_shape=(4, 2))
    step = make_sharded_train_step(
        CFG, mesh, target, N_BOUNCES, lr=10.0, train_fields=("emission",)
    )
    losses = []
    s, c = scene, cam
    for _ in range(6):
        loss, s, c = step(s, c, SEED)
        losses.append(float(loss))
    assert losses[-1] < 0.5 * losses[0]


def test_sharded_grads_match_single_device(scene, cam, target):
    """Scene gradients must be invariant to the mesh (psum transpose test)."""
    from small_pathtracer_tpu.grad.adjoint import render_linear_sharded

    def loss_single(sc):
        return mse_loss(render_linear(sc, cam, CFG, SEED, N_BOUNCES), target)

    def loss_sharded(sc, mesh):
        img = render_linear_sharded(sc, cam, CFG, SEED, mesh, N_BOUNCES)
        return mse_loss(img, jnp.asarray(target).reshape(-1, 3))

    # NB: the grad of a shard_map must itself be jitted — eager transpose
    # trips an XLA sharding-override assert in jax 0.9.
    g1 = jax.grad(loss_single, allow_int=True)(scene)
    g2 = jax.jit(
        jax.grad(
            lambda sc: loss_sharded(sc, make_mesh(mesh_shape=(2, 4))),
            allow_int=True,
        )
    )(scene)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype.kind == "f":
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-7)


def test_adam_train_step_converges(scene, cam, target):
    from small_pathtracer_tpu.grad.adjoint import (
        make_sharded_train_step_with_state,
    )

    mesh = make_mesh(mesh_shape=(4, 2))
    init, step = make_sharded_train_step_with_state(
        CFG, mesh, target, N_BOUNCES, lr=0.5,
        train_fields=("emission",), optimizer="adam",
    )
    st = init(scene)
    s = scene
    losses = []
    for _ in range(12):
        loss, s, st = step(s, cam, SEED, st)
        losses.append(float(loss))
    assert losses[-1] < 0.3 * losses[0]
    # Integer leaves untouched.
    np.testing.assert_array_equal(
        np.asarray(s.rects.refl), np.asarray(scene.rects.refl)
    )
    # FROZEN float fields must be bit-unchanged (regression: optax.masked
    # alone passes raw gradients through for mask-False leaves — unscaled
    # gradient ASCENT on supposedly frozen params).
    np.testing.assert_array_equal(
        np.asarray(s.rects.albedo), np.asarray(scene.rects.albedo)
    )
    np.testing.assert_array_equal(
        np.asarray(s.rects.k), np.asarray(scene.rects.k)
    )


def test_emission_grad_nee_textbook_matches_fd(scene, cam):
    """The unbiased NEE estimator is differentiable too: emission enters
    both the pickup and the shadow-ray direct term linearly, so AD == FD."""
    import dataclasses

    cfg = dataclasses.replace(CFG, estimator="nee_textbook")
    target = render_linear(scene, cam, cfg, SEED, N_BOUNCES) * 1.3

    def loss_fn(scale):
        s = scene._replace(
            rects=scene.rects._replace(emission=scene.rects.emission * scale)
        )
        return mse_loss(render_linear(s, cam, cfg, SEED, N_BOUNCES), target)

    g_ad = float(jax.grad(loss_fn)(jnp.float32(1.0)))
    eps = 1e-2
    g_fd = (float(loss_fn(jnp.float32(1 + eps)))
            - float(loss_fn(jnp.float32(1 - eps)))) / (2 * eps)
    assert g_fd == pytest.approx(g_ad, rel=2e-2, abs=1e-7)
