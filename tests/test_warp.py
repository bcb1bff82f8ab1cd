"""Screen-space warp camera gradients (grad/warp.py).

Three validation layers, each pinning exactly what the module claims
(see its docstring's "Validation status"): the flow Jacobian is exact;
the per-pixel warp prediction matches sub-pixel FD image changes; and
the loss gradient's SIGNS match FD for a common-random-numbers pose
target — the descent signal the pathwise adjoint provably lacks
(test_grad.py::test_camera_translation_grad_is_interior_only)."""

import numpy as np
import pytest

import jax.numpy as jnp

from small_pathtracer_tpu import RenderConfig, get_scene, make_camera
from small_pathtracer_tpu.grad.adjoint import mse_loss, render_linear
from small_pathtracer_tpu.grad import warp as wp

W, H, N = 48, 36, 8
CFG = RenderConfig(width=W, height=H, spp=96, estimator="nee", seed=3)


@pytest.fixture(scope="module")
def scene():
    return get_scene("cornell_box")


@pytest.fixture(scope="module")
def cam():
    return make_camera(aspect=W / H)


def test_flow_jacobian_exact(cam):
    """Closed-form d(s,t)/d(origin) == numeric FD of the projection solve
    (the frustum-pivot parameterization: lower_left fixed)."""
    L = np.asarray(cam.lower_left, np.float64)
    Hv = np.asarray(cam.horizontal, np.float64)
    V = np.asarray(cam.vertical, np.float64)
    o0 = np.asarray(cam.origin, np.float64)

    def film(X, o):
        M = np.stack([L - o, Hv, V], axis=1)
        y = np.linalg.solve(M, X - o)
        return y[1] / y[0], y[2] / y[0], y[0]

    for X in (np.array([50.0, 0.0, 80.0]), np.array([20.0, 40.0, 30.0]),
              np.array([80.0, 70.0, 120.0])):
        s0, t0, lam = film(X, o0)
        D = (L - o0) + s0 * Hv + t0 * V
        Dj = jnp.asarray(D, jnp.float32)[None]
        ds, dt = wp._flow_jacobian(
            cam, Dj, jnp.asarray([lam], jnp.float32),
            jnp.ones((1,), jnp.bool_),
        )
        for ax in range(3):
            e = np.zeros(3)
            e[ax] = 1e-4
            sp, tp, _ = film(X, o0 + e)
            sm, tm, _ = film(X, o0 - e)
            np.testing.assert_allclose(
                float(ds[0, ax]), (sp - sm) / 2e-4, rtol=1e-3, atol=1e-5
            )
            np.testing.assert_allclose(
                float(dt[0, ax]), (tp - tm) / 2e-4, rtol=1e-3, atol=1e-5
            )


def test_warp_predicts_subpixel_image_change(scene, cam):
    """Predicted per-pixel dI/d(origin) (screen gradients x flow) vs FD of
    the actual render at SUB-PIXEL shifts (eps 0.02 world units ~ 0.5 px;
    larger shifts leave the linearization's validity). Measured corr:
    0.93 lateral (axis 0) and 0.88 dolly (axis 2) at 48x36 — the dolly
    flow is radial/depth-dependent and degrades at coarser resolutions
    (0.53 at 40x30), so the config here is part of the pin."""
    img0 = render_linear(scene, cam, CFG, jnp.uint32(3), N)
    D, lam, hm = wp._primary_points(scene, cam, CFG)
    ds_do, dt_do = wp._flow_jacobian(cam, D, lam, hm)
    dI_ds, dI_dt = wp._screen_gradients(img0)
    for axis in (0, 2):
        e = np.zeros(3, np.float32)
        e[axis] = 0.02
        cp = cam._replace(origin=cam.origin + jnp.asarray(e))
        cm = cam._replace(origin=cam.origin - jnp.asarray(e))
        dI_fd = (
            render_linear(scene, cp, CFG, jnp.uint32(3), N)
            - render_linear(scene, cm, CFG, jnp.uint32(3), N)
        ) / 0.04
        pred = -(
            dI_ds * ds_do[:, axis].reshape(H, W, 1)
            + dI_dt * dt_do[:, axis].reshape(H, W, 1)
        )
        a = np.asarray(dI_fd).ravel()
        b = np.asarray(pred).ravel()
        corr = np.corrcoef(a, b)[0, 1]
        assert corr > (0.8 if axis == 0 else 0.72), (axis, corr)


def test_warp_loss_gradient_matches_fd_direction(scene, cam):
    """Pose-target loss (same seed both sides — common random numbers) at
    a SMALL offset (0.3, 0.2, -0.4 — within the few-pixel linear range):
    the warp gradient points along the FD gradient (measured cosine 0.94;
    the dominant lateral axis agrees to ~1%, the dolly axis to ~2x) —
    a usable descent direction where pathwise AD measured ~0. Beyond the
    linear range (tens of pixels) weak axes lose their sign — documented
    in grad/warp.py; pose fitting there needs coarse-to-fine."""
    true_delta = jnp.asarray([0.3, 0.2, -0.4], jnp.float32)
    cam_star = cam._replace(origin=cam.origin + true_delta)
    target = render_linear(scene, cam_star, CFG, jnp.uint32(3), N)

    def loss(d):
        c = cam._replace(origin=cam.origin + d)
        return mse_loss(render_linear(scene, c, CFG, jnp.uint32(3), N),
                        target)

    img = render_linear(scene, cam, CFG, jnp.uint32(3), N)
    g_img = 2.0 * (img - target) / img.size
    gw = np.asarray(wp.camera_origin_warp_grad(scene, cam, CFG, img, g_img))
    fd = np.zeros(3)
    for axis in range(3):
        e = np.zeros(3, np.float32)
        e[axis] = 0.02
        fd[axis] = (
            float(loss(jnp.asarray(e))) - float(loss(jnp.asarray(-e)))
        ) / 0.04
    cos = float(gw @ fd / (np.linalg.norm(gw) * np.linalg.norm(fd)))
    assert cos > 0.85, (cos, gw, fd)
    # Dominant (lateral) axis agrees quantitatively.
    assert abs(gw[0] - fd[0]) < 0.25 * abs(fd[0]), (gw[0], fd[0])
