"""Edge-aware a-trous denoiser (utils/denoise.py).

Synthetic pins (passthrough, smoothing, edge preservation) plus one real
end-to-end check: a low-spp Cornell render, filtered with its own AOV
buffers, lands closer to the high-spp converged image than the raw render
does. The reference has no denoiser (noise control is spp only,
smallpt.cpp:508) — this is framework surface.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from small_pathtracer_tpu import RenderConfig, get_scene, make_camera
from small_pathtracer_tpu.integrator.wavefront import render
from small_pathtracer_tpu.utils.aov import render_aovs
from small_pathtracer_tpu.utils.denoise import denoise


def _flat_aovs(h, w, albedo=(0.6, 0.6, 0.6), depth=100.0):
    return {
        "albedo": jnp.full((h, w, 3), jnp.asarray(albedo, jnp.float32)),
        "normal": jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (h, w, 3)
        ),
        "depth": jnp.full((h, w), jnp.float32(depth)),
        "coverage": jnp.ones((h, w), jnp.float32),
    }


def test_constant_image_passthrough():
    # Constant radiance + constant features: every tap weight is equal, so
    # the normalized filter returns the input exactly (up to f32 rounding).
    h, w = 24, 32
    img = jnp.full((h, w, 3), jnp.asarray([0.3, 0.5, 0.2], jnp.float32))
    out = denoise(img, _flat_aovs(h, w), iterations=3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_flat_region_noise_reduction():
    # i.i.d. noise on a flat surface: 4 a-trous passes should cut the
    # std-dev by a large factor (a plain 5x5 B3 alone is ~3x per pass).
    h, w = 48, 64
    rng = np.random.default_rng(0)
    base = 0.5
    img = jnp.asarray(
        base + 0.1 * rng.standard_normal((h, w, 3)), jnp.float32
    )
    out = np.asarray(denoise(img, _flat_aovs(h, w), iterations=4))
    inner = out[8:-8, 8:-8]
    raw_sd = 0.1
    assert inner.std() < raw_sd / 4.0
    assert abs(inner.mean() - base) < 0.01


def test_albedo_edge_preserved():
    # Two materials (dark/bright albedo step), same illumination + noise:
    # demodulation makes the filtered signal flat, so the step survives the
    # filter exactly where the raw albedo says it is.
    h, w = 32, 64
    rng = np.random.default_rng(1)
    alb = np.full((h, w, 3), 0.25, np.float32)
    alb[:, w // 2:] = 0.75
    illum = 0.8 + 0.08 * rng.standard_normal((h, w, 3)).astype(np.float32)
    img = jnp.asarray(alb * illum)
    aovs = _flat_aovs(h, w)
    aovs["albedo"] = jnp.asarray(alb)
    out = np.asarray(denoise(img, aovs, iterations=4))
    left = out[:, : w // 2 - 2].mean()
    right = out[:, w // 2 + 2:].mean()
    np.testing.assert_allclose(left, 0.25 * 0.8, atol=0.01)
    np.testing.assert_allclose(right, 0.75 * 0.8, atol=0.01)


def test_depth_silhouette_preserved():
    # Same albedo both sides but a depth step (silhouette): the depth stop
    # must keep the two illumination levels from bleeding across.
    h, w = 32, 64
    img_np = np.full((h, w, 3), 0.2, np.float32)
    img_np[:, w // 2:] = 0.8
    aovs = _flat_aovs(h, w)
    dep = np.full((h, w), 50.0, np.float32)
    dep[:, w // 2:] = 200.0
    aovs["depth"] = jnp.asarray(dep)
    out = np.asarray(denoise(jnp.asarray(img_np), aovs, iterations=4))
    assert abs(out[:, : w // 2 - 4].mean() - 0.2) < 0.02
    assert abs(out[:, w // 2 + 4:].mean() - 0.8) < 0.02


def test_render_mse_improvement():
    # End to end: a 4-spp Cornell render + its own AOVs, filtered, must
    # (a) beat the raw 4-spp render against a 128-spp target by >= 1.8x in
    # MSE and (b) beat a raw 12-spp render (3x the sample budget) outright.
    # (Measured: ~2.0x / raw-32-spp-equivalent at 96x72; the margin here is
    # slack for this 48x36 CI size where structure sits at pixel scale.)
    w, h = 48, 36
    scene, cam = get_scene("cornell_box"), make_camera(aspect=w / h)
    noisy, _ = render(scene, cam, RenderConfig(width=w, height=h, spp=4))
    mid, _ = render(
        scene, cam, RenderConfig(width=w, height=h, spp=12, seed=3)
    )
    target, _ = render(
        scene, cam, RenderConfig(width=w, height=h, spp=128, seed=7)
    )
    aovs = render_aovs(scene, cam, RenderConfig(width=w, height=h, spp=4))
    den = jnp.clip(denoise(noisy, aovs), 0.0, 1.0)
    mse_raw = float(jnp.mean((noisy - target) ** 2))
    mse_mid = float(jnp.mean((mid - target) ** 2))
    mse_den = float(jnp.mean((den - target) ** 2))
    assert mse_den < mse_raw / 1.8, (mse_raw, mse_den)
    assert mse_den < mse_mid, (mse_mid, mse_den)
