"""Voxel path-guiding demo (experiment/path_guiding.py): the reference's
RL state-space idea closed into an actual variance reduction.

Scene: a small-light Cornell variant (light area 1/13th, emission scaled
to keep power) — the regime where cosine sampling wastes most samples and
directional guiding pays."""

import numpy as np
import pytest

import jax.numpy as jnp

import small_pathtracer_tpu as spt
from small_pathtracer_tpu.experiment.path_guiding import (
    N_VOXELS,
    guide_lobes,
    render_guided,
    train_guide,
    voxel_id,
)

N_BOUNCES = 8


@pytest.fixture(scope="module")
def small_light_scene():
    s = spt.get_scene("cornell_box")
    lo = s.rects.lo.at[6].set(jnp.asarray([45.0, 75.0]))
    hi = s.rects.hi.at[6].set(jnp.asarray([55.0, 85.0]))
    emi = s.rects.emission.at[6].set(jnp.asarray([120.0, 120.0, 120.0]))
    return s._replace(
        rects=s.rects._replace(lo=lo, hi=hi, emission=emi),
        light=s.light._replace(
            corner=jnp.asarray([45.0, 81.5, 75.0], jnp.float32),
            edge_u=jnp.asarray([10.0, 0.0, 0.0], jnp.float32),
            edge_v=jnp.asarray([0.0, 0.0, 10.0], jnp.float32),
        ),
    )


@pytest.fixture(scope="module")
def cam():
    return spt.make_camera(aspect=32 / 24)


def test_voxel_id_grid():
    x = jnp.asarray([[0.0, -1.0, -1.0], [99.9, 84.9, 170.9], [50.0, 40.0, 80.0]])
    v = np.asarray(voxel_id(x))
    assert v[0] == 0
    assert v[1] == N_VOXELS - 1
    assert 0 <= v[2] < N_VOXELS


def test_guide_trains_toward_light(small_light_scene, cam):
    cfg = spt.RenderConfig(width=32, height=24, spp=8, estimator="cosine",
                           seed=3)
    m = train_guide(small_light_scene, cam, cfg, N_BOUNCES, jnp.uint32(3))
    mu, use = guide_lobes(m)
    assert int(use.sum()) > 10, int(use.sum())
    # Floor-region voxels must point UP (+y): the light is overhead.
    floor = jnp.asarray([[50.0, 2.0, 80.0], [30.0, 2.0, 70.0]])
    vids = voxel_id(floor)
    for v in np.asarray(vids):
        if bool(use[v]):
            assert float(mu[v, 1]) > 0.5, np.asarray(mu[v])


def test_guided_nee_matches_textbook_with_empty_guide(cam):
    """With an EMPTY guide table the guided-NEE estimator must reduce to
    the wavefront's nee_textbook exactly (the mixture weight is x/x == 1
    wherever no lobe exists): same draws, same shadow rays, same pickup
    suppression. Float-order tolerance only."""
    from small_pathtracer_tpu.integrator.wavefront import (
        _chunk_paths,
        path_trace_fixed,
    )

    s = spt.get_scene("cornell_box")
    cfg = spt.RenderConfig(width=32, height=24, spp=16,
                           estimator="nee_textbook", seed=5)
    empty = (jnp.zeros((N_VOXELS, 3)), jnp.zeros((N_VOXELS,), bool))
    g = np.asarray(render_guided(s, cam, cfg, jnp.uint32(5), empty,
                                 N_BOUNCES, 0.9, 16.0, estimator="nee"))
    o, d, pid = _chunk_paths(cam, cfg, jnp.uint32(5), jnp.uint32(0), cfg.spp)
    L, _ = path_trace_fixed(s, cfg, jnp.uint32(5), o, d, pid, N_BOUNCES)
    w = np.asarray(
        L.reshape(24 * 32, 16, 3).mean(axis=1).reshape(24, 32, 3)
    )
    assert np.abs(g - w).max() < 1e-4, np.abs(g - w).max()


def test_guided_spec_refr_unbiased(cam):
    """Mixed-material scene (mirror + glass spheres): the guide trains
    through specular chains and the guided render's high-spp mean sits on
    the plain-cosine ensemble mean."""
    from small_pathtracer_tpu.grad.adjoint import render_linear

    s = spt.get_scene("smallpt_original")

    def cfgf(spp, seed):
        return spt.RenderConfig(width=32, height=24, spp=spp,
                                estimator="cosine", seed=seed)

    m = train_guide(s, cam, cfgf(16, 3), N_BOUNCES, jnp.uint32(3))
    guide = guide_lobes(m)
    refs = [
        np.asarray(render_linear(s, cam, cfgf(128, sd), jnp.uint32(sd),
                                 N_BOUNCES))
        for sd in (301, 302, 303, 304)
    ]
    ref_means = np.stack([r.mean(axis=(0, 1)) for r in refs])
    tol = 4.0 * ref_means.std(axis=0, ddof=1) + 2e-3
    gui = np.asarray(
        render_guided(s, cam, cfgf(128, 305), jnp.uint32(305), guide,
                      N_BOUNCES, 0.5, 8.0)
    )
    d = np.abs(gui.mean(axis=(0, 1)) - ref_means.mean(axis=0))
    assert np.all(d < tol), (d, tol)


def test_guided_nee_cuts_direct_variance(small_light_scene, cam):
    """estimator='nee' (shadow-ray NEE + guided continuation) must crush
    the small-light variance relative to guided continuation alone — the
    direct term dominates this scene's energy."""
    scene = small_light_scene

    def cfgf(spp, seed):
        return spt.RenderConfig(width=32, height=24, spp=spp, seed=seed)

    m = train_guide(scene, cam, cfgf(16, 11), N_BOUNCES, jnp.uint32(11))
    guide = guide_lobes(m)
    ref = np.clip(np.asarray(
        render_guided(scene, cam, cfgf(512, 400), jnp.uint32(400), guide,
                      N_BOUNCES, 0.5, 8.0, estimator="nee")), 0, 1)
    mse_cos, mse_nee = [], []
    for sd in (31, 32, 33):
        c = np.clip(np.asarray(
            render_guided(scene, cam, cfgf(8, sd), jnp.uint32(sd), guide,
                          N_BOUNCES, 0.9, 16.0)), 0, 1)
        ne = np.clip(np.asarray(
            render_guided(scene, cam, cfgf(8, sd), jnp.uint32(sd), guide,
                          N_BOUNCES, 0.9, 16.0, estimator="nee")), 0, 1)
        mse_cos.append(((c - ref) ** 2).mean())
        mse_nee.append(((ne - ref) ** 2).mean())
    ratio = float(np.mean(mse_nee) / np.mean(mse_cos))
    assert ratio < 0.5, (ratio, mse_nee, mse_cos)


def test_guided_unbiased_and_lower_variance(small_light_scene, cam):
    """Measured in the pilot: clamped-MSE ratio ~0.80 over 6 seeds at
    beta=0.9, k=16 (the unclamped metric is firefly-dominated on this
    120-emission small light and too noisy to compare at test sizes; the
    clamp is also the display-referred C3 contract). Unbiasedness: the
    256-spp guided mean sits within the cosine reference ensemble's own
    seed spread."""
    from small_pathtracer_tpu.grad.adjoint import render_linear

    scene = small_light_scene

    def cfgf(spp, seed):
        return spt.RenderConfig(width=32, height=24, spp=spp,
                                estimator="cosine", seed=seed)

    refs = [
        np.asarray(render_linear(scene, cam, cfgf(256, sd),
                                 jnp.uint32(sd), N_BOUNCES))
        for sd in (101, 102, 103, 104)
    ]
    ref = np.clip(np.mean(refs, axis=0), 0, 1)
    m = train_guide(scene, cam, cfgf(16, 11), N_BOUNCES, jnp.uint32(11))
    guide = guide_lobes(m)

    mse_cos, mse_gui = [], []
    for sd in (5, 6, 7, 8, 9, 10):
        c = np.clip(np.asarray(
            render_linear(scene, cam, cfgf(16, sd), jnp.uint32(sd),
                          N_BOUNCES)), 0, 1)
        g = np.clip(np.asarray(
            render_guided(scene, cam, cfgf(16, sd), jnp.uint32(sd), guide,
                          N_BOUNCES, 0.9, 16.0)), 0, 1)
        mse_cos.append(((c - ref) ** 2).mean())
        mse_gui.append(((g - ref) ** 2).mean())
    ratio = float(np.mean(mse_gui) / np.mean(mse_cos))
    assert ratio < 0.92, (ratio, mse_gui, mse_cos)

    # Unbiasedness: high-spp GUIDED channel means within the combined
    # seed spread. The tolerance pools the cosine ensemble's spread with
    # the guided estimator's OWN 2-seed spread — at beta=0.9/k=16 the
    # guided render's channel-mean variance is not smaller than the
    # cosine ensemble's (the aggressive mixture reweighting trades where
    # the variance lives), so the old cosine-only tolerance was a
    # mis-specified statistic, not a bias detector.
    ref_means = np.stack([r.mean(axis=(0, 1)) for r in refs])
    gui_means = np.stack([
        np.asarray(
            render_guided(scene, cam, cfgf(256, sd), jnp.uint32(sd),
                          guide, N_BOUNCES, 0.9, 16.0)
        ).mean(axis=(0, 1))
        for sd in (201, 202)
    ])
    spread = np.sqrt(
        ref_means.std(axis=0, ddof=1) ** 2
        + gui_means.std(axis=0, ddof=1) ** 2
    )
    tol = 4.0 * spread + 1e-3
    d = np.abs(gui_means.mean(axis=0) - ref_means.mean(axis=0))
    assert np.all(d < tol), (d, tol)
