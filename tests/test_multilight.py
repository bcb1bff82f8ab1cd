"""Multi-emitter light-list NEE (scene/types.LightList).

The reference's explicit light sampling is hard-wired to ONE light (the
success test ``id == 6``, /root/reference/src/smallpt.cpp:467). The light
list generalizes C13: draw light k ~ q (uniform or power heuristic), sample
the chosen parallelogram, divide the NEE weight by q_k — unbiased for the
sum of direct light over the list.

Checks:
- degeneracy: a 1-element light list renders BITWISE identically to the
  plain single-light path (q=1, same draw streams);
- unbiasedness: on the two-light preset, nee_textbook (textbook-unbiased)
  must agree with plain cosine (no light sampling at all) at MC tolerance,
  for both selection modes;
- selection statistics: the P_LIGHT_SEL draw hits each light at its q_k
  frequency (chi-square level);
- the C13 continuation estimator stays darker-by-construction (its known
  indirect-drop bias, test_parity.test_estimator_cross_consistency) rather
  than collapsing or exploding;
- guards: glibc_overflow light mode and the single-light-only consumers
  (megakernel, soft_render) reject light-list scenes loudly.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import small_pathtracer_tpu as spt
from small_pathtracer_tpu.config import RenderConfig
from small_pathtracer_tpu.integrator import sampling
from small_pathtracer_tpu.integrator.wavefront import render
from small_pathtracer_tpu.scene.types import LightList, object_arrays


@pytest.fixture(scope="module")
def twolights():
    return spt.get_scene("cornell_twolights")


@pytest.fixture(scope="module")
def cam():
    return spt.make_camera(aspect=1.0)


def _mean_img(scene, cam, est, seed, spp=96, sel="power"):
    cfg = RenderConfig(
        width=24, height=24, spp=spp, estimator=est, seed=seed,
        max_bounces=48, light_select=sel,
    )
    img, _ = render(scene, cam, cfg)
    return np.asarray(img)


def test_single_light_list_degenerates(cam):
    """K=1 list == no list at statistical level: q=1 so the weight division
    is exact and the point-sampling draws are the same counters; the ONLY
    deviation is the list path's SHADOW_EPS probe-origin lift
    (sampling.SHADOW_EPS — the single-light path keeps the reference's
    exact probe geometry), which perturbs a handful of borderline probes,
    so equality is channel-mean-level rather than bitwise."""
    box = spt.get_scene("cornell_box")
    l = box.light
    box1 = box._replace(
        lights=LightList(
            corner=l.corner[None],
            edge_u=l.edge_u[None],
            edge_v=l.edge_v[None],
            obj_id=jnp.asarray([6], jnp.int32),
        )
    )
    for est in ("nee", "nee_textbook", "mixture"):
        cfg = RenderConfig(
            width=16, height=16, spp=64, estimator=est, seed=3, max_bounces=32
        )
        a, tr_a = render(box, cam, cfg)
        b, tr_b = render(box1, cam, cfg)
        a, b = np.asarray(a), np.asarray(b)
        # Measured <= 7.6e-5 per channel at this config (one lifted-probe
        # borderline flip taints a whole 64-sample pixel sum, so the bound
        # is channel-mean, not per-pixel).
        diff = np.abs(a.mean((0, 1)) - b.mean((0, 1)))
        assert diff.max() < 1e-3, (est, diff)
        # Trace counts agree to 0.1% (lift rescues a few probes).
        np.testing.assert_allclose(tr_a, tr_b, rtol=1e-3)


def test_textbook_nee_unbiased_two_lights(twolights, cam):
    """nee_textbook over the light list must converge to the cosine
    estimator's image (cosine never samples lights, so it is immune to any
    light-list bookkeeping error). Channel-mean agreement at MC noise."""
    ref = _mean_img(twolights, cam, "cosine", seed=11, spp=192)
    for sel, seed in (("power", 12), ("uniform", 13)):
        got = _mean_img(twolights, cam, "nee_textbook", seed=seed, sel=sel)
        diff = np.abs(
            got.mean(axis=(0, 1)) - ref.mean(axis=(0, 1))
        )
        assert diff.max() < 2.5e-2, (sel, diff)


def test_continuation_nee_known_bias(twolights, cam):
    """C13 NEE-as-continuation keeps its darker-by-construction character
    on multi-light scenes (drops indirect when the probe succeeds) — but
    must stay within the plausible band (not collapse to 0, not exceed
    cosine)."""
    cos = _mean_img(twolights, cam, "cosine", seed=21).mean()
    nee = _mean_img(twolights, cam, "nee", seed=22).mean()
    assert 0.3 * cos < nee < 0.9 * cos


def test_light_select_probs_and_frequencies(twolights):
    _, emission, _ = object_arrays(twolights)
    probs = sampling.light_select_probs(
        twolights.lights, emission, "power"
    )
    p = np.asarray(probs)
    # Power heuristic: warm light (25x25, lum~12.4) vs cool (20x20,
    # lum~9.3): q_warm = 625*12.44 / (625*12.44 + 400*9.30).
    e = np.asarray(emission)
    lum = e[:, 0] * 0.2126 + e[:, 1] * 0.7152 + e[:, 2] * 0.0722
    w = np.array([625.0 * lum[6], 400.0 * lum[7]])
    np.testing.assert_allclose(p, w / w.sum(), rtol=1e-5)

    u = np.asarray(
        sampling.light_select_probs(twolights.lights, emission, "uniform")
    )
    np.testing.assert_allclose(u, [0.5, 0.5])

    # Draw frequencies follow q at chi-square level.
    us = jnp.linspace(0.0, 1.0, 40001)[:-1]  # uniform grid, exact freqs
    idx = np.asarray(sampling.sample_light_index(probs, us))
    freq = np.bincount(idx, minlength=2) / idx.size
    np.testing.assert_allclose(freq, p, atol=1e-3)


def test_guards(twolights, cam):
    cfg = RenderConfig(
        width=8, height=8, spp=2, estimator="nee",
        light_sample_mode="glibc_overflow",
    )
    with pytest.raises(ValueError, match="glibc_overflow"):
        render(twolights, cam, cfg)

    # The forward megakernel supports light lists (ops/megakernel
    # build_kernel, tested in test_megakernel.py) but rejects the
    # glibc_overflow mode on them, matching the jnp guard above.
    from small_pathtracer_tpu.ops.megakernel import build_kernel

    with pytest.raises(ValueError, match="glibc_overflow"):
        build_kernel(twolights, cam, cfg)

    # The ADJOINT kernel supports light lists too (parity in
    # test_megakernel_grad.py) but rejects glibc_overflow like the rest.
    from small_pathtracer_tpu.ops.megakernel_grad import build_grad_kernel

    with pytest.raises(ValueError, match="glibc_overflow"):
        build_grad_kernel(twolights, cam, cfg)

    cfg2 = RenderConfig(width=8, height=8, spp=2, estimator="nee")

    from small_pathtracer_tpu.grad.soft import soft_render

    # Round 4: soft_render supports light lists (per-path selection +
    # 1/q_k weighting — tests/test_soft.py::
    # test_multilight_soft_matches_per_light_sum validates the values).
    img = soft_render(twolights, cam, cfg2, 0)
    assert img.shape == (cfg2.height, cfg2.width, 3)


def test_gather_light_views(twolights):
    idx = jnp.asarray([1, 0, 1], jnp.int32)
    lv = sampling.gather_light(twolights.lights, idx)
    assert lv.corner.shape == (3, 3)
    np.testing.assert_allclose(
        np.asarray(lv.light_obj_id), [7, 6, 7]
    )
    # Batched area/normal: per-lane values of the chosen lights.
    area, n = sampling.light_area_normal(lv)
    np.testing.assert_allclose(np.asarray(area), [400.0, 625.0, 400.0])
    assert n.shape == (3, 3)


def test_mis_light_list_unbiased():
    """estimator='mis' over a light LIST: the balance weights fold in the
    selection probability q_k, so the two-light scene's high-spp mean must
    match the cosine estimator's (which never light-samples)."""
    import jax.numpy as jnp
    import numpy as np

    from small_pathtracer_tpu import RenderConfig, get_scene, make_camera
    from small_pathtracer_tpu.integrator.wavefront import render_regen

    scene = get_scene("cornell_twolights")
    cam = make_camera(aspect=1.0)
    ref_cfg = RenderConfig(width=16, height=16, spp=512,
                           estimator="cosine", seed=9)
    ref, _ = render_regen(scene, cam, ref_cfg, jnp.uint32(9))
    ref = np.asarray(ref) / ref_cfg.spp
    cfg = RenderConfig(width=16, height=16, spp=256, estimator="mis",
                       seed=4)
    img, _ = render_regen(scene, cam, cfg, jnp.uint32(4))
    img = np.asarray(img) / cfg.spp
    assert np.abs(img.mean(axis=(0, 1)) - ref.mean(axis=(0, 1))).max() \
        < 2.5e-2
