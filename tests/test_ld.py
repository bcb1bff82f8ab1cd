"""Owen-scrambled Sobol sampler (core/ld.py, cfg.sampler="sobol").

Validates, in order: the uint32 building blocks (constant divmod, bit
reverse, Sobol dim-1), the net properties of the per-(pixel, decision)
point sets (exact 1D stratification + 2D elementary intervals), marginal
uniformity (unbiasedness), decorrelation across pixels/decisions, schedule
invariance (regen == scan == sharded mesh), and the variance win over the
hash RNG on a real render.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from small_pathtracer_tpu.camera.pinhole import make_camera
from small_pathtracer_tpu.config import RenderConfig
from small_pathtracer_tpu.core import ld, rng
from small_pathtracer_tpu.integrator import wavefront
from small_pathtracer_tpu.scene.presets import get_scene


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("d", [1, 2, 3, 5, 7, 16, 60, 64, 100, 512, 1000,
                               4096, 44100, 65536, 1 << 20, (1 << 31) - 1])
def test_divmod_u32_exact(d, rng_np):
    dm = jax.jit(ld.make_divmod_u32(d))
    n = np.concatenate([
        rng_np.integers(0, 1 << 32, size=4096, dtype=np.uint64),
        np.array([0, 1, d - 1, d, d + 1, 2 * d,
                  (1 << 32) - 1, (1 << 32) - d], dtype=np.uint64) % (1 << 32),
    ]).astype(np.uint32)
    q, r = dm(jnp.asarray(n))
    np.testing.assert_array_equal(np.asarray(q), n // np.uint32(d))
    np.testing.assert_array_equal(np.asarray(r), n % np.uint32(d))


def test_rev32(rng_np):
    x = rng_np.integers(0, 1 << 32, size=256, dtype=np.uint64).astype(
        np.uint32)
    got = np.asarray(ld.rev32(jnp.asarray(x)))
    want = np.array(
        [int(f"{int(v):032b}"[::-1], 2) for v in x], dtype=np.uint32
    )
    np.testing.assert_array_equal(got, want)


def test_sobol_dim1_is_02_sequence():
    """Dims (rev32(i), sobol_dim1(i)) over i < 2^k form a (0, 2)-sequence
    in base 2: every 2^a x 2^b elementary interval with a+b = k holds
    exactly one point."""
    k = 8
    n = 1 << k
    i = jnp.arange(n, dtype=jnp.uint32)
    d0 = np.asarray(ld.rev32(i)).astype(np.uint64)
    d1 = np.asarray(ld.sobol_dim1(i, k)).astype(np.uint64)
    for a in range(k + 1):
        b = k - a
        cell = (d0 >> np.uint64(32 - a) if a else np.zeros(n, np.uint64)) * (
            1 << b
        ) + (d1 >> np.uint64(32 - b) if b else np.zeros(n, np.uint64))
        counts = np.bincount(cell.astype(np.int64), minlength=n)
        assert counts.min() == counts.max() == 1, (a, b)


def test_shuffled_index_is_permutation():
    for kbits, key in [(4, 7), (8, 123), (10, 999)]:
        n = 1 << kbits
        s = jnp.arange(n, dtype=jnp.uint32)
        out = np.asarray(ld.shuffled_index(s, np.uint32(key), kbits))
        assert sorted(out.tolist()) == list(range(n)), (kbits, key)


# ---------------------------------------------------------------------------
# The sampler's point sets
# ---------------------------------------------------------------------------


def _pair(spp, pixel, purpose_u, purpose_v, ctr_u, ctr_v, seed=3):
    """All spp samples of one pixel's (purpose_u, purpose_v) decision."""
    uni = ld.make_sobol_uniform(spp, rng.make_uniform_fn("mix"))
    s = jnp.arange(spp, dtype=jnp.uint32)
    pid = jnp.uint32(pixel * spp) + s
    u = np.asarray(uni(jnp.uint32(seed), pid, ctr_u, purpose=purpose_u))
    v = np.asarray(uni(jnp.uint32(seed), pid, ctr_v, purpose=purpose_v))
    return u, v


@pytest.mark.parametrize("purpose_u,purpose_v,ctr_u,ctr_v", [
    (ld.CAM_U, ld.CAM_V, jnp.uint32(0), jnp.uint32(1)),
    (rng.P_LIGHT_U, rng.P_LIGHT_V,
     jnp.uint32(8 + rng.P_LIGHT_U), jnp.uint32(8 + rng.P_LIGHT_V)),
    (rng.P_SCATTER_U, rng.P_SCATTER_V,
     jnp.uint32(16 + rng.P_SCATTER_U), jnp.uint32(16 + rng.P_SCATTER_V)),
])
def test_exact_stratification(purpose_u, purpose_v, ctr_u, ctr_v):
    """Power-of-two spp: each 1D projection has exactly one sample per 1/N
    stratum; 16x16 elementary intervals hold exactly one sample each."""
    spp = 256
    for pixel in (0, 17, 1023):
        u, v = _pair(spp, pixel, purpose_u, purpose_v, ctr_u, ctr_v)
        for x in (u, v):
            strata = np.bincount((x * spp).astype(int), minlength=spp)
            assert strata.min() == strata.max() == 1
        cell = (u * 16).astype(int) * 16 + (v * 16).astype(int)
        counts = np.bincount(cell, minlength=256)
        assert counts.min() == counts.max() == 1


def test_non_pow2_spp_near_stratified():
    """Arbitrary spp still lands at most one sample per 1/ceilpow2 stratum
    (the index set is a subset of a shuffled 2^k net)."""
    spp = 100
    u, v = _pair(spp, 5, ld.CAM_U, ld.CAM_V, jnp.uint32(0), jnp.uint32(1))
    n2 = 128
    for x in (u, v):
        strata = np.bincount((x * n2).astype(int), minlength=n2)
        assert strata.max() == 1


def test_marginal_uniformity():
    """Each draw is marginally uniform over pixels (unbiasedness): pooled
    over many pixels at fixed sample index, a chi-square test passes."""
    spp = 16
    n_pix = 4096
    uni = ld.make_sobol_uniform(spp, rng.make_uniform_fn("mix"))
    pix = jnp.arange(n_pix, dtype=jnp.uint32)
    for s_idx in (0, 7):
        pid = pix * jnp.uint32(spp) + jnp.uint32(s_idx)
        u = np.asarray(
            uni(jnp.uint32(1), pid, jnp.uint32(8 + rng.P_LIGHT_U),
                purpose=rng.P_LIGHT_U)
        )
        nbins = 64
        counts = np.bincount((u * nbins).astype(int), minlength=nbins)
        expect = n_pix / nbins
        chi2 = float(((counts - expect) ** 2 / expect).sum())
        # dof = 63; mean 63, std ~11.2 — 120 is ~5 sigma.
        assert chi2 < 120.0, (s_idx, chi2)


def test_decisions_and_pixels_decorrelated():
    """Scramble keys differ across decisions and pixels: correlation of the
    paired sequences is near zero."""
    spp = 1024
    u_a, _ = _pair(spp, 3, rng.P_LIGHT_U, rng.P_LIGHT_V,
                   jnp.uint32(8 + 1), jnp.uint32(8 + 2))
    u_b, _ = _pair(spp, 3, rng.P_SCATTER_U, rng.P_SCATTER_V,
                   jnp.uint32(8 + 3), jnp.uint32(8 + 4))
    u_c, _ = _pair(spp, 4, rng.P_LIGHT_U, rng.P_LIGHT_V,
                   jnp.uint32(8 + 1), jnp.uint32(8 + 2))
    for other in (u_b, u_c):
        r = abs(float(np.corrcoef(u_a, other)[0, 1]))
        assert r < 0.12, r


def test_non_ld_purposes_fall_through_to_base():
    """RR / mixture / selection coins and hint-less calls are bit-identical
    to the hash backend."""
    base = rng.make_uniform_fn("mix")
    uni = ld.make_sobol_uniform(64, base)
    pid = jnp.arange(512, dtype=jnp.uint32)
    ctr = jnp.uint32(8 + rng.P_RR)
    for purpose in (rng.P_RR, rng.P_MIX_COIN, rng.P_REFR_COIN,
                    rng.P_LIGHT_SEL, None):
        np.testing.assert_array_equal(
            np.asarray(uni(jnp.uint32(9), pid, ctr, purpose=purpose)),
            np.asarray(base(jnp.uint32(9), pid, ctr)),
        )


def test_spp_cap():
    with pytest.raises(ValueError, match="spp"):
        ld.make_sobol_uniform(ld.MAX_SPP * 2, rng.make_uniform_fn("mix"))


# ---------------------------------------------------------------------------
# Renders
# ---------------------------------------------------------------------------


def _render(scene, cam, **kw):
    cfg = RenderConfig(width=32, height=24, **kw)
    img, _ = wavefront.render_counts(scene, cam, cfg)
    return np.asarray(img)


def test_schedule_invariance_sobol(cornell_box, camera):
    """regen and scan accumulate bit-identical per-sample radiance under
    the sobol sampler too (the draw is still a pure function of
    (seed, path_id, ctr))."""
    a = _render(cornell_box, camera, spp=8, sampler="sobol",
                wavefront="regen")
    b = _render(cornell_box, camera, spp=8, sampler="sobol",
                wavefront="scan")
    np.testing.assert_allclose(a, b, atol=2e-6)


def test_sobol_mean_matches_random(cornell_box, camera):
    """Unbiasedness: sobol and random renders converge to the same image
    (both estimate the same integral; compare at moderate spp against the
    combined MC noise)."""
    a = _render(cornell_box, camera, spp=256, sampler="sobol",
                estimator="nee")
    b = _render(cornell_box, camera, spp=256, sampler="random",
                estimator="nee")
    assert abs(float(a.mean() - b.mean())) < 5e-3
    # Per-pixel |delta| is two independent 256-spp estimates' noise
    # (measured ~0.027 at this size) — bound well above it, the bias
    # check is the channel-mean line above.
    assert float(np.abs(a - b).mean()) < 4.5e-2


@pytest.mark.parametrize("estimator,bound", [
    # Measured sobol/random MSE ratios at 64 spp over 4 seeds (32x24
    # cornell_box): nee_textbook 0.37-0.52 (the smooth shadow-ray direct
    # term is where stratification bites), cosine 0.78-0.85 (variance is
    # dominated by the discontinuous light-hit indicator, where LD gains
    # are bounded). The reference's C13 continuation estimator is NOT
    # asserted here: its variance is fallback-path-dominated (failed
    # probes continue by cosine luck), measured ratio ~0.85 +- 0.15 —
    # real on average but not reliably separable per seed.
    ("nee_textbook", 0.72),
    ("cosine", 0.95),
])
def test_sobol_cuts_mse(cornell_box, camera, estimator, bound):
    """The payoff: sobol MSE vs a high-spp truth lands well below random's
    (both vs the same 2048-spp random truth), averaged over two seeds."""
    truth = _render(cornell_box, camera, spp=2048, sampler="random",
                    estimator=estimator, seed=101)
    mse = {"random": 0.0, "sobol": 0.0}
    for sampler in mse:
        for seed in (1, 7):
            img = _render(cornell_box, camera, spp=64, sampler=sampler,
                          estimator=estimator, seed=seed)
            mse[sampler] += float(((img - truth) ** 2).mean())
    assert mse["sobol"] < bound * mse["random"], mse
