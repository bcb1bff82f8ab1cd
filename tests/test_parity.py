"""Statistical image parity vs the C++ oracle (SURVEY.md section 4.3).

The criterion: mine-vs-oracle mean |diff| must be statistically
indistinguishable from oracle-vs-oracle mean |diff| at the same spp (two
independent seeds), and channel means must agree to ~1e-2. Bitwise parity is
impossible by design (contract C6: the reference seeds with time(NULL)).

These tests compile and run the reference (~1-2 min first time; cached in
tests/_oracle_cache afterwards). Skipped when g++ or /root/reference is
unavailable.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))
import oracle_harness as oh

pytestmark = pytest.mark.skipif(
    not oh.available(), reason="C++ oracle unavailable"
)

W = H = 96
SPP = 64


def _ours(estimator, spp=SPP, seed=5, light_mode="intended"):
    import small_pathtracer_tpu as spt

    cfg = spt.RenderConfig(
        width=W, height=H, spp=spp, estimator=estimator, seed=seed,
        light_sample_mode=light_mode,
    )
    img, _ = spt.render(
        spt.get_scene("cornell_box"), spt.make_camera(), cfg
    )
    return np.asarray(img, np.float64)


@pytest.mark.parametrize("estimator", ["nee", "cosine"])
def test_parity_vs_oracle(estimator):
    """Estimator parity vs the self-hit-free oracle (self_hit_eps patches the
    reference's f64 self-intersection artifact — see oracle_harness; the
    as-built reference renders ~3.5% darker in cosine mode because fp
    self-hits multiply spurious albedo factors)."""
    o1 = oh.render_oracle(W, H, SPP, seed=1, estimator=estimator,
                          self_hit_eps=1e-3)
    o2 = oh.render_oracle(W, H, SPP, seed=2, estimator=estimator,
                          self_hit_eps=1e-3)
    mine = _ours(estimator)
    noise = np.abs(o1 - o2).mean()
    diff = np.abs(mine - o1).mean()
    # Same-estimator renders differ only by MC noise; a subtle estimator bug
    # shows up as diff >> noise.
    assert diff < 1.25 * noise, (diff, noise)
    np.testing.assert_allclose(
        mine.mean(axis=(0, 1)), o1.mean(axis=(0, 1)), atol=1e-2
    )


def test_parity_vs_asbuilt_oracle_nee():
    """As-built (unpatched) oracle, NEE mode: the self-hit artifact mostly
    converts light-probe successes into fallbacks there, so parity holds at
    the noise level even without the epsilon patch."""
    o1 = oh.render_oracle(W, H, SPP, seed=1, estimator="nee")
    o2 = oh.render_oracle(W, H, SPP, seed=2, estimator="nee")
    mine = _ours("nee")
    noise = np.abs(o1 - o2).mean()
    diff = np.abs(mine - o1).mean()
    assert diff < 1.25 * noise, (diff, noise)


def test_parity_uniform_estimator():
    """C12 as-committed uniform sampling (no 2cos correction) vs the
    swapped-in oracle variant."""
    o1 = oh.render_oracle(W, H, SPP, seed=1, estimator="uniform",
                          self_hit_eps=1e-3)
    o2 = oh.render_oracle(W, H, SPP, seed=2, estimator="uniform",
                          self_hit_eps=1e-3)
    mine = _ours("uniform")
    noise = np.abs(o1 - o2).mean()
    diff = np.abs(mine - o1).mean()
    assert diff < 1.25 * noise, (diff, noise)
    np.testing.assert_allclose(
        mine.mean(axis=(0, 1)), o1.mean(axis=(0, 1)), atol=1.2e-2
    )


def test_parity_mixture_estimator():
    """The historic q<0.5 'halflighthalfimportance' mixture (C13)."""
    o1 = oh.render_oracle(W, H, SPP, seed=1, estimator="mixture",
                          self_hit_eps=1e-3)
    o2 = oh.render_oracle(W, H, SPP, seed=2, estimator="mixture",
                          self_hit_eps=1e-3)
    mine = _ours("mixture")
    noise = np.abs(o1 - o2).mean()
    diff = np.abs(mine - o1).mean()
    assert diff < 1.25 * noise, (diff, noise)
    np.testing.assert_allclose(
        mine.mean(axis=(0, 1)), o1.mean(axis=(0, 1)), atol=1.2e-2
    )


def test_parity_glibc_overflow_mode():
    """C13a bit-faithful mode vs the as-built (unpatched) oracle."""
    o1 = oh.render_oracle(W, H, SPP, seed=1, estimator="nee",
                          light_mode="glibc_overflow")
    o2 = oh.render_oracle(W, H, SPP, seed=2, estimator="nee",
                          light_mode="glibc_overflow")
    mine = _ours("nee", light_mode="glibc_overflow")
    noise = np.abs(o1 - o2).mean()
    diff = np.abs(mine - o1).mean()
    assert diff < 1.4 * noise, (diff, noise)


def _ours_spec_refr(spp=SPP, seed=5):
    """cornell_spheres with the original-smallpt materials: mirror sphere 0,
    glass sphere 1, albedo .999 (smallpt.cpp:297-298 'Mirr'/'Glas')."""
    import jax.numpy as jnp

    import small_pathtracer_tpu as spt
    from small_pathtracer_tpu.scene.types import REFR, SPEC

    scene = spt.get_scene("cornell_spheres")
    scene = scene._replace(
        spheres=scene.spheres._replace(
            refl=jnp.asarray([SPEC, REFR], jnp.int32),
            albedo=jnp.full((2, 3), 0.999, jnp.float32),
        )
    )
    cfg = spt.RenderConfig(width=W, height=H, spp=spp, estimator="nee",
                           seed=seed)
    img, _ = spt.render(scene, spt.make_camera(), cfg)
    return np.asarray(img, np.float64)


_SR_KW = dict(
    estimator="nee", self_hit_eps=1e-3, scene="spheres",
    overrides={"sphere_materials": ("SPEC", "REFR")},
)


def test_parity_spec_refr_vs_oracle():
    """C16 stretch parity: the oracle with the commented SPEC/REFR branches
    re-enabled as written (depth<=2 ray splitting) vs our wavefront
    (always-RR, a variance-only deviation — see test below). Statistical
    criterion as the other parity tests, with headroom for the estimator-
    variance difference."""
    o1 = oh.render_oracle(W, H, SPP, seed=1, spec_refr="split", **_SR_KW)
    o2 = oh.render_oracle(W, H, SPP, seed=2, spec_refr="split", **_SR_KW)
    mine = _ours_spec_refr()
    noise = np.abs(o1 - o2).mean()
    diff = np.abs(mine - o1).mean()
    assert diff < 1.5 * noise, (diff, noise)
    np.testing.assert_allclose(
        mine.mean(axis=(0, 1)), o1.mean(axis=(0, 1)), atol=1.5e-2
    )


def test_spec_refr_oracle_with_overrides_builds():
    """The re-enabled REFR branch recovers 'into' from the NEAREST sphere
    center, so it stays correct when sphere 0 is the refractor and/or its
    center is overridden (review finding: a hardcoded glass center would
    silently corrupt overridden-parameter oracles)."""
    img = oh.render_oracle(
        32, 32, 4, seed=1, estimator="nee", self_hit_eps=1e-3,
        scene="spheres", spec_refr="rr",
        overrides={"sphere_materials": ("REFR", "DIFF"),
                   "sphere0_center": (30.0, 16.5, 47.0)},
    )
    assert np.all(np.isfinite(img)) and 0.05 < img.mean() < 1.0


def test_refr_split_vs_rr_deviation_is_variance_only():
    """Quantifies the documented deviation (integrator/wavefront.py
    _refr_scatter): the reference's depth<=2 dielectric ray SPLITTING vs
    always-Russian-roulette with the same P=.25+.5*Re. Both are unbiased
    estimators of the Fresnel-weighted sum, so the two ORACLE variants'
    mean images must agree at seed-noise level — the deviation shows up
    only as variance."""
    a = oh.render_oracle(W, H, SPP, seed=1, spec_refr="split", **_SR_KW)
    b = oh.render_oracle(W, H, SPP, seed=2, spec_refr="split", **_SR_KW)
    c = oh.render_oracle(W, H, SPP, seed=3, spec_refr="rr", **_SR_KW)
    noise = np.abs(a - b).mean()
    dev = np.abs(a - c).mean()
    assert dev < 1.3 * noise, (dev, noise)
    np.testing.assert_allclose(
        c.mean(axis=(0, 1)), a.mean(axis=(0, 1)), atol=1e-2
    )


def test_estimator_cross_consistency():
    """Cosine and uniform-corrected are both unbiased and must converge to
    the same image. NEE-as-continuation (C13) is NOT a textbook-unbiased
    estimator — when the light probe succeeds the path terminates at the
    light and that bounce's *indirect* contribution is dropped with no
    reweighting — so it renders systematically darker (measured: channel
    means ~0.29 vs ~0.46 on the box scene, in both the reference and this
    implementation). We assert that known relationship rather than
    'fixing' it (parity over correctness, SURVEY.md hard part #2)."""
    a = _ours("cosine", spp=256, seed=11)
    b = _ours("nee", spp=256, seed=12)
    c = _ours("uniform_corrected", spp=256, seed=13)
    assert np.abs(a.mean(axis=(0, 1)) - c.mean(axis=(0, 1))).max() < 2.5e-2
    # NEE-as-continuation is darker by construction; the same holds for the
    # reference (its oracle means: cosine ~0.46, nee ~0.29).
    assert b.mean() < 0.8 * a.mean()


def _ours_samples(estimator, spp, seed, light_mode="intended",
                  scene_name="cornell_box", max_bounces=64):
    """Per-sample radiance (n_pix, spp, 3) from the fixed-slot wavefront —
    gives the UNCLAMPED per-pixel mean and the per-pixel sample variance
    the SURVEY 4.3 parity bound needs."""
    import jax.numpy as jnp

    import small_pathtracer_tpu as spt
    from small_pathtracer_tpu.integrator.wavefront import (
        _chunk_paths,
        path_trace,
    )

    cfg = spt.RenderConfig(
        width=W, height=H, spp=spp, estimator=estimator, seed=seed,
        light_sample_mode=light_mode, max_bounces=max_bounces,
    )
    scene = spt.get_scene(scene_name)
    cam = spt.make_camera()
    o, d, pid = _chunk_paths(cam, cfg, jnp.uint32(seed), jnp.uint32(0), spp)
    L, _ = path_trace(scene, cfg, jnp.uint32(seed), o, d, pid)
    return np.asarray(L, np.float64).reshape(W * H, spp, 3)


# (estimator, light_mode, oracle scene, our scene, our bounce cap, tail
# slack) — the VERDICT round-3 item: the variance-aware bound used to
# cover one estimator on one scene; it now spans the continuation
# estimators, the glibc C13a mode, and the sphere scene. Config notes:
#  - sphere scenes run a 192-bounce cap: their 0.999-albedo spheres give
#    cosine transport a deep RR tail (reference tail measured to 88 on
#    the DARKER box scene, SURVEY section 6), and a 64-bounce truncation
#    leaves a scene-wide ~1% energy deficit that the z>4 tail statistic
#    detects even though mean-z passes.
#  - glibc_overflow carries a 2.0x tail slack: the mode reproduces the
#    overflow's VALUE mapping bit-faithfully, but the reference's LCG
#    rand() stream is serially correlated while our counter RNG is not,
#    which perturbs the tail of the corner-patch estimator's
#    distribution (the documented ~2% residual, oracle_harness notes).
ZSCORE_CONFIGS = [
    ("nee", "intended", "box", "cornell_box", 64, 1.5),
    ("cosine", "intended", "box", "cornell_box", 64, 1.5),
    ("mixture", "intended", "box", "cornell_box", 64, 1.5),
    ("nee", "glibc_overflow", "box", "cornell_box", 64, 2.0),
    ("nee", "intended", "spheres", "cornell_spheres", 192, 1.5),
    ("cosine", "intended", "spheres", "cornell_spheres", 192, 1.5),
]


@pytest.mark.parametrize(
    "estimator,light_mode,o_scene,m_scene,mb,slack", ZSCORE_CONFIGS,
    ids=[f"{e}-{lm}-{os_}" for e, lm, os_, _, _, _ in ZSCORE_CONFIGS],
)
def test_parity_per_pixel_zscore(estimator, light_mode, o_scene, m_scene,
                                 mb, slack):
    """SURVEY 4.3's variance-aware per-pixel bound, replacing the
    whole-image mean-|diff| criterion. Radiance is heavy-tailed (rare
    large NEE 1/t^2 samples), so per-pixel sample variance UNDERestimates
    the noise and absolute z thresholds fail even oracle-vs-oracle
    (measured: 14.5% of oracle-self z beyond 4). The honest criterion is
    therefore RELATIVE: our per-pixel z-distribution against a held-out
    3-seed oracle ensemble must be no worse than a held-out oracle
    seed's own z-distribution — a spatially-structured bias in our
    renderer inflates z_ours but not z_oracle."""
    kw = dict(estimator=estimator, light_mode=light_mode, scene=o_scene,
              self_hit_eps=1e-3, linear=True)
    ens = np.stack([
        oh.render_oracle(W, H, SPP, seed=s, **kw) for s in (2, 3, 4)
    ])
    o_mean = ens.mean(axis=0).reshape(W * H, 3)
    # The ensemble-mean term uses the ORACLE's own empirical cross-seed
    # spread, not our per-sample variance: for sparse-event estimators
    # (cosine: light hits are rare), a pixel where the ensemble caught a
    # rare bright path that our 128 samples missed would otherwise get a
    # tiny our-variance denominator and a spurious z >> 4 (measured: 98%
    # of such pixels one-sided, mean shift < 0.2% — a denominator
    # artifact, not bias).
    var3 = ens.var(axis=0, ddof=1).reshape(W * H, 3) / 3
    o_hold = oh.render_oracle(W, H, SPP, seed=1, **kw).reshape(-1, 3)

    samples = _ours_samples(estimator, 128, seed=5, light_mode=light_mode,
                            scene_name=m_scene, max_bounces=mb)
    mine = samples.mean(axis=1)
    svar = samples.var(axis=1, ddof=1)
    denom_ours = np.sqrt(svar / samples.shape[1] + var3 + 1e-12)
    denom_orc = np.sqrt(svar / SPP + var3 + 1e-12)
    z_ours = np.abs(mine - o_mean) / denom_ours
    z_orc = np.abs(o_hold - o_mean) / denom_orc
    # Our render has 2x the oracle's spp, so with matched estimators our
    # z should be somewhat BETTER than the oracle's own; allow 15% slack.
    assert z_ours.mean() < 1.15 * z_orc.mean(), (z_ours.mean(), z_orc.mean())
    f_ours, f_orc = (z_ours > 4).mean(), (z_orc > 4).mean()
    assert f_ours < slack * f_orc + 1e-3, (f_ours, f_orc)
    f6_ours, f6_orc = (z_ours > 6).mean(), (z_orc > 6).mean()
    assert f6_ours < slack * f6_orc + 1e-3, (f6_ours, f6_orc)


@pytest.mark.parametrize("estimator", ["nee", "cosine", "uniform",
                                       "mixture"])
def test_parity_high_spp_bias(estimator):
    """256-spp bias check per estimator (VERDICT round-1 item 6): at high
    spp the MC noise floor drops below ~1e-3, so a channel-mean comparison
    against a single oracle render becomes a real bias test."""
    o = oh.render_oracle(W, H, 256, seed=9, estimator=estimator,
                         self_hit_eps=1e-3, linear=True)
    mine = _ours_samples(estimator, 256, seed=21).mean(axis=1)
    np.testing.assert_allclose(
        mine.mean(axis=0), o.reshape(-1, 3).mean(axis=0), atol=4e-3
    )


def test_committed_ppm_sanity():
    """Coarse structural sanity vs a committed reference render
    (image2_32pps_explicitsampling.ppm — sphere scene, NEE, 32 spp,
    SURVEY 4.2). Those PPMs predate the snapshot (older scene/light
    variants), so this is a gross-drift detector (brightness/structure
    correlation), not a parity oracle."""
    ppm = Path("/root/reference/image2_32pps_explicitsampling.ppm")
    if not ppm.exists():
        pytest.skip("committed reference PPM unavailable")
    toks = ppm.read_text().split()
    assert toks[0] == "P3"
    rw, rh, maxv = int(toks[1]), int(toks[2]), int(toks[3])
    ref = np.array(toks[4:4 + rw * rh * 3], np.float64).reshape(rh, rw, 3)
    ref /= maxv

    import small_pathtracer_tpu as spt

    cfg = spt.RenderConfig(width=96, height=96, spp=32, estimator="nee",
                           seed=3)
    img, _ = spt.render(spt.get_scene("cornell_spheres"),
                        spt.make_camera(), cfg)
    mine_u8 = np.asarray(
        __import__("small_pathtracer_tpu.core.film",
                   fromlist=["film"]).tonemap_u8(img), np.float64
    ) / 255.0

    def pool(x, n=16):
        h, w = x.shape[:2]
        g = x.mean(axis=2)
        return g.reshape(n, h // n, n, w // n).mean(axis=(1, 3))

    a = pool(ref)
    b = pool(mine_u8)
    # Brightness within 35%, and downsampled structure strongly
    # correlated AFTER exposure normalization (VERDICT r3 weak #3: the
    # old gate was corr > 0.6 on raw pools — loose enough to pass with
    # gross structural drift).
    assert abs(a.mean() - b.mean()) < 0.35 * max(a.mean(), b.mean())
    an = a / a.mean()
    bn = b / b.mean()
    corr = np.corrcoef(an.reshape(-1), bn.reshape(-1))[0, 1]
    assert corr > 0.8, corr


def test_nee_textbook_unbiased_and_lower_variance():
    """The 'correctness over parity' NEE (SURVEY section 7 hard part #2):
    must converge to the same image as cosine (both unbiased — unlike the
    reference's NEE-as-continuation) at a fraction of the variance."""
    ref = _ours("cosine", spp=512, seed=99)
    a = _ours("cosine", spp=8, seed=1)
    b = _ours("nee_textbook", spp=8, seed=1)
    mse_cos = float(((a - ref) ** 2).mean())
    mse_tb = float(((b - ref) ** 2).mean())
    assert mse_tb < 0.25 * mse_cos, (mse_tb, mse_cos)
    # Unbiasedness: high-spp means agree with the cosine reference.
    c = _ours("nee_textbook", spp=256, seed=5)
    assert np.abs(c.mean(axis=(0, 1)) - ref.mean(axis=(0, 1))).max() < 2e-2


def test_mis_unbiased_and_improves_on_textbook():
    """estimator='mis' (Veach balance heuristic over the nee_textbook
    strategy pair): converges to the cosine image (unbiased), never worse
    than plain nee_textbook at equal spp on the full image, and the win
    concentrates where light sampling is weakest — ceiling pixels near the
    light, where the shadow ray's 1/t^2 weight explodes but the BSDF
    continuation finds the light reliably (measured 9-21% MSE cut on the
    top rows across seeds; the full-image margin is small because the
    Cornell light is large, i.e. light sampling is already strong)."""
    ref = _ours("cosine", spp=512, seed=99)
    full_r, top_r = [], []
    for seed in (1, 2, 3):
        b = _ours("nee_textbook", spp=8, seed=seed)
        m = _ours("mis", spp=8, seed=seed)
        full_r.append(((m - ref) ** 2).mean() / ((b - ref) ** 2).mean())
        top_r.append(
            ((m[:12] - ref[:12]) ** 2).mean()
            / ((b[:12] - ref[:12]) ** 2).mean()
        )
    assert np.mean(full_r) < 1.02, full_r
    assert np.mean(top_r) < 0.93, top_r
    # The balance heuristic's weights sum to 1 along every light path:
    # high-spp mean must agree with the cosine reference.
    c = _ours("mis", spp=256, seed=5)
    assert np.abs(c.mean(axis=(0, 1)) - ref.mean(axis=(0, 1))).max() < 2e-2
