"""Sampler distribution tests (SURVEY.md section 4.3): chi-square on
hemisphere bins for the cosine (C11) and uniform (C12) samplers, NEE weight
formula (C13) including the reference's 1296 constant, and the glibc-overflow
light-sample mode (C13a)."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from small_pathtracer_tpu.core import rng, vecmath as vm
from small_pathtracer_tpu.integrator import sampling
from small_pathtracer_tpu.scene.presets import _cornell_light_sampler

N = 200_000


def _uniforms(purpose, n=N, seed=42):
    ids = jnp.arange(n, dtype=jnp.uint32)
    return rng.uniform_mix(jnp.uint32(seed), ids, jnp.uint32(purpose))


@pytest.fixture(scope="module")
def nl():
    return jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (N, 3))


def _cos_theta_hist(d, bins=20):
    ct = np.asarray(d[:, 2])
    hist, _ = np.histogram(ct, bins=bins, range=(0.0, 1.0))
    return hist


def test_cosine_sampler_distribution(nl):
    """cos-weighted: pdf(cos t) = 2 cos t on [0,1] => P(bin) = hi^2 - lo^2."""
    d = sampling.sample_cosine(nl, _uniforms(0), _uniforms(1))
    assert float(jnp.min(vm.dot(d, nl))) >= 0.0
    hist = _cos_theta_hist(d)
    edges = np.linspace(0, 1, 21)
    p = edges[1:] ** 2 - edges[:-1] ** 2
    chi2 = np.sum((hist - N * p) ** 2 / (N * p))
    assert chi2 < 43.8  # chi2_{0.999, df=19}


def test_uniform_sampler_distribution(nl):
    """uniform solid angle: cos t = 1 - u2 uniform on [0,1]."""
    d = sampling.sample_uniform(nl, _uniforms(0), _uniforms(1))
    hist = _cos_theta_hist(d)
    p = np.full(20, 1 / 20)
    chi2 = np.sum((hist - N * p) ** 2 / (N * p))
    assert chi2 < 43.8


def test_sampler_directions_unit_norm(nl):
    for f in (sampling.sample_cosine, sampling.sample_uniform):
        d = f(nl[:100], _uniforms(0, 100), _uniforms(1, 100))
        np.testing.assert_allclose(
            np.asarray(vm.magnitude(d)), 1.0, atol=1e-5
        )


def test_azimuthal_uniformity(nl):
    d = sampling.sample_cosine(nl, _uniforms(0), _uniforms(1))
    phi = np.arctan2(np.asarray(d[:, 1]), np.asarray(d[:, 0]))
    hist, _ = np.histogram(phi, bins=16, range=(-math.pi, math.pi))
    p = np.full(16, 1 / 16)
    chi2 = np.sum((hist - N * p) ** 2 / (N * p))
    assert chi2 < 37.7  # chi2_{0.999, df=15}


class TestLightSampler:
    def test_area_is_1296(self):
        light = _cornell_light_sampler()
        area, n = sampling.light_area_normal(light)
        assert float(area) == pytest.approx(1296.0)  # 36*36, smallpt.cpp:471
        # Sign of the normal is irrelevant: nee_weight takes |d . n| (C13).
        np.testing.assert_allclose(np.abs(np.asarray(n)), [0.0, 1.0, 0.0], atol=1e-7)

    def test_sample_range_c13(self):
        """x in [32,68], z in [63,99], y = 81.6 (the sic values, C13)."""
        light = _cornell_light_sampler()
        p = sampling.sample_light_point(light, _uniforms(1, 1000), _uniforms(2, 1000))
        p = np.asarray(p)
        assert p[:, 0].min() >= 32 and p[:, 0].max() <= 68
        assert p[:, 2].min() >= 63 and p[:, 2].max() <= 99
        np.testing.assert_allclose(p[:, 1], 81.6, atol=1e-5)
        # and it actually covers the range
        assert p[:, 0].max() - p[:, 0].min() > 30
        assert p[:, 2].max() - p[:, 2].min() > 30

    def test_glibc_overflow_mode_collapses_to_corner(self):
        """C13a: on glibc the int32 overflow collapses sampling to a ~±1-unit
        patch around the corner (32,63)."""
        light = _cornell_light_sampler()
        p = sampling.sample_light_point_glibc(
            light, _uniforms(1, 10000), _uniforms(2, 10000)
        )
        p = np.asarray(p)
        assert np.all(np.abs(p[:, 0] - 32.0) < 1.01)
        assert np.all(np.abs(p[:, 2] - 63.0) < 1.01)

    def test_nee_weight_formula(self):
        """PDF_inv * BRDF = |1296 * (d.y)| / t^2 * |d.nl| / pi (C13/C14)."""
        light = _cornell_light_sampler()
        d = jnp.asarray([[0.0, 1.0, 0.0]])
        nl = jnp.asarray([[0.0, 1.0, 0.0]])
        t = jnp.asarray([10.0])
        w = sampling.nee_weight(light, d, nl, t)
        expect = (1296.0 * 1.0 / 100.0) * (1.0 / math.pi)
        assert float(w[0]) == pytest.approx(expect, rel=1e-6)

    def test_glibc_offset_matches_c_semantics(self):
        """Bit-check _glibc_overflow_offset against int32 wraparound in numpy."""
        u = _uniforms(3, 4096)
        got = np.asarray(sampling._glibc_overflow_offset(u))
        r = (np.asarray(u) * np.float32(2147483648.0)).astype(np.uint32)
        wrapped = (r * np.uint32(36)).astype(np.uint32).view(np.int32)
        expect = wrapped.astype(np.float32) / np.float32(2147483647.0)
        np.testing.assert_allclose(got, expect, rtol=1e-6)
