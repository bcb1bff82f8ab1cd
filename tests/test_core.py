"""Core-layer tests: RNG statistical quality + invariance, film/tonemap
contract (C2/C3), PPM round-trip (C1), camera formulas (C4/C5), vec math."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from small_pathtracer_tpu.camera.pinhole import (
    LOOKAT,
    LOOKFROM,
    VFOV_DEG,
    make_camera,
    primary_rays,
)
from small_pathtracer_tpu.core import film, rng, vecmath as vm


class TestRng:
    def test_uniform_range_and_mean(self):
        ids = jnp.arange(1 << 16, dtype=jnp.uint32)
        u = np.asarray(rng.uniform_mix(jnp.uint32(7), ids, jnp.uint32(3)))
        assert u.min() >= 0.0 and u.max() < 1.0
        assert abs(u.mean() - 0.5) < 2e-3
        assert abs(u.var() - 1 / 12) < 1e-3

    def test_chi_square_uniformity(self):
        n = 1 << 18
        ids = jnp.arange(n, dtype=jnp.uint32)
        u = np.asarray(rng.uniform_mix(jnp.uint32(123), ids, jnp.uint32(5)))
        hist, _ = np.histogram(u, bins=64, range=(0, 1))
        e = n / 64
        chi2 = np.sum((hist - e) ** 2 / e)
        assert chi2 < 110.0  # chi2_{0.999, df=63} ~ 103; headroom

    def test_streams_decorrelated_across_purpose(self):
        ids = jnp.arange(1 << 14, dtype=jnp.uint32)
        a = np.asarray(rng.uniform_mix(jnp.uint32(1), ids, jnp.uint32(0)))
        b = np.asarray(rng.uniform_mix(jnp.uint32(1), ids, jnp.uint32(1)))
        assert abs(np.corrcoef(a, b)[0, 1]) < 0.02

    def test_deterministic(self):
        ids = jnp.arange(100, dtype=jnp.uint32)
        a = np.asarray(rng.uniform_mix(jnp.uint32(9), ids, jnp.uint32(2)))
        b = np.asarray(rng.uniform_mix(jnp.uint32(9), ids, jnp.uint32(2)))
        np.testing.assert_array_equal(a, b)

    def test_mix_vs_threefry_statistics(self):
        """The cheap mixer must match threefry moments closely."""
        ids = jnp.arange(1 << 16, dtype=jnp.uint32)
        a = np.asarray(rng.uniform_mix(jnp.uint32(3), ids, jnp.uint32(1)))
        b = np.asarray(rng.uniform_threefry(jnp.uint32(3), ids, jnp.uint32(1)))
        assert abs(a.mean() - b.mean()) < 3e-3
        assert abs(a.var() - b.var()) < 2e-3

    def test_rand48_bit_exact(self):
        """Host rand48 must reproduce the POSIX erand48 sequence (first draws
        from a known seed, cross-checked against the LCG closed form)."""
        s0 = rng.rand48_seed_row(3)  # Xi = {0,0,27} -> state 27<<32
        out, s1 = rng.erand48_sequence(s0, 3)
        # Manual LCG steps.
        st = np.uint64(27) << np.uint64(32)
        vals = []
        for _ in range(3):
            st = (st * rng.RAND48_MULT + rng.RAND48_ADD) & rng.RAND48_MASK
            vals.append(float(st) * 2.0**-48)
        np.testing.assert_allclose(out, vals, rtol=0, atol=0)
        assert s1 == st


class TestFilm:
    def test_tonemap_contract_c2(self):
        """toInt(x) = int(pow(clamp(x), 1/2.2)*255 + .5)."""
        xs = np.asarray([0.0, 0.25, 0.5, 0.75, 1.0, 1.5, -0.2], np.float32)
        got = np.asarray(film.tonemap_u8(jnp.asarray(xs)))
        expect = [
            int(math.pow(min(max(x, 0.0), 1.0), 1 / 2.2) * 255 + 0.5) for x in xs
        ]
        np.testing.assert_array_equal(got, expect)

    def test_ppm_roundtrip(self, tmp_path):
        img = (np.arange(2 * 3 * 3) % 256).astype(np.uint8).reshape(2, 3, 3)
        p = tmp_path / "t.ppm"
        film.write_ppm(str(p), img)
        back = film.read_ppm(str(p))
        np.testing.assert_array_equal(back, img)
        header = p.read_text().split("\n")[:3]
        assert header == ["P3", "3 2", "255"]  # C1 header format


class TestCamera:
    def test_basis_formulas_c5(self):
        cam = make_camera()
        lf = np.asarray(LOOKFROM)
        la = np.asarray(LOOKAT)
        w = (la - lf) / np.linalg.norm(la - lf)
        u = np.cross(w, [0.0, 1.0, 0.0])
        u /= np.linalg.norm(u)
        v = np.cross(u, w)
        hh = math.tan(math.radians(VFOV_DEG) / 2)
        ll = lf - u * hh - v * hh + w
        np.testing.assert_allclose(np.asarray(cam.origin), lf, atol=1e-5)
        np.testing.assert_allclose(np.asarray(cam.lower_left), ll, atol=1e-4)
        np.testing.assert_allclose(np.asarray(cam.horizontal), u * 2 * hh, atol=1e-5)
        np.testing.assert_allclose(np.asarray(cam.vertical), v * 2 * hh, atol=1e-5)

    def test_center_ray_points_at_lookat(self):
        cam = make_camera()
        o, d = primary_rays(
            cam, 512, 512,
            jnp.asarray([256]), jnp.asarray([255]),
            jnp.asarray([0.5]), jnp.asarray([0.5]),
        )
        w = np.asarray(LOOKAT) - np.asarray(LOOKFROM)
        w /= np.linalg.norm(w)
        np.testing.assert_allclose(np.asarray(d)[0], w, atol=2e-3)

    def test_row_flip_c4(self):
        """v = ((h-y-1) - 0.5 + xi)/h: row 0 is the TOP of the image."""
        cam = make_camera()
        _, d_top = primary_rays(
            cam, 64, 64, jnp.asarray([32]), jnp.asarray([0]),
            jnp.asarray([0.5]), jnp.asarray([0.5]),
        )
        _, d_bot = primary_rays(
            cam, 64, 64, jnp.asarray([32]), jnp.asarray([63]),
            jnp.asarray([0.5]), jnp.asarray([0.5]),
        )
        assert float(d_top[0, 1]) > float(d_bot[0, 1])


class TestVecMath:
    def test_cross_matches_numpy(self, rng_np):
        a = rng_np.standard_normal((32, 3)).astype(np.float32)
        b = rng_np.standard_normal((32, 3)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(vm.cross(jnp.asarray(a), jnp.asarray(b))),
            np.cross(a, b), atol=1e-5,
        )

    def test_reflect(self):
        d = jnp.asarray([[1.0, -1.0, 0.0]]) / math.sqrt(2)
        n = jnp.asarray([[0.0, 1.0, 0.0]])
        r = np.asarray(vm.reflect(d, n))
        np.testing.assert_allclose(r, [[1 / math.sqrt(2), 1 / math.sqrt(2), 0]], atol=1e-6)

    def test_orient_normal_c9(self):
        n = jnp.asarray([[0.0, 1.0, 0.0]])
        d_down = jnp.asarray([[0.0, -1.0, 0.0]])
        d_up = jnp.asarray([[0.0, 1.0, 0.0]])
        np.testing.assert_allclose(np.asarray(vm.orient_normal(n, d_down))[0], [0, 1, 0])
        np.testing.assert_allclose(np.asarray(vm.orient_normal(n, d_up))[0], [0, -1, 0])

    def test_onb_orthonormal(self, rng_np):
        w = rng_np.standard_normal((64, 3)).astype(np.float32)
        w /= np.linalg.norm(w, axis=1, keepdims=True)
        u, v = vm.onb_from_w(jnp.asarray(w))
        u, v = np.asarray(u), np.asarray(v)
        np.testing.assert_allclose((u * w).sum(1), 0, atol=1e-5)
        np.testing.assert_allclose((u * v).sum(1), 0, atol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(u, axis=1), 1, atol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1, atol=1e-5)


class TestSincos2Pi:
    """vm.sincos_2pi: the shared polynomial scatter-frame trig (every
    render path uses it; PERF.md 'polynomial sincos' — +6% kernel)."""

    def test_accuracy_dense(self):
        u = np.linspace(0, 1, 200001, endpoint=False).astype(np.float32)
        s, c = (np.asarray(x) for x in vm.sincos_2pi(jnp.asarray(u)))
        u64 = u.astype(np.float64)
        assert np.abs(s - np.sin(2 * np.pi * u64)).max() < 3e-7
        assert np.abs(c - np.cos(2 * np.pi * u64)).max() < 3e-7

    def test_quadrant_edges(self):
        # Quadrant boundaries: the fold puts each at a polynomial
        # endpoint (exact 0; 1 to within the fit's 6e-8 endpoint error).
        u = jnp.asarray([0.0, 0.25, 0.5, 0.75], jnp.float32)
        s, c = (np.asarray(x) for x in vm.sincos_2pi(u))
        np.testing.assert_allclose(s, [0.0, 1.0, 0.0, -1.0], atol=1e-7)
        np.testing.assert_allclose(c, [1.0, 0.0, -1.0, 0.0], atol=1e-7)

    def test_unit_magnitude(self, rng_np):
        u = rng_np.random(100000).astype(np.float32)
        s, c = (np.asarray(x) for x in vm.sincos_2pi(jnp.asarray(u)))
        np.testing.assert_allclose(s * s + c * c, 1.0, atol=1e-6)
