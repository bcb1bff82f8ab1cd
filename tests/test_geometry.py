"""Unit tests for the batched intersectors vs closed-form cases.

Covers contract C8/C9 edge cases (SURVEY.md section 4.3): miss-as-zero
semantics, behind-origin rejection, inclusive bounds, two-sided normal flip,
sphere eps and root selection.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from small_pathtracer_tpu.geometry.intersect import (
    MISS_T,
    SPHERE_EPS,
    intersect_rects,
    intersect_spheres,
    shade_info,
    trace,
)
from small_pathtracer_tpu.scene.presets import get_scene
from small_pathtracer_tpu.scene.types import DIFF, LightSampler, make_scene


def _mono_rect_scene(axis, k, lo, hi):
    light = LightSampler(
        corner=jnp.zeros(3), edge_u=jnp.eye(3)[0], edge_v=jnp.eye(3)[2],
        light_obj_id=jnp.asarray(0, jnp.int32),
    )
    return make_scene(
        [(axis, k, lo, hi, (1.0, 1.0, 1.0), (0.0, 0.0, 0.0), DIFF)], [], light
    )


def _rays(os_, ds_):
    o = jnp.asarray(os_, jnp.float32)
    d = jnp.asarray(ds_, jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


class TestRect:
    def test_direct_hit_distance(self):
        # xz-rect (normal axis y) at y=10, x in [0,4], z in [0,4]
        sc = _mono_rect_scene(1, 10.0, (0.0, 0.0), (4.0, 4.0))
        o, d = _rays([[2.0, 0.0, 2.0]], [[0.0, 1.0, 0.0]])
        t = intersect_rects(sc.rects, o, d)
        assert np.allclose(np.asarray(t), [[10.0]])

    def test_out_of_bounds_misses(self):
        sc = _mono_rect_scene(1, 10.0, (0.0, 0.0), (4.0, 4.0))
        o, d = _rays([[5.0, 0.0, 2.0]], [[0.0, 1.0, 0.0]])
        assert float(intersect_rects(sc.rects, o, d)[0, 0]) == pytest.approx(MISS_T, rel=1e-6)

    def test_boundary_inclusive(self):
        # The reference rejects only strict < lo / > hi (smallpt.cpp:106).
        sc = _mono_rect_scene(1, 10.0, (0.0, 0.0), (4.0, 4.0))
        o, d = _rays([[4.0, 0.0, 0.0]], [[0.0, 1.0, 0.0]])
        assert float(intersect_rects(sc.rects, o, d)[0, 0]) == pytest.approx(10.0)

    def test_behind_origin_misses(self):
        sc = _mono_rect_scene(1, 10.0, (0.0, 0.0), (4.0, 4.0))
        o, d = _rays([[2.0, 20.0, 2.0]], [[0.0, 1.0, 0.0]])
        assert float(intersect_rects(sc.rects, o, d)[0, 0]) == pytest.approx(MISS_T, rel=1e-6)

    def test_parallel_ray_misses(self):
        sc = _mono_rect_scene(1, 10.0, (0.0, 0.0), (4.0, 4.0))
        o, d = _rays([[2.0, 0.0, 2.0]], [[1.0, 0.0, 0.0]])
        assert float(intersect_rects(sc.rects, o, d)[0, 0]) == pytest.approx(MISS_T, rel=1e-6)

    def test_two_sided(self):
        # Hit from above (direction -y) also intersects (two-sided, C7).
        sc = _mono_rect_scene(1, 10.0, (0.0, 0.0), (4.0, 4.0))
        o, d = _rays([[2.0, 20.0, 2.0]], [[0.0, -1.0, 0.0]])
        assert float(intersect_rects(sc.rects, o, d)[0, 0]) == pytest.approx(10.0)

    def test_oriented_normal_faces_ray(self):
        sc = _mono_rect_scene(1, 10.0, (0.0, 0.0), (4.0, 4.0))
        for dy, expect in [(1.0, -1.0), (-1.0, 1.0)]:
            o, d = _rays([[2.0, 10.0 - dy * 10.0, 2.0]], [[0.0, dy, 0.0]])
            h = trace(sc, o, d)
            sh = shade_info(sc, o, d, h)
            assert np.allclose(np.asarray(sh.n)[0], [0.0, expect, 0.0])


class TestSphere:
    def _scene(self, center, rad):
        light = LightSampler(
            corner=jnp.zeros(3), edge_u=jnp.eye(3)[0], edge_v=jnp.eye(3)[2],
            light_obj_id=jnp.asarray(0, jnp.int32),
        )
        return make_scene(
            [], [(center, rad, (1.0, 1.0, 1.0), (0.0, 0.0, 0.0), DIFF)], light
        )

    def test_near_root(self):
        sc = self._scene((0.0, 0.0, 10.0), 2.0)
        o, d = _rays([[0.0, 0.0, 0.0]], [[0.0, 0.0, 1.0]])
        t = intersect_spheres(sc.spheres, o, d)
        assert float(t[0, 0]) == pytest.approx(8.0, abs=1e-4)

    def test_inside_far_root(self):
        # Origin inside the sphere: near root <= eps, far root returned
        # (smallpt.cpp:238).
        sc = self._scene((0.0, 0.0, 0.0), 2.0)
        o, d = _rays([[0.0, 0.0, 0.0]], [[0.0, 0.0, 1.0]])
        assert float(intersect_spheres(sc.spheres, o, d)[0, 0]) == pytest.approx(2.0, abs=1e-4)

    def test_miss(self):
        sc = self._scene((0.0, 0.0, 10.0), 2.0)
        o, d = _rays([[0.0, 5.0, 0.0]], [[0.0, 0.0, 1.0]])
        assert float(intersect_spheres(sc.spheres, o, d)[0, 0]) == pytest.approx(MISS_T, rel=1e-6)

    def test_behind(self):
        sc = self._scene((0.0, 0.0, -10.0), 2.0)
        o, d = _rays([[0.0, 0.0, 0.0]], [[0.0, 0.0, 1.0]])
        assert float(intersect_spheres(sc.spheres, o, d)[0, 0]) == pytest.approx(MISS_T, rel=1e-6)

    def test_inside_normal_flipped(self):
        sc = self._scene((0.0, 0.0, 0.0), 2.0)
        o, d = _rays([[0.0, 0.0, 0.0]], [[0.0, 0.0, 1.0]])
        h = trace(sc, o, d)
        sh = shade_info(sc, o, d, h)
        # Hit at (0,0,2); outward normal (0,0,1) flips to face the ray.
        assert np.allclose(np.asarray(sh.n)[0], [0.0, 0.0, -1.0], atol=1e-5)


class TestSceneTrace:
    def test_nearest_wins(self, cornell_box):
        # From the camera toward the light: nearest hit along +y from below
        # the light must be the light (id 6) not the ceiling (id 5).
        o, d = _rays([[50.0, 40.0, 80.0]], [[0.0, 1.0, 0.0]])
        h = trace(cornell_box, o, d)
        assert int(h.obj_id[0]) == 6
        assert float(h.t[0]) == pytest.approx(41.5, abs=1e-3)

    def test_miss_semantics_c15(self, cornell_box):
        # Escape through the missing z in (96..170 gap? none) — use a ray
        # escaping through the open z=170.. no wall beyond the box: aim
        # outside all bounds (x below 1 wall bound from inside-left).
        o, d = _rays([[50.0, 200.0, 300.0]], [[0.0, 1.0, 0.0]])
        h = trace(cornell_box, o, d)
        assert not bool(h.hit[0])
        assert int(h.obj_id[0]) == 0  # stale id 0
        sh = shade_info(cornell_box, o, d, h)
        assert np.allclose(np.asarray(sh.x)[0], 0.0)  # Vec() on miss
        assert np.allclose(np.asarray(sh.albedo)[0], 0.75)  # rect 0 material

    def test_cornell_17_objects(self, cornell_box):
        from small_pathtracer_tpu.scene.types import num_objects

        assert num_objects(cornell_box) == 17

    def test_camera_primary_hits_scene(self, cornell_box, camera):
        from small_pathtracer_tpu.camera.pinhole import primary_rays

        px = jnp.asarray([256], jnp.int32)
        py = jnp.asarray([256], jnp.int32)
        half = jnp.asarray([0.5], jnp.float32)
        o, d = primary_rays(camera, 512, 512, px, py, half, half)
        h = trace(cornell_box, o, d)
        assert bool(h.hit[0])


class TestQuad:
    def _scene(self, corner, eu, ev):
        light = LightSampler(
            corner=jnp.zeros(3), edge_u=jnp.eye(3)[0], edge_v=jnp.eye(3)[2],
            light_obj_id=jnp.asarray(0, jnp.int32),
        )
        return make_scene(
            [], [], light,
            quads=[(corner, eu, ev, (1.0, 1.0, 1.0), (0.0, 0.0, 0.0), DIFF)],
        )

    def test_axis_aligned_quad_matches_rect_math(self):
        # Quad equivalent to an xz-rect at y=10, x/z in [0,4].
        sc = self._scene((0.0, 10.0, 0.0), (4.0, 0.0, 0.0), (0.0, 0.0, 4.0))
        from small_pathtracer_tpu.geometry.intersect import intersect_quads

        o, d = _rays([[2.0, 0.0, 2.0]], [[0.0, 1.0, 0.0]])
        assert float(intersect_quads(sc.quads, o, d)[0, 0]) == pytest.approx(10.0)
        o, d = _rays([[5.0, 0.0, 2.0]], [[0.0, 1.0, 0.0]])  # out of bounds
        assert float(intersect_quads(sc.quads, o, d)[0, 0]) == pytest.approx(MISS_T, rel=1e-6)

    def test_tilted_quad_hit_and_normal(self):
        # 45-degree tilted quad; ray straight down the plane normal region.
        sc = self._scene((0.0, 0.0, 0.0), (2.0, 0.0, 0.0), (0.0, 2.0, 2.0))
        o, d = _rays([[1.0, 5.0, 1.0]], [[0.0, -1.0, 0.0]])
        h = trace(sc, o, d)
        assert bool(h.hit[0])
        sh = shade_info(sc, o, d, h)
        # normal = normalize(cross(eu, ev)) = (0, -1, 1)/sqrt(2), oriented
        # against the downward ray => +y component positive.
        n = np.asarray(sh.n)[0]
        assert n[1] > 0.5
        np.testing.assert_allclose(abs(n[1]), abs(n[2]), atol=1e-5)

    def test_two_sided(self):
        sc = self._scene((0.0, 10.0, 0.0), (4.0, 0.0, 0.0), (0.0, 0.0, 4.0))
        o, d = _rays([[2.0, 20.0, 2.0]], [[0.0, -1.0, 0.0]])
        h = trace(sc, o, d)
        assert bool(h.hit[0]) and float(h.t[0]) == pytest.approx(10.0)


def test_tilted_light_scene_renders():
    """BASELINE config #3: NEE with a tilted-plane light."""
    import small_pathtracer_tpu as spt

    scene = get_scene("cornell_tilted_light")
    from small_pathtracer_tpu.scene.types import num_objects

    assert num_objects(scene) == 17
    cfg = spt.RenderConfig(width=32, height=32, spp=8, estimator="nee", seed=2)
    img, traces = spt.render(scene, spt.make_camera(), cfg)
    img = np.asarray(img)
    assert img.max() > 0.9        # light visible
    assert 0.05 < img.mean() < 0.9
    assert traces > 0


class TestGiantSphereRobustness:
    """The recentered/rejection-form quadratic (intersect_spheres docstring)
    must make radius-1e5 giant-sphere walls usable in f32 — the
    original-smallpt scene representation the textbook discriminant cannot
    support (round-4 VERDICT item 4)."""

    def _spheres(self, dtype):
        centers = [
            (1e5 + 1, 40.8, 81.6), (-1e5 + 99, 40.8, 81.6),
            (50.0, 40.8, 1e5), (50.0, 40.8, -1e5 + 170),
            (50.0, 1e5, 81.6), (50.0, -1e5 + 81.6, 81.6),
            (27.0, 16.5, 47.0), (73.0, 16.5, 78.0),
            (50.0, 681.6 - 0.27, 81.6),
        ]
        radii = [1e5] * 6 + [16.5, 16.5, 600.0]
        from small_pathtracer_tpu.scene.types import Spheres

        n = len(radii)
        return Spheres(
            center=jnp.asarray(centers, dtype),
            radius=jnp.asarray(radii, dtype),
            albedo=jnp.zeros((n, 3), dtype),
            emission=jnp.zeros((n, 3), dtype),
            refl=jnp.zeros((n,), jnp.int32),
            gloss=jnp.zeros((n,), dtype),
        )

    @staticmethod
    def _oracle_f64(centers, radii, o, d):
        """Reference-semantics nearest hit in numpy float64 (the oracle)."""
        op = centers[None] - o[:, None]
        b = np.sum(op * d[:, None], -1)
        det = b * b - np.sum(op * op, -1) + radii * radii
        sd = np.sqrt(np.maximum(det, 0))
        tn, tf = b - sd, b + sd
        t = np.where(tn > SPHERE_EPS, tn, tf)
        return np.where((det > 0) & (t > SPHERE_EPS), t, MISS_T).min(axis=1)

    def test_f32_nearest_hit_vs_f64_oracle(self):
        """Nearest-hit t error < 1e-3 of scene scale (~100 units) at p99."""
        rng = np.random.default_rng(0)
        n = 20000
        o = rng.uniform([1, 0, 0], [99, 81.6, 170], (n, 3))
        d = rng.normal(size=(n, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        sph = self._spheres(jnp.float32)
        t64 = self._oracle_f64(
            np.asarray(sph.center, np.float64),
            np.asarray(sph.radius, np.float64), o, d,
        )
        t32 = np.asarray(
            intersect_spheres(
                self._spheres(jnp.float32),
                jnp.asarray(o, jnp.float32),
                jnp.asarray(d, jnp.float32),
            )
        ).min(axis=1)
        err = np.abs(t32 - t64)
        scene_scale = 100.0
        assert np.percentile(err, 99) / scene_scale < 1e-3
        assert np.median(err) / scene_scale < 1e-4

    def test_no_self_hit_acne_on_giant_sphere(self):
        """THE f32 giant-sphere killer: a bounce origin rounded onto a
        radius-1e5 surface re-intersects its own sphere with spurious
        t ~ 4e-6*r ~ 0.4 — far above the reference's fixed eps = 1e-4.
        The radius-scaled eps floor (SPHERE_EPS_REL) must reject every
        such self-hit while keeping true hits from across the room."""
        rng = np.random.default_rng(1)
        sph = self._spheres(jnp.float32)
        centers = np.asarray(sph.center, np.float64)
        radii = np.asarray(sph.radius, np.float64)
        n = 4000
        # Points ON the floor sphere (id 4, center (50, 1e5, 81.6) r=1e5)
        # inside the room footprint, f32-rounded like a real hit point.
        x = rng.uniform(1, 99, n)
        z = rng.uniform(0, 170, n)
        cy, r = 1e5, 1e5
        y = cy - np.sqrt(r * r - (x - 50.0) ** 2 - (z - 81.6) ** 2)
        o = np.stack([x, y, z], 1).astype(np.float32)
        # Upward cosine-ish bounce directions (away from the floor).
        d = rng.normal(size=(n, 3))
        d[:, 1] = np.abs(d[:, 1]) + 0.05
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        d = d.astype(np.float32)
        ts = np.asarray(intersect_spheres(sph, jnp.asarray(o), jnp.asarray(d)))
        # Floor sphere (index 4): an upward ray's true re-hit is the FAR
        # side of the giant sphere (t ~ 2e5 scale) or a miss — never a
        # sub-unit t. Any t < 100 is acne.
        acne = ts[:, 4] < 100.0
        assert not np.any(acne), f"{acne.sum()} self-hits"
        # Sanity: the same rays still find the ceiling sphere (id 5)
        # overhead at a sane distance (true hits are not rejected).
        up = d[:, 1] > 0.7
        assert np.all(ts[up, 5] < 200.0)

    def test_small_sphere_exactness_preserved(self):
        """Scene-scale spheres: the robust form agrees with closed-form
        geometry to f32 rounding (no regression for normal scenes)."""
        sph = self._spheres(jnp.float32)
        o, d = _rays([[27.0, 16.5, 100.0]], [[0.0, 0.0, -1.0]])
        t = np.asarray(intersect_spheres(sph, o, d))[0, 6]
        assert t == pytest.approx(100.0 - 47.0 - 16.5, abs=1e-3)
