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
