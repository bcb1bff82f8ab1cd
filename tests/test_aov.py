"""First-hit AOV feature buffers (utils/aov.py).

The reference has no feature outputs (its only artifacts are the beauty
image and console stats, smallpt.cpp:548-556); these pins are against the
scene/camera contract instead: the center ray of the reference camera (C5,
lookfrom (50,40,168) -> lookat (50,40,5)) hits the front wall (id 0, albedo
0.75, plane z=0, smallpt.cpp:288) head-on at distance ~168.
"""

import numpy as np
import pytest

from small_pathtracer_tpu import RenderConfig, get_scene, make_camera
from small_pathtracer_tpu.utils.aov import render_aovs

W, H = 32, 24


@pytest.fixture(scope="module")
def aovs_box():
    cfg = RenderConfig(width=W, height=H, spp=8)
    return render_aovs(get_scene("cornell_box"), make_camera(aspect=W / H),
                       cfg)


def test_shapes_and_ranges(aovs_box):
    a = {k: np.asarray(v) for k, v in aovs_box.items()}
    assert a["albedo"].shape == (H, W, 3)
    assert a["normal"].shape == (H, W, 3)
    assert a["depth"].shape == (H, W)
    assert a["coverage"].shape == (H, W)
    assert (a["albedo"] >= 0).all() and (a["albedo"] <= 1).all()
    assert (a["coverage"] >= 0).all() and (a["coverage"] <= 1).all()
    assert (a["depth"] >= 0).all()
    # Mean-of-unit-vectors magnitude is <= 1, and dips only on edges.
    mag = np.linalg.norm(a["normal"], axis=-1)
    assert (mag <= 1.0 + 1e-5).all()


def test_closed_box_full_coverage(aovs_box):
    # The camera is inside the (closed) Cornell box: every jittered primary
    # ray hits geometry.
    assert float(np.asarray(aovs_box["coverage"]).min()) == 1.0


def test_center_pixel_is_front_wall(aovs_box):
    # C5 camera looks straight down -z from (50,40,168); the center pixel's
    # first hit is the front wall: z=0 plane, albedo (.75,.75,.75), normal
    # oriented back toward the ray = +z, depth ~ 168 (smallpt.cpp:288).
    y, x = H // 2, W // 2
    alb = np.asarray(aovs_box["albedo"])[y, x]
    nrm = np.asarray(aovs_box["normal"])[y, x]
    dep = float(np.asarray(aovs_box["depth"])[y, x])
    np.testing.assert_allclose(alb, [0.75, 0.75, 0.75], atol=1e-5)
    np.testing.assert_allclose(nrm, [0.0, 0.0, 1.0], atol=1e-3)
    assert abs(dep - 168.0) < 2.0


def test_deterministic(aovs_box):
    cfg = RenderConfig(width=W, height=H, spp=8)
    again = render_aovs(get_scene("cornell_box"), make_camera(aspect=W / H),
                        cfg)
    for k in aovs_box:
        np.testing.assert_array_equal(np.asarray(aovs_box[k]),
                                      np.asarray(again[k]))


def test_spp_clamped_to_config():
    # Requesting more AOV samples than the render budget clamps to cfg.spp
    # (the AOV pass reuses the beauty render's own jitter draws 0..spp-1).
    cfg = RenderConfig(width=8, height=8, spp=2)
    scene, cam = get_scene("cornell_box"), make_camera(aspect=1.0)
    a = render_aovs(scene, cam, cfg, spp=64)
    b = render_aovs(scene, cam, cfg, spp=2)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_sphere_scene_normals_curved():
    # cornell_spheres: sphere pixels have non-axis normals; magnitude of
    # the per-pixel MEAN normal is ~1 in the sphere interior (all samples
    # agree) and the oriented normal faces the camera (+z half-space).
    cfg = RenderConfig(width=48, height=36, spp=4)
    a = render_aovs(get_scene("cornell_spheres"),
                    make_camera(aspect=48 / 36), cfg)
    n = np.asarray(a["normal"])
    mag = np.linalg.norm(n, axis=-1)
    # Some pixel must be a genuinely curved-surface pixel: unit-ish normal
    # that is NOT axis-aligned.
    axisness = np.abs(n).max(axis=-1)
    curved = (mag > 0.99) & (axisness < 0.95)
    assert curved.sum() > 20
