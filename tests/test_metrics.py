"""Metrics/observability tests."""

import json

import numpy as np

from small_pathtracer_tpu import RenderConfig, get_scene, make_camera
from small_pathtracer_tpu.utils.metrics import (
    occupancy_profile,
    render_with_stats,
)


def test_render_with_stats_json():
    scene = get_scene("cornell_box")
    cfg = RenderConfig(width=24, height=16, spp=4, estimator="nee")
    cam = make_camera(aspect=24 / 16)
    img, stats = render_with_stats(scene, cam, cfg, log=None)
    assert img.shape == (16, 24, 3)
    d = json.loads(stats.to_json())
    assert d["paths"] == 24 * 16 * 4
    assert d["mrays_per_s"] > 0
    # NEE intended-mode mean path length ~2.5 (SURVEY C13a measurement).
    assert 1.0 < d["mean_path_length"] < 5.0


def test_exact_path_length_on_specular_scene():
    """Regression (round-1 advisor finding): mean_path_length used a
    traces-per-bounce lookup (nee -> 2.0) that is wrong on scenes with
    SPEC/REFR content, where NEE probes fire only at diffuse vertices. The
    integrator now returns extend and probe counters separately and the
    stat is exact."""
    from small_pathtracer_tpu import render_counts

    scene = get_scene("smallpt_original")  # mirror + glass spheres
    cfg = RenderConfig(width=24, height=16, spp=4, estimator="nee")
    cam = make_camera(aspect=24 / 16)
    _, (extends, probes) = render_counts(scene, cam, cfg)
    # Specular/refractive bounces have no NEE probe => strictly fewer
    # probes than extends on this scene.
    assert 0 < probes < extends
    img, stats = render_with_stats(scene, cam, cfg, log=None)
    paths = cfg.width * cfg.height * cfg.spp
    assert stats.mean_path_length == round(extends / paths, 3)


def test_occupancy_decays():
    scene = get_scene("cornell_box")
    cfg = RenderConfig(width=24, height=16, spp=4, estimator="nee",
                       wavefront="scan")
    cam = make_camera(aspect=24 / 16)
    occ = occupancy_profile(scene, cam, cfg, max_bounces=48)
    assert occ[0] == 1.0
    # Occupancy collapses: by bounce 10 under 40% (this IS the regen
    # motivation).
    assert occ[min(10, len(occ) - 1)] < 0.4
    assert occ[-1] <= 0.01
