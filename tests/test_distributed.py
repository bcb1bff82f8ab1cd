"""Distributed tests on the 8-device virtual CPU mesh (SURVEY.md section 4.3):
sharded and unsharded renders of the same config must agree to float-sum
association (the per-sample radiance is bit-identical by RNG construction)."""

import numpy as np
import pytest

import jax

from small_pathtracer_tpu import RenderConfig, get_scene, make_camera, render
from small_pathtracer_tpu.parallel.mesh import make_mesh
from small_pathtracer_tpu.parallel.sharded import render_sharded


@pytest.fixture(scope="module")
def small_cfg():
    return RenderConfig(width=32, height=24, spp=8, estimator="nee", seed=7)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_sharded_matches_unsharded(small_cfg, mesh_shape):
    scene = get_scene("cornell_box")
    cam = make_camera(aspect=small_cfg.width / small_cfg.height)
    ref_img, ref_traces = render(scene, cam, small_cfg)
    mesh = make_mesh(mesh_shape=mesh_shape)
    img, traces = render_sharded(scene, cam, small_cfg, mesh)
    np.testing.assert_allclose(
        np.asarray(img), np.asarray(ref_img), rtol=2e-5, atol=2e-6
    )
    assert traces == pytest.approx(ref_traces, rel=1e-6)


def test_mesh_default_factoring():
    mesh = make_mesh()
    assert mesh.devices.size == 8
