"""NaN/Inf audit (SURVEY.md section 5: the JAX answer to the reference's
nonexistent sanitizers): every estimator x scene combination renders and
differentiates to finite values. The double-where guards in the intersectors
/ RR / NEE weights are what this pins down."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import small_pathtracer_tpu as spt
from small_pathtracer_tpu.grad.adjoint import mse_loss, render_linear

SCENES = ["cornell_box", "cornell_spheres", "smallpt_original",
          "cornell_tilted_light"]
ESTS = ["uniform", "uniform_corrected", "cosine", "nee", "mixture"]


@pytest.mark.parametrize("scene_name", SCENES)
@pytest.mark.parametrize("est", ESTS)
def test_render_finite(scene_name, est):
    cfg = spt.RenderConfig(width=16, height=12, spp=4, estimator=est, seed=2)
    img, traces = spt.render(
        spt.get_scene(scene_name), spt.make_camera(aspect=16 / 12), cfg
    )
    assert np.all(np.isfinite(np.asarray(img)))
    assert np.isfinite(traces)


@pytest.mark.parametrize("scene_name", SCENES)
def test_gradients_finite(scene_name):
    scene = spt.get_scene(scene_name)
    cam = spt.make_camera(aspect=16 / 12)
    cfg = spt.RenderConfig(width=16, height=12, spp=2, estimator="nee", seed=3)
    target = render_linear(scene, cam, cfg, jnp.uint32(7), 8) * 1.1

    def loss(sc, c):
        return mse_loss(render_linear(sc, c, cfg, jnp.uint32(3), 8), target)

    g_scene, g_cam = jax.grad(loss, argnums=(0, 1), allow_int=True)(scene, cam)
    for leaf in jax.tree.leaves((g_scene, g_cam)):
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and arr.size:
            assert np.all(np.isfinite(arr)), (scene_name, arr)
