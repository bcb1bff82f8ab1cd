"""Model registry: named (scene, camera, config) bundles.

The reference hard-codes one model (/root/reference/src/smallpt.cpp:287-311
with the camera at :65,:521); the registry exposes every preset as a
renderable model with its own estimator default, and the HTTP server
resolves requests through it (cli/server.py).
"""

import pytest

from small_pathtracer_tpu import MODELS, get_model, render
from small_pathtracer_tpu.scene.types import num_objects


def test_every_model_renders():
    for name in MODELS:
        m = get_model(name, width=8, height=8, spp=1, max_bounces=4)
        assert m.name == name
        assert num_objects(m.scene) > 0
        img, traces = render(m.scene, m.camera, m.config)
        assert img.shape == (8, 8, 3)
        assert traces > 0


def test_model_estimator_defaults_and_overrides():
    # smallpt_original defaults to cosine sampling (original smallpt has no
    # NEE); explicit overrides win.
    assert get_model("smallpt_original").config.estimator == "cosine"
    assert get_model("cornell_box").config.estimator == "nee"
    m = get_model("smallpt_original", estimator="nee", spp=7)
    assert m.config.estimator == "nee" and m.config.spp == 7


def test_unknown_model_rejected():
    with pytest.raises(ValueError, match="unknown model"):
        get_model("not_a_model")
