"""Model registry: named (scene, camera, config) bundles — the renderable
"model families" of this framework.

The reference has exactly one hard-coded model (the Cornell box at
/root/reference/src/smallpt.cpp:287-311 with the camera at :65,:521); the
historic PPM renders document a second (sphere) variant, and original smallpt
(which the reference derives from, README.md:3-4) a third with SPEC/REFR
materials. All three are first-class here.
"""

from __future__ import annotations

from typing import NamedTuple

from ..camera.pinhole import CameraParams, make_camera
from ..config import RenderConfig
from ..scene.presets import get_scene
from ..scene.types import Scene


class RenderModel(NamedTuple):
    name: str
    scene: Scene
    camera: CameraParams
    config: RenderConfig


def _default_camera(aspect: float) -> CameraParams:
    return make_camera(aspect=aspect)


def get_model(name: str, **config_overrides) -> RenderModel:
    """Build a named model (every scene preset is a model; each carries its
    own estimator default — e.g. smallpt_original renders with cosine
    sampling like original smallpt). config_overrides feed RenderConfig."""
    defaults = {
        "cornell_box": dict(estimator="nee"),
        "cornell_spheres": dict(estimator="nee"),
        "smallpt_original": dict(estimator="cosine"),
        "cornell_tilted_light": dict(estimator="nee"),
        "cornell_twolights": dict(estimator="nee"),
        # GLOS (glossy) extension scenes: mis is the natural estimator
        # (scene/presets.veach_mis is Veach's MIS showcase).
        "cornell_glossy": dict(estimator="mis"),
        "veach_mis": dict(estimator="mis"),
        "sphere_grid": dict(estimator="nee"),
        # Scalability-ladder scenes (megakernel sphere table, PERF.md).
        "sphere_grid_256": dict(estimator="nee"),
        "sphere_grid_1024": dict(estimator="nee"),
    }
    if name not in defaults:
        raise ValueError(f"unknown model {name!r}; one of {sorted(defaults)}")
    kw = dict(defaults[name])
    kw.update(config_overrides)
    cfg = RenderConfig(**kw)
    cam = _default_camera(cfg.width / cfg.height)
    return RenderModel(
        name=name, scene=get_scene(name), camera=cam, config=cfg
    )


MODELS = tuple(
    ("cornell_box", "cornell_spheres", "smallpt_original",
     "cornell_tilted_light", "cornell_twolights", "cornell_glossy",
     "veach_mis", "sphere_grid", "sphere_grid_256", "sphere_grid_1024")
)
