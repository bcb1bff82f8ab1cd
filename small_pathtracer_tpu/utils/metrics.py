"""Structured render metrics / observability (SURVEY.md section 5).

The reference's diagnostics are a per-row stderr progress meter and three
stdout printouts — one of them broken: its PATH LENGTH stat accumulates the
1e20 miss sentinel (/root/reference/src/smallpt.cpp:478,543 — measured
2.0e19). This module provides the fixed equivalents: per-render stats
(rays/s, paths/s, mean path length computed from real bounces only) and an
instrumented render that reports per-bounce live-lane occupancy — the
number the wavefront schedule (regen vs scan) is tuned by.
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp

from ..camera.pinhole import CameraParams
from ..config import RenderConfig
from ..integrator import wavefront
from ..scene.types import Scene


@dataclasses.dataclass
class RenderStats:
    width: int
    height: int
    spp: int
    estimator: str
    wavefront: str
    wall_s: float
    traces: float
    mrays_per_s: float
    paths: int
    mean_path_length: float  # bounces per path (the fixed C17 stat)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))


def render_with_stats(scene: Scene, cam: CameraParams, cfg: RenderConfig,
                      log=sys.stderr):
    """Render + RenderStats. Mean path length counts real bounces exactly
    (extend traces / paths — the integrator returns extend and NEE-probe
    counters separately), unlike the reference's broken C17 stat and
    unlike an estimator-based traces-per-bounce guess (which is wrong on
    SPEC/REFR scenes, where NEE probes fire only at diffuse vertices)."""
    t0 = time.perf_counter()
    img, (extends, probes) = wavefront.render_counts(scene, cam, cfg)
    img = jax.block_until_ready(img)
    wall = time.perf_counter() - t0
    paths = cfg.width * cfg.height * cfg.spp
    traces = extends + probes
    stats = RenderStats(
        width=cfg.width, height=cfg.height, spp=cfg.spp,
        estimator=cfg.estimator, wavefront=cfg.wavefront,
        wall_s=round(wall, 4), traces=traces,
        mrays_per_s=round(traces / wall / 1e6, 6),
        paths=paths,
        mean_path_length=round(extends / paths, 3),
    )
    if log is not None:
        print(stats.to_json(), file=log)
    return img, stats


def occupancy_profile(scene: Scene, cam: CameraParams, cfg: RenderConfig,
                      max_bounces: int = 64):
    """Per-bounce live-lane fraction of the fixed-slot wavefront — the
    diagnostic behind the regen schedule (SURVEY section 7 hard part #1).

    Returns a list of floats (len <= max_bounces), alive fraction at the
    start of each bounce, for one spp chunk."""
    from ..integrator.wavefront import bounce_step, init_paths, _chunk_paths

    n_s = min(cfg.spp, cfg.resolved_spp_chunk())
    o, d, pid = _chunk_paths(cam, cfg, jnp.uint32(cfg.seed), jnp.uint32(0), n_s)
    state = init_paths(o, d, pid)
    fractions = []
    for _ in range(max_bounces):
        frac = float(jnp.mean(state.alive.astype(jnp.float32)))
        fractions.append(frac)
        if frac == 0.0:
            break
        state = bounce_step(scene, cfg, jnp.uint32(cfg.seed), state)
    return fractions
