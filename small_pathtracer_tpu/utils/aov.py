"""First-hit AOV (arbitrary-output-variable) feature buffers.

Per-pixel mean first-hit albedo, oriented shading normal, hit distance
("depth") and hit coverage, averaged over the SAME jittered primary rays the
renderer draws (the shared spawn recipe ``camera.pinhole.primary_rays_cfg``,
counters 0/1 + lens 2/3), so AOV edges carry exactly the beauty render's
anti-aliasing and sampler (``--sampler sobol`` stratifies them too).

The reference has no analogue — its only outputs are the beauty image and
console stats (/root/reference/src/smallpt.cpp:548-556). AOVs are framework
surface: the edge-aware denoiser (``utils/denoise.py``) consumes them as
filter guides, and the CLI can dump them (``render --aov``) for external
tooling.

One nearest-hit trace per sample (no bounces), so a spp-matched AOV pass
costs ~1/(mean path length x 2) of the beauty render.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..camera.pinhole import CameraParams, primary_rays_cfg
from ..config import RenderConfig
from ..core import ld, rng
from ..geometry import intersect
from ..scene.types import Scene


@partial(jax.jit, static_argnums=(2, 4))
def _aov_chunk(scene: Scene, cam: CameraParams, cfg: RenderConfig, seed,
               n_s: int, s0):
    """Accumulated first-hit AOVs for samples [s0, s0+n_s) of every pixel.

    Returns per-pixel SUMS over the chunk's samples: albedo (h*w, 3),
    oriented normal (h*w, 3), hit distance (h*w,), hit count (h*w,).
    Misses contribute zeros to every buffer (contract C15's stale-id shade
    is an integrator semantic, not a feature-buffer one — a feature buffer
    reporting wall material for an escaped ray would poison the denoiser's
    edge stops).
    """
    w, h, spp = cfg.width, cfg.height, cfg.spp
    uniform = ld.make_uniform_cfg(cfg, rng.make_uniform_fn(cfg.rng_backend))
    pix = jnp.arange(w * h, dtype=jnp.uint32)
    s = s0 + jnp.arange(n_s, dtype=jnp.uint32)
    # Same path-id packing as the renderer (wavefront._chunk_paths):
    # pixel-major / sample-minor.
    path_id = (pix[:, None] * jnp.uint32(spp) + s[None, :]).reshape(-1)
    px = jnp.broadcast_to(
        (pix[:, None] % jnp.uint32(w)).astype(jnp.int32), (w * h, n_s)
    ).reshape(-1)
    py = jnp.broadcast_to(
        (pix[:, None] // jnp.uint32(w)).astype(jnp.int32), (w * h, n_s)
    ).reshape(-1)
    o, d = primary_rays_cfg(cam, cfg, px, py, path_id, seed, uniform)
    hit = intersect.trace(scene, o, d)
    sh = intersect.shade_info(scene, o, d, hit)
    m = hit.hit.astype(o.dtype)
    alb = (sh.albedo * m[:, None]).reshape(w * h, n_s, 3).sum(axis=1)
    nrm = (sh.n * m[:, None]).reshape(w * h, n_s, 3).sum(axis=1)
    dep = (hit.t * m).reshape(w * h, n_s).sum(axis=1)
    cov = m.reshape(w * h, n_s).sum(axis=1)
    return alb, nrm, dep, cov


def render_aovs(scene: Scene, cam: CameraParams, cfg: RenderConfig,
                seed=None, spp: int | None = None) -> dict[str, jnp.ndarray]:
    """First-hit feature buffers for cfg's image.

    spp: number of primary samples to average (default: min(cfg.spp, 64) —
    feature buffers converge far faster than radiance). Sample indices
    0..spp-1 reuse the beauty render's own jitter draws.

    Returns a dict of (h, w, ...) arrays:
      - "albedo": (h, w, 3) mean first-hit albedo (0 where no sample hit);
      - "normal": (h, w, 3) mean oriented shading normal (NOT re-normalized:
        the magnitude dips below 1 exactly on geometric edges, which is
        useful signal for edge-stopping filters);
      - "depth": (h, w) mean hit distance over hitting samples (0 if none);
      - "coverage": (h, w) fraction of samples that hit anything.
    """
    if seed is None:
        seed = cfg.seed
    seed = jnp.uint32(seed)
    n_total = min(cfg.spp, 64) if spp is None else min(spp, cfg.spp)
    n_total = max(1, n_total)
    w, h = cfg.width, cfg.height
    # Chunk like the renderer: keep <= 2^22 rays per pass.
    budget = max(1, (1 << 22) // max(1, w * h))
    alb = jnp.zeros((w * h, 3), jnp.float32)
    nrm = jnp.zeros((w * h, 3), jnp.float32)
    dep = jnp.zeros((w * h,), jnp.float32)
    cov = jnp.zeros((w * h,), jnp.float32)
    s0 = 0
    while s0 < n_total:
        n_s = min(budget, n_total - s0)
        a, n, t, c = _aov_chunk(scene, cam, cfg, seed, n_s, jnp.uint32(s0))
        alb, nrm, dep, cov = alb + a, nrm + n, dep + t, cov + c
        s0 += n_s
    hits = jnp.maximum(cov, 1.0)
    return {
        "albedo": (alb / hits[:, None]).reshape(h, w, 3),
        "normal": (nrm / hits[:, None]).reshape(h, w, 3),
        "depth": (dep / hits).reshape(h, w),
        "coverage": (cov / n_total).reshape(h, w),
    }
