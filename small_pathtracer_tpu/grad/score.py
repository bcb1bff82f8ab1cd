"""Score-function (REINFORCE) gradient correction for discrete decisions.

Reverse-mode AD through the wavefront (grad/adjoint.py) differentiates the
smooth chain (throughput, emission, geometry terms along FIXED paths) but
treats the discrete Russian-roulette survival decision as a constant — yet
its probability p = max(albedo) DEPENDS on the albedo being optimized, so
the pathwise gradient of E[L] w.r.t. albedo is biased (SURVEY.md section 7
"Hard parts" #3).

The fix is the standard score-function identity:

    d/dθ E[L] = E[ dL/dθ |paths fixed  +  L * d/dθ log P(decisions; θ) ]

implemented as a surrogate whose VALUE equals the plain estimate and whose
GRADIENT includes the REINFORCE term, with a per-pixel mean baseline for
variance reduction:

    L_surr = L + (L - baseline).stop_grad * (logp - logp.stop_grad)

Geometry discontinuities (hit-id flips at silhouettes, NEE visibility) are
NOT probability-driven and need edge/boundary sampling: grad/edge.py now
estimates the primary-silhouette boundary term for spheres (analytic limb
sampling + jacfwd screen velocities); shadow/secondary boundaries remain
with grad/soft.py's softened visibility. The RR term here is the piece
that affects the BASELINE.json albedo-optimization configs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..camera.pinhole import CameraParams, primary_rays
from ..config import RenderConfig
from ..core import rng
from ..integrator.wavefront import path_trace_fixed
from ..scene.types import Scene
from .adjoint import DEFAULT_AD_BOUNCES


def render_linear_sf(scene: Scene, cam: CameraParams, cfg: RenderConfig,
                     seed, n_bounces: int = DEFAULT_AD_BOUNCES) -> jnp.ndarray:
    """Differentiable unclamped linear mean image whose gradient includes
    the RR score-function term. Forward value is identical to
    adjoint.render_linear."""
    w, h, spp = cfg.width, cfg.height, cfg.spp
    uniform = rng.make_uniform_fn(cfg.rng_backend)
    pix = jnp.arange(w * h, dtype=jnp.uint32)
    s = jnp.arange(spp, dtype=jnp.uint32)
    path_id = (pix[:, None] * jnp.uint32(spp) + s[None, :]).reshape(-1)
    px = jnp.broadcast_to(
        (pix[:, None] % jnp.uint32(w)).astype(jnp.int32), (w * h, spp)
    ).reshape(-1)
    py = jnp.broadcast_to(
        (pix[:, None] // jnp.uint32(w)).astype(jnp.int32), (w * h, spp)
    ).reshape(-1)
    ju = uniform(seed, path_id, jnp.uint32(0))
    jv = uniform(seed, path_id, jnp.uint32(1))
    o, d = primary_rays(cam, w, h, px, py, ju, jv)
    L, _, logp = path_trace_fixed(
        scene, cfg, seed, o, d, path_id, n_bounces, want_logp=True
    )
    L = L.reshape(h * w, spp, 3)
    logp = logp.reshape(h * w, spp, 1)
    # Leave-one-out baseline: a baseline containing the current sample
    # scales the score term by (1 - 1/spp) — a classic REINFORCE bias
    # (measured: exactly 2x-low gradients at spp=2 before this fix).
    if spp > 1:
        sum_L = L.sum(axis=1, keepdims=True)
        baseline = (sum_L - L) / (spp - 1)
    else:
        baseline = jnp.zeros_like(L)
    advantage = jax.lax.stop_gradient(L - baseline)
    surr = L + advantage * (logp - jax.lax.stop_gradient(logp))
    return surr.mean(axis=1).reshape(h, w, 3)
