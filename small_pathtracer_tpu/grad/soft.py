"""Soft-visibility rendering: silhouette-aware geometry gradients.

The pathwise AD in grad/adjoint.py differentiates shading along FIXED paths
and misses the visibility-discontinuity (silhouette) term: moving a sphere
changes WHICH object each ray hits, and the hard argmin in geometry.trace
has zero derivative (SURVEY.md section 7 hard part #3). The standard
remedies are edge/boundary sampling (exact, complex) or visibility
smoothing (soft rasterization). This module implements the latter for
primary visibility:

    w_i(tau) = softmax_i( -(t_i - min_j t_j) / tau )   over valid hits,
    L(pixel) = sum_i w_i * [ emission_i + direct-light(x_i, n_i) ]

As tau -> 0 this converges to the hard one-bounce (direct lighting)
renderer; at tau > 0 the mixture weights are smooth in every geometry
parameter, so d L / d (sphere center/radius, plane offsets, quad corners)
includes the silhouette term.

Shadow edges (v2): the light-visibility term is likewise smooth for
SPHERE occluders — per candidate hit, the transmittance toward the light
sample is

    T_i = hard_vis(rects/quads) * prod_s (1 - sigmoid((r_s - d_perp)/tau))

where d_perp is the shadow ray's closest-approach distance to sphere s
(axially gated to the segment). d T / d (sphere center, radius) is the
shadow-boundary gradient, so a blocker's position is recoverable from its
CAST SHADOW alone (tests/test_soft.py::test_recover_blocker_from_shadow —
impossible with a hard shadow probe). Rect/quad occluders stay hard (the
walls/boxes are not the geometry-fitting targets); indirect bounces stay
hard/ignored — use this as the geometry-fitting loss and the full path
tracer for appearance. Cost is O(K_candidates x K_objects) per path.

Multi-emitter scenes (scene.lights): the direct term draws a per-path
light index with the stop-gradient'ed selection probabilities
(sampling.light_select_probs) and importance-weights by 1/q_k — the
soft render then matches the wavefront's light-list NEE semantics.

Typical use (tests/test_soft.py): recover a sphere's position by Adam on
mse(soft_render(scene), soft_render(target_scene)) — the pathwise-only
gradient cannot do this at all when the sphere starts non-overlapping.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..camera.pinhole import CameraParams, primary_rays
from ..config import RenderConfig
from ..core import rng, vecmath as vm
from ..geometry.intersect import (
    MISS_T,
    intersect_quads,
    intersect_rects,
    intersect_spheres,
)
from ..integrator import sampling
from ..scene.types import Scene, object_arrays


def _per_object_hits(scene: Scene, o, d):
    """(N, K) hit distances for every object (MISS_T on miss), K in global
    id order (rects, quads, spheres)."""
    return jnp.concatenate(
        [
            intersect_rects(scene.rects, o, d),
            intersect_quads(scene.quads, o, d),
            intersect_spheres(scene.spheres, o, d),
        ],
        axis=1,
    )


def _object_normals(scene: Scene, o, d, ts):
    """(N, K, 3) oriented normals at each candidate hit point."""
    R = scene.rects.k.shape[0]
    Q = scene.quads.corner.shape[0]
    parts = []
    if R:
        eye = jnp.eye(3, dtype=o.dtype)
        n_rect = eye[scene.rects.axis]              # (R, 3)
        parts.append(jnp.broadcast_to(n_rect, (o.shape[0], R, 3)))
    if Q:
        n_quad = vm.norm(vm.cross(scene.quads.edge_u, scene.quads.edge_v))
        parts.append(jnp.broadcast_to(n_quad, (o.shape[0], Q, 3)))
    S = scene.spheres.radius.shape[0]
    if S:
        x = o[:, None, :] + ts[:, R + Q:, None] * d[:, None, :]
        parts.append(vm.norm(x - scene.spheres.center[None]))
    n_geom = jnp.concatenate(parts, axis=1)          # (N, K, 3)
    # Orient against the ray (C9).
    flip = jnp.sum(n_geom * d[:, None, :], axis=-1) < 0.0
    return jnp.where(flip[..., None], n_geom, -n_geom)


def soft_render(scene: Scene, cam: CameraParams, cfg: RenderConfig, seed,
                tau: float = 1.0):
    """Soft-visibility one-bounce (direct lighting) render.

    Returns the unclamped linear (h, w, 3) mean image; smooth in all scene
    geometry parameters for tau > 0."""
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

    ts = _per_object_hits(scene, o, d)              # (N, K)
    valid = ts < MISS_T
    t_min = jnp.min(ts, axis=1, keepdims=True)
    logits = jnp.where(valid, -(ts - t_min) / tau, -jnp.inf)
    # Soft weights; all-miss rays get zero weight everywhere.
    any_hit = jnp.any(valid, axis=1, keepdims=True)
    logits = jnp.where(any_hit, logits, 0.0)
    wts = jax.nn.softmax(logits, axis=1) * any_hit   # (N, K)

    albedo, emission, _ = object_arrays(scene)       # (K, 3)
    n = _object_normals(scene, o, d, ts)             # (N, K, 3)
    t_safe = jnp.where(valid, ts, 1.0)
    x = o[:, None, :] + t_safe[..., None] * d[:, None, :]  # (N, K, 3)

    # Direct light at each candidate hit: one light sample shared per
    # path. Multi-emitter scenes (scene.lights): per-path selection draw
    # with probability q_k (stop-gradient'ed, light_select_probs), the
    # chosen light point-sampled exactly like the single-light case, and
    # the estimate importance-weighted by 1/q_k — the soft-visibility
    # analogue of the wavefront's _select_light, unbiased for the SUM of
    # direct light over the list.
    from ..scene.types import SphereLight as _SL

    if isinstance(scene.light, _SL) or (
        scene.lights is not None and scene.lights.kind is not None
    ):
        raise NotImplementedError(
            "the soft-visibility estimator samples parallelogram lights; "
            "sphere-light scenes use the pathwise jnp adjoint "
            "(COVERAGE.md waiver)"
        )
    multi = scene.lights is not None
    lu = uniform(seed, path_id, jnp.uint32(2))
    lv = uniform(seed, path_id, jnp.uint32(3))
    if multi:
        probs = sampling.light_select_probs(
            scene.lights, emission, cfg.light_select
        )
        usel = uniform(seed, path_id, jnp.uint32(4))
        lidx = sampling.sample_light_index(probs, usel)       # (N,)
        lsamp = sampling.gather_light(scene.lights, lidx)
        lp = sampling.sample_light_point(lsamp, lu, lv)       # (N, 3)
        area, n_light = sampling.light_area_normal(lsamp)
        sel_obj = jnp.asarray(scene.lights.obj_id, jnp.int32)[lidx]
        inv_q = 1.0 / probs[lidx]                             # (N,)
    else:
        light = scene.light
        lp = sampling.sample_light_point(light, lu, lv)       # (N, 3)
        area, n_light = sampling.light_area_normal(light)
        sel_obj = jnp.broadcast_to(
            jnp.asarray(scene.light.light_obj_id, jnp.int32),
            (o.shape[0],),
        )
        inv_q = jnp.ones((o.shape[0],), o.dtype)
    wvec = lp[:, None, :] - x
    dist2 = jnp.sum(wvec * wvec, axis=-1)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-12))
    ldir = wvec / dist[..., None]
    n_light_b = n_light[:, None, :] if multi else n_light[None, None, :]
    area_b = area[:, None] if multi else area
    cos_s = jnp.maximum(jnp.sum(ldir * n, axis=-1), 0.0)
    cos_l = jnp.abs(jnp.sum(ldir * n_light_b, axis=-1))

    # Shadow transmittance per CANDIDATE hit (v2, module docstring):
    # hard visibility vs rects/quads, soft (sigmoid-boundary) vs spheres.
    N, K = ts.shape
    R = scene.rects.k.shape[0]
    Q = scene.quads.corner.shape[0]
    S = scene.spheres.radius.shape[0]
    xf = x.reshape(N * K, 3)
    lf = ldir.reshape(N * K, 3)
    distf = dist.reshape(N * K)
    # Per-candidate sampled-light id: only the light the path TARGETS is
    # transparent to its own shadow probe; other emitters in a list
    # occlude like any geometry (matching _diff_scatter's per-lane
    # success test).
    self_light = jnp.repeat(sel_obj, K)                     # (N*K,)
    eps = 1e-3
    vis = jnp.ones((N * K,), o.dtype)
    if R:
        t_r = intersect_rects(scene.rects, xf, lf)          # (N*K, R)
        is_light_obj = jnp.arange(R)[None, :] == self_light[:, None]
        blocked = jnp.any(
            (t_r > eps) & (t_r < distf[:, None] - eps) & ~is_light_obj,
            axis=1,
        )
        vis = vis * jnp.where(blocked, 0.0, 1.0)
    if Q:
        t_q = intersect_quads(scene.quads, xf, lf)
        is_light_obj = (
            (R + jnp.arange(Q))[None, :] == self_light[:, None]
        )
        blocked = jnp.any(
            (t_q > eps) & (t_q < distf[:, None] - eps) & ~is_light_obj,
            axis=1,
        )
        vis = vis * jnp.where(blocked, 0.0, 1.0)
    if S:
        # Soft sphere occlusion: closest-approach distance of the shadow
        # ray to each sphere center vs its radius, axially gated to the
        # (hit point, light sample) segment; candidate i never occludes
        # itself (it IS that surface).
        oc = scene.spheres.center[None, :, :] - xf[:, None, :]  # (NK, S, 3)
        proj = jnp.sum(oc * lf[:, None, :], axis=-1)            # (NK, S)
        dperp = jnp.sqrt(jnp.maximum(
            jnp.sum(oc * oc, axis=-1) - proj * proj, 1e-8
        ))
        axial = (proj > eps) & (proj < distf[:, None] - eps)
        occ = jax.nn.sigmoid(
            (scene.spheres.radius[None, :] - dperp) / tau
        ) * axial.astype(o.dtype)
        self_id = (
            jnp.arange(K)[:, None] == (R + Q + jnp.arange(S))[None, :]
        )  # (K, S)
        self_mask = jnp.tile(self_id, (N, 1))                   # (NK, S)
        occ = occ * (~self_mask).astype(o.dtype)
        vis = vis * jnp.prod(1.0 - occ, axis=1)
    lit = vis.reshape(N, K)

    e_light = emission[sel_obj]                      # (N, 3)
    direct = (
        albedo[None] / jnp.pi
        * e_light[:, None, :]
        * (cos_s * cos_l * area_b * inv_q[:, None]
           / jnp.maximum(dist2, 1e-6))[..., None]
        * lit[..., None]
    )
    shade = emission[None] + direct                  # (N, K, 3)
    L = jnp.sum(wts[..., None] * shade, axis=1)      # (N, 3)
    return L.reshape(h * w, spp, 3).mean(axis=1).reshape(h, w, 3)


@partial(jax.jit, static_argnums=(2, 5))
def soft_loss_and_grad(scene: Scene, cam: CameraParams, cfg: RenderConfig,
                       seed, target, tau: float = 1.0):
    """(mse, d mse/d scene) of the soft render vs a target image."""

    def loss(sc):
        img = soft_render(sc, cam, cfg, seed, tau)
        return jnp.mean((img - target) ** 2)

    return jax.value_and_grad(loss, allow_int=True)(scene)
