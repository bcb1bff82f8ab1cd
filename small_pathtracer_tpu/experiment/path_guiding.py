"""Voxel path guiding — the reference's RL state-space idea, made real.

The reference's Q-learning side quest (SURVEY.md section 0 program (2);
/root/reference/src/smallpt.cpp:383-406,424-442) builds a voxel-quantized
state dictionary but never feeds it back into rendering — at HEAD it only
false-colors the image. This module completes the idea the reference was
reaching for: learn a per-voxel "bright direction" from a cheap training
pass, then importance-sample scattering toward it through a DEFENSIVE
MIXTURE, which keeps the estimator unbiased:

    pass 1 (train): plain cosine render; every emission pickup deposits its
        luminance-weighted incoming direction into the voxel of the vertex
        it left — a (V, 3) moment table (one scatter-add per bounce).
    pass 2 (guide): at each diffuse bounce in voxel v with a confident
        lobe mu_v, sample   beta * power-cosine(k)-around-mu_v  +
        (1-beta) * cosine-around-n   and weight by the true mixture pdf:

            w = (cos_n / pi) / (beta * pdf_lobe + (1 - beta) * cos_n / pi)
            pdf_lobe = (k+1)/(2 pi) * max(cos_mu, 0)^k

        (the baseline cosine estimator has w == 1; voxels without a lobe
        fall back to it exactly). Any beta < 1 keeps every direction with
        cos_n > 0 reachable, so the estimator stays unbiased for ANY lobe
        and ANY sharpness k — the guide only shapes variance.

Voxels follow the reference's 10-unit quantization over its grid-scan
bounds (x in [0,100), y in [-1,85), z in [-1,171), smallpt.cpp:386-388).
This is the jnp-path demo (scan schedule, fixed depth); fusing the guide
table into the megakernel (VMEM-resident (V,3) lookup) is future work.

Measured (tests/test_path_guiding.py): on a small-light Cornell variant,
guided MSE is well below cosine MSE at equal spp while the high-spp means
agree (unbiasedness).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..camera.pinhole import CameraParams, primary_rays
from ..config import RenderConfig
from ..core import rng, vecmath as vm
from ..geometry.intersect import shade_info, trace
from ..integrator import sampling
from ..scene.types import DIFF, Scene

# Reference grid-scan bounds (smallpt.cpp:386-388), 10-unit voxels.
_LO = np.array([0.0, -1.0, -1.0], np.float32)
_HI = np.array([100.0, 85.0, 171.0], np.float32)
_NVOX = tuple(int(v) for v in np.ceil((_HI - _LO) / 10.0))  # (10, 9, 18)
N_VOXELS = _NVOX[0] * _NVOX[1] * _NVOX[2]


def voxel_id(x) -> jnp.ndarray:
    """(N,3) points -> (N,) flat voxel ids (clamped into the grid)."""
    ix = jnp.clip(
        jnp.floor((x - _LO[None]) / 10.0).astype(jnp.int32),
        0, jnp.asarray(_NVOX, jnp.int32) - 1,
    )
    return (ix[:, 0] * _NVOX[1] + ix[:, 1]) * _NVOX[2] + ix[:, 2]


def _require_diffuse(scene: Scene, what: str) -> None:
    """The guiding demo implements the DIFFUSE cosine estimator only —
    SPEC/REFR vertices would be silently mis-scattered (review finding).
    Use the wavefront/megakernel renderers for mixed-material scenes."""
    refl = np.concatenate([
        np.asarray(scene.rects.refl).ravel(),
        np.asarray(scene.quads.refl).ravel(),
        np.asarray(scene.spheres.refl).ravel(),
    ])
    if refl.size and refl.max(initial=0) != DIFF:
        raise NotImplementedError(
            f"{what} supports all-DIFF scenes only (the guiding demo has "
            "no SPEC/REFR scatter branch); got non-diffuse objects"
        )


def _spawn_all(cam: CameraParams, cfg: RenderConfig, seed):
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
    return o, d, path_id


def train_guide(scene: Scene, cam: CameraParams, cfg: RenderConfig,
                n_bounces: int, seed) -> jnp.ndarray:
    """Cosine-sampled training pass; returns the (V, 3) direction-moment
    table: sum over emission pickups of (pickup luminance) * (incoming
    direction), deposited at the voxel the direction LEFT from.

    All-DIFF scenes only (see _require_diffuse)."""
    _require_diffuse(scene, "train_guide")
    return _train_guide(scene, cam, cfg, n_bounces, seed)


@partial(jax.jit, static_argnums=(2, 3))
def _train_guide(scene: Scene, cam: CameraParams, cfg: RenderConfig,
                 n_bounces: int, seed) -> jnp.ndarray:
    uniform = rng.make_uniform_fn(cfg.rng_backend)
    o, d, path_id = _spawn_all(cam, cfg, seed)
    n = o.shape[0]
    T = jnp.ones((n, 3), jnp.float32)
    alive = jnp.ones((n,), jnp.bool_)
    moments = jnp.zeros((N_VOXELS, 3), jnp.float32)
    prev_x = o
    prev_valid = jnp.zeros((n,), jnp.bool_)  # camera vertex doesn't guide

    for b in range(n_bounces):
        depth = jnp.full((n,), b + 1, jnp.int32)
        hit = trace(scene, o, d)
        sh = shade_info(scene, o, d, hit)
        pick = jnp.sum(T * sh.emission, axis=-1) * alive
        dep = pick * prev_valid
        moments = moments.at[voxel_id(prev_x)].add(d * dep[:, None])

        ctr = depth.astype(jnp.uint32) * jnp.uint32(rng.DRAWS_PER_BOUNCE)
        u_rr = uniform(seed, path_id, ctr + jnp.uint32(rng.P_RR))
        u1 = uniform(seed, path_id, ctr + jnp.uint32(rng.P_SCATTER_U))
        u2 = uniform(seed, path_id, ctr + jnp.uint32(rng.P_SCATTER_V))
        p_max = jnp.max(sh.albedo, axis=-1)
        rr_active = (depth > cfg.rr_start_depth) | (p_max <= 0.0)
        survive = jnp.where(rr_active, u_rr < p_max, True)
        p_pos = p_max > 0.0
        inv_p = jnp.where(
            rr_active & p_pos, 1.0 / jnp.where(p_pos, p_max, 1.0), 1.0
        )
        alive = alive & survive
        new_d = sampling.sample_cosine(sh.n, u1, u2)
        T = T * sh.albedo * inv_p[:, None]
        prev_x = sh.x
        prev_valid = alive
        o = jnp.where(alive[:, None], sh.x, o)
        d = jnp.where(alive[:, None], new_d, d)
    return moments


def sample_power_cosine(mu, u1, u2, k: float):
    """Sample a cos^k lobe around unit axis mu (k=1 is the cosine lobe).

    theta: cos(theta) = u2^(1/(k+1)); pdf = (k+1)/(2 pi) * cos^k."""
    uax, vax = vm.onb_from_w(mu)
    r1 = 2.0 * jnp.pi * u1
    wz = u2 ** (1.0 / (k + 1.0))
    sin_t = jnp.sqrt(jnp.maximum(1.0 - wz * wz, 0.0))
    d = (
        uax * (jnp.cos(r1) * sin_t)[:, None]
        + vax * (jnp.sin(r1) * sin_t)[:, None]
        + mu * wz[:, None]
    )
    return vm.norm(d)


def guide_lobes(moments, min_weight: float = 1e-3):
    """(V, 3) moments -> (mu (V,3) unit lobes, use (V,) bool)."""
    norm = jnp.linalg.norm(moments, axis=-1, keepdims=True)
    use = norm[:, 0] > min_weight
    mu = moments / jnp.maximum(norm, 1e-12)
    return mu, use


def render_guided(scene: Scene, cam: CameraParams, cfg: RenderConfig,
                  seed, guide, n_bounces: int, beta: float = 0.5,
                  k: float = 8.0):
    """Guided render (cosine estimator base, no NEE): mixture-sampled
    scattering with exact pdf reweighting. guide = (mu, use) from
    guide_lobes; beta = lobe probability in guided voxels; k = lobe
    sharpness (power-cosine exponent). All-DIFF scenes only.

    Returns the unclamped linear (h, w, 3) mean image."""
    _require_diffuse(scene, "render_guided")
    return _render_guided(scene, cam, cfg, seed, guide, n_bounces, beta, k)


@partial(jax.jit, static_argnums=(2, 5, 6, 7))
def _render_guided(scene: Scene, cam: CameraParams, cfg: RenderConfig,
                   seed, guide, n_bounces: int, beta: float,
                   k: float):
    mu_tab, use_tab = guide
    uniform = rng.make_uniform_fn(cfg.rng_backend)
    o, d, path_id = _spawn_all(cam, cfg, seed)
    n = o.shape[0]
    T = jnp.ones((n, 3), jnp.float32)
    L = jnp.zeros((n, 3), jnp.float32)
    alive = jnp.ones((n,), jnp.bool_)
    inv_pi = 1.0 / jnp.pi

    for b in range(n_bounces):
        depth = jnp.full((n,), b + 1, jnp.int32)
        hit = trace(scene, o, d)
        sh = shade_info(scene, o, d, hit)
        L = L + alive[:, None].astype(jnp.float32) * T * sh.emission

        ctr = depth.astype(jnp.uint32) * jnp.uint32(rng.DRAWS_PER_BOUNCE)
        u_rr = uniform(seed, path_id, ctr + jnp.uint32(rng.P_RR))
        u1 = uniform(seed, path_id, ctr + jnp.uint32(rng.P_SCATTER_U))
        u2 = uniform(seed, path_id, ctr + jnp.uint32(rng.P_SCATTER_V))
        u_coin = uniform(seed, path_id, ctr + jnp.uint32(rng.P_MIX_COIN))

        p_max = jnp.max(sh.albedo, axis=-1)
        rr_active = (depth > cfg.rr_start_depth) | (p_max <= 0.0)
        survive = jnp.where(rr_active, u_rr < p_max, True)
        p_pos = p_max > 0.0
        inv_p = jnp.where(
            rr_active & p_pos, 1.0 / jnp.where(p_pos, p_max, 1.0), 1.0
        )
        alive = alive & survive

        vid = voxel_id(sh.x)
        mu = mu_tab[vid]                       # (N, 3)
        guided = use_tab[vid] & (sh.refl == DIFF)
        beta_eff = jnp.where(guided, beta, 0.0)

        # Mixture components: sharp power-cosine lobe around the voxel
        # direction mu, cosine lobe around the shading normal n.
        d_lobe = sample_power_cosine(mu, u1, u2, k)
        d_cos = sampling.sample_cosine(sh.n, u1, u2)
        take_lobe = u_coin < beta_eff
        new_d = jnp.where(take_lobe[:, None], d_lobe, d_cos)
        cos_n = jnp.sum(new_d * sh.n, axis=-1)
        cos_mu = jnp.sum(new_d * mu, axis=-1)
        pdf_lobe = (
            (k + 1.0) / (2.0 * jnp.pi)
            * jnp.maximum(cos_mu, 0.0) ** k
        )
        pdf_cos = jnp.maximum(cos_n, 0.0) * inv_pi
        pdf_mix = beta_eff * pdf_lobe + (1.0 - beta_eff) * pdf_cos
        # Lobe samples below the surface (cos_n <= 0) carry zero BRDF:
        # weight 0 (they die, but unbiasedly — the cosine component keeps
        # the full hemisphere covered).
        ok = (pdf_mix > 1e-9) & (cos_n > 0.0)
        w = jnp.where(
            ok,
            (jnp.maximum(cos_n, 0.0) * inv_pi)
            / jnp.where(ok, pdf_mix, 1.0),
            0.0,
        )
        T = T * sh.albedo * (inv_p * w)[:, None]
        alive = alive & ok
        o = jnp.where(alive[:, None], sh.x, o)
        d = jnp.where(alive[:, None], new_d, d)

    return (
        L.reshape(cfg.height * cfg.width, cfg.spp, 3)
        .mean(axis=1)
        .reshape(cfg.height, cfg.width, 3)
    )
