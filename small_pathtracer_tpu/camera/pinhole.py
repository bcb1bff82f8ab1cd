"""Shirley-style pinhole camera (contract C5).

Rebuilds the reference ``Camera`` (/root/reference/src/smallpt.cpp:256-285) as
pure functions: a parameter pytree plus a batched ray generator. The camera
parameters are differentiable (BASELINE.json: camera gradients).

Reference semantics reproduced exactly:
- basis: w = normalize(lookat - lookfrom), u = normalize(w x vup), v = u x w;
- lower_left = origin - u*half_width - v*half_height + w;
- get_ray(s, t) returns an UNNORMALIZED direction; the caller normalizes and
  re-bases the ray at the camera origin (smallpt.cpp:535-536);
- pixel jitter (contract C4): uniform box filter,
  u = (x - 0.5 + xi)/w, v = ((h - y - 1) - 0.5 + xi)/h (row index flipped).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

from ..core import ld, vecmath as vm


class CameraParams(NamedTuple):
    origin: jnp.ndarray        # (3,)
    lower_left: jnp.ndarray    # (3,)
    horizontal: jnp.ndarray    # (3,)
    vertical: jnp.ndarray      # (3,)


# Reference camera constants: LOOKFROM (smallpt.cpp:65) and the ctor call in
# main (smallpt.cpp:521).
LOOKFROM = (50.0, 40.0, 168.0)
LOOKAT = (50.0, 40.0, 5.0)
VUP = (0.0, 1.0, 0.0)
VFOV_DEG = 65.0


def make_camera(
    lookfrom=LOOKFROM,
    lookat=LOOKAT,
    vup=VUP,
    vfov_deg=VFOV_DEG,
    aspect: float = 1.0,
    dtype=jnp.float32,
) -> CameraParams:
    """Camera ctor math (smallpt.cpp:262-275)."""
    lookfrom = jnp.asarray(lookfrom, dtype)
    lookat = jnp.asarray(lookat, dtype)
    vup = jnp.asarray(vup, dtype)
    theta = jnp.asarray(vfov_deg, dtype) * (math.pi / 180.0)
    half_height = jnp.tan(theta / 2.0)
    half_width = aspect * half_height
    w = vm.norm(lookat - lookfrom)
    u = vm.norm(vm.cross(w, vup))
    v = vm.cross(u, w)
    lower_left = lookfrom - u * half_width - v * half_height + w
    return CameraParams(
        origin=lookfrom,
        lower_left=lower_left,
        horizontal=u * (2.0 * half_width),
        vertical=v * (2.0 * half_height),
    )


def filter_jitter(jit_u, jit_v, pixel_filter: str = "box"):
    """Map uniform jitter draws in [0,1) to the pixel-filter sample offset
    plugged into contract C4's ``(px - 0.5 + offset)`` formula.

    "box": identity — the reference's uniform box filter (smallpt.cpp:
    533-534, contract C4).
    "tent": the 2-pixel-wide triangle reconstruction filter of ORIGINAL
    smallpt (the reference's ancestor, README.md:3-4; smallpt's
    ``dx = r1<1 ? sqrt(r1)-1 : 1-sqrt(2-r1)``), centered on the pixel
    center — offset = 0.5 + tent(xi) with tent in (-1, 1). We apply it to
    the whole pixel rather than smallpt's 2x2 subpixel grid (no subpixel
    stratification here; samples are i.i.d. per pixel).

    Pure elementwise jnp — shared verbatim by the jnp wavefront and the
    Pallas megakernel spawn so schedules stay bit-identical per sample.
    """
    if pixel_filter == "box":
        return jit_u, jit_v

    def tent(xi):
        r = 2.0 * xi
        return jnp.where(
            r < 1.0, jnp.sqrt(r) - 1.0, 1.0 - jnp.sqrt(jnp.maximum(2.0 - r, 0.0))
        )

    return 0.5 + tent(jit_u), 0.5 + tent(jit_v)


def primary_rays(
    cam: CameraParams,
    width: int,
    height: int,
    px: jnp.ndarray,
    py: jnp.ndarray,
    jit_u: jnp.ndarray,
    jit_v: jnp.ndarray,
    pixel_filter: str = "box",
    aperture: float = 0.0,
    focus_dist: float = 0.0,
    lens_u: jnp.ndarray | None = None,
    lens_v: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Generate normalized primary rays for pixel coords (px, py) with
    jitter samples in [0,1).

    px, py: (N,) integer pixel column/row (row 0 = top, as in the reference's
    y loop). Returns (origins (N,3), directions (N,3) normalized).

    With ``aperture > 0`` (a static Python float), a thin-lens camera:
    the ray starts from a uniformly sampled point on the lens disk of that
    radius in the (u, v) camera plane (polar draws lens_u/lens_v) and is
    re-aimed at the pinhole ray's focal-plane point — geometry at
    ``focus_dist`` along the view axis stays sharp, everything else
    defocuses. The reference camera is a pure pinhole (smallpt.cpp:256-285);
    aperture=0 takes a branch-free identical path.
    """
    px = px.astype(cam.origin.dtype)
    py = py.astype(cam.origin.dtype)
    jit_u, jit_v = filter_jitter(jit_u, jit_v, pixel_filter)
    # Contract C4 (smallpt.cpp:533-534).
    s = (px - 0.5 + jit_u) / width
    t = ((height - py - 1.0) - 0.5 + jit_v) / height
    # get_ray (smallpt.cpp:276-279); direction normalized by caller (:536).
    d = (
        cam.lower_left
        + s[:, None] * cam.horizontal
        + t[:, None] * cam.vertical
        - cam.origin
    )
    if aperture > 0.0:
        # lower_left = origin - u*hw - v*hh + w with |w| = 1 (make_camera),
        # so d's view-axis component is exactly 1: the focal-plane point is
        # origin + d * focus_dist.
        r = aperture * jnp.sqrt(lens_u)
        sin_p, cos_p = vm.sincos_2pi(lens_v)
        o = (
            cam.origin
            + vm.norm(cam.horizontal[None, :])[0] * (r * cos_p)[:, None]
            + vm.norm(cam.vertical[None, :])[0] * (r * sin_p)[:, None]
        )
        d = vm.norm(cam.origin + d * focus_dist - o)
        return o, d
    d = vm.norm(d)
    o = jnp.broadcast_to(cam.origin, d.shape)
    return o, d


def primary_rays_cfg(cam: CameraParams, cfg, px, py, path_id, seed, uniform):
    """primary_rays driven by a RenderConfig: draws the camera jitter
    (counters 0/1) and, when cfg.aperture > 0, the lens-disk sample
    (counters 2/3 — below rng.DRAWS_PER_BOUNCE, so they never collide with
    bounce draws). The single spawn recipe shared by every jnp schedule
    (regen/scan/sharded/adjoint/guided)."""
    ju = uniform(seed, path_id, jnp.uint32(0), purpose=ld.CAM_U)
    jv = uniform(seed, path_id, jnp.uint32(1), purpose=ld.CAM_V)
    lu = lv = None
    if cfg.aperture > 0.0:
        lu = uniform(seed, path_id, jnp.uint32(2), purpose=ld.LENS_U)
        lv = uniform(seed, path_id, jnp.uint32(3), purpose=ld.LENS_V)
    return primary_rays(cam, cfg.width, cfg.height, px, py, ju, jv,
                        cfg.pixel_filter, cfg.aperture, cfg.focus_dist,
                        lu, lv)
