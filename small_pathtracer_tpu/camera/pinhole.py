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

from ..core import vecmath as vm


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


def primary_rays(
    cam: CameraParams,
    width: int,
    height: int,
    px: jnp.ndarray,
    py: jnp.ndarray,
    jit_u: jnp.ndarray,
    jit_v: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Generate normalized primary rays for pixel coords (px, py) with
    jitter samples in [0,1).

    px, py: (N,) integer pixel column/row (row 0 = top, as in the reference's
    y loop). Returns (origins (N,3), directions (N,3) normalized).
    """
    px = px.astype(cam.origin.dtype)
    py = py.astype(cam.origin.dtype)
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
    d = vm.norm(d)
    o = jnp.broadcast_to(cam.origin, d.shape)
    return o, d
