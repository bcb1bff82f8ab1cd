"""Batched 3-vector math over (..., 3) arrays.

TPU-native replacement for the reference's scalar ``Vec`` class
(/root/reference/src/smallpt.cpp:24-62): positions and RGB colors are both
(..., 3) float32 arrays; everything is elementwise/VPU-friendly and fuses
under XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product over the trailing axis. (...,3),(...,3) -> (...,)."""
    return jnp.sum(a * b, axis=-1)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched cross product (reference ``operator%``, smallpt.cpp:56-58)."""
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    return jnp.stack(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=-1
    )


def norm(a: jnp.ndarray) -> jnp.ndarray:
    """Normalize over the trailing axis (reference ``Vec::norm``)."""
    return a * jax.lax.rsqrt(jnp.sum(a * a, axis=-1, keepdims=True))


def magnitude(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.sum(a * a, axis=-1))


def reflect(d: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Mirror reflection ``d - n*2*(n.d)`` (commented SPEC branch,
    smallpt.cpp:482-483). Sign of n does not matter."""
    return d - n * (2.0 * dot(n, d))[..., None]


def orient_normal(n: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Flip n to face against the incoming ray: ``n.dot(d) < 0 ? n : -n``
    (contract C9, smallpt.cpp:118-124 etc.). Note dot==0 yields -n, matching
    the reference's ternary."""
    return jnp.where((dot(n, d) < 0.0)[..., None], n, -n)


def onb_from_w(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Orthonormal frame used by both hemisphere samplers (contract C11/C12,
    smallpt.cpp:344-346): u = normalize(cross(|w.x|>.1 ? (0,1,0) : (1,0,0), w)),
    v = cross(w, u). Returns (u, v)."""
    pick = (jnp.abs(w[..., 0]) > 0.1)[..., None]
    a = jnp.where(
        pick,
        jnp.asarray([0.0, 1.0, 0.0], dtype=w.dtype),
        jnp.asarray([1.0, 0.0, 0.0], dtype=w.dtype),
    )
    u = norm(cross(a, w))
    v = cross(w, u)
    return u, v
