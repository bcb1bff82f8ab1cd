"""Film: accumulation, tone mapping, and PPM image I/O.

Reproduces the reference's output contract exactly (SURVEY.md C1-C3):

- per-pixel estimator: mean of per-sample radiance, clamped to [0,1] AFTER
  averaging, BEFORE gamma (smallpt.cpp:536-538);
- gamma: ``toInt(x) = int(pow(clamp(x), 1/2.2) * 255 + .5)`` (smallpt.cpp:314-321);
- ASCII P3 PPM, header ``P3\\n<w> <h>\\n255\\n``, space-separated pixels
  (smallpt.cpp:548-551).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

GAMMA = 2.2


def clamp01(x: jnp.ndarray) -> jnp.ndarray:
    """Reference ``clamp`` (smallpt.cpp:314-316)."""
    return jnp.clip(x, 0.0, 1.0)


def tonemap_u8(linear: jnp.ndarray) -> jnp.ndarray:
    """Contract C2: clamp + gamma 1/2.2 + round-half-up to uint8."""
    v = jnp.power(clamp01(linear), 1.0 / GAMMA) * 255.0 + 0.5
    return jnp.floor(v).astype(jnp.uint8)


def finalize(sample_mean: jnp.ndarray) -> jnp.ndarray:
    """Contract C3: clamp the per-pixel mean (linear image in [0,1])."""
    return clamp01(sample_mean)


def write_ppm(path: str, image_u8: np.ndarray) -> None:
    """Write an ASCII P3 PPM matching the reference writer byte format
    (smallpt.cpp:548-551): header then ``"%d %d %d "`` per pixel.

    Uses the native C++ encoder when available (~100x faster than the
    Python join at 1024x768; see native/sptnative.cpp)."""
    img = np.asarray(image_u8)
    assert img.ndim == 3 and img.shape[2] == 3, img.shape
    h, w, _ = img.shape
    from .. import native

    body = native.ppm_body(img.astype(np.uint8))
    if body is None:
        body = (
            " ".join(str(v) for v in img.reshape(-1).astype(np.int32)) + " "
        ).encode()
    with open(path, "wb") as f:
        f.write(f"P3\n{w} {h}\n255\n".encode())
        f.write(body)


def read_ppm(path: str) -> np.ndarray:
    """Read an ASCII P3 PPM into an (h, w, 3) uint8 array."""
    with open(path, "r") as f:
        tokens = f.read().split()
    # Strip comments is unnecessary for our own files / the reference's.
    assert tokens[0] == "P3", f"not an ASCII PPM: {path}"
    w, h, maxval = int(tokens[1]), int(tokens[2]), int(tokens[3])
    assert maxval == 255
    data = np.array(tokens[4 : 4 + w * h * 3], dtype=np.int64)
    return data.reshape(h, w, 3).astype(np.uint8)


def srgb_from_u8(img_u8: np.ndarray) -> np.ndarray:
    """Invert tonemap approximately: uint8 -> linear float (for comparing
    against committed goldens)."""
    return np.power(np.asarray(img_u8, dtype=np.float64) / 255.0, GAMMA)
