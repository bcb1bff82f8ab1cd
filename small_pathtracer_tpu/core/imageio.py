"""Image output beyond PPM: PNG (and anything Pillow supports).

The reference writes only ASCII P3 PPM (/root/reference/src/smallpt.cpp:
548-551, contract C1) — film.write_ppm reproduces that byte-for-byte; this
module adds modern formats for convenience (the repo's committed
comparison_uni_imp.png shows the author also wanted PNG)."""

from __future__ import annotations

import numpy as np

from . import film


def write_image(path: str, image_u8: np.ndarray) -> None:
    """Write a (h, w, 3) uint8 image; format from the extension."""
    if path.endswith(".ppm"):
        film.write_ppm(path, image_u8)
        return
    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            f"Pillow unavailable; use a .ppm path instead of {path!r}"
        ) from e
    Image.fromarray(np.asarray(image_u8)).save(path)


def read_image(path: str) -> np.ndarray:
    """Read an image file into (h, w, 3) uint8."""
    if path.endswith(".ppm"):
        return film.read_ppm(path)
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))
