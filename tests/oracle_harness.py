"""Oracle harness: builds and runs the C++ reference as a parity oracle.

The reference (read-only at /root/reference) is patched IN /tmp — never
copied into this repo — to:
  - remove the RL state-viz hijack that short-circuits ``radiance()`` at HEAD
    (SURVEY.md section 0: early return at smallpt.cpp:442);
  - fix the seed (``srand(time(NULL))`` is not reproducible) and decorrelate
    the per-row rand48 streams across seeds;
  - set resolution / spp;
  - select the estimator via the mixture threshold ``q < Q`` (Q=1 -> NEE,
    Q=0 -> cosine; smallpt.cpp:464) or by swapping in the commented uniform
    sampling formula (:352-360);
  - optionally fix the glibc ``rand() * 36`` int32 overflow in
    light_sampling (:365-366) to recover the intended full-range sampling
    (see small_pathtracer_tpu/integrator/sampling.py);
  - dump the raw per-pixel double accumulator to a binary file so parity is
    checked in linear space, not through the 8-bit PPM quantizer.

Skips (returns None) when /root/reference or g++ is unavailable.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import subprocess
from pathlib import Path

import numpy as np

REF_SRC = Path("/root/reference/src/smallpt.cpp")
REF_HDR = Path("/root/reference/src/utilities.h")
CACHE = Path(__file__).resolve().parent / "_oracle_cache"

# The uniform-sampling body (contract C12) to swap in for the active
# cosine-weighted return; this is the commented alternative at
# smallpt.cpp:352-360, written out.
_COSINE_RETURN = (
    "return (u * cos(r1) * r2s + v * sin(r1) * r2s + w * sqrt(1 - r2)).norm();"
)
_UNIFORM_RETURN = (
    "return (u*cos(r1)*sqrt(r2*(2-r2)) + v*sin(r1)*sqrt(r2*(2-r2)) "
    "+ w*(1-r2)).norm();"
)


def available() -> bool:
    return REF_SRC.exists() and shutil.which("g++") is not None


def _patched_source(
    width: int,
    height: int,
    spp: int,
    seed: int,
    estimator: str,
    light_mode: str,
    self_hit_eps: float = 0.0,
) -> str:
    lines = REF_SRC.read_text().splitlines(keepends=True)
    # Drop the state-viz hijack block (1-based lines 424..442).
    lines = lines[:423] + lines[442:]
    txt = "".join(lines)

    txt = txt.replace("srand(time(NULL));", f"srand({seed});")
    txt = txt.replace(
        "int w = 512, h = 512;", f"int w = {width}, h = {height};"
    )
    txt = txt.replace("int samps = 16;", f"int samps = {spp};")
    # Skip the 1.3s RL state-space init (unused once the hijack is gone).
    txt = txt.replace(
        "int number_states = create_state_space(dict);",
        "int number_states = 0;",
    )
    # Decorrelate the per-row rand48 streams across seeds.
    txt = txt.replace(
        "Xi[3] = { 0, 0, y * y * y }",
        f"Xi[3] = {{ 0, 0, (unsigned short)(y * y * y + {seed}) }}",
    )
    # Estimator selection via the mixture coin threshold (q < 1 at HEAD).
    q = {"nee": "1", "mixture": "0.5", "cosine": "-1", "uniform": "-1"}[estimator]
    txt = txt.replace("if (q < 1) {", f"if (q < {q}) {{")
    if estimator == "uniform":
        assert _COSINE_RETURN in txt
        txt = txt.replace(_COSINE_RETURN, _UNIFORM_RETURN)
    if light_mode == "intended":
        txt = txt.replace(
            "double x_light = 32 + rand() * 36 / double(RAND_MAX);",
            "double x_light = 32 + (rand() / double(RAND_MAX)) * 36;",
        )
        txt = txt.replace(
            "double z_light = 63 + rand() * 36 / double(RAND_MAX);",
            "double z_light = 63 + (rand() / double(RAND_MAX)) * 36;",
        )
    else:
        assert light_mode == "glibc_overflow"
    if self_hit_eps:
        # The as-built reference accepts fp self-intersections (rect hit
        # requires only t < 0 rejection, smallpt.cpp:106/149/192; after a
        # bounce the f64 residual leaves the origin ~1e-14 behind the plane
        # about half the time, adding a spurious extra albedo factor).
        # Measured effect: cosine-mode image ~3.5% darker than a
        # self-hit-free render. This patch adds the epsilon so the oracle
        # tests the *estimator*, not the fp artifact.
        n = txt.count("|| t < 0)")
        assert n == 3, n
        txt = txt.replace("|| t < 0)", f"|| t < {self_hit_eps})")
    # Dump the raw linear accumulator next to the PPM.
    txt = txt.replace(
        'FILE *f = fopen("show_allrect_differentplane_red_state.ppm", "w");',
        '{ FILE *rf = fopen("oracle_raw.bin", "wb");'
        " fwrite(c, sizeof(Vec), w * h, rf); fclose(rf); }\n"
        '\tFILE *f = fopen("oracle.ppm", "w");',
    )
    return txt


def render_oracle(
    width: int = 128,
    height: int = 128,
    spp: int = 64,
    seed: int = 1,
    estimator: str = "nee",
    light_mode: str = "intended",
    self_hit_eps: float = 0.0,
    timeout: float = 1800.0,
) -> np.ndarray | None:
    """Build + run the oracle; returns the linear (h, w, 3) float64 image
    (per-pixel mean radiance, clamped per contract C3), cached on disk.

    self_hit_eps > 0 patches the reference's rect intersectors to reject
    near-zero hits (see _patched_source) — use for estimator-parity tests;
    0.0 is the as-built behavior."""
    if not available():
        return None
    key = hashlib.md5(
        f"v4|{width}x{height}x{spp}|{seed}|{estimator}|{light_mode}|{self_hit_eps}".encode()
    ).hexdigest()[:16]
    CACHE.mkdir(exist_ok=True)
    npy = CACHE / f"oracle_{key}.npy"
    if npy.exists():
        return np.load(npy)

    work = Path("/tmp/spt_oracle") / key
    work.mkdir(parents=True, exist_ok=True)
    (work / "smallpt_oracle.cpp").write_text(
        _patched_source(
            width, height, spp, seed, estimator, light_mode, self_hit_eps
        )
    )
    shutil.copy(REF_HDR, work / "utilities.h")
    subprocess.run(
        ["g++", "-O3", "-w", "-o", "oracle", "smallpt_oracle.cpp"],
        cwd=work,
        check=True,
        capture_output=True,
    )
    subprocess.run(
        ["./oracle"], cwd=work, check=True, capture_output=True, timeout=timeout
    )
    raw = np.fromfile(work / "oracle_raw.bin", dtype=np.float64)
    img = raw.reshape(height, width, 3)
    np.save(npy, img)
    return img
