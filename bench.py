"""Benchmark: Mrays/s on the Cornell box (the BASELINE.md north-star metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the C++ reference measured at 2.5 Mrays/s on one CPU core
(BASELINE.md, "Ray throughput"); "rays" = scene-level nearest-hit queries
(extend rays + NEE probe rays), the same event the reference counts at
/root/reference/src/smallpt.cpp:323-335.

Config mirrors the reference's render workload (512x512, NEE estimator,
box scene) at a spp high enough to amortize dispatch. Runs on whatever
jax.devices() provides (the real TPU chip under the driver; CPU locally
with SPT_BENCH_CPU=1).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    if os.environ.get("SPT_BENCH_CPU"):
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if os.environ.get("SPT_BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from small_pathtracer_tpu import RenderConfig, get_scene, make_camera
    from small_pathtracer_tpu.integrator.wavefront import render_chunk

    width = int(os.environ.get("SPT_BENCH_W", 512))
    height = int(os.environ.get("SPT_BENCH_H", 512))
    spp = int(os.environ.get("SPT_BENCH_SPP", 64))
    cfg = RenderConfig(width=width, height=height, spp=spp, estimator="nee")
    scene = get_scene("cornell_box")
    cam = make_camera(aspect=width / height)

    chunk = cfg.resolved_spp_chunk()
    seed = jnp.uint32(cfg.seed)

    # Warmup / compile.
    img, n_tr = render_chunk(scene, cam, cfg, seed, chunk, jnp.uint32(0))
    jax.block_until_ready((img, n_tr))

    # Timed: the full spp loop (compile excluded; steady-state throughput).
    t0 = time.perf_counter()
    acc = None
    trs = []
    s0 = 0
    while s0 < cfg.spp:
        n_s = min(chunk, cfg.spp - s0)
        img, n_tr = render_chunk(scene, cam, cfg, seed, n_s, jnp.uint32(s0))
        acc = img if acc is None else acc + img
        trs.append(n_tr)
        s0 += n_s
    jax.block_until_ready((acc, trs))
    dt = time.perf_counter() - t0
    total_traces = sum(float(t) for t in trs)

    mrays = total_traces / dt / 1e6
    baseline = 2.5  # Mrays/s, C++ reference single-core (BASELINE.md)
    print(
        json.dumps(
            {
                "metric": f"Mrays/s (Cornell box {width}x{height}x{spp}spp, NEE wavefront)",
                "value": round(mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
