"""Benchmark: Mrays/s on the Cornell box (the BASELINE.md north-star metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the C++ reference measured at 2.5 Mrays/s on one CPU core
(BASELINE.md, "Ray throughput"); "rays" = scene-level nearest-hit queries
(extend rays + NEE probe rays), the same event the reference counts at
/root/reference/src/smallpt.cpp:323-335.

Implementations (fastest first):
  pallas — fused Pallas megakernel (ops/megakernel.py), ~2950 Mrays/s at
           the north-star config on a v5e (PERF.md ladder); cold Mosaic
           compiles are minutes but the terminal-side cache makes warm
           compiles ~4 s;
  regen  — jnp lane-regenerating wavefront, ~36 Mrays/s, ~1 min compile;
  scan   — jnp fixed-slot wavefront (the semantics reference), ~8 Mrays/s.

With no --impl argument this driver tries pallas in time-boxed subprocess
ATTEMPTS (the Mosaic compile service keeps a terminal-side cache keyed by
module hash, so an attempt that times out mid-compile usually leaves the
next attempt a seconds-fast cache hit — measured 100-600 s cold vs ~4 s
warm) and falls back to regen only when every attempt fails, so a
constrained environment still reports a number. Timing includes a
device->host value fetch (block_until_ready is unreliable under the
tunnel).

Every stage (pallas attempts, regen fallback, CPU last resort) runs in a
time-boxed subprocess: the axon tunnel can wedge so hard that even
jax.devices() blocks forever (observed twice; it cost round 4 its
artifact — BENCH_r04.json rc=124), and an unattended driver invocation
must still get its one JSON line in bounded time. Three defenses
(VERDICT round 4, item 1):

1. LIVENESS PROBE: before spending any pallas budget, a <=60 s
   subprocess attaches to the device (`jax.devices()` + a tiny
   computation). A hang or failure means the tunnel is wedged — skip
   the TPU ladder entirely and go straight to the host-CPU fallback.
2. PERSISTENT COMPILE CACHE: every stage sets
   `jax_compilation_cache_dir` to a repo-local dir (.jax_cache/), so
   the serialized TPU executable (including the Mosaic kernel binary)
   survives process and terminal death. A warmed cache turns the
   100-600 s cold Mosaic compile into a seconds-fast disk hit; the
   builder pre-warms it with a driver-identical invocation.
3. BUDGET LADDER THAT FITS THE HARNESS: worst case
   probe(60) + 2x pallas(390) + regen(300) + cpu(180) ~ 20 min,
   not round 4's 63.

Env knobs: SPT_BENCH_PALLAS_BUDGET (seconds per pallas attempt, default
390), SPT_BENCH_PALLAS_ATTEMPTS (default 2), SPT_BENCH_TOTAL_BUDGET
(overall pallas budget across attempts, default 800), SPT_BENCH_REGEN_BUDGET
(default 300), SPT_BENCH_PROBE_BUDGET (default 60), SPT_BENCH_IMPL /
--impl (force one implementation), SPT_BENCH_W/H/SPP (config override),
SPT_BENCH_CPU (run on host CPU), SPT_BENCH_NO_CACHE (disable the
persistent compile cache, for cold-compile rehearsals).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BASELINE_MRAYS = 2.5  # C++ reference, single core (BASELINE.md)
PALLAS_BUDGET_S = float(os.environ.get("SPT_BENCH_PALLAS_BUDGET", 390))
PALLAS_ATTEMPTS = int(os.environ.get("SPT_BENCH_PALLAS_ATTEMPTS", 2))
TOTAL_BUDGET_S = float(os.environ.get("SPT_BENCH_TOTAL_BUDGET", 800))
REGEN_BUDGET_S = float(os.environ.get("SPT_BENCH_REGEN_BUDGET", 300))
PROBE_BUDGET_S = float(os.environ.get("SPT_BENCH_PROBE_BUDGET", 60))
CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")


def _enable_compile_cache(jax) -> None:
    """Repo-local persistent compilation cache (VERDICT r4 item 1b).

    The serialized TPU executable includes the Mosaic kernel binary, so a
    warmed cache turns the 100-600 s cold megakernel compile into a
    seconds-fast disk hit across processes AND terminals. Disabled via
    SPT_BENCH_NO_CACHE for cold-compile rehearsals, and on the CPU
    backend (a cache write of a huge CPU executable segfaulted once —
    tests/conftest.py history — and the CPU fallback compiles fast
    anyway).
    """
    if os.environ.get("SPT_BENCH_NO_CACHE") or os.environ.get("SPT_BENCH_CPU"):
        return
    os.makedirs(CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    # Threshold 0.5 s, no size floor: the megakernel's compile is ~1-4 s
    # even when the tunnel server's Mosaic cache is warm (and 100-600 s
    # cold) — the warm case must STILL write the executable to disk, or
    # a later cold-server run gets no disk hit (measured: the 2.0 s
    # default skipped the warm write).
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def run_bench(impl: str) -> dict:
    if os.environ.get("SPT_BENCH_CPU"):
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if os.environ.get("SPT_BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")
    _enable_compile_cache(jax)

    import jax.numpy as jnp

    from small_pathtracer_tpu import RenderConfig, get_scene, make_camera

    # Default = the BASELINE.json north-star config (1024x768x512spp
    # Cornell) for pallas; the jnp fallbacks use a lighter spp so a
    # constrained run still finishes.
    is_pallas = impl == "pallas"
    width = int(os.environ.get("SPT_BENCH_W", 1024 if is_pallas else 512))
    height = int(os.environ.get("SPT_BENCH_H", 768 if is_pallas else 512))
    spp = int(os.environ.get("SPT_BENCH_SPP", 512 if is_pallas else 64))
    cfg = RenderConfig(
        width=width, height=height, spp=spp, estimator="nee",
        wavefront="scan" if impl == "scan" else "regen",
        use_pallas=(impl == "pallas"),
    )
    scene = get_scene("cornell_box")
    cam = make_camera(aspect=width / height)

    if impl == "pallas":
        from small_pathtracer_tpu.ops.megakernel import render_pallas

        def once(seed):
            img, tr = render_pallas(scene, cam, cfg, seed)
            return float(img.mean()), float(tr.sum())
    elif impl == "regen":
        from small_pathtracer_tpu.integrator.wavefront import render_regen

        def once(seed):
            img, tr = render_regen(scene, cam, cfg, jnp.uint32(seed))
            return float(img.mean()), float(tr.sum())
    else:
        from small_pathtracer_tpu.integrator.wavefront import render_chunk

        chunk = cfg.resolved_spp_chunk()

        def once(seed):
            # Seed passed TRACED (cfg is a static jit arg — rebuilding it
            # per seed would recompile the wavefront inside the timing).
            acc, trs = None, 0.0
            for s0 in range(0, cfg.spp, chunk):
                img, tr = render_chunk(
                    scene, cam, cfg, jnp.uint32(seed),
                    min(chunk, cfg.spp - s0), jnp.uint32(s0),
                )
                acc = img if acc is None else acc + img
                trs = trs + tr.sum()
            return float(acc.mean()), float(trs)

    t_c0 = time.perf_counter()
    once(7)  # warmup / compile
    print(
        f"[bench] {impl} compile+warmup {time.perf_counter() - t_c0:.1f}s",
        file=sys.stderr, flush=True,
    )
    best_dt, traces = None, 0.0
    for seed in (1, 2):
        t0 = time.perf_counter()
        _, traces = once(seed)
        dt = time.perf_counter() - t0
        print(f"[bench] {impl} seed {seed}: {dt:.2f}s", file=sys.stderr,
              flush=True)
        best_dt = dt if best_dt is None else min(best_dt, dt)

    mrays = traces / best_dt / 1e6
    backend = ", host-cpu" if os.environ.get("SPT_BENCH_CPU") else ""
    return {
        "metric": (
            f"Mrays/s (Cornell box {width}x{height}x{spp}spp, NEE, "
            f"{impl}{backend})"
        ),
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 2),
    }


def main() -> int:
    impl = None
    if len(sys.argv) > 2 and sys.argv[1] == "--impl":
        impl = sys.argv[2]
    impl = impl or os.environ.get("SPT_BENCH_IMPL")
    if impl:
        print(json.dumps(run_bench(impl)))
        return 0

    # Orchestrate: pallas in time-boxed child attempts, regen fallback,
    # CPU last resort. Attempt N's Mosaic compile usually hits the
    # terminal-side module cache populated by attempt N-1 (even one that
    # timed out), so retries convert "flaky >10 min compile" into "~4 s
    # cache hit".
    def try_child(impl_name: str, budget: float, tag: str,
                  extra_env: dict | None = None) -> str | None:
        print(f"[bench] {tag} (budget {budget:.0f}s)", file=sys.stderr,
              flush=True)
        env = dict(os.environ)
        if extra_env:
            env.update(extra_env)
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--impl", impl_name],
                timeout=budget, capture_output=True, text=True, env=env,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            if out.stderr:
                sys.stderr.write(out.stderr)
            if out.returncode == 0:
                for line in reversed(out.stdout.strip().splitlines()):
                    try:
                        json.loads(line)
                        return line
                    except json.JSONDecodeError:
                        continue
            print(
                f"[bench] {tag} exited rc={out.returncode} without a "
                f"JSON line",
                file=sys.stderr, flush=True,
            )
        except subprocess.TimeoutExpired:
            print(f"[bench] {tag} timed out after {budget:.0f}s",
                  file=sys.stderr, flush=True)
        return None

    # Liveness probe (VERDICT r4 item 1a): the tunnel can wedge such that
    # jax.devices() blocks forever. Attach + run one tiny computation in
    # a time-boxed child; on hang/failure skip the TPU ladder entirely.
    device_live = False
    if not os.environ.get("SPT_BENCH_CPU"):
        print(f"[bench] device liveness probe (budget {PROBE_BUDGET_S:.0f}s)",
              file=sys.stderr, flush=True)
        try:
            probe = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp;"
                 "d = jax.devices();"
                 "x = jax.device_put(jnp.arange(8.0), d[0]);"
                 "print('live:', d[0], float(x.sum()))"],
                timeout=PROBE_BUDGET_S, capture_output=True, text=True,
            )
            device_live = probe.returncode == 0 and "live:" in probe.stdout
            print(f"[bench] probe rc={probe.returncode}: "
                  f"{probe.stdout.strip() or probe.stderr.strip()[-200:]}",
                  file=sys.stderr, flush=True)
        except subprocess.TimeoutExpired:
            print(f"[bench] probe timed out after {PROBE_BUDGET_S:.0f}s — "
                  "tunnel wedged, skipping TPU ladder",
                  file=sys.stderr, flush=True)

    if device_live:
        t_start = time.perf_counter()
        for attempt in range(PALLAS_ATTEMPTS):
            elapsed = time.perf_counter() - t_start
            left = TOTAL_BUDGET_S - elapsed
            if left < 60:
                break
            line = try_child(
                "pallas", min(PALLAS_BUDGET_S, left),
                f"pallas attempt {attempt + 1}/{PALLAS_ATTEMPTS}",
            )
            if line:
                print(line)
                return 0
        line = try_child("regen", REGEN_BUDGET_S, "regen fallback")
        if line:
            print(line)
            return 0
    # Device unreachable (tunnel wedge hangs even jax.devices()): a small
    # host-CPU render still proves the framework end-to-end and keeps the
    # one-JSON-line contract in bounded time.
    line = try_child(
        "regen", 180.0, "CPU last resort",
        {"SPT_BENCH_CPU": "1", "SPT_BENCH_W": "256", "SPT_BENCH_H": "256",
         "SPT_BENCH_SPP": "16"},
    )
    if line:
        print(line)
        return 0
    print(json.dumps({
        "metric": "Mrays/s (bench failed: device unreachable)",
        "value": 0.0, "unit": "Mrays/s", "vs_baseline": 0.0,
    }))
    return 1


if __name__ == "__main__":
    sys.exit(main())
