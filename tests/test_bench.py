"""bench.py contract test: the driver runs this file and records its ONE
JSON line — keep that interface pinned."""

import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def test_bench_emits_single_json_line():
    env = dict(
        os.environ,
        SPT_BENCH_CPU="1", SPT_BENCH_W="48", SPT_BENCH_H="32",
        SPT_BENCH_SPP="4", SPT_BENCH_IMPL="regen",
    )
    out = subprocess.run(
        [sys.executable, str(ROOT / "bench.py")],
        capture_output=True, text=True, timeout=300, cwd=ROOT, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1, out.stdout
    d = json.loads(lines[0])
    assert set(d) == {"metric", "value", "unit", "vs_baseline"}
    assert d["unit"] == "Mrays/s"
    assert d["value"] > 0


def test_bench_fallback_chain_reaches_regen_child():
    """Orchestrator path: with the pallas budget exhausted up front
    (SPT_BENCH_TOTAL_BUDGET < 60 skips all pallas attempts), the regen
    fallback child must produce the JSON line — the round-end safety net
    when the device tunnel is wedged."""
    env = dict(
        os.environ,
        SPT_BENCH_CPU="1", SPT_BENCH_W="48", SPT_BENCH_H="32",
        SPT_BENCH_SPP="4", SPT_BENCH_TOTAL_BUDGET="1",
        SPT_BENCH_REGEN_BUDGET="280",
    )
    env.pop("SPT_BENCH_IMPL", None)
    out = subprocess.run(
        [sys.executable, str(ROOT / "bench.py")],
        capture_output=True, text=True, timeout=300, cwd=ROOT, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1, out.stdout
    d = json.loads(lines[0])
    assert "regen" in d["metric"]
    assert d["value"] > 0
