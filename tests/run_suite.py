#!/usr/bin/env python
"""Process-isolated test runner — THE supported way to run the full suite.

    python tests/run_suite.py [-j N] [--files a.py b.py ...]

Why this exists (VERDICT round 3, "What's weak" #2): the monolithic
single-process `pytest tests/` run intermittently dies inside the XLA CPU
compiler (observed aborts/segfaults at different tests across sessions —
the giant linearized-scan adjoint compiles push the compiler's recursion
and allocation hard even with the conftest stack-limit lift). Every file
passes in a fresh interpreter. This runner makes that isolation the
contract: each test FILE runs in its own subprocess (`pytest <file>`),
N at a time, and the suite is green iff every file's exit status is 0 —
no retries, no luck.

Output: one line per file as it finishes, then a summary line:
    SUITE: <passed> files passed, <failed> failed, <ntests> tests, <secs>s
Exit status 0 iff all files passed.
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

# Heaviest files first so stragglers don't serialize the end of the run.
SLOW_FIRST = [
    "test_parity.py",
    "test_megakernel.py",
    "test_megakernel_grad.py",
    "test_grad.py",
    "test_parity_grad.py",
    "test_edge.py",
    "test_glossy.py",
    "test_nan_audit.py",
    "test_distributed.py",
]


def discover() -> list[str]:
    files = sorted(
        f for f in os.listdir(HERE)
        if f.startswith("test_") and f.endswith(".py")
    )
    ordered = [f for f in SLOW_FIRST if f in files]
    ordered += [f for f in files if f not in ordered]
    return ordered


def run_file(fname: str, timeout: float) -> tuple[str, int, int, float, str]:
    """Run one test file in a fresh interpreter.

    Returns (fname, returncode, n_tests, seconds, tail)."""
    t0 = time.time()
    env = dict(os.environ)
    # Each worker gets the standard conftest environment; nothing else.
    try:
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", os.path.join(HERE, fname),
             "-q", "--no-header", "-p", "no:cacheprovider"],
            cwd=REPO, env=env, capture_output=True, text=True,
            timeout=timeout,
        )
        rc = proc.returncode
        out = proc.stdout + proc.stderr
    except subprocess.TimeoutExpired as e:
        rc = 124
        out = ((e.stdout or b"").decode(errors="replace")
               + (e.stderr or b"").decode(errors="replace")
               + f"\nTIMEOUT after {timeout}s")
    dt = time.time() - t0
    n = 0
    m = re.search(r"(\d+) passed", out)
    if m:
        n = int(m.group(1))
    tail = "\n".join(out.strip().splitlines()[-15:])
    return fname, rc, n, dt, tail


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-j", type=int, default=2,
                    help="parallel workers (default 2: the virtual-8-device "
                         "CPU mesh makes each pytest process multithreaded "
                         "already; >2 oversubscribes a 4-vCPU box)")
    ap.add_argument("--timeout", type=float, default=3600.0,
                    help="per-file timeout in seconds")
    ap.add_argument("--files", nargs="*", default=None,
                    help="subset of test files (default: all)")
    args = ap.parse_args()

    files = args.files if args.files else discover()
    t0 = time.time()
    results = []
    with ThreadPoolExecutor(max_workers=args.j) as ex:
        futs = [ex.submit(run_file, f, args.timeout) for f in files]
        for fut in futs:
            fname, rc, n, dt, tail = fut.result()
            status = "ok" if rc == 0 else f"FAIL(rc={rc})"
            print(f"[{status:>10}] {fname:<28} {n:>4} tests  {dt:6.1f}s",
                  flush=True)
            if rc != 0:
                print(f"---- {fname} tail ----\n{tail}\n----", flush=True)
            results.append((fname, rc, n, dt))

    failed = [r for r in results if r[1] != 0]
    ntests = sum(r[2] for r in results)
    print(f"SUITE: {len(results) - len(failed)} files passed, "
          f"{len(failed)} failed, {ntests} tests, "
          f"{time.time() - t0:.0f}s", flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
