#!/usr/bin/env python
"""Run a bench.py invocation only once the host looks quiet.

This sandbox's host is externally throttled on a timescale of seconds-to-
minutes (BENCH/BASELINE.md round-4/5 attribution: identical-run spreads up
to 3.6x, the solo DRAM probe swinging 0.17 -> 20.5 GB/s). A timing taken in
a throttled window measures the hypervisor, not the code. This wrapper
polls bench.host_probe() until BOTH readings clear a healthy-floor
threshold (or a deadline passes), THEN execs bench.py with the given args,
so the recorded number comes from the cleanest window available. The probe
readings observed while waiting are printed so the artifact shows what the
host was doing either way.

Usage:
    python scripts/quiet_bench.py [--dram-floor GBPS] [--md5-floor MBPS]
        [--max-wait-sec S] [--poll-sec S] -- <bench.py args...>
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from bench import host_probe  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dram-floor", type=float, default=14.0, help="GB/s")
    ap.add_argument("--md5-floor", type=float, default=450.0, help="MB/s")
    ap.add_argument(
        "--syscall-floor",
        type=float,
        default=1500.0,
        help="k syscalls/s — catches the episodic kernel-time storms the "
        "userspace probes are blind to (healthy ~2400)",
    )
    ap.add_argument("--max-wait-sec", type=float, default=1800.0)
    ap.add_argument("--poll-sec", type=float, default=45.0)
    ap.add_argument("bench_args", nargs=argparse.REMAINDER)
    args = ap.parse_args()
    bench_args = [a for a in args.bench_args if a != "--"]

    t0 = time.time()
    waited = []
    while True:
        p = host_probe()
        waited.append(p)
        quiet = (
            p["dram_gbps"] >= args.dram_floor
            and p["cpu_md5_mbps"] >= args.md5_floor
            and p.get("syscall_kps", float("inf")) >= args.syscall_floor
        )
        elapsed = time.time() - t0
        print(
            json.dumps({"probe": p, "quiet": quiet, "waited_sec": round(elapsed, 1)}),
            flush=True,
        )
        if quiet or elapsed >= args.max_wait_sec:
            break
        time.sleep(args.poll_sec)

    print(
        json.dumps(
            {
                # must mirror the full wait-loop condition — reporting the
                # DRAM floor alone would mark a syscall-storm launch "quiet"
                "quiet_window_found": quiet,
                "probes_while_waiting": waited,
                "launching": ["python", "bench.py", *bench_args],
            }
        ),
        flush=True,
    )
    return subprocess.call([sys.executable, str(REPO / "bench.py"), *bench_args])


if __name__ == "__main__":
    raise SystemExit(main())
