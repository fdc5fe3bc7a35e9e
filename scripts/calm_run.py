#!/usr/bin/env python
"""Launch a command the moment the host is calm (guide §1: measure on a
quiet machine or say so). This host's contention arrives in multi-minute
bursts, only partly visible as steal ticks — the same motivation as
bench.py's calibration gate. Probe = steal fraction over a 3 s window
PLUS a fixed single-thread Python spin (CPU execution speed); launch when
N consecutive probes are clean (steal < --steal and spin within --calib
of the session's fastest). Prints probe lines to stderr, then execs the
command.

Usage: python scripts/calm_run.py [--steal 0.05] [--calib 1.2]
           [--consecutive 2] [--max-wait 3600] -- CMD [ARG ...]
"""
from __future__ import annotations

import argparse
import os
import sys
import time


def steal_window(sec: float = 3.0) -> float:
    def read():
        p = open("/proc/stat").readline().split()
        return int(p[1]), int(p[3]), int(p[4]), int(p[8])

    a = read()
    time.sleep(sec)
    b = read()
    busy = (b[0] - a[0]) + (b[1] - a[1]) + (b[3] - a[3])
    return (b[3] - a[3]) / busy if busy else 0.0


def spin_ms() -> float:
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        n = 400_000
        while n:
            n -= 1
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    return best * 1000


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steal", type=float, default=0.05)
    ap.add_argument("--calib", type=float, default=1.2)
    ap.add_argument("--consecutive", type=int, default=2)
    ap.add_argument("--max-wait", type=float, default=3600.0)
    ap.add_argument("cmd", nargs=argparse.REMAINDER)
    args = ap.parse_args()
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        print("no command given", file=sys.stderr)
        return 2

    t0 = time.time()
    best_spin = spin_ms()
    ok_streak = 0
    while time.time() - t0 < args.max_wait:
        st = steal_window()
        sp = spin_ms()
        best_spin = min(best_spin, sp)
        clean = st < args.steal and sp < args.calib * best_spin
        ok_streak = ok_streak + 1 if clean else 0
        print(
            f"# probe steal={st:.3f} spin={sp:.1f}ms "
            f"(best {best_spin:.1f}) streak={ok_streak}",
            file=sys.stderr,
        )
        if ok_streak >= args.consecutive:
            print(f"# calm after {time.time() - t0:.0f}s — launching", file=sys.stderr)
            os.execvp(cmd[0], cmd)
        time.sleep(5)
    print(f"# max-wait {args.max_wait}s exceeded — launching anyway", file=sys.stderr)
    os.execvp(cmd[0], cmd)


if __name__ == "__main__":
    raise SystemExit(main())
