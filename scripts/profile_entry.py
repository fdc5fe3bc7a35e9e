#!/usr/bin/env python
"""Isolate one or more registry entries for optimization work (guide §1).

Usage:
    python scripts/profile_entry.py ENTRY [ENTRY ...] \
        [--sf-dir DIR] [--reps N] [--action noop|count] [--explain OUT_DIR]

For each entry: runs it REPS times (fresh plan each time, caches released
between reps like bench.py does), timing each rep, optionally through the
noop sink (times computation of every column, not the count-pruned tree),
and optionally dumps .explain("formatted") to OUT_DIR/<entry>.txt.

Reps separate one-time cost (JIT/codegen/staging builds) from steady-state
cost: rep1 >> rep2 ≈ rep3 means fixed overhead, not data work.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("entries", nargs="+")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--action", choices=["noop", "count"], default="noop")
    ap.add_argument("--explain", default=None, help="directory for explain('formatted') dumps")
    ap.add_argument("--suffix", default="", help="filename suffix for explain dumps, e.g. _before")
    ap.add_argument("--conf", action="append", default=[], help="extra spark conf k=v")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    from datasheet_etl_spark.caching import release_caches
    from datasheet_etl_spark.plans import registry
    from datasheet_etl_spark.session import get_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    extra = dict(kv.split("=", 1) for kv in args.conf)
    spark = get_session(app_name="profile_entry", shuffle_partitions=cpus, extra_conf=extra)
    reg = registry()

    def cleanup() -> None:
        release_caches()
        spark.catalog.clearCache()
        for t in spark.catalog.listTables():
            if t.isTemporary:
                spark.catalog.dropTempView(t.name)

    def ticks():
        p = open("/proc/stat").readline().split()
        return int(p[1]), int(p[3]), int(p[8])

    def calib():
        # fixed single-thread spin: measures current CPU execution speed
        # directly, catching contention that steal accounting cannot see
        # (SMT-sibling/frequency degradation — observed 8-20x entry
        # pollution at steal 0.007 on this host); compare reps via the
        # printed ms — a rep whose probe ran >1.3x the session minimum
        # was measured on a degraded CPU
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            n = 400_000
            while n:
                n -= 1
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        return best

    for name in args.entries:
        if name not in reg:
            print(f"!! unknown entry {name}", file=sys.stderr)
            continue
        walls = []
        steals = []
        calibs = []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            k0 = ticks()
            t0 = time.perf_counter()
            df = reg[name](spark, args.sf_dir)
            if args.action == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            walls.append(round(time.perf_counter() - t0, 3))
            k1 = ticks()
            busy = sum(b - a for a, b in zip(k0, k1))
            steals.append(round((k1[2] - k0[2]) / busy, 3) if busy else 0.0)
            calibs.append(round(calib() * 1000, 1))
            if rep == 0 and args.explain:
                os.makedirs(args.explain, exist_ok=True)
                out = os.path.join(args.explain, f"{name}{args.suffix}.txt")
                # re-build for a clean pre-execution plan
                plan_df = reg[name](spark, args.sf_dir)
                with open(out, "w") as fh:
                    fh.write(plan_df._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                    ))
            cleanup()
        print(f"{name}: {walls} steal={steals} calib_ms={calibs} ({args.action})")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
