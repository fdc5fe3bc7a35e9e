#!/usr/bin/env python
"""Steal-aware diff of two bench vectors.

The per-round perf question is "did the plans get slower, or did the
host?" — and a raw per-entry ratio table cannot answer it (r13: five
runs of identical code spanned 272.6-475.2s). This tool diffs two
BENCH_TIMES-shaped JSON vectors the way the builder/judge should:

- entries whose measurement window saw steal in EITHER run (the
  ``env.steal_frac_per_entry`` annotation) are reported separately —
  their ratios are environment, not plans;
- the headline is the MEDIAN clean-entry ratio (a uniform shift =
  environment; isolated outliers = plan changes worth reading);
- entries present in only one vector (additions/removals) are listed,
  so wall-total deltas decompose into carried-entry drift + new work.

Usage:
    python scripts/bench_diff.py OLD.json NEW.json [--top N]
    python scripts/bench_diff.py 'git:HEAD~5:BENCH_TIMES.json' BENCH_TIMES.json
"""

from __future__ import annotations

import argparse
import json
import statistics
import subprocess
import sys


def _load(spec: str) -> dict:
    if spec.startswith("git:"):
        _, rev, path = spec.split(":", 2)
        return json.loads(
            subprocess.check_output(["git", "show", f"{rev}:{path}"])
        )
    with open(spec) as fh:
        return json.load(fh)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--top", type=int, default=10, help="outliers to list")
    args = ap.parse_args()

    old, new = _load(args.old), _load(args.new)
    oq, nq = old["queries"], new["queries"]
    o_pol = set(old.get("env", {}).get("steal_frac_per_entry", {}))
    n_pol = set(new.get("env", {}).get("steal_frac_per_entry", {}))

    common = sorted(set(oq) & set(nq))
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    clean = [k for k in common if k not in o_pol and k not in n_pol]
    polluted = [k for k in common if k in o_pol or k in n_pol]

    ratios = {k: nq[k] / oq[k] for k in clean if oq[k] > 0}
    print(
        f"old: sf={old.get('sf')} wall={old.get('value')}s "
        f"steal={old.get('env', {}).get('steal_frac')} "
        f"({len(oq)} entries)"
    )
    print(
        f"new: sf={new.get('sf')} wall={new.get('value')}s "
        f"steal={new.get('env', {}).get('steal_frac')} "
        f"({len(nq)} entries)"
    )
    print(
        f"common {len(common)} | clean-in-both {len(clean)} | "
        f"steal-polluted {len(polluted)} (excluded from the headline) | "
        f"added {len(added)} | removed {len(removed)}"
    )
    if ratios:
        med = statistics.median(ratios.values())
        print(
            f"\nHEADLINE median clean-entry ratio: {med:.3f} "
            f"(uniform shift ⇒ environment; read outliers below for plans)"
        )
        common_old = sum(oq[k] for k in common)
        common_new = sum(nq[k] for k in common)
        new_work = sum(nq[k] for k in added)
        print(
            f"carried-entry wall {common_old:.1f}s → {common_new:.1f}s "
            f"({common_new / common_old:.2f}x); new entries add "
            f"{new_work:.1f}s"
        )
        zero_wall = [k for k in clean if oq[k] == 0]
        if zero_wall:
            # a 0.000-wall entry (3-decimal rounding) has no ratio —
            # surface it rather than dropping it from every list
            for k in zero_wall:
                print(f"  (no ratio) {oq[k]:.3f}s → {nq[k]:.3f}s  {k}")
        out = sorted(ratios.items(), key=lambda kv: kv[1], reverse=True)
        grown = [(k, r) for k, r in out if r > 1.0]
        improved = [(k, r) for k, r in out if r < 1.0]
        print(f"\nslowest-growing clean entries (top {args.top}):")
        for k, r in grown[: args.top]:
            print(f"  {r:6.2f}x  {oq[k]:7.2f}s → {nq[k]:7.2f}s  {k}")
        print(f"fastest-improving clean entries (top {args.top}):")
        for k, r in improved[::-1][: args.top]:
            print(f"  {r:6.2f}x  {oq[k]:7.2f}s → {nq[k]:7.2f}s  {k}")
    if polluted:
        print(
            f"\nsteal-polluted (ratios are environment, listed for "
            f"completeness):"
        )
        ranked = sorted(
            polluted,
            key=lambda k: -(nq[k] / oq[k]) if oq[k] > 0 else float("-inf"),
        )
        for k in ranked[: args.top]:
            r = f"{nq[k] / oq[k]:6.2f}x" if oq[k] > 0 else "  (n/a)"
            print(f"  {r}  {oq[k]:7.2f}s → {nq[k]:7.2f}s  {k}")
    if added:
        print(f"\nadded: {', '.join(added)}")
    if removed:
        print(f"removed: {', '.join(removed)}")
    return 0


if __name__ == "__main__":
    try:
        raise SystemExit(main())
    except BrokenPipeError:  # `| head` is a normal way to read this
        raise SystemExit(0)
