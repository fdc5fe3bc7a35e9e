"""Distinct-count sketches beyond the built-in HyperLogLog (q24b).

KMV / theta-style k-minimum-values sketch: keep the k smallest
(normalized) hash values of a column; estimate distinct count as
(k−1)/R with R the k-th smallest value as a fraction of hash space.
Unlike ``approx_count_distinct`` the sketch itself is a first-class,
MERGEABLE value: union sketches across partitions, days, or tables by
taking the k smallest of the union — set semantics the reference's
stats rollups (and any incremental pipeline) need.

Scale shape: one map pass builds per-partition partials (k values
each); the merge handles numPartitions × k values — kilobytes at any
corpus size. Deterministic: xxhash64 is a fixed function of the input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# hash normalized into [0, 1): xxhash64 over the full signed-64 range
_HASH_SPAN = float(1 << 64)


def _norm_hash(col) -> "F.Column":
    # shift signed 64-bit into unsigned position without overflow:
    # (h / 2^64) + 0.5 maps [-2^63, 2^63) → [0, 1)
    return (F.xxhash64(col) / F.lit(_HASH_SPAN)) + F.lit(0.5)


def kmv_partials(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """Per-partition partial sketches: ≤ k smallest distinct normalized
    hashes each, built in one vectorized pass (numpy unique + partition).
    Output: one row per kept hash value (column ``h``)."""
    import numpy as np
    import pandas as pd

    hashed = df.select(_norm_hash(F.col(col)).alias("h"))

    def op(batches):
        best: "np.ndarray | None" = None
        for pdf in batches:
            vals = pdf["h"].to_numpy()
            pool = vals if best is None else np.concatenate([best, vals])
            pool = np.unique(pool)  # sorted ascending, deduped
            best = pool[:k]
        if best is not None and len(best):
            yield pd.DataFrame({"h": best})

    return hashed.mapInPandas(op, schema="h double")


def kmv_sketch(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """The merged k-minimum-values sketch: k smallest distinct hashes
    overall (ascending). TakeOrdered over the tiny partial pool."""
    return kmv_partials(df, col, k).distinct().orderBy("h").limit(k)


def kmv_merge(*sketches: DataFrame, k: int = 256) -> DataFrame:
    """Union sketches (same k) into the sketch of the unioned inputs —
    exact mergeability is the point of the family."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.distinct().orderBy("h").limit(k)


def kmv_estimate(sketch: DataFrame, k: int = 256) -> float:
    """Distinct-count estimate from a sketch: (k−1)/R, or the exact
    count when fewer than k distinct hashes exist (small domains are
    exact by construction)."""
    vals = [r["h"] for r in sketch.collect()]
    if len(vals) < k:
        return float(len(vals))
    return (k - 1) / vals[-1]


def kmv_distinct(df: DataFrame, col: str, k: int = 256) -> float:
    """One-shot estimate of ``count(distinct col)``."""
    return kmv_estimate(kmv_sketch(df, col, k), k)
