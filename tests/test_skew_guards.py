"""Skew guards in the candidate-generation joins: a single hot bucket or
stop-shingle must not turn a linear-output join quadratic."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_stop_shingle_cutoff_bounds_candidates(spark):
    """Docs sharing ONLY a corpus-wide boilerplate shingle never become
    candidates; docs sharing rare shingles still verify with the EXACT
    (full-array) Jaccard, boilerplate included."""
    from datasheet_etl_spark.operators.dedup import exact_jaccard_pairs

    hot = "the boilerplate"
    rows = []
    # 40 docs that have the hot shingle plus one unique shingle each
    for i in range(40):
        rows.append((i, [hot, f"unique {i}"]))
    # one genuinely near-dup pair sharing 3 rare shingles + the hot one
    rows.append((100, [hot, "rare a", "rare b", "rare c"]))
    rows.append((101, [hot, "rare a", "rare b", "rare c", "rare d"]))
    sh = spark.createDataFrame(rows, "doc_id long, sh array<string>")

    got = exact_jaccard_pairs(sh, threshold=0.5, max_df=10).collect()
    pairs = {(r.id_a, r.id_b): r.jaccard for r in got}
    # the 40 boilerplate-only docs would be C(40,2)=780 pairs without the
    # cutoff; with it, only the rare-shingle pair survives
    assert (100, 101) in pairs
    assert len(pairs) == 1
    # jaccard is exact over the FULL sets: |{hot,a,b,c}∩{hot,a,b,c,d}|=4,
    # |union|=5 → 0.8 (the dropped stop-shingle still counts in the sets)
    assert abs(pairs[(100, 101)] - 0.8) < 1e-9


def test_minhash_bucket_cap_bounds_candidates(spark):
    from datasheet_etl_spark.operators.dedup import lsh_candidate_pairs

    # 30 identical signatures = every band is one hot bucket of width 30
    sig = list(range(64))
    df = spark.createDataFrame(
        [(i, sig) for i in range(30)], "doc_id long, sig array<long>"
    )
    capped = lsh_candidate_pairs(df, "doc_id", "sig", max_bucket=10).count()
    uncapped = lsh_candidate_pairs(df, "doc_id", "sig", max_bucket=256).count()
    assert capped == 0  # every bucket over the cap → no quadratic join
    assert uncapped == 30 * 29 // 2


def test_hyperplane_bucket_cap(spark):
    from datasheet_etl_spark.operators.similarity import hyperplane_lsh_pairs

    # 25 identical vectors collide in every table's same bucket
    vec = [1.0, 0.5, -0.25, 2.0]
    corpus = spark.createDataFrame(
        [(i, vec) for i in range(25)], "vec_id long, embedding array<double>"
    )
    capped = hyperplane_lsh_pairs(corpus, max_bucket=10).count()
    uncapped = hyperplane_lsh_pairs(corpus, max_bucket=64).count()
    assert capped == 0
    assert uncapped == 25 * 24 // 2


def test_bucket_cap_none_disables_guard(spark):
    """max_bucket=None keeps full recall (quadratic risk is the caller's
    explicit choice)."""
    from datasheet_etl_spark.operators.dedup import lsh_candidate_pairs

    sig = list(range(64))
    df = spark.createDataFrame(
        [(i, sig) for i in range(30)], "doc_id long, sig array<long>"
    )
    assert (
        lsh_candidate_pairs(df, "doc_id", "sig", max_bucket=None).count()
        == 30 * 29 // 2
    )


def test_dropped_buckets_reports_capped_width(spark):
    """Observability twin of cap_buckets: the recall the cap trades away
    is countable, not silent."""
    from datasheet_etl_spark.operators.dedup import banded_buckets
    from datasheet_etl_spark.operators.relational import dropped_buckets

    sig = list(range(64))
    # 30 identical docs (hot in every band) + 2 docs unique per band
    rows = [(i, sig) for i in range(30)]
    rows += [(100, [i * 3 for i in range(64)]), (101, [i * 5 for i in range(64)])]
    df = spark.createDataFrame(rows, "doc_id long, sig array<long>")
    banded = banded_buckets(df, "doc_id", "sig", bands=8, num_perm=64)
    hot = dropped_buckets(banded, ["band", "bucket"], max_size=10).collect()
    # the 30-wide cluster occupies exactly one bucket per band = 8 hot buckets
    assert len(hot) == 8
    assert all(r.bucket_width == 30 for r in hot)
