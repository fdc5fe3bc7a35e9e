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


def _doc_sigs(spark, sf_dir):
    from datasheet_etl_spark.functions import tokens
    from datasheet_etl_spark.io import load_table
    from datasheet_etl_spark.operators.dedup import (
        minhash_signatures,
        word_shingles,
    )

    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select("doc_id", word_shingles(tokens(F.col("text")), 2).alias("sh"))
    return minhash_signatures(sh, "doc_id", "sh")


def test_incremental_minhash_probe_matches_from_scratch(spark, tmp_path):
    """Cross-shard recall contract: probing the persisted index finds
    EXACTLY the (corpus, shard) pairs the from-scratch LSH run over the
    full corpus finds (same banding constants ⇒ same bucket
    collisions), with the identical est-Jaccard values."""
    from tests.conftest import SF_SMOKE

    from datasheet_etl_spark.operators.dedup import (
        lsh_candidate_pairs,
        probe_minhash_index,
        write_minhash_index,
    )

    sigs = _doc_sigs(spark, SF_SMOKE).persist()
    corpus = sigs.filter(F.col("doc_id") < 250)
    shard = sigs.filter(F.col("doc_id") >= 250)

    path = str(tmp_path / "mh_idx")
    write_minhash_index(corpus, path)
    probed = {
        (r["new_id"], r["index_id"], r["est_jaccard"])
        for r in probe_minhash_index(spark, path, shard, threshold_est=0.5).collect()
    }

    # from-scratch over the FULL corpus, restricted to cross-shard pairs
    # and verified with the same est-Jaccard predicate
    full = lsh_candidate_pairs(sigs, "doc_id", "sig")
    sig_map = {r["doc_id"]: r["sig"] for r in sigs.collect()}
    scratch = set()
    for r in full.collect():
        lo, hi = r["id_a"], r["id_b"]
        if (lo < 250) == (hi < 250):  # keep only cross-shard pairs
            continue
        new_id, idx_id = (hi, lo) if hi >= 250 else (lo, hi)
        a, b = sig_map[new_id], sig_map[idx_id]
        est = round(sum(x == y for x, y in zip(a, b)) / len(a), 6)
        if est >= 0.5:
            scratch.add((new_id, idx_id, est))
    sigs.unpersist()
    assert probed == scratch and probed, (len(probed), len(scratch))


def test_minhash_index_append_lifecycle(spark, tmp_path):
    """Write → probe → append survivors → a later shard's probe sees
    BOTH the original corpus and the appended shard (the nightly-ingest
    loop), and appending never duplicates candidates."""
    from tests.conftest import SF_SMOKE

    from datasheet_etl_spark.operators.dedup import (
        append_to_minhash_index,
        probe_minhash_index,
        write_minhash_index,
    )

    sigs = _doc_sigs(spark, SF_SMOKE).persist()
    corpus = sigs.filter(F.col("doc_id") < 200)
    shard1 = sigs.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 300))
    shard2 = sigs.filter(F.col("doc_id") >= 300)

    path = str(tmp_path / "mh_idx")
    write_minhash_index(corpus, path)
    hits1 = probe_minhash_index(spark, path, shard1)
    dup_ids = [r["new_id"] for r in hits1.select("new_id").distinct().collect()]
    survivors = shard1.filter(~F.col("doc_id").isin(dup_ids))
    append_to_minhash_index(survivors, path)

    hits2 = probe_minhash_index(spark, path, shard2)
    partners = {r["index_id"] for r in hits2.collect()}
    # shard2 must be able to match appended shard-1 survivors as well as
    # the original corpus; at minimum every partner is a real index id
    idx_ids = {
        r["doc_id"] for r in spark.read.parquet(path).select("doc_id").distinct().collect()
    }
    assert partners <= idx_ids
    assert {r["doc_id"] for r in survivors.select("doc_id").collect()} <= idx_ids
    # no duplicate (new, index) rows
    assert hits2.count() == hits2.select("new_id", "index_id").distinct().count()
    sigs.unpersist()


def test_probe_minhash_index_caps_combined_bucket_width(spark, tmp_path):
    """The probe's skew guard must cap the COMBINED (index + shard)
    bucket width — exactly what the from-scratch run caps on the
    unified corpus. 20 index + 10 shard copies of one signature: a cap
    of 25 (> index width alone!) must drop the bucket entirely, a cap
    of 40 must admit all 200 cross pairs."""
    from datasheet_etl_spark.operators.dedup import (
        probe_minhash_index,
        write_minhash_index,
    )

    sig = list(range(64))
    corpus = spark.createDataFrame(
        [(i, sig) for i in range(20)], "doc_id long, sig array<long>"
    )
    shard = spark.createDataFrame(
        [(100 + i, sig) for i in range(10)], "doc_id long, sig array<long>"
    )
    path = str(tmp_path / "mh_idx")
    write_minhash_index(corpus, path)
    capped = probe_minhash_index(spark, path, shard, max_bucket=25).count()
    open_ = probe_minhash_index(spark, path, shard, max_bucket=40).count()
    assert capped == 0
    assert open_ == 200
