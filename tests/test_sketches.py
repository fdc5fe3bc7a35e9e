"""KMV distinct sketch: accuracy, mergeability, exact-small-domain."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_kmv_estimate_within_error_bound(spark):
    from datasheet_etl_spark.io import load_table
    from datasheet_etl_spark.operators.sketches import kmv_distinct

    li = load_table(spark, SF_SMOKE, "lineitem")
    exact = li.select("l_orderkey").distinct().count()
    est = kmv_distinct(li, "l_orderkey", k=256)
    # KMV std error ≈ 1/sqrt(k−2) ≈ 6.3%; allow 3σ
    assert abs(est - exact) / exact < 0.19, (est, exact)


def test_kmv_small_domain_is_exact(spark):
    from datasheet_etl_spark.io import load_table
    from datasheet_etl_spark.operators.sketches import kmv_distinct

    li = load_table(spark, SF_SMOKE, "lineitem")
    exact = li.select("l_linenumber").distinct().count()  # 7 values
    assert kmv_distinct(li, "l_linenumber", k=256) == float(exact)


def test_kmv_sketches_merge_exactly(spark):
    """sketch(A ∪ B) == merge(sketch(A), sketch(B)) — bit-exact, the
    property HLL registers give only approximately."""
    from datasheet_etl_spark.io import load_table
    from datasheet_etl_spark.operators.sketches import kmv_merge, kmv_sketch

    li = load_table(spark, SF_SMOKE, "lineitem")
    a = li.filter(F.col("l_orderkey") % 2 == 0)
    b = li.filter(F.col("l_orderkey") % 2 == 1)
    merged = kmv_merge(
        kmv_sketch(a, "l_orderkey", 128), kmv_sketch(b, "l_orderkey", 128), k=128
    )
    whole = kmv_sketch(li, "l_orderkey", 128)
    assert [r["h"] for r in merged.collect()] == [r["h"] for r in whole.collect()]
