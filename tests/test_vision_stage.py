"""External-call stage (S8): retry containment, budget guard, binary
hygiene, and Arrow batch integrity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def media(spark):
    from datasheet_etl_spark.io import load_table
    from datasheet_etl_spark.operators.multimodal import synth_media

    docs = load_table(spark, SF_ORACLE, "documents").limit(60)
    return synth_media(docs).cache()


def test_ok_path_features_and_hygiene(spark, media):
    from datasheet_etl_spark.sources import vision_extract_stage

    out = vision_extract_stage(media)
    assert "content" not in out.columns  # payload dropped after the stage
    rows = out.collect()
    assert len(rows) == 60
    assert all(r["status"] == "ok" and r["attempts"] == 1 for r in rows)
    assert all(abs(r["cost_usd"] - 0.002) < 1e-12 for r in rows)
    assert all(r["n_chars"] > 0 for r in rows)


def test_flaky_client_retries_then_succeeds(spark, media):
    from datasheet_etl_spark.sources import FlakyMockVisionClient, vision_extract_stage

    out = vision_extract_stage(
        media,
        client_factory=lambda: FlakyMockVisionClient(fail_mod=3, fail_attempts=2),
        max_retries=3,
    ).collect()
    for r in out:
        if r["media_id"] % 3 == 0:
            assert r["status"] == "ok" and r["attempts"] == 3, r
            assert abs(r["cost_usd"] - 0.006) < 1e-12  # each attempt billed
        else:
            assert r["status"] == "ok" and r["attempts"] == 1, r


def test_exhausted_retries_fail_row_not_job(spark, media):
    from datasheet_etl_spark.sources import FlakyMockVisionClient, vision_extract_stage

    out = vision_extract_stage(
        media,
        client_factory=lambda: FlakyMockVisionClient(fail_mod=5, fail_attempts=99),
        max_retries=2,
    ).collect()
    failed = [r for r in out if r["media_id"] % 5 == 0]
    assert failed and all(
        r["status"].startswith("failed") and r["n_chars"] is None and r["attempts"] == 2
        for r in failed
    )
    assert all(r["status"] == "ok" for r in out if r["media_id"] % 5 != 0)


def test_budget_guard_skips_not_fails(spark, media):
    from datasheet_etl_spark.sources import vision_extract_stage

    # 60 rows × $0.002 = $0.12 full spend; cap well below it
    out = vision_extract_stage(media, budget_usd=0.03, rate_partitions=2)
    rows = out.collect()
    skipped = [r for r in rows if r["status"] == "skipped_budget"]
    ok = [r for r in rows if r["status"] == "ok"]
    assert len(rows) == 60 and skipped and ok
    assert all(r["cost_usd"] == 0.0 and r["n_chars"] is None for r in skipped)
    # pre-call guard: overshoot bounded by one in-flight call per partition
    spent = sum(r["cost_usd"] for r in rows)
    assert spent <= 0.03 + 2 * 0.002 + 1e-9
    # driver-side observability accumulator saw the same spend
    assert abs(out._vision_spent_accumulator.value - spent) < 1e-9


def test_rate_partitioning_bounds_concurrency(spark, media):
    from datasheet_etl_spark.sources import vision_extract_stage

    out = vision_extract_stage(media, rate_partitions=2)
    assert out.rdd.getNumPartitions() == 2
