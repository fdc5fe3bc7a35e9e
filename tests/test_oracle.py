"""Every registry query with an oracle must hash-match DuckDB (t2 gate)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare


def _params():
    from datasheet_etl_spark.plans import oracles, registry

    reg, ora = registry(), oracles()
    return [pytest.param(name, id=name) for name in sorted(reg)]


@pytest.mark.parametrize("name", _params())
def test_query_matches_oracle(spark, name):
    from datasheet_etl_spark.plans import oracles, registry

    reg, ora = registry(), oracles()
    df = reg[name](spark, SF_ORACLE)
    if name not in ora:
        # rows-only contract: must run and return a stable schema
        assert df.columns, f"{name}: no columns"
        assert df.count() >= 0
        return
    ok, msg = compare(df, ora[name], SF_ORACLE)
    assert ok, f"{name}: {msg}"


def test_graded_window_contract():
    """The driver grades the first 50 registry entries. Pin that the
    window is exactly the explicit WINDOW list, every entry oracled,
    that the r9 rotation landed (VERDICT r8 next-round #1: t93 + t14
    driver-graded, plus the new t94 corpus-assembly capability), that
    the r8 rotation stays covered, and that demotion never drops
    oracle coverage."""
    from datasheet_etl_spark.plans import WINDOW, DEMOTED, oracles, registry

    first50 = list(registry())[:50]
    assert first50 == list(WINDOW)
    ora = oracles()
    assert all(k in ora for k in first50)
    # r9 rotation (VERDICT r8 next-round #1 + #3): the two entries the
    # driver had never checked, plus the corpus-assembly promotion
    r9_entries = {
        "t93_epoch_shuffle",
        "t14_streaming_stateful_sessions",
        "t94_substring_dedup_corpus",
    }
    assert r9_entries <= set(first50)
    # r8 rotation (VERDICT r7 next-round #1 + #2): the nine oracled r7
    # additions plus the new substring-overlap capability are graded
    r8_entries = {
        "t81_streaming_dedup_watermark", "t82_mixture_waterfill",
        "t83_ngram_novelty", "t84_curation_audit",
        "t85_contamination_report", "t86_csv_lenient_ingest",
        "t89_schema_evolution_at_rest", "t90_feature_scale",
        "q47_distribution_windows", "t92_substring_overlap",
    }
    assert r8_entries <= set(first50)
    # entries CREATED in round 7: >= 8 must be driver-graded
    r7_created = {
        "t79_weighted_median_udaf", "t80_leakage_safe_split",
        "t81_streaming_dedup_watermark", "t82_mixture_waterfill",
        "t83_ngram_novelty", "t84_curation_audit",
        "t85_contamination_report", "t86_csv_lenient_ingest",
        "t88_mergeable_quantile_hist", "t89_schema_evolution_at_rest",
        "t90_feature_scale", "t91_weighted_sample",
        "q47_distribution_windows",
    }
    assert len(r7_created & set(first50)) >= 8
    # demotion is a WINDOW decision, never an oracle decision: every
    # demoted entry keeps its DuckDB oracle and stays in this sweep
    assert all(k in ora for k in DEMOTED)
