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
    and that the r6 rotation actually covers round-5 work (>= 8 r5
    entries driver-graded, per VERDICT r5 next-round #1)."""
    from datasheet_etl_spark.plans import WINDOW, oracles, registry

    first50 = list(registry())[:50]
    assert first50 == list(WINDOW)
    ora = oracles()
    assert all(k in ora for k in first50)
    r5_entries = {
        "q35_cube", "q38_variant_extract", "t57_funnel",
        "t59_correlation_matrix", "t64_fuzzy_join", "t65_unigram_log_ppl",
        "t67_zorder_key", "t68_cdc_apply",
    }
    assert r5_entries <= set(first50)
    # and the r6 additions the verdict asked for are themselves graded
    r6_entries = {
        "q43_star_join_revenue", "q44_correlated_subqueries",
        "t73_incremental_rollup",
    }
    assert r6_entries <= set(first50)
    # r7 rotation (VERDICT r6 next-round #2): the six oracled r6
    # additions plus four never-driver-graded r5 residents are graded
    r7_entries = {
        "q45_union_by_name", "q46_nullsafe_join", "t74_resample_interp",
        "t75_stream_static_join", "t76_udtf_sentence_split",
        "t77_streaming_cdc_apply", "q39_recursive_cte",
        "t58_cohort_retention", "t69_rolling_anomaly",
        "t70_dedup_rate_report",
        # in-round promotions (VERDICT r6 ask #4 + the new split op)
        "t79_weighted_median_udaf", "t80_leakage_safe_split",
        # r7 continuation promotions (new-machinery entries)
        "t88_mergeable_quantile_hist", "t91_weighted_sample",
    }
    assert r7_entries <= set(first50)
