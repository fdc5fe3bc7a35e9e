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
    window is exactly the explicit WINDOW list, every entry oracled
    with NO rows-only exceptions (r12: every driver row can show
    hash_match true), that the r13 rotation landed (ten of the
    fourteen oracled r12 entries the driver had never checked are
    graded), that recent rotations stay covered, and that demotion
    never drops oracle coverage."""
    from datasheet_etl_spark.plans import (
        DEMOTED,
        WINDOW,
        WINDOW_ROWS_ONLY,
        oracles,
        registry,
    )

    first50 = list(registry())[:50]
    assert first50 == list(WINDOW)
    ora = oracles()
    # r12 (VERDICT r11 "what's wrong" #1): EVERY window slot is
    # oracled — a slot that can never hash-match is a slot the driver
    # cannot certify. t102 (zlib, no SQL oracle possible) rotated back
    # out; its exact python-zlib parity pytest remains its grade.
    assert WINDOW_ROWS_ONLY == frozenset()
    assert all(k in ora for k in first50)
    # r13 rotation (VERDICT r12 #1, the written COVERAGE plan): ten
    # of the fourteen oracled r12 entries the driver never graded.
    # Eight on slots freed by idiom-superset demotions — q49 into
    # q54's tz-aware calendar bucketing, q50 into t125+q28's
    # scalar-decomposition discipline, q56's Expand into q52, q57's
    # RANGE-frame machinery into q47+q54, t109's df-join-back + rank
    # into t96+t97, t112 into t114 (same synth_events source through
    # the richer pushFilters path), t118's chained-checkpoint
    # discipline into t119 (join→agg, the strictly harder pair),
    # t120 into t121b's SAME oracle — plus two same-machinery pair
    # swaps: t108→t127 (the SAME native session_window operator,
    # dynamic per-event gap ⊃ fixed gap) and t06→t63b (the SAME
    # brute_force_topk scanner at k=50, doubling as rows-only t63's
    # distributed-stage certificate). t78/q61/q62/q65 stay swept
    # with written notes in COVERAGE.md.
    r13_entries = {
        "t123_state_store_read",
        "t124_hll_native_grouped",
        "t125_xpath_extract",
        "t126_arrow_python_udf",
        "q60_multi_distinct_agg",
        "q63_ordered_set_aggs",
        "q64_ignore_nulls_windows",
        "q66_sql_programmability",
        "t63b_mmr_pool",
        "t127_session_window_dynamic_gap",
    }
    assert r13_entries <= set(first50)
    # r12 rotation survivors (q56/q57/t118/t120 demoted r13 after
    # their green driver grade — the r8-r11 precedent: 1-3 green
    # grades + an in-window superset; rationales in DEMOTED)
    r12_entries = {
        "q54_timezone_parity",
        "q55_collation",
        "t119_stream_join_then_agg",
        # in-round pair swaps (same-oracle strict supersets): q58's
        # OFFSET page content is graded row-identically through q59's
        # keyset plan (equality pytest-pinned), t121's flat-mode
        # derivation through t121b's bucketed commit path (same oracle
        # as t120) — the swapped-out pair members stay swept
        "q59_pagination_keyset",
        "t121b_streaming_scd2_bucketed",
    }
    assert r12_entries <= set(first50)
    # r11 rotation survivors (t102 rotated out r12 per the verdict;
    # t103 demoted into t105, t104 into t89/t114/t115, t106 into
    # t107/t73, q48 into t95/t105; r13 demoted q49/q50 — rationales
    # in DEMOTED)
    r11_entries = {
        "q51_null_semantics",
    }
    assert r11_entries <= set(first50)
    # r11 in-round promotions (flagship new work is driver-graded
    # immediately; t100 demoted into t106/t107, t55 into t25/t14/t81,
    # q46 into q51; r13 demoted t108 into t127/t119/t117, t109 into
    # t96/t97, t112 into t114)
    r11_promoted = {
        "t107_frequent_ngrams_hashed",
        # review fix: t55's demotion anchors the grouped-KMV estimator
        # on t25's oracle, so t25 is itself driver-graded
        "t25_kmv_distinct",
        # second in-round batch: newest work driver-graded immediately
        # (r12 demoted t110 into q50→t125/q43/t73, t111 into t97, q53
        # into q43/t73/q52 — idiom-superset rationales in DEMOTED)
        "q52_grouping_sets",
        "t113_python_stream_source",
        "t114_python_source_pushdown",
        "t115_python_source_writer",
        # third/fourth batch: strict-superset swaps — t122 runs t41's/
        # t116's own stream_interval_join in full-outer form (inner ⊂
        # LEFT JOIN ⊂ FULL JOIN oracle rows), t117 grades t14's q18
        # oracle through the EventTimeTimeout lifecycle
        "t122_streaming_full_outer_join",
        "t117_stateful_timeout_sessions",
    }
    assert r11_promoted <= set(first50)
    # r10 rotation survivors (t100 demoted r11 — its output contract
    # stays graded through its OWN oracle via t106 and t107)
    r10_entries = {
        "t95_substring_span_excision",
        "t96_dsir_importance_select",
        "t97_training_shard_plan",
        "t98_incremental_substring_dedup",
        "t99_streaming_gram_index",
        "t12_multimodal_features",
        "t101_excision_impact_report",
        "t105_streaming_quarantine_ingest",
    }
    assert r10_entries <= set(first50)
    # r9 rotation: no survivors pinned — t94 demoted r11 (postings/
    # meet/span machinery graded inside t98/t95, keep/drop rollup
    # inside t101) and t14 demoted r11 into t117, which re-grades
    # t14's own q18 oracle through the strictly-harder
    # EventTimeTimeout close-once lifecycle (both after 2+ green
    # driver grades)
    # r8 rotation survivors (t81/t84 demoted r11 after three green
    # driver grades: t81's watermarked state graded inside t108/t105,
    # t84's roster-rollup discipline inside t101/t01; t82/t85/t83
    # demoted earlier r11 on the same superset basis)
    r8_entries = {
        "t89_schema_evolution_at_rest", "t90_feature_scale",
        "q47_distribution_windows",
    }
    assert r8_entries <= set(first50)
    # entries CREATED in round 7: >= 5 must still be driver-graded
    # (was >= 6 through r11; r12 demoted t79 — its Arrow-batched
    # Python seam graded inside the t112-t115 square, its grouped
    # quantile contract inside t88, both in-window)
    r7_created = {
        "t79_weighted_median_udaf", "t80_leakage_safe_split",
        "t81_streaming_dedup_watermark", "t82_mixture_waterfill",
        "t83_ngram_novelty", "t84_curation_audit",
        "t85_contamination_report", "t86_csv_lenient_ingest",
        "t88_mergeable_quantile_hist", "t89_schema_evolution_at_rest",
        "t90_feature_scale", "t91_weighted_sample",
        "q47_distribution_windows",
    }
    assert len(r7_created & set(first50)) >= 5
    # demotion is a WINDOW decision, never an oracle decision: every
    # demoted entry keeps its DuckDB oracle and stays in this sweep
    assert all(k in ora for k in DEMOTED)
