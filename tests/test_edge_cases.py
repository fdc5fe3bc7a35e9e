"""Edge-case operators the reference only planned (EDGE_CASES_ANALYSIS
TC-002 vertical merge, TC-007 footnotes) plus the A10 accuracy rollup —
fixtures lifted from the reference's own doc examples."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def uvlo_cells(spark):
    # docs/EDGE_CASES_ANALYSIS.md:10-24 example, cell-long form
    rows = [
        ["Parameter", "Conditions", "Min", "Typ", "Max", "Unit"],
        ["UVLO Threshold", "Rising", "3.8", "4.1", "4.4", "V"],
        ["", "Falling", "3.5", "3.8", "4.1", "V"],
        ["IQ", "VFB = 1.1V (Note 1)", "", "25", "40", "µA"],
    ]
    data = [
        ("t1", r, c, content)
        for r, row in enumerate(rows)
        for c, content in enumerate(row)
    ]
    return spark.createDataFrame(
        data, "key string, row_idx int, col_idx int, content string"
    )


def test_row_continuation_fill_down(spark, uvlo_cells):
    from datasheet_etl_spark.merge_cells import merge_row_continuations

    out = merge_row_continuations(uvlo_cells, mode="fill_down")
    got = {
        (r["row_idx"], r["col_idx"]): r["content"] for r in out.collect()
    }
    assert got[(2, 0)] == "UVLO Threshold"  # filled from the anchor row
    assert got[(2, 1)] == "Falling"  # other cells untouched
    assert got[(1, 0)] == "UVLO Threshold" and got[(3, 0)] == "IQ"
    assert len(got) == 24  # every cell survives


def test_row_continuation_concat(spark):
    from datasheet_etl_spark.merge_cells import merge_row_continuations

    rows = [
        ["VIN Operating", "", "4.2", "", "36", "V"],
        ["", "over temperature", "", "", "", ""],
    ]
    data = [
        ("t1", r, c, content)
        for r, row in enumerate(rows)
        for c, content in enumerate(row)
    ]
    cells = spark.createDataFrame(
        data, "key string, row_idx int, col_idx int, content string"
    )
    out = merge_row_continuations(cells, mode="concat")
    got = {(r["row_idx"], r["col_idx"]): r["content"] for r in out.collect()}
    assert got == {
        (0, 0): "VIN Operating",
        (0, 1): "over temperature",
        (0, 2): "4.2",
        (0, 3): "",
        (0, 4): "36",
        (0, 5): "V",
    }


def test_footnote_linking(spark, uvlo_cells):
    from datasheet_etl_spark.merge_cells import extract_notes, link_footnotes

    pages = spark.createDataFrame(
        [
            (
                "t1",
                "Electrical Characteristics\n"
                "Note 1: Measured at VIN = 12V, TA = 25°C\n"
                "Note 2: Guaranteed by design",
            )
        ],
        "key string, text string",
    )
    notes = extract_notes(pages)
    got_notes = {r["note_id"]: r["note_text"] for r in notes.collect()}
    assert got_notes == {
        "1": "Measured at VIN = 12V, TA = 25°C",
        "2": "Guaranteed by design",
    }
    linked = link_footnotes(uvlo_cells, notes).collect()
    assert len(linked) == 1
    r = linked[0]
    assert (r["row_idx"], r["col_idx"], r["note_id"]) == (3, 1, "1")
    assert r["note_text"].startswith("Measured at")


def test_diagram_type_detect(spark):
    from datasheet_etl_spark.functions.scalar import diagram_type
    from pyspark.sql import functions as F

    cases = [
        ("Functional Block Diagram", "block_diagram"),
        ("Simplified block diagram of the device", "block_diagram"),
        ("Typical Application Circuit", "typical_app"),
        ("Figure 3. Typical application", "typical_app"),
        ("Pin Configuration and Functions", "pinout"),
        ("PINOUT (Top View)", "pinout"),
        ("Electrical Characteristics", "unknown"),
        (None, "unknown"),
    ]
    df = spark.createDataFrame([(t,) for t, _ in cases], "caption string")
    got = [r["d"] for r in df.select(diagram_type(F.col("caption")).alias("d")).collect()]
    assert got == [want for _, want in cases]


def test_comparator_and_arbiter_registries(spark):
    """U1/U2: a custom pandas_udf comparator composes into the cascade;
    a registered arbiter drives resolution."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from datasheet_etl_spark.verify import (
        ARBITERS,
        arbitrate_with,
        custom_match,
        register_arbiter,
        register_comparator,
    )

    # lambda form: postponed annotations (future import) break hint-based
    # pandas_udf signatures in test modules
    fuzzy_len = pandas_udf(
        lambda a, b: (a.str.len() - b.str.len()).abs() <= 1, "boolean"
    )

    register_comparator("fuzzy_len", lambda x, y: fuzzy_len(x, y))
    try:
        df = spark.createDataFrame(
            [("abc", "abcd"), ("abc", "abcdef")], "v1 string, v2 string"
        )
        got = [
            r["m"]
            for r in df.select(
                custom_match(F.col("v1"), F.col("v2"), ["fuzzy_len"]).alias("m")
            ).collect()
        ]
        assert got == [True, False]
    finally:
        del __import__("datasheet_etl_spark.verify", fromlist=["x"]).COMPARATORS["fuzzy_len"]

    conflicts = spark.createDataFrame(
        [("t1", "numeric", "3.3", "3.9"), ("t1", "unit", "uA", "µA")],
        "key string, conflict_type string, vision_value string, rule_value string",
    )
    smart = {r["conflict_type"]: r["resolved_value"] for r in arbitrate_with(conflicts).collect()}
    assert smart == {"numeric": "3.3", "unit": "µA"}
    register_arbiter("always_rule", lambda df: F.lit("rule_wins"))
    try:
        forced = {
            r["conflict_type"]: r["resolved_value"]
            for r in arbitrate_with(conflicts, "always_rule").collect()
        }
        assert forced == {"numeric": "3.9", "unit": "µA"}
    finally:
        del ARBITERS["always_rule"]


def test_cross_page_table_merge(spark):
    """TC-006: tables with identical headers on consecutive pages fuse
    into one logical table; a different-header table breaks the run."""
    from datasheet_etl_spark.merge_cells import merge_cross_page_tables

    rows = [
        ("d1", 1, "t1", ["Parameter", "Min", "Max"], [["VIN", "4.2", "36"]]),
        ("d1", 2, "t2", ["Parameter", "Min", "Max"], [["IQ", "25", "40"]]),
        ("d1", 3, "t3", ["Pin", "Name"], [["1", "VIN"]]),
        ("d1", 4, "t4", ["Parameter", "Min", "Max"], [["TJ", "-40", "150"]]),
    ]
    tables = spark.createDataFrame(
        rows,
        "doc string, page_num int, key string, headers array<string>, "
        "raw_table array<array<string>>",
    )
    got = {r["key"]: r for r in merge_cross_page_tables(tables).collect()}
    assert set(got) == {"t1", "t3", "t4"}
    assert got["t1"]["n_parts"] == 2
    assert got["t1"]["raw_table"] == [["VIN", "4.2", "36"], ["IQ", "25", "40"]]
    assert got["t3"]["n_parts"] == 1 and got["t4"]["n_parts"] == 1


def test_whitespace_table_parse(spark):
    """TC-004: the borderless example from the reference doc parses into
    aligned columns via the blank-gutter grid."""
    from datasheet_etl_spark.merge_cells import parse_whitespace_table

    text = (
        "Parameter              Min    Typ    Max    Unit\n"
        "VIN Operating Range    4.2           36     V\n"
        "Quiescent Current             25     40     µA\n"
    )
    pages = spark.createDataFrame([("p1", text)], "key string, text string")
    cells = parse_whitespace_table(pages)
    got = {(r["row_idx"], r["col_idx"]): r["content"] for r in cells.collect()}
    ncols = 1 + max(c for _, c in got)
    assert ncols == 5
    assert got[(0, 0)] == "Parameter" and got[(0, 4)] == "Unit"
    assert got[(1, 0)] == "VIN Operating Range"
    assert got[(1, 1)] == "4.2" and got[(1, 2)] == "" and got[(1, 3)] == "36"
    assert got[(2, 1)] == "" and got[(2, 2)] == "25" and got[(2, 3)] == "40"
    assert got[(2, 4)] == "µA"


def test_accuracy_rollup(spark):
    from datasheet_etl_spark.verify import accuracy_metrics

    golden = spark.createDataFrame(
        [("t1", 0, 0, "a"), ("t1", 0, 1, "b"), ("t1", 1, 0, "c"), ("t2", 0, 0, "x")],
        "key string, row_idx int, col_idx int, content string",
    )
    extracted = spark.createDataFrame(
        [
            ("t1", 0, 0, "a"),      # match
            ("t1", 0, 1, "WRONG"),  # mismatch
            ("t1", 1, 0, "c"),      # match
            # t2 cell missed entirely -> counts as mismatch
            ("t2", 1, 0, "halluc"),  # hallucinated cell -> mismatch
        ],
        "key string, row_idx int, col_idx int, content string",
    )
    rows = accuracy_metrics(extracted, golden).collect()
    by = {(r["grain"], r["key"], r["row_idx"]): (r["accuracy"], r["n_cells"]) for r in rows}
    assert by[("overall", None, None)] == (0.4, 5)
    assert by[("table", "t1", None)] == (round(2 / 3, 6), 3)
    assert by[("table", "t2", None)] == (0.0, 2)
    assert by[("row", "t1", 0)] == (0.5, 2)
    assert by[("row", "t1", 1)] == (1.0, 1)


def test_snapshot_diff_null_fingerprints(spark):
    """Presence is decided by join-side indicators, not fp nullness: a
    key in both snapshots with NULL fingerprints (md5 of NULL body) is
    unchanged, and NULL->value / value->NULL are changed."""
    from datasheet_etl_spark.operators.relational import snapshot_diff

    old = spark.createDataFrame(
        [(1, None), (2, None), (3, "a")], "doc_id long, fp string"
    )
    new = spark.createDataFrame(
        [(1, None), (2, "b"), (4, None)], "doc_id long, fp string"
    )
    got = {r["doc_id"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_expectations_rule_names_with_quotes(spark):
    """Rule/column labels go through F.lit, never SQL splicing — quotes
    and backticks in names must not break parsing."""
    import pyspark.sql.functions as F

    from datasheet_etl_spark.operators.profile import check_expectations

    df = spark.createDataFrame([(1, "a"), (2, None)], "id long, t string")
    out = {
        r["rule"]: r["n_violations"]
        for r in check_expectations(
            df, {"text isn't `empty`": F.col("t").isNotNull()}
        ).collect()
    }
    assert out == {"text isn't `empty`": 1}


def test_crop_regions_out_of_raster_box_degrades_to_empty(spark):
    """A region box outside the raster yields a 0-sized crop, never a
    negative-dimension row."""
    from pyspark.sql import functions as F

    from datasheet_etl_spark.operators.multimodal import crop_regions

    pages = spark.createDataFrame(
        [("d", 1, 4, 4, 1, bytes(range(16)))],
        "doc string, page_num int, px_w int, px_h int, channels int, pixels binary",
    ).withColumn("page_w", F.lit(4.0)).withColumn("page_h", F.lit(4.0))
    regions = spark.createDataFrame(
        [("d", 1, 0, "table", 10.0, 10.0, 20.0, 20.0)],
        "doc string, page_num int, region_id int, kind string, "
        "x0 double, y0 double, x1 double, y1 double",
    )
    rows = crop_regions(regions, pages).collect()
    assert len(rows) == 1
    assert rows[0]["px_w"] == 0 and rows[0]["px_h"] == 0
    assert rows[0]["pixels"] == b""


def test_pagerank_empty_edges(spark):
    from datasheet_etl_spark.operators.graph import pagerank

    e = spark.createDataFrame([], "src long, dst long")
    assert pagerank(e).count() == 0


def test_fuzzy_join_same_column_name(spark):
    """The natural entity-resolution call — both dictionaries call
    their column 'name' — must work (right side auto-suffixed)."""
    from pyspark.sql import functions as F

    from datasheet_etl_spark.operators.relational import fuzzy_levenshtein_join

    clean = spark.createDataFrame([("red widget",), ("blue bolt",)], "name string")
    dirty = spark.createDataFrame([("ed widget",), ("blue bolt",)], "name string")
    out = fuzzy_levenshtein_join(
        clean,
        dirty,
        "name",
        "name",
        F.expr("right(name, 4)"),
        F.expr("right(name, 4)"),
        max_dist=2,
    ).collect()
    got = {(r["name"], r["name_r"], r["edit_dist"]) for r in out}
    assert got == {("red widget", "ed widget", 1), ("blue bolt", "blue bolt", 0)}


def test_mmr_select_empty_probes(spark):
    from datasheet_etl_spark.operators.similarity import mmr_select

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    probes = corpus.filter("vec_id < 0")
    out = mmr_select(corpus, probes, k=3)
    assert out.count() == 0
    assert out.columns == ["probe_id", "vec_id", "mmr_rank", "cos_sim"]


def test_apply_changes_semantics(spark):
    """CDC apply: latest-wins per key, delete drops, insert adds,
    untouched passes through; same-seq upsert+delete deletes."""
    from datasheet_etl_spark.operators.relational import apply_changes

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    changes = spark.createDataFrame(
        [
            (1, 1, "U", "a2"), (1, 2, "U", "a3"),   # two updates: seq 2 wins
            (2, 1, "D", None),                        # delete
            (4, 1, "I", "d"),                         # insert new key
            (5, 1, "U", "x"), (5, 1, "D", None),      # same seq: delete wins
        ],
        "k long, seq int, op string, v string",
    )
    got = {r["k"]: r["v"] for r in apply_changes(base, changes, ["k"], "seq").collect()}
    assert got == {1: "a3", 3: "c", 4: "d"}


def test_apply_changes_null_update_and_same_seq_determinism(spark):
    """An update carrying NULL sets the field to NULL (MERGE, not
    stale-retain); same-seq same-op duplicates resolve identically on
    every run (total window order)."""
    from datasheet_etl_spark.operators.relational import apply_changes

    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    changes = spark.createDataFrame(
        [(1, 1, "U", None), (2, 1, "U", "x"), (2, 1, "U", "y")],
        "k long, seq int, op string, v string",
    )
    for _ in range(3):
        got = {
            r["k"]: r["v"]
            for r in apply_changes(
                base.repartition(7), changes.repartition(5), ["k"], "seq"
            ).collect()
        }
        assert got == {1: None, 2: "y"}  # NULL applied; desc tiebreak -> y
