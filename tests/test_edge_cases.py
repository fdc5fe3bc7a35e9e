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
