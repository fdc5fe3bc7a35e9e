"""Merged-cell detection & resolution as window dataflows (survey §2.4).

Reference semantics (behavioral spec: merge_detector.py:55-460) —
sequential scan-with-reset loops over 2D cell lists — re-expressed as the
run-length window idiom over a *cell-long* DataFrame:

    cells(key, row_idx, col_idx, content [, x_start, x_end])

- W1 header merges: header row sparser than data row → each non-empty
  header cell spans its trailing empties (conf 0.85)
- W2 empty-pattern merges: any row, span 2–4 + category-header predicate
  (conf 0.70)
- W3 position merges: cell width > 1.5 × column's typical width →
  span = floor(width/typical) (conf 0.90)
- W4 typical width: *upper median* per column (reference picks
  ``sorted(w)[n//2]``, not the interpolated median)
- W5 dedup: top-1 per (row, col_start) by confidence
- W6 header resolve: category content spread into spanned empty headers
- W7 row resolve: spanned data cells take the merge content
- A7/A8: mean confidence (1.0 when no merges) → vision-fallback routing

Scale: everything partitions by (key) or (key, row_idx); a table's cells
are never compared across tables, so the dataflow shards perfectly over
documents. Spans per table are tiny → the resolve joins broadcast.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datasheet_etl_spark.functions import is_category_header

CONFIDENCE_THRESHOLD = 0.60  # vision-fallback routing (ref: merge_detector.py:50)


def cells_from_raw(tables: DataFrame, key: str = "key", raw_col: str = "raw_table") -> DataFrame:
    """raw 2D table array<array<string>> → cell-long form."""
    rows = tables.select(key, F.posexplode(raw_col).alias("row_idx", "cells"))
    return rows.select(
        key, "row_idx", F.posexplode("cells").alias("col_idx", "content")
    )


def _nonempty(col) -> F.Column:
    return F.trim(F.coalesce(col, F.lit(""))) != ""


def _runs(cells: DataFrame, key: str) -> DataFrame:
    """Run-length construction: each non-empty cell starts a run; its
    trailing empty cells join the run. span = run size."""
    w = (
        Window.partitionBy(key, "row_idx")
        .orderBy("col_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    runs = cells.withColumn("run_id", F.sum(_nonempty(F.col("content")).cast("int")).over(w))
    return (
        runs.filter(F.col("run_id") > 0)
        .groupBy(key, "row_idx", "run_id")
        .agg(
            F.min("col_idx").alias("col_start"),
            F.max("col_idx").alias("col_end"),
            F.count("*").alias("span"),
            F.trim(F.min_by("content", "col_idx")).alias("content"),
        )
    )


def detect_header_merges(cells: DataFrame, key: str = "key") -> DataFrame:
    """W1 (ref: merge_detector.py:99-147): fires only when the header row
    has fewer non-empty cells than the first data row."""
    counts = (
        cells.filter(F.col("row_idx").isin(0, 1))
        .groupBy(key)
        .agg(
            F.count_if((F.col("row_idx") == 0) & _nonempty(F.col("content"))).alias("h"),
            F.count_if((F.col("row_idx") == 1) & _nonempty(F.col("content"))).alias("d"),
        )
        .filter(F.col("h") < F.col("d"))
        .select(key)
    )
    runs = _runs(cells.filter(F.col("row_idx") == 0), key)
    return (
        runs.join(counts, key, "left_semi")
        .filter(F.col("span") > 1)
        .select(
            key,
            F.col("row_idx").alias("row"),
            "col_start",
            "col_end",
            "content",
            F.lit("horizontal").alias("merge_type"),
            F.lit(0.85).alias("confidence"),
            F.lit(1).alias("method_rank"),
        )
    )


def detect_empty_cell_patterns(cells: DataFrame, key: str = "key") -> DataFrame:
    """W2 (ref: merge_detector.py:149-190): span 2–4 and the leader looks
    like a category header."""
    runs = _runs(cells, key)
    return (
        runs.filter(
            (F.col("span") > 1)
            & (F.col("span") <= 4)
            & is_category_header(F.col("content"))
        )
        .select(
            key,
            F.col("row_idx").alias("row"),
            "col_start",
            "col_end",
            "content",
            F.lit("horizontal").alias("merge_type"),
            F.lit(0.70).alias("confidence"),
            F.lit(2).alias("method_rank"),
        )
    )


def detect_by_positions(cells: DataFrame, key: str = "key") -> DataFrame:
    """W3/W4 (ref: merge_detector.py:192-254): width-based spans against
    the column's *upper median* width."""
    with_width = cells.filter(F.col("x_start").isNotNull()).withColumn(
        "width", F.col("x_end") - F.col("x_start")
    )
    typical = (
        with_width.groupBy(key, "col_idx")
        .agg(F.array_sort(F.collect_list("width")).alias("ws"))
        .select(
            key,
            "col_idx",
            F.element_at("ws", (F.floor(F.size("ws") / 2) + 1).cast("int")).alias(
                "typical_width"
            ),
        )
    )
    wide = (
        with_width.join(typical, [key, "col_idx"], "left")
        .filter(
            _nonempty(F.col("content"))
            & (F.col("typical_width") > 0)
            & (F.col("width") > F.col("typical_width") * 1.5)
        )
        .withColumn("span", F.floor(F.col("width") / F.col("typical_width")).cast("int"))
        .filter(F.col("span") > 1)
    )
    return wide.select(
        key,
        F.col("row_idx").alias("row"),
        F.col("col_idx").alias("col_start"),
        (F.col("col_idx") + F.col("span") - 1).alias("col_end"),
        F.trim("content").alias("content"),
        F.lit("horizontal").alias("merge_type"),
        F.lit(0.90).alias("confidence"),
        F.lit(3).alias("method_rank"),
    )


def dedupe_merges(merges: DataFrame, key: str = "key") -> DataFrame:
    """W5 (ref: merge_detector.py:288-301): keep highest confidence per
    (row, col_start); insertion order (method_rank) breaks ties the way
    the reference's strict ``>`` does."""
    w = Window.partitionBy(key, "row", "col_start").orderBy(
        F.col("confidence").desc(), F.col("method_rank").asc()
    )
    return (
        merges.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "method_rank")
    )


def detect_merges(cells: DataFrame, key: str = "key", with_positions: bool = False) -> DataFrame:
    parts = [detect_header_merges(cells, key), detect_empty_cell_patterns(cells, key)]
    if with_positions:
        parts.append(detect_by_positions(cells, key))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return dedupe_merges(out, key)


def resolve_headers(cells: DataFrame, merges: DataFrame, key: str = "key") -> DataFrame:
    """W6 (ref: merge_detector.py:345-369): spread the category content
    into spanned *empty* header cells. Returns (key, col_idx, header)."""
    headers = cells.filter(F.col("row_idx") == 0)
    spans = merges.filter(F.col("row") == 0).select(
        key, "col_start", "col_end", F.col("content").alias("category")
    )
    cond = (
        (headers[key] == spans[key])
        & (headers.col_idx >= spans.col_start)
        & (headers.col_idx <= spans.col_end)
    )
    joined = headers.join(F.broadcast(spans), cond, "left").select(
        headers[key].alias(key),
        "col_idx",
        F.when(~_nonempty(F.col("content")) & F.col("category").isNotNull(), F.col("category"))
        .otherwise(F.trim(F.coalesce(F.col("content"), F.lit(""))))
        .alias("header"),
    )
    return joined


def resolve_rows(cells: DataFrame, merges: DataFrame, key: str = "key") -> DataFrame:
    """W7 (ref: merge_detector.py:371-396): spanned data cells take the
    merge content. Returns resolved cell-long data rows."""
    data = cells.filter(F.col("row_idx") >= 1)
    spans = merges.select(
        key, F.col("row").alias("row_idx"), "col_start", "col_end",
        F.col("content").alias("merge_content"),
    )
    cond = (
        (data[key] == spans[key])
        & (data.row_idx == spans.row_idx)
        & (data.col_idx >= spans.col_start)
        & (data.col_idx <= spans.col_end)
    )
    return data.join(F.broadcast(spans), cond, "left").select(
        data[key].alias(key),
        data.row_idx.alias("row_idx"),
        "col_idx",
        F.coalesce(F.col("merge_content"), F.trim(F.coalesce(F.col("content"), F.lit(""))))
        .alias("value"),
    )


def resolved_row_maps(
    resolved_cells: DataFrame, headers: DataFrame, key: str = "key"
) -> DataFrame:
    """Rows as maps keyed by resolved header (ref dict semantics: duplicate
    header names collapse, last column wins)."""
    named = resolved_cells.join(headers, [key, "col_idx"], "inner")
    w = Window.partitionBy(key, "row_idx", "header").orderBy(F.col("col_idx").desc())
    last_wins = named.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    per_row = last_wins.groupBy(key, "row_idx").agg(
        F.map_from_entries(
            F.transform(
                F.array_sort(F.collect_list(F.struct("col_idx", "header", "value"))),
                lambda s: F.struct(s["header"].alias("key"), s["value"].alias("value")),
            )
        ).alias("row_map")
    )
    return per_row


def merge_confidence(merges: DataFrame, tables: DataFrame, key: str = "key") -> DataFrame:
    """A7/A8 (ref: merge_detector.py:398-416): mean merge confidence per
    table (1.0 when none) + the vision-fallback flag."""
    per = merges.groupBy(key).agg(F.avg("confidence").alias("merge_confidence"))
    return (
        tables.select(key)
        .distinct()
        .join(per, key, "left")
        .select(
            key,
            F.coalesce("merge_confidence", F.lit(1.0)).alias("merge_confidence"),
            (F.coalesce("merge_confidence", F.lit(1.0)) < CONFIDENCE_THRESHOLD).alias(
                "needs_vision"
            ),
        )
    )


@dataclass
class EnhanceResult:
    merges: DataFrame
    headers: DataFrame
    resolved_rows: DataFrame
    routing: DataFrame  # key, merge_confidence, needs_vision


def enhance_tables(
    tables: DataFrame, key: str = "key", raw_col: str = "raw_table", with_positions: bool = False
) -> EnhanceResult:
    """The ``enhance_table_extraction`` dataflow (ref:
    merge_detector.py:423-460): detect → resolve → confidence → route.
    Routing is a column, not control flow — downstream stages filter on
    ``needs_vision`` and union the vision-reextracted slice back (§3.3)."""
    cells = cells_from_raw(tables, key, raw_col)
    merges = detect_merges(cells, key, with_positions)
    headers = resolve_headers(cells, merges, key)
    rows = resolved_row_maps(resolve_rows(cells, merges, key), headers, key)
    routing = merge_confidence(merges, tables, key)
    return EnhanceResult(merges=merges, headers=headers, resolved_rows=rows, routing=routing)


# ---------------------------------------------------------------------------
# W8: row-continuation merge (ref: docs/EDGE_CASES_ANALYSIS.md:16-32 —
# planned in the reference, implemented here)
# ---------------------------------------------------------------------------


def merge_row_continuations(
    cells: DataFrame, key: str = "key", mode: str = "fill_down"
) -> DataFrame:
    """A row whose first column is empty but that carries values
    continues the previous row (TC-002 vertical merge / cross-page W8).

    mode='fill_down' keeps every row and spreads the anchor row's first-
    column value into the continuations (the UVLO Rising/Falling shape —
    sub-rows stay distinct rows). mode='concat' collapses each
    continuation group to one row, joining non-empty cell texts per
    column (the literal 'merge with previous row' strategy).

    One shuffle on ``key``; the group id is the W1/W8 run-length idiom —
    a running sum of is-new-row flags ordered by row_idx.
    """
    flags = cells.groupBy(key, "row_idx").agg(
        F.max(
            ((F.col("col_idx") == 0) & _nonempty(F.col("content"))).cast("int")
        ).alias("has_first"),
        F.max(
            ((F.col("col_idx") > 0) & _nonempty(F.col("content"))).cast("int")
        ).alias("has_values"),
    )
    is_new = (
        (F.col("has_first") == 1) | (F.col("has_values") == 0)
    ).cast("int")
    wrun = (
        Window.partitionBy(key)
        .orderBy("row_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    groups = flags.select(
        key, "row_idx", is_new.alias("is_new")
    ).withColumn("grp", F.sum("is_new").over(wrun))
    tagged = cells.join(groups.select(key, "row_idx", "grp"), [key, "row_idx"])

    if mode == "fill_down":
        # fill only within the continuation group: the anchor value
        # carries down exactly while grp is unchanged
        wgrp = (
            Window.partitionBy(key, "grp", "col_idx")
            .orderBy("row_idx")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        filled = F.when(
            (F.col("col_idx") == 0) & ~_nonempty(F.col("content")),
            F.last(
                F.when(_nonempty(F.col("content")), F.col("content")), ignorenulls=True
            ).over(wgrp),
        ).otherwise(F.col("content"))
        return tagged.select(
            key, "row_idx", "col_idx", F.coalesce(filled, F.col("content")).alias("content")
        )

    if mode == "concat":
        joined = (
            tagged.groupBy(key, "grp", "col_idx")
            .agg(
                F.min("row_idx").alias("row_idx"),
                F.array_join(
                    F.filter(
                        F.transform(
                            F.array_sort(
                                F.collect_list(F.struct("row_idx", "content"))
                            ),
                            lambda s: F.trim(s["content"]),
                        ),
                        lambda c: c != "",
                    ),
                    " ",
                ).alias("content"),
            )
        )
        return joined.select(key, "row_idx", "col_idx", "content")

    raise ValueError(f"mode must be fill_down|concat, got {mode!r}")


# ---------------------------------------------------------------------------
# P19: footnote linking (ref: docs/EDGE_CASES_ANALYSIS.md:74-89 — planned
# in the reference, implemented here)
# ---------------------------------------------------------------------------


def extract_notes(pages: DataFrame, key: str = "key", text_col: str = "text") -> DataFrame:
    """Page-bottom footnote definitions: 'Note N: …' lines →
    (key, note_id, note_text)."""
    lines = pages.select(
        key, F.explode(F.split(F.col(text_col), r"\n")).alias("_line")
    )
    return lines.select(
        key,
        F.regexp_extract("_line", r"^\s*Note\s+(\d+)\s*:", 1).alias("note_id"),
        F.trim(F.regexp_extract("_line", r"^\s*Note\s+\d+\s*:\s*(.*)$", 1)).alias(
            "note_text"
        ),
    ).filter(F.col("note_id") != "")


def link_footnotes(cells: DataFrame, notes: DataFrame, key: str = "key") -> DataFrame:
    """Footnote markers '(Note N)' inside cell text, exploded and
    equi-joined to the notes table — one marker row per (cell, note).
    Cells without markers do not appear; unmatched markers keep NULL
    note_text (left join), surfacing dangling references."""
    marked = cells.select(
        key,
        "row_idx",
        "col_idx",
        F.explode(
            F.expr(r"regexp_extract_all(content, 'Note\\s+(\\d+)', 1)")
        ).alias("note_id"),
    )
    return marked.join(notes, [key, "note_id"], "left")


# ---------------------------------------------------------------------------
# TC-006: cross-page table continuation (ref: docs/EDGE_CASES_ANALYSIS.md
# §2.4 — planned in the reference, implemented here)
# ---------------------------------------------------------------------------


def merge_cross_page_tables(
    tables: DataFrame,
    doc_col: str = "doc",
    page_col: str = "page_num",
    headers_col: str = "headers",
    raw_col: str = "raw_table",
    key_col: str = "key",
) -> DataFrame:
    """Tables on consecutive pages with an identical column structure are
    one logical table split by pagination: a table whose headers equal
    the previous table's headers (per document, in page order) continues
    it. Groups form with the run-length idiom (sum of is-new flags over
    the page order); each group's raw rows concatenate in page order.

    Returns one row per merged table: (doc, key = first member's key,
    n_parts, headers, raw_table)."""
    w = Window.partitionBy(doc_col).orderBy(page_col, key_col)
    prev = F.lag(F.col(headers_col)).over(w)
    is_new = (
        prev.isNull() | (F.col(headers_col) != prev)
    ).cast("int")
    grp = F.sum(is_new).over(
        Window.partitionBy(doc_col)
        .orderBy(page_col, key_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tagged = tables.withColumn("_grp", grp)
    return (
        tagged.groupBy(doc_col, "_grp")
        .agg(
            F.min_by(key_col, F.col(page_col)).alias(key_col),
            F.count("*").alias("n_parts"),
            F.first(headers_col).alias(headers_col),
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(page_col, key_col, raw_col))
                    ),
                    lambda s: s[raw_col],
                )
            ).alias(raw_col),
        )
        .drop("_grp")
    )


# ---------------------------------------------------------------------------
# TC-004: borderless (whitespace-aligned) table parsing (ref:
# docs/EDGE_CASES_ANALYSIS.md §2.2 — the reference routes these to the
# vision model; here the rule-based fallback is implemented directly)
# ---------------------------------------------------------------------------


def parse_whitespace_table(
    pages: DataFrame, key: str = "key", text_col: str = "text", min_gap: int = 2
) -> DataFrame:
    """Parse a whitespace-aligned text table into cell rows.

    Column boundaries are the character positions that are blank (space /
    past end-of-line) in EVERY non-empty line for a run of ≥ ``min_gap``
    characters — the visual gutters. Runs as an Arrow-batched
    mapInPandas stage (per-document char-grid analysis is genuinely
    imperative); output is the cell-long form the merge/W-operators
    consume: (key, row_idx, col_idx, content).
    """
    import numpy as np
    import pandas as pd

    def parse_one(text: str):
        lines = [ln.rstrip() for ln in (text or "").split("\n")]
        lines = [ln for ln in lines if ln.strip()]
        if not lines:
            return []
        width = max(len(ln) for ln in lines)
        grid = np.full((len(lines), width), " ", dtype="<U1")
        for i, ln in enumerate(lines):
            grid[i, : len(ln)] = list(ln)
        blank = (grid == " ").all(axis=0)
        # gutters: blank runs of >= min_gap, not touching the left edge
        cuts, run = [], 0
        for pos in range(width):
            run = run + 1 if blank[pos] else 0
            if run == min_gap and pos + 1 - run > 0:
                cuts.append(pos + 1 - run)
        bounds = [0, *cuts, width]
        rows = []
        for r, ln in enumerate(lines):
            for c in range(len(bounds) - 1):
                lo = bounds[c]
                hi = bounds[c + 1]
                rows.append((r, c, ln[lo:hi].strip()))
        return rows

    def op(batches):
        for pdf in batches:
            out = []
            for k, text in zip(pdf[key], pdf[text_col]):
                for r, c, content in parse_one(text):
                    out.append(
                        {key: k, "row_idx": r, "col_idx": c, "content": content}
                    )
            if out:
                yield pd.DataFrame(out)

    key_type = dict(pages.dtypes)[key]
    return pages.select(key, text_col).mapInPandas(
        op, schema=f"{key} {key_type}, row_idx int, col_idx int, content string"
    )
