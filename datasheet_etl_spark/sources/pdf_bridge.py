"""PDF ingestion bridge (S1–S5) — import-guarded real path + fixture path.

The reference opens PDFs with pdfplumber and walks pages into
``page_data`` dicts {text, tables, width, height}
(extractor_v03.py:388-403) and renders pages to images through a
backend-probed renderer (pdf_renderer.py:81-112, 181-258). This
environment ships neither pdfplumber nor PyMuPDF, so:

- ``pdf_pages`` / ``render_pages`` are REAL mapInPandas stages over a
  ``binaryFile``-shaped (path, content) DataFrame that activate the
  moment a backend import succeeds — the Spark plumbing (Arrow batches,
  page explode, binary hygiene) is identical either way;
- ``pages_from_fixture`` loads checked-in page-dict JSON fixtures with
  the SAME schema, so every downstream stage (table lift → pipeline →
  verify → export) is exercised end to end here and now.

Scale notes: one task decodes one PDF at a time (pages yield per
document — no whole-corpus materialization); the page rows carry text
and table arrays but never the source PDF bytes (dropped after the
decode stage, same hygiene as ``operators.multimodal``). A million-PDF
corpus is ``spark.read.format("binaryFile")`` partitioned by file, and
this stage maps it without any shuffle.
"""

from __future__ import annotations

import io
import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# page_data contract (extractor_v03.py:398-403) + provenance keys;
# tables is pdfplumber's extract_tables() shape: list of row-lists
PAGE_SCHEMA = (
    "doc string, page_num int, text string, "
    "tables array<array<array<string>>>, width double, height double"
)

RENDER_SCHEMA = "doc string, page_num int, dpi int, image binary, render_status string"


def pdf_backend() -> str:
    """Probe the text/table extraction backend (pdf_renderer.py's
    backend-detect idiom applied to extraction)."""
    try:
        import pdfplumber  # type: ignore # noqa: F401

        return "pdfplumber"
    except Exception:
        return "none"


def render_backend() -> str:
    try:
        import fitz  # type: ignore # noqa: F401  (PyMuPDF)

        return "pymupdf"
    except Exception:
        return "none"


def pdf_pages(binary_df: DataFrame, path_col: str = "path", content_col: str = "content") -> DataFrame:
    """(path, content) PDFs → one row per page with the reference's
    page_data fields. Requires a backend; callers gate on
    ``pdf_backend()`` and fall back to fixtures otherwise."""
    if pdf_backend() == "none":
        raise RuntimeError(
            "no PDF extraction backend importable (pdfplumber); load "
            "page fixtures with pages_from_fixture instead"
        )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pdfplumber  # guarded above; re-import inside the task

        for pdf_batch in batches:
            for path, content in zip(pdf_batch[path_col], pdf_batch[content_col]):
                rows = []
                with pdfplumber.open(io.BytesIO(bytes(content))) as pdf:
                    for page_num, page in enumerate(pdf.pages, 1):
                        tables = [
                            [[("" if c is None else str(c)) for c in row] for row in t]
                            for t in (page.extract_tables() or [])
                        ]
                        rows.append(
                            {
                                "doc": path,
                                "page_num": page_num,
                                "text": page.extract_text() or "",
                                "tables": tables,
                                "width": float(page.width),
                                "height": float(page.height),
                            }
                        )
                if rows:  # one PDF at a time — no whole-corpus buffering
                    yield pd.DataFrame(rows)

    return binary_df.select(path_col, content_col).mapInPandas(op, schema=PAGE_SCHEMA)


def render_pages(
    binary_df: DataFrame,
    dpi: int = 150,
    path_col: str = "path",
    content_col: str = "content",
) -> DataFrame:
    """S3 page→image render stage (pdf_renderer.py:181-258 shape).
    Requires PyMuPDF; same fall-forward contract as ``pdf_pages``."""
    if render_backend() == "none":
        raise RuntimeError(
            "no PDF render backend importable (PyMuPDF/fitz); the stage "
            "activates unchanged once the library is present"
        )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import fitz  # guarded above

        for pdf_batch in batches:
            for path, content in zip(pdf_batch[path_col], pdf_batch[content_col]):
                doc = fitz.open(stream=bytes(content), filetype="pdf")
                rows = []
                for page_num in range(doc.page_count):
                    pix = doc[page_num].get_pixmap(dpi=dpi)
                    rows.append(
                        {
                            "doc": path,
                            "page_num": page_num + 1,
                            "dpi": dpi,
                            "image": pix.tobytes("png"),
                            "render_status": "ok",
                        }
                    )
                doc.close()
                if rows:
                    yield pd.DataFrame(rows)

    return binary_df.select(path_col, content_col).mapInPandas(op, schema=RENDER_SCHEMA)


def pages_from_fixture(spark: SparkSession, fixture_path: str) -> DataFrame:
    """Checked-in page-dict JSON (a list of page_data objects with
    doc/page_num provenance) → the exact ``PAGE_SCHEMA`` frame
    ``pdf_pages`` would produce."""
    with open(fixture_path, encoding="utf-8") as f:
        pages = json.load(f)
    return spark.createDataFrame(pages, schema=PAGE_SCHEMA)


WORD_SCHEMA = (
    "doc string, page_num int, text string, "
    "x0 double, y0 double, x1 double, y1 double"
)

REGION_SCHEMA = (
    "doc string, page_num int, region_id int, kind string, "
    "x0 double, y0 double, x1 double, y1 double, n_words int"
)


def pdf_words(
    binary_df: DataFrame, path_col: str = "path", content_col: str = "content"
) -> DataFrame:
    """(path, content) PDFs → one row per word with its bounding box
    (pdfplumber ``extract_words``). The geometry source for
    :func:`detect_regions`; import-guarded like ``pdf_pages`` — load
    word fixtures with :func:`words_from_fixture` when no backend."""
    if pdf_backend() == "none":
        raise RuntimeError(
            "no PDF extraction backend importable (pdfplumber); load "
            "word fixtures with words_from_fixture instead"
        )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pdfplumber  # guarded above

        for pdf_batch in batches:
            for path, content in zip(pdf_batch[path_col], pdf_batch[content_col]):
                rows = []
                with pdfplumber.open(io.BytesIO(bytes(content))) as pdf:
                    for i, page in enumerate(pdf.pages, start=1):
                        for w in page.extract_words():
                            rows.append(
                                (path, i, w["text"],
                                 float(w["x0"]), float(w["top"]),
                                 float(w["x1"]), float(w["bottom"]))
                            )
                if rows:
                    yield pd.DataFrame(
                        rows,
                        columns=["doc", "page_num", "text", "x0", "y0", "x1", "y1"],
                    )

    return binary_df.select(path_col, content_col).mapInPandas(op, schema=WORD_SCHEMA)


def words_from_fixture(spark: SparkSession, fixture_path: str) -> DataFrame:
    """Checked-in word-box JSON (list of {doc, page_num, words: [{text,
    x0, y0, x1, y1}]}) → the exact ``WORD_SCHEMA`` frame ``pdf_words``
    would produce."""
    with open(fixture_path, encoding="utf-8") as f:
        pages = json.load(f)
    rows = [
        (p["doc"], p["page_num"], w["text"], w["x0"], w["y0"], w["x1"], w["y1"])
        for p in pages
        for w in p["words"]
    ]
    return spark.createDataFrame(rows, schema=WORD_SCHEMA)


def _xy_cut(boxes, min_gap_x: float, min_gap_y: float, axis: int, depth: int):
    """Recursive XY-cut over word boxes (n×4 numpy [x0,y0,x1,y1]):
    split on whitespace bands in the projection onto ``axis`` (0=x cuts
    into columns, 1=y cuts into slabs), recurse on the other axis.
    Returns a list of index arrays, one per leaf region, in document
    order. The classic Nagy/Seth layout-analysis algorithm."""
    import numpy as np

    def gaps(lo, hi, min_gap):
        order = np.argsort(lo)
        cuts, cover_end = [], hi[order[0]]
        for i in order[1:]:
            if lo[i] - cover_end >= min_gap:
                cuts.append((cover_end + lo[i]) / 2.0)
            cover_end = max(cover_end, hi[i])
        return cuts

    def rec(idx, axis, depth):
        if depth == 0 or len(idx) <= 1:
            return [idx]
        lo = boxes[idx, axis]
        hi = boxes[idx, axis + 2]
        cuts = gaps(lo, hi, min_gap_x if axis == 0 else min_gap_y)
        if not cuts:
            # nothing to cut on this axis; try the other once before
            # declaring a leaf (a pure two-column page has no y-cut at
            # the top level but an obvious x-cut)
            lo2 = boxes[idx, 1 - axis]
            hi2 = boxes[idx, 1 - axis + 2]
            cuts2 = gaps(lo2, hi2, min_gap_x if axis == 1 else min_gap_y)
            if not cuts2:
                return [idx]
            return rec(idx, 1 - axis, depth)
        parts = []
        edges = [-np.inf, *cuts, np.inf]
        for a, b in zip(edges, edges[1:]):
            sel = idx[(lo > a) & (lo < b)]
            if len(sel):
                parts.extend(rec(sel, 1 - axis, depth - 1))
        return parts

    return rec(np.arange(len(boxes)), axis, depth)


def _classify_region(boxes, x_tol: float = 2.0) -> str:
    """'table' when ≥3 lines share ≥3 x-aligned word starts (a column
    grid); prose lines have ragged word boundaries and don't align."""
    import numpy as np

    ys = boxes[:, 1]
    order = np.argsort(ys)
    lines, cur, cur_y = [], [order[0]], ys[order[0]]
    for i in order[1:]:
        if ys[i] - cur_y <= (boxes[i, 3] - boxes[i, 1]) * 0.6:
            cur.append(i)
        else:
            lines.append(cur)
            cur, cur_y = [i], ys[i]
    lines.append(cur)
    if len(lines) < 3:
        return "text"
    starts = [np.sort(boxes[line, 0]) for line in lines]
    grid = np.round(np.concatenate(starts) / x_tol) * x_tol
    vals, counts = np.unique(grid, return_counts=True)
    aligned = (counts >= max(3, int(0.6 * len(lines)))).sum()
    return "table" if aligned >= 3 else "text"


def detect_regions(
    words: DataFrame,
    min_gap_x: float = 20.0,
    min_gap_y: float = 15.0,
    max_depth: int = 4,
) -> DataFrame:
    """S4 region detection, real geometry: recursive XY-cut layout
    analysis over word bounding boxes — cut the page on horizontal
    whitespace bands into slabs, each slab on vertical whitespace into
    columns, recurse — then classify each leaf text/table by word-start
    grid alignment. (Reference behavior: region detection feeding the
    vision extractor, extractor_v03.py's per-page region walk; here the
    geometry replaces the former deterministic stub.)

    Threshold semantics: ``min_gap_x`` is the narrowest vertical
    whitespace treated as a LAYOUT break — column gutters (30-50 pt in
    print) sit above it, table cell spacing (≲15 pt) below it, which is
    what keeps a table one region while a two-column page splits. A
    table whose gutters rival the page's column gutter is genuinely
    ambiguous to pure whitespace analysis; that's the documented limit
    of XY-cut, not of this implementation.

    Scale shape: geometry is per-page local, so pages are the unit of
    parallelism — one ``applyInPandas`` group per (doc, page), no
    cross-page state, no shuffle beyond the grouping. Accuracy is
    pinned against annotated truth boxes (IoU ≥ 0.9) in
    tests/test_pdf_bridge.py."""

    def per_page(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        boxes = pdf[["x0", "y0", "x1", "y1"]].to_numpy(dtype=float)
        leaves = _xy_cut(boxes, min_gap_x, min_gap_y, axis=1, depth=max_depth)
        # reading order: top-to-bottom, then left-to-right
        regs = []
        for idx in leaves:
            sub = boxes[idx]
            regs.append(
                (
                    float(sub[:, 1].min()),  # y for ordering
                    float(sub[:, 0].min()),
                    sub,
                    len(idx),
                )
            )
        regs.sort(key=lambda r: (r[0], r[1]))
        out = []
        for rid, (_, _, sub, n) in enumerate(regs):
            out.append(
                (
                    pdf["doc"].iloc[0],
                    int(pdf["page_num"].iloc[0]),
                    rid,
                    _classify_region(sub),
                    float(sub[:, 0].min()),
                    float(sub[:, 1].min()),
                    float(sub[:, 2].max()),
                    float(sub[:, 3].max()),
                    n,
                )
            )
        return pd.DataFrame(
            out,
            columns=[
                "doc", "page_num", "region_id", "kind",
                "x0", "y0", "x1", "y1", "n_words",
            ],
        )

    return words.groupBy("doc", "page_num").applyInPandas(
        per_page, schema=REGION_SCHEMA
    )


def lift_page_tables(pages: DataFrame) -> DataFrame:
    """S2: page rows → one row per extracted table in the pipeline's
    TABLE_SCHEMA shape (key, table_id, title, headers, rows) — first
    table row is the header, remaining rows become header→cell maps.

    All expression-level (posexplode + map_from_arrays): the lift runs
    map-side in codegen whatever the corpus size."""
    per_table = pages.select(
        F.col("doc").alias("key"),
        "page_num",
        F.posexplode("tables").alias("table_idx", "t"),
    )
    header = F.col("t")[0]
    body = F.slice(F.col("t"), 2, F.greatest(F.size("t") - 1, F.lit(0)))
    return per_table.select(
        "key",
        F.concat(
            F.lit("page_"), F.col("page_num"), F.lit("_table_"), F.col("table_idx") + 1
        ).alias("table_id"),
        F.concat(F.lit("Page "), F.col("page_num"), F.lit(" Table")).alias("title"),
        header.alias("headers"),
        # Ragged body rows: a row may carry fewer OR more cells than the
        # header; truncate both sides to the common width so
        # map_from_arrays never sees keys/values of unequal length.
        F.transform(
            body,
            lambda row: F.map_from_arrays(
                F.slice(header, 1, F.least(F.size(row), F.size(header))),
                F.slice(row, 1, F.least(F.size(row), F.size(header))),
            ),
        ).alias("rows"),
        F.lit(0.92).alias("confidence"),
        F.lit("rule_based").alias("extraction_method"),
        F.lit("pdfplumber").alias("model"),
        F.lit(0.0).alias("cost_usd"),
    )
