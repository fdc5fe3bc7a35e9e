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
