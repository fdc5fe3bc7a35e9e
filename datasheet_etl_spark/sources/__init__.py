"""External sources.

``vision`` — the external-call mapInPandas stage (rate-limited,
retrying, cost-budgeted) that stands where the reference's Vision API
client sits (vision_client.py:235-307), plus its deterministic mock.

``pdf_bridge`` — the S1-S5 PDF ingestion bridge: import-guarded
pdfplumber/PyMuPDF mapInPandas stages over binaryFile input, plus the
fixture loader and the page→pipeline table lift this environment runs.
"""

from datasheet_etl_spark.sources.pdf_bridge import (
    lift_page_tables,
    pages_from_fixture,
    pdf_pages,
    render_pages,
)
from datasheet_etl_spark.sources.vision import (
    FlakyMockVisionClient,
    MockVisionClient,
    vision_extract_stage,
)

__all__ = [
    "FlakyMockVisionClient",
    "MockVisionClient",
    "lift_page_tables",
    "pages_from_fixture",
    "pdf_pages",
    "render_pages",
    "vision_extract_stage",
]
