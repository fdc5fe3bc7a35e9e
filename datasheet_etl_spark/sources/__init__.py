"""External sources.

``vision`` — the external-call mapInPandas stage (rate-limited,
retrying, cost-budgeted) that stands where the reference's Vision API
client sits (vision_client.py:235-307), plus its deterministic mock.
"""

from datasheet_etl_spark.sources.vision import (
    FlakyMockVisionClient,
    MockVisionClient,
    vision_extract_stage,
)

__all__ = ["FlakyMockVisionClient", "MockVisionClient", "vision_extract_stage"]
