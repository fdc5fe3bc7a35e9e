"""Training-data pipeline query entries (dedup / similarity / text /
multimodal) — registered into the shared QUERIES/ORACLES registry.

Implementations live in ``datasheet_etl_spark.operators.{dedup,
similarity, text, multimodal}``; this module binds them to the driver
contract. Filled in as the operators land.
"""

from __future__ import annotations
