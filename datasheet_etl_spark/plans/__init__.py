"""Declared query inventory.

``queries.py``  : Q01–Q34 — the survey §2.9 correctness contract.
``training.py`` : training-data pipeline ops (dedup / similarity / text /
                  multimodal) — first-class beyond-reference surface.

Both register into one registry; ``registry()`` / ``oracles()`` are what
``__spark_entry__`` exposes to the driver.
"""

from datasheet_etl_spark.plans.queries import ORACLES, QUERIES


def registry():
    from datasheet_etl_spark.plans import streaming_entries, training  # noqa: F401

    return dict(QUERIES)


def oracles():
    from datasheet_etl_spark.plans import streaming_entries, training  # noqa: F401

    return dict(ORACLES)
