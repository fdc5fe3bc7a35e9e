"""Typed-hint pandas_udf builders.

This module deliberately has NO ``from __future__ import annotations``:
postponed evaluation turns the hints below into strings whose names
(``pd``) pyspark's hint inference cannot resolve from a caller's
function locals, which forces callers into the legacy
``pandas_udf(fn, ddl)`` form and its deprecation warning. Keeping the
REAL hints here gives every caller the modern inference path.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


def series_to_struct_udf(fn, ddl: str):
    """Wrap ``fn(pd.Series) -> pd.DataFrame`` as a SCALAR pandas UDF
    returning the struct type ``ddl`` — the shape of per-row
    multi-output projections (t102's length pairs)."""

    def wrapped(s: pd.Series) -> pd.DataFrame:
        return fn(s)

    return pandas_udf(wrapped, ddl)
