"""Every registry query with an oracle must hash-match DuckDB (t2 gate)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare


def _params():
    from datasheet_etl_spark.plans import oracles, registry

    reg, ora = registry(), oracles()
    return [pytest.param(name, id=name) for name in sorted(reg)]


@pytest.mark.parametrize("name", _params())
def test_query_matches_oracle(spark, name):
    from datasheet_etl_spark.plans import oracles, registry

    reg, ora = registry(), oracles()
    df = reg[name](spark, SF_ORACLE)
    if name not in ora:
        # rows-only contract: must run and return a stable schema
        assert df.columns, f"{name}: no columns"
        assert df.count() >= 0
        return
    ok, msg = compare(df, ora[name], SF_ORACLE)
    assert ok, f"{name}: {msg}"
