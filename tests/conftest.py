from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "4g")

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from datasheet_etl_spark.session import get_session

    import tempfile

    s = get_session(
        app_name="datasheet_etl_spark_tests",
        shuffle_partitions=4,
        # static conf — must be set at session build; keeps saveAsTable
        # (bucketing tests) out of the repo's working directory
        extra_conf={
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="spark_wh_")
        },
    )
    yield s
    s.stop()
