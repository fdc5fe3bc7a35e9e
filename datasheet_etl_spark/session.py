"""SparkSession factory.

One place to encode the execution-model decisions that matter at scale:

- AQE on (runtime re-plan: coalesce post-shuffle partitions, skew-join
  splitting, dynamic join-strategy switch) — on a 1000-executor cluster
  this is what keeps a 100 TB shuffle from being killed by one hot key.
- ``spark.sql.shuffle.partitions`` sized to the actual parallelism, not
  the 200 default (local: ~cores; cluster: 2–3× total cores).
- Arrow enabled so every Pandas-UDF stage is vectorized batch transfer.
- Session timezone pinned UTC so timestamp semantics are deterministic
  and oracle-comparable (DuckDB timestamps are UTC-naive).

Local mode is a single JVM; ``spark.driver.memory`` is the only memory
knob. On a real cluster the same builder is used with master/memory
supplied by the submitter — nothing here assumes local.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(
    app_name: str = "datasheet_etl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Defaults come from the environment so tests, bench, and cluster
    submission share one code path:

    - ``SPARK_GRAFT_CPUS``   (default 32)  → local[] thread count
    - ``SPARK_GRAFT_DRIVER_MEM`` (default 8g locally)
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", str(cpus)))
    driver_memory = driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # pyarrow writes timestamp[us] with isAdjustedToUTC=false; Spark ≥3.4
        # would infer TIMESTAMP_NTZ, which unix_micros/window/numeric casts
        # reject. Read those as plain (UTC-instant) timestamps instead.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", driver_memory)
        .config("spark.ui.enabled", "false")
        # parquet scans: keep splits big enough to amortize open cost at
        # 100 TB but small enough to parallelize (default 128m is right;
        # stated explicitly because it is a deliberate choice).
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
