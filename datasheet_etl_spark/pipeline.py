"""End-to-end extraction pipeline over mock stages (survey §3.1 → Spark DAG).

The reference's call chain (pipeline.py:246-295: vision extract → rule
extract → double verify → build result → review queue → JSON) becomes one
lazy DataFrame DAG. The mock extractors are deterministic literal
DataFrames reproducing the reference fixtures (behavioral spec:
pipeline.py:69-215), so the golden verification block (status=verified,
confidence 0.99, 1 low table_id conflict, 14 flat parameters —
output/lmr51430_v04.json) is testable end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datasheet_etl_spark.functions import slugify
from datasheet_etl_spark.verify import VerifyResult, verify

TABLE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("table_id", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("headers", T.ArrayType(T.StringType())),
        T.StructField("rows", T.ArrayType(T.MapType(T.StringType(), T.StringType()))),
        T.StructField("confidence", T.DoubleType()),
        T.StructField("extraction_method", T.StringType()),
        T.StructField("model", T.StringType()),
        T.StructField("cost_usd", T.DoubleType()),
    ]
)

_HEADERS = ["Parameter", "Test Condition", "Min", "Typ", "Max", "Unit"]


def _row(parameter, cond, mn, typ, mx, unit):
    return dict(
        zip(_HEADERS, [parameter, cond, mn, typ, mx, unit])
    )


_FIXTURE_ROWS_VISION = [
    _row("Input Voltage Range", "", "4.2", "", "36", "V"),
    _row("Quiescent Current", "VFB = 1.1V", "", "25", "40", "µA"),
    _row("Output Current", "Continuous", "", "", "3", "A"),
    _row("Switching Frequency", "", "360", "400", "440", "kHz"),
    _row("Efficiency", "VIN=12V, VOUT=5V, IOUT=2A", "", "92", "", "%"),
]

# rule side differs in exactly two cells: uA vs µA (unit-alias match) and
# 3.0 vs 3 (numeric-tolerance match) — plus the table_id, which conflicts.
_FIXTURE_ROWS_RULE = [
    _row("Input Voltage Range", "", "4.2", "", "36", "V"),
    _row("Quiescent Current", "VFB = 1.1V", "", "25", "40", "uA"),
    _row("Output Current", "Continuous", "", "", "3.0", "A"),
    _row("Switching Frequency", "", "360", "400", "440", "kHz"),
    _row("Efficiency", "VIN=12V, VOUT=5V, IOUT=2A", "", "92", "", "%"),
]


def mock_vision_tables(spark: SparkSession, doc_key: str = "lmr51430.pdf") -> DataFrame:
    """Deterministic stand-in for the vision extraction stage (S8)."""
    return spark.createDataFrame(
        [
            (
                doc_key,
                "vision_table_1",
                "Electrical Characteristics",
                _HEADERS,
                _FIXTURE_ROWS_VISION,
                0.95,
                "vision",
                "gpt-4o-mini",
                0.002,
            )
        ],
        TABLE_SCHEMA,
    )


def mock_rule_tables(spark: SparkSession, doc_key: str = "lmr51430.pdf") -> DataFrame:
    """Deterministic stand-in for the rule extraction stage."""
    return spark.createDataFrame(
        [
            (
                doc_key,
                "rule_table_1",
                "Electrical Characteristics",
                _HEADERS,
                _FIXTURE_ROWS_RULE,
                0.85,
                "rule_based",
                None,
                None,
            )
        ],
        TABLE_SCHEMA,
    )


def extract_parameters(final_tables: DataFrame, key: str = "key") -> DataFrame:
    """A1 parameter flatten (long→wide), reference semantics
    (pipeline.py:345-367): per row, ``{slug}_min/typ/max`` as float
    (plain float() parse — unparseable silently dropped) and
    ``{slug}_unit`` when non-empty.

    Returns long form: (key, param, value_num, value_str) where exactly
    one of value_num / value_str is non-NULL. The wide map/pivot shapes
    are built on top (``parameters_map``, dynamic pivot S10).
    """
    rows = final_tables.select(key, F.posexplode("rows").alias("pos", "row_map"))
    slug = slugify(F.coalesce(F.element_at("row_map", F.lit("Parameter")), F.lit("")))

    stats = rows.select(
        key,
        "pos",
        slug.alias("slug"),
        F.expr(
            "stack(3, 'min', row_map['Min'], 'typ', row_map['Typ'], 'max', row_map['Max'])"
        ).alias("stat", "raw"),
    ).select(
        key,
        "pos",
        F.concat("slug", F.lit("_"), "stat").alias("param"),
        F.col("stat"),
        F.col("raw"),
    )
    nums = stats.filter(
        (F.col("raw").isNotNull())
        & (F.col("raw") != "")
        & F.col("raw").try_cast("double").isNotNull()
    ).select(
        key, "pos", "param", F.col("raw").try_cast("double").alias("value_num"),
        F.lit(None).cast("string").alias("value_str"),
    )
    units = rows.select(
        key,
        "pos",
        F.concat(slug, F.lit("_unit")).alias("param"),
        F.lit(None).cast("double").alias("value_num"),
        F.element_at("row_map", F.lit("Unit")).alias("value_str"),
    ).filter(F.col("value_str").isNotNull() & (F.col("value_str") != ""))
    return nums.unionByName(units)


def parameters_map(params: DataFrame, key: str = "key") -> DataFrame:
    """Flat parameters as one JSON object string per document (ordered by
    row position then min/typ/max/unit — the reference's insertion
    order). JSON because the value type is float|string (survey §1.2:
    truly-Any becomes a JSON string column)."""
    stat_rank = (
        F.when(F.col("param").endswith("_min"), 1)
        .when(F.col("param").endswith("_typ"), 2)
        .when(F.col("param").endswith("_max"), 3)
        .otherwise(4)
    )
    jval = F.when(
        F.col("value_num").isNotNull(), F.col("value_num").cast("string")
    ).otherwise(F.concat(F.lit('"'), F.col("value_str"), F.lit('"')))
    entry = F.concat(F.lit('"'), F.col("param"), F.lit('": '), jval)
    ordered = params.withColumn("stat_rank", stat_rank)
    return (
        ordered.groupBy(key)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "stat_rank", entry.alias("entry")))
            ).alias("entries")
        )
        .select(
            key,
            F.concat(
                F.lit("{"),
                F.array_join(F.transform("entries", lambda s: s["entry"]), ", "),
                F.lit("}"),
            ).alias("parameters_json"),
        )
    )


def run_pipeline(
    spark: SparkSession,
    vision: DataFrame | None = None,
    rule: DataFrame | None = None,
    source_file: str | None = None,
    confidence_threshold: float | None = None,
) -> tuple[DataFrame, VerifyResult]:
    """Assemble the full result DataFrame: one row per document with
    metadata / verification / tables / parameters_json / conflicts —
    parsed-equal to the reference's result JSON.

    ``confidence_threshold`` routes docs below it to needs_review (the
    CLI maps Gold/Silver/Bronze accuracy tiers onto it)."""
    from datasheet_etl_spark.verify import DEFAULT_CONFIDENCE_THRESHOLD

    vision = vision if vision is not None else mock_vision_tables(spark)
    rule = rule if rule is not None else mock_rule_tables(spark)

    vr = verify(
        vision,
        rule,
        confidence_threshold=(
            DEFAULT_CONFIDENCE_THRESHOLD
            if confidence_threshold is None
            else confidence_threshold
        ),
    )
    params = extract_parameters(vr.final_tables)
    pmap = parameters_map(params)

    conflicts_arr = (
        vr.conflicts.groupBy("key")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("field"),
                        F.col("vision_value"),
                        F.col("rule_value"),
                        F.lower("severity").alias("severity"),
                        F.col("resolution"),
                        F.col("resolved_value"),
                    )
                )
            ).alias("conflicts")
        )
    )

    table_struct = F.struct(
        F.col("table_id"),
        F.col("title"),
        F.col("headers"),
        F.col("rows"),
        F.col("confidence"),
        F.col("extraction_method"),
        F.col("model"),
        F.col("cost_usd"),
    )
    tables = vr.final_tables.select("key", table_struct.alias("table"))

    result = (
        vr.verdicts.join(tables, "key", "left")
        .join(pmap, "key", "left")
        .join(conflicts_arr, "key", "left")
        .select(
            "key",
            F.struct(
                F.col("key").alias("source_file"),
                F.lit("0.4").alias("pipeline_version"),
                F.lit("vision_first_double_verified").alias("extraction_method"),
                F.lit("gpt-4o-mini").alias("vision_model"),
            ).alias("metadata"),
            F.struct(
                F.col("status"),
                F.round("confidence", 3).alias("confidence"),
                F.col("resolution_method"),
                F.col("conflict_count"),
            ).alias("verification"),
            F.array(F.col("table")).alias("tables"),
            F.col("parameters_json"),
            F.coalesce(
                F.col("conflicts"),
                F.array().cast(
                    "array<struct<field:string,vision_value:string,rule_value:string,"
                    "severity:string,resolution:string,resolved_value:string>>"
                ),
            ).alias("conflicts"),
        )
    )
    return result, vr


def write_result_json(result: DataFrame, path: str) -> None:
    """S9 JSON sink: nested result rows as JSON lines."""
    result.write.mode("overwrite").json(path)


def observed(df, name: str, *metrics):
    """Attach observable metrics to a DataFrame (survey §4: the
    reference's mutable stats counters become ``observe()`` aggregates —
    computed during the SAME action that runs the plan, exact under task
    retry, no second job and no accumulator double-count).

    Returns (df, Observation); read ``observation.get`` after an action.
    Default metrics: row count.
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation(name)
    cols = list(metrics) or [F.count(F.lit(1)).alias("rows")]
    return df.observe(obs, *cols), obs
