"""Output sinks (survey §2.1 S9–S13): JSON, dynamic CSV, fixed-contract
CSV, Review-UI JSON, batch report.

The output *shapes* (column lists, param-name mapping, notes strings) are
data contracts reproduced from the reference's exports (behavioral spec:
batch_export.py:200-411, review_adapter.py:18-231, golden files
output/for_import_script.csv and output/lmr51430_review.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datasheet_etl_spark.functions import manufacturer_from_mpn_prefix
from datasheet_etl_spark.operators.relational import dynamic_pivot, top_k_per_group

# 16-column Import-Script contract (ref: batch_export.py:272-289)
IMPORT_SCRIPT_COLUMNS = [
    "MPN", "Manufacturer", "Category", "Description",
    "Vin_min", "Vin_max", "Vout_min", "Vout_max",
    "Iout_max", "Iq_typ", "Efficiency_typ", "Frequency_typ",
    "Package", "Status", "Datasheet_URL", "Notes",
]

# flat-param → Review-UI name (ref: review_adapter.py:18-30)
PARAM_MAPPING = {
    "input_voltage_range_min": "v_in_min",
    "input_voltage_range_max": "v_in_max",
    "output_voltage_min": "v_out_min",
    "output_voltage_max": "v_out_max",
    "output_current_max": "i_out_max",
    "quiescent_current_typ": "i_q",
    "quiescent_current_max": "i_q_max",
    "switching_frequency_typ": "fsw",
    "switching_frequency_min": "fsw_min",
    "switching_frequency_max": "fsw_max",
    "efficiency_typ": "efficiency",
}

REVIEW_THRESHOLD = 0.95  # per-param needs_review (ref: review_adapter.py:33)


def _params_map(result: DataFrame) -> F.Column:
    """parameters_json → map<string,string> (numbers keep their JSON
    rendering: 4.2 → '4.2', 36.0 → '36.0')."""
    return F.from_json("parameters_json", "map<string,string>")


def _mpn(result: DataFrame) -> F.Column:
    """Filename stem, suffixes stripped, uppercased (ref:
    batch_export.py:325-338)."""
    stem = F.regexp_extract(F.col("metadata.source_file"), r"([^/]+)\.[A-Za-z0-9]+$", 1)
    stem = F.when(stem == "", F.col("metadata.source_file")).otherwise(stem)
    return F.upper(F.regexp_replace(stem, r"(_v04|_extracted|_datasheet)", ""))


def export_dynamic_csv(result: DataFrame, params_long: DataFrame, path: str) -> list[str]:
    """S10: key-union dynamic CSV — base columns + the sorted union of
    observed parameter keys (ref: batch_export.py:200-252). Returns the
    column list (the schema contract). Two-pass dynamic pivot keeps the
    plan deterministic at any scale."""
    base = result.select(
        F.col("key"),
        F.col("metadata.source_file").alias("source_file"),
        F.col("verification.confidence").alias("confidence"),
        F.col("verification.status").alias("status"),
    )
    values = params_long.select(
        "key",
        "param",
        F.coalesce(F.col("value_num").cast("string"), F.col("value_str")).alias("v"),
    )
    wide = dynamic_pivot(values, ["key"], "param", F.first("v"), sanitize=False)
    param_cols = sorted(c for c in wide.columns if c != "key")
    out = base.join(wide, "key", "left").select(
        "source_file", "confidence", "status", *param_cols
    )
    out.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
    return ["source_file", "confidence", "status", *param_cols]


def import_script_frame(result: DataFrame) -> DataFrame:
    """The fixed 16-column Import-Script projection (ref:
    batch_export.py:254-323; golden output/for_import_script.csv) —
    sink-agnostic (the CLI writes it as one driver-side file, the batch
    sink as a partitioned directory)."""
    p = _params_map(result)

    def pget(name):
        return F.coalesce(F.element_at(p, F.lit(name)), F.lit(""))

    iq = F.element_at(p, F.lit("quiescent_current_typ")).try_cast("double")
    category = (
        F.when(F.element_at(p, F.lit("switching_frequency_typ")).isNotNull(), "Buck Converter")
        .when(F.element_at(p, F.lit("efficiency_typ")).isNotNull(), "DC-DC Converter")
        .when(iq.isNotNull() & (iq < 100), "LDO")
        .otherwise("Unknown")
    )
    notes = F.concat(
        F.lit("Extracted by Datasheet-ETL v0.4 (confidence: "),
        F.round(F.col("verification.confidence") * 100, 0).cast("int").cast("string"),
        F.lit("%)"),
    )
    out = result.select(
        _mpn(result).alias("MPN"),
        F.lit("").alias("Manufacturer"),
        category.alias("Category"),
        F.lit("").alias("Description"),
        pget("input_voltage_range_min").alias("Vin_min"),
        pget("input_voltage_range_max").alias("Vin_max"),
        pget("output_voltage_min").alias("Vout_min"),
        pget("output_voltage_max").alias("Vout_max"),
        pget("output_current_max").alias("Iout_max"),
        pget("quiescent_current_typ").alias("Iq_typ"),
        pget("efficiency_typ").alias("Efficiency_typ"),
        pget("switching_frequency_typ").alias("Frequency_typ"),
        F.lit("").alias("Package"),
        F.lit("Active").alias("Status"),
        F.lit("").alias("Datasheet_URL"),
        notes.alias("Notes"),
    )
    return out


def export_import_script_csv(result: DataFrame, path: str) -> DataFrame:
    """S11: fixed 16-column Import-Script CSV sink."""
    out = import_script_frame(result)
    out.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
    return out


def to_review_format(result: DataFrame) -> DataFrame:
    """S12: Review-UI JSON shape (ref: review_adapter.py:36-98; golden
    output/lmr51430_review.json). ``extracted_at`` is the one
    nondeterministic field — excluded from golden comparison, exactly as
    the reference's two golden files differ only there."""
    p = _params_map(result)
    base = result.select(
        "key",
        F.col("metadata.source_file").alias("source_file"),
        F.col("metadata.extraction_method").alias("extraction_method"),
        F.element_at("tables", 1)["confidence"].alias("table_confidence"),
        F.element_at("tables", 1)["table_id"].alias("table_id"),
        _mpn(result).alias("mpn"),
        F.explode(p).alias("param", "raw_value"),
        p.alias("all_params"),
    )
    is_value_key = (
        F.col("param").endswith("_min")
        | F.col("param").endswith("_typ")
        | F.col("param").endswith("_max")
    )
    base_name = F.expr("substring(param, 1, length(param) - 4)")
    unit = F.coalesce(
        F.element_at("all_params", F.concat(base_name, F.lit("_unit"))), F.lit("")
    )

    mapping = F.create_map(
        *[F.lit(x) for kv in PARAM_MAPPING.items() for x in kv]
    )
    review_name = F.coalesce(F.element_at(mapping, F.col("param")), F.col("param"))

    method_l = F.lower("extraction_method")
    verified_by = F.filter(
        F.array(
            F.when(method_l.contains("vision"), "vision"),
            F.when(
                method_l.contains("double") | method_l.contains("verified"), "pdfplumber"
            ),
            F.when(method_l.contains("rule"), "rule_based"),
        ),
        lambda x: x.isNotNull(),
    )
    verified_by = F.when(F.size(verified_by) == 0, F.array(F.lit("unknown"))).otherwise(
        verified_by
    )

    entries = base.filter(is_value_key).select(
        "key",
        "mpn",
        "source_file",
        F.struct(
            review_name.alias("name"),
            F.struct(
                F.col("raw_value").try_cast("double").alias("value"),
                unit.alias("unit"),
                F.col("table_confidence").alias("confidence"),
                F.concat(F.lit("page_1_"), F.col("table_id")).alias("source"),
                verified_by.alias("verified_by"),
                (F.col("table_confidence") < REVIEW_THRESHOLD).alias("needs_review"),
            ).alias("value"),
        ).alias("entry"),
    )
    # a mapped param (input_voltage_range_min -> v_in_min) can collide with
    # a literal param already named v_in_min; duplicate map keys raise under
    # Spark's default EXCEPTION mapKeyDedupPolicy — keep the most confident
    entries = top_k_per_group(
        entries,
        ["key", "mpn", "source_file", "entry.name"],
        [F.col("entry.value.confidence").desc(), F.col("entry.value.source")],
    )
    return entries.groupBy("key", "mpn", "source_file").agg(
        F.map_from_entries(F.collect_list("entry")).alias("params")
    ).select(
        "key",
        "mpn",
        manufacturer_from_mpn_prefix(F.col("mpn")).alias("manufacturer"),
        "source_file",
        F.date_format(F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").alias(
            "extracted_at"
        ),
        "params",
    )


def batch_stats(result: DataFrame) -> DataFrame:
    """A5/S13 aggregate: total / verified / needs_review / conflict counts
    and success rate — the BatchResult record as one aggregation."""
    return result.agg(
        F.count("*").alias("total"),
        F.count_if(F.col("verification.status") == "verified").alias("success"),
        F.count_if(F.col("verification.status") == "needs_review").alias("needs_review"),
        F.count_if(F.col("verification.status") == "conflict").alias("conflict"),
        F.round(
            F.count_if(F.col("verification.status") == "verified")
            / F.greatest(F.count("*"), F.lit(1)),
            6,
        ).alias("success_rate"),
    )


def batch_report_markdown(result: DataFrame) -> str:
    """S13: markdown batch report — driver-side format of the (tiny)
    collected aggregate, per the reference's report generator
    (batch_export.py:363-411)."""
    stats = batch_stats(result).collect()[0]
    files = result.select(
        F.col("metadata.source_file").alias("f"),
        F.col("verification.status").alias("s"),
        F.col("verification.confidence").alias("c"),
    ).collect()
    lines = [
        "# Batch Extraction Report",
        "",
        "## Summary",
        "",
        "| Metric | Value |",
        "|--------|-------|",
        f"| Total Files | {stats['total']} |",
        f"| Successful | {stats['success']} |",
        f"| Needs Review | {stats['needs_review']} |",
        f"| Conflicts | {stats['conflict']} |",
        f"| Success Rate | {stats['success_rate']:.1%} |",
        "",
        "## Files",
        "",
        "| File | Status | Confidence |",
        "|------|--------|------------|",
    ]
    for r in files:
        lines.append(f"| {r['f']} | {r['s']} | {r['c']:.2f} |")
    return "\n".join(lines) + "\n"
