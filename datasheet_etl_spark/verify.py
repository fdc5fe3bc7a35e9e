"""The double-verification dataflow (survey §2.5, V1–V15 + J1/J5).

Reference semantics (behavioral spec: double_verifier.py:304-644) as one
declarative DataFrame DAG:

    vision tables ─┬─ posexplode rows ─ inner join on (key, pos) ─ key-union
    rule tables  ──┘        │
                            ├─ cell conflicts (V4 mismatch → V5 type → V6 severity)
                            ├─ header conflict (V7)
                            ├─ metadata conflicts (title / table_id)
                            ├─ arbitration (V8: unit → rule_wins else vision_wins)
                            ├─ patch-back join (J5) → final tables
                            └─ per-table aggregate (V10 confidence → V12 status)

Input table schema (both sides):
    key: string               -- document/table grouping key
    table_id, title: string
    headers: array<string>
    rows: array<map<string,string>>
plus passthrough columns on the vision side (confidence, model, …).

The zip truncation of ``zip(v_rows, r_rows)`` is reproduced by the inner
join on (key, pos) — never widen it to outer (survey §7.4.2).

Scale notes: one shuffle per side on ``key`` feeds the position window,
the conflict join, and the re-grouping — Catalyst reuses the hash
partitioning. The conflict stream is tiny relative to the cell stream
(it's post-filter), so the patch-back join broadcasts in practice.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datasheet_etl_spark.functions import (
    assess_severity,
    classify_conflict,
    severity_penalty,
    values_match,
)
from datasheet_etl_spark.functions.compare import pct_diff

DEFAULT_CONFIDENCE_THRESHOLD = 0.60


@dataclass
class VerifyResult:
    """The three outputs of the verification dataflow."""

    conflicts: DataFrame  # key, field, vision_value, rule_value, severity, conflict_type, resolution, resolved_value
    verdicts: DataFrame   # key, status, confidence, resolution_method, conflict_count
    final_tables: DataFrame  # key, table_id, title, headers, rows (patched)


def _cells(df: DataFrame, key: str) -> DataFrame:
    return df.select(
        key, F.posexplode_outer("rows").alias("pos", "row_map")
    )


def _pyliststr(arr) -> F.Column:
    """Python ``str(list)`` shape for header-conflict values:
    ['a', 'b'] — matches the reference's str(headers)."""
    # str([]) == '[]' — the concat form would render "['']" for empties
    return F.when(F.size(arr) == 0, F.lit("[]")).otherwise(
        F.concat(F.lit("['"), F.array_join(arr, "', '"), F.lit("']"))
    )


def find_conflicts(vision: DataFrame, rule: DataFrame, key: str = "key") -> DataFrame:
    """All conflicts between the two extractions (ref: _find_conflicts,
    double_verifier.py:412-475) as one unioned DataFrame."""
    v_cells = _cells(vision, key).withColumnRenamed("row_map", "v_row")
    r_cells = _cells(rule, key).withColumnRenamed("row_map", "r_row")
    zipped = v_cells.join(r_cells, [key, "pos"], "inner")  # J1 zip truncation

    # key union across both row dicts, then per-field compare
    fields = zipped.select(
        key,
        "pos",
        "v_row",
        "r_row",
        F.explode(F.array_union(F.map_keys("v_row"), F.map_keys("r_row"))).alias("fkey"),
    ).select(
        key,
        "pos",
        "fkey",
        F.coalesce(F.element_at("v_row", F.col("fkey")), F.lit("")).alias("vision_value"),
        F.coalesce(F.element_at("r_row", F.col("fkey")), F.lit("")).alias("rule_value"),
        F.coalesce(F.element_at("v_row", F.lit("Parameter")), F.lit("")).alias("param_ctx"),
    )
    cell_conflicts = fields.filter(
        ~values_match(F.col("vision_value"), F.col("rule_value"))
    ).select(
        key,
        F.concat(F.lit("row["), F.col("pos").cast("string"), F.lit("]."), F.col("fkey")).alias(
            "field"
        ),
        "vision_value",
        "rule_value",
        assess_severity(
            F.col("fkey"), F.col("vision_value"), F.col("rule_value"), F.col("param_ctx")
        ).alias("severity"),
        classify_conflict(F.col("fkey"), F.col("vision_value")).alias("conflict_type"),
    )

    # header (structure) conflict — V7
    hdr = (
        vision.select(key, F.col("headers").alias("v_headers"))
        .join(rule.select(key, F.col("headers").alias("r_headers")), key, "inner")
        .filter(F.col("v_headers") != F.col("r_headers"))
        .select(
            key,
            F.lit("headers").alias("field"),
            _pyliststr(F.col("v_headers")).alias("vision_value"),
            _pyliststr(F.col("r_headers")).alias("rule_value"),
            F.lit("MEDIUM").alias("severity"),
            F.lit("structure").alias("conflict_type"),
        )
    )

    # metadata conflicts (title, table_id) — both non-empty and mismatched
    meta_parts = []
    for fld in ("title", "table_id"):
        v = vision.select(key, F.coalesce(F.col(fld), F.lit("")).alias("vision_value"))
        r = rule.select(key, F.coalesce(F.col(fld), F.lit("")).alias("rule_value"))
        meta_parts.append(
            v.join(r, key, "inner")
            .filter(
                (F.col("vision_value") != "")
                & (F.col("rule_value") != "")
                & ~values_match(F.col("vision_value"), F.col("rule_value"))
            )
            .select(
                key,
                F.lit(fld).alias("field"),
                "vision_value",
                "rule_value",
                F.lit("LOW").alias("severity"),
                F.lit("text").alias("conflict_type"),
            )
        )

    out = cell_conflicts
    for part in [hdr, *meta_parts]:
        out = out.unionByName(part)
    return out


def arbitrate(conflicts: DataFrame) -> DataFrame:
    """V8 SmartArbiter: unit conflicts → rule_wins, everything else →
    vision_wins (ref: double_verifier.py:206-236); resolved_value follows
    the winner."""
    resolution = F.when(F.col("conflict_type") == "unit", "rule_wins").otherwise(
        "vision_wins"
    )
    return conflicts.withColumn("resolution", resolution).withColumn(
        "resolved_value",
        F.when(F.col("resolution") == "rule_wins", F.col("rule_value")).otherwise(
            F.col("vision_value")
        ),
    )


def score_and_status(
    vision: DataFrame,
    rule: DataFrame,
    resolved: DataFrame,
    key: str = "key",
    confidence_threshold: float = DEFAULT_CONFIDENCE_THRESHOLD,
) -> DataFrame:
    """V10 confidence + V11 large-diff + V12 status per table.

    Mirrors the reference decision ladder (double_verifier.py:304-398):
    no rule table → verified @0.85 vision_only; zero conflicts →
    verified @1.0 perfect_match; unresolved high/critical or (critical ∧
    >10% diff) → needs_review; confidence < threshold → conflict; else
    verified (auto_resolved).
    """
    per_key = resolved.groupBy(key).agg(
        F.count("*").alias("conflict_count"),
        F.greatest(
            F.lit(0.0),
            F.least(
                F.lit(1.0),
                1.0
                - F.sum(
                    severity_penalty(F.col("severity"), F.col("resolution").isNotNull())
                ),
            ),
        ).alias("confidence"),
        F.count_if(
            F.col("severity").isin("HIGH", "CRITICAL") & F.col("resolution").isNull()
        ).alias("n_unresolved_high"),
        F.count_if(F.col("severity") == "CRITICAL").alias("n_critical"),
        F.coalesce(
            F.max(
                F.when(
                    F.col("severity") == "CRITICAL",
                    pct_diff(F.col("vision_value"), F.col("rule_value")),
                )
            ),
            F.lit(0.0),
        ).alias("max_critical_diff"),
    )

    has_rule = rule.select(key).distinct().withColumn("__has_rule", F.lit(True))
    base = (
        vision.select(key)
        .distinct()
        .join(has_rule, key, "left")
        .join(per_key, key, "left")
    )

    needs_review = (F.col("n_unresolved_high") > 0) | (
        (F.col("n_critical") > 0) & (F.col("max_critical_diff") > 0.10)
    )
    status = (
        F.when(F.col("__has_rule").isNull(), "verified")
        .when(F.col("conflict_count").isNull(), "verified")
        .when(needs_review, "needs_review")
        .when(F.col("confidence") < confidence_threshold, "conflict")
        .otherwise("verified")
    )
    method = (
        F.when(F.col("__has_rule").isNull(), "vision_only")
        .when(F.col("conflict_count").isNull(), "perfect_match")
        .when(needs_review, "manual_required")
        .when(F.col("confidence") < confidence_threshold, "low_confidence")
        .otherwise("auto_resolved")
    )
    confidence = (
        F.when(F.col("__has_rule").isNull(), 0.85)
        .when(F.col("conflict_count").isNull(), 1.0)
        .otherwise(F.col("confidence"))
    )
    return base.select(
        key,
        status.alias("status"),
        confidence.alias("confidence"),
        method.alias("resolution_method"),
        F.coalesce(F.col("conflict_count"), F.lit(0)).alias("conflict_count"),
    )


def patch_final_tables(
    vision: DataFrame, resolved: DataFrame, key: str = "key"
) -> DataFrame:
    """J5 patch-back: start from the vision result, overwrite the cells
    (and metadata fields) that resolved rule_wins, and rebuild the nested
    rows arrays with deterministic field order (header order)."""
    rule_wins = resolved.filter(F.col("resolution") == "rule_wins")

    cell_fixes = rule_wins.filter(F.col("field").rlike(r"^row\[\d+\]\..+")).select(
        key,
        # try_cast: constant folding may evaluate this on non-row fields
        # before the rlike filter applies (ANSI would throw on '')
        F.regexp_extract("field", r"^row\[(\d+)\]", 1).try_cast("int").alias("pos"),
        F.regexp_extract("field", r"^row\[\d+\]\.(.+)$", 1).alias("fkey"),
        F.col("resolved_value").alias("fix"),
    )

    cells = (
        _cells(vision, key)
        .select(
            key,
            "pos",
            F.explode(F.map_keys("row_map")).alias("fkey"),
            F.col("row_map"),
        )
        .select(
            key, "pos", "fkey", F.element_at("row_map", F.col("fkey")).alias("val")
        )
    )
    patched = cells.join(cell_fixes, [key, "pos", "fkey"], "left").select(
        key, "pos", "fkey", F.coalesce("fix", "val").alias("val")
    )

    # deterministic field order: position in the headers array (unknown keys last)
    with_order = patched.join(vision.select(key, "headers"), key, "left").select(
        key,
        "pos",
        F.when(
            F.array_position("headers", F.col("fkey")) > 0,
            F.array_position("headers", F.col("fkey")),
        )
        .otherwise(F.lit(1_000_000))
        .alias("korder"),
        "fkey",
        "val",
    )
    # entries arrays (orderable, unlike maps) so the outer sort by pos works
    rows_rebuilt = with_order.groupBy(key, "pos").agg(
        F.array_sort(F.collect_list(F.struct("korder", "fkey", "val"))).alias("entries")
    )
    tables_rows = rows_rebuilt.groupBy(key).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("pos"), F.col("entries")))),
            lambda s: F.map_from_entries(
                F.transform(
                    s["entries"],
                    lambda e: F.struct(e["fkey"].alias("key"), e["val"].alias("value")),
                )
            ),
        ).alias("rows")
    )

    # metadata patch (title / table_id) — with SmartArbiter these stay
    # vision, but the join is general.
    meta = vision.drop("rows")
    for fld in ("title", "table_id"):
        fix = (
            rule_wins.filter(F.col("field") == fld)
            .select(key, F.col("resolved_value").alias(f"__fix_{fld}"))
        )
        meta = (
            meta.join(fix, key, "left")
            .withColumn(fld, F.coalesce(F.col(f"__fix_{fld}"), F.col(fld)))
            .drop(f"__fix_{fld}")
        )
    # row-less tables get no tables_rows entry; the reference's
    # final_result preserves the original [] rather than null
    return meta.join(tables_rows, key, "left").withColumn(
        "rows",
        F.coalesce(F.col("rows"), F.array().cast("array<map<string,string>>")),
    )


def verify(
    vision: DataFrame,
    rule: DataFrame,
    key: str = "key",
    confidence_threshold: float = DEFAULT_CONFIDENCE_THRESHOLD,
) -> VerifyResult:
    """Run the full double-verification dataflow."""
    conflicts = find_conflicts(vision, rule, key)
    resolved = arbitrate(conflicts)
    verdicts = score_and_status(vision, rule, resolved, key, confidence_threshold)
    final_tables = patch_final_tables(vision, resolved, key)
    return VerifyResult(conflicts=resolved, verdicts=verdicts, final_tables=final_tables)


def review_queue(verdicts: DataFrame) -> DataFrame:
    """V13: the needs_review routing filter — a sink-side selection, not
    driver-side control flow."""
    return verdicts.filter(F.col("status") == "needs_review")


def verifier_stats(verdicts: DataFrame, conflicts: DataFrame, key: str = "key") -> DataFrame:
    """A3: the reference's mutable counters as a single aggregate row."""
    counts = verdicts.agg(
        F.count("*").alias("total_verifications"),
        F.count_if(F.col("status") == "verified").alias("verified_count"),
        F.count_if(F.col("status") == "conflict").alias("conflict_count"),
        F.count_if(F.col("status") == "needs_review").alias("needs_review_count"),
    )
    cstats = conflicts.agg(
        F.count("*").alias("total_conflicts_found"),
        F.count_if(F.col("resolution").isNotNull()).alias("conflicts_resolved"),
    )
    return counts.crossJoin(cstats)


def accuracy_metrics(
    extracted: DataFrame, golden: DataFrame, key: str = "key"
) -> DataFrame:
    """A10 (ref: docs/architecture_v04.md:515-527 — planned in the
    reference, implemented here): extraction accuracy vs ground truth at
    cell, row, and table grain in ONE pass via ROLLUP.

    Full-outer join on (key, row_idx, col_idx) so both misses (golden
    cell never extracted) and hallucinations (extracted cell not in
    golden) count as mismatches; match is null-safe equality. Output:
    one row per (grain, key[, row_idx]) with accuracy ∈ [0,1] and the
    cell count it averages over.
    """
    e = extracted.select(
        key, "row_idx", "col_idx", F.col("content").alias("_e")
    )
    g = golden.select(key, "row_idx", "col_idx", F.col("content").alias("_g"))
    j = e.join(g, [key, "row_idx", "col_idx"], "full_outer")
    match = F.col("_e").eqNullSafe(F.col("_g")).cast("double")
    return (
        j.select(key, "row_idx", match.alias("_m"))
        .rollup(key, "row_idx")
        .agg(F.avg("_m").alias("accuracy"), F.count("*").alias("n_cells"))
        .select(
            F.when(F.col("row_idx").isNotNull(), "row")
            .when(F.col(key).isNotNull(), "table")
            .otherwise("overall")
            .alias("grain"),
            key,
            "row_idx",
            F.round("accuracy", 6).alias("accuracy"),
            "n_cells",
        )
    )


# ---------------------------------------------------------------------------
# U1/U2: pluggable comparator / arbiter registries
# (ref: interfaces.py:357-409, double_verifier.py:206-236, 287-289)
# ---------------------------------------------------------------------------

# name → (v1: Column, v2: Column) -> Column<boolean>. Built-ins compile to
# native expressions (codegen); user comparators may be pandas_udf-backed
# Column functions — the registry doesn't care, anything Column-in/
# Column-out composes into the match cascade.
def _builtin_comparators():
    from datasheet_etl_spark.functions.compare import (
        numbers_match,
        text_match,
        units_match,
    )

    return {
        "numeric": lambda a, b: numbers_match(a, b),
        "unit": lambda a, b: units_match(a, b),
        "text": lambda a, b: text_match(a, b),
    }


COMPARATORS: dict = _builtin_comparators()

# name → (conflicts: DataFrame) -> Column<string resolution>
ARBITERS: dict = {
    "smart": lambda df: F.when(
        F.col("conflict_type") == "unit", "rule_wins"
    ).otherwise("vision_wins"),
    "vision_wins": lambda df: F.lit("vision_wins"),
    "rule_wins": lambda df: F.lit("rule_wins"),
}


def register_comparator(name: str, fn) -> None:
    """U1 extension point: fn(Column, Column) -> boolean Column."""
    COMPARATORS[name] = fn


def register_arbiter(name: str, fn) -> None:
    """U2 extension point: fn(conflicts DataFrame) -> string Column
    ('vision_wins' | 'rule_wins' per row)."""
    ARBITERS[name] = fn


def custom_match(v1, v2, comparator_names=None):
    """OR-composition of registered comparators — the cascade shape the
    reference runs (any comparator passing ⇒ values match)."""
    names = comparator_names or list(COMPARATORS)
    out = F.lit(False)
    for name in names:
        out = out | COMPARATORS[name](v1, v2)
    return out


def arbitrate_with(conflicts: DataFrame, arbiter: str = "smart") -> DataFrame:
    """arbitrate() with a registry-selected arbiter (U2)."""
    resolution = ARBITERS[arbiter](conflicts)
    return conflicts.withColumn("resolution", resolution).withColumn(
        "resolved_value",
        F.when(F.col("resolution") == "rule_wins", F.col("rule_value")).otherwise(
            F.col("vision_value")
        ),
    )
