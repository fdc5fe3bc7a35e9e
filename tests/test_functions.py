"""Reference-semantics unit tests for the scalar expression layer.

The case tables reproduce the reference's comparator/normalizer test
inputs and expected booleans (behavioral spec: tests/test_comprehensive.py
:36-46, :68-78) — they encode the tolerance/alias semantics the engine
must preserve.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datasheet_etl_spark.functions import (
    canonical_header,
    clean_cell,
    extract_number,
    has_standard_headers,
    manufacturer_from_mpn_prefix,
    normalize_text,
    normalize_unit,
    numbers_match,
    text_match,
    units_match,
    values_match,
)

NUMERIC_CASES = [
    ("3.3", "3.3", True),      # exact
    ("3.3", "3.30", True),     # trailing zero
    ("3.3", "3.33", True),     # within 1%
    ("3.3", "3.5", False),     # outside tolerance
    ("0", "0", True),          # both zero
    ("100", "101", True),      # 1% of 100
    ("100", "102", False),     # 2% of 100
    ("1.5V", "1.5", True),     # unit suffix stripped
    ("-5", "-5.0", True),      # negatives
    ("", "3.3", False),        # empty side unparseable
    ("abc", "3.3", False),     # garbage unparseable
]

UNIT_CASES = [
    ("µA", "uA", True),        # micro variants
    ("µA", "μA", True),        # U+00B5 vs U+03BC
    ("mA", "milliamp", True),
    ("V", "volt", True),
    ("kHz", "kilohertz", True),
    ("°C", "C", True),
    ("MHz", "mhz", True),      # case-insensitive
    ("V", "A", False),
    ("mV", "V", False),
]


def _eval(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


@pytest.mark.parametrize("v1,v2,expected", NUMERIC_CASES)
def test_numbers_match(spark, v1, v2, expected):
    got = _eval(spark, numbers_match(F.lit(v1), F.lit(v2)))
    assert bool(got) == expected, f"{v1!r} vs {v2!r}"


@pytest.mark.parametrize("v1,v2,expected", UNIT_CASES)
def test_units_match(spark, v1, v2, expected):
    got = _eval(spark, units_match(F.lit(v1), F.lit(v2)))
    assert bool(got) == expected, f"{v1!r} vs {v2!r}"


def test_extract_number_null_land(spark):
    cases = {"": None, "abc": None, "1.5V": 1.5, " 3.30 ": 3.3, "-5.0": -5.0, "1e3": 1000.0}
    for raw, want in cases.items():
        got = _eval(spark, extract_number(F.lit(raw)))
        assert got == want, f"{raw!r} -> {got}"


def test_values_match_cascade(spark):
    # both empty → True; one empty → False; numeric/unit/text fallbacks
    assert _eval(spark, values_match(F.lit(""), F.lit(""))) is True
    assert _eval(spark, values_match(F.lit(""), F.lit("x"))) is False
    assert _eval(spark, values_match(F.lit("3"), F.lit("3.0"))) is True
    assert _eval(spark, values_match(F.lit("uA"), F.lit("µA"))) is True
    assert _eval(spark, values_match(F.lit("Hello  World."), F.lit("hello world"))) is True
    assert _eval(spark, values_match(F.lit("foo"), F.lit("bar"))) is False


def test_normalize_text(spark):
    assert _eval(spark, normalize_text(F.lit("  Hello,  WORLD!  "))) == "hello world"
    assert _eval(spark, normalize_text(F.lit(None))) == ""


def test_clean_cell(spark):
    assert _eval(spark, clean_cell(F.lit("a\n  b\tc"))) == "a b c"
    assert _eval(spark, clean_cell(F.lit(None))) == ""


def test_normalize_unit_fallback(spark):
    assert _eval(spark, normalize_unit(F.lit("ohms"))) == "Ω"
    assert _eval(spark, normalize_unit(F.lit("weird"))) == "weird"  # passthrough
    assert _eval(spark, normalize_unit(F.lit(None))) == ""


def test_canonical_header(spark):
    cases = {
        "PARAMETER": "Parameter",
        "Test Conditions": "Test_Conditions",
        "min.": "Min",
        "Typ": "Typ",
        "MAX": "Max",
        "Units": "Unit",
        "Something": "Something",
        "": "Unknown",
    }
    for raw, want in cases.items():
        got = _eval(spark, canonical_header(F.lit(raw)))
        assert got == want, f"{raw!r} -> {got}"


def test_has_standard_headers(spark):
    yes = F.array(*[F.lit(x) for x in ["Parameter", "Min", "Typ", "Max", "Unit"]])
    no = F.array(*[F.lit(x) for x in ["Parameter", "Foo"]])
    assert _eval(spark, has_standard_headers(yes)) is True
    assert _eval(spark, has_standard_headers(no)) is False


def test_manufacturer_prefixes(spark):
    cases = {"LMR51430": "Texas Instruments", "MAX232": "Analog Devices", "XYZ1": ""}
    for mpn, want in cases.items():
        assert _eval(spark, manufacturer_from_mpn_prefix(F.lit(mpn))) == want


def test_register_aggregate_seam_and_weighted_median(spark):
    """The GROUPED_AGG extension point (SURVEY §2.8): a user-registered
    custom aggregate runs through groupBy().agg() like a built-in, and
    the shipped weighted_median handles ties, NULLs, and single-row
    groups exactly."""
    import pandas as pd

    from datasheet_etl_spark.functions.aggregates import (
        get_aggregate,
        register_aggregate,
        weighted_median,
        weighted_median_fn,
    )

    # pure-python contract first (no Spark in the loop)
    s = pd.Series
    assert weighted_median_fn(s([1.0, 2.0, 3.0]), s([1, 1, 1])) == 2.0
    # heavy weight drags the median down
    assert weighted_median_fn(s([1.0, 2.0, 3.0]), s([10, 1, 1])) == 1.0
    # even split → LOWER weighted median
    assert weighted_median_fn(s([1.0, 2.0]), s([1, 1])) == 1.0
    # NULL values drop, not poison
    assert weighted_median_fn(s([None, 5.0]), s([3, 2])) == 5.0
    assert weighted_median_fn(s([None], dtype="float64"), s([1])) is None

    df = spark.createDataFrame(
        [("a", 1.0, 10), ("a", 2.0, 1), ("a", 3.0, 1), ("b", 7.0, 5)],
        "g string, v double, w long",
    )
    got = {
        r["g"]: r["m"]
        for r in df.groupBy("g")
        .agg(weighted_median(F.col("v"), F.col("w")).alias("m"))
        .collect()
    }
    assert got == {"a": 1.0, "b": 7.0}

    # user-registered aggregate: value range, vs the built-in oracle
    def value_range(v: pd.Series) -> float:
        return float(v.max() - v.min())

    register_aggregate("value_range", value_range, "double")
    # NB Spark disallows mixing a GROUPED_AGG UDF with non-pandas
    # aggregates in one agg() [INVALID_PANDAS_UDF_PLACEMENT] — compute
    # the oracle in a separate aggregation
    rng = {
        r["g"]: r["rng"]
        for r in df.groupBy("g")
        .agg(get_aggregate("value_range")(F.col("v")).alias("rng"))
        .collect()
    }
    want = {
        r["g"]: r["want"]
        for r in df.groupBy("g").agg((F.max("v") - F.min("v")).alias("want")).collect()
    }
    assert rng == want


def test_grouped_agg_udaf_over_unbounded_window(spark):
    """aggregates.py claims registered UDAFs work over unbounded
    windows — prove it: weighted_median over an unbounded per-group
    window annotates every row with its group's median."""
    from pyspark.sql import Window

    from datasheet_etl_spark.functions.aggregates import weighted_median

    df = spark.createDataFrame(
        [("a", 1.0, 10), ("a", 2.0, 1), ("b", 7.0, 5)],
        "g string, v double, w long",
    )
    w = Window.partitionBy("g")
    got = {
        (r["g"], r["v"]): r["m"]
        for r in df.withColumn(
            "m", weighted_median(F.col("v"), F.col("w")).over(w)
        ).collect()
    }
    assert got[("a", 1.0)] == 1.0 and got[("a", 2.0)] == 1.0
    assert got[("b", 7.0)] == 7.0
