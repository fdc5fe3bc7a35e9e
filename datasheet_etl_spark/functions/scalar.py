"""Scalar expressions: clean / parse / normalize / extract / infer.

Each function reproduces a reference behavior as a single Catalyst
expression (reference citations in docstrings are behavioral specs, not
code provenance). All are NULL-correct: wherever the reference returns
``None`` / ``""`` on bad input, the expression yields NULL / '' at the
same spot.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


# Python's whitespace set (str.strip() / re \s on str): ASCII \s plus the
# C1 separators \x1c-\x1f, NEL \x85, NBSP \xa0, and the Unicode space
# family. Java's trim() and ASCII \s stop at \x20 — the engine must strip
# what the reference's Python strip()/\s+ strips (found by hypothesis).
_PY_WS = (
    "[ \\t\\n\\r\\f\\x0b\\x1c\\x1d\\x1e\\x1f\\x85\\xa0"
    "\\u1680\\u2000-\\u200a\\u2028\\u2029\\u202f\\u205f\\u3000]"
)


def py_trim(col: Column) -> Column:
    """Python-semantics strip(): leading/trailing whitespace incl. the
    control/unicode spaces Java trim() leaves behind."""
    return F.regexp_replace(col, f"^{_PY_WS}+|{_PY_WS}+$", "")


def py_collapse_ws(col: Column) -> Column:
    """Python-semantics ``re.sub(r'\\s+', ' ')``."""
    return F.regexp_replace(col, f"{_PY_WS}+", " ")


def clean_cell(col: Column) -> Column:
    """None→'' and whitespace collapse (ref: extractor_v03.py:288-294)."""
    return F.coalesce(py_collapse_ws(py_trim(col)), F.lit(""))


def extract_number(col: Column) -> Column:
    """Strip non ``[0-9.+-eE]`` chars then parse as double, NULL on failure.

    Matches the reference's parse-on-demand tolerance (ref:
    double_verifier.py:104-115): empty input → NULL, garbage → NULL,
    '1.5V' → 1.5, '3.30' → 3.3. Spark's string→double cast returns NULL
    on malformed input exactly where Python ``float()`` raises.
    """
    cleaned = F.regexp_replace(F.trim(col.cast("string")), r"[^0-9.\-+eE]", "")
    # try_cast: NULL-on-fail must hold under ANSI mode (Spark 4 default)
    return F.when(cleaned == "", None).otherwise(cleaned.try_cast("double"))


def normalize_text(col: Column) -> Column:
    """Lowercase, collapse whitespace, strip ``[.,;:!?]`` (ref:
    double_verifier.py:188-199). NULL input → ''. Whitespace follows
    Python strip()/\\s semantics (see _PY_WS)."""
    lowered = F.lower(py_trim(F.coalesce(col.cast("string"), F.lit(""))))
    collapsed = py_collapse_ws(lowered)
    return F.regexp_replace(collapsed, r"[.,;:!?]", "")


def slugify(col: Column) -> Column:
    """Parameter-name slug: lower + spaces→underscores (ref: pipeline.py:351)."""
    return F.lower(F.regexp_replace(col, " ", "_"))


def canonical_header(col: Column) -> Column:
    """First-row cell → canonical header name (ref: extractor_v03.py:244-273).

    Order of the `when` chain matters and mirrors the reference's
    if/elif cascade; unknown cells pass through, empty/NULL → 'Unknown'.
    """
    cell = F.lower(F.trim(F.coalesce(col, F.lit(""))))
    return (
        F.when(cell.rlike("param"), "Parameter")
        .when(cell.rlike("symbol"), "Symbol")
        .when(cell.rlike("test.*cond|condition"), "Test_Conditions")
        .when(cell.rlike("^min"), "Min")
        .when(cell.rlike("^typ"), "Typ")
        .when(cell.rlike("^max"), "Max")
        .when(cell.rlike("unit"), "Unit")
        .when(cell.rlike("desc"), "Description")
        .otherwise(F.when(F.coalesce(col, F.lit("")) == "", "Unknown").otherwise(col))
    )


def has_standard_headers(headers: Column) -> Column:
    """≥3 of {Parameter,Min,Typ,Max,Unit} present (ref: extractor_v03.py:275-278)."""
    standard = F.array(*[F.lit(h) for h in ("Parameter", "Min", "Typ", "Max", "Unit")])
    return F.size(F.array_intersect(headers, standard)) >= 3


_TITLE_PATTERNS = [
    r"electrical\s*characteristics",
    r"absolute\s*maximum\s*ratings",
    r"recommended\s*operating\s*conditions",
    r"thermal\s*information",
    r"pin\s*functions",
    r"device\s*comparison",
]


def detect_table_title(page_text: Column, table_idx: Column) -> Column:
    """First matching title pattern (title-cased), else ``Table {i+1}``
    (ref: extractor_v03.py:280-286, patterns :108-115)."""
    extracted = None
    for pat in _TITLE_PATTERNS:
        hit = F.regexp_extract(page_text, f"(?i){pat}", 0)
        hit = F.when(hit != "", F.initcap(hit))
        extracted = hit if extracted is None else F.coalesce(extracted, hit)
    fallback = F.concat(F.lit("Table "), (table_idx + 1).cast("string"))
    return F.coalesce(extracted, fallback)


_MPN_PATTERNS = [r"LMR\d+[A-Z]*", r"TPS\d+[A-Z]*", r"LM\d+[A-Z]*"]


def extract_mpn(text: Column) -> Column:
    """First MPN-pattern match on page-1 text, else 'Unknown'
    (ref: extractor_v03.py:427-439)."""
    out = None
    for pat in _MPN_PATTERNS:
        hit = F.nullif(F.regexp_extract(text, pat, 0), F.lit(""))
        out = hit if out is None else F.coalesce(out, hit)
    return F.coalesce(out, F.lit("Unknown"))


def extract_manufacturer(text: Column) -> Column:
    """Substring-contains chain on page text (ref: extractor_v03.py:441-449)."""
    lowered = F.lower(text)
    return (
        F.when(lowered.contains("texas instruments"), "Texas Instruments")
        .when(lowered.contains("analog devices"), "Analog Devices")
        .when(lowered.contains("onsemi"), "onsemi")
        .otherwise("Unknown")
    )


# MPN-prefix → manufacturer dimension (ref: review_adapter.py:176-204).
# Expressed as data, not control flow, so it broadcast-joins at scale.
# NOTE: first-prefix-wins in *dict order*, so longer prefixes that share a
# stem (LMR vs LM) must resolve like the reference: LM wins for LMR parts
# because "LM" is checked first. We preserve exactly that ordering.
MPN_PREFIXES: list[tuple[str, str]] = [
    ("LM", "Texas Instruments"),
    ("TPS", "Texas Instruments"),
    ("LMR", "Texas Instruments"),
    ("MAX", "Analog Devices"),
    ("AD", "Analog Devices"),
    ("LT", "Analog Devices"),
    ("LTC", "Analog Devices"),
    ("MCP", "Microchip"),
    ("PIC", "Microchip"),
    ("STM", "STMicroelectronics"),
    ("NCP", "onsemi"),
    ("MC", "onsemi"),
    ("ISL", "Renesas"),
    ("IR", "Infineon"),
    ("INA", "Texas Instruments"),
    ("OPA", "Texas Instruments"),
]


def manufacturer_from_mpn_prefix(mpn: Column) -> Column:
    """Prefix-ordered manufacturer lookup; '' when no prefix matches."""
    upper = F.upper(mpn)
    out: Column = F.lit("")
    # reference iterates in insertion order, first match wins → build the
    # when-chain in the same order.
    chain = None
    for prefix, manufacturer in MPN_PREFIXES:
        cond = upper.startswith(prefix)
        chain = F.when(cond, manufacturer) if chain is None else chain.when(cond, manufacturer)
    return chain.otherwise(out)


def mpn_from_filename(path: Column) -> Column:
    """Filename stem, strip ``_v04/_extracted/_datasheet``, uppercase
    (ref: batch_export.py:325-338)."""
    stem = F.regexp_extract(path, r"([^/]+)\.[A-Za-z0-9]+$", 1)
    stem = F.when(stem == "", F.regexp_extract(path, r"([^/]+)$", 1)).otherwise(stem)
    stripped = F.regexp_replace(stem, r"(_v04|_extracted|_datasheet)", "")
    return F.upper(stripped)


def infer_category(params: Column) -> Column:
    """Category inference over the flat-parameter map (ref:
    batch_export.py:340-356). ``params`` is MapType(string,double)."""
    iq = params.getItem("quiescent_current_typ")
    return (
        F.when(params.getItem("switching_frequency_typ").isNotNull(), "Buck Converter")
        .when(params.getItem("efficiency_typ").isNotNull(), "DC-DC Converter")
        .when(iq.isNotNull() & (iq < 100), "LDO")
        .otherwise("Unknown")
    )


def tokens(text: Column) -> Column:
    """Lowercased word tokens: split on non-letter runs, drop empties."""
    arr = F.split(F.lower(F.coalesce(text, F.lit(""))), r"[^a-z]+")
    return F.filter(arr, lambda t: t != "")


_CATEGORY_PATTERNS = [
    r"^(input|output|power|thermal|timing|electrical)",
    r"characteristics$",
    r"^(absolute|recommended|operating)",
    r"conditions$",
    r"^(dc|ac)\s",
]


def is_category_header(text: Column) -> Column:
    """Category-header predicate: known section-name regexes over the
    lowercased cell OR alpha-ratio > 0.8 on a non-empty cell
    (ref: merge_detector.py:256-286)."""
    t = F.trim(F.coalesce(text, F.lit("")))
    lower = F.lower(t)
    known: Column = F.lit(False)
    for pat in _CATEGORY_PATTERNS:
        known = known | lower.rlike(pat)
    alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    ratio_ok = (F.length(t) > 0) & ((alpha / F.length(t)) > 0.8)
    return (F.length(t) > 0) & (known | ratio_ok)


def diagram_type(text: Column) -> Column:
    """G1 diagram-type detect (ref: extractor_v03.py:300-347): caption /
    page-text regex ladder → block_diagram | typical_app | pinout |
    unknown. First match wins, mirroring the reference's pattern order."""
    t = F.lower(F.coalesce(text, F.lit("")))
    return (
        F.when(t.rlike(r"(functional|simplified)?\s*block\s*diagram"), "block_diagram")
        .when(
            t.rlike(r"typical\s*application|application\s*(circuit|schematic)"),
            "typical_app",
        )
        .when(
            t.rlike(r"pin\s*(out|configuration|assignment|description)|pinout"),
            "pinout",
        )
        .otherwise("unknown")
    )
