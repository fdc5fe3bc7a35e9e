"""Diagram / pinout / application-circuit extraction surface (survey
§2.7 G2–G4, extract side).

The reference's vision model returns one JSON document per diagram with
a fixed contract per diagram type (block-diagram nodes/edges at
vision_client.py:109-124, pinout pins {number,name,type,description} at
:144-152, app-circuit components/connections at :166-180). In the
reference these are dict-walked; here each contract is a typed
``from_json`` schema and the "extraction" is a column expression, so the
parse itself is plan-visible, null-safe (malformed JSON → NULL fields,
not an exception), and explodes directly into the relational/graph
DataFrames that ``operators.graph`` queries.

Scale shape: ``from_json`` + ``explode`` run map-side in whole-stage
codegen — a corpus of billions of diagram JSONs parses without a single
shuffle; only the downstream topology joins shuffle, on the exploded
edge keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# vision_client.py:109-124 (BLOCK_DIAGRAM OUTPUT FORMAT)
BLOCK_DIAGRAM_SCHEMA = (
    "struct<"
    "diagram_type:string,title:string,"
    "nodes:array<struct<id:string,label:string,type:string>>,"
    "edges:array<struct<from:string,to:string,label:string,type:string>>,"
    "description:string>"
)

# vision_client.py:144-152 (PINOUT_DIAGRAM OUTPUT FORMAT)
PINOUT_SCHEMA = (
    "struct<"
    "package:string,pin_count:int,"
    "pins:array<struct<number:int,name:string,type:string,description:string>>>"
)

# vision_client.py:166-180 (TYPICAL_APPLICATION OUTPUT FORMAT)
APP_CIRCUIT_SCHEMA = (
    "struct<"
    "circuit_type:string,main_ic:string,"
    "components:array<struct<ref:string,type:string,value:string,connection:string>>,"
    "connections:array<struct<from:string,to:string,through:string>>,"
    "notes:array<string>>"
)


def parse_diagram(json_col: Column | str, schema: str) -> Column:
    """Typed parse of a vision-response JSON column; malformed input
    yields NULL fields (PERMISSIVE mode — the downstream explode simply
    drops the document; never a job failure)."""
    return F.from_json(json_col, schema)


def diagram_nodes(df: DataFrame, key: str, json_col: str) -> DataFrame:
    """(key, node_id, label, node_type) — one row per block-diagram node."""
    d = df.select(key, parse_diagram(json_col, BLOCK_DIAGRAM_SCHEMA).alias("_d"))
    return d.select(
        key,
        F.col("_d.diagram_type").alias("diagram_type"),
        F.explode("_d.nodes").alias("_n"),
    ).select(
        key,
        "diagram_type",
        F.col("_n.id").alias("node_id"),
        F.col("_n.label").alias("label"),
        F.col("_n.type").alias("node_type"),
    )


def diagram_edges(df: DataFrame, key: str, json_col: str) -> DataFrame:
    """(key, src, dst, signal, edge_type) — block-diagram connectivity in
    the shape ``operators.graph`` consumes (src/dst node ids)."""
    d = df.select(key, parse_diagram(json_col, BLOCK_DIAGRAM_SCHEMA).alias("_d"))
    return d.select(key, F.explode("_d.edges").alias("_e")).select(
        key,
        F.col("_e.from").alias("src"),
        F.col("_e.to").alias("dst"),
        F.col("_e.label").alias("signal"),
        F.col("_e.type").alias("edge_type"),
    )


def pinout_pins(df: DataFrame, key: str, json_col: str) -> DataFrame:
    """(key, package, pin_count, pin_number, pin_name, pin_type,
    description) — one row per pin, G3's relational form."""
    d = df.select(key, parse_diagram(json_col, PINOUT_SCHEMA).alias("_d"))
    return d.select(
        key,
        F.col("_d.package").alias("package"),
        F.col("_d.pin_count").alias("pin_count"),
        F.explode("_d.pins").alias("_p"),
    ).select(
        key,
        "package",
        "pin_count",
        F.col("_p.number").alias("pin_number"),
        F.col("_p.name").alias("pin_name"),
        F.col("_p.type").alias("pin_type"),
        F.col("_p.description").alias("description"),
    )


def app_components(df: DataFrame, key: str, json_col: str) -> DataFrame:
    """(key, circuit_type, main_ic, ref, component_type, value,
    connection) — one row per external component (G4)."""
    d = df.select(key, parse_diagram(json_col, APP_CIRCUIT_SCHEMA).alias("_d"))
    return d.select(
        key,
        F.col("_d.circuit_type").alias("circuit_type"),
        F.col("_d.main_ic").alias("main_ic"),
        F.explode("_d.components").alias("_c"),
    ).select(
        key,
        "circuit_type",
        "main_ic",
        F.col("_c.ref").alias("ref"),
        F.col("_c.type").alias("component_type"),
        F.col("_c.value").alias("value"),
        F.col("_c.connection").alias("connection"),
    )


def app_connections(df: DataFrame, key: str, json_col: str) -> DataFrame:
    """(key, src, dst, through) — app-circuit net connectivity; feeds the
    same graph operators as block-diagram edges (G4 'what reaches GND
    through one component' is ``two_hop_neighbors`` over this)."""
    d = df.select(key, parse_diagram(json_col, APP_CIRCUIT_SCHEMA).alias("_d"))
    return d.select(key, F.explode("_d.connections").alias("_c")).select(
        key,
        F.col("_c.from").alias("src"),
        F.col("_c.to").alias("dst"),
        F.col("_c.through").alias("through"),
    )
