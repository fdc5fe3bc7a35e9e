"""Typed vision-JSON contracts (G2-G4 extract side): block-diagram
nodes/edges, pinout pins, app-circuit components/connections."""

from __future__ import annotations

from pyspark.sql import functions as F

BLOCK = """{
  "diagram_type": "block_diagram", "title": "Buck Converter",
  "nodes": [
    {"id": "n1", "label": "VIN", "type": "pin"},
    {"id": "n2", "label": "Error Amp", "type": "block"},
    {"id": "n3", "label": "GND", "type": "ground"}
  ],
  "edges": [
    {"from": "n1", "to": "n2", "label": "VIN", "type": "power"},
    {"from": "n2", "to": "n3", "label": "", "type": "signal"},
    {"from": "n3", "to": "n2", "label": "fb", "type": "feedback"}
  ],
  "description": "buck converter control loop"
}"""

PINOUT = """{
  "package": "QFN-16", "pin_count": 2,
  "pins": [
    {"number": 1, "name": "VIN", "type": "power", "description": "Input voltage"},
    {"number": 2, "name": "GND", "type": "ground", "description": "Ground"}
  ]
}"""

APP = """{
  "circuit_type": "buck_converter", "main_ic": "LMR33630",
  "components": [
    {"ref": "C1", "type": "capacitor", "value": "10uF", "connection": "VIN to GND"},
    {"ref": "L1", "type": "inductor", "value": "4.7uH", "connection": "SW to VOUT"}
  ],
  "connections": [
    {"from": "VIN", "to": "IC.VIN", "through": "C1"},
    {"from": "IC.SW", "to": "VOUT", "through": "L1"}
  ],
  "notes": ["keep C1 close to the IC"]
}"""


def test_block_diagram_nodes_and_edges(spark):
    from datasheet_etl_spark.operators.diagrams import diagram_edges, diagram_nodes

    df = spark.createDataFrame([(1, BLOCK)], "key long, j string")
    nodes = {r.node_id: (r.label, r.node_type) for r in diagram_nodes(df, "key", "j").collect()}
    assert nodes == {
        "n1": ("VIN", "pin"),
        "n2": ("Error Amp", "block"),
        "n3": ("GND", "ground"),
    }
    edges = [(r.src, r.dst, r.edge_type) for r in diagram_edges(df, "key", "j").collect()]
    assert ("n3", "n2", "feedback") in edges
    assert len(edges) == 3


def test_pinout_pins(spark):
    from datasheet_etl_spark.operators.diagrams import pinout_pins

    df = spark.createDataFrame([(7, PINOUT)], "key long, j string")
    rows = pinout_pins(df, "key", "j").orderBy("pin_number").collect()
    assert [(r.pin_number, r.pin_name, r.pin_type) for r in rows] == [
        (1, "VIN", "power"),
        (2, "GND", "ground"),
    ]
    assert rows[0].package == "QFN-16" and rows[0].pin_count == 2
    assert rows[1].description == "Ground"


def test_app_circuit_components_and_connections(spark):
    from datasheet_etl_spark.operators.diagrams import app_components, app_connections

    df = spark.createDataFrame([(3, APP)], "key long, j string")
    comps = {r.ref: (r.component_type, r.value) for r in app_components(df, "key", "j").collect()}
    assert comps == {"C1": ("capacitor", "10uF"), "L1": ("inductor", "4.7uH")}
    conns = [(r.src, r.dst, r.through) for r in app_connections(df, "key", "j").collect()]
    assert conns == [("VIN", "IC.VIN", "C1"), ("IC.SW", "VOUT", "L1")]


def test_malformed_json_is_null_not_error(spark):
    from datasheet_etl_spark.operators.diagrams import (
        BLOCK_DIAGRAM_SCHEMA,
        diagram_edges,
        parse_diagram,
    )

    df = spark.createDataFrame(
        [(1, "not json at all"), (2, None), (3, BLOCK)], "key long, j string"
    )
    # PERMISSIVE parse: unparseable text → all-NULL fields, NULL in → NULL
    parsed = df.select("key", parse_diagram("j", BLOCK_DIAGRAM_SCHEMA).alias("d"))
    assert parsed.filter(F.col("d.nodes").isNull()).count() == 2
    # explode drops the nulls; only the well-formed doc yields edges
    assert diagram_edges(df, "key", "j").select("key").distinct().count() == 1


def test_two_hop_scoped_per_document(spark):
    """Two docs both naming 'GND' must not leak topology across keys."""
    from datasheet_etl_spark.operators.graph import two_hop_neighbors

    edges = spark.createDataFrame(
        [(1, "A", "M"), (1, "M", "GND"), (2, "B", "GND")],
        "key long, src string, dst string",
    )
    hops = [(r.key, r.src, r.dst) for r in two_hop_neighbors(edges, ["key"]).collect()]
    assert hops == [(1, "A", "GND")]  # doc 2 has no 2-hop pairs
