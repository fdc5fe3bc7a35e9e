"""Graph operator tests: components on known topologies, cluster dedup
end-to-end, topology joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def chain_cycle_pairs(spark):
    # two chains (1-2-3-4, 10-11), a cycle (20-21-22-20), an isolated pair
    pairs = [
        (1, 2), (2, 3), (3, 4),
        (10, 11),
        (20, 21), (21, 22), (22, 20),
        (30, 31),
    ]
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def test_connected_components_topologies(spark, chain_cycle_pairs):
    from datasheet_etl_spark.operators.graph import connected_components

    got = {
        r["id"]: r["component"]
        for r in connected_components(chain_cycle_pairs).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20,
        30: 30, 31: 30,
    }


def test_components_converge_on_long_chain(spark):
    """A 40-node path is the adversarial case for naive propagation
    (needs O(n) rounds without contraction); pointer chasing must close
    it within the iteration budget."""
    from datasheet_etl_spark.operators.graph import connected_components

    pairs = [(i, i + 1) for i in range(40)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = connected_components(df, max_iter=10).collect()
    assert {r["component"] for r in got} == {0}
    assert len(got) == 41


def test_dedup_clusters_and_drop(spark, chain_cycle_pairs):
    from datasheet_etl_spark.operators.graph import (
        dedup_clusters,
        drop_duplicates_by_cluster,
    )

    clusters = dedup_clusters(chain_cycle_pairs).collect()
    sizes = {r["cluster_rep"]: r["cluster_size"] for r in clusters}
    assert sizes == {1: 4, 10: 2, 20: 3, 30: 2}

    docs = spark.range(0, 35).withColumnRenamed("id", "doc_id")
    kept = drop_duplicates_by_cluster(docs, chain_cycle_pairs)
    kept_ids = {r["doc_id"] for r in kept.collect()}
    # representatives survive, other members dropped, unpaired untouched
    assert {1, 10, 20, 30} <= kept_ids
    assert kept_ids.isdisjoint({2, 3, 4, 11, 21, 22, 31})
    assert {0, 5, 15, 25, 34} <= kept_ids


def test_two_hop_and_degrees(spark):
    from datasheet_etl_spark.operators.graph import (
        degrees,
        edges_undirected,
        two_hop_neighbors,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], "id_a long, id_b long"
    )
    edges = edges_undirected(pairs)
    deg = {r["id"]: r["degree"] for r in degrees(edges).collect()}
    assert deg == {1: 2, 2: 2, 3: 2, 4: 2}
    hops = {(r["src"], r["dst"]) for r in two_hop_neighbors(edges).collect()}
    # square 1-2-3-4-1: two-hop pairs are the diagonals only
    assert hops == {(1, 3), (2, 4)}


def test_minhash_clusters_match_exact_clusters(spark):
    """End-to-end: clusters built from MinHash-LSH pairs must equal the
    clusters from exact-Jaccard pairs on the oracle slice."""
    from tests.conftest import SF_ORACLE

    from datasheet_etl_spark.functions import tokens
    from datasheet_etl_spark.io import load_table
    from datasheet_etl_spark.operators.dedup import (
        exact_jaccard_pairs,
        minhash_dedup_pairs,
        word_shingles,
    )
    from datasheet_etl_spark.operators.graph import dedup_clusters

    docs = load_table(spark, SF_ORACLE, "documents")
    sh = docs.select("doc_id", word_shingles(tokens(F.col("text")), 2).alias("sh"))
    exact = dedup_clusters(exact_jaccard_pairs(sh, 0.5)).collect()
    mh = dedup_clusters(
        minhash_dedup_pairs(docs, num_perm=64, bands=16, threshold=0.5)
    ).collect()
    as_map = lambda rows: {r["doc_id"]: r["cluster_rep"] for r in rows}
    assert as_map(exact) == as_map(mh)


def test_triangle_count_matches_bruteforce(spark):
    """Degree-oriented count equals a python brute-force enumeration on
    a deterministic graph containing hubs, chains and cliques."""
    from itertools import combinations

    from datasheet_etl_spark.operators.graph import triangle_count

    edges = set()
    # a 5-clique, a hub fanning to 10 leaves (no triangles), a 4-cycle
    # with one chord (2 triangles), and a chain
    for a, b in combinations(range(5), 2):
        edges.add((a, b))
    edges |= {(100, 200 + i) for i in range(10)}
    edges |= {(50, 51), (51, 52), (52, 53), (50, 53), (50, 52)}
    edges |= {(70, 71), (71, 72), (72, 73)}
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    expected = sum(
        1
        for u, v, w in combinations(sorted(adj), 3)
        if v in adj[u] and w in adj[u] and w in adj[v]
    )
    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    got = triangle_count(df).first()["n_triangles"]
    assert got == expected == 10 + 0 + 2 + 0


def test_funnel_stages_order_strictness(spark):
    """A stage event at or before the previous stage's completion does
    not count; NULLs cascade from the first missed stage."""
    from datasheet_etl_spark.operators.relational import funnel_stages

    rows = [
        # key 1: proper view(10) -> click(20) -> purchase(30)
        (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
        # key 2: click BEFORE the view -> funnel stops after view
        (2, 20, "click"), (2, 30, "view"), (2, 40, "purchase"),
        # key 3: click at EXACTLY the view instant -> strict > rejects
        (3, 10, "view"), (3, 10, "click"),
        # key 4: no view at all
        (4, 10, "click"), (4, 20, "purchase"),
    ]
    df = spark.createDataFrame(rows, "k long, ts long, et string")
    out = {
        r["k"]: (r["t_0"], r["t_1"], r["t_2"])
        for r in funnel_stages(df, ["k"], "ts", "et", ["view", "click", "purchase"]).collect()
    }
    assert out[1] == (10, 20, 30)
    assert out[2] == (30, None, None)  # purchase can't count past a NULL click
    assert out[3] == (10, None, None)
    assert out[4] == (None, None, None)


def test_k_core_matches_model(spark):
    """Peeled 2-core equals the python model on a graph where one
    removal cascades (chain off a triangle) — the case a single
    degree filter gets wrong."""
    edges = [
        (1, 2), (2, 3), (1, 3),      # triangle: the 2-core
        (3, 4), (4, 5), (5, 6),      # chain: peels entirely
        (7, 8),                      # isolated edge: peels
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    from datasheet_etl_spark.operators.graph import k_core

    core = {(r["src"], r["dst"]) for r in k_core(df, 2).collect()}
    assert core == {(1, 2), (2, 3), (1, 3)}

    # python model: iterative peeling
    def model(es, k):
        es = set(es)
        while True:
            deg = {}
            for u, v in es:
                deg[u] = deg.get(u, 0) + 1
                deg[v] = deg.get(v, 0) + 1
            bad = {n for n, d in deg.items() if d < k}
            if not bad:
                return es
            es = {(u, v) for u, v in es if u not in bad and v not in bad}

    assert core == model(edges, 2)
    # k=3: triangle nodes have degree 2 -> nothing survives
    assert k_core(df, 3).count() == 0


def test_t61_oracle_unroll_depth_has_margin():
    """The t61 oracle unrolls a FIXED number of peel rounds; if testdata
    regeneration ever makes the true peel depth approach that bound,
    this test fails with a clear message naming the oracle (the oracle
    also carries a -1 sentinel row as a runtime guard). Pure DuckDB —
    measures the actual convergence depth at both graded scales."""
    import duckdb

    UNROLLED = 8  # keep in sync with _t61_oracle_sql(rounds=...)
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'"
        )
        con.execute("""
          CREATE TABLE e AS
          SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS src,
                 greatest(a.l_partkey, b.l_partkey) AS dst
          FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
          WHERE a.l_partkey < 2000 AND b.l_partkey < 2000
            AND a.l_partkey <> b.l_partkey""")
        prev, depth = -1, 0
        while True:
            n = con.execute("SELECT count(*) FROM e").fetchone()[0]
            if n == prev:
                break
            prev = n
            depth += 1
            con.execute("""
              CREATE OR REPLACE TABLE e AS
              WITH d AS (
                SELECT id FROM (SELECT src AS id FROM e
                                UNION ALL SELECT dst FROM e)
                GROUP BY id HAVING count(*) >= 4)
              SELECT src, dst FROM e
              WHERE src IN (SELECT id FROM d) AND dst IN (SELECT id FROM d)""")
            assert depth <= UNROLLED, (
                f"{sf}: k-core peel depth exceeds the {UNROLLED}-round "
                "unroll in _t61_oracle_sql — raise its rounds parameter"
            )
        con.close()
        # require 2x margin, not just sufficiency
        assert (depth - 1) * 2 <= UNROLLED, (
            f"{sf}: peel depth {depth - 1} is within 2x of the "
            f"{UNROLLED}-round unroll — raise _t61_oracle_sql rounds"
        )
