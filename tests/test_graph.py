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
