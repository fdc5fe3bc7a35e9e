"""Graph operators (survey §2.7) over edge DataFrames.

The reference extracts diagrams as node/edge lists
(interfaces.py:87-98, vision_client.py:109-124) and its topology
questions are joins over those lists. Here the graph IS two DataFrames;
every operator is a join/aggregate shape that Catalyst optimizes like
any other, so the same code serves datasheet diagram topology AND the
corpus-scale use: turning near-dup *pairs* into duplicate *clusters*.

``connected_components`` uses min-label propagation with an
early-converging contraction step (Hash-to-Min style: every node adopts
the smallest label in its closed neighborhood, then labels propagate
through the current representative — O(log diameter) rounds). Near-dup
clusters have tiny diameters, so 3–5 rounds close 100 TB-scale pair
sets; each round is one shuffle on node id, and lineage is truncated
per round so plans don't grow with iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edges_undirected(pairs: DataFrame, a: str = "id_a", b: str = "id_b") -> DataFrame:
    """Canonical undirected edge list: (src < dst), deduped."""
    src = F.least(F.col(a), F.col(b)).alias("src")
    dst = F.greatest(F.col(a), F.col(b)).alias("dst")
    return pairs.select(src, dst).filter(F.col("src") != F.col("dst")).distinct()


def degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Undirected degree per node — one explode + hash agg."""
    nodes = edges.select(F.explode(F.array(src, dst)).alias("id"))
    return nodes.groupBy("id").agg(F.count("*").alias("degree"))


def two_hop_neighbors(edges: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Distinct 2-hop pairs (a, c) connected through some b — the
    diagram topology question ('what reaches GND via one component')
    as a self-join. Excludes direct edges and self-pairs.

    ``group_cols`` scopes the topology per group (e.g. per document key:
    each datasheet's app-circuit is its own graph — vision_client.py's
    per-diagram extraction). The self-join then keys on (group, b), so
    distinct documents' nodes never meet even when labels collide
    ('GND' is every circuit's favorite node)."""
    g = list(group_cols or [])
    sym = edges.select(*g, "src", "dst").union(
        edges.select(*g, F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    l = sym.select(*g, F.col("src").alias("a"), F.col("dst").alias("b"))
    r = sym.select(*g, F.col("src").alias("b"), F.col("dst").alias("c"))
    hops = (
        l.join(r, [*g, "b"])
        .filter(F.col("a") != F.col("c"))
        .select(
            *g, F.least("a", "c").alias("src"), F.greatest("a", "c").alias("dst")
        )
        .distinct()
    )
    canon = edges.select(
        *g,
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst"),
    )
    return hops.join(canon, [*g, "src", "dst"], "left_anti")


def connected_components(
    pairs: DataFrame,
    a: str = "id_a",
    b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node id → component id) with component id = min member id.

    Min-label propagation: each round every node adopts the minimum
    label over its closed neighborhood, then chases one level of
    pointer (label := label's label) to contract chains. Convergence is
    checked with a changed-count aggregate; each round's result is
    localCheckpoint'ed so the plan stays one-round deep regardless of
    iteration count (loops over DataFrames otherwise accrete lineage).
    """
    edges = edges_undirected(pairs, a, b)
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # min label over closed neighborhood
        neighbor_min = (
            sym.join(labels.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.min("label").alias("nmin"))
        )
        stepped = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id", F.least("label", F.coalesce("nmin", "label")).alias("label")
            )
        )
        # pointer chase: label := label(label) — contracts chains fast
        chased = (
            stepped.alias("x")
            .join(
                stepped.select(
                    F.col("id").alias("label"), F.col("label").alias("parent")
                ).alias("p"),
                "label",
                "left",
            )
            .select("id", F.least("label", F.coalesce("parent", "label")).alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            chased.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = chased
        if changed == 0:
            break
    else:
        # max_iter exhausted with labels still moving: surfacing this
        # beats silently returning wrong components on long-chain graphs
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing); raise max_iter"
        )
    return labels.select("id", F.col("label").alias("component"))


def pagerank(
    edges: DataFrame,
    iters: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list → (id, rank).

    Each iteration is the canonical two-shuffle shape: contributions =
    edges ⋈ ranks on ``src`` (rank/out_degree down each edge), then a
    hash-aggregate on ``dst``; rank = (1-d)/N + d·(contribs + dangling
    mass/N). Dangling mass (rank parked on nodes with no out-edges —
    dropped by the join) is a ONE-ROW aggregate per iteration,
    kilobytes at any graph size, and redistributed uniformly so ranks
    keep summing to 1. Each round's contributions are localCheckpoint'ed
    so lineage depth stays constant at any iteration count — the same
    discipline as ``connected_components``.

    Deterministic given the edge list; iteration count is the
    convergence knob (power iteration contracts by ~``damping`` per
    round).
    """
    e = edges.select(src, dst).distinct()
    out_deg = e.groupBy(src).agg(F.count("*").alias("_outd"))
    nodes = (
        e.select(F.col(src).alias("id"))
        .union(e.select(F.col(dst).alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        # empty edge list (pre-filter matched nothing): empty ranks,
        # not a driver-side ZeroDivisionError
        return nodes.withColumn("rank", F.lit(0.0))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    links = (
        e.join(out_deg, src)
        .select(F.col(src).alias("id"), F.col(dst).alias("_to"), "_outd")
        .localCheckpoint(eager=True)
    )

    for i in range(iters):
        # materialize the round's contributions ONCE: the dangling-mass
        # scalar and the next ranks both read the checkpointed result,
        # so each iteration is exactly one join+agg job plus a
        # kilobyte-scale agg — an un-truncated lineage would recompute
        # the whole chain at every per-round action
        # per-edge contribution is a double DIVISION (deterministic per
        # row in any engine), but the per-node SUM runs as DECIMAL —
        # decimal addition is exactly associative/commutative, so the
        # aggregate is independent of partitioning/merge order. That
        # makes fixed-iteration PageRank bit-reproducible across runs
        # and cluster sizes, and cross-ENGINE agreement tightens to the
        # double->decimal cast's sub-ulp representation difference
        # (t44's DuckDB oracle rides exactly this property); scale 28
        # captures every double ulp for rank magnitudes down to ~1e-11.
        contribs = (
            links.join(ranks, "id")
            .select(
                "_to",
                (F.col("rank") / F.col("_outd")).cast("decimal(38,28)").alias("_c"),
            )
            .groupBy("_to")
            .agg(F.sum("_c").alias("_contrib"))
            .localCheckpoint(eager=True)
        )
        # every non-dangling node's rank arrives somewhere, so what
        # flowed is exactly sum(contribs); the rest sat on dangling nodes
        flowed = contribs.agg(F.sum("_contrib")).first()[0]
        dangling = 1.0 - float(flowed or 0.0)
        ranks = (
            nodes.join(contribs, nodes["id"] == contribs["_to"], "left")
            .select(
                "id",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("_contrib"), F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
        )
    return ranks


def dedup_clusters(pairs: DataFrame, a: str = "id_a", b: str = "id_b") -> DataFrame:
    """Near-dup pairs → duplicate clusters: (doc id, cluster
    representative = min member id, cluster size). Docs not in any pair
    are their own singleton cluster and are simply absent here."""
    cc = connected_components(pairs, a, b)
    sizes = cc.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return (
        cc.join(sizes, "component")
        .select(
            F.col("id").alias("doc_id"),
            F.col("component").alias("cluster_rep"),
            "cluster_size",
        )
    )


def drop_duplicates_by_cluster(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Keep one representative per near-dup cluster (the min id) plus
    every unpaired doc — the end-to-end corpus dedup: pairs → clusters →
    left-anti on the non-representatives."""
    clusters = dedup_clusters(pairs)
    losers = clusters.filter(F.col("doc_id") != F.col("cluster_rep")).select(
        F.col("doc_id").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")


def triangle_count(edges: DataFrame) -> DataFrame:
    """Global triangle count over an undirected edge list (``src`` <
    ``dst``, deduped — :func:`edges_undirected`'s output) via
    degree-ordered orientation: every edge is re-oriented from its
    lower-(degree, id) endpoint to its higher one, then triangles are
    wedges (u→v, u→w) closed by the edge (v→w).

    WHY degree orientation instead of joining on the raw (src < dst)
    id order: the wedge join explodes on out-degree, and under id
    order a high-degree hub can own O(n) outgoing edges → O(n²)
    wedges. Orienting toward higher degree caps every out-degree at
    O(√m) (a node of degree d > √m has < √m higher-degree neighbors),
    so wedge count — the shuffle that dominates at 100 TB — is
    O(m^1.5) worst-case instead of O(n²), the standard bound for
    distributed triangle enumeration. Counting is orientation-
    invariant, which is exactly what the DuckDB oracle (id-ordered
    3-way join) re-checks.

    The oriented edge list is PERSISTED before fanning out: it feeds
    both wedge sides and both directions of the closing join, and
    without the persist Catalyst re-expands the edges⋈degrees plan into
    every branch (~4 recomputations of the expensive join — verified in
    the executed plan). With it: one degree aggregate, one orientation
    join pass, then the wedge and closing joins over the cached
    oriented edges. Returns a single row ``n_triangles``.
    """
    from datasheet_etl_spark.caching import scoped_persist

    # deg is consumed twice (src and dst joins) and itself re-derives
    # the edge list — persist it so the orientation pass reads edges
    # once, not three times
    deg = scoped_persist(degrees(edges))
    # total order by (degree, id): orient edge toward the larger key
    e = (
        edges.join(deg.withColumnRenamed("id", "src"), "src")
        .withColumnRenamed("degree", "d_src")
        .join(
            deg.withColumnRenamed("id", "dst").withColumnRenamed(
                "degree", "d_dst"
            ),
            "dst",
        )
    )
    fwd = (F.col("d_src") < F.col("d_dst")) | (
        (F.col("d_src") == F.col("d_dst")) & (F.col("src") < F.col("dst"))
    )
    oriented = scoped_persist(
        e.select(
            F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("u"),
            F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("v"),
        )
    )
    w1 = oriented.select(F.col("u"), F.col("v").alias("v1"))
    w2 = oriented.select(F.col("u"), F.col("v").alias("v2"))
    wedges = w1.join(w2, "u").filter(F.col("v1") < F.col("v2"))
    closing = oriented.select(
        F.col("u").alias("c1"), F.col("v").alias("c2")
    ).union(
        oriented.select(F.col("v").alias("c1"), F.col("u").alias("c2"))
    )
    tri = wedges.join(
        closing,
        (F.col("v1") == F.col("c1")) & (F.col("v2") == F.col("c2")),
        "inner",
    )
    return tri.agg(F.count("*").alias("n_triangles"))


def k_core(
    edges: DataFrame, k: int, max_iter: int = 30
) -> DataFrame:
    """The k-core of an undirected graph (``src`` < ``dst``, deduped):
    the maximal subgraph where every node has degree ≥ k, computed by
    iterative peeling — drop all nodes with degree < k, recompute
    degrees on the surviving subgraph, repeat until stable. The
    community-mining / spam-subgraph primitive (dense cores survive,
    tendrils and stars peel away) that degree filtering alone cannot
    compute: removing a low-degree node can demote its neighbors, so
    one pass is not enough.

    Each round is one degree aggregate + one semi-join pair on the
    CURRENT edge set, localCheckpoint'ed so lineage stays one-round
    deep at any iteration count (same discipline as
    ``connected_components``/``pagerank``). Round count is bounded by
    the graph's degeneracy ordering depth — small for real graphs; a
    non-converged run raises rather than returning a wrong core.

    Returns the surviving edge list (src, dst); nodes of the core are
    its distinct endpoints.
    """
    cur = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    for _ in range(max_iter):
        # materialize the round's degrees once: the stop-condition count
        # and both semi-joins read the checkpoint instead of re-running
        # the degree aggregate per consumer
        deg = degrees(cur).localCheckpoint(eager=True)
        low = deg.filter(F.col("degree") < k).select("id")
        n_low = low.count()
        if n_low == 0:
            return cur
        keep = deg.filter(F.col("degree") >= k).select("id")
        cur = (
            cur.join(keep.withColumnRenamed("id", "src"), "src", "semi")
            .join(keep.withColumnRenamed("id", "dst"), "dst", "semi")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
    raise RuntimeError(
        f"k_core did not stabilize in {max_iter} rounds; raise max_iter"
    )
