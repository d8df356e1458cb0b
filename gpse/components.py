"""Connected components over candidate-pair graphs (SURVEY §2 LLM-pipeline
ops — the clustering step between near-dup PAIR generation and actual
corpus deduplication).

MinHash-LSH / SimHash / embedding-LSH all emit candidate PAIRS (doc_a,
doc_b).  Production dedup needs the transitive closure of those pairs —
if A~B and B~C, then {A,B,C} is ONE duplicate cluster and exactly one
representative survives.  This module computes components with the
alternating large-star / small-star algorithm (Kiveris, Lattanzi,
Mirrokni, Rastogi, Vassilvitskii — "Connected Components in MapReduce and
Beyond", SoCC'14; public), which converges in O(log² n) rounds
independent of component diameter — a 1M-node chain collapses in ~20
rounds where naive min-label propagation needs 1M.

Scale shape (the 100 TB story):
- Each half-round is ONE hash shuffle of the edge list on its grouping
  endpoint: the per-node min is a partial+final hash aggregate and the
  emit-join reuses the aggregate's partitioning (no second Exchange for
  the join's left side).
- Edges only ever point toward smaller ids, the working set shrinks
  monotonically after the first rounds, and per-iteration
  `localCheckpoint` truncates the lineage so round k's plan does not
  replay rounds 0..k-1 (the classic iterative-DataFrame blowup).
- Skew: a giant component's hub node holds many edges; large-star
  explicitly re-points strictly-larger neighbors at the current min,
  which splits hub fan-in across rounds instead of funnelling the whole
  component through one reducer at once (that is the point of the
  algorithm — see the paper's Thm 2).

Determinism: the fixed point is the star forest rooted at each
component's MINIMUM node id, so (node, component=min-id) is unique
regardless of partitioning, iteration count, or execution order — which
is what lets a DuckDB recursive-CTE oracle value-check the whole loop
(__spark_entry__.py `dedup_clusters`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(e: DataFrame) -> DataFrame:
    """(u,v) edges → for each node n: emit (x, min(N(n) ∪ {n})) for every
    strictly-larger neighbor x.  Neighborhoods come from the symmetrized
    edge list; one shuffle on n."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.least(F.min("v"), F.col("u")).alias("m"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Direct every edge large→small, then for each node n: emit
    (x, min(N(n))) for x in N(n) ∪ {n}, dropping the self-edge."""
    d = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    mins = d.groupBy("u").agg(F.min("v").alias("m"))
    re_pointed = d.join(mins, "u").select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    root_links = mins.select("u", F.col("m").alias("v"))
    return (
        re_pointed.union(root_links)
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    nodes: DataFrame | None = None,
    node_col: str = "doc_id",
    max_iter: int = 50,
) -> DataFrame:
    """Component labels for an undirected pair graph.

    edges: DataFrame with `src`/`dst` columns (any integral type; cast to
    long).  nodes (optional): DataFrame whose `node_col` lists EVERY node
    — isolated nodes then appear as singleton components; without it only
    nodes incident to an edge are labeled.

    Returns (node long, component long) where component = min node id of
    the connected component — deterministic for any input partitioning.

    Raises RuntimeError if the edge set has not reached its fixed point
    after max_iter alternations (loud, never silently-wrong: the paper's
    bound is O(log² n) rounds, so 50 covers any realistic graph; each
    round costs one count action for the convergence checksum).
    """
    e = (
        edges.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev = None
    try:
        converged = False
        for _ in range(max_iter):
            nxt = _small_star(_large_star(e)).localCheckpoint(eager=True)
            # Fixed-point check on a partitioning-independent checksum:
            # edge count + sum of per-edge hashes (one cheap agg action on
            # the already-checkpointed frame, no driver-side edge collect).
            # bit_xor, not sum: order-independent AND overflow-free under
            # ANSI mode (summing 64-bit hashes overflows long)
            sig = nxt.agg(
                F.count("*").alias("n"),
                F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
            ).collect()[0]
            sig = (sig["n"], sig["h"])
            if prev is not None and sig == prev[0]:
                converged = True
                e.unpersist()
                e = nxt
                break
            if prev is not None:
                prev[1].unpersist()
            prev = (sig, e)
            e = nxt
        if not converged:
            raise RuntimeError(
                f"connected_components: no fixed point after {max_iter} "
                "large-star/small-star rounds — raise max_iter (bound is "
                "O(log² n) rounds)"
            )
    finally:
        if prev is not None:
            prev[1].unpersist()

    # Fixed point is a star forest: every non-root points at its root.
    # min() collapses the (rare) transient duplicate target defensively.
    labels = e.groupBy("u").agg(F.min("v").alias("component"))
    if nodes is None:
        roots = e.select(F.col("v").alias("u")).distinct().join(
            labels, "u", "left_anti"
        ).select("u", F.col("u").alias("component"))
        out = labels.union(roots)
    else:
        n = nodes.select(F.col(node_col).cast("long").alias("u")).distinct()
        out = n.join(labels, "u", "left").select(
            "u", F.coalesce("component", F.col("u")).alias("component")
        )
    return out.select(F.col("u").alias("node"), "component")


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Near-dup clustering end-to-end: candidate pairs → connected
    components → per-doc (cluster_id, cluster_size, keep).  keep marks the
    cluster representative (min doc id — the standard deterministic
    choice); filtering on it IS the near-dedup.  The cluster_size window
    shuffles once on cluster_id — at corpus scale that shuffle carries two
    longs per document."""
    from pyspark.sql import Window

    comp = connected_components(pairs, src=src, dst=dst, nodes=docs, node_col=id_col)
    w = Window.partitionBy("cluster_id")
    return (
        comp.select(
            F.col("node").alias(id_col), F.col("component").alias("cluster_id")
        )
        .withColumn("cluster_size", F.count("*").over(w))
        .withColumn("keep", F.col(id_col) == F.col("cluster_id"))
    )
