"""Connected components via alternating large-star / small-star joins
(SURVEY.md §2.3 J4; BASELINE.json:6,14; algorithm: Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14 — public).

Pure DataFrame implementation: each round is two groupBy-min + join stages;
`localCheckpoint` truncates the lineage every round so the plan tree stays
bounded (the classic iterative-Spark failure mode). Convergence is detected
by (count, order-insensitive xxhash64 sum) equality of the edge set; rounds
are capped at config.max_cc_rounds with a loud failure — expected rounds are
O(log n).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .config import DedupConfig


def _large_star(edges: DataFrame) -> DataFrame:
    sym = edges.select("u", "v").union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least("mn", "u").alias("mn"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("mn").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    directed = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    mins = directed.groupBy("u").agg(F.min("v").alias("mn"))
    rewired = (
        directed.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("mn").alias("v"))
        .union(mins.select(F.col("u"), F.col("mn").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    return rewired


def _edge_signature(edges: DataFrame) -> tuple[int, int]:
    # bit_xor: order-insensitive, ANSI-overflow-free (edges are distinct, so
    # no pair cancels itself)
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
    ).head()
    return int(row["n"]), int(row["h"])


def _local_union_find(pairs: DataFrame) -> DataFrame:
    """Driver-side union-find with path compression: one collect, zero
    iterative Spark jobs. Correct choice whenever the *edge list* (already a
    tiny projection of the corpus) fits on the driver — the iterative join
    loop costs O(rounds x shuffles) of job overhead that dwarfs the compute
    at this size."""
    spark = pairs.sparkSession
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:
            parent[x], x = r, parent[x]
        return r

    # one collect (single job) — toLocalIterator would schedule one tiny
    # job per partition, pure serial driver latency
    for row in pairs.collect():
        a, b = row[0], row[1]
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    assignment = [(x, find(x)) for x in parent]
    roots = {r for _, r in assignment}
    rows = assignment + [(r, r) for r in roots]
    # Arrow path: a pandas frame ships to the JVM as one Arrow batch;
    # createDataFrame over a list of Python tuples serializes row-by-row
    # (measured slower than the whole CC computation at ~200k assignments)
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["conv_id", "cluster_id"])
    return spark.createDataFrame(pdf)


def connected_components(
    pairs: DataFrame, config: DedupConfig
) -> tuple[DataFrame, int]:
    """(a, b) edge list -> ((conv_id, cluster_id) for every node appearing
    in an edge, cluster_id = min conv_id of the component; rounds used —
    0 means the driver-side union-find fast path handled it)."""
    # signature first, WITHOUT a checkpoint: the small-graph path (the
    # common case — every micro-batch merge, and the bench pipeline) needs
    # only two jobs (distinct+signature, then collect — the second reuses
    # the first's shuffle map output, so the distinct is not recomputed).
    # The eager localCheckpoint this replaces was a third job + block-store
    # churn that only the big distributed loop actually needs.
    edges_df = pairs.select(F.col("a").alias("u"), F.col("b").alias("v")).filter(
        F.col("u") != F.col("v")
    ).distinct()
    sig = _edge_signature(edges_df)
    if sig[0] == 0:
        spark = pairs.sparkSession
        empty = spark.createDataFrame([], "conv_id string, cluster_id string")
        return empty, 0
    if sig[0] <= config.cc_local_threshold:
        return _local_union_find(edges_df), 0
    edges = edges_df.localCheckpoint()  # lineage cut for the iterative loop
    rounds = 0
    while True:
        rounds += 1
        if rounds > config.max_cc_rounds:
            raise RuntimeError(
                f"connected components did not converge in {config.max_cc_rounds} rounds"
            )
        new_edges = _small_star(_large_star(edges)).localCheckpoint()
        new_sig = _edge_signature(new_edges)
        edges = new_edges
        if new_sig == sig:
            break
        sig = new_sig

    assignment = edges.groupBy("u").agg(F.min("v").alias("cluster_id"))
    roots = edges.select(F.col("v").alias("u")).distinct().join(
        assignment, "u", "left_anti"
    ).select("u", F.col("u").alias("cluster_id"))
    out = assignment.unionByName(roots).select(
        F.col("u").alias("conv_id"), "cluster_id"
    )
    return out, rounds
