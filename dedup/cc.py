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


def _local_union_find(rows, spark) -> DataFrame:
    """Driver-side union-find with path compression over an already
    collected edge list: zero iterative Spark jobs. Correct choice whenever
    the *edge list* (already a tiny projection of the corpus) fits on the
    driver — the iterative join loop costs O(rounds x shuffles) of job
    overhead that dwarfs the compute at this size. Duplicate edges are
    harmless (a repeated union is a no-op), which is what lets the caller
    skip the distinct exchange entirely on this path."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:
            parent[x], x = r, parent[x]
        return r

    for row in rows:
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
    # Small-graph fast path (the common case — every micro-batch merge, and
    # the bench pipeline): collect up to threshold+1 RAW edges in ONE
    # bounded job and union-find them on the driver. No distinct exchange
    # and no signature job — duplicate edges are no-op unions, so deduping
    # before the collect only added a full shuffle + an extra action to the
    # critical path (guide §2.4). The memory bound is unchanged: at most
    # threshold+1 rows ever reach the driver (raw count >= distinct count,
    # so the fallback is conservative). Only the big-graph path pays the
    # distinct + signature machinery it actually needs.
    spark = pairs.sparkSession
    from .state import push_job_desc

    edges_raw = pairs.select(F.col("a").alias("u"), F.col("b").alias("v")).filter(
        F.col("u") != F.col("v")
    )
    thr = config.cc_local_threshold
    # one job for the whole collect: CollectLimit's incremental partition
    # scan-up (1, 4, 16... partitions) would split this into several tiny
    # jobs on a multi-partition plan without ever short-circuiting (the
    # result is far below the limit), so ask for every partition up front
    conf = spark.conf
    saved_init = conf.get("spark.sql.limit.initialNumPartitions", None)
    prev = push_job_desc(spark, "cc:collect")
    try:
        conf.set("spark.sql.limit.initialNumPartitions", str(1 << 30))
        # Arrow collect (one batch per partition), not row-pickled collect:
        # at the threshold boundary (millions of edge rows) the pickle path
        # alone costs tens of seconds of driver CPU
        tbl = edges_raw.limit(thr + 1).toArrow()
    finally:
        push_job_desc(spark, prev)
        if saved_init is None:
            conf.unset("spark.sql.limit.initialNumPartitions")
        else:
            conf.set("spark.sql.limit.initialNumPartitions", saved_init)
    if tbl.num_rows == 0:
        empty = spark.createDataFrame([], "conv_id string, cluster_id string")
        return empty, 0
    if tbl.num_rows <= thr:
        rows = list(zip(tbl.column(0).to_pylist(), tbl.column(1).to_pylist()))
        del tbl
        prev = push_job_desc(spark, "cc:unionfind")
        try:
            return _local_union_find(rows, spark), 0
        finally:
            push_job_desc(spark, prev)
    del tbl
    edges_df = edges_raw.distinct()
    prev = push_job_desc(spark, "cc:signature")
    try:
        sig = _edge_signature(edges_df)
    finally:
        push_job_desc(spark, prev)
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
