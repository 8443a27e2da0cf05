"""Skew-aware candidate pair generation from bucket tables
(SURVEY.md §2.3 J1/J2, §2.2 P3/P4, §2.4 A4).

Shared by all three candidate sources: LSH band keys, SimHash pigeonhole
chunks, suffix-window fingerprints. The #1 scale risk is a hot bucket
(BASELINE.json:14 "salted, skew-aware repartitioning on band keys"):
exploding a hot key into pairs is quadratic before any join tuning helps.

Strategy, one shuffle each:
 1. bucket sizes via a salted two-stage aggregate (never a single hot
    reducer), joined back onto the bucket table;
 2. keys with 2 <= n <= cap: groupBy + bounded collect_list (sorted) →
    all pairs generated JVM-side with higher-order array functions — no
    self-join, so no duplicate scan of the bucket table;
 3. keys with n > cap: sorted-neighbor pairs via window lags (k=2
    predecessors) plus a star edge to the bucket minimum — linear in bucket
    size, spills instead of OOM. The per-pair verifier gates each edge, so
    connectivity must survive edge *loss*: with lag-1+lag-2+min edges, one
    false-collision member interleaved between true duplicates (or a
    false-collision minimum) cannot disconnect them; >= 2 consecutive
    interlopers with a false minimum could, but true duplicates co-occur in
    many independent bands (recall gates measure the composite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .config import DedupConfig


def salted_sizes(df: DataFrame, key_cols: list[str], config: DedupConfig) -> DataFrame:
    """Two-stage (salted) count per key: groupBy(key, salt) partial →
    groupBy(key) final. Output: key_cols + n."""
    salt = F.pmod(F.xxhash64("conv_id"), F.lit(config.salt_buckets)).alias("_salt")
    partial = df.groupBy(*key_cols, salt).agg(F.count("*").alias("_c"))
    return partial.groupBy(*key_cols).agg(F.sum("_c").cast("long").alias("n"))


def bucket_pairs(
    bucket_df: DataFrame,
    key_cols: list[str],
    config: DedupConfig,
    payload_cols: list[str] | None = None,
    assume_distinct: bool = False,
    carry_cols: list[str] | None = None,
    dedup: bool = True,
) -> DataFrame:
    """(key..., conv_id [, payload...]) -> canonical candidate pairs (a < b)
    [+ payload_a/payload_b columns], deduplicated across keys.

    Physical plan — ONE exchange + ONE sort, all JVM (no Arrow round-trip of
    the bucket table): a single window spec hash-partitioned on the bucket
    key and ordered by conv_id computes the bucket size (unbounded-frame
    count), the sorted predecessors (lag 1/2), and the bucket minimum
    (first) together. Hot buckets (n > cap) emit O(1) edges per member
    straight from those expressions — never a cross-product, spill-sort
    instead of OOM. Small buckets
    (2 <= n <= cap) are group-collected (cap-bounded lists; the groupBy
    reuses the window's partitioning, so no second exchange) and expanded to
    all pairs with a higher-order array comprehension. Only the final
    cross-key pair dedup shuffles again — on the (tiny) pair set. Set
    assume_distinct when (key, conv_id) rows are unique by construction to
    skip the defensive distinct. `carry_cols` (a subset of key_cols, e.g. a
    source tag when several bucket families share one exchange) ride into
    the output and join the dedup key, so pairs are deduped per family.
    """
    from pyspark.sql import Window

    payload_cols = payload_cols or []
    carry_cols = carry_cols or []
    members = bucket_df.select(*key_cols, "conv_id", *payload_cols)
    if not assume_distinct:
        members = members.distinct()

    cap = config.bucket_cap
    out_cols = (
        carry_cols
        + ["a", "b"]
        + [f"{c}_a" for c in payload_cols]
        + [f"{c}_b" for c in payload_cols]
    )

    # drop singleton buckets before the (heavier) sorted pair window: an
    # order-free count window on the same hash partitioning filters the
    # ~3/4 of key rows that can never pair (measured 1.09M -> 281k rows on
    # the bench corpus), so the lag/first/sliding-collect frames and the
    # pair explode run only over matchable buckets. Same exchange count —
    # the count window reuses the partitioning the pair window needs.
    wcount = Window.partitionBy(*key_cols)
    members = (
        members.withColumn("_n0", F.count("*").over(wcount))
        .filter(F.col("_n0") >= 2)
        .drop("_n0")
    )

    w = Window.partitionBy(*key_cols).orderBy("conv_id")
    mem = F.struct(F.col("conv_id"), *[F.col(c) for c in payload_cols])
    n = F.count("*").over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    prev = F.lag(mem).over(w)
    prev2 = F.lag(mem, 2).over(w)
    first = F.first(mem).over(w)  # bucket minimum (frame: up to current row)
    # following members, frame bounded to `cap` rows: exactly the pair
    # targets for small buckets, and a constant-size sliding buffer (never
    # O(bucket²)) when a hot key streams through
    foll = F.collect_list(mem).over(w.rowsBetween(1, cap))

    # hot rows: chain to the 2 sorted predecessors AND star to the bucket
    # minimum — still O(1) edges per member, but a single false bucket
    # collision sitting between two true duplicates can no longer disconnect
    # them after per-edge verification (the lag-1-only chain could: both of
    # the interloper's edges fail the verifier and the true pair is lost).
    # Null/self entries are filtered out (first row of the bucket).
    hot_arr = F.filter(
        F.array(
            F.struct(prev.alias("x"), mem.alias("y")),
            F.struct(prev2.alias("x"), mem.alias("y")),
            F.struct(first.alias("x"), mem.alias("y")),
        ),
        lambda p: p["x"].isNotNull() & (p["x"]["conv_id"] != p["y"]["conv_id"]),
    )
    small_arr = F.transform(foll, lambda y: F.struct(mem.alias("x"), y.alias("y")))
    pair_structs = F.when(n > cap, hot_arr).otherwise(small_arr)

    pairs = (
        # window expressions must materialize in their own projection before
        # feeding a generator
        members.select(*carry_cols, pair_structs.alias("ps"))
        .select(*carry_cols, F.explode("ps").alias("p"))
        .select(
            *carry_cols,
            F.col("p.x.conv_id").alias("a"),
            F.col("p.y.conv_id").alias("b"),
            *[F.col(f"p.x.{c}").alias(f"{c}_a") for c in payload_cols],
            *[F.col(f"p.y.{c}").alias(f"{c}_b") for c in payload_cols],
        )
    )
    pairs = pairs.filter(F.col("a") != F.col("b"))
    if dedup:
        # skippable (dedup=False) for callers that dedup the pair set
        # themselves downstream — the incremental merge unions these pairs
        # with index-join pairs and dedups once, so the exchange here would
        # be a third pass over the same tiny pair set
        pairs = pairs.dropDuplicates(carry_cols + ["a", "b"])
    return pairs.select(*out_cols)


# (lsh_rows, lsh_bands, hamming_d) -> the concat'd entry-array Column for
# unified_key_table. Column expression trees are config-pure and unresolved
# (they bind to a DataFrame only at select time), so one tree serves every
# call — constructing it costs ~10^3 py4j round trips (32 band structs, 4
# chunk structs with casts), which at one fresh build per micro-batch was a
# measurable slice of the drain's driver fixed cost.
_KEY_EXPR_CACHE: dict = {}


def unified_key_table(features: DataFrame, config: DedupConfig) -> DataFrame:
    """ONE scan of the (wide — it carries the shingle arrays) features table
    -> the narrow unified bucket-key table (src, k1, k2, conv_id, payload):
    each row emits its LSH band hashes (src=mh), SimHash pigeonhole chunks
    (src=sh, payload=simhash for the Hamming verify), and suffix-window
    fingerprints (src=sf) as one concatenated struct array through a single
    explode. Building three per-source tables instead (band_table ∪
    chunk_table ∪ suffix explode) scans and deserializes the checkpointed
    feature rows three times — pure memory-bandwidth burn that shows up
    directly in N-vs-4N CPU inflation.

    This table is also the streaming candidate *index* row format: persisted
    append-only per batch, it lets an incremental merge equi-join only the
    new batch's keys against prior keys instead of rebuilding bucket tables
    over the whole corpus (VERDICT r3 #1).
    """
    cache_key = (config.lsh_rows, config.lsh_bands, config.hamming_d)
    cached = _KEY_EXPR_CACHE.get(cache_key)
    if cached is not None:
        return features.select("conv_id", F.explode(cached).alias("e")).select(
            "e.src", "e.k1", "e.k2", "conv_id", "e.payload"
        )
    r = config.lsh_rows
    nulled = F.lit(None).cast("long")

    def entry(src: int, k1, k2, payload) -> F.Column:
        # src is a TINYINT code (_SRC_MH/_SRC_SH/_SRC_SF), not a string:
        # every exchanged key row saves the variable-length string section
        # (~8-16 B/row on a ~64 B row) and the window's partition compare
        # is a byte compare — measurable DRAM-bandwidth relief on the one
        # big exchange (the host's binding resource, BENCH/NOTES.md)
        return F.struct(
            F.lit(src).cast("tinyint").alias("src"),
            k1.cast("long").alias("k1"),
            k2.cast("long").alias("k2"),
            payload.cast("long").alias("payload"),
        )

    empty = F.array().cast(
        "array<struct<src:tinyint,k1:bigint,k2:bigint,payload:bigint>>"
    )
    bands = F.when(
        F.col("sig").isNotNull(),
        F.array(
            *[
                entry(
                    _SRC_MH,
                    F.lit(i),
                    F.xxhash64(F.lit(i), F.slice("sig", i * r + 1, r)),
                    nulled,
                )
                for i in range(config.lsh_bands)
            ]
        ),
    ).otherwise(empty)
    # chunk widths mirror simhash.chunk_table: chunk i covers bits
    # [i*64//n, (i+1)*64//n) — pigeonhole soundness needs full coverage
    n_chunks = config.hamming_d + 1
    chunk_exprs = []
    for i in range(n_chunks):
        start = i * 64 // n_chunks
        width = (i + 1) * 64 // n_chunks - start
        mask = (1 << width) - 1
        chunk_exprs.append(
            entry(
                _SRC_SH,
                F.lit(i),
                F.shiftrightunsigned(F.col("simhash"), start).bitwiseAND(F.lit(mask)),
                F.col("simhash"),
            )
        )
    chunks = F.when(F.col("simhash").isNotNull(), F.array(*chunk_exprs)).otherwise(empty)
    fps = F.transform(
        F.filter(
            F.coalesce(F.col("suffix_fps"), F.array().cast("array<bigint>")),
            lambda fp: fp.isNotNull(),
        ),
        lambda fp: entry(_SRC_SF, F.lit(0), fp, nulled),
    )
    _KEY_EXPR_CACHE[cache_key] = F.concat(bands, chunks, fps)
    return features.select(
        "conv_id", F.explode(_KEY_EXPR_CACHE[cache_key]).alias("e")
    ).select("e.src", "e.k1", "e.k2", "conv_id", "e.payload")


# tinyint source codes for the unified key/index tables; mapped back to
# the stable external tags (mh | sh | sf) at the pair boundary
_SRC_MH, _SRC_SH, _SRC_SF = 0, 1, 2


def _src_name() -> F.Column:
    return (
        F.when(F.col("src") == _SRC_MH, "mh")
        .when(F.col("src") == _SRC_SH, "sh")
        .otherwise("sf")
    )


def _hamming_ok(config: DedupConfig) -> F.Column:
    return (F.col("src") != _SRC_SH) | (
        F.bit_count(F.col("payload_a").bitwiseXOR(F.col("payload_b")))
        <= config.hamming_d
    )


def unified_candidates(
    rep_features: DataFrame,
    config: DedupConfig,
    dedup: bool = True,
    key_table: DataFrame | None = None,
) -> DataFrame:
    """All three candidate sources through ONE exchange + sort + window.

    The per-source bucket tables (LSH bands, SimHash pigeonhole chunks,
    suffix-window fingerprints) are narrow (src, k1, k2, conv_id, payload)
    rows; unioned (unified_key_table), they share a single hash partitioning
    on the bucket key instead of three independent shuffles racing for the
    same task slots — measured locally, three concurrent exchange+sort
    stages scaled only ~1.6x from 1→4 cores (slot contention + triple
    barrier) while one fused stage scales like the rest of the pipeline.
    `src` is part of the window key, so bucket families never mix; pairs
    come back tagged per source (mh | sh | sf) with the SimHash Hamming
    verify applied in the same projection.

    `key_table` lets a caller that already built the unified key table for
    the same features (the incremental merge, which also index-joins it)
    hand it in instead of paying a second expression-tree construction.
    """
    unified = key_table if key_table is not None else unified_key_table(rep_features, config)
    pairs = bucket_pairs(
        unified,
        ["src", "k1", "k2"],
        config,
        payload_cols=["payload"],
        assume_distinct=True,
        carry_cols=["src"],
        dedup=dedup,
    )
    return pairs.filter(_hamming_ok(config)).select(
        _src_name().alias("src"), "a", "b"
    )


def index_join_pairs(
    new_keys: DataFrame, index: DataFrame, config: DedupConfig, dedup: bool = True
) -> DataFrame:
    """New-batch keys × persisted key index -> candidate pairs (src, a, b)
    with a = new conv, b = indexed conv — the O(delta) replacement for
    rebuilding bucket tables over the whole prior corpus every merge.

    Shape at scale: the new batch's key table is micro-batch-sized, so it
    broadcasts; the index side is a columnar scan with NO shuffle and no
    sort — Spark's broadcast hash join streams index rows past the
    new-key hash table, and on a real deployment the index parts are
    additionally prunable by bucket-key min/max. Per (bucket key, new
    conv), only the `bucket_cap` smallest indexed members are kept (the
    bucket minimum is always among them), mirroring the batch path's
    star-to-min hot-bucket bound — a pathological hot key degrades to a
    spill-safe window sort over its matches, never an unbounded explosion.
    """
    nk = new_keys.select(
        "src", "k1", "k2",
        F.col("conv_id").alias("a"),
        F.col("payload").alias("payload_a"),
    )
    idx = index.select(
        "src", "k1", "k2",
        F.col("conv_id").alias("b"),
        F.col("payload").alias("payload_b"),
    )
    joined = idx.join(F.broadcast(nk), ["src", "k1", "k2"]).filter(
        F.col("a") != F.col("b")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("src", "k1", "k2", "a").orderBy("b")
    capped = (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= config.bucket_cap)
        .drop("_rn")
    )
    out = capped.filter(_hamming_ok(config)).select("src", "a", "b")
    if dedup:
        # see bucket_pairs: skipped when the caller dedups downstream
        out = out.dropDuplicates(["src", "a", "b"])
    return out.select(_src_name().alias("src"), "a", "b")


def bucket_stats(bucket_df: DataFrame, key_cols: list[str], config: DedupConfig) -> DataFrame:
    """Diagnostics for metrics: bucket-size histogram summary per source."""
    sizes = salted_sizes(
        bucket_df.select(*key_cols, "conv_id").distinct(), key_cols, config
    )
    return sizes.agg(
        F.count("*").alias("n_keys"),
        F.sum(F.when(F.col("n") >= 2, 1).otherwise(0)).alias("n_matchable_keys"),
        F.sum(F.when(F.col("n") > config.bucket_cap, 1).otherwise(0)).alias("n_hot_keys"),
        F.max("n").alias("max_bucket"),
        F.expr("approx_percentile(n, 0.99)").alias("p99_bucket"),
    )


def canonical_pairs(df: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Order endpoints (a < b), drop self-pairs, dedup (P4)."""
    return (
        df.select(
            F.least(F.col(a), F.col(b)).alias("a"),
            F.greatest(F.col(a), F.col(b)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
    )
