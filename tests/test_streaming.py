"""Structured Streaming ingest tests: multi-micro-batch drain, cross-run
incremental chaining via the promoted state, and exact equivalence with the
one-shot batch pipeline over the full corpus."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from dedup.config import DedupConfig
from dedup.fixtures import gen_transcripts
from dedup.pipeline import run_pipeline
from dedup.streaming import (
    compact_reopen,
    current_clusters,
    current_docs,
    current_quarantine,
    current_state,
    dirty_conversations,
    stream_dedup,
)


def _dir_bytes(path: str) -> int:
    import os

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def _clusters_canonical(df):
    """Cluster structure as a set of frozensets (cluster ids themselves may
    differ — the min rule can rename when ingestion order differs)."""
    rows = df.collect()
    by_cluster: dict[str, set] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["conv_id"])
    return {frozenset(v) for v in by_cluster.values()}


def test_stream_matches_one_shot_pipeline(spark):
    cfg = DedupConfig(shuffle_partitions=8)
    full = gen_transcripts(spark, 240, seed=11, partitions=4).localCheckpoint()
    # conv-disjoint halves; dup families intentionally straddle the split
    half_a = full.filter(F.crc32(F.col("conv_id")) % 2 == 0)
    half_b = full.filter(F.crc32(F.col("conv_id")) % 2 == 1)

    tmp = tempfile.mkdtemp(prefix="stream_in_")
    stream_dir = tempfile.mkdtemp(prefix="stream_state_")

    # drain 1: only half A exists; small trigger forces >1 micro-batch so
    # bootstrap + incremental chaining both run inside one drain
    # partition BY conv_id: the input contract requires whole
    # conversations per file (streaming assigns whole files to batches)
    half_a.repartition(4, "conv_id").write.mode("append").parquet(tmp)
    stream_dedup(spark, tmp, stream_dir, cfg, max_files_per_trigger=2)
    cur1 = current_state(stream_dir)
    assert cur1 is not None and cur1["batch_id"] >= 1  # >= 2 micro-batches
    n_a = current_clusters(spark, stream_dir).count()
    assert n_a == half_a.select("conv_id").distinct().count()

    # drain 2: half B arrives as new files; checkpoint skips the old ones
    half_b.repartition(3, "conv_id").write.mode("append").parquet(tmp)
    stream_dedup(spark, tmp, stream_dir, cfg, max_files_per_trigger=2)
    streamed = current_clusters(spark, stream_dir)

    ref = run_pipeline(
        spark, full, cfg, tempfile.mkdtemp(prefix="stream_ref_"), "oneshot"
    )["clusters"]
    assert _clusters_canonical(streamed) == _clusters_canonical(ref)


def test_drain_part_cache_reused_and_released(spark, monkeypatch):
    """VERDICT r4 #2: a drain holds ONE PartCache — part scans are persisted
    on first read, reused across micro-batches (same DataFrame object per
    part directory), and the cache is released when the drain returns, so a
    long-lived session never accumulates drain-cache blocks. (The pipeline's
    own per-round localCheckpoint blocks stay pinned until GC by design, so
    the assertions target exactly what the cache created — not a global
    "no persistent RDDs" claim.)"""
    import dedup.streaming as streaming_mod
    from dedup.streaming import PartCache, _read_parts

    def persistent_ids(spark) -> set[int]:
        return {
            int(k) for k in spark.sparkContext._jsc.getPersistentRDDs().keySet()
        }

    # capture the cache stream_dedup builds for the drain
    captured: list[PartCache] = []
    real_init = PartCache.__init__

    def spy_init(self) -> None:
        real_init(self)
        captured.append(self)

    monkeypatch.setattr(streaming_mod.PartCache, "__init__", spy_init)

    cfg = DedupConfig(shuffle_partitions=8)
    corpus = gen_transcripts(
        spark, 80, seed=71, partitions=4, edge_rows=False
    ).localCheckpoint()
    tmp = tempfile.mkdtemp(prefix="stream_in_pc_")
    stream_dir = tempfile.mkdtemp(prefix="stream_state_pc_")
    corpus.repartition(4, "conv_id").write.mode("append").parquet(tmp)

    # 4 files, 1 per trigger: bootstrap + 3 incremental micro-batches all
    # share the drain's cache
    stream_dedup(spark, tmp, stream_dir, cfg, max_files_per_trigger=1)
    assert len(captured) == 1, "one drain = one PartCache"
    assert captured[0]._peak_size > 0, "the incremental batches must hit the cache"
    assert captured[0]._dfs == {}, "stream_dedup must release its drain cache"
    assert captured[0]._views == {}, "stream_dedup must release its state views"
    assert current_clusters(spark, stream_dir).count() == 80

    # unit-level reuse: same part dir -> same cached DataFrame object, and
    # release() unpersists exactly the blocks the cache created (baseline
    # taken AFTER the drain, so pipeline checkpoint blocks are excluded)
    manifest = current_state(stream_dir)
    base = persistent_ids(spark)
    cache = PartCache()
    a = _read_parts(spark, manifest["parts"]["docs"], cache=cache)
    b = _read_parts(spark, manifest["parts"]["docs"], cache=cache)
    assert a.count() == b.count() == 80
    assert len(cache._dfs) == len(manifest["parts"]["docs"])
    mid = persistent_ids(spark)
    assert mid - base, "cache.scan must persist the part scans"

    # flattened state views: same parts key -> same checkpointed object; a
    # NEW parts key (next batch's promotion) rebuilds and unpersists the
    # superseded view, so at most one copy per stage is ever held
    from dedup.streaming import _prior_state

    v1 = _prior_state(spark, manifest, cache=cache).clusters
    v2 = _prior_state(spark, manifest, cache=cache).clusters
    assert v1 is v2, "same parts key must memoize the clusters view"
    assert v1.count() == 80
    old_entry = cache._views["clusters"]
    grown = dict(manifest, parts=dict(manifest["parts"]))
    grown["parts"]["clusters"] = manifest["parts"]["clusters"] * 2  # new key
    v3 = _prior_state(spark, grown, cache=cache).clusters
    assert v3 is not v1, "a new parts key must rebuild the view"
    if old_entry[2] is not None:  # superseded view's blocks are freed
        assert old_entry[2] not in persistent_ids(spark)

    cache.release()
    assert persistent_ids(spark) - base == set()


def test_stream_promotion_is_delta_sized(spark):
    """Bytes written per micro-batch must scale with the batch, not the
    corpus (VERDICT r2 #2: the old promotion rewrote docs/features/
    exact_groups in full per batch)."""
    cfg = DedupConfig(shuffle_partitions=8)
    big = gen_transcripts(spark, 200, seed=31, partitions=4, edge_rows=False).localCheckpoint()
    small = gen_transcripts(spark, 1000, seed=32, partitions=2, edge_rows=False).filter(
        F.col("conv_id") >= "c00000980"  # 20 convs, ids disjoint from seed-31 text
    ).localCheckpoint()

    tmp = tempfile.mkdtemp(prefix="stream_in3_")
    stream_dir = tempfile.mkdtemp(prefix="stream_state3_")
    big.repartition(1, "conv_id").write.mode("append").parquet(tmp)
    stream_dedup(spark, tmp, stream_dir, cfg)
    m0 = current_state(stream_dir)
    base_parts = {s: [tuple(p) for p in m0["parts"][s]] for s in m0["parts"]}
    base_bytes = sum(
        _dir_bytes(d) for s in base_parts for d, _ in base_parts[s]
    )

    small.repartition(1, "conv_id").write.mode("append").parquet(tmp)
    stream_dedup(spark, tmp, stream_dir, cfg)
    m1 = current_state(stream_dir)
    delta_bytes = sum(
        _dir_bytes(d)
        for s in m1["parts"]
        for d, _ in ((tuple(p) for p in m1["parts"][s]))
        if (d, _) not in base_parts[s]
    )
    # 20 new convs over a 200-conv corpus: the promoted delta must be a
    # small fraction of the bootstrap state (the old O(corpus) promotion
    # rewrote >= 100% of it every batch)
    assert delta_bytes < 0.5 * base_bytes, (delta_bytes, base_bytes)
    # and the merged state is still complete
    assert current_clusters(spark, stream_dir).count() == 220


def test_stream_ambiguous_conversations_match_batch(spark):
    """ADVICE r2: ambiguous-turn-order conversations must be quarantined
    identically whether they arrive in the bootstrap batch or a later one,
    and the streamed cluster structure must equal the one-shot batch run."""
    cfg = DedupConfig(shuffle_partitions=8)
    full = gen_transcripts(spark, 160, seed=13, partitions=4, edge_rows=False).localCheckpoint()
    # plant duplicate (conv_id, turn_idx) rows in one conv per half
    amb_a, amb_b = "c00000002", "c00000003"  # crc parity puts them in opposite halves?
    half_a = full.filter(F.crc32(F.col("conv_id")) % 2 == 0)
    half_b = full.filter(F.crc32(F.col("conv_id")) % 2 == 1)
    amb_a = half_a.select("conv_id").distinct().orderBy("conv_id").head()["conv_id"]
    amb_b = half_b.select("conv_id").distinct().orderBy("conv_id").head()["conv_id"]
    dup_rows = full.filter(
        (F.col("conv_id").isin([amb_a, amb_b])) & (F.col("turn_idx") == 0)
    ).withColumn("text", F.lit("CONFLICTING ORDER"))
    half_a = half_a.unionByName(dup_rows.filter(F.col("conv_id") == amb_a))
    half_b = half_b.unionByName(dup_rows.filter(F.col("conv_id") == amb_b))

    tmp = tempfile.mkdtemp(prefix="stream_in4_")
    stream_dir = tempfile.mkdtemp(prefix="stream_state4_")
    half_a.repartition(2, "conv_id").write.mode("append").parquet(tmp)
    stream_dedup(spark, tmp, stream_dir, cfg)
    half_b.repartition(2, "conv_id").write.mode("append").parquet(tmp)
    stream_dedup(spark, tmp, stream_dir, cfg)

    streamed = current_clusters(spark, stream_dir)
    streamed_ids = {r["conv_id"] for r in streamed.select("conv_id").collect()}
    assert amb_a not in streamed_ids and amb_b not in streamed_ids
    q = current_quarantine(spark, stream_dir)
    q_ids = {r["conv_id"] for r in q.filter(F.col("reason") == "ambiguous_turn_order").collect()}
    assert {amb_a, amb_b} <= q_ids

    ref = run_pipeline(
        spark,
        half_a.unionByName(half_b),
        cfg,
        tempfile.mkdtemp(prefix="stream_ref4_"),
        "oneshot",
    )["clusters"]
    assert _clusters_canonical(streamed) == _clusters_canonical(ref)


def test_compact_reopen_straddling_conversation(spark):
    """A conversation whose turns straddle two drains is clustered on its
    first-seen prefix (the documented skip semantics); compact_reopen must
    restore exact equivalence with the one-shot batch run over the full
    input, touching only the affected clusters."""
    cfg = DedupConfig(shuffle_partitions=8)
    full = gen_transcripts(spark, 160, seed=17, partitions=4, edge_rows=False).localCheckpoint()
    straddle = F.crc32(F.col("conv_id")) % 5 == 0
    file_a = full.filter(~straddle | (F.col("turn_idx") < 2))
    file_b = full.filter(straddle & (F.col("turn_idx") >= 2))
    assert file_b.count() > 0

    tmp = tempfile.mkdtemp(prefix="stream_in5_")
    stream_dir = tempfile.mkdtemp(prefix="stream_state5_")
    file_a.repartition(2, "conv_id").write.mode("append").parquet(tmp)
    stream_dedup(spark, tmp, stream_dir, cfg)
    file_b.repartition(2, "conv_id").write.mode("append").parquet(tmp)
    stream_dedup(spark, tmp, stream_dir, cfg)  # late turns skipped (seen conv)

    n = compact_reopen(spark, tmp, stream_dir, cfg)
    assert n > 0
    ref = run_pipeline(
        spark, full, cfg, tempfile.mkdtemp(prefix="stream_ref5_"), "oneshot"
    )["clusters"]
    assert _clusters_canonical(current_clusters(spark, stream_dir)) == _clusters_canonical(ref)
    # idempotent: a second pass finds nothing to re-open
    assert compact_reopen(spark, tmp, stream_dir, cfg) == 0


def test_auto_compact_growing_conversation(spark):
    """stream_dedup(auto_compact=True) must reach one-shot batch
    equivalence for conversations straddling drains without any manual
    compact_reopen call, and must consume the dirty triggers."""
    cfg = DedupConfig(shuffle_partitions=8)
    full = gen_transcripts(spark, 160, seed=23, partitions=4, edge_rows=False).localCheckpoint()
    straddle = F.crc32(F.col("conv_id")) % 5 == 0
    file_a = full.filter(~straddle | (F.col("turn_idx") < 2))
    file_b = full.filter(straddle & (F.col("turn_idx") >= 2))
    assert file_b.count() > 0

    tmp = tempfile.mkdtemp(prefix="stream_in6_")
    stream_dir = tempfile.mkdtemp(prefix="stream_state6_")
    file_a.repartition(2, "conv_id").write.mode("append").parquet(tmp)
    stream_dedup(spark, tmp, stream_dir, cfg, auto_compact=True)
    file_b.repartition(2, "conv_id").write.mode("append").parquet(tmp)
    stream_dedup(spark, tmp, stream_dir, cfg, auto_compact=True)

    assert dirty_conversations(spark, stream_dir).count() == 0
    ref = run_pipeline(
        spark, full, cfg, tempfile.mkdtemp(prefix="stream_ref6_"), "oneshot"
    )["clusters"]
    assert _clusters_canonical(current_clusters(spark, stream_dir)) == _clusters_canonical(ref)


def test_auto_compact_grown_quarantined_conversation(spark):
    """Late turns for a QUARANTINED conversation must not supersede its
    promoted document with a suffix-only reassembly: the seen-skip covers
    quarantined convs too, and auto-compact re-ingests the full turn set
    (still ambiguous here, so it stays quarantined — matching batch)."""
    cfg = DedupConfig(shuffle_partitions=8)
    full = gen_transcripts(spark, 160, seed=29, partitions=4, edge_rows=False).localCheckpoint()
    amb = full.select("conv_id").distinct().orderBy("conv_id").head()["conv_id"]
    dup_rows = full.filter(
        (F.col("conv_id") == amb) & (F.col("turn_idx") == 0)
    ).withColumn("text", F.lit("CONFLICTING ORDER"))
    # drain 1: everything except amb's tail turns, plus the conflicting row
    file_a = full.filter(
        (F.col("conv_id") != amb) | (F.col("turn_idx") < 2)
    ).unionByName(dup_rows)
    file_b = full.filter((F.col("conv_id") == amb) & (F.col("turn_idx") >= 2))
    assert file_b.count() > 0

    tmp = tempfile.mkdtemp(prefix="stream_in7_")
    stream_dir = tempfile.mkdtemp(prefix="stream_state7_")
    file_a.repartition(2, "conv_id").write.mode("append").parquet(tmp)
    stream_dedup(spark, tmp, stream_dir, cfg, auto_compact=True)
    file_b.repartition(1, "conv_id").write.mode("append").parquet(tmp)
    stream_dedup(spark, tmp, stream_dir, cfg, auto_compact=True)

    # still quarantined (the duplicate turn_idx is unresolvable by growth),
    # never clustered, and the dirty trigger was consumed
    streamed_ids = {
        r["conv_id"]
        for r in current_clusters(spark, stream_dir).select("conv_id").collect()
    }
    assert amb not in streamed_ids
    q_ids = {
        r["conv_id"]
        for r in current_quarantine(spark, stream_dir)
        .filter(F.col("reason") == "ambiguous_turn_order")
        .collect()
    }
    assert amb in q_ids
    assert dirty_conversations(spark, stream_dir).count() == 0

    # the promoted doc row must reflect the FULL turn set (latest-wins over
    # the drain-1 prefix row), still flagged ambiguous
    doc = current_docs(spark, stream_dir).filter(F.col("conv_id") == amb).head()
    n_full = full.filter(F.col("conv_id") == amb).count() + dup_rows.count()
    assert doc["n_turns"] == n_full and doc["ambiguous"]

    ref = run_pipeline(
        spark,
        full.unionByName(dup_rows),
        cfg,
        tempfile.mkdtemp(prefix="stream_ref7_"),
        "oneshot",
    )["clusters"]
    assert _clusters_canonical(current_clusters(spark, stream_dir)) == _clusters_canonical(ref)


def test_compact_dirty_scope_redelivery_is_cheap(spark):
    """Pure redelivery marks conversations dirty but the scoped compaction
    finds no content change: 0 re-opened, dirty list cleared, clusters
    untouched."""
    cfg = DedupConfig(shuffle_partitions=8)
    corpus = gen_transcripts(spark, 120, seed=37, partitions=3, edge_rows=False).localCheckpoint()
    tmp = tempfile.mkdtemp(prefix="stream_in8_")
    stream_dir = tempfile.mkdtemp(prefix="stream_state8_")

    corpus.write.mode("append").parquet(tmp)
    stream_dedup(spark, tmp, stream_dir, cfg)
    assert compact_reopen(spark, tmp, stream_dir, cfg, scope="dirty") == 0  # no dirty parts at all
    before = _clusters_canonical(current_clusters(spark, stream_dir))

    corpus.repartition(2, "conv_id").write.mode("append").parquet(tmp)
    stream_dedup(spark, tmp, stream_dir, cfg)
    assert dirty_conversations(spark, stream_dir).count() == 120
    assert compact_reopen(spark, tmp, stream_dir, cfg, scope="dirty") == 0
    assert dirty_conversations(spark, stream_dir).count() == 0
    assert _clusters_canonical(current_clusters(spark, stream_dir)) == before


def test_fold_bounds_parts_and_preserves_views(spark):
    """VERDICT r3 #2: the manifest's per-stage part lists must stay bounded
    across many drains (fold past the threshold), and folding must leave
    every reader view byte-identical."""
    from dedup.streaming import current_state as cs, fold_parts, process_batch

    cfg = DedupConfig(shuffle_partitions=8)
    pool = (
        gen_transcripts(spark, 1000, seed=47, partitions=2, edge_rows=False)
        .filter(F.col("conv_id") >= "c00000900")
        .localCheckpoint()
    )
    stream_dir = tempfile.mkdtemp(prefix="fold_state_")
    process_batch(
        spark,
        pool.filter(F.col("conv_id") < "c00000920"),
        0,
        stream_dir,
        cfg,
        fold_threshold=3,
    )
    for i, lo in enumerate(range(920, 960, 5), start=1):
        b = pool.filter(
            (F.col("conv_id") >= f"c{lo:08d}") & (F.col("conv_id") < f"c{lo + 5:08d}")
        )
        process_batch(spark, b, i, stream_dir, cfg, fold_threshold=3)
        m = cs(stream_dir)
        over = {s: len(p) for s, p in m["parts"].items() if len(p) > 3}
        assert not over, over

    def snap():
        cl = sorted(map(tuple, current_clusters(spark, stream_dir).collect()))
        dc = sorted(
            map(
                tuple,
                current_docs(spark, stream_dir)
                .select("conv_id", "doc_text", "n_turns", "ambiguous")
                .collect(),
            )
        )
        qr = sorted(map(tuple, current_quarantine(spark, stream_dir).collect()))
        return cl, dc, qr

    before = snap()
    folded = fold_parts(spark, stream_dir, threshold=1)
    assert folded, "nothing folded at threshold 1"
    m = cs(stream_dir)
    assert all(len(p) == 1 for p in m["parts"].values() if p), m["parts"]
    assert snap() == before
    assert current_clusters(spark, stream_dir).count() == 60


def test_fold_preserves_tombstones_after_reopen(spark):
    """Folding applies cluster and exact-index tombstones terminally: a
    conversation whose compaction re-opened it must not resurrect, and a
    superseded content hash must not keep a second index row."""
    from dedup.streaming import _prior_state, current_state as cs, fold_parts

    cfg = DedupConfig(shuffle_partitions=8)
    full = gen_transcripts(spark, 160, seed=17, partitions=4, edge_rows=False).localCheckpoint()
    straddle = F.crc32(F.col("conv_id")) % 5 == 0
    file_a = full.filter(~straddle | (F.col("turn_idx") < 2))
    file_b = full.filter(straddle & (F.col("turn_idx") >= 2))

    tmp = tempfile.mkdtemp(prefix="fold_in2_")
    stream_dir = tempfile.mkdtemp(prefix="fold_state2_")
    file_a.repartition(2, "conv_id").write.mode("append").parquet(tmp)
    stream_dedup(spark, tmp, stream_dir, cfg)
    file_b.repartition(2, "conv_id").write.mode("append").parquet(tmp)
    stream_dedup(spark, tmp, stream_dir, cfg)
    assert compact_reopen(spark, tmp, stream_dir, cfg) > 0

    grown = sorted(
        r["conv_id"]
        for r in file_b.select("conv_id").distinct().collect()
    )
    x = grown[0]
    before = _clusters_canonical(current_clusters(spark, stream_dir))
    fold_parts(spark, stream_dir, threshold=1)
    assert _clusters_canonical(current_clusters(spark, stream_dir)) == before
    # exactly one live exact-index row points at the re-opened conv: its
    # pre-growth hash was tombstoned, its post-growth hash re-asserted
    ei = _prior_state(spark, cs(stream_dir)).exact_index
    assert ei.filter(F.col("exact_rep") == x).count() == 1


def test_gc_parts_frees_unreferenced_dirs(spark):
    """gc_parts removes fold-superseded parts and unpromoted merge
    intermediates, leaves every referenced part intact (views identical),
    and the stream keeps working afterwards."""
    from dedup.streaming import fold_parts, gc_parts, process_batch

    cfg = DedupConfig(shuffle_partitions=8)
    pool = (
        gen_transcripts(spark, 1000, seed=53, partitions=2, edge_rows=False)
        .filter(F.col("conv_id") >= "c00000950")
        .localCheckpoint()
    )
    stream_dir = tempfile.mkdtemp(prefix="gc_state_")
    process_batch(spark, pool.filter(F.col("conv_id") < "c00000970"), 0, stream_dir, cfg)
    for i, lo in enumerate(range(970, 990, 5), start=1):
        b = pool.filter(
            (F.col("conv_id") >= f"c{lo:08d}") & (F.col("conv_id") < f"c{lo + 5:08d}")
        )
        process_batch(spark, b, i, stream_dir, cfg)
    fold_parts(spark, stream_dir, threshold=1)  # supersede all delta parts

    before = _clusters_canonical(current_clusters(spark, stream_dir))
    freed = gc_parts(stream_dir)
    assert freed > 0
    assert _clusters_canonical(current_clusters(spark, stream_dir)) == before
    assert current_docs(spark, stream_dir).count() == 40
    # idempotent, and the stream still accepts new batches afterwards
    assert gc_parts(stream_dir) == 0
    b = pool.filter(F.col("conv_id") >= "c00000990")
    process_batch(spark, b, 99, stream_dir, cfg)
    assert current_clusters(spark, stream_dir).count() == 50


def test_stream_config_binding_in_manifest(spark):
    """ADVICE r3 (medium): the manifest itself records the bootstrap config
    fingerprint; a direct process_batch / compact_reopen under a different
    config must be refused — not just the CLI path."""
    import pytest

    from dedup.streaming import process_batch

    cfg_a = DedupConfig(shuffle_partitions=8)
    cfg_b = DedupConfig(shuffle_partitions=8, num_perm=64, lsh_bands=16)
    corpus = gen_transcripts(spark, 40, seed=41, partitions=2, edge_rows=False).localCheckpoint()
    tmp = tempfile.mkdtemp(prefix="stream_in9_")
    stream_dir = tempfile.mkdtemp(prefix="stream_state9_")
    corpus.write.mode("append").parquet(tmp)
    stream_dedup(spark, tmp, stream_dir, cfg_a)

    with pytest.raises(ValueError, match="config-bound"):
        process_batch(spark, corpus, 99, stream_dir, cfg_b)
    with pytest.raises(ValueError, match="config-bound"):
        compact_reopen(spark, tmp, stream_dir, cfg_b)
    # original config still works
    assert current_clusters(spark, stream_dir).count() == 40

    # the stream_dedup entry point itself must refuse too (VERDICT r4 #6):
    # the drain surfaces the foreachBatch refusal via awaitTermination, and
    # the failed micro-batch's offset stays uncommitted, so the original
    # config can still drain the same file afterwards
    more = (
        gen_transcripts(spark, 60, seed=41, partitions=2, edge_rows=False)
        .filter(F.col("conv_id") >= "c00000040")
        .localCheckpoint()
    )
    more.coalesce(1).write.mode("append").parquet(tmp)
    with pytest.raises(Exception, match="config-bound"):
        stream_dedup(spark, tmp, stream_dir, cfg_b)
    stream_dedup(spark, tmp, stream_dir, cfg_a)
    after = current_clusters(spark, stream_dir)
    assert after.filter(F.col("conv_id") >= "c00000040").count() > 0
    assert after.count() >= 40


def test_compact_preserves_intra_file_duplicate_quarantine(spark):
    """ADVICE r3: a byte-identical duplicate (conv_id, turn_idx) row WITHIN
    one input file is W2 data ambiguity (batch and micro-batch quarantine
    it); compaction must not collapse it into a clean conversation and
    re-cluster — only cross-file redelivery duplicates may collapse."""
    cfg = DedupConfig(shuffle_partitions=8)
    corpus = gen_transcripts(spark, 60, seed=43, partitions=2, edge_rows=False).localCheckpoint()
    amb = corpus.select("conv_id").distinct().orderBy("conv_id").head()["conv_id"]
    dup_row = corpus.filter((F.col("conv_id") == amb) & (F.col("turn_idx") == 0))
    with_dup = corpus.unionByName(dup_row)

    tmp = tempfile.mkdtemp(prefix="stream_in10_")
    stream_dir = tempfile.mkdtemp(prefix="stream_state10_")
    with_dup.coalesce(1).write.mode("append").parquet(tmp)  # one file
    stream_dedup(spark, tmp, stream_dir, cfg)
    q_ids = {
        r["conv_id"]
        for r in current_quarantine(spark, stream_dir)
        .filter(F.col("reason") == "ambiguous_turn_order")
        .collect()
    }
    assert amb in q_ids

    # redeliver everything (marks all convs dirty); the duplicate row is
    # present twice in EACH file, so max-per-file multiplicity keeps it —
    # nothing actually changed, so the scoped compaction re-opens nothing
    with_dup.coalesce(1).write.mode("append").parquet(tmp)
    stream_dedup(spark, tmp, stream_dir, cfg)
    assert compact_reopen(spark, tmp, stream_dir, cfg, scope="dirty") == 0
    clustered = {
        r["conv_id"]
        for r in current_clusters(spark, stream_dir).select("conv_id").collect()
    }
    assert amb not in clustered
    assert clustered == {
        r["conv_id"]
        for r in corpus.select("conv_id").distinct().collect()
    } - {amb}


def test_stream_idempotent_redelivery(spark):
    """Re-delivering already-seen conversations (duplicate files) must not
    change the clustering — the reference's per-event 'seen' semantics."""
    cfg = DedupConfig(shuffle_partitions=8)
    corpus = gen_transcripts(spark, 120, seed=5, partitions=3).localCheckpoint()
    tmp = tempfile.mkdtemp(prefix="stream_in2_")
    stream_dir = tempfile.mkdtemp(prefix="stream_state2_")

    corpus.write.mode("append").parquet(tmp)
    stream_dedup(spark, tmp, stream_dir, cfg)
    before = _clusters_canonical(current_clusters(spark, stream_dir))

    corpus.repartition(2, "conv_id").write.mode("append").parquet(tmp)  # same convs again
    stream_dedup(spark, tmp, stream_dir, cfg)
    after = _clusters_canonical(current_clusters(spark, stream_dir))
    assert before == after


def test_stream_interval_join_arrival_order_independent(spark):
    """q57's stream-stream interval join must emit the same pair set
    whether the corpus arrives as one micro-batch or file-by-file in
    maxFilesPerTrigger=1 drains (the symmetric hash join buffers each
    side's unmatched rows until the watermark passes, so late-arriving
    partners still pair up)."""
    import tempfile

    from dedup.queries import stream_interval_join

    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    staged = tempfile.mkdtemp(prefix="sij_in_")
    # 5 files, hash-scattered so purchases and their views usually land in
    # DIFFERENT files (the adversarial arrival order)
    src.repartition(5, "event_id").write.mode("overwrite").parquet(staged)

    batch = {
        tuple(r)
        for r in spark.sql(
            """
            SELECT CAST(p.event_id AS LONG), CAST(v.event_id AS LONG)
            FROM {e} p JOIN {e} v
              ON p.user_id = v.user_id
             AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts <= p.ts
            WHERE p.event_type = 'purchase' AND v.event_type = 'view'
            """,
            e=src,
        ).collect()
    }
    assert batch, "fixture must produce at least one interval match"

    one_shot = {
        (r["p_id"], r["v_id"])
        for r in stream_interval_join(spark, staged).collect()
    }
    dribbled = {
        (r["p_id"], r["v_id"])
        for r in stream_interval_join(
            spark, staged, max_files_per_trigger=1
        ).collect()
    }
    assert one_shot == batch
    assert dribbled == batch
