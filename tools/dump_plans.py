"""Dump formatted physical plans for the key operators → BENCH/PLANS.md.

Evidence that the declarative pipeline gets the plans it should: parquet
scans show ReadSchema pruning + PushedFilters, candidate generation is one
Exchange + one Sort + Window, verification joins are semi-join-reduced,
whole-stage codegen spans cover the JVM paths.

Usage: PYTHONPATH=/root/repo python tools/dump_plans.py
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

from dedup.candidates import index_join_pairs, unified_candidates, unified_key_table
from dedup.config import DedupConfig
from dedup.io import documents_as_transcripts
from dedup.normalize import normalize_text
from dedup.reassemble import reassemble
from dedup.features import featurize
from dedup.session import build_session
from dedup.verify import verify_jaccard

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    cfg = DedupConfig(shuffle_partitions=8)
    spark = build_session(master="local[4]", config=cfg)
    turns = documents_as_transcripts(spark, SF)
    docs = reassemble(turns).withColumn("norm_text", normalize_text("doc_text"))
    feats = featurize(docs, cfg)
    cands = unified_candidates(feats, cfg)
    verified = verify_jaccard(cands.select("a", "b"), feats, cfg)

    # incremental hot path: batch keys vs the persisted candidate index —
    # must be a broadcast hash join streaming the index (no SortMergeJoin,
    # no Exchange on the index side)
    new_keys = unified_key_table(feats.limit(20), cfg)
    index = unified_key_table(feats, cfg)
    idx_pairs = index_join_pairs(new_keys, index, cfg)

    from dedup.queries import QUERIES

    decontam = QUERIES["q31_benchmark_decontamination"](spark, SF)
    repsig = QUERIES["q32_docs_repetition_signals"](spark, SF)
    dupseg = QUERIES["q33_docs_duplicated_segments"](spark, SF)
    containment = QUERIES["q38_docs_containment_pairs"](spark, SF)
    rollup = QUERIES["q39_revenue_rollup"](spark, SF)
    split = QUERIES["q37_docs_split_assignment"](spark, SF)
    asof = QUERIES["q40_events_asof_join"](spark, SF)
    pivot = QUERIES["q41_events_user_pivot"](spark, SF)
    funnel = QUERIES["q43_events_funnel"](spark, SF)
    topterms = QUERIES["q44_docs_top_terms"](spark, SF)
    novelty = QUERIES["q51_docs_novelty"](spark, SF)
    overlap = QUERIES["q52_cross_source_overlap"](spark, SF)
    trailing = QUERIES["q53_events_trailing_24h"](spark, SF)
    cube = QUERIES["q54_docs_cube"](spark, SF)
    kmv = QUERIES["q56_source_distinct_kmv"](spark, SF)
    sizehist = QUERIES["q58_cluster_size_histogram"](spark, SF)
    dupflow = QUERIES["q59_cross_source_dup_flow"](spark, SF)
    mixture = QUERIES["q60_curation_mixture"](spark, SF)
    quality = QUERIES["q61_docs_quality_gate"](spark, SF)
    packing = QUERIES["q62_docs_sequence_packing"](spark, SF)
    bloomdec = QUERIES["q63_bloom_decontamination"](spark, SF)
    mixweights = QUERIES["q64_source_mixture_weights"](spark, SF)
    unimax = QUERIES["q66_unimax_source_budgets"](spark, SF)
    vocab = QUERIES["q67_docs_vocab_coverage"](spark, SF)
    dispersion = QUERIES["q68_embedding_dispersion"](spark, SF)
    trend = QUERIES["q69_events_type_trend"](spark, SF)
    severity = QUERIES["q70_contamination_severity"](spark, SF)
    selfinfo = QUERIES["q71_docs_self_information"](spark, SF)
    cohort = QUERIES["q72_events_cohort_retention"](spark, SF)
    debounce = QUERIES["q73_events_debounce"](spark, SF)
    ksdrift = QUERIES["q74_source_length_drift"](spark, SF)
    deciles = QUERIES["q75_docs_length_deciles"](spark, SF)
    outliers = QUERIES["q77_events_robust_outliers"](spark, SF)
    cohesion = QUERIES["q78_cluster_cohesion"](spark, SF)
    sweep = QUERIES["q79_threshold_sweep"](spark, SF)
    benford = QUERIES["q80_events_benford"](spark, SF)
    twohop = QUERIES["q81_dup_graph_two_hop"](spark, SF)
    survival = QUERIES["q82_purchase_survival"](spark, SF)
    prefix = QUERIES["q83_shared_prefix_groups"](spark, SF)
    pagerank = QUERIES["q84_dup_pagerank"](spark, SF)
    shards = QUERIES["q85_cluster_shard_balance"](spark, SF)
    savings = QUERIES["q86_dedup_bytes_saved"](spark, SF)
    audit = QUERIES["q87_reassembly_roundtrip_audit"](spark, SF)
    budget = QUERIES["q88_token_budget_selection"](spark, SF)
    srcspan = QUERIES["q89_cluster_source_span"](spark, SF)
    spectrum = QUERIES["q90_token_frequency_spectrum"](spark, SF)
    sharedturn = QUERIES["q91_shared_turn_content"](spark, SF)
    dailynov = QUERIES["q92_daily_novelty"](spark, SF)
    gaphist = QUERIES["q93_inter_event_gap_histogram"](spark, SF)
    gini = QUERIES["q94_user_activity_gini"](spark, SF)
    affinity = QUERIES["q95_event_type_affinity"](spark, SF)
    vocabjac = QUERIES["q97_source_vocab_overlap"](spark, SF)
    heatmap = QUERIES["q98_weekday_hour_heatmap"](spark, SF)
    bottleneck = QUERIES["q99_bottleneck_suppliers"](spark, SF)
    wow = QUERIES["q100_weekly_type_growth"](spark, SF)
    marginals = QUERIES["q101_corpus_marginals"](spark, SF)
    simpson = QUERIES["q102_user_simpson_diversity"](spark, SF)
    spikes = QUERIES["q103_day_volume_spikes"](spark, SF)
    attribution = QUERIES["q104_view_purchase_pairs"](spark, SF)
    notexists = QUERIES["q105_strict_big_spenders"](spark, SF)
    firsttouch = QUERIES["q107_first_touch_attribution"](spark, SF)
    churn = QUERIES["q110_behavior_churn"](spark, SF)
    meltstats = QUERIES["q111_source_stats_long"](spark, SF)
    gapfill = QUERIES["q112_hourly_purchase_gapfill"](spark, SF)
    dominant = QUERIES["q113_dominant_user_type"](spark, SF)
    bitmap = QUERIES["q114_active_days_bitmap"](spark, SF)
    sentences = QUERIES["q115_sentence_profile"](spark, SF)
    streaks = QUERIES["q118_longest_active_streak"](spark, SF)
    lorenz = QUERIES["q119_day_value_lorenz"](spark, SF)
    signatures = QUERIES["q120_behavior_signatures"](spark, SF)
    minmax = QUERIES["q121_minmax_scaled_values"](spark, SF)
    contingency = QUERIES["q123_lang_source_deviation"](spark, SF)
    orphans = QUERIES["q125_referential_orphan_census"](spark, SF)
    setdrift = QUERIES["q126_behavior_set_drift"](spark, SF)
    grid2d = QUERIES["q129_lang_source_grid"](spark, SF)
    recency = QUERIES["q130_time_since_last_purchase"](spark, SF)
    reach = QUERIES["q132_cumulative_user_reach"](spark, SF)
    scalarsub = QUERIES["q137_small_quantity_revenue"](spark, SF)
    dormant = QUERIES["q140_dormant_high_balance"](spark, SF)
    colloc = QUERIES["q142_bigram_collocations"](spark, SF)
    sweep = QUERIES["q143_order_concurrency"](spark, SF)
    profit = QUERIES["q147_nation_year_profit"](spark, SF)
    important = QUERIES["q148_important_parts"](spark, SF)
    census = QUERIES["q151_supplier_census"](spark, SF)
    localvol = QUERIES["q152_local_supplier_volume"](spark, SF)
    returned = QUERIES["q153_returned_item_customers"](spark, SF)
    excess = QUERIES["q156_excess_share_suppliers"](spark, SF)
    mincost = QUERIES["q157_min_cost_supplier"](spark, SF)

    sections = [
        ("docs: validate + reassemble + normalize (one aggregation)", docs),
        ("features: fused mapInPandas (ArrowEvalPython once)", feats),
        (
            "candidates: bands+chunks+suffix fps in one scan/explode → ONE "
            "Exchange + Sort + Window pair-gen",
            cands,
        ),
        ("verify_jaccard: semi-join-reduced attach + JVM array ops", verified),
        (
            "incremental index join: broadcast batch keys × streamed index "
            "scan (O(delta) merge hot path — no index-side Exchange)",
            idx_pairs,
        ),
        (
            "q31 decontamination: benchmark grams broadcast, corpus side "
            "map-only scan + LeftSemi (no corpus-sized shuffle)",
            decontam,
        ),
        (
            "q32 repetition signals: wordcount shape — explode → "
            "partial-agg groupBy(doc_id, gram) → per-doc window, all JVM",
            repsig,
        ),
        (
            "q33 duplicated segments: segment-hash wordcount + min/max "
            "cross-doc flag, equi-join back on the 8-byte hash (no "
            "count-distinct, no cross join)",
            dupseg,
        ),
        (
            "q38 containment: shingle-hash equi-join IS the intersection "
            "count (df-capped buckets, PPJoin-style prune; no cross join)",
            containment,
        ),
        (
            "q39 rollup: one Expand + single shuffle serving all three "
            "grouping levels",
            rollup,
        ),
        (
            "q37 split assignment: stateless narrow projection — zero "
            "Exchange, zero Python (md5 buckets in codegen)",
            split,
        ),
        (
            "q40 as-of join: union-and-carry — ONE Exchange on user_id + "
            "one Sort + running last_value window (no range join, no "
            "O(n·m) candidate blowup)",
            asof,
        ),
        (
            "q41 pivot: single partial-aggregated groupBy(user_id) — the "
            "pinned pivot folds to conditional aggregates in one exchange",
            pivot,
        ),
        (
            "q43 funnel: one groupBy(user_id) of conditional mins + 1-row "
            "global agg + stack() — no self-joins, no second scan",
            funnel,
        ),
        (
            "q44 top terms: wordcount tf + count-window df over the same "
            "aggregate (no df self-join) + per-doc top-k — 3 exchanges "
            "total, all JVM",
            topterms,
        ),
        (
            "q51 novelty: distinct gram hashes → min-first-occurrence agg "
            "→ per-doc rollup — 2 exchanges, broadcast joins back, all JVM",
            novelty,
        ),
        (
            "q52 cross-source overlap: ONE groupBy(gram_hash) + JVM-side "
            "source-set pair expansion (no gram-table self-join); totals "
            "attached via 2 broadcast hash joins",
            overlap,
        ),
        (
            "q53 trailing 24h: ONE Exchange on user_id + Sort + RangeFrame "
            "window (streaming two-pointer; no interval self-join)",
            trailing,
        ),
        (
            "q54 cube: one Expand (x4 grouping sets) + ONE "
            "partial-aggregated exchange",
            cube,
        ),
        (
            "q56 KMV sketch: distinct partial-agg + salted k-min window + "
            "tiny source-keyed merge — 3 exchanges, zero joins, zero Python",
            kmv,
        ),
        (
            "q58 cluster-size histogram: groupBy(cluster_id) count + "
            "bit-length bucket agg on top of the flagship clustering — "
            "two small exchanges past the pipeline's own cost",
            sizehist,
        ),
        (
            "q59 cross-source dup flow: verified pairs + exact edges, each "
            "endpoint equi-joined to its source label (pair side is the "
            "small side — AQE broadcasts), tiny S²×2 matrix agg",
            dupflow,
        ),
        (
            "q60 curation mixture: q35 tiers + norm-window representative "
            "election + one (source, tier) partial agg; corpus-wide kept "
            "total rides a 1-row BroadcastNestedLoopJoin",
            mixture,
        ),
        (
            "q61 quality gate: single narrow zero-Exchange projection — "
            "all rule bits codegen'd string/integer arithmetic",
            quality,
        ),
        (
            "q62 sequence packing: ONE Exchange on source feeding the "
            "cumulative-offset window AND the (source, seq_id) agg "
            "(HashPartitioning(source) satisfies the agg clustering)",
            packing,
        ),
        (
            "q63 bloom decontamination: corpus grams filtered by the "
            "literal bloom word array (shiftleft bit probes in codegen) "
            "BEFORE the broadcast exact-verify semi-join",
            bloomdec,
        ),
        (
            "q64 mixture weights: one partial-agg exchange on source + "
            "1-row broadcast totals (integer-sqrt fixed-point weights in "
            "codegen)",
            mixweights,
        ),
        (
            "q66 UniMax budgets: one corpus agg exchange + ONE "
            "single-partition exchange under a stack of same-partitioning "
            "windows (rank/prefix/first-fail/P_k) — no joins, one scan",
            unimax,
        ),
        (
            "q67 vocab coverage: wordcount agg + 16-row window, vocab "
            "BROADCAST back into the per-doc OOV rollup (no shuffled "
            "token join)",
            vocab,
        ),
        (
            "q68 embedding dispersion: centroid identity — posexplode → "
            "(label, dim) partial agg → label rollup; the only join is "
            "the broadcast stitch of two ≤|labels|-row aggregates",
            dispersion,
        ),
        (
            "q69 OLS trend: ONE partial-agg exchange on event_type, "
            "sufficient statistics in codegen, no window/join",
            trend,
        ),
        (
            "q70 PaLM severity: benchmark 8-gram hashes broadcast into "
            "the occurrence scan (q31 shape), per-doc rollup + verdict",
            severity,
        ),
        (
            "q71 self-information: wordcount shape — (doc, tok) agg, "
            "token-frequency re-agg, shuffled equi-join back on tok, "
            "1-row broadcast total; floor-log2 via bin() in codegen",
            selfinfo,
        ),
        (
            "q72 cohort retention: distinct (user, week) partial agg → "
            "min-window on user → dimension-sized matrix rollup — 3 "
            "reducing exchanges, zero joins",
            cohort,
        ),
        (
            "q73 debounce: ONE Exchange on user_id + (user, type) sort + "
            "lag window + codegen'd gap filter — no joins, one scan",
            debounce,
        ),
        (
            "q74 KS drift: (source, length) histogram localCheckpointed "
            "(corpus scanned once); CDF grid + windows run on the "
            "dimension-sized checkpoint with broadcast joins only",
            ksdrift,
        ),
        (
            "q75 distributed NTILE: histogram offsets broadcast + "
            "row_number window partitioned by n_chars (never a "
            "SinglePartition sort over corpus rows) + exact closed-form "
            "tile arithmetic in codegen",
            deciles,
        ),
        (
            "q77 median/MAD outliers: per-type exact percentiles, stats "
            "re-attached via BROADCAST joins; three pushed-down 2-column "
            "scans, no corpus-sized shuffle beyond the partial aggs",
            outliers,
        ),
        (
            "q78 cluster cohesion: verified pairs + cluster map joined "
            "(pair side small — AQE broadcasts), per-cluster rollup on "
            "the reduced relation",
            cohesion,
        ),
        (
            "q79 threshold sweep: ONE pass over verified pairs — each "
            "threshold a conditional aggregate column, no per-threshold "
            "re-scan",
            sweep,
        ),
        (
            "q80 benford: first-digit extraction in codegen + one "
            "9-row-per-type partial agg; expected-law join is broadcast",
            benford,
        ),
        (
            "q81 two-hop: adjacency localCheckpointed off the pair "
            "relation (≪ corpus), ONE self-join + distinct union "
            "collapsing map-side, degree/ball stitched by equi-join on "
            "the node key",
            twohop,
        ),
        (
            "q82 survival table: ONE corpus exchange (per-user min aggs); "
            "day-grid histogram + reverse-cumsum windows all run on the "
            "observation-span-sized relation",
            survival,
        ),
        (
            "q83 shared prefixes: ONE Exchange on the conversation key "
            "(sorted-struct prefix + count in the same agg), second "
            "groupBy on one row per conversation",
            prefix,
        ),
        (
            "q84 PageRank: static 3-step unrolled DAG — each step one "
            "equi-join of the node-sized rank relation against the "
            "checkpointed edge list + one partial-aggregated groupBy; "
            "all integer fixed-point in codegen",
            pagerank,
        ),
        (
            "q85 shard balance: cluster-sized aggregate under a "
            "row_number window + 8-row shard rollup; corpus touched only "
            "by the flagship pipeline itself",
            shards,
        ),
        (
            "q86 dedup savings: cluster map equi-joined to 3-column "
            "pruned document metadata, ONE partial-agg exchange on the "
            "low-cardinality source key",
            savings,
        ),
        (
            "q87 roundtrip audit: each side is one Exchange(user_id) "
            "(window vs sorted-struct agg); AQE broadcasts the smaller "
            "side here — at scale the (user_id, pos) join reuses "
            "HashPartitioning(user_id) (subset-key clustering), so no "
            "third shuffle either way",
            audit,
        ),
        (
            "q88 token budget: PARTITIONED cumulative-sum window (one "
            "Exchange on source, no global sort) + per-source rollup on "
            "the same partitioning",
            budget,
        ),
        (
            "q89 source span: cluster map joined to 2-column pruned doc "
            "metadata, per-cluster partial agg, ≤n_sources-row histogram",
            srcspan,
        ),
        (
            "q90 token spectrum: two-round distributed wordcount — token "
            "exchange then a ≤64-row bucket exchange, no joins, no Python",
            spectrum,
        ),
        (
            "q91 shared turns: Expand + payload-keyed partial aggregation "
            "(two count-distincts in one pass), post-agg ≥5-users filter",
            sharedturn,
        ),
        (
            "q92 daily novelty: distinct(day, payload) partial-agg, "
            "min-day per payload, two day-keyed rollups stitched by a "
            "BROADCAST join on the observation-span-sized day relation",
            dailynov,
        ),
        (
            "q93 gap histogram: ONE Exchange(user_id) for the lag window, "
            "BIGINT bin-length bucketing in codegen, ≤64-row histogram",
            gaphist,
        ),
        (
            "q94 Gini: ONE partial-agg Exchange(user_id); rank window + "
            "1-row rollup on the users relation; one final division",
            gini,
        ),
        (
            "q95 type affinity: corpus consumed once into checkpointed "
            "per-user sets; JVM triangular pair expansion (no self-join); "
            "marginals/user-count BROADCAST",
            affinity,
        ),
        (
            "q97 vocab overlap: ONE corpus exchange → checkpointed "
            "token→sources sets; triangular expansion, BROADCAST marginals",
            vocabjac,
        ),
        (
            "q98 weekday×hour heatmap: integer div/mod in codegen, ONE "
            "partial-agg exchange over ≤168 keys",
            heatmap,
        ),
        (
            "q99 bottleneck suppliers: lineitem → (order, supplier) "
            "partial agg, shared Exchange(l_orderkey) window passes, "
            "BROADCAST name join",
            bottleneck,
        ),
        (
            "q100 WoW growth: ONE corpus exchange to (type, week); lag "
            "window on the weeks relation",
            wow,
        ),
        (
            "q101 grouping sets: one Expand (×2) + ONE partial-agg "
            "exchange for both axis margins",
            marginals,
        ),
        (
            "q102 Simpson diversity: (user, type) partial agg → user agg "
            "over the reduced relation; integer sufficient stats",
            simpson,
        ),
        (
            "q103 day spikes: day totals at ONE corpus exchange; 1-row "
            "exact median broadcast back",
            spikes,
        ),
        (
            "q104 interval attribution: EQUI-join on user_id carrying the "
            "range predicate as a filter — never cartesian",
            attribution,
        ),
        (
            "q105 spark.sql NOT EXISTS: Catalyst decorrelates to an anti "
            "join; threshold predicate PUSHED to the inner scan",
            notexists,
        ),
        (
            "q107 first touch: ONE Exchange(user_id) window; purchaser "
            "SEMI join on the reduced first-event relation",
            firsttouch,
        ),
        (
            "q110 EXCEPT ALL churn: count-compare aggregation on ONE "
            "(user, type) exchange — bag semantics without a join",
            churn,
        ),
        (
            "q111 melt: Expand over the sources-sized wide relation — "
            "unpivot adds zero corpus shuffles",
            meltstats,
        ),
        (
            "q112 gap fill: sequence() spine off a 1-row aggregate, "
            "BROADCAST join to hourly counts",
            gapfill,
        ),
        (
            "q113 max_by dominant type: two reducing exchanges, composite "
            "string tie-break evaluated in codegen",
            dominant,
        ),
        (
            "q114 day bitmap: bit_or combines map-side at ONE user-keyed "
            "exchange; 1-row epoch anchor broadcast",
            bitmap,
        ),
        (
            "q115 sentence profile: codegen split/filter + explode_outer "
            "(Generate) + ONE doc-keyed partial agg",
            sentences,
        ),
        (
            "q118 gaps-and-islands: corpus collapses at distinct(user, "
            "day); window exchange runs on the reduced relation; rollups "
            "reuse its partitioning",
            streaks,
        ),
        (
            "q119 Lorenz: day totals at ONE corpus exchange; rank/cumsum "
            "windows on the span-sized relation",
            lorenz,
        ),
        (
            "q120 behavior signatures: ONE Exchange(user_id), per-group "
            "sort_array (no global Sort node), md5 in codegen",
            signatures,
        ),
        (
            "q121 min-max scaling: per-type ranges BROADCAST back onto "
            "the scan — corpus read once, never shuffled",
            minmax,
        ),
        (
            "q123 contingency deviations: ONE corpus exchange to cells; "
            "marginal windows on the |lang×source| relation",
            contingency,
        ),
        (
            "q125 orphan census: dual ANTI joins over distinct-key "
            "reduced relations, ≤2-row rollup",
            orphans,
        ),
        (
            "q126 behavior-set drift: BOTH half-sets as conditional "
            "collect_sets in ONE aggregation pass; array algebra in "
            "codegen",
            setdrift,
        ),
        (
            "q129 2-D grid: dims derived from checkpointed cells "
            "(corpus scanned once); intentional tiny×tiny cross join",
            grid2d,
        ),
        (
            "q130 recency feature: conditional running max over an "
            "exclusive frame on ONE Exchange(user_id)",
            recency,
        ),
        (
            "q132 reach curve: per-user minima at the corpus exchange; "
            "cumulative/total windows on span-sized relations",
            reach,
        ),
        (
            "q137 Q17 shape: correlated scalar-aggregate subqueries "
            "decorrelated to per-partkey aggregate joins (no per-row "
            "re-scan)",
            scalarsub,
        ),
        (
            "q140 Q22 shape: 1-row (sum,count) scalar BNLJ broadcast + "
            "anti join with the 2001 predicate pushed to the orders scan",
            dormant,
        ),
        (
            "q142 collocations: single-materialization token lists, "
            "broadcast totals, TakeOrdered top-20 (no global sort)",
            colloc,
        ),
        (
            "q143 sweep line: one span join + explode deltas; running "
            "window and month rollup on the calendar-sized relation",
            sweep,
        ),
        (
            "q147 Q9 shape: part/supplier/nation/orders all broadcast "
            "into the lineitem scan; ONE rollup exchange",
            profit,
        ),
        (
            "q148 Q11 shape: per_part localCheckpointed (single corpus "
            "scan); (total, n) scalar BNLJ broadcast; integer keep test",
            important,
        ),
        (
            "q151 Q16 shape: NOT IN as broadcast null-aware LeftAnti; "
            "two-phase COUNT(DISTINCT)",
            census,
        ),
        (
            "q152 Q5 shape: region prune dim-side on broadcast supplier "
            "(c_nationkey = s_nationkey rides the join condition); ONE "
            "nation rollup exchange",
            localvol,
        ),
        (
            "q153 Q10 shape: global top-20 as TakeOrderedAndProject over "
            "the per-customer rollup; detail joins broadcast onto 20 rows",
            returned,
        ),
        (
            "q156 Q20 shape: per-part totals as WINDOW aggregates over the "
            "reduced (supp, part) frame — three reducing exchanges, no "
            "self-join",
            excess,
        ),
        (
            "q157 Q2 shape: correlated per-part MIN as a window over the "
            "(part, supp) MIN frame — ties preserved, one lineitem scan",
            mincost,
        ),
    ]
    out = ["# BENCH/PLANS.md — formatted physical plans (sf0.001 inputs)\n"]
    out.append(
        "Generated by tools/dump_plans.py. Things to check: ReadSchema is\n"
        "pruned to used columns; candidate generation has a single\n"
        "Exchange hashpartitioning(band keys) + Sort + Window (no self-join,\n"
        "no second shuffle before the pair dedup); WholeStageCodegen spans\n"
        "cover the JVM expression work; Python appears only as\n"
        "ArrowEvalPython / MapInPandas nodes.\n"
    )
    for title, df in sections:
        out.append(f"\n## {title}\n\n```\n{plan_of(df)}```\n")
    # round-5 board additions: dumped generically (plan pins live in
    # tests/test_query_plans.py; these are the human-readable copies)
    r5 = [n for n in QUERIES if int(n[1:].split('_')[0]) >= 158]
    for name in r5:
        df = QUERIES[name](spark, SF)
        out.append(f"\n## {name} (round 5)\n\n```\n{plan_of(df)}```\n")
    with open("/root/repo/BENCH/PLANS.md", "w") as f:
        f.write("".join(out))
    print("wrote BENCH/PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
