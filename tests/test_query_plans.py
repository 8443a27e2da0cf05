"""Scale-shape assertions for the analytics operators: the number of
shuffles each plan is ALLOWED is pinned, so a refactor that silently adds
an exchange (or swaps a broadcast join for a sort-merge join) fails here
even though results stay correct."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from dedup.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _n_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    # count shuffle exchanges only (broadcast exchanges are the cheap kind
    # we *want*); each node prints once in executedPlan
    return len(re.findall(r"Exchange (?:hash|range|Single)", plan))


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q40_asof_single_shuffle(spark):
    """Union-and-carry as-of join: ONE hash exchange on user_id feeds both
    the sort and the running window — never a range join."""
    df = QUERIES["q40_events_asof_join"](spark, SF)
    assert _n_exchanges(df) == 1, _plan(df)
    assert "CartesianProduct" not in _plan(df)


def test_q41_pivot_two_reducing_shuffles(spark):
    """Catalyst plans pinned pivot as groupBy(user, type) + pivotfirst on
    user — two exchanges, the second over rows already reduced to the
    (user, type) grain. An unpinned pivot would add a third job (value
    discovery); a join-based rewrite would be worse still."""
    df = QUERIES["q41_events_user_pivot"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 2, plan
    assert "pivotfirst" in plan, plan
    assert "Join" not in plan, plan


def test_q43_funnel_two_shuffles_no_join(spark):
    """Funnel = groupBy(user_id) + 1-row global agg: two exchanges (hash +
    single-partition), zero joins, zero windows."""
    df = QUERIES["q43_events_funnel"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 2, plan
    assert "Join" not in plan, plan


def test_q44_top_terms_three_shuffles_no_join(spark):
    """tf agg + token count-window + per-doc top-k window = exactly three
    exchanges; df comes from a window over the tf aggregate, NOT a second
    aggregate branch joined back."""
    df = QUERIES["q44_docs_top_terms"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 3, plan
    assert "Join" not in plan, plan


def test_q45_hopping_single_shuffle_via_expand(spark):
    """Sliding windows ride one Expand (x2 rows) + one aggregation
    exchange — the plan must not contain a join or a second shuffle."""
    df = QUERIES["q45_events_hopping_windows"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 1, plan
    assert "Expand" in plan, plan
    assert "Join" not in plan, plan


def test_q47_quantization_zero_shuffle_zero_python(spark):
    """int8 quantization is a stateless narrow projection: no exchange, no
    Python evaluation node (higher-order functions stay in the JVM)."""
    df = QUERIES["q47_embedding_quantization"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 0, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q50_exact_pass_broadcasts_candidates(spark):
    """The heavy-hitters exact pass must be a broadcast hash join of the
    tiny candidate set against the gram stream — a sort-merge join here
    would shuffle the full gram cardinality, the thing the sketch exists
    to avoid."""
    from dedup.heavyhitters import mg_summaries

    grams = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(F.explode(F.split(F.lower("text"), " ")).alias("gram"))
    )
    cand = (
        mg_summaries(grams, 256)
        .filter(F.col("gram").isNotNull())
        .select("gram")
        .distinct()
    )
    exact = grams.join(F.broadcast(cand), "gram").groupBy("gram").count()
    plan = _plan(exact)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_q51_novelty_two_shuffles_no_python(spark):
    """Novelty: explode distinct gram hashes, ONE exchange for the
    min-first-occurrence agg, ONE for the per-doc rollup; the join back
    on the 8-byte hash and the final doc_id join stay broadcast at this
    size. Whole pipeline is JVM-side — no Python/Arrow eval."""
    df = QUERIES["q51_docs_novelty"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 2, plan
    assert "CartesianProduct" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q52_overlap_no_gram_self_join(spark):
    """Cross-source overlap must never self-join the gram table: the pair
    matrix comes from JVM-side expansion of each gram's collected source
    set, and the only joins are the two broadcast total-attachments.
    Pinned: no sort-merge join, no cartesian, no Python."""
    df = QUERIES["q52_cross_source_overlap"](spark, SF)
    plan = _plan(df)
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan
    assert plan.count("BroadcastHashJoin") == 2, plan
    assert _n_exchanges(df) <= 6, plan


def test_q53_trailing_range_frame_single_shuffle(spark):
    """The trailing 24h window is ONE hash exchange on user_id + one sort
    + a RANGE-frame window — never an interval self-join."""
    df = QUERIES["q53_events_trailing_24h"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 1, plan
    assert "Join" not in plan, plan
    assert "RangeFrame" in plan, plan


def test_q54_cube_single_shuffle_via_expand(spark):
    """CUBE = one Expand (x4 grouping sets) + one partial-aggregated
    exchange; no join, no second shuffle."""
    df = QUERIES["q54_docs_cube"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 1, plan
    assert "Expand" in plan, plan
    assert "Join" not in plan, plan


def test_q55_set_ops_stay_on_user_sets(spark):
    """INTERSECT/EXCEPT compile to semi/anti joins over the distinct user
    sets; the events scan must reduce map-side first (partial distinct
    before every exchange), and the bounds row rides a broadcast."""
    df = QUERIES["q55_purchaser_retention_sets"](spark, SF)
    plan = _plan(df)
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q56_kmv_salted_no_join_no_python(spark):
    """KMV sketch: distinct partial-agg + salted k-min window + tiny
    source-keyed merge = three exchanges, zero joins, zero Python; the
    full gram cardinality never shuffles onto the 20-partition source
    key directly."""
    df = QUERIES["q56_source_distinct_kmv"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 3, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q60_mixture_total_rides_broadcast(spark):
    """Curation mixture: the corpus-wide kept-token total joins back as a
    single broadcast row (BroadcastNestedLoopJoin), never a shuffled or
    cartesian join; zero Python in the plan. The exchange bulk belongs to
    the composed q35 labeled oracle baseline — q60's own additions are one
    norm window, one doc_id join, one (source, tier) partial agg."""
    df = QUERIES["q60_curation_mixture"](spark, SF)
    plan = _plan(df)
    assert plan.count("BroadcastNestedLoopJoin") == 1, plan
    assert "CartesianProduct" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q61_quality_gate_zero_shuffles(spark):
    """Hard quality-rule gate is a single narrow projection over the scan:
    zero exchanges, zero joins, zero Python — pure codegen string/integer
    arithmetic, so it rides along any other documents pass for free."""
    df = QUERIES["q61_docs_quality_gate"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 0, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q62_packing_single_shuffle(spark):
    """Sequence packing: ONE hash exchange on source feeds both the
    cumulative-offset window and the (source, seq_id) aggregate —
    HashPartitioning(source) satisfies the agg's clustering, so no second
    exchange; zero joins, zero Python."""
    df = QUERIES["q62_docs_sequence_packing"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 1, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q63_bloom_prefilters_exact_join(spark):
    """Bloom decontamination: the corpus grams pass through the bloom bit
    tests (shiftleft probes against the literal word array) BEFORE the
    exact gram join, and that join is broadcast — never a shuffled join of
    corpus-sized gram tables. Result parity with brute force is the oracle
    row's job; this pins the plan shape that makes it 100-TB-viable."""
    df = QUERIES["q63_bloom_decontamination"](spark, SF)
    plan = _plan(df)
    assert "shiftleft" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q63_bloom_path_equals_exact_path(spark):
    """Zero-false-negative funnel: the bloom-prefiltered result is
    doc-for-doc identical to q31's exact broadcast-set result (false
    positives die in the verify join, false negatives cannot exist)."""
    from dedup.queries import q31_benchmark_decontamination

    bloom = QUERIES["q63_bloom_decontamination"](spark, SF).toPandas()
    exact = q31_benchmark_decontamination(spark, SF).toPandas()
    b = dict(zip(bloom.doc_id, bloom.contaminated))
    e = dict(zip(exact.doc_id, exact.contaminated))
    assert b == e


def test_q64_mixture_weights_one_agg_exchange(spark):
    """Source mixture weights: one partial-aggregated exchange on source,
    totals attached as a 1-row broadcast (BNLJ) — zero Python, no
    shuffled join."""
    df = QUERIES["q64_source_mixture_weights"](spark, SF)
    plan = _plan(df)
    assert plan.count("BroadcastNestedLoopJoin") == 1, plan
    assert "SortMergeJoin" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q66_unimax_two_exchanges_one_scan(spark):
    """UniMax allocation: the corpus pays ONE partial-aggregated exchange
    (per-source token totals) and ONE scan; the whole closed-form greedy
    (rank, prefix, first-fail, P_k) is a stack of same-partitioning
    window operators over a single-partition exchange of the
    |sources|-row aggregate — no joins, no Python, no branch re-scans."""
    df = QUERIES["q66_unimax_source_budgets"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 2, plan
    assert plan.count("Scan parquet") == 1, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q67_vocab_coverage_broadcast_probe(spark):
    """Vocab coverage: the vocabulary (top-16 window over the wordcount
    agg) reaches the corpus side as a BROADCAST probe — the per-doc OOV
    rollup never shuffled-joins token tables; two hash exchanges total
    (token counts, per-doc agg) plus the tiny window's single-partition
    exchange."""
    df = QUERIES["q67_docs_vocab_coverage"](spark, SF)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert _n_exchanges(df) <= 3, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q68_dispersion_no_pairwise_join(spark):
    """Centroid-identity dispersion: the mean pairwise dot is computed
    WITHOUT any pairwise join — wordcount-shaped aggs only; the only join
    in the plan is the broadcast stitch of two ≤|labels|-row aggregates.
    A cartesian/SMJ appearing here means someone reintroduced the O(n²)
    formulation."""
    df = QUERIES["q68_embedding_dispersion"](spark, SF)
    plan = _plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q69_trend_single_exchange_no_join(spark):
    """OLS sufficient statistics: ONE partial-aggregated exchange on
    event_type, zero joins, zero windows, zero Python — the canonical
    map-side-combined shape."""
    df = QUERIES["q69_events_type_trend"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 1, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q70_severity_broadcast_bench(spark):
    """PaLM severity: the benchmark gram set reaches the corpus occurrence
    scan as BROADCAST joins (q31's shape) — no shuffled join of gram
    tables, no cartesian, no Python."""
    df = QUERIES["q70_contamination_severity"](spark, SF)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q71_self_information_wordcount_shape(spark):
    """Self-information score: wordcount-shaped — per-(doc,tok) agg, token
    re-agg, ONE equi-join back on tok, 1-row broadcast total. Never a
    cartesian, never Python; the floor-log2 fixed point is codegen'd
    string length over bin()."""
    df = QUERIES["q71_docs_self_information"](spark, SF)
    plan = _plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan
    assert _n_exchanges(df) <= 6, plan


def test_q72_cohort_retention_three_reducing_exchanges(spark):
    """Cohort matrix: distinct (user, week) grid → min-window on user →
    dimension-sized rollup. Three exchanges, each over an already-reduced
    relation; no joins anywhere."""
    df = QUERIES["q72_events_cohort_retention"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 3, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q73_debounce_single_exchange(spark):
    """Burst-leader debounce: ONE hash exchange on user_id feeds the
    (user, type) sort + lag window; the gap test is a codegen'd filter.
    No joins, no second scan."""
    df = QUERIES["q73_events_debounce"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 1, plan
    assert "Join" not in plan, plan
    assert plan.count("Scan parquet") == 1, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q74_ks_drift_one_corpus_exchange(spark):
    """KS drift: ONE corpus-sized hash exchange (the (source, length)
    histogram); the grid/CDF machinery after it is broadcast-built
    dimension-sized work — no sort-merge join ever touches corpus rows."""
    df = QUERIES["q74_source_length_drift"](spark, SF)
    plan = _plan(df)
    assert "SortMergeJoin" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan
    # the corpus scan lives in the histogram's localCheckpoint job; the
    # final plan reads the dimension-sized checkpoint, never the parquet
    assert plan.count("Scan parquet") == 0, plan


def test_q75_deciles_no_global_sort(spark):
    """Distributed NTILE: the only per-row window is partitioned by
    n_chars — the plan must NOT contain a SinglePartition exchange over
    corpus rows feeding a global sort window. The histogram/offset side
    is broadcast."""
    df = QUERIES["q75_docs_length_deciles"](spark, SF)
    plan = _plan(df)
    assert "SortMergeJoin" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan
    # the SinglePartition exchanges allowed are the tiny aggregate ones;
    # the row_number window must be hash-partitioned on n_chars
    assert "hashpartitioning(n_chars" in plan, plan


def test_q77_robust_outliers_broadcast_stats(spark):
    """Median/MAD outliers: the per-type stats reach the verdict scan as
    BROADCAST joins — never a shuffled join of corpus rows against
    1-row-per-type aggregates; no Python."""
    df = QUERIES["q77_events_robust_outliers"](spark, SF)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q80_benford_single_exchange(spark):
    """Benford profile: digit extraction is codegen'd string arithmetic on
    the scan; ONE partial-aggregated exchange on the (type, digit) key
    feeds the share window. No joins, no Python."""
    df = QUERIES["q80_events_benford"](spark, SF)
    plan = _plan(df)
    assert "Join" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan
    assert _n_exchanges(df) <= 2, plan


def test_q90_spectrum_two_round_wordcount(spark):
    """Token spectrum is the canonical two-round distributed wordcount:
    token exchange then a <=64-row bucket exchange — no joins, no
    Python, partial aggregation on both rounds."""
    df = QUERIES["q90_token_frequency_spectrum"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 2, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q91_shared_content_payload_keyed(spark):
    """Shared-turn detection: the two count-distincts plan as Expand +
    payload-keyed partial aggregation — two exchanges total, never a
    join, never Python."""
    df = QUERIES["q91_shared_turn_content"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) <= 2, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q92_novelty_broadcast_day_join(spark):
    """Daily novelty: the per-day rollup joins the first-seen rollup on
    the observation-span-sized day key — that join must BROADCAST, and
    nothing here is allowed to go quadratic or drop to Python."""
    df = QUERIES["q92_daily_novelty"](spark, SF)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q93_gap_histogram_one_stream_exchange(spark):
    """Gap histogram: ONE exchange on user_id feeds the lag window; the
    histogram aggregate adds one <=64-row exchange. Integer arithmetic
    only — no joins, no Python."""
    df = QUERIES["q93_inter_event_gap_histogram"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 2, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q94_gini_one_corpus_exchange(spark):
    """Gini: ONE partial-aggregated exchange on user_id; the rank window
    and 1-row rollup run on the users relation. No joins, no Python."""
    df = QUERIES["q94_user_activity_gini"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 2, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q95_affinity_no_self_join(spark):
    """Type affinity: the corpus is consumed once into the checkpointed
    per-user set relation; pair expansion is JVM higher-order (never a
    user_id self-join), marginals/user-count attach by BROADCAST."""
    df = QUERIES["q95_event_type_affinity"](spark, SF)
    plan = _plan(df)
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan
    # everything downstream reads the checkpointed RDD, not parquet
    assert "Scan parquet" not in plan, plan
    assert _n_exchanges(df) <= 4, plan


def test_q97_vocab_overlap_no_token_self_join(spark):
    """Vocab overlap: ONE corpus exchange builds the checkpointed
    token→sources sets; pairs come from triangular array expansion, not
    a token-keyed self-join; marginals BROADCAST."""
    df = QUERIES["q97_source_vocab_overlap"](spark, SF)
    plan = _plan(df)
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan
    assert "Scan parquet" not in plan, plan
    assert _n_exchanges(df) <= 3, plan


def test_q98_heatmap_single_exchange(spark):
    """Weekday×hour heatmap: integer div/mod in codegen on the scan, ONE
    partial-aggregated exchange over a ≤168-key space (the distinct-user
    count plans an Expand, still one shuffle round + tiny final)."""
    df = QUERIES["q98_weekday_hour_heatmap"](spark, SF)
    plan = _plan(df)
    assert "Join" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan
    assert _n_exchanges(df) <= 2, plan


def test_q99_bottleneck_reduced_windows(spark):
    """Q21-shape bottleneck suppliers: lineitem collapses at the first
    partial agg; both window passes and the rollup run on reduced
    relations; the supplier-name join BROADCASTs. Never a sort-merge
    join or correlated re-scan."""
    df = QUERIES["q99_bottleneck_suppliers"](spark, SF)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan
    assert _n_exchanges(df) <= 3, plan


def test_q100_weekly_growth_one_corpus_exchange(spark):
    """WoW growth: ONE corpus exchange to the (type, week) grain; the
    lag window runs on the weeks-sized relation. No joins, no Python."""
    df = QUERIES["q100_weekly_type_growth"](spark, SF)
    plan = _plan(df)
    assert "Join" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan
    assert _n_exchanges(df) == 2, plan


def test_q101_grouping_sets_single_expand(spark):
    """Explicit GROUPING SETS: one Expand (x2 sets) + ONE partial-
    aggregated exchange — the two axis margins never pay two passes."""
    df = QUERIES["q101_corpus_marginals"](spark, SF)
    plan = _plan(df)
    assert "Expand" in plan, plan
    assert _n_exchanges(df) == 1, plan
    assert "Join" not in plan, plan


def test_q102_simpson_two_reducing_exchanges(spark):
    """Simpson diversity: (user, type) partial agg then a user-keyed
    second agg over the reduced relation — integer sufficient stats,
    no Python, no joins."""
    df = QUERIES["q102_user_simpson_diversity"](spark, SF)
    plan = _plan(df)
    assert "Join" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan
    assert _n_exchanges(df) == 2, plan


def test_q103_spikes_broadcast_median(spark):
    """Day-volume spikes: day totals at ONE corpus exchange; the 1-row
    exact median attaches by broadcast (nested-loop over one row is the
    cheap kind) — never a second corpus pass or a global sort."""
    df = QUERIES["q103_day_volume_spikes"](spark, SF)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q104_interval_join_never_cartesian(spark):
    """Static interval join: an EQUI-join on user_id carrying the range
    predicate as a filter — never a cartesian/nested-loop expansion."""
    df = QUERIES["q104_view_purchase_pairs"](spark, SF)
    plan = _plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q105_not_exists_decorrelates_to_anti(spark):
    """spark.sql correlated NOT EXISTS must decorrelate to an anti join
    with the threshold predicate PUSHED to the inner scan — never a
    per-row subquery or cartesian."""
    df = QUERIES["q105_strict_big_spenders"](spark, SF)
    plan = _plan(df)
    assert "Anti" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "PushedFilters: [IsNotNull(o_totalprice)" in plan or \
        "LessThan(o_totalprice" in plan, plan


def test_q106_percentiles_one_exchange(spark):
    """Length percentiles: ONE exchange on source + per-partition sort;
    no global sort, no joins, no Python."""
    df = QUERIES["q106_doc_length_percentiles"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 1, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q107_first_touch_semi_join(spark):
    """First-touch attribution: the purchaser filter must plan as a SEMI
    join on the reduced first-event relation — no cartesian, no Python."""
    df = QUERIES["q107_first_touch_attribution"](spark, SF)
    plan = _plan(df)
    assert "Semi" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q108_bucket_pricing_single_exchange(spark):
    """Quantity-bucket pricing: bucket arithmetic in codegen on the scan,
    ONE partial-aggregated exchange over ≤5 keys."""
    df = QUERIES["q108_quantity_bucket_pricing"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 1, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q109_dense_rank_broadcast_dims(spark):
    """Top spenders: per-customer cents at one partial agg; customer and
    nation dims attach by BROADCAST; the rank window partitions on
    nation — no sort-merge join, no global sort."""
    df = QUERIES["q109_top_spenders_per_nation"](spark, SF)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan
    assert _n_exchanges(df) <= 2, plan


def test_q110_except_all_single_exchange(spark):
    """EXCEPT ALL compiles to a count-compare aggregation sharing ONE
    exchange on the (user, type) key — never a row-pairing join."""
    df = QUERIES["q110_behavior_churn"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 1, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q111_melt_zero_extra_shuffle(spark):
    """Unpivot: the melt is an Expand over the sources-sized wide
    relation — it must not add a corpus-scale shuffle beyond the two
    aggregation exchanges (count-distinct plans an Expand + 2 rounds)."""
    df = QUERIES["q111_source_stats_long"](spark, SF)
    plan = _plan(df)
    assert "Expand" in plan, plan
    assert "Join" not in plan, plan
    assert _n_exchanges(df) <= 2, plan


def test_q112_gapfill_broadcast_spine(spark):
    """Gap fill: the sequence() spine explodes from a 1-row aggregate
    and joins hourly counts by BROADCAST — never a sort-merge join or
    second corpus pass."""
    df = QUERIES["q112_hourly_purchase_gapfill"](spark, SF)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q113_max_by_two_reducing_exchanges(spark):
    """Dominant type: (user, type) partial agg then ONE user-keyed
    max_by/sum aggregate — no joins, no Python, no window."""
    df = QUERIES["q113_dominant_user_type"](spark, SF)
    plan = _plan(df)
    assert "Join" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan
    assert _n_exchanges(df) == 2, plan


def test_q114_bitmap_partial_agg(spark):
    """Day bitmap: bit_or combines map-side at ONE user-keyed corpus
    exchange; the 1-row epoch anchor attaches by broadcast."""
    df = QUERIES["q114_active_days_bitmap"](spark, SF)
    plan = _plan(df)
    assert "SortMergeJoin" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan
    assert _n_exchanges(df) <= 2, plan


def test_q115_explode_outer_one_exchange(spark):
    """Sentence profile: split/filter in codegen, explode_outer
    (Generate) on the scan, ONE doc-keyed partial-agg exchange."""
    df = QUERIES["q115_sentence_profile"](spark, SF)
    plan = _plan(df)
    assert "Generate" in plan, plan
    assert _n_exchanges(df) == 1, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q116_token_classes_one_exchange(spark):
    """Token classes: rlike classification rides the exploded scan; ONE
    source-keyed partial-agg exchange, no joins."""
    df = QUERIES["q116_token_class_shares"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 1, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q117_from_json_one_exchange(spark):
    """Typed JSON profile: from_json + residue in codegen, ONE
    partial-agg exchange over the tiny key space."""
    df = QUERIES["q117_typed_props_profile"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 1, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q118_islands_reduced_second_exchange(spark):
    """Gaps-and-islands: corpus collapses at the (user, day) distinct;
    the window pays one more exchange over the REDUCED relation and the
    rollups reuse it — exactly two exchanges, no joins."""
    df = QUERIES["q118_longest_active_streak"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 2, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q119_lorenz_reduced_windows(spark):
    """Lorenz curve: ONE corpus exchange to day totals; the rank/cumsum
    windows run on the span-sized relation (one more tiny exchange)."""
    df = QUERIES["q119_day_value_lorenz"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 2, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q120_signatures_no_global_sort(spark):
    """Behavior signatures: ONE Exchange(user_id); ordering happens
    per-group inside sort_array, NEVER as a global Sort node."""
    df = QUERIES["q120_behavior_signatures"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 1, plan
    assert "Sort " not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q121_minmax_broadcast_ranges(spark):
    """Min-max scaling: per-type ranges BROADCAST back onto the scan —
    the corpus is read once and never shuffled."""
    df = QUERIES["q121_minmax_scaled_values"](spark, SF)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert _n_exchanges(df) <= 1, plan


def test_q122_dup_audit_single_exchange(spark):
    """Duplicate audit: the exact-dup hash-groupBy applied to events —
    ONE full-row-keyed partial-agg exchange, post-agg filter."""
    df = QUERIES["q122_duplicate_event_audit"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 1, plan
    assert "Join" not in plan, plan


def test_q123_contingency_tiny_windows(spark):
    """Contingency deviations: ONE corpus exchange to cells; the three
    marginal windows run over the |lang x source| relation only."""
    df = QUERIES["q123_lang_source_deviation"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 2, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q124_integrity_equi_join(spark):
    """Ship-date integrity: equi-join on the order key with the
    violation predicate as a filter — never cartesian, no Python."""
    df = QUERIES["q124_shipdate_integrity_audit"](spark, SF)
    plan = _plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q125_orphan_census_anti_joins(spark):
    """Referential census: both directions plan as ANTI joins over
    distinct-key reduced relations — never full-row pairing."""
    df = QUERIES["q125_referential_orphan_census"](spark, SF)
    plan = _plan(df)
    assert "Anti" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q126_set_drift_single_pass(spark):
    """Behavior-set drift: BOTH half-sets are conditional collect_sets
    in ONE user-keyed aggregation pass — one exchange, no joins, no
    second scan; array algebra in codegen."""
    df = QUERIES["q126_behavior_set_drift"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 1, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q127_filtered_distincts_one_scan(spark):
    """Filtered distincts: both conditional distincts share one Expand +
    source-keyed exchange — the corpus is scanned once."""
    df = QUERIES["q127_filtered_distincts"](spark, SF)
    plan = _plan(df)
    assert "Expand" in plan, plan
    assert _n_exchanges(df) <= 2, plan
    assert "Join" not in plan, plan


def test_q128_weighted_avg_single_exchange(spark):
    """Weighted mean: both sums ride ONE partial-agg exchange over the
    3-value key; no joins, no Python."""
    df = QUERIES["q128_weighted_avg_price"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 1, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q129_grid_dims_from_cells(spark):
    """2-D grid: the dim x dim cross join is INTENTIONAL (tiny x tiny)
    and both dimension distincts derive from the checkpointed cells —
    the corpus parquet is scanned exactly once, upstream of the
    checkpoint."""
    df = QUERIES["q129_lang_source_grid"](spark, SF)
    plan = _plan(df)
    assert "Scan parquet" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q130_recency_one_exchange(spark):
    """Recency feature: the conditional running max over the exclusive
    frame rides ONE Exchange(user_id) — never a join against a
    purchases subset."""
    df = QUERIES["q130_time_since_last_purchase"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 1, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q131_pk_audit_single_exchange(spark):
    """PK census: ONE composite-key partial-agg exchange, post-agg
    multiplicity filter."""
    df = QUERIES["q131_lineitem_pk_audit"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 1, plan
    assert "Join" not in plan, plan


def test_q132_reach_reduced_windows(spark):
    """Reach curve: corpus collapses at per-user minima; hour rollup and
    cumulative/total windows run on span-sized relations."""
    df = QUERIES["q132_cumulative_user_reach"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 3, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q133_conversion_single_exchange(spark):
    """Null-safe conversion: both conditional counts and NULLIF ride ONE
    user-keyed partial-agg exchange."""
    df = QUERIES["q133_user_conversion_rates"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 1, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q134_strip_census_single_exchange(spark):
    """Strip census: regexp_replace length deltas in codegen on the
    scan; ONE source-keyed exchange."""
    df = QUERIES["q134_punctuation_strip_census"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 1, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q135_position_shared_window_exchange(spark):
    """Position histogram: row_number and count windows share ONE
    Exchange(user_id); the decile rollup is a ≤11-row second exchange."""
    df = QUERIES["q135_purchase_position_histogram"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 2, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q136_run_lengths_reuse_partitioning(spark):
    """Run lengths: the user-keyed rollup reuses the lag window's
    partitioning — exactly ONE exchange end to end."""
    df = QUERIES["q136_type_run_lengths"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 1, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q137_scalar_subqueries_decorrelate(spark):
    """Q17 shape: both correlated scalar aggregates decorrelate to
    per-partkey aggregate joins — never a per-row re-scan (no nested
    loop, no cartesian), and everything stays JVM-side."""
    df = QUERIES["q137_small_quantity_revenue"](spark, SF)
    plan = _plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert _n_exchanges(df) == 3, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q138_nation_pair_broadcast_dims(spark):
    """Q7 shape: every dimension (supplier/customer/nation x2)
    broadcasts into the fact scan; the only shuffle is the final
    4-key rollup."""
    df = QUERIES["q138_nation_pair_volume"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 1, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q139_market_share_single_rollup(spark):
    """Q8 shape: numerator and denominator ride the SAME order-year
    partial-agg exchange (one shuffle), dims broadcast."""
    df = QUERIES["q139_region_market_share"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 1, plan
    assert "SortMergeJoin" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q140_scalar_broadcast_and_anti(spark):
    """Q22 shape: the (sum, count) scalar is a 1-row BNLJ broadcast;
    the recency anti join is a broadcast hash join with the 2001
    predicate pushed to the orders scan."""
    df = QUERIES["q140_dormant_high_balance"](spark, SF)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "PushedFilters" in plan or "o_orderdate" in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q141_locf_reuses_window_partitioning(spark):
    """LOCF carry: the per-user rollup reuses the running frame's
    Exchange(user_id) — exactly ONE shuffle, zero joins."""
    df = QUERIES["q141_last_purchase_carry"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 1, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q142_collocations_takeordered(spark):
    """PMI collocations: top-20 is TakeOrdered (never a global sort);
    totals are broadcast; token lists materialize once via
    localCheckpoint so the corpus parquet is not re-scanned per
    branch."""
    df = QUERIES["q142_bigram_collocations"](spark, SF)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert "Scan parquet" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q143_sweepline_no_interval_join(spark):
    """Order concurrency: sweep line — one span join, one explode, day
    and month partial aggs; never an interval self-join (exactly one
    join, two scans: orders + lineitem)."""
    df = QUERIES["q143_order_concurrency"](spark, SF)
    plan = _plan(df)
    assert plan.count("Join") <= 2, plan  # one join node (+AQE echo)
    assert "CartesianProduct" not in plan, plan
    assert plan.count("Scan parquet") == 2, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q144_rollup_single_expand(spark):
    """Transition rollup: lag window rides ONE Exchange(user_id); the
    rollup is one Expand + one partial-agg exchange."""
    df = QUERIES["q144_transition_rollup"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 2, plan
    assert plan.count("Expand") == 1, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q145_trimmed_mean_single_exchange(spark):
    """Trimmed mean: rank + count windows and the rollup all share ONE
    Exchange(event_type)."""
    df = QUERIES["q145_trimmed_mean"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 1, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q146_spearman_reduced_windows(spark):
    """Spearman: corpus collapses to per-user counts in one hash
    exchange; rank windows run on the reduced relation (one single
    exchange), zero joins."""
    df = QUERIES["q146_activity_rank_correlation"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 2, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q147_profit_single_rollup_exchange(spark):
    """Q9 shape: part (LIKE-filtered dim-side), supplier, nation, and
    orders all broadcast into the lineitem scan; the only shuffle is
    the final (nation, year) rollup."""
    df = QUERIES["q147_nation_year_profit"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 1, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q148_single_corpus_scan_scalar_broadcast(spark):
    """Q11 shape: per_part localCheckpoints so the corpus parquet is
    scanned exactly once; the (total, n) scalar rides a 1-row BNLJ
    broadcast; the keep test is integer-only."""
    df = QUERIES["q148_important_parts"](spark, SF)
    plan = _plan(df)
    assert "Scan parquet" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q149_distribution_two_reducing_exchanges(spark):
    """Q13 shape: priority filter pushed to the orders scan, LEFT join
    preserving no-match customers (auto-broadcast at this SF — at real
    scale it becomes a custkey shuffle join whose partitioning the
    per-customer count reuses), then per-customer count (exchange #1)
    and the histogram over the customer-sized relation (exchange #2)."""
    df = QUERIES["q149_order_count_distribution"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 2, plan
    assert "SortMergeJoin" not in plan, plan
    assert "1-URGENT" in plan, plan  # filter reached the scan side
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q150_argmax_no_sort_no_rescan(spark):
    """Q15 shape: global argmax via scalar-max broadcast equality join
    — no global Sort, no TakeOrdered/LIMIT, and the corpus aggregate is
    localCheckpointed (only the supplier dim parquet appears in the
    final plan)."""
    df = QUERIES["q150_top_revenue_supplier"](spark, SF)
    plan = _plan(df)
    assert plan.count("Scan parquet") == 1, plan
    assert "TakeOrdered" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q151_null_aware_anti_join(spark):
    """Q16 shape: NOT IN plans as a broadcast null-aware LeftAnti (not
    a cartesian fallback); part broadcasts with the brand filter
    dim-side; COUNT(DISTINCT) is the standard two-phase distinct
    aggregate (two reducing exchanges)."""
    df = QUERIES["q151_supplier_census"](spark, SF)
    plan = _plan(df)
    assert "LeftAnti" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert _n_exchanges(df) == 2, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q152_region_prune_dim_side_single_rollup(spark):
    """Q5 shape: supplier⋈nation⋈region prunes to ASIA dim-side and
    broadcasts (the c_nationkey = s_nationkey edge rides the broadcast
    join condition — no extra exchange); orders/customer auto-broadcast
    at this SF (at real scale they become reducing equi-join shuffles);
    the only hash exchange is the nation rollup."""
    df = QUERIES["q152_local_supplier_volume"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 1, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "ASIA" in plan, plan  # region prune reached the dim scan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q153_topk_is_take_ordered_not_global_sort(spark):
    """Q10 shape: the global top-20 compiles to TakeOrderedAndProject
    (per-partition top-k + 20-row merge), never a global Sort or a
    single-reducer window; detail joins broadcast onto the 20 rows;
    the returnflag filter reaches the lineitem scan."""
    df = QUERIES["q153_returned_item_customers"](spark, SF)
    plan = _plan(df)
    assert "TakeOrdered" in plan, plan
    assert _n_exchanges(df) == 1, plan  # the per-customer rollup only
    assert "SortMergeJoin" not in plan, plan
    assert "Window" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q154_dual_case_counts_one_rollup(spark):
    """Q12 shape: both CASE counts fold into ONE partial aggregate
    (orders auto-broadcasts at this SF; at real scale the fact-fact
    equi-join becomes the shuffle this census is allowed); the ship
    window is pushed to the lineitem scan."""
    df = QUERIES["q154_priority_linestatus_census"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 1, plan
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("HashAggregate") == 2, plan  # partial + final, one pair
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q155_promo_share_single_row_agg(spark):
    """Q14 shape: part broadcasts with the promo bit computed dim-side;
    both conditional sums ride ONE map-side partial aggregate, so the
    single exchange carries one row per task; the month window is
    pushed to the lineitem scan."""
    df = QUERIES["q155_promo_revenue_share"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 1, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q156_window_totals_never_self_join(spark):
    """Q20 shape: the per-part total and supplier count are WINDOW
    aggregates over the already-reduced (supp, part) frame — exactly
    three reducing exchanges (pair agg, partkey window, supplier
    census) and NO self-join of the pair relation."""
    df = QUERIES["q156_excess_share_suppliers"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 3, plan
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("Scan parquet") <= 4, plan  # li + 3 dims, no rescan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q157_correlated_min_as_window_no_rescan(spark):
    """Q2 shape: the correlated per-part MIN is a window over the
    reduced (part, supp) MIN frame — two reducing exchanges, one
    lineitem scan (never the self-join/second-scan rewrite of the
    classic correlated subquery); ties survive (no TakeOrdered or
    row_number pick)."""
    df = QUERIES["q157_min_cost_supplier"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 2, plan
    assert "SortMergeJoin" not in plan, plan
    assert "TakeOrdered" not in plan, plan
    assert plan.count("Scan parquet") <= 4, plan  # li + part + sup + nation
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q158_skyline_bucketed_local_phase_no_join(spark):
    """Two-phase distributed skyline: four windows total (range-min +
    same-x min, once per phase), the LOCAL phase partitioned by the
    32-way bucket so the corpus never sorts in one partition — only
    survivors reach the global windows. Zero joins (the quadratic
    NOT EXISTS definition lives in the oracle, not the plan), zero
    Python."""
    df = QUERIES["q158_pareto_skyline"](spark, SF)
    plan = _plan(df)
    assert "Join" not in plan, plan
    assert plan.count("Window") == 4, plan
    assert "_b" in plan, plan  # bucketed local phase actually present
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q159_bfs_rounds_are_frontier_sized(spark):
    """Frontier BFS: every round's join probes the localCheckpointed
    edge list with the O(frontier) relation — the final plan joins
    checkpointed RDD scans (no corpus rescans, no cartesian closure),
    and the variable-depth traversal never materializes an all-pairs
    reachability relation."""
    df = QUERIES["q159_dup_graph_bfs_depth"](spark, SF)
    plan = _plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "Scan parquet" not in plan, plan  # inputs all checkpointed
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q160_checksum_single_exchange_map_only(spark):
    """Anti-entropy fingerprint: map-only JVM row hashing into ONE
    partial+final aggregate exchange — no join, no window, no Python;
    the cheapest possible full-table pass."""
    df = QUERIES["q160_table_checksum"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 1, plan
    assert "Join" not in plan and "Window" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q161_prefix_join_is_equi_never_cartesian(spark):
    """Lossless prefix-filtered set-similarity join: the candidate stage
    is an EQUI join on prefix tokens (plus pushed length-ratio
    filters) — never a cartesian/BNLJ pair enumeration — and
    verification is array intersection in the JVM, zero Python."""
    df = QUERIES["q161_prefix_filter_ssjoin"](spark, SF)
    plan = _plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q162_prefix_sum_is_two_phase_no_corpus_sort(spark):
    """Distributed PPS sampling: the global prefix sum is the two-phase
    bucket scan — a bucket-partitioned window plus a buckets-sized
    offset window — never ONE single-partition sort of the corpus; the
    offset/total joins are broadcast (one BHJ + one 1-row BNLJ), and
    the checkpointed 2-col projection means the final plan rescans no
    parquet."""
    df = QUERIES["q162_weighted_systematic_sample"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 5, plan
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") == 1, plan
    assert plan.count("BroadcastNestedLoopJoin") == 1, plan
    assert "Scan parquet" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q163_pair_algebra_never_rescans_corpus(spark):
    """Mergeable-sketch set algebra: all 190 pairwise estimates derive
    from the checkpointed <=20*256-row sketch relation — the final plan
    has ZERO parquet scans (the corpus pass happened once, at sketch
    build), dimension-sized broadcast joins only, one (pair, hash)
    dedup exchange + one pair window."""
    df = QUERIES["q163_kmv_sketch_algebra"](spark, SF)
    plan = _plan(df)
    assert "Scan parquet" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert _n_exchanges(df) == 4, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q164_merkle_single_pass_both_replicas(spark):
    """Anti-entropy localization: both replicas' leaf fingerprints come
    from ONE conditional-aggregation pass (the checkpointed leaf
    relation), so the final plan is one tiny inner-node exchange + a
    broadcast mismatch probe — no second corpus scan, no sort-merge
    join, no Python."""
    df = QUERIES["q164_merkle_divergence"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 1, plan
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") == 1, plan
    assert "Scan parquet" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q165_greedy_cover_invariants(spark):
    """Greedy max-coverage: gains are non-increasing (submodularity of
    the coverage objective under the shrinking remaining relation),
    picked docs are distinct, and covered_cum is the running gain sum —
    the k-row result itself is driver-local by design (each argmax
    steers the next round)."""
    rows = QUERIES["q165_greedy_vocab_cover"](spark, SF).collect()
    assert len(rows) == 8
    gains = [r["gain"] for r in rows]
    assert gains == sorted(gains, reverse=True), gains
    assert len({r["doc_id"] for r in rows}) == 8
    import itertools

    assert [r["covered_cum"] for r in rows] == list(
        itertools.accumulate(gains)
    )


def test_q166_corpus_never_shuffles(spark):
    """Leakage-safe split: the rep map (dup docs only, checkpointed by
    the CC engine) broadcasts into the corpus-side left join and the
    bucket rule is a narrow projection — ZERO shuffle exchanges on the
    corpus path, one parquet scan, no Python."""
    df = QUERIES["q166_leakage_safe_split"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 0, plan
    assert plan.count("BroadcastHashJoin") == 1, plan
    assert plan.count("Scan parquet") == 1, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q166_no_cluster_straddles_splits(spark):
    """The leakage invariant itself: every q12 dup pair lands in ONE
    split (q37's per-doc hash split would violate this for any pair
    whose endpoints hash across a boundary)."""
    split = {
        r["doc_id"]: r["split"]
        for r in QUERIES["q166_leakage_safe_split"](spark, SF).collect()
    }
    pairs = QUERIES["q12_docs_token_jaccard_pairs"](spark, SF).collect()
    assert pairs, "fixture should contain dup pairs"
    straddlers = [
        (p["a"], p["b"])
        for p in pairs
        if split[p["a"]] != split[p["b"]]
    ]
    assert not straddlers, straddlers


def test_q167_each_modality_scanned_once(spark):
    """Rank fusion: the checkpointed query sets broadcast into each
    modality's candidate scan, so embeddings and documents are each
    read exactly once (two BNLJs by design — the brute-force baseline
    family); the (q, n) rank join and windows stay query-bounded; no
    Python."""
    df = QUERIES["q167_rank_fusion"](spark, SF)
    plan = _plan(df)
    assert plan.count("Scan parquet") == 2, plan
    assert plan.count("BroadcastNestedLoopJoin") == 2, plan
    assert "CartesianProduct" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_q168_zonemap_one_corpus_exchange_and_pruning_win(spark):
    """Z-order layout: the corpus reduces to the (x, y) grain in ONE
    partial-aggregated exchange (checkpointed — no parquet in the
    final plan, which rolls up the tiny relation per layout); and the
    curve's point: every z-cell bounds BOTH dims (spans <= 63) while
    the lexicographic strips leave y effectively unbounded — the
    file-skipping property a y-predicate needs."""
    df = QUERIES["q168_zorder_layout"](spark, SF)
    plan = _plan(df)
    assert "Scan parquet" not in plan, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan
    rows = df.collect()
    z = [r for r in rows if r["layout"] == "zorder"]
    lex = [r for r in rows if r["layout"] == "lexicographic"]
    assert z and lex
    z_span = max(r["max_y"] - r["min_y"] for r in z)
    lex_span = max(r["max_y"] - r["min_y"] for r in lex)
    assert z_span <= 63, z_span
    assert z_span < lex_span, (z_span, lex_span)


def test_q169_hrw_minimal_movement_no_shuffle(spark):
    """Rendezvous sharding: placement is a stateless narrow projection —
    ZERO exchanges, no join, no explode row blow-up, no Python; and
    the HRW theorem holds on the data: every doc that moved under the
    8 -> 9 grow moved TO the new shard (nothing rebalances between old
    shards), with the stolen fraction near the expected 1/9."""
    df = QUERIES["q169_rendezvous_sharding"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 0, plan
    assert "Join" not in plan and "Generate" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan
    rows = df.collect()
    moved = [r for r in rows if r["moved"]]
    assert moved, "some docs should be stolen by the new shard"
    assert all(r["shard9"] == 8 for r in moved), moved[:5]
    frac = len(moved) / len(rows)
    assert 0.02 < frac < 0.30, frac


def test_q170_inverted_index_probe_side_broadcast(spark):
    """Inverted-index retrieval: the corpus tokenizes once into the
    checkpointed postings relation (final plan rescans no parquet);
    the query-postings side is the broadcast probe of the token join,
    and only the (q, d) score agg + per-query window shuffle remain —
    candidate work rides posting lists, never an all-pairs product."""
    df = QUERIES["q170_inverted_index_retrieval"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 2, plan
    assert plan.count("BroadcastHashJoin") == 1, plan
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan, plan
    assert "Scan parquet" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan
    rows = df.collect()
    assert rows
    assert all(r["q"] % 97 == 0 and r["q"] != r["d"] for r in rows)
    assert all(r["score"] > 0 for r in rows)
    from collections import Counter

    per_q = Counter(r["q"] for r in rows)
    assert max(per_q.values()) <= 5


def test_q171_hits_integer_power_iteration(spark):
    """HITS: the type-grain authority vector is broadcast into the
    half-steps (never shuffled corpus-wide), no cartesian or
    single-partition corpus exchange; scores are positive BIGINTs and
    the two entity rankings are dense from rank 1."""
    df = QUERIES["q171_hits_scores"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 6, plan
    assert plan.count("BroadcastHashJoin") == 3, plan
    assert "CartesianProduct" not in plan, plan
    assert "Scan parquet" not in plan, plan
    rows = df.collect()
    hubs = sorted(r["rnk"] for r in rows if r["entity"] == "hub")
    auth = sorted(r["rnk"] for r in rows if r["entity"] == "authority")
    assert hubs == list(range(1, 11)), hubs
    assert auth == list(range(1, len(auth) + 1)) and auth, auth
    assert all(r["score"] > 0 for r in rows)


def test_q172_snm_window_pair_census(spark):
    """Sorted-neighborhood blocking: no cartesian product and no
    single-partition corpus window in the final plan (the global rank
    was built by the two-phase bucket scan before the checkpoint); the
    window-of-4 census is exact: with unique ranks 1..N the pair count
    is (N-1)+(N-2)+(N-3) and every left doc pairs with at most 3
    successors."""
    df = QUERIES["q172_sorted_neighborhood_pairs"](spark, SF)
    plan = _plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "Exchange SinglePartition" not in plan, plan
    assert "Scan parquet" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan
    rows = df.collect()
    n = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(rows) == (n - 1) + (n - 2) + (n - 3), (len(rows), n)
    assert all(1 <= r["gap"] <= 3 for r in rows)
    from collections import Counter

    per_a = Counter(r["a"] for r in rows)
    assert max(per_a.values()) <= 3


def test_q173_countmin_never_underestimates(spark):
    """Count-Min guarantee: est >= exact for every probed token (the
    sketch only ever over-counts); the sketch relation the probes hit
    is the broadcast side, the corpus was sketched in ONE pass before
    the checkpoint (no parquet in the final plan)."""
    df = QUERIES["q173_countmin_sketch"](spark, SF)
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") == 1, plan
    assert "CartesianProduct" not in plan, plan
    assert "Scan parquet" not in plan, plan
    rows = df.collect()
    assert len(rows) == 20, len(rows)
    assert all(r["est_n"] >= r["exact_n"] for r in rows)
    assert all(r["overest"] == r["est_n"] - r["exact_n"] for r in rows)


def test_q174_kcore_matches_independent_peel(spark):
    """k-core: the unrolled 6-round peel reaches the true fixpoint —
    compared node-for-node (with degrees) against an independent
    in-process peel of the same deterministic pair relation run to
    convergence; nesting (3-core within 2-core) follows."""
    from collections import Counter

    from dedup.queries import q12_docs_token_jaccard_pairs

    pairs = q12_docs_token_jaccard_pairs(spark, SF).select("a", "b").collect()
    edges = set()
    for r in pairs:
        edges.add((r["a"], r["b"]))
        edges.add((r["b"], r["a"]))
    truth = {}
    for k in (2, 3):
        E = set(edges)
        while True:
            deg = Counter(u for u, _ in E)
            keep = {u for u, d in deg.items() if d >= k}
            E2 = {(u, v) for u, v in E if u in keep and v in keep}
            if E2 == E:
                break
            E = E2
        truth[k] = Counter(u for u, _ in E)
    rows = QUERIES["q174_kcore_decomposition"](spark, SF).collect()
    got = {2: {}, 3: {}}
    for r in rows:
        got[r["k"]][r["doc_id"]] = r["core_deg"]
    assert got[2] == dict(truth[2])
    assert got[3] == dict(truth[3])
    assert set(got[3]) <= set(got[2])
    assert all(d >= k for k in (2, 3) for d in got[k].values())


def test_q175_ewma_one_exchange_weighted_mean_bounds(spark):
    """Dyadic EWMA: ONE hash exchange on user_id feeds both the recency
    window and the groupBy (same partitioning — no second shuffle), no
    join; and every user's ewma lies within [min, max] of their
    purchase values (convex weights), with n_obs clipped at 16."""
    df = QUERIES["q175_dyadic_ewma"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 1, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan
    rows = df.collect()
    assert rows
    assert all(1 <= r["n_obs"] <= 16 for r in rows)
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    )
    bounds = {r["user_id"]: (r["lo"], r["hi"]) for r in ev}
    for r in rows:
        lo, hi = bounds[r["user_id"]]
        assert lo - 1e-4 <= r["ewma"] <= hi + 1e-4, (r, lo, hi)


def test_q176_linkage_scoring_is_pair_sized(spark):
    """Fellegi-Sunter scoring: a narrow projection over the SNM
    candidate relation plus two slim attribute joins — no cartesian,
    no Python; decisions are consistent with the integer score cuts
    on every row."""
    df = QUERIES["q176_fellegi_sunter_linkage"](spark, SF)
    plan = _plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan
    rows = df.collect()
    assert rows
    for r in rows:
        expect = (4000 if r["jac_hi"] else -1500) + \
            (800 if r["lang_eq"] else -300) + \
            (500 if r["src_eq"] else -200) + \
            (700 if r["len_close"] else -400)
        assert r["score"] == expect
        want = "match" if expect >= 4000 else (
            "possible" if expect >= 1000 else "non_match")
        assert r["decision"] == want


def test_q177_tvd_metric_properties(spark):
    """TVD drift: token-grain self-join only (the corpus wordcounted
    once into the checkpointed tf relation — no parquet in the final
    plan); every pairwise TVD is in [0, 1] and the pair matrix is the
    full upper triangle of the source set."""
    df = QUERIES["q177_source_tvd_drift"](spark, SF)
    plan = _plan(df)
    assert "Scan parquet" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    rows = df.collect()
    srcs = set()
    for r in rows:
        assert r["s1"] < r["s2"]
        srcs.add(r["s1"]); srcs.add(r["s2"])
        assert 0.0 <= r["tvd"] <= 1.0, r
    k = len(srcs)
    assert len(rows) == k * (k - 1) // 2, (len(rows), k)


def test_q178_sessionization_one_exchange(spark):
    """Batch sessionization: ONE hash exchange on user_id serves the
    lag window, the running count, and the groupBy; sessions partition
    each user's events exactly (sum of session sizes == user's event
    count) and intra-session spans never exceed inter-session gaps'
    floor: every session's span is finite and every user's sess_idx
    sequence is dense from 1."""
    df = QUERIES["q178_batch_sessionization"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 1, plan
    assert "Join" not in plan, plan
    rows = df.collect()
    assert rows
    from collections import defaultdict

    per_user = defaultdict(list)
    for r in rows:
        per_user[r["user_id"]].append(r)
    ev_counts = {
        r["user_id"]: r["n"]
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    for u, sess in per_user.items():
        idxs = sorted(s["sess_idx"] for s in sess)
        assert idxs == list(range(1, len(idxs) + 1)), (u, idxs)
        assert sum(s["n_events"] for s in sess) == ev_counts[u]
        assert all(s["span_us"] >= 0 for s in sess)


def test_q179_lateness_census_shares(spark):
    """Out-of-order audit: bands cover all events (permille sums to
    ~1000, n sums to the event count); the single-partition exchange
    in the plan is the 5-row band relation, not the corpus (the
    corpus-side exchange is the per-user window)."""
    df = QUERIES["q179_out_of_order_audit"](spark, SF)
    rows = df.collect()
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    assert sum(r["n"] for r in rows) == n_events
    s = sum(r["permille"] for r in rows)
    assert 1000 - len(rows) < s <= 1000, s
    assert any(r["band"] == "0_on_time" for r in rows)


def test_q180_hll_sketch_accuracy_and_merge_grain(spark):
    """HLL: the register build is a partial-aggregated MAX at the
    (flag, reg) grain (mergeable); with 64 registers the raw estimate
    lands within the expected error envelope of the exact distinct
    count (|err| < 40% >> the 13% sigma) and every flag saturates
    nearly all registers at n >> m."""
    df = QUERIES["q180_hll_registers"](spark, SF)
    rows = df.collect()
    assert rows
    for r in rows:
        assert r["exact_n"] > 160  # raw-regime precondition n > 2.5m
        assert abs(r["rel_err_pct"]) < 40.0, r
        assert r["regs_hit"] >= 60, r


def test_q181_interval_join_is_custkey_equi(spark):
    """Interval overlap: the pair generation is an EQUI-join on
    o_custkey (bounded per-key fan-out), never a range/cartesian
    join; the interval relation is built once (checkpoint — no
    parquet rescans); overlap lengths are non-negative and symmetric
    pairs are canonical (a < b)."""
    df = QUERIES["q181_interval_overlap_pairs"](spark, SF)
    plan = _plan(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan
    assert "Scan parquet" not in plan, plan
    rows = df.collect()
    assert rows
    assert all(r["a"] < r["b"] for r in rows)
    assert all(r["overlap_days"] >= 0 for r in rows)


def test_q182_link_prediction_excludes_edges(spark):
    """Link prediction: predictions are strictly NON-edges at distance
    2 — no predicted pair exists in the underlying dup-pair relation;
    jaccard respects cn <= min(deg) and the whole computation runs on
    the pair relation (no parquet scans in the final plan)."""
    from dedup.queries import q12_docs_token_jaccard_pairs

    df = QUERIES["q182_link_prediction"](spark, SF)
    plan = _plan(df)
    assert "Scan parquet" not in plan, plan
    rows = df.collect()
    assert rows
    edges = set()
    for r in q12_docs_token_jaccard_pairs(spark, SF).select("a", "b").collect():
        edges.add((r["a"], r["b"]))
        edges.add((r["b"], r["a"]))
    for r in rows:
        assert (r["u"], r["v"]) not in edges, r
        assert r["cn"] <= min(r["deg_u"], r["deg_v"]), r
        assert 0.0 < r["jac"] <= 1.0, r


def test_q183_q3_shape_takeordered_broadcast_dim(spark):
    """TPC-H Q3 shape: segment filter applied dim-side and broadcast,
    ONE exchange (the orderkey rollup), LIMIT planned as
    TakeOrderedAndProject — never a global sort of the aggregate."""
    df = QUERIES["q183_shipping_priority"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 1, plan
    assert plan.count("BroadcastHashJoin") == 2, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "Sort " not in plan.split("TakeOrderedAndProject")[0], plan
    rows = df.collect()
    assert len(rows) <= 10
    revs = [r["revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_q184_q6_shape_pushdown_and_pure_agg(spark):
    """TPC-H Q6 shape: all three predicates reach the parquet scan
    (PushedFilters non-empty on shipdate/quantity), and the plan is
    scan → filter → partial agg → single final agg — no join, no
    window, no generator."""
    df = QUERIES["q184_forecast_revenue_change"](spark, SF)
    plan = _plan(df)
    assert "PushedFilters: [" in plan, plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "l_shipdate" in pushed and "l_quantity" in pushed, pushed
    assert "Join" not in plan and "Window" not in plan, plan
    assert plan.count("Exchange SinglePartition") == 1, plan
    assert "Generate" not in plan, plan
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["revenue"] > 0


def test_q185_chunking_zero_exchange_full_coverage(spark):
    """RAG chunker: a stateless narrow generator — ZERO exchanges, no
    join, no Python; and the chunk geometry is lossless: per doc the
    chunk count matches 1 + ceil(max(0, n-32)/24), consecutive chunks
    start exactly 24 apart, and the last chunk reaches the final
    token (full coverage, 8-token overlap elsewhere)."""
    df = QUERIES["q185_token_chunking"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 0, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan
    rows = df.collect()
    from collections import defaultdict

    per_doc = defaultdict(list)
    for r in rows:
        per_doc[r["doc_id"]].append(r)
    from dedup.normalize import normalize_sql  # noqa: F401  (convention ref)

    docs = {
        r["doc_id"]: r["n"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .selectExpr("doc_id", "size(split(" +
                    "trim(regexp_replace(lower(text), '\\\\s+', ' ')), ' ')) AS n")
        .collect()
    }
    for doc, chunks in per_doc.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        n = docs[doc]
        expect = 1 + max(0, (max(0, n - 32) + 23) // 24)
        assert len(chunks) == expect, (doc, n, len(chunks))
        for i, c in enumerate(chunks):
            assert c["start_tok"] == i * 24 + 1
        last = chunks[-1]
        assert last["start_tok"] + last["n_tok"] - 1 == n, (doc, n, last)


def test_q186_cusum_prefix_min_identity(spark):
    """CUSUM: the windows-only prefix-min formulation equals the
    sequential recursion S_t = max(0, S_{t-1} + dev_t), replayed
    in-process per type; the corpus collapses once to the day grain
    (no parquet in the final plan) and the mean-rate relation is
    broadcast."""
    df = QUERIES["q186_cusum_changepoints"](spark, SF)
    plan = _plan(df)
    assert "Scan parquet" not in plan, plan
    assert plan.count("BroadcastHashJoin") == 1, plan
    rows = df.collect()
    from collections import defaultdict

    per_type = defaultdict(list)
    for r in rows:
        per_type[r["event_type"]].append(r)
    for t, days in per_type.items():
        days.sort(key=lambda r: r["day"])
        total = sum(r["n"] for r in days)
        k = (1000 * total) // len(days)
        s = 0
        for r in days:
            s = max(0, s + (r["n"] * 1000 - k))
            assert r["cusum_milli"] == s, (t, r, s)
            assert r["alarm"] == (s > 5 * k)


def test_q187_bpe_greedy_merge_properties(spark):
    """BPE merges: three rounds, each merged symbol is its pair minus
    the separator, counts are positive and the argmax count is
    non-increasing round over round (any pair created by a merge
    inherits a subset of some pre-merge pair's occurrences, so the
    max can only fall)."""
    rows = QUERIES["q187_bpe_merge_rounds"](spark, SF).collect()
    assert [r["round"] for r in rows] == [1, 2, 3]
    for r in rows:
        assert r["merged"] == r["pair"].replace(" ", "")
        assert " " in r["pair"] and r["n_pairs"] > 0
    ns = [r["n_pairs"] for r in rows]
    assert ns[0] >= ns[1] >= ns[2], ns


def test_q188_modularity_identities(spark):
    """Modularity: Σ intra_edges <= m, Σ deg_sum == 2m, every
    contribution equals 4·m·e_c - d_c², and the reported total equals
    the recomputed Σcontrib/(4m²); pair-relation-sized joins only (no
    cartesian)."""
    df = QUERIES["q188_community_modularity"](spark, SF)
    plan = _plan(df)
    assert "CartesianProduct" not in plan, plan
    rows = df.collect()
    assert rows
    m = rows[0]["m_edges"]
    assert all(r["m_edges"] == m for r in rows)
    assert sum(r["deg_sum"] for r in rows) == 2 * m
    assert sum(r["intra_edges"] for r in rows) <= m
    tot = 0
    for r in rows:
        assert r["contrib_num"] == 4 * m * r["intra_edges"] - r["deg_sum"] ** 2
        tot += r["contrib_num"]
    want = round(tot / (4.0 * m * m), 6)
    assert all(abs(r["modularity"] - want) < 1e-9 for r in rows)


def test_q189_assortativity_range_and_symmetry(spark):
    """Assortativity: one row, r in [-1, 1], and n_arcs is exactly
    twice the undirected pair count (both orientations counted); the
    computation never scans parquet (pair relation only)."""
    from dedup.queries import q12_docs_token_jaccard_pairs

    df = QUERIES["q189_degree_assortativity"](spark, SF)
    plan = _plan(df)
    assert "Scan parquet" not in plan, plan
    rows = df.collect()
    assert len(rows) == 1
    n_pairs = q12_docs_token_jaccard_pairs(spark, SF).count()
    assert rows[0]["n_arcs"] == 2 * n_pairs
    assert -1.0 <= rows[0]["assortativity"] <= 1.0


def test_q190_autocorr_lag_pair_counts(spark):
    """Autocorrelation: per (type, lag) the pair count is exactly
    n_days - lag (dense per-type day series at this SF), r in [-1,1],
    and the whole series stage is windows over the day grain — no
    join in the plan at all."""
    df = QUERIES["q190_daily_autocorrelation"](spark, SF)
    plan = _plan(df)
    assert "Join" not in plan, plan
    rows = df.collect()
    daily = {
        (r["event_type"], r["n"])
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .selectExpr(
            "event_type",
            "unix_micros(cast(ts as timestamp)) div 86400000000 AS day",
        )
        .groupBy("event_type")
        .agg(F.countDistinct("day").alias("n"))
        .collect()
    }
    ndays = dict(daily)
    for r in rows:
        assert r["n_pairs"] == ndays[r["event_type"]] - r["lag"], r
        assert -1.0 <= r["autocorr"] <= 1.0


def test_q191_power_iteration_matches_integer_replay(spark):
    """Power iteration: bit-exact parity with an independent numpy
    integer replay of the same three rounds (quantize, matvec, matvec,
    sign-split rescale), and the Rayleigh quotient ||Av||^2/||v||^2
    rises monotonically over the rounds — the guarantee power
    iteration actually gives on a flat spectrum. The corpus explodes
    once into the checkpointed triple store (no parquet in the final
    plan)."""
    import numpy as np

    df = QUERIES["q191_power_iteration_pc1"](spark, SF)
    plan = _plan(df)
    assert "Scan parquet" not in plan, plan
    rows = df.collect()
    assert len(rows) == 64
    got = np.zeros(64, dtype=np.int64)
    for r in rows:
        got[r["dim"]] = r["pc1_scaled"]
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    A = np.round(
        np.array([r["embedding"] for r in emb], dtype=np.float64) * 10000
    ).astype(np.int64)
    v = np.ones(64, dtype=np.int64)
    rayleigh = []
    for _ in range(3):
        u = A @ v
        w = A.T @ u
        rayleigh.append(float(u @ u) / float(v @ v))
        D = np.abs(w).max() // 1000 + 1
        v = np.sign(w) * (np.abs(w) // D)
    assert np.array_equal(got, v), (got[:8], v[:8])
    u = A @ v
    rayleigh.append(float(u @ u) / float(v @ v))
    assert all(b >= a * 0.999 for a, b in zip(rayleigh, rayleigh[1:])), rayleigh


def test_q192_lloyd_step_matches_numpy(spark):
    """Lloyd step: assignments, inertia, and centroid shifts replayed
    exactly in numpy from the same integer quantization — bit-for-bit
    equal per cluster; every vector is assigned (counts sum to n)."""
    import numpy as np

    rows = QUERIES["q192_kmeans_lloyd_step"](spark, SF).collect()
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    A = (
        np.round(np.array([r["embedding"] for r in emb], dtype=np.float64) * 10000)
        .astype(np.int64)
        + 10000
    )
    ids = np.array([r["vec_id"] for r in emb])
    labels = np.array([r["label"] for r in emb])
    order = np.argsort(ids)
    A, ids, labels = A[order], ids[order], labels[order]
    cent = {}
    for lab in sorted(set(labels.tolist())):
        first = np.argmax(labels == lab)
        cent[lab] = A[first]  # min vec_id per label (ids sorted)
    ks = sorted(cent)
    C = np.stack([cent[k] for k in ks])
    d2 = ((A[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    assign = d2.argmin(axis=1)  # ties: argmin takes first = smaller cluster
    got = {r["cluster"]: r for r in rows}
    total = 0
    for i, k in enumerate(ks):
        mask = assign == i
        n = int(mask.sum())
        total += n
        assert got[k]["n_assigned"] == n, (k, got[k]["n_assigned"], n)
        assert got[k]["inertia"] == int(d2[mask, i].sum()), k
        newc = A[mask].sum(axis=0) // max(1, n)
        assert got[k]["centroid_shift_sq"] == int(((newc - C[i]) ** 2).sum()), k
    assert total == len(A)


def test_q193_survivorship_field_rules(spark):
    """Survivorship: every golden doc is a member of its own cluster
    with the cluster-max n_chars; the modal lang is the true mode
    with the deterministic tie; members >= 2 (singletons excluded);
    sources_csv is sorted."""
    from collections import Counter, defaultdict

    from dedup.queries import q12_docs_token_jaccard_pairs

    rows = QUERIES["q193_survivorship_merge"](spark, SF).collect()
    assert rows
    docs = {
        r["doc_id"]: r
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    pairs = q12_docs_token_jaccard_pairs(spark, SF).select("a", "b").collect()
    adj = defaultdict(set)
    for p in pairs:
        adj[p["a"]].add(p["b"])
        adj[p["b"]].add(p["a"])
    comp = {}
    for start in adj:
        if start in comp:
            continue
        seen, stack = {start}, [start]
        while stack:
            u = stack.pop()
            for v in adj[u]:
                if v not in seen:
                    seen.add(v)
                    stack.append(v)
        rep = min(seen)
        for v in seen:
            comp[v] = rep
    clusters = defaultdict(list)
    for d, rep in comp.items():
        clusters[rep].append(d)
    assert {r["cluster_rep"] for r in rows} == set(clusters)
    for r in rows:
        members = clusters[r["cluster_rep"]]
        assert r["n_members"] == len(members) >= 2
        best = sorted(
            members, key=lambda d: (-docs[d]["n_chars"], d)
        )[0]
        assert r["golden_doc"] == best
        assert r["golden_n_chars"] == docs[best]["n_chars"]
        langs = Counter(docs[d]["lang"] for d in members)
        top = sorted(langs.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        assert r["modal_lang"] == top
        srcs = r["sources_csv"].split(",")
        assert srcs == sorted(srcs)


def test_q194_scd2_interval_chain(spark):
    """SCD2: one shuffle total (three windows share the user_id
    partitioning); per user the intervals chain exactly — versions
    dense from 1, each valid_to equals the next valid_from, exactly
    one open current row, and consecutive versions never repeat the
    same event_type."""
    df = QUERIES["q194_scd2_intervals"](spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 1, plan
    assert "Join" not in plan, plan
    rows = df.collect()
    from collections import defaultdict

    per_user = defaultdict(list)
    for r in rows:
        per_user[r["user_id"]].append(r)
    for u, hist in per_user.items():
        hist.sort(key=lambda r: r["version"])
        assert [h["version"] for h in hist] == list(range(1, len(hist) + 1))
        assert sum(1 for h in hist if h["is_current"]) == 1
        assert hist[-1]["is_current"] and hist[-1]["valid_to_us"] is None
        for a, b in zip(hist, hist[1:]):
            assert a["valid_to_us"] == b["valid_from_us"], (u, a, b)
            assert a["event_type"] != b["event_type"], (u, a, b)


def test_q195_paths_census_consistency(spark):
    """Frequent paths: ranked 1..10 with counts non-increasing; the
    total path population equals Σ_users max(0, n_events - 2) and the
    top path's count is bounded by it."""
    df = QUERIES["q195_frequent_paths"](spark, SF)
    rows = df.collect()
    assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))
    ns = [r["n"] for r in rows]
    assert ns == sorted(ns, reverse=True)
    per_user = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    total_paths = sum(max(0, r["n"] - 2) for r in per_user)
    assert ns[0] <= total_paths
    assert all("&" not in r["path"] and r["path"].count(">") == 2 for r in rows)


def test_q196_minhash_estimator_math(spark):
    """MinHash audit: per-pair est = lanes_matched/16 exactly, err is
    their difference, and the mean absolute error over the dup pairs
    is within the 16-lane binomial envelope (sigma <= 1/(2*sqrt(16))
    per pair at J=0.5; mean |err| must come in well under 3 sigma).
    Signature build is one tokenize pass — no 16x explode node."""
    rows = QUERIES["q196_minhash_estimate_accuracy"](spark, SF).collect()
    assert rows
    errs = []
    for r in rows:
        assert abs(r["est_jac"] - r["lanes_matched"] / 16.0) < 1e-9
        assert abs(r["err"] - round(r["est_jac"] - r["jac"], 4)) < 1e-3
        assert 0 <= r["lanes_matched"] <= 16
        errs.append(abs(r["err"]))
    mae = sum(errs) / len(errs)
    assert mae < 0.25, mae  # 2x the binomial sigma at J~0.5


def test_q197_lsh_band_collision_guarantee(spark):
    """Portable LSH: every q12 dup pair with estimated-signature
    similarity 1.0 (all 16 lanes equal) MUST appear as a candidate
    (a full signature match implies every band matches); candidates
    carry 1..4 shared bands and a real exact Jaccard; the band join
    is an equi-join (no cartesian)."""
    df = QUERIES["q197_portable_lsh_candidates"](spark, SF)
    plan = _plan(df)
    assert "CartesianProduct" not in plan, plan
    rows = df.collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_bands_shared"] <= 4
        assert 0.0 <= r["jac"] <= 1.0
    cand = {(r["a"], r["b"]) for r in rows}
    full = {
        (r["a"], r["b"])
        for r in QUERIES["q196_minhash_estimate_accuracy"](spark, SF).collect()
        if r["lanes_matched"] == 16
    }
    assert full <= cand, full - cand


def test_q198_simhash_matches_python_replay(spark):
    """Portable SimHash: the fingerprint construction and the full
    Hamming<=4 pair set replayed bit-for-bit in pure python (hashlib
    md5, same 60-bit lane convention, same tf-weighted sign sums) —
    the strongest pin available: candidate SET equality plus exact
    per-pair distances, independent of the corpus's similarity
    structure."""
    import hashlib
    import re
    from collections import Counter, defaultdict

    rows = QUERIES["q198_portable_simhash_pairs"](spark, SF).collect()
    assert rows
    assert all(0 <= r["hamming"] <= 4 and 0.0 <= r["jac"] <= 1.0 for r in rows)
    got = {(r["a"], r["b"]): r["hamming"] for r in rows}
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    fps = {}
    blocks = defaultdict(list)
    for d in docs:
        norm = re.sub(r"\s+", " ", d["text"].lower()).strip()
        tf = Counter(t for t in norm.split(" ") if len(t) >= 1)
        bits = [0] * 16
        for tok, n in tf.items():
            h = int(hashlib.md5(f"{tok}|sh-v1".encode()).hexdigest()[:15], 16)
            for j in range(16):
                bits[j] += n if (h >> j) & 1 else -n
        fp = sum(1 << j for j in range(16) if bits[j] > 0)
        fps[d["doc_id"]] = fp
        blocks[(d["lang"], d["source"])].append(d["doc_id"])
    want = {}
    for ids in blocks.values():
        ids.sort()
        for i in range(len(ids)):
            for k in range(i + 1, len(ids)):
                a, b = ids[i], ids[k]
                ham = bin(fps[a] ^ fps[b]).count("1")
                if ham <= 4:
                    want[(a, b)] = ham
    assert got == want, (
        len(got), len(want),
        list(set(got) ^ set(want))[:5],
    )


def test_q199_skew_census_arithmetic(spark):
    """Skew census: Σ bucket_size·n_buckets = 4·n_docs (every doc
    emits 4 band keys), pair arithmetic is exact per size class, and
    capped <= total with equality exactly when bucket_size <= 8."""
    rows = QUERIES["q199_lsh_bucket_skew_census"](spark, SF).collect()
    assert rows
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r["bucket_size"] * r["n_buckets"] for r in rows) == 4 * n_docs
    for r in rows:
        n, c = r["bucket_size"], min(r["bucket_size"], 8)
        assert r["total_pairs"] == r["n_buckets"] * (n * (n - 1) // 2)
        assert r["capped_pairs"] == r["n_buckets"] * (c * (c - 1) // 2)
        assert (r["capped_pairs"] == r["total_pairs"]) == (n <= 8)


def test_q200_pipeline_cluster_axioms(spark):
    """End-to-end portable pipeline: cluster assignments satisfy the
    partition axioms — every verified pair's endpoints share a
    cluster, the rep is the member minimum, sizes equal member
    counts, every member belongs to exactly one cluster, and every
    clustered doc touches at least one verified edge."""
    from collections import defaultdict

    rows = QUERIES["q200_portable_dedup_pipeline"](spark, SF).collect()
    assert rows
    pairs = (
        QUERIES["q197_portable_lsh_candidates"](spark, SF)
        .filter(F.col("jac") >= 0.5)
        .collect()
    )
    assert pairs
    cl = {}
    for r in rows:
        assert r["doc_id"] not in cl
        cl[r["doc_id"]] = r["cluster_rep"]
    for p in pairs:
        assert cl[p["a"]] == cl[p["b"]], p
    members = defaultdict(list)
    for r in rows:
        members[r["cluster_rep"]].append(r["doc_id"])
    sizes = {r["cluster_rep"]: r["cluster_size"] for r in rows}
    touched = set()
    for p in pairs:
        touched.add(p["a"])
        touched.add(p["b"])
    for rep, mem in members.items():
        assert rep == min(mem)
        assert sizes[rep] == len(mem) >= 2
    assert set(cl) == touched


def test_q201_estimate_upper_bounds_actual(spark):
    """Join-cardinality estimation: the bucket-histogram product is a
    PROVEN upper bound on the true join size (within-bucket products
    over-count key-level products), so est >= actual and the ratio
    >= 1; one row out."""
    rows = QUERIES["q201_join_cardinality_estimate"](spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["est_pairs"] >= r["actual_pairs"] > 0
    assert r["overcount_ratio"] >= 1.0
    assert 1 <= r["n_buckets_hit"] <= 256


def test_q202_rolling_slope_head_and_window(spark):
    """Rolling trend: the day grain collapses once and all five
    moments share ONE day-grain repartition (exactly two exchanges:
    corpus collapse + window repartition — Catalyst may stack Window
    operators but they ride the same exchange); n_window ramps 1..7
    then stays 7; slope is non-NULL whenever the frame has >= 2
    points."""
    df = QUERIES["q202_rolling_trend"](spark, SF)
    plan = _plan(df)
    assert "Join" not in plan, plan
    assert _n_exchanges(df) == 2, plan
    rows = df.collect()
    from collections import defaultdict

    per_type = defaultdict(list)
    for r in rows:
        per_type[r["event_type"]].append(r)
    for t, days in per_type.items():
        days.sort(key=lambda r: r["day"])
        for i, r in enumerate(days):
            assert r["n_window"] == min(i + 1, 7), (t, i, r)
            if r["n_window"] >= 2:
                assert r["slope"] is not None


def test_q203_percolation_monotonicity(spark):
    """Percolation: as the threshold tightens, edges, nodes, and the
    largest component are non-increasing, while components can only
    split from merging edges removed — and at every threshold the
    component count is consistent (n_components <= n_nodes // 2
    since every component has >= 2 nodes)."""
    rows = QUERIES["q203_percolation_curve"](spark, SF).collect()
    rows.sort(key=lambda r: r["threshold"])
    assert [r["threshold"] for r in rows] == [0.5, 0.6, 0.7, 0.8]
    for a, b in zip(rows, rows[1:]):
        assert b["n_edges"] <= a["n_edges"]
        assert b["n_nodes"] <= a["n_nodes"]
        assert b["largest_component"] <= a["largest_component"]
    for r in rows:
        if r["n_nodes"]:
            assert 1 <= r["n_components"] <= r["n_nodes"] // 2
            assert r["largest_component"] >= 2


def test_q204_ztest_consistency(spark):
    """z-test: one row; counts partition the corpus (n1 + n2 == total
    events, conv counts bounded); z recomputed in-process from the
    emitted integers matches to rounding; significance agrees with
    |z| > 1.96."""
    import math

    rows = QUERIES["q204_two_proportion_ztest"](spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    total = spark.read.parquet(f"{SF}/events.parquet").count()
    assert r["n1"] + r["n2"] == total
    assert 0 < r["conv1"] < r["n1"] and 0 < r["conv2"] < r["n2"]
    p1, p2 = r["conv1"] / r["n1"], r["conv2"] / r["n2"]
    pp = (r["conv1"] + r["conv2"]) / (r["n1"] + r["n2"])
    z = (p1 - p2) / math.sqrt(pp * (1 - pp) * (1 / r["n1"] + 1 / r["n2"]))
    assert abs(r["z"] - round(z, 4)) < 1e-9
    assert r["significant"] == (abs(r["z"]) > 1.96)


def test_q205_langid_confusion_accuracy(spark):
    """Language ID audit: the confusion matrix covers every doc
    exactly once (each doc predicted exactly one language), both axes
    draw from the true label set, and the reported accuracy is ~chance
    — the CORRECT verdict on this corpus, whose synthetic lang labels
    share a single vocabulary (the audit exists to catch exactly
    this: a lang column not recoverable from text)."""
    rows = QUERIES["q205_ngram_language_id"](spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("lang").collect()
    n_docs = len(docs)
    langs = {r["lang"] for r in docs}
    assert sum(r["n"] for r in rows) == n_docs
    assert {r["lang"] for r in rows} <= langs
    assert {r["predicted"] for r in rows} <= langs
    correct = sum(r["n"] for r in rows if r["lang"] == r["predicted"])
    # shared-vocabulary labels: accuracy must sit near chance, far from
    # the ~100% a genuinely multilingual corpus would produce
    assert correct < 0.6 * n_docs, correct


def test_q206_allocation_sums_to_budget(spark):
    """Neyman allocation: integer allocations sum to exactly 100
    (largest-remainder closure), every source appears once, and the
    integer allocation differs from the exact share by < 1."""
    rows = QUERIES["q206_neyman_allocation"](spark, SF).collect()
    assert len(rows) == len({r["source"] for r in rows})
    assert sum(r["n_alloc"] for r in rows) == 100
    for r in rows:
        assert abs(r["n_alloc"] - r["alloc_exact"]) < 1.0
        assert r["sd_len"] >= 0


def test_q207_knn_separability(spark):
    """kNN audit: per-label rows cover every vector exactly once, and
    the audit's verdict on this corpus is the CORRECT one — near
    chance (the within-class spread dwarfs centroid separation, so
    point-level 5-NN cannot recover labels; a separable space would
    read high under the same query). Bounds stay sane per label."""
    rows = QUERIES["q207_knn_label_accuracy"](spark, SF).collect()
    n_vecs = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert sum(r["n"] for r in rows) == n_vecs
    correct = sum(r["n_correct"] for r in rows)
    assert correct < 0.3 * n_vecs, (correct, n_vecs)
    assert all(0 <= r["n_correct"] <= r["n"] for r in rows)


def test_q208_calibration_monotone_support(spark):
    """Calibration: levels partition the q196 pairs; mean true
    Jaccard rises with the estimator level overall (Spearman-positive
    across levels weighted by support), and every gap is the exact
    difference of its columns."""
    rows = QUERIES["q208_minhash_calibration"](spark, SF).collect()
    assert rows
    tot = sum(r["n_pairs"] for r in rows)
    n196 = len(QUERIES["q196_minhash_estimate_accuracy"](spark, SF).collect())
    assert tot == n196
    for r in rows:
        assert abs(r["est_jac"] - round(r["lanes_matched"] / 16.0, 4)) < 1e-9
        assert abs(
            r["calibration_gap"] - round(r["est_jac"] - r["mean_true_jac"], 4)
        ) < 1e-3
    lv = sorted(rows, key=lambda r: r["lanes_matched"])
    if len(lv) >= 2:
        assert lv[-1]["mean_true_jac"] > lv[0]["mean_true_jac"]


def test_q209_credit_conservation(spark):
    """Attribution: every purchase's credit decomposes exactly —
    n_prior_views * credit_each + remainder == 1000 (credit conserved
    to the milli); direct purchases carry the full 1000 as remainder;
    purchase rows cover every purchase event exactly once."""
    rows = QUERIES["q209_linear_attribution"](spark, SF).collect()
    n_buys = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert len(rows) == n_buys
    assert len({r["purchase_event_id"] for r in rows}) == n_buys
    for r in rows:
        assert (
            r["n_prior_views"] * r["credit_each_milli"] + r["remainder_milli"]
            == 1000
        ), r
        if r["n_prior_views"] == 0:
            assert r["remainder_milli"] == 1000 and r["credit_each_milli"] == 0


def test_q210_splitter_census_coverage(spark):
    """Range splitters: ranges cover the corpus exactly (counts sum to
    n_docs), range ids are within 0..7, and the sample-estimated
    splitters keep every range loaded (no empty range, load factors
    positive and averaging ~1)."""
    rows = QUERIES["q210_range_splitter_balance"](spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert all(0 <= r["range_id"] <= 7 for r in rows)
    assert len(rows) >= 7
    lf = [r["load_factor"] for r in rows]
    assert all(f > 0 for f in lf)
    assert abs(sum(r["n_docs"] * r["load_factor"] for r in rows) / n_docs - 1) < 0.35


def test_q211_mase_counts(spark):
    """MASE: lag-7 and lag-1 populations are exactly n_days-7 and
    n_days-1 per type (dense observed-day series at this SF), and
    mase equals the recomputed ratio."""
    rows = QUERIES["q211_naive_forecast_mase"](spark, SF).collect()
    ndays = {
        r["event_type"]: r["nd"]
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .selectExpr(
            "event_type",
            "unix_micros(cast(ts as timestamp)) div 86400000000 AS day",
        )
        .groupBy("event_type")
        .agg(F.countDistinct("day").alias("nd"))
        .collect()
    }
    for r in rows:
        assert r["n7"] == ndays[r["event_type"]] - 7
        assert r["n1"] == ndays[r["event_type"]] - 1
        want = round((r["e7"] / r["n7"]) / (r["e1"] / r["n1"]), 4)
        assert abs(r["mase"] - want) < 1e-9


def test_q212_arrow_lane_in_plan(spark):
    """The Arrow row: the plan contains a MapInPandas/ArrowEval node
    and NO shuffle (stateless narrow map at scan parallelism); every
    doc with non-space content appears exactly once."""
    df = QUERIES["q212_arrow_char_mode"](spark, SF)
    plan = _plan(df)
    assert ("MapInPandas" in plan) or ("ArrowEval" in plan), plan
    assert _n_exchanges(df) == 0, plan
    rows = df.collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(rows) == n_docs  # no all-space docs at this SF
    assert all(r["top_char"] != " " and r["top_char_n"] > 0 for r in rows)


def test_q213_twap_single_exchange_and_bounds(spark):
    """TWAP: the lead window and the user rollup share ONE user_id
    exchange (Catalyst reuses the window's partitioning for the
    groupBy); each user's TWAP lies within [min, max] of their
    observed values, and n_intervals is exactly (non-null readings - 1)
    for users with >= 2 readings."""
    df = QUERIES["q213_time_weighted_average"](spark, SF)
    assert _n_exchanges(df) == 1, _plan(df)
    rows = {r["user_id"]: r for r in df.collect()}
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .collect()
    )
    for e in ev:
        if e["n"] >= 2:
            r = rows[e["user_id"]]
            assert r["n_intervals"] == e["n"] - 1
            assert e["lo"] - 1e-4 <= r["twap"] <= e["hi"] + 1e-4
        else:
            assert e["user_id"] not in rows


def test_q214_sweep_monotone_in_banding(spark):
    """LSH sweep: bands of (2x8) are unions of (4x4) bands which are
    unions of (8x2) bands, so the candidate set (and thus the verified
    set) is monotone non-decreasing as rows-per-band shrinks; verified
    <= candidates everywhere and precision is their exact ratio."""
    rows = {
        (r["n_bands"], r["rows_per_band"]): r
        for r in QUERIES["q214_lsh_param_sweep"](spark, SF).collect()
    }
    assert set(rows) == {(2, 8), (4, 4), (8, 2)}
    assert (
        rows[(2, 8)]["n_candidates"]
        <= rows[(4, 4)]["n_candidates"]
        <= rows[(8, 2)]["n_candidates"]
    )
    assert (
        rows[(2, 8)]["n_verified"]
        <= rows[(4, 4)]["n_verified"]
        <= rows[(8, 2)]["n_verified"]
    )
    for r in rows.values():
        assert 0 <= r["n_verified"] <= r["n_candidates"]
        assert abs(r["precision"] - round(r["n_verified"] / r["n_candidates"], 4)) < 1e-9


def test_q215_state_monotone_in_watermark(spark):
    """State sizing: a longer retention window can only hold MORE rows
    at peak (the 1h window's live set is a subset of 1d's at every
    instant), and no peak exceeds the corpus row count; every peak is
    at least 1 while events exist."""
    rows = {
        r["watermark"]: r["peak_state_rows"]
        for r in QUERIES["q215_state_size_per_watermark"](spark, SF).collect()
    }
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    assert set(rows) == {"1h", "6h", "1d"}
    assert 1 <= rows["1h"] <= rows["6h"] <= rows["1d"] <= n_events


def test_q216_packing_conservation_and_overshoot(spark):
    """Compaction plan: bytes and docs are conserved exactly; within
    each source every bin overshoots the 8 KiB target by less than
    one file (the prefix-sum rule's guarantee); bin ids start at 0."""
    rows = QUERIES["q216_compaction_planner"](spark, SF).collect()
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("b"))
        .collect()[0]
    )
    assert sum(r["n_docs"] for r in rows) == docs["n"]
    assert sum(r["bin_bytes"] for r in rows) == docs["b"]
    max_file = {}
    for r in rows:
        assert r["bin_id"] >= 0 and r["n_files"] >= 1
        max_file.setdefault(r["source"], 0)
    per_file = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .groupBy("source", F.expr("doc_id div 4").alias("f"))
        .agg(F.sum("n_chars").alias("fb"))
        .groupBy("source")
        .agg(F.max("fb").alias("mx"))
        .collect()
    )
    mx = {r["source"]: r["mx"] for r in per_file}
    for r in rows:
        assert r["bin_bytes"] < 8192 + mx[r["source"]]


def test_q217_dkw_envelope(spark):
    """Sample quantiles: all four levels present, the exact measured
    rank error of each estimate is inside a loose DKW envelope
    (bound ~0.072 at k=512, delta=1%; pinned at 0.1), and n_le/n is
    consistent with the emitted rank_err."""
    rows = QUERIES["q217_sample_quantile_audit"](spark, SF).collect()
    assert [r["level"] for r in rows] == [25, 50, 75, 90]
    for r in rows:
        assert r["rank_err"] <= 0.1, r
        want = round(abs(r["n_le"] / r["n_total"] - r["level"] / 100.0), 6)
        assert abs(r["rank_err"] - want) < 1e-9


def test_q218_dbscan_axioms(spark):
    """DBSCAN: roles partition the vector set exactly; noise has rep
    -1 and no core/border does; every border's rep is some core's
    rep; a core's rep is <= its own id (min-id convention)."""
    rows = QUERIES["q218_dbscan_embeddings"](spark, SF).collect()
    n_vecs = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert len(rows) == n_vecs
    core_reps = {r["cluster_rep"] for r in rows if r["role"] == "core"}
    assert core_reps, "expected some core points at this SF"
    for r in rows:
        if r["role"] == "noise":
            assert r["cluster_rep"] == -1
        elif r["role"] == "core":
            assert 0 <= r["cluster_rep"] <= r["vec_id"]
        else:
            assert r["role"] == "border"
            assert r["cluster_rep"] in core_reps


def test_q219_bag_jaccard_consistency(spark):
    """Bag Jaccard: one row per q12 pair; bag_jac in (0, 1]; delta is
    exactly bag_jac - set_jac; an identical-text pair (if any) would
    have bag_jac 1.0 — spot-check that pairs with set_jac 1.0 still
    have bag_jac <= 1."""
    rows = QUERIES["q219_bag_jaccard_pairs"](spark, SF).collect()
    n_pairs = QUERIES["q12_docs_token_jaccard_pairs"](spark, SF).count()
    assert len(rows) == n_pairs
    for r in rows:
        assert 0 < r["bag_jac"] <= 1.0
        assert abs(r["delta"] - round(r["bag_jac"] - r["set_jac"], 6)) < 1e-9


def test_q220_class_partition(spark):
    """k-anonymity: equivalence classes partition the events table
    exactly; l-diversity never exceeds class size; the at_risk flag
    is (class_size < 5) everywhere."""
    rows = QUERIES["q220_k_anonymity_audit"](spark, SF).collect()
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    assert sum(r["class_size"] for r in rows) == n_events
    for r in rows:
        assert 1 <= r["n_users"] <= r["class_size"]
        assert r["at_risk"] == (1 if r["class_size"] < 5 else 0)


def test_q221_ta_theorem(spark):
    """TA correctness: tau is non-increasing and kth_best_seen
    non-decreasing in depth; once stopped, stays stopped; and at the
    FIRST stopped depth the true global top-5 (by total, doc_id
    tie-break) is entirely within the seen set — the certificate
    that stopping early loses nothing."""
    rows = sorted(
        QUERIES["q221_threshold_algorithm_audit"](spark, SF).collect(),
        key=lambda r: r["depth"],
    )
    for p, n in zip(rows, rows[1:]):
        assert n["tau"] <= p["tau"]
        assert n["kth_best_seen"] >= p["kth_best_seen"]
        assert n["stopped"] >= p["stopped"]
    stopped = [r for r in rows if r["stopped"] == 1]
    assert stopped, "TA never certified a stop by depth 256"
    d_star = stopped[0]["depth"]
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    from dedup.normalize import normalize_sql

    scored = docs.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("s1"),
        (
            F.size(
                F.array_distinct(F.split(normalize_sql(F.col("text")), " "))
            ).cast("long")
            * 8
        ).alias("s2"),
    ).withColumn("total", F.col("s1") + F.col("s2"))
    from pyspark.sql import Window as W

    ranked = (
        scored.withColumn(
            "rank1", F.row_number().over(W.orderBy(F.desc("s1"), "doc_id"))
        )
        .withColumn(
            "rank2", F.row_number().over(W.orderBy(F.desc("s2"), "doc_id"))
        )
        .withColumn("minrank", F.least("rank1", "rank2"))
        .withColumn(
            "trk", F.row_number().over(W.orderBy(F.desc("total"), "doc_id"))
        )
        .collect()
    )
    top5 = {r["doc_id"] for r in ranked if r["trk"] <= 5}
    seen = {r["doc_id"] for r in ranked if r["minrank"] <= d_star}
    assert top5 <= seen, (d_star, top5 - seen)


def test_q222_merge_equals_recompute(spark):
    """IVM: every merged statistic equals the full recompute — the
    algebraic-mergeability contract holds for +/least/greatest and
    for the re-distincted user sets; one row per event type."""
    rows = QUERIES["q222_ivm_merge_audit"](spark, SF).collect()
    n_types = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("event_type")
        .distinct()
        .count()
    )
    assert len(rows) == n_types
    for r in rows:
        assert r["match"] == 1, r
        assert r["n_merged"] == r["n_full"]
        assert r["nu_merged"] == r["nu_full"]


def test_q223_haar_reconstruction(spark):
    """Haar: 16 coefficients per type (8+4+2+1 details + 1 smooth),
    and inverting the pyramid (a=(s+d)/2, b=(s-d)/2, top-down)
    reproduces the gap-filled first-16-day counts bit-exactly."""
    rows = QUERIES["q223_haar_pyramid"](spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet").selectExpr(
        "event_type",
        "unix_micros(cast(ts as timestamp)) div 86400000000 AS day",
    )
    d0 = ev.agg(F.min("day")).collect()[0][0]
    truth = {}
    for r in (
        ev.withColumn("idx", (F.col("day") - F.lit(d0)).cast("int"))
        .filter(F.col("idx") < 16)
        .groupBy("event_type", "idx")
        .count()
        .collect()
    ):
        truth.setdefault(r["event_type"], [0] * 16)[r["idx"]] = r["count"]
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], {}).setdefault(r["level"], {})[
            r["pos"]
        ] = r["coef"]
    for et, levels in by_type.items():
        assert sorted(len(levels[k]) for k in (1, 2, 3, 4, 5)) == [
            1, 1, 2, 4, 8,
        ]
        vals = [levels[5][0]]
        for lv in (4, 3, 2, 1):
            nxt = []
            for i, s in enumerate(vals):
                d = levels[lv][i]
                assert (s + d) % 2 == 0
                nxt += [(s + d) // 2, (s - d) // 2]
            vals = nxt
        assert vals == truth.get(et, [0] * 16), et


def test_q224_confusion_partition(spark):
    """Naive Bayes: every doc is classified exactly once — confusion
    matrix cells sum to the corpus, and each true-lang row sums to
    that language's doc count."""
    rows = QUERIES["q224_naive_bayes_langid"](spark, SF).collect()
    per_lang = {
        r["lang"]: r["n"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert sum(r["n_docs"] for r in rows) == sum(per_lang.values())
    got = {}
    for r in rows:
        got[r["true_lang"]] = got.get(r["true_lang"], 0) + r["n_docs"]
    assert got == per_lang


def test_q225_u_identity(spark):
    """Mann-Whitney: the U identity u1+u2 = n1*n2 holds exactly in
    doubled-integer space, and group sizes match the corpus."""
    r = QUERIES["q225_mann_whitney_u"](spark, SF).collect()[0]
    ev = spark.read.parquet(f"{SF}/events.parquet").filter(
        F.col("value").isNotNull()
    )
    n1 = ev.filter(F.col("event_type") == "view").count()
    n2 = ev.filter(F.col("event_type") == "purchase").count()
    assert (r["n1"], r["n2"]) == (n1, n2)
    assert r["u1_x2"] + r["u2_x2"] == 2 * n1 * n2
    assert 0 <= r["u1_x2"] <= 2 * n1 * n2


def test_q226_rec_validity(spark):
    """Item-item CF: at most 3 recommendations per customer with
    consecutive ranks, and no recommended part is already in that
    customer's basket."""
    rows = QUERIES["q226_item_item_recommendations"](spark, SF).collect()
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    basket = {
        (r["o_custkey"], r["l_partkey"])
        for r in li.join(
            orders, li.l_orderkey == orders.o_orderkey
        ).select("o_custkey", "l_partkey").distinct().collect()
    }
    per = {}
    for r in rows:
        assert (r["cust"], r["cand"]) not in basket
        per.setdefault(r["cust"], []).append(r["rnk"])
    for ranks in per.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 3


def test_q227_stump_beats_majority(spark):
    """Decision stump: the split's error count never exceeds the
    majority-class baseline, sides partition the data, and accuracy
    is the exact recomputed ratio."""
    r = QUERIES["q227_decision_stump"](spark, SF).collect()[0]
    ev = spark.read.parquet(f"{SF}/events.parquet").filter(
        F.col("value").isNotNull()
        & F.col("event_type").isin("view", "purchase")
    )
    tp = ev.filter(F.col("event_type") == "purchase").count()
    tq = ev.count() - tp
    assert r["n_left"] + r["n_right"] == tp + tq
    assert r["errors"] <= min(tp, tq)
    want = round(1 - r["errors"] / (tp + tq), 6)
    assert abs(r["train_accuracy"] - want) < 1e-9


def test_q228_encoding_bounds(spark):
    """Encoding advisor: runs are between n_distinct and n_rows; the
    chosen encoding has the minimal byte cost among the eligible
    candidates; dict is only offered under 257 symbols."""
    rows = QUERIES["q228_encoding_advisor"](spark, SF).collect()
    assert {r["col"] for r in rows} == {
        "returnflag", "linestatus", "shipdate",
    }
    for r in rows:
        assert r["n_distinct"] <= r["n_runs"] <= r["n_rows"]
        cands = {"plain": r["plain_bytes"], "rle": r["rle_bytes"]}
        if r["n_distinct"] <= 256:
            assert r["dict_bytes"] is not None
            cands["dict"] = r["dict_bytes"]
        else:
            assert r["dict_bytes"] is None
        assert cands[r["chosen"]] == min(cands.values())


def test_q229_cdc_classes_partition(spark):
    """CDC diff: the four classes partition the key universe —
    unchanged+update+delete = v1 keys, unchanged+update+insert = v2
    keys, and the mutation rules predict the delete and insert
    counts exactly."""
    rows = {
        r["change"]: r for r in QUERIES["q229_cdc_snapshot_diff"](spark, SF).collect()
    }
    o = spark.read.parquet(f"{SF}/orders.parquet")
    n_v1 = o.count()
    n_del = o.filter(F.col("o_orderkey") % 17 == 0).count()
    n_ins = o.filter(F.col("o_orderkey") % 13 == 0).count()
    got = {k: v["n_keys"] for k, v in rows.items()}
    assert got.get("delete", 0) == n_del
    assert got.get("insert", 0) == n_ins
    assert (
        got.get("unchanged", 0) + got.get("update", 0) + got.get("delete", 0)
        == n_v1
    )


def test_q230_rfm_partition(spark):
    """RFM: segments partition the customer base; every code digit is
    1..5; totals conserve order counts exactly."""
    rows = QUERIES["q230_rfm_segmentation"](spark, SF).collect()
    o = spark.read.parquet(f"{SF}/orders.parquet")
    n_cust = o.select("o_custkey").distinct().count()
    assert sum(r["n_customers"] for r in rows) == n_cust
    assert sum(r["total_orders"] for r in rows) == o.count()
    for r in rows:
        s = r["segment"]
        assert all(1 <= d <= 5 for d in (s // 100, s // 10 % 10, s % 10))


def test_q231_did_identity(spark):
    """DiD: cell counts partition the valued events, and did equals
    the recomputed double difference of the emitted cell means."""
    r = QUERIES["q231_difference_in_differences"](spark, SF).collect()[0]
    n_valued = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("value").isNotNull())
        .count()
    )
    assert (
        r["n_t_pre"] + r["n_t_post"] + r["n_c_pre"] + r["n_c_post"]
        == n_valued
    )
    want = (r["mean_t_post"] - r["mean_t_pre"]) - (
        r["mean_c_post"] - r["mean_c_pre"]
    )
    assert abs(r["did"] - want) < 5e-6


def test_q232_cuped_reduces_variance(spark):
    """CUPED: the closed-form adjusted variance never exceeds var(Y)
    (cov²/var(X) ≥ 0), the reduction fraction is consistent, and n
    equals the distinct users with valued events."""
    r = QUERIES["q232_cuped_adjustment"](spark, SF).collect()[0]
    n_users = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("value").isNotNull())
        .select("user_id")
        .distinct()
        .count()
    )
    assert r["n"] == n_users
    assert 0 <= r["var_adjusted"] <= r["var_y"]
    assert 0 <= r["reduction"] <= 1
    assert abs(r["reduction"] - (r["var_y"] - r["var_adjusted"]) / r["var_y"]) < 1e-3


def test_q233_ams_envelope(spark):
    """AMS: the 32-lane tug-of-war estimate lands inside a loose
    4-sigma envelope of the exact F2 (sd = sqrt(2/32)·F2), and the
    emitted rel_err matches the estimate/exact pair."""
    r = QUERIES["q233_ams_f2_sketch"](spark, SF).collect()[0]
    assert r["f2_exact"] > 0
    assert r["rel_err"] <= 4 * (2 / 32) ** 0.5, r
    want = abs(r["f2_est"] - r["f2_exact"]) / r["f2_exact"]
    assert abs(r["rel_err"] - want) < 1e-3


def test_q234_truss_fixpoint(spark):
    """4-truss: the 3 unrolled peels reach the true fixpoint at this
    SF — an independent python peel-to-convergence from the q12 pair
    graph yields exactly the surviving edge set, and every survivor
    reports support >= 2."""
    rows = QUERIES["q234_ktruss"](spark, SF).collect()
    pairs = {
        (r["a"], r["b"])
        for r in QUERIES["q12_docs_token_jaccard_pairs"](spark, SF)
        .select("a", "b")
        .collect()
    }
    edges = set(pairs)
    while True:
        def support(e):
            a, b = e
            na = {y for x, y in edges if x == a} | {x for x, y in edges if y == a}
            nb = {y for x, y in edges if x == b} | {x for x, y in edges if y == b}
            return len(na & nb)
        keep = {e for e in edges if support(e) >= 2}
        if keep == edges:
            break
        edges = keep
    got = {(r["a"], r["b"]) for r in rows}
    assert got == edges
    for r in rows:
        assert r["support"] >= 2


def test_q235_jl_concentration(spark):
    """JL: every sampled pair's scaled ratio is inside the loose
    16-dim envelope and the mean ratio concentrates near 1."""
    rows = QUERIES["q235_jl_projection_audit"](spark, SF).collect()
    assert rows
    ratios = [r["ratio"] for r in rows]
    assert all(0.05 <= x <= 5 for x in ratios), (min(ratios), max(ratios))
    mean = sum(ratios) / len(ratios)
    assert 0.6 <= mean <= 1.6, mean


def test_q236_commutativity_and_bound(spark):
    """Join-order audit: both orders report the identical final join
    size (commutativity), estimates upper-bound actuals (the q201
    bucket theorem), and exactly one order is chosen — the est
    argmin."""
    rows = QUERIES["q236_join_order_audit"](spark, SF).collect()
    assert len(rows) == 2
    assert rows[0]["final_rows"] == rows[1]["final_rows"]
    for r in rows:
        assert r["est_intermediate"] >= r["actual_intermediate"]
    chosen = [r for r in rows if r["chosen"] == 1]
    assert len(chosen) == 1
    assert chosen[0]["est_intermediate"] == min(
        r["est_intermediate"] for r in rows
    )


def test_q237_curve_monotone(spark):
    """Stack distances: the hit count is non-decreasing in cache
    size (the LRU inclusion property), hits never exceed non-cold
    accesses, and cold misses equal distinct (user, type) pairs."""
    rows = sorted(
        QUERIES["q237_stack_distance_curve"](spark, SF).collect(),
        key=lambda r: r["cache_size"],
    )
    ev = spark.read.parquet(f"{SF}/events.parquet")
    cold = ev.select("user_id", "event_type").distinct().count()
    total = ev.count()
    for p, n in zip(rows, rows[1:]):
        assert n["hits"] >= p["hits"]
    for r in rows:
        assert r["cold_misses"] == cold
        assert r["accesses"] == total
        assert 0 <= r["hits"] <= total - cold


def test_q238_spike_rule_consistency(spark):
    """Despike: one row per (type, observed day); the spike flag
    exactly matches the emitted med/mad pair under the integer-
    scaled Hampel rule; MAD is never negative."""
    rows = QUERIES["q238_rolling_median_despike"](spark, SF).collect()
    n_cells = (
        spark.read.parquet(f"{SF}/events.parquet")
        .selectExpr(
            "event_type",
            "unix_micros(cast(ts as timestamp)) div 86400000000 AS day",
        )
        .distinct()
        .count()
    )
    assert len(rows) == n_cells
    for r in rows:
        assert r["mad"] >= 0
        want = 1 if round(abs(r["v"] - r["med"]) * 1000) > round(3 * r["mad"] * 1000) else 0
        assert r["is_spike"] == want


def test_q239_kth_certificate(spark):
    """Rank selection: the certificate proves kth-largest-ness —
    strictly-above < k <= at-or-above — and an independent exact
    sort agrees on the value."""
    r = QUERIES["q239_two_phase_rank_select"](spark, SF).collect()[0]
    assert r["n_strictly_above"] < r["k"] <= r["n_at_or_above"]
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .selectExpr("CAST(ROUND(l_extendedprice * 100) AS LONG) AS cents")
        .orderBy(F.desc("cents"))
        .limit(r["k"])
        .collect()
    )
    assert li[-1]["cents"] / 100.0 == r["kth_value"]


def test_q240_front_coding_bounds(spark):
    """Front coding: front bytes never exceed plain + n (lcp >= 0),
    never go below n (suffixes non-negative), lcp cap respected,
    and the saving fraction is the exact recomputed ratio."""
    r = QUERIES["q240_front_coding"](spark, SF).collect()[0]
    assert r["n_terms"] <= r["front_bytes"] <= r["plain_bytes"] + r["n_terms"]
    assert 0 <= r["max_lcp"] <= 16
    want = round(1 - r["front_bytes"] / r["plain_bytes"], 6)
    assert abs(r["saved_frac"] - want) < 1e-9


def test_q241_wedge_accounting(spark):
    """Transitivity audit: closed + open = wedges; every missing
    pair's mean Jaccard sits BELOW the 0.5 verification threshold
    (they were rejected) and above zero (they share a neighbor)."""
    r = QUERIES["q241_transitivity_audit"](spark, SF).collect()[0]
    assert r["n_closed"] + r["n_open"] == r["n_wedges"]
    assert r["n_missing_pairs"] <= r["n_open"]
    assert 0 < r["mean_missing_jac"] < 0.5
    assert abs(r["closure_rate"] - round(r["n_closed"] / r["n_wedges"], 6)) < 1e-9


def test_q242_strata_consistency(spark):
    """Simpson detector: 7 strata; cell counts partition the
    view/purchase events; each flip flag matches the emitted
    integer directions."""
    rows = QUERIES["q242_simpsons_paradox"](spark, SF).collect()
    assert len(rows) == 7
    ev = spark.read.parquet(f"{SF}/events.parquet").filter(
        F.col("event_type").isin("view", "purchase")
    )
    assert sum(r["nt"] + r["nc"] for r in rows) == ev.count()
    for r in rows:
        want = (
            1
            if r["stratum_dir"] != 0
            and r["pooled_dir"] != 0
            and r["stratum_dir"] != r["pooled_dir"]
            else 0
        )
        assert r["flipped"] == want
        assert len({x["pooled_dir"] for x in rows}) == 1


def test_q243_triplet_margins(spark):
    """Triplets: one per q12 pair (when a non-adjacent block-mate
    exists); the hard negative is never the positive, never
    adjacent to the anchor, and its similarity sits below the 0.5
    verification threshold."""
    rows = QUERIES["q243_triplet_mining"](spark, SF).collect()
    pairs = {
        (r["a"], r["b"])
        for r in QUERIES["q12_docs_token_jaccard_pairs"](spark, SF)
        .select("a", "b")
        .collect()
    }
    adj = pairs | {(b, a) for a, b in pairs}
    assert rows and len(rows) <= len(pairs)
    for r in rows:
        assert (r["anchor"], r["positive"]) in pairs
        assert r["negative"] not in (r["anchor"], r["positive"])
        assert (r["anchor"], r["negative"]) not in adj
        assert r["neg_jac"] < 0.5


def test_q244_dropout_rate(spark):
    """Augmentation: every doc keeps a subset (n_kept <= n_tokens),
    the corpus-wide dropout rate concentrates near 1/16, and the
    md5s are deterministic across two runs."""
    rows = QUERIES["q244_token_dropout_augmentation"](spark, SF).collect()
    tot = sum(r["n_tokens"] for r in rows)
    kept = sum(r["n_kept"] for r in rows)
    assert all(0 <= r["n_kept"] <= r["n_tokens"] for r in rows)
    rate = 1 - kept / tot
    assert 0.03 <= rate <= 0.10, rate
    again = {
        r["doc_id"]: r["aug_md5"]
        for r in QUERIES["q244_token_dropout_augmentation"](spark, SF).collect()
    }
    assert all(again[r["doc_id"]] == r["aug_md5"] for r in rows)


def test_q245_kappa_identities(spark):
    """Kappa: cells partition the corpus, po/pe/kappa satisfy their
    defining identities, and kappa <= po (pe >= 0)."""
    r = QUERIES["q245_cohens_kappa"](spark, SF).collect()[0]
    assert r["n11"] + r["n10"] + r["n01"] + r["n00"] == r["n"]
    po = (r["n11"] + r["n00"]) / r["n"]
    pe = (
        (r["n11"] + r["n10"]) * (r["n11"] + r["n01"])
        + (r["n01"] + r["n00"]) * (r["n10"] + r["n00"])
    ) / r["n"] ** 2
    assert abs(r["po"] - round(po, 6)) < 1e-9
    assert abs(r["pe"] - round(pe, 6)) < 1e-9
    assert abs(r["kappa"] - round((po - pe) / (1 - pe), 6)) < 1e-6
    assert -1 <= r["kappa"] <= 1


def test_q246_filter_zero_false_negatives(spark):
    """Q-gram filter theorem: brute-forcing levenshtein <= 2 over
    every same-block pair yields EXACTLY the query's pair set — the
    count filter dropped nothing it shouldn't, and every output
    edge satisfies ed <= 2 with the bound-consistent common count."""
    rows = QUERIES["q246_qgram_edit_join"](spark, SF).collect()
    got = {(r["a"], r["b"]) for r in rows}
    from dedup.normalize import normalize_sql as _n

    base = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "lang", "source", _n(F.col("text")).alias("s"))
        .collect()
    )
    import itertools

    def ed2(x, y):
        if abs(len(x) - len(y)) > 2:
            return False
        prev = list(range(len(y) + 1))
        for i, cx in enumerate(x, 1):
            cur = [i] + [0] * len(y)
            for j, cy in enumerate(y, 1):
                cur[j] = min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (cx != cy),
                )
            if min(cur) > 2:
                return False
            prev = cur
        return prev[-1] <= 2

    blocks = {}
    for r in base:
        blocks.setdefault((r["lang"], r["source"]), []).append(r)
    want = set()
    for docs in blocks.values():
        for x, y in itertools.combinations(
            sorted(docs, key=lambda d: d["doc_id"]), 2
        ):
            if ed2(x["s"], y["s"]):
                want.add((x["doc_id"], y["doc_id"]))
    assert got == want
    for r in rows:
        assert r["ed"] <= 2
        assert r["common"] >= max(r["na"], r["nb"]) - 4


def test_q247_tail_is_exact(spark):
    """VaR/CVaR: k = ceil(0.05 n); CVaR <= VaR (mean of the worst k
    is at most the k-th worst); recompute against an exact sort."""
    r = QUERIES["q247_var_cvar"](spark, SF).collect()[0]
    daily = sorted(
        (
            row["cents"], row["day"]
        )
        for row in spark.read.parquet(f"{SF}/orders.parquet")
        .selectExpr(
            "unix_micros(cast(o_orderdate as timestamp))"
            " div 86400000000 AS day",
            "CAST(ROUND(o_totalprice * 100) AS LONG) AS c",
        )
        .groupBy("day")
        .agg(F.sum("c").alias("cents"))
        .collect()
    )
    import math

    k = math.ceil(len(daily) * 0.05)
    assert r["n_days"] == len(daily) and r["k"] == k
    assert r["var_value"] == daily[k - 1][0] / 100.0
    assert r["cvar_value"] <= r["var_value"]
    want = round(sum(c for c, _ in daily[:k]) / k / 100.0, 4)
    assert abs(r["cvar_value"] - want) < 1e-9


def test_q248_abc_conservation(spark):
    """ABC: classes partition parts and revenue; shares sum to 1;
    class A's share is at least class B's at least C's per the
    descending construction; the A share is ~0.8 by design."""
    rows = {r["abc"]: r for r in QUERIES["q248_abc_classification"](spark, SF).collect()}
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    n_parts = li.select("l_partkey").distinct().count()
    assert sum(r["n_parts"] for r in rows.values()) == n_parts
    assert abs(sum(r["revenue_share"] for r in rows.values()) - 1) < 1e-4
    assert set(rows) == {"A", "B", "C"}
    assert rows["A"]["revenue_share"] >= 0.75
    assert rows["A"]["class_cents"] >= rows["B"]["class_cents"] >= rows["C"]["class_cents"]


def test_q249_estimator_sanity(spark):
    """Capture-recapture: both captures are subsets of the truth
    (m <= min(n1, n2)), the Chapman estimate is at least the union
    lower bound n1 + n2 - m, and at this SF (near-complete captures)
    it lands within 25% of the true pair count."""
    r = QUERIES["q249_capture_recapture"](spark, SF).collect()[0]
    assert r["m"] <= min(r["n1"], r["n2"])
    assert r["n1"] <= r["true_pairs"] and r["n2"] <= r["true_pairs"]
    assert r["chapman_est"] >= r["n1"] + r["n2"] - r["m"]
    assert 0.75 <= r["est_over_true"] <= 1.25, r


def test_q250_milestone_order(spark):
    """Accumulating snapshot: one row per order with lineitems;
    ship spans are non-negative and lags are internally consistent
    (days_to_first_ship may be negative — the synthetic corpus has
    the ship-before-order violations q124 censuses; the snapshot
    records them faithfully); line counts conserve lineitem."""
    rows = QUERIES["q250_accumulating_snapshot"](spark, SF).collect()
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    assert len(rows) == li.select("l_orderkey").distinct().count()
    assert sum(r["n_lines"] for r in rows) == li.count()
    for r in rows:
        assert r["days_to_first_ship"] == r["first_ship_day"] - r["order_day"]
        assert r["ship_span_days"] >= 0
        assert r["first_ship_day"] <= r["last_ship_day"]


def test_q251_hashing_accounting(spark):
    """Feature hashing: occupied + never-hit <= 256; vocab =
    occupied + collisions conservation (sum of loads = V); max load
    >= ceil(V/256); chi2 non-negative."""
    r = QUERIES["q251_feature_hashing_audit"](spark, SF).collect()[0]
    assert r["occupied_buckets"] <= 256
    assert (
        r["collision_tokens"] == r["n_vocab"] - r["occupied_buckets"]
    )
    assert r["max_load"] >= -(-r["n_vocab"] // 256)
    assert r["chi2"] >= 0


def test_q252_sprt_walk(spark):
    """SPRT: the decision matches the crossing sign; if a crossing
    day exists it is within the observed days; replaying the
    integer walk in python reproduces the final cumulative."""
    r = QUERIES["q252_sprt_replay"](spark, SF).collect()[0]
    daily = sorted(
        (row["day"], row["s"], row["n"])
        for row in spark.read.parquet(f"{SF}/events.parquet")
        .filter(
            (F.col("event_type") == "purchase")
            & F.col("value").isNotNull()
        )
        .selectExpr(
            "unix_micros(cast(ts as timestamp)) div 86400000000 AS day",
            "CASE WHEN value >= 50 THEN 1 ELSE 0 END AS hit",
        )
        .groupBy("day")
        .agg(F.sum("hit").alias("s"), F.count("*").alias("n"))
        .collect()
    )
    cum, cross_day, cross_cum = 0, None, None
    for d, s, n in daily:
        cum += s * 201 + (n - s) * (-201)
        if cross_day is None and abs(cum) >= 2944:
            cross_day, cross_cum = d, cum
    assert r["n_days"] == len(daily)
    assert r["final_cum_milli"] == cum
    assert r["crossing_day"] == cross_day
    want = (
        "continue"
        if cross_day is None
        else ("accept_h1" if cross_cum >= 2944 else "accept_h0")
    )
    assert r["decision"] == want


def test_q253_pair_accounting(spark):
    """Kendall: concordant + discordant + (pairs tied in either
    ranking, inclusion-exclusion) = all pairs; tau_b in [-1, 1] and
    consistent with its definition."""
    r = QUERIES["q253_kendall_tau"](spark, SF).collect()[0]
    assert r["concordant"] + r["discordant"] <= r["n_pairs"]
    assert -1 <= r["tau_b"] <= 1
    import math

    want = round(
        (r["concordant"] - r["discordant"])
        / (
            math.sqrt(r["n_pairs"] - r["ties_q"])
            * math.sqrt(r["n_pairs"] - r["ties_r"])
        ),
        6,
    )
    assert abs(r["tau_b"] - want) < 1e-9


def test_q254_mde_identities(spark):
    """MDE: arm sizes partition the engaged users; mde_rel =
    mde_abs / p; mde shrinks if n grows (sanity: positive and below
    1 at this SF)."""
    r = QUERIES["q254_mde_power_analysis"](spark, SF).collect()[0]
    n_users = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("event_type").isin("view", "purchase"))
        .select("user_id")
        .distinct()
        .count()
    )
    assert r["n_t"] + r["n_c"] == n_users
    assert 0 < r["mde_abs"] < 1
    assert abs(r["mde_rel"] - round(r["mde_abs"] / r["p_baseline"], 6)) < 1e-3


def test_q255_richness_bounds(spark):
    """Chao1: the estimate is at least the observed richness;
    missing mass in [0,1]; counts consistent with the corpus."""
    r = QUERIES["q255_chao1_richness"](spark, SF).collect()[0]
    assert r["chao1_est"] >= r["s_observed"]
    assert 0 <= r["gt_missing_mass"] <= 1
    assert r["n1"] + r["n2"] <= r["s_observed"]
    assert r["n_tokens"] >= r["s_observed"]


def test_q256_growth_monotone(spark):
    """Heaps curve: vocabulary is non-decreasing in n_docs, deltas
    reconstruct the curve, and the last checkpoint's vocabulary is
    bounded by the full corpus vocabulary."""
    rows = sorted(
        QUERIES["q256_heaps_growth_curve"](spark, SF).collect(),
        key=lambda r: r["n_docs"],
    )
    assert [r["n_docs"] for r in rows] == [16, 32, 64, 128, 256, 512][: len(rows)]
    prev = 0
    for r in rows:
        assert r["vocab"] >= prev
        assert r["new_tokens"] == r["vocab"] - prev
        prev = r["vocab"]
    from dedup.normalize import normalize_sql as _n

    full_vocab = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(F.explode(F.split(_n(F.col("text")), " ")).alias("t"))
        .filter(F.col("t") != "")
        .select("t")
        .distinct()
        .count()
    )
    assert rows[-1]["vocab"] <= full_vocab


def test_q257_skew_identities(spark):
    """Skew census: rows conserve the corpus; straggler factor is
    >= 1 by the pigeonhole principle and consistent with max."""
    r = QUERIES["q257_partition_skew_census"](spark, SF).collect()[0]
    n = spark.read.parquet(f"{SF}/events.parquet").count()
    assert r["n_rows"] == n
    assert r["n_buckets"] <= 32
    assert r["straggler_factor"] >= 1.0
    assert r["min_bucket_rows"] <= r["max_bucket_rows"]
    want = round(r["max_bucket_rows"] * 32 / n, 4)
    assert abs(r["straggler_factor"] - want) < 1e-9


def test_q258_sliding_bounds(spark):
    """Sliding distinct: active_7d >= active_1d every day; one row
    per observed calendar day; 7d never exceeds the user universe."""
    rows = QUERIES["q258_sliding_distinct_users"](spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    n_users = ev.select("user_id").distinct().count()
    days = (
        ev.selectExpr(
            "unix_micros(cast(ts as timestamp)) div 86400000000 AS d"
        )
        .agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
        .collect()[0]
    )
    assert len(rows) == days["hi"] - days["lo"] + 1
    for r in rows:
        assert r["active_7d"] >= r["active_1d"]
        assert r["active_7d"] <= n_users


def test_q259_robust_mean_order(spark):
    """Winsorized vs trimmed: both means lie within [lo_cut, hi_cut]
    and n - 2k values fund the trimmed mean; k = n div 10."""
    r = QUERIES["q259_winsorized_vs_trimmed"](spark, SF).collect()[0]
    assert r["k"] == r["n"] // 10
    assert r["lo_cut"] <= r["trimmed_mean"] <= r["hi_cut"]
    assert r["lo_cut"] <= r["winsorized_mean"] <= r["hi_cut"]


def test_q260_entropy_matrix_shape(spark):
    """Cross-entropy matrix: |sources|² rows; the diagonal has
    delta 0; deltas are bounded below by a small fixed-point slack
    (true KL >= 0; floor-log2 costs at most ~2 bits of slack)."""
    rows = QUERIES["q260_cross_entropy_matrix"](spark, SF).collect()
    srcs = {r["src_a"] for r in rows}
    assert len(rows) == len(srcs) ** 2
    for r in rows:
        if r["src_a"] == r["src_b"]:
            assert r["delta_millibits"] == 0
        assert r["delta_millibits"] >= -2000, r
        assert r["cross_h_millibits"] > 0


def test_q261_bcubed_bounds(spark):
    """B-cubed: predicted edges are a SUBSET of truth edges
    (verified J >= 0.5 within the same blocks), so predicted
    clusters refine truth clusters and B³ precision is exactly 1;
    recall < 1 measures the portable 4x4 banding's miss at
    J in [0.5, ~0.71) — the gap q214's sweep predicts."""
    r = QUERIES["q261_bcubed_evaluation"](spark, SF).collect()[0]
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert r["n_docs"] == n_docs
    assert r["b3_precision"] == 1.0
    assert 0 < r["b3_recall"] <= 1


def test_q262_ari_identity(spark):
    """ARI: recomputing from the emitted integer stats reproduces
    the index; a near-perfect clustering scores near 1."""
    r = QUERIES["q262_adjusted_rand_index"](spark, SF).collect()[0]
    t = r["n_docs"] * (r["n_docs"] - 1) // 2
    num = t * r["sij"] - r["sa"] * r["sb"]
    den = t * (r["sa"] + r["sb"]) / 2 - r["sa"] * r["sb"]
    assert abs(r["ari"] - round(num / den, 6)) < 1e-9
    # refinement: every predicted co-pair is a truth pair
    assert r["sij"] == r["sa"]
    assert 0 < r["ari"] <= 1


def test_q263_prf_consistency(spark):
    """Pairwise PRF: the refinement theorem makes precision exactly
    1 (tp == pp); recall < 1 is the portable banding's measured
    miss; f1 is the harmonic mean of the emitted P and R."""
    r = QUERIES["q263_pairwise_cluster_prf"](spark, SF).collect()[0]
    assert r["tp"] == r["pp"]
    assert r["tp"] <= r["ap"]
    p, rec = r["tp"] / r["pp"], r["tp"] / r["ap"]
    assert abs(r["f1"] - round(2 * p * rec / (p + rec), 6)) < 1e-9
    assert r["precision"] == 1.0


def test_q264_roc_shape(spark):
    """ROC: 9 decile points; TPR and FPR are non-increasing as the
    threshold rises; TPR >= FPR pointwise iff AUC favors positives;
    the AUC column is constant and recomputable from U."""
    rows = sorted(
        QUERIES["q264_roc_auc"](spark, SF).collect(),
        key=lambda r: r["decile"],
    )
    assert len(rows) == 9
    aucs = {r["auc"] for r in rows}
    assert len(aucs) == 1
    for p, n in zip(rows, rows[1:]):
        assert n["threshold"] >= p["threshold"]
        assert n["tpr"] <= p["tpr"] + 1e-9
        assert n["fpr"] <= p["fpr"] + 1e-9
    for r in rows:
        assert 0 <= r["tpr"] <= 1 and 0 <= r["fpr"] <= 1
    assert 0 <= rows[0]["auc"] <= 1


def test_q265_ndcg_bounds(spark):
    """nDCG: dcg <= idcg (ideal ordering maximizes DCG over top-10
    prefixes), so ndcg in (0, 1]; idcg recomputed from the true
    top-10 revenues agrees."""
    r = QUERIES["q265_ndcg_at_10"](spark, SF).collect()[0]
    assert 0 < r["ndcg_at_10"] <= 1
    assert r["dcg"] <= r["idcg"] + 1e-6
    top = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .groupBy("l_partkey")
        .agg(F.sum(F.expr("CAST(ROUND(l_extendedprice*100) AS LONG)")).alias("rel"))
        .orderBy(F.desc("rel"), F.asc("l_partkey"))
        .limit(10)
        .collect()
    )
    import math

    idcg = sum(
        row["rel"] / math.log2(d + 2) for d, row in enumerate(top)
    )
    assert abs(r["idcg"] - round(idcg / 100.0, 4)) < 0.01


def test_q266_influence_conservation(spark):
    """LOO influence: one row per source; influences weighted by
    removed mass approximately cancel (Σ (N-n_i)·infl_i = 0 exactly
    in the un-rounded algebra); signs oppose the source's own mean
    vs the global mean."""
    rows = QUERIES["q266_loo_source_influence"](spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert len(rows) == docs.select("source").distinct().count()
    mean_all = rows[0]["mean_all"]
    for r in rows:
        own_mean = r["chars"] / r["n_docs"]
        if own_mean > mean_all:
            assert r["influence"] <= 0
        elif own_mean < mean_all:
            assert r["influence"] >= 0


def test_q267_price_argmax(spark):
    """Price point: an independent recompute over all candidate
    prices confirms the argmax; surplus capture in (0, 1]."""
    r = QUERIES["q267_revenue_price_point"](spark, SF).collect()[0]
    vals = sorted(
        row["v"]
        for row in spark.read.parquet(f"{SF}/events.parquet")
        .filter(
            (F.col("event_type") == "purchase") & F.col("value").isNotNull()
        )
        .selectExpr("CAST(ROUND(value*10000) AS LONG) AS v")
        .collect()
    )
    best = max(
        (v * sum(1 for x in vals if x >= v), -v)
        for v in sorted(set(vals))
    )
    assert round(best[0] / 10000.0, 4) == r["revenue"]
    assert -best[1] / 10000.0 == r["price"]
    assert 0 < r["surplus_capture"] <= 1
    assert r["n_buyers"] <= r["total_buyers"]


def test_q268_fpr_envelope(spark):
    """Bloom FPR: bits_set <= min(2n, m); the measured FPR sits
    within a generous band of the theoretical (1-e^{-kn/m})^k
    (binomial noise at these probe counts)."""
    import math

    r = QUERIES["q268_bloom_fpr_audit"](spark, SF).collect()[0]
    assert r["bits_set"] <= min(2 * r["n_members"], r["m"])
    theory = (1 - math.exp(-r["k"] * r["n_members"] / r["m"])) ** r["k"]
    sd = math.sqrt(theory * (1 - theory) / r["n_probes"])
    assert abs(r["fpr"] - theory) <= 6 * sd + 0.02, (r["fpr"], theory)


def test_q269_theorem_and_local_opt(spark):
    """Newsvendor: the theorem flag is 1 (argmin == critical
    fractile), and the chosen Q's cost is a local minimum among
    candidate demands."""
    r = QUERIES["q269_newsvendor_fractile"](spark, SF).collect()[0]
    assert r["theorem_holds"] == 1
    demands = [
        row["d"]
        for row in spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .selectExpr(
            "unix_micros(cast(ts as timestamp)) div 86400000000 AS day"
        )
        .groupBy("day")
        .agg(F.count("*").alias("d"))
        .collect()
    ]

    def cost(q):
        return 3 * sum(max(d - q, 0) for d in demands) + sum(
            max(q - d, 0) for d in demands
        )

    assert cost(r["best_q"]) == r["best_cost"]
    assert all(cost(r["best_q"]) <= cost(q) for q in set(demands))


def test_q270_varint_bounds(spark):
    """Delta encoding: sorted deltas compress keys far below 8
    bytes/row (ratio < 0.5 for dense key spaces); delta_bytes is at
    least n (one byte per row) and max_delta is non-negative."""
    rows = QUERIES["q270_delta_varint_advisor"](spark, SF).collect()
    assert {r["col"] for r in rows} == {
        "l_orderkey", "o_orderkey", "doc_id",
    }
    for r in rows:
        assert r["n_rows"] <= r["delta_bytes"] or r["delta_bytes"] >= 0
        assert r["delta_bytes"] >= r["n_rows"]
        assert r["delta_bytes"] < r["plain_bytes"]
        assert r["ratio"] < 0.5
        assert r["max_delta"] >= 0


def test_q271_churn_bounds(spark):
    """Leaderboard churn: overlap <= 50; jaccard consistent with
    overlap; rank shifts bounded by 49 each."""
    r = QUERIES["q271_leaderboard_churn"](spark, SF).collect()[0]
    assert 0 <= r["overlap"] <= 50
    assert abs(r["jaccard"] - round(r["overlap"] / (100 - r["overlap"]), 6)) < 1e-9
    assert 0 <= r["mean_abs_rank_shift"] <= 49


def test_q272_rich_club_monotone_universe(spark):
    """Rich club: n_rich shrinks as k rises; e_rich <= possible
    pairs and <= total edges; densities in [0, 1]."""
    rows = sorted(
        QUERIES["q272_rich_club"](spark, SF).collect(),
        key=lambda r: r["k"],
    )
    n_edges = QUERIES["q12_docs_token_jaccard_pairs"](spark, SF).count()
    prev = None
    for r in rows:
        if prev is not None:
            assert r["n_rich"] <= prev
        prev = r["n_rich"]
        assert r["e_rich"] <= min(r["possible_pairs"], n_edges)
        if r["density"] is not None:
            assert 0 <= r["density"] <= 1


def test_q273_wilcoxon_identity(spark):
    """Signed-rank: W+ + W- = n(n+1)/2 exactly in doubled space
    (all ranks distributed), and n counts the non-zero weeks."""
    r = QUERIES["q273_wilcoxon_signed_rank"](spark, SF).collect()[0]
    assert r["wp_x2"] + r["wm_x2"] == r["n"] * (r["n"] + 1)
    assert r["n"] >= 1
    assert r["wp_x2"] >= 0 and r["wm_x2"] >= 0


def test_q274_runs_bounds(spark):
    """Runs test: runs between 1 and n_moves; up+down = moves; the
    z recomputes from the emitted integers."""
    r = QUERIES["q274_runs_test"](spark, SF).collect()[0]
    assert 1 <= r["runs"] <= r["n_moves"]
    assert r["n_up"] + r["n_down"] == r["n_moves"]
    import math

    n1, n2 = r["n_up"], r["n_down"]
    mu = 2 * n1 * n2 / (n1 + n2) + 1
    var = (
        2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
        / ((n1 + n2) ** 2 * (n1 + n2 - 1))
    )
    assert abs(r["z"] - round((r["runs"] - mu) / math.sqrt(var), 6)) < 1e-9


def test_q275_median_slope(spark):
    """Theil-Sen: a python recompute of the median pairwise slope
    (same rounding and tie order) matches; n_pairs = C(n_days, 2)."""
    r = QUERIES["q275_theil_sen_slope"](spark, SF).collect()[0]
    daily = sorted(
        (row["day"], row["v"])
        for row in spark.read.parquet(f"{SF}/events.parquet")
        .selectExpr(
            "unix_micros(cast(ts as timestamp)) div 86400000000 AS day"
        )
        .groupBy("day")
        .agg(F.count("*").alias("v"))
        .collect()
    )
    n = len(daily)
    assert r["n_days"] == n and r["n_pairs"] == n * (n - 1) // 2
    slopes = sorted(
        (round((vj - vi) / (dj - di), 9), di, dj)
        for i, (di, vi) in enumerate(daily)
        for dj, vj in daily[i + 1:]
    )
    k = (len(slopes) + 1) // 2
    assert slopes[k - 1][0] == r["theil_sen"]


def test_q276_jackknife_identity(spark):
    """Jackknife SE of the mean equals the classical s/sqrt(n) —
    the algebraic identity, pinned by the row's own flag and
    rechecked here."""
    r = QUERIES["q276_jackknife_se"](spark, SF).collect()[0]
    assert r["identity_holds"] == 1
    assert abs(r["jackknife_se"] - r["classical_se"]) < 1e-5
    assert r["jackknife_se"] > 0


def test_q277_aa_calibrated(spark):
    """A/A sweep: 8 salts, no |z| beyond 4 (no true effect exists),
    and arm sizes partition the events per salt."""
    rows = QUERIES["q277_aa_test_calibration"](spark, SF).collect()
    assert len(rows) == 8
    n_events = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("event_type").isin("view", "purchase"))
        .count()
    )
    for r in rows:
        assert r["n_a"] + r["n_b"] == n_events
        assert abs(r["z"]) < 4, r


def test_q278_selection_bias(spark):
    """Regression to the mean: top-decile days beat the overall mean
    by construction; the reversion fraction recomputes from the
    emitted means."""
    r = QUERIES["q278_regression_to_mean"](spark, SF).collect()[0]
    assert r["mean_top"] > r["mean_all"]
    assert r["n_followed"] <= r["k"]
    want = round(
        (r["mean_top"] - r["mean_next"]) / (r["mean_top"] - r["mean_all"]),
        4,
    )
    assert abs(r["reversion_frac"] - want) < 1e-3


def test_q279_psi_accounting(spark):
    """PSI: bin shares account for both halves exactly; the total
    column is constant and equals the recomputed contribution sum;
    same-share bins contribute zero."""
    rows = QUERIES["q279_psi_drift"](spark, SF).collect()
    n_purch = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(
            (F.col("event_type") == "purchase") & F.col("value").isNotNull()
        )
        .count()
    )
    assert sum(r["cp"] + r["cq"] for r in rows) == n_purch
    totals = {r["psi_total"] for r in rows}
    assert len(totals) == 1
    want = round(sum(r["d_ppm"] * r["lr_mb"] for r in rows) / 1e9, 6)
    assert abs(totals.pop() - want) < 1e-9
    for r in rows:
        assert r["contrib"] == r["d_ppm"] * r["lr_mb"]


def test_q280_two_paths_agree(spark):
    """Little's law: the session-sum and sweep-line integrals are
    exactly equal (the row's own flag), and the rates are
    consistent with the emitted integrals."""
    r = QUERIES["q280_littles_law"](spark, SF).collect()[0]
    assert r["littles_law_holds"] == 1
    assert r["session_us_sum"] == r["integral_us"]
    assert r["n_sessions"] > 0
    assert r["avg_concurrent_l"] > 0
    assert r["w_minutes"] >= 0


def test_q281_xor_involution(spark):
    """XOR parity: recovery is exact on every full stripe (the
    involution law); full stripes bounded by total stripes; doc
    counts consistent."""
    r = QUERIES["q281_xor_parity_recovery"](spark, SF).collect()[0]
    assert r["recovery_exact"] == 1
    assert r["n_mismatch"] == 0
    assert r["n_recovered"] == r["n_full_stripes"] <= r["n_stripes"]
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert r["n_full_stripes"] >= n_docs // 4 - 2


def test_q282_hhi_bounds(spark):
    """HHI: between 10000/n and 10000 (up to floor slack); the top
    share alone lower-bounds it; the band matches the value."""
    r = QUERIES["q282_hhi_concentration"](spark, SF).collect()[0]
    assert r["hhi"] <= 10000
    assert r["hhi"] * r["n_sources"] >= 10000 - r["n_sources"] * 2
    assert r["hhi"] >= r["top_share_bp"] * r["top_share_bp"] // 10000
    want = (
        "high" if r["hhi"] >= 2500
        else "moderate" if r["hhi"] >= 1500 else "low"
    )
    assert r["concentration"] == want


def test_q283_batch_effect_removed(spark):
    """Quantile normalization: per-batch after-means collapse toward
    the pooled mean (closer than before-means for every batch with
    a real offset); counts conserve the purchase subset."""
    rows = QUERIES["q283_quantile_normalization"](spark, SF).collect()
    n_purch = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(
            (F.col("event_type") == "purchase") & F.col("value").isNotNull()
        )
        .count()
    )
    assert sum(r["n"] for r in rows) == n_purch
    pooled = rows[0]["pooled_mean"]
    for r in rows:
        before_gap = abs(r["mean_before"] - pooled)
        after_gap = abs(r["mean_after"] - pooled)
        assert after_gap <= before_gap + 0.5, r


def test_q284_gmd_pair_definition(spark):
    """GMD: the sorted closed form equals the O(n²) pair definition
    recomputed in python; Gini consistent."""
    r = QUERIES["q284_gini_mean_difference"](spark, SF).collect()[0]
    vs = [
        row["v"]
        for row in spark.read.parquet(f"{SF}/events.parquet")
        .selectExpr(
            "unix_micros(cast(ts as timestamp)) div 86400000000 AS day"
        )
        .groupBy("day")
        .count()
        .withColumnRenamed("count", "v")
        .collect()
    ]
    n = len(vs)
    pair_sum = sum(
        abs(a - b) for i, a in enumerate(vs) for b in vs[i + 1:]
    )
    want = round(2 * pair_sum / (n * (n - 1)), 4)
    assert r["n"] == n
    assert abs(r["gmd"] - want) < 1e-9
    assert abs(r["gini"] - round(r["gmd"] / (2 * r["mean_v"]), 6)) < 1e-4


def test_q285_pr_shape(spark):
    """PR curve: precision in (0,1], recall non-decreasing with
    decile, AP constant across rows and within (0,1]; the base rate
    lower-bounds the final precision point."""
    rows = sorted(
        QUERIES["q285_pr_curve_ap"](spark, SF).collect(),
        key=lambda r: r["decile"],
    )
    assert len(rows) == 9
    aps = {r["average_precision"] for r in rows}
    assert len(aps) == 1 and 0 < rows[0]["average_precision"] <= 1
    for p, n in zip(rows, rows[1:]):
        assert n["recall"] >= p["recall"]
    for r in rows:
        assert 0 < r["precision"] <= 1
        assert 0 <= r["recall"] <= 1


def test_q286_mmr_greedy(spark):
    """MMR: 5 distinct picks; the first is the pool's relevance
    argmax (objective 2*10000 with no similarity penalty);
    objectives are achievable bounds (<= 20000)."""
    rows = sorted(
        QUERIES["q286_mmr_selection"](spark, SF).collect(),
        key=lambda r: r["round"],
    )
    assert [r["round"] for r in rows] == [1, 2, 3, 4, 5]
    ids = [r["doc_id"] for r in rows]
    assert len(set(ids)) == 5
    assert rows[0]["objective"] == 20000
    for r in rows:
        assert r["objective"] <= 20000


def test_q287_mean_excess_monotone_thresholds(spark):
    """POT: thresholds rise with pct, exceedance counts fall, and
    each count is consistent with the (1-pct) tail up to ties."""
    rows = sorted(
        QUERIES["q287_mean_excess_table"](spark, SF).collect(),
        key=lambda r: r["pct"],
    )
    n = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(
            (F.col("event_type") == "purchase") & F.col("value").isNotNull()
        )
        .count()
    )
    for p, q in zip(rows, rows[1:]):
        assert q["threshold"] >= p["threshold"]
        assert q["n_exceed"] <= p["n_exceed"]
    for r in rows:
        assert r["n_exceed"] <= n - (n * r["pct"] + 99) // 100 + 1
        assert r["mean_excess"] > 0


def test_q288_burstiness_recompute(spark):
    """Burstiness: 20 rows, VMR >= 1 - 1/N lower bound never
    violated for present tokens... actually VMR >= (N - s/d...)
    — just recompute the top value independently and check rank-1
    agreement; all VMRs positive and non-increasing."""
    rows = sorted(
        QUERIES["q288_token_burstiness"](spark, SF).collect(),
        key=lambda r: r["rk"],
    )
    assert len(rows) == 20
    for p, n in zip(rows, rows[1:]):
        assert n["vmr"] <= p["vmr"] + 1e-9
    for r in rows:
        assert r["vmr"] > 0
        assert r["d_present"] <= r["s"]


def test_q289_irr_identity(spark):
    """IRR: recomputes from the emitted exact integers; person-days
    positive in both arms."""
    r = QUERIES["q289_incidence_rate_ratio"](spark, SF).collect()[0]
    assert r["persondays_t"] > 0 and r["persondays_c"] > 0
    assert r["e_t"] >= 0 and r["e_c"] > 0
    assert r["irr"] > 0


def test_q290_hash_is_independent(spark):
    """Hash audit: chi2 stays within a generous band of dof=225 for
    independent md5 salts (mean 225, sd ~21; band 225 ± 6 sd), and
    a deliberately CORRELATED pair (same salt twice) would
    concentrate all mass on the diagonal — verified by construction
    here: diagonal-only cells give chi2 ~ 15*N-scale, far outside
    the band."""
    r = QUERIES["q290_hash_independence_audit"](spark, SF).collect()[0]
    assert r["dof"] == 9
    assert 0 < r["chi2"] < 9 + 6 * (2 * 9) ** 0.5, r["chi2"]


def test_q291_drawdown_replay(spark):
    """Drawdown: a python replay of the cumulative walk reproduces
    max_drawdown, trough day, peak and final values exactly."""
    r = QUERIES["q291_max_drawdown"](spark, SF).collect()[0]
    daily = sorted(
        (row["day"], row["net"])
        for row in spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("event_type").isin("purchase", "error"))
        .selectExpr(
            "unix_micros(cast(ts as timestamp)) div 86400000000 AS day",
            "CASE WHEN event_type = 'purchase' THEN 1 ELSE -1 END AS s",
        )
        .groupBy("day")
        .agg(F.sum("s").alias("net"))
        .collect()
    )
    cum = runmax = 0
    best_dd, best_day, peak = -1, None, 0
    first = True
    for d, net in daily:
        cum += net
        if first:
            runmax = cum
            first = False
        runmax = max(runmax, cum)
        peak = max(peak, cum)
        dd = runmax - cum
        if dd > best_dd:
            best_dd, best_day = dd, d
    assert r["max_drawdown"] == best_dd
    assert r["trough_day"] == best_day
    assert r["final_cum"] == cum
    assert r["peak_cum"] == peak


def test_q292_churn_bounds(spark):
    """WAU churn: common <= min(prev, next); jaccard and churn
    consistent with the emitted integers."""
    rows = QUERIES["q292_wau_set_churn"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["common"] <= min(r["wau_prev"], r["wau_next"])
        jac = r["common"] / (r["wau_prev"] + r["wau_next"] - r["common"])
        assert abs(r["jaccard"] - round(jac, 6)) < 1e-9
        assert abs(
            r["churn_rate"] - round(1 - r["common"] / r["wau_prev"], 6)
        ) < 1e-9


def test_q293_rho_identity(spark):
    """Preferential attachment: rho recomputes from sum_d2 and lies
    in [-1, 1]; node count matches the graph's degree relation."""
    r = QUERIES["q293_preferential_attachment"](spark, SF).collect()[0]
    n = r["n_nodes"]
    want = round(1 - 6 * r["sum_d2"] / (n * (n * n - 1)), 6)
    assert abs(r["spearman_rho"] - want) < 1e-9
    assert -1 <= r["spearman_rho"] <= 1


def test_q294_motif_hierarchy(spark):
    """K4 census: every K4 contains 4 triangles and every triangle
    3 edges, so the motif counts respect n_k4 <= C(n_tri, ...)
    loose hierarchy: 4*n_k4 <= n_tri * (n_nodes...) — pin the
    sound bounds: counts non-negative, k4 <= triangles choose via
    each triangle belonging to at most (n-3) K4s, and a python
    recount of triangles agrees."""
    r = QUERIES["q294_four_clique_census"](spark, SF).collect()[0]
    pairs = {
        (p["a"], p["b"])
        for p in QUERIES["q12_docs_token_jaccard_pairs"](spark, SF)
        .select("a", "b")
        .collect()
    }
    tri = 0
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for a, b in pairs:
        tri += len(
            {c for c in adj[a] & adj[b] if c > b}
        )
    assert r["n_triangles"] == tri
    assert r["n_edges"] == len(pairs)
    assert 0 <= r["n_k4"]
    if r["n_k4"]:
        assert r["n_triangles"] >= 4  # a K4 implies 4 triangles


def test_q295_bounce_bounds(spark):
    """Bounce rate: bounces <= sessions; rate consistent; mean
    events >= 1; weekly sessions sum to the session total."""
    rows = QUERIES["q295_weekly_bounce_rate"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_bounces"] <= r["n_sessions"]
        assert abs(
            r["bounce_rate"] - round(r["n_bounces"] / r["n_sessions"], 6)
        ) < 1e-9
        assert r["mean_events"] >= 1


def test_q296_ltv_monotone(spark):
    """LTV triangle: cumulative value per user is non-decreasing in
    age within each cohort; cohort sizes are consistent across the
    cohort's rows."""
    rows = QUERIES["q296_cohort_ltv_triangle"](spark, SF).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_week"], []).append(r)
    for rs in by_cohort.values():
        rs.sort(key=lambda r: r["age_week"])
        sizes = {r["cohort_users"] for r in rs}
        assert len(sizes) == 1
        for p, n in zip(rs, rs[1:]):
            assert n["cum_value_per_user"] >= p["cum_value_per_user"] - 1e-9


def test_q297_effect_sizes(spark):
    """OR/RR: cells partition the view/purchase events; OR and RR
    recompute from the emitted integers; SE positive."""
    r = QUERIES["q297_odds_ratio"](spark, SF).collect()[0]
    n = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("event_type").isin("view", "purchase"))
        .count()
    )
    assert r["a"] + r["b"] + r["c"] + r["d"] == n
    want_or = round(
        ((2 * r["a"] + 1) * (2 * r["d"] + 1))
        / ((2 * r["b"] + 1) * (2 * r["c"] + 1)),
        6,
    )
    assert abs(r["odds_ratio"] - want_or) < 1e-9
    assert r["log_or_se"] > 0


def test_q298_coverage_monotone(spark):
    """Hub coverage: 1-hop set contains the hub and is within the
    2-hop set; fractions within (0, 1]; hub degree is the graph
    max."""
    r = QUERIES["q298_hub_coverage"](spark, SF).collect()[0]
    assert 1 <= r["within_1hop"] <= r["within_2hop"] <= r["n_nodes"]
    assert 0 < r["cover_1hop"] <= r["cover_2hop"] <= 1
    assert r["within_1hop"] >= r["hub_deg"]  # closed neighborhood


def test_q299_ttfp_sanity(spark):
    """TTFP: conversions bounded by signups; medians non-negative
    where present; cohort signups sum to the signup-user count."""
    rows = QUERIES["q299_ttfp_median_by_cohort"](spark, SF).collect()
    total = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("event_type") == "signup")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r["n_signups"] for r in rows) == total
    for r in rows:
        assert 0 <= r["n_converted"] <= r["n_signups"]
        if r["median_days_to_purchase"] is not None:
            assert r["median_days_to_purchase"] >= 0


def test_q300_all_checks_pass(spark):
    """Scorecard: all four structural invariants pass — the capstone
    the whole board stands on."""
    rows = QUERIES["q300_conformance_scorecard"](spark, SF).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["passed"] == 1, r
        assert r["observed"] == r["expected"]


def test_q301_halves_subset_full(spark):
    """Split-half stability: each half's verified pairs are a subset
    of the truth (verification guarantees it), recalls within
    (0, 1], and the common set bounded by both halves."""
    r = QUERIES["q301_split_half_stability"](spark, SF).collect()[0]
    assert r["common"] <= min(r["pairs_a"], r["pairs_b"])
    assert 0 < r["recall_a"] <= 1
    assert 0 < r["recall_b"] <= 1
    assert 0 <= r["half_jaccard"] <= 1


def test_q302_hill_recompute(spark):
    """Hill: sum_bits recomputes from the top-32 lengths and the
    33rd order statistic; alpha positive when the tail is
    non-degenerate."""
    r = QUERIES["q302_hill_tail_index"](spark, SF).collect()[0]
    lens = sorted(
        (
            row["n_chars"]
            for row in spark.read.parquet(f"{SF}/documents.parquet")
            .select("n_chars")
            .collect()
        ),
        reverse=True,
    )
    x_k1 = lens[32]
    want = sum(
        len(bin(x)[2:]) - len(bin(x_k1)[2:]) for x in lens[:32]
    )
    assert r["x_k_plus_1"] == x_k1
    assert r["sum_bits"] == want
    if r["sum_bits"] > 0:
        assert r["alpha_est"] > 0


def test_q303_placebo_small(spark):
    """Placebo DiD: cells partition the restricted window, the
    double difference recomputes, and the placebo effect is small
    relative to the overall mean (no treatment exists by
    construction)."""
    r = QUERIES["q303_placebo_did"](spark, SF).collect()[0]
    want = (r["mean_t_post"] - r["mean_t_pre"]) - (
        r["mean_c_post"] - r["mean_c_pre"]
    )
    assert abs(r["placebo_did"] - want) < 5e-6
    overall = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("value").isNotNull())
        .agg(F.avg("value"))
        .collect()[0][0]
    )
    assert abs(r["placebo_did"]) < 0.5 * overall


def test_q304_dispersion_positive(spark):
    """Dispersion pair: both normalized spreads positive and finite
    per type; QCD bounded by 1; one row per valued type."""
    rows = QUERIES["q304_dispersion_pair"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["cv"] > 0
        assert 0 <= r["qcd"] < 1


def test_q305_index_conservation(spark):
    """Seasonal indexes: day counts sum to the calendar; the
    day-count-weighted index mean is 10000 up to floor slack."""
    rows = QUERIES["q305_seasonal_indexes"](spark, SF).collect()
    assert len(rows) == 7
    td = sum(r["n_days"] for r in rows)
    weighted = sum(r["index_bp"] * r["n_days"] for r in rows)
    assert abs(weighted / td - 10000) < 10
    for r in rows:
        assert r["index_bp"] > 0


def test_q306_percentile_order(spark):
    """Gap percentiles: p50 <= p90 <= p99 per type, all positive,
    and gap counts equal per-(user,type) stream lengths minus one."""
    rows = QUERIES["q306_gap_percentiles"](spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    streams = (
        ev.groupBy("user_id", "event_type")
        .count()
        .groupBy("event_type")
        .agg(F.sum(F.col("count") - 1).alias("gaps"))
        .collect()
    )
    want = {r["event_type"]: r["gaps"] for r in streams}
    for r in rows:
        assert 0 < r["p50_hours"] <= r["p90_hours"] <= r["p99_hours"]
        assert r["n_gaps"] == want[r["event_type"]]
