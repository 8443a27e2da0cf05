"""Validation + conversation reassembly (SURVEY.md §2.2 P2, §2.5 W1/W2,
§2.4 A1).

Row invariant (BASELINE.json:15): per-turn text equality under stable turn
ordering. Reassembly must therefore order by turn_idx deterministically
(ties broken by ts then role are *rejected*, not tolerated: duplicate
(conv_id, turn_idx) rows are quarantined, W2) and must never alter `text`.

Reassembly avoids a window + second shuffle: `sort_array(collect_list(
struct(turn_idx, text)))` orders by the struct's leading field inside one
aggregation — collect_list order is shuffle-nondeterministic, the struct
sort is what makes the result stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SEP = "\n"


def mark_quarantined(turns: DataFrame) -> DataFrame:
    """Append a `quarantined` flag in a single pass (one window, no joins):
    true for null conv_id / turn_idx, and for every row of any (conv_id,
    turn_idx) that appears more than once (the invariant makes ordering
    ambiguous — reject loudly rather than guess)."""
    from pyspark.sql import Window

    base_bad = F.col("conv_id").isNull() | F.col("turn_idx").isNull()
    w = Window.partitionBy("conv_id", "turn_idx")
    return turns.withColumn(
        "quarantined", base_bad | (F.count("*").over(w) > 1)
    )


def split_valid(turns: DataFrame) -> tuple[DataFrame, DataFrame]:
    """-> (valid turns, quarantined turns)."""
    marked = mark_quarantined(turns)
    return (
        marked.filter(~F.col("quarantined")).drop("quarantined"),
        marked.filter(F.col("quarantined")).drop("quarantined"),
    )


def reassemble(turns: DataFrame) -> DataFrame:
    """turns (non-null keys) -> (conv_id, doc_text, n_turns, n_chars,
    ambiguous).

    doc_text = texts joined by '\\n' in turn_idx order; null text treated as
    empty string for concatenation (the turn still occupies its slot).
    `ambiguous` marks conversations with a duplicate (conv_id, turn_idx) —
    their ordering is undefined (W2), so the whole conversation is
    quarantined downstream rather than guessed at. Validation rides the same
    single aggregation as reassembly: no extra shuffle over the turn set.
    """
    ms = F.col("_ms")
    idxs = F.transform(ms, lambda s: s["turn_idx"])
    return (
        turns.groupBy("conv_id")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("turn_idx"),
                        F.coalesce(F.col("text"), F.lit("")).alias("text"),
                    )
                )
            ).alias("_ms")
        )
        .select(
            "conv_id",
            F.array_join(F.transform(ms, lambda s: s["text"]), SEP).alias("doc_text"),
            F.size(ms).cast("long").alias("n_turns"),
            (F.size(ms) != F.size(F.array_distinct(idxs))).alias("ambiguous"),
        )
        .withColumn("n_chars", F.length("doc_text").cast("long"))
    )


def explode_back(docs: DataFrame) -> DataFrame:
    """Inverse of reassemble for the round-trip invariant test:
    (conv_id, doc_text) -> (conv_id, turn_idx, text). Only valid when no
    turn text itself contains SEP (true for the synthetic corpus)."""
    return docs.select(
        "conv_id",
        F.posexplode(F.split("doc_text", SEP, -1)).alias("turn_idx", "text"),
    )
