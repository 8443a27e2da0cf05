"""Candidate-pair verification (SURVEY.md §2.3 J3, §2.4 A3).

Near-dup pairs (MinHash/SimHash sources) are verified with *exact* shingle
Jaccard — JVM-side `array_intersect`/`array_union` on the pre-deduped
shingle arrays (BASELINE.json:6 "verified with exact shingle-Jaccard").

Substring pairs (suffix pass) are verified by the true longest shared token
run: a vectorized stride-1 window-fingerprint intersection per Arrow batch —
O(|a|+|b|) per pair, no quadratic DP — which kills 64-bit fingerprint
collisions and enforces the >= suffix_min_tokens run length.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from .config import DedupConfig
from .shingle import token_hashes, mix64, _POLY_C


def _participants(pairs: DataFrame) -> DataFrame:
    return pairs.select(F.explode(F.array("a", "b")).alias("conv_id")).distinct()


def attach_shingles(pairs: DataFrame, shingles_df: DataFrame) -> DataFrame:
    """Two equi-joins on conv_id: (a, b) + shingles_a + shingles_b.

    The shingle table is semi-join-reduced to pair participants first: at
    corpus scale the pairs touch a small fraction of documents, so the two
    attach joins shuffle only that fraction of the (wide) array column.
    """
    sh = shingles_df.select("conv_id", "shingles").join(
        _participants(pairs), "conv_id", "left_semi"
    )
    return (
        pairs.join(sh.withColumnRenamed("conv_id", "a").withColumnRenamed("shingles", "sh_a"), "a")
        .join(sh.withColumnRenamed("conv_id", "b").withColumnRenamed("shingles", "sh_b"), "b")
    )


def verify_jaccard(
    pairs: DataFrame, shingles_df: DataFrame, config: DedupConfig
) -> DataFrame:
    """-> (a, b, jaccard) for pairs at or above the config threshold."""
    joined = attach_shingles(pairs, shingles_df)
    jac = (
        F.size(F.array_intersect("sh_a", "sh_b"))
        / F.size(F.array_union("sh_a", "sh_b"))
    ).alias("jaccard")
    return (
        joined.select("a", "b", jac)
        .filter(F.col("jaccard") >= config.jaccard_threshold)
    )


def _stride1_fps(t: np.ndarray, window: int) -> np.ndarray:
    """All W-token window fingerprints (stride 1), position-aligned."""
    m = len(t)
    if m < window:
        return np.empty(0, dtype=np.uint64)
    with np.errstate(over="ignore"):
        powers = np.empty(m, dtype=np.uint64)
        powers[0] = np.uint64(1)
        if m > 1:
            np.cumprod(np.full(m - 1, _POLY_C, dtype=np.uint64), out=powers[1:])
        prefix = np.concatenate(
            [[np.uint64(0)], np.cumsum(t * powers, dtype=np.uint64)]
        )
        c_inv = np.uint64(pow(int(_POLY_C), -1, 1 << 64))
        inv_powers = np.empty(m - window + 1, dtype=np.uint64)
        inv_powers[0] = np.uint64(1)
        if m - window > 0:
            np.cumprod(np.full(m - window, c_inv, dtype=np.uint64), out=inv_powers[1:])
        return mix64((prefix[window:] - prefix[: m - window + 1]) * inv_powers)


def _shared_at(ta: np.ndarray, tb: np.ndarray, length: int) -> bool:
    """True iff the two token sequences share a verbatim `length`-token run
    (stride-1 window fingerprint sets intersect at that exact length)."""
    fa, fb = _stride1_fps(ta, length), _stride1_fps(tb, length)
    return len(fa) > 0 and len(fb) > 0 and bool(np.isin(fa, fb).any())


def longest_shared_run(text_a: str, text_b: str, window: int) -> int:
    """Longest token run shared verbatim between two normalized texts
    (0 when shorter than `window`).

    Binary search on the run length L: a shared run of >= L tokens exists
    iff the stride-1 L-window fingerprint sets intersect. Each probe
    requires a verbatim L-token window match, so periodic/repetitive text
    can no longer inflate the run (the previous run-of-matching-positions
    scan matched each window of `a` anywhere in `b`, overestimating when
    positions matched non-contiguous targets). O((|a|+|b|) log |a|); exact
    up to 64-bit fingerprint collisions at the probed length.
    """
    ta, tb = token_hashes(text_a), token_hashes(text_b)
    hi = min(len(ta), len(tb))
    if hi < window or not _shared_at(ta, tb, window):
        return 0
    lo = window  # invariant: shared(lo) holds; shared(hi + 1) unknown/false
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if _shared_at(ta, tb, mid):
            lo = mid
        else:
            hi = mid - 1
    return lo


def make_substring_verify_udf(config: DedupConfig):
    window = config.suffix_window

    @F.pandas_udf(T.IntegerType())
    def shared_run_len(text_a: pd.Series, text_b: pd.Series) -> pd.Series:
        return pd.Series(
            [
                longest_shared_run(a or "", b or "", window)
                for a, b in zip(text_a, text_b)
            ],
            dtype="int32",
        )

    return shared_run_len


def verify_substring(
    pairs: DataFrame, docs_df: DataFrame, config: DedupConfig
) -> DataFrame:
    """-> (a, b, run_tokens) for pairs whose true shared token run is
    >= suffix_min_tokens. docs_df: (conv_id, norm_text)."""
    d = docs_df.select("conv_id", "norm_text").join(
        _participants(pairs), "conv_id", "left_semi"
    )
    joined = (
        pairs.join(
            d.withColumnRenamed("conv_id", "a").withColumnRenamed("norm_text", "t_a"), "a"
        ).join(
            d.withColumnRenamed("conv_id", "b").withColumnRenamed("norm_text", "t_b"), "b"
        )
    )
    udf = make_substring_verify_udf(config)
    return (
        joined.select("a", "b", udf(F.col("t_a"), F.col("t_b")).alias("run_tokens"))
        .filter(F.col("run_tokens") >= config.suffix_min_tokens)
    )
