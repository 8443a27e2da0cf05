"""Partitioned suffix pass for exact long-substring overlap
(SURVEY.md §2.4 A6, §2.6 O1, §2.5 W3; BASELINE.json:6 "partitioned
suffix-array pass").

A corpus-wide suffix array (Lee et al., ACL'22) is equivalent — for the
"shared run of >= L tokens" decision — to grouping suffixes truncated to a
fixed window W: two documents share an identical W-token window iff their
suffix order places those truncated suffixes in the same equality class.
Emitting *every* suffix is linear but heavy, so suffix positions are
subsampled with robust winnowing (Schleimer, Wilkerson & Aiken, SIGMOD'03):
an anchor is the argmin of the window fingerprints over each sliding block
of `suffix_winnow` positions. Winnowing guarantees >= 1 anchor per block and
is content-determined, so any shared run of >= suffix_window + suffix_winnow
- 1 tokens yields at least one *common* anchored fingerprint in both
documents — detection is guaranteed, not probabilistic.

Fingerprints are computed per Arrow batch with one prefix-polynomial pass in
Z_2^64 (odd constant → invertible, so window hashes come from prefix
differences); no per-row Python. Grouping equal fingerprints — the
distributed stand-in for suffix-array adjacency — reuses the skew-aware
bucket pair generator. Verification of candidate pairs computes the true
longest common token run (verify.py) so hash collisions cannot create
false merges.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from .config import DedupConfig
from .shingle import _batch_token_hashes, mix64, _POLY_C


def window_fingerprints(t: np.ndarray, window: int, winnow: int) -> np.ndarray:
    """Winnow-anchored fingerprints of all W-token windows of one doc."""
    m = len(t)
    if m < window:
        return np.empty(0, dtype=np.int64)
    with np.errstate(over="ignore"):
        # prefix polynomial P[i] = sum_{j<i} t[j] * C^j  (mod 2^64)
        powers = np.empty(m, dtype=np.uint64)
        powers[0] = np.uint64(1)
        np.cumprod(np.full(m - 1, _POLY_C, dtype=np.uint64), out=powers[1:]) if m > 1 else None
        weighted = t * powers
        prefix = np.concatenate([[np.uint64(0)], np.cumsum(weighted, dtype=np.uint64)])
        # window fp over [i, i+W): (P[i+W]-P[i]) * C^{-i}; multiplying by the
        # inverse power realigns every window to exponent 0 so equal windows
        # at different offsets hash equally. inv via modular inverse of C.
        c_inv = pow(int(_POLY_C), -1, 1 << 64)
        inv_powers = np.empty(m - window + 1, dtype=np.uint64)
        inv_powers[0] = np.uint64(1)
        if m - window > 0:
            np.cumprod(
                np.full(m - window, np.uint64(c_inv), dtype=np.uint64),
                out=inv_powers[1:],
            )
        fps = (prefix[window:] - prefix[: m - window + 1]) * inv_powers
        fps = mix64(fps)
    n_pos = len(fps)
    if n_pos <= winnow:
        anchors = np.array([int(np.argmin(fps))])
    else:
        win_view = np.lib.stride_tricks.sliding_window_view(fps, winnow)
        anchors = np.unique(win_view.argmin(axis=1) + np.arange(len(win_view)))
    return np.unique(fps[anchors]).view(np.int64)


def make_suffix_udf(config: DedupConfig):
    window, winnow = config.suffix_window, config.suffix_winnow

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def suffix_fps(texts: pd.Series) -> pd.Series:
        hashes, offsets = _batch_token_hashes(texts)
        out = [
            window_fingerprints(
                hashes[offsets[i] : offsets[i + 1]].astype(np.uint64), window, winnow
            )
            for i in range(len(texts))
        ]
        return pd.Series(out)

    return suffix_fps


def suffix_candidates(fps_df: DataFrame, config: DedupConfig) -> DataFrame:
    """(conv_id, suffix_fps:array<long>) -> candidate pairs (a < b) sharing
    >= 1 anchored window fingerprint."""
    from .candidates import bucket_pairs

    exploded = fps_df.select(
        "conv_id", F.explode_outer("suffix_fps").alias("fp")
    ).filter(F.col("fp").isNotNull())
    return bucket_pairs(exploded, ["fp"], config)
