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
    return bucket_pairs(exploded, ["fp"], config, assume_distinct=True)


def suffix_candidates_sorted(
    fps_df: DataFrame, config: DedupConfig, partitions: int | None = None
) -> DataFrame:
    """Alternative pair generator in classic suffix-array form (SURVEY.md
    O1/W3/J7): range-partition the suffix entries by fingerprint, sort within
    partitions, pair each entry with its predecessor when fingerprints are
    equal (sorted-neighbor adjacency ≡ suffix-array adjacency for the
    equal-window decision), then fix up the partition boundaries — a range
    partitioner may split a run of equal fingerprints across two partitions,
    so the edge rows of every partition (driver-sized: 2 rows per partition)
    are re-paired.

    Produces the same connectivity as suffix_candidates (linear chains per
    fingerprint instead of all-pairs); kept as the demonstration of the
    sort-based physical strategy — the grouped generator is the default
    because it shares the skew-aware bucket cap.
    """
    from typing import Iterator

    import pandas as pd

    n = partitions or config.shuffle_partitions
    entries = (
        fps_df.select("conv_id", F.explode_outer("suffix_fps").alias("fp"))
        .filter(F.col("fp").isNotNull())
        .distinct()
        .repartitionByRange(n, "fp", "conv_id")
        .sortWithinPartitions("fp", "conv_id")
    )

    def adjacent(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyspark

        pid = pyspark.TaskContext.get().partitionId()
        prev_fp = prev_cid = None
        first = None
        rows = []
        for pdf in batches:
            fps, cids = pdf["fp"].to_numpy(), pdf["conv_id"].to_numpy()
            for fp, cid in zip(fps, cids):
                if first is None:
                    first = (int(fp), str(cid))
                if prev_fp is not None and fp == prev_fp:
                    rows.append((str(prev_cid), str(cid), None, None, None))
                prev_fp, prev_cid = fp, cid
        # boundary rows: partition's first and last entry for driver fix-up
        if first is not None:
            rows.append((None, None, pid, first[0], first[1]))
            rows.append((None, None, pid + 1_000_000, int(prev_fp), str(prev_cid)))
        yield pd.DataFrame(
            rows, columns=["a", "b", "edge_pos", "edge_fp", "edge_conv"]
        )

    raw = entries.mapInPandas(
        adjacent,
        "a string, b string, edge_pos long, edge_fp long, edge_conv string",
    )
    raw = raw.localCheckpoint()
    pairs = raw.filter(F.col("a").isNotNull()).select("a", "b")
    # driver-side boundary fix-up: last entry of partition i vs first entry
    # of partition i+1
    edges = sorted(
        (
            (r["edge_pos"], r["edge_fp"], r["edge_conv"])
            for r in raw.filter(F.col("edge_pos").isNotNull()).collect()
        )
    )
    firsts = {p: (fp, c) for p, fp, c in edges if p < 1_000_000}
    lasts = {p - 1_000_000: (fp, c) for p, fp, c in edges if p >= 1_000_000}
    fixups = []
    # consecutive non-empty partitions (empty ones are skipped so a run of
    # equal fingerprints can bridge any gap)
    occupied = sorted(firsts)
    for prev_p, next_p in zip(occupied, occupied[1:]):
        fp, c = lasts[prev_p]
        nfp, nc = firsts[next_p]
        if nfp == fp and nc != c:
            fixups.append((c, nc))
    if fixups:
        spark = fps_df.sparkSession
        pairs = pairs.unionByName(
            spark.createDataFrame(fixups, "a string, b string")
        )
    from .candidates import canonical_pairs

    return canonical_pairs(pairs)
