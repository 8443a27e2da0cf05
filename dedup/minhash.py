"""Batched MinHash signatures + LSH band hashing (SURVEY.md §2.4 A2, §2.3 J1).

Signature: per permutation lane, min over shingles of the affine permutation
x -> a*x + b (mod 2^64, a odd — a bijection of the 64-bit space). All lanes
for a whole Arrow batch are computed in one numpy broadcast with
np.minimum.reduceat over row offsets — "batched MinHash" per BASELINE.json:6,
no per-row Python.

Band hashing stays JVM-side: band_hash_i = xxhash64(band_id, slice(sig))
via Spark builtins, then posexplode → (band_id, band_hash, conv_id) rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from .config import DedupConfig

# keep the broadcasted (shingles x lanes) temp under ~256 MB per chunk
_CHUNK_CELLS = 4_000_000


def perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng([seed, 0xB00F])
    a = rng.integers(0, 2**63, num_perm, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 2**63, num_perm, dtype=np.uint64)
    return a, b


def minhash_batch(
    shingle_arrays: list[np.ndarray], a: np.ndarray, b: np.ndarray
) -> list[np.ndarray | None]:
    """Signatures for a batch of shingle arrays (None for empty docs)."""
    num_perm = len(a)
    sizes = np.fromiter((len(s) for s in shingle_arrays), dtype=np.int64)
    out: list[np.ndarray | None] = [None] * len(shingle_arrays)
    nonempty = np.flatnonzero(sizes > 0)
    if len(nonempty) == 0:
        return out
    # chunk rows so flat_size * num_perm stays bounded
    start = 0
    max_rows_flat = max(1, _CHUNK_CELLS // num_perm)
    while start < len(nonempty):
        end = start
        flat = 0
        while end < len(nonempty) and (flat == 0 or flat + sizes[nonempty[end]] <= max_rows_flat):
            flat += sizes[nonempty[end]]
            end += 1
        idx = nonempty[start:end]
        X = np.concatenate([shingle_arrays[i].view(np.uint64) for i in idx])
        with np.errstate(over="ignore"):
            H = X[:, None] * a + b  # (flat, num_perm) wrap-around affine perm
        offs = np.concatenate([[0], np.cumsum(sizes[idx])[:-1]])
        mins = np.minimum.reduceat(H, offs, axis=0)
        for row, i in enumerate(idx):
            out[i] = mins[row].view(np.int64)
        start = end
    return out


def make_minhash_udf(config: DedupConfig):
    a, b = perm_params(config.num_perm, config.seed)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def minhash_sig(shingles: pd.Series) -> pd.Series:
        arrays = [
            np.asarray(s, dtype=np.int64) if s is not None else np.empty(0, np.int64)
            for s in shingles
        ]
        return pd.Series(minhash_batch(arrays, a, b))

    return minhash_sig


def band_table(sig_df: DataFrame, config: DedupConfig) -> DataFrame:
    """(conv_id, sig) -> exploded (band_id, band_hash, conv_id).

    JVM-side: xxhash64 over each signature slice (no UDF). Docs with null
    signatures (empty text) are excluded — they cannot near-dup match.
    """
    r = config.lsh_rows
    bands = F.array(
        *[
            F.xxhash64(F.lit(i), F.slice("sig", i * r + 1, r))
            for i in range(config.lsh_bands)
        ]
    )
    return (
        sig_df.filter(F.col("sig").isNotNull())
        .select("conv_id", F.posexplode(bands).alias("band_id", "band_hash"))
    )
