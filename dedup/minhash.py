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

# per-row shingle sub-chunk so the (chunk x lanes) temp stays cache-resident
# (~512 shingles x 128 lanes x 8 B = 512 KB): this machine-sympathy detail is
# what lets 32 concurrent workers scale — a batch-wide broadcast matrix is
# DRAM-bandwidth-bound and collapses under multi-process concurrency
_ROW_CHUNK = 512


def perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng([seed, 0xB00F])
    a = rng.integers(0, 2**63, num_perm, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 2**63, num_perm, dtype=np.uint64)
    return a, b


def minhash_batch(
    shingle_arrays: list[np.ndarray], a: np.ndarray, b: np.ndarray
) -> list[np.ndarray | None]:
    """Signatures for a batch of shingle arrays (None for empty docs)."""
    out: list[np.ndarray | None] = [None] * len(shingle_arrays)
    with np.errstate(over="ignore"):
        for i, s in enumerate(shingle_arrays):
            n = len(s)
            if n == 0:
                continue
            x = s.view(np.uint64)
            if n <= _ROW_CHUNK:
                sig = (x[:, None] * a + b).min(axis=0)
            else:
                sig = np.full_like(a, np.iinfo(np.uint64).max)
                for lo in range(0, n, _ROW_CHUNK):
                    np.minimum(
                        sig,
                        (x[lo : lo + _ROW_CHUNK, None] * a + b).min(axis=0),
                        out=sig,
                    )
            out[i] = sig.view(np.int64)
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
