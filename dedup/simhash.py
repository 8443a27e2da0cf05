"""64-bit SimHash + Hamming-ball candidate join (SURVEY.md §2.10, §2.3 J2).

SimHash: per document, each distinct shingle hash votes ±1 on each of 64 bit
positions; the signature packs the vote signs. Whole Arrow batches are
processed with one unpack + np.add.reduceat — no per-row Python.

Candidate pairing uses the pigeonhole scheme of Manku, Jain & Das Sarma
(WWW'07, public): split 64 bits into hamming_d+1 chunks; any pair within
Hamming distance d agrees exactly on ≥1 chunk → equi-join per chunk, then
verify bit_count(xor) <= d JVM-side (Spark ≥3.5 `bit_count`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from .config import DedupConfig

_SHIFTS = np.arange(64, dtype=np.uint64)


def simhash_batch(shingle_arrays: list[np.ndarray]) -> list[int | None]:
    """Per-row bit-vote with cache-resident temporaries (a doc's unpacked bit
    matrix is n_shingles x 64 uint8 ≈ tens of KB): scales under multi-worker
    concurrency where a batch-wide bit matrix saturates DRAM bandwidth."""
    out: list[int | None] = [None] * len(shingle_arrays)
    for i, s in enumerate(shingle_arrays):
        n = len(s)
        if n == 0:
            continue
        x = s.view(np.uint64)
        bits = np.unpackbits(
            x.view(np.uint8).reshape(n, 8), axis=1, bitorder="little"
        )
        ones = bits.sum(axis=0, dtype=np.int32)
        packed = ((ones * 2 > n).astype(np.uint64) << _SHIFTS).sum(dtype=np.uint64)
        v = int(packed)
        out[i] = v - (1 << 64) if v >= 1 << 63 else v
    return out


@F.pandas_udf(T.LongType())
def simhash64(shingles: pd.Series) -> pd.Series:
    arrays = [
        np.asarray(s, dtype=np.int64) if s is not None else np.empty(0, np.int64)
        for s in shingles
    ]
    return pd.Series(pd.array(simhash_batch(arrays), dtype="Int64"))


def chunk_table(
    sim_df: DataFrame, config: DedupConfig, n_chunks: int | None = None
) -> DataFrame:
    """(conv_id, simhash) -> exploded (chunk_id, chunk_val, conv_id, simhash)."""
    n_chunks = n_chunks or (config.hamming_d + 1)
    # chunks must cover all 64 bits (pigeonhole soundness), so widths are
    # ceil/floor-balanced: chunk i covers bits [i*64//n, (i+1)*64//n)
    exprs = []
    for i in range(n_chunks):
        start = i * 64 // n_chunks
        width = (i + 1) * 64 // n_chunks - start
        mask = (1 << width) - 1
        exprs.append(
            F.shiftrightunsigned(F.col("simhash"), start).bitwiseAND(F.lit(mask))
        )
    chunks = F.array(*exprs)
    return (
        sim_df.filter(F.col("simhash").isNotNull())
        .select("conv_id", "simhash", F.posexplode(chunks).alias("chunk_id", "chunk_val"))
    )


def hamming_candidates(sim_df: DataFrame, config: DedupConfig) -> DataFrame:
    """Canonical candidate pairs (a < b) within Hamming distance <= hamming_d.

    Chunk buckets go through the shared skew-aware pair generator
    (candidates.bucket_pairs: salted sizing + bucket cap + hot-key chains)
    rather than a raw self-join — low-entropy chunk values (e.g. all-zero
    high bits) are exactly the hot-key shape that blows up quadratically.
    The Hamming verify itself stays JVM-side via `bit_count`.
    """
    from .candidates import bucket_pairs

    chunks = chunk_table(sim_df, config)
    pairs = bucket_pairs(
        chunks, ["chunk_id", "chunk_val"], config, payload_cols=["simhash"],
        assume_distinct=True,
    )
    return pairs.filter(
        F.bit_count(F.col("simhash_a").bitwiseXOR(F.col("simhash_b")))
        <= config.hamming_d
    ).select("a", "b")
