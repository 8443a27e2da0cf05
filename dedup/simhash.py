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
    sizes = np.fromiter((len(s) for s in shingle_arrays), dtype=np.int64)
    out: list[int | None] = [None] * len(shingle_arrays)
    nonempty = np.flatnonzero(sizes > 0)
    if len(nonempty) == 0:
        return out
    X = np.concatenate([shingle_arrays[i].view(np.uint64) for i in nonempty])
    bits = ((X[:, None] >> _SHIFTS) & np.uint64(1)).astype(np.int64)  # (flat, 64)
    offs = np.concatenate([[0], np.cumsum(sizes[nonempty])[:-1]])
    votes = np.add.reduceat(bits, offs, axis=0) * 2 - sizes[nonempty][:, None]
    packed = ((votes > 0).astype(np.uint64) << _SHIFTS).sum(axis=1, dtype=np.uint64)
    signed = packed.view(np.int64) if packed.ndim else packed
    for row, i in enumerate(nonempty):
        out[i] = int(signed[row])
    return out


@F.pandas_udf(T.LongType())
def simhash64(shingles: pd.Series) -> pd.Series:
    arrays = [
        np.asarray(s, dtype=np.int64) if s is not None else np.empty(0, np.int64)
        for s in shingles
    ]
    return pd.Series(pd.array(simhash_batch(arrays), dtype="Int64"))


def chunk_table(sim_df: DataFrame, config: DedupConfig) -> DataFrame:
    """(conv_id, simhash) -> exploded (chunk_id, chunk_val, conv_id, simhash)."""
    n_chunks = config.hamming_d + 1
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
        chunks, ["chunk_id", "chunk_val"], config, payload_cols=["simhash"]
    )
    return pairs.filter(
        F.bit_count(F.col("simhash_a").bitwiseXOR(F.col("simhash_b")))
        <= config.hamming_d
    ).select("a", "b")
