"""k-shingling + 64-bit hashing (SURVEY.md §2.10 `shingle_hash`).

One Arrow batch pass: tokenize, hash every token once (SipHash via
pandas.util.hash_array — deterministic across runs/workers), then combine k
consecutive token hashes with a fixed-odd-constant polynomial in Z_2^64 and
a final avalanche mix. All numpy; the only Python-level loop is per-row
boundary bookkeeping via reduceat offsets.

Spec: BASELINE.json:6 "normalized and shingled via vectorized Arrow/pandas
UDFs"; recall is defined at fixed (k, num_perm) config (BASELINE.json:14).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F, types as T

# fixed odd constants (splitmix64 / murmur finalizer family — public domain)
_MIX_M1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX_M2 = np.uint64(0x94D049BB133111EB)
_POLY_C = np.uint64(0x9E3779B97F4A7C15)  # odd → invertible mod 2^64


def mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — breaks polynomial structure before use."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= _MIX_M1
    x ^= x >> np.uint64(27)
    x *= _MIX_M2
    x ^= x >> np.uint64(31)
    return x


def token_hashes(text: str) -> np.ndarray:
    """uint64 hash per whitespace token of one document (helper for oracle /
    suffix code paths)."""
    toks = text.split()
    if not toks:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(np.asarray(toks, dtype=object)).astype(np.uint64)


def _batch_token_hashes(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Tokenize + hash a whole Arrow batch at once.

    Returns (flat uint64 token hashes, row offsets for reduceat-style ops).
    """
    tok_lists = texts.fillna("").str.split()
    counts = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=len(tok_lists))
    flat = [t for toks in tok_lists for t in toks]
    if flat:
        hashes = pd.util.hash_array(np.asarray(flat, dtype=object)).astype(np.uint64)
    else:
        hashes = np.empty(0, dtype=np.uint64)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    return hashes, offsets


def _shingles_one(t: np.ndarray, k: int) -> np.ndarray:
    """Distinct k-gram shingle hashes of one token-hash sequence."""
    m = len(t)
    if m == 0:
        return np.empty(0, dtype=np.int64)
    if m < k:
        k = m  # short doc: one shingle over everything it has
    with np.errstate(over="ignore"):
        s = np.zeros(m - k + 1, dtype=np.uint64)
        for j in range(k):
            s = s * _POLY_C + t[j : m - k + 1 + j]
        s = mix64(s)
    return np.unique(s).view(np.int64)


def make_shingle_udf(k: int):
    """Scalar pandas UDF string(normalized) -> array<long> of distinct
    hashed k-shingles."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def shingle_hash(texts: pd.Series) -> pd.Series:
        hashes, offsets = _batch_token_hashes(texts)
        out = [
            _shingles_one(hashes[offsets[i] : offsets[i + 1]], k)
            for i in range(len(texts))
        ]
        return pd.Series(out)

    return shingle_hash
