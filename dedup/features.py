"""Fused feature extraction (SURVEY.md §2.10): one Arrow pass per batch
computes shingles, MinHash signature, SimHash, and suffix fingerprints —
tokenization and hashing happen exactly once, and shingle arrays never make
an extra JVM↔Python round trip (they would otherwise be shipped back into
the minhash/simhash UDFs).

mapInPandas (not N scalar UDFs): the per-batch iterator lets all four
features share the token-hash arrays.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .config import DedupConfig
from .minhash import minhash_batch, perm_params
from .shingle import _batch_token_hashes, _shingles_one
from .simhash import simhash_batch
from .suffix import window_fingerprints

FEATURE_SCHEMA = (
    "conv_id string, shingles array<long>, suffix_fps array<long>, "
    "sig array<long>, simhash long"
)


def compute_features(
    conv_ids: pd.Series, norm_texts: pd.Series, config: DedupConfig
) -> pd.DataFrame:
    a, b = perm_params(config.num_perm, config.seed)
    hashes, offsets = _batch_token_hashes(norm_texts)
    n = len(norm_texts)
    shingles = [
        _shingles_one(hashes[offsets[i] : offsets[i + 1]], config.k_shingle)
        for i in range(n)
    ]
    suffix = [
        window_fingerprints(
            hashes[offsets[i] : offsets[i + 1]].astype(np.uint64),
            config.suffix_window,
            config.suffix_winnow,
        )
        for i in range(n)
    ]
    sigs = minhash_batch(shingles, a, b)
    sims = simhash_batch(shingles)
    return pd.DataFrame(
        {
            "conv_id": conv_ids.reset_index(drop=True),
            "shingles": shingles,
            "suffix_fps": suffix,
            "sig": sigs,
            "simhash": pd.array(sims, dtype="Int64"),
        }
    )


def featurize(
    docs: DataFrame, config: DedupConfig, partitions: int | None = None
) -> DataFrame:
    """(conv_id, norm_text, ...) -> (conv_id, shingles, suffix_fps, sig,
    simhash).

    `partitions` overrides the fan-out (default config.shuffle_partitions):
    callers that know the input is tiny (an incremental micro-batch) size
    it to the batch so a ~100-doc merge does not pay ~50 near-empty Python
    tasks of scheduling + Arrow startup. Values are per-doc deterministic,
    so the partition count never affects results.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield compute_features(pdf["conv_id"], pdf["norm_text"], config)

    # explicit repartition: feature extraction is CPU-bound Python — spread
    # it over all cores even when the docs table is byte-wise tiny (reading
    # a materialized stage back would otherwise coalesce to a few splits)
    return (
        docs.select("conv_id", "norm_text")
        .repartition(partitions or config.shuffle_partitions, "conv_id")
        .mapInPandas(run, FEATURE_SCHEMA)
    )
