"""Pipeline configuration.

The recall target is defined "at the same shingle/signature config"
(BASELINE.json:14), so the config fingerprint is correctness-relevant:
resume refuses to mix stages computed under different fingerprints.

Reference parity: the reference (AleKolar/Final_deduplicator, snapshot at
/root/reference — a codeless README) implied a per-event hash-lookup dedup
service; this config generalizes that exact-hash semantics to near-dup
detection per the spec (BASELINE.json:6,14).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field, replace


# Bumped whenever operator semantics change (pair generation, verification,
# normalization): it salts the config fingerprint so resume can never reuse
# stages materialized by a different engine version.
ENGINE_VERSION = 4  # r4: O(delta) incremental candidate/exact lookup indexes


@dataclass(frozen=True)
class DedupConfig:
    # --- shingling ---
    k_shingle: int = 3              # word k-grams for Jaccard / MinHash
    min_shingles: int = 1           # drop docs with fewer shingles from near-dup paths
    # --- MinHash / LSH ---
    num_perm: int = 128             # signature length
    lsh_bands: int = 32             # bands; rows = num_perm // lsh_bands
    # --- SimHash / Hamming ---
    simhash_bits: int = 64
    hamming_d: int = 3              # Hamming-ball radius; pigeonhole chunks = d + 1
    # --- suffix (long-substring) pass ---
    suffix_window: int = 32         # tokens per fingerprinted window
    suffix_winnow: int = 16         # winnowing window (anchor guarantee every w positions)
    suffix_min_tokens: int = 48     # min shared token-run considered a substring dup
    # --- verification / clustering ---
    jaccard_threshold: float = 0.80
    max_cc_rounds: int = 25
    # edge sets at or below this row count are clustered with driver-side
    # union-find (one collect, no iterative joins); larger graphs run the
    # distributed large-star/small-star loop. ~60 B/edge → default ≈ 300 MB.
    cc_local_threshold: int = 5_000_000
    # --- skew / shuffle ---
    bucket_cap: int = 64            # max members per LSH/suffix bucket before capping
    salt_buckets: int = 16          # salting fan-out for skewed two-stage aggs
    shuffle_partitions: int = 32
    # --- determinism ---
    seed: int = 42

    def __post_init__(self) -> None:
        if self.num_perm % self.lsh_bands != 0:
            raise ValueError("num_perm must be divisible by lsh_bands")
        if self.simhash_bits != 64:
            raise ValueError("only 64-bit SimHash is implemented")
        if self.hamming_d < 0 or self.hamming_d > 15:
            raise ValueError("hamming_d out of supported range [0, 15]")

    @property
    def lsh_rows(self) -> int:
        return self.num_perm // self.lsh_bands

    def to_json(self) -> str:
        return json.dumps(
            {**asdict(self), "_engine": ENGINE_VERSION},
            sort_keys=True,
            separators=(",", ":"),
        )

    @property
    def fingerprint(self) -> str:
        """Stable hash of the full config; part of every run's identity."""
        return hashlib.sha256(self.to_json().encode()).hexdigest()[:16]

    def with_(self, **kw) -> "DedupConfig":
        return replace(self, **kw)


DEFAULT_CONFIG = DedupConfig()
