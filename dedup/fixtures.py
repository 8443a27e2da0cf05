"""S5: deterministic synthetic transcript corpus with planted duplicate
families (FIXTURES.md §B). No external data; fully reproducible from
(n_convs, seed): all randomness flows through numpy Generators seeded from
(seed, conv_index) — no wall clock, no global RNG.

Families (by conv-index band, fractions of n):
  uniques 60% | exact dups 10% | near-dup high 10% | near-dup low 5% |
  fuzzy (char noise) 5% | substring overlap 5% | hot-key flood 5%

Ground truth for planted families comes from construction (family + source
index are recoverable from the index alone); the recall oracle used by tests
is brute-force exact shingle-Jaccard (tests/oracle.py), per BASELINE.md.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .io import TRANSCRIPT_SCHEMA

VOCAB_SIZE = 4000
_BASE_TS = pd.Timestamp("2025-01-01T00:00:00")

# family bands as cumulative fractions of n_convs
_BANDS = [
    ("unique", 0.60),
    ("exact", 0.70),
    ("near_hi", 0.80),
    ("near_lo", 0.85),
    ("fuzzy", 0.90),
    ("substring", 0.95),
    ("flood", 1.00),
]


def family_of(idx: int, n: int) -> str:
    frac = idx / n
    for name, hi in _BANDS:
        if frac < hi:
            return name
    return "flood"


def _n_uniques(n: int) -> int:
    return max(1, int(n * 0.60))


def source_of(idx: int, n: int) -> int:
    """Deterministic source-unique index for clone families."""
    return (idx * 2654435761) % _n_uniques(n)


def _word(j: int) -> str:
    return f"w{j:05d}"


def _sample_tokens(rng: np.random.Generator, n_tok: int) -> list[str]:
    # power-law-ish skew toward low word ids → realistic shingle statistics
    u = rng.random(n_tok)
    ids = (VOCAB_SIZE * u * u).astype(np.int64)
    return [_word(j) for j in ids]


def _gen_turns(idx: int, seed: int) -> list[str]:
    """Pure function: turn texts of unique conversation `idx`."""
    rng = np.random.default_rng([seed, idx, 7])
    n_turns = int(rng.integers(3, 21))
    return [
        " ".join(_sample_tokens(rng, int(rng.integers(8, 40))))
        for _ in range(n_turns)
    ]


def _perturb_tokens(texts: list[str], rng: np.random.Generator, rate: float) -> list[str]:
    """Substitute ~rate of tokens, budgeted over the whole document (a 3% rate
    on 3-gram shingles lands near Jaccard (1-3r)/(1+3r) ≈ 0.84)."""
    toks_per_turn = [t.split(" ") for t in texts]
    total = sum(len(t) for t in toks_per_turn)
    n_sub = int(round(total * rate))
    flat_pos = rng.integers(0, total, n_sub)
    bounds = np.cumsum([len(t) for t in toks_per_turn])
    for pos in flat_pos:
        turn = int(np.searchsorted(bounds, int(pos), side="right"))
        off = int(pos) - (int(bounds[turn - 1]) if turn > 0 else 0)
        toks_per_turn[turn][off] = _word(int(rng.integers(0, VOCAB_SIZE)))
    return [" ".join(t) for t in toks_per_turn]


def _char_noise(texts: list[str], rng: np.random.Generator, n_edits: int) -> list[str]:
    """A handful of typos / unicode-width variants over the whole document —
    SimHash-Hamming + NFKC territory (few enough edits that the 64-bit
    SimHash stays within the configured Hamming ball)."""
    out = list(texts)
    for _ in range(n_edits):
        ti = int(rng.integers(0, len(out)))
        s = list(out[ti])
        p = int(rng.integers(0, len(s)))
        op = int(rng.integers(0, 3))
        if op == 0 and s[p] != " ":
            s[p] = chr(ord("a") + int(rng.integers(0, 26)))
        elif op == 1 and p + 1 < len(s) and s[p] != " " and s[p + 1] != " ":
            s[p], s[p + 1] = s[p + 1], s[p]
        else:
            # fullwidth digit — NFKC-normalizes back to ASCII
            s[p] = chr(0xFF10 + int(rng.integers(0, 10)))
        out[ti] = "".join(s)
    return out


def _conv_rows(idx: int, n: int, seed: int) -> list[tuple]:
    fam = family_of(idx, n)
    rng = np.random.default_rng([seed, idx, 13])
    if fam == "unique":
        texts = _gen_turns(idx, seed)
    elif fam == "exact":
        texts = _gen_turns(source_of(idx, n), seed)
    elif fam == "near_hi":
        texts = _perturb_tokens(
            _gen_turns(source_of(idx, n), seed), rng, float(rng.uniform(0.005, 0.03))
        )
    elif fam == "near_lo":
        texts = _perturb_tokens(
            _gen_turns(source_of(idx, n), seed), rng, float(rng.uniform(0.10, 0.25))
        )
    elif fam == "fuzzy":
        texts = _char_noise(
            _gen_turns(source_of(idx, n), seed), rng, int(rng.integers(1, 4))
        )
    elif fam == "substring":
        # pairs (2i, 2i+1) within the band share one injected >=200-token run
        band_pos = idx - int(n * 0.90)
        run_rng = np.random.default_rng([seed, band_pos // 2, 99])
        run = " ".join(_sample_tokens(run_rng, 220))
        texts = _gen_turns(idx, seed)
        texts[len(texts) // 2] = run
    else:  # flood: one hot text cloned across the whole band
        flood_rng = np.random.default_rng([seed, 0, 101])
        texts = [" ".join(_sample_tokens(flood_rng, 120))]

    conv_id = f"c{idx:08d}"
    rows = []
    roles = ["user", "assistant"]
    for t_i, text in enumerate(texts):
        role = roles[t_i % 2]
        tool = None
        if role == "assistant" and int(rng.integers(0, 5)) == 0:
            tool = f"tool_{int(rng.integers(0, 8))}"
        ts = _BASE_TS + pd.Timedelta(seconds=idx * 60 + t_i)
        rows.append((conv_id, t_i, role, text, tool, ts))
    return rows


def gen_transcripts(
    spark: SparkSession,
    n_convs: int,
    seed: int = 42,
    partitions: int = 16,
    edge_rows: bool = True,
) -> DataFrame:
    """Deterministic transcript corpus as a Spark DataFrame (binding schema).

    Distributed: conv indices fan out via spark.range → mapInPandas; each
    task derives its own seeded RNG, so output content is independent of
    partitioning / task order.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for idx in pdf["id"].tolist():
                rows.extend(_conv_rows(int(idx), n_convs, seed))
            yield pd.DataFrame(
                rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
            )

    df = (
        spark.range(0, n_convs, 1, partitions)
        .mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)
    )
    if edge_rows:
        edge = spark.createDataFrame(
            [
                # single-turn conv with non-ASCII text (zh + emoji)
                ("edge_zh", 0, "user", "你好 世界 🌍 你好 世界 测试", None, _BASE_TS.to_pydatetime()),
                # empty-text turn plus turn_idx gap (0 then 5): order must hold
                ("edge_gap", 0, "user", "", None, _BASE_TS.to_pydatetime()),
                ("edge_gap", 5, "assistant", _word(1) + " " + _word(2) + " " + _word(3), None, _BASE_TS.to_pydatetime()),
            ],
            schema=TRANSCRIPT_SCHEMA,
        )
        df = df.unionByName(edge)
    return df


def gen_quarantine_fixture(spark: SparkSession) -> DataFrame:
    """A corpus with a duplicate (conv_id, turn_idx) — must be quarantined
    by the validity stage (row invariant W2, BASELINE.json:15)."""
    rows = [
        ("bad", 0, "user", "a b c", None, _BASE_TS.to_pydatetime()),
        ("bad", 0, "assistant", "d e f", None, _BASE_TS.to_pydatetime()),
        ("ok", 0, "user", "g h i", None, _BASE_TS.to_pydatetime()),
    ]
    return spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)


def expected_exact_groups(n_convs: int) -> dict[str, list[str]]:
    """Construction-time truth: exact-dup groups (source unique -> clones),
    plus the flood group. Used by unit tests."""
    groups: dict[str, list[str]] = {}
    for idx in range(n_convs):
        fam = family_of(idx, n_convs)
        if fam == "exact":
            src = source_of(idx, n_convs)
            groups.setdefault(f"c{src:08d}", []).append(f"c{idx:08d}")
        elif fam == "flood":
            groups.setdefault("__flood__", []).append(f"c{idx:08d}")
    return groups
