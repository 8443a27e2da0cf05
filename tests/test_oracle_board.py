"""Regression gate for the FULL oracle board (VERDICT r4 #3).

The driver's CORRECTNESS harness grades only a prefix of the registry
(first 50 entries in round 4), so the tail — two thirds of the board —
previously had no gate the suite owns and could rot silently between
rounds. This runs every ORACLE_SQL row (160 queries) against DuckDB at
sf0.001 through the exact comparison the driver uses (row count, column
names, int-vs-float dtype family, order-insensitive %.9g value keys) and
fails listing every regressed query.

sf0.001 keeps the sweep a few minutes on the shared local[4] test
session; the per-round sf0.01 sweep (BENCH/NOTES.md round-4 gates) stays
the deeper manual check.
"""

from __future__ import annotations

import os

import pytest

from dedup.oracle_check import run_board
from dedup.queries import ORACLE_SQL, QUERIES

SF = "/root/testdata/sf0.001"


@pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata not present")
def test_full_oracle_board_sf0001(spark):
    failures = run_board(spark, SF)
    assert not failures, (
        f"{len(failures)}/{len(ORACLE_SQL)} oracle rows regressed: "
        + "; ".join(f"{k}: {v}" for k, v in sorted(failures.items()))
    )


def test_registry_is_oracle_complete():
    """Every queries() entry has an oracle row except the documented
    rows-only exceptions (hash-dependent FP-bearing intermediates)."""
    rows_only = {"q21_minhash_lsh_pairs"}  # value set is LSH-band dependent
    missing = set(QUERIES) - set(ORACLE_SQL) - rows_only
    assert not missing, f"queries without an oracle row: {sorted(missing)}"
    assert rows_only <= set(QUERIES)
