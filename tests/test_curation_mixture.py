"""q60 curation-mixture: the driver's documents table carries no exact
clones at any sf tier, so the keep policy's interesting branch (drop all
but the min-doc_id representative of an exact group) never fires in the
oracle run. This test crafts a corpus that exercises every tier and checks
the Spark query against the DuckDB oracle SQL on the same file — the same
parity the driver's harness computes, on data where the policy matters."""

from __future__ import annotations

import math

import duckdb
import pytest

from dedup.queries import ORACLE_SQL, QUERIES

LOREM = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lambda mu nu xi omicron pi rho sigma tau upsilon"
)  # exactly 20 tokens: one full q35 segment


def _docs():
    rows = []

    def add(doc_id, text, lang="en", source="srcA"):
        rows.append(
            {"doc_id": doc_id, "text": text, "lang": lang, "source": source}
        )

    # exact group of 3 (normalize_sql collapses case + whitespace): the
    # keep policy must retain only doc 1
    add(1, "The quick brown fox jumps over the lazy dog today")
    add(2, "the quick brown fox jumps over the lazy dog today")
    add(3, "THE QUICK  brown fox jumps over the  lazy dog   today")
    # exact pair in a DIFFERENT source: election is per norm group, cells
    # split by source, so srcB keeps 4 and drops 5's tokens from its cell
    add(4, "copied boilerplate header shared verbatim between mirrors", source="srcB")
    add(5, "copied boilerplate header shared verbatim between mirrors", source="srcB")
    # near pair (token-Jaccard >= 0.5 within same lang+source), kept
    add(6, "spark engines shuffle partitions across executors for joins")
    add(7, "spark engines shuffle partitions across executors for aggregates")
    # segment pair: share one aligned 20-token run but stay under the 0.5
    # near-Jaccard bar (20 shared / 70 union), so tier 1 is what fires; kept
    filler8 = " ".join(f"eightword{i}" for i in range(25))
    filler9 = " ".join(f"nineword{i}" for i in range(25))
    add(8, LOREM + " " + filler8, source="srcB")
    add(9, LOREM + " " + filler9, source="srcB")
    # uniques
    add(10, "completely unrelated text about gardening and weather")
    add(11, "another singleton document mentioning telescopes", source="srcB")
    return rows


@pytest.fixture(scope="module")
def doc_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("q60docs")
    spark.createDataFrame(
        _docs(), "doc_id long, text string, lang string, source string"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_q60_matches_duckdb_oracle_with_exact_clones(spark, doc_dir):
    sdf = (
        QUERIES["q60_curation_mixture"](spark, doc_dir)
        .toPandas()
        .sort_values(["source", "tier_rank"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{doc_dir}/documents.parquet/*.parquet')"
    )
    ddf = (
        con.execute(ORACLE_SQL["q60_curation_mixture"])
        .df()
        .sort_values(["source", "tier_rank"])
        .reset_index(drop=True)
    )
    assert sorted(sdf.columns) == sorted(ddf.columns)
    assert len(sdf) == len(ddf)
    for i in range(len(sdf)):
        for c in sdf.columns:
            a, b = sdf.at[i, c], ddf.at[i, c]
            if isinstance(a, float):
                assert math.isclose(a, b, rel_tol=0, abs_tol=0), (i, c, a, b)
            else:
                assert a == b, (i, c, a, b)


def test_q60_keep_policy_drops_exact_clones_only(spark, doc_dir):
    out = QUERIES["q60_curation_mixture"](spark, doc_dir).toPandas()
    cells = {
        (r.source, r.tier): r for r in out.itertuples(index=False)
    }
    # srcA exact cell: docs 1,2,3 -> one representative survives
    a_exact = cells[("srcA", "exact")]
    assert a_exact.n_docs == 3 and a_exact.n_kept == 1
    # srcB exact cell: docs 4,5 -> doc 4 (min id) kept; identical texts, so
    # exactly half the cell's tokens survive
    b_exact = cells[("srcB", "exact")]
    assert b_exact.n_docs == 2 and b_exact.n_kept == 1
    assert b_exact.tokens_kept * 2 == b_exact.tokens_total
    # near and segment tiers keep everything (down-weighted, not dropped)
    for key in (("srcA", "near"), ("srcB", "segment")):
        cell = cells[key]
        assert cell.n_docs == 2
        assert cell.n_kept == cell.n_docs
        assert cell.tokens_kept == cell.tokens_total
    # uniques kept; mixture shares partition the kept-token budget
    assert cells[("srcA", "unique")].n_kept == 1
    assert cells[("srcB", "unique")].n_kept == 1
    assert math.isclose(out.kept_token_share.sum(), 1.0, abs_tol=1e-12)
