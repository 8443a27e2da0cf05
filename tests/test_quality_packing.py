"""q61/q62 crafted-corpus parity: the driver's documents table never
exercises the quality gate's failure branches (no '#' symbols, no
over-long words, no 50-token boundary docs) nor q62's exact
capacity-boundary cases (a doc starting exactly at offset CAP, a doc
longer than CAP). This test crafts those and checks the Spark queries
against the DuckDB oracle SQL on the same file — the same parity the
driver's harness computes, on data where every rule branch fires."""

from __future__ import annotations

import duckdb
import pytest

from dedup.queries import _Q62_CAP, ORACLE_SQL, QUERIES


def _docs():
    rows = []

    def add(doc_id, text, source="srcA"):
        rows.append(
            {"doc_id": doc_id, "text": text, "lang": "en", "source": source}
        )

    w50 = " ".join(f"word{i:02d}" for i in range(49))
    # 1: exactly 50 tokens incl. a stopword — every rule passes (keep=1)
    add(1, "the " + w50)
    # 2: 49 tokens — r_wordcount fails at the boundary
    add(2, "the " + " ".join(f"word{i:02d}" for i in range(48)))
    # 3: 50 long words (12 chars) — mean word length > 10, r_meanlen fails
    add(3, "the " + " ".join(f"abcdefghij{i:02d}" for i in range(49)))
    # 4: digit-only tokens — r_alpha fails (and r_stop)
    add(4, " ".join(str(i) for i in range(60)))
    # 5: heavy '#' and '...' — r_symbol fails (10 * 12 symbols > 55 words)
    add(5, "the " + " ".join(f"#tag{i}" for i in range(6))
        + " " + " ".join(f"word{i}... " for i in range(6))
        + " " + " ".join(f"plain{i}" for i in range(42)))
    # 6: no stopword — r_stop fails alone
    add(6, " ".join(f"lorem{i:02d}" for i in range(55)))
    # 7: messy whitespace (tabs/newlines collapse identically both engines)
    add(7, "the\tquick\n\nbrown   fox " + " ".join(f"pad{i}" for i in range(46)))
    # 8: empty text — normalize yields '', split yields one empty token in
    # BOTH engines (len 1), chars 0, meanlen fails
    add(8, "")

    # q62 boundary craft in a dedicated source: doc 101 is exactly CAP
    # tokens (fills seq 0 to the last slot, crosses=False at the edge),
    # doc 102 starts exactly at offset CAP (seq 1, offset % CAP == 0),
    # doc 103 is longer than CAP (straddles into seq 2+)
    add(101, " ".join(f"a{i}" for i in range(_Q62_CAP)), source="srcPack")
    add(102, " ".join(f"b{i}" for i in range(10)), source="srcPack")
    add(103, " ".join(f"c{i}" for i in range(_Q62_CAP + 40)), source="srcPack")
    # single-doc source (one sequence, no straddle)
    add(201, "only doc in this source with the words", source="srcSolo")
    return rows


@pytest.fixture(scope="module")
def doc_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("q61docs")
    spark.createDataFrame(
        _docs(), "doc_id long, text string, lang string, source string"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def _oracle(doc_dir: str, key: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{doc_dir}/documents.parquet/*.parquet')"
    )
    return con.execute(ORACLE_SQL[key]).df()


def test_q61_matches_duckdb_on_every_rule_branch(spark, doc_dir):
    sdf = (
        QUERIES["q61_docs_quality_gate"](spark, doc_dir)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ddf = _oracle(doc_dir, "q61_docs_quality_gate").sort_values(
        "doc_id"
    ).reset_index(drop=True)
    assert list(sdf.columns) == list(ddf.columns)
    for col in sdf.columns:
        assert sdf[col].astype("int64").tolist() == ddf[col].astype(
            "int64"
        ).tolist(), col
    by_id = sdf.set_index("doc_id")
    # each crafted failure branch actually fired, exactly as designed
    assert by_id.loc[1, "keep"] == 1
    assert (by_id.loc[2, ["r_wordcount", "keep"]] == [0, 0]).all()
    assert (by_id.loc[3, ["r_meanlen", "keep"]] == [0, 0]).all()
    assert by_id.loc[4, "r_alpha"] == 0
    assert (by_id.loc[5, ["r_symbol", "keep"]] == [0, 0]).all()
    assert (
        by_id.loc[6, ["r_wordcount", "r_meanlen", "r_alpha", "r_symbol"]] == 1
    ).all()
    assert (by_id.loc[6, ["r_stop", "keep"]] == [0, 0]).all()
    assert by_id.loc[7, "keep"] == 1
    assert (by_id.loc[8, ["r_meanlen", "keep"]] == [0, 0]).all()


def test_q62_matches_duckdb_at_capacity_boundaries(spark, doc_dir):
    sdf = (
        QUERIES["q62_docs_sequence_packing"](spark, doc_dir)
        .toPandas()
        .sort_values(["source", "seq_id"])
        .reset_index(drop=True)
    )
    ddf = _oracle(doc_dir, "q62_docs_sequence_packing").sort_values(
        ["source", "seq_id"]
    ).reset_index(drop=True)
    assert list(sdf.columns) == list(ddf.columns)
    for col in sdf.columns:
        assert sdf[col].tolist() == ddf[col].tolist(), col
    pack = sdf[sdf.source == "srcPack"].set_index("seq_id")
    # doc 101 fills seq 0 exactly: 1 doc, CAP tokens, NO straddle
    assert pack.loc[0, "n_docs"] == 1
    assert pack.loc[0, "n_tokens"] == _Q62_CAP
    assert pack.loc[0, "n_straddlers"] == 0
    # doc 102 starts exactly at offset CAP → lands in seq 1; doc 103
    # (CAP+40 tokens) also starts in seq 1 and straddles into seq 2+
    assert pack.loc[1, "n_docs"] == 2
    assert pack.loc[1, "n_straddlers"] == 1
    solo = sdf[sdf.source == "srcSolo"]
    assert len(solo) == 1 and solo.iloc[0]["n_straddlers"] == 0
