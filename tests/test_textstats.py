"""Text-analysis operator tests (language ID, token counts, quality)."""

from __future__ import annotations

from dedup.textstats import doc_profile


def test_doc_profile(spark):
    rows = [
        (1, "The cat and the dog of the house", "en"),
        (2, "der hund und die katze und der vogel", "de"),
        (3, "le chat et la maison", "fr"),
        (4, "el perro y la casa dice que si", "es"),
        (5, "你好世界 这是一个测试 你好世界 这是一个测试", "zh"),
        (6, "", "empty"),
        (7, "!!! ??? ... ###", "punct"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string, lang string")
    got = {r["doc_id"]: r for r in doc_profile(df).collect()}

    assert got[1]["lang_guess"] == "en"
    assert got[2]["lang_guess"] == "de"
    assert got[3]["lang_guess"] == "fr"
    assert got[4]["lang_guess"] == "es"
    assert got[5]["lang_guess"] == "zh"
    assert got[6]["lang_guess"] == "unknown"

    assert got[1]["n_tokens"] == 8
    assert got[6]["n_tokens"] == 0
    assert got[1]["n_pieces"] == 8
    assert got[7]["n_pieces"] == 0

    assert got[6]["quality"] == 0.0
    assert got[7]["quality"] == 0.0  # all punctuation
    assert 0.0 < got[1]["quality"] <= 1.0
    assert got[1]["punct_ratio"] == 0.0
