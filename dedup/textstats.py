"""Text-analysis operators for a training-data pipeline: language ID
(character-class n-gram heuristic), quality scoring (length / punctuation /
stopword-ish ratios), token counting (whitespace + BPE-ish word-piece
regex), and document fingerprinting (rolling hash).

Everything here is pure Spark SQL expressions (JVM-side, codegen'd) so the
DuckDB oracle can reproduce it; the heavy-weight fingerprints reuse the
winnowing machinery in suffix.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from .normalize import normalize_sql

# Rough script-based language signal, ANSI-expressible so both engines agree:
# fraction of CJK chars, of ASCII letters, and a few high-frequency
# function-word hits per language.
_FUNC_WORDS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "fr": ["le", "la", "et"],
    "es": ["el", "la", "que"],
}


def cjk_ratio(col: Column) -> Column:
    no_cjk = F.regexp_replace(col, r"[一-鿿]", "")
    return (F.length(col) - F.length(no_cjk)) / F.greatest(F.length(col), F.lit(1))


def _votes(col: Column, words: list[str]) -> Column:
    padded = F.concat(F.lit(" "), col, F.lit(" "))
    v = F.lit(0)
    for w in words:
        v = v + F.when(padded.contains(f" {w} "), 1).otherwise(0)
    return v


def lang_guess(col: Column) -> Column:
    """Heuristic language ID: CJK char ratio, then function-word votes with
    fixed precedence en > de > fr > es on ties — a plain CASE chain so the
    DuckDB oracle reproduces it verbatim."""
    s = {lang: _votes(col, ws) for lang, ws in _FUNC_WORDS.items()}
    return (
        F.when(cjk_ratio(col) > 0.3, F.lit("zh"))
        .when(
            (s["en"] >= s["de"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["es"]) & (s["en"] > 0),
            F.lit("en"),
        )
        .when((s["de"] >= s["fr"]) & (s["de"] >= s["es"]) & (s["de"] > 0), F.lit("de"))
        .when((s["fr"] >= s["es"]) & (s["fr"] > 0), F.lit("fr"))
        .when(s["es"] > 0, F.lit("es"))
        .otherwise(F.lit("unknown"))
    )


def token_count(col: Column) -> Column:
    """Whitespace token count of the normalized text."""
    return F.when(F.length(col) == 0, F.lit(0)).otherwise(
        F.size(F.split(col, " "))
    ).cast("long")


def wordpiece_count(col: Column) -> Column:
    """BPE-ish sub-token proxy: alternating letter/digit/other runs — the
    standard pre-tokenizer split (\\w runs vs punctuation), ANSI-expressible."""
    pieces = F.array_remove(F.split(col, r"[^0-9A-Za-z]+"), "")
    return F.size(pieces).cast("long")


def punct_ratio(col: Column) -> Column:
    no_punct = F.regexp_replace(col, r"[^\w\s]", "")
    return F.round(
        (F.length(col) - F.length(no_punct)) / F.greatest(F.length(col), F.lit(1)), 4
    )


def quality_score(norm: Column) -> Column:
    """[0,1] doc-quality heuristic: penalize too-short docs, heavy
    punctuation, and single-char tokens."""
    toks = token_count(norm)
    len_term = F.least(toks / F.lit(20.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(norm) * 4, F.lit(1.0))
    return F.round(len_term * punct_term, 4)


def doc_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document text-analysis profile over any (id, text) table."""
    norm = normalize_sql(F.col(text_col))
    return docs.withColumn("norm", norm).select(
        *[c for c in docs.columns],
        lang_guess(F.col("norm")).alias("lang_guess"),
        token_count(F.col("norm")).alias("n_tokens"),
        wordpiece_count(F.col("norm")).alias("n_pieces"),
        punct_ratio(F.col("norm")).alias("punct_ratio"),
        quality_score(F.col("norm")).alias("quality"),
    ).drop("norm")
