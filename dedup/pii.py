"""PII detection + redaction over text columns (training-data curation op).

Web-scale corpora are scrubbed for personally identifiable information
before training (public method: the C4 blocklist/regex pass, Raffel'20, and
the email/IP/phone regex scrub described for The Pile / ROOTS, Laurencon'22
§4). This module is the Spark-first version: pattern counting and
redaction run entirely JVM-side (`regexp_count` / `regexp_replace`,
whole-stage-codegen'd) — no Python in the hot path, so the scan rides the
same one pass over the corpus as any other projection.

Patterns are deliberately written in the regex subset where Java's engine
(Spark) and RE2 (DuckDB) agree — character classes, bounded repetition,
alternation, no backrefs/lookaround — so the operator is oracle-checkable
(q36) and portable to other engines.

Scale shape: pure stateless narrow ops — no shuffle, no UDF; predicate
and column pruning flow through untouched. Redaction order is fixed
(email → ipv4 → phone) and part of the operator contract, since an
earlier replacement can destroy a later pattern's match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Java-regex and RE2 compatible (no lookaround/backrefs).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d{1,3}-\d{3}-\d{4}"

_PATTERNS = (
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ipv4", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
)


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-pattern match counts for one text column (JVM regexp_count)."""
    return {
        f"n_{name}": F.regexp_count(col, F.lit(pat)).cast("long")
        for name, pat, _ in _PATTERNS
    }


def redact(col: Column) -> Column:
    """Replace every PII match with its placeholder token, in the fixed
    email -> ipv4 -> phone order (the contract: identical order in the
    DuckDB oracle and any port)."""
    out = col
    for _, pat, token in _PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_profile(df: DataFrame, text_col: str) -> DataFrame:
    """Attach per-row PII counts and a redacted copy of `text_col`.

    Adds columns n_email, n_ipv4, n_phone (long) and redacted (string);
    leaves every input column in place.
    """
    col = F.col(text_col)
    out = df
    for name, expr in pii_counts(col).items():
        out = out.withColumn(name, expr)
    return out.withColumn("redacted", redact(col))
