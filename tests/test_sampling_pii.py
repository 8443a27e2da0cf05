"""Unit tests for dedup/sampling.py (deterministic splits) and dedup/pii.py
(regex scan + redaction) — the properties the oracle rows (q36/q37) don't
pin: partition-independence, cross-table consistency, hashlib agreement,
fraction tolerance, redaction ordering."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from dedup.pii import pii_profile, redact
from dedup.sampling import N_BUCKETS, assign_split, bucket_of, hash_sample

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_split_partition_independent_and_exhaustive(spark):
    base = assign_split(_docs(spark).select("doc_id"), "doc_id")
    shuffled = assign_split(
        _docs(spark).select("doc_id").repartition(13), "doc_id"
    )
    a = {r["doc_id"]: (r["bucket"], r["split"]) for r in base.collect()}
    b = {r["doc_id"]: (r["bucket"], r["split"]) for r in shuffled.collect()}
    assert a == b
    assert set(s for _, s in a.values()) <= {"train", "val", "test"}
    assert len(a) == _docs(spark).count()


def test_split_matches_python_hashlib(spark):
    rows = assign_split(_docs(spark).select("doc_id"), "doc_id").collect()
    for r in rows[:50]:
        hx = hashlib.md5(f"{r['doc_id']}|split-v1".encode()).hexdigest()
        assert r["bucket"] == int(hx[:3], 16)


def test_split_fractions_within_tolerance(spark):
    # 4096 buckets over 500 keys: binomial(500, f); allow 5 sigma
    counts = dict(
        (r["split"], r["cnt"])
        for r in assign_split(_docs(spark).select("doc_id"), "doc_id")
        .groupBy("split")
        .agg(F.count("*").alias("cnt"))
        .collect()
    )
    n = sum(counts.values())
    for split, frac in (("train", 0.8), ("val", 0.1), ("test", 0.1)):
        sigma = (n * frac * (1 - frac)) ** 0.5
        assert abs(counts.get(split, 0) - n * frac) < 5 * sigma, (split, counts)


def test_hash_sample_consistent_across_tables(spark):
    # sampling two relations by the same key at the same salt keeps the
    # same key set — the join-of-samples property
    docs = _docs(spark).select("doc_id")
    other = _docs(spark).select("doc_id", F.length("text").alias("n"))
    a = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.3).collect()}
    b = {r["doc_id"] for r in hash_sample(other, "doc_id", 0.3).collect()}
    assert a == b
    assert 0.2 < len(a) / docs.count() < 0.4


def test_bucket_range(spark):
    mm = (
        _docs(spark)
        .select(bucket_of(F.col("doc_id"), "x").alias("b"))
        .agg(F.min("b").alias("lo"), F.max("b").alias("hi"))
        .collect()[0]
    )
    assert 0 <= mm["lo"] and mm["hi"] < N_BUCKETS


def test_pii_profile_counts_and_redaction(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b-c_d@sub.example.org and 192.168.0.1 ok"),
            (2, "call +44-555-1234 or +1-800-0000 twice +1-800-0000"),
            (3, "no pii here"),
            (4, "x@y.io x@y.io 10.0.0.255"),
        ],
        ["id", "t"],
    )
    out = {r["id"]: r for r in pii_profile(df, "t").collect()}
    assert (out[1]["n_email"], out[1]["n_ipv4"], out[1]["n_phone"]) == (1, 1, 0)
    assert out[1]["redacted"] == "mail <EMAIL> and <IP> ok"
    assert out[2]["n_phone"] == 3
    assert out[2]["redacted"].count("<PHONE>") == 3
    assert (out[3]["n_email"], out[3]["n_ipv4"], out[3]["n_phone"]) == (0, 0, 0)
    assert out[3]["redacted"] == "no pii here"
    assert out[4]["n_email"] == 2 and out[4]["n_ipv4"] == 1
    assert out[4]["redacted"] == "<EMAIL> <EMAIL> <IP>"


def test_redaction_order_email_before_ip(spark):
    # an address like 1.2.3.4@example.com must be consumed by the email
    # pattern first, not split by the ipv4 pass — the fixed-order contract
    df = spark.createDataFrame([(1, "1.2.3.4@mail.example.com")], ["id", "t"])
    row = df.select(redact(F.col("t")).alias("r")).collect()[0]
    assert row["r"] == "<EMAIL>"
