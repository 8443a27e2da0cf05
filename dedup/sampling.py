"""Deterministic hash-bucket splits and sampling (training-data curation op).

Train/validation/test assignment for a 100-TB corpus must be a pure
function of a stable key — never `rand()` — so that (a) re-runs, resumed
runs, and incremental drains assign identically, (b) the split survives
repartitioning and engine changes, and (c) downstream dedup/decontam can
reason about "the val set" as a deterministic relation. This is the
standard hash-mod split of large-scale pipelines (public method: the
fractional hash-bucket convention, e.g. TFDS/Beam's `split_name` hashing
and the C4 heldout convention, Raffel'20).

Mechanics: bucket = first 3 hex digits of md5(key || '|' || salt) →
[0, 4096); split thresholds are `round(4096 * fraction)`. md5 (not
xxhash64) because every engine in the parity loop has it (Spark, DuckDB,
Python hashlib), making the assignment oracle-checkable bit-for-bit
(q37). Resolution is 1/4096 ≈ 0.02% — fine for split fractions.

Scale shape: stateless narrow projection — no shuffle, no UDF. The hex →
int conversion is `conv(hex, 16, 10)` on the Spark side and instr()
positional arithmetic in the DuckDB oracle (which lacks conv); both
produce the same integer, which is what the parity check pins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

N_BUCKETS = 4096
_HEX = "0123456789abcdef"


def bucket_of(key: Column, salt: str) -> Column:
    """[0, 4096) bucket from md5(key || '|' || salt), first 3 hex digits."""
    hx = F.md5(F.concat_ws("|", key.cast("string"), F.lit(salt)))
    return F.conv(F.substring(hx, 1, 3), 16, 10).cast("int")


def bucket_sql(key_expr: str, salt: str) -> str:
    """The DuckDB-equivalent bucket expression (identical arithmetic)."""
    hx = f"md5(concat({key_expr}, '|', '{salt}'))"
    d = lambda i: f"(instr('{_HEX}', substring({hx}, {i}, 1)) - 1)"
    return f"({d(1)} * 256 + {d(2)} * 16 + {d(3)})"


def assign_split(
    df: DataFrame,
    key_col: str,
    salt: str = "split-v1",
    train: float = 0.8,
    val: float = 0.1,
) -> DataFrame:
    """Attach deterministic (bucket, split) columns keyed on `key_col`.

    split ∈ {'train','val','test'} with fractions (train, val,
    1-train-val); thresholds are round(4096·f) so the DuckDB oracle can
    reproduce them exactly.
    """
    t1 = round(N_BUCKETS * train)
    t2 = round(N_BUCKETS * (train + val))
    b = bucket_of(F.col(key_col), salt)
    return df.withColumn("bucket", b).withColumn(
        "split",
        F.when(F.col("bucket") < t1, F.lit("train"))
        .when(F.col("bucket") < t2, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = "sample-v1"
) -> DataFrame:
    """Deterministic ~`fraction` sample: keep rows whose bucket falls under
    round(4096·fraction). Stable under repartitioning and re-runs, and
    consistent across tables sharing the key (a join of two hash-samples
    at the same salt is a sample of the join)."""
    return df.filter(bucket_of(F.col(key_col), salt) < round(N_BUCKETS * fraction))
