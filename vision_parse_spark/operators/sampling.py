"""Deterministic, engine-portable sampling / split assignment.

Training-data pipelines need train/test membership that is STABLE —
across reruns, engines, cluster sizes, and row order.  Spark's
``df.sample``/``randomSplit`` are none of those (partition-dependent
RNG).  The portable answer is a keyed hash bucket: md5 of the key,
first 60 bits as an integer, modulo a bucket count — reproducible in
any engine with md5 (the same construction the portable MinHash/
SimHash twins use, so DuckDB replays it exactly).

All Catalyst expressions: narrow, no shuffle, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key_col: str, buckets: int = 1000) -> Column:
    """md5-derived integer bucket in [0, buckets) of a key column —
    uniform, deterministic, engine-portable."""
    return F.expr(
        f"cast(conv(substring(md5(cast({key_col} as string)), 1, 15),"
        f" 16, 10) as bigint) % {buckets}"
    )


def with_split(
    df: DataFrame,
    key_col: str,
    train_frac: float = 0.8,
    buckets: int = 1000,
    out_col: str = "split",
) -> DataFrame:
    """Assign each row to 'train' or 'test' by keyed hash bucket.
    Same key -> same split, forever, everywhere; fractions are exact
    to 1/buckets in expectation."""
    b = hash_bucket(key_col, buckets)
    return df.withColumn(
        out_col,
        F.when(b < int(train_frac * buckets), F.lit("train"))
        .otherwise(F.lit("test")),
    )


def hash_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    buckets: int = 1_000_000,
) -> DataFrame:
    """Deterministic ~fraction sample keyed on ``key_col`` — the
    reproducible alternative to ``df.sample`` (which draws different
    rows per run and per partitioning).  Filter is a narrow Catalyst
    predicate that pushes ahead of downstream shuffles."""
    return df.filter(hash_bucket(key_col, buckets)
                     < int(fraction * buckets))
