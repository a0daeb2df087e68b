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


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    buckets: int = 1_000_000,
) -> DataFrame:
    """Per-stratum deterministic sampling — the reproducible analog of
    ``df.sampleBy`` (domain/language/quality rebalancing: keep 100% of
    a rare stratum, downsample a dominant one).  Same md5 bucket as
    ``hash_sample`` with a per-stratum threshold, so membership is
    stable across runs/engines/partitionings and the whole predicate
    stays a narrow codegen'd filter (no shuffle, no UDF)."""
    for k, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {k!r} out of [0,1]: {frac}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction out of [0,1]: {default_fraction}")
    b = hash_bucket(key_col, buckets)
    thr: Column = F.lit(int(default_fraction * buckets))
    for k, frac in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == k,
                     F.lit(int(frac * buckets))).otherwise(thr)
    return df.filter(b < thr)


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
