"""Bucketed-table sink — shuffle-free downstream joins.

At 100 TB the extraction output is re-joined constantly (goldens,
lineage audits, enrichment).  Writing both sides bucketed+sorted on
the join key means Spark proves co-partitioning from metadata and
plans a sort-merge join with NO Exchange on either side — the shuffle
is paid once at write time, then amortized over every join.

This is the managed-table analog of the Iceberg ``bucket(N, conv_id)``
partition transform the production sink would use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str = "conv_id",
    n_buckets: int = 16,
    sort_col: str | None = "turn_idx",
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed
    table keyed for downstream co-located joins."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def cojoined(
    spark: SparkSession, left_table: str, right_table: str,
    on: str = "conv_id",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key.  With
    matching bucket specs the physical plan contains no Exchange —
    assert via ``df._jdf.queryExecution().executedPlan()``."""
    return spark.table(left_table).join(spark.table(right_table), on)
