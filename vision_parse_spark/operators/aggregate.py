"""Skew-safe per-conversation aggregation (north_rule).

Turn-grain extraction is shuffle-free, but anything grouped per
``conv_id`` inherits the Zipf skew of conversation lengths (one
10^8-turn conversation = one straggler reducer).  The standard fix is
two-phase salted aggregation:

    phase 1: groupBy(conv_id, salt)  — the hot key spreads over
             ``salt_buckets`` reducers, partial aggregates are tiny
    phase 2: groupBy(conv_id)        — combines ``salt_buckets``
             partials per key, trivially balanced

Only algebraic aggregates (count/sum/min/max) distribute this way;
``conv_stats_salted`` exposes exactly those.  AQE's skew handling
covers joins, not aggregations — hence explicit salting here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def conv_stats_salted(
    df: DataFrame,
    group_col: str = "conv_id",
    length_col: str = "text",
    salt_buckets: int = 32,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Per-conversation turn count / char sum / ts span, computed with
    a salted two-phase aggregation.  Result is identical to a direct
    ``groupBy(group_col)`` (verified in tests + DuckDB oracle) but
    immune to hot-key stragglers.

    The salt is a DETERMINISTIC row-value hash: under task retry or
    speculation a replayed map task must route every row to the same
    salt bucket, or partial aggregates straddle attempts (rows dropped
    or double-counted mid-shuffle).  ``monotonically_increasing_id()``
    breaks that contract — it numbers rows per attempt.

    The hash covers a WIDE tuple, not just the payload: a hot key
    whose rows share identical text (duplicated payloads, NULL turns —
    xxhash64(NULL) is one constant) would collapse into a single salt
    bucket and resurrect the straggler.  Any per-row-distinct column
    present (turn_idx, ts) keeps identical payloads spread."""
    if salt_cols is None:
        salt_cols = [group_col, length_col] + [
            c for c in ("turn_idx", "ts") if c in df.columns
        ]
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]),
                  F.lit(salt_buckets))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(group_col, "_salt")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.length(length_col)).alias("_chars"),
            F.min(length_col).alias("_min_text"),
            F.max(length_col).alias("_max_text"),
        )
    )
    return (
        partial.groupBy(group_col)
        .agg(
            F.sum("_n").alias("n_turns"),
            F.sum("_chars").alias("total_chars"),
            F.min("_min_text").alias("min_text"),
            F.max("_max_text").alias("max_text"),
        )
    )


def conv_stats_direct(
    df: DataFrame,
    group_col: str = "conv_id",
    length_col: str = "text",
) -> DataFrame:
    """Single-phase reference aggregation (for equivalence checks)."""
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(F.length(length_col)).alias("total_chars"),
        F.min(length_col).alias("min_text"),
        F.max(length_col).alias("max_text"),
    )


def top_k_per_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    k: int,
    tiebreak_col: str,
    descending: bool = True,
    rank_col: str = "rank",
) -> DataFrame:
    """Keep the top-``k`` rows of every group by ``order_col`` — the
    per-source best-quality selection step of a curation pipeline
    ("keep the 10k highest-quality docs per domain").

    Scale shape (100 TB): ONE shuffle on the group key, then a
    per-partition sort + running rank — Spark's WindowExec spills
    sorted runs, so a hot group degrades to disk-sorted, never OOM;
    with ``k`` small relative to group size the dominant cost is the
    sort, the same as any global-ranking semantics requires.  The
    rank is emitted (``rank_col``) so downstream sampling can
    stratify on it.

    ``tiebreak_col`` is REQUIRED (always ascending): row_number over
    a tied ``order_col`` without one picks a partition-order-
    dependent survivor set — irreproducible output, which every
    operator in this engine forbids.  Integer quality scores tie
    heavily, so this is the common case, not the corner.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if rank_col in df.columns:
        raise ValueError(
            f"input already has a {rank_col!r} column; pass rank_col= "
            f"to avoid silently clobbering it")
    order = [F.col(order_col).desc() if descending
             else F.col(order_col).asc(),
             F.col(tiebreak_col).asc()]
    w = Window.partitionBy(group_col).orderBy(*order)
    return (df.withColumn(rank_col, F.row_number().over(w))
              .filter(F.col(rank_col) <= k))
