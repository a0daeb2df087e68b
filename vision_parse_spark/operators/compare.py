"""Golden-comparison operator — the north_rule verification join.

"matching the reference's extracted text/spans per turn (per-turn text
equality under stable turn ordering)" as a reusable distributed op:
full-outer join on the key, per-turn verdict, and a summary row.  The
join inherits AQE skew handling (spark.sql.adaptive.skewJoin.enabled
is on in get_spark) so one enormous conversation cannot straggle the
compare at 10^12 turns.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def compare_extractions(
    actual: DataFrame,
    expected: DataFrame,
    key_cols: Sequence[str] = ("conv_id", "turn_idx"),
    value_col: str = "markdown",
) -> DataFrame:
    """Per-key comparison: verdict in {'match','diff','missing',
    'extra'} ('missing' = in expected only, 'extra' = in actual only).
    Returns one row per key in either side."""
    a = actual.select(*key_cols, F.col(value_col).alias("_actual"))
    e = expected.select(*key_cols, F.col(value_col).alias("_expected"))
    joined = a.join(e, list(key_cols), "full_outer")
    verdict = (
        F.when(F.col("_actual").isNull(), F.lit("missing"))
        .when(F.col("_expected").isNull(), F.lit("extra"))
        .when(F.col("_actual") == F.col("_expected"), F.lit("match"))
        .otherwise(F.lit("diff"))
    )
    return joined.select(
        *key_cols,
        verdict.alias("verdict"),
        F.col("_actual").alias("actual"),
        F.col("_expected").alias("expected"),
    )


def pass_rate(compared: DataFrame) -> DataFrame:
    """Summary of a compare_extractions frame: counts per verdict and
    the pass rate (match / total)."""
    total = F.sum(F.lit(1))
    matches = F.sum(F.when(F.col("verdict") == "match", 1).otherwise(0))
    return compared.agg(
        total.alias("n_total"),
        matches.alias("n_match"),
        F.sum(F.when(F.col("verdict") == "diff", 1).otherwise(0)).alias("n_diff"),
        F.sum(F.when(F.col("verdict") == "missing", 1).otherwise(0)).alias("n_missing"),
        F.sum(F.when(F.col("verdict") == "extra", 1).otherwise(0)).alias("n_extra"),
        F.round(matches / total, 6).alias("pass_rate"),
    )
