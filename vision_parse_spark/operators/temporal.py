"""Temporal (as-of) join — the time-series operator Spark lacks.

Not present in the reference (it has no event ops); an as-of join is
the standard attribution/enrichment primitive over event streams:
"for every left event, the latest right event at or before it, per
key" (pandas ``merge_asof``, kdb ``aj``, DuckDB ``ASOF JOIN``).

Scale design (100 TB): the naive formulation is a range join —
Catalyst plans it as a per-key cross product and dies quadratically
on hot keys.  The scalable Spark idiom is UNION + WINDOW: tag both
sides, union them, and run ONE window per key ordered by
``(ts, side, id)`` carrying ``last(right_payload, ignorenulls)`` —
each left row then holds the most recent right row at or before it.
One shuffle (the window partition), an O(n log n) per-key sort, no
pair explosion; a hot key degrades to WindowExec's spilling sort,
never to a cross product.

Determinism: the window order includes the side tag (right rows sort
BEFORE left rows at an equal timestamp, so ties match — the
``allow_exact_matches`` semantics of pandas) and the unique
``id_col`` as the final key, so duplicate timestamps cannot produce
partition-order-dependent matches (same lesson as
``top_k_per_group``'s required tiebreak).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str,
    id_col: str,
    right_value_cols: list[str],
    tolerance_us: int | None = None,
) -> DataFrame:
    """For every ``left`` row, attach the latest ``right`` row with
    ``right.ts <= left.ts`` and the same ``on`` key (exact-timestamp
    matches allowed).  Output = left columns + ``asof_<id_col>``,
    ``asof_<value col>``... and ``asof_lag_us`` (microseconds since
    the matched right event); unmatched left rows carry nulls.
    ``id_col`` must be unique per row on BOTH sides (the
    deterministic tiebreak).  ``tolerance_us`` bounds the lookback:
    matches older than that many microseconds are nulled, as in
    ``pandas.merge_asof(tolerance=...)``.
    """
    from pyspark.sql.types import TimestampNTZType, TimestampType

    for side_name, frame in (("left", left), ("right", right)):
        t = frame.schema[ts_col].dataType
        if not isinstance(t, (TimestampType, TimestampNTZType)):
            raise ValueError(
                f"asof_join: {side_name}.{ts_col} must be a timestamp, "
                f"got {t.simpleString()} (an integer ts would order "
                f"correctly but compute lags at the wrong unit)")
    lcols = left.columns
    out_names = ([f"asof_{id_col}"]
                 + [f"asof_{c}" for c in right_value_cols]
                 + ["asof_lag_us"])
    clash = sorted(set(out_names) & set(lcols))
    if clash or id_col in right_value_cols:
        raise ValueError(
            f"asof_join: output columns {clash or [f'asof_{id_col}']} "
            f"collide; rename the left columns (e.g. when chaining "
            f"asof joins) or drop {id_col} from right_value_cols")
    # NULL-ts / NULL-key right rows can never be "the latest prior
    # event" (merge_asof semantics: NaN keys and NaT never match);
    # dropping them here also guarantees NULL-ts/key LEFT rows get no
    # match (they sort to the window start / a right-free partition)
    right = right.filter(F.col(ts_col).isNotNull()
                         & F.col(on).isNotNull())
    rpay = F.struct(
        F.col(id_col).alias("_rid"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_rts"),
        *[F.col(c).alias(f"_r_{c}") for c in right_value_cols])
    r = right.select(F.col(on), F.col(ts_col), F.lit(0).alias("_side"),
                     F.col(id_col).alias("_oid"), rpay.alias("_rpay"),
                     *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
                       for c in lcols])
    l = left.select(F.col(on), F.col(ts_col), F.lit(1).alias("_side"),
                    F.col(id_col).alias("_oid"),
                    F.lit(None).cast(r.schema["_rpay"].dataType).alias("_rpay"),
                    *[F.col(c).alias(f"_l_{c}") for c in lcols])
    w = (Window.partitionBy(on)
         .orderBy(F.col(ts_col).asc(), F.col("_side").asc(),
                  F.col("_oid").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = (r.unionByName(l)
               .withColumn("_m", F.last("_rpay", ignorenulls=True).over(w))
               .filter(F.col("_side") == 1))
    lag = F.unix_micros(F.col(ts_col).cast("timestamp")) - F.col("_m._rts")
    if tolerance_us is not None:
        matched = matched.withColumn(
            "_m", F.when(lag <= F.lit(tolerance_us), F.col("_m")))
        lag = F.unix_micros(F.col(ts_col).cast("timestamp")) - F.col("_m._rts")
    return matched.select(
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        F.col("_m._rid").alias(f"asof_{id_col}"),
        *[F.col(f"_m._r_{c}").alias(f"asof_{c}")
          for c in right_value_cols],
        lag.alias("asof_lag_us"))
