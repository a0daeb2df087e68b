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
    skew_bucket_us: int | None = None,
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

    ``skew_bucket_us`` is the HOT-KEY defence (round-5 verdict): with
    the default single window per key, one Zipf-head key is one
    WindowExec partition — a lone straggler task doing a spilling
    sort of that key's entire history.  Setting ``skew_bucket_us``
    range-chunks the window: rows partition by ``(key,
    floor(ts / bucket))``, the same last-ignorenulls window runs
    WITHIN each time bucket (parallel across buckets, bounded sorts),
    and a second pass over the per-bucket TAILS (one row per
    key-bucket — control-plane-sized) carries each bucket's last
    right payload across the boundary; a left row's match is then
    ``coalesce(within-bucket, carry)``.  Results are IDENTICAL to the
    unchunked path (pytest-asserted); pick a bucket width that gives
    the hottest key ~10-1000 buckets (e.g. a day of microseconds for
    a year of events).
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
    u = r.unionByName(l)
    if skew_bucket_us is None:
        w = (Window.partitionBy(on)
             .orderBy(F.col(ts_col).asc(), F.col("_side").asc(),
                      F.col("_oid").asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        matched = (u.withColumn("_m",
                                F.last("_rpay", ignorenulls=True).over(w))
                    .filter(F.col("_side") == 1))
    else:
        if skew_bucket_us < 1:
            raise ValueError(
                f"asof_join: skew_bucket_us must be >= 1 microsecond, "
                f"got {skew_bucket_us}")
        # chunked window: (key, time-bucket) partitions bound every
        # sort; NULL-ts left rows land in a NULL bucket that joins
        # nothing and windows over left rows only -> no match, same
        # as the unchunked path's NULLS FIRST ordering
        micros = F.unix_micros(F.col(ts_col).cast("timestamp"))
        u = u.withColumn("_bkt", F.floor(micros / F.lit(skew_bucket_us)))
        w1 = (Window.partitionBy(on, "_bkt")
              .orderBy(F.col(ts_col).asc(), F.col("_side").asc(),
                       F.col("_oid").asc())
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        u = u.withColumn("_ml", F.last("_rpay", ignorenulls=True).over(w1))
        # per-(key, bucket) tail = the bucket's last right payload
        # (max_by skips rows whose ordering struct is NULL, i.e. the
        # left side); this agg inherits w1's (key, bucket)
        # partitioning so no extra exchange on the big relation
        tails = u.groupBy(on, "_bkt").agg(
            F.max_by(
                "_rpay",
                F.when(F.col("_side") == 0,
                       F.struct(F.col("_rpay._rts").alias("t"),
                                F.col("_oid").alias("i")))).alias("_tail"))
        # cumulative carry over STRICTLY EARLIER buckets, per key —
        # the tails relation is one row per key-bucket, so even a key
        # holding 10% of all events contributes only its bucket count
        w2 = (Window.partitionBy(on).orderBy(F.col("_bkt").asc())
              .rowsBetween(Window.unboundedPreceding, -1))
        carry = (tails.withColumn(
                     "_carry", F.last("_tail", ignorenulls=True).over(w2))
                 .select(on, "_bkt", "_carry"))
        matched = (u.filter(F.col("_side") == 1)
                    .join(carry, [on, "_bkt"], "left")
                    .withColumn("_m", F.coalesce("_ml", "_carry")))
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


def funnel(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user ordered conversion funnel (the product-analytics
    primitive: "signup, then a click after it, then a purchase after
    that").  Stage k's timestamp is the EARLIEST event of stage k's
    type STRICTLY AFTER stage k-1's timestamp (stage 0: earliest of
    its type overall); a user who never reaches stage k has NULL
    there and for every later stage.

    Output: ``(user_col, <stage>_us ... , stage_reached)`` — one row
    per user appearing in ``events``, timestamps as epoch
    microseconds, ``stage_reached`` = number of stages attained.

    Scale shape: the stage chain is k conditional-min window
    aggregates over the SAME ``partitionBy(user)`` spec — Catalyst
    plans ONE Exchange and stacked WindowExecs, and the final
    per-user collapse reuses that partitioning (its required
    distribution is already satisfied), so the whole funnel is a
    single shuffle of the events relation regardless of k.
    Determinism: min() over a fixed per-user row set — merge-order
    free.  NULL-ts events never win a min and so never anchor a
    stage.
    """
    if not stages:
        raise ValueError("funnel: need at least one stage")
    if len(set(stages)) != len(stages):
        raise ValueError(f"funnel: duplicate stage types {stages}")
    w = Window.partitionBy(user_col)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    d = events.select(user_col, F.col(type_col).alias("_et"),
                      us.alias("_us"))
    cols: list[str] = []
    prev = None
    for st in stages:
        c = f"{st}_us"
        cond = F.col("_et") == st
        if prev is not None:
            cond = cond & (F.col("_us") > F.col(prev))
        d = d.withColumn(c, F.min(F.when(cond, F.col("_us"))).over(w))
        cols.append(c)
        prev = c
    return (d.groupBy(user_col)
             .agg(*[F.max(c).alias(c) for c in cols])
             .withColumn("stage_reached",
                         sum((F.col(c).isNotNull().cast("int")
                              for c in cols), F.lit(0))))


def dialog_integrity(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    first_role: str = "user",
) -> DataFrame:
    """Per-conversation role-sequence QA — the transcript
    well-formedness check an ingestion pipeline runs before
    training on dialog data: does the conversation start with
    ``first_role``, and do roles strictly alternate?

    Output: one row per conversation —
    ``(conv_col, n_turns, starts_ok, n_violations, alternation_ok)``
    where a violation is a turn whose role equals the previous
    turn's role (ordered by ``turn_col``).

    Scale shape: ONE ``partitionBy(conv)`` window (shared ordering
    for lag + first) and a per-conv collapse that reuses the same
    partitioning — a single shuffle of the transcript relation, the
    ``funnel`` pattern.  Determinism: ``turn_col`` is the unique
    in-conv order key (the key invariant every transcript op here
    relies on), so the lag stream is partition-order free.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(conv_col).orderBy(turn_col)
    d = (df.select(conv_col, turn_col, F.col(role_col).alias("_r"))
           .withColumn("_prev", F.lag("_r").over(w)))
    qr = first_role.replace("'", "\\'")
    return (d.groupBy(conv_col)
             .agg(F.count(F.lit(1)).alias("n_turns"),
                  F.max(F.expr(
                      f"case when _prev is null then "
                      f"cast(_r = '{qr}' as int) end"))
                  .cast("int").alias("starts_ok"),
                  F.sum(F.coalesce((F.col("_r") == F.col("_prev"))
                                   .cast("int"), F.lit(0)))
                  .cast("long").alias("n_violations"))
             .withColumn("alternation_ok",
                         (F.col("n_violations") == 0).cast("int")))


def burst_detection(
    df: DataFrame,
    ts_col: str = "ts",
    bucket_seconds: int = 3600,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Event-rate burst detection — the ingestion-QA tripwire for
    scraper storms / replayed batches: bucket the event stream by
    time, z-score every bucket against the stream's own mean/stddev,
    flag buckets beyond ``z_threshold``.

    Determinism (cross-engine exact): per-bucket counts are integers;
    the corpus stats (Σn, Σn², K) are EXACT integer sums, and mean /
    variance / z are a fixed-order double expression over them —
    identical IEEE arithmetic on any engine, no float fold anywhere.
    ``z`` is NULL when the stream is constant (zero variance).

    Scale shape (100 TB): ONE map-side-combined agg on the bounded
    time-bucket key; the 1-row stats relation cross-joins back as a
    broadcast.  NULL timestamps are dropped (no bucket).

    Output: ``(bucket_start, n_events, z, is_burst)``.
    """
    if bucket_seconds < 1:
        raise ValueError(
            f"burst_detection: bucket_seconds must be >= 1,"
            f" got {bucket_seconds}")
    # NTZ-safe epoch (the asof_join precedent: cast before
    # unix_micros; session tz is UTC so DuckDB epoch_us matches);
    # integer `div` keeps the bucket id exact on both engines
    bucket_us = bucket_seconds * 1_000_000
    bucket = (F.expr(f"unix_micros(cast({ts_col} as timestamp))"
                     f" div {bucket_us}")
              .cast("long").alias("bucket_start"))
    per = (df.filter(F.col(ts_col).isNotNull())
             .select(bucket)
             .groupBy("bucket_start")
             .agg(F.count(F.lit(1)).alias("n_events")))
    stats = per.agg(
        F.sum("n_events").alias("_s"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("_ss"),
        F.count(F.lit(1)).alias("_k"))
    mean = F.col("_s").cast("double") / F.col("_k").cast("double")
    var = ((F.col("_ss").cast("double")
            - (F.col("_s").cast("double") * F.col("_s").cast("double"))
            / F.col("_k").cast("double"))
           / F.col("_k").cast("double"))
    z = ((F.col("n_events").cast("double") - mean)
         / F.sqrt(F.nullif(var, F.lit(0.0))))
    return (per.crossJoin(F.broadcast(stats))
               .select("bucket_start", "n_events",
                       F.round(z, 4).alias("z"),
                       F.coalesce(z > F.lit(float(z_threshold)),
                                  F.lit(False)).cast("int")
                        .alias("is_burst")))
