"""Mergeable cardinality / frequency sketches, cross-engine exact.

Not present in the reference (no corpus analytics there) — these are
the classic OLAP sketches a 100 TB profiling pass runs instead of
exact DISTINCT/top-k: HyperLogLog (Flajolet et al. 2007) for
per-group distinct counts and Count-Min (Cormode & Muthukrishnan
2005) for point frequency estimates.  Both are implemented as pure
Catalyst aggregations over a PORTABLE md5-derived hash, so the exact
same register contents reproduce in the DuckDB oracle:

* the only data-sized operation is ONE map-side-combining hash agg
  on a BOUNDED key (register index / (row, bucket)) — the exchange
  carries at most ``m`` (resp. ``d*w``) rows per group regardless of
  input size, the defining property that makes sketches the 100 TB
  answer to ``count(distinct)``'s full shuffle;
* registers merge associatively (max / sum), so partial aggregation
  is lossless across partitions and executors;
* HLL's harmonic sum is computed in SCALED INTEGER form
  (``sum(2^(W+1-M_j))`` as bigint, exact, order-independent) and
  only converted to float once, so no cross-engine float-merge-order
  drift can reach the estimate; the one ``ln`` in the small-range
  correction follows the repo's bm25 precedent (libm 1-ulp drift is
  ~9 orders below the 4-decimal rounding);
* Count-Min is all-integer — hash-exact with no tolerance argument.

Hash recipe: ``conv(substring(md5(v), 1, 15), 16, 10)`` — 60 bits,
the same portable construction as ``sampling.hash_bucket`` /
``dedup``'s portable MinHash, byte-identical in DuckDB as
``CAST(('0x' || substring(md5(v), 1, 15)) AS BIGINT)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_HASH_BITS = 60  # 15 hex chars of md5


def _hll_const(p: int) -> float:
    """``alpha_m * m^2 * 2^(W+1)`` precomputed in Python float64 and
    embedded as the SAME literal in both engines' SQL (no reliance
    on either engine's constant-folding order)."""
    m = 1 << p
    if m < 128:
        raise ValueError(f"hll p must be >= 7 for the alpha_m "
                         f"constant used here, got p={p}")
    alpha = 0.7213 / (1.0 + 1.079 / m)
    w_bits = _HASH_BITS - p
    return alpha * m * m * float(1 << (w_bits + 1))


def hll_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    p: int = 12,
    est_col: str = "hll_est",
) -> DataFrame:
    """Per-group HyperLogLog distinct-count estimate of ``value_col``.

    ``(group_cols..., est_col)`` with ``est_col = round(E, 4)`` where
    ``E`` is the HLL estimate with the standard small-range (linear
    counting) correction.  ``p`` is the register-index width:
    ``m = 2^p`` registers, relative error ~``1.04/sqrt(m)`` (p=12 →
    ~1.6%).

    Plan shape (the whole point at scale): narrow Project computing
    ``(j, rho)`` per row → hash agg on the bounded ``(group, j)`` key
    (map-side combine collapses each partition to ≤ m rows before the
    exchange) → per-group register fold.  Nothing data-sized ever
    shuffles, unlike ``count(distinct)`` whose first stage exchanges
    every distinct value.
    """
    if not 7 <= p <= 16:
        raise ValueError(f"p must be in [7, 16], got {p}")
    group_cols = list(group_cols or [])
    m = 1 << p
    w_bits = _HASH_BITS - p  # width of the rho-scan field
    h = (f"cast(conv(substring(md5(cast({value_col} as string)), 1, "
         f"15), 16, 10) as bigint)")
    # rho = leading-zero count of the W-bit field + 1, via bin()
    # string length (exact in both engines; log2-based bit_length
    # mis-rounds near powers of two).
    j = f"pmod({h}, {m})"
    w = f"({h} div {m})"
    rho = (f"CASE WHEN {w} = 0 THEN {w_bits + 1} "
           f"ELSE {w_bits} - length(bin({w})) + 1 END")
    regs = (
        df.select(*group_cols,
                  F.expr(j).alias("j"),
                  F.expr(rho).cast("int").alias("rho"))
          .groupBy(*group_cols, "j")
          .agg(F.max("rho").alias("m_j"))
    )
    # scaled-integer harmonic sum: present registers contribute
    # 2^(W+1-M_j); the (m - present) zero registers contribute
    # 2^(W+1) each.  All exact bigint.
    two_w1 = 1 << (w_bits + 1)
    per = regs.groupBy(*group_cols).agg(
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), "
                     f"{w_bits + 1} - m_j)")).alias("s"),
        F.count(F.lit(1)).alias("present"),
    )
    znum = f"(s + ({m} - present) * cast({two_w1} as bigint))"
    e_raw = f"({_hll_const(p)!r} / {znum})"
    v = f"({m} - present)"
    est = (f"CASE WHEN {e_raw} <= {2.5 * m!r} AND {v} > 0 "
           f"THEN round({m} * ln(cast({m} as double) / {v}), 4) "
           f"ELSE round({e_raw}, 4) END")
    return per.select(*group_cols, F.expr(est).alias(est_col))


def hll_distinct_sql(value_expr: str, src: str,
                     group_cols: list[str] | None = None,
                     p: int = 12, est_col: str = "hll_est") -> str:
    """The DuckDB oracle replay of :func:`hll_distinct` — the SAME
    register construction and scaled-integer fold, generated from
    the same constants so the literals are byte-identical."""
    group_cols = list(group_cols or [])
    m = 1 << p
    w_bits = _HASH_BITS - p
    two_w1 = 1 << (w_bits + 1)
    gsel = "".join(f"{c}, " for c in group_cols)
    gby = ("GROUP BY " + ", ".join(group_cols)) if group_cols else ""
    gby_j = ("GROUP BY " + ", ".join(group_cols + ["j"])
             ) if group_cols else "GROUP BY j"
    h = (f"CAST(('0x' || substring(md5(CAST({value_expr} AS "
         f"VARCHAR)), 1, 15)) AS BIGINT)")
    znum = f"(s + ({m} - present) * CAST({two_w1} AS BIGINT))"
    e_raw = f"({_hll_const(p)!r} / {znum})"
    v = f"({m} - present)"
    return f"""
        WITH hrows AS (
          SELECT {gsel}{h} % {m} AS j,
                 CASE WHEN {h} // {m} = 0 THEN {w_bits + 1}
                      ELSE {w_bits} - length(bin({h} // {m})) + 1
                 END AS rho
          FROM {src}),
        regs AS (
          SELECT {gsel}j, max(rho) AS m_j FROM hrows {gby_j}),
        per AS (
          SELECT {gsel}
                 CAST(sum(CAST(1 AS BIGINT) << ({w_bits + 1} - m_j))
                      AS BIGINT) AS s,
                 count(*) AS present
          FROM regs {gby})
        SELECT {gsel}
               CASE WHEN {e_raw} <= {2.5 * m!r} AND {v} > 0
                    THEN round({m} * ln(CAST({m} AS DOUBLE) / {v}), 4)
                    ELSE round({e_raw}, 4) END AS {est_col}
        FROM per
    """


def cms_counts(
    items: DataFrame,
    value_col: str,
    probes: DataFrame,
    probe_col: str | None = None,
    d: int = 4,
    w: int = 1024,
) -> DataFrame:
    """Count-Min point-frequency estimates for ``probes``.

    Builds the ``d × w`` counter table over ``items[value_col]``
    (one occurrence = +1) and returns ``(probe_col, cms_est)`` with
    ``cms_est = min_i counter[i][h_i(v)]`` — the classic one-sided
    overestimate.  Row ``i``'s hash salts the md5 input with
    ``'i:'`` so the d rows are independent.

    Plan shape: the d-fold row expansion happens INSIDE a
    posexplode→hash-agg pair whose key space is bounded by ``d*w``
    (map-side combine collapses each partition to ≤ d*w rows), then
    the tiny counter table broadcasts to the probe side — the probe
    lookup never shuffles the corpus.
    """
    if d < 1 or w < 2:
        raise ValueError(f"need d >= 1 and w >= 2, got d={d} w={w}")
    probe_col = probe_col or value_col
    buckets = F.array(*[
        F.expr(f"cast(conv(substring(md5(concat('{i}:', "
               f"cast({value_col} as string))), 1, 15), 16, 10) "
               f"as bigint) % {w}")
        for i in range(d)
    ])
    counters = (
        items.select(F.posexplode(buckets).alias("i", "b"))
             .groupBy("i", "b").agg(F.count(F.lit(1)).alias("cnt"))
    )
    pb = probes.select(
        F.col(probe_col),
        F.posexplode(F.array(*[
            F.expr(f"cast(conv(substring(md5(concat('{i}:', "
                   f"cast({probe_col} as string))), 1, 15), 16, 10) "
                   f"as bigint) % {w}")
            for i in range(d)
        ])).alias("i", "b"),
    )
    return (
        pb.join(F.broadcast(counters), ["i", "b"], "left")
          .groupBy(probe_col)
          .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_est"))
    )


def cms_counts_sql(value_expr: str, src: str, probe_sql: str,
                   probe_col: str, d: int = 4, w: int = 1024) -> str:
    """DuckDB replay of :func:`cms_counts` (probe relation supplied
    as a SQL string selecting ``probe_col``)."""
    def bucket(col: str, i: int) -> str:
        return (f"CAST(('0x' || substring(md5('{i}:' || "
                f"CAST({col} AS VARCHAR)), 1, 15)) AS BIGINT) % {w}")

    hash_rows = " UNION ALL ".join(
        f"SELECT {i} AS i, {bucket(value_expr, i)} AS b FROM {src}"
        for i in range(d))
    probe_rows = " UNION ALL ".join(
        f"SELECT {probe_col}, {i} AS i, {bucket(probe_col, i)} AS b "
        f"FROM probes" for i in range(d))
    return f"""
        WITH probes AS ({probe_sql}),
        counters AS (
          SELECT i, b, count(*) AS cnt
          FROM ({hash_rows}) GROUP BY i, b),
        pb AS ({probe_rows})
        SELECT pb.{probe_col},
               min(coalesce(counters.cnt, 0)) AS cms_est
        FROM pb LEFT JOIN counters USING (i, b)
        GROUP BY pb.{probe_col}
    """


def _bloom_positions(col: str, m_bits: int, k: int) -> list[str]:
    """The k salted bit positions of ``col`` — md5 recipe shared
    with :func:`cms_counts` (salt ``'i:'``)."""
    return [
        (f"cast(conv(substring(md5(concat('{i}:', "
         f"cast({col} as string))), 1, 15), 16, 10) "
         f"as bigint) % {m_bits}")
        for i in range(k)
    ]


def bloom_build(
    items: DataFrame,
    value_col: str,
    m_bits: int = 65536,
    k: int = 4,
) -> DataFrame:
    """Portable Bloom filter over ``items[value_col]`` as a relation
    of 32-bit words packed in bigints: ``(word, bits)``, one row per
    NON-ZERO word (word = position div 32) — the join-pruning /
    membership sketch (Bloom 1970; Spark's own runtime filter is the
    same structure).

    32-bit words keep every shift in [0, 31] — portable to engines
    that raise on ``1 << 63`` bigint overflow (DuckDB) — and the
    bitwise OR fold is associative, so the build is one map-side-
    combining hash agg on the bounded word key (≤ m_bits/32 rows
    out) no matter the input size.
    """
    if m_bits < 32 or m_bits % 32:
        raise ValueError(f"m_bits must be a positive multiple of 32, "
                         f"got {m_bits}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    pos = F.array(*[F.expr(p) for p in
                    _bloom_positions(value_col, m_bits, k)])
    return (
        items.select(F.explode(pos).alias("p"))
             .select(F.expr("p div 32").alias("word"),
                     F.expr("shiftleft(cast(1 as bigint), "
                            "cast(p % 32 as int))").alias("m"))
             .groupBy("word").agg(F.bit_or("m").alias("bits"))
    )


def bloom_probe(
    probes: DataFrame,
    bloom: DataFrame,
    value_col: str,
    m_bits: int = 65536,
    k: int = 4,
) -> DataFrame:
    """``(value_col, maybe_present)`` for each probe row: true iff
    ALL k bit positions are set (the one-sided Bloom guarantee — no
    false negatives).  The filter relation broadcasts (≤ m_bits/32
    rows); the probe side never shuffles."""
    pos = F.array(*[F.expr(p) for p in
                    _bloom_positions(value_col, m_bits, k)])
    pb = (probes.select(F.col(value_col), F.explode(pos).alias("p"))
                .select(value_col, F.expr("p div 32").alias("word"),
                        F.expr("shiftleft(cast(1 as bigint), "
                               "cast(p % 32 as int))").alias("m")))
    return (
        pb.join(F.broadcast(bloom), "word", "left")
          .groupBy(value_col)
          .agg(F.bool_and(
              F.coalesce(F.col("bits"), F.lit(0))
               .bitwiseAND(F.col("m")) != 0).alias("maybe_present"))
    )


def hist_quantiles(
    df: DataFrame,
    col: str,
    probs: list[float],
    n_bins: int = 64,
) -> DataFrame:
    """Mergeable fixed-bin histogram quantile sketch — the
    distribution member of the sketch family (HLL = distinct,
    CMS = frequency, Bloom = membership).  The 100 TB answer to
    exact percentiles: ``percentile()`` needs a per-group global
    sort of every value, while a histogram is ONE map-side-combining
    count agg on a key bounded by ``n_bins`` — the exchange carries
    at most ``n_bins`` rows per partition regardless of input size,
    and bin counts merge associatively (integer sums, lossless
    across executors, no float merge-order drift).

    Two passes: an exact (min, max, count) agg (one row, collected —
    control-plane, the kmeans/IVF precedent), then the bin-count
    agg.  Estimate for prob p: rank ``k = ceil(p*n)`` clamped to
    [1, n]; the first bin whose cumulative count reaches k, linearly
    interpolated at ``lo + width * (b + (k - cum_prev)/cnt_b)``.
    Guarantee: the k-th smallest value lies in that bin, so
    ``|est - exact|  <= width = (max-min)/n_bins``.

    The cumulative window runs over <= ``n_bins`` rows (its
    SinglePartition exchange is bounded, never data-sized).  Every
    float op is formed IN-ENGINE from double casts over exact
    integer inputs, so the DuckDB replay (:func:`hist_quantiles_sql`)
    is bit-identical — no decimal-literal parsing divergence.

    Output: ``(prob, k, est)`` — one row per requested prob.
    """
    if not probs:
        raise ValueError("hist_quantiles: need at least one prob")
    if any(not 0.0 < p <= 1.0 for p in probs):
        raise ValueError(f"hist_quantiles: probs {probs} must be in "
                         "(0, 1]")
    if len(set(probs)) != len(probs):
        raise ValueError(f"hist_quantiles: duplicate probs {probs}")
    if n_bins < 2:
        raise ValueError(f"hist_quantiles: n_bins {n_bins} < 2")
    from pyspark.sql import Window

    vals = df.select(F.col(col).cast("double").alias("v")) \
             .filter(F.col("v").isNotNull())
    lo, hi, n = vals.agg(F.min("v"), F.max("v"), F.count("v")) \
                    .first()
    if n == 0:
        raise ValueError("hist_quantiles: empty input")

    loD, hiD, nbD = F.lit(float(lo)), F.lit(float(hi)), \
        F.lit(float(n_bins))
    width = (hiD - loD) / nbD
    b = F.when(width == 0.0, F.lit(0)).otherwise(
        F.least(F.floor((F.col("v") - loD) / width),
                F.lit(n_bins - 1))).cast("int")
    bins = vals.groupBy(b.alias("b")) \
               .agg(F.count(F.lit(1)).alias("cnt"))
    cumw = (Window.orderBy("b")
                  .rowsBetween(Window.unboundedPreceding,
                               Window.currentRow))
    bins = bins.withColumn("cum", F.sum("cnt").over(cumw))

    spark = df.sparkSession
    pdf = spark.createDataFrame([(float(p),) for p in probs],
                                "prob double")
    pdf = pdf.withColumn(
        "k", F.greatest(F.ceil(F.col("prob") * F.lit(float(n))),
                        F.lit(1)).cast("long"))
    sel = (pdf.join(F.broadcast(bins),
                    F.col("cum") >= F.col("k"))
              .groupBy("prob", "k").agg(F.min("b").alias("b"))
              .join(F.broadcast(bins), "b"))
    est = F.when(width == 0.0, loD).otherwise(
        loD + width * (F.col("b")
                       + (F.col("k") - (F.col("cum") - F.col("cnt")))
                       / F.col("cnt")))
    return sel.select("prob", "k", est.alias("est"))


def hist_quantiles_sql(
    value_expr: str,
    src: str,
    probs: list[float],
    n_bins: int = 64,
) -> str:
    """DuckDB replay of :func:`hist_quantiles` — stats computed
    in-engine (min/max/count are exact, so they equal the literals
    Spark collected), identical double arithmetic throughout."""
    values = ", ".join(f"(CAST({p} AS DOUBLE))" for p in probs)
    return f"""
        WITH vals AS (
          SELECT CAST({value_expr} AS DOUBLE) AS v FROM {src}
          WHERE {value_expr} IS NOT NULL),
        st AS (
          SELECT min(v) AS lo, max(v) AS hi,
                 CAST(count(*) AS DOUBLE) AS nd,
                 (max(v) - min(v)) / CAST({n_bins} AS DOUBLE) AS w
          FROM vals),
        bins AS (
          SELECT CASE WHEN w = 0 THEN 0
                      ELSE CAST(least(floor((v - lo) / w),
                                      {n_bins - 1}) AS INTEGER) END
                   AS b,
                 count(*) AS cnt
          FROM vals, st GROUP BY 1),
        cb AS (
          SELECT b, cnt,
                 sum(cnt) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED
                                PRECEDING AND CURRENT ROW) AS cum
          FROM bins),
        pr AS (
          SELECT prob,
                 greatest(CAST(ceil(prob * nd) AS BIGINT), 1) AS k
          FROM (VALUES {values}) AS t(prob), st),
        sel AS (
          SELECT prob, k, min(b) AS b
          FROM pr JOIN cb ON cb.cum >= pr.k GROUP BY prob, k)
        SELECT sel.prob, sel.k,
               CASE WHEN st.w = 0 THEN st.lo
                    ELSE st.lo + st.w * (sel.b
                         + (sel.k - (cb.cum - cb.cnt)) / cb.cnt) END
                 AS est
        FROM sel JOIN cb USING (b), st
    """


def bloom_sql(value_expr: str, src: str, probe_sql: str,
              probe_col: str, m_bits: int = 65536, k: int = 4) -> str:
    """DuckDB replay of ``bloom_build`` + ``bloom_probe``: returns
    ``(probe_col, maybe_present)`` for the probe relation."""
    def positions(col: str, rel: str, keep_col: bool) -> str:
        return " UNION ALL ".join(
            f"SELECT {col + ', ' if keep_col else ''}"
            f"CAST(('0x' || substring(md5('{i}:' || "
            f"CAST({col} AS VARCHAR)), 1, 15)) AS BIGINT) % {m_bits} "
            f"AS p FROM {rel}"
            for i in range(k))

    return f"""
        WITH probes AS ({probe_sql}),
        bloom AS (
          SELECT p // 32 AS word,
                 bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INTEGER))
                   AS bits
          FROM ({positions(value_expr, src, False)}) GROUP BY word),
        pb AS (
          SELECT {probe_col}, p // 32 AS word,
                 CAST(1 AS BIGINT) << CAST(p % 32 AS INTEGER) AS m
          FROM ({positions(probe_col, "probes", True)}))
        SELECT pb.{probe_col},
               bool_and((coalesce(bloom.bits, 0) & pb.m) != 0)
                 AS maybe_present
        FROM pb LEFT JOIN bloom USING (word)
        GROUP BY pb.{probe_col}
    """
