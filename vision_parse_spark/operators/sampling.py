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


def resample_mixture(
    df: DataFrame,
    strata_col: str,
    weights: dict[str, float],
    key_col: str = "doc_id",
    buckets: int = 1_000_000,
) -> DataFrame:
    """Downsample to a target source mixture (the training-mixture
    curation step: "make the corpus 50% web / 30% code / 20%
    papers").  Picks the largest total T reachable WITHOUT
    upsampling — ``T = min_s count_s / w_s`` — then keeps each
    stratum at ``w_s * T / count_s`` via the same keyed md5 bucket
    as ``hash_sample``, so membership is deterministic across runs,
    engines and partitionings.  Strata absent from ``weights`` are
    dropped (weight 0).

    Scale shape: one control-plane aggregate (a row per stratum,
    collected to compute the fractions) + a narrow codegen'd filter;
    no data shuffle, no UDF.  Weights need not sum to 1 (normalized
    internally); raises if a weighted stratum has no rows, since the
    mixture would be unreachable (T = 0).
    """
    if not weights:
        raise ValueError("resample_mixture: weights must be non-empty")
    for k, w in weights.items():
        if w <= 0.0:
            raise ValueError(f"weight for {k!r} must be > 0: {w}")
    wsum = sum(weights.values())
    norm = {k: w / wsum for k, w in weights.items()}

    counts = {
        r[strata_col]: r["n"]
        for r in df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n"))
                   .collect()
        if r[strata_col] in norm
    }
    missing = sorted(set(norm) - set(counts))
    if missing:
        raise ValueError(
            f"resample_mixture: no rows for weighted strata {missing}")
    total = min(counts[k] / norm[k] for k in norm)
    fracs = {k: min(1.0, (norm[k] * total) / counts[k]) for k in norm}

    b = hash_bucket(key_col, buckets)
    thr: Column = F.lit(0)
    for k in sorted(fracs):
        thr = F.when(F.col(strata_col) == k,
                     F.lit(int(fracs[k] * buckets))).otherwise(thr)
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


def leak_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    key_col: str = "doc_id",
    train_frac: float = 0.8,
    buckets: int = 1000,
    out_col: str = "split",
) -> DataFrame:
    """Near-duplicate-safe train/test split: a naive keyed split
    (:func:`with_split`) leaks when two near-duplicate documents land
    on opposite sides — the eval set then contains soft copies of
    training rows and scores are inflated.  Here every document is
    first mapped to its duplicate-cluster representative (connected
    components over the verified near-dup ``pairs`` graph, min
    reachable id — :func:`~.dedup.dup_clusters`), and the split hash
    is taken on the REPRESENTATIVE, so an entire near-dup cluster
    always lands in one split.  Singletons (no near-dup) hash on
    their own key, matching :func:`with_split` exactly.

    Scale shape (100 TB): the cluster relation holds one row per
    document that appears in >= 1 verified pair (a small fraction of
    the corpus, but corpus-scaling — joined with a regular shuffle
    hash join on ``key_col``, NOT broadcast).  The split itself stays
    a narrow md5-bucket predicate, partition-invariant and
    engine-portable.  One data-sized shuffle beyond what the pair
    graph itself cost.

    Output: ``df`` columns + ``rep_id`` (the split key actually
    hashed) + ``out_col`` ('train' / 'test').
    """
    from .dedup import dup_clusters

    if not 0.0 <= train_frac <= 1.0:
        raise ValueError(f"train_frac out of [0,1]: {train_frac}")
    reps = (dup_clusters(pairs)
            .select(F.col("doc_id").alias("_lss_key"),
                    F.col("cluster_id").alias("_lss_rep")))
    joined = df.join(reps, df[key_col] == reps["_lss_key"], "left")
    out = (joined.withColumn(
               "rep_id", F.coalesce(F.col("_lss_rep"), F.col(key_col)))
           .drop("_lss_key", "_lss_rep"))
    b = hash_bucket("rep_id", buckets)
    return out.withColumn(
        out_col,
        F.when(b < int(train_frac * buckets), F.lit("train"))
        .otherwise(F.lit("test")))
