"""Distributed KMeans over embedding columns (Lloyd's algorithm).

Not present in the reference (it has no vector ops); this is the
clustering primitive a training-data pipeline needs for corpus
bucketing, SemDeDup-style semantic dedup (Abbas et al. 2023) and
IVF-like index builds.

Scale design (100 TB): the classic MLlib shape —
* Centroids are control-plane state: ``k`` rows collected to the
  driver per iteration and re-broadcast as plan literals.  The data
  never shuffles by cluster for the *update* either: the per-cluster
  per-dimension sums are a map-side-combined hash aggregate whose
  exchange carries at most ``k`` rows per map partition.
* Assignment is pure Catalyst — ``zip_with``/``aggregate`` squared
  distances against the ``k`` centroid literals, argmin via
  ``array_position(d, array_min(d))`` (first-minimum = lowest
  cluster id on ties) — no UDF, stays in whole-stage codegen.  For
  very large ``k * dim`` the Arrow matmul used by the IVF index
  (``similarity.train_ivf_centroids`` / ``ivf_topk``) is the faster
  assignment kernel; at the ``k <= 64`` corpus-bucketing scale the
  codegen path wins by skipping Python entirely.
* The input is persisted once and re-scanned ``iters + 1`` times
  (each scan is one narrow job), exactly the Lloyd's access pattern.

Determinism: init picks the ``k`` lowest-id vectors (rank order =
cluster id), all arithmetic is float64, and every argmin tie-breaks
on the lower cluster id, so the assignment replays exactly in the
DuckDB oracle up to ~1e-12 distance rounding (distances between
synthetic cluster modes are O(1); no observed flips at any SF).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _sq_dist(vec_col: str, centroid: list[float]) -> Column:
    lits = F.array(*[F.lit(float(v)) for v in centroid])
    return F.aggregate(
        F.zip_with(F.col(vec_col), lits, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda acc, x: acc + x)


def _assign_col(vec_col: str, centroids: list[list[float]]) -> Column:
    dists = F.array(*[_sq_dist(vec_col, c) for c in centroids])
    return (F.array_position(dists, F.array_min(dists)) - 1) \
        .cast("int").alias("cluster")


def kmeans_fit(df: DataFrame, k: int = 8, iters: int = 2,
               id_col: str = "vec_id", vec_col: str = "embedding",
               dim: int | None = None
               ) -> tuple[list[list[float]], DataFrame]:
    """Run ``iters`` Lloyd update steps and return
    ``(final_centroids, cached_float64_input)``.

    Init: the ``k`` lowest-``id_col`` vectors, in id order (cluster
    ``j`` starts at the rank-``j`` vector).  A cluster that captures
    no points keeps its previous centroid.
    """
    if k < 1 or iters < 0:
        raise ValueError(f"need k >= 1, iters >= 0; got k={k} iters={iters}")
    data = (df.select(F.col(id_col),
                      F.col(vec_col).cast("array<double>").alias("_v"))
              .persist())
    if dim is None:
        first = data.select(F.size("_v")).first()
        if first is None:
            raise ValueError("kmeans_fit: empty input")
        dim = first[0]

    seed_rows = data.orderBy(id_col).limit(k).collect()
    if len(seed_rows) < k:
        raise ValueError(f"kmeans_fit: k={k} but only {len(seed_rows)} rows")
    centroids = [list(r["_v"]) for r in seed_rows]

    for _ in range(iters):
        assigned = data.select("_v", _assign_col("_v", centroids))
        agg = (assigned.groupBy("cluster")
               .agg(F.count(F.lit(1)).alias("_n"),
                    *[F.sum(F.col("_v")[i]).alias(f"_s{i}")
                      for i in range(dim)])
               .collect())
        nxt = list(centroids)            # empty cluster keeps its centroid
        for row in agg:
            nxt[row["cluster"]] = [row[f"_s{i}"] / row["_n"]
                                   for i in range(dim)]
        centroids = nxt
    return centroids, data


def kmeans_assign(df: DataFrame, k: int = 8, iters: int = 2,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  dim: int | None = None) -> DataFrame:
    """``(id_col, cluster)`` after ``iters`` Lloyd update steps —
    the assignment against the final centroids."""
    centroids, data = kmeans_fit(df, k=k, iters=iters, id_col=id_col,
                                 vec_col=vec_col, dim=dim)
    return data.select(F.col(id_col), _assign_col("_v", centroids))


def semdedup(df: DataFrame, k: int = 8, iters: int = 2,
             threshold: float = 0.95, id_col: str = "vec_id",
             vec_col: str = "embedding",
             dim: int | None = None) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic dedup by KMeans
    partitioning + within-cluster cosine pruning.  Returns the
    SURVIVOR set ``(id_col,)``: an embedding is dropped iff some
    LOWER-id embedding in the same cluster is within cosine >=
    ``threshold`` of it (the greedy lowest-id-first keep order), so
    every dropped doc has a surviving-or-itself-dropped witness
    below it and no two survivors in a cell are near-duplicates of
    each other... unless only via a dropped intermediate — the
    greedy rule deliberately keeps such "chain ends" (they are not
    near-dups of any survivor), unlike connected-components
    min-label which would collapse whole chains.

    Scale shape: candidate pairs are confined to KMeans cells (the
    SemDeDup trick — never all-pairs); the within-cell self-join
    shuffles on the cluster id; the greedy keep-lowest-id rule is a
    single anti-join against the min-neighbor relation, no iterative
    connected components needed (a kept doc is one with no
    smaller-id near-duplicate in its cell, the standard SemDeDup
    greedy order).
    """
    assign = kmeans_assign(df, k=k, iters=iters, id_col=id_col,
                           vec_col=vec_col, dim=dim)
    vecs = df.select(F.col(id_col),
                     F.col(vec_col).cast("array<double>").alias("_v"))
    tagged = vecs.join(assign, id_col)

    a = tagged.select(F.col(id_col).alias("_ida"), F.col("_v").alias("_va"),
                      F.col("cluster").alias("_c"))
    b = tagged.select(F.col(id_col).alias("_idb"), F.col("_v").alias("_vb"),
                      F.col("cluster").alias("_c"))
    dot = F.aggregate(F.zip_with("_va", "_vb", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    norm = (F.sqrt(F.aggregate(F.zip_with("_va", "_va",
                                          lambda x, y: x * y),
                               F.lit(0.0), lambda acc, x: acc + x))
            * F.sqrt(F.aggregate(F.zip_with("_vb", "_vb",
                                            lambda x, y: x * y),
                                 F.lit(0.0), lambda acc, x: acc + x)))
    dropped = (a.join(b, "_c")
               .filter(F.col("_ida") < F.col("_idb"))
               .filter(dot / norm >= threshold)
               .select(F.col("_idb").alias(id_col))
               .distinct())
    return (df.select(id_col)
              .join(dropped, id_col, "left_anti"))
