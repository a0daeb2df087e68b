"""Product quantization (Jégou et al. 2011, "Product Quantization
for Nearest Neighbor Search") — the memory-side ANN primitive the
similarity family was missing: embeddings compress to ``m`` small
codes (one k-means codebook per subspace), and asymmetric-distance
(ADC) search scans CODES instead of raw vectors.

Not present in the reference (no vector ops there); this is the
100 TB retrieval-index shape: a dim-64 float64 vector is 512 bytes,
its m=4 PQ code is 4 bytes — the candidate scan reads ~128x less and
the distance per candidate is ``m`` table lookups + ``m-1`` adds
instead of a ``dim``-wide fold.

Scale design:
* ``pq_fit`` trains ``m`` independent codebooks with the existing
  control-plane Lloyd machinery (:func:`~.clustering.kmeans_fit`):
  centroids collect/re-broadcast per iteration, per-cluster sums are
  map-side-combined k-row partials — the corpus never shuffles.
* ``pq_encode`` is ONE narrow Arrow pass (tiled argmin per subspace,
  scratch bounded at tile x k doubles).
* ``pq_adc_topk`` broadcasts the per-query lookup tables
  (|Q| x m x k doubles — control-plane sized) and scans the corpus
  codes narrowly; ranking is the family's standard
  (rounded-distance, neighbor-id) window per query.

Determinism (the repo's oracle discipline): every distance that
DECIDES something (encode argmin, ADC ranking) is a strict
left-to-right fold — numpy ``cumsum`` in the kernels, ``list_reduce``
/ left-associated addition in the DuckDB replay — so given equal
codebooks both engines compute bit-identical doubles; argmin/rank
tie-breaks are (distance, lowest id).  Training centroids replay via
the kmeans oracle CTEs with the documented ~1e-12 ulp band (the
kmeans_assign precedent: distances between synthetic modes are O(1),
no observed flips at any SF).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from .clustering import kmeans_fit

_TILE = 4096


def pq_fit(df: DataFrame, m: int = 4, k: int = 8, iters: int = 2,
           id_col: str = "vec_id", vec_col: str = "embedding",
           ) -> list[list[list[float]]]:
    """Train ``m`` per-subspace codebooks of ``k`` centroids each
    (dim must divide evenly by ``m``).  Returns
    ``codebooks[m][k][dim/m]``.  Each subspace is a full
    control-plane Lloyd run over the SLICED vectors (init = k
    lowest-id rows, the kmeans_fit contract)."""
    if m < 1:
        raise ValueError(f"pq_fit: m must be >= 1, got {m}")
    first = df.select(F.size(vec_col)).first()
    if first is None:
        raise ValueError("pq_fit: empty input")
    dim = first[0]
    if dim % m != 0:
        raise ValueError(f"pq_fit: dim {dim} not divisible by m={m}")
    sub = dim // m
    books = []
    for j in range(m):
        sliced = df.select(
            F.col(id_col),
            F.expr(f"slice(cast({vec_col} as array<double>), "
                   f"{j * sub + 1}, {sub})").alias("_sv"))
        cents, data = kmeans_fit(sliced, k=k, iters=iters,
                                 id_col=id_col, vec_col="_sv",
                                 dim=sub)
        data.unpersist()
        books.append(cents)
    return books


def _encode_udf(codebooks: list[list[list[float]]]):
    """Arrow kernel: per subspace, squared distance to each centroid
    as a strict left fold (cumsum) and argmin (first minimum =
    lowest code, matching the oracle's ORDER BY dist, cid)."""
    mats = [np.asarray(b, dtype=np.float64) for b in codebooks]
    sub = mats[0].shape[1]

    from pyspark.sql.types import ArrayType, IntegerType

    @F.pandas_udf(ArrayType(IntegerType()))
    def encode(vecs: pd.Series) -> pd.Series:
        v = np.array([np.asarray(x, dtype=np.float64) for x in vecs])
        n = len(v)
        codes = np.empty((n, len(mats)), dtype=np.int32)
        for lo in range(0, n, _TILE):
            t = v[lo:lo + _TILE]
            for j, cmat in enumerate(mats):
                sl = t[:, j * sub:(j + 1) * sub]
                sq = (sl[:, None, :] - cmat[None, :, :]) ** 2
                d2 = np.cumsum(sq, axis=2)[:, :, -1]   # strict fold
                codes[lo:lo + _TILE, j] = np.argmin(d2, axis=1)
        return pd.Series(list(codes), index=vecs.index)

    return encode


def pq_encode(df: DataFrame, codebooks: list[list[list[float]]],
              id_col: str = "vec_id", vec_col: str = "embedding",
              ) -> DataFrame:
    """``(id_col, codes)`` — one int code per subspace.  One narrow
    Arrow pass, zero shuffle."""
    enc = _encode_udf(codebooks)
    return df.select(F.col(id_col),
                     enc(F.col(vec_col).cast("array<double>"))
                     .alias("codes"))


def pq_adc_topk(df: DataFrame, queries: DataFrame,
                codebooks: list[list[list[float]]], k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                round_digits: int = 6) -> DataFrame:
    """Asymmetric-distance top-k: each query precomputes an
    ``m x k_codes`` lookup table of subspace squared distances
    (control-plane: queries are eval-sized and COLLECTED — the
    brute_force_topk broadcast contract); the corpus side is its PQ
    codes only, scanned narrowly with ``m`` lookups + ``m-1`` adds
    per candidate.  Ranking: (rounded ADC distance, neighbor id) —
    the similarity-family determinism rule.

    Output: ``(query_id, neighbor_id, adc_dist, rank)``.
    """
    mats = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m, sub = len(mats), mats[0].shape[1]
    qrows = (queries.select(F.col(id_col),
                            F.col(vec_col).cast("array<double>"))
             .collect())
    if not qrows:
        raise ValueError("pq_adc_topk: empty query set")
    qids = [r[0] for r in qrows]
    # LUT[q][j][c]: strict left-fold squared distance of query slice
    # j to centroid c (cumsum — bit-identical to the oracle's
    # list_reduce fold)
    luts = np.empty((len(qrows), m, mats[0].shape[0]))
    for qi, r in enumerate(qrows):
        qv = np.asarray(r[1], dtype=np.float64)
        for j, cmat in enumerate(mats):
            sq = (qv[j * sub:(j + 1) * sub][None, :] - cmat) ** 2
            luts[qi, j] = np.cumsum(sq, axis=1)[:, -1]

    codes = pq_encode(df, codebooks, id_col=id_col, vec_col=vec_col)

    out_schema = "query_idx int, neighbor_id long, adc_dist double"

    def score(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            cd = np.array(list(pdf["codes"]), dtype=np.int64)
            for qi in range(len(qids)):
                # strict left fold over subspaces: ((l0+l1)+l2)+...
                acc = luts[qi, 0][cd[:, 0]]
                for j in range(1, m):
                    acc = acc + luts[qi, j][cd[:, j]]
                yield pd.DataFrame({
                    "query_idx": np.full(len(ids), qi, dtype=np.int32),
                    "neighbor_id": ids,
                    "adc_dist": acc,
                })

    qmap = F.array(*[F.lit(q) for q in qids])
    sims = (codes.mapInPandas(score, out_schema)
            .select(F.element_at(qmap, F.col("query_idx") + 1)
                    .alias("query_id"),
                    "neighbor_id",
                    F.round("adc_dist", round_digits)
                    .alias("adc_dist"))
            .filter(F.col("neighbor_id") != F.col("query_id")))
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id"))
    return (sims.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def scalar_quantize(df: DataFrame, id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    levels: int = 256) -> DataFrame:
    """Per-dimension scalar quantization (the int8 embedding
    compression every vector store ships): each dimension maps to
    ``round((x - min_d) / range_d * (levels-1))`` with corpus-wide
    per-dim min/max, reporting the per-vector max reconstruction
    error.

    Unlike the k-means paths this is FULLY exact cross-engine: min /
    max aggregates are order-invariant, every downstream op is
    element-wise (no float fold anywhere), and the max over
    dimensions is again order-invariant — the oracle hash matches
    bit-for-bit with no ulp caveat.

    Scale shape: ONE bounded-key shuffle (explode to (dim, x), agg on
    the dim key with map-side combine, <= dim rows collected to the
    driver), then a narrow codegen'd Project with the stats as plan
    literals.  Output: ``(id_col, codes_str, max_err)``.
    """
    if levels < 2:
        raise ValueError(f"scalar_quantize: levels must be >= 2,"
                         f" got {levels}")
    v = F.col(vec_col).cast("array<double>")
    stats = (df.select(F.posexplode(v).alias("i", "x"))
               .groupBy("i")
               .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
               .collect())
    if not stats:
        raise ValueError("scalar_quantize: empty input")
    dim = len(stats)
    lo = [0.0] * dim
    rng = [0.0] * dim
    for r in stats:
        lo[r["i"]] = r["lo"]
        rng[r["i"]] = r["hi"] - r["lo"]
    # literals as string-casts: Spark parses bare decimal literals
    # as DECIMAL, and cast('<repr>' as double) round-trips the exact
    # IEEE double (shortest-repr guarantee) on both engines
    def _dlit(x: float) -> str:
        return f"cast('{x!r}' as double)"

    mins = "array(" + ",".join(_dlit(x) for x in lo) + ")"
    rngs = "array(" + ",".join(_dlit(x) for x in rng) + ")"
    top = _dlit(float(levels - 1))
    code = (f"CASE WHEN {rngs}[i] = {_dlit(0.0)} THEN 0 ELSE "
            f"cast(round(((_v[i] - {mins}[i]) / {rngs}[i])"
            f" * {top}) as int) END")
    dq = f"({mins}[i] + (cast({code} as double) * {rngs}[i]) / {top})"
    return (df.select(F.col(id_col), v.alias("_v"))
            .select(
                id_col,
                F.expr(f"array_join(transform(sequence(0, {dim - 1}),"
                       f" i -> cast({code} as string)), ',')")
                .alias("codes_str"),
                F.round(F.expr(
                    f"array_max(transform(sequence(0, {dim - 1}),"
                    f" i -> abs(_v[i] - {dq})))"), 6)
                .alias("max_err")))
