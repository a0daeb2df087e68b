"""Similarity-search operator tests: exact brute-force cosine top-k
and LSH-bucketed ANN over array<float> embedding columns."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vision_parse_spark.operators.similarity import (
    ann_topk_lsh,
    brute_force_topk,
    embedding_near_dups,
    with_lsh_bucket,
)

DIM = 8


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(3)
    base = rng.standard_normal((20, DIM))
    base[1] = base[0] + 0.01 * rng.standard_normal(DIM)  # near dup of 0
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_brute_force_topk_matches_numpy(spark, vectors):
    pdf = vectors.toPandas().sort_values("vec_id")
    m = np.stack(pdf.embedding.map(np.array))
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = mn @ mn.T
    np.fill_diagonal(sims, -np.inf)

    out = brute_force_topk(vectors, vectors.filter(F.col("vec_id") < 3), k=4)
    got = out.orderBy("query_id", "rank").collect()
    for q in range(3):
        expect = np.argsort(-np.round(sims[q], 4), kind="stable")[:4]
        got_q = [r.neighbor_id for r in got if r.query_id == q]
        assert got_q == list(expect)


def test_topk_excludes_self(spark, vectors):
    out = brute_force_topk(vectors, vectors, k=3).collect()
    assert all(r.neighbor_id != r.query_id for r in out)


def test_near_dup_is_rank_one(spark, vectors):
    out = brute_force_topk(vectors, vectors.filter(F.col("vec_id") == 0), k=1)
    r = out.first()
    assert r.neighbor_id == 1 and r.cosine > 0.99


def test_lsh_bucket_deterministic_and_similar_collide(spark, vectors):
    b = with_lsh_bucket(vectors, DIM, n_planes=8)
    rows = {r.vec_id: r.lsh_bucket for r in b.collect()}
    rows2 = {r.vec_id: r.lsh_bucket
             for r in with_lsh_bucket(vectors, DIM, n_planes=8).collect()}
    assert rows == rows2
    assert rows[0] == rows[1]  # near-identical vectors share all signs


def test_ann_finds_planted_near_dup(spark, vectors):
    out = ann_topk_lsh(vectors, vectors.filter(F.col("vec_id") == 0),
                       dim=DIM, k=3, n_planes=6)
    rows = out.collect()
    assert rows and rows[0].neighbor_id == 1  # collides + ranks first


def test_embedding_near_dups_threshold(spark, vectors):
    out = embedding_near_dups(vectors, dim=DIM, threshold=0.95, n_planes=6)
    got = {(r.id_a, r.id_b) for r in out.collect()}
    assert got == {(0, 1)}


def test_ivf_topk_finds_planted_near_dup(spark, vectors):
    from vision_parse_spark.operators.similarity import (
        ivf_topk,
        train_ivf_centroids,
    )

    cents = train_ivf_centroids(vectors, DIM, n_centroids=4, sample_size=20)
    assert cents.shape == (4, DIM)
    out = ivf_topk(vectors, vectors.filter(F.col("vec_id") == 0), cents,
                   k=3, nprobe=2)
    rows = out.orderBy("rank").collect()
    assert rows and rows[0].neighbor_id == 1 and rows[0].cosine > 0.99


def test_ivf_recall_vs_brute_force(spark, vectors):
    from vision_parse_spark.operators.similarity import (
        ivf_topk,
        train_ivf_centroids,
    )

    cents = train_ivf_centroids(vectors, DIM, n_centroids=4, sample_size=20)
    q = vectors.filter(F.col("vec_id") < 5)
    exact = {(r.query_id, r.neighbor_id)
             for r in brute_force_topk(vectors, q, k=3).collect()}
    approx = {(r.query_id, r.neighbor_id)
              for r in ivf_topk(vectors, q, cents, k=3, nprobe=3).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5  # nprobe=3 of 4 cells on random vectors


def test_ivf_portable_matches_plan_and_recall(spark, vectors):
    """Data-seeded-quantizer IVF (the hash-green contract twin): finds
    planted near-dups, ranks identically to the exact top-k within the
    probed cells, and never degenerates into an unrestricted cross
    product over the corpus."""
    from vision_parse_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk_portable,
    )

    q = vectors.filter(F.col("vec_id") < 4)
    out = ivf_topk_portable(vectors, q, n_centroids=4, nprobe=4, k=3)
    rows = out.collect()
    assert {r.query_id for r in rows} == {0, 1, 2, 3}
    assert all(1 <= r.rank <= 3 for r in rows)
    # with nprobe == n_centroids every cell is probed -> exact recall
    exact = {(r.query_id, r.rank): r.neighbor_id
             for r in brute_force_topk(vectors, q, k=3).collect()}
    approx = {(r.query_id, r.rank): r.neighbor_id for r in rows}
    assert approx == exact


def test_near_dups_fast_twin_matches_portable(spark):
    """Arrow matmul twin and the Catalyst portable path produce the
    SAME near-dup pair set on real test data (the bench times the
    twin; the contract hash-checks the portable path)."""
    from vision_parse_spark.operators.similarity import (
        embedding_near_dups,
        embedding_near_dups_fast,
    )

    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    dim = len(e.select("embedding").first()[0])
    slow = {(r.id_a, r.id_b) for r in
            embedding_near_dups(e, dim=dim, threshold=0.3, n_planes=4)
            .select("id_a", "id_b").collect()}
    fast = {(r.id_a, r.id_b) for r in
            embedding_near_dups_fast(e, dim=dim, threshold=0.3, n_planes=4)
            .select("id_a", "id_b").collect()}
    assert slow == fast and len(slow) > 0


def test_degenerate_bucket_matmul_is_memory_bounded():
    """Round-4 verdict item 3: a degenerate bucket (10k all-zero
    vectors, which all hash to the same hyperplane bucket) previously
    allocated an n x n similarity matrix (~800 MB) inside the
    applyInPandas kernel; the tiled verify must stay under ~150 MB of
    numpy scratch while examining the same pairs.  Runs the kernel
    directly (plain pandas) so tracemalloc sees the numpy buffers."""
    import tracemalloc

    import numpy as np
    import pandas as pd

    from vision_parse_spark.operators.similarity import _bucket_pairs_pdf

    n, dim = 10_000, 16
    pdf = pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [np.zeros(dim)] * n,
    })
    tracemalloc.start()
    out = _bucket_pairs_pdf(pdf, "vec_id", "embedding", threshold=0.95)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert len(out) == 0          # zero vectors -> cosine 0 < threshold
    assert peak < 150 * 1024 * 1024, f"peak {peak/1e6:.0f} MB"


def test_tiled_bucket_pairs_match_full_matmul():
    """Tiling must not change the pair set: compare against a direct
    full n x n reference on a small random bucket with many pairs
    straddling tile boundaries (tile size forced tiny)."""
    import numpy as np
    import pandas as pd

    from vision_parse_spark.operators import similarity as sim

    rng = np.random.default_rng(11)
    n, dim = 700, 8
    vecs = rng.normal(size=(n, dim))
    pdf = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                        "embedding": list(vecs)})
    m = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
    full = m @ m.T
    iu, ju = np.triu_indices(n, k=1)
    keep = full[iu, ju] >= 0.5
    want = set(zip(iu[keep].tolist(), ju[keep].tolist()))

    old_tile = sim._BUCKET_TILE_ELEMS
    sim._BUCKET_TILE_ELEMS = 1  # forces tile = max(128, ...) = 128 rows
    try:
        out = sim._bucket_pairs_pdf(pdf, "vec_id", "embedding",
                                    threshold=0.5)
    finally:
        sim._BUCKET_TILE_ELEMS = old_tile
    got = set(zip(out["id_a"].tolist(), out["id_b"].tolist()))
    assert got == want and len(want) > 0
