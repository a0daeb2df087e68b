"""Deterministic hash-based sampling / split assignment."""

import pytest
from pyspark.sql import functions as F

from vision_parse_spark.operators.sampling import (
    hash_bucket,
    hash_sample,
    with_split,
)


def test_split_is_deterministic_and_partition_invariant(spark):
    d = spark.range(5000).withColumnRenamed("id", "doc_id")
    a = {(r.doc_id, r.split) for r in
         with_split(d.repartition(3), "doc_id").collect()}
    b = {(r.doc_id, r.split) for r in
         with_split(d.repartition(17), "doc_id").collect()}
    assert a == b  # randomSplit cannot make this promise


def test_split_fraction_is_close(spark):
    d = spark.range(20000).withColumnRenamed("id", "doc_id")
    n_train = with_split(d, "doc_id", train_frac=0.8) \
        .filter("split = 'train'").count()
    assert abs(n_train / 20000 - 0.8) < 0.02


def test_hash_sample_subset_and_stable(spark):
    d = spark.range(10000).withColumnRenamed("id", "doc_id")
    s1 = {r.doc_id for r in hash_sample(d, "doc_id", 0.1).collect()}
    s2 = {r.doc_id for r in hash_sample(d, "doc_id", 0.2).collect()}
    assert s1 <= s2  # nested: growing the fraction only ADDS rows
    assert abs(len(s1) / 10000 - 0.1) < 0.02
    assert abs(len(s2) / 10000 - 0.2) < 0.02


def test_bucket_is_narrow_no_shuffle(spark):
    d = spark.range(100).withColumnRenamed("id", "doc_id")
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        with_split(d, "doc_id").explain("formatted")
    assert "Exchange" not in buf.getvalue()


def test_stratified_sample_per_stratum_fractions(spark):
    from vision_parse_spark.operators.sampling import stratified_sample

    rows = [(i, "keep" if i % 3 == 0 else ("half" if i % 3 == 1 else "drop"))
            for i in range(3000)]
    df = spark.createDataFrame(rows, ["doc_id", "stratum"])
    out = stratified_sample(
        df, "doc_id", "stratum",
        {"keep": 1.0, "half": 0.5}, default_fraction=0.0)
    counts = {r["stratum"]: r["count"] for r in
              out.groupBy("stratum").count().collect()}
    assert counts["keep"] == 1000          # fraction 1.0 keeps all
    assert "drop" not in counts            # default 0.0 drops all
    assert 380 <= counts["half"] <= 620    # ~0.5 of 1000


def test_stratified_sample_deterministic_and_consistent(spark):
    """Same key -> same membership regardless of partitioning, and a
    row sampled at fraction f is also sampled at any f' > f (nested
    thresholds — the property that makes downsampling reproducible)."""
    from vision_parse_spark.operators.sampling import stratified_sample

    df = spark.createDataFrame(
        [(i, "s") for i in range(2000)], ["doc_id", "stratum"])
    a = {r.doc_id for r in stratified_sample(
        df.repartition(3), "doc_id", "stratum", {"s": 0.3}).collect()}
    b = {r.doc_id for r in stratified_sample(
        df.repartition(11), "doc_id", "stratum", {"s": 0.3}).collect()}
    assert a == b
    wider = {r.doc_id for r in stratified_sample(
        df, "doc_id", "stratum", {"s": 0.6}).collect()}
    assert a <= wider


def test_stratified_sample_rejects_bad_fractions(spark):
    import pytest

    from vision_parse_spark.operators.sampling import stratified_sample

    df = spark.createDataFrame([(1, "x")], ["doc_id", "stratum"])
    with pytest.raises(ValueError):
        stratified_sample(df, "doc_id", "stratum", {"x": 1.5})
    with pytest.raises(ValueError):
        stratified_sample(df, "doc_id", "stratum", {}, default_fraction=-0.1)


def test_stratified_sample_plan_is_narrow(spark):
    import io
    from contextlib import redirect_stdout

    from vision_parse_spark.operators.sampling import stratified_sample

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = stratified_sample(df, "doc_id", "source", {"src0": 0.5},
                            default_fraction=0.1)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    assert "Exchange" not in buf.getvalue()


def test_resample_mixture_reaches_target_shares(spark):
    """Skewed input (80/10/10) resampled to 50/25/25: the rare
    strata bind (kept fully), the dominant one downsamples; realised
    shares land within hash-bucket noise of the target."""
    from vision_parse_spark.operators.sampling import resample_mixture

    rows = ([(i, "web") for i in range(8000)]
            + [(i + 8000, "code") for i in range(1000)]
            + [(i + 9000, "papers") for i in range(1000)])
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = resample_mixture(df, "source",
                           {"web": 0.5, "code": 0.25, "papers": 0.25})
    got = {r.source: r.n for r in
           out.groupBy("source").count().withColumnRenamed("count", "n")
              .collect()}
    # T = min(8000/.5, 1000/.25, 1000/.25) = 4000
    assert got["code"] == 1000 and got["papers"] == 1000   # frac 1.0
    assert abs(got["web"] - 2000) < 150                    # frac 0.25


def test_resample_mixture_drops_unweighted_and_is_deterministic(spark):
    from vision_parse_spark.operators.sampling import resample_mixture

    rows = [(i, ["a", "b", "junk"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out1 = resample_mixture(df, "source", {"a": 0.5, "b": 0.5})
    assert out1.filter("source = 'junk'").count() == 0
    ids1 = sorted(r.doc_id for r in out1.collect())
    ids2 = sorted(r.doc_id for r in
                  resample_mixture(df.repartition(7), "source",
                                   {"a": 0.5, "b": 0.5}).collect())
    assert ids1 == ids2 and len(ids1) > 0


def test_resample_mixture_validation(spark):
    from vision_parse_spark.operators.sampling import resample_mixture

    df = spark.createDataFrame([(1, "a")], ["doc_id", "source"])
    with pytest.raises(ValueError):
        resample_mixture(df, "source", {})
    with pytest.raises(ValueError):
        resample_mixture(df, "source", {"a": 0.0})
    with pytest.raises(ValueError):
        resample_mixture(df, "source", {"a": 0.5, "ghost": 0.5})


def test_leak_safe_split_cluster_atomicity(spark):
    from vision_parse_spark.operators.sampling import (
        leak_safe_split, with_split)

    docs = spark.createDataFrame([(i, f"doc {i}") for i in range(1, 7)],
                                 ["doc_id", "text"])
    pairs = spark.createDataFrame([(1, 2), (2, 3), (5, 6)],
                                  ["id_a", "id_b"])
    out = {r.doc_id: r for r in
           leak_safe_split(docs, pairs).collect()}
    # whole cluster takes the representative (min reachable id)
    assert [out[i].rep_id for i in (1, 2, 3)] == [1, 1, 1]
    assert [out[i].rep_id for i in (5, 6)] == [5, 5]
    assert out[4].rep_id == 4                  # singleton = own key
    # every cluster member lands in the SAME split
    assert len({out[i].split for i in (1, 2, 3)}) == 1
    assert len({out[i].split for i in (5, 6)}) == 1
    # singleton split equals the plain keyed split (same bucket)
    plain = {r.doc_id: r.split
             for r in with_split(docs, "doc_id").collect()}
    assert out[4].split == plain[4]


def test_leak_safe_split_validation(spark):
    from vision_parse_spark.operators.sampling import leak_safe_split

    docs = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    pairs = spark.createDataFrame([(1, 1)], ["id_a", "id_b"])
    with pytest.raises(ValueError, match="train_frac"):
        leak_safe_split(docs, pairs, train_frac=1.5)
