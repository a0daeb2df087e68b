"""Deterministic hash-based sampling / split assignment."""

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
