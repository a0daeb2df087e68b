"""Salted two-phase aggregation equivalence + stateful streaming
conversation assembly."""

import os
import time

import pytest
from pyspark.sql import functions as F

from vision_parse_spark.operators.aggregate import (
    conv_stats_direct,
    conv_stats_salted,
)
from vision_parse_spark.synth import synth_transcripts_spark


def test_salted_agg_equals_direct(spark):
    df = synth_transcripts_spark(spark, 2000, partitions=8)
    a = {r.conv_id: (r.n_turns, r.total_chars, r.min_text, r.max_text)
         for r in conv_stats_salted(df, salt_buckets=16).collect()}
    b = {r.conv_id: (r.n_turns, r.total_chars, r.min_text, r.max_text)
         for r in conv_stats_direct(df).collect()}
    assert a == b


def test_salted_agg_two_exchanges(spark):
    """Plan shape: exactly two hash exchanges (conv+salt, then conv) —
    the skew-spread shuffle followed by the tiny combine."""
    df = synth_transcripts_spark(spark, 500, partitions=4)
    plan = conv_stats_salted(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 2


def test_stateful_conversation_assembly(spark, tmp_path):
    from vision_parse_spark import ExtractConfig
    from vision_parse_spark.streaming.stream import extract_stream
    from vision_parse_spark.streaming.stateful import assembled_stream
    from vision_parse_spark.synth import synth_transcripts_pdf

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    n = 96
    spark.createDataFrame(synth_transcripts_pdf(n)).coalesce(2) \
        .write.mode("append").parquet(in_dir)

    turns = extract_stream(spark, in_dir, ExtractConfig()).select(
        "conv_id", "turn_idx", "markdown"
    )
    q = (
        assembled_stream(turns)
        .writeStream.format("memory").queryName("assembled")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        # wait for the idle timeout to fire emissions
        deadline = time.time() + 90
        want = spark.createDataFrame(synth_transcripts_pdf(n)) \
            .select("conv_id").distinct().count()
        while time.time() < deadline:
            got = spark.sql(
                "select count(*) c from assembled where conv_id is not null"
            ).first().c
            if got >= want:
                break
            time.sleep(2)
    finally:
        q.stop()

    rows = {r.conv_id: r for r in spark.sql(
        "select * from assembled where conv_id is not null").collect()}
    assert len(rows) == want
    # ordered assembly equals the batch path
    from vision_parse_spark import extract, ExtractConfig as EC

    batch = extract(synth_transcripts_spark(spark, n, partitions=2), EC())
    expected = (
        batch.groupBy("conv_id")
        .agg(F.expr(
            "array_join(transform(array_sort(collect_list("
            "struct(turn_idx, markdown))), x -> x.markdown), '\\n')"
        ).alias("document"), F.count(F.lit(1)).alias("n_turns"))
        .collect()
    )
    for e in expected:
        got = rows[e.conv_id]
        assert got.n_turns == e.n_turns
        assert got.document == e.document, e.conv_id
