"""Bucketed-table co-located join: the pay-the-shuffle-once pattern,
with a plan-shape assertion that the join itself has NO Exchange."""

import pytest
from pyspark.sql import functions as F

from vision_parse_spark import ExtractConfig, extract
from vision_parse_spark.sinks.bucketed import cojoined, write_bucketed_table
from vision_parse_spark.synth import synth_transcripts_spark


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    out = extract(synth_transcripts_spark(spark, 300, partitions=4),
                  ExtractConfig()).select("conv_id", "turn_idx", "markdown")
    stats = out.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n_turns"))
    write_bucketed_table(out, "md_bucketed", "conv_id", 8, "turn_idx")
    write_bucketed_table(stats, "stats_bucketed", "conv_id", 8, sort_col=None)
    yield "md_bucketed", "stats_bucketed"
    spark.sql("DROP TABLE IF EXISTS md_bucketed")
    spark.sql("DROP TABLE IF EXISTS stats_bucketed")


def test_cojoin_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    # disable broadcast so the co-partitioning (not broadcast) carries it
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = cojoined(spark, left, right, "conv_id")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_cojoin_correct(spark, bucketed_tables):
    left, right = bucketed_tables
    j = cojoined(spark, left, right, "conv_id")
    row = j.filter("turn_idx = 0").first()
    assert row.n_turns >= 1
    # every markdown row carries its conversation's stats
    assert j.count() == spark.table(left).count()
