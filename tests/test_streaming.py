"""Structured Streaming tests: same extraction semantics on a stream,
exactly-once incremental drain, watermarked windowed agg."""

import glob
import os

import pytest

from vision_parse_spark import ExtractConfig, extract
from vision_parse_spark.streaming.stream import (
    extract_stream,
    turn_rate_per_conv,
    write_stream_merged,
)
from vision_parse_spark.synth import synth_transcripts_spark

N = 120


@pytest.fixture()
def stream_dirs(tmp_path):
    d = {k: str(tmp_path / k) for k in ("in", "out", "ckpt")}
    os.makedirs(d["in"], exist_ok=True)
    return d


def _feed(spark, path, start, n):
    """Append turns [start, start+n) as one new parquet file (a
    micro-batch arrival)."""
    from vision_parse_spark.synth import synth_transcripts_pdf

    pdf = synth_transcripts_pdf(n, start=start)
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(path)


def test_streaming_matches_batch(spark, stream_dirs):
    _feed(spark, stream_dirs["in"], 0, N)
    out = extract_stream(spark, stream_dirs["in"], ExtractConfig())
    q = write_stream_merged(out, stream_dirs["out"], stream_dirs["ckpt"])
    q.awaitTermination(120)

    got = spark.read.parquet(stream_dirs["out"]).select(
        "conv_id", "turn_idx", "markdown"
    )
    batch = extract(
        synth_transcripts_spark(spark, N, partitions=2), ExtractConfig()
    ).select("conv_id", "turn_idx", "markdown")
    assert got.count() == N
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0


def test_incremental_drain_exactly_once(spark, stream_dirs):
    _feed(spark, stream_dirs["in"], 0, 60)
    out = extract_stream(spark, stream_dirs["in"], ExtractConfig())
    write_stream_merged(out, stream_dirs["out"], stream_dirs["ckpt"]).awaitTermination(120)
    # new files arrive; same checkpoint -> only the delta is processed
    _feed(spark, stream_dirs["in"], 60, 60)
    out2 = extract_stream(spark, stream_dirs["in"], ExtractConfig())
    write_stream_merged(out2, stream_dirs["out"], stream_dirs["ckpt"]).awaitTermination(120)

    back = spark.read.parquet(stream_dirs["out"])
    assert back.count() == 120
    assert back.select("conv_id", "turn_idx").distinct().count() == 120


def test_watermarked_window_agg(spark, stream_dirs):
    _feed(spark, stream_dirs["in"], 0, N)
    stream = extract_stream(spark, stream_dirs["in"], ExtractConfig()).select(
        "conv_id", "turn_idx", "role", "ts"
    )
    agg = turn_rate_per_conv(stream, window="5 minutes", watermark="10 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("rates")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from rates").collect()
    # windows with watermark in availableNow mode emit closed windows
    assert {"window_start", "window_end", "conv_id", "n_turns", "n_roles"} == set(
        spark.table("rates").columns
    )
    assert all(r.n_turns >= 1 for r in rows)


def test_foreach_batch_merge_exactly_once(spark, tmp_path):
    """Streaming MERGE sink: micro-batches append with per-batch
    manifests; a replayed batch_id (Spark's recovery behavior) is a
    no-op, so rows never duplicate."""
    from vision_parse_spark.streaming.stream import foreach_batch_merge
    from vision_parse_spark.synth import synth_transcripts_spark
    from vision_parse_spark import ExtractConfig, extract

    out_dir = str(tmp_path / "merged")
    fn = foreach_batch_merge(out_dir, n_buckets=4)
    df = extract(synth_transcripts_spark(spark, 200, partitions=2),
                 ExtractConfig()).select("conv_id", "turn_idx", "markdown")

    fn(df, 0)
    fn(df, 1)
    fn(df, 1)  # replay of batch 1 — must be a no-op
    back = spark.read.parquet(out_dir)
    assert back.count() == 400  # two distinct batches, no dup from replay
    import os
    manifests = os.listdir(os.path.join(out_dir, "_lineage", "stream"))
    assert sorted(manifests) == ["batch_0000000000.json",
                                 "batch_0000000001.json"]


def test_foreach_batch_merge_with_real_stream(spark, tmp_path):
    """End-to-end: readStream -> extract -> foreachBatch merge sink
    with availableNow; rerunning the drained query adds nothing."""
    from vision_parse_spark.streaming.stream import (
        extract_stream,
        foreach_batch_merge,
    )
    from vision_parse_spark.synth import synth_transcripts_spark

    inp = str(tmp_path / "in")
    out_dir = str(tmp_path / "merged")
    ckpt = str(tmp_path / "ckpt")
    synth_transcripts_spark(spark, 120, partitions=2) \
        .write.mode("overwrite").parquet(inp)

    def run():
        q = (
            extract_stream(spark, inp)
            .select("conv_id", "turn_idx", "markdown")
            .writeStream.foreachBatch(foreach_batch_merge(out_dir, 4))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    n1 = spark.read.parquet(out_dir).count()
    run()  # drained: checkpoint says nothing new
    n2 = spark.read.parquet(out_dir).count()
    assert n1 == 120 and n2 == 120


def test_foreach_batch_merge_crash_window_replay(spark, tmp_path):
    """The dangerous replay: data write committed but the manifest was
    never written (crash between the two).  The batch_id-scoped dynamic
    overwrite makes the replay idempotent — rows must NOT duplicate."""
    import os

    from vision_parse_spark.streaming.stream import foreach_batch_merge
    from vision_parse_spark.synth import synth_transcripts_spark
    from vision_parse_spark import ExtractConfig, extract

    out_dir = str(tmp_path / "merged")
    fn = foreach_batch_merge(out_dir, n_buckets=4)
    df = extract(synth_transcripts_spark(spark, 200, partitions=2),
                 ExtractConfig()).select("conv_id", "turn_idx", "markdown")

    fn(df, 0)
    # simulate the crash window: manifest vanishes, data stays
    manifest = os.path.join(out_dir, "_lineage", "stream",
                            "batch_0000000000.json")
    os.remove(manifest)
    fn(df, 0)  # Structured Streaming replays the same batch_id
    back = spark.read.parquet(out_dir)
    assert back.count() == 200  # overwrite-in-place, not append-dup
    assert os.path.exists(manifest)


def test_foreach_batch_upsert_updates_keys(spark, tmp_path):
    """Streaming keyed-upsert sink: a later batch re-emitting existing
    keys UPDATES them (no dup, no stale rows); replaying a batch
    converges to the same table."""
    from pyspark.sql import functions as F

    from vision_parse_spark import ExtractConfig, extract
    from vision_parse_spark.sinks.merge import read_merged, verify_lineage
    from vision_parse_spark.streaming.stream import foreach_batch_upsert
    from vision_parse_spark.synth import synth_transcripts_spark

    out_dir = str(tmp_path / "upserted")
    fn = foreach_batch_upsert(out_dir, n_buckets=4)
    base = extract(synth_transcripts_spark(spark, 200, partitions=2),
                   ExtractConfig()).select("conv_id", "turn_idx", "markdown")

    fn(base, 0)
    revised = base.filter(F.col("turn_idx") < 3).withColumn(
        "markdown", F.concat(F.lit("rev2:"), F.col("markdown")))
    n_rev = revised.count()
    fn(revised, 1)
    fn(revised, 1)  # replay converges, not duplicates
    back = read_merged(spark, out_dir)
    assert back.count() == 200
    assert back.filter(F.col("markdown").startswith("rev2:")).count() == n_rev
    assert back.filter((F.col("turn_idx") < 3)
                       & ~F.col("markdown").startswith("rev2:")).count() == 0
    assert verify_lineage(spark, out_dir)


def test_foreach_batch_dedup_append(spark, tmp_path):
    """Streaming incremental dedup: batch 0 self-dedups; batch 1 drops
    corpus near-dups AND its own internal dups; replay of a batch is a
    no-op; a crashed batch (data written, manifest missing) converges
    on replay without shadowing its own rows."""
    from vision_parse_spark.streaming.stream import (
        foreach_batch_dedup_append,
    )

    path = str(tmp_path / "corpus")
    sink = foreach_batch_dedup_append(path)

    b0 = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog today"),
         (1, "the quick brown fox jumps over the lazy dog today"),  # dup of 0
         (2, "completely different text about spark shuffle tuning")],
        ["doc_id", "text"])
    sink(b0, 0)
    kept0 = {r.doc_id for r in spark.read.parquet(path).collect()}
    assert kept0 == {0, 2}

    b1 = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog tonight"),  # corpus near-dup
         (11, "a genuinely novel document about parquet bucketing"),
         (12, "a genuinely novel document about parquet bucketing"),   # in-batch dup
         (13, "fresh unrelated prose on arrow batch sizing limits")],
        ["doc_id", "text"])
    sink(b1, 1)
    kept = {r.doc_id for r in spark.read.parquet(path).collect()}
    assert kept == {0, 2, 11, 13}

    # replay with manifest present: no-op
    sink(b1, 1)
    assert {r.doc_id for r in spark.read.parquet(path).collect()} \
        == {0, 2, 11, 13}

    # crash simulation: batch 2's data written but manifest lost ->
    # replay must not treat its own partial rows as corpus duplicates
    import os

    b2 = spark.createDataFrame(
        [(20, "entirely new content for the crash replay scenario")],
        ["doc_id", "text"])
    sink(b2, 2)
    os.remove(os.path.join(path, "_lineage", "stream",
                           "batch_0000000002.json"))
    sink(b2, 2)  # replay
    rows = spark.read.parquet(path).filter("doc_id = 20").collect()
    assert len(rows) == 1  # survived, exactly once


def test_foreach_batch_dedup_append_empty_first_batch(spark, tmp_path):
    """A zero-row first batch commits an empty manifest; the NEXT
    batch must not crash reading a corpus dir that holds only
    _lineage (round-4 review: UNABLE_TO_INFER_SCHEMA loop)."""
    from vision_parse_spark.streaming.stream import (
        foreach_batch_dedup_append,
    )

    path = str(tmp_path / "corpus")
    sink = foreach_batch_dedup_append(path)
    empty = spark.createDataFrame([], "doc_id long, text string")
    sink(empty, 0)
    b1 = spark.createDataFrame(
        [(1, "first real content after an empty opening batch")],
        ["doc_id", "text"])
    sink(b1, 1)  # must not raise
    assert {r.doc_id for r in spark.read.parquet(path).collect()} == {1}
