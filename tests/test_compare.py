"""Golden-compare verification operator tests."""

from pyspark.sql import functions as F

from vision_parse_spark import ExtractConfig, extract
from vision_parse_spark.operators.compare import compare_extractions, pass_rate
from vision_parse_spark.synth import synth_transcripts_spark


def test_self_compare_is_all_match(spark):
    out = extract(synth_transcripts_spark(spark, 200, partitions=3),
                  ExtractConfig())
    cmp = compare_extractions(out, out)
    s = pass_rate(cmp).first()
    assert s.n_total == 200 and s.n_match == 200 and s.pass_rate == 1.0


def test_compare_detects_all_verdicts(spark):
    a = spark.createDataFrame(
        [("c", 0, "same"), ("c", 1, "left version"), ("c", 3, "only in a")],
        ["conv_id", "turn_idx", "markdown"],
    )
    e = spark.createDataFrame(
        [("c", 0, "same"), ("c", 1, "right version"), ("c", 2, "only in e")],
        ["conv_id", "turn_idx", "markdown"],
    )
    got = {(r.conv_id, r.turn_idx): r.verdict
           for r in compare_extractions(a, e).collect()}
    assert got == {("c", 0): "match", ("c", 1): "diff",
                   ("c", 2): "missing", ("c", 3): "extra"}
    s = pass_rate(compare_extractions(a, e)).first()
    assert (s.n_total, s.n_match, s.n_diff, s.n_missing, s.n_extra) == (4, 1, 1, 1, 1)
    assert s.pass_rate == 0.25


def test_partitioning_invariance_via_compare(spark):
    """The north_rule invariant, expressed with the operator itself:
    salted vs narrow execution produce per-turn identical markdown."""
    df = synth_transcripts_spark(spark, 300, partitions=2)
    narrow = extract(df, ExtractConfig(image_mode="url"))
    salted = extract(df, ExtractConfig(image_mode="url"), salt_partitions=13)
    s = pass_rate(compare_extractions(narrow, salted)).first()
    assert s.pass_rate == 1.0 and s.n_total == 300
