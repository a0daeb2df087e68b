"""Gopher rule bundle + DSIR importance weighting
(operators/selection.py)."""

import math

import pytest

from vision_parse_spark.operators.selection import (
    dsir_logweights,
    dsir_select,
    gopher_rules,
)


def _rows(df):
    return {r.doc_id: r.asDict() for r in df.collect()}


PROSE = ("The old lighthouse keeper walked to the edge of the cliff "
         "and watched the waves break against the rocks below while "
         "the gulls turned slowly in the wind above the grey water "
         "and the evening light faded over the long horizon line. ")


def test_gopher_signals_and_gate(spark):
    df = spark.createDataFrame(
        [(0, PROSE * 2),                       # clean prose: passes
         (1, "too short"),                     # word-count floor
         (2, ("# " * 30 + PROSE)),             # symbol-heavy
         (3, "\n".join("* bullet point here"
                       for _ in range(20))),   # all-bullet lines
         (4, " ".join("1234 5678" for _ in range(40)))],  # no alpha
        ["doc_id", "text"])
    out = _rows(gopher_rules(df, min_words=30, min_stop_hits=1))
    assert out[0]["gopher_pass"] is True
    assert out[1]["gopher_pass"] is False and out[1]["n_words"] == 2
    assert out[2]["gopher_pass"] is False
    assert out[2]["symbol_word_ratio"] > 0.1
    assert out[3]["gopher_pass"] is False
    assert out[3]["bullet_line_frac"] == 1.0
    assert out[4]["gopher_pass"] is False
    assert out[4]["alpha_word_frac"] == 0.0
    # signal sanity on the clean doc
    assert 3.0 <= out[0]["mean_word_len"] <= 10.0
    assert out[0]["stop_hits"] >= 1


def test_gopher_rules_no_shuffle(spark):
    df = spark.createDataFrame([(0, PROSE)], ["doc_id", "text"])
    plan = gopher_rules(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_dsir_prefers_target_like_docs(spark):
    target = spark.createDataFrame(
        [(100 + i, "alpha beta gamma delta epsilon zeta")
         for i in range(5)],
        ["doc_id", "text"])
    raw = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),   # target-like
         (2, "mundane filler words about nothing at all"),
         (3, "")],                                     # tokenless
        ["doc_id", "text"])
    w = _rows(dsir_logweights(raw, target, n_buckets=256))
    assert set(w) == {1, 2}          # tokenless doc has no features
    assert w[1]["logw"] > w[2]["logw"]
    # n_grams = unigrams + bigrams = 6 + 5
    assert w[1]["n_grams"] == 11
    assert all(math.isfinite(v["logw"]) for v in w.values())


def test_dsir_select_order_and_limit(spark):
    target = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], ["doc_id", "text"])
    raw = spark.createDataFrame(
        [(1, "alpha beta gamma delta"),
         (2, "alpha beta unrelated words"),
         (3, "totally different content here")],
        ["doc_id", "text"])
    top = dsir_select(raw, target, 2, n_buckets=256).collect()
    assert [r.doc_id for r in top] == [1, 2]
    assert top[0].logw >= top[1].logw


def test_dsir_rejects_degenerate_buckets(spark):
    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="n_buckets"):
        dsir_logweights(df, df, n_buckets=1)
