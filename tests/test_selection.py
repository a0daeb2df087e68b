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


def test_c4_filters_line_and_page_rules(spark):
    from vision_parse_spark.operators.selection import c4_filters

    good = ("This is a perfectly normal first sentence of prose.\n"
            "Here is another sentence that clearly ends properly!\n"
            "Does this line end with a question mark?\n"
            "A fourth declarative sentence sits right here.\n"
            "And a fifth one closes out the page for the gate.")
    df = spark.createDataFrame(
        [
            (0, good),
            (1, good + "\nshort line\nno terminal punct here"),
            (2, good + "\nPlease enable javascript to continue."),
            (3, good.replace("another", "badword2")),
            (4, good + "\nLorem Ipsum dolor sit amet."),
            (5, good + "\nfunction f() { return 1; }"),
            (6, "Too few sentences here.\nOnly two survive, sadly."),
        ],
        ["doc_id", "text"])
    out = {r.doc_id: r for r in c4_filters(df).collect()}

    assert out[0].c4_pass and out[0].n_lines_kept == 5
    assert out[0].clean_text == good
    # short / unterminated lines cut, page still passes
    assert out[1].c4_pass and out[1].n_lines_kept == 5
    # javascript LINE removed (case-insensitive word), page passes
    assert out[2].n_lines_kept == 5
    assert "javascript" not in out[2].clean_text
    # blocklist word / lorem ipsum / curly bracket kill the PAGE
    assert not out[3].c4_pass
    assert not out[4].c4_pass
    assert not out[5].c4_pass
    # fewer than min_sentences kept -> page fails but lines remain
    assert not out[6].c4_pass and out[6].n_lines_kept == 2


def test_c4_filters_edges_and_validation(spark):
    import pytest as _pt

    from vision_parse_spark.operators.selection import c4_filters

    df = spark.createDataFrame(
        [(0, ""), (1, "   \n  \n"), (2, 'He said "stop".\nShe said "go!"')],
        ["doc_id", "text"])
    out = {r.doc_id: r for r in c4_filters(df, min_sentences=1).collect()}
    assert out[0].n_lines_kept == 0 and out[0].clean_text == ""
    assert not out[0].c4_pass and not out[1].c4_pass
    # closing double quote is terminal punctuation
    assert out[2].n_lines_kept == 2 and out[2].c4_pass
    with _pt.raises(ValueError, match="bad_words"):
        c4_filters(df, bad_words=())


def test_c4_filters_no_shuffle(spark):
    from vision_parse_spark.operators.selection import c4_filters

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (c4_filters(docs)._jdf.queryExecution().executedPlan()
            .toString())
    assert "Exchange" not in plan


def test_flesch_kincaid_hand_values(spark):
    from vision_parse_spark.operators.selection import flesch_kincaid

    df = spark.createDataFrame(
        [(1, "The cat sat. It ran!"), (2, ""), (3, "zzz pfft")],
        ["doc_id", "text"])
    got = {r.doc_id: r for r in flesch_kincaid(df).collect()}
    r1 = got[1]
    assert (r1.n_words, r1.n_sentences, r1.n_syllables) == (5, 2, 5)
    assert r1.fk_grade == round(0.39 * (5 / 2) + 11.8 * 1.0 - 15.59, 4)
    # empty text: clamped denominators, zero syllables
    assert (got[2].n_words, got[2].n_sentences) == (1, 1)
    assert got[2].fk_grade == round(0.39 + 0.0 - 15.59, 4)
    # vowel-less words: zero syllable groups, still scored
    assert got[3].n_syllables == 0


def test_flesch_kincaid_no_shuffle(spark):
    from vision_parse_spark.operators.selection import flesch_kincaid

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (flesch_kincaid(docs)._jdf.queryExecution().executedPlan()
            .toString())
    assert "Exchange" not in plan


def test_script_profile_counts_and_dominance(spark):
    from vision_parse_spark.operators.selection import script_profile

    df = spark.createDataFrame(
        [(1, "hello Привет мир"), (2, "你好世界 ok"), (3, "123 !?"),
         (4, "ab ЯЯ")],
        ["doc_id", "text"])
    got = {r.doc_id: r for r in script_profile(df).collect()}
    assert (got[1].n_latin, got[1].n_cyrillic) == (5, 9)
    assert got[1].dominant_script == "cyrillic"
    assert (got[2].n_cjk, got[2].n_latin) == (4, 2)
    assert got[2].dominant_script == "cjk"
    assert got[3].dominant_script == "none"      # no scripted char
    # tie (2 latin vs 2 cyrillic): first-listed script wins
    assert (got[4].n_latin, got[4].n_cyrillic) == (2, 2)
    assert got[4].dominant_script == "latin"


def test_script_profile_no_shuffle(spark):
    from vision_parse_spark.operators.selection import script_profile

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (script_profile(docs)._jdf.queryExecution().executedPlan()
            .toString())
    assert "Exchange" not in plan
