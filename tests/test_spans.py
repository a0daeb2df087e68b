"""Frequent-span removal (operators/spans.py) — Lee-et-al-style
repeated-substring dedup.  Hand-built corpora pin the span semantics
(whole covered span cut, not per-gram instance), passthrough edges,
and the census relation; the entry contract test + DuckDB oracle
cover the full-corpus replay."""

import pytest
from pyspark.sql import functions as F

from vision_parse_spark.operators.spans import (
    frequent_spans,
    remove_frequent_spans,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_boilerplate_span_cut_everywhere(spark):
    # "legal header text" appears in 3 docs; with max_df=2 it is
    # frequent and every covered token is cut, in every doc.
    texts = [
        "legal header text alpha one",
        "beta legal header text two",
        "gamma delta legal header text",
        "unique words only here",
    ]
    out = {r.doc_id: r for r in
           remove_frequent_spans(_docs(spark, texts), n=3, max_df=2)
           .collect()}
    assert out[0].clean_text == "alpha one" and out[0].n_removed == 3
    assert out[1].clean_text == "beta two" and out[1].n_removed == 3
    assert out[2].clean_text == "gamma delta" and out[2].n_removed == 3
    assert out[3].clean_text == "unique words only here"
    assert out[3].n_removed == 0


def test_overlapping_spans_cut_union_of_cover(spark):
    # Two frequent grams overlap ("a b c" and "b c d"): the cut is
    # the union of their covers, so "a b c d" goes, "tail" stays.
    texts = ["a b c d tail%d" % i for i in range(4)]
    out = remove_frequent_spans(_docs(spark, texts), n=3,
                                max_df=2).collect()
    for r in out:
        assert r.clean_text.startswith("tail")
        assert r.n_removed == 4


def test_short_and_empty_docs_pass_through(spark):
    texts = ["a b", "", "   ", "x"]
    out = {r.doc_id: r for r in
           remove_frequent_spans(_docs(spark, texts), n=3,
                                 max_df=0).collect()}
    assert len(out) == 4
    assert out[0].clean_text == "a b" and out[0].n_removed == 0
    assert out[1].clean_text == "" and out[1].n_removed == 0
    assert out[2].clean_text == "" and out[2].n_removed == 0
    assert out[3].clean_text == "x" and out[3].n_removed == 0


def test_below_threshold_grams_survive(spark):
    # df == max_df is NOT frequent (strict >): nothing is removed.
    texts = ["shared gram here pad1", "shared gram here pad2"]
    out = remove_frequent_spans(_docs(spark, texts), n=3,
                                max_df=2).collect()
    assert all(r.n_removed == 0 for r in out)


def test_normalized_token_space(spark):
    # Mixed case / extra whitespace normalize before matching, and
    # clean_text is re-joined in that normalized space.
    texts = ["The  Quick   FOX runs", "the quick fox sleeps",
             "THE QUICK FOX jumps"]
    out = {r.doc_id: r for r in
           remove_frequent_spans(_docs(spark, texts), n=3,
                                 max_df=2).collect()}
    assert out[0].clean_text == "runs"
    assert out[1].clean_text == "sleeps"
    assert out[2].clean_text == "jumps"


def test_frequent_spans_census(spark):
    texts = ["a b c x%d" % i for i in range(5)] + ["d e f only once"]
    fs = {r.gram: r.doc_freq for r in
          frequent_spans(_docs(spark, texts), n=3, max_df=3).collect()}
    assert fs == {"a b c": 5}


def test_n_validation(spark):
    with pytest.raises(ValueError):
        remove_frequent_spans(_docs(spark, ["a"]), n=0)
    with pytest.raises(ValueError):
        frequent_spans(_docs(spark, ["a"]), n=0)


def test_row_count_preserved_on_real_table(spark, sf_dir="/root/testdata/sf0.001"):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = remove_frequent_spans(df, n=3, max_df=3)
    assert out.count() == df.count()
    # nothing negative, nothing over the doc length
    bad = (out.join(df.select("doc_id", "n_chars"), "doc_id")
              .filter((F.col("n_removed") < 0)
                      | (F.length("clean_text") > F.col("n_chars") + 1))
              .count())
    assert bad == 0


def test_fuzz_matches_python_model(spark):
    """Seeded random corpora: the Spark result must equal a direct
    python re-implementation of the span semantics (doc-freq census,
    cover union, cut)."""
    import numpy as np

    rng = np.random.default_rng(1234)
    vocab = [f"w{i}" for i in range(12)]
    for trial in range(4):
        n, max_df = [(2, 1), (3, 2), (3, 1), (4, 3)][trial]
        texts = [" ".join(rng.choice(vocab,
                                     size=rng.integers(0, 25)))
                 for _ in range(30)]
        got = {r.doc_id: (r.clean_text, r.n_removed) for r in
               remove_frequent_spans(_docs(spark, texts), n=n,
                                     max_df=max_df).collect()}

        toks = [t.split() if t else [] for t in texts]
        from collections import defaultdict
        docs_of = defaultdict(set)
        for d, ts in enumerate(toks):
            for i in range(len(ts) - n + 1):
                docs_of[tuple(ts[i:i + n])].add(d)
        frequent = {g for g, ds in docs_of.items() if len(ds) > max_df}
        want = {}
        for d, ts in enumerate(toks):
            cov = set()
            for i in range(len(ts) - n + 1):
                if tuple(ts[i:i + n]) in frequent:
                    cov.update(range(i, i + n))
            kept = [t for p, t in enumerate(ts) if p not in cov]
            want[d] = (" ".join(kept), len(ts) - len(kept))
        assert got == want, f"trial {trial}"


def test_line_dedup_cuts_frequent_lines_keeps_bytes(spark):
    """Lines recurring in > max_df docs vanish; survivors keep their
    ORIGINAL bytes (case/spacing) and order; blank lines are
    structure (uncounted, never removed)."""
    from vision_parse_spark.operators.spans import remove_frequent_lines

    boiler = "Subscribe To Our Newsletter"
    docs = [(i, f"unique opening {i}\n  {boiler}  \n\nunique close {i}")
            for i in range(5)]
    docs.append((9, "Totally Unrelated\n\nDocument Nine"))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r.doc_id: r for r in
           remove_frequent_lines(df, max_df=3).collect()}
    assert len(out) == 6
    for i in range(5):
        # boilerplate line (trim-matched despite padding) is gone,
        # blank line and original casing/indent survive
        assert out[i].clean_text == \
            f"unique opening {i}\n\nunique close {i}"
        assert out[i].n_removed_lines == 1
    assert out[9].clean_text == "Totally Unrelated\n\nDocument Nine"
    assert out[9].n_removed_lines == 0


def test_line_dedup_repeated_line_within_one_doc_not_frequent(spark):
    """Doc frequency is DISTINCT docs: a line repeated many times in
    a single document is not corpus boilerplate."""
    from vision_parse_spark.operators.spans import remove_frequent_lines

    df = spark.createDataFrame(
        [(0, "echo\n" * 10 + "tail"), (1, "other text")],
        ["doc_id", "text"])
    out = {r.doc_id: r for r in
           remove_frequent_lines(df, max_df=3).collect()}
    assert out[0].n_removed_lines == 0
    assert out[0].clean_text == "echo\n" * 10 + "tail"


def test_line_dedup_all_lines_removed(spark):
    """A doc made entirely of boilerplate collapses to ''."""
    from vision_parse_spark.operators.spans import remove_frequent_lines

    docs = [(i, f"filler {i}\ncommon header\ncommon footer")
            for i in range(5)]
    docs.append((9, "common header\ncommon footer"))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r.doc_id: r for r in
           remove_frequent_lines(df, max_df=3).collect()}
    assert out[9].clean_text == ""
    assert out[9].n_removed_lines == 2
    assert out[0].clean_text == "filler 0"


def test_dedup_sentences_keep_first(spark):
    from vision_parse_spark.operators.spans import dedup_sentences

    df = spark.createDataFrame(
        [(1, "a b. c d! a b. e?"), (2, "solo"), (3, "")],
        ["doc_id", "text"])
    got = {r.doc_id: r for r in dedup_sentences(df).collect()}
    assert (got[1].n_sentences, got[1].n_unique) == (4, 3)
    assert got[1].dedup_text == "a b c d e"      # order preserved
    assert (got[2].n_sentences, got[2].dedup_text) == (1, "solo")
    assert (got[3].n_sentences, got[3].n_unique) == (0, 0)


def test_dedup_sentences_no_shuffle(spark):
    from vision_parse_spark.operators.spans import dedup_sentences

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (dedup_sentences(docs)._jdf.queryExecution().executedPlan()
            .toString())
    assert "Exchange" not in plan


def test_dedup_sentences_null_text(spark):
    from vision_parse_spark.operators.spans import dedup_sentences

    df = spark.createDataFrame([(1, None)],
                               "doc_id long, text string")
    r = dedup_sentences(df).collect()[0]
    assert (r.n_sentences, r.n_unique, r.dedup_text) == (0, 0, "")
