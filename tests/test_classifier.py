"""Linear quality classifier vs a direct numpy model."""

import hashlib
import re
from collections import Counter

import numpy as np
import pytest


def _grams(text):
    t = [x for x in re.split(r"[ \t\n\x0b\f\r]+",
                             (text or "").strip().lower()) if x]
    return t + [f"{a} {b}" for a, b in zip(t, t[1:])]


def _buckets(text, b):
    s = sorted({int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % b
                for g in _grams(text)})
    return np.array(s, dtype=np.int64) if s else None


def _train_py(raw, tgt, b=512, iters=8, lr=0.125):
    feats, ys = [], []
    for texts, y in ((raw, 0), (tgt, 1)):
        for t in texts:
            bk = _buckets(t, b)
            if bk is not None:
                feats.append(bk)
                ys.append(y)
    w = np.zeros(b)
    bias = 0.0
    n_docs = len(feats)
    for _ in range(iters):
        g = np.zeros(b)
        gb = 0.0
        for bk, y in zip(feats, ys):
            z = bias + w[bk].sum()
            r = 1.0 / (1.0 + np.exp(-z)) - y
            np.add.at(g, bk, r)
            gb += r
        w -= lr * g / n_docs
        bias -= lr * gb / n_docs
    return w, bias


def test_classifier_matches_python_model_on_real_docs(spark):
    from vision_parse_spark.operators.classifier import (
        quality_classifier_fit, quality_classifier_score)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # content-keyed split: docs containing ' spark ' are the target
    tgt = docs.filter("concat(' ', text, ' ') LIKE '% spark %'")
    raw = docs.filter("concat(' ', text, ' ') NOT LIKE '% spark %'")
    w, b = quality_classifier_fit(raw, tgt)

    rows = docs.select("doc_id", "text").collect()
    is_t = {r.doc_id: f" spark " in f" {r.text} " for r in rows}
    pw, pb = _train_py([r.text for r in rows if not is_t[r.doc_id]],
                       [r.text for r in rows if is_t[r.doc_id]])
    assert abs(b - pb) < 1e-9
    assert np.max(np.abs(w - pw)) < 1e-9

    got = {r.doc_id: (r.score, r.quality_keep)
           for r in quality_classifier_score(docs, w, b,
                                             keep_threshold=0.75)
           .collect()}
    t_scores, r_scores = [], []
    for r in rows:
        bk = _buckets(r.text, 512)
        if bk is None:
            assert r.doc_id not in got
            continue
        z = pb + pw[bk].sum()
        want = round(1.0 / (1.0 + np.exp(-z)), 4)
        assert abs(got[r.doc_id][0] - want) <= 1e-4
        (t_scores if is_t[r.doc_id] else r_scores).append(want)
    # the model genuinely learned the content split
    assert np.median(t_scores) - np.median(r_scores) > 0.05


def test_classifier_separates_populations(spark):
    """Disjoint vocabularies separate completely."""
    from vision_parse_spark.operators.classifier import quality_classifier

    tgt = spark.createDataFrame(
        [(i, "careful encyclopedic prose with citations and structure")
         for i in range(40)], ["doc_id", "text"])
    raw = spark.createDataFrame(
        [(100 + i, "click here buy now free spam casino winner prize")
         for i in range(40)], ["doc_id", "text"])
    out = {r.doc_id: r for r in quality_classifier(
        raw, tgt, score_df=raw.unionByName(tgt)).collect()}
    t_scores = [out[i].score for i in range(40)]
    r_scores = [out[100 + i].score for i in range(40)]
    assert min(t_scores) - max(r_scores) > 0.1
    assert all(out[i].quality_keep for i in range(40))
    assert not any(out[100 + i].quality_keep for i in range(40))


def test_classifier_validation(spark):
    from vision_parse_spark.operators.classifier import (
        quality_classifier_fit)

    df = spark.createDataFrame([(0, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="n_buckets"):
        quality_classifier_fit(df, df, n_buckets=1)
    with pytest.raises(ValueError, match="iters"):
        quality_classifier_fit(df, df, iters=0)
    empty = spark.createDataFrame([(0, "   ")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="zero grams"):
        quality_classifier_fit(empty, empty)
