"""Text-analysis function tests (lang-ID, quality, tokens,
fingerprint) — vectorized pandas implementations."""

import pandas as pd

from vision_parse_spark.functions.text_stats import (
    doc_fingerprint,
    lang_id,
    quality_score,
    token_count,
)


def test_token_count():
    s = pd.Series(["one two three", "", None, "don't stop, it's fine"])
    # apostrophe contractions are single wordpieces: don't / stop / it's / fine
    assert list(token_count(s)) == [3, 0, 0, 4]


def test_quality_score_ranges():
    good = ("The quick brown fox jumps over the lazy dog and it is a fine "
            "day in the forest. " * 3)
    bad = "!!! ??? ### $$$ %%% ^^^"
    s = quality_score(pd.Series([good, bad, ""]))
    assert s.iloc[0] > 0.8
    assert s.iloc[1] < 0.3
    assert s.iloc[2] == 0.0


def test_lang_id():
    s = pd.Series([
        "the cat and the dog of the house is happy",
        "le chat et les chiens des villes",
        "el gato y los perros una casa por la noche",
        "der hund und die katze das ist nicht gut",
        "xyzzy qwerty plugh",
    ])
    assert list(lang_id(s)) == ["en", "fr", "es", "de", "und"]


def test_fingerprint_normalization():
    s = pd.Series(["Hello   World", "hello world", "different text"])
    f = doc_fingerprint(s)
    assert f.iloc[0] == f.iloc[1]  # whitespace/case-insensitive
    assert f.iloc[0] != f.iloc[2]


def test_fingerprint_deterministic():
    s = pd.Series(["stable content"])
    assert doc_fingerprint(s).iloc[0] == doc_fingerprint(s).iloc[0]


def test_top_ngrams_counts_and_tiebreak(spark):
    """Corpus top-k 3-grams: every occurrence counts (not
    distinct-per-doc), ties break on the gram, short docs drop."""
    import pandas as pd

    from vision_parse_spark.operators.corpus_stats import top_ngrams

    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "a b c a b c",      # 'a b c' x2, 'b c a', 'c a b'
            "a b c d",          # 'a b c', 'b c d'
            "z z",              # < 3 tokens -> contributes nothing
            "b c d",            # 'b c d'
        ],
    }))
    rows = top_ngrams(df, n=3, k=3).collect()
    assert [(r.ngram, r.freq) for r in rows] == [
        ("a b c", 3), ("b c d", 2), ("b c a", 1)]


def test_top_ngrams_matches_python_reference(spark):
    """Spark result equals a plain-Python recount on real test data."""
    import re
    from collections import Counter

    from vision_parse_spark.operators.corpus_stats import top_ngrams

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = [(r.ngram, r.freq) for r in top_ngrams(docs, n=3, k=20).collect()]

    counts = Counter()
    for (text,) in docs.select("text").collect():
        toks = re.split(r"[ \t\n\x0b\f\r]+", (text or "").strip().lower())
        if len(toks) >= 3:
            for i in range(len(toks) - 2):
                counts[" ".join(toks[i:i + 3])] += 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert got == want


def test_bm25_matches_python_reference(spark):
    """Spark BM25 equals a plain-Python computation (Robertson idf,
    k1=1.2, b=0.75) on real test data, including the rounded-score +
    id tie-break ordering."""
    import math
    import re
    from collections import Counter

    from vision_parse_spark.operators.corpus_stats import bm25_topk

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    terms = ["vector", "hash", "join"]
    got = [(r.doc_id, r.bm25) for r in bm25_topk(docs, terms, k=10).collect()]

    rows = [(r.doc_id, re.split(r"[ \t\n\x0b\f\r]+",
                                (r.text or "").strip().lower()))
            for r in docs.select("doc_id", "text").collect()]
    rows = [(i, [t for t in toks if t]) for i, toks in rows]
    n = len(rows)
    avgdl = sum(len(t) for _, t in rows) / n
    dfreq = {q: sum(1 for _, t in rows if q in t) for q in terms}
    scores = {}
    for i, toks in rows:
        c = Counter(toks)
        s = 0.0
        for q in terms:
            tf = c.get(q, 0)
            if tf == 0 or dfreq[q] == 0:
                continue
            idf = math.log((n - dfreq[q] + 0.5) / (dfreq[q] + 0.5) + 1.0)
            s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(toks) / avgdl))
        if s > 0:
            scores[i] = round(s, 4)
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == want


def test_build_postings_layout_and_counts(spark):
    """Inverted index: df/ctf stats, doc-id-sorted doc:tf posting
    string, min_df pruning."""
    import pandas as pd

    from vision_parse_spark.operators.corpus_stats import build_postings

    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [5, 2, 9],
        "text": ["cat dog cat", "dog", "cat mouse"],
    }))
    rows = {r.term: r for r in build_postings(df, min_df=1).collect()}
    assert rows["cat"].doc_freq == 2 and rows["cat"].term_freq == 3
    assert rows["cat"].postings == "5:2,9:1"
    assert rows["dog"].postings == "2:1,5:1"
    assert rows["mouse"].doc_freq == 1
    pruned = {r.term for r in build_postings(df, min_df=2).collect()}
    assert pruned == {"cat", "dog"}


def test_build_postings_matches_python_reference(spark):
    import re
    from collections import Counter, defaultdict

    from vision_parse_spark.operators.corpus_stats import build_postings

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {r.term: (r.doc_freq, r.term_freq, r.postings)
           for r in build_postings(docs, min_df=2).collect()}

    tf = defaultdict(Counter)
    for doc_id, text in docs.select("doc_id", "text").collect():
        for t in re.split(r"[ \t\n\x0b\f\r]+", (text or "").strip().lower()):
            if t:
                tf[t][doc_id] += 1
    want = {}
    for term, c in tf.items():
        if len(c) >= 2:
            post = ",".join(f"{d}:{n}" for d, n in sorted(c.items()))
            want[term] = (len(c), sum(c.values()), post)
    assert got == want


def test_unigram_logprob_matches_python_reference(spark):
    """Self-trained add-1 unigram log-likelihood equals a direct
    python computation on real test data (counts, smoothing, mean)."""
    import math
    import re
    from collections import Counter

    from vision_parse_spark.operators.corpus_stats import unigram_logprob

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {r.doc_id: (r.n_tok, r.avg_logprob)
           for r in unigram_logprob(docs).collect()}

    toks = {}
    counts = Counter()
    for doc_id, text in docs.select("doc_id", "text").collect():
        ts = [t for t in re.split(r"[ \t\n\x0b\f\r]+",
                                  (text or "").strip().lower()) if t]
        toks[doc_id] = ts
        counts.update(ts)
    n_total, v = sum(counts.values()), len(counts)
    want = {}
    for doc_id, ts in toks.items():
        if ts:
            lp = sum(math.log((counts[t] + 1.0) / (n_total + 1.0 * v))
                     for t in ts) / len(ts)
            want[doc_id] = (len(ts), round(lp, 4))
    assert set(got) == set(want)
    for k in got:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) <= 1e-4


def test_unigram_logprob_orders_gibberish_below_common(spark):
    """A doc of corpus-frequent words must outscore a doc of hapax
    gibberish; empty docs are absent from the output."""
    import pandas as pd

    from vision_parse_spark.operators.corpus_stats import unigram_logprob

    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["the the the the cat", "zxqv wvnm qqpz hjkl", ""],
    }))
    out = {r.doc_id: r.avg_logprob for r in unigram_logprob(df).collect()}
    assert set(out) == {0, 1}
    assert out[0] > out[1]


def test_perplexity_buckets_rank_cutoffs(spark):
    """head/middle/tail match a direct python replay of the discrete
    rank cutoffs (ceil(n/3) / ceil(2n/3) in score-descending order,
    ties to the better bucket) on real test data."""
    import math
    from collections import Counter

    from vision_parse_spark.operators.corpus_stats import (
        perplexity_buckets, unigram_logprob)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {r.doc_id: r.pp_bucket
           for r in perplexity_buckets(docs).collect()}

    scores = {r.doc_id: r.avg_logprob
              for r in unigram_logprob(docs).collect()}
    assert set(got) == set(scores)
    n = len(scores)
    ordered = sorted(scores.values(), reverse=True)
    c1 = ordered[math.ceil(n / 3) - 1]
    c2 = ordered[math.ceil(2 * n / 3) - 1]
    for d, s in scores.items():
        want = "head" if s >= c1 else ("middle" if s >= c2 else "tail")
        assert got[d] == want, (d, s, c1, c2)
    sizes = Counter(got.values())
    # rank cutoffs keep buckets within tie-slack of n/3 each
    assert sizes["head"] >= math.ceil(n / 3)
    assert sizes["head"] + sizes["middle"] >= math.ceil(2 * n / 3)
    assert sizes["tail"] >= 1


def test_perplexity_buckets_ties_take_better_bucket(spark):
    """All docs sharing the cutoff score land in the better bucket;
    an all-identical corpus is entirely head."""
    import pandas as pd

    from vision_parse_spark.operators.corpus_stats import (
        perplexity_buckets)

    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": list(range(6)),
        "text": ["same words here"] * 6,
    }))
    out = {r.doc_id: r.pp_bucket for r in perplexity_buckets(df).collect()}
    assert set(out.values()) == {"head"}

    # 2 good docs, 4 gibberish: the gibberish shares one score -> the
    # ceil(6/3)=2nd doc descending is still a good doc (c1 = good
    # score), the 4th is gibberish (c2 = gibberish score) -> ALL
    # gibberish is middle, nothing tail
    df2 = spark.createDataFrame(pd.DataFrame({
        "doc_id": list(range(6)),
        "text": ["the cat sat", "the cat sat",
                 "zxqv1 a1", "zxqv2 a2", "zxqv3 a3", "zxqv4 a4"],
    }))
    out2 = {r.doc_id: r.pp_bucket
            for r in perplexity_buckets(df2).collect()}
    assert out2[0] == "head" and out2[1] == "head"
    assert all(out2[d] == "middle" for d in range(2, 6))


def test_bigram_logprob_matches_python_reference(spark):
    """Interpolated bigram log-likelihood equals a direct python
    computation on real test data."""
    import math
    import re
    from collections import Counter

    from vision_parse_spark.operators.corpus_stats import bigram_logprob

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {r.doc_id: (r.n_tok, r.avg_logprob)
           for r in bigram_logprob(docs).collect()}

    toks, uni, big = {}, Counter(), Counter()
    for doc_id, text in docs.select("doc_id", "text").collect():
        ts = [t for t in re.split(r"[ \t\n\x0b\f\r]+",
                                  (text or "").strip().lower()) if t]
        toks[doc_id] = ts
        uni.update(ts)
        big.update(zip(ts, ts[1:]))
    n_total, v = sum(uni.values()), len(uni)
    want = {}
    for doc_id, ts in toks.items():
        if not ts:
            continue
        lps = [math.log((uni[ts[0]] + 1.0) / (n_total + 1.0 * v))]
        for p, w in zip(ts, ts[1:]):
            pu = (uni[w] + 1.0) / (n_total + 1.0 * v)
            lps.append(math.log(0.75 * big[(p, w)] / uni[p] + 0.25 * pu))
        want[doc_id] = (len(ts), round(sum(lps) / len(lps), 4))
    assert set(got) == set(want)
    for k in got:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) <= 1e-4


def test_bigram_logprob_catches_order_stuffing(spark):
    """Word-order stuffing that a unigram model cannot see: a doc of
    corpus-frequent words in never-seen order scores clearly below a
    natural doc under the bigram model, while the unigram model
    scores them nearly identically."""
    import pandas as pd

    from vision_parse_spark.operators.corpus_stats import (
        bigram_logprob, unigram_logprob)

    natural = "the cat sat on the mat"
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [natural, natural, natural,
                 "mat the on sat cat the"],  # same bag, alien order
    }))
    bi = {r.doc_id: r.avg_logprob for r in bigram_logprob(df).collect()}
    un = {r.doc_id: r.avg_logprob for r in unigram_logprob(df).collect()}
    assert abs(un[0] - un[3]) < 0.01       # unigram: same bag, same score
    assert bi[0] - bi[3] > 0.5             # bigram: alien order collapses


def test_vocab_growth_hand_corpus(spark):
    from vision_parse_spark.operators.corpus_stats import vocab_growth

    d = spark.createDataFrame(
        [("A", "a b"), ("A", "b c"), ("B", "c d"), ("C", "   ")],
        "source string, text string")
    rows = {r.source: (r.new_types, r.cum_vocab)
            for r in vocab_growth(d).collect()}
    # every type credits its lexicographically FIRST source
    assert rows == {"A": (3, 3), "B": (1, 4)}
    # n=2: bigram types "a b", "b c" (A), "c d" (B); short/empty
    # docs (< n tokens) contribute nothing
    rows2 = {r.source: (r.new_types, r.cum_vocab)
             for r in vocab_growth(d, n=2).collect()}
    assert rows2 == {"A": (2, 2), "B": (1, 3)}
    import pytest as _pt
    with _pt.raises(ValueError, match="n must be"):
        vocab_growth(d, n=0)


def test_vocab_growth_partition_invariance(spark):
    from vision_parse_spark.operators.corpus_stats import vocab_growth

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(map(tuple, vocab_growth(d.coalesce(1)).collect()))
    b = sorted(map(tuple, vocab_growth(d.repartition(13)).collect()))
    assert a == b


def test_keyword_extract_distinctive_terms_win(spark):
    from vision_parse_spark.operators.corpus_stats import keyword_extract

    d = spark.createDataFrame(
        [(0, "common common quantum quantum quantum"),
         (1, "common common common"),
         (2, "common plasma")],
        "doc_id long, text string")
    out = keyword_extract(d, k=2).collect()
    top = {r.doc_id: [x.term for x in sorted(
        [q for q in out if q.doc_id == r.doc_id],
        key=lambda q: q.rank)] for r in out}
    # 'common' appears in every doc -> ln(N/df)=0 -> never beats a
    # distinctive term; ties rank by term asc
    assert top[0][0] == "quantum"
    assert top[2][0] == "plasma"
    import pytest as _pt
    with _pt.raises(ValueError, match="k must be"):
        keyword_extract(d, k=0)
    with _pt.raises(ValueError, match="empty corpus"):
        keyword_extract(d.filter("doc_id < 0"))


def test_keyword_extract_partition_invariance(spark):
    from vision_parse_spark.operators.corpus_stats import keyword_extract

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(map(tuple, keyword_extract(d.coalesce(1)).collect()))
    b = sorted(map(tuple, keyword_extract(d.repartition(13)).collect()))
    assert a == b


def test_lexical_diversity_hand_values(spark):
    from vision_parse_spark.functions.text_stats import (
        lexical_diversity)

    d = spark.createDataFrame(
        [(0, "a b a c"), (1, "x x x"), (2, ""), (3, None)],
        "doc_id long, text string")
    got = {r.doc_id: r for r in lexical_diversity(d).collect()}
    r0 = got[0]   # types {a,b,c}; hapax {b,c}
    assert (r0.n_tokens, r0.n_types, r0.n_hapax) == (4, 3, 2)
    assert r0.ttr == 0.75 and r0.hapax_ratio == 0.5
    assert (got[1].n_types, got[1].n_hapax) == (1, 0)
    for i in (2, 3):   # empty and NULL: zero counts, NULL ratios
        assert (got[i].n_tokens, got[i].ttr) == (0, None)


def test_lexical_diversity_no_shuffle(spark):
    from vision_parse_spark.functions.text_stats import (
        lexical_diversity)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (lexical_diversity(docs)._jdf.queryExecution()
            .executedPlan().toString())
    assert "Exchange" not in plan


def test_source_divergence_hand_kl(spark):
    import math

    from vision_parse_spark.operators.corpus_stats import (
        source_divergence)

    # corpus: A = "a a b", B = "a b b"; top_k=2 covers the full
    # vocab so the 'other' bucket is empty and KL is the exact
    # two-term divergence vs the uniform corpus (3 a, 3 b)
    d = spark.createDataFrame([("A", "a a b"), ("B", "a b b")],
                              "source string, text string")
    got = {r.source: r for r in
           source_divergence(d, top_k=2).collect()}
    exp = round((2 / 3) * math.log((2 / 3) / 0.5)
                + (1 / 3) * math.log((1 / 3) / 0.5), 6)
    assert got["A"].n_tokens == 3
    assert got["A"].kl_vs_corpus == exp
    assert got["B"].kl_vs_corpus == exp      # symmetric construction
    import pytest as _pt
    with _pt.raises(ValueError, match="top_k"):
        source_divergence(d, top_k=0)
    with _pt.raises(ValueError, match="empty corpus"):
        source_divergence(d.filter("source = 'zzz'"))


def test_source_divergence_identical_source_is_zero(spark):
    from vision_parse_spark.operators.corpus_stats import (
        source_divergence)

    # one source == the corpus -> KL exactly 0
    d = spark.createDataFrame([("X", "p q r p")],
                              "source string, text string")
    r = source_divergence(d, top_k=3).collect()[0]
    assert r.kl_vs_corpus == 0.0
