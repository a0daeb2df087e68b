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
