"""Unicode normalization — the text-canonicalization step every
training-data pipeline runs before hashing/dedup/tokenization.

Not in the reference (its corpus is markdown it just generated);
normalization is load-bearing in any multi-source corpus: the same
visible text arrives as composed (U+00E9) or decomposed
(U+0065 U+0301) codepoints depending on the producer, and every
md5/minhash/shingle downstream treats those as different documents
unless canonicalized first.

Scale shape: a per-row narrow map — zero shuffle, embarrassingly
parallel.  Spark has no built-in Unicode-normalize expression, so
this is one of the legitimate Pandas-UDF cases (Arrow batches,
``str.normalize`` vectorized in pandas, never per-row Python).
The DuckDB oracle replays NFC via its built-in ``nfc_normalize``
(both sides implement Unicode canonical composition, UAX #15).
"""

from __future__ import annotations

import pandas as pd

_FORMS = ("NFC", "NFD", "NFKC", "NFKD")


def normalize_series(s: pd.Series, form: str = "NFC") -> pd.Series:
    """Vectorized Unicode normalization of a string series; NULLs
    pass through."""
    if form not in _FORMS:
        raise ValueError(f"normalize_series: form {form!r} not in "
                         f"{_FORMS}")
    return s.str.normalize(form)


def normalize_text(df, col: str, form: str = "NFC",
                   out_col: str | None = None):
    """``df`` with ``out_col`` (default ``<col>_nfc`` etc.) holding
    the Unicode-normalized text.  Narrow Arrow-batched map — no
    shuffle, no per-row Python."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    if form not in _FORMS:
        raise ValueError(f"normalize_text: form {form!r} not in "
                         f"{_FORMS}")
    out = out_col or f"{col}_{form.lower()}"

    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        return normalize_series(s, form)

    return df.withColumn(out, _norm(F.col(col)))
