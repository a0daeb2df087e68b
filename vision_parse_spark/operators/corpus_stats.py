"""Corpus-level n-gram statistics for training-data pipelines.

Not present in the reference (it has no corpus-level ops): vocabulary
and n-gram frequency profiles drive contamination analysis, filter
threshold tuning and tokenizer audits over a training corpus.

Scale design (100 TB): the plan is
``scan -> Generate(explode) -> partial hash agg (map-side combine) ->
one shuffle on the ngram -> final agg -> TakeOrderedAndProject`` —
Spark's global top-k runs a per-partition bounded heap and merges k
rows per partition on the driver, so no global sort of the distinct
n-gram set ever happens (asserted in tests/test_plan_shapes.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def top_ngrams(df: DataFrame, text_col: str = "text", n: int = 3,
               k: int = 50) -> DataFrame:
    """Top-``k`` word ``n``-grams by corpus frequency (every
    occurrence counts — NOT distinct-per-doc), deterministic
    tie-break on the gram itself.  Tokenization matches the shingle
    recipe used across the dedup family (lower/trim/split ``\\s+``),
    so the DuckDB oracle replays it exactly."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    grams = F.expr(
        f"transform(sequence(0, size(_toks) - {n}), "
        f"i -> concat_ws(' ', slice(_toks, i + 1, {n})))"
    )
    return (
        df.select(toks.alias("_toks"))
        .filter(F.size("_toks") >= n)
        .select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("ngram"))
        .limit(k)
    )
