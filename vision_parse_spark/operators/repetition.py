"""Repetition filters — the Gopher/RefinedWeb-style curation signals.

Web-scale corpora are polluted by documents that repeat themselves
(boilerplate line spam, keyword stuffing, template loops); standard
curation drops documents whose duplicate-line fraction or top-n-gram
fraction exceeds a threshold.  Both signals here are PURE relational
expressions:

* ``dup_line_frac`` — 1 - distinct/total over the line split, a
  narrow Catalyst expression (no shuffle, no UDF);
* ``top_bigram_frac`` — the most frequent bigram's share of all
  bigrams, via explode -> per-(doc, bigram) count -> per-doc max —
  two hash aggregations that combine map-side, so the hot-doc skew a
  pathological repeater creates collapses before the shuffle.

Integer-counting throughout; the only floats are final int/int
divisions rounded to 6, so the DuckDB oracle replays exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document repetition signals: (id, n_lines, dup_line_frac,
    n_bigrams, top_bigram_frac)."""
    from vision_parse_spark.functions.text_stats import word_ngrams_udf

    lines = F.expr(
        f"filter(transform(split({text_col}, '\\n'), x -> trim(x)),"
        f" x -> x != '')"
    )
    # bigram generation through the Arrow kernel (string-identical to
    # the interpreted Catalyst slice lambda it replaces; docs with < 2
    # tokens yield an empty array either way)
    with_lines = df.select(
        id_col,
        lines.alias("_lines"),
        word_ngrams_udf(2)(F.col(text_col)).alias("_bigrams"),
    ).select(
        id_col,
        F.size("_lines").alias("n_lines"),
        F.when(F.size("_lines") > 0,
               F.round(1 - F.size(F.array_distinct("_lines"))
                       / F.size("_lines"), 6))
        .otherwise(F.lit(0.0)).alias("dup_line_frac"),
        "_bigrams",
    )
    exploded = with_lines.select(
        id_col, F.explode_outer("_bigrams").alias("_bg"))
    per_gram = (
        exploded.filter(F.col("_bg").isNotNull())
        .groupBy(id_col, "_bg")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    per_doc = per_gram.groupBy(id_col).agg(
        F.max("_c").alias("_top"),
        F.sum("_c").alias("n_bigrams"),
    )
    return (
        with_lines.select(id_col, "n_lines", "dup_line_frac")
        .join(per_doc, id_col, "left")
        .select(
            id_col, "n_lines", "dup_line_frac",
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            F.when(F.col("n_bigrams") > 0,
                   F.round(F.col("_top") / F.col("n_bigrams"), 6))
            .otherwise(F.lit(0.0)).alias("top_bigram_frac"),
        )
    )


def repetition_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dup_line_frac: float = 0.3,
    max_top_bigram_frac: float = 0.2,
) -> DataFrame:
    """Drop documents whose repetition signals exceed the thresholds
    (Gopher-rule shape); returns the surviving rows of ``df``."""
    stats = repetition_stats(df, id_col, text_col)
    keep = stats.filter(
        (F.col("dup_line_frac") <= max_dup_line_frac)
        & (F.col("top_bigram_frac") <= max_top_bigram_frac)
    ).select(id_col)
    return df.join(keep, id_col, "left_semi")
