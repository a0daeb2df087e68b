"""Token-bounded document chunking with overlap — the standard
training-data windowing op (context-length packing).

Catalyst-native: tokenize with ``split``, build chunk windows with
``sequence``/``slice``/``concat_ws``, explode to one row per chunk.
No UDF, whole plan stays JVM-side; the explode is a narrow Generate
(no shuffle), so it scales with scan splits like the extraction stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """One row per chunk: (id, chunk_idx, chunk_text, n_tokens).

    Windows start every ``max_tokens - overlap`` tokens; the final
    window may be short.  Empty/whitespace docs yield one empty chunk
    (row preserved, P1 ethos)."""
    if not 0 <= overlap < max_tokens:
        raise ValueError(f"need 0 <= overlap < max_tokens, got {overlap}, {max_tokens}")
    stride = max_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    # number of chunks = 1 + ceil(max(n - max_tokens, 0) / stride)
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(n - F.lit(max_tokens), F.lit(0)) / F.lit(stride)
    ).cast("int")
    chunks = F.expr(
        f"transform(sequence(0, _n_chunks - 1), "
        f"i -> concat_ws(' ', slice(_toks, i * {stride} + 1, {max_tokens})))"
    )
    out = (
        df.withColumn("_toks", toks)
        .withColumn("_n_chunks", n_chunks)
        .withColumn("_chunks", chunks)
        .select(
            id_col,
            F.posexplode("_chunks").alias("chunk_idx", "chunk_text"),
        )
    )
    return out.withColumn(
        "n_tokens",
        F.when(F.length("chunk_text") == 0, F.lit(0)).otherwise(
            F.size(F.split("chunk_text", " "))
        ).cast("int"),
    )


def pack_contexts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    capacity: int = 2048,
) -> DataFrame:
    """Sequence packing (concatenate-and-cut): assign each document a
    position in a virtual token stream ordered by ``id_col``, then cut
    the stream into ``capacity``-token contexts — the standard
    pretraining packing where documents may straddle a boundary.

    Returns (id, n_tokens, bin_id, bin_offset): the context the doc
    STARTS in and its offset there.  One window cumsum (a single
    range-partitioned exchange at scale); deterministic given the id
    order, so the layout is reproducible across runs and engines.
    """
    toks = F.expr(
        f"size(filter(split(trim({text_col}), '\\\\s+'), x -> x != ''))"
    )
    from pyspark.sql import Window

    w = Window.orderBy(id_col).rowsBetween(Window.unboundedPreceding, -1)
    base = df.select(id_col, toks.alias("n_tokens"))
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return base.select(
        id_col, "n_tokens",
        F.floor(start / capacity).cast("long").alias("bin_id"),
        F.pmod(start, F.lit(capacity)).cast("long").alias("bin_offset"),
    )
