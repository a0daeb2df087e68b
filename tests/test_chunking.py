"""Token-bounded chunking operator tests."""

import pytest

from vision_parse_spark.operators.chunking import chunk_documents


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(150))),
            (2, "short doc here"),
            (3, ""),
            (4, " ".join(f"x{i}" for i in range(64))),  # exactly one window
        ],
        ["doc_id", "text"],
    )


def test_chunk_windows_and_overlap(spark, docs):
    out = {(r.doc_id, r.chunk_idx): r
           for r in chunk_documents(docs, max_tokens=64, overlap=8).collect()}
    # 150 tokens -> chunks at 0, 56, 112
    assert out[(1, 0)].n_tokens == 64
    assert out[(1, 0)].chunk_text.startswith("w0 ") and out[(1, 0)].chunk_text.endswith(" w63")
    assert out[(1, 1)].chunk_text.startswith("w56 ")  # 8-token overlap
    assert out[(1, 2)].n_tokens == 150 - 112
    assert (1, 3) not in out


def test_short_and_exact_docs_single_chunk(spark, docs):
    out = chunk_documents(docs, max_tokens=64, overlap=8)
    counts = {r.doc_id: r.n for r in out.groupBy("doc_id").count()
              .withColumnRenamed("count", "n").collect()}
    assert counts[2] == 1 and counts[4] == 1


def test_empty_doc_row_kept(spark, docs):
    out = chunk_documents(docs).filter("doc_id = 3").collect()
    assert len(out) == 1
    assert out[0].chunk_text == "" and out[0].n_tokens == 0


def test_invalid_overlap_rejected(spark, docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, max_tokens=32, overlap=32)


def test_plan_is_narrow(spark, docs):
    plan = chunk_documents(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # Generate only, no shuffle


def test_pack_contexts_layout(spark):
    """Docs of 30/50/40/100 tokens at capacity 64: the virtual stream
    cuts reproduce exactly (doc 2 straddles the first boundary)."""
    from vision_parse_spark.operators.chunking import pack_contexts

    docs = [(1, "w " * 30), (2, "x " * 50), (3, "y " * 40),
            (4, "z " * 100)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r.doc_id: (r.n_tokens, r.bin_id, r.bin_offset)
           for r in pack_contexts(df, capacity=64).collect()}
    assert got == {
        1: (30, 0, 0),    # starts stream
        2: (50, 0, 30),   # starts in bin 0, straddles into bin 1
        3: (40, 1, 16),   # 80 % 64
        4: (100, 1, 56),  # 120 % 64
    }


def test_pack_contexts_deterministic_across_partitionings(spark):
    from vision_parse_spark.operators.chunking import pack_contexts

    df = spark.range(500).selectExpr(
        "id as doc_id", "repeat('t ', cast(id % 37 + 1 as int)) as text")
    a = {tuple(r) for r in pack_contexts(df.repartition(3)).collect()}
    b = {tuple(r) for r in pack_contexts(df.repartition(11)).collect()}
    assert a == b
