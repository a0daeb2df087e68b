"""Physical-plan shape regression tests — the would-this-survive-100x
properties asserted in CI, not just in the BENCH/PLANS.md audit doc:

* extraction is narrow (zero Exchange): parallelism = input splits;
* filters/pruning reach the parquet scan;
* dimension joins broadcast (no fact-side shuffle);
* salted aggregation has exactly its two hash Exchanges;
* bucketed LSH paths never degenerate into cartesian products.
"""

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from vision_parse_spark import ExtractConfig, extract
from vision_parse_spark.operators.aggregate import conv_stats_salted
from vision_parse_spark.operators.chunking import chunk_documents
from vision_parse_spark.operators.similarity import embedding_near_dups
from vision_parse_spark.synth import synth_transcripts_spark

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def n_shuffles(plan: str) -> int:
    """Count SHUFFLE exchanges (broadcast exchanges don't move the
    fact side and don't count)."""
    import re

    return len(re.findall(r"^\(\d+\) Exchange$", plan, re.M))


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_extract_stage_is_narrow(spark, tmp_path_factory):
    """The flagship stage must stay shuffle-free: scan -> (projection)
    -> MapInPandas.  An Exchange creeping in here turns a
    linearly-scaling stage into a shuffle bottleneck at 10^12 turns."""
    path = str(tmp_path_factory.mktemp("plan") / "t.parquet")
    synth_transcripts_spark(spark, 500, partitions=4) \
        .write.mode("overwrite").parquet(path)
    out = extract(spark.read.parquet(path), ExtractConfig(image_mode="url"))
    p = plan_of(out)
    assert "Exchange" not in p
    assert "MapInPandas" in p


def test_extract_prunes_input_columns(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("plan") / "t.parquet")
    synth_transcripts_spark(spark, 200, partitions=2) \
        .withColumn("payload_blob", F.repeat(F.lit("x"), 64)) \
        .write.mode("overwrite").parquet(path)
    out = extract(spark.read.parquet(path), ExtractConfig())
    p = plan_of(out)
    # the extra fat column must not be read from parquet
    assert "payload_blob" not in p.split("ReadSchema")[1].split("\n")[0]


def test_filter_pushdown_and_column_pruning(docs):
    pushed = (
        docs.filter(F.col("lang") == "en")
        .filter(F.col("n_chars") > 100)
        .select("doc_id", "text")
    )
    p = plan_of(pushed)
    assert "PushedFilters: [" in p
    assert "IsNotNull(lang)" in p or "EqualTo(lang,en)" in p
    read_schema = p.split("ReadSchema")[1].split("\n")[0]
    assert "text" in read_schema and "source" not in read_schema


def test_dimension_join_broadcasts(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    customer = spark.read.parquet(f"{SF}/customer.parquet")
    joined = (
        orders.join(F.broadcast(customer),
                    orders.o_custkey == customer.c_custkey)
        .groupBy("c_custkey").agg(F.count(F.lit(1)).alias("n"))
    )
    p = plan_of(joined)
    assert "BroadcastHashJoin" in p
    # the only shuffle is the final aggregation's, never the fact scan
    assert n_shuffles(p) == 1


def test_salted_agg_exactly_two_exchanges(docs):
    p = plan_of(conv_stats_salted(docs, group_col="source",
                                  length_col="text"))
    assert n_shuffles(p) == 2
    # deterministic salt: replay-stable under task retry (ADVICE r1)
    assert "monotonically_increasing_id" not in p


def test_chunking_is_narrow(docs):
    p = plan_of(chunk_documents(docs.select("doc_id", "text")))
    assert "Exchange" not in p
    # round 7: chunk windows come from one Arrow kernel (row-count
    # changing -> MapInPandas), replacing the interpreted
    # transform/slice + posexplode; the stage stays shuffle-free
    assert "MapInPandas" in p


def test_pack_contexts_no_single_partition_exchange(docs):
    """The global cumsum must be a distributed two-phase prefix sum —
    an unpartitioned window would shuffle the whole corpus through ONE
    task (`Exchange SinglePartition`, the round-3 verdict's verified
    scale-killer)."""
    from vision_parse_spark.operators.chunking import pack_contexts

    out = pack_contexts(docs.select("doc_id", "text"))
    p = plan_of(out)
    assert "SinglePartition" not in p
    assert "MapInPandas" in p  # pass B: per-partition Arrow cumsum
    assert "Window" not in p


def test_lsh_near_dup_join_is_not_cartesian(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    p = plan_of(embedding_near_dups(emb, dim=64, threshold=0.3, n_planes=4))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_top_ngrams_uses_bounded_topk_not_global_sort(docs):
    """top_ngrams' k rows must come from TakeOrderedAndProject (per-
    partition bounded heap) — a global Sort of the distinct-ngram set
    would be the 100x scale-killer."""
    from vision_parse_spark.operators.corpus_stats import top_ngrams

    plan = plan_of(top_ngrams(docs, n=3, k=50))
    assert "TakeOrderedAndProject" in plan
    # partial aggregation must combine map-side before the shuffle
    assert plan.count("HashAggregate") >= 2


def test_bm25_broadcasts_stats_and_bounds_topk(docs):
    """bm25_topk: document-frequency and corpus-stat sides broadcast
    (no fact-side shuffle for the joins) and the final k rows come
    from TakeOrderedAndProject, not a global Sort."""
    from vision_parse_spark.operators.corpus_stats import bm25_topk

    plan = plan_of(bm25_topk(docs, ["vector", "hash"], k=10))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_span_dedup_stays_jvm_side_and_broadcasts_cover(spark):
    """remove_frequent_spans: no Python in the plan (the cut is a
    codegen'd higher-order filter), no sort-merge join (frequent set
    and cover side broadcast), and the only SHUFFLE exchanges belong
    to the doc-frequency distinct agg + the per-doc cover re-agg."""
    from vision_parse_spark.operators.spans import remove_frequent_spans

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = plan_of(remove_frequent_spans(docs, n=3, max_df=3))
    assert "Python" not in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert n_shuffles(plan) <= 6


def test_semdedup_confines_pairs_to_cells(spark):
    """semdedup: the within-cell self-join must be an equi-join on
    the cluster id — never a cartesian product — and the final
    survivor step a broadcast-able anti-join."""
    from vision_parse_spark.operators.clustering import semdedup

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = plan_of(semdedup(emb, k=4, iters=1, threshold=0.3))
    assert "CartesianProduct" not in plan
    assert "LeftAnti" in plan


def test_regional_revenue_star_join_shape(spark):
    """TPC-H Q5 shape: 4 dimension joins broadcast; the only
    shuffles are the lineitem x orders fact join + the final agg."""
    import __spark_entry__ as em

    import re

    df = em.queries()["regional_revenue"](spark, SF)
    p = plan_of(df)
    # >= 4 broadcast joins (the explicit dims; the planner may also
    # broadcast the orders side of the fact join at this tiny SF)
    bhj = len(re.findall(r"^\(\d+\) BroadcastHashJoin$", p, re.M))
    assert bhj >= 4
    # shuffles: at most the fact-fact join's two + the group-by's one
    assert n_shuffles(p) <= 3
    # no cartesian anywhere in the star
    assert "CartesianProduct" not in p
