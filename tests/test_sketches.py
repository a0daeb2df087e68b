"""Sketches (operators/sketches.py) + funnel (operators/temporal.py).

HLL: accuracy band vs exact, linear-counting regime, cross-partition
merge invariance (the associativity that makes it the 100 TB
distinct-count), validation.  CMS: one-sided overestimate, exactness
when w >> vocab, validation.  Funnel: hand-built stage semantics
(strictly-after gating, out-of-order events, stalls, NULL ts).
"""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from vision_parse_spark.operators.sketches import cms_counts, hll_distinct
from vision_parse_spark.operators.temporal import funnel


def test_hll_accuracy_band(spark):
    # 20_000 distinct values, p=12 -> expected rel err ~1.04/64 = 1.6%
    df = spark.range(20_000).select(
        F.concat(F.lit("v"), F.col("id")).alias("v"))
    est = hll_distinct(df, "v", p=12).collect()[0]["hll_est"]
    assert abs(est - 20_000) / 20_000 < 0.05


def test_hll_duplicates_ignored_and_linear_counting(spark):
    # 300 distinct values repeated 50x each: small-range correction
    # regime (E <= 2.5m), estimate must be near-exact and unchanged
    # by duplication
    base = spark.range(300).select(
        F.concat(F.lit("d"), F.col("id")).alias("v"))
    dup = base.crossJoin(spark.range(50)).select("v")
    e1 = hll_distinct(base, "v", p=12).collect()[0]["hll_est"]
    e2 = hll_distinct(dup, "v", p=12).collect()[0]["hll_est"]
    assert e1 == e2
    assert abs(e1 - 300) / 300 < 0.05


def test_hll_partition_invariance(spark):
    # register build is an associative max -> the estimate cannot
    # depend on how rows are split across partitions
    df = spark.range(5_000).select(
        F.concat(F.lit("p"), F.col("id")).alias("v"))
    e1 = hll_distinct(df.coalesce(1), "v").collect()[0]["hll_est"]
    e2 = hll_distinct(df.repartition(17), "v").collect()[0]["hll_est"]
    assert e1 == e2


def test_hll_groups(spark):
    df = spark.createDataFrame(
        [("a", f"x{i}") for i in range(100)]
        + [("b", f"x{i}") for i in range(10)],
        "g string, v string")
    out = {r.g: r.hll_est for r in
           hll_distinct(df, "v", ["g"], p=12).collect()}
    assert abs(out["a"] - 100) / 100 < 0.1
    assert abs(out["b"] - 10) / 10 < 0.1


def test_hll_validation(spark):
    df = spark.range(1).select(F.col("id").cast("string").alias("v"))
    with pytest.raises(ValueError, match="p must be"):
        hll_distinct(df, "v", p=3)


def test_cms_one_sided_and_exact_when_wide(spark):
    # 50-token vocab, w=2048 -> collisions are possible but the
    # estimate is NEVER below exact, and the heavy hitter (no other
    # token shares all 4 of its buckets at this vocab size) is exact
    rows = [("heavy",)] * 500 + [(f"t{i}",) for i in range(50)]
    items = spark.createDataFrame(rows, "tok string")
    probes = items.select("tok").distinct()
    exact = {r.tok: r.cnt for r in
             items.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
                  .collect()}
    est = {r.tok: r.cms_est for r in
           cms_counts(items, "tok", probes, "tok", d=4, w=2048)
           .collect()}
    assert set(est) == set(exact)
    assert all(est[t] >= exact[t] for t in exact)
    assert est["heavy"] == 500


def test_cms_unseen_probe_is_zero_or_collision(spark):
    items = spark.createDataFrame([("a",), ("b",)], "tok string")
    probes = spark.createDataFrame([("zz",)], "tok string")
    [r] = cms_counts(items, "tok", probes, "tok", d=4, w=4096).collect()
    assert 0 <= r.cms_est <= 2


def test_cms_validation(spark):
    df = spark.createDataFrame([("a",)], "tok string")
    with pytest.raises(ValueError, match="d >= 1"):
        cms_counts(df, "tok", df, "tok", d=0)


def _events(spark, rows):
    # rows: (user, second_or_None, type)
    return spark.createDataFrame(
        [(u, datetime(2024, 1, 1, 0, 0, s) if s is not None else None,
          t) for u, s, t in rows],
        "user_id long, ts timestamp, event_type string")


def test_funnel_stage_semantics(spark):
    ev = _events(spark, [
        # user 1: full funnel in order
        (1, 1, "signup"), (1, 5, "click"), (1, 9, "purchase"),
        # user 2: click BEFORE signup does not count; purchase with
        # no qualifying click does not count
        (2, 10, "click"), (2, 20, "signup"), (2, 30, "purchase"),
        # user 3: signup only
        (3, 2, "signup"),
        # user 4: never signs up -> reaches nothing
        (4, 1, "click"), (4, 2, "purchase"),
    ])
    out = {r.user_id: r for r in
           funnel(ev, ["signup", "click", "purchase"]).collect()}
    assert out[1].stage_reached == 3
    assert out[1].purchase_us > out[1].click_us > out[1].signup_us
    assert out[2].stage_reached == 1 and out[2].click_us is None
    assert out[3].stage_reached == 1
    assert out[4].stage_reached == 0 and out[4].signup_us is None
    assert len(out) == 4  # every user appears


def test_funnel_earliest_qualifying_anchor(spark):
    # two clicks after signup: the EARLIEST anchors; a purchase
    # between them still qualifies (it is after the earliest click)
    ev = _events(spark, [
        (7, 1, "signup"), (7, 3, "click"), (7, 4, "purchase"),
        (7, 8, "click"),
    ])
    [r] = funnel(ev, ["signup", "click", "purchase"]).collect()
    assert r.click_us == out_us(3) and r.purchase_us == out_us(4)
    assert r.stage_reached == 3


def out_us(second: int) -> int:
    import calendar

    return calendar.timegm(
        datetime(2024, 1, 1, 0, 0, second).timetuple()) * 1_000_000


def test_funnel_equal_ts_not_after(spark):
    # strictly-after: a click at the SAME microsecond as signup does
    # not qualify
    ev = _events(spark, [(5, 1, "signup"), (5, 1, "click")])
    [r] = funnel(ev, ["signup", "click"]).collect()
    assert r.stage_reached == 1 and r.click_us is None


def test_funnel_null_ts_ignored(spark):
    ev = _events(spark, [(6, None, "signup"), (6, 2, "signup"),
                         (6, 4, "click")])
    [r] = funnel(ev, ["signup", "click"]).collect()
    assert r.signup_us == out_us(2) and r.stage_reached == 2


def test_funnel_validation(spark):
    ev = _events(spark, [(1, 1, "signup")])
    with pytest.raises(ValueError, match="at least one"):
        funnel(ev, [])
    with pytest.raises(ValueError, match="duplicate"):
        funnel(ev, ["a", "a"])


def test_funnel_single_shuffle_plan(spark):
    # the k window stages + final collapse must share ONE Exchange
    ev = _events(spark, [(1, 1, "signup"), (1, 2, "click")])
    plan = funnel(ev, ["signup", "click", "purchase"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_bloom_no_false_negatives(spark):
    from vision_parse_spark.operators.sketches import (
        bloom_build, bloom_probe)

    items = spark.createDataFrame(
        [(f"w{i}",) for i in range(1000)], "tok string")
    bloom = bloom_build(items, "tok", m_bits=65536, k=4)
    out = bloom_probe(items.distinct(), bloom, "tok",
                      m_bits=65536, k=4).collect()
    assert len(out) == 1000
    assert all(r.maybe_present for r in out)  # one-sided guarantee


def test_bloom_unseen_mostly_absent(spark):
    from vision_parse_spark.operators.sketches import (
        bloom_build, bloom_probe)

    items = spark.createDataFrame(
        [(f"w{i}",) for i in range(100)], "tok string")
    probes = spark.createDataFrame(
        [(f"absent{i}",) for i in range(100)], "tok string")
    bloom = bloom_build(items, "tok", m_bits=65536, k=4)
    hits = sum(r.maybe_present for r in
               bloom_probe(probes, bloom, "tok",
                           m_bits=65536, k=4).collect())
    # fp rate at n=100, m=65536, k=4 is ~1e-9 — any hit is a bug
    assert hits == 0


def test_bloom_partition_invariance(spark):
    from vision_parse_spark.operators.sketches import bloom_build

    items = spark.createDataFrame(
        [(f"w{i}",) for i in range(500)], "tok string")
    a = {(r.word, r.bits) for r in
         bloom_build(items.coalesce(1), "tok").collect()}
    b = {(r.word, r.bits) for r in
         bloom_build(items.repartition(13), "tok").collect()}
    assert a == b


def test_bloom_validation(spark):
    from vision_parse_spark.operators.sketches import bloom_build

    df = spark.createDataFrame([("a",)], "tok string")
    with pytest.raises(ValueError, match="multiple of 32"):
        bloom_build(df, "tok", m_bits=100)
    with pytest.raises(ValueError, match="k must be"):
        bloom_build(df, "tok", k=0)


# ---------------- histogram quantile sketch ----------------

def test_hist_quantiles_error_bounded_by_bin_width(spark):
    from vision_parse_spark.operators.sketches import hist_quantiles

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
    lens = docs.select(F.length("text").alias("len"))
    lo, hi = lens.agg(F.min("len"), F.max("len")).first()
    width = (hi - lo) / 64
    probs = [0.25, 0.5, 0.75, 0.95]
    est = {r.prob: r.est
           for r in hist_quantiles(lens, "len", probs, 64).collect()}
    exact = docs.agg(F.expr(
        "percentile(length(text), array(0.25D,0.5D,0.75D,0.95D))"
    )).first()[0]
    for p, ex in zip(probs, exact):
        assert abs(est[p] - ex) <= width + 1e-9, (p, est[p], ex)


def test_hist_quantiles_partition_invariance(spark):
    from vision_parse_spark.operators.sketches import hist_quantiles

    df = spark.range(10_000).select(
        (F.col("id") % 997).cast("double").alias("v"))
    a = {(r.prob, r.k, r.est) for r in
         hist_quantiles(df.coalesce(1), "v", [0.5, 0.9]).collect()}
    b = {(r.prob, r.k, r.est) for r in
         hist_quantiles(df.repartition(17), "v",
                        [0.5, 0.9]).collect()}
    assert a == b  # bin counts merge associatively — bit-equal


def test_hist_quantiles_degenerate_constant_column(spark):
    from vision_parse_spark.operators.sketches import hist_quantiles

    df = spark.range(100).select(F.lit(42).alias("v"))
    rows = hist_quantiles(df, "v", [0.5, 1.0]).collect()
    assert {r.est for r in rows} == {42.0}
    assert {r.k for r in rows} == {50, 100}


def test_hist_quantiles_exact_on_uniform_grid(spark):
    from vision_parse_spark.operators.sketches import hist_quantiles

    # 0..63 with 64 bins: one value per bin, est within one width=1
    df = spark.range(64).select(F.col("id").cast("double").alias("v"))
    got = {r.prob: r.est
           for r in hist_quantiles(df, "v", [0.5, 1.0], 64).collect()}
    assert abs(got[0.5] - 31.5) <= 1.0
    assert abs(got[1.0] - 63.0) <= 1.0


def test_hist_quantiles_validation(spark):
    from vision_parse_spark.operators.sketches import hist_quantiles

    df = spark.range(10).select(F.col("id").alias("v"))
    with pytest.raises(ValueError, match="prob"):
        hist_quantiles(df, "v", [])
    with pytest.raises(ValueError, match="probs"):
        hist_quantiles(df, "v", [0.0])
    with pytest.raises(ValueError, match="duplicate"):
        hist_quantiles(df, "v", [0.5, 0.5])
    with pytest.raises(ValueError, match="n_bins"):
        hist_quantiles(df, "v", [0.5], n_bins=1)
    with pytest.raises(ValueError, match="empty"):
        hist_quantiles(df.filter("v < 0"), "v", [0.5])
