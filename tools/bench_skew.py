"""Skew demonstration at bench scale (round-2 verdict item 8).

Builds a PATHOLOGICAL Zipf transcripts table — one conversation holds
``VPS_SKEW_HOT_FRAC`` (default 10%) of ALL turns — and measures the
per-conversation aggregation both ways:

* ``direct``  — single-phase ``groupBy(conv_id)``: the hot key's every
  row lands on ONE reducer.
* ``salted``  — two-phase ``conv_stats_salted``: phase 1 groups by
  (conv_id, salt), spreading the hot key over ``salt_buckets``
  reducers; phase 2 combines the tiny partials.

Reported per mode:
* wall-clock (best of ``VPS_SKEW_REPEATS``) for the full aggregation;
* reducer-input balance: max/median rows per shuffle partition for the
  first (heavy) exchange, computed exactly from the same hash layout
  Spark uses (pmod of the group-key hash into shuffle partitions) —
  the data-level proof that the salted plan removes the straggler,
  independent of box noise.

Writes BENCH/skew.json and prints one JSON line.

Usage: python tools/bench_skew.py  (env: VPS_SKEW_TURNS=2000000,
VPS_SKEW_HOT_FRAC=0.1, SPARK_GRAFT_CPUS=32)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_TURNS = int(os.environ.get("VPS_SKEW_TURNS", "2000000"))
HOT_FRAC = float(os.environ.get("VPS_SKEW_HOT_FRAC", "0.1"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEATS = int(os.environ.get("VPS_SKEW_REPEATS", "3"))
SHUFFLE_PARTS = 32
SALT_BUCKETS = 32


def build_input(spark):
    """Distributed synthesis, no Python: id < hot_n -> the hot conv;
    the rest spread over ~8-turn conversations.  Text is an id-derived
    hex string (60-180 chars) so sum(length)/min/max do real work."""
    from pyspark.sql import functions as F

    hot_n = int(N_TURNS * HOT_FRAC)
    df = spark.range(N_TURNS, numPartitions=CPUS * 2)
    conv = F.when(F.col("id") < hot_n, F.lit("conv_hot")).otherwise(
        F.concat(F.lit("conv_"), ((F.col("id") - hot_n) / 8).cast("long")
                 .cast("string")))
    text = F.concat(
        F.md5(F.col("id").cast("string")),
        F.repeat(F.lit("x"), (F.col("id") % 150).cast("int")),
    )
    return df.select(
        conv.alias("conv_id"),
        F.col("id").alias("turn_idx"),
        text.alias("text"),
        F.timestamp_seconds(F.col("id") % 100000).alias("ts"),
    )


def reducer_balance(df, keys) -> dict:
    """Exact phase-1 shuffle balance: rows per reducer when the group
    key hashes into SHUFFLE_PARTS partitions (Spark's HashPartitioner
    layout on the agg's Exchange)."""
    from pyspark.sql import functions as F

    per = (
        df.groupBy(F.pmod(F.xxhash64(*keys), F.lit(SHUFFLE_PARTS))
                   .alias("reducer"))
        .count()
        .orderBy("count")
        .collect()
    )
    counts = sorted(int(r["count"]) for r in per)
    med = counts[len(counts) // 2] if counts else 0
    return {
        "reducers": len(counts),
        "max_rows": counts[-1] if counts else 0,
        "median_rows": med,
        "max_over_median": round(counts[-1] / max(med, 1), 2),
    }


def main():
    from pyspark.sql import functions as F

    from vision_parse_spark.operators.aggregate import (
        conv_stats_direct,
        conv_stats_salted,
    )
    from vision_parse_spark.session import get_spark

    spark = get_spark(
        "vps-skew", cores=CPUS,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.shuffle.partitions": str(SHUFFLE_PARTS),
            # measure the PLAN's skew handling, not AQE's runtime
            # patch-up of it
            "spark.sql.adaptive.enabled": "false",
        },
    )
    inp = f"/tmp/vps_skew_input_{N_TURNS}_{int(HOT_FRAC * 100)}"
    if not os.path.exists(os.path.join(inp, "_SUCCESS")) and not any(
        f.endswith(".parquet") for f in
        (os.listdir(inp) if os.path.isdir(inp) else [])
    ):
        build_input(spark).write.mode("overwrite").parquet(inp)
    df = spark.read.parquet(inp)

    salt = F.pmod(F.xxhash64("conv_id", "text", "turn_idx", "ts"),
                  F.lit(SALT_BUCKETS))
    balance = {
        "direct": reducer_balance(df, ["conv_id"]),
        "salted": reducer_balance(df.withColumn("_salt", salt),
                                  ["conv_id", "_salt"]),
    }

    timings = {}
    for mode, fn in (("direct", conv_stats_direct),
                     ("salted", conv_stats_salted)):
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            n = fn(df).count()
            best = min(best, time.perf_counter() - t0)
        timings[mode] = round(best, 3)
        expected = int((N_TURNS - int(N_TURNS * HOT_FRAC)) / 8) + 1 + 1
        assert abs(n - expected) <= 1, f"{mode}: {n} convs != ~{expected}"

    # ---- extract-level skew: pathological INPUT SPLITS ------------
    # one parquet file per conversation (the "file-per-conv ingest"
    # shape): the hot conv's file is one scan split = one straggler
    # task for the narrow extract stage.  salted_repartition is the
    # fix the pipeline exposes (extract(salt_partitions=...)).
    from vision_parse_spark import ExtractConfig, extract

    skew_files = f"{inp}_per_conv"
    if not os.path.isdir(skew_files):
        # 1 hot file (10% of rows) + the rest in CPUS files
        df.filter(F.col("conv_id") == "conv_hot").coalesce(1) \
            .write.mode("overwrite").parquet(skew_files)
        df.filter(F.col("conv_id") != "conv_hot").repartition(CPUS) \
            .write.mode("append").parquet(skew_files)
    # force file-grain splits (no split merging) so the hot file is
    # genuinely one task, as it would be on a file-per-conv ingest
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1g")
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    sdf = spark.read.parquet(skew_files).select(
        "conv_id", "turn_idx", "text")
    extract_timings = {}
    for mode, kwargs in (("narrow_skewed_splits", {}),
                         ("salted_repartition",
                          {"salt_partitions": CPUS * 4})):
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            n = extract(sdf, ExtractConfig(image_mode=None),
                        **kwargs).count()
            best = min(best, time.perf_counter() - t0)
        assert n == N_TURNS
        extract_timings[mode] = round(best, 3)

    # ---- as-of join: hot-key window straggler (round-5 verdict) ---
    # one user holds HOT_FRAC of ALL events: the single-window plan
    # sorts that user's whole history in ONE WindowExec task; the
    # chunked plan ((key, time-bucket) + boundary-carry pass) spreads
    # it over ~n_buckets tasks.  Identity of the two outputs is
    # asserted via a full-column hash sum.
    from vision_parse_spark.operators.temporal import asof_join

    asof_regimes = []
    for n_ev, hot in ((N_TURNS, HOT_FRAC), (4 * N_TURNS, 0.4)):
        ev = spark.range(n_ev, numPartitions=CPUS * 2).select(
            F.col("id").alias("event_id"),
            F.timestamp_seconds(F.col("id")).alias("ts"),
            F.when(F.col("id") % 10 < 10 * hot, F.lit("user_hot"))
            .otherwise(F.concat(F.lit("u"),
                                (F.col("id") % 40000).cast("string")))
            .alias("user_id"),
            (F.col("id") % 97).cast("double").alias("value"),
            (F.col("id") % 2 == 0).alias("is_click"),
        )
        path = f"{inp}_asof_{n_ev}_{int(hot * 100)}"
        ev.write.mode("overwrite").parquet(path)
        ev = spark.read.parquet(path)
        clicks = ev.filter("is_click").drop("is_click")
        buys = ev.filter("NOT is_click").drop("is_click")
        # ts spans n_ev seconds; ~64 buckets over the span
        bucket_us = max(1, (n_ev // 64)) * 1_000_000
        asof_timings, sums = {}, {}
        for mode, kwargs in (("single_window", {}),
                             ("chunked", {"skew_bucket_us": bucket_us})):
            best = float("inf")
            for _ in range(REPEATS):
                t0 = time.perf_counter()
                out = asof_join(buys, clicks, "user_id", "ts",
                                "event_id", ["value"], **kwargs)
                s = out.agg(F.sum(F.xxhash64(*out.columns)
                                  .cast("decimal(38,0)"))).first()[0]
                best = min(best, time.perf_counter() - t0)
            asof_timings[mode] = round(best, 3)
            sums[mode] = s
        assert sums["single_window"] == sums["chunked"], sums
        micros = F.unix_micros(F.col("ts"))
        asof_regimes.append({
            "n_events": n_ev,
            "hot_frac": hot,
            "bucket_us": bucket_us,
            "wall_sec": asof_timings,
            "speedup_chunked": round(
                asof_timings["single_window"] / asof_timings["chunked"],
                3),
            "reducer_balance": {
                "single_window": reducer_balance(ev, ["user_id"]),
                "chunked": reducer_balance(
                    ev.withColumn("_bkt",
                                  F.floor(micros / F.lit(bucket_us))),
                    ["user_id", "_bkt"]),
            },
        })

    result = {
        "metric": "skew_demo",
        "n_turns": N_TURNS,
        "hot_frac": HOT_FRAC,
        "cpus": CPUS,
        "shuffle_partitions": SHUFFLE_PARTS,
        "salt_buckets": SALT_BUCKETS,
        "wall_sec": timings,
        "reducer_balance": balance,
        "speedup_salted": round(timings["direct"] / timings["salted"], 3),
        "extract_skewed_splits_sec": extract_timings,
        "extract_salted_speedup": round(
            extract_timings["narrow_skewed_splits"]
            / extract_timings["salted_repartition"], 3),
        # identical output hash asserted per regime; the chunked
        # window always fixes the reducer balance, and its wall-clock
        # crosses over once the hot key dwarfs the per-core share
        # (at this box's scale a 10%-hot key still sorts in-memory
        # in one task, so chunking only pays off in the heavy regime)
        "asof_skew": asof_regimes,
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/skew.json", "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
