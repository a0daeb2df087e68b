"""Data-scale sanity ladder for the newer operator classes.

Tiles the sf0.1 tables with id offsets into 1x/4x/8x copies (the 8x
corpus is 8 exact text copies — the WORST case for dedup-family ops)
and times a set of contract queries at each scale on the same
local[32] session.  This is the per-data-volume complement of
tools/bench_scaling.py (which varies CORES at fixed data): a linear
operator should grow ~linearly in data here, and the round-5 verdict
asked for asof/bm25 to join the ladder (item 8).

Offsets scale the natural keys with the data (doc_id/event_id by
1e9 per tile, user_id by 1e6) so key cardinality grows with volume —
the realistic scale-up — while doc_id % 10 splits (dsir,
decontaminate) stay balanced because offsets are multiples of 10.

Usage: python tools/bench_ladder.py [op ...]   (default: NEW_OPS)
Writes BENCH/ladder_r06.json; summary lines to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/vps_ladder"
SCALES = (1, 4, 8)
TABLES = {"documents": ("doc_id",), "embeddings": ("vec_id",),
          "events": ("event_id", "user_id")}
# vec_id shares doc_id's offset so doc<->embedding joins stay aligned
OFFSET = {"doc_id": 10**9, "vec_id": 10**9,
          "event_id": 10**9, "user_id": 10**6}

NEW_OPS = ["asof_attribution", "bm25", "gopher_signals", "dsir_weights",
           "line_dedup", "span_dedup", "curate_full",
           # round-6 additions: trained classifier (control-plane GD),
           # the three portable sketches, funnel, ROUGE
           "quality_clf", "hll_vocab", "cms_heavy", "bloom_tokens",
           "event_funnel", "rouge2", "event_pagerank",
           "cohort_retention"]


def build_tiles(spark):
    from pyspark.sql import functions as F
    for table, keys in TABLES.items():
        src = spark.read.parquet(os.path.join(SF_DIR, f"{table}.parquet"))
        for s in SCALES:
            dst = os.path.join(WORK, f"x{s}", f"{table}.parquet")
            if os.path.exists(dst):
                continue
            tiled = None
            for i in range(s):
                part = src
                for k in keys:
                    part = part.withColumn(k, F.col(k) + F.lit(i * OFFSET[k]))
                tiled = part if tiled is None else tiled.unionByName(part)
            tiled.write.mode("overwrite").parquet(dst)


def main():
    ops = sys.argv[1:] or NEW_OPS
    from vision_parse_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("ladder", cores=32,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    build_tiles(spark)
    qs = entrymod.queries()
    results = {"sf_dir": SF_DIR, "scales": list(SCALES),
               "loadavg_start": os.getloadavg()[0], "ops": {}}
    for op in ops:
        results["ops"][op] = {}
        for s in SCALES:
            sf_dir = os.path.join(WORK, f"x{s}")
            runs = []
            for _ in range(2):
                t0 = time.monotonic()
                qs[op](spark, sf_dir).count()
                runs.append(round(time.monotonic() - t0, 3))
            results["ops"][op][f"x{s}"] = runs
            print(f"{op:20s} x{s}: cold {runs[0]:8.3f}s  warm {runs[1]:8.3f}s",
                  flush=True)
    results["loadavg_end"] = os.getloadavg()[0]
    out = os.path.join(REPO, "BENCH", "ladder_r06.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
