"""Per-query measurement harness for optimization rounds (guide §1).

NOT the driver contract — ``bench.py`` is frozen for measurement; this
file exists so individual queries can be isolated (noop sink or the
frozen-bench ``count()`` methodology), repeated, and their
``.explain("formatted")`` plans captured, without touching bench.py.

Usage::

    python bench_extra.py --sf-dir /root/testdata/sf1.0 \
        --queries curate,dup_clusters --repeats 3 --sink count \
        [--plans plans/r07 --suffix before]

Prints one JSON line {"queries": {name: best_sec}, ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default="")
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--sink", choices=["count", "noop"], default="count")
    ap.add_argument("--plans", default="",
                    help="directory to write explain('formatted') files")
    ap.add_argument("--suffix", default="before",
                    help="plan file suffix: <query>_<suffix>.txt")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from vision_parse_spark.session import get_spark
    import __spark_entry__ as em
    from bench import BENCH_OVERRIDES, BENCH_QUERIES

    spark = get_spark("vps-bench-extra", cores=args.cpus,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    qs = dict(em.queries())
    # headline queries are timed through the frozen bench's overrides
    # (Arrow twins); mirror that here so numbers are comparable
    for name, fn in BENCH_OVERRIDES.items():
        if name in BENCH_QUERIES:
            qs[name] = fn
    names = [n for n in args.queries.split(",") if n] or sorted(qs)
    out: dict[str, float] = {}
    for name in names:
        if name not in qs:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = qs[name](spark, args.sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString("formatted"))
            with open(os.path.join(
                    args.plans, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)
        best = float("inf")
        for _ in range(args.repeats):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            df = qs[name](spark, args.sf_dir)
            if args.sink == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            best = min(best, time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        out[name] = round(best, 3)
        print(f"-- {name}: {out[name]}s", file=sys.stderr)
    print(json.dumps({
        "sf_dir": args.sf_dir, "sink": args.sink,
        "repeats": args.repeats, "queries": out,
        "total": round(sum(out.values()), 3),
        "loadavg": round(os.getloadavg()[0], 2),
    }))


if __name__ == "__main__":
    main()
