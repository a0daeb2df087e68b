"""Concurrent-baseline control for the N vs 4N scaling evidence.

Spark is not the only thing that stops scaling 4x from 8 -> 32
threads on one shared box: all-core frequency behavior, memory
bandwidth, and neighbor load cap ANY workload.  This control measures
that hardware ceiling directly with a workload that is perfectly
parallel by construction AND exactly representative: K independent OS
processes, each running the engine's own pure-pandas extraction
kernel (``extract_pandas`` — the identical code Spark executes inside
mapInPandas) over its own distinct slice of synthetic turns, for a
fixed duration.  No Spark, no shared state, no coordination.

    control_efficiency(K=8 -> 32) = (agg_ops32 / agg_ops8) / 4

Any engine efficiency at or above the control efficiency means the
ENGINE adds no scaling loss on top of the hardware's.  Reported
alongside the raw numbers in BENCH/scaling.json / BASELINE.md.

Usage: python tools/scaling_control.py [rows_per_pass] [repeats]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

WORK = r"""
import os, sys, time
sys.path.insert(0, os.environ["VPS_REPO"])
from vision_parse_spark.config import ExtractConfig
from vision_parse_spark.operators.pipeline import extract_pandas
from vision_parse_spark.synth import synth_transcripts_pdf

# rows = the engine's OWN kernel on this proc's distinct slice — the
# control workload IS the extraction workload, minus Spark entirely
proc_idx = int(sys.argv[2])
rows_per_pass = int(sys.argv[1])
pdf = synth_transcripts_pdf(rows_per_pass, start=proc_idx * rows_per_pass)
cfg = ExtractConfig(image_mode="url").validate()
extract_pandas(pdf.head(64), cfg)  # warm numpy/regex caches
t0 = time.perf_counter()
n = 0
while time.perf_counter() - t0 < 12.0:  # fixed-duration passes
    extract_pandas(pdf, cfg)
    n += rows_per_pass
sec = time.perf_counter() - t0
print(f"{sec} {n}")
"""


def run_level(k: int, iters: int) -> dict:
    quiet = os.environ.get("VPS_QUIET_LOAD")
    if quiet:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from bench_scaling import wait_quiet

        wait_quiet(float(quiet))
    load_before = float(open("/proc/loadavg").read().split()[0])
    env = dict(os.environ, VPS_REPO=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    t0 = time.perf_counter()
    procs = [
        subprocess.Popen([sys.executable, "-c", WORK, str(iters), str(i)],
                         stdout=subprocess.PIPE, text=True, env=env)
        for i in range(k)
    ]
    outs = [p.communicate()[0].split() for p in procs]
    wall = time.perf_counter() - t0
    # each proc reports (sec, rows) for its fixed-duration window;
    # aggregate = sum of per-proc rates while all K ran concurrently
    rates = [float(n) / float(sec) for sec, n in outs]
    return {
        "procs": k,
        "rows_per_pass": iters,
        "wall_sec": round(wall, 3),
        "agg_rows_per_sec": round(sum(rates), 1),
        "min_proc_rate": round(min(rates), 1),
        "loadavg_1m_before": load_before,
    }


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    out = {"levels": [], "pairs": {}}
    for _ in range(repeats):  # interleaved, like the engine ladder
        for k in (8, 32):
            r = run_level(k, iters)
            out["levels"].append(r)
            print(json.dumps(r), flush=True)
    best = {}
    for r in out["levels"]:
        best[r["procs"]] = max(best.get(r["procs"], 0),
                               r["agg_rows_per_sec"])
    eff = (best[32] / best[8]) / 4
    out["pairs"]["control_efficiency_8v32"] = round(eff, 3)
    out["pairs"]["best_agg_rows_per_sec"] = best
    print(json.dumps(out["pairs"]))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH", "scaling_control.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
