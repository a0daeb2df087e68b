"""Concurrent-baseline control for the N vs 4N scaling evidence.

Spark is not the only thing that stops scaling 4x from 8 -> 32
threads on one shared box: all-core frequency behavior, memory
bandwidth, and neighbor load cap ANY workload.  This control measures
that hardware ceiling directly with a workload that is perfectly
parallel by construction — K independent OS processes, each running a
fixed count of identical numpy passes (mix of element-wise string-ish
byte ops and small matmuls, shaped like the extraction kernel), no
shared state, no coordination, no Python threads.

    control_efficiency(K=8 -> 32) = (agg_ops32 / agg_ops8) / 4

Any engine efficiency at or above the control efficiency means the
ENGINE adds no scaling loss on top of the hardware's.  Reported
alongside the raw numbers in BENCH/scaling.json / BASELINE.md.

Usage: python tools/scaling_control.py [iters_per_proc]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

WORK = r"""
import sys, time
import numpy as np
iters = int(sys.argv[1])
rng = np.random.default_rng(0)
a = rng.integers(0, 255, size=(512, 512), dtype=np.uint8)
m = rng.standard_normal((128, 128))
t0 = time.perf_counter()
acc = 0.0
for i in range(iters):
    # byte-wise pass (pandas-str-like) + small matmul (CV-like)
    b = (a.astype(np.int64) * 31 + i) % 251
    acc += float(b.sum() % 1000)
    acc += float((m @ m).trace())
print(time.perf_counter() - t0)
"""


def run_level(k: int, iters: int) -> dict:
    quiet = os.environ.get("VPS_QUIET_LOAD")
    if quiet:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from bench_scaling import wait_quiet

        wait_quiet(float(quiet))
    load_before = float(open("/proc/loadavg").read().split()[0])
    t0 = time.perf_counter()
    procs = [
        subprocess.Popen([sys.executable, "-c", WORK, str(iters)],
                         stdout=subprocess.PIPE, text=True)
        for _ in range(k)
    ]
    per_proc = [float(p.communicate()[0].strip()) for p in procs]
    wall = time.perf_counter() - t0
    agg = k * iters / wall  # aggregate passes/sec while all K ran
    return {
        "procs": k,
        "iters_per_proc": iters,
        "wall_sec": round(wall, 3),
        "agg_passes_per_sec": round(agg, 1),
        "slowest_proc_sec": round(max(per_proc), 3),
        "loadavg_1m_before": load_before,
    }


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    out = {"levels": [], "pairs": {}}
    for k in (8, 32, 8, 32):  # interleaved, like the engine ladder
        r = run_level(k, iters)
        out["levels"].append(r)
        print(json.dumps(r))
    best = {}
    for r in out["levels"]:
        best[r["procs"]] = max(best.get(r["procs"], 0),
                               r["agg_passes_per_sec"])
    eff = (best[32] / best[8]) / 4
    out["pairs"]["control_efficiency_8v32"] = round(eff, 3)
    print(json.dumps(out["pairs"]))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH", "scaling_control.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
