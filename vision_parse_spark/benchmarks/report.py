"""Benchmark report writer — the analog of the reference's
``save_benchmark_results`` (``/root/reference/benchmarks/scoring.py:
72-93``: summary table + per-run detail in markdown), lifted to this
repo's bench JSON shape (one ``bench.py`` line per run:
``{"metric", "value", "queries": {...}, "sf", "cpus",
"extract_turns_per_sec", ...}``).

Usage::

    python -m vision_parse_spark.benchmarks.report BENCH_r*.json \
        [-o BENCH/REPORT.md]

Accepts any mix of bench-JSON files (each may hold one JSON object or
one per line) and writes a multi-run markdown report: a summary table
(run, sf, cpus, suite seconds, extraction throughput) and a per-query
seconds matrix with a delta column vs the first run.
"""

from __future__ import annotations

import json
import os
from typing import Iterable


def load_runs(paths: Iterable[str]) -> list[dict]:
    runs = []
    for p in paths:
        with open(p) as f:
            body = f.read()
        try:  # whole-file object (pretty-printed driver output)
            docs = [json.loads(body)]
        except json.JSONDecodeError:  # one JSON object per line
            docs = [json.loads(line) for line in body.splitlines()
                    if line.strip().startswith("{")]
        for d in docs:
            if "queries" not in d and "tail" in d:
                # driver-recorded BENCH_r{N}.json: our bench line is
                # embedded in the captured stdout tail
                for line in str(d["tail"]).splitlines():
                    line = line.strip()
                    if line.startswith("{") and '"metric"' in line:
                        inner = json.loads(line)
                        inner.setdefault("cpus", d.get("cpus"))
                        inner.setdefault("sf", d.get("sf"))
                        d = inner
                        break
            d["_name"] = os.path.basename(p)
            runs.append(d)
    return runs


def render_report(runs: list[dict]) -> str:
    out = ["# Benchmark Results", ""]
    out.append("| run | sf | cpus | suite sec | extract turns/s |")
    out.append("|---|---|---|---|---|")
    for r in runs:
        out.append(
            f"| {r.get('_name', '?')} | {r.get('sf', '?')} "
            f"| {r.get('cpus', '?')} | {r.get('value', '?')} "
            f"| {r.get('extract_turns_per_sec', '?')} |"
        )
    qnames: list[str] = []
    for r in runs:
        for q in r.get("queries", {}):
            if q not in qnames:
                qnames.append(q)
    if qnames:
        out += ["", "## Per-query seconds", ""]
        head = "| query | " + " | ".join(
            r.get("_name", f"run{i}") for i, r in enumerate(runs))
        if len(runs) > 1:
            head += " | vs first |"
        else:
            head += " |"
        out.append(head)
        out.append("|" + "---|" * (len(runs) + (2 if len(runs) > 1 else 1)))
        for q in qnames:
            vals = [r.get("queries", {}).get(q) for r in runs]
            row = f"| {q} | " + " | ".join(
                "-" if v is None else f"{v:.3f}" for v in vals)
            if len(runs) > 1:
                first, last = vals[0], vals[-1]
                if first and last:
                    row += f" | {last / first:.2f}x |"
                else:
                    row += " | - |"
            else:
                row += " |"
            out.append(row)
    return "\n".join(out) + "\n"


def main(argv: list[str] | None = None) -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("files", nargs="+", help="bench JSON files")
    ap.add_argument("-o", "--out", default=None,
                    help="output markdown path (default: stdout)")
    args = ap.parse_args(argv)
    report = render_report(load_runs(args.files))
    if args.out:
        with open(args.out, "w") as f:
            f.write(report)
        print(f"wrote {args.out}")
    else:
        print(report)


if __name__ == "__main__":
    main()
