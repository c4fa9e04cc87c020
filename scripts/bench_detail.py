#!/usr/bin/env python3
"""Repeat-run bench wrapper: runs graft.Bench N times and reports per-query
min/median (min is the least-noise estimator for warm local runs — the
roundtrip queries write real files to /tmp and show 1-3s run-to-run
variance).

Usage: python3 scripts/bench_detail.py [sfDir] [runs]
"""
import json, re, statistics, subprocess, sys

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

results = []
for i in range(runs):
    out = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        env={**__import__("os").environ,
             "SPARK_GRAFT_SF_DIR": sf, "SPARK_GRAFT_CPUS": "32"},
        capture_output=True, text=True)
    m = re.search(r'\{"metric".*\}', out.stdout)
    if not m:
        print(f"run {i}: no metric line (rc={out.returncode})", file=sys.stderr)
        continue
    data = json.loads(m.group(0))
    results.append(data["queries"])
    print(f"run {i}: total {data['value']:.1f}s", file=sys.stderr)

if not results:
    sys.exit(1)

queries = sorted(results[0])
rows = []
for q in queries:
    vals = [r[q] for r in results if q in r]
    rows.append((q, min(vals), statistics.median(vals)))

rows.sort(key=lambda r: -r[1])
print(f"{'query':30s} {'min':>8s} {'median':>8s}")
for q, mn, md in rows:
    print(f"{q:30s} {mn:8.2f} {md:8.2f}")
print(f"{'TOTAL (min)':30s} {sum(r[1] for r in rows):8.1f}")
