#!/usr/bin/env python3
"""Build the scale-experiment artifact: join the sf0.1 bench and the 10x
(sf1.0, ScaleUp-generated) bench into one per-query table with ratios,
flagging super-linear outliers. Usage:

    python3 tools/scale_report.py BENCH_LOCAL_r08.json /tmp/bench_sf1.json BENCH_SF1_r08.json
"""
import json, sys

base_f, scaled_f, out_f = sys.argv[1], sys.argv[2], sys.argv[3]
base = json.load(open(base_f))
scaled = json.load(open(scaled_f))

# Ratios use COLD first-run times on both sides: min-of-N at sf0.1 can
# be a warm-cache hit on a session-shared frame (q_ngram_jaccard min
# 0.22s vs cold 3.4s), which inflated one ratio 319x until triaged.
rows = {}
for q, t1m in scaled["queries"].items():
    t1 = scaled.get("first_run", {}).get(q, t1m)
    t0 = base.get("first_run", {}).get(q, base["queries"].get(q))
    r = {"sf0.1_sec": t0, "sf1.0_sec": t1}
    if t0 and t0 > 0 and t1 and t1 > 0:
        r["ratio"] = round(t1 / t0, 2)
    rows[q] = r

outliers = sorted(
    ((q, r) for q, r in rows.items()
     if r.get("ratio") and r["ratio"] > 15 and r["sf1.0_sec"] > 5),
    key=lambda kv: -kv[1]["ratio"])

art = {
    "metric": "scale_experiment_10x",
    "generator": "graft.ScaleUp /root/testdata/sf0.1 -> target/sf1.0 (10 copies, key strides, dims fixed, payloads unperturbed)",
    "note": "ratio ~10 = linear in data; <10 = fixed costs amortizing; >15 on a >5s query = super-linear, triaged in SCALE_r08.md",
    "base_total_sec": base.get("value"),
    "scaled_total_sec": scaled.get("value"),
    "scaled_failed": scaled.get("failed", []),
    "scaled_timedout": scaled.get("timedout", []),
    "scaled_skipped": scaled.get("skipped", []),
    "superlinear": [q for q, _ in outliers],
    "queries": rows,
}
with open(out_f, "w") as f:
    json.dump(art, f, indent=1, sort_keys=False)

print(f"total: sf0.1 {base.get('value')}s -> sf1.0 {scaled.get('value')}s")
print(f"timedout: {scaled.get('timedout', [])}  failed: {scaled.get('failed', [])}  skipped: {scaled.get('skipped', [])}")
print("\nsuper-linear (>15x, >5s):")
for q, r in outliers:
    print(f"  {q:28s} {r['sf0.1_sec']:8.2f} -> {r['sf1.0_sec']:8.2f}  ({r['ratio']}x)")
print("\ntop sf1.0 costs:")
for q, r in sorted(rows.items(), key=lambda kv: -(kv[1]['sf1.0_sec'] or 0))[:15]:
    print(f"  {q:28s} {r['sf1.0_sec']:8.2f}  (x{r.get('ratio', '-')})")
