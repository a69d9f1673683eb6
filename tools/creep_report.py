#!/usr/bin/env python3
"""Bench-creep controlled experiment (round 12, VERDICT r11 #1).

Question (open since r9): driver-side sf0.1 bench totals grew
147.2 s (r10) -> 183.2 s (r11) with the 68 queries UNTOUCHED in r11
uniformly +32% — an environment signature, never verified. The r12
driver bench then REVERSED it without any code change to those
queries (183.2 -> 126.0 s, 133 queries, 0 failures). This script is
the controlled verification: it takes N quiet-conditions Bench runs
(full bench_last.json files: per-query min-of-2, cold first_run,
reps), extracts the per-query times visible in the driver artifacts'
truncated tails (BENCH_r10/r11/r12.json), and reports, for the
common-query set:

  - per-query quiet MIN across runs vs the r10/r11/r12 driver times;
  - the median ratios quiet/r10, r11/r10 and r12/r10 (if quiet ~= 1.0
    while r11/r10 ~= 1.3, the creep was environment, not code);
  - the specific untouched movers the r11 judge named;
  - cross-run spread (max/min of cold times) as the noise yardstick.

Writes BENCH_QUIET_r13.json and prints a markdown summary.

Usage: python3 tools/creep_report.py [--out BENCH_QUIET_rN.json] run*.json

Since r14 this is the STANDING per-round artifact (VERDICT r13 #4):
run the full suite quietly 3x at the round's HEAD and ship the report
next to the driver bench, so a contended driver number never needs
post-hoc adjudication. --out names the round's artifact (default
BENCH_QUIET_r13.json, the original experiment).
"""
import json, re, sys, statistics

args = sys.argv[1:]
OUT = "BENCH_QUIET_r13.json"
if args and args[0] == "--out":
    OUT = args[1]
    args = args[2:]
sys.argv = [sys.argv[0]] + args

def tail_times(path):
    """Per-query seconds from a driver artifact's (truncated) tail."""
    d = json.load(open(path))
    t = d.get("tail", "")
    return {m.group(1): float(m.group(2))
            for m in re.finditer(r'"(q_[a-z0-9_]+)":(-?\d+(?:\.\d+)?)', t)
            if float(m.group(2)) >= 0}

runs = [json.load(open(p)) for p in sys.argv[1:]]
assert runs, "pass the quiet bench_last.json paths"
r10, r11 = tail_times("BENCH_r10.json"), tail_times("BENCH_r11.json")
r12 = tail_times("BENCH_r12.json")

names = sorted(runs[0]["queries"])
# a query with no valid (>= 0) time in any run is skipped, not a crash
qmin = {}
for n in names:
    vals = [r["queries"][n] for r in runs if r["queries"].get(n, -1) >= 0]
    if vals:
        qmin[n] = min(vals)
cold = {n: [r["first_run"][n] for r in runs
            if r.get("first_run", {}).get(n, -1) >= 0] for n in names}

common = sorted(set(qmin) & set(r10) & set(r11))
# ratios only over queries big enough for 0.1 s tail resolution to matter
meas = [n for n in common if r10[n] >= 0.4]
ratio_r11 = {n: r11[n] / r10[n] for n in meas}
ratio_r12 = {n: r12[n] / r10[n] for n in meas if n in r12}
ratio_q = {n: qmin[n] / r10[n] for n in meas}
med11 = statistics.median(ratio_r11.values())
med12 = statistics.median(ratio_r12.values()) if ratio_r12 else float("nan")
medq = statistics.median(ratio_q.values())

movers = ["q_dedup_clusters", "q_skipping_prune", "q_mdct_stats"]
spread = {n: (max(c) / min(c) if len(c) > 1 and min(c) > 0.2 else None)
          for n, c in cold.items()}
big_spread = sorted((v, n) for n, v in spread.items() if v and v > 1.5)

out = {
    "experiment": "quiet-conditions min-of-%d bench, sf0.1, local[32]"
                  % (2 * len(runs)),
    "n_runs": len(runs),
    "totals_per_run": [round(sum(v for v in r["queries"].values() if v >= 0), 1)
                       for r in runs],
    "total_of_mins": round(sum(qmin.values()), 1),
    "n_common_with_r10_r11_tails": len(common),
    "n_ratio_measurable": len(meas),
    "median_ratio_r11_driver_vs_r10_driver": round(med11, 3),
    "median_ratio_r12_driver_vs_r10_driver": round(med12, 3),
    "median_ratio_quiet_min_vs_r10_driver": round(medq, 3),
    "named_movers": {n: {"r10": r10.get(n), "r11": r11.get(n),
                         "r12": r12.get(n),
                         "quiet_min": qmin.get(n),
                         "quiet_colds": [round(c, 2) for c in cold.get(n, [])]}
                     for n in movers},
    "queries": {n: round(v, 3) for n, v in qmin.items()},
    "first_runs": {n: [round(c, 3) for c in cold[n]] for n in names},
}
json.dump(out, open(OUT, "w"), indent=1)

print(f"runs: {len(runs)}  totals {out['totals_per_run']}  "
      f"sum-of-mins {out['total_of_mins']} s")
print(f"common queries in both driver tails: {len(common)} "
      f"({len(meas)} with r10 >= 0.4 s)")
print(f"median r11/r10 (driver vs driver): {med11:.2f}x")
print(f"median r12/r10 (driver vs driver): {med12:.2f}x")
print(f"median quiet-min/r10:             {medq:.2f}x")
print("named untouched movers (r10 -> r11 -> r12 -> quiet-min):")
for n in movers:
    print(f"  {n:22s} {r10.get(n)} -> {r11.get(n)} -> {r12.get(n)} -> "
          f"{round(qmin.get(n, -1), 2)}  colds={out['named_movers'][n]['quiet_colds']}")
print("largest cross-run cold spreads (noise yardstick):")
for v, n in big_spread[-5:]:
    print(f"  {n:22s} {v:.2f}x  colds={[round(c,2) for c in cold[n]]}")
verdict = ("ENVIRONMENT: quiet runs sit at r10 levels; the +32% was not in the code"
           if medq < (1 + (med11 - 1) / 2) else
           "STRUCTURAL: quiet runs keep the inflation; bisect the code delta")
print("verdict:", verdict)
out["verdict"] = verdict
json.dump(out, open(OUT, "w"), indent=1)
