#!/usr/bin/env python3
"""Post-bench record merge — the one-take bench discipline (round-10
verdict #6): take the FRESH BENCH_LOCAL.json and the previous round's
committed record, and emit BENCH_LOCAL_r{N}.json carrying per-query
probe-normalized deltas IN the record itself, so the round-over-round
comparison is mechanical (no NOTES-side arithmetic, no second take).

Usage: bench_delta.py <fresh BENCH_LOCAL.json> <prev BENCH_LOCAL_rN.json> <out>

Adds to the fresh record:
  cal_norm_delta_vs_prev : per shared query, cal_norm(cur)/cal_norm(prev)
  new_queries            : queries present now but not in prev
  shared_norm_ratio      : sum-normalized ratio over the shared subset
"""
import json
import sys

cur = json.load(open(sys.argv[1]))
prev = json.load(open(sys.argv[2]))
curq = cur["cal_norm_queries"]
prevq = prev["cal_norm_queries"]
shared = sorted(set(curq) & set(prevq))
# no silent exclusions: a zero prev value gets an explicit null delta
# instead of vanishing from the map while still counting as "shared"
delta = {q: (round(curq[q] / prevq[q], 4) if prevq[q] > 0 else None)
         for q in shared}
cur["cal_norm_delta_vs_prev"] = delta
cur["new_queries"] = sorted(set(curq) - set(prevq))
# a query DROPPED this round must not silently read as covered
cur["removed_queries"] = sorted(set(prevq) - set(curq))
prev_sum = sum(prevq[q] for q in shared)
cur["shared_norm_ratio"] = (
    round(sum(curq[q] for q in shared) / prev_sum, 4) if prev_sum > 0 else None)
with open(sys.argv[3], "w") as f:
    json.dump(cur, f)
print(f"shared {len(shared)} queries, shared_norm_ratio {cur['shared_norm_ratio']}, "
      f"{len(cur['new_queries'])} new, {len(cur['removed_queries'])} removed")
delta = {q: r for q, r in delta.items() if r is not None}
worst = sorted(delta.items(), key=lambda kv: -kv[1])[:10]
print("largest normalized deltas (cur/prev):")
for q, r in worst:
    print(f"  {q}: {r}")
