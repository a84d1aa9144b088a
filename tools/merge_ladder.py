#!/usr/bin/env python3
"""Fold extra (sf0.1, sf1) sidecar pairs from non-Bench mains (e.g.
graft.AdmitLadder, whose multi-batch streaming harness can't live in
Bench's query map) into an existing BENCH_sf1.json scale ladder.

Usage: python3 tools/merge_ladder.py BENCH_sf1.json <sf01.json> <sf1.json>
"""
import json
import math
import sys


def main():
    out = sys.argv[1]
    lad = json.load(open(out))
    a = json.load(open(sys.argv[2]))["queries"]  # lower-scale leg
    b = json.load(open(sys.argv[3]))["queries"]  # 10x leg
    la, lb = lad.get("legs", ["sf01", "sf1"])
    ka, kb = f"{la}_s", f"{lb}_s"
    have = {r["query"] for r in lad["queries"]}
    added = 0
    for q in b:
        if q not in a or q in have:
            continue
        t0, t1 = a[q], b[q]
        if t0 <= 0 or t1 <= 0:
            continue
        lad["queries"].append({
            "query": q, ka: t0, kb: t1,
            "exponent": round(math.log(t1 / max(t0, 0.05)) / math.log(10), 2)})
        added += 1
    lad["queries"].sort(key=lambda r: -(r[kb] or 0))
    lad["n_queries"] = len(lad["queries"])
    json.dump(lad, open(out, "w"), indent=1)
    print(f"merged {added} entries from {sys.argv[3]} into {out}")


if __name__ == "__main__":
    main()
