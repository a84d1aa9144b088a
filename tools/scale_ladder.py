#!/usr/bin/env python3
"""Scale-ladder analysis: combine two graft.Bench sidecar JSONs (the
same query subset at sf0.1 and at the generated sf1 fixture) into
BENCH_sf1.json with per-query scaling exponents.

exponent = log(t_sf1 / t_sf01) / log(10) — 1.0 is linear, <=~1.1 is
O(n log n) territory at this size, anything clearly above that needs
an explanation or a fix.

Usage: python3 tools/scale_ladder.py <sf01.json> <sf1.json> [out.json]
"""
import json
import math
import sys


def main():
    a = json.load(open(sys.argv[1]))  # sf0.1
    b = json.load(open(sys.argv[2]))  # sf1
    out_path = sys.argv[3] if len(sys.argv) > 3 else "BENCH_sf1.json"
    qa, qb = a["queries"], b["queries"]
    rows = []
    for q in sorted(qb, key=lambda q: -qb[q]):
        if q not in qa:
            continue
        t0, t1 = qa[q], qb[q]
        if t0 <= 0 or t1 <= 0:  # crashed (-1) or unmeasured
            rows.append({"query": q, "sf01_s": t0, "sf1_s": t1,
                         "exponent": None, "note": "crashed-or-unmeasured"})
            continue
        # sub-second sf0.1 timings are floored at 0.05s: micro-batch /
        # session fixed overheads dominate and the exponent would read
        # as pure noise amplification
        t0c = max(t0, 0.05)
        exp = round(math.log(t1 / t0c) / math.log(10), 2)
        rows.append({"query": q, "sf01_s": t0, "sf1_s": t1, "exponent": exp})
    result = {
        "metric": "scale_ladder",
        "factor": 10,
        "sf01_total": a["value"], "sf1_total": b["value"],
        "n_queries": len(rows),
        "n_err_sf01": a.get("n_err", 0), "n_err_sf1": b.get("n_err", 0),
        "overall_exponent": round(
            math.log(b["value"] / a["value"]) / math.log(10), 2)
            if a["value"] > 0 and b["value"] > 0 else None,
        "queries": rows,
    }
    json.dump(result, open(out_path, "w"), indent=1)
    print(f"wrote {out_path}")
    print(f"totals: sf0.1 {a['value']} s -> sf1 {b['value']} s "
          f"(overall exponent {result['overall_exponent']})")
    print(f"{'query':34s} {'sf0.1':>7s} {'sf1':>8s} {'exp':>5s}")
    for r in rows:
        e = "crash" if r["exponent"] is None else f"{r['exponent']:.2f}"
        print(f"{r['query']:34s} {r['sf01_s']:7.2f} {r['sf1_s']:8.2f} {e:>5s}")


if __name__ == "__main__":
    main()
