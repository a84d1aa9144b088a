#!/usr/bin/env python3
"""Scale-ladder analysis: combine two graft.Bench sidecar JSONs (the
same query subset at sf0.1 and at the generated sf1 fixture) into
BENCH_sf1.json with per-query scaling exponents.

exponent = log(t_sf1 / t_sf01) / log(10) — 1.0 is linear, <=~1.1 is
O(n log n) territory at this size, anything clearly above that needs
an explanation or a fix.

Usage: python3 tools/scale_ladder.py <legA.json> <legB.json> [out.json] [labelA labelB]

Default labels are sf01/sf1 (the original sf0.1 -> fixtures/sf1 pair);
the sf10 decade push passes `sf1 sf10` so BENCH_sf10.json's field
names say what was actually measured. The rung factor is always 10x.
"""
import json
import math
import sys


def main():
    a = json.load(open(sys.argv[1]))  # lower-scale leg
    b = json.load(open(sys.argv[2]))  # 10x leg
    out_path = sys.argv[3] if len(sys.argv) > 3 else "BENCH_sf1.json"
    la = sys.argv[4] if len(sys.argv) > 4 else "sf01"
    lb = sys.argv[5] if len(sys.argv) > 5 else "sf1"
    ka, kb = f"{la}_s", f"{lb}_s"
    qa, qb = a["queries"], b["queries"]
    rows = []
    for q in sorted(qb, key=lambda q: -qb[q]):
        if q not in qa:
            continue
        t0, t1 = qa[q], qb[q]
        if t0 <= 0 or t1 <= 0:  # crashed (-1) or unmeasured
            rows.append({"query": q, ka: t0, kb: t1,
                         "exponent": None, "note": "crashed-or-unmeasured"})
            continue
        # sub-second lower-leg timings are floored at 0.05s: micro-batch
        # / session fixed overheads dominate and the exponent would read
        # as pure noise amplification
        t0c = max(t0, 0.05)
        exp = round(math.log(t1 / t0c) / math.log(10), 2)
        rows.append({"query": q, ka: t0, kb: t1, "exponent": exp})
    result = {
        "metric": "scale_ladder",
        "factor": 10,
        "legs": [la, lb],
        f"{la}_total": a["value"], f"{lb}_total": b["value"],
        "n_queries": len(rows),
        f"n_err_{la}": a.get("n_err", 0), f"n_err_{lb}": b.get("n_err", 0),
        "overall_exponent": round(
            math.log(b["value"] / a["value"]) / math.log(10), 2)
            if a["value"] > 0 and b["value"] > 0 else None,
        "queries": rows,
    }
    json.dump(result, open(out_path, "w"), indent=1)
    print(f"wrote {out_path}")
    print(f"totals: {la} {a['value']} s -> {lb} {b['value']} s "
          f"(overall exponent {result['overall_exponent']})")
    print(f"{'query':34s} {la:>7s} {lb:>8s} {'exp':>5s}")
    for r in rows:
        e = "crash" if r["exponent"] is None else f"{r['exponent']:.2f}"
        print(f"{r['query']:34s} {r[ka]:7.2f} {r[kb]:8.2f} {e:>5s}")


if __name__ == "__main__":
    main()
