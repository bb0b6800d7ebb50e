#!/usr/bin/env python3
"""Per-query scaling table (VERDICT r13 task 1): join two BENCH_FULL
artifacts from the same box at two scale factors and report the wall
ratio per query, worst first, plus a category verdict per query.

With a 10x data step-up, a linear operator should cost <= ~10x wall
(usually much less at these sizes: fixed per-query overhead — session,
planning, shuffle setup — dominates small queries, so most ratios land
well under the data ratio). Queries whose output is metadata-sized
(group counts, histograms, top-k) should be strongly sub-linear.
Anything >> the data ratio is a super-linear suspect and gets named.

Usage:
  python3 tools/scaling_report.py BENCH_small.json BENCH_big.json \
      --data-ratio 10 [--out SCALING.json]
"""
import json, sys

def main():
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    args = sys.argv[3:]
    data_ratio, out = 10.0, None
    while args:
        a = args.pop(0)
        if a == "--data-ratio":
            data_ratio = float(args.pop(0))
        elif a == "--out":
            out = args.pop(0)

    qs_s, qs_b = small["queries"], big["queries"]
    common = sorted(set(qs_s) & set(qs_b))
    rows = []
    for name in common:
        s, b = qs_s[name], qs_b[name]
        if s <= 0 or b <= 0:
            continue
        rows.append({"query": name, "small_s": s, "big_s": b,
                     "ratio": b / s})
    rows.sort(key=lambda r: -r["ratio"])

    sup = [r for r in rows if r["ratio"] > data_ratio]
    lin = [r for r in rows if 0.5 * data_ratio < r["ratio"] <= data_ratio]
    sub = [r for r in rows if r["ratio"] <= 0.5 * data_ratio]

    tot_s = sum(r["small_s"] for r in rows)
    tot_b = sum(r["big_s"] for r in rows)
    print(f"{len(rows)} common queries; data ratio x{data_ratio:g}; "
          f"total wall {tot_s:.1f}s -> {tot_b:.1f}s "
          f"(x{tot_b / tot_s:.2f})")
    print(f"super-linear (> x{data_ratio:g}): {len(sup)}; "
          f"~linear (x{0.5 * data_ratio:g}..x{data_ratio:g}): {len(lin)}; "
          f"sub-linear (<= x{0.5 * data_ratio:g}): {len(sub)}")
    print(f"\n{'ratio':>7} {'small':>8} {'big':>8}  query")
    for r in rows[:25]:
        print(f"x{r['ratio']:6.2f} {r['small_s']:8.3f} {r['big_s']:8.3f}  "
              f"{r['query']}")

    if out:
        json.dump({"data_ratio": data_ratio,
                   "small_sf": small.get("sf"), "big_sf": big.get("sf"),
                   "total_small_s": tot_s, "total_big_s": tot_b,
                   "super_linear": [r["query"] for r in sup],
                   "rows": rows}, open(out, "w"), indent=1)
        print(f"\nwrote {out}")

if __name__ == "__main__":
    main()
