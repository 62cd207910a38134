#!/usr/bin/env python3
"""Suite-level scale slopes from two same-session bench_detail.json
captures (VERDICT r15 #6): slope = ln(t_big/t_small)/ln(ratio) per
query over the sequential per-query MEDIANS, plus the suite wall slope.

Usage: python3 tools/slope.py small_detail.json big_detail.json [ratio=10]

Reading guide (same convention as SCALE.md): slope 1.0 = linear in
corpus size, < 1 sublinear, ~0 flat (fixture/job-floor gates that do
not read the corpus), > 1 superlinear — only acceptable for documented
quadratic verification oracles (q34/q46 class).
"""
import json
import math
import sys


def main():
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    qs, qb = small["queries"], big["queries"]
    rows = []
    for name in sorted(qs):
        if name not in qb:
            continue
        t0, t1 = qs[name], qb[name]
        if t0 <= 0 or t1 <= 0:
            continue
        rows.append((math.log(t1 / t0) / math.log(ratio), t0, t1, name))
    rows.sort(reverse=True)
    print(f"{'slope':>6} {'t_small':>8} {'t_big':>8}  query")
    for s, t0, t1, name in rows:
        print(f"{s:6.2f} {t0:8.2f} {t1:8.2f}  {name}")
    w0, w1 = small["seq_wall"], big["seq_wall"]
    print(f"\nsuite seq wall: {w0:.1f} -> {w1:.1f} s  "
          f"(slope {math.log(w1 / w0) / math.log(ratio):.2f} @ {ratio:g}x)")
    s0 = sum(qs[n] for _, _, _, n in rows)
    s1 = sum(qb[n] for _, _, _, n in rows)
    print(f"sum of medians: {s0:.1f} -> {s1:.1f} s  "
          f"(slope {math.log(s1 / s0) / math.log(ratio):.2f})")
    over = [r for r in rows if r[0] > 1.05]
    print(f"\nsuperlinear (> 1.05): {len(over)}")
    for s, t0, t1, name in over:
        print(f"  {name}: {s:.2f}")


if __name__ == "__main__":
    main()
