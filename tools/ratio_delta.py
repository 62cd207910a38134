#!/usr/bin/env python3
"""Ratio-regression detector (VERDICT r16 #7): diff two rounds'
per-query duckdb ratios and flag any query whose ratio moved more than
a threshold (default 1.5x) in either direction.

Why ratios, not walls: each BENCH capture computes graft AND DuckDB in
the SAME session on the SAME box, so the per-query ratio divides out
box contention that makes cross-round wall comparisons meaningless
(the standing SCALE.md rule). A ratio that moves >1.5x across rounds
is therefore a real plan/code change (or a query whose absolute times
are so small that job-floor jitter dominates — the `tiny` column marks
pairs where either engine ran under 50 ms, where a 1.5x swing can be
pure scheduling noise).

Usage: python3 tools/ratio_delta.py BENCH_r16.json BENCH_r17.json [threshold=1.5]

Accepts both clean bench JSON lines and the driver's wrapped artifacts
(which stash the truncated raw line under a 'tail' key).
"""
import json
import re
import sys


def load_ratio_maps(path):
    """Return (ratios, graft_times, duck_times) dicts from a bench JSON
    file — either a clean {"metric": ...} line or the driver's wrapper
    with the raw line under 'tail'."""
    text = open(path).read()
    try:
        d = json.loads(text)
    except json.JSONDecodeError:
        d = {"tail": text}
    if isinstance(d, dict) and "ratios" in d:
        return d["ratios"], d.get("queries", {}), d.get("queries_duckdb", {})
    blob = d.get("tail", "") if isinstance(d, dict) else ""

    def grab(key):
        m = re.search(r'"%s":\{(.*?)\}' % key, blob)
        if not m:
            return {}
        out = {}
        for kv in re.finditer(r'"(q\w+)":([0-9.]+)', m.group(1)):
            out[kv.group(1)] = float(kv.group(2))
        return out

    return grab("ratios"), grab("queries"), grab("queries_duckdb")


def main():
    a_path, b_path = sys.argv[1], sys.argv[2]
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    ra, ga, da = load_ratio_maps(a_path)
    rb, gb, db = load_ratio_maps(b_path)
    common = sorted(set(ra) & set(rb))
    if not common:
        print("no common ratio entries — are these driver bench artifacts?")
        sys.exit(2)
    flagged = []
    print(f"{'query':>6} {'r_prev':>8} {'r_cur':>8} {'delta':>7}  note")
    for q in common:
        p, c = ra[q], rb[q]
        if p <= 0 or c <= 0:
            continue
        delta = c / p
        tiny = (da.get(q, 1) < 0.05 or db.get(q, 1) < 0.05 or
                ga.get(q, 1) < 0.05 or gb.get(q, 1) < 0.05)
        moved = delta > thr or delta < 1 / thr
        note = ("tiny" if tiny else "") + (" FLAG" if moved and not tiny else "") \
            + (" moved-but-tiny" if moved and tiny else "")
        if moved:
            flagged.append((q, p, c, delta, tiny))
        if moved or abs(delta - 1) > 0.25:
            print(f"{q:>6} {p:8.2f} {c:8.2f} {delta:6.2f}x  {note}")
    real = [f for f in flagged if not f[4]]
    print(f"\n{len(common)} common queries, {len(flagged)} moved >{thr}x, "
          f"{len(real)} on non-tiny timings (these need a root cause)")
    sys.exit(1 if real else 0)


if __name__ == "__main__":
    main()
