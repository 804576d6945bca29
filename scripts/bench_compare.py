#!/usr/bin/env python3
"""Compare two Bench JSON lines (e.g. sf0.1 vs the all-axes 10x
fixture) and print a ratio table: per-query seconds, ratio, sorted by
ratio descending, with a super-linear flag relative to the given data
growth factor.

Usage: python3 scripts/bench_compare.py BASE.json SCALED.json [growth]
growth defaults to 10.0 — ratios above it are flagged SUPER-LINEAR.
"""
import json
import sys


def load(path):
    with open(path) as f:
        txt = f.read()
    # Bench prints one JSON object; tolerate surrounding log lines
    for line in txt.splitlines():
        line = line.strip()
        if line.startswith("{") and '"queries"' in line:
            return json.loads(line)
    return json.loads(txt)


def main(base_p, scaled_p, growth=10.0):
    base, scaled = load(base_p), load(scaled_p)
    bq, sq = base["queries"], scaled["queries"]
    common = sorted(set(bq) & set(sq))
    rows = []
    for q in common:
        b, s = bq[q], sq[q]
        ratio = s / b if b > 0 else float("inf")
        rows.append((ratio, q, b, s))
    rows.sort(reverse=True)
    print(f"{'query':42s} {'base_s':>8s} {'scaled_s':>9s} {'ratio':>7s}")
    flagged = 0
    for ratio, q, b, s in rows:
        flag = "  SUPER-LINEAR" if ratio > growth else ""
        if flag:
            flagged += 1
        print(f"{q:42s} {b:8.2f} {s:9.2f} {ratio:6.1f}x{flag}")
    tb = sum(bq[q] for q in common)
    ts = sum(sq[q] for q in common)
    print(f"\n{len(common)} queries; total {tb:.1f}s -> {ts:.1f}s "
          f"({ts / tb:.2f}x total) for {growth:.0f}x data; "
          f"{flagged} queries above the {growth:.0f}x line")


if __name__ == "__main__":
    g = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    main(sys.argv[1], sys.argv[2], g)
