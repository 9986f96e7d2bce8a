#!/usr/bin/env python3
"""Cross-scale trend table (dev tooling only — not part of the shipped
library). Reads the committed BENCH_<tag>.json records and prints, per
query, the Spark wall seconds at each scale point plus the fitted
scaling exponent alpha where time ~ data^alpha over the largest scale
step (log-log slope between the two biggest points measured).

alpha ~ 1.0  => linear scaling (the 100 TB story holds)
alpha < 1.0  => sublinear (fixed floors still amortizing)
alpha > 1.3  => superlinear — flag for a plan audit

Usage: python3 scripts/scaletrend.py [tag:mult ...]
Defaults: sf1:10 sf3:30 sf10:100 (+ sf30:300 when BENCH_sf30.json exists)
"""
import json
import math
import os
import sys


def main():
    pairs = [a.split(":") for a in sys.argv[1:]] or [
        ["sf1", "10"], ["sf3", "30"], ["sf10", "100"], ["sf30", "300"]]
    points = []
    for tag, mult in pairs:
        path = f"BENCH_{tag}.json"
        if not os.path.exists(path):
            continue
        d = json.load(open(path))
        points.append((tag, float(mult), d["queries"], d["value"]))
    if len(points) < 2:
        sys.exit("need at least two BENCH_<tag>.json records")

    names = sorted(set().union(*(set(p[2]) for p in points)))
    tags = [p[0] for p in points]
    header = ["query"] + [f"{t} (s)" for t in tags] + ["alpha"]
    rows = []
    for n in names:
        secs = [p[2].get(n) for p in points]
        # exponent over the last step where both endpoints exist AND are
        # positive (`s is not None`: a recorded 0.0 is a data point, not a
        # missing one, but log needs > 0; -1.0 marks a failed query). The
        # endpoints actually used are named in the cell — a mid-size gap
        # would otherwise silently relabel which step alpha measures.
        alpha = ""
        have = [(t, m, s) for (t, m, _, _), s in zip(points, secs)
                if s is not None and s > 0]
        if len(have) >= 2:
            (t0, m0, s0), (t1, m1, s1) = have[-2], have[-1]
            alpha = (f"{math.log(s1 / s0) / math.log(m1 / m0):.2f}"
                     f" ({t0}→{t1})")
        rows.append([n] + [f"{s:.2f}" if s is not None else "—"
                           for s in secs] + [alpha])
    totals = (["TOTAL"] + [f"{p[3]:.1f}" for p in points] +
              [f"{math.log(points[-1][3] / points[-2][3]) / math.log(points[-1][1] / points[-2][1]):.2f}"])

    widths = [max(len(r[i]) for r in [header, totals] + rows)
              for i in range(len(header))]
    def fmt(r):
        return "| " + " | ".join(c.ljust(w) for c, w in zip(r, widths)) + " |"
    print(fmt(header))
    print("|" + "|".join("-" * (w + 2) for w in widths) + "|")
    for r in rows:
        print(fmt(r))
    print(fmt(totals))

    # flag superlinear real-work queries (>=1s at the largest point)
    def alpha_val(cell):
        return float(cell.split()[0]) if cell else None
    flagged = [r for r in rows
               if r[-1] and alpha_val(r[-1]) > 1.3 and r[-2] != "—"
               and float(r[-2]) >= 1.0]
    if flagged:
        print("\nsuperlinear (alpha>1.3, >=1s at largest point):")
        for r in flagged:
            print(f"  {r[0]}  alpha={r[-1]}  {r[-2]}s")


if __name__ == "__main__":
    main()
