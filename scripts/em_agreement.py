#!/usr/bin/env python3
"""em3-vs-em1 agreement rate (dev tooling): quantify the approximate
IVF-prefiltered closest pair (em3) against the exact witness (em1) at a
scale point where both run — the em-family twin of sim3's committed
recall@10 figure.

Reads the two Verify dumps (parquet dirs) and reports, per corpus:
  - exact agreement: fraction of labels where em3 returns em1's exact
    (va, vb) pair;
  - for disagreeing labels, the cosine shortfall em1.cos - em3.cos
    (how much worse the co-celled pair is than the true closest), with
    mean/max;
  - labels em1 found but em3 dropped (no same-label pair co-cells).

Usage: python3 scripts/em_agreement.py <verifyOutDir>
  (expects <dir>/em1_blocked_closest_pair and
   <dir>/em3_ivf_closest_pair parquet dumps)
"""
import json
import sys

import duckdb


def main():
    d = sys.argv[1]
    con = duckdb.connect()
    em1 = f"'{d}/em1_blocked_closest_pair/*.parquet'"
    em3 = f"'{d}/em3_ivf_closest_pair/*.parquet'"
    row = con.sql(f"""
      WITH j AS (
        SELECT a.label,
               a.va AS va1, a.vb AS vb1, a.cos AS cos1,
               b.va AS va3, b.vb AS vb3, b.cos AS cos3
        FROM {em1} a LEFT JOIN {em3} b USING (label))
      SELECT count(*) AS labels,
             sum(CASE WHEN va1 = va3 AND vb1 = vb3 THEN 1 ELSE 0 END) AS exact,
             sum(CASE WHEN va3 IS NULL THEN 1 ELSE 0 END) AS dropped,
             avg(CASE WHEN va3 IS NOT NULL AND (va1 <> va3 OR vb1 <> vb3)
                      THEN cos1 - cos3 END) AS mean_cos_shortfall,
             max(CASE WHEN va3 IS NOT NULL AND (va1 <> va3 OR vb1 <> vb3)
                      THEN cos1 - cos3 END) AS max_cos_shortfall
      FROM j""").fetchone()
    labels, exact, dropped, mean_sf, max_sf = row
    out = {
        "labels": labels,
        "exact_pair_agreement": round(exact / labels, 4),
        "dropped_labels": dropped,
        "mean_cos_shortfall_on_disagreement":
            None if mean_sf is None else round(mean_sf, 6),
        "max_cos_shortfall_on_disagreement":
            None if max_sf is None else round(max_sf, 6),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
