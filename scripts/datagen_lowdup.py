#!/usr/bin/env python3
"""Adversarial LOW-duplication corpus generator (dev tooling, like
datagen.py): the worst case for the set-level dedup rewrites.

The t6/t8/t11 headline optimization (ops/Dedup.scala groupReps) banks on
dup-heavy corpora concentrating docs onto few distinct
signatures/shingle-sets — the shape scripts/datagen.py produces by
replicating each base doc `mult`x. This script produces the DEGENERATE
opposite at the same scale: every doc's text is unique pseudo-random
words (md5-derived, deterministic in doc_id), so distinct signatures ≈
doc count and the groupReps groupBy + two id-expansion joins are pure
overhead. The committed worst-case record (README "worst-case corpus"
section) compares the t-family bench on this corpus against the
dup-heavy BENCH_sf30 numbers.

Shape matches the driver's documents table at the sf30 point: 1.5M rows
(300x the sf0.1 count), word counts uniform-ish in [10, 100] (the sf0.1
distribution's range, avg ~55 vs the base's 54), 5-char words so per-doc
char volume tracks the base's ~297-char average (~330 here — an 8-char
word would inflate the scan/tokenize side 1.66x and bias the bench
comparison), same 5 langs / 20 sources, same schema (doc_id BIGINT,
text, lang, source, n_chars), same 32-file id-sharded directory layout
(scan parallelism — see datagen.py's split rationale). The 5-char md5
prefixes double as a realistic shared vocabulary (~1M distinct words):
individual words and even the odd shingle may repeat across docs, but
texts are pairwise distinct (asserted) and shingle SETS are ~disjoint —
distinct MinHash signatures ≈ doc count, the degenerate case under
test.

Usage: python3 scripts/datagen_lowdup.py <outDir> [nDocs=1500000]
"""
import os
import sys

import duckdb


def main():
    out = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_500_000
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET memory_limit='"
                f"{os.environ.get('SPARK_GRAFT_DUCK_MEM', '70GB')}'")
    tmp = os.environ.get("SPARK_GRAFT_DUCK_TMP", "scratch/duck_tmp")
    os.makedirs(tmp, exist_ok=True)
    con.execute(f"SET temp_directory='{tmp}'")
    con.execute(f"SET max_temp_directory_size='"
                f"{os.environ.get('SPARK_GRAFT_DUCK_TMP_CAP', '40GB')}'")

    langs = ["de", "en", "es", "fr", "zh"]
    gen = f"""
      SELECT i AS doc_id,
             array_to_string(list_transform(
               range(10 + (i * 7919) % 91),
               j -> substr(md5(CAST(i AS VARCHAR) || '-' ||
                               CAST(j AS VARCHAR)), 1, 5)), ' ') AS text,
             (ARRAY{langs})[1 + i % 5] AS lang,
             'src' || CAST(i % 20 AS VARCHAR) AS source,
             CAST(6 * (10 + (i * 7919) % 91) - 1 AS BIGINT) AS n_chars
      FROM (SELECT unnest(range({n})) AS i)
    """
    tgt = f"{out}/documents.parquet"
    os.makedirs(tgt, exist_ok=True)
    nfiles = 32
    con.execute("DROP TABLE IF EXISTS _gen")
    con.execute(f"CREATE TEMP TABLE _gen AS ({gen})")
    for j in range(nfiles):
        con.execute(
            f"COPY (SELECT * FROM _gen WHERE doc_id % {nfiles} = {j}) "
            f"TO '{tgt}/part_{j:02d}.parquet' (FORMAT PARQUET)")
    con.execute("DROP TABLE IF EXISTS _gen")
    got = con.sql(f"SELECT count(*), count(DISTINCT text) "
                  f"FROM '{tgt}/*.parquet'").fetchone()
    assert got[0] == n and got[1] == n, f"expected {n} unique docs, got {got}"
    # n_chars must equal length(text): every word is exactly 5 chars +
    # (W-1) separators = 6W - 1
    bad = con.sql(f"SELECT count(*) FROM '{tgt}/*.parquet' "
                  f"WHERE n_chars <> length(text)").fetchone()[0]
    assert bad == 0, f"{bad} rows with n_chars <> length(text)"
    print(f"wrote {tgt}: {n} docs, all texts distinct")


if __name__ == "__main__":
    main()
