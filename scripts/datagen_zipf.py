#!/usr/bin/env python3
"""Adversarial SKEWED-LABEL embedding corpus generator (dev tooling,
like datagen_lowdup.py): the worst case for the em-family's blocked
pair generation.

The em1/em2/em3 pair generators (ops/Similarity.scala blockedPairs)
bound per-task pair work with a triangle decomposition whose bucket
count m = ceil(|label block| / maxBlock) is computed PER LABEL — the
design claim is that a hot label fans its |block|² pair work out over
m(m+1)/2 bounded bucket-pair tasks instead of funnelling it through
one shuffle task. Every committed scale point so far (datagen.py
replication) has near-UNIFORM labels (10 labels, ~equal shares), which
never exercises that claim: m is the same for every label, so skew
handling is indistinguishable from plain parallelism. A 100 TB crawl
corpus has hot labels.

This script produces the skewed shape at the same scale: embeddings
replicated `mult`× exactly like datagen.py (vec_id offset per replica,
payload unchanged — replicas are exact cos=1.0 dups, the dup-heavy
crawl shape), but `label` REASSIGNED by a Zipf(s=1) draw over 10
labels: P(label k) = (1/(k+1)) / H_10, so label 0 owns ~34.1% of all
vectors (~205k of 600k at mult 300, a ~3.4× hotter block than the
uniform corpus' largest) and label 9 ~3.4%. The draw is the
golden-ratio Kronecker sequence u(i) = frac(i · φ⁻¹) (implemented as
(i·2654435761) mod 2³² / 2³², a low-discrepancy equidistributed
sequence, deterministic pure-integer math — no engine hash, no RNG
state), cut against the Zipf CDF. Deterministic in vec_id, so the
corpus regenerates bit-identically.

Slice twins keep working unchanged: vec_id offsets are multiples of
the base count (asserted multiple of 40), so `vec_id % 40 = 0` keeps
every replica of the selected base vectors AND the label draw is a
pure function of vec_id — the slice sees the same skewed shape.

Other tables are symlinked from the source sf dir (check.py builds a
view per table; the em/sim queries only read embeddings).

Usage: python3 scripts/datagen_zipf.py <srcSfDir> <outDir> [mult=300]
  e.g. python3 scripts/datagen_zipf.py /root/testdata/sf0.1 scratch/zipf30
"""
import os
import sys

import duckdb

N_LABELS = 10


def zipf_cdf(n):
    h = sum(1.0 / k for k in range(1, n + 1))
    cum, acc = [], 0.0
    for k in range(1, n + 1):
        acc += (1.0 / k) / h
        cum.append(acc)
    cum[-1] = 1.0000001  # float-safe top bucket
    return cum


def main():
    src = sys.argv[1]
    out = sys.argv[2]
    mult = int(sys.argv[3]) if len(sys.argv) > 3 else 300
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET memory_limit='"
                f"{os.environ.get('SPARK_GRAFT_DUCK_MEM', '70GB')}'")
    tmp = os.environ.get("SPARK_GRAFT_DUCK_TMP", "scratch/duck_tmp")
    os.makedirs(tmp, exist_ok=True)
    con.execute(f"SET temp_directory='{tmp}'")
    con.execute(f"SET max_temp_directory_size='"
                f"{os.environ.get('SPARK_GRAFT_DUCK_TMP_CAP', '40GB')}'")

    src_emb = f"{src}/embeddings.parquet"
    rd = f"'{src_emb}/*.parquet'" if os.path.isdir(src_emb) else f"'{src_emb}'"
    n_vec = con.sql(f"SELECT max(vec_id) + 1 FROM {rd}").fetchone()[0]
    cnt = con.sql(f"SELECT count(*) FROM {rd}").fetchone()[0]
    assert cnt == n_vec, f"vec_id not dense 0..{n_vec - 1} ({cnt} rows)"
    assert n_vec % 40 == 0, \
        f"base count {n_vec} not a multiple of 40 — breaks vec_id%40 slice twins"

    cum = zipf_cdf(N_LABELS)
    # label = first k with u < cum[k]; CASE keeps it pure SQL arithmetic
    cases = " ".join(
        f"WHEN u < {cum[k]!r} THEN {k}" for k in range(N_LABELS))
    gen = f"""
      WITH rep AS (
        SELECT vec_id + r.i * {n_vec} AS vec_id, embedding
        FROM {rd} CROSS JOIN (SELECT unnest(range({mult})) AS i) r),
      drawn AS (
        SELECT vec_id, embedding,
               ((vec_id * 2654435761) % 4294967296) / 4294967296.0 AS u
        FROM rep)
      SELECT vec_id, embedding,
             CAST(CASE {cases} END AS INTEGER) AS label
      FROM drawn
    """
    tgt = f"{out}/embeddings.parquet"
    os.makedirs(tgt, exist_ok=True)
    nfiles = 32
    con.execute("DROP TABLE IF EXISTS _gen")
    con.execute(f"CREATE TEMP TABLE _gen AS ({gen})")
    for j in range(nfiles):
        con.execute(
            f"COPY (SELECT * FROM _gen WHERE vec_id % {nfiles} = {j}) "
            f"TO '{tgt}/part_{j:02d}.parquet' (FORMAT PARQUET)")
    con.execute("DROP TABLE IF EXISTS _gen")

    n = n_vec * mult
    got = con.sql(
        f"SELECT count(*), count(DISTINCT vec_id), min(label), max(label) "
        f"FROM '{tgt}/*.parquet'").fetchone()
    assert got == (n, n, 0, N_LABELS - 1), f"bad corpus shape: {got}"
    shares = con.sql(
        f"SELECT label, count(*) / {n}.0 AS share FROM '{tgt}/*.parquet' "
        f"GROUP BY 1 ORDER BY 1").fetchall()
    hot = shares[0][1]
    # the whole point: one label owns ~34% (Zipf(1) head over 10 labels)
    assert 0.33 < hot < 0.35, f"hot-label share {hot} outside [0.33, 0.35]"
    print(f"wrote {tgt}: {n} vectors, label shares "
          + " ".join(f"{l}:{s:.3f}" for l, s in shares))

    # symlink the remaining tables so check.py can register every view
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents"]:
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(os.path.abspath(f"{src}/{t}.parquet"), dst)
    print("symlinked non-embedding tables from", src)


if __name__ == "__main__":
    main()
