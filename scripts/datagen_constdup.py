#!/usr/bin/env python3
"""Constant-dup-rate scaling corpus (dev tooling, driver-side libs only).

TREND.md attributes the t6/t8/em3 alpha~1.5-2.0 flags to datagen.py's
replica construction: every base doc/vector is copied mult times
UNCHANGED, so TRUE duplicate pairs grow ~quadratically with scale and
any operator whose work tracks real dup structure must follow. This
generator is the direct test the round-18 verdict asked for: scale N
while holding the dup structure CONSTANT per row, so a linear-work
operator shows alpha ~= 1.

Construction, per base doc/vector and replica i in range(mult):
  - 5% of base ids (id % 20 == 0) form exact-dup families of size 2:
    replicas are paired (0,1), (2,3), ... and both members carry the
    PAIR tag's content -> dup-pair count = 2.5% of N, linear in N.
  - every other replica gets UNIQUE content: each 2nd token is suffixed
    with the replica tag, so no 3-token shingle window survives intact
    between replicas (Jaccard across replicas ~ 0, unlike a prefix tag
    which would leave replicas near-dups and keep the quadratic pair
    growth this corpus exists to remove).
  - embeddings: non-dup replicas get deterministic seeded noise
    (renormalized), dup pairs are bit-identical; label space scales
    with the replica window (label + 10*tag) so per-(label,cell) block
    populations stay CONSTANT as N grows — a real growing corpus adds
    groups, it does not grow 10 fixed groups without bound (datagen.py
    keeps the source's 10 labels at every mult, which by itself forces
    quadratic pair work on any blocked pair operator).

Only documents.parquet + embeddings.parquet are written (the t6/t8/em3
surface reads nothing else).

Usage: python3 scripts/datagen_constdup.py <srcSfDir> <outDir> <mult>
"""
import sys
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def mutate_text(text: str, tag: int) -> str:
    if tag == 0:
        return text
    toks = text.split(" ")
    # suffix every 2nd token: no 3-token window is left unmutated, so
    # cross-replica shingle Jaccard collapses to ~0
    for j in range(0, len(toks), 2):
        toks[j] = f"{toks[j]}x{tag}"
    return " ".join(toks)


def main() -> None:
    src, out, mult = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(out, exist_ok=True)

    docs = pq.read_table(f"{src}/documents.parquet")
    n_doc = docs.num_rows
    doc_id = docs.column("doc_id").to_numpy()
    text = docs.column("text").to_pylist()
    lang = docs.column("lang").to_pylist()
    source = docs.column("source").to_pylist()

    ids, texts, langs, sources, nchars = [], [], [], [], []
    for i in range(mult):
        for k in range(n_doc):
            base = int(doc_id[k])
            is_dup_family = base % 20 == 0
            # dup families: replicas pair (0,1),(2,3),... and share the
            # pair tag's content; everyone else is unique per replica
            tag = (i - (i % 2)) if is_dup_family else i
            t = mutate_text(text[k], tag)
            ids.append(base + i * n_doc)
            texts.append(t)
            langs.append(lang[k])
            sources.append(source[k])
            nchars.append(len(t))
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string()),
                  "lang": pa.array(langs, pa.string()),
                  "source": pa.array(sources, pa.string()),
                  "n_chars": pa.array(nchars, pa.int64())}),
        f"{out}/documents.parquet",
        # small row groups: parquet scan splits are row-group-bounded,
        # and pyarrow's 1M-row default would make the whole table one
        # split (one core) at these corpus sizes
        row_group_size=32768)
    print(f"documents: {len(ids)} rows "
          f"({n_doc // 20 * (mult // 2)} exact-dup pairs, "
          f"rate {(n_doc // 20 * (mult // 2)) / len(ids):.3%} of rows)")

    emb = pq.read_table(f"{src}/embeddings.parquet")
    n_vec = emb.num_rows
    vec_id = emb.column("vec_id").to_numpy()
    label = emb.column("label").to_numpy()
    vecs = np.array(emb.column("embedding").to_pylist(), dtype=np.float32)
    dim = vecs.shape[1]

    all_ids, all_labels, all_vecs = [], [], []
    for i in range(mult):
        is_dup = (vec_id % 20) == 0
        tag = np.where(is_dup, i - (i % 2), i)
        rng = np.random.default_rng(1000 + i)
        noise = rng.standard_normal((n_vec, dim)).astype(np.float32) * 0.05
        v = vecs + noise
        if i % 2 == 1:
            # dup members copy their pair-mate's exact bits (replica i-1)
            rng_prev = np.random.default_rng(1000 + i - 1)
            noise_prev = rng_prev.standard_normal(
                (n_vec, dim)).astype(np.float32) * 0.05
            v[is_dup] = (vecs + noise_prev)[is_dup]
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        all_ids.append(vec_id + i * n_vec)
        all_labels.append(label + 10 * tag)
        all_vecs.append(v)
    ids_a = np.concatenate(all_ids)
    labels_a = np.concatenate(all_labels).astype(np.int32)
    vecs_a = np.concatenate(all_vecs)
    pq.write_table(
        pa.table({"vec_id": pa.array(ids_a, pa.int64()),
                  "embedding": pa.array(list(vecs_a), pa.list_(pa.float32())),
                  "label": pa.array(labels_a, pa.int32())}),
        f"{out}/embeddings.parquet",
        row_group_size=32768)
    print(f"embeddings: {len(ids_a)} rows, "
          f"{len(np.unique(labels_a))} labels")


if __name__ == "__main__":
    main()
