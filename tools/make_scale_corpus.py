"""Build a K×-scale replica of a testdata SF directory for scale audits.

The driver's corpora stop at sf0.1; the 100 TB story rests on the claim
that each query's shuffle volume scales LINEARLY with its input (flat
shuf/in ratio). This tool manufactures the next decade of scale so the
claim can be MEASURED rather than argued: every table is replicated K
times with per-replica key offsets, so each replica is a self-contained
shard — join multiplicities, group sizes per key, and selectivities are
preserved while global cardinality grows ×K. Fixed dimensions
(region/nation) are copied once, exactly like a real lakehouse where
dims grow slower than facts.

Documents/embeddings replicate with offset ids but IDENTICAL payloads,
which makes the dedup family's job strictly HARDER at scale (every doc
gains K exact copies → K-sized duplicate groups in every bucket) — the
right direction for a stress corpus.

Pure pyarrow, no Spark: sf0.1 is ~17 MB, so sf1 lands in seconds.

Usage: python tools/make_scale_corpus.py [--src /root/testdata/sf0.1]
           [--dst .scale/sf1] [--k 10]
"""

from __future__ import annotations

import argparse
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# table -> {column: offset-domain}; columns sharing a domain shift by the
# same stride so referential integrity holds across tables
KEYED = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part", "l_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
COPY_ONCE = ("region", "nation")


def build_realistic_dups(
    src: str, dst: str, k: int = 10, dup_mod: int = 10, dup_copies: int = 3
) -> None:
    """The NON-pathological duplication replica (VERDICT r7 #5): the
    identical-payload ×K replica above is maximally adversarial for pair
    emission (every item gains K exact copies → every dup group's pair
    count grows K²); real corpora duplicate a FRACTION of items a few
    times. Here documents/embeddings still grow ×K, but replica i > 0
    gets a payload that is genuinely NOT a near-dup of any other
    replica's — EXCEPT items with id % dup_mod == 0, which keep
    identical payloads in replicas 1..dup_copies-1: 1/dup_mod of base
    items end up with exactly ``dup_copies`` exact copies, the realistic
    web-dedup shape (10% duplicated ×3 by default).

    The cross-replica transformations must break NEAR-dup similarity,
    not just exact equality (a first attempt appended ` r{i}` to the
    text, which left every replica pair at Jaccard ≈ 0.99 — an
    accidentally-pathological corpus whose pair answer was quadratic
    anyway), while preserving WITHIN-replica structure so the base
    corpus's true near-dup pairs replicate linearly:

    - text: a per-replica substitution of the most common letters
      (etaoinsrhld → rotated by i). Most 4-gram shingles contain one, so
      cross-replica Jaccard collapses ≪ 0.6; within a replica every doc
      gets the SAME map, so within-replica Jaccard is ~preserved.
    - embeddings: a per-replica deterministic ±1 sign pattern s_i
      multiplied elementwise. dot(s_i⊙a, s_i⊙b) = dot(a, b), so
      within-replica cosines are EXACTLY preserved; cross-replica dots
      see ~half the terms sign-flipped → cosine ≈ 0 ≪ 0.4.

    The other tables are replicated identically to the base replica."""
    import numpy as np

    os.makedirs(dst, exist_ok=True)
    for t in COPY_ONCE:
        pq.write_table(pq.read_table(f"{src}/{t}.parquet"), f"{dst}/{t}.parquet")

    # 11 letters > k replicas, so every rotation 0..k-1 is a DISTINCT
    # map (a 7-letter first cut collided at i=7: replica 7 == replica 0,
    # silently duplicating every doc)
    common = "etaoinsrhld"

    def letter_map(i: int) -> dict[int, str]:
        rot = "".join(common[(j + i) % len(common)] for j in range(len(common)))
        m = {}
        for a, b in zip(common, rot):
            m[ord(a)] = b
            m[ord(a.upper())] = b.upper()
        return m

    # documents: offset ids, per-replica letter substitution except the
    # duplicated slice
    docs = pq.read_table(f"{src}/documents.parquet")
    ids = docs["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
    stride = int(ids.max()) + 1
    texts = docs["text"].combine_chunks().to_pylist()
    keep_identical = (ids % dup_mod) == 0
    replicas = []
    for i in range(k):
        lm = letter_map(i)
        cols = {}
        for name in docs.column_names:
            col = docs[name].combine_chunks()
            if name == "doc_id" and i > 0:
                col = pc.add(col, i * stride).cast(docs.schema.field(name).type)
            elif name == "text" and i > 0:
                col = pa.array(
                    [
                        t if (t is None or (keep_identical[j] and i < dup_copies))
                        else t.translate(lm)
                        for j, t in enumerate(texts)
                    ],
                    pa.string(),
                )
            cols[name] = col
        replicas.append(pa.table(cols))
    out = pa.concat_tables(replicas)
    pq.write_table(out, f"{dst}/documents.parquet")
    print(f"documents: {docs.num_rows} -> {out.num_rows} (realistic dups)")

    # embeddings: offset ids, per-replica sign pattern except the dup slice
    emb = pq.read_table(f"{src}/embeddings.parquet")
    vids = emb["vec_id"].combine_chunks().to_numpy(zero_copy_only=False)
    vstride = int(vids.max()) + 1
    vecs = emb["embedding"].combine_chunks().to_pylist()
    vkeep = (vids % dup_mod) == 0
    dim_guess = max((len(v) for v in vecs if v is not None), default=0)
    # seeded RNG per replica: distinct pattern for every i (an arithmetic
    # (j*c + i) % 7 pattern collided at i=7, reproducing replica 0)
    signs = {
        i: np.random.RandomState(1000 + i)
        .choice([-1.0, 1.0], size=dim_guess)
        .astype(np.float32)
        for i in range(1, k)
    }
    replicas = []
    for i in range(k):
        cols = {}
        for name in emb.column_names:
            col = emb[name].combine_chunks()
            if name == "vec_id" and i > 0:
                col = pc.add(col, i * vstride).cast(emb.schema.field(name).type)
            elif name == "embedding" and i > 0:
                s = signs[i]
                col = pa.array(
                    [
                        v if (v is None or (vkeep[j] and i < dup_copies))
                        else list(
                            (np.asarray(v, dtype=np.float32) * s[: len(v)])
                        )
                        for j, v in enumerate(vecs)
                    ],
                    emb.schema.field(name).type,
                )
            cols[name] = col
        replicas.append(pa.table(cols))
    out = pa.concat_tables(replicas)
    pq.write_table(out, f"{dst}/embeddings.parquet")
    print(f"embeddings: {emb.num_rows} -> {out.num_rows} (realistic dups)")

    # remaining tables: identical replication to the base replica
    for t, cols in KEYED.items():
        if t in ("documents", "embeddings"):
            continue
        srctab = pq.read_table(f"{src}/{t}.parquet")
        strides = {}
        for col, dom in cols.items():
            mx = pc.max(srctab[col]).as_py() or 0
            strides[col] = int(mx) + 1
        reps = []
        for i in range(k):
            arrays = []
            for name in srctab.column_names:
                col = srctab[name].combine_chunks()
                if name in cols and i > 0:
                    col = pc.add(col, i * strides[name])
                    col = col.cast(srctab.schema.field(name).type)
                arrays.append(col)
            reps.append(pa.table(dict(zip(srctab.column_names, arrays))))
        out = pa.concat_tables(reps)
        pq.write_table(out, f"{dst}/{t}.parquet")
        print(f"{t}: {srctab.num_rows} -> {out.num_rows}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default=".scale/sf1")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument(
        "--realistic-dups", action="store_true",
        help="perturb replica payloads so only 10%% of docs/vectors gain "
        "3 exact copies (the non-pathological dup-rate corpus)",
    )
    args = ap.parse_args()
    if args.realistic_dups:
        build_realistic_dups(args.src, args.dst, args.k)
        return
    build_identical(args.src, args.dst, args.k)


def build_identical(src_dir: str, dst: str, k: int) -> None:
    """The identical-payload xK replica described in the module
    docstring — every document/embedding gains k exact copies (the
    maximally duplicate-heavy stress corpus for the dedup family)."""
    os.makedirs(dst, exist_ok=True)

    tables = {t: pq.read_table(f"{src_dir}/{t}.parquet")
              for t in (*COPY_ONCE, *KEYED)}

    # one stride per key DOMAIN: max over every column that uses it, +1
    stride: dict[str, int] = {}
    for t, cols in KEYED.items():
        for col, dom in cols.items():
            mx = pc.max(tables[t][col]).as_py() or 0
            stride[dom] = max(stride.get(dom, 0), int(mx) + 1)

    for t in COPY_ONCE:
        pq.write_table(tables[t], f"{dst}/{t}.parquet")

    for t, cols in KEYED.items():
        src = tables[t]
        replicas = []
        for i in range(k):
            arrays = []
            for name in src.column_names:
                col = src[name].combine_chunks()
                if name in cols and i > 0:
                    col = pc.add(col, i * stride[cols[name]])
                    col = col.cast(src.schema.field(name).type)
                arrays.append(col)
            replicas.append(pa.table(dict(zip(src.column_names, arrays))))
        out = pa.concat_tables(replicas)
        pq.write_table(out, f"{dst}/{t}.parquet")
        print(f"{t}: {src.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    main()
