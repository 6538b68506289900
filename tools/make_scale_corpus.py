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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default=".scale/sf1")
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)

    tables = {t: pq.read_table(f"{args.src}/{t}.parquet")
              for t in (*COPY_ONCE, *KEYED)}

    # one stride per key DOMAIN: max over every column that uses it, +1
    stride: dict[str, int] = {}
    for t, cols in KEYED.items():
        for col, dom in cols.items():
            mx = pc.max(tables[t][col]).as_py() or 0
            stride[dom] = max(stride.get(dom, 0), int(mx) + 1)

    for t in COPY_ONCE:
        pq.write_table(tables[t], f"{args.dst}/{t}.parquet")

    for t, cols in KEYED.items():
        src = tables[t]
        replicas = []
        for i in range(args.k):
            arrays = []
            for name in src.column_names:
                col = src[name].combine_chunks()
                if name in cols and i > 0:
                    col = pc.add(col, i * stride[cols[name]])
                    col = col.cast(src.schema.field(name).type)
                arrays.append(col)
            replicas.append(pa.table(dict(zip(src.column_names, arrays))))
        out = pa.concat_tables(replicas)
        pq.write_table(out, f"{args.dst}/{t}.parquet")
        print(f"{t}: {src.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    main()
