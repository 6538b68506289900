"""Memory-pressure A/B of the maintenance sinks' index-delta patterns
(VERDICT r12 #6): OLD = write the near-dedup operator's new_entries
frame as a second action (depends on the band-join intermediates'
cache residency), NEW = rebuild the delta from the LANDED fresh
parquet (deterministic O(batch) I/O, what every minhash-maintaining
sink ships since r12).

The r12 profile showed wall-parity with ample memory — the operator's
_persist_tracked intermediates were cache-resident by construction.
This harness re-runs the same A/B inside a memory-CAPPED session
(spark.driver.memory + a shrunken spark.memory.fraction, so the
storage pool is far smaller than the persisted band-join
intermediates) to measure what eviction actually does to each pattern.
Expectation to verify, stated up front: Spark's df.persist() default is
MEMORY_AND_DISK, so under pressure blocks SPILL and are re-read from
local disk rather than recomputed — the patterns should stay near
parity even here, and the landed-rebuild's advantage is against block
LOSS (executor death / cluster-scale cache churn), which local mode
cannot produce. Either way the number lands in NOTES_r13.

Usage: python tools/profile_landed_rebuild.py [--mem 2g] [--fraction 0.15]
       [--passes 3] [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mem", default="2g")
    ap.add_argument("--fraction", default="0.15")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out-dir", default="/tmp/landed_rebuild_ab")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from ehr_data_pipeline_spark.operators.text_dedup import (
        build_minhash_index,
        near_dedup_against_index,
        release_builder_caches,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.driver.memory", args.mem)
        .config("spark.memory.fraction", args.fraction)
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "true")
        .appName("landed-rebuild-ab")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    mid = docs.agg(F.expr("percentile_approx(doc_id, 0.5)")).collect()[0][0]
    index_docs = docs.filter(F.col("doc_id") <= mid)
    batch_docs = docs.filter(F.col("doc_id") > mid)
    index = build_minhash_index(index_docs, "doc_id", "text")
    index.count()  # warm the scan; the index frame itself is lazy input

    def run(pattern: str, tag: str) -> float:
        out = f"{args.out_dir}/{tag}"
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.time()
        fresh, new_entries = near_dedup_against_index(
            batch_docs, index, "doc_id", "text", 0.8
        )
        fresh.write.mode("overwrite").parquet(f"{out}/fresh")
        if pattern == "old":
            # second action over the SAME lineage — rides the operator's
            # persisted band-join intermediates (or their spill/recompute)
            new_entries.write.mode("overwrite").parquet(f"{out}/delta")
        else:
            landed = spark.read.parquet(f"{out}/fresh")
            build_minhash_index(landed, "doc_id", "text").write.mode(
                "overwrite"
            ).parquet(f"{out}/delta")
        dt = time.time() - t0
        n = spark.read.parquet(f"{out}/delta").count()
        release_builder_caches()
        spark.catalog.clearCache()
        print(f"{pattern:4s} pass: {dt:6.2f}s  delta_rows={n}", flush=True)
        return dt

    # interleave the arms so host drift strikes both equally
    olds, news = [], []
    run("old", "warm")  # one discarded warm-up for JIT/footers
    for i in range(args.passes):
        olds.append(run("old", f"old{i}"))
        news.append(run("new", f"new{i}"))
    mem_mb = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size()
    print(
        f"\nmem={args.mem} fraction={args.fraction} passes={args.passes} "
        f"(executors={mem_mb})"
    )
    print(f"OLD (2nd action on operator lineage): {sorted(olds)} median "
          f"{sorted(olds)[len(olds) // 2]:.2f}s")
    print(f"NEW (rebuild from landed parquet):    {sorted(news)} median "
          f"{sorted(news)[len(news) // 2]:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
