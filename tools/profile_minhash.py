"""Phase-level profile of doc_minhash_lsh_pairs at a given SF dir.

Times each plan phase of the round-8 distinct-first pipeline in
isolation (count() to force) so the bench wall can be attributed:
shingling+hashing, shingle-set grouping, signature over reps, banding,
candidate join, verification, member expansion.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from ehr_data_pipeline_spark.operators.text_dedup import (
    DEFAULT_BANDS,
    DEFAULT_NUM_HASHES,
    _band_entries,
    _rep_minhash_pairs,
    _shingle_groups,
    hashed_shingle_set,
    minhash_lsh_pairs,
    minhash_signature,
    release_builder_caches,
)
from ehr_data_pipeline_spark.partitioning import ensure_min_partitions

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .appName("profile_minhash")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.count()  # warm the scan

    def timed(label, df):
        t0 = time.time()
        n = df.count()
        dt = time.time() - t0
        print(f"{label:30s} {dt:7.2f}s  rows={n}", flush=True)
        return dt

    base = ensure_min_partitions(docs).select(
        F.col("doc_id").alias("id"),
        hashed_shingle_set(F.col("text")).alias("sh"),
    ).filter(F.size("sh") > 0)
    timed("shingle+hash", base)
    timed("shingle+hash (2nd)", base)

    grouped = _shingle_groups(docs, "doc_id", "text", 4, persist_index=False)
    timed("  +group window", grouped)

    reps = grouped.where(F.col("id") == F.col("__rid")).select("id", "sh", "__n")
    sig = reps.select(
        "id", "sh", "__n",
        minhash_signature(F.col("sh"), DEFAULT_NUM_HASHES).alias("sig"),
    )
    timed("  +signature (reps)", sig)

    sigp = sig.persist()
    t0 = time.time()
    sigp.count()
    print(f"{'persist sig':30s} {time.time()-t0:7.2f}s", flush=True)

    banded = _band_entries(sigp, DEFAULT_NUM_HASHES, DEFAULT_BANDS)
    timed("  +band entries", banded)

    a, b = banded.alias("a"), banded.alias("b")
    size_ok = F.least(F.col("a.nsh"), F.col("b.nsh")) >= (
        F.lit(0.6) * F.greatest(F.col("a.nsh"), F.col("b.nsh"))
    )
    candidates = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id"))
            & size_ok,
        )
        .select(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .distinct()
    )
    timed("  +candidates", candidates)

    sh = sigp.select("id", "sh")
    inter = F.size(F.array_intersect(F.col("sa.sh"), F.col("sb.sh")))
    union_sz = F.size(F.col("sa.sh")) + F.size(F.col("sb.sh")) - inter
    verified = (
        candidates.join(sh.alias("sa"), F.col("doc_a") == F.col("sa.id"))
        .join(sh.alias("sb"), F.col("doc_b") == F.col("sb.id"))
        .select(
            "doc_a",
            "doc_b",
            (inter.cast("double") / union_sz.cast("double")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.6)
    )
    timed("  +verify (cached sig)", verified)
    sigp.unpersist()

    # grouped+persisted rep pairs, then the member expansion on top —
    # the delta between these two is the expansion cost
    grouped_p = _shingle_groups(docs, "doc_id", "text", 4, persist_index=True)
    pairs = _rep_minhash_pairs(
        grouped_p, 0.6, DEFAULT_NUM_HASHES, DEFAULT_BANDS, persist_index=True
    )
    timed("rep pairs (persisted idx)", pairs)
    release_builder_caches()

    t0 = time.time()
    n = minhash_lsh_pairs(docs, threshold=0.6).count()
    print(f"{'end-to-end op':30s} {time.time()-t0:7.2f}s  rows={n}", flush=True)
    release_builder_caches()
    spark.stop()


if __name__ == "__main__":
    main()
