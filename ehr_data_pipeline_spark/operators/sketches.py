"""Mergeable frequency sketches as DataFrames — the count-min sketch
(Cormode & Muthukrishnan) expressed relationally.

A CM sketch here is just a small DataFrame of ``(row, bucket, cnt)``
cells: ``depth`` independent hash rows × ``width`` buckets. That makes
every sketch property a plain relational fact:

- **build** is one groupBy over exploded (row, bucket) pairs — map-side
  combine does almost all the work, the shuffle is ≤ depth×width rows per
  partition regardless of input size;
- **merge** is ``unionByName`` + the same groupBy (cell-wise addition) —
  the property that lets per-partition / per-day sketches roll up without
  touching raw data;
- **estimate** is a join + min-over-rows, with the classic one-sided
  guarantee: estimate ≥ true count, and ≤ true + ε·N with probability
  1−δ for width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉.

The bucket hash is md5-derived (like the shingle/minhash hashes), so the
whole sketch — build, merge, estimate — is deterministic and replays
bit-for-bit in DuckDB: an APPROXIMATE summary with an EXACT oracle.

The reference has no sketches (its only aggregates are the metadata
profiles, data_quality_checker.py:10-163); this is north-star surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_DEPTH = 4
DEFAULT_WIDTH = 64


def cm_bucket(col: Column, row: int, width: int) -> Column:
    """Bucket of ``col`` in hash row ``row``: the engine-portable 32-bit
    md5 hash (shared with the shingle/minhash family —
    ``text_dedup.base_shingle_hash``) of 'row:value', mod width. DuckDB
    twin: ``('0x' || substr(md5(row || ':' || v), 1, 8))::BIGINT % width``."""
    from ehr_data_pipeline_spark.operators.text_dedup import base_shingle_hash

    return base_shingle_hash(
        F.concat(F.lit(f"{row}:"), col.cast("string"))
    ) % F.lit(width)


def cm_build(
    df: DataFrame,
    col: str,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Build the sketch: ``(row, bucket, cnt)`` cells (absent cell = 0).
    One explode (×depth) + one groupBy; the shuffle after map-side
    partial aggregation is bounded by depth×width rows per partition —
    at 100 TB the sketch is still ≤ depth×width rows total."""
    cells = df.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("row"),
                    cm_bucket(F.col(col), r, width).alias("bucket"),
                )
                for r in range(depth)
            ])
        ).alias("c")
    )
    return (
        cells.groupBy(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cm_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of sketches built with the same (depth, width) —
    sketch(A ∪ B) == merge(sketch(A), sketch(B)) exactly."""
    if not sketches:
        raise ValueError("cm_merge requires at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cm_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    col: str,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Point-frequency estimates for ``queries[col]``: min over the
    depth rows of the addressed cells (absent cell = 0). The sketch side
    is depth×width rows — broadcast by construction — so estimation adds
    no shuffle over the query set."""
    q = queries.select(col).distinct()
    addressed = q.select(
        col,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("row"),
                    cm_bucket(F.col(col), r, width).alias("bucket"),
                )
                for r in range(depth)
            ])
        ).alias("c"),
    ).select(col, F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
    return (
        addressed.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("bigint").alias("cms_estimate"))
    )
