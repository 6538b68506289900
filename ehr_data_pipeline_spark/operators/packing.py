"""Sequence packing for LLM training batches: assign documents to
fixed-token-budget training sequences by their offset in the
concatenated token stream (the standard concat-then-chunk layout).

The core is a DISTRIBUTED PREFIX SUM — the operation a naive
``sum() over (order by id)`` gets wrong at scale: an unpartitioned
window moves the ENTIRE table through one task. Here it is two-phase:

1. per-bucket token totals over deterministic id ranges (one narrow
   aggregate, ~n_buckets rows);
2. a window cumsum over those n_buckets rows (trivially small) gives
   each bucket's starting offset, broadcast back;
3. a within-bucket window (partitioned — parallel) adds the local
   prefix.

Total: one aggregate + one broadcast join + one partitioned window —
no single-partition stage ever touches row-scale data. The same shape
serves row numbering, balanced range splitting, and file-offset
assignment; packing is the training-data instance of it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def distributed_prefix_sum(
    df: DataFrame,
    id_col: str,
    value_col: str,
    n_buckets: int = 256,
    out_col: str = "prefix_sum",
) -> DataFrame:
    """EXCLUSIVE prefix sum of ``value_col`` in ``id_col`` order (the sum
    of all strictly-earlier rows; 0 for the first), computed without an
    unpartitioned window. ``id_col`` must be unique non-negative
    integers; bucket ranges derive from the max id (one driver-sized
    aggregate, like centroid training)."""
    max_id = df.agg(F.max(id_col)).collect()[0][0]
    if max_id is None:  # empty input: the prefix sum of nothing is nothing
        return df.withColumn(out_col, F.lit(0).cast("bigint"))
    width = max(1, (int(max_id) + n_buckets) // n_buckets)
    b = df.withColumn("__bucket", (F.col(id_col) / width).cast("bigint"))

    totals = b.groupBy("__bucket").agg(F.sum(value_col).alias("__btotal"))
    wb = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__bucket",
        F.coalesce(F.sum("__btotal").over(wb), F.lit(0)).alias("__boffset"),
    )

    ww = (
        Window.partitionBy("__bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        b.join(F.broadcast(offsets), "__bucket")
        .withColumn(
            out_col,
            F.col("__boffset")
            + F.coalesce(F.sum(value_col).over(ww), F.lit(0)),
        )
        .drop("__bucket", "__boffset")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count: Column,
    budget: int,
    n_buckets: int = 256,
) -> DataFrame:
    """Assign each document to its training sequence: documents
    concatenate in ``id_col`` order into one token stream, and a doc
    belongs to sequence ``floor(stream_offset / budget)`` — the chunk
    its FIRST token lands in (concat-then-chunk; a doc may straddle the
    boundary into the next chunk, exactly like the real loader).

    Output: id, n_tokens, stream_offset (exclusive prefix sum),
    seq_id, offset_in_seq. Deterministic, engine-portable (pure integer
    arithmetic) and scalable — see module docstring for why the prefix
    sum is two-phase rather than one global window."""
    with_counts = df.select(
        F.col(id_col), token_count.cast("bigint").alias("n_tokens")
    )
    p = distributed_prefix_sum(
        with_counts, id_col, "n_tokens", n_buckets, out_col="stream_offset"
    )
    return p.select(
        id_col,
        "n_tokens",
        "stream_offset",
        F.expr(f"stream_offset div {int(budget)}").alias("seq_id"),
        F.expr(f"stream_offset % {int(budget)}").alias("offset_in_seq"),
    )
