"""Key-based deduplication operators: the reference's key-dedup (U2,
data_quality_checker.py:340-352) and duplicate counting (A4, :97-102).

Text/near-dup deduplication (exact text hash, MinHash-LSH, SimHash, n-gram
Jaccard) lives in :mod:`ehr_data_pipeline_spark.operators.text_dedup`.
Everything is pure DataFrame API — no Python UDFs — so the plans stay inside
whole-stage codegen and scale by shuffle on well-chosen keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def keep_first(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[Column]
) -> DataFrame:
    """Deterministic keep-first dedup by key.

    The reference's ``drop_duplicates(subset=keys)`` (U2,
    data_quality_checker.py:340-352) keeps the first row in pandas input
    order — an order that is unspecified (file-listing order). The engine
    requires an explicit within-key order so results are stable across
    cluster runs. One shuffle on ``keys``; WindowGroupLimit keeps state at
    one row per key.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def drop_duplicates_any(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Nondeterministic keep-any dedup — bug-compatible with the reference's
    unordered keep='first' when the caller doesn't care which row survives.
    Cheaper than :func:`keep_first`: hash-aggregate instead of window sort."""
    return df.dropDuplicates(list(keys))


def duplicate_group_stats(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Duplicate counting with pandas ``keep=False`` semantics (A4,
    data_quality_checker.py:97-102): every member of a duplicate group is
    counted, so a group of k contributes k (not k-1). Returns one row:
    (n_rows_in_dup_groups, n_dup_groups)."""
    groups = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
    )
    return groups.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).cast("bigint").alias("n_rows_in_dup_groups"),
        F.count(F.lit(1)).alias("n_dup_groups"),
    )
