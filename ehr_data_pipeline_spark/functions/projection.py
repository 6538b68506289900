"""Projection operators (SURVEY §2.2 P2/P3/P4) as standalone, reusable
functions — the reference applies them ad hoc during extraction
(/root/reference/json_pipeline.py:164 pattern drop, :481-506 static drop
lists, :165-184 add-missing-column).

All three are driver-side schema manipulation producing a single Project
node — zero execution cost beyond the (narrower) scan, and dropping a
column before a parquet read means it is never read at all (column
pruning reaches the scan)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def drop_matching_columns(df: DataFrame, pattern: str) -> DataFrame:
    """P2 (json_pipeline.py:164): drop every column whose name contains
    ``pattern`` case-insensitively — the reference uses it to strip
    `photo` blobs before load."""
    p = pattern.lower()
    return df.drop(*[c for c in df.columns if p in c.lower()])


def drop_columns(df: DataFrame, cols: list[str] | tuple[str, ...]) -> DataFrame:
    """P3 (json_pipeline.py:481-506): static drop list. Spark's ``drop``
    already ignores absent names — the reference's ``errors='ignore'``
    semantics for free."""
    return df.drop(*cols)


def align_to_schema(df: DataFrame, schema: StructType) -> DataFrame:
    """P4 (json_pipeline.py:165-184): make ``df`` conform to ``schema`` —
    columns absent from the data materialize as typed nulls, extra
    columns drop, order follows the schema. The reference needs this
    because pandas json_normalize only creates seen columns; with
    explicit read schemas it is a no-op on ingest, but stays essential
    for U1 union-append across drifting historical extracts."""
    present = set(df.columns)
    cols = [
        F.col(f.name) if f.name in present
        else F.lit(None).cast(f.dataType).alias(f.name)
        for f in schema.fields
    ]
    return df.select(*cols)
