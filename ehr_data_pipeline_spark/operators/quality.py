"""Data-quality profiling operators.

Engine form of the reference's DataQualityChecker
(data_quality_checker.py:5-163): every per-table report is ONE aggregate
pass (the reference loops per column / per check in Python), returning a
small report DataFrame. At 100 TB this is the difference between one scan
and dozens.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _violations(cond: Column) -> Column:
    return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")


def missing_value_profile(df: DataFrame, columns: Sequence[str] | None = None) -> DataFrame:
    """Per-column null count + percentage (A1, data_quality_checker.py:10-31)
    in one aggregate pass, unpivoted to rows (col_name, n_null, pct_null).

    The reference computes ``df.isna().sum()`` per column then sorts by
    percentage; sorting a <#columns>-row report is driver-side trivial, so
    ordering is left to the caller (the value hash is order-insensitive).
    """
    cols = list(columns) if columns is not None else df.columns
    wide = df.agg(
        F.count(F.lit(1)).alias("__total"),
        *[_violations(F.col(c).isNull()).alias(c) for c in cols],
    )
    # unpivot the single wide row into the report shape; stack() is a native
    # generator expression, no shuffle (input is one row)
    stack_args = ", ".join(f"'{c}', `{c}`" for c in cols)
    return wide.select(
        F.col("__total"),
        F.expr(f"stack({len(cols)}, {stack_args}) AS (col_name, n_null)"),
    ).select(
        "col_name",
        "n_null",
        (F.lit(100.0) * F.col("n_null") / F.col("__total")).alias("pct_null"),
    )


def quality_report(
    df: DataFrame, checks: dict[str, Column], table_name: str = "table"
) -> DataFrame:
    """Run a suite of named violation predicates in one pass (A2/A5,
    data_quality_checker.py:34-45,105-163). ``checks`` maps error-type name →
    boolean Column that is true for violating rows. Returns the reference's
    report shape: (table_name, error_type, n_violations, pct)."""
    names = list(checks)
    wide = df.agg(
        F.count(F.lit(1)).alias("__total"),
        *[_violations(cond).alias(f"__c{i}") for i, cond in enumerate(checks.values())],
    )
    stack_args = ", ".join(f"'{name}', `__c{i}`" for i, name in enumerate(names))
    return wide.select(
        F.col("__total"),
        F.expr(f"stack({len(names)}, {stack_args}) AS (error_type, n_violations)"),
    ).select(
        F.lit(table_name).alias("table_name"),
        "error_type",
        "n_violations",
        F.when(
            F.col("__total") > 0,
            F.lit(100.0) * F.col("n_violations") / F.col("__total"),
        ).otherwise(F.lit(0.0)).alias("pct"),
    )


def row_count_observer(df: DataFrame, name: str) -> tuple[DataFrame, "object"]:
    """Row-count logging parity (A6, json_pipeline.py:536-559 wraps every
    cleaning step in len() prints). The engine uses Observation metrics so
    counts ride along with the real action instead of forcing extra scans."""
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, F.count(F.lit(1)).alias("n_rows")), obs
