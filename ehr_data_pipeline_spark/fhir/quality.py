"""Per-table quality-check suites (A2/A3/A4/A5) — the engine form of the
reference's ``DataQualityChecker.run_quality_checks``
(data_quality_checker.py:105-163), preserving its table names, error-type
labels, and report shape ``(table_name, error_type, n_violations, pct)``.

Execution shape: all format + logical-date checks for a table fold into ONE
aggregate pass (``quality_report``); each duplicate check needs its own
groupBy (a shuffle) and is unioned in as an extra report row. The reference
instead loops Python per check per row — at 100 TB this suite is
6 scans + 5 small shuffles total, all results dimension-sized.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ehr_data_pipeline_spark.functions.validation import (
    is_valid_date,
    is_valid_datetime,
    is_valid_latitude,
    is_valid_longitude,
    is_valid_phone,
)
from ehr_data_pipeline_spark.operators.quality import quality_report


def invalid(col: str, valid: Column) -> Column:
    """A2 semantics: non-null AND failing the validator
    (data_quality_checker.py:34-45 skips nulls)."""
    return F.col(col).isNotNull() & ~valid


def out_of_order(start: str, end: str) -> Column:
    """A3 semantics: both non-null AND start > end (lexicographic,
    data_quality_checker.py:83-94)."""
    s, e = F.col(start), F.col(end)
    return s.isNotNull() & e.isNotNull() & (s > e)


def duplicate_check_row(
    df: DataFrame, keys: Sequence[str], error_type: str, table_name: str
) -> DataFrame:
    """A4 keep=False duplicate counting as one report row: every member of
    a duplicate group counts (data_quality_checker.py:97-102)."""
    dup_rows = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
        .agg(F.coalesce(F.sum("cnt"), F.lit(0)).cast("bigint").alias("n"))
    )
    total = df.agg(F.count(F.lit(1)).alias("t"))
    return dup_rows.crossJoin(total).select(
        F.lit(table_name).alias("table_name"),
        F.lit(error_type).alias("error_type"),
        F.col("n").alias("n_violations"),
        F.when(F.col("t") > 0, F.lit(100.0) * F.col("n") / F.col("t"))
        .otherwise(F.lit(0.0))
        .alias("pct"),
    )


def _suite(
    df: DataFrame,
    name: str,
    checks: dict[str, Column],
    dup_checks: Sequence[tuple[Sequence[str], str]] = (),
) -> DataFrame:
    report = quality_report(df, checks, table_name=name)
    for keys, label in dup_checks:
        report = report.unionByName(duplicate_check_row(df, list(keys), label, name))
    return report


def condition_checks(df: DataFrame) -> DataFrame:
    """data_quality_checker.py:111-117."""
    return _suite(
        df,
        "condition_df",
        {
            "Invalid OnsetDateTime Format": invalid(
                "resource_onsetDateTime", is_valid_datetime(F.col("resource_onsetDateTime"))
            ),
            "Invalid AbatementDateTime Format": invalid(
                "resource_abatementDateTime",
                is_valid_datetime(F.col("resource_abatementDateTime")),
            ),
            "Logical Date Compliance": out_of_order(
                "resource_onsetDateTime", "resource_abatementDateTime"
            ),
        },
        dup_checks=[(("fullUrl", "resource_id"), "Duplicate Check")],
    )


def encounter_checks(df: DataFrame) -> DataFrame:
    """data_quality_checker.py:120-125."""
    return _suite(
        df,
        "encounter_df",
        {
            "Invalid Period Start Format": invalid(
                "resource_period_start", is_valid_datetime(F.col("resource_period_start"))
            ),
            "Invalid Period End Format": invalid(
                "resource_period_end", is_valid_datetime(F.col("resource_period_end"))
            ),
        },
        dup_checks=[(("resource_id",), "Duplicate Resource.ID")],
    )


def careplan_checks(df: DataFrame) -> DataFrame:
    """data_quality_checker.py:128-133 — careplan periods validate as plain
    DATEs, not datetimes."""
    return _suite(
        df,
        "careplan_df",
        {
            "Invalid Period Start Format": invalid(
                "resource_period_start", is_valid_date(F.col("resource_period_start"))
            ),
            "Invalid Period End Format": invalid(
                "resource_period_end", is_valid_date(F.col("resource_period_end"))
            ),
            "Logical Date Compliance": out_of_order(
                "resource_period_start", "resource_period_end"
            ),
        },
    )


def patient_checks(df: DataFrame) -> DataFrame:
    """data_quality_checker.py:136-145."""
    return _suite(
        df,
        "patient_df",
        {
            "BirthDate Errors": invalid(
                "resource_birthDate", is_valid_date(F.col("resource_birthDate"))
            ),
            "DeceasedDateTime Errors": invalid(
                "resource_deceasedDateTime",
                is_valid_datetime(F.col("resource_deceasedDateTime")),
            ),
            "Contact Number Errors": invalid(
                "contact_number", is_valid_phone(F.col("contact_number"))
            ),
            "Latitude Errors": invalid("latitude", is_valid_latitude(F.col("latitude"))),
            "Longitude Errors": invalid(
                "longitude", is_valid_longitude(F.col("longitude"))
            ),
            "Birthdate vs DeceasedDateTime Logical Compliance": out_of_order(
                "resource_birthDate", "resource_deceasedDateTime"
            ),
        },
        dup_checks=[(("resource_id",), "Duplicate Resource.ID")],
    )


def observation_checks(df: DataFrame) -> DataFrame:
    """data_quality_checker.py:148-152."""
    return _suite(
        df,
        "observation_df",
        {
            "Invalid EffectiveDateTime Format": invalid(
                "resource_effectiveDateTime",
                is_valid_datetime(F.col("resource_effectiveDateTime")),
            ),
        },
        dup_checks=[(("resource_id",), "Duplicate Resource.ID")],
    )


def immunization_checks(df: DataFrame) -> DataFrame:
    """data_quality_checker.py:155-158."""
    return _suite(
        df,
        "immunization_df",
        {
            "Invalid Resource.Date Format": invalid(
                "resource_date", is_valid_datetime(F.col("resource_date"))
            ),
        },
    )


CHECK_SUITES = {
    "Patient": patient_checks,
    "CarePlan": careplan_checks,
    "Condition": condition_checks,
    "Encounter": encounter_checks,
    "Immunization": immunization_checks,
    "Observation": observation_checks,
}


def fhir_quality_report(tables: dict[str, DataFrame]) -> DataFrame:
    """Full-suite report across all six tables (run_quality_checks parity,
    used for the reference's initial and final quality checks at
    json_pipeline.py:516-529 and :702-722)."""
    reports = [CHECK_SUITES[rt](df) for rt, df in tables.items() if rt in CHECK_SUITES]
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out
