"""Loader surface: load_tables returns every driver table, with the
nanos-timestamp normalization applied."""

from __future__ import annotations

from ehr_data_pipeline_spark.tables import TABLES, load_tables


def test_load_tables_covers_all_driver_tables(spark):
    tables = load_tables(spark, "/root/testdata/sf0.001")
    assert set(tables) == set(TABLES)
    assert dict(tables["events"].dtypes)["ts"] == "timestamp"
    assert all(not df.isStreaming for df in tables.values())
