"""Loader surface: load_tables returns every driver table, with the
nanos-timestamp normalization applied."""

from __future__ import annotations

from ehr_data_pipeline_spark.tables import TABLES, load_tables


def test_load_tables_covers_all_driver_tables(spark):
    tables = load_tables(spark, "/root/testdata/sf0.001")
    assert set(tables) == set(TABLES)
    assert dict(tables["events"].dtypes)["ts"] == "timestamp"
    assert all(not df.isStreaming for df in tables.values())


def test_projection_operators(spark):
    from pyspark.sql.types import StructType

    from ehr_data_pipeline_spark.functions.projection import (
        align_to_schema,
        drop_columns,
        drop_matching_columns,
    )

    df = spark.createDataFrame(
        [(1, "x", b"img")], ["id", "name", "PhotoBlob"]
    )
    assert drop_matching_columns(df, "photo").columns == ["id", "name"]
    assert drop_columns(df, ["PhotoBlob", "not_there"]).columns == ["id", "name"]
    target = StructType.fromDDL("id bigint, name string, extra int")
    out = align_to_schema(df, target)
    assert out.columns == ["id", "name", "extra"]
    row = out.collect()[0]
    assert row["extra"] is None and row["id"] == 1
    assert dict(out.dtypes)["extra"] == "int"
