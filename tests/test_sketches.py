"""Count-min sketch laws: cell-wise mergeability, one-sided error, and
exactness when the domain fits the width."""

from __future__ import annotations

from pyspark.sql import functions as F

from ehr_data_pipeline_spark.operators.sketches import (
    cm_build,
    cm_estimate,
    cm_merge,
)


def _cells(df):
    return {(r["row"], r["bucket"]): r["cnt"] for r in df.collect()}


def test_cm_merge_equals_sketch_of_union(spark):
    a = spark.createDataFrame([(i % 7,) for i in range(50)], "k long")
    b = spark.createDataFrame([(i % 11,) for i in range(80)], "k long")
    merged = cm_merge(cm_build(a, "k"), cm_build(b, "k"))
    direct = cm_build(a.unionAll(b), "k")
    assert _cells(merged) == _cells(direct)


def test_cm_estimate_one_sided_and_exact_when_sparse(spark):
    df = spark.createDataFrame(
        [(v,) for v in ["a"] * 30 + ["b"] * 20 + ["c"] * 5], "k string"
    )
    sk = cm_build(df, "k", depth=4, width=64)
    est = {
        r["k"]: r["cms_estimate"]
        for r in cm_estimate(sk, df, "k", depth=4, width=64).collect()
    }
    exact = {"a": 30, "b": 20, "c": 5}
    for k, n in exact.items():
        assert est[k] >= n  # one-sided guarantee
    # 3 distinct keys into 4x64 cells: some hash row separates them and
    # the min over rows recovers the exact count
    assert est == exact


def test_cm_estimate_unseen_value_is_zero_or_collision(spark):
    df = spark.createDataFrame([("a",)] * 10, "k string")
    sk = cm_build(df, "k")
    q = spark.createDataFrame([("zz",)], "k string")
    est = cm_estimate(sk, q, "k").collect()[0]["cms_estimate"]
    assert 0 <= est <= 10  # never negative, bounded by total mass
