"""Temporal operator tests: as-of join semantics (direction, inclusive
ties, tolerance, no-match nulls) on a hand-built frame, and
bucketed_range_join ≡ range_join on real events data."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from ehr_data_pipeline_spark.operators.temporal import (
    asof_join,
    bucketed_range_join,
    range_join,
)

SF = "/root/testdata/sf0.001"


def _ts(minute):
    return datetime(2024, 1, 1, 12, minute, 0)


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [
            ("a", _ts(0), 1.0),
            ("a", _ts(10), 2.0),
            ("a", _ts(20), 3.0),
            ("b", _ts(5), 10.0),
        ],
        ["key", "ts", "px"],
    )


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            ("a", _ts(10)),  # tie with quote @10 → inclusive match
            ("a", _ts(15)),  # between quotes → quote @10
            ("a", _ts(25)),  # after last → quote @20
            ("b", _ts(0)),   # before any quote → null (backward)
            ("c", _ts(1)),   # key never quoted → null
        ],
        ["key", "ts"],
    )


def _matches(df):
    return {(r["key"], r["ts"].minute): r for r in df.collect()}


def test_asof_backward_semantics(quotes, trades):
    out = asof_join(
        trades, quotes, on=["key"], left_time="ts", right_time="ts",
        right_payload=["px"], matched_prefix="q_",
    )
    m = _matches(out)
    assert len(m) == 5
    assert m[("a", 10)]["q_px"] == 2.0  # inclusive tie
    assert m[("a", 15)]["q_px"] == 2.0
    assert m[("a", 25)]["q_px"] == 3.0
    assert m[("b", 0)]["q_px"] is None and m[("b", 0)]["q_ts"] is None
    assert m[("c", 1)]["q_px"] is None


def test_asof_forward_semantics(quotes, trades):
    out = asof_join(
        trades, quotes, on=["key"], left_time="ts", right_time="ts",
        right_payload=["px"], direction="forward", matched_prefix="q_",
    )
    m = _matches(out)
    assert m[("a", 10)]["q_px"] == 2.0  # inclusive tie, forward
    assert m[("a", 15)]["q_px"] == 3.0  # next quote @20
    assert m[("a", 25)]["q_px"] is None  # nothing after
    assert m[("b", 0)]["q_px"] == 10.0


def test_asof_tolerance_nulls_stale_matches(quotes, trades):
    out = asof_join(
        trades, quotes, on=["key"], left_time="ts", right_time="ts",
        right_payload=["px"], tolerance_seconds=6 * 60, matched_prefix="q_",
    )
    m = _matches(out)
    assert m[("a", 15)]["q_px"] == 2.0  # 5 min gap ≤ 6 min
    assert m[("a", 25)]["q_px"] == 3.0  # 5 min gap
    assert m[("a", 10)]["q_px"] == 2.0  # 0 gap
    # without tolerance (b,0) is null already; nothing becomes non-null
    assert m[("b", 0)]["q_px"] is None


def test_asof_rejects_bad_direction(quotes, trades):
    with pytest.raises(ValueError, match="backward|forward"):
        asof_join(
            trades, quotes, on=["key"], left_time="ts", right_time="ts",
            right_payload=["px"], direction="sideways",
        )


def test_bucketed_range_join_matches_plain(spark):
    """The keyless-scale formulation must be exact: same pairs as the
    equi-key range join on real events, regardless of bucket width."""
    from ehr_data_pipeline_spark.tables import load_table

    e = load_table(spark, SF, "events")
    errors = e.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    lo, hi = F.col("ts") - F.expr("INTERVAL 10 MINUTES"), F.col("ts")
    plain = range_join(
        errors, clicks, on=["user_id"], right_time="click_ts", lo=lo, hi=hi
    )
    pairs = {(r["event_id"], r["click_ts"]) for r in plain.collect()}
    assert pairs  # non-degenerate at sf0.001
    for bucket_seconds in (60, 600, 7200):
        bucketed = bucketed_range_join(
            errors, clicks, right_time="click_ts", lo=lo, hi=hi,
            bucket_seconds=bucket_seconds, on=["user_id"],
        )
        got = {(r["event_id"], r["click_ts"]) for r in bucketed.collect()}
        assert got == pairs, f"bucket_seconds={bucket_seconds}"


def test_gapfill_zero_fills_and_carries_forward(spark):
    """Holes in the series become explicit rows: n_events = 0,
    sum_value NULL, and the LOCF column carries the last observed sum;
    leading gaps (before any observation) stay NULL."""
    from ehr_data_pipeline_spark.operators.temporal import gapfill_time_series

    rows = [
        # group "a": observations at hours 1 and 4 -> holes at 2, 3
        (datetime(2024, 1, 1, 1, 15), "a", 10.0),
        (datetime(2024, 1, 1, 4, 5), "a", 7.0),
        # group "b": single observation at hour 3 -> leading gap rows
        (datetime(2024, 1, 1, 3, 30), "b", 2.5),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    out = {
        (r["event_type"], r["bucket_start"].hour): r
        for r in gapfill_time_series(df).collect()
    }
    # dense grid: hours 1..4 x groups {a, b}
    assert len(out) == 8
    assert out[("a", 1)]["n_events"] == 1 and out[("a", 1)]["sum_value"] == 10.0
    for h in (2, 3):
        r = out[("a", h)]
        assert r["n_events"] == 0 and r["sum_value"] is None
        assert r["sum_value_locf"] == 10.0  # carried forward
    assert out[("a", 4)]["sum_value_locf"] == 7.0
    # leading gap: nothing to carry yet
    for h in (1, 2):
        assert out[("b", h)]["sum_value_locf"] is None
    assert out[("b", 3)]["sum_value_locf"] == 2.5
    assert out[("b", 4)]["n_events"] == 0 and out[("b", 4)]["sum_value_locf"] == 2.5


def test_rollup_merge_equals_full_rollup_with_nulls(spark):
    from datetime import datetime

    from ehr_data_pipeline_spark.operators.temporal import (
        rollup_finalize,
        rollup_merge,
        time_rollup,
    )

    rows = [
        (datetime(2026, 1, 1, 10, 5), "a", 1.5),
        (datetime(2026, 1, 1, 10, 50), "a", None),   # null value: counted
        (datetime(2026, 1, 1, 10, 59), "b", 2.0),    # in n_events only
        (datetime(2026, 1, 1, 11, 1), "a", -3.25),
        (datetime(2026, 1, 1, 11, 2), "a", 4.0),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    split = datetime(2026, 1, 1, 11, 0)
    merged = rollup_finalize(
        rollup_merge(
            time_rollup(df.filter(F.col("ts") < split)),
            time_rollup(df.filter(F.col("ts") >= split)),
        )
    )
    full = rollup_finalize(time_rollup(df))

    def canon(d):
        return sorted(tuple(r) for r in d.collect())

    assert canon(merged) == canon(full)
    got = {(r["bucket_start"].hour, r["event_type"]): r for r in merged.collect()}
    a10 = got[(10, "a")]
    assert a10["n_events"] == 2 and a10["n_values"] == 1
    assert a10["avg_value"] == 1.5  # null excluded from the divisor
    a11 = got[(11, "a")]
    assert a11["sum_value"] == 0.75 and a11["min_value"] == -3.25


def test_rollup_merge_empty_delta_is_identity(spark):
    from datetime import datetime

    from ehr_data_pipeline_spark.operators.temporal import (
        rollup_finalize,
        rollup_merge,
        time_rollup,
    )

    df = spark.createDataFrame(
        [(datetime(2026, 1, 1, 9, 0), "a", 1.0)],
        "ts timestamp, event_type string, value double",
    )
    base = time_rollup(df)
    empty = time_rollup(df.filter(F.lit(False)))
    merged = rollup_finalize(rollup_merge(base, empty))
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, rollup_finalize(base).collect())
    )
