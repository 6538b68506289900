"""Funnel semantics on hand-built event chains: strict ordering, greedy
earliest match, horizon cutoff, broken chains."""

from __future__ import annotations

from datetime import datetime

from ehr_data_pipeline_spark.operators.funnel import (
    funnel_counts,
    funnel_user_steps,
)


def _ts(h, m=0):
    return datetime(2024, 1, 1, h, m)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )


def test_funnel_ordering_and_breaks(spark):
    rows = [
        # user 1: full chain in order
        (1, _ts(1), "a"), (1, _ts(2), "b"), (1, _ts(3), "c"),
        # user 2: b BEFORE a -> chain breaks at b (no b after their a)
        (2, _ts(1), "b"), (2, _ts(2), "a"), (2, _ts(3), "c"),
        # user 3: a then c only -> reaches step 1 only
        (3, _ts(1), "a"), (3, _ts(2), "c"),
        # user 4: never does a -> not in the funnel at all
        (4, _ts(1), "b"), (4, _ts(2), "c"),
    ]
    out = {
        r["step_name"]: (r["n_users"], r["conversion"])
        for r in funnel_counts(
            _events(spark, rows), steps=["a", "b", "c"]
        ).collect()
    }
    assert out["a"] == (3, 1.0)
    assert out["b"] == (1, 1 / 3)
    assert out["c"] == (1, 1 / 3)


def test_funnel_strict_after_and_greedy_earliest(spark):
    rows = [
        # b at the SAME instant as a does not count (strict >); the later
        # b does. The greedy match picks the EARLIEST valid b (hour 3),
        # and c must follow THAT (hour 4 works).
        (1, _ts(2), "a"), (1, _ts(2), "b"), (1, _ts(3), "b"),
        (1, _ts(4), "c"),
        # user 2: c arrives between a and b -> no c after b -> breaks at c
        (2, _ts(1), "a"), (2, _ts(2), "c"), (2, _ts(3), "b"),
    ]
    per_user = {
        r["user_id"]: r
        for r in funnel_user_steps(
            _events(spark, rows), steps=["a", "b", "c"]
        ).collect()
    }
    assert per_user[1]["step2_ts"] == _ts(3)
    assert per_user[1]["step3_ts"] == _ts(4)
    assert per_user[2]["step2_ts"] == _ts(3)
    assert per_user[2]["step3_ts"] is None


def test_funnel_within_horizon(spark):
    rows = [
        # completes b within 2 h -> counted
        (1, _ts(1), "a"), (1, _ts(2, 30), "b"),
        # b exists but 3 h after a -> horizon cut
        (2, _ts(1), "a"), (2, _ts(4), "b"),
    ]
    out = {
        r["step_name"]: r["n_users"]
        for r in funnel_counts(
            _events(spark, rows), steps=["a", "b"], within="2 hours"
        ).collect()
    }
    assert out["a"] == 2 and out["b"] == 1


def test_funnel_single_step_and_empty_input(spark):
    rows = [(1, _ts(1), "a")]
    out = funnel_counts(_events(spark, rows), steps=["a"]).collect()
    assert len(out) == 1 and out[0]["n_users"] == 1
    empty = funnel_counts(
        _events(spark, []), steps=["a", "b"]
    ).collect()
    assert {r["n_users"] for r in empty} == {0}
    assert {r["conversion"] for r in empty} == {None}  # 0/0 -> null, no error
