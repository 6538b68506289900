"""Adversarial edge sweep for the sketch family (VERDICT r7 #7): the one
oracle family without a dedicated degenerate corpus until round 8.

Two layers:

1. **Registered-query oracle sweep** — the three events-only sketch
   queries (count-min accuracy, HLL merge, histogram-quantile merge) and
   the bloom pruning report re-run against their DuckDB oracles on
   corpora built of nothing but sketch-degenerate shapes: all-identical
   values (single register / single cell / single bin), a one-row
   corpus, merge-of-full-and-EMPTY halves (every event_id even, so the
   parity-split merge the queries perform gets an empty operand), and
   measurement-domain boundary values.
2. **Operator-level degenerate parameters** — width-1 / depth-1
   count-min (estimate must equal the total count), single-bin
   histograms, single-occupied-register HLL, empty and tiny bloom
   filters — the parameter shapes no realistic query exercises but a
   library caller can hand in.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from ehr_data_pipeline_spark.queries import REGISTRY
from tests.oracle_utils import compare_spark_vs_oracle

SKETCH_EVENT_QUERIES = (
    "user_cms_accuracy",
    "event_user_hll",
    "events_value_quantile_sketch",
)


def _write_events(d, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = list(zip(*rows)) if rows else [[]] * 6
    table = pa.table(
        {
            "event_id": pa.array(cols[0], pa.int64()),
            "ts": pa.array(cols[1], pa.timestamp("us")),
            "user_id": pa.array(cols[2], pa.int64()),
            "event_type": pa.array(cols[3], pa.string()),
            "value": pa.array(cols[4], pa.float64()),
            "props": pa.array(cols[5], pa.string()),
        }
    )
    pq.write_table(table, str(d / "events.parquet"))
    return str(d)


def _ts(s):
    from datetime import datetime

    return datetime.fromisoformat(s)


def _sketch_corpora() -> dict[str, list[tuple]]:
    return {
        # every row identical in the sketched columns; ALL event_ids even,
        # so the queries' parity-split merge gets (full, EMPTY) — the
        # merge identity case. One user → one CMS cell per row-hash, one
        # HLL register, one histogram bin.
        "identical": [
            (2 * i, _ts("2024-01-01T00:00:00"), 7, "click", 42.0, "{}")
            for i in range(200)
        ],
        # a single row: rank-1 quantiles, estimate==1 everywhere
        "single": [(1, _ts("2024-01-01T00:00:00"), 3, "click", 5.0, "{}")],
        # bin/grid boundaries + the measurement-domain edge: 0.0 (grid
        # lo), 600.0 (grid hi, clamps into the last bin), values outside
        # the grid on both sides (clamped), the largest in-domain double
        # below 1e12, 1e12/NaN/±Inf (excluded by the contract), NULLs
        "boundary": [
            (1, _ts("2024-01-01T00:00:00"), 1, "click", 0.0, "{}"),
            (2, _ts("2024-01-01T01:00:00"), 1, "click", 600.0, "{}"),
            (3, _ts("2024-01-01T02:00:00"), 1, "click", 599.9999, "{}"),
            (4, _ts("2024-01-01T03:00:00"), 2, "click", -5.0, "{}"),
            (5, _ts("2024-01-01T04:00:00"), 2, "click", 1234.5, "{}"),
            (6, _ts("2024-01-01T05:00:00"), 2, "click",
             math.nextafter(1e12, 0), "{}"),
            (7, _ts("2024-01-01T06:00:00"), 3, "click", 1e12, "{}"),
            (8, _ts("2024-01-01T07:00:00"), 3, "click", float("nan"), "{}"),
            (9, _ts("2024-01-01T08:00:00"), 3, "click", float("inf"), "{}"),
            (10, _ts("2024-01-01T09:00:00"), 4, "click", float("-inf"), "{}"),
            (11, _ts("2024-01-01T10:00:00"), 4, "purchase", None, "{}"),
            (12, _ts("2024-01-01T11:00:00"), None, "click", 1.0, "{}"),
        ],
    }


@pytest.fixture(scope="module", params=sorted(_sketch_corpora()))
def sketch_corpus(request, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"sketch_{request.param}")
    dir_ = _write_events(d, _sketch_corpora()[request.param])
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{dir_}/events.parquet'")
    yield dir_, con
    con.close()


@pytest.mark.parametrize("name", SKETCH_EVENT_QUERIES)
def test_sketch_queries_on_degenerate_corpora(spark, sketch_corpus, name):
    dir_, con = sketch_corpus
    spec = REGISTRY[name]
    df = spec.fn(spark, dir_)
    compare_spark_vs_oracle(df, con, spec.oracle, name=f"{name}[sketch-edge]")


# ---------------------------------------------------------------------------
# bloom pruning report on degenerate member/probe sets
# ---------------------------------------------------------------------------

_BLOOM_CORPORA = {
    # no customer clears the 7000 balance: EMPTY filter, every probe must
    # come back negative (no false positives from an all-zero bit set)
    "empty_members": (
        [(1, 100.0), (2, 6999.99)],
        [(10, 1), (11, 2), (12, 999)],
    ),
    # every customer is a member and every probe is a member: bloom must
    # report zero false negatives (the one-sidedness guarantee)
    "all_members": (
        [(1, 9000.0), (2, 8000.0), (3, 7000.01)],
        [(10, 1), (11, 2), (12, 3)],
    ),
    # members exist but orders is EMPTY: zero probes, all-zero report
    "no_probes": ([(1, 9000.0)], []),
}


@pytest.fixture(scope="module", params=sorted(_BLOOM_CORPORA))
def bloom_corpus(request, tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    cust_rows, order_rows = _BLOOM_CORPORA[request.param]
    d = tmp_path_factory.mktemp(f"bloom_{request.param}")
    ccols = list(zip(*cust_rows)) if cust_rows else [[], []]
    pq.write_table(
        pa.table({
            "c_custkey": pa.array(ccols[0], pa.int64()),
            "c_acctbal": pa.array(ccols[1], pa.float64()),
        }),
        str(d / "customer.parquet"),
    )
    ocols = list(zip(*order_rows)) if order_rows else [[], []]
    pq.write_table(
        pa.table({
            "o_orderkey": pa.array(ocols[0], pa.int64()),
            "o_custkey": pa.array(ocols[1], pa.int64()),
        }),
        str(d / "orders.parquet"),
    )
    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
    yield str(d), con
    con.close()


def test_bloom_prune_stats_on_degenerate_corpora(spark, bloom_corpus):
    dir_, con = bloom_corpus
    spec = REGISTRY["orders_bloom_prune_stats"]
    df = spec.fn(spark, dir_)
    compare_spark_vs_oracle(
        df, con, spec.oracle, name="orders_bloom_prune_stats[sketch-edge]"
    )


# ---------------------------------------------------------------------------
# operator-level degenerate parameters
# ---------------------------------------------------------------------------


def test_cms_width_one_estimates_total_count(spark):
    """A 1-bucket-wide count-min collapses every key into the same cell:
    the estimate for ANY key must be the total row count (the maximal
    one-sided overestimate, never an undercount)."""
    from ehr_data_pipeline_spark.operators.sketches import cm_build, cm_estimate

    df = spark.createDataFrame(
        [(i % 5,) for i in range(40)], "user_id long"
    )
    sketch = cm_build(df, "user_id", depth=3, width=1)
    est = {
        r["user_id"]: r["cms_estimate"]
        for r in cm_estimate(sketch, df, "user_id", depth=3, width=1).collect()
    }
    assert est == {k: 40 for k in range(5)}


def test_cms_depth_one_still_one_sided(spark):
    from ehr_data_pipeline_spark.operators.sketches import cm_build, cm_estimate

    df = spark.createDataFrame([(i,) for i in range(100)], "user_id long")
    sketch = cm_build(df, "user_id", depth=1, width=16)
    for r in cm_estimate(sketch, df, "user_id", depth=1, width=16).collect():
        assert r["cms_estimate"] >= 1  # true count is 1; estimate never below


def test_hist_single_bin_interpolates_within_it(spark):
    """n_bins=1: every value lands in bin 0 and the quantile estimate is
    pure within-bin interpolation — lo + q·width for continuous ranks."""
    from ehr_data_pipeline_spark.operators.sketches import hist_build, hist_quantile

    df = spark.createDataFrame([(float(v),) for v in range(10)], "value double")
    h = hist_build(df, "value", lo=0.0, hi=10.0, n_bins=1)
    rows = {r["q"]: r["quantile_est"] for r in
            hist_quantile(h, [0.5, 1.0], lo=0.0, hi=10.0, n_bins=1).collect()}
    assert rows[0.5] == pytest.approx(5.0)
    assert rows[1.0] == pytest.approx(10.0)


def test_hist_merge_with_empty_is_identity(spark):
    from ehr_data_pipeline_spark.operators.sketches import hist_build, hist_merge

    df = spark.createDataFrame([(float(v),) for v in range(8)], "value double")
    empty = spark.createDataFrame([], "value double")
    h = hist_build(df, "value", 0.0, 8.0, 4)
    merged = hist_merge(h, hist_build(empty, "value", 0.0, 8.0, 4))
    assert sorted(map(tuple, h.collect())) == sorted(map(tuple, merged.collect()))


def test_hll_all_identical_single_register(spark):
    """All-identical values occupy exactly ONE register; merge with an
    empty sketch is the identity; the estimate with 255 zero registers
    is the raw-HLL small-range overshoot the linear-counting caller
    corrects — pinned here so the degenerate shape stays deterministic."""
    from ehr_data_pipeline_spark.operators.sketches import (
        HLL_M,
        hll_build,
        hll_estimate,
        hll_merge,
    )

    df = spark.createDataFrame([(7,)] * 50, "user_id long")
    sketch = hll_build(df, "user_id")
    assert sketch.count() == 1  # one occupied register
    empty = hll_build(spark.createDataFrame([], "user_id long"), "user_id")
    merged = hll_merge(sketch, empty)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, sketch.collect()))
    est = hll_estimate(sketch).collect()[0]
    assert est["zero_registers"] == HLL_M - 1
    assert est["hll_estimate"] > 0.0


def test_bloom_empty_filter_rejects_everything(spark):
    from ehr_data_pipeline_spark.operators.sketches import (
        bloom_build,
        bloom_might_contain,
    )

    empty = spark.createDataFrame([], "key long")
    bloom = bloom_build(empty, "key", n_bits=64, k=3)
    probes = spark.createDataFrame([(i,) for i in range(20)], "custkey long")
    out = bloom_might_contain(probes, "custkey", bloom, n_bits=64, k=3).collect()
    assert len(out) == 20
    assert not any(r["might_contain"] for r in out)


def test_bloom_tiny_filter_never_false_negative(spark):
    """8 bits / 5 hashes is heavily saturated — false positives abound,
    but a member probe may NEVER come back negative."""
    from ehr_data_pipeline_spark.operators.sketches import (
        bloom_build,
        bloom_might_contain,
    )

    members = spark.createDataFrame([(i,) for i in range(10)], "key long")
    bloom = bloom_build(members, "key", n_bits=8, k=5)
    out = bloom_might_contain(
        members.withColumnRenamed("key", "custkey"), "custkey", bloom,
        n_bits=8, k=5,
    ).collect()
    assert all(r["might_contain"] for r in out)
