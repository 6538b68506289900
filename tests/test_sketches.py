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


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

from ehr_data_pipeline_spark.operators.sketches import (  # noqa: E402
    HLL_M,
    bloom_build,
    bloom_might_contain,
    hll_build,
    hll_estimate,
    hll_merge,
)


def _regs(df):
    return {r["bucket"]: r["reg"] for r in df.collect()}


def test_hll_merge_equals_sketch_of_union(spark):
    a = spark.createDataFrame([(i,) for i in range(0, 400)], "k long")
    b = spark.createDataFrame([(i,) for i in range(200, 700)], "k long")
    merged = hll_merge(hll_build(a, "k"), hll_build(b, "k"))
    direct = hll_build(a.unionAll(b), "k")
    assert _regs(merged) == _regs(direct)  # max commutes: EXACT merge law


def test_hll_merge_idempotent_on_replay(spark):
    a = spark.createDataFrame([(i,) for i in range(300)], "k long")
    sk = hll_build(a, "k")
    assert _regs(hll_merge(sk, sk)) == _regs(sk)  # max is idempotent


def test_hll_estimate_within_error_bound(spark):
    # raw estimator stderr ~ 1.04/sqrt(256) = 6.5%; allow 4 sigma at
    # n >> 2.5m where the small-range bias is gone
    n = 20_000
    df = spark.createDataFrame([(i,) for i in range(n)], "k long")
    row = hll_estimate(hll_build(df, "k")).collect()[0]
    assert abs(row["hll_estimate"] - n) / n < 0.26
    assert row["zero_registers"] == 0


def test_hll_estimate_registers_cover_groups(spark):
    df = spark.createDataFrame(
        [(i, "x" if i % 2 == 0 else "y") for i in range(1000)], "k long, g string"
    )
    sk = hll_build(df, "k", ("g",))
    est = {r["g"]: r for r in hll_estimate(sk, ("g",)).collect()}
    assert set(est) == {"x", "y"}
    for g in ("x", "y"):
        assert 0 < est[g]["hll_estimate"]
        assert 0 <= est[g]["zero_registers"] <= HLL_M


def test_hll_ignores_nulls(spark):
    a = spark.createDataFrame([(1,), (2,), (None,)], "k long")
    b = spark.createDataFrame([(1,), (2,)], "k long")
    assert _regs(hll_build(a, "k")) == _regs(hll_build(b, "k"))


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives(spark):
    members = spark.createDataFrame([(i,) for i in range(0, 500, 3)], "k long")
    bloom = bloom_build(members, "k", n_bits=1024, k=4)
    probed = bloom_might_contain(members, "k", bloom, n_bits=1024, k=4)
    assert all(r["might_contain"] for r in probed.collect())  # one-sided


def test_bloom_filters_most_non_members(spark):
    members = spark.createDataFrame([(i,) for i in range(100)], "k long")
    non = spark.createDataFrame([(i,) for i in range(10_000, 11_000)], "k long")
    bloom = bloom_build(members, "k", n_bits=4096, k=5)
    probed = bloom_might_contain(non, "k", bloom, n_bits=4096, k=5)
    fp = sum(1 for r in probed.collect() if r["might_contain"])
    # n=100, m=4096, k=5 -> fp rate ~ (1-e^{-500/4096})^5 ~ 2e-5; allow slack
    assert fp <= 10


def test_bloom_bit_count_bounded(spark):
    members = spark.createDataFrame([(i,) for i in range(1000)], "k long")
    bloom = bloom_build(members, "k", n_bits=256, k=3)
    n_bits_set = bloom.count()
    assert 0 < n_bits_set <= 256
    assert bloom.distinct().count() == n_bits_set


# ---------------------------------------------------------------------------
# Histogram quantile sketch
# ---------------------------------------------------------------------------

from ehr_data_pipeline_spark.operators.sketches import (  # noqa: E402
    hist_build,
    hist_merge,
    hist_quantile,
)


def _hcells(df):
    return {r["bin"]: r["cnt"] for r in df.collect()}


def test_hist_merge_equals_hist_of_union(spark):
    a = spark.createDataFrame([(float(i % 37),) for i in range(300)], "v double")
    b = spark.createDataFrame([(float(i % 53),) for i in range(400)], "v double")
    merged = hist_merge(hist_build(a, "v", 0.0, 64.0), hist_build(b, "v", 0.0, 64.0))
    direct = hist_build(a.unionAll(b), "v", 0.0, 64.0)
    assert _hcells(merged) == _hcells(direct)


def test_hist_quantile_within_one_bin_width(spark):
    import random

    rng = random.Random(7)
    vals = sorted(rng.uniform(0.0, 100.0) for _ in range(2000))
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    sk = hist_build(df, "v", 0.0, 100.0, 50)
    got = {
        r["q"]: r["quantile_est"]
        for r in hist_quantile(sk, [0.1, 0.5, 0.9], 0.0, 100.0, 50).collect()
    }
    width = 100.0 / 50
    for q in (0.1, 0.5, 0.9):
        exact = vals[int(q * len(vals)) - 1]
        assert abs(got[q] - exact) <= width + 1e-9, (q, got[q], exact)


def test_hist_clamps_out_of_range_to_edge_bins(spark):
    df = spark.createDataFrame([(-5.0,), (0.5,), (99.0,), (250.0,)], "v double")
    cells = _hcells(hist_build(df, "v", 0.0, 100.0, 10))
    assert cells[0] == 2  # -5.0 clamped down, 0.5 in range
    assert cells[9] == 2  # 99.0 in range, 250.0 clamped up


def test_hist_quantile_extremes(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], "v double")
    sk = hist_build(df, "v", 0.0, 100.0, 10)
    got = {
        r["q"]: r["quantile_est"]
        for r in hist_quantile(sk, [0.0, 1.0], 0.0, 100.0, 10).collect()
    }
    assert got[0.0] == 0.0  # first present bin, zero interpolation
    assert 90.0 <= got[1.0] <= 100.0  # full rank lands in the last bin


def test_bloom_duplicate_probes_keep_no_false_negatives(spark):
    # regression: duplicate probe rows used to collapse into one group
    # whose matched-bit count exceeded k, flipping a member to False
    members = spark.createDataFrame([(7,), (8,)], "k long")
    bloom = bloom_build(members, "k", n_bits=1024, k=5)
    probes = spark.createDataFrame([(7,), (7,), (9,)], "k long")
    got = {r["k"]: r["might_contain"]
           for r in bloom_might_contain(probes, "k", bloom, n_bits=1024, k=5).collect()}
    assert got[7] is True  # member stays a member however often probed
    assert len(got) == 2  # one row per DISTINCT probe
