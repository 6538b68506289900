"""Z-order clustering: key correctness vs a Python reference and the
data-skipping property — each output file covers a small range of BOTH
dimensions, where a single-column sort only localizes its leading one."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from ehr_data_pipeline_spark.partitioning import write_zordered, zorder_key


def _py_zkey(vals, bounds, bits):
    cells = []
    levels = (1 << bits) - 1
    for v, (lo, hi) in zip(vals, bounds):
        if v is None:
            cells.append(0)
            continue
        cell = int(((float(v) - lo) / (hi - lo)) * levels)
        cells.append(min(max(cell, 0), levels))
    n, key = len(cells), 0
    for b in range(bits):
        for i, c in enumerate(cells):
            key += ((c >> b) & 1) << (b * n + (n - 1 - i))
    return key


def test_zorder_key_matches_python_reference(spark):
    pts = [(0.0, 0.0), (500.0, 100.0), (250.0, 50.0), (13.7, 99.0),
           (None, 42.0), (-5.0, 250.0)]  # incl. null and out-of-range clamp
    df = spark.createDataFrame(pts, "x double, y double")
    got = df.select(
        zorder_key([("x", 0.0, 500.0), ("y", 0.0, 100.0)], bits=8).alias("k")
    ).collect()
    for row, p in zip(got, pts):
        ref = _py_zkey(p, [(0.0, 500.0), (0.0, 100.0)], 8)
        assert row["k"] == ref, p


def test_zorder_interleave_orders_both_dimensions(spark):
    """The four quadrant corners must sort in Morton order: (lo,lo) <
    (lo,hi) < (hi,lo) < (hi,hi) with x as the leading (most significant)
    dimension."""
    df = spark.createDataFrame(
        [(0.0, 0.0), (0.0, 9.0), (9.0, 0.0), (9.0, 9.0)], "x double, y double"
    )
    rows = df.select(
        "x", "y", zorder_key([("x", 0.0, 9.0), ("y", 0.0, 9.0)], bits=4).alias("k")
    ).collect()
    by_corner = {(r["x"], r["y"]): r["k"] for r in rows}
    assert (
        by_corner[(0.0, 0.0)] < by_corner[(0.0, 9.0)]
        < by_corner[(9.0, 0.0)] < by_corner[(9.0, 9.0)]
    )


def test_zordered_layout_localizes_both_dimensions(spark, tmp_path):
    """Write events Z-ordered on (value, user_id) into 8 files: the mean
    per-file span of EACH dimension must be well under the global span —
    the property parquet min/max skipping monetizes. A plain sort on
    value alone leaves user_id spans at ~global in every file."""
    from ehr_data_pipeline_spark.tables import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "value", F.col("user_id").cast("double").alias("uid")
    ).where(F.col("value").isNotNull())
    zpath = str(tmp_path / "z")
    write_zordered(e, zpath, [("value", 0.0, 500.0), ("uid", 0.0, 15.0)],
                   bits=8, n_files=8)

    def mean_spans(path):
        files = glob.glob(f"{path}/part-*.parquet")
        assert len(files) >= 4
        spans_v, spans_u = [], []
        for f in files:
            row = spark.read.parquet(f).agg(
                (F.max("value") - F.min("value")).alias("sv"),
                (F.max("uid") - F.min("uid")).alias("su"),
            ).collect()[0]
            if row["sv"] is not None:
                spans_v.append(row["sv"])
                spans_u.append(row["su"])
        return sum(spans_v) / len(spans_v), sum(spans_u) / len(spans_u)

    spath = str(tmp_path / "s")
    (e.repartitionByRange(8, "value").sortWithinPartitions("value")
     .write.parquet(spath))

    zv, zu = mean_spans(zpath)
    sv, su = mean_spans(spath)
    global_v, global_u = 500.0, 15.0
    assert zv < 0.5 * global_v          # value localized under Z-order
    assert zu < 0.75 * global_u         # AND user_id localized
    assert sv < 0.3 * global_v          # plain sort localizes value better...
    assert su > 0.9 * global_u          # ...but leaves user_id at global span


def test_range_partitioned_write_produces_disjoint_sorted_files(spark, tmp_path):
    """Globally-sorted layout: each output file owns a contiguous,
    non-overlapping key range, and rows inside each file are sorted —
    the min/max metadata a point/range read prunes on."""
    from ehr_data_pipeline_spark.partitioning import write_range_partitioned

    df = spark.range(0, 10_000).select(
        (F.col("id") * 2654435761 % 10_000).alias("k"), F.col("id").alias("v")
    )
    out = str(tmp_path / "ranged")
    write_range_partitioned(df, out, ["k"], n_files=8)

    spans = []
    for f in sorted(glob.glob(f"{out}/part-*.parquet")):
        pdf = spark.read.parquet(f).toPandas()
        if len(pdf):
            assert list(pdf["k"]) == sorted(pdf["k"])  # sorted within file
            spans.append((pdf["k"].min(), pdf["k"].max()))
    assert len(spans) > 1
    spans.sort()
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi <= lo  # contiguous, non-overlapping ranges
    # nothing lost in the re-layout
    assert spark.read.parquet(out).count() == 10_000
