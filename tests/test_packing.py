"""Sequence packing / distributed prefix sum: two-phase formulation must
equal the single-window formulation exactly, with no row-scale data
through a single partition."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ehr_data_pipeline_spark.operators.packing import (
    distributed_prefix_sum,
    pack_sequences,
)


def test_prefix_sum_matches_global_window(spark):
    """Two-phase == naive unpartitioned window on sparse, gappy ids
    across several bucket counts (incl. more buckets than rows)."""
    rows = [(i * 7 + (i % 3), (i % 13) + 1) for i in range(500)]  # gappy ids
    df = spark.createDataFrame(rows, "id long, v long")
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r["id"]: r["p"]
        for r in df.select(
            "id", F.coalesce(F.sum("v").over(w), F.lit(0)).alias("p")
        ).collect()
    }
    for n_buckets in (1, 4, 64, 1000):
        got = {
            r["id"]: r["prefix_sum"]
            for r in distributed_prefix_sum(df, "id", "v", n_buckets).collect()
        }
        assert got == want, f"n_buckets={n_buckets}"


def test_pack_sequences_chunk_semantics(spark):
    """Known token counts: docs land in the chunk their first token
    falls in; offsets chain exactly; a doc may straddle into the next
    chunk (concat-then-chunk, like the real loader)."""
    df = spark.createDataFrame(
        [(0, "a " * 1000), (1, "b " * 1500), (2, "c " * 100), (3, "d " * 5000)],
        "doc_id long, text string",
    )
    from ehr_data_pipeline_spark.operators.text_analysis import whitespace_tokens

    out = {
        r["doc_id"]: r
        for r in pack_sequences(
            df, "doc_id", F.size(whitespace_tokens(F.col("text"))), budget=2048
        ).collect()
    }
    assert out[0]["stream_offset"] == 0 and out[0]["seq_id"] == 0
    assert out[1]["stream_offset"] == 1000 and out[1]["seq_id"] == 0  # straddles
    assert out[2]["stream_offset"] == 2500 and out[2]["seq_id"] == 1
    assert out[3]["stream_offset"] == 2600 and out[3]["seq_id"] == 1
    assert out[3]["offset_in_seq"] == 2600 - 2048


def test_prefix_sum_no_global_single_partition_window(spark):
    """The plan's only unpartitioned window runs over the bucket totals
    (n_buckets rows), never the input rows: every row-scale Window node
    must carry a partition spec."""
    df = spark.createDataFrame([(i, 1) for i in range(100)], "id long, v long")
    plan = (
        distributed_prefix_sum(df, "id", "v", 16)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    window_lines = [
        line.strip() for line in plan.splitlines() if line.strip().startswith(("Window", "+- Window"))
    ]
    assert len(window_lines) == 2
    for line in window_lines:
        if "sum(v#" in line:
            # the row-scale window must carry a partition spec
            # (format: Window [exprs], [partition], [order] — 3 groups)
            assert line.count("], [") == 2, line
        else:
            # the unpartitioned window consumes only the bucket totals
            assert "sum(__btotal" in line, line
            assert line.count("], [") == 1, line


def test_shuffle_order_matches_global_rank(spark):
    """Two-phase distributed rank == the naive unpartitioned ROW_NUMBER
    over the same (hash, id) order, including on gappy ids."""
    from ehr_data_pipeline_spark.operators.packing import (
        deterministic_shuffle_order,
    )
    from ehr_data_pipeline_spark.operators.text_analysis import portable_hash60

    df = spark.createDataFrame(
        [(i * 3 + (i % 2),) for i in range(300)], "doc_id long"
    )
    h = portable_hash60(
        F.concat(F.lit("shuffle:"), F.col("doc_id").cast("string"))
    )
    w = Window.orderBy(h.asc(), F.col("doc_id").asc())
    want = {
        r["doc_id"]: r["o"]
        for r in df.select(
            "doc_id", (F.row_number().over(w) - 1).alias("o")
        ).collect()
    }
    for n_buckets in (1, 16, 256):
        got = {
            r["doc_id"]: r["train_order"]
            for r in deterministic_shuffle_order(
                df, "doc_id", n_buckets=n_buckets
            ).collect()
        }
        assert got == want, f"n_buckets={n_buckets}"
    # non-power-of-two bucket counts are a hard error, not silent skew
    import pytest

    with pytest.raises(ValueError):
        deterministic_shuffle_order(df, "doc_id", n_buckets=100)


def test_shuffle_order_no_global_single_partition_window(spark):
    """Same contract as the prefix sum: the only unpartitioned window
    consumes the n_buckets count rows; the row-scale row_number window
    carries a partition spec."""
    from ehr_data_pipeline_spark.operators.packing import (
        deterministic_shuffle_order,
    )

    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    plan = (
        deterministic_shuffle_order(df, "doc_id", n_buckets=16)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    window_lines = [
        line.strip()
        for line in plan.splitlines()
        if line.strip().startswith(("Window", "+- Window"))
    ]
    assert len(window_lines) == 2
    for line in window_lines:
        if "row_number" in line:
            assert line.count("], [") == 2, line  # partitioned
        else:
            assert "sum(__n" in line, line  # bucket counts only
            assert line.count("], [") == 1, line


def test_prefix_sum_empty_input(spark):
    """Empty input returns the empty frame with the output column typed
    bigint instead of crashing on int(None)."""
    df = spark.createDataFrame([], "id long, v long")
    out = distributed_prefix_sum(df, "id", "v", 16)
    assert out.count() == 0
    assert dict(out.dtypes)["prefix_sum"] == "bigint"


def test_materialize_packed_sequences_straddle_and_order(spark):
    """The build step on hand-sized docs (budget 10, lengths 4/4/4/7/3):
    doc 3 starts in seq 0 at offset 8 and straddles into seq 1, so seq 1
    opens at offset 2 (carry-in visible via first_offset) and holds only
    the tokens STARTING there. Member order is stream order regardless
    of partitioning (sort_array over (offset, id), not collect_list
    arrival order) -- asserted by repartitioning adversarially."""
    from ehr_data_pipeline_spark.operators.packing import (
        materialize_packed_sequences,
        pack_sequences,
    )

    rows = [(1, 4), (2, 4), (3, 4), (4, 7), (5, 3)]
    df = spark.createDataFrame(rows, "doc_id long, n long")

    def build(frame):
        assigned = pack_sequences(frame, "doc_id", F.col("n"), budget=10)
        return {
            r["seq_id"]: (
                r["n_docs"], r["seq_tokens"], r["first_offset"], r["doc_ids"]
            )
            for r in materialize_packed_sequences(assigned, "doc_id").collect()
        }

    got = build(df)
    # offsets: d1@0 d2@4 d3@8 d4@12 d5@19 -> seqs 0,0,0,1,1
    assert got[0] == (3, 12, 0, "1,2,3")
    assert got[1] == (2, 10, 2, "4,5")
    assert build(df.repartition(7, "n")) == got
