"""Property-based invariants for the LLM-pipeline operators: the chunker's
coverage/overlap laws, the two-phase prefix sum vs the naive definition,
and PPJoin prefix filtering vs brute-force all-pairs — each over randomly
generated inputs (bounded example counts: every example is a Spark job)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

WORD = st.text(alphabet="abcd", min_size=1, max_size=5)


@given(
    docs=st.lists(st.lists(WORD, min_size=1, max_size=40), min_size=1, max_size=6),
    chunk_size=st.integers(2, 16),
    overlap=st.integers(0, 8),
)
@SETTINGS
def test_chunker_coverage_and_overlap_laws(spark, docs, chunk_size, overlap):
    from ehr_data_pipeline_spark.operators.text_analysis import chunk_by_tokens

    if overlap >= chunk_size:
        overlap = chunk_size - 1
    stride = chunk_size - overlap
    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)],
        "doc_id long, text string",
    )
    out = chunk_by_tokens(df, chunk_size=chunk_size, overlap=overlap).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, ws in enumerate(docs):
        rows = sorted(by_doc[i], key=lambda r: r["chunk_id"])
        # chunk c covers [c*stride, c*stride+chunk_size)
        for c, r in enumerate(rows):
            assert r["chunk_id"] == c
            toks = r["chunk_text"].split(" ")
            assert toks == ws[c * stride: c * stride + chunk_size]
            assert r["n_chunk_tokens"] == len(toks)
        # coverage: concatenating each chunk's non-overlapping tail yields the doc
        flat = rows[0]["chunk_text"].split(" ")
        for r in rows[1:]:
            flat.extend(r["chunk_text"].split(" ")[overlap:])
        assert flat == ws


@given(
    vals=st.lists(st.integers(0, 1000), min_size=0, max_size=60),
    n_buckets=st.integers(1, 8),
)
@SETTINGS
def test_distributed_prefix_sum_matches_naive(spark, vals, n_buckets):
    from pyspark.sql import functions as F

    from ehr_data_pipeline_spark.operators.packing import distributed_prefix_sum

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v long"
    )
    got = {
        r["id"]: r["offset"]
        for r in distributed_prefix_sum(
            df, id_col="id", value_col="v", out_col="offset",
            n_buckets=n_buckets,
        ).collect()
    }
    acc = 0
    for i, v in enumerate(vals):
        assert got[i] == acc, (i, vals)
        acc += v


@given(
    texts=st.lists(
        st.lists(st.sampled_from(["spark", "shuffle", "join", "scan", "agg"]),
                 min_size=2, max_size=12),
        min_size=2, max_size=10,
    ),
    threshold=st.sampled_from([0.5, 0.7, 0.9]),
)
@SETTINGS
def test_prefix_filter_equals_brute_force(spark, texts, threshold):
    from ehr_data_pipeline_spark.operators.text_dedup import (
        jaccard_pairs,
        jaccard_pairs_prefix,
    )

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(texts)],
        "doc_id long, text string",
    )
    brute = {(r["doc_a"], r["doc_b"], r["jaccard"])
             for r in jaccard_pairs(df, threshold=threshold).collect()}
    pref = {(r["doc_a"], r["doc_b"], r["jaccard"])
            for r in jaccard_pairs_prefix(
                df, threshold=threshold, persist_shingles=False).collect()}
    assert brute == pref
