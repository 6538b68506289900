"""Adversarial edge-corpus oracle sweep.

ADVICE r5 found a latent cardinality mismatch (empty docs vanishing from
the doc_substring_dedup oracle) that the stock sf corpora could never
trip. This suite generalizes that discovery: every documents-only
registry query re-runs against its own DuckDB oracle on a corpus built
of nothing but degenerate documents — empty text, whitespace-only, NULL
text, NULL lang/source, a single token, one 5000-char token, massive
repeats, duplicated 8-token runs, unicode (accents/CJK/emoji),
punctuation-only, digits — so a Spark-vs-DuckDB divergence on any edge
(tokenizer behavior on empties, NULL group keys, unicode lower(),
cardinality of empty groups) fails here before a driver corpus ever
contains one.

The query subset is computed from the oracles themselves (references the
documents view and nothing else), so new documents-only queries join the
sweep automatically.
"""

from __future__ import annotations

import re

import duckdb
import pytest

from ehr_data_pipeline_spark.queries import REGISTRY
from tests.oracle_utils import compare_spark_vs_oracle

_OTHER_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "embeddings",
)


def _documents_only_names() -> list[str]:
    names = []
    for n, s in REGISTRY.items():
        if s.oracle is None:
            continue
        o = s.oracle.lower()
        if "documents" in o and not any(
            re.search(rf"\b{t}\b", o) for t in _OTHER_TABLES
        ):
            names.append(n)
    return names


DOC_ONLY = _documents_only_names()

_RUN = "r1 r2 r3 r4 r5 r6 r7 r8"


def _edge_rows() -> list[tuple]:
    rows = [
        (0, "", "en", "edge"),
        (1, "   ", "en", "edge"),
        (2, "\t\n \t", "en", "edge"),
        (3, None, "en", "edge"),
        (4, "token", "en", "edge"),
        (5, " ".join(["a"] * 16), "en", "edge"),
        (6, _RUN + " tail six", "en", "edge"),
        (7, "head seven " + _RUN, "en", "edge"),
        (8, " ".join(f"w{i % 50}" for i in range(500)), "en", "edge"),
        (9, "café naïve 北京 emoji 😀 test", "fr", "edge"),
        (10, "!!! ??? ... ,,,", "en", "edge"),
        (11, "123 456 789", "en", "edge"),
        (12, "The THE the tHe", "en", "edge"),
        (13, "null lang doc", None, "edge"),
        (14, "null source doc", "en", None),
        (15, "x" * 5000, "en", "edge"),
    ]
    srcs = ("web", "wiki", "books", "news")
    for i in range(16, 41):
        rows.append(
            (
                i,
                f"filler text document {i} with some shared tokens "
                "hash join stream and a few more words to score",
                "en",
                srcs[i % 4],
            )
        )
    # NULL text on every media modality (doc_id % 3 routes image/audio/
    # video), not just the image one
    rows += [(43, None, "en", "edge"), (44, None, None, None)]
    return [
        (doc_id, text, lang, src, len(text) if text is not None else None)
        for doc_id, text, lang, src in rows
    ]


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    # single-FILE parquet (pyarrow, explicit schema) — the stock testdata
    # layout both engines read; a Spark directory-write would be opaque
    # to the DuckDB view, and pandas would silently float the nullable
    # n_chars column
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("edge_corpus")
    rows = _edge_rows()
    cols = list(zip(*rows))
    table = pa.table(
        {
            "doc_id": pa.array(cols[0], pa.int64()),
            "text": pa.array(cols[1], pa.string()),
            "lang": pa.array(cols[2], pa.string()),
            "source": pa.array(cols[3], pa.string()),
            "n_chars": pa.array(cols[4], pa.int64()),
        }
    )
    pq.write_table(table, str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def edge_con(edge_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{edge_dir}/documents.parquet'"
    )
    yield con
    con.close()


def test_sweep_covers_the_expected_surface():
    # the sweep must keep covering the text/dedup/media families — if this
    # shrinks, an oracle started referencing a second table and silently
    # left the edge sweep
    assert len(DOC_ONLY) >= 35
    for must in (
        "doc_substring_dedup", "doc_exact_dedup_stats", "doc_minhash_lsh_pairs",
        "doc_gopher_quality_report", "media_image_features", "doc_bm25_search",
    ):
        assert must in DOC_ONLY


@pytest.mark.parametrize("name", DOC_ONLY)
def test_edge_corpus_matches_oracle(spark, edge_dir, edge_con, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, edge_dir)
    compare_spark_vs_oracle(df, edge_con, spec.oracle, name=f"{name}[edge]")
