"""Equivalence pins for the r14 optimization round's expression rewrites.

Each rewrite replaced an interpreted higher-order-function shape with a
native-expression form; these tests hold the NEW expression bit-equal to
the OLD one (re-stated here verbatim) on unicode-hostile inputs, so the
hash oracles can never drift through an expression-shape change.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from ehr_data_pipeline_spark.operators.text_analysis import (
    let_bound,
    normalize_text,
)
from ehr_data_pipeline_spark.operators.text_dedup import (
    _MINHASH_P,
    base_shingle_hash,
    minhash_affine_params,
    minhash_signature,
    shingle_set,
)

# strings chosen to stress every divergence channel between the old
# transform(sequence, substr) shingling and the new (?s)-dotall regex
# scan: line separators the ASCII normalizer leaves intact (U+2028/2029/
# NEL — Java regex "." excludes them without DOTALL), astral code points
# (regex "." and substr must both count code points, not UTF-16 units),
# CJK/accents, VT/FF (Java \s strips these in normalize), and the
# shorter-than-k / empty / NULL degenerate contract.
EDGE_TEXTS = [
    None,
    "",
    "abc",  # shorter than k=4
    "abcd",
    "hello world hello world",
    "line separator andnel",
    "emoji \U0001f600\U0001f601\U0001f602 tail",
    "\U0001f600\U0001f600\U0001f600\U0001f600\U0001f600\U0001f600",
    "éèêë àâäî ö ü ß ẞ İstanbul",
    "中文文本测试 中文文本",
    "tab\tvt\x0bff\x0ccr\rmix spaces  collapse",
    "ＦｕｌｌＷｉｄｔｈ ｔｅｘｔ １２３",
    "a" * 3 + " " + "b" * 3,
]


def _old_shingle_set(col, k=4):
    """The pre-r14 expression, verbatim."""

    def grams(nt):
        n = F.length(nt)
        g = F.transform(
            F.sequence(F.lit(1), n - (k - 1)), lambda i: nt.substr(i, F.lit(k))
        )
        return F.when(n >= k, F.array_distinct(g)).otherwise(
            F.array().cast("array<string>")
        )

    return let_bound(normalize_text(col), grams)


def _old_minhash_signature(hs, num_hashes=16):
    """The pre-r14 aggregate/zip_with fold, verbatim."""
    params = [minhash_affine_params(j) for j in range(num_hashes)]
    init = F.array(*[F.lit(_MINHASH_P).cast("bigint") for _ in range(num_hashes)])
    return F.aggregate(
        hs,
        init,
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[(F.lit(a) * h + F.lit(b)) % F.lit(_MINHASH_P) for a, b in params]
            ),
            lambda x, y: F.least(x, y),
        ),
    )


def _fuzz_texts(n=300, seed=1405):
    rng = random.Random(seed)
    alphabet = "ab \t\n\x0b\x0c\rcdé中\U0001f600  0123  "
    return [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 50)))
        for _ in range(n)
    ]


@pytest.fixture(scope="module")
def text_df(spark):
    texts = EDGE_TEXTS + _fuzz_texts()
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, text string"
    )


@pytest.mark.parametrize("k", [1, 2, 4, 7])
def test_shingle_set_regex_scan_equals_old_transform(spark, text_df, k):
    rows = text_df.select(
        "id",
        _old_shingle_set(F.col("text"), k).alias("old"),
        shingle_set(F.col("text"), k).alias("new"),
    ).collect()
    bad = [(r["id"], r["old"], r["new"]) for r in rows if r["old"] != r["new"]]
    assert not bad, f"k={k}: shingle mismatch (incl. order): {bad[:3]}"


def test_minhash_signature_array_min_equals_old_fold(spark, text_df):
    # non-empty shingle sets only — the callers' contract (every call
    # site filters size(sh) > 0 before signing)
    sh = F.array_distinct(F.transform(shingle_set(F.col("text")), base_shingle_hash))
    rows = (
        text_df.select("id", sh.alias("sh"))
        .where(F.size("sh") > 0)
        .select(
            "id",
            _old_minhash_signature(F.col("sh")).alias("old"),
            minhash_signature(F.col("sh")).alias("new"),
        )
        .collect()
    )
    assert rows, "fixture produced no non-empty shingle sets"
    bad = [(r["id"], r["old"], r["new"]) for r in rows if r["old"] != r["new"]]
    assert not bad, f"signature mismatch: {bad[:3]}"


@pytest.mark.parametrize(
    "total_bits,portable", [(60, True), (64, False)]
)
def test_simhash_groups_explode_agg_equals_per_row_fold(
    spark, text_df, total_bits, portable
):
    """_simhash_groups' explode+groupBy sketch must reproduce the per-row
    HOF fold EXACTLY — per input row (multiplicity included): same
    (id, __sim, __rid, __n) multiset, on unicode edges, duplicated
    (id, text) rows, and same-id-different-text rows."""
    from pyspark.sql.window import Window

    from ehr_data_pipeline_spark.operators.text_analysis import whitespace_tokens
    from ehr_data_pipeline_spark.operators.text_dedup import (
        _simhash_groups,
        simhash60_portable,
        simhash64,
    )

    # duplicate-row + shared-id torture on top of the module fixture
    extra = [
        (900, "dup dup dup"), (900, "dup dup dup"),  # identical (id, text) twice
        (900, "same id different text"),             # same id, new text
        (901, "dup dup dup"),                        # identical text, new id
        (902, None), (902, None),                    # duplicated NULL text
    ]
    df = text_df.unionByName(
        spark.createDataFrame(extra, "id int, text string")
    )

    tokens = whitespace_tokens(F.col("text"))
    sim = simhash60_portable(tokens) if portable else simhash64(tokens)
    base = df.select(F.col("id").alias("id"), sim.alias("__sim"))
    gw = Window.partitionBy("__sim")
    old = base.select(
        "id",
        "__sim",
        F.min("id").over(gw).alias("__rid"),
        F.size(F.collect_set(F.col("id")).over(gw)).alias("__n"),
    )
    new = _simhash_groups(df, "id", "text", total_bits, portable, False)
    key = lambda r: (r["id"], r["__sim"], r["__rid"], r["__n"])  # noqa: E731
    a = sorted(map(key, old.collect()))
    b = sorted(map(key, new.collect()))
    assert a == b, (
        f"bits={total_bits} portable={portable}: grouped multiset diverged; "
        f"old-only={set(a)-set(b)}, new-only={set(b)-set(a)}"
    )


def test_minhash_signature_expression_argument_not_duplicated(spark, text_df):
    """The new form must accept a full EXPRESSION argument (not just a
    column reference) and stay value-identical — the let-binding seam."""
    sh_expr = F.array_distinct(
        F.transform(shingle_set(F.col("text")), base_shingle_hash)
    )
    rows = (
        text_df.where(F.size(sh_expr) > 0)
        .select(
            "id",
            _old_minhash_signature(sh_expr).alias("old"),
            minhash_signature(sh_expr).alias("new"),
        )
        .collect()
    )
    bad = [(r["id"], r["old"], r["new"]) for r in rows if r["old"] != r["new"]]
    assert not bad, f"expression-arg signature mismatch: {bad[:3]}"
