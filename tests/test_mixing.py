"""Training-mixture operators: token-budget domain sampling and
length-bucketed batching on hand-built corpora with known token counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from ehr_data_pipeline_spark.operators.mixing import (
    domain_mixture_sample,
    length_bucketed_batches,
)


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, dom string, text string")


def _tokens():
    return F.size(F.split(F.col("text"), " "))


def test_mixture_budget_cut_and_crossing_doc(spark):
    """Each domain contributes docs in hash order until the budget is
    reached; the budget-crossing doc is included, everything after it is
    cut, and a domain with fewer tokens than budget keeps all docs."""
    rows = (
        # domain a: 5 docs x 10 tokens = 50 tokens, budget 25 -> in hash
        # order the first 2 docs are under budget, the 3rd crosses at
        # tokens_before=20 < 25, the 4th has tokens_before=30 -> cut
        [(i, "a", "t " * 9 + "t") for i in range(5)]
        # domain b: 2 docs x 10 = 20 tokens < budget 100 -> all kept
        + [(10 + i, "b", "t " * 9 + "t") for i in range(2)]
        # domain c: not in shares -> excluded entirely
        + [(20, "c", "t " * 9 + "t")]
    )
    out = domain_mixture_sample(
        _corpus(spark, rows),
        domain_col="dom",
        id_col="doc_id",
        token_count=_tokens(),
        shares={"a": 0.25, "b": 1.0},
        total_token_budget=100,
    ).collect()
    by_dom: dict[str, list] = {}
    for r in out:
        by_dom.setdefault(r["domain"], []).append(r)
    assert set(by_dom) == {"a", "b"}
    assert len(by_dom["a"]) == 3  # 2 under budget + the crossing doc
    assert sum(r["n_tokens"] for r in by_dom["a"]) == 30  # within one doc of 25
    assert len(by_dom["b"]) == 2  # under-budget domain keeps everything
    assert all(r["n_tokens"] == 10 for r in out)


def test_mixture_is_deterministic_and_key_stable(spark):
    """The same keys survive on every run and under repartitioning —
    the draw depends only on the key hash, not on partition layout."""
    rows = [(i, "a", "x " * (i % 7 + 1) + "x") for i in range(100)]
    args = dict(
        domain_col="dom", id_col="doc_id", token_count=_tokens(),
        shares={"a": 0.5}, total_token_budget=200,
    )
    base = {r["doc_id"] for r in domain_mixture_sample(_corpus(spark, rows), **args).collect()}
    repart = {
        r["doc_id"]
        for r in domain_mixture_sample(
            _corpus(spark, rows).repartition(13), **args
        ).collect()
    }
    assert base == repart and 0 < len(base) < 100


def test_length_batches_buckets_and_numbering(spark):
    """Bucket index counts reached edges (>=); batches within a bucket
    are batch_size rows in hash order with a trailing partial batch."""
    rows = [(i, "d", "w " * (n - 1) + "w") for i, n in enumerate(
        [3, 15, 16, 31, 32, 63, 64, 100] + [20] * 10
    )]
    out = length_bucketed_batches(
        _corpus(spark, rows),
        id_col="doc_id",
        token_count=_tokens(),
        bucket_edges=[16, 32, 64],
        batch_size=4,
    ).collect()
    buckets = {r["doc_id"]: r["len_bucket"] for r in out}
    assert buckets[0] == 0 and buckets[1] == 0          # 3, 15 < 16
    assert buckets[2] == 1 and buckets[3] == 1          # 16, 31
    assert buckets[4] == 2 and buckets[5] == 2          # 32, 63
    assert buckets[6] == 3 and buckets[7] == 3          # 64, 100
    # bucket 1 holds docs 2,3 plus the ten 20-token docs = 12 rows ->
    # batches of 4: three full batches, positions 0..3 each
    b1 = [r for r in out if r["len_bucket"] == 1]
    assert len(b1) == 12
    sizes: dict[int, int] = {}
    for r in b1:
        sizes[r["batch_no"]] = sizes.get(r["batch_no"], 0) + 1
        assert 0 <= r["pos_in_batch"] < 4
    assert sorted(sizes.items()) == [(0, 4), (1, 4), (2, 4)]
    # positions within a batch are distinct
    assert len({(r["batch_no"], r["pos_in_batch"]) for r in b1}) == 12


def test_length_batches_trailing_partial_batch(spark):
    rows = [(i, "d", "w w w") for i in range(7)]
    out = length_bucketed_batches(
        _corpus(spark, rows), id_col="doc_id", token_count=_tokens(),
        bucket_edges=[100], batch_size=3,
    ).collect()
    sizes: dict[int, int] = {}
    for r in out:
        sizes[r["batch_no"]] = sizes.get(r["batch_no"], 0) + 1
    assert sorted(sizes.items()) == [(0, 3), (1, 3), (2, 1)]


def test_temperature_mixture_upsamples_small_domains(spark):
    """alpha=0.5 budgets ∝ √tokens: a domain with 4× the tokens gets
    only 2× the budget — the small domain is upsampled relative to its
    natural share. Exact budget math: T_big=4000, T_small=1000 →
    q=√T·1e6 → budgets 8000·(2/3)≈5333 and 8000·(1/3)≈2667."""
    from ehr_data_pipeline_spark.operators.mixing import (
        temperature_mixture_sample,
    )

    rows = [(i, "big", 40) for i in range(300)] + [
        (1000 + i, "small", 10) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id int, lang string, nt int")
    out = temperature_mixture_sample(
        df, "lang", "doc_id", F.col("nt"), total_token_budget=8000
    ).collect()
    got = {}
    for r in out:
        got[r["domain"]] = got.get(r["domain"], 0) + r["n_tokens"]
    # T_big=12000, T_small=3000 → √ weights 2:1 → budgets 5333/2667;
    # each domain lands within one doc of its √-weighted budget
    assert 5333 <= got["big"] <= 5333 + 40
    assert 2667 <= got["small"] <= 2667 + 10
    # the natural (proportional) split of 8000 would be 6400/1600 — the
    # small domain was upsampled
    assert got["small"] > 1600

    # deterministic under repartition
    again = temperature_mixture_sample(
        df.repartition(7), "lang", "doc_id", F.col("nt"),
        total_token_budget=8000,
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_temperature_mixture_alpha_one_is_proportional(spark):
    """alpha=1 (the pow path) reduces to proportional budgets."""
    from ehr_data_pipeline_spark.operators.mixing import (
        temperature_mixture_sample,
    )

    rows = [(i, "a", 30) for i in range(50)] + [
        (100 + i, "b", 10) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "doc_id int, lang string, nt int")
    out = temperature_mixture_sample(
        df, "lang", "doc_id", F.col("nt"), total_token_budget=1000,
        alpha=1.0,
    ).collect()
    got = {}
    for r in out:
        got[r["domain"]] = got.get(r["domain"], 0) + r["n_tokens"]
    # T_a=1500, T_b=500 → budgets 750/250, within one doc
    assert 750 <= got["a"] <= 780 and 250 <= got["b"] <= 260


def test_temperature_mixture_weights_bounded_at_huge_token_counts(spark):
    """Regression for the review finding: the OLD absolute quantization
    round(T^α·1e6) overflowed int64 near T^α ≈ 9e12 (silent Spark
    saturation → equal budgets for every large domain). The relative
    form must keep exact proportional budgets at 1e16-token domains."""
    from ehr_data_pipeline_spark.operators.mixing import (
        temperature_mixture_sample,
    )

    rows = [
        (1, "a", 4 * 10**15), (2, "a", 4 * 10**15),  # T_a = 8e15
        (3, "b", 4 * 10**15),                         # T_b = 4e15
    ]
    df = spark.createDataFrame(rows, "doc_id int, lang string, nt long")
    out = temperature_mixture_sample(
        df, "lang", "doc_id", F.col("nt"), total_token_budget=9000,
        alpha=1.0,
    ).collect()
    budgets_hit = {}
    for r in out:
        budgets_hit[r["domain"]] = budgets_hit.get(r["domain"], 0) + 1
    # proportional budgets 6000/3000: domain a's budget (6000) is crossed
    # by its first 4e15-token doc, so exactly one doc each survives —
    # under saturation both domains would get 4500 and the result is the
    # same shape, so assert the WEIGHTS via a finer split instead:
    assert budgets_hit == {"a": 1, "b": 1}
    rows2 = [(i, "a", 10**13) for i in range(900)] + [
        (10000 + i, "b", 10**13) for i in range(300)
    ]
    df2 = spark.createDataFrame(rows2, "doc_id int, lang string, nt long")
    out2 = temperature_mixture_sample(
        df2, "lang", "doc_id", F.col("nt"),
        total_token_budget=120 * 10**13, alpha=1.0,
    ).collect()
    got = {}
    for r in out2:
        got[r["domain"]] = got.get(r["domain"], 0) + 1
    # T_a = 9e15, T_b = 3e15 → proportional budgets 90/30 docs' worth
    # (±1 doc: the budget-crossing doc is included, and the 1e-9 weight
    # quantization can nudge the budget a hair past an exact doc
    # boundary); the old absolute form saturated both weights to
    # Long.MAX → 60/60, far outside these bands
    assert got["a"] in (90, 91) and got["b"] in (30, 31)


def test_temperature_mixture_null_domain_rows_are_invisible(spark):
    """Pins the documented exclusion (ADVICE r10 + r11 review fix):
    rows with a NULL domain are dropped AT ENTRY, so they are absent
    from the output AND leave every named domain's budget untouched —
    the output with NULL rows present must equal the output with them
    deleted. (Before the entry filter, the NULL group's weight sat in
    max/Σw and silently under-spent the budget: with domains a=NULL=50%
    of tokens, domain a's budget halved.)"""
    from ehr_data_pipeline_spark.operators.mixing import (
        temperature_mixture_sample,
    )

    named = (
        [(i, "a", "t " * 9 + "t") for i in range(6)]
        + [(10 + i, "b", "t " * 9 + "t") for i in range(2)]
    )
    nulls = [(20 + i, None, "t " * 9 + "t") for i in range(8)]

    def run(rows):
        # budget BELOW the corpus total so the cut depends on the
        # derived budgets — dilution would change which docs survive
        return sorted(
            map(
                tuple,
                temperature_mixture_sample(
                    _corpus(spark, rows),
                    domain_col="dom",
                    id_col="doc_id",
                    token_count=_tokens(),
                    total_token_budget=40,
                ).collect(),
            )
        )

    with_nulls = run(named + nulls)
    without = run(named)
    assert with_nulls == without
    assert {t[1] for t in with_nulls} == {"a", "b"}
