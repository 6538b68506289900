"""Training-data mixture construction: token-weighted domain sampling
and length-bucketed batch assignment.

The two operators an LLM pretraining pipeline runs between curation and
packing (neither exists in the reference, which has no notion of a
training corpus — this is north-star surface like sampling.py and
packing.py):

- :func:`domain_mixture_sample` — build a corpus matching a target
  domain mixture BY TOKENS, not rows (the unit the training run
  consumes: "50% en, 20% fr, ..." in the data card always means token
  share). Each domain contributes documents in deterministic keyed-hash
  order until its token budget is met — so the draw is uniform within
  domain, stable across runs/repartitionings, and replayable in SQL.
- :func:`length_bucketed_batches` — group documents of similar token
  length into fixed-size batches (the padding-minimizing loader layout):
  bucket by length band, then number batches within each bucket in
  keyed-hash order.

Scale: both are one shuffle on the grouping key (domain / length
bucket) driving a partitioned window — the stratified-sample shape.
Domains and length bands are coarse (tens, not millions), so window
partitions are large but few; the within-partition work is a sort —
Spark spills it, nothing is driver-sized. A cross-domain skew note for
100 TB: the budget filter cuts each domain to its token budget, so the
post-sample table is bounded by sum(budgets) regardless of input size —
the window ranks only rows that survive no filter, which is the full
domain; for a domain too large to sort per-partition, pre-filter with
``deterministic_sample`` at a rate that oversamples the budget (e.g.
2× budget/domain_tokens) and run the exact budget cut on the survivors.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ehr_data_pipeline_spark.operators.text_analysis import portable_hash60


def _order_hash(id_col: str, salt: str) -> Column:
    """Deterministic per-row draw order: portable 60-bit md5 hash of
    '<salt>:<id>' — key-stable and engine-portable (DuckDB replays it),
    like every hash in the sampling/split family."""
    return portable_hash60(
        F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))
    )


def domain_mixture_sample(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    token_count: Column,
    shares: Mapping[str, float],
    total_token_budget: int,
    salt: str = "mixture",
) -> DataFrame:
    """Sample a training mixture: from every domain named in ``shares``,
    take documents in keyed-hash order until the domain's token budget
    ``round(share * total_token_budget)`` is reached — a document is
    kept while the tokens BEFORE it (exclusive prefix sum in draw order)
    are under budget, so the budget-crossing document is included and
    each domain lands within one document of its target. Domains not in
    ``shares`` are excluded (mixture weights are a whitelist). Shares
    need not sum to 1 (relative budgets, same as sampling-rate configs).

    Output: ``id, domain, n_tokens`` for the surviving documents.
    Exact, deterministic, one window shuffle on the domain.
    """
    budgets = {
        d: int(round(s * total_token_budget)) for d, s in shares.items()
    }
    budget_expr: Column = F.lit(None).cast("bigint")
    for d, b in budgets.items():
        budget_expr = F.when(F.col(domain_col) == d, F.lit(b)).otherwise(
            budget_expr
        )
    h = _order_hash(id_col, salt)
    w = (
        Window.partitionBy("domain")
        .orderBy(h.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.select(
            F.col(id_col),
            F.col(domain_col).alias("domain"),
            token_count.cast("bigint").alias("n_tokens"),
            budget_expr.alias("__budget"),
        )
        .filter(F.col("__budget").isNotNull())
        .withColumn(
            "__tokens_before",
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)),
        )
        .filter(F.col("__tokens_before") < F.col("__budget"))
        .drop("__budget", "__tokens_before")
    )


def length_bucketed_batches(
    df: DataFrame,
    id_col: str,
    token_count: Column,
    bucket_edges: list[int],
    batch_size: int,
    salt: str = "batch",
) -> DataFrame:
    """Assign documents to fixed-size batches of similar length — the
    loader layout that minimizes padding waste: ``len_bucket`` is how
    many of ``bucket_edges`` the doc's token count reaches (band index,
    0..len(edges)), and within each bucket documents are numbered in
    keyed-hash order into batches of ``batch_size`` (the trailing
    partial batch keeps the last numbers). Output: ``id, n_tokens,
    len_bucket, batch_no, pos_in_batch`` — deterministic, one window
    shuffle on the bucket (a handful of coarse bands)."""
    edges = sorted(bucket_edges)
    n_tokens = token_count.cast("bigint")
    bucket: Column = F.lit(0)
    for e in edges:
        bucket = bucket + F.when(n_tokens >= e, 1).otherwise(0)
    h = _order_hash(id_col, salt)
    w = Window.partitionBy("len_bucket").orderBy(h.asc(), F.col(id_col).asc())
    rn = F.row_number().over(w) - 1
    return (
        df.select(
            F.col(id_col),
            n_tokens.alias("n_tokens"),
            bucket.cast("int").alias("len_bucket"),
        )
        .withColumn("batch_no", (rn / batch_size).cast("bigint"))
        .withColumn("pos_in_batch", (rn % batch_size).cast("int"))
    )
