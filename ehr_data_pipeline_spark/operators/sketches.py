"""Mergeable sketches as DataFrames — count-min (Cormode &
Muthukrishnan), HyperLogLog (Flajolet et al.), and a Bloom filter
(Bloom 1970), all expressed relationally.

A CM sketch here is just a small DataFrame of ``(row, bucket, cnt)``
cells: ``depth`` independent hash rows × ``width`` buckets. That makes
every sketch property a plain relational fact:

- **build** is one groupBy over exploded (row, bucket) pairs — map-side
  combine does almost all the work, the shuffle is ≤ depth×width rows per
  partition regardless of input size;
- **merge** is ``unionByName`` + the same groupBy (cell-wise addition) —
  the property that lets per-partition / per-day sketches roll up without
  touching raw data;
- **estimate** is a join + min-over-rows, with the classic one-sided
  guarantee: estimate ≥ true count, and ≤ true + ε·N with probability
  1−δ for width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉.

The bucket hash is md5-derived (like the shingle/minhash hashes), so the
whole sketch — build, merge, estimate — is deterministic and replays
bit-for-bit in DuckDB: an APPROXIMATE summary with an EXACT oracle.

The HLL and Bloom structures below follow the same design rules:

- **HLL registers** are ``(bucket, reg)`` rows — ``m = 2^p`` buckets,
  register = max leading-zero rank of the 44 remaining hash bits. Merge
  is cell-wise MAX (max commutes ⇒ merge(hll(A), hll(B)) == hll(A∪B)
  EXACTLY, not just approximately). The raw estimator α·m²/Σ2^-reg is an
  exact dyadic-integer sum followed by a fixed chain of IEEE +,*,/ on
  exactly-representable operands — bit-identical across engines (the
  small-range linear-counting correction needs ``ln``, which is libm and
  NOT cross-engine bit-stable — measured on the unigram-LM work — so it
  is deliberately left to the caller; the zero-register count is
  reported so they can).
- **Bloom bits** are a DataFrame of distinct set bit positions; build is
  explode(k probes)+distinct (shuffle ≤ n_bits rows), membership is a
  broadcast join + count==k, one-sided: no false negatives ever.

The reference has no sketches (its only aggregates are the metadata
profiles, data_quality_checker.py:10-163); this is north-star surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_DEPTH = 4
DEFAULT_WIDTH = 64


def cm_bucket(col: Column, row: int, width: int) -> Column:
    """Bucket of ``col`` in hash row ``row``: the engine-portable 32-bit
    md5 hash (shared with the shingle/minhash family —
    ``text_dedup.base_shingle_hash``) of 'row:value', mod width. DuckDB
    twin: ``('0x' || substr(md5(row || ':' || v), 1, 8))::BIGINT % width``."""
    from ehr_data_pipeline_spark.operators.text_dedup import base_shingle_hash

    return base_shingle_hash(
        F.concat(F.lit(f"{row}:"), col.cast("string"))
    ) % F.lit(width)


def cm_build(
    df: DataFrame,
    col: str,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Build the sketch: ``(row, bucket, cnt)`` cells (absent cell = 0).
    One explode (×depth) + one groupBy; the shuffle after map-side
    partial aggregation is bounded by depth×width rows per partition —
    at 100 TB the sketch is still ≤ depth×width rows total."""
    cells = df.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("row"),
                    cm_bucket(F.col(col), r, width).alias("bucket"),
                )
                for r in range(depth)
            ])
        ).alias("c")
    )
    return (
        cells.groupBy(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _cellwise_merge(
    sketches: "tuple[DataFrame, ...]", keys: "tuple[str, ...]", agg: Column
) -> DataFrame:
    """Shared merge shape for every mergeable structure here: union all
    register/cell sets, then one cell-wise aggregate keyed on the cell
    address — only the key columns and the combining aggregate differ
    (SUM for counts, MAX for HLL ranks)."""
    if not sketches:
        raise ValueError("merge requires at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*keys).agg(agg)


def cm_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of sketches built with the same (depth, width) —
    sketch(A ∪ B) == merge(sketch(A), sketch(B)) exactly."""
    return _cellwise_merge(sketches, ("row", "bucket"), F.sum("cnt").alias("cnt"))


def cm_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    col: str,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Point-frequency estimates for ``queries[col]``: min over the
    depth rows of the addressed cells (absent cell = 0). The sketch side
    is depth×width rows — broadcast by construction — so estimation adds
    no shuffle over the query set."""
    q = queries.select(col).distinct()
    addressed = q.select(
        col,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("row"),
                    cm_bucket(F.col(col), r, width).alias("bucket"),
                )
                for r in range(depth)
            ])
        ).alias("c"),
    ).select(col, F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
    return (
        addressed.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("bigint").alias("cms_estimate"))
    )


# ---------------------------------------------------------------------------
# HyperLogLog — mergeable distinct-count registers
# ---------------------------------------------------------------------------

HLL_P = 8  # 2^8 = 256 buckets; standard error ≈ 1.04/sqrt(m) ≈ 6.5%
HLL_M = 1 << HLL_P
_HLL_HASH_HEX = 13  # 13 md5 hex chars = 52 bits, exact in BIGINT and DOUBLE
_HLL_REST_BITS = _HLL_HASH_HEX * 4 - HLL_P  # 44 bits feed the rank
_HLL_MAX_RANK = _HLL_REST_BITS + 1  # rank of an all-zero remainder


def hll_hash(col: Column) -> Column:
    """52-bit engine-portable hash: first 13 md5 hex chars as bigint
    (DuckDB: ``('0x' || substr(md5(v), 1, 13))::BIGINT``). 52 bits keep
    every intermediate exact in both BIGINT and DOUBLE."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, _HLL_HASH_HEX), 16, 10).cast(
        "bigint"
    )


def _hll_rank(rest: Column) -> Column:
    """Leading-zero rank of the 44-bit remainder: 45 - bit_length(rest),
    where bit_length is ``length(bin(x))`` — ``bin`` exists with identical
    no-leading-zeros semantics in Spark and DuckDB, so the rank needs no
    log2 (libm, not cross-engine bit-stable)."""
    return F.when(rest == 0, F.lit(_HLL_MAX_RANK)).otherwise(
        F.lit(_HLL_MAX_RANK) - F.length(F.bin(rest))
    )


def hll_build(df: DataFrame, col: str, group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Per-group HLL registers ``(*group_cols, bucket, reg)``. The low
    ``p`` hash bits pick the bucket, the remaining 44 rank. One groupBy
    with a MAX partial aggregate — the shuffle is ≤ m rows per group per
    partition regardless of input size; at 100 TB the registers are
    still ≤ m rows per group total."""
    h = hll_hash(F.col(col))
    cells = df.where(F.col(col).isNotNull()).select(
        *group_cols,
        (h % F.lit(HLL_M)).alias("bucket"),
        _hll_rank(F.shiftright(h, HLL_P)).alias("rho"),
    )
    return cells.groupBy(*group_cols, "bucket").agg(F.max("rho").alias("reg"))


def hll_merge(*sketches: DataFrame, group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Cell-wise MAX of register sets built with the same ``p``. Because
    max is commutative/associative/idempotent, merge(hll(A), hll(B)) ==
    hll(A ∪ B) EXACTLY — per-partition / per-day register sets roll up
    without touching raw data, and replayed merges are harmless."""
    return _cellwise_merge(
        sketches, (*group_cols, "bucket"), F.max("reg").alias("reg")
    )


def hll_estimate(sketch: DataFrame, group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Raw HLL estimate α_m·m²/Σ2^-reg per group, plus the zero-register
    count (callers apply linear counting with it if they want the
    small-range correction — ``ln`` is deliberately kept out, see module
    docstring). Cross-engine exactness: Σ2^-reg is computed as the exact
    integer S = Σ2^(45-reg) + zeros·2^45 (every term a dyadic ≤ 2^45,
    total ≤ 2^53 — still exact), then one fixed chain of IEEE ops on
    exactly-representable doubles. α_m = 0.7213/(1 + 1.079/m) is written
    as the rational 7213·m/(10000·m + 10790) evaluated in the identical
    literal expression on both engines."""
    pow2 = F.pow(F.lit(2.0), F.lit(_HLL_MAX_RANK) - F.col("reg")).cast("bigint")
    full = F.pow(F.lit(2.0), F.lit(_HLL_MAX_RANK)).cast("bigint")
    agg = sketch.groupBy(*group_cols).agg(
        (F.sum(pow2) + (F.lit(HLL_M) - F.count(F.lit(1))) * full).alias("s_int"),
        (F.lit(HLL_M) - F.count(F.lit(1))).cast("bigint").alias("zero_registers"),
    )
    alpha_num = F.lit(7213.0) / (F.lit(10000.0) * HLL_M + F.lit(10790.0))
    m3 = float(HLL_M) ** 3
    two_pow = float(2 ** _HLL_MAX_RANK)
    est = alpha_num * F.lit(m3) * F.lit(two_pow) / F.col("s_int").cast("double")
    return agg.select(
        *group_cols,
        est.alias("hll_estimate"),
        F.col("zero_registers"),
    )


# ---------------------------------------------------------------------------
# Bloom filter — one-sided membership bits
# ---------------------------------------------------------------------------

BLOOM_BITS = 1 << 12
BLOOM_K = 5


def _bloom_positions(col: Column, n_bits: int, k: int) -> Column:
    """Array of the k bit positions for a value — the same md5-derived
    row-salted bucket family as the count-min sketch."""
    return F.array(*[cm_bucket(col, r, n_bits) for r in range(k)])


def bloom_build(
    df: DataFrame, col: str, n_bits: int = BLOOM_BITS, k: int = BLOOM_K
) -> DataFrame:
    """Set-bit positions as a one-column DataFrame ``(bit)``. Explode ×k
    + distinct: the shuffle after partial dedup is ≤ n_bits rows per
    partition, and the finished filter is ≤ n_bits rows total — always
    broadcastable, no matter how large the build side was."""
    return (
        df.where(F.col(col).isNotNull())
        .select(F.explode(_bloom_positions(F.col(col), n_bits, k)).alias("bit"))
        .distinct()
    )


def bloom_might_contain(
    probes: DataFrame,
    col: str,
    bloom: DataFrame,
    n_bits: int = BLOOM_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Adds ``might_contain``: true iff all k addressed bits are set.
    Returns one row per DISTINCT probe row (duplicate probes would
    otherwise collapse into one group whose matched-bit count exceeds k,
    flipping a true member to false — a false negative). The filter side
    is broadcast by construction, so probing adds no shuffle over the
    probe set beyond the dedup. One-sided: a member's k bits are all set
    by build, so false negatives are impossible; false positives occur
    at rate ≈ (1 - e^{-kn/m})^k."""
    distinct_probes = probes.distinct()
    probed = distinct_probes.select(
        "*", F.explode(_bloom_positions(F.col(col), n_bits, k)).alias("bit")
    )
    hits = (
        probed.join(F.broadcast(bloom.withColumn("set_", F.lit(1))), "bit", "left")
        .groupBy(*distinct_probes.columns)
        .agg((F.count("set_") == F.lit(k)).alias("might_contain"))
    )
    return hits


# ---------------------------------------------------------------------------
# Histogram quantile sketch — mergeable fixed-grid bins
# ---------------------------------------------------------------------------

HIST_BINS = 64


def _hist_bin(col: Column, lo: float, hi: float, n_bins: int) -> Column:
    """Fixed-grid bin index: floor((v-lo)/(hi-lo)·n), clamped to
    [0, n-1] so out-of-range values land in the edge bins. One fixed
    IEEE chain — identical literal expression on both engines."""
    raw = F.floor((col - F.lit(lo)) / (F.lit(hi) - F.lit(lo)) * F.lit(float(n_bins)))
    return F.greatest(F.lit(0), F.least(F.lit(n_bins - 1), raw)).cast("bigint")


def hist_build(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_bins: int = HIST_BINS,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Mergeable quantile summary: per-group counts on a fixed value
    grid — ``(*group_cols, bin, cnt)``, absent bin = 0. The fixed grid
    is what makes the structure mergeable (same-bin counts add, so
    hist(A∪B) == merge exactly, like the count-min cells) and the
    estimator deterministic; the trade is a fixed ±bin-width error
    instead of t-digest's adaptive one — the right trade when the
    summary must reduce cell-wise across 100 TB of partitions and
    replay bit-for-bit in another engine. Rows without a valid
    measurement (NULL/NaN/±Inf/|v| ≥ 10^12, the engine-wide contract
    in ``functions/measurement.py``) are excluded — the guard is also
    what keeps the bin expression's floor-to-BIGINT inside range under
    ANSI; oracle twin ``WHERE isfinite(v) AND abs(v) < 1e12``."""
    from ehr_data_pipeline_spark.functions.measurement import valid_measurement

    v = valid_measurement(col)
    return (
        df.where(v.isNotNull())
        .groupBy(*group_cols, _hist_bin(F.col(col), lo, hi, n_bins).alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_merge(*sketches: DataFrame, group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Cell-wise sum of histograms built on the same grid —
    hist(A ∪ B) == merge(hist(A), hist(B)) exactly."""
    return _cellwise_merge(
        sketches, (*group_cols, "bin"), F.sum("cnt").cast("bigint").alias("cnt")
    )


def hist_quantile(
    sketch: DataFrame,
    qs: "list[float]",
    lo: float,
    hi: float,
    n_bins: int = HIST_BINS,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Inverse-CDF quantile estimates from the histogram: for each q,
    the first bin whose cumulative count reaches rank q·N, linearly
    interpolated within the bin — ``(*group_cols, q, quantile_est)``,
    with |est − exact| ≤ one bin width by construction.

    Scale shape: the cumulative window is unpartitioned PER GROUP but
    consumes only the ≤ n_bins aggregated rows per group (the same
    bounded-window argument as the distributed prefix sum's bucket
    offsets); the quantile probe set is a tiny literal cross join. The
    estimate is one fixed IEEE chain on exact integers — bit-identical
    across engines."""
    from pyspark.sql import Window

    spark = sketch.sparkSession
    q_df = spark.createDataFrame([(float(q),) for q in qs], "q double")
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy("bin")
    cum = sketch.select(
        *group_cols,
        "bin",
        "cnt",
        F.sum("cnt").over(w).cast("bigint").alias("cum"),
        (F.sum("cnt").over(w) - F.col("cnt")).cast("bigint").alias("cum_before"),
        F.sum("cnt").over(
            Window.partitionBy(*[F.col(c) for c in group_cols])
        ).cast("bigint").alias("n_total"),
    )
    hit = (
        cum.crossJoin(F.broadcast(q_df))
        .where(
            F.col("cum").cast("double")
            >= F.col("q") * F.col("n_total").cast("double")
        )
        .groupBy(*group_cols, "q")
        .agg(F.min(F.struct("bin", "cnt", "cum_before", "n_total")).alias("s"))
        .select(
            *group_cols,
            "q",
            F.col("s.bin").alias("bin"),
            F.col("s.cnt").alias("cnt"),
            F.col("s.cum_before").alias("cum_before"),
            F.col("s.n_total").alias("n_total"),
        )
    )
    width = (F.lit(hi) - F.lit(lo)) / F.lit(float(n_bins))
    frac = (
        F.col("q") * F.col("n_total").cast("double")
        - F.col("cum_before").cast("double")
    ) / F.col("cnt").cast("double")
    est = F.lit(lo) + (F.col("bin").cast("double") + frac) * width
    return hit.select(*group_cols, "q", est.alias("quantile_est"))
