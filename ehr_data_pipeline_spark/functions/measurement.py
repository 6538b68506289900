"""The events-domain measurement contract, stated once for the whole
engine (the numeric twin of the round-6 ``NULL text == empty text``
contract in ``operators/text_analysis.py``).

**A valid measurement is a finite double with |v| < 10^12.** Everything
else — NULL, NaN, ±Inf, and finite values at or beyond 10^12 — is a
MISSING measurement:

- every value statistic (sums, averages, min/max, histogram/quantile
  sketches, drift monitors, deltas, rolling windows) sees the column
  through :func:`valid_measurement` and aggregates only the valid
  values;
- the quality suite (A2, ``data_quality_checker.py:34-45`` counts
  violations rather than hiding them) is where the invalid rows
  surface, as the ``Invalid Measurement`` violation class;
- counts of EVENTS (``n_events``) count every row; counts of
  MEASUREMENTS (``n_values``) count only valid ones.

Why 10^12: the engine's order-independent exact sums go through
``DECIMAL(18,6)`` (12 integer digits). Inside the domain the cast is
exact on both engines; outside it, Spark under ANSI and DuckDB both
abort the whole job on a single junk value — so the domain bound is
what makes one poisoned measurement in 100 TB degrade to a quality
finding instead of a dead pipeline. The bound also keeps every derived
integer (bucket ids, epoch µs products) inside BIGINT so no downstream
cast can overflow.

The DuckDB oracle twin of :func:`valid_measurement` is
:func:`measurement_sql`; the cross-engine equivalence is pinned by the
adversarial events corpus in ``tests/test_edge_corpus.py`` (NaN, ±Inf,
1e308, NULLs) on every events-family registry query.

There is a second, related contract for timestamps — **an event with a
NULL ts is off the timeline**: every operator that buckets or orders by
event time (hourly rollups, gapfill, sessionization, SCD2, lag/lead
deltas, retention cohorts, rolling windows) excludes it, mirroring the
built-in behavior of ``session_window``/watermarked streaming (Spark
drops NULL event-time rows there with no opt-out), and the quality
suite counts it (``Missing Timestamp``). Oracles mirror with
``WHERE ts IS NOT NULL``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: |v| must be strictly below this to be a valid measurement —
#: DECIMAL(18,6) holds 12 integer digits.
MEASUREMENT_MAX_ABS = 1e12


def valid_measurement(col: str | Column) -> Column:
    """NULL unless the value is a finite double with |v| < 10^12.

    The strict ``-inf < v < inf`` comparisons are false for NaN and both
    infinities, and the whole guard folds to a cheap branch-free
    expression that costs nothing for in-domain data (the overwhelmingly
    common case)."""
    c = F.col(col) if isinstance(col, str) else col
    ok = (
        (c > F.lit(float("-inf")))
        & (c < F.lit(float("inf")))
        & (F.abs(c) < F.lit(MEASUREMENT_MAX_ABS))
    )
    return F.when(ok, c)


def measurement_sql(expr: str = "value") -> str:
    """The DuckDB oracle twin of :func:`valid_measurement` — splice into
    oracle SQL wherever the Spark plan uses the guard."""
    return (
        f"CASE WHEN isfinite({expr}) AND abs({expr}) < 1e12 THEN {expr} END"
    )


def is_invalid_measurement(col: str | Column) -> Column:
    """True for present-but-invalid measurements (NaN, ±Inf, |v| ≥ 10^12)
    — the predicate the quality suite counts. NULL values are MISSING,
    not invalid, and are counted by the missing-value profile instead."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isNotNull() & valid_measurement(c).isNull()
