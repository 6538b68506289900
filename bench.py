"""Benchmark runner: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line the driver records as BENCH_r{N}.json."""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ehr_data_pipeline_spark.queries import bench_queries  # noqa: E402
from ehr_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)$", os.path.basename(sf_dir.rstrip("/")))
    sf = float(m.group(1)) if m else None
    spark = get_spark(app_name="ehr-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    specs = bench_queries()
    # warm EVERY query once (JVM JIT, parquet footers, first-touch page cache)
    # so the timed pass measures the queries, not one-time costs
    for spec in specs.values():
        spec.fn(spark, sf_dir).collect()
        spark.catalog.clearCache()

    timings: dict[str, float] = {}
    for name, spec in specs.items():
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 4)
        # release operator-internal persists: each invocation builds NEW
        # cache entries (fresh DataFrame lineage), so blocks from prior
        # queries are dead weight that only adds eviction/GC churn —
        # measured 229 s -> 201 s across a 105-query session at sf0.1
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 4)
    print(json.dumps({
        "metric": "headline_queries_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
