"""Time registry queries with the noop sink (guide §1.4): median of 3
warm passes per query at $SPARK_GRAFT_SF_DIR, caches cleared between
passes like bench.py. Usage: python tools/time_queries.py <query> [...]
Prints one JSON line {name: median_sec}."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ehr_data_pipeline_spark.queries import REGISTRY  # noqa: E402
from ehr_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    spark = get_spark(app_name="time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    out, passes = {}, {}
    for name in names:
        fn = REGISTRY[name].fn
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        runs = []
        for i in range(3):
            spark.sparkContext.setJobDescription(f"timed:{name}:{i}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        out[name] = sorted(runs)[1]
        passes[name] = runs
    print(json.dumps({"medians": out, "passes": passes}))
    spark.stop()


if __name__ == "__main__":
    main()
