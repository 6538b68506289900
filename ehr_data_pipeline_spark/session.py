"""SparkSession factory tuned for the engine.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` (default 32); on a real
cluster the master comes from spark-submit and is left untouched. The conf
choices here are the 100 TB design points:

- AQE on (runtime partition coalescing, skew-join splitting, plan re-opt)
- broadcast threshold raised so dimension tables never shuffle
- UTC session timezone so timestamp-derived results are deterministic
  across environments (and match the DuckDB oracle)
- Arrow enabled for the few pandas-UDF paths (embedding / multimodal ops)
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ENGINE_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # dims (region/nation/customer at these SFs) should always broadcast
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # prune unread nested struct fields at the scan (FHIR bundles are deep)
    "spark.sql.optimizer.nestedSchemaPruning.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    # parquet TIMESTAMP(NANOS) (e.g. events.ts) is unreadable by Spark's
    # vectorized reader; read as long and convert in the loader (tables.py)
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _master_already_configured() -> bool:
    """True when a master is already set by the deployment (spark-submit
    --master lands in spark.master / PYSPARK_SUBMIT_ARGS, cluster launchers
    set MASTER) — then we must not override it with local[N]."""
    if "MASTER" in os.environ:
        return True
    if "--master" in os.environ.get("PYSPARK_SUBMIT_ARGS", ""):
        return True
    try:
        from pyspark import SparkConf

        return SparkConf().contains("spark.master")
    except Exception:
        return False


def get_spark(
    app_name: str = "ehr-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's conf applied."""
    builder = SparkSession.builder.appName(app_name)
    if master is None and not _master_already_configured():
        master = f"local[{default_parallelism()}]"
    if master:
        builder = builder.master(master)
    conf = dict(ENGINE_CONF)
    conf["spark.sql.shuffle.partitions"] = str(
        shuffle_partitions or default_parallelism()
    )
    if master and master.startswith("local"):
        # local mode: the driver JVM IS the cluster — PySpark's 1g default
        # heap causes flaky OOMs under 32 concurrent task threads. Only
        # effective pre-launch, so set it here where we create the session;
        # on a real cluster spark-submit owns executor/driver sizing.
        conf.setdefault(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
        )
    if extra_conf:
        conf.update(extra_conf)
    for key, value in conf.items():
        builder = builder.config(key, value)
    return builder.getOrCreate()


def apply_runtime_conf(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable subset of ENGINE_CONF to a session we did
    not create (e.g. the driver's). Determinism-critical: timezone affects
    every timestamp→date derivation."""
    conf = dict(ENGINE_CONF)
    # size the shuffle to the local parallelism too (runtime-settable):
    # a vanilla session's 200-partition default just multiplies task
    # overhead at test scale; AQE still coalesces further at runtime
    conf["spark.sql.shuffle.partitions"] = str(default_parallelism())
    for key in (
        "spark.sql.session.timeZone",
        "spark.sql.adaptive.enabled",
        "spark.sql.adaptive.coalescePartitions.enabled",
        "spark.sql.legacy.parquet.nanosAsLong",
        "spark.sql.shuffle.partitions",
    ):
        try:
            spark.conf.set(key, conf[key])
        except Exception:
            pass  # immutable in some deployments; accept session defaults
    return spark
