"""End-to-end FHIR ETL — the reference's Airflow DAG
(``/root/reference/json_pipeline.py:1080-1132``: extract_data →
transform_data → quality checks → clean → load_postgres → output_csv) as
ONE lazy Catalyst composition.

The pandas DAG materializes every stage into driver memory between tasks;
here each entity table is a single unexecuted plan — scan → explode →
route → extract → clean — that executes exactly once, when the sink
writes it. Consequences at 100 TB:

- ONE distributed parse of the bundle files total: the direct path
  persists the shared exploded scan (``single_parse``, SURVEY §2.2 P1 —
  "6× filter over one cached exploded scan"), the staged path lands it
  as bronze parquet; ``single_parse=False`` opts back into fully
  independent per-entity plans (6 parses);
- cleaning row counts (the reference's ``len(df)`` logging, A6) ride
  along as ``observe()`` metrics on the write action instead of forcing
  extra ``count()`` scans;
- the quality report is the only deliberately separate action — the
  reference also runs its checks as a distinct task (``:516-529``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ehr_data_pipeline_spark.fhir.clean import CLEANERS
from ehr_data_pipeline_spark.fhir.extract import extract_all
from ehr_data_pipeline_spark.fhir.ingest import read_and_route
from ehr_data_pipeline_spark.fhir.quality import fhir_quality_report
from ehr_data_pipeline_spark.operators.quality import row_count_observer
from ehr_data_pipeline_spark.sinks import write_entity_tables


@dataclass
class PipelineResult:
    """What the DAG hands back: the cleaned plans, where the sink wrote
    each table, the observed post-clean row counts, and the quality
    report (lazy; collect to render).

    ``source`` is the persisted exploded-entry frame when the direct
    single-parse path was taken (``stage_dir=None, single_parse=True``);
    its cache lives until :meth:`release`, an explicit
    ``spark.catalog.clearCache()``, or session end. Call ``release()``
    once you are done re-running the returned plans."""

    tables: dict[str, DataFrame]
    paths: dict[str, str] = field(default_factory=dict)
    row_counts: dict[str, int] = field(default_factory=dict)
    quality_report: DataFrame | None = None
    source: DataFrame | None = None

    def release(self) -> None:
        """Unpersist the shared exploded-entry cache (no-op for the
        staged path or ``single_parse=False``). The returned plans stay
        runnable afterwards — they fall back to re-parsing the input."""
        if self.source is not None:
            self.source.unpersist()
            self.source = None


def run_pipeline(
    spark: SparkSession,
    input_dir: str,
    output_dir: str | None = None,
    fmt: str = "parquet",
    quality: bool = True,
    stage_dir: str | None = None,
    single_parse: bool = True,
) -> PipelineResult:
    """Run the full ETL over a directory of FHIR bundle JSON files.

    ``output_dir=None`` skips the load step (row counts then stay empty —
    nothing has executed; the returned plans are still runnable).
    ``quality=True`` attaches the pre-clean quality report over the
    extracted tables, mirroring the reference's check-before-clean order
    (json_pipeline.py:1100-1109).

    ``stage_dir`` lands the exploded entries as a bronze parquet layer
    first and routes from that: the multiLine JSON parse (the expensive
    per-file step) runs ONCE instead of once per entity plan + quality
    report, and every downstream read is a column-pruned parquet scan.
    At 100 TB this is the recommended pattern (raw JSON → durable bronze
    columnar once; re-runs never touch the raw files again).

    ``single_parse`` (direct path only, default on) persists the shared
    exploded-entry scan so the six entity plans materialize it ONCE
    instead of each re-running the multiLine JSON parse — SURVEY §2.2's
    P1 mapping ("6× filter over one cached exploded scan"). The persist
    is lazy, so plan laziness is fully preserved (nothing executes until
    an action); the only semantic addition is an explicit cache lifetime,
    surfaced as ``PipelineResult.source`` / ``.release()``. Set
    ``single_parse=False`` to get six independent re-parsing plans (the
    pre-r9 behavior — right only when a single entity will ever be
    forced). Sizing note: the cache is MEMORY_AND_DISK over the exploded
    entries, i.e. cluster storage ≈ input size; at the 100 TB design
    point prefer ``stage_dir``, which buys the same single parse with
    durable, pruned storage instead of cache."""
    source: DataFrame | None = None
    if stage_dir is not None:
        from ehr_data_pipeline_spark.fhir.ingest import (
            explode_entries,
            read_bundles,
            route_resources,
        )

        explode_entries(read_bundles(spark, input_dir)).write.mode(
            "overwrite"
        ).parquet(stage_dir)
        routed = route_resources(spark.read.parquet(stage_dir))
    elif single_parse:
        from pyspark import StorageLevel

        from ehr_data_pipeline_spark.fhir.ingest import (
            explode_entries,
            read_bundles,
            route_resources,
        )

        source = explode_entries(read_bundles(spark, input_dir)).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        routed = route_resources(source)
    else:
        routed = read_and_route(spark, input_dir)
    extracted = extract_all(routed)
    report = fhir_quality_report(extracted) if quality else None

    cleaned: dict[str, DataFrame] = {}
    observations: dict[str, object] = {}
    for rt, df in extracted.items():
        if rt not in CLEANERS:
            continue
        observed, obs = row_count_observer(CLEANERS[rt](df), f"clean_{rt}")
        cleaned[rt] = observed
        observations[rt] = obs

    result = PipelineResult(
        tables=cleaned, quality_report=report, source=source
    )
    if output_dir is not None:
        result.paths = write_entity_tables(cleaned, output_dir, fmt=fmt)
        # the write was the action; Observation metrics are now populated
        result.row_counts = {
            rt: observations[rt].get["n_rows"] for rt in cleaned
        }
    return result
