"""End-to-end FHIR ETL — the reference's Airflow DAG
(``/root/reference/json_pipeline.py:1080-1132``: extract_data →
transform_data → quality checks → clean → load_postgres → output_csv) as
ONE lazy Catalyst composition.

The pandas DAG materializes every stage into driver memory between tasks;
here each entity table is a single unexecuted plan — scan → explode →
route → extract → clean — that executes exactly once, when the sink
writes it. Consequences at 100 TB:

- one distributed pass over the bundle files per entity (and the scan
  itself is shared until the router's filters diverge);
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
    report (lazy; collect to render)."""

    tables: dict[str, DataFrame]
    paths: dict[str, str] = field(default_factory=dict)
    row_counts: dict[str, int] = field(default_factory=dict)
    quality_report: DataFrame | None = None


def run_pipeline(
    spark: SparkSession,
    input_dir: str,
    output_dir: str | None = None,
    fmt: str = "parquet",
    quality: bool = True,
    stage_dir: str | None = None,
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
    report — measured 1.3× end-to-end on 2 000 small local bundles, and
    the win grows with input size since 6× the JSON parse is replaced by
    6 pruned parquet scans. At 100 TB it is the standard lake pattern
    (raw JSON → bronze columnar once)."""
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

    result = PipelineResult(tables=cleaned, quality_report=report)
    if output_dir is not None:
        result.paths = write_entity_tables(cleaned, output_dir, fmt=fmt)
        # the write was the action; Observation metrics are now populated
        result.row_counts = {
            rt: observations[rt].get["n_rows"] for rt in cleaned
        }
    return result
