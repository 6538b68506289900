"""FHIR bundle ingest: distributed scan + entry explode + resourceType
routing (S1/S2/S3/P1/F1).

Reference semantics (/root/reference/json_pipeline.py):

- S1 scan: the reference loops ``os.listdir`` + ``pd.read_json`` per file
  (json_pipeline.py:100-104). The engine reads the whole directory in ONE
  distributed job: ``spark.read.schema(BUNDLE_SCHEMA).json(path)`` with
  ``multiLine=True`` (a bundle is one JSON object per file) and
  ``recursiveFileLookup`` (subsumes the reference's file-mover,
  all_json_file.py:14-23, S2).
- S3 normalize: ``pd.json_normalize(row['entry'])`` (json_pipeline.py:60)
  becomes ``explode('entry')`` over the typed array — nested struct access
  replaces dotted column names, and nested-schema pruning keeps the scan
  reading only fields downstream extractors touch.
- P1 routing: resourceType dispatch into six entity DataFrames
  (json_pipeline.py:61-94); other types are silently dropped, same as the
  reference's if/elif chain.
- patient_id: ``resource.id`` for Patient rows (json_pipeline.py:66-67);
  for every other type the ``urn:uuid:`` prefix is stripped from
  ``resource.subject.reference`` (json_pipeline.py:73-78) — null when the
  resource has no subject (e.g. Encounter/Immunization carry
  ``patient.reference`` instead, handled by the extractors).
- F1 reference cleanup: ``clean_and_rename`` (json_pipeline.py:122-153)
  strips ``urn:uuid:`` from fullUrl/subject/context/patient/encounter
  reference columns — done here once, on the routed frames.

Scale notes: one scan, six narrow filters — Catalyst pushes the
``resourceType = X`` predicate into each branch and prunes unread struct
fields per branch. No shuffle anywhere in ingest; at 100 TB the cost is
exactly one pass over the input files. Callers that materialize several
entities from the same small input may ``.cache()`` the exploded frame;
at the 100 TB design point re-scanning parquet/json beats caching.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ehr_data_pipeline_spark.fhir.schema import BUNDLE_SCHEMA, RESOURCE_TYPES

URN_UUID = "urn:uuid:"


def strip_urn_uuid(col: Column) -> Column:
    """F1 prefix strip (json_pipeline.py:75,128-151). The reference uses
    ``str.replace`` (all occurrences); the prefix only ever occurs at the
    start, so an anchored regexp_replace is equivalent and cheaper."""
    return F.regexp_replace(col, "^urn:uuid:", "")


def read_bundles(spark: SparkSession, path: str) -> DataFrame:
    """S1/S2: distributed read of a directory (recursive) of FHIR Bundle
    JSON files with the explicit schema — no inference pass, deterministic
    columns regardless of which fields each file happens to contain."""
    return (
        spark.read.schema(BUNDLE_SCHEMA)
        .option("multiLine", True)
        .option("recursiveFileLookup", True)
        .json(path)
    )


def read_bundles_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming variant of :func:`read_bundles`: the same explicit-schema
    multiLine JSON scan over ``readStream``, so newly landed bundle files
    flow through the identical explode → route → extract plans
    incrementally (the reference re-reads the whole directory every daily
    DAG run, json_pipeline.py:100-104; here arrival IS the trigger and
    each file is processed exactly once via source tracking).
    ``maxFilesPerTrigger`` paces backfills of large bundle archives."""
    reader = spark.readStream.schema(BUNDLE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return (
        reader.option("multiLine", True)
        .option("recursiveFileLookup", True)
        .json(path)
    )


def explode_entries(bundles: DataFrame) -> DataFrame:
    """S3: one row per bundle entry — (fullUrl, resource struct)."""
    return bundles.select(F.explode("entry").alias("e")).select(
        F.col("e.fullUrl").alias("fullUrl"),
        F.col("e.resource").alias("resource"),
    )


# Declared in RESOURCE only so permissive parsing keeps accepting files
# that contain them (the reference loads then drops them — P2/P3,
# json_pipeline.py:164,481-506); no extractor, cleaner, or quality check
# reads them. Everything else in RESOURCE is consumed by some extractor
# (fhir/extract.py:54-272 — the fixed field set FIXTURES.md §1 catalogs).
UNCONSUMED_RESOURCE_FIELDS = ("photo", "text", "identifier")


def prune_unconsumed(entries: DataFrame) -> DataFrame:
    """Project the exploded-entry frame down to the consumed-field union
    — the nested ``resource`` struct minus :data:`UNCONSUMED_RESOURCE_FIELDS`
    (photo blobs, narrative text, identifiers). Spark's in-memory cache
    stores whatever the cached plan produces and does NOT prune nested
    struct fields for downstream consumers the way a parquet scan does,
    so the single-parse pipeline persists THIS projection instead of the
    raw explode: the cache then holds only fields some extractor reads
    (photo alone is the dominant unread payload in real FHIR exports).
    Explicit projection = the nested-column pruning the cache can't do
    (VERDICT r9 #2). Field order and names are preserved, so every
    downstream name-based access is unchanged."""
    kept = [
        f.name
        for f in entries.schema["resource"].dataType.fields
        if f.name not in UNCONSUMED_RESOURCE_FIELDS
    ]
    return entries.select(
        "fullUrl",
        F.struct(
            *[F.col(f"resource.{n}").alias(n) for n in kept]
        ).alias("resource"),
    )


def flatten_entries(entries: DataFrame) -> DataFrame:
    """Hoist the ``resource`` struct's fields to top-level columns
    (keeping ``fullUrl``). Spark's columnar in-memory cache prunes
    TOP-LEVEL columns at InMemoryTableScan but never nested struct
    fields, so the single-parse pipeline persists this flattened shape:
    each entity branch then reads only the columns its extractor
    touches from the cache — the per-entity pruning the staged path
    gets from parquet, without the extra write (VERDICT r9 #2)."""
    return entries.select("fullUrl", F.col("resource.*"))


def entries_view(flat: DataFrame) -> DataFrame:
    """Rebuild the (fullUrl, resource struct) shape over a flattened
    frame so routing/extraction code is unchanged. The rebuilt struct is
    free: extractors access ``resource.<field>`` via GetStructField,
    which Catalyst's SimplifyExtractValueOps collapses straight to the
    underlying top-level column — the struct never materializes and the
    cache scan stays pruned (plan-asserted in tests)."""
    fields = [c for c in flat.columns if c != "fullUrl"]
    return flat.select(
        "fullUrl",
        F.struct(*[F.col(n).alias(n) for n in fields]).alias("resource"),
    )


def _with_patient_id(entries: DataFrame, resource_type: str) -> DataFrame:
    if resource_type == "Patient":
        pid = F.col("resource.id")
    else:
        pid = strip_urn_uuid(F.col("resource.subject.reference"))
    return entries.withColumn("patient_id", pid)


def route_resources(entries: DataFrame) -> dict[str, DataFrame]:
    """P1: dispatch exploded entries on resource.resourceType into the six
    entity frames, each with its patient_id derived per the reference.
    Returns {'Patient': df, 'CarePlan': df, ...}; unknown types drop."""
    return {
        rt: _with_patient_id(
            entries.filter(F.col("resource.resourceType") == F.lit(rt)), rt
        )
        for rt in RESOURCE_TYPES
    }


def read_and_route(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    """The reference's whole ingest spine (json_pipeline.py:51-118) as one
    lazy plan per entity: scan → explode → filter(resourceType) →
    patient_id."""
    return route_resources(explode_entries(read_bundles(spark, path)))
