"""FHIR bundle pipeline: explicit nested read schema (``schema``), bundle
reader + resourceType router (``ingest``), per-entity nested-field
extractors (``extract``), cleaning composition (``clean``), per-table
quality-check suites (``quality``), and the end-to-end composition
(``pipeline``) — the reference pipeline's capability surface as lazy
Catalyst plans."""
