"""FHIR bundle pipeline: explicit nested read schema (``schema``), bundle
reader + resourceType router (``ingest``), per-entity nested-field
extractors (``extract``), cleaning composition (``clean``), and per-table
quality-check suites (``quality``) — the reference pipeline's capability
surface as lazy Catalyst plans."""
