"""FHIR bundle ingest: explicit nested schema, resource routing, per-entity
extraction, cleaning, and quality reporting — the reference pipeline's whole
capability surface as lazy Catalyst plans."""
