"""Reusable distributed operators: key dedup (``dedup``), text dedup
families (``text_dedup``), text analysis + winnowing fingerprints
(``text_analysis``), embedding similarity search (``similarity``),
temporal joins (``temporal``), multimodal binary columns (``multimodal``),
quality profiling (``quality``), and skew mitigation (``skew``)."""
