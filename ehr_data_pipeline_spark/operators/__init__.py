"""Reusable distributed operators: key dedup (``dedup``), text dedup
families + connected-component clustering (``text_dedup``), text analysis
+ winnowing fingerprints (``text_analysis``), embedding similarity search
(``similarity``), deterministic sampling / dataset splits (``sampling``),
temporal joins (``temporal``), multimodal binary columns (``multimodal``),
quality profiling (``quality``), and skew mitigation (``skew``)."""
