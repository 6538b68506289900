"""Reusable distributed operators: key dedup (``dedup``), text dedup
families + connected-component clustering (``text_dedup``), text analysis
+ winnowing fingerprints (``text_analysis``), embedding similarity search
(``similarity``), deterministic sampling / dataset splits (``sampling``),
temporal joins (``temporal``), SCD2 versioned dimensions (``scd``),
sequence packing / distributed prefix sum (``packing``),
multimodal binary columns (``multimodal``), quality profiling + drift
monitoring (``quality``), and skew mitigation (``skew``)."""
