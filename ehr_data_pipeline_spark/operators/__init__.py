"""Reusable distributed operators: key dedup (``dedup``), text dedup
families + connected-component clustering + exact-substring span dedup
(``text_dedup``), text analysis + winnowing fingerprints
(``text_analysis``), embedding similarity search (``similarity``),
deterministic sampling / dataset splits / systematic PPS weighted draws (``sampling``), temporal joins +
continuous-aggregate rollups (``temporal``), SCD2 versioned dimensions
(``scd``), sequence packing / distributed prefix sum (``packing``),
multimodal binary columns (``multimodal``), quality profiling + drift
monitoring (``quality``), mergeable sketches — count-min, HyperLogLog,
Bloom (``sketches``), event funnels (``funnel``), training-mixture
construction (``mixing``), corpus cleaning — C4 line filtering +
paragraph dedup (``cleaning``), skew mitigation (``skew``), and
iterative graph algorithms — fixed-point PageRank (``graph``)."""
