"""Reusable distributed operators: dedup, quality profiling, similarity
search, text analysis, multimodal column plumbing."""
