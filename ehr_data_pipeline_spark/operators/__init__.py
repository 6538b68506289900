"""Reusable distributed operators: key dedup (``dedup``) and quality
profiling (``quality``); text dedup, similarity search, text analysis, and
multimodal plumbing land in sibling modules as they are built."""
