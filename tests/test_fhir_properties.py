"""Property-based robustness (SURVEY §5.4): FHIR-ish bundles with fields
randomly deleted at EVERY nesting level must never crash the
scan → explode → route → extract pipeline, and row totals must be
conserved (routed counts partition the typed entries; extractors are
row-preserving projections).

This is the pandas-parity risk the survey flags as biggest
(/root/reference/json_pipeline.py uses .get(..., None) chains that
tolerate any missing level): here the explicit BUNDLE_SCHEMA +
try-element_at idioms must tolerate the same."""

from __future__ import annotations

import json
import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ehr_data_pipeline_spark.fhir.extract import extract_all
from ehr_data_pipeline_spark.fhir.ingest import (
    explode_entries,
    read_bundles,
    route_resources,
)
from ehr_data_pipeline_spark.fhir.schema import RESOURCE_TYPES

TEMPLATE_PATH = os.path.join(
    os.path.dirname(__file__), "fixtures", "fhir", "bundle_alice.json"
)
with open(TEMPLATE_PATH) as fh:
    TEMPLATE = json.load(fh)


def _prune(node, draw, keep_prob_key: float = 0.8):
    """Recursively drop dict keys / list elements with drawn booleans —
    produces every shape of partially-missing bundle."""
    if isinstance(node, dict):
        return {
            k: _prune(v, draw)
            for k, v in node.items()
            if draw(st.floats(0, 1)) < keep_prob_key
        }
    if isinstance(node, list):
        return [
            _prune(x, draw) for x in node if draw(st.floats(0, 1)) < keep_prob_key
        ]
    return node


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(data=st.data())
def test_pruned_bundles_never_crash_and_conserve_rows(spark, tmp_path_factory, data):
    n_bundles = data.draw(st.integers(min_value=1, max_value=3))
    bundles = [_prune(TEMPLATE, data.draw) for _ in range(n_bundles)]
    d = tmp_path_factory.mktemp("prop_bundles")
    for i, b in enumerate(bundles):
        with open(d / f"b{i}.json", "w") as fh:
            json.dump(b, fh)

    raw = read_bundles(spark, str(d))
    assert raw.count() == n_bundles

    entries = explode_entries(raw).cache()
    expected_entries = sum(len(b.get("entry", [])) for b in bundles)
    assert entries.count() == expected_entries

    routed = route_resources(entries)
    expected_by_type = {rt: 0 for rt in RESOURCE_TYPES}
    for b in bundles:
        for e in b.get("entry", []):
            rt = (e.get("resource") or {}).get("resourceType")
            if rt in expected_by_type:
                expected_by_type[rt] += 1

    # extractors: row-preserving projections over the routed frames —
    # their row counts double as the routing-count check
    for rt, out in extract_all(routed).items():
        rows = out.collect()
        assert len(rows) == expected_by_type[rt]
        assert "patient_id" in out.columns
    entries.unpersist()
