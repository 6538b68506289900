"""Golden tests for the FHIR ingest path: read → explode → route →
per-entity extraction (SURVEY §2 S1/S3/P1, N1-N11, F1-F4), driven by the
checked-in fixture bundles (FIXTURES.md §1, incl. every dirty variant)."""

from __future__ import annotations

import os

import pytest

from ehr_data_pipeline_spark.fhir.extract import extract_all
from ehr_data_pipeline_spark.fhir.ingest import (
    explode_entries,
    read_and_route,
    read_bundles,
)

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "fhir")


@pytest.fixture(scope="module")
def tables(spark):
    routed = read_and_route(spark, FIXTURE_DIR)
    return {rt: df.cache() for rt, df in extract_all(routed).items()}


def rows_by(df, key):
    return {r[key]: r.asDict() for r in df.collect()}


def test_scan_and_explode_totals(spark):
    bundles = read_bundles(spark, FIXTURE_DIR)
    assert bundles.count() == 4
    entries = explode_entries(bundles)
    assert entries.count() == 27
    assert set(entries.columns) == {"fullUrl", "resource"}


def test_routing_counts_and_silent_drop(spark, tables):
    # P1: per-type totals; the DiagnosticReport entry routes nowhere
    counts = {rt: df.count() for rt, df in tables.items()}
    assert counts == {
        "Patient": 7,
        "CarePlan": 3,
        "Condition": 4,
        "Encounter": 4,
        "Immunization": 3,
        "Observation": 5,
    }
    # sum(routed) == total entries - dropped types (1 DiagnosticReport)
    assert sum(counts.values()) == 27 - 1


def test_extract_patient_full(tables):
    p = rows_by(tables["Patient"], "resource_id")["p1"]
    assert p == {
        "fullUrl": "p1",  # urn:uuid: stripped (F1)
        "resource_id": "p1",
        "resource_gender": "female",
        "resource_birthDate": "1980-01-02",
        "resource_multipleBirthBoolean": False,
        "patient_id": "p1",
        "resource_deceasedDateTime": None,
        "resource_multipleBirthInteger": None,
        "latitude": 42.36,  # N1 first url match
        "longitude": -71.06,
        "full_address": "1 Main St, Apt 2, Boston, MA, 02101",  # F2
        "contact_number": "555-123-4567",  # N2 FIRST phone wins
        "first_name": "Alice",  # N3 given[0]
        "last_name": "Smith",
        "full_name": "Alice Smith",  # F3
        "race": "White",  # N4
        "race_code": "2106-3",
        "ethnicity": "Not Hispanic or Latino",
        "ethnicity_code": "2186-5",
        "birthplace": "Salem, MA",  # F4
        "maritalStatus": "M",  # N5
    }
    # P2: no photo column anywhere
    assert not [c for c in tables["Patient"].columns if "photo" in c.lower()]


def test_extract_patient_dirty_variants(tables):
    by_id = rows_by(tables["Patient"], "resource_id")

    bob = by_id["p2"]
    # address exists but has NO geo extension → lat/lon AND full_address null
    assert bob["latitude"] is None and bob["longitude"] is None
    assert bob["full_address"] is None
    # empty given list → first_name null; '' family is kept but full_name
    # requires both parts truthy (reference f-string guard)
    assert bob["first_name"] is None
    assert bob["last_name"] == ""
    assert bob["full_name"] is None
    # invalid phone format is extracted as-is (cleaning nulls it later)
    assert bob["contact_number"] == "12345"
    # N4 duplicate race url → LAST match wins (reference loop overwrites)
    assert bob["race"] == "Asian" and bob["race_code"] == "2028-9"
    assert bob["ethnicity"] is None
    # F4 birthplace with missing state → trailing ', ' kept ('' default)
    assert bob["birthplace"] == "Lima, "
    assert bob["maritalStatus"] is None
    # invalid date strings extracted untouched (F9 is a cleaning step)
    assert bob["resource_birthDate"] == "1975/03/04"
    assert bob["resource_deceasedDateTime"] == "notadate"
    assert bob["resource_multipleBirthInteger"] == 2
    assert bob["resource_multipleBirthBoolean"] is None

    # out-of-range geo extracted as-is; address without postalCode → ''
    p3 = by_id["p3"]
    assert p3["latitude"] == 123.45 and p3["longitude"] == -200.5
    assert p3["full_address"] == "9 High St, Nowhere, , "

    # minimal patient: every derived column null, no crash (N1-N5 null-safety)
    pm = by_id["pm"]
    for col, val in pm.items():
        if col in ("resource_id", "patient_id", "fullUrl"):
            assert val == "pm"
        else:
            assert val is None, f"{col} should be null, got {val!r}"


def test_extract_encounter(tables):
    by_id = rows_by(tables["Encounter"], "resource_id")
    e1 = by_id["e1"]
    assert e1["fullUrl"] == "e1"
    assert e1["resource_class_code"] == "outpatient"
    assert e1["resource_patient_reference"] == "p1"  # urn:uuid: stripped
    assert e1["encounter_type_code"] == "185349003"  # N6
    assert e1["encounter_text"] == "Encounter for check up"
    assert e1["reason_code"] == "R1" and e1["reason_display"] == "Reason One"
    assert e1["resource_period_start"] == "2020-01-01T10:00:00-05:00"
    # Encounter has no subject → patient_id null (reference json_pipeline.py:73-78)
    assert e1["patient_id"] is None

    # shared guard: type[0] WITHOUT coding nulls text too (json_pipeline.py:310-315)
    e2 = by_id["e2"]
    assert e2["encounter_type_code"] is None
    assert e2["encounter_text"] is None
    assert e2["reason_code"] is None

    em = by_id["em"]
    assert all(
        v is None for k, v in em.items() if k not in ("resource_id", "fullUrl")
    )


def test_extract_condition(tables):
    by_id = rows_by(tables["Condition"], "resource_id")
    c1 = by_id["c1"]
    # condition fullUrl is NOT stripped (clean_and_rename skips condition)
    assert c1["fullUrl"] == "urn:uuid:c1"
    assert c1["resource_subject_reference"] == "p1"
    assert c1["resource_context_reference"] == "e1"
    assert c1["patient_id"] == "p1"
    assert c1["condition_display"] == "Diabetes"
    assert c1["condition_code"] == "44054006"
    # empty coding list → null (reference would crash; engine is tolerant)
    c2 = by_id["c2"]
    assert c2["condition_display"] is None and c2["condition_code"] is None
    assert c2["patient_id"] is None  # no subject


def test_extract_observation(tables):
    rows = tables["Observation"].collect()
    by_url = {r["fullUrl"]: r.asDict() for r in rows}
    o1 = by_url["o1"]
    assert o1["observation_type"] == "Hemoglobin A1c"
    assert o1["observation_code"] == "4548-4"
    assert o1["resource_valueQuantity_value"] == 6.2
    assert o1["resource_valueQuantity_unit"] == "%"
    assert o1["resource_encounter_reference"] == "e1"
    assert o1["patient_id"] == "p1"
    o2 = by_url["o2"]
    assert o2["resource_id"] is None  # missing id (dropna target)
    assert o2["resource_valueQuantity_value"] is None


def test_extract_immunization(tables):
    rows = {r["resource_date"]: r.asDict() for r in tables["Immunization"].collect()}
    i1 = rows["2020-01-01T10:45:00-05:00"]
    assert i1["vaccine_type"] == "Influenza" and i1["vaccine_code"] == "140"
    assert i1["resource_patient_reference"] == "p1"
    assert i1["resource_encounter_reference"] == "e1"
    assert i1["resource_wasNotGiven"] is False
    assert i1["resource_primarySource"] is True
    assert i1["patient_id"] is None  # Immunization has no subject
    i2 = rows["2020-01-15"]
    assert i2["resource_encounter_reference"] is None  # dropna target


def test_extract_careplan(tables):
    rows = {r["resource_subject_reference"]: r.asDict() for r in tables["CarePlan"].collect()}
    cp1 = rows["p1"]
    assert cp1["careplan_name"] == "Diabetes self management plan"
    assert cp1["careplan_code"] == "698360004"
    # N11: in-row flatten + join
    assert cp1["careplan_activity"] == "Diabetic diet, Exercise therapy"
    assert cp1["careplan_activity_code"] == "160670007, 229065009"
    assert cp1["patient_id"] == "p1"

    cp2 = rows["p2"]
    # category [{}] has no coding → shared guard nulls name AND code
    assert cp2["careplan_name"] is None and cp2["careplan_code"] is None
    # displays all missing → null; codes keep the one truthy value
    assert cp2["careplan_activity"] is None
    assert cp2["careplan_activity_code"] == "X1"

    cpm = rows[None]
    assert cpm["careplan_activity"] is None and cpm["careplan_name"] is None
