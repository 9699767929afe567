"""Reference-pipeline parity tests (SURVEY.md §2.A7–A15, §5): deterministic
in-test bundle fixture per FIXTURES.md §5 — dedup-to-latest, nested donor
merge, completeness flags + missing items, validation split, file-browser
flatten, redaction, ES bulk emission."""

from __future__ import annotations

import json

import pyspark.sql.functions as F
import pytest

from engine.metadata_pipeline import (
    EXPECTED_FLAGS,
    build_donor_documents,
    dedup_latest,
    filter_programs,
    flatten_filebrowser,
    merge_donors,
    redact,
    to_es_bulk,
    validate_split,
)

BUNDLE_COLS = (
    "bundle_uuid string, program string, project string, center_name string, "
    "submitter_donor_id string, donor_uuid string, "
    "submitter_specimen_id string, specimen_uuid string, "
    "submitter_specimen_type string, submitter_experimental_design string, "
    "submitter_sample_id string, sample_uuid string, analysis_type string, "
    "workflow_name string, workflow_version string, timestamp string, "
    "workflow_outputs array<struct<file_path string, file_type string, "
    "file_size long>>"
)


def _bundle(i, donor, specimen_type="Normal - blood", analysis="sequence_upload",
            wf="wf-a", ver="1.0.0", ts="2017-01-01T00:00:00", program="PROG1",
            project="proj_a", specimen=None, sample=None, nfiles=2):
    return (
        f"bundle-{i:03d}", program, project, "center-x",
        f"sub-{donor}", donor,
        f"sp-{specimen or donor}", specimen or f"spec-{donor}-n",
        specimen_type, "WGS",
        f"sm-{sample or donor}", sample or f"samp-{donor}-n", analysis,
        wf, ver, ts,
        [(f"/out/{i}/file{j}.bam", "bam", 1000 + i * 10 + j) for j in range(nfiles)],
    )


@pytest.fixture(scope="module")
def bundles(spark):
    rows = []
    # donor-1: complete-ish — normal sequence + alignment, tumor sequence
    rows.append(_bundle(1, "donor-1"))
    rows.append(_bundle(2, "donor-1", analysis="alignment", wf="wf-align"))
    rows.append(
        _bundle(3, "donor-1", specimen_type="Tumour - solid",
                specimen="spec-donor-1-t", sample="samp-donor-1-t")
    )
    # donor-1: two versions of the same workflow on the same sample —
    # dedup keeps the later timestamp (A9)
    rows.append(_bundle(4, "donor-1", analysis="rna_seq_quantification",
                        wf="wf-rna", ver="1.0.0", ts="2017-02-01T00:00:00"))
    rows.append(_bundle(5, "donor-1", analysis="rna_seq_quantification",
                        wf="wf-rna", ver="1.1.0", ts="2017-03-01T00:00:00"))
    # donor-2: normal sequence only (missing everything tumor)
    rows.append(_bundle(6, "donor-2", project="proj_b"))
    # donor-3: redacted bundle
    rows.append(_bundle(7, "donor-3", program="PROG2"))
    # donor-4: invalid (null donor_uuid) — validation split
    bad = list(_bundle(8, "donor-4"))
    bad[5] = None
    rows.append(tuple(bad))
    return spark.createDataFrame(rows, BUNDLE_COLS)


def test_program_filters(bundles):
    assert filter_programs(bundles, only_program=["prog1"]).count() == 7
    assert filter_programs(bundles, skip_program=["PROG2"]).count() == 7
    assert filter_programs(bundles, only_project=["PROJ_B"]).count() == 1


def test_redaction_anti_join(spark, bundles):
    redacted = spark.createDataFrame([("bundle-999",)], "bundle_uuid string")
    # no match → nothing dropped; real ids → dropped
    assert redact(bundles, redacted).count() == 8
    redacted = spark.createDataFrame([("bundle-007",), ("bundle-003",)],
                                     "bundle_uuid string")
    assert redact(bundles, redacted).count() == 6


def test_dedup_latest_version(bundles):
    dd = dedup_latest(bundles)
    assert dd.count() == 7  # one of the two wf-rna versions dropped
    kept = dd.filter(F.col("workflow_name") == "wf-rna").collect()
    assert len(kept) == 1 and kept[0]["workflow_version"] == "1.1.0"
    assert dedup_latest(bundles, preserve_version=True).count() == 8


def test_merge_donors_nested_shape(bundles):
    docs = merge_donors(dedup_latest(bundles))
    d1 = docs.filter(F.col("donor_uuid") == "donor-1").collect()[0]
    assert len(d1["specimens"]) == 2  # normal + tumour
    normal = [s for s in d1["specimens"]
              if s["submitter_specimen_type"].startswith("Normal")][0]
    assert len(normal["samples"]) == 1
    # wf-a seq + wf-align + wf-rna(latest) = 3 analyses on the normal sample
    assert len(normal["samples"][0]["analysis"]) == 3


def test_flags_and_missing_items(bundles):
    docs = build_donor_documents(dedup_latest(bundles))
    d1 = docs.filter(F.col("donor_uuid") == "donor-1").collect()[0]
    assert d1["flags"]["normal_sequence"] is True
    assert d1["flags"]["normal_alignment"] is True
    assert d1["flags"]["tumor_sequence"] is True
    assert d1["flags"]["tumor_alignment"] is False
    assert "tumor_alignment" in d1["missing_items"]
    assert set(d1["present_items"]) == {
        "normal_sequence", "normal_alignment", "tumor_sequence",
        "normal_rna_seq_quantification",
    }
    d2 = docs.filter(F.col("donor_uuid") == "donor-2").collect()[0]
    assert d2["present_items"] == ["normal_sequence"]
    assert len(d2["missing_items"]) == len(EXPECTED_FLAGS) - 1


def test_validation_split(bundles):
    docs = build_donor_documents(dedup_latest(bundles))
    valid, invalid = validate_split(docs)
    assert valid.count() == 3  # donors 1,2,3
    assert invalid.count() == 1  # the null-donor_uuid doc


def test_flatten_filebrowser(bundles):
    dd = dedup_latest(bundles)
    docs = build_donor_documents(dd)
    flat = flatten_filebrowser(docs)
    # one row per workflow output file of every surviving bundle
    expect = dd.select(F.explode("workflow_outputs")).count()
    assert flat.count() == expect
    row = flat.filter(F.col("repoDataBundleId") == "bundle-001").collect()[0]
    assert row["title"] == "file0.bam"
    assert row["workflow"] == "wf-a"
    assert row["file_type"] == "bam"


def test_es_bulk_emission(bundles):
    docs, _ = validate_split(build_donor_documents(dedup_latest(bundles)))
    lines = [r["line"] for r in to_es_bulk(docs).collect()]
    assert len(lines) == 2 * docs.count()
    action = json.loads(lines[0])
    assert "index" in action and action["index"]["_type"] == "meta"
    doc = json.loads(lines[1])
    assert "donor_uuid" in doc and "specimens" in doc
