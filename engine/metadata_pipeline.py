"""The reference's ETL pipeline semantics (SURVEY.md §2.A7–A15), re-expressed
Spark-first over the metadata-bundle shape of FIXTURES.md §5.

Reference parity map (all [R] — reconstructed public behavior of
BD2KGenomics/dcc-metadata-indexer, `metadata_indexer.py` /
`es_filebrowser_index.py`; exact line anchors unavailable, SURVEY.md §0):

- filter_programs  ⇔ --only/--skip program/project flags (A5, ≈L480–540)
- redact           ⇔ redacted-uuid anti-join (A6, ≈L540–580)
- dedup_latest     ⇔ keep latest analysis per (donor,specimen,sample,
                     workflow), --preserve-version disables (A9, ≈L850–950)
- merge_donors     ⇔ nested donor{specimens[{samples[{analysis[...]}]}]}
                     upsert (A7/A8, ≈L600–850) — here three nested
                     collect_list(struct(...)) aggregations
- derive_flags     ⇔ per-donor completeness flags + missing/present items
                     (A10/A11, ≈L950–1100) — conditional aggregation
- validate_split   ⇔ jsonschema validate → valid/invalid routing (A12)
- flatten_filebrowser ⇔ one row per output file via 4 nested loops
                     (es_filebrowser_index.py ≈L50–250) — four explodes
- to_es_bulk       ⇔ ES bulk action/doc JSONL emission (A13, ≈L1200–1300)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

EXPECTED_FLAGS = [
    "normal_sequence",
    "tumor_sequence",
    "normal_alignment",
    "tumor_alignment",
    "normal_germline_variants",
    "tumor_somatic_variants",
    "normal_rna_seq_quantification",
    "tumor_rna_seq_quantification",
]

_FLAG_CONDS = {
    "normal_sequence": ("Normal", "sequence_upload"),
    "tumor_sequence": ("Tumour", "sequence_upload"),
    "normal_alignment": ("Normal", "alignment"),
    "tumor_alignment": ("Tumour", "alignment"),
    "normal_germline_variants": ("Normal", "germline_variant_calling"),
    "tumor_somatic_variants": ("Tumour", "somatic_variant_calling"),
    "normal_rna_seq_quantification": ("Normal", "rna_seq_quantification"),
    "tumor_rna_seq_quantification": ("Tumour", "rna_seq_quantification"),
}


def filter_programs(
    df: DataFrame,
    only_program: list[str] | None = None,
    skip_program: list[str] | None = None,
    only_project: list[str] | None = None,
    skip_project: list[str] | None = None,
) -> DataFrame:
    """A5: case-insensitive program/project only/skip filters."""
    if only_program:
        df = df.filter(F.lower("program").isin([p.lower() for p in only_program]))
    if skip_program:
        df = df.filter(~F.lower("program").isin([p.lower() for p in skip_program]))
    if only_project:
        df = df.filter(F.lower("project").isin([p.lower() for p in only_project]))
    if skip_project:
        df = df.filter(~F.lower("project").isin([p.lower() for p in skip_project]))
    return df


def redact(df: DataFrame, redacted: DataFrame) -> DataFrame:
    """A6: drop bundles whose uuid appears in the redacted list (anti-join)."""
    return df.join(
        F.broadcast(redacted.select("bundle_uuid")), "bundle_uuid", "left_anti"
    )


def dedup_latest(df: DataFrame, preserve_version: bool = False) -> DataFrame:
    """A9: within (donor, specimen, sample, workflow_name) keep the bundle
    with the max timestamp (then max workflow_version as tie-break)."""
    if preserve_version:
        return df
    w = Window.partitionBy(
        "donor_uuid", "specimen_uuid", "sample_uuid", "workflow_name"
    ).orderBy(F.desc("timestamp"), F.desc("workflow_version"), F.desc("bundle_uuid"))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_donors(df: DataFrame) -> DataFrame:
    """A7/A8: fold bundles into nested donor documents. The reference's
    in-memory dict upsert becomes three nested collect_list(struct(...))
    aggregations — fully distributed, deterministic (sorted collects)."""
    analysis = F.struct(
        "analysis_type", "workflow_name", "workflow_version", "timestamp",
        "bundle_uuid", "workflow_outputs",
    )
    samples = (
        df.groupBy(
            "program", "project", "center_name",
            "submitter_donor_id", "donor_uuid",
            "submitter_specimen_id", "specimen_uuid", "submitter_specimen_type",
            "submitter_experimental_design",
            "submitter_sample_id", "sample_uuid",
        )
        .agg(F.sort_array(F.collect_list(analysis)).alias("analysis"))
    )
    sample = F.struct("submitter_sample_id", "sample_uuid", "analysis")
    specimens = (
        samples.groupBy(
            "program", "project", "center_name",
            "submitter_donor_id", "donor_uuid",
            "submitter_specimen_id", "specimen_uuid", "submitter_specimen_type",
            "submitter_experimental_design",
        )
        .agg(F.sort_array(F.collect_list(sample)).alias("samples"))
    )
    specimen = F.struct(
        "submitter_specimen_id", "specimen_uuid", "submitter_specimen_type",
        "submitter_experimental_design", "samples",
    )
    return (
        specimens.groupBy(
            "program", "project", "center_name", "submitter_donor_id", "donor_uuid"
        )
        .agg(F.sort_array(F.collect_list(specimen)).alias("specimens"))
    )


def derive_flags(bundles: DataFrame) -> DataFrame:
    """A10/A11: per-donor completeness flags from (specimen-class ×
    analysis_type) membership, plus present/missing item lists."""
    aggs = []
    for flag, (cls, atype) in _FLAG_CONDS.items():
        cond = F.col("submitter_specimen_type").startswith(cls) & (
            F.col("analysis_type") == atype
        )
        aggs.append(
            (F.max(F.when(cond, 1).otherwise(0)) == 1).alias(flag)
        )
    flags = bundles.groupBy("donor_uuid").agg(*aggs)
    present = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(F.col(f), F.lit(f)).otherwise(F.lit(None))
                    for f in EXPECTED_FLAGS
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    expected = F.array(*[F.lit(f) for f in EXPECTED_FLAGS])
    return flags.withColumn("present_items", present).withColumn(
        "missing_items", F.array_sort(F.array_except(expected, F.col("present_items")))
    )


def build_donor_documents(bundles: DataFrame) -> DataFrame:
    """Full merge: nested donor docs + flags struct (the reference's
    validated.jsonl unit of output)."""
    docs = merge_donors(bundles)
    flags = derive_flags(bundles).withColumnRenamed("donor_uuid", "_fk")
    flag_struct = F.struct(*[F.col(f) for f in EXPECTED_FLAGS]).alias("flags")
    # null-safe join: a null donor_uuid (invalid doc) must survive to the
    # validation split rather than silently dropping out (A12 semantics)
    return docs.join(
        flags, docs["donor_uuid"].eqNullSafe(flags["_fk"])
    ).select(
        "program", "project", "center_name", "submitter_donor_id",
        "donor_uuid", "specimens", flag_struct, "present_items", "missing_items",
    )


def validate_split(donors: DataFrame) -> tuple[DataFrame, DataFrame]:
    """A12: schema/constraint validation routing — valid docs vs quarantined
    invalid docs (Spark badRecordsPath pattern). Constraints mirror the
    reference's metadata_schema.json required fields."""
    valid_cond = (
        F.col("donor_uuid").isNotNull()
        & F.col("program").isNotNull()
        & F.col("project").isNotNull()
        & (F.size("specimens") > 0)
        & F.col("submitter_donor_id").isNotNull()
    )
    return donors.filter(valid_cond), donors.filter(~valid_cond)


def flatten_filebrowser(donors: DataFrame) -> DataFrame:
    """A14: donor doc → one flat row per workflow output file (the fb_index
    document), via four explodes instead of four nested loops."""
    return (
        donors.select(
            "program", "project", "center_name", "donor_uuid",
            F.explode("specimens").alias("sp"),
        )
        .select(
            "program", "project", "center_name", "donor_uuid",
            F.col("sp.specimen_uuid").alias("specimen_uuid"),
            F.col("sp.submitter_specimen_type").alias("specimen_type"),
            F.explode("sp.samples").alias("sa"),
        )
        .select(
            "program", "project", "center_name", "donor_uuid",
            "specimen_uuid", "specimen_type",
            F.col("sa.sample_uuid").alias("sample_uuid"),
            F.explode("sa.analysis").alias("an"),
        )
        .select(
            "program", "project", "center_name", "donor_uuid",
            "specimen_uuid", "specimen_type", "sample_uuid",
            F.col("an.analysis_type").alias("analysis_type"),
            F.col("an.workflow_name").alias("workflow"),
            F.col("an.workflow_version").alias("workflow_version"),
            F.col("an.bundle_uuid").alias("repoDataBundleId"),
            F.explode("an.workflow_outputs").alias("f"),
        )
        .select(
            "program", "project", "center_name", "donor_uuid",
            "specimen_uuid", "specimen_type", "sample_uuid",
            "analysis_type", "workflow", "workflow_version", "repoDataBundleId",
            F.element_at(F.split(F.col("f.file_path"), "/"), -1).alias("title"),
            F.col("f.file_type").alias("file_type"),
            F.col("f.file_size").alias("file_size"),
        )
    )


def to_es_bulk(
    donors: DataFrame, doc_type: str = "meta", id_col: str = "donor_uuid"
) -> DataFrame:
    """A13: ES bulk JSONL — alternating action/doc lines, one string column
    (written with df.write.text for byte-compat with the reference's
    elasticsearch.jsonl)."""
    action = F.concat(
        F.lit('{"index":{"_id":"'),
        F.coalesce(F.col(id_col).cast("string"), F.lit("")),
        F.lit(f'","_type":"{doc_type}"}}}}'),
    )
    doc = F.to_json(F.struct(*donors.columns))
    return donors.select(
        F.explode(F.array(action, doc)).alias("line")
    )
