"""Study metadata loader (SURVEY.md §1.1 'Study metadata / tags').

Reference: etl/MetaDataProcessor.groovy:140-230 — fuzzy header-regexp
mapping of the metadata TSV into ``lt_src_study_metadata``, study_id +
title mandatory, species defaulting to 'Homo Sapiens';
sql/postgres/procedures/I2B2_LOAD_STUDY_METADATA.sql:83-370 —
bio_experiment upsert keyed on accession (= study id), bio_data_uid
rows ``EXP:<accession>``, compound/disease/pubmed links.

Spark shape: metadata files are tiny — one driver-side parse into
typed frames; the bio_experiment upsert is the same key anti-join +
union used everywhere else."""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from tmdataloader_spark.operators.dedup import LoadValidationError
from tmdataloader_spark.sources.tsv import read_tsv

#: MetaDataProcessor.groovy:154-190 — (?i) header regexp -> field
HEADER_PATTERNS = [
    (r"Accession \(Internal study_id\)", "study_id"),
    (r"Title", "title"),
    (r"Description", "description"),
    (r"Study design", "study_design"),
    (r"Completion date", "completion_date"),
    (r"PI", "pi"),
    (r"Institution", "institution"),
    (r"Biomarker Type", "biomarker_type"),
    (r"Access Type", "access_type"),
    (r"Study Owner", "study_owner"),
    (r"Study Phase", "study_phase"),
    (r"Blinding Procedure", "blinding_procedure"),
    (r"Study Type", "study_type"),
    (r"Duration of Study", "duration_of_study"),
    (r"Number of Patients", "number_of_patients"),
    (r"Number of Sites", "number_of_sites"),
    (r"Route of Administration", "route_of_administration"),
    (r"Dosing Regimen", "dosing_regimen"),
    (r"Group Assignment", "group_assignment"),
    (r"Type of Control", "type_of_control"),
    (r"Primary Endpoints", "primary_endpoints"),
    (r"Secondary Endpoints", "secondary_endpoints"),
    (r"Inclusion Criteria", "inclusion_criteria"),
    (r"Exclusion Criteria", "exclusion_criteria"),
    (r"Subjects", "subjects"),
    (r"Gender Restriction", "gender_restriction"),
    (r"Min.* Age", "min_age"),
    (r"Max.* Age", "max_age"),
    (r"Secondary IDs", "secondary_ids"),
    (r"Development Partner", "development_partner"),
    (r"GEO Platform", "geo_platform"),
    (r"Main Findings", "main_findings"),
    (r"Area", "area"),
    (r"Drug name", "drug_name"),
    (r"Condition", "condition"),
    (r"(Species|Organism)", "species"),
]


@dataclass
class MetadataLoadResult:
    landing: DataFrame  # lt_src_study_metadata
    bio_experiment: DataFrame
    bio_data_uid: DataFrame
    tags: DataFrame  # (study_id, tag, tag_type) per non-core column


def map_headers(columns: list[str]) -> dict[str, str]:
    """First column matching each (?i) pattern wins
    (MetaDataProcessor.groovy:149-190)."""
    mapping: dict[str, str] = {}
    for col in columns:
        for pat, field in HEADER_PATTERNS:
            if field not in mapping and re.fullmatch(f"(?i){pat}", col.strip()):
                mapping[field] = col
                break
    if "study_id" not in mapping:
        raise LoadValidationError("Study ID column is not defined")
    return mapping


def read_study_metadata(spark: SparkSession, path: str) -> DataFrame:
    """One metadata TSV → lt_src_study_metadata-shaped frame."""
    raw = read_tsv(spark, path, header=True, comment="#")
    mapping = map_headers(raw.columns)
    # values are trimmed like the reference's fixColumn cleanup
    cols = [
        F.trim(F.col(f"`{src}`").cast("string")).alias(field)
        for field, src in mapping.items()
    ]
    out = raw.select(*cols)
    if "species" in out.columns:
        out = out.withColumn(
            "species", F.coalesce(F.col("species"), F.lit("Homo Sapiens"))
        )
    else:
        out = out.withColumn("species", F.lit("Homo Sapiens"))
    if "title" not in out.columns:
        raise LoadValidationError("Study ID or Title are not defined")
    bad = out.filter(
        (F.coalesce(F.col("study_id"), F.lit("")) == "")
        | (F.coalesce(F.col("title"), F.lit("")) == "")
    )
    if bad.limit(1).count() > 0:
        raise LoadValidationError("Study ID or Title are not defined")
    return out


def build_bio_experiment(
    landing: DataFrame, existing: DataFrame | None = None
) -> DataFrame:
    """bio_experiment upsert keyed on accession
    (I2B2_LOAD_STUDY_METADATA.sql:103-220): incoming rows win."""
    def opt(name: str):
        if name in landing.columns:
            return F.col(name)
        return F.lit(None).cast("string")

    incoming = landing.select(
        F.lit("Experiment").alias("bio_experiment_type"),
        F.col("title"),
        opt("description").alias("description"),
        opt("study_design").alias("design"),
        F.upper(F.col("study_id")).alias("accession"),
        opt("institution").alias("institution"),
        F.col("species").alias("organism"),
    ).dropDuplicates(["accession"])
    if existing is None:
        return incoming
    keep = existing.join(
        incoming.select("accession"), on="accession", how="left_anti"
    )
    return keep.unionByName(incoming.select(existing.columns))


def build_bio_data_uid(bio_experiment: DataFrame) -> DataFrame:
    """``EXP:<accession>`` unique ids
    (I2B2_LOAD_STUDY_METADATA.sql:222-244)."""
    return bio_experiment.select(
        F.concat(F.lit("EXP:"), F.col("accession")).alias("unique_id"),
        F.lit("EXP").alias("bio_data_type"),
        F.col("accession"),
    ).distinct()


def build_tags(landing: DataFrame) -> DataFrame:
    """Every populated non-core metadata field becomes a study tag
    (the am_tag_association analog)."""
    core = {"study_id", "title", "description"}
    fields = [c for c in landing.columns if c not in core]
    pairs = F.array(
        *[
            F.struct(F.lit(c).alias("tag_type"), F.col(c).cast("string").alias("tag"))
            for c in fields
        ]
    )
    return (
        landing.select(F.upper(F.col("study_id")).alias("study_id"), F.explode(pairs).alias("t"))
        .select("study_id", F.col("t.tag_type"), F.col("t.tag"))
        .filter(F.coalesce(F.col("tag"), F.lit("")) != "")
    )


def load_study_metadata(
    spark: SparkSession,
    data_dir: str,
    study_id: str | None = None,
    existing_bio_experiment: DataFrame | None = None,
) -> MetadataLoadResult:
    """All ``*.txt`` metadata files of a ``MetaDataToUpload`` dir
    (MetaDataProcessor.processFiles)."""
    files = [
        os.path.join(data_dir, f)
        for f in sorted(os.listdir(data_dir))
        if f.endswith(".txt") and not f.startswith((".", "_"))
    ]
    if not files:
        raise LoadValidationError(f"no metadata files in {data_dir}")
    landing = None
    for f in files:
        part = read_study_metadata(spark, f)
        landing = part if landing is None else landing.unionByName(
            part, allowMissingColumns=True
        )
    if study_id is not None:
        mismatched = landing.filter(F.upper(F.col("study_id")) != study_id.upper())
        if mismatched.limit(1).count() > 0:
            raise LoadValidationError(
                f"metadata study id does not match {study_id}"
            )
    bio_experiment = build_bio_experiment(landing, existing_bio_experiment)
    return MetadataLoadResult(
        landing=landing,
        bio_experiment=bio_experiment,
        bio_data_uid=build_bio_data_uid(bio_experiment),
        tags=build_tags(landing),
    )
