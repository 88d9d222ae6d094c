r"""High-dimensional (omics) data pipeline (SURVEY.md §2.10, §3.3).

One parameterized module replaces the reference's six ~1100-LoC
stored-procedure twins (mRNA I2B2_PROCESS_MRNA_DATA.sql, RNASeq,
proteomics, metabolomics, miRNA, RBM — all one pattern):

  subject–sample mapping (I2B2_LOAD_SAMPLES.sql)
    → platform annotation (lt_src_deapp_annot)
    → matrix melt (ExpressionDataProcessor.groovy:214-239)
    → probeset tag + collapse avg (J2, I2B2_PROCESS_MRNA_DATA.sql:136-161)
    → data-type switch R|L|T|Z → log2 → per-probe median/stddev
    → zscore = clamp((log2(x) − median) / stddev, ±2.5)  (:318-326)
    → per-study partitioned data table (:189-222 → partitionBy)

Scale design: the expression matrix is the only big input. The melt is
a generate-only narrow stage; the sample mapping and annotation are
broadcast; the single wide shuffle is the per-(probe, assay) collapse
— keyed exactly like the downstream per-probe stats, so Catalyst
reuses the partitioning. Output is written partitioned by trial_name
(the Spark replacement for per-study partition tables + index
rebuild).
"""

from __future__ import annotations

import glob
import os
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from tmdataloader_spark.functions.paths import get_last_path_component, path_hlevel
from tmdataloader_spark.operators.dedup import LoadValidationError
from tmdataloader_spark.operators.reshape import melt_expression_matrix
from tmdataloader_spark.operators.tree import fill_in_tree
from tmdataloader_spark.operators.zscore import zscore
from tmdataloader_spark.sources.gpl import GplPlatform, read_gpl
from tmdataloader_spark.sources.tsv import read_tsv

DEFAULT_TISSUE_TYPE = "Blood"  # ExpressionDataProcessor.groovy:33

MAPPING_COLS = [
    "STUDY_ID", "SITE_ID", "SUBJECT_ID", "SAMPLE_ID", "PLATFORM",
    "TISSUETYPE", "ATTR1", "ATTR2", "CATEGORY_CD",
]


@dataclass
class HDDLoadResult:
    sample_mapping: DataFrame  # de_subject_sample_mapping
    data: DataFrame  # de_subject_<omics>_data
    i2b2: DataFrame  # ontology nodes incl. filled-in folders
    patient_dimension: DataFrame
    platform: GplPlatform


def read_subject_sample_mapping(
    spark: SparkSession, path: str | os.PathLike, trial_id: str | None = None
) -> DataFrame:
    """S-mapping file → landing frame (ExpressionDataProcessor
    .groovy:98-156): mandatory subject/sample/platform/category,
    TISSUETYPE defaulting, study id uppercased."""
    df = read_tsv(spark, path, header=True, comment="#")
    cols = {c.upper().replace(" ", "_"): c for c in df.columns}

    def get(name: str) -> F.Column:
        c = cols.get(name)
        return F.col(f"`{c}`").cast("string") if c else F.lit(None).cast("string")

    out = df.select(
        F.upper(get("STUDY_ID")).alias("trial_name"),
        get("SITE_ID").alias("site_id"),
        get("SUBJECT_ID").alias("subject_id"),
        get("SAMPLE_ID").alias("sample_cd"),
        get("PLATFORM").alias("platform"),
        F.when(
            F.coalesce(get("TISSUETYPE"), F.lit("")) == "", F.lit(DEFAULT_TISSUE_TYPE)
        ).otherwise(get("TISSUETYPE")).alias("tissue_type"),
        get("ATTR1").alias("attribute_1"),
        get("ATTR2").alias("attribute_2"),
        get("CATEGORY_CD").alias("category_cd"),
        F.lit("STD").alias("source_cd"),
    )
    bad = out.filter(
        (F.coalesce(F.col("subject_id"), F.lit("")) == "")
        | (F.coalesce(F.col("sample_cd"), F.lit("")) == "")
        | (F.coalesce(F.col("platform"), F.lit("")) == "")
        | (F.coalesce(F.col("category_cd"), F.lit("")) == "")
    )
    if bad.limit(1).count() > 0:
        raise LoadValidationError("Incorrect mapping file: mandatory columns not defined")
    studies = [r[0] for r in out.select("trial_name").distinct().limit(2).collect()]
    if len(studies) != 1:
        raise LoadValidationError(f"Multiple studies in one mapping file: {studies}")
    if trial_id is not None and studies[0] != trial_id.upper():
        raise LoadValidationError(
            f"Study ID {studies[0]} doesn't match expected {trial_id}"
        )
    return out


def build_hdd_nodes(mapping: DataFrame, top_node: str, platform_title: str) -> DataFrame:
    r"""Leaf-node templating (I2B2_LOAD_SAMPLES.sql:318-366):
    PLATFORM→gpl title, TISSUETYPE/ATTR1/ATTR2 substituted, ``+``→``\``,
    ``_``→space, backslash-runs collapsed; folders filled in."""
    subst = F.col("category_cd")
    subst = F.replace(subst, F.lit("PLATFORM"), F.lit(platform_title))
    subst = F.replace(subst, F.lit("ATTR1"), F.coalesce(F.col("attribute_1"), F.lit("")))
    subst = F.replace(subst, F.lit("ATTR2"), F.coalesce(F.col("attribute_2"), F.lit("")))
    subst = F.replace(
        subst, F.lit("TISSUETYPE"),
        F.coalesce(F.col("tissue_type"), F.lit("Unspecified Tissue Type")),
    )
    subst = F.regexp_replace(subst, r"\+", "\\\\")
    subst = F.regexp_replace(subst, "_", " ")
    leaf = F.regexp_replace(
        F.concat(F.lit(top_node), subst, F.lit("\\")), r"(\\){2,}", "\\\\"
    )
    leaves = mapping.select(leaf.alias("path")).distinct()
    nodes = fill_in_tree(leaves)
    leaf_set = leaves.withColumn("is_leaf", F.lit(True))
    return (
        nodes.join(leaf_set, on="path", how="left")
        .select(
            F.col("path").alias("c_fullname"),
            F.col("hlevel").alias("c_hlevel"),
            F.col("name").alias("c_name"),
            F.sha2(F.col("path"), 256).substr(1, 16).alias("c_basecode"),
            F.when(F.coalesce(F.col("is_leaf"), F.lit(False)), F.lit("LAH"))
            .otherwise(F.lit("FA"))
            .alias("c_visualattributes"),
        )
    )


def build_sample_mapping(
    mapping: DataFrame, top_node: str, platform: GplPlatform
) -> DataFrame:
    """de_subject_sample_mapping (I2B2_LOAD_SAMPLES.sql:659-830) with
    deterministic surrogate ids: patient_num/assay_id hash the natural
    keys (trial:site:subject, trial:sample) instead of DB sequences."""
    usub = F.regexp_replace(
        F.concat_ws(
            ":", F.col("trial_name"), F.coalesce(F.col("site_id"), F.lit("")), F.col("subject_id")
        ),
        "(::)+", ":",
    )
    subst = F.col("category_cd")
    subst = F.replace(subst, F.lit("PLATFORM"), F.lit(platform.title))
    subst = F.replace(subst, F.lit("ATTR1"), F.coalesce(F.col("attribute_1"), F.lit("")))
    subst = F.replace(subst, F.lit("ATTR2"), F.coalesce(F.col("attribute_2"), F.lit("")))
    subst = F.replace(
        subst, F.lit("TISSUETYPE"),
        F.coalesce(F.col("tissue_type"), F.lit("Unspecified Tissue Type")),
    )
    subst = F.regexp_replace(subst, r"\+", "\\\\")
    subst = F.regexp_replace(subst, "_", " ")
    leaf = F.regexp_replace(
        F.concat(F.lit(top_node), subst, F.lit("\\")), r"(\\){2,}", "\\\\"
    )
    return mapping.select(
        "trial_name",
        usub.alias("sourcesystem_cd"),
        F.xxhash64(usub).alias("patient_id"),
        F.xxhash64(F.concat_ws(":", F.col("trial_name"), F.col("sample_cd"))).alias("assay_id"),
        "sample_cd",
        F.lit(platform.marker_type).alias("platform"),
        F.col("platform").alias("gpl_id"),
        "tissue_type",
        "attribute_1",
        "attribute_2",
        "category_cd",
        leaf.alias("concept_path"),
        F.sha2(leaf, 256).substr(1, 16).alias("concept_code"),
        "source_cd",
    )


_DATA_TYPE_RE = re.compile(r"_Gene_Expression_Data_([RLTZ])", re.I)


def load_expression(
    spark: SparkSession,
    data_dir: str | os.PathLike,
    trial_id: str,
    top_node: str,
    log_base: float = 2.0,
) -> HDDLoadResult:
    """Full expression load of a study directory
    (``ExpressionDataToUpload``): §3.3 end-to-end."""
    data_dir = str(data_dir)
    mapping_files = glob.glob(os.path.join(data_dir, "*Subject_Sample_Mapping_File.txt"))
    if not mapping_files:
        raise LoadValidationError(f"no subject-sample mapping file in {data_dir}")
    mapping = read_subject_sample_mapping(spark, mapping_files[0], trial_id)

    platforms = [r[0] for r in mapping.select("platform").distinct().collect()]
    platform = read_gpl(
        spark, os.path.join(data_dir, f"{platforms[0]}.txt"), platforms[0],
        marker_type="Gene Expression",
    )

    matrix_files = [
        p
        for p in glob.glob(os.path.join(data_dir, "*Gene_Expression_Data*.txt"))
        if _DATA_TYPE_RE.search(os.path.basename(p))
    ]
    if not matrix_files:
        raise LoadValidationError(f"no expression matrix in {data_dir}")
    data_type = _DATA_TYPE_RE.search(os.path.basename(matrix_files[0])).group(1).upper()
    if data_type == "T":  # Groovy forces T→Z (ExpressionDataProcessor.groovy:72-75)
        data_type = "Z"

    wide = read_tsv(spark, matrix_files[0], header=True, comment="#")
    id_col = wide.columns[0]  # header must start ID_REF
    melted = melt_expression_matrix(wide, probe_col=id_col, trial=trial_id.upper())

    samples = build_sample_mapping(mapping, top_node, platform)
    nodes = build_hdd_nodes(mapping, top_node, platform.title)
    patients = samples.select(
        F.col("patient_id").alias("patient_num"), "sourcesystem_cd"
    ).distinct()

    # J2: tag with assay ids (broadcast: samples ≪ matrix cells) and
    # keep only probes known to the platform
    probes = platform.annotation.select("probeset_id").distinct()
    tagged = (
        melted.join(
            F.broadcast(samples.select(F.col("sample_cd").alias("expr_id"), "assay_id")),
            on="expr_id", how="inner",
        )
        .join(F.broadcast(probes), on="probeset_id", how="left_semi")
    )
    # A4: duplicate probes per assay collapse to mean, then the kernel
    collapsed = tagged.groupBy("probeset_id", "assay_id").agg(
        F.avg(F.col("intensity").try_cast("double")).alias("intensity")
    )
    scored = zscore(
        collapsed, data_type=data_type, probe_col="probeset_id",
        value_col="intensity", log_base=log_base,
    )
    data = scored.select(
        F.lit(trial_id.upper()).alias("trial_name"),
        "probeset_id",
        "assay_id",
        F.col("raw_intensity"),
        F.col("log_intensity"),
        F.col("zscore"),
    )
    return HDDLoadResult(
        sample_mapping=samples,
        data=data,
        i2b2=nodes,
        patient_dimension=patients,
        platform=platform,
    )


def write_partitioned(data: DataFrame, path: str, trial_id: str | None = None) -> None:
    """Per-study partition replacement (I2B2_PROCESS_MRNA_DATA.sql:
    189-222): dynamic partition overwrite of only this study's
    partition — reload = overwrite, no index dance."""
    (
        data.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("trial_name")
        .parquet(path)
    )
