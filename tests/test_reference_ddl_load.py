"""End-to-end schema-parity proof: the reference's OWN DDL accepts our
frames. Runs the reference's real VCF migration
(sql/postgres/migrations/20140724000005000_VCF_CREATE_TABLES.sql,
verbatim, via the script runner's run_script) against the scratch
PostgreSQL, then loads the reference fixture study through OUR Spark
VCF pipeline (plans/vcf.load_vcf_study) and COPYs every frame into the
corresponding deapp.de_variant_* table. Postgres enforces what a
parquet write never could: NOT NULL columns, sequence-defaulted
primary keys, varchar widths, the dataset foreign key, and the
(dataset, subject, position) unique index — so a pass means our frame
schemas and values are drop-in compatible with the reference's
warehouse."""

import os
import shutil
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tmdataloader_spark.sinks import (
    apply_sequence,
    run_psql,
    sequence_dictionary,
    write_postgres_copy,
)
from tmdataloader_spark.sqlscripts import run_script

pytestmark = pytest.mark.skipif(
    shutil.which("initdb") is None
    or shutil.which("pg_ctl") is None
    or shutil.which("psql") is None,
    reason="postgres binaries not available",
)

VCF_DDL = (
    "/root/reference/sql/postgres/migrations/"
    "20140724000005000_VCF_CREATE_TABLES.sql"
)


@pytest.fixture(scope="module")
def deapp(pg_dsn, tmp_path_factory):
    """schema deapp + the two tablespaces the DDL names, then the
    reference migration file itself, untouched."""
    if not os.path.isfile(VCF_DDL):
        pytest.skip("reference sql tree not present")
    import pathlib
    import tempfile

    ts_base = pathlib.Path(tempfile.mkdtemp(prefix="pgts_"))
    for name in ("deapp", "indx"):
        d = ts_base / name
        d.mkdir()
        if os.geteuid() == 0:
            shutil.chown(d, "nobody", "nogroup")
    os.chmod(ts_base, 0o755)
    # the tranSMART base environment the migration assumes: the deapp
    # role (tables are chowned to it at the end) and the deapp schema
    try:
        run_psql(pg_dsn, "CREATE ROLE deapp")
    except RuntimeError as e:
        if "already exists" not in str(e):
            raise
    # deapp owns its schema in a real tranSMART install — FK validation
    # executes as the table owner and needs schema USAGE
    run_psql(pg_dsn, "CREATE SCHEMA IF NOT EXISTS deapp AUTHORIZATION deapp")
    for name in ("deapp", "indx"):
        # CREATE TABLESPACE cannot run inside DO — issue it bare and
        # tolerate a pre-existing one from an earlier module run
        try:
            run_psql(
                pg_dsn,
                f"CREATE TABLESPACE \"{name}\" LOCATION '{ts_base / name}'",
            )
        except RuntimeError as e:
            if "already exists" not in str(e):
                raise
    run_script(pg_dsn, VCF_DDL)
    yield pg_dsn
    # tables live in the scratch server torn down by pg_dsn; nothing to do


def test_vcf_frames_land_in_reference_ddl(spark, deapp):
    from tests.test_vcf import FIXTURE, TOP
    from tmdataloader_spark.plans.vcf import load_vcf_study

    dsn = deapp
    res = load_vcf_study(spark, FIXTURE, TOP)
    ds = res.datasets[0]  # the fixture's first dataset carries everything we probe

    # the engine's surrogate assay ids are deterministic 64-bit hashes
    # (plans/hdd.build_sample_mapping) but the reference's DDL types
    # assay_id as int filled from deapp.seq_assay_id — allocate dense
    # export ids from ONE shared dictionary (sinks.sequence_dictionary)
    assay_dict = sequence_dictionary(res.sample_mapping, "assay_id")
    summary = apply_sequence(ds.subject_summary, "assay_id", assay_dict)
    # every non-null surrogate got an id; nulls stayed null
    before = ds.subject_summary.where("assay_id IS NOT NULL").count()
    assert summary.where("assay_id IS NOT NULL").count() == before

    for table in (
        "de_variant_population_data", "de_variant_population_info",
        "de_variant_subject_summary", "de_variant_subject_detail",
        "de_variant_subject_idx", "de_variant_dataset",
    ):
        run_psql(dsn, f"DELETE FROM deapp.{table}")

    # FK target first; every other frame COPYs into the UNMODIFIED
    # reference DDL with create=False (serial ids fill server-side)
    loads = [
        ("deapp.de_variant_dataset", ds.variant_dataset),
        ("deapp.de_variant_subject_idx", ds.subject_idx),
        ("deapp.de_variant_subject_detail", ds.subject_detail),
        ("deapp.de_variant_subject_summary", summary),
        ("deapp.de_variant_population_info", ds.population_info),
        ("deapp.de_variant_population_data", ds.population_data),
    ]
    counts = {}
    for table, frame in loads:
        counts[table] = write_postgres_copy(frame, dsn, table, create=False)

    for table, frame in loads:
        (db_n,) = run_psql(
            dsn, f"SELECT count(*) FROM {table}"
        ).split()
        assert int(db_n) == counts[table] == frame.count(), table

    # sequence-defaulted PKs materialized server-side
    (min_id, max_id) = run_psql(
        dsn,
        "SELECT min(variant_subject_summary_id), "
        "max(variant_subject_summary_id) FROM deapp.de_variant_subject_summary",
    ).strip().split("|")
    assert int(min_id) >= 1 and int(max_id) - int(min_id) + 1 == counts[
        "deapp.de_variant_subject_summary"
    ]

    # value probe through the reference schema: genotype split matches
    # what our gate-tested summary computed (VCFDataProcessor.groovy:209-250)
    probe = run_psql(
        dsn,
        "SELECT count(*) FROM deapp.de_variant_subject_summary "
        "WHERE reference AND allele1 = 0 AND (allele2 = 0 OR allele2 IS NULL)",
    ).strip()
    spark_probe = (
        ds.subject_summary.where(
            "reference AND allele1 = 0 AND (allele2 = 0 OR allele2 IS NULL)"
        ).count()
    )
    assert int(probe) == spark_probe

    # the unique index from the DDL actually arbitrates: re-COPYing the
    # subject index violates variant_subject_idx_uk
    with pytest.raises(RuntimeError, match="variant_subject_idx_uk"):
        write_postgres_copy(
            ds.subject_idx, dsn, "deapp.de_variant_subject_idx", create=False
        )


GWAS_DDL = (
    "/root/reference/sql/postgres/migrations/gwas_plink/"
    "20160421174200000_add_gwas_plink_schema.sql"
)


def test_gwas_plink_blobs_land_in_reference_ddl(spark, pg_dsn):
    """Second drop-in proof, this time with binary payloads: the
    reference's gwas_plink schema migration (verbatim; its initial
    bytea form — the later migrations only move storage to large
    objects) accepts our LZO-compressed PLINK blobs, and what Postgres
    hands back decompresses to the original fixture bytes — i.e. the
    pure-Python LZO codec (functions/lzo.py) writes the byte format
    the reference's table was designed to hold
    (GWASPlinkDataProcessor.groovy:130-142)."""
    if not os.path.isfile(GWAS_DDL):
        pytest.skip("reference sql tree not present")
    from tmdataloader_spark.functions.lzo import decompress as lzo_decompress
    from tmdataloader_spark.plans.gwas import load_gwas_plink

    # base environment the migration assumes (owner role)
    try:
        run_psql(pg_dsn, "CREATE ROLE tm_dataloader")
    except RuntimeError as e:
        if "already exists" not in str(e):
            raise
    run_script(pg_dsn, GWAS_DDL)
    run_psql(pg_dsn, "DELETE FROM gwas_plink.plink_data")

    fix = ("/root/reference/fixtures/Test Studies/"
           "Test Study With GWAS Plink_GSE0GWASPLINK/GWASPlinkDataToUpload")
    res = load_gwas_plink(spark, fix, "\\Test Studies\\Test GWAS Study\\")
    frame = res.plink_data.select("study_id", "bed", "bim", "fam")
    assert write_postgres_copy(
        frame, pg_dsn, "gwas_plink.plink_data", create=False
    ) == 1

    # STUDY_ID NOT NULL UNIQUE arbitrates a duplicate load
    with pytest.raises(RuntimeError, match="study_id"):
        write_postgres_copy(
            frame, pg_dsn, "gwas_plink.plink_data", create=False
        )

    # read the blobs back out of the reference table and decompress
    # with our codec: byte-identical to the on-disk fixture files
    out = run_psql(
        pg_dsn,
        "SELECT encode(bed,'hex') || '|' || encode(bim,'hex') || '|' || "
        "encode(fam,'hex') FROM gwas_plink.plink_data "
        "WHERE study_id = 'GSE0GWASPLINK'",
    ).strip()
    bed_hex, bim_hex, fam_hex = out.split("|")
    import glob as _glob

    for hexed, ext in ((bed_hex, ".bed"), (bim_hex, ".bim"), (fam_hex, ".fam")):
        (path,) = _glob.glob(os.path.join(fix, f"*{ext}"))
        with open(path, "rb") as fh:
            assert lzo_decompress(bytes.fromhex(hexed)) == fh.read(), ext


CLINICAL_PATH_MIGRATION = (
    "/root/reference/sql/postgres/migrations/"
    "2015011300000000_UPDATED_PATH_LENGTH.sql"
)

#: The clinical warehouse core. The reference repo ships no CREATE
#: TABLE for these (they come from the external tranSMART-data base
#: schema), so this bootstrap states the PUBLIC i2b2 1.7 CRC/ONT data
#: model restricted to the columns the reference's own inserts name
#: (observation_fact: I2B2_LOAD_CLINICAL_DATA.sql:1386-1404 incl. the
#: tranSMART sample_cd extension; concept_dimension :950-957; i2b2
#: :1010-1030; patient_dimension :898-915; concept_counts
#: I2B2_CREATE_CONCEPT_COUNTS.sql:80-84), with the public model's
#: PK/NOT NULL/width constraints. The reference's OWN path-length
#: migration (2015011300000000_UPDATED_PATH_LENGTH.sql) then runs
#: VERBATIM on top — it only applies if this bootstrap matches the
#: table/column/view surface a real tranSMART install presents.
CLINICAL_CORE_BOOTSTRAP = """
CREATE SCHEMA IF NOT EXISTS i2b2demodata;
CREATE SCHEMA IF NOT EXISTS i2b2metadata;
CREATE SEQUENCE IF NOT EXISTS i2b2demodata.seq_patient_num;
CREATE SEQUENCE IF NOT EXISTS i2b2demodata.concept_id;
CREATE TABLE i2b2demodata.observation_fact (
  encounter_num numeric(38,0) NOT NULL,
  patient_num numeric(38,0) NOT NULL,
  concept_cd varchar(50) NOT NULL,
  provider_id varchar(50) NOT NULL DEFAULT '@',
  start_date timestamp NOT NULL,
  modifier_cd varchar(100) NOT NULL DEFAULT '@',
  instance_num numeric(18,0) NOT NULL DEFAULT 1,
  valtype_cd varchar(50),
  tval_char varchar(255),
  nval_num numeric(18,5),
  valueflag_cd varchar(50),
  location_cd varchar(50),
  import_date timestamp,
  sourcesystem_cd varchar(50),
  sample_cd varchar(200),
  CONSTRAINT observation_fact_pk PRIMARY KEY
    (patient_num, concept_cd, modifier_cd, start_date, encounter_num,
     instance_num, provider_id)
);
CREATE TABLE i2b2demodata.patient_dimension (
  patient_num numeric(38,0) NOT NULL PRIMARY KEY,
  sex_cd varchar(50),
  age_in_years_num numeric(38,0),
  race_cd varchar(50),
  update_date timestamp,
  download_date timestamp,
  import_date timestamp,
  sourcesystem_cd varchar(50)
);
CREATE TABLE i2b2demodata.concept_dimension (
  concept_path varchar(700) NOT NULL PRIMARY KEY,
  concept_cd varchar(50) NOT NULL,
  name_char varchar(2000),
  update_date timestamp,
  download_date timestamp,
  import_date timestamp,
  sourcesystem_cd varchar(50)
);
-- the path migration ALTERs a table literally named
-- concept_dimenstion (sic) — present in real tranSMART installs, so
-- the verbatim run needs it here too
CREATE TABLE i2b2demodata.concept_dimenstion (
  concept_path varchar(700) NOT NULL
);
CREATE TABLE i2b2demodata.concept_counts (
  concept_path varchar(700),
  parent_concept_path varchar(700),
  patient_count int
);
CREATE TABLE i2b2metadata.i2b2 (
  c_hlevel int NOT NULL,
  c_fullname varchar(700) NOT NULL,
  c_name varchar(2000) NOT NULL,
  c_synonym_cd char(1) NOT NULL,
  c_visualattributes char(3) NOT NULL,
  c_basecode varchar(50),
  c_metadataxml text,
  c_facttablecolumn varchar(50) NOT NULL,
  c_tablename varchar(150) NOT NULL,
  c_columnname varchar(50) NOT NULL,
  c_columndatatype varchar(50) NOT NULL,
  c_operator varchar(10) NOT NULL,
  c_dimcode varchar(700) NOT NULL,
  c_comment text,
  c_tooltip varchar(900),
  m_applied_path varchar(700) NOT NULL DEFAULT '@',
  update_date timestamp NOT NULL,
  download_date timestamp,
  import_date timestamp,
  sourcesystem_cd varchar(50),
  valuetype_cd varchar(50),
  c_path varchar(700),
  c_symbol varchar(50)
);
CREATE TABLE i2b2metadata.i2b2_secure (
  c_hlevel int,
  c_fullname varchar(700),
  c_name varchar(2000),
  m_applied_path varchar(700),
  c_path varchar(700),
  secure_obj_token varchar(50)
);
-- the migration DROPs this view bare (no IF EXISTS), then recreates
-- it — the base install ships it, so the bootstrap must too
CREATE VIEW i2b2metadata.i2b2_trial_nodes AS
 SELECT DISTINCT ON (i2b2.c_comment) i2b2.c_fullname,
    "substring"(i2b2.c_comment, 7) AS trial
   FROM i2b2metadata.i2b2
  WHERE i2b2.c_comment IS NOT NULL
  ORDER BY i2b2.c_comment, char_length(i2b2.c_fullname::text);
"""


@pytest.fixture(scope="module")
def clinical_core(pg_dsn):
    """Bootstrap the public-i2b2 clinical core, then run the
    reference's path-length migration VERBATIM on top."""
    if not os.path.isfile(CLINICAL_PATH_MIGRATION):
        pytest.skip("reference sql tree not present")
    for role in ("i2b2metadata", "tm_cz", "biomart_user"):
        try:
            run_psql(pg_dsn, f"CREATE ROLE {role}")
        except RuntimeError as e:
            if "already exists" not in str(e):
                raise
    for tbl in (
        "i2b2demodata.observation_fact", "i2b2demodata.patient_dimension",
        "i2b2demodata.concept_dimension", "i2b2demodata.concept_dimenstion",
        "i2b2demodata.concept_counts", "i2b2metadata.i2b2",
        "i2b2metadata.i2b2_secure",
    ):
        run_psql(pg_dsn, f"DROP TABLE IF EXISTS {tbl} CASCADE")
    run_psql(pg_dsn, CLINICAL_CORE_BOOTSTRAP)
    # the reference's own migration, untouched — it only succeeds if
    # the bootstrap presents the exact surface it expects
    run_script(pg_dsn, CLINICAL_PATH_MIGRATION)
    return pg_dsn


GOLDEN_PATH = (
    "\\Test Studies\\Test Study\\Biomarker Data\\Mutations"
    "\\TST001 (Entrez ID: 1956)\\AA mutation\\"
)


def test_clinical_frames_land_in_reference_core(spark, clinical_core):
    """End-to-end drop-in proof for the warehouse's center of gravity:
    GSE0 through OUR clinical plan, frames mapped onto the reference's
    insert contracts (I2B2_LOAD_CLINICAL_DATA.sql:898-1404), COPY'd
    into the migrated clinical core — with Postgres enforcing the
    composite observation_fact PK, NOT NULLs, and varchar widths — and
    the reference's golden integration number (AA-mutation node = 9
    patients) recomputed INSIDE Postgres from the landed rows."""
    from pyspark.sql import functions as F

    from tmdataloader_spark.plans.clinical import load_clinical
    from tmdataloader_spark.sources.mapping import melt_clinical_study

    dsn = clinical_core
    res = load_clinical(
        spark,
        melt_clinical_study(
            spark,
            "/root/reference/fixtures/Test Studies/Test Study_GSE0/"
            "ClinicalDataToUpload/Test Study_GSE0_Mapping_File.txt",
        ),
        "GSE0",
        "\\Test Studies\\Test Study\\",
    )
    # our patient_num is a 64-bit deterministic hash; the reference
    # fills numeric ids from i2b2demodata.seq_patient_num — allocate
    # ONE dense dictionary and apply it to every frame that carries
    # the surrogate, preserving FK consistency
    pat_dict = sequence_dictionary(res.patient_dimension, "patient_num")
    ts = F.lit("2024-01-01 00:00:00").cast("timestamp")

    patients = apply_sequence(res.patient_dimension, "patient_num", pat_dict).select(
        "patient_num", "sex_cd", "age_in_years_num", "race_cd",
        ts.alias("update_date"), ts.alias("download_date"),
        ts.alias("import_date"), "sourcesystem_cd",
    )
    # observation_fact contract (:1386-1404): encounter_num :=
    # patient_num, '@' provider/valueflag/location, instance_num 0
    facts = apply_sequence(res.observation_fact, "patient_num", pat_dict).select(
        F.col("patient_num").alias("encounter_num"),
        "patient_num", "concept_cd", ts.alias("start_date"), "modifier_cd",
        "valtype_cd", "tval_char", "nval_num", "sourcesystem_cd",
        ts.alias("import_date"),
        F.lit("@").alias("valueflag_cd"), F.lit("@").alias("provider_id"),
        F.lit("@").alias("location_cd"),
        F.lit(0).alias("instance_num"), "sample_cd",
    )
    concept_dim = res.concept_dimension.select(
        "concept_cd", "concept_path", "name_char",
        ts.alias("update_date"), ts.alias("download_date"),
        ts.alias("import_date"), "sourcesystem_cd",
    )
    # i2b2 contract (:1010-1030): constants + path-derived dim/tooltip
    i2b2 = res.i2b2.select(
        "c_hlevel", "c_fullname", "c_name", "c_visualattributes",
        F.lit("N").alias("c_synonym_cd"),
        F.lit("CONCEPT_CD").alias("c_facttablecolumn"),
        F.lit("CONCEPT_DIMENSION").alias("c_tablename"),
        F.lit("CONCEPT_PATH").alias("c_columnname"),
        F.col("c_fullname").alias("c_dimcode"),
        F.col("c_fullname").alias("c_tooltip"),
        ts.alias("update_date"), ts.alias("download_date"),
        ts.alias("import_date"), "sourcesystem_cd", "c_basecode",
        F.lit("LIKE").alias("c_operator"),
        F.lit("T").alias("c_columndatatype"),
        F.lit("trial:GSE0").alias("c_comment"),
        F.lit("@").alias("m_applied_path"),
    )
    counts = res.concept_counts.select(
        "concept_path",
        F.regexp_replace(
            "concept_path", r"[^\\\\]+\\\\$", ""
        ).alias("parent_concept_path"),
        F.col("patient_count").cast("int").alias("patient_count"),
    )

    loads = [
        ("i2b2demodata.patient_dimension", patients),
        ("i2b2demodata.concept_dimension", concept_dim),
        ("i2b2metadata.i2b2", i2b2),
        ("i2b2demodata.observation_fact", facts),
        ("i2b2demodata.concept_counts", counts),
    ]
    written = {}
    for table, frame in loads:
        written[table] = write_postgres_copy(frame, dsn, table, create=False)
    for table, frame in loads:
        (db_n,) = run_psql(dsn, f"SELECT count(*) FROM {table}").split()
        assert int(db_n) == written[table] == frame.count(), table

    # the reference's golden integration number, recomputed INSIDE
    # Postgres from the landed facts: 9 distinct patients across the
    # leaves UNDER the AA-mutation node (facts attach at child leaves;
    # the node count is the ancestor rollup I2B2_CREATE_CONCEPT_COUNTS
    # computes through the tree)
    golden = run_psql(
        dsn,
        "SELECT count(DISTINCT f.patient_num) FROM "
        "i2b2demodata.observation_fact f "
        "JOIN i2b2demodata.concept_dimension c ON f.concept_cd = c.concept_cd "
        f"WHERE starts_with(c.concept_path, '{GOLDEN_PATH}')",
    ).strip()
    assert golden == "9"
    # ...and it matches the concept_counts row our plan computed
    cc = run_psql(
        dsn,
        "SELECT patient_count FROM i2b2demodata.concept_counts "
        f"WHERE concept_path = '{GOLDEN_PATH}'",
    ).strip()
    assert cc == "9"
    # the migrated width actually took: a >700-char path fits now
    run_psql(
        dsn,
        "INSERT INTO i2b2metadata.i2b2 (c_hlevel, c_fullname, c_name, "
        "c_synonym_cd, c_visualattributes, c_facttablecolumn, c_tablename, "
        "c_columnname, c_columndatatype, c_operator, c_dimcode, update_date) "
        "VALUES (1, repeat('x', 1500), 'wide', 'N', 'FA', 'CONCEPT_CD', "
        "'CONCEPT_DIMENSION', 'CONCEPT_PATH', 'T', 'LIKE', 'd', now())",
    )
    # the composite observation_fact PK arbitrates: re-COPY violates it
    with pytest.raises(RuntimeError, match="observation_fact_pk"):
        write_postgres_copy(
            facts, dsn, "i2b2demodata.observation_fact", create=False
        )


#: The deapp omics core. Like the clinical core above, the reference
#: repo ships no CREATE TABLE for these (they come from the external
#: tranSMART base schema) — this bootstrap states the PUBLIC
#: tranSMART/i2b2 deapp data model restricted to the columns the
#: reference's own inserts name (de_subject_sample_mapping:
#: I2B2_LOAD_SAMPLES.sql:699-723 incl. the seq_assay_id default;
#: de_subject_microarray_data: the partition inserts at
#: I2B2_PROCESS_MRNA_DATA.sql:227-231 and :318-331), with the public
#: model's PK/NOT NULL/width constraints. The reference's OWN dynamic
#: partition DDL (:189-191 create-inherits, :335-341 indexes) then
#: runs with its sqlText strings VERBATIM on top — it only applies if
#: this bootstrap matches the surface a real tranSMART install
#: presents (schema deapp, tablespace indx, the inheritance base).
DEAPP_OMICS_BOOTSTRAP = """
CREATE SEQUENCE IF NOT EXISTS deapp.seq_assay_id;
CREATE SEQUENCE IF NOT EXISTS deapp.seq_mrna_partition_id;
CREATE TABLE deapp.de_subject_sample_mapping (
  patient_id numeric(38,0),
  site_id varchar(100),
  subject_id varchar(100),
  subject_type varchar(100),
  concept_code varchar(1000),
  assay_id numeric(18,0) NOT NULL DEFAULT nextval('deapp.seq_assay_id'),
  sample_type varchar(100),
  sample_type_cd varchar(50),
  trial_name varchar(30),
  timepoint varchar(100),
  timepoint_cd varchar(50),
  tissue_type varchar(100),
  tissue_type_cd varchar(50),
  platform varchar(50),
  platform_cd varchar(50),
  data_uid varchar(100),
  gpl_id varchar(50),
  sample_cd varchar(200),
  category_cd varchar(1000),
  source_cd varchar(50),
  omic_source_study varchar(200),
  omic_patient_id numeric(38,0),
  partition_id numeric,
  CONSTRAINT de_subject_smpl_mpng_pk PRIMARY KEY (assay_id)
);
CREATE TABLE deapp.de_subject_microarray_data (
  trial_name varchar(50),
  probeset_id numeric(38,0) NOT NULL,
  assay_id numeric(18,0) NOT NULL,
  raw_intensity double precision,
  log_intensity double precision,
  zscore double precision,
  partition_id numeric
);
"""


@pytest.fixture(scope="module")
def deapp_omics(deapp):
    """Bootstrap the public deapp omics core on top of the VCF
    fixture's deapp schema/tablespaces, then run the reference's
    partition-create and index sqlText strings VERBATIM
    (I2B2_PROCESS_MRNA_DATA.sql:189-191,335-341). Yields
    (dsn, partition_id)."""
    dsn = deapp
    for tbl in (
        "deapp.de_subject_sample_mapping",
        "deapp.de_subject_microarray_data",
    ):
        run_psql(dsn, f"DROP TABLE IF EXISTS {tbl} CASCADE")
    run_psql(dsn, DEAPP_OMICS_BOOTSTRAP)
    # the procedure's partition bootstrap, statement for statement:
    # partitionId := nextval, partitionName/'partitionIndx' derived,
    # create-inherits with the CHECK, then the three btree indexes
    part_id = int(run_psql(
        dsn, "SELECT nextval('deapp.seq_mrna_partition_id')"
    ).strip())
    partition_name = f"deapp.de_subject_microarray_data_{part_id}"
    partition_indx = f"de_subject_microarray_data_{part_id}"
    run_psql(
        dsn,
        f"create table {partition_name} ( constraint mrna_{part_id}_check "
        f"check ( partition_id = {part_id})) "
        "inherits (deapp.de_subject_microarray_data)",
    )
    for idx, cols in (("idx2", "assay_id"), ("idx3", "probeset_id"),
                      ("idx4", "assay_id, probeset_id")):
        run_psql(
            dsn,
            f" create index {partition_indx}_{idx} on {partition_name} "
            f"using btree ({cols}) tablespace indx",
        )
    return dsn, part_id


def test_mrna_frames_land_in_deapp_ddl(spark, deapp_omics):
    """End-to-end drop-in proof for the deapp omics side: GSE0
    expression through OUR hdd plan, sample mapping + z-scored matrix
    mapped onto the reference's insert contracts with
    sequence_dictionary-allocated assay/patient/probeset ids, COPY'd
    into the bootstrapped DDL — Postgres enforcing the assay_id PK,
    NOT NULLs, varchar widths, and the partition CHECK — and the
    reference-parity numbers (Blood subtree = 32 distinct patients,
    TST1000000719 × 1007_s_at raw intensity 6.624529839) recomputed
    INSIDE Postgres from the landed rows."""
    from pyspark.sql import functions as F

    from tmdataloader_spark.plans.hdd import load_expression

    dsn, part_id = deapp_omics
    res = load_expression(
        spark,
        "/root/reference/fixtures/Test Studies/Test Study_GSE0/"
        "ExpressionDataToUpload",
        "GSE0",
        "\\Test Studies\\Test Study\\",
    )
    # one dense dictionary per surrogate domain, applied to EVERY
    # frame that carries it (the reference fills these from
    # seq_assay_id / seq_patient_num / the annotation's probeset ids)
    assay_dict = sequence_dictionary(res.sample_mapping, "assay_id")
    pat_dict = sequence_dictionary(res.patient_dimension, "patient_num")
    data = res.data.withColumn("probeset_key", F.xxhash64("probeset_id"))
    probe_dict = sequence_dictionary(data, "probeset_key")

    sm = apply_sequence(res.sample_mapping, "assay_id", assay_dict)
    sm = apply_sequence(sm, "patient_id", pat_dict)
    # sourcesystem_cd is trial[:site]:subject — recover the insert's
    # site_id/subject_id fields (I2B2_LOAD_SAMPLES.sql:748-750)
    parts = F.split(F.col("sourcesystem_cd"), ":")
    mapping_frame = sm.select(
        "patient_id",
        F.when(F.size(parts) >= 3, parts[1]).alias("site_id"),
        F.element_at(parts, -1).alias("subject_id"),
        F.lit(None).cast("string").alias("subject_type"),
        F.col("concept_code"),
        "assay_id",
        "sample_type",
        "trial_name",
        "timepoint",
        "tissue_type",
        "platform",
        "gpl_id",
        "sample_cd",
        "category_cd",
        F.coalesce(F.col("source_cd"), F.lit("STD")).alias("source_cd"),
        F.col("trial_name").alias("omic_source_study"),
        F.col("patient_id").alias("omic_patient_id"),
        F.lit(part_id).alias("partition_id"),
    )
    data_frame = apply_sequence(
        apply_sequence(data, "probeset_key", probe_dict), "assay_id", assay_dict
    ).select(
        F.lit(part_id).alias("partition_id"),
        "trial_name",
        F.col("probeset_key").alias("probeset_id"),
        "assay_id",
        "raw_intensity",
        "log_intensity",
        "zscore",
    )
    partition = f"deapp.de_subject_microarray_data_{part_id}"
    n_sm = write_postgres_copy(
        mapping_frame, dsn, "deapp.de_subject_sample_mapping", create=False
    )
    n_data = write_postgres_copy(data_frame, dsn, partition, create=False)
    assert n_sm == mapping_frame.count()
    assert n_data == data_frame.count() > 0
    # inheritance plumbing: the BASE table sees the partition's rows,
    # scoped by the partition_id the reference's queries filter on
    (base_n,) = run_psql(
        dsn,
        "SELECT count(*) FROM deapp.de_subject_microarray_data "
        f"WHERE partition_id = {part_id}",
    ).split()
    assert int(base_n) == n_data
    # the verbatim CHECK constraint arbitrates: a wrong-partition row
    # is rejected by the partition table itself
    with pytest.raises(RuntimeError, match=f"mrna_{part_id}_check"):
        write_postgres_copy(
            data_frame.withColumn("partition_id", F.lit(part_id + 1)).limit(1),
            dsn,
            partition,
            create=False,
        )
    # the assay_id PK arbitrates on the mapping side
    with pytest.raises(RuntimeError, match="de_subject_smpl_mpng_pk"):
        write_postgres_copy(
            mapping_frame.limit(1), dsn, "deapp.de_subject_sample_mapping",
            create=False,
        )
    # reference-parity numbers recomputed INSIDE Postgres
    # (ExpressionDataProcessorTest.testItLoadsData): the Blood
    # subtree's 32 distinct patients — the whole GSE0 expression
    # mapping sits under \Test GEX Platform\Blood\, so the table-wide
    # distinct patient count IS the node count
    assert mapping_frame.filter(F.col("tissue_type") == "Blood").count() == (
        mapping_frame.count()
    )
    (blood,) = run_psql(
        dsn,
        "SELECT count(DISTINCT patient_id) FROM deapp.de_subject_sample_mapping",
    ).split()
    assert int(blood) == 32
    # ...and one exact raw intensity, addressed by the landed
    # surrogate ids (probe 1007_s_at's dictionary id resolved
    # driver-side from the same dictionary the COPY used), joined
    # across the two tables exactly as warehouse queries do
    probe_hash = spark.createDataFrame([("1007_s_at",)], "p string").select(
        F.xxhash64("p").alias("h")
    ).collect()[0]["h"]
    [probe_seq] = [
        r["seq_id"]
        for r in probe_dict.filter(F.col("value") == probe_hash).collect()
    ]
    raw = run_psql(
        dsn,
        "SELECT d.raw_intensity FROM deapp.de_subject_microarray_data d "
        "JOIN deapp.de_subject_sample_mapping sm ON sm.assay_id = d.assay_id "
        "WHERE sm.sample_cd = 'TST1000000719'"
        f" AND d.partition_id = {part_id}"
        f" AND d.probeset_id = {probe_seq}",
    ).strip()
    assert abs(float(raw) - 6.624529839) < 1e-9


#: The chromosomal-region dimension. Like the cores above, the
#: reference repo ships no CREATE TABLE for deapp.de_chromosomal_region
#: or biomart.bio_marker (external tranSMART base schema) — this
#: bootstrap states the PUBLIC tranSMART data model restricted to the
#: columns the reference's own statements name
#: (I2B2_LOAD_CHROM_REGION.sql:135-157 insert contract; :173-189 and
#: :206-222 read bio_marker_name/organism/primary_external_id/
#: bio_marker_type), with the public model's sequence-defaulted PK,
#: NOT NULLs, and varchar widths. The reference's OWN index migration
#: (20150324000002500_CREATE_INDEXES_FOR_ACGH_DATA.sql) then runs
#: verbatim on top.
CHROM_REGION_BOOTSTRAP = """
CREATE SEQUENCE IF NOT EXISTS deapp.seq_chromosomal_region_id;
CREATE TABLE deapp.de_chromosomal_region (
  region_id numeric(18,0) NOT NULL
    DEFAULT nextval('deapp.seq_chromosomal_region_id'),
  gpl_id varchar(50) NOT NULL,
  chromosome varchar(2),
  start_bp numeric(18,0),
  end_bp numeric(18,0),
  num_probes integer,
  region_name varchar(100),
  cytoband varchar(100),
  gene_symbol varchar(100),
  gene_id numeric(18,0),
  organism varchar(200),
  CONSTRAINT de_chromosomal_region_pk PRIMARY KEY (region_id)
);
CREATE SCHEMA IF NOT EXISTS biomart;
CREATE TABLE biomart.bio_marker (
  bio_marker_id numeric(18,0),
  bio_marker_name varchar(200),
  bio_marker_description varchar(1000),
  organism varchar(200),
  primary_source_code varchar(100),
  primary_external_id varchar(200),
  bio_marker_type varchar(100)
);
"""

ACGH_INDEX_MIGRATION = (
    "/root/reference/sql/postgres/migrations/"
    "20150324000002500_CREATE_INDEXES_FOR_ACGH_DATA.sql"
)

ACGH_FIXTURE = (
    "/root/reference/fixtures/Test Studies/Test Study_GSE0/"
    "ACGHDataToUpload/TST_ACGH_region_platform.txt"
)

#: the reference's post-load gene backfill UPDATE pair, VERBATIM from
#: I2B2_LOAD_CHROM_REGION.sql:173-189 and :206-222 (gplId bound to the
#: fixture platform; RETURNING 1 appended only to observe the touched
#: row count through psql)
REF_BACKFILL_UPDATES = [
    """with upd as (select b.bio_marker_name as gene_symbol, b.organism, min(b.primary_external_id::numeric) as gene_id
		from biomart.bio_marker b
		where upper(b.bio_marker_type) = 'GENE'
		group by b.bio_marker_name, b.organism)
	update deapp.de_chromosomal_region a
	set gene_id=upd.gene_id
	from upd
	where a.gpl_id = 'TST_ACGH'
	  and a.gene_id is null
	  and a.gene_symbol is not null
	  and a.gene_symbol = upd.gene_symbol
	  and upper(a.organism) = upper(upd.organism) RETURNING 1""",
    """with upd as (select b.primary_external_id::numeric as gene_id, b.organism, min(b.bio_marker_name) as gene_symbol
		from biomart.bio_marker b
		where upper(b.bio_marker_type) = 'GENE'
		group by b.primary_external_id, b.organism)
	update deapp.de_chromosomal_region a
	set gene_symbol=upd.gene_symbol
	from upd
	where a.gpl_id = 'TST_ACGH'
	  and a.gene_symbol is null
	  and a.gene_id is not null
	  and a.gene_id = upd.gene_id
	  and upper(a.organism) = upper(upd.organism) RETURNING 1""",
]


@pytest.fixture(scope="module")
def chrom_region(deapp):
    """Bootstrap de_chromosomal_region + bio_marker on the deapp
    schema, then run the reference's aCGH index migration verbatim."""
    dsn = deapp
    run_psql(dsn, "DROP TABLE IF EXISTS deapp.de_chromosomal_region CASCADE")
    run_psql(dsn, "DROP TABLE IF EXISTS biomart.bio_marker CASCADE")
    run_psql(dsn, CHROM_REGION_BOOTSTRAP)
    with open(ACGH_INDEX_MIGRATION) as f:
        run_psql(dsn, f.read())
    return dsn


def test_chrom_region_frames_land_in_reference_ddl(spark, chrom_region):
    """Fifth drop-in proof (r11 VERDICT item 5): the GSE0 aCGH region
    platform through OUR reader, the r11 Spark-side gene backfill
    (plans/acgh.backfill_region_genes), then COPY onto the reference's
    insert contract (I2B2_LOAD_CHROM_REGION.sql:135-157) with Postgres
    enforcing the sequence-defaulted region_id PK, gpl_id NOT NULL and
    the varchar widths — and the reference's OWN backfill UPDATE pair
    run VERBATIM afterwards touches ZERO rows, proving the Spark
    backfill already computed exactly what the stored procedure
    would."""
    from pyspark.sql import functions as F

    from tmdataloader_spark.plans.acgh import (
        backfill_region_genes,
        read_chromosomal_regions,
    )

    dsn = chrom_region
    regions = read_chromosomal_regions(spark, ACGH_FIXTURE, "TST_ACGH").annotation
    # the fixture ships no gene columns — give chromosome-1 rows a
    # symbol-only and chromosome-2 rows an id-only marker so both
    # backfill directions fire
    regions = regions.withColumn(
        "gene_symbol", F.when(F.col("chromosome") == "1", F.lit("TP53"))
    ).withColumn(
        "gene_id",
        F.when(F.col("chromosome") == "2", F.lit(7157)).cast("long"),
    )
    bio_marker = spark.createDataFrame(
        [
            ("TP53", "7157", "GENE", "Homo Sapiens"),
            ("TP53", "9999", "GENE", "Homo Sapiens"),  # min() wins -> 7157
            ("TP53", "22059", "GENE", "Mus Musculus"),
            ("ZZZ_LAST", "7157", "GENE", "Homo Sapiens"),  # min(name) -> TP53
            ("TP53", "1111", "PROTEIN", "Homo Sapiens"),  # wrong type
        ],
        "bio_marker_name string, primary_external_id string, "
        "bio_marker_type string, organism string",
    )
    backfilled = backfill_region_genes(regions, bio_marker)
    # the insert contract's columns, in its order (:135-157); region_id
    # is NOT in the contract — the sequence default fills it
    landed = backfilled.select(
        "gpl_id",
        "region_name",
        "chromosome",
        F.col("start_bp").cast("long").alias("start_bp"),
        F.col("end_bp").cast("long").alias("end_bp"),
        F.col("num_probes").cast("int").alias("num_probes"),
        "cytoband",
        "gene_symbol",
        "gene_id",
        "organism",
    )
    n = write_postgres_copy(landed, dsn, "deapp.de_chromosomal_region", create=False)
    assert n == landed.count() > 0
    write_postgres_copy(
        bio_marker.select(
            "bio_marker_name", "organism", "primary_external_id", "bio_marker_type"
        ),
        dsn,
        "biomart.bio_marker",
        create=False,
    )
    # the sequence default minted a distinct region_id per row
    (ids,) = run_psql(
        dsn, "SELECT count(DISTINCT region_id) FROM deapp.de_chromosomal_region"
    ).split()
    assert int(ids) == n
    # the reference's own backfill UPDATEs, verbatim: nothing left to do
    for sql in REF_BACKFILL_UPDATES:
        touched = run_psql(dsn, sql).strip()
        assert touched == "", f"reference UPDATE still changed rows: {touched!r}"
    # parity recomputed INSIDE Postgres: every chromosome-1 row carries
    # the min() external id, every chromosome-2 row the min() name
    (c1,) = run_psql(
        dsn,
        "SELECT count(*) FROM deapp.de_chromosomal_region "
        "WHERE chromosome = '1' AND (gene_id <> 7157 OR gene_symbol <> 'TP53')",
    ).split()
    assert int(c1) == 0
    (c2,) = run_psql(
        dsn,
        "SELECT count(*) FROM deapp.de_chromosomal_region "
        "WHERE chromosome = '2' AND (gene_symbol <> 'TP53' OR gene_id <> 7157)",
    ).split()
    assert int(c2) == 0
    # NOT NULL arbitration: a NULL gpl_id row is rejected by the DDL
    with pytest.raises(RuntimeError, match="gpl_id"):
        write_postgres_copy(
            landed.limit(1).withColumn("gpl_id", F.lit(None).cast("string")),
            dsn,
            "deapp.de_chromosomal_region",
            create=False,
        )
