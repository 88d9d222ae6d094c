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
