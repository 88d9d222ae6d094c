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
