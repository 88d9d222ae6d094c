r"""Tree maintenance (T4/T5/T7) and security (T10) operator tests."""

from pyspark.sql import functions as F

from tmdataloader_spark.operators.tree import (
    add_nodes,
    add_root_node,
    create_security_for_trial,
    load_security_data,
    prune_hidden_nodes,
    prune_unused_leaves,
)


def mk_i2b2(spark, rows):
    return spark.createDataFrame(
        rows,
        "c_fullname string, c_hlevel int, c_name string, c_basecode string, "
        "valtype_cd string, sourcesystem_cd string, c_visualattributes string",
    )


def test_add_nodes_idempotent(spark):
    i2b2 = mk_i2b2(spark, [("\\A\\B\\", 1, "B", "old", None, "T1", "LA")])
    cd = spark.createDataFrame(
        [("\\A\\B\\", "old", "B", "T1")],
        "concept_path string, concept_cd string, name_char string, sourcesystem_cd string",
    )
    facts = spark.createDataFrame(
        [(1, "old"), (2, "other")], "patient_num int, concept_cd string"
    )
    i2b2_2, cd_2, facts_2 = add_nodes(i2b2, cd, facts, ["\\A\\B\\", "\\A\\C\\"], "T1")
    nodes = {r.c_fullname: r for r in i2b2_2.collect()}
    assert set(nodes) == {"\\A\\B\\", "\\A\\C\\"}
    assert nodes["\\A\\B\\"].c_visualattributes == "FA"
    assert nodes["\\A\\B\\"].c_basecode != "old"  # re-inserted
    assert nodes["\\A\\C\\"].c_hlevel == 1  # (#separators − 2)
    # facts at replaced concepts removed, others kept
    assert [r.concept_cd for r in facts_2.collect()] == ["other"]
    assert {r.concept_path for r in cd_2.collect()} == {"\\A\\B\\", "\\A\\C\\"}


def test_add_root_node(spark):
    i2b2 = mk_i2b2(spark, [("\\A\\B\\", 1, "B", "x", None, "T1", "LA")])
    ta = spark.createDataFrame([("\\Old\\", "Old")], "c_fullname string, c_name string")
    i2b2_2, ta_2 = add_root_node(i2b2, ta, "New Root")
    assert "\\New Root\\" in {r.c_fullname for r in i2b2_2.collect()}
    assert "\\New Root\\" in {r.c_fullname for r in ta_2.collect()}
    # idempotent
    i2b2_3, ta_3 = add_root_node(i2b2_2, ta_2, "New Root")
    assert i2b2_3.filter(F.col("c_fullname") == "\\New Root\\").count() == 1


def test_prune_hidden_nodes(spark):
    i2b2 = mk_i2b2(
        spark,
        [
            ("\\A\\B\\", 1, "B", "b", None, "T1", "LH"),
            ("\\A\\C\\", 1, "C", "c", None, "T1", "LA"),
            ("\\X\\Y\\", 1, "Y", "y", None, "T2", "LH"),
        ],
    )
    out = prune_hidden_nodes(i2b2, "\\A\\")
    # hidden under \A\ deleted; hidden outside untouched
    assert {r.c_fullname for r in out.collect()} == {"\\A\\C\\", "\\X\\Y\\"}


def test_prune_unused_leaves(spark):
    i2b2 = mk_i2b2(
        spark,
        [
            ("\\A\\", 0, "A", "a", None, "T1", "FA"),
            ("\\A\\B\\", 1, "B", "b", None, "T1", "LA"),
            ("\\A\\C\\", 1, "C", "c", None, "T1", "LA"),
            ("\\A\\D\\", 1, "D", "d", None, "T1", "LAH"),
        ],
    )
    trial_nodes = spark.createDataFrame([("\\A\\B\\",)], "leaf_node string")
    samples = spark.createDataFrame([("\\A\\D\\",)], "concept_path string")
    out = prune_unused_leaves(i2b2, trial_nodes, "\\A\\", samples)
    # C is a leaf in neither the reload nor the samples -> pruned
    assert {r.c_fullname for r in out.collect()} == {"\\A\\", "\\A\\B\\", "\\A\\D\\"}


def test_security_roundtrip(spark):
    facts = spark.createDataFrame(
        [(1, "c1", "T1", "T", "E", None, "T1"), (2, "c2", "T2", "T", "E", None, "T2")],
        "patient_num int, concept_cd string, modifier_cd string, valtype_cd string, "
        "tval_char string, nval_num double, sourcesystem_cd string",
    )
    secured = create_security_for_trial(facts, "T1", secure=True)
    sec_rows = secured.filter(F.col("concept_cd") == "SECURITY").collect()
    assert len(sec_rows) == 1 and sec_rows[0]["tval_char"] == "EXP:T1"

    i2b2 = mk_i2b2(
        spark,
        [
            ("\\A\\", 0, "A", "a", None, "T1", "FA"),
            ("\\B\\", 0, "B", "b", None, "T2", "FA"),
        ],
    )
    sec = load_security_data(i2b2, secured)
    tokens = {r.c_fullname: r.secure_obj_token for r in sec.collect()}
    assert tokens["\\A\\"] == "EXP:T1"  # secured study
    assert tokens["\\B\\"] == "EXP:PUBLIC"  # default


def test_copy_security_from_study(spark):
    """PostProcessingTest.groovy 'it should check copy security
    configuration' — the source study's ACL rows are duplicated onto
    the target study's secure object with fresh ids."""
    from tmdataloader_spark.operators.tree import copy_security_from_study

    secure_objects = spark.createDataFrame(
        [(10, "EXP:GSE0"), (20, "EXP:GSE0SECOND")],
        "search_secure_object_id long, bio_data_unique_id string",
    )
    access = spark.createDataFrame(
        [(1, 1, 10, 8), (2, 7, 10, 8), (3, 1, 99, 8)],
        "auth_sec_obj_access_id long, auth_principal_id long, "
        "secure_object_id long, secure_access_level_id long",
    )
    out = copy_security_from_study(access, secure_objects, "GSE0SECOND", "GSE0")
    rows = {tuple(r) for r in out.collect()}
    # originals intact
    assert (1, 1, 10, 8) in rows and (3, 1, 99, 8) in rows
    # both ACL rows of GSE0's object copied to GSE0SECOND's object
    copied = {r for r in rows if r[2] == 20}
    assert {(r[1], r[3]) for r in copied} == {(1, 8), (7, 8)}
    # ids continue past the existing maximum, no collisions
    ids = [r[0] for r in out.collect()]
    assert len(ids) == len(set(ids)) and max(ids) == 5


def test_register_secure_study_lifecycle(spark):
    """i2b2_create_security_for_trial.sql:130-190: a secure load with
    no EXP:<trial> row creates the bio_experiment stub ('Metadata not
    available' / METADATA:<trial>) and the search_secure_object row
    (display_name = study folder + ' - ' + top-node name, data_type
    BIO_CLINICAL_TRIAL); a later PUBLIC re-load of the same study
    deletes the row; idempotent when already registered."""
    from tmdataloader_spark.operators.tree import register_secure_study

    i2b2 = spark.createDataFrame(
        [
            ("\\Test Studies\\Demo\\", 1, "Demo", "GSE9"),
            ("\\Test Studies\\Demo\\x\\", 2, "x", "GSE9"),
        ],
        "c_fullname string, c_hlevel int, c_name string, sourcesystem_cd string",
    )
    so, be, uid = register_secure_study(None, None, i2b2, "GSE9", secure=True)
    objs = so.collect()
    assert len(objs) == 1
    row = objs[0]
    assert row.bio_data_unique_id == "EXP:GSE9"
    assert row.data_type == "BIO_CLINICAL_TRIAL"
    assert row.display_name == "Test Studies - Demo"
    stub = be.filter(be.accession == "GSE9").collect()
    assert len(stub) == 1
    assert stub[0].title == "Metadata not available"
    assert stub[0].etl_id == "METADATA:GSE9"
    assert row.bio_data_id == stub[0].bio_experiment_id
    # the Postgres-side function also registers the EXP uid —
    # PostProcessingTest.groovy:68-79 asserts all three tables
    uids = uid.collect()
    assert len(uids) == 1
    assert (uids[0].unique_id, uids[0].bio_data_type, uids[0].accession) == (
        "EXP:GSE9", "EXP", "GSE9")

    # already registered + still secure: no duplicate
    so2, be2, uid2 = register_secure_study(so, be, i2b2, "GSE9", secure=True,
                                           bio_data_uid=uid)
    assert so2.count() == 1 and be2.filter(be2.accession == "GSE9").count() == 1
    assert uid2.count() == 1

    # re-load as PUBLIC: the secure object row is deleted (:181-186)
    so3, _, _ = register_secure_study(so2, be2, i2b2, "GSE9", secure=False,
                                      bio_data_uid=uid2)
    assert so3.count() == 0

    # public load of an unregistered study: nothing created
    so4, be4, uid4 = register_secure_study(None, None, i2b2, "GSE9", secure=False)
    assert so4.count() == 0 and be4.count() == 0 and uid4.count() == 0
