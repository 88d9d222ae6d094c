r"""Tree / ontology operators (SURVEY.md §2.9 — the reference's
signature domain logic).

- T1 fill-in-tree       — sql/postgres/procedures/I2B2_FILL_IN_TREE.sql:52-99
- T2 transitive closure — I2B2_CREATE_FULL_TREE.sql:18-89
- T3 concept counts     — I2B2_CREATE_CONCEPT_COUNTS.sql:60-170 (J7/A5)
- A6 visual attributes  — I2B2_LOAD_CLINICAL_DATA.sql:1432-1481
- T8 move study subtree — I2B2_MOVE_STUDY_BY_PATH.sql
- T9 delete study       — I2B2_DELETE_ALL_DATA.sql

Scale design: the reference's closure is a 5-bucket path-length LIKE
self-join ("VERY SLOW IN POSTGRESQL", I2B2_CREATE_FULL_TREE.sql:54-95).
Here every tree op derives ancestors by exploding each node's OWN
prefix array (`path_prefixes_expr`) and equi-joining on the prefix
string: O(n·depth) rows, hash-partitionable, no theta join — this is
the plan that survives 100 TB (depth ≤ ~20 while n is unbounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from tmdataloader_spark.functions.paths import (
    get_last_path_component,
    path_hlevel,
    path_prefixes_expr,
)


def fill_in_tree(leaves: DataFrame, path_col: str = "path") -> DataFrame:
    """T1: every distinct prefix of every leaf path becomes a node —
    the reference inserts the missing intermediate folders
    (I2B2_FILL_IN_TREE.sql:52-99). Returns the complete node set
    ``(path, hlevel, name)``, leaves included."""
    return (
        leaves.select(F.explode(path_prefixes_expr(path_col)).alias(path_col))
        .distinct()
        .withColumn("hlevel", path_hlevel(path_col))
        .withColumn("name", get_last_path_component(path_col))
    )


def tree_closure(nodes: DataFrame, path_col: str = "path") -> DataFrame:
    """T2: (ancestor_path, descendant_path) pairs, ancestor-or-self —
    replaces I2B2_CREATE_FULL_TREE's bucketed LIKE self-join with a
    prefix explode (each node emits its own ancestor list)."""
    return nodes.select(
        F.explode(path_prefixes_expr(path_col)).alias("ancestor_path"),
        F.col(path_col).alias("descendant_path"),
    )


def concept_counts(
    facts: DataFrame,
    leaf_path_col: str = "path",
    patient_col: str = "patient_num",
) -> DataFrame:
    """T3/A5/J7: distinct-patient count per ancestor-or-self node
    (I2B2_CREATE_CONCEPT_COUNTS.sql:79-102).

    Shape: explode each fact's leaf path into its ancestors, then
    ``groupBy(ancestor).agg(countDistinct(patient))``. Spark plans
    countDistinct as a two-phase partial aggregate (map-side distinct
    first), so the shuffle carries (node, patient) pairs — already the
    minimal data. For extreme fan-out skew (root node sees every
    patient) AQE skew handling applies; a salted two-level rewrite is
    `concept_counts_salted`.
    """
    exploded = facts.select(
        F.explode(path_prefixes_expr(leaf_path_col)).alias("concept_path"),
        F.col(patient_col).alias(patient_col),
    )
    return exploded.groupBy("concept_path").agg(
        F.countDistinct(patient_col).alias("patient_count")
    )


def concept_counts_salted(
    facts: DataFrame,
    leaf_path_col: str = "path",
    patient_col: str = "patient_num",
) -> DataFrame:
    """T3 at extreme scale: two-phase distinct — first dedupe
    (node, patient) pairs (hash-partitioned over both columns so the
    hot root key spreads across the cluster), then count per node.
    Same result as `concept_counts`; use when one node dominates."""
    pairs = facts.select(
        F.explode(path_prefixes_expr(leaf_path_col)).alias("concept_path"),
        F.col(patient_col).alias(patient_col),
    ).distinct()  # shuffle keyed on (path, patient) — no hot single key
    return pairs.groupBy("concept_path").agg(F.count(patient_col).alias("patient_count"))


def visual_attributes(
    nodes: DataFrame,
    path_col: str = "path",
    study_root_hlevel: int | None = None,
    study_root_path: str | None = None,
    highlight: bool = False,
) -> DataFrame:
    """A6: per-node descendant count → c_visualattributes: exactly
    itself ⇒ leaf 'LA', else folder 'FA'; the study TOP NODE gets the
    third character 'S' — or 'J' when the load runs with the
    highlight flag (I2B2_LOAD_CLINICAL_DATA.sql:1432-1481, the
    ``highlight_study`` parameter wired from
    ClinicalDataProcessor.groovy:290's ``highlightClinicalData``
    config; ClinicalDataProcessorTest.groovy:145-146 asserts exactly
    ONE 'FAS' node under the study subtree). Identify the root either
    by exact path (``study_root_path`` — the reference's
    ``u.c_fullname = topNode``) or by level (``study_root_hlevel``)."""
    closure = tree_closure(nodes, path_col)
    desc_counts = closure.groupBy("ancestor_path").agg(
        F.count("*").alias("n_descendants")
    )
    out = nodes.join(
        desc_counts, nodes[path_col] == desc_counts["ancestor_path"], "left"
    ).drop("ancestor_path")
    attr = F.when(F.col("n_descendants") <= 1, F.lit("LA")).otherwise(F.lit("FA"))
    root_attr = F.lit("FAJ" if highlight else "FAS")
    if study_root_path is not None:
        attr = F.when(F.col(path_col) == study_root_path, root_attr).otherwise(attr)
    elif study_root_hlevel is not None:
        attr = F.when(
            path_hlevel(path_col) == study_root_hlevel, root_attr
        ).otherwise(attr)
    return out.withColumn("c_visualattributes", attr).drop("n_descendants")


def move_subtree(df: DataFrame, old_path: str, new_path: str, path_col: str = "path") -> DataFrame:
    r"""T8: rewrite the path prefix across a table
    (I2B2_MOVE_STUDY_BY_PATH.sql:408-482). Literal prefix replace —
    implemented with startswith + concat (no regex escaping worries
    with backslash-heavy paths)."""
    c = F.col(path_col)
    moved = F.concat(F.lit(new_path), F.substring(c, len(old_path) + 1, 2_000_000))
    return df.withColumn(path_col, F.when(c.startswith(old_path), moved).otherwise(c))


def delete_subtree(df: DataFrame, root_path: str, path_col: str = "path") -> DataFrame:
    """T6/T9 building block: drop every node at-or-under a path."""
    return df.filter(~F.col(path_col).startswith(root_path))


def first_existing_path_per_study(
    i2b2: DataFrame, study_col: str = "sourcesystem_cd", path_col: str = "c_fullname"
) -> DataFrame:
    """W1: canonical (first-by-name) path of an existing study —
    ``first_value(...) over (partition by sourcesystem_cd order by
    c_fullname)`` (etl/AbstractDataProcessor.groovy:108-113)."""
    w = Window.partitionBy(study_col).orderBy(path_col)
    return (
        i2b2.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .select(study_col, F.col(path_col).alias("first_path"))
    )


def add_nodes(
    i2b2: DataFrame,
    concept_dim: DataFrame,
    facts: DataFrame,
    new_paths: list[str],
    trial_id: str | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    r"""T4 (I2B2_ADD_NODES.sql:41-100): idempotent node insert —
    existing facts at those concepts, concept_dimension rows, and i2b2
    rows are deleted first, then each path re-inserted as a folder
    ('FA') with computed hlevel and last-component name. Returns the
    rewritten (i2b2, concept_dimension, observation_fact). The
    reference's I2B2_ADD_TRIAL_NODES.sql utility is this plus
    fill_in_tree/add_root_node for the missing intermediates and an
    'FAS' flip on the trial path — compositions of the operators in
    this module (T1/T5/A6)."""
    spark = i2b2.sparkSession
    doomed_concepts = i2b2.filter(F.col("c_fullname").isin(new_paths)).select(
        F.col("c_basecode").alias("concept_cd")
    )
    facts = facts.join(F.broadcast(doomed_concepts), on="concept_cd", how="left_anti")
    concept_dim = concept_dim.filter(~F.col("concept_path").isin(new_paths))
    i2b2 = i2b2.filter(~F.col("c_fullname").isin(new_paths))

    rows = [
        (
            p,
            p.count("\\") - 2,
            [x for x in p.split("\\") if x][-1],
            None,
            None,
            trial_id,
        )
        for p in new_paths
    ]
    add = spark.createDataFrame(
        rows,
        "c_fullname string, c_hlevel int, c_name string, c_basecode string, "
        "valtype_cd string, sourcesystem_cd string",
    ).withColumn("c_basecode", F.sha2(F.col("c_fullname"), 256).substr(1, 16))
    for c in i2b2.columns:
        if c not in add.columns:
            add = add.withColumn(c, F.lit("FA" if c == "c_visualattributes" else None).cast("string"))
    i2b2 = i2b2.unionByName(add.select(i2b2.columns))
    concept_dim = concept_dim.unionByName(
        add.select(
            F.col("c_fullname").alias("concept_path"),
            F.col("c_basecode").alias("concept_cd"),
            F.col("c_name").alias("name_char"),
            "sourcesystem_cd",
        ).select(concept_dim.columns)
    )
    return i2b2, concept_dim, facts


def add_root_node(
    i2b2: DataFrame, table_access: DataFrame | None, root_name: str
) -> tuple[DataFrame, DataFrame]:
    r"""T5 (I2B2_ADD_ROOT_NODE.sql): register ``\<name>\`` at hlevel 0
    in i2b2 and table_access — idempotent."""
    spark = i2b2.sparkSession
    path = f"\\{root_name}\\"
    exists = i2b2.filter(F.col("c_fullname") == path).limit(1).count() > 0
    if not exists:
        row = spark.createDataFrame(
            [(path, 0, root_name)], "c_fullname string, c_hlevel int, c_name string"
        )
        for c in i2b2.columns:
            if c not in row.columns:
                row = row.withColumn(
                    c, F.lit("CA" if c == "c_visualattributes" else None).cast("string")
                )
        i2b2 = i2b2.unionByName(row.select(i2b2.columns))
    if table_access is not None:
        if table_access.filter(F.col("c_fullname") == path).limit(1).count() == 0:
            table_access = table_access.unionByName(
                spark.createDataFrame(
                    [(path, root_name)], "c_fullname string, c_name string"
                ).select(table_access.columns)
            )
    return i2b2, table_access


def prune_hidden_nodes(i2b2: DataFrame, top_node: str) -> DataFrame:
    """T7 (I2B2_LOAD_CLINICAL_DATA.sql:64-70, 1513-1524): after
    concept counts, nodes whose second visual-attribute char is 'H'
    (hidden = zero observations) are deleted — the reference's
    one-at-a-time delete cursor as a single set-based filter."""
    hidden = F.col("c_fullname").startswith(top_node) & (
        F.substring(F.col("c_visualattributes"), 2, 1) == "H"
    )
    return i2b2.filter(~hidden)


def prune_unused_leaves(
    i2b2: DataFrame,
    trial_nodes: DataFrame,
    top_node: str,
    sample_concepts: DataFrame | None = None,
) -> DataFrame:
    """T7 twin (I2B2_LOAD_CLINICAL_DATA.sql:78-92, 936-947): on a
    REPLACE reload, leaf nodes under the study that are in neither the
    new load's leaf set nor the HDD sample concepts are deleted (a
    leaf that flipped text↔numeric leaves a stale twin otherwise)."""
    keep_paths = trial_nodes.select(F.col("leaf_node").alias("c_fullname")).distinct()
    if sample_concepts is not None:
        keep_paths = keep_paths.unionByName(
            sample_concepts.select(F.col("concept_path").alias("c_fullname")).distinct()
        )
    doomed = (
        i2b2.filter(
            F.col("c_fullname").startswith(top_node)
            & F.col("c_visualattributes").startswith("L")
        )
        .join(F.broadcast(keep_paths), on="c_fullname", how="left_anti")
        .select("c_fullname")
    )
    return i2b2.join(F.broadcast(doomed), on="c_fullname", how="left_anti")


def create_security_for_trial(
    facts: DataFrame, trial_id: str, secure: bool = False
) -> DataFrame:
    """T10 (i2b2_create_security_for_trial, called at
    I2B2_LOAD_CLINICAL_DATA.sql:1526): one SECURITY fact per patient of
    the trial with token EXP:<trial> (secure) or EXP:PUBLIC."""
    token = f"EXP:{trial_id}" if secure else "EXP:PUBLIC"
    patients = (
        facts.filter(F.col("sourcesystem_cd") == trial_id)
        .select("patient_num")
        .distinct()
    )
    sec = patients.select(
        "patient_num",
        F.lit("SECURITY").alias("concept_cd"),
        F.lit(trial_id).alias("modifier_cd"),
        F.lit("T").alias("valtype_cd"),
        F.lit(token).alias("tval_char"),
        F.lit(None).cast("double").alias("nval_num"),
        F.lit(trial_id).alias("sourcesystem_cd"),
    )
    for c in facts.columns:
        if c not in sec.columns:
            sec = sec.withColumn(c, F.lit(None).cast(dict(facts.dtypes)[c]))
    return facts.unionByName(sec.select(facts.columns))


def load_security_data(i2b2: DataFrame, facts: DataFrame) -> DataFrame:
    """T10 (I2B2_LOAD_SECURITY_DATA.sql:80-98): i2b2_secure = every
    i2b2 row + secure_obj_token from the study's SECURITY fact,
    defaulting to EXP:PUBLIC."""
    tokens = (
        facts.filter(F.col("concept_cd") == "SECURITY")
        .select(
            F.col("modifier_cd").alias("sourcesystem_cd"),
            F.col("tval_char").alias("secure_obj_token"),
        )
        .distinct()
    )
    return i2b2.join(F.broadcast(tokens), on="sourcesystem_cd", how="left").withColumn(
        "secure_obj_token", F.coalesce(F.col("secure_obj_token"), F.lit("EXP:PUBLIC"))
    )


def copy_security_from_study(
    access: DataFrame,
    secure_objects: DataFrame,
    study_id: str,
    from_study_id: str,
) -> DataFrame:
    """T10 post-processing (COPY_SECURITY_FROM_OTHER_STUDY.sql:37-60):
    append copies of the source study's ACL rows re-pointed at the
    target study's secure object.

    ``secure_objects`` is the ``search_secure_object`` frame
    (``search_secure_object_id``, ``bio_data_unique_id``), ``access``
    the ``search_auth_sec_object_access`` frame. New access ids are
    ``max(existing) + row_number`` — the set-based stand-in for the
    reference's sequence, deterministic given a principal ordering.
    Both studies' secure-object lookups broadcast (single-row dims)."""
    from pyspark.sql import Window

    def _obj_id(study: str) -> DataFrame:
        return secure_objects.filter(
            F.col("bio_data_unique_id") == f"EXP:{study}"
        ).select("search_secure_object_id")

    src = _obj_id(from_study_id).withColumnRenamed(
        "search_secure_object_id", "_src_id"
    )
    dst = _obj_id(study_id).withColumnRenamed("search_secure_object_id", "_dst_id")
    base_id = (
        access.agg(F.coalesce(F.max("auth_sec_obj_access_id"), F.lit(0))).first()[0]
    )
    w = Window.orderBy("auth_principal_id", "secure_access_level_id")
    copied = (
        access.join(
            F.broadcast(src), access["secure_object_id"] == F.col("_src_id")
        )
        .select("auth_principal_id", "secure_access_level_id")
        .crossJoin(F.broadcast(dst))
        .select(
            (F.lit(base_id) + F.row_number().over(w)).alias("auth_sec_obj_access_id"),
            F.col("auth_principal_id"),
            F.col("_dst_id").alias("secure_object_id"),
            F.col("secure_access_level_id"),
        )
    )
    return access.unionByName(copied.select(access.columns))


def register_secure_study(
    secure_objects: DataFrame | None,
    bio_experiment: DataFrame | None,
    i2b2: DataFrame,
    trial_id: str,
    secure: bool = False,
    bio_data_uid: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """T10 tail (i2b2_create_security_for_trial.sql:130-190): keep the
    ``search_secure_object`` registry in step with the study's
    security flag after a (re)load.

    - No EXP:<trial> row yet and ``secure``: ensure a bio_experiment
      stub ('Metadata not available' / METADATA:<trial>, :142-148),
      its ``bio_data_uid`` EXP row (the Postgres-side function the
      integration suite runs against also registers the uid —
      PostProcessingTest.groovy:68-79 asserts all three tables), and
      insert the secure object — display_name is the study folder
      (``parse_nth_value(c_fullname, 2)``) + ' - ' + c_name of the
      study's min-hlevel ontology row (:157-173).
    - EXP:<trial> row present and NOT ``secure``: delete it (:181-186)
      — the re-load-as-public path.

    Returns ``(secure_objects, bio_experiment, bio_data_uid)``.  All
    frames are dimension-sized (one row per study / ACL), so the
    existence probes are bounded collects like the reference's
    ``select count(*) into pExists``."""
    from tmdataloader_spark.functions.paths import parse_nth_value

    spark = i2b2.sparkSession
    token = f"EXP:{trial_id}"
    if secure_objects is None:
        secure_objects = spark.createDataFrame(
            [],
            "search_secure_object_id long, bio_data_id long, "
            "display_name string, data_type string, bio_data_unique_id string",
        )
    if bio_experiment is None:
        bio_experiment = spark.createDataFrame(
            [], "bio_experiment_id long, title string, accession string, etl_id string"
        )
    if bio_data_uid is None:
        bio_data_uid = spark.createDataFrame(
            [], "unique_id string, bio_data_type string, accession string"
        )
    exists = (
        secure_objects.filter(F.col("bio_data_unique_id") == token).limit(1).count()
        > 0
    )
    if exists and not secure:
        return (
            secure_objects.filter(F.col("bio_data_unique_id") != token),
            bio_experiment,
            bio_data_uid,
        )
    if exists or not secure:
        return secure_objects, bio_experiment, bio_data_uid

    # ensure the bio_experiment stub (novelty upsert on accession).
    # bio_experiment_id is xxhash64(accession) — the house surrogate
    # for the reference's sequence (same idiom as patient_num,
    # plans/clinical.py) — derived for Meta-loaded frames that carry
    # no id column
    if "bio_experiment_id" not in bio_experiment.columns:
        bio_experiment = bio_experiment.withColumn(
            "bio_experiment_id", F.xxhash64("accession")
        )
    if bio_experiment.filter(F.col("accession") == trial_id).limit(1).count() == 0:
        stub = spark.createDataFrame(
            [("Metadata not available", trial_id, f"METADATA:{trial_id}")],
            "title string, accession string, etl_id string",
        ).withColumn("bio_experiment_id", F.xxhash64("accession"))
        bio_experiment = bio_experiment.unionByName(
            stub, allowMissingColumns=True
        )
    exp_id = (
        bio_experiment.filter(F.col("accession") == trial_id)
        .select("bio_experiment_id")
        .first()[0]
    )
    # the EXP uid row (novelty upsert on unique_id)
    if bio_data_uid.filter(F.col("unique_id") == token).limit(1).count() == 0:
        uid = spark.createDataFrame(
            [(token, "EXP", trial_id)],
            "unique_id string, bio_data_type string, accession string",
        )
        bio_data_uid = bio_data_uid.unionByName(uid, allowMissingColumns=True)
    study_rows = i2b2.filter(F.col("sourcesystem_cd") == trial_id)
    min_hlevel = study_rows.agg(F.min("c_hlevel")).first()[0]
    base_so = (
        secure_objects.agg(F.coalesce(F.max("search_secure_object_id"), F.lit(0)))
        .first()[0]
    )
    new_obj = study_rows.filter(F.col("c_hlevel") == min_hlevel).select(
        (F.lit(int(base_so) + 1)).alias("search_secure_object_id"),
        F.lit(exp_id).cast("long").alias("bio_data_id"),
        F.concat(
            parse_nth_value("c_fullname", 2), F.lit(" - "), F.col("c_name")
        ).alias("display_name"),
        F.lit("BIO_CLINICAL_TRIAL").alias("data_type"),
        F.lit(token).alias("bio_data_unique_id"),
    ).limit(1)
    return (
        secure_objects.unionByName(new_obj.select(secure_objects.columns)),
        bio_experiment,
        bio_data_uid,
    )
