"""JDBC sink integration smoke (SURVEY.md §2.1 S8): round-trip
warehouse frames through a real JDBC database — embedded Apache Derby,
whose driver ships in Spark's own jars directory — asserting row
counts, values, and the reference's batch sizing reaching the writer
options (ExpressionDataProcessor.groovy:200).

Skips cleanly if the Derby driver is absent (slim Spark builds).
"""

import os

import pytest
from pyspark.sql import functions as F

from tmdataloader_spark.sinks import write_jdbc

DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


def _derby_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
        return True
    except Exception:
        return False


def test_jdbc_round_trip_observation_fact(spark, tmp_path):
    if not _derby_available(spark):
        pytest.skip("embedded Derby driver not on the Spark classpath")
    url = f"jdbc:derby:{tmp_path}/wh_db;create=true"

    facts = spark.createDataFrame(
        [
            (1, "C1", "@", "N", "E", 1.5, "GSE0"),
            (2, "C1", "@", "N", "E", 2.5, "GSE0"),
            (3, "C2", "@", "T", "Male", None, "GSE0"),
        ],
        "patient_num long, concept_cd string, modifier_cd string, "
        "valtype_cd string, tval_char string, nval_num double, "
        "sourcesystem_cd string",
    )
    patients = spark.createDataFrame(
        [(1, "Male", 40, "GSE0:S1"), (2, "Female", 41, "GSE0:S2")],
        "patient_num long, sex_cd string, age_in_years_num int, sourcesystem_cd string",
    )
    # Derby maps StringType to CLOB (not comparable/filterable) —
    # give the string columns VARCHAR DDL, as a real tranSMART schema
    # would (varchar(700) paths, varchar(50) codes)
    fact_ddl = (
        "concept_cd VARCHAR(50), modifier_cd VARCHAR(50), valtype_cd VARCHAR(50), "
        "tval_char VARCHAR(255), sourcesystem_cd VARCHAR(50)"
    )
    pat_ddl = "sex_cd VARCHAR(50), sourcesystem_cd VARCHAR(200)"
    # reference batch sizes: 1000 for matrix/fact data, 100 for mappings
    write_jdbc(facts, url, "observation_fact", mode="overwrite", batch_size=1000,
               properties={"createTableColumnTypes": fact_ddl})
    write_jdbc(patients, url, "patient_dimension", mode="overwrite", batch_size=100,
               num_partitions=1, properties={"createTableColumnTypes": pat_ddl})

    back = spark.read.jdbc(url, "observation_fact")
    assert back.count() == 3
    assert back.filter(F.col("valtype_cd") == "N").agg(
        F.sum("nval_num")
    ).collect()[0][0] == pytest.approx(4.0)
    pd_back = spark.read.jdbc(url, "patient_dimension")
    assert {r.sourcesystem_cd for r in pd_back.collect()} == {"GSE0:S1", "GSE0:S2"}

    # append mode adds rows instead of replacing
    write_jdbc(facts.limit(1), url, "observation_fact", mode="append")
    assert spark.read.jdbc(url, "observation_fact").count() == 4
