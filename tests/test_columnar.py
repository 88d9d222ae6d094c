"""sources/columnar.py: ORC round-trip with pushdown, and
schema-evolved multi-generation reads (missing columns, numeric
widening, incompatible-drift abort)."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tmdataloader_spark.sources.columnar import (
    align_to,
    common_schema,
    read_evolved,
    read_orc,
    write_orc,
)


def test_orc_roundtrip_and_pushdown(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    path = str(tmp_path / "docs_orc")
    write_orc(docs, path)
    back = read_orc(spark, path)
    assert back.count() == docs.count()
    assert set(back.columns) == set(docs.columns)
    # filter + projection must reach the ORC scan
    plan = (
        back.filter(F.col("lang") == "en")
        .select("doc_id")
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan
    assert "ReadSchema" in plan and "text" not in plan.split("ReadSchema")[1].split("\n")[0]


def _gen(spark, tmp_path, name, rows, schema, fmt):
    df = spark.createDataFrame(rows, schema)
    p = str(tmp_path / name)
    getattr(df.write, fmt)(p)
    return p


@pytest.mark.parametrize("fmt", ["parquet", "orc"])
def test_read_evolved_missing_columns(spark, tmp_path, fmt):
    p1 = _gen(spark, tmp_path, f"g1_{fmt}", [(1, "a")], "id long, s string", fmt)
    p2 = _gen(
        spark, tmp_path, f"g2_{fmt}", [(2, "b", 9.5)], "id long, s string, q double", fmt
    )
    out = read_evolved(spark, [p1, p2], fmt=fmt)
    assert out.columns == ["id", "s", "q"]
    got = {r["id"]: (r["s"], r["q"]) for r in out.collect()}
    assert got == {1: ("a", None), 2: ("b", 9.5)}


def test_read_evolved_widens_int_to_double(spark, tmp_path):
    p1 = _gen(spark, tmp_path, "w1", [(1, 10)], "id long, v int", "parquet")
    p2 = _gen(spark, tmp_path, "w2", [(2, 2.5)], "id long, v double", "parquet")
    out = read_evolved(spark, [p1, p2])
    assert dict(out.dtypes)["v"] == "double"
    assert {r["v"] for r in out.collect()} == {10.0, 2.5}


def test_read_evolved_incompatible_raises(spark, tmp_path):
    p1 = _gen(spark, tmp_path, "i1", [(1, "x")], "id long, v string", "parquet")
    p2 = _gen(spark, tmp_path, "i2", [(2, 5.0)], "id long, v double", "parquet")
    with pytest.raises(TypeError, match="incompatible column types"):
        read_evolved(spark, [p1, p2])


def test_union_is_shuffle_free(spark, tmp_path):
    p1 = _gen(spark, tmp_path, "s1", [(1, 10)], "id long, v int", "parquet")
    p2 = _gen(spark, tmp_path, "s2", [(2, 2.5)], "id long, v double", "parquet")
    out = read_evolved(spark, [p1, p2])
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "Exchange" not in plan


def test_align_to_is_projection_only(spark):
    from pyspark.sql import types as T

    df = spark.createDataFrame([(1,)], "a int")
    schema = common_schema(
        [df, spark.createDataFrame([(2.0, "x")], "a double, b string")]
    )
    out = align_to(df, schema)
    assert out.schema == T.StructType(
        [
            T.StructField("a", T.DoubleType(), True),
            T.StructField("b", T.StringType(), True),
        ]
    )


def test_schema_drift_report(spark):
    from tmdataloader_spark.sources.columnar import schema_drift

    old = spark.createDataFrame([(1, "a", 2)], "id long, s string, gone int")
    new = spark.createDataFrame([(1, "a", 2.0)], "id long, s string, v double")
    got = {
        r["column"]: (r["status"], r["old_type"], r["new_type"])
        for r in schema_drift(old, new).collect()
    }
    assert got["id"] == ("unchanged", "bigint", "bigint")
    assert got["gone"] == ("removed", "int", None)
    assert got["v"] == ("added", None, "double")


def test_schema_drift_retyped(spark):
    from tmdataloader_spark.sources.columnar import schema_drift

    old = spark.createDataFrame([(1,)], "v int")
    new = spark.createDataFrame([(1.0,)], "v double")
    assert schema_drift(old, new).collect()[0]["status"] == "retyped"
