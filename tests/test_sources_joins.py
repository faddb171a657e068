"""CSV/JSON ingest round-trips and the salted-join skew helper."""

from __future__ import annotations

from pyspark.sql import functions as F

from oakstore_spark.operators.joins import salted_join
from oakstore_spark.sources import table
from oakstore_spark.sources.ingest import read_csv, read_json, read_orc, write_table

SF_DIR = "/root/testdata/sf0.001"


def test_csv_roundtrip(spark, tmp_path):
    src = table(spark, SF_DIR, "nation")
    p = str(tmp_path / "nation_csv")
    write_table(src, p, fmt="csv", header="true")
    back = read_csv(
        spark, p, schema="n_nationkey bigint, n_name string, n_regionkey bigint"
    )
    assert back.count() == src.count()
    assert back.subtract(src).count() == 0 and src.subtract(back).count() == 0


def test_json_roundtrip(spark, tmp_path):
    src = table(spark, SF_DIR, "customer")
    p = str(tmp_path / "customer_json")
    write_table(src, p, fmt="json")
    back = read_json(
        spark,
        p,
        schema="c_custkey bigint, c_name string, c_nationkey bigint, "
        "c_acctbal double, c_mktsegment string",
    ).select(*src.columns)
    assert back.count() == src.count()
    assert back.subtract(src).count() == 0 and src.subtract(back).count() == 0


def test_orc_roundtrip(spark, tmp_path):
    # ORC: the third columnar format next to parquet/delta-less layout;
    # same pushdown/pruning machinery applies
    src = table(spark, SF_DIR, "supplier")
    p = str(tmp_path / "supplier_orc")
    write_table(src, p, fmt="orc")
    back = read_orc(spark, p)
    assert back.count() == src.count()
    assert back.subtract(src).count() == 0 and src.subtract(back).count() == 0
    # pushdown reaches the ORC scan like parquet
    plan = back.filter(F.col("s_suppkey") == 3)._jdf.queryExecution().toString()
    assert "PushedFilters" in plan and "s_suppkey" in plan


def test_salted_join_same_result(spark):
    # heavy skew: 90% of left rows share one key
    left = spark.range(0, 2000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("lv"),
    )
    right = spark.range(0, 50).select(F.col("id").alias("k"), (F.col("id") * 10).alias("rv"))
    plain = left.join(right, ["k"]).select("k", "lv", "rv")
    salted = salted_join(left, right, ["k"], n_salts=8).select("k", "lv", "rv")
    assert salted.count() == plain.count()
    assert salted.subtract(plain).count() == 0 and plain.subtract(salted).count() == 0


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.range(0, 100).select((F.col("id") % 60).alias("k"), F.col("id").alias("lv"))
    right = spark.range(0, 50).select(F.col("id").alias("k"), (F.col("id") * 10).alias("rv"))
    plain = left.join(right, ["k"], "left").select("k", "lv", "rv")
    salted = salted_join(left, right, ["k"], n_salts=4, how="left").select("k", "lv", "rv")
    assert salted.count() == plain.count()
    assert salted.subtract(plain).count() == 0 and plain.subtract(salted).count() == 0
