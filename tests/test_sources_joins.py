"""CSV/JSON ingest round-trips and the salted-join skew helper."""

from __future__ import annotations

from pathlib import Path

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


def test_oakstore_datasource_reads_item(spark, tmp_path):
    """spark.read.format('oakstore') must return the same rows as the
    store's own reader, for both commit protocols."""
    import numpy as np
    import pandas as pd

    from oakstore_spark import Store
    from oakstore_spark.sources.datasource import OakStoreDataSource

    spark.dataSource.register(OakStoreDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    idx = pd.date_range("2020-06-01", periods=400, freq="D")  # spans 2 years
    df = pd.DataFrame(
        {"Open": np.arange(400.0), "High": np.arange(400.0),
         "Low": np.arange(400.0), "Close": np.arange(400.0),
         "Volume": np.arange(400)},
        index=idx,
    )
    for proto in ("rename", "manifest"):
        base = tmp_path / f"ds_{proto}"
        s = Store(base_path=base, spark=spark, commit_protocol=proto)
        s["ITEM"] = df
        out = (
            spark.read.format("oakstore")
            .option("path", str(base))
            .option("key", "item")
            .load()
        )
        assert out.count() == 400
        assert set(out.columns) == {"DATE", "OPEN", "HIGH", "LOW", "CLOSE", "VOLUME"}
        total = out.agg(F.sum("VOLUME")).collect()[0][0]
        assert total == sum(range(400))


def test_oakstore_datasource_filter_pushdown_prunes(spark, tmp_path):
    """Range predicates on the index must be absorbed by the source:
    year dirs outside the bounds never become input partitions, and the
    residual row filter is exact (inclusive/exclusive respected)."""
    from datetime import datetime

    import numpy as np
    import pandas as pd

    from oakstore_spark import Store
    from oakstore_spark.sources.datasource import OakStoreDataSource, OakStoreReader
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

    spark.dataSource.register(OakStoreDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    base = tmp_path / "ds_push"
    s = Store(base_path=base, spark=spark)
    idx = pd.date_range("2019-01-01", periods=1100, freq="D")  # 2019-2022
    df = pd.DataFrame(
        {"Open": np.ones(1100), "High": np.ones(1100), "Low": np.ones(1100),
         "Close": np.ones(1100), "Volume": np.ones(1100, dtype=int)},
        index=idx,
    )
    s["P"] = df

    # unit-level: reader prunes year dirs from the pushed bounds
    reader = OakStoreReader(
        base / "items" / "P", "DATE",
        spark.read.format("oakstore").option("path", str(base))
        .option("key", "P").load().schema,
    )
    rest = list(reader.pushFilters([
        GreaterThanOrEqual(("DATE",), datetime(2020, 3, 1)),
        LessThan(("DATE",), datetime(2021, 2, 1)),
    ]))
    assert rest == []  # both absorbed
    years = {p.file_path.split("_oak_year=")[1].split("/")[0]
             for p in reader.partitions()}
    assert years == {"2020", "2021"}  # 2019 + 2022 pruned at planning

    # end-to-end: values match a pandas slice, bounds exact
    out = (
        spark.read.format("oakstore")
        .option("path", str(base)).option("key", "P").load()
        .filter((F.col("DATE") >= datetime(2020, 3, 1))
                & (F.col("DATE") < datetime(2021, 2, 1)))
    )
    expected = df.loc[datetime(2020, 3, 1):datetime(2021, 1, 31)]
    assert out.count() == len(expected)


def test_oakstore_datasource_cdc_stream(spark, tmp_path):
    """readStream over a manifest item: first availableNow batch replays
    the whole item; after an append, resuming from the SAME checkpoint
    delivers exactly the inserted rows (offsets = manifest versions)."""
    import numpy as np
    import pandas as pd

    from oakstore_spark import Store
    from oakstore_spark.sources.datasource import OakStoreDataSource

    spark.dataSource.register(OakStoreDataSource)
    base = tmp_path / "cdc_stream"
    s = Store(base_path=base, spark=spark, commit_protocol="manifest")
    idx = pd.date_range("2022-01-01", periods=50, freq="D")
    df = pd.DataFrame(
        {"Open": np.arange(50.0), "High": np.arange(50.0),
         "Low": np.arange(50.0), "Close": np.arange(50.0),
         "Volume": np.arange(50)},
        index=idx,
    )
    s["CDC"] = df

    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            spark.readStream.format("oakstore")
            .option("path", str(base)).option("key", "CDC").load()
            .writeStream.format("parquet")
            .option("path", sink).option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    out1 = spark.read.parquet(sink)
    assert out1.count() == 50  # genesis replay

    tail = df.iloc[-10:]
    fresh = tail.copy()
    fresh.index = fresh.index + pd.Timedelta(days=10)
    s["CDC"] += pd.concat([tail, fresh])  # 10 dupes dropped, 10 inserted

    run_once()
    out2 = spark.read.parquet(sink)
    assert out2.count() == 60  # exactly the 10 inserts arrived
    assert out2.select("DATE").distinct().count() == 60  # no replays


def test_oakstore_datasource_reads_evolved_schema(spark, tmp_path):
    """Pre-evolution parquet read through format('oakstore') must fill
    the declared default for the added column."""
    import numpy as np
    import pandas as pd

    from oakstore_spark import Store
    from oakstore_spark.sources.datasource import OakStoreDataSource

    spark.dataSource.register(OakStoreDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    base = tmp_path / "ds_evolved"
    s = Store(base_path=base, spark=spark)
    idx = pd.date_range("2023-01-01", periods=20, freq="D")
    df = pd.DataFrame(
        {"Open": np.ones(20), "High": np.ones(20), "Low": np.ones(20),
         "Close": np.ones(20), "Volume": np.ones(20, dtype=int)},
        index=idx,
    )
    s["EV"] = df
    s.add_column("ADJ", float, 3.5)
    out = (
        spark.read.format("oakstore")
        .option("path", str(base)).option("key", "EV").load()
    )
    pdf = out.toPandas()
    assert (pdf["ADJ"] == 3.5).all() and len(pdf) == 20


def test_oakstore_datasource_bulk_write(spark, tmp_path):
    """Distributed bulk create through df.write.format('oakstore'):
    the item commits atomically under the manifest protocol and reads
    back identically through the Store AND the batch DataSource."""
    from datetime import datetime

    import pytest

    from oakstore_spark import Store
    from oakstore_spark.sources.datasource import OakStoreDataSource

    spark.dataSource.register(OakStoreDataSource)
    base = tmp_path / "ds_write"
    Store(base_path=base, spark=spark)  # lays down _metadata.json

    df = (
        spark.range(0, 1000)
        .select(
            F.expr("timestamp'2020-01-01' + make_interval(0,0,0,id)").alias("DATE"),
            (F.col("id") * 1.0).alias("OPEN"),
            (F.col("id") * 1.0).alias("HIGH"),
            (F.col("id") * 1.0).alias("LOW"),
            (F.col("id") * 1.0).alias("CLOSE"),
            F.col("id").alias("VOLUME"),
        )
        .repartitionByRange(4, "DATE")
    )
    (
        df.write.format("oakstore").mode("append")
        .option("path", str(base)).option("key", "BULK").save()
    )
    s = Store(base_path=base, spark=spark)
    out = s["BULK"][:]
    assert len(out) == 1000
    assert out["VOLUME"].sum() == sum(range(1000))
    # readable through the DataSource batch reader too
    via_ds = (
        spark.read.format("oakstore")
        .option("path", str(base)).option("key", "BULK").load()
    )
    assert via_ds.count() == 1000
    # store semantics preserved: slice + append still work
    # rows 0..98 carry dates before 2020-04-09 (= 2020-01-01 + 99 days)
    assert len(s["BULK"][datetime(2020, 4, 9):]) == 1000 - 99
    with pytest.raises(Exception, match="already exists"):
        df.write.format("oakstore").mode("append").option(
            "path", str(base)
        ).option("key", "BULK").save()


def test_oakstore_cdc_vacuumed_offset_fails_loudly(spark, tmp_path):
    """A checkpoint pointing at a vacuumed manifest version must raise
    (silent fallback would re-emit the whole item as fresh inserts)."""
    import numpy as np
    import pandas as pd
    import pytest

    from oakstore_spark import Store
    from oakstore_spark.sources.datasource import OakStoreStreamReader

    base = tmp_path / "cdc_vac"
    s = Store(base_path=base, spark=spark, commit_protocol="manifest")
    idx = pd.date_range("2022-01-01", periods=30, freq="D")
    df = pd.DataFrame(
        {"Open": np.ones(30), "High": np.ones(30), "Low": np.ones(30),
         "Close": np.ones(30), "Volume": np.ones(30, dtype=int)},
        index=idx,
    )
    s["V"] = df
    s["V"] += pd.concat([df]).iloc[:10]  # v2 (no new rows, but a commit)
    s.vacuum("V", retention_sec=0)  # drops v1
    reader = OakStoreStreamReader(
        s._item_path("V"), "DATE",
        spark.read.parquet(str(s._item_path("V") / "_data")).schema,
    )
    with pytest.raises(ValueError, match="vacuumed"):
        reader.readBetweenOffsets({"version": 1}, {"version": 2})


def test_oakstore_bulk_write_empty_dataframe(spark, tmp_path):
    """Bulk-creating from an empty DataFrame commits an empty manifest
    that reads back as an empty item (not an error)."""
    from oakstore_spark import Store
    from oakstore_spark.sources.datasource import OakStoreDataSource

    spark.dataSource.register(OakStoreDataSource)
    base = tmp_path / "ds_empty"
    Store(base_path=base, spark=spark)
    empty = spark.createDataFrame(
        [], "DATE timestamp, OPEN double, HIGH double, LOW double, "
            "CLOSE double, VOLUME long"
    )
    (
        empty.write.format("oakstore").mode("append")
        .option("path", str(base)).option("key", "EMPTY").save()
    )
    s = Store(base_path=base, spark=spark)
    assert len(s["EMPTY"][:]) == 0


def test_export_jsonl_shards_roundtrip_and_sizing(spark, tmp_path):
    from oakstore_spark.sources import table
    from oakstore_spark.sources.ingest import export_jsonl_shards

    d = table(spark, "/root/testdata/sf0.01", "documents")
    out = str(tmp_path / "shards")
    export_jsonl_shards(d, out, target_shard_mb=1, compression="gzip")
    files = sorted(Path(out).glob("part-*.json.gz"))
    assert len(files) >= 1
    back = spark.read.json(out)
    assert back.count() == d.count()
    assert set(back.columns) == set(d.columns)
    # no shard wildly over target (2x tolerance per the estimator doc)
    assert max(f.stat().st_size for f in files) < 2 * 1024 * 1024


def test_json_ingest_quarantines_corrupt_records(spark, tmp_path):
    """Real feeds carry malformed lines: PERMISSIVE mode + an explicit
    _corrupt_record column keeps good rows flowing and quarantines the
    bad ones for inspection instead of failing the job (FAILFAST) or
    silently dropping them (DROPMALFORMED)."""
    src = tmp_path / "feed.jsonl"
    src.write_text(
        '{"id": 1, "v": 10.5}\n'
        "THIS IS NOT JSON\n"
        '{"id": 2, "v": 20.5}\n'
        '{"id": 3, "v": "not_a_number"}\n'
    )
    df = read_json(
        spark,
        str(src),
        schema="id bigint, v double, _corrupt_record string",
        mode="PERMISSIVE",
        columnNameOfCorruptRecord="_corrupt_record",
    ).cache()  # required: corrupt-record queries need the full row materialized
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert good.count() == 2
    assert sorted(r["id"] for r in good.collect()) == [1, 2]
    assert bad.count() == 2  # the non-JSON line and the bad cast
    assert any("NOT JSON" in r["_corrupt_record"] for r in bad.collect())
    df.unpersist()


def test_webdataset_shard_export_roundtrip(spark, tmp_path):
    """WebDataset tar export: every sample's members land adjacent in
    some shard under its key; text and binary columns round-trip
    byte-exact; the returned manifest matches what is on disk."""
    import tarfile

    from oakstore_spark.sources.ingest import export_webdataset_shards

    rows = [
        (f"doc{i:03d}", f"text body {i}", bytes([i % 256, 255 - i % 256]))
        for i in range(57)
    ]
    df = spark.createDataFrame(rows, "key string, text string, img binary")
    out = str(tmp_path / "wds")
    manifest = export_webdataset_shards(
        df, out, "key", shard_rows=20,
        content_cols={"text": "txt", "img": "png"},
    ).toPandas()

    assert manifest["n_samples"].sum() == 57
    seen = {}
    for shard in manifest["shard"]:
        with tarfile.open(f"{out}/{shard}") as tar:
            names = tar.getnames()
            # adjacency: the two members of each key are consecutive
            for i in range(0, len(names), 2):
                k1, k2 = names[i].split(".")[0], names[i + 1].split(".")[0]
                assert k1 == k2
            for m in tar.getmembers():
                seen[m.name] = tar.extractfile(m).read()
    for key, text, img in rows:
        assert seen[f"{key}.txt"] == text.encode()
        assert seen[f"{key}.png"] == img


def test_webdataset_read_back(spark, tmp_path):
    """export -> read_webdataset round-trip: every member returns with
    its key/ext and byte-exact content."""
    from oakstore_spark.sources.ingest import (
        export_webdataset_shards,
        read_webdataset,
    )

    rows = [(f"s{i}", f"body {i}", bytes([i, i + 1])) for i in range(13)]
    df = spark.createDataFrame(rows, "key string, text string, img binary")
    out = str(tmp_path / "wds2")
    export_webdataset_shards(
        df, out, "key", shard_rows=5, content_cols={"text": "txt", "img": "bin"}
    ).collect()

    back = read_webdataset(spark, out).collect()
    got = {(r.key, r.ext): bytes(r.content) for r in back}
    assert len(back) == 26
    for key, text, img in rows:
        assert got[(key, "txt")] == text.encode()
        assert got[(key, "bin")] == img


def test_xml_roundtrip_with_schema(spark, tmp_path):
    """Native XML source/sink: typed round-trip with an explicit schema
    (no inference pass) and nested-struct mapping."""
    from pyspark.sql import functions as F

    from oakstore_spark.sources.ingest import read_xml, write_xml

    df = spark.range(50).select(
        F.col("id"),
        F.concat(F.lit("name_"), F.col("id")).alias("name"),
        F.struct(
            (F.col("id") * 2).alias("x"), (F.col("id") % 7).alias("y")
        ).alias("meta"),
    )
    p = str(tmp_path / "xml_out")
    write_xml(df, p, row_tag="item", root_tag="items")
    back = read_xml(
        spark, p, row_tag="item",
        schema="id BIGINT, name STRING, meta STRUCT<x: BIGINT, y: BIGINT>",
    )
    a = sorted(df.collect(), key=lambda r: r["id"])
    b = sorted(back.collect(), key=lambda r: r["id"])
    assert a == b


def test_bloom_prefiltered_join_random_equivalence(spark):
    """Property: for random key sets (including keys on only one side
    and duplicate keys), the bloom-prefiltered join equals the plain
    join exactly — blooms may pass false positives into the join but
    never drop a matching row."""
    import random

    from pyspark.sql import functions as F

    from oakstore_spark.operators.joins import bloom_prefiltered_join

    rng = random.Random(13)
    for trial in range(3):
        big_rows = [(rng.randrange(0, 200), i) for i in range(2000)]
        small_rows = [(k, f"v{k}") for k in rng.sample(range(0, 300), 40)]
        big = spark.createDataFrame(big_rows, ["k", "payload"])
        small = spark.createDataFrame(small_rows, ["k", "tag"])
        # tiny bucket space forces real false positives through the filter
        got = sorted(
            map(tuple, bloom_prefiltered_join(
                big, small, "k", n_buckets=16
            ).collect())
        )
        ref = sorted(map(tuple, big.join(small, "k").collect()))
        assert got == ref, f"trial {trial} diverged"


def test_bloom_prefiltered_join_mixed_key_types(spark):
    """xxhash64 is type-sensitive: an int-vs-bigint key pair used to
    land in different buckets and get silently dropped (false negative)
    even though the equi-join coerces and matches them. The hash must
    use one common type on both sides."""
    import pytest

    from oakstore_spark.operators.joins import bloom_prefiltered_join

    big = spark.createDataFrame([(k, k * 10) for k in range(50)], "k int, payload long")
    small = spark.createDataFrame([(5, "a"), (17, "b")], "k long, tag string")
    got = sorted(
        map(tuple, bloom_prefiltered_join(big, small, "k", n_buckets=1 << 20).collect())
    )
    ref = sorted(map(tuple, big.join(small, "k").collect()))
    assert got == ref and len(got) == 2

    # int vs double keys: both numeric, hash on double
    small_d = spark.createDataFrame([(5.0, "a")], "k double, tag string")
    got_d = sorted(map(tuple, bloom_prefiltered_join(big, small_d, "k").collect()))
    assert got_d == sorted(map(tuple, big.join(small_d, "k").collect()))
    assert len(got_d) == 1

    # incompatible types are an error, not a silent empty result
    small_s = spark.createDataFrame([("5", "a")], "k string, tag string")
    with pytest.raises(ValueError, match="incompatible"):
        bloom_prefiltered_join(big, small_s, "k")


def test_bloom_prefiltered_join_rejects_outer_how(spark):
    """The semi pre-reduction drops big-side rows an outer/anti join
    must keep — those ``how`` values are rejected, not silently wrong."""
    import pytest

    from oakstore_spark.operators.joins import bloom_prefiltered_join

    big = spark.createDataFrame([(1, "x")], ["k", "payload"])
    small = spark.createDataFrame([(1, "y")], ["k", "tag"])
    for bad in ("left", "left_outer", "full", "right", "left_anti", "anti"):
        with pytest.raises(ValueError, match="inner/semi"):
            bloom_prefiltered_join(big, small, "k", how=bad)
    # the sound hows still work
    assert bloom_prefiltered_join(big, small, "k", how="inner").count() == 1
    assert bloom_prefiltered_join(big, small, "k", how="leftsemi").count() == 1
