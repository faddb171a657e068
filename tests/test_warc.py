"""WARC container source/sink: golden bytes, roundtrips (plain +
per-record-gzip), date precision, type filtering, corruption."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from oakstore_spark.sources.warc import (
    _format_warc_date,
    _parse_warc_bytes,
    _parse_warc_date,
    _render_record,
    read_warc,
    write_warc,
)


def _rec(**kw):
    d = {
        "record_id": "urn:x:1",
        "warc_type": "resource",
        "target_uri": "http://t.test/1",
        "warc_date_us": 1_700_000_000_000_000,
        "content_type": "text/plain",
        "payload": b"hello",
    }
    d.update(kw)
    return d


def test_golden_record_bytes():
    raw = _render_record(_rec())
    assert raw.startswith(b"WARC/1.0\r\n")
    assert b"WARC-Record-ID: <urn:x:1>\r\n" in raw
    assert b"Content-Length: 5\r\n" in raw
    assert raw.endswith(b"\r\n\r\nhello\r\n\r\n".replace(b"\r\n\r\nhello", b"\r\nhello", 1))
    # header block terminates with a blank line before the payload
    head, _, rest = raw.partition(b"\r\n\r\n")
    assert rest == b"hello\r\n\r\n"


def test_parse_roundtrip_multi_record_and_gzip_members():
    recs = [
        _rec(),
        _rec(record_id="urn:x:2", payload=b"\x00\x01binary\xff",
             warc_date_us=1_700_000_000_123_456),
    ]
    blob = b"".join(_render_record(r) for r in recs)
    parsed = _parse_warc_bytes(blob, "mem")
    assert [p["record_id"] for p in parsed] == ["urn:x:1", "urn:x:2"]
    assert parsed[1]["payload"] == b"\x00\x01binary\xff"
    assert parsed[1]["warc_date_us"] == 1_700_000_000_123_456
    # per-record gzip members concatenated (Common Crawl layout)
    gz = b"".join(gzip.compress(_render_record(r), mtime=0) for r in recs)
    assert _parse_warc_bytes(gz, "mem") == parsed


def test_date_format_parse_inverse():
    for us in (0, 1_700_000_000_000_000, 1_700_000_000_000_001,
               1_700_000_000_999_999):
        assert _parse_warc_date(_format_warc_date(us)) == us
    assert _format_warc_date(1_700_000_000_000_000) == (
        "2023-11-14T22:13:20Z"
    )
    with pytest.raises(ValueError):
        _parse_warc_date("2023-11-14T22:13:20")  # no Z
    with pytest.raises(ValueError):
        _parse_warc_date("2023-11-14T22:13:20.1234567891Z")  # sub-us


def test_corruption_raises_with_origin():
    good = _render_record(_rec())
    with pytest.raises(ValueError, match="version line"):
        _parse_warc_bytes(b"HTTP/1.1 200 OK\r\n\r\n", "f1")
    with pytest.raises(ValueError, match="overruns"):
        _parse_warc_bytes(good[:-9], "f2")  # truncated payload
    bad = good.replace(b"Content-Length: 5", b"X-Len: 5")
    with pytest.raises(ValueError, match="Content-Length"):
        _parse_warc_bytes(bad, "f3")


def test_write_read_spark_roundtrip(spark, tmp_path):
    rows = [
        ("urn:s:%d" % i, "resource" if i % 2 else "metadata",
         f"http://t.test/{i}", 1_600_000_000_000_000 + i,
         "text/plain", bytes(f"payload-{i}", "ascii"))
        for i in range(20)
    ]
    df = spark.createDataFrame(
        rows,
        "record_id string, warc_type string, target_uri string, "
        "warc_date_us long, content_type string, payload binary",
    ).repartition(3)
    for compress in (False, True):
        path = str(tmp_path / f"w{int(compress)}")
        n_shards = write_warc(df, path, compress=compress)
        assert n_shards >= 1
        back = read_warc(spark, path)
        got = {r["record_id"]: r for r in back.collect()}
        assert len(got) == 20
        for i in range(20):
            r = got[f"urn:s:{i}"]
            assert r["payload"] == bytes(f"payload-{i}", "ascii")
            assert r["warc_date_us"] == 1_600_000_000_000_000 + i
            assert r["content_length"] == len(f"payload-{i}")
            assert r["target_uri"] == f"http://t.test/{i}"
    # conversion-filter pushdown: type filter applies inside the kernel
    only = read_warc(spark, str(tmp_path / "w1"), record_types=["metadata"])
    types = {r["warc_type"] for r in only.collect()}
    assert types == {"metadata"}
    assert only.count() == 10


def test_write_warc_overwrites_stale_shards(spark, tmp_path):
    """Rerunning write_warc into an existing directory must REPLACE
    its contents (write_avro's overwrite semantics), not append: stale
    part shards of either extension are removed first, so read_warc
    never returns old+new records mixed (ADVICE r8)."""
    schema = (
        "record_id string, warc_type string, target_uri string, "
        "warc_date_us long, content_type string, payload binary"
    )
    mk = lambda tag, n: spark.createDataFrame(  # noqa: E731
        [
            (f"urn:{tag}:{i}", "resource", f"http://t.test/{i}",
             1_600_000_000_000_000 + i, "text/plain",
             bytes(f"{tag}-{i}", "ascii"))
            for i in range(n)
        ],
        schema,
    ).repartition(3)
    path = str(tmp_path / "w")
    write_warc(mk("old", 9), path, compress=True)  # .warc.gz shards
    n = write_warc(mk("new", 4), path)  # uncompressed rerun
    got = sorted(r["record_id"] for r in read_warc(spark, path).collect())
    assert got == [f"urn:new:{i}" for i in range(4)]
    assert 1 <= n <= 3  # shard count reflects ONLY the rerun's tasks


def test_read_warc_external_writer_layout(spark, tmp_path):
    """A hand-built file (headers in a different order, extra header
    fields, no angle brackets on the id) still parses — spec fields
    are named, not positional."""
    body = b"external"
    raw = (
        b"WARC/1.0\r\n"
        b"Content-Length: 8\r\n"
        b"WARC-Date: 2020-01-02T03:04:05Z\r\n"
        b"X-Custom: whatever\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Record-ID: urn:ext:9\r\n"
        b"\r\n" + body + b"\r\n\r\n"
    )
    p = tmp_path / "ext"
    p.mkdir()
    (p / "file.warc").write_bytes(raw)
    [r] = read_warc(spark, str(p)).collect()
    assert r["record_id"] == "urn:ext:9"
    assert r["warc_type"] == "response"
    assert r["payload"] == body
    assert r["warc_date_us"] == 1_577_934_245_000_000


def test_streaming_warc_ingest_foreachbatch(spark, tmp_path):
    """Streaming x WARC composition: a binaryFile FILE STREAM of WARC
    shards parsed micro-batch by micro-batch (foreachBatch ->
    _parse_warc_bytes -> parquet sink). The sink must equal a batch
    read of the same shards, and a late-arriving shard is picked up
    incrementally by the next availableNow run."""
    from pyspark.sql import functions as F

    from oakstore_spark.sources.warc import (
        WARC_SCHEMA,
        _render_record,
        read_warc,
    )

    src = tmp_path / "warc_src"
    src.mkdir()

    def write_shard(sid: int, n: int) -> None:
        blob = b"".join(
            _render_record(
                _rec(
                    record_id=f"urn:s{sid}:{i}",
                    payload=f"s{sid}-{i}".encode(),
                    warc_date_us=1_600_000_000_000_000 + sid * 100 + i,
                )
            )
            for i in range(n)
        )
        (src / f"shard-{sid}.warc").write_bytes(blob)

    for sid in range(3):
        write_shard(sid, sid + 1)

    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run_once() -> None:
        stream = (
            spark.readStream.format("binaryFile")
            .option("pathGlobFilter", "*.warc")
            .schema(
                "path string, modificationTime timestamp, "
                "length long, content binary"
            )
            .load(str(src))
        )

        def parse_batch(batch_df, batch_id):
            import pandas as pd

            from oakstore_spark.sources.warc import _parse_warc_bytes

            def kernel(batches):
                for pdf in batches:
                    rows = []
                    for path, content in zip(pdf["path"], pdf["content"]):
                        rows.extend(_parse_warc_bytes(bytes(content), path))
                    yield pd.DataFrame(
                        rows,
                        columns=[f.name for f in WARC_SCHEMA.fields],
                    )

            batch_df.select("path", "content").mapInPandas(
                kernel, WARC_SCHEMA
            ).write.mode("append").parquet(sink)

        q = (
            stream.writeStream.foreachBatch(parse_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    got = spark.read.parquet(sink)
    assert got.count() == 1 + 2 + 3
    batch = read_warc(spark, str(src))
    assert (
        got.select("record_id", "payload").exceptAll(
            batch.select("record_id", "payload")
        ).count()
        == 0
    )
    # late shard: only the new records append
    write_shard(9, 2)
    run_once()
    got2 = spark.read.parquet(sink)
    assert got2.count() == 8
    assert got2.where(F.col("record_id").startswith("urn:s9:")).count() == 2


def test_read_wet_conversion_records_only(spark, tmp_path):
    """read_wet keeps ONLY conversion records (warcinfo/resource noise
    skipped in-kernel), decodes UTF-8 payloads with replacement for
    stray bytes, and reports the ORIGINAL octet count."""
    from oakstore_spark.sources.warc import read_wet

    schema = (
        "record_id string, warc_type string, target_uri string, "
        "warc_date_us long, content_type string, payload binary"
    )
    rows = [
        ("urn:info:0", "warcinfo", None, 1_600_000_000_000_000,
         "application/warc-fields", b"software: oak"),
        ("urn:wet:1", "conversion", "http://x.test/1",
         1_600_000_000_000_001, "text/plain",
         "héllo wörld".encode("utf-8")),
        ("urn:wet:2", "conversion", "http://x.test/2",
         1_600_000_000_000_002, "text/plain",
         b"ok \xff stray"),  # invalid UTF-8 byte -> U+FFFD
        ("urn:resp:3", "response", "http://x.test/3",
         1_600_000_000_000_003, "text/html", b"<html>noise</html>"),
    ]
    df = spark.createDataFrame(rows, schema).coalesce(1)
    path = str(tmp_path / "wet")
    write_warc(df, path, compress=True)
    got = {r["record_id"]: r for r in read_wet(spark, path).collect()}
    assert set(got) == {"urn:wet:1", "urn:wet:2"}
    assert got["urn:wet:1"]["text"] == "héllo wörld"
    assert got["urn:wet:1"]["url"] == "http://x.test/1"
    assert got["urn:wet:1"]["warc_date_us"] == 1_600_000_000_000_001
    # original octet count, not post-decode char count
    assert got["urn:wet:1"]["content_length"] == len(
        "héllo wörld".encode("utf-8")
    )
    assert got["urn:wet:2"]["text"] == "ok � stray"
    assert got["urn:wet:2"]["content_length"] == len(b"ok \xff stray")
