"""WARC (Web ARChive) container source/sink — the format web crawls
are actually delivered in (Common Crawl, Internet Archive). Implemented
from the PUBLIC ISO 28500 / WARC 1.0 specification: a WARC file is a
concatenation of records, each

    WARC/1.0\r\n
    <header-name>: <value>\r\n ...          (named fields)
    Content-Length: <n>\r\n                  (mandatory, octets)
    \r\n
    <n octets of payload>
    \r\n\r\n                                 (record boundary)

``compress=True`` writes ONE GZIP MEMBER PER RECORD, concatenated —
the Common Crawl convention (readers can seek to a member and inflate
just that record; stdlib ``gzip.decompress`` inflates all members of a
file transparently). Members are built with ``mtime=0`` so shard bytes
are deterministic.

Spark shape (same discipline as ``sources/avro.py``): the writer is
``foreachPartition`` — every task serializes its own ``part-*.warc``
shard, no driver funnel; the reader lists ``*.warc[.gz]`` via
``binaryFile`` (listing-time glob pruning) and parses one file per
task inside ``mapInPandas`` (Arrow batches out). Header parsing is
byte-level and case-insensitive per spec; a structurally broken record
raises with the file and offset named (a crawl archive that lies about
Content-Length should fail loudly, not truncate silently).

``WARC-Date`` is the W3C-profile ISO-8601 UTC instant; this module
round-trips it to/from ``warc_date_us`` (BIGINT epoch microseconds) so
the DataFrame never carries timezone-ambiguous timestamps (same
epoch-integers-on-the-wire rule as ``sources/avro.py``).

Reference parity: the reference (store.py:1-267) has no source surface
beyond parquet; EXT format mandated by the LLM-pipeline brief.
"""

from __future__ import annotations

import gzip
import os
import uuid
from collections.abc import Iterator
from datetime import datetime, timezone
from pathlib import Path

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WARC_SCHEMA = T.StructType(
    [
        T.StructField("record_id", T.StringType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date_us", T.LongType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

_CRLF = b"\r\n"


def _format_warc_date(us: int) -> str:
    dt = datetime.fromtimestamp(us // 1_000_000, tz=timezone.utc)
    base = dt.strftime("%Y-%m-%dT%H:%M:%S")
    frac = us % 1_000_000
    if frac:
        return f"{base}.{frac:06d}Z"
    return base + "Z"


def _parse_warc_date(s: str) -> int:
    s = s.strip()
    if not s.endswith("Z"):
        raise ValueError(f"WARC-Date not UTC ('Z'): {s!r}")
    body = s[:-1]
    frac_us = 0
    if "." in body:
        body, frac = body.split(".", 1)
        # spec allows 1..9 fractional digits; micros is our precision
        frac_us = int(frac[:6].ljust(6, "0"))
        if len(frac) > 6 and int(frac[6:]) != 0:
            raise ValueError(f"sub-microsecond WARC-Date: {s!r}")
    dt = datetime.strptime(body, "%Y-%m-%dT%H:%M:%S").replace(
        tzinfo=timezone.utc
    )
    return int(dt.timestamp()) * 1_000_000 + frac_us


def _render_record(row: dict) -> bytes:
    payload = row["payload"] or b""
    rid = row["record_id"] or f"<urn:uuid:{uuid.uuid4()}>"
    if not rid.startswith("<"):
        rid = f"<{rid}>"
    headers = [
        ("WARC-Type", row["warc_type"] or "resource"),
        ("WARC-Record-ID", rid),
        ("WARC-Date", _format_warc_date(int(row["warc_date_us"]))),
    ]
    if row.get("target_uri"):
        headers.append(("WARC-Target-URI", row["target_uri"]))
    if row.get("content_type"):
        headers.append(("Content-Type", row["content_type"]))
    headers.append(("Content-Length", str(len(payload))))
    head = b"WARC/1.0\r\n" + b"".join(
        f"{k}: {v}".encode() + _CRLF for k, v in headers
    )
    return head + _CRLF + payload + _CRLF + _CRLF


def write_warc(
    df: DataFrame, path: str, compress: bool = False
) -> int:
    """Write ``df`` (``WARC_SCHEMA`` columns; ``content_length`` is
    recomputed from the payload, so it may be omitted) as a directory
    of ``part-*.warc`` / ``part-*.warc.gz`` shards — one shard per
    task via ``foreachPartition``, no driver funnel. Returns the shard
    count.

    Overwrite semantics (matching ``write_avro``): stale
    ``part-*.warc`` / ``part-*.warc.gz`` shards already in ``path``
    are removed first, so a rerun replaces the directory's contents
    instead of silently mixing old and new records on read."""
    os.makedirs(path, exist_ok=True)
    for stale in Path(path).iterdir():
        if stale.name.startswith("part-") and (
            stale.name.endswith(".warc") or stale.name.endswith(".warc.gz")
        ):
            stale.unlink()
    cols = [
        "record_id",
        "warc_type",
        "target_uri",
        "warc_date_us",
        "content_type",
        "payload",
    ]
    have = [c for c in cols if c in df.columns]
    proj = df.select(*have)
    ext = "warc.gz" if compress else "warc"

    def _write_partition(rows) -> None:
        it = iter(rows)
        try:
            first = next(it)
        except StopIteration:
            return
        import itertools
        import uuid as _uuid

        fname = os.path.join(path, f"part-{_uuid.uuid4().hex}.{ext}")
        tmp = fname + ".tmp"
        with open(tmp, "wb") as fh:
            for r in itertools.chain([first], it):
                d = r.asDict()
                for c in cols:
                    d.setdefault(c, None)
                rec = _render_record(d)
                if compress:
                    rec = gzip.compress(rec, mtime=0)
                fh.write(rec)
        os.rename(tmp, fname)

    proj.foreachPartition(_write_partition)
    return len(
        [p for p in Path(path).iterdir() if p.suffix in (".warc", ".gz")]
    )


def _parse_warc_bytes(buf: bytes, origin: str) -> list[dict]:
    if buf[:2] == b"\x1f\x8b":
        buf = gzip.decompress(buf)  # all members, per stdlib
    out: list[dict] = []
    pos = 0
    n = len(buf)
    while pos < n:
        # tolerate extra blank separators between records
        while pos < n and buf[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        eol = buf.find(_CRLF, pos)
        if eol < 0 or not buf[pos:eol].startswith(b"WARC/"):
            raise ValueError(
                f"{origin}: expected WARC version line at offset {pos}"
            )
        head_end = buf.find(_CRLF + _CRLF, eol)
        if head_end < 0:
            raise ValueError(
                f"{origin}: unterminated header block at offset {pos}"
            )
        headers: dict[str, str] = {}
        for line in buf[eol + 2 : head_end].split(_CRLF):
            k, _, v = line.decode("utf-8", "replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        if "content-length" not in headers:
            raise ValueError(
                f"{origin}: record at offset {pos} missing Content-Length"
            )
        clen = int(headers["content-length"])
        body_start = head_end + 4
        body_end = body_start + clen
        if body_end > n:
            raise ValueError(
                f"{origin}: payload overruns file at offset {pos} "
                f"(Content-Length {clen})"
            )
        rid = headers.get("warc-record-id", "")
        if rid.startswith("<") and rid.endswith(">"):
            rid = rid[1:-1]
        out.append(
            {
                "record_id": rid,
                "warc_type": headers.get("warc-type", "resource"),
                "target_uri": headers.get("warc-target-uri"),
                "warc_date_us": _parse_warc_date(headers["warc-date"])
                if "warc-date" in headers
                else None,
                "content_type": headers.get("content-type"),
                "content_length": clen,
                "payload": buf[body_start:body_end],
            }
        )
        pos = body_end
    return out


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: list[str] | None = None,
) -> DataFrame:
    """Read a directory (or glob) of ``*.warc`` / ``*.warc.gz`` files
    into a ``WARC_SCHEMA`` DataFrame — whole files via ``binaryFile``
    (one file per task; the glob prunes at listing time), parsed in an
    Arrow-batched kernel. ``record_types`` filters by ``WARC-Type``
    (e.g. ``["response", "resource"]``) INSIDE the kernel, before
    anything is emitted — a conversion-filter pushdown (Catalyst
    predicate pushdown cannot reach inside the container format)."""
    want = {t.lower() for t in record_types} if record_types else None
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        .select("path", "content")
    )

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for origin, content in zip(pdf["path"], pdf["content"]):
                for rec in _parse_warc_bytes(bytes(content), origin):
                    if want is None or rec["warc_type"].lower() in want:
                        rows.append(rec)
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_SCHEMA.fields]
            )

    return files.mapInPandas(_parse, WARC_SCHEMA)


WET_SCHEMA = T.StructType(
    [
        T.StructField("record_id", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("warc_date_us", T.LongType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """Read WET-style text extracts — the Common Crawl delivery most
    text pipelines actually consume: WARC containers whose payload
    records are ``WARC-Type: conversion`` with ``text/plain`` UTF-8
    bodies (the extracted page text), led by a ``warcinfo`` header
    record. Returns ``(record_id, url, warc_date_us, content_length,
    text)``.

    One FUSED Arrow kernel per file: parse, keep only ``conversion``
    records (warcinfo/request/response skipped in-kernel, the same
    conversion-filter pushdown as :func:`read_warc`), and decode the
    payload to text right there — payload bytes cross the Arrow
    boundary exactly once and non-UTF-8 bytes degrade to U+FFFD
    instead of erroring (real crawl extracts carry stray bytes;
    ``content_length`` still reports the ORIGINAL octet count)."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        .select("path", "content")
    )

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for origin, content in zip(pdf["path"], pdf["content"]):
                for rec in _parse_warc_bytes(bytes(content), origin):
                    if rec["warc_type"].lower() != "conversion":
                        continue
                    rows.append(
                        {
                            "record_id": rec["record_id"],
                            "url": rec["target_uri"],
                            "warc_date_us": rec["warc_date_us"],
                            "content_length": rec["content_length"],
                            "text": rec["payload"].decode(
                                "utf-8", "replace"
                            ),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in WET_SCHEMA.fields]
            )

    return files.mapInPandas(_parse, WET_SCHEMA)
