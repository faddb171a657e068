"""CSV/JSON ingest helpers — the EXT source formats beyond parquet
(SURVEY.md §2 sources row; the reference reads only parquet plus a
test-only yfinance download, /root/reference/oakstore/store.py:260-264,
testing/yfinance.py:6-19).

Always pass an explicit schema in production: schema inference reads the
data twice and infers from a sample — on 100 TB that is both a full
extra scan and a correctness risk (a late file with a wider type breaks
the inferred schema).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV scan. With an explicit schema the read is single-pass and
    filters/pruning push into the scan like any other source."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """JSON-lines scan (one object per line — the splittable layout;
    multiLine JSON is not splittable and caps parallelism at one task
    per file)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def read_orc(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """ORC scan — same predicate-pushdown/column-pruning story as
    parquet (ORC carries stripe-level min/max + bloom indexes that
    Spark's OrcScan uses for filter skipping)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.orc(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    mode: str = "errorifexists",
    **options: str,
) -> None:
    """Uniform sink: parquet (default) / orc / csv / json, optionally
    hive-partitioned. Partition columns should be low-cardinality
    (a high-cardinality partitionBy creates a small-file explosion)."""
    writer = df.write.format(fmt).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)


def export_jsonl_shards(
    df: DataFrame,
    path: str,
    target_shard_mb: int = 64,
    compression: str = "gzip",
    sample_rows: int = 2_000,
    seed: int = 42,
) -> int:
    """Training-data delivery: write the DataFrame as size-targeted
    compressed JSONL shards (the layout data loaders stream). Spark's
    writer caps files by ROW count, so the byte target is translated:
    a bounded sample estimates the mean serialized row size, and
    ``maxRecordsPerFile`` is set to ``target_bytes / mean_row_bytes``
    (shards land within ~2x of target under realistic size variance —
    exact byte packing would force a single-writer pass). Rows are
    spread with a round-robin repartition sized to the estimated total
    so shard count, not input partitioning, drives file layout.
    Returns the estimated rows-per-shard cap used."""
    n = df.count()
    if n == 0:
        df.write.mode("overwrite").option("compression", compression).json(path)
        return 0
    sample = df.limit(sample_rows).toJSON().collect()
    mean_row = max(sum(len(r) + 1 for r in sample) / max(len(sample), 1), 1.0)
    if compression == "gzip":
        mean_row /= 4  # conservative text-compression estimate
    rows_per_shard = max(int(target_shard_mb * 1024 * 1024 / mean_row), 1)
    n_shards = max((n + rows_per_shard - 1) // rows_per_shard, 1)
    (
        df.repartition(int(n_shards))
        .write.mode("overwrite")
        .option("compression", compression)
        .option("maxRecordsPerFile", rows_per_shard)
        .json(path)
    )
    return rows_per_shard


def read_binary_files(
    spark,
    path: str,
    glob: str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """Opaque-media ingest via Spark's ``binaryFile`` source: one row
    per file with (path, modificationTime, length, content BINARY) —
    the front door for image/audio/video corpora, feeding the
    multimodal decode kernels (operators/multimodal.py) downstream.

    Scale notes: ``pathGlobFilter`` prunes non-matching files at LISTING
    time (they are never opened); each file must fit in one task
    (the source does not split files), which matches media objects —
    shard giant archives upstream. Listing parallelizes across the
    driver-side thread pool and file reads across executors."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return reader.load(path)


def export_webdataset_shards(
    df,
    path: str,
    key_col: str,
    shard_rows: int = 1000,
    content_cols: dict | None = None,
):
    """Training-data delivery in the WebDataset layout: ``.tar`` shards
    whose members are ``<key>.<ext>`` files, grouped so one sample's
    files sit adjacent — the format multimodal data loaders stream
    sequentially (no random access, object-store friendly).

    ``content_cols`` maps column -> member extension, e.g.
    ``{"text": "txt", "img": "png", "meta": "json"}``; binary columns
    write raw bytes, everything else utf-8. Rows hash-partition by key
    into ``ceil(n/shard_rows)`` shards; EACH TASK writes its own tar
    via ``foreachPartition`` (no driver funnel, no shuffle beyond the
    one repartition), named ``shard-{partition:05d}.tar``. Returns a
    manifest DataFrame (shard, n_samples, n_bytes) read back from the
    sidecar files each task drops next to its tar.
    """
    import json
    import math

    from pyspark.sql import types as T

    cols = content_cols or {"text": "txt"}
    n = df.count()
    n_shards = max(1, math.ceil(n / shard_rows))
    out_dir = Path(path)
    out_dir.mkdir(parents=True, exist_ok=True)
    sel = df.select(key_col, *cols.keys()).repartition(n_shards, key_col)

    col_ext = list(cols.items())

    def write_shard(rows) -> None:
        import io
        import tarfile

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        tar_path = out_dir / f"shard-{pid:05d}.tar"
        n_samples = 0
        with tarfile.open(tar_path, "w") as tar:
            for row in rows:
                key = str(row[key_col])
                for col, ext in col_ext:
                    val = row[col]
                    if val is None:
                        continue
                    payload = (
                        bytes(val) if isinstance(val, (bytes, bytearray))
                        else str(val).encode("utf-8")
                    )
                    info = tarfile.TarInfo(name=f"{key}.{ext}")
                    info.size = len(payload)
                    tar.addfile(info, io.BytesIO(payload))
                n_samples += 1
        if n_samples == 0:
            tar_path.unlink()  # no empty shards
            return
        man = out_dir / f".manifest-{pid:05d}.json"
        man.write_text(json.dumps(
            {"shard": tar_path.name, "n_samples": n_samples,
             "n_bytes": tar_path.stat().st_size}
        ))

    sel.foreachPartition(write_shard)

    spark = df.sparkSession
    entries = []
    for man in sorted(out_dir.glob(".manifest-*.json")):
        entries.append(json.loads(man.read_text()))
    schema = T.StructType([
        T.StructField("shard", T.StringType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ])
    return spark.createDataFrame(
        [(e["shard"], e["n_samples"], e["n_bytes"]) for e in entries], schema
    )


def read_webdataset(spark, path: str) -> DataFrame:
    """Ingest WebDataset tar shards back into a relation: one row per
    member, (shard, key, ext, content binary). Shards arrive whole
    through the ``binaryFile`` source (a shard is one task — exactly the
    sequential-read contract the format is built for) and untar in an
    Arrow-batched kernel; downstream can pivot exts to columns or route
    members to the multimodal decoders. No shuffle; listing-time glob
    keeps non-tar files out of the scan."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    out_schema = T.StructType([
        T.StructField("shard", T.StringType()),
        T.StructField("key", T.StringType()),
        T.StructField("ext", T.StringType()),
        T.StructField("content", T.BinaryType()),
    ])

    def untar(batches):
        import io
        import tarfile

        import pandas as pd

        for pdf in batches:
            shards, keys, exts, contents = [], [], [], []
            for p, blob in zip(pdf["path"], pdf["content"]):
                name = p.rsplit("/", 1)[-1]
                with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as tar:
                    for m in tar.getmembers():
                        if not m.isfile():
                            continue
                        stem, _, ext = m.name.rpartition(".")
                        shards.append(name)
                        keys.append(stem or m.name)
                        exts.append(ext)
                        contents.append(tar.extractfile(m).read())
            yield pd.DataFrame(
                {"shard": shards, "key": keys, "ext": exts, "content": contents}
            )

    files = read_binary_files(spark, path, glob="*.tar")
    return files.select("path", "content").mapInPandas(untar, out_schema)


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str = "row",
    schema: T.StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Native XML scan (built into Spark 4 — no spark-xml package):
    every ``row_tag`` element becomes a row; nested elements/attributes
    map to structs. Schema inference needs an extra pass, so production
    ingest should pass an explicit ``schema`` like the CSV/JSON paths.
    XML splits per FILE (not per block) — shard large feeds into many
    files for parallelism."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    mode: str = "error",
) -> None:
    """Native XML sink (one ``row_tag`` element per row under
    ``root_tag``) — the interchange format for feeds that still speak
    XML; pair with :func:`read_xml` for byte-stable round-trips."""
    (
        df.write.format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .mode(mode)
        .save(path)
    )
