"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step is STUBBED: the real image/audio libraries are not in
this container, so each extractor tries the real library and falls back
to a DETERMINISTIC FAKE derived from the content bytes (clearly marked
below). Everything Spark-side is real and tested: schemas, the
mapInPandas batch contract (iterator of pandas DataFrames in/out), and
partition behavior. Swapping the fake for a real decoder changes only
the inner per-batch function.

Scale design: binary payloads never shuffle — extractors run map-side on
whatever partitioning the source has; outputs are small typed rows. For
100 TB of media you would store content in the parquet as binary chunks
(or pointers to object storage) and tune
``spark.sql.files.maxPartitionBytes`` so a task's batch of payloads fits
executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_FEATURE_DIM = 8

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)

AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)


def extract_image_features(
    df: DataFrame, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """Decode + featurize image binaries, Arrow-batched.

    Tries PIL for real decode; falls back to a DETERMINISTIC FAKE
    (width/height/features derived from the content digest) so the
    pipeline stays runnable (and testable) without image libs.

    The batch closure is fully self-contained (no references to this
    module) so cloudpickle ships it by value — Python workers don't need
    oakstore_spark importable on their path.
    """
    id_name, content_name = id_col, content_col
    dim = IMAGE_FEATURE_DIM

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        try:
            from PIL import Image  # noqa: F401

            real = True
        except ImportError:
            real = False
        for pdf in it:
            rows = []
            for mid, content in zip(pdf[id_name], pdf[content_name]):
                content = bytes(content)
                if real:
                    # real path (untested in this container)
                    import io

                    from PIL import Image

                    img = Image.open(io.BytesIO(content))
                    w, h = img.size
                    feats = [float(x) / 255.0 for x in img.resize((1, dim)).convert("L").getdata()]
                else:
                    digest = _hashlib.md5(content).digest()
                    w = 64 + digest[0] % 192
                    h = 64 + digest[1] % 192
                    feats = [b / 255.0 for b in digest[2 : 2 + dim]]
                rows.append((int(mid), w, h, len(content), feats))
            yield _pd.DataFrame(
                rows, columns=["media_id", "width", "height", "n_bytes", "features"]
            )

    return df.select(
        F.col(id_col).alias(id_name), F.col(content_col).alias(content_name)
    ).mapInPandas(batches, IMAGE_FEATURES_SCHEMA)


def sample_video_frames(
    df: DataFrame,
    every_n: int = 10,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """One output row per sampled frame (1-to-many mapInPandas).

    FAKE frame extraction: the 'video' is treated as fixed-size chunks of
    the byte stream; each sampled chunk's md5 stands in for the decoded
    frame. Real path would use pyav/ffmpeg over the same contract.
    """
    chunk = 4096

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in it:
            rows = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                content = bytes(content)
                n_frames = max(len(content) // chunk, 1)
                for idx in range(0, n_frames, every_n):
                    frame = content[idx * chunk : (idx + 1) * chunk]
                    rows.append((int(mid), idx, _hashlib.md5(frame).hexdigest()))
            yield _pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_md5"])

    return df.select(id_col, content_col).mapInPandas(batches, FRAME_SCHEMA)


def audio_metadata(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    assumed_rate: int = 16000,
) -> DataFrame:
    """Duration/sample-rate metadata. FAKE: assumes 16-bit mono PCM at
    ``assumed_rate`` — duration = n_bytes / (2 * rate). Real path:
    soundfile/librosa behind the same schema."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in it:
            n = pdf[content_col].map(lambda b: len(bytes(b)))
            yield _pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "n_bytes": n.astype("int64"),
                    "duration_sec": n / (2.0 * assumed_rate),
                    "sample_rate": assumed_rate,
                }
            )

    return df.select(id_col, content_col).mapInPandas(batches, AUDIO_META_SCHEMA)
