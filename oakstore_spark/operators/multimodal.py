"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, processed via Arrow-batched ``mapInPandas``.

Decode is REAL, pure-stdlib, for every format in this module's ladder:
PNG (zlib inflate + all five scanline filters, 8-bit gray/RGB/RGBA),
baseline JPEG (Huffman entropy decode → dequant → IDCT; luma via
``decode_jpeg_pixels`` — capped at 2 MP/frame — and full RGB via
``decode_jpeg_rgb``), RIFF/WAV (header metadata AND int16 sample
decode, feeding waveform/spectral/silence/resample features), and
MJPEG-AVI (movi chunk walk to true frame payloads, composed with the
JPEG decoder for per-frame pixel statistics). Spec-conformant gray and
color JPEG encoders, a PNG writer, a PCM16 RIFF writer, and an MJPEG
muxer generate test fixtures. PIL is tried for formats outside the
ladder when installed; the DETERMINISTIC FAKE derived from the content
digest (clearly marked below) remains only as the final fallback so
every operator stays total over arbitrary bytes. Everything Spark-side
is real and tested: schemas, the mapInPandas batch contract (iterator
of pandas DataFrames in/out), and partition behavior.

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
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("bits", T.IntegerType()),
        T.StructField("codec", T.StringType()),
    ]
)


def decode_wav(data: bytes):
    """REAL pure-stdlib RIFF/WAV header decode: returns
    ``(n_channels, sample_rate, bits, n_frames, duration_sec)`` for a
    PCM WAVE payload, or ``None`` for anything else (non-RIFF bytes,
    non-PCM codecs, corrupt/truncated chunks — same graceful-degrade
    contract as decode_png). Chunk walk per the RIFF spec: 'fmt ' gives
    channels/rate/bits/block-align, 'data' gives the payload length;
    duration = frames / rate with frames = data_len // block_align."""
    import struct

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    try:
        pos, fmt, data_len = 12, None, None
        while pos + 8 <= len(data):
            cid = data[pos : pos + 4]
            (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            pos += 8
            chunk = data[pos : pos + ln]
            pos += ln + (ln & 1)  # RIFF chunks are word-aligned
            if cid == b"fmt " and len(chunk) >= 16:
                fmt = struct.unpack("<HHIIHH", chunk[:16])
            elif cid == b"data":
                data_len = ln
        if fmt is None or data_len is None:
            return None
        audio_fmt, nch, rate, _byte_rate, block_align, bits = fmt
        if audio_fmt != 1 or block_align == 0 or rate == 0:
            return None  # PCM only
        n_frames = data_len // block_align
        return int(nch), int(rate), int(bits), int(n_frames), n_frames / rate
    except (struct.error, ValueError):
        return None


def encode_wav_pcm16(samples, sample_rate: int, n_channels: int = 1) -> bytes:
    """Minimal stdlib RIFF/WAVE writer (PCM 16-bit little-endian): the
    synthetic-payload generator for exercising the REAL ``decode_wav``
    path where no true audio bytes exist (tests, q_wav_decode_meta).
    ``samples`` is a 1-D int16 array of interleaved frames."""
    import struct

    import numpy as np

    x = np.asarray(samples, dtype="<i2")
    data = x.tobytes()
    block_align = n_channels * 2
    fmt = struct.pack(
        "<HHIIHH",
        1,  # PCM
        n_channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        16,
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_png(data: bytes):
    """REAL pure-stdlib PNG decode: returns ``(width, height, gray)``
    with ``gray`` a float64 (h, w) luma array in [0, 255], or ``None``
    if the bytes are not a PNG this decoder supports (supported: 8-bit
    depth, color types 0/2/6 = gray/RGB/RGBA, non-interlaced — the
    overwhelmingly common PNG shapes). Chunk walk + IDAT inflate +
    per-scanline unfilter per the PNG spec; filters None/Up are
    vectorized (numpy wrap-add), Sub/Average/Paeth fall back to the
    spec's byte recurrence."""
    import struct
    import zlib

    import numpy as np

    if len(data) < 8 or data[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    # Corrupt payloads that still carry the 8-byte magic (truncated
    # IHDR -> struct.error, torn IDAT -> zlib.error, short scanline
    # buffer -> ValueError/IndexError) must return None, not raise:
    # the extract_image_features decode ladder and the documented
    # contract both depend on graceful degradation, and an exception
    # escaping a mapInPandas closure fails the whole Spark task.
    try:
        pos, w, h, idat = 8, None, None, b""
        bitd = ct = interlace = None
        while pos + 8 <= len(data):
            ln, typ = struct.unpack(">I4s", data[pos : pos + 8])
            pos += 8
            chunk = data[pos : pos + ln]
            pos += ln + 4  # skip CRC
            if typ == b"IHDR":
                w, h, bitd, ct, _comp, _filt, interlace = struct.unpack(
                    ">IIBBBBB", chunk
                )
            elif typ == b"IDAT":
                idat += chunk
            elif typ == b"IEND":
                break
        if w is None or bitd != 8 or interlace != 0 or ct not in (0, 2, 6):
            return None
        nch = {0: 1, 2: 3, 6: 4}[ct]
        stride = w * nch
        raw = zlib.decompress(idat)
        if len(raw) < h * (stride + 1):
            return None
        # whole-image fast path: if every scanline filter byte is None
        # (filter 0 — what encode_gray_png and most simple encoders
        # emit), the pixel matrix is one reshape away; bit-identical to
        # the per-line walk below
        arr = np.frombuffer(
            raw, dtype=np.uint8, count=h * (stride + 1)
        ).reshape(h, stride + 1)
        if not arr[:, 0].any():
            out = np.ascontiguousarray(arr[:, 1:])
            px = out.reshape(h, w, nch).astype(np.float64)
            if nch == 1:
                gray = px[:, :, 0]
            else:
                gray = (
                    px[:, :, 0] * 0.299
                    + px[:, :, 1] * 0.587
                    + px[:, :, 2] * 0.114
                )
            return int(w), int(h), gray
        out = np.empty((h, stride), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.uint8)
        rpos = 0
        for y in range(h):
            f = raw[rpos]
            rpos += 1
            line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=rpos)
            rpos += stride
            if f == 0:  # None
                cur = line.copy()
            elif f == 2:  # Up (uint8 add wraps mod 256, per spec)
                cur = line + prev
            elif f in (1, 3, 4):  # Sub / Average / Paeth
                cur = np.zeros(stride, dtype=np.uint8)
                for i in range(stride):
                    a = int(cur[i - nch]) if i >= nch else 0
                    b = int(prev[i])
                    c = int(prev[i - nch]) if i >= nch else 0
                    if f == 1:
                        pred = a
                    elif f == 3:
                        pred = (a + b) // 2
                    else:
                        p = a + b - c
                        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                        pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    cur[i] = (int(line[i]) + pred) & 0xFF
            else:
                return None
            out[y] = cur
            prev = cur
        px = out.reshape(h, w, nch).astype(np.float64)
        if nch == 1:
            gray = px[:, :, 0]
        else:  # ITU-R 601 luma; alpha (ct 6) ignored
            gray = px[:, :, 0] * 0.299 + px[:, :, 1] * 0.587 + px[:, :, 2] * 0.114
        return int(w), int(h), gray
    except (struct.error, zlib.error, ValueError, IndexError):
        return None


def encode_gray_png(pixels) -> bytes:
    """Minimal stdlib grayscale PNG writer (8-bit, filter None): the
    synthetic-payload generator for exercising the REAL ``decode_png``
    path where no true image bytes exist (tests, the registered
    q_png_decode_features query). Accepts a (h, w) uint8 array."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + typ
            + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    # one vectorized assembly of [filter-None byte | scanline] rows
    raw = np.hstack([np.zeros((h, 1), dtype=np.uint8), px]).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def extract_image_features(
    df: DataFrame, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """Decode + featurize image binaries, Arrow-batched.

    Decode ladder, per payload: (1) REAL pure-stdlib PNG decode
    (``decode_png`` above — no media libs needed); (2) REAL pure-stdlib
    baseline-JPEG luma decode (``decode_jpeg_pixels``, gray or color);
    (3) PIL for other formats when installed; (4) DETERMINISTIC FAKE
    (width/height/features derived from the content digest) so the
    pipeline stays runnable on arbitrary bytes. Features are
    ``IMAGE_FEATURE_DIM`` horizontal-band luma means in [0, 1] on every
    path. JPEGs above ``decode_jpeg_pixels``' pixel cap (2 MP) skip the
    pure-Python rung and go straight to PIL/fake, so a multi-megapixel
    photo never stalls a task in bit-at-a-time entropy decode.

    Worker-import note: ``decode_png`` is self-contained, but
    ``decode_jpeg_pixels`` references module-level Huffman/DCT helpers,
    so cloudpickle ships it by reference — Python workers need
    ``oakstore_spark`` importable (true in local mode and in any
    deployment that ships the package, e.g. ``--py-files``).
    """
    id_name, content_name = id_col, content_col
    dim = IMAGE_FEATURE_DIM
    _png = decode_png
    _jpg = decode_jpeg_pixels

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import numpy as _np
        import pandas as _pd

        try:
            from PIL import Image as _Image
        except ImportError:
            _Image = None

        def band_feats(gray):
            return [
                float(band.mean()) / 255.0
                for band in _np.array_split(gray, dim, axis=0)
            ]

        for pdf in it:
            rows = []
            for mid, content in zip(pdf[id_name], pdf[content_name]):
                content = bytes(content)
                decoded = _png(content) or _jpg(content)
                feats = None
                if decoded is not None:  # real PNG or baseline-JPEG luma
                    w, h, gray = decoded
                    feats = band_feats(gray)
                elif _Image is not None:
                    import io

                    try:
                        img = _Image.open(io.BytesIO(content))
                        w, h = img.size
                        feats = band_feats(
                            _np.asarray(img.convert("L"), dtype=_np.float64)
                        )
                    except Exception:  # noqa: BLE001 — junk bytes degrade
                        feats = None
                if feats is None:  # DETERMINISTIC FAKE (undecodable)
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

    Decode ladder: a payload that parses as a RIFF/AVI container gets
    REAL frame extraction (``decode_avi_frames`` walks the movi LIST to
    true payload boundaries; each sampled frame's md5 is the digest of
    the ACTUAL frame bytes). Anything else falls back to the documented
    fixed-size-chunk fake (4096-byte chunks of the raw stream) so the
    operator stays total over arbitrary bytes — and stays
    oracle-checkable via DuckDB blob slicing on that path.
    """
    chunk = 4096
    _avi = decode_avi_frames

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in it:
            rows = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                content = bytes(content)
                frames = _avi(content)
                if frames is not None:  # REAL container walk
                    # a valid-but-EMPTY AVI ([]) is a real container
                    # with zero frames -> zero rows, NOT the chunk fake
                    for idx in range(0, len(frames), every_n):
                        rows.append(
                            (int(mid), idx,
                             _hashlib.md5(frames[idx]).hexdigest())
                        )
                    continue
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
    """Duration/sample-rate metadata via a decode ladder: REAL RIFF/WAV
    header parse first (``decode_wav`` — true channels/rate/bits/frames,
    codec='pcm_wav'); non-RIFF payloads fall back to the documented
    deterministic assumption of 16-bit mono PCM at ``assumed_rate``
    (codec='assumed_pcm16', duration = n_bytes / (2 * rate))."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in it:
            rows = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                content = bytes(content)
                dec = decode_wav(content)
                if dec is not None:
                    nch, rate, bits, _n_frames, dur = dec
                    rows.append(
                        (int(mid), len(content), dur, rate, nch, bits, "pcm_wav")
                    )
                else:
                    rows.append(
                        (
                            int(mid),
                            len(content),
                            len(content) / (2.0 * assumed_rate),
                            assumed_rate,
                            1,
                            16,
                            "assumed_pcm16",
                        )
                    )
            yield _pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "n_bytes",
                    "duration_sec",
                    "sample_rate",
                    "n_channels",
                    "bits",
                    "codec",
                ],
            )

    return df.select(id_col, content_col).mapInPandas(batches, AUDIO_META_SCHEMA)


VIDEO_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("fps", T.DoubleType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("codec", T.StringType()),
    ]
)


def decode_avi(data: bytes):
    """REAL pure-stdlib AVI header decode: returns ``(width, height,
    n_frames, usec_per_frame)`` from the 'avih' main header of a
    RIFF/'AVI ' container, or ``None`` for non-AVI / corrupt payloads
    (same graceful-degrade contract as decode_png / decode_wav). Walks
    RIFF chunks; 'LIST'/'hdrl' is itself walked for the 'avih' chunk
    (AVIMAINHEADER per the public AVI RIFF spec: dwMicroSecPerFrame,
    ..., dwTotalFrames at offset 16, dwWidth/dwHeight at 32/36)."""
    import struct

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        return None

    def find_avih(buf: bytes) -> bytes | None:
        pos = 0
        while pos + 8 <= len(buf):
            cid = buf[pos : pos + 4]
            (ln,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            body = buf[pos + 8 : pos + 8 + ln]
            if cid == b"avih":
                return body
            if cid == b"LIST" and body[:4] in (b"hdrl", b"strl"):
                got = find_avih(body[4:])
                if got is not None:
                    return got
            pos += 8 + ln + (ln & 1)
        return None

    try:
        avih = find_avih(data[12:])
        if avih is None or len(avih) < 40:
            return None
        usec_per_frame = struct.unpack("<I", avih[0:4])[0]
        n_frames = struct.unpack("<I", avih[16:20])[0]
        width = struct.unpack("<I", avih[32:36])[0]
        height = struct.unpack("<I", avih[36:40])[0]
        if usec_per_frame == 0:
            return None
        return int(width), int(height), int(n_frames), int(usec_per_frame)
    except (struct.error, ValueError, IndexError):
        return None


def encode_avi_header(
    width: int, height: int, n_frames: int, fps: int
) -> bytes:
    """Minimal stdlib RIFF/'AVI ' writer: hdrl LIST holding one
    AVIMAINHEADER ('avih') plus an empty 'movi' LIST — enough container
    for :func:`decode_avi` to recover every header field. The synthetic-
    payload generator for tests and q_avi_decode_meta (no ffmpeg in the
    container; frame payloads are out of scope by design)."""
    import struct

    usec = 1_000_000 // fps
    avih = struct.pack(
        "<IIIIIIIIII4I",
        usec,  # dwMicroSecPerFrame
        0,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0,  # dwFlags
        n_frames,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        0,  # dwSuggestedBufferSize
        width,  # dwWidth
        height,  # dwHeight
        0, 0, 0, 0,  # dwReserved
    )
    avih_chunk = b"avih" + struct.pack("<I", len(avih)) + avih
    hdrl = b"hdrl" + avih_chunk
    hdrl_list = b"LIST" + struct.pack("<I", len(hdrl)) + hdrl
    movi_list = b"LIST" + struct.pack("<I", 4) + b"movi"
    body = b"AVI " + hdrl_list + movi_list
    return b"RIFF" + struct.pack("<I", len(body)) + body


def video_metadata(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    assumed_fps: float = 30.0,
    assumed_frame_bytes: int = 4096,
) -> DataFrame:
    """Width/height/frames/fps metadata via the decode ladder: REAL AVI
    header parse first (codec='avi'); non-RIFF payloads fall back to the
    documented deterministic assumption (fixed-size chunks as frames at
    ``assumed_fps``, codec='assumed_chunks' — the contract
    sample_video_frames uses)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in it:
            rows = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                content = bytes(content)
                dec = decode_avi(content)
                if dec is not None:
                    w, h, nf, usec = dec
                    fps = 1_000_000.0 / usec
                    rows.append(
                        (int(mid), len(content), w, h, nf,
                         fps, nf * usec / 1_000_000.0, "avi")
                    )
                else:
                    nf = max(len(content) // assumed_frame_bytes, 1)
                    rows.append(
                        (int(mid), len(content), 0, 0, nf,
                         assumed_fps, nf / assumed_fps, "assumed_chunks")
                    )
            yield _pd.DataFrame(
                rows,
                columns=["media_id", "n_bytes", "width", "height",
                         "n_frames", "fps", "duration_sec", "codec"],
            )

    return df.select(id_col, content_col).mapInPandas(batches, VIDEO_META_SCHEMA)


def decode_jpeg_meta(data: bytes):
    """REAL pure-stdlib JPEG header scan: walks the marker stream to the
    first SOF0-SOF15 frame header and returns (width, height,
    n_components, progressive) — dimensions without a DCT decode, the
    metadata pass a media pipeline runs on billions of images before
    deciding what to fully decode. Returns ``None`` for non-JPEG or
    corrupt/truncated streams (same graceful-degrade contract as
    decode_png/decode_wav/decode_avi). Marker walk per ITU T.81: skip
    padding FFs, length-prefixed segments, stop at SOS/EOI."""
    import struct

    if len(data) < 4 or data[:2] != b"\xff\xd8":  # SOI
        return None
    try:
        pos = 2
        n = len(data)
        while pos + 4 <= n:
            if data[pos] != 0xFF:
                return None
            # skip fill bytes
            while pos < n and data[pos] == 0xFF:
                pos += 1
            if pos >= n:
                return None
            marker = data[pos]
            pos += 1
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                continue  # standalone markers, no length
            if marker in (0xD9, 0xDA):  # EOI / SOS before any SOF
                return None
            (seg_len,) = struct.unpack(">H", data[pos : pos + 2])
            if seg_len < 2 or pos + seg_len > n:
                return None
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                precision, h, w, comps = struct.unpack(
                    ">BHHB", data[pos + 2 : pos + 8]
                )
                if precision not in (8, 12, 16) or not w or not h:
                    return None
                progressive = marker in (0xC2, 0xC6, 0xCA, 0xCE)
                return int(w), int(h), int(comps), bool(progressive)
            pos += seg_len
        return None
    except (struct.error, ValueError, IndexError):
        return None


def encode_jpeg_header(
    width: int, height: int, n_components: int = 3, progressive: bool = False
) -> bytes:
    """Minimal stdlib JPEG header writer (SOI + JFIF APP0 + one SOF
    segment + SOS + EOI) — enough marker structure for
    :func:`decode_jpeg_meta` to recover the frame geometry. Synthetic-
    fixture counterpart, same pattern as encode_avi_header."""
    import struct

    sof_marker = b"\xff\xc2" if progressive else b"\xff\xc0"
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    comps = b"".join(
        struct.pack(">BBB", i + 1, 0x11, 0) for i in range(n_components)
    )
    sof = sof_marker + struct.pack(
        ">HBHHB", 8 + 3 * n_components, 8, height, width, n_components
    ) + comps
    sos = b"\xff\xda" + struct.pack(">H", 2)
    return b"\xff\xd8" + app0 + sof + sos + b"\xff\xd9"


# --- baseline JPEG (ITU T.81) pixel codec, grayscale ----------------------
# Standard tables from T.81 Annex K (public spec data): the luminance
# quantization matrix and the canonical DC/AC luminance Huffman tables.

_JPEG_QLUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]
_JPEG_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_JPEG_DC_VALS = list(range(12))
_JPEG_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_JPEG_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


_JPEG_QCHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]
_JPEG_DC_BITS_C = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_JPEG_DC_VALS_C = list(range(12))
_JPEG_AC_BITS_C = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_JPEG_AC_VALS_C = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


class _JpegBitWriter:
    """Entropy-stream bit accumulator with FF byte stuffing and the
    pad-with-1s finish, shared by the gray and color encoders."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def put(self, code: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (code & ((1 << nbits) - 1))
        self.nacc += nbits
        while self.nacc >= 8:
            byte = (self.acc >> (self.nacc - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.nacc -= 8
            self.acc &= (1 << self.nacc) - 1

    def finish(self) -> bytes:
        if self.nacc:
            pad = 8 - self.nacc
            byte = ((self.acc << pad) | ((1 << pad) - 1)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.acc, self.nacc = 0, 0
        return bytes(self.out)


def _jpeg_magnitude(v: int) -> tuple[int, int]:
    """(category, magnitude bits) of a nonzero coefficient."""
    s = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << s) - 1
    return s, bits


def _jpeg_encode_block(writer, zz, prev_dc: int, dc_codes, ac_codes) -> int:
    """Entropy-encode one zigzagged quantized block; returns its DC for
    the component's predictor chain."""
    diff = int(zz[0]) - prev_dc
    if diff == 0:
        c, ln = dc_codes[0]
        writer.put(c, ln)
    else:
        s, bits = _jpeg_magnitude(diff)
        c, ln = dc_codes[s]
        writer.put(c, ln)
        writer.put(bits, s)
    run = 0
    last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]  # ZRL
            writer.put(c, ln)
            run -= 16
        s, bits = _jpeg_magnitude(v)
        c, ln = ac_codes[(run << 4) | s]
        writer.put(c, ln)
        writer.put(bits, s)
        run = 0
    if last_nz < 63:
        c, ln = ac_codes[0x00]  # EOB
        writer.put(c, ln)
    return int(zz[0])


def _jpeg_quantize_block(block, C, Q):
    """Level-shifted FDCT + quantize + zigzag for one 8x8 float block;
    coefficients clamp to baseline's 10-bit category cap."""
    import numpy as np

    coeff = C @ (block - 128.0) @ C.T
    qz = np.clip(np.round(coeff / Q).astype(np.int64), -1023, 1023)
    return qz.ravel()[_JPEG_ZIGZAG]


def _jpeg_canonical_codes(bits: list[int], vals: list[int]) -> dict:
    """symbol -> (code, length), canonical assignment per T.81 C.2."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _jpeg_dct_matrix():
    import numpy as np

    C = np.zeros((8, 8))
    for u in range(8):
        a = np.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            C[u, x] = a * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return C


def _jpeg_quality_table(quality: int, base=None):
    import numpy as np

    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    tbl = (
        np.asarray(base or _JPEG_QLUMA, dtype=np.int64) * scale + 50
    ) // 100
    return np.clip(tbl, 1, 255).reshape(8, 8)


def _jpeg_quality_table_chroma(quality: int):
    return _jpeg_quality_table(quality, base=_JPEG_QCHROMA)


def encode_jpeg_baseline_gray(pixels, quality: int = 75) -> bytes:
    """Minimal stdlib baseline-JPEG encoder (grayscale, one component,
    standard Annex-K Huffman + quality-scaled luminance quant table):
    the synthetic-payload generator for exercising the REAL
    ``decode_jpeg_pixels`` below, same pattern as encode_gray_png /
    encode_wav_pcm16. Output is spec-conformant (decodable by any JPEG
    decoder). Accepts a (h, w) uint8 array."""
    import struct

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(px, ((0, ph - h), (0, pw - w)), mode="edge").astype(
        np.float64
    )
    Q = _jpeg_quality_table(quality)
    C = _jpeg_dct_matrix()
    dc_codes = _jpeg_canonical_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_canonical_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)

    wr = _JpegBitWriter()
    prev_dc = 0
    for by in range(ph // 8):
        for bx in range(pw // 8):
            zz = _jpeg_quantize_block(
                padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8], C, Q
            )
            prev_dc = _jpeg_encode_block(wr, zz, prev_dc, dc_codes, ac_codes)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    dqt = seg(0xDB, b"\x00" + bytes(int(Q.ravel()[z]) for z in _JPEG_ZIGZAG))
    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
    dht_dc = seg(
        0xC4, b"\x00" + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
    )
    dht_ac = seg(
        0xC4, b"\x10" + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS)
    )
    sos = seg(0xDA, b"\x01\x01\x00\x00\x3f\x00")
    return (
        b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos
        + wr.finish() + b"\xff\xd9"
    )


def encode_jpeg_baseline_color(
    rgb, quality: int = 75, subsample: str = "420"
) -> bytes:
    """Minimal stdlib baseline-JPEG COLOR encoder: BT.601 RGB→YCbCr,
    chroma subsampling ("420" = 2x2 box-mean, the near-universal web
    shape, or "444"), Annex-K luma + chroma quant/Huffman tables, and
    the interleaved MCU scan (4:2:0 MCU = 4 Y blocks + Cb + Cr over a
    16x16 tile). Spec-conformant output; the synthetic-payload
    generator for the 3-component rungs of ``decode_jpeg_pixels``.
    Accepts an (h, w, 3) uint8 array."""
    import struct

    import numpy as np

    px = np.asarray(rgb, dtype=np.uint8)
    h, w, _ = px.shape
    r = px[:, :, 0].astype(np.float64)
    g = px[:, :, 1].astype(np.float64)
    b = px[:, :, 2].astype(np.float64)
    Y = 0.299 * r + 0.587 * g + 0.114 * b
    Cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    Cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b

    if subsample == "420":
        hy, vy = 2, 2
    elif subsample == "444":
        hy, vy = 1, 1
    else:
        raise ValueError(f"unsupported subsample {subsample!r}")
    mcu_w, mcu_h = 8 * hy, 8 * vy
    ew = -(-w // mcu_w) * mcu_w
    eh = -(-h // mcu_h) * mcu_h

    def pad(plane, th, tw):
        return np.pad(
            plane, ((0, th - plane.shape[0]), (0, tw - plane.shape[1])),
            mode="edge",
        )

    Yp = pad(Y, eh, ew)
    if subsample == "420":
        # 2x2 box-mean on the padded plane so chroma dims divide by 8
        Cbp = pad(Cb, eh, ew).reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
        Crp = pad(Cr, eh, ew).reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
    else:
        Cbp, Crp = pad(Cb, eh, ew), pad(Cr, eh, ew)

    QL = _jpeg_quality_table(quality)
    QC = _jpeg_quality_table_chroma(quality)
    C = _jpeg_dct_matrix()
    dc_l = _jpeg_canonical_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_l = _jpeg_canonical_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    dc_c = _jpeg_canonical_codes(_JPEG_DC_BITS_C, _JPEG_DC_VALS_C)
    ac_c = _jpeg_canonical_codes(_JPEG_AC_BITS_C, _JPEG_AC_VALS_C)

    wr = _JpegBitWriter()
    prev = [0, 0, 0]  # per-component DC predictors (Y, Cb, Cr)
    for my in range(eh // mcu_h):
        for mx in range(ew // mcu_w):
            for bv in range(vy):
                for bh in range(hy):
                    y0 = my * mcu_h + bv * 8
                    x0 = mx * mcu_w + bh * 8
                    zz = _jpeg_quantize_block(
                        Yp[y0 : y0 + 8, x0 : x0 + 8], C, QL
                    )
                    prev[0] = _jpeg_encode_block(wr, zz, prev[0], dc_l, ac_l)
            for ci, plane in ((1, Cbp), (2, Crp)):
                zz = _jpeg_quantize_block(
                    plane[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8], C, QC
                )
                prev[ci] = _jpeg_encode_block(wr, zz, prev[ci], dc_c, ac_c)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    dqt = seg(
        0xDB,
        b"\x00" + bytes(int(QL.ravel()[z]) for z in _JPEG_ZIGZAG)
        + b"\x01" + bytes(int(QC.ravel()[z]) for z in _JPEG_ZIGZAG),
    )
    samp_y = (hy << 4) | vy
    sof = seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, samp_y, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    dht = seg(
        0xC4,
        b"\x00" + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
        + b"\x10" + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS)
        + b"\x01" + bytes(_JPEG_DC_BITS_C) + bytes(_JPEG_DC_VALS_C)
        + b"\x11" + bytes(_JPEG_AC_BITS_C) + bytes(_JPEG_AC_VALS_C),
    )
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 0x3F, 0]))
    return (
        b"\xff\xd8" + dqt + sof + dht + sos + wr.finish() + b"\xff\xd9"
    )


def decode_jpeg_pixels(
    data: bytes, max_pixels: int = 1 << 21, return_planes: bool = False
):
    """REAL pure-stdlib baseline-JPEG PIXEL decode (the last rung past
    :func:`decode_jpeg_meta`'s header scan): Huffman entropy decode →
    dequantize → inverse zigzag → 2-D IDCT → level shift, returning
    ``(width, height, gray)`` with ``gray`` a float64 (h, w) array of
    integer-rounded luma in [0, 255]. Supports 8-bit baseline streams
    with 1 component (grayscale) or 3 components with the interleaved
    MCU scan — 4:4:4, 4:2:0, 4:2:2, any sampling in {1,2} per axis with
    full-resolution luma (chroma blocks are entropy-decoded to advance
    the bitstream and discarded; the luma plane IS the feature input of
    this pipeline). Progressive frames, restart markers, 16-bit quant
    tables, and subsampled-luma exotics return ``None`` — same
    graceful-degrade contract as decode_png.

    ``return_planes=True`` additionally materializes EVERY component's
    raw post-IDCT plane (level-shifted +128, UNROUNDED float64, at the
    component's natural subsampled resolution, padded to whole blocks)
    and returns ``(width, height, gray, comps, planes)`` where
    ``comps`` is the per-component metadata list (sampling factors
    h/v). This is the hook :func:`decode_jpeg_rgb` uses to reconstruct
    color — the default luma-only return is unchanged.

    ``max_pixels`` (default 2 MP) bounds both wall-clock and memory:
    bit-at-a-time entropy decode in Python is fine for thumbnails and
    test fixtures but would take minutes on a multi-megapixel photo,
    and a crafted SOF claiming 65535x65535 would otherwise allocate a
    ~34 GB plane. Frames above the cap return ``None`` so callers
    degrade to PIL (when installed) or the deterministic fake instead
    of stalling the Spark task. ``MemoryError`` is in the degrade set
    for the same reason.

    NOTE: this function references module-level tables/helpers
    (``_JPEG_ZIGZAG``, ``_jpeg_canonical_codes``, ``_jpeg_dct_matrix``),
    so cloudpickle ships it BY REFERENCE — workers calling it (e.g. via
    ``extract_image_features``) need ``oakstore_spark`` importable,
    unlike the dependency-free ``decode_png``.

    Cites reference parity: the reference has no media decode at all
    (store.py:1-267); this is the EXT multimodal surface."""
    import struct

    import numpy as np

    if len(data) < 4 or data[:2] != b"\xff\xd8":
        return None
    try:
        pos, n = 2, len(data)
        qtables: dict[int, np.ndarray] = {}
        htables: dict[tuple[int, int], dict] = {}
        w = h = None
        comps: list[dict] = []
        scan_start = None
        while pos + 4 <= n:
            while pos < n and data[pos] == 0xFF:
                pos += 1
            if pos >= n:
                return None
            marker = data[pos]
            pos += 1
            if marker == 0xD9:
                return None  # EOI before SOS
            (seg_len,) = struct.unpack(">H", data[pos : pos + 2])
            if seg_len < 2 or pos + seg_len > n:
                return None
            body = data[pos + 2 : pos + seg_len]
            if marker == 0xDB:  # DQT (possibly several tables)
                bp = 0
                while bp < len(body):
                    pq, tq = body[bp] >> 4, body[bp] & 0xF
                    if pq != 0:  # 16-bit tables unsupported
                        return None
                    vals = np.frombuffer(
                        body[bp + 1 : bp + 65], dtype=np.uint8
                    ).astype(np.float64)
                    tbl = np.zeros(64)
                    tbl[_JPEG_ZIGZAG] = vals
                    qtables[tq] = tbl.reshape(8, 8)
                    bp += 65
            elif marker == 0xC4:  # DHT (possibly several tables)
                bp = 0
                while bp < len(body):
                    tc, th = body[bp] >> 4, body[bp] & 0xF
                    bits = list(body[bp + 1 : bp + 17])
                    nv = sum(bits)
                    vals = list(body[bp + 17 : bp + 17 + nv])
                    codes = _jpeg_canonical_codes(bits, vals)
                    # invert to (length, code) -> symbol for decoding
                    htables[(tc, th)] = {
                        (ln, code): sym for sym, (code, ln) in codes.items()
                    }
                    bp += 17 + nv
            elif marker == 0xC0:  # SOF0 baseline
                precision, h, w, ncomp = struct.unpack(">BHHB", body[:6])
                if precision != 8 or ncomp not in (1, 3):
                    return None
                if w == 0 or h == 0 or w * h > max_pixels:
                    return None  # see max_pixels in the docstring
                comps = []
                for ci in range(ncomp):
                    cid = body[6 + 3 * ci]
                    samp = body[7 + 3 * ci]
                    tq = body[8 + 3 * ci]
                    ch, cv = samp >> 4, samp & 0xF
                    if ch not in (1, 2) or cv not in (1, 2):
                        return None
                    comps.append({"cid": cid, "h": ch, "v": cv, "tq": tq})
            elif 0xC1 <= marker <= 0xCF and marker != 0xC4:
                return None  # non-baseline frame
            elif marker == 0xDA:  # SOS
                ns = body[0]
                if w is None or ns != len(comps):
                    return None
                by_cid = {c["cid"]: c for c in comps}
                for si in range(ns):
                    scid = body[1 + 2 * si]
                    tids = body[2 + 2 * si]
                    if scid not in by_cid:
                        return None
                    by_cid[scid]["dc"] = tids >> 4
                    by_cid[scid]["ac"] = tids & 0xF
                scan_start = pos + seg_len
                break
            pos += seg_len
        if scan_start is None:
            return None
        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        if len(comps) == 1:
            if (comps[0]["h"], comps[0]["v"]) != (1, 1):
                return None
        elif (comps[0]["h"], comps[0]["v"]) != (hmax, vmax):
            return None  # only full-resolution luma is materialized
        for c in comps:
            if c["tq"] not in qtables:
                return None
            c["Q"] = qtables[c["tq"]]
            c["dc_tab"] = htables.get((0, c["dc"]))
            c["ac_tab"] = htables.get((1, c["ac"]))
            if c["dc_tab"] is None or c["ac_tab"] is None:
                return None

        # unstuff the entropy stream up to EOI
        raw = bytearray()
        p = scan_start
        while p < n:
            b = data[p]
            if b == 0xFF:
                nxt = data[p + 1] if p + 1 < n else 0xD9
                if nxt == 0x00:
                    raw.append(0xFF)
                    p += 2
                    continue
                if 0xD0 <= nxt <= 0xD7:
                    return None  # restart markers unsupported
                break  # EOI or another marker ends the scan
            raw.append(b)
            p += 1
        stream = bytes(raw)
        nbits_total = len(stream) * 8
        bitpos = 0

        def read_bit() -> int:
            nonlocal bitpos
            if bitpos >= nbits_total:
                raise ValueError("bitstream exhausted")
            byte = stream[bitpos >> 3]
            bit = (byte >> (7 - (bitpos & 7))) & 1
            bitpos += 1
            return bit

        def read_bits(k: int) -> int:
            v = 0
            for _ in range(k):
                v = (v << 1) | read_bit()
            return v

        def read_symbol(tab: dict) -> int:
            code = 0
            for ln in range(1, 17):
                code = (code << 1) | read_bit()
                sym = tab.get((ln, code))
                if sym is not None:
                    return sym
            raise ValueError("invalid huffman code")

        def extend(v: int, s: int) -> int:
            return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

        C = _jpeg_dct_matrix()

        def decode_block(comp) -> np.ndarray:
            """One entropy-decoded, dequantized, IDCT'd 8x8 block; also
            advances the component's DC predictor."""
            zz = np.zeros(64, dtype=np.int64)
            s = read_symbol(comp["dc_tab"])
            diff = extend(read_bits(s), s) if s else 0
            comp["prev_dc"] = comp.get("prev_dc", 0) + diff
            zz[0] = comp["prev_dc"]
            k = 1
            while k < 64:
                rs = read_symbol(comp["ac_tab"])
                if rs == 0x00:  # EOB
                    break
                if rs == 0xF0:  # ZRL
                    k += 16
                    continue
                run, size = rs >> 4, rs & 0xF
                k += run
                if k > 63 or size == 0:
                    raise ValueError("bad AC run")
                zz[k] = extend(read_bits(size), size)
                k += 1
            coeff = np.zeros(64)
            coeff[_JPEG_ZIGZAG] = zz
            return C.T @ (coeff.reshape(8, 8) * comp["Q"]) @ C

        luma = comps[0]
        if len(comps) == 1:
            # non-interleaved single-component scan: plain 8x8 grid
            ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
            out = np.zeros((ph, pw))
            for by in range(ph // 8):
                for bx in range(pw // 8):
                    out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                        decode_block(luma)
                    )
            planes = [out + 128.0] if return_planes else None
        else:
            # interleaved MCU scan: per MCU, each component contributes
            # h x v blocks in raster order; only the full-resolution
            # luma plane is materialized by default — chroma blocks are
            # decoded to advance the bitstream and (unless
            # return_planes) discarded
            mcu_w, mcu_h = 8 * hmax, 8 * vmax
            mcus_x, mcus_y = -(-w // mcu_w), -(-h // mcu_h)
            out = np.zeros((mcus_y * mcu_h, mcus_x * mcu_w))
            chroma_planes = (
                [
                    np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8))
                    for c in comps[1:]
                ]
                if return_planes
                else None
            )
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    for ci, comp in enumerate(comps):
                        for bv in range(comp["v"]):
                            for bh in range(comp["h"]):
                                block = decode_block(comp)
                                if comp is luma:
                                    y0 = my * mcu_h + bv * 8
                                    x0 = mx * mcu_w + bh * 8
                                    out[y0 : y0 + 8, x0 : x0 + 8] = block
                                elif return_planes:
                                    p = chroma_planes[ci - 1]
                                    y0 = (my * comp["v"] + bv) * 8
                                    x0 = (mx * comp["h"] + bh) * 8
                                    p[y0 : y0 + 8, x0 : x0 + 8] = block
            if return_planes:
                planes = [out + 128.0] + [p + 128.0 for p in chroma_planes]
        gray = np.clip(np.round(out + 128.0), 0, 255)
        if return_planes:
            meta = [{"h": c["h"], "v": c["v"]} for c in comps]
            return int(w), int(h), gray[:h, :w], meta, planes
        return int(w), int(h), gray[:h, :w]
    except (struct.error, ValueError, IndexError, MemoryError):
        return None


def decode_wav_samples(data: bytes):
    """REAL pure-stdlib PCM16 WAV SAMPLE decode: returns
    ``(n_channels, sample_rate, samples)`` where ``samples`` is the
    interleaved int16 numpy array from the data chunk, or ``None`` for
    anything that isn't a clean 16-bit PCM RIFF payload (same
    graceful-degrade contract as decode_wav/decode_png). This is the
    step past header metadata: actual waveform access for DSP feature
    extraction."""
    import struct

    import numpy as np

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    try:
        pos, fmt, payload = 12, None, None
        while pos + 8 <= len(data):
            cid = data[pos : pos + 4]
            (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            pos += 8
            chunk = data[pos : pos + ln]
            pos += ln + (ln & 1)
            if cid == b"fmt " and len(chunk) >= 16:
                fmt = struct.unpack("<HHIIHH", chunk[:16])
            elif cid == b"data":
                payload = chunk
        if fmt is None or payload is None:
            return None
        audio_fmt, nch, rate, _br, block_align, bits = fmt
        if audio_fmt != 1 or bits != 16 or block_align == 0 or rate == 0:
            return None
        usable = len(payload) - (len(payload) % 2)
        samples = np.frombuffer(payload[:usable], dtype="<i2")
        return int(nch), int(rate), samples
    except (struct.error, ValueError):
        return None


def audio_features(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Waveform-level DSP features per audio payload: RMS energy and
    zero-crossing count over the decoded PCM16 samples (mono or
    channel-interleaved treated as one stream). The classic cheap
    audio-quality/speech-vs-noise signals of a media curation pipeline.
    Arrow-batched mapInPandas; payload bytes never shuffle; undecodable
    payloads emit nulls rather than failing the task."""
    import numpy as np

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("rms", T.DoubleType()),
            T.StructField("n_zero_cross", T.LongType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                dec = decode_wav_samples(bytes(content))
                if dec is None or len(dec[2]) == 0:
                    rows.append((int(mid), None, None, None))
                    continue
                _nch, _rate, s = dec
                x = s.astype(np.float64)
                rms = float(np.sqrt(np.mean(x * x)))
                neg = s < 0
                zc = int(np.count_nonzero(neg[:-1] != neg[1:]))
                rows.append((int(mid), len(s), rms, zc))
            yield pd.DataFrame(
                rows, columns=["media_id", "n_samples", "rms", "n_zero_cross"]
            )

    return df.select(id_col, content_col).mapInPandas(batches, schema)


def resize_image_thumbnails(
    df: DataFrame,
    out_h: int = 8,
    out_w: int = 8,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Image RESIZE through real bytes: decode each payload — PNG
    (``decode_png``) first, then baseline JPEG
    (``decode_jpeg_pixels``) — box-downsample the luma plane to
    ``out_h x out_w`` by exact block averaging (each output cell = mean
    of its input block; edge blocks absorb the remainder rows/cols),
    and emit the thumbnail as a flat float array plus its overall mean.
    This is the resize step of an image-curation pipeline (dedup
    thumbprints, NSFW/quality model inputs) done the Spark way:
    Arrow-batched mapInPandas, payload bytes never shuffle, undecodable
    payloads yield null thumbnails instead of failing the task.

    Block averaging (not nearest-neighbor) so the thumbnail is a
    DETERMINISTIC pure function of every input pixel — pinned against a
    numpy reference in pytest for BOTH formats."""
    import numpy as np

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("thumb", T.ArrayType(T.DoubleType())),
            T.StructField("thumb_mean", T.DoubleType()),
        ]
    )
    _png = decode_png
    _jpg = decode_jpeg_pixels

    def _decode_any(content: bytes):
        dec = _png(content)
        return dec if dec is not None else _jpg(content)

    def _block_mean(gray, oh, ow):
        h, w = gray.shape
        if h % oh == 0 and w % ow == 0:
            # evenly divisible: one reshape-mean (equal block sizes make
            # it arithmetically identical to the general path)
            return gray.reshape(oh, h // oh, ow, w // ow).mean(axis=(1, 3))
        ys = [h * i // oh for i in range(oh + 1)]
        xs = [w * j // ow for j in range(ow + 1)]
        out = np.empty((oh, ow), dtype=np.float64)
        for i in range(oh):
            for j in range(ow):
                out[i, j] = gray[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean()
        return out

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                dec = _decode_any(bytes(content))
                if dec is None or dec[0] < 1 or dec[1] < 1:
                    rows.append((int(mid), None, None, None, None))
                    continue
                w, h, gray = dec
                th = _block_mean(gray, out_h, out_w)
                rows.append(
                    (
                        int(mid),
                        int(w),
                        int(h),
                        [float(x) for x in th.ravel()],
                        float(th.mean()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "thumb", "thumb_mean"],
            )

    return df.select(id_col, content_col).mapInPandas(batches, schema)


def encode_mjpeg_avi(frames: list, width: int, height: int, fps: int) -> bytes:
    """Minimal stdlib motion-JPEG AVI writer: the same hdrl/avih
    container as :func:`encode_avi_header` but with a REAL 'movi' LIST
    holding one '00dc' compressed-video chunk per frame payload —
    enough structure for :func:`decode_avi_frames` to walk actual frame
    boundaries (the synthetic-fixture counterpart for true
    frame-extraction tests; pair with :func:`encode_jpeg_header` frames
    so per-frame geometry decodes too)."""
    import struct

    usec = 1_000_000 // fps
    avih = struct.pack(
        "<IIIIIIIIII4I",
        usec, 0, 0, 0, len(frames), 0, 1, 0, width, height, 0, 0, 0, 0,
    )
    avih_chunk = b"avih" + struct.pack("<I", len(avih)) + avih
    hdrl = b"hdrl" + avih_chunk
    hdrl_list = b"LIST" + struct.pack("<I", len(hdrl)) + hdrl
    movi = b"movi"
    for fb in frames:
        movi += b"00dc" + struct.pack("<I", len(fb)) + fb
        if len(fb) & 1:
            movi += b"\x00"  # RIFF word alignment
    movi_list = b"LIST" + struct.pack("<I", len(movi)) + movi
    body = b"AVI " + hdrl_list + movi_list
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_frames(data: bytes):
    """REAL AVI frame extraction: walk the RIFF tree to the 'movi' LIST
    and return the list of video-frame payloads ('00dc'/'00db' chunk
    bodies, in stream order), or ``None`` for non-AVI/corrupt bytes
    (graceful-degrade contract of the other decoders). With an MJPEG
    stream each payload is a standalone JPEG — feed
    :func:`decode_jpeg_meta` for per-frame geometry."""
    import struct

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        return None
    try:
        frames: list[bytes] = []

        def walk(buf: bytes) -> None:
            pos = 0
            while pos + 8 <= len(buf):
                cid = buf[pos : pos + 4]
                (ln,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
                body = buf[pos + 8 : pos + 8 + ln]
                if cid == b"LIST":
                    walk(body[4:])
                elif cid in (b"00dc", b"00db"):
                    frames.append(body)
                pos += 8 + ln + (ln & 1)

        walk(data[12:])
        return frames
    except (struct.error, ValueError):
        return None


def video_frame_luma(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Per-frame PIXEL statistics from real video bytes — the
    composition of the two rungs built separately in r3/r4:
    :func:`decode_avi_frames` walks the RIFF/movi container to each
    frame payload, and :func:`decode_jpeg_pixels` entropy-decodes the
    payload's baseline-JPEG luma plane. Emits one row per (payload,
    frame) with integer pixel sums plus derived mean/std:

        mean = sum_luma / n_px
        std  = sqrt((n_px*sum_sq_luma - sum_luma^2) / n_px^2)

    The sums are EXACT int64 (decoded luma is integer-valued), and the
    mean/std association is the one-division integer-products-first
    form, so a SQL oracle replaying planted frame patterns reproduces
    the doubles bit-for-bit (see q_video_frame_luma).

    Degrade contract: a payload that isn't a decodable AVI emits one
    row with null frame_idx/stats; a frame whose JPEG pixel decode
    fails (progressive, torn, above the pixel cap) keeps its frame_idx
    with null stats. Arrow-batched mapInPandas, map-side only — video
    bytes never shuffle, frames of one payload never cross tasks.

    Reference parity: the reference has no media decode at all
    (store.py:1-267); EXT multimodal surface for video curation.
    """
    import math

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("n_px", T.LongType()),
            T.StructField("sum_luma", T.LongType()),
            T.StructField("sum_sq_luma", T.LongType()),
            T.StructField("mean_luma", T.DoubleType()),
            T.StructField("std_luma", T.DoubleType()),
        ]
    )
    cols = [f.name for f in schema.fields]
    _avi = decode_avi_frames
    _jpg = decode_jpeg_pixels

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        for pdf in it:
            rows = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                mid = int(mid)
                frames = _avi(bytes(content))
                if not frames:
                    # undecodable (None) OR a valid-but-empty container
                    # ([]) both degrade to one null row — the payload
                    # must never silently vanish from the output
                    rows.append((mid,) + (None,) * 8)
                    continue
                for idx, payload in enumerate(frames):
                    dec = _jpg(payload)
                    if dec is None:
                        rows.append((mid, idx) + (None,) * 7)
                        continue
                    w, h, gray = dec
                    px = gray.astype(_np.int64)
                    n = int(px.size)
                    s = int(px.sum())
                    ss = int((px * px).sum())
                    mean = s / n
                    std = math.sqrt((n * ss - s * s) / (n * n))
                    rows.append((mid, idx, int(w), int(h), n, s, ss, mean, std))
            yield _pd.DataFrame(rows, columns=cols)

    return df.select(id_col, content_col).mapInPandas(batches, schema)


def audio_spectral_features(
    df: DataFrame,
    frame_len: int = 64,
    n_bands: int = 4,
    window: str = "rect",
    hop: int | None = None,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Spectral rung above :func:`audio_features`' waveform RMS /
    zero-crossings (the audio analog of the PNG→JPEG image ladder):
    STFT the decoded PCM16 stream with ``frame_len``-sample frames
    advanced by ``hop`` samples (default ``frame_len`` = no overlap;
    ``hop=frame_len//2`` gives the standard 50% overlap), optionally
    ``window="hann"``-tapered (periodic Hann — the production STFT
    shape; the ``"rect"`` default keeps the on-bin planted-tone oracle
    exact), numpy real FFT, Arrow-batched, map-side. Reports
    energy-weighted spectral centroid and band-energy concentration
    over the whole payload:

    - ``n_frames``       — full frames in the stream (tail discarded)
    - ``centroid_bin``   — sum(b * E_b) / sum(E_b) over FFT bins
      b = 1..frame_len/2 (DC excluded), energies summed across frames
    - ``dominant_band``  — argmax of the ``n_bands`` contiguous band
      energies over those bins (ties -> lowest band), band of bin b
      being ``min((b-1) // (frame_len//2//n_bands), n_bands-1)`` —
      the LAST band absorbs the remainder bins when ``n_bands`` does
      not divide ``frame_len//2``, so every bin competes
    - ``dominant_share`` — dominant band energy / total energy
    - ``total_energy``   — sum of |X_b|^2 over bins 1..frame_len/2

    A pure tone exactly on bin k concentrates all energy there, so
    centroid_bin == k and dominant_share == 1 up to float eps — which
    is what makes the planted-tone oracle of q_audio_spectral exact.
    Undecodable payloads or streams shorter than one frame emit nulls
    rather than failing the task (same degrade contract as the other
    decoders). Payload bytes never shuffle.
    """
    if window not in ("rect", "hann"):
        raise ValueError(f"unsupported window {window!r}")
    half = frame_len // 2
    if n_bands < 1 or n_bands > half:
        raise ValueError(
            f"n_bands must be in 1..{half} for frame_len={frame_len}, got {n_bands}"
        )
    band_w = max(half // n_bands, 1)
    step = frame_len if hop is None else int(hop)
    if step < 1:
        raise ValueError(f"hop must be >= 1, got {hop!r}")

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("n_frames", T.LongType()),
            T.StructField("centroid_bin", T.DoubleType()),
            T.StructField("dominant_band", T.IntegerType()),
            T.StructField("dominant_share", T.DoubleType()),
            T.StructField("total_energy", T.DoubleType()),
        ]
    )
    cols = [f.name for f in schema.fields]
    _wav = decode_wav_samples

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        taper = (
            0.5
            - 0.5 * _np.cos(2 * _np.pi * _np.arange(frame_len) / frame_len)
            if window == "hann"
            else None
        )
        for pdf in it:
            rows = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                mid = int(mid)
                dec = _wav(bytes(content))
                if dec is None:
                    rows.append((mid, None, None, None, None, None))
                    continue
                _nch, _rate, s = dec
                nf = (
                    (len(s) - frame_len) // step + 1
                    if len(s) >= frame_len
                    else 0
                )
                if nf == 0:
                    rows.append((mid, 0, None, None, None, None))
                    continue
                base = _np.arange(nf)[:, None] * step
                x = s.astype(_np.float64)[
                    base + _np.arange(frame_len)[None, :]
                ]
                if taper is not None:
                    x = x * taper
                spec = _np.fft.rfft(x, axis=1)
                e = (spec.real**2 + spec.imag**2)[:, 1 : half + 1].sum(axis=0)
                total = float(e.sum())
                if total <= 0.0:
                    rows.append((mid, nf, None, None, None, 0.0))
                    continue
                bins = _np.arange(1, half + 1, dtype=_np.float64)
                centroid = float((bins * e).sum() / total)
                # exactly n_bands segments; reduceat's final segment
                # runs to the end of the array, so the last band
                # absorbs the remainder bins when n_bands ∤ half
                bands = _np.add.reduceat(
                    e, _np.arange(n_bands) * band_w
                )
                dom = int(bands.argmax())
                rows.append(
                    (mid, nf, centroid, dom, float(bands[dom] / total), total)
                )
            yield _pd.DataFrame(rows, columns=cols)

    return df.select(id_col, content_col).mapInPandas(batches, schema)


def audio_silence_stats(
    df: DataFrame,
    frame_len: int = 64,
    threshold: float = 0.0,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Silence segmentation over decoded PCM16 audio — the
    voice-activity-style curation signal (trim silence, drop dead air,
    bound segment lengths): frame the stream into non-overlapping
    ``frame_len``-sample frames, mark a frame silent when its RMS is
    <= ``threshold``, and report per payload:

    - ``n_frames``            — full frames (tail discarded)
    - ``n_silent``            — frames at/below the RMS threshold
    - ``longest_silent_run``  — longest consecutive silent stretch

    Run-length logic is per-payload numpy inside the Arrow batch (a
    payload's frames never cross tasks, so no window/shuffle is needed
    — the gaps-and-islands SQL the oracle uses is replayed map-side).
    Undecodable payloads emit nulls; sub-frame streams emit zeros.
    """
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("n_frames", T.LongType()),
            T.StructField("n_silent", T.LongType()),
            T.StructField("longest_silent_run", T.LongType()),
        ]
    )
    _wav = decode_wav_samples

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        for pdf in it:
            rows = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                mid = int(mid)
                dec = _wav(bytes(content))
                if dec is None:
                    rows.append((mid, None, None, None))
                    continue
                s = dec[2]
                nf = len(s) // frame_len
                if nf == 0:
                    rows.append((mid, 0, 0, 0))
                    continue
                x = s[: nf * frame_len].astype(_np.float64)
                rms = _np.sqrt((x * x).reshape(nf, frame_len).mean(axis=1))
                silent = rms <= threshold
                n_silent = int(silent.sum())
                longest = run = 0
                for flag in silent:
                    run = run + 1 if flag else 0
                    longest = max(longest, run)
                rows.append((mid, nf, n_silent, longest))
            yield _pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_frames", "n_silent", "longest_silent_run",
                ],
            )

    return df.select(id_col, content_col).mapInPandas(batches, schema)


def decode_jpeg_rgb(data: bytes, max_pixels: int = 1 << 21):
    """Full COLOR output from the baseline-JPEG codec — the rung above
    :func:`decode_jpeg_pixels`' luma plane: entropy-decode every
    component (the pixel decoder already walks chroma blocks; here they
    are materialized via ``return_planes``), nearest-replicate
    subsampled chroma up to luma resolution, and convert JFIF YCbCr to
    RGB:

        R = Y + 1.402 (Cr-128)
        G = Y - 0.344136 (Cb-128) - 0.714136 (Cr-128)
        B = Y + 1.772 (Cb-128)

    each channel finished with HALF-UP rounding ``floor(x + 0.5)`` then
    clipped to [0, 255] — half-up (not numpy's half-even) because it is
    the SQL-portable rounding (DuckDB ``floor(x + 0.5)``), which keeps
    planted-color oracles bit-exact (q_jpeg_rgb_stats). Grayscale
    streams replicate the luma plane. Returns ``(width, height, rgb)``
    with ``rgb`` an (h, w, 3) float64 array of integer values, or
    ``None`` under exactly decode_jpeg_pixels' degrade contract."""
    import numpy as np

    dec = decode_jpeg_pixels(data, max_pixels=max_pixels, return_planes=True)
    if dec is None:
        return None
    w, h, _gray, meta, planes = dec
    yp = planes[0][:h, :w]
    if len(planes) == 1:
        g = np.clip(np.floor(yp + 0.5), 0, 255)
        return w, h, np.repeat(g[:, :, None], 3, axis=2)
    hmax = max(c["h"] for c in meta)
    vmax = max(c["v"] for c in meta)
    ups = []
    for c, p in zip(meta[1:], planes[1:]):
        fx, fy = hmax // c["h"], vmax // c["v"]
        if fy > 1:
            p = np.repeat(p, fy, axis=0)
        if fx > 1:
            p = np.repeat(p, fx, axis=1)
        ups.append(p[:h, :w])
    cb, cr = ups[0] - 128.0, ups[1] - 128.0
    out = np.empty((h, w, 3))
    out[:, :, 0] = yp + 1.402 * cr
    out[:, :, 1] = yp - 0.344136 * cb - 0.714136 * cr
    out[:, :, 2] = yp + 1.772 * cb
    return w, h, np.clip(np.floor(out + 0.5), 0, 255)


def image_phash(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Perceptual hash (pHash) per image payload — the standard
    image-dedup signature: decode (PNG → baseline JPEG ladder), box-
    resample the luma plane to 32x32, 2-D DCT, keep the low-frequency
    8x8 corner (DC dropped), threshold against its median → 64 sign
    bits packed into one BIGINT. Identical images always collide;
    near-identical images differ in few bits (hamming distance — pair
    via a groupBy on the hash for exact dedup, or band the bits for
    near-dup, same shape as simhash banding in operators/dedup.py).
    Arrow-batched map-side; undecodable payloads yield NULL hashes.
    """
    import numpy as np

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("phash", T.LongType()),
        ]
    )
    _png = decode_png
    _jpg = decode_jpeg_pixels

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        k = np.arange(32)
        D = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / 64) * np.sqrt(
            2.0 / 32
        )
        D[0, :] = np.sqrt(1.0 / 32)

        def box32(gray):
            h, w = gray.shape
            if (h, w) == (32, 32):
                return gray.astype(np.float64)
            # integral-image box means (vectorized — the Python
            # per-cell loop was the pHash throughput bottleneck).
            # Windows are >= 1 px by construction: starts clamp to the
            # last pixel and ends to start+1, so images SMALLER than
            # 32 on an axis upsample by window repetition instead of
            # producing empty slices.
            i = np.arange(32)
            ys = np.minimum(h * i // 32, h - 1)
            ye = np.maximum(h * (i + 1) // 32, ys + 1)
            xs = np.minimum(w * i // 32, w - 1)
            xe = np.maximum(w * (i + 1) // 32, xs + 1)
            S = np.zeros((h + 1, w + 1))
            S[1:, 1:] = gray.astype(np.float64).cumsum(0).cumsum(1)
            sums = (
                S[np.ix_(ye, xe)]
                - S[np.ix_(ys, xe)]
                - S[np.ix_(ye, xs)]
                + S[np.ix_(ys, xs)]
            )
            areas = np.outer(ye - ys, xe - xs)
            return sums / areas

        for pdf in it:
            rows = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                content = bytes(content)
                dec = _png(content) or _jpg(content)
                if dec is None or dec[0] < 1 or dec[1] < 1:
                    rows.append((int(mid), None, None, None))
                    continue
                w, h, gray = dec
                coeff = D @ box32(gray) @ D.T
                low = coeff[:8, :8].ravel()[1:]  # drop DC
                med = np.median(low)
                bits = np.concatenate(([False], low > med))
                phash = 0
                for b in bits:
                    phash = (phash << 1) | int(b)
                # wrap to signed 64-bit for the LongType column
                if phash >= 1 << 63:
                    phash -= 1 << 64
                rows.append((int(mid), int(w), int(h), phash))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "phash"]
            )

    return df.select(id_col, content_col).mapInPandas(batches, schema)


def resample_pcm(
    df: DataFrame,
    dst_rate: int,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Sample-rate conversion over decoded PCM16 audio (the
    rate-normalization step every audio training pipeline needs before
    batching): linear interpolation at positions ``j * src/dst``
    seconds, computed INTEGER-FIRST so the arithmetic is SQL-portable —

        num = j * src_rate;  k = num // dst;  f = (num % dst) / dst
        out[j] = s[k]            if f == 0
               = s[k]*(1-f) + s[k+1]*f   otherwise

    with ``n_out = (n_in - 1) * dst // src + 1`` output positions (the
    last never reads past the stream). One row per output sample
    (media_id, idx, val) — a planted linear-ramp fixture makes the
    whole chain exactly replayable in SQL (q_audio_resample).
    Mono streams only (multi-channel payloads emit nothing, same skip
    contract as sub-frame streams elsewhere); undecodable payloads
    emit a single null row. Map-side Arrow batches; audio bytes never
    shuffle, a payload's samples never cross tasks."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("idx", T.LongType()),
            T.StructField("val", T.DoubleType()),
        ]
    )
    _wav = decode_wav_samples

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        for pdf in it:
            rows = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                mid = int(mid)
                dec = _wav(bytes(content))
                if dec is None:
                    rows.append((mid, None, None))
                    continue
                nch, src_rate, s = dec
                if nch != 1 or len(s) < 2:
                    continue
                x = s.astype(_np.float64)
                n_out = (len(s) - 1) * dst_rate // src_rate + 1
                j = _np.arange(n_out, dtype=_np.int64)
                num = j * src_rate
                k = num // dst_rate
                rem = num % dst_rate
                f = rem / float(dst_rate)
                k2 = _np.minimum(k + 1, len(s) - 1)
                val = _np.where(
                    rem == 0, x[k], x[k] * (1.0 - f) + x[k2] * f
                )
                rows.extend(zip([mid] * n_out, j.tolist(), val.tolist()))
            yield _pd.DataFrame(rows, columns=["media_id", "idx", "val"])

    return df.select(id_col, content_col).mapInPandas(batches, schema)


def phash_near_dup_pairs(
    hashes: DataFrame,
    max_hamming: int = 10,
    id_col: str = "media_id",
    hash_col: str = "phash",
    bits: int = 64,
) -> DataFrame:
    """IMAGE near-dup pairs from perceptual hashes — the pigeonhole
    banding of ``simhash_near_dup_pairs`` (operators/dedup.py) applied
    to :func:`image_phash` output: split the 64-bit hash into
    ``ceil(bits/(max_hamming+1))``-bit chunks (any pair within hamming
    k must agree exactly on >= 1 of the k+1 chunks), equi-join per
    chunk, verify with popcount. Sub-quadratic: candidates are pairs
    colliding on a chunk, never the full cross product — the 100 TB
    image-dedup shape (near-identical crops / re-encodes / brightness
    shifts land within a few bits of each other; unrelated images sit
    near hamming 32).

    The signatures relation is persisted for the duration of the
    returned plan; the handle rides on the result via
    ``track_persisted`` — call ``unpersist_deps(result)`` after the
    last action (or ``spark.catalog.clearCache()``) in a long-lived
    session.
    """
    from pyspark import StorageLevel

    from oakstore_spark.operators.scaling import track_persisted

    k = max_hamming + 1
    chunk = -(-bits // k)
    # persisted: both sides of the chunk self-join would otherwise
    # re-run the upstream decode + DCT + hash (same rationale as
    # simhash_near_dup_pairs, operators/dedup.py)
    sigs = (
        hashes.where(F.col(hash_col).isNotNull())
        .select(F.col(id_col).alias("id"), F.col(hash_col).alias("ph"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    mask = (1 << chunk) - 1
    banded = sigs.select(
        "id",
        "ph",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_id"),
                        F.shiftrightunsigned(F.col("ph"), i * chunk)
                        .bitwiseAND(F.lit(mask))
                        .alias("ckey"),
                    )
                    for i in range(k)
                ]
            )
        ).alias("cc"),
    ).select("id", "ph", "cc.chunk_id", "cc.ckey")

    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.chunk_id") == F.col("r.chunk_id"))
            & (F.col("l.ckey") == F.col("r.ckey"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.ph").alias("ph_a"),
            F.col("r.ph").alias("ph_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
    out = (
        cand.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    return track_persisted(out, sigs)


def video_frame_motion(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """PIXEL-level inter-frame motion from real video bytes: decode
    consecutive MJPEG frames (:func:`decode_avi_frames` ×
    :func:`decode_jpeg_pixels`) and emit, per consecutive pair, the
    mean and max absolute per-pixel luma difference — the motion-
    intensity signal a video curation pipeline uses to drop static
    screens-recordings and slideshows (near-zero motion) or corrupted
    strobing (saturated motion). Where q_video_scene_cuts compares
    frame MEANS, this compares every pixel: a scene cut and a global
    brightness ramp are distinguishable.

    Sums are exact int64 (integer luma), ``mad = sad / n_px`` with one
    division — SQL-replayable from planted frames. All pairwise work
    happens IN the kernel: a payload's frames never cross tasks, one
    small row per frame pair shuffles. Degrade: undecodable container
    → one null row; a pair with an undecodable member → null stats.
    """
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("n_px", T.LongType()),
            T.StructField("sad", T.LongType()),
            T.StructField("mad", T.DoubleType()),
            T.StructField("max_abs_diff", T.IntegerType()),
        ]
    )
    cols = [f.name for f in schema.fields]
    _avi = decode_avi_frames
    _jpg = decode_jpeg_pixels

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        for pdf in it:
            rows = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                mid = int(mid)
                frames = _avi(bytes(content))
                if not frames:
                    # undecodable OR empty container -> one null row
                    # (a 1-frame video still yields zero PAIR rows,
                    # which is inherent to pairwise motion)
                    rows.append((mid,) + (None,) * 5)
                    continue
                prev = None
                for idx, payload in enumerate(frames):
                    dec = _jpg(payload)
                    cur = None if dec is None else dec[2].astype(_np.int64)
                    if idx > 0:
                        if (
                            prev is None
                            or cur is None
                            or prev.shape != cur.shape
                        ):
                            rows.append((mid, idx, None, None, None, None))
                        else:
                            d = _np.abs(cur - prev)
                            n = int(d.size)
                            sad = int(d.sum())
                            rows.append(
                                (mid, idx, n, sad, sad / n, int(d.max()))
                            )
                    prev = cur
            yield _pd.DataFrame(rows, columns=cols)

    return df.select(id_col, content_col).mapInPandas(batches, schema)
