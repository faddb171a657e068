"""Multimodal plumbing tests: schemas, mapInPandas batch contract,
determinism of the stubbed decoders, and the REAL pure-stdlib PNG
decode path (encoder below is also stdlib-only: zlib + struct)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from oakstore_spark.operators.multimodal import (
    IMAGE_FEATURE_DIM,
    audio_metadata,
    decode_png,
    extract_image_features,
    sample_video_frames,
)


def encode_png(px: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal PNG writer for tests: 8-bit, shape (h, w) gray, (h, w, 3)
    RGB, or (h, w, 4) RGBA; every scanline uses ``filter_type``
    (0=None or 2=Up — enough to exercise both unfilter branches)."""
    if px.ndim == 2:
        ct, nch = 0, 1
        px = px[:, :, None]
    else:
        ct, nch = {3: 2, 4: 6}[px.shape[2]], px.shape[2]
    h, w = px.shape[:2]
    raw = bytearray()
    prev = np.zeros((w, nch), dtype=np.uint8)
    for y in range(h):
        line = px[y].astype(np.uint8)
        if filter_type == 0:
            raw.append(0)
            raw += line.tobytes()
        else:  # Up filter: stored = cur - prev (mod 256)
            raw.append(2)
            raw += (line - prev).tobytes()
        prev = line

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + typ
            + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_decode_png_roundtrip_gray_rgb_rgba():
    rng = np.random.RandomState(3)
    gray = rng.randint(0, 256, (12, 16), dtype=np.uint8)
    w, h, g = decode_png(encode_png(gray))
    assert (w, h) == (16, 12)
    assert np.array_equal(g, gray.astype(np.float64))

    rgb = rng.randint(0, 256, (9, 7, 3), dtype=np.uint8)
    w, h, g = decode_png(encode_png(rgb))
    assert (w, h) == (7, 9)
    want = rgb[..., 0] * 0.299 + rgb[..., 1] * 0.587 + rgb[..., 2] * 0.114
    assert np.allclose(g, want)

    rgba = rng.randint(0, 256, (5, 5, 4), dtype=np.uint8)
    w, h, g = decode_png(encode_png(rgba))
    assert (w, h) == (5, 5)

    # Up-filtered scanlines decode identically to filter-None
    w, h, g2 = decode_png(encode_png(gray, filter_type=2))
    assert np.array_equal(g2, gray.astype(np.float64))

    assert decode_png(b"not a png at all") is None


def test_image_features_real_png_path(spark):
    """PNG payloads through the Spark operator must report TRUE decoded
    dimensions and band-mean features — not the digest fake."""
    rng = np.random.RandomState(7)
    imgs = {
        1: rng.randint(0, 256, (32, 48), dtype=np.uint8),          # gray
        2: rng.randint(0, 256, (16, 24, 3), dtype=np.uint8),       # rgb
        3: np.tile(np.arange(64, dtype=np.uint8)[:, None], (1, 10)),  # gradient
    }
    rows = [(k, encode_png(v)) for k, v in imgs.items()]
    rows.append((4, b"\x00\x01binary-not-png" * 100))  # fake fallback
    # rung 2 of the ladder: a real color baseline JPEG decodes to its
    # true luma (band means computed from the DECODED pixels)
    from oakstore_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_baseline_color,
    )

    jpg_rgb = rng.randint(0, 256, (32, 48, 3)).astype(np.uint8)
    jpg_blob = encode_jpeg_baseline_color(jpg_rgb, quality=85)
    rows.append((5, jpg_blob))
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    df = spark.createDataFrame(rows, schema).repartition(2)
    out = extract_image_features(df).toPandas().set_index("media_id")
    assert int(out.loc[5, "width"]) == 48 and int(out.loc[5, "height"]) == 32
    jpg_luma = decode_jpeg_pixels(jpg_blob)[2]
    want5 = [
        float(b.mean()) / 255.0
        for b in np.array_split(jpg_luma, IMAGE_FEATURE_DIM, axis=0)
    ]
    assert list(out.loc[5, "features"]) == pytest.approx(want5, abs=1e-6)
    for k, px in imgs.items():
        hh, ww = px.shape[:2]
        assert int(out.loc[k, "width"]) == ww
        assert int(out.loc[k, "height"]) == hh
        if px.ndim == 2:
            gray = px.astype(np.float64)
        else:
            gray = px[..., 0] * 0.299 + px[..., 1] * 0.587 + px[..., 2] * 0.114
        want = [
            float(b.mean()) / 255.0
            for b in np.array_split(gray, IMAGE_FEATURE_DIM, axis=0)
        ]
        got = list(out.loc[k, "features"])
        assert got == pytest.approx(want, abs=1e-6)
    # the gradient's band means must ascend — real pixel data, not a hash
    grad = list(out.loc[3, "features"])
    assert all(a < b for a, b in zip(grad, grad[1:]))
    # non-PNG fell back to the digest fake (dimensions within its range)
    assert 64 <= int(out.loc[4, "width"]) < 256


def _media_df(spark, n=20, payload=8192):
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    rows = [(i, bytes([i % 256]) * payload) for i in range(n)]
    return spark.createDataFrame(rows, schema).repartition(4)


def test_image_features_schema_and_determinism(spark):
    df = _media_df(spark)
    out = extract_image_features(df)
    assert [f.name for f in out.schema.fields] == [
        "media_id", "width", "height", "n_bytes", "features",
    ]
    pdf = out.toPandas().sort_values("media_id").reset_index(drop=True)
    assert len(pdf) == 20
    assert (pdf["n_bytes"] == 8192).all()
    assert all(len(f) == IMAGE_FEATURE_DIM for f in pdf["features"])
    # deterministic: same content -> same features on a re-run
    pdf2 = extract_image_features(df).toPandas().sort_values("media_id").reset_index(drop=True)
    assert (pdf["width"] == pdf2["width"]).all()
    assert pdf["features"].map(tuple).equals(pdf2["features"].map(tuple))


def test_video_frame_sampling_one_to_many(spark):
    df = _media_df(spark, n=3, payload=4096 * 25)
    out = sample_video_frames(df, every_n=10).toPandas()
    # 25 chunks sampled every 10 -> frames 0, 10, 20 per media
    assert sorted(out[out.media_id == 0]["frame_idx"].tolist()) == [0, 10, 20]
    assert len(out) == 9


def test_audio_metadata(spark):
    df = _media_df(spark, n=4, payload=32000)
    out = audio_metadata(df).toPandas()
    assert (out["duration_sec"] == 1.0).all()  # 32000 bytes / (2*16000)
    assert (out["sample_rate"] == 16000).all()


def test_video_frames_multibyte_bytes_not_chars(spark):
    """Frame chunking must operate on BYTES: a multibyte doc's chunk
    boundaries differ from its char boundaries."""
    import hashlib

    text = "汉" * 3000  # 3 bytes/char in UTF-8 -> 9000 bytes, 2 chunks
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"]).select(
        F.col("doc_id").alias("media_id"), F.encode("text", "UTF-8").alias("content")
    )
    out = sample_video_frames(df, every_n=1).toPandas().sort_values("frame_idx")
    raw = text.encode("utf-8")
    assert len(out) == len(raw) // 4096  # 2 full 4KB chunks
    for r in out.itertuples():
        expect = hashlib.md5(raw[r.frame_idx * 4096 : (r.frame_idx + 1) * 4096]).hexdigest()
        assert r.frame_md5 == expect


def test_decode_png_corrupt_bytes_return_none_not_raise():
    """Contract (ADVICE r2): any payload with the PNG magic but corrupt
    innards (truncated IHDR, torn IDAT, short scanlines) must return
    None so the extract_image_features decode ladder can degrade — an
    exception here would fail the whole Spark task."""
    import numpy as np

    from oakstore_spark.operators.multimodal import decode_png, encode_gray_png

    good = encode_gray_png(np.arange(64, dtype=np.uint8).reshape(8, 8))
    for cut in (9, 12, 20, 33, len(good) - 5):
        out = decode_png(good[:cut])
        assert out is None or len(out) == 3
    torn = bytearray(good)
    torn[35] ^= 0xFF  # flip a byte inside the IDAT deflate stream
    out = decode_png(bytes(torn))
    assert out is None or len(out) == 3
    assert decode_png(b"\x89PNG\r\n\x1a\n") is None  # magic only


def test_wav_roundtrip_exact():
    """encode_wav_pcm16 -> decode_wav must recover every header field
    exactly (channels, rate, bits, frame count, duration)."""
    import numpy as np

    from oakstore_spark.operators.multimodal import decode_wav, encode_wav_pcm16

    for rate, nch, frames in [(8000, 1, 100), (44100, 2, 4410), (22050, 1, 1)]:
        samples = np.arange(frames * nch, dtype=np.int16)
        wav = encode_wav_pcm16(samples, rate, nch)
        dec = decode_wav(wav)
        assert dec == (nch, rate, 16, frames, frames / rate)


def test_wav_corrupt_bytes_return_none_not_raise():
    """Same graceful-degrade contract as decode_png: RIFF magic with
    corrupt innards returns None (never raises into the Spark task)."""
    import numpy as np

    from oakstore_spark.operators.multimodal import decode_wav, encode_wav_pcm16

    good = encode_wav_pcm16(np.zeros(64, dtype=np.int16), 16000)
    assert decode_wav(b"not riff at all") is None
    assert decode_wav(b"RIFF\x00\x00\x00\x00WAVE") is None  # no chunks
    for cut in (13, 20, 30, 43):
        out = decode_wav(good[:cut])
        assert out is None or len(out) == 5
    # non-PCM codec id must be rejected, not misparsed
    import struct

    mutant = bytearray(good)
    mutant[20:22] = struct.pack("<H", 3)  # IEEE float codec
    assert decode_wav(bytes(mutant)) is None


def test_audio_metadata_real_wav_ladder(spark):
    """audio_metadata must take the REAL decode rung for RIFF payloads
    (true rate/channels, codec='pcm_wav') and the documented assumed
    fallback for everything else."""
    import numpy as np

    from oakstore_spark.operators.multimodal import audio_metadata, encode_wav_pcm16

    wav = encode_wav_pcm16(np.zeros(32000, dtype=np.int16), 32000)
    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(b"x" * 32000))],
        "media_id long, content binary",
    )
    out = audio_metadata(df).toPandas().set_index("media_id")
    assert out.loc[1, "codec"] == "pcm_wav"
    assert out.loc[1, "sample_rate"] == 32000
    assert out.loc[1, "duration_sec"] == 1.0
    assert out.loc[2, "codec"] == "assumed_pcm16"
    assert out.loc[2, "sample_rate"] == 16000
    assert out.loc[2, "duration_sec"] == 1.0


def test_avi_roundtrip_exact():
    """encode_avi_header -> decode_avi must recover width/height/frames
    and the exact integer microseconds-per-frame the header stores."""
    from oakstore_spark.operators.multimodal import decode_avi, encode_avi_header

    for w, h, nf, fps in [(320, 240, 120, 24), (1920, 1080, 1, 30), (160, 120, 50000, 12)]:
        assert decode_avi(encode_avi_header(w, h, nf, fps)) == (
            w, h, nf, 1_000_000 // fps
        )


def test_avi_corrupt_bytes_return_none_not_raise():
    from oakstore_spark.operators.multimodal import decode_avi, encode_avi_header

    good = encode_avi_header(320, 240, 120, 24)
    assert decode_avi(b"RIFF\x08\x00\x00\x00WAVEdata") is None  # wrong form
    for cut in (11, 13, 20, 30, 50):
        out = decode_avi(good[:cut])
        assert out is None or len(out) == 4
    torn = bytearray(good)
    torn[16:20] = b"\xff\xff\xff\xff"  # absurd LIST size
    assert decode_avi(bytes(torn)) is None or len(decode_avi(bytes(torn))) == 4


def test_video_metadata_real_avi_ladder(spark):
    from oakstore_spark.operators.multimodal import encode_avi_header, video_metadata

    avi = encode_avi_header(640, 480, 240, 24)
    df = spark.createDataFrame(
        [(1, bytearray(avi)), (2, bytearray(b"x" * 8192))],
        "media_id long, content binary",
    )
    out = video_metadata(df).toPandas().set_index("media_id")
    assert out.loc[1, "codec"] == "avi"
    assert (out.loc[1, "width"], out.loc[1, "height"]) == (640, 480)
    assert out.loc[1, "n_frames"] == 240
    assert out.loc[1, "duration_sec"] == pytest.approx(240 * (1_000_000 // 24) / 1e6)
    assert out.loc[2, "codec"] == "assumed_chunks"
    assert out.loc[2, "n_frames"] == 2  # 8192 / 4096


def test_binary_file_source_ingest_and_decode(spark, tmp_path):
    """binaryFile-source ingest of a mixed media directory: the glob
    prunes non-matching files at listing time, content arrives as an
    opaque binary column, and the pure-stdlib decoders recover the
    exact media properties written."""
    import numpy as np

    from oakstore_spark.operators.multimodal import (
        decode_png,
        decode_wav,
        encode_gray_png,
        encode_wav_pcm16,
    )
    from oakstore_spark.sources import read_binary_files

    media = tmp_path / "media"
    media.mkdir()
    (media / "a.png").write_bytes(
        encode_gray_png(np.arange(48, dtype=np.uint8).reshape(6, 8))
    )
    (media / "b.png").write_bytes(
        encode_gray_png(np.zeros((3, 5), dtype=np.uint8))
    )
    (media / "c.wav").write_bytes(
        encode_wav_pcm16(np.zeros(400, dtype=np.int16), sample_rate=8000)
    )
    (media / "junk.txt").write_bytes(b"not media")

    pngs = read_binary_files(spark, str(media), glob="*.png")
    rows = {r.path.rsplit("/", 1)[-1]: r for r in pngs.collect()}
    assert set(rows) == {"a.png", "b.png"}  # txt + wav pruned by glob
    w, h, gray = decode_png(bytes(rows["a.png"].content))
    assert (w, h) == (8, 6) and gray.shape == (6, 8)
    assert rows["a.png"].length == len(bytes(rows["a.png"].content))

    wavs = read_binary_files(spark, str(media), glob="*.wav").collect()
    assert len(wavs) == 1
    n_ch, rate, bits, n_frames, dur = decode_wav(bytes(wavs[0].content))
    assert (n_ch, rate, bits, n_frames) == (1, 8000, 16, 400)


def test_jpeg_meta_roundtrip_and_corruption():
    """encode_jpeg_header -> decode_jpeg_meta recovers the exact frame
    geometry for baseline and progressive frames; corrupt payloads
    (bad magic, truncation, SOS-before-SOF) return None, never raise."""
    from oakstore_spark.operators.multimodal import (
        decode_jpeg_meta,
        encode_jpeg_header,
    )

    for w, h, c, prog in [(640, 480, 3, False), (31, 7, 1, True)]:
        got = decode_jpeg_meta(encode_jpeg_header(w, h, c, prog))
        assert got == (w, h, c, prog), got

    good = encode_jpeg_header(64, 32, 3)
    assert decode_jpeg_meta(b"not a jpeg") is None
    assert decode_jpeg_meta(good[:6]) is None  # truncated mid-APP0
    assert decode_jpeg_meta(good[:2]) is None  # bare SOI
    # SOS with no SOF before it
    assert decode_jpeg_meta(b"\xff\xd8\xff\xda\x00\x02\xff\xd9") is None
    # every prefix must degrade gracefully
    for i in range(len(good)):
        decode_jpeg_meta(good[:i])


def test_decode_wav_samples_roundtrip_and_corruption(spark):
    import numpy as np

    from oakstore_spark.operators.multimodal import (
        decode_wav_samples,
        encode_wav_pcm16,
    )

    s = np.array([0, 100, -100, 32767, -32768, 5], dtype=np.int16)
    wav = encode_wav_pcm16(s, 22050, 1)
    nch, rate, got = decode_wav_samples(wav)
    assert (nch, rate) == (1, 22050)
    assert np.array_equal(got, s)
    # stereo interleave survives
    wav2 = encode_wav_pcm16(s, 8000, 2)
    nch2, rate2, got2 = decode_wav_samples(wav2)
    assert (nch2, rate2) == (2, 8000) and np.array_equal(got2, s)
    # graceful degrade: garbage, truncated, non-PCM16
    assert decode_wav_samples(b"not riff at all") is None
    assert decode_wav_samples(wav[:20]) is None


def test_audio_features_hand_values(spark):
    import numpy as np

    from oakstore_spark.operators.multimodal import (
        audio_features,
        encode_wav_pcm16,
    )

    s = np.array([1, -1, 1, -1], dtype=np.int16)    # rms 1, 3 crossings
    flat = np.array([7, 7, 7], dtype=np.int16)      # rms 7, 0 crossings
    df = spark.createDataFrame(
        [
            (1, bytearray(encode_wav_pcm16(s, 16000, 1))),
            (2, bytearray(encode_wav_pcm16(flat, 16000, 1))),
            (3, bytearray(b"junk")),
        ],
        "media_id long, content binary",
    )
    got = {r["media_id"]: r for r in audio_features(df).collect()}
    assert got[1]["rms"] == pytest.approx(1.0) and got[1]["n_zero_cross"] == 3
    assert got[2]["rms"] == pytest.approx(7.0) and got[2]["n_zero_cross"] == 0
    assert got[3]["rms"] is None and got[3]["n_samples"] is None


def test_resize_thumbnail_exact_block_means(spark):
    import numpy as np

    from oakstore_spark.operators.multimodal import (
        encode_gray_png,
        resize_image_thumbnails,
    )

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (20, 12), dtype=np.uint8)   # not divisible by 8
    df = spark.createDataFrame(
        [(1, bytearray(encode_gray_png(img))), (2, bytearray(b"nope"))],
        "media_id long, content binary",
    )
    got = {r["media_id"]: r for r in
           resize_image_thumbnails(df, 8, 8).collect()}
    assert (got[1]["width"], got[1]["height"]) == (12, 20)
    g = img.astype(np.float64)
    ys = [20 * i // 8 for i in range(9)]
    xs = [12 * j // 8 for j in range(9)]
    ref = [
        g[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean()
        for i in range(8) for j in range(8)
    ]
    assert got[1]["thumb"] == pytest.approx(ref)
    assert got[1]["thumb_mean"] == pytest.approx(float(np.mean(ref)))
    assert got[2]["thumb"] is None


def test_mjpeg_avi_roundtrip_and_corruption(spark):
    from oakstore_spark.operators.multimodal import (
        decode_avi,
        decode_avi_frames,
        encode_jpeg_header,
        encode_mjpeg_avi,
    )

    # odd-length frame forces the RIFF word-alignment path
    f_odd = encode_jpeg_header(32, 16, 1)   # 1-component header is odd-length
    assert len(f_odd) % 2 == 1
    f_even = encode_jpeg_header(48, 32, 3)
    avi = encode_mjpeg_avi([f_odd, f_even, f_odd], 48, 32, 30)
    assert decode_avi(avi) == (48, 32, 3, 33333)
    frames = decode_avi_frames(avi)
    assert frames == [f_odd, f_even, f_odd]
    # degrade contract
    assert decode_avi_frames(b"RIFFxxxxWAVE") is None
    assert decode_avi_frames(b"short") is None
    assert decode_avi_frames(encode_mjpeg_avi([], 8, 8, 10)) == []


def test_jpeg_pixel_codec_exact_reference_parity():
    """decode_jpeg_pixels must reproduce the lossy baseline pipeline
    EXACTLY: for encoder output, the decoded luma equals an independent
    numpy model (FDCT -> quantize -> dequantize -> IDCT -> round/clip)
    bit-for-bit, across even/odd/padded geometries."""
    import numpy as np

    from oakstore_spark.operators.multimodal import (
        _jpeg_dct_matrix,
        _jpeg_quality_table,
        decode_jpeg_meta,
        decode_jpeg_pixels,
        encode_jpeg_baseline_gray,
    )

    rng = np.random.default_rng(3)
    C = _jpeg_dct_matrix()
    for (h, w), q in [((8, 8), 85), ((32, 32), 75), ((24, 40), 85),
                      ((33, 17), 50), ((1, 1), 95)]:
        px = rng.integers(0, 256, (h, w), dtype=np.uint8)
        blob = encode_jpeg_baseline_gray(px, quality=q)
        assert decode_jpeg_meta(blob) == (w, h, 1, False)
        dw, dh, gray = decode_jpeg_pixels(blob)
        assert (dw, dh) == (w, h) and gray.shape == (h, w)
        Q = _jpeg_quality_table(q).astype(np.float64)
        ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
        pad = np.pad(px, ((0, ph - h), (0, pw - w)), mode="edge").astype(
            np.float64
        )
        exp = np.zeros((ph, pw))
        for by in range(ph // 8):
            for bx in range(pw // 8):
                B = pad[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] - 128.0
                qz = np.round((C @ B @ C.T) / Q)
                exp[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = (
                    C.T @ (qz * Q) @ C
                )
        exp = np.clip(np.round(exp + 128.0), 0, 255)[:h, :w]
        assert np.array_equal(exp, gray), (h, w, q)

    # smooth content survives q95 losslessly (DCT of a linear ramp is
    # concentrated in low frequencies the q95 table keeps exactly)
    gx = np.tile(np.arange(64, dtype=np.uint8) * 2, (64, 1))
    d = decode_jpeg_pixels(encode_jpeg_baseline_gray(gx, quality=95))[2]
    assert np.abs(d - gx).max() == 0

    # adversarial max-frequency block at quality 100: the coefficient
    # clamp to baseline's 10-bit category cap must keep this encodable
    # (it used to KeyError), and the checkerboard survives exactly
    cb = np.zeros((8, 8), dtype=np.uint8)
    cb[::2, 1::2] = 255
    cb[1::2, ::2] = 255
    d = decode_jpeg_pixels(encode_jpeg_baseline_gray(cb, quality=100))[2]
    assert np.abs(d - cb).max() == 0


def test_jpeg_pixel_corruption_returns_none_not_raise():
    import numpy as np

    from oakstore_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_baseline_gray,
        encode_jpeg_header,
    )

    rng = np.random.default_rng(5)
    blob = encode_jpeg_baseline_gray(
        rng.integers(0, 256, (16, 16), dtype=np.uint8)
    )
    assert decode_jpeg_pixels(b"") is None
    assert decode_jpeg_pixels(b"\x89PNG\r\n\x1a\n") is None
    assert decode_jpeg_pixels(blob[:24]) is None
    assert decode_jpeg_pixels(b"\xff\xd8" + b"junk" * 8) is None
    # header-only stream (no tables, no entropy data) degrades to None
    assert decode_jpeg_pixels(encode_jpeg_header(32, 16, 1)) is None
    # 3-component / progressive headers are out of scope -> None
    assert decode_jpeg_pixels(encode_jpeg_header(32, 16, 3)) is None
    # torn entropy bytes must never raise
    for cut in (len(blob) // 2, len(blob) - 3):
        torn = bytearray(blob)
        torn[cut] ^= 0x55
        decode_jpeg_pixels(bytes(torn))  # None or garbage, no exception


def test_jpeg_pixel_cap_rejects_huge_and_zero_dims():
    """A crafted SOF claiming 65535x65535 must return None FAST (no
    ~34 GB allocation, no minutes of bit-at-a-time decode), and a
    legitimate frame above the default 2 MP cap must degrade to None so
    extract_image_features falls through to PIL/fake instead of
    stalling the task (ADVICE r4). Zero dims likewise."""
    import struct
    import time

    import numpy as np

    from oakstore_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_baseline_gray,
    )

    rng = np.random.default_rng(11)
    blob = encode_jpeg_baseline_gray(
        rng.integers(0, 256, (16, 16), dtype=np.uint8)
    )

    def with_sof_dims(b: bytes, w: int, h: int) -> bytes:
        i = b.find(b"\xff\xc0")
        assert i >= 0
        out = bytearray(b)
        # SOF0 body: len(2) precision(1) height(2) width(2) ...
        out[i + 5 : i + 9] = struct.pack(">HH", h, w)
        return bytes(out)

    t0 = time.monotonic()
    assert decode_jpeg_pixels(with_sof_dims(blob, 65535, 65535)) is None
    assert time.monotonic() - t0 < 1.0
    assert decode_jpeg_pixels(with_sof_dims(blob, 0, 16)) is None
    assert decode_jpeg_pixels(with_sof_dims(blob, 16, 0)) is None
    # explicit cap override: the same 16x16 frame above a tiny cap
    assert decode_jpeg_pixels(blob, max_pixels=100) is None
    assert decode_jpeg_pixels(blob) is not None  # under the default cap


def test_resize_thumbnails_jpeg_block_mean_parity(spark):
    """Thumbnails over JPEG payloads: the 8x8 block means of the
    thumbnail must equal the block means of the reference-reconstructed
    (lossy) pixels EXACTLY — pinning the decode ladder's JPEG rung and
    the resize math together, with PNG and JPEG payloads mixed in one
    relation."""
    import numpy as np
    import pytest

    from oakstore_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_gray_png,
        encode_jpeg_baseline_gray,
        resize_image_thumbnails,
    )

    rng = np.random.default_rng(11)
    px_jpg = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    px_png = rng.integers(0, 256, (16, 24), dtype=np.uint8)
    rows = [
        (1, bytearray(encode_jpeg_baseline_gray(px_jpg, quality=85))),
        (2, bytearray(encode_gray_png(px_png))),
        (3, bytearray(b"not an image")),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r["media_id"]: r for r in resize_image_thumbnails(df, 8, 8).collect()}

    # JPEG rung: reference = decoded (lossy) pixels' exact block means
    ref_pixels = decode_jpeg_pixels(bytes(rows[0][1]))[2]
    ref = ref_pixels.reshape(8, 4, 8, 4).mean(axis=(1, 3))
    assert got[1]["width"] == 32 and got[1]["height"] == 32
    assert got[1]["thumb"] == pytest.approx(list(ref.ravel()))
    # PNG rung still works in the same relation
    assert got[2]["width"] == 24 and got[2]["height"] == 16
    assert got[2]["thumb"] is not None
    # junk degrades to nulls
    assert got[3]["thumb"] is None


def test_jpeg_pixel_codec_property_random_shapes():
    """Property (hypothesis): for ANY geometry/quality/content, encode →
    decode reproduces the independent numpy model of the lossy pipeline
    bit-for-bit, geometry round-trips, and output stays in [0, 255].
    Pure-Python path — no Spark — so shrinkage is cheap."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from oakstore_spark.operators.multimodal import (
        _jpeg_dct_matrix,
        _jpeg_quality_table,
        decode_jpeg_pixels,
        encode_jpeg_baseline_gray,
    )

    C = _jpeg_dct_matrix()

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 40),
        w=st.integers(1, 40),
        q=st.integers(1, 100),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(h, w, q, seed):
        px = np.random.default_rng(seed).integers(
            0, 256, (h, w), dtype=np.uint8
        )
        blob = encode_jpeg_baseline_gray(px, quality=q)
        dw, dh, gray = decode_jpeg_pixels(blob)
        assert (dw, dh) == (w, h) and gray.shape == (h, w)
        assert gray.min() >= 0 and gray.max() <= 255
        Q = _jpeg_quality_table(q).astype(np.float64)
        ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
        pad = np.pad(
            px, ((0, ph - h), (0, pw - w)), mode="edge"
        ).astype(np.float64)
        exp = np.zeros((ph, pw))
        for by in range(ph // 8):
            for bx in range(pw // 8):
                B = pad[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] - 128.0
                qz = np.clip(np.round((C @ B @ C.T) / Q), -1023, 1023)
                exp[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = (
                    C.T @ (qz * Q) @ C
                )
        exp = np.clip(np.round(exp + 128.0), 0, 255)[:h, :w]
        assert np.array_equal(exp, gray)

    check()


def test_jpeg_color_codec_exact_luma_parity():
    """3-component baseline JPEG (4:4:4 and 4:2:0 MCU interleave):
    decoded luma must equal the independent numpy model of the Y-channel
    pipeline bit-for-bit (chroma blocks advance the bitstream but never
    touch the luma plane), across odd/padded geometries."""
    import numpy as np

    from oakstore_spark.operators.multimodal import (
        _jpeg_dct_matrix,
        _jpeg_quality_table,
        decode_jpeg_meta,
        decode_jpeg_pixels,
        encode_jpeg_baseline_color,
    )

    rng = np.random.default_rng(9)
    C = _jpeg_dct_matrix()

    def y_model(Y, q, mcu):
        Q = _jpeg_quality_table(q).astype(np.float64)
        h, w = Y.shape
        eh, ew = -(-h // mcu) * mcu, -(-w // mcu) * mcu
        pad = np.pad(Y, ((0, eh - h), (0, ew - w)), mode="edge")
        exp = np.zeros((eh, ew))
        for by in range(eh // 8):
            for bx in range(ew // 8):
                B = pad[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] - 128.0
                qz = np.clip(np.round((C @ B @ C.T) / Q), -1023, 1023)
                exp[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = (
                    C.T @ (qz * Q) @ C
                )
        return np.clip(np.round(exp + 128.0), 0, 255)[:h, :w]

    for (h, w), sub, mcu, q in [
        ((24, 40), "444", 8, 80),
        ((24, 40), "420", 16, 80),
        ((17, 33), "420", 16, 60),
        ((8, 8), "444", 8, 95),
        ((50, 18), "420", 16, 40),
    ]:
        rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        blob = encode_jpeg_baseline_color(rgb, quality=q, subsample=sub)
        assert decode_jpeg_meta(blob) == (w, h, 3, False)
        dw, dh, gray = decode_jpeg_pixels(blob)
        assert (dw, dh) == (w, h) and gray.shape == (h, w)
        r, g, b = (rgb[:, :, i].astype(np.float64) for i in range(3))
        Y = 0.299 * r + 0.587 * g + 0.114 * b
        assert np.array_equal(y_model(Y, q, mcu), gray), (h, w, sub, q)

    # corruption contract holds for color streams too
    blob = encode_jpeg_baseline_color(
        rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    )
    from oakstore_spark.operators.multimodal import decode_jpeg_pixels as djp

    assert djp(blob[:30]) is None
    torn = bytearray(blob)
    torn[len(torn) // 2] ^= 0x55
    djp(bytes(torn))  # None or garbage, never an exception


def test_video_frame_luma_exact_and_degrade(spark):
    """video_frame_luma composes the RIFF walk with the JPEG pixel
    decode: planted blockwise-constant q100 frames round-trip EXACTLY
    (DC-only, quant=1), so integer sums and the one-division mean/std
    must equal the closed form; undecodable containers emit one null
    row; a torn frame keeps its frame_idx with null stats."""
    import math

    from oakstore_spark.operators.multimodal import (
        encode_jpeg_baseline_gray,
        encode_mjpeg_avi,
        video_frame_luma,
    )

    vals = [[10, 200, 55, 127], [0, 255, 128, 99]]
    frames = []
    for vs in vals:
        img = np.zeros((16, 16), dtype=np.uint8)
        for b, v in enumerate(vs):
            by, bx = divmod(b, 2)
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = v
        frames.append(encode_jpeg_baseline_gray(img, quality=100))
    good = encode_mjpeg_avi(frames, 16, 16, 25)
    # payload 2: second frame torn mid-entropy-stream
    torn_frame = bytearray(frames[1])
    torn_frame[len(torn_frame) // 2] ^= 0x55
    half_torn = encode_mjpeg_avi([frames[0], bytes(torn_frame)], 16, 16, 25)

    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(half_torn)),
         (3, bytearray(b"not an avi at all"))],
        "media_id long, content binary",
    )
    out = video_frame_luma(df).orderBy("media_id", "frame_idx").collect()

    by_key = {(r.media_id, r.frame_idx): r for r in out}
    for i, vs in enumerate(vals):
        r = by_key[(1, i)]
        s, ss = 64 * sum(vs), 64 * sum(v * v for v in vs)
        assert (r.n_px, r.sum_luma, r.sum_sq_luma) == (256, s, ss)
        assert r.width == 16 and r.height == 16
        assert r.mean_luma == s / 256
        assert r.std_luma == math.sqrt((256 * ss - s * s) / 65536.0)
    # torn second frame: frame 0 decodes, frame 1 has null stats or
    # garbage-but-bounded stats (Huffman may still resync); container
    # row count is pinned either way
    assert (2, 0) in by_key and by_key[(2, 0)].sum_luma is not None
    assert (2, 1) in by_key
    # non-AVI payload degrades to a single null row
    r3 = [r for r in out if r.media_id == 3]
    assert len(r3) == 1 and r3[0].frame_idx is None and r3[0].n_px is None


def test_audio_spectral_tone_and_numpy_parity(spark):
    """audio_spectral_features: (a) planted on-bin tones recover the
    closed form exactly (centroid==k, dominant_share==1); (b) arbitrary
    random PCM agrees with an independent numpy STFT model to float
    tolerance; (c) junk bytes and sub-frame streams degrade to nulls."""
    from oakstore_spark.operators.multimodal import (
        audio_spectral_features,
        encode_wav_pcm16,
    )

    rng = np.random.default_rng(77)
    rand = rng.integers(-3000, 3000, 64 * 3 + 17).astype(np.int16)

    def tone(k, amp, nf):
        i = np.arange(64 * nf)
        if k == 32:
            return (amp * ((-1) ** (i % 2))).astype(np.int16)
        pat = np.array([1, 0, -1, 0], dtype=np.int64)
        return (amp * pat[i % 4]).astype(np.int16)

    df = spark.createDataFrame(
        [
            (1, bytearray(encode_wav_pcm16(tone(16, 777, 2), 16000, 1))),
            (2, bytearray(encode_wav_pcm16(tone(32, 300, 3), 16000, 1))),
            (3, bytearray(encode_wav_pcm16(rand, 8000, 1))),
            (4, bytearray(b"RIFFjunkjunkjunk")),
            (5, bytearray(encode_wav_pcm16(rand[:10], 8000, 1))),
        ],
        "media_id long, content binary",
    )
    rows = {
        r.media_id: r
        for r in audio_spectral_features(df, 64, 4).collect()
    }
    assert rows[1].n_frames == 2 and round(rows[1].centroid_bin, 6) == 16.0
    assert rows[1].dominant_band == 1 and round(rows[1].dominant_share, 6) == 1.0
    assert rows[2].n_frames == 3 and round(rows[2].centroid_bin, 6) == 32.0
    assert rows[2].dominant_band == 3 and round(rows[2].dominant_share, 6) == 1.0

    # numpy reference model over the random stream
    x = rand[: 3 * 64].astype(np.float64).reshape(3, 64)
    spec = np.fft.rfft(x, axis=1)
    e = (spec.real**2 + spec.imag**2)[:, 1:33].sum(axis=0)
    bins = np.arange(1, 33, dtype=np.float64)
    want_centroid = float((bins * e).sum() / e.sum())
    bands = np.add.reduceat(e, np.arange(0, 32, 8))
    assert rows[3].n_frames == 3
    assert abs(rows[3].centroid_bin - want_centroid) < 1e-9
    assert rows[3].dominant_band == int(bands.argmax())
    assert abs(rows[3].dominant_share - float(bands.max() / e.sum())) < 1e-12
    assert abs(rows[3].total_energy - float(e.sum())) / e.sum() < 1e-12

    assert rows[4].n_frames is None  # undecodable
    assert rows[5].n_frames == 0 and rows[5].centroid_bin is None  # < 1 frame


def test_audio_silence_stats_runs_and_degrade(spark):
    """Run-length edges for audio_silence_stats: leading/trailing/full
    silent runs, no silence at all, junk bytes -> nulls, sub-frame
    stream -> zeros."""
    from oakstore_spark.operators.multimodal import (
        audio_silence_stats,
        encode_wav_pcm16,
    )

    tone = np.tile(np.array([500, 0, -500, 0], dtype=np.int16), 16)
    zero = np.zeros(64, dtype=np.int16)

    def wav(frames):
        return bytearray(encode_wav_pcm16(np.concatenate(frames), 8000, 1))

    df = spark.createDataFrame(
        [
            (1, wav([zero, tone, zero, zero])),   # runs 1, 2 (trailing)
            (2, wav([tone, tone])),                # no silence
            (3, wav([zero, zero, zero])),          # fully silent
            (4, bytearray(b"junk")),               # undecodable
            (5, wav([tone[:1]])),                  # sub-frame
        ],
        "media_id long, content binary",
    )
    rows = {r.media_id: r for r in audio_silence_stats(df, 64, 0.0).collect()}
    assert (rows[1].n_frames, rows[1].n_silent,
            rows[1].longest_silent_run) == (4, 3, 2)
    assert (rows[2].n_silent, rows[2].longest_silent_run) == (0, 0)
    assert (rows[3].n_frames, rows[3].n_silent,
            rows[3].longest_silent_run) == (3, 3, 3)
    assert rows[4].n_frames is None
    assert (rows[5].n_frames, rows[5].longest_silent_run) == (0, 0)


def test_jpeg_rgb_decode_exact_parity():
    """decode_jpeg_rgb must equal an independent numpy model of the FULL
    color pipeline bit-for-bit: forward JFIF convert -> pad -> (box
    chroma subsample) -> per-block FDCT/quant/dequant/IDCT -> nearest
    chroma upsample -> inverse convert with half-up rounding -> clip,
    across 4:4:4/4:2:0, odd geometries and qualities."""
    import numpy as np

    from oakstore_spark.operators.multimodal import (
        _jpeg_dct_matrix,
        _jpeg_quality_table,
        _jpeg_quality_table_chroma,
        decode_jpeg_rgb,
        encode_jpeg_baseline_color,
    )

    rng = np.random.default_rng(21)
    C = _jpeg_dct_matrix()

    def blocks_roundtrip(plane, Q):
        h, w = plane.shape
        out = np.zeros((h, w))
        for by in range(h // 8):
            for bx in range(w // 8):
                B = plane[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] - 128.0
                qz = np.clip(np.round((C @ B @ C.T) / Q), -1023, 1023)
                out[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = (
                    C.T @ (qz * Q) @ C
                )
        return out + 128.0

    def rgb_model(rgb, q, sub):
        QL = _jpeg_quality_table(q).astype(np.float64)
        QC = _jpeg_quality_table_chroma(q).astype(np.float64)
        h, w, _ = rgb.shape
        r, g, b = (rgb[:, :, i].astype(np.float64) for i in range(3))
        Y = 0.299 * r + 0.587 * g + 0.114 * b
        Cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        Cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        mcu = 16 if sub == "420" else 8
        eh, ew = -(-h // mcu) * mcu, -(-w // mcu) * mcu

        def pad(p):
            return np.pad(p, ((0, eh - h), (0, ew - w)), mode="edge")

        yd = blocks_roundtrip(pad(Y), QL)[:h, :w]
        cps = []
        for p in (Cb, Cr):
            pp = pad(p)
            if sub == "420":
                pp = pp.reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
            pp = blocks_roundtrip(pp, QC)
            if sub == "420":
                pp = np.repeat(np.repeat(pp, 2, axis=0), 2, axis=1)
            cps.append(pp[:h, :w] - 128.0)
        cbd, crd = cps
        out = np.empty((h, w, 3))
        out[:, :, 0] = yd + 1.402 * crd
        out[:, :, 1] = yd - 0.344136 * cbd - 0.714136 * crd
        out[:, :, 2] = yd + 1.772 * cbd
        return np.clip(np.floor(out + 0.5), 0, 255)

    for (h, w), sub, q in [
        ((24, 40), "444", 80),
        ((24, 40), "420", 80),
        ((17, 33), "420", 60),
        ((8, 8), "444", 95),
        ((50, 18), "420", 40),
        ((16, 16), "444", 100),
    ]:
        rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        blob = encode_jpeg_baseline_color(rgb, quality=q, subsample=sub)
        dec = decode_jpeg_rgb(blob)
        assert dec is not None
        dw, dh, got = dec
        assert (dw, dh) == (w, h) and got.shape == (h, w, 3)
        assert np.array_equal(got, rgb_model(rgb, q, sub)), (h, w, sub, q)

    # degrade contract: junk, torn, oversized all None/no-raise
    blob = encode_jpeg_baseline_color(
        rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    )
    assert decode_jpeg_rgb(b"junk") is None
    assert decode_jpeg_rgb(blob, max_pixels=100) is None
    torn = bytearray(blob)
    torn[len(torn) // 2] ^= 0x55
    decode_jpeg_rgb(bytes(torn))  # None or garbage, never an exception


def test_audio_spectral_hann_overlap_numpy_parity(spark):
    """Hann window + 50% overlap path agrees with an independent numpy
    STFT model on arbitrary random PCM, and the rect/no-overlap default
    is unchanged by the framing refactor (same frames as reshape)."""
    from oakstore_spark.operators.multimodal import (
        audio_spectral_features,
        encode_wav_pcm16,
    )

    rng = np.random.default_rng(123)
    rand = rng.integers(-8000, 8000, 64 * 4 + 29).astype(np.int16)
    df = spark.createDataFrame(
        [(1, bytearray(encode_wav_pcm16(rand, 16000, 1)))],
        "media_id long, content binary",
    )
    got = audio_spectral_features(
        df, 64, 4, window="hann", hop=32
    ).collect()[0]

    w = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(64) / 64)
    starts = range(0, len(rand) - 64 + 1, 32)
    E = np.zeros(32)
    for st in starts:
        X = np.fft.rfft(rand[st : st + 64].astype(np.float64) * w)
        E += (X.real**2 + X.imag**2)[1:33]
    bins = np.arange(1, 33, dtype=np.float64)
    bands = np.add.reduceat(E, np.arange(0, 32, 8))
    assert got.n_frames == len(list(starts))
    assert abs(got.centroid_bin - float((bins * E).sum() / E.sum())) < 1e-9
    assert got.dominant_band == int(bands.argmax())
    assert abs(got.dominant_share - float(bands.max() / E.sum())) < 1e-12

    # rect default equals the pre-refactor reshape framing
    r = audio_spectral_features(df, 64, 4).collect()[0]
    x = rand[: 4 * 64].astype(np.float64).reshape(4, 64)
    spec = np.fft.rfft(x, axis=1)
    E2 = (spec.real**2 + spec.imag**2)[:, 1:33].sum(axis=0)
    assert r.n_frames == 4
    assert abs(r.total_energy - float(E2.sum())) / E2.sum() < 1e-12

    # guards
    import pytest as _pytest

    with _pytest.raises(ValueError):
        audio_spectral_features(df, 64, 4, window="hamming")
    with _pytest.raises(ValueError):
        audio_spectral_features(df, 64, 4, hop=0)


def test_sample_video_frames_real_avi_ladder(spark):
    """sample_video_frames must walk REAL AVI containers to true frame
    payload digests (not chunk digests), while non-AVI bytes keep the
    documented chunk-fake contract (pinned elsewhere)."""
    import hashlib

    from oakstore_spark.operators.multimodal import (
        encode_jpeg_header,
        encode_mjpeg_avi,
        sample_video_frames,
    )

    frames = [encode_jpeg_header(32, 16, 1) for _ in range(5)]
    # make each frame's bytes distinct so digests discriminate
    frames = [f + bytes([i]) for i, f in enumerate(frames)]
    avi = encode_mjpeg_avi(frames, 32, 16, 25)
    df = spark.createDataFrame(
        [(1, bytearray(avi))], "media_id long, content binary"
    )
    out = (
        sample_video_frames(df, every_n=2)
        .toPandas()
        .sort_values("frame_idx")
    )
    assert out["frame_idx"].tolist() == [0, 2, 4]
    for r in out.itertuples():
        assert r.frame_md5 == hashlib.md5(frames[r.frame_idx]).hexdigest()


def test_image_phash_invariance_and_hamming(spark):
    """pHash contract: identical payloads collide exactly; a small
    local edit moves FEW bits (hamming < 16 of 64); a different image
    is far (hamming > 16); junk bytes yield null hash."""
    from oakstore_spark.operators.multimodal import image_phash

    rng = np.random.RandomState(42)
    base = rng.randint(0, 256, (32, 32), dtype=np.uint8)
    tweaked = base.copy()  # local brightness bump: few low-freq bits move
    tweaked[:8, :8] = np.clip(
        tweaked[:8, :8].astype(int) + 40, 0, 255
    ).astype(np.uint8)
    other = rng.randint(0, 256, (32, 32), dtype=np.uint8)
    df = spark.createDataFrame(
        [
            (1, encode_png(base)),
            (2, encode_png(base)),      # exact dup of 1
            (3, encode_png(tweaked)),   # near dup of 1
            (4, encode_png(other)),     # unrelated
            (5, b"junk bytes"),
        ],
        "media_id long, content binary",
    )
    rows = {r.media_id: r for r in image_phash(df).collect()}
    assert rows[1].phash == rows[2].phash

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert 0 < ham(rows[1].phash, rows[3].phash) < 16
    assert ham(rows[1].phash, rows[4].phash) > 16
    assert rows[5].phash is None


def test_resample_pcm_matches_numpy_interp(spark):
    """resample_pcm's integer-first linear interpolation must agree
    with numpy.interp on arbitrary PCM to float tolerance, hit the
    documented n_out, skip multi-channel payloads, and null junk."""
    from oakstore_spark.operators.multimodal import (
        encode_wav_pcm16,
        resample_pcm,
    )

    rng = np.random.default_rng(5)
    s = rng.integers(-20000, 20000, 101).astype(np.int16)
    stereo = rng.integers(-100, 100, 40).astype(np.int16)
    df = spark.createDataFrame(
        [
            (1, bytearray(encode_wav_pcm16(s, 16000, 1))),
            (2, bytearray(encode_wav_pcm16(stereo, 16000, 2))),
            (3, bytearray(b"junk")),
        ],
        "media_id long, content binary",
    )
    out = resample_pcm(df, dst_rate=12000).toPandas()
    got = out[out.media_id == 1].sort_values("idx")
    n_out = (len(s) - 1) * 12000 // 16000 + 1
    assert got["idx"].tolist() == list(range(n_out))
    t = np.arange(n_out) * 16000 / 12000
    want = np.interp(t, np.arange(len(s)), s.astype(np.float64))
    assert np.allclose(got["val"].to_numpy(), want, atol=1e-9)
    assert len(out[out.media_id == 2]) == 0       # stereo skipped
    junk = out[out.media_id == 3]
    assert len(junk) == 1 and junk["idx"].isna().all()


def test_phash_near_dup_banding(spark):
    """Banded pHash pairing: planted brightness-shifted copies (hamming
    ~10) are found; unrelated noise images (hamming ~32) are not; the
    banding misses nothing an exhaustive popcount over all hashes would
    find at the same threshold (pigeonhole completeness)."""
    from oakstore_spark.operators.multimodal import (
        image_phash,
        phash_near_dup_pairs,
    )

    rng = np.random.RandomState(3)
    rows = []
    for i in range(12):
        base = rng.randint(0, 256, (32, 32), dtype=np.uint8)
        rows.append((2 * i, encode_png(base)))
        near = base.copy()
        near[:8, :8] = np.clip(
            near[:8, :8].astype(int) + 40, 0, 255
        ).astype(np.uint8)
        rows.append((2 * i + 1, encode_png(near)))
    df = spark.createDataFrame(rows, "media_id long, content binary")
    hashes = image_phash(df).cache()
    got = phash_near_dup_pairs(hashes, max_hamming=14).toPandas()
    pairs = {(int(r.id_a), int(r.id_b)) for r in got.itertuples()}

    # exhaustive reference at the same threshold
    hs = {r.media_id: r.phash for r in hashes.collect()}
    want = {
        (a, b)
        for a in hs
        for b in hs
        if a < b and bin((hs[a] ^ hs[b]) & ((1 << 64) - 1)).count("1") <= 14
    }
    assert pairs == want
    # every planted twin pair present
    assert all((2 * i, 2 * i + 1) in pairs for i in range(12))


def test_webdataset_media_roundtrip_decodes(spark, tmp_path):
    """Full delivery-loop composition: real AVI + WAV payloads exported
    as WebDataset tar shards, re-ingested through read_webdataset, and
    DECODED — frame stats and silence stats after the tar round-trip
    must equal a direct decode of the original payloads (tar framing
    is byte-transparent for binary members)."""
    from oakstore_spark.operators.multimodal import (
        audio_silence_stats,
        encode_jpeg_baseline_gray,
        encode_mjpeg_avi,
        encode_wav_pcm16,
        video_frame_luma,
    )
    from oakstore_spark.sources.ingest import (
        export_webdataset_shards,
        read_webdataset,
    )

    rows = []
    for mid in range(6):
        frames = [
            encode_jpeg_baseline_gray(
                np.full((16, 16), (mid * 9 + i * 5) % 256, dtype=np.uint8),
                quality=100,
            )
            for i in range(mid % 2 + 1)
        ]
        avi = encode_mjpeg_avi(frames, 16, 16, 25)
        tone = np.tile(
            np.array([300 + mid, 0, -(300 + mid), 0], dtype=np.int16), 32
        )
        wav = encode_wav_pcm16(
            np.concatenate([tone, np.zeros(64, dtype=np.int16)]), 16000, 1
        )
        rows.append((mid, bytearray(avi), bytearray(wav)))
    media = spark.createDataFrame(
        rows, "media_id long, video binary, audio binary"
    )

    out_dir = str(tmp_path / "wds")
    export_webdataset_shards(
        media.withColumn("key", F.col("media_id").cast("string")),
        out_dir,
        key_col="key",
        shard_rows=3,
        content_cols={"video": "avi", "audio": "wav"},
    )
    back = read_webdataset(spark, out_dir)
    vids = back.where(F.col("ext") == "avi").select(
        F.col("key").cast("long").alias("media_id"), "content"
    )
    auds = back.where(F.col("ext") == "wav").select(
        F.col("key").cast("long").alias("media_id"), "content"
    )

    def key_stats(df):
        return {
            (r.media_id, r.frame_idx): (r.sum_luma, r.std_luma)
            for r in df.collect()
        }

    direct_v = key_stats(video_frame_luma(
        media.select("media_id", F.col("video").alias("content"))))
    rt_v = key_stats(video_frame_luma(vids))
    assert direct_v == rt_v and len(rt_v) == sum(m % 2 + 1 for m in range(6))

    direct_a = {
        r.media_id: (r.n_frames, r.n_silent, r.longest_silent_run)
        for r in audio_silence_stats(
            media.select("media_id", F.col("audio").alias("content"))
        ).collect()
    }
    rt_a = {
        r.media_id: (r.n_frames, r.n_silent, r.longest_silent_run)
        for r in audio_silence_stats(auds).collect()
    }
    assert direct_a == rt_a
    assert all(v == (3, 1, 1) for v in rt_a.values())  # planted layout


def test_video_frame_motion_exact_and_degrade(spark):
    """video_frame_motion: planted q100 blockwise-constant frames give
    exact SAD/MAD/max per pair; a torn middle frame nulls the two pairs
    touching it; non-AVI bytes give one null row."""
    from oakstore_spark.operators.multimodal import (
        encode_jpeg_baseline_gray,
        encode_mjpeg_avi,
        video_frame_motion,
    )

    vals = [[10, 200, 55, 127], [0, 255, 128, 99], [30, 230, 100, 120]]

    def frame(vs):
        img = np.zeros((16, 16), dtype=np.uint8)
        for b, v in enumerate(vs):
            by, bx = divmod(b, 2)
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = v
        return encode_jpeg_baseline_gray(img, quality=100)

    frames = [frame(v) for v in vals]
    good = encode_mjpeg_avi(frames, 16, 16, 25)
    torn_mid = bytearray(frames[1])
    torn_mid[len(torn_mid) - 4] ^= 0xFF  # likely breaks entropy tail
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"nope"))],
        "media_id long, content binary",
    )
    out = {(r.media_id, r.frame_idx): r
           for r in video_frame_motion(df).collect()}
    for i in (1, 2):
        ads = [abs(a - b) for a, b in zip(vals[i], vals[i - 1])]
        r = out[(1, i)]
        assert (r.n_px, r.sad) == (256, 64 * sum(ads))
        assert r.mad == 64 * sum(ads) / 256
        assert r.max_abs_diff == max(ads)
    assert out[(2, None)].sad is None


def test_image_phash_small_images_no_nan(spark):
    """Images smaller than 32px on an axis must hash (windows clamp to
    >= 1 px and upsample by repetition) — the pre-vectorization code
    produced NaN means there. Identical small images still collide."""
    from oakstore_spark.operators.multimodal import image_phash

    rng = np.random.RandomState(9)
    tiny = rng.randint(0, 256, (16, 16), dtype=np.uint8)
    thin = rng.randint(0, 256, (7, 40), dtype=np.uint8)
    df = spark.createDataFrame(
        [
            (1, encode_png(tiny)),
            (2, encode_png(tiny)),
            (3, encode_png(thin)),
        ],
        "media_id long, content binary",
    )
    rows = {r.media_id: r for r in image_phash(df).collect()}
    assert rows[1].phash is not None and rows[3].phash is not None
    assert rows[1].phash == rows[2].phash
    assert rows[1].phash != rows[3].phash


def test_empty_avi_container_degrades_not_vanishes(spark):
    """A VALID-but-EMPTY AVI (real RIFF tree, zero movi frames) must
    degrade explicitly, never silently vanish (ADVICE r5): frame-stat
    operators emit one null row; sample_video_frames recognizes the
    real container (zero rows — NOT the 4096-byte chunk fake, which
    would fabricate frames from header bytes)."""
    from oakstore_spark.operators.multimodal import (
        decode_avi_frames,
        encode_avi_header,
        sample_video_frames,
        video_frame_luma,
        video_frame_motion,
    )

    empty = encode_avi_header(16, 16, 0, 25)
    assert decode_avi_frames(empty) == []  # the fixture really is []

    df = spark.createDataFrame(
        [(1, bytearray(empty))], "media_id long, content binary"
    )
    luma = video_frame_luma(df).collect()
    assert len(luma) == 1 and luma[0].frame_idx is None
    motion = video_frame_motion(df).collect()
    assert len(motion) == 1 and motion[0].frame_idx is None
    sampled = sample_video_frames(df).collect()
    assert sampled == []  # real container walk, zero frames


def test_spectral_bands_cover_remainder_bins(spark):
    """n_bands that does not divide frame_len//2 must still give every
    bin a band (last band absorbs the remainder, ADVICE r5): a tone on
    the TOP bin (32 of half=32, in no band before the fix at n_bands=3)
    must dominate band 2 with share 1."""
    from oakstore_spark.operators.multimodal import (
        audio_spectral_features,
        encode_wav_pcm16,
    )

    n = 64
    j = np.arange(n)
    tone = (1000 * np.cos(np.pi * j)).astype(np.int16)  # bin 32 (Nyquist)
    df = spark.createDataFrame(
        [(1, bytearray(encode_wav_pcm16(tone, 16000, 1)))],
        "media_id long, content binary",
    )
    out = audio_spectral_features(df, frame_len=64, n_bands=3).collect()[0]
    assert out.centroid_bin == pytest.approx(32.0)
    assert out.dominant_band == 2
    assert out.dominant_share == pytest.approx(1.0)
    with pytest.raises(ValueError):
        audio_spectral_features(df, frame_len=64, n_bands=33).collect()


def test_phash_near_dup_unpersist_deps(spark):
    """phash_near_dup_pairs persists its signatures relation; the
    handle must ride on the result so a long-lived session can free it
    (ADVICE r5) — unpersist_deps drops the storage level back to NONE."""
    from oakstore_spark.operators.multimodal import phash_near_dup_pairs
    from oakstore_spark.operators.scaling import unpersist_deps

    hashes = spark.createDataFrame(
        [(1, 0), (2, 3), (3, 0x0F0F0F0F0F0F0F0F)],
        "media_id long, phash long",
    )
    pairs = phash_near_dup_pairs(hashes, max_hamming=3)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert got == {(1, 2)}
    deps = pairs._oakstore_persisted
    assert deps and all(d.storageLevel.useMemory for d in deps)
    assert unpersist_deps(pairs) == len(deps)
    assert all(not d.storageLevel.useMemory for d in deps)
    assert pairs._oakstore_persisted == []
