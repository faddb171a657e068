#!/usr/bin/env python
"""A miniature multimodal curation pipeline over REAL media bytes: build
MJPEG videos + PCM16 audio worker-side, decode per-frame pixel stats and
per-frame silence through the pure-stdlib codecs, then filter blank
videos / silent audio and dedup on the decoded frame fingerprint —
the same chain q_media_curation_e2e runs under the DuckDB oracle.

Run: python examples/multimodal_pipeline.py [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from oakstore_spark.operators.multimodal import (  # noqa: E402
    audio_silence_stats,
    audio_spectral_features,
    decode_jpeg_rgb,
    encode_jpeg_baseline_color,
    video_frame_luma,
)
from oakstore_spark.session import get_spark  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("multimodal_example")
    spark.sparkContext.setLogLevel("ERROR")

    # reuse the oracle-checked e2e fixture/pipeline wiring for the demo
    from oakstore_spark.queries import load_all  # noqa: E402
    from oakstore_spark.queries.multimodal import (  # noqa: E402
        q_audio_spectral,
        q_media_curation_e2e,
        q_video_frame_luma,
    )

    load_all()

    print("== per-frame video pixel stats (decoded from real MJPEG) ==")
    q_video_frame_luma(spark, sf_dir).orderBy("media_id", "frame_idx").show(
        8, truncate=False
    )

    print("== audio spectral features (STFT over decoded PCM16) ==")
    q_audio_spectral(spark, sf_dir).orderBy("media_id").show(8)

    print("== end-to-end media curation verdicts ==")
    verdicts = q_media_curation_e2e(spark, sf_dir)
    verdicts.groupBy("verdict").count().orderBy("verdict").show()

    # full-color decode, locally (no Spark needed for one payload)
    import numpy as np

    img = np.zeros((16, 16, 3), dtype=np.uint8)
    img[:, :] = (200, 30, 90)
    w, h, rgb = decode_jpeg_rgb(
        encode_jpeg_baseline_color(img, quality=100, subsample="420")
    )
    print(f"decode_jpeg_rgb round-trip: {w}x{h}, pixel[0,0] = "
          f"{tuple(int(v) for v in rgb[0, 0])}")

    # silence + spectral summaries over the same audio fixture the
    # oracle checks
    kept = verdicts.where(F.col("verdict") == "kept").count()
    total = verdicts.count()
    print(f"kept {kept}/{total} docs after blank/silent/dup filters")
    _ = (audio_silence_stats, audio_spectral_features, video_frame_luma)


if __name__ == "__main__":
    main(*sys.argv[1:2])
