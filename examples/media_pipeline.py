#!/usr/bin/env python
"""Tour of the multimodal surface in one script — every step REAL
pure-Python/numpy decode, no PIL/ffmpeg:

    python examples/media_pipeline.py

synthesize mixed-format assets (PNG / BMP-free here: PNG + JPEG + MJPEG
AVI + WAV) → header metadata scan → transcode images to canonical PNG →
resize thumbnails → exact pixel statistics → video frame sampling with
per-frame pixel stats → PCM energy windows. The same operators back the
driver-oracled specs m01–m08.
"""

from __future__ import annotations

import struct
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import pandas as pd  # noqa: E402

from datawarehouse_backup_system_spark import get_spark  # noqa: E402
from datawarehouse_backup_system_spark.operators import multimodal as mm  # noqa: E402


def _wav(seed: int, n: int = 800, rate: int = 8000) -> bytes:
    """Deterministic 16-bit PCM mono WAV (triangle-ish integer wave)."""
    samples = b"".join(
        struct.pack("<h", ((seed * 37 + i * 113) % 2001) - 1000)
        for i in range(n)
    )
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(samples)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
           + b"data" + struct.pack("<I", len(samples)))
    return hdr + samples


def main() -> int:
    spark = get_spark(app_name="media-pipeline-example")
    assets = pd.DataFrame({
        "asset_id": [1, 2, 3, 4],
        "kind": ["image", "image", "video", "audio"],
        "mime": ["image/png", "image/jpeg", "video/x-msvideo", "audio/wav"],
        "meta": [{}, {}, {}, {}],
        "data": [
            mm.synthesize_png(1, 24, 16),
            mm.synthesize_jpeg(2, 32, 16, channels=3, subsampling="420"),
            mm.synthesize_mjpeg_avi(3, 16, 16, n_frames=6),
            _wav(4),
        ],
    })
    df = spark.createDataFrame(assets, mm.ASSET_SCHEMA)

    print("== header metadata (m01-m03 path) ==")
    mm.decode_features(df).select(
        "asset_id", "format", "width", "height", "duration_ms", "sample_rate"
    ).show()

    print("== transcode images to canonical PNG ==")
    images = df.where("kind = 'image'")
    png = mm.transcode_to_png(images)
    png.select("asset_id", "mime").show()

    print("== 8x8 thumbnails (real decode -> nearest-neighbor -> re-encode) ==")
    mm.png_pixel_stats(mm.resize_png(png, 8, 8)).select(
        "asset_id", "width", "height", "channels", "mean_milli"
    ).show(truncate=False)

    print("== exact pixel statistics (m06/m07 path) ==")
    mm.png_pixel_stats(images).select(
        "asset_id", "width", "height", "channels", "mean_milli", "err"
    ).show(truncate=False)

    print("== video: every-2nd-frame pixel stats (m08 path) ==")
    mm.mjpeg_frame_stats(df.where("kind = 'video'"), every_k=2).select(
        "asset_id", "frame_idx", "n_frames", "width", "height", "mean_milli"
    ).show(truncate=False)

    print("== audio: PCM energy windows (m05 path) ==")
    mm.pcm_features(df.where("kind = 'audio'"), window=256).show(
        truncate=False
    )

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
