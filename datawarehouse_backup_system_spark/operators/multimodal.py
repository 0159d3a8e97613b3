"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side design is real and tested — typed asset schema, Arrow-batch
UDF signatures, partition sizing — while the actual media decoding is
STUBBED (``decode_stub='error'`` raises NotImplementedError; the
image/audio libraries are not in this container). ``decode_stub='fake'``
produces a deterministic fake decode derived from the bytes' md5 so the
end-to-end plumbing (schema, batch shapes, groupings) is verifiable.

At 100 TB: media bytes dominate row size, so assets are stored one row
per asset with metadata columns FIRST in the schema (column pruning lets
metadata-only queries skip the blob entirely), partitions sized by
``spark.sql.files.maxPartitionBytes`` to keep a handful of assets per
task, and decode runs in ``mapInPandas`` so each Arrow batch holds few
rows of large cells.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),       # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("data", T.BinaryType(), True),         # blob LAST: prune-friendly
    ]
)

FEATURE_SCHEMA = (
    "asset_id long, kind string, n_bytes long, content_md5 string, "
    "width int, height int, duration_ms int"
)


def _fake_dims(digest: bytes) -> tuple[int, int, int]:
    w = 64 + digest[0] % 192          # 64..255
    h = 64 + digest[1] % 192
    dur = 1000 + int.from_bytes(digest[2:4], "big") % 59000
    return w, h, dur


def decode_features(df: DataFrame, decode_stub: str = "error") -> DataFrame:
    """Extract per-asset features via mapInPandas (Arrow-batched).

    ``decode_stub='fake'`` derives width/height/duration deterministically
    from the content hash; ``'error'`` raises where a real decoder
    (PIL/ffmpeg) would plug in.
    """
    if decode_stub not in ("error", "fake"):
        raise ValueError(decode_stub)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                data = bytes(row.data) if row.data is not None else b""
                digest = hashlib.md5(data).digest()
                if decode_stub == "error":
                    raise NotImplementedError(
                        "media decoding requires PIL/ffmpeg (not in this image); "
                        "use decode_stub='fake' for plumbing tests"
                    )
                w, h, dur = _fake_dims(digest)
                out.append(
                    {
                        "asset_id": row.asset_id,
                        "kind": row.kind,
                        "n_bytes": len(data),
                        "content_md5": digest.hex(),
                        "width": w if row.kind == "image" else None,
                        "height": h if row.kind == "image" else None,
                        "duration_ms": dur if row.kind in ("audio", "video") else None,
                    }
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(op, schema=FEATURE_SCHEMA)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes blobs through mapInPandas with the target
    dims recorded in meta (real resampling would replace `data`)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf["meta"].apply(
                lambda m: {**(m or {}), "resized_to": f"{width}x{height}"}
            )
            yield pdf.assign(meta=meta)

    return df.mapInPandas(op, schema=ASSET_SCHEMA)


def frame_sample_stub(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video → frame rows (one row per sampled frame). Fake frames: the
    frame count derives from the fake duration, frame bytes are empty.
    Demonstrates the explode-shaped output a real sampler produces."""
    feats = decode_features(df.where(F.col("kind") == "video"), decode_stub="fake")
    n_frames = F.greatest((F.col("duration_ms") / every_ms).cast("int"), F.lit(1))
    return feats.select(
        "asset_id", F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx")
    ).select("asset_id", "frame_idx", (F.col("frame_idx") * every_ms).alias("frame_ms"))
