"""Multimodal column plumbing: image/audio/video as opaque binary columns.

Three tiers of honesty about what runs in this container:

- **Header-level metadata decoding is REAL** (``mode='headers'``, the
  default): PNG / GIF / BMP / JPEG dimensions, WAV sample rate +
  duration, MP4 duration — parsed from container headers with stdlib
  ``struct`` inside the Arrow batch, no media libraries needed.
- **Pixel/sample decoding is STUBBED** (``mode='error'`` raises
  NotImplementedError where PIL/ffmpeg would plug in; ``mode='fake'``
  derives deterministic fake features from the content md5 so plumbing
  tests don't need real media).
- The Spark-side plumbing — typed asset schema, Arrow-batch signatures,
  frame-explode shape — is real and tested in all modes.

At 100 TB: media bytes dominate row size, so assets are stored one row
per asset with metadata columns FIRST in the schema (column pruning lets
metadata-only queries skip the blob entirely), partitions sized by
``spark.sql.files.maxPartitionBytes`` to keep a handful of assets per
task, and decode runs in ``mapInPandas`` so each Arrow batch holds few
rows of large cells.
"""

from __future__ import annotations

import hashlib
import struct
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
    "asset_id long, kind string, format string, n_bytes long, "
    "content_md5 string, width int, height int, duration_ms int, "
    "sample_rate int"
)


def parse_media_header(data: bytes) -> dict:
    """Best-effort container-header parse (stdlib only, no decode libs).

    Returns any of format/width/height/duration_ms/sample_rate that the
    header carries; unknown or truncated input → empty dict. Formats:
    PNG (IHDR big-endian dims), GIF (LE dims), BMP (BITMAPINFOHEADER),
    JPEG (SOF segment scan), WAV (RIFF chunk scan → rate + duration),
    MP4 (ftyp brand + mvhd timescale/duration).
    """
    if data.startswith(b"\x89PNG\r\n\x1a\n") and len(data) >= 24 \
            and data[12:16] == b"IHDR":
        w, h = struct.unpack(">II", data[16:24])
        return {"format": "png", "width": w, "height": h}
    if data[:6] in (b"GIF87a", b"GIF89a") and len(data) >= 10:
        w, h = struct.unpack("<HH", data[6:10])
        return {"format": "gif", "width": w, "height": h}
    if data[:2] == b"BM" and len(data) >= 26:
        w, h = struct.unpack("<ii", data[18:26])
        return {"format": "bmp", "width": w, "height": abs(h)}
    if data[:2] == b"\xff\xd8":
        out = {"format": "jpeg"}
        # every SOF marker carries dims at the same offsets (C4/C8/CC are
        # DHT/JPG/DAC, not SOF)
        sof = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
               0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
        i = 2
        while i + 9 < len(data) and data[i] == 0xFF:
            while i + 9 < len(data) and data[i + 1] == 0xFF:
                i += 1  # legal 0xFF fill bytes before a marker
            marker = data[i + 1]
            if marker == 0x01 or 0xD0 <= marker <= 0xD9:
                i += 2
                continue
            (seglen,) = struct.unpack(">H", data[i + 2:i + 4])
            if marker in sof and i + 9 <= len(data):
                h, w = struct.unpack(">HH", data[i + 5:i + 9])
                out.update(width=w, height=h)
                break
            i += 2 + seglen
        return out
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        out = {"format": "wav"}
        rate = byte_rate = data_size = None
        i = 12
        while i + 8 <= len(data):
            cid = data[i:i + 4]
            (sz,) = struct.unpack("<I", data[i + 4:i + 8])
            if cid == b"fmt " and i + 20 <= len(data):
                rate, byte_rate = struct.unpack("<II", data[i + 12:i + 20])
            elif cid == b"data":
                data_size = sz
            i += 8 + sz + (sz & 1)
        if rate:
            out["sample_rate"] = rate
        if byte_rate and data_size is not None:
            out["duration_ms"] = int(data_size * 1000 / byte_rate)
        return out
    if len(data) >= 12 and data[4:8] == b"ftyp":
        out = {"format": "mp4"}
        j = data.find(b"mvhd")
        if j != -1 and j + 5 <= len(data):
            version = data[j + 4]
            ts = dur = 0
            if version == 0 and j + 24 <= len(data):
                ts, dur = struct.unpack(">II", data[j + 16:j + 24])
            elif version == 1 and j + 36 <= len(data):
                (ts,) = struct.unpack(">I", data[j + 24:j + 28])
                (dur,) = struct.unpack(">Q", data[j + 28:j + 36])
            if ts:
                out["duration_ms"] = int(dur * 1000 / ts)
        return out
    return {}


def _fake_dims(digest: bytes) -> tuple[int, int, int]:
    w = 64 + digest[0] % 192          # 64..255
    h = 64 + digest[1] % 192
    dur = 1000 + int.from_bytes(digest[2:4], "big") % 59000
    return w, h, dur


def decode_features(df: DataFrame, decode_stub: str = "headers") -> DataFrame:
    """Extract per-asset features via mapInPandas (Arrow-batched).

    ``'headers'`` (default) parses real container headers
    (:func:`parse_media_header`); ``'fake'`` derives deterministic
    dims from the content hash (plumbing tests without real media);
    ``'error'`` raises where a PIXEL decoder (PIL/ffmpeg) would plug in.
    """
    if decode_stub not in ("headers", "error", "fake"):
        raise ValueError(decode_stub)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                data = bytes(row.data) if row.data is not None else b""
                digest = hashlib.md5(data).digest()
                if decode_stub == "error":
                    raise NotImplementedError(
                        "media PIXEL decoding requires PIL/ffmpeg (not in "
                        "this image); header metadata works via "
                        "decode_stub='headers'"
                    )
                if decode_stub == "fake":
                    w, h, dur = _fake_dims(digest)
                    parsed = {
                        "format": "fake",
                        "width": w if row.kind == "image" else None,
                        "height": h if row.kind == "image" else None,
                        "duration_ms": dur if row.kind in ("audio", "video")
                        else None,
                    }
                else:
                    parsed = parse_media_header(data)
                out.append(
                    {
                        "asset_id": row.asset_id,
                        "kind": row.kind,
                        "format": parsed.get("format"),
                        "n_bytes": len(data),
                        "content_md5": digest.hex(),
                        "width": parsed.get("width"),
                        "height": parsed.get("height"),
                        "duration_ms": parsed.get("duration_ms"),
                        "sample_rate": parsed.get("sample_rate"),
                    }
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(op, schema=FEATURE_SCHEMA)


def png_dims(data_col: F.Column) -> F.Column:
    """EXPRESSION-level PNG dimension probe — width/height struct parsed
    from the IHDR chunk with hex/conv, no Python in the loop: usable
    inside a metadata-only scan that must stay in whole-stage codegen
    (e.g. filter a 100 TB asset table by resolution before any decode).
    NULL for non-PNG bytes."""
    is_png = F.hex(F.substring(data_col, 1, 8)) == "89504E470D0A1A0A"
    w = F.conv(F.hex(F.substring(data_col, 17, 4)), 16, 10).cast("int")
    h = F.conv(F.hex(F.substring(data_col, 21, 4)), 16, 10).cast("int")
    return F.when(is_png, F.struct(w.alias("width"), h.alias("height")))


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


def frame_sample_stub(
    df: DataFrame, every_ms: int = 1000, decode_stub: str = "fake"
) -> DataFrame:
    """Video → frame rows (one row per sampled frame). The frame COUNT
    is real metadata arithmetic (duration from the chosen decode path —
    ``'headers'`` parses the actual container, ``'fake'`` hashes the
    bytes); frame bytes stay empty pending a pixel decoder.
    Demonstrates the explode-shaped output a real sampler produces."""
    feats = decode_features(
        df.where(F.col("kind") == "video"), decode_stub=decode_stub
    )
    n_frames = F.greatest((F.col("duration_ms") / every_ms).cast("int"), F.lit(1))
    return feats.select(
        "asset_id", F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx")
    ).select("asset_id", "frame_idx", (F.col("frame_idx") * every_ms).alias("frame_ms"))


def pcm_features(df: DataFrame, window: int = 32) -> DataFrame:
    """REAL sample-level audio decode: 16-bit LE PCM from each WAV
    blob's ``data`` chunk → integer signal statistics. This is the tier
    ABOVE header parsing — actual per-sample DSP on actual bytes —
    possible without media libraries because PCM inside a canonical WAV
    is just packed int16: ``numpy.frombuffer`` inside the Arrow batch
    is the whole decoder.

    Returns one row per asset: ``n_samples``, ``sum_sq`` (Σ v² — total
    signal energy), ``peak`` (max |v|), and ``max_window_sumsq`` (the
    hottest ``window``-sample energy, full windows only) — all INTEGER
    quantities, so the m05 oracle can recompute them arithmetically
    from the generating formula and require exact equality: the bytes
    really were decoded, or nothing matches.

    Scale shape: mapInPandas, no shuffle — each Arrow batch holds few
    rows of large cells (see module docstring); per-asset work is a
    vectorized O(n_samples) numpy pass.
    """
    import numpy as np

    if window <= 0:
        raise ValueError("window must be positive")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                b = bytes(row.data) if row.data is not None else b""
                pos = b.find(b"data")
                if pos < 0 or pos + 8 > len(b):
                    raise ValueError(
                        f"asset {row.asset_id}: no RIFF 'data' chunk — "
                        "not a canonical WAV (silent zeros would fake a "
                        "decode that never happened)"
                    )
                (size,) = struct.unpack_from("<I", b, pos + 4)
                size = min(size, len(b) - pos - 8)
                pcm = np.frombuffer(
                    b, dtype="<i2", count=size // 2, offset=pos + 8
                ).astype(np.int64)
                n = int(pcm.size)
                sq = pcm * pcm
                nw = n // window
                mw = (
                    int(sq[: nw * window].reshape(nw, window).sum(axis=1).max())
                    if nw
                    else 0
                )
                out.append(
                    {
                        "asset_id": row.asset_id,
                        "n_samples": n,
                        "sum_sq": int(sq.sum()),
                        "peak": int(np.abs(pcm).max()) if n else 0,
                        "max_window_sumsq": mw,
                    }
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(
        op,
        schema=(
            "asset_id long, n_samples long, sum_sq long, peak int, "
            "max_window_sumsq long"
        ),
    )


# ---------------------------------------------------------------------------
# Real PIXEL decoding for PNG — pure stdlib (zlib is the only codec PNG
# needs), so the "pixel decode is an environment seam" caveat no longer
# applies to PNG: IDAT inflate + per-scanline unfilter (filters 0-4 per
# the PNG spec) with no PIL/ffmpeg. JPEG/video stay env-gated
# (decode_features(decode_stub='error')) — their codecs genuinely need
# native libraries. Supports the non-interlaced 8-bit color types
# (gray 0, RGB 2, gray+alpha 4, RGBA 6); anything else raises.
# ---------------------------------------------------------------------------
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png_pixels(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG to raw pixel bytes: (width, height, channels,
    row-major samples). Critical chunks only; CRCs are not re-verified
    (torn files surface as zlib/struct errors, which is the contract
    crash-recovery expects)."""
    import zlib

    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    channels = 0
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if interlace:
                raise ValueError("interlaced PNG unsupported")
            if color not in _PNG_CHANNELS:
                raise ValueError(f"unsupported color type {color}")
            channels = _PNG_CHANNELS[color]
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("decompressed size mismatch")
    out = bytearray(stride * height)
    prev = bytearray(stride)
    bpp = channels
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        if f == 1:      # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif f == 2:    # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:    # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:    # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif f != 0:
            raise ValueError(f"bad filter {f}")
        out[y * stride:(y + 1) * stride] = line
        prev = line
    return width, height, channels, bytes(out)


def png_pixel_stats(df: DataFrame) -> DataFrame:
    """Per-asset PIXEL statistics for PNG and uncompressed-BMP assets
    (``decode_image_pixels`` dispatches on magic bytes) via ``mapInPandas``
    (Arrow batches; numpy does the per-image reduction): width, height,
    channels, per-channel mean in milli-units (exact integer
    floor(1000·sum/n) — no float in the output), and the pixel-bytes
    md5 (the content-addressed identity RESIZED/transcoded copies
    share, which the container-bytes md5 does not). Non-PNG or
    unsupported assets yield null stats with an ``err`` tag instead of
    failing the batch — at 100 TB a poison asset must cost one row,
    not a stage retry loop."""
    import numpy as np

    schema = (
        "asset_id bigint, width int, height int, channels int, "
        "mean_milli array<bigint>, pixel_md5 string, err string"
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                data = bytes(row.data) if row.data is not None else b""
                rec = {"asset_id": row.asset_id, "width": None,
                       "height": None, "channels": None,
                       "mean_milli": None, "pixel_md5": None, "err": None}
                try:
                    w, h, ch, px = decode_image_pixels(data)
                    arr = np.frombuffer(px, dtype=np.uint8).reshape(-1, ch)
                    sums = arr.sum(axis=0, dtype=np.int64)
                    n = arr.shape[0]
                    rec.update(
                        width=w, height=h, channels=ch,
                        mean_milli=[int(s) * 1000 // n for s in sums],
                        pixel_md5=hashlib.md5(px).hexdigest(),
                    )
                except Exception as exc:  # noqa: BLE001 — per-asset isolation
                    rec["err"] = f"{type(exc).__name__}: {exc}"[:120]
                rows.append(rec)
            yield pd.DataFrame(rows)

    return df.mapInPandas(op, schema)


def synthesize_png(seed: int, width: int, height: int,
                   channels: int = 3) -> bytes:
    """Deterministic PNG fixture: sample (x, y, c) = (seed·7 + y·5 +
    x·3 + c·11) mod 256, scanlines filtered cycling through ALL five
    PNG filter types — a closed-form image whose statistics an
    arithmetic oracle can compute independently of the decoder (the
    m06 pattern; the pytest round-trips the same generator)."""
    import zlib

    color = {1: 0, 3: 2, 2: 4, 4: 6}[channels]
    stride = width * channels

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        line = bytes(
            (seed * 7 + y * 5 + (i // channels) * 3 + (i % channels) * 11)
            % 256
            for i in range(stride)
        )
        f = y % 5
        enc = bytearray(line)
        if f == 1:
            for i in range(stride - 1, channels - 1, -1):
                enc[i] = (enc[i] - line[i - channels]) & 0xFF
        elif f == 2:
            for i in range(stride):
                enc[i] = (enc[i] - prev[i]) & 0xFF
        elif f == 3:
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                enc[i] = (enc[i] - ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else c)
                enc[i] = (enc[i] - pred) & 0xFF
        raw += bytes([f]) + bytes(enc)
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def encode_png(width: int, height: int, channels: int,
               pixels: bytes) -> bytes:
    """Minimal PNG encoder (filter 0, stdlib zlib) — the write half of
    the real PNG path; decode_png_pixels round-trips it exactly."""
    import zlib

    color = {1: 0, 3: 2, 2: 4, 4: 6}[channels]
    stride = width * channels

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    raw = bytearray()
    for y in range(height):
        raw += b"\x00" + pixels[y * stride:(y + 1) * stride]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def resize_png(df: DataFrame, width: int, height: int) -> DataFrame:
    """REAL image resize for PNG assets: decode (pure stdlib) →
    nearest-neighbor resample (one numpy fancy-index, vectorized per
    Arrow batch) → re-encode — ``data`` is REPLACED with the resized
    PNG, superseding ``resize_stub``'s metadata-only pass for this
    format. Nearest-neighbor is the standard thumbnail/tiling choice
    for training-data pipelines where exact reproducibility matters
    (no resampling-kernel float variance across BLAS builds — the
    output bytes are a pure function of the input). Non-PNG assets
    pass through untouched with an ``err`` tag in meta; a poison asset
    costs one row, never the stage."""
    import numpy as np

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            datas, metas = [], []
            for row in pdf.itertuples(index=False):
                data = bytes(row.data) if row.data is not None else b""
                meta = dict(row.meta or {})
                try:
                    # dispatcher: BMP inputs resize too (output is PNG)
                    w, h, ch, px = decode_image_pixels(data)
                    arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w, ch)
                    ys = (np.arange(height) * h) // height
                    xs = (np.arange(width) * w) // width
                    small = arr[ys][:, xs]
                    data = encode_png(
                        width, height, ch, small.tobytes()
                    )
                    meta["resized_from"] = f"{w}x{h}"
                    meta["resized_to"] = f"{width}x{height}"
                except Exception as exc:  # noqa: BLE001 — per-asset isolation
                    meta["resize_err"] = f"{type(exc).__name__}"[:60]
                datas.append(data)
                metas.append(meta)
            yield pdf.assign(data=datas, meta=metas)

    # schema-preserving: whatever asset columns ride along survive
    return df.mapInPandas(op, schema=df.schema)


def decode_bmp_pixels(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode an uncompressed 24-bit BMP to (width, height, 3, RGB
    row-major top-down bytes) — BMP stores BGR bottom-up with rows
    padded to 4 bytes; this normalizes to the PNG convention so the
    stats/resize operators see one pixel layout. Pure struct slicing
    (BMP needs no codec at all)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (offset,) = struct.unpack("<I", data[10:14])
    width, height = struct.unpack("<ii", data[18:26])
    (bpp,) = struct.unpack("<H", data[28:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, comp={compression})")
    flipped = height > 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3
    out = bytearray(width * height * 3)
    for y in range(height):
        src_y = (height - 1 - y) if flipped else y
        row = data[offset + src_y * stride:offset + src_y * stride
                   + width * 3]
        if len(row) < width * 3:
            raise ValueError("truncated BMP pixel data")
        # BGR -> RGB
        o = y * width * 3
        out[o:o + width * 3] = row
        out[o:o + width * 3:3] = row[2::3]
        out[o + 2:o + width * 3:3] = row[0::3]
    return width, height, 3, bytes(out)


def decode_image_pixels(data: bytes) -> tuple[int, int, int, bytes]:
    """Dispatch on magic bytes to the matching pure-stdlib pixel
    decoder — PNG (zlib inflate + unfilter), uncompressed 24-bit BMP,
    or GIF first-frame (pure-Python LZW). JPEG/video remain env-gated
    (DCT/video codecs genuinely need native libs)."""
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png_pixels(data)
    if data[:2] == b"BM":
        return decode_bmp_pixels(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif_pixels(data)
    raise ValueError("no pure-stdlib decoder for this format")


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW decode (pure Python): little-endian bit packing,
    clear/end codes, code width growing to 12 bits. Returns the index
    stream."""
    clear = 1 << min_code_size
    end = clear + 1
    # bit reader over the concatenated sub-block payload
    bitpos = 0
    nbits = len(data) * 8

    def read_code(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > nbits:
            return end
        byte0 = bitpos // 8
        chunk = int.from_bytes(
            data[byte0:byte0 + 3], "little"
        )
        code = (chunk >> (bitpos % 8)) & ((1 << width) - 1)
        bitpos += width
        return code

    out = bytearray()
    table: list[bytes] = []

    def reset_table():
        nonlocal table, width
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1

    width = min_code_size + 1
    reset_table()
    prev: bytes | None = None
    while True:
        code = read_code(width)
        if code == clear:
            reset_table()
            prev = None
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]          # the KwKwK case
        else:
            raise ValueError("corrupt LZW stream")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out)


def decode_gif_pixels(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode the FIRST frame of a GIF (87a/89a) to (width, height, 3,
    RGB bytes) — pure-Python LZW, global or local color table,
    non-interlaced only. Frame dims are the image descriptor's (the
    logical screen is canvas metadata). Extension blocks are skipped;
    animation frame SAMPLING stays in frame_sample_stub (count
    arithmetic) — compositing partial frames with disposal methods is
    out of scope here."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    pos = 6
    _sw, _sh, flags, _bg, _ar = struct.unpack("<HHBBB", data[pos:pos + 7])
    pos += 7
    gct = b""
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = data[pos:pos + 3 * n]
        pos += 3 * n
    while pos < len(data):
        b0 = data[pos]
        if b0 == 0x21:                        # extension: skip sub-blocks
            pos += 2
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
        elif b0 == 0x2C:                      # image descriptor
            _lx, _ly, w, h, iflags = struct.unpack(
                "<HHHHB", data[pos + 1:pos + 10]
            )
            pos += 10
            if iflags & 0x40:
                raise ValueError("interlaced GIF unsupported")
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                pal = data[pos:pos + 3 * n]
                pos += 3 * n
            if not pal:
                raise ValueError("missing color table")
            min_code = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos]:
                ln = data[pos]
                lzw += data[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(bytes(lzw), min_code)
            if len(idx) < w * h:
                raise ValueError("short GIF index stream")
            out = bytearray(w * h * 3)
            for i in range(w * h):
                p = idx[i] * 3
                out[i * 3:i * 3 + 3] = pal[p:p + 3]
            return w, h, 3, bytes(out)
        elif b0 == 0x3B:                      # trailer
            break
        else:
            raise ValueError(f"bad GIF block 0x{b0:02x}")
    raise ValueError("no image data in GIF")
