"""Regression pins for the round-9 high-effort review findings in
table_format / multimodal / bloom (each named in the fix commit)."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F


def test_bloom_semi_join_cross_width_keys(spark):
    """Review r9: xxhash64 is physical-type-sensitive — an INT fact key
    vs a BIGINT dim key previously hashed to different bloom positions,
    so the probe shed rows the closing semi-join would have matched.
    String canonicalization makes the integer family agree."""
    from datawarehouse_backup_system_spark.operators.bloom import (
        bloom_semi_join,
    )

    fact = spark.createDataFrame(
        [(i, f"f{i}") for i in range(50)], "k int, payload string"
    )
    dim = spark.createDataFrame(
        [(int(i),) for i in range(0, 50, 5)], "k bigint"
    )
    got = sorted(
        r["k"] for r in bloom_semi_join(fact, "k", dim, "k").collect()
    )
    assert got == list(range(0, 50, 5))


def test_png_zero_height_bomb_is_rejected():
    """Review r9: zlib decompress(data, max_length=0) means UNLIMITED,
    so a height-0 PNG bypassed the bounded-inflate bomb guard."""
    import zlib

    from datawarehouse_backup_system_spark.operators.multimodal import (
        decode_png_pixels,
    )

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    ihdr = struct.pack(">IIBBBBB", 16, 0, 8, 0, 0, 0, 0)  # height 0
    bomb = zlib.compress(b"\x00" * 10_000_000)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", bomb)
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="non-positive"):
        decode_png_pixels(png)


def test_format_read_ignores_underscore_manifest_dirs(spark, tmp_path):
    """Review r9: a fresh table holding only a _stats manifest counted
    as non-empty, so read() raised 'Unable to infer schema' instead of
    returning the empty fallback."""
    from pyspark.sql import types as T

    from datawarehouse_backup_system_spark.ledger import Ledger
    from datawarehouse_backup_system_spark.plans.table_format import (
        WriteIdParquetFormat,
    )

    fmt = WriteIdParquetFormat(
        Ledger(spark, tmp_path / "_ledger"), tmp_path,
        move=lambda src, dst: src.rename(dst),
    )
    table = tmp_path / "t"
    (table / "_stats").mkdir(parents=True)
    spark.createDataFrame(
        [("x", 1)], "a string, b long"
    ).coalesce(1).write.mode("overwrite").parquet(str(table / "_stats"))
    fb = T.StructType([T.StructField("id", T.LongType())])
    out = fmt.read(spark, table, fb)
    assert out.count() == 0 and out.schema == fb


def test_lease_late_release_never_deletes_thiefs_lease(tmp_path):
    """Review r9: release was a path-based read-then-unlink — a steal
    between the two calls deleted the thief's fresh lease. Now release
    renames-to-tombstone first (atomic take), verifies, and restores a
    foreign lease instead of deleting it."""
    from datawarehouse_backup_system_spark.plans.table_format import (
        WriterLease,
    )

    w1 = WriterLease(tmp_path, owner="w1", ttl_s=0.0).acquire()
    # simulate the thief: steal protocol's end state — fresh lease
    # with the thief's token at the same path
    w1.path.unlink()
    w1.path.write_text("w2-token")
    w1.release()  # late release from the stolen writer
    assert w1.path.exists()
    assert w1.path.read_text() == "w2-token"
    # and no stray tombstone left behind for the restore path
    assert not list(tmp_path.glob("_writer.lease.release.*"))


def test_pcm_features_ignores_data_word_in_list_chunk(spark):
    """Review r9: pcm_features found PCM via b.find(b'data'), so the
    ASCII word 'data' inside a LIST/INFO comment decoded metadata bytes
    as samples; the RIFF chunk walk finds the real chunk."""
    import numpy as np

    from datawarehouse_backup_system_spark.operators.multimodal import (
        pcm_features,
    )

    samples = np.arange(-4, 4, dtype="<i2").tobytes()
    info = b"INFOICMT" + struct.pack("<I", 12) + b"has data here"[:12]
    fmt_chunk = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
    data_chunk = b"data" + struct.pack("<I", len(samples)) + samples
    list_chunk = b"LIST" + struct.pack("<I", len(info)) + info
    body = b"WAVE" + fmt_chunk + list_chunk + data_chunk
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    df = spark.createDataFrame([(1, bytearray(wav))], "asset_id long, data binary")
    row = pcm_features(df).collect()[0]
    assert row["n_samples"] == 8  # the real chunk, not the comment text
    # non-WAV bytes containing 'data' must be rejected, not decoded
    junk = spark.createDataFrame(
        [(2, bytearray(b"some data here that is not riff at all"))],
        "asset_id long, data binary",
    )
    with pytest.raises(Exception, match="data"):
        pcm_features(junk).collect()


def test_mjpeg_no_video_frames_yields_err_row(spark):
    """Review r9: an AVI whose movi list has no video chunks emitted
    ZERO rows, silently losing the asset from downstream joins."""
    from datawarehouse_backup_system_spark.operators.multimodal import (
        mjpeg_frame_stats,
    )

    movi = b"LIST" + struct.pack("<I", 4) + b"movi"
    body = b"AVI " + movi
    avi = b"RIFF" + struct.pack("<I", len(body)) + body
    df = spark.createDataFrame([(7, bytearray(avi))], "asset_id long, data binary")
    rows = mjpeg_frame_stats(df).collect()
    assert len(rows) == 1
    assert rows[0]["asset_id"] == 7 and rows[0]["n_frames"] == 0
    assert "no video frames" in rows[0]["err"]


def test_decode_features_clamps_header_claims_to_int32(spark):
    """Review r9: a hostile header claiming width=0x90000000 silently
    wrapped negative through the default unsafe Arrow int32 cast; an
    absurd claim is now treated as absent metadata."""
    from datawarehouse_backup_system_spark.operators.multimodal import (
        decode_features,
    )

    ihdr_body = struct.pack(">IIBBBBB", 0x90000000, 10, 8, 0, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr_body)) + b"IHDR" + ihdr_body
        + struct.pack(">I", 0)
    )
    df = spark.createDataFrame(
        [(1, "image", bytearray(png), None)],
        "asset_id long, kind string, data binary, meta map<string,string>",
    )
    row = decode_features(df).collect()[0]
    assert row["width"] is None  # absurd claim -> absent, never negative
    assert row["height"] == 10
