"""Loader preflight across testdata generations (VERDICT r4 item 6).

Round 3's incident: the driver regenerated /root/testdata and events.ts
changed physical encoding (BIGINT-nanos -> TIMESTAMP_NTZ micros),
crashing 18 queries. ``queries/base.py`` now branches on the DECODED
type; these tests synthesize an events table in EVERY encoding variant
the branch handles — nanos (Spark reads long under
``legacy.parquet.nanosAsLong``), micros-NTZ, and micros-UTC-adjusted —
and pin that ``load()`` yields the identical session-UTC TimestampType
rows for each, so a third generation's encoding flip cannot recreate
the r3 incident silently.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


TS = [
    dt.datetime(2024, 1, 5, 12, 0, 0, 123456),
    dt.datetime(2024, 2, 6, 1, 30, 59, 999999),
    dt.datetime(2024, 3, 7, 23, 59, 0, 1),
]


def _write_events(path, ts_array: pa.Array) -> None:
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 20, 30], pa.int64()),
            "event_type": pa.array(["view", "click", "purchase"]),
            "value": pa.array([1.5, 2.5, 3.5], pa.float64()),
            "props": pa.array(['{"a":1}', "{}", "{}"]),
        }
    )
    pq.write_table(t, str(path))


ENCODINGS = {
    # r1/r2-generation: TIMESTAMP(NANOS) — Spark's vectorized reader
    # rejects it; load() reads nanos-as-long and truncates to micros
    "nanos": pa.timestamp("ns"),
    # r3+-generation: TIMESTAMP(MICROS) isAdjustedToUTC=false — Spark
    # decodes TIMESTAMP_NTZ; load() casts to session-UTC timestamp
    "micros_ntz": pa.timestamp("us"),
    # the plausible NEXT flip: micros adjusted-to-UTC — Spark decodes
    # TimestampType directly; load() passes it through
    "micros_utc": pa.timestamp("us", tz="UTC"),
}


@pytest.mark.parametrize("name", sorted(ENCODINGS))
def test_load_events_any_ts_encoding(spark, tmp_path, name):
    from pyspark.sql import types as T

    from datawarehouse_backup_system_spark.queries.base import load

    sf_dir = tmp_path / name
    sf_dir.mkdir()
    _write_events(
        sf_dir / "events.parquet", pa.array(TS, ENCODINGS[name])
    )
    df = load(spark, str(sf_dir), "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    got = [r["ts"] for r in df.orderBy("event_id").collect()]
    assert got == TS  # same wall-clock instants in session-UTC


def test_load_events_encodings_agree(spark, tmp_path):
    """All encoding variants of the SAME data load to identical rows —
    the invariant every event query depends on across regenerations."""
    from datawarehouse_backup_system_spark.queries.base import load

    results = {}
    for name, typ in ENCODINGS.items():
        sf_dir = tmp_path / name
        sf_dir.mkdir()
        _write_events(sf_dir / "events.parquet", pa.array(TS, typ))
        results[name] = [
            tuple(r) for r in
            load(spark, str(sf_dir), "events").orderBy("event_id").collect()
        ]
    assert results["nanos"] == results["micros_ntz"] == results["micros_utc"]


def test_detect_encoding_latin1_not_misread_as_utf16(tmp_path):
    """Review r7 (confirmed): any even-length byte string 'decodes' as
    UTF-16, so an ungated trial turned every BOM-less latin-1 file into
    CJK mojibake; the trial is now gated on NUL bytes."""
    from datawarehouse_backup_system_spark.sources.csv_source import (
        detect_encoding,
    )

    p = tmp_path / "latin.csv"
    p.write_bytes("name;city\nRené;Orléans!\n".encode("iso-8859-1"))
    assert len(p.read_bytes()) % 2 == 0  # the hazard shape
    assert detect_encoding(p) == "iso-8859-1"
    # BOM-less utf-16 (has NUL halves for ASCII) still detects
    p16 = tmp_path / "bomless16.csv"
    p16.write_bytes("a,b\n1,2\n".encode("utf-16-le"))
    assert detect_encoding(p16) in ("utf-16", "utf-16-le")


def test_detect_encoding_truncated_multibyte_boundary(tmp_path):
    """Review r7 (confirmed): a multi-byte UTF-8 char straddling the
    sample boundary must not fail the utf-8 trial."""
    from datawarehouse_backup_system_spark.sources.csv_source import (
        detect_encoding,
    )

    p = tmp_path / "big.csv"
    body = ("x" * 99) + "é"  # 101 bytes per chunk in utf-8
    p.write_text(body * 1000, encoding="utf-8")
    # pick a sample size that lands INSIDE the 2-byte 'é'
    raw = p.read_bytes()
    cut = raw.find("é".encode()[0:1], 90) + 1
    assert detect_encoding(p, sample_size=cut) == "utf-8"


def test_detect_encoding_truncated_complete_tail(tmp_path):
    """ADVICE r7 (medium): the old fix dropped a FIXED 3 trailing bytes,
    which bisects a COMPLETE trailing multi-byte char (all-2-byte chars
    with the sample boundary ON a char boundary; or a 4-byte emoji
    flush with the boundary) and misdetected valid UTF-8 as
    iso-8859-1. The incremental-decoder tail handling must accept
    both complete and split tails."""
    from datawarehouse_backup_system_spark.sources.csv_source import (
        detect_encoding,
    )

    p = tmp_path / "twobyte.csv"
    p.write_bytes(("é" * 100).encode("utf-8"))  # 200 bytes
    assert detect_encoding(p, sample_size=200) == "utf-8"  # on boundary
    assert detect_encoding(p, sample_size=199) == "utf-8"  # mid-char

    q = tmp_path / "emoji.csv"
    q.write_bytes(("a" * 96 + "\U0001F389").encode("utf-8"))  # 100 bytes
    assert detect_encoding(q, sample_size=100) == "utf-8"  # flush
    assert detect_encoding(q, sample_size=98) == "utf-8"   # split


def test_detect_encoding_truncated_utf16_tails(tmp_path):
    """ADVICE r7 (low): a truncated BOM-less UTF-16 sample ending
    mid-code-unit (odd sample size) or on a lone high surrogate must
    not fail the utf-16 trial and fall through to utf-8 (NUL bytes are
    valid UTF-8). Review r8: BOM-less detection must report the
    CONCRETE endianned codec — bare "utf-16" crashes every downstream
    TextIOWrapper open ("stream does not start with BOM")."""
    from datawarehouse_backup_system_spark.sources.csv_source import (
        detect_encoding,
    )

    # review r9: endianness is now read from the DATA (NUL-offset
    # parity), so LE content detects utf-16-le on any host
    p = tmp_path / "odd16.csv"
    p.write_bytes("id,name\n1,abc\n".encode("utf-16-le"))
    assert detect_encoding(p, sample_size=15) == "utf-16-le"  # odd cut

    q = tmp_path / "surr16.csv"
    q.write_bytes(
        "ab".encode("utf-16-le") + "\U0001F600".encode("utf-16-le")[:2]
    )
    assert detect_encoding(q, sample_size=6) == "utf-16-le"  # lone high

    # truncated latin-1 must still fall through cleanly
    r = tmp_path / "lat.csv"
    r.write_bytes(("café " * 50).encode("iso-8859-1"))
    assert detect_encoding(r, sample_size=100) == "iso-8859-1"


def test_bomless_utf16_big_endian_detected_from_data(tmp_path):
    """ADVICE r9 (low): BOM-less UTF-16 endianness must come from the
    data, not the host byte order — a BE file on a little-endian
    machine previously 'decoded' as utf-16-le without error (every
    ASCII pair becomes a CJK code point) and silently mojibaked. The
    NUL-offset-parity heuristic picks BE, and the full read round-trips."""
    from datawarehouse_backup_system_spark.sources.csv_source import (
        detect_delimiter,
        detect_encoding,
        read_header,
    )

    p = tmp_path / "bomless_be.csv"
    p.write_bytes("id;name\n1;René\n".encode("utf-16-be"))
    enc = detect_encoding(p)
    assert enc == "utf-16-be"
    assert detect_delimiter(p, enc) == ";"
    assert read_header(p, enc, ";") == ["id", "name"]


def test_bomless_utf16_detected_encoding_opens_and_reads(tmp_path):
    """Review r8 end-to-end regression: the codec name detect_encoding
    returns for a BOM-less UTF-16 file must be USABLE — the delimiter
    sniff (TextIOWrapper open + readline) previously crashed with
    UnicodeError because the bare "utf-16" incremental decoder refuses
    BOM-less input (errors="replace" does NOT catch that raise)."""
    from datawarehouse_backup_system_spark.sources.csv_source import (
        detect_delimiter,
        detect_encoding,
        read_header,
    )

    p = tmp_path / "bomless.csv"
    p.write_bytes("id;name\n1;René\n".encode("utf-16-le"))
    enc = detect_encoding(p)
    assert enc is not None
    assert detect_delimiter(p, enc) == ";"
    assert read_header(p, enc, ";") == ["id", "name"]


def test_zip_first_member_hostile_names(tmp_path):
    """Review r7: extract()'s sanitized return path is used — absolute
    or dot-dot member names must stay inside the staging dir."""
    import zipfile

    from datawarehouse_backup_system_spark.sources.csv_source import (
        extract_zip_first_member,
    )

    z = tmp_path / "evil.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("/abs/path.csv", "a,b\n1,2\n")
    out = extract_zip_first_member(z, tmp_path / "staging")
    assert out.exists()
    assert str(out).startswith(str(tmp_path / "staging"))
    assert out.read_text() == "a,b\n1,2\n"

    z2 = tmp_path / "dotdot.zip"
    with zipfile.ZipFile(z2, "w") as zf:
        zf.writestr("a/../b.csv", "x,y\n3,4\n")
    out2 = extract_zip_first_member(z2, tmp_path / "staging2")
    assert out2.exists() and out2.read_text() == "x,y\n3,4\n"
    assert str(out2).startswith(str(tmp_path / "staging2"))
