"""End-to-end ingest pipeline tests over the F-1 dirty-CSV fixtures.

Asserts the reference's semantics (SURVEY §3 E1): which rows survive
dedup, dense id assignment, dirty-value coercions, ledger idempotency.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datawarehouse_backup_system_spark.plans.ingest import IngestJob
from datawarehouse_backup_system_spark.registry import SchemaRegistry
from datawarehouse_backup_system_spark.sources.catalog import Router

from fixtures import generate_f1


def make_job(spark, tmp_path, fx) -> IngestJob:
    registry = SchemaRegistry.from_files(fx["schema_path"], fx["rename_path"])
    router = Router().add(r"^last24h__", "mini_campaign_events")
    return IngestJob(spark=spark, registry=registry,
                     warehouse_dir=tmp_path / "warehouse", router=router)


def test_full_cycle(spark, tmp_path):
    fx = generate_f1(tmp_path)
    job = make_job(spark, tmp_path, fx)
    results = job.run(tmp_path)

    assert [r.status for r in results] == ["uploaded to ClickHouse"] * 3

    schema = job.registry.get("mini_campaign_events")
    table = job.read_table(schema)

    # --- dedup semantics: J1 within each file, J2 across files ----------
    set1 = {tuple(r) for r in fx_rows(fx, 0)}
    set2 = {tuple(r) for r in fx_rows(fx, 1)} - set1
    set3 = {tuple(r) for r in fx_rows(fx, 2)}  # 12-col space, no smtp
    expected_total = len(set1) + len(set2) + len(set3)
    assert table.count() == expected_total
    assert results[0].rows_loaded == len(set1)
    assert results[1].rows_loaded == len(set2)
    assert results[2].rows_loaded == len(set3)

    # row_hash is a true content key: distinct everywhere
    assert table.select("row_hash").distinct().count() == expected_total

    # --- dense ids: 1..N, no gaps, watermark carried across files -------
    ids = table.agg(F.min("id"), F.max("id"), F.count("id"),
                    F.countDistinct("id")).collect()[0]
    assert list(ids) == [1, expected_total, expected_total, expected_total]

    # --- typed output ----------------------------------------------------
    out_schema = dict((f.name, f.dataType.simpleString()) for f in table.schema.fields)
    assert out_schema["event_datetime"] == "timestamp"
    assert out_schema["number_of_children"] == "bigint"
    assert out_schema["total_order_amount_eur"] == "double"
    assert out_schema["date_of_birth"] == "string"

    # --- dirty-value coercions (F2-F7) -----------------------------------
    # F5: no trailing '.0' survives on string columns; leading zeros kept
    assert table.where(F.col("mobile").rlike(r"\.0$")).count() == 0
    assert table.where(F.col("billing_postal_code").rlike(r"\.0$")).count() == 0
    assert table.where(F.col("billing_postal_code").startswith("0")).count() > 0
    # F7: 'nan'/'<NA>' scrubbed to real nulls
    assert table.where(F.col("email").isin("nan", "<NA>")).count() == 0
    assert table.where(F.col("email").isNull()).count() > 0
    # F2: unparseable dates coerced to null, parseable ones kept
    assert table.where(F.col("event_date").isNull()).count() > 0
    assert table.where(F.col("event_date").isNotNull()).count() > 0
    # F3: non-numeric ints coerced to null
    assert table.where(F.col("number_of_children").isNull()).count() > 0
    # F6: DOB stored as 'yyyy-MM-dd' string or null
    bad_dob = table.where(
        F.col("date_of_birth").isNotNull()
        & ~F.col("date_of_birth").rlike(r"^\d{4}-\d{2}-\d{2}$")
    )
    assert bad_dob.count() == 0
    # P2: file 3 had no smtp column -> backfilled NULL
    assert table.where(F.col("smtp_response").isNull()).count() >= len(set3)

    # --- ledger idempotency (P4): second cycle is a no-op ----------------
    again = job.run(tmp_path)
    assert again == []
    assert table.count() == expected_total


def fx_rows(fx, i):
    import csv

    with open(fx["files"][i], encoding="utf-8") as f:
        rows = list(csv.reader(f, delimiter=";"))
    return rows[1:]


def test_batch_ingest_equals_sequential(spark, tmp_path):
    """process_batch (one plan over N files) must produce the same table
    state as sequential process_file calls — same survivors, same dedup
    winners, dense ids."""
    fx = generate_f1(tmp_path)
    seq_job = make_job(spark, tmp_path / "seq", fx)
    for f in fx["files"][:2]:  # files 1+2 share the full header layout
        seq_job.process_file(f)
    batch_job = make_job(spark, tmp_path / "batch", fx)
    res = batch_job.process_batch(fx["files"][:2], "mini_campaign_events")
    assert res.status == "uploaded to ClickHouse"

    schema = seq_job.registry.get("mini_campaign_events")
    seq_tbl = seq_job.read_table(schema)
    batch_tbl = batch_job.read_table(schema)
    assert batch_tbl.count() == seq_tbl.count()
    # identical surviving content (hash sets equal)
    seq_h = {r["row_hash"] for r in seq_tbl.select("row_hash").collect()}
    bat_h = {r["row_hash"] for r in batch_tbl.select("row_hash").collect()}
    assert seq_h == bat_h
    # dense ids across the whole batch
    n = batch_tbl.count()
    ids = batch_tbl.agg(F.min("id"), F.max("id"), F.countDistinct("id")).collect()[0]
    assert list(ids) == [1, n, n]
    # ledger has one entry per source file (write markers excluded)
    assert batch_job.ledger.processed_set() == {f.name for f in fx["files"][:2]}


def test_batch_divergent_profile_falls_back_per_file(spark, tmp_path):
    """Review r8: a valid file whose (encoding, delimiter, header)
    profile differs from the batch's first file must still be INGESTED
    (per-file fallback under its own sniffed settings) — the old
    behavior ledgered it COLUMN_MISMATCH, which processed_set() treats
    as done, permanently losing its rows."""
    from datawarehouse_backup_system_spark import ledger as ledger_mod

    fx = generate_f1(tmp_path)
    # make file 3 a comma-delimited variant of file 1's content: valid,
    # same header NAMES, different sniffed delimiter → profile diverges
    src = fx["files"][0].read_text(encoding="utf-8")
    comma = tmp_path / "last24h__comma_variant.csv"
    comma.write_text(
        "\n".join(line.replace(";", ",") for line in src.splitlines())
        + "\n",
        encoding="utf-8",
    )
    job = make_job(spark, tmp_path, fx)
    res = job.process_batch(
        [fx["files"][0], fx["files"][1], comma], "mini_campaign_events"
    )
    assert res.status == ledger_mod.STATUS_UPLOADED
    # the divergent file was ingested, not blacklisted
    rows = job.ledger.read().collect()
    mine = [r for r in rows if r["file_name"] == comma.name]
    assert [r["status"] for r in mine] == [ledger_mod.STATUS_UPLOADED]

    # empty batch is a total-function no-op, not an IndexError
    empty = job.process_batch([], "mini_campaign_events")
    assert empty.status == ledger_mod.STATUS_EMPTY


def test_batch_divergent_mid_batch_preserves_sequential_order(spark, tmp_path):
    """Review r9 (ADVICE): a divergent file MID-batch whose rows also
    appear in a LATER conforming file must keep sequential semantics —
    ids follow the original path order and first-occurrence dedup
    credits the earlier file. The old code ingested all divergent
    files FIRST, which both shifted every id and flipped the dedup
    winner. The (row_hash → id) map pins both."""
    from datawarehouse_backup_system_spark import ledger as ledger_mod

    fx = generate_f1(tmp_path)
    # comma-delimited variant of file 2's FULL content: divergent
    # profile, placed BETWEEN files 1 and 2 — its rows duplicate the
    # later conforming file's rows, so the dedup winner is order-defined
    src = fx["files"][1].read_text(encoding="utf-8")
    comma = tmp_path / "last24h__comma_mid.csv"
    comma.write_text(
        "\n".join(line.replace(";", ",") for line in src.splitlines())
        + "\n",
        encoding="utf-8",
    )
    order = [fx["files"][0], comma, fx["files"][1]]
    seq_job = make_job(spark, tmp_path / "seq9", fx)
    for f in order:
        seq_job.process_file(f)
    batch_job = make_job(spark, tmp_path / "batch9", fx)
    res = batch_job.process_batch(order, "mini_campaign_events")
    assert res.status == ledger_mod.STATUS_UPLOADED

    schema = seq_job.registry.get("mini_campaign_events")
    seq_map = {
        r["row_hash"]: r["id"]
        for r in seq_job.read_table(schema).select("row_hash", "id").collect()
    }
    bat_map = {
        r["row_hash"]: r["id"]
        for r in batch_job.read_table(schema).select("row_hash", "id").collect()
    }
    assert bat_map == seq_map
    assert res.rows_loaded == len(seq_map)


def test_ingest_date_partitioning_and_retention(spark, tmp_path):
    """Snapshots are partitioned by ingest_date; retention = partition drop."""
    from datawarehouse_backup_system_spark.operators.retention import (
        drop_old_partitions,
    )
    from datawarehouse_backup_system_spark.registry import SchemaRegistry

    fx = generate_f1(tmp_path, n=60)
    registry = SchemaRegistry.from_files(fx["schema_path"], fx["rename_path"])
    router = Router().add(r"^last24h__", "mini_campaign_events")
    old_job = IngestJob(spark=spark, registry=registry,
                        warehouse_dir=tmp_path / "warehouse", router=router,
                        ingest_date="2024-01-05")
    old_job.process_file(fx["files"][0])
    new_job = IngestJob(spark=spark, registry=registry,
                        warehouse_dir=tmp_path / "warehouse", router=router,
                        ingest_date="2024-03-01")
    new_job.process_file(fx["files"][2])

    schema = registry.get("mini_campaign_events")
    table_dir = old_job.table_path(schema)
    parts = sorted(d.name for d in table_dir.glob("ingest_date=*"))
    assert parts == ["ingest_date=2024-01-05", "ingest_date=2024-03-01"]

    # partition pruning: a dated read touches only one directory
    pruned = spark.read.parquet(str(table_dir)).where(
        F.col("ingest_date") == "2024-03-01"
    )
    assert "2024-01-05" not in pruned._jdf.queryExecution().executedPlan().toString()

    removed = drop_old_partitions(
        spark, table_dir, "ingest_date", keep_days=30, today="2024-03-02"
    )
    assert removed == 1
    left = spark.read.parquet(str(table_dir))
    assert {r["ingest_date"].isoformat() for r in left.select("ingest_date").distinct().collect()} \
        == {"2024-03-01"}


def test_zip_ledgered_under_original_name(spark, tmp_path):
    """Idempotency must key on the LANDING name (the .zip), not the
    extracted member — otherwise every cycle reprocesses the zip."""
    import zipfile

    fx = generate_f1(tmp_path, n=30)
    job = make_job(spark, tmp_path, fx)
    inner = fx["files"][0]
    zpath = tmp_path / "last24h__zipped.csv.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.write(inner, inner.name)
    inner.unlink()  # only the zip remains in the landing dir
    for f in fx["files"][1:]:
        f.unlink()

    first = job.run(tmp_path)
    assert [r.status for r in first] == ["uploaded to ClickHouse"]
    assert job.ledger.processed_set() == {zpath.name}
    assert job.run(tmp_path) == []  # second cycle: skipped


def test_unroutable_file_gets_ledgered(spark, tmp_path):
    fx = generate_f1(tmp_path, n=40)
    job = make_job(spark, tmp_path, fx)
    weird = tmp_path / "mystery_export.csv"
    weird.write_text("a;b\n1;2\n")
    res = job.process_file(weird)
    assert res.status == "no schema found"
    ledger = job.ledger.read()
    assert ledger.where(F.col("status") == "no schema found").count() == 1


def test_extra_columns_rejected(spark, tmp_path):
    """Q4 asymmetry: more columns than schema -> reject."""
    fx = generate_f1(tmp_path, n=40)
    job = make_job(spark, tmp_path, fx)
    bad = tmp_path / "last24h__extra.csv"
    header = "Email;prénom;Campaign Event Type;Event Date;Event Datetime;Mobile;" \
             "CODEPOSTAL_FACTURATION;DATE DE NAISSANCE;NB_ENFANTS;NB_TOTAL_COMMANDES;" \
             "MONTANT_TOTAL_COMMANDES_EUR;Campaign Name;SMTP response;BONUS COLUMN"
    bad.write_text(header + "\n" + ";".join(["x"] * 14) + "\n")
    res = job.process_file(bad)
    assert res.status == "column count mismatch"
    assert "BONUS COLUMN" in (res.error or "")


def test_gzip_csv_ingests_like_plain(spark, tmp_path):
    """A .csv.gz export ingests identically to its plain sibling: the
    sniffers gunzip transparently, routing/ledgering keys on the landing
    name, and Spark's codec reads the compressed scan."""
    import gzip

    from datawarehouse_backup_system_spark.sources.csv_source import (
        detect_delimiter,
        detect_encoding,
        read_header,
    )

    fx = generate_f1(tmp_path, n=30)
    job = make_job(spark, tmp_path, fx)
    plain = fx["files"][0]
    gz = tmp_path / (plain.name + ".gz")
    gz.write_bytes(gzip.compress(plain.read_bytes()))
    # sniffers see the TEXT, not the gzip stream
    assert detect_encoding(gz) == detect_encoding(plain)
    assert detect_delimiter(gz) == detect_delimiter(plain)
    assert read_header(gz) == read_header(plain)

    for f in fx["files"]:
        f.unlink()  # only the gz remains

    first = job.run(tmp_path)
    assert [r.status for r in first] == ["uploaded to ClickHouse"]
    assert job.ledger.processed_set() == {gz.name}
    schema = job.registry.get("mini_campaign_events")
    assert job.read_table(schema).count() > 0
    assert job.run(tmp_path) == []  # idempotent
