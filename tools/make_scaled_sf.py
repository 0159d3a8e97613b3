#!/usr/bin/env python
"""Synthesize a larger scale factor from /root/testdata/sf0.1 by
id-offset replication — the sf1 measurement input for SCALE.md
(VERDICT r4 item 4). Only the tables the scale families read are
scaled: documents (d02/d09/d13/x01), lineitem (v01), events (h02).

Replication must preserve each family's STRUCTURE per copy:

- ``documents``: every word gets a per-copy suffix — a bijection on the
  vocabulary, so each copy's shingle-set structure (and thus its
  near-dup pair set) is EXACTLY the sf0.1 one, while cross-copy pairs
  share zero shingles. Pair count therefore scales exactly linearly —
  naive text replication would instead make every cross-copy twin a
  near-dup pair (~N² growth) and poison the scaling measurement.
- ``lineitem`` / ``events``: key columns offset per copy; value
  distributions untouched (group COUNT stays fixed as at a real larger
  sf — groups get deeper, not more numerous).

Usage: python tools/make_scaled_sf.py [factor] [out_dir]
       (defaults: 10 /tmp/dwbss-sf1)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from datawarehouse_backup_system_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"


def main() -> int:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/dwbss-sf1")
    out.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="make-scaled-sf")

    # base.load, not raw spark.read (review r11): it handles the
    # TIMESTAMP(NANOS) testdata encoding and pins the UTC session TZ —
    # a raw read crashes at schema inference on nanos generations
    from datawarehouse_backup_system_spark.queries.base import load

    docs = load(spark, SRC, "documents")
    li = load(spark, SRC, "lineitem")
    ev = load(spark, SRC, "events")
    doc_off = docs.agg(F.max("doc_id")).first()[0] + 1
    ok_off = li.agg(F.max("l_orderkey")).first()[0] + 1
    ev_off = ev.agg(F.max("event_id")).first()[0] + 1

    copies = spark.range(factor).withColumnRenamed("id", "copy")

    (
        docs.crossJoin(copies)
        .select(
            (F.col("doc_id") + F.col("copy") * doc_off).alias("doc_id"),
            # per-copy vocabulary bijection: word -> word_c<copy>
            # replacement must be a Column built with concat — ``str + Column``
            # compiles to arithmetic ``+`` and fails analysis (ADVICE r5)
            F.regexp_replace(
                "text",
                F.lit(r"(\S+)"),
                F.concat(F.lit("$1_c"), F.col("copy").cast("string")),
            ).alias("text"),
            "lang", "source", "n_chars",
        )
        .repartition(32)
        .write.mode("overwrite").parquet(str(out / "documents.parquet"))
    )
    (
        li.crossJoin(copies)
        .select(
            (F.col("l_orderkey") + F.col("copy") * ok_off).alias("l_orderkey"),
            *[c for c in li.columns if c != "l_orderkey"],
        )
        .drop("copy")
        .repartition(32)
        .write.mode("overwrite").parquet(str(out / "lineitem.parquet"))
    )
    (
        ev.crossJoin(copies)
        .select(
            (F.col("event_id") + F.col("copy") * ev_off).alias("event_id"),
            *[c for c in ev.columns if c != "event_id"],
        )
        .drop("copy")
        .repartition(32)
        .write.mode("overwrite").parquet(str(out / "events.parquet"))
    )
    # symlink the unscaled tables so the output dir is a COMPLETE sf dir
    # (any contract query can run against it; only the scale families'
    # inputs actually grew)
    scaled = {"documents", "lineitem", "events"}
    for src_tbl in sorted(Path(SRC).glob("*.parquet")):
        name = src_tbl.name.removesuffix(".parquet")
        if name in scaled:
            continue
        link = out / src_tbl.name
        if not link.exists():
            link.symlink_to(src_tbl)

    for t in ("documents", "lineitem", "events"):
        n = spark.read.parquet(str(out / f"{t}.parquet")).count()
        print(f"{t}: {n} rows")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
