#!/usr/bin/env python
"""Interleaved A/B of the r10 _small_star hub-dedup rewrite on
g03_wcc_sessions (VERDICT r10 item 3: the 18.44→22.51 s sf1 drift spans
the rewrite, so noise-vs-rewrite needs a measurement, not an assertion).

Protocol (the d02/g05 precedent in SCALE.md): alternate
NEW,OLD,NEW,OLD,NEW,OLD on one warm JVM against the same sf dir, with a
/proc/stat steal bracket per run; report per-variant runs + min. Usage:

    SPARK_GRAFT_SF_DIR=/tmp/dwbss-sf1 python tools/ab_small_star.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

import bench  # noqa: E402 — reuse the steal bracket helpers
from datawarehouse_backup_system_spark.operators import graph  # noqa: E402
from datawarehouse_backup_system_spark.queries.round8_ext import (  # noqa: E402
    g03_wcc_sessions,
)
from datawarehouse_backup_system_spark.session import get_spark  # noqa: E402

NEW = graph._small_star


def OLD(e):
    """Pre-d1b7614 variant: center edge exploded once PER MEMBER."""
    d = e.select(F.col("hi").alias("h"), F.col("lo").alias("l"))
    m = d.groupBy("h").agg(F.min("l").alias("m"))
    out = d.join(m, "h").select(
        F.col("m").alias("u"),
        F.explode(F.array("l", "h")).alias("v"),
    )
    return graph._canon(out)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/dwbss-sf1")
    rounds = int(os.environ.get("AB_ROUNDS", "3"))
    spark = get_spark(app_name="ab-small-star")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()  # warm JVM

    results: dict[str, list[dict]] = {"new": [], "old": []}
    # one throwaway warmup PER VARIANT (review r11: warming only NEW
    # left OLD's first timed round carrying its plan's codegen compile —
    # a bias toward NEW on exactly the question the tool settles)
    for fn in (NEW, OLD):
        graph._small_star = fn
        g03_wcc_sessions(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    for i in range(rounds):
        for label, fn in (("new", NEW), ("old", OLD)):
            graph._small_star = fn
            spark.catalog.clearCache()
            s0 = bench._cpu_stat()
            t0 = time.time()
            g03_wcc_sessions(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            sec = time.time() - t0
            stat = bench._stat_delta(s0, bench._cpu_stat())
            results[label].append(
                {"sec": round(sec, 2), "steal_pct": (stat or {}).get("steal_pct")}
            )
            print(f"round {i} {label}: {sec:.2f}s steal={stat}", flush=True)
    graph._small_star = NEW
    summary = {
        "sf_dir": sf_dir,
        "runs": results,
        "min_new": min(r["sec"] for r in results["new"]),
        "min_old": min(r["sec"] for r in results["old"]),
        "max_steal_pct": max(
            (r["steal_pct"] or 0.0) for rs in results.values() for r in rs
        ),
    }
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
