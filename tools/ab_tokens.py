#!/usr/bin/env python
"""Interleaved A/B of tokens() recipes (r12, VERDICT r11 What's-wrong #1).

Variants, alternated per repetition inside ONE Spark session so host
drift hits all arms equally (the repo's d02/g03 interleave precedent):

- new    — split(regexp_replace-trim, WS_CLASS+)  (the r11 migration)
- old    — split(F.trim, \\s+)                     (pre-migration; TIMING
           ONLY — edge-whitespace semantics differ, fixtures carry none)
- notrim — split(text, WS_CLASS+)                 (isolates the trim pass)

Usage: python tools/ab_tokens.py <sf_dir> <reps> <query> [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from datawarehouse_backup_system_spark.operators import (  # noqa: E402
    dedup_approx,
    text,
)
from datawarehouse_backup_system_spark.session import get_spark  # noqa: E402


def _tok_new(c):
    return F.split(text.ws_trim(c), f"{text.WS_CLASS}+")


def _tok_old(c):
    return F.split(F.trim(c), r"\s+")


def _tok_notrim(c):
    return F.split(c, f"{text.WS_CLASS}+")


def _tok_arr(c):
    # candidate single-regex-pass form: runs-splitting only ever yields
    # edge '' tokens, so array_remove strips exactly what the trim did
    r = F.array_remove(F.split(c, f"{text.WS_CLASS}+"), "")
    return F.when(F.size(r) == 0, F.array(F.lit(""))).otherwise(r)


VARIANTS = {
    "new": _tok_new,
    "old": _tok_old,
    "notrim": _tok_notrim,
    "arr": _tok_arr,
}


def _steal():
    parts = open("/proc/stat").readline().split()
    v = [int(x) for x in parts[1:11]]
    return v


def main() -> int:
    sf_dir, reps = sys.argv[1], int(sys.argv[2])
    names = sys.argv[3:]
    from bench import HEADLINE  # noqa: F401  (path side effect only)
    from datawarehouse_backup_system_spark.queries import (
        analytics_ext, corpus_ext, curation_ext, extras, llm_ops,
        pipeline_ext, relational, relational_ext, round6_ext, round7_ext,
        round8_ext, round9_ext, round10_ext, round11_ext, scale_ext,
    )

    specs = {
        s.name: s
        for s in relational.SPECS + relational_ext.SPECS + llm_ops.SPECS
        + extras.SPECS + curation_ext.SPECS + analytics_ext.SPECS
        + corpus_ext.SPECS + pipeline_ext.SPECS + scale_ext.SPECS
        + round6_ext.SPECS + round7_ext.SPECS + round8_ext.SPECS
        + round9_ext.SPECS + round10_ext.SPECS + round11_ext.SPECS
    }
    spark = get_spark(app_name="ab-tokens")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    results: dict[str, dict[str, list[float]]] = {
        n: {v: [] for v in VARIANTS} for n in names
    }
    s0 = _steal()
    for rep in range(reps):
        for vname, fn in VARIANTS.items():
            text.tokens = fn
            dedup_approx._tokens = fn
            for n in names:
                spark.catalog.clearCache()
                t0 = time.time()
                specs[n].spark_fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                results[n][vname].append(round(time.time() - t0, 3))
    s1 = _steal()
    d = [b - a for a, b in zip(s0, s1)]
    print("steal_pct %.2f" % (100.0 * d[7] / sum(d[:8])))
    for n in names:
        row = "  ".join(
            f"{v}: min {min(r):.2f} med {sorted(r)[len(r)//2]:.2f} {r}"
            for v, r in results[n].items()
        )
        print(f"{n}: {row}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
