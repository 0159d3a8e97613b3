#!/usr/bin/env python
"""Dump ``explain("formatted")`` for named queries to files.

Usage:
    python tools/dump_plans.py <out_dir> <suffix> <sf_dir> <query> [query ...]

Writes ``<out_dir>/<query>_<suffix>.txt`` per query — the judge-checkable
plan artifacts for the optimization rounds (plans/r11/*_before.txt /
*_after.txt). Each query is EXECUTED first (noop sink) so AQE finalizes
the plan; the dumped text is the final adaptive plan.
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from datawarehouse_backup_system_spark.queries import (  # noqa: E402
    analytics_ext,
    corpus_ext,
    pipeline_ext,
    curation_ext,
    extras,
    llm_ops,
    relational,
    relational_ext,
    round6_ext,
    round7_ext,
    round8_ext,
    round9_ext,
    round10_ext,
    scale_ext,
)
from datawarehouse_backup_system_spark.session import get_spark  # noqa: E402

try:  # round11_ext exists from r11 on; tolerate older checkouts
    from datawarehouse_backup_system_spark.queries import round11_ext
    _R11 = round11_ext.SPECS
except ImportError:  # pragma: no cover
    _R11 = []


def main() -> int:
    out_dir, suffix, sf_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    specs = {
        s.name: s
        for s in relational.SPECS + relational_ext.SPECS + llm_ops.SPECS
        + extras.SPECS + curation_ext.SPECS + analytics_ext.SPECS
        + corpus_ext.SPECS + pipeline_ext.SPECS + scale_ext.SPECS
        + round6_ext.SPECS + round7_ext.SPECS + round8_ext.SPECS
        + round9_ext.SPECS + round10_ext.SPECS + _R11
    }
    Path(out_dir).mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="dump-plans")
    rc = 0
    for name in names:
        try:
            df = specs[name].spark_fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            Path(out_dir, f"{name}_{suffix}.txt").write_text(buf.getvalue())
            print(f"wrote {name}_{suffix}.txt")
        except Exception as exc:  # noqa: BLE001 — keep dumping the rest
            print(f"FAILED {name}: {type(exc).__name__}: {exc}")
            rc = 1
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
