#!/usr/bin/env python
"""Physical-plan audit: verify the optimizations we rely on actually fire.

For each headline query, prints the formatted plan plus a summary of:
- parquet PushedFilters (predicate pushdown reached the scan)
- ReadSchema width (column pruning)
- join strategies chosen (broadcast vs sort-merge vs shuffled hash)
- WholeStageCodegen span count (JVM-side execution)

Usage: python tools/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import io
import re
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
    scale_ext,
)
from datawarehouse_backup_system_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "q01_pricing_summary", "q02_scan_filter_project", "q03_id_range_probe",
    "q05_self_dedup_first", "q06_crossfile_dedup", "q14_revenue_by_region",
    "d02_minhash_lsh", "d06_similarity_topk",
]


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def summarize(name: str, text: str) -> str:
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", text)
    pushed = [p for p in pushed if p.strip()]
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", text)
    widths = [len(s.split(",")) if s else 0 for s in schemas]
    joins = re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin)", text)
    # formatted plans mark whole-stage-codegen'd operators with a leading '*'
    ops = re.findall(r"^\s*(?:[:+\-| ]*)(\*?)\s*\w+", text, re.M)
    codegen_ops = sum(1 for o in ops if o == "*")
    return (
        f"{name}:\n"
        f"  pushed filters : {pushed or 'none'}\n"
        f"  scan widths    : {widths}\n"
        f"  joins          : {sorted(set(joins)) or 'none'} (n={len(joins)})\n"
        f"  codegen ops    : {codegen_ops}\n"
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or DEFAULT
    # FOLDED_SPECS included so the 17 consolidated twins stay auditable
    # by name even though they left the driver contract (r7)
    specs = {s.name: s for s in
             relational.SPECS + relational.FOLDED_SPECS
             + relational_ext.SPECS + relational_ext.FOLDED_SPECS
             + llm_ops.SPECS + llm_ops.FOLDED_SPECS
             + extras.SPECS + extras.FOLDED_SPECS
             + curation_ext.SPECS + curation_ext.FOLDED_SPECS
             + analytics_ext.SPECS + analytics_ext.FOLDED_SPECS
             + corpus_ext.SPECS
             + pipeline_ext.SPECS + pipeline_ext.FOLDED_SPECS
             + scale_ext.SPECS + scale_ext.FOLDED_SPECS
             + round6_ext.SPECS + round7_ext.SPECS
             + round8_ext.SPECS + round9_ext.SPECS}
    spark = get_spark(app_name="explain-audit")
    verbose = len(sys.argv) > 2
    for name in names:
        df = specs[name].spark_fn(spark, sf_dir)
        df.collect()  # execute so AQE finalizes the plan (isFinalPlan=true)
        text = plan_text(df)
        print(summarize(name, text))
        if verbose:
            print(text)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
