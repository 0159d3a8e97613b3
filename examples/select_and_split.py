#!/usr/bin/env python
"""Data selection + leakage-safe splitting, end-to-end.

    python examples/select_and_split.py

Chains this round's curation operators over the shipped test corpus:

1. **LM quality gate** — in-corpus hashed bigram LM; drop the lowest
   avg-log-prob decile (operators.lm, query t26),
2. **duplicated-span screen** — drop documents whose 8-token spans are
   mostly copies of other documents (operators.text.dup_spans, t21),
3. **DSIR selection weights** — importance weights toward the English
   slice (operators.importance.dsir_weights, t22),
4. **per-source cap** — keep the best N per source by LM score
   (operators.curation.domain_cap, t24),
5. **leakage-safe split** — near-dup groups co-travel across
   train/val/test (operators.curation.leakage_safe_split, t23),
6. **padding report** — packing efficiency of the final selection at a
   fixed context length (t29's arithmetic).

Every stage is an operator the driver contract verifies against DuckDB;
this script only composes them.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from datawarehouse_backup_system_spark.operators import lm, text
from datawarehouse_backup_system_spark.operators.curation import (
    domain_cap,
    leakage_safe_split,
)
from datawarehouse_backup_system_spark.operators.dedup_approx import (
    minhash_lsh_dedup,
)
from datawarehouse_backup_system_spark.operators.importance import dsir_weights
from datawarehouse_backup_system_spark.queries.base import load
from datawarehouse_backup_system_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


def main() -> int:
    spark = get_spark(app_name="select-and-split", shuffle_partitions=8)
    docs = load(spark, SF_DIR, "documents")
    n0 = docs.count()

    # 1. LM gate: drop the weakest decile by avg log-prob
    scores = lm.bigram_lm_scores(docs, "doc_id", "text")
    cut = scores.where(F.col("avg_logp").isNotNull()).approxQuantile(
        "avg_logp", [0.1], 0.01
    )[0]
    keep_lm = scores.where(F.col("avg_logp") >= cut).select("doc_id", "avg_logp")
    docs = docs.join(keep_lm, "doc_id")
    n1 = docs.count()

    # 2. span screen: mostly-duplicated documents out
    spans = text.dup_spans(docs, "doc_id", "text", n=8)
    docs = docs.join(
        spans.where(F.col("dup_frac") <= 0.5).select("doc_id"), "doc_id"
    )
    n2 = docs.count()

    # 3. DSIR weights toward the English slice (kept as a column for a
    #    downstream weighted sampler)
    w = dsir_weights(docs, "doc_id", "text", F.col("lang") == "en")
    docs = docs.join(w.select("doc_id", "weight"), "doc_id")

    # 4. per-source cap, best LM score first
    docs = domain_cap(docs, "source", [F.col("avg_logp").desc()], 15)
    n3 = docs.count()

    # 5. leakage-safe split: near-dup groups co-travel
    pairs = minhash_lsh_dedup(
        docs, "doc_id", "text", shingle_n=3, k=9, band_size=3, threshold=0.5
    ).select("id_a", "id_b")
    split = leakage_safe_split(docs, pairs, "doc_id")
    docs = docs.join(split, "doc_id")

    # 6. padding economics of the final mixture at context length 128
    L = 128
    n_tok = text.token_count(F.col("text")).cast("bigint")
    report = (
        docs.select(
            "split",
            n_tok.alias("n"),
            F.floor((n_tok + F.lit(L - 1)) / F.lit(L)).cast("bigint").alias("s"),
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n").alias("tokens"),
            F.round(F.sum("n") / (F.sum("s") * L), 4).alias("pack_eff"),
        )
        .orderBy("split")
    )

    rows = report.collect()  # one action — the 6-stage plan runs once
    print(f"corpus {n0} -> lm gate {n1} -> span screen {n2} -> capped {n3}")
    for r in rows:
        print(
            f"  {r['split']:<5} docs={r['docs']:<4} tokens={r['tokens']:<7} "
            f"pack_eff={r['pack_eff']}"
        )
    splits = {r["split"] for r in rows}
    assert splits <= {"train", "val", "test"} and "train" in splits
    print("OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
