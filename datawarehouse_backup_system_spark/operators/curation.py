"""End-to-end corpus curation: one keep/drop decision per document.

The standard LLM-pretraining filter chain (C4/Gopher/RefinedWeb recipe)
composed from this repo's tested building blocks:

1. **language** — :func:`text.langid` stopword-argmax, keep target langs
2. **quality** — :func:`text.quality_features` length/stopword/punct gates
3. **repetition** — :func:`text.repetition_features` top-token +
   duplicate-trigram boilerplate gates
4. **exact dedup** — canonical = smallest id per content hash (the same
   hash rule as :func:`dedup_approx.exact_dedup`)

Each signal is computed by the SAME operator the individual driver
queries verify, so the pipeline's semantics are pinned by their oracles;
this module only joins the verdicts. All four frames key on the doc id,
so the three joins co-partition after the first shuffle (AQE coalesces);
the dedup flag adds one shuffle on the content hash. At 100 TB you would
persist the staged token array once and fuse the three text passes; the
flag semantics stay identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datawarehouse_backup_system_spark.operators import text
from datawarehouse_backup_system_spark.operators.hashing import row_hash_col


def curation_report(
    df: DataFrame,
    id_col: str,
    text_col: str,
    keep_langs: tuple[str, ...] = ("en",),
) -> DataFrame:
    """Per-document curation verdict: every gate's boolean plus the
    final ``keep`` (AND of all gates). Documents are never dropped here —
    the report is the auditable artifact; filter on ``keep`` to export."""
    lang = text.langid(df, id_col, text_col).select(id_col, "predicted_lang")
    qual = text.quality_features(df, id_col, text_col).select(id_col, "quality_keep")
    rep = text.repetition_features(df, id_col, text_col).select(
        id_col, "repetition_keep"
    )
    h = row_hash_col([text_col])  # the SAME canonical rule exact_dedup uses
    dedup = df.select(
        F.col(id_col),
        (F.col(id_col) == F.min(id_col).over(Window.partitionBy(h))).alias(
            "dedup_keep"
        ),
    )
    out = (
        lang.join(qual, id_col)
        .join(rep, id_col)
        .join(dedup, id_col)
        .withColumn("lang_keep", F.col("predicted_lang").isin(*keep_langs))
    )
    keep = (
        F.col("lang_keep")
        & F.col("quality_keep")
        & F.col("repetition_keep")
        & F.col("dedup_keep")
    )
    return out.select(
        id_col, "predicted_lang", "lang_keep", "quality_keep",
        "repetition_keep", "dedup_keep", keep.alias("keep"),
    )
