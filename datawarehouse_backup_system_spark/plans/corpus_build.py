"""End-to-end training-corpus build: the single entry point a
pretraining-data user actually calls, composing the individually
oracle-verified operators into one materialized pipeline:

    raw documents
      → curation gates (language, quality, repetition, exact dedup)
      → near-dup canonicalization (MinHash-LSH → connected components,
        keep each group's canonical representative)
      → temperature resampling (α=0.5 language re-balancing; capped
        integer epochs, md5-fractional draw — fully deterministic)
      → sequence packing plan (concat-and-chunk at fixed capacity)
      → sharded export + manifest + corpus report + table fingerprint

Every stage is the SAME code the driver contract verifies one-by-one
(curation_report ≈ t10, dedup_groups ≈ d09/c01, manifest math ≈ w02,
pack_sequences ≈ t06, export_shards ≈ t08, fingerprint ≈ v01), so the
composition inherits their evidence; the pytest for this module checks
the cross-stage INVARIANTS (gates actually enforced, no two exported
docs share a near-dup group, manifest totals equal written rows, end-to-
end determinism via the fingerprint).

Scale shape: each stage is bounded shuffles over the surviving subset;
nothing here adds a new join/sort pattern beyond the audited operators.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import text
from ..operators.audit import table_fingerprint
from ..operators.curation import curation_report
from ..operators.dedup_approx import dedup_groups, minhash_lsh_dedup
from ..operators.hashing import md5_prefix_long
from ..operators.shards import export_shards


@dataclass(frozen=True)
class CorpusBuildResult:
    out_dir: str
    n_input: int
    n_kept: int          # after gates + near-dup canonicalization
    n_exported: int      # after temperature resampling (copies)
    manifest: list       # per-shard rows (n_shards is small)
    fingerprint: str     # order-insensitive digest of the exported rows


def _temperature_copies(
    kept: DataFrame, id_col: str, lang_col: str, max_epochs: int
) -> DataFrame:
    """Per-doc copy count from α=0.5 language re-balancing (the w02
    integer micro-epoch arithmetic), capped at ``max_epochs`` (standard
    practice: unbounded upsampling of rare languages just memorizes
    them). Returns (id, lang, n_copies >= 0)."""
    # NULL-safe grouping key: an equi-join on the raw lang column would
    # silently drop every NULL-lang doc from the export (review r8);
    # NULLs form their own temperature group instead.
    kk = kept.select(
        id_col,
        lang_col,
        F.coalesce(F.col(lang_col).cast("string"), F.lit("\x00null")).alias(
            "_lk"
        ),
    )
    per = (
        kk.groupBy("_lk")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn(
            "wq",
            F.floor(F.sqrt(F.col("n_docs")) * F.lit(1_000_000)).cast("bigint"),
        )
    )
    tot = per.agg(
        F.sum("wq").alias("wq_total"), F.sum("n_docs").alias("n_total")
    )
    # DECIMAL(38,0) intermediates (the a08 recipe): wq·n_total·10⁶ is
    # ~10¹²·n^1.5, past int64 at ~45 k docs in one language — silently
    # negative non-ANSI, an ArithmeticException under ANSI (review r8).
    # The QUOTIENT is ≤ max_epochs·10⁶, so div's bigint result is safe.
    lang_epochs = per.crossJoin(F.broadcast(tot)).select(
        "_lk",
        F.least(
            F.expr(
                "(CAST(wq AS DECIMAL(38,0)) * n_total * 1000000)"
                " div (CAST(wq_total AS DECIMAL(38,0)) * n_docs)"
            ),
            F.lit(max_epochs * 1_000_000).cast("bigint"),
        ).alias("epochs_micro"),
    )
    u = F.pmod(md5_prefix_long(F.col(id_col).cast("string")), F.lit(1_000_000))
    return kk.join(F.broadcast(lang_epochs), "_lk").select(
        id_col,
        lang_col,
        (
            F.expr("epochs_micro div 1000000")
            + F.when(u < F.col("epochs_micro") % 1_000_000, 1).otherwise(0)
        ).cast("int").alias("n_copies"),
    )


def build_training_corpus(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str | Path,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    keep_langs: tuple[str, ...] = ("en",),
    neardup_threshold: float = 0.5,
    max_epochs: int = 4,
    n_shards: int = 8,
    capacity: int = 2048,
) -> CorpusBuildResult:
    """Materialize a curated, deduplicated, re-balanced, packed, sharded
    training corpus under ``out_dir``. See module docstring."""
    out_dir = Path(out_dir)
    # one pass for input count AND the NULL-id guard: a NULL id would
    # silently vanish at the gate equi-join below (curation_report
    # deliberately keeps it via null-safe joins) and would NULL its
    # seq_id anyway — fail loudly up front instead (review r11), at no
    # extra scan (rides the n_input aggregation).
    _in = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col(id_col).isNull(), 1).otherwise(0)
        ).alias("n_null"),
    ).collect()[0]
    n_input = int(_in["n"])
    if int(_in["n_null"] or 0) > 0:
        raise ValueError(
            f"build_training_corpus: {_in['n_null']} document(s) carry a "
            f"NULL {id_col!r} — seq_id stride packing needs non-null "
            "integral ids; assign ids upstream"
        )

    # 1. per-doc gates (auditable report is also written)
    report = curation_report(docs, id_col, text_col, keep_langs=keep_langs)
    report.write.mode("overwrite").parquet(str(out_dir / "curation_report"))
    gated = docs.join(
        spark.read.parquet(str(out_dir / "curation_report"))
        .where("keep").select(id_col),
        id_col,
    )

    # 2. near-dup canonicalization over the gated survivors
    pairs = minhash_lsh_dedup(
        gated, id_col, text_col, threshold=neardup_threshold,
        max_bucket_size=20,
    ).select("id_a", "id_b")
    groups = dedup_groups(pairs)   # (node, canonical_id); singletons absent
    non_canonical = groups.where(F.col("node") != F.col("canonical_id")).select(
        F.col("node").alias(id_col)
    )
    kept = gated.join(non_canonical, id_col, "left_anti")
    # stage the survivors: this lineage (gates join + MinHash-LSH +
    # iterative dedup_groups) feeds FOUR downstream actions (count,
    # copies agg, packing write, export) and would re-run its most
    # expensive stages for each (review r11). Parquet staging is the
    # repo's standard cut (the d02 stage_path pattern); the count then
    # reads footers, not lineage.
    kept_schema = kept.schema
    kept.write.mode("overwrite").parquet(str(out_dir / "kept"))
    kept = spark.read.schema(kept_schema).parquet(str(out_dir / "kept"))
    n_kept = kept.count()

    # 3. temperature resampling → physical copies with packed ids.
    # seq_id = id*stride + copy needs an integral id (a string id would
    # NULL every key); fail loudly instead of exporting garbage.
    from pyspark.sql import types as T

    id_type = kept.schema[id_col].dataType
    if not isinstance(
        id_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        raise TypeError(
            f"build_training_corpus needs an integral {id_col!r} for "
            f"seq_id stride packing; got {id_type.simpleString()}"
        )
    copies = _temperature_copies(kept, id_col, lang_col, max_epochs)
    stride = max_epochs + 1
    exported = (
        kept.join(copies.select(id_col, "n_copies"), id_col)
        .where(F.col("n_copies") > 0)
        # two selects: the copy index must exist before seq_id derives
        # from it (don't lean on lateral column-alias resolution)
        .select(
            F.col(id_col).alias("source_id"),
            F.col(lang_col),
            F.col(text_col),
            F.explode(F.sequence(F.lit(0), F.col("n_copies") - 1)).alias("_c"),
        )
        .select(
            # bigint arithmetic: an IntegerType id times the stride
            # wraps silently under non-ANSI mode above ~2^31/stride,
            # colliding seq_ids across different source docs
            # (review r11)
            (F.col("source_id").cast("bigint") * stride + F.col("_c"))
            .alias("seq_id"),
            "source_id",
            lang_col,
            text_col,
        )
    )

    # 4. packing plan at fixed context length (token counts = whitespace).
    # The plan MUST use the same shard assignment and within-shard order
    # export_shards writes (md5(salt||seq_id) % n_shards, rows in
    # (md5, seq_id) order) — otherwise (shard, local_bin, offset) are
    # coordinates into a layout no file has (review r8).
    # strict token count: a whitespace-only survivor is 0 tokens, the
    # same accounting export_shards' manifest uses — the plain count
    # reports 1 and would shift every later offset in its shard by a
    # phantom token (review r11)
    with_tokens = exported.withColumn(
        "n_tokens", text.token_count_strict(F.col(text_col))
    )
    from ..operators.shards import shard_id_expr, shard_order_exprs

    packed = text.pack_sequences(
        with_tokens, "seq_id", "n_tokens", capacity, n_shards=n_shards,
        # BOTH halves of the layout contract imported, never copied
        # (review r8 banned the shard-expression fork; review r11 found
        # the order expression still hand-copied)
        shard_expr=shard_id_expr("seq_id", n_shards),
        order_exprs=shard_order_exprs("seq_id"),
    )
    packed.write.mode("overwrite").parquet(str(out_dir / "packing_plan"))

    # 5. sharded export (one file per shard, deterministic order) +
    # manifest FROM the written files
    export_input = with_tokens.select(
        "seq_id", "source_id", lang_col, text_col, "n_tokens"
    )
    manifest_df = export_shards(
        export_input,
        str(out_dir / "shards"), "seq_id", n_shards, text_col=text_col,
    )
    manifest = manifest_df.orderBy("shard_id").collect()  # n_shards rows

    # 6. end-to-end determinism artifact: order-insensitive fingerprint.
    # Explicit schema (the written layout = export input + shard_id),
    # like export_shards' own re-read: a fully-gated-away corpus writes
    # only _SUCCESS and inference would raise AFTER all the expensive
    # work succeeded (review r11).
    from ..operators.shards import shard_assign

    written = spark.read.schema(
        shard_assign(export_input, "seq_id", n_shards).schema
    ).parquet(str(out_dir / "shards"))
    fp = table_fingerprint(
        written, columns=["seq_id", "source_id", text_col]
    ).collect()[0]
    return CorpusBuildResult(
        out_dir=str(out_dir),
        n_input=n_input,
        n_kept=n_kept,
        n_exported=int(sum(r["n_docs"] for r in manifest)),
        manifest=manifest,
        fingerprint=str(fp["fingerprint"]),
    )
