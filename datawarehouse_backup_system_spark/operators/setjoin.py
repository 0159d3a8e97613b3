"""Exact set-similarity join via prefix filtering (SSJoin/PPJoin family).

Public-algorithm lineage: Chaudhuri/Ganti/Kaushik's SSJoin primitive and
Xiao et al.'s PPJoin prefix filter. Unlike the MinHash/SimHash paths in
``dedup_approx`` (probabilistic candidate generation — can miss pairs),
prefix filtering is EXACT: order every document's token set by a global
canonical order (ascending document frequency — rarest first), take each
document's first ``n - ceil(t*n) + 1`` tokens as its *prefix*, and any
pair with Jaccard >= t provably shares at least one prefix token. The
candidate join is therefore a plain equi-join on prefix tokens, and the
exact verify pass loses nothing.

Reference parity: the reference's dedup surface is exact row-hash
matching (util/data_processing.py drop_duplicates); this operator is the
set-level generalization a training-data pipeline needs, kept exact so
the DuckDB oracle can replay the FULL quadratic join and require an
identical answer set — which is precisely the exactness theorem, tested.

Scale shape (100 TB): one token-frequency shuffle, one groupBy to build
per-doc ordered arrays, one equi-join on prefix tokens (shuffle keyed by
token — rare tokens keep buckets small; the length filter
``den*min(n) >= num*max(n)`` prunes inside the join), then a per-pair
O(|tokens|) verify with no further shuffle. No cartesian anywhere; the
threshold is a rational ``num/den`` so every filter is integer-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ordered_sets(
    df: DataFrame, id_col: str, text_col: str, shingle_n: int
) -> DataFrame:
    """(id, ordered: array<struct<tok_df,token>>, n) — each document's
    element SET sorted by the global canonical order (ascending
    document frequency, then token: rarest first minimizes prefix-join
    fanout; struct ordering sorts exactly so). Shared by the Jaccard
    and containment joins."""
    if shingle_n > 1:
        from .dedup_approx import word_shingles

        tok = word_shingles(df, id_col, text_col, shingle_n).select(
            F.col(id_col).alias("id"), F.col("shingle").alias("token")
        )
    else:
        from .text import tokens

        from .skew import fan_out_small_scan

        # text.tokens, not an inline split copy: the planned
        # coordinated trim migration (ADVICE r10→r11, documented on
        # tokens()) must reach this consumer too (review r11).
        # fan_out_small_scan: the tokenize+explode is the CPU-heavy
        # pre-shuffle stage (conditional — no-op at corpus scale);
        # the shingle_n>1 branch gets the same via word_shingles.
        tok = (
            fan_out_small_scan(
                df.select(F.col(id_col).alias("id"), F.col(text_col))
            )
            .select(
                "id",
                F.explode(
                    F.array_distinct(tokens(F.col(text_col)))
                ).alias("token"),
            )
            .where(F.col("token") != "")
        )
    docfreq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("tok_df"))
    return (
        tok.join(docfreq, "token")
        .groupBy("id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("tok_df"), F.col("token")))
            ).alias("ordered"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def prefix_jaccard_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold_num: int = 7,
    threshold_den: int = 10,
    shingle_n: int = 1,
    stage_path: str | None = None,
) -> DataFrame:
    """All pairs (id_a < id_b) whose element SETS have Jaccard >=
    threshold_num/threshold_den — exactly (no probabilistic misses).

    Elements are whitespace tokens (``shingle_n=1``) or word n-gram
    shingles (``shingle_n>1``). Shingles are the right element set for
    near-dup detection on corpora with a shared small vocabulary:
    unigram SETS of two unrelated synthetic docs overlap heavily (they
    draw from the same words), while shared 3-gram shingles require
    shared phrasing — fewer candidates, fewer reported pairs, and a
    prefix filter that actually prunes.

    Returns (id_a, id_b, n_inter, n_a, n_b, jaccard) with jaccard
    rounded to 6 decimals for engine-portable hashing; the threshold
    test itself is integer arithmetic, never the rounded float.
    """
    if not (0 < threshold_num <= threshold_den):
        raise ValueError("threshold must be a fraction in (0, 1]")
    num, den = int(threshold_num), int(threshold_den)

    per_doc = _ordered_sets(df, id_col, text_col, shingle_n)
    # prefix length n - ceil(t*n) + 1, integer-exact for rational t
    per_doc = per_doc.withColumn(
        "plen",
        (
            F.col("n")
            - F.floor((F.lit(num) * F.col("n") + F.lit(den - 1)) / F.lit(den))
            + 1
        ).cast("int"),
    )
    # per_doc feeds THREE subtrees (prefix explode + both verify sides)
    # and is deliberately NOT persisted: although it is one row per doc,
    # caching the array<struct> column measured 7.9 s vs 5.4 s recompute
    # at sf0.1 — columnar-cache builds of nested array columns are the
    # same trap as the exploded shingle stream (SCALE.md, Measured
    # lessons). Recompute keeps the docfreq shuffle + array build in
    # codegen; ``stage_path`` (parquet staging, the minhash `stage_path`
    # pattern) also measured SLOWER here (7.6 s vs 5.8 s — nested-array
    # parquet write dominates) and exists only for when the upstream
    # corpus scan itself is the expensive term (remote storage,
    # decompression) or the stage is reused across runs.
    if stage_path is not None:
        per_doc.write.mode("overwrite").parquet(stage_path)
        # explicit schema: an all-empty corpus stages only _SUCCESS and
        # inference would raise instead of yielding zero pairs — the
        # shards.py review-r8 trap (review r11)
        per_doc = df.sparkSession.read.schema(per_doc.schema).parquet(
            stage_path
        )
    pref = per_doc.select(
        "id",
        "n",
        F.explode(F.expr("slice(ordered, 1, plen)")).alias("p"),
    ).select("id", "n", F.col("p.token").alias("token"))

    a, b = pref.alias("a"), pref.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.id") < F.col("b.id"))
            # length filter: Jaccard >= num/den forces den*min >= num*max
            & (
                F.lit(den) * F.least(F.col("a.n"), F.col("b.n"))
                >= F.lit(num) * F.greatest(F.col("a.n"), F.col("b.n"))
            ),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )

    sets = per_doc.select(
        "id",
        F.expr("transform(ordered, x -> x.token)").alias("toks"),
        "n",
    )
    joined = (
        cand.join(
            sets.select(
                F.col("id").alias("id_a"),
                F.col("toks").alias("toks_a"),
                F.col("n").alias("n_a"),
            ),
            "id_a",
        )
        .join(
            sets.select(
                F.col("id").alias("id_b"),
                F.col("toks").alias("toks_b"),
                F.col("n").alias("n_b"),
            ),
            "id_b",
        )
        .withColumn(
            "n_inter", F.size(F.array_intersect("toks_a", "toks_b")).cast("bigint")
        )
    )
    return (
        joined
        # exact threshold: inter/union >= num/den  ⟺  den*inter >= num*union
        .where(
            F.lit(den) * F.col("n_inter")
            >= F.lit(num) * (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        )
        .select(
            "id_a",
            "id_b",
            "n_inter",
            "n_a",
            "n_b",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
    )


def prefix_containment_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold_num: int = 8,
    threshold_den: int = 10,
    shingle_n: int = 1,
) -> DataFrame:
    """All DIRECTIONAL pairs (id_sub ≠ id_super) whose element sets
    satisfy containment |sub ∩ super| / |sub| >= threshold — exactly.

    Containment is the near-SUBSET relation Jaccard misses: a document
    wrapped in boilerplate (header + body + footer around a verbatim
    copy) has low Jaccard against its source when the wrapper is large,
    but containment(source → wrapped) stays ~1. Crawl-dedup pipelines
    use it to collapse template-wrapped republications that resemblance
    thresholds keep. Asymmetric by definition: mutual containment
    yields two rows.

    Prefix filter for containment (SSJoin family, same canonical
    rarest-first order as :func:`prefix_jaccard_join`): if
    |A∩B| >= ceil(t·|A|) then A's first |A| − ceil(t·|A|) + 1 ordered
    tokens provably intersect B — so the candidate join is A's prefix
    tokens against B's FULL token list (the contained side prunes, the
    container side cannot), plus the size filter den·|B| >= num·|A|
    (the intersection can't exceed |B|). All threshold tests are
    integer cross-multiplications; the reported ``containment`` float
    is rounded display only.

    Scale shape: identical to the Jaccard join — one docfreq shuffle,
    one per-doc array build, one token equi-join (prefix side carries
    only each contained doc's RAREST tokens, so common-token inverted
    lists never explode on the probe side), then a per-pair
    array_intersect verify. No cartesian anywhere.

    Reference analog: none (row-hash dedup only); public lineage:
    Chaudhuri/Ganti/Kaushik SSJoin containment variant.
    """
    if not (0 < threshold_num <= threshold_den):
        raise ValueError("threshold must be a fraction in (0, 1]")
    num, den = int(threshold_num), int(threshold_den)
    per_doc = _ordered_sets(df, id_col, text_col, shingle_n)
    # contained-side prefix: n − ceil(t·n) + 1 (integer-exact)
    sub = per_doc.withColumn(
        "plen",
        (
            F.col("n")
            - F.floor((F.lit(num) * F.col("n") + F.lit(den - 1)) / F.lit(den))
            + 1
        ).cast("int"),
    )
    pref = sub.select(
        F.col("id").alias("id_sub"),
        F.col("n").alias("n_sub"),
        F.explode(F.expr("slice(ordered, 1, plen)")).alias("p"),
    ).select("id_sub", "n_sub", F.col("p.token").alias("token"))
    full = per_doc.select(
        F.col("id").alias("id_super"),
        F.col("n").alias("n_super"),
        F.explode(F.expr("transform(ordered, x -> x.token)")).alias("token"),
    )
    cand = (
        pref.join(
            full,
            (pref.token == full.token)
            & (F.col("id_sub") != F.col("id_super"))
            # |A∩B| <= |B|, so containment needs den·|B| >= num·|A|
            & (F.lit(den) * F.col("n_super") >= F.lit(num) * F.col("n_sub")),
        )
        .select("id_sub", "id_super")
        .distinct()
    )
    sets = per_doc.select(
        "id", F.expr("transform(ordered, x -> x.token)").alias("toks")
    )
    joined = (
        cand.join(
            sets.select(
                F.col("id").alias("id_sub"), F.col("toks").alias("toks_sub")
            ),
            "id_sub",
        )
        .join(
            sets.select(
                F.col("id").alias("id_super"),
                F.col("toks").alias("toks_super"),
            ),
            "id_super",
        )
        .select(
            "id_sub",
            "id_super",
            F.size(F.array_intersect("toks_sub", "toks_super"))
            .cast("bigint")
            .alias("n_inter"),
            F.size("toks_sub").cast("bigint").alias("n_sub"),
            F.size("toks_super").cast("bigint").alias("n_super"),
        )
    )
    return (
        joined
        # exact threshold: inter/|sub| >= num/den ⟺ den·inter >= num·|sub|
        .where(F.lit(den) * F.col("n_inter") >= F.lit(num) * F.col("n_sub"))
        .select(
            "id_sub",
            "id_super",
            "n_inter",
            "n_sub",
            "n_super",
            F.round(F.col("n_inter") / F.col("n_sub"), 6).alias("containment"),
        )
    )
