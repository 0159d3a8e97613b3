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
    the report is the auditable artifact; filter on ``keep`` to export.

    The quality gate's stopword list follows ``keep_langs[0]`` — a gate
    testing English stopwords against a corpus curated for another
    language would fail virtually every document (review r7)."""
    # each signal frame is COLLAPSED to one row per id before joining
    # (review r11): the analysis operators are row-wise, so k docs
    # sharing an id (NULL or duplicated) produced k rows per frame and
    # the three null-safe joins cross-multiplied to k^4 report rows.
    # The collapse is false-biased (min: any failing copy fails the
    # id) and deterministic (min predicted_lang), making the r9
    # "collapse into one report row per NULL/duplicate id" contract
    # actually true.
    lang = (
        text.langid(df, id_col, text_col)
        .groupBy(id_col)
        .agg(F.min("predicted_lang").alias("predicted_lang"))
    )
    qual = (
        text.quality_features(df, id_col, text_col, lang=keep_langs[0])
        .groupBy(id_col)
        .agg(F.min("quality_keep").alias("quality_keep"))
    )
    rep = (
        text.repetition_features(df, id_col, text_col)
        .groupBy(id_col)
        .agg(F.min("repetition_keep").alias("repetition_keep"))
    )
    h = row_hash_col([text_col])  # the SAME canonical rule exact_dedup uses
    dedup = (
        df.select(
            F.col(id_col),
            (
                F.col(id_col) == F.min(id_col).over(Window.partitionBy(h))
            ).alias("dedup_keep"),
        )
        .groupBy(id_col)
        .agg(F.min("dedup_keep").alias("dedup_keep"))
    )
    # null-safe joins (review r9): a NULL doc id broke the plain
    # equality joins and silently dropped the row from the report,
    # contradicting the 'never dropped here' contract.
    def _nsj(a: DataFrame, b: DataFrame) -> DataFrame:
        bb = b.withColumnRenamed(id_col, "_rhs_id")
        return a.join(
            bb, F.col(id_col).eqNullSafe(F.col("_rhs_id"))
        ).drop("_rhs_id")

    out = _nsj(_nsj(_nsj(lang, qual), rep), dedup).withColumn(
        "lang_keep", F.col("predicted_lang").isin(*keep_langs)
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


def url_host(url) -> "F.Column":
    """Host component of a URL — regexp form rather than parse_url so the
    DuckDB oracle evaluates the identical expression chain.

    Hostile-URL hardening (review r7): lowercase FIRST (an uppercase
    scheme or host must not dodge a lowercase blocklist), take the whole
    authority (userinfo may contain ':'), strip userinfo up to the LAST
    '@' (browsers parse 'http://blocked.com@evil.com/' as host
    evil.com — extracting blocked.com@evil.com would never match a
    pattern suffix), then strip the port."""
    auth = F.regexp_extract(
        F.lower(url), r"^[a-z][a-z0-9+.-]*://([^/?#]*)", 1
    )
    return F.regexp_replace(
        F.regexp_replace(auth, "^.*@", ""), ":.*$", ""
    )


def host_suffixes(host) -> "F.Column":
    """All dot-suffixes of a hostname: 'a.b.c' → ['a.b.c', 'b.c', 'c'].

    The standard normalization for domain-blocklist matching (a pattern
    'b.c' must block 'a.b.c' but NOT 'xb.c' — substring/LIKE matching
    gets that wrong; suffix-on-label-boundary is exact).
    """
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(parts, i, n - i + 1), "."),
    )


def domain_blocklist(
    df: DataFrame,
    id_col: str,
    url_col: str,
    patterns,
) -> DataFrame:
    """Flag rows whose URL host matches a blocked domain (exact host or
    any parent domain) — the URL-filtering stage every web-corpus
    pipeline runs (C4 dropped blocklisted domains; RefinedWeb the same).

    Output: input rows + (host, blocked). ``patterns`` is either a small
    Python list (curated blocklists are thousands of entries — compiled
    to an expression-level ``arrays_overlap`` against a literal array:
    zero shuffle, whole-stage codegen) or a DataFrame with a ``pattern``
    column for big lists (exploded suffix equi-join against the
    BROADCAST pattern set, then a distinct-id semi flag — still no
    corpus shuffle beyond the flag join).
    """
    # loud failure on reserved output/internal names (the
    # weighted_reservoir rule — review r9: a caller's existing
    # 'blocked' column was silently overwritten)
    clash = {"host", "blocked", "_bid", "_suffix"} & set(df.columns)
    if clash:
        raise ValueError(
            f"domain_blocklist writes columns {sorted(clash)} — rename "
            "them on the input first"
        )
    host = url_host(F.col(url_col))
    suf = host_suffixes(host)
    if isinstance(patterns, DataFrame):
        # patterns lowercased to match the lowercased host (review r9:
        # a mixed-case blocklist entry silently never matched — the
        # same dodge the host-side lowering exists to prevent)
        ids_blocked = (
            df.select(
                F.col(id_col), F.explode(host_suffixes(url_host(F.col(url_col)))).alias("_suffix")
            )
            .join(
                F.broadcast(
                    patterns.select(
                        F.lower(F.col("pattern")).alias("_suffix")
                    )
                ),
                "_suffix",
            )
            .select(F.col(id_col).alias("_bid"))
            .distinct()
        )
        return (
            df.withColumn("host", host)
            # eqNullSafe (review r11): a NULL-id doc with a blocklisted
            # URL matched nothing under plain equality and sailed
            # through as blocked=false
            .join(
                ids_blocked.withColumn("_blk", F.lit(True)),
                F.col(id_col).eqNullSafe(F.col("_bid")),
                "left",
            )
            # explicit match flag (review r11): for a NULL-id match the
            # joined _bid is itself NULL, so isNotNull() read a real
            # match as "no match"
            .withColumn("blocked", F.coalesce(F.col("_blk"), F.lit(False)))
            .drop("_bid", "_blk")
        )
    lit_patterns = F.array(*[F.lit(str(p).lower()) for p in patterns])
    # coalesce (review r11): a NULL url yielded blocked=NULL here but
    # blocked=false in the DataFrame branch — the row vanished from
    # BOTH where(blocked) and where(~blocked); the two representations
    # now agree that an un-parseable URL is not blocked
    return df.withColumn("host", host).withColumn(
        "blocked", F.coalesce(F.arrays_overlap(suf, lit_patterns), F.lit(False))
    )


def domain_cap(
    df: DataFrame,
    domain_col: str,
    order_by: list,
    n_keep: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``n_keep`` documents per domain, best-first.

    Standard web-corpus balancing (C4/RefinedWeb style per-host caps):
    over-represented domains would otherwise dominate the training
    mixture. ``order_by`` ranks within the domain (e.g. quality desc)
    and MUST end in a unique tiebreak for determinism — ``id_col`` is
    appended as that tiebreak automatically.

    Scale: one hash-partitioned window on the domain key. row_number
    (not rank) guarantees the cap exactly; a mega-domain is one
    partition's worth of rows, bounded further upstream by blocklists —
    for pathological hosts, pre-filter with a groupBy count and
    sample-limit those keys before windowing.
    """
    if "_rk" in df.columns:
        # loud failure, not silent column loss (review r11: the r8/r9
        # reserved-name rule, already enforced in weighted_reservoir)
        raise ValueError("domain_cap reserves the column name '_rk'")
    w = Window.partitionBy(domain_col).orderBy(*order_by, F.col(id_col))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= n_keep)
        .drop("_rk")
    )


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    val_pct: int = 10,
    test_pct: int = 10,
) -> DataFrame:
    """Train/val/test split that never separates near-duplicates.

    A plain per-document hash split leaks: a near-duplicate pair lands
    in train AND test, inflating eval. Here every connected component of
    the ``pairs`` graph (id_a/id_b near-dup edges) is resolved to its
    canonical min-id (operators.dedup_approx.dedup_groups), and the
    split bucket is hashed from the CANONICAL id, so whole components
    co-travel; singletons hash on their own id. The 100-bucket md5
    split is its own scheme (deterministic, SQL-replayable) — bucket
    boundaries do NOT line up with operators.sampling.hash_split
    (different bucket count, no salt), so migrating between the two
    reassigns membership; pick one scheme per dataset and keep it.

    Returns ``(id_col, split)`` with split ∈ {'train','val','test'}.
    """
    from .dedup_approx import dedup_groups

    groups = dedup_groups(pairs)  # (node, canonical_id)
    canon = (
        df.select(F.col(id_col))
        .distinct()
        .join(groups.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("canonical_id"), F.col(id_col)).alias("_canon"),
        )
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("_canon").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 100
    )
    return canon.select(
        F.col(id_col),
        F.when(bucket < test_pct, F.lit("test"))
        .when(bucket < test_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )
