"""Text-analysis operators for document pipelines.

All expression-level (split/filter/aggregate on the token array — no
UDFs), so they run inside whole-stage codegen and scale linearly with
partition count:

- token counting (whitespace tokens + a BPE-ish subword regex count)
- quality scoring (length / punctuation / stopword ratios)
- language-ID (stopword-hit heuristic over per-language marker lists)
- document fingerprinting (md5 head/tail/length canonical fingerprint)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it"),
    "fr": ("le", "la", "les", "et", "de", "un", "une", "est"),
    "es": ("el", "la", "los", "y", "de", "un", "una", "es"),
    "de": ("der", "die", "das", "und", "ein", "ist", "zu", "den"),
}

#: crude BPE-ish subword splitter: letter runs, digit runs, single symbols
SUBWORD_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def tokens(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def subword_count(text: Column) -> Column:
    """Count of BPE-ish subword units (regexp_extract_all length)."""
    return F.size(F.regexp_extract_all(text, F.lit(SUBWORD_RE), 0))


def stopword_hits(text: Column, lang: str = "en") -> Column:
    words = STOPWORDS[lang]
    return F.size(F.filter(tokens(text), lambda t: t.isin(*words)))


def punct_count(text: Column) -> Column:
    return F.length(text) - F.length(F.regexp_replace(text, r"[.,;:!?'\"()-]", ""))


def quality_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document quality features + a simple keep/drop flag.

    Ratios are int/int divisions (exact given same ints) rounded at a
    fixed precision, so the output is engine-portable. Heavy string work
    (token split, stopword filter, regex strips) is computed ONCE in a
    staged projection and reused — higher-order functions are interpreted
    (not codegen'd), so duplicated subtrees are real per-row cost.
    """
    t = F.col(text_col)
    staged = df.select(
        F.col(id_col),
        F.length(t).alias("n_chars_text"),
        token_count(t).alias("n_tokens"),
        F.length(F.regexp_replace(t, r"\s", "")).alias("n_nonspace"),
        stopword_hits(t, "en").alias("stop_hits"),
        punct_count(t).alias("n_punct"),
    )
    # try_divide: empty/NULL documents yield NULL ratios instead of an
    # ANSI DIVIDE_BY_ZERO crash killing the whole stage
    return staged.select(
        id_col,
        "n_chars_text",
        "n_tokens",
        F.round(F.try_divide(F.col("n_nonspace") * 1.0, F.col("n_tokens")), 6).alias("avg_token_len"),
        F.round(F.try_divide(F.col("stop_hits") * 1.0, F.col("n_tokens")), 6).alias("stopword_ratio"),
        F.round(F.try_divide(F.col("n_punct") * 1.0, F.col("n_chars_text")), 6).alias("punct_ratio"),
        (
            (F.col("n_tokens") >= 10)
            & (F.col("n_tokens") <= 100_000)
            & (F.col("stop_hits") * 20 >= F.col("n_tokens"))  # ratio >= 0.05
        ).alias("quality_keep"),
    )


def langid(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-hit language ID: argmax of per-language marker hits, ties
    and zero-evidence → 'und'. Deterministic CASE cascade ordered by
    (hits desc, lang asc)."""
    t = F.col(text_col)
    hits = {lang: stopword_hits(t, lang) for lang in STOPWORDS}
    out = df.select(
        F.col(id_col), *[h.alias(f"hits_{lang}") for lang, h in hits.items()]
    )
    langs = sorted(STOPWORDS)
    best = None
    for lang in langs:
        c = F.col(f"hits_{lang}")
        cond = (c > 0)
        for other in langs:
            if other == lang:
                continue
            o = F.col(f"hits_{other}")
            # strictly greater than later-alphabet langs, >= earlier ones
            cond = cond & (c >= o if lang < other else c > o)
        best = F.when(cond, F.lit(lang)) if best is None else best.when(cond, F.lit(lang))
    return out.withColumn("predicted_lang", best.otherwise(F.lit("und")))


#: PII patterns — simple character-class regexes that parse identically
#: under Java regex (Spark) and DuckDB's RE2 dialect.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
LONG_NUMBER_RE = r"[0-9]{9,}"


def pii_scrub(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Mask emails and long digit runs (phone/account-shaped) before a
    corpus feeds training: ``<EMAIL>`` / ``<NUM>`` placeholders, plus
    per-document match counts for audit. Expression-only
    (regexp_replace / regexp_extract_all), linear, codegen'd.
    """
    t = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0))
    scrubbed = F.regexp_replace(
        F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), LONG_NUMBER_RE, "<NUM>"
    )
    # count numbers AFTER email masking: an email's digit run must not
    # double-count (the replacement order fixes the semantics)
    n_numbers = F.size(
        F.regexp_extract_all(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), F.lit(LONG_NUMBER_RE), 0
        )
    )
    return df.select(
        F.col(id_col),
        scrubbed.alias("scrubbed_text"),
        n_emails.alias("n_emails"),
        n_numbers.alias("n_numbers"),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    capacity: int,
    n_shards: int = 8,
) -> DataFrame:
    """Concat-and-chunk sequence packing (GPT-pretraining style): within
    each shard, documents are laid out contiguously in id order and the
    stream is chunked every ``capacity`` tokens; each document reports
    the chunk (``local_bin``) and ``offset`` where it STARTS — long or
    straddling documents simply span into following chunks, no padding
    waste. Sharding by ``id % n_shards`` keeps the order-defining window
    partitioned (no global single-partition sort — raise n_shards with
    the cluster; one sequential stream per shard is the semantics, not a
    bottleneck).

    Output: (id, shard, local_bin, offset, n_tokens).
    """
    from pyspark.sql import Window

    shard = (F.col(id_col) % n_shards).alias("shard")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    staged = df.select(F.col(id_col), shard, F.col(token_count_col).alias("_n"))
    cum_excl = F.sum("_n").over(w) - F.col("_n")
    local_bin = F.floor(cum_excl / capacity).cast("bigint")
    offset = (cum_excl - local_bin * capacity).cast("bigint")
    return staged.select(
        id_col,
        "shard",
        local_bin.alias("local_bin"),
        offset.alias("offset"),
        F.col("_n").alias("n_tokens"),
    )


def repetition_features(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_tok_ratio: float = 0.2,
    max_dup_trigram_ratio: float = 0.3,
    repartition_to: int | None = None,
) -> DataFrame:
    """Gopher/C4-style repetition quality signals: the fraction of tokens
    taken by the single most frequent token, and the fraction of word
    trigrams that are duplicates — boilerplate and looped generations
    score high on both. Ratios are int/int at fixed rounding (portable);
    the keep flag applies the standard thresholds.

    Two bounded shuffles: explode→count→max for the token mode (keys are
    (doc, token), uniform), and none for the trigram ratio (array_distinct
    is per-row). The token ARRAY is staged in its own projection first —
    higher-order lambdas are interpreted with no common-subexpression
    elimination, so referencing the raw split() inside them would
    re-split the text once per element. No shuffle is inserted by
    default — the projection is per-row correct under any input
    partitioning; pass ``repartition_to`` only when the source arrives
    in a few fat partitions (e.g. one giant file) and the CPU-bound
    trigram work needs spreading.
    """
    src = df if repartition_to is None else df.repartition(repartition_to)
    arr = src.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    )
    toks = F.col("_toks")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 3),
        lambda i: F.concat_ws(
            " ",
            F.element_at(toks, i + 1),
            F.element_at(toks, i + 2),
            F.element_at(toks, i + 3),
        ),
    )
    staged = arr.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.when(F.size(toks) >= 3, F.size(toks) - 2).otherwise(0).alias("n_tri"),
        F.when(F.size(toks) >= 3, F.size(F.array_distinct(grams)))
        .otherwise(0)
        .alias("n_tri_distinct"),
    )
    top = (
        arr.select(F.col(id_col), F.explode(toks).alias("_tok"))
        .groupBy(id_col, "_tok")
        .agg(F.count("*").alias("_n"))
        .groupBy(id_col)
        .agg(F.max("_n").alias("top_tok_n"))
    )
    out = staged.join(top, id_col, "left").select(
        id_col,
        "n_tokens",
        F.coalesce("top_tok_n", F.lit(0)).alias("top_tok_n"),
        F.round(
            F.try_divide(F.coalesce("top_tok_n", F.lit(0)) * 1.0, F.col("n_tokens")), 6
        ).alias("top_tok_ratio"),
        F.round(
            F.try_divide(
                (F.col("n_tri") - F.col("n_tri_distinct")) * 1.0, F.col("n_tri")
            ),
            6,
        ).alias("dup_trigram_ratio"),
    )
    keep = (
        (F.coalesce(F.col("top_tok_ratio"), F.lit(0.0)) <= max_tok_ratio)
        & (F.coalesce(F.col("dup_trigram_ratio"), F.lit(0.0))
           <= max_dup_trigram_ratio)
    )
    return out.withColumn("repetition_keep", keep)


def fingerprint(df: DataFrame, id_col: str, text_col: str, window: int = 64) -> DataFrame:
    """Canonical document fingerprint: md5 over (length | head | tail).

    Cheap (no tokenization), collision-resistant for exact and
    head/tail-stable content; the rolling-hash shingle variant is
    dedup_approx.word_shingles + minhash.
    """
    t = F.col(text_col)
    tail_start = F.greatest(F.length(t) - (window - 1), F.lit(1))
    fp = F.md5(
        F.concat_ws(
            "|",
            F.length(t).cast("string"),
            F.substring(t, 1, window),
            t.substr(tail_start, F.lit(window)),
        )
    )
    return df.select(F.col(id_col), fp.alias("fingerprint"))
