"""Full-text search: inverted-index build + Okapi BM25 ranking.

Beyond-reference capability (the reference ETL daemon has no search
surface): gives the document corpus a queryable keyword index — the
operator a curation team reaches for to pull "all docs about X" out of
a 100 TB corpus without a full scan per question.

Spark-first shape, no UDFs anywhere:

- ``build_postings``: one explode + one partially-aggregated
  groupBy(term, doc) — the classic inverted index as a DataFrame. At
  scale this is THE artifact to persist (partitionBy(term) parquet), so
  index build cost is paid once, not per query.
- ``bm25_topk``: the query set is tiny by construction (humans ask a
  handful of questions), so everything query-side is broadcast; the
  corpus-side postings table is touched by exactly ONE broadcast hash
  join (term → per-query idf), then one groupBy(query, doc) partial
  aggregation and one per-query top-k window. No shuffle of the corpus
  keyed on anything but (query_id, doc_id) — and that shuffle carries
  only docs containing at least one query term.

Scoring is standard Okapi BM25 (Robertson/Sparck Jones, public):

    idf(t)  = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
    s(t, d) = idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

Cross-engine FP parity follows the repo-wide decimal-sum rule (see
``operators/lm.py``): each per-term contribution is computed as a
double with the SAME expression shape the DuckDB oracle uses, rounded
to 9 dp, cast to decimal(18,9), and summed exactly — decimal addition
is associative, so partial aggregation order cannot change the result.

Per-query top-k uses a window partitioned by query_id: one task per
query holds only that query's candidate set. For a pathological query
matching most of a 100 TB corpus, swap the window for the two-phase
top-k (per-partition row_number prune → global) used elsewhere in this
repo; at a realistic selectivity the single window is the right plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def build_postings(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Inverted index: (term, doc_id, tf) — single-space tokenization
    (matches the DuckDB oracle's ``string_split(trim(text), ' ')``)."""
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.trim(F.col(text_col)), " ")).alias("term"),
        )
        .where(F.col("term") != "")
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )


def build_positional_postings(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Positional inverted index: (term, doc_id, pos) — one row per token
    OCCURRENCE (0-based position), the artifact phrase search needs.
    posexplode keeps the index build a single linear pass; at scale,
    persist partitioned by term like the tf postings.

    Positions are assigned over the COMPACTED token list (empties
    filtered first): raw-split positions would leave gaps at runs of
    whitespace while the query side compacts its offsets, so a document
    whose text literally equals the phrase would never match
    (review r7; the x02 oracle compacts identically)."""
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), " "), lambda t: t != ""
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(toks).alias("pos", "term"),
    ).select("term", "doc_id", F.col("pos").cast("bigint").alias("pos"))


def phrase_search(
    df: DataFrame,
    id_col: str,
    text_col: str,
    phrases: list[tuple[str, str]],
    ) -> DataFrame:
    """Exact phrase match over the positional index: a document matches
    when every phrase term appears at consecutive positions. Returns
    (query_id, doc_id, n_hits) — n_hits = number of distinct start
    positions where the full phrase occurs.

    Relational shape (the classic positional-postings intersection):
    broadcast the (query, term, offset) rows, join against the
    positional postings on term, align each occurrence to its candidate
    phrase START (pos - offset), then count the starts that collected
    ALL phrase terms. One corpus-side broadcast join, one (query, doc,
    start) aggregation, one (query, doc) aggregation — no self-joins of
    the postings list, so an m-term phrase costs one pass, not m-1
    intersections. Duplicate terms inside a phrase are handled by
    counting required SLOTS (offsets), not distinct terms."""
    spark = df.sparkSession
    postings = build_positional_postings(df, id_col, text_col)

    q_rows = []
    n_terms: dict[str, int] = {}
    for qid, phrase in phrases:
        if qid in n_terms:
            # loud failure (review r9): a duplicate query id silently
            # MERGED both phrases' offset slots — n_terms kept only the
            # last phrase's length, so a doc interleaving terms from
            # the two phrases reported a hit neither phrase has
            raise ValueError(
                f"duplicate query_id {qid!r} in phrases — give each "
                "phrase its own id"
            )
        terms = [t for t in phrase.strip().split(" ") if t]
        n_terms[qid] = len(terms)
        for off, term in enumerate(terms):
            q_rows.append((qid, term, off))
    qdf = spark.createDataFrame(
        q_rows, "query_id string, term string, off long"
    )
    need = spark.createDataFrame(
        [(q, n) for q, n in n_terms.items()], "query_id string, need long"
    )

    starts = (
        postings.join(F.broadcast(qdf), "term")
        .select(
            "query_id",
            "doc_id",
            (F.col("pos") - F.col("off")).alias("start"),
            "off",
        )
        .where(F.col("start") >= 0)
        # a start position matches when every required offset slot is
        # filled; offsets at one (query, doc, start) are distinct by
        # construction (one row per occurrence × offset alignment)
        .groupBy("query_id", "doc_id", "start")
        .agg(F.count(F.lit(1)).alias("slots"))
    )
    return (
        starts.join(F.broadcast(need), "query_id")
        .where(F.col("slots") == F.col("need"))
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"))
    )


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    queries: list[tuple[str, str]],
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 5,
) -> DataFrame:
    """Top-``top_n`` docs per query under BM25. ``queries`` is a small
    list of (query_id, query_text); terms absent from the corpus drop
    out (inner join on the doc-freq table — standard BM25), and a
    duplicated term in one query counts once (distinct query terms).
    Returns (query_id, doc_id, score, rank), score rounded at 6 dp.
    """
    spark = df.sparkSession
    postings = build_postings(df, id_col, text_col)
    doc_len = postings.groupBy("doc_id").agg(
        F.sum("tf").cast("bigint").alias("dl")
    )
    doc_freq = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df_t")
    )
    stats = doc_len.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        (F.sum("dl") * 1.0 / F.count(F.lit(1))).alias("avgdl"),
    )

    # explicit DDL schema so an EMPTY query list returns an empty
    # result instead of 'can not infer schema' (review r9; the
    # phrase_search path already did this)
    qdf = spark.createDataFrame(
        queries, "query_id string, query_text string"
    ).select(
        "query_id",
        F.explode(F.split(F.trim(F.col("query_text")), " ")).alias("term"),
    ).where(F.col("term") != "").distinct()

    # (query, term) -> idf; tiny (|queries| * |terms|) — broadcast it
    # into the postings scan so the corpus side never shuffles on term.
    q_idf = (
        qdf.join(doc_freq, "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "term",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df_t") + F.lit(0.5))
                / (F.col("df_t") + F.lit(0.5))
            ).alias("idf"),
            "avgdl",
        )
    )

    contrib = (
        postings.join(F.broadcast(q_idf), "term")
        .join(doc_len, "doc_id")
        .select(
            "query_id",
            "doc_id",
            F.round(
                F.col("idf")
                * (F.col("tf") * (F.lit(k1) + F.lit(1.0)))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0)
                        - F.lit(b)
                        + F.lit(b) * F.col("dl") / F.col("avgdl")
                    )
                ),
                9,
            )
            .cast("decimal(18,9)")
            .alias("c"),
        )
    )
    scored = contrib.groupBy("query_id", "doc_id").agg(
        F.sum("c").alias("score_dec")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_dec"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_n)
        .select(
            "query_id",
            "doc_id",
            F.round(F.col("score_dec").cast("double"), 6).alias("score"),
            F.col("rank").cast("int").alias("rank"),
        )
    )
