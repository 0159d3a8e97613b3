"""Round-11 extension specs: Cavnar–Trenkle character-n-gram language
identification (t34) and short-string fuzzy resolution (f02).

t34 is the production-credible upgrade the r10 verdict asked for
(missing-item 3 / next-round item 5): the stopword-marker heuristic
(t03, `operators/text.langid`) stays as the pinned reference variant,
and `operators/text.langid_ngram` adds the public Cavnar–Trenkle 1994
method — per-language ranked 2/3-gram profiles trained deterministically
at import from seed prose, scored by integer out-of-place distance with
a broadcast model table. The DuckDB oracle replays the ENTIRE method
(normalization, guarded n-gram explosion, (count desc, gram) profile
ranking, the model as an inline VALUES table generated from the same
trained rows, missing-gram penalty, (distance, lang) argmin), so the
spec is EXACT, not tolerance-banded.

f02 makes the round-11 fuzzy_join short-string sentinel block an
oracle-EXERCISED path, not just a replayed one: 3-char codes below the
q-gram lemma bound can only match through the short block, and the
oracle replays the full quadratic distance filter — the exactness
theorem for max_df=None blocking, the d13/d14 oracle pattern.

v02 extends the replica-verification family: `operators/audit.py`'s
fingerprint (v01) answers "do these two copies hold the same data?";
`table_diff` answers the follow-up "show me exactly which rows moved"
with one full-outer null-safe-compare join whose output is
drift-proportional.

Reference analog: none (the daemon has no NLP / fuzzy matching and
verifies loads by row count only); extends the §2.6 text family the
way t03/t19 and f01 do, and the §2 verification surface the way v01
does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import text
from .base import QuerySpec, load


def t34_langid_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return text.langid_ngram(docs, "doc_id", "text")


def _t34_sql() -> str:
    """DuckDB replay of langid_ngram — model inlined from the SAME
    trained rows the Spark side broadcasts."""
    model_rows = text.train_char_ngram_model()
    values = ", ".join(
        f"('{lang}', '{gram}', {rank})" for lang, gram, rank in model_rows
    )
    k = text.CT_TOP_K
    gram_selects = []
    for n in text.CT_NGRAM_SIZES:
        gram_selects.append(
            f"SELECT doc_id, substring(t, i, {n}) AS gram\n"
            f"  FROM (SELECT doc_id, t,\n"
            f"               unnest(generate_series(1, length(t) - {n - 1})) AS i\n"
            f"          FROM norm WHERE length(t) >= {n})"
        )
    grams_sql = "\n  UNION ALL\n".join(gram_selects)
    return f"""
WITH norm AS (
  SELECT doc_id,
         trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g')) AS t
  FROM documents
),
grams AS (
{grams_sql}
),
counts AS (
  SELECT doc_id, gram, count(*) AS c FROM grams GROUP BY doc_id, gram
),
prof AS (
  SELECT doc_id, gram, rank_doc FROM (
    SELECT doc_id, gram,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY c DESC, gram) AS rank_doc
    FROM counts
  ) WHERE rank_doc <= {k}
),
model(lang, gram, rank_model) AS (VALUES {values}),
langs AS (SELECT DISTINCT lang FROM model),
dist AS (
  SELECT p.doc_id, l.lang,
         CAST(sum(coalesce(abs(p.rank_doc - m.rank_model), {k}))
              AS BIGINT) AS oop
  FROM prof p
  CROSS JOIN langs l
  LEFT JOIN model m ON m.lang = l.lang AND m.gram = p.gram
  GROUP BY p.doc_id, l.lang
),
best AS (
  SELECT doc_id, lang, oop,
         row_number() OVER (PARTITION BY doc_id ORDER BY oop, lang) AS rn
  FROM dist
)
SELECT d.doc_id,
       coalesce(b.lang, 'und') AS predicted_lang,
       b.oop AS oop_distance
FROM documents d
LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1
"""


T34_SQL = _t34_sql()


# --------------------------------------------------------------------------
# f02 — fuzzy resolution over SHORT strings: the q-gram lemma hole made
# exercise-able. 3-char codes at gram_n=3/max_distance=1 sit below the
# lemma bound gram_n*(max_distance+1)=6, so every match here flows
# through the r11 sentinel short-block — the regime f01's long customer
# names never touch. The oracle replays the blocking THEOREM (the full
# quadratic distance filter): with max_df=None the blocked join must
# equal it exactly, which is precisely the exact-recall claim the
# sentinel was added to make true.
# --------------------------------------------------------------------------
_F02_N = 400  # short-code population (bounded: the short block is all-pairs)


def f02_fuzzy_short_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..operators.fuzzy import fuzzy_join, resolve_best
    from .base import load as _load

    cust = _load(spark, sf_dir, "customer").where(
        F.col("c_custkey") <= _F02_N
    )
    k = F.col("c_custkey")
    code = F.concat(
        F.char(F.lit(97) + k % 26),
        F.char(F.lit(97) + (k / 26).cast("long") % 26),
        F.char(F.lit(97) + (k / 676).cast("long") % 26),
    )
    clean = cust.select("c_custkey", code.alias("code"))
    # dirty twin: middle char forced to 'q' (distance <= 1 from source)
    dirty = cust.select(
        (k + 1_000_000).alias("dirty_id"),
        F.concat(
            F.substring(code, 1, 1), F.lit("q"), F.substring(code, 3, 1)
        ).alias("dcode"),
    )
    matches = fuzzy_join(
        dirty, clean, "dirty_id", "c_custkey", "dcode", "code",
        gram_n=3, max_df=None, max_distance=1,
    )
    return resolve_best(matches, "dirty_id_l", "c_custkey_r").select(
        F.col("dirty_id_l").alias("dirty_id"),
        F.col("c_custkey_r").alias("matched_custkey"),
        "dist",
    )


F02_SQL = f"""
WITH clean AS (
  SELECT c_custkey,
         chr(CAST(97 + c_custkey % 26 AS INT))
         || chr(CAST(97 + (c_custkey // 26) % 26 AS INT))
         || chr(CAST(97 + (c_custkey // 676) % 26 AS INT)) AS code
  FROM customer WHERE c_custkey <= {_F02_N}
),
dirty AS (
  SELECT c_custkey + 1000000 AS dirty_id,
         substr(code, 1, 1) || 'q' || substr(code, 3, 1) AS dcode
  FROM clean
),
-- the blocking THEOREM: every 3-char pair is in the sentinel short
-- block (len 3 < gram_n*(max_distance+1) = 6) and max_df is NULL, so
-- the blocked join must equal the full quadratic distance filter
matches AS (
  SELECT d.dirty_id, c.c_custkey,
         CAST(levenshtein(d.dcode, c.code) AS INT) AS dist
  FROM dirty d CROSS JOIN clean c
  WHERE levenshtein(d.dcode, c.code) <= 1
)
SELECT dirty_id, matched_custkey, dist FROM (
  SELECT dirty_id, c_custkey AS matched_custkey, dist,
         row_number() OVER (PARTITION BY dirty_id
                            ORDER BY dist, c_custkey) AS rn
  FROM matches
) WHERE rn = 1
"""


# --------------------------------------------------------------------------
# v02 — keyed replica diff: the row-level drill-down behind a v01
# fingerprint mismatch. The right "replica" is the orders table with
# deterministic synthetic drift (rows removed, rows added under a
# collision-safe key offset, single- and multi-column in-place changes),
# so the expected diff is exactly derivable and the oracle replays the
# same full-outer null-safe comparison. Output is drift-proportional —
# the 100 TB shape (never a full dump).
# --------------------------------------------------------------------------
_V02_COMPARE = ["o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]


def v02_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..operators.audit import table_diff

    base = load(spark, sf_dir, "orders").select("o_orderkey", *_V02_COMPARE)
    k = F.col("o_orderkey")
    drifted = (
        base.where(k % 89 != 3)  # dropped rows -> 'removed'
        .withColumn(
            "o_orderstatus",
            F.when((k % 83).isin(11, 13), F.lit("X")).otherwise(
                F.col("o_orderstatus")
            ),
        )
        .withColumn(
            "o_totalprice",
            F.when(
                (k % 83).isin(7, 13), F.col("o_totalprice") + F.lit(1.0)
            ).otherwise(F.col("o_totalprice")),
        )
        .unionByName(  # new keys -> 'added' (offset clears any real key)
            base.where(k % 97 == 5).withColumn(
                "o_orderkey", k + F.lit(100_000_000)
            )
        )
    )
    return table_diff(base, drifted, ["o_orderkey"], _V02_COMPARE)


V02_SQL = """
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         o_orderpriority
  FROM orders
),
drifted AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderkey % 83 IN (11, 13) THEN 'X'
              ELSE o_orderstatus END AS o_orderstatus,
         CASE WHEN o_orderkey % 83 IN (7, 13) THEN o_totalprice + 1.0
              ELSE o_totalprice END AS o_totalprice,
         o_orderpriority
  FROM base WHERE o_orderkey % 89 <> 3
  UNION ALL
  SELECT o_orderkey + 100000000, o_custkey, o_orderstatus, o_totalprice,
         o_orderpriority
  FROM base WHERE o_orderkey % 97 = 5
),
j AS (
  SELECT coalesce(l.o_orderkey, r.o_orderkey) AS o_orderkey,
         l.o_orderkey IS NOT NULL AS in_l,
         r.o_orderkey IS NOT NULL AS in_r,
         l.o_custkey IS DISTINCT FROM r.o_custkey AS d_custkey,
         l.o_orderstatus IS DISTINCT FROM r.o_orderstatus AS d_status,
         l.o_totalprice IS DISTINCT FROM r.o_totalprice AS d_price,
         l.o_orderpriority IS DISTINCT FROM r.o_orderpriority AS d_prio
  FROM base l FULL JOIN drifted r ON l.o_orderkey = r.o_orderkey
)
SELECT o_orderkey, status,
       CASE WHEN status = 'changed' THEN concat_ws(',',
         CASE WHEN d_custkey THEN 'o_custkey' END,
         CASE WHEN d_status THEN 'o_orderstatus' END,
         CASE WHEN d_price THEN 'o_totalprice' END,
         CASE WHEN d_prio THEN 'o_orderpriority' END)
       END AS changed_cols
FROM (
  SELECT o_orderkey,
         CASE WHEN NOT in_l THEN 'added'
              WHEN NOT in_r THEN 'removed'
              WHEN d_custkey OR d_status OR d_price OR d_prio
                THEN 'changed' END AS status,
         d_custkey, d_status, d_price, d_prio
  FROM j
)
WHERE status IS NOT NULL
"""


SPECS = [
    QuerySpec(
        "t34_langid_ngram", t34_langid_ngram, T34_SQL,
        "Cavnar-Trenkle character-n-gram language ID: broadcast ranked "
        "2/3-gram profiles, integer out-of-place distance, full method "
        "replayed in the oracle including the trained model table",
    ),
    QuerySpec(
        "f02_fuzzy_short_resolve", f02_fuzzy_short_resolve, F02_SQL,
        "fuzzy resolution over 3-char codes below the q-gram lemma "
        "bound: every match flows through the sentinel short block; "
        "oracle replays the full quadratic distance filter (exactness "
        "theorem for max_df=None blocking)",
    ),
    QuerySpec(
        "v02_table_diff", v02_table_diff, V02_SQL,
        "keyed replica diff: full-outer null-safe comparison emitting "
        "only drifted rows (added/removed/changed + changed-column "
        "CSV) — the row-level drill-down behind a v01 fingerprint "
        "mismatch",
    ),
]
