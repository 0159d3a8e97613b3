"""Round-11 extension specs: Cavnar–Trenkle character-n-gram language
identification (t34).

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

Reference analog: none (the daemon has no NLP); extends the §2.6 text
family the way t03/t19 do.
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


SPECS = [
    QuerySpec(
        "t34_langid_ngram", t34_langid_ngram, T34_SQL,
        "Cavnar-Trenkle character-n-gram language ID: broadcast ranked "
        "2/3-gram profiles, integer out-of-place distance, full method "
        "replayed in the oracle including the trained model table",
    ),
]
