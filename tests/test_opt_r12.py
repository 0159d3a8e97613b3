"""Round-12 optimization pins: fused single-pass model builds for
dsir_weights (importance.py) and bigram_lm_scores (lm.py).

Each pin asserts VALUE parity between the fused path and the
per-table recipe it replaced, plus the plan property the optimization
exists for (corpus scan count)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from datawarehouse_backup_system_spark.operators import importance, lm


def _plan_simple(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain()  # simple mode: each node printed once
    return buf.getvalue()


def test_logratio_flagged_matches_from_buckets(spark):
    """_bucket_logratio_from_flagged must equal the two-frame
    recipe exactly (same integer counts → same double arithmetic),
    including buckets with zero target rows and absent buckets."""
    rows = [(i % 5, i % 3 == 0) for i in range(40)] + [(7, False)] * 4
    flagged = spark.createDataFrame(rows, "bucket long, _is_tgt boolean")
    n, alpha = 11, 1.0
    fused = {
        r["bucket"]: r["logratio"]
        for r in importance._bucket_logratio_from_flagged(
            flagged, n, alpha
        ).collect()
    }
    two = {
        r["bucket"]: r["logratio"]
        for r in importance._bucket_logratio_from_buckets(
            flagged.select("bucket"),
            flagged.where(F.col("_is_tgt")).select("bucket"),
            n,
            alpha,
        ).collect()
    }
    assert set(fused) == set(two) == set(range(n))
    assert fused == two  # exact doubles, not approx


def test_logratio_flagged_empty_target(spark):
    """All-source / zero-target input still yields the smoothed table."""
    flagged = spark.createDataFrame(
        [(0, False), (1, False)], "bucket long, _is_tgt boolean"
    )
    out = importance._bucket_logratio_from_flagged(flagged, 4, 1.0)
    rows = out.collect()
    assert len(rows) == 4
    assert all(r["logratio"] is not None for r in rows)


def test_dsir_plan_scans_corpus_at_most_three_times(spark, sf_dir):
    """The r12 fusion: stage=False dsir plans ≤3 corpus scans (counts,
    scoring, id universe) — the pre-fix shape planned 6 (two per-side
    count aggs, each consumed twice by the totals/select split)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = importance.dsir_weights(
        docs, "doc_id", "text", target_pred=F.col("lang") == "en",
        n_buckets=8, stage=False,
    )
    plan = _plan_simple(out)
    assert plan.count("Scan parquet") <= 3, plan


def test_bigram_fused_counts_match_per_table(spark):
    """The fused (kind, bucket) aggregation must reproduce the exact
    per-table counts of the bigram_model recipe."""
    df = spark.createDataFrame(
        [(1, "a b c a b"), (2, "a b"), (3, "x"), (4, None), (5, " \t ")],
        "id int, text string",
    )
    pb, cb = 16, 8
    out = lm.bigram_lm_scores(df, "id", "text", pair_buckets=pb,
                              ctx_buckets=cb, stage=False)
    got = {r["id"]: r for r in out.collect()}
    # reference: the public two-agg model + shared scoring tail
    model = lm.bigram_model(df, "id", "text", pair_buckets=pb,
                            ctx_buckets=cb)
    ref = {
        r["id"]: r
        for r in lm.score_with_model(
            df, "id", "text", model, pair_buckets=pb, ctx_buckets=cb
        ).collect()
    }
    assert set(got) == set(ref) == {1, 2, 3, 4, 5}
    for i in got:
        assert got[i]["n_bigrams"] == ref[i]["n_bigrams"]
        assert got[i]["sum_logp"] == ref[i]["sum_logp"]
        assert got[i]["avg_logp"] == ref[i]["avg_logp"]
    lm.release_staged()


def test_bigram_staged_slot_counts(spark):
    """stage=False slots ONLY the bounded fused-count frame;
    stage=True additionally slots the corpus-sized rows."""
    df = spark.createDataFrame([(1, "a b c")], "id int, text string")
    lm.bigram_lm_scores(df, "id", "text", stage=False).count()
    assert len(lm._LIVE_STAGED) == 1
    lm.bigram_lm_scores(df, "id", "text", stage=True).count()
    assert len(lm._LIVE_STAGED) == 2
    lm.release_staged()
    assert lm._LIVE_STAGED == []
