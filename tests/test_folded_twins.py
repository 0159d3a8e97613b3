"""r7 spec consolidation (COVERAGE.md plan): zero-capability-loss guard.

Each of the 17 folded twins was a near-duplicate of a surviving spec; its
QuerySpec moved from ``SPECS`` to ``FOLDED_SPECS`` in its module. This file
re-runs the EXACT comparison the driver's correctness gate performed —
Spark result vs DuckDB oracle, row count + column set + order-insensitive
values via tools/check_oracle.compare — for every folded twin at the smoke
sf, so a regression in a folded operator still fails CI within seconds.

The targeted tests below pin the edge semantics that the smoke data might
not exercise (the "twin's distinguishing assertion" column of the
COVERAGE.md fold table): top-k tiebreaks, the sessionization gap boundary,
and sliding->tumbling degeneration at stride==width.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from check_oracle import compare  # noqa: E402 — driver-identical comparison

from datawarehouse_backup_system_spark.queries import (  # noqa: E402
    analytics_ext,
    curation_ext,
    extras,
    llm_ops,
    pipeline_ext,
    relational,
    relational_ext,
    scale_ext,
)
from datawarehouse_backup_system_spark.queries.base import TABLES  # noqa: E402

FOLDED = [
    s
    for mod in (relational, relational_ext, llm_ops, curation_ext, extras,
                pipeline_ext, analytics_ext, scale_ext)
    for s in mod.FOLDED_SPECS
]


def test_fold_inventory_matches_coverage_plan():
    """The 17 definite + 8 candidate folds from COVERAGE.md, no more, no
    fewer — a fold that silently drops a twin from FOLDED_SPECS would
    orphan its evidence."""
    assert sorted(s.name for s in FOLDED) == sorted([
        "q02_scan_filter_project", "q13_topk_orders", "q16_running_total",
        "q17_sessionize", "q19_tumbling_window", "q21_cardinality_profile",
        "t13_vocab_topk", "t28_ngram_diversity", "t29_padding_waste",
        "r01_recall_bucketed", "r05_recall_quantized", "e04_pq_codes",
        "m01_png_dims", "m02_wav_headers", "h01_binned_quantiles",
        "u01_scd2_versions", "a03_topn_per_group",
        # candidate batch (evaluated + executed r7)
        "q26_pivot_status", "q38_stratified_sample", "d06_similarity_topk",
        "t11_line_dedup", "t16_quantile_filter", "b02_user_sequences",
        "w01_weighted_sample", "z02_skipping_report",
    ])


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


@pytest.mark.parametrize("spec", FOLDED, ids=[s.name for s in FOLDED])
def test_folded_twin_matches_oracle(spark, sf_dir, oracle_con, spec):
    sdf = spec.spark_fn(spark, sf_dir).toPandas()
    ddf = oracle_con.execute(spec.oracle).fetchdf()
    exact, _close, msg = compare(sdf, ddf)
    assert exact, f"{spec.name}: {msg}"


# ---------------------------------------------------------------------------
# targeted edge semantics the smoke data may not exercise
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def synth_events_dir(spark, tmp_path_factory):
    """Tiny events table with crafted timestamps: duplicate sort keys
    (tiebreak), a gap of EXACTLY 30 minutes and one of 30min+1s
    (session boundary), all inside two adjacent 10-minute buckets."""
    root = tmp_path_factory.mktemp("folded-synth")
    rows = [
        # user A: t0, t0+exactly 30min, then +30min+1s
        (1, "A", "2024-01-01 00:00:00", 10.0, "view"),
        (2, "A", "2024-01-01 00:30:00", 20.0, "view"),
        (3, "A", "2024-01-01 01:00:01", 40.0, "click"),
        # user B: duplicate value for the tiebreak check
        (4, "B", "2024-01-01 00:05:00", 20.0, "view"),
        (5, "B", "2024-01-01 00:05:00", 20.0, "view"),
    ]
    df = spark.createDataFrame(
        [(i, u, t, v, e) for i, u, t, v, e in rows],
        "event_id bigint, user_id string, ts_s string, value double, "
        "event_type string",
    ).selectExpr(
        "event_id", "user_id", "CAST(ts_s AS TIMESTAMP) AS ts", "value",
        "event_type",
    )
    df.coalesce(1).write.parquet(str(root / "events.parquet"))
    return str(root)


def test_q17_gap_boundary_exactly_30min_same_session(spark, synth_events_dir):
    """The twin's lag-gap rule is STRICT (> 30 min starts a session):
    an exactly-30-minute gap continues the session; +1 s splits it."""
    rows = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in relational.q17_sessionize(spark, synth_events_dir).collect()
    }
    assert rows["A"] == (2, 3)  # 30:00 merged, 30:01 split
    assert rows["B"] == (1, 2)


def test_q13_topk_tiebreak_is_deterministic(spark):
    """Twin q13's distinguishing property: ties on the sort value break
    by ascending key, so the limit-k set is stable across shuffles."""
    df = spark.createDataFrame(
        [(k, 100.0) for k in (5, 3, 9, 1, 7)] + [(2, 200.0)],
        "o_orderkey bigint, o_totalprice double",
    ).repartition(8)
    from pyspark.sql import functions as F

    got = [
        r["o_orderkey"]
        for r in df.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(4)
        .collect()
    ]
    assert got == [2, 1, 3, 5]


def test_q16_running_total_cumulative_frame(spark, synth_events_dir):
    """Twin q16's frame is rows-unbounded-preceding..current: the last
    row per key carries the exact integer-cent total of the key."""
    out = {
        (r["user_id"], r["event_id"]): r["running_cents"]
        for r in relational.q16_running_total(
            spark, synth_events_dir
        ).collect()
    }
    assert out[("A", 1)] == 1000
    assert out[("A", 2)] == 3000
    assert out[("A", 3)] == 7000          # full cumulative sum
    assert out[("B", 5)] == 4000


def test_q19_sliding_degenerates_to_tumbling_at_stride_eq_width(
    spark, synth_events_dir
):
    """Fold q19->q20: F.window(w, w) must equal F.window(w) bucket-for-
    bucket — the tumbling spec is the stride==width point of the
    sliding one."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{synth_events_dir}/events.parquet")
    tumb = {
        (r["b"], r["n"])
        for r in ev.groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.unix_timestamp("w.start").alias("b"), "n")
        .collect()
    }
    slide = {
        (r["b"], r["n"])
        for r in ev.groupBy(
            F.window("ts", "10 minutes", "10 minutes").alias("w")
        )
        .agg(F.count("*").alias("n"))
        .select(F.unix_timestamp("w.start").alias("b"), "n")
        .collect()
    }
    assert tumb == slide and len(tumb) == 3
