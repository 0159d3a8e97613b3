"""Physical-plan contracts: the scale claims in SCALE.md/PLANS.md as
executable assertions. A refactor that silently turns a broadcast into a
cartesian, drops a pushdown, or reintroduces a join node into the as-of
union trick should fail CI, not wait for a benchmark regression.

These pin the PLANNED physical shape at the test scale factor (tiny
inputs, so broadcast thresholds are comfortably met); they are plan
regressions tests, not performance tests.
"""

from __future__ import annotations

import contextlib
import io

import pytest


def fplan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def sf001():
    return "/root/testdata/sf0.001"


def test_q45_broadcasts_and_pushes_brand(spark, sf001):
    from datawarehouse_backup_system_spark.queries.scale_ext import (
        q45_small_qty_revenue,
    )

    p = fplan(q45_small_qty_revenue(spark, sf001))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    # the brand filter must reach the part scan as a pushed filter
    assert "EqualTo(p_brand," in p


def test_q03_range_probe_pushdown(spark, sf001):
    from datawarehouse_backup_system_spark.queries.relational import (
        q03_id_range_probe,
    )

    p = fplan(q03_id_range_probe(spark, sf001))
    assert "GreaterThanOrEqual" in p and "LessThanOrEqual" in p


def test_q02_scan_prunes_columns(spark, sf001):
    from datawarehouse_backup_system_spark.queries.relational import (
        q02_scan_filter_project,
    )

    p = fplan(q02_scan_filter_project(spark, sf001))
    # projection must prune at the scan: the lineitem read schema stays
    # narrow (no l_comment-style wide reads; tax/returnflag unused)
    read = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    assert read and all("l_tax" not in ln for ln in read)


def test_q40_asof_has_no_join_node(spark, sf001):
    from datawarehouse_backup_system_spark.queries.relational_ext import (
        q40_asof_join_generic,
    )

    p = fplan(q40_asof_join_generic(spark, sf001))
    # the union-trick as-of: ONE keyed window, ZERO join operators
    assert "Join" not in p
    assert "Window" in p


def test_d13_prefix_join_no_cartesian(spark, sf001):
    from datawarehouse_backup_system_spark.queries.scale_ext import (
        d13_prefix_jaccard,
    )

    p = fplan(d13_prefix_jaccard(spark, sf001))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_d05_bucketed_neardup_no_bnlj(spark, sf001):
    from datawarehouse_backup_system_spark.queries.llm_ops import (
        d05_embedding_neardup,
    )

    p = fplan(d05_embedding_neardup(spark, sf001))
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_u03_pointintime_no_cartesian(spark, sf001):
    from datawarehouse_backup_system_spark.queries.scale_ext import (
        u03_scd2_pointintime,
    )

    p = fplan(u03_scd2_pointintime(spark, sf001))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_t09_decontaminate_broadcasts_eval_side(spark, sf001):
    from datawarehouse_backup_system_spark.queries.llm_ops import (
        t09_decontaminate,
    )

    p = fplan(t09_decontaminate(spark, sf001))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_q01_aggregate_stays_in_codegen(spark, sf001):
    from datawarehouse_backup_system_spark.queries.relational import (
        q01_pricing_summary,
    )

    p = fplan(q01_pricing_summary(spark, sf001))
    # tree section only (the formatted details repeat every node name)
    tree = p.split("\n\n")[0]
    # flagship aggregate must map-side combine: final HashAggregate over
    # ONE Exchange over a partial HashAggregate fed straight by the scan
    # (formatted plans print top-down: final, Exchange, partial, scan)
    i_final = tree.index("HashAggregate")
    i_ex = tree.index("Exchange", i_final)
    i_part = tree.index("HashAggregate", i_ex)
    assert "Exchange" not in tree[i_part:], "shuffle below the partial agg"
