"""weighted_reservoir (A-ES fixed-size weighted sampling) invariants.

The oracle spec (w05) machine-checks Spark-vs-DuckDB; these tests pin
the operator-level guarantees the spec can't see: the exact priority
construction against an independent pure-Python replay, the
merge/re-shard property, two-phase == one-phase, and weight clamping.
"""

from __future__ import annotations

import hashlib

import pytest

from datawarehouse_backup_system_spark.operators.sampling import (
    weighted_reservoir,
)


def _py_priority(key: str, weight: int, cap: int = 16, salt: str = "") -> int:
    """Independent replay of the operator's priority: max over
    j=1..clamp(w) of the 56-bit md5 prefix of salt\\x01key\\x01j."""
    w = max(1, min(int(weight), cap))
    best = -1
    for j in range(1, w + 1):
        digest = hashlib.md5(
            f"{salt}\x01{key}\x01{j}".encode()
        ).hexdigest()
        best = max(best, int(digest[:14], 16))
    return best


def _rows(n: int):
    # weights cycle 0..9 (0 exercises the lower clamp); two groups
    return [
        (i, "even" if i % 2 == 0 else "odd", i % 10) for i in range(n)
    ]


@pytest.fixture(scope="module")
def sample_df(spark):
    return spark.createDataFrame(
        _rows(200), ["doc_id", "grp", "wgt"]
    )


def test_priorities_match_pure_python(spark, sample_df):
    out = weighted_reservoir(
        sample_df, ["grp"], "doc_id", "wgt", k=7
    ).collect()
    assert len(out) == 14  # 7 per group, both groups have >= 7 rows
    for r in out:
        assert r["priority"] == _py_priority(str(r["doc_id"]), r["wgt"])
        assert r["weight_clamped"] == max(1, min(r["wgt"], 16))


def test_topk_is_true_topk(spark, sample_df):
    """The kept rows are exactly the k largest priorities per group
    (tie-broken by key) — i.e. the two-phase plan loses nothing."""
    out = weighted_reservoir(sample_df, ["grp"], "doc_id", "wgt", k=5)
    kept = {
        (r["grp"], r["doc_id"]): r["rank_in_group"] for r in out.collect()
    }
    for grp in ("even", "odd"):
        pris = sorted(
            (
                (-_py_priority(str(i), w), i)
                for i, g, w in _rows(200)
                if g == grp
            ),
        )[:5]
        expect = {i for _, i in pris}
        got = {d for (g, d) in kept if g == grp}
        assert got == expect


def test_two_phase_equals_one_phase(spark, sample_df):
    """presplit=1 (single window) and the default skew-safe presplit
    return identical samples AND identical ranks."""
    a = weighted_reservoir(
        sample_df, ["grp"], "doc_id", "wgt", k=6, presplit=1
    )
    b = weighted_reservoir(
        sample_df, ["grp"], "doc_id", "wgt", k=6, presplit=32
    )
    cols = ["grp", "doc_id", "priority", "rank_in_group"]
    assert sorted(map(tuple, a.select(*cols).collect())) == sorted(
        map(tuple, b.select(*cols).collect())
    )


def test_merge_property(spark):
    """sample(A ∪ B) == top-k(sample(A) ∪ sample(B)): priorities are
    per-row constants, so per-shard samples merge exactly — the
    re-shard/incremental-growth guarantee."""
    rows = _rows(300)
    df = spark.createDataFrame(rows, ["doc_id", "grp", "wgt"])
    shard_a = df.where("doc_id < 150")
    shard_b = df.where("doc_id >= 150")
    k = 8
    whole = weighted_reservoir(df, ["grp"], "doc_id", "wgt", k=k)
    merged = weighted_reservoir(
        weighted_reservoir(shard_a, ["grp"], "doc_id", "wgt", k=k)
        .select("doc_id", "grp", "wgt")
        .unionByName(
            weighted_reservoir(shard_b, ["grp"], "doc_id", "wgt", k=k)
            .select("doc_id", "grp", "wgt")
        ),
        ["grp"],
        "doc_id",
        "wgt",
        k=k,
    )
    cols = ["grp", "doc_id", "priority", "rank_in_group"]
    assert sorted(map(tuple, whole.select(*cols).collect())) == sorted(
        map(tuple, merged.select(*cols).collect())
    )


def test_small_group_returns_all_rows(spark):
    df = spark.createDataFrame(
        [(1, "g", 3), (2, "g", 1)], ["doc_id", "grp", "wgt"]
    )
    out = weighted_reservoir(df, ["grp"], "doc_id", "wgt", k=10).collect()
    assert {r["doc_id"] for r in out} == {1, 2}
    assert sorted(r["rank_in_group"] for r in out) == [1, 2]


def test_weight_cap_and_floor(spark):
    """Weights 0 and 10**9 clamp to 1 and weight_cap; the capped row's
    priority equals the pure-Python max over exactly cap draws."""
    df = spark.createDataFrame(
        [(1, "g", 0), (2, "g", 10**9)], ["doc_id", "grp", "wgt"]
    )
    out = {
        r["doc_id"]: r
        for r in weighted_reservoir(
            df, ["grp"], "doc_id", "wgt", k=2, weight_cap=4
        ).collect()
    }
    assert out[1]["weight_clamped"] == 1
    assert out[2]["weight_clamped"] == 4
    assert out[1]["priority"] == _py_priority("1", 1, cap=4)
    assert out[2]["priority"] == _py_priority("2", 4, cap=4)


def test_invalid_args(spark, sample_df):
    for kwargs in (
        {"k": 0},
        {"k": 3, "weight_cap": 0},
        {"k": 3, "presplit": 0},
    ):
        with pytest.raises(ValueError):
            weighted_reservoir(
                sample_df, ["grp"], "doc_id", "wgt", **kwargs
            )
