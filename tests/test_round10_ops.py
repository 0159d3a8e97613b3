"""Round-10 operators: duplicated-span removal (t33) and the HyperBall
tolerance spec (g06) — pure-Python simulator parity, the house style."""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def _simulate_remove(docs: dict[int, str], n: int) -> dict[int, tuple]:
    """Brute-force reference: span→holders map on TEXTS (no hashing),
    canonical = min id, token-level coverage, ordered reconstruction."""
    toks = {d: t.strip().split() if t.strip() else [""] for d, t in docs.items()}
    holders: dict[str, set[int]] = {}
    for d, ts in toks.items():
        for i in range(len(ts) - n + 1):
            holders.setdefault(" ".join(ts[i : i + n]), set()).add(d)
    out = {}
    for d, ts in toks.items():
        cut = set()
        for i in range(len(ts) - n + 1):
            span = " ".join(ts[i : i + n])
            hs = holders[span]
            if len(hs) >= 2 and d != min(hs):
                cut.update(range(i, i + n))
        kept = [t for p, t in enumerate(ts) if p not in cut]
        out[d] = (len(ts), len(ts) - len(kept), " ".join(kept))
    return out


def test_remove_dup_spans_matches_simulator(spark):
    from datawarehouse_backup_system_spark.operators.text import (
        remove_dup_spans,
    )

    rng = random.Random(31)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab → real span repeats
    docs = {
        d: " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 40)))
        for d in range(40)
    }
    # plant exact shared blocks so canonical-keeps is exercised
    block = "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10"
    docs[3] = f"{docs[3]} {block}".strip()
    docs[17] = f"{block} {docs[17]}".strip()
    docs[29] = f"pre {block} post".strip()
    df = spark.createDataFrame(list(docs.items()), "doc_id int, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["text_clean"])
        for r in remove_dup_spans(df, "doc_id", "text", n=8).collect()
    }
    assert got == _simulate_remove(docs, 8)


def test_remove_dup_spans_canonical_and_edges(spark):
    """The planted-pair contract: the MIN-id holder keeps its text
    (whitespace-normalized), the other holder loses exactly the span's
    coverage; short/empty docs pass through untouched."""
    from datawarehouse_backup_system_spark.operators.text import (
        remove_dup_spans,
    )

    span = "a b c d e f g h"
    df = spark.createDataFrame(
        [
            (10, f"{span} tail"),
            (20, f"head {span}"),
            (30, "too short"),
            (40, ""),
        ],
        "doc_id int, text string",
    )
    got = {
        r["doc_id"]: (r["n_removed"], r["text_clean"])
        for r in remove_dup_spans(df, "doc_id", "text", n=8).collect()
    }
    assert got[10] == (0, f"{span} tail")  # canonical keeps
    assert got[20] == (8, "head")
    assert got[30] == (0, "too short")
    assert got[40] == (0, "")


def test_g06_saturation_fill_forward(spark):
    """At sf0.001 the quarter-user session graph is tiny: HyperBall
    saturates and early-stops before radius 3 on at least some balls —
    the fill-forward must still make every est_ok TRUE, and exact BFS
    counts must be monotone in radius."""
    from datawarehouse_backup_system_spark.queries.round10_ext import (
        g06_hyperball_neighborhood,
    )

    rows = g06_hyperball_neighborhood(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    assert all(r["est_ok"] for r in rows)
    by_node: dict = {}
    for r in rows:
        by_node.setdefault(r["event_id"], {})[r["radius"]] = r["n_reachable"]
    for node, rad in by_node.items():
        assert sorted(rad) == [0, 1, 2, 3]
        assert rad[0] == 1
        assert rad[0] <= rad[1] <= rad[2] <= rad[3]
