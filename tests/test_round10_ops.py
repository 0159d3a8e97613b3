"""Round-10 operators: duplicated-span removal (t33) and the HyperBall
tolerance spec (g06) — pure-Python simulator parity, the house style."""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def _simulate_remove(docs: dict[int, str], n: int) -> dict[int, tuple]:
    """Brute-force reference: span→holders map on TEXTS (no hashing),
    canonical = min id, token-level coverage with canonical protection,
    ordered reconstruction."""
    toks = {d: t.strip().split() if t.strip() else [""] for d, t in docs.items()}
    holders: dict[str, set[int]] = {}
    for d, ts in toks.items():
        for i in range(len(ts) - n + 1):
            holders.setdefault(" ".join(ts[i : i + n]), set()).add(d)
    out = {}
    for d, ts in toks.items():
        cut: set[int] = set()
        protect: set[int] = set()
        for i in range(len(ts) - n + 1):
            span = " ".join(ts[i : i + n])
            hs = holders[span]
            if len(hs) >= 2:
                (protect if d == min(hs) else cut).update(range(i, i + n))
        kept = [t for p, t in enumerate(ts) if p not in cut - protect]
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


def test_remove_dup_spans_canonical_protection(spark):
    """Review r10: overlapping duplicated spans with DIFFERENT canonical
    docs must not destroy every intact copy — the canonical holder's
    occurrence is immune to cuts from overlapping non-canonical spans.
    doc2 is canonical for 'y1 z1..z7' but non-canonical for
    'x1..x7 y1'; its y1 must survive so the corpus keeps one intact
    copy of the z-span."""
    from datawarehouse_backup_system_spark.operators.text import (
        remove_dup_spans,
    )

    doc1 = "x1 x2 x3 x4 x5 x6 x7 y1"
    doc2 = "x1 x2 x3 x4 x5 x6 x7 y1 z1 z2 z3 z4 z5 z6 z7"
    doc3 = "y1 z1 z2 z3 z4 z5 z6 z7"
    df = spark.createDataFrame(
        [(1, doc1), (2, doc2), (3, doc3)], "doc_id int, text string"
    )
    got = {
        r["doc_id"]: (r["n_removed"], r["text_clean"])
        for r in remove_dup_spans(df, "doc_id", "text", n=8).collect()
    }
    assert got[1] == (0, doc1)  # canonical for the x-span
    assert got[2] == (7, "y1 z1 z2 z3 z4 z5 z6 z7")  # x cut, z protected
    assert got[3] == (8, "")  # non-canonical everywhere
    # the intact z-span survives in exactly its canonical holder
    assert "y1 z1 z2 z3 z4 z5 z6 z7" in got[2][1]


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
