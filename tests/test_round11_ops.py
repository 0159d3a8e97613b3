"""Round-11 operator tests: Cavnar–Trenkle character-n-gram langid
(t34) — pure-Python simulator parity, short/empty-doc behavior, and the
documented divergence vs the stopword-marker reference variant."""

from __future__ import annotations

from pyspark.sql import functions as F

from datawarehouse_backup_system_spark.operators import text


def _simulate_langid_ngram(s: str) -> tuple[str, int | None]:
    """Driver-side replay of the full method from the module's own
    pure-Python pieces — the house-style oracle for partitioning- and
    engine-independent semantics."""
    model = text.train_char_ngram_model()
    langs = sorted({lang for lang, _g, _r in model})
    ranks = {(lang, g): r for lang, g, r in model}
    prof = text.char_ngram_profile_py(text.ct_normalize_py(s))
    if not prof:
        return "und", None
    best = None
    for lang in langs:
        oop = sum(
            abs(rd - ranks[(lang, g)])
            if (lang, g) in ranks
            else text.CT_TOP_K
            for g, rd in prof
        )
        if best is None or (oop, lang) < best:
            best = (oop, lang)
    return best[1], best[0]


def test_langid_ngram_matches_simulator_on_mixed_docs(spark):
    docs = [
        (0, "The children are playing in the old house with their dog."),
        (1, "Les enfants jouent dans la vieille maison avec leur chien."),
        (2, "Los ninos juegan en la casa vieja con su perro cada dia."),
        (3, "Die Kinder spielen in dem alten Haus mit ihrem Hund."),
        (4, ""),
        (5, "12345 !!! ???"),  # normalizes to nothing → und
        (6, "zz"),  # one bigram, matches no profile well
        (7, "the of and to in is it " * 3),
        (8, "der die das und ein ist zu den " * 3),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {
        r["doc_id"]: (r["predicted_lang"], r["oop_distance"])
        for r in text.langid_ngram(df, "doc_id", "text").collect()
    }
    for doc_id, s in docs:
        want_lang, want_oop = _simulate_langid_ngram(s)
        assert got[doc_id] == (want_lang, want_oop), (doc_id, s)
    # the natural-language rows actually classify correctly
    assert got[0][0] == "en"
    assert got[1][0] == "fr"
    assert got[2][0] == "es"
    assert got[3][0] == "de"
    assert got[4][0] == "und" and got[4][1] is None
    assert got[5][0] == "und"


def test_langid_ngram_partitioning_invariance(spark):
    """Same answers regardless of input layout (the repartition property
    every distributed operator here pins)."""
    rows = [
        (i, s * (i % 3 + 1))
        for i, s in enumerate(
            ["the house and the dog", "la maison et le chien",
             "das haus und der hund", "la casa y el perro"] * 5
        )
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    a = sorted(
        map(tuple, text.langid_ngram(df, "doc_id", "text").collect())
    )
    b = sorted(
        map(
            tuple,
            text.langid_ngram(
                df.repartition(7, "text"), "doc_id", "text"
            ).collect(),
        )
    )
    assert a == b


def test_langid_marker_vs_ngram_divergence_documented(spark):
    """VERDICT r10 item 5 'done' bar: the two variants DIVERGE on
    adversarial short docs, and the divergence direction is the
    documented one — the marker variant needs a verbatim stopword hit
    (else 'und'), while the n-gram variant always scores SOME language
    for any alphabetic text and survives inflected/misspelled words the
    marker list cannot see."""
    adversarial = [
        # no stopword from any marker list, clearly English character
        # statistics → marker 'und', n-gram 'en'
        (0, "children playing happily near their grandmother's garden"),
        # German compound words, no marker stopword hits
        (1, "Hauptbahnhofsgebaeude Strassenbahnhaltestelle Schwierigkeiten"),
        # one Spanish marker word ('los') inside plainly-English prose:
        # the marker variant over-trusts the verbatim hit; the n-gram
        # statistics see English
        (2, "los angeles residents watched what happened when several "
            "new helicopters landed near their homes last weekend"),
    ]
    df = spark.createDataFrame(adversarial, "doc_id int, text string")
    marker = {
        r["doc_id"]: r["predicted_lang"]
        for r in text.langid(df, "doc_id", "text").collect()
    }
    ngram = {
        r["doc_id"]: r["predicted_lang"]
        for r in text.langid_ngram(df, "doc_id", "text").collect()
    }
    assert marker[0] == "und" and ngram[0] == "en"
    assert marker[1] == "und" and ngram[1] == "de"
    assert marker[2] == "es" and ngram[2] == "en"


def test_ct_model_is_deterministic_and_bounded():
    m1 = text.train_char_ngram_model()
    m2 = text.train_char_ngram_model()
    assert m1 == m2
    langs = {lang for lang, _g, _r in m1}
    assert langs == set(text.CT_SAMPLES)
    for lang in langs:
        ranks = [r for lg, _g, r in m1 if lg == lang]
        assert ranks == list(range(1, len(ranks) + 1))
        assert len(ranks) <= text.CT_TOP_K


# ---------------------------------------------------------------------------
# v02 — keyed replica diff (operators/audit.table_diff)
# ---------------------------------------------------------------------------


def test_table_diff_statuses_and_changed_cols(spark):
    from datawarehouse_backup_system_spark.operators.audit import table_diff

    left = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
        "k bigint, s string, v bigint",
    )
    right = spark.createDataFrame(
        [(1, "a", 10),          # identical -> no output row
         (2, "B", 20),          # one column changed
         (4, "x", 41),          # two columns changed (CSV in col order)
         (5, "e", 50)],         # new key -> added
        "k bigint, s string, v bigint",
    )
    got = {
        r["k"]: (r["status"], r["changed_cols"])
        for r in table_diff(left, right, ["k"]).collect()
    }
    assert got == {
        2: ("changed", "s"),
        3: ("removed", None),
        4: ("changed", "s,v"),
        5: ("added", None),
    }


def test_table_diff_null_safe_comparison(spark):
    from datawarehouse_backup_system_spark.operators.audit import table_diff

    left = spark.createDataFrame(
        [(1, None), (2, "b"), (3, None)], "k bigint, s string"
    )
    right = spark.createDataFrame(
        [(1, None), (2, None), (3, "now")], "k bigint, s string"
    )
    got = {
        r["k"]: (r["status"], r["changed_cols"])
        for r in table_diff(left, right, ["k"]).collect()
    }
    # NULL <=> NULL is equal (k=1 silent); value<->NULL both directions
    # are changes — the exact cases a naive `=` comparison loses
    assert got == {2: ("changed", "s"), 3: ("changed", "s")}


def test_table_diff_default_compare_is_shared_non_key(spark):
    from datawarehouse_backup_system_spark.operators.audit import table_diff

    left = spark.createDataFrame(
        [(1, "a", 99)], "k bigint, s string, only_left bigint"
    )
    right = spark.createDataFrame(
        [(1, "z", 3.5)], "k bigint, s string, only_right double"
    )
    rows = table_diff(left, right, ["k"]).collect()
    # one-sided columns are ignored; only the shared non-key column
    # participates in the comparison
    assert [(r["k"], r["status"], r["changed_cols"]) for r in rows] == [
        (1, "changed", "s")
    ]


def test_table_diff_empty_and_identical_inputs(spark):
    from datawarehouse_backup_system_spark.operators.audit import table_diff

    df = spark.createDataFrame([(1, "a")], "k bigint, s string")
    empty = df.where("k < 0")
    assert table_diff(df, df, ["k"]).count() == 0
    assert [
        (r["status"],) for r in table_diff(df, empty, ["k"]).collect()
    ] == [("removed",)]
    assert [
        (r["status"],) for r in table_diff(empty, df, ["k"]).collect()
    ] == [("added",)]
    assert table_diff(empty, empty, ["k"]).count() == 0


def test_fan_out_small_scan_conditional(spark):
    from datawarehouse_backup_system_spark.operators.skew import (
        fan_out_small_scan,
    )

    target = spark.sparkContext.defaultParallelism
    small = spark.createDataFrame([(i,) for i in range(100)], "x bigint")
    small1 = small.coalesce(1)
    fanned = fan_out_small_scan(small1)
    assert fanned.rdd.getNumPartitions() == target
    # values survive the round-robin shuffle untouched
    assert sorted(r["x"] for r in fanned.collect()) == list(range(100))
    # an already-parallel frame is returned as-is (no extra shuffle)
    wide = small.repartition(target)
    assert fan_out_small_scan(wide) is wide


def test_fan_out_small_scan_never_executes_adaptive_plans(spark):
    """An exchange-bearing frame is AdaptiveSparkPlanExec-wrapped, and
    .rdd on that wrapper EXECUTES every upstream stage just to report a
    partition count (then reports the post-AQE-coalesce count, queuing
    a second pointless shuffle). The guard must return such frames
    untouched WITHOUT running any job (r11 session review)."""
    from pyspark.sql import functions as F

    from datawarehouse_backup_system_spark.operators.skew import (
        fan_out_small_scan,
    )

    sc = spark.sparkContext
    agg = (
        spark.createDataFrame([(i,) for i in range(1000)], "x bigint")
        .groupBy((F.col("x") % 10).alias("k"))
        .count()
    )
    jobs_before = len(sc.statusTracker().getJobIdsForGroup())
    out = fan_out_small_scan(agg)
    jobs_after = len(sc.statusTracker().getJobIdsForGroup())
    assert out is agg  # identity: no repartition stacked on the shuffle
    assert jobs_after == jobs_before  # and the probe ran NO job


# ---------------------------------------------------------------------------
# r11 coordinated tokens() migration (ADVICE r10->r11): full-whitespace
# trim + explicit WS_CLASS split, one recipe on both engines
# ---------------------------------------------------------------------------


def test_tokens_cross_engine_parity_on_adversarial_whitespace(spark):
    """Spark tokens() and the DuckDB tokens_sql() replay agree token-
    for-token on every edge the migration touched: trailing/leading
    \\n/\\t, interior control whitespace, vertical tab (the Java-vs-RE2
    \\s divergence), whitespace-only and empty text."""
    import duckdb

    docs = [
        (1, "hello world\n"),
        (2, "\t leading tab"),
        (3, "a\x0bb"),           # VT: Java \s includes it, RE2 \s does not
        (4, "a \t\n b\r\fc"),
        (5, "\n\t "),            # whitespace-only
        (6, ""),
        (7, "plain text"),
    ]
    df = spark.createDataFrame(docs, "id int, text string")
    got_spark = {
        r["id"]: list(r["t"])
        for r in df.select("id", text.tokens(F.col("text")).alias("t")).collect()
    }
    con = duckdb.connect()
    con.register("docs", __import__("pandas").DataFrame(
        docs, columns=["id", "text"]
    ))
    got_duck = {
        r[0]: list(r[1])
        for r in con.execute(
            f"SELECT id, {text.tokens_sql('text', esc=1)} AS t FROM docs"
        ).fetchall()
    }
    assert got_spark == got_duck
    # and the semantics themselves: no empty edge tokens anywhere, VT
    # splits, whitespace-only/empty collapse to the pinned ['']
    assert got_spark[1] == ["hello", "world"]
    assert got_spark[2] == ["leading", "tab"]
    assert got_spark[3] == ["a", "b"]
    assert got_spark[4] == ["a", "b", "c"]
    assert got_spark[5] == [""] and got_spark[6] == [""]


def test_token_count_strict_zero_for_control_whitespace_only(spark):
    df = spark.createDataFrame(
        [(1, "\n"), (2, "  "), (3, ""), (4, "a b")], "id int, text string"
    )
    got = {
        r["id"]: r["n"]
        for r in df.select(
            "id", text.token_count_strict(F.col("text")).alias("n")
        ).collect()
    }
    # the space-only-trim form counted (1, "\n") as 2 phantom tokens
    assert got == {1: 0, 2: 0, 3: 0, 4: 2}


def test_counts_cross_engine_parity_on_vertical_tab(spark):
    """n_nonspace (t02) and subword_count (t01) replace/extract with a
    regex the oracle replays in RE2, whose \\s lacks vertical tab — so
    the \\s shorthand diverged on VT-bearing text (Spark/Java dropped a
    VT from n_nonspace, DuckDB counted it; and RE2 made VT a 'symbol'
    subword). Both recipes now spell out the class; pin cross-engine
    equality on the exact characters the dialects disagree on."""
    import duckdb

    docs = [(1, "a\x0bb c."), (2, "x\ty\nz"), (3, "plain text!")]
    df = spark.createDataFrame(docs, "id int, text string")
    got_spark = {
        r["id"]: (r["ns"], r["sw"])
        for r in df.select(
            "id",
            F.length(F.regexp_replace(F.col("text"), text.WS_CLASS, ""))
            .alias("ns"),
            text.subword_count(F.col("text")).alias("sw"),
        ).collect()
    }
    con = duckdb.connect()
    con.register(
        "docs", __import__("pandas").DataFrame(docs, columns=["id", "text"])
    )
    got_duck = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            r"""
            SELECT id,
                   len(regexp_replace(text, '[ \t\n\f\r\x0B]', '', 'g')),
                   len(regexp_extract_all(
                       text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \t\n\f\r\x0B]'))
            FROM docs
            """
        ).fetchall()
    }
    assert got_spark == got_duck
    assert got_spark[1] == (4, 4)  # VT+space removed; subwords a,b,c,'.'


def test_spec_layer_tokenization_conforms_to_tokens_sql():
    """Single-definition enforcement: every string_split_regex call in
    the spec layer must be the tokens_sql() recipe (at either backslash
    depth) — no site can drift back to a local tokenization."""
    import pathlib
    import re

    qdir = (
        pathlib.Path(text.__file__).resolve().parents[1] / "queries"
    )
    cls1 = re.escape(r"[ \t\n\f\r\x0B]")
    cls2 = re.escape(r"[ \\t\\n\\f\\r\\x0B]")
    canon = re.compile(
        r"string_split_regex\(regexp_replace\([a-z_]+, "
        rf"'\^(?:{cls1}|{cls2})\+\|(?:{cls1}|{cls2})\+\$', '', 'g'\), "
        rf"'(?:{cls1}|{cls2})\+'\)"
    )
    for p in sorted(qdir.glob("*.py")):
        src = p.read_text()
        n_calls = src.count("string_split_regex(")
        n_canon = len(canon.findall(src))
        assert n_calls == n_canon, (
            f"{p.name}: {n_calls - n_canon} string_split_regex site(s) "
            "diverge from text.tokens_sql()"
        )
