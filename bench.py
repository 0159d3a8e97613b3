#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q01_pricing_summary": sec, ...}, "sf": <float>}

Each query is forced with the ``noop`` sink so the full plan executes
(``count()`` would let Catalyst prune unevaluated projections). One warm
JVM, queries timed sequentially.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from datawarehouse_backup_system_spark.queries import (  # noqa: E402
    analytics_ext,
    corpus_ext,
    pipeline_ext,
    curation_ext,
    extras,
    llm_ops,
    relational,
    relational_ext,
    round6_ext,
    round7_ext,
    round8_ext,
    round9_ext,
    round10_ext,
    round11_ext,
    scale_ext,
)
from datawarehouse_backup_system_spark.session import get_spark  # noqa: E402

#: headline set: the flagship aggregate, the dedup family (exact, order-
#: defined, incremental, minhash), the join/window relational surface, and
#: the similarity + text extensions — the operators that dominate real use.
HEADLINE = [
    "q01_pricing_summary",
    "q05_self_dedup_first",
    "q06_crossfile_dedup",
    "q14_revenue_by_region",
    # r7 consolidation: q16->q39, q19->q20, m02->m05, u01->u03; the other
    # folded twins' keepers were already in this list. headline_subtotal
    # round-over-round comparability RESETS at r7 (new stable set).
    "q39_rolling_mean",
    "q20_sliding_window",
    "q22_topk_revenue_orders",
    "q25_rollup_revenue",
    "q28_asof_view_before_purchase",
    "q37_histogram",
    "q40_asof_join_generic",
    "q41_range_join_attribution",
    "q42_rollup_cascade",
    "d01_dedup_exact",
    "d02_minhash_lsh",
    "d02_minhash_lsh_staged",
    "d05_embedding_neardup",
    "d07_ann_bucketed",
    "d08_ann_multiprobe",
    "d09_dedup_groups",
    "d10_ivf_ann",
    "d11_ann_hyperplane",
    "t02_quality",
    "t03_langid",
    "t05_pii_scrub",
    "t06_pack_sequences",
    "t07_repetition",
    "t08_shard_manifest",
    "t09_decontaminate",
    "t10_curation_pipeline",
    "m05_wav_energy",
    "r02_recall_multiprobe",
    "s01_watermark_dedup_batch",
    "f01_fuzzy_resolve",
    "k01_salted_join_revenue",
    "u03_scd2_pointintime",
    "t12_domain_mixture",
    "t14_tfidf_terms",
    "e01_quantize_embeddings",
    "t15_chunk_overlap",
    "i01_incremental_neardup",
    "t17_heavy_hitters",
    "a01_funnel_counts",
    "a02_cohort_retention",
    "a05_anomaly_zscore",
    "b01_bloom_semi_join",
    "r06_recall_pq",
    "c02_cms_frequency",
    "d12_semantic_dedup",
    "t19_token_entropy",
    "a06_domain_blocklist",
    "p01_transition_pagerank",
    "q44_hll_mergeable",
    "t20_normalize_text",
    "t21_dup_spans",
    "t22_dsir_weights",
    "t23_leakage_split",
    "t24_domain_cap",
    "t25_quality_lr",
    "t26_bigram_lm",
    "t27_corpus_report",
]


def _d02_staged(stage_root: str):
    """Bench-only variant of d02 exercising the ``stage_path`` tier (the
    100 TB switch: shingles staged to parquet once instead of persisted
    in executor storage memory). The staging write is INSIDE the timed
    region — it is part of the real cost of that strategy."""
    from datawarehouse_backup_system_spark.operators import dedup_approx
    from datawarehouse_backup_system_spark.queries.llm_ops import _docs_with_neardups

    def run(spark, sf_dir):
        corpus = _docs_with_neardups(spark, sf_dir)
        pairs = dedup_approx.minhash_lsh_dedup(
            corpus, "doc_id", "text", shingle_n=3, k=9, band_size=3,
            threshold=0.5, max_bucket_size=20,
            stage_path=f"{stage_root}/shingles",
        )
        return pairs.select(
            "id_a", "id_b", "n_inter", "n_a", "n_b", "jaccard"
        )

    return run


def _cpu_stat() -> list[int] | None:
    """The aggregate ``cpu`` line of /proc/stat as 10 ints (user nice
    system idle iowait irq softirq steal guest guest_nice), or None off
    Linux. Loadavg is blind to HYPERVISOR STEAL — the r8 artifacts
    recorded ``contended: false`` in a window where every timing
    drifted +8–12% the same direction (VERDICT r8 #1); steal/iowait
    deltas see exactly that."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        if parts[:1] != ["cpu"]:
            return None
        vals = [int(x) for x in parts[1:11]]
        return vals + [0] * (10 - len(vals))
    except (OSError, ValueError):
        return None


def _stat_delta(a: list[int] | None, b: list[int] | None) -> dict | None:
    """steal/iowait as a % of total jiffies elapsed between two
    _cpu_stat samples (guest time excluded from the base: the kernel
    already folds it into user/nice)."""
    if a is None or b is None:
        return None
    d = [y - x for x, y in zip(a, b)]
    total = sum(d[:8])
    if total <= 0:
        return None
    return {
        "steal_pct": round(100.0 * d[7] / total, 2),
        "iowait_pct": round(100.0 * d[4] / total, 2),
    }


def _table_fingerprints(sf_dir: str) -> dict[str, list[int]]:
    """{table: [n_rows, n_bytes]} via parquet footers only (no data scan).

    Recorded so a round-over-round timing drift on untouched queries can
    be attributed: if the fingerprints changed, the testdata was
    regenerated; if not, blame host load (also recorded) or JVM state.
    """
    import pyarrow.dataset as ds

    fps: dict[str, list[int]] = {}
    for p in sorted(Path(sf_dir).glob("*.parquet")):
        try:
            n_rows = ds.dataset(str(p), format="parquet").count_rows()
            if p.is_dir():
                n_bytes = sum(
                    f.stat().st_size for f in p.rglob("*") if f.is_file()
                )
            else:
                n_bytes = p.stat().st_size
            fps[p.stem] = [int(n_rows), int(n_bytes)]
        except Exception:  # noqa: BLE001 — fingerprints must never sink the bench
            fps[p.stem] = [-1, -1]
    return fps


def _ref_regression(
    timings: dict[str, float],
    art_dir: str | Path | None = None,
    n_recent: int = 3,
    sf: float | None = None,
) -> dict | None:
    """Round-over-round contention detector (VERDICT r10 What's-wrong
    #1): steal sampling can miss a contended window (r10 measured 1.89%
    yet ran ~45% inflated), but the INFLATION SIGNATURE is unambiguous —
    the common-query total regresses a lot and the regression is
    UNIFORM across query families, which code changes never are.

    References: the ``n_recent`` newest committed full-per-query
    artifacts (``BENCH_r*.json``/``BENCH_sf1_r*.json`` at the SAME sf)
    plus the last clean entries of the self-recorded
    ``BENCH_history.jsonl`` (the driver's committed shape truncates the
    per-query dict, so the history is what makes the check live for
    driver runs). The chosen reference is the candidate with the lowest
    MEAN seconds per common query: contention only ever inflates, so
    the fastest recent reference is the cleanest — one contaminated
    committed artifact (r10) can never mask the check. Override with
    ``SPARK_GRAFT_BENCH_REF=<path>``.

    Returns None when no usable reference exists (<20 common queries),
    else ``{"trigger": bool, "ratio": x, "ref": name, "n_common": n,
    "families_regressed": k, "families_total": m}``; ``trigger`` is True
    when the common total regressed >20% AND ≥70% of the non-trivial
    families (ref subtotal ≥ 0.5 s) each regressed >10%.
    """
    art_dir = Path(art_dir) if art_dir else Path(__file__).resolve().parent
    ref_env = os.environ.get("SPARK_GRAFT_BENCH_REF", "").strip()
    candidates: list[tuple[str, dict[str, float]]] = []
    paths = (
        [Path(ref_env)]
        if ref_env
        else sorted(
            # BENCH_r*.json AND BENCH_sf1_r*.json — the sf guard
            # below keeps only comparable artifacts, so an sf1
            # allowlist run gets the sf1 trend files as its reference
            # (r11: the narrower glob left sf1 runs with no drift
            # check at all)
            set(art_dir.glob("BENCH_r*.json"))
            | set(art_dir.glob("BENCH_sf1_r*.json")),
            key=lambda p: p.name,
            reverse=True,
        )
    )
    for p in paths:
        try:
            art = json.loads(p.read_text())
            # driver-wrapped artifacts ({n, rc, tail, parsed}) carry
            # their one-line JSON under "parsed" — from r12 on that
            # line packs the slowest ~34 per-query timings (enough
            # for the >=20-common gate below), so unwrap it
            if "parsed" in art and isinstance(art["parsed"], dict):
                art = art["parsed"] or {}
            # timings are only comparable at the SAME scale factor —
            # an sf1 allowlist run vs an sf0.1 reference would read as
            # a huge spurious "regression" and burn a retry
            if sf is not None and art.get("sf") not in (None, sf):
                continue
            # only artifacts carrying a usable per-query dict qualify
            # (pre-r12 driver-wrapped shapes truncate to top10 — too
            # sparse an intersection to be a reliable reference; the
            # self-recorded history below is the full-fidelity path
            # for the driver's own runs)
            q = art.get("queries") or {}
            common = {k: v for k, v in q.items() if k in timings}
            if len(common) >= 20:
                candidates.append((p.name, common))
        except Exception:  # noqa: BLE001 — a bad artifact never sinks the bench
            continue
    # self-recorded full-fidelity history (appended by every run of
    # this script — the committed driver artifacts truncate the
    # per-query dict); only clean entries qualify as references
    try:
        hist = (art_dir / "BENCH_history.jsonl").read_text().splitlines()
        for i, line in enumerate(reversed(hist[-50:])):
            if sum(1 for c in candidates if c[0].startswith("hist")) >= 3:
                break
            e = json.loads(line)
            if e.get("sf") != sf or e.get("contended"):
                continue
            common = {
                k: v for k, v in (e.get("queries") or {}).items()
                if k in timings
            }
            if len(common) >= 20:
                candidates.append((f"hist[-{i + 1}]", common))
    except (OSError, ValueError):
        pass
    # recency window applies AFTER the sf/usability filter (the glob
    # mixes sf0.1 and sf1 artifacts and sf1 names sort above sf0.1);
    # history entries compete on equal terms — min-total decides
    committed = sorted(
        (c for c in candidates if not c[0].startswith("hist")),
        key=lambda kv: kv[0],
        reverse=True,
    )[:n_recent]
    candidates = committed + [
        c for c in candidates if c[0].startswith("hist")
    ]
    if not candidates:
        return None

    def _eval(name: str, ref: dict[str, float]) -> dict:
        ref_total = sum(ref.values())
        cur_total = sum(timings[k] for k in ref)
        ratio = cur_total / ref_total if ref_total > 0 else 1.0
        fams_ref: dict[str, float] = {}
        fams_cur: dict[str, float] = {}
        for k, v in ref.items():
            m = re.match(r"[a-z]+", k)
            fam = m.group(0) if m else "other"
            fams_ref[fam] = fams_ref.get(fam, 0.0) + v
            fams_cur[fam] = fams_cur.get(fam, 0.0) + timings[k]
        sized = [f for f, v in fams_ref.items() if v >= 0.5]
        regressed = [
            f for f in sized if fams_cur[f] > fams_ref[f] * 1.10
        ]
        return {
            "trigger": bool(
                ratio > 1.20
                and len(sized) > 0
                and len(regressed) >= 0.70 * len(sized)
            ),
            "ratio": round(ratio, 3),
            "ref": name,
            "n_common": len(ref),
            "families_regressed": len(regressed),
            "families_total": len(sized),
        }

    # reference = the candidate with the lowest MEAN seconds per common
    # query: contention only ever inflates, so the fastest recent
    # reference is the cleanest — this keeps one contaminated committed
    # artifact (r10) from masking the check, and the per-query
    # normalization keeps candidates with slightly different common
    # sets comparable
    name, ref = min(
        candidates, key=lambda kv: sum(kv[1].values()) / len(kv[1])
    )
    return _eval(name, ref)


def main() -> int:
    import hashlib
    import shutil
    import tempfile

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    load_start = [round(x, 2) for x in os.getloadavg()]
    # self-defense against host contention (the r6 artifact was poisoned
    # by a busy co-tenant and burned a round of comparability): flag the
    # run as contended up front so the artifact self-identifies. The
    # threshold is normalized to the core count (r7 lesson: an absolute
    # "load > 2" flagged a 32-CPU box at ~20% utilization and tainted an
    # otherwise-clean artifact); default = 0.25 x cpus, env override is
    # still an ABSOLUTE load value.
    n_cpus = os.cpu_count() or 4
    load_thresh = float(
        os.environ.get("SPARK_GRAFT_BENCH_LOAD_THRESH", str(0.25 * n_cpus))
    )
    # steal/iowait self-defense (review r9): loadavg cannot see
    # hypervisor steal, which poisoned the r8 artifacts while they
    # self-reported clean. A 0.5 s /proc/stat delta probes the entry
    # window; each attempt also records its WHOLE-RUN delta.
    # Default tightened 2.0 → 0.75 (VERDICT r10 What's-wrong #1: the
    # r10 suite ran at 1.89% steal — under the old gate — and shipped
    # ~45% uniformly inflated; the r9 measurement showed even ~1% steal
    # swings the slow graph queries by 45%).
    steal_thresh = float(
        os.environ.get("SPARK_GRAFT_BENCH_STEAL_PCT", "0.75")
    )
    _probe0 = _cpu_stat()
    if _probe0 is not None:
        time.sleep(0.5)
    entry_stat = _stat_delta(_probe0, _cpu_stat())
    contended = load_start[0] > load_thresh or bool(
        entry_stat and entry_stat["steal_pct"] > steal_thresh
    )
    fingerprints = _table_fingerprints(sf_dir)
    data_fp = hashlib.md5(
        json.dumps(fingerprints, sort_keys=True).encode()
    ).hexdigest()[:12]

    specs = {
        s.name: s
        for s in relational.SPECS + relational_ext.SPECS + llm_ops.SPECS
        + extras.SPECS + curation_ext.SPECS + analytics_ext.SPECS
        + corpus_ext.SPECS
        + pipeline_ext.SPECS
        + scale_ext.SPECS
        + round6_ext.SPECS
        + round7_ext.SPECS
        + round8_ext.SPECS
        + round9_ext.SPECS
        + round10_ext.SPECS
        + round11_ext.SPECS
    }
    # crashed-run strays first (pid-liveness-gated, shared lifecycle)
    from datawarehouse_backup_system_spark.scratch import sweep_stale_scratch

    sweep_stale_scratch()
    stage_root = tempfile.mkdtemp(prefix=f"dwbss-bench-stage-p{os.getpid()}-")
    extra_fns = {"d02_minhash_lsh_staged": _d02_staged(stage_root)}
    spark = get_spark(app_name="dwbss-bench")

    # warm the JVM + file listing with a trivial action (not timed)
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    # Full coverage: the curated HEADLINE order first (timings comparable
    # round-over-round), then every remaining contract query appended by
    # name — so each operator the driver verifies also carries a fresh
    # per-round timing.
    run_order = list(HEADLINE) + sorted(set(specs) - set(HEADLINE))

    # Optional allowlist for focused runs (e.g. the sf1 scaling
    # measurement in SCALE.md): comma-separated query names.
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").strip()
    if only:
        wanted = {n.strip() for n in only.split(",") if n.strip()}
        run_order = [n for n in run_order if n in wanted]

    # best-of-2 per query: the first run includes shuffle-file/codegen
    # warmup and is exposed to host noise; min() approximates steady state.
    # A failing query must NOT sink the suite (r2/r3 lesson: one
    # AnalysisException left the driver with an empty BENCH file two
    # rounds running) — errors are recorded per query and the JSON line
    # is ALWAYS emitted. A soft wall-clock budget degrades best-of-2 to
    # best-of-1, and a hard budget stops the loop, marking the remainder
    # "skipped" — partial timings beat none.
    # Defaults sized so the contention RETRY is actually admissible for
    # the full 150-query suite (r11 session measurement: one full
    # attempt runs ~800 s clean / ~1000 s contended, so the old 1500 s
    # hard budget could never satisfy `elapsed + pause + 1.2*wall <
    # hard` — the whole-suite retry the r10 verdict asked for was dead
    # code exactly on the official artifact it exists to protect; it
    # only ever fired for allowlist runs). 2700 s admits one retry;
    # the soft budget keeps best-of-2 through a clean attempt.
    soft_budget = float(os.environ.get("SPARK_GRAFT_BENCH_SOFT_S", "1100"))
    hard_budget = float(os.environ.get("SPARK_GRAFT_BENCH_HARD_S", "2700"))
    bench_t0 = time.time()

    def _time_once(name: str) -> float:
        """ONE timed execution — the single definition of the timed
        region, shared by the best-of-2 loop and the best-of-3 top-up
        so their minimums stay comparable by construction."""
        fn = extra_fns[name] if name in extra_fns else specs[name].spark_fn
        spark.catalog.clearCache()  # no cross-run cache reuse
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    def _run_attempt(ignore_soft: bool = False) -> dict:
        """One full pass over run_order (best-of-2 + slowest top-up),
        with its own load + /proc/stat steal/iowait bracket, so each
        attempt self-identifies as clean or noisy. The soft/hard
        budgets stay GLOBAL (bench_t0): they bound the whole process
        for the driver, retry included. ``ignore_soft`` (ADVICE r9):
        an admitted retry was admitted WITH full best-of-2 headroom
        under the hard budget, so the soft-budget single-run
        degradation must not quietly produce a lower-quality attempt
        mid-run — the retry exists to replace a noisy attempt with a
        clean one of EQUAL quality. The hard budget still applies."""
        a_load0 = [round(x, 2) for x in os.getloadavg()]
        a_stat0 = _cpu_stat()
        a_t0 = time.time()
        timings: dict[str, float] = {}
        errors: dict[str, str] = {}
        skipped: list[str] = []
        for name in run_order:
            elapsed = time.time() - bench_t0
            if elapsed > hard_budget:
                skipped.append(name)
                continue
            runs = 1 if (elapsed > soft_budget and not ignore_soft) else 2
            best = float("inf")
            for _ in range(runs):
                try:
                    best = min(best, _time_once(name))
                except Exception as exc:  # noqa: BLE001 — isolate per query
                    errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                    break
            if best < float("inf"):
                timings[name] = round(best, 3)
                errors.pop(name, None)

        # best-of-3 top-up for the most expensive queries: they dominate
        # the total and are the most exposed to a noisy co-tenant burst,
        # so one extra run tightens their min toward steady state (r6
        # lesson: the apparent q-family blowup was load, not plans).
        topup_n = int(os.environ.get("SPARK_GRAFT_BENCH_TOPUP_N", "8"))
        for name, _sec in sorted(
            timings.items(), key=lambda kv: -kv[1]
        )[:topup_n]:
            if time.time() - bench_t0 > hard_budget:
                break
            try:
                timings[name] = min(
                    timings[name], round(_time_once(name), 3)
                )
            except Exception:  # noqa: BLE001 — best-of-2 number stands
                pass
        a_load1 = [round(x, 2) for x in os.getloadavg()]
        run_stat = _stat_delta(a_stat0, _cpu_stat())
        # contended during THIS attempt: load at ENTRY, or steal over
        # the whole run. load_end is recorded but NOT flagged — the
        # suite's own local[32] work drives loadavg to ~cpus by the
        # end of every healthy run (review r9: flagging on load_end
        # marked every attempt contended and forced a pointless
        # retry); steal is the only mid-run signal that sees a
        # co-tenant through our own load. iowait is recorded, not
        # flagged — the bench itself does real parquet I/O.
        a_contended = a_load0[0] > load_thresh or bool(
            run_stat and run_stat["steal_pct"] > steal_thresh
        )
        return {
            "timings": timings,
            "errors": errors,
            "skipped": skipped,
            "env": {
                "load_start": a_load0,
                "load_end": a_load1,
                "cpu_stat": run_stat,
                "contended": a_contended,
                "wall_s": round(time.time() - a_t0, 1),
            },
        }

    try:
        attempts = [_run_attempt()]
        # the whole-suite retry (VERDICT r8 stretch): if the attempt
        # was noisy (entry probe or run bracket), run ONCE more while
        # budget allows, so "noisy window" never again needs SCALE.md
        # prose to correct the committed number. Both attempts' env
        # blocks are recorded; the official timings come from the
        # clean attempt (or the faster one if both are noisy).
        max_attempts = int(os.environ.get("SPARK_GRAFT_BENCH_ATTEMPTS", "2"))
        retry_pause = float(
            os.environ.get("SPARK_GRAFT_BENCH_RETRY_PAUSE_S", "10")
        )
        # round-over-round admission (VERDICT r10): a >20% common-query
        # regression spread uniformly across families is contention the
        # steal probe missed, not code — admit the retry on it too.
        ref_reg = _ref_regression(attempts[-1]["timings"], sf=sf)
        if (
            len(attempts) < max_attempts
            and (
                contended
                or attempts[-1]["env"]["contended"]
                or bool(ref_reg and ref_reg["trigger"])
            )
            and not attempts[-1]["skipped"]
            # pause is part of the headroom: admitting a retry the
            # hard budget then truncates burns a full attempt's wall
            # only for most-complete-first to discard it (review r9)
            and time.time() - bench_t0
            + retry_pause
            + attempts[-1]["env"]["wall_s"] * 1.2
            < hard_budget
        ):
            time.sleep(retry_pause)
            attempts.append(_run_attempt(ignore_soft=True))
    finally:
        # a killed/failed run must not strand the staging root (r7
        # stranded /tmp/dwbss-bench-stage-*; SIGKILL is still covered by
        # the pid-gated startup sweep above)
        shutil.rmtree(stage_root, ignore_errors=True)

    # official attempt: most-complete first (a hard-budget-truncated
    # retry must not win on an artificially small total), then clean
    # over contended, then fastest.
    used = min(
        range(len(attempts)),
        key=lambda i: (
            -len(attempts[i]["timings"]),
            attempts[i]["env"]["contended"],
            sum(attempts[i]["timings"].values()),
        ),
    )
    official = attempts[used]
    timings = official["timings"]
    errors = official["errors"]
    skipped = official["skipped"]
    any_clean = any(not a["env"]["contended"] for a in attempts)
    # the artifact-level flag reflects the OFFICIAL attempt (plus the
    # entry probe when no attempt was clean)
    contended = official["env"]["contended"] or (not any_clean and contended)

    total = round(sum(timings.values()), 3)
    load_end = official["env"]["load_end"]
    try:
        jvm_up_s = round(
            time.time() - spark.sparkContext.startTime / 1000.0, 1
        )
    except Exception:  # noqa: BLE001
        jvm_up_s = -1.0
    # re-evaluate against the OFFICIAL attempt's timings (the retry may
    # be the one used) so the artifact self-identifies residual drift
    official_reg = _ref_regression(timings, sf=sf)
    env_ctx = {
        "load_start": official["env"]["load_start"],
        "load_end": load_end,
        "entry_stat": entry_stat,
        "cpu_stat": official["env"]["cpu_stat"],
        "contended": contended,
        "ref_regression": official_reg,
        "attempts": [a["env"] for a in attempts],
        "attempt_used": used,
        "jvm_uptime_s": jvm_up_s,
        "data_fp": data_fp,
        "tables": fingerprints,
    }
    out = {
        "metric": "headline-suite wall seconds (noop-forced, warm JVM, best of 2; best of 3 for the slowest)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "env": env_ctx,
    }
    if errors:
        out["errors"] = errors
    if skipped:
        out["skipped"] = skipped
    print(json.dumps(out))

    # The driver records only the LAST 2000 chars of stdout; the full
    # line above is ~5 KB so its head (metric/value + the comparable
    # HEADLINE timings, printed first) is exactly what truncation cut in
    # r2–r4 (BENCH_r04.json: parsed=null). Emit a compact,
    # contract-shaped summary LAST so the longitudinal signal always
    # survives: grand total, the curated-HEADLINE subtotal (stable set —
    # comparable round-over-round), per-family subtotals, and the 10
    # slowest queries. Kept well under the 2000-char window.
    headline_subtotal = round(
        sum(timings[n] for n in HEADLINE if n in timings), 3
    )
    families: dict[str, float] = {}
    for name, sec in timings.items():
        m = re.match(r"[a-z]+", name)
        fam = m.group(0) if m else "other"
        families[fam] = round(families.get(fam, 0.0) + sec, 3)
    order = sorted(timings.items(), key=lambda kv: (-kv[1], kv[0]))
    top10 = dict(order[:10])
    compact = {
        "metric": "headline-suite wall seconds (noop-forced, warm JVM, best of 2; best of 3 for the slowest)",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "headline_subtotal": headline_subtotal,
        "n_headline": sum(1 for n in HEADLINE if n in timings),
        "families": families,
        "top10": top10,
        "n_errors": len(errors),
        "n_skipped": len(skipped),
        # drift attribution digest (full table fingerprints in the big
        # line's "env"): same data_fp + similar load ⇒ blame JVM/plan.
        # contended=true marks the artifact as load-poisoned at entry —
        # do not compare its timings round-over-round.
        "contended": contended,
        # both ends of the bracket from the OFFICIAL attempt (review
        # r9: pairing the process-entry load with attempt 2's end load
        # made an incoherent bracket for drift-attribution tooling)
        "load": [official["env"]["load_start"], load_end],
        "steal_pct": (official["env"]["cpu_stat"] or {}).get("steal_pct"),
        # non-null ⇒ vs-recent-rounds drift check ran; trigger=true on
        # the OFFICIAL attempt means the artifact still carries the
        # uniform-inflation signature after the retry — do not trust
        # its round-over-round comparison.
        "ref_regression": official_reg,
        "n_attempts": len(attempts),
        "attempt_used": used,
        "jvm_uptime_s": jvm_up_s,
        "data_fp": data_fp,
    }
    # Per-query timings in the DRIVER-PARSED line (VERDICT r11 item 2:
    # PERF_r11 had per_query={} / bench_ok=false because only
    # families/top10 survived the driver's 2000-char stdout tail — the
    # FULL 150-query dict is ~4 KB and its NAMES alone exceed the
    # window, so it physically cannot fit). Pack slowest-first (name
    # tiebreak) until the tight-serialized line reaches the window,
    # covering the queries that dominate the total; the packing is
    # deterministic, so two same-round runs (32c vs 8c scaling) share
    # composition on every query whose rank is stable. Full fidelity
    # still ships in the big line above and in BENCH_history.jsonl.
    packed: dict[str, float] = {}
    budget = int(os.environ.get("SPARK_GRAFT_BENCH_TAIL_BUDGET", "1980"))
    compact["n_queries_in_line"] = 999  # 3-char placeholder for sizing

    def _csize(d: dict) -> int:
        return len(json.dumps(d, separators=(",", ":")))

    for name, sec in order:
        if _csize({**compact, "queries": {**packed, name: sec}}) > budget:
            break
        packed[name] = sec
    compact["queries"] = packed
    compact["n_queries_in_line"] = len(packed)
    print(json.dumps(compact, separators=(",", ":")))
    # self-recorded full-fidelity history: the driver's committed
    # artifact truncates the per-query dict (only top10 survives), so
    # every run appends its full timings here — the next run's
    # _ref_regression reads the clean entries back as references (r11)
    try:
        hist_entry = {
            "sf": sf,
            "total": total,
            "queries": timings,
            "contended": contended,
            "steal_pct": (official["env"]["cpu_stat"] or {}).get(
                "steal_pct"
            ),
            "data_fp": data_fp,
        }
        with open(Path(__file__).resolve().parent / "BENCH_history.jsonl",
                  "a") as f:
            f.write(json.dumps(hist_entry) + "\n")
    except OSError:
        pass  # read-only checkout: the artifact lines already printed
    try:
        spark.stop()
    except Exception:  # noqa: BLE001 — the JSON line is already out
        pass
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
