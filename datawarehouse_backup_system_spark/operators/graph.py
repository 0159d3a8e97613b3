"""Link-analysis over edge lists: fixed-iteration weighted PageRank.

Why in a corpus engine: link-graph centrality is a standard web-corpus
quality prior (Common-Crawl-derived pipelines rank hosts by harmonic /
PageRank centrality to pick crawl frontiers and filter link farms).
The same primitive ranks any transition graph — e.g. event-type flow
graphs from product analytics.

Scale shape: each iteration is ONE equi-join of the current rank vector
against the (src-partitioned) edge list plus a groupBy(dst) sum — the
alternating join/agg shape GraphX's Pregel uses. The rank vector is
persisted per round and the previous round unpersisted, so lineage stays
shallow; the edge list is the big side and is never re-shuffled when
pre-partitioned by src (one-time repartition, reused every round).
A FIXED iteration count keeps the result deterministic and
oracle-replayable (unrolled SQL); convergence-based stopping would need
a driver-side residual check per round (same shape as
dedup_approx.dedup_groups) and is intentionally not the default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pagerank_round(
    norm_e: DataFrame,
    nodes: DataFrame,
    ranks: DataFrame,
    base_col,
    damping: float,
) -> DataFrame:
    """One PageRank round: contribution join on _src (zero Exchange on
    the edge side when norm_e is bucket-staged — `_stage_static_side`),
    map-side-combined groupBy(_dst) message sum, teleport re-base.
    Module-level so the bucketed-staging plan contract is directly
    plan-assertable in tests."""
    contrib = (
        norm_e.join(
            ranks.select(F.col("node").alias("_src"), "rank"), "_src"
        )
        .groupBy(F.col("_dst").alias("node"))
        .agg(F.sum(F.col("rank") * F.col("_p")).alias("_in"))
    )
    return nodes.join(contrib, "node", "left").select(
        "node",
        (
            base_col
            + F.lit(damping) * F.coalesce(F.col("_in"), F.lit(0.0))
        ).alias("rank"),
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iterations: int = 3,
    damping: float = 0.85,
    round_digits: int = 6,
    stage_rounds_above: int = 8,
    stage_path: str | None = None,
    tol_digits: int | None = None,
    seeds: DataFrame | None = None,
    stage_bucketed: bool | None = None,
) -> DataFrame:
    """Weighted PageRank with a fixed iteration count.

    rank₀(v) = 1/N;
    rankₜ₊₁(v) = (1−d)/N + d·Σ_{(u,v)∈E} rankₜ(u)·w(u,v)/W(u)

    ``seeds`` (optional, one-column frame of node ids) switches to
    PERSONALIZED PageRank: the teleport mass lands uniformly on the
    seed set instead of all nodes — rank₀(v) = 1_S(v)/|S|,
    rankₜ₊₁(v) = (1−d)·1_S(v)/|S| + d·Σ … — the standard seeded
    relevance propagation used in corpus curation to score pages by
    proximity to a trusted set (and in product analytics to rank
    states reachable from a chosen entry point). Seeds not present in
    the graph are ignored; an empty intersection raises ValueError.
    The seed set is assumed BROADCAST-SIZED (a trusted whitelist, not
    a data-sized frame) — it joins the node vector once.

    where W(u) is u's total out-weight. Dangling mass (nodes with no
    out-edges) is dropped, the common simplification — documented, and
    irrelevant for transition graphs where every observed state has an
    outgoing edge. Nodes = src ∪ dst. Output: (node, rank) with rank
    rounded to ``round_digits`` at the END only (intermediate ranks stay
    full-precision; per-node sums are small, so cross-engine FP drift is
    far below the rounding grain).

    TWO EXECUTION TIERS (review r9 / VERDICT r8 item 5):

    - ``iterations ≤ stage_rounds_above`` and no ``stage_path``: one
      fully-lazy unrolled lineage — deterministic, oracle-replayable
      (the p01 spec's 3-iteration path, unchanged). ``norm_e`` is
      recomputed per round by design: the plan must not leak pinned
      executor memory to callers who never get an unpersist handle,
      and at a bounded unroll depth the recompute is cheap.
    - above the threshold (or with an explicit ``stage_path``): the
      g03 parquet-staged round pattern — ``norm_e``/``nodes`` written
      once, each round's rank vector staged and the previous round
      deleted, so plan size is CONSTANT in ``iterations`` (the
      unrolled lineage grows linearly and Catalyst re-optimizes the
      whole history every round; measured in SCALE.md r9). Scratch
      lifecycle = `_staged_round_root` (per-call-site root, cleared
      on re-entry; a new call invalidates the previous call's lazy
      result). ``norm_e`` is round-invariant, so above the
      `_stage_static_side` auto size threshold (``stage_bucketed=None``
      default; ``True`` forces — VERDICT r9 item 2) it is staged as a
      bucketed+sorted table on ``_src``: every round's contribution
      join reads co-located buckets with ZERO Exchange on the edge
      side — only the node-sized rank vector shuffles, and the
      groupBy(_dst) message shuffle is map-side combined down to
      ~node-sized. Below the threshold the rank vector broadcasts and
      the edge side never shuffles anyway (measured r10 — see
      `_BUCKET_MIN_BYTES`). Plan contract pinned in
      tests/test_graph_cc.py.

    ``tol_digits`` (forces the staged tier, even below the unroll
    threshold — the stop only exists there): stop early when the
    (count, bit_xor(xxhash64(node, round(rank, tol_digits))))
    signature repeats between consecutive rounds — the g03
    Observation trick, riding the stage write job, no read-back pass.
    None (default) always runs exactly ``iterations`` rounds, keeping
    the result oracle-replayable.
    """
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(
        F.col(src).alias("_src"), F.col(dst).alias("_dst"), w.alias("_w")
    )
    out_w = e.groupBy("_src").agg(F.sum("_w").alias("_out_w"))
    # normalized edge transition probabilities, computed once and
    # reused every iteration (staged tier: written to parquet once)
    norm_e = e.join(out_w, "_src").select(
        "_src", "_dst", (F.col("_w") / F.col("_out_w")).alias("_p")
    )
    nodes = (
        e.select(F.col("_src").alias("node"))
        .union(e.select(F.col("_dst").alias("node")))
        .distinct()
    )
    if seeds is not None:
        sd = (
            seeds.select(F.col(seeds.columns[0]).alias("node"))
            .distinct()
            .withColumn("_seed", F.lit(True))
        )
        nodes = nodes.join(F.broadcast(sd), "node", "left").select(
            "node", F.coalesce(F.col("_seed"), F.lit(False)).alias("_seed")
        )
    # tol_digits forces the staged tier (ADVICE r9): the convergence
    # stop only exists there, and silently running a fixed-round unroll
    # while the caller asked for a tolerance stop is a quiet wrong-tier
    # trap. A tol_digits call below the unroll threshold therefore
    # stages too — the caller asked for early-stopping semantics.
    # stage_bucketed=True likewise forces staging: the bucketed
    # zero-Exchange plan contract only exists in the staged tier, and
    # _stage_static_side's own rule is raise-on-forced-failure, never
    # silent degradation — dropping the demand in the unrolled tier
    # contradicted that (ADVICE r10→r11).
    staged = (
        stage_path is not None
        or iterations > stage_rounds_above
        or tol_digits is not None
        or stage_bucketed is True
    )
    drop_stage = lambda: None  # noqa: E731
    if staged:
        from pyspark.sql import Observation

        spark = edges.sparkSession
        root = _staged_round_root(stage_path, "dwbss-pr-", spark)
        # cheap side first: the node frame stages before the expensive
        # norm_e, so the validations below fail BEFORE the edge-list
        # stage spends its write (review r10)
        nodes.write.mode("overwrite").parquet(f"{root}/nodes")
        nodes = spark.read.parquet(f"{root}/nodes")
    # validate + count BEFORE staging the edge list (review r10: a
    # seed-set ValueError after the bucketed stage leaked the catalog
    # entry and wasted the full edge-list write)
    if seeds is not None:
        n = nodes.where(F.col("_seed")).count()
        if n == 0:
            raise ValueError(
                "personalized pagerank: no seed id occurs in the graph"
            )
        # teleport/init mass only on seeds (exact 0.0 elsewhere)
        base_col = F.when(
            F.col("_seed"), F.lit((1.0 - damping) / n)
        ).otherwise(F.lit(0.0))
        init_col = F.when(F.col("_seed"), F.lit(1.0 / n)).otherwise(
            F.lit(0.0)
        )
    else:
        n = nodes.count()
        if n == 0:
            # empty graph → empty (node, rank) frame, not a
            # ZeroDivisionError at the driver (review r10)
            return nodes.select("node", F.lit(0.0).alias("rank"))
        base_col = F.lit((1.0 - damping) / n)
        init_col = F.lit(1.0 / n)
    ranks = nodes.select("node", init_col.alias("rank"))
    cur = None
    prev_sig = None
    try:
        if staged:
            # norm_e is round-invariant: bucketed on the per-round join
            # key so no round ever re-shuffles it (helper docstring);
            # inside the try so a failure never leaks the catalog entry
            norm_e, drop_stage = _stage_static_side(
                norm_e, root, "norm_e", "_src", bucketed=stage_bucketed
            )
        for i in range(iterations):
            ranks = _pagerank_round(norm_e, nodes, ranks, base_col, damping)
            if staged:
                nxt = f"{root}/r{i + 1}"
                if tol_digits is None:
                    # no convergence stop requested: plain stage write,
                    # no per-row signature hashing (review r9 — the hash
                    # was computed every round and never consulted)
                    ranks.write.mode("overwrite").parquet(nxt)
                else:
                    # double xor-hash signature — see connected_components
                    obs = Observation()
                    ranks.observe(
                        obs,
                        F.count(F.lit(1)).alias("n"),
                        F.coalesce(
                            F.expr(
                                "bit_xor(xxhash64(node, "
                                f"round(rank, {int(tol_digits)})))"
                            ),
                            F.lit(0),
                        ).alias("h1"),
                        F.coalesce(
                            F.expr(
                                f"bit_xor(xxhash64(round(rank, "
                                f"{int(tol_digits)}), node))"
                            ),
                            F.lit(0),
                        ).alias("h2"),
                    ).write.mode("overwrite").parquet(nxt)
                    sig = (obs.get["n"], obs.get["h1"], obs.get["h2"])
                if cur is not None:
                    _stage_rm(cur, spark)  # superseded round
                cur = nxt
                ranks = spark.read.parquet(nxt)
                if tol_digits is not None:
                    if sig == prev_sig:
                        break
                    prev_sig = sig
    finally:
        # staged tier: the final rank vector is backed by round parquet
        # (or the nodes parquet at iterations=0), never by the staged
        # edge table — its catalog entry can go now. Unrolled tier:
        # no-op (the lazy result owns the norm_e lineage).
        drop_stage()
    return ranks.select(
        "node", F.round(F.col("rank"), round_digits).alias("rank")
    )


def _canon(e: DataFrame) -> DataFrame:
    """Canonical undirected edge set: (lo, hi), lo < hi, distinct."""
    return (
        e.select(
            F.least("u", "v").alias("lo"), F.greatest("u", "v").alias("hi")
        )
        .where(F.col("lo") != F.col("hi"))
        .distinct()
    )


def _directed(e: DataFrame) -> DataFrame:
    """Both orientations (a, b) of a canonical edge set from ONE
    explode over one scan (a two-branch self-union evaluates the
    upstream twice — SCALE.md measured lesson)."""
    return e.select(
        F.explode(
            F.array(
                F.struct(F.col("lo").alias("a"), F.col("hi").alias("b")),
                F.struct(F.col("hi").alias("a"), F.col("lo").alias("b")),
            )
        ).alias("x")
    ).select("x.a", "x.b")


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star step (Kiveris et al., "Connected Components in
    MapReduce and Beyond", public literature): every node connects its
    strictly-LARGER neighbors to the minimum of its closed
    neighborhood. Preserves components; shrinks tall chains toward
    local minima in parallel.

    m(a) = least(a, min(b)) is computed AFTER the agg (F.first is
    nondeterministic to Catalyst and poisons plan reuse). The join
    branch reads ``e`` DIRECTLY: on a canonical input the b>a
    orientation of the directed view IS the (lo, hi) row set, so the
    old ``_directed(e).where(b > a)`` explode+filter re-derived the
    input it already had (r12 measured on g03 — one less pass over the
    doubled row set per round). Output rows are already canonical
    (m ≤ a < b ⟹ lo < hi strictly) but may carry DUPLICATES — two
    edges (a1, b), (a2, b) with m(a1) = m(a2) collapse — so consumers
    needing a set must distinct; the round composition defers that to
    the round-final _canon (one exchange per round instead of two;
    duplicate volume is bounded by |e| since each input edge emits
    exactly one row, and _small_star's min-aggregates are
    duplicate-insensitive)."""
    d = _directed(e)
    m = d.groupBy("a").agg(F.min("b").alias("_mn")).select(
        "a", F.least(F.col("a"), F.col("_mn")).alias("m")
    )
    return (
        e.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
        .join(m, "a")
        .select(F.col("m").alias("lo"), F.col("b").alias("hi"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star step: every node connects its smaller-or-equal
    neighborhood (plus itself) to that neighborhood's minimum."""
    # orient each edge toward its larger endpoint: group key h > l.
    # Member edges (m, l) via the join; the center edge (m, h) via the
    # ONE-ROW-PER-GROUP m frame — NOT exploded per member (review r10:
    # explode(array(l, h)) emitted the center edge deg(h) times, so a
    # 10⁶-degree hub pushed 10⁶ identical rows into _canon's distinct
    # exchange per round). The m subtree appears in both branches, but
    # its aggregate exchange is identical and Spark reuses it
    # (ReusedExchange) — the join-side scan is the only real second
    # read, against halving the distinct's input volume on hubs.
    d = e.select(F.col("hi").alias("h"), F.col("lo").alias("l"))
    m = d.groupBy("h").agg(F.min("l").alias("m"))
    member = d.join(m, "h").select(
        F.col("m").alias("u"), F.col("l").alias("v")
    )
    center = m.select(F.col("m").alias("u"), F.col("h").alias("v"))
    return _canon(member.unionByName(center))


import re as _re
import shutil as _shutil
import sys as _gsys
import threading as _threading
from pathlib import Path as _GPath

#: default-scratch root per call site (review r9): repeat calls from
#: the same site reuse one root, clearing the prior run's rounds, so a
#: graph-operator-in-a-loop driver holds O(1) round files instead of
#: one final round per call for the life of the process. Shared by
#: connected_components and staged pagerank (keys carry the prefix).
_SITE_ROOTS: dict[str, str] = {}
_ROOT_LOCK = _threading.Lock()


def _staged_round_root(
    stage_path: str | None, prefix: str, spark=None
) -> str:
    """Resolve (and clean) the round-staging root for an iterative
    graph operator. ``stage_path=None`` → one scratch root PER CALL
    SITE of the public operator (caller of our caller), reused and
    cleared across loop iterations; an explicit path is cleared of
    this machinery's ``r<N>`` round dirs only (it may hold unrelated
    data). Either way, entering a new run INVALIDATES the lazy result
    of the previous run from the same site / path. Cluster-storage
    stage paths (hdfs://…, s3://…) are cleared through the Hadoop
    FileSystem (review r10: Path.glob silently no-oped there,
    resurrecting the stale-round mixing this clearing prevents)."""
    from ..scratch import new_scratch_root

    if stage_path is None:
        # thread id in the key (review r9): two threads driving graph
        # ops from the SAME call site (a ThreadPoolExecutor over edge
        # frames — a normal multi-threaded Spark-driver pattern) must
        # not clear each other's in-flight rounds. Within one thread,
        # loop calls still reuse (and clear) one root; distinct
        # threads get distinct roots, all swept at process exit.
        caller = _gsys._getframe(2)
        site = (
            f"{prefix}{caller.f_code.co_filename}:{caller.f_lineno}"
            f":t{_threading.get_ident()}"
        )
        with _ROOT_LOCK:
            root = _SITE_ROOTS.get(site)
            if root is None:
                root = str(new_scratch_root(prefix))
                _SITE_ROOTS[site] = root
    else:
        root = stage_path
    # est_r* too (ADVICE r9): neighborhood_function stages one
    # estimate dir PER RADIUS; a re-entrant shallower call would
    # otherwise overwrite only the radii it reaches and a held
    # previous lazy result could read a mix of two runs.
    _round_dir = _re.compile(r"^(est_)?r[0-9]+")
    if "://" not in root:
        rp = _GPath(root)
        if rp.exists():
            for d in rp.iterdir():
                if d.is_dir() and _round_dir.match(d.name):
                    _shutil.rmtree(d, ignore_errors=True)
    else:
        try:
            spark = spark or _active_spark()
            jp = spark._jvm.org.apache.hadoop.fs.Path(root)
            fs = jp.getFileSystem(spark._jsc.hadoopConfiguration())
            if fs.exists(jp):
                for st in fs.listStatus(jp):
                    if st.isDirectory() and _round_dir.match(
                        st.getPath().getName()
                    ):
                        fs.delete(st.getPath(), True)
        except Exception as exc:  # noqa: BLE001 — best-effort, like the glob
            # ...but DIAGNOSABLE (ADVICE r10→r11): a failed FS
            # list/delete on re-entry silently resurrects the exact
            # stale-round mixing this clear exists to prevent, so warn
            # like the bucketed-staging fallback does.
            import warnings

            warnings.warn(
                f"stale-round clear of {root!r} failed "
                f"({type(exc).__name__}: {exc}); a held lazy result "
                "may read r*/est_r* dirs from two different runs",
                RuntimeWarning,
                stacklevel=2,
            )
    return root


def _active_spark():
    from pyspark.sql import SparkSession

    return SparkSession.getActiveSession()


def _stage_rm(path: str, spark=None) -> None:
    """Recursive best-effort delete that also works on cluster storage
    (review r10: shutil silently no-ops on an hdfs://…/s3://… stage
    path — the docstrings explicitly support pointing ``stage_path`` at
    cluster storage — so superseded edge-set-sized rounds accumulated
    forever). Plain local paths keep the cheap os-level path."""
    if "://" not in path:
        _shutil.rmtree(path, ignore_errors=True)
        return
    try:
        spark = spark or _active_spark()
        jp = spark._jvm.org.apache.hadoop.fs.Path(path)
        jp.getFileSystem(spark._jsc.hadoopConfiguration()).delete(jp, True)
    except Exception:  # noqa: BLE001 — best-effort, like rmtree
        pass


def _stage_du(path: str, spark=None) -> int:
    """Recursive byte size of a staged path, cluster-storage-aware
    (review r10: Path.rglob returned nothing on hdfs://… so auto mode
    computed size 0 and never bucketed — exactly the regime the
    threshold exists for). Unreadable → 0 (the conservative tier)."""
    try:
        if "://" not in path:
            p = _GPath(path)
            if p.is_file():
                return p.stat().st_size
            return sum(
                f.stat().st_size for f in p.rglob("*") if f.is_file()
            )
        spark = spark or _active_spark()
        jp = spark._jvm.org.apache.hadoop.fs.Path(path)
        fs = jp.getFileSystem(spark._jsc.hadoopConfiguration())
        return int(fs.getContentSummary(jp).getLength())
    except Exception:  # noqa: BLE001
        return 0


#: auto-mode cutover: bucket the staged big side only when its parquet
#: footprint reaches this size. Below it the per-round label/rank frame
#: is broadcastable, so the equi-join NEVER shuffles the edge side in
#: the first place and bucketing only costs the one-time write-side
#: sort (measured r10, g05 at sf0.1: bucketed 9.0–13.0 s vs parquet
#: 6.8–7.5 s; still true at sf1 and with SMB forced — the fixed
#: overhead dominates at local scale). Above it the label frame stops
#: being broadcastable, every round would re-shuffle the edge list
#: across the network, and the one bucketed write amortizes over the
#: ~10–30 rounds real graphs take.
_BUCKET_MIN_BYTES = 4 << 30


def _stage_static_side(
    df: DataFrame,
    root: str,
    name: str,
    key: str,
    bucketed: bool | None = None,
    n_buckets: int | None = None,
):
    """Stage a ROUND-INVARIANT big frame for an iterative operator;
    returns ``(frame, cleanup)``.

    ``bucketed=True`` (the cluster shape, VERDICT r9 item 2): write it
    once as a bucketed+sorted table on the per-round join ``key``
    (`operators/bucketed.py` — the z03-proven SMB property), so every
    round's equi-join reads co-located buckets with ZERO Exchange (and
    zero Sort) on this side and only the small per-round label/rank
    frame shuffles. The one-time bucketed write performs the
    shuffle+sort the first round's join would have — every later round
    rides it for free. A forced True RAISES on write failure (review
    r10: the old blanket fallback silently dropped the exact plan
    contract the caller demanded); auto mode falls back to the plain
    staged copy with a warning.

    ``bucketed=None`` (default — auto, the e02/h04 exact-vs-scale
    switch pattern): stage plain parquet first (shuffle-free write),
    stat the staged footprint, and REBUCKET from the staged file only
    when it reaches ``SPARK_GRAFT_GRAPH_BUCKET_MIN_BYTES`` (default
    `_BUCKET_MIN_BYTES`) — the regime where the per-round label frame
    stops being broadcastable and the join would otherwise re-shuffle
    the edge list every round. Below the threshold broadcast already
    elides the edge-side Exchange, so bucketing is pure overhead
    (measured numbers at `_BUCKET_MIN_BYTES`).

    Data files live under ``root`` (external table) so the scratch
    sweep owns them; the catalog entry is dropped by the returned
    cleanup callable. ONLY for frames that are NOT referenced by the
    operator's final result (the result must be backed by round
    parquet alone, so dropping the table after the loop is safe).

    Deliberately NOT used by connected_components: its star rounds
    REWRITE the edge set every round, so there is no round-invariant
    big side — a per-round bucketed write would pay the exact shuffle
    it elides (plus the in-bucket sort) and win nothing.
    """
    import os as _os
    import warnings as _warnings

    spark = df.sparkSession
    path = f"{root}/{name}"
    fallback = None  # already-staged parquet frame, if any
    plain_path = None
    if bucketed is None:
        df.write.mode("overwrite").parquet(path)
        fallback = spark.read.parquet(path)
        min_bytes = int(
            _os.environ.get(
                "SPARK_GRAFT_GRAPH_BUCKET_MIN_BYTES", _BUCKET_MIN_BYTES
            )
        )
        if _stage_du(path, spark) < min_bytes:
            return fallback, (lambda: None)
        # rebucket from the staged file; the plain copy is deleted once
        # the bucketed write lands (review r10: it doubled the staged
        # edge-list footprint for the life of the scratch root)
        df, plain_path, path = fallback, path, f"{path}_bucketed"
    elif not bucketed:
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path), (lambda: None)
    import uuid as _uuid

    from .bucketed import write_bucketed

    tbl = f"dwbss_stage_{name}_{_uuid.uuid4().hex[:12]}"
    nb = n_buckets or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    try:
        write_bucketed(df, tbl, [key], nb, sort_cols=[key], path=path)
    except Exception:  # noqa: BLE001 — classified below, never swallowed
        # never leave a half-registered table or partial bucket files
        try:
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        except Exception:  # noqa: BLE001
            pass
        _stage_rm(path, spark)
        if fallback is not None:
            # auto mode: the plain staged copy is intact — degrade
            # LOUDLY (review r10: a silent fallback would hide that the
            # zero-Exchange plan contract disappeared)
            _warnings.warn(
                f"bucketed staging of {name!r} failed; falling back to "
                "the plain-parquet stage (per-round edge shuffle "
                "returns)",
                RuntimeWarning,
                stacklevel=3,
            )
            return fallback, (lambda: None)
        raise  # forced True: the caller demanded the plan contract
    if plain_path is not None:
        _stage_rm(plain_path, spark)  # rebucket source no longer needed
    return spark.table(tbl), (
        lambda: spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    max_iter: int = 50,
    stage_path: str | None = None,
) -> DataFrame:
    """Weakly-connected components via alternating large-star /
    small-star rounds → ``(node, component_id)`` where component_id is
    the component's MINIMUM node id.

    Why not plain min-label propagation (``dedup_approx.dedup_groups``):
    label propagation needs O(graph diameter) rounds — a chain of 10⁶
    nodes (exactly what event-succession graphs produce) is 10⁶
    shuffles. The star algorithm contracts chains at both ends toward
    local minima every round and provably converges in O(log n) rounds
    on any graph, each round being two groupBy shuffles over the edge
    set — the 100 TB shape.

    Each round is STAGED TO PARQUET, exactly like the MapReduce
    originals materialize between jobs (and like d02's ``stage_path``
    tier). Not persist, not localCheckpoint — measured on a 40-edge
    toy graph: a star round references its input ~4×, so under persist
    the logical plan (and driver-side canonicalization/cache-lookup
    cost) grows ~4^round — round 0 took 2.8 s, round 3 never finished;
    and eager ``localCheckpoint`` intermittently served the PREVIOUS
    round's rows (observed: round 1 returned round 0's exact edge set
    while a fresh JVM returned the correct one). A parquet round-trip
    is a flat scan: constant plan size, deterministic, and at cluster
    scale doubles as restartable progress. Convergence is a 1-row agg
    on the staged file (count + order-insensitive XOR of edge hashes —
    SUM would overflow ANSI int64), never a data-sized collect;
    superseded round files are deleted as soon as the next lands.

    ``stage_path``: directory for the round files (reused across runs
    or pointed at cluster storage); default a process-scoped temp dir
    swept at exit and by the stale-scratch startup sweep. The FINAL
    round's parquet backs the returned (lazy) DataFrame, so the scratch
    root must outlive the caller's reads — the default root lives
    until process exit, the u05 scratch pattern.

    SCRATCH LIFECYCLE (review r9: a long-lived session calling WCC in
    a loop — exactly what an incremental-dedup driver does — stranded
    one edge-set-sized final-round file PER CALL until process exit):
    the default root is keyed by CALL SITE (caller file:line), and a
    repeat call from the same site clears the previous run's rounds on
    entry, so N sequential loop calls hold O(1) round files. An
    explicit ``stage_path`` is cleared of this function's ``r<N>``
    round dirs on entry likewise. Consequence, in both modes: starting
    a new call INVALIDATES the lazy DataFrame returned by the previous
    call from the same site / on the same path — materialize (write or
    collect) a result you need before recomputing, or pass a fresh
    ``stage_path`` per call to keep several results alive at once.

    ``nodes``: optional one-column frame of ALL node ids — isolated
    nodes (no incident edge) appear in the output as their own
    singleton components. Node ids must be orderable and non-null
    (component_id = the min id, the dedup_groups convention).

    WHY NO BUCKETED STAGING here (unlike core_numbers / staged
    pagerank, `_stage_static_side`): the star rounds REWRITE the edge
    set every round — there is no round-invariant big side. Writing
    each round's output bucketed would pay exactly the shuffle+sort it
    elides from the next round's single use (and the round's two
    group keys, ``a`` after the explode and ``h``, don't even share a
    bucketable key with the staged (lo, hi) layout). Bucketing only
    wins when one write amortizes over many reads."""
    from pyspark.sql import Observation

    spark = edges.sparkSession
    # the FINAL round's parquet backs the returned lazy DataFrame, so
    # the root must outlive the caller's reads — default scratch roots
    # live until process exit (shared lifecycle in ..scratch), one per
    # CALL SITE, cleared on re-entry (review r9)
    root = _staged_round_root(stage_path, "dwbss-wcc-", spark)
    # Round 0 (the canonicalized INPUT) is STAGED first (r12; measured
    # on g03 — round 1 was ~5× a steady round): a star round references
    # its input twice (the m-aggregate and the join branch), so an
    # unstaged round 0 evaluated the caller's whole edge-build lineage
    # — at g03 that is a corpus window — twice inside round 1's job.
    # One write of E + two cheap parquet scans beats two evaluations of
    # an arbitrary upstream, doubles as restartable progress for the
    # input, and its signature (riding the staging write's Observation,
    # no extra job) lets an already-converged input stop after ONE
    # round instead of two. The convergence signature rides each
    # round's write job likewise: one job per round.
    e0 = _canon(edges.select(F.col(src).alias("u"), F.col(dst).alias("v")))
    r0 = f"{root}/r0"
    obs0 = Observation()
    e0.observe(
        obs0,
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(lo, hi))"), F.lit(0)).alias("h1"),
        F.coalesce(F.expr("bit_xor(xxhash64(hi, lo))"), F.lit(0)).alias("h2"),
    ).write.mode("overwrite").parquet(r0)
    e = spark.read.parquet(r0)
    cur = r0
    prev_sig = (obs0.get["n"], obs0.get["h1"], obs0.get["h2"])
    for i in range(max_iter):
        nxt = f"{root}/r{i + 1}"
        obs = Observation()
        # TWO independent xor-hashes (argument order swapped — xxhash64
        # mixes positionally, so the pair behaves as a 128-bit
        # signature): a spurious cross-round collision is ~2⁻¹²⁸
        # instead of 2⁻⁶⁴ (VERDICT r8 nit), with zero extra rounds —
        # an `i > 1` guard instead would make max_iter=2 spuriously
        # raise on graphs already at fixpoint (review r9).
        _small_star(_large_star(e)).observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.expr("bit_xor(xxhash64(lo, hi))"), F.lit(0)
            ).alias("h1"),
            F.coalesce(
                F.expr("bit_xor(xxhash64(hi, lo))"), F.lit(0)
            ).alias("h2"),
        ).write.mode("overwrite").parquet(nxt)
        sig = (obs.get["n"], obs.get["h1"], obs.get["h2"])
        if cur is not None:
            _stage_rm(cur, spark)  # superseded round
        cur = nxt
        e = spark.read.parquet(nxt)
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "alternating star rounds (theory bound is O(log n))"
        )
    # fixpoint is a star forest: every edge is (root=lo, member=hi)
    labels = e.select(
        F.col("hi").alias("node"), F.col("lo").alias("component_id")
    ).union(
        e.select(F.col("lo").alias("node"), F.col("lo").alias("component_id"))
    ).distinct()
    if nodes is not None:
        nid = nodes.columns[0]
        labels = labels.unionByName(
            nodes.select(F.col(nid).alias("node"))
            .distinct()
            .join(labels, "node", "left_anti")
            .select("node", F.col("node").alias("component_id"))
        )
    return labels


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Exact per-node triangle counts → ``(node, n_triangles)`` over
    the undirected simple graph (self-loops dropped, parallel/reversed
    edges collapsed). Nodes in no triangle are omitted — callers join
    back with a zero default when they need the full vertex set.

    The classic degree-ordered orientation (node-iterator++ / Schank):
    orient every undirected edge from the endpoint with (degree, id)
    rank LOWER to higher. Each triangle then has exactly ONE wedge
    a→b, a→c with both edges outgoing from its lowest-ranked corner,
    so counting = one self-join of the oriented list on the wedge
    apex + one semi-join against the oriented closure edge. Out-degree
    under this orientation is O(√m) on any graph, which bounds the
    wedge count at O(m^1.5) — the property that makes exact triangle
    counting feasible at web scale where a naive neighbor-join on the
    raw (skewed) degree distribution explodes on hub nodes.

    Plan: degrees = one groupBy over the exploded edge list; the
    orientation join broadcasts nothing and shuffles the edge list
    twice (once per endpoint's degree lookup); the wedge self-join
    shuffles on the apex; the closure check is an inner join on the
    canonical (lo, hi) pair. Per-node counts credit all three corners
    via one explode + groupBy."""
    e = _canon(edges.select(F.col(src).alias("u"), F.col(dst).alias("v")))
    # (degree, id) total order: rank(x) = (deg(x), x)
    deg = _directed(e).groupBy("a").agg(F.count("*").alias("deg"))
    # orient lo→hi in rank order; keep the canonical pair for closure
    ranked = (
        e.join(
            deg.select(
                F.col("a").alias("lo"), F.col("deg").alias("_dlo")
            ),
            "lo",
        )
        .join(
            deg.select(
                F.col("a").alias("hi"), F.col("deg").alias("_dhi")
            ),
            "hi",
        )
        .select(
            "lo",
            "hi",
            F.when(
                (F.col("_dlo") < F.col("_dhi"))
                | (
                    (F.col("_dlo") == F.col("_dhi"))
                    & (F.col("lo") < F.col("hi"))
                ),
                F.struct(F.col("lo").alias("s"), F.col("hi").alias("t")),
            )
            .otherwise(
                F.struct(F.col("hi").alias("s"), F.col("lo").alias("t"))
            )
            .alias("o"),
        )
        .select(F.col("o.s").alias("s"), F.col("o.t").alias("t"))
    )
    # wedges at the lowest-ranked corner: s→t1, s→t2 with t1 < t2
    w1 = ranked.select(F.col("s").alias("_apex"), F.col("t").alias("_b"))
    w2 = ranked.select(F.col("s").alias("_apex"), F.col("t").alias("_c"))
    wedges = w1.join(w2, "_apex").where(F.col("_b") < F.col("_c"))
    # closure: the third side exists as a canonical undirected edge
    tri = wedges.join(
        e.select(F.col("lo").alias("_b"), F.col("hi").alias("_c")),
        ["_b", "_c"],
    )
    return (
        tri.select(
            F.explode(F.array("_apex", "_b", "_c")).alias("node")
        )
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )


def _kcore_round(d: DataFrame, labels: DataFrame) -> DataFrame:
    """One H-index refinement round: deliver each neighbor's current
    value over the directed edge list, then per-node H-index via a
    descending row_number window (max rank with value ≥ rank — hub-safe
    partial top-k, never collect_list). Module-level so the bucketed-
    staging plan contract (zero Exchange on the edge side) is directly
    plan-assertable in tests."""
    from pyspark.sql import Window

    w = Window.partitionBy("a").orderBy(F.desc("val"))
    nb = d.join(
        labels.select(F.col("a").alias("b"), "val"), "b"
    ).select("a", "val")
    return (
        nb.withColumn("rn", F.row_number().over(w))
        .where(F.col("val") >= F.col("rn"))
        .groupBy("a")
        .agg(F.max("rn").cast("bigint").alias("val"))
    )


def core_numbers(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 32,
    stage_path: str | None = None,
    stage_bucketed: bool | None = None,
    stage_every: int | None = None,
) -> DataFrame:
    """k-core decomposition → ``(node, core)`` over the undirected
    simple graph: core = the largest k such that the node survives in
    the k-core (every member has ≥ k neighbors inside).

    ``stage_every``: stage (parquet + signature check) every k-th
    round instead of every round — the r11 chunked-staging tier; see
    the in-body comment for the equivalence argument and the byte
    gate. ``None`` (default) auto-selects: 6 when the edge source's
    optimizer-stats footprint is ≤ ``SPARK_GRAFT_KC_CHUNK_MAX_BYTES``
    (default 1 GiB), else 1 (the scale-safe per-round fixpoint stop);
    ``SPARK_GRAFT_KC_STAGE_EVERY`` overrides outright.

    Algorithm: iterated neighborhood H-index refinement (Lü et al.,
    "The H-index of a network node and its relation to degree and
    coreness", public literature): c₀(v) = deg(v);
    cₜ₊₁(v) = H({cₜ(u) : u ∈ N(v)}), where H of a multiset is the
    largest h with ≥ h members ≥ h. The sequence is pointwise
    monotone non-increasing and its fixpoint is exactly the coreness
    (pytest-pinned against a pure-Python peel on random graphs).

    Scale shape: per round, ONE equi-join of the staged directed edge
    list against the current labels plus a per-node window top-h —
    the H-index is computed as max(rn) over rows with value ≥ rank
    under a per-node descending row_number, NOT collect_list, so a
    hub node costs O(deg) rows through the window's partial top-k,
    never a driver- or executor-side array. Rounds are parquet-staged
    with the g03 Observation signature (values are INTEGERS, so
    signature equality is a genuine fixpoint test modulo a 2⁻⁶⁴ hash
    collision), previous rounds deleted; scratch lifecycle =
    `_staged_round_root` (per-call-site default root; a new call
    invalidates the previous call's lazy result).

    BUCKETED STAGING (VERDICT r9 item 2): the directed edge list is
    round-invariant, so above the `_stage_static_side` auto size
    threshold (``stage_bucketed=None`` default; ``True`` forces,
    ``False`` disables) it is staged ONCE as a bucketed+sorted table
    on the join key ``b`` (operators/bucketed.py; the z03-proven SMB
    zero-Exchange property). Every round's neighbor join then reads
    co-located buckets with ZERO Exchange (and zero Sort) on the edge
    side — only the small (node, val) label frame shuffles into the
    bucketing, plus the unavoidable Pregel "message" shuffle of the
    joined (a, val) rows into the per-node window. The one-time
    bucketed write pays the shuffle+sort a single round's join would
    have; with ~10–30 rounds on real graphs that is a ~10–30×
    reduction in edge-list shuffle volume. Below the threshold the
    label frame broadcasts, the edge side never shuffles anyway, and
    bucketing is pure write-side overhead (measured r10 — see
    `_BUCKET_MIN_BYTES`). Sessions that cannot ``saveAsTable`` fall
    back automatically. Plan contract pinned in tests/test_graph_cc.py.

    CONVERGENCE BUDGET: real (web/link/co-occurrence) graphs converge
    in ~10–30 rounds (the paper's measurement; the repo's sf0.1
    session graph takes 10), but the worst case is O(peel depth) —
    a bare n-node path needs ~n/2 rounds because the boundary
    correction walks inward one node per round. ``iterations`` caps
    the budget; on exhaustion the result is the (well-defined,
    deterministic, still monotone-upper-bound) iterations-round
    refinement, NOT an error — callers that require exact coreness on
    adversarial topologies should raise the cap. A fixed small cap is
    also what makes the g05 spec oracle-replayable (DuckDB unrolls
    the identical rounds; an early fixpoint stop is output-equivalent
    because further rounds are no-ops).

    Reference analog: none (the daemon has no graph analytics);
    composes with g03/g04 as a link-quality prior for corpus curation
    (core number ranks pages by embeddedness; low-core = periphery).
    """
    import os as _os

    from pyspark.sql import Observation

    if iterations < 1:
        raise ValueError("core_numbers: iterations must be >= 1")
    spark = edges.sparkSession
    root = _staged_round_root(stage_path, "dwbss-kc-", spark)
    e = _canon(edges.select(F.col(src).alias("u"), F.col(dst).alias("v")))
    # CHUNKED STAGING (r11 optimization): unlike the star rounds (whose
    # round references its input ~4×, so lazy composition grows the
    # plan 4^k — measured and rejected in connected_components'
    # docstring), one H-index round references the labels frame exactly
    # ONCE — composing k rounds lazily grows the plan LINEARLY. Staging
    # every k-th round instead of every round replaces k sequential
    # (job + parquet round-trip) barriers with one k-join job: at local
    # / test scale the per-round cost is job latency, not bytes
    # (measured on g05: 10 staged rounds ≈ 6.6 s at sf0.1). The byte
    # gate keeps 100 TB honest: past a converged fixpoint a chunk runs
    # up to k−1 full-graph joins the per-round signature stop would
    # have skipped, so a big edge source keeps stage_every=1 (and the
    # per-round restartable-progress property). Fixpoint equivalence:
    # the H-index sequence is pointwise monotone non-increasing, so
    # boundary-signature equality implies every intermediate round was
    # already constant, and overshoot rounds past the fixpoint are
    # no-ops — the returned VALUES are identical for any stage_every
    # (parity-pinned in tests/test_opt_r11.py); the `iterations` cap
    # counts real rounds exactly in both modes.
    if stage_every is None:
        env = _os.environ.get("SPARK_GRAFT_KC_STAGE_EVERY")
        if env is not None:
            # malformed value (empty string, '4x') falls through to the
            # byte-gated auto tier instead of sinking the whole call
            # (ADVICE r11)
            try:
                stage_every = int(env)
            except ValueError:
                stage_every = None
        if stage_every is None:
            max_b = int(
                _os.environ.get(
                    "SPARK_GRAFT_KC_CHUNK_MAX_BYTES", str(1 << 30)
                )
            )
            try:
                e_bytes = int(
                    e._jdf.queryExecution()
                    .optimizedPlan()
                    .stats()
                    .sizeInBytes()
                )
            except Exception:  # noqa: BLE001 — no stats ⟹ scale-safe tier
                e_bytes = max_b + 1
            stage_every = 6 if e_bytes <= max_b else 1
    stage_every = max(1, int(stage_every))
    # directed (both orientations) edge list, staged ONCE — every
    # round joins against it; bucketed on the join key by default so
    # the per-round join never re-shuffles it (module helper docstring)
    d, drop_stage = _stage_static_side(
        _directed(e), root, "edges", "b", bucketed=stage_bucketed
    )
    try:
        labels = d.groupBy("a").agg(F.count(F.lit(1)).alias("val"))
        cur = None
        prev_sig = None
        done = 0
        while done < iterations:
            k_this = min(stage_every, iterations - done)
            nxt_lab = labels
            for _ in range(k_this):
                nxt_lab = _kcore_round(d, nxt_lab)
            nxt = f"{root}/r{done + k_this}"
            obs = Observation()
            # double xor-hash signature — see connected_components
            nxt_lab.observe(
                obs,
                F.count(F.lit(1)).alias("n"),
                F.coalesce(
                    F.expr("bit_xor(xxhash64(a, val))"), F.lit(0)
                ).alias("h1"),
                F.coalesce(
                    F.expr("bit_xor(xxhash64(val, a))"), F.lit(0)
                ).alias("h2"),
            ).write.mode("overwrite").parquet(nxt)
            sig = (obs.get["n"], obs.get["h1"], obs.get["h2"])
            if cur is not None:
                _stage_rm(cur, spark)  # superseded round
            cur = nxt
            labels = spark.read.parquet(nxt)
            done += k_this
            if sig == prev_sig:
                break
            prev_sig = sig
    finally:
        # the returned frame is backed by round parquet alone, so the
        # staged edge table's catalog entry can go now
        drop_stage()
    return labels.select(
        F.col("a").alias("node"), F.col("val").alias("core")
    )


def neighborhood_function(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_radius: int = 8,
    lg_config_k: int = 12,
    stage_path: str | None = None,
    stage_bucketed: bool | None = None,
    stage_rounds_above: int = 4,
) -> DataFrame:
    """HyperBall (Boldi–Vigna, "In-Core Computation of Geometric
    Centralities with HyperBall", public literature): the per-node
    neighborhood function over the undirected simple graph →
    ``(node, radius, n_reachable_est)`` for radius 0..R, where
    n_reachable_est ≈ |{u : dist(u, node) ≤ radius}|.

    Each node carries a mergeable HLL sketch of its reachable set
    (DataSketches via ``hll_sketch_agg``/``hll_union_agg`` — the same
    JVM-side sketches as q44's rollup); round t unions every node's
    sketch with its neighbors' round-(t−1) sketches. That is the whole
    trick: exact all-sources BFS needs O(n) frontier state per source
    (n² total — impossible at web scale), while a sketch is O(2^lg_k)
    bytes per node regardless of reach, and sketch union is
    associative so the round is ONE equi-join + ONE groupBy. At small
    cardinalities the DataSketches HLL is in exact (sparse) mode, so
    small-graph tests compare near-exactly against BFS.

    Rounds are parquet-staged (the g03 machinery: per-call-site
    scratch, superseded sketch rounds deleted; the per-round
    ESTIMATE frames — one small (node, radius, est) file per radius —
    are kept, they ARE the output). Early stop when the sketch-set
    signature repeats (double xor-hash over the sketch binaries —
    every ball saturated ⟹ fixpoint, same two-hash rationale as
    connected_components).

    Scale shape per round: join of the staged directed edge list with
    the (node, sketch) frame — the edge list is round-invariant, so it
    stages through `_stage_static_side` exactly like core_numbers
    (review r10: the old inline plain-parquet stage meant the bucketed
    auto switch never applied here despite the docstring's
    cross-reference) — then one groupBy(node) hll_union_agg — partial
    aggregation applies map-side because sketch union is
    commutative-associative. No driver-side data; no per-node frontier
    sets.

    Reference analog: none; standard corpus/web-graph use: ball sizes
    and the centralities derived from them (harmonic — see
    :func:`harmonic_centrality_approx`) rank pages by reachability as
    a crawl/quality prior.
    """
    spark = edges.sparkSession
    e = _canon(edges.select(F.col(src).alias("u"), F.col(dst).alias("v")))
    k = F.lit(int(lg_config_k))
    # UNROLLED LAZY TIER (r11 optimization, the pagerank
    # stage_rounds_above precedent): for a small fixed radius over a
    # small edge source, with no explicit staging demand, compose every
    # round lazily and union the per-radius estimate projections — ONE
    # job, no per-round parquet round trips. Output-equivalent to the
    # staged tier: all radii 0..max_radius are emitted (the staged
    # early stop only SKIPS post-saturation rounds, whose estimates
    # are constant — and every consumer of a truncated run fills
    # forward/truncates, so extra constant rows change nothing). The
    # per-radius union duplicates the sketch lineage (radius r's
    # subtree re-runs r joins; ~r²/2 joins total, parallel subtrees) —
    # measured FASTER locally than r staged rounds (sf0.1 g06/h06:
    # 5.5 s -> 3.9 s, OPTIMIZATION_r11.md) because at that size the
    # cost is sequential-job latency, not bytes. The SIZE GATE is what
    # keeps it honest at 100 TB: duplicated lineages re-scan the edge
    # source ~r²/2 times, so above the byte threshold (optimizer-stats
    # probe of the canonical edge frame; the e02/_stage_static_side
    # threshold pattern) the staged tier with early stop runs
    # unchanged — as it does for real HyperBall radii (8+) and for any
    # forced staging demand.
    import os as _os

    unroll_max_bytes = int(
        _os.environ.get("SPARK_GRAFT_NF_UNROLL_MAX_BYTES", str(1 << 30))
    )
    try:
        e_bytes = int(
            e._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:  # noqa: BLE001 — no stats ⟹ take the scale-safe tier
        e_bytes = unroll_max_bytes + 1
    if (
        stage_path is None
        and stage_bucketed is not True
        and max_radius <= stage_rounds_above
        and e_bytes <= unroll_max_bytes
    ):
        d = _directed(e)
        sk = d.groupBy(F.col("a").alias("node")).agg(
            F.hll_sketch_agg(F.col("a"), k).alias("sketch")
        )

        def _est(frame: DataFrame, radius: int) -> DataFrame:
            return frame.select(
                "node",
                F.lit(radius).alias("radius"),
                F.round(F.hll_sketch_estimate("sketch"))
                .cast("bigint")
                .alias("n_reachable_est"),
            )

        out = _est(sk, 0)
        for t in range(1, max_radius + 1):
            contrib = d.join(
                sk.select(F.col("node").alias("b"), "sketch"), "b"
            ).select(F.col("a").alias("node"), "sketch")
            sk = (
                contrib.unionByName(sk)
                .groupBy("node")
                .agg(F.hll_union_agg("sketch").alias("sketch"))
            )
            out = out.unionByName(_est(sk, t))
        return out

    root = _staged_round_root(stage_path, "dwbss-nf-", spark)
    d, drop_stage = _stage_static_side(
        _directed(e), root, "edges", "b", bucketed=stage_bucketed
    )
    # radius 0: each node's ball is {itself}
    sk = d.groupBy(F.col("a").alias("node")).agg(
        F.hll_sketch_agg(F.col("a"), k).alias("sketch")
    )
    est_dirs: list[str] = []

    def _write_round(frame: DataFrame, radius: int, path: str) -> tuple:
        """Stage one (node, sketch) round + its estimate frame; returns
        the (count, h1, h2) signature of the per-node INTEGER estimates
        (the sketch BINARY is not a stable set fingerprint — its
        serialization varies with union order/mode transitions, so
        hashing it never detects saturation; the rounded estimates are
        deterministic functions of the represented set). Stable
        estimates for one round ⟹ every ball saturated (exact in the
        sketch's small-range sparse mode; in dense mode a flat-estimate
        round could stop one radius early — acceptable for an
        approximate operator, documented)."""
        from pyspark.sql import Observation

        frame.write.mode("overwrite").parquet(path)
        staged = spark.read.parquet(path)
        ep = f"{root}/est_r{radius}"
        obs = Observation()
        staged.select(
            "node",
            F.lit(radius).alias("radius"),
            F.round(F.hll_sketch_estimate("sketch"))
            .cast("bigint")
            .alias("n_reachable_est"),
        ).observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.expr("bit_xor(xxhash64(node, n_reachable_est))"),
                F.lit(0),
            ).alias("h1"),
            F.coalesce(
                F.expr("bit_xor(xxhash64(n_reachable_est, node))"),
                F.lit(0),
            ).alias("h2"),
        ).write.mode("overwrite").parquet(ep)
        est_dirs.append(ep)
        return (obs.get["n"], obs.get["h1"], obs.get["h2"])

    cur = f"{root}/r0"
    try:
        prev_sig = _write_round(sk, 0, cur)
        sk = spark.read.parquet(cur)
        for t in range(1, max_radius + 1):
            contrib = d.join(
                sk.select(F.col("node").alias("b"), "sketch"), "b"
            ).select(F.col("a").alias("node"), "sketch")
            nxt_sk = (
                contrib.unionByName(sk)
                .groupBy("node")
                .agg(F.hll_union_agg("sketch").alias("sketch"))
            )
            nxt = f"{root}/r{t}"
            sig = _write_round(nxt_sk, t, nxt)
            _stage_rm(cur, spark)  # superseded sketches
            cur = nxt
            sk = spark.read.parquet(nxt)
            if sig == prev_sig:
                break
            prev_sig = sig
    finally:
        # the output is backed by the est_r* parquet alone — the staged
        # edge table's catalog entry can go now
        drop_stage()
    out = spark.read.parquet(est_dirs[0])
    for p in est_dirs[1:]:
        out = out.unionByName(spark.read.parquet(p))
    return out


def harmonic_centrality_approx(
    nf: DataFrame,
) -> DataFrame:
    """Approximate harmonic centrality from a neighborhood function:
    H(v) = Σ_{u ≠ v} 1/dist(u, v) = Σ_{t ≥ 1} (|N_t(v)| − |N_{t−1}(v)|)/t
    → ``(node, harmonic)`` (radius-truncated at the nf's max radius,
    the standard HyperBall estimator). One window-lag over the
    (node, radius) frame — tiny relative to building ``nf``."""
    from pyspark.sql import Window

    w = Window.partitionBy("node").orderBy("radius")
    return (
        nf.select(
            "node",
            "radius",
            (
                F.col("n_reachable_est")
                - F.lag("n_reachable_est", 1, 0).over(w)
            ).alias("_delta"),
        )
        .where(F.col("radius") >= 1)
        .groupBy("node")
        .agg(
            F.round(
                F.sum(F.col("_delta") / F.col("radius")), 6
            ).alias("harmonic")
        )
    )
