"""Iterative graph operators (duplicate-cluster connected components).

No reference analog (ripple-server has no relational surface at all —
SURVEY.md §2); this is pipeline tooling for the dedup extension: near-
dup PAIRS (MinHash/SimHash/embedding) must be closed into CLUSTERS
before a keep-one-per-cluster policy can run, and transitive closure is
not a single SQL query — it's an iterative fixpoint.

Scale posture (100 TB corpus, ~billions of near-dup edges):

- Min-label propagation: each round is one hash join (edges x labels,
  both partitioned on the join key) + one partial-aggregated groupBy —
  the same two-shuffle shape every round, so AQE sizes it once and the
  exchange reuse keeps rounds cheap. Rounds needed = graph diameter;
  near-dup graphs are short chains/cliques (diameter ~2-4), so this
  beats the O(log n) large-star/small-star alternation (Kiveris et al.,
  "Connected Components in MapReduce and Beyond") which pays more
  shuffles per round; for adversarial long-chain graphs switch to
  :func:`connected_components_star` below (IMPLEMENTED: O(log n)
  rounds regardless of diameter, equivalence- and chain-tested in
  tests/test_property.py).
- ``localCheckpoint`` every round: truncates the lineage chain so round
  k's plan doesn't re-derive rounds 1..k-1 (unbounded lineage is the
  classic iterative-Spark OOM/stack-overflow trap).
- Early stop via an exact changed-row count per round — at most
  ``max_iter`` rounds, typically diameter+1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ripple_server_spark.config import CC_MAX_LOCAL_EDGE_BYTES
from ripple_server_spark.operators.checkpoints import free_local_checkpoint

# Driver-side cost model for the local tier: an edge row is two int64
# ids; 16 payload bytes plus collection overhead.
_EDGE_BYTES = 16


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    max_local_edge_bytes: int = CC_MAX_LOCAL_EDGE_BYTES,
) -> DataFrame:
    """Label every vertex of the undirected graph ``edges`` with the
    minimum vertex id reachable from it: ``(id, comp)``.

    Only vertices that appear in at least one edge are returned
    (isolated vertices are their own singleton cluster by definition —
    callers union them back if needed).

    TWO-TIER execution: the edge set of a near-dup graph is orders of
    magnitude smaller than the corpus that produced it, so when it fits
    comfortably on the driver (edge BYTES <= ``max_local_edge_bytes``,
    default config.CC_MAX_LOCAL_EDGE_BYTES) we collect and run
    union-find locally — one job, zero iterative shuffles. Only a
    genuinely large edge set takes the distributed min-label-propagation
    loop. (Same hybrid strategy as GraphFrames/GraphX aggregation
    fallbacks; the budget is bytes, not a row count, so the driver-
    memory exposure is explicit and configurable.)
    """
    if max_iter < 1:
        # changed starts at 0, so a zero-round run would LOOK converged
        # and silently return identity labels — exactly the partial
        # fixpoint the fail-loud guard below exists to prevent
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # vertex dtype follows the input (content-hash/string ids work in
    # BOTH tiers, not just the distributed one); the byte estimate uses
    # a wider per-edge cost for non-fixed-width ids
    id_type = dict(e.dtypes)["a"]
    edge_bytes = _EDGE_BYTES if id_type in ("bigint", "int", "smallint", "tinyint") else 4 * _EDGE_BYTES
    # Tier probe = ONE capped collect (r12, guide §1.4): rows <= cap
    # iff bytes <= budget, so collecting at most cap+1 rows answers
    # the old count() AND, when the local tier wins (the common case —
    # near-dup edge sets are orders of magnitude smaller than their
    # corpus), already delivers the complete edge set. The pre-r12
    # shape persisted the edges, ran a count job to pick the tier,
    # then re-read the cache to collect — one extra job plus a full
    # cache materialization per call. The collect is bounded at cap+1
    # rows by construction, never the raw frame.
    cap_rows = max_local_edge_bytes // edge_bytes
    probe = e.limit(cap_rows + 1).collect()
    if len(probe) <= cap_rows:
        parent: dict = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for row in probe:
            ra, rb = find(row["a"]), find(row["b"])
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        labels = [(v, find(v)) for v in parent]
        return edges.sparkSession.createDataFrame(
            labels, f"id {id_type}, comp {id_type}"
        )
    # Over budget: distributed min-label propagation over the full
    # frame. Persist before the symmetrize (it references e twice);
    # the probe's partial output is discarded.
    raw_e = e.persist()
    # Symmetrize once; distinct also dedups multi-edges so every round's
    # join fans out minimally.
    e = raw_e.union(
        raw_e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    e = e.localCheckpoint()
    raw_e.unpersist()  # the checkpoint carries the data now

    labels = (
        e.select(F.col("a").alias("id")).distinct().withColumn("comp", F.col("id"))
    ).localCheckpoint()
    prev_ckpt = labels  # the checkpointed frame backing `labels`

    changed = 0
    for _ in range(max_iter):
        # Every neighbor of `a` hears a's current component...
        msgs = e.join(labels, e.a == labels.id).select(
            F.col("b").alias("id"), F.col("comp").alias("msg")
        )
        # ...and adopts the minimum of (its own, all heard).
        mins = msgs.groupBy("id").agg(F.min("msg").alias("min_msg"))
        stepped = (
            labels.join(mins, "id", "left")
            .select(
                "id",
                F.col("comp").alias("old_comp"),
                F.least("comp", F.coalesce("min_msg", "comp")).alias("comp"),
            )
        ).localCheckpoint()
        changed = stepped.filter(F.col("comp") != F.col("old_comp")).count()
        # round k's checkpoint holds everything round k+1 needs — free
        # the superseded one so a 25-round run caches 1 state, not 25
        free_local_checkpoint(prev_ckpt)
        prev_ckpt = stepped
        labels = stepped.select("id", "comp")
        if changed == 0:
            break
    if changed != 0:
        # Silently returning a partial fixpoint would split one real
        # component into several and downstream keep-one-per-cluster
        # dedup would keep multiple "canonical" copies. Fail loudly:
        # the caller raises max_iter or switches to the O(log n)
        # star alternation, which is diameter-independent.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing) — the graph's diameter "
            "exceeds max_iter; raise it or use connected_components_star"
        )
    # the returned labels depend only on the final round's checkpoint —
    # the symmetrized edge set (the largest cached state of the job) is
    # dead now; free it like every superseded round's labels
    free_local_checkpoint(e)
    return labels


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components by alternating LARGE-STAR / SMALL-STAR
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14): converges in O(log n) rounds regardless of graph
    DIAMETER — the fallback :func:`connected_components`'s docstring
    promises for adversarial long-chain graphs, where min-label
    propagation needs diameter rounds.

    Round shape: each star operation is one symmetrize/orient pass +
    one partial-aggregated groupBy (min over neighborhoods) + one
    join — the same two-shuffle budget per op as a label-propagation
    round, but the number of rounds is logarithmic, not linear, in the
    worst case. Convergence = the edge set reaches a fixpoint (stars),
    detected by an exact count of changed edges; ``localCheckpoint``
    truncates lineage per round. Returns (id, comp) with comp = the
    minimum vertex id of the component, identical to
    :func:`connected_components`.
    """
    if max_iter < 1:
        # same fail-loud contract as connected_components: a zero-round
        # run would return the raw edge list as labels, not components
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    raw = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # node set BEFORE dropping self-loops: a vertex whose only edge is
    # (v, v) is a singleton component and must still be labeled, exactly
    # as connected_components()'s union-find tier labels it
    nodes = (
        raw.select(F.col("a").alias("id"))
        .union(raw.select(F.col("b").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    e = raw.filter(F.col("a") != F.col("b")).distinct().localCheckpoint()

    def _min_nbr(sym: DataFrame) -> DataFrame:
        # m(u) = min(N(u) ∪ {u}) over the given (directed) neighbor set
        return sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )

    def large_star(cur: DataFrame) -> DataFrame:
        sym = cur.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
            cur.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        m = _min_nbr(sym)
        # connect every STRICTLY LARGER neighbor to the neighborhood min
        return (
            sym.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )

    def small_star(cur: DataFrame) -> DataFrame:
        # orient each edge to (larger -> smaller)
        sym = cur.select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        )
        m = _min_nbr(sym)
        # connect every smaller-or-equal neighbor AND u itself to the min
        out = sym.join(m, "u").select(
            F.col("v").alias("a"), F.col("m").alias("b")
        ).union(
            sym.join(m, "u").select(F.col("u").alias("a"), F.col("m").alias("b"))
        )
        return out.filter(F.col("a") != F.col("b")).distinct()

    changed = 0
    for _ in range(max_iter):
        stepped = small_star(large_star(e)).localCheckpoint()
        # fixpoint: identical edge sets (exact anti-join count)
        changed = (
            stepped.join(e, on=["a", "b"], how="left_anti").count()
            + e.join(stepped, on=["a", "b"], how="left_anti").count()
        )
        free_local_checkpoint(e)  # superseded round state
        e = stepped
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"connected_components_star did not reach its edge fixpoint in "
            f"{max_iter} rounds ({changed} edge diffs) — raise max_iter "
            "(O(log n) rounds suffice for any diameter)"
        )
    # stars: every remaining edge points (member -> root); roots map to
    # themselves so isolated-after-contraction vertices keep a label
    labels = e.select(F.col("a").alias("id"), F.col("b").alias("comp"))
    roots = nodes.join(
        labels.select("id"), "id", "left_anti"
    ).withColumn("comp", F.col("id"))
    return labels.unionByName(roots)
