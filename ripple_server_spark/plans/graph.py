"""Duplicate-cluster queries: close near-dup PAIRS into CLUSTERS.

The dedup extension so far emits pairwise matches (MinHash-LSH /
SimHash / embedding). A keep-one policy needs the transitive closure —
doc A ~ B and B ~ C must land in one cluster even when A ~ C was never
a candidate pair. That closure is an iterative fixpoint
(operators/graph.py::connected_components); the DuckDB oracle computes
the same fixpoint declaratively with a recursive CTE, which makes this
one of the few ITERATIVE algorithms in the registry that still has an
exact SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ripple_server_spark.catalog import load_table
from ripple_server_spark.operators import dedup
from ripple_server_spark.operators.graph import connected_components
from ripple_server_spark.plans.registry import query

# MinHash-LSH verified pair set (doc_a < doc_b), identical to
# q_dedup_minhash_lsh's result — kept as a reusable CTE tail so the
# cluster oracle provably runs on the same edges the Spark side does.
_PAIRS_CTES = """
    t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    idx AS (SELECT doc_id, unnest(range(1, greatest(len(w) - 1, 1))) AS i, w FROM t),
    sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle FROM idx),
    hsh AS (
        SELECT doc_id,
               ('0x' || substr(md5(shingle), 1, 12))::BIGINT AS h1,
               ('0x' || substr(md5(shingle), 13, 12))::BIGINT AS h2
        FROM sh
    ),
    mh AS (
        SELECT doc_id, seed, min(h1 + seed * h2) AS h
        FROM hsh CROSS JOIN (SELECT unnest(range(16)) AS seed) seeds
        GROUP BY doc_id, seed
    ),
    bands AS (
        SELECT doc_id, seed // 4 AS band,
               md5(string_agg(CAST(h AS VARCHAR), '|' ORDER BY seed)) AS bh
        FROM mh GROUP BY doc_id, seed // 4
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
    ),
    inter AS (
        SELECT c.doc_a, c.doc_b, count(*) AS n_common
        FROM cand c
        JOIN sh s1 ON s1.doc_id = c.doc_a
        JOIN sh s2 ON s2.doc_id = c.doc_b AND s2.shingle = s1.shingle
        GROUP BY c.doc_a, c.doc_b
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    pairs AS (
        SELECT i.doc_a, i.doc_b
        FROM inter i
        JOIN sizes na ON na.doc_id = i.doc_a
        JOIN sizes nb ON nb.doc_id = i.doc_b
        WHERE i.n_common::DOUBLE / (na.n + nb.n - i.n_common) >= 0.5
    )
"""


@query(
    "q_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_PAIRS_CTES},
    edges AS (
        SELECT doc_a AS s, doc_b AS d FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(id, comp) AS (
        SELECT s, s FROM edges
        UNION
        SELECT e.d, r.comp FROM reach r JOIN edges e ON e.s = r.id
    ),
    labeled AS (SELECT id, min(comp) AS cluster_id FROM reach GROUP BY id)
    SELECT cluster_id, count(*) AS n_docs,
           min(id) AS min_doc, max(id) AS max_doc
    FROM labeled GROUP BY cluster_id
    """,
    tags=("dedup", "graph", "iterative"),
    bench=True,
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure of MinHash near-dup pairs into duplicate
    clusters (cluster id = min doc_id reachable), one row per cluster
    with its size and id span. Iterative min-label propagation — see
    operators/graph.py for the 100 TB posture (per-round shuffle shape,
    lineage truncation, diameter-bounded rounds)."""
    pairs = dedup.minhash_lsh_dedup(load_table(spark, sf_dir, "documents"))
    comp = connected_components(pairs, src="doc_a", dst="doc_b")
    return comp.groupBy(F.col("comp").alias("cluster_id")).agg(
        F.count("*").alias("n_docs"),
        F.min("id").alias("min_doc"),
        F.max("id").alias("max_doc"),
    )


@query(
    "q_dedup_keep_list",
    oracle=f"""
    WITH RECURSIVE {_PAIRS_CTES},
    edges AS (
        SELECT doc_a AS s, doc_b AS d FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(id, comp) AS (
        SELECT s, s FROM edges
        UNION
        SELECT e.d, r.comp FROM reach r JOIN edges e ON e.s = r.id
    ),
    labeled AS (SELECT id, min(comp) AS cluster_id FROM reach GROUP BY id),
    drops AS (SELECT id FROM labeled WHERE id <> cluster_id)
    SELECT source, count(*) AS n_kept,
           CAST(sum(CASE WHEN doc_id IN (SELECT id FROM drops)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped_check
    FROM documents
    WHERE doc_id NOT IN (SELECT id FROM drops)
    GROUP BY source
    """,
    tags=("dedup", "graph", "anti"),
)
def q_dedup_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipeline's actual OUTPUT: drop every non-canonical
    cluster member (keep id = cluster min), report the surviving corpus
    per source. Cluster closure -> drop list -> LEFT ANTI join against
    the corpus; the anti join build side is only the drop list (tiny
    relative to the corpus), so the full documents scan streams through
    one broadcast anti join. n_dropped_check is structurally 0 —
    an auditable invariant that the anti join really removed them."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_dedup(docs)
    comp = connected_components(pairs, src="doc_a", dst="doc_b")
    drops = comp.filter(F.col("id") != F.col("comp")).select("id")
    kept = docs.join(
        F.broadcast(drops), docs.doc_id == drops.id, "left_anti"
    )
    return kept.groupBy("source").agg(
        F.count("*").alias("n_kept"),
        F.lit(0).cast("bigint").alias("n_dropped_check"),
    )


# --------------------------------------------------------------------------
# PageRank over the event-type transition graph
# --------------------------------------------------------------------------

_PR_DAMP = 0.85
_PR_ITERS = 3

# One power-iteration step as a SQL CTE pair: in-mass per node plus the
# redistributed dangling mass (nodes with no out-edges). Unrolled
# _PR_ITERS times so DuckDB states the exact fixpoint prefix.
_PR_STEP = """
    pr{k} AS (
        SELECT nodes.t,
               (1 - {d}) / nn.n
               + {d} * (coalesce(im.m, 0) + dg.m / nn.n) AS pr
        FROM nodes
        CROSS JOIN nn
        CROSS JOIN (
            SELECT coalesce(sum(p.pr), 0) AS m
            FROM pr{j} p
            WHERE p.t NOT IN (SELECT DISTINCT prev FROM edges)
        ) dg
        LEFT JOIN (
            SELECT e.curr AS t, sum(p.pr * e.p) AS m
            FROM edges e JOIN pr{j} p ON p.t = e.prev
            GROUP BY e.curr
        ) im ON im.t = nodes.t
    )"""


def _pr_oracle() -> str:
    steps = ",".join(
        _PR_STEP.format(k=k, j=k - 1, d=_PR_DAMP) for k in range(1, _PR_ITERS + 1)
    )
    return f"""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    ),
    trans AS (
        SELECT prev_type AS prev, event_type AS curr, count(*) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev, curr
    ),
    edges AS (
        SELECT prev, curr,
               n::DOUBLE / sum(n) OVER (PARTITION BY prev) AS p
        FROM trans
    ),
    nodes AS (SELECT DISTINCT event_type AS t FROM events),
    nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
    pr0 AS (SELECT t, 1.0 / nn.n AS pr FROM nodes CROSS JOIN nn),
    {steps}
    SELECT t AS event_type, round(pr, 6) AS pagerank
    FROM pr{_PR_ITERS}
    """


@query(
    "q_pagerank_types",
    oracle=_pr_oracle(),
    tags=("graph", "pagerank", "iterative", "markov"),
)
def q_pagerank_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 power iterations, damping 0.85) over
    the event-type transition graph — which states a user journey
    gravitates to, the weighted-graph centrality companion to the
    connected-components fixpoint above. Edge weights are the Markov
    transition probabilities of q_event_transitions; dangling mass is
    redistributed uniformly each step (the standard formulation). The
    oracle unrolls the same 3 iterations as SQL CTEs, so this
    is an ITERATIVE algorithm with an exact hash-checked oracle.

    Scale shape: each iteration is one shuffle — ranks join edges on
    src (broadcast: ranks are node-sized), partial-aggregated by dst.
    The rank table never exceeds |V| rows; the event log is touched
    once (edge extraction), not per iteration. For billion-node graphs
    swap the broadcast for a src-partitioned join and localCheckpoint
    every few rounds exactly as connected_components does."""
    ev = load_table(spark, sf_dir, "events")
    prev = F.lag("event_type").over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
    trans = (
        ev.select("user_id", "event_type", prev.alias("prev_type"))
        .filter(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type").alias("prev"), F.col("event_type").alias("curr"))
        .agg(F.count("*").alias("n"))
    )
    edges = trans.withColumn(
        "p", F.col("n") / F.sum("n").over(Window.partitionBy("prev"))
    ).select("prev", "curr", "p")
    # persist nodes: each iteration's rank update references it, and
    # without the pin the lineage re-derives the events scan+distinct.
    nodes = ev.select(F.col("event_type").alias("t")).distinct().persist()
    n_nodes = float(nodes.count())
    if n_nodes == 0:
        # Empty event log => empty node set: the oracle's recursive
        # CTEs all project from `nodes` and yield zero rows, so the
        # builder must serve the typed empty frame instead of dividing
        # the uniform prior by zero driver-side.
        nodes.unpersist()
        return spark.createDataFrame([], "event_type string, pagerank double")
    edges = edges.persist()
    srcs = edges.select(F.col("prev").alias("t")).distinct()
    ranks = nodes.withColumn("pr", F.lit(1.0 / n_nodes))
    for it in range(_PR_ITERS):
        in_mass = (
            edges.join(F.broadcast(ranks), edges["prev"] == ranks["t"])
            .groupBy(F.col("curr").alias("t"))
            .agg(F.sum(F.col("pr") * F.col("p")).alias("m"))
        )
        dangling = (
            ranks.join(srcs, on="t", how="left_anti")
            .agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("dm"))
        )
        ranks = (
            nodes.join(in_mass, on="t", how="left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "t",
                (
                    F.lit((1 - _PR_DAMP) / n_nodes)
                    + _PR_DAMP
                    * (F.coalesce(F.col("m"), F.lit(0.0)) + F.col("dm") / n_nodes)
                ).alias("pr"),
            )
        )
        # Cut lineage BETWEEN rounds: ranks appears TWICE per iteration
        # (in_mass and dangling), so the unresolved plan doubles per
        # round — 2^iters copies of the events scan without this. Same
        # discipline as connected_components' per-round pin; the last
        # iteration stays un-checkpointed so the declared plan (and the
        # broadcast-join gate in tests/test_plans.py) remains visible.
        if it < _PR_ITERS - 1:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select(F.col("t").alias("event_type"), F.round("pr", 6).alias("pagerank"))


@query(
    "q_graph_triangles",
    oracle=f"""
    WITH {_PAIRS_CTES},
    e AS (SELECT doc_a AS a, doc_b AS b FROM pairs),
    tri AS (
        SELECT count(*) AS n_triangles
        FROM e e1 JOIN e e2 ON e2.a = e1.b JOIN e e3
          ON e3.a = e1.a AND e3.b = e2.b
    ),
    deg AS (
        SELECT v, count(*) AS d FROM (
            SELECT a AS v FROM e UNION ALL SELECT b FROM e
        ) GROUP BY v
    ),
    trip AS (
        SELECT CAST(sum(d * (d - 1) / 2) AS BIGINT) AS n_triplets,
               CAST(count(*) AS BIGINT) AS n_vertices
        FROM deg
    )
    SELECT CAST(tri.n_triangles AS BIGINT) AS n_triangles,
           (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
           trip.n_vertices,
           trip.n_triplets,
           round(CASE WHEN trip.n_triplets > 0
                      THEN 3.0 * tri.n_triangles / trip.n_triplets
                      ELSE 0 END, 4) AS clustering_coeff
    FROM tri CROSS JOIN trip
    """,
    tags=("graph", "triangles", "clustering", "dedup"),
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count and global clustering coefficient of the MinHash
    near-dup graph — how clique-like the duplicate neighborhoods are
    (high coefficient = tight duplicate families that collapse cleanly;
    low = chains, where transitive closure over-merges and a reviewer
    should look). Completes the graph-analytics trio with connected
    components and PageRank.

    Scale shape: the canonical a<b<c triangle enumeration — two joins
    on edge endpoints of the (much smaller than corpus) verified-pair
    edge list; degrees and triplets are one aggregate over edge
    endpoints. For web-scale graphs the standard refinement (orient
    edges by degree before joining) drops in without changing the
    contract."""
    pairs = dedup.minhash_lsh_dedup(load_table(spark, sf_dir, "documents"))
    e = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b")).persist()
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.a") == F.col("e1.b"))
        .join(e3, (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")))
        .agg(F.count("*").alias("n_triangles"))
    )
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    trip = deg.agg(
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("bigint").alias("n_triplets"),
        F.count("*").cast("bigint").alias("n_vertices"),
    )
    n_edges = e.agg(F.count("*").cast("bigint").alias("n_edges"))
    return (
        tri.crossJoin(n_edges)
        .crossJoin(trip)
        .select(
            F.col("n_triangles").cast("bigint").alias("n_triangles"),
            "n_edges",
            "n_vertices",
            "n_triplets",
            F.round(
                F.when(
                    F.col("n_triplets") > 0,
                    3.0 * F.col("n_triangles") / F.col("n_triplets"),
                ).otherwise(F.lit(0.0)),
                4,
            ).alias("clustering_coeff"),
        )
    )
