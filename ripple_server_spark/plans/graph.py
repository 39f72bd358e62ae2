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

from pyspark.sql import DataFrame, SparkSession
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
