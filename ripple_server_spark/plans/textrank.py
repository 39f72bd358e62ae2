"""IR scoring and sequence-similarity queries (PAPERS.md corpus:
distributed similarity search / large-scale text analysis on Spark).

- BM25: the standard lexical retrieval scorer — term statistics are
  aggregates (df per term, avgdl scalar), the score is a per-(doc,term)
  expression summed per doc. Everything is JVM expression + three
  shuffles (tf, df-broadcast, score-sum), no UDFs.
- Journey similarity: users as event-type *sequences* ("trajectories"),
  compared by edit distance under length blocking — the trajectory-
  similarity-join shape (REPOSE/ICDE'21) collapsed to its Spark
  essentials: encode path -> block -> verify kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ripple_server_spark.catalog import load_table
from ripple_server_spark.plans.registry import query

_BM25_TERMS = ("vector", "stream", "window")
_K1, _B = 1.2, 0.75


@query(
    "q_text_bm25_topk",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS len FROM toks GROUP BY doc_id),
    stats AS (
      SELECT count(*) AS n_docs, avg(len) AS avgdl FROM dl
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks
      WHERE term IN ('vector', 'stream', 'window')
      GROUP BY doc_id, term
    ),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             sum(
               ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
               * tf * ({_K1} + 1.0)
               / (tf + {_K1} * (1.0 - {_B} + {_B} * len / avgdl))
             ) AS score
      FROM tf
      JOIN df USING (term)
      JOIN dl USING (doc_id)
      CROSS JOIN stats
      GROUP BY tf.doc_id
    )
    SELECT doc_id, round(score, 6) AS score
    FROM scored ORDER BY score DESC, doc_id ASC LIMIT 20
    """,
    tags=("text", "ir", "bm25", "sort-limit"),
    bench=True,
)
def q_text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 for the query {vector, stream, window}. Scale shape:
    tf is the only corpus-sized shuffle (and it's pre-filtered to query
    terms AT THE TOKENIZER, so only matching postings shuffle); df and
    the corpus stats are broadcast scalars; top-20 is TakeOrdered.
    This is the batch-retrieval kernel a training pipeline uses for
    corpus curation queries."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("len"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("len").alias("avgdl")
    )
    tf = (
        toks.filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + _K1 * (1.0 - _B + _B * F.col("len") / F.col("avgdl"))
    contrib = idf * F.col("tf") * (_K1 + 1.0) / denom
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .join(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(contrib).alias("score"))
    )
    return (
        scored.select("doc_id", F.round("score", 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
    )


@query(
    "q_journey_similarity",
    oracle="""
    WITH paths AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS path
      FROM events GROUP BY user_id
    )
    SELECT a.user_id AS user_a, b.user_id AS user_b,
           levenshtein(substr(a.path, 1, 40), substr(b.path, 1, 40)) AS dist
    FROM paths a
    JOIN paths b
      ON substr(a.path, 1, 2) = substr(b.path, 1, 2)
     AND a.user_id < b.user_id
    WHERE levenshtein(substr(a.path, 1, 40), substr(b.path, 1, 40)) <= 24
    """,
    tags=("text", "trajectory", "editdist", "window"),
)
def q_journey_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trajectory-similarity join over user journeys: each user's
    time-ordered event-type initials form a path string; pairs sharing
    a 2-step prefix (equi-join blocking — hash join, no cross product)
    are verified by capped edit distance. ORDER-sensitive aggregation
    (string_agg ... ORDER BY) is itself a declared capability: Spark
    expresses it as sort-within-group collect + concat."""
    ev = load_table(spark, sf_dir, "events")
    paths = (
        ev.select(
            "user_id",
            F.struct("ts", "event_id", F.substring("event_type", 1, 1).alias("c")).alias(
                "s"
            ),
        )
        .groupBy("user_id")
        .agg(
            F.concat_ws(
                "", F.transform(F.array_sort(F.collect_list("s")), lambda x: x["c"])
            ).alias("path")
        )
    )
    p = paths.select(
        "user_id",
        F.substring("path", 1, 2).alias("blk"),
        F.substring("path", 1, 40).alias("head"),
    )
    a, b = p.alias("a"), p.alias("b")
    dist = F.levenshtein(F.col("a.head"), F.col("b.head"))
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .select(
            F.col("a.user_id").alias("user_a"),
            F.col("b.user_id").alias("user_b"),
            dist.alias("dist"),
        )
        .filter(F.col("dist") <= 24)
    )


@query(
    "q_embedding_centroids",
    oracle="""
    SELECT CAST(label AS BIGINT) AS label, i - 1 AS pos,
           round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS mean_val
    FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS i)
    GROUP BY label, i
    """,
    tags=("vectors", "agg", "array"),
)
def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid (element-wise mean of 64-dim vectors) — the
    class-prototype computation behind IVF training, label drift
    monitoring, and centroid-distance pruning. posexplode turns each
    vector into (pos, val) rows so the mean is an ordinary partial
    aggregate: one shuffle of |labels| x 64 partials, regardless of
    corpus size. (The no-shuffle alternative — aggregate on array
    struct via zip_with — saves rows but loses partial aggregation;
    explode + partial agg wins at scale.)"""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "label", F.posexplode("embedding").alias("pos", "val")
        )
        .groupBy(F.col("label").cast("bigint").alias("label"), "pos")
        .agg(F.round(F.avg(F.col("val").cast("double")), 6).alias("mean_val"))
    )
