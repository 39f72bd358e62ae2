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

from pyspark.sql import DataFrame, SparkSession, Window
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
    """BM25 top-20 for the query {vector, stream, window}. Scale shape
    (round 12, guide §2.3/§2.4): the query-term set is FIXED and tiny,
    so per-doc term frequencies are array expressions over one split()
    — no token explode, no (doc, term) shuffle at all. ONE narrow
    per-doc row (len + one tf per query term) feeds a single partial
    aggregate that yields every corpus statistic (n_docs, avgdl, and
    each term's df) in one 1-row frame, broadcast back; the score is a
    fixed-order sum of the per-term contributions and top-20 is
    TakeOrdered. Zero corpus-sized shuffles (the old shape shuffled
    matching postings; plan diff: 2 HashAggregate exchanges + 2 joins
    removed). The per-doc pass is persisted at the stats/score fan-out
    so the corpus text is read once."""
    docs = load_table(spark, sf_dir, "documents")
    # text IS NOT NULL mirrors the explode path (split(NULL) explodes
    # to no rows, so null-text docs never counted toward n_docs/avgdl)
    w = F.split("text", " ")
    per_doc = docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        F.size(w).alias("len"),
        *[
            F.expr(f"size(filter(split(text, ' '), x -> x = '{t}'))").alias(
                f"tf{i}"
            )
            for i, t in enumerate(_BM25_TERMS)
        ],
    ).persist()
    stats = per_doc.agg(
        F.count("*").alias("n_docs"),
        F.avg("len").alias("avgdl"),
        *[
            F.count_if(F.col(f"tf{i}") > 0).alias(f"df{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )

    def contrib(i: int):
        tf = F.col(f"tf{i}").cast("double")
        idf = F.log(
            (F.col("n_docs") - F.col(f"df{i}") + 0.5)
            / (F.col(f"df{i}") + 0.5)
            + 1.0
        )
        denom = tf + _K1 * (1.0 - _B + _B * F.col("len") / F.col("avgdl"))
        return F.when(tf > 0, idf * tf * (_K1 + 1.0) / denom).otherwise(0.0)

    score = sum(contrib(i) for i in range(len(_BM25_TERMS)))
    matched = sum(
        F.col(f"tf{i}") for i in range(len(_BM25_TERMS))
    )  # docs with NO query term have no tf rows in the oracle: drop them
    return (
        per_doc.filter(matched > 0)
        .crossJoin(F.broadcast(stats))
        .select("doc_id", F.round(score, 6).alias("score"))
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


@query(
    "q_kmeans_embeddings",
    oracle="""
    WITH v AS (
      SELECT vec_id, i - 1 AS pos,
             CAST(floor(least(greatest(CAST(embedding[i] AS DOUBLE),
                                       -100.0), 100.0) * 1000 + 0.5)
                  AS BIGINT) AS x
      FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS i)
      WHERE len(embedding) = 64
    ),
    seeds AS (
      SELECT vec_id,
             row_number() OVER (
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS c
      FROM embeddings
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8
    ),
    c0 AS (
      SELECT s.c, v.pos, v.x AS cx FROM seeds s JOIN v USING (vec_id)
    ),
    d1 AS (
      SELECT v.vec_id, c0.c, sum((v.x - c0.cx) * (v.x - c0.cx)) AS d
      FROM v JOIN c0 USING (pos) GROUP BY 1, 2
    ),
    a1 AS (
      SELECT vec_id, c FROM (
        SELECT vec_id, c, row_number() OVER (
          PARTITION BY vec_id ORDER BY d, c) AS rn FROM d1) WHERE rn = 1
    ),
    c1 AS (
      SELECT a1.c, v.pos,
             CAST(floor(CAST(sum(v.x) AS DOUBLE) / count(*)) AS BIGINT) AS cx
      FROM a1 JOIN v USING (vec_id) GROUP BY 1, 2
    ),
    d2 AS (
      SELECT v.vec_id, c1.c, sum((v.x - c1.cx) * (v.x - c1.cx)) AS d
      FROM v JOIN c1 USING (pos) GROUP BY 1, 2
    ),
    a2 AS (
      SELECT vec_id, c, d FROM (
        SELECT vec_id, c, d, row_number() OVER (
          PARTITION BY vec_id ORDER BY d, c) AS rn FROM d2) WHERE rn = 1
    )
    SELECT CAST(c AS BIGINT) AS cluster,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(sum(d) AS BIGINT) AS inertia
    FROM a2 GROUP BY 1
    """,
    tags=("vectors", "clustering", "iterative", "agg"),
)
def q_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd k-means over the embedding corpus (k=8, 2 iterations) —
    the canonical clustering step behind SemDeDup-style semantic
    dedup, corpus domain discovery, and IVF coarse quantizers; the
    iterative sibling of the single-pass q_embedding_centroids
    (reference analog: none — the reference has no vector ops; this is
    mandated-extension territory like the ANN family).

    EXACTNESS BY INTEGER QUANTIZATION: float k-means is not
    reproducible across engines (summation order flips near-tie
    assignments), so vectors are clamped to [-100, 100] and quantized
    once to a 1e-3 grid (floor(x*1000+0.5) as bigint — the repo's
    shared half-up contract); every distance, argmin, and centroid
    update is then EXACT 64-bit integer arithmetic, identical in Spark
    and DuckDB under any summation order (centroid elements are
    floor(mean); the clamp bounds |x| <= 1e5 per element, keeping a
    64-term squared distance <= ~3e12 and corpus inertia far from
    int64 on ANY input — unbounded extremes would overflow the
    distance multiply). Seeds are the 8 vectors with the smallest
    md5(vec_id) (deterministic, uniform); near-tie assignments break
    toward the lower cluster id, so degenerate inputs (all-identical
    vectors) stay stable.

    Scale shape: vectors explode to (vec_id, pos, x) once; each Lloyd
    step is {assignment: join against a BROADCAST centroid table (k x
    64 = 512 rows) + one map-side-combined (vec_id, c) partial-sum
    shuffle + min_by per vec_id; update: one (c, pos) partial-sum
    shuffle}. Cost per iteration is O(n x k) rows through codegen
    joins — no UDFs, no driver loops, no collect; seed selection is
    TakeOrderedAndProject (top-8 by hash), never a global sort."""
    emb = load_table(spark, sf_dir, "embeddings")
    # the oracle enumerates EXACTLY 64 positions per vector; pin the
    # same dimension contract here (ADVICE r11) — an off-contract
    # embedding is excluded by BOTH engines instead of the oracle
    # counting its NULL out-of-range positions into centroid
    # denominators that Spark's posexplode never emits
    v = emb.filter(F.size("embedding") == 64).select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).select(
        "vec_id",
        "pos",
        # clamp BEFORE quantizing: unbounded inputs would overflow the
        # int64 distance math (and the cast itself under ANSI); the
        # [-100, 100] window keeps a 64-term squared distance <= ~3e12
        # and corpus inertia far from int64 at any SF, and both engines
        # agree on least/greatest extremum semantics
        F.floor(
            F.least(
                F.greatest(F.col("val").cast("double"), F.lit(-100.0)),
                F.lit(100.0),
            )
            * 1000
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("x"),
    )
    seeds = (
        emb.select("vec_id", F.md5(F.col("vec_id").cast("string")).alias("h"))
        .orderBy("h", "vec_id")
        .limit(8)
    )
    w8 = Window.orderBy("h", "vec_id")  # 8 rows: single-partition is fine
    seeds = seeds.select(
        "vec_id", (F.row_number().over(w8) - 1).alias("c")
    )

    def assign(centroids: DataFrame) -> DataFrame:
        d = (
            v.join(F.broadcast(centroids), on="pos")
            .groupBy("vec_id", "c")
            .agg(
                F.sum(
                    (F.col("x") - F.col("cx")) * (F.col("x") - F.col("cx"))
                ).alias("d")
            )
        )
        return d.groupBy("vec_id").agg(
            F.min_by(F.struct("c", "d"), F.struct("d", "c")).alias("a")
        ).select("vec_id", F.col("a.c").alias("c"), F.col("a.d").alias("d"))

    c0 = seeds.join(v, on="vec_id").select("c", "pos", F.col("x").alias("cx"))
    a1 = assign(c0).drop("d")
    c1 = (
        a1.join(v, on="vec_id")
        .groupBy("c", "pos")
        .agg(
            F.floor(
                F.sum("x").cast("double") / F.count(F.lit(1))
            )
            .cast("bigint")
            .alias("cx")
        )
    )
    a2 = assign(c1)
    return a2.groupBy(F.col("c").cast("bigint").alias("cluster")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.sum("d").cast("bigint").alias("inertia"),
    )
