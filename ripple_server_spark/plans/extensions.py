"""Extension queries: dedup, similarity search, text analysis,
multimodal — the LLM-training-data-pipeline surface (BASELINE.json
north star; no reference analog).

Oracle strategy: all signatures/hashes are md5-derived, so DuckDB
regenerates them exactly; cosine/jaccard values are rounded at the
edge; ranks use rounded scores + id tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ripple_server_spark.catalog import load_table
from ripple_server_spark.functions import text as tx
from ripple_server_spark.functions.scalar import xor_fingerprint48
from ripple_server_spark.functions.vectors import (
    dot,
    l2_norm,
    lsh_bucket_expr,
    lsh_bucket_pandas,
    lsh_probe_buckets,
)
from ripple_server_spark.operators import dedup
from ripple_server_spark.operators.similarity import ANN_AUDIT_ORACLE
from ripple_server_spark.plans.registry import query

_ANN_AUDIT_ORACLE_K3 = ANN_AUDIT_ORACLE.format(k=3)

EMB_DIM = 64

# Shared DuckDB CTE: distinct word-3-gram shingles per document.
_SH_CTE = """
    t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    idx AS (SELECT doc_id, unnest(range(1, greatest(len(w) - 1, 1))) AS i, w FROM t),
    sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle FROM idx)
"""

# Shared DuckDB cosine between two FLOAT[] columns a.embedding/b.embedding.
_COS = """
    list_sum(list_transform(range(1, len(a.embedding) + 1),
             i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
    / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
     * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
"""


# --------------------------------------------------------------------------
# Dedup
# --------------------------------------------------------------------------


@query(
    "q_dedup_exact",
    oracle="""
    SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
    tags=("dedup",),
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash; keep-smallest-id policy."""
    return dedup.exact_dedup_docs(load_table(spark, sf_dir, "documents"))


@query(
    "q_dedup_events_first",
    oracle="""
    SELECT user_id, event_type, min(event_id) AS first_event_id
    FROM events
    GROUP BY user_id, event_type
    """,
    tags=("dedup",),
)
def q_dedup_events_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup with a deterministic keep-first policy (dropDuplicates
    keeps an arbitrary row; min-per-key is the reproducible form)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id", "event_type").agg(F.min("event_id").alias("first_event_id"))


@query(
    "q_dedup_minhash_lsh",
    oracle=f"""
    WITH {_SH_CTE},
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
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)
    SELECT i.doc_a, i.doc_b,
           round(i.n_common::DOUBLE / (na.n + nb.n - i.n_common), 4) AS jaccard
    FROM inter i
    JOIN sizes na ON na.doc_id = i.doc_a
    JOIN sizes nb ON nb.doc_id = i.doc_b
    WHERE i.n_common::DOUBLE / (na.n + nb.n - i.n_common) >= 0.5
    """,
    bench=True,
    tags=("dedup", "lsh"),
)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16 perms) + LSH(4 bands) near-dup pairs, Jaccard-verified
    at 0.5. The oracle regenerates identical signatures from md5."""
    return dedup.minhash_lsh_dedup(load_table(spark, sf_dir, "documents"))


@query(
    "q_dedup_ngram_jaccard",
    oracle=f"""
    WITH {_SH_CTE},
    src AS (SELECT doc_id, source FROM documents),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM src a JOIN src b ON a.source = b.source AND a.doc_id < b.doc_id
    ),
    inter AS (
        SELECT p.doc_a, p.doc_b, count(*) AS n_common
        FROM pairs p
        JOIN sh s1 ON s1.doc_id = p.doc_a
        JOIN sh s2 ON s2.doc_id = p.doc_b AND s2.shingle = s1.shingle
        GROUP BY p.doc_a, p.doc_b
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)
    SELECT i.doc_a, i.doc_b,
           round(i.n_common::DOUBLE / (na.n + nb.n - i.n_common), 4) AS jaccard
    FROM inter i
    JOIN sizes na ON na.doc_id = i.doc_a
    JOIN sizes nb ON nb.doc_id = i.doc_b
    WHERE i.n_common::DOUBLE / (na.n + nb.n - i.n_common) >= 0.01
    """,
    tags=("dedup",),
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked exact n-gram Jaccard (block = source), candidates from a
    shared-shingle inverted index — no all-pairs join within a block
    (plan-asserted in tests/test_plans.py)."""
    return dedup.ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"))


@query(
    "q_text_simhash",
    oracle="""
    WITH toks AS (
        SELECT doc_id, w, count(*) AS cnt
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
        GROUP BY doc_id, w
    ),
    wb AS (
        SELECT doc_id, b,
               sum(CASE WHEN substr(md5(w || ':' || CAST(b AS VARCHAR)), 1, 1) <= '7'
                        THEN cnt ELSE -cnt END) AS s
        FROM toks CROSS JOIN (SELECT unnest(range(32)) AS b) bits
        GROUP BY doc_id, b
    )
    SELECT doc_id,
           string_agg(CASE WHEN s >= 0 THEN '1' ELSE '0' END, '' ORDER BY b) AS simhash
    FROM wb GROUP BY doc_id
    """,
    tags=("dedup",),
)
def q_text_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash signatures (count-weighted md5 sign vectors)."""
    return dedup.simhash_signatures(load_table(spark, sf_dir, "documents"))


@query(
    "q_dedup_simhash_pairs",
    oracle="""
    WITH toks AS (
        SELECT doc_id, w, count(*) AS cnt
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
        GROUP BY doc_id, w
    ),
    wb AS (
        SELECT doc_id, b,
               sum(CASE WHEN substr(md5(w || ':' || CAST(b AS VARCHAR)), 1, 1) <= '7'
                        THEN cnt ELSE -cnt END) AS s
        FROM toks CROSS JOIN (SELECT unnest(range(32)) AS b) bits
        GROUP BY doc_id, b
    ),
    sig AS (
      SELECT doc_id,
             string_agg(CASE WHEN s >= 0 THEN '1' ELSE '0' END, '' ORDER BY b) AS simhash
      FROM wb GROUP BY doc_id
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(list_sum(list_transform(range(1, 33),
               i -> CASE WHEN substr(a.simhash, i, 1) <> substr(b.simhash, i, 1)
                         THEN 1 ELSE 0 END)) AS BIGINT) AS hamming
    FROM sig a JOIN sig b
      ON substr(a.simhash, 1, 8) = substr(b.simhash, 1, 8) AND a.doc_id < b.doc_id
    WHERE hamming <= 3
    """,
    tags=("dedup", "simhash"),
)
def q_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: block on the signature's 8-bit prefix
    (candidates only meet inside a block — the banded-LSH trick, ~n/256
    per block), then exact hamming distance ≤ 3 over the 32-bit
    signatures. Pure codegen: the hamming sum is 32 fused substring
    compares, no UDF, one shuffle on the prefix key. At 100 TB: more/
    rotated prefix bands (multi-probe) + the same verify."""
    sig = dedup.simhash_signatures(load_table(spark, sf_dir, "documents"))
    a, b = sig.alias("a"), sig.alias("b")
    hamming = sum(
        F.when(
            F.substring(F.col("a.simhash"), i, 1)
            != F.substring(F.col("b.simhash"), i, 1),
            1,
        ).otherwise(0)
        for i in range(1, 33)
    ).cast("bigint")
    return (
        a.join(
            b,
            (
                F.substring(F.col("a.simhash"), 1, 8)
                == F.substring(F.col("b.simhash"), 1, 8)
            )
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
    )


# DuckDB CTE: md5-derived ±1 hyperplane weights (8 planes × 64 dims,
# 512 md5 calls total — NOT per row) and per-vector LSH buckets.
_LSH_CTES = """
    wt AS (
        SELECT h,
               list(CASE WHEN substr(md5(CAST(h AS VARCHAR) || ':' ||
                                         CAST(i AS VARCHAR)), 1, 1) <= '7'
                         THEN 1.0 ELSE -1.0 END ORDER BY i) AS w
        FROM (SELECT unnest(range(8)) AS h) hs
        CROSS JOIN (SELECT unnest(range(64)) AS i) dims
        GROUP BY h
    ),
    proj AS (
        SELECT vec_id, h,
               list_sum(list_transform(range(1, len(embedding) + 1),
                        i -> CAST(embedding[i] AS DOUBLE) * w[i])) AS s
        FROM embeddings CROSS JOIN wt
    ),
    buckets AS (
        SELECT vec_id,
               string_agg(CASE WHEN s >= 0 THEN '1' ELSE '0' END, '' ORDER BY h) AS bucket
        FROM proj GROUP BY vec_id
    )
"""


@query(
    "q_dedup_embedding",
    oracle=f"""
    WITH {_LSH_CTES},
    e AS (SELECT b.bucket, emb.* FROM embeddings emb JOIN buckets b USING (vec_id))
    SELECT vec_a, nearest_id, sim FROM (
        SELECT a.vec_id AS vec_a, b.vec_id AS nearest_id,
               round({_COS}, 4) AS sim,
               {_COS} AS raw_cos,
               row_number() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY floor({_COS} * 1e6 + 0.5) DESC, b.vec_id) AS rn
        FROM e a JOIN e b
          ON a.label = b.label AND a.bucket = b.bucket AND a.vec_id <> b.vec_id
    ) WHERE rn = 1 AND raw_cos >= 0.2
    -- threshold on the UNROUNDED cosine, matching the builder: a pair
    -- at cosine 0.19995 must be dropped by both engines, not kept here
    -- because the 4dp display rounding reached 0.2
    """,
    tags=("dedup", "vectors"),
)
def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: nearest neighbor per vector within a
    (label × LSH-bucket) block. The double block keeps candidates
    near-linear at any corpus size — exactly the 100 TB layout, where
    the bucket is the shuffle key."""
    emb = load_table(spark, sf_dir, "embeddings")
    return dedup.embedding_neardup_bucketed(
        emb.withColumn("bucket", lsh_bucket_pandas(F.col("embedding"), EMB_DIM))
    )


@query(
    "q_dedup_semantic",
    oracle=f"""
    WITH {_LSH_CTES},
    e AS (SELECT b.bucket, emb.* FROM embeddings emb JOIN buckets b USING (vec_id)),
    cent AS (
        SELECT label, bucket, list(mv ORDER BY pos) AS c
        FROM (
            SELECT label, bucket, i AS pos,
                   avg(CAST(embedding[i] AS DOUBLE)) AS mv
            FROM e CROSS JOIN (SELECT unnest(range(1, 65)) AS i)
            GROUP BY label, bucket, i
        ) GROUP BY label, bucket
    ),
    scored AS (
        SELECT e.label, e.bucket, e.vec_id, e.embedding,
               row_number() OVER (
                   PARTITION BY e.label, e.bucket
                   ORDER BY floor(
                       list_sum(list_transform(range(1, 65),
                                i -> CAST(e.embedding[i] AS DOUBLE) * c[i]))
                       / (sqrt(list_sum(list_transform(e.embedding,
                                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                        * sqrt(list_sum(list_transform(c, x -> x * x))))
                       * 1000000 + 0.5) ASC,
                       e.vec_id ASC) AS rnk
        FROM e JOIN cent USING (label, bucket)
    ),
    removed AS (
        SELECT DISTINCT b.vec_id
        FROM scored a JOIN scored b
          ON a.label = b.label AND a.bucket = b.bucket AND a.rnk < b.rnk
        WHERE {_COS} >= 0.2
    )
    SELECT CAST(e.label AS BIGINT) AS label,
           count(*) AS n_vecs,
           CAST(count(DISTINCT e.bucket) AS BIGINT) AS n_clusters,
           CAST(count(r.vec_id) AS BIGINT) AS n_removed,
           round(count(r.vec_id) / count(*), 4) AS prune_rate,
           bit_xor(CASE WHEN r.vec_id IS NULL
                   THEN ('0x' || substr(md5(CAST(e.vec_id AS VARCHAR)), 1, 12))::BIGINT
                   END) AS keep_hash
    FROM e LEFT JOIN removed r USING (vec_id)
    GROUP BY e.label
    """,
    tags=("dedup", "vectors", "semantic"),
)
def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic pruning (Abbas et al. 2023): cluster the
    embedding space, and within each cluster remove the more-redundant
    member of every pair whose cosine exceeds the threshold, keeping
    the member FARTHEST from the cluster centroid (low
    centroid-similarity = the informative outlier). Differs from
    q_dedup_embedding (which REPORTS nearest-neighbor pairs): this is
    the pruning POLICY — output is the per-label keep-list fingerprint
    and prune rate of the corpus that survives. Removal is the
    dominance form of the paper's rule: v is removed iff some
    keep-worthier u in its cluster (rank = centroid-cos ascending,
    vec_id tiebreak; ranks are integers so the pair join never
    compares floats cross-engine) is >= tau-similar to v.

    Scale shape: clusters are (label x LSH bucket) — the granularity
    knob that bounds the quadratic exactly like SemDeDup's k-means k
    (pairs = sum over clusters of |cluster|^2, never corpus^2; the
    plan gate asserts no cartesian). Centroids are a posexplode +
    partial-agg mean (|clusters| x 64 rows), broadcast back; the rank
    window partitions per cluster; the pair join keys on the cluster.
    At 100 TB: raise LSH planes / use finer IVF cells to keep clusters
    task-sized — policy and plan shape unchanged."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "bucket", lsh_bucket_pandas(F.col("embedding"), EMB_DIM)
    )
    cent = (
        emb.select("label", "bucket", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", "bucket", "pos")
        .agg(F.avg(F.col("val").cast("double")).alias("mv"))
        .groupBy("label", "bucket")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mv"))),
                lambda s: s["mv"],
            ).alias("c")
        )
    )
    cosc = dot(F.col("embedding"), F.col("c")) / (
        l2_norm(F.col("embedding")) * l2_norm(F.col("c"))
    )
    # arithmetic half-up rank key (floor(x*1e6 + 0.5), the shared
    # q_ts_resample_linear pattern): Spark round() is HALF_UP, DuckDB
    # half-even — an exact 6-dp midpoint would flip the keep-rank and
    # change keep_hash/n_removed cross-engine (ADVICE r07)
    w = Window.partitionBy("label", "bucket").orderBy(
        F.floor(cosc * 1e6 + 0.5).asc(), F.col("vec_id").asc()
    )
    scored = (
        emb.join(F.broadcast(cent), ["label", "bucket"])
        .withColumn("rnk", F.row_number().over(w))
        .select(
            "label",
            "bucket",
            "vec_id",
            "embedding",
            "rnk",
            l2_norm(F.col("embedding")).alias("nn"),
        )
    )
    a, b = scored.alias("a"), scored.alias("b")
    sim = dot(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a.nn") * F.col("b.nn")
    )
    removed = (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.rnk") < F.col("b.rnk")),
        )
        .filter(sim >= 0.2)
        .select(F.col("b.vec_id").alias("vec_id"))
        .distinct()
        .withColumn("is_removed", F.lit(1))
    )
    from ripple_server_spark.functions.scalar import H48_SQL

    keep_fp = H48_SQL.format(expr="cast(vec_id as string)")
    return (
        emb.join(removed, "vec_id", "left")
        .groupBy(F.col("label").cast("bigint").alias("label"))
        .agg(
            F.count("*").alias("n_vecs"),
            F.countDistinct("bucket").cast("bigint").alias("n_clusters"),
            F.count("is_removed").alias("n_removed"),
            F.round(F.count("is_removed") / F.count(F.lit(1)), 4).alias("prune_rate"),
            F.expr(f"bit_xor(CASE WHEN is_removed IS NULL THEN {keep_fp} END)").alias(
                "keep_hash"
            ),
        )
    )


# --------------------------------------------------------------------------
# Similarity search
# --------------------------------------------------------------------------


def _cosine_topk(spark: SparkSession, sf_dir: str, use_pandas: bool) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("qe"),
        l2_norm(F.col("embedding")).alias("qn"),
    )
    if use_pandas:
        from ripple_server_spark.operators.similarity import cosine_topk_scan_arrow

        return cosine_topk_scan_arrow(emb, q, k=5)
    else:
        # Norms are computed once per row *below* the join (a Join blocks
        # projection inlining), so each pair evaluates a single dot fold
        # instead of re-deriving both norms — the difference between
        # O(pairs) and O(6·pairs) interpreted folds.
        c = emb.select(
            "vec_id", "embedding", l2_norm(F.col("embedding")).alias("nn")
        )
        pairs = F.broadcast(q).join(c, F.col("q_id") != F.col("vec_id")).select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            (dot(F.col("qe"), F.col("embedding")) / (F.col("qn") * F.col("nn"))).alias("sim"),
        )
    # arithmetic half-up rank key (floor(x*1e6 + 0.5) — monotone in sim,
    # identical on both engines): Spark round() is HALF_UP, DuckDB
    # half-even, so an exact 6-dp midpoint cosine would flip the rank
    # cross-engine (the q_dedup_semantic fix, ADVICE r07 / VERDICT r08)
    w = Window.partitionBy("q_id").orderBy(
        F.desc(F.floor(F.col("sim") * 1e6 + F.lit(0.5))), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("q_id", "neighbor_id", F.round("sim", 4).alias("sim"))
    )


_TOPK_ORACLE = f"""
    SELECT q_id, neighbor_id, sim FROM (
        SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id,
               round({_COS}, 4) AS sim,
               row_number() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY floor({_COS} * 1e6 + 0.5) DESC, b.vec_id) AS rn
        FROM embeddings a JOIN embeddings b ON a.vec_id < 10 AND a.vec_id <> b.vec_id
    ) WHERE rn <= 5
"""


@query("q_similarity_topk", oracle=_TOPK_ORACLE, tags=("vectors", "ann"))
def q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for 10 query vectors — the exact ANN
    baseline. Queries broadcast; corpus side streams (no shuffle of the
    big side); per-query heap via window rank. Pure-SQL kernel."""
    return _cosine_topk(spark, sf_dir, use_pandas=False)


@query(
    "q_similarity_topk_pandas", oracle=_TOPK_ORACLE, bench=True, tags=("vectors", "ann", "arrow")
)
def q_similarity_topk_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same query through the Arrow/numpy Pandas-UDF kernel — the
    100 TB throughput path (vectorized BLAS, ~10-100x the SQL fold).
    Shares the SQL oracle: results must agree to 4 dp."""
    return _cosine_topk(spark, sf_dir, use_pandas=True)


_LSH_BUCKET_SQL = f"""
    WITH {_LSH_CTES}
    SELECT vec_id, bucket FROM buckets
"""


@query("q_similarity_lsh_bucket", oracle=_LSH_BUCKET_SQL, tags=("vectors", "ann", "lsh"))
def q_similarity_lsh_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane (Rademacher/md5) LSH bucket per vector: 8 sign
    bits -> 256 buckets. This is the ANN scale path's partitioner: at
    100 TB, search runs per-bucket (shuffle on bucket, ~n/256 each).
    Codegen-expr kernel here (the engine-portable definition); heavy
    corpora use the numpy kernel (lsh_bucket_pandas) — same planes and
    float64 math, but summation order differs, so projections within
    ~1 ulp of 0 may bucket differently (see its docstring)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select("vec_id", lsh_bucket_expr(F.col("embedding"), EMB_DIM).alias("bucket"))


@query(
    "q_ann_lsh_topk",
    oracle=f"""
    WITH {_LSH_CTES},
    e AS (SELECT b.bucket, emb.* FROM embeddings emb JOIN buckets b USING (vec_id)),
    probes AS (
        SELECT e.*,
               CASE WHEN j < 0 THEN bucket
                    ELSE substr(bucket, 1, j) ||
                         (CASE WHEN substr(bucket, j + 1, 1) = '1'
                               THEN '0' ELSE '1' END) ||
                         substr(bucket, j + 2)
               END AS probe
        FROM e CROSS JOIN (SELECT unnest(range(-1, 8)) AS j) js
        WHERE e.vec_id < 20
    ),
    pairs AS (
        SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id,
               round({_COS}, 4) AS sim,
               row_number() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY floor({_COS} * 1e6 + 0.5) DESC, b.vec_id) AS rn
        FROM probes a JOIN e b
          ON a.probe = b.bucket AND a.vec_id <> b.vec_id
    )
    SELECT q_id, neighbor_id, sim FROM pairs WHERE rn <= 3
    """,
    bench=True,
    tags=("vectors", "ann", "lsh"),
)
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN: multi-probe LSH top-3 (Lv et al., VLDB'07) — each
    query scans its own bucket plus the 8 Hamming-distance-1 buckets, so
    candidates are ~9n/256 per query instead of n. Only the 20-row query
    side explodes into probes; the corpus keeps one bucket per vector and
    the join stays bucket-pruned. Recall on weakly-similar corpora is
    still collision-bound (use IVF for that regime — q_ann_ivf_topk);
    the planted-strong-neighbor recall contract is pytest-checked.
    Determinism via rounded-sim + id tie-break."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id",
        "embedding",
        lsh_bucket_pandas(F.col("embedding"), EMB_DIM).alias("bucket"),
        l2_norm(F.col("embedding")).alias("nn"),
    )
    # the exploded query side is queries x (n_planes+1) rows — always tiny;
    # broadcasting it keeps the corpus scan shuffle-free at any corpus size
    a = F.broadcast(
        e.filter(F.col("vec_id") < 20).select(
            "vec_id",
            "embedding",
            "nn",
            F.explode(lsh_probe_buckets(F.col("bucket"))).alias("probe"),
        )
    ).alias("a")
    b = e.alias("b")
    sim = dot(F.col("a.embedding"), F.col("b.embedding")) / (F.col("a.nn") * F.col("b.nn"))
    pairs = (
        a.join(
            b,
            (F.col("a.probe") == F.col("b.bucket"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("q_id"),
            F.col("b.vec_id").alias("neighbor_id"),
            sim.alias("sim"),
        )
    )
    # half-up rank key, not round(sim, 6): see _cosine_topk's note
    w = Window.partitionBy("q_id").orderBy(
        F.desc(F.floor(F.col("sim") * 1e6 + F.lit(0.5))), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("q_id", "neighbor_id", F.round("sim", 4).alias("sim"))
    )


@query(
    "q_ann_ivf_topk",
    # The IVF result itself is estimator-specific (centroid-space
    # prune), so the driver-checkable contract is the RECALL ASSERTION:
    # Spark computes IVF top-3 AND exact top-3 and emits a one-row
    # summary whose recall_ok bit requires aggregate recall@3 >= 0.7
    # (with-ties definition), the corpus-aware expected row count per
    # query (min(3, corpus-1)), and sim agreement on id-coinciding
    # hits — see operators/similarity.ann_recall_audit. The oracle
    # states the expected outcome in SQL; any recall / cardinality /
    # sim degradation flips a value and fails the hash.
    oracle=_ANN_AUDIT_ORACLE_K3,
    bench=True,
    tags=("vectors", "ann", "ivf"),
)
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat ANN with an in-plan recall audit: top-3 for 20 query
    vectors probing 12 of 32 centroid cells (~37% of the corpus
    matmul'd, one pass, no corpus shuffle), joined against the exact
    brute-force top-3 to assert recall@3 >= 0.7 and per-hit sim
    agreement. The synthetic corpus is isotropic — the IVF worst case —
    hence the wide nprobe; clustered real corpora cut scan fraction
    much harder at the same recall. Deterministic: strided training
    sample + fixed Lloyd init, so reruns are stable. The same bound is
    pytest-checked per-query in tests/test_kernels.py."""
    from ripple_server_spark.operators.similarity import (
        ann_recall_audit,
        ivf_topk_with_exact,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
    )
    # fused scan (r12): IVF candidates and the brute-force audit
    # baseline come from ONE corpus pass instead of two, and the
    # flat-cutoff driver count doubles as the audit's corpus size —
    # see ivf_topk_with_exact; results are bit-identical (shared batch
    # bodies, same _global_topk cuts).
    ivf, exact, nc, qids, caches = ivf_topk_with_exact(
        emb, queries, k=3, nlist=32, nprobe=12
    )
    exact = exact.select("q_id", "neighbor_id", F.col("sim").alias("exact_sim"))
    return ann_recall_audit(
        queries, ivf, exact, emb, k=3, nc=nc, q_ids=qids, caches=caches
    )


@query(
    "q_array_embedding_norm",
    oracle="""
    SELECT vec_id,
           round(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm,
           CAST(label AS BIGINT) AS label
    FROM embeddings
    """,
    tags=("vectors",),
)
def q_array_embedding_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array math in codegen: L2 norm via fold — no Python, no UDF."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.round(l2_norm(F.col("embedding")), 4).alias("l2_norm"),
        F.col("label").cast("bigint").alias("label"),
    )


# --------------------------------------------------------------------------
# Text analysis
# --------------------------------------------------------------------------


@query(
    "q_text_token_counts",
    oracle="""
    WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)
    SELECT doc_id,
           len(w) AS n_tokens,
           len(list_distinct(w)) AS n_distinct_tokens,
           length(text) AS n_chars_measured,
           round(list_sum(list_transform(w, x -> length(x)))::DOUBLE / len(w), 4) AS avg_token_len
    FROM t
    """,
    bench=True,
    tags=("text",),
)
def q_text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting — whitespace tokenizer, all codegen."""
    return tx.token_stats(load_table(spark, sf_dir, "documents"))


@query(
    "q_text_bpe_tokens",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, ' ?\p{L}+| ?\p{N}+| ?[^\p{L}\p{N} ]+')) AS BIGINT) AS n_bpe,
           CAST(len(regexp_extract_all(text, ' ?\p{N}+')) AS BIGINT) AS n_num_runs
    FROM documents
    """,
    tags=("text", "tokenize"),
)
def q_text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex pretokenization counts per document (letter runs /
    digit runs / punctuation runs, optional leading space — the GPT-2
    pretokenizer shape without lookahead). One regexp pass per row in
    codegen; no explode, no shuffle beyond none at all."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(tx.bpe_tokens(F.col("text"))).alias("n_bpe"),
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(r" ?\p{N}+"), F.lit(0))
        ).alias("n_num_runs"),
    )


@query(
    "q_text_lang_scores",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    s AS (
        SELECT doc_id,
          round(len(list_filter(w, x -> x IN ('the','a','of','and','is')))::DOUBLE / len(w), 4) AS score_en,
          round(len(list_filter(w, x -> x IN ('el','la','de','que','y')))::DOUBLE / len(w), 4) AS score_es,
          round(len(list_filter(w, x -> x IN ('le','la','de','et','un')))::DOUBLE / len(w), 4) AS score_fr,
          round(len(list_filter(w, x -> x IN ('der','die','das','und','ist')))::DOUBLE / len(w), 4) AS score_de,
          round(len(list_filter(w, x -> x IN ('的','是','了','在','和')))::DOUBLE / len(w), 4) AS score_zh
        FROM t
    )
    SELECT doc_id, score_en, score_es, score_fr, score_de, score_zh,
           list_sort([
               {'neg': -score_en, 'lang': 'en'},
               {'neg': -score_es, 'lang': 'es'},
               {'neg': -score_fr, 'lang': 'fr'},
               {'neg': -score_de, 'lang': 'de'},
               {'neg': -score_zh, 'lang': 'zh'}
           ])[1].lang AS pred_lang
    FROM s
    """,
    tags=("text",),
)
def q_text_lang_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-lexicon language scores + deterministic argmax."""
    return tx.lang_scores(load_table(spark, sf_dir, "documents"))


@query(
    "q_text_quality",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    SELECT doc_id,
           len(w) AS n_tokens,
           round(len(list_distinct(w))::DOUBLE / len(w), 4) AS distinct_ratio,
           round(len(list_filter(w, x -> x IN ('the','a','of','and','is')))::DOUBLE / len(w), 4) AS stop_ratio,
           (len(w) >= 20
            AND len(list_distinct(w))::DOUBLE / len(w) >= 0.3
            AND len(list_filter(w, x -> x IN ('the','a','of','and','is')))::DOUBLE / len(w) <= 0.5) AS keep
    FROM t
    """,
    tags=("text",),
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length, lexical diversity, stopword ratio."""
    return tx.quality_scores(load_table(spark, sf_dir, "documents"))


@query(
    "q_doc_fingerprint",
    oracle=f"""
    WITH {_SH_CTE},
    mins AS (SELECT doc_id, min(md5(shingle)) AS min_shingle_fp FROM sh GROUP BY doc_id)
    SELECT t.doc_id,
           md5(translate(trim(d.text),
                         'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                         'abcdefghijklmnopqrstuvwxyz')) AS content_fp,
           m.min_shingle_fp
    FROM t
    JOIN documents d USING (doc_id)
    LEFT JOIN mins m USING (doc_id)
    """,
    tags=("text", "dedup"),
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content + min-shingle fingerprints (1-perm MinHash prefilter)."""
    return tx.fingerprint(load_table(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# Multimodal
# --------------------------------------------------------------------------


@query(
    "q_multimodal_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS checksum
    FROM documents
    """,
    tags=("multimodal", "stub-codec"),
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary column plumbing: payload byte length + checksum.
    (The fixtures carry no real media; text bytes stand in. The decode/
    feature-extract stage lives in multimodal.py as a mapInPandas
    pipeline over binary columns — pytest-covered.)"""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.octet_length("text").cast("bigint").alias("n_bytes"),
        F.md5("text").alias("checksum"),
    )


@query(
    "q_multimodal_frames",
    oracle="""
    SELECT doc_id, CAST(k AS BIGINT) AS frame_idx,
           md5(text || ':' || k) AS frame_checksum,
           CAST(k * 1000 AS BIGINT) AS ts_ms
    FROM documents CROSS JOIN (SELECT unnest(range(0, 4)) AS k)
    """,
    tags=("multimodal", "udf", "arrow", "stub-codec"),
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing: each binary payload fans out to 4
    frame rows through a generator-form mapInPandas kernel (1->N, no
    shuffle, constant memory). The stub frame digest is md5-derived so
    the oracle recomputes it exactly — the full UDF path (Arrow batch
    in, exploded frame in Python, Arrow out) is hash-checked."""
    from ripple_server_spark import multimodal as mm

    return mm.sample_frames(load_table(spark, sf_dir, "documents"), n_frames=4)


@query(
    "q_multimodal_embed",
    oracle="""
    SELECT doc_id,
           round(sqrt(list_sum(list_transform(range(1, 17),
                 i -> pow((ord(substr(md5(text), i, 1)) - 100.0) / 10.0, 2)))), 4)
             AS l2,
           CAST(16 AS BIGINT) AS dim
    FROM documents
    """,
    tags=("multimodal", "udf", "arrow", "vectors", "stub-codec"),
)
def q_multimodal_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media feature-extraction plumbing: payload -> dense embedding via
    mapInPandas (where a model forward pass would run), then JVM-side
    vector math over the result — the handoff point into the
    similarity/ANN operators. Stub features are md5-hex-derived so the
    oracle reproduces the exact vector."""
    from ripple_server_spark import multimodal as mm

    emb = mm.embed_documents(load_table(spark, sf_dir, "documents"), dim=16)
    return emb.select(
        "doc_id",
        F.round(
            F.sqrt(F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x * x)), 4
        ).alias("l2"),
        F.lit(16).cast("bigint").alias("dim"),
    )


# --------------------------------------------------------------------------
# Corpus-aligned extras: time-series profile similarity (cf. PAPERS.md
# distributed time-series similarity search) + lexicon sentiment (cf.
# large-scale sentiment analysis on Spark)
# --------------------------------------------------------------------------

_HOURS = list(range(24))
_TS_DOT = """
    list_sum(list_transform(range(1, 25),
             i -> CAST(a.v[i] AS DOUBLE) * CAST(b.v[i] AS DOUBLE)))
"""
_TS_NORM = "sqrt(list_sum(list_transform({t}.v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"


@query(
    "q_timeseries_profile_topk",
    oracle=f"""
    WITH prof AS (
      SELECT user_id,
             [{", ".join(f"count(*) FILTER (extract(hour FROM ts) = {h})" for h in _HOURS)}] AS v
      FROM events GROUP BY user_id
    ),
    pairs AS (
      SELECT a.user_id AS q_user, b.user_id AS sim_user,
             round({_TS_DOT} / ({_TS_NORM.format(t='a')} * {_TS_NORM.format(t='b')}), 4) AS sim,
             row_number() OVER (
               PARTITION BY a.user_id
               ORDER BY floor({_TS_DOT} / ({_TS_NORM.format(t='a')} * {_TS_NORM.format(t='b')}) * 1e6 + 0.5) DESC,
                        b.user_id) AS rn
      FROM prof a JOIN prof b ON a.user_id < 5 AND a.user_id <> b.user_id
    )
    SELECT q_user, sim_user, sim FROM pairs WHERE rn <= 3
    """,
    tags=("timeseries", "vectors", "similarity"),
)
def q_timeseries_profile_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity search (PAPERS.md corpus): each user's
    activity becomes a 24-dim hour-of-day count profile (ONE shuffle,
    conditional counts — integer-exact, so cosines agree bit-for-bit
    across engines), then top-3 most-similar users per query user by
    cosine. The profile build is the scale step (O(users) output); the
    pairing reuses the broadcast-small-query-side pattern of the ANN
    kernels."""
    ev = load_table(spark, sf_dir, "events")
    prof = ev.groupBy("user_id").agg(
        F.array(
            *[
                F.count(F.when(F.hour("ts") == h, 1)).cast("double")
                for h in _HOURS
            ]
        ).alias("v")
    )
    a = prof.filter(F.col("user_id") < 5).alias("a")
    b = prof.alias("b")
    sim = dot(F.col("a.v"), F.col("b.v")) / (l2_norm(F.col("a.v")) * l2_norm(F.col("b.v")))
    # Broadcast the FILTERED query side (<= 5 rows) and stream the
    # full profile table — profiles are O(users) and must never be the
    # broadcast side of the nested-loop join.
    pairs = (
        F.broadcast(a).join(b, F.col("a.user_id") != F.col("b.user_id"))
        .select(
            F.col("a.user_id").alias("q_user"),
            F.col("b.user_id").alias("sim_user"),
            sim.alias("sim"),
        )
    )
    # half-up rank key, not round(sim, 6): see _cosine_topk's note
    w = Window.partitionBy("q_user").orderBy(
        F.desc(F.floor(F.col("sim") * 1e6 + F.lit(0.5))), F.asc("sim_user")
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("q_user", "sim_user", F.round("sim", 4).alias("sim"))
    )


_POS = ("fast", "big")
_NEG = ("slow", "small")


@query(
    "q_text_sentiment",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    SELECT doc_id,
           CAST(len(list_filter(w, x -> x IN {_POS})) AS BIGINT) AS n_pos,
           CAST(len(list_filter(w, x -> x IN {_NEG})) AS BIGINT) AS n_neg,
           round((len(list_filter(w, x -> x IN {_POS}))
                  - len(list_filter(w, x -> x IN {_NEG})))::DOUBLE / len(w), 4)
             AS polarity
    FROM t
    """,
    tags=("text", "sentiment"),
)
def q_text_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon sentiment scoring (PAPERS.md: large-scale sentiment on
    Spark): positive/negative token counts and a normalized polarity in
    [-1, 1], all codegen array ops — the shape for lexicon scoring at
    corpus scale (no shuffle at all; one pass over the text column)."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    n_pos = F.size(F.filter(w, lambda x: x.isin(*_POS)))
    n_neg = F.size(F.filter(w, lambda x: x.isin(*_NEG)))
    return docs.select(
        "doc_id",
        n_pos.cast("bigint").alias("n_pos"),
        n_neg.cast("bigint").alias("n_neg"),
        F.round((n_pos - n_neg) / F.size(w), 4).alias("polarity"),
    )


@query(
    "q_setsim_prefix_join",
    oracle=f"""
    WITH {_SH_CTE},
    inter AS (
      SELECT s1.doc_id AS doc_a, s2.doc_id AS doc_b, count(*) AS n_common
      FROM sh s1 JOIN sh s2 ON s2.shingle = s1.shingle AND s1.doc_id < s2.doc_id
      GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)
    SELECT i.doc_a, i.doc_b,
           round(i.n_common::DOUBLE / (na.n + nb.n - i.n_common), 4) AS jaccard
    FROM inter i
    JOIN sizes na ON na.doc_id = i.doc_a
    JOIN sizes nb ON nb.doc_id = i.doc_b
    WHERE i.n_common::DOUBLE / (na.n + nb.n - i.n_common) >= 0.5
    """,
    tags=("dedup", "similarity", "setsim"),
)
def q_setsim_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT all-pairs shingle-Jaccard >= 0.5 via prefix filtering
    (operators/dedup.py:setsim_join_prefix). The oracle computes ground
    truth through the full inverted index; the engine's prefix filter
    must reproduce it exactly — which also machine-checks the
    no-false-negative property of the prefix filter."""
    return dedup.setsim_join_prefix(load_table(spark, sf_dir, "documents"))


@query(
    "q_url_dedup",
    oracle=f"""
    WITH synth AS (
      SELECT doc_id, source,
             (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'https://' END)
             || (CASE WHEN doc_id % 3 = 0 THEN upper(source) ELSE source END)
             || '.Example.COM/doc/' || CAST(doc_id % 500 AS VARCHAR)
             || (CASE doc_id % 6
                   WHEN 0 THEN ''
                   WHEN 1 THEN '/'
                   WHEN 2 THEN '?utm_source=feed&utm_campaign=x'
                   WHEN 3 THEN '?id=keep&utm_medium=y#frag'
                   WHEN 4 THEN '?utm_ref=1&id=keep'
                   ELSE '?myutm_source=keep2&utm_x=1' END) AS url
      FROM documents
    ),
    c0 AS (
      SELECT doc_id, source,
             lower(regexp_extract(url, '(?i)^(https?://[^/?#]+)', 1)) AS head,
             regexp_replace(regexp_replace(url, '(?i)^https?://[^/?#]+', ''),
                            '#.*', '', 'g') AS t0
      FROM synth
    ),
    c1 AS (
      SELECT doc_id, source, head,
             regexp_replace(t0, '([?&])(utm_[a-z]+|fbclid)=[^&#]*',
                            '\\1', 'g') AS t1
      FROM c0
    ),
    c2 AS (
      SELECT doc_id, source, head,
             regexp_replace(regexp_replace(t1, '\\?&+', '?', 'g'),
                            '&&+', '&', 'g') AS t2
      FROM c1
    ),
    canon AS (
      SELECT doc_id, source,
             head || regexp_replace(regexp_replace(t2, '[?&]+$', '', 'g'),
                                    '/+$', '', 'g') AS canonical
      FROM c2
    ),
    kept AS (
      SELECT source, canonical, min(doc_id) AS keep_id, count(*) AS grp
      FROM canon GROUP BY source, canonical
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_canonical,
           CAST(sum(grp) AS BIGINT) AS n_urls,
           CAST(sum(grp) - count(*) AS BIGINT) AS n_removed,
           bit_xor(('0x' || substr(md5(CAST(keep_id AS VARCHAR)), 1, 12))::BIGINT)
               AS keep_hash
    FROM kept GROUP BY source
    """,
    tags=("dedup", "url", "pipeline", "text"),
)
def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup after canonicalization — the first dedup pass of
    a web-crawl pipeline (CCNet / RefinedWeb keep one page per
    canonical URL before any content-based dedup): scheme+host
    case-fold, fragment drop, tracking-parameter strip (utm_*,
    fbclid), separator cleanup, trailing-slash strip
    (functions/text.canonical_url — pure codegen regexps, no UDF),
    then keep the min doc_id per (source, canonical).

    URLs are synthesized deterministically from doc_id/source with the
    exact mess the canonicalizer must survive: mixed-case schemes and
    hosts, trailing slashes, tracking params leading/trailing a kept
    param, fragments, and a param whose NAME merely contains 'utm_'
    ('myutm_source', which an unanchored strip would mangle — the
    round-8 review catch) — so the oracle reproduces every byte.

    Scale: one groupBy on the canonical key (hash partial-agg); the
    canonicalization itself is a map-side codegen chain over the URL
    column — no shuffle added to whatever the dedup itself needs."""
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.when(F.col("doc_id") % 2 == 0, F.lit("HTTPS://")).otherwise(
            F.lit("https://")
        ),
        F.when(F.col("doc_id") % 3 == 0, F.upper("source")).otherwise(
            F.col("source")
        ),
        F.lit(".Example.COM/doc/"),
        (F.col("doc_id") % 500).cast("string"),
        F.when(F.col("doc_id") % 6 == 1, F.lit("/"))
        .when(F.col("doc_id") % 6 == 2, F.lit("?utm_source=feed&utm_campaign=x"))
        .when(F.col("doc_id") % 6 == 3, F.lit("?id=keep&utm_medium=y#frag"))
        .when(F.col("doc_id") % 6 == 4, F.lit("?utm_ref=1&id=keep"))
        .when(F.col("doc_id") % 6 == 5, F.lit("?myutm_source=keep2&utm_x=1"))
        .otherwise(F.lit("")),
    )
    canon = docs.select(
        "doc_id", "source", tx.canonical_url(url).alias("canonical")
    )
    kept = canon.groupBy("source", "canonical").agg(
        F.min("doc_id").alias("keep_id"), F.count("*").alias("grp")
    )
    return kept.groupBy("source").agg(
        F.count("*").alias("n_canonical"),
        F.sum("grp").cast("bigint").alias("n_urls"),
        (F.sum("grp") - F.count("*")).cast("bigint").alias("n_removed"),
        F.expr(xor_fingerprint48("cast(keep_id as string)")).alias("keep_hash"),
    )


@query(
    "q_image_dedup_dhash",
    oracle="""
    WITH docs AS (
      SELECT doc_id,
             CASE WHEN doc_id % 4 = 1 THEN doc_id - 1 ELSE doc_id END AS img_key,
             (doc_id % 4 = 1) AS variant
      FROM documents
    ),
    grid AS (
      SELECT r, c
      FROM (SELECT unnest(range(8)) AS r), (SELECT unnest(range(9)) AS c)
    ),
    px AS (
      SELECT d.doc_id, g.r, g.c,
             CASE WHEN d.variant AND g.r = 0 AND g.c = 0
                  THEN 255 - ('0x' || substr(md5(CAST(d.img_key AS VARCHAR)
                       || ':' || g.r || ':' || g.c), 1, 2))::INT
                  ELSE ('0x' || substr(md5(CAST(d.img_key AS VARCHAR)
                       || ':' || g.r || ':' || g.c), 1, 2))::INT END AS v
      FROM docs d CROSS JOIN grid g
    ),
    bits AS (
      SELECT a.doc_id, a.r, a.c,
             CASE WHEN a.v > b.v THEN 1 ELSE 0 END AS bit
      FROM px a JOIN px b ON b.doc_id = a.doc_id AND b.r = a.r AND b.c = a.c + 1
      WHERE a.c < 8
    ),
    bands AS (
      SELECT doc_id, r // 2 AS band,
             sum(CAST(bit AS BIGINT) << ((r % 2) * 8 + c)) AS bv
      FROM bits GROUP BY doc_id, r // 2
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
    ),
    ham AS (
      SELECT c.doc_a, c.doc_b,
             CAST(sum(bit_count(xor(ba.bv, bb.bv))) AS BIGINT) AS hamming
      FROM cand c
      JOIN bands ba ON ba.doc_id = c.doc_a
      JOIN bands bb ON bb.doc_id = c.doc_b AND bb.band = ba.band
      GROUP BY c.doc_a, c.doc_b
    )
    SELECT doc_a, doc_b, hamming FROM ham WHERE hamming <= 3
    """,
    tags=("dedup", "multimodal", "image", "phash"),
)
def q_image_dedup_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IMAGE near-dup via perceptual difference-hash — the visual
    counterpart of MinHash text dedup and the pass LAION-scale image
    corpora run before training (a one-pixel-edited repost must land
    next to its original, which byte/embedding dedup can miss). The
    pixels go through the engine's REAL codec chain — synthesized 9x8
    grayscale PNGs (every pixel md5-derived, so the oracle recomputes
    it exactly; every doc_id % 4 == 1 document is a planted one-pixel
    edit of its predecessor), encoded with encode_png, decoded with
    open_image inside the Arrow kernel — then dHash bands + banded
    candidate join + hamming <= 3 verification
    (multimodal.dhash_bands).

    Scale shape: hashing is a map-side Arrow pass (64 bits per image,
    whatever the image size); candidates come from equi-joins on
    (band, 16-bit value) — pigeonhole guarantees recall at hamming
    <= 3 with 4 bands — never an all-pairs compare; verification is
    bit_count(xor) on four ints per candidate. At 100 TB the band
    join is the only shuffle and its left side is 4 rows per image."""
    from ripple_server_spark import multimodal as mm

    docs = load_table(spark, sf_dir, "documents")
    bands_wide = mm.dhash_bands(mm.synth_gray_payloads(docs))
    long = bands_wide.select(
        "doc_id",
        F.posexplode(F.array("b0", "b1", "b2", "b3")).alias("band", "bv"),
    )
    a, b = long.alias("a"), long.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    ba = long.select(
        F.col("doc_id").alias("doc_a"), "band", F.col("bv").alias("bva")
    )
    bb = long.select(
        F.col("doc_id").alias("doc_b"), "band", F.col("bv").alias("bvb")
    )
    ham = (
        cand.join(ba, "doc_a")
        .join(bb, ["doc_b", "band"])
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum(F.bit_count(F.expr("bva ^ bvb"))).cast("bigint").alias("hamming")
        )
    )
    return ham.filter(F.col("hamming") <= 3)


@query(
    "q_video_dedup_dhash",
    oracle="""
    WITH docs AS (
      SELECT doc_id,
             CASE WHEN doc_id % 4 = 1 THEN doc_id - 1 ELSE doc_id END AS vid_key,
             (doc_id % 4 = 1) AS variant
      FROM documents
    ),
    frames AS (SELECT unnest([0, 2]) AS f),
    grid AS (
      SELECT r, c
      FROM (SELECT unnest(range(8)) AS r), (SELECT unnest(range(9)) AS c)
    ),
    px AS (
      SELECT d.doc_id, fr.f, g.r, g.c,
             CASE WHEN d.variant AND fr.f = 0 AND g.r = 0 AND g.c = 0
                  THEN 255 - ('0x' || substr(md5(CAST(d.vid_key AS VARCHAR)
                       || ':' || fr.f || ':' || g.r || ':' || g.c), 1, 2))::INT
                  ELSE ('0x' || substr(md5(CAST(d.vid_key AS VARCHAR)
                       || ':' || fr.f || ':' || g.r || ':' || g.c), 1, 2))::INT END AS v
      FROM docs d CROSS JOIN frames fr CROSS JOIN grid g
    ),
    bits AS (
      SELECT a.doc_id, a.f, a.r, a.c,
             CASE WHEN a.v > b.v THEN 1 ELSE 0 END AS bit
      FROM px a JOIN px b
        ON b.doc_id = a.doc_id AND b.f = a.f AND b.r = a.r AND b.c = a.c + 1
      WHERE a.c < 8
    ),
    bands AS (
      SELECT doc_id, f, r // 2 AS band,
             sum(CAST(bit AS BIGINT) << ((r % 2) * 8 + c)) AS bv
      FROM bits GROUP BY doc_id, f, r // 2
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.f = b.f AND a.band = b.band AND a.bv = b.bv
       AND a.doc_id < b.doc_id
    ),
    ham AS (
      SELECT c.doc_a, c.doc_b, ba.f,
             CAST(sum(bit_count(xor(ba.bv, bb.bv))) AS BIGINT) AS h
      FROM cand c
      JOIN bands ba ON ba.doc_id = c.doc_a
      JOIN bands bb ON bb.doc_id = c.doc_b AND bb.f = ba.f AND bb.band = ba.band
      GROUP BY c.doc_a, c.doc_b, ba.f
    )
    SELECT doc_a, doc_b, hamming_total FROM (
      SELECT doc_a, doc_b,
             sum(CASE WHEN h <= 3 THEN 1 ELSE 0 END) AS n_close,
             CAST(sum(h) AS BIGINT) AS hamming_total
      FROM ham GROUP BY doc_a, doc_b
    ) WHERE n_close = 2
    """,
    tags=("dedup", "multimodal", "video", "phash"),
)
def q_video_dedup_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VIDEO near-dup via sampled-frame perceptual hashing — the clip
    counterpart of q_image_dedup_dhash and the pass LAION-video-style
    pipelines run before training (a repost with one edited frame must
    land next to its original). Composes the two existing kernels with
    zero new hash surface: the y4m frame sampler (even stride, decodes
    ONLY the sampled lumas — k rasters read of N) feeds the shared
    dHash band contract (multimodal._dhash_band_values), then a
    (frame_idx, band, value) equi-join generates candidates and a
    per-frame bit_count(xor) verify keeps pairs where EVERY sampled
    frame is within hamming 3.

    Pixels go through the engine's REAL codec chain: synthesized
    4-frame 9x8 grayscale YUV4MPEG2 (every pixel md5-derived so the
    oracle recomputes it exactly; every doc_id % 4 == 1 video is a
    planted repost of its predecessor with one pixel of frame 0
    edited), encoded with encode_y4m, decoded with open_video inside
    the Arrow kernel.

    Scale shape: hashing is a map-side Arrow pass emitting 2 frames x
    4 bands = 8 rows of 16-bit values per video REGARDLESS of clip
    length or resolution; candidates come from equi-joins on
    (frame_idx, band, value) — pigeonhole gives frame-wise recall at
    hamming <= 3 — never an all-pairs compare; verification is
    bit_count(xor) on 8 ints per candidate pair. At 100 TB the band
    join is the only shuffle and its input is 8 rows per video, so it
    scales with the CATALOG, never with pixel data."""
    from ripple_server_spark import multimodal as mm

    docs = load_table(spark, sf_dir, "documents")
    bands_wide = mm.video_dhash_bands(
        mm.synth_gray_video_payloads(docs, n_frames=4), n_sample=2
    )
    long = bands_wide.select(
        "doc_id",
        "frame_idx",
        F.posexplode(F.array("b0", "b1", "b2", "b3")).alias("band", "bv"),
    )
    a, b = long.alias("a"), long.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.frame_idx") == F.col("b.frame_idx"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    ba = long.select(
        F.col("doc_id").alias("doc_a"), "frame_idx", "band", F.col("bv").alias("bva")
    )
    bb = long.select(
        F.col("doc_id").alias("doc_b"), "frame_idx", "band", F.col("bv").alias("bvb")
    )
    per_frame = (
        cand.join(ba, "doc_a")
        .join(bb, ["doc_b", "frame_idx", "band"])
        .groupBy("doc_a", "doc_b", "frame_idx")
        .agg(F.sum(F.bit_count(F.expr("bva ^ bvb"))).alias("h"))
    )
    return (
        per_frame.groupBy("doc_a", "doc_b")
        .agg(
            F.sum(F.when(F.col("h") <= 3, 1).otherwise(0)).alias("n_close"),
            F.sum("h").cast("bigint").alias("hamming_total"),
        )
        .filter(F.col("n_close") == 2)
        .select("doc_a", "doc_b", "hamming_total")
    )


@query(
    "q_audio_energy_windows",
    oracle="""
    WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 600),
    idx AS (SELECT doc_id, unnest(range(800)) AS i FROM d),
    s AS (
      SELECT doc_id, i // 100 AS win,
             ('0x' || substr(md5('a:' || CAST(doc_id AS VARCHAR) || ':'
                  || CAST(i AS VARCHAR)), 1, 4))::BIGINT - 32768 AS v
      FROM idx
    )
    SELECT doc_id, CAST(win AS BIGINT) AS win,
           CAST(sum(v * v) AS BIGINT) AS energy_sq
    FROM s GROUP BY doc_id, win
    """,
    tags=("multimodal", "audio", "udf", "arrow"),
)
def q_audio_energy_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUDIO through the engine — the third modality's real decode
    path (round 8; images and video already had in-container codecs):
    deterministic 16-bit mono WAV payloads (every PCM sample
    md5-derived, so the oracle recomputes it) are ENCODED with the
    engine's RIFF writer, DECODED with the numpy WAV parser inside the
    Arrow kernel, and fingerprinted as 8 windowed integer
    energy sums (multimodal.audio_energy_windows) — the loudness
    profile audio dedup/quality filters key on. Integer sum-of-squares
    keeps the feature EXACT cross-engine (floating RMS differs in the
    last ulp); oracle equality therefore proves the whole
    encode -> decode chain is sample-lossless AND the feature math
    matches.

    Scale: synth + hash are map-side Arrow passes (1 -> 8 fan-out, no
    shuffle); the per-doc cost is decode + one integer reduction —
    independent of corpus size per row."""
    from ripple_server_spark import multimodal as mm

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 600)
    return mm.audio_energy_windows(mm.synth_audio_payloads(docs), n_windows=8)


@query(
    "q_audio_dedup_fingerprint",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             CASE WHEN doc_id % 4 = 1 THEN doc_id - 1 ELSE doc_id END AS akey,
             (doc_id % 4 = 1) AS variant
      FROM documents
    ),
    idx AS (SELECT doc_id, akey, variant, unnest(range(800)) AS i FROM d),
    s AS (
      SELECT doc_id, i // 100 AS win,
             CASE WHEN variant AND i < 100
                  THEN ('0x' || substr(md5('e:' || CAST(akey AS VARCHAR) || ':'
                       || CAST(i AS VARCHAR)), 1, 4))::BIGINT - 32768
                  ELSE ('0x' || substr(md5('a:' || CAST(akey AS VARCHAR) || ':'
                       || CAST(i AS VARCHAR)), 1, 4))::BIGINT - 32768 END AS v
      FROM idx
    ),
    sig AS (
      SELECT doc_id, CAST(win AS BIGINT) AS win,
             CAST(sum(v * v) AS BIGINT) AS e
      FROM s GROUP BY doc_id, win
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sig a JOIN sig b
        ON a.win = b.win AND a.e = b.e AND a.doc_id < b.doc_id
    ),
    eq AS (
      SELECT c.doc_a, c.doc_b,
             CAST(sum(CASE WHEN sa.e = sb.e THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_equal_windows
      FROM cand c
      JOIN sig sa ON sa.doc_id = c.doc_a
      JOIN sig sb ON sb.doc_id = c.doc_b AND sb.win = sa.win
      GROUP BY c.doc_a, c.doc_b
    )
    SELECT doc_a, doc_b, n_equal_windows FROM eq WHERE n_equal_windows >= 7
    """,
    tags=("dedup", "multimodal", "audio", "fingerprint"),
)
def q_audio_dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUDIO near-dup via windowed-energy fingerprinting — the audio
    leg of the modality dedup square (text/URL/image/video already
    have dedup queries; audio had only the energy feature): a
    re-uploaded clip with an edited intro must land next to its
    original, which byte hashing misses. Every payload goes through
    the engine's REAL codec chain — synthesized 800-sample 16-bit WAVs
    (every PCM sample md5-derived so the oracle recomputes it; every
    doc_id % 4 == 1 clip is a planted repost of its predecessor with
    the first window's samples redrawn), encoded with the RIFF writer,
    decoded with the numpy WAV parser inside the Arrow kernel — then
    the 8-window INTEGER energy signature (audio_energy_windows),
    (win, energy) equi-join candidates, and a per-pair
    equal-window count keeping pairs that agree on >= 7 of 8 windows.

    Integer energies make the whole pipeline exact cross-engine, and
    pigeonhole gives recall: a pair differing in at most one window
    shares at least 7 exact (win, energy) keys.

    Scale shape: the signature is 8 integers per clip REGARDLESS of
    duration or sample rate (decode + one integer reduction,
    map-side); candidates come from equi-joins on (win, 64-bit
    energy) — essentially collision-free keys, so candidate volume
    tracks true duplicates; verification is 8 integer comparisons per
    pair. At 100 TB the join input is 8 rows per clip: it scales with
    the catalog, never with waveform data."""
    from ripple_server_spark import multimodal as mm

    # no doc cap (unlike q_audio_energy_windows, whose oracle cost is
    # bounded for the driver): dedup must scale with the corpus, and
    # the scale experiments replicate documents past any fixed id
    docs = load_table(spark, sf_dir, "documents")
    sig = mm.audio_energy_windows(
        mm.synth_audio_payloads(docs, plant_dups=True), n_windows=8
    )
    a, b = sig.alias("a"), sig.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.win") == F.col("b.win"))
            & (F.col("a.energy_sq") == F.col("b.energy_sq"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sa = sig.select(
        F.col("doc_id").alias("doc_a"), "win", F.col("energy_sq").alias("ea")
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"), "win", F.col("energy_sq").alias("eb")
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "win"])
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum(F.when(F.col("ea") == F.col("eb"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_equal_windows")
        )
        .filter(F.col("n_equal_windows") >= 7)
    )


@query(
    "q_audio_dedup_flac",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             CASE WHEN doc_id % 4 = 1 THEN doc_id - 1 ELSE doc_id END AS akey,
             (doc_id % 4 = 1) AS variant
      FROM documents
    ),
    idx AS (SELECT doc_id, akey, variant, unnest(range(800)) AS i FROM d),
    s AS (
      SELECT doc_id, i // 100 AS win,
             CASE WHEN variant AND i < 100
                  THEN ('0x' || substr(md5('e:' || CAST(akey AS VARCHAR) || ':'
                       || CAST(i AS VARCHAR)), 1, 4))::BIGINT - 32768
                  ELSE ('0x' || substr(md5('a:' || CAST(akey AS VARCHAR) || ':'
                       || CAST(i AS VARCHAR)), 1, 4))::BIGINT - 32768 END AS v
      FROM idx
    ),
    sig AS (
      SELECT doc_id, CAST(win AS BIGINT) AS win,
             CAST(sum(v * v) AS BIGINT) AS e
      FROM s GROUP BY doc_id, win
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sig a JOIN sig b
        ON a.win = b.win AND a.e = b.e AND a.doc_id < b.doc_id
    ),
    eq AS (
      SELECT c.doc_a, c.doc_b,
             CAST(sum(CASE WHEN sa.e = sb.e THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_equal_windows
      FROM cand c
      JOIN sig sa ON sa.doc_id = c.doc_a
      JOIN sig sb ON sb.doc_id = c.doc_b AND sb.win = sa.win
      GROUP BY c.doc_a, c.doc_b
    )
    SELECT doc_a, doc_b, n_equal_windows FROM eq WHERE n_equal_windows >= 7
    """,
    tags=("dedup", "multimodal", "audio", "flac", "fingerprint"),
)
def q_audio_dedup_flac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FLAC arm of audio near-dup (round 10): the SAME pipeline as
    q_audio_dedup_fingerprint — md5-derived PCM, planted reposts with
    an edited intro, 8-window integer energy signature, (win, energy)
    equi-join candidates, >= 7-of-8 verify — but every payload is
    ENCODED with the engine's compressing FLAC encoder and DECODED by
    the full RFC 9639 parser (codecs_flac.py) inside the Arrow kernel.
    FLAC is lossless, so the decoded PCM and every downstream integer
    are bit-identical to the WAV arm and the oracle is reused
    verbatim: a mismatch here localizes to the FLAC codec itself
    (Rice coding, FIXED prediction, framing, MD5), making this the
    driver-checked correctness row for the round-10 codec.

    Scale shape: identical to the WAV arm (8 integers per clip into
    the join, decode cost map-side); FLAC payloads are smaller at
    rest, which at 100 TB is the point of accepting the format."""
    from ripple_server_spark import multimodal as mm

    docs = load_table(spark, sf_dir, "documents")
    sig = mm.audio_energy_windows(
        mm.synth_audio_payloads(docs, plant_dups=True, codec="flac"),
        n_windows=8,
    )
    a, b = sig.alias("a"), sig.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.win") == F.col("b.win"))
            & (F.col("a.energy_sq") == F.col("b.energy_sq"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sa = sig.select(
        F.col("doc_id").alias("doc_a"), "win", F.col("energy_sq").alias("ea")
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"), "win", F.col("energy_sq").alias("eb")
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "win"])
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum(F.when(F.col("ea") == F.col("eb"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_equal_windows")
        )
        .filter(F.col("n_equal_windows") >= 7)
    )
