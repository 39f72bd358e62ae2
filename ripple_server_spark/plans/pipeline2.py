"""Round-2 LLM-training-data-pipeline queries: chunking, sequence
packing, mixture weights, embedding quantization, tf-idf keywords.

These are the preprocessing stages between a raw document corpus and a
training run (no reference analog — the reference hands back opaque
bytes, `internal/broker/consumer/server/core.go:52`; this layer is the
engine's own value-add, same family as plans/extensions.py).

Cross-engine conventions (registry docstring): token = whitespace
split; all ranks use rounded scores + deterministic tie-breaks; float
rounding at result edges; quantization uses floor(x/scale + 0.5)
explicitly in BOTH engines so banker's-rounding differences cannot
appear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ripple_server_spark.catalog import load_table
from ripple_server_spark.plans.registry import query

CHUNK_TOKENS = 50
CHUNK_STRIDE = 40  # 10-token overlap
PACK_TARGET = 512  # context-window token budget


@query(
    "q_text_chunking",
    bench=True,
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w, len(string_split(text, ' ')) AS n
      FROM documents
    ),
    starts AS (
      SELECT doc_id, w, n, unnest(range(0, n, {CHUNK_STRIDE})) AS s
      FROM toks
    )
    SELECT doc_id,
           CAST(s / {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
           CAST(least({CHUNK_TOKENS}, n - s) AS BIGINT) AS chunk_tokens,
           md5(array_to_string(w[s + 1 : s + {CHUNK_TOKENS}], ' ')) AS chunk_hash
    FROM starts
    """,
    tags=("text", "pipeline", "chunking"),
)
def q_text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG/pretraining chunker: overlapping {50-token, stride-40}
    windows per document, one output row per chunk with a content hash
    (the hash proves the exact chunk text cross-engine without hauling
    chunk bodies through the result).

    Scale: explode of per-doc start offsets — ~n_tokens/stride rows per
    doc, no shuffle at all until a downstream groupBy; all codegen."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.split(F.col("text"), " ").alias("w"),
        F.size(F.split(F.col("text"), " ")).alias("n"),
    )
    starts = toks.select(
        "doc_id",
        "w",
        "n",
        F.explode(
            F.sequence(F.lit(0), F.col("n") - 1, F.lit(CHUNK_STRIDE))
        ).alias("s"),
    )
    return starts.select(
        "doc_id",
        (F.col("s") / CHUNK_STRIDE).cast("bigint").alias("chunk_idx"),
        F.least(F.lit(CHUNK_TOKENS), F.col("n") - F.col("s"))
        .cast("bigint")
        .alias("chunk_tokens"),
        F.md5(
            F.array_join(F.slice(F.col("w"), F.col("s") + 1, F.lit(CHUNK_TOKENS)), " ")
        ).alias("chunk_hash"),
    )


@query(
    "q_seq_packing",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
      FROM documents
    )
    SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(floor((sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING) - n_tokens)
                      / {PACK_TARGET}) AS BIGINT) AS pack_bin
    FROM toks
    """,
    tags=("text", "pipeline", "packing", "window"),
)
def q_seq_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for a {512}-token context budget: documents are
    packed in deterministic (source, doc_id) order; a doc's bin is the
    running-token prefix sum before it divided by the budget —
    contiguous greedy fill, the standard distributed-friendly packing
    (true first-fit is inherently sequential).

    Scale: ONE window over (source) partitions — parallel across
    sources; within a giant source, range-partition the order key and
    pack per range (bins are relabeled by prefix sums of range totals,
    an O(ranges) driver step)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return toks.select(
        "doc_id",
        "source",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.floor(run / PACK_TARGET).cast("bigint").alias("pack_bin"),
    )


@query(
    "q_mix_weights",
    oracle="""
    WITH per_source AS (
      SELECT source,
             count(*) AS n_docs,
             sum(len(string_split(text, ' '))) AS n_tokens
      FROM documents GROUP BY source
    )
    SELECT source, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
           round(n_tokens / sum(n_tokens) OVER (), 6) AS token_share,
           round((sum(n_tokens) OVER () / count(*) OVER ())
                 / n_tokens, 6) AS uniform_weight
    FROM per_source
    """,
    tags=("text", "pipeline", "agg"),
)
def q_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture weights: per-source doc/token counts, the source's
    share of corpus tokens, and the up/down-sampling weight that would
    equalize token mass across sources (the knob a pretraining mixture
    schedule consumes).

    Scale: one partial-aggregated groupBy to ~sources rows; the global
    window runs over that tiny aggregate, not the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " "))).alias("n_tokens"),
    )
    w = Window.partitionBy()
    return per_source.select(
        "source",
        "n_docs",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.round(F.col("n_tokens") / F.sum("n_tokens").over(w), 6).alias("token_share"),
        F.round(
            (F.sum("n_tokens").over(w) / F.count("*").over(w)) / F.col("n_tokens"), 6
        ).alias("uniform_weight"),
    )


@query(
    "q_embedding_quantize",
    bench=True,
    oracle="""
    WITH mx AS (
      SELECT vec_id, embedding,
             greatest(list_max(list_transform(embedding,
                      x -> abs(CAST(x AS DOUBLE)))), 1e-12) / 127.0 AS scale
      FROM embeddings
    )
    SELECT vec_id, round(scale, 9) AS qscale,
           md5(array_to_string(list_transform(embedding,
               x -> CAST(CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS BIGINT)
                         AS VARCHAR)), ',')) AS qhash
    FROM mx
    """,
    tags=("vectors", "pipeline", "quantization"),
)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization per embedding (scale = max|x|/127,
    q_i = floor(x_i/scale + 0.5) — the explicit half-up form both
    engines reproduce bit-for-bit). Returns the scale and a hash of the
    quantized vector, proving the exact int8 codes cross-engine.

    Scale: pure codegen projection, no shuffle, no Python — the shape
    that quantizes 100 TB of embeddings in one pass."""
    emb = load_table(spark, sf_dir, "embeddings")
    xd = F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double")))
    scale = F.greatest(F.array_max(xd), F.lit(1e-12)) / F.lit(127.0)
    q = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") / F.col("scale") + F.lit(0.5))
        .cast("bigint")
        .cast("string"),
    )
    return (
        emb.withColumn("scale", scale)
        .select(
            "vec_id",
            F.round(F.col("scale"), 9).alias("qscale"),
            F.md5(F.array_join(q, ",")).alias("qhash"),
        )
    )


@query(
    "q_text_tfidf",
    bench=True,
    oracle="""
    WITH toks AS (
      SELECT doc_id, w, count(*) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
      GROUP BY doc_id, w
    ),
    dfreq AS (SELECT w, count(*) AS df FROM toks GROUP BY w),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT t.doc_id, t.w,
             round(t.tf * ln(CAST(n.n_docs AS DOUBLE) / d.df), 6) AS score
      FROM toks t JOIN dfreq d ON d.w = t.w CROSS JOIN n
    )
    SELECT doc_id, w AS term, score
    FROM (
      SELECT doc_id, w, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, w ASC) AS rn
      FROM scored
    )
    WHERE rn <= 3
    """,
    tags=("text", "pipeline", "tfidf"),
)
def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 tf-idf keywords per document (tf × ln(N/df), rounded
    score + term tie-break). The document-keyword signal behind
    quality filters and topic mixing.

    Scale: tf groupBy is the only corpus-sized shuffle; df is a
    vocab-sized aggregate broadcast back; the per-doc top-3 is a
    window over each doc's own terms."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = toks.groupBy("w").agg(F.count("*").alias("df"))
    # Corpus count stays in the lazy plan as a 1-row broadcast cross
    # join (no eager docs.count() job at plan-build time, and no second
    # full scan when the plan runs — same pattern as q_unigram_logprob).
    n = docs.agg(F.count("*").cast("double").alias("n_docs"))
    scored = (
        toks.join(dfreq, "w")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "w",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6).alias("score"),
        )
    )
    wnd = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("w"))
    return (
        scored.withColumn("rn", F.row_number().over(wnd))
        .filter(F.col("rn") <= 3)
        .select("doc_id", F.col("w").alias("term"), "score")
    )
