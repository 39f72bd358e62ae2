"""Round-3 pipeline additions: containment-based near-duplicate
detection (doc-inside-doc), bigram language-model quality scoring, and
a CDC/merge apply operator (latest-wins upsert + delete). No reference
analog (SURVEY.md §2 — the reference is a message queue); these extend
the dedup/text/log-store surfaces. Registry determinism contract
applies: md5-derived hashing, integer selection arithmetic, floats
rounded only at the result edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ripple_server_spark.catalog import load_table
from ripple_server_spark.functions.scalar import xor_fingerprint48
from ripple_server_spark.functions.text import tokens
from ripple_server_spark.operators.dedup import shingle_sets
from ripple_server_spark.operators.similarity import ANN_AUDIT_ORACLE
from ripple_server_spark.plans.extensions import _SH_CTE
from ripple_server_spark.plans.registry import query

_CONTAIN_TOPK = 25


@query(
    "q_dedup_containment",
    oracle=f"""
    WITH {_SH_CTE},
    src AS (SELECT doc_id, source FROM documents),
    post AS (SELECT s.doc_id, s.shingle, d.source FROM sh s JOIN src d USING (doc_id)),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        FROM post a JOIN post b
          ON a.shingle = b.shingle AND a.source = b.source AND a.doc_id < b.doc_id
        GROUP BY doc_a, doc_b
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    directed AS (
        SELECT CASE WHEN na.n <= nb.n THEN i.doc_a ELSE i.doc_b END AS contained_id,
               CASE WHEN na.n <= nb.n THEN i.doc_b ELSE i.doc_a END AS container_id,
               i.n_common,
               least(na.n, nb.n) AS n_contained
        FROM inter i
        JOIN sizes na ON na.doc_id = i.doc_a
        JOIN sizes nb ON nb.doc_id = i.doc_b
    )
    SELECT contained_id, container_id, CAST(n_common AS BIGINT) AS n_common,
           CAST(n_contained AS BIGINT) AS n_contained,
           round(n_common::DOUBLE / n_contained, 4) AS containment
    FROM directed
    QUALIFY row_number() OVER (
        ORDER BY n_common::DOUBLE / n_contained DESC, contained_id, container_id
    ) <= {_CONTAIN_TOPK}
    """,
    tags=("dedup", "containment", "text"),
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment near-dup detection: C(A,B) = |sh(A) ∩ sh(B)| / |sh(A)|
    with A the smaller shingle set — the asymmetric score that catches a
    document EMBEDDED in a larger one (quote, syndication, wrapper
    boilerplate), which symmetric Jaccard dilutes toward 0. The
    top-25 most-contained pairs are emitted as
    (contained, container) with a deterministic id tie-break.

    Scale shape: identical candidate generation to q_dedup_ngram_jaccard
    — shared-shingle inverted-index self-join within the source block,
    never all-pairs (lossless for any threshold > 0 since C >= t > 0
    implies a shared shingle). The direction/denominator step joins the
    candidate pairs against the per-doc set sizes; the size table is
    corpus-sized (one row per doc), so the join strategy is left to the
    optimizer — AQE broadcasts it only when it is actually small, and
    falls back to a shuffled join keyed by doc id. Hot-shingle skew is
    AQE-split; the prefix-filtered setsim join remains the exact
    high-skew fallback (operators/dedup.py)."""
    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_sets(docs).persist()
    post = sh.join(docs.select("doc_id", "source"), "doc_id")
    a, b = post.alias("a"), post.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    small_is_a = F.col("n_a") <= F.col("n_b")
    directed = (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            F.when(small_is_a, F.col("doc_a")).otherwise(F.col("doc_b")).alias("contained_id"),
            F.when(small_is_a, F.col("doc_b")).otherwise(F.col("doc_a")).alias("container_id"),
            F.col("n_common").cast("bigint").alias("n_common"),
            F.least("n_a", "n_b").cast("bigint").alias("n_contained"),
        )
    )
    c = F.col("n_common") / F.col("n_contained")
    # orderBy+limit compiles to TakeOrderedAndProject: per-partition
    # top-k then a k-row driver merge — no single-partition window.
    return (
        directed.orderBy(F.desc(c), F.asc("contained_id"), F.asc("container_id"))
        .limit(_CONTAIN_TOPK)
        .withColumn("containment", F.round(c, 4))
    )


@query(
    "q_bigram_logprob",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    bg AS (
        SELECT doc_id, unnest(w[1:len(w)-1]) AS w1, unnest(w[2:len(w)]) AS w2
        FROM t WHERE len(w) >= 2
    ),
    heads AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
    pairs AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
    vocab AS (
        SELECT count(DISTINCT tok) AS v
        FROM (SELECT unnest(w) AS tok FROM t)
    )
    SELECT bg.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(ln((p.c12 + 1.0) / (h.c1 + vocab.v))), 3) AS avg_logp
    FROM bg
    JOIN heads h USING (w1)
    JOIN pairs p USING (w1, w2)
    CROSS JOIN vocab
    GROUP BY bg.doc_id
    """,
    tags=("text", "lm", "quality", "pipeline"),
)
def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM quality scoring: per-document mean log P(w_i | w_{i-1})
    under an add-one-smoothed corpus bigram model — the step up from
    q_unigram_logprob that actually penalizes scrambled word salad, the
    standard cheap perplexity proxy for corpus filtering.

    Scale shape: bigram pairing is a shuffle-free array zip
    (slice + arrays_zip + explode stays in codegen — no positional
    window, no self-join on token position). The model tables are
    vocabulary-sized aggregates (heads ~V rows, pairs ~V² bounded by
    corpus bigram count); scoring joins the bigram stream against them
    on their natural keys. V is a one-row broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokens(F.col("text")).alias("w")).filter(F.size("w") >= 2)
    n = F.size("w")
    bg = t.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("w"), 1, n - 1).alias("w1"),
                F.slice(F.col("w"), 2, n - 1).alias("w2"),
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    heads = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    pairs = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    vocab = (
        docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
        .agg(F.countDistinct("tok").alias("v"))
    )
    return (
        bg.join(heads, "w1")
        .join(pairs, ["w1", "w2"])
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(F.log((F.col("c12") + 1.0) / (F.col("c1") + F.col("v")))), 3).alias(
                "avg_logp"
            ),
        )
    )


_CDC_BUCKETS = 8


@query(
    "q_cdc_apply",
    oracle=f"""
    WITH log AS (
        SELECT user_id, event_id, value,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
        FROM events
    ),
    latest AS (
        SELECT user_id, value, op
        FROM log
        QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
    ),
    state AS (SELECT user_id, value FROM latest WHERE op <> 'D')
    SELECT user_id % {_CDC_BUCKETS} AS bucket,
           CAST(count(*) AS BIGINT) AS n_keys,
           bit_xor(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT)
               AS key_xor,
           round(sum(value), 2) AS sum_value
    FROM state GROUP BY bucket
    """,
    tags=("cdc", "merge", "upsert", "pubsub"),
)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC / MERGE apply: treat the event log as a changelog over key =
    user_id (each event upserts the key's value; event_type 'error'
    deletes the key), materialize the final table state with
    latest-wins-by-seq semantics, and emit per-bucket summaries — key
    count, md5 key-set fingerprint, surviving-value sum — so the oracle
    verifies the merged STATE, not just counts. This is the log->table
    duality every log store needs (Kafka compacted topics, Delta MERGE)
    and the batch analog of TopicStore.compact's keep-latest semantics.

    Scale shape: one shuffle on the merge key, then a per-key
    WindowGroupLimit (rank 1 of event_id DESC — Spark prunes to the
    top row map-side, no full per-key sort materialization), then an
    8-way reaggregation. MERGE at 100 TB is exactly this
    shape plus a join against the base snapshot, which q_fact_join /
    topics.compact already exercise."""
    events = load_table(spark, sf_dir, "events")
    log = events.select(
        "user_id",
        "event_id",
        "value",
        F.when(F.col("event_type") == "error", F.lit("D")).otherwise(F.lit("U")).alias("op"),
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("event_id"))
    latest = (
        log.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    state = latest.filter(F.col("op") != "D")
    return state.groupBy((F.col("user_id") % _CDC_BUCKETS).alias("bucket")).agg(
        F.count("*").alias("n_keys"),
        F.expr(xor_fingerprint48("cast(user_id as string)")).alias("key_xor"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@query(
    "q_ann_pq_topk",
    # Like q_ann_ivf_topk, the PQ result is estimator-specific, so the
    # driver-checkable contract is the RECALL ASSERTION: top-3 via
    # PQ+ADC+exact-rerank audited against brute-force top-3 through
    # operators/similarity.ann_recall_audit — recall@3 >= 0.7
    # (with-ties), corpus-aware expected row counts (min(3, corpus-1)),
    # and sim agreement on id-coinciding hits. Any degradation flips a
    # value.
    oracle=ANN_AUDIT_ORACLE.format(k=3),
    bench=True,
    tags=("vectors", "ann", "pq"),
)
def q_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with an in-plan recall audit: top-3 for
    20 query vectors through the PQ pipeline (encode corpus as 8-byte
    codes -> ADC table-lookup ranking -> exact cosine re-rank of the
    top-128 shortlist), joined against brute-force top-3 to assert
    recall@3 >= 0.7 and per-hit sim agreement. Deterministic: strided
    codebook training sample, fixed Lloyd init (recall measured 0.93
    at sf0.1 — the isotropic worst case). Same audit contract as
    q_ann_ivf_topk; per-query bound pytest-checked in
    tests/test_kernels.py."""
    from ripple_server_spark.operators.similarity import (
        ann_recall_audit,
        pq_topk_with_exact,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
    )
    # fused scan (r12): PQ candidates, the brute-force audit baseline,
    # and the audit's corpus count all come from ONE corpus pass
    # instead of three (pq kernel + cosine_topk_scan_arrow + count) —
    # see pq_topk_with_exact; results are bit-identical (shared batch
    # bodies, same _global_topk cuts).
    pq, exact, nc, qids, caches = pq_topk_with_exact(emb, queries, k=3)
    exact = exact.select("q_id", "neighbor_id", F.col("sim").alias("exact_sim"))
    return ann_recall_audit(
        queries, pq, exact, emb, k=3, nc=nc, q_ids=qids, caches=caches
    )


_COLL_MIN_COUNT = 5
_COLL_TOPK = 30


@query(
    "q_text_collocations",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    bg AS (
        SELECT unnest(w[1:len(w)-1]) AS w1, unnest(w[2:len(w)]) AS w2
        FROM t WHERE len(w) >= 2
    ),
    pair AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
    uni AS (
        SELECT tok, count(*) AS c
        FROM (SELECT unnest(w) AS tok FROM t) GROUP BY tok
    ),
    n AS (SELECT count(*)::DOUBLE AS total FROM (SELECT unnest(w) AS tok FROM t))
    SELECT p.w1, p.w2, CAST(p.c12 AS BIGINT) AS c12,
           round(ln(p.c12 * n.total / (u1.c * u2.c)), 4) AS pmi
    FROM pair p
    JOIN uni u1 ON u1.tok = p.w1
    JOIN uni u2 ON u2.tok = p.w2
    CROSS JOIN n
    WHERE p.c12 >= {_COLL_MIN_COUNT}
    QUALIFY row_number() OVER (
        ORDER BY ln(p.c12 * n.total / (u1.c * u2.c)) DESC, p.w1, p.w2
    ) <= {_COLL_TOPK}
    """,
    tags=("text", "collocations", "pmi", "pipeline"),
)
def q_text_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI-scored collocation extraction: the top-30 word
    bigrams by pointwise mutual information ln(c12·N / (c1·c2)) with
    support >= 5 — phrase mining, the corpus-analysis
    companion to the bigram LM (multi-word expressions to protect from
    tokenizer splits, vocabulary induction, boilerplate phrase
    discovery).

    Scale shape: same shuffle-free bigram zip as q_bigram_logprob;
    unigram/bigram count tables are vocabulary-sized; the final cut is
    TakeOrderedAndProject (per-partition top-k + k-row merge), not a
    global sort."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(tokens(F.col("text")).alias("w"))
    n_arr = F.size("w")
    bg = t.filter(n_arr >= 2).select(
        F.explode(
            F.arrays_zip(
                F.slice(F.col("w"), 1, n_arr - 1).alias("w1"),
                F.slice(F.col("w"), 2, n_arr - 1).alias("w2"),
            )
        ).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    pair = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    toks = t.select(F.explode("w").alias("tok"))
    uni = toks.groupBy("tok").agg(F.count("*").alias("c"))
    total = toks.agg(F.count("*").cast("double").alias("total"))
    u1 = uni.select(F.col("tok").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("c").alias("c2"))
    pmi = F.log(F.col("c12") * F.col("total") / (F.col("c1") * F.col("c2")))
    return (
        pair.filter(F.col("c12") >= _COLL_MIN_COUNT)
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(total))
        .orderBy(F.desc(pmi), F.asc("w1"), F.asc("w2"))
        .limit(_COLL_TOPK)
        .select("w1", "w2", F.col("c12").cast("bigint").alias("c12"),
                F.round(pmi, 4).alias("pmi"))
    )


@query(
    "q_funnel_attribution",
    oracle="""
    WITH touched AS (
        SELECT event_type, value,
               last_value(CASE WHEN event_type IN ('click', 'view')
                               THEN event_type END IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS touch
        FROM events
    )
    SELECT coalesce(touch, 'none') AS touch_type,
           CAST(count(*) AS BIGINT) AS n_purchases,
           round(sum(value), 2) AS attributed_value
    FROM touched
    WHERE event_type = 'purchase'
    GROUP BY touch_type
    """,
    tags=("analytics", "attribution", "window", "funnel"),
)
def q_funnel_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: credit each purchase to the most recent
    preceding click/view in the same user's stream (or 'none' for
    organic purchases) and report purchase count + attributed value per
    touch type — the marketing-funnel companion to q_funnel_conversion,
    and the canonical use of last_value(... IGNORE NULLS) over an
    unbounded preceding frame.

    Scale shape: one shuffle on user_id for the per-user ordered
    window (the same partitioning every per-user query here reuses),
    then a 3-row aggregate. The frame is running-state, so Spark
    evaluates it in a single pass per user — no per-row rescans."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type").isin("click", "view"), F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        ev.withColumn("touch", touch)
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce(F.col("touch"), F.lit("none")).alias("touch_type"))
        .agg(
            F.count("*").alias("n_purchases"),
            F.round(F.sum("value"), 2).alias("attributed_value"),
        )
    )


@query(
    "q_text_entropy",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    cnts AS (SELECT doc_id, w, count(*) AS c FROM toks GROUP BY doc_id, w),
    n AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens FROM cnts GROUP BY doc_id)
    SELECT c.doc_id, any_value(n.n_tokens) AS n_tokens,
           round(ln(any_value(n.n_tokens))
                 - sum(c.c * ln(c.c)) / any_value(n.n_tokens), 4) AS token_entropy
    FROM cnts c JOIN n USING (doc_id)
    GROUP BY c.doc_id
    """,
    tags=("text", "quality", "entropy", "pipeline"),
)
def q_text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the token distribution,
    H = ln(n) - (1/n)·Σ c·ln(c) — the information-theoretic quality
    signal that catches both keyword-stuffing (low entropy: few tokens
    repeated) and random-character noise (entropy ~ ln n with all
    counts 1), orthogonal to the length/stopword heuristics of
    q_text_quality and the LM scores.

    Scale shape: explode + two partial aggregates keyed by doc_id (the
    natural partitioning every per-doc text query shares) — no joins
    against corpus-level state at all."""
    docs = load_table(spark, sf_dir, "documents")
    cnts = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
    )
    return cnts.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.round(
            F.log(F.sum("c")) - F.sum(F.col("c") * F.log("c")) / F.sum("c"), 4
        ).alias("token_entropy"),
    )


@query(
    "q_source_kl_divergence",
    oracle="""
    WITH toks AS (
        SELECT d.source, unnest(string_split(d.text, ' ')) AS w FROM documents d
    ),
    sc AS (SELECT source, w, count(*) AS c FROM toks GROUP BY source, w),
    sn AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM sc GROUP BY source),
    qc AS (SELECT w, count(*) AS cq FROM toks GROUP BY w),
    qn AS (SELECT count(*)::DOUBLE AS nq FROM toks)
    SELECT sc.source, any_value(sn.n) AS n_tokens,
           round(sum((sc.c::DOUBLE / sn.n)
                     * ln((sc.c::DOUBLE / sn.n) / (qc.cq / qn.nq))), 4)
               AS kl_vs_corpus
    FROM sc
    JOIN sn USING (source)
    JOIN qc USING (w)
    CROSS JOIN qn
    GROUP BY sc.source
    """,
    tags=("text", "corpus", "kl", "stats", "pipeline"),
)
def q_source_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL divergence of each source's unigram distribution from the
    corpus distribution, KL(P_s || Q) = Σ p·ln(p/q) — the domain-shift
    audit a mixture designer reads before setting q_mix_weights: a
    source with high KL is lexically unlike the blend it joins (q > 0
    always holds because the corpus distribution is a superset of every
    source's support).

    Scale shape: both distributions are vocabulary-sized aggregates;
    the scoring join is (source x vocab) rows against the vocab table
    on its natural key, and the corpus total is a 1-row broadcast. The
    token stream is read once."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("source", F.explode(tokens(F.col("text"))).alias("w"))
    sc = toks.groupBy("source", "w").agg(F.count("*").alias("c"))
    sn = sc.groupBy("source").agg(F.sum("c").cast("bigint").alias("n"))
    qc = toks.groupBy("w").agg(F.count("*").alias("cq"))
    qn = toks.agg(F.count("*").cast("double").alias("nq"))
    p = F.col("c").cast("double") / F.col("n")
    q = F.col("cq") / F.col("nq")
    return (
        sc.join(F.broadcast(sn), "source")
        .join(qc, "w")
        .crossJoin(F.broadcast(qn))
        .groupBy("source")
        .agg(
            F.first("n").alias("n_tokens"),
            F.round(F.sum(p * F.log(p / q)), 4).alias("kl_vs_corpus"),
        )
    )


@query(
    "q_text_rare_token_ratio",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    df AS (SELECT w, count(DISTINCT doc_id) AS docfreq FROM toks GROUP BY w)
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(*) FILTER (df.docfreq = 1) AS BIGINT) AS n_hapax,
           round(count(*) FILTER (df.docfreq = 1)::DOUBLE / count(*), 4)
               AS rare_ratio
    FROM toks t JOIN df USING (w)
    GROUP BY t.doc_id
    """,
    tags=("text", "quality", "oov", "pipeline"),
)
def q_text_rare_token_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rare-token (hapax) ratio per document: the fraction of a doc's
    tokens whose corpus document-frequency is 1 — the cheap
    gibberish/OCR-noise detector (random strings are corpus-unique;
    natural text shares its vocabulary), complementing entropy and the
    LM scores in the quality-filter bank.

    Scale shape: the document-frequency table is vocabulary-sized (one
    distinct-aggregate shuffle); scoring joins the token stream on its
    natural key and reaggregates per doc — the same two-shuffle shape
    as tf-idf."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
    df_tbl = toks.groupBy("w").agg(F.countDistinct("doc_id").alias("docfreq"))
    return (
        toks.join(df_tbl, "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.count(F.when(F.col("docfreq") == 1, 1)).alias("n_hapax"),
            F.round(
                F.count(F.when(F.col("docfreq") == 1, 1)).cast("double") / F.count("*"), 4
            ).alias("rare_ratio"),
        )
    )


@query(
    "q_source_vocab_overlap",
    oracle="""
    WITH v AS (
        SELECT DISTINCT source, w FROM (
            SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
        )
    ),
    sizes AS (SELECT source, count(*) AS n FROM v GROUP BY source),
    inter AS (
        SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_common
        FROM v a JOIN v b ON a.w = b.w AND a.source < b.source
        GROUP BY src_a, src_b
    )
    SELECT i.src_a, i.src_b, CAST(i.n_common AS BIGINT) AS n_common,
           round(i.n_common::DOUBLE / (na.n + nb.n - i.n_common), 4)
               AS vocab_jaccard
    FROM inter i
    JOIN sizes na ON na.source = i.src_a
    JOIN sizes nb ON nb.source = i.src_b
    """,
    tags=("text", "corpus", "vocab", "jaccard"),
)
def q_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary Jaccard between every source pair — the corpus-
    comparison matrix (are two crawls lexically redundant? does a new
    source add vocabulary?) that complements per-source KL divergence
    with a set-overlap view.

    Scale shape: the distinct (source, word) table is vocabulary-sized;
    the pair intersection is the same inverted-index self-join as the
    shingle dedup (join on the word, never source x source x vocab),
    and sizes broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    v = docs.select(
        "source", F.explode(tokens(F.col("text"))).alias("w")
    ).distinct()
    sizes = v.groupBy("source").agg(F.count("*").alias("n"))
    a, b = v.alias("a"), v.alias("b")
    inter = (
        a.join(b, (F.col("a.w") == F.col("b.w")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b"))
        .agg(F.count("*").alias("n_common"))
    )
    na = sizes.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("source").alias("src_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(na), "src_a")
        .join(F.broadcast(nb), "src_b")
        .select(
            "src_a",
            "src_b",
            F.col("n_common").cast("bigint").alias("n_common"),
            F.round(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 4
            ).alias("vocab_jaccard"),
        )
    )


def stripe_width(lo: int, hi: int, parallelism: int) -> int:
    """Coarse doc_id-bucket width for the striped two-pass rank: the
    observed id range split into 2x ``parallelism`` stripes (2x32=64 on
    the dev box) so every core gets stripes on any cluster size — a
    fixed constant would pin task granularity to the dev box; a
    production ANALYZE derives this from table stats. Correctness
    never depends on the width — the slice rank is exact for every
    stripe count; one degenerate bucket just degrades task balance
    locally. Factored out so the parallelism-scaling contract is
    behavior-testable (tests/test_kernels.py) instead of source-text
    grepped."""
    return max(1, (hi - lo + 1) // (2 * parallelism))


@query(
    "q_vocab_growth",
    oracle="""
    WITH d AS (
        SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rn,
               count(*) OVER () AS n
        FROM documents
    ),
    grp AS (SELECT doc_id, ((rn - 1) * 10) // n AS g, n FROM d),
    toks AS (
        SELECT g.g, t.w FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
        ) t JOIN grp g USING (doc_id)
    ),
    first_seen AS (SELECT w, min(g) AS fg FROM toks GROUP BY w),
    new_per_g AS (SELECT fg AS g, count(*) AS new_words FROM first_seen GROUP BY fg),
    tok_per_g AS (SELECT g, count(*) AS n_tokens FROM toks GROUP BY g)
    SELECT t.g AS decile,
           CAST(sum(t.n_tokens) OVER w AS BIGINT) AS cum_tokens,
           CAST(sum(coalesce(n.new_words, 0)) OVER w AS BIGINT) AS cum_vocab
    FROM tok_per_g t LEFT JOIN new_per_g n ON n.g = t.g
    WINDOW w AS (ORDER BY t.g ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    tags=("text", "corpus", "heaps", "vocab"),
)
def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth curve: cumulative distinct
    vocabulary against cumulative token count over ten sequential
    corpus slices (by doc_id order) — the saturation diagnostic for
    corpus collection (flattening curve = a new crawl adds tokens but
    no vocabulary; use q_source_vocab_overlap to find which source).

    Scale shape: each word's FIRST-SEEN slice is one aggregate over
    the token stream (min of a precomputed slice id — no per-
    checkpoint rescans); the growth curve is a 10-row cumulative
    window. Slice assignment is the striped two-pass rank applied to
    doc_id: bucket docs by coarse doc_id range, count buckets (a tiny
    aggregate), broadcast cumulative bucket offsets back, and rank
    only WITHIN a bucket — so no task ever sorts the whole corpus and
    nothing corpus-sized is ever broadcast (the r03 version ranked
    every doc through one global row_number and broadcast the full
    doc->slice map; both are gone). The slice id rides the doc row
    into the explode, so no doc->slice join exists at all.

    ONE corpus pass: the token stream reduces once to a (word, slice)
    count table — vocab x 10 rows, cheap to persist — and both the
    first-seen-slice aggregate and the per-slice token totals derive
    from it. (The previous form fed the explode into two separate
    aggregations, scanning and tokenizing the corpus twice.)"""
    docs = load_table(spark, sf_dir, "documents")
    stats = docs.agg(
        F.count("*").alias("n"), F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    ).first()
    n_docs, lo, hi = stats["n"], stats["lo"], stats["hi"]
    if n_docs == 0:
        # empty corpus: min/max are NULL — degrade to the same empty
        # curve the oracle produces instead of a driver TypeError
        n_docs, lo, hi = 1, 0, 0
    width = stripe_width(lo, hi, spark.sparkContext.defaultParallelism)
    striped = docs.withColumn(
        "_stripe", F.floor((F.col("doc_id") - F.lit(lo)) / F.lit(width)).cast("bigint")
    )
    counts = striped.groupBy("_stripe").agg(F.count("*").alias("_n"))
    woff = Window.orderBy("_stripe").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_stripe", F.coalesce(F.sum("_n").over(woff), F.lit(0)).alias("_off")
    )
    wloc = Window.partitionBy("_stripe").orderBy("doc_id")
    ranked = striped.join(F.broadcast(offsets), "_stripe").withColumn(
        "rn", F.col("_off") + F.row_number().over(wloc)
    )
    toks = ranked.select(
        F.expr(f"((rn - 1) * 10) div {n_docs}").alias("g"),
        F.explode(tokens(F.col("text"))).alias("w"),
    )
    wg = toks.groupBy("w", "g").agg(F.count("*").alias("c")).persist()
    first_seen = wg.groupBy("w").agg(F.min("g").alias("fg"))
    new_per_g = first_seen.groupBy(F.col("fg").alias("g")).agg(
        F.count("*").alias("new_words")
    )
    tok_per_g = wg.groupBy("g").agg(F.sum("c").cast("bigint").alias("n_tokens"))
    wc = Window.orderBy("g").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        tok_per_g.join(new_per_g, "g", "left")
        .select(
            F.col("g").alias("decile"),
            F.sum("n_tokens").over(wc).cast("bigint").alias("cum_tokens"),
            F.sum(F.coalesce("new_words", F.lit(0))).over(wc).cast("bigint").alias("cum_vocab"),
        )
    )


from ripple_server_spark.functions.text import CONTENT_FOLD_SQL, content_fold  # noqa: E402

_FOLD_FP = f"md5({CONTENT_FOLD_SQL.format(expr='text')})"


@query(
    "q_dedup_incremental_ingest",
    bench=True,
    oracle=f"""
    WITH corpus_fps AS (
        SELECT DISTINCT {_FOLD_FP} AS fp
        FROM documents WHERE doc_id % 3 <> 0
    ),
    batch AS (
        SELECT doc_id, source, {_FOLD_FP} AS fp,
               row_number() OVER (PARTITION BY {_FOLD_FP} ORDER BY doc_id)
                   AS rn
        FROM documents WHERE doc_id % 3 = 0
    ),
    flagged AS (
        SELECT b.source, b.rn,
               CASE WHEN c.fp IS NOT NULL THEN 1 ELSE 0 END AS in_corpus
        FROM batch b LEFT JOIN corpus_fps c ON c.fp = b.fp
    )
    SELECT source,
           count(*) AS n_batch,
           CAST(sum(in_corpus) AS BIGINT) AS n_rejected_corpus,
           CAST(sum(CASE WHEN in_corpus = 0 AND rn > 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_rejected_within,
           CAST(sum(CASE WHEN in_corpus = 0 AND rn = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_admitted
    FROM flagged GROUP BY source
    """,
    tags=("dedup", "incremental", "ingest", "pipeline"),
)
def q_dedup_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup — the operator a CONTINUOUSLY-ingesting
    training pipeline runs on every new crawl batch, distinct from the
    full-corpus dedups: check the incoming batch (doc_id % 3 == 0)
    against the frozen already-deduped corpus (the other two thirds)
    and against itself, never corpus-vs-corpus. A batch doc is
    rejected-as-corpus-dup when its content fingerprint (md5 of the
    shared ASCII fold — functions/text.content_fold, the
    engine-portable canonical form) already exists in the corpus;
    otherwise rejected-as-within-batch-dup unless it is the batch's
    first (min doc_id) holder of that fingerprint. Report admission
    accounting per source.

    Scale shape: the corpus contributes ONLY its distinct fingerprint
    column (no text leaves the scan), and the batch->corpus check is
    one fp-keyed shuffle hash join — the corpus fingerprint set at
    100 TB is far too big to broadcast, but both sides hash-partition
    on fp, and the within-batch row_number window uses the SAME fp
    partitioning, so the join's exchange is reused and the whole
    classification costs one shuffle of each side. The corpus is never
    self-joined (incremental ingest is O(batch + corpus-fingerprints),
    not O(corpus^2)).

    Reference parity: none (message queue); this is the LLM-pipeline
    extension surface (SURVEY.md north-star: dedup family).
    """
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(content_fold(F.col("text")))
    corpus_fps = (
        docs.filter(F.expr("doc_id % 3 <> 0"))
        .select(fp.alias("fp"))
        .distinct()
        .withColumn("_in_corpus", F.lit(1))
    )
    batch = docs.filter(F.expr("doc_id % 3 = 0")).select(
        "doc_id", "source", fp.alias("fp")
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    flagged = (
        batch.join(corpus_fps, "fp", "left")
        .withColumn("rn", F.row_number().over(w))
    )
    in_c = F.col("_in_corpus").isNotNull()
    return flagged.groupBy("source").agg(
        F.count("*").alias("n_batch"),
        F.sum(F.when(in_c, 1).otherwise(0)).cast("bigint").alias("n_rejected_corpus"),
        F.sum(F.when(~in_c & (F.col("rn") > 1), 1).otherwise(0))
        .cast("bigint")
        .alias("n_rejected_within"),
        F.sum(F.when(~in_c & (F.col("rn") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("n_admitted"),
    )
