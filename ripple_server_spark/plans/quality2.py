"""Corpus-governance batch: split hygiene, label balance, embedding
health, duplication structure, PII redaction, language-ID audit.

The audits an LLM training-data pipeline runs between collection and
training (BASELINE.json north star): is the eval split contaminated by
the train split, are classes balanced enough to train on, are the
embeddings degenerate, how much of the corpus is literal duplicate
mass, what does anonymization remove, and does the declared language
metadata agree with the content. The reference engine hands back
opaque byte ranges only (internal/broker/consumer/server/core.go:52),
so this layer is entirely ours. All pure JVM DataFrame ops — no Python
in any hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ripple_server_spark.catalog import load_table
from ripple_server_spark.functions.scalar import xor_fingerprint48
from ripple_server_spark.functions import text as tx
from ripple_server_spark.plans.registry import query

# Hash-split bucket (same derivation as q_train_val_test_split: first 4
# md5 nibbles mod 10) applied to doc_id: 0-7 train, 8-9 eval.
_SPLIT_SQL = "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 10"


def _split_bucket() -> F.Column:
    return (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("bigint") % 10
    )


# Exact-dup fingerprint: trim + ASCII-only case fold (full-Unicode
# lower() is engine-divergent — see functions/text.content_fold).
_FP = f"md5({tx.CONTENT_FOLD_SQL.format(expr='text')})"


def _fp() -> F.Column:
    return F.md5(tx.content_fold(F.col("text")))


@query(
    "q_split_leakage",
    oracle=f"""
    WITH d AS (
        SELECT source, {_SPLIT_SQL} < 8 AS is_train, {_FP} AS fp
        FROM documents
    ),
    tr AS (SELECT DISTINCT fp FROM d WHERE is_train)
    SELECT source,
           CAST(count(*) FILTER (is_train) AS BIGINT) AS n_train,
           CAST(count(*) FILTER (NOT is_train) AS BIGINT) AS n_eval,
           CAST(count(*) FILTER (NOT is_train
                AND fp IN (SELECT fp FROM tr)) AS BIGINT) AS n_leaked
    FROM d GROUP BY source
    """,
    tags=("pipeline", "split", "leakage", "dedup"),
)
def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split contamination audit: eval-split documents whose
    normalized content hash also appears in the train split — the
    leak that silently inflates eval scores when a near-identical
    crawl lands on both sides of a hash split. Counts per source so
    the leaky feed is identifiable.

    Scale shape: one content-hash projection, a distinct on the train
    side, and a LEFT SEMI hash join keyed on the fingerprint — the
    same candidates-only discipline as q_decontaminate (never a
    broadcast of a corpus-sized side; the join shuffles on fp, which
    is uniform by construction, so no skew)."""
    # persisted at the fan-out: d feeds the train distinct, the eval
    # semi-join AND the per-source totals (same discipline as the dedup
    # pipeline's shingle persist).
    d = load_table(spark, sf_dir, "documents").select(
        "source", (_split_bucket() < 8).alias("is_train"), _fp().alias("fp")
    ).persist()
    tr = d.filter(F.col("is_train")).select("fp").distinct()
    leaked = (
        d.filter(~F.col("is_train"))
        .join(tr, "fp", "left_semi")
        .groupBy("source")
        .agg(F.count("*").alias("n_leaked"))
    )
    base = d.groupBy("source").agg(
        F.count_if(F.col("is_train")).alias("n_train"),
        F.count_if(~F.col("is_train")).alias("n_eval"),
    )
    return base.join(leaked, "source", "left").select(
        "source",
        "n_train",
        "n_eval",
        F.coalesce("n_leaked", F.lit(0)).cast("bigint").alias("n_leaked"),
    )


@query(
    "q_label_balance",
    oracle="""
    WITH c AS (SELECT label, count(*) AS n FROM embeddings GROUP BY label),
    t AS (SELECT sum(n) AS tot, count(*) AS k, max(n) AS mx, min(n) AS mn FROM c)
    SELECT CAST(any_value(t.k) AS BIGINT) AS n_labels,
           CAST(any_value(t.tot) AS BIGINT) AS n_vectors,
           round(-sum((c.n::DOUBLE / t.tot) * ln(c.n::DOUBLE / t.tot)), 4)
               AS label_entropy,
           round(any_value(t.mx)::DOUBLE / any_value(t.mn), 4) AS imbalance_ratio
    FROM c CROSS JOIN t
    """,
    tags=("pipeline", "labels", "stats"),
)
def q_label_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balance health of a labeled embedding set: label count,
    Shannon entropy of the label distribution (nats), and the
    max/min imbalance ratio — the pre-training check that a sampler
    or loss reweighting is needed before a skewed set is trained on.

    Scale shape: one per-label partial aggregate (label-cardinality
    rows) and a broadcast 1-row total; entropy is a sum over the
    label table, never the vector table."""
    emb = load_table(spark, sf_dir, "embeddings")
    c = emb.groupBy("label").agg(F.count("*").alias("n"))
    t = c.agg(
        F.sum("n").alias("tot"),
        F.count("*").alias("k"),
        F.max("n").alias("mx"),
        F.min("n").alias("mn"),
    )
    p = F.col("n").cast("double") / F.col("tot")
    return c.crossJoin(F.broadcast(t)).agg(
        F.first("k").cast("bigint").alias("n_labels"),
        F.first("tot").cast("bigint").alias("n_vectors"),
        F.round(-F.sum(p * F.log(p)), 4).alias("label_entropy"),
        F.round(F.first("mx").cast("double") / F.first("mn"), 4).alias(
            "imbalance_ratio"
        ),
    )


@query(
    "q_embedding_dim_stats",
    oracle="""
    SELECT dim, round(avg(x), 4) AS mean_v, round(stddev_samp(x), 4) AS std_v
    FROM (
        SELECT generate_subscripts(embedding, 1) AS dim,
               unnest(embedding)::DOUBLE AS x
        FROM embeddings
    ) GROUP BY dim
    """,
    tags=("pipeline", "vectors", "stats"),
)
def q_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean/std of the embedding matrix — the collapse
    detector (a dimension with ~0 variance is dead; a mean far from 0
    says the encoder output isn't centered, which degrades cosine
    retrieval and quantization alike).

    Scale shape: posexplode + ONE partial aggregate keyed on the
    dimension index (dim-cardinality result, 64 keys here); moments
    are partial-aggregatable so the explode never shuffles raw
    values beyond the per-dim combine."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select(F.posexplode("embedding").alias("p", "x"))
        .select((F.col("p") + 1).cast("bigint").alias("dim"), F.col("x").cast("double"))
        .groupBy("dim")
        .agg(
            F.round(F.avg("x"), 4).alias("mean_v"),
            F.round(F.stddev_samp("x"), 4).alias("std_v"),
        )
    )


@query(
    "q_dup_cluster_size_hist",
    oracle=f"""
    WITH c AS (SELECT {_FP} AS fp, count(*) AS sz FROM documents GROUP BY fp)
    SELECT CAST(sz AS BIGINT) AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sz * count(*) AS BIGINT) AS n_docs
    FROM c GROUP BY sz
    """,
    tags=("pipeline", "dedup", "stats"),
)
def q_dup_cluster_size_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate cluster-size spectrum: how much of the corpus
    is singleton vs. small clusters vs. mass duplication — the
    shape that decides whether dedup should keep-first (long tail of
    pairs) or quota-cap (few huge clusters), and the denominator for
    a dedup-yield forecast.

    Scale shape: two chained partial aggregates (content hash ->
    cluster size -> size histogram); output is histogram-sized. The
    same one-shuffle discipline as q_dedup_exact."""
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy(_fp().alias("fp")).agg(F.count("*").alias("sz"))
    return c.groupBy("sz").agg(F.count("*").alias("n_clusters")).select(
        F.col("sz").cast("bigint").alias("cluster_size"),
        F.col("n_clusters").cast("bigint").alias("n_clusters"),
        (F.col("sz") * F.col("n_clusters")).cast("bigint").alias("n_docs"),
    )


# Both-engine-safe patterns (no lookaround; see pipeline3 PII notes).
_EMAIL_RE = "[a-z0-9._]+@[a-z0-9.]+[a-z]"
_URL_RE = "https?://[a-z0-9./_-]+"


@query(
    "q_pii_redact",
    oracle=f"""
    WITH r AS (
        SELECT source, text,
               regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                              '{_URL_RE}', '<URL>', 'g') AS red
        FROM documents
    )
    SELECT source,
           CAST(count(*) FILTER (red <> text) AS BIGINT) AS n_redacted,
           CAST(sum(len(red) - len(text)) AS BIGINT) AS chars_delta,
           bit_xor(('0x' || substr(md5(red), 1, 12))::BIGINT) AS red_hash
    FROM r GROUP BY source
    """,
    tags=("pipeline", "pii", "redaction"),
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anonymization pass: emails and URLs replaced by typed mask
    tokens, reported per source as docs-touched, net character delta,
    and an order-independent xor fingerprint of the redacted text —
    the audit triple a privacy pipeline logs (how much was removed,
    and a checksum so reruns are provably identical).

    Scale shape: two codegen regexp_replace passes in the scan
    projection, then one partial aggregate; the fingerprint is
    bit_xor (commutative) so no ordering constraint ever forces a
    sort. Follows q_text_pii_flags: flags choose the scrub queue,
    this is the scrub itself."""
    docs = load_table(spark, sf_dir, "documents")
    red = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"), _URL_RE, "<URL>"
    )
    r = docs.select("source", "text", red.alias("red"))
    return r.groupBy("source").agg(
        F.count_if(F.col("red") != F.col("text")).alias("n_redacted"),
        F.sum(F.length("red") - F.length("text")).cast("bigint").alias("chars_delta"),
        F.expr(xor_fingerprint48("red")).alias("red_hash"),
    )


@query(
    "q_langid_agreement",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    s AS (
        SELECT doc_id,
          len(list_filter(w, x -> x IN ('the','a','of','and','is')))::DOUBLE / len(w) AS score_en,
          len(list_filter(w, x -> x IN ('el','la','de','que','y')))::DOUBLE / len(w) AS score_es,
          len(list_filter(w, x -> x IN ('le','la','de','et','un')))::DOUBLE / len(w) AS score_fr,
          len(list_filter(w, x -> x IN ('der','die','das','und','ist')))::DOUBLE / len(w) AS score_de,
          len(list_filter(w, x -> x IN ('的','是','了','在','和')))::DOUBLE / len(w) AS score_zh
        FROM t
    ),
    p AS (
        SELECT doc_id,
               list_sort([
                   {'neg': -round(score_en, 4), 'lang': 'en'},
                   {'neg': -round(score_es, 4), 'lang': 'es'},
                   {'neg': -round(score_fr, 4), 'lang': 'fr'},
                   {'neg': -round(score_de, 4), 'lang': 'de'},
                   {'neg': -round(score_zh, 4), 'lang': 'zh'}
               ])[1].lang AS pred_lang
        FROM s
    ),
    m AS (
        SELECT d.lang, p.pred_lang, count(*) AS n
        FROM documents d JOIN p USING (doc_id)
        GROUP BY d.lang, p.pred_lang
    )
    SELECT lang, pred_lang, CAST(n AS BIGINT) AS n,
           round(n::DOUBLE / sum(n) OVER (PARTITION BY lang), 4) AS share
    FROM m
    """,
    tags=("pipeline", "langid", "audit", "text-adjacent"),
)
def q_langid_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-metadata audit: confusion matrix of the declared
    `lang` column against the marker-lexicon prediction
    (q_text_lang_scores), with each cell's share of its declared
    language — the check that catches a feed whose metadata says 'en'
    while the content reads as something else.

    Scale shape: the scorer is one explode + partial aggregate
    (q_text_lang_scores); the matrix is a (lang x pred)-cardinality
    aggregate and the share window runs over those ~25 cells, never
    document rows."""
    docs = load_table(spark, sf_dir, "documents")
    preds = tx.lang_scores(docs).select("doc_id", "pred_lang")
    m = (
        docs.select("doc_id", "lang")
        .join(preds, "doc_id")
        .groupBy("lang", "pred_lang")
        .agg(F.count("*").alias("n"))
    )
    tot = m.groupBy("lang").agg(F.sum("n").alias("tot"))
    return m.join(F.broadcast(tot), "lang").select(
        "lang",
        "pred_lang",
        "n",
        F.round(F.col("n").cast("double") / F.col("tot"), 4).alias("share"),
    )


_MAX_LEN = 128


@query(
    "q_truncation_stats",
    oracle=f"""
    WITH t AS (
        SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (n_tokens > {_MAX_LEN}) AS BIGINT) AS n_truncated,
           CAST(sum(least(n_tokens, {_MAX_LEN})) AS BIGINT) AS tokens_kept,
           CAST(sum(greatest(n_tokens - {_MAX_LEN}, 0)) AS BIGINT) AS tokens_lost,
           round(sum(greatest(n_tokens - {_MAX_LEN}, 0))::DOUBLE
                 / sum(n_tokens), 4) AS loss_rate
    FROM t GROUP BY source
    """,
    tags=("pipeline", "tokens", "truncation"),
)
def q_truncation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length truncation forecast: per source, how many
    documents exceed the {_MAX_LEN}-token context and how many tokens
    a hard truncation would discard — the number that decides between
    truncating, chunking (q_text_chunking), or packing
    (q_seq_packing) for each feed.

    Scale shape: token count is one codegen size(split()) projection;
    everything else is a conditional partial aggregate. Zero
    shuffles until the per-source combine."""
    t = load_table(spark, sf_dir, "documents").select(
        "source", F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens")
    )
    lost = F.greatest(F.col("n_tokens") - _MAX_LEN, F.lit(0))
    return t.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.count_if(F.col("n_tokens") > _MAX_LEN).alias("n_truncated"),
        F.sum(F.least(F.col("n_tokens"), F.lit(_MAX_LEN))).cast("bigint").alias(
            "tokens_kept"
        ),
        F.sum(lost).cast("bigint").alias("tokens_lost"),
        F.round(F.sum(lost).cast("double") / F.sum("n_tokens"), 4).alias("loss_rate"),
    )


@query(
    "q_dup_rate_by_slice",
    oracle=f"""
    WITH b AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi, count(*) AS n
               FROM documents),
    d AS (
        SELECT least(((doc_id - b.lo) * 10) // (b.hi - b.lo + 1), 9) AS slice,
               doc_id, {_FP} AS fp
        FROM documents CROSS JOIN b
    ),
    firsts AS (SELECT fp, min(doc_id) AS first_id FROM d GROUP BY fp)
    SELECT slice,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (doc_id <> first_id) AS BIGINT) AS n_dups,
           round(count(*) FILTER (doc_id <> first_id)::DOUBLE / count(*), 4)
               AS dup_rate
    FROM d JOIN firsts USING (fp)
    GROUP BY slice
    """,
    tags=("pipeline", "dedup", "trend"),
)
def q_dup_rate_by_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication-rate trend across the corpus in collection order
    (10 doc_id-range slices): a rising curve means new crawls are
    re-fetching what's already held — the companion signal to
    q_vocab_growth's flattening vocabulary curve, and the early-stop
    signal for a crawl frontier.

    Scale shape: the slice id is ARITHMETIC on doc_id against a
    broadcast 1-row min/max (never a rank, never a doc->slice map);
    dup detection is keep-first vs. a per-fingerprint min aggregate
    joined back on the fingerprint — one uniform-key shuffle, same
    discipline as q_dedup_exact."""
    docs = load_table(spark, sf_dir, "documents")
    b = docs.agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    )
    d = docs.crossJoin(F.broadcast(b)).select(
        # integer `div`, matching the oracle's `//` exactly — a double
        # division could misround at the bucket boundary for extreme
        # id ranges
        F.least(
            F.expr("((doc_id - lo) * 10) div (hi - lo + 1)"), F.lit(9)
        )
        .cast("bigint")
        .alias("slice"),
        "doc_id",
        _fp().alias("fp"),
    ).persist()
    firsts = d.groupBy("fp").agg(F.min("doc_id").alias("first_id"))
    j = d.join(firsts, "fp")
    dup = F.count_if(F.col("doc_id") != F.col("first_id"))
    return j.groupBy("slice").agg(
        F.count("*").alias("n_docs"),
        dup.alias("n_dups"),
        F.round(dup.cast("double") / F.count("*"), 4).alias("dup_rate"),
    )


@query(
    "q_user_type_entropy",
    oracle="""
    WITH c AS (
        SELECT user_id, event_type, count(*) AS n
        FROM events GROUP BY user_id, event_type
    ),
    t AS (SELECT user_id, sum(n) AS tot, count(*) AS k FROM c GROUP BY user_id)
    SELECT c.user_id,
           CAST(any_value(t.tot) AS BIGINT) AS n_events,
           CAST(any_value(t.k) AS BIGINT) AS n_types,
           round(-sum((c.n::DOUBLE / t.tot) * ln(c.n::DOUBLE / t.tot)), 4)
               AS type_entropy
    FROM c JOIN t USING (user_id) GROUP BY c.user_id
    """,
    tags=("analytics", "entropy", "behavior"),
)
def q_user_type_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral diversity per user: Shannon entropy (nats) of each
    user's event-type distribution — near-zero entropy at high volume
    is the scripted-client signature q_bot_score ranks on; high
    entropy is organic browsing.

    Scale shape: two chained partial aggregates on (user, type) then
    user — both shuffles key on user_id, so the second reuses the
    first's partitioning; entropy is computed from key-level counts,
    never raw rows."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    t = c.groupBy("user_id").agg(F.sum("n").alias("tot"), F.count("*").alias("k"))
    p = F.col("n").cast("double") / F.col("tot")
    return (
        c.join(t, "user_id")
        .groupBy("user_id")
        .agg(
            F.first("tot").cast("bigint").alias("n_events"),
            F.first("k").cast("bigint").alias("n_types"),
            F.round(-F.sum(p * F.log(p)), 4).alias("type_entropy"),
        )
    )


_BOT_TOPK = 25


@query(
    "q_bot_score",
    oracle=f"""
    WITH c AS (
        SELECT user_id, event_type, count(*) AS n
        FROM events GROUP BY user_id, event_type
    ),
    tot AS (SELECT user_id, sum(n) AS tot FROM c GROUP BY user_id),
    ent AS (
        SELECT c.user_id,
               -sum((c.n::DOUBLE / tot.tot) * ln(c.n::DOUBLE / tot.tot)) AS ent
        FROM c JOIN tot USING (user_id) GROUP BY c.user_id
    ),
    span AS (
        SELECT user_id, count(*) AS n_events,
               -- floor() before the cast: DuckDB's double->BIGINT cast ROUNDS,
               -- Spark's unix_timestamp FLOORS; sub-second timestamps would
               -- otherwise flip the hour-span on .5s fractional parts
               (floor(epoch(max(ts)))::BIGINT - floor(epoch(min(ts)))::BIGINT) // 3600 + 1 AS hours
        FROM events GROUP BY user_id
    )
    SELECT s.user_id,
           CAST(s.n_events AS BIGINT) AS n_events,
           round(s.n_events::DOUBLE / s.hours, 4) AS rate_per_hour,
           round(e.ent, 4) AS type_entropy,
           round((s.n_events::DOUBLE / s.hours) / (e.ent + 0.1), 4) AS bot_score
    FROM span s JOIN ent e USING (user_id)
    ORDER BY bot_score DESC, user_id ASC LIMIT {_BOT_TOPK}
    """,
    tags=("analytics", "abuse", "topk"),
)
def q_bot_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scripted-client ranking: rate-per-active-hour divided by
    (behavioral entropy + 0.1) — high-volume, low-diversity users
    float to the top. Deterministic top-{_BOT_TOPK} with user_id
    tie-break; the abuse-triage list every event platform keeps.

    Scale shape: all inputs are per-user aggregates keyed on the same
    shuffle; the cut is orderBy+limit, which Spark compiles to
    TakeOrderedAndProject (per-partition top-k + k-row merge) — never
    a global sort or single-partition window."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    t = c.groupBy("user_id").agg(F.sum("n").alias("tot"))
    p = F.col("n").cast("double") / F.col("tot")
    ent = (
        c.join(t, "user_id")
        .groupBy("user_id")
        .agg((-F.sum(p * F.log(p))).alias("ent"))
    )
    span = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.floor(
            (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))) / 3600
        ).cast("bigint").alias("hours_m1"),
    )
    rate = F.col("n_events").cast("double") / (F.col("hours_m1") + 1)
    return (
        span.join(ent, "user_id")
        .select(
            "user_id",
            F.col("n_events").cast("bigint").alias("n_events"),
            F.round(rate, 4).alias("rate_per_hour"),
            F.round("ent", 4).alias("type_entropy"),
            F.round(rate / (F.col("ent") + 0.1), 4).alias("bot_score"),
        )
        .orderBy(F.desc("bot_score"), F.asc("user_id"))
        .limit(_BOT_TOPK)
    )


# Trigram / 5-gram CTEs (both-engine-safe; mirrors q_decontaminate's
# gram construction — range() is empty for docs shorter than the gram).
_TRIGRAM_CTE = """
    t AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
    idx AS (SELECT doc_id, source, unnest(range(1, greatest(len(w) - 1, 1))) AS i, w
            FROM t),
    grams AS (
        SELECT DISTINCT doc_id, source,
               w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
        FROM idx
    )"""


@query(
    "q_ngram_coverage",
    oracle=f"""
    WITH {_TRIGRAM_CTE},
    sp AS (
        SELECT g.*, ('0x' || substr(md5(CAST(g.doc_id AS VARCHAR)), 1, 4))::BIGINT
                    % 10 < 8 AS is_train
        FROM grams g
    ),
    tr AS (SELECT DISTINCT g FROM sp WHERE is_train),
    ev AS (SELECT DISTINCT source, g FROM sp WHERE NOT is_train)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_eval_grams,
           CAST(count(*) FILTER (g IN (SELECT g FROM tr)) AS BIGINT) AS n_covered,
           round(count(*) FILTER (g IN (SELECT g FROM tr))::DOUBLE / count(*), 4)
               AS coverage_rate
    FROM ev GROUP BY source
    """,
    tags=("pipeline", "ngram", "coverage", "split"),
)
def q_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train->eval n-gram coverage: the share of each source's
    distinct eval-split trigrams that also occur somewhere in the
    train split — LOW coverage flags an eval slice testing
    distribution the model never saw (unfair), HIGH coverage plus
    q_split_leakage hits flags memorization risk. The complement of
    decontamination: same machinery, opposite reading.

    Scale shape: the train gram set is corpus-sized, so unlike
    q_decontaminate's tiny benchmark it is NEVER broadcast — the
    coverage test is a shuffle hash semi-join keyed on the gram
    (uniform key, no skew), after per-side distincts that each
    partial-aggregate before shuffling."""
    from ripple_server_spark.operators.dedup import shingles_pandas

    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id",
        "source",
        F.explode(shingles_pandas(F.col("text"), 3)).alias("g"),
    ).withColumn("is_train", _split_bucket() < 8).persist()
    tr = grams.filter(F.col("is_train")).select("g").distinct()
    ev = grams.filter(~F.col("is_train")).select("source", "g").distinct()
    cov = (
        ev.join(tr, "g", "left_semi")
        .groupBy("source")
        .agg(F.count("*").alias("n_covered"))
    )
    base = ev.groupBy("source").agg(F.count("*").alias("n_eval_grams"))
    return base.join(cov, "source", "left").select(
        "source",
        "n_eval_grams",
        F.coalesce("n_covered", F.lit(0)).cast("bigint").alias("n_covered"),
        F.round(
            F.coalesce("n_covered", F.lit(0)).cast("double") / F.col("n_eval_grams"), 4
        ).alias("coverage_rate"),
    )


@query(
    "q_source_containment",
    oracle=f"""
    WITH {_TRIGRAM_CTE},
    sg AS (SELECT DISTINCT source, g FROM grams),
    sizes AS (SELECT source, count(*) AS n FROM sg GROUP BY source),
    inter AS (
        SELECT a.source AS src_a, b.source AS src_b, count(*) AS c
        FROM sg a JOIN sg b ON a.g = b.g AND a.source <> b.source
        GROUP BY a.source, b.source
    )
    SELECT src_a, src_b,
           CAST(c AS BIGINT) AS n_shared,
           round(c::DOUBLE / s.n, 4) AS containment
    FROM inter JOIN sizes s ON s.source = src_a
    """,
    tags=("pipeline", "ngram", "containment", "sources"),
)
def q_source_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional source-contamination matrix: for each ordered
    source pair, the fraction of A's distinct trigrams also present
    in B — asymmetric by design (a mirror site shows high containment
    of the original, not vice versa), which is what tells you WHICH
    feed to drop. The n-gram-level sibling of q_source_vocab_overlap.

    Scale shape: an inverted-index self-join keyed on the gram — the
    pair blowup per gram is bounded by the number of SOURCES holding
    it (dimension-sized), never by document count; sizes join back as
    a broadcast. No all-pairs document comparison exists anywhere."""
    from ripple_server_spark.operators.dedup import shingles_pandas

    docs = load_table(spark, sf_dir, "documents")
    sg = (
        docs.select("source", F.explode(shingles_pandas(F.col("text"), 3)).alias("g"))
        .distinct()
        .persist()
    )
    sizes = sg.groupBy("source").agg(F.count("*").alias("n"))
    a = sg.select(F.col("source").alias("src_a"), "g")
    b = sg.select(F.col("source").alias("src_b"), "g")
    inter = (
        a.join(b, "g")
        .filter(F.col("src_a") != F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").alias("c"))
    )
    return inter.join(
        F.broadcast(sizes.withColumnRenamed("source", "src_a")), "src_a"
    ).select(
        "src_a",
        "src_b",
        F.col("c").cast("bigint").alias("n_shared"),
        F.round(F.col("c").cast("double") / F.col("n"), 4).alias("containment"),
    )


@query(
    "q_holt_trend",
    # The recursion carries each type's series as an ARRAY and indexes
    # it by step — no per-step join against the hourly table (the
    # joined form costs ~8 s at sf0.01; this runs in ~0.15 s, same
    # rows).
    oracle="""
    WITH RECURSIVE hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour,
               count(*)::DOUBLE AS y
        FROM events GROUP BY event_type, hour
    ),
    arr AS (
        SELECT event_type, list(y ORDER BY hour) AS ys
        FROM hourly GROUP BY event_type
    ),
    rec AS (
        SELECT event_type, ys, 1 AS rn, ys[1] AS l, ys[2] - ys[1] AS b
        FROM arr WHERE len(ys) >= 2
        UNION ALL
        SELECT event_type, ys, rn + 1,
               0.5 * ys[rn + 1] + 0.5 * (l + b),
               0.3 * ((0.5 * ys[rn + 1] + 0.5 * (l + b)) - l) + 0.7 * b
        FROM rec WHERE rn < len(ys)
    ),
    last AS (SELECT event_type, rn, l, b FROM rec WHERE rn = len(ys))
    SELECT event_type, CAST(rn AS BIGINT) AS n_hours,
           round(l, 3) AS level, round(b, 3) AS trend,
           round(l + b, 3) AS forecast_next
    FROM last
    """,
    tags=("timeseries", "forecast", "recurrence", "udf"),
)
def q_holt_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend exponential smoothing (alpha=0.5, beta=0.3)
    over each type's hourly count series: final level, trend, and the
    one-step-ahead forecast — the minimal load-forecast every capacity
    dashboard runs, and the registry's demonstration of a SEQUENTIAL
    RECURRENCE operator: the update l_t = a*y_t + (1-a)*(l+b) cannot
    be expressed as a window (each state depends on the previous
    OUTPUT, not input), so Spark runs it as a grouped applyInPandas
    kernel while the oracle computes the identical fixpoint with a
    recursive CTE — one of the few iterative algorithms with an exact
    SQL oracle.

    Scale shape: the corpus collapses to per-(type, hour) counts first
    (one partial-agg pass); the recurrence then runs per type over a
    DIMENSION-sized series (bounded by the time range, never by event
    count), one group per task. Both engines evaluate the same IEEE
    double operations in the same order, so results agree to full
    precision; rounded at 3 dp at the edge. Types with fewer than two
    hours have no defined trend and are excluded in both engines."""
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count("*").cast("double").alias("y"))

    def holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("hour")
        y = pdf["y"].to_numpy(dtype="float64")
        if len(y) < 2:
            return pd.DataFrame(
                columns=["event_type", "n_hours", "level", "trend", "forecast_next"]
            )
        level = y[0]
        trend = y[1] - y[0]
        for t in range(1, len(y)):
            new_level = 0.5 * y[t] + 0.5 * (level + trend)
            trend = 0.3 * (new_level - level) + 0.7 * trend
            level = new_level
        return pd.DataFrame(
            [
                {
                    "event_type": pdf["event_type"].iloc[0],
                    "n_hours": len(y),
                    "level": round(level, 3),
                    "trend": round(trend, 3),
                    "forecast_next": round(level + trend, 3),
                }
            ]
        )

    return hourly.groupBy("event_type").applyInPandas(
        holt,
        "event_type string, n_hours bigint, level double, trend double, "
        "forecast_next double",
    )


_RL_CAP = 2.0
# 1 token per hour. CASTs matter: bare numeric literals are DECIMAL in
# DuckDB, which would run the whole recurrence in decimal arithmetic and
# diverge from the kernel's IEEE doubles.
_RL_RATE_SQL = "(CAST(1.0 AS DOUBLE) / 3600.0)"


@query(
    "q_rate_limit_replay",
    oracle=f"""
    WITH RECURSIVE e AS (
        SELECT user_id, event_id, epoch_us(ts) // 1000000 AS s,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ),
    rec AS (
        SELECT user_id, rn, s, TRUE AS allowed,
               CAST({_RL_CAP} AS DOUBLE) - 1.0 AS tok
        FROM e WHERE rn = 1
        UNION ALL
        SELECT e.user_id, e.rn, e.s,
               least(CAST({_RL_CAP} AS DOUBLE), r.tok + (e.s - r.s) * {_RL_RATE_SQL}) >= 1.0,
               CASE WHEN least(CAST({_RL_CAP} AS DOUBLE), r.tok + (e.s - r.s) * {_RL_RATE_SQL}) >= 1.0
                    THEN least(CAST({_RL_CAP} AS DOUBLE), r.tok + (e.s - r.s) * {_RL_RATE_SQL}) - 1.0
                    ELSE least(CAST({_RL_CAP} AS DOUBLE), r.tok + (e.s - r.s) * {_RL_RATE_SQL})
               END
        FROM rec r JOIN e ON e.user_id = r.user_id AND e.rn = r.rn + 1
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(*) FILTER (allowed) AS BIGINT) AS n_allowed,
           CAST(count(*) FILTER (NOT allowed) AS BIGINT) AS n_deferred
    FROM rec GROUP BY user_id
    """,
    tags=("streaming-adjacent", "flow-control", "recurrence", "udf"),
)
def q_rate_limit_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic replay of the streaming token-bucket flow-control
    policy (streaming/stateful.rate_limit_stream: capacity 2, refill 1
    token/hour) over the historical log: per user, how many events the
    policy would have admitted vs deferred — the capacity-planning
    question ('what would this rate limit have done last month?')
    answered from the at-rest log with bit-identical math to the live
    operator (shared bucket_replay kernel). The oracle runs the same
    recurrence as a recursive CTE, so the nonlinear state update —
    which no window function expresses — is still exactly
    hash-checked.

    Scale shape: grouped applyInPandas over per-user slices (the
    shuffle keys on user_id once); each group's replay is a linear
    scan of its own rows. Event-time refill means batch boundaries
    and wall clock cannot change a decision."""
    import pandas as pd

    from ripple_server_spark.streaming.stateful import bucket_replay

    # Epoch-µs computed JVM-side: the kernel consumes plain ints (full
    # ts resolution for the ordering, cheap Arrow transfer — per-value
    # datetime conversion in the worker measured ~3x slower). The
    # explicit numbered repartition matters: this stage's cost is
    # per-GROUP Python overhead, which AQE cannot see — byte-based
    # partition coalescing would happily fold a small-byte/many-group
    # shuffle into one task and serialize every group through a single
    # pandas worker (measured 4x slower at sf0.1).
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_id", F.unix_micros(F.col("ts")).alias("us"))
        .repartition(spark.sparkContext.defaultParallelism, "user_id")
    )

    def replay(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["us", "event_id"])
        secs = (pdf["us"].to_numpy() // 1_000_000)
        allowed, _, _, _ = bucket_replay(secs, _RL_CAP, 1.0 / 3600.0)
        n_ok = int(sum(allowed))
        return pd.DataFrame(
            [
                {
                    "user_id": int(pdf["user_id"].iloc[0]),
                    "n_events": len(secs),
                    "n_allowed": n_ok,
                    "n_deferred": len(secs) - n_ok,
                }
            ]
        )

    return ev.groupBy("user_id").applyInPandas(
        replay, "user_id bigint, n_events bigint, n_allowed bigint, n_deferred bigint"
    )


@query(
    "q_multimodal_resize",
    # Kernel output is media-transform-specific, so the driver-checked
    # contract is the CROSS-IMPLEMENTATION AUDIT (q_ann_ivf_topk
    # pattern): the Python mapInPandas resize kernel's checksum is
    # recomputed independently with JVM md5/unhex expressions on the
    # same rows, and chain_ok flips if they ever disagree — a kernel
    # bug, an Arrow binary-mangling regression, or a schema drift all
    # fail the value hash. DuckDB's md5 is VARCHAR-only, hence the
    # outcome-stated oracle.
    oracle="""
    SELECT doc_id,
           CAST(32 AS BIGINT) AS width,
           CAST(32 AS BIGINT) AS height,
           CAST(16 AS BIGINT) AS n_out_bytes,
           TRUE AS chain_ok
    FROM documents
    """,
    tags=("multimodal", "binary", "udf", "stub-codec"),
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary->binary media transform (thumbnail/resize shape) through
    the registry: every document's payload is resized to 32x32 by the
    mapInPandas kernel (deterministic digest-chain stub here; real PNG
    re-encode whenever Pillow is present — multimodal.py), and the
    kernel's output checksum is verified in-plan against an
    independent JVM implementation of the same digest chain
    (md5 -> unhex -> md5 -> unhex -> md5; one chain block because
    32*32/64 = 16 bytes = exactly one md5 digest).

    Scale shape: the resize is a map-side Arrow pass whose OUTPUT size
    is bounded by the target dims, not the input (the thumbnailing
    property); the audit join is a doc_id equi-join of two map-side
    projections of the same scan."""
    from ripple_server_spark import multimodal as mm

    docs = load_table(spark, sf_dir, "documents")
    resized = mm.resize_documents(docs, target_w=32, target_h=32)
    suffix = F.encode(F.lit(":32x32"), "utf-8")
    seed = F.unhex(F.md5(F.concat(F.encode(F.col("text"), "utf-8"), suffix)))
    expected = F.md5(F.unhex(F.md5(seed)))
    jvm = docs.select("doc_id", expected.alias("expected_checksum"))
    return resized.join(jvm, "doc_id").select(
        "doc_id",
        "width",
        "height",
        F.octet_length("payload").cast("bigint").alias("n_out_bytes"),
        (F.col("checksum") == F.col("expected_checksum")).alias("chain_ok"),
    )
