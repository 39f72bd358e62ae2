"""Training-run assembly operators (round 3): the last mile between a
cleaned corpus and a token stream — deterministic epoch shuffling,
filter-funnel attrition reporting, token-budget selection, and
quality-weighted upsampling. No reference analog (the reference is a
message queue); this is the LLM-data-pipeline surface BASELINE.json
mandates, and every query here has an exact DuckDB oracle (md5-derived
determinism, no rand())."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ripple_server_spark.catalog import load_table
from ripple_server_spark.functions.scalar import xor_fingerprint48
from ripple_server_spark.plans.registry import query

SHUFFLE_SEED = "42"


def _shuffle_key(col):
    return F.md5(F.concat(F.lit(SHUFFLE_SEED + ":"), col.cast("string")))


@query(
    "q_seeded_shuffle",
    oracle=f"""
    SELECT doc_id, source,
           row_number() OVER (
               ORDER BY md5('{SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)), doc_id
           ) AS train_pos
    FROM documents
    """,
    tags=("pipeline", "shuffle", "ordering"),
)
def q_seeded_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle: global training order by
    md5(seed:doc_id) — reproducible across engines and runs (the
    training-data requirement rand() cannot meet), and naturally
    source-interleaving since the hash ignores source locality.

    SCALABLE SHAPE (what this builder implements): a naive global
    row_number() is a single-partition window — the classic 100 TB
    killer. Instead, two-pass position assignment: (1) bucket rows by
    the hash's first byte and count each bucket (a 256-row partial
    aggregate), (2) broadcast the buckets' cumulative offsets back and
    window only WITHIN each bucket, so train_pos = bucket offset +
    local rank and no task ever sees more than ~1/256 of the data.
    Exactly the parquet-file-ordering trick distributed training
    loaders use."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    key = _shuffle_key(F.col("doc_id"))
    keyed = docs.withColumn("k", key).withColumn(
        "b", F.conv(F.substring("k", 1, 2), 16, 10).cast("int")
    )
    counts = keyed.groupBy("b").agg(F.count("*").alias("n"))
    offsets = counts.select(
        "b",
        (
            F.sum("n").over(Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1))
        ).alias("off"),
    ).fillna(0, subset=["off"])
    local = Window.partitionBy("b").orderBy("k", "doc_id")
    return (
        keyed.join(F.broadcast(offsets), on="b")
        .withColumn("train_pos", F.col("off") + F.row_number().over(local))
        .select("doc_id", "source", "train_pos")
    )


@query(
    "q_quality_filter_funnel",
    oracle="""
    SELECT source,
           count(*) AS n_total,
           CAST(sum(CASE WHEN n_chars >= 150 THEN 1 ELSE 0 END) AS BIGINT)
               AS pass_len,
           CAST(sum(CASE WHEN n_chars >= 150
                          AND len(string_split(text, ' ')) >= 25
                     THEN 1 ELSE 0 END) AS BIGINT) AS pass_words,
           CAST(sum(CASE WHEN n_chars >= 150
                          AND len(string_split(text, ' ')) >= 25
                          AND lang IN ('en', 'de', 'fr')
                     THEN 1 ELSE 0 END) AS BIGINT) AS pass_lang
    FROM documents
    GROUP BY source
    """,
    tags=("pipeline", "quality", "funnel"),
)
def q_quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-funnel attrition report: how many documents survive each
    successive cleaning stage (length -> word count -> language), per
    source — the per-stage yield table every corpus-cleaning run logs.
    ONE pass, zero shuffle until the per-source partial aggregate:
    each stage is a conditional aggregate of the conjunction so far,
    so adding stages costs columns, not passes (contrast with running
    the filters as N separate count jobs)."""
    d = load_table(spark, sf_dir, "documents")
    s1 = F.col("n_chars") >= 150
    s2 = s1 & (F.size(F.split(F.col("text"), " ")) >= 25)
    s3 = s2 & F.col("lang").isin("en", "de", "fr")
    flag = lambda c: F.sum(c.cast("int")).cast("bigint")  # noqa: E731
    return d.groupBy("source").agg(
        F.count("*").alias("n_total"),
        flag(s1).alias("pass_len"),
        flag(s2).alias("pass_words"),
        flag(s3).alias("pass_lang"),
    )


_TOKEN_BUDGET = 20000
# Coarse doc_id bucket width for the boundary-stratum cumulative sum; a
# production ANALYZE derives it from table min/max stats. Correctness
# never depends on it (a degenerate single bucket only degrades locally).
_BUDGET_STRIPE = 64


@query(
    "q_token_budget_select",
    oracle="""
    WITH toks AS (
        SELECT doc_id, source, n_chars,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    ranked AS (
        SELECT *,
               sum(n_tokens) OVER (
                   ORDER BY n_chars DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum_tokens
        FROM toks
    )
    SELECT source,
           count(*) AS n_selected,
           CAST(sum(n_tokens) AS BIGINT) AS tokens_selected
    FROM ranked WHERE cum_tokens <= 20000
    GROUP BY source
    """,
    tags=("pipeline", "budget", "window"),
)
def q_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget selection: greedily keep the highest-priority
    documents (priority = n_chars, tie-broken by doc_id) until the
    global token budget is spent; report the per-source composition of
    the selected set.

    Scale shape — NO global running-sum window (the r03 version ran
    one single-partition cumulative window over every document). Same
    result in two histogram passes, all windows over aggregates or
    partitioned by stripe:

    1. Token-sum histogram per priority value (tiny partial agg) +
       cumulative offsets over the histogram rows -> every stratum
       knows how many tokens precede it. Strata that fit entirely are
       admitted by a broadcast semi-join; the single BOUNDARY stratum
       gets its remaining budget.
    2. Inside the boundary stratum only: the striped two-pass
       cumulative sum over doc_id order (coarse doc_id buckets ->
       per-bucket token sums -> broadcast cumulative bucket offsets ->
       local running sum WITHIN a bucket), then filter to the
       remaining budget.

    Exactness: every row's global cum_tokens = stratum offset + its
    within-stratum running sum, and n_tokens >= 1 (split('') has one
    element) so excluded strata can never re-enter at the boundary."""
    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "n_chars",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
    )
    hist = toks.groupBy("n_chars").agg(F.sum("n_tokens").alias("stratum_tokens"))
    wh = Window.orderBy(F.desc("n_chars")).rowsBetween(Window.unboundedPreceding, -1)
    offs = hist.select(
        "n_chars",
        "stratum_tokens",
        F.coalesce(F.sum("stratum_tokens").over(wh), F.lit(0)).alias("cum_before"),
    )
    budget = F.lit(_TOKEN_BUDGET)
    full = offs.filter(F.col("cum_before") + F.col("stratum_tokens") <= budget).select(
        "n_chars"
    )
    boundary = offs.filter(
        (F.col("cum_before") < budget)
        & (F.col("cum_before") + F.col("stratum_tokens") > budget)
    ).select("n_chars", (budget - F.col("cum_before")).alias("remaining"))
    sel_full = toks.join(F.broadcast(full), "n_chars").select("source", "n_tokens")
    bdocs = toks.join(F.broadcast(boundary), "n_chars")
    striped = bdocs.withColumn(
        "_stripe", F.floor(F.col("doc_id") / _BUDGET_STRIPE).cast("bigint")
    )
    scount = striped.groupBy("_stripe").agg(F.sum("n_tokens").alias("_sn"))
    ws = Window.orderBy("_stripe").rowsBetween(Window.unboundedPreceding, -1)
    soffs = scount.select(
        "_stripe", F.coalesce(F.sum("_sn").over(ws), F.lit(0)).alias("_soff")
    )
    wloc = Window.partitionBy("_stripe").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sel_bnd = (
        striped.join(F.broadcast(soffs), "_stripe")
        .withColumn("_cum", F.col("_soff") + F.sum("n_tokens").over(wloc))
        .filter(F.col("_cum") <= F.col("remaining"))
        .select("source", "n_tokens")
    )
    return (
        sel_full.unionByName(sel_bnd)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_selected"),
            F.sum("n_tokens").cast("bigint").alias("tokens_selected"),
        )
    )


@query(
    "q_upsample_by_weight",
    oracle="""
    WITH weighted AS (
        SELECT doc_id, source,
               CASE WHEN n_chars >= 300 THEN 3
                    WHEN n_chars >= 150 THEN 2
                    ELSE 1 END AS w
        FROM documents
    ),
    expanded AS (
        SELECT doc_id, source, unnest(range(1, w + 1)) AS copy FROM weighted
    )
    SELECT source,
           count(DISTINCT doc_id) AS n_docs,
           count(*) AS n_copies,
           bit_xor(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
                                       || CAST(copy AS VARCHAR)), 1, 12))::BIGINT)
               AS sample_hash
    FROM expanded
    GROUP BY source
    """,
    tags=("pipeline", "sampling", "upsample"),
)
def q_upsample_by_weight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted upsampling (epoch mixing): replicate each
    document w times (w from a quality tier — the data-mixture lever
    for underrepresented high-quality sources), emitting (doc, copy)
    rows whose per-source multiset is fingerprinted order-independently
    (bit_xor of md5) so the oracle verifies the SAMPLE, not just its
    size. explode(sequence(1, w)) is a narrow map-side fan-out — rows
    multiply but never shuffle until the final per-source aggregate."""
    d = load_table(spark, sf_dir, "documents")
    w = (
        F.when(F.col("n_chars") >= 300, 3)
        .when(F.col("n_chars") >= 150, 2)
        .otherwise(1)
    )
    expanded = d.select(
        "doc_id", "source", F.explode(F.sequence(F.lit(1), w)).alias("copy")
    )
    return expanded.groupBy("source").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count("*").alias("n_copies"),
        F.expr(
            xor_fingerprint48("concat(cast(doc_id as string), ':', cast(copy as string))")
        ).alias("sample_hash"),
    )
