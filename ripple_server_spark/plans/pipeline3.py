"""Round-2 additions: regex-based content filters (PII flags,
repetition quality) and the bucketed co-located join as a DECLARED
query (previously plan-test-only).

Regex note: patterns are restricted to the syntax subset that Java
regex (Spark) and RE2 (DuckDB) interpret identically — character
classes, +, literal dots — no lookarounds, no backreferences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ripple_server_spark.catalog import load_table
from ripple_server_spark.plans.registry import query

# Both-engine-safe patterns (see module docstring).
EMAIL_RE = "[a-z0-9._]+@[a-z0-9.]+[a-z]"
URL_RE = "https?://[a-z0-9./_-]+"


@query(
    "q_text_pii_flags",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, '{URL_RE}')) AS BIGINT) AS n_urls,
           (len(regexp_extract_all(text, '{EMAIL_RE}')) > 0
            OR len(regexp_extract_all(text, '{URL_RE}')) > 0) AS flagged
    FROM documents
    """,
    tags=("text", "pipeline", "filter", "regex"),
)
def q_text_pii_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII / link surface scan: per-document email and URL mention
    counts plus a scrub-queue flag — the cheap first pass before an
    expensive anonymization stage touches only flagged docs.

    Scale: codegen regexp over the scan, no shuffle; the flag column
    is exactly the pushdown predicate the scrub stage filters on."""
    docs = load_table(spark, sf_dir, "documents")
    # idx=0 (whole match): the patterns have no capture groups, and
    # Spark's regexp_extract_all defaults to group 1, which throws
    # REGEX_GROUP_INDEX on the first matching row otherwise.
    n_emails = F.size(F.regexp_extract_all(F.col("text"), F.lit(EMAIL_RE), F.lit(0)))
    n_urls = F.size(F.regexp_extract_all(F.col("text"), F.lit(URL_RE), F.lit(0)))
    return docs.select(
        "doc_id",
        n_emails.cast("bigint").alias("n_emails"),
        n_urls.cast("bigint").alias("n_urls"),
        ((n_emails > 0) | (n_urls > 0)).alias("flagged"),
    )


@query(
    "q_text_repetition",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    grams AS (
      SELECT doc_id, w[i] || ' ' || w[i + 1] AS g
      FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM t)
    ),
    counts AS (
      SELECT doc_id, g, count(*) AS c FROM grams GROUP BY doc_id, g
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_grams,
           round(max(c) / sum(c), 6) AS top_gram_frac,
           round(1.0 - count(*) / sum(c), 6) AS dup_gram_frac
    FROM counts GROUP BY doc_id
    """,
    tags=("text", "pipeline", "quality"),
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals (the Gopher-rules family): per
    doc, the most-frequent-2-gram fraction and the duplicate-2-gram
    fraction — high values mark boilerplate/spam for the quality gate.

    Scale: explode to 2-grams then two partial-aggregated groupBys on
    doc_id — shuffle keyed by the same column both times, so AQE
    coalesces; no Python anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", F.split(F.col("text"), " ").alias("w"))
    # Guard size(w) >= 2: Spark's sequence(1, 0) steps DOWN to [1, 0],
    # so a 1-token doc would index past the array (ANSI error); the
    # oracle's range(1, len(w)) is empty for those docs, so both
    # engines now emit no row for them.
    t = t.where(F.size("w") >= 2)
    grams = t.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, size(w) - 1), i -> concat(w[i-1], ' ', w[i]))")
        ).alias("g"),
    )
    counts = grams.groupBy("doc_id", "g").agg(F.count("*").alias("c"))
    return counts.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_grams"),
        F.round(F.max("c") / F.sum("c"), 6).alias("top_gram_frac"),
        F.round(F.lit(1.0) - F.count("*") / F.sum("c"), 6).alias("dup_gram_frac"),
    )


@query(
    "q_fact_join_bucketed",
    oracle="""
    SELECT l.l_orderkey, CAST(count(*) AS BIGINT) AS n_lines,
           o.o_custkey,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18, 6))
                     * (1 - CAST(l.l_discount AS DECIMAL(18, 6)))), 2) AS DOUBLE) AS revenue
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY l.l_orderkey, o.o_custkey
    """,
    tags=("join", "bucketed", "colocated", "agg"),
)
def q_fact_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join on CO-BUCKETED at-rest layout: both tables are
    written hash-bucketed + sorted on the join key, so the join itself
    needs no Exchange on either side (SortMergeJoin over zipper-merged
    bucket files; asserted in tests/test_bucketed.py and here by the
    declared plan's absence of a join-side shuffle). This is the at-rest
    answer to the biggest 100 TB cost in the TPC-H shapes — the
    lineitem x orders shuffle.

    The bucketed copies are materialized once per (sf_dir, application)
    into the local warehouse and reused across runs within the process
    (the legitimate ETL-once pattern bucketing assumes). The tag folds
    in the Spark applicationId: the tableExists gate is session-scoped,
    so two CONCURRENT processes sharing a pure sf_dir-keyed path would
    race — one re-materializes (mode("overwrite") deletes first) while
    the other holds the old file listing → FileNotFoundException
    mid-join (observed as a parity-test flake in r12)."""
    import hashlib

    from ripple_server_spark.sources.bucketed import read_table, write_bucketed

    tag = hashlib.md5(
        f"{sf_dir}|{spark.sparkContext.applicationId}".encode()
    ).hexdigest()[:10]
    lt, ot = f"b_lineitem_{tag}", f"b_orders_{tag}"
    cat = spark.catalog
    if not cat.tableExists(lt) or not cat.tableExists(ot):
        import tempfile

        base = tempfile.gettempdir() + f"/ripple_bucketed_{tag}"
        write_bucketed(
            load_table(spark, sf_dir, "lineitem"), lt, "l_orderkey", 8, base + "/l"
        )
        write_bucketed(
            load_table(spark, sf_dir, "orders"), ot, "o_orderkey", 8, base + "/o"
        )
    li, orders = read_table(spark, lt), read_table(spark, ot)
    dec = lambda c: F.col(c).cast("decimal(18,6)")  # noqa: E731
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_orderkey", "o_custkey")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.round(F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))), 2)
            .cast("double")
            .alias("revenue"),
        )
        .select("l_orderkey", "n_lines", "o_custkey", "revenue")
    )
