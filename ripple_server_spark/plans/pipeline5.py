"""Corpus-hygiene operators (round 3): span-level boilerplate removal,
unigram-LM quality scoring, per-source quota capping, Zipf corpus
audit, and Bloom-filter decontamination. No reference analog (the
reference is a message queue — SURVEY.md §2); this extends the
LLM-data-pipeline surface BASELINE.json mandates. Every query has an
exact DuckDB oracle: determinism comes from md5-derived hashing and
integer counting, never rand() or float-order-sensitive reductions
(the one float output, the Zipf slope, is rounded well above the
summation-order noise floor).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ripple_server_spark.catalog import load_table
from ripple_server_spark.config import JACCARD_THRESHOLD
from ripple_server_spark.functions.text import shingles_pandas, spans_pandas
from ripple_server_spark.operators import dedup as _dedup
from ripple_server_spark.plans.registry import query

# Span width for boilerplate removal: non-overlapping W-word segments
# stand in for "lines" (the fixture corpus is single-line text); the
# operator is the Common-Crawl-style repeated-line dedup with the line
# boundary generalized to a fixed word window.
SPAN_WORDS = 8
# A span present in >= this many distinct docs is boilerplate.
SPAN_DOC_THRESHOLD = 3

# 48-bit md5 prefix as BIGINT: the engine-portable order-independent
# fingerprint primitive (same construction as q_upsample_by_weight).
from ripple_server_spark.functions.scalar import H48_SQL as _H48  # noqa: E402


@query(
    "q_span_dedup",
    oracle=f"""
    WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
    spans AS (
        SELECT doc_id, source, i AS span_idx,
               array_to_string(w[(i * {SPAN_WORDS} + 1):((i + 1) * {SPAN_WORDS})], ' ')
                   AS span
        FROM t, unnest(range(0, CAST(ceil(len(w) / {SPAN_WORDS}.0) AS BIGINT))) AS u(i)
    ),
    boiler AS (
        SELECT span FROM spans
        GROUP BY span HAVING count(DISTINCT doc_id) >= {SPAN_DOC_THRESHOLD}
    ),
    per_doc AS (
        SELECT s.doc_id, s.source,
               count(*) AS n_spans,
               count(*) FILTER (b.span IS NOT NULL) AS n_dropped,
               coalesce(string_agg(s.span, ' ' ORDER BY s.span_idx)
                            FILTER (b.span IS NULL), '') AS kept_text
        FROM spans s LEFT JOIN boiler b ON b.span = s.span
        GROUP BY s.doc_id, s.source
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_spans) AS BIGINT) AS n_spans,
           CAST(sum(n_dropped) AS BIGINT) AS n_spans_dropped,
           bit_xor(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || kept_text),
                                   1, 12))::BIGINT) AS kept_hash
    FROM per_doc GROUP BY source
    """,
    tags=("pipeline", "dedup", "text", "boilerplate"),
    bench=True,
)
def q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-span (line-level) boilerplate removal: segment every
    document into non-overlapping 8-word spans, drop each
    span that occurs in >= 3 distinct documents
    corpus-wide (headers/footers/licenses in a real crawl), and
    reassemble the surviving text in order. Per-source report carries a
    bit_xor fingerprint of (doc_id, reassembled text) so the oracle
    verifies the actual reassembly, not just counts.

    Scale shape: span extraction is a narrow map-side fan-out (no
    shuffle, rows multiply ~n_words/{SPAN_WORDS}); the boilerplate set
    is one partial-agg count shuffled on span; it is tiny (only spans
    crossing the threshold) so the drop join broadcasts. Reassembly
    sorts WITHIN each doc's collected spans — no global sort. One
    corpus-sized shuffle total (the per-doc groupBy)."""
    docs = load_table(spark, sf_dir, "documents")
    # Arrow span kernel + posexplode: the HOF-expression alternative
    # captures split(text) in its lambda and re-splits per span (lambdas
    # block codegen subexpression elimination).
    spans = docs.select(
        "doc_id",
        "source",
        F.posexplode(spans_pandas(F.col("text"), SPAN_WORDS)).alias(
            "span_idx", "span"
        ),
    )
    boiler = (
        spans.groupBy("span")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= SPAN_DOC_THRESHOLD)
        .select("span", F.lit(1).alias("is_boiler"))
    )
    flagged = spans.join(F.broadcast(boiler), "span", "left")
    # collect_list skips nulls, so kept spans are exactly the non-boiler
    # rows; array_sort on (span_idx, span) structs restores doc order.
    kept_struct = F.when(
        F.col("is_boiler").isNull(), F.struct("span_idx", "span")
    )
    per_doc = flagged.groupBy("doc_id", "source").agg(
        F.count("*").alias("n_spans"),
        F.count("is_boiler").alias("n_dropped"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda x: x["span"]
            ),
            " ",
        ).alias("kept_text"),
    )
    fp = _H48.format(
        expr="concat(cast(doc_id as string), ':', kept_text)"
    )
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_spans").cast("bigint").alias("n_spans"),
        F.sum("n_dropped").cast("bigint").alias("n_spans_dropped"),
        F.expr(f"bit_xor({fp})").alias("kept_hash"),
    )


# Minimum duplicate run length (words) for variable-length substring
# dedup: a position is removed iff it lies inside a substring of >= this
# many words that occurs at least twice corpus-wide (ExactSubstr
# semantics, Lee et al. 2022 "Deduplicating Training Data Makes
# Language Models Better" — gram-anchored: every position of a
# duplicated run of length >= L is covered by some duplicated L-gram
# window, and conversely, so L-gram coverage IS the exact variable-
# length answer, no suffix array needed).
SUBSTR_GRAM = 6


@query(
    "q_substring_dedup",
    oracle=f"""
    WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
    grams AS (
        SELECT doc_id, i AS pos,
               md5(array_to_string(w[(i + 1):(i + {SUBSTR_GRAM})], ' ')) AS gh
        FROM t, unnest(range(0, GREATEST(len(w) - {SUBSTR_GRAM - 1}, 0))) AS u(i)
    ),
    dup AS (SELECT gh FROM grams GROUP BY gh HAVING count(*) >= 2),
    cov AS (
        SELECT DISTINCT g.doc_id, g.pos + j AS p
        FROM grams g JOIN dup USING (gh),
             unnest(range(0, {SUBSTR_GRAM})) AS v(j)
    ),
    posd AS (
        SELECT doc_id, source, len(w) AS n_words, i AS p, w[i + 1] AS word
        FROM t, unnest(range(0, len(w))) AS u(i)
    ),
    kept AS (
        SELECT p.doc_id, p.source,
               max(p.n_words) AS n_words,
               count(c.p) AS n_dropped,
               coalesce(string_agg(p.word, ' ' ORDER BY p.p) FILTER (c.p IS NULL),
                        '') AS kept_text
        FROM posd p LEFT JOIN cov c ON c.doc_id = p.doc_id AND c.p = p.p
        GROUP BY p.doc_id, p.source
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS n_words,
           CAST(sum(n_dropped) AS BIGINT) AS n_positions_dropped,
           bit_xor(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || kept_text),
                                   1, 12))::BIGINT) AS kept_hash
    FROM kept GROUP BY source
    """,
    tags=("pipeline", "dedup", "text", "substring"),
    bench=True,
)
def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variable-length repeated-substring dedup (ExactSubstr): remove
    every word position that lies inside a substring of >=
    6 words occurring at least twice anywhere in the
    corpus (across docs OR repeated within one doc), then reassemble
    the survivors in order. Unlike q_span_dedup's fixed non-overlapping
    spans, matches here are stride-1 and variable-length: consecutive
    duplicated 6-gram windows merge into arbitrarily long removed runs,
    which is exactly the suffix-array ExactSubstr answer (a duplicated
    run of length >= L covers a position iff some duplicated L-gram
    window does). Per-source report fingerprints the reassembled text
    (bit_xor over doc-keyed md5-48) so the oracle verifies WHICH bytes
    survive.

    Scale shape: gram hashing is a narrow map-side fan-out (md5 inside
    a codegen'd transform(), ~n_words rows per doc, 16-byte keys — the
    raw gram text never shuffles); duplicate detection is one
    partial-agg count on gh. The candidate join (grams x dup-grams) is
    key-partitioned, NOT forced broadcast — the duplicated-gram set
    grows with corpus redundancy and AQE picks broadcast/skew handling
    from actual sizes. Coverage expansion multiplies candidate rows by
    only L=6 and collapses in the same per-doc
    collect_set (dedup inside the aggregate — no separate DISTINCT
    shuffle). Reassembly is doc-local array filtering, never a global
    sort. No cartesian anywhere (plan-gated)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.split("text", " ").alias("w")
    )
    # parallelism recovery for the single-row-group fixture (the gram
    # md5 transform otherwise runs on one task); no-op at real scale
    target = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < target:
        docs = docs.repartition(target)
    # stride-1 gram hashes with positions; docs shorter than L emit none
    gram_arr = F.expr(
        f"CASE WHEN size(w) >= {SUBSTR_GRAM} THEN "
        f"transform(sequence(0, size(w) - {SUBSTR_GRAM}), "
        f"i -> md5(array_join(slice(w, i + 1, {SUBSTR_GRAM}), ' '))) "
        f"ELSE array() END"
    )
    # Persisted: the gram table feeds the duplicate-hash count AND the
    # coverage join; without it the per-position md5 pass over the
    # corpus ran once per branch.
    grams = docs.select("doc_id", F.posexplode(gram_arr).alias("pos", "gh")).persist()
    dup = (
        grams.groupBy("gh")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= 2)
        .select("gh")
    )
    # Coverage: collect each doc's duplicated gram START positions
    # (1 row per duplicated gram), then expand to the covered window
    # [pos, pos+L-1] in ARRAY land — the old shape exploded L rows per
    # candidate gram before the per-doc aggregate, shuffling 6x the
    # elements for the same covered set (guide §2.3: shuffle fewer
    # bytes; the expansion is deterministic from the starts).
    cov = (
        grams.join(dup, "gh")
        .groupBy("doc_id")
        .agg(F.collect_set("pos").alias("starts"))
        .select(
            "doc_id",
            F.expr(
                "sort_array(array_distinct(flatten(transform(starts, "
                f"p -> sequence(p, p + {SUBSTR_GRAM - 1})))))"
            ).alias("cov"),
        )
    )
    kept = docs.join(cov, "doc_id", "left").select(
        "doc_id",
        "source",
        F.size("w").alias("n_words"),
        F.coalesce(F.size("cov"), F.lit(0)).alias("n_dropped"),
        F.expr(
            "array_join(transform(filter("
            "transform(w, (x, i) -> struct(i AS idx, x AS word)), "
            "s -> cov IS NULL OR NOT array_contains(cov, s.idx)), "
            "s -> s.word), ' ')"
        ).alias("kept_text"),
    )
    fp = _H48.format(expr="concat(cast(doc_id as string), ':', kept_text)")
    return kept.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_words").cast("bigint").alias("n_words"),
        F.sum("n_dropped").cast("bigint").alias("n_positions_dropped"),
        F.expr(f"bit_xor({fp})").alias("kept_hash"),
    )


# DSIR hashed-feature space: 48-bit md5 prefixes folded into this many
# buckets (the paper hashes n-grams into 10^4 buckets; 1024 keeps the
# count tables trivially broadcastable at any corpus size).
DSIR_BUCKETS = 1024
DSIR_TOPK = 100


@query(
    "q_dsir_weights",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang,
               ('0x' || substr(md5(unnest(string_split(text, ' '))), 1, 12))::BIGINT
                   % {DSIR_BUCKETS} AS b
        FROM documents
    ),
    src AS (SELECT b, count(*) AS cs FROM toks GROUP BY b),
    tgt AS (SELECT b, count(*) AS ct FROM toks WHERE lang = 'en' GROUP BY b),
    tot AS (
        SELECT (SELECT count(*) FROM toks) AS ts,
               (SELECT count(*) FROM toks WHERE lang = 'en') AS tt
    ),
    doc_lw AS (
        SELECT t.doc_id, t.lang,
               count(*) AS n_tokens,
               round(sum(ln((coalesce(g.ct, 0) + 1.0) / (tot.tt + {DSIR_BUCKETS}))
                       - ln((s.cs + 1.0) / (tot.ts + {DSIR_BUCKETS}))), 6) AS lw
        FROM toks t
        JOIN src s USING (b)
        LEFT JOIN tgt g USING (b)
        CROSS JOIN tot
        GROUP BY t.doc_id, t.lang
    ),
    sel AS (
        SELECT doc_id FROM doc_lw
        QUALIFY row_number() OVER (ORDER BY lw DESC, doc_id ASC) <= {DSIR_TOPK}
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(count(sel.doc_id) AS BIGINT) AS n_selected,
           round(avg(lw), 4) AS mean_logw,
           bit_xor(CASE WHEN sel.doc_id IS NOT NULL
                   THEN ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 12))::BIGINT
                   END) AS sel_hash
    FROM doc_lw d LEFT JOIN sel ON sel.doc_id = d.doc_id
    GROUP BY lang
    """,
    tags=("pipeline", "sampling", "importance", "mixture"),
)
def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling (Xie et al. 2023, Data Selection via
    Importance Resampling): score every raw-corpus document by how
    target-like its hashed unigram features are — log weight =
    sum over tokens of ln p_target(bucket) - ln p_raw(bucket), with
    add-one smoothing over 1024 md5-hashed buckets —
    then select the top-100 weighted docs as the
    resampled set. Target distribution here = the English slice
    (lang='en'), the standard 'quality proxy' setup. Report per lang:
    corpus size, selected count, mean log weight, and a selected-set
    fingerprint so the oracle verifies WHICH docs are chosen.

    Scale shape: both bucket-count tables are fixed-size
    (1024 rows — broadcast regardless of corpus
    size), so the scoring pass is two broadcast joins on the token
    stream with no corpus shuffle until the per-doc aggregate; the
    top-k select is TakeOrdered (never a global sort); totals ride a
    1-row broadcast cross join. At 100 TB the whole plan is one
    corpus-keyed shuffle (the per-doc groupBy) — identical to the
    unigram-LM scorer's layout."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(F.split("text", " ")).alias("tok"),
    ).withColumn(
        "b",
        F.expr(
            f"pmod(cast(conv(substring(md5(tok), 1, 12), 16, 10) as bigint), "
            f"{DSIR_BUCKETS})"
        ),
    )
    src = toks.groupBy("b").agg(F.count("*").alias("cs"))
    tgt = toks.filter(F.col("lang") == "en").groupBy("b").agg(
        F.count("*").alias("ct")
    )
    tot = toks.agg(
        F.count("*").alias("ts"),
        F.count(F.when(F.col("lang") == "en", 1)).alias("tt"),
    )
    doc_lw = (
        toks.join(F.broadcast(src), "b")
        .join(F.broadcast(tgt), "b", "left")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.sum(
                    F.log(
                        (F.coalesce(F.col("ct"), F.lit(0)) + 1.0)
                        / (F.col("tt") + DSIR_BUCKETS)
                    )
                    - F.log((F.col("cs") + 1.0) / (F.col("ts") + DSIR_BUCKETS))
                ),
                6,
            ).alias("lw"),
        )
    )
    sel = (
        doc_lw.orderBy(F.desc("lw"), F.asc("doc_id"))
        .limit(DSIR_TOPK)
        .select("doc_id", F.lit(1).alias("is_sel"))
    )
    fp = _H48.format(expr="cast(doc_id as string)")
    return (
        doc_lw.join(F.broadcast(sel), "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.count("is_sel").alias("n_selected"),
            F.round(F.avg("lw"), 4).alias("mean_logw"),
            F.expr(f"bit_xor(CASE WHEN is_sel IS NOT NULL THEN {fp} END)").alias(
                "sel_hash"
            ),
        )
    )


@query(
    "q_unigram_logprob",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    vocab AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
    total AS (SELECT count(*) AS t FROM toks)
    SELECT doc_id,
           count(*) AS n_tokens,
           round(ln((SELECT t FROM total)) - avg(ln(v.c)), 4) AS nll
    FROM toks JOIN vocab v USING (tok)
    GROUP BY doc_id
    """,
    tags=("pipeline", "quality", "lm", "text"),
)
def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality score: train token frequencies on the corpus
    itself (one groupBy), then score every document by its mean
    negative log-probability — the cheap perplexity proxy used to
    rank/flter pretraining text (high nll = rare-token gibberish, low
    nll = repetitive boilerplate). nll = ln(T) - mean(ln(count(tok)))
    keeps all aggregation in integer counts until one final ln/avg.

    Scale shape: the vocab table is vocabulary-sized (millions of rows
    at 100 TB, far under the broadcast cap after the count agg); the
    scoring join is therefore a broadcast map-side join — the corpus
    token stream never shuffles until the per-doc aggregate. The global
    token total is a 1-row broadcast cross join."""
    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count("*").alias("c"))
    total = toks.agg(F.count("*").alias("t"))
    return (
        toks.join(F.broadcast(vocab), "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.first(F.log("t")) - F.avg(F.log("c")), 4
            ).alias("nll"),
        )
    )


@query(
    "q_source_quota_cap",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5('quota:' || CAST(doc_id AS VARCHAR)), doc_id
               ) AS rn
        FROM documents
    )
    SELECT source,
           count(*) AS n_before,
           CAST(sum(CASE WHEN rn <= 15 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           bit_xor(CASE WHEN rn <= 15
                        THEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
                   END) AS kept_hash
    FROM ranked GROUP BY source
    """,
    tags=("pipeline", "sampling", "quota", "window"),
)
def q_source_quota_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota cap (domain balancing): keep at most 15 docs
    per source, chosen by deterministic md5 order — the anti-domination
    lever that stops one crawl domain from flooding the mixture. The
    kept set is fingerprinted (bit_xor over kept doc hashes) so the
    oracle verifies WHICH docs survive, not just how many.

    Scale shape: one window partitioned BY SOURCE (never global); a
    skewed mega-domain is exactly the case the cap exists for — if one
    source's partition is too large for a task, pre-filter with an
    approximate per-source count and sample before ranking (same
    two-pass trick as q_seeded_shuffle)."""
    docs = load_table(spark, sf_dir, "documents")
    rank_key = F.md5(F.concat(F.lit("quota:"), F.col("doc_id").cast("string")))
    rn = F.row_number().over(
        Window.partitionBy("source").orderBy(rank_key, F.col("doc_id"))
    )
    kept_h = _H48.format(expr="cast(doc_id as string)")
    return (
        docs.select("doc_id", "source")
        .withColumn("rn", rn)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_before"),
            F.sum((F.col("rn") <= 15).cast("int")).cast("bigint").alias("n_kept"),
            F.expr(f"bit_xor(case when rn <= 15 then {kept_h} end)").alias(
                "kept_hash"
            ),
        )
    )


@query(
    "q_zipf_slope",
    oracle="""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    vocab AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
    ranked AS (
        SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS rank FROM vocab
    )
    SELECT CAST(count(*) AS BIGINT) AS n_vocab,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           round(regr_slope(ln(c), ln(rank)), 4) AS zipf_slope
    FROM ranked WHERE rank <= 1000
    """,
    tags=("pipeline", "stats", "corpus"),
)
def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus Zipf audit: regression slope of log-frequency vs log-rank
    over the top-1000 vocabulary. Natural text sits near -1; a corpus
    whose slope drifts far from it is machine-generated, boilerplate-
    heavy, or truncated — a one-row health metric data teams track
    per crawl snapshot.

    Scale shape: everything after the token count is vocabulary-sized;
    the rank window orders at most the top-1000 rows that survive the
    frequency cut... except ranking must precede the cut, so the window
    runs over the vocab table — vocabulary-sized, not corpus-sized, and
    single-partition only over ~1e6-row vocab aggregates (acceptable; a
    100 TB deployment would pre-prune with an approx frequency floor)."""
    toks = load_table(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count("*").alias("c"))
    # Cut FIRST via orderBy+limit (TakeOrderedAndProject: per-partition
    # top-k + k-row merge), then rank within the surviving 1000 rows —
    # the former rank-then-filter form sorted the whole vocab through
    # one task's window.
    top = vocab.orderBy(F.desc("c"), F.asc("tok")).limit(1000)
    ranked = top.withColumn(
        "rank", F.row_number().over(Window.orderBy(F.desc("c"), F.asc("tok")))
    )
    return ranked.agg(
        F.count("*").cast("bigint").alias("n_vocab"),
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.round(F.regr_slope(F.log("c"), F.log("rank")), 4).alias("zipf_slope"),
    )


# Bloom geometry: m = 2^16 bits (three independent 16-bit positions per
# gram fall out of one md5 as 4-hex-digit slices — no modulo, so Spark
# and DuckDB agree bit-for-bit), k = 3.
_BLOOM_K_OFFSETS = (1, 5, 9)


def _bloom_positions_sql(gram_expr: str) -> list[str]:
    return [
        f"('0x' || substr(md5({gram_expr}), {o}, 4))::BIGINT"
        for o in _BLOOM_K_OFFSETS
    ]


def bloom_doc_flags(docs: DataFrame, bench_below: int = 10) -> DataFrame:
    """Per-doc Bloom + exact contamination flags: (doc_id, source,
    bloomed, exact) for every corpus doc (doc_id >= bench_below); the
    benchmark is docs with doc_id < bench_below. Factored out of
    q_bloom_decontaminate so property tests can drive it on arbitrary
    tables (tests/test_property.py cross-checks against a pure-Python
    Bloom simulation).

    Round-12 shape (guide §2.3 "shuffle keys/metadata instead of
    payloads", §4.2/§4.3 "one kernel pass, only the columns it
    needs"): the Bloom filter IS what ships — the BENCH side folds on
    the driver (the benchmark suite is a handful of docs by contract,
    doc_id < bench_below, collected under the same bounded-broadcast
    rationale as similarity._collect_query_rows), yielding the set-bit
    positions (bounded at <= 2^16 by filter geometry) and the bench
    gram set. Both are closure-shipped into ONE Arrow corpus pass that
    computes each doc's 5-grams, its Bloom flag (all k md5-slice
    positions set), and — only for Bloom-flagged docs, since a Bloom
    filter has no per-gram false negatives and exact hits are a subset
    of flagged docs — the exact-membership audit flag. hashlib.md5 on
    UTF-8 bytes == F.md5 and str.split(" ") + k-gram join == the
    shingles_pandas kernel (equivalence pinned by the pure-Python
    simulation test), so the flags are bit-identical to the old
    three-stage form, which paid a corpus gram-array transfer out of
    the Python kernel, a JVM md5 x k per gram under exists(), a persist
    of the gram arrays, an explode + semi-join of flagged docs' grams,
    and a broadcast join to reattach the exact bit. The corpus now
    crosses the Python boundary once (doc_id, source, text in; two
    flags out) and the plan has zero joins and zero corpus shuffles.

    At 100 TB the exact arm would be sampled (docstring contract of
    q_bloom_decontaminate); the bench gram set shipped here is
    eval-suite-sized, and the ~8 KB position set is the part that must
    scale.
    """
    spark = docs.sparkSession
    # parallelism recovery for the single-row-group local fixture; at
    # real scale input splits >> cores and this is a no-op (same
    # pattern as minhash_band_hashes_from_docs)
    target = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < target:
        docs = docs.repartition(target)
    import hashlib

    bench_grams: set[str] = set()
    for r in docs.filter(F.col("doc_id") < bench_below).select("text").collect():
        w = r["text"].split(" ") if r["text"] is not None else []
        if len(w) >= 5:
            bench_grams.update(" ".join(w[i : i + 5]) for i in range(len(w) - 4))
    set_bits: set[int] = set()
    for g in bench_grams:
        h = hashlib.md5(g.encode("utf-8")).hexdigest()
        for o in _BLOOM_K_OFFSETS:
            set_bits.add(int(h[o - 1 : o + 3], 16))
    bench_frozen = frozenset(bench_grams)
    bits_frozen = frozenset(set_bits)

    def kernel(batches):
        # r13 batch form (guide §4.2, VERDICT r12 item 5): the per-gram
        # pure-Python loop (join -> md5 -> hexdigest -> int(hex) x3 ->
        # set probes, ~2 us/gram) becomes one md5-digest list
        # comprehension plus NumPy for everything around it — positions
        # sliced vectorized from the concatenated digests (hex offsets
        # (1,5,9) are digest bytes [0:2]/[2:4]/[4:6]; (d0<<8)|d1 ==
        # int(hexdigest[0:4], 16)), membership via a 64 Ki bool lookup
        # table, per-doc ANY via np.repeat(doc index, gram counts).
        # Byte-splitting on b" " equals str-split+encode because 0x20
        # never occurs inside a UTF-8 multi-byte sequence. Measured
        # 1.9x per batch, bit-identical (the pure-Python Bloom
        # simulation property test pins it); ~77% of the remaining time
        # is the openssl md5 calls themselves — the floor while the
        # filter geometry is defined over md5 (no offline batch-md5
        # exists: DuckDB's vectorized md5 measured 1.3x only by using
        # every core, a per-core regression).
        from hashlib import md5

        import numpy as np

        bits = np.zeros(1 << 16, dtype=bool)
        if bits_frozen:
            bits[np.fromiter(bits_frozen, dtype=np.int64)] = True
        bench_bytes = frozenset(g.encode("utf-8") for g in bench_frozen)
        for pdf in batches:
            texts = pdf["text"]
            n_docs = len(texts)
            grams: list[bytes] = []
            counts = np.empty(n_docs, dtype=np.int64)
            for j, t in enumerate(texts):
                wb = t.encode("utf-8").split(b" ") if t is not None else []
                n = len(wb) - 4
                if n > 0:
                    grams.extend(b" ".join(wb[i : i + 5]) for i in range(n))
                    counts[j] = n
                else:
                    counts[j] = 0
            blooms = np.zeros(n_docs, dtype=np.int32)
            exacts = np.zeros(n_docs, dtype=np.int32)
            if grams:
                digs = b"".join([md5(g).digest() for g in grams])
                arr = (
                    np.frombuffer(digs, dtype=np.uint8)
                    .reshape(-1, 16)[:, :6]
                    .astype(np.int32)
                )
                hit = (
                    bits[(arr[:, 0] << 8) | arr[:, 1]]
                    & bits[(arr[:, 2] << 8) | arr[:, 3]]
                    & bits[(arr[:, 4] << 8) | arr[:, 5]]
                )
                doc_idx = np.repeat(np.arange(n_docs), counts)
                blooms[doc_idx[hit]] = 1
                # exact <=> gram-level bench membership; only bloom-hit
                # grams can be members (no false negatives), so the set
                # probe runs over the (rare) hits only
                for gi in np.flatnonzero(hit):
                    if grams[gi] in bench_bytes:
                        exacts[doc_idx[gi]] = 1
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "source": pdf["source"],
                    "bloomed": pd.Series(blooms),
                    "exact": pd.Series(exacts),
                }
            )

    return (
        docs.filter(F.col("doc_id") >= bench_below)
        .select("doc_id", "source", "text")
        .mapInPandas(
            kernel, "doc_id long, source string, bloomed int, exact int"
        )
    )


@query(
    "q_bloom_decontaminate",
    oracle=f"""
    WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
    idx AS (SELECT doc_id, source, unnest(range(1, greatest(len(w) - 3, 1))) AS i, w
            FROM t),
    grams AS (
        SELECT DISTINCT doc_id, source,
               w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]
                   AS gram
        FROM idx
    ),
    bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id < 10),
    bits AS (
        SELECT DISTINCT pos FROM bench,
        unnest([{", ".join(_bloom_positions_sql("gram"))}]) AS u(pos)
    ),
    corpus_pos AS (
        SELECT g.doc_id, g.source, g.gram, u.pos
        FROM grams g, unnest([{", ".join(_bloom_positions_sql("g.gram"))}]) AS u(pos)
        WHERE g.doc_id >= 10
    ),
    bloom_pos_grams AS (
        SELECT doc_id, source, gram
        FROM corpus_pos c JOIN bits b ON b.pos = c.pos
        GROUP BY doc_id, source, gram
        HAVING count(*) = {len(_BLOOM_K_OFFSETS)}
    ),
    exact_grams AS (
        SELECT g.doc_id, g.gram FROM grams g
        JOIN bench b ON b.gram = g.gram WHERE g.doc_id >= 10
    ),
    per_doc AS (
        SELECT d.doc_id, d.source,
               CASE WHEN EXISTS (SELECT 1 FROM bloom_pos_grams p
                                 WHERE p.doc_id = d.doc_id) THEN 1 ELSE 0 END AS bloomed,
               CASE WHEN EXISTS (SELECT 1 FROM exact_grams e
                                 WHERE e.doc_id = d.doc_id) THEN 1 ELSE 0 END AS exact
        FROM documents d WHERE d.doc_id >= 10
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(bloomed) AS BIGINT) AS n_bloom_flagged,
           CAST(sum(exact) AS BIGINT) AS n_exact_flagged,
           CAST(sum(bloomed) - sum(exact) AS BIGINT) AS n_false_pos
    FROM per_doc GROUP BY source
    """,
    tags=("pipeline", "decontamination", "sketch", "bloom"),
    bench=True,
)
def q_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter benchmark decontamination with an in-plan exactness
    audit. The benchmark 5-gram set (doc_id < 10 stands in for the eval
    suite, as in q_decontaminate) is folded into a 2^16-bit Bloom
    filter; corpus docs are flagged when any of their grams hits all
    k=3 bloom positions. Because a Bloom filter has no false negatives,
    exact-flagged docs are a subset of bloom-flagged docs — the plan
    computes both and reports n_false_pos = bloom - exact per source,
    so the driver verifies the filter's soundness AND measures its
    precision (same auditable-estimator contract as q_ann_ivf_topk).

    Scale shape: at 100 TB the bloom bit set is what ships — ~8 KB
    here, <=2^16 distinct positions always, broadcast to every task
    regardless of benchmark size (the exact gram set, broadcast in
    q_decontaminate, can be GBs); membership is then a map-side join.
    The exact arm exists for the audit and would be sampled in
    production."""
    docs = load_table(spark, sf_dir, "documents")
    flagged = bloom_doc_flags(docs)
    return flagged.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("bloomed").cast("bigint").alias("n_bloom_flagged"),
        F.sum("exact").cast("bigint").alias("n_exact_flagged"),
        (F.sum("bloomed") - F.sum("exact")).cast("bigint").alias("n_false_pos"),
    )


# Imported lazily at module top would be circular-free either way; the
# pairs CTE tail is shared with plans/graph.py so the fuzzy-decontam
# oracle provably runs on the same MinHash pipeline as the dedup family.
from ripple_server_spark.plans.graph import _PAIRS_CTES  # noqa: E402


@query(
    "q_fuzzy_decontaminate",
    oracle=f"""
    WITH {_PAIRS_CTES},
    contaminated AS (
        SELECT DISTINCT doc_b AS doc_id FROM pairs
        WHERE doc_a < 10 AND doc_b >= 10
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN doc_id IN (SELECT doc_id FROM contaminated)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
    FROM documents WHERE doc_id >= 10
    GROUP BY source
    """,
    tags=("pipeline", "decontamination", "dedup", "minhash"),
)
def q_fuzzy_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy benchmark decontamination: flag corpus documents that are
    NEAR-duplicates (MinHash-LSH + exact-Jaccard >= threshold) of any
    benchmark document (doc_id < 10 stands in for the eval suite, as in
    q_decontaminate). Exact n-gram overlap misses paraphrased or
    lightly-edited benchmark leakage; this is the near-dup arm real
    pretraining hygiene runs alongside it.

    Scale shape: one banding pass over the corpus (shared kernel with
    q_dedup_minhash_lsh), then candidates are restricted to CROSS pairs
    (bench x corpus) BEFORE verification, so exact Jaccard runs only on
    bench-adjacent candidates. At 100 TB the bench band table is tiny
    and broadcast — the corpus band side never shuffles; candidate
    verification inherits verify_jaccard's candidate-doc pruning."""
    docs = load_table(spark, sf_dir, "documents")
    sh = _dedup.shingle_sets(docs).persist()
    bands = _dedup.minhash_band_hashes(sh).persist()
    cand = (
        _dedup.lsh_candidates(bands)
        .filter((F.col("doc_a") < 10) & (F.col("doc_b") >= 10))
        .persist()
    )
    pairs = _dedup.verify_jaccard(cand, sh, JACCARD_THRESHOLD)
    contaminated = (
        pairs.select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    corpus = docs.filter(F.col("doc_id") >= 10).select("doc_id", "source")
    return (
        corpus.join(F.broadcast(contaminated), "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.coalesce("hit", F.lit(0))).cast("bigint").alias(
                "n_contaminated"
            ),
        )
    )


@query(
    "q_embedding_decontaminate",
    oracle="""
    WITH mx AS (
        SELECT b.vec_id, b.label,
               round(max(list_dot_product(a.embedding, b.embedding) /
                     (sqrt(list_dot_product(a.embedding, a.embedding))
                      * sqrt(list_dot_product(b.embedding, b.embedding)))), 6)
                   AS max_sim
        FROM embeddings a JOIN embeddings b
          ON a.vec_id < 10 AND b.vec_id >= 10
        GROUP BY b.vec_id, b.label
    )
    SELECT CAST(label AS BIGINT) AS label,
           count(*) AS n_vecs,
           CAST(sum(CASE WHEN max_sim >= 0.35 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_contaminated,
           round(max(max_sim), 4) AS top_sim
    FROM mx GROUP BY label
    """,
    tags=("pipeline", "decontamination", "vectors"),
)
def q_embedding_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic (embedding-space) decontamination: the third arm next
    to exact n-gram (q_decontaminate) and fuzzy MinHash
    (q_fuzzy_decontaminate) — flag corpus vectors whose max cosine to
    any benchmark vector (vec_id < 10) crosses the threshold, per
    label. Catches reworded leakage that shares no surface n-grams.

    Scale shape: the benchmark side is tiny and BROADCAST; one scan of
    the corpus computes a running max over bench vectors (the join
    fan-out is |corpus| x |bench| rows but map-side only, reduced by a
    partial-agg max before any shuffle). At real scale the bench side
    is still thousands of vectors — the same brute-force broadcast
    shape as cosine_topk_scan, with IVF/LSH pruning (q_ann_*) as the
    documented escalation."""
    from ripple_server_spark.functions.vectors import dot, l2_norm

    emb = load_table(spark, sf_dir, "embeddings")
    bench = emb.filter(F.col("vec_id") < 10).select(
        F.col("embedding").alias("be"),
        l2_norm(F.col("embedding")).alias("bn"),
    )
    corpus = emb.filter(F.col("vec_id") >= 10).select(
        "vec_id", "label", "embedding", l2_norm(F.col("embedding")).alias("cn")
    )
    mx = (
        corpus.join(F.broadcast(bench))
        .select(
            "vec_id",
            "label",
            (dot(F.col("be"), F.col("embedding")) / (F.col("bn") * F.col("cn"))).alias(
                "sim"
            ),
        )
        .groupBy("vec_id", "label")
        .agg(F.round(F.max("sim"), 6).alias("max_sim"))
    )
    return mx.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        F.sum((F.col("max_sim") >= 0.35).cast("int")).cast("bigint").alias(
            "n_contaminated"
        ),
        F.round(F.max("max_sim"), 4).alias("top_sim"),
    )


@query(
    "q_corpus_pipeline_e2e",
    oracle="""
    WITH filtered AS (
        SELECT doc_id, source, text,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
        WHERE n_chars >= 150 AND len(string_split(text, ' ')) >= 25
          AND lang IN ('en', 'de', 'fr')
    ),
    exact_kept AS (
        SELECT min(doc_id) AS doc_id FROM filtered GROUP BY md5(text)
    ),
    survivors AS (
        SELECT f.* FROM filtered f JOIN exact_kept k ON k.doc_id = f.doc_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5('quota:' || CAST(doc_id AS VARCHAR)), doc_id
               ) AS rn
        FROM survivors
    )
    SELECT source,
           count(*) AS n_kept,
           CAST(sum(n_tokens) AS BIGINT) AS tokens_kept,
           bit_xor(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT)
               AS kept_hash
    FROM ranked WHERE rn <= 15
    GROUP BY source
    """,
    tags=("pipeline", "e2e", "dedup", "quality", "quota"),
)
def q_corpus_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus assembly run, one declared plan: quality
    filter (length / word count / language) -> exact near... exact
    dedup (keep min doc_id per content hash) -> per-source quota cap
    (md5-deterministic, 15 docs) -> per-source yield report with a
    kept-set fingerprint. This is the composition the individual
    operators exist for; the fingerprint proves WHICH documents the
    whole pipeline kept, end to end.

    Scale shape: filter is scan-pushed, dedup is one hash shuffle on
    md5(text), the keep join is an AQE-sized semi join, the quota
    window partitions by source — no global window, no collect, three
    shuffles total for a full corpus run."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.size(F.split("text", " "))
    filtered = docs.filter(
        (F.col("n_chars") >= 150)
        & (words >= 25)
        & F.col("lang").isin("en", "de", "fr")
    ).select(
        "doc_id", "source", "text", words.cast("bigint").alias("n_tokens")
    )
    exact_kept = filtered.groupBy(F.md5("text")).agg(
        F.min("doc_id").alias("doc_id")
    ).select("doc_id")
    survivors = filtered.join(exact_kept, "doc_id", "left_semi")
    rank_key = F.md5(F.concat(F.lit("quota:"), F.col("doc_id").cast("string")))
    rn = F.row_number().over(
        Window.partitionBy("source").orderBy(rank_key, F.col("doc_id"))
    )
    kept_h = _H48.format(expr="cast(doc_id as string)")
    return (
        survivors.withColumn("rn", rn)
        .filter(F.col("rn") <= 15)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("n_tokens").cast("bigint").alias("tokens_kept"),
            F.expr(f"bit_xor({kept_h})").alias("kept_hash"),
        )
    )
