"""Text-analysis functions for the documents table (training-data
pipeline surface — no reference analog; mandated by BASELINE.json).

All of these are pure Spark SQL expressions (codegen, no Python): at
100 TB, tokenization/scoring runs inside the parquet scan stage with
zero extra shuffles — only the final aggregates shuffle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ripple_server_spark.config import SHINGLE_K

# Tiny per-language marker lexicons for the n-gram/stopword language
# heuristic. Deliberately simple + deterministic: language ID at scale
# is a scoring pass, and the scoring machinery (not lexicon quality) is
# what the engine provides.
LANG_MARKERS = {
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "la", "de", "et", "un"),
    "de": ("der", "die", "das", "und", "ist"),
    "zh": ("的", "是", "了", "在", "和"),
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization (split on single space; fixtures are
    single-spaced). Returns array<string>."""
    return F.split(text, " ")


# BPE-style pretokenizer (GPT-2 family shape, lookahead-free so both
# Java regex and RE2/DuckDB run it identically): a token is an optional
# leading space + a letter run, digit run, or punctuation run.
BPE_PATTERN = r" ?\p{L}+| ?\p{N}+| ?[^\p{L}\p{N} ]+"


def bpe_tokens(text: Column) -> Column:
    """BPE-ish pretokenization (array<string>) — the unit LLM pipelines
    budget by. Pure codegen: one regexp_extract_all per row."""
    return F.regexp_extract_all(text, F.lit(BPE_PATTERN), F.lit(0))


def exploded_tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, w) token stream. The scale shape for token analytics:
    explode + partial aggregation stays in whole-stage codegen, unlike
    deep array-lambda expressions (interpreted, and prone to JIT
    megamorphic collapse once many distinct queries have run)."""
    return docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))


def token_stats(docs: DataFrame) -> DataFrame:
    """Token counting + length stats per document (explode + agg)."""
    agg = exploded_tokens(docs).groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.countDistinct("w").alias("n_distinct_tokens"),
        F.sum(F.length("w")).alias("sum_len"),
    )
    return (
        docs.select("doc_id", F.length("text").alias("n_chars_measured"))
        .join(agg, on="doc_id")
        .select(
            "doc_id",
            "n_tokens",
            "n_distinct_tokens",
            "n_chars_measured",
            F.round(F.col("sum_len") / F.col("n_tokens"), 4).alias("avg_token_len"),
        )
    )


def lang_scores(docs: DataFrame) -> DataFrame:
    """Per-language marker scores + argmax prediction.

    One explode + one aggregate computes all five scores (conditional
    counts); the argmax is expressed with a deterministic tie order
    (score desc, then language name asc) so results are engine-
    independent.
    """
    scored = exploded_tokens(docs).groupBy("doc_id").agg(
        *[
            F.round(
                F.count_if(F.col("w").isin(*m)) / F.count("*"), 4
            ).alias(f"score_{lang}")
            for lang, m in LANG_MARKERS.items()
        ],
    )
    # argmax with deterministic ties: sort structs (-score, lang) ascending
    # and take the head — identical semantics in any engine's struct sort.
    pairs = F.array(
        *[
            F.struct(
                (-F.col(f"score_{lang}")).alias("neg"), F.lit(lang).alias("lang")
            )
            for lang in LANG_MARKERS
        ]
    )
    best = F.array_sort(pairs)[0]
    return scored.withColumn("pred_lang", best["lang"])


def quality_scores(docs: DataFrame) -> DataFrame:
    """Heuristic quality scoring: length, lexical diversity, stopword
    ratio — the standard cheap filters of a pretraining data pipeline.
    Explode + single partial-aggregate pass."""
    n = F.count("*")
    distinct_ratio = F.countDistinct("w") / n
    stop_ratio = F.count_if(F.col("w").isin("the", "a", "of", "and", "is")) / n
    return exploded_tokens(docs).groupBy("doc_id").agg(
        n.alias("n_tokens"),
        F.round(distinct_ratio, 4).alias("distinct_ratio"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        (
            (n >= F.lit(20)) & (distinct_ratio >= F.lit(0.3)) & (stop_ratio <= F.lit(0.5))
        ).alias("keep"),
    )


def shingles(text: Column, k: int = SHINGLE_K) -> Column:
    """Distinct word k-gram shingle set (input to MinHash/Jaccard)."""
    t = tokens(text)
    n = F.size(t)
    grams = F.transform(
        F.sequence(F.lit(0), n - F.lit(k)),
        lambda i: F.concat_ws(" ", *[F.element_at(t, (i + F.lit(j + 1)).cast("int")) for j in range(k)]),
    )
    return F.when(n >= F.lit(k), F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


_shingle_udfs: dict = {}


def shingles_pandas(text: Column, k: int = SHINGLE_K) -> Column:
    """Arrow-batched shingle kernel: identical output to :func:`shingles`
    (python str.split(' ') ≡ split-on-single-space for the single-spaced
    corpus; first-occurrence dedup ≡ array_distinct) at ~10x the speed —
    interpreted HOF expressions cost ~2 ms/doc, this ~50 µs/doc. Use on
    large corpora; the expr form remains the engine-portable spec."""
    if k not in _shingle_udfs:

        def _kernel(s: pd.Series) -> pd.Series:
            out = []
            for t in s:
                # NULL text -> no shingles, matching the expr path
                # (split(NULL) is NULL and explode drops the row)
                w = t.split(" ") if t is not None else []
                if len(w) < k:
                    out.append([])
                else:
                    out.append(
                        list(dict.fromkeys(" ".join(w[i : i + k]) for i in range(len(w) - k + 1)))
                    )
            return pd.Series(out)

        _shingle_udfs[k] = pandas_udf(_kernel, "array<string>")
    return _shingle_udfs[k](text)


_span_udfs: dict = {}


def spans_pandas(text: Column, width: int) -> Column:
    """Arrow-batched non-overlapping word-window segmenter: text ->
    [span_0, span_1, ...] where span_i = words[i*width:(i+1)*width]
    joined by spaces (last span may be short). Same rationale as
    :func:`shingles_pandas`: the HOF-expression form re-evaluates the
    captured split() per lambda invocation (lambdas block codegen
    subexpression elimination), so the Arrow kernel is the large-corpus
    path. Use with posexplode to recover (span_idx, span)."""
    if width not in _span_udfs:

        def _kernel(s: pd.Series) -> pd.Series:
            out = []
            for t in s:
                w = t.split(" ") if t is not None else []
                out.append(
                    [" ".join(w[i : i + width]) for i in range(0, len(w), width)]
                )
            return pd.Series(out)

        _span_udfs[width] = pandas_udf(_kernel, "array<string>")
    return _span_udfs[width](text)


_ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"

# SQL fragment of :func:`content_fold` for DuckDB oracles — keep the
# two in lock-step (format with the text column expression).
CONTENT_FOLD_SQL = (
    "translate(trim({expr}), "
    f"'{_ASCII_UPPER}', '{_ASCII_LOWER}')"
)


def content_fold(col: Column) -> Column:
    """Canonical text form for content fingerprints: trim + ASCII-ONLY
    case fold.

    Deliberately NOT ``lower()``: full Unicode case mapping is
    engine-divergent — DuckDB (utf8proc) folds 'İ' to 'i' and final
    'Σ' to 'σ', while the JVM (and CPython) produce 'i̇' and 'ς' — so
    an exact-dup fingerprint built on lower() disagrees across engines
    on legal Unicode text. translate() over the 26 ASCII letters is
    the same pure byte mapping everywhere, and Unicode-case-SENSITIVE
    exact dedup is the conservative choice (near-dup stages catch
    case-variant duplicates)."""
    return F.translate(F.trim(col), _ASCII_UPPER, _ASCII_LOWER)


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprints: whole-content hash + min-shingle hash.

    ``content_fp`` = md5 of the canonical form (:func:`content_fold` —
    trim + ASCII case fold, engine-portable) — the exact-dup key;
    ``min_shingle_fp`` = lexicographic-min md5 over the shingle set — a
    1-permutation MinHash, stable under small reorderings, the cheap
    near-dup prefilter.

    Shape: Arrow shingle kernel -> explode -> JVM md5 -> partial-agg
    min (the min reduces map-side; the shuffle carries one row per
    doc). Avoids a deep interpreted array expression in the hot path.
    """
    mins = (
        docs.select("doc_id", F.explode(shingles_pandas(F.col("text"))).alias("shingle"))
        .groupBy("doc_id")
        .agg(F.min(F.md5(F.col("shingle"))).alias("min_shingle_fp"))
    )
    return (
        docs.select(
            "doc_id", F.md5(content_fold(F.col("text"))).alias("content_fp")
        )
        .join(mins, on="doc_id", how="left")
    )


def canonical_url(url: Column) -> Column:
    """URL canonicalization for corpus dedup — the normalization pass
    web-crawl pipelines run before URL-level dedup (CCNet/RefinedWeb
    keep one document per canonical URL): lowercase the scheme+host,
    drop the #fragment, strip tracking parameters (utm_*, fbclid),
    clean the separators they leave behind, and drop trailing slashes.

    Pure codegen expressions (chained JVM regexp_replace, no UDF), so
    the pass stays whole-stage-compiled over a 100 TB URL column; the
    DuckDB oracle mirrors each step with RE2 + the 'g' flag (DuckDB
    replaces first-match by default, Spark replaces all).

    Policy notes (deterministic, documented, not configurable): only
    the scheme+host case-fold (paths stay case-sensitive per RFC 3986);
    a trailing slash is stripped only at the END of the cleaned URL
    (a slash before '?' is part of the path); parameter ORDER is
    preserved for the non-tracking params that survive.
    """
    head = F.lower(F.regexp_extract(url, r"^(?i)(https?://[^/?#]+)", 1))
    tail = F.regexp_replace(url, r"^(?i)https?://[^/?#]+", "")
    tail = F.regexp_replace(tail, r"#.*", "")  # fragment
    # tracking params must be ANCHORED at a separator and matched as the
    # whole param NAME ([?&]name=value): an unanchored 'utm_...=' also
    # strips substrings of longer param names ('myutm_source=a' ->
    # 'my') and path segments containing 'utm_x=' — collapsing distinct
    # URLs onto one wrong canonical key, i.e. dedup drops live pages.
    # The separator is kept ($1) and the cleanup passes below collapse
    # whatever run of separators the removals leave behind.
    tail = F.regexp_replace(tail, r"([?&])(utm_[a-z]+|fbclid)=[^&#]*", r"$1")
    tail = F.regexp_replace(tail, r"\?&+", "?")  # '?&id=' -> '?id='
    tail = F.regexp_replace(tail, r"&&+", "&")  # collapse doubled '&'
    tail = F.regexp_replace(tail, r"[?&]+$", "")  # dangling separators
    tail = F.regexp_replace(tail, r"/+$", "")  # trailing slash(es)
    return F.concat(head, tail)
