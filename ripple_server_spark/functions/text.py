"""Text-analysis functions for the documents table (training-data
pipeline surface — no reference analog; mandated by BASELINE.json).

All of these are pure Spark SQL expressions (codegen, no Python): at
100 TB, tokenization/scoring runs inside the parquet scan stage with
zero extra shuffles — only the final aggregates shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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


def token_stats(docs: DataFrame) -> DataFrame:
    """Token counting + length stats per document."""
    t = tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_distinct_tokens"),
        F.length("text").alias("n_chars_measured"),
        F.round(
            F.aggregate(t, F.lit(0.0), lambda acc, w: acc + F.length(w)) / F.size(t), 4
        ).alias("avg_token_len"),
    )


def marker_score(toks: Column, markers: tuple[str, ...]) -> Column:
    """Fraction of tokens that are in the marker set (codegen filter)."""
    hit = F.filter(toks, lambda w: w.isin(*markers))
    return F.round(F.size(hit) / F.size(toks), 4)


def lang_scores(docs: DataFrame) -> DataFrame:
    """Per-language marker scores + argmax prediction.

    The argmax is expressed with a deterministic tie order (score desc,
    then language name asc) so results are engine-independent.
    """
    t = tokens(F.col("text"))
    scored = docs.select(
        "doc_id",
        *[marker_score(t, m).alias(f"score_{lang}") for lang, m in LANG_MARKERS.items()],
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
    ratio — the standard cheap filters of a pretraining data pipeline."""
    t = tokens(F.col("text"))
    n = F.size(t)
    distinct_ratio = F.size(F.array_distinct(t)) / n
    stop_ratio = F.size(F.filter(t, lambda w: w.isin("the", "a", "of", "and", "is"))) / n
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        F.round(distinct_ratio, 4).alias("distinct_ratio"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        (
            (n >= F.lit(20))
            & (distinct_ratio >= F.lit(0.3))
            & (stop_ratio <= F.lit(0.5))
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


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprints: whole-content hash + min-shingle hash.

    ``content_fp`` = md5 of normalized text (exact-dup key);
    ``min_shingle_fp`` = lexicographic-min md5 over the shingle set — a
    1-permutation MinHash, stable under small reorderings, the cheap
    near-dup prefilter.
    """
    sh = shingles(F.col("text"))
    return docs.select(
        "doc_id",
        F.md5(F.lower(F.trim(F.col("text")))).alias("content_fp"),
        F.array_min(F.transform(sh, F.md5)).alias("min_shingle_fp"),
    )
