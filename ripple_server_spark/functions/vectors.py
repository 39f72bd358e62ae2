"""Vector functions: norms, cosine similarity, deterministic LSH.

Embedding columns are ``array<float>`` (64-dim fixtures). Two execution
tiers:

- SQL lambda expressions (``F.zip_with``/``F.aggregate``) — JVM-side,
  used for oracle-checked queries; exact left-to-right fold, engine-
  reproducible;
- Arrow-batched Pandas UDFs (numpy BLAS) — the 100 TB throughput path
  for ANN search, ~10-100x the lambda fold.

LSH hyperplanes are *Rademacher* (+1/-1) vectors derived from md5, so
any engine (Spark SQL, DuckDB, numpy) regenerates identical planes —
no random state to ship.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ripple_server_spark.config import LSH_HYPERPLANES


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def l2_norm(vec: Column) -> Column:
    """Left-to-right fold of sum(x^2) — deterministic across engines."""
    return F.sqrt(F.aggregate(as_double(vec), F.lit(0.0), lambda acc, x: acc + x * x))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(as_double(a), as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def _cosine_kernel(a: pd.Series, b: pd.Series) -> pd.Series:
    av = np.stack(a.to_numpy())
    bv = np.stack(b.to_numpy())
    num = (av * bv).sum(axis=1)
    den = np.linalg.norm(av, axis=1) * np.linalg.norm(bv, axis=1)
    return pd.Series(num / den)


_cosine_pandas_udf = None


def cosine_pandas(a: Column, b: Column) -> Column:
    """Arrow-vectorized cosine: numpy dot over stacked Arrow batches.

    The 100 TB throughput kernel — one BLAS call per batch instead of a
    per-row expression fold; agrees with :func:`cosine` to well past
    6 dp (both float64). UDF registration is lazy because pandas_udf
    needs an active SparkSession to parse its return type.
    """
    global _cosine_pandas_udf
    if _cosine_pandas_udf is None:
        _cosine_pandas_udf = pandas_udf(_cosine_kernel, "double")
    return _cosine_pandas_udf(a, b)


def rademacher_plane(h: int, dim: int) -> np.ndarray:
    """Deterministic ±1 hyperplane h: sign_i = +1 iff the first hex char
    of md5(f"{h}:{i}") is in 0..7. Reproducible from SQL md5() too."""
    return np.array(
        [
            1.0 if hashlib.md5(f"{h}:{i}".encode()).hexdigest()[0] <= "7" else -1.0
            for i in range(dim)
        ]
    )


def lsh_planes(dim: int, n_planes: int = LSH_HYPERPLANES) -> np.ndarray:
    return np.stack([rademacher_plane(h, dim) for h in range(n_planes)])


_lsh_bucket_udfs: dict = {}


def lsh_bucket_pandas(vec: Column, dim: int, n_planes: int = LSH_HYPERPLANES) -> Column:
    """Arrow-vectorized LSH bucket: one numpy matmul per batch against
    the md5-derived ±1 plane matrix. Same planes and float64 math as
    :func:`lsh_bucket_expr`, but NOT bit-for-bit sign-identical in
    every case: numpy's pairwise/SIMD summation can differ from the
    expr's sequential fold by ~1 ulp, so a projection within float
    rounding of exactly 0 may bucket differently between the two
    kernels (and vs a SQL oracle). Queries that hash-compare buckets
    against an oracle must build them with ONE kernel on both sides,
    or accept the zero-boundary caveat. This is the kernel to use on
    large corpora; the expr form documents the engine-portable
    definition."""
    key = (dim, n_planes)
    if key not in _lsh_bucket_udfs:
        planes = lsh_planes(dim, n_planes).T  # dim x planes

        def _kernel(v: pd.Series) -> pd.Series:
            m = np.stack(v.to_numpy()).astype(np.float64)
            signs = (m @ planes) >= 0
            return pd.Series(
                ["".join("1" if b else "0" for b in row) for row in signs]
            )

        _lsh_bucket_udfs[key] = pandas_udf(_kernel, "string")
    return _lsh_bucket_udfs[key](vec)


def lsh_probe_buckets(bucket: Column, n_planes: int = LSH_HYPERPLANES) -> Column:
    """Multi-probe LSH probe set (Lv et al., VLDB'07): the bucket itself
    plus every Hamming-distance-1 variant (one sign bit flipped), as an
    array of n_planes+1 bit strings. Probing the adjacent buckets lifts
    recall from p^n to p^n + n·p^(n-1)(1-p) per neighbor (p = per-plane
    agreement probability) while scanning only (n+1)/2^n of the corpus —
    the query side explodes this tiny array; the corpus side is never
    expanded, so the join stays bucket-pruned at any scale."""
    flips = []
    for j in range(n_planes):
        c = F.substring(bucket, j + 1, 1)
        flips.append(
            F.concat(
                F.substring(bucket, 1, j),
                F.when(c == "1", F.lit("0")).otherwise(F.lit("1")),
                F.substring(bucket, j + 2, n_planes - j - 1),
            )
        )
    return F.array(bucket, *flips)


def lsh_bucket_expr(vec: Column, dim: int, n_planes: int = LSH_HYPERPLANES) -> Column:
    """Sign-projection bucket as an n_planes-char bit string, computed
    with codegen expressions (md5-derived ±1 weights inlined as an
    array literal — tiny: n_planes × dim int8s)."""
    planes = lsh_planes(dim, n_planes)
    bits = []
    for h in range(n_planes):
        w = F.array(*[F.lit(float(x)) for x in planes[h]])
        proj = F.aggregate(
            F.zip_with(as_double(vec), w, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)
