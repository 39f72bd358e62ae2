#!/usr/bin/env python
"""Scaling experiment: time a query set at 1x and Nx data volume.

Builds an Nx-replicated copy of a fixture dir (documents / embeddings /
events get N id-shifted copies so keys stay unique and the corpus truly
grows; the TPC-H dims are copied as-is), then times each query best-of-2
through the noop sink at both scales and prints a markdown table row
per query plus the set total — the growth-behavior evidence SCALE.md's
scaling-experiment table records.

Document TEXT is perturbed per copy (every token gets a copy-k tag) so
the Nx corpus is N sets of DISTINCT documents with the same intra-copy
near-dup structure, not N literal clones of every document. Without
this, replication is adversarial specifically to shingle-based LSH:
every band bucket holds N times the docs and pair generation grows
N^2-fold (a 64x replication produced a 4096x pair blowup in practice,
which measures the cloning artifact, not corpus growth — giant
literal-duplicate clusters are exact-dedup's job, per
operators/dedup.py:lsh_candidates). Real corpus growth adds NEW
documents; the perturbation models exactly that.

Usage:
  python scripts/scale_exp.py [sf_dir] [factor] [query ...]
  # defaults: /root/testdata/sf0.1, 8x, the round-3 families
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ripple_server_spark.plans.registry import SPECS  # noqa: E402
from ripple_server_spark.session import get_spark  # noqa: E402

DEFAULT_QUERIES = (
    "q_ann_pq_topk",
    "q_heavy_hitters_cms",
    "q_span_dedup",
    "q_bloom_decontaminate",
)
# (table, id columns to shift) — the replicated "fact" tables; ids shift
# by k * (max_id + 1) per copy so every copy's keys are disjoint.
REPLICATED = (
    ("documents", ("doc_id",)),
    ("embeddings", ("vec_id",)),
    ("events", ("event_id",)),
)


def replicate(spark, src: str, dst: str, factor: int) -> None:
    os.makedirs(dst, exist_ok=True)
    rep_names = {t for t, _ in REPLICATED}
    for fn in os.listdir(src):
        if fn.endswith(".parquet") and fn[: -len(".parquet")] not in rep_names:
            shutil.copy(os.path.join(src, fn), os.path.join(dst, fn))
    for table, id_cols in REPLICATED:
        df = spark.read.parquet(os.path.join(src, f"{table}.parquet"))
        shifts = {c: df.agg(F.max(c)).first()[0] + 1 for c in id_cols}

        def _copy_col(c: str, k: int):
            if c in id_cols:
                return (F.col(c) + F.lit(k * shifts[c])).alias(c)
            if table == "documents" and c == "text" and k > 0:
                # Tag every token with the copy index: all shingles
                # differ across copies (docs are new, not clones) while
                # each copy keeps the original intra-copy near-dup
                # structure bit-for-bit.
                tag = f"c{k}"
                return F.concat(
                    F.lit(tag),
                    F.regexp_replace(F.col(c), r"(\s+)", f"$1{tag}"),
                ).alias(c)
            if table == "documents" and c == "n_chars" and k > 0:
                # keep the length column consistent with the new text
                tag = f"c{k}"
                return F.length(
                    F.concat(
                        F.lit(tag),
                        F.regexp_replace(F.col("text"), r"(\s+)", f"$1{tag}"),
                    )
                ).cast("long").alias(c)
            if table == "embeddings" and c == "embedding" and k > 0:
                # Perturb vectors per copy for the same reason text is
                # tagged: verbatim clones are adversarial to every
                # bucketed similarity self-join (N identical vectors
                # per bucket -> N^2 pair blowup measuring the cloning
                # artifact, not corpus growth). A tiny deterministic
                # per-copy rotation keeps norms ~unchanged and the
                # intra-copy neighborhood structure intact.
                eps = k * 1e-3
                return F.transform(
                    F.col(c), lambda x, i: (x + eps * F.cos(i.cast("double"))).cast("float")
                ).alias(c)
            return F.col(c)

        copies = [
            df.select(*[_copy_col(c, k) for c in df.columns])
            for k in range(factor)
        ]
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(os.path.join(dst, f"{table}.parquet"))


def time_query(spark, name: str, sf_dir: str) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        SPECS[name].builder(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    names = sys.argv[3:] or list(DEFAULT_QUERIES)
    spark = get_spark(app_name="scale-exp")
    tmp = tempfile.mkdtemp(prefix="scale_exp_")
    try:
        replicate(spark, sf_dir, tmp, factor)
        print(f"| query | 1x | {factor}x | ratio |")
        print("|---|---|---|---|")
        tot1 = totn = 0.0
        for name in names:
            t1 = time_query(spark, name, sf_dir)
            tn = time_query(spark, name, tmp)
            tot1 += t1
            totn += tn
            print(f"| {name} | {t1:.2f} s | {tn:.2f} s | {tn / t1:.1f}x |")
        print(f"| **total** | {tot1:.2f} s | {totn:.2f} s | **{totn / tot1:.1f}x** |")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
