#!/usr/bin/env python
"""Parallel-scaling demonstration for the heavy operators (VERDICT r12
item 2): at sf0.1 every bench row is fixed-overhead-bound, so the
driver's 8-vs-32-core comparison degenerates to ~1.0 ratios and proves
nothing about whether the operators parallelize. This script scales the
COMPUTE (not the fixed overheads) by replicating the fixture corpora
in-plan (crossJoin with a replication range, ids shifted — fully
deterministic, nothing written to disk) and times the heavy kernels at
local[8] vs local[32] in two separate Spark sessions. Ratios well
above 1 demonstrate the kernels are compute-bound and scale with
cores once the work is large enough to matter.

Writes SCALING_r13.json:
  {"op": {"cpus8_sec": s, "cpus32_sec": s, "ratio_8_over_32": r}, ...}

Usage: python scripts/scaling_demo.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.1"


def _replicate(df, id_col: str, reps: int):
    """reps deterministic copies with shifted ids, built in-plan."""
    from pyspark.sql import functions as F

    spark = df.sparkSession
    r = spark.range(reps).select(F.col("id").alias("_rep"))
    shift = F.col(id_col) * reps + F.col("_rep")
    return df.crossJoin(r).withColumn(id_col, shift).drop("_rep")


def run_ops(spark) -> dict:
    from pyspark.sql import functions as F

    from ripple_server_spark.catalog import load_table
    from ripple_server_spark.operators.similarity import (
        cosine_topk_scan_arrow,
    )
    from ripple_server_spark.plans.pipeline5 import bloom_doc_flags

    sc = spark.sparkContext
    out: dict[str, float] = {}

    def timed(name, df):
        sc.setJobDescription(f"scaling:{name}")
        # warm once (codegen + python workers), then best-of-2
        df.write.format("noop").mode("overwrite").save()
        best = None
        for _ in range(2):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)

    docs = load_table(spark, SF_DIR, "documents")
    # ~500k docs of ~50 words (~25M grams, ~11 s of single-core md5):
    # the Bloom gram/md5 kernel at 100x corpus
    big_docs = _replicate(docs, "doc_id", 100).repartition(
        sc.defaultParallelism * 2
    )
    timed("bloom_doc_flags_100x", bloom_doc_flags(big_docs))

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 1000).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
    )
    # 500k vectors x 1000 queries of float64 matmul: the exact-scan kernel
    big_emb = _replicate(emb, "vec_id", 250).repartition(
        sc.defaultParallelism * 2
    )
    timed(
        "cosine_topk_scan_250x", cosine_topk_scan_arrow(big_emb, queries, k=5)
    )

    # token-level text explode+shuffle+aggregate shape at 150x corpus
    # (repartition first: the fixture is one row group, so the map side
    # would otherwise be a single task regardless of core count)
    tokens = (
        _replicate(docs, "doc_id", 150)
        .repartition(sc.defaultParallelism * 2)
        .select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok"))
    )
    timed(
        "token_count_150x",
        tokens.groupBy("tok").agg(F.count("*").alias("c")),
    )
    return out


def one_session(cpus: int) -> dict:
    from pyspark.sql import SparkSession

    from ripple_server_spark.session import RUNTIME_CONF

    b = (
        SparkSession.builder.appName(f"scaling-demo-{cpus}")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
    )
    for k, v in RUNTIME_CONF.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    try:
        return run_ops(spark)
    finally:
        spark.stop()


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SCALING_r13.json"
    r8 = one_session(8)
    r32 = one_session(32)
    doc = {
        op: {
            "cpus8_sec": r8[op],
            "cpus32_sec": r32[op],
            "ratio_8_over_32": round(r8[op] / r32[op], 2),
        }
        for op in r8
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(json.dumps(doc, indent=1))


if __name__ == "__main__":
    main()
