"""Bucketed-at-rest tables: the shuffle-free co-located join path.

Every fact-fact join docstring in this engine says "bucket both tables
by the join key at write time and the shuffle disappears". This module
is that path made concrete: ``write_bucketed`` lays a table out
hash-bucketed (and sorted) by the join key, so a join of two tables
bucketed the same way needs NO Exchange — each task merge-joins bucket
i of both sides locally (tests/test_bucketed.py asserts the plan).

At 100 TB this is the difference between re-shuffling hundreds of TB
per join and reading co-located files: bucket counts should be sized so
one bucket of the bigger table ≈ one task's worth (128-512 MB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    key: str,
    n_buckets: int,
    path: str,
) -> None:
    """Persist ``df`` hash-bucketed and sorted by ``key``.

    Bucket files are additionally sorted by the key, so a co-bucketed
    join degenerates to a zipper merge per bucket (no exchange, no
    full sort — at most a cheap within-bucket sort check).
    """
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .format("parquet")
        .saveAsTable(name)
    )


def read_table(spark: SparkSession, name: str) -> DataFrame:
    """Catalog read — bucketing metadata only survives via the catalog
    (a plain spark.read.parquet of the same files forgets the layout
    and re-shuffles)."""
    return spark.table(name)
