"""Similarity search operators: brute-force and LSH-bucketed top-k.

The 100 TB execution shape for "top-k neighbors of Q queries over a
huge corpus":

- the query set (small) is collected once and broadcast to every task
  as a dense numpy matrix;
- the corpus streams through ``mapInPandas`` — one BLAS matmul per
  Arrow batch, emitting only each batch's top-k candidates per query
  (≤ Q×k rows per batch, regardless of batch size);
- a final window rank merges per-batch candidates globally (shuffle
  carries Q×k×n_batches rows — negligible).

No pair materialization, one corpus pass, near-zero shuffle. The
LSH-bucketed variant in plans/extensions.py cuts the scanned fraction
to ~1/2^bits on top of this.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cosine_topk_scan(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    margin: int = 3,
) -> DataFrame:
    """Exact cosine top-k of ``queries`` (columns q_id, qe) over ``emb``
    (columns vec_id, embedding), excluding self-pairs.

    ``margin`` extra candidates per batch guard the per-batch pre-prune
    against rounded-tie reordering in the final global rank.
    """
    qrows = queries.select("q_id", "qe").collect()  # query set is small by contract
    qm = np.stack([np.asarray(r["qe"], dtype=np.float64) for r in qrows])
    qn = np.linalg.norm(qm, axis=1)
    qids = np.asarray([r["q_id"] for r in qrows], dtype=np.int64)
    take = k + margin

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            vid = pdf["vec_id"].to_numpy().astype(np.int64)
            sims = (m @ qm.T) / (np.linalg.norm(m, axis=1)[:, None] * qn[None, :])
            sims[vid[:, None] == qids[None, :]] = -np.inf  # self-exclusion
            top = min(take, sims.shape[0])
            idx = np.argpartition(-sims, top - 1, axis=0)[:top]  # rows x queries
            out = {
                "q_id": np.repeat(qids, top),
                "neighbor_id": vid[idx].T.ravel(),
                "sim": np.take_along_axis(sims, idx, axis=0).T.ravel(),
            }
            pdf_out = pd.DataFrame(out)
            yield pdf_out[np.isfinite(pdf_out["sim"])]

    cand = emb.select("vec_id", "embedding").mapInPandas(
        kernel, "q_id long, neighbor_id long, sim double"
    )
    w = Window.partitionBy("q_id").orderBy(
        F.desc(F.round(F.col("sim"), 6)), F.asc("neighbor_id")
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "neighbor_id", F.round("sim", 4).alias("sim"))
    )
