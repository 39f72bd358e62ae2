"""Kernel-equivalence and estimator-quality tests: the fast (Arrow/
numpy) paths must agree with the engine-portable SQL-expression paths,
and approximate operators must be near their exact counterparts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ripple_server_spark.catalog import load_table
from ripple_server_spark.functions.vectors import (
    as_double,
    cosine,
    cosine_pandas,
    lsh_bucket_expr,
    lsh_bucket_pandas,
    lsh_planes,
)
from ripple_server_spark.operators.dedup import minhash_lsh_dedup
from ripple_server_spark.plans.registry import SPECS


def test_lsh_bucket_pandas_matches_expr(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    both = emb.select(
        "vec_id",
        lsh_bucket_expr(F.col("embedding"), 64).alias("b_expr"),
        lsh_bucket_pandas(F.col("embedding"), 64).alias("b_np"),
    )
    # eqNullSafe: a kernel regressing to NULL buckets must FAIL, not
    # have every NULL comparison drop out of the filter
    assert both.filter(~F.col("b_expr").eqNullSafe(F.col("b_np"))).count() == 0


def test_cosine_pandas_matches_expr(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    a = emb.alias("a")
    b = emb.alias("b")
    pairs = a.join(b, F.col("a.vec_id") < F.col("b.vec_id")).select(
        cosine(F.col("a.embedding"), F.col("b.embedding")).alias("c_expr"),
        cosine_pandas(as_double(F.col("a.embedding")), as_double(F.col("b.embedding"))).alias(
            "c_np"
        ),
    )
    mx = pairs.select(F.max(F.abs(F.col("c_expr") - F.col("c_np"))).alias("d")).collect()[0]["d"]
    assert mx < 1e-9


def test_lsh_planes_are_balanced_and_deterministic():
    p = lsh_planes(64, 8)
    assert p.shape == (8, 64)
    assert set(p.flatten().tolist()) == {-1.0, 1.0}
    # md5-derived: regenerating gives identical planes
    assert (p == lsh_planes(64, 8)).all()
    # roughly balanced signs (Rademacher): not all-ones degenerate
    assert 0.3 < (p > 0).mean() < 0.7


def test_approx_distinct_within_rsd(spark, sf_dir):
    """The query now carries its own in-plan audit (est_ok at 3%
    relative error); this test independently recomputes the exact
    side so the audit's exact column is itself cross-checked."""
    ev = load_table(spark, sf_dir, "events")
    rows = SPECS["q_approx_distinct_users"].builder(spark, sf_dir).collect()
    assert rows and all(r["est_ok"] for r in rows)
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in rows:
        assert exact[r["event_type"]] == r["n_exact"], r


def test_minhash_finds_planted_duplicates(spark, sf_dir):
    """Plant true near-dups (doc + same doc with one word changed) and
    check the LSH pipeline surfaces them with high jaccard."""
    docs = load_table(spark, sf_dir, "documents").limit(20).select("doc_id", "text")
    mutated = docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
    )
    pairs = minhash_lsh_dedup(docs.unionByName(mutated))
    found = {
        (r["doc_a"], r["doc_b"]): r["jaccard"] for r in pairs.collect()
    }
    hits = [(a, b) for (a, b) in found if b == a + 100000]
    assert len(hits) >= 16  # banding may miss a couple; most must surface
    assert all(found[h] > 0.8 for h in hits)


def test_ann_recall_vs_bruteforce(spark, sf_dir):
    """Multi-probe LSH ANN: every returned sim must equal the brute-force
    cosine for that pair (no fabricated scores), and recall@3 vs the
    exact top-3 must clear a floor. The fixture's true neighbors are
    weakly similar (mean cosine ~0.34, Hamming 2-4 of 8 sign bits), so
    the collision-bound recall here is low by nature — the floor pins
    the multi-probe gain over single-probe (~0.02 measured); the strong-
    neighbor regime LSH is built for is pinned by
    test_multiprobe_lsh_recovers_planted_neighbors below."""
    import numpy as np

    from ripple_server_spark.operators.similarity import cosine_topk_scan

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
    )
    exact = {
        (r["q_id"], r["neighbor_id"]): r["sim"]
        for r in cosine_topk_scan(emb, queries, k=3).collect()
    }
    approx = SPECS["q_ann_lsh_topk"].builder(spark, sf_dir).collect()
    assert len(approx) > 0
    # per-query cardinality: never more than k results
    per_q: dict[int, int] = {}
    for r in approx:
        per_q[r["q_id"]] = per_q.get(r["q_id"], 0) + 1
    assert all(c <= 3 for c in per_q.values())
    # sim fidelity on EVERY returned pair, not just exact-top-k overlaps
    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.select("vec_id", "embedding").collect()
    }
    for r in approx:
        a, b = vecs[r["q_id"]], vecs[r["neighbor_id"]]
        true_sim = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(true_sim - r["sim"]) < 1e-3, (r, true_sim)
    hits = sum(1 for r in approx if (r["q_id"], r["neighbor_id"]) in exact)
    assert hits / len(exact) >= 0.05, f"recall@3 {hits}/{len(exact)}"


def test_multiprobe_lsh_recovers_planted_neighbors(spark):
    """The recall contract in LSH's design regime: plant 30 strong
    near-dups (cosine >= 0.99) and require the multi-probe pipeline —
    the same bucket kernel + Hamming-1 probe expansion q_ann_lsh_topk
    uses — to surface >= 80% of them in the top-3. Per-neighbor
    collision probability at this cosine is ~0.97 within one flipped
    bit, so 0.8 over 30 deterministic (seeded) plants is a real bound,
    not noise."""
    import numpy as np

    from ripple_server_spark.functions.vectors import (
        dot,
        l2_norm,
        lsh_bucket_pandas,
        lsh_probe_buckets,
    )

    rng = np.random.default_rng(7)
    base = rng.normal(size=(30, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    noise = rng.normal(size=(30, 64)) * 0.01
    dup = base + noise
    dup /= np.linalg.norm(dup, axis=1, keepdims=True)
    assert float(np.min((base * dup).sum(axis=1))) >= 0.99
    rows = [(i, base[i].tolist()) for i in range(30)] + [
        (i + 1000, dup[i].tolist()) for i in range(30)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    e = emb.select(
        "vec_id",
        "embedding",
        lsh_bucket_pandas(F.col("embedding"), 64).alias("bucket"),
        l2_norm(F.col("embedding")).alias("nn"),
    )
    a = (
        e.filter(F.col("vec_id") < 1000)
        .select(
            "vec_id",
            "embedding",
            "nn",
            F.explode(lsh_probe_buckets(F.col("bucket"))).alias("probe"),
        )
        .alias("a")
    )
    b = e.alias("b")
    sim = dot(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a.nn") * F.col("b.nn")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    top = (
        a.join(
            b,
            (F.col("a.probe") == F.col("b.bucket"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("q_id"),
            F.col("b.vec_id").alias("neighbor_id"),
            sim.alias("sim"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .collect()
    )
    recovered = {r["q_id"] for r in top if r["neighbor_id"] == r["q_id"] + 1000}
    assert len(recovered) >= 24, f"planted recall {len(recovered)}/30"


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    """IVF-Flat must recover most of the exact top-3: the corpus is
    cluster-generated (label column), so probing 4/16 cells should
    catch nearly all true neighbors. Bound recall@3 and require exact
    sim agreement on every hit."""
    from ripple_server_spark.operators.similarity import cosine_topk_scan, ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
    )
    exact = {
        (r["q_id"], r["neighbor_id"]): r["sim"]
        for r in cosine_topk_scan(emb, queries, k=3).collect()
    }
    approx = ivf_topk(emb, queries, k=3, nlist=32, nprobe=12).collect()
    assert len(approx) > 0
    hits = 0
    for r in approx:
        key = (r["q_id"], r["neighbor_id"])
        if key in exact:
            hits += 1
            assert abs(exact[key] - r["sim"]) < 1e-6
    assert hits / len(exact) >= 0.7, f"recall@3 {hits}/{len(exact)}"
    # the declared query folds the same audit into its plan and must
    # report it green
    [summary] = SPECS["q_ann_ivf_topk"].builder(spark, sf_dir).collect()
    assert summary["recall_ok"] is True
    assert summary["n_returned"] == 3 * summary["n_queries"]


def test_pq_recall_vs_bruteforce(spark, sf_dir):
    """PQ + ADC + exact re-rank must recover most of the exact top-3
    even on the isotropic fixture corpus (PQ's worst case): bound
    recall@3, and — because the shortlist is re-ranked with the TRUE
    cosine — require exact sim agreement on every hit."""
    from ripple_server_spark.operators.similarity import cosine_topk_scan, pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
    )
    exact = {
        (r["q_id"], r["neighbor_id"]): r["sim"]
        for r in cosine_topk_scan(emb, queries, k=3).collect()
    }
    approx = pq_topk(emb, queries, k=3).collect()
    assert len(approx) > 0
    hits = 0
    for r in approx:
        key = (r["q_id"], r["neighbor_id"])
        if key in exact:
            hits += 1
            assert abs(exact[key] - r["sim"]) < 1e-6
    assert hits / len(exact) >= 0.7, f"recall@3 {hits}/{len(exact)}"
    # the declared query folds the same audit into its plan
    [summary] = SPECS["q_ann_pq_topk"].builder(spark, sf_dir).collect()
    assert summary["recall_ok"] is True
    assert summary["n_returned"] == 3 * summary["n_queries"]


def test_salted_join_equals_plain_join(spark, sf_dir):
    """salted_join must reproduce the plain equi-join exactly while
    spreading each key over n_salts shuffle partitions."""
    from ripple_server_spark.operators.joins import salted_join

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    dim = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("user_n"))
    )
    plain = {tuple(r) for r in ev.join(dim, on="user_id").collect()}
    salted = {tuple(r) for r in salted_join(ev, dim, on="user_id").collect()}
    assert salted == plain


def test_connected_components_chain_and_clique(spark):
    """Min-label propagation must close a 5-node chain (diameter 4 —
    forces several propagation rounds), a 3-clique with multi-edges,
    and leave disjoint components unmerged."""
    from ripple_server_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        # chain 1-2-3-4-5, clique {10,11,12} with a duplicate edge,
        # isolated pair {20,21}
        [(1, 2), (2, 3), (3, 4), (4, 5),
         (10, 11), (11, 12), (10, 12), (12, 10),
         (20, 21)],
        "src bigint, dst bigint",
    )
    got = {r["id"]: r["comp"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_streaming_setsim_epochs_match_batch(spark, sf_dir):
    """Union of per-epoch incremental set-sim joins == the one-shot
    batch join: no pair missed (prefix completeness holds under the
    frozen token order), no pair duplicated (each pair surfaces in its
    later member's epoch). Also asserts the O(chunk) epoch contract:
    the emitted plan reads only checkpointed state + the chunk — old
    text is never re-tokenized, old parquet never re-scanned."""
    from ripple_server_spark.operators.dedup import (
        IncrementalSetSimJoin,
        setsim_join_prefix,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 180)
    truth = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in setsim_join_prefix(docs, 0.5).collect()
    }

    inc = IncrementalSetSimJoin(0.5)
    got = {}
    last = None
    for lo, hi in ((0, 60), (60, 120), (120, 180)):
        chunk = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        last = inc.observe(chunk)
        for r in last.collect():
            key = (r["doc_a"], r["doc_b"])
            assert key not in got, f"pair {key} emitted twice"
            got[key] = r["jaccard"]
    assert got == truth

    # Plan/IO assertion for the final epoch: lineage was truncated at
    # every state checkpoint, so no Python tokenization kernel and no
    # document-parquet scan can appear in the epoch plan.
    jvm = spark._jvm
    p = jvm.PythonSQLUtils.explainString(last._jdf.queryExecution(), "formatted")
    assert "EvalPython" not in p, "epoch plan re-tokenizes text"
    assert "parquet" not in p.lower(), "epoch plan re-scans source files"


def test_incremental_setsim_df_state_is_additive(spark, sf_dir):
    """Accumulated df state after N epochs equals the batch df of the
    whole corpus (the order-refresh input stays exact)."""
    from ripple_server_spark.operators.dedup import (
        IncrementalSetSimJoin,
        shingle_sets,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    inc = IncrementalSetSimJoin(0.5)
    for lo, hi in ((0, 40), (40, 80), (80, 120)):
        inc.observe(docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)))
    got = {r["shingle"]: r["df"] for r in inc.df.collect()}
    want = {
        r["shingle"]: r["df"]
        for r in shingle_sets(docs).groupBy("shingle").agg(F.count("*").alias("df")).collect()
    }
    assert got == want


def test_cosine_topk_arrow_matches_pandas(spark, sf_dir):
    """mapInArrow kernel must reproduce the mapInPandas kernel exactly
    (same math, same tie-breaks) — only the batch transport differs."""
    from ripple_server_spark.operators.similarity import (
        cosine_topk_scan,
        cosine_topk_scan_arrow,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
    )
    a = {tuple(r) for r in cosine_topk_scan(emb, queries, k=3).collect()}
    b = {tuple(r) for r in cosine_topk_scan_arrow(emb, queries, k=3).collect()}
    assert a == b and len(a) > 0


def test_similarity_query_broadcast_cap_fails_fast(spark, sf_dir):
    """A miswired caller (corpus passed as the query side) must raise,
    not silently collect the corpus to the driver."""
    import pytest

    from ripple_server_spark.operators.similarity import _collect_query_rows

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe"))
    with pytest.raises(ValueError, match="broadcast cap"):
        _collect_query_rows(q, max_rows=3)
    # within the cap: rows come back intact (the limit+1 probe does not
    # truncate legitimate query sets)
    assert len(_collect_query_rows(q.limit(5))) == 5


def test_chunking_covers_and_overlaps(spark, sf_dir):
    """Chunk algebra: chunks tile every token (last chunk may be short),
    consecutive chunks overlap by exactly stride-vs-width difference,
    and chunk_idx is dense from 0."""
    from ripple_server_spark.plans.pipeline2 import CHUNK_STRIDE, CHUNK_TOKENS
    from ripple_server_spark.plans.registry import SPECS

    docs = load_table(spark, sf_dir, "documents").limit(100)
    n_tok = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", F.size(F.split("text", " ")).alias("n")
        ).collect()
    }
    chunks = SPECS["q_text_chunking"].builder(spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in chunks:
        if r["doc_id"] in n_tok:
            by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_idx"])
        n = n_tok[doc_id]
        assert [r["chunk_idx"] for r in rows] == list(range(len(rows)))
        # tiling: starts at stride intervals; last chunk reaches the end
        assert (len(rows) - 1) * CHUNK_STRIDE < n
        # the true last chunk starts at the final stride boundary, so its
        # width is n - idx*stride (always <= stride < CHUNK_TOKENS); a
        # full-width "last" chunk would mean the tail chunk was dropped
        last = rows[-1]
        assert last["chunk_tokens"] == n - last["chunk_idx"] * CHUNK_STRIDE
        for r in rows[:-1]:
            assert r["chunk_tokens"] == min(
                CHUNK_TOKENS, n - r["chunk_idx"] * CHUNK_STRIDE
            )


def test_seq_packing_respects_budget_order(spark, sf_dir):
    """Packing algebra: within a source, bins are assigned in doc_id
    order, bin ids are non-decreasing, and a bin's token total only
    exceeds the budget by at most its final doc (greedy prefix fill)."""
    from ripple_server_spark.plans.pipeline2 import PACK_TARGET
    from ripple_server_spark.plans.registry import SPECS

    rows = SPECS["q_seq_packing"].builder(spark, sf_dir).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r["doc_id"])
        bins = [r["pack_bin"] for r in rs]
        assert bins == sorted(bins), f"bins not monotone in {src}"
        totals: dict[int, int] = {}
        for r in rs:
            totals[r["pack_bin"]] = totals.get(r["pack_bin"], 0) + r["n_tokens"]
        # every bin but the last fills to its budget boundary: the docs in
        # bins <= b must total at least (b+1)*budget, else the next doc
        # could not have rolled over into bin b+1
        prefix = 0
        for b in sorted(totals):
            prefix += totals[b]
            if b != max(bins):
                assert prefix >= (b + 1) * PACK_TARGET, (src, b, prefix)
        # prefix-fill invariant: a doc's bin equals prior-tokens // budget
        run = 0
        for r in rs:
            assert r["pack_bin"] == run // PACK_TARGET
            run += r["n_tokens"]


def test_lsh_hot_bucket_cap_bounds_candidates(spark):
    """A giant cluster of identical docs makes every band bucket hot
    (s(s-1)/2 pairs); max_bucket_size must exclude those buckets while
    near-dup pairs colliding in sub-cap buckets still surface."""
    from ripple_server_spark.operators.dedup import (
        lsh_candidates,
        minhash_band_hashes,
        shingle_sets,
    )

    hot = "the quick brown fox jumps over the lazy dog again and again today"
    near_a = "entirely different content about spark lsh banding alpha beta gamma one"
    near_b = "entirely different content about spark lsh banding alpha beta gamma two"
    docs = spark.createDataFrame(
        [(i, hot) for i in range(30)] + [(100, near_a), (101, near_b)],
        "doc_id long, text string",
    )
    bands = minhash_band_hashes(shingle_sets(docs)).persist()

    uncapped = lsh_candidates(bands)
    capped = lsh_candidates(bands, max_bucket_size=10)
    n_uncapped = uncapped.count()
    n_capped = capped.count()
    # uncapped: the identical cluster alone contributes 30*29/2 pairs
    assert n_uncapped >= 30 * 29 // 2
    # capped: every hot-cluster bucket (size 30 > 10) is pruned
    assert n_capped < 30 * 29 // 2
    capped_pairs = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    assert all(not (a < 100 and b < 100) for a, b in capped_pairs)
    # the near-dup pair lives in a size-2 bucket and must survive
    assert (100, 101) in capped_pairs
    bands.unpersist()


def test_minhash_kernel_bands_match_expr_path(spark, sf_dir):
    """minhash_band_hashes_from_docs (Arrow kernel signatures) is
    bit-identical to the expr pipeline's band table — the two
    implementations are interchangeable, chosen on measured cost."""
    from ripple_server_spark.catalog import load_table
    from ripple_server_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    expr = set(
        map(tuple, dedup.minhash_band_hashes(dedup.shingle_sets(docs)).collect())
    )
    kern = set(map(tuple, dedup.minhash_band_hashes_from_docs(docs).collect()))
    assert expr == kern


def test_cms_overestimates_every_key(spark, sf_dir):
    """The CMS soundness invariant (est >= exact) must hold for EVERY
    key, not just the declared query's top-20: min over d row-estimates
    can never undercount because each counter sums a superset of the
    key's increments."""
    from pyspark.sql import functions as F
    from ripple_server_spark.plans.analytics4 import _CMS_DEPTH, _CMS_WIDTH, _h48

    ev = load_table(spark, sf_dir, "events")
    uc = ev.groupBy("user_id").agg(F.count("*").alias("cnt"))
    fan = uc.select(
        "user_id",
        "cnt",
        F.explode(F.array(*[F.lit(r) for r in range(_CMS_DEPTH)])).alias("r"),
    ).withColumn("b", _h48(F.concat_ws(":", F.col("r"), F.col("user_id"))) % _CMS_WIDTH)
    sketch = fan.groupBy("r", "b").agg(F.sum("cnt").alias("s"))
    est = fan.join(sketch, on=["r", "b"]).groupBy("user_id").agg(F.min("s").alias("est"))
    bad = est.join(uc, "user_id").filter(F.col("est") < F.col("cnt")).count()
    assert bad == 0


def test_weighted_sample_invariants(spark, sf_dir):
    """A-ES sample: exactly k rows per source with ranks 1..k, stable
    across recomputation (md5 draw, no rand()), and equal to an
    INDEPENDENT Python recomputation of the Efraimidis–Spirakis draw
    (hashlib + math, no Spark/DuckDB expressions) — so a formula-level
    mistake mirrored into both engine pipelines still gets caught."""
    import hashlib
    import math

    from ripple_server_spark.plans.analytics4 import _WS_K, _WS_SEED

    rows1 = sorted(
        (r["source"], r["doc_id"], r["pick_rank"])
        for r in SPECS["q_weighted_sample"].builder(spark, sf_dir).collect()
    )
    rows2 = sorted(
        (r["source"], r["doc_id"], r["pick_rank"])
        for r in SPECS["q_weighted_sample"].builder(spark, sf_dir).collect()
    )
    assert rows1 == rows2  # deterministic draw
    per_source: dict[str, list[int]] = {}
    for s, _, rank in rows1:
        per_source.setdefault(s, []).append(rank)
    for s, ranks in per_source.items():
        assert sorted(ranks) == list(range(1, _WS_K + 1)), s
    # independent reference draw over the raw table
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars"
    ).collect()
    by_source: dict[str, list[tuple[float, int]]] = {}
    for r in docs:
        h48 = int.from_bytes(
            hashlib.md5(f"{_WS_SEED}:{r['doc_id']}".encode()).digest()[:6], "big"
        )
        u = (h48 + 0.5) / float(1 << 48)
        key = math.log(u) / max(r["n_chars"], 1)
        by_source.setdefault(r["source"], []).append((key, r["doc_id"]))
    expected = sorted(
        (s, doc_id, rank)
        for s, keyed in by_source.items()
        for rank, (_, doc_id) in enumerate(
            sorted(keyed, key=lambda t: (-t[0], t[1]))[:_WS_K], start=1
        )
    )
    assert rows1 == expected


def test_pagerank_matches_numpy_power_iteration(spark, sf_dir):
    """Independent cross-check of q_pagerank_types: rebuild the
    transition graph in pure pandas/numpy and run the same 3 damped
    power iterations — a formula-level mistake mirrored into both the
    Spark builder and the SQL oracle would still be caught here."""
    import numpy as np

    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    edges: dict[tuple[str, str], int] = {}
    for _, grp in ev.groupby("user_id"):
        types = grp["event_type"].tolist()
        for a, b in zip(types, types[1:]):
            edges[(a, b)] = edges.get((a, b), 0) + 1
    nodes = sorted(ev["event_type"].unique())
    idx = {t: i for i, t in enumerate(nodes)}
    n = len(nodes)
    out_tot = {}
    for (a, _), c in edges.items():
        out_tot[a] = out_tot.get(a, 0) + c
    P = np.zeros((n, n))
    for (a, b), c in edges.items():
        P[idx[a], idx[b]] = c / out_tot[a]
    d = 0.85
    pr = np.full(n, 1.0 / n)
    dangling = np.array([out_tot.get(t, 0) == 0 for t in nodes])
    for _ in range(3):
        pr = (1 - d) / n + d * (pr @ P + pr[dangling].sum() / n)
    got = {
        r["event_type"]: r["pagerank"]
        for r in SPECS["q_pagerank_types"].builder(spark, sf_dir).collect()
    }
    for t in nodes:
        assert abs(got[t] - round(float(pr[idx[t]]), 6)) < 1e-5, t


def test_striped_running_matches_global_window(spark):
    """_striped_running's stripe-offset cumulative sum/max must equal
    the single-partition global window it replaces, in both
    directions, on adversarial data (duplicated order keys resolved by
    the tie column, values crossing stripe boundaries)."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ripple_server_spark.plans.analytics4 import _striped_running

    rng = random.Random(7)
    rows = [
        (i, float(rng.randrange(0, 500)), rng.randrange(1, 9), rng.randrange(0, 2))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "tie bigint, v double, x bigint, f bigint")
    for desc in (False, True):
        got = {
            r["tie"]: (r["cum_x"], r["cum_f"])
            for r in _striped_running(
                df, "v", "tie", sums=("x",), maxes=("f",), desc=desc
            ).collect()
        }
        sign = F.desc if desc else F.asc
        w = (
            Window.orderBy(sign("v"), sign("tie"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        want = {
            r["tie"]: (r["cx"], r["cf"])
            for r in df.select(
                "tie", F.sum("x").over(w).alias("cx"), F.max("f").over(w).alias("cf")
            ).collect()
        }
        assert got == want, f"desc={desc}"


def test_km_survival_terminal_step_is_zero(spark):
    """When every user still at risk churns at the max duration
    (d = n_risk), survival must be exactly 0 — not a NULL-dropped
    positive (Spark ln(0)=NULL) or an engine error (DuckDB ln(0)
    raises). Replays the q_km_survival step math on a spectrum whose
    terminal step kills everyone at risk (ADVICE.md r03)."""
    from pyspark.sql import functions as F

    from ripple_server_spark.plans.analytics4 import _striped_running

    # dur spectrum: 3 users end at day 1 (1 churn), 2 at day 5 (2 churn)
    times = spark.createDataFrame(
        [(1, 1, 3), (5, 2, 2)], "dur bigint, d bigint, ended bigint"
    )
    risk = _striped_running(times, "dur", None, sums=("ended",), desc=True).select(
        "dur", "d", F.col("cum_ended").alias("n_risk")
    )
    stepped = risk.withColumn(
        "term",
        F.log(
            F.when(
                F.col("d") < F.col("n_risk"),
                1.0 - F.col("d").cast("double") / F.col("n_risk"),
            ).otherwise(F.lit(1.0))
        ),
    ).withColumn("dead", F.when(F.col("d") == F.col("n_risk"), 1).otherwise(0))
    run = _striped_running(stepped, "dur", None, sums=("term",), maxes=("dead",))
    surv = {
        r["dur"]: r["s"]
        for r in run.select(
            "dur",
            F.round(
                F.when(F.col("cum_dead") == 1, F.lit(0.0)).otherwise(
                    F.exp(F.col("cum_term"))
                ),
                4,
            ).alias("s"),
        ).collect()
    }
    assert surv[1] == round(1 - 1 / 5, 4)  # 5 at risk, 1 churns
    assert surv[5] == 0.0  # terminal step: both remaining churn


def test_text_kernels_tolerate_null_text(spark):
    """The Arrow kernels must treat NULL text like the expr path does
    (split(NULL) is NULL -> explode drops the row / null signature),
    not crash the task with AttributeError on None."""
    from ripple_server_spark.operators.dedup import (
        minhash_band_hashes_from_docs,
        shingle_sets,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, None), (3, "a b c d f")],
        "doc_id bigint, text string",
    )
    sh = shingle_sets(docs)
    assert sh.filter(F.col("doc_id") == 2).count() == 0
    assert sh.filter(F.col("doc_id") == 1).count() == 3  # 5 words -> 3 shingles
    bands = minhash_band_hashes_from_docs(docs)
    assert bands.filter(F.col("doc_id") == 2).count() == 0
    assert bands.filter(F.col("doc_id") == 1).count() > 0


def test_incremental_setsim_replay_is_idempotent(spark):
    """foreachBatch replays the last epoch after a sink failure: the
    same batch_id must return the stored pairs WITHOUT re-ingesting
    (otherwise per-doc sizes double and every later Jaccard is wrong)."""
    from ripple_server_spark.operators.dedup import IncrementalSetSimJoin

    mk = lambda rows: spark.createDataFrame(rows, "doc_id bigint, text string")
    inc = IncrementalSetSimJoin(threshold=0.5)
    inc.observe(mk([(1, "a b c d e f g"), (2, "a b c d e f h")]), batch_id=0)
    state_count = inc.sh.count()
    out1 = {tuple(r) for r in inc.observe(
        mk([(3, "a b c d e f g x")]), batch_id=1
    ).select("doc_a", "doc_b").collect()}
    assert out1  # doc 3 is near-dup of 1 and/or 2
    n_after = inc.sh.count()
    # replay of epoch 1: same pairs back, state untouched
    out_replay = {tuple(r) for r in inc.observe(
        mk([(3, "a b c d e f g x")]), batch_id=1
    ).select("doc_a", "doc_b").collect()}
    assert out_replay == out1
    assert inc.sh.count() == n_after
    assert n_after > state_count


def test_connected_components_string_ids_local_tier(spark):
    """Content-hash (string) vertex ids must work in BOTH tiers — the
    local union-find previously hard-coded a bigint result schema."""
    from ripple_server_spark.operators.graph import connected_components

    e = spark.createDataFrame(
        [("h_b", "h_a"), ("h_c", "h_b"), ("h_e", "h_d")],
        "src string, dst string",
    )
    got = {r["id"]: r["comp"] for r in connected_components(e).collect()}
    assert got == {
        "h_a": "h_a", "h_b": "h_a", "h_c": "h_a", "h_d": "h_d", "h_e": "h_d"
    }


def test_connected_components_raises_when_not_converged(spark):
    """A diameter above max_iter must fail loudly, never return a
    silently-split component (downstream keep-one-per-cluster would
    keep multiple 'canonical' copies of one duplicate cluster)."""
    import pytest as _pytest

    from ripple_server_spark.operators.graph import connected_components

    chain = [(i, i + 1) for i in range(8)]
    e = spark.createDataFrame(chain, "src bigint, dst bigint")
    # force the distributed tier and starve the iteration budget
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(e, max_iter=2, max_local_edge_bytes=0)
    # with budget, the same input converges to one component
    ok = connected_components(e, max_iter=20, max_local_edge_bytes=0)
    assert {r["comp"] for r in ok.collect()} == {0}


def test_cc_rejects_nonpositive_max_iter(spark):
    """max_iter <= 0 must raise, not silently return identity labels
    (changed starts at 0, so a zero-round run would look converged to
    the fail-loud guard)."""
    import pytest as _pytest

    from ripple_server_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    e = spark.createDataFrame([(1, 2)], "src bigint, dst bigint")
    with _pytest.raises(ValueError, match="max_iter"):
        connected_components(e, max_iter=0, max_local_edge_bytes=0)
    with _pytest.raises(ValueError, match="max_iter"):
        connected_components_star(e, max_iter=0)


def test_similarity_empty_queries_and_corpus(spark, sf_dir):
    """Degenerate inputs fail cleanly: zero queries -> typed empty
    result from every top-k entry point (SQL empty-join semantics, not
    an np.stack crash); an empty corpus -> a clear training error."""
    import pytest as _pytest

    from ripple_server_spark.operators.similarity import (
        cosine_topk_scan,
        cosine_topk_scan_arrow,
        ivf_topk,
        pq_topk,
        train_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    no_q = emb.filter(F.lit(False)).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
    )
    for fn in (cosine_topk_scan, cosine_topk_scan_arrow, ivf_topk, pq_topk):
        out = fn(emb, no_q)
        assert out.count() == 0
        assert out.columns == ["q_id", "neighbor_id", "sim"]
    with _pytest.raises(ValueError, match="empty corpus"):
        train_centroids(emb.filter(F.lit(False)), nlist=4)


def test_incremental_setsim_prior_epoch_pairs_stay_usable(spark):
    """The frame observe() RETURNS belongs to the caller: a later epoch
    must not free its checkpoint blocks (a held handle would hit
    missing-block errors on its next action)."""
    from ripple_server_spark.operators.dedup import IncrementalSetSimJoin

    mk = lambda rows: spark.createDataFrame(rows, "doc_id bigint, text string")
    inc = IncrementalSetSimJoin(threshold=0.5)
    pairs_0 = inc.observe(mk([(1, "a b c d e f g"), (2, "a b c d e f h")]), batch_id=0)
    n0 = pairs_0.count()
    inc.observe(mk([(3, "a b c d e f g x")]), batch_id=1)
    inc.observe(mk([(4, "a b c d e f g y")]), batch_id=2)
    # epoch 0's handle still materializes after two later epochs
    assert pairs_0.count() == n0


def test_global_rank_stripes_track_session_parallelism(spark):
    """global_rank's stripe count must derive from the session's
    defaultParallelism, not a dev-box constant (VERDICT r04 nit 1):
    a fixed 32 would pin per-task sort size to ~1/32 of the table on
    a 1000-executor cluster. Also pins value-invariance: rank is
    exact for ANY stripe count, so the parallelism-derived default
    must produce identical results to an arbitrary explicit one."""
    import re

    from ripple_server_spark.operators.windows import global_rank

    df = spark.range(0, 500).selectExpr(
        "id AS event_id", "CAST(id % 13 AS DOUBLE) AS v"
    )
    ranked = global_rank(df, ["v", "event_id"])
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    counts = set(re.findall(r"rangepartitioning\(.*?, (\d+)\)", plan))
    assert counts == {str(spark.sparkContext.defaultParallelism)}, plan
    base = {(r["event_id"], r["rank"]) for r in ranked.collect()}
    explicit = {
        (r["event_id"], r["rank"])
        for r in global_rank(df, ["v", "event_id"], n_parts=5).collect()
    }
    assert base == explicit
    assert {r for _, r in base} == set(range(1, 501))


def test_vocab_growth_stripe_width_tracks_parallelism():
    """q_vocab_growth's doc_id stripe width must scale with the
    session's parallelism (VERDICT r04 nit 1): doubling cores halves
    the stripe width (more, smaller stripes), and the width never
    degenerates below one id. Behavioral check on the factored-out
    formula (ADVICE r05: the old test grepped the builder's source
    text, which an equivalent refactor would break and a wrong formula
    could still pass)."""
    from ripple_server_spark.plans.pipeline6 import stripe_width

    # 100k ids: 32 cores -> 64 stripes of 1562; 64 cores -> 128 of 781
    assert stripe_width(0, 99_999, 32) == 100_000 // 64
    assert stripe_width(0, 99_999, 64) == 100_000 // 128
    assert stripe_width(0, 99_999, 32) > stripe_width(0, 99_999, 64)
    # range smaller than the stripe count floors at width 1, never 0
    assert stripe_width(5, 9, 32) == 1
    # offset ranges use the span, not the absolute ids
    assert stripe_width(1_000_000, 1_099_999, 32) == 100_000 // 64


def test_pq_fused_scan_matches_two_pass(spark, sf_dir):
    """The r12 fused audit scan (pq_topk_with_exact: one corpus pass
    emitting PQ candidates, the brute-force baseline, and the corpus
    count as tagged arms) must be bit-identical to the standalone
    two-pass form — the arms share the exact per-batch kernel bodies
    (_pq_batch_candidates / _exact_batch_pairs) and the same
    _global_topk cuts, so any drift is a real bug."""
    from ripple_server_spark.operators.similarity import (
        cosine_topk_scan_arrow,
        pq_topk,
        pq_topk_with_exact,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
    )
    fused_pq, fused_exact, nc, qids, _caches = pq_topk_with_exact(emb, queries, k=3)
    assert {tuple(r) for r in fused_pq.collect()} == {
        tuple(r) for r in pq_topk(emb, queries, k=3).collect()
    }
    assert {tuple(r) for r in fused_exact.collect()} == {
        tuple(r) for r in cosine_topk_scan_arrow(emb, queries, k=3).collect()
    }
    assert nc.collect()[0]["nc"] == emb.count()
    assert sorted(qids) == [r["q_id"] for r in queries.select("q_id").orderBy("q_id").collect()]


def test_ivf_fused_scan_matches_two_pass(spark, sf_dir):
    """ivf_topk_with_exact (r12 fused audit scan) must be bit-identical
    to the standalone two-pass form, on both the IVF path and the
    tiny-corpus flat fallback, and its piggybacked nc must equal the
    corpus count."""
    from ripple_server_spark.operators.similarity import (
        cosine_topk_scan_arrow,
        ivf_topk,
        ivf_topk_with_exact,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
    )
    for nlist, nprobe in ((32, 12), (4096, 4)):  # second forces flat fallback
        fused_ivf, fused_exact, nc, qids, _caches = ivf_topk_with_exact(
            emb, queries, k=3, nlist=nlist, nprobe=nprobe
        )
        assert {tuple(r) for r in fused_ivf.collect()} == {
            tuple(r)
            for r in ivf_topk(emb, queries, k=3, nlist=nlist, nprobe=nprobe).collect()
        }
        assert {tuple(r) for r in fused_exact.collect()} == {
            tuple(r) for r in cosine_topk_scan_arrow(emb, queries, k=3).collect()
        }
        assert nc == emb.count()
        assert len(qids) == queries.count()


def test_ann_audit_driver_fold_matches_sql_form(spark, sf_dir):
    """The r12 driver-side audit fold must emit the same one-row
    summary the old distributed aggregate produced, including the
    degraded regimes the adversarial sweep exercises (missing exact
    rows, zero-return queries, sim drift past the 1e-6 gate)."""
    from ripple_server_spark.operators.similarity import ann_recall_audit

    emb = load_table(spark, sf_dir, "embeddings")
    q = spark.createDataFrame([(1,), (2,), (3,)], "q_id long")
    res = spark.createDataFrame(
        [(1, 10, 0.9), (1, 11, 0.8), (2, 12, 0.7), (3, 13, 0.6)],
        "q_id long, neighbor_id long, sim double",
    )
    # q3 has no exact row (drops from hits AND sim-err), q1's second
    # return misses the threshold, q2's id-match has sim drift
    ex = spark.createDataFrame(
        [(1, 10, 0.9), (1, 99, 0.85), (2, 12, 0.7000005)],
        "q_id long, neighbor_id long, exact_sim double",
    )
    [row] = ann_recall_audit(q, res, ex, emb, k=2, nc=1000).collect()
    assert (row["n_queries"], row["n_returned"]) == (3, 4)
    # min_ret 1 != expected_k 2 and q2's 5e-7 sim drift is under the
    # 1e-6 gate but the return-count term already fails -> False
    assert row["recall_ok"] is False
    # vacuous pass: zero queries
    empty_q = spark.createDataFrame([], "q_id long")
    empty = spark.createDataFrame([], "q_id long, neighbor_id long, sim double")
    empty_ex = spark.createDataFrame(
        [], "q_id long, neighbor_id long, exact_sim double"
    )
    [row] = ann_recall_audit(empty_q, empty, empty_ex, emb, k=3, nc=500).collect()
    assert (row["n_queries"], row["n_returned"], row["recall_ok"]) == (0, 0, True)


def test_audited_ann_queries_leave_no_dangling_cache(spark, sf_dir):
    """r13 persist hygiene: the fused-scan caches (and the IVF flat
    fallback's) are unpersisted once ann_recall_audit's driver folds
    have collected — building the audited ANN queries must leave zero
    persistent RDDs behind."""
    from ripple_server_spark.plans.extensions import q_ann_ivf_topk
    from ripple_server_spark.plans.pipeline6 import q_ann_pq_topk

    spark.catalog.clearCache()
    # delta, not absolute: a shared test session may carry RDD-level
    # persists from other suites that clearCache does not cover
    base = spark.sparkContext._jsc.getPersistentRDDs().size()
    for builder in (q_ann_pq_topk, q_ann_ivf_topk):
        df = builder(spark, sf_dir)
        df.collect()
        n_cached = spark.sparkContext._jsc.getPersistentRDDs().size()
        assert n_cached <= base, (
            f"{builder.__name__} left {n_cached - base} extra persistent "
            "RDDs cached"
        )
