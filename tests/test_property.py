"""Property-based tests (hypothesis): operator semantics vs naive
reference implementations on randomized inputs.

Each example generates a whole table and runs ONE Spark job over it
(hypothesis drives data diversity, not job count — Spark job latency
makes per-row examples impractical).
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ripple_server_spark.functions.text import shingles, shingles_pandas
from ripple_server_spark.operators.joins import asof_join

BASE = dt.datetime(2024, 1, 1)

# (key, t_offset_minutes) rows; small key space forces collisions/ties.
probe_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=25
)
ref_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=0, max_size=25
)


def naive_asof(probes, refs):
    """Reference semantics: latest ref with ts <= probe ts for the same
    key; among equal-ts refs the max ref id wins."""
    out = {}
    for pid, (pk, pt) in enumerate(probes):
        best = None
        for rid, (rk, rt) in enumerate(refs):
            if rk == pk and rt <= pt:
                cand = (rt, rid + 1000)
                if best is None or cand > best:
                    best = cand
        out[pid] = best[1] if best is not None else None
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(probes=probe_rows, refs=ref_rows)
def test_asof_join_matches_naive(spark, probes, refs):
    pdf = spark.createDataFrame(
        [(i, k, BASE + dt.timedelta(minutes=t)) for i, (k, t) in enumerate(probes)],
        "event_id long, user_id long, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [
            (i + 1000, k, BASE + dt.timedelta(minutes=t))
            for i, (k, t) in enumerate(refs)
        ]
        or [(int(-1), int(-1), BASE)],  # createDataFrame needs >=1 row for schema
        "event_id long, user_id long, ts timestamp",
    )
    if not refs:
        rdf = rdf.filter(F.col("event_id") >= 0)
    got = {
        r["event_id"]: r["asof_event_id"]
        for r in asof_join(
            pdf, rdf, key="user_id", time_col="ts", ref_id_col="event_id"
        ).collect()
    }
    assert got == naive_asof(probes, refs)


words = st.lists(
    st.text(alphabet="abc", min_size=1, max_size=3), min_size=0, max_size=12
)


def naive_shingles(ws, k=3):
    if len(ws) < k:
        return []
    return list(dict.fromkeys(" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)))


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=st.lists(words, min_size=1, max_size=20))
def test_shingle_kernels_agree(spark, docs):
    """Codegen-expr shingles == Arrow-kernel shingles == python naive,
    on arbitrary (including degenerate) token streams."""
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    expr_out = {
        r["doc_id"]: r["s"]
        for r in df.select("doc_id", shingles(F.col("text")).alias("s")).collect()
    }
    pandas_out = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", shingles_pandas(F.col("text")).alias("s")
        ).collect()
    }
    for i, ws in enumerate(docs):
        # split-on-space of the joined text (empty words collapse differently
        # from the token list, so compare against the re-split form)
        toks = " ".join(ws).split(" ")
        want = naive_shingles(toks)
        assert expr_out[i] == want, f"expr mismatch doc {i}: {toks}"
        assert pandas_out[i] == want, f"pandas mismatch doc {i}: {toks}"


edge_lists = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)),
    min_size=1,
    max_size=40,
)


def naive_components(edges):
    """Union-find ground truth: id -> min reachable vertex id."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(edge_lists)
def test_connected_components_matches_union_find(spark, edges):
    """Min-label propagation == union-find on arbitrary graphs
    (self-loops, multi-edges, long chains, disconnected pieces)."""
    from ripple_server_spark.operators.graph import connected_components

    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    want = naive_components(edges)
    # local union-find tier
    got = {r["id"]: r["comp"] for r in connected_components(df).collect()}
    assert got == want
    # distributed min-label-propagation tier (force with threshold 0)
    got_dist = {
        r["id"]: r["comp"]
        for r in connected_components(df, max_local_edge_bytes=0).collect()
    }
    assert got_dist == want


produce_plan = st.lists(st.integers(1, 40), min_size=1, max_size=4)
consume_plan = st.lists(
    st.tuples(st.integers(1, 30), st.booleans()), min_size=1, max_size=5
)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(produce_plan, consume_plan)
def test_topic_store_invariants(spark, tmp_path_factory, sizes, consumes):
    """Randomized produce/consume/commit sequences preserve the broker
    invariants: contiguous per-bucket seqs across appends; consume is
    non-destructive (same batch until commit); offsets advance only by
    commit; delivery is in seq order from the committed offset."""
    from ripple_server_spark.catalog import load_table
    from ripple_server_spark.sources.topics import TopicStore
    from tests.conftest import SF_SMOKE

    root = str(tmp_path_factory.mktemp("prop_topics"))
    store = TopicStore(spark, root)
    store.create_topic("t", n_buckets=3)
    ev = load_table(spark, SF_SMOKE, "events")

    total = 0
    off = 0
    for sz in sizes:
        batch = ev.filter(
            (F.col("event_id") >= off) & (F.col("event_id") < off + sz)
        )
        total += store.produce(batch, "t")
        off += sz
    log = store.read_topic("t")
    assert log.count() == total
    # contiguity per bucket
    for r in log.groupBy("bucket").agg(
        F.min("seq").alias("lo"), F.max("seq").alias("hi"),
        F.countDistinct("seq").alias("n"),
    ).collect():
        assert r["lo"] == 0 and r["n"] == r["hi"] + 1

    store.register_consumer("c", "t")
    expect_off = 0
    mx = store._bucket_maxima("t").get(0, -1)
    for count, do_commit in consumes:
        batch, nxt = store.consume("c", "t", bucket=0, count=count)
        seqs = [r["seq"] for r in batch.collect()]
        want = list(range(expect_off, min(expect_off + count, mx + 1)))
        assert seqs == want, (seqs, want)
        assert nxt == expect_off + len(want)
        if do_commit:
            store.commit("c", "t", bucket=0, offset=nxt)
            expect_off = nxt
        # without commit the next consume re-reads from expect_off


# ---------------------------------------------------------------------------
# Round-3 corpus-hygiene invariants
# ---------------------------------------------------------------------------

_words = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"])
_texts = st.lists(
    st.lists(_words, min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=16,
)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=_texts)
def test_span_kernel_matches_naive(spark, texts):
    """spans_pandas == naive non-overlapping W-word segmentation
    (including empty and shorter-than-W texts)."""
    from ripple_server_spark.functions.text import spans_pandas

    W = 3
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["spans"]
        for r in df.select(
            "doc_id", spans_pandas(F.col("text"), W).alias("spans")
        ).collect()
    }
    for i, t in enumerate(texts):
        w = t.split(" ")
        want = [" ".join(w[j : j + W]) for j in range(0, len(w), W)]
        assert got[i] == want, (t, got[i], want)


def _py_bloom_flags(texts: dict[int, str], bench_below: int):
    """Pure-Python simulation of bloom_doc_flags: 5-gram sets, md5-slice
    positions, k-position AND membership."""
    import hashlib

    def grams(t):
        w = t.split(" ")
        return {" ".join(w[i : i + 5]) for i in range(len(w) - 4)} if len(w) >= 5 else set()

    def pos(g):
        h = hashlib.md5(g.encode()).hexdigest()
        return {int(h[0:4], 16), int(h[4:8], 16), int(h[8:12], 16)}

    bench = set().union(*(grams(t) for d, t in texts.items() if d < bench_below), set())
    bits = set().union(*(pos(g) for g in bench), set())
    out = {}
    for d, t in texts.items():
        if d < bench_below:
            continue
        g = grams(t)
        exact = int(bool(g & bench))
        bloomed = int(any(pos(x) <= bits for x in g))
        out[d] = (bloomed, exact)
    return out


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=_texts)
def test_bloom_flags_match_python_simulation(spark, texts):
    """bloom_doc_flags == an independent pure-Python Bloom simulation,
    and the no-false-negative invariant (exact => bloomed) holds."""
    from ripple_server_spark.plans.pipeline5 import bloom_doc_flags

    table = {i: t for i, t in enumerate(texts)}
    bench_below = max(1, len(texts) // 3)
    df = spark.createDataFrame(
        [(i, "s", t) for i, t in table.items()],
        "doc_id long, source string, text string",
    )
    got = {
        r["doc_id"]: (r["bloomed"], r["exact"])
        for r in bloom_doc_flags(df, bench_below=bench_below).collect()
    }
    want = _py_bloom_flags(table, bench_below)
    assert got == want
    for bloomed, exact in got.values():
        assert exact <= bloomed  # Bloom filters have no false negatives


dist_values = st.lists(
    st.tuples(st.integers(0, 10_000), st.floats(0, 499, allow_nan=False)),
    min_size=1,
    max_size=60,
    unique_by=lambda t: t[0],
)


@given(rows=dist_values)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_distribution_window_arithmetic_matches_builtins(spark, rows):
    """q_window_distribution derives ntile/percent_rank/cume_dist from
    the striped exact rank arithmetically; this pins the arithmetic to
    Spark's own window builtins on randomized sizes (ntile bucket
    boundaries are the subtle part: first n%k buckets get ceil(n/k))."""
    from pyspark.sql import Window

    from ripple_server_spark.plans.analytics4 import _rank_in_group

    df = spark.createDataFrame(rows, "event_id bigint, value double")
    w = Window.orderBy(F.asc("value"), F.asc("event_id"))
    want = {
        r["event_id"]: (r["q"], round(r["pr"], 6), round(r["cd"], 6))
        for r in df.select(
            "event_id",
            F.ntile(4).over(w).alias("q"),
            F.percent_rank().over(w).alias("pr"),
            F.cume_dist().over(w).alias("cd"),
        ).collect()
    }
    ranked = _rank_in_group(df.withColumn("_g", F.lit(0)), "_g", "value", "event_id")
    n_agg = df.agg(F.count("*").alias("_n"))
    ntile4 = F.expr(
        "CASE WHEN rn <= (_n % 4) * ((_n div 4) + 1)"
        "     THEN 1 + (rn - 1) div ((_n div 4) + 1)"
        "     ELSE (_n % 4) + 1 + (rn - 1 - (_n % 4) * ((_n div 4) + 1)) div (_n div 4)"
        " END"
    )
    pr = F.when(F.col("_n") == 1, F.lit(0.0)).otherwise(
        (F.col("rn") - 1).cast("double") / (F.col("_n") - 1)
    )
    got = {
        r["event_id"]: (r["q"], round(r["pr"], 6), round(r["cd"], 6))
        for r in ranked.crossJoin(F.broadcast(n_agg))
        .select(
            "event_id",
            ntile4.cast("int").alias("q"),
            pr.alias("pr"),
            (F.col("rn").cast("double") / F.col("_n")).alias("cd"),
        )
        .collect()
    }
    assert got == want


budget_docs = st.lists(
    st.tuples(
        st.integers(0, 500),       # doc_id (unique_by below)
        st.integers(0, 4),         # source id (small -> collisions)
        st.integers(100, 110),     # n_chars (tiny range -> heavy ties)
        st.integers(1, 2500),      # n_tokens (40 docs can far exceed
        #   the 20k budget, so the boundary stratum and exact-fit cases bind)
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda t: t[0],
)


@given(rows=budget_docs)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_token_budget_two_pass_matches_naive_greedy(spark, rows, tmp_path_factory):
    """q_token_budget_select's histogram+boundary-stratum two-pass must
    equal the naive greedy running sum on adversarial inputs: heavy
    priority ties, budget boundaries landing inside a stratum, and
    budgets exactly consumed. Docs are written as a synthetic
    documents.parquet so the real registered builder runs unmodified."""
    from ripple_server_spark.plans.registry import SPECS

    sf_dir = str(tmp_path_factory.mktemp("budget_prop"))
    spark.createDataFrame(
        [
            (
                doc_id,
                "w " * (n_tokens - 1) + "w",  # exactly n_tokens tokens
                "en",
                f"src{src}",
                n_chars,
            )
            for doc_id, src, n_chars, n_tokens in rows
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    got = {
        r["source"]: (r["n_selected"], r["tokens_selected"])
        for r in SPECS["q_token_budget_select"].builder(spark, sf_dir).collect()
    }
    # naive greedy: (n_chars desc, doc_id asc), keep while cum <= 20000
    want: dict[str, list[int]] = {}
    cum = 0
    for doc_id, src, n_chars, n_tokens in sorted(rows, key=lambda t: (-t[2], t[0])):
        cum += n_tokens
        if cum <= 20000:
            want.setdefault(f"src{src}", [0, 0])
            want[f"src{src}"][0] += 1
            want[f"src{src}"][1] += n_tokens
    assert got == {k: tuple(v) for k, v in want.items()}


vocab_docs = st.lists(
    st.tuples(
        st.integers(0, 10_000_000),  # doc_id: sparse, clustered, huge gaps
        st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=6),  # tokens
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda t: t[0],
)


@given(rows=vocab_docs)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_vocab_growth_striped_rank_handles_sparse_ids(spark, rows, tmp_path_factory):
    """q_vocab_growth's arithmetic-striped doc_id rank must equal the
    naive rank-by-sort on SPARSE, clustered id spaces (the fixtures are
    dense 0..n-1, which would mask a rank bug that assumes density)."""
    from ripple_server_spark.plans.registry import SPECS

    sf_dir = str(tmp_path_factory.mktemp("vocab_prop"))
    spark.createDataFrame(
        [(doc_id, " ".join(toks), "en", "src0", len(toks)) for doc_id, toks in rows],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    got = {
        r["decile"]: (r["cum_tokens"], r["cum_vocab"])
        for r in SPECS["q_vocab_growth"].builder(spark, sf_dir).collect()
    }
    # naive: rank docs by doc_id, slice into tenths, first-seen vocab
    n = len(rows)
    ordered = sorted(rows, key=lambda t: t[0])
    seen: set[str] = set()
    per_g_tokens: dict[int, int] = {}
    per_g_new: dict[int, int] = {}
    for i, (_doc, toks) in enumerate(ordered):
        g = (i * 10) // n
        per_g_tokens[g] = per_g_tokens.get(g, 0) + len(toks)
        for w in toks:
            if w not in seen:
                seen.add(w)
                per_g_new[g] = per_g_new.get(g, 0) + 1
    want = {}
    ct = cv = 0
    for g in sorted(per_g_tokens):
        ct += per_g_tokens[g]
        cv += per_g_new.get(g, 0)
        want[g] = (ct, cv)
    assert got == want


star_edge_lists = st.lists(
    st.tuples(st.integers(0, 40), st.integers(0, 40)),
    min_size=1,
    max_size=60,
)


@given(edges=star_edge_lists)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_star_cc_matches_union_find(spark, edges):
    """Large-star/small-star CC must label every vertex with the
    component minimum, exactly like a driver union-find, on random
    multigraphs with self-loops and duplicate edges."""
    from ripple_server_spark.operators.graph import connected_components_star

    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {
        r["id"]: r["comp"]
        for r in connected_components_star(df, max_iter=30).collect()
    }
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # EVERY vertex that appears in any edge is labeled — including
    # vertices whose only edge is a self-loop (singleton components),
    # exactly matching connected_components()'s union-find contract
    want = {v: find(v) for v in {x for e in edges for x in e}}
    assert got == want


def test_star_cc_handles_long_chains_in_log_rounds(spark):
    """A 512-node path is the adversarial diameter case: min-label
    propagation needs ~512 rounds; the star alternation must finish
    within 15 (O(log n)) and still produce exact minima."""
    from ripple_server_spark.operators.graph import connected_components_star

    n = 512
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src bigint, dst bigint"
    )
    got = {r["id"]: r["comp"] for r in connected_components_star(df, max_iter=15).collect()}
    assert got == {i: 0 for i in range(n)}


from hypothesis.extra import numpy as hnp  # noqa: E402


@settings(max_examples=60, deadline=None)
@given(
    arr=st.integers(1, 4).flatmap(
        lambda c: hnp.arrays(
            dtype="uint8",
            shape=st.tuples(st.integers(1, 24), st.integers(1, 24), st.just(c)),
        )
    )
)
def test_png_roundtrip_property(arr):
    """encode_png -> parse_png is byte-lossless for every channel count
    (gray/LA/RGB/RGBA) on arbitrary uint8 rasters — the property the
    deterministic filter-matrix tests sample, fuzzed."""
    import numpy as np

    from ripple_server_spark.codecs import encode_png, parse_png

    out = parse_png(encode_png(arr))
    got = out.arr if out.arr.ndim == 3 else out.arr[:, :, None]
    assert got.shape == arr.shape
    assert np.array_equal(got, arr)


@settings(max_examples=60, deadline=None)
@given(
    arr=st.sampled_from([1, 3]).flatmap(
        lambda c: hnp.arrays(
            dtype="uint8",
            shape=st.tuples(st.integers(1, 24), st.integers(1, 24), st.just(c)),
        )
    )
)
def test_netpbm_roundtrip_property(arr):
    """encode_netpbm -> parse_netpbm is byte-lossless for P5/P6."""
    import numpy as np

    from ripple_server_spark.codecs import encode_netpbm, parse_netpbm

    out = parse_netpbm(encode_netpbm(arr))
    got = out.arr if out.arr.ndim == 3 else out.arr[:, :, None]
    assert got.shape == arr.shape
    assert np.array_equal(got, arr)


@settings(max_examples=60, deadline=None)
@given(
    arr=st.sampled_from([1, 2, 3, 4]).flatmap(
        lambda c: hnp.arrays(
            dtype="uint16",
            shape=st.tuples(st.integers(1, 24), st.integers(1, 24), st.just(c)),
        )
    )
)
def test_png16_roundtrip_property(arr):
    """encode_png(uint16) -> parse_png decodes bit-depth-16 rasters for
    every channel count; the uniform uint8 handle carries each
    big-endian sample's HIGH byte (v >> 8, the documented scale-to-8
    policy), so the round-trip equals arr >> 8 exactly."""
    import numpy as np

    from ripple_server_spark.codecs import encode_png, parse_png

    out = parse_png(encode_png(arr))
    got = out.arr if out.arr.ndim == 3 else out.arr[:, :, None]
    assert got.shape == arr.shape
    assert np.array_equal(got, (arr >> 8).astype(np.uint8))


@settings(max_examples=40, deadline=None)
@given(
    arr=st.sampled_from([1, 3]).flatmap(
        lambda c: hnp.arrays(
            dtype="uint8",
            shape=st.tuples(st.integers(1, 16), st.integers(1, 16), st.just(c)),
        )
    )
)
def test_png16_expansion_is_exact_inverse(arr):
    """The v*257 8->16 expansion (the standard 8-bit-in-16-bit-container
    encoding) round-trips BYTE-EXACTLY through the 16-bit decode path:
    decode(encode16(v*257)) == v."""
    import numpy as np

    from ripple_server_spark.codecs import encode_png, parse_png

    wide = arr.astype(np.uint16) * 257
    out = parse_png(encode_png(wide))
    got = out.arr if out.arr.ndim == 3 else out.arr[:, :, None]
    assert np.array_equal(got, arr)


@settings(max_examples=50, deadline=None)
@given(
    arr=st.sampled_from([(2, 1), (2, 2), (1, 1)]).flatmap(
        lambda wc: hnp.arrays(
            dtype="int32",
            shape=st.tuples(st.integers(1, 300), st.just(wc[1])),
            elements=st.integers(-128, 127)
            if wc[0] == 1
            else st.integers(-32768, 32767),
        ).map(lambda a: (a, wc[0]))
    )
)
def test_wav_roundtrip_property(arr):
    """encode_wav -> parse_wav is sample-lossless for 8- and 16-bit
    PCM, mono and stereo, odd lengths (RIFF pad byte)."""
    import numpy as np

    from ripple_server_spark.codecs import encode_wav, parse_wav

    data, width = arr
    h = parse_wav(encode_wav(data, rate=8000, sample_width=width))
    assert h.sample_width == width and h.rate == 8000
    assert np.array_equal(h.data, data)


@settings(max_examples=60, deadline=None)
@given(
    arr=st.integers(1, 4).flatmap(
        lambda c: hnp.arrays(
            dtype="uint8",
            shape=st.tuples(st.integers(1, 24), st.integers(1, 24), st.just(c)),
        )
    )
)
def test_png_adam7_roundtrip_property(arr):
    """encode_png(interlace=True) -> parse_png is byte-lossless on
    arbitrary uint8 rasters for every channel count — fuzzes the Adam7
    pass grid over every (w mod 8, h mod 8) residue class, including
    the degenerate sizes where most passes are empty (w or h < 8)."""
    import numpy as np

    from ripple_server_spark.codecs import encode_png, parse_png

    out = parse_png(encode_png(arr, interlace=True))
    got = out.arr if out.arr.ndim == 3 else out.arr[:, :, None]
    assert got.shape == arr.shape
    assert np.array_equal(got, arr)


@settings(max_examples=30, deadline=None)
@given(
    arr=hnp.arrays(
        dtype="uint16",
        shape=st.tuples(st.integers(1, 16), st.integers(1, 16), st.just(3)),
    )
)
def test_png_adam7_16bit_roundtrip_property(arr):
    """Adam7 + 16-bit: per-pass byte unfiltering must keep bpp =
    channels x 2 so the high-byte scale-to-8 policy sees the samples
    big-endian-aligned — the interaction the sequential 16-bit test
    cannot cover."""
    import numpy as np

    from ripple_server_spark.codecs import encode_png, parse_png

    out = parse_png(encode_png(arr, interlace=True))
    assert out.arr.shape == arr.shape
    assert np.array_equal(out.arr, (arr >> 8).astype("uint8"))
