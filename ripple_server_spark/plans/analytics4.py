"""Round-3 analytics additions: deterministic weighted sampling,
count-min-sketch heavy hitters, exact robust statistics, and an
equi-height histogram. No reference analog (the reference is a message
queue — SURVEY.md §2); these extend the training-data-pipeline and
stats surfaces BASELINE.json mandates. Determinism rules follow the
registry contract: md5-derived pseudo-randomness (never rand()),
integer arithmetic wherever a comparison or selection depends on it,
and floats rounded only at the result edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ripple_server_spark.catalog import load_table
from ripple_server_spark.plans.registry import query

# 48-bit md5 prefix as BIGINT — the engine-portable hash primitive used
# across the pipeline queries (same construction as q_seeded_shuffle).
_TWO48 = float(1 << 48)

# Coarse value-range stripe used by the two-pass exact-rank trick:
# events.value is uniform on [0, 500), so /50 gives ~10 stripes.
_STRIPE = 50.0


def _h48(col):
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("bigint")


# --------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis–Spirakis A-ES)
# --------------------------------------------------------------------------

_WS_SEED = "ws1"
_WS_K = 10


@query(
    "q_weighted_sample",
    oracle=f"""
    WITH keyed AS (
        SELECT source, doc_id, n_chars,
               ln((('0x' || substr(md5('{_WS_SEED}:' || CAST(doc_id AS VARCHAR)),
                     1, 12))::BIGINT + 0.5) / {_TWO48})
                   / greatest(n_chars, 1) AS es_key
        FROM documents
    )
    SELECT source, doc_id, n_chars,
           CAST(row_number() OVER (
               PARTITION BY source ORDER BY es_key DESC, doc_id
           ) AS BIGINT) AS pick_rank
    FROM keyed
    QUALIFY pick_rank <= {_WS_K}
    """,
    tags=("pipeline", "sampling", "weighted"),
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis): each
    doc draws u = md5-uniform in (0,1) and competes with key u^(1/w),
    w = n_chars; the top-k keys per source are the sample. Ranking uses
    the monotone log form ln(u)/w (avoids pow() cross-engine edge
    cases); the hash-derived u makes the draw reproducible across
    engines, runs, and partitionings — the property rand() cannot give
    a training pipeline.

    Scale shape: one narrow projection computes the key (codegen md5 +
    ln, no shuffle), then a single per-source top-k window — the same
    partial top-k Spark already pushes map-side via WindowGroupLimit.
    No global sort, no driver collect; sample size per group is k
    regardless of corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    u = (_h48(F.concat_ws(":", F.lit(_WS_SEED), F.col("doc_id"))) + F.lit(0.5)) / F.lit(_TWO48)
    keyed = docs.select(
        "source",
        "doc_id",
        "n_chars",
        (F.log(u) / F.greatest(F.col("n_chars"), F.lit(1))).alias("es_key"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("es_key"), F.asc("doc_id"))
    return (
        keyed.withColumn("pick_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("pick_rank") <= _WS_K)
        .select("source", "doc_id", "n_chars", "pick_rank")
    )


# --------------------------------------------------------------------------
# Count-min sketch heavy hitters
# --------------------------------------------------------------------------

_CMS_DEPTH = 4
_CMS_WIDTH = 512
_CMS_TOPK = 20


@query(
    "q_heavy_hitters_cms",
    oracle=f"""
    WITH uc AS (
        SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
    ),
    fan AS (
        SELECT user_id, cnt, r,
               ('0x' || substr(md5(CAST(r AS VARCHAR) || ':'
                    || CAST(user_id AS VARCHAR)), 1, 12))::BIGINT
                   % {_CMS_WIDTH} AS b
        FROM uc, unnest(range({_CMS_DEPTH})) AS t(r)
    ),
    sketch AS (
        SELECT r, b, CAST(sum(cnt) AS BIGINT) AS s FROM fan GROUP BY r, b
    ),
    est AS (
        SELECT f.user_id, min(s.s) AS est_count
        FROM fan f JOIN sketch s ON s.r = f.r AND s.b = f.b
        GROUP BY f.user_id
    )
    SELECT e.user_id, e.est_count, uc.cnt AS exact_count,
           e.est_count >= uc.cnt AS overestimates
    FROM est e JOIN uc USING (user_id)
    QUALIFY row_number() OVER (ORDER BY e.est_count DESC, e.user_id)
        <= {_CMS_TOPK}
    """,
    tags=("agg", "sketch", "cms", "heavy-hitters"),
)
def q_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters with an in-plan soundness audit:
    build a 4x512 CMS over per-user event counts
    (md5-derived row hashes — deterministic, mergeable), estimate each key
    as min over rows, and emit the top-20 estimated users
    alongside their exact counts and the CMS overestimate guarantee
    (est >= exact must hold for every row — a violated bit fails the
    hash).

    Scale shape: counts are partial-aggregated per key FIRST (one
    shuffle on user_id — the same shuffle an exact count needs), then
    the sketch is built from the key-level table, so the d-way fan-out
    multiplies keys, not events. The sketch itself is a fixed
    2048-counter table — broadcastable state that
    an executor could maintain incrementally; here it round-trips
    through a groupBy to stay declarative. At 100 TB the event->key
    aggregation dominates and is unavoidable for the audit; a
    production streaming CMS drops it and keeps only the 2 KB sketch."""
    events = load_table(spark, sf_dir, "events")
    uc = events.groupBy("user_id").agg(F.count("*").alias("cnt"))
    fan = uc.select(
        "user_id",
        "cnt",
        F.explode(F.array(*[F.lit(r) for r in range(_CMS_DEPTH)])).alias("r"),
    ).withColumn(
        "b",
        _h48(F.concat_ws(":", F.col("r"), F.col("user_id"))) % _CMS_WIDTH,
    )
    sketch = fan.groupBy("r", "b").agg(F.sum("cnt").cast("bigint").alias("s"))
    est = (
        fan.join(sketch, on=["r", "b"])
        .groupBy("user_id")
        .agg(F.min("s").alias("est_count"))
    )
    ranked = est.join(uc, on="user_id").select(
        "user_id",
        "est_count",
        F.col("cnt").alias("exact_count"),
        (F.col("est_count") >= F.col("cnt")).alias("overestimates"),
    )
    # orderBy+limit compiles to TakeOrderedAndProject (per-partition
    # top-k + k-row merge) — no single-partition window over the keys.
    return ranked.orderBy(F.desc("est_count"), F.asc("user_id")).limit(_CMS_TOPK)


# --------------------------------------------------------------------------
# Exact robust statistics (median / MAD / winsorized mean)
# --------------------------------------------------------------------------


def _rank_in_group(df: DataFrame, group: str, value: str, tie: str) -> DataFrame:
    """Exact global rank of `value` within `group` WITHOUT a
    single-partition-per-group window: stripe rows by coarse value
    range, count stripes (tiny aggregate), broadcast cumulative stripe
    offsets back, and rank only within (group, stripe). rank =
    stripe offset + local row_number — no task ever holds a whole
    group. The q_seeded_shuffle two-pass trick applied per group.

    _STRIPE is a constant sized to the fixture's value range ([0, 500)
    -> ~10 stripes); correctness never depends on it (a degenerate
    single stripe just degrades to the per-group window), and a
    production ANALYZE would derive the stripe width from table
    min/max stats instead of a constant."""
    striped = df.withColumn("_stripe", F.floor(F.col(value) / _STRIPE).cast("bigint"))
    counts = striped.groupBy(group, "_stripe").agg(F.count("*").alias("_n"))
    woff = (
        Window.partitionBy(group)
        .orderBy("_stripe")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        group, "_stripe", F.coalesce(F.sum("_n").over(woff), F.lit(0)).alias("_off")
    )
    wloc = Window.partitionBy(group, "_stripe").orderBy(value, tie)
    return (
        striped.join(F.broadcast(offsets), on=[group, "_stripe"])
        .withColumn("rn", F.col("_off") + F.row_number().over(wloc))
        .drop("_stripe", "_off")
    )


def _striped_running(
    df: DataFrame,
    order: str,
    tie: str | None,
    sums: tuple[str, ...] = (),
    maxes: tuple[str, ...] = (),
    desc: bool = False,
) -> DataFrame:
    """Running-state aggregates (cumulative sum / max) over a global
    order WITHOUT a single-partition window — the cumulative-sum twin
    of :func:`_rank_in_group`. Rows are striped by coarse `order`
    range; per-stripe totals are a tiny aggregate whose cumulative
    offsets broadcast back; the running state within a stripe is a
    window PARTITIONED BY the stripe. Adds one `cum_<col>` column per
    requested input. Exact for sums up to floating-point association
    order (integer sums are bit-exact)."""
    sign = F.desc if desc else F.asc
    striped = df.withColumn("_stripe", F.floor(F.col(order) / _STRIPE).cast("bigint"))
    agg_exprs = [F.sum(c).alias(f"_s_{c}") for c in sums] + [
        F.max(c).alias(f"_m_{c}") for c in maxes
    ]
    counts = striped.groupBy("_stripe").agg(*agg_exprs)
    woff = Window.orderBy(sign("_stripe")).rowsBetween(Window.unboundedPreceding, -1)
    off_exprs = [
        F.coalesce(F.sum(f"_s_{c}").over(woff), F.lit(0)).alias(f"_so_{c}") for c in sums
    ] + [F.max(f"_m_{c}").over(woff).alias(f"_mo_{c}") for c in maxes]
    offsets = counts.select("_stripe", *off_exprs)
    order_cols = [sign(order)] + ([sign(tie)] if tie else [])
    wloc = (
        Window.partitionBy("_stripe")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = striped.join(F.broadcast(offsets), "_stripe")
    for c in sums:
        out = out.withColumn(f"cum_{c}", F.col(f"_so_{c}") + F.sum(c).over(wloc))
    for c in maxes:
        # greatest() skips NULL (first stripe has no offset), so this is
        # max(prior-stripe max, running max within this stripe).
        out = out.withColumn(
            f"cum_{c}", F.greatest(F.col(f"_mo_{c}"), F.max(c).over(wloc))
        )
    drop = ["_stripe"] + [f"_so_{c}" for c in sums] + [f"_mo_{c}" for c in maxes]
    return out.drop(*drop)


@query(
    "q_robust_stats",
    oracle="""
    WITH ranked AS (
        SELECT event_type, value,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY value, event_id
               ) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events
    ),
    med AS (
        SELECT event_type, n, value AS med FROM ranked
        WHERE rn = (n + 1) // 2
    ),
    lo AS (
        SELECT r.event_type, r.value AS p05 FROM ranked r JOIN med m USING (event_type)
        WHERE r.rn = greatest(1, CAST(ceil(0.05 * m.n) AS BIGINT))
    ),
    hi AS (
        SELECT r.event_type, r.value AS p95 FROM ranked r JOIN med m USING (event_type)
        WHERE r.rn = CAST(ceil(0.95 * m.n) AS BIGINT)
    ),
    dev AS (
        SELECT e.event_type, abs(e.value - m.med) AS d,
               row_number() OVER (
                   PARTITION BY e.event_type ORDER BY abs(e.value - m.med), e.event_id
               ) AS drn,
               m.n
        FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
        SELECT event_type, d AS mad FROM dev WHERE drn = (n + 1) // 2
    )
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(any_value(m.med), 4) AS med,
           round(any_value(md.mad), 4) AS mad,
           round(avg(least(greatest(e.value, l.p05), h.p95)), 3) AS win_mean
    FROM events e
    JOIN med m USING (event_type)
    JOIN mad md USING (event_type)
    JOIN lo l USING (event_type)
    JOIN hi h USING (event_type)
    GROUP BY e.event_type
    """,
    tags=("agg", "stats", "robust", "percentile"),
)
def q_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact robust statistics per event_type: lower median, MAD
    (median absolute deviation), and the 5%-winsorized mean — the
    outlier-resistant profile a data-quality monitor wants where plain
    mean/stddev are skew-blind. Selection is exact rank (not
    percentile_cont interpolation) so both engines pick identical data
    values.

    Scale shape: exact per-group order statistics normally mean a
    per-group sort on one task; here every rank comes from
    :func:`_rank_in_group` — stripe-count + broadcast offsets + local
    window — so the widest task holds one (group, value-stripe) slice.
    Two striped passes (values, then absolute deviations), each a
    single shuffle; the winsorized mean reuses the p05/p95 cut points
    as a broadcast join, one final aggregate. The approx path for
    billion-group data stays q_approx_percentile_value."""
    events = load_table(spark, sf_dir, "events").select("event_type", "event_id", "value")
    ranked = _rank_in_group(events, "event_type", "value", "event_id")
    n_tbl = events.groupBy("event_type").agg(F.count("*").alias("n"))
    ranked = ranked.join(F.broadcast(n_tbl), on="event_type")
    med = ranked.filter(F.col("rn") == F.expr("(n + 1) div 2")).select(
        "event_type", F.col("value").alias("med")
    )
    lo = ranked.filter(
        F.col("rn") == F.greatest(F.lit(1), F.ceil(0.05 * F.col("n")).cast("bigint"))
    ).select("event_type", F.col("value").alias("p05"))
    hi = ranked.filter(F.col("rn") == F.ceil(0.95 * F.col("n")).cast("bigint")).select(
        "event_type", F.col("value").alias("p95")
    )
    dev = (
        events.join(F.broadcast(med), on="event_type")
        .withColumn("d", F.abs(F.col("value") - F.col("med")))
        .select("event_type", "event_id", "d")
    )
    dev_ranked = _rank_in_group(dev, "event_type", "d", "event_id").join(
        F.broadcast(n_tbl), on="event_type"
    )
    mad = dev_ranked.filter(F.col("rn") == F.expr("(n + 1) div 2")).select(
        "event_type", F.col("d").alias("mad")
    )
    cuts = med.join(mad, on="event_type").join(lo, on="event_type").join(hi, on="event_type")
    return (
        events.join(F.broadcast(cuts), on="event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.first("med"), 4).alias("med"),
            F.round(F.first("mad"), 4).alias("mad"),
            F.round(
                F.avg(F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95"))), 3
            ).alias("win_mean"),
        )
    )


# --------------------------------------------------------------------------
# Equi-height histogram (optimizer-style column statistics)
# --------------------------------------------------------------------------

_EQH_BUCKETS = 10


@query(
    "q_equiheight_histogram",
    oracle=f"""
    WITH r AS (
        SELECT value,
               row_number() OVER (ORDER BY value, event_id) AS rn,
               count(*) OVER () AS n
        FROM events
    )
    SELECT ((rn - 1) * {_EQH_BUCKETS}) // n AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           round(min(value), 4) AS lo,
           round(max(value), 4) AS hi
    FROM r GROUP BY bucket
    """,
    tags=("agg", "histogram", "stats", "equi-height"),
)
def q_equiheight_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-height histogram of events.value (10 buckets of
    equal row count with their [lo, hi] bounds) — the column statistic
    cost-based optimizers and skew detectors build. Bucket membership
    is exact integer arithmetic on the global rank, so both engines
    produce identical boundaries (no ntile() semantics dependence).

    Scale shape: the oracle's global row_number() is the textbook
    single-partition killer; the builder instead stripes by coarse
    value range and ranks within stripes against broadcast cumulative
    offsets (:func:`_rank_in_group` with one global group) — the exact
    equivalent plan whose widest task sees ~1/10 of the
    data. Same two-pass shape a production ANALYZE uses before falling
    back to sampled quantiles."""
    events = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "value")
        .withColumn("g", F.lit(1))
    )
    ranked = _rank_in_group(events, "g", "value", "event_id")
    n_total = events.groupBy("g").agg(F.count("*").alias("n"))
    return (
        ranked.join(F.broadcast(n_total), on="g")
        .withColumn("bucket", F.expr(f"((rn - 1) * {_EQH_BUCKETS}) div n"))
        .groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.round(F.min("value"), 4).alias("lo"),
            F.round(F.max("value"), 4).alias("hi"),
        )
    )


# --------------------------------------------------------------------------
# Time-series resample with linear gap interpolation
# --------------------------------------------------------------------------


@query(
    "q_ts_resample_linear",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour,
               avg(value) AS v
        FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    spans AS (
        SELECT event_type, min(hour) AS mn, max(hour) AS mx
        FROM hourly GROUP BY event_type
    ),
    grid AS (
        SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hour
        FROM spans
    ),
    joined AS (
        SELECT g.event_type, g.hour, h.v FROM grid g
        LEFT JOIN hourly h ON h.event_type = g.event_type AND h.hour = g.hour
    ),
    walls AS (
        SELECT event_type, hour, v,
               last_value(v IGNORE NULLS) OVER w_prev AS pv,
               last_value(CASE WHEN v IS NOT NULL THEN hour END IGNORE NULLS)
                   OVER w_prev AS ph,
               first_value(v IGNORE NULLS) OVER w_next AS nv,
               first_value(CASE WHEN v IS NOT NULL THEN hour END IGNORE NULLS)
                   OVER w_next AS nh
        FROM joined
        WINDOW
            w_prev AS (PARTITION BY event_type ORDER BY hour
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
            w_next AS (PARTITION BY event_type ORDER BY hour
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    ),
    blended AS (
        SELECT event_type, hour, v,
               CASE WHEN v IS NOT NULL THEN v
                    ELSE pv + (nv - pv)
                         * (date_diff('hour', ph, hour)::DOUBLE
                            / date_diff('hour', ph, nh))
               END AS b
        FROM walls
    )
    SELECT event_type, hour,
           -- arithmetic half-up rounding: engine round() differs on the
           -- exact 4-dp midpoints linear blends systematically produce
           -- (Spark HALF_UP vs DuckDB nearbyint); floor(x*1e4 + 0.5)
           -- is the same IEEE ops in both engines. Guarded to |b| <
           -- 1e12: beyond that a 4-dp round is below double ulp (a
           -- no-op in value terms), and Spark's floor-to-LONG would
           -- saturate at b*1e4 > 2^63 where DuckDB's double floor
           -- doesn't — the guard keeps both engines on identical ops.
           CASE WHEN abs(b) < 1e12
                THEN floor(b * 10000 + 0.5) / 10000
                ELSE b END AS value,
           v IS NULL AS interpolated
    FROM blended
    """,
    tags=("timeseries", "resample", "interpolate", "window"),
)
def q_ts_resample_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample of each event type's value series with LINEAR
    interpolation of empty hours — the gap-fill contract a downstream
    model-training or monitoring pipeline wants when zero-fill
    (q_dense_grid_zerofill) would fabricate cliffs. Each missing hour
    takes pv + (nv-pv)·Δ/span between its nearest real neighbors;
    edge hours are always real (the grid spans each type's own
    min..max).

    Scale shape: the hourly aggregate is one shuffle; the dense grid
    comes from a sequence() explode of a per-type [min,max] span (a
    5-row dimension — never a fact-sized join); the neighbor walls are
    two running-state window passes over GRID rows (~dimension-sized,
    not event-sized) on the same per-type partitioning. The raw event
    table is touched exactly once. The NEXT wall deliberately avoids a
    [currentRow, unboundedFollowing) frame: Spark evaluates that frame
    shape by re-aggregating the remaining rows for EVERY output row —
    O(rows²) per partition, which a long-span grid (decades × hourly =
    10⁶ rows/type) turns into hours of CPU. A descending-order running
    frame computes the identical value with O(rows) running state; the
    re-sort stays inside the existing per-type partitioning (no extra
    shuffle, plan-gated in tests/test_plans.py)."""
    ev = load_table(spark, sf_dir, "events")
    # NOTE: the hourly mean stays a full-precision double until the one
    # result-edge round. Pre-rounding it (e.g. to 6 dp) would make the
    # linear blend land systematically on exact 4-dp midpoints, where
    # Spark (HALF_UP on the binary expansion) and DuckDB disagree.
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.avg("value").alias("v"))
    spans = hourly.groupBy("event_type").agg(
        F.min("hour").alias("mn"), F.max("hour").alias("mx")
    )
    grid = spans.select(
        "event_type",
        F.explode(F.sequence("mn", "mx", F.expr("interval 1 hour"))).alias("hour"),
    )
    joined = grid.join(hourly, on=["event_type", "hour"], how="left")
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # first(x ignorenulls) over [currentRow, unboundedFollowing] ==
    # last(x ignorenulls) over a DESC-ordered running frame: same rows,
    # same closest-non-null-at-or-after semantics, O(n) instead of
    # Spark's O(n²) UnboundedFollowingWindowFunctionFrame.
    w_next = (
        Window.partitionBy("event_type")
        .orderBy(F.col("hour").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    real_hour = F.when(F.col("v").isNotNull(), F.col("hour"))
    walls = joined.select(
        "event_type",
        "hour",
        "v",
        F.last("v", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(real_hour, ignorenulls=True).over(w_prev).alias("ph"),
        F.last("v", ignorenulls=True).over(w_next).alias("nv"),
        F.last(real_hour, ignorenulls=True).over(w_next).alias("nh"),
    )
    frac = F.expr("timestampdiff(HOUR, ph, hour)").cast("double") / F.expr(
        "timestampdiff(HOUR, ph, nh)"
    )
    blended = F.when(F.col("v").isNotNull(), F.col("v")).otherwise(
        F.col("pv") + (F.col("nv") - F.col("pv")) * frac
    )
    # Arithmetic half-up (floor(x*1e4 + 0.5)/1e4): linear blends of
    # 2-dp fixture values systematically land on exact 4-dp midpoints,
    # where Spark's HALF_UP (decimal-string) and DuckDB's nearbyint
    # (binary) disagree; this form is identical IEEE ops in both.
    # Guarded to |b| < 1e12: beyond that a 4-dp round is below double
    # ulp anyway, and Spark's floor (double -> LONG) would saturate at
    # b*1e4 > 2^63 where DuckDB's floor stays a double — the guard
    # keeps both engines on identical IEEE ops at every magnitude.
    rounded = F.when(
        F.abs(blended) < 1e12, F.floor(blended * 10000 + 0.5) / 10000
    ).otherwise(blended)
    return walls.select(
        "event_type",
        "hour",
        rounded.alias("value"),
        F.col("v").isNull().alias("interpolated"),
    )


# --------------------------------------------------------------------------
# As-of join with a match tolerance (merge_asof semantics)
# --------------------------------------------------------------------------

_ASOF_TOL_HOURS = 6


@query(
    "q_asof_join_tolerance",
    oracle=f"""
    WITH probe AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ), ref AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), u AS (
      SELECT event_id, user_id, ts, 0 AS is_ref, CAST(NULL AS BIGINT) AS rid
      FROM probe
      UNION ALL
      SELECT event_id, user_id, ts, 1 AS is_ref, event_id AS rid FROM ref
    ), c AS (
      SELECT event_id, user_id, ts, is_ref,
             last_value(rid IGNORE NULLS) OVER w AS asof_event_id,
             last_value(CASE WHEN is_ref = 1 THEN ts END IGNORE NULLS)
               OVER w AS asof_ts
      FROM u
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY ts ASC, is_ref DESC, rid ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id, epoch_us(ts) AS ts_us,
           CASE WHEN asof_ts >= ts - INTERVAL {_ASOF_TOL_HOURS} HOUR
                THEN asof_event_id END AS asof_event_id,
           CASE WHEN asof_ts >= ts - INTERVAL {_ASOF_TOL_HOURS} HOUR
                THEN epoch_us(asof_ts) END AS asof_ts_us
    FROM c WHERE is_ref = 0
    """,
    tags=("join", "asof", "tolerance", "window"),
)
def q_asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness tolerance (pandas merge_asof
    semantics): each click takes the user's latest purchase at-or-
    before it ONLY if that purchase is within 6 hours —
    older state is expired to NULL rather than silently joined, the
    contract feature-store point-in-time lookups need.

    Scale shape: identical to q_asof_join (union + one running-state
    window per key — no O(n·m) range intermediate); the tolerance is a
    post-window codegen conditional, zero extra cost."""
    from ripple_server_spark.operators.joins import asof_join

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    probe = ev.filter(F.col("event_type") == "click").drop("event_type")
    ref = ev.filter(F.col("event_type") == "purchase").drop("event_type")
    out = asof_join(probe, ref, key="user_id", time_col="ts", ref_id_col="event_id")
    fresh = F.col("asof_ts") >= F.col("ts") - F.expr(
        f"interval {_ASOF_TOL_HOURS} hours"
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.when(fresh, F.col("asof_event_id")).alias("asof_event_id"),
        F.when(fresh, F.unix_micros("asof_ts")).alias("asof_ts_us"),
    )


# --------------------------------------------------------------------------
# Seasonality profile (hour-of-day decomposition)
# --------------------------------------------------------------------------


@query(
    "q_seasonality_profile",
    oracle="""
    WITH base AS (
        SELECT event_type, extract(hour FROM ts) AS hod, value FROM events
    ),
    typ AS (SELECT event_type, avg(value) AS mu FROM base GROUP BY event_type)
    SELECT b.event_type, CAST(b.hod AS BIGINT) AS hour_of_day,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(b.value), 3) AS hod_mean,
           round(avg(b.value) - t.mu, 3) AS seasonal_component
    FROM base b JOIN typ t USING (event_type)
    GROUP BY b.event_type, b.hod, t.mu
    """,
    tags=("timeseries", "seasonality", "agg"),
)
def q_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonality decomposition per event type: the mean
    value in each of the 24 hour slots and its deviation from the
    type's overall mean (the additive seasonal component) — the
    profile an anomaly detector subtracts before thresholding, and the
    capacity-planning view of the event stream's daily rhythm.

    Scale shape: two partial aggregates (type x 24 slots, then type)
    joined on the 5-row type table — broadcast, one event-table pass
    shared by both aggregates under Spark's scan reuse; no windows."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select("event_type", F.hour("ts").alias("hod"), "value")
    typ = base.groupBy("event_type").agg(F.avg("value").alias("mu"))
    return (
        base.groupBy("event_type", "hod")
        .agg(F.count("*").alias("n"), F.avg("value").alias("m"))
        .join(F.broadcast(typ), "event_type")
        .select(
            "event_type",
            F.col("hod").cast("bigint").alias("hour_of_day"),
            "n",
            F.round("m", 3).alias("hod_mean"),
            F.round(F.col("m") - F.col("mu"), 3).alias("seasonal_component"),
        )
    )


# --------------------------------------------------------------------------
# Journey path analysis (top event-type trigram paths)
# --------------------------------------------------------------------------

_PATH_TOPK = 15


@query(
    "q_journey_paths",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type, 1) OVER w AS t2,
               lead(event_type, 2) OVER w AS t3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    paths AS (
        SELECT event_type AS t1, t2, t3, count(*) AS n
        FROM seq WHERE t3 IS NOT NULL
        GROUP BY t1, t2, t3
    )
    SELECT t1, t2, t3, CAST(n AS BIGINT) AS n,
           round(n::DOUBLE / sum(n) OVER (), 6) AS share
    FROM paths
    QUALIFY row_number() OVER (ORDER BY n DESC, t1, t2, t3) <= {_PATH_TOPK}
    """,
    tags=("analytics", "paths", "journey", "window"),
)
def q_journey_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top event-type trigram paths across all user journeys (the
    what-do-users-actually-do query behind funnel design): consecutive
    3-step sequences per user, counted corpus-wide, with each path's
    share of all trigrams. The path-mining companion to the Markov
    transition matrix (q_event_transitions) and PageRank.

    Scale shape: two lead() columns on the one per-user ordered window
    every journey query shares (single user_id shuffle), then a
    125-cell aggregate; the top-k is TakeOrderedAndProject over that
    dimension-sized table, and the share denominator is a scalar
    window over the same 125 rows."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).filter(F.col("t3").isNotNull())
    paths = seq.groupBy("t1", "t2", "t3").agg(F.count("*").alias("n"))
    total = Window.partitionBy()
    return (
        paths.withColumn("share", F.round(F.col("n") / F.sum("n").over(total), 6))
        .orderBy(F.desc("n"), "t1", "t2", "t3")
        .limit(_PATH_TOPK)
        .select("t1", "t2", "t3", F.col("n").cast("bigint").alias("n"), "share")
    )


# --------------------------------------------------------------------------
# Market-basket co-occurrence (association lift over order baskets)
# --------------------------------------------------------------------------

_BASKET_TOPK = 20
_BASKET_MIN_SUPPORT = 3


@query(
    "q_market_basket_lift",
    oracle=f"""
    WITH basket AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n_orders AS (SELECT count(DISTINCT l_orderkey)::DOUBLE AS n FROM basket),
    item AS (SELECT l_partkey, count(*) AS c FROM basket GROUP BY l_partkey),
    pair AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS c_ab
        FROM basket a JOIN basket b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY part_a, part_b
    )
    SELECT p.part_a, p.part_b, CAST(p.c_ab AS BIGINT) AS n_together,
           round(p.c_ab * n_orders.n / (ia.c * ib.c), 4) AS lift
    FROM pair p
    JOIN item ia ON ia.l_partkey = p.part_a
    JOIN item ib ON ib.l_partkey = p.part_b
    CROSS JOIN n_orders
    WHERE p.c_ab >= {_BASKET_MIN_SUPPORT}
    QUALIFY row_number() OVER (
        ORDER BY p.c_ab * n_orders.n / (ia.c * ib.c) DESC, p.part_a, p.part_b
    ) <= {_BASKET_TOPK}
    """,
    tags=("analytics", "basket", "association", "join"),
)
def q_market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining: part pairs that co-occur in
    the same order far more often than chance — lift =
    P(a,b)/(P(a)·P(b)) with a support floor, top-k by lift. The
    association-rule capability (recommendations, bundle detection)
    over the TPC-H fact table.

    Scale shape: the pair join is a self-join on the basket KEY
    (l_orderkey), so fan-out is Σ lines_per_order² — bounded by the
    ~7-line basket size, never corpus²; item/pair tables are
    catalog-sized; the final cut is TakeOrderedAndProject. This is the
    same bounded-key-fan-out discipline as the shingle inverted
    index."""
    li = load_table(spark, sf_dir, "lineitem")
    basket = li.select("l_orderkey", "l_partkey").distinct()
    n_orders = basket.agg(
        F.countDistinct("l_orderkey").cast("double").alias("n")
    )
    item = basket.groupBy("l_partkey").agg(F.count("*").alias("c"))
    a, b = basket.alias("a"), basket.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"), F.col("b.l_partkey").alias("part_b")
        )
        .agg(F.count("*").alias("c_ab"))
        .filter(F.col("c_ab") >= _BASKET_MIN_SUPPORT)
    )
    ia = item.select(F.col("l_partkey").alias("part_a"), F.col("c").alias("c_a"))
    ib = item.select(F.col("l_partkey").alias("part_b"), F.col("c").alias("c_b"))
    lift = F.col("c_ab") * F.col("n") / (F.col("c_a") * F.col("c_b"))
    return (
        pair.join(ia, "part_a")
        .join(ib, "part_b")
        .crossJoin(F.broadcast(n_orders))
        .orderBy(F.desc(lift), "part_a", "part_b")
        .limit(_BASKET_TOPK)
        .select(
            "part_a",
            "part_b",
            F.col("c_ab").cast("bigint").alias("n_together"),
            F.round(lift, 4).alias("lift"),
        )
    )


# --------------------------------------------------------------------------
# Population-stability-index drift monitor
# --------------------------------------------------------------------------

_PSI_BINS = 10
# Shared midpoint of the fixture window for the distribution-shift
# testing quartet (PSI / Welch t / Mann-Whitney / KS): all four are
# documented as comparing the SAME first-vs-second-half split, so the
# date lives in one constant.
_HALF_SPLIT = "2024-01-16"
_PSI_SPLIT = _HALF_SPLIT


@query(
    "q_psi_drift",
    oracle=f"""
    WITH binned AS (
        SELECT event_type,
               CASE WHEN ts < TIMESTAMP '{_PSI_SPLIT}' THEN 0 ELSE 1 END AS half,
               least(CAST(floor(value / 50.0) AS BIGINT), {_PSI_BINS} - 1) AS bin
        FROM events
    ),
    cells AS (
        SELECT event_type, half, bin, count(*) AS c
        FROM binned GROUP BY event_type, half, bin
    ),
    tot AS (
        SELECT event_type, half, sum(c)::DOUBLE AS n
        FROM cells GROUP BY event_type, half
    ),
    props AS (
        SELECT c.event_type, c.bin,
               max(CASE WHEN c.half = 0 THEN c.c / t.n END) AS p0,
               max(CASE WHEN c.half = 1 THEN c.c / t.n END) AS p1
        FROM cells c JOIN tot t ON t.event_type = c.event_type AND t.half = c.half
        GROUP BY c.event_type, c.bin
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_bins,
           round(sum((coalesce(p1, 0.0001) - coalesce(p0, 0.0001))
                     * ln(coalesce(p1, 0.0001) / coalesce(p0, 0.0001))), 4)
               AS psi
    FROM props GROUP BY event_type
    """,
    tags=("monitoring", "drift", "psi", "agg"),
)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index of each event type's value
    distribution between the first and second half of the window
    (split at {_PSI_SPLIT}): PSI = Σ (p1-p0)·ln(p1/p0) over 10
    equal-width value bins, the standard model-monitoring drift score
    (rule of thumb: >0.1 investigate, >0.25 act). Empty bins take the
    conventional 1e-4 floor so the score stays finite.

    Scale shape: one conditional-aggregation pass builds the
    (type x half x bin) cell table — dimension-sized from the first
    shuffle on; everything after is arithmetic over ≤ type·20 rows."""
    ev = load_table(spark, sf_dir, "events")
    binned = ev.select(
        "event_type",
        F.when(F.col("ts") < F.lit(_PSI_SPLIT).cast("timestamp"), 0).otherwise(1).alias("half"),
        F.least(
            F.floor(F.col("value") / 50.0).cast("bigint"), F.lit(_PSI_BINS - 1)
        ).alias("bin"),
    )
    cells = binned.groupBy("event_type", "half", "bin").agg(F.count("*").alias("c"))
    tot = cells.groupBy("event_type", "half").agg(F.sum("c").cast("double").alias("n"))
    props = (
        cells.join(tot, on=["event_type", "half"])
        .groupBy("event_type", "bin")
        .agg(
            F.max(F.when(F.col("half") == 0, F.col("c") / F.col("n"))).alias("p0"),
            F.max(F.when(F.col("half") == 1, F.col("c") / F.col("n"))).alias("p1"),
        )
    )
    p0 = F.coalesce(F.col("p0"), F.lit(0.0001))
    p1 = F.coalesce(F.col("p1"), F.lit(0.0001))
    return props.groupBy("event_type").agg(
        F.count("*").alias("n_bins"),
        F.round(F.sum((p1 - p0) * F.log(p1 / p0)), 4).alias("psi"),
    )


# --------------------------------------------------------------------------
# Cross-series correlation matrix
# --------------------------------------------------------------------------


@query(
    "q_type_correlation",
    oracle="""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS hour, event_type, avg(value) AS v
        FROM events GROUP BY hour, event_type
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(count(*) AS BIGINT) AS n_hours,
           round(corr(a.v, b.v), 3) AS r
    FROM hourly a JOIN hourly b
      ON a.hour = b.hour AND a.event_type < b.event_type
    GROUP BY type_a, type_b
    """,
    tags=("timeseries", "correlation", "stats", "join"),
)
def q_type_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation of the event types' hourly mean
    value series — the cross-series dependence matrix behind capacity
    planning and leading-indicator hunting (does error volume track
    purchase value?). Joins the hourly series on the hour key for each
    unordered type pair.

    Scale shape: the hourly aggregate is one event-table shuffle; the
    correlation self-join runs on the ~720-row-per-type HOURLY series
    (dimension-sized), never on raw events, and corr() is a single-pass
    partial-aggregatable moment computation in both engines."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"),
        "event_type",
    ).agg(F.avg("value").alias("v"))
    a, b = hourly.alias("a"), hourly.alias("b")
    return (
        a.join(
            b,
            (F.col("a.hour") == F.col("b.hour"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(
            F.count("*").alias("n_hours"),
            F.round(F.corr(F.col("a.v"), F.col("b.v")), 3).alias("r"),
        )
    )


# --------------------------------------------------------------------------
# Two-sample Welch t-test (experiment analysis)
# --------------------------------------------------------------------------

_TT_SPLIT = _HALF_SPLIT


@query(
    "q_welch_ttest",
    oracle=f"""
    WITH s AS (
        SELECT event_type,
               CASE WHEN ts < TIMESTAMP '{_TT_SPLIT}' THEN 0 ELSE 1 END AS grp,
               value
        FROM events
    ),
    m AS (
        SELECT event_type, grp, count(*) AS n, avg(value) AS mu,
               var_samp(value) AS s2
        FROM s GROUP BY event_type, grp
    ),
    w AS (
        SELECT a.event_type,
               a.n AS n0, b.n AS n1,
               a.mu - b.mu AS delta,
               a.s2 / a.n + b.s2 / b.n AS se2
        FROM m a JOIN m b ON a.event_type = b.event_type
        WHERE a.grp = 0 AND b.grp = 1
    )
    SELECT event_type, CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
           round(delta, 3) AS mean_diff,
           round(delta / sqrt(se2), 3) AS t_stat
    FROM w
    """,
    tags=("stats", "ttest", "experiment", "agg"),
)
def q_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch two-sample t statistic per event type between the first
    and second half of the window (split {_TT_SPLIT}) — the
    experiment-analysis primitive (A/B readout, release regression
    check): t = (mu0-mu1)/sqrt(s0²/n0 + s1²/n1), robust to unequal
    variances and sample sizes.

    Scale shape: one conditional-aggregation pass computes count/mean/
    variance per (type, half) — var_samp is a partial-aggregatable
    moment in both engines — then pure arithmetic on the 10-row moment
    table. No second data pass, no window."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.select(
        "event_type",
        F.when(F.col("ts") < F.lit(_TT_SPLIT).cast("timestamp"), 0).otherwise(1).alias("grp"),
        "value",
    )
    m = s.groupBy("event_type", "grp").agg(
        F.count("*").alias("n"), F.avg("value").alias("mu"), F.var_samp("value").alias("s2")
    )
    a = m.filter(F.col("grp") == 0).select(
        "event_type", F.col("n").alias("n0"), F.col("mu").alias("mu0"), F.col("s2").alias("s20")
    )
    b = m.filter(F.col("grp") == 1).select(
        "event_type", F.col("n").alias("n1"), F.col("mu").alias("mu1"), F.col("s2").alias("s21")
    )
    delta = F.col("mu0") - F.col("mu1")
    se2 = F.col("s20") / F.col("n0") + F.col("s21") / F.col("n1")
    return (
        a.join(b, "event_type")
        .select(
            "event_type",
            F.col("n0").cast("bigint").alias("n0"),
            F.col("n1").cast("bigint").alias("n1"),
            F.round(delta, 3).alias("mean_diff"),
            F.round(delta / F.sqrt(se2), 3).alias("t_stat"),
        )
    )


# --------------------------------------------------------------------------
# Benford first-digit audit
# --------------------------------------------------------------------------


@query(
    "q_benford_audit",
    oracle="""
    WITH d AS (
        SELECT CAST(substr(CAST(CAST(floor(value) AS BIGINT) AS VARCHAR), 1, 1)
                    AS BIGINT) AS digit
        FROM events WHERE value >= 1
    ),
    counts AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
    tot AS (SELECT sum(n)::DOUBLE AS t FROM counts)
    SELECT digit, CAST(n AS BIGINT) AS n,
           round(n / tot.t, 4) AS observed,
           round(ln(1.0 + 1.0 / digit) / ln(10.0), 4) AS benford_expected,
           round(n / tot.t - ln(1.0 + 1.0 / digit) / ln(10.0), 4) AS deviation
    FROM counts CROSS JOIN tot
    """,
    tags=("stats", "audit", "benford", "agg"),
)
def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of the value column: observed
    leading-digit frequencies against log10(1 + 1/d) — the classic
    fabricated-data / instrumentation-bug detector for metrics
    pipelines. (The fixture's uniform values deliberately FAIL Benford
    — deviation quantifies how un-Benford a distribution is; organic
    multiplicative metrics converge to it.)

    Scale shape: leading digit is a codegen string projection; one
    9-row aggregate; the total is a 1-row broadcast."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.filter(F.col("value") >= 1).select(
        F.substring(F.floor("value").cast("bigint").cast("string"), 1, 1)
        .cast("bigint")
        .alias("digit")
    )
    counts = d.groupBy("digit").agg(F.count("*").alias("n"))
    tot = counts.agg(F.sum("n").cast("double").alias("t"))
    expected = F.log(1.0 + 1.0 / F.col("digit")) / F.log(F.lit(10.0))
    return counts.crossJoin(F.broadcast(tot)).select(
        "digit",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("n") / F.col("t"), 4).alias("observed"),
        F.round(expected, 4).alias("benford_expected"),
        F.round(F.col("n") / F.col("t") - expected, 4).alias("deviation"),
    )


# --------------------------------------------------------------------------
# Chi-square test of independence
# --------------------------------------------------------------------------


@query(
    "q_chi2_independence",
    oracle="""
    WITH obs AS (
        SELECT event_type, CAST(extract(dow FROM ts) AS BIGINT) AS dow,
               count(*) AS o
        FROM events GROUP BY event_type, dow
    ),
    rt AS (SELECT event_type, sum(o)::DOUBLE AS r FROM obs GROUP BY event_type),
    ct AS (SELECT dow, sum(o)::DOUBLE AS c FROM obs GROUP BY dow),
    n AS (SELECT sum(o)::DOUBLE AS t FROM obs)
    SELECT CAST(count(*) AS BIGINT) AS n_cells,
           CAST((SELECT count(*) FROM rt) - 1 AS BIGINT)
               * CAST((SELECT count(*) FROM ct) - 1 AS BIGINT) AS dof,
           round(sum(pow(obs.o - rt.r * ct.c / n.t, 2)
                     / (rt.r * ct.c / n.t)), 3) AS chi2
    FROM obs JOIN rt USING (event_type) JOIN ct USING (dow) CROSS JOIN n
    """,
    tags=("stats", "chi2", "independence", "agg"),
)
def q_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between event type and
    day-of-week — does traffic mix shift across the week? One
    contingency-table aggregate, then Σ(O-E)²/E over the
    |types|x7 cells with margins as broadcast-sized tables. The
    categorical companion to the Welch t readout.

    Scale shape: a single conditional-aggregation pass builds the
    contingency table; margins and the total are sub-aggregates of the
    ~35-row cell table. No second data pass."""
    ev = load_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type", F.dayofweek("ts").alias("dowk")
    ).agg(F.count("*").alias("o"))
    # align DuckDB dow (0=Sunday) with Spark dayofweek (1=Sunday)
    obs = obs.withColumn("dow", (F.col("dowk") - 1).cast("bigint")).drop("dowk")
    rt = obs.groupBy("event_type").agg(F.sum("o").cast("double").alias("r"))
    ct = obs.groupBy("dow").agg(F.sum("o").cast("double").alias("c"))
    n = obs.agg(F.sum("o").cast("double").alias("t"))
    e = F.col("r") * F.col("c") / F.col("t")
    # dof comes from distinct-margin counts of the SAME joined cell
    # table — fully lazy, no eager .count() actions at plan-build time
    # (the previous form launched two whole extra jobs per invocation)
    return (
        obs.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "dow")
        .crossJoin(F.broadcast(n))
        .agg(
            F.count("*").alias("n_cells"),
            (
                (F.countDistinct("event_type") - 1)
                * (F.countDistinct("dow") - 1)
            ).cast("bigint").alias("dof"),
            F.round(F.sum(F.pow(F.col("o") - e, 2) / e), 3).alias("chi2"),
        )
    )


# --------------------------------------------------------------------------
# Gini concentration of per-user value
# --------------------------------------------------------------------------


@query(
    "q_gini_concentration",
    oracle="""
    WITH u AS (
        SELECT user_id, sum(value) AS tot FROM events GROUP BY user_id
    ),
    r AS (
        SELECT tot, row_number() OVER (ORDER BY tot, user_id) AS i,
               count(*) OVER () AS n, sum(tot) OVER () AS s
        FROM u
    )
    SELECT CAST(any_value(n) AS BIGINT) AS n_users,
           round(any_value(s), 2) AS total_value,
           round(2.0 * sum(i * tot) / (any_value(n) * any_value(s))
                 - (any_value(n) + 1.0) / any_value(n), 4) AS gini
    FROM r
    """,
    tags=("stats", "gini", "concentration", "window"),
)
def q_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user total value — how concentrated the
    stream's value is in its heaviest users (whale detection, abuse
    monitoring, the capacity-planning question 'does 1% of keys carry
    half the load?'). G = 2·Σ(i·x_i)/(n·Σx) - (n+1)/n over users
    sorted ascending.

    Scale shape: the rank runs over the USER-LEVEL aggregate (one
    shuffle of key-level rows, corpus-row count never enters any
    window), and the rank itself is the striped two-pass
    :func:`_rank_in_group` (single constant group) — no window in the
    plan sees more than one value-stripe of keys, so a billion-key
    table never funnels through one task."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(F.sum("value").alias("tot"))
    r = _rank_in_group(u.withColumn("_g", F.lit(0)), "_g", "tot", "user_id").select(
        "tot", F.col("rn").alias("i")
    )
    agg = u.agg(
        F.count("*").alias("n"), F.sum("tot").alias("s")
    )
    return (
        r.crossJoin(F.broadcast(agg))
        .agg(
            F.first("n").cast("bigint").alias("n_users"),
            F.round(F.first("s"), 2).alias("total_value"),
            F.round(
                2.0 * F.sum(F.col("i") * F.col("tot")) / (F.first("n") * F.first("s"))
                - (F.first("n") + 1.0) / F.first("n"),
                4,
            ).alias("gini"),
        )
    )


# --------------------------------------------------------------------------
# Autocorrelation of hourly counts (ACF diagnostics)
# --------------------------------------------------------------------------


@query(
    "q_hourly_autocorrelation",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS c
        FROM events GROUP BY event_type, hour
    ),
    lagged AS (
        SELECT event_type, c,
               lag(c, 1) OVER w AS c1,
               lag(c, 24) OVER w AS c24
        FROM hourly
        WINDOW w AS (PARTITION BY event_type ORDER BY hour)
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_hours,
           round(corr(c, c1), 3) AS acf_lag1,
           round(corr(c, c24), 3) AS acf_lag24
    FROM lagged GROUP BY event_type
    """,
    tags=("timeseries", "autocorrelation", "acf", "window"),
)
def q_hourly_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 and lag-24 autocorrelation of each type's hourly event
    counts — the ACF diagnostics behind forecasting and anomaly
    baselines (is load sticky hour-over-hour? is there a daily
    cycle?). Complements the seasonality profile with the
    dependence-structure view.

    Scale shape: the hourly aggregate is the only event-table pass;
    lag() and corr() run on the dimension-sized per-type series
    (partitioned window, partial-aggregatable moments)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count("*").alias("c"))
    w = Window.partitionBy("event_type").orderBy("hour")
    lagged = hourly.select(
        "event_type",
        "c",
        F.lag("c", 1).over(w).alias("c1"),
        F.lag("c", 24).over(w).alias("c24"),
    )
    # corr() decomposed into covar_samp / (sd_x * sd_y) over the
    # pairwise-complete rows (the when() restricts c's moments to rows
    # where the lagged value exists, matching corr's pair semantics):
    # Spark's corr under ANSI throws DIVIDE_BY_ZERO on a zero-variance
    # series (e.g. a type with a constant hourly count), where DuckDB's
    # corr yields NULL — try_divide restores the NULL contract and is
    # bit-identical wherever the variance is nonzero.
    def acf(lag_col: str):
        paired_c = F.when(F.col(lag_col).isNotNull(), F.col("c"))
        return F.try_divide(
            F.covar_samp("c", lag_col),
            F.stddev_samp(paired_c) * F.stddev_samp(lag_col),
        )

    return lagged.groupBy("event_type").agg(
        F.count("*").alias("n_hours"),
        F.round(acf("c1"), 3).alias("acf_lag1"),
        F.round(acf("c24"), 3).alias("acf_lag24"),
    )


# --------------------------------------------------------------------------
# Burst / anomaly detection over hourly counts
# --------------------------------------------------------------------------

_BURST_Z = 2.5


@query(
    "q_burst_detection",
    oracle=f"""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS c
        FROM events GROUP BY event_type, hour
    ),
    stats AS (
        SELECT event_type, avg(c) AS mu, stddev_samp(c) AS sd
        FROM hourly GROUP BY event_type
    )
    SELECT h.event_type, h.hour, CAST(h.c AS BIGINT) AS n_events,
           round((h.c - s.mu) / s.sd, 3) AS z
    FROM hourly h JOIN stats s USING (event_type)
    WHERE (h.c - s.mu) / s.sd >= {_BURST_Z}
    """,
    tags=("monitoring", "anomaly", "burst", "timeseries"),
)
def q_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst detection: hours where a type's event count exceeds its
    own mean by >= {_BURST_Z} sample standard deviations — the paging
    alert primitive over the topic stream, built purely from
    aggregates (no model state).

    Scale shape: hourly aggregate (one event pass), 5-row per-type
    moment table broadcast back onto the dimension-sized hourly
    series; the z filter is codegen. A streaming deployment computes
    the same moments incrementally (HourlyRollup) and applies the
    identical filter per micro-batch."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count("*").alias("c"))
    stats = hourly.groupBy("event_type").agg(
        F.avg("c").alias("mu"), F.stddev_samp("c").alias("sd")
    )
    # try_divide: a type whose hourly counts are all EQUAL has sd = 0.0
    # exactly (and a single-hour type has sd NULL) — DuckDB's division
    # yields NULL either way and the WHERE drops the row; a bare `/`
    # under ANSI throws on the sd = 0 case instead.
    z = F.try_divide(F.col("c") - F.col("mu"), F.col("sd"))
    return (
        hourly.join(F.broadcast(stats), "event_type")
        .filter(z >= _BURST_Z)
        .select(
            "event_type",
            "hour",
            F.col("c").cast("bigint").alias("n_events"),
            F.round(z, 3).alias("z"),
        )
    )


# --------------------------------------------------------------------------
# Mann-Whitney U (nonparametric two-sample test)
# --------------------------------------------------------------------------

_MW_SPLIT = _HALF_SPLIT


@query(
    "q_mann_whitney_u",
    oracle=f"""
    WITH s AS (
        SELECT event_type, value,
               CASE WHEN ts < TIMESTAMP '{_MW_SPLIT}' THEN 0 ELSE 1 END AS grp
        FROM events
    ),
    ranked AS (
        SELECT event_type, grp, value,
               rank() OVER (PARTITION BY event_type ORDER BY value) AS rk,
               count(*) OVER (PARTITION BY event_type, value) AS tc
        FROM s
    ),
    avg_ranked AS (
        SELECT event_type, grp, rk + (tc - 1) / 2.0 AS ar FROM ranked
    ),
    agg AS (
        SELECT event_type,
               sum(CASE WHEN grp = 0 THEN ar END) AS r0,
               sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END)::DOUBLE AS n0,
               sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END)::DOUBLE AS n1
        FROM avg_ranked GROUP BY event_type
    )
    SELECT event_type,
           CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
           round(r0 - n0 * (n0 + 1) / 2, 1) AS u_stat,
           round(((r0 - n0 * (n0 + 1) / 2) - n0 * n1 / 2)
                 / sqrt(n0 * n1 * (n0 + n1 + 1) / 12.0), 3) AS z_approx
    FROM agg
    """,
    tags=("stats", "nonparametric", "mann-whitney", "window"),
)
def q_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U between the window halves per event type — the
    nonparametric companion to the Welch t (valid under skew and
    outliers, exactly where the mean-based test lies). Tied values take
    exact AVERAGE ranks via rank() + (tie_count-1)/2, the textbook
    definition, so both engines agree bit-for-bit before rounding; the
    normal z approximation is reported without tie correction (ties
    are rare at double precision).

    Scale shape: one ranked pass per type (rank() and the per-value
    tie count share the same partitioning) plus a conditional
    aggregate. For billion-row groups the striped two-pass rank
    substitutes for rank() exactly as in q_robust_stats."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.select(
        "event_type",
        "value",
        F.when(F.col("ts") < F.lit(_MW_SPLIT).cast("timestamp"), 0).otherwise(1).alias("grp"),
    )
    wr = Window.partitionBy("event_type").orderBy("value")
    wt = Window.partitionBy("event_type", "value")
    ar = (F.rank().over(wr) + (F.count("*").over(wt) - 1) / 2.0).alias("ar")
    ranked = s.select("event_type", "grp", ar)
    agg = ranked.groupBy("event_type").agg(
        F.sum(F.when(F.col("grp") == 0, F.col("ar"))).alias("r0"),
        F.count(F.when(F.col("grp") == 0, 1)).cast("double").alias("n0"),
        F.count(F.when(F.col("grp") == 1, 1)).cast("double").alias("n1"),
    )
    u = F.col("r0") - F.col("n0") * (F.col("n0") + 1) / 2
    # try_divide: an event type whose events all fall in ONE half has
    # n0*n1 = 0, so the z denominator is sqrt(0) — DuckDB's double
    # division yields NULL there, while a bare `/` under ANSI throws
    # DIVIDE_BY_ZERO. Identical on any type with both halves populated.
    z = F.try_divide(
        u - F.col("n0") * F.col("n1") / 2,
        F.sqrt(F.col("n0") * F.col("n1") * (F.col("n0") + F.col("n1") + 1) / 12.0),
    )
    return agg.select(
        "event_type",
        F.col("n0").cast("bigint").alias("n0"),
        F.col("n1").cast("bigint").alias("n1"),
        F.round(u, 1).alias("u_stat"),
        F.round(z, 3).alias("z_approx"),
    )


# --------------------------------------------------------------------------
# Kolmogorov-Smirnov two-sample test
# --------------------------------------------------------------------------

_KS_SPLIT = _HALF_SPLIT


@query(
    "q_ks_test",
    oracle=f"""
    WITH s AS (
        SELECT event_type, value,
               CASE WHEN ts < TIMESTAMP '{_KS_SPLIT}' THEN 0 ELSE 1 END AS grp
        FROM events
    ),
    n AS (
        SELECT event_type,
               sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END)::DOUBLE AS n0,
               sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END)::DOUBLE AS n1
        FROM s GROUP BY event_type
    ),
    steps AS (
        SELECT event_type, value,
               sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS c0,
               sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS c1
        FROM s GROUP BY event_type, value
    ),
    ecdf AS (
        SELECT event_type,
               sum(c0) OVER w AS f0, sum(c1) OVER w AS f1
        FROM steps
        WINDOW w AS (PARTITION BY event_type ORDER BY value
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT e.event_type,
           CAST(n.n0 AS BIGINT) AS n0, CAST(n.n1 AS BIGINT) AS n1,
           round(max(abs(e.f0 / n.n0 - e.f1 / n.n1)), 4) AS ks_d
    FROM ecdf e JOIN n USING (event_type)
    GROUP BY e.event_type, n.n0, n.n1
    """,
    tags=("stats", "ks", "nonparametric", "window"),
)
def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov D per event type between the
    window halves: the maximum gap between the halves' empirical CDFs
    — the distribution-shape test that completes the testing trio
    (Welch t for means, Mann-Whitney for location, KS for the whole
    shape). ECDFs step at distinct VALUES with per-value group counts,
    so D is exact (not binned like PSI).

    Scale shape: the per-(type, value) step table collapses the data
    once; the cumulative window runs over distinct values (bounded by
    value cardinality, not rows) on the per-type partitioning; one
    final max aggregate."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.select(
        "event_type",
        "value",
        F.when(F.col("ts") < F.lit(_KS_SPLIT).cast("timestamp"), 0).otherwise(1).alias("grp"),
    )
    n = s.groupBy("event_type").agg(
        F.count(F.when(F.col("grp") == 0, 1)).cast("double").alias("n0"),
        F.count(F.when(F.col("grp") == 1, 1)).cast("double").alias("n1"),
    )
    steps = s.groupBy("event_type", "value").agg(
        F.count(F.when(F.col("grp") == 0, 1)).alias("c0"),
        F.count(F.when(F.col("grp") == 1, 1)).alias("c1"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ecdf = steps.select(
        "event_type",
        F.sum("c0").over(w).alias("f0"),
        F.sum("c1").over(w).alias("f1"),
    )
    # try_divide: a type with an empty half makes one ECDF denominator
    # zero — DuckDB's double division yields NULL (max ignores it, so
    # ks_d goes NULL when every step is NULL), while a bare `/` under
    # ANSI throws. Identical whenever both halves are populated.
    return (
        ecdf.join(F.broadcast(n), "event_type")
        .groupBy("event_type", "n0", "n1")
        .agg(
            F.round(
                F.max(
                    F.abs(
                        F.try_divide(F.col("f0"), F.col("n0"))
                        - F.try_divide(F.col("f1"), F.col("n1"))
                    )
                ),
                4,
            ).alias("ks_d")
        )
        .select(
            "event_type",
            F.col("n0").cast("bigint").alias("n0"),
            F.col("n1").cast("bigint").alias("n1"),
            "ks_d",
        )
    )


# --------------------------------------------------------------------------
# Lorenz curve deciles (concentration profile)
# --------------------------------------------------------------------------


@query(
    "q_lorenz_deciles",
    oracle="""
    WITH u AS (
        SELECT user_id, sum(value) AS tot FROM events GROUP BY user_id
    ),
    r AS (
        SELECT tot, row_number() OVER (ORDER BY tot, user_id) AS i,
               count(*) OVER () AS n, sum(tot) OVER () AS s
        FROM u
    ),
    cum AS (
        SELECT ((i - 1) * 10) // n AS decile, n, s,
               sum(tot) OVER (ORDER BY i
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS running
        FROM r
    )
    SELECT decile,
           CAST(count(*) AS BIGINT) AS n_users,
           round(max(running) / any_value(s), 4) AS cum_value_share
    FROM cum GROUP BY decile
    """,
    tags=("stats", "lorenz", "concentration", "window"),
)
def q_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve at deciles: users sorted ascending by total value,
    reporting each decile's CUMULATIVE share of all value — the curve
    whose area complement is q_gini_concentration, and the operational
    'bottom 50% of keys carry X% of load' readout skew planning needs.

    Scale shape: ranks and the running sum run over the USER-LEVEL
    aggregate (key-level rows), and BOTH are striped two-pass
    (:func:`_striped_running`): the rank is a cumulative count and the
    running value a cumulative sum, each = broadcast stripe offset +
    within-stripe window — no single-partition window over keys
    anywhere in the plan, so a billion-key table never funnels
    through one task."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(F.sum("value").alias("tot"))
    agg = u.agg(F.count("*").alias("n"), F.sum("tot").alias("s"))
    run = _striped_running(
        u.withColumn("_one", F.lit(1)), "tot", "user_id", sums=("tot", "_one")
    )
    cum = run.crossJoin(F.broadcast(agg)).select(
        F.expr("((cum__one - 1) * 10) div n").alias("decile"),
        "s",
        F.col("cum_tot").alias("running"),
    )
    return cum.groupBy("decile").agg(
        F.count("*").alias("n_users"),
        F.round(F.max("running") / F.first("s"), 4).alias("cum_value_share"),
    )


# --------------------------------------------------------------------------
# SLA latency report (order -> ship within N days)
# --------------------------------------------------------------------------

_SLA_DAYS = 30


@query(
    "q_order_sla",
    oracle=f"""
    WITH lat AS (
        SELECT o.o_orderpriority,
               date_diff('day', o.o_orderdate, l.l_shipdate) AS days
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(count(*) FILTER (days <= {_SLA_DAYS}) AS BIGINT) AS n_within,
           round(count(*) FILTER (days <= {_SLA_DAYS})::DOUBLE / count(*), 4)
               AS sla_rate,
           CAST(max(days) AS BIGINT) AS worst_days
    FROM lat GROUP BY o_orderpriority
    """,
    tags=("analytics", "sla", "latency", "join"),
)
def q_order_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLA attainment per order priority: the share of lineitems
    shipped within {_SLA_DAYS} days of their order date, plus the
    worst-case latency — the operations-reporting shape (latency
    buckets against a target) every pipeline dashboard carries.

    Scale shape: one fact-fact equi-join on the order key (the same
    shuffle q_fact_join exercises — bucketed at-rest layout removes it
    entirely, q_fact_join_bucketed) followed by a 5-row conditional
    aggregate. date_diff is codegen."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lat = orders.join(li, orders["o_orderkey"] == li["l_orderkey"]).select(
        "o_orderpriority",
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("days"),
    )
    within = F.count(F.when(F.col("days") <= _SLA_DAYS, 1))
    return lat.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_lines"),
        within.alias("n_within"),
        F.round(within.cast("double") / F.count("*"), 4).alias("sla_rate"),
        F.max("days").cast("bigint").alias("worst_days"),
    )


# --------------------------------------------------------------------------
# OLS trend slope per series
# --------------------------------------------------------------------------


@query(
    "q_trend_slope",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour, avg(value) AS v
        FROM events GROUP BY event_type, hour
    ),
    xy AS (
        SELECT event_type,
               date_diff('hour', TIMESTAMP '2024-01-01', hour)::DOUBLE AS x,
               v AS y
        FROM hourly
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_hours,
           round(covar_samp(x, y) / var_samp(x), 6) AS slope_per_hour,
           round(avg(y) - covar_samp(x, y) / var_samp(x) * avg(x), 3)
               AS intercept
    FROM xy GROUP BY event_type
    """,
    tags=("stats", "regression", "trend", "timeseries"),
)
def q_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS trend line of each type's hourly mean value over time —
    slope = cov(x,y)/var(x) with x in hours since the window origin;
    the is-this-metric-drifting readout that PSI quantifies
    distributionally and this quantifies directionally.

    Scale shape: covariance and variance are single-pass partial-
    aggregatable moments over the dimension-sized hourly series; no
    window, no second pass, no matrix solve (one regressor)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.avg("value").alias("y"))
    origin = F.lit("2024-01-01").cast("timestamp")
    xy = hourly.select(
        "event_type",
        (F.unix_timestamp("hour") - F.unix_timestamp(origin)).cast("double") / 3600.0,
        "y",
    ).toDF("event_type", "x", "y")
    slope = F.covar_samp("x", "y") / F.var_samp("x")
    return xy.groupBy("event_type").agg(
        F.count("*").alias("n_hours"),
        F.round(slope, 6).alias("slope_per_hour"),
        F.round(F.avg("y") - slope * F.avg("x"), 3).alias("intercept"),
    )


# --------------------------------------------------------------------------
# CUSUM change-point detection
# --------------------------------------------------------------------------


@query(
    "q_cusum_changepoint",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour,
               CAST(round(avg(value), 6) AS DECIMAL(19,6)) AS v6
        FROM events GROUP BY event_type, hour
    ),
    c AS (
        SELECT event_type, hour,
               CAST(count(*) OVER wt AS DECIMAL(7,0))
                 * CAST(sum(v6) OVER wc AS DECIMAL(25,6))
               - CAST(row_number() OVER wo AS DECIMAL(7,0))
                 * CAST(sum(v6) OVER wt AS DECIMAL(25,6)) AS score,
               CAST(count(*) OVER wt AS DOUBLE) AS n
        FROM hourly
        WINDOW wt AS (PARTITION BY event_type),
               wc AS (PARTITION BY event_type ORDER BY hour
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wo AS (PARTITION BY event_type ORDER BY hour)
    )
    SELECT event_type, hour AS changepoint_hour,
           CASE WHEN ac < 1e12 THEN floor(ac * 1000 + 0.5) / 1000
                ELSE ac END AS max_abs_cusum
    FROM (
        SELECT event_type, hour, abs(score)::DOUBLE / n AS ac,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY abs(score) DESC, hour) AS rn
        FROM c
    ) WHERE rn = 1
    """,
    tags=("timeseries", "changepoint", "cusum", "window", "decimal"),
)
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point estimate per event type: the hour where the
    cumulative deviation from the series mean peaks in magnitude — the
    classic single-change-point locator (a level shift at time T makes
    |CUSUM| maximal at T). Complements burst detection (point
    anomalies) with regime-shift detection.

    Scale shape: mean + running-state cumulative window + rank-1 cut,
    all over the dimension-sized hourly series; the rank-1 filter
    compiles to WindowGroupLimit.

    Determinism — DECIMAL-exact score: CUSUM_k = P_k - k*mu amplifies a
    1-ulp engine difference in mu by up to N cumulative steps, which
    flipped the 3-dp output on skewed data (adversarial sweep). The
    rank score is therefore computed as N*P_k - k*S (= N*CUSUM_k) in
    exact decimal arithmetic over the 6-dp-rounded hourly means — no
    division, no float accumulation, bit-identical in both engines
    regardless of windowed-sum strategy (DuckDB's segment tree vs
    Spark's sequential frame). The single remaining cross-engine term
    is the per-hour round(avg, 6) itself (an independent ulp coin per
    HOUR, never amplified). Division by N and the 3-dp half-up round
    happen once at the result edge, on bit-identical operands. Decimal
    widths hold exactly for |value| <= 1e12 and <= 1e7 hours per type
    (ANSI overflow fails loud beyond)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.round(F.avg("value"), 6).cast("decimal(19,6)").alias("v6"))
    wt = Window.partitionBy("event_type")
    wc = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wo = Window.partitionBy("event_type").orderBy("hour")
    score = (
        F.count("*").over(wt).cast("decimal(7,0)")
        * F.sum("v6").over(wc).cast("decimal(25,6)")
        - F.row_number().over(wo).cast("decimal(7,0)")
        * F.sum("v6").over(wt).cast("decimal(25,6)")
    )
    c = hourly.select(
        "event_type",
        "hour",
        score.alias("score"),
        F.count("*").over(wt).cast("double").alias("n"),
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.desc(F.abs(F.col("score"))), F.asc("hour")
    )
    ac = F.abs(F.col("score")).cast("double") / F.col("n")
    rounded = F.when(ac < 1e12, F.floor(ac * 1000 + 0.5) / 1000).otherwise(ac)
    return (
        c.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("hour").alias("changepoint_hour"),
            rounded.alias("max_abs_cusum"),
        )
    )


# --------------------------------------------------------------------------
# Kaplan-Meier survival over user lifetimes
# --------------------------------------------------------------------------


@query(
    "q_km_survival",
    oracle="""
    WITH life AS (
        SELECT user_id,
               date_diff('day', min(ts), max(ts)) AS dur,
               CAST(max(CASE WHEN ts = mx THEN
                    CASE WHEN event_type = 'error' THEN 1 ELSE 0 END END)
                    AS BIGINT) AS churned
        FROM (
            SELECT user_id, ts, event_type,
                   max(ts) OVER (PARTITION BY user_id) AS mx
            FROM events
        ) GROUP BY user_id
    ),
    times AS (
        SELECT dur, sum(churned) AS d, count(*) AS ended
        FROM life GROUP BY dur
    ),
    risk AS (
        SELECT dur, d,
               sum(ended) OVER (ORDER BY dur DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_risk
        FROM times
    )
    SELECT dur AS duration_days,
           CAST(d AS BIGINT) AS n_churned,
           CAST(n_risk AS BIGINT) AS n_at_risk,
           round(CASE WHEN max(CASE WHEN d = n_risk THEN 1 ELSE 0 END) OVER wcum = 1
                      THEN 0.0
                      ELSE exp(sum(ln(CASE WHEN d < n_risk
                                           THEN 1.0 - d::DOUBLE / n_risk
                                           ELSE 1.0 END)) OVER wcum)
                 END, 4) AS survival
    FROM risk WHERE d > 0
    WINDOW wcum AS (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    tags=("stats", "survival", "kaplan-meier", "window"),
)
def q_km_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve over user lifetimes (days between a
    user's first and last event); a lifetime counts as a churn event
    when the user's final event is an 'error', otherwise it is
    censored at observation end — S(t) = Π_{t_i<=t} (1 - d_i/n_i).
    The product runs in log space (exp of a running sum of ln terms)
    so it is a cumulative aggregate, not an iterative loop. The
    terminal step where EVERYONE still at risk churns (d = n_risk,
    factor 0, ln undefined) is special-cased to survival 0 in both
    engines — otherwise DuckDB errors on ln(0) while Spark's NULL log
    silently drops the term and reports a wrong positive survival.

    Scale shape: lifetimes are one per-user aggregate; distinct event
    times collapse the key-level table to its duration spectrum; the
    at-risk counts and the survival product are striped two-pass
    running states (:func:`_striped_running`) — every window in the
    plan is partitioned by the duration stripe, so even a pathological
    billion-distinct-duration spectrum never funnels into one task."""
    ev = load_table(spark, sf_dir, "events")
    wmx = Window.partitionBy("user_id")
    life = (
        ev.select(
            "user_id",
            "ts",
            "event_type",
            F.max("ts").over(wmx).alias("mx"),
        )
        .groupBy("user_id")
        .agg(
            F.datediff(F.max("ts"), F.min("ts")).alias("dur"),
            F.max(
                F.when(
                    F.col("ts") == F.col("mx"),
                    F.when(F.col("event_type") == "error", 1).otherwise(0),
                )
            ).cast("bigint").alias("churned"),
        )
    )
    times = life.groupBy("dur").agg(
        F.sum("churned").alias("d"), F.count("*").alias("ended")
    )
    risk = _striped_running(times, "dur", None, sums=("ended",), desc=True).select(
        "dur", "d", F.col("cum_ended").alias("n_risk")
    )
    # d = 0 steps contribute ln(1) = 0, so running the log-sum over the
    # full spectrum and filtering d > 0 afterwards matches the oracle.
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
    surv = F.when(F.col("cum_dead") == 1, F.lit(0.0)).otherwise(F.exp(F.col("cum_term")))
    return (
        run.withColumn("survival", F.round(surv, 4))
        .filter(F.col("d") > 0)
        .select(
            F.col("dur").alias("duration_days"),
            F.col("d").cast("bigint").alias("n_churned"),
            F.col("n_risk").cast("bigint").alias("n_at_risk"),
            "survival",
        )
    )


# --------------------------------------------------------------------------
# RFM segmentation
# --------------------------------------------------------------------------


@query(
    "q_rfm_segments",
    oracle="""
    WITH mx AS (SELECT max(ts) AS m FROM events),
    u AS (
        SELECT user_id,
               date_diff('day', max(ts), mx.m) AS recency,
               count(*) AS freq,
               sum(value) AS monetary
        FROM events CROSS JOIN mx GROUP BY user_id, mx.m
    ),
    q AS (
        SELECT user_id, monetary,
               ((row_number() OVER (ORDER BY recency, user_id) - 1) * 5)
                   // count(*) OVER () AS r,
               ((row_number() OVER (ORDER BY freq, user_id) - 1) * 5)
                   // count(*) OVER () AS f,
               ((row_number() OVER (ORDER BY monetary, user_id) - 1) * 5)
                   // count(*) OVER () AS m
        FROM u
    )
    SELECT r * 100 + f * 10 + m AS segment,
           CAST(count(*) AS BIGINT) AS n_users,
           round(sum(monetary), 2) AS total_value
    FROM q GROUP BY segment
    """,
    tags=("analytics", "rfm", "segmentation", "window"),
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: every user scored into quintiles of Recency
    (days since last event), Frequency (event count), and Monetary
    (total value), emitted as the classic 3-digit segment code with
    user counts and value — the marketing/abuse-triage segmentation
    primitive. Quintiles are exact integer rank arithmetic
    (((rn-1)*5) div n with user_id tie-break), not ntile(), so both
    engines agree.

    Scale shape: one per-user aggregate (key-level rows from there
    on); the three ranks are each the striped two-pass
    :func:`_rank_in_group` (no window sees more than one value-stripe
    of keys, so a billion-user table never funnels through one task),
    the user count rides in as a broadcast 1-row aggregate (no eager
    .count() job at plan-build time), then a ≤125-row aggregate."""
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("m"))
    u = (
        ev.crossJoin(F.broadcast(mx))
        .groupBy("user_id")
        .agg(
            F.datediff(F.first("m"), F.max("ts")).alias("recency"),
            F.count("*").alias("freq"),
            F.sum("value").alias("monetary"),
        )
    ).withColumn("_g", F.lit(0))

    q = u
    for col, rank_name in (("recency", "rn_r"), ("freq", "rn_f"), ("monetary", "rn_m")):
        q = _rank_in_group(q, "_g", col, "user_id").withColumnRenamed("rn", rank_name)
    nagg = u.agg(F.count("*").alias("_n"))
    q = q.crossJoin(F.broadcast(nagg)).select(
        "monetary",
        F.expr("((rn_r - 1) * 5) div _n").alias("r"),
        F.expr("((rn_f - 1) * 5) div _n").alias("f"),
        F.expr("((rn_m - 1) * 5) div _n").alias("m"),
    )
    return q.groupBy(
        (F.col("r") * 100 + F.col("f") * 10 + F.col("m")).alias("segment")
    ).agg(
        F.count("*").alias("n_users"),
        F.round(F.sum("monetary"), 2).alias("total_value"),
    )


# --------------------------------------------------------------------------
# Sessionized engagement stats
# --------------------------------------------------------------------------

_SESSION_GAP_MIN = 30


@query(
    "q_session_stats",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR date_diff('second', lag(ts) OVER w, ts)
                            > {_SESSION_GAP_MIN} * 60
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts, event_id, event_type,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged
    ),
    per_session AS (
        SELECT user_id, sid,
               arg_min(event_type, event_id) AS entry_type,
               count(*) AS n_events,
               date_diff('second', min(ts), max(ts)) AS dur_s
        FROM sess GROUP BY user_id, sid
    )
    SELECT entry_type,
           CAST(count(*) AS BIGINT) AS n_sessions,
           round(count(*) FILTER (n_events = 1)::DOUBLE / count(*), 4)
               AS bounce_rate,
           round(avg(n_events), 3) AS avg_events,
           round(avg(dur_s), 1) AS avg_duration_s
    FROM per_session GROUP BY entry_type
    """,
    tags=("analytics", "session", "engagement", "window"),
)
def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionized engagement report: sessions cut at
    {_SESSION_GAP_MIN}-minute inactivity gaps (the same gaps-islands
    construction as q_sessionize_users), rolled up by ENTRY event type
    into the product-analytics staples — session count, bounce rate
    (single-event sessions), mean events, mean duration.

    Scale shape: the flag + cumulative-sum session id is two
    running-state windows on the one per-user partitioning; per-
    session and per-entry-type rollups are ordinary partial
    aggregates. min_by picks the entry event without a sort."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            F.lag("ts").over(w).isNull() | (gap > _SESSION_GAP_MIN * 60), 1
        ).otherwise(0).alias("new_s"),
    )
    wc = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = flagged.withColumn("sid", F.sum("new_s").over(wc))
    per_session = sess.groupBy("user_id", "sid").agg(
        F.min_by("event_type", "event_id").alias("entry_type"),
        F.count("*").alias("n_events"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias("dur_s"),
    )
    bounce = F.count(F.when(F.col("n_events") == 1, 1))
    return per_session.groupBy("entry_type").agg(
        F.count("*").alias("n_sessions"),
        F.round(bounce.cast("double") / F.count("*"), 4).alias("bounce_rate"),
        F.round(F.avg("n_events"), 3).alias("avg_events"),
        F.round(F.avg("dur_s"), 1).alias("avg_duration_s"),
    )


# --------------------------------------------------------------------------
# Weighted median (value-weighted order statistic)
# --------------------------------------------------------------------------


@query(
    "q_weighted_median",
    oracle="""
    WITH r AS (
        SELECT event_type, value,
               sum(value) OVER (PARTITION BY event_type ORDER BY value, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               sum(value) OVER (PARTITION BY event_type) AS tot
        FROM events
    )
    SELECT event_type,
           round(min(CASE WHEN cum >= tot / 2 THEN value END), 4)
               AS weighted_median,
           round(any_value(tot), 2) AS total_value
    FROM r GROUP BY event_type
    """,
    tags=("agg", "stats", "weighted-median", "window"),
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-weighted median per event type: the value v such that
    half the type's TOTAL value lies at or below v (the dollar-
    weighted median price) — the robust middle that row-median misses
    when a few large transactions carry most of the mass; pairs with
    Gini/Lorenz on the concentration dashboard.

    Scale shape: one cumulative window on the (type, value) ordering —
    the same per-group running-state pass as the ECDF in q_ks_test —
    and a conditional min aggregate. The striped two-pass rank is the
    billion-row drop-in for the cumulative sum (per-stripe totals
    broadcast as offsets)."""
    ev = load_table(spark, sf_dir, "events")
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("value", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("event_type")
    r = ev.select(
        "event_type",
        "value",
        F.sum("value").over(wcum).alias("cum"),
        F.sum("value").over(wtot).alias("tot"),
    )
    return r.groupBy("event_type").agg(
        F.round(
            F.min(F.when(F.col("cum") >= F.col("tot") / 2, F.col("value"))), 4
        ).alias("weighted_median"),
        F.round(F.first("tot"), 2).alias("total_value"),
    )


# --------------------------------------------------------------------------
# Conversion latency (click -> purchase time-to-convert)
# --------------------------------------------------------------------------


@query(
    "q_time_to_convert",
    oracle="""
    WITH u AS (
      SELECT event_id, user_id, ts, 0 AS is_ref, CAST(NULL AS TIMESTAMP) AS rts
      FROM events WHERE event_type = 'purchase'
      UNION ALL
      SELECT event_id, user_id, ts, 1, ts FROM events WHERE event_type = 'click'
    ),
    c AS (
      SELECT event_id, user_id, ts, is_ref,
             last_value(rts IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY ts, is_ref DESC, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click
      FROM u
    ),
    lat AS (
      SELECT date_diff('second', last_click, ts) AS sec
      FROM c WHERE is_ref = 0 AND last_click IS NOT NULL
    ),
    r AS (
      SELECT sec, row_number() OVER (ORDER BY sec) AS rn, count(*) OVER () AS n
      FROM lat
    )
    SELECT CAST(any_value(n) AS BIGINT) AS n_conversions,
           round(avg(sec) / 3600.0, 3) AS mean_hours,
           round(min(CASE WHEN rn = (n + 1) // 2 THEN sec END) / 3600.0, 3)
               AS median_hours
    FROM r
    """,
    tags=("analytics", "funnel", "latency", "asof", "window"),
)
def q_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert: for every purchase preceded by a click in the
    same user's stream, the elapsed time since the MOST RECENT click —
    mean and exact median hours. The latency readout that turns the
    funnel (how many convert) into an SLA (how fast they convert);
    built on the same union + running-window as-of construction as
    q_asof_join.

    Scale shape: one per-user ordered window over the filtered
    click/purchase union, then median by the striped two-pass exact
    rank (:func:`_rank_in_group`) over the conversions table — no
    global-order window anywhere, so a billion-conversion table never
    funnels through one task; the total count broadcasts as one row.
    Tie order (is_ref DESC) makes a click at the same timestamp as
    the purchase count as its antecedent, matching the as-of
    convention."""
    from ripple_server_spark.operators.joins import asof_join

    ev = load_table(spark, sf_dir, "events")
    pur = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clk = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    # the union + running-window as-of construction lives in ONE place
    # (operators/joins.asof_join); equal-ts clicks all share the same
    # asof_ts, so its max-ref-id tie-break yields identical latencies
    aj = asof_join(pur, clk, key="user_id", time_col="ts", ref_id_col="event_id")
    lat = aj.filter(F.col("asof_ts").isNotNull()).select(
        (F.unix_timestamp("ts") - F.unix_timestamp("asof_ts")).alias("sec")
    )
    # Tie column = the value itself: duplicate `sec` values may rank in
    # any order without changing which value sits at the median rank.
    ranked = _rank_in_group(lat.withColumn("_g", F.lit(0)), "_g", "sec", "sec")
    n_agg = lat.agg(F.count("*").alias("n"))
    r = ranked.crossJoin(F.broadcast(n_agg))
    return r.agg(
        F.first("n").cast("bigint").alias("n_conversions"),
        F.round(F.avg("sec") / 3600.0, 3).alias("mean_hours"),
        F.round(
            F.min(F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("sec"))) / 3600.0, 3
        ).alias("median_hours"),
    )
