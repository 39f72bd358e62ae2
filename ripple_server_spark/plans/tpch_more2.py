"""TPC-H coverage completion: Q2/Q9/Q11/Q12/Q15/Q16/Q20/Q21 shapes.

The driver schema has no partsupp/commitdate/receiptdate/shipmode, so
each query keeps its *plan challenge* and re-targets the filter to
existing columns (lineitem doubles as the part-supplier bridge). With
tpch_more.py this completes all 22 TPC-H query shapes:

- Q2: correlated per-group MIN + equality join back (min-cost supplier)
- Q9: multi-dim profit rollup with expression measures
- Q11: HAVING against a scalar subquery of the same aggregate
- Q12: two-way conditional classification over a fact join
- Q15: aggregate == MAX(aggregate) (the view/CTE query)
- Q16: count(DISTINCT) with anti-filtered dimensions
- Q20: nested aggregate correlation (share-of-part threshold)
- Q21: EXISTS + NOT EXISTS double self-correlation on the fact
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ripple_server_spark.catalog import load_table
from ripple_server_spark.plans.registry import query

_DEC = "decimal(18,6)"


@query(
    "q_tpch_q2_mincost",
    oracle="""
    WITH cost AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    best AS (
      SELECT partkey, min(unit_cost) AS best_cost
      FROM cost GROUP BY partkey
    )
    SELECT s_name, n_name, p_partkey, round(best_cost, 4) AS cost
    FROM part
    JOIN best ON p_partkey = partkey
    JOIN cost ON cost.partkey = p_partkey AND unit_cost = best_cost
    JOIN supplier ON s_suppkey = suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE p_size = 25 AND p_type = 'PROMO'
    """,
    tags=("join", "subquery", "tpch"),
)
def q_tpch_q2_mincost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest supplier per part (unit price from
    lineitem as the partsupp bridge). The correlated MIN decorrelates
    into a grouped sub-aggregate joined back on (part, cost) — both
    aggregates group on l_partkey, so the second reuses the first's
    shuffle; part (size+type filtered) and supplier/nation broadcast.
    Double-equality join is safe cross-engine: both engines compute
    identical IEEE divisions on identical parquet doubles."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", (F.col("l_extendedprice") / F.col("l_quantity")).alias("u")
    )
    cost = li.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(F.min("u").alias("unit_cost"))
    best = cost.groupBy("partkey").agg(F.min("unit_cost").alias("best_cost"))
    part = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_size") == 25) & (F.col("p_type") == "PROMO"))
        .select("p_partkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation")
    return (
        part.join(best, part.p_partkey == best.partkey)
        .join(
            cost.withColumnRenamed("partkey", "c_partkey"),
            (F.col("c_partkey") == F.col("p_partkey"))
            & (F.col("unit_cost") == F.col("best_cost")),
        )
        .join(F.broadcast(supp), F.col("suppkey") == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            "s_name", "n_name", "p_partkey", F.round("best_cost", 4).alias("cost")
        )
    )


@query(
    "q_tpch_q9_profit",
    oracle=f"""
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                               - 0.1 * p_retailprice * l_quantity
                               AS DECIMAL(18,6))), 2) AS DOUBLE) AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, year(o_orderdate)
    """,
    tags=("join", "agg", "tpch"),
    bench=True,
)
def q_tpch_q9_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation x order year, cost
    proxied by 10% of retail price (no partsupp.supplycost in the
    fixtures). The LIKE filter stays on the (broadcast) part dim; the
    measure is an expression over three tables evaluated post-join in
    codegen and summed in decimal."""
    li = load_table(spark, sf_dir, "lineitem")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nation = load_table(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    ).cast(_DEC)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.round(F.sum(amount), 2).cast("double").alias("profit"))
    )


@query(
    "q_tpch_q11_important",
    oracle="""
    WITH pv AS (
      SELECT l_partkey AS partkey,
             sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS value
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      WHERE n_name = 'NATION_0'
      GROUP BY l_partkey
    )
    SELECT partkey, CAST(round(value, 2) AS DOUBLE) AS value
    FROM pv, (SELECT sum(value) * 0.001 AS cutoff FROM pv)
    WHERE value > cutoff
    """,
    tags=("agg", "subquery", "having", "tpch"),
)
def q_tpch_q11_important(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose revenue (within one nation's
    suppliers) exceeds a fraction of the total — HAVING against a
    scalar subquery OVER THE SAME aggregate. The per-part aggregate is
    computed once, cached by plan reuse, and the 1-row total broadcasts
    back; decimal sums make the cutoff comparison exact."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_0")
    pv = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(F.col("l_extendedprice").cast(_DEC)).alias("value"))
    )
    # decimal literal keeps the cutoff comparison in exact decimal
    # arithmetic like the oracle (a double 0.001 would demote it)
    total = pv.agg((F.sum("value") * F.lit("0.001").cast("decimal(4,3)")).alias("cutoff"))
    return (
        pv.join(F.broadcast(total))
        .filter(F.col("value") > F.col("cutoff"))
        .select("partkey", F.round("value", 2).cast("double").alias("value"))
    )


@query(
    "q_tpch_q12_priority_class",
    oracle="""
    SELECT l_linestatus,
           count(*) FILTER (o_orderpriority IN ('1-URGENT', '2-HIGH'))
             AS high_line_count,
           count(*) FILTER (o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
             AS low_line_count
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus
    """,
    tags=("join", "agg", "tpch"),
)
def q_tpch_q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode -> linestatus): late-shipped lines per
    status classified by order priority, one conditional aggregation
    over the fact join. The cross-table predicate l_shipdate >
    o_orderdate evaluates inside the join; the date window pushes to
    lineitem's scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            orders,
            (li.l_orderkey == orders.o_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
        )
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


@query(
    "q_tpch_q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS suppkey,
             sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(round(total_revenue, 2) AS DOUBLE) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = suppkey,
         (SELECT max(total_revenue) AS mx FROM rev)
    WHERE total_revenue = mx
    """,
    tags=("agg", "subquery", "tpch"),
)
def q_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: top supplier(s) by quarterly revenue — the
    aggregate == MAX(aggregate) pattern (TPC-H's CREATE VIEW query).
    Decimal revenue makes the equality exact on both engines (double
    sums would diverge in the last bit across partitionings). rev is
    computed once; the max is a 1-row broadcast."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC)).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(supp), F.col("suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_revenue", 2).cast("double").alias("total_revenue"),
        )
    )


@query(
    "q_tpch_q16_supplier_cnt",
    oracle="""
    SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#11' AND p_size IN (10, 20, 30, 40, 50)
    GROUP BY p_brand, p_type, p_size
    """,
    tags=("join", "agg", "distinct", "tpch"),
)
def q_tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per part group, with
    NOT-filters on the dimension (lineitem is the partsupp bridge).
    count(DISTINCT) plans as the two-level aggregate (dedup on
    group+suppkey, then count) — partial aggregation still applies."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#11")
            & F.col("p_size").isin(10, 20, 30, 40, 50)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q_tpch_q20_excess",
    oracle="""
    WITH shipped AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             sum(l_quantity) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
      GROUP BY l_partkey, l_suppkey
    ),
    part_total AS (
      SELECT partkey, sum(qty) AS total_qty FROM shipped GROUP BY partkey
    ),
    qualifying AS (
      SELECT DISTINCT suppkey
      FROM shipped JOIN part_total USING (partkey)
      WHERE qty > 0.3 * total_qty
    )
    SELECT s_name, n_name
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    WHERE s_suppkey IN (SELECT suppkey FROM qualifying)
    """,
    tags=("join", "semi", "subquery", "tpch"),
)
def q_tpch_q20_excess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers dominating (>30% of) the 1996
    shipments of some PROMO part — nested aggregate correlation
    ((part,supp) sums vs part totals, same grouping key so the second
    agg reuses the first's exchange), closed with a semi join into the
    supplier dim."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    shipped = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi")
        .groupBy(
            F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
        )
        .agg(F.sum("l_quantity").alias("qty"))
    )
    part_total = shipped.groupBy("partkey").agg(F.sum("qty").alias("total_qty"))
    qualifying = (
        shipped.join(part_total, "partkey")
        .filter(F.col("qty") > 0.3 * F.col("total_qty"))
        .select("suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        supp.join(qualifying, supp.s_suppkey == qualifying.suppkey, "left_semi")
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("s_name", "n_name")
    )


@query(
    "q_tpch_q21_waiting",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > l1.l_shipdate
      )
    GROUP BY s_name
    """,
    tags=("join", "semi", "anti", "tpch"),
)
def q_tpch_q21_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the supplier who shipped LAST on multi-supplier
    finished orders (ship date stands in for the missing receipt/commit
    dates). EXISTS -> left-semi, NOT EXISTS -> left-anti, both on
    l_orderkey with the inequality residual inside the join condition;
    all three lineitem occurrences co-partition on l_orderkey, so AQE
    plans one exchange family for the whole correlation chain."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    l1 = li.alias("l1")
    l2 = li.alias("l2")
    l3 = li.alias("l3")
    base = l1.join(orders, F.col("l1.l_orderkey") == orders.o_orderkey)
    with_other = base.join(
        l2,
        (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
        "left_semi",
    )
    sole_last = with_other.join(
        l3,
        (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey"))
        & (F.col("l3.l_shipdate") > F.col("l1.l_shipdate")),
        "left_anti",
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole_last.join(F.broadcast(supp), F.col("l1.l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )
