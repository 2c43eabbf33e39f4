"""TPC-H extension shapes: q7-q10, q12, q15, q16, q21 (adapted).

Widens the relational surface beyond queries/tpch.py with the
remaining classic shapes expressible on the driver tables (no
``partsupp``, no commit/receipt dates — see TESTDATA.md):

- q7/q8/q9: 5-7 way snowflake joins with per-year reaggregation
  (self-joined nation dimension, conditional market-share ratio);
- q10: returned-item revenue ranking (fact ⋈ 2 dims, top-k);
- q12 (adapted): late-shipment priority split — the commitdate
  predicate becomes ``l_shipdate > o_orderdate + 60 days``;
- q15: CTE revenue view + max-of-aggregate scalar subquery;
- q16 (adapted): distinct-supplier counting with a NOT IN
  exclusion subquery (supplier attrs come via lineitem, not
  partsupp);
- q21 (adapted): the double EXISTS/NOT EXISTS waiting-supplier
  query, decorrelated into per-order supplier/late-supplier counts.

Scale notes: every dimension join (nation, region, part, supplier)
is broadcast — no shuffle of the fact side for them; the only
fact-fact shuffles are lineitem⋈orders equi-joins on the order key,
which at 100 TB co-partition on that key (AQE handles skew).
Reference surface parity: joins are ABSENT in baseline_magician
(SURVEY §2.6 — evidence main.go:279); these queries cover the
north-star relational extension the engine must also serve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                           AND TIMESTAMP '1997-12-31 00:00:00'
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-joined nation dim (two roles) + disjunctive cross-nation
    predicate.

    Scale shape: Catalyst cannot derive per-side IN-filters from the
    cross-side disjunction, so both nation roles are pre-filtered to
    the two named nations BEFORE any join — suppliers and customers
    shrink to 2/25 of their tables map-side, which shrinks both inputs
    of the orders⋈lineitem shuffle by the same factor (the win grows
    linearly with scale). The residual ``pair`` predicate only has to
    exclude the two same-nation combinations that survive the
    pre-filter."""
    nations = ("NATION_1", "NATION_2")
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between(
            F.lit("1996-01-01 00:00:00").cast("timestamp"),
            F.lit("1997-12-31 00:00:00").cast("timestamp"),
        )
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.where(F.col("n_name").isin(*nations)).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.where(F.col("n_name").isin(*nations)).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (
        F.col("cust_nation") == "NATION_2"
    ) | (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    supp2 = supp.join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
    cust2 = cust.join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
    o2 = orders.join(cust2, F.col("c_custkey") == F.col("o_custkey"))
    return (
        li.join(F.broadcast(supp2), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o2, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "q8_national_market_share",
    """
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume), 4) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'EUROPE' AND p_type = 'STANDARD'
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                            AND TIMESTAMP '1997-12-31 00:00:00'
    )
    GROUP BY o_year
    """,
)
def q8_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-table snowflake with a conditional-ratio aggregate; all five
    dimension joins broadcast, one fact-fact shuffle (order key)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate").between(
            F.lit("1996-01-01 00:00:00").cast("timestamp"),
            F.lit("1997-12-31 00:00:00").cast("timestamp"),
        )
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    n1 = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("n1_key"))
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"), "left_semi")
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
    )


@query(
    "q9_product_type_profit",
    """
    SELECT nation, o_year, CAST(round(sum(amount), 2) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(year(o_orderdate) AS BIGINT) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,4))
               * (1 - CAST(l_discount AS DECIMAL(18,4)))
               - CAST(0.5 AS DECIMAL(2,1)) * CAST(p_retailprice AS DECIMAL(18,4))
               * CAST(l_quantity AS DECIMAL(18,4)) AS amount
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%gear%'
    )
    GROUP BY nation, o_year
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q9 profit rollup; the driver tables carry no partsupp, so the
    supply cost term is 0.5 * p_retailprice (same join/agg shape).
    Inputs are exact 2-4 decimal values -> decimal arithmetic keeps the
    sum exact, so the rounded result is engine-independent."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%gear%"))
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    amount = dec("l_extendedprice") * (1 - dec("l_discount")) - F.lit("0.5").cast(
        "decimal(2,1)"
    ) * dec("p_retailprice") * dec("l_quantity")
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.round(F.sum(amount), 2).cast("double").alias("sum_profit"))
    )


@query(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2)
                AS DOUBLE) AS revenue,
           round(c_acctbal, 2) AS acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item revenue top-k: quarter window + returnflag filter
    pushed to the scans, then group + global top-20 (TakeOrderedAndProject)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(F.sum(dec("l_extendedprice") * (1 - dec("l_discount"))), 2)
            .cast("double")
            .alias("revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q12_late_shipment_priority",
    """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
)
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q12 priority split; 'late' is l_shipdate > o_orderdate + 60 days
    (the driver tables have no commit/receipt dates). The inter-column
    date predicate can only apply post-join — the shipdate range still
    pushes to the scan."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE reused twice (revenue view + its max): computed once and
    broadcast back — the Spark plan reuses the aggregated exchange
    rather than rescanning lineitem. Revenue is rounded before the
    equality so the max-compare is stable across engines."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    top = revenue.agg(F.max("total_revenue").alias("_max_rev"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(top), F.col("total_revenue") == F.col("_max_rev"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q16_supplier_part_counts",
    """
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q16 shape with supplier-part pairs sourced from lineitem (no
    partsupp table): COUNT(DISTINCT) + NOT-IN exclusion as a broadcast
    anti join (keys are non-null, so anti join == NOT IN here)."""
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    excluded = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            F.broadcast(excluded), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@query(
    "q21_waiting_suppliers",
    """
    WITH flagged AS (
      SELECT l_suppkey, l_orderkey,
             CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END AS is_late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
    ),
    per_order AS (
      SELECT l_orderkey,
             count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT CASE WHEN is_late = 1 THEN l_suppkey END) AS n_late
      FROM flagged GROUP BY l_orderkey
    )
    SELECT s_name, count(*) AS numwait
    FROM (SELECT DISTINCT l_suppkey, f.l_orderkey
          FROM flagged f JOIN per_order p ON f.l_orderkey = p.l_orderkey
          WHERE f.is_late = 1 AND p.n_supp > 1 AND p.n_late = 1)
    JOIN supplier ON s_suppkey = l_suppkey
    GROUP BY s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q21's EXISTS(other supplier) AND NOT EXISTS(other late supplier)
    decorrelated into one per-order aggregate: a supplier 'kept the
    order waiting' iff it was late, the order has >1 supplier, and it
    is the ONLY late one. One shuffle on the order key feeds both the
    flagging join and the per-order counts."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    flagged = li.join(orders, F.col("o_orderkey") == F.col("l_orderkey")).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .cast("int")
        .alias("is_late"),
    )
    per_order = flagged.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("is_late") == 1, F.col("l_suppkey"))
        ).alias("n_late"),
    )
    waiting = (
        flagged.where(F.col("is_late") == 1)
        .join(
            per_order.where((F.col("n_supp") > 1) & (F.col("n_late") == 1)),
            "l_orderkey",
            "left_semi",
        )
        .select("l_suppkey", "l_orderkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        waiting.join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "q2_min_cost_supplier",
    """
    WITH costs AS (
      SELECT l_partkey, l_suppkey,
             min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    best AS (
      SELECT l_partkey AS bp, min(unit_cost) AS min_cost
      FROM costs GROUP BY l_partkey
    )
    SELECT p_partkey, p_brand, s_name, round(unit_cost, 4) AS best_unit_cost
    FROM costs
    JOIN best ON l_partkey = bp AND unit_cost = min_cost
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE p_size = 2 AND p_type = 'LARGE'
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q2's correlated min-subquery shape, adapted: the supply
    relation is observed lineitem unit prices (no partsupp table —
    TESTDATA.md). Decorrelated into a per-part window min — one shuffle
    on the part key instead of a re-aggregating self-join; part and
    supplier dims broadcast. Equality on the min is safe: both sides
    compare the same IEEE doubles."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    costs = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    w = Window.partitionBy("l_partkey")
    best = costs.withColumn("min_cost", F.min("unit_cost").over(w)).where(
        F.col("unit_cost") == F.col("min_cost")
    )
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_size") == 2) & (F.col("p_type") == "LARGE")
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        best.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            F.round("unit_cost", 4).alias("best_unit_cost"),
        )
    )


@query(
    "q11_important_part_values",
    """
    WITH supplied AS (
      SELECT l_partkey AS partkey,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                           AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_regionkey = 1
      GROUP BY l_partkey
    )
    SELECT partkey, round(cents / 100.0, 2) AS total_value
    FROM supplied
    WHERE cents > (SELECT sum(cents) * 0.002 FROM supplied)
    """,
)
def q11_important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q11's HAVING-greater-than-global-scalar shape: per-part supplied
    value from region-1 nations vs 0.2% of the regional total. The
    scalar is a one-row broadcast; the per-part agg shuffles once on
    the part key.

    Summed in integer CENTS: a raw double sum's shuffle order is
    nondeterministic and differs from the oracle engine's, so a part
    within FP noise of the threshold could flip sides; integer sums
    are associative and the threshold comparison exact."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").where(F.col("n_regionkey") == 1)
    supplied = (
        li.join(
            F.broadcast(
                supp.join(
                    F.broadcast(nation),
                    F.col("s_nationkey") == F.col("n_nationkey"),
                    "left_semi",
                )
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("long")
            )
            .cast("long")
            .alias("cents")
        )
    )
    threshold = supplied.agg((F.sum("cents") * 0.002).alias("_thr"))
    return (
        supplied.crossJoin(F.broadcast(threshold))
        .where(F.col("cents") > F.col("_thr"))
        .select(
            "partkey", F.round(F.col("cents") / 100.0, 2).alias("total_value")
        )
    )


@query(
    "q20_promo_heavy_suppliers",
    """
    WITH promo AS (
      SELECT l_suppkey, CAST(sum(l_quantity) AS BIGINT) AS qty
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_type = 'PROMO'
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, round(s_acctbal, 2) AS acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_regionkey = 1
      AND s_suppkey IN (
        SELECT l_suppkey FROM promo
        WHERE qty > (SELECT 0.5 * avg(qty) FROM promo)
      )
    """,
)
def q20_promo_heavy_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q20's nested IN + scalar-threshold shape, adapted to lineitem as
    the supply relation: region-1 suppliers whose 1996 PROMO shipment
    quantity beats half the average. Integer quantity sums keep the
    threshold comparison exact across engines."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    promo_part = load_table(spark, sf_dir, "part").where(
        F.col("p_type") == "PROMO"
    )
    promo = (
        li.join(F.broadcast(promo_part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").cast("long").alias("qty"))
    )
    thr = promo.agg((F.avg("qty") * 0.5).alias("_thr"))
    heavy = (
        promo.crossJoin(F.broadcast(thr))
        .where(F.col("qty") > F.col("_thr"))
        .select("l_suppkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").where(F.col("n_regionkey") == 1)
    return (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(heavy), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", F.round("s_acctbal", 2).alias("acctbal"))
    )
