"""TPC-H-style relational queries over the driver's star schema.

Mirrors the reference's correctness-gated TPC suites
(flink-end-to-end-tests/test-scripts/test_tpch.sh:22, TPC-H SF0.01;
flink-end-to-end-tests/flink-tpcds-test/.../TpcdsTestProgram.java:59-70) —
queries are adapted to the driver's column subset (no comment/ship-instruct/
supplycost columns; o_orderdate & l_shipdate are TIMESTAMP).

Exercised Flink operators (SURVEY.md §2 citations in each docstring):
scan+Calc, hash/sort agg (partial+final), hash/sort-merge/broadcast joins,
semi/anti joins from EXISTS/IN, scalar subqueries, having, top-k sort.

Scale notes: every query is fully declarative — Catalyst pushes the filters to
the parquet scan, prunes columns, broadcast-joins the dimension tables (nation,
region, customer at small SF; at 100 TB customer joins shuffle and AQE picks
strategies at runtime), and performs two-phase aggregation automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from flink_1_12_0_src_spark.catalog import table
from flink_1_12_0_src_spark.queries import register
from flink_1_12_0_src_spark.queries._util import (
    SQL_REVENUE,
    dec,
    dsum,
    one_minus,
    one_plus,
    revenue_col,
    sql_dec,
)

Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM({sql_dec('l_quantity')}) AS DOUBLE) AS sum_qty,
       CAST(SUM({sql_dec('l_extendedprice')}) AS DOUBLE) AS sum_base_price,
       CAST(SUM({sql_dec('l_extendedprice')} * CAST(1 - {sql_dec('l_discount')} AS DECIMAL(12,2))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM({sql_dec('l_extendedprice')} * CAST(1 - {sql_dec('l_discount')} AS DECIMAL(12,2))
                 * CAST(1 + {sql_dec('l_tax')} AS DECIMAL(12,2))) AS DOUBLE) AS sum_charge,
       CAST(SUM({sql_dec('l_quantity')}) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM({sql_dec('l_extendedprice')}) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM({sql_dec('l_discount')}) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register(
    "tpch_q1",
    oracle=Q1_ORACLE,
    tags=("batch", "agg", "scan", "bench"),
    doc="Pricing summary: scan + Calc + hash agg (partial/final) + sort. "
    "Flink: BatchExecHashAggregate (…/batch/BatchExecHashAggregate.scala:44) over "
    "BytesHashMap (…/operators/aggregate/BytesHashMap.java:66).",
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(dec("l_quantity")).alias("sum_qty"),
            dsum(dec("l_extendedprice")).alias("sum_base_price"),
            dsum(dec("l_extendedprice") * one_minus("l_discount")).alias("sum_disc_price"),
            dsum(dec("l_extendedprice") * one_minus("l_discount") * one_plus("l_tax")).alias("sum_charge"),
            (dsum(dec("l_quantity")) / F.count("*")).alias("avg_qty"),
            (dsum(dec("l_extendedprice")) / F.count("*")).alias("avg_price"),
            (dsum(dec("l_discount")) / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q3_ORACLE = f"""
SELECT l_orderkey, {SQL_REVENUE} AS revenue, o_orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-06-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register(
    "tpch_q3",
    oracle=Q3_ORACLE,
    tags=("batch", "join", "agg", "topk", "bench"),
    doc="Shipping priority: 3-way join + agg + top-k. Flink: BatchExecHashJoin "
    "(…/batch/BatchExecHashJoin.scala:53) + BatchExecSortLimit "
    "(…/batch/BatchExecSortLimit.scala:52). Spark: broadcast/SMJ + TakeOrderedAndProject.",
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-06-01 00:00:00").cast("timestamp")
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue_col().alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register(
    "tpch_q4",
    oracle=Q4_ORACLE,
    tags=("batch", "semi_join", "agg"),
    doc="Order priority checking: EXISTS → left-semi join. Flink rewrites subqueries to "
    "semi joins (FlinkSubQueryRemoveRule, SURVEY §4.1); runtime "
    "StreamingSemiAntiJoinOperator.java / HashJoinOperator LEFT_SEMI. "
    "Spark: RewritePredicateSubquery → left_semi.",
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == orders.o_orderkey) & (li.l_shipdate > orders.o_orderdate)
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q5_ORACLE = f"""
SELECT n_name, {SQL_REVENUE} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@register(
    "tpch_q5",
    oracle=Q5_ORACLE,
    tags=("batch", "join", "agg", "bench"),
    doc="Local supplier volume: 6-way join (join-reorder territory). Flink enables "
    "LoptOptimizeJoinOrderRule for TPC runs (TpcdsTestProgram.java:138); Spark: CBO "
    "join reorder + broadcast of nation/region/supplier.",
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = lambda n: table(spark, sf_dir, n)  # noqa: E731
    orders = t("orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    return (
        t("lineitem")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t("customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t("supplier")),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t("nation")), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t("region")), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(revenue_col().alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


Q6_ORACLE = f"""
SELECT CAST(SUM({sql_dec('l_extendedprice')} * {sql_dec('l_discount')}) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register(
    "tpch_q6",
    oracle=Q6_ORACLE,
    tags=("batch", "scan", "agg", "bench"),
    doc="Forecast revenue change: pure scan + predicate + global agg. All predicates "
    "push to the parquet scan (Flink: PushFilterIntoTableSourceScanRule; Spark: "
    "DSv2 PushedFilters — verified in tests/test_plans.py).",
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(dsum(dec("l_extendedprice") * dec("l_discount")).alias("revenue"))
    )


Q9_ORACLE = f"""
SELECT n_name AS nation, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM({sql_dec('l_extendedprice')} * CAST(1 - {sql_dec('l_discount')} AS DECIMAL(12,2))
                - {sql_dec('p_retailprice')} * {sql_dec('l_quantity')}) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN nation   ON n_nationkey = s_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT)
ORDER BY nation, o_year DESC
"""


@register(
    "tpch_q9",
    oracle=Q9_ORACLE,
    tags=("batch", "join", "agg", "like", "bench"),
    doc="Product type profit (adapted: p_retailprice*qty as cost): 5-way join + LIKE "
    "+ agg on computed key. Flink: BatchExecHashJoin chain + BatchExecHashAggregate.",
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = lambda n: table(spark, sf_dir, n)  # noqa: E731
    profit = dec("l_extendedprice") * one_minus("l_discount") - dec("p_retailprice") * dec(
        "l_quantity"
    )
    return (
        t("lineitem")
        .join(t("part").filter(F.col("p_name").like("%red%")), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(t("supplier")), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t("orders"), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t("nation")), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(dsum(profit).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


Q10_ORACLE = f"""
SELECT c_custkey, c_name, {SQL_REVENUE} AS revenue, c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register(
    "tpch_q10",
    oracle=Q10_ORACLE,
    tags=("batch", "join", "agg", "topk"),
    doc="Returned item reporting: join fan-out + wide group key + top-k.",
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = lambda n: table(spark, sf_dir, n)  # noqa: E731
    orders = t("orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    return (
        t("lineitem")
        .filter(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t("customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t("nation")), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(revenue_col().alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


Q14_ORACLE = f"""
SELECT CAST(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN {sql_dec('l_extendedprice')} * CAST(1 - {sql_dec('l_discount')} AS DECIMAL(12,2))
                 ELSE CAST(0 AS DECIMAL(25,4)) END) AS DOUBLE)
     / CAST(SUM({sql_dec('l_extendedprice')} * CAST(1 - {sql_dec('l_discount')} AS DECIMAL(12,2))) AS DOUBLE)
     AS DOUBLE) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
"""


@register(
    "tpch_q14",
    oracle=Q14_ORACLE,
    tags=("batch", "join", "agg", "case"),
    doc="Promotion effect: conditional aggregation (CASE inside SUM) + ratio.",
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    part = table(spark, sf_dir, "part")
    disc_price = dec("l_extendedprice") * one_minus("l_discount")
    promo = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(
        F.lit(0).cast("decimal(25,4)")
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (F.lit(100.0) * F.sum(promo).cast("double") / F.sum(disc_price).cast("double"))
            .cast("double")
            .alias("promo_revenue")
        )
    )


Q18_ORACLE = f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, CAST(o_totalprice AS DOUBLE) AS o_totalprice,
       CAST(SUM({sql_dec('l_quantity')}) AS DOUBLE) AS sum_qty
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey HAVING SUM({sql_dec('l_quantity')}) > 150)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


@register(
    "tpch_q18",
    oracle=Q18_ORACLE,
    tags=("batch", "join", "agg", "having", "semi_join"),
    doc="Large volume customer: IN-subquery (semi join) over HAVING aggregate.",
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = lambda n: table(spark, sf_dir, n)  # noqa: E731
    li = t("lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        t("orders")
        .join(big.withColumnRenamed("l_orderkey", "bk"), F.col("o_orderkey") == F.col("bk"), "left_semi")
        .join(t("customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum(dec("l_quantity")).alias("sum_qty"))
        .withColumn("o_totalprice", F.col("o_totalprice").cast("double"))
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


Q19_ORACLE = f"""
SELECT {SQL_REVENUE} AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity >= 20 AND l_quantity <= 30)
"""


@register(
    "tpch_q19",
    oracle=Q19_ORACLE,
    tags=("batch", "join", "disjunction"),
    doc="Discounted revenue: disjunctive join+filter predicates (tests predicate "
    "simplification/pushdown, Flink SimplifyJoinConditionRule — SURVEY §4.1).",
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    j = li.join(part, F.col("p_partkey") == F.col("l_partkey"))
    c = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 30))
    )
    return j.filter(c).agg(revenue_col().alias("revenue"))


Q22_ORACLE = """
SELECT SUBSTRING(c_name, 1, 10) AS cntrycode, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
                   FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
GROUP BY SUBSTRING(c_name, 1, 10)
ORDER BY cntrycode
"""


@register(
    "tpch_q22",
    oracle=Q22_ORACLE,
    tags=("batch", "anti_join", "scalar_subquery", "agg"),
    doc="Global sales opportunity: scalar subquery (single-row join, Flink "
    "BatchExecSingleRowJoinRule) + NOT EXISTS (anti join).",
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg((dsum(dec("c_acctbal")) / F.count("*")).alias("avg_bal"))
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy(F.substring("c_name", 1, 10).alias("cntrycode"))
        .agg(F.count("*").alias("numcust"), dsum(dec("c_acctbal")).alias("totacctbal"))
        .orderBy("cntrycode")
    )
