"""Composite TPC-H-shaped analytics queries (beyond the single-operator
inventory): multi-operator pipelines a reference user actually runs.
Q1's shape is `agg_group_hash`, Q3's is `sort_multikey_limit`, Q5's is
`join_multikey`; this module adds Q6/Q10/Q18 shapes end to end.

Date windows / thresholds are calibrated to the testdata's value
domains (shipdates 1995–2001, max per-order quantity 458 — FIXTURES.md)
so each query returns meaningfully filtered, non-empty results.

Money math uses the deterministic fixed-point sum (engine.dsl.dsum) so
double summation order can't flake the value hash.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..dsl import dsum
from ..registry import register, table

SQL_REV = "sum(CAST(round(l_extendedprice*(1-l_discount)*10000) AS BIGINT))/10000.0"


@register(
    "tpch_q6",
    oracle="""
        SELECT sum(CAST(round(l_extendedprice*l_discount*10000) AS BIGINT))/10000.0
                 AS revenue_delta,
               count(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
)
def tpch_q6(spark, sf_dir):
    """Q6 forecasting-revenue-change: tight scan-filter-agg, no joins.
    All four predicates push to the parquet scan."""
    li = table(spark, sf_dir, "lineitem")
    f = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return f.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), 10000).alias(
            "revenue_delta"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "tpch_q10",
    oracle=f"""
        SELECT c.c_custkey, c.c_name, {SQL_REV} AS revenue,
               c.c_acctbal, n.n_name
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1996-07-01'
          AND l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
        ORDER BY revenue DESC, c.c_custkey
        LIMIT 20
    """,
)
def tpch_q10(spark, sf_dir):
    """Q10 returned-item reporting: fact-fact join with pushed-down
    date/flag filters, broadcast nation dim, top-20 with a unique
    tiebreak (c_custkey) for hash determinism."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp_ntz"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q18",
    oracle="""
        WITH big AS (
          SELECT l_orderkey, sum(l_quantity) AS total_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING sum(l_quantity) > 300
        )
        SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
               o.o_totalprice, b.total_qty
        FROM big b
        JOIN orders o ON b.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        ORDER BY o.o_totalprice DESC, o.o_orderkey
        LIMIT 100
    """,
)
def tpch_q18(spark, sf_dir):
    """Q18 large-volume customers: pre-aggregated HAVING filter (the
    aggregation shrinks the fact table *before* any join — the 100 TB
    ordering), then two equi-joins and a deterministic top-100.
    Quantities are integer-valued doubles, so the plain sum is exact."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )
