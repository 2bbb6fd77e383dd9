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

from ..dsl import davg, dsum, sql_davg, sql_dsum
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


@register(
    "tpch_q4",
    oracle="""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
          AND o.o_orderdate < TIMESTAMP '1996-10-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
)
def tpch_q4(spark, sf_dir):
    """Q4 order-priority checking: EXISTS → left-semi join with a
    non-equi residual (l_shipdate > o_orderdate), then a tiny grouped
    count. The semi-join keeps only the 3-month order slice on the
    probe side, so the shuffle is bounded by the date filter.

    (Reference lineitem lacks commit/receipt dates, so the late-ship
    predicate stands in for TPC-H's l_commitdate < l_receiptdate.)"""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "tpch_q7",
    oracle=f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l.l_shipdate) AS l_year, {SQL_REV} AS revenue
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7(spark, sf_dir):
    """Q7 volume shipping between a nation pair, by year. Both nation
    dims broadcast; the disjunctive pair predicate is applied after the
    dim joins so Catalyst can still push the shipdate range to the
    fact scan. Grouping keys are low-cardinality (2×2×2)."""
    s = table(spark, sf_dir, "supplier")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000).alias(
                "revenue"
            )
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "tpch_q8",
    oracle=f"""
        WITH vol AS (
          SELECT year(o.o_orderdate) AS o_year, n1.n_name AS supp_nation,
                 l.l_extendedprice * (1 - l.l_discount) AS volume
          FROM part p
          JOIN lineitem l ON p.p_partkey = l.l_partkey
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
          JOIN region r ON n2.n_regionkey = r.r_regionkey
          WHERE r.r_name = 'ASIA' AND p.p_type = 'STANDARD'
            AND o.o_orderdate >= TIMESTAMP '1996-01-01'
            AND o.o_orderdate < TIMESTAMP '1998-01-01'
        )
        SELECT o_year,
               {sql_dsum("CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END", 10000)}
                 AS nation_volume,
               {sql_dsum("volume", 10000)} AS total_volume
        FROM vol GROUP BY o_year ORDER BY o_year
    """,
)
def tpch_q8(spark, sf_dir):
    """Q8 national market share: 8-table star join — every dim
    (part-filtered, supplier, customer, nation×2, region) broadcasts
    onto the two facts; only orders⋈lineitem shuffles. Returns the
    numerator and denominator separately (exact scaled-int sums)
    instead of the ratio so the value-hash is division-free."""
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    c = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_region") == F.col("r_regionkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            "supp_nation",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
    )
    return (
        vol.groupBy("o_year")
        .agg(
            dsum(
                F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(
                    0.0
                ),
                10000,
            ).alias("nation_volume"),
            dsum(F.col("volume"), 10000).alias("total_volume"),
        )
        .orderBy("o_year")
    )


@register(
    "tpch_q12",
    oracle="""
        SELECT l.l_linestatus AS ship_group,
               count(*) FILTER (WHERE o.o_orderpriority IN ('1-URGENT','2-HIGH'))
                 AS high_line_count,
               count(*) FILTER (WHERE o.o_orderpriority NOT IN ('1-URGENT','2-HIGH'))
                 AS low_line_count
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY ship_group
        ORDER BY ship_group
    """,
)
def tpch_q12(spark, sf_dir):
    """Q12 shipping-priority split: fact-fact equi-join with the year
    filter pushed to the lineitem scan, conditional counts per group
    (l_linestatus stands in for the reference's missing l_shipmode)."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.col("l_linestatus").alias("ship_group"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_group")
    )


@register(
    "tpch_q14",
    oracle=f"""
        SELECT {sql_dsum("CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice*(1-l.l_discount) ELSE 0 END", 10000)}
                 AS promo_revenue,
               {sql_dsum("l.l_extendedprice*(1-l.l_discount)", 10000)} AS total_revenue
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
          AND l.l_shipdate < TIMESTAMP '1996-10-01'
    """,
)
def tpch_q14(spark, sf_dir):
    """Q14 promotion effect: one-month fact slice ⋈ broadcast part dim,
    conditional global agg. Numerator/denominator returned separately
    (exact scaled-int sums) so the hash is division-free."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")).agg(
        dsum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0), 10000).alias(
            "promo_revenue"
        ),
        dsum(rev, 10000).alias("total_revenue"),
    )


@register(
    "tpch_q15",
    oracle=f"""
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 {sql_dsum("l_extendedprice*(1-l_discount)", 10000)} AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
        ORDER BY s.s_suppkey
    """,
)
def tpch_q15(spark, sf_dir):
    """Q15 top supplier: quarterly per-supplier revenue, keep the max.
    The max is computed with a window over the (tiny, post-agg)
    revenue relation instead of a self-join re-scan — one pass over
    lineitem total. Exact scaled-int revenue makes the max-equality
    test deterministic (no fp ties)."""
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000).alias(
            "total_revenue"
        )
    )
    top = revenue.withColumn(
        "max_rev", F.max("total_revenue").over(Window.partitionBy())
    ).filter(F.col("total_revenue") == F.col("max_rev"))
    s = table(spark, sf_dir, "supplier")
    return (
        s.join(F.broadcast(top), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q17",
    oracle=f"""
        WITH pq AS (
          SELECT l_partkey, avg(l_quantity) AS avg_qty
          FROM lineitem GROUP BY l_partkey
        )
        SELECT {sql_dsum("l.l_extendedprice", 100)} / 7.0 AS avg_yearly,
               count(*) AS n_small
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN pq ON pq.l_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#1' AND p.p_type = 'ECONOMY'
          AND l.l_quantity < 0.5 * pq.avg_qty
    """,
)
def tpch_q17(spark, sf_dir):
    """Q17 small-quantity-order revenue: the correlated AVG subquery
    decorrelated into a pre-aggregation joined back to the fact — the
    scalable plan (one shuffle on l_partkey, no per-row subquery).
    l_quantity values are integer-valued doubles, so avg = exact
    integer sum / count and the 0.5×avg comparison is deterministic
    in both engines."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#1") & (F.col("p_type") == "ECONOMY")
    )
    pq = li.groupBy(F.col("l_partkey").alias("pq_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(pq, F.col("pq_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            (dsum(F.col("l_extendedprice"), 100) / F.lit(7.0)).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


@register(
    "tpch_q19",
    oracle=f"""
        SELECT {sql_dsum("l.l_extendedprice*(1-l.l_discount)", 10000)} AS revenue,
               count(*) AS n_lines
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 1 AND 11)
           OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
               AND l.l_quantity BETWEEN 10 AND 20)
           OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
               AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19(spark, sf_dir):
    """Q19 discounted revenue: disjunction of brand/size/quantity
    bands. Written as an equi-join on p_partkey with the OR-of-ANDs as
    a post-join filter — Catalyst keeps the equi-key hash join (no
    nested-loop), pushes the derivable p_size/l_quantity bounds, and
    broadcasts the filtered part side."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    band = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(band)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "tpch_q22",
    oracle=f"""
        WITH thresh AS (
          SELECT {sql_davg("c_acctbal", 100)} AS avg_bal
          FROM customer WHERE c_acctbal > 0.0
        )
        SELECT c.c_nationkey, count(*) AS numcust,
               {sql_dsum("c.c_acctbal", 100)} AS totacctbal
        FROM customer c, thresh t
        WHERE c.c_acctbal > t.avg_bal
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority LIKE '1-%')
        GROUP BY c.c_nationkey
        ORDER BY c.c_nationkey
    """,
)
def tpch_q22(spark, sf_dir):
    """Q22 global-sales-opportunity shape: rich customers (balance
    above the positive-balance average) with no URGENT orders, grouped
    by nation (stands in for the reference's missing phone country
    code; the urgency filter replaces bare no-orders because every
    fixture customer has at least one order at sf0.01 — the original
    spelling was a structurally-empty differential, round-4 review
    class). The scalar average is an exact scaled-int (davg)
    broadcast to every row; NOT EXISTS is a left-anti join against
    the filtered o_custkey column."""

    c = table(spark, sf_dir, "customer")
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").startswith("1-"))
        .select("o_custkey")
    )
    thresh = c.filter(F.col("c_acctbal") > 0.0).agg(
        davg(F.col("c_acctbal"), 100).alias("avg_bal")
    )
    return (
        c.join(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal"), 100).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "tpch_q13",
    oracle="""
        SELECT c_count, count(*) AS custdist
        FROM (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer
          LEFT JOIN orders ON c_custkey = o_custkey
                          AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey
        ) c_orders
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13(spark, sf_dir):
    """Q13 customer-distribution: LEFT OUTER join with an extra
    predicate in the join condition (not a post-filter — customers
    whose only orders are URGENT must still appear with count 0),
    then a second aggregation over the first's output.

    Scale shape: the first agg reduces orders to one row per
    customer; the second agg's input is |customer| rows, so the
    second shuffle is tiny. count(o_orderkey) (not count(*))
    gives 0 for the null-extended rows."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "tpch_q3",
    oracle=f"""
        SELECT l.l_orderkey, {SQL_REV} AS revenue,
               CAST(CAST(o.o_orderdate AS DATE) AS VARCHAR) AS o_orderdate,
               o.o_orderpriority
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1996-03-15'
          AND l.l_shipdate > TIMESTAMP '1996-03-15'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, o_orderdate, l.l_orderkey
        LIMIT 10
    """,
)
def tpch_q3(spark, sf_dir):
    """Q3 shipping priority: segment-filtered customers broadcast onto
    orders, date filters pushed to both fact scans, top-10 via
    TakeOrderedAndProject (no global sort materialization). The
    l_orderkey tiebreak makes the limit deterministic."""
    c = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-03-15").cast("timestamp_ntz")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp_ntz")
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").cast("string").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "tpch_q5",
    oracle=f"""
        SELECT n.n_name, {SQL_REV} AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
                        AND c.c_nationkey = s.s_nationkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n.n_name
        ORDER BY revenue DESC, n.n_name
    """,
)
def tpch_q5(spark, sf_dir):
    """Q5 local-supplier volume. The c_nationkey = s_nationkey
    equality rides INSIDE the lineitem⋈supplier join condition (the
    classic Q5 trap: as a post-filter it would be applied after a
    much larger join). supplier/nation/region broadcast; the only
    shuffles are the two fact joins."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


@register(
    "tpch_q21",
    oracle="""
        WITH lx AS (
          SELECT l_orderkey, l_suppkey, l_shipdate FROM lineitem
        ),
        last_ship AS (
          SELECT l_orderkey, max(l_shipdate) AS max_ship,
                 count(DISTINCT l_suppkey) AS n_supps
          FROM lx GROUP BY l_orderkey
        )
        SELECT s.s_name, count(*) AS numwait
        FROM lx l1
        JOIN last_ship ls ON ls.l_orderkey = l1.l_orderkey
        JOIN orders o ON o.o_orderkey = l1.l_orderkey
        JOIN supplier s ON s.s_suppkey = l1.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE o.o_orderstatus = 'F'
          AND n.n_name = 'NATION_1'
          AND ls.n_supps > 1
          AND l1.l_shipdate = ls.max_ship
          AND NOT EXISTS (
            SELECT 1 FROM lx l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate = ls.max_ship
          )
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
    """,
)
def tpch_q21(spark, sf_dir):
    """Q21 suppliers-who-kept-orders-waiting, adapted: the testdata
    has no l_commitdate/l_receiptdate, so "late" is re-expressed as
    "sole last shipper": the supplier whose line carries the order's
    max l_shipdate on a multi-supplier finished order, with no OTHER
    supplier shipping at that same date. This preserves Q21's
    defining structure — a semi-condition (another supplier exists on
    the order) and an anti-condition (no other supplier is also
    last) over lineitem self-correlations.

    Spark shape (round-5 rewrite): ZERO lineitem self-joins. A
    two-level aggregation replaces the li⋈per_order join the first
    spelling used: level 1 shuffles lineitem ONCE on
    (l_orderkey, l_shipdate) with map-side partial agg (lines,
    min/max suppkey per date); level 2 aggregates the tiny per-date
    table per order, pulling the at-max-date values with max_by
    (unambiguous — level 1 leaves exactly one row per (order, date)).
    The semi-condition "another supplier exists" becomes
    min(suppkey) != max(suppkey) over the whole order; the
    anti-condition "no other supplier also ships last" becomes
    min==max of suppkey AT the max date. Dimension sides broadcast."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")

    # push the o_orderstatus='F' restriction BELOW the wide aggregation
    # as a broadcast semi-join: it is all-or-nothing per order, so every
    # per-order aggregate is unchanged while the shuffle halves. (At
    # 100 TB the broadcast becomes a bloom/DPP-pruned join — same shape.)
    li = li.join(
        F.broadcast(o.select("o_orderkey")),
        li["l_orderkey"] == F.col("o_orderkey"),
        "leftsemi",
    )

    by_date = li.groupBy("l_orderkey", "l_shipdate").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.min("l_suppkey").alias("mn_supp"),
        F.max("l_suppkey").alias("mx_supp"),
    )
    sole = (
        by_date.groupBy("l_orderkey")
        .agg(
            # ≥2 distinct suppliers on the order ⟺ key range is non-degenerate
            (F.min("mn_supp") != F.max("mx_supp")).alias("multi_supp"),
            F.expr("max_by(n_lines, l_shipdate)").alias("n_lines_at_max"),
            F.expr("max_by(mn_supp, l_shipdate)").alias("mn_at_max"),
            F.expr("max_by(mx_supp, l_shipdate)").alias("mx_at_max"),
        )
        # sole last shipper: exactly one distinct supplier at max date
        .filter((F.col("mn_at_max") == F.col("mx_at_max")) & F.col("multi_supp"))
        .select(
            "l_orderkey",
            F.col("mn_at_max").alias("l_suppkey"),
            "n_lines_at_max",
        )
    )
    return (
        # no orders re-join: the status filter already applied via the
        # pre-aggregation semi-join and no orders column is projected
        sole.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.sum("n_lines_at_max").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )
