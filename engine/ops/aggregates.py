"""2.D — aggregations (SURVEY §2.D).

All hash aggregates with map-side partial aggregation; money math via
engine.dsl for cross-engine determinism. Group counts here are tiny
relative to input (classic high-reduction aggs), so at 100 TB these
are scan-bound: partial agg collapses each of the ~10k input tasks to
a handful of rows before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..dsl import davg, dsum, sql_davg, sql_dsum
from ..registry import register, table


@register(
    "agg_group_hash",
    oracle=f"""
        SELECT
          l_returnflag,
          l_linestatus,
          sum(l_quantity) AS sum_qty,
          {sql_dsum('l_extendedprice')} AS sum_base_price,
          {sql_dsum('l_extendedprice*(1-l_discount)', 10000)} AS sum_disc_price,
          {sql_dsum('l_extendedprice*(1-l_discount)*(1+l_tax)', 1000000)} AS sum_charge,
          avg(l_quantity) AS avg_qty,
          {sql_davg('l_extendedprice')} AS avg_price,
          {sql_davg('l_discount')} AS avg_disc,
          count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_group_hash(spark, sf_dir):
    """TPC-H Q1 pricing summary: grouped multi-aggregate.

    l_quantity is integer-valued (FIXTURES.md) so its double sum/avg is
    exact in any order; the money columns go through dsl.dsum/davg.
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000).alias(
                "sum_disc_price"
            ),
            dsum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax")),
                1000000,
            ).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
