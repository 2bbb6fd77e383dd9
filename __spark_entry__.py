"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in :mod:`engine`; operators register themselves
into engine.registry on import (SURVEY §7 plumbing).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import engine  # noqa: E402  (registers the operator inventory)
from engine.dsl import dsum  # noqa: E402
from engine.session import apply_runtime_confs  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: revenue by region.

    Q1-shaped aggregate layered over the star-schema join path
    lineitem→orders→customer→nation→region, with the dimension tables
    broadcast (SURVEY §7 step 1).
    """
    from pyspark.sql import functions as F

    apply_runtime_confs(spark)
    sf = "/root/testdata/sf0.001"
    li = engine.table(spark, sf, "lineitem")
    o = engine.table(spark, sf, "orders")
    c = engine.table(spark, sf, "customer")
    n = engine.table(spark, sf, "nation")
    r = engine.table(spark, sf, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy("r_name")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(engine.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query id; rows-only ops are omitted."""
    return dict(engine.ORACLES)
