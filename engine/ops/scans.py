"""2.A — scans, projection pruning, predicate pushdown (SURVEY §2.A).

These look trivial but they pin the physical contract that matters at
100 TB: the Parquet scan must receive the pushed filter and the pruned
column list (verified by tests/test_plans.py against the formatted
plan), so a 2-column projection never pays for an 11-column read.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import register, table


@register(
    "scan_parquet",
    oracle="SELECT count(*) AS n_rows FROM lineitem",
)
def scan_parquet(spark, sf_dir):
    """Full-table scan; count only — the scan should read zero data
    columns (count(*) is satisfied by parquet row-group metadata rows)."""
    return table(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n_rows"))


@register(
    "scan_projection",
    oracle="SELECT l_orderkey, l_quantity FROM lineitem",
)
def scan_projection(spark, sf_dir):
    """Column-pruned scan: ReadSchema must contain exactly these two."""
    return table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")


@register(
    "scan_predicate_pushdown",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_shipdate
        FROM lineitem
        WHERE l_shipdate < TIMESTAMP '1996-01-01'
    """,
)
def scan_predicate_pushdown(spark, sf_dir):
    """Filtered scan; the predicate must appear in PushedFilters."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp_ntz")
    ).select("l_orderkey", "l_linenumber", "l_shipdate")
