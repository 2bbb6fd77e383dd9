"""2.D — aggregations (SURVEY §2.D).

All hash aggregates with map-side partial aggregation; money math via
engine.dsl for cross-engine determinism. Group counts here are tiny
relative to input (classic high-reduction aggs), so at 100 TB these
are scan-bound: partial agg collapses each of the ~10k input tasks to
a handful of rows before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..dsl import davg, dsum, sql_davg, sql_dsum
from ..registry import register, table


@register(
    "agg_global",
    oracle=f"""
        SELECT
          count(*) AS n_rows,
          sum(l_quantity) AS sum_qty,
          min(l_shipdate) AS min_ship,
          max(l_shipdate) AS max_ship,
          {sql_dsum('l_extendedprice')} AS sum_price
        FROM lineitem
    """,
)
def agg_global(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("l_quantity").alias("sum_qty"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
        dsum(F.col("l_extendedprice")).alias("sum_price"),
    )


@register(
    "agg_count_distinct",
    oracle="""
        SELECT
          count(DISTINCT o_custkey) AS n_custs,
          count(DISTINCT o_orderstatus) AS n_status,
          count(DISTINCT o_orderpriority) AS n_prio
        FROM orders
    """,
)
def agg_count_distinct(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return o.agg(
        F.countDistinct("o_custkey").alias("n_custs"),
        F.countDistinct("o_orderstatus").alias("n_status"),
        F.countDistinct("o_orderpriority").alias("n_prio"),
    )


@register("agg_approx_count_distinct")  # rows-only: HLL estimate != exact oracle
def agg_approx_count_distinct(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return o.agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_custs"),
        F.countDistinct("o_custkey").alias("exact_custs"),
    )


@register("agg_approx_percentile")  # rows-only: approximate quantile sketch
def agg_approx_percentile(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    q = F.percentile_approx("value", [0.5, 0.95, 0.99])
    return e.agg(q.alias("q")).select(
        F.element_at("q", 1).alias("p50"),
        F.element_at("q", 2).alias("p95"),
        F.element_at("q", 3).alias("p99"),
    )


@register(
    "agg_stats",
    oracle="""
        SELECT
          round(stddev_samp(l_quantity), 6) AS sd_qty,
          round(var_samp(l_quantity), 6) AS var_qty,
          round(corr(l_quantity, l_discount), 6) AS corr_qty_disc,
          round(covar_samp(l_quantity, l_discount), 6) AS covar_qty_disc
        FROM lineitem
    """,
)
def agg_stats(spark, sf_dir):
    """Sample statistics; rounded to 6 dp in BOTH engines — co-moment
    merge order differs across engines, exact bits do not survive."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_discount"), 6).alias("corr_qty_disc"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias("covar_qty_disc"),
    )


@register(
    "agg_rollup",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               {sql_dsum('l_extendedprice')} AS sum_price,
               count(*) AS n
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        dsum(F.col("l_extendedprice")).alias("sum_price"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_cube",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               {sql_dsum('l_extendedprice')} AS sum_price,
               count(*) AS n
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        dsum(F.col("l_extendedprice")).alias("sum_price"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_grouping_sets",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               {sql_dsum('l_extendedprice')} AS sum_price,
               count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
)
def agg_grouping_sets(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("engine_gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               sum(CAST(round(l_extendedprice*100) AS BIGINT))/CAST(100 AS DOUBLE)
                 AS sum_price,
               count(*) AS n
        FROM engine_gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


@register(
    "agg_collect_sorted",
    oracle="""
        SELECT c_nationkey,
               COALESCE(array_to_string(list_sort(list(DISTINCT c_mktsegment)), ','), '')
                 AS segments
        FROM customer
        GROUP BY c_nationkey
    """,
)
def agg_collect_sorted(spark, sf_dir):
    """collect_set + deterministic sort, emitted as a joined string:
    the driver's canonicalizer hashes scalar cells only (array cells
    are unhashable in its pandas sort), so the array surface is
    serialized at the boundary."""
    c = table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.array_join(F.sort_array(F.collect_set("c_mktsegment")), ",").alias(
            "segments"
        )
    )


@register(
    "agg_pivot",
    oracle="""
        SELECT user_id,
               count(*) FILTER (WHERE event_type = 'click')    AS click,
               count(*) FILTER (WHERE event_type = 'error')    AS error,
               count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
               count(*) FILTER (WHERE event_type = 'signup')   AS signup,
               count(*) FILTER (WHERE event_type = 'view')     AS view
        FROM events
        GROUP BY user_id
    """,
)
def agg_pivot(spark, sf_dir):
    """Pivot with an explicit value list (no extra pass to discover
    values — mandatory at scale) and 0-fill to match conditional-count
    semantics."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
        .na.fill(0)
    )


@register(
    "agg_having",
    oracle=f"""
        SELECT o_custkey, count(*) AS n_orders,
               {sql_dsum('o_totalprice')} AS total_spend
        FROM orders
        GROUP BY o_custkey
        HAVING count(*) >= 15
    """,
)
def agg_having(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("total_spend"),
        )
        .filter(F.col("n_orders") >= 15)
    )


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


@register(
    "agg_median_mode",
    oracle="""
        SELECT event_type,
               median(value) AS med_value,
               min(value) AS min_value,
               count(*) AS n
        FROM events GROUP BY event_type
    """,
)
def agg_median_mode(spark, sf_dir):
    """Exact median per group (interpolated at even counts identically
    by both engines: mean of the two middle doubles)."""
    e = table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.median("value").alias("med_value"),
        F.min("value").alias("min_value"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "rollup_timeseries",
    oracle="""
        SELECT date_trunc('day', ts) AS d, date_trunc('hour', ts) AS h,
               event_type, count(*) AS n,
               sum(CAST(round(value*10000) AS BIGINT))/10000.0 AS sum_value
        FROM events
        GROUP BY GROUPING SETS (
          (date_trunc('day', ts), event_type),
          (date_trunc('day', ts), date_trunc('hour', ts), event_type)
        )
    """,
)
def rollup_timeseries(spark, sf_dir):
    """Hypertable-style multi-granularity rollup: daily and hourly
    pre-aggregates per event_type materialized in ONE pass via grouping
    sets (one shuffle instead of one per granularity) — the continuous-
    aggregate pattern a log store maintains so dashboards never scan
    raw events."""
    e = table(spark, sf_dir, "events")
    e.createOrReplaceTempView("v_events_rts")
    return spark.sql(
        """
        SELECT date_trunc('DAY', ts) AS d, date_trunc('HOUR', ts) AS h,
               event_type, count(*) AS n,
               sum(CAST(round(value*10000) AS BIGINT))/CAST(10000 AS DOUBLE)
                 AS sum_value
        FROM v_events_rts
        GROUP BY GROUPING SETS (
          (date_trunc('DAY', ts), event_type),
          (date_trunc('DAY', ts), date_trunc('HOUR', ts), event_type)
        )
        """
    )


@register("agg_hll_sketch_merge")  # rows-only: sketch estimates are approximate
def agg_hll_sketch_merge(spark, sf_dir):
    """Mergeable distinct-count sketches — the re-aggregatable rollup
    pattern: per-event_type HLL sketches built in one pass, then UNIONED
    (not recomputed) into a global estimate. At 100 TB this is how
    per-partition/per-day distinct counts roll up to any grain without
    touching raw data again. Property-tested against exact counts
    (tests/test_llm_ops.py)."""
    e = table(spark, sf_dir, "events")
    per_type = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    per_type_est = per_type.select(
        "event_type",
        F.hll_sketch_estimate("sk").alias("est_users"),
        "exact_users",
    )
    total = per_type.agg(
        F.lit("__ALL__").alias("event_type"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users"),
        F.lit(None).cast("long").alias("exact_users"),
    )
    return per_type_est.unionByName(total)


@register(
    "agg_unpivot",
    oracle="""
        WITH agg AS (
          SELECT user_id, min(value) AS min_v, max(value) AS max_v,
                 count(*) * 1.0 AS n_v
          FROM events GROUP BY user_id
        )
        SELECT * FROM agg UNPIVOT (metric_value FOR metric IN (min_v, max_v, n_v))
    """,
)
def agg_unpivot(spark, sf_dir):
    """Unpivot (melt): wide per-user metrics → (user_id, metric, value)
    long form — the inverse of agg_pivot, the shape feature stores and
    metric sinks want. Narrow-side casts keep one value type (double)."""
    e = table(spark, sf_dir, "events")
    wide = e.groupBy("user_id").agg(
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
        (F.count(F.lit(1)) * 1.0).alias("n_v"),
    )
    return wide.unpivot(
        ["user_id"], ["min_v", "max_v", "n_v"], "metric", "metric_value"
    )


@register(
    "agg_percentile_exact",
    oracle="""
        SELECT event_type,
               round(quantile_cont(value, 0.25), 6) AS q25,
               round(quantile_cont(value, 0.50), 6) AS q50,
               round(quantile_cont(value, 0.75), 6) AS q75
        FROM events GROUP BY event_type
    """,
)
def agg_percentile_exact(spark, sf_dir):
    """Exact continuous percentiles per group (vs the approximate
    sketch in agg_approx_percentile). Rounded to 6 dp on both sides:
    the interpolation formulas differ in fp rounding ((1-f)a+fb vs
    a+f(b-a)) by at most an ulp."""
    e = table(spark, sf_dir, "events")
    pct = F.percentile("value", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    return e.groupBy("event_type").agg(
        F.round(F.element_at(pct, 1), 6).alias("q25"),
        F.round(F.element_at(pct, 2), 6).alias("q50"),
        F.round(F.element_at(pct, 3), 6).alias("q75"),
    )


@register(
    "stat_crosstab",
    oracle="""
        SELECT event_type AS event_type_bucket,
               count(*) FILTER (user_id % 3 = 0) AS "0",
               count(*) FILTER (user_id % 3 = 1) AS "1",
               count(*) FILTER (user_id % 3 = 2) AS "2"
        FROM events GROUP BY event_type
    """,
)
def stat_crosstab(spark, sf_dir):
    """Contingency table via df.stat.crosstab — pairwise frequency
    counts with one categorical pivoted into columns."""
    e = table(spark, sf_dir, "events").withColumn(
        "bucket", F.pmod(F.col("user_id"), F.lit(3))
    )
    return e.stat.crosstab("event_type", "bucket")


@register(
    "agg_bool_bit",
    oracle="""
        SELECT event_type,
               bool_and(value > 0) AS all_positive,
               bool_or(value > 100) AS any_large,
               bit_and(CAST(user_id AS BIGINT)) AS uid_bit_and,
               bit_or(CAST(user_id AS BIGINT)) AS uid_bit_or,
               bit_xor(CAST(user_id AS BIGINT)) AS uid_bit_xor
        FROM events GROUP BY event_type
    """,
)
def agg_bool_bit(spark, sf_dir):
    """Boolean and bitwise aggregates (every/some, bit_and/or/xor) —
    all order-insensitive, so exact cross-engine parity."""
    e = table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.every(F.col("value") > 0).alias("all_positive"),
        F.some(F.col("value") > 100).alias("any_large"),
        F.bit_and("user_id").alias("uid_bit_and"),
        F.bit_or("user_id").alias("uid_bit_or"),
        F.bit_xor("user_id").alias("uid_bit_xor"),
    )


@register("stat_freq_items")  # rows-only: approximate single-pass sketch
def stat_freq_items(spark, sf_dir):
    """Approximate heavy hitters via df.stat.freqItems (single-pass
    Karp-Shenker-Papadimitriou): all items with frequency above the
    support threshold are guaranteed present (false positives allowed,
    no false negatives) — the mergeable one-pass alternative to an
    exact groupBy count at 100 TB. Property-tested: every event_type
    above support must appear."""
    e = table(spark, sf_dir, "events")
    freq = e.stat.freqItems(["event_type", "user_id"], support=0.1)
    # serialize the sketch arrays: scalar cells only at the driver
    # comparison boundary (rows-only check still canonicalizes).
    return freq.select(
        F.array_join(
            F.sort_array(F.col("event_type_freqItems")), ","
        ).alias("event_type_freqitems"),
        F.array_join(
            F.sort_array(F.transform(F.col("user_id_freqItems"), lambda x: x.cast("string"))),
            ",",
        ).alias("user_id_freqitems"),
    )


@register(
    "agg_value_histogram",
    oracle="""
        SELECT least(greatest(CAST(floor(value / 50) AS BIGINT), 0), 9) AS bucket,
               count(*) AS n,
               round(min(value), 2) AS lo, round(max(value), 2) AS hi
        FROM events GROUP BY 1
    """,
)
def agg_value_histogram(spark, sf_dir):
    """Fixed-width histogram (10 buckets of 50, clamped): the
    one-shuffle distributed histogram; bucket edges are pure arithmetic
    so the map side pre-aggregates everything."""
    e = table(spark, sf_dir, "events")
    bucket = F.least(
        F.greatest(F.floor(F.col("value") / 50).cast("long"), F.lit(0)), F.lit(9)
    )
    return (
        e.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 2).alias("lo"),
            F.round(F.max("value"), 2).alias("hi"),
        )
    )


@register(
    "upsert_latest_wins",
    oracle="""
        WITH ranked AS (
          SELECT user_id, event_type, ts, event_id, value,
                 row_number() OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events
        )
        SELECT user_id, event_type, event_id AS last_event_id,
               ts AS last_ts, value AS last_value
        FROM ranked WHERE rn = 1
    """,
)
def upsert_latest_wins(spark, sf_dir):
    """Changelog compaction (SCD type-1 / log-compaction semantics):
    treat events as an upsert stream keyed by (user_id, event_type)
    and keep only the latest version, ties broken by event_id so the
    winner is unique. This is the batch MERGE-equivalent an engine
    without a table format expresses directly; at 100 TB it is one
    hash-partitioned window per key — Spark's WindowGroupLimit pushes
    the rn=1 filter into a partial top-1 per map task, so the shuffle
    carries one candidate row per (key, task), not the full history."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        e.select("user_id", "event_type", "ts", "event_id", "value")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("last_event_id"),
            F.col("ts").alias("last_ts"),
            F.col("value").alias("last_value"),
        )
    )


@register(
    "agg_retention_cohort",
    oracle="""
        WITH cohort AS (
          SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
          FROM events GROUP BY user_id
        )
        SELECT CAST(c.cohort_day AS VARCHAR) AS cohort_day,
               CAST(floor(date_diff('day', c.cohort_day, CAST(e.ts AS DATE)) / 7)
                    AS BIGINT) AS week_offset,
               count(DISTINCT e.user_id) AS active_users
        FROM events e JOIN cohort c USING (user_id)
        GROUP BY 1, 2
    """,
)
def agg_retention_cohort(spark, sf_dir):
    """Cohort retention matrix: users bucketed by first-activity day,
    counted distinct per (cohort, weeks-since-cohort). The classic
    product-analytics rollup. Two shuffles total: the per-user min
    (map-side combinable) and the final grouped distinct; the cohort
    table is per-user-sized but joins on the same user_id key the
    events already hash by, and floor() is explicit because DuckDB
    rounds double→int casts while Spark truncates."""
    e = table(spark, sf_dir, "events")
    cohort = e.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("cohort_day")
    )
    return (
        e.join(cohort, "user_id")
        .select(
            "cohort_day",
            F.floor(
                F.datediff(F.col("ts").cast("date"), F.col("cohort_day")) / 7
            ).alias("week_offset"),
            "user_id",
        )
        .groupBy(
            F.col("cohort_day").cast("string").alias("cohort_day"),
            "week_offset",
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


@register(
    "agg_max_by_min_by",
    oracle="""
        SELECT o_orderpriority,
               arg_max(o_orderkey,
                       CAST(round(o_totalprice*100) AS BIGINT) * 10000000000
                       + o_orderkey) AS top_orderkey,
               arg_min(o_orderkey,
                       CAST(round(o_totalprice*100) AS BIGINT) * 10000000000
                       + o_orderkey) AS bottom_orderkey,
               count(*) AS n_orders
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
)
def agg_max_by_min_by(spark, sf_dir):
    """max_by/min_by (argmax aggregates): the order id carrying each
    priority class's highest/lowest total price — one pass, no window,
    no join-back. The ordering key packs exact cents and the unique
    orderkey into one BIGINT ((priority,totalprice) ties DO occur in
    the data) so both engines break ties identically."""
    o = table(spark, sf_dir, "orders")
    key = (
        F.round(F.col("o_totalprice") * 100).cast("long") * F.lit(10000000000)
        + F.col("o_orderkey")
    )
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.max_by("o_orderkey", key).alias("top_orderkey"),
            F.min_by("o_orderkey", key).alias("bottom_orderkey"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "orders_rfm_segmentation",
    oracle="""
        WITH rfm AS (
          SELECT o_custkey AS c_custkey,
                 date_diff('day', max(o_orderdate), TIMESTAMP '2001-09-01')
                   AS recency_days,
                 count(*) AS frequency,
                 sum(CAST(round(o_totalprice*100) AS BIGINT))/100.0 AS monetary
          FROM orders GROUP BY o_custkey
        )
        SELECT c_custkey, recency_days, frequency, monetary,
               ntile(5) OVER (ORDER BY recency_days DESC, c_custkey) AS r_score,
               ntile(5) OVER (ORDER BY frequency, c_custkey) AS f_score,
               ntile(5) OVER (ORDER BY monetary, c_custkey) AS m_score
        FROM rfm
        ORDER BY c_custkey
    """,
)
def orders_rfm_segmentation(spark, sf_dir):
    """RFM customer segmentation: recency / frequency / monetary per
    customer, each quintile-scored with ntile (higher = better). The
    windows are global but run over the POST-AGG one-row-per-customer
    relation, not the fact table; at true scale the global sorts
    become range-partitioned exchanges. Unique c_custkey tiebreak in
    every ntile ordering keeps quintile boundaries deterministic;
    monetary is an exact cents sum."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    rfm = o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.datediff(
            F.lit("2001-09-01").cast("timestamp_ntz").cast("date"),
            F.max("o_orderdate").cast("date"),
        ).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        dsum(F.col("o_totalprice"), 100).alias("monetary"),
    )
    return rfm.select(
        "c_custkey",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(5)
        .over(Window.orderBy(F.desc("recency_days"), F.asc("c_custkey")))
        .alias("r_score"),
        F.ntile(5)
        .over(Window.orderBy(F.asc("frequency"), F.asc("c_custkey")))
        .alias("f_score"),
        F.ntile(5)
        .over(Window.orderBy(F.asc("monetary"), F.asc("c_custkey")))
        .alias("m_score"),
    ).orderBy("c_custkey")


@register(
    "events_anomaly_mad",
    oracle="""
        WITH med AS (
          SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med
          FROM events GROUP BY event_type
        ),
        dev AS (
          SELECT e.event_id, e.event_type, e.value, m.med,
                 abs(e.value - m.med) AS dev
          FROM events e JOIN med m USING (event_type)
        ),
        mad AS (
          SELECT event_type, round(quantile_cont(dev, 0.5), 6) AS mad
          FROM dev GROUP BY event_type
        )
        SELECT d.event_id, d.event_type, d.value, d.med, a.mad
        FROM dev d JOIN mad a USING (event_type)
        WHERE d.dev > 3.5 * a.mad
        ORDER BY d.event_id
    """,
)
def events_anomaly_mad(spark, sf_dir):
    """Robust outlier detection via median absolute deviation — the
    median/MAD analogue of flow_zscore_anomaly, immune to the outliers
    it hunts. Two grouped exact medians with broadcast join-backs (the
    per-type stats are dim-sized at any scale).

    Both medians are rounded to 6 dp BEFORE any downstream arithmetic
    so the interpolation-ulp divergence between engines can't flip the
    3.5×MAD comparison."""
    e = table(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("med")
    )
    dev = e.join(F.broadcast(med), "event_type").withColumn(
        "dev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.round(F.percentile("dev", F.lit(0.5)), 6).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("dev") > 3.5 * F.col("mad"))
        .select("event_id", "event_type", "value", "med", "mad")
        .orderBy("event_id")
    )


@register(
    "agg_grouping_id",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               GROUPING(l_returnflag) AS g_flag,
               GROUPING(l_linestatus) AS g_status,
               count(*) AS n
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def agg_grouping_id(spark, sf_dir):
    """GROUPING() markers on a rollup — distinguishes 'NULL because
    subtotal row' from 'NULL in the data', which agg_rollup alone
    cannot. grouping() returns tinyint in Spark vs int in DuckDB;
    cast explicitly."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "l_returnflag", "l_linestatus", "g_flag", "g_status", "n"
        )
        .orderBy(
            F.asc_nulls_first("l_returnflag"), F.asc_nulls_first("l_linestatus")
        )
    )


@register(
    "agg_string_concat",
    oracle="""
        SELECT lang,
               string_agg(DISTINCT source, ',' ORDER BY source) AS sources
        FROM documents
        GROUP BY lang
        ORDER BY lang
    """,
)
def agg_string_concat(spark, sf_dir):
    """Ordered string aggregation (LISTAGG/string_agg): distinct
    sources per language as one comma-joined, lexically-sorted string.
    Spark spelling: collect_set → sort_array → concat_ws (the sort
    makes the concatenation order — and the hash — deterministic)."""
    d = table(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.concat_ws(
                ",", F.sort_array(F.collect_set("source"))
            ).alias("sources")
        )
        .orderBy("lang")
    )


@register(
    "agg_bitmap_distinct",
    oracle="""
        SELECT event_type, count(DISTINCT user_id) AS n_users
        FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def agg_bitmap_distinct(spark, sf_dir):
    """EXACT distinct counting via mergeable bitmaps (Spark 3.5
    bitmap_* family): per (event_type, bucket) partial bitmaps are
    OR-merged, then popcounted — same answer as count(DISTINCT) but
    the partials are re-aggregatable, which is how exact distinct
    rolls up across partitions/days at 100 TB without re-scanning
    (count(DISTINCT) partials are not mergeable; sketches are but
    approximate). The oracle is plain count(DISTINCT)."""
    e = table(spark, sf_dir, "events")
    partial = (
        e.select(
            "event_type",
            F.bitmap_bucket_number("user_id").alias("bucket"),
            F.bitmap_bit_position("user_id").alias("pos"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.bitmap_construct_agg("pos").alias("bm"))
    )
    return (
        partial.groupBy("event_type")
        .agg(F.sum(F.bitmap_count("bm")).alias("n_users"))
        .orderBy("event_type")
    )


@register(
    "agg_count_if_filter",
    oracle="""
        SELECT event_type,
               count(*) FILTER (WHERE value > 250.0) AS n_big,
               count(*) FILTER (WHERE value <= 250.0) AS n_small,
               sum(CAST(round(value*100) AS BIGINT)) FILTER (WHERE event_type = 'purchase')
                 / 100.0 AS purchase_value,
               count(DISTINCT user_id) FILTER (WHERE value > 400.0) AS big_spenders
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
)
def agg_count_if_filter(spark, sf_dir):
    """Conditional aggregation — the FILTER-clause surface. Spark
    expresses it as count_if / when-guarded sums; both forms compile
    to the same partial+final hash aggregate, so one pass over the
    input computes every conditional branch (no per-condition
    re-scan). sum FILTER over an empty group yields NULL in both
    engines (the non-purchase rows)."""
    e = table(spark, sf_dir, "events")
    big = F.col("value") > 250.0
    return (
        e.groupBy("event_type")
        .agg(
            F.count_if(big).alias("n_big"),
            F.count_if(~big).alias("n_small"),
            (
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        F.round(F.col("value") * 100.0).cast("long"),
                    )
                )
                / 100.0
            ).alias("purchase_value"),
            F.count_distinct(
                F.when(F.col("value") > 400.0, F.col("user_id"))
            ).alias("big_spenders"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_central_moments",
    oracle="""
        WITH s AS (
          SELECT event_type, CAST(round(value*100) AS BIGINT) AS v
          FROM events
        ), m AS (
          SELECT event_type,
                 count(*) AS n,
                 CAST(sum(CAST(v AS HUGEINT)) AS DOUBLE) AS s1,
                 CAST(sum(CAST(v AS HUGEINT)*v) AS DOUBLE) AS s2,
                 CAST(sum(CAST(v AS HUGEINT)*v*v) AS DOUBLE) AS s3,
                 CAST(sum(CAST(v AS HUGEINT)*v*v*v) AS DOUBLE) AS s4
          FROM s GROUP BY event_type
        )
        SELECT event_type, n,
               round(s1/n/100.0, 6) AS mean_value,
               round((s2/n - (s1/n)*(s1/n)) / 10000.0, 6) AS var_pop,
               round((s3/n - 3*(s1/n)*(s2/n) + 2*(s1/n)*(s1/n)*(s1/n))
                     / ((s2/n - (s1/n)*(s1/n)) * sqrt(s2/n - (s1/n)*(s1/n))), 6)
                 AS skewness,
               round((s4/n - 4*(s1/n)*(s3/n) + 6*(s1/n)*(s1/n)*(s2/n)
                      - 3*(s1/n)*(s1/n)*(s1/n)*(s1/n))
                     / ((s2/n - (s1/n)*(s1/n)) * (s2/n - (s1/n)*(s1/n))) - 3.0, 6)
                 AS kurtosis,
               round(sqrt(s2/n - (s1/n)*(s1/n)) / (s1/n), 6) AS cv
        FROM m
        ORDER BY event_type
    """,
)
def agg_central_moments(spark, sf_dir):
    """Exact grouped skewness/kurtosis/CV from integer power sums.

    Built-in skewness()/kurtosis() accumulate doubles in
    shuffle-fetch order (non-deterministic last-ulp), so instead the
    four raw power sums are taken over the exactly-recovered scaled
    integer (value is 2-dp, FIXTURES.md): every per-row power v^4 <
    5.8e18 fits a long, and the SUM runs in decimal(38,0) (Spark) /
    HUGEINT (DuckDB) — overflow-free and exact at any scale. The
    double-precision moment formulas then see bit-identical inputs
    and run the identical expression tree on both engines (sqrt, not
    pow(x,1.5): sqrt is IEEE-correctly-rounded, pow is not).
    Skewness/kurtosis are scale-invariant so the *100 encoding
    cancels; mean/variance divide it back out. One map-side-combined
    shuffle; 6-dp rounding guards the final transcendental-free ops."""
    e = table(spark, sf_dir, "events")
    # Per-row powers run in DECIMAL, not long: v^4 already exceeds
    # int64 at v = 56021 (sf0.1's max 560.21), and the session is
    # ANSI so the overflow is an error, not a wrap. decimal(10,0)
    # factors grow to ≤ decimal(38,0) products — exact.
    v = F.round(F.col("value") * 100.0).cast("long")
    s = e.select("event_type", v.cast("decimal(10,0)").alias("v"))
    vd = F.col("v")
    m = s.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(vd).alias("h1"),
        F.sum(vd * vd).alias("h2"),
        F.sum(vd * vd * vd).alias("h3"),
        F.sum(vd * vd * vd * vd).alias("h4"),
    )
    s1 = F.col("h1").cast("double")
    s2 = F.col("h2").cast("double")
    s3 = F.col("h3").cast("double")
    s4 = F.col("h4").cast("double")
    n = F.col("n")
    mean = s1 / n
    m2 = s2 / n - mean * mean
    m3 = s3 / n - F.lit(3.0) * mean * (s2 / n) + F.lit(2.0) * mean * mean * mean
    m4 = (
        s4 / n
        - F.lit(4.0) * mean * (s3 / n)
        + F.lit(6.0) * mean * mean * (s2 / n)
        - F.lit(3.0) * mean * mean * mean * mean
    )
    return m.select(
        "event_type",
        "n",
        F.round(mean / 100.0, 6).alias("mean_value"),
        F.round(m2 / 10000.0, 6).alias("var_pop"),
        F.round(m3 / (m2 * F.sqrt(m2)), 6).alias("skewness"),
        F.round(m4 / (m2 * m2) - 3.0, 6).alias("kurtosis"),
        F.round(F.sqrt(m2) / mean, 6).alias("cv"),
    ).orderBy("event_type")


@register(
    "ts_time_bucket",
    oracle="""
        WITH b AS (
          SELECT CAST(to_timestamp((epoch_ns(ts) // 1000000000) // 900 * 900)
                      AS TIMESTAMP) AS bucket_start,
                 event_type, user_id,
                 CAST(round(value*100) AS BIGINT) AS cents
          FROM events
        )
        SELECT CAST(bucket_start AS VARCHAR) AS bucket_start, event_type,
               count(*) AS n_events,
               count(DISTINCT user_id) AS n_users,
               sum(cents)/100.0 AS total_value
        FROM b
        GROUP BY bucket_start, event_type
        ORDER BY bucket_start, event_type
        LIMIT 4000
    """,
)
def ts_time_bucket(spark, sf_dir):
    """Arbitrary-width time bucketing (TimescaleDB time_bucket /
    ClickHouse toStartOfInterval): 15-minute buckets via exact
    integer epoch arithmetic — floor-divide seconds by the width.
    Complements stream_tumbling_window (window() is restricted to
    the streaming-compatible windowing API; epoch math composes
    with any expression and buckets of any anchor/width, e.g.
    week-anchored or 90-s buckets). Rendered as VARCHAR on both
    sides to sidestep pandas date64 unit skew. One
    map-side-combined shuffle keyed on (bucket, type)."""
    e = table(spark, sf_dir, "events")
    secs = (F.unix_micros(F.col("ts").cast("timestamp")) / 1000000).cast(
        "long"
    )
    bucket = F.timestamp_seconds(F.floor(secs / 900) * 900).cast(
        "timestamp_ntz"
    )
    return (
        e.select(
            bucket.cast("string").alias("bucket_start"),
            "event_type",
            "user_id",
            F.round(F.col("value") * 100.0).cast("long").alias("cents"),
        )
        .groupBy("bucket_start", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            (F.sum("cents") / 100.0).alias("total_value"),
        )
        .orderBy("bucket_start", "event_type")
        .limit(4000)
    )


@register(
    "agg_geomean",
    oracle="""
        WITH q AS (
          SELECT l_returnflag,
                 CAST(round(ln(l_quantity) * 1000000) AS BIGINT) AS lnq_u
          FROM lineitem
          WHERE l_quantity > 0
        )
        SELECT l_returnflag,
               count(*) AS n,
               round(exp(CAST(sum(lnq_u) AS DOUBLE) / count(*) / 1000000.0), 4)
                 AS geomean_qty
        FROM q
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
)
def agg_geomean(spark, sf_dir):
    """Grouped geometric mean — exp(mean(ln x)), the right average
    for ratio-like quantities. A naive double sum of ln() values is
    order-dependent AND libm-vs-JVM divergent; instead each row's
    ln is rounded once to 6 dp and scaled to an exact integer, so
    the sum is associative and bit-stable under any merge order,
    and the single exp() at the end (one call per GROUP, not per
    row) is rounded to 4 dp to absorb the last-ulp exp difference
    between engines. Same one-shuffle partial-agg shape as any
    grouped sum."""
    li = table(spark, sf_dir, "lineitem")
    lnq_u = F.round(F.log(F.col("l_quantity")) * 1000000.0).cast("long")
    return (
        li.filter(F.col("l_quantity") > 0)
        .select("l_returnflag", lnq_u.alias("lnq_u"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.exp(
                    F.sum("lnq_u").cast("double")
                    / F.count(F.lit(1))
                    / 1000000.0
                ),
                4,
            ).alias("geomean_qty"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_weighted_avg",
    oracle="""
        SELECT l_returnflag,
               sum(CAST(round(l_extendedprice*100) AS BIGINT)
                   * CAST(round(l_quantity) AS BIGINT))
                 / CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE)
                 / 100.0 AS wavg_price,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
                 AS total_qty
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
)
def agg_weighted_avg(spark, sf_dir):
    """Quantity-weighted average price — the aggregation SQL's plain
    avg() can't express. Both the weighted numerator and the weight
    sum are exact integer arithmetic (price is 2-dp, quantity
    integer-valued; products ≤ 6e10 per row, far inside int64), so
    any shuffle merge order yields the same bits; one double
    division at the end. Same single partial+final hash-agg shape
    as an unweighted mean."""
    li = table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100.0).cast("long")
    qty = F.round(F.col("l_quantity")).cast("long")
    return (
        li.groupBy("l_returnflag")
        .agg(
            (
                F.sum(cents * qty) / F.sum(qty).cast("double") / 100.0
            ).alias("wavg_price"),
            F.sum(qty).cast("long").alias("total_qty"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "events_dau_stickiness",
    oracle="""
        WITH d AS (
          SELECT CAST(ts AS DATE) AS day,
                 CAST(week(ts) AS BIGINT) AS iso_week,
                 user_id
          FROM events
        ), dau AS (
          SELECT day, any_value(iso_week) AS iso_week,
                 count(DISTINCT user_id) AS dau
          FROM d GROUP BY day
        ), wau AS (
          SELECT iso_week, count(DISTINCT user_id) AS wau
          FROM d GROUP BY iso_week
        )
        SELECT CAST(dau.day AS VARCHAR) AS day, dau.dau, wau.wau,
               round(CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE), 6)
                 AS stickiness
        FROM dau JOIN wau ON dau.iso_week = wau.iso_week
        ORDER BY day
    """,
)
def events_dau_stickiness(spark, sf_dir):
    """DAU/WAU stickiness: daily and ISO-week distinct actives joined
    on the week — the engagement ratio every product-analytics
    deployment computes. Two distinct-aggs over the same scan (both
    map-side partial), then a broadcast join of the week-cardinality
    relation back onto days. A day's week is recovered with
    any_value (all rows in a day share the ISO week) rather than a
    re-derivation in the join key."""
    e = table(spark, sf_dir, "events")
    d = e.select(
        F.col("ts").cast("date").alias("day"),
        F.weekofyear("ts").cast("long").alias("iso_week"),
        "user_id",
    )
    dau = d.groupBy("day").agg(
        F.any_value("iso_week").alias("iso_week"),
        F.count_distinct("user_id").alias("dau"),
    )
    wau = d.groupBy("iso_week").agg(F.count_distinct("user_id").alias("wau"))
    return (
        dau.join(F.broadcast(wau), "iso_week")
        .select(
            F.col("day").cast("string").alias("day"),
            "dau",
            "wau",
            F.round(
                F.col("dau").cast("double") / F.col("wau").cast("double"), 6
            ).alias("stickiness"),
        )
        .orderBy("day")
    )


@register(
    "agg_corr_exact",
    oracle="""
        WITH s AS (
          SELECT l_returnflag,
                 CAST(round(l_quantity) AS BIGINT) AS q,
                 CAST(round(l_discount*100) AS BIGINT) AS d
          FROM lineitem
        ), m AS (
          SELECT l_returnflag, count(*) AS n,
                 CAST(sum(q) AS DOUBLE) AS sq, CAST(sum(d) AS DOUBLE) AS sd,
                 CAST(sum(q*q) AS DOUBLE) AS sqq,
                 CAST(sum(d*d) AS DOUBLE) AS sdd,
                 CAST(sum(q*d) AS DOUBLE) AS sqd
          FROM s GROUP BY l_returnflag
        )
        SELECT l_returnflag, n,
               round((sqd/n - (sq/n)*(sd/n))
                     / (sqrt(sqq/n - (sq/n)*(sq/n))
                        * sqrt(sdd/n - (sd/n)*(sd/n))), 6) AS corr_qty_disc
        FROM m
        ORDER BY l_returnflag
    """,
)
def agg_corr_exact(spark, sf_dir):
    """GROUPED Pearson correlation from exact integer co-moment sums
    — the built-in corr() accumulates doubles in merge order (hence
    agg_stats rounds a global value); this form keeps every sum
    exact integer arithmetic (quantity ≤ 50, discount-cents ≤ 10:
    products are tiny), so per-GROUP correlations are bit-stable at
    any parallelism, and the double formula runs identically on
    both engines (sqrt, not pow). One map-side-combined shuffle."""
    li = table(spark, sf_dir, "lineitem")
    q = F.round(F.col("l_quantity")).cast("long")
    d = F.round(F.col("l_discount") * 100.0).cast("long")
    s = li.select("l_returnflag", q.alias("q"), d.alias("d"))
    m = s.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").cast("double").alias("sq"),
        F.sum("d").cast("double").alias("sd"),
        F.sum(F.col("q") * F.col("q")).cast("double").alias("sqq"),
        F.sum(F.col("d") * F.col("d")).cast("double").alias("sdd"),
        F.sum(F.col("q") * F.col("d")).cast("double").alias("sqd"),
    )
    n = F.col("n")
    mq = F.col("sq") / n
    md = F.col("sd") / n
    corr = (F.col("sqd") / n - mq * md) / (
        F.sqrt(F.col("sqq") / n - mq * mq) * F.sqrt(F.col("sdd") / n - md * md)
    )
    return m.select(
        "l_returnflag", "n", F.round(corr, 6).alias("corr_qty_disc")
    ).orderBy("l_returnflag")


@register(
    "events_seasonality_matrix",
    oracle="""
        SELECT CAST(isodow(ts) - 1 AS BIGINT) AS weekday_mon0,
               CAST(hour(ts) AS BIGINT) AS hr,
               count(*) AS n_events,
               count(DISTINCT user_id) AS n_users,
               sum(CAST(round(value*100) AS BIGINT))/100.0 AS total_value
        FROM events
        GROUP BY weekday_mon0, hr
        ORDER BY weekday_mon0, hr
    """,
)
def events_seasonality_matrix(spark, sf_dir):
    """Hour-of-day × day-of-week activity heatmap — the seasonality
    profile behind capacity planning and anomaly baselines (compare
    an hour against its weekday-hour cell, not the global mean).
    168 output cells regardless of input size: the canonical
    high-reduction aggregate where map-side partials collapse
    each scan task to ≤168 rows before the single tiny shuffle."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.weekday("ts").cast("long").alias("weekday_mon0"),
            F.hour("ts").cast("long").alias("hr"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            (
                F.sum(F.round(F.col("value") * 100.0).cast("long")) / 100.0
            ).alias("total_value"),
        )
        .orderBy("weekday_mon0", "hr")
    )


@register(
    "orders_pareto_customers",
    oracle="""
        WITH spend AS (
          SELECT o_custkey,
                 sum(CAST(round(o_totalprice*100) AS BIGINT)) AS cents
          FROM orders GROUP BY o_custkey
        ), tot AS (SELECT sum(cents) AS total_cents FROM spend),
        ranked AS (
          SELECT o_custkey, cents,
                 sum(cents) OVER (ORDER BY cents DESC, o_custkey
                                  ROWS UNBOUNDED PRECEDING) AS cum_cents,
                 row_number() OVER (ORDER BY cents DESC, o_custkey) AS rnk
          FROM spend
        )
        SELECT rnk, o_custkey, cents/100.0 AS spend,
               round(CAST(cum_cents AS DOUBLE)/CAST(total_cents AS DOUBLE), 6)
                 AS cum_share
        FROM ranked, tot
        WHERE CAST(cum_cents AS DOUBLE)/CAST(total_cents AS DOUBLE) <= 0.5
        ORDER BY rnk
    """,
)
def orders_pareto_customers(spark, sf_dir):
    """Pareto concentration: the smallest set of customers covering
    half of total revenue (the 80/20 diagnostic). Revenue ranks and
    the running share are windows over the POST-AGG per-customer
    relation (|customers| rows, not |orders|); integer cents keep
    the running sum exact so the 0.5 cutoff is tie-free and
    identical on both engines. The unpartitioned window is the one
    intentionally serial step — it consumes the reduced relation,
    the same shape as text_zipf_rank's rank pass."""
    o = table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100.0).cast("long")).alias(
            "cents"
        )
    )
    tot = spend.agg(F.sum("cents").alias("total_cents"))
    w = Window.orderBy(F.desc("cents"), F.asc("o_custkey"))
    ranked = spend.select(
        "o_custkey",
        "cents",
        F.sum("cents")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum_cents"),
        F.row_number().over(w).cast("long").alias("rnk"),
    )
    share = F.col("cum_cents").cast("double") / F.col("total_cents").cast(
        "double"
    )
    return (
        ranked.join(F.broadcast(tot))
        .filter(share <= 0.5)
        .select(
            "rnk",
            "o_custkey",
            (F.col("cents") / 100.0).alias("spend"),
            F.round(share, 6).alias("cum_share"),
        )
        .orderBy("rnk")
    )


@register(
    "events_welch_ttest",
    oracle="""
        WITH q AS (
          SELECT CAST(ts AS DATE) AS day, event_type,
                 CAST(round(value * 10000) AS BIGINT) AS v
          FROM events WHERE event_type IN ('purchase', 'click')
        ),
        s AS (
          SELECT day,
                 count(*) FILTER (WHERE event_type = 'purchase') AS na,
                 CAST(sum(v) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS sa,
                 CAST(sum(v * v) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS qa,
                 count(*) FILTER (WHERE event_type = 'click') AS nb,
                 CAST(sum(v) FILTER (WHERE event_type = 'click') AS BIGINT) AS sb,
                 CAST(sum(v * v) FILTER (WHERE event_type = 'click') AS BIGINT) AS qb
          FROM q GROUP BY day
        )
        SELECT CAST(day AS VARCHAR) AS day, na, nb,
               round(((CAST(sa AS DOUBLE) / na) - (CAST(sb AS DOUBLE) / nb))
                     / sqrt(((CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / na) / (na - 1)) / na
                          + ((CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) / nb) / (nb - 1)) / nb),
                     6) AS t_stat
        FROM s
        WHERE na >= 2 AND nb >= 2
        ORDER BY day
    """,
)
def events_welch_ttest(spark, sf_dir):
    """Daily Welch two-sample t statistic between purchase and click
    values — the A/B-experiment primitive. One conditional aggregate
    per day accumulates EXACT integer (n, Σv, Σv²) for both arms
    (values quantized to 1e-4 units; Σv² stays far inside int64 at
    per-day group sizes), then t is derived through an identical
    scalar double expression in both engines — bit-stable at any
    parallelism, where a naive stddev-of-doubles would drift with
    shuffle order. Single map-side-combinable shuffle on day."""
    e = table(spark, sf_dir, "events")
    v = F.round(F.col("value") * 10000).cast("long")
    is_a = F.col("event_type") == "purchase"
    is_b = F.col("event_type") == "click"
    s = (
        e.filter(F.col("event_type").isin("purchase", "click"))
        .select(F.col("ts").cast("date").alias("day"), "event_type", v.alias("v"))
        .groupBy("day")
        .agg(
            F.count_if(is_a).alias("na"),
            F.sum(F.when(is_a, F.col("v"))).alias("sa"),
            F.sum(F.when(is_a, F.col("v") * F.col("v"))).alias("qa"),
            F.count_if(is_b).alias("nb"),
            F.sum(F.when(is_b, F.col("v"))).alias("sb"),
            F.sum(F.when(is_b, F.col("v") * F.col("v"))).alias("qb"),
        )
    )
    mean_a = F.col("sa").cast("double") / F.col("na")
    mean_b = F.col("sb").cast("double") / F.col("nb")
    var_a = (
        F.col("qa").cast("double")
        - F.col("sa").cast("double") * F.col("sa").cast("double") / F.col("na")
    ) / (F.col("na") - 1)
    var_b = (
        F.col("qb").cast("double")
        - F.col("sb").cast("double") * F.col("sb").cast("double") / F.col("nb")
    ) / (F.col("nb") - 1)
    t = (mean_a - mean_b) / F.sqrt(var_a / F.col("na") + var_b / F.col("nb"))
    return (
        s.filter((F.col("na") >= 2) & (F.col("nb") >= 2))
        .select(
            F.col("day").cast("string").alias("day"),
            "na",
            "nb",
            F.round(t, 6).alias("t_stat"),
        )
        .orderBy("day")
    )


@register(
    "events_time_to_convert",
    oracle="""
        WITH fv AS (
          SELECT user_id, min(epoch_us(ts)) AS first_view_us
          FROM events WHERE event_type = 'view' GROUP BY user_id
        ),
        fp AS (
          SELECT e.user_id, min(epoch_us(e.ts)) AS first_purchase_us
          FROM events e JOIN fv ON e.user_id = fv.user_id
          WHERE e.event_type = 'purchase'
            AND epoch_us(e.ts) >= fv.first_view_us
          GROUP BY e.user_id
        ),
        lat AS (
          SELECT fv.user_id,
                 (fp.first_purchase_us - fv.first_view_us) AS us
          FROM fv JOIN fp ON fv.user_id = fp.user_id
        )
        SELECT us // 3600000000 AS hours_bucket,
               count(*) AS n_users,
               CAST(min(us) AS BIGINT) AS min_us,
               CAST(max(us) AS BIGINT) AS max_us,
               round(CAST(sum(us) AS DOUBLE) / count(*) / 1000000, 6)
                 AS avg_secs
        FROM lat
        GROUP BY hours_bucket
        ORDER BY hours_bucket
    """,
)
def events_time_to_convert(spark, sf_dir):
    """View→purchase conversion-latency histogram: each user's first
    view, their first purchase at-or-after it, and the latency bucketed
    by hour. The funnel-latency primitive behind 'how long does
    conversion take'. Both firsts are min() aggregates over exact
    integer epoch microseconds (user-count sized relations, broadcast-
    joinable); the final histogram is a high-reduction aggregate on
    the bucket. No window over raw events — state is per-user, and
    every sum is exact integer math until the one avg division."""
    e = table(spark, sf_dir, "events")
    us = F.expr("unix_micros(CAST(ts AS TIMESTAMP))")
    fv = (
        e.filter(F.col("event_type") == "view")
        .select("user_id", us.alias("us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("first_view_us"))
    )
    fp = (
        e.filter(F.col("event_type") == "purchase")
        .select("user_id", us.alias("us"))
        .join(F.broadcast(fv), "user_id")
        .filter(F.col("us") >= F.col("first_view_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("first_purchase_us"))
    )
    lat = fv.join(fp, "user_id").select(
        "user_id", (F.col("first_purchase_us") - F.col("first_view_us")).alias("us")
    )
    return (
        lat.groupBy(F.expr("us div 3600000000").alias("hours_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.min("us").alias("min_us"),
            F.max("us").alias("max_us"),
            F.round(F.sum("us").cast("double") / F.count(F.lit(1)) / 1000000, 6).alias(
                "avg_secs"
            ),
        )
        .orderBy("hours_bucket")
    )


@register(
    "agg_linreg_trend",
    oracle="""
        WITH d AS (
          SELECT event_type,
                 CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS x,
                 count(*) AS y
          FROM events GROUP BY event_type, x
        ),
        s AS (
          SELECT event_type, count(*) AS n,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * y) AS BIGINT) AS sxy,
                 CAST(sum(x * x) AS BIGINT) AS sxx,
                 CAST(sum(y * y) AS BIGINT) AS syy
          FROM d GROUP BY event_type
        )
        SELECT event_type, n AS n_days,
               round(CAST(n * sxy - sx * sy AS DOUBLE)
                     / (n * sxx - sx * sx), 6) AS slope,
               round((sy - CAST(n * sxy - sx * sy AS DOUBLE)
                           / (n * sxx - sx * sx) * sx)
                     / CAST(n AS DOUBLE), 6) AS intercept,
               round(CAST(n * sxy - sx * sy AS DOUBLE)
                     * CAST(n * sxy - sx * sy AS DOUBLE)
                     / (CAST(n * sxx - sx * sx AS DOUBLE)
                        * (n * syy - sy * sy)), 6) AS r2
        FROM s
        WHERE n >= 2 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
        ORDER BY event_type
    """,
)
def agg_linreg_trend(spark, sf_dir):
    """Per-event-type OLS trend of daily activity: slope, intercept,
    and r² of count-vs-day — the 'is this metric growing' primitive.
    Two stacked high-reduction aggregates (events → daily counts →
    per-type moment sums); every moment (n, Σx, Σy, Σxy, Σx², Σy²)
    is an exact int64 partial, map-side combinable, and the closed-
    form OLS solution is derived through one identical scalar double
    expression per engine — no regr_slope() builtin, whose double
    accumulation order would vary with parallelism. x is the day
    index from the corpus epoch so integers stay tiny."""
    e = table(spark, sf_dir, "events")
    d = e.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("x"),
    ).agg(F.count(F.lit(1)).alias("y"))
    s = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    num = n * sxy - sx * sy
    dxx = n * sxx - sx * sx
    dyy = n * syy - sy * sy
    slope = num.cast("double") / dxx
    intercept = (sy - slope * sx) / n.cast("double")
    r2 = num.cast("double") * num.cast("double") / (dxx.cast("double") * dyy)
    return (
        s.filter((n >= 2) & (dxx > 0) & (dyy > 0))
        .select(
            "event_type",
            n.alias("n_days"),
            F.round(slope, 6).alias("slope"),
            F.round(intercept, 6).alias("intercept"),
            F.round(r2, 6).alias("r2"),
        )
        .orderBy("event_type")
    )


@register(
    "ts_cusum_detect",
    oracle="""
        WITH RECURSIVE
        d AS (
          SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
                 count(*) AS n
          FROM events GROUP BY 1, 2
        ),
        i AS (
          SELECT event_type, day, n,
                 CAST(row_number() OVER (PARTITION BY event_type
                                         ORDER BY day) AS BIGINT) AS idx
          FROM d
        ),
        t AS (
          SELECT event_type, CAST(sum(n) AS BIGINT) AS num,
                 count(*) AS den
          FROM d GROUP BY event_type
        ),
        r AS (
          SELECT i.event_type, i.day, i.idx, i.n,
                 CAST(greatest(0, i.n * t.den - t.num) AS BIGINT) AS cusum
          FROM i JOIN t USING (event_type) WHERE i.idx = 1
          UNION ALL
          SELECT i.event_type, i.day, i.idx, i.n,
                 CAST(greatest(0, r.cusum + i.n * t.den - t.num) AS BIGINT)
          FROM r
          JOIN i ON i.event_type = r.event_type AND i.idx = r.idx + 1
          JOIN t ON t.event_type = i.event_type
        )
        SELECT r.event_type, r.day, r.n, r.cusum,
               r.cusum >= 2 * t.num AS flagged
        FROM r JOIN t ON t.event_type = r.event_type
        ORDER BY r.event_type, r.day
    """,
)
def ts_cusum_detect(spark, sf_dir):
    """CUSUM changepoint detection on each event type's daily count
    series: Sᵢ = max(0, Sᵢ₋₁ + (nᵢ − mean)). The max-reset LOOKS like
    a recurrence no window frame can express, but it has the classic
    drawdown closed form — with cumᵗ the prefix sum of the deviations
    (and cum₀ = 0), Sᵗ = cumᵗ − min(0, min_{j≤t} cumⱼ) — so the whole
    detector is TWO plain window passes over the per-(type, day)
    aggregate, entirely inside whole-stage codegen (round-5 rewrite;
    the first spelling ran the recurrence in applyInPandas and its
    docstring wrongly claimed windows could not express it). Exactness
    is unchanged: deviations are mean-scaled integers (n·den − num,
    num/den the per-type mean as a fraction), so the window arithmetic
    and DuckDB's recursive CTE produce identical integers; the alarm
    threshold (2 mean-days of excess, 2·num) is integer too. One
    shuffle for the daily rollup; the windows reuse its (event_type)
    partitioning."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    d = e.groupBy(
        "event_type", F.col("ts").cast("date").cast("string").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))

    wt = Window.partitionBy("event_type")
    wo = wt.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    dev = F.col("n") * F.col("den") - F.col("num")  # n·den − num, exact ints
    g = (
        d.withColumn("num", F.sum("n").over(wt))
        .withColumn("den", F.count(F.lit(1)).over(wt))
        .withColumn("cum", F.sum(dev).over(wo))
        # min(0, running-min of cum) ≡ including the empty prefix cum₀=0
        .withColumn("floor", F.least(F.lit(0), F.min("cum").over(wo)))
    )
    return (
        g.select(
            "event_type",
            "day",
            "n",
            (F.col("cum") - F.col("floor")).cast("long").alias("cusum"),
            (F.col("cum") - F.col("floor") >= 2 * F.col("num")).alias(
                "flagged"
            ),
        )
        .orderBy("event_type", "day")
    )


@register(
    "orders_priority_share_shift",
    oracle="""
        WITH m AS (
          SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
                 o_orderpriority, count(*) AS n
          FROM orders GROUP BY 1, 2
        ),
        tot AS (
          SELECT month, CAST(sum(n) AS BIGINT) AS mn FROM m GROUP BY month
        ),
        sh AS (
          SELECT m.month, o_orderpriority, n,
                 CAST(n AS DOUBLE) / mn AS share
          FROM m JOIN tot USING (month)
        )
        SELECT CAST(month AS VARCHAR) AS month, o_orderpriority, n,
               round(share, 6) AS share,
               round(share - lag(share) OVER (PARTITION BY o_orderpriority
                                              ORDER BY month), 6) AS delta_pp
        FROM sh
        ORDER BY month, o_orderpriority
    """,
)
def orders_priority_share_shift(spark, sf_dir):
    """Month-over-month mix shift: each priority class's share of the
    month's orders and its change vs the prior month — the composition
    drift behind 'did urgent orders grow or did everything else
    shrink'. Shares divide exact integer counts by the month total
    (computed as a second aggregate, joined back — months are
    dim-sized so the join broadcasts); the lag runs over the tiny
    (month, priority) relation. Both engines evaluate share and delta
    through the same division/subtraction, and the lag key (priority,
    month) is unique, so no tiebreak is needed."""
    o = table(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month"),
        "o_orderpriority",
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = m.groupBy("month").agg(F.sum("n").alias("mn"))
    sh = m.join(F.broadcast(tot), "month").select(
        "month",
        "o_orderpriority",
        "n",
        (F.col("n").cast("double") / F.col("mn")).alias("share"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy("month")
    return sh.select(
        F.col("month").cast("string").alias("month"),
        "o_orderpriority",
        "n",
        F.round("share", 6).alias("share"),
        F.round(F.col("share") - F.lag("share").over(w), 6).alias("delta_pp"),
    ).orderBy("month", "o_orderpriority")


@register(
    "events_user_overlap_jaccard",
    oracle="""
        WITH ut AS (
          SELECT DISTINCT user_id, event_type FROM events
        ),
        sz AS (
          SELECT event_type, count(*) AS n FROM ut GROUP BY event_type
        ),
        inter AS (
          SELECT a.event_type AS type_a, b.event_type AS type_b,
                 count(*) AS n_both
          FROM ut a JOIN ut b
            ON a.user_id = b.user_id AND a.event_type < b.event_type
          GROUP BY 1, 2
        )
        SELECT type_a, type_b, n_both, sa.n AS n_a, sb.n AS n_b,
               round(CAST(n_both AS DOUBLE)
                     / (sa.n + sb.n - n_both), 6) AS jaccard
        FROM inter
        JOIN sz sa ON sa.event_type = type_a
        JOIN sz sb ON sb.event_type = type_b
        ORDER BY type_a, type_b
    """,
)
def events_user_overlap_jaccard(spark, sf_dir):
    """Audience overlap between event types: Jaccard of the user sets
    for every type pair — the segment-overlap matrix behind 'do
    purchasers also file errors'. The (user, type) relation is first
    deduplicated (high reduction: bounded by users × types), then the
    pair intersection is a self-equi-join on user_id — fan-out
    quadratic only in types-per-user (≤5), never in events. Set sizes
    are a types-sized dim broadcast back; all counts exact integers,
    one division at output."""
    e = table(spark, sf_dir, "events")
    ut = e.select("user_id", "event_type").distinct()
    sz = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a, b = ut.alias("a"), ut.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sa = sz.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = sz.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    jac = F.col("n_both").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_both")
    )
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            F.round(jac, 6).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


@register(
    "orders_backlog_aging",
    oracle="""
        SELECT CASE
                 WHEN age_days < 365 THEN '0-1y'
                 WHEN age_days < 730 THEN '1-2y'
                 WHEN age_days < 1095 THEN '2-3y'
                 ELSE '3y+'
               END AS age_bucket,
               count(*) AS n_open,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS open_cents
        FROM (
          SELECT date_diff('day', o_orderdate, TIMESTAMP '2001-09-01')
                   AS age_days, o_totalprice
          FROM orders WHERE o_orderstatus = 'O'
        )
        GROUP BY 1
        ORDER BY age_bucket
    """,
)
def orders_backlog_aging(spark, sf_dir):
    """Open-order backlog aging: orders still in status 'O' bucketed
    by age against the corpus horizon, with count and exact-cents
    value per bucket — the AR-aging shape every ops dashboard carries.
    The status filter pushes to the parquet scan; the CASE ladder is
    a pure map expression; one 4-row high-reduction aggregate."""
    o = table(spark, sf_dir, "orders")
    age = F.datediff(F.lit("2001-09-01").cast("date"), F.col("o_orderdate"))
    bucket = (
        F.when(age < 365, "0-1y")
        .when(age < 730, "1-2y")
        .when(age < 1095, "2-3y")
        .otherwise("3y+")
    )
    return (
        o.filter(F.col("o_orderstatus") == "O")
        .groupBy(bucket.alias("age_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_open"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "open_cents"
            ),
        )
        .orderBy("age_bucket")
    )


EWMA_NUM = 1  # alpha = 1/4: s = (x + 3 s) / 4, exact double both engines
EWMA_DEN = 4


@register(
    "ts_ewma_smooth",
    oracle="""
        WITH RECURSIVE
        d AS (
          SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
                 count(*) AS n
          FROM events GROUP BY 1, 2
        ),
        i AS (
          SELECT event_type, day, n,
                 CAST(row_number() OVER (PARTITION BY event_type
                                         ORDER BY day) AS BIGINT) AS idx
          FROM d
        ),
        r AS (
          SELECT event_type, day, idx, n, CAST(n AS DOUBLE) AS ewma
          FROM i WHERE idx = 1
          UNION ALL
          SELECT i.event_type, i.day, i.idx, i.n,
                 (1.0 * i.n + 3.0 * r.ewma) / 4.0
          FROM r JOIN i ON i.event_type = r.event_type AND i.idx = r.idx + 1
        )
        SELECT event_type, day, n, round(ewma, 6) AS ewma
        FROM r ORDER BY event_type, day
    """,
)
def ts_ewma_smooth(spark, sf_dir):
    """Exponentially-weighted moving average over each event type's
    daily count series (α=1/4, seeded with the first observation).
    Unlike CUSUM — whose max-reset turned out to be windowable via the
    drawdown identity (see ts_cusum_detect) — EWMA's linear recurrence
    DOES have a closed-form weighted-sum spelling, but a window sum of
    α(1−α)^(t−i)·xᵢ terms changes the floating-point evaluation order
    and breaks the bit-parity the differential requires (ties at 6 dp
    are common at α=1/4), so the sequential evaluation is the correct
    spelling, not a fallback. ONE aggregation reduces events to
    group-cardinality series, then each ~30-row series runs
    sequentially inside one Arrow batch via applyInPandas;
    parallelism = number of series. The step
    (1·x + 3·s)/4 is two products, one sum, one division in IEEE
    double on both engines, in the same order — bit-identical, so
    parity needs only the 6 dp output rounding."""
    import pandas as pd

    e = table(spark, sf_dir, "events")
    d = e.groupBy(
        "event_type", F.col("ts").cast("date").cast("string").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))

    def ewma(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        pdf = pdf.sort_values("day").reset_index(drop=True)
        s = None
        out = []
        for n in pdf["n"]:
            x = float(n)
            s = x if s is None else (1.0 * x + 3.0 * s) / 4.0
            # α=1/4 keeps s an exact binary fraction, so .5 ties at
            # 6 dp are common: round half-UP (floor(x·1e6+0.5)) to
            # match DuckDB's half-away-from-zero, not Python's
            # banker's rounding (values here are all positive).
            out.append(math.floor(s * 1e6 + 0.5) / 1e6)
        pdf["ewma"] = pd.Series(out, dtype="float64")
        return pdf

    return (
        d.groupBy("event_type")
        .applyInPandas(ewma, "event_type string, day string, n long, ewma double")
        .orderBy("event_type", "day")
    )


@register(
    "stat_chi_square",
    oracle="""
        WITH o AS (
          SELECT event_type, CAST(dayofweek(ts) AS BIGINT) AS dow,
                 count(*) AS obs
          FROM events GROUP BY 1, 2
        ),
        rt AS (SELECT event_type, CAST(sum(obs) AS BIGINT) AS r_tot FROM o GROUP BY 1),
        ct AS (SELECT dow, CAST(sum(obs) AS BIGINT) AS c_tot FROM o GROUP BY 1),
        n AS (SELECT CAST(sum(obs) AS BIGINT) AS total FROM o),
        cells AS (
          SELECT o.event_type, o.dow, o.obs,
                 CAST(r_tot AS DOUBLE) * c_tot / total AS expected
          FROM o JOIN rt USING (event_type) JOIN ct USING (dow), n
        )
        SELECT CAST(sum(CAST(round((obs - expected) * (obs - expected)
                                   / expected * 1000000) AS BIGINT)) AS BIGINT)
                 AS chi2_e6,
               (count(DISTINCT event_type) - 1) * (count(DISTINCT dow) - 1)
                 AS dof
        FROM cells
    """,
)
def stat_chi_square(spark, sf_dir):
    """χ² independence test for event_type × weekday, from exact
    integer contingency counts. Per-cell contribution (O−E)²/E is
    deterministic double math; the cross-cell SUM — the only
    order-sensitive step — is made order-free by scaling each
    contribution to an integer (×1e6, rounded) before summing, the
    same exact-sum discipline as engine.dsl.dsum. Two margin
    aggregates broadcast onto the cell table; everything reduces to
    group cardinality before any join."""
    e = table(spark, sf_dir, "events")
    o = e.groupBy(
        "event_type", F.dayofweek("ts").cast("long").alias("dow")
    ).agg(F.count(F.lit(1)).alias("obs"))
    rt = o.groupBy("event_type").agg(F.sum("obs").alias("r_tot"))
    ct = o.groupBy("dow").agg(F.sum("obs").alias("c_tot"))
    n = o.agg(F.sum("obs").alias("total"))
    cells = (
        o.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "dow")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "expected",
            F.col("r_tot").cast("double") * F.col("c_tot") / F.col("total"),
        )
    )
    contrib = (
        (F.col("obs") - F.col("expected"))
        * (F.col("obs") - F.col("expected"))
        / F.col("expected")
    )
    return cells.agg(
        F.sum(F.round(contrib * 1000000).cast("long")).alias("chi2_e6"),
        (
            (F.countDistinct("event_type") - 1) * (F.countDistinct("dow") - 1)
        ).alias("dof"),
    )


@register(
    "agg_approx_top_k",
    oracle="""
        SELECT event_type AS item, count(*) AS est_n
        FROM events GROUP BY event_type
    """,
)
def agg_approx_top_k(spark, sf_dir):
    """Spark 4 approx_top_k sketch — the bounded-memory heavy-hitters
    aggregate (Misra-Gries family): tracks at most maxItemsTracked
    counters per partition and merges them, so finding the top talkers
    over a 100 TB column costs O(k) memory per task instead of a full
    groupBy's distinct-key state. Verification trick: with
    maxItemsTracked (10000) far above the column's true cardinality
    (5 event types) the sketch degenerates to EXACT counts, so the
    value-hash oracle is the plain GROUP BY — the surface is
    exercised AND proven, not just smoke-run. At true scale you size
    maxItemsTracked >= heavy-hitter count and accept the documented
    over-count bound instead."""
    e = table(spark, sf_dir, "events")
    topk = e.agg(
        F.expr("approx_top_k(event_type, 10, 10000)").alias("tk")
    )
    return topk.select(F.explode("tk").alias("s")).select(
        F.col("s.item").alias("item"),
        F.col("s.count").alias("est_n"),
    )


@register(
    "agg_count_min_sketch",
    oracle="""
        SELECT user_id, count(*) AS est_events
        FROM events WHERE user_id < 20 GROUP BY user_id
    """,
)
def agg_count_min_sketch(spark, sf_dir):
    """Count-min sketch frequency estimation with distributed MERGE —
    the third sketch family member (HLL: agg_hll_sketch_merge; top-k:
    agg_approx_top_k): one CMS per event_type is built executor-side
    by ``count_min_sketch()`` (each a fixed-size 2-D counter array,
    the mergeable summary that answers "how often did key X appear"
    over 100 TB in O(sketch) memory), the per-type sketches merge
    associatively into a corpus sketch (``mergeInPlace`` — the same
    op a combiner tree runs), and a broadcast-sized probe set is
    answered from the merged sketch. Why a full value-hash oracle is
    honest here: the FIXED SEED makes the sketch a deterministic
    function of the data, and a probe's estimate (min over 5 depth
    rows) is exact unless the key collides in EVERY row — with 20000
    cells per row that survival probability is negligible per probe at
    both fixture cardinalities (150 / 1500 keys; note per-ROW
    collisions among 1500 keys are near-certain — it is the min across
    depth, not "collision-free rows", that delivers exactness, a
    sharper claim than agg_approx_top_k's capacity argument). Verified
    hash-green at sf0.01 AND sf0.1; were a future fixture to break the
    bound, the oracle FAILS loudly rather than drifting. The
    merged-sketch query runs driver-side through Spark's public
    CountMinSketch API on KB-sized state — never a data path."""
    e = table(spark, sf_dir, "events")
    rows = (
        e.groupBy("event_type")
        .agg(
            F.count_min_sketch(
                "user_id", F.lit(0.0001), F.lit(0.99), F.lit(42)
            ).alias("cms")
        )
        .collect()
    )
    jvm = spark.sparkContext._jvm
    merged = None
    for r in sorted(rows, key=lambda r: r["event_type"]):
        sk = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
            bytes(r["cms"])
        )
        if merged is None:
            merged = sk
        else:
            merged.mergeInPlace(sk)
    probes = [(u, merged.estimateCount(u)) for u in range(20)]
    return spark.createDataFrame(probes, "user_id long, est_events long")


CHURN_ACTIVE_DAYS = 7
CHURN_LAPSED_DAYS = 21


@register(
    "events_churn_bands",
    oracle=f"""
        WITH mx AS (SELECT max(ts) AS now_ts FROM events),
        feed AS (
          SELECT e.user_id, e.ts FROM events e, mx
          WHERE NOT (e.user_id % 7 = 0
                     AND e.ts > now_ts - INTERVAL 25 DAY)
            AND NOT (e.user_id % 7 != 0 AND e.user_id % 5 = 0
                     AND e.ts > now_ts - INTERVAL 14 DAY)
        ),
        last_seen AS (
          SELECT user_id, max(ts) AS last_ts,
                 count(*) AS lifetime_events
          FROM feed GROUP BY user_id
        )
        SELECT CASE
                 WHEN date_diff('day', last_ts, now_ts)
                      < {CHURN_ACTIVE_DAYS} THEN 'active'
                 WHEN date_diff('day', last_ts, now_ts)
                      < {CHURN_LAPSED_DAYS} THEN 'lapsed'
                 ELSE 'churned'
               END AS band,
               count(*) AS n_users,
               CAST(sum(lifetime_events) AS BIGINT) AS n_events
        FROM last_seen, mx
        GROUP BY 1 ORDER BY 1
    """,
)
def events_churn_bands(spark, sf_dir):
    """Churn banding: users split into active / lapsed / churned by
    days since last activity, measured against the corpus watermark
    (max ts) so the report is reproducible rather than wall-clock
    dependent — the retention snapshot every product pipeline emits.

    Fixture augmentation (structurally-empty differential): every
    fixture user is active through the last week, so only the
    'active' branch could ever fire — the report runs over a
    simulated lagged feed (every 7th user's last 25 days dropped →
    churned; every 5th-not-7th user's last 14 days dropped → lapsed),
    restated by the oracle, so all three CASE branches are genuinely
    exercised.

    One aggregation builds per-user last-seen + lifetime counts; the
    watermark is a 1-row broadcast crossJoin (never a collect); the
    banding is a scalar CASE and the final rollup is three rows.
    date_diff on exact timestamps matches DuckDB's day arithmetic
    (both truncate toward the floor of whole days)."""
    e = table(spark, sf_dir, "events")
    mx = e.agg(F.max("ts").alias("now_ts"))
    u7 = F.col("user_id") % 7 == 0
    u5 = (F.col("user_id") % 7 != 0) & (F.col("user_id") % 5 == 0)
    feed = (
        e.crossJoin(F.broadcast(mx))
        .filter(
            ~(u7 & (F.col("ts") > F.col("now_ts") - F.expr("INTERVAL 25 DAYS")))
            & ~(u5 & (F.col("ts") > F.col("now_ts") - F.expr("INTERVAL 14 DAYS")))
        )
    )
    last_seen = feed.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).alias("lifetime_events"),
        F.first("now_ts").alias("now_ts"),
    )
    dd = F.datediff(F.col("now_ts"), F.col("last_ts"))
    band = (
        F.when(dd < CHURN_ACTIVE_DAYS, "active")
        .when(dd < CHURN_LAPSED_DAYS, "lapsed")
        .otherwise("churned")
    )
    return (
        last_seen.groupBy(band.alias("band"))
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("lifetime_events").alias("n_events"),
        )
        .orderBy("band")
    )


@register(
    "stat_ks_test",
    oracle="""
        WITH q AS (
          SELECT CAST(round(value * 10000) AS BIGINT) AS v,
                 CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS ia,
                 CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS ib
          FROM events WHERE event_type IN ('purchase', 'view')
        ),
        g AS (
          SELECT v, CAST(sum(ia) AS BIGINT) AS ca, CAST(sum(ib) AS BIGINT) AS cb
          FROM q GROUP BY v
        ),
        c AS (
          SELECT sum(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cuma,
                 sum(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cumb,
                 sum(ca) OVER () AS na,
                 sum(cb) OVER () AS nb
          FROM g
        )
        SELECT CAST(max(na) AS BIGINT) AS n_a,
               CAST(max(nb) AS BIGINT) AS n_b,
               CAST(max(abs(cuma * nb - cumb * na)) AS BIGINT) AS d_num,
               round(CAST(max(abs(cuma * nb - cumb * na)) AS DOUBLE)
                     / (max(na) * max(nb)), 6) AS d_stat
        FROM c
    """,
)
def stat_ks_test(spark, sf_dir):
    """Two-sample Kolmogorov–Smirnov D between the purchase and view
    value distributions — the nonparametric distribution-shift test
    A/B platforms and data-drift monitors run. D = max |ECDF_a −
    ECDF_b| is computed EXACTLY: values quantized to 1e-4 units,
    per-value counts for both arms in one hash aggregate, cumulative
    counts over the distinct sorted values, and the sup taken on the
    integer cross-product |cum_a·n_b − cum_b·n_a| — one BIGINT max,
    bit-identical at any parallelism; the only double is the final
    scalar division.

    Plan: groupBy(v) is map-side combinable, so the sorted pass runs
    over DISTINCT quantized values (bounded by value-domain
    resolution, not row count). The single-partition window over that
    distinct spine is the textbook ECDF shape; at 100 TB you'd
    range-partition the spine and two-level prefix-sum the counts
    (the corpus_shard_export op demonstrates exactly that), keeping
    the global max a scalar combine."""
    e = table(spark, sf_dir, "events")
    q = e.filter(F.col("event_type").isin("purchase", "view")).select(
        F.round(F.col("value") * 10000).cast("long").alias("v"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("ia"),
        F.when(F.col("event_type") == "view", 1).otherwise(0).alias("ib"),
    )
    g = q.groupBy("v").agg(F.sum("ia").alias("ca"), F.sum("ib").alias("cb"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy()
    c = g.select(
        F.sum("ca").over(w).alias("cuma"),
        F.sum("cb").over(w).alias("cumb"),
        F.sum("ca").over(wall).alias("na"),
        F.sum("cb").over(wall).alias("nb"),
    )
    d_num = F.max(F.abs(F.col("cuma") * F.col("nb") - F.col("cumb") * F.col("na")))
    return c.agg(
        F.max("na").alias("n_a"),
        F.max("nb").alias("n_b"),
        d_num.alias("d_num"),
        F.round(
            d_num.cast("double") / (F.max("na") * F.max("nb")), 6
        ).alias("d_stat"),
    )


@register(
    "orders_survival_km",
    oracle="""
        WITH o AS (
          SELECT o_custkey, CAST(o_orderdate AS DATE) AS d, o_orderkey
          FROM orders
        ),
        mx AS (SELECT max(d) AS maxd FROM o),
        dur AS (
          SELECT CASE WHEN nxt IS NOT NULL THEN date_diff('day', d, nxt)
                      ELSE date_diff('day', d, maxd) END AS t,
                 CASE WHEN nxt IS NOT NULL THEN 1 ELSE 0 END AS ev
          FROM (
            SELECT o_custkey, d, o_orderkey,
                   lead(d) OVER (PARTITION BY o_custkey
                                 ORDER BY d, o_orderkey) AS nxt
            FROM o
          ), mx
        ),
        g AS (
          SELECT t, count(*) AS c_all, CAST(sum(ev) AS BIGINT) AS d_events
          FROM dur GROUP BY t
        ),
        r AS (
          SELECT t, d_events,
                 CAST(sum(c_all) OVER () AS BIGINT)
                   - CAST(COALESCE(sum(c_all) OVER (ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     AS BIGINT) AS n_risk
          FROM g
        ),
        e AS (
          SELECT t, n_risk, d_events,
                 CASE WHEN n_risk = d_events THEN NULL
                      ELSE CAST(round(1e6 * ln(CAST(n_risk - d_events AS DOUBLE)
                                               / n_risk)) AS BIGINT)
                 END AS term_mnat
          FROM r WHERE d_events > 0
        )
        SELECT t AS t_day, n_risk, d_events,
               CAST(sum(term_mnat) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                 AS BIGINT) AS surv_mnat,
               CASE WHEN max(CASE WHEN term_mnat IS NULL THEN 1 ELSE 0 END)
                         OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) = 1 THEN 0.0
                    ELSE round(exp(CAST(sum(term_mnat) OVER (ORDER BY t
                           ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 1e6), 6)
               END AS surv
        FROM e
    """,
)
def orders_survival_km(spark, sf_dir):
    """Kaplan–Meier survival curve over inter-order gaps — the
    time-to-repeat-purchase estimator, with the last order of each
    customer right-censored at the fixture's max order date. Event
    durations come from one lead() window per customer; the risk set
    n(t) = N − #{durations < t} falls out of a prefix sum over the
    grouped duration spine, so no per-time rescan of the fact table.

    Determinism discipline: Π(1 − d/n) is taken in log space with
    each factor quantized to integer micro-nats BEFORE the cumulative
    sum (the engine-wide log-prob rule), so the curve is bit-stable
    across engines and shuffle orders; the final exp/round is one
    scalar per row. S(t) hits exact 0 iff the last risk set is all
    events (term is NULL-guarded; the running had-null flag pins surv
    to 0.0 from that point on). Scale: windows partition by customer
    (millions of small groups); only the distinct-duration spine —
    bounded by the date-range in days, not row count — is globally
    ordered, the same two-level-prefix-sum shape as stat_ks_test."""
    o = table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("d"),
        "o_orderkey",
    )
    mx = o.agg(F.max("d").alias("maxd"))
    w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    dur = (
        o.withColumn("nxt", F.lead("d").over(w))
        .crossJoin(F.broadcast(mx))
        .select(
            F.when(
                F.col("nxt").isNotNull(), F.datediff("nxt", "d")
            ).otherwise(F.datediff("maxd", "d")).cast("long").alias("t"),
            F.when(F.col("nxt").isNotNull(), 1).otherwise(0).alias("ev"),
        )
    )
    g = dur.groupBy("t").agg(
        F.count(F.lit(1)).alias("c_all"), F.sum("ev").alias("d_events")
    )
    wt = Window.orderBy("t")
    before = F.coalesce(
        F.sum("c_all").over(wt.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    r = g.select(
        "t",
        "d_events",
        (F.sum("c_all").over(Window.partitionBy()) - before).alias("n_risk"),
    )
    term = F.when(F.col("n_risk") == F.col("d_events"), F.lit(None)).otherwise(
        F.round(
            1e6
            * F.log(
                (F.col("n_risk") - F.col("d_events")).cast("double")
                / F.col("n_risk")
            )
        ).cast("long")
    )
    e = r.filter(F.col("d_events") > 0).withColumn("term_mnat", term)
    wcum = wt.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    had_null = F.max(
        F.when(F.col("term_mnat").isNull(), 1).otherwise(0)
    ).over(wcum)
    cum = F.sum("term_mnat").over(wcum)
    return e.select(
        F.col("t").alias("t_day"),
        "n_risk",
        "d_events",
        cum.alias("surv_mnat"),
        F.when(had_null == 1, F.lit(0.0))
        .otherwise(F.round(F.exp(cum.cast("double") / 1e6), 6))
        .alias("surv"),
    )


@register(
    "ml_ols_normal_eq",
    oracle="""
        WITH q AS (
          SELECT CAST(round(l_quantity) AS BIGINT) AS x1,
                 CAST(round(l_discount * 100) AS BIGINT) AS x2,
                 CAST(round(l_extendedprice * 100) AS BIGINT) AS y
          FROM lineitem
        ),
        g AS (
          SELECT count(*) AS n,
                 CAST(sum(x1) AS BIGINT) AS s1,
                 CAST(sum(x2) AS BIGINT) AS s2,
                 CAST(sum(x1 * x1) AS BIGINT) AS s11,
                 CAST(sum(x1 * x2) AS BIGINT) AS s12,
                 CAST(sum(x2 * x2) AS BIGINT) AS s22,
                 CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x1 * y) AS BIGINT) AS s1y,
                 CAST(sum(x2 * y) AS BIGINT) AS s2y
          FROM q
        ),
        d AS (
          SELECT n,
                 CAST(n AS DOUBLE) AS a, CAST(s1 AS DOUBLE) AS b,
                 CAST(s2 AS DOUBLE) AS c, CAST(s11 AS DOUBLE) AS dd,
                 CAST(s12 AS DOUBLE) AS e, CAST(s22 AS DOUBLE) AS f,
                 CAST(sy AS DOUBLE) AS p, CAST(s1y AS DOUBLE) AS q,
                 CAST(s2y AS DOUBLE) AS s
          FROM g
        ),
        cf AS (
          SELECT n, p, q, s,
                 dd * f - e * e AS cof11, c * e - b * f AS cof12,
                 b * e - c * dd AS cof13, a * f - c * c AS cof22,
                 b * c - a * e AS cof23, a * dd - b * b AS cof33,
                 a * (dd * f - e * e) + b * (c * e - b * f)
                   + c * (b * e - c * dd) AS det
          FROM d
        )
        SELECT n,
               round((p * cof11 + q * cof12 + s * cof13) / det, 6) AS b0,
               round((p * cof12 + q * cof22 + s * cof23) / det, 6) AS b1,
               round((p * cof13 + q * cof23 + s * cof33) / det, 6) AS b2
        FROM cf
    """,
)
def ml_ols_normal_eq(spark, sf_dir):
    """Multi-feature OLS (extendedprice-cents ~ quantity + discount-pts)
    solved in CLOSED FORM via the normal equations: one map-side-
    combinable aggregate accumulates the exact integer Gram/moment
    sums (n, Σx, ΣxxT, Σxy — 9 BIGINTs), then the 3×3 symmetric system
    is inverted by cofactors in a single scalar double expression.
    This is the distributed-OLS shape that needs ONE pass and ONE
    scalar combine regardless of data size — no gradient iterations,
    no per-row Python (contrast ml_logreg_train, the iterative
    sibling). Bit-determinism: every sum is exact-integer before the
    final identical-structure double arithmetic, the engine-wide rule;
    the double cofactor expressions are written with the same shape in
    both engines so IEEE evaluation matches bit-for-bit. At 100 TB the
    feature count k bounds the state (k² sums), not rows — the same
    partial-aggregation contract as agg_stats."""
    li = table(spark, sf_dir, "lineitem")
    x1 = F.round("l_quantity").cast("long")
    x2 = F.round(F.col("l_discount") * 100).cast("long")
    y = F.round(F.col("l_extendedprice") * 100).cast("long")
    q = li.select(x1.alias("x1"), x2.alias("x2"), y.alias("y"))
    g = q.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x1").alias("s1"),
        F.sum("x2").alias("s2"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
    )
    d = g.select(
        "n",
        F.col("n").cast("double").alias("a"),
        F.col("s1").cast("double").alias("b"),
        F.col("s2").cast("double").alias("c"),
        F.col("s11").cast("double").alias("dd"),
        F.col("s12").cast("double").alias("e"),
        F.col("s22").cast("double").alias("f"),
        F.col("sy").cast("double").alias("p"),
        F.col("s1y").cast("double").alias("q"),
        F.col("s2y").cast("double").alias("s"),
    )
    cf = d.select(
        "n",
        "p",
        "q",
        "s",
        (F.col("dd") * F.col("f") - F.col("e") * F.col("e")).alias("cof11"),
        (F.col("c") * F.col("e") - F.col("b") * F.col("f")).alias("cof12"),
        (F.col("b") * F.col("e") - F.col("c") * F.col("dd")).alias("cof13"),
        (F.col("a") * F.col("f") - F.col("c") * F.col("c")).alias("cof22"),
        (F.col("b") * F.col("c") - F.col("a") * F.col("e")).alias("cof23"),
        (F.col("a") * F.col("dd") - F.col("b") * F.col("b")).alias("cof33"),
        (
            F.col("a") * (F.col("dd") * F.col("f") - F.col("e") * F.col("e"))
            + F.col("b") * (F.col("c") * F.col("e") - F.col("b") * F.col("f"))
            + F.col("c") * (F.col("b") * F.col("e") - F.col("c") * F.col("dd"))
        ).alias("det"),
    )
    return cf.select(
        "n",
        F.round(
            (F.col("p") * F.col("cof11") + F.col("q") * F.col("cof12")
             + F.col("s") * F.col("cof13")) / F.col("det"), 6
        ).alias("b0"),
        F.round(
            (F.col("p") * F.col("cof12") + F.col("q") * F.col("cof22")
             + F.col("s") * F.col("cof23")) / F.col("det"), 6
        ).alias("b1"),
        F.round(
            (F.col("p") * F.col("cof13") + F.col("q") * F.col("cof23")
             + F.col("s") * F.col("cof33")) / F.col("det"), 6
        ).alias("b2"),
    )


BOOT_REPS = 32


@register(
    "agg_bootstrap_ci",
    oracle=f"""
        WITH base AS (
          SELECT event_id, CAST(round(value * 100) AS BIGINT) AS cents
          FROM events WHERE event_type = 'purchase'
        ),
        rep AS (
          SELECT r.r AS r, event_id, cents
          FROM base, unnest(range({BOOT_REPS})) r(r)
        ),
        mem AS (
          SELECT r, cents,
                 ((event_id * 1103515245 + r * 12345) % 2147483648)
                   AS h1
          FROM rep
        ),
        sel AS (
          SELECT r, cents
          FROM mem
          WHERE ((h1 * 1103515245 + 12345) % 2147483648) % 2 = 0
        ),
        means AS (
          SELECT r, CAST(sum(cents) AS BIGINT) AS s, count(*) AS n,
                 CAST(sum(cents) AS DOUBLE) / count(*) AS m
          FROM sel GROUP BY r
        ),
        ranked AS (
          SELECT m, row_number() OVER (ORDER BY m, r) AS rn FROM means
        ),
        ci AS (
          SELECT round(max(CASE WHEN rn = 2 THEN m END), 6) AS lo_mean,
                 round(max(CASE WHEN rn = {BOOT_REPS - 1} THEN m END), 6)
                   AS hi_mean
          FROM ranked
        ),
        pt AS (
          SELECT count(*) AS n_total,
                 round(CAST(sum(cents) AS DOUBLE) / count(*), 6) AS point_mean
          FROM base
        )
        SELECT n_total, point_mean, lo_mean, hi_mean FROM pt, ci
    """,
)
def agg_bootstrap_ci(spark, sf_dir):
    """Bootstrap confidence interval for the mean purchase value via
    DETERMINISTIC half-sampling: 32 replicates, each keeping the rows
    whose two-step LCG hash of (event_id, replicate) is even — a
    derandomized subsample bootstrap whose replicate membership is a
    pure integer function both engines evaluate identically (no RNG
    state, no sampleBy nondeterminism). Replicate means are exact
    BIGINT sums over the selected cents; the 90% CI takes the 2nd and
    31st order statistics of the 32 means (row_number with an (m, r)
    tiebreak).

    Scale: the replicate fan-out is a row-local explode (32×, map
    side), the per-replicate aggregation is one map-side-combinable
    groupBy(r) — state is B partial sums regardless of data size, the
    classic Poisson/subsample-bootstrap layout for distributed
    inference. No data-sized shuffle, no collect."""
    e = table(spark, sf_dir, "events")
    base = e.filter(F.col("event_type") == "purchase").select(
        "event_id", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    rep = base.select(
        "event_id",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(BOOT_REPS - 1))).alias("r"),
    )
    h1 = (F.col("event_id") * 1103515245 + F.col("r") * 12345) % 2147483648
    sel = rep.withColumn("h1", h1).filter(
        ((F.col("h1") * 1103515245 + 12345) % 2147483648) % 2 == 0
    )
    means = sel.groupBy("r").agg(
        (F.sum("cents").cast("double") / F.count(F.lit(1))).alias("m")
    )
    ranked = means.withColumn(
        "rn", F.row_number().over(Window.orderBy("m", "r"))
    )
    ci = ranked.agg(
        F.round(F.max(F.when(F.col("rn") == 2, F.col("m"))), 6).alias(
            "lo_mean"
        ),
        F.round(
            F.max(F.when(F.col("rn") == BOOT_REPS - 1, F.col("m"))), 6
        ).alias("hi_mean"),
    )
    pt = base.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.round(F.sum("cents").cast("double") / F.count(F.lit(1)), 6).alias(
            "point_mean"
        ),
    )
    return pt.crossJoin(ci)


@register(
    "events_seasonal_naive_forecast",
    oracle="""
        WITH c AS (
          SELECT date_trunc('hour', ts) AS h, count(*) AS n
          FROM events GROUP BY 1
        ),
        mx AS (SELECT max(CAST(ts AS DATE)) AS maxd FROM events),
        j AS (
          SELECT a.h, a.n AS actual, p.n AS pred
          FROM c a JOIN c p ON p.h = a.h - INTERVAL 24 HOURS
        )
        SELECT CAST(CAST(h AS DATE) AS VARCHAR) AS day,
               count(*) AS n_hours,
               CAST(sum(abs(actual - pred)) AS BIGINT) AS mae_num,
               round(CAST(sum(abs(actual - pred)) AS DOUBLE) / count(*), 6)
                 AS mae
        FROM j, mx
        WHERE CAST(h AS DATE) > maxd - 7
        GROUP BY day
    """,
)
def events_seasonal_naive_forecast(spark, sf_dir):
    """Seasonal-naive forecast backtest — the baseline every capacity
    forecast is judged against: predict each hour's event count with
    the SAME HOUR YESTERDAY, score the last 7 days by daily MAE.
    Counts come from one hash aggregate on the hour bucket; the
    prediction is a self-equi-join of that (tiny, dim-sized) hourly
    series shifted 24 h; MAE is an exact integer |Δ| sum with one
    final division. Inner join = hours observed in both — the honest
    convention for sparse fixtures, stated here so the oracle matches
    by construction.

    Scale: the fact-table scan reduces immediately to the hourly
    rollup (map-side combinable, time-bounded cardinality); the
    shifted self-join and the 7-day filter run on that rollup, so
    the whole backtest is O(hours) after one pass over events — at
    100 TB you'd land the rollup once and backtest any horizon
    against it."""
    e = table(spark, sf_dir, "events")
    c = e.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).alias("n")
    )
    mx = e.agg(F.max(F.col("ts").cast("date")).alias("maxd"))
    a = c.select(F.col("h"), F.col("n").alias("actual"))
    p = c.select(
        (F.col("h") + F.expr("INTERVAL 24 HOURS")).alias("h"),
        F.col("n").alias("pred"),
    )
    j = a.join(p, "h").crossJoin(F.broadcast(mx))
    err = F.abs(F.col("actual") - F.col("pred"))
    return (
        j.filter(F.col("h").cast("date") > F.date_sub("maxd", 7))
        .groupBy(F.col("h").cast("date").cast("string").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.sum(err).alias("mae_num"),
            F.round(F.sum(err).cast("double") / F.count(F.lit(1)), 6).alias(
                "mae"
            ),
        )
    )


ACF_MAX_LAG = 6


@register(
    "ts_acf_lags",
    oracle=f"""
        WITH c AS (
          SELECT date_trunc('hour', ts) AS h, count(*) AS x
          FROM events GROUP BY 1
        ),
        tot0 AS (
          SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS s FROM c
        ),
        tot AS (
          SELECT n, s,
                 CAST(sum((n * x - s) * (n * x - s)) AS BIGINT) AS den
          FROM c, tot0 GROUP BY n, s
        ),
        lags AS (SELECT l.l + 1 AS lag FROM unnest(range({ACF_MAX_LAG})) l(l)),
        p AS (
          SELECT lag, a.x AS xa, b.x AS xb
          FROM lags, c a JOIN c b
            ON b.h = a.h - to_hours(CAST(lag AS BIGINT))
        )
        SELECT lag, count(*) AS n_pairs,
               round(CAST(sum((n * xa - s) * (n * xb - s)) AS DOUBLE)
                     / max(den), 6) AS acf
        FROM p, tot
        GROUP BY lag
    """,
)
def ts_acf_lags(spark, sf_dir):
    """Autocorrelation function of the hourly event-count series at
    lags 1–6 — the seasonality diagnostic that justifies (or refutes)
    the seasonal-naive model: r_k = Σ(x_t−x̄)(x_{t−k}−x̄) / Σ(x_t−x̄)².
    Both sums are computed EXACTLY by clearing denominators — with
    N hours and S total events, (x−x̄) scales to the integer (N·x−S),
    so numerator and denominator are BIGINT sums and only the final
    ratio is double. Lag pairing is a true time-shift join (h−k
    hours), not a row shift, so calendar gaps can't misalign lags.

    Scale: the fact scan reduces to the hourly rollup immediately;
    the lag fan-out (6×) and shifted self-join run on that dim-sized
    series; the (N, S, den) scalars broadcast. Same O(hours)
    post-rollup contract as the seasonal-naive backtest."""
    e = table(spark, sf_dir, "events")
    c = e.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).alias("x")
    )
    wall = Window.partitionBy()
    tot = c.select(
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum("x").over(wall).alias("s"),
        (
            (F.count(F.lit(1)).over(wall) * F.col("x") - F.sum("x").over(wall))
            * (F.count(F.lit(1)).over(wall) * F.col("x") - F.sum("x").over(wall))
        ).alias("dsq"),
    ).groupBy("n", "s").agg(F.sum("dsq").alias("den"))
    lags = spark.range(1, ACF_MAX_LAG + 1).select(F.col("id").alias("lag"))
    a = c.crossJoin(F.broadcast(lags)).select(
        "lag", "h", F.col("x").alias("xa")
    )
    b = c.select(F.col("h").alias("hb"), F.col("x").alias("xb"))
    p = a.join(
        b,
        b.hb
        == F.col("h") - F.col("lag") * F.expr("INTERVAL 1 HOUR"),
    )
    num = F.sum(
        (F.col("n") * F.col("xa") - F.col("s"))
        * (F.col("n") * F.col("xb") - F.col("s"))
    )
    return (
        p.crossJoin(F.broadcast(tot))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(num.cast("double") / F.max("den"), 6).alias("acf"),
        )
    )


@register(
    "ts_theil_sen_slope",
    oracle="""
        WITH c AS (
          SELECT date_trunc('hour', ts) AS h, count(*) AS x
          FROM events GROUP BY 1
        ),
        p AS (
          SELECT (epoch_ns(b.h) - epoch_ns(a.h)) // 3600000000000 AS dt,
                 b.x - a.x AS dx
          FROM c a JOIN c b ON a.h < b.h
        ),
        s AS (
          SELECT CAST(dx AS DOUBLE) / dt AS slope, dx, dt,
                 count(*) OVER () AS n_pairs
          FROM p
        ),
        r AS (
          SELECT slope, n_pairs,
                 row_number() OVER (ORDER BY slope, dx, dt) AS rn
          FROM s
        )
        SELECT CAST(max(n_pairs) AS BIGINT) AS n_pairs,
               round(max(CASE WHEN rn = (n_pairs + 1) // 2 THEN slope END), 6)
                 AS slope_per_hour
        FROM r
    """,
)
def ts_theil_sen_slope(spark, sf_dir):
    """Theil–Sen robust trend estimate of the hourly event-rate: the
    (lower) median over ALL pairwise slopes (x_j−x_i)/(t_j−t_i) of the
    hourly rollup — breakdown point 29%, immune to the outlier hours
    that wreck an OLS trend (agg_linreg_trend is the fragile sibling).
    Slopes are doubles from exact integer (Δx, Δt-hours) pairs; the
    median is selected by row_number with a (slope, dx, dt) tiebreak,
    so both engines pick the identical order statistic.

    Scale: the O(H²) pair join runs on the HOURLY ROLLUP (dim-sized,
    time-bounded — 720 hours/month → 259k pairs regardless of row
    count); at 100 TB the fact scan still reduces first, and a
    longer horizon would switch to the per-window repeated-median
    variant. The global median spine is the same bounded single-
    partition shape as stat_ks_test."""
    e = table(spark, sf_dir, "events")
    c = e.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).alias("x")
    )
    a = c.select(F.col("h").alias("ha"), F.col("x").alias("xa"))
    b = c.select(F.col("h").alias("hb"), F.col("x").alias("xb"))
    p = a.join(b, F.col("ha") < F.col("hb")).select(
        (
            (F.unix_timestamp("hb") - F.unix_timestamp("ha")) / F.lit(3600)
        ).cast("long").alias("dt"),
        (F.col("xb") - F.col("xa")).alias("dx"),
    )
    s = p.select(
        (F.col("dx").cast("double") / F.col("dt")).alias("slope"),
        "dx",
        "dt",
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n_pairs"),
    )
    r = s.withColumn(
        "rn", F.row_number().over(Window.orderBy("slope", "dx", "dt"))
    )
    return r.agg(
        F.max("n_pairs").alias("n_pairs"),
        F.round(
            F.max(
                F.when(
                    F.col("rn") == F.floor((F.col("n_pairs") + 1) / 2),
                    F.col("slope"),
                )
            ),
            6,
        ).alias("slope_per_hour"),
    )


@register(
    "orders_gini_concentration",
    oracle="""
        WITH rev AS (
          SELECT o_custkey,
                 CAST(sum(CAST(round(o_totalprice) AS BIGINT))
                   AS BIGINT) AS dollars
          FROM orders GROUP BY o_custkey
        ),
        r AS (
          SELECT dollars,
                 row_number() OVER (ORDER BY dollars, o_custkey) AS i,
                 count(*) OVER () AS n,
                 CAST(sum(dollars) OVER () AS BIGINT) AS s
          FROM rev
        )
        SELECT CAST(max(n) AS BIGINT) AS n_customers,
               CAST(max(s) AS BIGINT) AS total_dollars,
               CAST(2 * sum(i * dollars) - (max(n) + 1) * max(s) AS BIGINT)
                 AS gini_num,
               round(CAST(2 * sum(i * dollars) - (max(n) + 1) * max(s) AS DOUBLE)
                     / (max(n) * max(s)), 6) AS gini
        FROM r
    """,
)
def orders_gini_concentration(spark, sf_dir):
    """Gini coefficient of customer revenue concentration — the
    inequality scalar behind every "top-X% of customers" narrative
    (orders_pareto_customers charts the curve; this is its summary
    statistic). Uses the rank formula G = (2·Σi·x₍ᵢ₎ − (n+1)·Σx) /
    (n·Σx) over revenue sorted ascending: the numerator is an EXACT
    BIGINT (ties contribute a fixed rank-sum regardless of internal
    order, so the custkey tiebreak is belt-and-braces), and only the
    final ratio is double. Revenue is quantized to whole DOLLARS, not
    cents: Σi·xᵢ grows ~ rank·value·customers, and dollar units keep
    the BIGINT headroom to ~sf100 where cents would overflow near
    sf0.5 — Gini is invariant to the unit up to rounding.

    Scale: per-customer revenue is one map-side-combinable groupBy;
    the ranked spine is customer-sized, and the rank weighting is the
    same bounded global-order shape as stat_ks_test (two-level prefix
    sum at 100 TB)."""
    o = table(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.round("o_totalprice").cast("long")).alias("dollars")
    )
    wall = Window.partitionBy()
    r = rev.select(
        "dollars",
        F.row_number()
        .over(Window.orderBy("dollars", "o_custkey"))
        .alias("i"),
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum("dollars").over(wall).alias("s"),
    )
    num = 2 * F.sum(F.col("i") * F.col("dollars")) - (
        F.max("n") + 1
    ) * F.max("s")
    return r.agg(
        F.max("n").alias("n_customers"),
        F.max("s").alias("total_dollars"),
        num.cast("long").alias("gini_num"),
        F.round(num.cast("double") / (F.max("n") * F.max("s")), 6).alias(
            "gini"
        ),
    )


@register(
    "orders_cohort_ltv_curve",
    oracle="""
        WITH f AS (
          SELECT o_custkey,
                 min(year(o_orderdate)) OVER (PARTITION BY o_custkey)
                   AS cohort_year,
                 year(o_orderdate) AS order_year,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS cents
          FROM orders
        ),
        per_age AS (
          SELECT cohort_year, order_year - cohort_year AS age,
                 CAST(sum(cents) AS BIGINT) AS rev,
                 count(DISTINCT o_custkey) AS active_customers
          FROM f GROUP BY 1, 2
        ),
        sized AS (
          SELECT cohort_year, count(DISTINCT o_custkey) AS cohort_size
          FROM f GROUP BY 1
        )
        SELECT p.cohort_year, p.age, p.active_customers, s.cohort_size,
               CAST(sum(p.rev) OVER (PARTITION BY p.cohort_year ORDER BY p.age
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_rev_cents,
               round(CAST(sum(p.rev) OVER (PARTITION BY p.cohort_year
                     ORDER BY p.age ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                     / s.cohort_size / 100, 6) AS ltv_per_customer
        FROM per_age p JOIN sized s ON p.cohort_year = s.cohort_year
    """,
)
def orders_cohort_ltv_curve(spark, sf_dir):
    """Cohort lifetime-value curves: customers cohorted by first-order
    year, revenue accumulated by cohort age — the curve that answers
    "how much is a Y-cohort customer worth after k years" (the revenue
    sibling of agg_retention_cohort's activity counts). Cohort
    assignment is one min() window per customer, per-(cohort, age)
    revenue one exact-cents aggregate, and the running LTV a prefix
    sum over the tiny (cohort × age) grid; per-customer LTV divides by
    the cohort's distinct-customer size only in the final projection.

    Scale: windows partition by customer (small groups), the cumsum
    runs on a years×years grid — constant-sized regardless of fact
    rows. Map-side-combinable aggregates throughout."""
    o = table(spark, sf_dir, "orders")
    wc = Window.partitionBy("o_custkey")
    f = o.select(
        "o_custkey",
        F.min(F.year("o_orderdate")).over(wc).alias("cohort_year"),
        F.year("o_orderdate").alias("order_year"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    per_age = f.groupBy(
        "cohort_year", (F.col("order_year") - F.col("cohort_year")).alias("age")
    ).agg(
        F.sum("cents").alias("rev"),
        F.countDistinct("o_custkey").alias("active_customers"),
    )
    sized = f.groupBy("cohort_year").agg(
        F.countDistinct("o_custkey").alias("cohort_size")
    )
    wa = Window.partitionBy("cohort_year").orderBy("age").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    j = per_age.join(F.broadcast(sized), "cohort_year")
    cum = F.sum("rev").over(wa)
    return j.select(
        "cohort_year",
        "age",
        "active_customers",
        "cohort_size",
        cum.alias("cum_rev_cents"),
        F.round(
            cum.cast("double") / F.col("cohort_size") / 100, 6
        ).alias("ltv_per_customer"),
    )


@register(
    "events_wilcoxon_rank_sum",
    oracle="""
        WITH q AS (
          SELECT CAST(round(value * 10000) AS BIGINT) AS v,
                 CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS ia
          FROM events WHERE event_type IN ('purchase', 'view')
        ),
        g AS (
          SELECT v, CAST(sum(ia) AS BIGINT) AS ca,
                 CAST(count(*) AS BIGINT) AS t
          FROM q GROUP BY v
        ),
        c AS (
          SELECT ca, t,
                 CAST(COALESCE(sum(t) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS cum_before,
                 CAST(sum(ca) OVER () AS BIGINT) AS na,
                 CAST(sum(t - ca) OVER () AS BIGINT) AS nb,
                 CAST(sum(t * t * t - t) OVER () AS BIGINT) AS tie3
          FROM g
        ),
        s AS (
          SELECT max(na) AS na, max(nb) AS nb, max(tie3) AS tie3,
                 CAST(sum(ca * (2 * cum_before + t + 1)) AS BIGINT) AS r2a
          FROM c
        )
        SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
               CAST(r2a - na * (na + 1) AS BIGINT) AS u2_a,
               round((CAST(r2a - na * (na + 1) AS DOUBLE) - CAST(na AS DOUBLE) * nb)
                     / (2 * sqrt(CAST(na AS DOUBLE) * nb / 12
                        * ((na + nb + 1)
                           - CAST(tie3 AS DOUBLE)
                             / ((na + nb) * (na + nb - 1))))), 6) AS z
        FROM s
    """,
)
def events_wilcoxon_rank_sum(spark, sf_dir):
    """Wilcoxon–Mann–Whitney rank-sum test (purchase vs view values)
    with tie correction — the nonparametric LOCATION test completing
    the inference family (Welch = parametric mean, KS = full
    distribution, this = rank shift). All rank arithmetic is EXACT:
    average ranks are carried doubled (2·r̄ = 2·cum_before + t + 1,
    an integer), so the rank-sum R, the U statistic, and the tie term
    Σ(t³−t) are BIGINTs; the normal-approximation z is one
    identical-structure double expression at the end.

    Scale: one hash aggregate to per-value (count, group-count), one
    prefix sum over the distinct quantized-value spine (bounded by
    value resolution — the stat_ks_test shape), and a scalar combine."""
    e = table(spark, sf_dir, "events")
    q = e.filter(F.col("event_type").isin("purchase", "view")).select(
        F.round(F.col("value") * 10000).cast("long").alias("v"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("ia"),
    )
    g = q.groupBy("v").agg(
        F.sum("ia").alias("ca"), F.count(F.lit(1)).alias("t")
    )
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    wall = Window.partitionBy()
    c = g.select(
        "ca",
        "t",
        F.coalesce(F.sum("t").over(wv), F.lit(0)).alias("cum_before"),
        F.sum("ca").over(wall).alias("na"),
        F.sum(F.col("t") - F.col("ca")).over(wall).alias("nb"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .over(wall)
        .alias("tie3"),
    )
    s = c.agg(
        F.max("na").alias("na"),
        F.max("nb").alias("nb"),
        F.max("tie3").alias("tie3"),
        F.sum(
            F.col("ca") * (2 * F.col("cum_before") + F.col("t") + 1)
        ).alias("r2a"),
    )
    na, nb, tie3, r2a = (
        F.col("na"),
        F.col("nb"),
        F.col("tie3"),
        F.col("r2a"),
    )
    u2 = r2a - na * (na + 1)
    z = (u2.cast("double") - na.cast("double") * nb) / (
        2
        * F.sqrt(
            na.cast("double")
            * nb
            / 12
            * ((na + nb + 1) - tie3.cast("double") / ((na + nb) * (na + nb - 1)))
        )
    )
    return s.select(
        na.alias("n_a"),
        nb.alias("n_b"),
        u2.cast("long").alias("u2_a"),
        F.round(z, 6).alias("z"),
    )


PVM_Y0, PVM_Y1 = 1997, 1998


@register(
    "orders_price_volume_mix",
    oracle=f"""
        WITH s AS (
          SELECT o_orderpriority AS segment,
                 CAST(count(*) FILTER (WHERE year(o_orderdate) = {PVM_Y0})
                   AS BIGINT) AS n0,
                 CAST(count(*) FILTER (WHERE year(o_orderdate) = {PVM_Y1})
                   AS BIGINT) AS n1,
                 CAST(COALESCE(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                   FILTER (WHERE year(o_orderdate) = {PVM_Y0}), 0)
                   AS BIGINT) AS s0,
                 CAST(COALESCE(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                   FILTER (WHERE year(o_orderdate) = {PVM_Y1}), 0)
                   AS BIGINT) AS s1
          FROM orders
          WHERE year(o_orderdate) IN ({PVM_Y0}, {PVM_Y1})
          GROUP BY o_orderpriority
        )
        SELECT segment, n0, n1, s0, s1,
               CAST(s1 - s0 AS BIGINT) AS delta_cents,
               round((n1 - n0) * (CAST(s0 AS DOUBLE) / n0), 6) AS volume_eff,
               round((CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0) * n0,
                     6) AS price_eff,
               round((n1 - n0) * (CAST(s1 AS DOUBLE) / n1
                                  - CAST(s0 AS DOUBLE) / n0), 6) AS cross_eff
        FROM s WHERE n0 > 0 AND n1 > 0
    """,
)
def orders_price_volume_mix(spark, sf_dir):
    """Price–volume–mix bridge between two years, per priority
    segment — the FP&A decomposition ΔRev = Δn·p₀ + Δp·n₀ + Δn·Δp
    (volume, price, cross terms sum EXACTLY to Δcents by algebra, a
    property the test asserts to 1e-4 cents). Both years are
    accumulated in ONE conditional aggregate over the filtered fact
    scan (no self-join of year slices); counts and cents are exact
    BIGINTs, average order values appear only inside the three final
    identical-structure double expressions.

    Scale: single scan with the year-pair predicate pushed, map-side
    combinable FILTER aggregates, segment-sized output — the shape
    survives any fact-table size."""
    o = table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    y = F.year("o_orderdate")
    s = (
        o.filter(y.isin(PVM_Y0, PVM_Y1))
        .groupBy(F.col("o_orderpriority").alias("segment"))
        .agg(
            F.count_if(y == PVM_Y0).alias("n0"),
            F.count_if(y == PVM_Y1).alias("n1"),
            F.coalesce(F.sum(F.when(y == PVM_Y0, cents)), F.lit(0)).alias("s0"),
            F.coalesce(F.sum(F.when(y == PVM_Y1, cents)), F.lit(0)).alias("s1"),
        )
    )
    n0, n1, s0, s1 = F.col("n0"), F.col("n1"), F.col("s0"), F.col("s1")
    p0 = s0.cast("double") / n0
    p1 = s1.cast("double") / n1
    return s.filter((n0 > 0) & (n1 > 0)).select(
        "segment",
        "n0",
        "n1",
        "s0",
        "s1",
        (s1 - s0).cast("long").alias("delta_cents"),
        F.round((n1 - n0) * p0, 6).alias("volume_eff"),
        F.round((p1 - p0) * n0, 6).alias("price_eff"),
        F.round((n1 - n0) * (p1 - p0), 6).alias("cross_eff"),
    )


@register(
    "agg_benford_digit_test",
    oracle="""
        WITH d AS (
          SELECT CAST(substr(CAST(CAST(round(o_totalprice) AS BIGINT)
                       AS VARCHAR), 1, 1) AS BIGINT) AS digit
          FROM orders WHERE o_totalprice >= 1
        ),
        c AS (
          SELECT digit, count(*) AS n_obs,
                 CAST(sum(count(*)) OVER () AS BIGINT) AS n
          FROM d GROUP BY digit
        )
        SELECT digit, n_obs,
               round(n * log10(1 + 1.0 / digit), 6) AS expected,
               round((n_obs - n * log10(1 + 1.0 / digit))
                     * (n_obs - n * log10(1 + 1.0 / digit))
                     / (n * log10(1 + 1.0 / digit)), 6) AS chi2_contrib
        FROM c
    """,
)
def agg_benford_digit_test(spark, sf_dir):
    """Benford's-law first-digit test on order totals — the
    fraud/forensic-accounting screen: observed leading-digit counts vs
    the log10(1+1/d) expectation, with per-digit χ² contributions.
    Counts are exact (digit from the rounded integer's first
    character — same spelling both engines); expectation and χ² are
    one identical-structure double expression per digit. On TPC-H-like
    synthetic totals the χ² is deliberately large — the op's job is
    to MEASURE conformance, not assume it.

    Scale: one map-side-combinable count by digit (9 groups), one
    windowed total — O(1) state; the fact scan is the entire cost."""
    o = table(spark, sf_dir, "orders")
    digit = F.substring(
        F.round("o_totalprice").cast("long").cast("string"), 1, 1
    ).cast("long")
    c = (
        o.filter(F.col("o_totalprice") >= 1)
        .groupBy(digit.alias("digit"))
        .agg(F.count(F.lit(1)).alias("n_obs"))
        .withColumn("n", F.sum("n_obs").over(Window.partitionBy()))
    )
    expected = F.col("n") * F.log10(1 + 1.0 / F.col("digit"))
    return c.select(
        "digit",
        "n_obs",
        F.round(expected, 6).alias("expected"),
        F.round(
            (F.col("n_obs") - expected) * (F.col("n_obs") - expected) / expected,
            6,
        ).alias("chi2_contrib"),
    )


CCF_MAX_LAG = 3


@register(
    "events_cross_correlation",
    oracle=f"""
        WITH c AS (
          SELECT date_trunc('hour', ts) AS h,
                 CAST(count(*) FILTER (WHERE event_type = 'purchase')
                   AS BIGINT) AS xa,
                 CAST(count(*) FILTER (WHERE event_type = 'error')
                   AS BIGINT) AS xb
          FROM events GROUP BY 1
        ),
        tot AS (
          SELECT count(*) AS n, CAST(sum(xa) AS BIGINT) AS sa,
                 CAST(sum(xb) AS BIGINT) AS sb FROM c
        ),
        dens AS (
          SELECT CAST(sum((n * xa - sa) * (n * xa - sa)) AS BIGINT) AS da,
                 CAST(sum((n * xb - sb) * (n * xb - sb)) AS BIGINT) AS db
          FROM c, tot
        ),
        lags AS (
          SELECT l.l - {CCF_MAX_LAG} AS lag
          FROM unnest(range({2 * CCF_MAX_LAG + 1})) l(l)
        ),
        p AS (
          SELECT lag, a.xa AS xa, b.xb AS xb
          FROM lags, c a JOIN c b
            ON b.h = a.h + to_hours(CAST(lag AS BIGINT))
        )
        SELECT lag, count(*) AS n_pairs,
               round(CAST(sum((n * xa - sa) * (n * xb - sb)) AS DOUBLE)
                     / sqrt(CAST(max(da) AS DOUBLE) * max(db)), 6) AS ccf
        FROM p, tot, dens
        GROUP BY lag
    """,
)
def events_cross_correlation(spark, sf_dir):
    """Cross-correlation between the purchase-rate and error-rate
    hourly series at lags −3…+3 — the "which series LEADS" diagnostic
    (a peak at positive lag = errors follow purchases by that many
    hours). Same exact-integer discipline as ts_acf_lags: both series
    come from ONE conditional hourly aggregate, deviations are cleared
    to integers (N·x−S), numerators are BIGINT sums per lag, and the
    two variance denominators are computed once and broadcast; lag
    pairing is a true time-shift join, gap-safe.

    Scale: O(hours) after the single fact-scan rollup; the 7-lag
    fan-out is a broadcast dim. The same shape extends to any metric
    pair at 100 TB because the rollup, not the fact table, carries
    every downstream step."""
    e = table(spark, sf_dir, "events")
    c = e.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count_if(F.col("event_type") == "purchase").alias("xa"),
        F.count_if(F.col("event_type") == "error").alias("xb"),
    )
    wall = Window.partitionBy()
    tot = c.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xa").alias("sa"),
        F.sum("xb").alias("sb"),
    )
    dens = (
        c.crossJoin(F.broadcast(tot))
        .select(
            ((F.col("n") * F.col("xa") - F.col("sa"))
             * (F.col("n") * F.col("xa") - F.col("sa"))).alias("dxa"),
            ((F.col("n") * F.col("xb") - F.col("sb"))
             * (F.col("n") * F.col("xb") - F.col("sb"))).alias("dxb"),
        )
        .agg(F.sum("dxa").alias("da"), F.sum("dxb").alias("db"))
    )
    lags = spark.range(-CCF_MAX_LAG, CCF_MAX_LAG + 1).select(
        F.col("id").alias("lag")
    )
    a = c.crossJoin(F.broadcast(lags)).select("lag", "h", "xa")
    b = c.select(F.col("h").alias("hb"), "xb")
    p = a.join(
        b, b.hb == F.col("h") + F.col("lag") * F.expr("INTERVAL 1 HOUR")
    )
    num = F.sum(
        (F.col("n") * F.col("xa") - F.col("sa"))
        * (F.col("n") * F.col("xb") - F.col("sb"))
    )
    return (
        p.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(dens))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(
                num.cast("double")
                / F.sqrt(F.max("da").cast("double") * F.max("db")),
                6,
            ).alias("ccf"),
        )
    )


@register("agg_hll_error_audit")  # rows-only: HLL estimate is impl-defined
def agg_hll_error_audit(spark, sf_dir):
    """Sketch-quality audit for HyperLogLog: per event_type,
    approx_count_distinct(user_id) vs the EXACT distinct count, with
    the signed relative error in 1e-4 units — the dedup_minhash_
    error_audit sibling for the cardinality sketch. The default rsd
    is 5%; tests pin |err| ≤ 15% (3σ) per group plus double-run
    determinism (Spark's HLL is deterministic for fixed data: no RNG,
    just hashing).

    Scale: both aggregates are map-side combinable in the SAME
    groupBy pass — auditing the sketch costs one extra exact
    count-distinct at fixture scale; at 100 TB you audit on a sample
    or a small key slice, which this plan shape makes a filter."""
    e = table(spark, sf_dir, "events")
    g = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id").alias("estimate"),
    )
    err = (
        (F.col("estimate") - F.col("exact")).cast("double") / F.col("exact")
    )
    return g.select(
        "event_type",
        "exact",
        "estimate",
        F.round(err * 10000).cast("long").alias("rel_err_bp"),
    )


MARKOV_SPLIT = "2024-01-25"


@register(
    "events_markov_next_accuracy",
    oracle=f"""
        WITH seq AS (
          SELECT user_id, ts, event_type,
                 lead(event_type) OVER w AS next_type,
                 lead(ts) OVER w AS next_ts
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        tr AS (
          SELECT event_type AS prev, next_type AS nxt, next_ts
          FROM seq WHERE next_type IS NOT NULL
        ),
        model AS (
          SELECT prev, nxt AS predicted FROM (
            SELECT prev, nxt, count(*) AS c,
                   row_number() OVER (PARTITION BY prev
                                      ORDER BY count(*) DESC, nxt) AS rn
            FROM tr WHERE next_ts < TIMESTAMP '{MARKOV_SPLIT}'
            GROUP BY prev, nxt
          ) WHERE rn = 1
        ),
        ev AS (
          SELECT t.prev, t.nxt, m.predicted
          FROM tr t JOIN model m ON t.prev = m.prev
          WHERE t.next_ts >= TIMESTAMP '{MARKOV_SPLIT}'
        )
        SELECT count(*) AS n_eval,
               CAST(count(*) FILTER (WHERE nxt = predicted) AS BIGINT)
                 AS n_correct,
               round(CAST(count(*) FILTER (WHERE nxt = predicted) AS DOUBLE)
                     / count(*), 6) AS accuracy
        FROM ev
    """,
)
def events_markov_next_accuracy(spark, sf_dir):
    """First-order Markov next-event baseline with a TEMPORAL
    train/eval split — the sequence-model sanity floor every session
    recommender is judged against: train = transitions completing
    before Jan 25 (most-frequent next state per previous state, ties
    alphabetical), eval = later transitions, metric = exact top-1
    accuracy. Transitions come from one lead() window per user
    (event_id tiebreak), the model is a 5×5 count table picked by
    row_number, and the eval join broadcasts the 5-row model.

    Scale: the model is |states|²-sized regardless of data; the only
    data-sized work is the per-user window and two conditional
    aggregates — the canonical baseline-eval shape."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.lead("event_type").over(w).alias("nxt"),
        F.lead("ts").over(w).alias("next_ts"),
    ).filter(F.col("nxt").isNotNull())
    split = F.lit(MARKOV_SPLIT).cast("timestamp_ntz")
    wm = Window.partitionBy("prev").orderBy(F.desc("c"), F.asc("nxt"))
    model = (
        seq.filter(F.col("next_ts") < split)
        .groupBy(F.col("event_type").alias("prev"), "nxt")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("rn", F.row_number().over(wm))
        .filter(F.col("rn") == 1)
        .select("prev", F.col("nxt").alias("predicted"))
    )
    ev = (
        seq.filter(F.col("next_ts") >= split)
        .select(F.col("event_type").alias("prev"), "nxt")
        .join(F.broadcast(model), "prev")
    )
    correct = F.count_if(F.col("nxt") == F.col("predicted"))
    return ev.agg(
        F.count(F.lit(1)).alias("n_eval"),
        correct.alias("n_correct"),
        F.round(correct.cast("double") / F.count(F.lit(1)), 6).alias(
            "accuracy"
        ),
    )


@register(
    "stat_anova_f",
    oracle="""
        WITH x AS (
          SELECT o_orderpriority AS grp,
                 CAST(round(o_totalprice) AS BIGINT) AS v
          FROM orders
        ),
        g AS (
          SELECT grp, count(*) AS n_g,
                 CAST(sum(v) AS BIGINT) AS s_g,
                 CAST(sum(v * v) AS BIGINT) AS ss_g
          FROM x GROUP BY grp
        ),
        t AS (
          SELECT count(*) AS k,
                 CAST(sum(n_g) AS BIGINT) AS n,
                 CAST(sum(s_g) AS BIGINT) AS s,
                 CAST(sum(ss_g) AS BIGINT) AS ss,
                 CAST(sum(CAST(round(
                   CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE) / n_g
                 ) AS BIGINT)) AS BIGINT) AS tt
          FROM g
        )
        SELECT k, n,
               tt - CAST(round(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                         AS BIGINT) AS ssb_u,
               ss - tt AS ssw_u,
               round(
                 (CAST(tt - CAST(round(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                                       / n) AS BIGINT) AS DOUBLE) / (k - 1))
                 / (CAST(ss - tt AS DOUBLE) / (n - k)), 6) AS f_stat
        FROM t
    """,
)
def stat_anova_f(spark, sf_dir):
    """One-way ANOVA F statistic of order totals across the 5 order
    priorities, on dollar-rounded prices in BOTH engines so every sum
    of squares stays inside int64 (cents-squared would overflow at
    bench scale; same quantization as orders_gini_concentration). The
    between/within decomposition uses the computational form
    ``SSB = sum(S_g^2/n_g) - S^2/N`` with each per-group term rounded
    to an exact int64 BEFORE the cross-group sum, so the reported sums
    of squares are shuffle-order-proof; F is one identical-structure
    double expression over those ints, rounded to 6 dp.

    Scale: a single map-side-combinable groupBy over 5 keys followed
    by a scalar fold — scan-bound at any size."""
    o = table(spark, sf_dir, "orders")
    x = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice")).cast("long").alias("v"),
    )
    g = x.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum("v").alias("s_g"),
        F.sum(F.col("v") * F.col("v")).alias("ss_g"),
    )
    term = F.round(
        F.col("s_g").cast("double") * F.col("s_g").cast("double")
        / F.col("n_g")
    ).cast("long")
    t = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_g").alias("n"),
        F.sum("s_g").alias("s"),
        F.sum("ss_g").alias("ss"),
        F.sum(term).alias("tt"),
    )
    grand = F.round(
        F.col("s").cast("double") * F.col("s").cast("double") / F.col("n")
    ).cast("long")
    ssb = F.col("tt") - grand
    ssw = F.col("ss") - F.col("tt")
    return t.select(
        "k",
        "n",
        ssb.alias("ssb_u"),
        ssw.alias("ssw_u"),
        F.round(
            (ssb.cast("double") / (F.col("k") - 1))
            / (ssw.cast("double") / (F.col("n") - F.col("k"))),
            6,
        ).alias("f_stat"),
    )


@register(
    "events_rolling_wau",
    oracle="""
        WITH du AS (
          SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
        ),
        days AS (SELECT DISTINCT d FROM du)
        SELECT CAST(g.d AS VARCHAR) AS day,
               count(DISTINCT du.user_id) AS wau,
               count(*) AS n_user_days
        FROM days g JOIN du
          ON du.d BETWEEN g.d - 6 AND g.d
        GROUP BY g.d
    """,
)
def events_rolling_wau(spark, sf_dir):
    """Trailing-7-day rolling distinct active users (WAU) per calendar
    day — the rolling-distinct metric plain window frames cannot
    express (no COUNT(DISTINCT) over a frame in either engine). Exact
    spelling: collapse events to the DISTINCT (day, user) activity
    table first, then range-join the (tiny, broadcast) day spine
    against it over a 7-day band and COUNT(DISTINCT user) per spine
    day.

    Scale: the activity table is days x active-users (orders of
    magnitude below raw events) and the band join duplicates each
    activity row at most 7x against a broadcast spine — cost stays
    O(7 * |activity|) with no row-level global sort; the classic exact
    shape before switching to per-day HLL-sketch unions when even the
    activity table is too big."""
    e = table(spark, sf_dir, "events")
    du = e.select(
        F.to_date("ts").alias("d"), "user_id"
    ).distinct()
    days = du.select(F.col("d").alias("g_d")).distinct()
    j = F.broadcast(days).join(
        du,
        (F.col("d") >= F.date_sub(F.col("g_d"), 6))
        & (F.col("d") <= F.col("g_d")),
    )
    return j.groupBy(F.col("g_d").cast("string").alias("day")).agg(
        F.countDistinct("user_id").alias("wau"),
        F.count(F.lit(1)).alias("n_user_days"),
    )


MV_SPLIT = "2001-01-01"


@register(
    "agg_incremental_mv_merge",
    oracle="""
        SELECT o_orderpriority AS prio,
               CAST(year(o_orderdate) AS INT) AS yr,
               count(*) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS sum_cents,
               (CAST(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                          AS BIGINT) AS DOUBLE) / count(*)) / 100.0
                 AS avg_price
        FROM orders
        GROUP BY 1, 2
    """,
)
def agg_incremental_mv_merge(spark, sf_dir):
    """Incremental materialized-view maintenance: the accumulated MV
    state is a table of RE-AGGREGATABLE partials (count + exact cent
    sum per (priority, year)) persisted to parquet; a new batch
    (orders on/after MV_SPLIT) is partially aggregated the same way
    and MERGED into the state with one sum-of-partials groupBy. The
    oracle is the full recompute over all of orders — passing the hash
    proves merge(state, batch) == recompute(all), the algebraic
    property incremental MVs rely on.

    Scale: maintenance cost is O(new batch) + O(|MV| keys), never
    O(history) — the only way rolling aggregates stay cheap at 100 TB.
    Both passes are map-side-combinable; the merge shuffles |MV| rows
    (35 here). Finals (avg) are derived AFTER the merge, from exact
    int partials, so they are shuffle-order-proof."""
    import os

    from ..registry import scratch_dir

    o = table(spark, sf_dir, "orders")
    split = F.lit(MV_SPLIT).cast("timestamp_ntz")

    def partial(df):
        return df.groupBy(
            F.col("o_orderpriority").alias("prio"),
            F.year("o_orderdate").alias("yr"),
        ).agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            ).alias("sum_cents"),
        )

    base = scratch_dir("agg_incremental_mv_merge")
    state_path = os.path.join(base, "mv_state")
    partial(o.filter(F.col("o_orderdate") < split)).write.mode(
        "overwrite"
    ).parquet(state_path)
    state = spark.read.parquet(state_path)
    batch = partial(o.filter(F.col("o_orderdate") >= split))
    merged = (
        state.unionByName(batch)
        .groupBy("prio", "yr")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("sum_cents").alias("sum_cents"),
        )
    )
    return merged.select(
        "prio",
        "yr",
        "n_orders",
        "sum_cents",
        (
            (F.col("sum_cents").cast("double") / F.col("n_orders")) / 100.0
        ).alias("avg_price"),
    )


@register(
    "ts_holt_linear",
    oracle="""
        WITH RECURSIVE
        d AS (
          SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
          FROM events GROUP BY 1, 2
        ),
        i AS (
          SELECT event_type, y,
                 CAST(row_number() OVER (PARTITION BY event_type
                                         ORDER BY day) AS BIGINT) AS idx
          FROM d
        ),
        nn AS (SELECT event_type, max(idx) AS n_days FROM i GROUP BY 1),
        r AS (
          SELECT event_type, idx, CAST(y AS DOUBLE) AS l,
                 CAST(0 AS DOUBLE) AS b
          FROM i WHERE idx = 1
          UNION ALL
          SELECT i.event_type, i.idx,
                 0.5 * i.y + 0.5 * (r.l + r.b),
                 0.5 * ((0.5 * i.y + 0.5 * (r.l + r.b)) - r.l) + 0.5 * r.b
          FROM r JOIN i ON i.event_type = r.event_type
                       AND i.idx = r.idx + 1
        )
        SELECT r.event_type, nn.n_days,
               round(r.l, 6) AS level,
               round(r.b, 6) AS trend,
               round(r.l + 7 * r.b, 6) AS forecast_7d
        FROM r JOIN nn ON r.event_type = nn.event_type
                      AND r.idx = nn.n_days
    """,
)
def ts_holt_linear(spark, sf_dir):
    """Holt's linear-trend double exponential smoothing over each
    event type's daily count series (alpha = beta = 1/2, level seeded
    with the first observation, trend with 0), reporting the final
    level/trend state and the 7-day-ahead forecast. The recurrence is
    a JVM-side sequential fold: sort_array(collect_list(struct(day,y)))
    builds each ~30-element series, then ONE F.aggregate lambda carries
    the (level, trend) struct — no Python workers, unlike the
    applyInPandas spelling ts_ewma_smooth demonstrates. The DuckDB
    twin is a recursive CTE walking the identical step expression, so
    every intermediate is the same IEEE double in the same order
    (alpha = 1/2 keeps values exact binary fractions; 6 dp half-away
    rounding on both sides).

    Scale: events collapse to group-cardinality series in one
    map-side-combinable pass; the fold is O(series length) per key
    with parallelism = number of series — the shape that holds for
    millions of independent series, which is where Holt forecasting
    actually runs at 100 TB."""
    e = table(spark, sf_dir, "events")
    d = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    ser = d.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("day", "y"))).alias("s")
    )
    ys = F.expr("transform(s, p -> CAST(p.y AS DOUBLE))")
    arr = ser.select(
        "event_type", F.size("s").alias("n_days"), ys.alias("ys")
    )
    fold = F.aggregate(
        F.expr("slice(ys, 2, size(ys) - 1)"),
        F.struct(
            F.element_at("ys", 1).alias("l"), F.lit(0.0).alias("b")
        ),
        lambda acc, y: F.struct(
            (0.5 * y + 0.5 * (acc["l"] + acc["b"])).alias("l"),
            (
                0.5 * ((0.5 * y + 0.5 * (acc["l"] + acc["b"])) - acc["l"])
                + 0.5 * acc["b"]
            ).alias("b"),
        ),
    )
    out = arr.select("event_type", "n_days", fold.alias("st"))
    return out.select(
        "event_type",
        "n_days",
        F.round(F.col("st.l"), 6).alias("level"),
        F.round(F.col("st.b"), 6).alias("trend"),
        F.round(F.col("st.l") + 7 * F.col("st.b"), 6).alias("forecast_7d"),
    )


@register(
    "agg_decimal_exact",
    oracle="""
        SELECT o_orderpriority AS prio,
               count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)
                 AS sum_price_dec,
               CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)
                 AS min_price_dec,
               CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)
                 AS max_price_dec,
               round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                          AS DOUBLE) / count(*), 6) AS avg_price
        FROM orders GROUP BY 1
    """,
)
def agg_decimal_exact(spark, sf_dir):
    """Native DecimalType aggregation — the PRODUCTION answer to
    order-dependent money sums that the engine's dsum() integer trick
    emulates: cast the fixed-2-decimal price to DECIMAL(18,2) and let
    the engine sum exactly (decimal addition is associative and
    commutative, so shuffle-merge order cannot change the result —
    no quantization gymnastics needed). Sum/min/max stay decimal end
    to end; the average is derived from the exact decimal sum with a
    single double division. Both engines recover the same decimal
    from the same double bit pattern (the money columns are exact
    2-decimal values, FIXTURES.md), and both widen the sum's
    precision so it cannot overflow.

    Scale: a plain map-side-combinable hash aggregate; decimal
    arithmetic costs ~2x long arithmetic JVM-side but removes the
    int64-headroom ceiling the quantized-sum spelling hits at very
    large row counts — at 100 TB this spelling is the default and
    dsum() is the micro-optimization, not the other way around."""
    o = table(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    return o.groupBy(F.col("o_orderpriority").alias("prio")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec).cast("string").alias("sum_price_dec"),
        F.min(dec).cast("string").alias("min_price_dec"),
        F.max(dec).cast("string").alias("max_price_dec"),
        F.round(
            F.sum(dec).cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_price"),
    )


DID_SPLIT = "2024-01-16"


@register(
    "events_uplift_did",
    oracle=f"""
        WITH cell AS (
          SELECT CAST(user_id % 2 = 0 AS INT) AS treat,
                 CAST(ts >= TIMESTAMP '{DID_SPLIT}' AS INT) AS post,
                 count(*) AS n,
                 CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
          FROM events GROUP BY 1, 2
        ),
        m AS (
          SELECT
            CAST(max(CASE WHEN treat = 1 AND post = 1 THEN cents END)
                 AS DOUBLE)
              / max(CASE WHEN treat = 1 AND post = 1 THEN n END) AS tp,
            CAST(max(CASE WHEN treat = 1 AND post = 0 THEN cents END)
                 AS DOUBLE)
              / max(CASE WHEN treat = 1 AND post = 0 THEN n END) AS tb,
            CAST(max(CASE WHEN treat = 0 AND post = 1 THEN cents END)
                 AS DOUBLE)
              / max(CASE WHEN treat = 0 AND post = 1 THEN n END) AS cp,
            CAST(max(CASE WHEN treat = 0 AND post = 0 THEN cents END)
                 AS DOUBLE)
              / max(CASE WHEN treat = 0 AND post = 0 THEN n END) AS cb,
            CAST(sum(n) AS BIGINT) AS n_events
          FROM cell
        )
        SELECT n_events,
               round(tp, 6) AS treat_post_mean_cents,
               round(tb, 6) AS treat_pre_mean_cents,
               round(cp, 6) AS control_post_mean_cents,
               round(cb, 6) AS control_pre_mean_cents,
               round((tp - tb) - (cp - cb), 6) AS did_cents
        FROM m
    """,
)
def events_uplift_did(spark, sf_dir):
    """Difference-in-differences uplift estimate over a synthetic
    assignment (treat = even user_id, documented as the A/B hash split
    production experiments use; post = on/after DID_SPLIT):
    DiD = (treated post − pre) − (control post − pre) on mean event
    value in cents. The four cell means come from ONE conditional
    rollup of exact integer cent sums and counts; every mean and the
    DiD contrast are identical-structure double expressions over those
    ints, rounded to 6 dp.

    Scale: a single map-side-combinable pass producing a 4-row cell
    table, then a scalar fold — the causal-inference primitive at
    scan-bound cost."""
    e = table(spark, sf_dir, "events")
    split = F.lit(DID_SPLIT).cast("timestamp_ntz")
    cell = e.groupBy(
        (F.col("user_id") % 2 == 0).cast("int").alias("treat"),
        (F.col("ts") >= split).cast("int").alias("post"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
    )

    def mean_of(t, p):
        cents = F.max(
            F.when((F.col("treat") == t) & (F.col("post") == p), F.col("cents"))
        )
        n = F.max(
            F.when((F.col("treat") == t) & (F.col("post") == p), F.col("n"))
        )
        return cents.cast("double") / n

    m = cell.agg(
        mean_of(1, 1).alias("tp"),
        mean_of(1, 0).alias("tb"),
        mean_of(0, 1).alias("cp"),
        mean_of(0, 0).alias("cb"),
        F.sum("n").alias("n_events"),
    )
    return m.select(
        "n_events",
        F.round(F.col("tp"), 6).alias("treat_post_mean_cents"),
        F.round(F.col("tb"), 6).alias("treat_pre_mean_cents"),
        F.round(F.col("cp"), 6).alias("control_post_mean_cents"),
        F.round(F.col("cb"), 6).alias("control_pre_mean_cents"),
        F.round(
            (F.col("tp") - F.col("tb")) - (F.col("cp") - F.col("cb")), 6
        ).alias("did_cents"),
    )


@register(
    "events_markov_entropy_rate",
    oracle="""
        WITH seq AS (
          SELECT event_type AS prev,
                 lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                 ) AS nxt
          FROM events
        ),
        c AS (
          SELECT prev, nxt, count(*) AS c_ij
          FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
        ),
        r AS (
          SELECT prev, CAST(sum(c_ij) AS BIGINT) AS c_i
          FROM c GROUP BY 1
        ),
        t AS (
          SELECT CAST(sum(c_ij) AS BIGINT) AS n,
                 count(DISTINCT prev) AS k
          FROM c
        ),
        terms AS (
          SELECT CAST(round(
                   1000000.0 * (CAST(c.c_ij AS DOUBLE) / t.n)
                   * ln(CAST(c.c_ij AS DOUBLE) / r.c_i)
                 ) AS BIGINT) AS u
          FROM c JOIN r ON c.prev = r.prev, t
        )
        SELECT t.n AS n_transitions,
               CAST(t.k AS BIGINT) AS n_states,
               round(-CAST(sum(terms.u) AS DOUBLE) / 1000000.0, 6)
                 AS entropy_rate_nats,
               round(ln(t.k), 6) AS max_entropy_nats
        FROM terms, t
        GROUP BY t.n, t.k
    """,
)
def events_markov_entropy_rate(spark, sf_dir):
    """Entropy rate of the first-order event-type Markov chain:
    H = -sum_ij (c_ij/N) * ln(c_ij/c_i) over per-user transition
    counts — how predictable the NEXT event is given the current one
    (the information-theoretic summary the Markov baseline op's
    accuracy approximates). Every summand is micro-nat-quantized to
    int64 before the cross-cell sum (shuffle-order-proof; the memory
    discipline that has held cross-engine for every ln-based op), and
    the max-entropy bound ln(k) is reported for calibration.

    Scale: transition counts are one window pass per user partition
    followed by a map-side-combinable groupBy to a k*k cell table
    (25 here) — the chain statistics are tiny regardless of corpus
    size."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("prev"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    c = seq.groupBy("prev", "nxt").agg(F.count(F.lit(1)).alias("c_ij"))
    r = c.groupBy("prev").agg(F.sum("c_ij").alias("c_i"))
    t = c.agg(
        F.sum("c_ij").alias("n"),
        F.countDistinct("prev").alias("k"),
    )
    terms = (
        c.join(F.broadcast(r), "prev")
        .crossJoin(F.broadcast(t))
        .select(
            F.round(
                1000000.0
                * (F.col("c_ij").cast("double") / F.col("n"))
                * F.log(F.col("c_ij").cast("double") / F.col("c_i"))
            )
            .cast("long")
            .alias("u"),
            "n",
            "k",
        )
    )
    return terms.groupBy("n", "k").agg(
        F.round(-F.sum("u").cast("double") / 1000000.0, 6).alias(
            "entropy_rate_nats"
        ),
        F.round(F.log(F.col("k").cast("double")), 6).alias(
            "max_entropy_nats"
        ),
    ).select(
        F.col("n").alias("n_transitions"),
        F.col("k").cast("long").alias("n_states"),
        "entropy_rate_nats",
        "max_entropy_nats",
    )


@register(
    "events_attribution_last_touch",
    oracle="""
        WITH seq AS (
          SELECT event_type, value,
                 last_value(CASE WHEN event_type <> 'purchase'
                                 THEN event_type END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS chan
          FROM events
        )
        SELECT coalesce(chan, 'direct') AS channel,
               count(*) AS n_purchases,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                 AS attributed_cents
        FROM seq WHERE event_type = 'purchase'
        GROUP BY 1
    """,
)
def events_attribution_last_touch(spark, sf_dir):
    """Last-touch marketing attribution: each purchase's value is
    credited to the user's most recent PRECEDING non-purchase event
    type (the "channel"), falling back to 'direct' when the purchase
    is the user's first touch. One IGNORE-NULLS last_value window per
    user plus a conditional rollup of exact cent sums — the revenue
    attribution report every growth team runs.

    Scale: the window is per-user partitioned (no global sort), the
    rollup map-side-combinable over |channels| keys; at 100 TB this
    is one shuffle keyed user_id then a tiny aggregation."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    chan = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    seq = e.select("event_type", "value", chan.alias("chan"))
    return (
        seq.filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce(F.col("chan"), F.lit("direct")).alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "attributed_cents"
            ),
        )
    )


@register(
    "agg_weighted_median",
    oracle="""
        WITH v AS (
          SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
                 CAST(l_quantity AS BIGINT) AS w
          FROM lineitem
        ),
        g AS (SELECT cents, CAST(sum(w) AS BIGINT) AS wg FROM v GROUP BY 1),
        c AS (
          SELECT cents, wg,
                 CAST(sum(wg) OVER (ORDER BY cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cumw
          FROM g
        ),
        t AS (SELECT CAST(sum(wg) AS BIGINT) AS totw FROM g)
        SELECT t.totw AS total_weight,
               CAST(min(c.cents) AS BIGINT) AS weighted_median_cents
        FROM c, t
        WHERE 2 * c.cumw >= t.totw
        GROUP BY t.totw
    """,
)
def agg_weighted_median(spark, sf_dir):
    """Exact quantity-weighted median price — the 'typical transacted
    price' that an unweighted median misstates when big orders cluster
    at one end. Spelling: collapse to the distinct-price spine with
    integer weight sums (quantities are integral, FIXTURES-exact),
    one ordered prefix sum over the spine, then the smallest price
    whose doubled cumulative weight reaches the total (2*cumw >= totw
    keeps the midpoint test in exact integers — no fractional
    comparison anywhere).

    Scale: same discipline as the other spine ops — the ordered pass
    runs over DISTINCT prices, everything else is map-side
    combinable."""
    li = table(spark, sf_dir, "lineitem")
    v = li.select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    g = v.groupBy("cents").agg(F.sum("w").alias("wg"))
    wspine = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = g.select(
        "cents", F.sum("wg").over(wspine).alias("cumw")
    )
    t = g.agg(F.sum("wg").alias("totw"))
    return (
        c.crossJoin(F.broadcast(t))
        .filter(2 * F.col("cumw") >= F.col("totw"))
        .groupBy(F.col("totw").alias("total_weight"))
        .agg(F.min("cents").alias("weighted_median_cents"))
    )


@register(
    "orders_interpurchase_median",
    oracle="""
        WITH seq AS (
          SELECT o_custkey,
                 CAST(CAST(o_orderdate AS DATE)
                      - lag(CAST(o_orderdate AS DATE)) OVER (
                          PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey
                        ) AS BIGINT) AS gap_days
          FROM orders
        ),
        v AS (SELECT gap_days FROM seq WHERE gap_days IS NOT NULL),
        g AS (SELECT gap_days, count(*) AS n_g FROM v GROUP BY 1),
        c AS (
          SELECT gap_days,
                 CAST(sum(n_g) OVER (ORDER BY gap_days
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cumn
          FROM g
        ),
        t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v)
        SELECT t.n AS n_gaps,
               CAST(min(c.gap_days) AS BIGINT) AS median_gap_days,
               (SELECT CAST(min(gap_days) AS BIGINT) FROM v)
                 AS min_gap_days,
               (SELECT CAST(max(gap_days) AS BIGINT) FROM v)
                 AS max_gap_days
        FROM c, t
        WHERE 2 * c.cumn >= t.n
        GROUP BY t.n
    """,
)
def orders_interpurchase_median(spark, sf_dir):
    """Median days between a customer's consecutive orders — the
    repeat-purchase cadence that drives replenishment and churn
    models. Per-customer gaps come from one lag window (integer day
    differences, exact); the median uses the doubled-cumulative-count
    integer midpoint test on the distinct-gap spine, with exact
    min/max for the range.

    Scale: the lag window is per-customer partitioned; the spine
    prefix-sum runs over distinct gap values (bounded by the date
    range, not the row count)."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    day = F.col("o_orderdate").cast("date")
    seq = o.select(
        (
            F.datediff(day, F.lag(day).over(w))
        ).cast("long").alias("gap_days")
    )
    v = seq.filter(F.col("gap_days").isNotNull())
    g = v.groupBy("gap_days").agg(F.count(F.lit(1)).alias("n_g"))
    wc = Window.orderBy("gap_days").rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = g.select("gap_days", F.sum("n_g").over(wc).alias("cumn"))
    t = v.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("gap_days").alias("mn"),
        F.max("gap_days").alias("mx"),
    )
    return (
        c.crossJoin(F.broadcast(t))
        .filter(2 * F.col("cumn") >= F.col("n"))
        .groupBy(F.col("n").alias("n_gaps"), "mn", "mx")
        .agg(F.min("gap_days").alias("median_gap_days"))
        .select(
            "n_gaps",
            "median_gap_days",
            F.col("mn").alias("min_gap_days"),
            F.col("mx").alias("max_gap_days"),
        )
    )


@register(
    "stat_powerlaw_alpha_mle",
    oracle="""
        WITH x AS (
          SELECT user_id, count(*) AS c FROM events GROUP BY 1
        ),
        mn AS (SELECT CAST(min(c) AS BIGINT) AS xmin FROM x),
        g AS (SELECT c, count(*) AS n_c FROM x GROUP BY 1),
        terms AS (
          SELECT g.n_c,
                 CAST(round(1000000.0
                       * ln(CAST(g.c AS DOUBLE) / mn.xmin))
                      AS BIGINT) AS u
          FROM g, mn
        ),
        t AS (
          SELECT CAST(sum(n_c) AS BIGINT) AS n,
                 CAST(sum(n_c * u) AS BIGINT) AS su
          FROM terms
        )
        SELECT t.n AS n_users, mn.xmin,
               round(1.0 + CAST(t.n AS DOUBLE) * 1000000.0 / t.su, 6)
                 AS alpha_mle
        FROM t, mn
    """,
)
def stat_powerlaw_alpha_mle(spark, sf_dir):
    """Continuous-approximation power-law exponent MLE (Clauset et
    al.) for the per-user activity distribution:
    alpha = 1 + n / sum(ln(x_i / xmin)) with xmin the observed
    minimum. The log terms are computed once per DISTINCT count value
    and micro-nat-quantized to int64 before the weighted sum
    (shuffle-order-proof), so the only doubles are the final
    expression — the heavy-tail diagnostic that tells you whether
    top-user truncation or per-key salting will be needed downstream.

    Scale: activity counts are one map-side-combinable groupBy; the
    spine of distinct counts is bounded by the activity range, so the
    MLE fold is tiny at any corpus size."""
    e = table(spark, sf_dir, "events")
    x = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
    mn = x.agg(F.min("c").alias("xmin"))
    g = x.groupBy("c").agg(F.count(F.lit(1)).alias("n_c"))
    terms = g.crossJoin(F.broadcast(mn)).select(
        "n_c",
        F.round(
            1000000.0
            * F.log(F.col("c").cast("double") / F.col("xmin"))
        )
        .cast("long")
        .alias("u"),
        "xmin",
    )
    t = terms.groupBy("xmin").agg(
        F.sum("n_c").alias("n"),
        F.sum(F.col("n_c") * F.col("u")).alias("su"),
    )
    return t.select(
        F.col("n").alias("n_users"),
        "xmin",
        F.round(
            1.0 + F.col("n").cast("double") * 1000000.0 / F.col("su"), 6
        ).alias("alpha_mle"),
    )


@register(
    "stat_runs_test",
    oracle="""
        WITH d AS (
          SELECT CAST(ts AS DATE) AS day, count(*) AS c
          FROM events GROUP BY 1
        ),
        s AS (
          SELECT day,
                 c - lag(c) OVER (ORDER BY day) AS diff
          FROM d
        ),
        sg AS (
          SELECT day, CASE WHEN diff > 0 THEN 1 ELSE -1 END AS sgn
          FROM s WHERE diff IS NOT NULL AND diff <> 0
        ),
        r AS (
          SELECT sgn,
                 CASE WHEN sgn = lag(sgn) OVER (ORDER BY day)
                      THEN 0 ELSE 1 END AS is_new_run
          FROM sg
        ),
        t AS (
          SELECT CAST(count(*) FILTER (WHERE sgn = 1) AS BIGINT) AS n_up,
                 CAST(count(*) FILTER (WHERE sgn = -1) AS BIGINT)
                   AS n_down,
                 CAST(sum(coalesce(is_new_run, 1)) AS BIGINT) AS n_runs
          FROM r
        )
        SELECT n_up, n_down, n_runs,
               round(1.0 + 2.0 * n_up * n_down / (n_up + n_down), 6)
                 AS expected_runs,
               round((n_runs - (1.0 + 2.0 * n_up * n_down
                                / (n_up + n_down)))
                     / sqrt(
                         (2.0 * n_up * n_down
                          * (2.0 * n_up * n_down - n_up - n_down))
                         / ((n_up + n_down) * (n_up + n_down)
                            * (n_up + n_down - 1.0))
                       ), 6) AS z_score
        FROM t
    """,
)
def stat_runs_test(spark, sf_dir):
    """Wald–Wolfowitz runs test for randomness of the daily
    event-count direction series: sign the day-over-day differences
    (zeros dropped), count maximal same-sign runs with one lag
    window, and compare to the null expectation
    E[R] = 1 + 2*n+*n−/n with the classical variance — too few runs
    means trending, too many means oscillation. Counts are exact
    int64; the expectation and z-score are one identical double
    expression each.

    Scale: the sign series lives on the day spine (30 rows here);
    everything upstream is a map-side-combinable daily rollup."""
    e = table(spark, sf_dir, "events")
    d = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    wday = Window.orderBy("day")
    s = d.select(
        "day", (F.col("c") - F.lag("c").over(wday)).alias("diff")
    )
    sg = s.filter(
        F.col("diff").isNotNull() & (F.col("diff") != 0)
    ).select(
        "day",
        F.when(F.col("diff") > 0, F.lit(1)).otherwise(F.lit(-1)).alias(
            "sgn"
        ),
    )
    r = sg.select(
        "sgn",
        F.when(
            F.col("sgn") == F.lag("sgn").over(wday), F.lit(0)
        ).otherwise(F.lit(1)).alias("is_new_run"),
    )
    t = r.agg(
        F.count_if(F.col("sgn") == 1).alias("n_up"),
        F.count_if(F.col("sgn") == -1).alias("n_down"),
        F.sum(F.coalesce(F.col("is_new_run"), F.lit(1))).alias("n_runs"),
    )
    nu, nd, nr = F.col("n_up"), F.col("n_down"), F.col("n_runs")
    er = 1.0 + 2.0 * nu * nd / (nu + nd)
    var = (2.0 * nu * nd * (2.0 * nu * nd - nu - nd)) / (
        (nu + nd) * (nu + nd) * (nu + nd - 1.0)
    )
    return t.select(
        "n_up",
        "n_down",
        "n_runs",
        F.round(er, 6).alias("expected_runs"),
        F.round((nr - er) / F.sqrt(var), 6).alias("z_score"),
    )


@register(
    "events_cuped_adjustment",
    oracle=f"""
        WITH u AS (
          SELECT user_id,
                 CAST(sum(CASE WHEN ts < TIMESTAMP '{DID_SPLIT}'
                          THEN CAST(round(value) AS BIGINT) ELSE 0 END)
                      AS BIGINT) AS x,
                 CAST(sum(CASE WHEN ts >= TIMESTAMP '{DID_SPLIT}'
                          THEN CAST(round(value) AS BIGINT) ELSE 0 END)
                      AS BIGINT) AS y
          FROM events GROUP BY user_id
        ),
        t AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * y) AS BIGINT) AS sxy,
                 CAST(sum(x * x) AS BIGINT) AS sxx,
                 CAST(sum(y * y) AS BIGINT) AS syy
          FROM u
        )
        SELECT n AS n_users,
               round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / (CAST(n AS DOUBLE) * sxx
                        - CAST(sx AS DOUBLE) * sx), 6) AS theta,
               round(
                 ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                  * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy))
                 / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * (CAST(n AS DOUBLE) * syy
                       - CAST(sy AS DOUBLE) * sy)), 6)
                 AS var_reduction
        FROM t
    """,
)
def events_cuped_adjustment(spark, sf_dir):
    """CUPED (controlled-experiment using pre-experiment data): the
    variance-reduction workhorse of modern A/B platforms. Per user,
    X = pre-period and Y = post-period dollar totals (same DID_SPLIT
    as the uplift op); theta = cov(X,Y)/var(X) is the optimal linear
    adjustment, and the achievable variance reduction equals rho² —
    both computed from ONE pass of exact int64 user-level sums, with
    the n-scaled cross products cast to double BEFORE multiplying
    (cents-level sums of squares would overflow int64 at bench scale;
    dollars hold — same unit discipline as stat_anova_f).

    Scale: one keyed rollup to users, one scalar co-moment fold —
    scan-bound, the cheapest variance win an experimentation platform
    ever gets."""
    e = table(spark, sf_dir, "events")
    split = F.lit(DID_SPLIT).cast("timestamp_ntz")
    dollars = F.round(F.col("value")).cast("long")
    u = e.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < split, dollars).otherwise(0)).alias("x"),
        F.sum(F.when(F.col("ts") >= split, dollars).otherwise(0)).alias(
            "y"
        ),
    )
    t = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    cov_n = n * F.col("sxy") - sx * F.col("sy")
    varx_n = n * F.col("sxx") - sx * F.col("sx")
    vary_n = n * F.col("syy") - sy * F.col("sy")
    return t.select(
        F.col("n").alias("n_users"),
        F.round(cov_n / varx_n, 6).alias("theta"),
        F.round((cov_n * cov_n) / (varx_n * vary_n), 6).alias(
            "var_reduction"
        ),
    )


@register(
    "stat_ratio_delta_method",
    oracle=f"""
        WITH u AS (
          SELECT user_id,
                 CAST(user_id % 2 = 0 AS INT) AS treat,
                 count(*) AS x,
                 CAST(sum(CAST(round(value) AS BIGINT)) AS BIGINT) AS y
          FROM events GROUP BY 1, 2
        ),
        t AS (
          SELECT treat,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * y) AS BIGINT) AS sxy,
                 CAST(sum(x * x) AS BIGINT) AS sxx,
                 CAST(sum(y * y) AS BIGINT) AS syy
          FROM u GROUP BY treat
        )
        SELECT treat, n,
               round(CAST(sy AS DOUBLE) / sx, 6) AS ratio,
               round(sqrt(greatest(0.0,
                 (CAST(n AS DOUBLE) / ((n - 1.0) * sx * sx))
                 * ((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n)
                    - 2.0 * (CAST(sy AS DOUBLE) / sx)
                      * (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
                    + (CAST(sy AS DOUBLE) / sx) * (CAST(sy AS DOUBLE) / sx)
                      * (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n))
               )), 6) AS se_delta
        FROM t
    """,
)
def stat_ratio_delta_method(spark, sf_dir):
    """Delta-method standard error for a RATIO metric (dollars per
    event) per experiment arm — the correction every experimentation
    platform needs because users, not events, are the randomization
    unit, so naive per-event SEs are wrong. With user-level (x =
    events, y = dollars): ratio = sum(y)/sum(x) and
    Var ≈ n/((n−1)·sx²) · (Syy − 2R·Sxy + R²·Sxx) over user-level
    centered co-moments — all derived from ONE pass of exact int64
    sums, squared/centered in identical double expressions (dollar
    units for int64 headroom, as in events_cuped_adjustment).

    Scale: one keyed rollup to users + a 2-row fold — scan-bound."""
    e = table(spark, sf_dir, "events")
    u = e.groupBy(
        "user_id",
        (F.col("user_id") % 2 == 0).cast("int").alias("treat"),
    ).agg(
        F.count(F.lit(1)).alias("x"),
        F.sum(F.round(F.col("value")).cast("long")).alias("y"),
    )
    t = u.groupBy("treat").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx_d, sy_d = F.col("sx").cast("double"), F.col("sy").cast("double")
    r = sy_d / F.col("sx")
    syy_c = F.col("syy").cast("double") - sy_d * F.col("sy") / F.col("n")
    sxy_c = F.col("sxy").cast("double") - sx_d * F.col("sy") / F.col("n")
    sxx_c = F.col("sxx").cast("double") - sx_d * F.col("sx") / F.col("n")
    var = (n / ((F.col("n") - 1.0) * F.col("sx") * F.col("sx"))) * (
        syy_c - 2.0 * r * sxy_c + r * r * sxx_c
    )
    return t.select(
        "treat",
        "n",
        F.round(r, 6).alias("ratio"),
        F.round(F.sqrt(F.greatest(F.lit(0.0), var)), 6).alias("se_delta"),
    )


MIGRATION_SPLIT = "1999-01-01"
SEG_LO_CENTS = 50000000  # $500k
SEG_HI_CENTS = 120000000  # $1.2M


@register(
    "orders_customer_migration_matrix",
    oracle=f"""
        WITH s AS (
          SELECT o_custkey,
                 CAST(o_orderdate >= TIMESTAMP '{MIGRATION_SPLIT}' AS INT)
                   AS p,
                 CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                      AS BIGINT) AS cents
          FROM orders GROUP BY 1, 2
        ),
        seg AS (
          SELECT o_custkey, p,
                 CASE WHEN cents >= {SEG_HI_CENTS} THEN 'high'
                      WHEN cents >= {SEG_LO_CENTS} THEN 'mid'
                      ELSE 'low' END AS segment
          FROM s
        ),
        m AS (
          SELECT coalesce(a.segment, 'absent') AS seg_pre,
                 coalesce(b.segment, 'absent') AS seg_post
          FROM (SELECT o_custkey, segment FROM seg WHERE p = 0) a
          FULL JOIN (SELECT o_custkey, segment FROM seg WHERE p = 1) b
            ON a.o_custkey = b.o_custkey
        )
        SELECT seg_pre, seg_post, count(*) AS n_customers
        FROM m GROUP BY 1, 2
    """,
)
def orders_customer_migration_matrix(spark, sf_dir):
    """Customer value-segment migration matrix across two periods —
    the retention/upgrade report behind "are our high-value customers
    downgrading?": per period each customer lands in a fixed-cutoff
    spend band (documented dollar thresholds; fixed cutoffs keep the
    matrix comparable period over period, unlike quantile bands that
    move with the distribution), a FULL outer join aligns the
    periods, and absences map to an explicit 'absent' state so churn
    and acquisition appear as matrix rows/columns rather than
    vanishing.

    Scale: two keyed rollups + one customer-keyed full join + a
    16-cell rollup — all map-side-combinable or key-partitioned."""
    o = table(spark, sf_dir, "orders")
    split = F.lit(MIGRATION_SPLIT).cast("timestamp_ntz")
    s = o.groupBy(
        "o_custkey",
        (F.col("o_orderdate") >= split).cast("int").alias("p"),
    ).agg(
        F.sum(
            F.round(F.col("o_totalprice") * 100).cast("long")
        ).alias("cents")
    )
    seg = s.select(
        "o_custkey",
        "p",
        F.when(F.col("cents") >= SEG_HI_CENTS, "high")
        .when(F.col("cents") >= SEG_LO_CENTS, "mid")
        .otherwise("low")
        .alias("segment"),
    )
    a = seg.filter(F.col("p") == 0).select(
        "o_custkey", F.col("segment").alias("sa")
    )
    b = seg.filter(F.col("p") == 1).select(
        "o_custkey", F.col("segment").alias("sb")
    )
    m = a.join(b, "o_custkey", "full")
    return m.groupBy(
        F.coalesce(F.col("sa"), F.lit("absent")).alias("seg_pre"),
        F.coalesce(F.col("sb"), F.lit("absent")).alias("seg_post"),
    ).agg(F.count(F.lit(1)).alias("n_customers"))


@register(
    "events_seasonal_zscore",
    oracle="""
        WITH h AS (
          SELECT CAST(ts AS DATE) AS day,
                 CAST(hour(ts) AS INT) AS hod,
                 count(*) AS c
          FROM events GROUP BY 1, 2
        ),
        base AS (
          SELECT hod,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(c) AS BIGINT) AS s,
                 CAST(sum(c * c) AS BIGINT) AS ss
          FROM h GROUP BY hod
        )
        SELECT CAST(h.day AS VARCHAR) AS day, h.hod, h.c AS n_events,
               CASE WHEN base.n * base.ss - base.s * base.s = 0 THEN NULL
                    ELSE round(
                      (CAST(h.c AS DOUBLE) * base.n - base.s)
                      / sqrt(CAST(base.n * base.ss - base.s * base.s
                                  AS DOUBLE)), 6)
               END AS seasonal_z
        FROM h JOIN base ON h.hod = base.hod
    """,
)
def events_seasonal_zscore(spark, sf_dir):
    """Seasonally-conditioned anomaly score: each (day, hour) count is
    z-scored against the SAME-HOUR-OF-DAY baseline across all days —
    3 AM traffic is judged against other 3 AMs, not the daily mean,
    which is what makes nightly spikes visible and lunchtime peaks
    unremarkable. Spelled shuffle-order-proof: per-hour-of-day
    baseline moments are exact int64 sums, and the z-score is one
    identical double expression (numerator and variance both scaled
    by n so no intermediate mean is materialized), NULL-guarded for
    zero-variance hours.

    Scale: hourly rollup (map-side-combinable) + a 24-row broadcast
    baseline join — scan-bound."""
    e = table(spark, sf_dir, "events")
    h = e.groupBy(
        F.col("ts").cast("date").alias("day"),
        F.hour("ts").alias("hod"),
    ).agg(F.count(F.lit(1)).alias("c"))
    base = h.groupBy("hod").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
    )
    j = h.join(F.broadcast(base), "hod")
    varn = F.col("n") * F.col("ss") - F.col("s") * F.col("s")
    z = F.when(varn == 0, F.lit(None).cast("double")).otherwise(
        F.round(
            (F.col("c").cast("double") * F.col("n") - F.col("s"))
            / F.sqrt(varn.cast("double")),
            6,
        )
    )
    return j.select(
        F.col("day").cast("string").alias("day"),
        "hod",
        F.col("c").alias("n_events"),
        z.alias("seasonal_z"),
    )


@register(
    "events_ab_srm_check",
    oracle="""
        WITH u AS (
          SELECT user_id, CAST(user_id % 2 = 0 AS INT) AS treat
          FROM events GROUP BY 1, 2
        ),
        t AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(count(*) FILTER (WHERE treat = 1) AS BIGINT) AS nt
          FROM u
        )
        SELECT n AS n_users, nt AS n_treat, n - nt AS n_control,
               round(
                 (CAST(nt AS DOUBLE) - CAST(n AS DOUBLE) / 2)
                 * (CAST(nt AS DOUBLE) - CAST(n AS DOUBLE) / 2)
                 / (CAST(n AS DOUBLE) / 2)
                 + (CAST(n - nt AS DOUBLE) - CAST(n AS DOUBLE) / 2)
                   * (CAST(n - nt AS DOUBLE) - CAST(n AS DOUBLE) / 2)
                   / (CAST(n AS DOUBLE) / 2), 6) AS chi2,
               ((CAST(nt AS DOUBLE) - CAST(n AS DOUBLE) / 2)
                * (CAST(nt AS DOUBLE) - CAST(n AS DOUBLE) / 2)
                / (CAST(n AS DOUBLE) / 2)
                + (CAST(n - nt AS DOUBLE) - CAST(n AS DOUBLE) / 2)
                  * (CAST(n - nt AS DOUBLE) - CAST(n AS DOUBLE) / 2)
                  / (CAST(n AS DOUBLE) / 2)) > 3.841459 AS srm_alarm
        FROM t
    """,
)
def events_ab_srm_check(spark, sf_dir):
    """Sample Ratio Mismatch guardrail — the FIRST check every
    experiment readout must pass: do the observed arm sizes match the
    designed 50/50 split? A 1-df chi-square against the expected
    halves, alarming above the 95% critical value (3.841459; a firing
    SRM invalidates the experiment regardless of its metric
    movements, usually exposing assignment or logging bugs). Counts
    are exact; chi2 is one identical double expression against
    literal expectations.

    Scale: one distinct-user rollup + a scalar fold — the cheapest
    guardrail in the experimentation suite (complements
    events_uplift_did / events_cuped_adjustment /
    stat_ratio_delta_method)."""
    e = table(spark, sf_dir, "events")
    u = e.groupBy(
        "user_id", (F.col("user_id") % 2 == 0).cast("int").alias("treat")
    ).agg(F.lit(1).alias("one"))
    t = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(F.col("treat") == 1).alias("nt"),
    )
    n = F.col("n").cast("double")
    nt = F.col("nt").cast("double")
    nc = (F.col("n") - F.col("nt")).cast("double")
    half = n / 2
    chi2 = (nt - half) * (nt - half) / half + (nc - half) * (nc - half) / half
    return t.select(
        F.col("n").alias("n_users"),
        F.col("nt").alias("n_treat"),
        (F.col("n") - F.col("nt")).alias("n_control"),
        F.round(chi2, 6).alias("chi2"),
        (chi2 > 3.841459).alias("srm_alarm"),
    )


@register(
    "stat_iqr_outlier_fences",
    oracle="""
        WITH v AS (
          SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
          FROM orders
        ),
        g AS (SELECT cents, count(*) AS n_g FROM v GROUP BY 1),
        c AS (
          SELECT cents,
                 CAST(sum(n_g) OVER (ORDER BY cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cumn
          FROM g
        ),
        t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
        q1 AS (SELECT min(cents) AS q1 FROM c, t WHERE 4 * cumn >= t.n),
        q3 AS (SELECT min(cents) AS q3 FROM c, t
               WHERE 4 * cumn >= 3 * t.n),
        f AS (
          SELECT q1.q1, q3.q3,
                 q1.q1 - 3 * (q3.q3 - q1.q1) // 2 AS lo_fence,
                 q3.q3 + 3 * (q3.q3 - q1.q1) // 2 AS hi_fence
          FROM q1, q3
        )
        SELECT t.n AS n_rows, f.q1 AS q1_cents, f.q3 AS q3_cents,
               f.lo_fence, f.hi_fence,
               CAST((SELECT count(*) FROM v
                     WHERE cents < f.lo_fence) AS BIGINT) AS n_low,
               CAST((SELECT count(*) FROM v
                     WHERE cents > f.hi_fence) AS BIGINT) AS n_high
        FROM t, f
    """,
)
def stat_iqr_outlier_fences(spark, sf_dir):
    """Tukey box-plot outlier screen on order totals: exact Q1/Q3 via
    the integer midpoint test on the distinct-price spine
    (4·cum ≥ n and 4·cum ≥ 3n — the same doubled-comparison trick as
    the medians, no fractional arithmetic), fences at ±1.5 IQR kept
    in integer cents (3·IQR/2 with integer floor division in BOTH
    engines), and exact counts beyond each fence. The
    distribution-free screen that needs no normality assumption,
    complementing the z-score/MAD family.

    Scale: spine prefix-sum + two broadcast-scalar filters — two
    scan-bound passes."""
    o = table(spark, sf_dir, "orders")
    v = o.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    g = v.groupBy("cents").agg(F.count(F.lit(1)).alias("n_g"))
    wc = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = g.select("cents", F.sum("n_g").over(wc).alias("cumn"))
    t = v.agg(F.count(F.lit(1)).alias("n"))
    ct = c.crossJoin(F.broadcast(t))
    q1 = ct.filter(4 * F.col("cumn") >= F.col("n")).agg(
        F.min("cents").alias("q1")
    )
    q3 = ct.filter(4 * F.col("cumn") >= 3 * F.col("n")).agg(
        F.min("cents").alias("q3")
    )
    f = (
        q1.crossJoin(q3)
        .select(
            "q1",
            "q3",
            (
                F.col("q1")
                - F.floor(3 * (F.col("q3") - F.col("q1")) / 2).cast("long")
            ).alias("lo_fence"),
            (
                F.col("q3")
                + F.floor(3 * (F.col("q3") - F.col("q1")) / 2).cast("long")
            ).alias("hi_fence"),
        )
    )
    j = v.crossJoin(F.broadcast(f))
    return (
        j.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.first("q1").alias("q1_cents"),
            F.first("q3").alias("q3_cents"),
            F.first("lo_fence").alias("lo_fence"),
            F.first("hi_fence").alias("hi_fence"),
            F.count_if(F.col("cents") < F.col("lo_fence")).alias("n_low"),
            F.count_if(F.col("cents") > F.col("hi_fence")).alias("n_high"),
        )
    )


@register(
    "stat_mann_kendall_trend",
    oracle="""
        WITH d AS (
          SELECT CAST(ts AS DATE) AS day, count(*) AS c
          FROM events GROUP BY 1
        ),
        prs AS (
          SELECT CASE WHEN b.c > a.c THEN 1
                      WHEN b.c < a.c THEN -1 ELSE 0 END AS sgn
          FROM d a JOIN d b ON a.day < b.day
        ),
        s AS (SELECT CAST(sum(sgn) AS BIGINT) AS s_stat,
                     CAST(count(*) AS BIGINT) AS n_pairs
              FROM prs),
        nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
        ties AS (
          SELECT CAST(coalesce(sum(tj * (tj - 1) * (2 * tj + 5)), 0)
                      AS BIGINT) AS tie_term
          FROM (SELECT count(*) AS tj FROM d GROUP BY c HAVING count(*) > 1)
        )
        SELECT nn.n AS n_days, s.s_stat,
               round((CAST(nn.n AS DOUBLE) * (nn.n - 1) * (2 * nn.n + 5)
                      - ties.tie_term) / 18.0, 6) AS var_s,
               round(CASE
                 WHEN s.s_stat > 0 THEN (s.s_stat - 1)
                   / sqrt((CAST(nn.n AS DOUBLE) * (nn.n - 1)
                           * (2 * nn.n + 5) - ties.tie_term) / 18.0)
                 WHEN s.s_stat < 0 THEN (s.s_stat + 1)
                   / sqrt((CAST(nn.n AS DOUBLE) * (nn.n - 1)
                           * (2 * nn.n + 5) - ties.tie_term) / 18.0)
                 ELSE 0.0 END, 6) AS z_score
        FROM s, nn, ties
    """,
)
def stat_mann_kendall_trend(spark, sf_dir):
    """Mann–Kendall trend test on the daily event-count series — the
    distribution-free "is this metric drifting?" test monitoring
    systems run when normality can't be assumed: S = sum of pairwise
    signs over all day pairs (exact int64), tie-corrected variance
    per the classical formula, and the continuity-corrected z. The
    pair join runs on the DAY SPINE (n² of 30, not of the corpus),
    which is exactly why the test stays exact instead of sampled.

    Scale: one daily rollup, one spine self-join (bounded by the
    date range squared), three scalar folds."""
    e = table(spark, sf_dir, "events")
    d = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    a = d.withColumnsRenamed({"day": "day_a", "c": "ca"})
    b = d.withColumnsRenamed({"day": "day_b", "c": "cb"})
    prs = a.join(b, F.col("day_a") < F.col("day_b")).select(
        F.when(F.col("cb") > F.col("ca"), 1)
        .when(F.col("cb") < F.col("ca"), -1)
        .otherwise(0)
        .alias("sgn")
    )
    s = prs.agg(
        F.sum("sgn").alias("s_stat"), F.count(F.lit(1)).alias("n_pairs")
    )
    nn = d.agg(F.count(F.lit(1)).alias("n"))
    tie_groups = (
        d.groupBy("c")
        .agg(F.count(F.lit(1)).alias("tj"))
        .filter(F.col("tj") > 1)
    )
    ties = tie_groups.agg(
        F.coalesce(
            F.sum(
                F.col("tj") * (F.col("tj") - 1) * (2 * F.col("tj") + 5)
            ),
            F.lit(0),
        ).alias("tie_term")
    )
    j = s.crossJoin(F.broadcast(nn)).crossJoin(F.broadcast(ties))
    n = F.col("n").cast("double")
    var_s = (n * (F.col("n") - 1) * (2 * F.col("n") + 5) - F.col(
        "tie_term"
    )) / 18.0
    sstat = F.col("s_stat")
    z = (
        F.when(sstat > 0, (sstat - 1) / F.sqrt(var_s))
        .when(sstat < 0, (sstat + 1) / F.sqrt(var_s))
        .otherwise(F.lit(0.0))
    )
    return j.select(
        F.col("n").alias("n_days"),
        "s_stat",
        F.round(var_s, 6).alias("var_s"),
        F.round(z, 6).alias("z_score"),
    )


@register(
    "stat_cohens_d_effect_size",
    oracle="""
        WITH u AS (
          SELECT user_id, CAST(user_id % 2 = 0 AS INT) AS treat,
                 CAST(sum(CAST(round(value) AS BIGINT)) AS BIGINT) AS y
          FROM events GROUP BY 1, 2
        ),
        g AS (
          SELECT treat, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(y) AS BIGINT) AS s,
                 CAST(sum(y * y) AS BIGINT) AS ss
          FROM u GROUP BY treat
        ),
        w AS (
          SELECT
            max(CASE WHEN treat = 1 THEN n END) AS n1,
            max(CASE WHEN treat = 1 THEN s END) AS s1,
            max(CASE WHEN treat = 1 THEN ss END) AS ss1,
            max(CASE WHEN treat = 0 THEN n END) AS n0,
            max(CASE WHEN treat = 0 THEN s END) AS s0,
            max(CASE WHEN treat = 0 THEN ss END) AS ss0
          FROM g
        )
        SELECT n1 AS n_treat, n0 AS n_control,
               round((CAST(s1 AS DOUBLE) / n1)
                     - (CAST(s0 AS DOUBLE) / n0), 6) AS mean_diff,
               round(((CAST(s1 AS DOUBLE) / n1) - (CAST(s0 AS DOUBLE) / n0))
                 / sqrt(
                     ((CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1)
                      + (CAST(ss0 AS DOUBLE) - CAST(s0 AS DOUBLE) * s0 / n0))
                     / (n1 + n0 - 2.0)
                   ), 6) AS cohens_d
        FROM w
    """,
)
def stat_cohens_d_effect_size(spark, sf_dir):
    """Cohen's d standardized effect size between experiment arms on
    user-level dollar totals — the magnitude measure that travels
    across experiments where raw mean differences (and p-values)
    don't: pooled-SD-standardized mean difference from ONE pass of
    exact int64 per-arm sums, centered sums of squares and the pooled
    variance as identical double expressions (dollar units for int64
    headroom, matching the rest of the experimentation suite).

    Scale: one keyed rollup + a 2-row pivot fold — scan-bound."""
    e = table(spark, sf_dir, "events")
    u = e.groupBy(
        "user_id", (F.col("user_id") % 2 == 0).cast("int").alias("treat")
    ).agg(F.sum(F.round(F.col("value")).cast("long")).alias("y"))
    g = u.groupBy("treat").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("s"),
        F.sum(F.col("y") * F.col("y")).alias("ss"),
    )

    def pick(t, col):
        return F.max(F.when(F.col("treat") == t, F.col(col)))

    w = g.agg(
        pick(1, "n").alias("n1"),
        pick(1, "s").alias("s1"),
        pick(1, "ss").alias("ss1"),
        pick(0, "n").alias("n0"),
        pick(0, "s").alias("s0"),
        pick(0, "ss").alias("ss0"),
    )
    m1 = F.col("s1").cast("double") / F.col("n1")
    m0 = F.col("s0").cast("double") / F.col("n0")
    css1 = F.col("ss1").cast("double") - F.col("s1").cast("double") * F.col(
        "s1"
    ) / F.col("n1")
    css0 = F.col("ss0").cast("double") - F.col("s0").cast("double") * F.col(
        "s0"
    ) / F.col("n0")
    pooled = (css1 + css0) / (F.col("n1") + F.col("n0") - 2.0)
    return w.select(
        F.col("n1").alias("n_treat"),
        F.col("n0").alias("n_control"),
        F.round(m1 - m0, 6).alias("mean_diff"),
        F.round((m1 - m0) / F.sqrt(pooled), 6).alias("cohens_d"),
    )


@register(
    "events_attribution_time_decay",
    oracle="""
        WITH p AS (
          SELECT user_id, ts AS p_ts, event_id AS p_id,
                 CAST(round(value * 100) AS BIGINT) AS cents
          FROM events WHERE event_type = 'purchase'
        ),
        tch AS (
          SELECT user_id, ts AS t_ts, event_type AS channel
          FROM events WHERE event_type <> 'purchase'
        ),
        j AS (
          SELECT p.p_id, p.cents, tch.channel,
                 CASE CAST(floor((epoch(p.p_ts) - epoch(tch.t_ts))
                                 / 86400) AS BIGINT)
                      WHEN 0 THEN 1.0 WHEN 1 THEN 0.5 ELSE 0.25
                 END AS w
          FROM p JOIN tch
            ON p.user_id = tch.user_id
           AND tch.t_ts < p.p_ts
           AND epoch(p.p_ts) - epoch(tch.t_ts) < 259200
        ),
        tot AS (
          SELECT p_id, sum(w) AS tw FROM j GROUP BY 1
        ),
        credit AS (
          SELECT j.channel,
                 CAST(round(1000000.0 * j.cents * j.w / tot.tw)
                      AS BIGINT) AS credit_u
          FROM j JOIN tot ON j.p_id = tot.p_id
        )
        SELECT channel,
               CAST(count(*) AS BIGINT) AS n_credited_touches,
               CAST(sum(credit_u) AS BIGINT) AS credit_u,
               round(CAST(sum(credit_u) AS DOUBLE) / 1000000.0 / 100.0, 4)
                 AS credited_dollars
        FROM credit GROUP BY channel
    """,
)
def events_attribution_time_decay(spark, sf_dir):
    """Multi-touch time-decay attribution — the fractional-credit
    model beyond events_attribution_last_touch's winner-take-all:
    every non-purchase touch within a 3-day lookback shares each
    purchase's revenue, weighted 1 / 0.5 / 0.25 by whole days of age
    (EXACT dyadic weights — no pow(), so per-purchase weight totals
    are exact binary fractions) and normalized per purchase. Each
    touch's credited micro-cents are rounded to int64 before the
    per-channel sum, so fan-out order can't move the hash. Purchases
    with no in-window touch drop out (the 'direct' bucket
    last-touch already reports).

    Scale: the purchase x touch join is per-user keyed with a 3-day
    band — O(purchases * touches-in-window) per user, the bounded
    fan-out every MTA pipeline accepts; both aggregations are
    map-side-combinable."""
    e = table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    tch = e.filter(F.col("event_type") != "purchase").select(
        "user_id", F.col("ts").alias("t_ts"), F.col("event_type").alias("channel")
    )
    age = F.unix_timestamp("p_ts") - F.unix_timestamp("t_ts")
    j = p.join(
        tch,
        (p.user_id == tch.user_id)
        & (F.col("t_ts") < F.col("p_ts"))
        & (age < 259200),
    ).select(
        "p_id",
        "cents",
        "channel",
        F.when(F.floor(age / 86400) == 0, F.lit(1.0))
        .when(F.floor(age / 86400) == 1, F.lit(0.5))
        .otherwise(F.lit(0.25))
        .alias("w"),
    )
    tot = j.groupBy("p_id").agg(F.sum("w").alias("tw"))
    credit = j.join(tot, "p_id").select(
        "channel",
        F.round(1000000.0 * F.col("cents") * F.col("w") / F.col("tw"))
        .cast("long")
        .alias("credit_u"),
    )
    return credit.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_credited_touches"),
        F.sum("credit_u").alias("credit_u"),
        F.round(
            F.sum("credit_u").cast("double") / 1000000.0 / 100.0, 4
        ).alias("credited_dollars"),
    )


@register(
    "orders_ship_leadtime_stats",
    oracle="""
        WITH lt AS (
          SELECT o.o_orderpriority AS prio,
                 CAST(CAST(l.l_shipdate AS DATE)
                      - CAST(o.o_orderdate AS DATE) AS BIGINT) AS days
          FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        ),
        g AS (SELECT prio, days, count(*) AS n_g FROM lt GROUP BY 1, 2),
        c AS (
          SELECT prio, days,
                 CAST(sum(n_g) OVER (PARTITION BY prio ORDER BY days
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cumn
          FROM g
        ),
        t AS (SELECT prio, CAST(count(*) AS BIGINT) AS n,
                     CAST(min(days) AS BIGINT) AS min_days,
                     CAST(max(days) AS BIGINT) AS max_days
              FROM lt GROUP BY 1),
        med AS (
          SELECT c.prio, CAST(min(c.days) AS BIGINT) AS median_days
          FROM c JOIN t ON c.prio = t.prio
          WHERE 2 * c.cumn >= t.n GROUP BY 1
        ),
        p90 AS (
          SELECT c.prio, CAST(min(c.days) AS BIGINT) AS p90_days
          FROM c JOIN t ON c.prio = t.prio
          WHERE 10 * c.cumn >= 9 * t.n GROUP BY 1
        )
        SELECT t.prio, t.n AS n_lines, t.min_days, t.max_days,
               med.median_days, p90.p90_days
        FROM t JOIN med ON t.prio = med.prio
               JOIN p90 ON t.prio = p90.prio
    """,
)
def orders_ship_leadtime_stats(spark, sf_dir):
    """Order-to-ship lead time by priority — the supply-chain SLA
    report: integer day gaps from the orders x lineitem join,
    with exact median and p90 per priority via the integer midpoint
    tests (2·cum ≥ n and 10·cum ≥ 9n) on each priority's distinct-gap
    spine — checking whether URGENT actually ships faster.

    Scale: the fact join is key-partitioned; the spine window is
    per-priority partitioned over distinct day values (bounded by
    the calendar, not row count)."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    lt = o.join(li, o.o_orderkey == li.l_orderkey).select(
        F.col("o_orderpriority").alias("prio"),
        F.datediff(
            F.col("l_shipdate").cast("date"),
            F.col("o_orderdate").cast("date"),
        ).cast("long").alias("days"),
    )
    g = lt.groupBy("prio", "days").agg(F.count(F.lit(1)).alias("n_g"))
    wc = (
        Window.partitionBy("prio")
        .orderBy("days")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = g.select("prio", "days", F.sum("n_g").over(wc).alias("cumn"))
    t = lt.groupBy("prio").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("days").alias("min_days"),
        F.max("days").alias("max_days"),
    )
    ct = c.join(F.broadcast(t.select("prio", "n")), "prio")
    med = (
        ct.filter(2 * F.col("cumn") >= F.col("n"))
        .groupBy("prio")
        .agg(F.min("days").alias("median_days"))
    )
    p90 = (
        ct.filter(10 * F.col("cumn") >= 9 * F.col("n"))
        .groupBy("prio")
        .agg(F.min("days").alias("p90_days"))
    )
    return (
        t.join(med, "prio")
        .join(p90, "prio")
        .select(
            "prio",
            F.col("n").alias("n_lines"),
            "min_days",
            "max_days",
            "median_days",
            "p90_days",
        )
    )


@register(
    "events_motif_sequence_detect",
    oracle="""
        WITH seq AS (
          SELECT user_id, event_type AS e1,
                 lead(event_type, 1) OVER w AS e2,
                 lead(event_type, 2) OVER w AS e3
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        hits AS (
          SELECT user_id, count(*) AS n_motifs
          FROM seq
          WHERE e1 = 'view' AND e2 = 'click' AND e3 = 'purchase'
          GROUP BY 1
        )
        SELECT CAST(count(*) AS BIGINT) AS n_users_with_motif,
               CAST(sum(n_motifs) AS BIGINT) AS n_motifs_total,
               CAST(max(n_motifs) AS BIGINT) AS max_per_user
        FROM hits
    """,
)
def events_motif_sequence_detect(spark, sf_dir):
    """Consecutive-motif detection: count strictly consecutive
    view→click→purchase triples per user — the sequence-pattern
    primitive behind funnels with NO intervening events (the
    MATCH_RECOGNIZE-style contract, stricter than win_event_funnel's
    subsequence semantics). Two lead() columns over each user's
    ordered stream turn the motif into a row predicate; counts are
    exact.

    Scale: one per-user window pass — pattern length k costs k-1
    lead columns, no joins, no state machine."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    hits = (
        seq.filter(
            (F.col("e1") == "view")
            & (F.col("e2") == "click")
            & (F.col("e3") == "purchase")
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_motifs"))
    )
    return hits.agg(
        F.count(F.lit(1)).alias("n_users_with_motif"),
        F.sum("n_motifs").alias("n_motifs_total"),
        F.max("n_motifs").alias("max_per_user"),
    )


QINI_RESP_CENTS = 165000


@register(
    "ml_qini_uplift_curve",
    oracle=f"""
        WITH u AS (
          SELECT user_id,
                 CAST(user_id % 2 = 0 AS BIGINT) AS treat,
                 count(*) FILTER (WHERE ts < TIMESTAMP '{DID_SPLIT}')
                   AS score,
                 CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT))
                        FILTER (WHERE ts >= TIMESTAMP '{DID_SPLIT}'), 0)
                      > {QINI_RESP_CENTS} AS BIGINT) AS pos
          FROM events GROUP BY 1
        ),
        g AS (
          SELECT score, count(*) AS n,
                 CAST(sum(treat) AS BIGINT) AS n_t,
                 CAST(sum(CASE WHEN treat = 1 THEN pos ELSE 0 END)
                      AS BIGINT) AS pos_t,
                 CAST(sum(1 - treat) AS BIGINT) AS n_c,
                 CAST(sum(CASE WHEN treat = 0 THEN pos ELSE 0 END)
                      AS BIGINT) AS pos_c
          FROM u GROUP BY 1
        ),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS nu FROM g),
        c AS (
          SELECT g.*, CAST(coalesce(sum(n) OVER (
                   ORDER BY score DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS BIGINT) AS cum_b
          FROM g
        ),
        dec AS (
          SELECT CAST(10 * cum_b // tot.nu AS BIGINT) AS decile,
                 n_t, pos_t, n_c, pos_c
          FROM c, tot
        ),
        d AS (
          SELECT decile,
                 CAST(sum(n_t) AS BIGINT) AS n_t,
                 CAST(sum(pos_t) AS BIGINT) AS pos_t,
                 CAST(sum(n_c) AS BIGINT) AS n_c,
                 CAST(sum(pos_c) AS BIGINT) AS pos_c
          FROM dec GROUP BY 1
        ),
        r AS (
          SELECT decile,
                 CAST(sum(n_t) OVER (ORDER BY decile) AS BIGINT)
                   AS cum_n_treat,
                 CAST(sum(pos_t) OVER (ORDER BY decile) AS BIGINT)
                   AS cum_pos_treat,
                 CAST(sum(n_c) OVER (ORDER BY decile) AS BIGINT)
                   AS cum_n_ctrl,
                 CAST(sum(pos_c) OVER (ORDER BY decile) AS BIGINT)
                   AS cum_pos_ctrl
          FROM d
        )
        SELECT decile, cum_n_treat, cum_pos_treat, cum_n_ctrl,
               cum_pos_ctrl,
               round(cum_pos_treat
                     - CAST(cum_pos_ctrl AS DOUBLE) * cum_n_treat
                       / nullif(cum_n_ctrl, 0), 6) AS qini
        FROM r
    """,
)
def ml_qini_uplift_curve(spark, sf_dir):
    """Qini uplift curve by score decile — the uplift-modeling
    acceptance plot: rank users by a targeting score (here the
    pre-split activity count, a deterministic integer proxy for a
    model score), cut into ten group-granular deciles on the
    distinct-score spine, and report per cumulative prefix the
    treated/control incremental responders
    qini = cum_pos_treat - cum_pos_ctrl * cum_n_treat / cum_n_ctrl.
    Treatment is the documented A/B hash split (even user_id, as in
    events_uplift_did); response is a fixed post-split spend
    threshold so both arms' outcomes are exact int64 counts, and the
    only doubles are the final identical-expression qini cells.

    Scale: one map-side-combinable pass collapses events to a
    per-user row, a second collapses users to the distinct-score
    spine; all ordered prefix sums run on that spine (~tens of rows),
    never on the fact table — the same scan-bound shape as
    ml_gains_lift_deciles."""
    e = table(spark, sf_dir, "events")
    split = F.lit(DID_SPLIT).cast("timestamp_ntz")
    u = e.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < split, 1).otherwise(0)).alias("score"),
        (
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("ts") >= split,
                        F.round(F.col("value") * 100).cast("long"),
                    )
                ),
                F.lit(0),
            )
            > QINI_RESP_CENTS
        )
        .cast("long")
        .alias("pos"),
    ).select(
        (F.col("user_id") % 2 == 0).cast("long").alias("treat"),
        "score",
        "pos",
    )
    g = u.groupBy("score").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("treat").alias("n_t"),
        F.sum(F.when(F.col("treat") == 1, F.col("pos")).otherwise(0)).alias(
            "pos_t"
        ),
        F.sum(1 - F.col("treat")).alias("n_c"),
        F.sum(F.when(F.col("treat") == 0, F.col("pos")).otherwise(0)).alias(
            "pos_c"
        ),
    )
    tot = g.agg(F.sum("n").alias("nu"))
    wdesc = Window.orderBy(F.desc("score")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    c = g.select(
        "n_t",
        "pos_t",
        "n_c",
        "pos_c",
        F.coalesce(F.sum("n").over(wdesc), F.lit(0)).alias("cum_b"),
    )
    d = (
        c.crossJoin(F.broadcast(tot))
        .select(
            (10 * F.col("cum_b") / F.col("nu")).cast("long").alias("decile"),
            "n_t",
            "pos_t",
            "n_c",
            "pos_c",
        )
        .groupBy("decile")
        .agg(
            F.sum("n_t").alias("n_t"),
            F.sum("pos_t").alias("pos_t"),
            F.sum("n_c").alias("n_c"),
            F.sum("pos_c").alias("pos_c"),
        )
    )
    wcum = Window.orderBy("decile")
    r = d.select(
        "decile",
        F.sum("n_t").over(wcum).alias("cum_n_treat"),
        F.sum("pos_t").over(wcum).alias("cum_pos_treat"),
        F.sum("n_c").over(wcum).alias("cum_n_ctrl"),
        F.sum("pos_c").over(wcum).alias("cum_pos_ctrl"),
    )
    return r.select(
        "decile",
        "cum_n_treat",
        "cum_pos_treat",
        "cum_n_ctrl",
        "cum_pos_ctrl",
        F.round(
            F.col("cum_pos_treat")
            - F.col("cum_pos_ctrl").cast("double")
            * F.col("cum_n_treat")
            / F.nullif(F.col("cum_n_ctrl"), F.lit(0)),
            6,
        ).alias("qini"),
    )


@register(
    "stat_spearman_rho",
    oracle="""
        WITH u AS (
          SELECT user_id, count(*) AS x,
                 CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS y
          FROM events GROUP BY 1
        ),
        gx AS (SELECT x, count(*) AS n_v FROM u GROUP BY 1),
        rx AS (
          SELECT x,
                 2 * CAST(coalesce(sum(n_v) OVER (
                   ORDER BY x
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS BIGINT) + n_v + 1 AS r2x
          FROM gx
        ),
        gy AS (SELECT y, count(*) AS n_v FROM u GROUP BY 1),
        ry AS (
          SELECT y,
                 2 * CAST(coalesce(sum(n_v) OVER (
                   ORDER BY y
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS BIGINT) + n_v + 1 AS r2y
          FROM gy
        ),
        j AS (
          SELECT r2x, r2y FROM u
          JOIN rx USING (x) JOIN ry USING (y)
        ),
        m AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(r2x) AS BIGINT) AS sx,
                 CAST(sum(r2y) AS BIGINT) AS sy,
                 CAST(sum(r2x * r2x) AS BIGINT) AS sxx,
                 CAST(sum(r2y * r2y) AS BIGINT) AS syy,
                 CAST(sum(r2x * r2y) AS BIGINT) AS sxy
          FROM j
        )
        SELECT n AS n_users,
               round(
                 (n * sxy - sx * sy)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)), 6
               ) AS rho_spearman
        FROM m
    """,
)
def stat_spearman_rho(spark, sf_dir):
    """Spearman rank correlation between per-user activity (event
    count) and spend (exact cents) — the distribution-free
    monotone-association test analysts reach for when outliers make
    Pearson lie. Tied values get textbook AVERAGE ranks, computed
    without any row-level sort: rank(v) = cum_count_before + (n_v+1)/2
    on the distinct-value spine, carried as doubled integers (2·rank)
    so every moment (Sx, Sxx, Sxy, ...) is an exact int64 sum; rho is
    Pearson over those integer ranks — one identical double expression
    at the end (the 2× factors cancel).

    Scale: no global sort of the fact table — events collapse
    map-side to a per-user row, ranks come from the two
    distinct-value spines (tiny for discrete metrics; for continuous
    metrics bucket the value first, which is standard practice for
    rank stats at corpus scale), and the spine-to-user rank
    assignment is a broadcast join. The final fold is one
    map-side-combinable aggregate."""
    e = table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("x"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("y"),
    )

    def rank2(col):
        g = u.groupBy(col).agg(F.count(F.lit(1)).alias("n_v"))
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
        return g.select(
            col,
            (
                2 * F.coalesce(F.sum("n_v").over(w), F.lit(0))
                + F.col("n_v")
                + 1
            ).alias(f"r2{col}"),
        )

    j = u.join(F.broadcast(rank2("x")), "x").join(
        F.broadcast(rank2("y")), "y"
    )
    m = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("r2x").alias("sx"),
        F.sum("r2y").alias("sy"),
        F.sum(F.col("r2x") * F.col("r2x")).alias("sxx"),
        F.sum(F.col("r2y") * F.col("r2y")).alias("syy"),
        F.sum(F.col("r2x") * F.col("r2y")).alias("sxy"),
    )
    return m.select(
        F.col("n").alias("n_users"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.sqrt(
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                .cast("double")
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
                .cast("double")
            ),
            6,
        ).alias("rho_spearman"),
    )


@register(
    "orders_abc_classification",
    oracle="""
        WITH p AS (
          SELECT l_partkey,
                 CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                      AS BIGINT) AS rev_cents
          FROM lineitem GROUP BY 1
        ),
        tot AS (SELECT CAST(sum(rev_cents) AS BIGINT) AS t FROM p),
        c AS (
          SELECT rev_cents,
                 CAST(coalesce(sum(rev_cents) OVER (
                   ORDER BY rev_cents DESC, l_partkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS BIGINT) AS cum_b
          FROM p
        ),
        k AS (
          SELECT CASE WHEN cum_b * 100 < 80 * tot.t THEN 'A'
                      WHEN cum_b * 100 < 95 * tot.t THEN 'B'
                      ELSE 'C' END AS abc_class,
                 rev_cents
          FROM c, tot
        )
        SELECT abc_class,
               CAST(count(*) AS BIGINT) AS n_parts,
               CAST(sum(rev_cents) AS BIGINT) AS rev_cents,
               round(CAST(sum(rev_cents) AS DOUBLE) / max(tot.t), 6)
                 AS rev_share
        FROM k, tot GROUP BY 1
    """,
)
def orders_abc_classification(spark, sf_dir):
    """ABC (Pareto) inventory classification of parts by revenue:
    rank parts by exact cent revenue descending (partkey tiebreak, so
    both engines agree on equal-revenue parts), class A = parts whose
    cumulative-revenue-before is under 80% of total, B under 95%, C
    the tail. The class boundaries are pure int64 comparisons
    (cum_b·100 < 80·total — no percentage doubles anywhere near the
    cut), so boundary parts land identically in both engines; only
    the reported share is a final rounded double.

    Scale: lineitem collapses map-side to the part spine; the ordered
    prefix sum runs on that spine (20k rows at sf1 — and at 100 TB a
    range-partitioned two-pass prefix sum swaps in without changing
    the query shape); output is 3 rows."""
    li = table(spark, sf_dir, "lineitem")
    p = li.groupBy("l_partkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
            "rev_cents"
        )
    )
    tot = p.agg(F.sum("rev_cents").alias("t"))
    w = Window.orderBy(F.desc("rev_cents"), F.asc("l_partkey")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    c = p.select(
        "rev_cents",
        F.coalesce(F.sum("rev_cents").over(w), F.lit(0)).alias("cum_b"),
    )
    k = c.crossJoin(F.broadcast(tot)).select(
        F.when(F.col("cum_b") * 100 < 80 * F.col("t"), "A")
        .when(F.col("cum_b") * 100 < 95 * F.col("t"), "B")
        .otherwise("C")
        .alias("abc_class"),
        "rev_cents",
        "t",
    )
    return k.groupBy("abc_class").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("rev_cents").alias("rev_cents"),
        F.round(
            F.sum("rev_cents").cast("double") / F.max("t"), 6
        ).alias("rev_share"),
    )


LB_CRIT_6DF_95 = 12.591587


@register(
    "ts_ljung_box",
    oracle=f"""
        WITH c AS (
          SELECT date_trunc('hour', ts) AS h, count(*) AS x
          FROM events GROUP BY 1
        ),
        tot0 AS (
          SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS s FROM c
        ),
        tot AS (
          SELECT n, s,
                 CAST(sum((n * x - s) * (n * x - s)) AS BIGINT) AS den
          FROM c, tot0 GROUP BY n, s
        ),
        lags AS (SELECT l.l + 1 AS lag FROM unnest(range({ACF_MAX_LAG})) l(l)),
        p AS (
          SELECT lag, a.x AS xa, b.x AS xb
          FROM lags, c a JOIN c b
            ON b.h = a.h - to_hours(CAST(lag AS BIGINT))
        ),
        r AS (
          SELECT lag,
                 CAST(sum((n * xa - s) * (n * xb - s)) AS BIGINT) AS num,
                 max(den) AS den, max(n) AS n
          FROM p, tot GROUP BY lag
        ),
        t AS (
          SELECT n,
                 CAST(round(1000000000.0
                   * (CAST(num AS DOUBLE) / den)
                   * (CAST(num AS DOUBLE) / den)
                   / (n - lag)) AS BIGINT) AS term_nano
          FROM r
        )
        SELECT CAST(max(n) AS BIGINT) AS n_obs,
               CAST(count(*) AS BIGINT) AS m_lags,
               round(max(n) * (max(n) + 2.0)
                     * CAST(sum(term_nano) AS DOUBLE) / 1000000000.0, 6)
                 AS q_ljung_box,
               CAST(max(n) * (max(n) + 2.0)
                    * CAST(sum(term_nano) AS DOUBLE) / 1000000000.0
                    > {LB_CRIT_6DF_95} AS BIGINT) AS reject_white_noise
        FROM t GROUP BY n
    """,
)
def ts_ljung_box(spark, sf_dir):
    """Ljung–Box portmanteau test on the hourly event-count series:
    Q = n(n+2) Σ_{k=1..6} r_k²/(n−k), the whiteness test that decides
    whether the ACF's wiggles are structure or noise (rejects white
    noise when Q exceeds the χ²(6) 95% critical value 12.5916).
    Autocorrelations reuse ts_acf_lags' exact-integer spelling
    (denominator-cleared (n·x−s) products, true time-shift joins);
    each r_k²/(n−k) term is quantized to integer nano-units BEFORE
    the cross-lag sum, so the 6-term reduction is shuffle-order-proof
    and Q is one identical double expression in both engines.

    Scale: identical contract to ts_acf_lags — fact scan reduces
    map-side to the hourly rollup, all joins and folds run on that
    dim-sized series; output is a single row."""
    e = table(spark, sf_dir, "events")
    c = e.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).alias("x")
    )
    wall = Window.partitionBy()
    tot = c.select(
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum("x").over(wall).alias("s"),
        (
            (F.count(F.lit(1)).over(wall) * F.col("x") - F.sum("x").over(wall))
            * (F.count(F.lit(1)).over(wall) * F.col("x") - F.sum("x").over(wall))
        ).alias("dsq"),
    ).groupBy("n", "s").agg(F.sum("dsq").alias("den"))
    lags = spark.range(1, ACF_MAX_LAG + 1).select(F.col("id").alias("lag"))
    a = c.crossJoin(F.broadcast(lags)).select(
        "lag", "h", F.col("x").alias("xa")
    )
    b = c.select(F.col("h").alias("hb"), F.col("x").alias("xb"))
    p = a.join(
        b,
        b.hb == F.col("h") - F.col("lag") * F.expr("INTERVAL 1 HOUR"),
    )
    r = (
        p.crossJoin(F.broadcast(tot))
        .groupBy("lag")
        .agg(
            F.sum(
                (F.col("n") * F.col("xa") - F.col("s"))
                * (F.col("n") * F.col("xb") - F.col("s"))
            ).alias("num"),
            F.max("den").alias("den"),
            F.max("n").alias("n"),
        )
    )
    rr = F.col("num").cast("double") / F.col("den")
    t = r.select(
        "n",
        F.round(1000000000.0 * rr * rr / (F.col("n") - F.col("lag")))
        .cast("long")
        .alias("term_nano"),
    )
    q = (
        F.col("n")
        * (F.col("n") + F.lit(2.0))
        * F.col("sum_nano").cast("double")
        / 1000000000.0
    )
    return (
        t.groupBy("n")
        .agg(
            F.count(F.lit(1)).alias("m_lags"),
            F.sum("term_nano").alias("sum_nano"),
        )
        .select(
            F.col("n").alias("n_obs"),
            "m_lags",
            F.round(q, 6).alias("q_ljung_box"),
            (q > LB_CRIT_6DF_95).cast("long").alias("reject_white_noise"),
        )
    )


@register(
    "stat_gini_impurity_split",
    oracle=f"""
        WITH u AS (
          SELECT user_id,
                 count(*) FILTER (WHERE ts < TIMESTAMP '{DID_SPLIT}')
                   AS x,
                 CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT))
                        FILTER (WHERE ts >= TIMESTAMP '{DID_SPLIT}'), 0)
                      > {QINI_RESP_CENTS} AS BIGINT) AS pos
          FROM events GROUP BY 1
        ),
        g AS (
          SELECT x, CAST(count(*) AS BIGINT) AS n_v,
                 CAST(sum(pos) AS BIGINT) AS p_v
          FROM u GROUP BY 1
        ),
        tot AS (
          SELECT CAST(sum(n_v) AS BIGINT) AS n,
                 CAST(sum(p_v) AS BIGINT) AS p
          FROM g
        ),
        c AS (
          SELECT x AS thr,
                 CAST(sum(n_v) OVER (ORDER BY x) AS BIGINT) AS n_l,
                 CAST(sum(p_v) OVER (ORDER BY x) AS BIGINT) AS p_l
          FROM g
        )
        SELECT thr, n_l, p_l,
               tot.n - n_l AS n_r, tot.p - p_l AS p_r,
               round(
                 (CASE WHEN n_l = 0 THEN 0.0 ELSE
                   CAST(n_l AS DOUBLE) / tot.n
                   * (1.0 - (CAST(p_l AS DOUBLE) / n_l)
                           * (CAST(p_l AS DOUBLE) / n_l)
                         - (CAST(n_l - p_l AS DOUBLE) / n_l)
                           * (CAST(n_l - p_l AS DOUBLE) / n_l)) END)
                 + (CASE WHEN tot.n - n_l = 0 THEN 0.0 ELSE
                   CAST(tot.n - n_l AS DOUBLE) / tot.n
                   * (1.0 - (CAST(tot.p - p_l AS DOUBLE) / (tot.n - n_l))
                           * (CAST(tot.p - p_l AS DOUBLE) / (tot.n - n_l))
                         - (CAST((tot.n - n_l) - (tot.p - p_l) AS DOUBLE)
                            / (tot.n - n_l))
                           * (CAST((tot.n - n_l) - (tot.p - p_l) AS DOUBLE)
                              / (tot.n - n_l))) END), 6)
                 AS gini_weighted
        FROM c, tot
    """,
)
def stat_gini_impurity_split(spark, sf_dir):
    """Decision-tree split scoring — the inner loop of distributed
    tree training (Spark MLlib's chief aggregation pattern): for
    EVERY candidate threshold on a feature (pre-split activity
    count), the weighted Gini impurity of the binary outcome split
    x<=thr / x>thr. One histogram aggregation to the distinct-value
    spine gives (n_v, pos_v) per value; ascending prefix sums turn it
    into left/right class counts for ALL thresholds simultaneously
    (never one pass per candidate); impurity is an identical double
    expression over exact int64 counts, zero-guarded at both edges.
    The argmin row is the best split; the full curve is returned so
    the consumer also sees the margin.

    Scale: this is exactly how tree libraries scale — sufficient
    statistics per candidate bin from ONE map-side-combinable pass
    over the data, all split evaluation on the bins-sized spine.
    100 TB changes the histogram pass, not the evaluation."""
    e = table(spark, sf_dir, "events")
    split = F.lit(DID_SPLIT).cast("timestamp_ntz")
    u = e.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < split, 1).otherwise(0)).alias("x"),
        (
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("ts") >= split,
                        F.round(F.col("value") * 100).cast("long"),
                    )
                ),
                F.lit(0),
            )
            > QINI_RESP_CENTS
        )
        .cast("long")
        .alias("pos"),
    )
    g = u.groupBy("x").agg(
        F.count(F.lit(1)).alias("n_v"), F.sum("pos").alias("p_v")
    )
    tot = g.agg(F.sum("n_v").alias("n"), F.sum("p_v").alias("p"))
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    c = g.select(
        F.col("x").alias("thr"),
        F.sum("n_v").over(w).alias("n_l"),
        F.sum("p_v").over(w).alias("p_l"),
    )
    j = c.crossJoin(F.broadcast(tot)).select(
        "thr",
        "n_l",
        "p_l",
        (F.col("n") - F.col("n_l")).alias("n_r"),
        (F.col("p") - F.col("p_l")).alias("p_r"),
        "n",
    )

    def side_gini(nn, pp):
        frac = nn.cast("double") / F.col("n")
        pr = pp.cast("double") / nn
        qr = (nn - pp).cast("double") / nn
        return F.when(nn == 0, F.lit(0.0)).otherwise(
            frac * (F.lit(1.0) - pr * pr - qr * qr)
        )

    return j.select(
        "thr",
        "n_l",
        "p_l",
        "n_r",
        "p_r",
        F.round(
            side_gini(F.col("n_l"), F.col("p_l"))
            + side_gini(F.col("n_r"), F.col("p_r")),
            6,
        ).alias("gini_weighted"),
    )


@register(
    "events_interarrival_exp_fit",
    oracle="""
        WITH s AS (
          SELECT event_type,
                 (epoch_ns(ts) - epoch_ns(lag(ts) OVER (
                    PARTITION BY event_type ORDER BY ts, event_id
                  ))) // 1000000 AS gap_ms
          FROM events
        ),
        g AS (
          SELECT event_type,
                 CAST(count(*) AS BIGINT) AS n_gaps,
                 CAST(sum(gap_ms) AS BIGINT) AS sum_ms,
                 CAST(sum(gap_ms * gap_ms) AS BIGINT) AS sum_ms2
          FROM s WHERE gap_ms IS NOT NULL GROUP BY 1
        )
        SELECT event_type, n_gaps,
               round(CAST(sum_ms AS DOUBLE) / n_gaps / 1000.0, 6)
                 AS mean_gap_sec,
               round(3600000.0 * n_gaps / sum_ms, 6) AS lambda_per_hour,
               round(
                 (CAST(n_gaps AS DOUBLE) * sum_ms2 - CAST(sum_ms AS DOUBLE) * sum_ms)
                 / (CAST(sum_ms AS DOUBLE) * sum_ms), 6
               ) AS cv_squared
        FROM g
    """,
)
def events_interarrival_exp_fit(spark, sf_dir):
    """Exponential inter-arrival fit per event type — the Poisson-ness
    diagnostic behind capacity planning and anomaly baselines: MLE
    rate λ̂ = n/Σgap, mean gap, and the squared coefficient of
    variation CV² = n·Σg²/(Σg)² − 1 (restated n·S2−S1² over S1² so
    every term is exact before one division). CV² ≈ 1 means memoryless
    Poisson arrivals; CV² ≫ 1 means bursty traffic where naive
    rate-based alerting misfires. Gaps are exact integer milliseconds
    from a (type)-partitioned lag with event_id tiebreak; the moment
    sums are exact int64 (ms² keeps 20k×3.6e9 « 2^63).

    Scale: the per-type sort for lag() partitions by event_type —
    at 100 TB the same spelling partitions by (type, day) with a
    first-gap-per-day correction or rides the ingest-time ordering;
    the moment fold is one map-side-combinable aggregation."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    gap = F.floor(
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(prev.cast("timestamp"))
        )
        / 1000
    ).alias("gap_ms")
    s = e.select("event_type", gap)
    g = s.filter(F.col("gap_ms").isNotNull()).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("gap_ms").alias("sum_ms"),
        F.sum(F.col("gap_ms") * F.col("gap_ms")).alias("sum_ms2"),
    )
    return g.select(
        "event_type",
        "n_gaps",
        F.round(
            F.col("sum_ms").cast("double") / F.col("n_gaps") / 1000.0, 6
        ).alias("mean_gap_sec"),
        F.round(
            3600000.0 * F.col("n_gaps") / F.col("sum_ms"), 6
        ).alias("lambda_per_hour"),
        F.round(
            (
                F.col("n_gaps").cast("double") * F.col("sum_ms2")
                - F.col("sum_ms").cast("double") * F.col("sum_ms")
            )
            / (F.col("sum_ms").cast("double") * F.col("sum_ms")),
            6,
        ).alias("cv_squared"),
    )


@register(
    "stat_theil_index",
    oracle="""
        WITH x AS (
          SELECT c.c_nationkey AS nk,
                 CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                      AS BIGINT) AS cents
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          GROUP BY o.o_custkey, c.c_nationkey
        ),
        g AS (
          SELECT nk, CAST(count(*) AS BIGINT) AS n_g,
                 CAST(sum(cents) AS BIGINT) AS x_g
          FROM x GROUP BY 1
        ),
        tot AS (
          SELECT CAST(sum(n_g) AS BIGINT) AS n,
                 CAST(sum(x_g) AS BIGINT) AS xt
          FROM g
        ),
        w AS (
          SELECT x.nk,
                 CAST(sum(CAST(round(1000000.0
                   * (CAST(x.cents AS DOUBLE) / g.x_g)
                   * ln(CAST(x.cents AS DOUBLE) * g.n_g / g.x_g))
                   AS BIGINT)) AS BIGINT) AS within_micro
          FROM x JOIN g USING (nk) GROUP BY x.nk
        )
        SELECT g.nk AS nationkey, g.n_g AS n_customers,
               g.x_g AS rev_cents,
               round(CAST(w.within_micro AS DOUBLE) / 1000000.0, 6)
                 AS theil_within,
               round((CAST(g.x_g AS DOUBLE) / tot.xt)
                     * ln((CAST(g.x_g AS DOUBLE) / tot.xt)
                          / (CAST(g.n_g AS DOUBLE) / tot.n)), 6)
                 AS theil_between_term,
               round((CAST(g.x_g AS DOUBLE) / tot.xt)
                     * (CAST(w.within_micro AS DOUBLE) / 1000000.0), 6)
                 AS within_contribution
        FROM g JOIN w ON g.nk = w.nk, tot
    """,
)
def stat_theil_index(spark, sf_dir):
    """Theil-T inequality decomposition of customer revenue by nation
    — the inequality measure Gini can't give you: T splits EXACTLY
    into between-group + share-weighted within-group components, so
    "how much of revenue concentration is across nations vs inside
    them" is one query. Per nation: the within-group Theil
    T_g = Σ_i (x_i/X_g)·ln(x_i·n_g/X_g) (each customer's term is a
    double from exact int64 cents + two group scalars, quantized to
    integer micro-nats BEFORE the group sum — shuffle-order-proof),
    the between-term s_g·ln(s_g/p_g), and the share-weighted
    contribution; total T = Σ between_term + Σ within_contribution.

    Scale: orders collapse map-side to per-customer cents; group
    scalars come from one nation-spine aggregate joined back
    broadcast; the final fold is map-side-combinable. Same contract
    as orders_gini_concentration but decomposable."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    x = (
        o.join(
            F.broadcast(c.select("c_custkey", "c_nationkey")),
            o.o_custkey == c.c_custkey,
        )
        .groupBy("o_custkey", F.col("c_nationkey").alias("nk"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "cents"
            )
        )
    )
    g = x.groupBy("nk").agg(
        F.count(F.lit(1)).alias("n_g"), F.sum("cents").alias("x_g")
    )
    tot = g.agg(F.sum("n_g").alias("n"), F.sum("x_g").alias("xt"))
    term = F.round(
        1000000.0
        * (F.col("cents").cast("double") / F.col("x_g"))
        * F.log(
            F.col("cents").cast("double") * F.col("n_g") / F.col("x_g")
        )
    ).cast("long")
    w = (
        x.join(F.broadcast(g), "nk")
        .groupBy("nk")
        .agg(F.sum(term).alias("within_micro"))
    )
    sg = F.col("x_g").cast("double") / F.col("xt")
    pg = F.col("n_g").cast("double") / F.col("n")
    tw = F.col("within_micro").cast("double") / 1000000.0
    return (
        g.join(w, "nk")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("nk").alias("nationkey"),
            F.col("n_g").alias("n_customers"),
            F.col("x_g").alias("rev_cents"),
            F.round(tw, 6).alias("theil_within"),
            F.round(sg * F.log(sg / pg), 6).alias("theil_between_term"),
            F.round(sg * tw, 6).alias("within_contribution"),
        )
    )


@register(
    "events_dow_hour_heatmap",
    oracle="""
        WITH c AS (
          SELECT dayofweek(ts) + 1 AS dow, hour(ts) AS hr,
                 count(*) AS n,
                 CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
          FROM events GROUP BY 1, 2
        ),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM c)
        SELECT CAST(dow AS BIGINT) AS dow, CAST(hr AS BIGINT) AS hr,
               CAST(n AS BIGINT) AS n, cents,
               round(CAST(n AS DOUBLE) / tot.nt, 6) AS share,
               round(CAST(n AS DOUBLE) * 168 / tot.nt, 6)
                 AS load_vs_uniform
        FROM c, tot
    """,
)
def events_dow_hour_heatmap(spark, sf_dir):
    """Day-of-week × hour-of-day activity heatmap — the capacity-
    planning matrix behind every on-call staffing and autoscaling
    policy: event count and exact cent value per (dow, hour) cell,
    each cell's share of total traffic, and its load relative to a
    uniform 168-cell week (load_vs_uniform > 1 = hot cell). Engines
    disagree on week anchors, so dow is pinned to Spark's Sunday=1
    convention and the oracle shifts DuckDB's Sunday=0 to match.

    Scale: one map-side-combinable groupBy to a ≤168-row matrix —
    scan-bound at any size; the share join broadcasts a scalar."""
    e = table(spark, sf_dir, "events")
    c = e.groupBy(
        F.dayofweek("ts").cast("long").alias("dow"),
        F.hour("ts").cast("long").alias("hr"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
    )
    tot = c.agg(F.sum("n").alias("nt"))
    return c.crossJoin(F.broadcast(tot)).select(
        "dow",
        "hr",
        "n",
        "cents",
        F.round(F.col("n").cast("double") / F.col("nt"), 6).alias("share"),
        F.round(F.col("n").cast("double") * 168 / F.col("nt"), 6).alias(
            "load_vs_uniform"
        ),
    )



_CORR_FEATS = ["qty", "usd", "disc_bp", "tax_bp"]
_CORR_PAIRS = [
    (a, b)
    for i, a in enumerate(_CORR_FEATS)
    for b in _CORR_FEATS[i + 1:]
]


def _corr_sql() -> str:
    sums = ", ".join(
        [f"CAST(sum({f}) AS BIGINT) AS s_{f}" for f in _CORR_FEATS]
        + [
            f"CAST(sum({a} * {b}) AS BIGINT) AS s_{a}_{b}"
            for i, a in enumerate(_CORR_FEATS)
            for b in _CORR_FEATS[i:]
        ]
    )
    def corr(a, b):
        return (
            f"round((CAST(n AS DOUBLE) * s_{a}_{b} - CAST(s_{a} AS DOUBLE) * s_{b})"
            f" / sqrt((CAST(n AS DOUBLE) * s_{a}_{a} - CAST(s_{a} AS DOUBLE) * s_{a})"
            f" * (CAST(n AS DOUBLE) * s_{b}_{b} - CAST(s_{b} AS DOUBLE) * s_{b})), 6)"
        )
    pairs = " UNION ALL ".join(
        f"SELECT '{a}' AS feat_a, '{b}' AS feat_b, n, {corr(a, b)} AS corr FROM m"
        for a, b in _CORR_PAIRS
    )
    return f"""
        WITH q AS (
          SELECT CAST(l_quantity AS BIGINT) AS qty,
                 CAST(round(l_extendedprice) AS BIGINT) AS usd,
                 CAST(round(l_discount * 10000) AS BIGINT) AS disc_bp,
                 CAST(round(l_tax * 10000) AS BIGINT) AS tax_bp
          FROM lineitem
        ),
        m AS (SELECT CAST(count(*) AS BIGINT) AS n, {sums} FROM q)
        {pairs}
    """


@register("ml_feature_correlation_matrix", oracle=_corr_sql())
def ml_feature_correlation_matrix(spark, sf_dir):
    """Pairwise Pearson correlation matrix over four lineitem
    features (quantity, price-in-dollars, discount/tax in basis
    points) — the feature-selection screen run before any model
    training, computed the ONLY way it scales: every co-moment
    (4 sums, 4 squares, 6 cross products) accumulates as an exact
    int64 in ONE map-side-combinable pass (features are quantized to
    integer units first so the sums are shuffle-order-proof), and
    all 6 correlations are identical double expressions over that
    single 15-cell row. Never k² passes, never a row-pair join.

    Scale: one scan, one 15-column partial-agg reduce to a single
    row; the pair fan-out is a 6-element inline explode of that row.
    At sf1's magnitudes the largest co-moment (price², ~6e16) still
    clears int64 with 100× headroom."""
    li = table(spark, sf_dir, "lineitem")
    q = li.select(
        F.col("l_quantity").cast("long").alias("qty"),
        F.round("l_extendedprice").cast("long").alias("usd"),
        F.round(F.col("l_discount") * 10000).cast("long").alias("disc_bp"),
        F.round(F.col("l_tax") * 10000).cast("long").alias("tax_bp"),
    )
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.sum(f).alias(f"s_{f}") for f in _CORR_FEATS
    ] + [
        F.sum(F.col(a) * F.col(b)).alias(f"s_{a}_{b}")
        for i, a in enumerate(_CORR_FEATS)
        for b in _CORR_FEATS[i:]
    ]
    m = q.agg(*aggs)

    def corr(a, b):
        num = (
            F.col("n").cast("double") * F.col(f"s_{a}_{b}")
            - F.col(f"s_{a}").cast("double") * F.col(f"s_{b}")
        )
        den = F.sqrt(
            (
                F.col("n").cast("double") * F.col(f"s_{a}_{a}")
                - F.col(f"s_{a}").cast("double") * F.col(f"s_{a}")
            )
            * (
                F.col("n").cast("double") * F.col(f"s_{b}_{b}")
                - F.col(f"s_{b}").cast("double") * F.col(f"s_{b}")
            )
        )
        return F.round(num / den, 6)

    pairs = F.array(
        *[
            F.struct(
                F.lit(a).alias("feat_a"),
                F.lit(b).alias("feat_b"),
                F.col("n").alias("n"),
                corr(a, b).alias("corr"),
            )
            for a, b in _CORR_PAIRS
        ]
    )
    return m.select(F.inline(pairs))


@register(
    "events_abandoned_cart_rate",
    oracle="""
        WITH k AS (
          SELECT event_id, user_id, ts, CAST(ts AS DATE) AS day
          FROM events WHERE event_type = 'click'
        ),
        hit AS (
          SELECT k.event_id,
                 max(CASE WHEN p.ts > k.ts
                            AND p.ts <= k.ts + INTERVAL 1 HOUR
                          THEN 1 ELSE 0 END) AS converted
          FROM k LEFT JOIN events p
            ON p.user_id = k.user_id AND p.event_type = 'purchase'
           AND p.ts > k.ts AND p.ts <= k.ts + INTERVAL 1 HOUR
          GROUP BY k.event_id
        )
        SELECT CAST(k.day AS VARCHAR) AS day,
               CAST(count(*) AS BIGINT) AS n_clicks,
               CAST(sum(1 - coalesce(hit.converted, 0)) AS BIGINT)
                 AS n_abandoned,
               round(CAST(sum(1 - coalesce(hit.converted, 0)) AS DOUBLE)
                     / count(*), 6) AS abandon_rate
        FROM k JOIN hit ON k.event_id = hit.event_id
        GROUP BY k.day
    """,
)
def events_abandoned_cart_rate(spark, sf_dir):
    """Abandoned-cart rate per day — the NEGATION funnel pattern
    (clicked but did NOT purchase within the next hour), which plain
    funnel counting can't express without an anti-join: each click
    LEFT-joins the user's purchases over a 1-hour forward band, a
    conditional max collapses the matches to a converted flag, and
    the daily rollup reports the abandonment share. All counts exact
    int64; the rate is the only double.

    Scale: the band join is co-partitioned on user_id and bounded by
    the 1-hour window (each click meets only that user's purchases in
    one hour — at 100 TB the same join adds a day-bucket equi-key to
    cap the band), and the per-click collapse is map-side-combinable
    on the join output."""
    e = table(spark, sf_dir, "events")
    k = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.to_date("ts").alias("day")
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    j = k.join(
        p,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("p_ts") > F.col("ts"))
        & (F.col("p_ts") <= F.col("ts") + F.expr("INTERVAL 1 HOUR")),
        "left",
    )
    hit = j.groupBy("event_id", "day").agg(
        F.max(
            F.when(F.col("p_ts").isNotNull(), 1).otherwise(0)
        ).alias("converted")
    )
    return hit.groupBy(F.col("day").cast("string").alias("day")).agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.sum(1 - F.col("converted")).alias("n_abandoned"),
        F.round(
            F.sum(1 - F.col("converted")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("abandon_rate"),
    )


@register(
    "orders_seasonality_index",
    oracle="""
        WITH ym AS (
          SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
                 CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                      AS BIGINT) AS cents
          FROM orders GROUP BY 1, 2
        ),
        m AS (
          SELECT mo, CAST(count(*) AS BIGINT) AS n_years,
                 CAST(sum(cents) AS BIGINT) AS cents
          FROM ym GROUP BY 1
        ),
        tot AS (
          SELECT CAST(count(*) AS BIGINT) AS n_all,
                 CAST(sum(cents) AS BIGINT) AS c_all
          FROM ym
        )
        SELECT CAST(m.mo AS BIGINT) AS month_of_year, m.n_years,
               m.cents AS rev_cents,
               round((CAST(m.cents AS DOUBLE) / m.n_years)
                     / (CAST(tot.c_all AS DOUBLE) / tot.n_all), 6)
                 AS seasonal_index
        FROM m, tot
    """,
)
def orders_seasonality_index(spark, sf_dir):
    """Classical monthly seasonality index — each calendar month's
    average revenue across all observed years divided by the overall
    monthly average (index > 1 = seasonally strong month), the
    multiplicative-decomposition companion to win_yoy_growth (which
    differences; this one profiles). Exact cent sums per (year,
    month) cell, exact cell counts, and one identical double ratio —
    robust to partially-observed first/last years because each month
    divides by ITS OWN observation count.

    Scale: one map-side-combinable rollup to the ≤12×years cell
    table; everything downstream is 12 rows + a broadcast scalar."""
    o = table(spark, sf_dir, "orders")
    ym = o.groupBy(
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "cents"
        )
    )
    m = ym.groupBy("mo").agg(
        F.count(F.lit(1)).alias("n_years"), F.sum("cents").alias("cents")
    )
    tot = ym.agg(
        F.count(F.lit(1)).alias("n_all"), F.sum("cents").alias("c_all")
    )
    return m.crossJoin(F.broadcast(tot)).select(
        F.col("mo").cast("long").alias("month_of_year"),
        "n_years",
        F.col("cents").alias("rev_cents"),
        F.round(
            (F.col("cents").cast("double") / F.col("n_years"))
            / (F.col("c_all").cast("double") / F.col("n_all")),
            6,
        ).alias("seasonal_index"),
    )


@register(
    "stat_icc_intraclass",
    oracle="""
        WITH x AS (
          SELECT user_id,
                 CAST(round(value * 100) AS BIGINT) AS cents
          FROM events
        ),
        g AS (
          SELECT user_id, CAST(count(*) AS BIGINT) AS n_g,
                 CAST(sum(cents) AS BIGINT) AS s_g
          FROM x GROUP BY 1
        ),
        tot AS (
          SELECT CAST(sum(n_g) AS BIGINT) AS n,
                 CAST(sum(s_g) AS BIGINT) AS s,
                 CAST(count(*) AS BIGINT) AS k
          FROM g
        ),
        ss AS (
          SELECT CAST(sum(cents * cents) AS BIGINT) AS s2 FROM x
        ),
        sb AS (
          SELECT CAST(sum(CAST(round(
                   (CAST(s_g AS DOUBLE) * s_g) / n_g) AS BIGINT))
                 AS BIGINT) AS sb_g
          FROM g
        )
        SELECT tot.k AS n_users, tot.n AS n_events,
               round((CAST(sb.sb_g AS DOUBLE)
                      - CAST(tot.s AS DOUBLE) * tot.s / tot.n)
                     / (CAST(ss.s2 AS DOUBLE)
                        - CAST(tot.s AS DOUBLE) * tot.s / tot.n), 6)
                 AS between_user_share
        FROM tot, ss, sb
    """,
)
def stat_icc_intraclass(spark, sf_dir):
    """Between-user variance share (SSB/SST, the intraclass-
    correlation proxy) of event value — the number that decides
    whether an A/B test can randomize by EVENT or must randomize by
    USER: when user identity explains a material share of metric
    variance, event-level randomization leaks treatment across the
    clusters and the delta-method/CUPED machinery becomes mandatory.
    SST = Σx² − (Σx)²/N and SSB = Σ_g s_g²/n_g − (Σx)²/N from ONE
    pass of exact int64 cent sums; each group's s_g²/n_g is rounded
    to an integer before the cross-group sum (shuffle-order-proof),
    and the final ratio is one identical double expression.

    Scale: the classic two-level sufficient-statistics shape — one
    map-side-combinable groupBy to the user spine plus one scalar
    moment pass; nothing downstream exceeds the spine."""
    e = table(spark, sf_dir, "events")
    x = e.select(
        "user_id", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    g = x.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_g"), F.sum("cents").alias("s_g")
    )
    tot = g.agg(
        F.sum("n_g").alias("n"),
        F.sum("s_g").alias("s"),
        F.count(F.lit(1)).alias("k"),
    )
    ss = x.agg(F.sum(F.col("cents") * F.col("cents")).alias("s2"))
    sb = g.agg(
        F.sum(
            F.round(
                (F.col("s_g").cast("double") * F.col("s_g")) / F.col("n_g")
            ).cast("long")
        ).alias("sb_g")
    )
    cm = F.col("s").cast("double") * F.col("s") / F.col("n")
    return (
        tot.crossJoin(F.broadcast(ss))
        .crossJoin(F.broadcast(sb))
        .select(
            F.col("k").alias("n_users"),
            F.col("n").alias("n_events"),
            F.round(
                (F.col("sb_g").cast("double") - cm)
                / (F.col("s2").cast("double") - cm),
                6,
            ).alias("between_user_share"),
        )
    )


@register(
    "events_hhi_concentration",
    oracle="""
        WITH c AS (
          SELECT CAST(ts AS DATE) AS day, event_type,
                 CAST(count(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2
        ),
        t AS (
          SELECT day, CAST(sum(n) AS BIGINT) AS nt,
                 CAST(sum(n * n) AS BIGINT) AS nsq,
                 CAST(count(*) AS BIGINT) AS k
          FROM c GROUP BY 1
        )
        SELECT CAST(day AS VARCHAR) AS day, nt AS n_events, k AS n_types,
               round(CAST(nsq AS DOUBLE) / (CAST(nt AS DOUBLE) * nt), 6)
                 AS hhi,
               round((CAST(nsq AS DOUBLE) / (CAST(nt AS DOUBLE) * nt)
                      - 1.0 / k) / (1.0 - 1.0 / k), 6)
                 AS hhi_normalized
        FROM t
    """,
)
def events_hhi_concentration(spark, sf_dir):
    """Herfindahl–Hirschman concentration of the daily event-type mix
    — HHI = Σ share², the antitrust-grade concentration index ops
    teams use to spot traffic-mix collapse (one event type suddenly
    dominating = instrumentation bug or bot flood). Computed without
    materializing shares: HHI = Σn²/N² from two exact int64 sums, and
    the normalized form rescales by the k-type floor 1/k so days with
    different active-type counts compare fairly. One identical double
    expression per row.

    Scale: one map-side-combinable rollup to the days × types spine,
    one more to the day spine — scan-bound with tiny state."""
    e = table(spark, sf_dir, "events")
    c = e.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    t = c.groupBy("day").agg(
        F.sum("n").alias("nt"),
        F.sum(F.col("n") * F.col("n")).alias("nsq"),
        F.count(F.lit(1)).alias("k"),
    )
    hhi = F.col("nsq").cast("double") / (
        F.col("nt").cast("double") * F.col("nt")
    )
    return t.select(
        F.col("day").cast("string").alias("day"),
        F.col("nt").alias("n_events"),
        F.col("k").alias("n_types"),
        F.round(hhi, 6).alias("hhi"),
        F.round(
            (hhi - 1.0 / F.col("k")) / (1.0 - 1.0 / F.col("k")), 6
        ).alias("hhi_normalized"),
    )


@register(
    "agg_percent_of_parent_rollup",
    oracle="""
        WITH leaf AS (
          SELECT c.c_nationkey AS nk, o.o_orderpriority AS prio,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                      AS BIGINT) AS cents
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          GROUP BY 1, 2
        ),
        nat AS (
          SELECT nk, CAST(sum(cents) AS BIGINT) AS nat_cents
          FROM leaf GROUP BY 1
        ),
        tot AS (SELECT CAST(sum(cents) AS BIGINT) AS t FROM leaf)
        SELECT leaf.nk AS nationkey, leaf.prio, leaf.n,
               leaf.cents AS rev_cents,
               round(CAST(leaf.cents AS DOUBLE) / nat.nat_cents, 6)
                 AS pct_of_nation,
               round(CAST(nat.nat_cents AS DOUBLE) / tot.t, 6)
                 AS nation_pct_of_total
        FROM leaf JOIN nat USING (nk), tot
    """,
)
def agg_percent_of_parent_rollup(spark, sf_dir):
    """Percent-of-parent report — the drill-down table every BI tool
    renders: each (nation, priority) leaf with its share of ITS
    nation and each nation's share of the grand total, so subtotals
    read correctly at every level. Unlike a ROLLUP (which emits mixed
    grains in one relation), this keeps one grain per column: exact
    cent sums at the leaf, parent totals joined back from the nation
    spine, shares as identical double expressions.

    Scale: one map-side-combinable leaf rollup; the parent spine
    (25 nations) and the grand-total scalar broadcast — the fact
    table is scanned exactly once."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    leaf = (
        o.join(
            F.broadcast(c.select("c_custkey", "c_nationkey")),
            o.o_custkey == c.c_custkey,
        )
        .groupBy(
            F.col("c_nationkey").alias("nk"),
            F.col("o_orderpriority").alias("prio"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            ).alias("cents"),
        )
    )
    nat = leaf.groupBy("nk").agg(F.sum("cents").alias("nat_cents"))
    tot = leaf.agg(F.sum("cents").alias("t"))
    return (
        leaf.join(F.broadcast(nat), "nk")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("nk").alias("nationkey"),
            "prio",
            "n",
            F.col("cents").alias("rev_cents"),
            F.round(
                F.col("cents").cast("double") / F.col("nat_cents"), 6
            ).alias("pct_of_nation"),
            F.round(
                F.col("nat_cents").cast("double") / F.col("t"), 6
            ).alias("nation_pct_of_total"),
        )
    )


DFT_MAX_K = 36


@register(
    "ts_dft_periodogram",
    oracle=f"""
        WITH c AS (
          SELECT date_trunc('hour', ts) AS h, count(*) AS x
          FROM events GROUP BY 1
        ),
        idx AS (
          SELECT CAST((epoch_ns(h) - (SELECT min(epoch_ns(h)) FROM c))
                      // 3600000000000 AS BIGINT) AS t,
                 CAST(x AS BIGINT) AS x
          FROM c
        ),
        n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM idx),
        terms AS (
          SELECT k.k,
                 CAST(sum(CAST(round(1000.0 * x *
                   cos(2 * pi() * k.k * t / n.n)) AS BIGINT))
                   AS BIGINT) AS re_milli,
                 CAST(sum(CAST(round(1000.0 * x *
                   sin(2 * pi() * k.k * t / n.n)) AS BIGINT))
                   AS BIGINT) AS im_milli
          FROM idx, n, (SELECT l.l + 1 AS k
                        FROM unnest(range({DFT_MAX_K})) l(l)) k
          GROUP BY k.k
        ),
        pw AS (
          SELECT k,
                 (CAST(re_milli AS DOUBLE) * re_milli
                  + CAST(im_milli AS DOUBLE) * im_milli) / 1000000.0
                   AS power
          FROM terms
        ),
        best AS (SELECT max(power) AS bp FROM pw)
        SELECT CAST(pw.k AS BIGINT) AS k,
               round(CAST(n.n AS DOUBLE) / pw.k, 6) AS period_hours,
               round(pw.power / (CAST(n.n AS DOUBLE) * n.n), 6)
                 AS power_norm,
               CAST(pw.power = best.bp AS BIGINT) AS is_peak
        FROM pw, n, best
    """,
)
def ts_dft_periodogram(spark, sf_dir):
    """DFT periodogram of the hourly event series — the frequency-
    domain seasonality detector that finds the dominant cycle WITHOUT
    guessing candidate lags (the ACF's blind spot): per frequency k,
    the Fourier power |Σ x·e^(-2πikt/N)|² over k = 1..36, peak
    flagged (the fixture's 24-hour cycle lands at k = N/24). Each
    cos/sin term is quantized to integer milli-units BEFORE the
    per-frequency sum, so the folds are exact int64 and shuffle-
    order-proof; power and the peak comparison are identical double
    expressions over those ints.

    Scale: the fact scan reduces map-side to the hourly rollup; the
    36× frequency fan-out and trig are map-only arithmetic on that
    spine (36·|hours| rows), and each frequency folds independently —
    embarrassingly parallel, the textbook distributed periodogram."""
    e = table(spark, sf_dir, "events")
    c = e.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).alias("x")
    )
    t0 = c.agg(F.min("h").alias("h0"))
    idx = c.crossJoin(F.broadcast(t0)).select(
        F.floor(
            (F.unix_micros("h") - F.unix_micros("h0")) / 3600000000
        ).alias("t"),
        F.col("x").cast("long").alias("x"),
    )
    n = idx.agg(F.count(F.lit(1)).alias("n"))
    ks = spark.range(1, DFT_MAX_K + 1).select(F.col("id").alias("k"))
    ang = (
        2 * F.lit(3.141592653589793) * F.col("k") * F.col("t") / F.col("n")
    )
    terms = (
        idx.crossJoin(F.broadcast(ks))
        .crossJoin(F.broadcast(n))
        .groupBy("k")
        .agg(
            F.sum(
                F.round(1000.0 * F.col("x") * F.cos(ang)).cast("long")
            ).alias("re_milli"),
            F.sum(
                F.round(1000.0 * F.col("x") * F.sin(ang)).cast("long")
            ).alias("im_milli"),
        )
    )
    pw = terms.select(
        "k",
        (
            (
                F.col("re_milli").cast("double") * F.col("re_milli")
                + F.col("im_milli").cast("double") * F.col("im_milli")
            )
            / 1000000.0
        ).alias("power"),
    )
    best = pw.agg(F.max("power").alias("bp"))
    return (
        pw.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(best))
        .select(
            F.col("k").cast("long").alias("k"),
            F.round(F.col("n").cast("double") / F.col("k"), 6).alias(
                "period_hours"
            ),
            F.round(
                F.col("power") / (F.col("n").cast("double") * F.col("n")),
                6,
            ).alias("power_norm"),
            (F.col("power") == F.col("bp")).cast("long").alias("is_peak"),
        )
    )


BOT_RATE_PER_MIN = 5


@register(
    "events_bot_rate_screen",
    oracle=f"""
        WITH pm AS (
          SELECT user_id, date_trunc('minute', ts) AS m,
                 CAST(count(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2
        ),
        u AS (
          SELECT user_id,
                 CAST(max(n) AS BIGINT) AS peak_per_min,
                 CAST(sum(n) AS BIGINT) AS n_events,
                 CAST(count(*) AS BIGINT) AS n_minutes
          FROM pm GROUP BY 1
        )
        SELECT user_id, n_events, peak_per_min,
               round(CAST(n_events AS DOUBLE) / n_minutes, 6)
                 AS mean_per_active_min,
               CAST(peak_per_min >= {BOT_RATE_PER_MIN} AS BIGINT)
                 AS bot_flag
        FROM u
    """,
)
def events_bot_rate_screen(spark, sf_dir):
    """Bot-rate screen per user — peak events in any single minute
    plus the mean rate over ACTIVE minutes (idle gaps excluded, so a
    bursty human isn't diluted into looking calm): the first-line
    abuse filter every event pipeline runs before analytics, here
    with a fixed superhuman threshold on the per-minute peak. Pure
    integer counting; the mean is the only double.

    Scale: one map-side-combinable rollup to (user, minute) — the
    cardinality cap that makes per-user peak rates computable at
    100 TB without windowing raw events — then a user-spine rollup.
    Both shuffles carry pre-combined partials."""
    e = table(spark, sf_dir, "events")
    pm = e.groupBy(
        "user_id", F.date_trunc("minute", "ts").alias("m")
    ).agg(F.count(F.lit(1)).alias("n"))
    u = pm.groupBy("user_id").agg(
        F.max("n").alias("peak_per_min"),
        F.sum("n").alias("n_events"),
        F.count(F.lit(1)).alias("n_minutes"),
    )
    return u.select(
        "user_id",
        "n_events",
        "peak_per_min",
        F.round(
            F.col("n_events").cast("double") / F.col("n_minutes"), 6
        ).alias("mean_per_active_min"),
        (F.col("peak_per_min") >= BOT_RATE_PER_MIN)
        .cast("long")
        .alias("bot_flag"),
    )


@register(
    "agg_percentile_disc_vs_cont",
    oracle="""
        WITH x AS (
          SELECT o_orderpriority AS prio,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS cents
          FROM orders
        ),
        g AS (SELECT prio, cents, count(*) AS n_g FROM x GROUP BY 1, 2),
        c AS (
          SELECT prio, cents,
                 CAST(sum(n_g) OVER (PARTITION BY prio ORDER BY cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cumn
          FROM g
        ),
        t AS (SELECT prio, CAST(count(*) AS BIGINT) AS n FROM x GROUP BY 1),
        disc AS (
          SELECT c.prio, CAST(min(c.cents) AS BIGINT) AS p50_disc
          FROM c JOIN t ON c.prio = t.prio
          WHERE 2 * c.cumn >= t.n GROUP BY 1
        ),
        lo AS (
          SELECT c.prio, CAST(min(c.cents) AS BIGINT) AS v_lo
          FROM c JOIN t ON c.prio = t.prio
          WHERE c.cumn >= (t.n + 1) // 2 GROUP BY 1
        ),
        hi AS (
          SELECT c.prio, CAST(min(c.cents) AS BIGINT) AS v_hi
          FROM c JOIN t ON c.prio = t.prio
          WHERE c.cumn >= t.n // 2 + 1 GROUP BY 1
        )
        SELECT t.prio, t.n, disc.p50_disc,
               round((v_lo + v_hi) / 2.0, 6) AS p50_cont,
               CAST(disc.p50_disc <> (v_lo + v_hi) / 2.0 AS BIGINT)
                 AS diverges
        FROM t JOIN disc ON t.prio = disc.prio
               JOIN lo ON t.prio = lo.prio
               JOIN hi ON t.prio = hi.prio
    """,
)
def agg_percentile_disc_vs_cont(spark, sf_dir):
    """percentile_disc vs percentile_cont — the median-definition trap:
    with an even row count the discrete median is a VALUE FROM THE
    DATA while the continuous one is the midpoint of the two central
    values, and reports silently disagree depending on which the
    engine defaults to. Both are computed from the same distinct-value
    spine with integer midpoint tests (disc: first value with
    2·cum >= n; cont: average of the ceil(n/2)-th and (n/2+1)-th order
    statistics), so no interpolation doubles enter until the one final
    midpoint division; a per-priority diverges flag marks where the
    two definitions actually differ.

    Scale: the registry's standard exact-order-statistic contract —
    one combinable rollup to the value spine, prefix sums and the
    selections on that spine only."""
    o = table(spark, sf_dir, "orders")
    x = o.select(
        F.col("o_orderpriority").alias("prio"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    g = x.groupBy("prio", "cents").agg(F.count(F.lit(1)).alias("n_g"))
    wc = (
        Window.partitionBy("prio")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = g.select("prio", "cents", F.sum("n_g").over(wc).alias("cumn"))
    t = x.groupBy("prio").agg(F.count(F.lit(1)).alias("n"))
    ct = c.join(F.broadcast(t), "prio")
    disc = (
        ct.filter(2 * F.col("cumn") >= F.col("n"))
        .groupBy("prio")
        .agg(F.min("cents").alias("p50_disc"))
    )
    lo = (
        ct.filter(F.col("cumn") >= F.floor((F.col("n") + 1) / 2))
        .groupBy("prio")
        .agg(F.min("cents").alias("v_lo"))
    )
    hi = (
        ct.filter(F.col("cumn") >= F.floor(F.col("n") / 2) + 1)
        .groupBy("prio")
        .agg(F.min("cents").alias("v_hi"))
    )
    return (
        t.join(disc, "prio")
        .join(lo, "prio")
        .join(hi, "prio")
        .select(
            "prio",
            "n",
            "p50_disc",
            F.round((F.col("v_lo") + F.col("v_hi")) / 2.0, 6).alias(
                "p50_cont"
            ),
            (
                F.col("p50_disc").cast("double")
                != (F.col("v_lo") + F.col("v_hi")) / 2.0
            )
            .cast("long")
            .alias("diverges"),
        )
    )


# Poisson(1) inverse-CDF cumulative thresholds for k = 0..5 (k=6 tail)
POIS1_CDF = [
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
]


def _pois_case_sql(u: str) -> str:
    branches = "".join(
        f" WHEN {u} < {c!r} THEN {k}"
        for k, c in enumerate(POIS1_CDF)
    )
    return f"CASE{branches} ELSE 6 END"


@register(
    "sample_poisson_bootstrap",
    oracle=f"""
        WITH r AS (SELECT l.l + 1 AS rep FROM unnest(range(5)) l(l)),
        w AS (
          SELECT r.rep,
                 CAST(round(e.value * 100) AS BIGINT) AS cents,
                 {_pois_case_sql(
                   "(CAST(('0x' || substr(md5(r.rep || ':' || e.event_id), 1, 8)) AS BIGINT) / 4294967296.0)"
                 )} AS k
          FROM events e, r
        )
        SELECT CAST(rep AS BIGINT) AS rep,
               CAST(sum(k) AS BIGINT) AS n_resampled,
               CAST(sum(k * cents) AS BIGINT) AS sum_cents,
               round(CAST(sum(k * cents) AS DOUBLE) / sum(k) / 100.0, 6)
                 AS mean_value
        FROM w GROUP BY 1
    """,
)
def sample_poisson_bootstrap(spark, sf_dir):
    """Online (Poisson) bootstrap — the distributed bootstrap that
    needs NO resampling pass: each row independently receives a
    Poisson(1) replication weight per replicate, giving replicate
    means whose spread estimates the sampling error of the mean. The
    Poisson draw is DETERMINISTIC (md5 of replicate:event_id → uniform
    in [0,1) → inverse-CDF lookup against fixed thresholds), so both
    engines draw byte-identical weights and the whole op value-hashes
    — the trick that also makes production bootstraps reproducible
    across retries. Weighted sums are exact int64 cents.

    Scale: THE way to bootstrap 100 TB — map-only weight assignment
    fused into one combinable aggregate per replicate; 5 replicates =
    5-row output, zero data movement beyond the partial sums. A
    resample-by-copy bootstrap would shuffle the corpus 5×."""
    e = table(spark, sf_dir, "events")
    reps = spark.range(1, 6).select(F.col("id").alias("rep"))
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("rep").cast("string"),
                        F.lit(":"),
                        F.col("event_id").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        / 4294967296.0
    )
    k = F.lit(6)
    for kk in range(len(POIS1_CDF) - 1, -1, -1):
        k = F.when(u < POIS1_CDF[kk], F.lit(kk)).otherwise(k)
    w = e.crossJoin(F.broadcast(reps)).select(
        "rep",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        k.alias("k"),
    )
    return w.groupBy(F.col("rep").cast("long").alias("rep")).agg(
        F.sum("k").alias("n_resampled"),
        F.sum(F.col("k") * F.col("cents")).alias("sum_cents"),
        F.round(
            F.sum(F.col("k") * F.col("cents")).cast("double")
            / F.sum("k")
            / 100.0,
            6,
        ).alias("mean_value"),
    )


PERM_K = 20


@register(
    "stat_permutation_test",
    oracle=f"""
        WITH u AS (
          SELECT user_id,
                 CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents,
                 CAST(user_id % 2 = 0 AS BIGINT) AS treat
          FROM events GROUP BY 1
        ),
        obs AS (
          SELECT CAST(sum(CASE WHEN treat = 1 THEN cents END) AS DOUBLE)
                   / sum(treat)
                 - CAST(sum(CASE WHEN treat = 0 THEN cents END) AS DOUBLE)
                   / sum(1 - treat) AS d
          FROM u
        ),
        perms AS (SELECT l.l + 1 AS r FROM unnest(range({PERM_K})) l(l)),
        pl AS (
          SELECT perms.r,
                 CAST(CAST(('0x' || substr(md5(perms.r || ':' || u.user_id),
                   1, 8)) AS BIGINT) % 2 = 0 AS BIGINT) AS pt,
                 u.cents
          FROM u, perms
        ),
        pd AS (
          SELECT r,
                 CAST(sum(CASE WHEN pt = 1 THEN cents END) AS DOUBLE)
                   / sum(pt)
                 - CAST(sum(CASE WHEN pt = 0 THEN cents END) AS DOUBLE)
                   / sum(1 - pt) AS d
          FROM pl GROUP BY 1
        )
        SELECT CAST(count(*) AS BIGINT) AS k_perms,
               round(max(obs.d), 6) AS observed_diff_cents,
               CAST(sum(CAST(abs(pd.d) >= abs(obs.d) AS BIGINT))
                    AS BIGINT) AS n_extreme,
               round((1.0 + sum(CAST(abs(pd.d) >= abs(obs.d) AS BIGINT)))
                     / (count(*) + 1.0), 6) AS p_value
        FROM pd, obs
    """,
)
def stat_permutation_test(spark, sf_dir):
    """Permutation test of the treatment effect on per-user spend —
    the assumption-free inference backstop when t-test normality is
    doubtful: re-randomize the treatment label K=20 times, recompute
    the mean difference, and report the share of permutations at
    least as extreme as observed (add-one p-value, the standard
    finite-K correction). Permutations are DETERMINISTIC — each
    user's relabeling is a parity bit of md5(perm:user), the same
    reproducible-randomness trick as sample_poisson_bootstrap — so
    both engines draw identical permutations and the test
    value-hashes end to end. User sums are exact int64 cents; each
    difference is one identical double expression.

    Scale: one combinable pass to the user spine, a K× map-only
    fan-out of that spine (never of raw events), K combinable folds.
    At 100 TB the spine fan-out is the entire cost — the reference
    permutation-test shape."""
    e = table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
    ).select(
        "user_id",
        "cents",
        (F.col("user_id") % 2 == 0).cast("long").alias("treat"),
    )

    def mean_diff(flag):
        t = F.sum(F.when(flag == 1, F.col("cents"))).cast("double") / F.sum(
            flag
        )
        c = F.sum(F.when(flag == 0, F.col("cents"))).cast("double") / F.sum(
            1 - flag
        )
        return t - c

    obs = u.agg(mean_diff(F.col("treat")).alias("d"))
    perms = spark.range(1, PERM_K + 1).select(F.col("id").alias("r"))
    pt = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("r").cast("string"),
                        F.lit(":"),
                        F.col("user_id").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 2
        == 0
    ).cast("long")
    pl = u.crossJoin(F.broadcast(perms)).select(
        "r", pt.alias("pt"), "cents"
    )
    pd_ = pl.groupBy("r").agg(mean_diff(F.col("pt")).alias("d"))
    return (
        pd_.crossJoin(F.broadcast(obs.select(F.col("d").alias("obs_d"))))
        .agg(
            F.count(F.lit(1)).alias("k_perms"),
            F.round(F.max("obs_d"), 6).alias("observed_diff_cents"),
            F.sum(
                (F.abs(F.col("d")) >= F.abs(F.col("obs_d"))).cast("long")
            ).alias("n_extreme"),
            F.round(
                (
                    1.0
                    + F.sum(
                        (
                            F.abs(F.col("d")) >= F.abs(F.col("obs_d"))
                        ).cast("long")
                    )
                )
                / (F.count(F.lit(1)) + 1.0),
                6,
            ).alias("p_value"),
        )
    )


@register(
    "orders_return_rate_trend",
    oracle="""
        WITH m AS (
          SELECT strftime(l_shipdate, '%Y-%m') AS month,
                 CAST(count(*) AS BIGINT) AS n_lines,
                 CAST(sum(CAST(l_returnflag = 'R' AS BIGINT)) AS BIGINT)
                   AS n_returned,
                 CAST(sum(CASE WHEN l_returnflag = 'R'
                     THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS returned_cents,
                 CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                      AS BIGINT) AS total_cents
          FROM lineitem GROUP BY 1
        )
        SELECT month, n_lines, n_returned,
               round(CAST(n_returned AS DOUBLE) / n_lines, 6)
                 AS return_rate,
               round(CAST(returned_cents AS DOUBLE) / total_cents, 6)
                 AS returned_value_share
        FROM m
    """,
)
def orders_return_rate_trend(spark, sf_dir):
    """Monthly return-rate trend — share of shipped lines (and of
    shipped VALUE) flagged returned, the merchandising-quality
    headline that catches a bad product batch or a fraud ring months
    before margin reports do. Line-count rate and value-weighted rate
    move differently when expensive items return disproportionately —
    both are reported. One conditional rollup of exact int64 counts
    and cent sums; rates are the only doubles.

    Scale: single map-side-combinable pass to the month spine —
    scan-bound at any size."""
    li = table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    ret = (F.col("l_returnflag") == "R").cast("long")
    m = li.groupBy(
        F.date_format("l_shipdate", "yyyy-MM").alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(ret).alias("n_returned"),
        F.sum(F.when(F.col("l_returnflag") == "R", cents).otherwise(0)).alias(
            "returned_cents"
        ),
        F.sum(cents).alias("total_cents"),
    )
    return m.select(
        "month",
        "n_lines",
        "n_returned",
        F.round(
            F.col("n_returned").cast("double") / F.col("n_lines"), 6
        ).alias("return_rate"),
        F.round(
            F.col("returned_cents").cast("double") / F.col("total_cents"),
            6,
        ).alias("returned_value_share"),
    )


@register(
    "orders_supplier_hhi",
    oracle="""
        WITH ps AS (
          SELECT l_partkey AS pk, l_suppkey AS sk,
                 CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                      AS BIGINT) AS cents
          FROM lineitem GROUP BY 1, 2
        ),
        p AS (
          SELECT pk, CAST(count(*) AS BIGINT) AS n_suppliers,
                 CAST(sum(cents) AS BIGINT) AS tot,
                 CAST(sum(cents * cents) AS BIGINT) AS sq
          FROM ps GROUP BY 1
        )
        SELECT pk AS partkey, n_suppliers, tot AS spend_cents,
               round(CAST(sq AS DOUBLE) / (CAST(tot AS DOUBLE) * tot), 6)
                 AS supplier_hhi,
               CAST(CAST(sq AS DOUBLE) / (CAST(tot AS DOUBLE) * tot)
                    > 0.5 AS BIGINT) AS single_source_risk
        FROM p WHERE n_suppliers >= 2
    """,
)
def orders_supplier_hhi(spark, sf_dir):
    """Supplier-concentration HHI per part — the supply-risk screen
    procurement runs before a shortage does: each part's spend shares
    across its suppliers folded as Σcents²/(Σcents)² (no share
    materialization, same trick as events_hhi_concentration), with an
    HHI > 0.5 single-source-risk flag. Multi-supplier parts only —
    sole-sourced parts are a different (known) list.

    Scale: one combinable rollup to the (part, supplier) spine, one
    to the part spine; the squared-cents sum stays in int64 because
    the per-(part,supplier) cents are bounded by part-level spend,
    not corpus revenue."""
    li = table(spark, sf_dir, "lineitem")
    ps = li.groupBy(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
            "cents"
        )
    )
    p = ps.groupBy("pk").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum("cents").alias("tot"),
        F.sum(F.col("cents") * F.col("cents")).alias("sq"),
    )
    hhi = F.col("sq").cast("double") / (
        F.col("tot").cast("double") * F.col("tot")
    )
    return p.filter(F.col("n_suppliers") >= 2).select(
        F.col("pk").alias("partkey"),
        "n_suppliers",
        F.col("tot").alias("spend_cents"),
        F.round(hhi, 6).alias("supplier_hhi"),
        (hhi > 0.5).cast("long").alias("single_source_risk"),
    )


@register(
    "stat_cramers_v",
    oracle="""
        WITH c AS (
          SELECT o_orderpriority AS a, o_orderstatus AS b,
                 CAST(count(*) AS BIGINT) AS n
          FROM orders GROUP BY 1, 2
        ),
        ra AS (SELECT a, CAST(sum(n) AS BIGINT) AS na FROM c GROUP BY 1),
        rb AS (SELECT b, CAST(sum(n) AS BIGINT) AS nb FROM c GROUP BY 1),
        tot AS (
          SELECT CAST(sum(n) AS BIGINT) AS nt,
                 CAST((SELECT count(*) FROM ra) AS BIGINT) AS r,
                 CAST((SELECT count(*) FROM rb) AS BIGINT) AS k
          FROM c
        ),
        chi AS (
          SELECT CAST(sum(CAST(round(1000000.0 *
                   (c.n - CAST(ra.na AS DOUBLE) * rb.nb / tot.nt)
                   * (c.n - CAST(ra.na AS DOUBLE) * rb.nb / tot.nt)
                   / (CAST(ra.na AS DOUBLE) * rb.nb / tot.nt))
                   AS BIGINT)) AS BIGINT) AS chi_micro
          FROM c JOIN ra USING (a) JOIN rb USING (b), tot
        )
        SELECT tot.nt AS n, tot.r AS n_rows_levels, tot.k AS n_col_levels,
               round(CAST(chi.chi_micro AS DOUBLE) / 1000000.0, 6)
                 AS chi_square,
               round(sqrt(CAST(chi.chi_micro AS DOUBLE) / 1000000.0
                     / (tot.nt * (least(tot.r, tot.k) - 1))), 6)
                 AS cramers_v
        FROM tot, chi
    """,
)
def stat_cramers_v(spark, sf_dir):
    """Cramér's V — the normalized effect size for categorical
    association that the raw chi-square (stat_chi_square) can't give
    you: χ² grows with N, V ∈ [0,1] answers "is priority actually
    related to order status, and how strongly". Cell, row, and column
    counts are exact int64; each cell's (O−E)²/E term is an identical
    double expression micro-quantized BEFORE the cross-cell sum
    (shuffle-order-proof); V is one final sqrt over those ints.

    Scale: one combinable pass to the contingency cells (r×k,
    constant-sized), broadcast margins, constant-size fold — the
    categorical-association screen at scan-bound cost."""
    o = table(spark, sf_dir, "orders")
    c = o.groupBy(
        F.col("o_orderpriority").alias("a"),
        F.col("o_orderstatus").alias("b"),
    ).agg(F.count(F.lit(1)).alias("n"))
    ra = c.groupBy("a").agg(F.sum("n").alias("na"))
    rb = c.groupBy("b").agg(F.sum("n").alias("nb"))
    tot = c.agg(F.sum("n").alias("nt")).crossJoin(
        F.broadcast(ra.agg(F.count(F.lit(1)).alias("r")))
    ).crossJoin(F.broadcast(rb.agg(F.count(F.lit(1)).alias("k"))))
    e = F.col("na").cast("double") * F.col("nb") / F.col("nt")
    term = F.round(
        1000000.0 * (F.col("n") - e) * (F.col("n") - e) / e
    ).cast("long")
    chi = (
        c.join(F.broadcast(ra), "a")
        .join(F.broadcast(rb), "b")
        .crossJoin(F.broadcast(tot))
        .agg(F.sum(term).alias("chi_micro"))
    )
    return tot.crossJoin(F.broadcast(chi)).select(
        F.col("nt").alias("n"),
        F.col("r").alias("n_rows_levels"),
        F.col("k").alias("n_col_levels"),
        F.round(F.col("chi_micro").cast("double") / 1000000.0, 6).alias(
            "chi_square"
        ),
        F.round(
            F.sqrt(
                F.col("chi_micro").cast("double")
                / 1000000.0
                / (F.col("nt") * (F.least("r", "k") - 1))
            ),
            6,
        ).alias("cramers_v"),
    )


@register(
    "stat_power_mde",
    oracle="""
        WITH u AS (
          SELECT user_id,
                 CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
          FROM events GROUP BY 1
        ),
        m AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(cents) AS BIGINT) AS s,
                 CAST(sum(cents * cents) AS BIGINT) AS s2
          FROM u
        )
        SELECT n AS n_users,
               round(CAST(s AS DOUBLE) / n / 100.0, 6) AS mean_value,
               round(sqrt((CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                     / (n - 1)) / 100.0, 6) AS sd_value,
               round((1.959964 + 0.841621)
                     * sqrt((CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                            / (n - 1))
                     * sqrt(4.0 / n) / 100.0, 6) AS mde_abs,
               round((1.959964 + 0.841621)
                     * sqrt((CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                            / (n - 1))
                     * sqrt(4.0 / n)
                     / (CAST(s AS DOUBLE) / n), 6) AS mde_rel
        FROM m
    """,
)
def stat_power_mde(spark, sf_dir):
    """Experiment power analysis — the minimum detectable effect a
    50/50 split of THIS population can resolve at α=0.05, power=0.8:
    MDE = (z_{0.975}+z_{0.8})·σ·sqrt(2/(n/2)), the number every A/B
    test should publish BEFORE launch (an underpowered test's null is
    meaningless). σ comes from exact int64 cent moments over the
    per-user spine (the correct randomization unit per
    stat_icc_intraclass); the z constants are fixed literals, so the
    whole row is identical double expressions over exact ints.

    Scale: one combinable pass to the user spine + a 3-cell scalar
    fold — free at any size, which is the point: there is no excuse
    not to run it."""
    e = table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
    )
    m = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).alias("s2"),
    )
    var = (
        F.col("s2").cast("double")
        - F.col("s").cast("double") * F.col("s") / F.col("n")
    ) / (F.col("n") - 1)
    sd = F.sqrt(var)
    zsum = F.lit(1.959964) + F.lit(0.841621)
    mde = zsum * sd * F.sqrt(4.0 / F.col("n"))
    return m.select(
        F.col("n").alias("n_users"),
        F.round(F.col("s").cast("double") / F.col("n") / 100.0, 6).alias(
            "mean_value"
        ),
        F.round(sd / 100.0, 6).alias("sd_value"),
        F.round(mde / 100.0, 6).alias("mde_abs"),
        F.round(
            mde / (F.col("s").cast("double") / F.col("n")), 6
        ).alias("mde_rel"),
    )


SLO_TARGET_PPM = 990000  # 99.0% success objective


@register(
    "events_error_budget_burn",
    oracle=f"""
        WITH d AS (
          SELECT CAST(ts AS DATE) AS day,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(event_type = 'error' AS BIGINT))
                      AS BIGINT) AS errs
          FROM events GROUP BY 1
        ),
        c AS (
          SELECT day, n, errs,
                 CAST(sum(n) OVER w AS BIGINT) AS cum_n,
                 CAST(sum(errs) OVER w AS BIGINT) AS cum_errs
          FROM d
          WINDOW w AS (ORDER BY day ROWS UNBOUNDED PRECEDING)
        )
        SELECT CAST(day AS VARCHAR) AS day, n, errs,
               round(CAST(errs AS DOUBLE) / n, 6) AS error_rate,
               round(CAST(errs AS DOUBLE) / n
                     / (1.0 - {SLO_TARGET_PPM} / 1000000.0), 6)
                 AS burn_rate,
               round(CAST(cum_errs AS DOUBLE)
                     / (cum_n * (1.0 - {SLO_TARGET_PPM} / 1000000.0)), 6)
                 AS budget_consumed,
               CAST(cum_errs * 1000000 > cum_n
                    * (1000000 - {SLO_TARGET_PPM}) AS BIGINT)
                 AS budget_exhausted
        FROM c
    """,
)
def events_error_budget_burn(spark, sf_dir):
    """SRE error-budget burn-down against a 99% success SLO — daily
    error rate, burn rate (rate ÷ budget; >1 means the budget
    depletes before the window ends), cumulative budget consumed, and
    an exhaustion flag. The exhaustion comparison is PURE INTEGER
    (cum_errs·1e6 > cum_n·allowed_ppm) so the alert fires identically
    in both engines — paging decisions never ride a double. This is
    the error-budget policy table from the SRE workbook as one query.

    Scale: combinable rollup to the day spine; the cumulative window
    runs on the spine. The integer-ppm SLO encoding is also what a
    streaming version would carry in state."""
    e = table(spark, sf_dir, "events")
    d = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("event_type") == "error").cast("long")).alias("errs"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    c = d.select(
        "day",
        "n",
        "errs",
        F.sum("n").over(w).alias("cum_n"),
        F.sum("errs").over(w).alias("cum_errs"),
    )
    budget = 1.0 - SLO_TARGET_PPM / 1000000.0
    return c.select(
        F.col("day").cast("string").alias("day"),
        "n",
        "errs",
        F.round(F.col("errs").cast("double") / F.col("n"), 6).alias(
            "error_rate"
        ),
        F.round(
            F.col("errs").cast("double") / F.col("n") / budget, 6
        ).alias("burn_rate"),
        F.round(
            F.col("cum_errs").cast("double") / (F.col("cum_n") * budget), 6
        ).alias("budget_consumed"),
        (
            F.col("cum_errs") * 1000000
            > F.col("cum_n") * (1000000 - SLO_TARGET_PPM)
        )
        .cast("long")
        .alias("budget_exhausted"),
    )


HOLIDAYS_2024_JAN = ["2024-01-01", "2024-01-15"]


@register(
    "events_holiday_calendar_lift",
    oracle=f"""
        WITH hol AS (
          SELECT CAST(x AS DATE) AS day
          FROM unnest(['{HOLIDAYS_2024_JAN[0]}',
                       '{HOLIDAYS_2024_JAN[1]}']) t(x)
        ),
        d AS (
          SELECT CAST(ts AS DATE) AS day,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
          FROM events GROUP BY 1
        ),
        f AS (
          SELECT d.*, CAST(hol.day IS NOT NULL AS BIGINT) AS is_holiday
          FROM d LEFT JOIN hol ON d.day = hol.day
        ),
        g AS (
          SELECT is_holiday,
                 CAST(count(*) AS BIGINT) AS n_days,
                 CAST(sum(n) AS BIGINT) AS n_events,
                 CAST(sum(cents) AS BIGINT) AS cents
          FROM f GROUP BY 1
        )
        SELECT g.is_holiday, g.n_days, g.n_events, g.cents,
               round(CAST(g.n_events AS DOUBLE) / g.n_days, 6)
                 AS events_per_day,
               round((CAST(g.n_events AS DOUBLE) / g.n_days)
                     / ((SELECT CAST(sum(n_events) AS DOUBLE)
                         FROM g) / (SELECT sum(n_days) FROM g)), 6)
                 AS lift_vs_overall
        FROM g
    """,
)
def events_holiday_calendar_lift(spark, sf_dir):
    """Holiday-calendar enrichment and lift — the inline-dimension
    pattern every analytics team uses before a real calendar service
    exists: a two-row holiday table (New Year's Day, MLK Day)
    broadcast-joined onto the day spine, then events-per-day on
    holidays vs the overall baseline as a lift ratio. Demonstrates
    calendar enrichment as a BROADCAST join against a literal dim
    (never a UDF date lookup); exact integer counting, ratios last.

    Scale: fact collapses to the day spine; the holiday dim is
    literal-sized and broadcast; two-row output."""
    e = table(spark, sf_dir, "events")
    hol = spark.createDataFrame(
        [(d,) for d in HOLIDAYS_2024_JAN], "day_s string"
    ).select(F.col("day_s").cast("date").alias("hday"))
    d = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
    )
    f = d.join(F.broadcast(hol), d.day == hol.hday, "left").select(
        "day",
        "n",
        "cents",
        F.col("hday").isNotNull().cast("long").alias("is_holiday"),
    )
    g = f.groupBy("is_holiday").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("n").alias("n_events"),
        F.sum("cents").alias("cents"),
    )
    tot = g.agg(
        F.sum("n_events").alias("te"), F.sum("n_days").alias("td")
    )
    return g.crossJoin(F.broadcast(tot)).select(
        "is_holiday",
        "n_days",
        "n_events",
        "cents",
        F.round(
            F.col("n_events").cast("double") / F.col("n_days"), 6
        ).alias("events_per_day"),
        F.round(
            (F.col("n_events").cast("double") / F.col("n_days"))
            / (F.col("te").cast("double") / F.col("td")),
            6,
        ).alias("lift_vs_overall"),
    )


@register(
    "events_wow_significance",
    oracle="""
        WITH w AS (
          SELECT CAST((CAST(ts AS DATE) - DATE '2024-01-01') // 7
                      AS BIGINT) AS week,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(event_type = 'purchase' AS BIGINT))
                      AS BIGINT) AS conv
          FROM events GROUP BY 1
        ),
        l AS (
          SELECT week, n, conv,
                 lag(n) OVER (ORDER BY week) AS pn,
                 lag(conv) OVER (ORDER BY week) AS pconv
          FROM w
        )
        SELECT week, n, conv,
               round(CAST(conv AS DOUBLE) / n, 6) AS conv_rate,
               round(CAST(conv AS DOUBLE) / n
                     - CAST(pconv AS DOUBLE) / pn, 6) AS wow_delta,
               round((CAST(conv AS DOUBLE) / n - CAST(pconv AS DOUBLE) / pn)
                     / sqrt((CAST(conv + pconv AS DOUBLE) / (n + pn))
                            * (1 - CAST(conv + pconv AS DOUBLE) / (n + pn))
                            * (1.0 / n + 1.0 / pn)), 6) AS z_score,
               CAST(abs((CAST(conv AS DOUBLE) / n
                         - CAST(pconv AS DOUBLE) / pn)
                    / sqrt((CAST(conv + pconv AS DOUBLE) / (n + pn))
                           * (1 - CAST(conv + pconv AS DOUBLE) / (n + pn))
                           * (1.0 / n + 1.0 / pn))) > 1.959964 AS BIGINT)
                 AS significant
        FROM l WHERE pn IS NOT NULL
    """,
)
def events_wow_significance(spark, sf_dir):
    """Week-over-week conversion movement WITH significance — the
    guardrail that stops dashboards from narrating noise: each week's
    purchase-conversion rate, its delta vs last week, and the pooled
    two-proportion z-test verdict at α=0.05. Weeks are integer
    day-bucket arithmetic from a fixed anchor (no ISO-week
    cross-engine trap); counts are exact int64 and every rate/z term
    is one identical double expression, so the significant flag
    agrees bit-for-bit.

    Scale: combinable rollup to the week spine, lag on the spine —
    scan-bound. The pooled z is the same formula a streaming weekly
    job would emit from its state row."""
    e = table(spark, sf_dir, "events")
    w = e.groupBy(
        F.floor(
            F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
            / 7
        ).alias("week")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias(
            "conv"
        ),
    )
    ww = Window.orderBy("week")
    l = w.select(
        "week",
        "n",
        "conv",
        F.lag("n").over(ww).alias("pn"),
        F.lag("conv").over(ww).alias("pconv"),
    ).filter(F.col("pn").isNotNull())
    rate = F.col("conv").cast("double") / F.col("n")
    prate = F.col("pconv").cast("double") / F.col("pn")
    pool = (F.col("conv") + F.col("pconv")).cast("double") / (
        F.col("n") + F.col("pn")
    )
    z = (rate - prate) / F.sqrt(
        pool * (1 - pool) * (1.0 / F.col("n") + 1.0 / F.col("pn"))
    )
    return l.select(
        "week",
        "n",
        "conv",
        F.round(rate, 6).alias("conv_rate"),
        F.round(rate - prate, 6).alias("wow_delta"),
        F.round(z, 6).alias("z_score"),
        (F.abs(z) > 1.959964).cast("long").alias("significant"),
    )


@register(
    "orders_basket_size_histogram",
    oracle="""
        WITH b AS (
          SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines
          FROM lineitem GROUP BY 1
        ),
        h AS (
          SELECT n_lines, CAST(count(*) AS BIGINT) AS n_orders
          FROM b GROUP BY 1
        ),
        tot AS (SELECT CAST(sum(n_orders) AS BIGINT) AS t FROM h)
        SELECT h.n_lines, h.n_orders,
               round(CAST(h.n_orders AS DOUBLE) / tot.t, 6) AS share,
               round(CAST(sum(h.n_orders) OVER (ORDER BY h.n_lines)
                     AS DOUBLE) / tot.t, 6) AS cum_share
        FROM h, tot
    """,
)
def orders_basket_size_histogram(spark, sf_dir):
    """Basket-size distribution — lines per order as an exact
    histogram with shares and the cumulative curve ("90% of orders
    have ≤7 lines" drives packing, picking, and UI pagination
    decisions alike). Two combinable rollups (order spine → size
    spine); the cumulative window runs on the ≤max-basket-size spine.

    Scale: the second rollup's key cardinality is the max basket
    size (double digits), so the final stage is constant-sized no
    matter the fact volume."""
    li = table(spark, sf_dir, "lineitem")
    b = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n_lines"))
    h = b.groupBy("n_lines").agg(F.count(F.lit(1)).alias("n_orders"))
    tot = h.agg(F.sum("n_orders").alias("t"))
    w = Window.orderBy("n_lines").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return h.crossJoin(F.broadcast(tot)).select(
        "n_lines",
        "n_orders",
        F.round(F.col("n_orders").cast("double") / F.col("t"), 6).alias(
            "share"
        ),
        F.round(
            F.sum("n_orders").over(w).cast("double") / F.col("t"), 6
        ).alias("cum_share"),
    )


LIFECYCLE_ASOF = "2024-01-31"


@register(
    "events_lifecycle_stages",
    oracle=f"""
        WITH u AS (
          SELECT user_id,
                 CAST(DATE '{LIFECYCLE_ASOF}' - max(CAST(ts AS DATE))
                      AS BIGINT) AS recency_days,
                 CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT)
                   AS active_days
          FROM events GROUP BY 1
        ),
        s AS (
          SELECT user_id, recency_days, active_days,
                 CASE WHEN recency_days <= 1 AND active_days >= 29
                        THEN 'power'
                      WHEN recency_days <= 1 AND active_days >= 26
                        THEN 'active'
                      WHEN recency_days <= 2 THEN 'casual'
                      ELSE 'lapsing' END AS stage
          FROM u
        )
        SELECT stage, CAST(count(*) AS BIGINT) AS n_users,
               round(CAST(sum(recency_days) AS DOUBLE) / count(*), 6)
                 AS avg_recency_days,
               round(CAST(sum(active_days) AS DOUBLE) / count(*), 6)
                 AS avg_active_days
        FROM s GROUP BY 1
    """,
)
def events_lifecycle_stages(spark, sf_dir):
    """User-lifecycle segmentation as of a fixed snapshot date —
    power / active / casual / lapsing by recency and activity-day
    rules, the stage table every retention team keys campaigns off.
    (Thresholds are tuned to this fixture's dense January traffic so
    every stage is populated; production swaps the constants.)
    Rule thresholds are pure integer day comparisons (bit-identical
    staging in both engines); per-stage averages are the only
    doubles. Complements orders_rfm_segmentation (quantile bands on
    spend) with the rule-based engagement view.

    Scale: one combinable pass with an embedded distinct-day count
    (two-tier aggregate) to the user spine; the stage rollup is
    4 rows."""
    e = table(spark, sf_dir, "events")
    asof = F.lit(LIFECYCLE_ASOF).cast("date")
    u = e.groupBy("user_id").agg(
        F.datediff(asof, F.max(F.to_date("ts"))).cast("long").alias(
            "recency_days"
        ),
        F.countDistinct(F.to_date("ts")).alias("active_days"),
    )
    stage = (
        F.when(
            (F.col("recency_days") <= 1) & (F.col("active_days") >= 29),
            "power",
        )
        .when(
            (F.col("recency_days") <= 1) & (F.col("active_days") >= 26),
            "active",
        )
        .when(F.col("recency_days") <= 2, "casual")
        .otherwise("lapsing")
    )
    s = u.select("recency_days", "active_days", stage.alias("stage"))
    return s.groupBy("stage").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.round(
            F.sum("recency_days").cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_recency_days"),
        F.round(
            F.sum("active_days").cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_active_days"),
    )


@register(
    "orders_discount_response_curve",
    oracle="""
        WITH b AS (
          SELECT CAST(round(l_discount * 100) AS BIGINT) AS disc_pct,
                 CAST(l_quantity AS BIGINT) AS qty,
                 CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
          FROM lineitem
        ),
        g AS (
          SELECT disc_pct, CAST(count(*) AS BIGINT) AS n_lines,
                 CAST(sum(qty) AS BIGINT) AS units,
                 CAST(sum(cents) AS BIGINT) AS cents
          FROM b GROUP BY 1
        ),
        tot AS (SELECT CAST(sum(cents) AS BIGINT) AS t FROM g)
        SELECT disc_pct, n_lines, units,
               round(CAST(units AS DOUBLE) / n_lines, 6)
                 AS avg_units_per_line,
               round(CAST(g.cents AS DOUBLE) / tot.t, 6)
                 AS revenue_share
        FROM g, tot
    """,
)
def orders_discount_response_curve(spark, sf_dir):
    """Discount response curve — average units per line and revenue
    share at each whole-percent discount level, the first chart any
    pricing analysis draws ("do deeper discounts actually move more
    units, and how much revenue rides each band?"). Discount
    percentages are exact integers (round(d·100)); all masses are
    exact int64 with the two ratios as final doubles.

    Scale: one combinable rollup to the ≤11-row discount spine —
    scan-bound; the share join broadcasts a scalar."""
    li = table(spark, sf_dir, "lineitem")
    g = li.groupBy(
        F.round(F.col("l_discount") * 100).cast("long").alias("disc_pct")
    ).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("l_quantity").cast("long")).alias("units"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
            "cents"
        ),
    )
    tot = g.agg(F.sum("cents").alias("t"))
    return g.crossJoin(F.broadcast(tot)).select(
        "disc_pct",
        "n_lines",
        "units",
        F.round(F.col("units").cast("double") / F.col("n_lines"), 6).alias(
            "avg_units_per_line"
        ),
        F.round(F.col("cents").cast("double") / F.col("t"), 6).alias(
            "revenue_share"
        ),
    )


@register(
    "orders_shipment_consolidation",
    oracle="""
        WITH sh AS (
          SELECT l_orderkey,
                 CAST(count(DISTINCT CAST(l_shipdate AS DATE)) AS BIGINT)
                   AS n_ship_days,
                 CAST(count(*) AS BIGINT) AS n_lines
          FROM lineitem GROUP BY 1
        )
        SELECT CAST(count(*) AS BIGINT) AS n_orders,
               round(CAST(sum(n_ship_days) AS DOUBLE) / count(*), 6)
                 AS avg_shipments_per_order,
               round(CAST(sum(CAST(n_ship_days = 1 AS BIGINT)) AS DOUBLE)
                     / count(*), 6) AS single_shipment_share,
               round(CAST(sum(n_lines) AS DOUBLE) / sum(n_ship_days), 6)
                 AS avg_lines_per_shipment
        FROM sh
    """,
)
def orders_shipment_consolidation(spark, sf_dir):
    """Shipment consolidation report — distinct ship dates per order
    as a proxy for physical shipments: average shipments per order,
    the share of orders fulfilled in ONE shipment (the customer-
    experience number), and lines per shipment (the packing-density
    number logistics optimizes). One two-tier aggregate (distinct
    dates inside the order rollup) plus a scalar fold — all exact
    int64 until the three final ratios.

    Scale: the distinct-inside-groupBy plans as a two-level partial
    aggregate on the order key; the final fold is a single
    combinable pass over the order spine."""
    li = table(spark, sf_dir, "lineitem")
    sh = li.groupBy("l_orderkey").agg(
        F.countDistinct(F.col("l_shipdate").cast("date")).alias(
            "n_ship_days"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )
    return sh.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(
            F.sum("n_ship_days").cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_shipments_per_order"),
        F.round(
            F.sum((F.col("n_ship_days") == 1).cast("long")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("single_shipment_share"),
        F.round(
            F.sum("n_lines").cast("double") / F.sum("n_ship_days"), 6
        ).alias("avg_lines_per_shipment"),
    )


KMV_K = 64  # bottom-k sketch size: RSE ~ 1/sqrt(K-2) ~ 12.7%


@register(
    "agg_kmv_distinct",
    oracle=f"""
        WITH h AS (
            SELECT DISTINCT event_type,
                   CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                        AS BIGINT) AS hv
            FROM events),
        scoped AS (
            SELECT event_type AS scope, hv FROM h
            UNION ALL
            SELECT 'TOTAL' AS scope, hv FROM (SELECT DISTINCT hv FROM h)),
        ranked AS (
            SELECT scope, hv,
                   row_number() OVER (PARTITION BY scope ORDER BY hv) AS rn,
                   count(*) OVER (PARTITION BY scope) AS n_hashes
            FROM scoped),
        kth AS (
            SELECT scope, max(hv) AS hk, max(n_hashes) AS n_hashes
            FROM ranked WHERE rn <= {KMV_K} GROUP BY scope),
        ex AS (
            SELECT event_type AS scope,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users
            FROM events GROUP BY event_type
            UNION ALL
            SELECT 'TOTAL', CAST(count(DISTINCT user_id) AS BIGINT)
            FROM events)
        SELECT k.scope,
               CASE WHEN k.n_hashes < {KMV_K} THEN k.n_hashes
                    ELSE ({KMV_K - 1} * 4294967296) // k.hk END AS est_users,
               ex.exact_users
        FROM kth k JOIN ex ON ex.scope = k.scope
        ORDER BY k.scope
    """,
)
def agg_kmv_distinct(spark, sf_dir):
    """KMV (k-minimum-values / bottom-k) distinct-count sketch — the
    fourth sketch family member (HLL: agg_hll_sketch_merge, CMS:
    agg_count_min_sketch, top-k: agg_approx_top_k) and, unlike
    Spark's internal HLL bytes, fully value-hash-oracled: the sketch
    IS the K smallest portable md5 hashes, so both engines compute
    the identical estimate (K-1)·2^32 // h_(K) (Bar-Yossef et al.
    2002), with the exact count answered directly when fewer than K
    distinct hashes exist.

    Scale shape: bottom-K per group is a per-key window limit —
    Spark plans WindowGroupLimit, which prunes to K rows map-side
    before the shuffle — and the TOTAL sketch is the bottom-K of the
    UNION of per-type sketches (mergeability, the property that lets
    per-day sketches roll up to any grain without rescanning). The
    integer floor-div estimate is portable (positive operands, where
    DuckDB's // equals Spark's div)."""
    e = table(spark, sf_dir, "events")
    h = (
        e.select(
            "event_type",
            F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
            .cast("long")
            .alias("hv"),
        )
        .distinct()
    )
    scoped = h.select(F.col("event_type").alias("scope"), "hv").unionByName(
        h.select("hv").distinct().select(F.lit("TOTAL").alias("scope"), "hv")
    )
    w = Window.partitionBy("scope").orderBy("hv")
    # rank filter directly above a SINGLE window function so Spark's
    # InferWindowGroupLimit fires (plan-asserted): each map task keeps
    # only its local bottom-K before the shuffle — the property that
    # makes a bottom-K sketch O(K) per task at 100 TB. The per-scope
    # hash count rides a separate map-side-combinable agg instead of
    # a second window function (which would block the rewrite).
    counts = scoped.groupBy("scope").agg(F.count(F.lit(1)).alias("n_hashes"))
    kth = (
        scoped.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .groupBy("scope")
        .agg(F.max("hv").alias("hk"))
        .join(counts, "scope")
    )
    ex = (
        e.groupBy(F.col("event_type").alias("scope"))
        .agg(F.countDistinct("user_id").alias("exact_users"))
        .unionByName(
            e.agg(F.countDistinct("user_id").alias("exact_users")).select(
                F.lit("TOTAL").alias("scope"), "exact_users"
            )
        )
    )
    est = F.when(F.col("n_hashes") < KMV_K, F.col("n_hashes")).otherwise(
        F.expr(f"({KMV_K - 1} * 4294967296) div hk")
    )
    return (
        kth.join(ex, "scope")
        .select("scope", est.alias("est_users"), "exact_users")
        .orderBy("scope")
    )


HLLP_B = 4  # register-index bits -> m = 16 registers
HLLP_M = 1 << HLLP_B
HLLP_ALPHA_M2 = 0.673 * HLLP_M * HLLP_M  # alpha_16 * m^2, one double literal


def _hllp_rho_sql(col):
    """Leading-zero rank of the 28-bit hash remainder as a CASE chain
    of pure integer comparisons — no log2/bit_length, so both engines
    agree bit-for-bit."""
    arms = " ".join(
        f"WHEN {col} >= {1 << (27 - r)} THEN {r + 1}" for r in range(28)
    )
    return f"CASE {arms} ELSE 29 END"


@register(
    "agg_hll_portable",
    oracle=f"""
        WITH h AS (
            SELECT DISTINCT event_type,
                   CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                        AS BIGINT) AS hv
            FROM events),
        reg0 AS (
            SELECT event_type, hv >> 28 AS bucket,
                   {_hllp_rho_sql("(hv & 268435455)")} AS rho
            FROM h),
        regs AS (
            SELECT event_type AS scope, bucket, max(rho) AS m
            FROM reg0 GROUP BY 1, 2
            UNION ALL
            SELECT 'TOTAL', bucket, max(rho) FROM reg0 GROUP BY 2),
        s AS (
            SELECT scope,
                   sum(1.0 / (1::BIGINT << m)) + ({HLLP_M} - count(*)) * 1.0 AS ssum
            FROM regs GROUP BY scope),
        ex AS (
            SELECT event_type AS scope,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users
            FROM events GROUP BY event_type
            UNION ALL
            SELECT 'TOTAL', CAST(count(DISTINCT user_id) AS BIGINT)
            FROM events)
        SELECT s.scope,
               CAST({HLLP_ALPHA_M2!r} AS DOUBLE) / s.ssum AS est_users,
               ex.exact_users
        FROM s JOIN ex ON ex.scope = s.scope
        ORDER BY s.scope
    """,
)
def agg_hll_portable(spark, sf_dir):
    """Explicit PORTABLE HyperLogLog (Flajolet et al. 2007) — the
    white-box twin of agg_hll_sketch_merge: registers are max
    leading-zero ranks of md5-hash remainders (bucket = top 4 hash
    bits, m=16), the TOTAL sketch is the per-bucket MAX across the
    per-type sketches (the HLL merge), and the raw estimate
    alpha_m·m²/S is a deterministic double because S = Σ2^(−M_j) is
    a sum of single-bit binary fractions (M ≤ 29 spans < 52 mantissa
    bits — EXACT in IEEE double in any summation order) and the rho
    rank is a pure integer CASE chain, no log2. So unlike Spark's
    internal sketch bytes, every register and the estimate itself
    value-hash against the oracle.

    Scale shape: one map-side-combinable (scope, bucket) max-agg —
    registers are the only state (m rows per group), the merge is
    associative, and nothing but the 16-register table leaves the
    aggregation. n=150–1500 here sits in the raw-HLL regime for m=16
    (n > 2.5m), so no small-range correction branch is exercised."""
    e = table(spark, sf_dir, "events")
    h = (
        e.select(
            "event_type",
            F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
            .cast("long")
            .alias("hv"),
        )
        .distinct()
    )
    reg0 = h.select(
        "event_type",
        F.shiftright("hv", 28).alias("bucket"),
        F.expr(_hllp_rho_sql("(hv & 268435455)")).alias("rho"),
    )
    regs = (
        reg0.groupBy(F.col("event_type").alias("scope"), "bucket")
        .agg(F.max("rho").alias("m"))
        .unionByName(
            reg0.groupBy("bucket")
            .agg(F.max("rho").alias("m"))
            .select(F.lit("TOTAL").alias("scope"), "bucket", "m")
        )
    )
    s = regs.groupBy("scope").agg(
        (
            F.sum(F.lit(1.0) / F.expr("1L << m"))
            + (F.lit(HLLP_M) - F.count(F.lit(1))) * F.lit(1.0)
        ).alias("ssum")
    )
    ex = (
        e.groupBy(F.col("event_type").alias("scope"))
        .agg(F.countDistinct("user_id").alias("exact_users"))
        .unionByName(
            e.agg(F.countDistinct("user_id").alias("exact_users")).select(
                F.lit("TOTAL").alias("scope"), "exact_users"
            )
        )
    )
    return (
        s.join(ex, "scope")
        .select(
            "scope",
            (F.lit(HLLP_ALPHA_M2) / F.col("ssum")).alias("est_users"),
            "exact_users",
        )
        .orderBy("scope")
    )


@register(
    "agg_kmv_set_ops",
    oracle=f"""
        WITH h AS (
            SELECT DISTINCT event_type,
                   CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                        AS BIGINT) AS hv
            FROM events),
        sk AS MATERIALIZED (
            SELECT event_type, hv FROM (
                SELECT event_type, hv,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY hv) AS rn
                FROM h) WHERE rn <= {KMV_K}),
        pd AS (SELECT a.event_type AS ta, b.event_type AS tb
               FROM (SELECT DISTINCT event_type FROM events) a
               JOIN (SELECT DISTINCT event_type FROM events) b
                 ON a.event_type < b.event_type),
        pu AS (SELECT DISTINCT ta, tb, hv FROM (
                   SELECT p.ta, p.tb, s.hv FROM pd p
                   JOIN sk s ON s.event_type = p.ta
                   UNION ALL
                   SELECT p.ta, p.tb, s.hv FROM pd p
                   JOIN sk s ON s.event_type = p.tb)),
        m AS MATERIALIZED (
            SELECT ta, tb, hv FROM (
                SELECT ta, tb, hv,
                       row_number() OVER (PARTITION BY ta, tb
                                          ORDER BY hv) AS rn
                FROM pu) WHERE rn <= {KMV_K}),
        mstats AS (
            SELECT m.ta, m.tb,
                   CAST(count(*) AS BIGINT) AS n_kept,
                   max(m.hv) AS hk,
                   CAST(sum(CASE WHEN sa.hv IS NOT NULL
                                  AND sb.hv IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_both
            FROM m
            LEFT JOIN sk sa ON sa.event_type = m.ta AND sa.hv = m.hv
            LEFT JOIN sk sb ON sb.event_type = m.tb AND sb.hv = m.hv
            GROUP BY 1, 2),
        est AS (
            SELECT ta, tb, n_both, n_kept,
                   CASE WHEN n_kept < {KMV_K} THEN n_kept
                        ELSE ({KMV_K - 1} * 4294967296) // hk END AS est_union
            FROM mstats),
        ex AS (
            SELECT p.ta, p.tb,
                   CAST(count(DISTINCT e.user_id) AS BIGINT) AS exact_union,
                   CAST(count(DISTINCT CASE WHEN ea.user_id IS NOT NULL
                                             AND eb.user_id IS NOT NULL
                                        THEN e.user_id END) AS BIGINT)
                       AS exact_inter
            FROM pd p
            JOIN events e ON e.event_type IN (p.ta, p.tb)
            LEFT JOIN (SELECT DISTINCT event_type, user_id FROM events) ea
              ON ea.event_type = p.ta AND ea.user_id = e.user_id
            LEFT JOIN (SELECT DISTINCT event_type, user_id FROM events) eb
              ON eb.event_type = p.tb AND eb.user_id = e.user_id
            GROUP BY 1, 2)
        SELECT e.ta AS type_a, e.tb AS type_b,
               e.est_union,
               (e.n_both * e.est_union) // e.n_kept AS est_inter,
               x.exact_union, x.exact_inter
        FROM est e JOIN ex x ON x.ta = e.ta AND x.tb = e.tb
        ORDER BY type_a, type_b
    """,
)
def agg_kmv_set_ops(spark, sf_dir):
    """KMV sketch SET ALGEBRA (the theta-sketch pattern): for every
    event-type pair, the union's distinct-user count is estimated
    from the bottom-K of the MERGED sketches, and the intersection
    via the inclusion fraction — the share of the union's K-mins
    present in BOTH per-type sketches, scaled by the union estimate
    (Beyer et al. 2007). This is the query sketches exist for at
    100 TB: per-segment sketches are built once, then ANY pair's
    union/intersection/Jaccard is answered from 2×K integers without
    rescanning — the audience-overlap query shape. Everything is
    exact integer arithmetic over portable md5 hashes, so the
    estimates (not just the exacts) value-hash against the oracle.

    Scale: per-type sketches are the same WindowGroupLimit bottom-K
    as agg_kmv_distinct; the pair fan-out joins the 10-row type-pair
    dim to K-row sketches — O(pairs·K), corpus-independent. Exact
    comparison columns ride separate distinct joins (fixture-sized
    here; at scale you would NOT compute them — that is the point)."""
    e = table(spark, sf_dir, "events")
    h = (
        e.select(
            "event_type",
            F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
            .cast("long")
            .alias("hv"),
        )
        .distinct()
    )
    w = Window.partitionBy("event_type").orderBy("hv")
    sk = (
        h.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .select("event_type", "hv")
        .persist()  # consumed by the union build AND two membership joins
    )
    types = e.select("event_type").distinct()
    pd_ = (
        types.select(F.col("event_type").alias("ta"))
        .join(
            types.select(F.col("event_type").alias("tb")),
            F.col("ta") < F.col("tb"),
        )
    )
    pu = (
        pd_.join(sk.withColumnsRenamed({"event_type": "ta"}), "ta")
        .select("ta", "tb", "hv")
        .unionByName(
            pd_.join(sk.withColumnsRenamed({"event_type": "tb"}), "tb")
            .select("ta", "tb", "hv")
        )
        .distinct()
    )
    wm = Window.partitionBy("ta", "tb").orderBy("hv")
    m = (
        pu.withColumn("rn", F.row_number().over(wm))
        .filter(F.col("rn") <= KMV_K)
        .select("ta", "tb", "hv")
    )
    sa = sk.select(F.col("event_type").alias("ta"), F.col("hv").alias("ha"))
    sb = sk.select(F.col("event_type").alias("tb"), F.col("hv").alias("hb"))
    mstats = (
        m.join(sa, (sa.ta == m.ta) & (sa.ha == m.hv), "left")
        .join(sb, (sb.tb == m.tb) & (sb.hb == m.hv), "left")
        .groupBy(m.ta, m.tb)
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.max(m.hv).alias("hk"),
            F.sum(
                (F.col("ha").isNotNull() & F.col("hb").isNotNull()).cast("long")
            ).alias("n_both"),
        )
    )
    est_union = F.when(F.col("n_kept") < KMV_K, F.col("n_kept")).otherwise(
        F.expr(f"({KMV_K - 1} * 4294967296) div hk")
    )
    est = mstats.select(
        "ta",
        "tb",
        est_union.alias("est_union"),
        "n_both",
        "n_kept",
    )
    # exact comparison columns: per pair, union = distinct users in
    # either type, intersection = distinct users in both
    tu = e.select("event_type", "user_id").distinct().persist()
    ua = tu.withColumnsRenamed({"event_type": "ta"})
    ub = tu.withColumnsRenamed({"event_type": "tb"})
    ue = (
        pd_.join(ua, "ta").select("ta", "tb", "user_id")
        .unionByName(pd_.join(ub, "tb").select("ta", "tb", "user_id"))
        .distinct()
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).alias("exact_union"))
    )
    ie = (
        pd_.join(ua, "ta")
        .join(ub.select("tb", F.col("user_id").alias("u2")),
              "tb")
        .filter(F.col("user_id") == F.col("u2"))
        .select("ta", "tb", "user_id")
        .distinct()
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).alias("exact_inter"))
    )
    return (
        est.join(ue, ["ta", "tb"])
        .join(ie, ["ta", "tb"], "left")
        .select(
            F.col("ta").alias("type_a"),
            F.col("tb").alias("type_b"),
            "est_union",
            F.expr("(n_both * est_union) div n_kept").alias("est_inter"),
            "exact_union",
            F.coalesce("exact_inter", F.lit(0)).alias("exact_inter"),
        )
        .orderBy("type_a", "type_b")
    )
