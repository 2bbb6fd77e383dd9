"""Catalog / partition-registration surface (VERDICT r2 item 3).

The production pipeline's parquet output is consumed through a catalog
(AWS Glue + Athena): the writer lands `dt=/hr=` directories on S3 and a
`MSCK REPAIR TABLE` (or Glue crawler) registers the partitions so
engines can prune by partition predicate. This module reproduces that
publicly-documented step on Spark's built-in catalog: external
partitioned table DDL + `MSCK REPAIR TABLE` + read-back through the
catalog identifier with partition pruning.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import register, scratch_dir, table

TABLE_NAME = "engine_cat_events_parts"


@register(
    "catalog_partition_register",
    oracle="""
        SELECT strftime(ts, '%Y-%m-%d') AS dt,
               strftime(ts, '%H') AS hr,
               count(*) AS n_rows,
               CAST(sum(event_id) AS BIGINT) AS sum_event_id
        FROM events
        GROUP BY 1, 2
    """,
)
def catalog_partition_register(spark, sf_dir):
    """Glue/Athena registration analogue, end to end: write events as
    dt= partitioned parquet → declare an EXTERNAL partitioned
    table over the directory (explicit string partition column — no
    directory-name type inference) →
    `MSCK REPAIR TABLE` discovers the partitions into the catalog →
    read back THROUGH THE CATALOG IDENTIFIER and aggregate per
    (partition, hour). The oracle restates the expected per-partition rollup
    straight from events, so a partition lost (or double-registered)
    by the repair step is a value-hash failure, not just a row-count
    blip. At scale the repair is a metadata-only listing; the
    aggregation prunes to partition columns + two longs."""
    e = table(spark, sf_dir, "events")
    base = scratch_dir("catalog_partition_register")
    path = f"{base}/tbl"
    # Partition by DAY, keep hr as a data column: dtxhr would mean 720
    # directories of ~100-row files at bench scale — the classic
    # small-files anti-pattern (measured 21s vs ~2s). repartition(dt)
    # gives one writer task -> one file per partition.
    (
        e.select(
            "event_id",
            "user_id",
            "value",
            F.date_format("ts", "yyyy-MM-dd").alias("dt"),
            F.date_format("ts", "HH").alias("hr"),
        )
        .repartition("dt")
        .write.partitionBy("dt")
        .mode("overwrite")
        .parquet(path)
    )
    spark.sql(f"DROP TABLE IF EXISTS {TABLE_NAME}")
    spark.sql(
        f"""
        CREATE TABLE {TABLE_NAME}
          (event_id BIGINT, user_id BIGINT, value DOUBLE,
           hr STRING, dt STRING)
        USING parquet
        PARTITIONED BY (dt)
        LOCATION '{path}'
        """
    )
    # Freshly created: catalog knows the table but ZERO partitions —
    # a read now returns nothing. MSCK REPAIR walks dt=* and registers
    # each, exactly like the Athena/Glue flow.
    spark.sql(f"MSCK REPAIR TABLE {TABLE_NAME}")
    return (
        spark.table(TABLE_NAME)
        .groupBy("dt", "hr")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("event_id").alias("sum_event_id"),
        )
    )


@register(
    "sink_partition_overwrite_backfill",
    oracle="""
        SELECT strftime(ts, '%Y-%m-%d') AS dt,
               count(*) AS n_rows,
               CAST(sum(event_id) AS BIGINT) AS sum_event_id
        FROM events
        GROUP BY 1
    """,
)
def sink_partition_overwrite_backfill(spark, sf_dir):
    """Single-partition backfill via DYNAMIC partition overwrite — the
    day-repair operation every partitioned pipeline needs: a bad day
    landed, rewrite exactly that day, leave every other day's files
    untouched.

    The op plants a corrupted day (event_ids negated for the earliest
    dt), then backfills only that day with
    partitionOverwriteMode=dynamic + write.mode(overwrite): Spark
    replaces just the partitions present in the incoming frame. The
    oracle is the CLEAN full-corpus rollup, so the value-hash proves
    both properties at once — the bad day was repaired AND the static
    overwrite failure mode (wiping all other partitions) did not
    happen. At scale this is an O(one partition) rewrite, not a table
    rewrite."""
    e = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "value",
        F.date_format("ts", "yyyy-MM-dd").alias("dt"),
    )
    base = scratch_dir("sink_partition_overwrite_backfill")
    path = f"{base}/tbl"
    bad_day = e.agg(F.min("dt")).collect()[0][0]

    corrupted = e.withColumn(
        "event_id",
        F.when(F.col("dt") == bad_day, -F.col("event_id")).otherwise(
            F.col("event_id")
        ),
    )
    corrupted.repartition("dt").write.partitionBy("dt").mode("overwrite").parquet(path)

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (
        e.filter(F.col("dt") == bad_day)
        .repartition("dt")
        .write.partitionBy("dt")
        .mode("overwrite")
        .parquet(path)
    )
    # Partition-column type inference turns the dt= directory name into
    # a DATE column on read-back, while the oracle emits VARCHAR; the
    # driver's strict schema compare would flag the divergence (ADVICE
    # r3). Cast back to the string the writer produced.
    return (
        spark.read.parquet(path)
        .withColumn("dt", F.col("dt").cast("string"))
        .groupBy("dt")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("event_id").alias("sum_event_id"),
        )
    )


@register(
    "join_reorder_cbo",
    oracle="""
        SELECT n.n_name,
               count(*) AS n_orders,
               CAST(sum(o.o_orderkey) AS BIGINT) AS sum_okey
        FROM orders o, customer c, nation n
        WHERE o.o_custkey = c.c_custkey
          AND c.c_nationkey = n.n_nationkey
          AND o.o_orderstatus = 'O'
        GROUP BY n.n_name
    """,
)
def join_reorder_cbo(spark, sf_dir):
    """Cost-based-optimizer path, end to end (SURVEY §4 commitment;
    VERDICT r3 item 5): register the three join tables in the catalog,
    `ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS <join keys>`,
    enable CBO + stats-based join reordering, and run the canonical
    star query (orders ⋈ customer ⋈ nation) THROUGH the catalog
    identifiers so Catalyst plans against the collected statistics
    instead of raw file sizes.

    Why this matters at 100 TB: size-on-disk estimates stop being
    broadcast-decidable once compression/filter selectivity diverge
    from row counts — `sizeInBytes` of a compressed scan wildly
    under/over-estimates the post-filter build side. ANALYZE'd
    rowCount + column NDV let the optimizer (a) keep small dims on
    the broadcast side deliberately and (b) reorder multi-join
    chains by estimated cardinality (CostBasedJoinReorder is a
    DP over the join graph, only active when every input has
    rowCount stats). tests/test_plans.py asserts the optimized
    plan carries catalog rowCount statistics and broadcasts both
    dims — the stats-driven decision, not the file-size fallback.

    Conf scoping (round-4 review finding): the two CBO confs are
    restored in a finally block — the shared suite session must not
    plan every SUBSEQUENT query with CBO estimation active. The
    result is materialized to a localCheckpoint while CBO is still
    on, so the returned frame carries the CBO-planned answer; plan
    inspection re-enables the confs itself via _cbo_frame (the
    catalog stats persist — ANALYZE is durable, only the planner
    flags are scoped).
    """
    base = scratch_dir("join_reorder_cbo")
    for t in ("orders", "customer", "nation"):
        table(spark, sf_dir, t).write.mode("overwrite").parquet(f"{base}/{t}")
        spark.sql(f"DROP TABLE IF EXISTS engine_cbo_{t}")
        spark.sql(
            f"CREATE TABLE engine_cbo_{t} USING parquet LOCATION '{base}/{t}'"
        )
    spark.sql(
        "ANALYZE TABLE engine_cbo_orders COMPUTE STATISTICS "
        "FOR COLUMNS o_custkey, o_orderstatus"
    )
    spark.sql(
        "ANALYZE TABLE engine_cbo_customer COMPUTE STATISTICS "
        "FOR COLUMNS c_custkey, c_nationkey"
    )
    spark.sql(
        "ANALYZE TABLE engine_cbo_nation COMPUTE STATISTICS "
        "FOR COLUMNS n_nationkey, n_name"
    )
    from ..session import scoped_confs

    with scoped_confs(
        spark,
        **{
            "spark.sql.cbo.enabled": "true",
            "spark.sql.cbo.joinReorder.enabled": "true",
        },
    ):
        return _cbo_frame(spark).localCheckpoint(eager=True)


def _cbo_frame(spark):
    """The CBO demonstration query against the ANALYZE'd catalog
    tables. Lazily planned: callers that want to INSPECT the
    CBO-driven plan (tests/test_plans.py) must enable the CBO confs
    around planning themselves; join_reorder_cbo materializes it
    inside its scoped-conf window."""
    return spark.sql(
        """
        SELECT n.n_name,
               count(*) AS n_orders,
               CAST(sum(o.o_orderkey) AS BIGINT) AS sum_okey
        FROM engine_cbo_orders o, engine_cbo_customer c, engine_cbo_nation n
        WHERE o.o_custkey = c.c_custkey
          AND c.c_nationkey = n.n_nationkey
          AND o.o_orderstatus = 'O'
        GROUP BY n.n_name
        """
    )
