"""2.C — joins (SURVEY §2.C).

Scale notes baked into each operator: dimension tables (region,
nation, supplier, part at dim-scale) are broadcast explicitly; fact-
fact joins shuffle on their keys and rely on AQE for skew splitting;
the theta join pre-filters both sides so the nested-loop product
stays bounded; the as-of join is expressed as join+window, which at
cluster scale shuffles once on the equi key and sorts within
partitions (no driver-side logic).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..dsl import dsum
from ..registry import register, scratch_dir, table


@register(
    "join_inner_equi",
    oracle="""
        SELECT o_orderkey, o_totalprice, c_custkey, c_name, c_mktsegment
        FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def join_inner_equi(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "join_left_outer",
    oracle="""
        SELECT c_custkey, c_name, o_orderkey, o_totalprice
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    """,
)
def join_left_outer(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@register(
    "join_right_outer",
    oracle="""
        SELECT p_partkey, p_brand, l_orderkey, l_quantity
        FROM lineitem RIGHT JOIN part ON l_partkey = p_partkey
    """,
)
def join_right_outer(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    return li.join(p, li.l_partkey == p.p_partkey, "right").select(
        "p_partkey", "p_brand", "l_orderkey", "l_quantity"
    )


@register(
    "join_full_outer",
    oracle="""
        SELECT a.k AS big_spender_key, b.k AS negative_bal_key, b.c_name
        FROM (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > 300000.0) a
        FULL OUTER JOIN
             (SELECT c_custkey AS k, c_name FROM customer WHERE c_acctbal < 0.0) b
        ON a.k = b.k
    """,
)
def join_full_outer(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    a = (
        o.filter(F.col("o_totalprice") > 300000.0)
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    b = c.filter(F.col("c_acctbal") < 0.0).select(
        F.col("c_custkey").alias("k"), "c_name"
    )
    return a.join(b, a.k == b.k, "full").select(
        a.k.alias("big_spender_key"), b.k.alias("negative_bal_key"), "c_name"
    )


@register(
    "join_left_semi",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000.0)
    """,
)
def join_left_semi(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_left_anti",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000.0)
    """,
)
def join_left_anti(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_cross",
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation",
)
def join_cross(spark, sf_dir):
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@register(
    "join_broadcast",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, p_brand, p_size
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_size > 40
    """,
)
def join_broadcast(spark, sf_dir):
    """Inner equi-join with an explicit broadcast hint on the dim side.

    part is dimension-scale (20k rows at sf0.1); broadcasting it keeps
    the 600k/100 TB fact side shuffle-free — tests assert the physical
    plan contains BroadcastHashJoin.
    """
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_size") > 40)
    return li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "l_orderkey", "l_linenumber", "l_quantity", "p_brand", "p_size"
    )


@register(
    "join_multikey",
    oracle="""
        SELECT
          n_name,
          sum(CAST(round(l_extendedprice*(1-l_discount)*10000) AS BIGINT))/10000.0 AS revenue
        FROM customer
        JOIN orders   ON c_custkey  = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY n_name
    """,
)
def join_multikey(spark, sf_dir):
    """TPC-H Q5 shape: 6-table join with a 2-key equi join in the middle."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000).alias(
                "revenue"
            )
        )
    )


@register(
    "join_theta_range",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_extendedprice, p_partkey, p_retailprice
        FROM (SELECT * FROM lineitem WHERE l_quantity = 1.0) l
        JOIN (SELECT * FROM part WHERE p_size > 45) p
          ON l.l_extendedprice >= p.p_retailprice * 10.0
         AND l.l_extendedprice <  p.p_retailprice * 11.0
    """,
)
def join_theta_range(spark, sf_dir):
    """Non-equi (range) join. Both sides are pre-filtered so the
    nested-loop product stays bounded; at cluster scale this becomes a
    broadcast-nested-loop with the small filtered side broadcast."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") == 1.0)
    p = table(spark, sf_dir, "part").filter(F.col("p_size") > 45)
    cond = (li.l_extendedprice >= p.p_retailprice * 10.0) & (
        li.l_extendedprice < p.p_retailprice * 11.0
    )
    return li.join(F.broadcast(p), cond, "inner").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "p_partkey", "p_retailprice"
    )


@register(
    "join_asof",
    oracle="""
        WITH od AS (
          SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
          FROM orders GROUP BY o_custkey, o_orderdate
        )
        SELECT e.event_id, e.user_id, e.ts, od.o_orderkey, od.o_orderdate
        FROM events e
        ASOF JOIN od ON e.user_id = od.o_custkey AND e.ts >= od.o_orderdate
    """,
)
def join_asof(spark, sf_dir):
    """As-of join: latest order at-or-before each event, per user.

    Spark has no ASOF JOIN; idiomatic emulation is equi-join on the
    key + event-time filter + row_number over (event, orderdate desc).
    One shuffle on the equi key; the window sorts within partitions.
    Orders are first collapsed to one row per (custkey, orderdate) so
    tie-breaking matches DuckDB's ASOF deterministically.
    """
    e = table(spark, sf_dir, "events")
    o = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    j = e.join(o, (e.user_id == o.o_custkey) & (e.ts >= o.o_orderdate), "inner")
    w = Window.partitionBy("event_id").orderBy(F.desc("o_orderdate"))
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "ts", "o_orderkey", "o_orderdate")
    )


@register(
    "join_bucketed_colocated",
    oracle="""
        SELECT o.o_orderkey, o.o_custkey, o.o_totalprice,
               c.c_name, c.c_acctbal
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def join_bucketed_colocated(spark, sf_dir):
    """Shuffle-free co-located join via bucketing — THE pre-shuffle
    technique for repeated large-table joins at 100 TB: both sides are
    written bucketed+sorted on the join key (8 buckets here; thousands
    in production), so the sort-merge join reads matching buckets
    directly with no Exchange in the plan (asserted in
    tests/test_plans.py). Auto-broadcast is disabled for this query
    only, else Spark would broadcast the toy-scale dim side and hide
    the bucketing path; the conf is restored by the registry wrapper
    on the next query.
    """
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # the demonstrated shape is the SORT-merge over pre-sorted buckets;
    # the session default now allows shuffled-hash (round-12), which
    # would trade the free merge for a needless hash build here
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
    base = scratch_dir("bucketed")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    for name, df, key in (
        ("b_orders", o, "o_custkey"),
        ("b_customer", c, "c_custkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, key)
            .sortBy(key)
            .option("path", f"{base}/{name}")
            .mode("overwrite")
            .saveAsTable(name)
        )
    bo, bc = spark.table("b_orders"), spark.table("b_customer")
    return bo.join(bc, bo.o_custkey == bc.c_custkey).select(
        "o_orderkey", "o_custkey", "o_totalprice", "c_name", "c_acctbal"
    )


N_SALTS = 8


@register(
    "join_skew_salted",
    oracle="""
        SELECT e.event_id, e.user_id, c.c_name, e.value
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def join_skew_salted(spark, sf_dir):
    """Skew-proof fact⋈dim join by key salting, with semantics
    identical to the plain equi-join (the oracle IS the plain join).

    The fact side gets salt = hash(event_id) % N_SALTS; the dim side is
    exploded ×N_SALTS; the join key becomes (user_id, salt), splitting
    any hot user across N_SALTS reducers. This is the manual fallback
    for when AQE skew-join splitting isn't enough (a single key too hot
    for one partition at 100 TB). N_SALTS scales with observed skew.
    """
    e = table(spark, sf_dir, "events").withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(N_SALTS)).cast("int")
    )
    c = table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        F.explode(
            F.array(*[F.lit(i) for i in range(N_SALTS)])
        ).alias("salt"),
    )
    return (
        e.join(c, (e.user_id == c.c_custkey) & (e.salt == c.salt))
        .select("event_id", "user_id", "c_name", "value")
    )


@register(
    "join_skew_aqe",
    oracle="""
        SELECT e.event_id,
               CASE WHEN e.event_id % 10 <> 0
                    THEN 1 ELSE e.user_id END AS skew_key,
               c.c_name, e.value
        FROM events e
        JOIN customer c
          ON (CASE WHEN e.event_id % 10 <> 0
                   THEN 1 ELSE e.user_id END) = c.c_custkey
    """,
)
def join_skew_aqe(spark, sf_dir):
    """AQE runtime skew-split demonstration (VERDICT r2 item 8) — the
    automatic counterpart to join_skew_salted's manual salting.

    The fact side is deliberately skewed (90% of events collapse onto
    key 1), broadcast is disabled so the join is sort-merge, and the
    skew thresholds are lowered so the hot partition qualifies at toy
    scale (at 100 TB the DEFAULT thresholds catch the same shape —
    the lowering is scale simulation, not semantics). AQE then splits
    the hot partition across multiple reducers at runtime
    (`skew=true` in the final adaptive plan, pinned by
    tests/test_plans.py). Session-default confs are restored by the
    next registered query via RUNTIME_CONFS."""
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB"
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # keep the demo on the sort-merge path the skew-split assertion
    # pins (session default now prefers shuffled-hash, round-12)
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
    # repartition first: AQE splits a skewed reduce partition by MAPPER
    # block ranges, and the toy input is one parquet file = one map
    # task = nothing to split. 16 mappers simulates the thousands a
    # real scan has; at 100 TB this repartition is not needed.
    e = (
        table(spark, sf_dir, "events")
        .repartition(16)
        .withColumn(
            "skew_key",
            F.when(F.col("event_id") % 10 != 0, F.lit(1))
            .otherwise(F.col("user_id"))
            .cast("long"),
        )
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return e.join(c, e.skew_key == c.c_custkey).select(
        "event_id", "skew_key", "c_name", "value"
    )


@register(
    "join_bloom_filtered",
    oracle="""
        SELECT l.l_orderkey, l.l_quantity, o.o_totalprice
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_totalprice > 400000
    """,
)
def join_bloom_filtered(spark, sf_dir):
    """Runtime bloom-filter join pruning (InjectRuntimeFilter): the
    selective dimension side builds a bloom_filter_agg over its join
    keys and the FACT SCAN applies bloom_filter_might_contain BEFORE
    the shuffle — at 100 TB this is the difference between shuffling
    the whole fact table and shuffling only rows that can possibly
    match. Broadcast is disabled so the join stays shuffle-shaped
    (bloom filters target exactly the joins too big to broadcast);
    thresholds are lowered so injection happens at toy scale — the
    DEFAULT thresholds (10 MB build side, 10 GB probe scan) fire on
    the same shape in production. Plan-asserted in tests/test_plans.py;
    session defaults restored per-query via RUNTIME_CONFS."""
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB"
    )
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold",
        "1KB",
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    l = table(spark, sf_dir, "lineitem")
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select("o_orderkey", "o_totalprice")
    )
    return l.join(o, l.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_quantity", "o_totalprice"
    )


@register(
    "join_interval_point",
    oracle="""
        SELECT p.event_id AS purchase_id, c.event_id AS click_id,
               p.user_id, p.ts AS purchase_ts, c.ts AS click_ts
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON c.user_id = p.user_id
         AND c.ts >= p.ts
         AND c.ts < p.ts + INTERVAL 2 HOUR
    """,
)
def join_interval_point(spark, sf_dir):
    """Point-in-interval join: clicks landing inside each same-user
    purchase's 2-hour follow-up window. The equi-key (user_id) makes
    this a hash-partitioned join with the interval as residual
    condition — at 100 TB add coarse time-bucket keys to both sides so
    the residual never sees a whole user's history.

    (Round-4 review class — structurally-empty differential: the
    original spelling joined events (2024) into orders' 30-day
    windows, whose o_orderdate range is 1995-2001 in this fixture, so
    the interval predicate could never be true; both interval
    endpoints now come from the same time domain.)"""
    e = table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    return p.join(
        c,
        (c.c_user == p.user_id)
        & (F.col("click_ts") >= F.col("purchase_ts"))
        & (F.col("click_ts") < F.col("purchase_ts") + F.expr("INTERVAL 2 HOUR")),
    ).select("purchase_id", "click_id", "user_id", "purchase_ts", "click_ts")


@register(
    "join_asof_forward",
    oracle="""
        WITH p AS (
          SELECT user_id, ts, max(event_id) AS next_purchase_id
          FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
        )
        SELECT e.event_id, e.user_id, e.ts,
               p.next_purchase_id, p.ts AS next_purchase_ts
        FROM events e
        ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts < p.ts
    """,
)
def join_asof_forward(spark, sf_dir):
    """Forward as-of join: each event attributed to the user's NEXT
    strictly-later purchase (time-to-conversion analysis) — the
    mirror of join_asof, kept as a left join so non-converting events
    survive with NULLs.

    Emulation: equi-join on user + strict time inequality, then keep
    the earliest candidate per event via row_number. Purchases are
    collapsed to one row per (user, ts) first so tie-breaking matches
    DuckDB's ASOF. One shuffle on the equi key."""
    e = table(spark, sf_dir, "events")
    p = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy(
            F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
        )
        .agg(F.max("event_id").alias("next_purchase_id"))
    )
    j = e.join(
        p, (e.user_id == p.p_user) & (e.ts < p.p_ts), "left"
    )
    w = Window.partitionBy("event_id").orderBy(F.asc_nulls_last("p_ts"))
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            "ts",
            "next_purchase_id",
            F.col("p_ts").alias("next_purchase_ts"),
        )
    )


@register(
    "join_asof_tolerance",
    oracle="""
        WITH pv AS (
          SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
                 v.event_id AS view_id, v.ts AS view_ts,
                 row_number() OVER (
                   PARTITION BY p.event_id
                   ORDER BY v.ts DESC, v.event_id DESC) AS rn
          FROM (SELECT * FROM events WHERE event_type = 'purchase') p
          LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
            ON v.user_id = p.user_id
           AND v.ts <= p.ts
           AND v.ts >= p.ts - INTERVAL 1 HOUR
        )
        SELECT purchase_id, user_id, purchase_ts, view_id, view_ts,
               CASE WHEN view_ts IS NULL THEN NULL
                    ELSE epoch_us(purchase_ts) - epoch_us(view_ts)
               END AS lead_time_us
        FROM pv
        WHERE rn = 1
        ORDER BY purchase_id
    """,
)
def join_asof_tolerance(spark, sf_dir):
    """As-of join WITH a tolerance bound (last 'view' at-or-before
    each 'purchase' by the same user, but only within 1 hour) — the
    attribution-window shape ad pipelines run. Unlike the plain
    as-of (join_asof), the tolerance makes the band join finite:
    state per key is bounded by the window, which is exactly what
    lets the streaming twin (stream_stream_join) bound its state
    store. Implemented as a banded LEFT join + per-purchase top-1
    (row_number with a unique (ts, event_id) desc order); purchases
    with no in-window view survive with NULLs. Catalyst turns the
    rn=1 filter into WindowGroupLimit, so only one candidate row
    per purchase crosses the final shuffle."""
    e = table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    v = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user_id"),
        F.col("ts").alias("view_ts"),
    )
    joined = p.join(
        v,
        (F.col("v_user_id") == F.col("user_id"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (
            F.col("view_ts")
            >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR")
        ),
        "left",
    )
    w = Window.partitionBy("purchase_id").orderBy(
        F.desc("view_ts"), F.desc("view_id")
    )
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "purchase_id",
            "user_id",
            "purchase_ts",
            "view_id",
            "view_ts",
            F.when(
                F.col("view_ts").isNotNull(),
                us("purchase_ts") - us("view_ts"),
            ).alias("lead_time_us"),
        )
        .orderBy("purchase_id")
    )


@register(
    "join_hint_strategies",
    oracle=f"""
        SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_acctbal > 5000.0
        ORDER BY o.o_orderkey
        LIMIT 5000
    """,
)
def join_hint_strategies(spark, sf_dir):
    """Explicit physical join-strategy control: SHUFFLE_MERGE hint
    pins a sort-merge join where size estimates would otherwise pick
    broadcast. Semantically a plain inner join (the oracle states
    that); the value is operational — at 100 TB the optimizer's
    size estimates can be wrong mid-pipeline (post-filter fact
    joined to fact), and hints are the per-query override that
    avoids an OOM'ing broadcast without flipping global thresholds.
    The SMJ shape is plan-asserted in tests/test_plans.py."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000.0)
    return (
        o.join(c.hint("SHUFFLE_MERGE"), o.o_custkey == c.c_custkey)
        .select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")
        .orderBy("o_orderkey")
        .limit(5000)
    )


@register(
    "join_range_bucketed",
    oracle="""
        SELECT l.l_orderkey, l.l_linenumber, l.l_extendedprice,
               p.p_partkey, p.p_retailprice
        FROM (SELECT * FROM lineitem WHERE l_quantity = 1.0) l
        JOIN (SELECT * FROM part WHERE p_size > 45) p
          ON l.l_extendedprice >= p.p_retailprice * 10.0
         AND l.l_extendedprice <  p.p_retailprice * 11.0
        ORDER BY l_orderkey, l_linenumber, p_partkey
    """,
)
def join_range_bucketed(spark, sf_dir):
    """The SCALE path for join_theta_range — identical band-join
    semantics (and oracle), different physical shape: the non-equi
    condition is converted to an equi-join by bucketing the price
    axis ($2000 buckets). Each lineitem row carries ONE bucket key;
    each part explodes to the few buckets its [10p, 11p) band can
    touch (±1 bucket of margin so the integer bucketing is a strict
    superset of the double-precision band; the original double
    residual then decides exactly). Because the probe side has a
    single key, no post-join dedup is needed.

    Result: a hash-partitionable join (plan-asserted: no
    BroadcastNestedLoopJoin/CartesianProduct) whose per-key fan-in
    is bounded by the bucket width — at 100 TB this shuffles both
    sides by bucket instead of nested-looping the full cross
    product, the standard range-join trick Spark lacks natively."""
    W = 200000  # bucket width in cents ($2000)
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") == 1.0)
    p = table(spark, sf_dir, "part").filter(F.col("p_size") > 45)

    li_k = li.withColumn(
        "bucket",
        F.floor(F.round(F.col("l_extendedprice") * 100.0).cast("long") / W),
    )
    p_cents = F.round(F.col("p_retailprice") * 100.0).cast("long")
    p_k = p.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.floor(p_cents * 10 / W) - 1, F.floor(p_cents * 11 / W) + 1
            )
        ),
    )
    residual = (
        F.col("l_extendedprice") >= F.col("p_retailprice") * 10.0
    ) & (F.col("l_extendedprice") < F.col("p_retailprice") * 11.0)
    return (
        li_k.join(p_k, ["bucket"])
        .filter(residual)
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            "p_partkey",
            "p_retailprice",
        )
        .orderBy("l_orderkey", "l_linenumber", "p_partkey")
    )


@register(
    "orders_market_basket",
    oracle="""
        WITH b AS (
          SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        )
        SELECT a.l_partkey AS part_a, c.l_partkey AS part_b,
               count(*) AS support
        FROM b a JOIN b c
          ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
        GROUP BY a.l_partkey, c.l_partkey
        HAVING count(*) >= 3
        ORDER BY support DESC, part_a, part_b
        LIMIT 100
    """,
)
def orders_market_basket(spark, sf_dir):
    """Market-basket co-occurrence: part pairs ordered together in
    ≥3 baskets (the support count behind association rules). The
    self-join is keyed on l_orderkey — an equi-join whose fan-out is
    quadratic only in per-basket item count (bounded, ~7 here), never
    in table size; the a<b inequality is a residual that halves the
    pairs and canonicalizes orientation. Per-pair support then
    aggregates with map-side combine. At 100 TB the same plan holds:
    shuffle by orderkey, quadratic-in-basket expansion locally,
    shuffle by pair — both keys well-distributed."""
    b = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = b.alias("a")
    c = b.alias("c")
    return (
        a.join(
            c,
            (F.col("a.l_orderkey") == F.col("c.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("c.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("c.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 3)
        .orderBy(F.desc("support"), "part_a", "part_b")
        .limit(100)
    )


@register(
    "join_asof_nearest",
    oracle="""
        WITH err AS (
          SELECT event_id, user_id, epoch_us(ts) AS e_us
          FROM events WHERE event_type = 'error'
        ),
        pur AS (
          SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS p_us
          FROM events WHERE event_type = 'purchase'
        ),
        ranked AS (
          SELECT err.event_id, err.user_id, purchase_id,
                 p_us - e_us AS delta_us,
                 row_number() OVER (
                   PARTITION BY err.event_id
                   ORDER BY abs(p_us - e_us), p_us, purchase_id) AS rn
          FROM err JOIN pur ON err.user_id = pur.user_id
        )
        SELECT event_id, user_id, purchase_id, delta_us
        FROM ranked WHERE rn = 1
        ORDER BY event_id
    """,
)
def join_asof_nearest(spark, sf_dir):
    """Nearest-in-time join: each error event paired with the SAME
    user's temporally closest purchase, either direction — the
    incident-attribution variant neither a backward nor a forward
    as-of can express (both are one-sided). Emulated identically in
    both engines: equi-join on user, rank candidates by |Δt| with a
    (time, id) tiebreak, keep rank 1 — Catalyst's WindowGroupLimit
    prunes each event's candidate list to the single survivor before
    the final shuffle. Δt is exact integer microseconds; the
    candidate space is bounded by per-user purchase counts (dim-like),
    not the event stream."""
    e = table(spark, sf_dir, "events")
    err = e.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("e_us")
    )
    pur = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("p_us"),
    )
    j = err.join(pur, err.user_id == pur.p_user)
    delta = F.col("p_us") - F.col("e_us")
    w = Window.partitionBy("event_id").orderBy(
        F.abs(delta), F.col("p_us"), F.col("purchase_id")
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "purchase_id", delta.alias("delta_us"))
        .orderBy("event_id")
    )


@register(
    "orders_basket_lift",
    oracle="""
        WITH b AS (
          SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        item AS (
          SELECT l_partkey, count(*) AS supp FROM b GROUP BY l_partkey
        ),
        tot AS (SELECT count(DISTINCT l_orderkey) AS nb FROM b),
        pair AS (
          SELECT a.l_partkey AS part_a, c.l_partkey AS part_b,
                 count(*) AS support
          FROM b a JOIN b c
            ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
          GROUP BY 1, 2
          HAVING count(*) >= 3
        )
        SELECT part_a, part_b, support,
               round(CAST(support AS DOUBLE) * nb
                     / (ia.supp * ib.supp), 6) AS lift
        FROM pair
        JOIN item ia ON ia.l_partkey = part_a
        JOIN item ib ON ib.l_partkey = part_b
        CROSS JOIN tot
        ORDER BY lift DESC, part_a, part_b
        LIMIT 50
    """,
)
def orders_basket_lift(spark, sf_dir):
    """Association-rule lift on co-purchased part pairs:
    lift = P(a,b) / (P(a)·P(b)) = support·N / (suppₐ·supp_b) — >1
    means the pair co-occurs more than independence predicts. Pair
    supports reuse the market-basket plan (equi-join on orderkey,
    quadratic only in basket size); per-item supports are a part-
    sized relation BROADCAST to the pairs twice, and the basket
    count N rides along as a literal-sized cross join. Every factor
    is an exact integer; lift is one double expression at the end."""
    b = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    item = b.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("supp"))
    tot = b.agg(F.countDistinct("l_orderkey").alias("nb"))
    a, c = b.alias("a"), b.alias("c")
    pair = (
        a.join(
            c,
            (F.col("a.l_orderkey") == F.col("c.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("c.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("c.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 3)
    )
    ia = item.select(
        F.col("l_partkey").alias("part_a"), F.col("supp").alias("supp_a")
    )
    ib = item.select(
        F.col("l_partkey").alias("part_b"), F.col("supp").alias("supp_b")
    )
    lift = (
        F.col("support").cast("double")
        * F.col("nb")
        / (F.col("supp_a") * F.col("supp_b"))
    )
    return (
        pair.join(F.broadcast(ia), "part_a")
        .join(F.broadcast(ib), "part_b")
        .crossJoin(F.broadcast(tot))
        .select("part_a", "part_b", "support", F.round(lift, 6).alias("lift"))
        .orderBy(F.desc("lift"), "part_a", "part_b")
        .limit(50)
    )


@register(
    "join_null_safe_eq",
    oracle="""
        WITH o AS (
          SELECT o_orderkey, nullif(o_custkey % 25, 7) AS k FROM orders
        ),
        n AS (
          SELECT nullif(n_nationkey, 7) AS k, n_name FROM nation
        )
        SELECT n_name, count(*) AS n_rows
        FROM o JOIN n ON o.k IS NOT DISTINCT FROM n.k
        GROUP BY n_name ORDER BY n_name
    """,
)
def join_null_safe_eq(spark, sf_dir):
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL
    keys MATCH each other instead of dropping — the semantics dirty
    dimension keys need. The fixtures have no NULLs (FIXTURES.md), so
    both sides synthesize them with nullif. Spark still plans this as
    a broadcast HASH join (eqNullSafe keys hash as coalesce+null
    flag), not a nested loop — which is the whole point at scale;
    the null⋈null match cardinality is bounded by the dim side's
    single null row."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", F.nullif(F.col("o_custkey") % 25, F.lit(7)).alias("k")
    )
    n = table(spark, sf_dir, "nation").select(
        F.nullif(F.col("n_nationkey").cast("long"), F.lit(7)).alias("k"),
        "n_name",
    )
    return (
        o.join(F.broadcast(n), o["k"].eqNullSafe(n["k"]))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("n_name")
    )


SCD2_LOW, SCD2_MID = 15_000_000, 40_000_000  # yearly-spend cents bands


@register(
    "join_scd2_point_in_time",
    oracle=f"""
        WITH yr AS (
          SELECT o_custkey AS cust, year(o_orderdate) AS y,
                 CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                   AS BIGINT) AS cents
          FROM orders GROUP BY 1, 2
        ),
        banded AS (
          SELECT cust, y,
                 CASE WHEN cents < {SCD2_LOW} THEN 'low'
                      WHEN cents < {SCD2_MID} THEN 'mid'
                      ELSE 'high' END AS band
          FROM yr
        ),
        flagged AS (
          SELECT *, CASE WHEN band = lag(band) OVER w THEN 0 ELSE 1 END
                      AS chg
          FROM banded WINDOW w AS (PARTITION BY cust ORDER BY y)
        ),
        isl AS (
          SELECT *, sum(chg) OVER (PARTITION BY cust ORDER BY y
                                   ROWS UNBOUNDED PRECEDING) AS island
          FROM flagged
        ),
        ver AS (
          SELECT cust, band, make_date(min(y), 1, 1) AS valid_from
          FROM isl GROUP BY cust, band, island
        ),
        scd2 AS (
          SELECT cust, band, valid_from,
                 COALESCE(lead(valid_from) OVER (PARTITION BY cust
                   ORDER BY valid_from), DATE '9999-01-01') AS valid_to
          FROM ver
        )
        SELECT s.band AS segment, count(*) AS n_orders,
               CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                 AS BIGINT) AS revenue_cents
        FROM orders o JOIN scd2 s
          ON o.o_custkey = s.cust
         AND CAST(o.o_orderdate AS DATE) >= s.valid_from
         AND CAST(o.o_orderdate AS DATE) < s.valid_to
        GROUP BY s.band
    """,
)
def join_scd2_point_in_time(spark, sf_dir):
    """SCD2 build + point-in-time join — the warehouse pattern asked
    for by name: yearly spend bands become TYPE-2 dimension versions
    (consecutive same-band years merged by gaps-and-islands,
    valid_from/valid_to chained with lead(), open version capped at
    9999-01-01), then every fact row joins THE version valid at its
    order date (custkey equality + half-open date-range predicate).
    Every order matches exactly one version by construction — a dup
    or gap in the validity chain breaks the value hash.

    Scale: the dim build is windows over per-customer years (tiny
    groups); the PIT join is an equi-join on custkey with the range
    predicate evaluated post-match — Spark executes it as a hash join
    with a residual filter, NOT a theta join, because the equality
    carries the matching. The classic alternative (as-of join on
    version start) is join_asof; this op pins the half-open-interval
    contract SCD2 consumers rely on."""
    o = table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    yr = (
        o.groupBy(
            F.col("o_custkey").alias("cust"),
            F.year("o_orderdate").alias("y"),
        )
        .agg(F.sum(cents).alias("cents"))
    )
    band = (
        F.when(F.col("cents") < SCD2_LOW, "low")
        .when(F.col("cents") < SCD2_MID, "mid")
        .otherwise("high")
    )
    wy = Window.partitionBy("cust").orderBy("y")
    flagged = yr.select("cust", "y", band.alias("band")).withColumn(
        "chg",
        F.when(F.col("band") == F.lag("band").over(wy), 0).otherwise(1),
    )
    isl = flagged.withColumn(
        "island",
        F.sum("chg").over(
            wy.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    ver = isl.groupBy("cust", "band", "island").agg(
        F.make_date(F.min("y"), F.lit(1), F.lit(1)).alias("valid_from")
    )
    wv = Window.partitionBy("cust").orderBy("valid_from")
    scd2 = ver.select(
        "cust",
        "band",
        "valid_from",
        F.coalesce(
            F.lead("valid_from").over(wv), F.lit("9999-01-01").cast("date")
        ).alias("valid_to"),
    )
    od = F.col("o_orderdate").cast("date")
    return (
        o.join(
            scd2,
            (F.col("o_custkey") == F.col("cust"))
            & (od >= F.col("valid_from"))
            & (od < F.col("valid_to")),
        )
        .groupBy(F.col("band").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents).alias("revenue_cents"),
        )
    )


DUP_PAY_WINDOW_DAYS = 7


@register(
    "join_duplicate_payment_detect",
    oracle=f"""
        WITH base AS (
          SELECT o_orderkey, o_custkey,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                 CAST(o_orderdate AS DATE) AS d
          FROM orders
        ),
        o AS (  -- every 100th order re-submitted 2 days later (new key)
          SELECT * FROM base
          UNION ALL
          SELECT o_orderkey + 1000000000, o_custkey, cents, d + 2
          FROM base WHERE o_orderkey % 100 = 0
        )
        SELECT a.o_custkey AS custkey,
               a.o_orderkey AS order_a, b.o_orderkey AS order_b,
               a.cents AS cents,
               CAST(date_diff('day', a.d, b.d) AS BIGINT) AS days_apart
        FROM o a JOIN o b
          ON a.o_custkey = b.o_custkey
         AND a.cents = b.cents
         AND a.o_orderkey < b.o_orderkey
         AND b.d >= a.d
         AND date_diff('day', a.d, b.d) <= {DUP_PAY_WINDOW_DAYS}
    """,
)
def join_duplicate_payment_detect(spark, sf_dir):
    """Duplicate-payment screen — the accounts-payable control: pairs
    of orders by the SAME customer for the EXACT same amount within 7
    days. The join is equi on (custkey, cents) — the selective keys
    carry the matching so Spark plans a hash join, with the date
    window as a residual predicate — never a theta join over the fact
    table. Orderkey ordering emits each pair once.

    Scale: the (custkey, amount) equi-key makes bucket occupancy tiny
    (duplicate amounts per customer are rare by construction), so the
    candidate space is the collision set, not N² — the same inverted-
    index principle as the dedup tier, in pure relational form. The
    fixture's continuous amounts produce no organic duplicates, so the
    feed is augmented with a deterministic resubmission slice (every
    100th order re-keyed +1e9, two days later) — the oracle states the
    same augmentation, and the detector must find exactly those
    pairs."""
    base = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.col("o_orderdate").cast("date").alias("d"),
    )
    resub = base.filter(F.col("o_orderkey") % 100 == 0).select(
        (F.col("o_orderkey") + 1000000000).alias("o_orderkey"),
        "o_custkey",
        "cents",
        F.date_add("d", 2).alias("d"),
    )
    o = base.unionByName(resub)
    a = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("order_a"),
        "cents",
        F.col("d").alias("da"),
    )
    b = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("order_b"),
        F.col("cents").alias("cents_b"),
        F.col("d").alias("db"),
    )
    return (
        a.join(b, ["custkey"])
        .filter(
            (F.col("cents") == F.col("cents_b"))
            & (F.col("order_a") < F.col("order_b"))
            & (F.col("db") >= F.col("da"))
            & (F.datediff("db", "da") <= DUP_PAY_WINDOW_DAYS)
        )
        .select(
            "custkey",
            "order_a",
            "order_b",
            "cents",
            F.datediff("db", "da").cast("long").alias("days_apart"),
        )
    )


BASKET_MIN_PAIR = 2


@register(
    "orders_market_basket_lift",
    oracle=f"""
        WITH d AS (
          SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        tot AS (
          SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
          FROM d
        ),
        s AS (
          SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_p
          FROM d GROUP BY 1
        ),
        pr AS (
          SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                 CAST(count(*) AS BIGINT) AS n_pair
          FROM d a JOIN d b
            ON a.l_orderkey = b.l_orderkey
           AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2
          HAVING count(*) >= {BASKET_MIN_PAIR}
        )
        SELECT part_a, part_b, n_pair,
               sa.n_p AS n_a, sb.n_p AS n_b,
               round(CAST(n_pair AS DOUBLE) * tot.n_orders
                     / (sa.n_p * sb.n_p), 6) AS lift,
               round(CAST(n_pair AS DOUBLE) / tot.n_orders, 6)
                 AS support
        FROM pr
        JOIN s sa ON sa.l_partkey = part_a
        JOIN s sb ON sb.l_partkey = part_b
        CROSS JOIN tot
    """,
)
def orders_market_basket_lift(spark, sf_dir):
    """Market-basket association mining: for every part pair
    co-ordered at least BASKET_MIN_PAIR (=2) times, support
    (pair orders / all orders) and lift
    (P(a,b) / P(a)P(b) = n_pair·N / (n_a·n_b)) — the recommender /
    cross-sell primitive. Baskets dedup to distinct (order, part)
    first so a part ordered twice in one order can't inflate a pair;
    all counts are exact int64 and lift/support are identical double
    expressions.

    Scale: ONE groupBy collapses lineitem to per-order sorted basket
    arrays (persisted — supports, order count, and pairs all read it);
    the pair fan-out is then a map-side double-explode bounded by the
    per-order line count (≤17 in this fixture, so ≤136 pairs/order
    regardless of table size) — no self-join, no second shuffle of the
    fact table; the count>=2 filter prunes the long unit-count tail
    before the two broadcast-sized support joins (part spine)."""
    li = table(spark, sf_dir, "lineitem")
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("parts")
    )
    baskets = baskets.persist()
    tot = baskets.agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    s = baskets.select(F.explode("parts").alias("l_partkey")).groupBy(
        "l_partkey"
    ).agg(F.count(F.lit(1)).alias("n_p"))
    pr = (
        baskets.select(F.explode("parts").alias("part_a"), "parts")
        .select(
            "part_a",
            F.explode(
                F.filter("parts", lambda x: x > F.col("part_a"))
            ).alias("part_b"),
        )
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= BASKET_MIN_PAIR)
    )
    sa = s.select(
        F.col("l_partkey").alias("part_a"), F.col("n_p").alias("n_a")
    )
    sb = s.select(
        F.col("l_partkey").alias("part_b"), F.col("n_p").alias("n_b")
    )
    return (
        pr.join(F.broadcast(sa), "part_a")
        .join(F.broadcast(sb), "part_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "part_a",
            "part_b",
            "n_pair",
            "n_a",
            "n_b",
            F.round(
                F.col("n_pair").cast("double") * F.col("n_orders")
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
            F.round(
                F.col("n_pair").cast("double") / F.col("n_orders"), 6
            ).alias("support"),
        )
    )


@register(
    "orders_part_reorder_rate",
    oracle="""
        WITH cp AS (
          SELECT l.l_partkey AS pk, o.o_custkey AS ck,
                 CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_ord
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          GROUP BY 1, 2
        ),
        p AS (
          SELECT pk, CAST(count(*) AS BIGINT) AS n_custs,
                 CAST(sum(CAST(n_ord >= 2 AS BIGINT)) AS BIGINT)
                   AS n_repeat
          FROM cp GROUP BY 1
        )
        SELECT pk AS partkey, n_custs, n_repeat,
               round(CAST(n_repeat AS DOUBLE) / n_custs, 6)
                 AS reorder_rate
        FROM p WHERE n_custs >= 5
    """,
)
def orders_part_reorder_rate(spark, sf_dir):
    """Part-level reorder rate — of the customers who ever bought a
    part, the share who bought it in 2+ DISTINCT orders: the retail
    repeat-purchase signal that separates staples from one-off buys
    (and the feature a replenishment recommender trains on). Counting
    distinct orders (not lines) means a multi-line order can't fake a
    reorder. The n_custs >= 5 support floor keeps the long tail of
    single-buyer parts out of the report.

    Scale: the fact join is key-partitioned on orderkey; the
    (part, customer) rollup is map-side-combinable with a distinct
    inside (Spark plans it as a two-level aggregate, partial distinct
    first); the part rollup runs on the part spine."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    cp = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("l_partkey").alias("pk"), F.col("o_custkey").alias("ck")
        )
        .agg(F.countDistinct("o_orderkey").alias("n_ord"))
    )
    p = cp.groupBy("pk").agg(
        F.count(F.lit(1)).alias("n_custs"),
        F.sum((F.col("n_ord") >= 2).cast("long")).alias("n_repeat"),
    )
    return p.filter(F.col("n_custs") >= 5).select(
        F.col("pk").alias("partkey"),
        "n_custs",
        "n_repeat",
        F.round(
            F.col("n_repeat").cast("double") / F.col("n_custs"), 6
        ).alias("reorder_rate"),
    )


@register(
    "join_ledger_recon_tolerance",
    oracle="""
        WITH o AS (
          SELECT o_orderkey AS ok, o_custkey AS ck,
                 CAST(o_orderdate AS DATE) AS d,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS cents
          FROM orders
        ),
        led AS (
          SELECT ok AS lk, ck,
                 d + CAST(CAST(('0x' || substr(md5('d:' || ok), 1, 4))
                     AS BIGINT) % 3 AS INT) AS ld,
                 cents + CAST(('0x' || substr(md5('c:' || ok), 1, 4))
                     AS BIGINT) % 5 - 2 AS lcents
          FROM o
          WHERE CAST(('0x' || substr(md5('m:' || ok), 1, 4)) AS BIGINT)
                % 10 <> 0
        ),
        matched AS (
          SELECT o.ok,
                 max(CASE WHEN led.lk IS NOT NULL THEN 1 ELSE 0 END)
                   AS hit
          FROM o LEFT JOIN led
            ON led.ck = o.ck
           AND abs(led.lcents - o.cents) <= 2
           AND led.ld BETWEEN o.d AND o.d + 2
          GROUP BY o.ok
        )
        SELECT CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(hit) AS BIGINT) AS n_matched,
               round(CAST(sum(hit) AS DOUBLE) / count(*), 6)
                 AS match_rate,
               (SELECT CAST(count(*) AS BIGINT) FROM led) AS n_ledger
        FROM matched
    """,
)
def join_ledger_recon_tolerance(spark, sf_dir):
    """Payment reconciliation with tolerance — match the order book
    against an external settlement ledger whose rows arrive a few
    cents off (fees/rounding) and 0–2 days late, with ~10% missing:
    the month-end finance-ops job that no exact equi-join can do. The
    ledger is synthesized DETERMINISTICALLY from orders (md5-derived
    jitter and drop mask — the registry's reproducible-randomness
    discipline), the match is an equi-join on customer plus
    cents-within-±2 and date-within-2-days band predicates, and a
    conditional max collapses multi-candidates into a matched flag.

    Scale: the band join stays co-partitioned on the customer equi-
    key (the bands are post-join filters on that key's candidates,
    each customer's orders × their ledger rows — bounded fan-out);
    both rollups combine map-side."""
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"),
        F.col("o_custkey").alias("ck"),
        F.col("o_orderdate").cast("date").alias("d"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )

    def h(prefix):
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(prefix), F.col("ok").cast("string"))),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")

    led = (
        o.filter(h("m:") % 10 != 0)
        .select(
            F.col("ok").alias("lk"),
            F.col("ck").alias("lck"),
            F.date_add("d", (h("d:") % 3).cast("int")).alias("ld"),
            (F.col("cents") + h("c:") % 5 - 2).alias("lcents"),
        )
    )
    j = o.join(
        led,
        (F.col("lck") == F.col("ck"))
        & (F.abs(F.col("lcents") - F.col("cents")) <= 2)
        & (F.col("ld") >= F.col("d"))
        & (F.col("ld") <= F.date_add("d", 2)),
        "left",
    )
    matched = j.groupBy("ok").agg(
        F.max(
            F.when(F.col("lk").isNotNull(), 1).otherwise(0)
        ).alias("hit")
    )
    nled = led.agg(F.count(F.lit(1)).alias("n_ledger"))
    return matched.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("hit").alias("n_matched"),
        F.round(
            F.sum("hit").cast("double") / F.count(F.lit(1)), 6
        ).alias("match_rate"),
    ).crossJoin(F.broadcast(nled))


@register(
    "join_drill_across_facts",
    oracle="""
        WITH rev AS (
          SELECT c.c_nationkey AS nk,
                 strftime(o.o_orderdate, '%Y') AS yr,
                 CAST(count(*) AS BIGINT) AS n_orders,
                 CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                      AS BIGINT) AS rev_cents
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          GROUP BY 1, 2
        ),
        units AS (
          SELECT c.c_nationkey AS nk,
                 strftime(l.l_shipdate, '%Y') AS yr,
                 CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT)
                   AS units_shipped
          FROM lineitem l
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          GROUP BY 1, 2
        )
        SELECT coalesce(rev.nk, units.nk) AS nationkey,
               coalesce(rev.yr, units.yr) AS yr,
               CAST(coalesce(rev.n_orders, 0) AS BIGINT) AS n_orders,
               CAST(coalesce(rev.rev_cents, 0) AS BIGINT) AS rev_cents,
               CAST(coalesce(units.units_shipped, 0) AS BIGINT)
                 AS units_shipped
        FROM rev FULL JOIN units
          ON rev.nk = units.nk AND rev.yr = units.yr
    """,
)
def join_drill_across_facts(spark, sf_dir):
    """Drill-across over two fact tables — the dimensional-modeling
    pattern Kimball insists on: aggregate EACH fact (order revenue;
    shipped units) to the conformed (nation, year) grain SEPARATELY,
    then FULL-join the two summaries — never join raw fact tables to
    each other (that fans out line×order rows and silently double-
    counts revenue). The FULL join keeps grain cells that exist in
    only one fact (ship years lag order years), zero-filled
    explicitly.

    Scale: each fact takes exactly one combinable rollup (dims
    broadcast); the drill-across join runs on two conformed-grain
    summaries (≤ nations × years rows), not on facts — the whole
    point of the pattern at 100 TB."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    c = F.broadcast(
        table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    )
    rev = (
        o.join(c, o.o_custkey == F.col("c_custkey"))
        .groupBy(
            F.col("c_nationkey").alias("nk"),
            F.date_format("o_orderdate", "yyyy").alias("yr"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            ).alias("rev_cents"),
        )
    )
    units = (
        li.join(
            o.select("o_orderkey", "o_custkey"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.col("c_nationkey").alias("nk"),
            F.date_format("l_shipdate", "yyyy").alias("yr"),
        )
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("units_shipped"))
    )
    r = rev.select(
        F.col("nk").alias("r_nk"), F.col("yr").alias("r_yr"),
        "n_orders", "rev_cents",
    )
    u = units.select(
        F.col("nk").alias("u_nk"), F.col("yr").alias("u_yr"),
        "units_shipped",
    )
    return r.join(
        u,
        (F.col("r_nk") == F.col("u_nk")) & (F.col("r_yr") == F.col("u_yr")),
        "full",
    ).select(
        F.coalesce(F.col("r_nk"), F.col("u_nk")).alias("nationkey"),
        F.coalesce(F.col("r_yr"), F.col("u_yr")).alias("yr"),
        F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
        F.coalesce(F.col("rev_cents"), F.lit(0)).alias("rev_cents"),
        F.coalesce(F.col("units_shipped"), F.lit(0)).alias("units_shipped"),
    )


APRIORI_SUPPORT = 2  # 3 yields zero triples even at sf0.1's basket sizes


@register(
    "orders_itemset_apriori3",
    oracle=f"""
        WITH b AS MATERIALIZED (
          SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        fp AS MATERIALIZED (
          SELECT a.l_partkey AS pa, c.l_partkey AS pb
          FROM b a JOIN b c
            ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
          GROUP BY 1, 2
          HAVING count(*) >= {APRIORI_SUPPORT}
        ),
        cand AS MATERIALIZED (
          SELECT x.pa AS a, x.pb AS bb, y.pb AS c
          FROM fp x JOIN fp y ON y.pa = x.pa AND y.pb > x.pb
          WHERE EXISTS (SELECT 1 FROM fp z
                        WHERE z.pa = x.pb AND z.pb = y.pb)
        )
        SELECT cd.a AS part_a, cd.bb AS part_b, cd.c AS part_c,
               CAST(count(*) AS BIGINT) AS support
        FROM cand cd
        JOIN b b1 ON b1.l_partkey = cd.a
        JOIN b b2 ON b2.l_orderkey = b1.l_orderkey
                 AND b2.l_partkey = cd.bb
        JOIN b b3 ON b3.l_orderkey = b1.l_orderkey
                 AND b3.l_partkey = cd.c
        GROUP BY 1, 2, 3
        HAVING count(*) >= {APRIORI_SUPPORT}
        ORDER BY support DESC, part_a, part_b, part_c
        LIMIT 100
    """,
)
def orders_itemset_apriori3(spark, sf_dir):
    """Frequent 3-itemsets with APRIORI candidate pruning — the
    anti-monotonicity step that makes itemset mining feasible at
    scale: a triple can only be frequent if ALL THREE of its pairs
    are, so candidates are generated by self-joining the frequent-pair
    table on a shared first item and pruned by a semi-join on the
    third pair BEFORE any basket data is touched. Only the surviving
    candidates are counted, via three equi-joins back to the distinct
    basket items (each keyed on orderkey+part — well-distributed
    hash joins, never a per-basket cubic expansion).

    At 100 TB this is the difference between counting |candidates|
    triples and counting sum-over-baskets C(k,3): the candidate table
    is bounded by the frequent-pair graph, which support thresholds
    keep small — the classic two-pass Apriori economics, expressed as
    three Catalyst joins. Top-100 by (support desc, parts) is fully
    tie-broken, so the LIMIT is deterministic. The pruning ratio is
    measured on the fixture: 3,445 frequent pairs → 61 candidates →
    12 frequent triples at sf0.01; the sparser sf0.1 baskets prune to
    1 candidate / 0 triples — an honest empty answer (support is a
    floor, not a quota)."""
    b = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .persist()
    )
    a, c = b.alias("a"), b.alias("c")
    fp = (
        a.join(
            c,
            (F.col("a.l_orderkey") == F.col("c.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("c.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"),
            F.col("c.l_partkey").alias("pb"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= APRIORI_SUPPORT)
        .select("pa", "pb")
        .persist()
    )
    x, y = fp.alias("x"), fp.alias("y")
    cand = (
        x.join(
            y,
            (F.col("y.pa") == F.col("x.pa"))
            & (F.col("y.pb") > F.col("x.pb")),
        )
        .select(
            F.col("x.pa").alias("a"),
            F.col("x.pb").alias("bb"),
            F.col("y.pb").alias("c"),
        )
        .join(
            fp.select(
                F.col("pa").alias("bb"), F.col("pb").alias("c")
            ),
            ["bb", "c"],
            "left_semi",
        )
    )
    b1 = b.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("a"))
    b2 = b.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("bb"))
    b3 = b.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("c"))
    out = (
        cand.join(b1, "a")
        .join(b2, ["ok", "bb"])
        .join(b3, ["ok", "c"])
        .groupBy(
            F.col("a").alias("part_a"),
            F.col("bb").alias("part_b"),
            F.col("c").alias("part_c"),
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= APRIORI_SUPPORT)
        .orderBy(F.desc("support"), "part_a", "part_b", "part_c")
        .limit(100)
    ).localCheckpoint(eager=True)
    fp.unpersist()
    b.unpersist()
    return out
