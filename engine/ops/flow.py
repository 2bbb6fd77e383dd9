"""Flow-log analytics — the queries a VPC-flow-log pipeline exists to
answer (top talkers, per-CIDR traffic, reject ratios), computed over
the PARSED flow-log lines so the whole synthesize → parse → analyze
path is value-checked end to end: the oracle states each result
directly from `events` via the deterministic line-synthesis twins
(engine.ingest.SQL_K / SQL_LINE discipline).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..ingest import SQL_K, flowlog_line_col, parse_flowlog_lines
from ..registry import register, table


def _parsed(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    return parse_flowlog_lines(e.select("event_id", flowlog_line_col().alias("line")))


@register(
    "flow_top_talkers",
    oracle=f"""
        WITH f AS (
          SELECT '10.0.' || CAST({SQL_K} % 256 AS VARCHAR) || '.'
                 || CAST(({SQL_K}*7) % 256 AS VARCHAR) AS srcaddr,
                 CAST(round(value*100) AS BIGINT) AS bytes,
                 CAST(round(value) AS BIGINT) AS packets
          FROM events
        )
        SELECT srcaddr, CAST(sum(bytes) AS BIGINT) AS total_bytes,
               CAST(sum(packets) AS BIGINT) AS total_packets,
               count(*) AS n_flows
        FROM f GROUP BY srcaddr
        ORDER BY total_bytes DESC, srcaddr LIMIT 20
    """,
)
def flow_top_talkers(spark, sf_dir):
    """Top-20 source addresses by bytes. Long sums are exact; the
    tiebreak on srcaddr keeps the limit deterministic."""
    return (
        _parsed(spark, sf_dir)
        .groupBy("srcaddr")
        .agg(
            F.sum("bytes").alias("total_bytes"),
            F.sum("packets").alias("total_packets"),
            F.count(F.lit(1)).alias("n_flows"),
        )
        .orderBy(F.desc("total_bytes"), F.asc("srcaddr"))
        .limit(20)
    )


@register(
    "flow_cidr_aggregate",
    oracle=f"""
        SELECT (10*16777216 + ({SQL_K} % 256)*256) AS net24,
               CASE WHEN event_type = 'error' THEN 'REJECT' ELSE 'ACCEPT' END
                 AS action,
               CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT)
                 AS total_bytes,
               count(*) AS n_flows
        FROM events GROUP BY 1, 2
    """,
)
def flow_cidr_aggregate(spark, sf_dir):
    """Traffic per /24 network and action. The dotted-quad is parsed
    back to a 32-bit integer with octet arithmetic (split + shifts,
    all Catalyst expressions) and masked to the /24 prefix — the
    general CIDR-bucketing shape; the oracle derives the same prefix
    from the synthesis parameters."""
    p = _parsed(spark, sf_dir)
    o = F.split("srcaddr", r"\.")
    ipnum = (
        F.element_at(o, 1).cast("long") * 16777216
        + F.element_at(o, 2).cast("long") * 65536
        + F.element_at(o, 3).cast("long") * 256
        + F.element_at(o, 4).cast("long")
    )
    net24 = ipnum.bitwiseAND(F.lit(0xFFFFFF00).cast("long"))
    return (
        p.withColumn("net24", net24)
        .groupBy("net24", "action")
        .agg(
            F.sum("bytes").alias("total_bytes"),
            F.count(F.lit(1)).alias("n_flows"),
        )
    )


@register(
    "flow_reject_ratio",
    oracle=f"""
        WITH f AS (
          SELECT 'eni-' || CAST(user_id AS VARCHAR) AS interface_id,
                 CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS rejected,
                 CAST(round(value*100) AS BIGINT) AS bytes
          FROM events
        )
        SELECT interface_id, count(*) AS n_flows,
               CAST(sum(rejected) AS BIGINT) AS n_reject,
               sum(rejected) / count(*) AS reject_ratio,
               CAST(sum(bytes) AS BIGINT) AS total_bytes
        FROM f GROUP BY interface_id
    """,
)
def flow_reject_ratio(spark, sf_dir):
    """Per-interface REJECT ratio — the security-posture query. The
    ratio is long/long (double in both engines, numerator exact)."""
    p = _parsed(spark, sf_dir)
    rejected = F.when(F.col("action") == "REJECT", 1).otherwise(0)
    return (
        p.withColumn("rejected", rejected)
        .groupBy("interface_id")
        .agg(
            F.count(F.lit(1)).alias("n_flows"),
            F.sum("rejected").alias("n_reject"),
            (F.sum("rejected") / F.count(F.lit(1))).alias("reject_ratio"),
            F.sum("bytes").alias("total_bytes"),
        )
    )


FANOUT_THRESHOLD = 10


@register(
    "flow_fanout_detect",
    oracle=f"""
        WITH f AS (
          SELECT date_trunc('hour', ts) AS hr,
                 '10.0.' || CAST({SQL_K} % 256 AS VARCHAR) || '.'
                 || CAST(({SQL_K}*7) % 256 AS VARCHAR) AS srcaddr,
                 '10.1.' || CAST(({SQL_K}*3) % 256 AS VARCHAR) || '.'
                 || CAST(({SQL_K}*11) % 256 AS VARCHAR) AS dstaddr
          FROM events
        )
        SELECT hr, srcaddr, count(DISTINCT dstaddr) AS n_dst
        FROM f GROUP BY hr, srcaddr
        HAVING count(DISTINCT dstaddr) >= {FANOUT_THRESHOLD}
    """,
)
def flow_fanout_detect(spark, sf_dir):
    """Scan/fan-out detection — the flow-log security query: sources
    touching >= THRESHOLD distinct destinations within an hour. One
    distinct-count aggregation per (hour, src); at 100 TB swap the
    exact distinct for approx_count_distinct and keep the HAVING."""
    p = _parsed(spark, sf_dir).withColumn(
        "hr", F.date_trunc("hour", F.expr("CAST(timestamp_seconds(start) AS TIMESTAMP_NTZ)"))
    )
    return (
        p.groupBy("hr", "srcaddr")
        .agg(F.countDistinct("dstaddr").alias("n_dst"))
        .filter(F.col("n_dst") >= FANOUT_THRESHOLD)
    )


Z_THRESHOLD = 2.0


@register(
    "flow_zscore_anomaly",
    oracle=f"""
        WITH f AS (
          SELECT event_id,
                 'eni-' || CAST(user_id AS VARCHAR) AS interface_id,
                 CAST(round(value*100) AS BIGINT) AS bytes
          FROM events
        ),
        stats AS (
          SELECT interface_id,
                 CAST(sum(bytes) AS BIGINT) AS s,
                 CAST(sum(bytes * bytes) AS BIGINT) AS sq,
                 count(*) AS n
          FROM f GROUP BY interface_id
        )
        SELECT event_id, f.interface_id, bytes,
               round((bytes - CAST(s AS DOUBLE) / n)
                     / sqrt((CAST(sq AS DOUBLE)
                             - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                            / (n - 1)), 6) AS z_score
        FROM f JOIN stats USING (interface_id)
        WHERE n >= 2
          AND (CAST(sq AS DOUBLE)
               - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / (n - 1) > 0
          AND abs((bytes - CAST(s AS DOUBLE) / n)
                  / sqrt((CAST(sq AS DOUBLE)
                          - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                         / (n - 1))) > {Z_THRESHOLD}
    """,
)
def flow_zscore_anomaly(spark, sf_dir):
    """Per-interface byte-volume anomalies: flows whose bytes deviate
    more than 2 sample standard deviations from their interface mean.
    The volumetric-anomaly primitive behind exfiltration/DDoS alerts.

    Not stddev_samp(): both engines accumulate EXACT integer sums
    (sum, sum-of-squares, count), and variance/z are derived through
    an identical scalar double expression — bit-deterministic where a
    shuffled double stddev is not. One map-side-combinable shuffle for
    stats, then a broadcast join back to the flows (per-interface
    stats are dim-sized at any scale)."""
    parsed = _parsed(spark, sf_dir)
    f = parsed.select(
        "event_id", "interface_id", "bytes"
    )
    stats = f.groupBy("interface_id").agg(
        F.sum("bytes").alias("s"),
        F.sum(F.col("bytes") * F.col("bytes")).alias("sq"),
        F.count(F.lit(1)).alias("n"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    var = (
        F.col("sq").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double") / F.col("n")
    ) / (F.col("n") - 1)
    z = (F.col("bytes") - mean) / F.sqrt(var)
    return (
        f.join(F.broadcast(stats), "interface_id")
        .filter((F.col("n") >= 2) & (var > 0) & (F.abs(z) > Z_THRESHOLD))
        .select(
            "event_id",
            "interface_id",
            "bytes",
            F.round(z, 6).alias("z_score"),
        )
    )


@register(
    "flow_bidirectional_pairs",
    oracle=f"""
        WITH f AS (
          SELECT '10.0.' || CAST({SQL_K} % 256 AS VARCHAR) || '.'
                 || CAST(({SQL_K}*7) % 256 AS VARCHAR) AS srcaddr,
                 '10.1.' || CAST(({SQL_K}*3) % 256 AS VARCHAR) || '.'
                 || CAST(({SQL_K}*11) % 256 AS VARCHAR) AS dstaddr,
                 CAST(round(value*100) AS BIGINT) AS bytes
          FROM events
        ),
        agg AS (
          SELECT srcaddr, dstaddr, CAST(sum(bytes) AS BIGINT) AS total_bytes,
                 count(*) AS n_flows
          FROM f GROUP BY srcaddr, dstaddr
        )
        SELECT a.srcaddr, a.dstaddr, a.total_bytes, a.n_flows
        FROM agg a
        WHERE EXISTS (SELECT 1 FROM agg b
                      WHERE b.srcaddr = a.dstaddr AND b.dstaddr = a.srcaddr)
    """,
)
def flow_bidirectional_pairs(spark, sf_dir):
    """Connection pairing: directed (src,dst) aggregates whose reverse
    direction also carried traffic (i.e. real two-way conversations,
    the starting point of NAT/session analysis on flow logs).

    Scale shape: aggregate FIRST (collapses the 100 TB of raw flows to
    one row per directed pair), then self-semi-join the much smaller
    aggregate on the swapped key — never a raw-fact self-join."""
    agg = (
        _parsed(spark, sf_dir)
        .groupBy("srcaddr", "dstaddr")
        .agg(
            F.sum("bytes").alias("total_bytes"),
            F.count(F.lit(1)).alias("n_flows"),
        )
    )
    rev = agg.select(
        F.col("srcaddr").alias("r_dst"), F.col("dstaddr").alias("r_src")
    )
    return agg.join(
        rev,
        (agg.srcaddr == rev.r_src) & (agg.dstaddr == rev.r_dst),
        "left_semi",
    )
