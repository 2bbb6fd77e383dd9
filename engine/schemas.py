"""Central declared schemas (SURVEY §1.2: fixed StructType per table,
never inference on production paths; streaming sources require them).

The envelope/flow-log shapes follow the public AWS formats (SURVEY
§1.1): CloudWatch Logs subscription envelope (gzip JSON) and the VPC
Flow Logs v2 space-delimited record.
"""

from __future__ import annotations

from pyspark.sql import types as T

# CloudWatch Logs subscription envelope (SURVEY §1.1a).
ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("messageType", T.StringType()),
        T.StructField("owner", T.StringType()),
        T.StructField("logGroup", T.StringType()),
        T.StructField("logStream", T.StringType()),
        T.StructField("subscriptionFilters", T.ArrayType(T.StringType())),
        T.StructField(
            "logEvents",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.StringType()),
                        T.StructField("timestamp", T.LongType()),
                        T.StructField("message", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)

# VPC Flow Logs v2 record: 14 space-delimited fields (SURVEY §1.1b).
FLOWLOG_DDL = (
    "version INT, account_id STRING, interface_id STRING, "
    "srcaddr STRING, dstaddr STRING, srcport INT, dstport INT, "
    "protocol INT, packets BIGINT, bytes BIGINT, "
    "start BIGINT, `end` BIGINT, action STRING, log_status STRING"
)

# events table at microsecond precision (post ns→µs conversion),
# used by the file-stream source which must declare its schema.
EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)
