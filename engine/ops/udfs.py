"""2.K — UDF / pandas-UDF / applyInPandas / mapInPandas surface.

These exist to prove the Python boundary works (Arrow batches on; see
session.RUNTIME_CONFS), not because the computations need Python —
each has a pure-SQL oracle. Cost ordering is documented in SURVEY §3:
builtin expr < pandas UDF < row-at-a-time UDF; the row-at-a-time UDF
here is deliberately the only one in the whole engine.

Determinism: the grouped ops compute means via the scaled-integer
trick inside pandas (engine.dsl rationale) so group means are
bit-identical with the DuckDB window-average oracle.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf

from ..registry import register, table


@register(
    "udf_python_scalar",
    oracle="""
        SELECT doc_id, n_chars,
               CAST(length(text) AS BIGINT) AS udf_chars
        FROM documents
    """,
)
def udf_python_scalar(spark, sf_dir):
    """Row-at-a-time Python UDF (the slow path, kept off hot paths)."""

    @udf("long")
    def char_count(s: str) -> int:
        return len(s) if s is not None else None

    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", "n_chars", char_count("text").alias("udf_chars"))


@register(
    "udf_pandas_scalar",
    oracle="""
        SELECT event_id, value, value * 2 + 1 AS value_scaled
        FROM events
    """,
)
def udf_pandas_scalar(spark, sf_dir):
    """Vectorized Series→Series pandas UDF over Arrow batches."""

    @pandas_udf("double")
    def scale(v: pd.Series) -> pd.Series:
        return v * 2 + 1

    e = table(spark, sf_dir, "events")
    return e.select("event_id", "value", scale("value").alias("value_scaled"))


@register(
    "udf_pandas_grouped_agg",
    oracle="""
        SELECT l_returnflag, avg(l_quantity) AS mean_qty
        FROM lineitem GROUP BY l_returnflag
    """,
)
def udf_pandas_grouped_agg(spark, sf_dir):
    """GROUPED_AGG pandas UDF. l_quantity is integer-valued so the
    pandas mean (pairwise sum) equals DuckDB's avg bit-for-bit."""

    @pandas_udf("double")
    def mean_qty(v: pd.Series) -> float:
        return float(v.sum()) / len(v)

    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(mean_qty("l_quantity").alias("mean_qty"))


@register(
    "udf_grouped_map",
    oracle="""
        SELECT event_id, user_id, value,
               value - (sum(CAST(round(value*10000) AS BIGINT)) OVER w)
                       / (count(*) OVER w) / 10000.0 AS value_demeaned
        FROM events
        WINDOW w AS (PARTITION BY user_id)
    """,
)
def udf_grouped_map(spark, sf_dir):
    """applyInPandas group→DataFrame transform: de-mean value per user.

    Grouping key is a hash BUCKET of user_id, not user_id itself
    (round-5 profiling): per-user groups are tiny (~67 rows at sf0.1),
    and applyInPandas pays ~2 ms of slice/construct/assemble machinery
    PER GROUP — 1500 user-groups cost 3.1 s where the same rows as 16
    groups cost 0.43 s and the raw Arrow transfer is 0.21 s. Bucketing
    bounds the group count (256) while every user still lands wholly
    in one group, so the per-user means are recovered INSIDE the
    bucket with a vectorized pandas groupby-transform — identical
    float op order (s/n)/1e4, bit-identical output, ~6× faster. This
    is the general high-cardinality-small-groups pattern for
    applyInPandas at 100 TB: group by a bounded bucket of the key,
    vectorize the per-key logic within the bucket."""

    def demean_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        cents = (pdf["value"] * 10000).round().astype("int64")
        g = cents.groupby(pdf["user_id"])
        mean = (g.transform("sum") / g.transform("count")) / 10000.0
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "user_id": pdf["user_id"],
                "value": pdf["value"],
                "value_demeaned": pdf["value"] - mean,
            }
        )

    e = table(spark, sf_dir, "events")
    return (
        e.select("event_id", "user_id", "value")
        .groupBy(F.pmod(F.xxhash64("user_id"), F.lit(256)).alias("bucket"))
        .applyInPandas(
            demean_bucket,
            "event_id long, user_id long, value double, value_demeaned double",
        )
    )


@register(
    "udf_map_in_pandas",
    oracle="""
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    """,
)
def udf_map_in_pandas(spark, sf_dir):
    """mapInPandas partition-wise iterator transform (the envelope
    gzip-decode in engine.ingest uses the same shape)."""

    def count_tokens(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens": pdf["text"].str.split(" ").str.len().astype("int64"),
                }
            )

    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", "text").mapInPandas(
        count_tokens, "doc_id long, n_tokens long"
    )


@register(
    "udtf_python",
    oracle="""
        SELECT event_id, unnest(range(event_id % 3 + 1)) AS i
        FROM events WHERE event_id < 1000
    """,
)
def udtf_python(spark, sf_dir):
    """Python UDTF (table function): one input row → event_id%3+1
    output rows, consumed through the SQL LATERAL surface. Completes
    the UDF family (scalar / pandas / grouped / map / stateful /
    table). Arrow-less row interface — fine off the hot path; bulk
    fan-outs belong in explode()/mapInPandas."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="i: bigint")
    class RepeatRows:
        def eval(self, event_id: int):
            for i in range(event_id % 3 + 1):
                yield (i,)

    spark.udtf.register("repeat_rows", RepeatRows)
    e = table(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    e.createOrReplaceTempView("v_events_udtf")
    return spark.sql(
        """
        SELECT e.event_id, t.i
        FROM v_events_udtf e, LATERAL repeat_rows(e.event_id) AS t
        """
    )


@register(
    "udf_arrow_scalar",
    oracle="""
        SELECT event_id,
               length(CAST(event_id AS VARCHAR)) + (event_id % 7) AS feat
        FROM events WHERE event_id < 2000
    """,
)
def udf_arrow_scalar(spark, sf_dir):
    """Arrow-optimized scalar Python UDF (useArrow=True): same
    row-at-a-time authoring surface as a classic UDF but transported
    in Arrow batches instead of pickled rows — the Spark-4 default
    answer when scalar Python is unavoidable. Integer-only logic, so
    the DuckDB twin is exact."""

    @udf("long", useArrow=True)
    def feat(event_id: int) -> int:
        return len(str(event_id)) + event_id % 7

    e = table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return e.select("event_id", feat("event_id").alias("feat"))


@register(
    "udf_map_in_arrow",
    oracle="""
        SELECT event_id, CAST(round(value*100) AS BIGINT) AS cents
        FROM events WHERE event_id < 2000
    """,
)
def udf_map_in_arrow(spark, sf_dir):
    """mapInArrow: partition-iterator transform over raw
    pyarrow.RecordBatch — the zero-copy sibling of mapInPandas for
    code that wants Arrow compute kernels instead of pandas. Used
    here for an exact cents conversion so the oracle value-hashes."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def to_cents(batches):
        for b in batches:
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(b.schema.get_field_index("event_id")),
                    pc.cast(
                        # half_towards_infinity: pyarrow's default is
                        # banker's rounding (half_to_even) while the
                        # DuckDB oracle and Spark F.round are
                        # ties-away-from-zero (round-4 review finding)
                        pc.round(
                            pc.multiply(
                                b.column(b.schema.get_field_index("value")),
                                pa.scalar(100.0),
                            ),
                            round_mode="half_towards_infinity",
                        ),
                        pa.int64(),
                    ),
                ],
                names=["event_id", "cents"],
            )

    e = table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return e.select("event_id", "value").mapInArrow(
        to_cents, "event_id long, cents long"
    )


@register(
    "udf_grouped_map_arrow",
    oracle="""
        SELECT event_type,
               count(*) AS n,
               CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT)
                 AS sum_value_e4
        FROM events GROUP BY event_type
    """,
)
def udf_grouped_map_arrow(spark, sf_dir):
    """groupBy().applyInArrow — the Arrow-native sibling of
    applyInPandas (§2.K): each group arrives as ONE pyarrow.Table and
    the function computes with pyarrow.compute kernels, skipping the
    pandas conversion entirely (no index materialization, no dtype
    coercion, zero-copy from the Arrow stream). The per-group sums
    are computed on scaled int64s executor-side, so the result is
    exact and the plain GROUP BY oracle value-checks the whole
    Arrow round trip."""
    import pyarrow as pa
    import pyarrow.compute as pc

    # NOTE: deliberately un-annotated — pyspark infers the eval type
    # from type hints, and string annotations ("pa.Table") send it
    # down a broken path (UnboundLocalError in group_ops.applyInArrow
    # on pyspark 4.1.2); hint-less functions take the correct
    # signature-arity path.
    def per_group(key, tbl):
        # half_towards_infinity matches DuckDB/Spark round() ties —
        # pyarrow defaults to banker's rounding (round-4 review finding)
        cents = pc.cast(
            pc.round(
                pc.multiply(tbl["value"], 10000.0),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "event_type": pa.array([key[0]], pa.string()),
                "n": pa.array([tbl.num_rows], pa.int64()),
                "sum_value_e4": pa.array([pc.sum(cents).as_py()], pa.int64()),
            }
        )

    e = table(spark, sf_dir, "events").select("event_type", "value")
    return e.groupBy("event_type").applyInArrow(
        per_group, "event_type string, n long, sum_value_e4 long"
    )


@register(
    "udf_pandas_window_agg",
    oracle="""
        SELECT event_id, user_id,
               CAST(sum(CAST(round(value*100) AS BIGINT)) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS roll_cents
        FROM events
        WHERE user_id < 150
        ORDER BY user_id, event_id
    """,
)
def udf_pandas_window_agg(spark, sf_dir):
    """Pandas UDF as a WINDOW aggregate — the §2.K surface member the
    scalar/grouped-agg/grouped-map demos don't cover: a
    PandasUDFType-agg applied .over(a bounded rolling frame). Spark
    evaluates it per-frame with Arrow transfer (WindowInPandas), so
    the frame must be BOUNDED (rows between) — an unbounded frame
    over a large partition would ship the whole partition per row.

    The UDF sums exact integer cents (int64 — numpy integer summation
    is exact, no fp-order hazard), so the result value-hashes against
    the built-in SQL window sum; a production use replaces the sum
    with what built-ins can't express (e.g. a per-frame model score).

    Bounded to a 10% user slice: the evaluator invokes Python once per
    ROW (its frame), so frame-UDF cost is O(rows) Python round-trips —
    the surface demo doesn't need the full fan-out, and the full-table
    form is the same plan with the filter dropped."""
    from pyspark.sql import Window

    @pandas_udf("long")
    def roll_sum(v: pd.Series) -> int:
        return int(v.sum())

    e = table(spark, sf_dir, "events").filter(F.col("user_id") < 150)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    return (
        e.select(
            "event_id",
            "user_id",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            "ts",
        )
        .select(
            "event_id",
            "user_id",
            roll_sum("cents").over(w).alias("roll_cents"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "udf_pandas_scalar_iter",
    oracle="""
        SELECT doc_id,
               CAST(n_chars * 3 + 7 AS BIGINT) AS scored
        FROM documents
    """,
)
def udf_pandas_scalar_iter(spark, sf_dir):
    """Iterator[pd.Series] → Iterator[pd.Series] pandas UDF — the §2.K
    surface member built for expensive per-worker initialization: the
    "model" (here a trivial (scale, bias) pair) is constructed ONCE per
    Python worker, then streamed over every Arrow batch of the
    partition, instead of per batch like the plain Series→Series form.
    That amortization is the production pattern for tokenizers /
    ONNX sessions at 100 TB; the arithmetic stays exact-integer so the
    oracle is a one-line restatement."""

    @pandas_udf("long")
    def score(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        scale, bias = 3, 7  # stands in for a once-per-worker model load
        for v in batches:
            yield v * scale + bias

    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", score("n_chars").alias("scored"))


@register(
    "udf_cogrouped_map",
    oracle="""
        WITH p AS (
          SELECT user_id, count(*) AS n_purchases, min(ts) AS first_p
          FROM events WHERE event_type = 'purchase' GROUP BY 1
        ),
        v AS (
          SELECT user_id, count(*) AS n_views, min(ts) AS first_v
          FROM events WHERE event_type = 'view' GROUP BY 1
        )
        SELECT coalesce(p.user_id, v.user_id) AS user_id,
               CAST(coalesce(p.n_purchases, 0) AS BIGINT) AS n_purchases,
               CAST(coalesce(v.n_views, 0) AS BIGINT) AS n_views,
               CASE WHEN p.user_id IS NULL OR v.user_id IS NULL THEN NULL
                    ELSE p.first_p <= v.first_v END AS purchased_first
        FROM p FULL JOIN v ON p.user_id = v.user_id
    """,
)
def udf_cogrouped_map(spark, sf_dir):
    """Cogrouped-map pandas UDF — the LAST applyInPandas family member
    (groupBy().cogroup().applyInPandas): two DataFrames grouped on the
    same key arrive as a PAIR of pandas frames per key, the shape for
    per-key custom merges (as-of alignment, feature joins with
    imperative logic) that a SQL join cannot express row-wise. Here
    each user's purchase and view frames are merged into counts plus
    a which-came-first flag, with one side legitimately EMPTY for
    users missing from it — the cogroup contract the oracle's FULL
    JOIN restates closed-form.

    Scale: one co-shuffle on the key, then Arrow-batched per-key
    Python; cost is the same keyed exchange a join would pay plus the
    Python boundary — the mandated-surface demonstration, with the
    all-JVM spelling in the oracle."""
    e = table(spark, sf_dir, "events")
    bucket = F.pmod(F.xxhash64("user_id"), F.lit(64)).alias("bucket")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        bucket, "user_id", "ts"
    )
    views = e.filter(F.col("event_type") == "view").select(
        bucket, "user_id", "ts"
    )

    def merge(pk, pdf_a, pdf_b):
        import pandas as _pd

        # cogroup arrives per BUCKET (64 of them), not per user — the
        # ~2 ms/group Python machinery cost is amortized across every
        # user in the bucket, and the per-user merge runs as two
        # vectorized pandas groupbys (same trick as udf_grouped_map /
        # ts_downsample_lttb).
        ga = pdf_a.groupby("user_id")["ts"].agg(["size", "min"])
        gb = pdf_b.groupby("user_id")["ts"].agg(["size", "min"])
        m = ga.join(gb, how="outer", lsuffix="_a", rsuffix="_b")
        out = _pd.DataFrame(
            {
                "user_id": m.index.astype("int64"),
                "n_purchases": m["size_a"].fillna(0).astype("int64"),
                "n_views": m["size_b"].fillna(0).astype("int64"),
                "purchased_first": [
                    bool(x <= y)
                    if _pd.notna(x) and _pd.notna(y)
                    else None
                    for x, y in zip(m["min_a"], m["min_b"])
                ],
            }
        )
        return out

    return (
        purchases.groupBy("bucket")
        .cogroup(views.groupBy("bucket"))
        .applyInPandas(
            merge,
            "user_id long, n_purchases long, n_views long, "
            "purchased_first boolean",
        )
    )
