"""Streaming ≡ batch equivalence (SURVEY §5).

Each 2.I operator's streaming form (file stream + availableNow) must
equal its batch form on the same data. Late-data policy is tested with
an out-of-order two-file feed and a real watermark drop.
"""

from __future__ import annotations

import os
import time

import pytest

from tests.conftest import SMOKE_SF_DIR
from tests.harness import canon

from engine.registry import table
from engine.schemas import EVENTS_STREAM_SCHEMA


def _events(spark):
    return table(spark, SMOKE_SF_DIR, "events")


def _write_sorted_chunks(spark, events, src, n_chunks=3):
    """In-order feed: chunk files ascending in event time, mtimes spaced
    so the file source processes them oldest-first."""
    pdf = events.toPandas().sort_values(["ts", "event_id"]).reset_index(drop=True)
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")  # ns parquet is unreadable by Spark
    step = (len(pdf) + n_chunks - 1) // n_chunks
    paths = []
    for i in range(n_chunks):
        part = pdf.iloc[i * step : (i + 1) * step]
        p = os.path.join(src, f"chunk_{i:03d}.parquet")
        part.to_parquet(p, index=False)
        os.utime(p, (time.time() - (n_chunks - i) * 10,) * 2)
        paths.append(p)
    return paths


def _run_stream(spark, stream_df, name, mode):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(f"{name}: availableNow query exceeded 300s")
    return spark.table(name)


def _read_stream(spark, src, max_files=None, ltz=False):
    r = spark.readStream.schema(EVENTS_STREAM_SCHEMA)
    if max_files:
        r = r.option("maxFilesPerTrigger", max_files)
    df = r.parquet(src)
    if ltz:
        # watermarks require TIMESTAMP (LTZ); session tz is UTC so the
        # cast is value-preserving
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def test_tumbling_stream_equals_batch(spark, tmp_path):
    from engine.ops.streaming import tumbling_agg

    e = _events(spark)
    src = str(tmp_path / "src")
    os.makedirs(src)
    e.write.parquet(src, mode="append")
    got = _run_stream(
        spark, tumbling_agg(_read_stream(spark, src)), "t_tumble", "complete"
    )
    assert canon(got.toPandas()) == canon(tumbling_agg(e).toPandas())


def test_stateful_counts_stream_equals_batch(spark, tmp_path):
    from engine.ops.streaming import stateful_counts

    e = _events(spark)
    src = str(tmp_path / "src")
    os.makedirs(src)
    e.write.parquet(src, mode="append")
    got = _run_stream(
        spark, stateful_counts(_read_stream(spark, src)), "t_counts", "complete"
    )
    assert canon(got.toPandas()) == canon(stateful_counts(e).toPandas())


def test_dedup_stream_removes_duplicates(spark, tmp_path):
    e = _events(spark)
    src = str(tmp_path / "src")
    os.makedirs(src)
    e.write.parquet(src, mode="append")
    e.write.parquet(src, mode="append")  # exact duplicate feed

    stream = _read_stream(spark, src, ltz=True).withWatermark(
        "ts", "1 hour"
    ).dropDuplicates(["event_id"])
    got = _run_stream(spark, stream, "t_dedup", "append")
    assert got.count() == e.count()
    assert canon(got.select("event_id").toPandas()) == canon(
        e.select("event_id").toPandas()
    )


def test_session_stream_equals_batch(spark, tmp_path):
    """Append-mode session windows with watermark 0s; a far-future
    sentinel event advances the watermark so every real session
    flushes before the availableNow query stops."""
    import pandas as pd

    from engine.ops.streaming import session_agg

    e = _events(spark)
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_sorted_chunks(spark, e, src)

    sentinel = pd.DataFrame(
        {
            "event_id": [10**12],
            "ts": [e.toPandas()["ts"].max() + pd.Timedelta(days=10)],
            "user_id": [-1],
            "event_type": ["view"],
            "value": [0.0],
            "props": ["{}"],
        }
    )
    sentinel["ts"] = sentinel["ts"].astype("datetime64[us]")
    sp = os.path.join(src, "zz_sentinel.parquet")
    sentinel.to_parquet(sp, index=False)
    os.utime(sp, (time.time() + 5,) * 2)

    stream = _read_stream(spark, src, max_files=1, ltz=True).withWatermark(
        "ts", "0 seconds"
    )
    from pyspark.sql import functions as F
    got = (
        _run_stream(spark, session_agg(stream), "t_session", "append")
        .filter("user_id >= 0")
        .withColumn("session_start", F.col("session_start").cast("timestamp_ntz"))
        .withColumn("session_end", F.col("session_end").cast("timestamp_ntz"))
    )
    assert canon(got.toPandas()) == canon(session_agg(e).toPandas())


def test_late_data_dropped_by_watermark(spark, tmp_path):
    """Out-of-order feed: a file far older than the watermark arrives
    after newer files — its rows must be dropped by the late-event
    filter. NOTE (verified on the physical plan): the late-event filter
    uses the watermark LOGGED for batch N-1, which itself derives from
    batch N-2's data — so the watermark established by file 1 only
    drops late rows from file 3 onward; file 2 is a buffer batch."""
    import pandas as pd

    e = _events(spark).toPandas().sort_values("ts").reset_index(drop=True)
    e["ts"] = e["ts"].astype("datetime64[us]")
    src = str(tmp_path / "src")
    os.makedirs(src)
    newest = e.iloc[len(e) // 2 :]
    oldest = e.iloc[: len(e) // 4]  # > 1h older than newest's max

    p1 = os.path.join(src, "a_new.parquet")
    newest.to_parquet(p1, index=False)
    os.utime(p1, (time.time() - 60,) * 2)
    # buffer batch: one event at max ts (user -1) — its window is in the
    # never-emitted tail, so it cannot pollute the compared output
    buf = pd.DataFrame(
        {
            "event_id": [10**12],
            "ts": [newest["ts"].max()],
            "user_id": [-1],
            "event_type": ["view"],
            "value": [0.0],
            "props": ["{}"],
        }
    )
    buf["ts"] = buf["ts"].astype("datetime64[us]")
    pb = os.path.join(src, "aa_buffer.parquet")
    buf.to_parquet(pb, index=False)
    os.utime(pb, (time.time() - 45,) * 2)
    p2 = os.path.join(src, "b_old.parquet")
    oldest.to_parquet(p2, index=False)
    os.utime(p2, (time.time() - 30,) * 2)

    from pyspark.sql import functions as F

    from engine.ops.streaming import tumbling_agg

    stream = _read_stream(spark, src, max_files=1, ltz=True).withWatermark(
        "ts", "1 hour"
    )
    got = _run_stream(spark, tumbling_agg(stream), "t_late", "append").withColumn(
        "ws", F.col("ws").cast("timestamp_ntz")
    )

    # append mode emits only windows finalized below the watermark
    # (max event time - 1h); the old file's rows arrive after the
    # watermark passed their windows, so they must not be counted.
    wm = newest["ts"].max() - pd.Timedelta(hours=1)
    expected = tumbling_agg(
        spark.createDataFrame(newest, EVENTS_STREAM_SCHEMA)
    ).filter(F.col("ws") + F.expr("INTERVAL 1 HOUR") <= F.lit(wm))
    assert canon(got.toPandas()) == canon(expected.toPandas())


def test_custom_state_stream_equals_batch(spark, tmp_path):
    """applyInPandasWithState fold over a chunked in-order feed must
    reach the same per-user summaries as the batch twin. Update mode
    emits a snapshot per (batch, user); n_events is monotone, so the
    final state is each user's max-n_events row."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from engine.ops.streaming import user_activity_agg, user_activity_stateful

    e = _events(spark)
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_sorted_chunks(spark, e, src)

    stream = _read_stream(spark, src, max_files=1, ltz=True)
    got_all = _run_stream(
        spark, user_activity_stateful(stream), "t_custom_state", "update"
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    got = (
        got_all.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .drop("rn")
        .withColumn("first_ts", F.col("first_ts").cast("timestamp_ntz"))
        .withColumn("last_ts", F.col("last_ts").cast("timestamp_ntz"))
    )
    assert canon(got.toPandas()) == canon(user_activity_agg(e).toPandas())


def test_stream_parquet_sink_partitioned(spark, tmp_path):
    """The reference pipeline's actual output stage: envelope stream →
    writeStream to dt/hr-partitioned parquet with a checkpoint. The
    read-back must equal the batch projection, and the directory layout
    must be hive-partitioned (dt=/hr=)."""
    from pyspark.sql import functions as F

    e = _events(spark)
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    e.write.parquet(src, mode="append")

    def project(df):
        return df.select(
            "event_id",
            "user_id",
            "event_type",
            "value",
            F.date_format("ts", "yyyy-MM-dd").alias("dt"),
            F.date_format("ts", "HH").alias("hr"),
        )

    q = (
        project(_read_stream(spark, src, ltz=True))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .partitionBy("dt", "hr")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("parquet sink stream exceeded 300s")

    # keep partition values as the written strings ("08" not int 8)
    spark.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    try:
        got = spark.read.parquet(out)
        assert canon(got.toPandas()) == canon(project(e).toPandas())
    finally:
        spark.conf.set(
            "spark.sql.sources.partitionColumnTypeInference.enabled", "true"
        )
    parts = os.listdir(out)
    assert any(p.startswith("dt=") for p in parts)
    inner = os.listdir(os.path.join(out, next(p for p in parts if p.startswith("dt="))))
    assert any(p.startswith("hr=") for p in inner)


def test_stream_stream_join_equals_batch(spark, tmp_path):
    """Two watermarked streams (clicks, purchases from the same feed)
    joined with an event-time band must equal the batch join."""
    from pyspark.sql import functions as F

    from engine.ops.streaming import click_purchase_join

    e = _events(spark)
    src = str(tmp_path / "src")
    os.makedirs(src)
    e.write.parquet(src, mode="append")

    def side(kind):
        return (
            _read_stream(spark, src, ltz=True)
            .filter(F.col("event_type") == kind)
            .withWatermark("ts", "2 hours")
        )

    got = _run_stream(
        spark, click_purchase_join(side("click"), side("purchase")),
        "t_ss_join", "append",
    ).select(
        "click_id", "user_id", "purchase_id",
        F.col("click_ts").cast("timestamp_ntz").alias("click_ts"),
        F.col("purchase_ts").cast("timestamp_ntz").alias("purchase_ts"),
        "purchase_value",
    )
    want = click_purchase_join(
        e.filter(F.col("event_type") == "click"),
        e.filter(F.col("event_type") == "purchase"),
    )
    assert canon(got.toPandas()) == canon(want.toPandas())


def test_foreach_batch_idempotent_sink(spark, tmp_path):
    """Exactly-once via idempotent foreachBatch: each micro-batch lands
    at a batchId-keyed path with overwrite, so a replayed batch (the
    at-least-once failure mode) rewrites the same files instead of
    duplicating. Simulated by re-invoking the batch writer with the
    same batchId after the run."""
    import glob

    from pyspark.sql import functions as F

    e = _events(spark)
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    os.makedirs(src)
    _write_sorted_chunks(spark, e, src)

    seen = []

    def write_batch(df, batch_id):
        seen.append(batch_id)
        df.write.mode("overwrite").parquet(f"{out}/batch_id={batch_id}")

    q = (
        _read_stream(spark, src, max_files=1)
        .writeStream.foreachBatch(write_batch)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("foreachBatch stream exceeded 300s")
    assert len(seen) >= 2  # chunked feed → multiple batches

    total_before = spark.read.parquet(out).count()
    assert total_before == e.count()

    # replay the LAST batch (as a post-failure retry would): rows must
    # not duplicate because the write is keyed+overwritten. Materialize
    # the replay rows first — a lazy self-read-overwrite would race.
    last_id = seen[-1]
    replay_rows = (
        spark.read.parquet(f"{out}/batch_id={last_id}").drop("batch_id").collect()
    )
    write_batch(spark.createDataFrame(replay_rows), last_id)
    spark.catalog.refreshByPath(out)
    assert spark.read.parquet(out).count() == total_before


def test_stream_static_join_equals_batch(spark, tmp_path):
    from engine.ops.streaming import static_enrich

    e = _events(spark)
    customers = table(spark, SMOKE_SF_DIR, "customer")
    src = str(tmp_path / "src")
    os.makedirs(src)
    e.write.parquet(src, mode="append")
    got = _run_stream(
        spark,
        static_enrich(_read_stream(spark, src), customers),
        "t_static_join",
        "append",
    )
    assert canon(got.toPandas()) == canon(static_enrich(e, customers).toPandas())


def test_checkpoint_resume_incremental(spark, tmp_path):
    """Exactly-once incremental processing across restarts — the
    property the reference pipeline's checkpointed Kinesis→parquet job
    depends on: run 1 processes batch A; new files land; run 2 with
    the SAME checkpoint processes ONLY batch B (no reprocessing, no
    loss), and the sink ends up equal to A ∪ B exactly once."""
    import pandas as pd

    from pyspark.sql import functions as F

    e = _events(spark)
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    pdf = e.toPandas().sort_values("event_id").reset_index(drop=True)
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    half = len(pdf) // 2
    a, b = pdf.iloc[:half], pdf.iloc[half:]

    def run():
        q = (
            _read_stream(spark, src)
            .select("event_id", "user_id", "event_type", "value")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300), "stream exceeded 300s"
        rows = [r for p in q.recentProgress for r in [p["numInputRows"]]]
        return sum(rows)

    a.to_parquet(os.path.join(src, "batch_a.parquet"), index=False)
    n1 = run()
    assert n1 == len(a)

    b.to_parquet(os.path.join(src, "batch_b.parquet"), index=False)
    n2 = run()
    assert n2 == len(b), f"resume reprocessed data: {n2} rows vs {len(b)} new"

    got = spark.read.parquet(out).select("event_id").toPandas()
    assert sorted(got["event_id"]) == sorted(pdf["event_id"])  # exactly once


def test_kshards_source_checkpoint_resume_exactly_once(spark, tmp_path):
    """Kinesis-shaped custom source (engine/ops/stream_source.py):
    stop the query mid-stream, restart from the SAME checkpoint, and
    the sink must hold each (shard, seq) exactly once — no loss from
    the interrupted run, no duplicates from replay. Also exercises the
    restart clamp: the fresh reader's admission cursor restarts at 0
    and must not re-emit committed ranges."""
    from engine.ops.stream_source import (
        drain_kshards,
        parse_offset,
        read_kshards_stream,
    )

    shards, per_batch, total = 4, 200, 1200
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def start():
        return (
            read_kshards_stream(
                spark,
                shards=shards,
                per_batch=per_batch,
                total=total,
                state_path=str(tmp_path / "lease"),
            )
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )

    # run 1: wait for >= 2 committed microbatches, then kill mid-flight
    q = start()
    deadline = time.time() + 120
    committed = 0
    while time.time() < deadline:
        p = q.lastProgress
        if p and p.get("sources"):
            eo = parse_offset(p["sources"][0].get("endOffset"))
            if eo:
                committed = min(int(v) for v in eo.values())
                if committed >= 2 * per_batch:
                    break
        time.sleep(0.05)
    assert committed >= 2 * per_batch, "run 1 never committed two batches"
    q.stop()
    assert committed < total, "run 1 finished everything; resume not exercised"

    # run 2: same checkpoint — drain to the end
    q = start()
    try:
        drain_kshards(q, total)
    finally:
        q.stop()

    got = spark.read.parquet(sink)
    n = got.count()
    n_distinct = got.select("shard_id", "seq").distinct().count()
    assert n == shards * total, f"lost rows: {n} != {shards * total}"
    assert n_distinct == n, f"duplicates: {n - n_distinct}"


def _protobuf_available() -> bool:
    """transformWithStateInPandas spawns a protobuf-speaking driver
    worker; this container ships a broken google.protobuf (no
    descriptor module), so the streaming form is environment-gated
    exactly as the brief prescribes for missing libraries."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithState needs google.protobuf; broken in this container",
)
def test_transform_with_state_stream_equals_batch(spark, tmp_path):
    """transformWithStateInPandas (Spark 4 arbitrary state) over a
    chunked feed must reach the same per-user summaries as the batch
    twin. Update mode emits a snapshot per (batch, user); n_events is
    monotone, so each user's final state is their max-n_events row."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from engine.ops.spark4_ops import user_count_max_agg, user_count_max_tws

    e = _events(spark)
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_sorted_chunks(spark, e, src)

    stream = _read_stream(spark, src, max_files=1)
    got_all = _run_stream(
        spark, user_count_max_tws(stream), "t_tws_state", "update"
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    got = got_all.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")
    assert canon(got.toPandas()) == canon(user_count_max_agg(e).toPandas())


def test_dedup_within_watermark_evicts_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark's bounded-state contract, both
    halves. Within the delay window a re-keyed arrival is a duplicate
    (dropped); once the watermark passes key+delay the state is
    EVICTED, so a later arrival with the same key is emitted again —
    the behavior that distinguishes it from classic dropDuplicates'
    grow-forever state. Feed (maxFilesPerTrigger=1, mtime-ordered;
    watermark lags one batch, hence the buffer file):
      f1: id=1@T0 and id=1@T0+10m  -> dedup within window, ONE row
      f2: id=2@T0+3h               -> watermark -> T0+2h after batch
      f3: id=3@T0+3h1m             -> buffer batch, eviction applies
      f4: id=1@T0+4h               -> state gone, EMITTED AGAIN
    """
    import pandas as pd

    src = str(tmp_path / "src")
    os.makedirs(src)
    t0 = pd.Timestamp("2024-01-01 00:00:00")

    def feed(i, rows):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
        )
        pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
        p = os.path.join(src, f"f{i}.parquet")
        pdf.to_parquet(p, index=False)
        os.utime(p, (time.time() - (10 - i) * 10,) * 2)

    feed(1, [(1, t0, 7, "view", 1.0, "{}"),
             (1, t0 + pd.Timedelta(minutes=10), 7, "view", 1.0, "{}")])
    feed(2, [(2, t0 + pd.Timedelta(hours=3), 7, "view", 1.0, "{}")])
    feed(3, [(3, t0 + pd.Timedelta(hours=3, minutes=1), 7, "view", 1.0, "{}")])
    feed(4, [(1, t0 + pd.Timedelta(hours=4), 7, "view", 1.0, "{}")])

    stream = (
        _read_stream(spark, src, max_files=1, ltz=True)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    got = _run_stream(spark, stream, "t_dedup_wm", "append").toPandas()
    by_id = got["event_id"].value_counts().to_dict()
    assert by_id[2] == 1 and by_id[3] == 1
    assert by_id[1] == 2, (
        f"expected id=1 twice (in-window dupe dropped, post-eviction "
        f"arrival re-emitted), got {by_id}"
    )
    assert len(got) == 4


def test_rocksdb_state_files_on_disk(spark):
    """stream_rocksdb_state: the checkpoint must actually contain
    RocksDB state artifacts (SST/changelog files under state/), not
    the default HDFS-backed .delta files — proving the provider conf
    took effect and state lived in RocksDB."""
    import glob
    import tempfile

    engine_mod = __import__("engine")
    engine_mod.QUERIES["stream_rocksdb_state"](spark, SMOKE_SF_DIR).count()
    ckpt = os.path.join(
        tempfile.gettempdir(), "engine_scratch_stream_rocksdb_state", "ckpt"
    )
    state_files = glob.glob(os.path.join(ckpt, "state", "**", "*"), recursive=True)
    names = {os.path.basename(p) for p in state_files}
    assert any(n.endswith((".zip", ".sst", ".changelog")) for n in names), names
    assert not any(n.endswith(".delta") for n in names), (
        "HDFS-backed provider artifacts present — RocksDB conf did not take"
    )


def test_stream_stream_left_join_equals_batch(spark, tmp_path):
    """LEFT OUTER stream-stream join: unmatched clicks must be emitted
    null-extended once the watermark proves no purchase can still
    arrive. Feed = time-sorted chunks, then two far-future sentinel
    files (one click u=-1, one purchase u=-2 — distinct users so they
    never join) that advance BOTH sides' watermarks past every real
    click's band; the second sentinel batch lets the lagged watermark
    apply so state flushes before availableNow terminates."""
    import pandas as pd

    from pyspark.sql import functions as F

    from engine.ops.streaming import click_purchase_left_join

    e = _events(spark)
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_sorted_chunks(spark, e, src)

    far = e.toPandas()["ts"].max() + pd.Timedelta(days=10)
    for i, (uid, etype) in enumerate([(-1, "click"), (-2, "purchase")]):
        pdf = pd.DataFrame(
            {
                "event_id": [10**12 + i],
                "ts": [far + pd.Timedelta(hours=i)],
                "user_id": [uid],
                "event_type": [etype],
                "value": [0.0],
                "props": ["{}"],
            }
        )
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        p = os.path.join(src, f"zz_sentinel_{i}.parquet")
        pdf.to_parquet(p, index=False)
        os.utime(p, (time.time() + 5 + i * 5,) * 2)

    def side(kind):
        return (
            _read_stream(spark, src, max_files=1, ltz=True)
            .filter(F.col("event_type") == kind)
            .withWatermark("ts", "2 hours")
        )

    got = (
        _run_stream(
            spark,
            click_purchase_left_join(side("click"), side("purchase")),
            "t_ss_left_join",
            "append",
        )
        .filter(F.col("user_id") >= 0)
        .select(
            "click_id", "user_id", "purchase_id",
            F.col("click_ts").cast("timestamp_ntz").alias("click_ts"),
            F.col("purchase_ts").cast("timestamp_ntz").alias("purchase_ts"),
            "purchase_value",
        )
    )
    want = click_purchase_left_join(
        e.filter(F.col("event_type") == "click"),
        e.filter(F.col("event_type") == "purchase"),
    )
    assert canon(got.toPandas()) == canon(want.toPandas())


def test_dynamic_session_stream_equals_batch(spark, tmp_path):
    """Dynamic-gap session windows over a watermarked stream must equal
    the batch form (same sentinel-flush rig as the fixed-gap test)."""
    import pandas as pd

    from pyspark.sql import functions as F

    e = _events(spark)
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_sorted_chunks(spark, e, src)

    sentinel = pd.DataFrame(
        {
            "event_id": [10**12],
            "ts": [e.toPandas()["ts"].max() + pd.Timedelta(days=10)],
            "user_id": [-1],
            "event_type": ["view"],
            "value": [0.0],
            "props": ["{}"],
        }
    )
    sentinel["ts"] = sentinel["ts"].astype("datetime64[us]")
    sp = os.path.join(src, "zz_sentinel.parquet")
    sentinel.to_parquet(sp, index=False)
    os.utime(sp, (time.time() + 5,) * 2)

    gap = (
        F.when(F.col("event_type") == "click", F.lit("30 minutes"))
        .otherwise(F.lit("1 hour"))
    )

    def sessions(df):
        return (
            df.groupBy("user_id", F.session_window("ts", gap).alias("w"))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                "user_id",
                F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("s"),
                F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("en"),
                "n_events",
            )
        )

    stream = _read_stream(spark, src, max_files=1, ltz=True).withWatermark(
        "ts", "0 seconds"
    )
    got = _run_stream(spark, sessions(stream), "t_dynsession", "append").filter(
        "user_id >= 0"
    )
    want = sessions(
        _events(spark).withColumn("ts", F.col("ts").cast("timestamp"))
    )
    assert canon(got.toPandas()) == canon(want.toPandas())


def test_session_window_boundary_is_inclusive(spark):
    """Two events exactly one gap apart MERGE into one session (Spark
    session_window is boundary-inclusive) — the regression behind the
    round-4 review's off-by-one finding in both session oracles: the
    gaps-and-islands restatement must flag a new session only on a
    STRICTLY greater gap."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:30:00")],
        "user_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    static = (
        df.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .count()
        .collect()
    )
    assert len(static) == 1 and static[0]["count"] == 2
    gap = F.when(F.lit(True), F.lit("30 minutes"))
    dynamic = (
        df.groupBy("user_id", F.session_window("ts", gap)).count().collect()
    )
    assert len(dynamic) == 1 and dynamic[0]["count"] == 2


def test_stream_stream_full_join_equals_batch(spark, tmp_path):
    """FULL OUTER stream-stream join: BOTH unmatched sides must emit
    null-extended once the watermark proves no counterpart can arrive
    — the right-side (spontaneous purchase) path the left variant
    cannot exercise. Same two-sentinel flush rig as the left test."""
    import pandas as pd

    from pyspark.sql import functions as F

    from engine.ops.streaming import click_purchase_full_join

    e = _events(spark)
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_sorted_chunks(spark, e, src)

    far = e.toPandas()["ts"].max() + pd.Timedelta(days=10)
    for i, (uid, etype) in enumerate([(-1, "click"), (-2, "purchase")]):
        pdf = pd.DataFrame(
            {
                "event_id": [10**12 + i],
                "ts": [far + pd.Timedelta(hours=i)],
                "user_id": [uid],
                "event_type": [etype],
                "value": [0.0],
                "props": ["{}"],
            }
        )
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        p = os.path.join(src, f"zz_sentinel_{i}.parquet")
        pdf.to_parquet(p, index=False)
        os.utime(p, (time.time() + 5 + i * 5,) * 2)

    def side(kind):
        return (
            _read_stream(spark, src, max_files=1, ltz=True)
            .filter(F.col("event_type") == kind)
            .withWatermark("ts", "2 hours")
        )

    got = (
        _run_stream(
            spark,
            click_purchase_full_join(side("click"), side("purchase")),
            "t_ss_full_join",
            "append",
        )
        .filter(
            (F.coalesce("click_user", F.lit(0)) >= 0)
            & (F.coalesce("purchase_user", F.lit(0)) >= 0)
        )
        .select(
            "click_id", "click_user", "purchase_id", "purchase_user",
            F.col("click_ts").cast("timestamp_ntz").alias("click_ts"),
            F.col("purchase_ts").cast("timestamp_ntz").alias("purchase_ts"),
            "purchase_value",
        )
    )
    want = click_purchase_full_join(
        e.filter(F.col("event_type") == "click"),
        e.filter(F.col("event_type") == "purchase"),
    )
    got_pdf = got.toPandas()
    # right-side null-extension actually exercised
    assert (got_pdf["click_id"].isna()).any()
    assert (got_pdf["purchase_id"].isna()).any()
    assert canon(got_pdf) == canon(want.toPandas())


def test_stream_stream_right_join_equals_batch(spark, tmp_path):
    """RIGHT OUTER stream-stream join: unmatched purchases must be
    emitted null-extended on the click side once the click watermark
    proves no attributable click can still arrive (same sentinel-flush
    rig as the left/full variants; the click-side null-extension path
    is the half the left test cannot exercise)."""
    import pandas as pd

    from pyspark.sql import functions as F

    from engine.ops.streaming import click_purchase_right_join

    e = _events(spark)
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_sorted_chunks(spark, e, src)

    far = e.toPandas()["ts"].max() + pd.Timedelta(days=10)
    for i, (uid, etype) in enumerate([(-1, "click"), (-2, "purchase")]):
        pdf = pd.DataFrame(
            {
                "event_id": [10**12 + i],
                "ts": [far + pd.Timedelta(hours=i)],
                "user_id": [uid],
                "event_type": [etype],
                "value": [0.0],
                "props": ["{}"],
            }
        )
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        p = os.path.join(src, f"zz_sentinel_{i}.parquet")
        pdf.to_parquet(p, index=False)
        os.utime(p, (time.time() + 5 + i * 5,) * 2)

    def side(kind):
        return (
            _read_stream(spark, src, max_files=1, ltz=True)
            .filter(F.col("event_type") == kind)
            .withWatermark("ts", "2 hours")
        )

    got = (
        _run_stream(
            spark,
            click_purchase_right_join(side("click"), side("purchase")),
            "t_ss_right_join",
            "append",
        )
        .filter(F.col("user_id") >= 0)
        .select(
            "click_id", "user_id", "purchase_id",
            F.col("click_ts").cast("timestamp_ntz").alias("click_ts"),
            F.col("purchase_ts").cast("timestamp_ntz").alias("purchase_ts"),
            "purchase_value",
        )
    )
    want = click_purchase_right_join(
        e.filter(F.col("event_type") == "click"),
        e.filter(F.col("event_type") == "purchase"),
    )
    assert canon(got.toPandas()) == canon(want.toPandas())


def test_chained_stateful_stream_equals_batch(spark, tmp_path):
    """TWO stateful stages composed in ONE streaming query
    (dropDuplicatesWithinWatermark -> broadcast enrich -> tumbling agg)
    must equal the composed batch form over an ADVERSARIAL feed: every
    event duplicated, the union shuffled, split across four
    micro-batches — so duplicates cross batch boundaries in both
    directions and windows fill out of order. Sentinel pair flushes the
    append-mode agg (watermark computed at end of one batch applies in
    the next)."""
    import pandas as pd

    from pyspark.sql import functions as F

    from engine.ops.streaming import enrich_window_agg

    e = _events(spark)
    cust = table(spark, SMOKE_SF_DIR, "customer")
    src = str(tmp_path / "src")
    os.makedirs(src)

    pdf = e.toPandas()
    dup = (
        pd.concat([pdf, pdf])
        .sample(frac=1.0, random_state=7)
        .reset_index(drop=True)
    )
    dup["ts"] = dup["ts"].astype("datetime64[us]")
    n_chunks = 4
    step = (len(dup) + n_chunks - 1) // n_chunks
    for i in range(n_chunks):
        part = dup.iloc[i * step : (i + 1) * step]
        p = os.path.join(src, f"chunk_{i:03d}.parquet")
        part.to_parquet(p, index=False)
        os.utime(p, (time.time() - (n_chunks - i) * 10,) * 2)
    far = pdf["ts"].max() + pd.Timedelta(days=90)
    for i in range(2):
        s = pd.DataFrame(
            {
                "event_id": [10**12 + i],
                "ts": [far + pd.Timedelta(hours=i)],
                "user_id": [-1],
                "event_type": ["view"],
                "value": [0.0],
                "props": ["{}"],
            }
        )
        s["ts"] = s["ts"].astype("datetime64[us]")
        p = os.path.join(src, f"zz_sentinel_{i}.parquet")
        s.to_parquet(p, index=False)
        os.utime(p, (time.time() + 5 + i * 5,) * 2)

    stream = (
        _read_stream(spark, src, max_files=1, ltz=True)
        .withWatermark("ts", "35 days")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    got = _run_stream(
        spark, enrich_window_agg(stream, cust), "t_chained_stateful", "append"
    ).select(
        F.col("ws").cast("timestamp_ntz").alias("ws"),
        "c_mktsegment",
        "n",
        "sum_value",
    )
    # batch twin: the fixture events are dupe-free, so dedup(feed) ≡ events
    want = enrich_window_agg(e, cust)
    assert canon(got.toPandas()) == canon(want.toPandas())


def test_kshards_reshard_restart_exactly_once(spark, tmp_path):
    """Shard split + restart STRADDLING the split: run 1 commits
    pre-split batches from the 4-shard shape and is killed before the
    split point; run 2 resumes from a checkpoint whose offset dict has
    NO child keys, crosses the split (dict gains two keys, parent pins
    at split_at), and drains. The sink must hold each (shard, seq)
    exactly once with post-split sequences owned by the children —
    loss, replay, or parity misassignment across the shape change all
    fail the closed-form content check."""
    from engine.ops.stream_source import (
        drain_kshards,
        parse_offset,
        read_kshards_stream,
        reshard_expected_offsets,
    )

    shards, per_batch, total, split_at = 4, 200, 1200, 700
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def start():
        return (
            read_kshards_stream(
                spark,
                shards=shards,
                per_batch=per_batch,
                total=total,
                state_path=str(tmp_path / "lease"),
                split_at=split_at,
            )
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )

    # run 1: commit at least two batches, kill BEFORE the split point
    q = start()
    deadline = time.time() + 120
    committed = 0
    while time.time() < deadline:
        p = q.lastProgress
        if p and p.get("sources"):
            eo = parse_offset(p["sources"][0].get("endOffset"))
            if eo:
                committed = max(int(v) for v in eo.values())
                if committed >= 2 * per_batch:
                    break
        time.sleep(0.05)
    assert committed >= 2 * per_batch, "run 1 never committed two batches"
    q.stop()
    assert committed < split_at, (
        "run 1 crossed the split; restart-across-split not exercised"
    )

    # run 2: resume from the pre-split checkpoint, cross the split, drain
    q = start()
    try:
        drain_kshards(
            q,
            total,
            expected=reshard_expected_offsets(shards, total, split_at),
        )
    finally:
        q.stop()

    got = spark.read.parquet(sink)
    n = got.count()
    n_distinct = got.select("shard_id", "seq").distinct().count()
    # content: parent's rows stop at split_at; children own the rest
    from pyspark.sql import functions as F

    parent = got.filter(F.col("shard_id") == "shardId-000000000000")
    kids = got.filter(
        F.col("shard_id").isin(
            f"shardId-{shards:012d}", f"shardId-{shards + 1:012d}"
        )
    )
    assert n == shards * total, f"lost rows: {n} != {shards * total}"
    assert n_distinct == n, f"duplicates: {n - n_distinct}"
    assert parent.agg(F.max("seq")).first()[0] == split_at - 1
    assert parent.count() == split_at
    assert kids.count() == total - split_at
    assert kids.filter(F.col("seq") < split_at).count() == 0
    bad_parity = kids.filter(
        (
            (F.col("shard_id") == f"shardId-{shards:012d}")
            & (F.col("seq") % 2 != 0)
        )
        | (
            (F.col("shard_id") == f"shardId-{shards + 1:012d}")
            & (F.col("seq") % 2 != 1)
        )
    ).count()
    assert bad_parity == 0


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithState needs google.protobuf; broken in this container",
)
def test_tws_timers_stream_equals_batch(spark, tmp_path):
    """Event-time-timer session builder (ListState + registerTimer)
    over a chunked watermarked feed must equal the batch gap-islands
    twin. Sentinel pair advances the watermark so every real user's
    gap timer fires before availableNow terminates (sessions are
    emitted from handleExpiredTimer ONLY — an unfired timer means a
    missing session row, so this also proves timers fire off the
    watermark, not processing time)."""
    import pandas as pd

    from pyspark.sql import functions as F

    from engine.ops.spark4_ops import (
        session_gap_stats_batch,
        session_gap_stats_tws,
    )

    e = _events(spark)
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_sorted_chunks(spark, e, src)
    far = e.toPandas()["ts"].max() + pd.Timedelta(days=10)
    for i in range(2):
        s = pd.DataFrame(
            {
                "event_id": [10**12 + i],
                "ts": [far + pd.Timedelta(hours=i)],
                "user_id": [-1],
                "event_type": ["view"],
                "value": [0.0],
                "props": ["{}"],
            }
        )
        s["ts"] = s["ts"].astype("datetime64[us]")
        p = os.path.join(src, f"zz_sentinel_{i}.parquet")
        s.to_parquet(p, index=False)
        os.utime(p, (time.time() + 5 + i * 5,) * 2)

    stream = _read_stream(spark, src, max_files=1, ltz=True).withWatermark(
        "ts", "2 hours"
    )
    got = (
        _run_stream(
            spark, session_gap_stats_tws(stream), "t_tws_timers", "append"
        )
        .filter(F.col("user_id") >= 0)
        .select(
            "user_id",
            F.col("session_start").cast("timestamp_ntz").alias("session_start"),
            F.col("session_end").cast("timestamp_ntz").alias("session_end"),
            "n_events",
            "max_intra_gap_us",
        )
    )
    want = session_gap_stats_batch(e)
    assert canon(got.toPandas()) == canon(want.toPandas())


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithState needs google.protobuf; broken in this container",
)
def test_tws_timer_evicts_state(spark, tmp_path):
    """After a key's gap timer fires, ALL its state must be gone. A
    literal replay of the flushed event cannot probe this — event-time
    mode filters sub-watermark rows before handleInputRows ever sees
    them (confirmed in TransformWithStateExec's late-event predicate)
    — so the probe is a SECOND, non-late event for the same user after
    the first flush: if the ListState buffer survived the timer, the
    second expiry would re-emit the first session alongside the new
    one (three rows, duplicate start); with eviction working, exactly
    one fresh 1-event session joins the first. Feed: user-7 event at
    t0 -> sentinel pair (timer fires, session emitted, state cleared)
    -> user-7 event at t0+12d (above the ~day-10 watermark) ->
    second sentinel pair."""
    import pandas as pd

    from pyspark.sql import functions as F

    from engine.ops.spark4_ops import session_gap_stats_tws

    src = str(tmp_path / "src")
    os.makedirs(src)
    t0 = pd.Timestamp("2024-01-01 00:00:00")

    def write(name, rows, mtime_off):
        pdf = pd.DataFrame(rows)
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        p = os.path.join(src, name)
        pdf.to_parquet(p, index=False)
        os.utime(p, (time.time() + mtime_off,) * 2)

    def ev(eid, ts_off_days):
        return {
            "event_id": [eid],
            "ts": [t0 + pd.Timedelta(days=ts_off_days)],
            "user_id": [7],
            "event_type": ["view"],
            "value": [1.0],
            "props": ["{}"],
        }

    def sentinel(i, days):
        return {
            "event_id": [10**12 + i],
            "ts": [t0 + pd.Timedelta(days=days)],
            "user_id": [-1],
            "event_type": ["view"],
            "value": [0.0],
            "props": ["{}"],
        }

    write("a_event.parquet", ev(1, 0), 0)
    write("b_flush_1.parquet", sentinel(0, 10), 5)
    write("c_flush_2.parquet", sentinel(1, 10.1), 10)  # watermark applies next batch
    write("d_second.parquet", ev(2, 12), 15)  # NOT late vs ~day-10 watermark
    write("e_flush_3.parquet", sentinel(2, 20), 20)
    write("f_flush_4.parquet", sentinel(3, 20.1), 25)

    stream = _read_stream(spark, src, max_files=1, ltz=True).withWatermark(
        "ts", "1 hour"
    )
    got = (
        _run_stream(
            spark, session_gap_stats_tws(stream), "t_tws_evict", "append"
        )
        .filter(F.col("user_id") == 7)
        .toPandas()
        .sort_values("session_start")
        .reset_index(drop=True)
    )
    assert len(got) == 2, f"expected 2 sessions (no re-emission), got\n{got}"
    assert (got["n_events"] == 1).all()
    assert got["session_start"].nunique() == 2  # distinct, no duplicate emit


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithState needs google.protobuf; broken in this container",
)
def test_tws_map_state_stream_equals_batch(spark, tmp_path):
    """MapState per-user type counts over a chunked feed must reach the
    batch GROUP BY. Update mode emits a snapshot per (batch, user); n
    is monotone per (user, type), so the final state is the max."""
    from pyspark.sql import functions as F

    from engine.ops.spark4_ops import (
        user_type_counts_batch,
        user_type_counts_tws,
    )

    e = _events(spark)
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_sorted_chunks(spark, e, src)

    stream = _read_stream(spark, src, max_files=1)
    got_all = _run_stream(
        spark, user_type_counts_tws(stream), "t_tws_map", "update"
    )
    got = got_all.groupBy("user_id", "event_type").agg(F.max("n").alias("n"))
    assert canon(got.toPandas()) == canon(user_type_counts_batch(e).toPandas())


def test_pystream_sink_restart_exactly_once(spark, tmp_path):
    """Python streaming sink (pystreamparts): stop the query mid-stream
    and resume from the SAME checkpoint — the landed files must hold
    every event exactly once. This drives the replay path the sink's
    commit() protects: a re-delivered batch must fully replace its own
    prior output (batchId-keyed names + stale-part sweep), never
    append to it."""
    from pyspark.sql import functions as F

    from engine.ops.scans import make_pystream_sink
    from engine.ops.streaming import _chunked_stream_feed

    spark.dataSource.register(make_pystream_sink())
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    os.makedirs(out)
    _chunked_stream_feed(spark, SMOKE_SF_DIR, src, n_chunks=6)

    def start():
        return (
            spark.readStream.schema(EVENTS_STREAM_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .select(
                "event_id",
                "user_id",
                F.round(F.col("value") * 10000).cast("long").alias("value_e4"),
            )
            .writeStream.format("pystreamparts")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )

    # run 1: let at least 2 of the 6 single-file batches commit, then stop
    q = start()
    deadline = time.time() + 120
    committed = 0
    while time.time() < deadline:
        p = q.lastProgress
        if p is not None and p.get("batchId", -1) >= 1:
            committed = p["batchId"]
            break
        time.sleep(0.05)
    q.stop()
    assert committed >= 1, "run 1 never committed two batches"

    # run 2: same checkpoint, drain the rest
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.read.schema("event_id long, user_id long, value_e4 long").parquet(
        out
    )
    e = _events(spark)
    n_events = e.count()
    assert got.count() == n_events, "lost or duplicated rows"
    assert got.select("event_id").distinct().count() == n_events
    want = e.select(
        "event_id",
        "user_id",
        F.round(F.col("value") * 10000).cast("long").alias("value_e4"),
    )
    assert canon(got.toPandas()) == canon(want.toPandas())


def test_inc_lsh_stream_restart_exactly_once(spark, tmp_path):
    """Mid-stream kill + restart of the checkpointed incremental-LSH
    dedup stream (stream_dedup_incremental_e2e): run 1 commits
    increment 0, then dies inside foreachBatch for increment 1 at the
    TORN point — band-index generation 1 already written, sink write
    not yet done. Run 2 restarts on the same checkpoint, must replay
    exactly increment 1 (offsets-log file set, deterministic
    generation overwrite) and finish increment 2, ending byte-equal to
    the replayed-loop batch op — no lost duplicates, no double-counted
    index rows."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from engine.ops.dedup import N_INC_BATCHES
    from engine.ops.dedup_stream import run_inc_lsh_stream
    from engine.registry import QUERIES

    base = str(tmp_path / "inc_lsh")

    with pytest.raises(StreamingQueryException):
        run_inc_lsh_stream(spark, SMOKE_SF_DIR, base, fail_at_batch=1)

    # torn state: increment 0 fully committed, increment 1's index
    # generation written but its sink partition absent
    assert os.path.exists(f"{base}/sink/batch_id=0")
    assert not os.path.exists(f"{base}/sink/batch_id=1")
    assert os.path.exists(f"{base}/index/bands/gen=1")

    out = run_inc_lsh_stream(spark, SMOKE_SF_DIR, base)
    got = {tuple(r) for r in out.collect()}
    ref = {
        tuple(r)
        for r in QUERIES["dedup_incremental_lsh"](spark, SMOKE_SF_DIR).collect()
    }
    assert got == ref, "restarted stream diverged from batch-loop output"

    # the replayed generation was overwritten, not appended: total band
    # rows across generations = 8 bands per document, exactly once
    n_docs = table(spark, SMOKE_SF_DIR, "documents").count()
    bands = spark.read.option("basePath", f"{base}/index/bands").parquet(
        *[f"{base}/index/bands/gen={g}" for g in range(N_INC_BATCHES)]
    )
    assert bands.count() == 8 * n_docs
    assert bands.distinct().count() == 8 * n_docs


def test_capped_inc_lsh_stream_restart_exactly_once(spark, tmp_path):
    """Same torn-state kill/restart proof for the CAPPED stream
    (stream_dedup_capped_e2e): the persisted counts/gen=N tables are
    part of the replay unit, so a crash-replayed increment rewrites
    its counts deterministically — no double-counted bucket sizes, and
    the restarted stream ends byte-equal to the capped replayed
    loop."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from engine.ops.dedup import LSH_BUCKET_CAP, N_INC_BATCHES
    from engine.ops.dedup_stream import run_inc_lsh_stream
    from engine.registry import QUERIES

    base = str(tmp_path / "inc_lsh_cap")

    with pytest.raises(StreamingQueryException):
        run_inc_lsh_stream(
            spark, SMOKE_SF_DIR, base, fail_at_batch=1,
            bucket_cap=LSH_BUCKET_CAP,
        )
    assert os.path.exists(f"{base}/index/counts/gen=1")
    assert not os.path.exists(f"{base}/sink/batch_id=1")

    out = run_inc_lsh_stream(
        spark, SMOKE_SF_DIR, base, bucket_cap=LSH_BUCKET_CAP
    )
    got = {tuple(r) for r in out.collect()}
    ref = {
        tuple(r)
        for r in QUERIES["dedup_incremental_lsh_capped"](
            spark, SMOKE_SF_DIR
        ).collect()
    }
    assert got == ref, "restarted capped stream diverged from capped loop"

    # replayed counts were overwritten, not appended: summing the
    # per-generation counts re-derives exactly one row per (band,
    # band_key, doc) — 8 band rows per document
    n_docs = table(spark, SMOKE_SF_DIR, "documents").count()
    counts = spark.read.option("basePath", f"{base}/index/counts").parquet(
        *[f"{base}/index/counts/gen={g}" for g in range(N_INC_BATCHES)]
    )
    total = counts.groupBy().sum("n_new").collect()[0][0]
    assert total == 8 * n_docs


def test_stream_compact_boundary_restart(spark, tmp_path):
    """Kill/restart ACROSS the mid-stream compaction boundary
    (stream_dedup_compact_e2e's remaining state-bug habitat): run 1
    processes increment `boundary`, writes its generation + sink,
    runs the compaction AND publishes the compacted_upto marker, then
    dies BEFORE the checkpoint commit. Run 2 replays increment
    `boundary` on the same checkpoint — the marker-gated reader must
    serve it from the PER-GENERATION directories (the compacted
    layout already contains its own generation; reading it back would
    double-count every band row of the replayed batch), the
    compaction redo must be a deterministic overwrite, and the
    post-boundary increment must dedupe against the compacted layout
    and end byte-equal to the plain batch loop."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from engine.ops.dedup import N_INC_BATCHES
    from engine.ops.dedup_stream import (
        _read_compact_marker,
        run_inc_lsh_stream,
    )
    from engine.registry import QUERIES

    base = str(tmp_path / "inc_lsh_compact")
    boundary = N_INC_BATCHES - 2

    with pytest.raises(StreamingQueryException):
        run_inc_lsh_stream(
            spark, SMOKE_SF_DIR, base, compact_after=boundary,
            fail_at_batch=boundary, fail_phase="post_compact",
        )

    # torn state: boundary increment's sink + compaction marker both
    # already published, but the checkpoint never committed the batch
    idx = f"{base}/index"
    assert _read_compact_marker(idx) == boundary
    assert os.path.exists(f"{idx}/bands_c")
    assert os.path.exists(f"{base}/sink/batch_id={boundary}")

    log = []
    out = run_inc_lsh_stream(
        spark, SMOKE_SF_DIR, base, compact_after=boundary,
        read_paths_log=log,
    )

    # the REPLAYED boundary batch read only per-generation paths —
    # never the compacted layout that includes its own generation
    replayed = [paths for (b, paths) in log if b == boundary]
    assert replayed, "boundary batch was not replayed"
    for paths in replayed:
        assert not any(p.endswith("/bands_c") for p in paths)
        assert all("/bands/gen=" in p for p in paths)
    # the post-boundary increment served from the compacted layout
    post = [paths for (b, paths) in log if b > boundary]
    assert post and all(
        any(p.endswith("/bands_c") for p in paths) for paths in post
    )

    got = {tuple(r) for r in out.collect()}
    ref = {
        tuple(r)
        for r in QUERIES["dedup_incremental_lsh"](spark, SMOKE_SF_DIR).collect()
    }
    assert got == ref, "restart across compaction boundary diverged"

    # the compaction redo overwrote, not appended: the compacted
    # layout holds exactly one band row per (doc, band) for the
    # covered generations
    n_docs = table(spark, SMOKE_SF_DIR, "documents").count()
    covered = spark.read.parquet(
        *[f"{idx}/bands/gen={g}" for g in range(boundary + 1)]
    ).count()
    bands_c = spark.read.parquet(f"{idx}/bands_c")
    assert bands_c.count() == covered
    assert bands_c.distinct().count() == covered
    assert covered < 8 * n_docs  # strictly the covered prefix


def test_sim_index_stream_boundary_restart(spark, tmp_path):
    """Kill/restart ACROSS the ANN stream's compaction boundary
    (stream_sim_index_e2e's torn state): run 1 builds the index
    (batch 0 commits), processes the boundary increment — generation
    write, compaction, marker publish — then dies BEFORE the
    checkpoint commit. Run 2 replays the boundary batch on the same
    checkpoint: the generation rewrite and the compaction redo must
    both be deterministic overwrites (no double-counted list rows),
    the final probe must serve from the compacted layout plus only
    post-boundary generations, and the answers must be byte-equal to
    the batch append op."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from engine.ops.dedup_stream import _read_compact_marker
    from engine.ops.similarity import N_SIM_BATCHES, run_sim_index_stream
    from engine.registry import QUERIES

    base = str(tmp_path / "sim_idx")
    boundary = N_SIM_BATCHES - 2

    with pytest.raises(StreamingQueryException):
        run_sim_index_stream(
            spark, SMOKE_SF_DIR, base, compact_after=boundary,
            fail_at_batch=boundary, fail_phase="post_compact",
        )

    # torn state: boundary generation + compaction marker on disk,
    # checkpoint never committed the batch
    idx = f"{base}/index"
    assert _read_compact_marker(idx) == boundary
    assert os.path.exists(f"{idx}/lists_c")
    assert os.path.exists(f"{idx}/lists/gen={boundary}")

    log = []
    out = run_sim_index_stream(
        spark, SMOKE_SF_DIR, base, compact_after=boundary,
        serve_paths_log=log,
    )
    paths = log[-1]
    assert any(p.endswith("/lists_c") for p in paths)
    assert not any(
        "/lists/gen=" in p and int(p.rsplit("=", 1)[1]) <= boundary
        for p in paths
    )

    got = {tuple(r) for r in out.collect()}
    ref = {
        tuple(r)
        for r in QUERIES["sim_index_append"](spark, SMOKE_SF_DIR).collect()
    }
    assert got == ref, "restart across ANN compaction boundary diverged"

    # the compaction redo overwrote, not appended: the compacted
    # layout holds exactly the covered generations' rows, once each
    covered = (
        spark.read.option("basePath", f"{idx}/lists")
        .parquet(*[f"{idx}/lists/gen={g}" for g in range(boundary + 1)])
        .drop("gen")
    )
    lists_c = spark.read.parquet(f"{idx}/lists_c")
    assert lists_c.count() == covered.count()
    assert (
        lists_c.select("c_id").distinct().count()
        == covered.select("c_id").distinct().count()
        == covered.count()
    )


def test_sim_recluster_boundary_restart(spark, tmp_path):
    """Kill/restart ACROSS the mid-stream codebook swap
    (stream_sim_recluster_e2e's torn state): run 1 processes the
    drift batch — assignment + stats vs gen=0, drift fires,
    re-cluster publishes centroids gen=1 and its marker — then dies
    BEFORE the checkpoint commit. Run 2 replays the drift batch on
    the same checkpoint: the marker<b routing rule must keep the
    REPLAYED batch on gen=0 even though gen=1 is already on disk, the
    re-cluster redo must be a deterministic overwrite, batch 3 must
    route to gen=1, and the final report must be byte-equal to the
    uninterrupted stream (which the registered op value-hashes
    against DuckDB)."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from engine.ops.similarity import (
        _read_gen_marker,
        run_sim_recluster_stream,
    )
    from engine.registry import QUERIES

    base = str(tmp_path / "sim_recluster")

    with pytest.raises(StreamingQueryException):
        run_sim_recluster_stream(
            spark, SMOKE_SF_DIR, base,
            fail_at_batch=2, fail_phase="post_recluster",
        )

    # torn state: gen=1 codebook + marker published, batch 2 never
    # committed to the checkpoint
    idx = f"{base}/index"
    assert _read_gen_marker(f"{idx}/reclustered_upto") == 2
    assert os.path.exists(f"{idx}/centroids/gen=1")

    log = []
    out = run_sim_recluster_stream(spark, SMOKE_SF_DIR, base, codebook_log=log)

    # run 2 replays batch 2 with the marker ALREADY on disk: the
    # marker<b rule must route the replay to gen=0, and batch 3 to gen=1
    assert log == [(2, 0), (3, 1)], f"replay routing wrong: {log}"

    got = {tuple(r) for r in out.collect()}
    ref = {
        tuple(r)
        for r in QUERIES["stream_sim_recluster_e2e"](
            spark, SMOKE_SF_DIR
        ).collect()
    }
    assert got == ref, "restart across recluster boundary diverged"
    flags = {t[0]: t[3] for t in got}
    assert flags["0_stale_append"] and not flags["1_fresh_post"]


def test_gc_refuses_inside_replay_horizon(spark, tmp_path):
    """The GC guard's teeth (stream_dedup_gc_e2e): in the
    post-compaction TORN state — compaction marker published, the
    boundary batch's commit log not yet written — generation GC must
    REFUSE (deleting would make the checkpoint replay impossible).
    After the restarted stream completes, the same GC succeeds, the
    replayed-and-GC'd pipeline still matches the batch loop, and a
    second restart on the gutted index is a committed no-op."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from engine.ops.dedup import N_INC_BATCHES
    from engine.ops.dedup_stream import (
        _gc_index_generations,
        run_inc_lsh_stream,
    )
    from engine.registry import QUERIES

    base = str(tmp_path / "gc")
    boundary = N_INC_BATCHES - 2
    idx, ckpt = f"{base}/index", f"{base}/ckpt"

    with pytest.raises(StreamingQueryException):
        run_inc_lsh_stream(
            spark, SMOKE_SF_DIR, base, compact_after=boundary,
            fail_at_batch=boundary, fail_phase="post_compact",
        )

    # torn state: marker on disk, boundary batch uncommitted → refuse,
    # naming the replayable batch
    with pytest.raises(ValueError, match=rf"\[{boundary}\].*replay"):
        _gc_index_generations(ckpt, idx)
    assert os.path.exists(f"{idx}/bands/gen={boundary}")

    out = run_inc_lsh_stream(
        spark, SMOKE_SF_DIR, base, compact_after=boundary
    )
    removed = _gc_index_generations(ckpt, idx)
    assert len(removed) == 2 * (boundary + 1)
    assert not os.path.exists(f"{idx}/bands/gen={boundary}")

    got = {tuple(r) for r in out.collect()}
    ref = {
        tuple(r)
        for r in QUERIES["dedup_incremental_lsh"](spark, SMOKE_SF_DIR).collect()
    }
    assert got == ref

    # restart after GC: recovery finds everything committed, replays
    # nothing, and the sink is untouched
    again = run_inc_lsh_stream(
        spark, SMOKE_SF_DIR, base, compact_after=boundary
    )
    assert {tuple(r) for r in again.collect()} == ref


def test_capped_compact_boundary_restart(spark, tmp_path):
    """Kill/restart across the compaction boundary on the CAPPED rig
    (round-9: compaction now folds the stop-bucket counts into one
    cumulative counts_c behind the same marker): the replayed boundary
    batch must resolve its cumulative bucket sizes from the
    PER-GENERATION counts only (counts_c already includes its own
    generation — reading it would double-count every key of the
    replayed batch), the counts_c redo must be a deterministic
    overwrite, post-boundary increments must read exactly ONE counts
    artifact, and the final sink must equal the capped batch loop."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from engine.ops.dedup import LSH_BUCKET_CAP, N_INC_BATCHES
    from engine.ops.dedup_stream import (
        _read_compact_marker,
        run_inc_lsh_stream,
    )
    from engine.registry import QUERIES

    base = str(tmp_path / "capped_compact")
    boundary = N_INC_BATCHES - 2
    idx = f"{base}/index"

    with pytest.raises(StreamingQueryException):
        run_inc_lsh_stream(
            spark, SMOKE_SF_DIR, base, bucket_cap=LSH_BUCKET_CAP,
            compact_after=boundary, fail_at_batch=boundary,
            fail_phase="post_compact",
        )

    assert _read_compact_marker(idx) == boundary
    assert os.path.exists(f"{idx}/counts_c")

    clog = []
    out = run_inc_lsh_stream(
        spark, SMOKE_SF_DIR, base, bucket_cap=LSH_BUCKET_CAP,
        compact_after=boundary, counts_paths_log=clog,
    )

    replayed = [paths for (b, paths) in clog if b == boundary]
    assert replayed, "boundary batch was not replayed"
    for paths in replayed:
        assert not any(p.endswith("/counts_c") for p in paths)
        assert all("/counts/gen=" in p for p in paths)
    post = [paths for (b, paths) in clog if b > boundary]
    assert post
    for paths in post:
        assert sum(1 for p in paths if p.endswith("/counts_c")) == 1
        assert all(
            int(p.rsplit("=", 1)[1]) > boundary
            for p in paths
            if "/counts/gen=" in p
        )

    got = {tuple(r) for r in out.collect()}
    ref = {
        tuple(r)
        for r in QUERIES["dedup_incremental_lsh_capped"](
            spark, SMOKE_SF_DIR
        ).collect()
    }
    assert got == ref, "capped restart across compaction boundary diverged"

    # counts_c redo overwrote deterministically: it equals the sum of
    # the covered per-generation counts, one row per surviving key
    per_gen = (
        spark.read.parquet(
            *[f"{idx}/counts/gen={g}" for g in range(boundary + 1)]
        )
        .groupBy("band", "band_key")
        .sum("n_new")
    )
    cc = spark.read.parquet(f"{idx}/counts_c")
    assert cc.count() == per_gen.count()


def test_gc_partial_delete_recovery(spark, tmp_path):
    """Mid-GC crash recovery: a GC that dies after deleting SOME of
    the covered generation directories leaves a partially-gutted
    index. Because the GC decision is recomputed from the marker and
    the commit logs (not from what happens to be on disk), a re-run
    removes the survivors, skips the already-gone dirs, and serving
    afterwards still value-hashes — the missing dirs were dead by the
    watermark rule, so nothing ever reads them."""
    import shutil

    from engine.ops.dedup import LSH_BUCKET_CAP, N_INC_BATCHES
    from engine.ops.dedup_stream import (
        _gc_index_generations,
        run_inc_lsh_stream,
    )
    from engine.registry import QUERIES

    base = str(tmp_path / "gc_partial")
    boundary = N_INC_BATCHES - 2
    idx, ckpt = f"{base}/index", f"{base}/ckpt"

    out = run_inc_lsh_stream(
        spark, SMOKE_SF_DIR, base, bucket_cap=LSH_BUCKET_CAP,
        compact_after=boundary,
    )
    ref = {tuple(r) for r in out.collect()}

    # simulate the mid-GC crash: generation 0 of every family is gone,
    # the rest of the covered prefix survives
    for fam in ("bands", "shingles", "counts"):
        shutil.rmtree(f"{idx}/{fam}/gen=0")

    removed = _gc_index_generations(ckpt, idx)
    assert len(removed) == 3 * boundary  # gens 1..boundary, 3 families
    for g in range(boundary + 1):
        assert not os.path.exists(f"{idx}/bands/gen={g}")
        assert not os.path.exists(f"{idx}/counts/gen={g}")

    again = run_inc_lsh_stream(
        spark, SMOKE_SF_DIR, base, bucket_cap=LSH_BUCKET_CAP,
        compact_after=boundary,
    )
    assert {tuple(r) for r in again.collect()} == ref
    cap_ref = {
        tuple(r)
        for r in QUERIES["dedup_incremental_lsh_capped"](
            spark, SMOKE_SF_DIR
        ).collect()
    }
    assert ref == cap_ref


def test_takedown_boundary_restart(spark, tmp_path):
    """Kill/restart ACROSS the document-delete boundary
    (stream_dedup_delete_e2e's torn state): run 1 processes the
    boundary increment, writes its generation + sink, applies the
    takedown (purged twins + tombstones + marker) and purges the
    served sink partitions, then dies BEFORE the checkpoint commit.
    Run 2 replays the boundary increment on the same checkpoint — the
    marker-gated reader must serve it from the PRE-takedown
    per-generation layout (the purged twins only serve batches
    strictly past the boundary; reading them would change the
    replayed batch's own dedup decisions), the takedown redo and the
    sink purge must be deterministic overwrites, and the post-boundary
    increment must dedupe against the PURGED index, ending byte-equal
    to the uninterrupted delete pipeline."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from engine.ops.dedup_stream import (
        TD_AFTER,
        TD_MOD,
        TD_RES,
        _read_marker,
        run_inc_lsh_stream,
    )
    from engine.registry import QUERIES

    base = str(tmp_path / "takedown")
    idx = f"{base}/index"

    with pytest.raises(StreamingQueryException):
        run_inc_lsh_stream(
            spark, SMOKE_SF_DIR, base, delete_after=TD_AFTER,
            fail_at_batch=TD_AFTER, fail_phase="post_takedown",
        )

    # torn state: marker + purged twins + purged sink all published,
    # checkpoint commit missing
    assert _read_marker(f"{idx}/takedown_upto") == TD_AFTER
    assert os.path.exists(f"{idx}/bands_p/gen=0")
    assert os.path.exists(f"{idx}/tombstones")
    assert os.path.exists(f"{idx}/bands/gen={TD_AFTER}")  # originals kept
    # the takedown-completion GC must REFUSE in this torn state: the
    # boundary batch is still replayable and needs the originals
    from engine.ops.dedup_stream import _gc_takedown_originals

    with pytest.raises(ValueError, match=rf"\[{TD_AFTER}\].*replay"):
        _gc_takedown_originals(f"{base}/ckpt", idx)
    assert os.path.exists(f"{idx}/bands/gen={TD_AFTER}")

    log = []
    out = run_inc_lsh_stream(
        spark, SMOKE_SF_DIR, base, delete_after=TD_AFTER,
        read_paths_log=log,
    )

    # the replayed boundary batch read only pre-takedown generations
    replayed = [paths for (b, paths) in log if b == TD_AFTER]
    assert replayed, "boundary batch was not replayed"
    for paths in replayed:
        assert all("/bands/gen=" in p for p in paths)
        assert not any("/bands_p/" in p for p in paths)
    # the post-boundary increment served from the purged twins for the
    # covered prefix and originals for newer generations
    post = [paths for (b, paths) in log if b > TD_AFTER]
    assert post
    for paths in post:
        covered = [p for p in paths if "/bands_p/gen=" in p]
        assert len(covered) == TD_AFTER + 1

    got = {tuple(r) for r in out.collect()}
    ref = {
        tuple(r)
        for r in QUERIES["stream_dedup_delete_e2e"](
            spark, SMOKE_SF_DIR
        ).collect()
    }
    assert got == ref, "restart across takedown boundary diverged"

    # no takedown doc's own row survives anywhere in the sink, and no
    # takedown doc survives in any purged band generation
    assert not any(t[0] % TD_MOD == TD_RES and t[1] <= TD_AFTER for t in got)
    purged = spark.read.parquet(
        *[f"{idx}/bands_p/gen={g}" for g in range(TD_AFTER + 1)]
    )
    assert purged.filter(
        (purged.doc_id % TD_MOD) == TD_RES
    ).count() == 0
    # tombstones hold exactly the deleted ids
    tomb = {
        r[0] for r in spark.read.parquet(f"{idx}/tombstones").collect()
    }
    assert tomb and all(t % TD_MOD == TD_RES for t in tomb)


def test_reupload_guard_boundary_restart(spark, tmp_path):
    """Kill/restart across the takedown boundary WITH the
    content-tombstone guard on (stream_dedup_reupload_block_e2e's rig):
    the replayed boundary batch must NOT be screened (its own cohort
    members' hashes are tombstoned — filtering them on replay would
    rewrite the committed generation with different partners), the
    post-boundary batch must be screened, and the final output equals
    the uninterrupted guarded pipeline."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from engine.ops.dedup_stream import (
        TD_AFTER,
        _reupload_docs,
        run_inc_lsh_stream,
    )
    from engine.registry import QUERIES, table

    d = table(spark, SMOKE_SF_DIR, "documents").select("doc_id", "text")
    mx = d.agg({"doc_id": "max"}).collect()[0][0]
    docs_x = _reupload_docs(d, mx)
    base = str(tmp_path / "reupload")

    with pytest.raises(StreamingQueryException):
        run_inc_lsh_stream(
            spark, SMOKE_SF_DIR, base, delete_after=TD_AFTER,
            docs_override=docs_x, block_reuploads=True,
            fail_at_batch=TD_AFTER, fail_phase="post_takedown",
        )
    assert os.path.exists(f"{base}/index/tombstones_sha")

    blocked = []
    out = run_inc_lsh_stream(
        spark, SMOKE_SF_DIR, base, delete_after=TD_AFTER,
        docs_override=docs_x, block_reuploads=True, blocked_log=blocked,
    )
    # exactly one screened batch ran on restart (the post-boundary
    # one); the replayed boundary batch was not screened, so it
    # appended nothing to blocked_log
    assert len(blocked) == 1 and blocked[0] > 0, blocked

    got = {tuple(r) for r in out.collect()}
    ref = {
        tuple(r)
        for r in QUERIES["stream_dedup_reupload_block_e2e"](
            spark, SMOKE_SF_DIR
        ).collect()
    }
    assert got == ref, "guarded restart across takedown boundary diverged"


def test_sim_gc_refuses_inside_replay_horizon(spark, tmp_path):
    """The ANN GC guard's teeth (stream_sim_gc_e2e): in the
    post-compaction torn state — marker published, boundary batch's
    commit log missing — list-generation GC must REFUSE; after the
    restarted stream completes, the same GC succeeds, the codebook
    survives, and the probe still matches the batch append op."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from engine.ops.similarity import (
        N_SIM_BATCHES,
        _gc_list_generations,
        run_sim_index_stream,
    )
    from engine.registry import QUERIES

    base = str(tmp_path / "sim_gc")
    boundary = N_SIM_BATCHES - 2
    idx, ckpt = f"{base}/index", f"{base}/ckpt"

    with pytest.raises(StreamingQueryException):
        run_sim_index_stream(
            spark, SMOKE_SF_DIR, base, compact_after=boundary,
            fail_at_batch=boundary, fail_phase="post_compact",
        )

    with pytest.raises(ValueError, match=rf"\[{boundary}\].*replay"):
        _gc_list_generations(ckpt, idx)
    assert os.path.exists(f"{idx}/lists/gen={boundary}")

    out = run_sim_index_stream(
        spark, SMOKE_SF_DIR, base, compact_after=boundary
    )
    removed = _gc_list_generations(ckpt, idx)
    assert len(removed) == boundary + 1
    assert os.path.exists(f"{idx}/centroids")

    got = {tuple(r) for r in out.collect()}
    ref = {
        tuple(r)
        for r in QUERIES["sim_index_append"](spark, SMOKE_SF_DIR).collect()
    }
    assert got == ref


def test_sim_takedown_boundary_restart(spark, tmp_path):
    """Kill/restart ACROSS the ANN takedown boundary
    (stream_sim_delete_e2e's torn state): run 1 processes the boundary
    increment, writes its list generation, applies the takedown
    (purged twins + tombstones + marker), then dies BEFORE the
    checkpoint commit. Run 2 replays the boundary increment — the
    generation rewrite and the takedown redo are deterministic
    overwrites — processes the remaining increment, and the final
    probe (served from the purged prefix + untouched newer
    generations) is byte-equal to the uninterrupted delete pipeline."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from engine.ops.dedup_stream import _read_marker
    from engine.ops.similarity import (
        N_SIM_BATCHES,
        VEC_TD_MOD,
        VEC_TD_RES,
        run_sim_index_stream,
    )
    from engine.registry import QUERIES

    base = str(tmp_path / "sim_takedown")
    boundary = N_SIM_BATCHES - 2
    idx = f"{base}/index"

    with pytest.raises(StreamingQueryException):
        run_sim_index_stream(
            spark, SMOKE_SF_DIR, base, delete_after=boundary,
            fail_at_batch=boundary, fail_phase="post_takedown",
        )

    # torn state: marker + purged twins + tombstones published,
    # originals retained, checkpoint commit missing
    assert _read_marker(f"{idx}/takedown_upto") == boundary
    assert os.path.exists(f"{idx}/lists_p/gen=0")
    assert os.path.exists(f"{idx}/tombstones")
    assert os.path.exists(f"{idx}/lists/gen={boundary}")

    log = []
    out = run_sim_index_stream(
        spark, SMOKE_SF_DIR, base, delete_after=boundary,
        serve_paths_log=log,
    )
    served = log[-1]
    assert sum(1 for p in served if "/lists_p/gen=" in p) == boundary + 1
    assert not any(
        "/lists/gen=" in p and int(p.rsplit("=", 1)[1]) <= boundary
        for p in served
    )

    got = {tuple(r) for r in out.collect()}
    ref = {
        tuple(r)
        for r in QUERIES["stream_sim_delete_e2e"](
            spark, SMOKE_SF_DIR
        ).collect()
    }
    assert got == ref, "restart across ANN takedown boundary diverged"

    # no tombstoned vector in any purged twin
    purged = spark.read.parquet(f"{idx}/lists_p/gen=0")
    assert purged.filter(
        (purged.c_id % VEC_TD_MOD) == VEC_TD_RES
    ).count() == 0


def test_corpus_prep_stream_restart(spark, tmp_path):
    """Kill/restart of the COMPOSED intake pipeline
    (stream_corpus_prep_e2e): run 1 commits increment 0, then dies in
    increment 1's torn state — the kept-docs index generation already
    written, the sink batch absent. Run 2 restarts on the same
    checkpoint, replays exactly increment 1 (generation rewrite is a
    deterministic overwrite), and the final routed output is
    byte-equal to the uninterrupted composite (which the registered
    op value-hashes against the composed gate+dedup oracle)."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from engine.ops.corpus_stream import run_corpus_prep_stream
    from engine.registry import QUERIES

    base = str(tmp_path / "prep")

    with pytest.raises(StreamingQueryException):
        run_corpus_prep_stream(spark, SMOKE_SF_DIR, base, fail_at_batch=1)

    assert os.path.exists(f"{base}/sink/batch_id=0")
    assert not os.path.exists(f"{base}/sink/batch_id=1")
    assert os.path.exists(f"{base}/index/bands/gen=1")

    out = run_corpus_prep_stream(spark, SMOKE_SF_DIR, base)
    got = {tuple(r) for r in out.collect()}
    ref = {
        tuple(r)
        for r in QUERIES["stream_corpus_prep_e2e"](
            spark, SMOKE_SF_DIR
        ).collect()
    }
    assert got == ref, "restarted composite diverged"
    # the gate/dedup interaction invariant: every rejected doc has no
    # partner, every kept_dup's partner is itself a kept doc
    routes = {t[0]: (t[3], t[4]) for t in got}
    for doc, (route, dup_of) in routes.items():
        if route == "rejected":
            assert dup_of == -1
        if route == "kept_dup":
            assert routes[dup_of][0] in ("kept", "kept_dup")


def test_corpus_prep_capped_restart_and_subset(spark, tmp_path):
    """The CAPPED composite (stream_corpus_prep_capped_e2e's rig):
    (a) torn-state kill/restart with the cap threaded through — the
    replayed increment rewrites its band AND counts generations
    deterministically and the final output equals the uninterrupted
    capped composite; (b) with a cap tight enough to bind on the kept
    set, the capped kept_dup set is a STRICT subset of the uncapped
    one and every surviving partner is monotone ≥ the uncapped
    partner — the composed form of the capped ⊆ uncapped property."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from engine.ops.corpus_stream import run_corpus_prep_stream
    from engine.registry import QUERIES

    cap = 2  # binds on the kept set at smoke scale
    base = str(tmp_path / "prep_capped")

    with pytest.raises(StreamingQueryException):
        run_corpus_prep_stream(
            spark, SMOKE_SF_DIR, base, fail_at_batch=1, bucket_cap=cap
        )
    assert os.path.exists(f"{base}/index/counts/gen=1")
    assert not os.path.exists(f"{base}/sink/batch_id=1")

    out = run_corpus_prep_stream(spark, SMOKE_SF_DIR, base, bucket_cap=cap)
    got = {tuple(r) for r in out.collect()}

    clean = run_corpus_prep_stream(
        spark, SMOKE_SF_DIR, str(tmp_path / "prep_capped_clean"),
        bucket_cap=cap,
    )
    assert got == {tuple(r) for r in clean.collect()}, (
        "capped composite restart diverged"
    )

    unc = {
        r["doc_id"]: r["dup_of"]
        for r in QUERIES["stream_corpus_prep_e2e"](
            spark, SMOKE_SF_DIR
        ).collect()
        if r["route"] == "kept_dup"
    }
    capd = {
        t[0]: t[4]
        for t in got
        if t[3] == "kept_dup"
    }
    assert set(capd) < set(unc), (
        f"cap={cap} did not bind on the kept set: {len(capd)} vs {len(unc)}"
    )
    assert all(capd[k] >= unc[k] for k in capd), (
        "capped partner below uncapped on the composite"
    )


def test_corpus_prep_takedown_restart(spark, tmp_path):
    """Kill/restart across the COMPOSED intake's takedown boundary
    (stream_corpus_prep_delete_e2e's torn state): run 1 processes the
    boundary increment, applies the takedown (purged kept-set index
    twins + tombstones + marker) and purges the served sink, then dies
    before the checkpoint commit. Run 2 replays the boundary increment
    (pre-takedown reads, deterministic redo) and the final routed
    output equals the uninterrupted delete composite."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from engine.ops.dedup_stream import TD_AFTER, TD_MOD, TD_RES, _read_marker
    from engine.ops.corpus_stream import run_corpus_prep_stream
    from engine.registry import QUERIES

    base = str(tmp_path / "prep_takedown")
    idx = f"{base}/index"

    with pytest.raises(StreamingQueryException):
        run_corpus_prep_stream(
            spark, SMOKE_SF_DIR, base, delete_after=TD_AFTER,
            fail_at_batch=TD_AFTER, fail_phase="post_takedown",
        )

    assert _read_marker(f"{idx}/takedown_upto") == TD_AFTER
    assert os.path.exists(f"{idx}/bands_p/gen=0")
    assert os.path.exists(f"{idx}/tombstones")
    assert os.path.exists(f"{idx}/bands/gen={TD_AFTER}")  # originals kept

    rlog = []
    out = run_corpus_prep_stream(
        spark, SMOKE_SF_DIR, base, delete_after=TD_AFTER,
        read_paths_log=rlog,
    )
    replayed = [p for (b, p) in rlog if b == TD_AFTER]
    assert replayed and all(
        not any("/bands_p/" in x for x in paths) for paths in replayed
    ), "replayed boundary batch must read the pre-takedown layout"

    got = {tuple(r) for r in out.collect()}
    ref = {
        tuple(r)
        for r in QUERIES["stream_corpus_prep_delete_e2e"](
            spark, SMOKE_SF_DIR
        ).collect()
    }
    assert got == ref, "restart across intake takedown boundary diverged"
    # cohort's own rows are gone from every served batch <= boundary
    assert not any(
        t[0] % TD_MOD == TD_RES and t[1] <= TD_AFTER for t in got
    )


def test_corpus_prep_index_holds_only_kept_docs(spark, tmp_path):
    """The composite's governance invariant, checked against the
    PERSISTED state rather than the output rows: after
    stream_corpus_prep_e2e's rig runs, every doc_id in every
    generation of the dedup index (bands AND shingles) must be a doc
    the gate routed kept/kept_dup — a rejected document that leaked
    into the index would keep influencing future dedup decisions
    after intake said it never entered the corpus."""
    from engine.ops.dedup import N_INC_BATCHES
    from engine.ops.corpus_stream import run_corpus_prep_stream

    base = str(tmp_path / "prep_gov")
    out = run_corpus_prep_stream(spark, SMOKE_SF_DIR, base)
    kept = {
        r["doc_id"]
        for r in out.filter("route != 'rejected'").collect()
    }
    assert kept, "gate kept nothing — fixture degenerate"
    for fam in ("bands", "shingles"):
        idx_ids = {
            r["doc_id"]
            for r in spark.read.parquet(
                *[
                    f"{base}/index/{fam}/gen={g}"
                    for g in range(N_INC_BATCHES)
                ]
            )
            .select("doc_id")
            .distinct()
            .collect()
        }
        assert idx_ids == kept, (
            f"{fam}: index contents != kept set "
            f"(leaked: {sorted(idx_ids - kept)[:5]}, "
            f"missing: {sorted(kept - idx_ids)[:5]})"
        )


def test_committed_src_batches_reads_compacted_metadata(tmp_path):
    """FileStreamSourceLog compacts its per-epoch metadata every
    compactInterval batches: the compacted epoch exists only as
    `<epoch>.compact` (carrying every retained entry). The GC
    watermark reader must count batches admitted at a compacted
    epoch as committed — otherwise the guard refuses FOREVER on any
    stream past the compact interval (review finding, round 8)."""
    import json

    from engine.ops.dedup_stream import _committed_src_batches

    ckpt = tmp_path / "ckpt"
    (ckpt / "commits").mkdir(parents=True)
    (ckpt / "sources" / "0").mkdir(parents=True)
    for epoch in (0, 1, 9, 10):
        (ckpt / "commits" / str(epoch)).write_text("v1\n{}")

    def entry(b):
        return json.dumps(
            {"path": f"file:///src/batch_{b}.parquet", "batchId": b}
        )

    # plain per-epoch files for 0 and 1
    (ckpt / "sources" / "0" / "0").write_text("v1\n" + entry(0))
    (ckpt / "sources" / "0" / "1").write_text("v1\n" + entry(1))
    # epoch 9 was compacted: ONLY the .compact file exists, and it
    # carries the full retained history (entries 0..9)
    (ckpt / "sources" / "0" / "9.compact").write_text(
        "v1\n" + "\n".join(entry(b) for b in range(10))
    )
    # epoch 10 back to a plain file
    (ckpt / "sources" / "0" / "10").write_text("v1\n" + entry(10))
    # epoch 11 admitted (offsets) but never committed: no commit file
    (ckpt / "sources" / "0" / "11").write_text("v1\n" + entry(11))

    got = _committed_src_batches(str(ckpt))
    assert got == set(range(11)), got  # 0..10 committed, 11 excluded


def test_capped_delete_purges_counts_in_both_rigs(spark, tmp_path):
    """bucket_cap + delete_after is SUPPORTED in both stream rigs
    (previously a loud refusal — ADVICE r9): the takedown rewrites the
    covered counts generations as purged twins recomputed from the
    purged bands, so deleted documents stop counting toward bucket
    caps. Pins counts_p == groupBy-count of bands_p per covered
    generation, in the dedicated rig and the composed intake rig."""
    import os

    from engine.ops.corpus_stream import run_corpus_prep_stream
    from engine.ops.dedup_stream import TD_AFTER, run_inc_lsh_stream

    def check_counts(idx):
        for g in range(TD_AFTER + 1):
            assert os.path.exists(f"{idx}/counts_p/gen={g}")
            got = {
                (r["band"], r["band_key"]): r["n_new"]
                for r in spark.read.parquet(
                    f"{idx}/counts_p/gen={g}"
                ).collect()
            }
            want = {
                (r["band"], r["band_key"]): r["n_new"]
                for r in spark.read.parquet(f"{idx}/bands_p/gen={g}")
                .groupBy("band", "band_key")
                .count()
                .withColumnRenamed("count", "n_new")
                .collect()
            }
            assert got == want

    base = str(tmp_path / "a")
    run_inc_lsh_stream(
        spark, SMOKE_SF_DIR, base,
        bucket_cap=2, delete_after=TD_AFTER,
    )
    check_counts(f"{base}/index")

    base2 = str(tmp_path / "b")
    run_corpus_prep_stream(
        spark, SMOKE_SF_DIR, base2,
        bucket_cap=2, delete_after=TD_AFTER,
    )
    check_counts(f"{base2}/index")


def test_takedown_audit_refuses_empty_families(spark, tmp_path):
    """_audit_no_tombstoned with zero surviving generation shards
    (e.g. every family GC'd, or a mistyped family list) must refuse
    with a meaningful error, not die on NoneType (ADVICE r9)."""
    from engine.ops.dedup_stream import _audit_no_tombstoned

    idx = tmp_path / "idx"
    idx.mkdir()
    spark.createDataFrame([(1,)], "doc_id bigint").write.parquet(
        str(idx / "tombstones")
    )
    with pytest.raises(AssertionError, match="nothing to audit"):
        _audit_no_tombstoned(spark, str(idx), ("bands", "no_such_family"))


def test_purge_sink_shards_oversized_partition(spark, tmp_path):
    """_purge_sink rewrites must respect the file-size budget: an
    oversized served partition is rewritten as multiple files (one
    task each), never serialized through a single writer (round-9
    verdict item 6)."""
    from engine.ops.dedup_stream import TD_MOD, TD_RES, _purge_sink

    sink = tmp_path / "sink"
    part = sink / "batch_id=0"
    n = 10_000
    spark.range(n).selectExpr("id AS doc_id", "id * 2 AS payload").coalesce(
        1
    ).write.parquet(str(part))

    _purge_sink(spark, str(sink), 0, rows_per_file=1_000)

    files = [f for f in os.listdir(part) if f.endswith(".parquet")]
    kept = spark.read.parquet(str(part))
    n_kept = kept.count()
    assert n_kept == n - len(
        [i for i in range(n) if i % TD_MOD == TD_RES]
    )
    assert kept.filter((kept.doc_id % TD_MOD) == TD_RES).count() == 0
    expected_files = -(-n_kept // 1_000)
    assert len(files) == expected_files, (len(files), expected_files)


def test_purge_sink_folds_partitions_one_pass(spark, tmp_path):
    """_purge_sink now reads all covered partitions in ONE basePath
    scan (one checkpoint + one grouped count) and slices per-partition
    rewrites from it (round-12 optimization). Pins the fold's
    equivalence: every covered partition is purged, uncovered
    partitions untouched, per-partition file budget preserved."""
    from engine.ops.dedup_stream import TD_MOD, TD_RES, _purge_sink

    sink = tmp_path / "sink"
    n = 3_000
    for g in (0, 1, 2):
        spark.range(g * n, (g + 1) * n).selectExpr(
            "id AS doc_id", "id * 2 AS payload"
        ).coalesce(1).write.parquet(str(sink / f"batch_id={g}"))

    _purge_sink(spark, str(sink), 1, rows_per_file=1_000)

    for g in (0, 1):
        part = spark.read.parquet(str(sink / f"batch_id={g}"))
        assert part.filter((part.doc_id % TD_MOD) == TD_RES).count() == 0
        n_kept = part.count()
        assert n_kept == len(
            [i for i in range(g * n, (g + 1) * n) if i % TD_MOD != TD_RES]
        )
        files = [
            f
            for f in os.listdir(sink / f"batch_id={g}")
            if f.endswith(".parquet")
        ]
        assert len(files) == -(-n_kept // 1_000)
    # partition 2 is past the boundary: byte-untouched
    part2 = spark.read.parquet(str(sink / "batch_id=2"))
    assert part2.count() == n
    assert part2.filter((part2.doc_id % TD_MOD) == TD_RES).count() > 0


def test_feed_purge_and_content_roots_audit(spark, tmp_path):
    """Takedown must reach the ARRIVAL copies (ADVICE r9): after the
    takedown GC proves the covered batches can never replay, the
    staged feed files are rewritten without the cohort, the staging
    dirs removed, and the generalized content audit walks feed + sink
    roots. A planted file holding a taken-down doc under an audited
    root must make the audit raise; the purged feed must not disturb a
    checkpoint restart (same paths, same mtimes, nothing replayed)."""
    from engine.ops.dedup_stream import (
        TD_AFTER,
        TD_MOD,
        TD_RES,
        _audit_roots_no_tombstoned,
        _gc_takedown_originals,
        _purge_feed,
        run_inc_lsh_stream,
    )

    base = str(tmp_path / "fp")
    out1 = run_inc_lsh_stream(
        spark, SMOKE_SF_DIR, base, delete_after=TD_AFTER
    )
    rows1 = {tuple(r) for r in out1.collect()}
    idx, ckpt = f"{base}/index", f"{base}/ckpt"
    _gc_takedown_originals(ckpt, idx)
    mtimes = {
        g: os.stat(f"{base}/src/batch_{g}.parquet").st_mtime
        for g in range(TD_AFTER + 1)
    }
    _purge_feed(spark, base, f"{base}/src", TD_AFTER, ckpt=ckpt)

    # covered feed files lost exactly the cohort rows, kept their
    # paths and mtimes; staging dirs are gone
    for g in range(TD_AFTER + 1):
        p = f"{base}/src/batch_{g}.parquet"
        df = spark.read.parquet(p)
        assert df.filter((df.doc_id % TD_MOD) == TD_RES).count() == 0
        assert df.count() > 0
        assert os.stat(p).st_mtime == pytest.approx(mtimes[g], abs=1e-3)
    assert not os.path.exists(f"{base}/stage")

    tomb = spark.read.parquet(f"{idx}/tombstones")
    _audit_roots_no_tombstoned(
        spark, tomb, (f"{base}/src", f"{base}/sink")
    )

    # restart on the purged feed: nothing replays, serving unchanged
    out2 = run_inc_lsh_stream(
        spark, SMOKE_SF_DIR, base, delete_after=TD_AFTER
    )
    assert {tuple(r) for r in out2.collect()} == rows1

    # plant a taken-down doc's text in an audited root: caught
    some_id = int(tomb.limit(1).collect()[0][0])
    spark.createDataFrame(
        [(some_id, "deleted text walks back in")],
        "doc_id bigint, text string",
    ).write.parquet(f"{base}/src/planted.parquet")
    with pytest.raises(AssertionError, match="still holds a tombstoned"):
        _audit_roots_no_tombstoned(
            spark, tomb, (f"{base}/src", f"{base}/sink")
        )
    # a root that exists but holds nothing readable must refuse too
    empty = tmp_path / "empty_root"
    empty.mkdir()
    with pytest.raises(AssertionError, match="no parquet"):
        _audit_roots_no_tombstoned(spark, tomb, (str(empty),))


def test_neardup_guard_boundary_restart(spark, tmp_path):
    """Kill/restart across the takedown boundary WITH the band-
    tombstone (near-dup) guard on: the replayed boundary batch must
    NOT be screened (strictly-past marker rule — screening it would
    rewrite the committed generation), the post-boundary batch must be
    band-screened, the band tombstones must survive the torn state,
    and the final output equals the uninterrupted guarded pipeline."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from engine.ops.dedup_stream import (
        TD_AFTER,
        _paraphrase_docs,
        run_inc_lsh_stream,
    )
    from engine.registry import QUERIES, table

    d = table(spark, SMOKE_SF_DIR, "documents").select("doc_id", "text")
    mx = d.agg({"doc_id": "max"}).collect()[0][0]
    docs_x = _paraphrase_docs(d, mx)
    base = str(tmp_path / "neardup")

    with pytest.raises(StreamingQueryException):
        run_inc_lsh_stream(
            spark, SMOKE_SF_DIR, base, delete_after=TD_AFTER,
            docs_override=docs_x, block_reuploads=True,
            block_neardups=True,
            fail_at_batch=TD_AFTER, fail_phase="post_takedown",
        )
    assert os.path.exists(f"{base}/index/tombstones_bands")

    nd = []
    out = run_inc_lsh_stream(
        spark, SMOKE_SF_DIR, base, delete_after=TD_AFTER,
        docs_override=docs_x, block_reuploads=True,
        block_neardups=True, nd_blocked_log=nd,
    )
    # exactly one screened batch ran on restart (the post-boundary
    # one); the replayed boundary batch was not screened
    assert len(nd) == 1 and nd[0][0] > TD_AFTER and nd[0][1], nd

    got = {tuple(r) for r in out.collect()}
    ref = {
        tuple(r)
        for r in QUERIES["stream_dedup_neardup_block_e2e"](
            spark, SMOKE_SF_DIR
        ).collect()
    }
    assert got == ref, "band-guarded restart across boundary diverged"


def test_capped_takedown_boundary_restart(spark, tmp_path):
    """Kill/restart across the takedown boundary on the CAPPED stream:
    the replayed boundary batch must size its buckets from the
    ORIGINAL covered counts generations (strictly-past rule — the
    purged twins only serve batches past the boundary), the takedown
    redo must rewrite counts_p deterministically, the post-boundary
    batch must read only purged counts for the covered prefix, and the
    final output equals the uninterrupted capped delete pipeline."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from engine.ops.dedup import LSH_BUCKET_CAP
    from engine.ops.dedup_stream import (
        TD_AFTER,
        _read_marker,
        run_inc_lsh_stream,
    )
    from engine.registry import QUERIES

    base = str(tmp_path / "capdel")
    idx = f"{base}/index"

    with pytest.raises(StreamingQueryException):
        run_inc_lsh_stream(
            spark, SMOKE_SF_DIR, base, bucket_cap=LSH_BUCKET_CAP,
            delete_after=TD_AFTER,
            fail_at_batch=TD_AFTER, fail_phase="post_takedown",
        )
    assert _read_marker(f"{idx}/takedown_upto") == TD_AFTER
    assert os.path.exists(f"{idx}/counts_p/gen=0")

    clog = []
    out = run_inc_lsh_stream(
        spark, SMOKE_SF_DIR, base, bucket_cap=LSH_BUCKET_CAP,
        delete_after=TD_AFTER, counts_paths_log=clog,
    )
    replayed = [paths for (b, paths) in clog if b == TD_AFTER]
    assert replayed, "boundary batch was not replayed"
    for paths in replayed:
        assert all("/counts/gen=" in p for p in paths), paths
    post = [paths for (b, paths) in clog if b > TD_AFTER]
    assert post
    for paths in post:
        covered = [p for p in paths if "/counts_p/gen=" in p]
        assert len(covered) == TD_AFTER + 1, paths

    got = {tuple(r) for r in out.collect()}
    ref = {
        tuple(r)
        for r in QUERIES["stream_dedup_capped_delete_e2e"](
            spark, SMOKE_SF_DIR
        ).collect()
    }
    assert got == ref, "capped restart across takedown boundary diverged"


def test_spancov_stream_restart_exactly_once(spark, tmp_path):
    """Kill/restart the span-coverage stream in the torn state (anchor
    generation written, sink row batch absent): the restarted stream
    on the same checkpoint replays the increment, the generation redo
    is a deterministic overwrite, and the final sink equals the
    uninterrupted run AND the replayed-loop batch op. Post-compaction
    increments must read the compacted span table only."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from engine.ops.dedup import N_INC_BATCHES
    from engine.ops.suffix import run_spancov_stream
    from engine.registry import QUERIES

    base = str(tmp_path / "spancov")
    boundary = N_INC_BATCHES - 2

    with pytest.raises(StreamingQueryException):
        run_spancov_stream(
            spark, SMOKE_SF_DIR, base, compact_after=boundary,
            fail_at_batch=boundary,
        )
    # torn state: the boundary generation exists, its sink batch absent
    assert os.path.exists(f"{base}/anchors/gen={boundary}")
    assert not os.path.exists(f"{base}/sink/batch_id={boundary}")

    log = []
    out = run_spancov_stream(
        spark, SMOKE_SF_DIR, base, compact_after=boundary, read_log=log
    )
    # the replayed boundary batch read only per-generation dirs; the
    # post-boundary batch read the compacted table + nothing stale
    replayed = [p for (b, p) in log if b == boundary]
    assert replayed and all(
        "/anchors/gen=" in x for paths in replayed for x in paths
    )
    post = [p for (b, p) in log if b > boundary]
    assert post
    for paths in post:
        assert sum(1 for x in paths if x.endswith("/spans_c")) == 1

    got = {tuple(r) for r in out.collect()}
    ref = {
        tuple(r)
        for r in QUERIES["dedup_span_coverage_incremental"](
            spark, SMOKE_SF_DIR
        ).collect()
    }
    assert got == ref, "spancov stream restart diverged from batch loop"


def test_pq_stream_restart_exactly_once(spark, tmp_path):
    """Kill/restart the PQ ingest stream in the torn state (batch 0's
    codebooks published + its code generation written, checkpoint
    commit missing): the replayed batch re-derives byte-identical
    codebooks (deterministic sample + integer Lloyd) and rewrites the
    same codes; the final serving equals the uninterrupted stream AND
    the batch lifecycle op's persisted-PQ answer."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from engine.ops.pq import run_pq_stream
    from engine.registry import QUERIES

    base = str(tmp_path / "pqstream")
    idx = f"{base}/index"

    with pytest.raises(StreamingQueryException):
        run_pq_stream(spark, SMOKE_SF_DIR, base, fail_at_batch=0)
    assert os.path.exists(f"{idx}/codebooks_ready")
    assert os.path.exists(f"{idx}/codes/gen=0")
    books_before = {
        (r["j"], r["k"], r["pos"]): r["c_u"]
        for r in spark.read.parquet(f"{idx}/codebooks").collect()
    }

    out = run_pq_stream(spark, SMOKE_SF_DIR, base)
    books_after = {
        (r["j"], r["k"], r["pos"]): r["c_u"]
        for r in spark.read.parquet(f"{idx}/codebooks").collect()
    }
    assert books_after == books_before, "codebook replay diverged"

    got = {tuple(r) for r in out.collect()}
    ref = {
        tuple(r)
        for r in QUERIES["sim_index_pq_persist"](
            spark, SMOKE_SF_DIR
        ).collect()
    }
    assert got == ref, "PQ stream diverged from the batch lifecycle op"


def test_delete_rigs_stage_feed_privately(spark, tmp_path):
    """Takedown rigs must never stage their feed through the shared
    /tmp cache: every arrival copy has to sit inside the purge/audit
    perimeter (round-10 review finding). Pins that a delete-mode run
    creates no new engine_feed_* cache entry while a plain run does."""
    import glob
    import shutil
    import tempfile

    from engine.ops.dedup_stream import TD_AFTER, run_inc_lsh_stream

    # the cache lives under tempfile.gettempdir(), which TMPDIR can
    # move off /tmp — build the pattern from the same root _stage_feed
    # uses (ADVICE r10)
    pat = os.path.join(tempfile.gettempdir(), "engine_feed_*")
    for d in glob.glob(pat):
        shutil.rmtree(d, ignore_errors=True)

    run_inc_lsh_stream(
        spark, SMOKE_SF_DIR, str(tmp_path / "del"), delete_after=TD_AFTER
    )
    assert not glob.glob(pat), (
        "delete rig populated the shared feed cache"
    )

    # the VECTOR delete rig obeys the same perimeter (round 11)
    from engine.ops.similarity import N_SIM_BATCHES, run_sim_index_stream

    run_sim_index_stream(
        spark,
        SMOKE_SF_DIR,
        str(tmp_path / "vdel"),
        delete_after=N_SIM_BATCHES - 2,
    )
    assert not glob.glob(pat), (
        "vector delete rig populated the shared feed cache"
    )

    run_inc_lsh_stream(spark, SMOKE_SF_DIR, str(tmp_path / "plain"))
    assert glob.glob(pat), (
        "plain rig did not use the shared cache"
    )


def test_shared_artifact_keys_are_application_scoped(spark):
    """Every keyed shared-artifact cache folds the Spark application
    id into its key (registry.run_scope): rigs inside ONE invocation
    share a build, but a fresh bench/verify invocation can never be
    served a previous run's persisted artifact (optimization-round
    rule: every invocation computes from the parquet inputs). Pinned
    white-box on the suffix-array artifact key — a different
    application id must yield a different artifact directory."""
    from engine.ops.suffix import _sa_artifact_dir

    class _FakeSC:
        applicationId = "application-not-this-run"

    class _FakeSpark:
        sparkContext = _FakeSC()

    here = _sa_artifact_dir(spark, SMOKE_SF_DIR)
    other = _sa_artifact_dir(_FakeSpark(), SMOKE_SF_DIR)
    assert here != other, "SA artifact key ignores the application id"


def test_ivfpq_stream_boundary_restart(spark, tmp_path):
    """Kill/restart ACROSS the composed IVF+PQ stream's compaction
    boundary (stream_sim_ivfpq_e2e's torn state): run 1 trains +
    publishes both models (batch 0 commits), processes the boundary
    increment — code generation write, compaction, marker publish —
    then dies BEFORE the checkpoint commit. Run 2 replays the boundary
    batch on the same checkpoint: the generation rewrite and the
    compaction redo must both be deterministic overwrites, the models
    must be untouched (frozen since batch 0), the final probe must
    serve from codes_c plus only post-boundary generations, and the
    answers must be byte-equal to the batch append lifecycle op."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from engine.ops.dedup_stream import _read_marker
    from engine.ops.pq import run_ivfpq_stream
    from engine.ops.similarity import N_SIM_BATCHES
    from engine.registry import QUERIES

    base = str(tmp_path / "ivfpq_stream")
    boundary = N_SIM_BATCHES - 2
    idx = f"{base}/index"

    with pytest.raises(StreamingQueryException):
        run_ivfpq_stream(
            spark, SMOKE_SF_DIR, base, compact_after=boundary,
            fail_at_batch=boundary, fail_phase="post_compact",
        )

    # torn state: boundary generation + compaction marker + both
    # models on disk, checkpoint never committed the batch
    assert _read_marker(f"{idx}/compacted_upto") == boundary
    assert os.path.exists(f"{idx}/codes_c")
    assert os.path.exists(f"{idx}/codes/gen={boundary}")
    books_before = {
        (r["j"], r["k"], r["pos"]): r["c_u"]
        for r in spark.read.parquet(f"{idx}/codebooks").collect()
    }

    log = []
    out = run_ivfpq_stream(
        spark, SMOKE_SF_DIR, base, compact_after=boundary,
        serve_paths_log=log,
    )
    paths = log[-1]
    assert any(p.endswith("/codes_c") for p in paths)
    assert not any(
        "/codes/gen=" in p and int(p.rsplit("=", 1)[1]) <= boundary
        for p in paths
    )
    books_after = {
        (r["j"], r["k"], r["pos"]): r["c_u"]
        for r in spark.read.parquet(f"{idx}/codebooks").collect()
    }
    assert books_after == books_before, "codebook replay diverged"

    got = {tuple(r) for r in out.collect()}
    ref = {
        tuple(r)
        for r in QUERIES["sim_index_ivfpq_append"](
            spark, SMOKE_SF_DIR
        ).collect()
    }
    assert got == ref, "restart across IVF+PQ boundary diverged"

    # the compaction redo overwrote, not appended: codes_c holds the
    # covered generations' rows exactly once
    covered = (
        spark.read.option("basePath", f"{idx}/codes")
        .parquet(*[f"{idx}/codes/gen={g}" for g in range(boundary + 1)])
        .drop("gen")
    )
    codes_c = spark.read.parquet(f"{idx}/codes_c")
    assert codes_c.count() == covered.count()
    assert (
        codes_c.select("vec_id").distinct().count()
        == covered.select("vec_id").distinct().count()
        == covered.count()
    )


def test_pq_recode_stream_boundary_restart(spark, tmp_path):
    """Kill/restart the streamed codebook recode in its torn state
    (the boundary increment fired the staleness monitor, published
    codebooks gen=1, and wrote its own gen=1-encoded codes — the
    checkpoint commit is missing): the replayed boundary batch must
    see the marker its torn run published, SKIP the retrain (the
    deterministic publish already converged), re-encode to the same
    bytes, and the final multi-codebook serving must equal an
    uninterrupted run's. The monitor must not re-fire on replay."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from engine.ops.dedup_stream import _read_marker
    from engine.ops.pq import run_pq_recode_stream

    base = str(tmp_path / "pqrecode")
    idx = f"{base}/index"

    log1 = []
    with pytest.raises(StreamingQueryException):
        run_pq_recode_stream(
            spark, SMOKE_SF_DIR, base, fail_at_batch=1, monitor_log=log1
        )
    assert [b for (b, _r, _bl, f) in log1 if f] == [1]
    assert _read_marker(f"{idx}/cb1_ready") is not None
    assert os.path.exists(f"{idx}/codes/gen=1")
    books1_before = {
        (r["j"], r["k"], r["pos"]): r["c_u"]
        for r in spark.read.parquet(f"{idx}/codebooks/gen=1").collect()
    }

    log2 = []
    out = run_pq_recode_stream(
        spark, SMOKE_SF_DIR, base, monitor_log=log2
    )
    # the replayed boundary batch routed via the published marker —
    # the monitor never ran again, so no second fire was possible
    assert log2 == [], log2
    books1_after = {
        (r["j"], r["k"], r["pos"]): r["c_u"]
        for r in spark.read.parquet(f"{idx}/codebooks/gen=1").collect()
    }
    assert books1_after == books1_before, "gen=1 replay diverged"

    got = {tuple(r) for r in out.collect()}
    fresh = run_pq_recode_stream(
        spark, SMOKE_SF_DIR, str(tmp_path / "fresh")
    )
    assert got == {tuple(r) for r in fresh.collect()}, (
        "restart across the recode boundary diverged from an"
        " uninterrupted run"
    )


def test_pq_recode_delete_boundary_restart(spark, tmp_path):
    """Kill/restart the recode×delete stream in its torn state (the
    LAST increment wrote its gen=1-encoded codes, purged every
    covered generation across BOTH codebook eras into cb-carrying
    twins, published the takedown marker — checkpoint commit
    missing): the replayed boundary batch must redo its code write
    and the two-era takedown as deterministic overwrites (stable twin
    counts, era routing intact), and the final marker-gated
    multi-codebook serving must be byte-equal to an uninterrupted
    composed run's."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from engine.ops.dedup_stream import _read_marker
    from engine.ops.pq import run_pq_recode_stream

    base = str(tmp_path / "pqrecdel")
    idx = f"{base}/index"

    with pytest.raises(StreamingQueryException):
        run_pq_recode_stream(
            spark, SMOKE_SF_DIR, base, delete_after=2,
            fail_at_batch=2, fail_phase="post_takedown",
        )
    assert _read_marker(f"{idx}/takedown_upto") == 2
    twin_counts = {
        g: spark.read.parquet(f"{idx}/codes_p/gen={g}").count()
        for g in range(3)
    }

    log = []
    out = run_pq_recode_stream(
        spark, SMOKE_SF_DIR, base, delete_after=2, serve_paths_log=log,
    )
    # the takedown redo overwrote the twins, not appended
    for g in range(3):
        assert (
            spark.read.parquet(f"{idx}/codes_p/gen={g}").count()
            == twin_counts[g]
        )
        cbs = {
            r["cb"]
            for r in spark.read.parquet(f"{idx}/codes_p/gen={g}")
            .select("cb")
            .distinct()
            .collect()
        }
        assert cbs == ({0} if g == 0 else {1}), (g, cbs)
    served = log[-1]
    assert served == [f"{idx}/codes_p/gen={g}" for g in range(3)]

    got = {tuple(r) for r in out.collect()}
    fresh = run_pq_recode_stream(
        spark, SMOKE_SF_DIR, str(tmp_path / "fresh"), delete_after=2,
    )
    assert got == {tuple(r) for r in fresh.collect()}, (
        "restart across the recode×delete boundary diverged"
    )


def test_ivfpq_takedown_boundary_restart(spark, tmp_path):
    """Kill/restart the composed IVF+PQ delete stream in its torn
    state (boundary increment wrote its generation, published the
    purged twins + takedown marker, checkpoint commit missing): the
    replayed boundary batch must redo the generation write and the
    takedown as deterministic overwrites (no double-appended twin
    rows), the models must be untouched, and the final serving —
    purged twins for the covered prefix + untouched newer generations
    — must be byte-equal to an uninterrupted delete run's."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from engine.ops.dedup_stream import _read_marker
    from engine.ops.pq import run_ivfpq_stream
    from engine.ops.similarity import N_SIM_BATCHES
    from engine.registry import QUERIES  # noqa: F401  (parity import)

    base = str(tmp_path / "ivfpq_del")
    boundary = N_SIM_BATCHES - 2
    idx = f"{base}/index"

    with pytest.raises(StreamingQueryException):
        run_ivfpq_stream(
            spark, SMOKE_SF_DIR, base, delete_after=boundary,
            fail_at_batch=boundary, fail_phase="post_takedown",
        )
    assert _read_marker(f"{idx}/takedown_upto") == boundary
    for g in range(boundary + 1):
        assert os.path.exists(f"{idx}/codes_p/gen={g}")
    twin_counts = {
        g: spark.read.parquet(f"{idx}/codes_p/gen={g}").count()
        for g in range(boundary + 1)
    }

    log = []
    out = run_ivfpq_stream(
        spark, SMOKE_SF_DIR, base, delete_after=boundary,
        serve_paths_log=log,
    )
    # the takedown redo overwrote, not appended
    for g in range(boundary + 1):
        assert (
            spark.read.parquet(f"{idx}/codes_p/gen={g}").count()
            == twin_counts[g]
        )
    served = log[-1]
    assert len([p for p in served if "/codes_p/gen=" in p]) == boundary + 1
    assert not any(
        "/codes/gen=" in p and int(p.rsplit("=", 1)[1]) <= boundary
        for p in served
    )

    got = {tuple(r) for r in out.collect()}
    fresh = run_ivfpq_stream(
        spark, SMOKE_SF_DIR, str(tmp_path / "fresh"),
        delete_after=boundary,
    )
    assert got == {tuple(r) for r in fresh.collect()}, (
        "restart across the composed takedown boundary diverged"
    )


def test_ivfpq_recluster_stream_boundary_restart(spark, tmp_path):
    """Kill/restart the composed recluster stream in its torn state
    (the boundary increment fired the monitor, retrained + published
    centroids_g1, rewrote placement into codes_r/gen=0, published the
    reclustered_upto marker, wrote its own generation — checkpoint
    commit missing): the replayed boundary batch must see the marker
    it itself published, SKIP the already-converged retrain (the
    refined centroids stay byte-identical, the monitor never re-runs),
    redo its own code write as a deterministic overwrite, and the
    final marker-gated serving must be byte-equal to an uninterrupted
    recluster run's."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from engine.ops.dedup_stream import _read_marker
    from engine.ops.pq import run_ivfpq_stream

    base = str(tmp_path / "ivfpq_rec")
    idx = f"{base}/index"

    with pytest.raises(StreamingQueryException):
        run_ivfpq_stream(
            spark, SMOKE_SF_DIR, base, recluster=True,
            fail_at_batch=1, fail_phase="post_recluster",
        )
    # torn state: refined model + moved twin + marker + own codes on
    # disk, checkpoint never committed the boundary batch
    assert _read_marker(f"{idx}/reclustered_upto") == 0
    assert os.path.exists(f"{idx}/codes_r/gen=0")
    assert os.path.exists(f"{idx}/codes/gen=1")
    def cent_set(path):
        return {
            (r["cluster"], tuple(r["centroid"]))
            for r in spark.read.parquet(path).collect()
        }

    cent_before = cent_set(f"{idx}/centroids_g1")
    moved_count = spark.read.parquet(f"{idx}/codes_r/gen=0").count()

    log, mon = [], []
    out = run_ivfpq_stream(
        spark, SMOKE_SF_DIR, base, recluster=True,
        serve_paths_log=log, monitor_log=mon,
    )
    # the replay skipped the monitor and the retrain: no re-fire, no
    # model churn, no twin duplication
    assert mon == [], f"monitor re-ran past the marker: {mon}"
    assert cent_set(f"{idx}/centroids_g1") == cent_before, (
        "refined centroids replay diverged"
    )
    assert spark.read.parquet(f"{idx}/codes_r/gen=0").count() == moved_count

    served = log[-1]
    assert any(p.endswith("/codes_r/gen=0") for p in served)
    assert not any("/codes/gen=0" in p for p in served)

    got = {tuple(r) for r in out.collect()}
    fresh = run_ivfpq_stream(
        spark, SMOKE_SF_DIR, str(tmp_path / "fresh"), recluster=True,
    )
    assert got == {tuple(r) for r in fresh.collect()}, (
        "restart across the recluster boundary diverged"
    )


def test_ivfpq_compact_delete_boundary_restart(spark, tmp_path):
    """Kill/restart the compact×delete composed stream in its torn
    state (the LAST increment wrote its generation, rewrote the
    COMPACTED layout + the post-compaction generation into purged
    twins, published the takedown marker — checkpoint commit
    missing): the replayed boundary batch must redo the takedown over
    the folded layout as deterministic overwrites (no double-appended
    twin rows in codes_c_p), and the final serving — purged compacted
    twin + purged newer generation only — must be byte-equal to an
    uninterrupted composed run's."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from engine.ops.dedup_stream import _read_marker
    from engine.ops.pq import run_ivfpq_stream
    from engine.ops.similarity import N_SIM_BATCHES

    base = str(tmp_path / "ivfpq_cd")
    idx = f"{base}/index"
    boundary_c = N_SIM_BATCHES - 2
    boundary_d = N_SIM_BATCHES - 1

    with pytest.raises(StreamingQueryException):
        run_ivfpq_stream(
            spark, SMOKE_SF_DIR, base,
            compact_after=boundary_c, delete_after=boundary_d,
            fail_at_batch=boundary_d, fail_phase="post_takedown",
        )
    assert _read_marker(f"{idx}/compacted_upto") == boundary_c
    assert _read_marker(f"{idx}/takedown_upto") == boundary_d
    assert os.path.exists(f"{idx}/codes_c_p")
    assert os.path.exists(f"{idx}/codes_p/gen={boundary_d}")
    twin_counts = (
        spark.read.parquet(f"{idx}/codes_c_p").count(),
        spark.read.parquet(f"{idx}/codes_p/gen={boundary_d}").count(),
    )

    log = []
    out = run_ivfpq_stream(
        spark, SMOKE_SF_DIR, base,
        compact_after=boundary_c, delete_after=boundary_d,
        serve_paths_log=log,
    )
    # the takedown redo overwrote the folded twin, not appended to it
    assert twin_counts == (
        spark.read.parquet(f"{idx}/codes_c_p").count(),
        spark.read.parquet(f"{idx}/codes_p/gen={boundary_d}").count(),
    )
    served = log[-1]
    assert any(p.endswith("/codes_c_p") for p in served)
    assert not any(p.endswith("/codes_c") for p in served)
    assert not any("/codes/gen=" in p for p in served)

    got = {tuple(r) for r in out.collect()}
    fresh = run_ivfpq_stream(
        spark, SMOKE_SF_DIR, str(tmp_path / "fresh"),
        compact_after=boundary_c, delete_after=boundary_d,
    )
    assert got == {tuple(r) for r in fresh.collect()}, (
        "restart across the compact×delete boundary diverged"
    )
