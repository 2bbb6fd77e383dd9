#!/usr/bin/env python
"""Benchmark harness (driver contract): run the registered query set at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Timing discipline (SURVEY §6 / BASELINE.md): one shared SparkSession for
the whole set (built outside the timed region), per-query wall time
around a full materialization. Queries are forced with a `noop`-format
write so the entire plan executes distributed without paying
driver-collect serialization — the same work a sink would do, minus the
bytes on disk.

Usage: python bench.py [--sf-dir DIR] [--queries a,b,c] [--repeat N]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import engine  # noqa: E402
from engine.session import get_session  # noqa: E402


def force(df) -> int:
    """Materialize every partition of ``df`` on the executors."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--queries", default=None, help="comma-separated subset")
    ap.add_argument("--repeat", type=int, default=1, help="best-of-N per query")
    ap.add_argument(
        "--out",
        default=None,
        help="also write a per-query sentinel-normalized artifact "
        "(query -> {raw_s, jvm_sentinel_ratio, py_sentinel_ratio}) — "
        "the committed BENCH_local_r{N}.json the judge diffs against "
        "the driver tail (VERDICT r3 item 3)",
    )
    args = ap.parse_args()

    names = sorted(engine.QUERIES)
    if args.queries:
        names = args.queries.split(",")
        unknown = [n for n in names if n not in engine.QUERIES]
        if unknown:
            raise SystemExit(f"unknown query ids: {unknown}")

    m = re.search(r"sf([0-9.]+)", args.sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    spark = get_session("bench")
    # Warm the JVM outside any per-query timing: every table's parquet
    # reader path plus one shuffle, so the first measured query isn't
    # charged for executor/codegen/scan-infra spin-up (BASELINE.md:
    # per-query time excludes session build; steady-state is warm).
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        force(engine.table(spark, args.sf_dir, t))
    force(engine.table(spark, args.sf_dir, "orders").groupBy("o_orderstatus").count())

    # Sentinel discipline (round-2 verdict item 7): every SENTINEL_EVERY
    # queries, clear cache debris, nudge the JVM GC, and re-time a fixed
    # cheap query (tpch_q6). Per-query times are then separable into
    # "this query regressed" vs "the host/session was slow right then" —
    # sentinel_norm ≈ per-query time in units of contemporaneous
    # sentinel time. A flat sentinel with one slow query = real
    # regression; a spiking sentinel = environment.
    # Two sentinels: tpch_q6 exercises the JVM scan/filter/agg path;
    # udf_pandas_scalar exercises the Python-worker + Arrow path. They
    # degrade INDEPENDENTLY — a full-suite window was observed where
    # every Python-path query ran 1.2-4.5x slow while the JVM sentinel
    # stayed flat — so a JVM-only sentinel would mislabel a
    # Python-worker brownout as a per-query regression.
    # A third, DISK sentinel (round 6): a fixed direct-to-disk write.
    # An IO-throttle window was observed where every write-heavy sink
    # op ran 10-35x slow (sink_compact_small_files 2.9 -> 105 s) while
    # BOTH the JVM and Python sentinels stayed near-flat (~1.2x) —
    # host burst-credit depletion, invisible to compute sentinels.
    SENTINEL = "tpch_q6"
    PY_SENTINEL = "udf_pandas_scalar"
    SENTINEL_EVERY = 8
    DISK_SENTINEL_MB = 64

    def run_disk_sentinel() -> float:
        import tempfile

        buf = b"\x00" * (1 << 20)
        t0 = time.perf_counter()
        with tempfile.NamedTemporaryFile(dir=tempfile.gettempdir()) as f:
            for _ in range(DISK_SENTINEL_MB):
                f.write(buf)
            f.flush()
            os.fsync(f.fileno())
        return time.perf_counter() - t0

    def run_sentinel(qname: str) -> float:
        t0 = time.perf_counter()
        force(engine.QUERIES[qname](spark, args.sf_dir))
        return time.perf_counter() - t0

    per_q: dict[str, float] = {}
    sent_norm: dict[str, float] = {}
    py_norm: dict[str, float] = {}
    sent_times: list[float] = []
    py_sent_times: list[float] = []
    disk_sent_times: list[float] = []
    cur_sent = cur_py_sent = None
    for i, name in enumerate(names):
        if SENTINEL in engine.QUERIES and i % SENTINEL_EVERY == 0:
            spark.catalog.clearCache()
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
            cur_sent = run_sentinel(SENTINEL)
            sent_times.append(round(cur_sent, 4))
            if PY_SENTINEL in engine.QUERIES:
                cur_py_sent = run_sentinel(PY_SENTINEL)
                py_sent_times.append(round(cur_py_sent, 4))
            disk_sent_times.append(round(run_disk_sentinel(), 4))
        best = None
        for _ in range(max(1, args.repeat)):
            t0 = time.perf_counter()
            force(engine.QUERIES[name](spark, args.sf_dir))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        per_q[name] = round(best, 4)
        # `is not None` (not truthiness): a sentinel rounded to 0.0s
        # must not silently drop the query's normalized ratio
        if cur_sent is not None and cur_sent > 0:
            sent_norm[name] = round(best / cur_sent, 2)
        if cur_py_sent is not None and cur_py_sent > 0:
            py_norm[name] = round(best / cur_py_sent, 2)
        print(f"# {name}: {best:.3f}s", file=sys.stderr)

    total = round(sum(per_q.values()), 4)
    if args.out:
        artifact = {
            "_meta": {
                "sf": sf,
                "n_queries": len(per_q),
                "total_raw_s": total,
                "jvm_sentinel": SENTINEL,
                "py_sentinel": PY_SENTINEL,
                "jvm_sentinel_times": sent_times,
                "py_sentinel_times": py_sent_times,
                "disk_sentinel_mb": DISK_SENTINEL_MB,
                "disk_sentinel_times": disk_sent_times,
                "note": "ratios are per-query raw seconds divided by the "
                "most recent contemporaneous sentinel time; compare these "
                "(not raw seconds) against the driver tail to separate "
                "real regressions from host throttle",
            },
            **{
                q: {
                    "raw_s": per_q[q],
                    "jvm_sentinel_ratio": sent_norm.get(q),
                    "py_sentinel_ratio": py_norm.get(q),
                }
                for q in sorted(per_q)
            },
        }
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=1)
            f.write("\n")
        print(f"# wrote {args.out}", file=sys.stderr)
    # The stdout contract line stays as small as possible (round-12
    # verdict item 7: the r11 driver capture failed to parse a ~30 KB
    # line; a truncated tail-capture must not null another round's
    # comparison). The full per-query sentinel-normalized map lives in
    # the --out artifact only — on stdout it is derivable from
    # `queries` + `times` — and the line is flushed explicitly.
    print(
        json.dumps(
            {
                "metric": "suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": per_q,
                "sf": sf,
                "n_queries": len(per_q),
                "sentinel": {
                    "id": SENTINEL,
                    "every": SENTINEL_EVERY,
                    "times": sent_times,
                    "py_id": PY_SENTINEL,
                    "py_times": py_sent_times,
                    "disk_times": disk_sent_times,
                },
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
