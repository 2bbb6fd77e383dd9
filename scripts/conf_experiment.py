#!/usr/bin/env python
"""A/B a set of session confs over a query subset (guide §1/§9).

Each variant gets its OWN SparkSession (sequentially; the previous one
is stopped), the same warmup as bench.py, and per-query best-of-N
timing with the noop sink. Prints a per-variant table plus deltas vs
the first (baseline) variant. Static confs (master, memory) stay equal
to bench.py's session so results transfer.

Usage:
    python scripts/conf_experiment.py --queries a,b,c --repeat 2
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import engine  # noqa: E402
from engine.session import RUNTIME_CONFS, apply_runtime_confs  # noqa: E402

VARIANTS = {
    "base": {},
    "coalesce_size_first": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
    },
    "shj": {
        "spark.sql.join.preferSortMergeJoin": "false",
    },
    "both": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.join.preferSortMergeJoin": "false",
    },
    "both_plus_listing": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.sql.sources.parallelPartitionDiscovery.threshold": "512",
    },
    "shj_listing": {
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.sql.sources.parallelPartitionDiscovery.threshold": "512",
    },
}


def build_session(extra: dict):
    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or os.cpu_count() or 4
    b = (
        SparkSession.builder.appName("conf_experiment")
        .master(f"local[{cpus}]")
        .config("spark.driver.memory", os.environ.get("ENGINE_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
    )
    for k, v in RUNTIME_CONFS.items():
        b = b.config(k, v)
    for k, v in extra.items():
        b = b.config(k, v)
    return apply_runtime_confs(b.getOrCreate()), extra


def force(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", required=True)
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--variants", default=None, help="comma-separated subset of variant names")
    args = ap.parse_args()

    names = args.queries.split(",")
    unknown = [n for n in names if n not in engine.QUERIES]
    if unknown:
        raise SystemExit(f"unknown ops: {unknown}")
    variants = list(VARIANTS)
    if args.variants:
        variants = args.variants.split(",")

    results: dict[str, dict[str, float]] = {}
    for vname in variants:
        extra = VARIANTS[vname]
        spark, _ = build_session(extra)
        # extra confs are runtime-settable; set them explicitly too in
        # case getOrCreate() returned a pre-existing session
        for k, v in extra.items():
            spark.conf.set(k, v)
        for t in (
            "region nation customer supplier part orders lineitem "
            "events documents embeddings"
        ).split():
            force(engine.table(spark, args.sf_dir, t))
        force(engine.table(spark, args.sf_dir, "orders").groupBy("o_orderstatus").count())
        col = {}
        for name in names:
            best = None
            for _ in range(max(1, args.repeat)):
                t0 = time.perf_counter()
                force(engine.QUERIES[name](spark, args.sf_dir))
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            col[name] = best
            print(f"# {vname} {name}: {best:.3f}s", file=sys.stderr)
        results[vname] = col
        spark.stop()

    base = results[variants[0]]
    print(f"\n{'query':42s} " + " ".join(f"{v:>20s}" for v in variants))
    for name in names:
        row = " ".join(
            f"{results[v][name]:8.3f} ({results[v][name] / base[name] - 1:+5.1%})"
            for v in variants
        )
        print(f"{name:42s} {row}")
    print(f"\n{'TOTAL':42s} " + " ".join(
        f"{sum(results[v].values()):8.2f} ({sum(results[v].values()) / sum(base.values()) - 1:+5.1%})"
        for v in variants
    ))


if __name__ == "__main__":
    main()
