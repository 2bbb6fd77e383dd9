"""Oracle self-parity (SURVEY §5): every oracle that ALSO parses under
Spark SQL must produce the same result as the DataFrame implementation
when executed by Spark itself — catching silent SQL/DF divergence
before the driver's DuckDB differential does.

Scope notes:
- ~149 of the oracles are ANSI enough to run on both engines; the rest
  use DuckDB-only surfaces (list_* HOFs, strftime, unnest-with-range)
  and are skipped at parse time — the DuckDB differential in
  tests/test_correctness.py still covers them.
- Comparison coerces Decimal→float and rounds floats to 6 dp: Spark
  SQL parses literals like `100.0` as DECIMAL where DuckDB and the
  DataFrame API use double — a representational dialect artifact
  (values equal), not a semantic divergence. The strict-type check
  remains the DuckDB differential's job.
- Executing all ~149 pairs costs ~3.5 min, so each pytest run executes
  a deterministic 45-id slice (seeded by the registry contents, so new
  ops rotate in); the full sweep was run and recorded clean
  (149/149) in the round-4 session log / BASELINE.md.
"""

from __future__ import annotations

import hashlib
import math
from decimal import Decimal

import engine
from engine.registry import table
from tests.conftest import T2_SF_DIR

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
N_EXECUTED = 45

# Oracles that PARSE under Spark SQL but use a DuckDB-only runtime
# surface (function exists in both dialects' grammar, semantics or
# signature differ at execution). Anything outside this set failing at
# runtime is a regression and fails the test — a bare skip would let a
# previously-executable oracle silently rotate past (ADVICE r4).
# The one systematic member is the portable-hash idiom
# CAST('0x' || substr(md5(x), 1, 8) AS BIGINT): DuckDB casts hex
# literals to BIGINT, Spark raises CAST_INVALID_INPUT at runtime —
# every round-5 portable-hash oracle carries it, so membership is
# derived from the SQL text instead of a name list that would go
# stale with each new sketch op (Spark's spelling of the same hash is
# conv(substr(md5(x),1,8),16,10), exercised by the differential).
# Membership requires the FULL idiom, not the bare "'0x'" substring:
# a future oracle using '0x' in a value literal must NOT silently exit
# self-parity (ADVICE r4/r5) — and the excusal itself additionally
# requires the runtime error to be the hex-cast failure (see below).
RUNTIME_DUCKDB_ONLY = {
    name
    for name, sql in engine.ORACLES.items()
    if "'0x' || substr(md5(" in sql
}


def _cell(v):
    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT:
        return "<NULL>"
    if isinstance(v, float) and math.isnan(v):
        return "<NULL>"
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, np.floating):
        v = float(v)
    if isinstance(v, float):
        return repr(round(v, 6))
    return str(v)


def _canon(pdf):
    cols = sorted(pdf.columns)
    return cols, sorted(
        tuple(_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    )


def test_oracles_self_parity_under_spark(spark):
    for t in TABLES:
        table(spark, T2_SF_DIR, t).createOrReplaceTempView(t)
    names = sorted(engine.ORACLES)
    # deterministic rotation: hash of (name, registry size) picks the slice
    ranked = sorted(
        names,
        key=lambda n: hashlib.sha256(f"{n}:{len(names)}".encode()).hexdigest(),
    )
    executed = 0
    parseable = 0
    mismatches = []
    runtime_failed = []
    for name in ranked:
        try:
            sql_df = spark.sql(engine.ORACLES[name])
        except Exception:
            continue  # DuckDB-only dialect — covered by the differential
        parseable += 1
        if executed >= N_EXECUTED:
            continue
        try:
            got_sql = _canon(sql_df.toPandas())
        except Exception as exc:
            # parses but uses a DuckDB-only runtime surface. Only the
            # portable-hash hex cast is excusable, and only when the
            # error actually IS that cast failing — any other error on
            # an allowlisted oracle is a regression, not dialect.
            runtime_failed.append(name)
            if name in RUNTIME_DUCKDB_ONLY:
                assert "CAST_INVALID_INPUT" in str(exc), (
                    f"{name}: allowlisted for the hex-cast idiom but "
                    f"failed with a different error: {exc}"
                )
            continue
        executed += 1
        got_df = _canon(engine.QUERIES[name](spark, T2_SF_DIR).toPandas())
        if got_sql != got_df:
            mismatches.append(name)
    unexpected = set(runtime_failed) - RUNTIME_DUCKDB_ONLY
    assert not unexpected, (
        f"oracles newly failing at runtime under Spark: {sorted(unexpected)}"
    )
    assert executed == N_EXECUTED, f"only {executed} oracle pairs executed"
    assert parseable >= 100, f"only {parseable} oracles Spark-parseable"
    assert not mismatches, f"SQL/DF divergence: {mismatches}"
