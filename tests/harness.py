"""Driver-replica differential harness (SURVEY §5 t2).

Reproduces the driver's check locally: run the registered Spark query
and its DuckDB oracle on the same sf dir, then compare row count,
column names, and order-insensitively canonicalized values. Values are
compared EXACTLY (full-precision repr) — queries are engineered to be
bit-deterministic across engines (engine/dsl.py), and this harness is
what proves it before the driver does.
"""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def oracle_df(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        return con.execute(sql).df()
    finally:
        con.close()


def cell(v) -> str:
    if v is None or v is pd.NaT:
        return "<NULL>"
    if isinstance(v, float) and math.isnan(v):
        return "<NULL>"
    if isinstance(v, np.floating):
        v = float(v)
    if isinstance(v, Decimal):
        # deliberately NOT coerced: a DecimalType column where the
        # oracle has double is a schema divergence the driver's strict
        # compare would flag (bit us once via a SQL literal `100.0`
        # parsing as DECIMAL in Spark SQL) — keep it loud here.
        return f"decimal:{v}"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return str(int(v))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(cell(x) for x in v) + "]"
    return str(v)


def canon(pdf: pd.DataFrame):
    cols = sorted(pdf.columns)
    rows = sorted(
        tuple(cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    )
    return cols, rows


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    scols, srows = canon(spark_pdf)
    ocols, orows = canon(oracle_pdf)
    assert scols == ocols, f"{name}: column mismatch spark={scols} oracle={ocols}"
    assert len(srows) == len(orows), (
        f"{name}: row count spark={len(srows)} oracle={len(orows)}"
    )
    if srows != orows:
        diffs = [
            (i, s, o) for i, (s, o) in enumerate(zip(srows, orows)) if s != o
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs (cols={scols}): {diffs}")
