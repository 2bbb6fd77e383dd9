"""t2 replica: every registered query vs its DuckDB oracle at sf0.01."""

from __future__ import annotations

import pytest

import engine
from tests.conftest import T2_SF_DIR
from tests.harness import compare, oracle_df


def _oracle_ids():
    return sorted(engine.ORACLES)


def _rows_only_ids():
    return sorted(set(engine.QUERIES) - set(engine.ORACLES))


@pytest.mark.parametrize("name", _oracle_ids())
def test_oracle_parity(spark, name):
    sdf = engine.QUERIES[name](spark, T2_SF_DIR)
    compare(sdf.toPandas(), oracle_df(engine.ORACLES[name], T2_SF_DIR), name)


@pytest.mark.parametrize("name", _rows_only_ids())
def test_rows_only_runs(spark, name):
    df = engine.QUERIES[name](spark, T2_SF_DIR)
    assert df.count() >= 0
    assert len(df.schema) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
