"""Mimic the driver: every queries() entry vs its oracle_sql() in DuckDB
at sf0.01 (row-count + schema-name + normalized-value equality)."""

import pytest

import __spark_entry__ as entry_mod

from tests.util import assert_same, duck_con

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_every_oracle_key_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_correct, name):
    result = QUERIES[name](spark, sf_correct)
    con = duck_con(sf_correct)
    oracle = con.execute(ORACLES[name]).df()
    assert_same(result, oracle)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_oracleless_query_runs(spark, sf_correct, name):
    df = QUERIES[name](spark, sf_correct)
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert "trx_seq" in df.columns
