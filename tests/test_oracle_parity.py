"""Every declared __spark_entry__ query must match its DuckDB oracle at sf0.01 —
the exact comparison the driver runs (CORRECTNESS gate)."""

import pytest

import __spark_entry__ as E
from tests.conftest import SF_DIR_ORACLE
from tests.oracle_harness import compare, duck_connection


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR_ORACLE)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(E.oracle_sql().keys()))
def test_query_matches_oracle(spark, duck, name):
    q = E.queries()[name]
    sql = E.oracle_sql()[name]
    df = q(spark, SF_DIR_ORACLE)
    problems = compare(df, duck, sql)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"col_name", "stat", "value"}
