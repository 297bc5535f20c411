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


@pytest.mark.parametrize("name", sorted(E.oracle_sql().keys()))
def test_oracle_has_no_hugeint_columns(duck, name):
    """DuckDB types sum(BIGINT)/sum(INT) as HUGEINT, which fetchdf() coerces
    to float64 — the driver then hashes "5419399.0" against Spark's "5419399"
    and reports a value-identical spec as red (r10: rolling_trend_events).
    Guard every oracle's output schema so no future SQL regresses the same
    way; fix is a CAST(... AS BIGINT) on the offending expression."""
    sql = E.oracle_sql()[name]
    rows = duck.execute(f"DESCRIBE SELECT * FROM ({sql}) q").fetchall()
    bad = [
        (col, typ)
        for col, typ, *_ in rows
        if typ.upper() in ("HUGEINT", "UHUGEINT", "UBIGINT")
    ]
    assert not bad, (
        f"{name}: oracle emits {bad} — fetchdf() coerces these to float64 "
        "and breaks the driver's value hash; CAST to BIGINT in the SQL"
    )


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"col_name", "stat", "value"}
