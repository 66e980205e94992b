"""Registry invariants: every query callable, every oracle present and
DuckDB-bindable. Protects the all-queries-oracle-backed property the
driver's correctness gate relies on."""

import duckdb
import pytest

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def test_every_query_has_an_oracle():
    import __spark_entry__ as E

    qs, oracles = E.queries(), E.oracle_sql()
    assert len(qs) >= 33
    missing = set(qs) - set(oracles)
    assert not missing, f"rows-only queries reappeared: {missing}"
    assert set(oracles) <= set(qs)
    assert all(callable(f) for f in qs.values())


def test_oracles_bind_in_duckdb():
    """EXPLAIN every oracle against the sf0.001 views: catches SQL
    syntax/binder regressions without running the queries."""
    import __spark_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from '/root/testdata/sf0.001/{t}.parquet'")
    for name, sql in E.oracle_sql().items():
        try:
            con.sql("explain " + sql)
        except Exception as e:  # pragma: no cover
            pytest.fail(f"oracle {name} failed to bind: {e}")
