"""Replicates the driver's contract locally: entry() smoke + every queries()
entry vs its oracle_sql() on DuckDB, value-for-value."""

import pytest

from tests.conftest import SF_ORACLE, SF_SMOKE, compare_spark_duckdb


def _entry_module():
    import __spark_entry__ as e

    return e


def test_entry_smoke(spark):
    e = _entry_module()
    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None


def test_every_query_has_oracle_or_is_flagged(spark):
    e = _entry_module()
    qs = e.queries()
    oracle = e.oracle_sql()
    assert qs, "no queries registered"
    missing = set(oracle) - set(qs)
    assert not missing, f"oracle_sql for unknown queries: {missing}"


@pytest.mark.parametrize("name", sorted(_entry_module().queries()))
def test_query_matches_oracle(spark, duck, name):
    e = _entry_module()
    fn = e.queries()[name]
    sql = e.oracle_sql().get(name)
    df = fn(spark, SF_ORACLE)
    if sql is None:
        # weaker rows-only check, like the driver's
        assert df.count() >= 0
        return
    n = compare_spark_duckdb(df, duck, sql)
    assert n > 0, f"{name}: oracle comparison is vacuous (0 rows)"
