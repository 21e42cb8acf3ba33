"""Driver-contract hygiene: queries() and oracle_sql() stay in lockstep.

The driver records a weaker rows-only check for any query missing an
oracle — this engine promises EVERY query a full value-hash oracle, so
a key drifting out of oracle_sql() is a regression, not a choice."""

import __spark_entry__ as entry


def test_every_query_is_oracled():
    qs, oracles = entry.queries(), entry.oracle_sql()
    assert set(qs) == set(oracles), (
        sorted(set(qs) ^ set(oracles)))


def test_oracle_sql_is_nonempty_select():
    for name, sql in entry.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_query_callables_take_spark_and_sfdir():
    import inspect
    for name, fn in entry.queries().items():
        assert len(inspect.signature(fn).parameters) == 2, name
