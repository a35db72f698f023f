"""Driver-contract smoke tests."""

import __spark_entry__ as entry_mod


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"l_returnflag", "l_linestatus", "sum_qty", "count_order"}


def test_every_query_has_callable(spark):
    qs = entry_mod.queries()
    assert len(qs) >= 20
    for name, fn in qs.items():
        assert callable(fn), name


def test_oracles_reference_registered_queries():
    qs = entry_mod.queries()
    for name in entry_mod.oracle_sql():
        assert name in qs
