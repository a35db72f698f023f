"""Registry-wide driver-harness conformance (round-4 verdict asks #1/#9).

The driver's correctness gate canonicalizes both result sets with pandas
``sort_values`` over ALL columns and hashes the sorted values.  That
pipeline assumes three properties of every registered query, each of
which has bitten (or nearly bitten) a round:

1. every output column is a scalar type — pandas cannot sort list cells
   (``embed_quantize_int8`` was round 4's only red row: ``TypeError:
   unhashable type: 'list'`` on an ``array<int>`` column);
2. column names are unique case-insensitively and already lowercase —
   the driver lowercases then sorts by name, so dupes or case collisions
   silently misalign the value hash;
3. the oracle SQL actually parses in DuckDB against the standard views.

These are *registry* invariants, so one test sweeps ``load_all()``
instead of relying on each query author remembering them.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import types as T

from kioss_spark.queries import load_all
from kioss_spark.sources import TABLES

SF_DIR = "/root/testdata/sf0.001"

_COMPOSITE = (T.ArrayType, T.MapType, T.StructType)


@pytest.fixture(scope="module")
def registry():
    return load_all()


def test_oracles_parse_in_duckdb(registry):
    """EXPLAIN (parse+bind, no execution) every oracle on the real views."""
    con = duckdb.connect()
    for tbl in TABLES:
        con.sql(f"CREATE VIEW {tbl} AS SELECT * FROM '{SF_DIR}/{tbl}.parquet'")
    bad = []
    for name, q in registry.items():
        if q.oracle is None:
            continue
        try:
            con.sql("EXPLAIN " + q.oracle)
        except Exception as exc:  # noqa: BLE001
            bad.append((name, str(exc).splitlines()[0]))
    assert not bad, f"oracles failed to parse/bind: {bad}"


def test_oracle_columns_unique_lowercase(registry):
    """The ORACLE side must also satisfy the canonicalizer's assumptions."""
    con = duckdb.connect()
    for tbl in TABLES:
        con.sql(f"CREATE VIEW {tbl} AS SELECT * FROM '{SF_DIR}/{tbl}.parquet'")
    bad = []
    for name, q in registry.items():
        if q.oracle is None:
            continue
        cols = con.sql(q.oracle).columns  # DuckDB binds lazily; no fetch
        low = [c.lower() for c in cols]
        if len(set(low)) != len(low):
            bad.append((name, "duplicate columns", cols))
        if any(c != c.lower() for c in cols):
            bad.append((name, "non-lowercase columns", cols))
    assert not bad, bad


def test_query_schemas_driver_canonicalizable(spark, registry):
    """Build every registered query's plan and check the OUTPUT SCHEMA:
    scalar-only columns, unique, lowercase.  Plan-build only (no
    ``collect``), so this stays minutes-not-hours even though a few
    operators (trained IVF, iterative graph loops) run small driver jobs
    while constructing their plan at sf0.001."""
    bad = []
    for name, q in registry.items():
        df = q.fn(spark, SF_DIR)
        cols = df.columns
        low = [c.lower() for c in cols]
        if len(set(low)) != len(low):
            bad.append((name, "duplicate columns", cols))
        if any(c != c.lower() for c in cols):
            bad.append((name, "non-lowercase columns", cols))
        for f in df.schema.fields:
            if isinstance(f.dataType, _COMPOSITE):
                bad.append((name, f"composite column {f.name}", f.dataType.simpleString()))
    assert not bad, f"driver-canonicalizer hazards: {bad}"
