"""Mini-driver: replicate the correctness gate locally.

For every registered query with an oracle, run the Spark query AND the
DuckDB SQL at sf0.01 and compare row count, column set, and exact
values (order-insensitive).  Stricter than the driver's hash compare —
if this passes, CORRECTNESS_r{N}.json should be all green.
"""

from __future__ import annotations

import pytest

from cassandra_join_library_spark.parity import compare
from cassandra_join_library_spark.registry import all_oracles, all_queries

from .conftest import SF_ORACLE

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, duck):
    spark_pdf = QUERIES[name](spark, SF_ORACLE).toPandas()
    duck_pdf = duck.execute(ORACLES[name]).df()
    compare(spark_pdf, duck_pdf, name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, spark):
    """Queries without oracles must still run and return a stable schema."""
    df = QUERIES[name](spark, SF_ORACLE)
    assert df.columns, f"{name}: no columns"
    assert df.count() >= 0
