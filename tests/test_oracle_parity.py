"""Mini-driver: replicate the correctness gate locally.

For every registered query with an oracle, run the Spark query AND the
DuckDB SQL at sf0.01 and compare row count, column set, and exact
values (order-insensitive).  Stricter than the driver's hash compare —
if this passes, CORRECTNESS_r{N}.json should be all green.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from cassandra_join_library_spark.registry import all_oracles, all_queries

from .conftest import SF_ORACLE

QUERIES = all_queries()
ORACLES = all_oracles()


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            pdf[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            pdf[c] = s.astype(str)
        elif pd.api.types.is_bool_dtype(s):
            pdf[c] = s.astype(bool)
        elif pd.api.types.is_integer_dtype(s):
            pdf[c] = s.astype("Int64")
        elif pd.api.types.is_float_dtype(s):
            pdf[c] = s.astype(float)
    return pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)


def _compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str) -> None:
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} (spark) != {len(duck_pdf)} (duckdb)"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(duck_pdf.columns)}"
    )
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]):
            ok = [
                (math.isnan(x) and math.isnan(y)) or x == y
                for x, y in zip(a[c].fillna(float("nan")), b[c].fillna(float("nan")))
            ]
            assert all(ok), f"{name}: float column {c!r} differs (exact compare)"
        else:
            pd.testing.assert_series_equal(
                a[c], b[c], check_names=False, check_dtype=False,
                obj=f"{name}.{c}",
            )


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, duck):
    spark_pdf = QUERIES[name](spark, SF_ORACLE).toPandas()
    duck_pdf = duck.execute(ORACLES[name]).df()
    _compare(spark_pdf, duck_pdf, name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, spark):
    """Queries without oracles must still run and return a stable schema."""
    df = QUERIES[name](spark, SF_ORACLE)
    assert df.columns, f"{name}: no columns"
    assert df.count() >= 0
