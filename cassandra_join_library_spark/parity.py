"""Order-insensitive exact comparison of query results against oracles.

Shared by the pytest gate (tests/test_oracle_parity.py) and the
parallel gate runner (scripts/run_gate.py) so the two can never drift:
one definition of "equal" — row count, column set, and exact values
(floats compared bit-for-bit after NaN alignment).  Stricter than the
driver's hash compare — if this passes, the driver's CORRECTNESS row
should be green.
"""

from __future__ import annotations

import math

import pandas as pd


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Canonical form for comparison: columns sorted by name, dtypes
    widened to engine-neutral ones, rows sorted by every column."""
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


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str) -> None:
    """Assert exact equality; raises AssertionError with a named,
    column-scoped message on the first divergence."""
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} (spark) != {len(duck_pdf)} (duckdb)"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(duck_pdf.columns)}"
    )
    a, b = normalize(spark_pdf), normalize(duck_pdf)
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
