"""Property test: the compiled Condition algebra matches the
reference's row-at-a-time Python evaluation (commands.py:109-147
semantics: null-rejecting base comparisons, Python boolean
combinators) on randomized condition trees and data with NULLs.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from cassandra_join_library_spark import Condition, JoinExecutor, TableInfo
from cassandra_join_library_spark.sources.catalog import Catalog
from cassandra_join_library_spark.sources.catalog import local_frame

ROWS = [
    {"id": i, "a": a, "b": b, "c": c}
    for i, (a, b, c) in enumerate([
        (1, 2.5, "alpha"), (None, 0.0, "beta"), (7, None, None),
        (-3, 1.5, "gamma"), (0, -2.0, "alphabet"), (None, None, "x"),
        (5, 5.0, ""), (2, 3.5, "delta"), (9, -1.0, "beta"),
    ])
]


def _base_numeric():
    col = st.sampled_from(["t.a", "t.b"])
    lit = st.sampled_from([0, 1, 2, 5, -1, 2.5])
    op = st.sampled_from(["=", "!=", "<", ">", "<=", ">="])
    return st.builds(lambda c, o, l: Condition(c, o, l), col, op, lit)


def _base_string():
    return st.one_of(
        st.builds(lambda v: Condition("t.c", "IN", tuple(v)),
                  st.lists(st.sampled_from(["alpha", "beta", "x", "zz"]),
                           min_size=1, max_size=3)),
        st.builds(lambda v: Condition("t.c", "CONTAINS", v),
                  st.sampled_from(["a", "et", "z", ""])),
        st.builds(lambda o, v: Condition("t.c", o, v),
                  st.sampled_from(["=", "!="]),
                  st.sampled_from(["alpha", "beta", ""])),
    )


conditions = st.recursive(
    st.one_of(_base_numeric(), _base_string()),
    lambda inner: st.one_of(
        st.builds(lambda a, b: a & b, inner, inner),
        st.builds(lambda a, b: a | b, inner, inner),
        st.builds(lambda a: ~a, inner),
    ),
    max_leaves=4,
)


def _pyeval(cond: Condition, row: dict):
    """Reference semantics: base comparisons are null-rejecting Python
    booleans; combinators are plain Python and/or/not."""
    kind = type(cond).__name__
    if kind == "_And":
        return _pyeval(cond.left, row) and _pyeval(cond.right, row)
    if kind == "_Or":
        return _pyeval(cond.left, row) or _pyeval(cond.right, row)
    if kind == "_Not":
        return not _pyeval(cond.inner, row)

    def operand(v):
        if isinstance(v, str) and v.startswith("t."):
            return row[v[2:]]
        return v

    lhs = operand(cond.lhs)
    op = cond.operator
    if op == "IN":
        return lhs is not None and lhs in cond.rhs
    if op == "CONTAINS":
        return lhs is not None and str(cond.rhs) in lhs
    rhs = operand(cond.rhs)
    if lhs is None or rhs is None:
        return False
    return {
        "=": lhs == rhs, "!=": lhs != rhs, "<": lhs < rhs,
        ">": lhs > rhs, "<=": lhs <= rhs, ">=": lhs >= rhs,
    }[op]


class _Cat(Catalog):
    def __init__(self, df):
        self.df = df

    def load(self, spark, table):
        return self.df

    def table_names(self):
        return ["t"]


@pytest.fixture(scope="module")
def tdf(spark):
    df = local_frame(spark, 
        [Row(**r) for r in ROWS],
        schema="id int, a int, b double, c string",
    ).cache()
    df.count()
    return df


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(cond=conditions)
def test_condition_matches_reference_eval(spark, tdf, cond):
    got = {
        r["t_id"]
        for r in (
            JoinExecutor(spark, _Cat(tdf))
            .scan(TableInfo("t"))
            .filter_by(cond)
            .execute()
            .collect()
        )
    }
    want = {r["id"] for r in ROWS if _pyeval(cond, r)}
    assert got == want, f"{cond!r}: spark={sorted(got)} python={sorted(want)}"
