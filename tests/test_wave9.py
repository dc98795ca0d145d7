"""Wave-9 operator unit tests: hand-computed small cases + reference
cross-checks for the stats / graph-degeneracy / skyline / privacy
operators."""

from __future__ import annotations

import random

from pyspark.sql import Row
from pyspark.sql import functions as F

from cassandra_join_library_spark.operators.graph import (
    edge_jaccard, kcore_profile,
)
from cassandra_join_library_spark.operators.profiling import (
    benford_audit, fd_audit, t_closeness,
)
from cassandra_join_library_spark.operators.stats import (
    autocorr_integer, contingency_chi_square, ols_per_group,
    pareto_frontier_2d, two_proportion_z,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [Row(u=min(a, b), v=max(a, b)) for a, b in pairs],
        "u bigint, v bigint")


def test_kcore_profile_hand_graph(spark):
    """Triangle 1-2-3 plus pendant 3-4: k=2 peels the pendant in one
    round, the triangle (all degree 2) survives every round."""
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    rows = {r["round"]: (r["n_nodes"], r["n_edges"])
            for r in kcore_profile(e, k=2, rounds=2).collect()}
    assert rows[0] == (4, 4)
    assert rows[1] == (3, 3)   # node 4 (deg 1) peeled
    assert rows[2] == (3, 3)   # stable core


def test_kcore_profile_collapse_to_empty(spark):
    """A path graph under k=2 peels from both ends until nothing is
    left; empty rounds must still report (0, 0) rows."""
    e = _edges(spark, [(1, 2), (2, 3), (3, 4)])
    rows = {r["round"]: (r["n_nodes"], r["n_edges"])
            for r in kcore_profile(e, k=2, rounds=3).collect()}
    assert rows[0] == (4, 3)
    assert rows[1] == (2, 1)   # ends 1 and 4 peeled
    assert rows[2] == (0, 0)
    assert rows[3] == (0, 0)


def test_edge_jaccard_hand_graph(spark):
    """K4 minus one edge: edge (1,2) (the two hub nodes) closes two
    triangles; spoke edges close one each."""
    e = _edges(spark, [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)])
    got = {(r["u"], r["v"]): (r["cn"], r["du"], r["dv"], r["jaccard_micro"])
           for r in edge_jaccard(e, top=10).collect()}
    # edge (1,2): N(1)\{2} = {3,4}, N(2)\{1} = {3,4} -> cn=2, union=2
    assert got[(1, 2)] == (2, 3, 3, 1000000)
    # edge (1,3): N(1)\{3} = {2,4}, N(3)\{1} = {2} -> cn=1, union=2
    assert got[(1, 3)] == (1, 3, 2, 500000)
    assert got[(3, 2)] if (3, 2) in got else got[(2, 3)] == (1, 3, 2, 500000)


def test_edge_jaccard_isolated_edge_zero_denominator(spark):
    """A lone edge (both endpoints degree 1) has empty neighborhoods:
    jaccard must be 0, not a division error."""
    e = _edges(spark, [(1, 2)])
    rows = edge_jaccard(e, top=5).collect()
    assert len(rows) == 1
    assert rows[0]["cn"] == 0 and rows[0]["jaccard_micro"] == 0


def test_pareto_frontier_matches_bruteforce(spark):
    """Window-based skyline == O(n^2) NOT-EXISTS definition on random
    data with deliberate price/size ties."""
    rng = random.Random(7)
    pts = [(i, rng.randrange(0, 20), rng.randrange(0, 20))
           for i in range(120)]
    df = spark.createDataFrame(pts, "id bigint, price bigint, sz bigint")
    got = {r["id"] for r in
           pareto_frontier_2d(df, "id", "price", "sz").collect()}
    want = set()
    for i, p, s in pts:
        dominated = any(
            (p2 <= p and s2 >= s) and (p2 < p or s2 > s)
            for j, p2, s2 in pts if j != i)
        if not dominated:
            want.add(i)
    assert got == want


def test_ols_matches_closed_form(spark):
    """Exact integer check against the closed form computed in Python
    (same integer arithmetic, so equality is exact)."""
    rng = random.Random(3)
    rows = [("a", x := rng.randrange(1, 50), 3 * x + rng.randrange(-5, 6))
            for _ in range(200)]
    rows += [("b", 5, 7), ("b", 5, 9)]   # zero-variance x: NULL slope
    df = spark.createDataFrame(rows, "g string, x bigint, y bigint")
    out = {r["grp"]: r for r in ols_per_group(df, "g", "x", "y").collect()}
    xs = [x for g, x, y in rows if g == "a"]
    ys = [y for g, x, y in rows if g == "a"]
    n, sx, sy = len(xs), sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    want_slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert out["a"]["slope"] == want_slope
    assert abs(out["a"]["slope"] - 3.0) < 0.2
    assert out["b"]["slope"] is None and out["b"]["intercept"] is None


def test_autocorr_constant_series_is_exact_zero_num(spark):
    """A constant series has zero deviations -> num = 0 at every lag
    (den = 0 too: autocorr NULL, never a crash)."""
    df = spark.createDataFrame(
        [(i, 5) for i in range(10)], "t bigint, v bigint")
    rows = autocorr_integer(df, "t", "v", max_lag=3).collect()
    assert {r["lag_k"] for r in rows} == {1, 2, 3}
    for r in rows:
        assert r["num"] == 0 and r["den"] == 0 and r["autocorr"] is None


def test_autocorr_alternating_series(spark):
    """v = +1/-1 alternating: mean rounds to 0, lag-1 autocorr = -1
    exactly (num = -den), lag-2 = +1-ish (num = den minus edge
    terms)."""
    vals = [1 if i % 2 == 0 else -1 for i in range(40)]
    df = spark.createDataFrame(
        list(enumerate(vals)), "t bigint, v bigint")
    out = {r["lag_k"]: r for r in
           autocorr_integer(df, "t", "v", max_lag=2).collect()}
    den = sum(v * v for v in vals)
    n1 = sum(vals[i] * vals[i + 1] for i in range(39))
    n2 = sum(vals[i] * vals[i + 2] for i in range(38))
    assert out[1]["den"] == den and out[1]["num"] == n1
    assert out[2]["num"] == n2
    assert out[1]["autocorr"] == n1 / den
    assert out[1]["n_pairs"] == 39 and out[2]["n_pairs"] == 38


def test_chi_square_independent_uniform(spark):
    """A perfectly balanced 2x2 table has expected == observed and
    zero contribution in every cell."""
    rows = [(a, b) for a in "xy" for b in "pq" for _ in range(25)]
    df = spark.createDataFrame(rows, "a string, b string")
    out = contingency_chi_square(df, "a", "b").collect()
    assert len(out) == 4
    for r in out:
        assert r["n_obs"] == 25 and r["expected"] == 25.0
        assert r["contrib"] == 0.0


def test_two_proportion_z_hand_case(spark):
    df = spark.createDataFrame(
        [(0, 1)] * 30 + [(0, 0)] * 70 + [(1, 1)] * 50 + [(1, 0)] * 50,
        "variant bigint, succ bigint")
    r = two_proportion_z(df, "variant", "succ").collect()[0]
    assert (r["n0"], r["x0"], r["n1"], r["x1"]) == (100, 30, 100, 50)
    import math
    pp = 80 / 200
    se = math.sqrt(pp * (1 - pp) * (1 / 100 + 1 / 100))
    assert r["z"] == (0.5 - 0.3) / se


def test_two_proportion_z_degenerate_rate_is_null(spark):
    """All successes -> pooled rate 1 -> se 0 -> NULL z (matching
    DuckDB's double-division-by-zero semantics), not an ANSI error."""
    df = spark.createDataFrame(
        [(0, 1)] * 5 + [(1, 1)] * 5, "variant bigint, succ bigint")
    r = two_proportion_z(df, "variant", "succ").collect()[0]
    assert r["z"] is None


def test_t_closeness_hand_distributions(spark):
    """Group A mirrors the global distribution (tvd 0 against itself
    would need identical shares); group B holds only one value —
    check against the hand-computed TVD."""
    rows = ([("A", "s1")] * 2 + [("A", "s2")] * 2
            + [("B", "s1")] * 4)
    df = spark.createDataFrame(rows, "g string, s string")
    out = {r["g"]: r for r in t_closeness(df, ["g"], "s").collect()}
    # global: s1 6/8, s2 2/8.  A: 1/2, 1/2 -> tvd = |1/2-3/4| = 1/4
    # B: 1, 0 -> tvd = |1-3/4| = 1/4
    assert out["A"]["tvd"] == 0.25
    assert out["B"]["tvd"] == 0.25
    # integer numerator: tvd = numer / (2 * n_g * N)
    assert out["A"]["numer"] == 2 * out["A"]["n_g"] * 8 * 0.25


def test_benford_digit_extraction_and_expected(spark):
    """Digits come from the decimal string of the integer; expected
    counts use the literal Benford vector."""
    from cassandra_join_library_spark.operators.profiling import BENFORD_P

    vals = [1, 19, 123, 2, 25, 9, 900, -5, 0]   # negatives/zeros dropped
    df = spark.createDataFrame([(v,) for v in vals], "v bigint")
    out = {r["digit"]: r for r in benford_audit(df, "v").collect()}
    assert out[1]["n_obs"] == 3 and out[2]["n_obs"] == 2
    assert out[9]["n_obs"] == 2 and out[1]["n_total"] == 7
    assert out[1]["expected"] == 7 * BENFORD_P[0]


def test_fd_audit_hand_case(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("b", 1), ("b", 2), ("c", 3)],
        "det string, dep bigint")
    r = fd_audit(df, "det", "dep", "det->dep").collect()[0]
    assert r["fd"] == "det->dep"
    assert r["n_groups"] == 3 and r["n_violating"] == 1
    assert r["max_distinct"] == 2
    assert r["violation_rate"] == 1 / 3
