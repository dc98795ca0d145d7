"""Wave-11 operator unit tests: hand-computed cases for association
rules, interval coverage, apportionment, local clustering, weighted
medians, and the sufficient-statistics correlation."""

from __future__ import annotations

import math
import random

import numpy as np
from pyspark.sql import Row
from pyspark.sql import functions as F

from cassandra_join_library_spark.operators.basket import association_pairs
from cassandra_join_library_spark.operators.corpus import (
    apportion_largest_remainder,
)
from cassandra_join_library_spark.operators.graph import local_clustering
from cassandra_join_library_spark.operators.stats import (
    corr_pairs_integer, weighted_median_grouped,
)
from cassandra_join_library_spark.operators.timeseries import (
    interval_union_coverage,
)


def test_association_pairs_hand_case(spark):
    """4 baskets; items 1,2 co-occur twice, each appears 3 times."""
    rows = [(1, 1), (1, 2), (2, 1), (2, 2), (2, 3),
            (3, 1), (3, 3), (4, 2), (4, 3)]
    df = spark.createDataFrame(rows, "b bigint, i bigint")
    out = {(r["u"], r["v"]): r for r in association_pairs(
        df, "b", "i", minsup_div=2, minsup_floor=1, top=10).collect()}
    r = out[(1, 2)]
    assert r["c_u"] == 3 and r["c_v"] == 3 and r["c_uv"] == 2
    assert r["supp_ppm"] == 500000            # 2/4 rounded ppm
    assert r["conf_uv_ppm"] == 666667         # 2/3 rounded half-away
    assert r["lift"] == (4 * 2) / (3 * 3)
    # all pairs of frequent items present
    assert set(out) == {(1, 2), (1, 3), (2, 3)}


def test_association_minsup_prunes_items(spark):
    """An item below the relative support floor never pairs."""
    rows = [(b, 1) for b in range(10)] + [(b, 2) for b in range(10)]
    rows += [(0, 99)]  # 99 appears once: pruned at floor 2
    df = spark.createDataFrame(rows, "b bigint, i bigint")
    out = association_pairs(df, "b", "i",
                            minsup_div=5, minsup_floor=2).collect()
    assert {(r["u"], r["v"]) for r in out} == {(1, 2)}


def test_interval_coverage_hand_case(spark):
    """Overlap, containment, touching, and a gap — all exact."""
    rows = [
        # user 1: [0,10) U [5,20) U [20,25) = [0,25) one island (touch
        # at 20 merges: s=20 is NOT > max_e=20), then [30,35)
        (1, 0, 10), (1, 5, 20), (1, 20, 25), (1, 30, 35),
        # user 2: containment [0,100) ⊇ [10,20)
        (2, 0, 100), (2, 10, 20),
    ]
    df = spark.createDataFrame(rows, "k bigint, s bigint, e bigint")
    out = {r["key"]: r for r in
           interval_union_coverage(df, "k", "s", "e").collect()}
    assert out[1]["covered"] == 25 + 5
    assert out[1]["n_islands"] == 2
    assert out[1]["n_intervals"] == 4
    assert out[2]["covered"] == 100
    assert out[2]["n_islands"] == 1


def test_apportion_sums_exactly_and_ranks_remainders(spark):
    """Classic Hamilton case: quotas sum EXACTLY to the slot total and
    leftovers go to the largest remainders."""
    df = spark.createDataFrame(
        [("a", 47), ("b", 33), ("c", 20)], "key string, w bigint")
    out = {r["key"]: r for r in apportion_largest_remainder(
        df, "key", "w", 10).collect()}
    # exact shares 4.7 / 3.3 / 2.0 -> floors 4/3/2, leftover 1 -> 'a'
    assert out["a"]["quota"] == 5
    assert out["b"]["quota"] == 3
    assert out["c"]["quota"] == 2
    assert sum(r["quota"] for r in out.values()) == 10
    # degenerate: slots smaller than #keys still sums exactly
    out2 = apportion_largest_remainder(df, "key", "w", 2).collect()
    assert sum(r["quota"] for r in out2) == 2


def test_local_clustering_triangle_plus_tail(spark):
    """K3 with a pendant tail: the tail's hub loses coefficient."""
    e = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "u bigint, v bigint")
    out = {r["node_id"]: r for r in
           local_clustering(e, min_deg=2, top=10).collect()}
    assert out[1]["clustering"] == 1.0 and out[1]["n_triangles"] == 1
    assert out[2]["clustering"] == 1.0
    # node 3: deg 3, 1 triangle -> 2*1/(3*2) = 1/3
    assert math.isclose(out[3]["clustering"], 1 / 3)
    assert 4 not in out  # deg 1 < min_deg


def test_weighted_median_hand_and_unweighted_reduction(spark):
    df = spark.createDataFrame(
        [("g", 1, 1), ("g", 2, 1), ("g", 3, 1),
         ("h", 10, 9), ("h", 20, 1)],
        "grp string, v bigint, w bigint")
    out = {r["grp"]: r for r in weighted_median_grouped(
        df, "grp", "v", "w").collect()}
    assert out["g"]["median"] == 2      # plain median with unit weights
    assert out["h"]["median"] == 10     # weight mass sits at 10
    assert out["h"]["totw"] == 10 and out["h"]["n_values"] == 2


def test_corr_pairs_matches_numpy(spark):
    rng = random.Random(5)
    xs = [rng.randrange(0, 1000) for _ in range(200)]
    ys = [3 * x + rng.randrange(0, 500) for x in xs]
    zs = [rng.randrange(0, 1000) for _ in range(200)]
    df = spark.createDataFrame(
        list(zip(xs, ys, zs)), "x bigint, y bigint, z bigint")
    out = {r["pair"]: r["corr"] for r in corr_pairs_integer(
        df, {"x": F.col("x"), "y": F.col("y"), "z": F.col("z")}
    ).collect()}
    ref = np.corrcoef(np.array([xs, ys, zs]))
    assert math.isclose(out["x~y"], ref[0, 1], rel_tol=1e-12)
    assert math.isclose(out["x~z"], ref[0, 2], rel_tol=1e-12)
    assert math.isclose(out["y~z"], ref[1, 2], rel_tol=1e-12)


def test_corr_pairs_degenerate_is_null(spark):
    """Zero variance on one side -> NULL, not a division error."""
    df = spark.createDataFrame(
        [(1, 7), (2, 7), (3, 7)], "x bigint, y bigint")
    out = corr_pairs_integer(
        df, {"x": F.col("x"), "y": F.col("y")}).collect()
    assert out[0]["corr"] is None
