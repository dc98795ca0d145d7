"""Wave-27 operator edges beyond the value oracle: empty fingerprint
store, full containment, weight overrides, and null/short texts."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_join_library_spark.operators.dedup import (
    cross_snapshot_containment, shingles,
)
from cassandra_join_library_spark.operators.text import (
    QUALITY_WEIGHTS, logistic_quality_score,
)
from cassandra_join_library_spark.sources.catalog import local_frame


def test_cross_snapshot_empty_store_keeps_everything(spark):
    new = local_frame(
        spark, [(1, "a b c d e f g")], "doc_id bigint, text string")
    store = local_frame(spark, [], "shingle string")
    rows = cross_snapshot_containment(new, store, "doc_id", "text").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_shingles"], r["n_seen"], r["containment_ppm"]) == (3, 0, 0)


def test_cross_snapshot_full_containment_is_exactly_1e6(spark):
    text = "a b c d e f"
    prior = local_frame(spark, [(0, text)], "doc_id bigint, text string")
    new = local_frame(spark, [(1, text)], "doc_id bigint, text string")
    store = shingles(prior, "doc_id", "text", 5).select("shingle").distinct()
    r = cross_snapshot_containment(new, store, "doc_id", "text").collect()[0]
    assert r["containment_ppm"] == 1_000_000
    assert r["n_seen"] == r["n_shingles"] == 2


def test_cross_snapshot_short_docs_produce_no_row(spark):
    new = local_frame(
        spark, [(1, "too short"), (2, "a b c d e")],
        "doc_id bigint, text string")
    store = local_frame(spark, [], "shingle string")
    got = {r["doc_id"] for r in
           cross_snapshot_containment(new, store, "doc_id", "text").collect()}
    assert got == {2}  # doc 1 has < 5 words -> no shingles -> no row


def test_quality_score_weight_override_and_nulls(spark):
    df = local_frame(
        spark,
        [(1, "the quick brown fox " * 30), (2, "x"), (3, None)],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in logistic_quality_score(
        df, "doc_id", "text").collect()}
    assert set(out) == {1, 2}          # null text filtered, never scored
    assert out[1]["keep"] and not out[2]["keep"]
    # overriding a weight changes the decision deterministically
    generous = {**QUALITY_WEIGHTS, "bias": 10_000_000}
    out2 = {r["doc_id"]: r["keep"] for r in logistic_quality_score(
        df, "doc_id", "text", weights=generous).collect()}
    assert out2 == {1: True, 2: True}


def test_quality_score_survives_stopword_heavy_megadoc(spark):
    """size()/length() are 32-bit: a doc with > 2147 stopword tokens
    must not ARITHMETIC_OVERFLOW the ppm multiply (ANSI mode)."""
    df = local_frame(spark, [(1, "the " * 3000 + "end")],
                     "doc_id bigint, text string")
    r = logistic_quality_score(df, "doc_id", "text").collect()[0]
    assert r["keep"]  # ~100% stopwords, long: stop term dominates


def test_quality_score_is_map_only(spark):
    """No shuffle in the inference plan — the weights are literals."""
    df = local_frame(spark, [(1, "a b c")], "doc_id bigint, text string")
    plan = (logistic_quality_score(df, "doc_id", "text")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
