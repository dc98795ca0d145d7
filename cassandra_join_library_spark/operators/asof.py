"""As-of join — the canonical time-series operator Spark lacks as a
built-in (SURVEY task list names it explicitly).

``asof_join(left, right, ...)``: for each left row, the single right
row with the greatest timestamp <= the left row's timestamp, per key.

Implementation is the scalable union+window pattern, NOT a range join:
tag both sides, union, sort within each key by (ts, side, tiebreak),
and carry the last-seen right row forward with ``last(..., ignorenulls)``
over an unbounded-preceding window.  ONE shuffle on the key — at 100 TB
this is a single sort-exchange, compared to the bucketized range join's
replication or a BNLJ's cross product.

Determinism: right rows with identical (key, ts) are pre-deduplicated
keeping the max tiebreak id, and the window order includes the
tiebreak — identical results under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_id: str = "event_id",
    right_payload: "list[str] | None" = None,
) -> DataFrame:
    """Match each left row to the most recent right row at-or-before
    its timestamp, per ``key``.  Output: all left columns +
    ``matched_<right_id>`` (+ matched payload columns), NULL when no
    right row precedes.

    ``right_id`` must be an integral column: it doubles as the
    deterministic tiebreak and is carried through a ``bigint`` cast —
    a string id would silently become NULL (every match lost), so we
    reject non-integral dtypes up front."""
    right_payload = right_payload or []
    _rid_dtype = dict(right.dtypes).get(right_id)
    if _rid_dtype not in ("tinyint", "smallint", "int", "bigint"):
        raise TypeError(
            f"asof_join right_id column {right_id!r} has dtype {_rid_dtype!r}; "
            "an integral type is required (the id is cast to bigint for the "
            "window tiebreak — a lossy cast would NULL out every match). "
            "Pass a numeric surrogate id, or add one with xxhash64/row_number."
        )

    r = (
        right.groupBy(key, right_ts)
        .agg(
            F.max(right_id).alias(right_id),
            *[F.max_by(c, right_id).alias(c) for c in right_payload],
        )
    )
    l_tagged = left.select(
        F.col(key).alias("_k"), F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"), F.struct(*left.columns).alias("_l"),
        F.lit(None).cast("long").alias("_rid"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_rp_{c}") for c in right_payload],
    )
    r_tagged = r.select(
        F.col(key).alias("_k"), F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(l_tagged.schema["_l"].dataType).alias("_l"),
        F.col(right_id).cast("long").alias("_rid"),
        *[F.col(c).alias(f"_rp_{c}") for c in right_payload],
    )
    unioned = l_tagged.unionByName(r_tagged)
    # right rows sort before left rows at equal ts => "<=" semantics
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_is_left").asc(), F.col("_rid").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "_is_left", "_l",
        F.last("_rid", ignorenulls=True).over(w).alias(f"matched_{right_id}"),
        *[
            F.last(f"_rp_{c}", ignorenulls=True).over(w).alias(f"matched_{c}")
            for c in right_payload
        ],
    )
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col(f"matched_{right_id}"))
    out_cols.extend(F.col(f"matched_{c}") for c in right_payload)
    return carried.filter(F.col("_is_left") == 1).select(*out_cols)
