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

    # SQL join semantics for the degenerate rows, matching the ASOF
    # JOIN oracle: a NULL key or NULL ts on the right can never satisfy
    # `l.key = r.key AND r.ts <= l.ts` — filtered up front (otherwise
    # the window's NULLS-FIRST sort would treat a NULL-ts row as
    # existing at -infinity, and NULL keys would match NULL keys).
    # NULL-key LEFT rows still flow through — their partition simply
    # contains no right rows, so they emerge unmatched, as a left join
    # must.
    r = (
        right.filter(
            F.col(key).isNotNull()
            & F.col(right_ts).isNotNull()
            & F.col(right_id).isNotNull()
        )
        .groupBy(key, right_ts)
        .agg(
            F.max(right_id).alias(right_id),
            *[F.max_by(c, right_id).alias(c) for c in right_payload],
        )
    )
    # ONE struct carries the matched row's id AND payloads atomically:
    # per-column last(ignorenulls) would skip a NULL payload value but
    # not the id, stitching together a row that exists nowhere on the
    # right.
    r_tagged = r.select(
        F.col(key).alias("_k"), F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.struct(
            F.col(right_id).cast("long").alias("_rid"),
            *[F.col(c).alias(c) for c in right_payload],
        ).alias("_r"),
    )
    l_tagged = left.select(
        F.col(key).alias("_k"), F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(r_tagged.schema["_r"].dataType).alias("_r"),
        F.struct(*left.columns).alias("_l"),
    )
    r_tagged = r_tagged.withColumn(
        "_l", F.lit(None).cast(l_tagged.schema["_l"].dataType)
    )
    unioned = l_tagged.unionByName(r_tagged)
    # right rows sort before left rows at equal ts => "<=" semantics
    w = (
        Window.partitionBy("_k")
        .orderBy(
            F.col("_ts").asc(),
            F.col("_is_left").asc(),
            F.col("_r._rid").asc_nulls_last(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "_is_left", "_l",
        F.last("_r", ignorenulls=True).over(w).alias("_m"),
    )
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col("_m._rid").alias(f"matched_{right_id}"))
    out_cols.extend(
        F.col(f"_m.{c}").alias(f"matched_{c}") for c in right_payload
    )
    return carried.filter(F.col("_is_left") == 1).select(*out_cols)
