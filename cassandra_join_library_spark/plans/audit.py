"""Plan auditing: flag scale-unsafe physical-plan shapes before a job
runs at 100 TB.

The checks the engine's own plan tests enforce (no cartesian products,
no unpartitioned data-sized windows, filters pushed to the scan),
promoted to a user-facing utility: audit a DataFrame's PHYSICAL plan —
after Catalyst has locked in join strategies and window placement — and
get back a findings dict, or fail fast with ``assert_scale_safe``
before submitting a cluster-sized job.

A finding is a SMELL, not always a bug: a 1-row broadcast side makes a
nested-loop join fine (the engine's own BM25 stats join is one), and a
window over per-partition counts is bounded by cluster size, not data.
``allow`` exists for exactly those audited exceptions.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame

#: finding key -> human explanation (also the canonical catalogue of
#: what the auditor looks for)
CHECKS = {
    "cartesian_product": (
        "CartesianProduct in the plan — O(|L|*|R|) row pairs; at scale "
        "this never finishes.  Rewrite as an equi-join on a derived key "
        "(blocking / bucketing / posting lists)."
    ),
    "nested_loop_join": (
        "BroadcastNestedLoopJoin — fine for a tiny broadcast side "
        "(scalar stats, literal tables), quadratic otherwise.  Verify "
        "the broadcast side is constant-size."
    ),
    "unpartitioned_window": (
        "A window function with no PARTITION BY — the whole dataset "
        "sorts through ONE task.  Re-key the window, or use the "
        "two-level prefix-sum / range-bucket patterns."
    ),
    "python_udf": (
        "Row-at-a-time Python UDF (BatchEvalPython) — serializes every "
        "row through the Python worker.  Use built-in functions or an "
        "Arrow-batched Pandas UDF."
    ),
}


def _physical_plan(df: DataFrame) -> str:
    try:
        return df._jdf.queryExecution().executedPlan().toString()
    except Exception:
        # Spark Connect sessions have no _jdf JVM handle — fall back to
        # the public explain output (same operator names the matchers
        # scan for; captures stdout, the only public plan channel)
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="extended")
        return buf.getvalue()


def _window_is_unpartitioned(line: str) -> bool:
    """A window spec renders as ``windowspecdefinition(<partition
    cols>, <sort cols ASC/DESC ...>, specifiedwindowframe(...))`` with
    either group possibly empty — a spec is UNPARTITIONED when no arg
    before the frame lacks a sort direction.  (Counting ``], [``
    separators conflates partitioned-unordered with
    unpartitioned-ordered specs.)  Heuristic: partition expressions
    containing literal commas can over-split, which errs toward NOT
    flagging — acceptable for a smell detector."""
    import re

    m = re.search(r"windowspecdefinition\((.*?)specifiedwindowframe", line)
    if not m:
        return False
    args = [a.strip() for a in m.group(1).rstrip(", ").split(",") if a.strip()]
    partition_cols = [
        a for a in args if " ASC" not in a and " DESC" not in a
    ]
    return not partition_cols


def audit_plan(df: DataFrame) -> "dict[str, bool]":
    """Inspect the physical plan; return {check_name: triggered}."""
    plan = _physical_plan(df)
    unpartitioned = any(
        _window_is_unpartitioned(line)
        for line in plan.splitlines()
        if "windowspecdefinition" in line
    )
    return {
        "cartesian_product": "CartesianProduct" in plan,
        "nested_loop_join": "BroadcastNestedLoopJoin" in plan,
        "unpartitioned_window": unpartitioned,
        "python_udf": "BatchEvalPython" in plan,
    }


def assert_scale_safe(
    df: DataFrame, allow: "Iterable[str]" = ()
) -> "dict[str, bool]":
    """Raise if the plan triggers any non-allowed finding.

    ``allow`` lists findings reviewed and accepted for this plan (e.g.
    ``{"nested_loop_join"}`` for a 1-row broadcast stats join).
    Returns the full findings dict on success so callers can log it.
    """
    allow = set(allow)
    unknown = allow - set(CHECKS)
    if unknown:
        raise ValueError(f"unknown allow entries: {sorted(unknown)}")
    findings = audit_plan(df)
    bad = [k for k, hit in findings.items() if hit and k not in allow]
    if bad:
        detail = "\n".join(f"- {k}: {CHECKS[k]}" for k in bad)
        raise AssertionError(
            f"plan is not scale-safe ({', '.join(bad)}):\n{detail}"
        )
    return findings
