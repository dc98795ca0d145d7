"""Background heavy-check sweep: overlap expensive deterministic
Spark computations with the sequential pytest wall.

The oracle-parity gate proved the shape (tests/conftest.py, r07): a
thread started at collection submits Spark jobs concurrently with the
main thread's sequential tests, and the suite wall absorbs it for
free (r11 measurement: the 133 s gate finishes 281 s before session
end — the SEQUENTIAL suite is the critical path).  This module
generalizes it to any test whose cost is one or more self-contained
Spark computations:

    from .background import heavy_check

    @heavy_check("kmeans_assign_base")
    def _kmeans_base(spark):
        ...                      # the expensive Spark-side work
        return payload           # plain python data

    def test_kmeans_deterministic(heavy_results):
        pa = heavy_results("kmeans_assign_base")   # join + assert
        assert ...

Rules for a compute function:
  - self-contained: takes only ``spark``, loads its own inputs
    (fixtures are main-thread objects; don't capture them);
  - deterministic: hypothesis/property tests stay sequential —
    example generation can't be precomputed;
  - returns plain data (dicts/lists/numbers), never a DataFrame —
    the payload crosses threads, the plan should not.

Exceptions raised by a compute function are re-raised in whichever
test consumes its payload (ThreadPoolExecutor future semantics), so
failures still land on the right test report.  Single-file runs pay
only for the entries their module registers (collection imports only
that module); sessions that collect no ``heavy_results`` consumer
never start the pool.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

#: name -> compute function (populated at test-module import time)
HEAVY: Dict[str, Callable[..., Any]] = {}


def heavy_check(name: str) -> Callable:
    """Register ``fn(spark) -> payload`` for the background sweep."""

    def register(fn: Callable[..., Any]) -> Callable[..., Any]:
        prev = HEAVY.get(name)
        if prev is not None and prev is not fn:
            raise ValueError(f"duplicate heavy check {name!r}")
        HEAVY[name] = fn
        return fn

    return register
