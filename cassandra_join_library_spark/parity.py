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

#: the driver's pre-registered table universe — single definition,
#: imported by tests/conftest.py and used by run_parity_gate, so the
#: two harnesses can never see different schemas
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


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


def run_parity_gate(spark, sf_dir: str, names=None, workers: int = 6):
    """Run every (or the named) oracled query's Spark vs DuckDB
    comparison from a thread pool and return ``(timings, failures)``
    dicts — ``failures`` maps query name to a formatted traceback.

    One engine for both gates: ``scripts/run_gate.py`` (pre-commit)
    and ``tests/test_oracle_parity.py`` (CI) call this same function,
    so coverage and "equal" can never drift between them.  Spark
    serves concurrent jobs from multiple driver threads; at sf0.01
    most queries leave most cores idle, so ~6 workers collapse the
    ~6-minute sequential sweep to roughly its longest critical path.
    DuckDB gets one connection per worker thread."""
    import threading
    import time
    import traceback
    from concurrent.futures import ThreadPoolExecutor

    import duckdb

    from .registry import all_oracles, all_queries

    tables = TABLES
    queries, oracles = all_queries(), all_oracles()
    if names is None:
        names = sorted(oracles)

    tl = threading.local()

    def duck():
        if not hasattr(tl, "con"):
            import os

            con = duckdb.connect()
            # unbounded DuckDB defaults to ~80% of box RAM PER
            # connection; the sf1 graph twins drove one worker to
            # 102 GB RSS and the kernel OOM-killed the whole gate.
            # Opt-in cap (spills to temp instead of dying):
            mem = os.environ.get("SPARK_GRAFT_DUCK_MEM")
            if mem:
                con.execute(f"SET memory_limit='{mem}'")
                con.execute("SET temp_directory='/tmp/duck_spill'")
            for t in tables:
                src = f"{sf_dir}/{t}.parquet"
                if os.path.isdir(src):
                    # Spark-written table: a directory of part files
                    # (the driver testdata ships single files) — lets
                    # the gate sweep .scratch/sf1-style scaled sets
                    src = f"{src}/*.parquet"
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM '{src}'"
                )
            tl.con = con
        return tl.con

    timings, failures = {}, {}
    lock = threading.Lock()

    def run(name: str) -> None:
        t0 = time.time()
        try:
            spark_pdf = queries[name](spark, sf_dir).toPandas()
            duck_pdf = duck().execute(oracles[name]).df()
            compare(spark_pdf, duck_pdf, name)
            err = None
        except Exception:
            err = traceback.format_exc(limit=4)
        dt = time.time() - t0
        with lock:
            timings[name] = round(dt, 2)
            if err:
                failures[name] = err

    with ThreadPoolExecutor(max_workers=workers) as pool:
        list(pool.map(run, names))
    return timings, failures


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
            # "exact" = bit-exact OR within 2 ulp.  The ulp allowance
            # exists for ONE documented reason (SCALE.md round-12
            # sf1 sweep): DuckDB's DECIMAL -> DOUBLE cast is
            # double-rounded (int64 -> double, then /10^scale), so
            # once a money sum's scaled integer exceeds 2^53 its last
            # ulp disagrees with Spark's correctly-rounded
            # BigDecimal.doubleValue().  An ulp at the 17th
            # significant digit carries no decimal information; both
            # real float bugs this gate has caught (1e-6 mean shifts,
            # +2 ppm integer drifts) sit orders of magnitude above it.
            ok = [
                (math.isnan(x) and math.isnan(y))
                or x == y
                or abs(x - y) <= 2 * math.ulp(max(abs(x), abs(y)))
                for x, y in zip(a[c].fillna(float("nan")), b[c].fillna(float("nan")))
            ]
            assert all(ok), f"{name}: float column {c!r} differs (exact compare)"
        else:
            pd.testing.assert_series_equal(
                a[c], b[c], check_names=False, check_dtype=False,
                obj=f"{name}.{c}",
            )
