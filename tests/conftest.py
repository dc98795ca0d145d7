from __future__ import annotations

import duckdb
import pytest

from cassandra_join_library_spark import get_spark
from cassandra_join_library_spark.parity import TABLES

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", shuffle_partitions=8)
    yield s


#: background oracle-parity gate: started at COLLECTION time when the
#: session includes any test that consumes ``gate_results``, so its
#: ~1-2 minute sweep overlaps the rest of the suite's wall instead of
#: serializing after it (r07 verdict ask #3: keep full pytest under
#: 6 minutes as the registry grows).  Holds either
#: {"thread", "result"|"error"} or stays empty for sessions that never
#: collect a parity test (single-file runs pay nothing).
GATE_STATE: dict = {}


def pytest_collection_modifyitems(session, config, items):
    if GATE_STATE or not any(
        "gate_results" in getattr(i, "fixturenames", ())
        for i in items
    ):
        return
    import threading

    from cassandra_join_library_spark.parity import run_parity_gate

    s = get_spark(app_name="tests", shuffle_partitions=8)

    def run():
        try:
            GATE_STATE["result"] = run_parity_gate(
                s, SF_ORACLE, workers=6)
        except BaseException as exc:  # noqa: BLE001 - surfaced by fixture
            GATE_STATE["error"] = exc

    t = threading.Thread(target=run, name="parity-gate", daemon=True)
    GATE_STATE["thread"] = t
    t.start()


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the same views the driver pre-registers."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_ORACLE}/{t}.parquet'"
        )
    yield con
    con.close()
