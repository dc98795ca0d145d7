"""Distributed (collect-free) parity gate for output-explosion queries.

The pandas gate (scripts/run_gate.py) collects both result sets; at
sf1 four queries' OUTPUTS are too large for a single-process collect
(theta_lt's 745M-row pair space, join_full's 60M rows, the two
interval joins) even though the engine handles them fine.  This gate
compares them without collecting: each engine reduces its own result
to one (row_count, md5-hash-sum) pair — see
``cassandra_join_library_spark.parity.distributed_compare`` — and the
scalars must match exactly.

Usage:
    python scripts/run_gate_distributed.py [--sf DIR] [--only a,b,c]

Defaults to the four sf1 collect-infeasible names at .scratch/sf1.
Honors SPARK_GRAFT_DUCK_MEM (DuckDB per-connection memory cap).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import traceback

sys.path.insert(0, ".")

DEFAULT_NAMES = ["theta_lt", "join_full", "interval_join_shipdate",
                 "interval_join_facade"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=".scratch/sf1")
    ap.add_argument("--only", default=None,
                    help="comma-separated query names")
    args = ap.parse_args()
    names = args.only.split(",") if args.only else DEFAULT_NAMES

    from cassandra_join_library_spark import get_spark
    from cassandra_join_library_spark.parity import distributed_compare

    spark = get_spark(app_name="gate-distributed")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    results, failures = [], {}
    for name in names:
        try:
            results.append(distributed_compare(spark, args.sf, name))
        except Exception:
            failures[name] = traceback.format_exc(limit=4)
    print(json.dumps({
        "gate_wall_seconds": round(time.time() - t0, 1),
        "sf_dir": args.sf,
        "n_queries": len(names),
        "n_failures": len(failures),
        "results": results,
        "failures": failures,
    }, indent=2))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
