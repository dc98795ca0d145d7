"""Plan-audit coverage guard.

``scripts/audit_registry.py`` sweeps every registered query's PHYSICAL
plan for scale-unsafe shapes (cartesians, unpartitioned data-sized
windows, row-at-a-time Python UDFs) and, on a clean run with
``--update-manifest``, records the swept names in
``tests/audit_manifest.json``.

This test closes the round-6 process hole (commit 08ed331 added two
queries without re-running the audit): any registry query ABSENT from
the audit manifest is plan-audited right here, against the same ALLOW
list.  In the steady state the un-manifested set is empty and the test
is instant; a commit that adds a query without re-running the sweep
pays the audit cost here and fails loudly on a finding.
"""

from __future__ import annotations

import json
import pathlib

from cassandra_join_library_spark import audit_plan
from cassandra_join_library_spark.registry import all_queries

SF_DIR = "/root/testdata/sf0.001"
MANIFEST = pathlib.Path(__file__).parent / "audit_manifest.json"


def test_new_queries_are_plan_audited(spark):
    import scripts.audit_registry as audit_script

    audited = set(json.loads(MANIFEST.read_text()))
    fresh = {n: fn for n, fn in all_queries().items() if n not in audited}
    failures = []
    for name, fn in fresh.items():
        findings = audit_plan(fn(spark, SF_DIR))
        bad = [
            k for k, hit in findings.items()
            if hit and name not in audit_script.ALLOW.get(k, {})
        ]
        if bad:
            failures.append((name, bad))
    assert not failures, (
        "queries added without a clean plan-audit sweep "
        f"(run scripts/audit_registry.py --update-manifest): {failures}"
    )
