"""Pins for bench.py's driver-contract emission (r13 verdict asks
#3/#4): the stdout line must stay inside the driver's ~2000-char tail
window (the r13 parsed:null failure mode), carry the conditions
stamp, and the drift cohort must recover timings from a truncated
prior record without poisoning itself with fresh-JVM isolated
numbers or a wrong scale factor.

Pure-Python: no SparkSession — these run in milliseconds."""

from __future__ import annotations

import contextlib
import importlib.util
import io
import json
import pathlib

import pytest

REPO = pathlib.Path(__file__).parent.parent


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench_module", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _capture_emit(bench, out):
    buf, err = io.StringIO(), io.StringIO()
    with contextlib.redirect_stdout(buf), contextlib.redirect_stderr(err):
        bench._emit(out)
    lines = buf.getvalue().strip().splitlines()
    return lines, err.getvalue()


def test_emit_single_parseable_line_with_conditions(bench):
    out = {"metric": "headline_suite_seconds", "value": 1.0,
           "unit": "sec", "queries": {"q": 1.0}, "sf": 0.1,
           "conditions": {"load1": 1.0}}
    lines, err = _capture_emit(bench, dict(out))
    assert len(lines) == 1
    parsed = json.loads(lines[0])
    assert parsed["conditions"] == {"load1": 1.0}
    assert len(lines[0]) <= 1900 and not err


def test_emit_demotes_conditions_before_truncation(bench):
    """Over budget: conditions go to stderr, the contract fields stay
    on ONE stdout line that still parses — never a truncated record."""
    out = {"metric": "m", "value": 1.0, "unit": "sec",
           "queries": {f"query_name_{i:03d}": 1.234 for i in range(80)},
           "sf": 0.1, "conditions": {"load1": 1.0, "mem_avail_gb": 99.9}}
    lines, err = _capture_emit(bench, dict(out))
    assert len(lines) == 1
    parsed = json.loads(lines[0])
    assert "conditions" not in parsed
    assert len(parsed["queries"]) == 80  # contract fields intact
    assert json.loads(err.strip().splitlines()[0])["conditions"][
        "mem_avail_gb"] == 99.9


def test_emit_current_headline_fits_budget(bench):
    """The REAL headline suite (worst-case name lengths, realistic
    values + conditions) must fit the budget with room — if this
    fails, shrink HEADLINE or move fields before the driver records
    another parsed:null."""
    out = {"metric": "headline_suite_seconds", "value": 123.456,
           "unit": "sec",
           "queries": {name: 99.999 for name in bench.HEADLINE},
           "sf": 0.1,
           "conditions": {"load1": 99.99, "mem_avail_gb": 999.9,
                          "other_jvms": 99, "load1_end": 99.99}}
    line = json.dumps(out, separators=(",", ":"))
    assert len(line) <= 1900, (
        f"headline stdout line {len(line)} chars — over the driver "
        f"tail budget; shrink HEADLINE or demote fields"
    )
    # headroom pin (r14 verdict ask #3): the line must still fit after
    # the headline grows to 60 queries at worst-case wave-name length
    # (~26-char names like corpus_contamination_bloom => ~35 chars per
    # entry).  Values use 9.999 — realistic, not 99.999: no headline
    # query has ever exceeded 10 s at sf0.1 (max 3.7 s), and a >10 s
    # query would be kept out of the suite for dominating it anyway
    # (the graph_triangle_count precedent).  When this fails, rotate
    # the oldest LLM-pipeline members into TIER2 before the driver
    # records another parsed:null.
    realistic = dict(out, queries={n: 9.999 for n in bench.HEADLINE})
    base = len(json.dumps(realistic, separators=(",", ":")))
    projected = base + (60 - len(bench.HEADLINE)) * 35
    assert projected < 1900, (
        f"projected stdout line at 60 headline queries is {projected} "
        f"chars — rotate members into bench.TIER2 now"
    )


def test_tier2_disjoint_and_registered(bench):
    """TIER2 members left the headline, didn't vanish: disjoint from
    HEADLINE, no duplicates, and every name still registered (so
    SPARK_GRAFT_TIER2=1 / SPARK_GRAFT_ONLY can run them)."""
    from cassandra_join_library_spark.registry import all_queries

    assert not set(bench.TIER2) & set(bench.HEADLINE)
    assert len(set(bench.TIER2)) == len(bench.TIER2)
    qs = all_queries()
    missing = [n for n in bench.TIER2 + bench.HEADLINE if n not in qs]
    assert not missing, f"bench names not in registry: {missing}"


def test_drift_cohort_recovers_truncated_record(bench, tmp_path,
                                                monkeypatch):
    """A driver record with parsed:null (the r13 shape) still feeds
    the cohort: timings regex-recovered from the tail, wrapper sf
    respected, isolated_fresh_jvm suffix dropped."""
    rec = {
        "n": 99, "rc": 0, "sf": 0.1, "parsed": None,
        # trailing newline is the REAL r13 shape (the record ends with
        # its own newline) — a bare rsplit('\n') fallback would
        # recover an empty string and zero timings
        "tail": ('ric": "headline_suite_seconds", "value": 9.9, '
                 '"queries": {"alpha": 1.0, "beta": 2.0}, "sf": 0.1, '
                 '"isolated_fresh_jvm": {"alpha": 7.0}\n'),
    }
    (tmp_path / "BENCH_r99.json").write_text(json.dumps(rec))
    # module-level constant, NOT bench.os.path.dirname — that is the
    # process-global os.path module, and patching it would silently
    # rewrite dirname for everything else during the test
    monkeypatch.setattr(bench, "_BENCH_DIR", str(tmp_path))
    # beta moved 2.0 -> 0.5 (down), alpha 1.0 -> 1.5 (up): both are
    # movers; the isolated 7.0 for alpha must NOT be the baseline
    # (it would flag alpha as a huge downward mover instead)
    cohort = bench._drift_cohort({"alpha": 1.5, "beta": 0.5}, 0.1)
    assert "alpha" in cohort and "beta" in cohort
    # upward mover outranks downward in the capped ordering
    assert cohort.index("alpha") < cohort.index("beta")
    # wrong current sf -> cross-sf guard holds (legacy two only)
    assert bench._drift_cohort({"alpha": 99.0}, 0.01) == [
        "join_composite", "bloom_prefilter_join"]


def test_drift_cohort_skips_leading_stderr_detail(bench, tmp_path,
                                                  monkeypatch):
    """The r14-shape tail: the stderr drift-detail line (leading with
    isolated_fresh_jvm numbers) precedes the stdout record.  Recovery
    must take the substring after the LAST '\"metric\":' — splitting at
    the FIRST isolated_fresh_jvm key would discard the real queries
    fragment and regex-recover the isolated numbers as baselines."""
    rec = {
        "n": 99, "rc": 0, "sf": 0.1, "parsed": None,
        "tail": ('{"drift_cohort": ["alpha"], "isolated_fresh_jvm": '
                 '{"alpha": 7.0}, "suite_at_time": {"alpha": 6.5}, '
                 '"cohort_truncated": false}\n'
                 '{"metric":"headline_suite_seconds","value":9.9,'
                 '"queries":{"alpha":1.0,"beta":2.0},"sf":0.1}'),
    }
    (tmp_path / "BENCH_r99.json").write_text(json.dumps(rec))
    monkeypatch.setattr(bench, "_BENCH_DIR", str(tmp_path))
    # with the 7.0/6.5 stderr numbers as baseline, alpha 1.4 would be
    # a huge DOWNWARD mover; against the true 1.0 it is an upward one
    cohort = bench._drift_cohort({"alpha": 1.4, "beta": 2.0}, 0.1)
    assert "alpha" in cohort and "beta" not in cohort


def test_tier2_env_parsing(bench):
    """Only allowlisted affirmative values flip the suite to TIER2;
    everything else — including 'off', typos, and arbitrary strings —
    means headline mode (r15 ADVICE: the old falsy-blocklist treated
    'off' and 'anything' as ON)."""
    for off in (None, "", "0", "false", "False", "no", "off", "OFF",
                "anything", "disable"):
        assert not bench._tier2_enabled(off), off
    for on in ("1", "true", "TRUE", "yes", "on", "ON"):
        assert bench._tier2_enabled(on), on


def test_isolated_path_sf_pin(bench, tmp_path, monkeypatch):
    """Only the canonical sf0.1 run may target the committed repo-root
    BENCH_ISOLATED_LAST.json; any other sf is diverted to .scratch/ so
    iteration runs can't clobber the reference (r15 verdict ask #5)."""
    monkeypatch.setattr(bench, "_BENCH_DIR", str(tmp_path))
    assert bench._isolated_path(0.1) == str(
        tmp_path / "BENCH_ISOLATED_LAST.json")
    for sf in (0.01, 0.001, 1.0, -1.0):
        p = bench._isolated_path(sf)
        assert p == str(tmp_path / ".scratch" / "BENCH_ISOLATED_LAST.json")
    assert (tmp_path / ".scratch").is_dir()


def test_bench_conditions_keys(bench):
    cond = bench._bench_conditions()
    assert set(cond) == {"load1", "mem_avail_gb", "other_jvms"}
    assert cond["other_jvms"] >= 0
