"""Edit-distance join: exactness vs brute force (incl. indels and
short strings), and plan shape (no cartesian on the main path)."""

from __future__ import annotations

import random

from pyspark.sql import Row
from pyspark.sql import functions as F

from cassandra_join_library_spark.operators.edjoin import edit_distance_pairs
from cassandra_join_library_spark.sources.catalog import local_frame


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(rows, d):
    out = set()
    for i, (ia, sa) in enumerate(rows):
        for ib, sb in rows[i + 1:]:
            dist = _lev(sa, sb)
            if dist <= d:
                out.add((min(ia, ib), max(ia, ib), dist))
    return out


def _run(spark, rows, d):
    df = local_frame(spark, [Row(id=i, s=s) for i, s in rows])
    got = {(r["key_a"], r["key_b"], r["edit_dist"])
           for r in edit_distance_pairs(df, "id", "s", max_dist=d).collect()}
    assert got == _brute(rows, d)


def test_edjoin_exact_random_corpus(spark):
    """Random mutated strings: substitutions, inserts, deletes, dups —
    the blocked join must equal brute force exactly."""
    rng = random.Random(7)
    alphabet = "abcde"
    bases = ["".join(rng.choice(alphabet) for _ in range(rng.randint(4, 12)))
             for _ in range(12)]
    rows = []
    rid = 0
    for base in bases:
        for _ in range(3):
            s = list(base)
            for _ in range(rng.randint(0, 3)):
                op = rng.choice("sid")
                pos = rng.randrange(len(s) + (op == "i")) if s or op == "i" else 0
                if op == "s" and s:
                    s[pos] = rng.choice(alphabet)
                elif op == "i":
                    s.insert(pos, rng.choice(alphabet))
                elif s:
                    del s[pos]
            rows.append((rid, "".join(s) or "a"))
            rid += 1
    _run(spark, rows, d=2)


def test_edjoin_short_strings_and_duplicates(spark):
    """Strings shorter than d+1 segments (the cross-join residue) and
    identical-string groups (distance-0 fast path)."""
    rows = [(0, "a"), (1, "b"), (2, "ab"), (3, "ab"), (4, "abc"),
            (5, "xyzzy"), (6, "xyzzy"), (7, "zzzzzzzz")]
    _run(spark, rows, d=2)
    _run(spark, rows, d=1)


def test_edjoin_plan_has_no_cartesian(spark):
    """Main path (all strings >= d+1 chars): candidate generation is an
    equi-join on (length, segment, text) — no BNLJ/cartesian node."""
    df = local_frame(spark, 
        [Row(id=i, s=f"token{i % 37:04d}") for i in range(200)])
    out = edit_distance_pairs(df, "id", "s", max_dist=2)
    plan = out._jdf.queryExecution().executedPlan().toString().lower()
    assert "cartesianproduct" not in plan
    assert "broadcastnestedloop" not in plan
