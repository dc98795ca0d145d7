"""Compute the round-N grading front from the correctness ledger.

Codifies the rotation policy the registry docstrings state in prose,
so the next round's `_ROUND{N}_FRONT` is a mechanical read-out rather
than a hand ledger walk (the policy must outlive context cuts):

1. NEVER-GRADED oracled queries first — no green row in any
   CORRECTNESS_r*.json before round N — in registration order.
   First evidence outranks re-evidence.
2. Then oldest-graded-first re-grades: ascending latest-green round,
   tie-broken by BANKED-LIST order (the order names appear across
   `_ROUND*_FRONT` / `_BANKED_ROUND6`, which is this repo's
   "registration order" convention for graded cohorts), raw
   registration order for names in no banked list.
3. Window holds 50; only oracled names are eligible (rows-only
   queries never occupy gradable slots).

Usage:
    PYTHONPATH=. python scripts/compute_front.py --round 15
prints the 50 names (one per line, with their latest-green round) —
paste into `_ROUND15_FRONT` and update the `_reorder`/test pins.

``--round N`` uses only CORRECTNESS files from rounds < N, so
re-running for a PAST round reproduces that round's front verbatim
(pinned by tests/test_executor.py::test_front_matches_policy).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re


def compute_front(round_n: int, window: int = 50,
                  exclude: "frozenset[str]" = frozenset()) -> "list[tuple]":
    """Return [(name, latest_green_round_or_None), ...] of length
    ``window`` for the given round's grading front.

    Run this AT LOCK TIME — the first act of a round, before any new
    wave registers — so the never-graded pool is exactly the prior
    round's post-lock additions.  When re-verifying a PAST round's
    front from a later registry state, pass the names registered
    after that round's lock via ``exclude`` (they were not visible to
    the lock)."""
    import cassandra_join_library_spark.registry as R

    # registration order = import order BEFORE the rotation reorder.
    # _load_all applies _reorder, which permutes _QUERIES — so the raw
    # order is recorded separately in register() (_REG_ORDER) before
    # the permutation.  Reading list(_QUERIES) here would be circular
    # for the never-graded segment: a permuted hand-edit of the very
    # _ROUND{N}_FRONT being verified would reproduce itself and the
    # pin test would pass vacuously.
    R._load_all()
    reg_order = list(R._REG_ORDER)
    oracled = set(R._ORACLES)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: "dict[str, int]" = {}
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        if rnd >= round_n:
            continue  # the round being planned can't see its own grades
        for name, rec in json.load(open(f)).items():
            green = (rec.get("rows_match") and rec.get("schema_match")
                     and rec.get("hash_match") in (True, None)
                     and not rec.get("err"))
            if green:
                latest[name] = max(latest.get(name, 0), rnd)

    # banked-list position = graded-cohort tie-break; highest round
    # first so the most recent statement of an order wins (names
    # repeat across lists; first-seen below keeps the newest).
    # Lists for round_n or later are EXCLUDED — including the round's
    # own front would make the derivation self-fulfilling (a permuted
    # hand-edit of _ROUND{N}_FRONT would reproduce itself and the pin
    # test would pass vacuously)
    rounds = sorted(
        (int(m.group(1)), a) for a in dir(R)
        if (m := re.fullmatch(r"_ROUND(\d+)_FRONT", a))
        and int(m.group(1)) < round_n)
    banked_lists = [getattr(R, a) for _, a in reversed(rounds)]
    banked_lists.append(R._BANKED_ROUND6)
    pos: "dict[str, int]" = {}
    i = 0
    for lst in banked_lists:
        for n in lst:
            if n not in pos:
                pos[n] = i
                i += 1
    base = i
    order = {n: pos.get(n, base + j) for j, n in enumerate(reg_order)}

    never = [n for n in reg_order
             if n in oracled and n not in latest and n not in exclude]
    graded = sorted(
        (n for n in reg_order
         if n in oracled and n in latest and n not in exclude),
        key=lambda n: (latest[n], order[n]))
    names = (never + graded)[:window]
    return [(n, latest.get(n)) for n in names]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--round", type=int, required=True)
    p.add_argument("--window", type=int, default=50)
    p.add_argument("--exclude", default="",
                   help="comma-separated post-lock names (retro runs)")
    args = p.parse_args()
    excl = frozenset(n for n in args.exclude.split(",") if n)
    for name, rnd in compute_front(args.round, args.window, excl):
        print(f"{name}  # {'never graded' if rnd is None else f'r{rnd:02d}'}")


if __name__ == "__main__":
    main()
