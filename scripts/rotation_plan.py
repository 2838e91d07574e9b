"""Mechanical rotation-window planner (round-12 verdict, "Next" #2).

Reads every CORRECTNESS_r*.json, computes each query's last FULLY-green
driver round (rows+schema+hash, no err — the same bar as
tests/test_registry_rotation.py), and emits three sets for the NEXT
round's graded window:

- **mandatory**: queries that BREACH the ≤6-round verdict-age invariant
  at the next round if not re-graded (next_round − last_green > 6).
  These MUST be in the committed window — `tests/test_contract.py::
  test_rotation_plan_mandatory_in_window` asserts it, so a displaced
  query (the w8/s28 case from round 12) can never again depend on a
  hand-written comment being remembered.
- **due**: queries reaching age 6 at the next round (they breach one
  round later). Grade as many as the window allows; the remainder must
  head the round-after window.
- **never_green**: registered queries with no fully-green verdict yet
  (new queries) — the rotation test already forces these into the
  window.

Run it as a script for the human-readable plan:

    python scripts/rotation_plan.py            # plan for newest+1
    python scripts/rotation_plan.py --round 14 # plan for a given round

Age model: a query graded green in round R has age N−R when the newest
CORRECTNESS file is round N. The invariant (test_registry_rotation.py::
test_verdict_age_bounded_or_in_window) tolerates age ≤6 for queries
outside the window; the planner therefore targets the round N+1 view,
where every last_green ≤ N−5 breaches.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:  # allow `python scripts/rotation_plan.py`
    sys.path.insert(0, REPO)
MAX_AGE = 6  # mirrors tests/test_registry_rotation.py


def last_green_rounds(repo: str = REPO) -> tuple[dict[str, int], int]:
    """(query -> newest fully-green round, newest round seen)."""
    last: dict[str, int] = {}
    newest = 0
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        newest = max(newest, rnd)
        with open(path) as fh:
            data = json.load(fh)
        for name, verdict in data.items():
            if (
                isinstance(verdict, dict)
                and verdict.get("rows_match")
                and verdict.get("schema_match")
                and verdict.get("hash_match")
                and verdict.get("err") is None
            ):
                last[name] = max(last.get(name, 0), rnd)
    return last, newest


def plan(next_round: int | None = None, repo: str = REPO) -> dict:
    """Compute the rotation obligation for `next_round` (default: the
    round after the newest CORRECTNESS file)."""
    last, newest = last_green_rounds(repo)
    if next_round is None:
        next_round = newest + 1

    from orc_release_hdp_2_6_5_99_1_tag_spark import catalog

    registered = set(catalog.queries()) | set(catalog.extra_queries())
    mandatory = sorted(
        n for n in registered
        if n in last and next_round - last[n] > MAX_AGE
    )
    due = sorted(
        n for n in registered
        if n in last and next_round - last[n] == MAX_AGE
    )
    never_green = sorted(n for n in registered if n not in last)
    # ages (and therefore propose_window's keep-warm fills) cover only
    # REGISTERED queries — a name retired from the catalog must not
    # reappear in proposals just because an old CORRECTNESS file
    # remembers it
    ages: dict[str, int] = {
        n: next_round - r for n, r in last.items() if n in registered
    }
    return {
        "next_round": next_round,
        "newest_correctness": newest,
        "mandatory": mandatory,
        "due": due,
        "never_green": never_green,
        "ages": ages,
        "window_size": catalog.GRADED_WINDOW,
    }


def propose_window(next_round: int | None = None, repo: str = REPO) -> list[str]:
    """A concrete ≤50-slot window proposal: flagship, never-green,
    mandatory, the due set, then keep-warm fills by OLDEST verdict
    first (the queries that would otherwise head the next round's due
    list). Deterministic — the builder reviews and commits it, the
    contract test only enforces the mandatory/never-green core."""
    from orc_release_hdp_2_6_5_99_1_tag_spark import catalog

    p = plan(next_round, repo)
    window: list[str] = ["q1_pricing_summary"]
    for tier in (p["never_green"], p["mandatory"], p["due"]):
        for n in tier:
            if n not in window and len(window) < p["window_size"]:
                window.append(n)
    ages = p["ages"]
    fills = sorted(
        (n for n in ages if n not in window),
        key=lambda n: (-ages[n], n),
    )
    for n in fills:
        if len(window) >= p["window_size"]:
            break
        window.append(n)
    return window


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--round", type=int, default=None,
                    help="round to plan for (default: newest+1)")
    ap.add_argument("--emit-window", action="store_true",
                    help="print a concrete 50-slot window proposal")
    args = ap.parse_args()
    p = plan(args.round)

    from orc_release_hdp_2_6_5_99_1_tag_spark import catalog

    window = set(catalog.queries())
    print(f"# rotation plan for round {p['next_round']} "
          f"(newest CORRECTNESS: r{p['newest_correctness']}, "
          f"window {p['window_size']} slots)")
    hist: dict[int, int] = {}
    for a in p["ages"].values():
        hist[a] = hist.get(a, 0) + 1
    print(f"age histogram: {dict(sorted(hist.items()))}")
    for label in ("never_green", "mandatory", "due"):
        names = p[label]
        missing = [n for n in names if n not in window]
        print(f"{label} ({len(names)}): {names or '—'}")
        if missing and label in ("never_green", "mandatory"):
            print(f"  !! NOT in the committed graded window: {missing}")
    free = p["window_size"] - len(
        set(p["mandatory"]) | set(p["never_green"]) | {"q1_pricing_summary"}
    )
    print(f"slots after flagship+mandatory+new: {free} "
          f"(fill from `due`, then keep-warm re-grades)")
    if args.emit_window:
        prop = propose_window(args.round)
        print(f"\nproposed window ({len(prop)}):")
        for n in prop:
            print(f"  {n}")


if __name__ == "__main__":
    main()
