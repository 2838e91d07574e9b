"""Mechanical rotation bookkeeping (round-7 verdict, "What's wrong" #1).

Two successive rounds shipped a hand-maintained "queries still missing
a driver verdict" shortlist that undercounted the real set (round 7:
9 claimed vs 14 actual — the five f1..f5 SARG leaves were graded in
round 1 but hash-mismatched, so they never earned a FULL green). This
test computes the never-fully-green set from the CORRECTNESS_r*.json
history and asserts the current graded window covers it, so the count
can never drift by hand again.
"""

from __future__ import annotations

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _ever_green() -> set[str]:
    """Queries with at least one FULLY green driver verdict.

    Fully green = rows_match AND schema_match AND hash_match AND no
    err — the same bar the round-7 judge applied. A rows-only or
    hash-mismatched grade does not count (that is exactly how f1..f5
    fell through the cracks).
    """
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        with open(path) as fh:
            data = json.load(fh)
        for name, verdict in data.items():
            if not isinstance(verdict, dict):
                continue
            if (
                verdict.get("rows_match")
                and verdict.get("schema_match")
                and verdict.get("hash_match")
                and verdict.get("err") is None
            ):
                green.add(name)
    return green


def test_correctness_history_exists():
    assert glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")), (
        "no CORRECTNESS_r*.json history found — the rotation invariant "
        "cannot be checked"
    )


def test_graded_window_covers_never_green_set():
    from orc_release_hdp_2_6_5_99_1_tag_spark import catalog

    graded = set(catalog.queries())
    extras = set(catalog.extra_queries())
    never_green = (graded | extras) - _ever_green()
    stranded = never_green - graded
    assert not stranded, (
        f"{len(stranded)} queries have never earned a full "
        f"rows+schema+hash driver verdict but are NOT in the current "
        f"graded window, so they can never earn one: {sorted(stranded)}"
    )


def test_registry_shape():
    from orc_release_hdp_2_6_5_99_1_tag_spark import catalog

    graded = catalog.queries()
    extras = catalog.extra_queries()
    assert len(graded) <= catalog.GRADED_WINDOW
    assert not set(graded) & set(extras), "graded/extras overlap"
    # every graded query must have an oracle: a rows-only grade is a
    # weaker verdict and should be a deliberate choice, not an omission
    osql = catalog.oracle_sql()
    missing = [n for n in graded if n not in osql]
    assert not missing, f"graded queries without oracle SQL: {missing}"


def test_extras_all_have_oracles():
    from orc_release_hdp_2_6_5_99_1_tag_spark import catalog

    extras = catalog.extra_queries()
    osql = catalog.extra_oracle_sql()
    missing = [n for n in extras if n not in osql]
    assert not missing, f"extra queries without oracle SQL: {missing}"


def test_verdict_age_bounded_or_in_window():
    """No registered query's driver verdict may silently age out: any
    query whose last FULLY-green verdict is more than 6 rounds older
    than the newest CORRECTNESS file must be IN the current graded
    window (i.e. being re-graded this round). Added after a mid-round-
    10 age scan found q2_correlated_subquery at age 8 — the round-9
    stale sweep listed only the r1-era set, so a lone r2-era verdict
    slipped through every hand-built rotation list."""
    import re

    from orc_release_hdp_2_6_5_99_1_tag_spark import catalog

    last_green: dict[str, int] = {}
    newest = 0
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
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
                last_green[name] = max(last_green.get(name, 0), rnd)

    graded = set(catalog.queries())
    extras = set(catalog.extra_queries())
    # deliberately retired names (renamed/superseded queries whose
    # history should no longer bind) — empty today; additions need a
    # written rationale here
    retired: set[str] = set()
    overdue = sorted(
        name
        for name, rnd in last_green.items()
        if name not in graded
        and name not in retired
        and newest - rnd > 6
    )
    assert not overdue, (
        f"{len(overdue)} green-verdicted queries aged past 6 rounds "
        f"without re-grading: {overdue} — rotate them into the graded "
        "window (or retire them with a rationale)"
    )
    # a green-verdicted query must never vanish from the registry
    # silently — that is the same aging hole through deletion
    missing = sorted(
        name for name in last_green
        if name not in graded and name not in extras and name not in retired
    )
    assert not missing, (
        f"queries with driver verdicts dropped from the registry "
        f"entirely: {missing}"
    )
