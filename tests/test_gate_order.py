"""Pins the round-12 LRU rotation of the driver re-verification tier.

The driver's correctness gate truncates at ~50 rows per round; the slots left
after the current round's new queries re-verify prior greens. Round-11 judge
finding: in registration order the same ~22 early-registered relational rows
burned re-green slots in both r10 and r11 while 105 queries sat last
driver-verified in rounds 1-3. Tier 3 now orders by last-green round
ascending (queries/_last_green.py, regenerated per round by
tools/gen_last_green.py) so the stalest evidence refreshes first.
"""

from __future__ import annotations

import importlib.util
import os

from flink_1_12_0_src_spark.queries import (
    _DRIVER_GREEN,
    _NO_ORACLE_LAST,
    CURRENT_FIXED_FIRST,
    CURRENT_NEW,
    load_all,
)
from flink_1_12_0_src_spark.queries._last_green import LAST_GREEN, ORACLE_SHA

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_gen_tool():
    path = os.path.join(ROOT, "tools", "gen_last_green.py")
    spec = importlib.util.spec_from_file_location("gen_last_green", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_last_green_matches_artifacts():
    """The embedded map is exactly what tools/gen_last_green.py derives from
    the CORRECTNESS_r*.json history on disk — a stale module (fold done,
    regen forgotten) fails here, not in the driver."""
    mod = _load_gen_tool()
    assert LAST_GREEN == mod.build_map(ROOT)


def test_last_green_covers_green_union():
    """Every gate-green query has a last-green round; nothing else does."""
    assert set(LAST_GREEN) == set(_DRIVER_GREEN)


def test_tier3_is_staleness_sorted():
    """In load_all() order, the re-verification tier (after fixed-first and
    CURRENT_NEW, before the no-oracle trio) is sorted by last-green round
    ascending — the LRU rotation itself."""
    names = list(load_all())
    front = list(CURRENT_FIXED_FIRST) + list(CURRENT_NEW)
    tier3 = [
        n for n in names[len(front):]
        if n in _DRIVER_GREEN and n not in _NO_ORACLE_LAST and n not in front
    ]
    rounds = [LAST_GREEN[n] for n in tier3]
    assert rounds == sorted(rounds), "tier 3 must re-verify stalest greens first"


def test_oracle_change_requires_representation():
    """A green query whose registered oracle text changed since its LAST_GREEN
    round must be re-presented in CURRENT_NEW — otherwise the LRU tier would
    treat stale-semantics evidence as fresh (the coupled-DoReMi rule from
    round 12, made mechanical per the r12 ADVICE). ORACLE_SHA is stamped at
    regen time (= fold time, right after the driver verified those exact
    semantics); any later whitespace-insensitive edit trips this test unless
    the query is listed for a fresh driver row."""
    mod = _load_gen_tool()
    registry = load_all()
    changed = [
        name
        for name, stamped in ORACLE_SHA.items()
        if name in registry
        and mod.oracle_sha(registry[name].oracle) != stamped
        and name not in CURRENT_NEW
    ]
    assert not changed, (
        "oracle semantics changed without re-presentation (add to CURRENT_NEW "
        f"or revert): {changed}"
    )


def test_window_regreens_come_from_stale_cohort():
    """The ~50-slot window's re-green slots all come from the stalest
    last-green cohort (round-11 verdict task #2, made round-agnostic in
    round 14 once the rotation had advanced past the original r<=3
    hard-code). The boundary round is derived: the smallest R such that
    the queries with LAST_GREEN <= R fill every re-green slot."""
    names = list(load_all())
    front = list(CURRENT_FIXED_FIRST) + list(CURRENT_NEW)
    slots = 50 - len(front)
    window_regreens = [n for n in names[len(front):50] if n in _DRIVER_GREEN]
    boundary = min(
        r
        for r in sorted(set(LAST_GREEN.values()))
        if sum(1 for rr in LAST_GREEN.values() if rr <= r) >= slots
    )
    stale = {n for n, r in LAST_GREEN.items() if r <= boundary}
    assert len(stale) >= slots
    assert set(window_regreens) <= stale, [
        (n, LAST_GREEN[n]) for n in window_regreens if n not in stale
    ]
