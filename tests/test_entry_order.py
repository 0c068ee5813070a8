"""The driver checks the FIRST 50 keys of ``queries()`` each round, so
the catalog ordering is load-bearing: it must (a) drain the
never-driver-checked backlog and (b) periodically re-verify the stalest
previously-verified keys. These tests pin the two-pool interleave in
``__spark_entry__._window_order`` as a pure function, plus the live
catalog's window composition at HEAD.
"""

from __future__ import annotations

import importlib.util
from pathlib import Path

import pytest


@pytest.fixture(scope="module")
def entry_mod():
    spec = importlib.util.spec_from_file_location(
        "spark_entry_under_test",
        Path(__file__).resolve().parent.parent / "__spark_entry__.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_window_order_two_pool_interleave(entry_mod):
    keys = [f"k{i:03d}" for i in range(100)]
    # first 50 definition-order keys verified in descending-staleness
    # rounds 1..5; the rest never checked
    last = {f"k{i:03d}": 1 + (i % 5) for i in range(50)}
    order = entry_mod._window_order(keys, last)
    assert sorted(order) == sorted(keys)  # a permutation, nothing lost
    never_slots = entry_mod._NEVER_SLOTS
    stale_slots = entry_mod._STALE_SLOTS
    head = order[: never_slots + stale_slots]
    # slots 0..39: never-checked, in definition order
    assert head[:never_slots] == [f"k{i:03d}" for i in range(50, 50 + never_slots)]
    # slots 40..49: stalest verified keys (round 1), definition order
    assert all(last[k] == 1 for k in head[never_slots:])
    assert head[never_slots:] == sorted(head[never_slots:])


def test_window_order_fewer_never_than_slots(entry_mod):
    # once the backlog drains below _NEVER_SLOTS the window backfills
    # with stale keys rather than leaving slots idle
    keys = [f"k{i:02d}" for i in range(60)]
    last = {k: 2 for k in keys[:55]}  # only 5 never-checked
    order = entry_mod._window_order(keys, last)
    assert order[:5] == keys[55:]
    assert order[5:15] == keys[:10]
    assert sorted(order) == sorted(keys)


def test_live_window_composition(entry_mod):
    """At HEAD the 50-key driver window holds 40 never-checked keys and
    10 stale re-verifies, and oracle_sql() mirrors the key order."""
    merged, oracle_keys = {}, set()
    for mod in entry_mod._PLAN_MODULES:
        merged.update(mod.QUERIES)
        oracle_keys.update(mod.ORACLE)
    last = entry_mod._last_verified(oracle_keys)
    window = list(entry_mod.queries())[:50]
    never = [k for k in window if last.get(k, 0) == 0]
    stale = [k for k in window if last.get(k, 0) > 0]
    n_never_total = sum(1 for k in merged if last.get(k, 0) == 0)
    assert len(never) == min(entry_mod._NEVER_SLOTS, n_never_total)
    # the stale slots must hold exactly the |stale| LRV-stalest
    # checked keys — compare against the stable-sorted pool, NOT a
    # single-round membership test: the stalest round's pool will
    # drop below 10 keys as the rotation drains it (at HEAD round 3
    # holds exactly 12), after which a correct window legitimately
    # mixes rounds
    checked_lrv = [
        k
        for k in sorted(merged, key=lambda k: last.get(k, 0))
        if last.get(k, 0) > 0
    ]
    assert stale == checked_lrv[: len(stale)]
    oracles = list(entry_mod.oracle_sql())
    in_both = [k for k in entry_mod.queries() if k in set(oracles)]
    assert oracles == in_both
