"""Registry recheck-queue invariants: these need NO fixtures (they
only read the registry and the repo's CORRECTNESS_r*.json), so they
live outside test_nonvacuous.py's sf0.01 skipif — the driver-budget
gate must run on EVERY checkout, or an oversized _RECHECK_SINCE edit
would silently push names out of a round's CORRECTNESS evidence.
"""

from __future__ import annotations

from ripple_server_spark.plans.registry import SPECS


def test_driver_budget_covers_every_unverified_query():
    """The driver checks at most 50 queries per round, in queries()
    dict order. The registry sorts never-verified + active-recheck
    names first and caps their combined count at the budget — an
    oversized queue would push names out of the round's CORRECTNESS
    evidence without any local failure."""
    from ripple_server_spark.plans.registry import (
        _DRIVER_BUDGET,
        _RECHECK_SINCE,
        _active_recheck,
        _driver_verified_names,
        _ordered_names,
    )

    stale = set(_RECHECK_SINCE) - set(SPECS)
    assert not stale, f"recheck names not in the registry: {stale}"
    unverified = set(SPECS) - (_driver_verified_names() - _active_recheck())
    assert len(unverified) <= _DRIVER_BUDGET, (
        f"{len(unverified)} unverified/recheck queries exceed the "
        f"driver's {_DRIVER_BUDGET}-query budget"
    )
    order = _ordered_names()
    assert set(order[: len(unverified)]) == unverified


def test_recheck_queue_expires_and_defers_by_green_round():
    """The recheck queue is self-maintaining: a name queued at round R
    expires on any green row from a round > R (no manual removal — a
    forgotten removal used to re-burn the next round's whole budget),
    and names queued for a future pass defer while earlier passes fill
    the budget, strictly oldest-since first."""
    from ripple_server_spark.plans.registry import (
        _RECHECK_SINCE,
        _active_recheck,
        _green_rounds,
    )

    greens = _green_rounds()
    active = _active_recheck()
    queued = {n for n, s in _RECHECK_SINCE.items() if n in SPECS}
    for n in queued:
        if n in greens and greens[n] > _RECHECK_SINCE[n]:
            assert n not in active, f"{n} green at r{greens[n]} but still queued"
    # activation is monotone in `since`: no deferred name may have an
    # older since than an active one
    pend = [n for n in queued if n in greens and greens[n] <= _RECHECK_SINCE[n]]
    deferred = set(pend) - active
    if deferred and active:
        assert min(_RECHECK_SINCE[n] for n in deferred) >= max(
            _RECHECK_SINCE[n] for n in active
        )


def test_recheck_next_round_transition_simulated(monkeypatch):
    """Simulate the driver landing a green row for every currently
    active recheck name: the actives must expire and exactly the
    next-oldest pending names must activate within the budget, with
    zero registry edits. The simulated green round is derived PER NAME
    (``_RECHECK_SINCE[n] + 1`` — expiry needs green > since) and the
    expected next-active set from ``_RECHECK_SINCE``/``_DRIVER_BUDGET``,
    so the test stays correct no matter which CORRECTNESS_r*.json files
    the driver has written to the checkout."""
    from ripple_server_spark.plans import registry as reg

    real = reg._green_rounds()
    active_now = reg._active_recheck()
    simulated = dict(real)
    for n in active_now:
        simulated[n] = reg._RECHECK_SINCE[n] + 1
    monkeypatch.setattr(reg, "_green_rounds", lambda: simulated)
    nxt = reg._active_recheck()
    assert not (nxt & active_now), "newly-green names must expire"
    remaining = [
        n
        for n, s in reg._RECHECK_SINCE.items()
        if n in SPECS and n not in active_now and simulated.get(n, 0) <= s
        and n in simulated
    ]
    remaining.sort(key=lambda n: reg._RECHECK_SINCE[n])
    never = [n for n in SPECS if n not in simulated]
    room = max(0, reg._DRIVER_BUDGET - len(never))
    expected = set(remaining[:room])
    assert nxt == expected, (nxt ^ expected)
