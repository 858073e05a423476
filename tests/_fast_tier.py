"""Fast-tier invariant guard hooks — a standalone module (stdlib only, no
jax) so both the real conftest and test_fast_tier_guard.py's throwaway
mini-suite can use the SAME shipped implementation without the mini-suite
paying a full JAX/platform startup just to borrow three hook functions.

The SLOW_TESTS ledger in conftest.py is manual, so a new heavyweight test
added without touching it would silently join the "not slow" tier and
erode its ~5 min budget. These hooks make that an ERROR instead of silent
drift: any test NOT marked slow whose call phase exceeds
DVAE_FAST_TIER_MAX_S (default 25 s — comfortably above every legitimate
fast test, below the e2e chains) turns the run red with instructions to
add it to the ledger. Set DVAE_FAST_TIER_MAX_S=0 to disable (e.g. on a
badly loaded machine); the budget itself is pinned in
evidence/suite_stability.json."""

import os

FAST_TIER_MAX_S = float(os.environ.get("DVAE_FAST_TIER_MAX_S", "25"))
_fast_tier_offenders: list[tuple[str, float]] = []


def pytest_runtest_logreport(report):
    if FAST_TIER_MAX_S <= 0 or report.when != "call" or not report.passed:
        return
    if report.duration > FAST_TIER_MAX_S and "slow" not in report.keywords:
        _fast_tier_offenders.append((report.nodeid, report.duration))


def pytest_terminal_summary(terminalreporter, exitstatus, config):
    if _fast_tier_offenders:
        terminalreporter.section("fast-tier guard FAILED")
        for nodeid, dur in _fast_tier_offenders:
            terminalreporter.write_line(
                f"  {nodeid}: {dur:.1f}s unmarked (> {FAST_TIER_MAX_S:.0f}s)")
        terminalreporter.write_line(
            "Tests this heavy must not join the fast tier: add them to "
            "tests/conftest.py::SLOW_TESTS (or mark serving_cli). "
            "DVAE_FAST_TIER_MAX_S=0 disables this guard for a loaded "
            "machine.")


def pytest_sessionfinish(session, exitstatus):
    if _fast_tier_offenders and session.exitstatus == 0:
        session.exitstatus = 1
