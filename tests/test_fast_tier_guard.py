"""The fast-tier duration guard (tests/conftest.py) is itself pinned:
an unmarked test that exceeds DVAE_FAST_TIER_MAX_S must turn the run
red (with the ledger instructions), while the same test marked `slow`
must stay green — so a new e2e chain test can never silently join the
`pytest -m "not slow"` inner-loop tier (round-5 verdict #6)."""

import subprocess
import sys
import textwrap
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _run_mini_suite(tmp_path, marked: bool) -> subprocess.CompletedProcess:
    # A throwaway suite whose conftest loads the SHIPPED guard module
    # (tests/_fast_tier.py — the same hooks the real conftest re-exports),
    # stdlib-only so the subprocess pays no JAX/platform startup.
    (tmp_path / "conftest.py").write_text(textwrap.dedent(f"""
        import importlib.util

        _spec = importlib.util.spec_from_file_location(
            "_fast_tier", {str(REPO / 'tests' / '_fast_tier.py')!r})
        _base = importlib.util.module_from_spec(_spec)
        _spec.loader.exec_module(_base)
        pytest_runtest_logreport = _base.pytest_runtest_logreport
        pytest_terminal_summary = _base.pytest_terminal_summary
        pytest_sessionfinish = _base.pytest_sessionfinish

        import pytest

        def pytest_configure(config):
            config.addinivalue_line("markers", "slow: heavyweight test")
        """))
    body = "import time\nimport pytest\n\n"
    if marked:
        body += "@pytest.mark.slow\n"
    body += "def test_sleepy():\n    time.sleep(0.6)\n"
    (tmp_path / "test_sleepy.py").write_text(body)
    import os

    env = dict(os.environ, DVAE_FAST_TIER_MAX_S="0.2")
    return subprocess.run(
        [sys.executable, "-m", "pytest", str(tmp_path), "-q",
         "-p", "no:cacheprovider", "--rootdir", str(tmp_path)],
        capture_output=True, text=True, env=env, cwd=tmp_path, timeout=300)


def test_unmarked_heavy_test_turns_run_red(tmp_path):
    r = _run_mini_suite(tmp_path, marked=False)
    assert r.returncode != 0, r.stdout + r.stderr
    assert "fast-tier guard FAILED" in r.stdout, r.stdout
    assert "SLOW_TESTS" in r.stdout, r.stdout


def test_slow_marked_heavy_test_stays_green(tmp_path):
    r = _run_mini_suite(tmp_path, marked=True)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "fast-tier guard" not in r.stdout, r.stdout


def test_guard_threshold_is_sane():
    """The default threshold must sit between the fast tier's heaviest
    legitimate tests (~15 s) and the ledgered e2e chains, and stay
    env-overridable."""
    import conftest

    assert 15 <= conftest.FAST_TIER_MAX_S <= 60 or \
        conftest.FAST_TIER_MAX_S == 0
