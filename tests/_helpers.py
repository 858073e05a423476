"""Shared test helpers (importable because pytest puts the tests dir on
sys.path; NOT collected — leading underscore)."""

from __future__ import annotations

import importlib.util
import pathlib
import sys
import types

import pytest

REFERENCE = pathlib.Path("/root/reference")
REFERENCE_DATA = REFERENCE / "data/subset"
RAW = str(REFERENCE_DATA / "raw")
PROC = str(REFERENCE_DATA / "processed")
SUBSET_H5 = str(REFERENCE_DATA / "processed/ntcd_timit/Clean_ibm_labels_upsampled.h5")
# the reference's shipped golden-wav tree + the two checkpoints the tests pin
GOLDEN_MODELS = str(REFERENCE_DATA / "models")
M1_GOLDEN = "ntcd_M1_nonorm_hdim_128_128_zdim_016_end_epoch_500/M1_epoch_118_vloss_416.54"
M2_GOLDEN = "ntcd_M2_IBM_nonorm_hdim_128_128_zdim_016_end_epoch_500/M2_epoch_037_vloss_410.62"


def require_golden_models():
    """Skip (not error) when the golden-wav tree is absent — a checkout can
    ship the processed subset without data/subset/models."""
    if not pathlib.Path(GOLDEN_MODELS).exists():
        pytest.skip("reference golden-model wavs not available")


def load_reference_module(relpath: str):
    """Import a /root/reference module by file path with its unavailable
    dependencies stubbed, for use as a parity oracle.

    One shared installer for every oracle loader (the per-test stub installers
    used to clobber each other's attributes — commit b4d57bf):

    * ``librosa`` / ``librosa.core``: attribute-augmented stub (the oracle
      code paths under test never call into librosa).
    * ``packages``: registered with ``__path__`` pointing INTO the reference
      tree, so it stays a real package — ``packages.utils``/``packages.dataset``
      keep importing the reference's own stdlib-only modules (a plain
      attribute stub here would shadow them and break
      ``from packages.dataset import ...`` elsewhere).
    * ``python`` / ``python.utils``: the reference's stale package name;
      provides our parity ``get_key``.
    """
    ref = REFERENCE / relpath
    if not ref.exists():
        pytest.skip("reference checkout not available")

    lib = sys.modules.setdefault("librosa", types.ModuleType("librosa"))
    if not hasattr(lib, "util"):
        lib.util = types.SimpleNamespace()
    if not hasattr(lib, "core"):
        core = types.ModuleType("librosa.core")
        core.resample = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("librosa stub: resample must not be called"))
        lib.core = core
        sys.modules["librosa.core"] = core

    ref_pkg_path = str(REFERENCE / "packages")
    existing = sys.modules.get("packages")
    if existing is None or ref_pkg_path not in getattr(existing, "__path__", []):
        # Purge a previously-imported repo-root compat shim (packages/ at the
        # repo root shadows this name): oracles must import the REFERENCE
        # tree. Shim tests run in subprocesses, so nothing in-process relies
        # on the shim staying cached.
        for name in [n for n in sys.modules if n == "packages"
                     or n.startswith("packages.")]:
            del sys.modules[name]
        pkg = types.ModuleType("packages")
        pkg.__path__ = [ref_pkg_path]
        sys.modules["packages"] = pkg

    from dvae_tpu.utils import get_key

    for modname in ("python", "python.utils"):
        m = sys.modules.setdefault(modname, types.ModuleType(modname))
        if not hasattr(m, "get_key"):
            m.get_key = get_key

    name = "ref_" + pathlib.Path(relpath).stem
    spec = importlib.util.spec_from_file_location(name, ref)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# NOTE deliberately NOT shared here: the _speechlike generators in
# test_pesq_native.py and test_stoi_vectors.py look near-identical but their
# exact outputs are hashed into frozen score vectors and golden pins —
# consolidating them behind one parameterization risks silently shifting
# those pinned values. Keep each test's generator with its pins.


def wait_admitted(stats_url: str, deadline_s: float, proc=None,
                  urlopen=None, sleep=None, clock=None) -> dict:
    """Poll a serve.py /stats endpoint until a request is ADMITTED
    (``pending >= 1``) or already ANSWERED (``requests >= 1``); returns the
    stats dict that satisfied the condition.

    The retry rules this encodes (and the unit test pins):
    * a transient poll failure (slow/refused /stats while the server thread
      starves for the GIL under parallel CPU load) RETRIES until the
      deadline instead of failing the caller;
    * ...UNLESS the server subprocess has DIED — then fail fast with its
      exit status and output instead of spinning on connection refusals for
      the whole deadline and reporting the misleading "never admitted";
    * a clean poll that shows no admission yet re-polls quickly (50 ms).

    ``urlopen``/``sleep``/``clock`` are injectable for unit testing.
    """
    import json as _json
    import time as _time
    import urllib.request as _request

    urlopen = urlopen or _request.urlopen
    sleep = sleep or _time.sleep
    clock = clock or _time.time
    deadline = clock() + deadline_s
    while clock() < deadline:
        try:
            with urlopen(stats_url, timeout=30) as r:
                st = _json.loads(r.read())
        except Exception:
            if proc is not None and proc.poll() is not None:
                out = ""
                if getattr(proc, "stdout", None) is not None:
                    try:
                        out = proc.stdout.read()
                    except Exception:
                        pass
                raise AssertionError(
                    f"server subprocess exited rc={proc.returncode} while "
                    f"polling {stats_url}:\n{out}")
            sleep(0.5)
            continue
        if st.get("pending", 0) >= 1 or st.get("requests", 0) >= 1:
            return st
        sleep(0.05)
    raise AssertionError("request never admitted")
