"""PESQ / POLQA gating.

PESQ (ITU-T P.862) and POLQA (P.863) are licensed algorithms the reference
consumes through external packages — ``pesq`` from PyPI (run_metrics.py:23)
and the proprietary ``uhh_sp.evaluation.polqa`` (run_metrics.py:24). Neither
package is available in this environment, so both are gated: if the package
is importable we use it; otherwise calls raise a clear error and the metric
sweeps simply skip the column (run_metrics marks them 'n/a').
"""

from __future__ import annotations

import numpy as np


def pesq_available() -> bool:
    try:
        import pesq  # noqa: F401

        return True
    except ImportError:
        return False


def pesq(fs: int, ref: np.ndarray, deg: np.ndarray, mode: str = "wb") -> float:
    """Wideband PESQ MOS-LQO via the PyPI ``pesq`` package (run_metrics.py:137)."""
    try:
        from pesq import pesq as _pesq
    except ImportError as e:
        raise RuntimeError(
            "PESQ requires the `pesq` package (ITU-T P.862 implementation), "
            "which is not installed in this environment."
        ) from e
    return _pesq(fs, ref, deg, mode)


def polqa_available() -> bool:
    try:
        from uhh_sp.evaluation import polqa  # noqa: F401

        return True
    except ImportError:
        return False


def polqa(ref_paths, deg_paths):
    """Batch POLQA through the proprietary uhh_sp package (run_metrics.py:448-452)."""
    try:
        from uhh_sp.evaluation import polqa as _polqa
    except ImportError as e:
        raise RuntimeError(
            "POLQA requires the proprietary `uhh_sp` package (ITU-T P.863); "
            "not installed in this environment."
        ) from e
    return _polqa(ref_paths, deg_paths)
