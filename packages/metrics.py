"""Reference-signature metrics (compat shim over dvae_tpu.eval).

Matches /root/reference/packages/metrics.py:5-168. ``compute_stats`` is
signature-identical in dvae_tpu.eval.stats and re-exported directly;
``mean_confidence_interval`` adds the reference's rounding."""

from __future__ import annotations

import numpy as np

from dvae_tpu.eval.si_sdr import (  # noqa: F401  (reference names)
    energy_ratios,
    si_sdr_components,
    si_sdr_leroux,
)
from dvae_tpu.eval.stats import compute_stats  # noqa: F401
from dvae_tpu.eval.stats import mean_confidence_interval as _mci


def mean_confidence_interval(data, confidence=0.95, round=3):
    m, h = _mci(data, confidence)
    return np.round(m, round), np.round(h, round)
