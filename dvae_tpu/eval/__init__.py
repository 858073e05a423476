from dvae_tpu.eval.si_sdr import energy_ratios, si_sdr_components, si_sdr_leroux
from dvae_tpu.eval.stats import compute_stats, mean_confidence_interval
from dvae_tpu.eval.stoi import stoi

__all__ = [
    "si_sdr_components",
    "energy_ratios",
    "si_sdr_leroux",
    "mean_confidence_interval",
    "compute_stats",
    "stoi",
]
