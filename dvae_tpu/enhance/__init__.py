from dvae_tpu.enhance.mcem import (McemConfig, McemResult, run_em_fixed_z,
                                   run_mcem, run_peem)
from dvae_tpu.enhance.nmf import init_nmf, nmf_m_step

__all__ = ["McemConfig", "McemResult", "run_em_fixed_z", "run_mcem",
           "run_peem", "init_nmf", "nmf_m_step"]
