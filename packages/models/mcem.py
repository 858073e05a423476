"""Guidance: reference MCEM classes → the jitted lax.scan engine.

The native engine is one compiled program (dvae_tpu.enhance.mcem.run_mcem),
batched over utterances, with config via McemConfig — not a per-utterance
Python loop, so there is no class to swap in. The evaluate CLIs and
dvae_tpu.enhance.pipeline.Enhancer are the user-facing surfaces;
statistical parity with these reference classes is established in
PARITY.md §2 (scripts/parity_vs_reference.py)."""

from packages.models import _guide

_E = "dvae_tpu.enhance"
_MAP = {
    "EM": f"{_E}.mcem.run_mcem + {_E}.nmf (M-step)",
    "MCEM_M1": f"{_E}.pipeline.Enhancer(model='m1') / scripts/evaluate_ntcd_M1.py",
    "MCEM_M2": f"{_E}.pipeline.Enhancer(model='m2') / scripts/evaluate_ntcd_M2.py",
    "MCEM_M2v2": f"{_E}.pipeline.Enhancer(model='m2v2')",
    "MCEM_M2v3": f"{_E}.pipeline.Enhancer(model='m2v3') / scripts/evaluate_ntcd_M2_info_vad.py",
}

__getattr__ = _guide("mcem", "mcem.py:8-847", _MAP)
