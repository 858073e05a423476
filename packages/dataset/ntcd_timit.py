"""Compat re-export: the NTCD-TIMIT catalog keeps the reference's exact
function names and signatures (cross-run parity in tests/test_catalog.py),
so reference user code imports resolve directly."""

from dvae_tpu.data.catalog.ntcd_timit import (  # noqa: F401
    kaldi_list,
    noisy_clean_pair_dict,
    noisy_speech_dict,
    proc_noisy_clean_pair_dict,
    proc_video_audio_pair_dict,
    speech_list,
    video_list,
)
