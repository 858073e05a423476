from dvae_tpu.ops.stft import (
    StftConfig,
    stft,
    istft,
    frame_signal,
    padded_length,
    n_stft_frames,
)

# Fused Pallas frontend on TPU, identical-semantics XLA path elsewhere.
from dvae_tpu.ops.pallas_stft import power_spectrogram, log_power_spectrogram
from dvae_tpu.ops.targets import clean_speech_vad, clean_speech_ibm, noise_robust_clean_speech_ibm

__all__ = [
    "StftConfig",
    "stft",
    "istft",
    "power_spectrogram",
    "log_power_spectrogram",
    "frame_signal",
    "padded_length",
    "n_stft_frames",
    "clean_speech_vad",
    "clean_speech_ibm",
    "noise_robust_clean_speech_ibm",
]
