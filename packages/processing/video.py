"""Reference-signature video preprocessing (compat shim over dvae_tpu.ops.video).

Matches /root/reference/packages/processing/video.py:5-23 (``output_video``
is accepted for signature parity — the reference's own body never reads
it)."""

from __future__ import annotations

from dvae_tpu.ops.video import preprocess_ntcd_matlab as _native


def preprocess_ntcd_matlab(matlab_frames, frame, width, height,
                           y_hat_hard=None, output_video=True):
    return _native(matlab_frames, frame, width, height, y_hat_hard=y_hat_hard)
