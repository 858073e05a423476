"""Drop-in compatibility layer for reference user code.

The reference exposes its library as ``packages.*`` (scripts do
``sys.path.append('.')`` then ``from packages.processing.stft import stft``
— reference training_M1.py:2,10). A reference user's own analysis code
therefore imports ``packages...``; this shim lets that code run against
dvae-tpu unchanged: put this repo root on ``sys.path`` (run from the repo
root, like the reference) and the imports resolve to thin wrappers over
``dvae_tpu`` with the reference's exact signatures, defaults and array
layouts (frequency-major spectrograms, ``(1, frames)`` VAD rows).

Covered: ``processing.stft`` (numpy stft/istft AND the torch
``*_pytorch`` variants), ``processing.target`` (all six label
generators), ``processing.video``, ``metrics``, ``visualization``,
``utils``, the three ``dataset`` catalogs, and ``data_handling`` (all
five Dataset classes, torch-tensor contracts — wav decoding via scipy,
torchaudio is absent here). The autograd-bearing surfaces
(``models.*`` — torch modules and losses user training code
differentiates through) raise a guidance error pointing at the native
equivalents and the ``.pt`` checkpoint bridge — see MIGRATING.md.
"""
