"""Reference-signature misc utils (compat shim over dvae_tpu.utils).

Matches /root/reference/packages/utils.py:1-7; ``count_parameters`` accepts
both a torch ``nn.Module`` (the reference's input) and a Flax param tree.

Additionally supplies the two DataLoader collates the reference IMPORTS
but never shipped (`train_audio_net.py:20` pulls
``collate_many2many_audio{,_waveform}`` from ``packages.utils``, whose
whole surface is 7 lines — they lived in the sibling audio-visual-vad
repo). The contract is reconstructed from the consumer
(train_audio_net.py:194,225,231-234): batches unpack as
``(lengths, x, y)``, the model takes batch-first padded sequences plus
lengths, and the loss slices ``pred[:length]`` per item. The native
equivalents are the jnp batchers in ``dvae_tpu/train/sequence.py``."""

from __future__ import annotations

from dvae_tpu.utils.misc import count_parameters as _count_tree
from dvae_tpu.utils.misc import get_key  # noqa: F401


def count_parameters(model):
    if hasattr(model, "parameters") and callable(model.parameters):
        return sum(p.numel() for p in model.parameters() if p.requires_grad)
    return _count_tree(model)


def _pad_time_major(seqs, t_max):
    """Zero-pad a list of (T, ...) torch tensors to (B, t_max, ...)."""
    import torch

    out = []
    for s in seqs:
        pad = torch.zeros((t_max - s.shape[0],) + tuple(s.shape[1:]),
                          dtype=s.dtype)
        out.append(torch.cat([s, pad], dim=0))
    return torch.stack(out)


def _time_major_label(label):
    """(1, T)/(C, T) freq-major label -> (T,)/(T, C) time-major."""
    if label.dim() > 1:
        label = label.T
        if label.shape[-1] == 1:
            label = label.squeeze(-1)
    return label


def collate_many2many_audio(batch):
    """Collate ``NoisyWavWholeSequenceSpectrogramLabeledFrames`` items
    (data (513, T), label (·, T), length) into
    ``(lengths int64 (B,), x (B, T_max, 513), y (B, T_max[, C]))`` —
    batch-first padded, sorted by length descending
    (``pack_padded_sequence``-ready)."""
    import torch

    items = sorted(batch, key=lambda it: int(it[2]), reverse=True)
    lengths = torch.as_tensor([int(it[2]) for it in items],
                              dtype=torch.int64)
    t_max = int(lengths[0])
    x = _pad_time_major([d.T[:int(n)] for d, _, n in items], t_max)
    y = _pad_time_major([_time_major_label(l)[:int(n)]
                         for _, l, n in items], t_max)
    return lengths, x, y


def collate_many2many_audio_waveform(batch):
    """Collate ``NoisyWavWholeSequenceWavLabeledFrames`` items
    (wav (t,), label (·, T), time_length, tf_length) into
    ``(lengths int64 (B,) label FRAMES, x (B, t_max) waveforms,
    y (B, T_max[, C]))`` — the loss slices frames, so ``lengths`` counts
    frames while the padded waveforms keep their own time axis."""
    import torch

    items = sorted(batch, key=lambda it: int(it[3]), reverse=True)
    lengths = torch.as_tensor([int(it[3]) for it in items],
                              dtype=torch.int64)
    x = _pad_time_major([w for w, _, _, _ in items],
                        max(int(it[2]) for it in items))
    y = _pad_time_major([_time_major_label(l)[:int(n)]
                         for _, l, _, n in items], int(lengths[0]))
    return lengths, x, y
