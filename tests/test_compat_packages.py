"""The repo-root ``packages/`` drop-in compat layer for reference user code.

Reference users import the library as ``packages.*`` (its scripts do
``sys.path.append('.')`` — reference training_M1.py:2); the shim resolves
those imports against dvae_tpu with the reference's signatures/layouts.

Every check runs in a SUBPROCESS with cwd=repo root: in-process, the name
``packages`` is owned by the REFERENCE tree whenever an oracle test loaded
it first (tests/_helpers.py purges/installs it), so importing the shim here
would race with test ordering. A subprocess is exactly the reference user's
situation anyway — a fresh interpreter run from the project root.
"""

from __future__ import annotations

import os
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


def run_shim(code: str) -> str:
    # env JAX_PLATFORMS=cpu is NOT enough here: the axon sitecustomize
    # force-registers the TPU platform over it. Pin in-process like
    # tests/conftest.py, so these tests never ride (or depend on) the tunnel.
    pin = ("import jax\n"
           "jax.config.update('jax_platforms', 'cpu')\n")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    res = subprocess.run([sys.executable, "-c", pin + code], cwd=REPO, env=env,
                         capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr
    return res.stdout


def test_stft_istft_reference_signature_roundtrip():
    out = run_shim("""
import numpy as np
from packages.processing.stft import stft, istft
from dvae_tpu.ops.stft import StftConfig, stft_to_host

x = np.random.default_rng(0).standard_normal(16000).astype(np.float32)
# reference production config (its scripts override the 50 ms defaults)
S = stft(x, fs=16e3, wlen_sec=64e-3, win="hann", hop_percent=0.25,
         center=False, pad_mode="reflect", pad_at_end=True)
assert S.dtype == np.complex64 and S.shape[0] == 513, S.shape  # freq-major
# same values as the native frames-major path, transposed
cfg = StftConfig(fs=16000, wlen_sec=64e-3, hop_percent=0.25, center=False)
native = stft_to_host(x, cfg)
assert np.allclose(S, native.T, atol=1e-4)
# round trip: interior exact, edges limited by the analysis window taper
xr = istft(S, fs=16000, wlen_sec=64e-3, hop_percent=0.25, center=False,
           max_len=len(x))
assert xr.dtype == np.float32 and len(xr) == len(x)
w = int(64e-3 * 16000)
assert np.abs(xr[w:-w] - x[w:-w]).max() < 1e-3
# non-integer window length raises like the reference (its stft.py:37)
try:
    stft(x, fs=16e3, wlen_sec=1e-4 / 3)
except ValueError as e:
    assert "integer" in str(e)
else:
    raise AssertionError("expected ValueError")
# the torch variants are working drop-ins: same values as the numpy
# path in the reference-era (freq, frames, 2) real/imag layout
import torch
from packages.processing.stft import stft_pytorch, istft_pytorch
St = stft_pytorch(torch.as_tensor(x), fs=16e3, wlen_sec=64e-3,
                  hop_percent=0.25, center=False, pad_at_end=True)
assert isinstance(St, torch.Tensor) and St.shape[-1] == 2, St.shape
assert St.shape[:2] == S.shape, (St.shape, S.shape)
assert np.allclose(St[..., 0].numpy() + 1j * St[..., 1].numpy(), S,
                   atol=1e-4)
# power-spectrogram math user code does on the [..., 2] layout
p_torch = (St[..., 0] ** 2 + St[..., 1] ** 2).numpy()
assert np.allclose(p_torch, np.abs(S) ** 2, atol=1e-4)
# istft accepts both layouts; center=True (the reference defaults)
# round-trips in the interior (torch.istft cannot invert center=False
# Hann edges — zero overlap-add envelope; the reference never does)
St_c = stft_pytorch(torch.as_tensor(x), fs=16e3, wlen_sec=64e-3,
                    hop_percent=0.25, center=True, pad_at_end=True)
for inp in (St_c, torch.view_as_complex(St_c.contiguous())):
    xt = istft_pytorch(inp, fs=16000, wlen_sec=64e-3, hop_percent=0.25,
                       center=True).numpy()
    m = min(len(xt), len(x))
    assert np.abs(xt[:m][w:-w] - x[:m][w:-w]).max() < 1e-3
# pad_at_end=False works (the reference NameErrors, stft.py:45-52);
# one hop fewer of tail padding => possibly fewer frames
S_np = stft_pytorch(torch.as_tensor(x), fs=16e3, wlen_sec=64e-3,
                    hop_percent=0.25, center=False, pad_at_end=False)
assert S_np.shape[1] <= St.shape[1]
# non-Hann raises a clear error (the reference NameErrors, stft.py:141)
try:
    stft_pytorch(torch.as_tensor(x), win="hamming")
except ValueError as e:
    assert "Hann" in str(e)
else:
    raise AssertionError("expected ValueError")
print("OK")
""")
    assert "OK" in out


def test_target_shims_reference_layouts():
    out = run_shim("""
import numpy as np
from packages.processing.stft import stft
from packages.processing.target import (
    clean_speech_VAD, clean_speech_IBM, noise_robust_clean_speech_IBM,
    noise_aware_IBM, threshold_IBM, _voiced_unvoiced_split_characteristic)

rng = np.random.default_rng(1)
t = np.arange(16000) / 16000.0
x = (np.sin(2 * np.pi * 220 * t) * (t > 0.4)).astype(np.float32)
x += 0.001 * rng.standard_normal(16000).astype(np.float32)
vad = clean_speech_VAD(x, center=False, wlen_sec=64e-3, hop_percent=0.25)
assert vad.shape[0] == 1 and vad.dtype == np.float32      # (1, frames) row
assert set(np.unique(vad)) <= {0.0, 1.0}
S = stft(x, wlen_sec=64e-3, hop_percent=0.25, center=False)
ibm = clean_speech_IBM(S)
assert ibm.shape == S.shape and ibm.dtype == np.float32   # freq-major
nr = noise_robust_clean_speech_IBM(x, S, center=False, wlen_sec=64e-3,
                                   hop_percent=0.25)
assert nr.shape == S.shape
assert (nr <= ibm).all()                                  # VAD only gates off
v, u = _voiced_unvoiced_split_characteristic(513)
assert v.shape == u.shape == (513,)
assert np.allclose((v + u)[8:498], 1.0)   # interior: complementary split
assert (v[:4] == 0).all() and (u[:150] == 0).all()  # edge zero regions
sm, nm = noise_aware_IBM(np.abs(S).T, 0.1 * np.abs(S).T)  # (frames, bins) in
assert sm.shape == (S.shape[1], S.shape[0]) and sm.dtype == bool
tm = threshold_IBM(np.abs(S).T)
assert tm.shape == (S.shape[1], S.shape[0])
print("OK")
""")
    assert "OK" in out


def test_metrics_utils_variational_shims():
    out = run_shim("""
import numpy as np
from packages.metrics import (mean_confidence_interval, si_sdr_leroux,
                              si_sdr_components, energy_ratios, compute_stats)
from packages.utils import count_parameters, get_key
from packages.models.variational import (DeterministicWarmup,
                                         ImportanceWeightedSampler)

m, h = mean_confidence_interval([1.0, 2.0, 3.0])
assert m == 2.0 and h > 0                       # reference rounding applied
rng = np.random.default_rng(2)
s = rng.standard_normal(8000)
n = 0.1 * rng.standard_normal(8000)
assert si_sdr_leroux(s + 0.01 * n, s) > 20
assert get_key({"a": 1, "b": 2}, 2) == "b"
# count_parameters: torch path and flax-tree path both work
import torch
lin = torch.nn.Linear(3, 4)
assert count_parameters(lin) == 3 * 4 + 4
assert count_parameters({"w": np.zeros((3, 4)), "b": np.zeros(4)}) == 16
w = DeterministicWarmup(n=4, t_max=1)
assert [next(w) for _ in range(6)] == [0.25, 0.5, 0.75, 1.0, 1.0, 1.0]
iw = ImportanceWeightedSampler(mc=2, iw=3)
assert iw.resample(np.arange(5)).shape[0] == 30
print("OK")
""")
    assert "OK" in out


def test_dataset_shims_and_demand_defaults(tmp_path):
    out = run_shim(f"""
import numpy as np
from packages.dataset import ntcd_timit, qut_database, demand_database

# the reference's own module is unimportable (stale python.utils import);
# the shim resolves and carries the full surface
for mod, names in [
    (ntcd_timit, ["speech_list", "video_list", "kaldi_list",
                  "noisy_speech_dict", "noisy_clean_pair_dict",
                  "proc_noisy_clean_pair_dict", "proc_video_audio_pair_dict"]),
    (qut_database, ["noise_list", "preprocess_noise",
                    "noise_list_preprocessed", "noise_segment"]),
    (demand_database, ["noise_list", "preprocess_noise",
                       "noise_list_preprocessed", "noise_segment"]),
]:
    for n in names:
        assert callable(getattr(mod, n)), (mod.__name__, n)

# DEMAND keeps the reference's dataset_type='test' DEFAULT, which the
# reference crashes on (UnboundLocalError / root glob); here it raises
for fn in (demand_database.noise_list, demand_database.noise_list_preprocessed):
    try:
        fn("{tmp_path}/")
    except NotImplementedError:
        pass
    else:
        raise AssertionError(f"expected NotImplementedError from {{fn}}")

# preprocessed split dirs match the reference's (demand_database.py:99-105)
import pathlib
for split, d in [("train", "si_tr_s"), ("validation", "si_dt_05")]:
    p = pathlib.Path("{tmp_path}") / d / "env"
    p.mkdir(parents=True, exist_ok=True)
    (p / f"a_{{split}}.wav").write_bytes(b"")
    got = demand_database.noise_list_preprocessed("{tmp_path}/", split)
    assert list(got) == [f"a_{{split}}"], got
print("OK")
""")
    assert "OK" in out


def test_hdf5_dataset_drop_in(subset_dir):
    out = run_shim("""
import numpy as np
from packages.data_handling import HDF5CleanSpectrogramLabeledFrames

ds = HDF5CleanSpectrogramLabeledFrames(
    input_video_dir="/root/reference/data/subset/processed/",
    dataset_name="ntcd_timit", dataset_type="train",
    dataset_size="subset", labels="ibm_labels", upsampled=True)
assert len(ds) > 0
x, y = ds[0]                                   # torch CPU tensors, like ref
import torch
assert isinstance(x, torch.Tensor) and x.shape[0] == 513
assert y.shape[0] == 513
# matches the h5 column directly
import h5py
with h5py.File(ds.input_data_file, "r") as f:
    assert np.allclose(x.numpy(), f["X_train"][..., 0])
print("OK")
""")
    assert "OK" in out


def test_wav_sequence_dataset_drop_ins(subset_dir):
    """The four wav-based sequence datasets work over the shipped subset
    (upsampled labels) with the reference's tuple contracts; the
    label-overwrites-data slip (reference data_handling.py:153-154) is
    fixed to a symmetric trim."""
    out = run_shim("""
import numpy as np
import torch
from torch.utils.data import Dataset
from packages.data_handling import (
    NoisyWavWholeSequenceSpectrogramLabeledFrames,
    AudioVisualSequenceLabeledFrames)

ROOT = "/root/reference/data/subset/processed/"

ds = NoisyWavWholeSequenceSpectrogramLabeledFrames(
    ROOT, "test", "subset", labels="vad_labels", upsampled=True)
assert isinstance(ds, Dataset) and len(ds) == 6   # 3 utts x {Babble, LR}
data, label, length = ds[0]
assert isinstance(data, torch.Tensor) and data.shape[0] == 513
assert data.shape[-1] == label.shape[-1] == length   # symmetric trim
# the spectrogram math is the reference's: log(|STFT|^2 + eps) of the
# peak-normalized first channel (center=True production flags)
from dvae_tpu.data.io import read_wav
from packages.processing.stft import stft
noisy, _label_path = ds.noisy_clean_pair_paths[0]
wav, fs = read_wav(ROOT + noisy)
wav = (wav / np.abs(wav).max()).astype(np.float32)
S = stft(wav, fs=16e3, wlen_sec=64e-3, hop_percent=0.25, center=True,
         pad_at_end=True)
# compare in the POWER domain (log would amplify numeric noise in
# near-eps bins far beyond any meaningful tolerance)
got_p = np.exp(data.numpy().astype(np.float64)) - 1e-8
want_p = (np.abs(S).astype(np.float64) ** 2)[:, :length]
assert np.allclose(got_p, want_p, rtol=1e-3, atol=1e-6), \
    np.abs(got_p - want_p).max()

av = AudioVisualSequenceLabeledFrames(
    ROOT, "test", "subset", labels="vad_labels", upsampled=True)
spec, video, label2, n = av[0]
assert spec.shape == (513, n)
assert video.shape[:2] == (67, 67) and video.shape[-1] == n
assert label2.shape[-1] == n
assert set(np.unique(label2.numpy())) <= {0.0, 1.0}
# DataLoader compatibility (what reference user code wraps these in)
dl = torch.utils.data.DataLoader(av, batch_size=1)
spec_b, video_b, label_b, n_b = next(iter(dl))
assert spec_b.shape == (1, 513, int(n_b[0]))
print("OK")
""")
    assert "OK" in out


def test_wav_sequence_dataset_raw_rate_variants(tmp_path, subset_dir):
    """The non-upsampled classes (no ``upsampled`` kwarg in the reference)
    glob ``*_<labels>.h5`` and read ``*_upsampled.h5`` video — exercised on
    a tmp tree since the subset ships only upsampled label files."""
    import shutil

    root = tmp_path / "processed"
    sub = "ntcd_timit/Clean/test/34M"
    (root / sub).mkdir(parents=True)
    ref = pathlib.Path("/root/reference/data/subset/processed")
    shutil.copy(ref / sub / "sa1_vad_labels_upsampled.h5",
                root / sub / "sa1_vad_labels.h5")
    vid = "ntcd_timit/matlab_raw/test/34M"
    (root / vid).mkdir(parents=True)
    shutil.copy(ref / vid / "sa1_upsampled.h5", root / vid / "sa1_upsampled.h5")
    noisy = "ntcd_timit/Noisy/Babble/-5/test/34M"
    (root / noisy).mkdir(parents=True)
    shutil.copy(ref / noisy / "sa1.wav", root / noisy / "sa1.wav")

    out = run_shim(f"""
import numpy as np
import torch
from packages.data_handling import (
    NoisyWavWholeSequenceWavLabeledFrames,
    AudioVisualSequenceWavLabeledFrames)

ROOT = "{root}/"
ds = NoisyWavWholeSequenceWavLabeledFrames(ROOT, "test", "subset",
                                           labels="vad_labels")
assert len(ds) == 2          # 1 label file x {{Babble, LR}}
wav, label, t_len, tf_len = ds[0]
assert isinstance(wav, torch.Tensor) and wav.ndim == 1
assert abs(float(torch.max(torch.abs(wav))) - 1.0) < 1e-6  # peak-normalized
assert t_len == wav.shape[-1] and tf_len == label.shape[-1]

av = AudioVisualSequenceWavLabeledFrames(ROOT, "test", "subset",
                                         labels="vad_labels")
wav2, video, label2, t_len2, tf_len2 = av[0]
assert video.shape[:2] == (67, 67)
assert t_len2 == wav2.shape[-1] and tf_len2 == video.shape[-1]
assert torch.allclose(wav2, wav)

# the waveform collate (reference train_audio_net.py:20 imports it from
# packages.utils where it never existed): frame lengths, padded waveforms
from packages.utils import collate_many2many_audio_waveform
items = [(torch.randn(100), torch.ones(1, 5), 100, 5),
         (torch.randn(160), torch.zeros(1, 8), 160, 8)]
lengths, xw, yw = collate_many2many_audio_waveform(items)
assert lengths.tolist() == [8, 5]          # label frames, sorted desc
assert xw.shape == (2, 160) and yw.shape == (2, 8)
assert torch.allclose(xw[0], items[1][0]) and torch.all(xw[1, 100:] == 0)
print("OK")
""")
    assert "OK" in out


def test_collate_many2many_audio_dataloader_chain(subset_dir):
    """The reconstructed ``collate_many2many_audio`` feeds a real torch
    DataLoader over the drop-in sequence dataset exactly as the reference's
    train_audio_net wires it (train_audio_net.py:115-120,194)."""
    out = run_shim("""
import torch
from torch.utils.data import DataLoader
from packages.data_handling import NoisyWavWholeSequenceSpectrogramLabeledFrames
from packages.utils import collate_many2many_audio

ROOT = "/root/reference/data/subset/processed/"
ds = NoisyWavWholeSequenceSpectrogramLabeledFrames(
    ROOT, "test", "subset", labels="vad_labels", upsampled=True)
dl = DataLoader(ds, batch_size=4, shuffle=False,
                collate_fn=collate_many2many_audio)
lengths, x, y = next(iter(dl))            # the reference's unpack order
assert lengths.dtype == torch.int64
assert lengths.tolist() == sorted(lengths.tolist(), reverse=True)
B, T, F = x.shape
assert B == 4 and F == 513 and T == int(lengths[0])
assert y.shape == (B, T)
for j in range(B):                        # zero padding beyond each length
    n = int(lengths[j])
    assert torch.all(x[j, n:] == 0) and torch.all(y[j, n:] == 0)
# per-item values survive (batch is re-sorted by length, stably)
datas = [ds[i] for i in range(4)]
order = sorted(range(4), key=lambda i: datas[i][2], reverse=True)
for j, i in enumerate(order):
    d, l, n = datas[i]
    assert torch.allclose(x[j, :n], d.T)
    assert torch.allclose(y[j, :n], l.T.squeeze(-1))
print("OK")
""")
    assert "OK" in out


def test_model_guidance_errors_name_the_native():
    out = run_shim("""
# every torch-native reference symbol raises a pointed error naming its
# dvae-tpu equivalent; unknown names raise AttributeError
from packages.models import models, utils, distributions, variational, mcem
from packages.models import Audio_Net

cases = [
    (Audio_Net, "DeepVAD_audio", "lstm_vad"),
    (models, "DeepGenerativeModel_v3", "CVAE_v3"),
    (models, "VariationalAutoencoder", "dvae_tpu.models"),
    (utils, "ikatura_saito_divergence", "itakura_saito_divergence"),
    (utils, "U_loss", "losses"),
    (distributions, "log_gaussian", "losses"),
    (variational, "SVI", "svi_loss"),
    (mcem, "MCEM_M1", "Enhancer"),
]
for mod, name, needle in cases:
    try:
        getattr(mod, name)
    except NotImplementedError as e:
        assert needle in str(e), (name, str(e))
    else:
        raise AssertionError(f"{mod.__name__}.{name} should raise")
for mod in (models, utils, distributions, variational, mcem):
    try:
        mod.not_a_reference_symbol
    except AttributeError:
        pass
    else:
        raise AssertionError("unknown names must AttributeError")
print("OK")
""")
    assert "OK" in out


def test_visualization_shim_renders_reference_figures(tmp_path):
    out = run_shim(f"""
import numpy as np
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
from packages.processing.stft import stft
from packages import visualization as V

x = np.random.default_rng(3).standard_normal(8000).astype(np.float32)
S = stft(x, wlen_sec=64e-3, hop_percent=0.25, center=False)
mask = (np.abs(S) > np.abs(S).mean()).astype(np.float32)
vad = mask[:1]                                  # (1, frames) row broadcast
fig = V.display_wav_spectro_mask(x, S, vad)
fig.savefig("{tmp_path}/wsm.png"); plt.close(fig)
fig = V.display_multiple_signals([[x, S, mask], [None, S, None]])
fig.savefig("{tmp_path}/multi.png"); plt.close(fig)
fig = V.display_multiple_spectro([[x, 20 * np.log10(np.abs(S) + 1e-8)]])
fig.savefig("{tmp_path}/spec.png"); plt.close(fig)
plt.figure(); V.display_waveplot(x); plt.close("all")
plt.figure(); V.display_spectrogram(S, convert_to_db=True); plt.close("all")
plt.figure(); V.display_power_spectro(np.abs(S) ** 2); plt.close("all")
import pathlib
for f in ("wsm.png", "multi.png", "spec.png"):
    assert (pathlib.Path("{tmp_path}") / f).stat().st_size > 0
print("OK")
""")
    assert "OK" in out


def test_shim_does_not_shadow_reference_oracles():
    """In-process ordering hazard: importing the shim FIRST must not break a
    later reference-oracle load (tests/_helpers.py purges and re-installs
    ``packages`` pointing into /root/reference)."""
    if not pathlib.Path("/root/reference/packages").exists():
        pytest.skip("reference checkout not available")
    out = run_shim("""
import sys
sys.path.insert(0, "tests")
import packages.metrics                       # shim cached in sys.modules
import _helpers
_helpers.load_reference_module("packages/processing/target.py")
import packages
assert "/root/reference/packages" in packages.__path__[0], packages.__path__
from packages.models import models as ref_models
import inspect
assert "nn.Module" in inspect.getsource(ref_models.VariationalAutoencoder)
print("OK")
""")
    assert "OK" in out


def test_guidance_dotted_paths_resolve():
    """Every dotted ``dvae_tpu.*`` path named in the packages/ guidance shims
    and MIGRATING.md must import to a real module or attribute — guidance
    strings are hand-maintained and have drifted before (round-3 verdict:
    packages/models/mcem.py pointed at a nonexistent ``run_em``)."""
    import importlib
    import re

    root = pathlib.Path(__file__).resolve().parents[1]
    pat = re.compile(r"dvae_tpu(?:\.[A-Za-z_][A-Za-z0-9_]*)+")
    paths: set[str] = set()
    for p in list((root / "packages").rglob("*.py")) + [root / "MIGRATING.md"]:
        paths |= set(pat.findall(p.read_text()))
    assert len(paths) > 30, "regex sweep found suspiciously few paths"

    bad = []
    for dotted in sorted(paths):
        parts = dotted.split(".")
        rest: list[str] = []
        obj = None
        for i in range(len(parts), 0, -1):
            try:
                obj = importlib.import_module(".".join(parts[:i]))
                rest = parts[i:]
                break
            except ImportError:
                continue
        if obj is None:
            bad.append(dotted)
            continue
        try:
            for attr in rest:
                obj = getattr(obj, attr)
        except AttributeError:
            bad.append(dotted)
    assert not bad, f"guidance names unresolvable dvae_tpu paths: {bad}"
