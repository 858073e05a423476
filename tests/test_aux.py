"""Tests for auxiliary components: video IDCT parity vs scipy, frame
upsampling, visualization smoke, SVI objectives, utils, STOI sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvae_tpu.eval.stoi import stoi
from dvae_tpu.models import CVAE_v3
from dvae_tpu.models.variational import (
    DeterministicWarmup,
    ImportanceWeightedSampler,
    svi_loss,
)
from dvae_tpu.ops.video import idct2, preprocess_utterance, upsample_frames
from dvae_tpu.utils import count_parameters, get_key


def test_idct2_matches_scipy():
    from scipy.fftpack import idct

    rng = np.random.default_rng(0)
    x = rng.standard_normal((5, 8, 8))
    ours = np.asarray(idct2(jnp.asarray(x)))
    for i in range(5):
        ref = idct(idct(x[i]).T).T  # reference video.py:8 convention
        np.testing.assert_allclose(ours[i], ref, rtol=1e-5, atol=1e-8)


def test_preprocess_utterance_range_and_shape():
    rng = np.random.default_rng(1)
    mats = rng.standard_normal((7, 67 * 67))
    out = preprocess_utterance(mats, 67, 67)
    assert out.shape == (7, 67, 67)
    assert out.min() >= 0.0 and out.max() <= 255.0 + 1e-3


def test_upsample_frames_30_to_62_5():
    frames = np.arange(30)[:, None]
    up = upsample_frames(frames, 30.0, 62.5)
    assert len(up) == round(30 * 62.5 / 30)
    assert up[0, 0] == 0 and up[-1, 0] == 29
    # monotone non-decreasing duplication
    assert np.all(np.diff(up[:, 0]) >= 0)


def test_viz_smoke(tmp_path):
    from dvae_tpu import viz

    rng = np.random.default_rng(2)
    x = rng.standard_normal(16000).astype(np.float32)
    spec = rng.standard_normal((60, 513)) + 1j * rng.standard_normal((60, 513))
    vad = (rng.uniform(size=60) > 0.5).astype(np.float32)
    fig = viz.display_wav_spectro_mask(x, spec, vad)
    fig.savefig(tmp_path / "a.png")
    fig2 = viz.display_multiple_signals([(x, spec, vad), (x, spec, None)])
    fig2.savefig(tmp_path / "b.png")
    import matplotlib.pyplot as plt

    ax = viz.display_spectrogram(spec, vad=vad)
    ax.figure.savefig(tmp_path / "c.png"); plt.close(ax.figure)
    ax = viz.display_power_spectro(np.abs(spec) ** 2)
    ax.figure.savefig(tmp_path / "d.png"); plt.close(ax.figure)
    fig5 = viz.display_multiple_spectro([np.abs(spec) ** 2] * 2)
    fig5.savefig(tmp_path / "e.png")
    ax = viz.display_waveplot(x)
    ax.figure.savefig(tmp_path / "f.png"); plt.close(ax.figure)
    for name in "abcdef":
        assert (tmp_path / f"{name}.png").stat().st_size > 0


def test_svi_objectives():
    model = CVAE_v3(x_dim=64, y_dim=1, z_dim=8, h_dim=(16,))
    x = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (12, 64))) + 0.1
    y = jnp.ones((12, 1))
    params = model.init(
        {"params": jax.random.PRNGKey(1), "sample": jax.random.PRNGKey(2)},
        x, y, method="init_all",
    )
    lab, m1 = svi_loss(model, params, x, y, jax.random.PRNGKey(3))
    unl, m2 = svi_loss(model, params, x, None, jax.random.PRNGKey(4))
    assert np.isfinite(float(lab)) and np.isfinite(float(unl))

    w = DeterministicWarmup(n=4)
    vals = [next(w) for _ in range(6)]
    assert vals[-1] == 1.0 and vals[0] == 0.25

    s = ImportanceWeightedSampler(mc=2, iw=3)
    x2 = jnp.ones((4, 5))
    assert s.resample(x2).shape == (24, 5)
    agg = s(jnp.zeros((24,)))
    assert agg.shape == (4,)


def test_svi_unlabelled_finite_at_classifier_saturation_under_jit():
    """A classifier saturated to exactly 1.0 in float32 must not NaN the
    unlabelled entropy term under jit (the losses._SAT hazard: XLA folds
    1 - q + eps back to 1 - q, so unclipped 0*log(0) = nan)."""
    model = CVAE_v3(x_dim=64, y_dim=1, z_dim=8, h_dim=(16,))
    x = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (6, 64))) + 0.1
    params = model.init(
        {"params": jax.random.PRNGKey(1), "sample": jax.random.PRNGKey(2)},
        x, jnp.ones((6, 1)), method="init_all",
    )
    params = jax.tree_util.tree_map(lambda a: a, params)  # shallow copy
    b = params["params"]["classifier"]["output_layer"]["bias"]
    params["params"]["classifier"]["output_layer"]["bias"] = b + 60.0
    q = model.apply(params, x, method="classify")
    assert float(q.min()) == 1.0  # genuinely saturated in float32
    loss, m = jax.jit(
        lambda p, xx, k: svi_loss(model, p, xx, None, k)
    )(params, x, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss)) and np.isfinite(float(m["entropy"]))


def test_deterministic_warmup_decreasing_ramp():
    """t_init > t_max (KL annealing DOWN) must ramp through intermediate
    values, not jump to the floor on step one (min() was the wrong clamp
    for a negative increment)."""
    w = DeterministicWarmup(n=4, t_max=0.0, t_init=1.0)
    vals = [next(w) for _ in range(6)]
    assert vals[:4] == [0.75, 0.5, 0.25, 0.0] and vals[-1] == 0.0


def test_utils():
    assert get_key({"a": 1, "b": 2}, 2) == "b"
    assert count_parameters({"w": np.zeros((3, 4)), "b": np.zeros(4)}) == 16


def test_profiling_timer_and_annotation():
    """Span timers accumulate per-name totals/counts across uses, report in
    descending-total order, and TraceAnnotation works outside a capture."""
    import time

    from dvae_tpu.utils.profiling import Timer, trace_annotation

    t = Timer()
    for _ in range(3):
        with t.span("a"):
            pass
    with t.span("b"):
        time.sleep(0.01)
    assert t.counts == {"a": 3, "b": 1}
    assert t.totals["b"] >= 0.01 > t.totals["a"]
    lines = []
    t.report(out=lines.append)
    assert [ln.split()[0] for ln in lines] == ["b", "a"]
    assert "x3" in lines[1]
    with trace_annotation("unit-test"):  # no active trace: must be a no-op
        jnp.ones(()).block_until_ready()


def test_stoi_sanity():
    rng = np.random.default_rng(5)
    t = np.arange(32000) / 16000
    clean = np.sin(2 * np.pi * 300 * t) * (1 + np.sin(2 * np.pi * 3 * t))
    noise = rng.standard_normal(len(t))
    assert stoi(clean, clean, 16000) > 0.99
    d_snr0 = stoi(clean, clean + noise * clean.std(), 16000)
    d_snr10 = stoi(clean, clean + 0.31 * noise * clean.std(), 16000)
    assert d_snr10 > d_snr0
    assert stoi(clean, clean, 16000, extended=False) > 0.99


def test_polqa_prepare_pairs_pads_short_to_3s(tmp_path):
    """The POLQA 3 s padding workaround (reference run_metrics.py:398-424):
    short pairs become padded copies in a separate 'extended' list written
    under pad_dir; long pairs pass through untouched."""
    import numpy as np

    from dvae_tpu.data.io import read_wav, write_wav
    from dvae_tpu.eval.pesq import polqa_prepare_pairs

    fs = 16000
    short_ref = tmp_path / "ref_short.wav"
    short_deg = tmp_path / "deg_short.wav"
    long_ref = tmp_path / "ref_long.wav"
    long_deg = tmp_path / "deg_long.wav"
    rng = np.random.default_rng(0)
    write_wav(str(short_ref), 0.1 * rng.standard_normal(fs).astype(np.float32), fs)
    write_wav(str(short_deg), 0.1 * rng.standard_normal(fs - 100).astype(np.float32), fs)
    write_wav(str(long_ref), 0.1 * rng.standard_normal(4 * fs).astype(np.float32), fs)
    write_wav(str(long_deg), 0.1 * rng.standard_normal(4 * fs).astype(np.float32), fs)

    normal, extended = polqa_prepare_pairs(
        [(str(short_ref), str(short_deg)), (str(long_ref), str(long_deg))],
        pad_dir=str(tmp_path / "pad"))
    assert normal == [(str(long_ref), str(long_deg))]
    assert len(extended) == 1
    ref_out, deg_out = extended[0]
    assert "pad" in ref_out and ref_out.endswith("_s_3sec.wav")
    r, _ = read_wav(ref_out)
    d, _ = read_wav(deg_out)
    assert len(r) == 3 * fs and len(d) == 3 * fs
    assert np.all(r[fs:] == 0)  # zero-padded tail


def test_preprocess_ntcd_matlab_matches_reference():
    """Single-frame lip preprocessing cross-run against the reference's own
    function (imported from /root/reference/packages/processing/video.py) on
    random DCT frames, incl. the quirky normalization tensor (a double IDCT
    along the last axis, NOT a 2-D IDCT) and the VAD white-square overlay."""
    import importlib.util
    import pathlib

    import pytest

    pytest.importorskip("cv2")  # the reference module imports it at top level
    ref_path = pathlib.Path("/root/reference/packages/processing/video.py")
    if not ref_path.exists():
        pytest.skip("reference checkout not available")
    spec = importlib.util.spec_from_file_location("ref_video", ref_path)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    from dvae_tpu.ops.video import preprocess_ntcd_matlab

    rng = np.random.default_rng(11)
    mats = rng.standard_normal((5, 67 * 67)).astype(np.float64)
    vad = np.array([0, 1, 1, 0, 1], np.float32)
    for frame in (0, 1, 4):
        want = ref.preprocess_ntcd_matlab(mats, frame, 67, 67, y_hat_hard=vad)
        got = preprocess_ntcd_matlab(mats, frame, 67, 67, y_hat_hard=vad)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=0)  # 0-255 pixel scale


def test_find_classifier_labels_layouts(tmp_path):
    """Both classifier-output layouts resolve: the reference's direct
    <dir>/<spk>/<utt>_y_hat_hard.pt and split subdirs, .pt or .npy."""
    import pytest

    from dvae_tpu.enhance.evaluate import find_classifier_labels

    d = tmp_path / "classif"
    (d / "34M").mkdir(parents=True)
    np.save(d / "34M" / "sa1_y_hat_hard.npy", np.ones(7, np.float32))
    assert find_classifier_labels(d, "34M", "sa1").shape == (7, 1)

    (d / "test" / "09F").mkdir(parents=True)
    np.save(d / "test" / "09F" / "sa2_y_hat_hard.npy", np.zeros(5, np.float32))
    assert find_classifier_labels(d, "09F", "sa2").shape == (5, 1)

    with pytest.raises(FileNotFoundError, match="nope"):
        find_classifier_labels(d, "09F", "nope")

    # rel_dir preference: with per-condition predictions (predict_vad_labels
    # --source noisy mirrors the noisy tree) an utterance must get the
    # labels predicted from ITS OWN noise/SNR condition, not a same-named
    # file from another condition or the flat layout
    for cond, val in (("Babble/-5", 1.0), ("LR/-5", 0.25)):
        p = d / "ntcd_timit" / "Noisy" / cond / "test" / "34M"
        p.mkdir(parents=True)
        np.save(p / "sa1_y_hat_hard.npy", np.full(9, val, np.float32))
    got = find_classifier_labels(
        d, "34M", "sa1", rel_dir="ntcd_timit/Noisy/LR/-5/test/34M")
    assert got.shape == (9, 1) and float(got[0, 0]) == 0.25
    # without the hint, the direct <spk>/ layout still wins (back-compat)
    assert find_classifier_labels(d, "34M", "sa1").shape == (7, 1)
    # a hint that matches nothing falls through to the other layouts
    got = find_classifier_labels(d, "34M", "sa1", rel_dir="no/such/dir")
    assert got.shape == (7, 1)


def test_load_classifier_labels_orientation(tmp_path):
    """The y_dim hint resolves 2-D orientation exactly: an IBM-style
    (frames, 513) file with fewer than 513 frames must NOT be transposed
    (the hint-free heuristic would flip it)."""
    from dvae_tpu.enhance.evaluate import load_classifier_labels

    p1 = tmp_path / "a_y_hat_hard.npy"
    np.save(p1, np.zeros((250, 513), np.float32))  # frames-major
    assert load_classifier_labels(p1, y_dim=513).shape == (250, 513)

    p2 = tmp_path / "b_y_hat_hard.npy"
    np.save(p2, np.zeros((513, 250), np.float32))  # freq-major
    assert load_classifier_labels(p2, y_dim=513).shape == (250, 513)

    p3 = tmp_path / "c_y_hat_hard.npy"
    np.save(p3, np.zeros((1, 99), np.float32))
    assert load_classifier_labels(p3, y_dim=1).shape == (99, 1)
    assert load_classifier_labels(p3).shape == (99, 1)  # heuristic path

    # degenerate single-frame IBM files: the explicit hint must beat the
    # 1-in-shape VAD heuristic ((1, 513) / flat (513,) -> (1, 513))
    p4 = tmp_path / "d_y_hat_hard.npy"
    np.save(p4, np.zeros((1, 513), np.float32))
    assert load_classifier_labels(p4, y_dim=513).shape == (1, 513)
    p5 = tmp_path / "e_y_hat_hard.npy"
    np.save(p5, np.zeros((513,), np.float32))
    assert load_classifier_labels(p5, y_dim=513).shape == (1, 513)
    p6 = tmp_path / "f_y_hat_hard.npy"
    np.save(p6, np.zeros((250, 99), np.float32))
    with pytest.raises(ValueError, match="y_dim"):
        load_classifier_labels(p6, y_dim=513)


def test_write_vad_demo_video_roundtrip(tmp_path):
    """The lip-video VAD demo writer (the reference's commented/unrunnable
    run_metrics_classif.py:238-294 experiment): active frames get the white
    bottom-right square; frame count and order survive the mp4 round-trip."""
    cv2 = pytest.importorskip("cv2")

    from dvae_tpu.viz import write_vad_demo_video

    n = 24
    rng = np.random.default_rng(0)
    frames = rng.uniform(40, 120, size=(67, 67, n)).astype(np.float32)
    vad = (np.arange(n) % 2).astype(np.float32)  # alternate off/on
    out = tmp_path / "sa1_oracle_audio.mp4"
    # audio_wav given but no ffmpeg binary here: writes the silent video
    path = write_vad_demo_video(frames, vad, out, audio_wav=None)
    assert path == str(out) and out.exists()

    cap = cv2.VideoCapture(str(out))
    corner_means, back = [], []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        g = f[..., 0].astype(np.float32)
        corner_means.append(g[-9:, -9:].mean())
        back.append(g[:20, :20].mean())
    cap.release()
    assert len(corner_means) == n
    corner = np.asarray(corner_means)
    # lossy codec: compare voiced vs unvoiced corners, not exact 255s
    assert corner[1::2].min() > 200, "white square missing on active frames"
    assert corner[0::2].max() < 150, "square bled onto inactive frames"
    assert max(back) < 150  # background untouched everywhere


def test_wav_sample_rate_header_probe(tmp_path):
    """wav_sample_rate reads the rate from the RIFF header alone, walking
    the chunk list (a JUNK chunk before fmt is valid RIFF and common in
    pro-audio tools; byte-24 assumptions break on it)."""
    import struct

    from dvae_tpu.data.io import read_wav, wav_sample_rate, write_wav

    p = tmp_path / "a.wav"
    write_wav(p, np.zeros(100, np.float32), 22050)
    assert wav_sample_rate(p) == read_wav(p)[1] == 22050

    # hand-build a wav with a JUNK chunk before fmt
    data = np.zeros(10, np.int16).tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 48000, 96000, 2, 16)
    junk = b"\x00" * 7  # odd size: exercises word-alignment seek
    body = (b"JUNK" + struct.pack("<I", len(junk)) + junk + b"\x00"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    q = tmp_path / "junk.wav"
    q.write_bytes(b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body)
    assert wav_sample_rate(q) == 48000

    import pytest

    bad = tmp_path / "not.wav"
    bad.write_bytes(b"NOTRIFFatall")
    with pytest.raises(ValueError, match="RIFF"):
        wav_sample_rate(bad)
