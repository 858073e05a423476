"""Script-level smoke tests: every CLI parses --help, and the core
train -> enhance -> metrics chain runs end-to-end on the subset."""

import json
import os
import pathlib
import subprocess
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
SCRIPTS = REPO / "scripts"
ENV = {**os.environ, "JAX_PLATFORMS": "cpu"}

ALL_SCRIPTS = [p.name for p in SCRIPTS.glob("*.py") if not p.name.startswith("_")]


@pytest.mark.parametrize("script", ALL_SCRIPTS)
def test_script_help(script):
    r = subprocess.run([sys.executable, str(SCRIPTS / script), "--help"],
                       capture_output=True, text=True, env=ENV, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]


def test_builders_default_to_cpu_platform():
    """Data builders are host-side I/O jobs (the reference's are pure
    numpy/librosa): their --platform must default to cpu so a remote-attached
    accelerator is never touched (or depended on) just to build h5 files.
    Compute CLIs keep the unset default (use the best available platform)."""
    import argparse

    sys.path.insert(0, str(SCRIPTS))
    from _lib import add_common

    host = add_common(argparse.ArgumentParser(), host_job=True).parse_args([])
    assert host.platform == "cpu"
    compute = add_common(argparse.ArgumentParser()).parse_args([])
    assert compute.platform is None
    builders = [s for s in ALL_SCRIPTS if s.startswith("create_")]
    assert len(builders) == 5
    for script in builders:
        src = (SCRIPTS / script).read_text()
        assert "host_job=True" in src, script


@pytest.fixture(scope="module")
def data_root(tmp_path_factory, subset_dir):
    root = tmp_path_factory.mktemp("data_root")
    sub = root / "data" / "subset"
    sub.mkdir(parents=True)
    (sub / "raw").symlink_to(subset_dir / "raw")
    (sub / "processed").symlink_to(subset_dir / "processed")
    return root


def _run(args, cwd, timeout=600):
    r = subprocess.run([sys.executable, *args], capture_output=True, text=True,
                       env=ENV, cwd=cwd, timeout=timeout)
    assert r.returncode == 0, f"{args}\nSTDOUT:{r.stdout[-2000:]}\nSTDERR:{r.stderr[-3000:]}"
    return r


def test_train_enhance_metrics_chain(data_root, tmp_path):
    models = tmp_path / "models"
    # 1. train M1 for 3 epochs on the subset frame h5 (ibm file is shipped)
    _run([str(SCRIPTS / "training_M1.py"), "--dataset-size", "subset",
          "--labels", "ibm_labels", "--data-root", str(data_root / "data"),
          "--models-root", str(models), "--end-epoch", "4",
          "--platform", "cpu"], cwd=data_root)
    model_dir = next((d for d in models.iterdir() if d.is_dir()), None)
    assert model_dir is not None, "no model dir created"
    ckpts = list(model_dir.glob("M1_epoch_*.msgpack"))
    assert len(ckpts) == 3

    # 2. enhance the subset noisy test files (SNR -5 only in subset)
    out_dir = tmp_path / "enhanced"
    _run([str(SCRIPTS / "evaluate_ntcd_M1.py"), "--dataset-size", "subset",
          "--data-root", str(data_root / "data"), "--model-dir", str(model_dir),
          "--niter", "3", "--snr", "-5", "--batch-size", "6",
          "--output-dir", str(out_dir), "--platform", "cpu"], cwd=data_root)
    wavs = list(out_dir.rglob("*_s_est.wav"))
    assert len(wavs) == 6  # Babble,LR x {sa1,sa2,si494}

    # idempotent resume: second run skips everything
    r = _run([str(SCRIPTS / "evaluate_ntcd_M1.py"), "--dataset-size", "subset",
              "--data-root", str(data_root / "data"), "--model-dir", str(model_dir),
              "--niter", "3", "--snr", "-5", "--output-dir", str(out_dir),
              "--platform", "cpu"], cwd=data_root)
    assert "done: 0 utterances" in r.stdout

    # oracle-latent ablation: the mode behind the reference's shipped
    # *_clean_z_nomcem_* goldens (its commented experiment lines,
    # evaluate_ntcd_M1.py:187-188) — deterministic, so rerunning must skip
    ab_dir = tmp_path / "enhanced_ablation"
    _run([str(SCRIPTS / "evaluate_ntcd_M1.py"), "--dataset-size", "subset",
          "--data-root", str(data_root / "data"), "--model-dir", str(model_dir),
          "--niter", "3", "--snr", "-5", "--batch-size", "6",
          "--ablation", "clean-z-nomcem", "--output-dir", str(ab_dir),
          "--platform", "cpu"], cwd=data_root)
    ab_wavs = list(ab_dir.rglob("*_clean_z_nomcem_s_est.wav"))
    assert len(ab_wavs) == 6
    assert len(list(ab_dir.rglob("*_clean_z_nomcem_n_est.wav"))) == 6
    r = _run([str(SCRIPTS / "evaluate_ntcd_M1.py"), "--dataset-size", "subset",
              "--data-root", str(data_root / "data"), "--model-dir", str(model_dir),
              "--niter", "3", "--snr", "-5", "--ablation", "clean-z-nomcem",
              "--output-dir", str(ab_dir), "--platform", "cpu"], cwd=data_root)
    assert "done: 0 utterances" in r.stdout
    # and the metric sweep scores them via --est-prefix
    r = _run([str(SCRIPTS / "run_metrics.py"), "--dataset-size", "subset",
              "--data-root", str(data_root / "data"),
              "--model-output-dir", str(ab_dir), "--snr", "-5",
              "--est-prefix", "_clean_z_nomcem",
              "--platform", "cpu"], cwd=data_root)
    assert "estoi" in r.stdout
    # the init-only variant (clean-z: MH runs from Zclean) writes its own
    # prefix into the same tree — two utterances to keep the leg cheap
    _run([str(SCRIPTS / "evaluate_ntcd_M1.py"), "--dataset-size", "subset",
          "--data-root", str(data_root / "data"), "--model-dir", str(model_dir),
          "--niter", "3", "--snr", "-5", "--batch-size", "6",
          "--ablation", "clean-z", "--output-dir", str(ab_dir),
          "--platform", "cpu"], cwd=data_root)
    assert len(list(ab_dir.rglob("*_clean_z_s_est.wav"))) == 6

    # mesh-sharded enhancement through the real CLI (8 virtual CPU devices
    # from conftest's XLA_FLAGS reach the subprocess via the environment);
    # batch 6 over an 8-device mesh exercises the silent-utterance padding
    dp_dir = tmp_path / "enhanced_dp"
    _run([str(SCRIPTS / "evaluate_ntcd_M1.py"), "--dataset-size", "subset",
          "--data-root", str(data_root / "data"), "--model-dir", str(model_dir),
          "--niter", "3", "--snr", "-5", "--batch-size", "6",
          "--data-parallel", "--output-dir", str(dp_dir),
          "--platform", "cpu"], cwd=data_root)
    dp_wavs = sorted(dp_dir.rglob("*_s_est.wav"))
    assert len(dp_wavs) == 6
    # same utterances, same model, different chain RNG consumption order is
    # avoided (same key per batch): outputs must be finite and non-silent
    for w in dp_wavs:
        from dvae_tpu.data.io import read_wav as _rw

        s, _ = _rw(w)
        assert np.isfinite(s).all() and np.abs(s).max() > 0

    # 3. metrics over the enhanced outputs, with per-utterance figures and
    # the in-sweep classifier-F1 columns (reference run_metrics.py:144-236)
    classif = tmp_path / "classif" / "test" / "34M"
    classif.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for utt in ("sa1", "sa2", "si494"):
        np.save(classif / f"{utt}_y_hat_hard.npy",
                (rng.uniform(size=120) > 0.5).astype(np.float32))
    r = _run([str(SCRIPTS / "run_metrics.py"), "--dataset-size", "subset",
              "--data-root", str(data_root / "data"),
              "--model-output-dir", str(out_dir), "--snr", "-5",
              "--with-figures", "--classifier-dir", str(tmp_path / "classif"),
              "--platform", "cpu"], cwd=data_root)
    for col in ("si_sdr", "estoi", "pesq", "accuracy", "f1"):
        assert col in r.stdout, col
    assert (out_dir / "stats.json").exists()
    figs = list(out_dir.rglob("*_fig.png"))
    assert len(figs) == 6, figs

    # 4. classifier metric sweep with per-utterance mask figures and the
    # lip-video VAD demos (the reference's commented video experiment)
    r = _run([str(SCRIPTS / "run_metrics_classif.py"), "--dataset-size", "subset",
              "--data-root", str(data_root / "data"),
              "--classifier-dir", str(tmp_path / "classif"),
              "--with-figures", "--with-videos",
              "--platform", "cpu"], cwd=data_root)
    assert "f1" in r.stdout
    masks = list((tmp_path / "classif").rglob("*_hard_mask.png"))
    assert len(masks) == 3, masks
    vids = sorted(v.name for v in (tmp_path / "classif").rglob("*.mp4"))
    assert vids == sorted(
        f"{u}_{kind}_audio.mp4" for u in ("sa1", "sa2", "si494")
        for kind in ("oracle", "pred")), vids  # no soft artifacts -> no _soft

    # 5. reconstruction analysis figures from the trained checkpoint
    ckpt = sorted(model_dir.glob("M1_epoch_*.msgpack"))[-1]
    fig_dir = tmp_path / "recon"
    _run([str(SCRIPTS / "reconstruct_ntcd_M1.py"), "--dataset-size", "subset",
          "--data-root", str(data_root / "data"), "--checkpoint", str(ckpt),
          "--max-utts", "2", "--output-dir", str(fig_dir),
          "--platform", "cpu"], cwd=data_root)
    # the reference two-figure set per pair (reconstruct_ntcd_M1.py:239,281)
    assert len(list(fig_dir.glob("*_s_recon.png"))) >= 2
    assert len(list(fig_dir.glob("*_x_recon.png"))) >= 2

    # 6. the QUT-mixture reconstruct variant on the shipped _s/_x/_n triplets
    qut_fig = tmp_path / "recon_qut"
    _run([str(SCRIPTS / "reconstruct_M1.py"), "--dataset-size", "subset",
          "--data-root", str(data_root / "data"), "--checkpoint", str(ckpt),
          "--max-utts", "2", "--output-dir", str(qut_fig),
          "--platform", "cpu"], cwd=data_root)
    assert len(list(qut_fig.glob("*_s_recon.png"))) >= 2
    assert len(list(qut_fig.glob("*_x_recon.png"))) >= 2

    # 7. the serving CLI: arbitrary wavs outside any corpus tree (the
    # reference's evaluators can only walk the NTCD layout), including a
    # 48 kHz input through --resample; the Wiener partition must
    # reconstruct each mixture
    import shutil

    from scipy.signal import resample_poly

    from dvae_tpu.data.io import read_wav as _rw, write_wav as _ww

    serve_in = tmp_path / "serve_in"
    serve_in.mkdir()
    src = (data_root / "data" / "subset" / "processed" / "ntcd_timit"
           / "Noisy" / "Babble" / "-5" / "test" / "34M")
    shutil.copy(src / "sa1.wav", serve_in / "meeting.wav")
    x16, _ = _rw(src / "si494.wav")
    _ww(serve_in / "call48k.wav", resample_poly(x16, 3, 1), 48000)
    serve_out = tmp_path / "serve_out"
    _run([str(SCRIPTS / "enhance_wav.py"), str(serve_in),
          "--model-dir", str(model_dir), "--niter", "2",
          "--output-dir", str(serve_out), "--resample", "--platform", "cpu"],
         cwd=tmp_path)
    s, fs_s = _rw(serve_out / "meeting_s_est.wav")
    n, _ = _rw(serve_out / "meeting_n_est.wav")
    x, _ = _rw(serve_in / "meeting.wav")
    m = min(len(s), len(x))
    assert fs_s == 16000
    assert np.corrcoef(s[:m] + n[:m], x[:m])[0, 1] > 0.99
    s48, fs48 = _rw(serve_out / "call48k_s_est.wav")
    # 48 kHz input comes back enhanced at the model's 16 kHz analysis rate
    assert fs48 == 16000 and np.isfinite(s48).all() and np.abs(s48).max() > 0
    # a 16 kHz-mismatched file without --resample must fail loudly
    r = subprocess.run([sys.executable, str(SCRIPTS / "enhance_wav.py"),
                        str(serve_in / "call48k.wav"), "--model-dir",
                        str(model_dir), "--output-dir", str(serve_out),
                        "--platform", "cpu"],
                       capture_output=True, text=True, env=ENV, cwd=tmp_path)
    assert r.returncode != 0 and "--resample" in r.stderr + r.stdout


def test_std_norm_train_enhance_chain(data_root, tmp_path):
    """--std-norm end-to-end: train a normalized-input M1 (model dir gets
    the reference's 'norm' name mangle), then enhance with --std-norm
    (+ --norm-h5, since the subset's frame h5 is ibm but eval labels are
    vad) — the eval-side normalization the reference left as a TODO."""
    models = tmp_path / "models"
    _run([str(SCRIPTS / "training_M1.py"), "--dataset-size", "subset",
          "--labels", "ibm_labels", "--data-root", str(data_root / "data"),
          "--models-root", str(models), "--end-epoch", "3", "--std-norm",
          "--platform", "cpu"], cwd=data_root)
    model_dir = next((d for d in models.iterdir() if d.is_dir()), None)
    assert model_dir is not None and "_norm_" in model_dir.name

    out_dir = tmp_path / "enhanced_norm"
    norm_h5 = (data_root / "data" / "subset" / "processed" / "ntcd_timit"
               / "Clean_ibm_labels_upsampled.h5")
    _run([str(SCRIPTS / "evaluate_ntcd_M1.py"), "--dataset-size", "subset",
          "--data-root", str(data_root / "data"), "--model-dir", str(model_dir),
          "--niter", "2", "--snr", "-5", "--batch-size", "6",
          "--std-norm", "--norm-h5", str(norm_h5),
          "--output-dir", str(out_dir), "--platform", "cpu"], cwd=data_root)
    wavs = sorted(out_dir.rglob("*_s_est.wav"))
    assert len(wavs) == 6
    # Wiener partition sanity on one output pair
    from dvae_tpu.data.io import read_wav

    s, _ = read_wav(wavs[0])
    n, _ = read_wav(str(wavs[0]).replace("_s_est.wav", "_n_est.wav"))
    x, _ = read_wav(str(data_root / "data" / "subset" / "processed"
                        / "ntcd_timit" / "Noisy" / "Babble" / "-5" / "test"
                        / "34M" / (wavs[0].name.replace("_s_est", ""))))
    m = min(len(s), len(x))
    corr = np.corrcoef(s[:m] + n[:m], x[:m])[0, 1]
    assert corr > 0.999


@pytest.mark.parametrize("family", ["m1", "m2", "m2v2"])
def test_parity_harness_smoke(tmp_path, family):
    """scripts/parity_vs_reference.py at a tiny budget: trains, runs BOTH
    engines (ours batched, the reference's torch engine — MCEM_M1/M2/M2v2
    per --model) on 2 utterances, and emits a comparable JSON. Protects the
    cross-engine evidence path for every engine family."""
    import json

    pytest.importorskip("torch")
    out = tmp_path / "parity.json"
    r = _run([str(SCRIPTS / "parity_vs_reference.py"), "--model", family,
              "--epochs", "2",
              "--niter", "2", "--utterances", "2", "--out", str(out)],
             cwd=SCRIPTS.parent)
    data = json.loads(out.read_text())
    for side in ("ours", "reference"):
        assert np.isfinite(data[side]["cost_last"])
        assert np.isfinite(data[side]["si_sdr"])
        assert 1.0 <= data[side]["pesq"] <= 4.65
    assert len(data["per_utterance"]["ours"]) == 2
    assert len(data["per_utterance"]["reference"]) == 2


def test_m2_info_chain(tmp_path, subset_dir):
    """Flagship-family end-to-end: build the vad frame h5 with our own
    builder (the subset only ships ibm at frame level), adversarially train
    the disentangled M2-info model, enhance with oracle labels (MCEM_M2v3
    semantics, suffix _oracle_y), and score the suffixed outputs."""
    # writable processed/ntcd_timit with the reference subset's children
    # symlinked in (the builder writes the frame h5 at its top level)
    root = tmp_path / "data" / "subset"
    proc_nt = root / "processed" / "ntcd_timit"
    proc_nt.mkdir(parents=True)
    for child in (subset_dir / "processed" / "ntcd_timit").iterdir():
        (proc_nt / child.name).symlink_to(child)
    (root / "raw").symlink_to(subset_dir / "raw")
    data_root = tmp_path / "data"

    _run([str(SCRIPTS / "create_train_set.py"), "--dataset-size", "subset",
          "--labels", "vad_labels", "--data-root", str(data_root),
          "--platform", "cpu"], cwd=tmp_path)
    assert (proc_nt / "Clean_vad_labels_upsampled.h5").exists()

    models = tmp_path / "models"
    _run([str(SCRIPTS / "training_M2_info_vad.py"), "--dataset-size", "subset",
          "--labels", "vad_labels", "--data-root", str(data_root),
          "--models-root", str(models), "--end-epoch", "3",
          "--platform", "cpu"], cwd=tmp_path)
    model_dir = next(d for d in models.iterdir() if d.is_dir())
    assert len(list(model_dir.glob("*.msgpack"))) == 2

    out_dir = tmp_path / "enhanced"
    _run([str(SCRIPTS / "evaluate_ntcd_M2_info_vad.py"), "--dataset-size",
          "subset", "--labels", "vad_labels", "--data-root", str(data_root),
          "--models-root", str(models), "--model-dir", str(model_dir),
          "--niter", "3", "--snr", "-5", "--batch-size", "6",
          "--y-source", "oracle", "--output-dir", str(out_dir),
          "--platform", "cpu"], cwd=tmp_path)
    wavs = list(out_dir.rglob("*_s_est_oracle_y.wav"))
    assert len(wavs) == 6, wavs

    # self-classifier soft conditioning (reference's commented y=y_hat_soft
    # experiment, evaluate_ntcd_M2_info_vad.py:218/:268) on two utterances
    _run([str(SCRIPTS / "evaluate_ntcd_M2_info_vad.py"), "--dataset-size",
          "subset", "--labels", "vad_labels", "--data-root", str(data_root),
          "--models-root", str(models), "--model-dir", str(model_dir),
          "--niter", "3", "--snr", "-5", "--batch-size", "6",
          "--y-source", "self-soft", "--save-labels",
          "--output-dir", str(out_dir),
          "--platform", "cpu"], cwd=tmp_path)
    soft_wavs = list(out_dir.rglob("*_s_est_y_hat_soft.wav"))
    assert len(soft_wavs) == 6, soft_wavs
    # --save-labels persisted the conditioning labels (reference's commented
    # torch.save lines) as loadable soft probabilities
    soft_labels = list(out_dir.rglob("*_y_hat_soft.npy"))
    assert len(soft_labels) == 6, soft_labels
    y = np.load(soft_labels[0])
    assert y.ndim == 2 and y.shape[1] == 1 and (y >= 0).all() and (y <= 1).all()
    # the saved dumps are scoreable: classifier F1 of the model's own VAD
    r = _run([str(SCRIPTS / "run_metrics_classif.py"), "--dataset-size",
              "subset", "--data-root", str(data_root),
              "--classifier-dir", str(out_dir),
              "--label-suffix", "_y_hat_soft", "--binarize", "0.5",
              "--platform", "cpu"], cwd=tmp_path)
    assert "f1" in r.stdout

    r = _run([str(SCRIPTS / "run_metrics.py"), "--dataset-size", "subset",
              "--data-root", str(data_root), "--model-output-dir", str(out_dir),
              "--snr", "-5", "--suffix", "_oracle_y", "--platform", "cpu"],
             cwd=tmp_path)
    assert "si_sdr" in r.stdout and "pesq" in r.stdout
    assert (out_dir / "stats.json").exists()

    # pretrain leg: warm-start from the M2-info checkpoint just trained
    # (surgical enc_dec_clf/classifier load) and train with the PRETRAIN
    # script's live configuration — y_hat_soft forward + ENTROPY adversary
    # (Lenc_aux_v3, its default here) + gamma=beta — for two epochs
    pre_ckpt = sorted(model_dir.glob("*.msgpack"))[0]
    _run([str(SCRIPTS / "training_M2_info_vad_pretrain.py"), "--dataset-size",
          "subset", "--labels", "vad_labels", "--data-root", str(data_root),
          "--models-root", str(models), "--end-epoch", "3",
          "--pretrained-checkpoint", str(pre_ckpt),
          "--platform", "cpu"], cwd=tmp_path)
    pre_dir = next(d for d in models.iterdir()
                   if d.is_dir() and "Lenc_aux_v3" in d.name)
    assert "_pretrain_yhatsoft_" in pre_dir.name  # reference name grammar
    assert "gamma" not in pre_dir.name  # default gamma==beta: no segment
    assert len(list(pre_dir.glob("*.msgpack"))) == 2

    # M2 leg on the same vad frame h5: the conditional CVAE trains with y in
    # the encoder AND decoder, and enhancement runs the MCEM y_mode="enc_dec"
    # configuration (distinct engine path from M2-info's dec_only)
    _run([str(SCRIPTS / "training_M2.py"), "--dataset-size", "subset",
          "--labels", "vad_labels", "--data-root", str(data_root),
          "--models-root", str(models), "--end-epoch", "3",
          "--platform", "cpu"], cwd=tmp_path)
    m2_dir = next(d for d in models.iterdir()
                  if d.is_dir() and d.name.startswith("ntcd_M2_VAD"))
    out2 = tmp_path / "enhanced_m2"
    _run([str(SCRIPTS / "evaluate_ntcd_M2.py"), "--dataset-size", "subset",
          "--labels", "vad_labels", "--data-root", str(data_root),
          "--models-root", str(models), "--model-dir", str(m2_dir),
          "--niter", "3", "--snr", "-5", "--batch-size", "6",
          "--y-source", "oracle", "--output-dir", str(out2),
          "--platform", "cpu"], cwd=tmp_path)
    assert len(list(out2.rglob("*_s_est.wav"))) == 6

    # reconstruction probes from the trained checkpoints: the M2-info
    # six-figure set (reconstruct_ntcd_M2_info.py:282-490) and the M2
    # four-figure label-swap set (reconstruct_ntcd_M2.py:266-393)
    mi_ckpt = sorted(model_dir.glob("M2_epoch_*.msgpack"))[-1]
    fig_mi = tmp_path / "fig_mi"
    _run([str(SCRIPTS / "reconstruct_ntcd_M2_info.py"), "--dataset-size",
          "subset", "--data-root", str(data_root), "--checkpoint", str(mi_ckpt),
          "--max-utts", "1", "--output-dir", str(fig_mi),
          "--platform", "cpu"], cwd=tmp_path)
    for suffix in ("_s_recon", "_x_recon", "_x_recon_soft", "_x_recon_ones",
                   "_x_recon_zeros", "_recon_aux"):
        assert list(fig_mi.glob(f"*{suffix}.png")), suffix

    m2_ckpt = sorted(m2_dir.glob("M2_epoch_*.msgpack"))[-1]
    fig_m2 = tmp_path / "fig_m2"
    _run([str(SCRIPTS / "reconstruct_ntcd_M2.py"), "--dataset-size", "subset",
          "--labels", "vad_labels", "--data-root", str(data_root),
          "--checkpoint", str(m2_ckpt), "--max-utts", "1",
          "--output-dir", str(fig_m2), "--platform", "cpu"], cwd=tmp_path)
    for suffix in ("_s_recon", "_x_recon", "_x_recon_ones", "_x_recon_zeros"):
        assert list(fig_m2.glob(f"*{suffix}.png")), suffix

    # recovered golden families on the same frame h5: every model family in
    # the reference's shipped golden grid trains AND enhances here.
    # v2 (DeepGenerativeModel_v2, no trainer in the reference):
    _run([str(SCRIPTS / "training_M2.py"), "--dataset-size", "subset",
          "--labels", "vad_labels", "--data-root", str(data_root),
          "--models-root", str(models), "--end-epoch", "2",
          "--model-variant", "v2", "--platform", "cpu"], cwd=tmp_path)
    v2_dir = next(d for d in models.iterdir() if d.name.startswith("ntcd_M2v2_VAD"))
    out_v2 = tmp_path / "enh_v2"
    _run([str(SCRIPTS / "evaluate_ntcd_M2.py"), "--dataset-size", "subset",
          "--labels", "vad_labels", "--data-root", str(data_root),
          "--models-root", str(models), "--model-dir", str(v2_dir),
          "--model-variant", "v2", "--niter", "3", "--snr", "-5",
          "--batch-size", "6", "--y-source", "oracle",
          "--output-dir", str(out_v2), "--platform", "cpu"], cwd=tmp_path)
    assert len(list(out_v2.rglob("*_s_est.wav"))) == 6
    # v3 semisup (Uloss grammar) -> --model-class v3 enhancement:
    _run([str(SCRIPTS / "training_M2v3_semisup.py"), "--dataset-size", "subset",
          "--labels", "vad_labels", "--data-root", str(data_root),
          "--models-root", str(models), "--end-epoch", "2",
          "--objective", "uloss", "--alpha", "-10", "--y-cond", "hardlabel",
          "--platform", "cpu"], cwd=tmp_path)
    v3_dir = next(d for d in models.iterdir()
                  if d.name.startswith("ntcd_M2v3_VAD_Uloss_alpha_-10.0_hardlabel"))
    v3_ckpt = sorted(v3_dir.glob("M2_epoch_*.msgpack"))[-1]
    out_v3 = tmp_path / "enh_v3"
    _run([str(SCRIPTS / "evaluate_ntcd_M2_info_vad.py"), "--dataset-size",
          "subset", "--labels", "vad_labels", "--data-root", str(data_root),
          "--models-root", str(models), "--checkpoint", str(v3_ckpt),
          "--model-class", "v3", "--niter", "3", "--snr", "-5",
          "--batch-size", "6", "--y-source", "oracle",
          "--output-dir", str(out_v3), "--platform", "cpu"], cwd=tmp_path)
    assert len(list(out_v3.rglob("*_s_est_oracle_y.wav"))) == 6
    # v4 flat-tree adversarial (golden alpha/beta grammar) -> --model-class v4:
    _run([str(SCRIPTS / "training_M2_info_vad.py"), "--dataset-size", "subset",
          "--labels", "vad_labels", "--data-root", str(data_root),
          "--models-root", str(models), "--end-epoch", "2",
          "--model-variant", "v4", "--alpha", "10", "--beta", "10",
          "--y-cond", "yhathard", "--platform", "cpu"], cwd=tmp_path)
    v4_dir = next(d for d in models.iterdir()
                  if d.name.startswith("ntcd_M2v4_VAD_alpha_10.0_beta_10.0_yhathard"))
    v4_ckpt = sorted(v4_dir.glob("M2_epoch_*.msgpack"))[-1]
    out_v4 = tmp_path / "enh_v4"
    _run([str(SCRIPTS / "evaluate_ntcd_M2_info_vad.py"), "--dataset-size",
          "subset", "--labels", "vad_labels", "--data-root", str(data_root),
          "--models-root", str(models), "--checkpoint", str(v4_ckpt),
          "--model-class", "v4", "--niter", "3", "--snr", "-5",
          "--batch-size", "6", "--y-source", "oracle",
          "--output-dir", str(out_v4), "--platform", "cpu"], cwd=tmp_path)
    assert len(list(out_v4.rglob("*_s_est_oracle_y.wav"))) == 6

    # serving CLI with a CONDITIONAL model: the v5 checkpoint self-labels
    # via its own classifier on the mixture (no corpus, no oracle labels)
    import shutil

    serve_in = tmp_path / "serve_in"
    serve_in.mkdir()
    shutil.copy(data_root / "subset" / "processed" / "ntcd_timit" / "Noisy"
                / "LR" / "-5" / "test" / "34M" / "sa2.wav",
                serve_in / "field_recording.wav")
    serve_out = tmp_path / "serve_out"
    _run([str(SCRIPTS / "enhance_wav.py"), str(serve_in / "field_recording.wav"),
          "--checkpoint", str(mi_ckpt), "--model-class", "v5",
          "--y-source", "self-soft", "--niter", "2",
          "--output-dir", str(serve_out), "--platform", "cpu"], cwd=tmp_path)
    from dvae_tpu.data.io import read_wav as _rw2

    s, _ = _rw2(serve_out / "field_recording_s_est.wav")
    n, _ = _rw2(serve_out / "field_recording_n_est.wav")
    x, _ = _rw2(serve_in / "field_recording.wav")
    m = min(len(s), len(x))
    assert np.corrcoef(s[:m] + n[:m], x[:m])[0, 1] > 0.99
    # the npy sibling label path too (labels from any external VAD)
    np.save(serve_in / "field_recording_y.npy",
            np.ones(1000, np.float32))  # longer than needed: truncated
    _run([str(SCRIPTS / "enhance_wav.py"), str(serve_in / "field_recording.wav"),
          "--checkpoint", str(mi_ckpt), "--model-class", "v5",
          "--y-source", "npy", "--niter", "2",
          "--output-dir", str(tmp_path / "serve_out_npy"),
          "--platform", "cpu"], cwd=tmp_path)
    assert (tmp_path / "serve_out_npy" / "field_recording_s_est.wav").exists()


def test_run_metrics_score_input(data_root):
    """--score-input scores the raw mixtures as the paper's 'noisy input'
    baseline rows (the reference's commented variants, run_metrics.py:
    130/134/138) — no enhanced tree, no model, no stats.json write."""
    r = _run([str(SCRIPTS / "run_metrics.py"), "--dataset-size", "subset",
              "--data-root", str(data_root / "data"), "--snr", "-5",
              "--score-input", "--platform", "cpu"], cwd=data_root)
    assert "si_sdr" in r.stdout and "estoi" in r.stdout
    # at -5 dB input SNR the mixture must score clearly below clean speech
    import re

    m = re.search(r"si_sdr\s+(-?\d+\.?\d*)", r.stdout)
    assert m and float(m.group(1)) < 0.0


def test_audio_vad_predict_chain(data_root, tmp_path):
    """train_audio_net -> predict_vad_labels -> run_metrics_classif: the
    in-framework producer of the *_y_hat_hard classifier outputs the
    reference could only consume (its files came from the sibling
    audio-visual-vad repo, evaluate_ntcd_M2.py:85,180-189). Asserts the
    produced layout is read back by every consumer lookup: the evaluate
    CLIs' find_classifier_labels and the classif metric sweep (hard and
    binarized-soft)."""
    models = tmp_path / "models"
    root = str(data_root / "data")
    _run([str(SCRIPTS / "train_audio_net.py"), "--dataset-size", "subset",
          "--labels", "vad_labels", "--data-root", root,
          "--models-root", str(models), "--train-split", "test",
          "--valid-split", "test", "--end-epoch", "2", "--hidden", "8",
          "--num-layers", "1", "--seq-batch-size", "4", "--platform", "cpu"],
         cwd=tmp_path)
    model_dir = models / "ntcd_audio_vad_lstm_8x1"
    assert model_dir.is_dir()

    r = _run([str(SCRIPTS / "predict_vad_labels.py"), "--dataset-size",
              "subset", "--labels", "vad_labels", "--data-root", root,
              "--models-root", str(models), "--model-dir", str(model_dir),
              "--hidden", "8", "--num-layers", "1", "--snr", "-5",
              "--seq-batch-size", "4", "--platform", "cpu"], cwd=tmp_path)
    assert "vs oracle:" in r.stdout
    pred_root = next((models / "predictions" / "ntcd_audio_vad_lstm_8x1").iterdir())
    hard = sorted(pred_root.rglob("*_y_hat_hard.npy"))
    soft = sorted(pred_root.rglob("*_y_hat_soft.npy"))
    assert len(hard) == 6 and len(soft) == 6  # 2 noise types x 3 utterances

    # label lengths match the oracle h5s exactly (frame-trim contract)
    import h5py

    from dvae_tpu.enhance.evaluate import find_classifier_labels

    y = find_classifier_labels(str(pred_root), "34M", "sa1", 1)
    with h5py.File(data_root / "data" / "subset" / "processed" / "ntcd_timit"
                   / "Clean" / "test" / "34M"
                   / "sa1_vad_labels_upsampled.h5") as f:
        n_oracle = f["Y"].shape[-1]
    assert y.shape == (n_oracle, 1)
    assert set(np.unique(y)) <= {0.0, 1.0}
    p = np.load(soft[0])
    assert p.ndim == 1 and np.all((p >= 0) & (p <= 1)) and not np.all(p == p[0])

    # resume-by-skip: a rerun predicts nothing
    r2 = _run([str(SCRIPTS / "predict_vad_labels.py"), "--dataset-size",
               "subset", "--labels", "vad_labels", "--data-root", root,
               "--models-root", str(models), "--model-dir", str(model_dir),
               "--hidden", "8", "--num-layers", "1", "--snr", "-5",
               "--platform", "cpu"], cwd=tmp_path)
    assert "done: 0 utterances" in r2.stdout

    # hard decisions score through the classif sweep...
    r3 = _run([str(SCRIPTS / "run_metrics_classif.py"), "--dataset-size",
               "subset", "--labels", "vad_labels", "--data-root", root,
               "--classifier-dir", str(pred_root), "--platform", "cpu"],
              cwd=tmp_path)
    assert "f1" in r3.stdout and (pred_root / "stats.json").exists()
    # ...and the soft posteriors score after in-sweep binarization
    r4 = _run([str(SCRIPTS / "run_metrics_classif.py"), "--dataset-size",
               "subset", "--labels", "vad_labels", "--data-root", root,
               "--classifier-dir", str(pred_root), "--label-suffix",
               "_y_hat_soft", "--binarize", "0.5", "--platform", "cpu"],
              cwd=tmp_path)
    assert "f1" in r4.stdout


def test_video_vad_predict_chain(data_root, tmp_path):
    """train_video_net -> predict_vad_labels --modality video -> classif
    sweep: the in-framework VIDEO producer of the reference's consumed
    labels (they came from a video classifier in the sibling repo,
    README.md:6; the reference itself only has the commented import and
    the Video_Net_* checkpoint naming, train_audio_net.py:14,368-371).
    Also drives the AV fusion modality end-to-end."""
    models = tmp_path / "models"
    root = str(data_root / "data")
    common = ["--dataset-size", "subset", "--labels", "vad_labels",
              "--data-root", root, "--models-root", str(models),
              "--platform", "cpu"]
    _run([str(SCRIPTS / "train_video_net.py"), *common,
          "--train-split", "test", "--valid-split", "test",
          "--end-epoch", "2", "--hidden", "8", "--emb-dim", "4",
          "--num-layers", "1", "--seq-batch-size", "4", "--std-norm"],
         cwd=tmp_path)
    model_dir = models / "ntcd_video_vad_8x1_norm"
    assert model_dir.is_dir()
    assert list(model_dir.glob("Video_Net_epoch_001_vloss_*.msgpack"))

    r = _run([str(SCRIPTS / "predict_vad_labels.py"), *common,
              "--model-dir", str(model_dir), "--modality", "video",
              "--hidden", "8", "--emb-dim", "4", "--num-layers", "1",
              "--std-norm", "--seq-batch-size", "4"], cwd=tmp_path)
    assert "vs oracle:" in r.stdout
    pred_root = next((models / "predictions" / "ntcd_video_vad_8x1_norm").iterdir())
    hard = sorted(pred_root.rglob("*_y_hat_hard.npy"))
    # video is per-UTTERANCE (one file each, the reference's layout),
    # not per noise condition
    assert len(hard) == 3
    assert all("/Clean/" in str(p) for p in hard)

    # the produced labels feed the evaluate CLIs' lookup and the sweep
    from dvae_tpu.enhance.evaluate import find_classifier_labels

    y = find_classifier_labels(str(pred_root), "34M", "sa1", 1)
    assert set(np.unique(y)) <= {0.0, 1.0}
    r2 = _run([str(SCRIPTS / "run_metrics_classif.py"), *common,
               "--classifier-dir", str(pred_root)], cwd=tmp_path)
    assert "f1" in r2.stdout

    # AV fusion: trains on (noisy audio, video, label) triples and predicts
    # per condition
    _run([str(SCRIPTS / "train_video_net.py"), *common,
          "--modality", "av", "--train-split", "test", "--valid-split",
          "test", "--end-epoch", "2", "--hidden", "8", "--emb-dim", "4",
          "--num-layers", "1", "--seq-batch-size", "4"], cwd=tmp_path)
    av_dir = models / "ntcd_av_vad_8x1"
    assert list(av_dir.glob("AV_Net_epoch_001_vloss_*.msgpack"))
    r3 = _run([str(SCRIPTS / "predict_vad_labels.py"), *common,
               "--model-dir", str(av_dir), "--modality", "av",
               "--hidden", "8", "--emb-dim", "4", "--num-layers", "1",
               "--snr", "-5", "--seq-batch-size", "4"], cwd=tmp_path)
    assert "vs oracle:" in r3.stdout
    av_pred = next((models / "predictions" / "ntcd_av_vad_8x1").iterdir())
    assert len(sorted(av_pred.rglob("*_y_hat_hard.npy"))) == 6  # 2 types x 3


def test_mcem_budget_flags():
    """The reference's SETTINGS MH budgets (nsamples/burnin for E-step and
    WF, var_RW — evaluate_ntcd_M1.py:57-65) are CLI flags on every
    evaluate surface; unset flags defer to McemConfig's defaults."""
    import argparse

    sys.path.insert(0, str(SCRIPTS))
    from _lib import add_mcem_budgets, mcem_config_of

    ap = add_mcem_budgets(argparse.ArgumentParser())
    cfg = mcem_config_of(ap.parse_args([]))
    from dvae_tpu.enhance.mcem import McemConfig

    assert cfg == McemConfig()  # all-defaults parse = the class defaults
    cfg = mcem_config_of(ap.parse_args(
        ["--niter", "7", "--nsamples-e-step", "3", "--burnin-wf", "11",
         "--var-rw", "0.02"]))
    assert (cfg.niter, cfg.nsamples_e_step, cfg.burnin_wf, cfg.var_rw) == \
        (7, 3, 11, 0.02)
    assert cfg.burnin_e_step == 30 and cfg.nsamples_wf == 25  # untouched
    for script in ("evaluate_ntcd_M1.py", "evaluate_ntcd_M2.py",
                   "evaluate_ntcd_M2_info_vad.py", "enhance_wav.py",
                   "serve.py"):
        src = (SCRIPTS / script).read_text()
        assert "add_mcem_budgets" in src and "mcem_config_of" in src, script


def test_peem_low_niter_warns():
    """--engine peem with a reduced --niter warns on EVERY enhancement
    surface (they all build their McemConfig through mcem_config_of):
    PEEM was measured unstable at low EM budgets (+6/−3.5 dB per-utterance
    swings at niter=20), unlike MCEM which degrades gracefully."""
    import argparse
    import warnings

    sys.path.insert(0, str(SCRIPTS))
    from _lib import add_mcem_budgets, mcem_config_of

    ap = add_mcem_budgets(argparse.ArgumentParser())
    for engine in ("peem", "peem-wf"):  # the hybrid runs the same EM loop
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            mcem_config_of(ap.parse_args(["--engine", engine,
                                          "--niter", "20"]))
        assert any("niter" in str(x.message) and engine in str(x.message)
                   for x in w), (engine, [str(x.message) for x in w])
    # no warning at the production budget, nor for mcem at any budget
    for argv in (["--engine", "peem"],                  # default niter=100
                 ["--engine", "mcem", "--niter", "20"],
                 ["--niter", "20"]):                    # default engine
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            mcem_config_of(ap.parse_args(argv))
        assert not w, (argv, [str(x.message) for x in w])


def test_bench_profile_once_worker(tmp_path):
    """bench.py --profile-once's trace SUBPROCESS (the bounded-window
    replacement for --profile, which wedges over the tunnel): warms one
    shape, traces exactly one dispatch, writes TensorBoard/Perfetto trace
    files, exits 0. Driven here in its CPU mode; the parent orchestration
    adds only a timeout + retry around this."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        [sys.executable, str(REPO / "bench.py"),
         "--_profile-worker", str(tmp_path), "--_force-cpu", "--niter", "3"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=420)
    assert r.returncode == 0 and "PROFILE_WORKER_OK" in r.stdout, \
        r.stdout[-1000:] + r.stderr[-1000:]
    traces = list(tmp_path.rglob("*.xplane.pb")) \
        + list(tmp_path.rglob("*.trace.json.gz"))
    assert traces, list(tmp_path.rglob("*"))


def test_peem_family_warning():
    """warn_peem_family: the engine-quality matrix's measured boundary is
    operational — peem/peem-wf on IBM-conditioned M2 or v3-class models
    warns (PARITY.md 2b); safe combinations stay silent."""
    import argparse
    import warnings

    sys.path.insert(0, str(SCRIPTS))
    from _lib import warn_peem_family

    def args_for(engine):
        ns = argparse.Namespace()
        ns.engine = engine
        return ns

    def warns(engine, model_class, y_dim=1):
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            warn_peem_family(args_for(engine), model_class, y_dim)
        return [str(x.message) for x in w]

    assert warns("peem", "v3")                       # v3-class
    assert warns("peem-wf", "m2", y_dim=513)         # IBM-conditioned
    assert warns("peem", "m2v2", y_dim=513)
    # pmcem carries the same validity bound (-3.9 dB / -11 sigma on
    # m2_ibm, PARITY.md 2c) and must cite ITS evidence file
    assert any("pmcem_quality_matrix" in m
               for m in warns("pmcem", "m2", y_dim=513))
    assert warns("pmcem", "v3")
    assert not warns("pmcem", "m1")
    assert not warns("mcem", "v3")                   # default engine: quiet
    assert not warns("peem", "m1")                   # measured-safe families
    assert not warns("peem", "m2", y_dim=1)
    assert not warns("peem", "v5")
    # every surface that knows its family calls it
    for script in ("evaluate_ntcd_M2.py", "evaluate_ntcd_M2_info_vad.py",
                   "enhance_wav.py", "serve.py"):
        assert "warn_peem_family" in (SCRIPTS / script).read_text(), script


def test_family_template_abstract_matches_concrete():
    """The serving-boot fast path (load_family_model(abstract=True))
    builds the checkpoint-load template with jax.eval_shape; the
    checkpoint loader deserializes INTO that template, so any
    structure/shape/dtype divergence from the concrete flax init would
    corrupt or reject every checkpoint saved by the (concrete) trainers.
    Pin the equivalence directly for every model family and both label
    widths (VAD=1 / IBM=513)."""
    import argparse

    import jax

    sys.path.insert(0, str(SCRIPTS))
    from _lib import family_model_template

    cases = [("m1", 1), ("m2", 1), ("m2", 513), ("m2v2", 1),
             ("m2v2", 513), ("v3", 1), ("v4", 1), ("v5", 1)]
    for model_class, y_dim in cases:
        ns = argparse.Namespace(model_class=model_class, y_dim=y_dim,
                                z_dim=4, h_dim=[16, 16])
        _, abs_t = family_model_template(ns, abstract=True)
        _, conc_t = family_model_template(ns, abstract=False)
        abs_leaves, abs_tree = jax.tree_util.tree_flatten(abs_t)
        conc_leaves, conc_tree = jax.tree_util.tree_flatten(conc_t)
        assert abs_tree == conc_tree, (model_class, y_dim)
        for a, c in zip(abs_leaves, conc_leaves):
            assert a.shape == c.shape and a.dtype == c.dtype, \
                (model_class, y_dim, a, c.shape, c.dtype)


def test_av_fusion_study_smoke(data_root, tmp_path):
    """scripts/av_fusion_study.py (the harness behind both committed AV
    dossiers) end-to-end at toy budgets: trains the three matched VADs,
    predicts per modality, assembles per-condition F1 + checkpoint-derived
    training metrics, and writes a matrix JSON whose budgets come from the
    checkpoints (never the CLI default) — the round-4 60-vs-150 failure
    mode. Enhancement legs are exercised by the round-5 evidence runs and
    the evaluate CLI chains; this smoke skips them for time."""
    import shutil

    # the audio/AV trainers' --std-norm stats h5s are BUILDER outputs
    # (create_audio_train_set / create_video_train_files), not shipped —
    # build a writable data root exactly as the evidence runs did
    root = tmp_path / "data"
    root.mkdir(parents=True, exist_ok=True)
    shutil.copytree(data_root / "data" / "subset", root / "subset",
                    symlinks=False)
    for builder, labels in (("create_train_set.py", "vad_labels"),
                            ("create_audio_train_set.py", "ibm_labels"),
                            ("create_video_train_files.py", None)):
        argv = [str(SCRIPTS / builder), "--dataset-size", "subset",
                "--data-root", str(root), "--platform", "cpu"]
        if labels:
            argv += ["--labels", labels]
        _run(argv, cwd=tmp_path)

    out = tmp_path / "matrix.json"
    _run([str(SCRIPTS / "av_fusion_study.py"),
          "--data-root", str(root),
          "--models-root", str(tmp_path / "models"),
          "--train", "--epochs", "2", "--hidden", "8", "--emb-dim", "4",
          "--num-layers", "1", "--run-tag", "smoke",
          "--train-split", "test", "--valid-split", "test",
          "--platform", "cpu", "--train-platform", "cpu",
          "--out", str(out)], cwd=tmp_path, timeout=900)
    d = json.loads(out.read_text())
    assert set(d["f1_per_condition"]) == {"audio", "video", "av"}
    for modality, per_cond in d["f1_per_condition"].items():
        assert 0.0 <= per_cond["overall_mean_f1"] <= 1.0
        conds = [k for k in per_cond if k != "overall_mean_f1"]
        assert conds, per_cond
    # budgets.epochs derived from the checkpoints themselves
    assert d["protocol"]["budgets"]["epochs"] == 2
    assert d["protocol"]["budgets"]["epochs_arg"] == 2
    for modality in ("audio", "video", "av"):
        tr = d["training"][modality]
        assert tr["epochs_trained"] == 1  # epochs 1..end-1, exclusive end
        assert "best_valid_bce" in tr and "best_checkpoint_valid_f1" in tr
    # a non-grid SNR fails fast, before any training
    r = subprocess.run([sys.executable, str(SCRIPTS / "av_fusion_study.py"),
                 "--data-root", str(data_root / "data"),
                 "--models-root", str(tmp_path / "models"),
                 "--snr", "0", "--out", str(tmp_path / "x.json")],
                capture_output=True, text=True, env=ENV, cwd=tmp_path,
                timeout=120)
    assert r.returncode != 0 and "catalog's subset grid" in (
        r.stdout + r.stderr)
