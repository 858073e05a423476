"""End-to-end enhancement pipeline tests on the shipped subset: shape/length
contracts, ragged batching, and the Wiener partition identity
(S_hat + N_hat == X  =>  istft(S)+istft(N) ~= x)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvae_tpu.data.datasets import FrameDataset
from dvae_tpu.data.io import read_wav
from dvae_tpu.enhance.mcem import McemConfig
from dvae_tpu.enhance.pipeline import Enhancer, EnhancerConfig
from dvae_tpu.models import CVAE, VAE
from dvae_tpu.ops.targets import clean_speech_vad
from dvae_tpu.ops.stft import StftConfig

from _helpers import SUBSET_H5
QUICK_MCEM = McemConfig(niter=5, nsamples_e_step=3, burnin_e_step=3,
                        nsamples_wf=4, burnin_wf=4)


@pytest.fixture(scope="module")
def m1(subset_dir):
    ds = FrameDataset(SUBSET_H5, "train")
    model = VAE()
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.asarray(ds._x[:8]),
    )
    return model, params


def _wavs(subset_dir):
    x1, _ = read_wav(subset_dir / "processed/ntcd_timit/Noisy/Babble/-5/test/34M/sa1.wav")
    x2, _ = read_wav(subset_dir / "processed/ntcd_timit/Noisy/LR/-5/test/34M/si494.wav")
    return x1.astype(np.float32), x2.astype(np.float32)


def test_enhance_batch_contracts(subset_dir, m1):
    model, params = m1
    x1, x2 = _wavs(subset_dir)
    enh = Enhancer(model, params, EnhancerConfig(mcem=QUICK_MCEM))
    out = enh.enhance_batch([x1, x2], key=jax.random.PRNGKey(0))
    assert len(out) == 2
    for (s, n), x in zip(out, (x1, x2)):
        assert s.shape == x.shape and n.shape == x.shape
        assert np.isfinite(s).all() and np.isfinite(n).all()
        # Wiener partition: s_est + n_est reconstructs the mixture
        resid = np.abs((s + n) - x)[: len(x) - 1024]
        assert np.median(resid) < 5e-3, f"partition residual {np.median(resid)}"
    assert np.isfinite(enh.last_cost).all()


def test_std_norm_enhancement(subset_dir, m1):
    """EnhancerConfig.norm (std_norm-trained models — completes the
    reference's '#TODO: if std_norm' eval path, evaluate_ntcd_M1.py:145):
    an identity normalization (mean 0, std 1, eps 0) is bitwise-equal to no
    normalization, and real train statistics change the latent init while
    preserving every output contract (finiteness + Wiener partition)."""
    model, params = m1
    x1, x2 = _wavs(subset_dir)
    key = jax.random.PRNGKey(3)

    base = Enhancer(model, params, EnhancerConfig(mcem=QUICK_MCEM))
    out_base = base.enhance_batch([x1, x2], key=key)

    ident = Enhancer(model, params, EnhancerConfig(
        mcem=QUICK_MCEM,
        norm=(np.zeros(513, np.float32), np.ones(513, np.float32)),
        norm_eps=0.0))
    out_ident = ident.enhance_batch([x1, x2], key=key)
    for (s_a, n_a), (s_b, n_b) in zip(out_base, out_ident):
        np.testing.assert_array_equal(s_a, s_b)
        np.testing.assert_array_equal(n_a, n_b)

    mean, std = FrameDataset(SUBSET_H5, "train").mean_std
    normed = Enhancer(model, params, EnhancerConfig(
        mcem=QUICK_MCEM, norm=(mean, std)))
    out_norm = normed.enhance_batch([x1, x2], key=key)
    assert any(
        not np.array_equal(s_a, s_b)
        for (s_a, _), (s_b, _) in zip(out_base, out_norm)
    ), "train-stat normalization must change the latent init"
    for (s, n), x in zip(out_norm, (x1, x2)):
        assert np.isfinite(s).all() and np.isfinite(n).all()
        resid = np.abs((s + n) - x)[: len(x) - 1024]
        assert np.median(resid) < 5e-3


def test_evaluate_sweep_shards_partition_the_list(subset_dir, m1, tmp_path):
    """shard=(k, n) (the reference's np.array_split process fan-out,
    evaluate_ntcd_M1.py:249): the n shards are disjoint and their union is
    exactly the unsharded sweep's output set."""
    from dvae_tpu.enhance.evaluate import evaluate_sweep

    model, params = m1
    enh = Enhancer(model, params, EnhancerConfig(mcem=QUICK_MCEM))
    proc = subset_dir / "processed"

    full_dir = tmp_path / "full"
    n_full = evaluate_sweep(enh, proc, full_dir, dataset_size="subset",
                            snr_filter="-5", batch_size=6, log=lambda *a: None)
    full = {p.relative_to(full_dir) for p in full_dir.rglob("*_s_est.wav")}
    assert n_full == len(full) > 0

    shard_dir = tmp_path / "sharded"
    counts = []
    for k in (0, 1):
        counts.append(evaluate_sweep(
            enh, proc, shard_dir, dataset_size="subset", snr_filter="-5",
            batch_size=6, shard=(k, 2), log=lambda *a: None))
    assert sum(counts) == n_full
    assert counts[0] > 0 and counts[1] > 0
    sharded = {p.relative_to(shard_dir) for p in shard_dir.rglob("*_s_est.wav")}
    assert sharded == full

    with pytest.raises(ValueError):
        evaluate_sweep(enh, proc, shard_dir, dataset_size="subset",
                       shard=(2, 2), log=lambda *a: None)


def test_empty_batches_keep_stream_alignment(subset_dir, m1):
    """An empty input batch yields an empty result list (never silently
    dropped — downstream zip(batches, results) must stay aligned), both in
    enhance_batch and mid-stream."""
    model, params = m1
    x1, _ = _wavs(subset_dir)
    enh = Enhancer(model, params, EnhancerConfig(mcem=QUICK_MCEM))
    assert enh.enhance_batch([], key=jax.random.PRNGKey(0)) == []
    stream = [([x1], None, None), ([], None, None), ([x1[:40000]], None, None)]
    outs = list(enh.enhance_stream(stream, key=jax.random.PRNGKey(0)))
    assert [len(o) for o in outs] == [1, 0, 1]
    assert outs[0][0][0].shape == x1.shape
    assert outs[2][0][0].shape == x1[:40000].shape


def test_enhance_single_equals_batch_member_count(subset_dir, m1):
    """Ragged batch: both lengths processed under one compile bucket."""
    model, params = m1
    x1, x2 = _wavs(subset_dir)
    enh = Enhancer(model, params, EnhancerConfig(mcem=QUICK_MCEM))
    out = enh.enhance_batch([x1, x1[:40000], x2], key=jax.random.PRNGKey(1))
    assert [len(s) for s, _ in out] == [len(x1), 40000, len(x2)]


def test_enhance_with_vad_conditioning(subset_dir):
    """M2 'enc_dec' mode (CVAE: encoder sees [x;y]) with oracle VAD labels."""
    x1, x2 = _wavs(subset_dir)
    model = CVAE(y_dim=1)
    cfgs = StftConfig()
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.ones((4, 513)), jnp.ones((4, 1)),
    )
    enh = Enhancer(model, params,
                   EnhancerConfig(mcem=QUICK_MCEM, y_mode="enc_dec"))
    ys = [np.asarray(clean_speech_vad(jnp.asarray(x), cfgs)).T.reshape(-1, 1) for x in (x1, x2)]
    out = enh.enhance_batch([x1, x2], ys=ys, key=jax.random.PRNGKey(2))
    assert len(out) == 2 and out[0][0].shape == x1.shape


def test_noise_from_partition_matches_device_noise(subset_dir, m1):
    """Host-side n_est = x - s_est must match the device-synthesized
    n_est = istft(WFn*X) (the Wiener masks are complementary)."""
    model, params = m1
    x1, x2 = _wavs(subset_dir)
    key = jax.random.PRNGKey(5)
    enh_p = Enhancer(model, params, EnhancerConfig(
        mcem=QUICK_MCEM, noise_from_partition=True, wire_dtype="float32"))
    enh_d = Enhancer(model, params, EnhancerConfig(
        mcem=QUICK_MCEM, noise_from_partition=False, wire_dtype="float32"))
    out_p = enh_p.enhance_batch([x1, x2], key=key)
    out_d = enh_d.enhance_batch([x1, x2], key=key)
    for (s_p, n_p), (s_d, n_d), x in zip(out_p, out_d, (x1, x2)):
        np.testing.assert_allclose(s_p, s_d, rtol=1e-4, atol=1e-5)
        # the first/last window of librosa-style ISTFT has ill-conditioned
        # wss normalization; compare the interior
        sl = slice(1024, len(x) - 1024)
        np.testing.assert_allclose(n_p[sl], n_d[sl], atol=2e-3)


def test_wire_int16_mechanics(subset_dir, m1):
    """int16 wire: deterministic given the key, and the Wiener partition
    (s + n == x) holds to within PCM16 quantization of the output.

    (Pointwise comparison against the float32 wire is NOT meaningful: input
    quantization perturbs the chaotic MH accept/reject trajectory, so the
    two wires agree statistically, not sample-for-sample.)"""
    model, params = m1
    x1, _ = _wavs(subset_dir)
    key = jax.random.PRNGKey(6)
    enh = Enhancer(model, params, EnhancerConfig(mcem=QUICK_MCEM, wire_dtype="int16"))
    s_a, n_a = enh.enhance_batch([x1], key=key)[0]
    s_b, n_b = enh.enhance_batch([x1], key=key)[0]
    np.testing.assert_array_equal(s_a, s_b)  # same key -> identical output
    resid = np.abs((s_a + n_a) - x1)[: len(x1) - 1024]
    # input PCM16 round-trip + output quantization, both ~peak/32767
    assert np.median(resid) < np.abs(x1).max() * 3 / 32767


def test_enhance_batch_sharded_over_mesh(subset_dir, m1):
    """Batched enhancement pjit'd over an 8-device data mesh must agree with
    the single-device program (same key, same math — only the sharding
    differs), including a non-divisible batch that gets padded."""
    from dvae_tpu.parallel import make_mesh

    model, params = m1
    x1, x2 = _wavs(subset_dir)
    wavs = [x1, x2, x1[:40000]]  # 3 utterances on an 8-way mesh -> padded
    key = jax.random.PRNGKey(9)
    cfg = EnhancerConfig(mcem=QUICK_MCEM, wire_dtype="float32")
    out_1 = Enhancer(model, params, cfg).enhance_batch(wavs, key=key)
    mesh = make_mesh(8)
    out_8 = Enhancer(model, params, cfg, mesh=mesh).enhance_batch(wavs, key=key)
    assert len(out_8) == 3
    for (s1, n1), (s8, n8) in zip(out_1, out_8):
        # same program, same key; only reduction orders may differ.
        # NOTE: padding the batch changes the shapes the NMF init RNG draws,
        # so trajectories can only match when the batch is already divisible;
        # here we check the padded run is sane and the divisible case exact.
        assert np.isfinite(s8).all() and s8.shape == s1.shape

    # equality check on the deterministic path (var_rw=0 freezes the MH
    # chain; live chains amplify sharding-induced reduction-order jitter
    # through chaotic accept/reject, so only statistical parity holds there)
    import dataclasses

    det_cfg = dataclasses.replace(
        cfg, mcem=dataclasses.replace(QUICK_MCEM, var_rw=0.0)
    )
    wavs4 = [x1, x2, x1[:40000], x2[:40000]]  # divisible by 4
    mesh4 = make_mesh(4)
    out_a = Enhancer(model, params, det_cfg).enhance_batch(wavs4, key=key)
    out_b = Enhancer(model, params, det_cfg, mesh=mesh4).enhance_batch(wavs4, key=key)
    for (sa, _), (sb, _) in zip(out_a, out_b):
        scale = np.abs(sa).max() + 1e-9
        np.testing.assert_allclose(sa / scale, sb / scale, atol=1e-4)


def test_max_device_batch_split(subset_dir, m1):
    """Requests above max_device_batch split into sub-dispatches whose
    results concatenate in order and keep the Wiener partition."""
    import dataclasses

    model, params = m1
    x1, x2 = _wavs(subset_dir)
    wavs = [x1, x2, x1[:40000]]
    cfg = EnhancerConfig(mcem=QUICK_MCEM, max_device_batch=2)
    out = Enhancer(model, params, cfg).enhance_batch(wavs, key=jax.random.PRNGKey(3))
    assert [len(s) for s, _ in out] == [len(w) for w in wavs]
    for (s, n), x in zip(out, wavs):
        resid = np.abs((s + n) - x)[: len(x) - 1024]
        assert np.median(resid) < 5e-3


def test_max_frames_below_sample_count(subset_dir, m1):
    """Video trimming can cap frames below what the sample count implies;
    the excess samples must be ignored, not crash the padding (regression:
    numpy broadcast ValueError in _dispatch)."""
    model, params = m1
    x1, _ = _wavs(subset_dir)
    enh = Enhancer(model, params, EnhancerConfig(mcem=QUICK_MCEM))
    # cap at 64 frames: t_pad = 63*256+1024 = 17152 << len(x1)
    out = enh.enhance_batch([x1], key=jax.random.PRNGKey(4), max_frames=[64])
    s, n = out[0]
    assert s.shape == x1.shape
    cover = 63 * 256 + 1024
    assert np.abs(s[cover + 1024:]).max() == 0.0  # beyond coverage: silence


def test_enhance_stream_deep_pipeline_preserves_order(subset_dir, m1):
    """pipeline_depth > number of batches, = 1, and in between must all
    yield identical per-batch groupings in input order."""
    model, params = m1
    x1, x2 = _wavs(subset_dir)
    batches = [([x1], None, None), ([x2, x1[:40000]], None, None),
               ([x2[:50000]], None, None), ([x1, x2], None, None)]
    lens = None
    for depth in (1, 3, 8):
        cfg = EnhancerConfig(mcem=QUICK_MCEM, max_device_batch=2,
                             pipeline_depth=depth)
        enh = Enhancer(model, params, cfg)
        outs = list(enh.enhance_stream(list(batches), key=jax.random.PRNGKey(7)))
        got = [[len(s) for s, _ in out] for out in outs]
        if lens is None:
            lens = got
        assert got == lens, f"depth={depth} regrouped differently"
    assert lens == [[len(x1)], [len(x2), 40000], [50000], [len(x1), len(x2)]]


def test_enhance_stream_respects_max_device_batch(subset_dir, m1):
    """The sweep path must split oversized batches like enhance_batch does
    and regroup sub-batch results per input batch, in order."""
    model, params = m1
    x1, x2 = _wavs(subset_dir)
    cfg = EnhancerConfig(mcem=QUICK_MCEM, max_device_batch=2)
    enh = Enhancer(model, params, cfg)
    batches = [([x1, x2, x1[:40000]], None, None), ([x2[:50000]], None, None)]
    outs = list(enh.enhance_stream(batches, key=jax.random.PRNGKey(5)))
    assert len(outs) == 2
    assert [len(s) for s, _ in outs[0]] == [len(x1), len(x2), 40000]
    assert [len(s) for s, _ in outs[1]] == [50000]
    for out, wavs in zip(outs, (batches[0][0], batches[1][0])):
        for (s, n), x in zip(out, wavs):
            resid = np.abs((s + n) - x)[: len(x) - 1024]
            assert np.median(resid) < 5e-3


def test_enhance_batch_subframe_wav():
    """A wav shorter than one analysis frame must not corrupt the batch
    (regression: n_stft_frames goes <= 0 below ~nfft samples and the
    negative count became a wraparound mask slice marking padding valid)."""
    import jax

    from dvae_tpu.enhance.mcem import McemConfig
    from dvae_tpu.enhance.pipeline import Enhancer, EnhancerConfig
    from dvae_tpu.models import VAE

    model = VAE(x_dim=513, z_dim=8, h_dim=(16,))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.ones((4, 513)),
    )
    enh = Enhancer(model, params, EnhancerConfig(
        mcem=McemConfig(niter=2, nsamples_e_step=2, burnin_e_step=2,
                        nsamples_wf=2, burnin_wf=2)))
    rng = np.random.default_rng(0)
    wavs = [
        (0.1 * rng.standard_normal(500)).astype(np.float32),     # sub-frame
        (0.1 * rng.standard_normal(12000)).astype(np.float32),
    ]
    out = enh.enhance_batch(wavs, key=jax.random.PRNGKey(2))
    assert len(out) == 2
    for (s, n), w in zip(out, wavs):
        assert len(s) == len(w) and len(n) == len(w)
        assert np.isfinite(s).all() and np.isfinite(n).all()
    # Wiener partition still holds on the normal utterance
    s1, n1 = out[1]
    np.testing.assert_allclose(s1 + n1, wavs[1], atol=2e-4)


def test_enhancer_shape_fuzz():
    """Randomized sweep over batch sizes, utterance lengths (incl. 1-frame
    and bucket-boundary lengths), y modes and wire dtypes: every config must
    produce finite, length-exact outputs and (float32 wire) satisfy the
    Wiener partition identity. Guards the padding/masking/bucketing edge
    cases as a family rather than one-by-one."""
    import jax

    from dvae_tpu.enhance.mcem import McemConfig
    from dvae_tpu.enhance.pipeline import Enhancer, EnhancerConfig
    from dvae_tpu.models import CVAE, CVAE_v2, VAE

    rng = np.random.default_rng(42)
    tiny = McemConfig(niter=1, nsamples_e_step=1, burnin_e_step=1,
                      nsamples_wf=1, burnin_wf=1)

    def lengths(batch):
        pool = [500, 1024, 4000, 16639, 16640, 16641, 24000]
        return [int(pool[rng.integers(len(pool))]) for _ in range(batch)]

    for y_mode, wire in (("none", "int16"), ("none", "float32"),
                         ("dec_only", "int16"), ("enc_dec", "float32")):
        if y_mode == "none":
            model = VAE(x_dim=513, z_dim=4, h_dim=(8,))
            params = model.init(
                {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
                jnp.ones((2, 513)))
        else:
            # model family must match the y plumbing (MCEM_M2 vs M2v2/v3):
            # enc_dec = CVAE (encoder sees [x;y]); dec_only = CVAE_v2
            # (label-free encoder)
            cls = CVAE if y_mode == "enc_dec" else CVAE_v2
            model = cls(x_dim=513, y_dim=1, z_dim=4, h_dim=(8,))
            params = model.init(
                {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
                jnp.ones((2, 513)), jnp.ones((2, 1)))
        enh = Enhancer(model, params, EnhancerConfig(
            mcem=tiny, y_mode=y_mode, wire_dtype=wire))
        for batch in (1, 3):
            ls = lengths(batch)
            wavs = [(0.1 * rng.standard_normal(l)).astype(np.float32) for l in ls]
            ys = None
            if y_mode != "none":
                from dvae_tpu.ops.stft import n_stft_frames

                ys = [np.ones((max(1, n_stft_frames(l, enh.cfg.stft)), 1),
                              np.float32) for l in ls]
            out = enh.enhance_batch(wavs, ys=ys, key=jax.random.PRNGKey(batch))
            assert len(out) == batch
            for (s, n), w in zip(out, wavs):
                assert len(s) == len(w) and len(n) == len(w)
                assert np.isfinite(s).all() and np.isfinite(n).all()
                if wire == "float32" and len(w) >= 4000:
                    np.testing.assert_allclose(s + n, w, atol=3e-4)


def test_clean_z_ablations(subset_dir, m1):
    """The reference's oracle-latent experiment modes (golden wavs
    `*_clean_z_nomcem_*`): both ablations need the clean waveforms, keep the
    Wiener partition identity, and the nomcem mode is fully deterministic
    (no Monte-Carlo — the PRNG key only seeds the NMF init)."""
    model, params = m1
    x1, _ = _wavs(subset_dir)
    s1, _ = read_wav(subset_dir / "processed/ntcd_timit/Clean/test/34M/sa1.wav")
    s1 = s1.astype(np.float32)

    for ablation in ("clean_z", "clean_z_nomcem"):
        enh = Enhancer(model, params,
                       EnhancerConfig(mcem=QUICK_MCEM, ablation=ablation))
        with pytest.raises(ValueError, match="clean"):
            enh.enhance_batch([x1], key=jax.random.PRNGKey(0))
        (s_hat, n_hat), = enh.enhance_batch(
            [x1], key=jax.random.PRNGKey(0), clean_wavs=[s1])
        assert s_hat.shape == x1.shape and np.isfinite(s_hat).all()
        resid = np.abs((s_hat + n_hat) - x1)[: len(x1) - 1024]
        assert np.median(resid) < 5e-3

    # nomcem: same key -> bit-identical output (deterministic masks)
    enh = Enhancer(model, params,
                   EnhancerConfig(mcem=QUICK_MCEM, ablation="clean_z_nomcem"))
    (a, _), = enh.enhance_batch([x1], key=jax.random.PRNGKey(7), clean_wavs=[s1])
    (b, _), = enh.enhance_batch([x1], key=jax.random.PRNGKey(7), clean_wavs=[s1])
    np.testing.assert_array_equal(a, b)


def test_clean_z_nomcem_sharded_over_mesh(subset_dir, m1):
    """The deterministic ablation under --data-parallel: the fixed-z EM is
    fully deterministic, so the mesh-sharded program must reproduce the
    single-device masks exactly (divisible batch -> identical NMF init)."""
    from dvae_tpu.parallel import make_mesh

    model, params = m1
    x1, x2 = _wavs(subset_dir)
    s1, _ = read_wav(subset_dir / "processed/ntcd_timit/Clean/test/34M/sa1.wav")
    s2, _ = read_wav(subset_dir / "processed/ntcd_timit/Clean/test/34M/si494.wav")
    wavs = [x1, x2, x1[:40000], x2[:40000]]
    cleans = [s1.astype(np.float32), s2.astype(np.float32),
              s1[:40000].astype(np.float32), s2[:40000].astype(np.float32)]
    key = jax.random.PRNGKey(11)
    cfg = EnhancerConfig(mcem=QUICK_MCEM, ablation="clean_z_nomcem",
                         wire_dtype="float32")
    out_1 = Enhancer(model, params, cfg).enhance_batch(
        wavs, key=key, clean_wavs=cleans)
    out_4 = Enhancer(model, params, cfg, mesh=make_mesh(4)).enhance_batch(
        wavs, key=key, clean_wavs=cleans)
    for (sa, _), (sb, _) in zip(out_1, out_4):
        scale = np.abs(sa).max() + 1e-9
        np.testing.assert_allclose(sa / scale, sb / scale, atol=1e-4)


def test_clean_z_nomcem_conditional_enc_dec(subset_dir):
    """The conditional ablation (M2 y_mode='enc_dec' + clean_z_nomcem):
    Zclean is encoded from [|S|^2; y] like the reference's MCEM_M2
    init_parameters (mcem.py:365-366), and the partition identity holds."""
    x1, _ = _wavs(subset_dir)
    s1, _ = read_wav(subset_dir / "processed/ntcd_timit/Clean/test/34M/sa1.wav")
    s1 = s1.astype(np.float32)
    model = CVAE(y_dim=1)
    cfgs = StftConfig()
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.ones((4, 513)), jnp.ones((4, 1)),
    )
    enh = Enhancer(model, params,
                   EnhancerConfig(mcem=QUICK_MCEM, y_mode="enc_dec",
                                  ablation="clean_z_nomcem"))
    y = np.asarray(clean_speech_vad(jnp.asarray(x1), cfgs)).T.reshape(-1, 1)
    (s_hat, n_hat), = enh.enhance_batch(
        [x1], ys=[y], key=jax.random.PRNGKey(3), clean_wavs=[s1])
    assert s_hat.shape == x1.shape and np.isfinite(s_hat).all()
    resid = np.abs((s_hat + n_hat) - x1)[: len(x1) - 1024]
    assert np.median(resid) < 5e-3


def test_enhance_with_vad_conditioning_dec_only(subset_dir):
    """M2v2/v3 'dec_only' mode (CVAE_v2: encoder sees x alone, decoder sees
    [z;y] — MCEM_M2v2 semantics, mcem.py:504) with oracle VAD labels on a
    real wav; partition identity holds."""
    from dvae_tpu.models import CVAE_v2

    x1, _ = _wavs(subset_dir)
    model = CVAE_v2(y_dim=1)
    cfgs = StftConfig()
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.ones((4, 513)), jnp.ones((4, 1)),
    )
    enh = Enhancer(model, params,
                   EnhancerConfig(mcem=QUICK_MCEM, y_mode="dec_only"))
    y = np.asarray(clean_speech_vad(jnp.asarray(x1), cfgs)).T.reshape(-1, 1)
    (s_hat, n_hat), = enh.enhance_batch([x1], ys=[y], key=jax.random.PRNGKey(5))
    assert s_hat.shape == x1.shape and np.isfinite(s_hat).all()
    resid = np.abs((s_hat + n_hat) - x1)[: len(x1) - 1024]
    assert np.median(resid) < 5e-3


def test_long_utterance_enhancement():
    """Long-form audio: a 30 s utterance (≈1875 frames — 5x the corpus's
    longest) must enhance with finite outputs and an exact Wiener partition.
    On the real chip this scales to minutes of audio (measured 2026-08-18:
    120 s at niter=100 in 0.52 s warm, RTF 0.0043, finite — per-frame cost
    IMPROVES with length as the chip fills; evidence/realchip notes).
    Here: tiny budgets on CPU to keep CI fast."""
    import jax

    from dvae_tpu.enhance.mcem import McemConfig
    from dvae_tpu.enhance.pipeline import Enhancer, EnhancerConfig
    from dvae_tpu.models import VAE

    model = VAE(x_dim=513, z_dim=8, h_dim=(16,))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.ones((4, 513)),
    )
    enh = Enhancer(model, params, EnhancerConfig(
        mcem=McemConfig(niter=2, nsamples_e_step=2, burnin_e_step=2,
                        nsamples_wf=2, burnin_wf=2)))
    rng = np.random.default_rng(3)
    wav = (0.1 * rng.standard_normal(30 * 16000)).astype(np.float32)
    (s, n), = enh.enhance_batch([wav], key=jax.random.PRNGKey(2))
    assert len(s) == len(wav)
    assert np.isfinite(s).all() and np.isfinite(n).all()
    np.testing.assert_allclose(s + n, wav, atol=2e-4)


def test_peem_engine_end_to_end(subset_dir, m1):
    """EnhancerConfig(engine='peem'): full wav->wav path through the
    point-estimate engine — Wiener partition reconstructs the mixture, and
    the whole program is deterministic (same inputs -> identical wavs;
    the key only seeds the NMF init)."""
    model, params = m1
    x1, x2 = _wavs(subset_dir)
    enh = Enhancer(model, params, EnhancerConfig(
        mcem=McemConfig(niter=5, peem_steps=3), engine="peem"))
    out = enh.enhance_batch([x1, x2], key=jax.random.PRNGKey(0))
    assert len(out) == 2
    for (s, n), x in zip(out, (x1, x2)):
        assert s.shape == x.shape and np.isfinite(s).all()
        resid = np.abs((s + n) - x)[: len(x) - 1024]
        assert np.median(resid) < 5e-3, f"partition residual {np.median(resid)}"
    again = enh.enhance_batch([x1, x2], key=jax.random.PRNGKey(0))
    for (s, n), (s2, n2) in zip(out, again):
        assert np.array_equal(s, s2) and np.array_equal(n, n2)


def test_peem_engine_rejects_bad_name(m1):
    model, params = m1
    with pytest.raises(ValueError, match="bad engine"):
        Enhancer(model, params, EnhancerConfig(engine="map"))


def test_aot_cache_compile_save_and_fallback(subset_dir, m1, tmp_path):
    """The Enhancer half of the serving cold-boot fix (cfg.aot_dir): first
    sight of a signature lower+compiles, SERIALIZES the executable to disk,
    and matches the plain jit path bitwise; repeated shapes reuse the
    in-memory entry; new shapes are separate programs; corrupt blobs warn
    and degrade to a compile, never a crash.

    The actual cross-process disk RESTORE (zero recompiles on a second
    boot) is pinned by test_serving.py::test_serve_cli_aot_cache_boot in a
    subprocess: XLA:CPU's deserialized executables misexecute under this
    suite's forced 8-device host topology ('Buffer Definition Event ... not
    found'), while a plain single-device process — the actual production
    shape — round-trips fine."""
    model, params = m1
    x1, x2 = _wavs(subset_dir)
    cfg = EnhancerConfig(mcem=QUICK_MCEM, aot_dir=str(tmp_path / "aot"))
    key = jax.random.PRNGKey(7)

    enh1 = Enhancer(model, params, cfg)
    out1 = enh1.enhance_batch([x1, x2], key=key)
    assert (enh1.aot_stats["loaded"], enh1.aot_stats["compiled"]) == (0, 1)
    blobs = list((tmp_path / "aot").glob("core_*.aotx"))
    assert len(blobs) == 1 and blobs[0].stat().st_size > 0
    # same shapes again: in-memory hit, no new load/compile
    enh1.enhance_batch([x2, x1], key=key)
    assert (enh1.aot_stats["loaded"], enh1.aot_stats["compiled"]) == (0, 1)
    # a DIFFERENT shape signature (batch of 1) is a separate program
    enh1.enhance_batch([x1], key=key)
    assert enh1.aot_stats["compiled"] == 2

    # matches the plain jit path bitwise (same math, different dispatch)
    ref = Enhancer(model, params, EnhancerConfig(mcem=QUICK_MCEM))
    for (s1, n1), (sr, nr) in zip(out1, ref.enhance_batch([x1, x2], key=key)):
        np.testing.assert_array_equal(s1, sr)
        np.testing.assert_array_equal(n1, nr)

    # corrupt blob -> warn + recompile, results still served
    for b in (tmp_path / "aot").glob("core_*.aotx"):
        b.write_bytes(b"not a pickle")
    enh3 = Enhancer(model, params, cfg)
    with pytest.warns(UserWarning, match="failed to load"):
        out3 = enh3.enhance_batch([x1, x2], key=key)
    assert enh3.aot_stats["loaded"] == 0 and enh3.aot_stats["compiled"] >= 1
    for (s1, _), (s3, _) in zip(out1, out3):
        np.testing.assert_array_equal(s1, s3)


def test_aot_probe_restores_and_stages(subset_dir, m1, tmp_path):
    """aot_probe (the --ready-on-aot-validate mechanism): False on an
    empty cache; True once a dispatch of the same signature has been
    serialized — by pure host-side DESERIALIZATION, no device program
    execution, so a degraded tunnel's execute path cannot block it. The
    restored executable is STAGED and consumed by the first real dispatch
    of that signature, which still pays the one-shot validation (under
    this suite's forced 8-device topology the deserialized XLA:CPU
    executable misexecutes, so the quarantine path fires — proving a
    staged blob gets the same trust treatment as a loaded one); results
    stay correct either way."""
    import warnings as _warnings

    model, params = m1
    x1, x2 = _wavs(subset_dir)
    cfg = EnhancerConfig(mcem=QUICK_MCEM, aot_dir=str(tmp_path / "aot"))
    key = jax.random.PRNGKey(3)

    enh1 = Enhancer(model, params, cfg)
    assert enh1.aot_probe([x1, x2]) is False        # nothing cached yet
    out1 = enh1.enhance_batch([x1, x2], key=key)    # compile + serialize
    assert enh1.aot_probe([x1, x2]) is True         # in-memory signature hit
    assert not enh1._aot_staged                     # no staging needed

    enh2 = Enhancer(model, params, cfg)
    assert enh2.aot_probe([x1, x2]) is True         # restored from disk
    assert len(enh2._aot_staged) == 1
    assert enh2.aot_stats["loaded"] == 1 and enh2.aot_stats["compiled"] == 0
    # probing again is idempotent: no double deserialize
    assert enh2.aot_probe([x1, x2]) is True
    assert enh2.aot_stats["loaded"] == 1
    # a different signature (batch of 1) has no cached blob
    assert enh2.aot_probe([x1]) is False
    # first dispatch consumes the staged blob; validation may quarantine
    # it under the 8-device topology (recompile serves the batch) — either
    # way the output matches the first boot bitwise
    with _warnings.catch_warnings():
        _warnings.simplefilter("ignore")
        out2 = enh2.enhance_batch([x1, x2], key=key)
    assert not enh2._aot_staged                     # staged blob consumed
    for (s1, n1), (s2, n2) in zip(out1, out2):
        np.testing.assert_array_equal(s1, s2)
        np.testing.assert_array_equal(n1, n2)


def test_aot_cache_disabled_under_mesh(subset_dir, m1, tmp_path):
    """aot_dir + mesh warns and falls back to normal jit dispatch
    (serialized executables bake in single-device shardings)."""
    from dvae_tpu.parallel import make_mesh

    model, params = m1
    x1, x2 = _wavs(subset_dir)
    mesh = make_mesh()
    with pytest.warns(UserWarning, match="mesh"):
        enh = Enhancer(model, params,
                       EnhancerConfig(mcem=QUICK_MCEM,
                                      aot_dir=str(tmp_path / "aot")),
                       mesh=mesh)
    out = enh.enhance_batch([x1, x2] * 4, key=jax.random.PRNGKey(0))
    assert len(out) == 8 and enh.aot_stats == {"loaded": 0, "compiled": 0}
    assert not (tmp_path / "aot").exists()


def test_aot_cache_validation_quarantines_wrong_blob(subset_dir, m1, tmp_path):
    """A blob that DESERIALIZES fine but cannot run this signature's
    program (here: an executable for a different batch shape copied onto
    the wrong key — the same failure mode as a topology-poisoned entry)
    must fail _call_core's first-use VALIDATION, be quarantined to .bad,
    and be replaced by a fresh compile with correct results."""
    import shutil

    model, params = m1
    x1, x2 = _wavs(subset_dir)
    cfg = EnhancerConfig(mcem=QUICK_MCEM, aot_dir=str(tmp_path / "aot"))
    key = jax.random.PRNGKey(7)

    enh1 = Enhancer(model, params, cfg)
    ref = enh1.enhance_batch([x1, x2], key=key)       # compiles sig A
    enh1.enhance_batch([x1], key=key)                 # compiles sig B
    blobs = sorted((tmp_path / "aot").glob("core_*.aotx"))
    assert len(blobs) == 2
    # cross-wire the two entries: both keys now hold the OTHER program
    tmpf = tmp_path / "swap"
    shutil.copy(blobs[0], tmpf)
    shutil.copy(blobs[1], blobs[0])
    shutil.copy(tmpf, blobs[1])

    enh2 = Enhancer(model, params, cfg)
    with pytest.warns(UserWarning, match="(?i)validation|failed to load"):
        out = enh2.enhance_batch([x1, x2], key=key)
    # served correct results via the recompile, never the wrong program
    for (s, n), (sr, nr) in zip(out, ref):
        np.testing.assert_array_equal(s, sr)
    assert enh2.aot_stats["compiled"] >= 1 and enh2.aot_stats["loaded"] == 0
    assert list((tmp_path / "aot").glob("*.bad"))     # quarantined


def test_aot_cache_key_survives_dir_move(subset_dir, m1, tmp_path):
    """aot_dir is EXCLUDED from the program-identity hash (round-3 advisor):
    relocating the cache directory must not invalidate saved executables —
    the path does not affect the compiled program."""
    model, params = m1
    x1, x2 = _wavs(subset_dir)
    key = jax.random.PRNGKey(7)
    d1 = tmp_path / "aot_here"
    enh1 = Enhancer(model, params,
                    EnhancerConfig(mcem=QUICK_MCEM, aot_dir=str(d1)))
    enh1.enhance_batch([x1, x2], key=key)
    assert (enh1.aot_stats["loaded"], enh1.aot_stats["compiled"]) == (0, 1)
    d2 = tmp_path / "aot_moved"
    d1.rename(d2)
    enh2 = Enhancer(model, params,
                    EnhancerConfig(mcem=QUICK_MCEM, aot_dir=str(d2)))
    # the program-identity hash must be path-independent
    assert enh2._aot_static == enh1._aot_static
    # same signature in the relocated dir: the saved blob must be FOUND and
    # load-attempted. Under this suite's forced 8-device host topology the
    # XLA:CPU deserialized executable may then fail first-use validation
    # (quarantine → loaded decremented, blob renamed .bad) — either outcome
    # proves the key matched across the move; a MISS would leave the .aotx
    # untouched and loaded at 0.
    enh2.enhance_batch([x1, x2], key=key)
    assert enh2.aot_stats["loaded"] >= 1 or list(d2.glob("*.bad"))


def test_aot_cache_warns_on_world_writable_dir(subset_dir, m1, tmp_path):
    """Blobs are unpickled on load: a group/world-writable cache dir means
    anyone who can write there can execute code in the server process.
    The Enhancer warns at construction (round-3 advisor)."""
    model, params = m1
    d = tmp_path / "aot_open"
    d.mkdir()
    d.chmod(0o777)
    with pytest.warns(UserWarning, match="world-writable"):
        Enhancer(model, params,
                 EnhancerConfig(mcem=QUICK_MCEM, aot_dir=str(d)))


def test_aot_probe_ablation_needs_clean_wavs(subset_dir, m1, tmp_path):
    """A clean-z ablation Enhancer's real dispatch signature includes the
    clean batch: aot_probe without clean_wavs must refuse (False) instead
    of staging a blob no legal dispatch would use, and WITH clean_wavs it
    probes the signature the ablation dispatch actually produces."""
    model, params = m1
    x1, x2 = _wavs(subset_dir)
    cfg = EnhancerConfig(mcem=QUICK_MCEM, aot_dir=str(tmp_path / "aot"),
                         ablation="clean_z")
    key = jax.random.PRNGKey(3)

    enh1 = Enhancer(model, params, cfg)
    enh1.enhance_batch([x1, x2], key=key, clean_wavs=[x1, x2])
    assert enh1.aot_probe([x1, x2]) is False          # no clean batch
    assert enh1.aot_probe([x1, x2], clean_wavs=[x1, x2]) is True

    enh2 = Enhancer(model, params, cfg)
    assert enh2.aot_probe([x1, x2]) is False
    assert enh2.aot_probe([x1, x2], clean_wavs=[x1, x2]) is True
    assert len(enh2._aot_staged) == 1                 # restored from disk


def test_aot_fresh_miss_validates_before_save(subset_dir, m1, tmp_path):
    """The fresh-miss compile path runs the executable to completion
    BEFORE the blob is saved or published (the poisoned-persistent-cache
    case misexecutes identically on first compile and recompile), and the
    per-segment ledger accounts for it: compile_s and validate_s both
    accrue on a miss."""
    model, params = m1
    x1, x2 = _wavs(subset_dir)
    cfg = EnhancerConfig(mcem=QUICK_MCEM, aot_dir=str(tmp_path / "aot"))

    enh = Enhancer(model, params, cfg)
    enh.enhance_batch([x1, x2], key=jax.random.PRNGKey(3))
    assert enh.aot_stats["compiled"] == 1
    assert enh.aot_stats.get("compile_s", 0) > 0
    assert "validate_s" in enh.aot_stats      # the miss path validated
    assert list((tmp_path / "aot").glob("core_*.aotx"))  # saved after
