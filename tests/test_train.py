"""Training tests: M1 end-to-end on the shipped subset h5, the adversarial
two-optimizer step, data-parallel equivalence on the 8-device CPU mesh, and
checkpoint round-trip / partial-load semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from dvae_tpu.data.datasets import FrameDataset
from dvae_tpu.models import VAE, DisentangledVAE, init_params
from dvae_tpu.parallel import make_mesh, replicate, shard_batch
from dvae_tpu.train import checkpoint as ckpt
from dvae_tpu.train.loop import LoopConfig, fit_vae
from dvae_tpu.train.steps import (
    adam,
    init_adversarial_state,
    init_train_state,
    make_adversarial_step,
    make_train_step,
)

from _helpers import SUBSET_H5


def test_fit_vae_on_subset(tmp_path, subset_dir):
    train = FrameDataset(SUBSET_H5, "train")
    valid = FrameDataset(SUBSET_H5, "validation")
    # lr=1e-3 for a clear descent signal in ~30 steps. Assert on the TRAIN
    # elbo: a 0.23M-param model overfits the 201-frame subset within an
    # epoch or two, so the validation trajectory is shuffle-seed noise —
    # the old validation assertion only ever passed on a lucky rng stream
    cfg = LoopConfig(batch_size=64, start_epoch=1, end_epoch=4, log_interval=1,
                     learning_rate=1e-3)
    model = VAE(x_dim=513, z_dim=16, h_dim=(128, 128))
    params, history = fit_vae(model, train, valid, tmp_path, "M1", False, cfg)
    first, last = history[0]["train"]["elbo"], history[-1]["train"]["elbo"]
    assert last < first, f"train ELBO did not improve: {first} -> {last}"
    # checkpoints written with reference naming
    names = sorted(p.name for p in tmp_path.glob("M1_epoch_*_vloss_*.msgpack"))
    assert len(names) == 3
    best = ckpt.best_checkpoint(tmp_path, "M1")
    restored = ckpt.load_checkpoint(best, params)
    r, mu, lv = model.apply(restored, jnp.asarray(train._x[:8]), rngs={"sample": jax.random.PRNGKey(0)})
    assert r.shape == (8, 513)
    assert (tmp_path / "output_epoch.log").read_text().count("Validation") == 3


def test_adversarial_step_trains_both_players():
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.abs(rng.standard_normal((64, 513))).astype(np.float32) + 0.1)
    y = jnp.asarray((rng.uniform(size=(64, 1)) > 0.5).astype(np.float32))
    model = DisentangledVAE()
    params = init_params(model, {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, y)
    tx_e, tx_a = adam(1e-3), adam(1e-3)
    state = init_adversarial_state(params, tx_e, tx_a)
    step = make_adversarial_step(model, tx_e, tx_a, alpha=0.0, beta=10.0, gamma=1.0)
    m0 = None
    for i in range(15):
        state, m = step(state, x, y, jax.random.PRNGKey(i))
        if m0 is None:
            m0 = {k: float(v) for k, v in m.items()}
    # both parameter groups moved
    d_enc = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()),
                     params["params"]["enc_dec_clf"], state.params["params"]["enc_dec_clf"]),
    )
    d_aux = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()),
                     params["params"]["auxiliary"], state.params["params"]["auxiliary"]),
    )
    assert d_enc > 0 and d_aux > 0
    assert float(m["elbo"]) < m0["elbo"]


def test_adversarial_step_norm():
    """norm= on the adversarial step (std_norm — which the reference's
    adversarial script loads but never applies, training_M2_info_vad.py:126
    vs :159): identity statistics reproduce the unnormalized step to float
    tolerance; real statistics change the model inputs (different metrics)
    while every loss stays finite and the ELBO still compares raw x."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(np.abs(rng.standard_normal((32, 21))).astype(np.float32) + 0.1)
    y = jnp.asarray((rng.uniform(size=(32, 1)) > 0.5).astype(np.float32))
    model = DisentangledVAE(x_dim=21, y_dim=1, z_dim=3, h_dim=(8,))
    params = init_params(model, {"params": jax.random.PRNGKey(0),
                                 "sample": jax.random.PRNGKey(1)}, x, y)
    tx_e, tx_a = adam(1e-3), adam(1e-3)

    def one(norm):
        state = init_adversarial_state(params, tx_e, tx_a)
        step = make_adversarial_step(model, tx_e, tx_a, alpha=0.0, beta=10.0,
                                     gamma=1.0, norm=norm)
        _, m = step(state, x, y, jax.random.PRNGKey(7))
        return {k: float(v) for k, v in m.items()}

    base = one(None)
    ident = one((np.zeros((21, 1), np.float32), np.ones((21, 1), np.float32)))
    for k in base:  # (x-0)/(1+1e-8) perturbs inputs by 1e-8 relative
        assert abs(base[k] - ident[k]) <= 1e-4 * (1 + abs(base[k])), k

    mean = np.full((21, 1), 0.5, np.float32)
    std = np.full((21, 1), 2.0, np.float32)
    scaled = one((mean, std))
    assert all(np.isfinite(v) for v in scaled.values())
    assert scaled["elbo"] != base["elbo"]


def test_adversarial_step_v4_flat_layout():
    """The adversarial game also runs on CVAE_v4's flat parameter tree
    (reference models.py:299-333 — the ntcd_M2v4_* golden families): both
    player groups train, and the split/merge preserves the tree."""
    from dvae_tpu.models import CVAE_v4
    from dvae_tpu.train.steps import _adversarial_layout

    rng = np.random.default_rng(4)
    x = jnp.asarray(np.abs(rng.standard_normal((32, 513))).astype(np.float32) + 0.1)
    y = jnp.asarray((rng.uniform(size=(32, 1)) > 0.5).astype(np.float32))
    model = CVAE_v4()
    params = init_params(model, {"params": jax.random.PRNGKey(0),
                                 "sample": jax.random.PRNGKey(1)}, x, y)
    layout = _adversarial_layout(params)
    assert layout == "v4"
    tx_e, tx_a = adam(1e-3), adam(1e-3)
    state = init_adversarial_state(params, tx_e, tx_a)
    step = make_adversarial_step(model, tx_e, tx_a, alpha=10.0, beta=10.0,
                                 gamma=1.0, y_cond="yhathard", layout=layout)
    for i in range(10):
        state, m = step(state, x, y, jax.random.PRNGKey(i))
        for k, v in m.items():
            assert np.isfinite(float(v)), (i, k)
    assert set(state.params["params"].keys()) == {
        "encoder", "decoder", "classifier", "auxiliary"}
    d_enc = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()),
                     params["params"]["encoder"], state.params["params"]["encoder"]))
    d_aux = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()),
                     params["params"]["auxiliary"], state.params["params"]["auxiliary"]))
    assert d_enc > 0 and d_aux > 0
    # alpha>0 pushes the x-classifier away from the labels (golden-name
    # forensics: BCE rises above chance ~0.69 toward saturation; metrics
    # report alpha*classif)
    assert float(m["classif"]) > 10.0 * 0.69 * 0.3


def test_semisup_step_alpha_sign_controls_classifier():
    """The reconstructed Uloss/Lloss trainer's alpha-sign signature (see
    make_semisup_step's vloss forensics): alpha<0 trains the classifier
    TOWARD the labels (BCE falls below chance ~0.69); alpha>0 is
    adversarial (BCE rises toward log-eps saturation). All metrics stay
    finite even once the classifier saturates."""
    from dvae_tpu.models import CVAE_v3
    from dvae_tpu.train.steps import make_semisup_step

    rng = np.random.default_rng(2)
    x = jnp.asarray(np.abs(rng.standard_normal((64, 513))).astype(np.float32) + 0.1)
    y = jnp.asarray((rng.uniform(size=(64, 1)) > 0.5).astype(np.float32))
    model = CVAE_v3()
    finals = {}
    for alpha in (-10.0, 10.0):
        params = init_params(model, {"params": jax.random.PRNGKey(0),
                                     "sample": jax.random.PRNGKey(1)}, x, y)
        tx = adam(1e-3)
        state = init_train_state(model, params, tx)
        step = make_semisup_step(model, tx, "uloss", alpha, "hardlabel")
        for i in range(30):
            state, m = step(state, x, y, jax.random.PRNGKey(i))
            for k, v in m.items():
                assert np.isfinite(float(v)), (alpha, i, k)
        finals[alpha] = {k: float(v) for k, v in m.items()}
    chance = 0.6931
    assert finals[-10.0]["classif"] < chance * 0.9   # pulled toward labels
    assert finals[10.0]["classif"] > chance * 1.5    # pushed away (saturating)
    # the objective itself keeps optimizing in both regimes
    assert finals[-10.0]["objective"] < 1e5 and finals[10.0]["objective"] < 1e5


def test_legacy_aux_coupling_flips_aux_direction():
    """legacy coupling scales the aux grad by (gamma-beta): with beta=10,
    gamma=1 the two modes must push the auxiliary in opposite directions."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(np.abs(rng.standard_normal((32, 513))).astype(np.float32) + 0.1)
    y = jnp.asarray((rng.uniform(size=(32, 1)) > 0.5).astype(np.float32))
    model = DisentangledVAE()
    params = init_params(model, {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, y)
    tx_e, tx_a = adam(1e-3), adam(1e-3)

    outs = {}
    for legacy in (False, True):
        state = init_adversarial_state(params, tx_e, tx_a)
        step = make_adversarial_step(model, tx_e, tx_a, 0.0, 10.0, 1.0,
                                     legacy_aux_coupling=legacy)
        state, _ = step(state, x, y, jax.random.PRNGKey(2))
        outs[legacy] = state.params["params"]["auxiliary"]
    p0 = np.asarray(params["params"]["auxiliary"]["output_layer"]["kernel"])
    d_clean = np.sign(np.asarray(outs[False]["output_layer"]["kernel"]) - p0)
    d_legacy = np.sign(np.asarray(outs[True]["output_layer"]["kernel"]) - p0)
    frac_opposite = np.mean(d_clean == -d_legacy)
    assert frac_opposite > 0.9


def test_data_parallel_step_matches_single_device():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    rng = np.random.default_rng(2)
    x = np.abs(rng.standard_normal((32, 513))).astype(np.float32) + 0.1
    model = VAE()
    params = model.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, jnp.asarray(x))
    tx = adam(1e-4)
    step = make_train_step(model, tx, conditional=False)

    s1 = init_train_state(model, params, tx)
    s1, m1 = step(s1, jnp.asarray(x), jax.random.PRNGKey(3))

    s2 = init_train_state(model, params, tx)
    s2 = replicate(s2, mesh)
    xs = shard_batch(jnp.asarray(x), mesh)
    s2, m2 = step(s2, xs, jax.random.PRNGKey(3))

    np.testing.assert_allclose(float(m1["elbo"]), float(m2["elbo"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_checkpoint_partial_load(tmp_path):
    model = DisentangledVAE()
    x = jnp.ones((4, 513))
    y = jnp.ones((4, 1))
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    p1 = init_params(model, rngs, x, y)
    p2 = init_params(model, {"params": jax.random.PRNGKey(9), "sample": jax.random.PRNGKey(8)}, x, y)
    ckpt.save_checkpoint(tmp_path, "v5_epoch_001_vloss_1.00", p1, metadata={"epoch": 1})

    merged = ckpt.partial_load(tmp_path / "v5_epoch_001_vloss_1.00.msgpack", p2,
                               "enc_dec_clf/classifier")
    # classifier == p1's, everything else == p2's
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["enc_dec_clf"]["classifier"]["output_layer"]["kernel"]),
        np.asarray(p1["params"]["enc_dec_clf"]["classifier"]["output_layer"]["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["auxiliary"]["output_layer"]["kernel"]),
        np.asarray(p2["params"]["auxiliary"]["output_layer"]["kernel"]))
    sub = ckpt.extract_submodule(merged, "params", "enc_dec_clf")
    assert set(sub.keys()) == {"encoder", "decoder", "classifier"}


def test_partial_load_tolerates_donor_structure_outside_filter(tmp_path):
    """A donor checkpoint whose tree differs OUTSIDE the filtered region
    (e.g. a classifier trained inside a different architecture) must still
    transfer — the reference's filtered state_dict update never validates
    the rest of the donor (training_M2_info_vad_pretrain.py:103-113)."""
    import numpy as np

    model = DisentangledVAE()
    x, y = jnp.ones((4, 513)), jnp.ones((4, 1))
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    p1 = init_params(model, rngs, x, y)
    p2 = init_params(model, {"params": jax.random.PRNGKey(9),
                             "sample": jax.random.PRNGKey(8)}, x, y)
    # donor: classifier only, plus a module the template doesn't have
    donor = {"params": {
        "enc_dec_clf": {"classifier": p1["params"]["enc_dec_clf"]["classifier"]},
        "stranger": {"kernel": jnp.zeros((3, 3))},
    }}
    ckpt.save_checkpoint(tmp_path, "donor_epoch_001_vloss_9.99", donor)
    merged = ckpt.partial_load(tmp_path / "donor_epoch_001_vloss_9.99.msgpack",
                               p2, "enc_dec_clf/classifier")
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["enc_dec_clf"]["classifier"]["output_layer"]["kernel"]),
        np.asarray(p1["params"]["enc_dec_clf"]["classifier"]["output_layer"]["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["enc_dec_clf"]["encoder"]["sample"]["mu"]["kernel"]),
        np.asarray(p2["params"]["enc_dec_clf"]["encoder"]["sample"]["mu"]["kernel"]))

    # filter matching template entries the donor lacks -> descriptive KeyError
    import pytest

    with pytest.raises(KeyError, match="no entry"):
        ckpt.partial_load(tmp_path / "donor_epoch_001_vloss_9.99.msgpack",
                          p2, "enc_dec_clf/encoder")
    # shape mismatch INSIDE the filtered region -> descriptive ValueError
    bad = {"params": {"enc_dec_clf": {"classifier": jax.tree.map(
        lambda a: jnp.zeros(a.shape + (2,)),
        p1["params"]["enc_dec_clf"]["classifier"])}}}
    ckpt.save_checkpoint(tmp_path, "bad_epoch_001_vloss_9.99", bad)
    with pytest.raises(ValueError, match="shape mismatch"):
        ckpt.partial_load(tmp_path / "bad_epoch_001_vloss_9.99.msgpack",
                          p2, "enc_dec_clf/classifier")


def test_fit_vae_resume_restores_optimizer_state(tmp_path, subset_dir):
    """start_epoch > 1 must continue from the previous epoch's checkpoint
    (params AND Adam state) and produce the same result as an uninterrupted
    run with the same seed/schedule."""
    train = FrameDataset(SUBSET_H5, "train")
    valid = FrameDataset(SUBSET_H5, "validation")
    model = VAE(x_dim=513, z_dim=16, h_dim=(32, 32))

    full_dir = tmp_path / "full"
    cfg_full = LoopConfig(batch_size=64, start_epoch=1, end_epoch=4, log_interval=10)
    fit_vae(model, train, valid, full_dir, "M1", False, cfg_full)

    # interrupted run: epochs 1-2, then resume for epoch 3
    part_dir = tmp_path / "part"
    cfg_a = LoopConfig(batch_size=64, start_epoch=1, end_epoch=3, log_interval=10)
    fit_vae(model, train, valid, part_dir, "M1", False, cfg_a)
    cfg_b = LoopConfig(batch_size=64, start_epoch=3, end_epoch=4, log_interval=10)
    fit_vae(model, train, valid, part_dir, "M1", False, cfg_b)

    # per-epoch RNG streams are pure functions of (seed, epoch), so the
    # resumed epoch 3 replays the uninterrupted run's exact shuffle order
    # and sample keys: with restored params+Adam state the validation metric
    # must agree to float precision (not just 'land close')
    import json

    v_full = json.loads((sorted(full_dir.glob("M1_epoch_003_*.json"))[0]).read_text())
    v_part = json.loads((sorted(part_dir.glob("M1_epoch_003_*.json"))[0]).read_text())
    assert abs(v_full["elbo"] - v_part["elbo"]) < 1e-6 * abs(v_full["elbo"])

    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.asarray(train._x[:8]),
    )
    state = init_train_state(model, params, adam(1e-4))
    best = ckpt.best_checkpoint(part_dir, "M1")
    p, o = ckpt.load_checkpoint(best, state.params, state.opt_state)
    assert jax.tree.structure(o) == jax.tree.structure(state.opt_state)


def test_multi_step_dispatch_matches_sequential():
    """make_multi_train_step(K batches in one lax.scan dispatch) must produce
    bitwise the same params as K sequential make_train_step calls with the
    same per-step keys."""
    from dvae_tpu.train.steps import (
        adam, init_train_state, make_multi_train_step, make_train_step,
    )

    model = VAE(x_dim=64, z_dim=8, h_dim=(16,))
    rng = np.random.default_rng(0)
    xs = np.abs(rng.standard_normal((4, 16, 64))).astype(np.float32) + 0.1
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.asarray(xs[0]),
    )
    tx = adam(1e-3)
    s_seq = init_train_state(model, params, tx)
    s_multi = init_train_state(model, params, tx)

    key = jax.random.PRNGKey(7)
    keys = jax.random.split(key, 4)
    step = make_train_step(model, tx, conditional=False)
    for k in range(4):
        s_seq, m_seq = step(s_seq, jnp.asarray(xs[k]), keys[k])

    multi = make_multi_train_step(model, tx, conditional=False)
    s_multi, m_multi = multi(s_multi, jnp.asarray(xs), key)

    assert int(s_multi.step) == int(s_seq.step) == 4
    for a, b in zip(jax.tree.leaves(s_seq.params), jax.tree.leaves(s_multi.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fit_vae_steps_per_dispatch(tmp_path, subset_dir):
    """The loop with steps_per_dispatch>1 trains and checkpoints normally."""
    train = FrameDataset(SUBSET_H5, "train")
    valid = FrameDataset(SUBSET_H5, "validation")
    cfg = LoopConfig(batch_size=64, start_epoch=1, end_epoch=3,
                     log_interval=1, steps_per_dispatch=4)
    model = VAE(x_dim=513, z_dim=16, h_dim=(32, 32))
    params, history = fit_vae(model, train, valid, tmp_path, "M1", False, cfg)
    assert len(history) == 2
    assert (tmp_path / "output_epoch.log").read_text().count("Validation") == 2


def test_adversarial_multi_step_matches_sequential():
    """The scanned adversarial multi-step must equal K sequential steps."""
    from dvae_tpu.models import DisentangledVAE, init_params
    from dvae_tpu.train.steps import (
        adam, init_adversarial_state, make_adversarial_step,
    )

    model = DisentangledVAE(x_dim=64, y_dim=1, z_dim=8, h_dim=(16,))
    rng = np.random.default_rng(1)
    xs = np.abs(rng.standard_normal((3, 8, 64))).astype(np.float32) + 0.1
    ys = (rng.uniform(size=(3, 8, 1)) > 0.5).astype(np.float32)
    params = init_params(
        model, {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.asarray(xs[0]), jnp.asarray(ys[0]),
    )
    tx_e, tx_a = adam(1e-3), adam(1e-3)
    kwargs = dict(alpha=0.0, beta=10.0, gamma=1.0)
    s_seq = init_adversarial_state(params, tx_e, tx_a)
    s_mul = init_adversarial_state(params, tx_e, tx_a)

    key = jax.random.PRNGKey(11)
    keys = jax.random.split(key, 3)
    step = make_adversarial_step(model, tx_e, tx_a, **kwargs)
    for k in range(3):
        s_seq, _ = step(s_seq, jnp.asarray(xs[k]), jnp.asarray(ys[k]), keys[k])

    multi = make_adversarial_step(model, tx_e, tx_a, **kwargs, multi=True)
    s_mul, ms = multi(s_mul, jnp.asarray(xs), jnp.asarray(ys), key)

    assert int(s_mul.step) == int(s_seq.step) == 3
    for a, b in zip(jax.tree.leaves(s_seq.params), jax.tree.leaves(s_mul.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_freeze_substring_keeps_params_fixed():
    """freeze_substring='classifier' must keep the classifier head bitwise
    unchanged while the rest of the enc group trains (the REAL version of
    the reference's no-op freeze)."""
    from dvae_tpu.models import DisentangledVAE, init_params
    from dvae_tpu.train.steps import (
        adam, init_adversarial_state, make_adversarial_step,
    )

    model = DisentangledVAE(x_dim=64, y_dim=1, z_dim=8, h_dim=(16,))
    rng = np.random.default_rng(2)
    x = jnp.asarray(np.abs(rng.standard_normal((8, 64))).astype(np.float32) + 0.1)
    y = jnp.asarray((rng.uniform(size=(8, 1)) > 0.5).astype(np.float32))
    params = init_params(
        model, {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, y
    )
    tx_e, tx_a = adam(1e-2), adam(1e-2)
    state = init_adversarial_state(params, tx_e, tx_a)
    step = make_adversarial_step(model, tx_e, tx_a, alpha=1.0, beta=1.0,
                                 gamma=1.0, freeze_substring="classifier")
    clf_before = jax.tree.map(
        np.asarray, state.params["params"]["enc_dec_clf"]["classifier"])
    enc_before = np.asarray(
        jax.tree.leaves(state.params["params"]["enc_dec_clf"]["encoder"])[0])
    for k in range(3):
        state, _ = step(state, x, y, jax.random.PRNGKey(k))
    clf_after = state.params["params"]["enc_dec_clf"]["classifier"]
    for a, b in zip(jax.tree.leaves(clf_before), jax.tree.leaves(clf_after)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    enc_after = np.asarray(
        jax.tree.leaves(state.params["params"]["enc_dec_clf"]["encoder"])[0])
    assert not np.array_equal(enc_before, enc_after)  # the rest still trains


def test_multi_step_dispatch_composes_with_mesh():
    """K-step scanned dispatch over a mesh-sharded (K, B, F) stack must match
    K sequential mesh-sharded steps bitwise — steps_per_dispatch and
    --data-parallel are no longer mutually exclusive."""
    from dvae_tpu.parallel.distributed import distribute_batch
    from dvae_tpu.train.steps import (
        adam, init_train_state, make_multi_train_step, make_train_step,
    )

    mesh = make_mesh(8)
    model = VAE(x_dim=64, z_dim=8, h_dim=(16,))
    rng = np.random.default_rng(2)
    xs = np.abs(rng.standard_normal((4, 16, 64))).astype(np.float32) + 0.1
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.asarray(xs[0]),
    )
    tx = adam(1e-3)
    s_seq = replicate(init_train_state(model, params, tx), mesh)
    s_multi = replicate(init_train_state(model, params, tx), mesh)

    key = jax.random.PRNGKey(7)
    keys = jax.random.split(key, 4)
    step = make_train_step(model, tx, conditional=False)
    for k in range(4):
        x_sh = distribute_batch(xs[k], mesh)
        s_seq, _ = step(s_seq, x_sh, keys[k])

    multi = make_multi_train_step(model, tx, conditional=False)
    xs_sh = distribute_batch(xs, mesh, batch_dim=1)  # shard B, not the scan axis
    s_multi, _ = multi(s_multi, xs_sh, key)

    assert int(s_multi.step) == int(s_seq.step) == 4
    for a, b in zip(jax.tree.leaves(s_seq.params), jax.tree.leaves(s_multi.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fit_vae_steps_per_dispatch_with_mesh(tmp_path, subset_dir):
    """The epoch driver runs scanned multi-step dispatch over a data mesh."""
    mesh = make_mesh(8)
    train = FrameDataset(SUBSET_H5, "train")
    valid = FrameDataset(SUBSET_H5, "validation")
    cfg = LoopConfig(batch_size=64, start_epoch=1, end_epoch=3,
                     log_interval=1, steps_per_dispatch=4)
    model = VAE(x_dim=513, z_dim=16, h_dim=(32, 32))
    params, history = fit_vae(model, train, valid, tmp_path, "M1", False, cfg,
                              mesh=mesh)
    assert len(history) == 2
    assert all(np.isfinite(h["valid"]["elbo"]) for h in history)
    assert (tmp_path / "output_epoch.log").read_text().count("Validation") == 2


def test_lstm_vad_step_learns_and_masks_padding():
    """The sequence-training step (train/sequence.py): loss decreases on a
    separable toy problem, and padded frames are excluded — metrics are
    identical whether an utterance arrives exact-length or zero-padded."""
    from dvae_tpu.models import LSTMVad
    from dvae_tpu.train.sequence import make_lstm_vad_eval, make_lstm_vad_step
    from dvae_tpu.train.steps import adam, init_train_state

    rng = np.random.default_rng(0)
    B, T, F = 4, 24, 32
    y = (rng.uniform(size=(B, T)) > 0.5).astype(np.float32)
    x = rng.standard_normal((B, T, F)).astype(np.float32) * 0.1
    x[..., 0] += 3.0 * y  # feature 0 carries the label
    mask = np.ones((B, T), np.float32)

    model = LSTMVad(x_dim=F, hidden=16, num_layers=1)
    params = model.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x))
    tx = adam(1e-2)
    state = init_train_state(model, params, tx)
    step = make_lstm_vad_step(model, tx)

    first = None
    for _ in range(30):
        state, m = step(state, jnp.asarray(x), jnp.asarray(y), jnp.asarray(mask))
        first = first if first is not None else float(m["bce"])
    assert float(m["bce"]) < first * 0.5, (first, float(m["bce"]))
    assert float(m["f1"]) > 0.8

    # padding invariance: extra zero frames with mask=0 must not change
    # the masked metrics
    evaluate = make_lstm_vad_eval(model)
    base = evaluate(state.params, jnp.asarray(x), jnp.asarray(y), jnp.asarray(mask))
    pad = 8
    xp = np.concatenate([x, np.zeros((B, pad, F), np.float32)], axis=1)
    yp = np.concatenate([y, np.zeros((B, pad), np.float32)], axis=1)
    mp = np.concatenate([mask, np.zeros((B, pad), np.float32)], axis=1)
    padded = evaluate(state.params, jnp.asarray(xp), jnp.asarray(yp), jnp.asarray(mp))
    assert abs(float(base["bce"]) - float(padded["bce"])) < 1e-5
    assert abs(float(base["f1"]) - float(padded["f1"])) < 1e-5


def test_lstm_vad_norm_matches_prenormalized_inputs():
    """norm= on the sequence step/eval (the reference's std_norm=True
    default, train_audio_net.py:72): feeding raw x with norm=(mean, std)
    must equal feeding (x-mean)/(std+eps) with norm=None, bitwise."""
    from dvae_tpu.models import LSTMVad
    from dvae_tpu.train.sequence import make_lstm_vad_eval, make_lstm_vad_step
    from dvae_tpu.train.steps import adam, init_train_state

    rng = np.random.default_rng(1)
    B, T, F = 3, 10, 16
    eps = 1e-8
    x = rng.standard_normal((B, T, F)).astype(np.float32)
    y = (rng.uniform(size=(B, T)) > 0.5).astype(np.float32)
    mask = np.ones((B, T), np.float32)
    mean = rng.standard_normal((F, 1)).astype(np.float32)  # (F,1) h5 layout
    std = (0.5 + rng.uniform(size=(F, 1))).astype(np.float32)
    x_pre = ((x - mean.T[None]) / (std.T[None] + np.float32(eps))).astype(np.float32)

    model = LSTMVad(x_dim=F, hidden=8, num_layers=1)
    params = model.init({"params": jax.random.PRNGKey(3)}, jnp.asarray(x))
    tx = adam(1e-3)

    ev_norm = make_lstm_vad_eval(model, norm=(mean, std))
    ev_plain = make_lstm_vad_eval(model)
    a = ev_norm(params, jnp.asarray(x), jnp.asarray(y), jnp.asarray(mask))
    b = ev_plain(params, jnp.asarray(x_pre), jnp.asarray(y), jnp.asarray(mask))
    for k in a:
        assert float(a[k]) == float(b[k]), k

    st_norm = init_train_state(model, params, tx)
    st_plain = init_train_state(model, params, tx)
    step_norm = make_lstm_vad_step(model, tx, norm=(mean, std))
    step_plain = make_lstm_vad_step(model, tx)
    st_norm, ma = step_norm(st_norm, jnp.asarray(x), jnp.asarray(y), jnp.asarray(mask))
    st_plain, mb = step_plain(st_plain, jnp.asarray(x_pre), jnp.asarray(y), jnp.asarray(mask))
    assert float(ma["bce"]) == float(mb["bce"])
    # params: allow 1-ULP drift (XLA may fuse the in-graph normalization
    # into neighboring ops with different rounding than the host path)
    for pa, pb in zip(jax.tree.leaves(st_norm.params), jax.tree.leaves(st_plain.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=1e-6, atol=1e-9)


def test_frame_dataset_out_of_core_matches_in_memory():
    """in_memory=False (--no-in-memory, for the multi-GB complete-corpus
    h5): same length/dims/statistics, and a shuffled epoch visits exactly
    the same (x, y) ROWS as the in-memory path given the same rng seed —
    the out-of-core branch sorts indices WITHIN a batch for h5 fancy
    indexing, so compare per-batch row sets, not row order."""
    from _helpers import SUBSET_H5

    mem = FrameDataset(SUBSET_H5, "train", in_memory=True)
    ooc = FrameDataset(SUBSET_H5, "train", in_memory=False)
    assert len(mem) == len(ooc) and mem.x_dim == ooc.x_dim
    assert mem.y_dim == ooc.y_dim
    np.testing.assert_array_equal(np.asarray(mem.mean_std[0]),
                                  np.asarray(ooc.mean_std[0]))

    def rows(ds):
        out = []
        for x, y in ds.batches(32, np.random.default_rng(7)):
            # canonicalize each batch by sorting rows lexicographically
            xy = np.concatenate([np.asarray(x), np.asarray(y)], axis=1)
            out.append(xy[np.lexsort(xy.T[::-1])])
        return out

    for a, b in zip(rows(mem), rows(ooc)):
        np.testing.assert_array_equal(a, b)


def test_batch_utterances_labels_shorter_than_audio():
    """Labels that trim the frame count far below the wav's own frames
    (video-trim semantics) must not crash the batcher (regression: the
    sample-fill slice used len(w) on the left and t_pad on the right)."""
    from dvae_tpu.ops.stft import StftConfig
    from dvae_tpu.train.sequence import batch_utterances

    class TinyDs:
        def __init__(self):
            rng = np.random.default_rng(1)
            self.items = [
                (rng.standard_normal(120_000).astype(np.float32),  # long wav
                 np.ones(3, np.float32)),                           # 3 frames
                (rng.standard_normal(16_000).astype(np.float32),
                 np.ones(40, np.float32)),
            ]

        def __getitem__(self, i):
            return self.items[i]

    cfg = StftConfig(center=False)
    x, y, m = batch_utterances(TinyDs(), [0, 1], cfg)
    assert x.shape[0] == 2 and x.shape[1] == y.shape[1] == m.shape[1]
    assert float(m[0].sum()) == 3.0
    assert float(m[1].sum()) == 40.0


def test_batch_utterances_zero_length_labels():
    """A label vector trimmed to ZERO frames must neither crash the batcher
    nor score: the 1-frame placeholder row stays fully masked."""
    from dvae_tpu.ops.stft import StftConfig
    from dvae_tpu.train.sequence import batch_utterances

    class TinyDs:
        def __init__(self):
            rng = np.random.default_rng(2)
            self.items = [
                (rng.standard_normal(16_000).astype(np.float32),
                 np.zeros(0, np.float32)),                       # empty labels
                (rng.standard_normal(16_000).astype(np.float32),
                 np.ones(10, np.float32)),
            ]

        def __getitem__(self, i):
            return self.items[i]

    x, y, m = batch_utterances(TinyDs(), [0, 1], StftConfig(center=False))
    assert float(m[0].sum()) == 0.0  # placeholder row fully masked
    assert float(m[1].sum()) == 10.0
    assert np.isfinite(np.asarray(x)).all()


def test_device_data_matches_host_fed(tmp_path, subset_dir):
    """LoopConfig.device_data: the index-fed on-device-gather loop
    reproduces the host-fed run — same shuffle order, same key stream,
    same elbo body (steps.make_gather_train_steps) — including under
    multi-step dispatch. Only the data PATH changes (one upload + int32
    indices instead of per-dispatch batch stacks)."""
    train = FrameDataset(SUBSET_H5, "train")
    valid = FrameDataset(SUBSET_H5, "validation")
    model = VAE(x_dim=513, z_dim=4, h_dim=(16,))
    base = dict(batch_size=64, end_epoch=4, steps_per_dispatch=2,
                learning_rate=1e-3, seed=3)
    p_host, h_host = fit_vae(model, train, valid, tmp_path / "host", "M1",
                             False, LoopConfig(**base))
    p_dev, h_dev = fit_vae(model, train, valid, tmp_path / "dev", "M1",
                           False, LoopConfig(**base, device_data=True))
    for a, b in zip(jax.tree.leaves(p_host), jax.tree.leaves(p_dev)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=5e-6)
    for eh, ed in zip(h_host, h_dev):
        assert abs(eh["valid"]["elbo"] - ed["valid"]["elbo"]) \
            <= 1e-4 * abs(eh["valid"]["elbo"])
        assert abs(eh["train"]["elbo"] - ed["train"]["elbo"]) \
            <= 1e-4 * abs(eh["train"]["elbo"])


def test_device_data_composes_with_mesh(tmp_path, subset_dir):
    """device_data + --data-parallel + multi-step dispatch together: the
    split is replicated, indices shard over the data axis, and the run
    matches the HOST-FED run on the same mesh (identical collectives, so
    the only delta is the data path)."""
    train = FrameDataset(SUBSET_H5, "train")
    valid = FrameDataset(SUBSET_H5, "validation")
    model = VAE(x_dim=513, z_dim=4, h_dim=(16,))
    base = dict(batch_size=64, end_epoch=3, steps_per_dispatch=2,
                learning_rate=1e-3, seed=5)
    mesh = make_mesh(8)
    p_host, _ = fit_vae(model, train, valid, tmp_path / "host", "M1",
                        False, LoopConfig(**base), mesh=mesh)
    p_dev, _ = fit_vae(model, train, valid, tmp_path / "dev", "M1",
                       False, LoopConfig(**base, device_data=True),
                       mesh=mesh)
    for a, b in zip(jax.tree.leaves(p_host), jax.tree.leaves(p_dev)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=5e-6)


def test_gather_step_equals_plain_step():
    """One gather step on indices == one plain step on the gathered rows
    (same key): the device-data path is the same math by construction."""
    from dvae_tpu.train.steps import make_gather_train_steps

    rng = np.random.default_rng(0)
    data = np.abs(rng.standard_normal((40, 64))).astype(np.float32) + 0.1
    model = VAE(x_dim=64, z_dim=4, h_dim=(16,))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.asarray(data[:2]))
    tx = adam(1e-3)
    s_a = init_train_state(model, params, tx)
    s_b = init_train_state(model, params, tx)
    idx = np.array([5, 17, 3, 29, 11, 20, 8, 31], np.int32)
    key = jax.random.PRNGKey(9)

    plain = make_train_step(model, tx, conditional=False)
    s_a, m_a = plain(s_a, jnp.asarray(data[idx]), key)
    gstep, _gmulti = make_gather_train_steps(model, tx, False,
                                             jnp.asarray(data))
    s_b, m_b = gstep(s_b, jnp.asarray(idx), None, key)
    assert abs(float(m_a["elbo"]) - float(m_b["elbo"])) \
        <= 1e-5 * abs(float(m_a["elbo"]))
    for a, b in zip(jax.tree.leaves(s_a.params), jax.tree.leaves(s_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-6)


def test_device_data_adversarial_and_semisup_match_host(tmp_path, subset_dir):
    """The generic index-fed adapter (steps.index_fed_steps): the
    adversarial and semisup fitters reproduce their host-fed runs under
    device_data to float tolerance — labels gather on-device too."""
    from dvae_tpu.models.cvae import CVAE_v3
    from dvae_tpu.train.loop import fit_adversarial, fit_semisup

    train = FrameDataset(SUBSET_H5, "train")
    valid = FrameDataset(SUBSET_H5, "validation")
    base = dict(batch_size=64, end_epoch=3, steps_per_dispatch=2,
                learning_rate=1e-3, seed=7)

    adv = DisentangledVAE(y_dim=513, z_dim=4, h_dim=(16,))
    p_h, _ = fit_adversarial(adv, train, valid, tmp_path / "adv_h", "M2_info",
                             alpha=0.0, beta=10.0, gamma=1.0,
                             cfg=LoopConfig(**base))
    p_d, _ = fit_adversarial(adv, train, valid, tmp_path / "adv_d", "M2_info",
                             alpha=0.0, beta=10.0, gamma=1.0,
                             cfg=LoopConfig(**base, device_data=True))
    for a, b in zip(jax.tree.leaves(p_h), jax.tree.leaves(p_d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=5e-6)

    v3 = CVAE_v3(y_dim=513, z_dim=4, h_dim=(16,))
    p_h, _ = fit_semisup(v3, train, valid, tmp_path / "ss_h", "M2v3",
                         objective="uloss", alpha=0.1,
                         cfg=LoopConfig(**base))
    p_d, _ = fit_semisup(v3, train, valid, tmp_path / "ss_d", "M2v3",
                         objective="uloss", alpha=0.1,
                         cfg=LoopConfig(**base, device_data=True))
    for a, b in zip(jax.tree.leaves(p_h), jax.tree.leaves(p_d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=5e-6)


def test_device_data_matches_host_fed_with_std_norm(tmp_path, subset_dir):
    """std_norm composes with device_data: the gather steps thread the
    normalization stats through the same elbo body."""
    train = FrameDataset(SUBSET_H5, "train")
    valid = FrameDataset(SUBSET_H5, "validation")
    model = VAE(x_dim=513, z_dim=4, h_dim=(16,))
    base = dict(batch_size=64, end_epoch=3, steps_per_dispatch=2,
                learning_rate=1e-3, seed=11, std_norm=True)
    p_host, _ = fit_vae(model, train, valid, tmp_path / "host", "M1",
                        False, LoopConfig(**base))
    p_dev, _ = fit_vae(model, train, valid, tmp_path / "dev", "M1",
                       False, LoopConfig(**base, device_data=True))
    for a, b in zip(jax.tree.leaves(p_host), jax.tree.leaves(p_dev)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=5e-6)
