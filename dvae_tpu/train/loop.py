"""Epoch-driven training loops with reference-parity logging and checkpoints.

Mirrors the loop shape of training_M1.py:122-196 / training_M2_info_vad.py:
149-281: per-batch metrics to ``output_batch.log`` every ``log_interval``
steps, per-epoch train+validation metric lines to stdout and
``output_epoch.log``, and one checkpoint per epoch named
``<prefix>_epoch_{e:03d}_vloss_{v:.2f}``.

Data-parallel scale-out: pass a ``mesh`` — batches are sharded over the
``data`` axis and params replicated; XLA inserts the gradient reductions
(this replaces the reference's single-device loops and the DataParallel of
train_audio_net.py:150).
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from dvae_tpu.parallel.distributed import distribute_batch
from dvae_tpu.parallel.mesh import replicate
from dvae_tpu.train import checkpoint as ckpt
from dvae_tpu.train.steps import (
    adam,
    init_adversarial_state,
    init_train_state,
    make_adversarial_eval_step,
    make_adversarial_step,
    make_eval_step,
    make_multi_train_step,
    make_semisup_eval_step,
    make_semisup_step,
    make_train_step,
)


@dataclasses.dataclass
class LoopConfig:
    batch_size: int = 128
    learning_rate: float = 1e-4
    start_epoch: int = 1
    end_epoch: int = 500
    log_interval: int = 250
    seed: int = 0
    eps: float = 1e-8
    std_norm: bool = False
    drop_last: bool = False
    # K optimizer steps per device dispatch (lax.scan over stacked batches,
    # steps.make_multi_train_step): identical math, K-1 fewer host round
    # trips per K batches. 1 = reference-style one dispatch per batch.
    # Composes with a mesh: the (K, B, ...) stack is sharded over the data
    # axis on B (scan axis unsharded), so multi-step dispatch and
    # --data-parallel work together; batches whose B doesn't divide the
    # mesh run one-at-a-time with wrap-padding instead.
    steps_per_dispatch: int = 1
    # Upload each split to the device ONCE and feed the step functions
    # int32 indices (rows gathered on-device, steps.make_gather_train_steps)
    # instead of shipping (K, B, F) float stacks every dispatch — over a
    # remote-attached chip the stack traffic IS the epoch wall time. Same
    # math, same shuffle order, same key stream as the host-fed path
    # (all frame trainers: fit_vae / fit_semisup / fit_adversarial;
    # requires an in-memory dataset). Measured on the real chip: 2.4x e2e
    # at 100 steps/dispatch, 26x at 1000 (evidence/training_throughput*).
    device_data: bool = False


class _Logger:
    """Reference-format batch/epoch logs. In a multi-process run only
    process 0 writes (and prints) — every host computes identical metrics,
    and N hosts appending to one shared-filesystem log would interleave."""

    def __init__(self, model_dir, append: bool = False):
        import pathlib

        self.enabled = jax.process_index() == 0
        self.dir = pathlib.Path(model_dir)
        if not self.enabled:
            return
        self.dir.mkdir(parents=True, exist_ok=True)
        if not append:
            (self.dir / "output_batch.log").write_text("")
            (self.dir / "output_epoch.log").write_text("")

    def batch(self, msg):
        if not self.enabled:
            return
        with open(self.dir / "output_batch.log", "a") as f:
            print(msg, file=f)

    def epoch(self, msg):
        if not self.enabled:
            return
        print(msg)
        with open(self.dir / "output_epoch.log", "a") as f:
            print(msg, file=f)


def _resume_checkpoint(model_dir, prefix: str, start_epoch: int):
    """Path of the epoch-(start_epoch-1) checkpoint, or None.

    The reference's start_epoch knob restarts from scratch (SURVEY §5:
    "no optimizer-state resume"); here start_epoch > 1 restores both params
    and optimizer state from the previous epoch's checkpoint."""
    import pathlib

    if start_epoch <= 1:
        return None
    hits = sorted(
        pathlib.Path(model_dir).glob(f"{prefix}_epoch_{start_epoch - 1:03d}_vloss_*.msgpack"),
        key=lambda q: q.stat().st_mtime,  # several files for one epoch
        # (e.g. a crashed resume re-ran it): take the newest, not the
        # lexicographically-last vloss string
    )
    if not hits:
        raise FileNotFoundError(
            f"start_epoch={start_epoch} but no epoch-{start_epoch - 1} checkpoint "
            f"under {model_dir} — silently restarting from scratch would discard "
            f"the requested resume. If the run dir name changed because "
            f"--end-epoch changed, pass --run-name with the original name."
        )
    return hits[-1]


def _fmt(metrics: dict) -> str:
    return "    ".join(f"{k}: {float(v):.3f}" for k, v in metrics.items())


def _upload_split(ds, with_labels: bool, mesh):
    """One-time device upload of a FrameDataset split for the
    device-resident training path (replicated under a mesh: each device
    gathers its shard's rows from a local copy — frame splits are small,
    the win is wire traffic, not HBM)."""
    x, y = ds.arrays
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32) if with_labels else None
    if mesh is not None:
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        rep = NamedSharding(mesh, P())
        x = jax.device_put(x, rep)
        y = jax.device_put(y, rep) if y is not None else None
    return x, y


def _index_fed(mesh, train_ds, valid_ds, step, multi_step, evaluate,
               with_labels: bool = True):
    """Swap a (step, multi, eval) trio and datasets to the index-fed
    device-data equivalents (steps.index_fed_steps)."""
    from dvae_tpu.train.steps import index_fed_steps

    data, labels = _upload_split(train_ds, with_labels, mesh)
    v_data, v_labels = _upload_split(valid_ds, with_labels, mesh)
    gstep, gmulti, geval = index_fed_steps(
        step, multi_step, evaluate, data, labels, v_data, v_labels)
    return _IndexDataset(train_ds), _IndexDataset(valid_ds), \
        gstep, gmulti, geval


class _IndexDataset:
    """Wraps a dataset so ``batches`` yields (int32 index batch, None) with
    EXACTLY the host path's batch composition — both paths call the one
    shared generator (data.datasets.index_batches), so the device-data
    loop reproduces the host-fed loop's shuffle order and key stream by
    construction."""

    def __init__(self, ds):
        self._n = len(ds)

    def __len__(self):
        return self._n

    def batches(self, batch_size: int, rng=None, drop_last: bool = False):
        from dvae_tpu.data.datasets import index_batches

        for sel in index_batches(self._n, batch_size, rng, drop_last):
            yield sel.astype(np.int32), None


def _pad_shardable(batch, mesh):
    """Wrap-pad a trailing partial batch so its leading dim divides the mesh.

    Wrapping (repeating rows from the batch start) keeps every row a real
    sample — zero-padding would feed x=0 into the Itakura-Saito ELBO, whose
    log(x/r) term is -inf at zero. The duplicated rows slightly overweight
    that one trailing batch's gradient; the alternative (drop_last) changes
    the epoch's sample count vs the reference."""
    if mesh is None:
        return batch
    size = mesh.devices.size
    n = batch[0].shape[0]
    if n % size == 0:
        return batch
    target = -(-n // size) * size
    idx = np.arange(target) % n
    return tuple(b[idx] if b is not None else None for b in batch)


def _run_epochs(
    state,
    train_ds,
    valid_ds,
    model_dir,
    prefix: str,
    cfg: LoopConfig,
    mesh,
    run_step,          # (state, x, y, key) -> (state, metrics)
    run_multi,         # (state, xs, ys, key) -> (state, metrics), or None
    run_eval,          # (params, x, y, key) -> metrics
    stack_labels: bool,  # whether run_multi consumes a stacked label array
    vloss_key: str,    # which validation metric names checkpoints / best
    ckpt_opt_state,    # state -> opt-state payload for save_checkpoint
    resumed: bool,
):
    """The shared epoch driver behind fit_vae / fit_adversarial: buffered
    multi-step dispatch, mesh sharding, reference-format logging, per-epoch
    checkpointing, best-params tracking."""
    log = _Logger(model_dir, append=resumed)
    history = []
    best = (np.inf, None)
    n_train = max(1, -(-len(train_ds) // cfg.batch_size))
    n_valid = max(1, -(-len(valid_ds) // cfg.batch_size))
    mesh_size = mesh.devices.size if mesh is not None else 1

    for epoch in range(cfg.start_epoch, cfg.end_epoch):
        # Per-epoch RNG streams, pure functions of (seed, epoch):
        # * a resumed run (start_epoch > 1) reproduces exactly the shuffle
        #   orders and sample keys the uninterrupted run would have used for
        #   these epochs, instead of replaying epoch 1's randomness;
        # * fold_in over a tagged lane keeps the loop's key chain disjoint
        #   from the fitters' init keys (split(PRNGKey(seed)) — reusing the
        #   root directly made batch 1's keys collide with the init keys).
        rng = np.random.default_rng((cfg.seed, epoch))
        key = jax.random.fold_in(
            jax.random.fold_in(jax.random.PRNGKey(cfg.seed), 0x10F), epoch)
        t0 = time.perf_counter()
        totals = {}
        i = 0
        buf = []

        def flush(state, key):
            """Run the buffered batches: one scanned dispatch when the buffer
            holds several same-shape batches, the plain step otherwise.
            Metrics from a scanned dispatch are per-step means, so they enter
            the epoch totals weighted by the number of steps."""
            nonlocal i
            if not buf:
                return state
            if run_multi is not None and len(buf) > 1:
                xs = np.stack([b[0] for b in buf])
                ys = np.stack([b[1] for b in buf]) if stack_labels else None
                if mesh is not None:
                    # shard the (K, B, ...) stack on B; scan axis K unsharded
                    xs, ys = distribute_batch((xs, ys), mesh, batch_dim=1)
                state, metrics = run_multi(state, xs, ys, key)
                weight = len(buf)
            else:
                x, y = buf[0]
                if mesh is not None:
                    x, y = _pad_shardable((x, y), mesh)
                    x, y = distribute_batch((x, y), mesh)
                state, metrics = run_step(state, x, y, key)
                weight = 1
            for k, v in metrics.items():
                totals[k] = totals.get(k, 0.0) + float(v) * weight
            if i % cfg.log_interval < weight:
                log.batch(f"Train Epoch: {epoch:2d} [{i}/{n_train}]    {_fmt(metrics)}")
            i += weight
            buf.clear()
            return state

        # multi-step dispatch needs same-shape batches; under a mesh the
        # batch dim must additionally divide the mesh (wrap-padding a whole
        # stack would mix padded and real rows within scan steps) — batches
        # that don't qualify run one-at-a-time through the padded step path
        group = cfg.steps_per_dispatch if run_multi is not None else 1
        first_shape = None
        for x, y in train_ds.batches(cfg.batch_size, rng, cfg.drop_last):
            key, sk = jax.random.split(key)
            if first_shape is None:
                first_shape = x.shape
            groupable = x.shape == first_shape and x.shape[0] % mesh_size == 0
            if not groupable:  # ragged trailing batch: run alone
                state = flush(state, sk)
                buf.append((x, y))
                key, sk = jax.random.split(key)
                state = flush(state, sk)
                continue
            buf.append((x, y))
            if len(buf) >= group:
                state = flush(state, sk)
        key, sk = jax.random.split(key)
        state = flush(state, sk)
        # divide by the steps actually run: with drop_last the trailing batch
        # never runs and ceil(len/bs) would bias every train metric low
        train_avg = {k: v / max(i, 1) for k, v in totals.items()}

        totals = {}
        for x, y in valid_ds.batches(cfg.batch_size):
            key, sk = jax.random.split(key)
            if mesh is not None and x.shape[0] % mesh_size == 0:
                x, y = distribute_batch((x, y), mesh)
            # trailing partial batches run unsharded: wrap-padding would
            # double-count rows in the validation mean, and vloss picks the
            # best checkpoint — it must be exact
            m = run_eval(state.params, x, y, sk)
            for k, v in m.items():
                totals[k] = totals.get(k, 0.0) + float(v)
        valid_avg = {k: v / n_valid for k, v in totals.items()}

        dt = time.perf_counter() - t0
        log.epoch(f"Epoch: {epoch} ({dt:.1f}s)")
        log.epoch(f"[Train]\t\t {_fmt(train_avg)}")
        log.epoch(f"[Validation]\t {_fmt(valid_avg)}")

        vloss = valid_avg[vloss_key]
        name = ckpt.checkpoint_name(prefix, epoch, vloss)
        if jax.process_index() == 0:  # hosts compute identical metrics;
            # concurrent writes to a shared models dir would corrupt files
            ckpt.save_checkpoint(model_dir, name, state.params,
                                 opt_state=ckpt_opt_state(state),
                                 metadata={"epoch": epoch, **valid_avg})
        history.append({"epoch": epoch, "train": train_avg, "valid": valid_avg})
        if vloss < best[0]:
            best = (vloss, jax.device_get(state.params))

    return best[1] if best[1] is not None else jax.device_get(state.params), history


def fit_vae(
    model,
    train_ds,
    valid_ds,
    model_dir,
    prefix: str,
    conditional: bool,
    cfg: LoopConfig = LoopConfig(),
    mesh=None,
    init_params_fn=None,
):
    """Train M1 (conditional=False) or M2 (conditional=True). Returns
    (best_params, history)."""
    key = jax.random.PRNGKey(cfg.seed)
    kp, ks = jax.random.split(key)

    xb, yb = next(train_ds.batches(8))
    args = (xb, yb) if conditional else (xb,)
    params = (init_params_fn or model.init)({"params": kp, "sample": ks}, *args)
    norm = None
    if cfg.std_norm:
        norm = train_ds.mean_std
    tx = adam(cfg.learning_rate)
    state = init_train_state(model, params, tx)
    if mesh is not None:
        state = replicate(state, mesh)

    resume = _resume_checkpoint(model_dir, prefix, cfg.start_epoch)
    if resume is not None:
        params, opt_state = ckpt.load_checkpoint(resume, state.params, state.opt_state)
        state = state._replace(params=params, opt_state=opt_state)
        if mesh is not None:
            state = replicate(state, mesh)
        print(f"resumed from {resume}")

    if cfg.device_data:
        from dvae_tpu.train.steps import (make_gather_eval_step,
                                          make_gather_train_steps)

        tx_data, tx_lab = _upload_split(train_ds, conditional, mesh)
        run_step, run_multi = make_gather_train_steps(
            model, tx, conditional, tx_data, tx_lab, cfg.eps, norm)
        if cfg.steps_per_dispatch <= 1:
            run_multi = None
        v_data, v_lab = _upload_split(valid_ds, conditional, mesh)
        run_eval = make_gather_eval_step(model, conditional, v_data, v_lab,
                                         cfg.eps, norm)
        return _run_epochs(
            state, _IndexDataset(train_ds), _IndexDataset(valid_ds),
            model_dir, prefix, cfg, mesh,
            run_step, run_multi, run_eval,
            stack_labels=False, vloss_key="elbo",
            ckpt_opt_state=lambda st: st.opt_state,
            resumed=resume is not None,
        )

    step = make_train_step(model, tx, conditional, cfg.eps, norm)
    multi_step = None
    if cfg.steps_per_dispatch > 1:
        multi_step = make_multi_train_step(model, tx, conditional, cfg.eps, norm)
    evaluate = make_eval_step(model, conditional, cfg.eps, norm)

    if conditional:
        run_step = step
        run_multi = multi_step
        run_eval = evaluate
    else:
        run_step = lambda st, x, y, k: step(st, x, k)
        run_multi = None if multi_step is None else (
            lambda st, xs, ys, k: multi_step(st, xs, k))
        run_eval = lambda p, x, y, k: evaluate(p, x, k)

    return _run_epochs(
        state, train_ds, valid_ds, model_dir, prefix, cfg, mesh,
        run_step, run_multi, run_eval,
        stack_labels=conditional, vloss_key="elbo",
        ckpt_opt_state=lambda st: st.opt_state,
        resumed=resume is not None,
    )


def fit_semisup(
    model,
    train_ds,
    valid_ds,
    model_dir,
    prefix: str,
    objective: str,
    alpha: float,
    y_cond: str = "soft",
    cfg: LoopConfig = LoopConfig(),
    mesh=None,
):
    """Train a CVAE_v3 with the semi-supervised U_loss/L_loss objective —
    the reconstructed trainer behind the reference's shipped
    ``ntcd_M2v3_VAD_{U,L}loss_alpha_*`` golden checkpoints (see
    make_semisup_step for the evidence base). Checkpoint vloss is the
    total loss (objective − α·BCE), matching the vloss forensics.
    Returns (best_params, history)."""
    from dvae_tpu.models import init_params as init_all_params

    if cfg.std_norm:
        # make_semisup_step has no norm path (every golden Uloss/Lloss
        # checkpoint is 'nonorm'); fail loudly rather than silently training
        # on unnormalized inputs (the CLI guards this too)
        raise ValueError("fit_semisup does not support std_norm")
    key = jax.random.PRNGKey(cfg.seed)
    kp, ks = jax.random.split(key)

    xb, yb = next(train_ds.batches(8))
    # init_all traces the classifier head too (CVAE_v3.__call__ doesn't)
    params = init_all_params(model, {"params": kp, "sample": ks}, xb, yb)
    tx = adam(cfg.learning_rate)
    state = init_train_state(model, params, tx)
    if mesh is not None:
        state = replicate(state, mesh)

    resume = _resume_checkpoint(model_dir, prefix, cfg.start_epoch)
    if resume is not None:
        params, opt_state = ckpt.load_checkpoint(resume, state.params, state.opt_state)
        state = state._replace(params=params, opt_state=opt_state)
        if mesh is not None:
            state = replicate(state, mesh)
        print(f"resumed from {resume}")

    step = make_semisup_step(model, tx, objective, alpha, y_cond, cfg.eps)
    multi_step = None
    if cfg.steps_per_dispatch > 1:
        multi_step = make_semisup_step(model, tx, objective, alpha, y_cond,
                                       cfg.eps, multi=True)
    evaluate = make_semisup_eval_step(model, objective, alpha, y_cond, cfg.eps)

    stack_labels = True
    if cfg.device_data:
        train_ds, valid_ds, step, multi_step, evaluate = _index_fed(
            mesh, train_ds, valid_ds, step, multi_step, evaluate)
        stack_labels = False  # labels gather on-device from the indices

    return _run_epochs(
        state, train_ds, valid_ds, model_dir, prefix, cfg, mesh,
        step, multi_step, evaluate,
        stack_labels=stack_labels, vloss_key="loss",
        ckpt_opt_state=lambda st: st.opt_state,
        resumed=resume is not None,
    )


def fit_adversarial(
    model,
    train_ds,
    valid_ds,
    model_dir,
    prefix: str,
    alpha: float,
    beta: float,
    gamma: float,
    cfg: LoopConfig = LoopConfig(),
    mesh=None,
    init_params_override=None,
    legacy_aux_coupling: bool = False,
    use_y_hat_soft: bool = False,
    freeze_classifier: bool = False,
    y_cond: str | None = None,
    enc_adversary: str = "bce",
):
    """Train the disentangled M2-info model (two-optimizer adversarial game).

    Works for both adversarial layouts: DisentangledVAE (v5) and CVAE_v4
    (the reference's ntcd_M2v4_* golden families — same four modules in a
    flat tree, models.py:299-333). ``y_cond`` selects the decoder
    conditioning label ('ytrue' default / 'soft' / 'yhathard' /
    'hardlabel' — the v4 golden names' suffixes). Checkpoint vloss is the
    encoder loss, matching training_M2_info_vad.py:280-281. Returns
    (best_params, history)."""
    from dvae_tpu.models import init_params as init_all_params
    from dvae_tpu.train.steps import _adversarial_layout

    key = jax.random.PRNGKey(cfg.seed)
    kp, ks = jax.random.split(key)

    xb, yb = next(train_ds.batches(8))
    params = init_params_override or init_all_params(
        model, {"params": kp, "sample": ks}, xb, yb
    )
    tx_enc, tx_aux = adam(cfg.learning_rate), adam(cfg.learning_rate)
    state = init_adversarial_state(params, tx_enc, tx_aux)
    if mesh is not None:
        state = replicate(state, mesh)

    resume = _resume_checkpoint(model_dir, prefix, cfg.start_epoch)
    if resume is not None:
        params, (ose, osa) = ckpt.load_checkpoint(
            resume, state.params, (state.opt_state_enc, state.opt_state_aux)
        )
        state = state._replace(params=params, opt_state_enc=ose, opt_state_aux=osa)
        if mesh is not None:
            state = replicate(state, mesh)
        print(f"resumed from {resume}")

    freeze = "classifier" if freeze_classifier else None
    layout = _adversarial_layout(params)
    # std_norm: same semantics as fit_vae (model sees normalized input,
    # ELBO compares raw x). The reference's adversarial script loads the
    # statistics but never applies them (training_M2_info_vad.py:126-133
    # vs :159) — here the flag actually normalizes.
    norm = train_ds.mean_std if cfg.std_norm else None
    step = make_adversarial_step(
        model, tx_enc, tx_aux, alpha, beta, gamma, cfg.eps,
        legacy_aux_coupling=legacy_aux_coupling, use_y_hat_soft=use_y_hat_soft,
        freeze_substring=freeze, y_cond=y_cond, layout=layout, norm=norm,
        enc_adversary=enc_adversary,
    )
    multi_step = None
    if cfg.steps_per_dispatch > 1:
        multi_step = make_adversarial_step(
            model, tx_enc, tx_aux, alpha, beta, gamma, cfg.eps,
            legacy_aux_coupling=legacy_aux_coupling,
            use_y_hat_soft=use_y_hat_soft, multi=True,
            freeze_substring=freeze, y_cond=y_cond, layout=layout, norm=norm,
            enc_adversary=enc_adversary,
        )
    evaluate = make_adversarial_eval_step(model, alpha, beta, gamma, cfg.eps,
                                          use_y_hat_soft=use_y_hat_soft,
                                          y_cond=y_cond, norm=norm,
                                          enc_adversary=enc_adversary)

    stack_labels = True
    if cfg.device_data:
        train_ds, valid_ds, step, multi_step, evaluate = _index_fed(
            mesh, train_ds, valid_ds, step, multi_step, evaluate)
        stack_labels = False  # labels gather on-device from the indices

    return _run_epochs(
        state, train_ds, valid_ds, model_dir, prefix, cfg, mesh,
        step, multi_step, evaluate,
        stack_labels=stack_labels, vloss_key="enc",
        ckpt_opt_state=lambda st: (st.opt_state_enc, st.opt_state_aux),
        resumed=resume is not None,
    )
