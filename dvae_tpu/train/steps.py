"""Jitted training steps for every model family.

* M1 / M2: Adam on the Itakura-Saito negative ELBO, matching the reference
  loops (training_M1.py:122-139, training_M2.py:~140).
* M2-info (disentangled): the two-player adversarial step of
  training_M2_info_vad.py:153-198 — the encoder/decoder/classifier group is
  updated on ``ELBO + alpha*BCE(y_hat_x, y) - beta*BCE(y_hat_z, y)`` while the
  auxiliary z->y classifier is updated on the *same minibatch's* detached
  latents. The update ORDER (enc group first, then aux) is preserved.

  Reference quirk (documented, opt-in): the reference never zeroes the
  auxiliary's gradients between ``enc_loss.backward()`` and
  ``aux_loss.backward()`` (training_M2_info_vad.py:192-198 only zeroes the
  enc optimizer's params), so the auxiliary's effective gradient is
  ``(gamma - beta) * dBCE/dtheta_aux`` — with the published beta=10, gamma=1
  the auxiliary is actually pushed to *increase* its BCE. Pass
  ``legacy_aux_coupling=True`` to replicate those exact dynamics; the default
  trains the auxiliary with the intended ``+gamma * dBCE``.

Steps are shape-polymorphic over the batch axis only through retracing;
under a mesh, callers shard the batch over the ``data`` axis and replicate
params — XLA inserts the gradient psums. State buffers are NOT donated:
at ~0.2 M params the double-buffering cost is negligible, and donation
would forbid the reuse-the-same-state call patterns the tests and
notebooks rely on.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from dvae_tpu.models import losses


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


class AdversarialState(NamedTuple):
    params: Any  # full tree: {'params': {'enc_dec_clf': ..., 'auxiliary': ...}}
    opt_state_enc: Any
    opt_state_aux: Any
    step: jnp.ndarray


def adam(lr: float = 1e-4) -> optax.GradientTransformation:
    """The reference's optimizer everywhere (training_M1.py:115)."""
    return optax.adam(lr, b1=0.9, b2=0.999)


# ---------------------------------------------------------------------------
# M1 / M2 ELBO training
# ---------------------------------------------------------------------------


def _normalizer(norm, eps):
    """Input normalization used when std_norm is on (training_M1.py:101-133):
    the model sees (x - mean)/(std + eps) but the ELBO compares against raw x."""
    if norm is None:
        return lambda x: x
    mean, std = norm
    mean = jnp.asarray(mean).reshape(-1)
    std = jnp.asarray(std).reshape(-1)
    return lambda x: (x - mean) / (std + eps)


def _make_elbo_body(model, tx, conditional: bool, eps: float, norm):
    """Shared single-step body: (state, (x, y, key)) -> (state, metrics).

    Both step makers below wrap exactly this, which is what makes the
    multi-step variant's "identical math to K sequential steps" guarantee
    structural rather than a convention to maintain."""
    normalize = _normalizer(norm, eps)

    def loss_fn(params, x, y, key):
        x_in = normalize(x)
        if conditional:
            r, mu, logvar = model.apply(params, x_in, y, rngs={"sample": key})
        else:
            r, mu, logvar = model.apply(params, x_in, rngs={"sample": key})
        total, recon, kl = losses.elbo(x, r, mu, logvar, eps)
        return total, (recon, kl)

    def body(st, inp):
        x, y, kk = inp
        (total, (recon, kl)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            st.params, x, y, kk
        )
        updates, opt_state = tx.update(grads, st.opt_state, st.params)
        params = optax.apply_updates(st.params, updates)
        return (
            TrainState(params, opt_state, st.step + 1),
            {"elbo": total, "recon": recon, "kl": kl},
        )

    return body


def make_train_step(model, tx: optax.GradientTransformation, conditional: bool,
                    eps: float = 1e-8, norm=None) -> Callable:
    """Returns jitted ``step(state, x, [y,] key) -> (state, metrics)``."""
    body = _make_elbo_body(model, tx, conditional, eps, norm)

    @jax.jit
    def step(state: TrainState, x, y, key):
        return body(state, (x, y, key))

    if conditional:
        return step
    return jax.jit(lambda state, x, key: step(state, x, None, key))


def make_multi_train_step(model, tx: optax.GradientTransformation, conditional: bool,
                          eps: float = 1e-8, norm=None) -> Callable:
    """K optimizer steps per dispatch via ``lax.scan`` over stacked batches.

    ``step(state, xs (K,B,F), [ys (K,B,Y),] key) -> (state, metrics)`` with
    metrics averaged over the K steps. Identical math to K sequential
    `make_train_step` calls (same body function); one device program per K
    batches instead of K. On a remote-attached TPU this amortizes
    per-dispatch latency; on any TPU it removes K-1 host round-trips from
    the epoch's critical path.
    """
    body = _make_elbo_body(model, tx, conditional, eps, norm)

    @jax.jit
    def step_cond(state: TrainState, xs, ys, key):
        keys = jax.random.split(key, xs.shape[0])
        state, ms = jax.lax.scan(body, state, (xs, ys, keys))
        return state, jax.tree.map(jnp.mean, ms)

    @jax.jit
    def step_uncond(state: TrainState, xs, key):
        keys = jax.random.split(key, xs.shape[0])
        body_u = lambda st, inp: body(st, (inp[0], None, inp[1]))
        state, ms = jax.lax.scan(body_u, state, (xs, keys))
        return state, jax.tree.map(jnp.mean, ms)

    return step_cond if conditional else step_uncond


def make_gather_train_steps(model, tx: optax.GradientTransformation,
                            conditional: bool, data, labels=None,
                            eps: float = 1e-8, norm=None):
    """(step, multi_step) over a DEVICE-RESIDENT dataset, fed by indices.

    The host-fed epoch loop ships (K, B, F) float stacks every dispatch —
    over a remote-attached chip that wire traffic IS the training wall time
    (the chip runs ~90k steps/s on resident data, scripts/bench_training.py,
    while the e2e loop measured 527k frames/s ≈ 4k steps/s at batch 128).
    Here the whole split uploads ONCE (`data` (N, F) [+ `labels` (N, Yd)])
    and each dispatch ships only int32 indices — ~500x less traffic at
    F=513 — with the rows gathered on-device (`jnp.take`) inside the same
    elbo body, so the math is identical to the host-fed steps.

    ``step(state, idx (B,), _unused_y, key)`` /
    ``multi_step(state, idxs (K, B), _unused_ys, key)`` — the unused label
    slot keeps the loop driver's host-path signature."""
    body = _make_elbo_body(model, tx, conditional, eps, norm)

    def gathered(st, inp):
        idx, kk = inp
        x = jnp.take(data, idx, axis=0)
        y = jnp.take(labels, idx, axis=0) if conditional else None
        return body(st, (x, y, kk))

    @jax.jit
    def step(state: TrainState, idx, _y, key):
        return gathered(state, (idx, key))

    @jax.jit
    def multi_step(state: TrainState, idxs, _ys, key):
        keys = jax.random.split(key, idxs.shape[0])
        state, ms = jax.lax.scan(gathered, state, (idxs, keys))
        return state, jax.tree.map(jnp.mean, ms)

    return step, multi_step


def index_fed_steps(run_step, run_multi, run_eval, data, labels,
                    eval_data, eval_labels):
    """Index-fed wrappers around ANY (state, x, y, key)-shaped trainer.

    The generic device-resident-data adapter behind ``fit_semisup`` /
    ``fit_adversarial`` (fit_vae uses the specialized
    :func:`make_gather_train_steps`, which gathers per scan step): the
    train/valid splits live on the device, the wrapped fns receive int32
    indices in the x slot, gather rows on-device, and delegate — identical
    math, only the data path changes. ``run_multi`` is only a presence
    signal (None = no multi wrapper): the index-fed multi re-scans
    ``run_step`` itself, which is the same body both host multis scan."""

    def _gather(d, lab, idx):
        x = jnp.take(d, idx, axis=0)
        y = None if lab is None else jnp.take(lab, idx, axis=0)
        return x, y

    @jax.jit
    def step(state, idx, _y, key):
        x, y = _gather(data, labels, idx)
        return run_step(state, x, y, key)

    multi = None
    if run_multi is not None:
        # gather ONE (B, F) slice per scan step instead of materializing
        # the whole (K, B, F) stack in HBM up front (at K=1000, B=128,
        # IBM labels that stack is ~0.5 GB). Scanning run_step with
        # split keys is exactly the host multi's semantics: both multis
        # are `split(key, K)` + lax.scan of the single-step body, and
        # run_step IS that body.
        @jax.jit
        def multi(state, idxs, _ys, key):
            keys = jax.random.split(key, idxs.shape[0])

            def scan_body(st, inp):
                idx, kk = inp
                x, y = _gather(data, labels, idx)
                return run_step(st, x, y, kk)

            state, ms = jax.lax.scan(scan_body, state, (idxs, keys))
            return state, jax.tree.map(jnp.mean, ms)

    @jax.jit
    def evaluate(params, idx, _y, key):
        x, y = _gather(eval_data, eval_labels, idx)
        return run_eval(params, x, y, key)

    return step, multi, evaluate


def make_gather_eval_step(model, conditional: bool, data, labels=None,
                          eps: float = 1e-8, norm=None) -> Callable:
    """Index-fed validation counterpart of :func:`make_gather_train_steps`
    (closed over the VALIDATION split's device arrays)."""
    evaluate = make_eval_step(model, conditional, eps, norm)

    @jax.jit
    def eval_idx(params, idx, _y, key):
        x = jnp.take(data, idx, axis=0)
        if conditional:  # make_eval_step's arity depends on conditional
            return evaluate(params, x, jnp.take(labels, idx, axis=0), key)
        return evaluate(params, x, key)

    return eval_idx


def make_eval_step(model, conditional: bool, eps: float = 1e-8, norm=None) -> Callable:
    normalize = _normalizer(norm, eps)

    def loss(params, x, y, key):
        x_in = normalize(x)
        if conditional:
            r, mu, logvar = model.apply(params, x_in, y, rngs={"sample": key})
        else:
            r, mu, logvar = model.apply(params, x_in, rngs={"sample": key})
        total, recon, kl = losses.elbo(x, r, mu, logvar, eps)
        return {"elbo": total, "recon": recon, "kl": kl}

    if conditional:
        return jax.jit(loss)
    return jax.jit(lambda params, x, key: loss(params, x, None, key))


def init_train_state(model, params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))


# ---------------------------------------------------------------------------
# M2v3 semi-supervised training (U_loss / L_loss) — RECONSTRUCTED
# ---------------------------------------------------------------------------


def _semisup_loss_fn(model, objective: str, alpha: float, y_cond: str,
                     eps: float):
    """The ONE semisup loss, shared by the train and eval steps so train
    and validation losses (and the vloss that names/picks checkpoints)
    cannot diverge. Returns ``(params, x, y, key) -> (loss, metrics)``."""
    if objective not in ("uloss", "lloss"):
        raise ValueError(f"objective must be uloss|lloss, got {objective!r}")
    if y_cond not in ("soft", "yhathard", "hardlabel", "ytrue"):
        raise ValueError(f"unknown y_cond {y_cond!r}")

    def loss_fn(params, x, y, key):
        y_hat_soft = model.apply(params, x, method="classify")
        hard = jax.lax.stop_gradient((y_hat_soft > 0.5).astype(jnp.float32))
        cond = {"soft": y_hat_soft, "yhathard": hard,
                "hardlabel": hard, "ytrue": y}[y_cond]
        r, mu, logvar = model.apply(params, x, cond, rngs={"sample": key})
        if objective == "uloss":
            marg = hard if y_cond == "hardlabel" else y_hat_soft
            total, L, recon, kl = losses.U_loss(x, r, mu, logvar, marg, eps)
        else:
            Lp, recon_p, kl_p = losses.L_loss(x, r, mu, logvar, eps)
            total = jnp.mean(Lp)
            L, recon, kl = total, jnp.mean(recon_p), jnp.mean(kl_p)
        classif = losses.binary_cross_entropy(y_hat_soft, y, eps)
        # zero-weighted terms dropped STATICALLY (0 * inf = nan at BCE
        # saturation — see make_adversarial_step)
        loss = total
        if alpha:
            loss = loss - alpha * classif
        return loss, {"loss": loss, "objective": total, "l": L,
                      "recon": recon, "kl": kl, "classif": classif}

    return loss_fn


def make_semisup_step(model, tx: optax.GradientTransformation, objective: str,
                      alpha: float, y_cond: str = "soft", eps: float = 1e-8,
                      multi: bool = False) -> Callable:
    """Semi-supervised CVAE_v3 trainer for the reference's ``Uloss``/``Lloss``
    checkpoint families — a RECONSTRUCTION: no reference script trains these
    (``U_loss``/``L_loss`` exist only as dead code, utils.py:78-105), but the
    shipped golden checkpoints (`data/subset/models/ntcd_M2v3_VAD_{U,L}loss_
    alpha_*`) prove such a trainer existed. Semantics are recovered from:

    - the loss definitions themselves (utils.py:78-105; U = E_q(y|x)[L] + H);
    - the name grammar ``{Uloss|Lloss}_alpha_{A}[_hardlabel|_yhathard|_ytrue]``;
    - vloss forensics on the checkpoint names: with total = objective
      − α·BCE(ŷ_soft, y), the baked-in validation losses reproduce —
      α=+20 → BCE driven to log-eps saturation (~18.4) → vloss ≈ 400−368
      (observed 47–85); α=+10 → ≈ 216 (observed 226); α=−10/−100/−1000 →
      BCE → chance/0 → vloss ≈ 408/460/950 (observed 408/463/948). The
      adversarial-for-positive-α sign is the paper's information-
      minimization pressure applied to the x→y classifier.

    ``y_cond`` decides what conditions the decoder (and, for 'hardlabel',
    the U marginalization label): 'soft' = ŷ_soft (the pretrain script's
    forward, training_M2_info_vad_pretrain.py:163 — checkpoints with no
    label suffix), 'yhathard' = stop-grad hard ŷ (the commented
    ``model(x, y_hat_hard)`` alternative, reconstruct_M2_info.py:199),
    'hardlabel' = hard ŷ everywhere, 'ytrue' = the oracle label. The
    hardlabel-vs-yhathard distinction is not recoverable from the shipped
    evidence; both harden the classifier output, differing in whether the
    U marginalization hardens too.
    """
    loss_fn = _semisup_loss_fn(model, objective, alpha, y_cond, eps)

    def body(st: TrainState, inp):
        x, y, kk = inp
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            st.params, x, y, kk)
        updates, opt_state = tx.update(grads, st.opt_state, st.params)
        params = optax.apply_updates(st.params, updates)
        return TrainState(params, opt_state, st.step + 1), metrics

    @jax.jit
    def step(state: TrainState, x, y, key):
        return body(state, (x, y, key))

    @jax.jit
    def multi_step(state: TrainState, xs, ys, key):
        keys = jax.random.split(key, xs.shape[0])
        state, ms = jax.lax.scan(body, state, (xs, ys, keys))
        return state, jax.tree.map(jnp.mean, ms)

    return multi_step if multi else step


def make_semisup_eval_step(model, objective: str, alpha: float,
                           y_cond: str = "soft", eps: float = 1e-8) -> Callable:
    loss_fn = _semisup_loss_fn(model, objective, alpha, y_cond, eps)

    @jax.jit
    def evaluate(params, x, y, key):
        return loss_fn(params, x, y, key)[1]

    return evaluate


# ---------------------------------------------------------------------------
# M2-info adversarial training
# ---------------------------------------------------------------------------


def _adversarial_layout(params) -> str:
    """'v5' = DisentangledVAE's nested {enc_dec_clf, auxiliary} tree;
    'v4' = CVAE_v4's flat {encoder, decoder, classifier, auxiliary}
    (reference models.py:299-333 — the same four modules without the
    wrapper). Tree structure is static under jit, so branching on it at
    trace time is free."""
    return "v5" if "enc_dec_clf" in params["params"] else "v4"


def _split_params(params):
    """(enc-player subtree, aux-player subtree) for either layout."""
    p = params["params"]
    if "enc_dec_clf" in p:
        return p["enc_dec_clf"], p["auxiliary"]
    return {k: v for k, v in p.items() if k != "auxiliary"}, p["auxiliary"]


def _merge_params(enc, aux, layout: str = "v5"):
    if layout == "v4":
        return {"params": {**enc, "auxiliary": aux}}
    return {"params": {"enc_dec_clf": enc, "auxiliary": aux}}


def _enc_adversary_fn(enc_adversary: str, eps: float):
    """The -beta encoder-adversary term, by the reference's Lenc_aux_v*
    name tags: 'bce' (v1, labeled), 'uniform' (v2, 0.5-target), 'entropy'
    (v3, the prediction's own entropy). Shared by the train and eval step
    makers so an invalid name fails identically everywhere."""
    if enc_adversary not in ("bce", "uniform", "entropy"):
        raise ValueError(f"unknown enc_adversary {enc_adversary!r}")

    def adv_fn(y_hat_z, y):
        if enc_adversary == "bce":
            return losses.binary_cross_entropy(y_hat_z, y, eps)
        if enc_adversary == "uniform":
            return losses.binary_cross_entropy_v2(y_hat_z, eps)
        return losses.binary_cross_entropy_v3(y_hat_z, eps)

    return adv_fn


def _make_adversarial_losses(model, alpha, beta, eps, cond_mode, normalize,
                             adv_fn):
    """ONE encoder-loss assembly shared by the train and eval step makers.

    The eval value names checkpoints and picks the best model; keeping a
    second hand-rolled copy of this computation in the eval step is exactly
    how objective/eval divergence bugs arise (an eval-only adversary
    fall-through was fixed this way once). Returns
    ``(enc_loss, z, metrics, aux_bce)`` where metrics carries the train
    step's keys and ``aux_bce`` is the auxiliary's labeled objective
    (always plain BCE, whatever the encoder's adversary is)."""

    def compute(params, x, y, key):
        x_in = normalize(x)
        y_hat_x = model.apply(params, x_in, method="classify_from_x")
        hard = jax.lax.stop_gradient((y_hat_x > 0.5).astype(jnp.float32))
        cond = {"ytrue": y, "soft": y_hat_x,
                "yhathard": hard, "hardlabel": hard}[cond_mode]
        r, z, mu, logvar = model.apply(params, x_in, cond, rngs={"sample": key})
        elbo_val, recon, kl = losses.elbo(x, r, mu, logvar, eps)
        classif = losses.binary_cross_entropy(y_hat_x, y, eps)
        y_hat_z = model.apply(params, z, method="classify_from_z")
        aux_enc = adv_fn(y_hat_z, y)
        aux_bce = losses.binary_cross_entropy(y_hat_z, y, eps)
        # Zero-weighted terms are dropped STATICALLY, not multiplied by 0:
        # a saturated sigmoid makes dBCE overflow to inf, and 0 * inf = nan
        # would poison the (otherwise untrained) classifier head — the
        # published config alpha=0 (training_M2_info_vad.py:53) hits this.
        enc_loss = elbo_val
        if alpha:
            enc_loss = enc_loss + alpha * classif
        if beta:
            enc_loss = enc_loss - beta * aux_enc
        metrics = {
            "elbo": elbo_val,
            "recon": recon,
            "kl": kl,
            "enc": enc_loss,
            "classif": alpha * classif,
            "aux_enc": aux_enc,
        }
        return enc_loss, z, metrics, aux_bce

    return compute


def make_adversarial_step(
    model,
    tx_enc: optax.GradientTransformation,
    tx_aux: optax.GradientTransformation,
    alpha: float,
    beta: float,
    gamma: float,
    eps: float = 1e-8,
    legacy_aux_coupling: bool = False,
    use_y_hat_soft: bool = False,
    multi: bool = False,
    freeze_substring: str | None = None,
    y_cond: str | None = None,
    layout: str = "v5",
    norm=None,
    enc_adversary: str = "bce",
) -> Callable:
    """Returns jitted ``step(state, x, y, key) -> (state, metrics)``.

    ``use_y_hat_soft=True`` feeds the classifier's soft prediction to the
    decoder instead of the true label (the _pretrain variant,
    training_M2_info_vad_pretrain.py:163). ``y_cond`` generalizes it:
    'ytrue' (default) / 'soft' / 'yhathard'-'hardlabel' (stop-grad hard
    prediction — the v4 golden families' _hardlabel/_yhathard suffixes).

    ``layout`` selects the param-tree shape: 'v5' (DisentangledVAE) or
    'v4' (CVAE_v4's flat tree) — see _adversarial_layout.

    ``multi=True`` returns ``step(state, xs (K,B,F), ys (K,B,Y), key)``
    running K adversarial steps per dispatch via ``lax.scan`` (identical
    math to K sequential calls; cf. make_multi_train_step).

    ``freeze_substring`` zeroes enc-group gradients whose param path
    contains the substring (e.g. 'classifier') — the REAL version of the
    reference's no-op freeze (training_M2_info_vad_pretrain.py:142-146).

    ``norm``: optional (mean, std) train statistics — every model input
    (classifier AND encoder) sees (x - mean)/(std + eps) while the ELBO
    compares raw x, matching the frame trainers' std_norm semantics.
    (The reference's adversarial script LOADS the statistics under
    std_norm but never applies them in its step —
    training_M2_info_vad.py:126-133 vs :159-161 — another loaded-but-unused
    no-op like its eval TODO; this completes the intent.)

    ``enc_adversary`` selects the -beta encoder-adversary term (the
    reference's ``Lenc_aux_v*`` name grammar): 'bce' = labeled
    BCE(y_hat_z, y) (the main script's live line,
    training_M2_info_vad.py:171); 'entropy' = binary_cross_entropy_v3 of
    the prediction alone (the PRETRAIN script's live line,
    training_M2_info_vad_pretrain.py:175, name tag Lenc_aux_v3); 'uniform'
    = binary_cross_entropy_v2 against a 0.5 target (both scripts'
    commented _v2 experiment). The auxiliary's own objective stays labeled
    ``gamma * BCE``; under ``legacy_aux_coupling`` its effective gradient
    is ``gamma*dBCE - beta*d(adversary)`` (the reference's un-zeroed-grad
    ordering), which collapses to ``(gamma-beta)*dBCE`` only for 'bce'.
    """
    normalize = _normalizer(norm, eps)
    adv_fn = _enc_adversary_fn(enc_adversary, eps)
    cond_mode = y_cond or ("soft" if use_y_hat_soft else "ytrue")
    if cond_mode not in ("ytrue", "soft", "yhathard", "hardlabel"):
        raise ValueError(f"unknown y_cond {cond_mode!r}")

    compute_losses = _make_adversarial_losses(
        model, alpha, beta, eps, cond_mode, normalize, adv_fn)

    def enc_loss_fn(enc_params, aux_params, x, y, key):
        params = _merge_params(enc_params, aux_params, layout)
        enc_loss, z, metrics, _ = compute_losses(params, x, y, key)
        return enc_loss, (z, metrics)

    def aux_loss_fn(aux_params, enc_params, z, y):
        # intended coupling: +gamma*BCE. Legacy (the reference's un-zeroed
        # aux grads, training_M2_info_vad.py:192-198): enc_loss.backward()'s
        # -beta*d(adversary)/d_aux is still in the buffers when
        # aux_loss.backward() adds +gamma*dBCE — reproduce as one loss on
        # the detached z. Zero-weighted terms stay STATICALLY dropped
        # (0*inf hazard, see enc_loss_fn).
        has_gamma = bool(gamma)
        has_legacy = legacy_aux_coupling and bool(beta)
        if not (has_gamma or has_legacy):
            return jnp.zeros(())
        params = _merge_params(enc_params, aux_params, layout)
        y_hat_z = model.apply(params, jax.lax.stop_gradient(z), method="classify_from_z")
        loss = jnp.zeros(())
        if has_gamma:
            loss = loss + gamma * losses.binary_cross_entropy(y_hat_z, y, eps)
        if has_legacy:
            loss = loss - beta * adv_fn(y_hat_z, y)
        return loss

    def _apply_freeze(grads):
        if freeze_substring is None:
            return grads
        from flax import traverse_util

        flat = traverse_util.flatten_dict(grads)
        flat = {
            k: (jnp.zeros_like(v) if freeze_substring in "/".join(map(str, k)) else v)
            for k, v in flat.items()
        }
        return traverse_util.unflatten_dict(flat)

    def body(state: AdversarialState, inp):
        x, y, key = inp
        enc_params, aux_params = _split_params(state.params)

        (enc_loss, (z, metrics)), enc_grads = jax.value_and_grad(
            enc_loss_fn, has_aux=True
        )(enc_params, aux_params, x, y, key)
        enc_grads = _apply_freeze(enc_grads)
        upd, opt_enc = tx_enc.update(enc_grads, state.opt_state_enc, enc_params)
        enc_params = optax.apply_updates(enc_params, upd)

        # the auxiliary trains on the pre-update latents, per the reference
        # ordering (backward on old z, step after enc step)
        aux_loss, aux_grads = jax.value_and_grad(aux_loss_fn)(
            aux_params, enc_params, z, y
        )
        upd, opt_aux = tx_aux.update(aux_grads, state.opt_state_aux, aux_params)
        aux_params = optax.apply_updates(aux_params, upd)

        metrics["aux"] = aux_loss
        new_state = AdversarialState(
            _merge_params(enc_params, aux_params, layout), opt_enc, opt_aux,
            state.step + 1
        )
        return new_state, metrics

    @jax.jit
    def step(state: AdversarialState, x, y, key):
        return body(state, (x, y, key))

    @jax.jit
    def multi_step(state: AdversarialState, xs, ys, key):
        keys = jax.random.split(key, xs.shape[0])
        state, ms = jax.lax.scan(body, state, (xs, ys, keys))
        return state, jax.tree.map(jnp.mean, ms)

    return multi_step if multi else step


def make_adversarial_eval_step(model, alpha, beta, gamma, eps: float = 1e-8,
                               use_y_hat_soft: bool = False,
                               y_cond: str | None = None, norm=None,
                               enc_adversary: str = "bce") -> Callable:
    cond_mode = y_cond or ("soft" if use_y_hat_soft else "ytrue")
    compute_losses = _make_adversarial_losses(
        model, alpha, beta, eps, cond_mode, _normalizer(norm, eps),
        _enc_adversary_fn(enc_adversary, eps))

    @jax.jit
    def evaluate(params, x, y, key):
        # same loss assembly as the train step (shared builder — this value
        # names checkpoints and picks the best model, so it must not drift
        # from the trained objective); the auxiliary's own objective is
        # always labeled BCE, whatever the encoder's adversary is
        # (training_M2_info_vad_pretrain.py:184-185)
        _, _, metrics, aux_bce = compute_losses(params, x, y, key)
        metrics = dict(metrics)
        del metrics["aux_enc"]
        metrics["aux"] = gamma * aux_bce
        return metrics

    return evaluate


def init_adversarial_state(
    params, tx_enc: optax.GradientTransformation, tx_aux: optax.GradientTransformation
) -> AdversarialState:
    enc_params, aux_params = _split_params(params)
    return AdversarialState(
        params, tx_enc.init(enc_params), tx_aux.init(aux_params), jnp.zeros((), jnp.int32)
    )
