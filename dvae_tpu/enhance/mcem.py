"""Batched Monte-Carlo EM speech enhancement on TPU.

This is the TPU-native redesign of the reference's per-utterance,
Python-loop MCEM engine (/root/reference/packages/models/mcem.py). The whole
algorithm — Metropolis-Hastings latent sampling, NMF noise-model M-steps and
the final Wiener-filter expectation — is ONE jitted program:

* the EM loop is an outer ``lax.scan`` over iterations;
* each E-step is an inner ``lax.scan`` of MH steps, where one step is a
  single fused decoder forward over the whole utterance batch (the reference
  runs two decoder passes per MH step — propose and post-accept refresh,
  mcem.py:246/:268; we carry the accepted variance with a ``where`` select,
  which is mathematically identical and halves decoder cost);
* utterances are padded to a common frame count and every reduction over
  frames is masked, replacing the reference's process-pool-over-utterances
  parallelism (evaluate_ntcd_M1.py:248-259) with on-device batching;
* randomness is threaded `jax.random` keys (replacing the global seeds of
  mcem.py:1-5); parity with the reference is statistical (matched proposal
  variance, burn-in and sample budgets), validated at the PESQ/STOI level.

Supports every reference variant through the ``y`` argument:
MCEM_M1 (mcem.py:182, y=None), MCEM_M2 (mcem.py:332, encoder saw [x;y]) and
MCEM_M2v2/v3 (mcem.py:504/:676, encoder saw x) — the encoder difference only
affects ``z_init`` which the caller provides; the decoder input is
``concat([z, y])`` whenever ``y`` is given.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from dvae_tpu.enhance.nmf import VX_FLOOR, compute_vb, init_nmf, nmf_m_step
from dvae_tpu.utils.misc import on_tpu as _on_tpu


def make_mlp_decoder(mats, fast: bool = True) -> Callable:
    """Decoder callable from raw weights (pallas_mcem.extract_decoder_mlp).

    ``fast=True`` runs the three matmuls with bf16 operands and f32
    accumulation; biases/activations stay f32.
    """
    w1z, w1y, b1, w2, b2, w3, b3 = mats
    w1 = w1z if w1y is None else jnp.concatenate([w1z, w1y], axis=0)
    dt = jnp.bfloat16 if fast else jnp.float32

    def mm(a, w):
        return jnp.matmul(
            a.astype(dt), w.astype(dt), preferred_element_type=jnp.float32
        )

    def dec(zin):
        # (measured: storing the (B*N, 128) tanh intermediates as bf16 is
        # neutral — 351 vs 350 ms device time — XLA already handles them)
        h = jnp.tanh(mm(zin, w1) + b1)
        h = jnp.tanh(mm(h, w2) + b2)
        return jnp.exp(mm(h, w3) + b3)

    return dec


@dataclasses.dataclass(frozen=True)
class McemConfig:
    """Budgets mirror the reference's NOMINAL defaults (evaluate_ntcd_M1.py:
    57-65: E-step 10 samples + 30 burn-in, WF 25 + 75).

    Reference quirk (M1 only): ``MCEM_M1.E_step``/``compute_WF`` call
    ``sample_posterior(self.Z, self.nsamples_E_step, self.burnin_E_step)``
    against the signature ``sample_posterior(self, Z, y, nsamples, burnin)``
    (mcem.py:207 vs :297/:314) — the first budget lands in the unused ``y``
    slot, so the reference M1 EFFECTIVELY runs E-step nsamples=30/burnin=30
    and WF nsamples=75/burnin=30 regardless of its settings (burn-in is
    pinned to the default 30 and cannot be configured at all). The M2
    variants pass ``self.y`` and honor their budgets (mcem.py:468,486,...).
    ``m1_reference_effective()`` builds the budget set that reproduces the
    reference M1's actual behavior (scripts/evaluate_ntcd_M1.py
    --m1-reference-budgets; the parity harness compares at these).
    """

    niter: int = 100
    nsamples_e_step: int = 10
    burnin_e_step: int = 30
    nsamples_wf: int = 25
    burnin_wf: int = 75
    var_rw: float = 0.01
    nmf_rank: int = 10
    eps: float = 1e-8
    # bf16 decoder matmuls in the MH chain (f32 accumulate). f32 operands
    # default to multi-pass bf16 on the MXU; one explicit bf16 pass is ~3x
    # faster. The ~1e-3 relative Vs error is far below the MH sampling noise
    # the EM averages over (25 WF samples); parity is validated at the
    # PESQ/STOI level like everything else stochastic here.
    fast_decoder: bool = True
    @classmethod
    def m1_reference_effective(cls, niter: int = 100, **kw) -> "McemConfig":
        """Budgets matching what the reference's MCEM_M1 ACTUALLY runs (see
        the class docstring): E-step 30/30, WF 75/30."""
        return cls(niter=niter, nsamples_e_step=30, burnin_e_step=30,
                   nsamples_wf=75, burnin_wf=30, **kw)

    # Keep the chain's loop-invariant stats (|X|^2, Vb) and the emitted Vs
    # samples in HBM as bf16, computing in f32 (loads upconvert in
    # registers). The whole engine is HBM-bandwidth-bound on exactly these
    # tensors (profiled on v5e: MH energy passes + NMF stats passes are ~70%
    # of device time), so halving their bytes is a direct speedup. Numerics:
    # equivalent to enhancing a 0.4%-perturbed spectrogram — far below the
    # MH sampling noise; every exact identity (Wiener partition, masking)
    # is precision-independent and still tested. f32 everywhere when False.
    fast_stats: bool = True

    # run_peem knobs (ignored by run_mcem): Adam steps on the latent per EM
    # iteration and their learning rate. See run_peem's docstring.
    peem_steps: int = 4
    peem_lr: float = 1e-2

    # run_pmcem knobs (ignored by the other engines): R parallel MH chains,
    # MH steps per EM iteration (all chains advance together in one batched
    # decoder pass per step), and the WF tail's burn-in steps. Defaults give
    # the same 40 chain-energy evaluations per EM iteration as the
    # reference's sequential budget (10 chains x 4 steps vs 30 burn-in + 10
    # samples) and an M-step sample set of the same size (R=10 vs 10).
    pmcem_chains: int = 10
    pmcem_steps: int = 4
    pmcem_wf_burn: int = 8


class McemResult(NamedTuple):
    wfs: jnp.ndarray  # (B, N, F) speech Wiener mask  E[g*Vs / Vx]
    wfn: jnp.ndarray  # (B, N, F) noise  Wiener mask  E[Vb / Vx]
    cost: jnp.ndarray  # (niter,) masked E[-log lik] trajectory
    z: jnp.ndarray  # (B, N, L) last latent draw
    w: jnp.ndarray  # (B, F, K) NMF dictionary
    h: jnp.ndarray  # (B, N, K) NMF activations
    g: jnp.ndarray  # (B, N) gains


def _prep_em(decoder, x2, mask, cfg: McemConfig, y, nmf_init, decoder_mats,
             key):
    """Shared engine preamble (run_mcem / run_peem / run_em_fixed_z): f32
    inputs; NMF init drawn on the FIRST of ``split(key, 3)`` — the same
    k_nmf stream in every engine, so runs sharing a key share their NMF
    init regardless of engine (the other two streams are run_mcem's
    k_em/k_wf; they must come from one split, NOT fold_in: under the
    partitionable threefry PRNG ``fold_in(k, c) == split(k, n)[c]``, so a
    folded WF key would replay EM iteration c's exact proposal noise);
    bf16 fast-decoder swap; the [z; y]-concat closure.

    Returns ``(x2, mask, (w, h, g), decoder, dec, keys)`` where ``keys``
    is ``split(key, 3)`` or None when no key was given."""
    x2 = x2.astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    keys = None if key is None else jax.random.split(key, 3)
    if nmf_init is None:
        if keys is None:
            raise ValueError("need key or nmf_init")
        b, n, f = x2.shape
        nmf_init = init_nmf(keys[0], b, n, f, cfg.nmf_rank, cfg.eps)
    if decoder_mats is not None and cfg.fast_decoder:
        decoder = make_mlp_decoder(decoder_mats, fast=True)

    def dec(z):
        zin = z if y is None else jnp.concatenate([z, y], axis=-1)
        return decoder(zin)

    return x2, mask, nmf_init, decoder, dec, keys


def _make_mh_step(decoder: Callable, x2, y, var_rw: float, stats_dtype=jnp.float32):
    """Returns one Metropolis-Hastings step over the utterance batch.

    Carry: (z (B,N,L), vs (B,N,F), e (B,N)) where ``e`` is the per-frame
    negative log unnormalized posterior of the *current* state,

        E(z) = sum_f [log Vx + |X|^2/Vx] + 0.5*||z||^2,  Vx = g*Vs(z) + Vb.

    The reference recomputes both states' energies every step (two decoder
    passes plus two log/reciprocal sweeps, mcem.py:243-265). Carrying E of
    the accepted state and computing only the proposal's energy is
    mathematically identical (log-accept ratio = E - E') and halves both the
    decoder and the transcendental cost per step. ``e`` must be refreshed by
    ``energy`` whenever vb or g change (once per EM iteration).

    ``stats_dtype`` is the HBM residency dtype of the chain's loop-invariant
    |X|^2 (and, by the caller's choice, Vb): every energy pass re-reads both
    planes, so bf16 storage halves the engine's dominant traffic; the
    arithmetic promotes back to f32 in registers.
    """
    sqrt_var = jnp.sqrt(jnp.asarray(var_rw, jnp.float32))
    x2e = x2.astype(stats_dtype)

    def dec(z):
        zin = z if y is None else jnp.concatenate([z, y], axis=-1)
        return decoder(zin)

    def energy(z, vs, vb, g):
        vx = jnp.maximum(g[:, :, None] * vs + vb, VX_FLOOR)
        return jnp.sum(jnp.log(vx) + x2e / vx, axis=-1) + 0.5 * jnp.sum(
            z**2, axis=-1
        )

    def step(carry, key, vb, g):
        z, vs, e = carry
        k1, k2 = jax.random.split(key)
        z_prime = z + sqrt_var * jax.random.normal(k1, z.shape)
        vs_prime = dec(z_prime)
        e_prime = energy(z_prime, vs_prime, vb, g)
        log_acc = e - e_prime
        u = jax.random.uniform(k2, log_acc.shape, minval=1e-38)
        acc = jnp.log(u) < log_acc  # (B, N)
        z = jnp.where(acc[:, :, None], z_prime, z)
        vs = jnp.where(acc[:, :, None], vs_prime, vs)
        e = jnp.where(acc, e_prime, e)
        return (z, vs, e), None

    def step_light(carry, key, vb, g):
        """Burn-in variant: identical chain, but Vs never enters the scan
        carry (it is a deterministic function of z, so carrying it is only a
        cache — one that costs a (B,N,F) HBM read+write per step). Callers
        recompute vs = dec(z) once when the burn-in ends."""
        z, e = carry
        k1, k2 = jax.random.split(key)
        z_prime = z + sqrt_var * jax.random.normal(k1, z.shape)
        e_prime = energy(z_prime, dec(z_prime), vb, g)
        u = jax.random.uniform(k2, e.shape, minval=1e-38)
        acc = jnp.log(u) < (e - e_prime)
        z = jnp.where(acc[:, :, None], z_prime, z)
        e = jnp.where(acc, e_prime, e)
        return (z, e), None

    return dec, energy, step, step_light


def _wf_expectation(dec, energy, mh_step, mh_light, x2, mask, z, w, h, g,
                    k_wf, cfg: McemConfig, stats_dtype):
    """The Monte-Carlo Wiener-filter expectation (reference mcem.py:310-329),
    shared VERBATIM by run_mcem's tail and run_peem_wf: a fresh MH chain
    from ``z`` (``burnin_wf`` light steps, then masks accumulated over
    ``nsamples_wf`` draws). Mask accumulation stays f32 with the SAME f32
    ``vb`` in numerator and denominator so the partition identity
    WFs + WFn = (g*Vs + Vb)/Vx ≡ 1 holds exactly; the chain's energies
    read the stats-dtype copy (``vbe``). Returns (wfs, wfn, z) with the
    frame mask applied."""
    vb = compute_vb(w, h)
    vbe = vb.astype(stats_dtype)
    vs = dec(z)
    e = energy(z, vs, vbe, g)
    kb, ks = jax.random.split(k_wf)

    (z, e), _ = jax.lax.scan(
        lambda c, k: mh_light(c, k, vbe, g),
        (z, e), jax.random.split(kb, cfg.burnin_wf))
    vs = dec(z)

    def wf_step(carry, key):
        (z, vs, e), wfs_sum, wfn_sum = carry
        (z, vs, e), _ = mh_step((z, vs, e), key, vbe, g)
        vs_scaled = g[:, :, None] * vs
        vx = jnp.maximum(vs_scaled + vb, VX_FLOOR)
        return ((z, vs, e), wfs_sum + vs_scaled / vx, wfn_sum + vb / vx), None

    zero = jnp.zeros_like(x2)
    ((z, vs, e), wfs_sum, wfn_sum), _ = jax.lax.scan(
        wf_step, ((z, vs, e), zero, zero),
        jax.random.split(ks, cfg.nsamples_wf))
    m3 = mask[:, :, None]
    return (wfs_sum / cfg.nsamples_wf * m3,
            wfn_sum / cfg.nsamples_wf * m3, z)


def run_em_fixed_z(
    decoder: Callable[[jnp.ndarray], jnp.ndarray],
    x2: jnp.ndarray,
    z_fixed: jnp.ndarray,
    mask: jnp.ndarray,
    cfg: McemConfig = McemConfig(),
    y: jnp.ndarray | None = None,
    nmf_init: tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray] | None = None,
    decoder_mats=None,
    key: jax.Array | None = None,
) -> McemResult:
    """EM with the latent pinned — the reference's ``clean_z_nomcem`` ablation.

    The reference produced its shipped ``*_clean_z_nomcem_*`` golden wavs by
    enabling the commented overrides that replace every Monte-Carlo draw with
    the clean-encoded latent (``# Z_t = torch.t(self.Zclean)[:,None]`` in
    ``E_step`` and ``# Z_t = torch.t(self.Zclean)`` in ``compute_WF``,
    reference mcem.py:297/:307/:467/:478; output names at
    evaluate_ntcd_M1.py:187-188). With Z pinned the speech variance
    ``Vs = dec(z)`` is a constant, EM degenerates to fitting the NMF noise
    model + gains against it, and the Wiener masks are deterministic — no
    sampling, no averaging. Equivalent to ``run_mcem`` with ``var_rw=0`` and
    ``z_init=z_fixed`` (the frozen chain never accepts a move away from a
    zero-variance proposal), but skips every MH scan: one decoder pass total
    instead of ~8k. Tested against the frozen chain in tests/test_mcem.py.

    ``z_fixed`` is the encoder posterior mean — of the CLEAN spectrogram for
    the ablation, though any pinned latent works. ``key`` only seeds the
    random NMF init when ``nmf_init`` is None.
    """
    b, n, f = x2.shape
    x2, mask, (w, h, g), decoder, dec, _ = _prep_em(
        decoder, x2, mask, cfg, y, nmf_init, decoder_mats, key)
    vs = dec(z_fixed)  # (B, N, F), loop-invariant
    vs_r = vs[None]  # the degenerate one-sample "Monte-Carlo" set

    denom = jnp.maximum(jnp.sum(mask) * f, 1.0)

    def em_iter(carry, _):
        w, h, g = carry
        w, h, g, vb = nmf_m_step(x2, vs_r, w, h, g, mask, cfg.eps)
        vx = jnp.maximum(g[:, :, None] * vs + vb, VX_FLOOR)
        cost = jnp.sum(
            (jnp.log(vx) + x2 / vx) * mask[:, :, None]
        ) / denom
        return (w, h, g), cost

    (w, h, g), cost = jax.lax.scan(em_iter, (w, h, g), None, length=cfg.niter)

    vb = compute_vb(w, h)
    vs_scaled = g[:, :, None] * vs
    vx = jnp.maximum(vs_scaled + vb, VX_FLOOR)
    m3 = mask[:, :, None]
    return McemResult(
        (vs_scaled / vx) * m3, (vb / vx) * m3, cost, z_fixed, w, h, g
    )


def run_peem(
    decoder: Callable[[jnp.ndarray], jnp.ndarray],
    x2: jnp.ndarray,
    z_init: jnp.ndarray,
    mask: jnp.ndarray,
    cfg: McemConfig = McemConfig(),
    y: jnp.ndarray | None = None,
    nmf_init: tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray] | None = None,
    decoder_mats=None,
    key: jax.Array | None = None,
) -> McemResult:
    """Point-estimate EM: the fast, deterministic engine.

    Same generative model and NMF M-step as :func:`run_mcem`, but the
    E-step's Monte-Carlo expectation over p(z|x) is replaced by its MAP
    point estimate, optimized by ``cfg.peem_steps`` Adam steps per EM
    iteration on the negative log joint

        E(z) = sum_f [log Vx + |X|^2/Vx] + 0.5*||z||^2,   Vx = g*Vs(z) + Vb

    (the same energy the MH chain targets, _make_mh_step), warm-started
    from the previous iteration's optimum, with the Adam moments carried
    across EM iterations. The Wiener masks are evaluated at the final
    point estimate instead of averaged over samples.

    Point-estimate (a.k.a. PEEM/VEM) inference for VAE-based enhancement
    is an established alternative to MCEM (e.g. Sadeghi & Alameda-Pineda,
    arXiv:1912.10647 — typically a small quality cost for a large
    speed-up); the reference itself ships the degenerate pinned-latent
    form as its ``clean_z_nomcem`` ablation (commented E_step/compute_WF
    overrides, reference mcem.py:297/:307). This engine is the deployable
    version: it optimizes z against the MIXTURE's likelihood, needing no
    clean oracle.

    Why it is fast on TPU: the default MCEM budget runs 40 sequential
    decoder passes per EM iteration plus a 100-step WF chain, each pass
    re-reading the (B, N, F) stat planes from HBM; PEEM runs
    ``peem_steps`` fwd+bwd passes per iteration (~2.5 fwd-equivalents
    each at peem_steps=4 -> ~4x less HBM traffic) and its WF stage is one
    deterministic evaluation. Unlike MCEM (statistical parity only), the
    whole program is deterministic given (inputs, nmf_init-or-key):
    bitwise-reproducible across runs.

    With ``peem_steps=0`` the latent never moves and the algorithm is
    :func:`run_em_fixed_z` with ``z_fixed=z_init`` (pinned-latent EM on
    the mixture encoding) — same math, pinned in tests/test_mcem.py at
    float tolerance: the two compile to different XLA fusions (fixed_z
    hoists dec(z) out of the scan), so masks/cost agree to ~1-2 ULP, not
    bitwise; only the unmoved latent itself is bitwise.

    ``key`` seeds only the random NMF init when ``nmf_init`` is None.
    """
    b, n, f = x2.shape
    x2, mask, (w, h, g), decoder, dec, _ = _prep_em(
        decoder, x2, mask, cfg, y, nmf_init, decoder_mats, key)

    def energy_sum(z, vb, g):
        # scalar total energy; padded frames contribute finite, irrelevant
        # terms (their z just follows its own gradient — masked out of the
        # M-step, the cost and the final masks)
        vx = jnp.maximum(g[:, :, None] * dec(z) + vb, VX_FLOOR)
        return jnp.sum(jnp.log(vx) + x2 / vx) + 0.5 * jnp.sum(z * z)

    egrad = jax.grad(energy_sum)
    lr = jnp.asarray(cfg.peem_lr, jnp.float32)
    b1, b2, eps_adam = 0.9, 0.999, 1e-8
    denom = jnp.maximum(jnp.sum(mask) * f, 1.0)

    def em_iter(carry, _):
        z, m, v, t, w, h, g = carry
        vb = compute_vb(w, h)

        def adam_step(c, _):
            z, m, v, t = c
            gz = egrad(z, vb, g)
            t = t + 1
            m = b1 * m + (1.0 - b1) * gz
            v = b2 * v + (1.0 - b2) * gz * gz
            tf = t.astype(jnp.float32)
            m_hat = m / (1.0 - jnp.power(b1, tf))
            v_hat = v / (1.0 - jnp.power(b2, tf))
            z = z - lr * m_hat / (jnp.sqrt(v_hat) + eps_adam)
            return (z, m, v, t), None

        (z, m, v, t), _ = jax.lax.scan(
            adam_step, (z, m, v, t), None, length=cfg.peem_steps
        )
        vs = dec(z)
        w, h, g, vb = nmf_m_step(x2, vs[None], w, h, g, mask, cfg.eps)
        vx = jnp.maximum(g[:, :, None] * vs + vb, VX_FLOOR)
        cost = jnp.sum(
            (jnp.log(vx) + x2 / vx) * mask[:, :, None]
        ) / denom
        return (z, m, v, t, w, h, g), cost

    zeros = jnp.zeros_like(z_init)
    (z, _, _, _, w, h, g), cost = jax.lax.scan(
        em_iter,
        (z_init, zeros, zeros, jnp.zeros((), jnp.int32), w, h, g),
        None,
        length=cfg.niter,
    )

    vb = compute_vb(w, h)
    vs_scaled = g[:, :, None] * dec(z)
    vx = jnp.maximum(vs_scaled + vb, VX_FLOOR)
    m3 = mask[:, :, None]
    return McemResult((vs_scaled / vx) * m3, (vb / vx) * m3, cost, z, w, h, g)


def run_peem_wf(
    decoder: Callable[[jnp.ndarray], jnp.ndarray],
    x2: jnp.ndarray,
    z_init: jnp.ndarray,
    mask: jnp.ndarray,
    cfg: McemConfig = McemConfig(),
    y: jnp.ndarray | None = None,
    nmf_init: tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray] | None = None,
    decoder_mats=None,
    key: jax.Array | None = None,
) -> McemResult:
    """PEEM's EM loop + MCEM's Monte-Carlo Wiener expectation (the hybrid).

    The round-3 engine-quality matrix (PARITY.md §2b) showed WHERE pure
    PEEM loses: on checkpoints whose posterior is informative (IBM-
    conditioned M2, v3) the point-evaluated Wiener mask gives up 2.7-5 dB
    vs MCEM's posterior-AVERAGED mask. This engine keeps PEEM's cheap
    deterministic EM iterations (cfg.peem_steps Adam steps each — the NMF
    noise model fits the same way) and then computes the FINAL masks the
    MCEM way: one Metropolis-Hastings chain seeded at the PEEM optimum
    (``burnin_wf`` steps, masks averaged over ``nsamples_wf`` draws —
    identical machinery to run_mcem's tail, mcem.py:310-329 in the
    reference). Device cost is PEEM + one WF chain: ~100 MH steps total
    instead of MCEM's ~4100 at the default budget.

    Stochastic like MCEM (the WF chain samples), so parity claims are
    statistical; the EM trajectory itself is PEEM's deterministic one.
    ``key`` is REQUIRED; its NMF-init stream matches the other engines'
    (same ``split(key, 3)[0]``), and the WF chain uses the same third
    stream as run_mcem, so engines sharing a key share their NMF init.
    """
    if key is None:
        raise ValueError("run_peem_wf needs a key (the WF chain samples)")
    x2f, maskf, nmf0, decoder_f, dec, keys = _prep_em(
        decoder, x2, mask, cfg, y, nmf_init, decoder_mats, key)
    res = run_peem(decoder, x2, z_init, mask, cfg, y=y, nmf_init=nmf0,
                   decoder_mats=decoder_mats)

    sd = jnp.bfloat16 if cfg.fast_stats else jnp.float32
    _, energy, mh_step, mh_light = _make_mh_step(
        decoder_f, x2f, y, cfg.var_rw, stats_dtype=sd)
    wfs, wfn, z = _wf_expectation(
        dec, energy, mh_step, mh_light, x2f, maskf,
        res.z, res.w, res.h, res.g, keys[2], cfg, sd)
    return McemResult(wfs, wfn, res.cost, z, res.w, res.h, res.g)


def run_pmcem(
    decoder: Callable[[jnp.ndarray], jnp.ndarray],
    x2: jnp.ndarray,
    z_init: jnp.ndarray,
    mask: jnp.ndarray,
    key: jax.Array,
    cfg: McemConfig = McemConfig(),
    y: jnp.ndarray | None = None,
    nmf_init: tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray] | None = None,
    decoder_mats=None,
) -> McemResult:
    """Parallel-chain MCEM: R Metropolis-Hastings chains advanced together.

    The round-3 engine matrix localized PEEM's quality deficit to the
    SPREAD of Vs samples feeding the NMF M-step (run_peem_wf recovered
    ~nothing, so it is not the final mask average) — and MCEM buys that
    spread with 40 *sequential* decoder passes per EM iteration
    (reference mcem.py:207-265: burn-in 30 + 10 emitted samples on one
    chain). This engine is the TPU-first way to buy the same spread:
    ``cfg.pmcem_chains`` (R) independent chains carried across EM
    iterations, each EM iteration advancing ALL chains through
    ``cfg.pmcem_steps`` MH steps as ONE batched (R*B*N, L) decoder pass
    per step, with the last step's R accepted states as the M-step sample
    set (reference mcem.py:91-153 — the M-step is already defined over an
    R-sample set; it never cared that the reference's R samples came from
    one chain's history).

    Why this maps better to the hardware: the MH energy pass is
    HBM-bandwidth-bound on the loop-invariant |X|^2 and Vb planes (see
    McemConfig.fast_stats). A sequential chain re-reads both planes every
    step — 40 reads per EM iteration; R parallel chains evaluate against
    ONE broadcast read per step — ``pmcem_steps`` reads per iteration
    (4 at the default), while the R-fold decoder matmul batches onto the
    MXU instead of running R launches. Same chain-eval budget
    (R x steps = 40), ~10x fewer sequential HBM sweeps of the stat
    planes.

    Statistics: each chain is an exact MH kernel for the current
    (vb, g) posterior — detailed balance holds per chain, so at
    stationarity the R final states are R unbiased (correlated-in-time,
    independent-across-chains) posterior draws; ACROSS-chain independence
    is stronger than the reference's within-chain autocorrelated set.
    The trade-off is per-iteration mixing depth (4 sequential steps vs
    40): chains track the slowly-moving (vb, g) target across the
    ``niter`` outer iterations (400 total steps per chain at defaults),
    warm-started exactly like the reference's single chain. Chains are
    initialized overdispersed around ``z_init`` (chain 0 exactly at it,
    the rest perturbed by sqrt(var_rw)).

    The Wiener tail averages masks over ALL chains: ``pmcem_wf_burn``
    batched steps, then ``ceil(nsamples_wf / R)`` collect steps — a
    >= nsamples_wf-sample average like run_mcem's tail
    (mcem.py:310-329) at ~1/R the sequential depth.

    Key streams match the other engines (``_prep_em``): same k_nmf, so
    runs sharing a key share their NMF init.
    """
    b, n, f = x2.shape
    r = cfg.pmcem_chains
    x2, mask, (w, h, g), decoder, _, (_, k_em, k_wf) = _prep_em(
        decoder, x2, mask, cfg, y, nmf_init, decoder_mats, key)
    sd = jnp.bfloat16 if cfg.fast_stats else jnp.float32
    sqrt_var = jnp.sqrt(jnp.asarray(cfg.var_rw, jnp.float32))
    x2e = x2.astype(sd)

    def dec(z):  # z: (R, B, N, L) -> vs (R, B, N, F)
        if y is None:
            return decoder(z)
        yb = jnp.broadcast_to(y[None], z.shape[:-1] + (y.shape[-1],))
        return decoder(jnp.concatenate([z, yb], axis=-1))

    def energy(z, vs, vb, g):
        # vb (B,N,F) and g (B,N) broadcast over the chain axis: ONE HBM
        # read of each plane serves all R chains' energies
        vx = jnp.maximum(g[None, :, :, None] * vs + vb[None], VX_FLOOR)
        return jnp.sum(jnp.log(vx) + x2e[None] / vx, axis=-1) + \
            0.5 * jnp.sum(z**2, axis=-1)          # (R, B, N)

    def mh(carry, key, vb, g):
        """One batched MH step on all R chains (light carry: vs is a
        deterministic cache of z — recomputed where needed, never carried,
        same rationale as _make_mh_step.step_light)."""
        z, e = carry
        k1, k2 = jax.random.split(key)
        z_prime = z + sqrt_var * jax.random.normal(k1, z.shape)
        e_prime = energy(z_prime, dec(z_prime), vb, g)
        u = jax.random.uniform(k2, e.shape, minval=1e-38)
        acc = jnp.log(u) < (e - e_prime)          # (R, B, N)
        z = jnp.where(acc[..., None], z_prime, z)
        e = jnp.where(acc, e_prime, e)
        return (z, e), None

    denom = jnp.maximum(jnp.sum(mask) * f, 1.0)

    def em_iter(carry, key):
        z, w, h, g = carry
        vb = compute_vb(w, h)
        vbe = vb.astype(sd)
        e = energy(z, dec(z), vbe, g)   # refresh: vb/g changed since last iter
        (z, e), _ = jax.lax.scan(
            lambda c, k: mh(c, k, vbe, g),
            (z, e), jax.random.split(key, cfg.pmcem_steps))
        vs_samples = dec(z).astype(sd)            # (R, B, N, F)
        w, h, g, vb = nmf_m_step(x2, vs_samples, w, h, g, mask, cfg.eps)
        vx = jnp.maximum(
            g[None, :, :, None] * vs_samples.astype(jnp.float32) + vb[None],
            VX_FLOOR)
        cost = jnp.sum(
            jnp.mean(jnp.log(vx) + x2[None] / vx, axis=0) * mask[:, :, None]
        ) / denom
        return (z, w, h, g), cost

    k_init, k_em = jax.random.split(k_em)
    # overdispersed start: chain 0 at the encoder mean, the rest perturbed
    keep = (jnp.arange(r) > 0).astype(jnp.float32).reshape(
        (r,) + (1,) * z_init.ndim)
    z0 = z_init[None] + sqrt_var * keep * jax.random.normal(
        k_init, (r,) + z_init.shape)
    (z, w, h, g), cost = jax.lax.scan(
        em_iter, (z0, w, h, g), jax.random.split(k_em, cfg.niter))

    # ----- Wiener expectation over all chains (run_mcem tail, parallel-R)
    vb = compute_vb(w, h)
    vbe = vb.astype(sd)
    e = energy(z, dec(z), vbe, g)
    kb, ks = jax.random.split(k_wf)
    (z, e), _ = jax.lax.scan(
        lambda c, k: mh(c, k, vbe, g),
        (z, e), jax.random.split(kb, cfg.pmcem_wf_burn))

    n_collect = -(-cfg.nsamples_wf // r)          # ceil: >= nsamples_wf draws

    def wf_step(carry, key):
        (z, e), wfs_sum, wfn_sum = carry
        (z, e), _ = mh((z, e), key, vbe, g)
        vs = dec(z)
        vs_scaled = g[None, :, :, None] * vs
        vx = jnp.maximum(vs_scaled + vb[None], VX_FLOOR)
        return ((z, e), wfs_sum + jnp.sum(vs_scaled / vx, axis=0),
                wfn_sum + jnp.sum(vb[None] / vx, axis=0)), None

    zero = jnp.zeros_like(x2)
    ((z, e), wfs_sum, wfn_sum), _ = jax.lax.scan(
        wf_step, ((z, e), zero, zero), jax.random.split(ks, n_collect))
    n_avg = n_collect * r
    m3 = mask[:, :, None]
    return McemResult(wfs_sum / n_avg * m3, wfn_sum / n_avg * m3, cost,
                      z[0], w, h, g)


def run_mcem(
    decoder: Callable[[jnp.ndarray], jnp.ndarray],
    x2: jnp.ndarray,
    z_init: jnp.ndarray,
    mask: jnp.ndarray,
    key: jax.Array,
    cfg: McemConfig = McemConfig(),
    y: jnp.ndarray | None = None,
    nmf_init: tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray] | None = None,
    decoder_mats=None,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
) -> McemResult:
    """Run the full MCEM algorithm over a padded utterance batch.

    Args:
        decoder: maps (B, N, L[+Y]) latents to (B, N, F) speech variances
            (a pre-bound Flax ``apply(..., method='decode')``).
        x2: (B, N, F) mixture power spectrogram (padded frames arbitrary).
        z_init: (B, N, L) initial latents — the encoder posterior mean on the
            mixture (the reference grabs the mu output, mcem.py:201-203).
        mask: (B, N) 1.0 for valid frames.
        key: PRNG key.
        y: optional (B, N, Y) conditioning labels (M2 variants).
        nmf_init: optional (W, H, g) to override the random NMF init
            (reproducibility / tests).
        decoder_mats: raw decoder weights (pallas_mcem.extract_decoder_mlp);
            enables the bf16 fast decoder, and (opt-in) the Pallas chain
            kernel with all state resident in VMEM (pallas_mcem.run_mh_chain).
        use_pallas: True runs the kernel path (TPU, or with
            ``pallas_interpret`` for CPU tests). Default False — the kernel
            measured SLOWER than the XLA scan at this model size (numbers in
            pallas_mcem's docstring), so like ops.pallas_stft it is opt-in;
            passing decoder_mats alone only activates the fast decoder.
        pallas_interpret: run the kernel through the Pallas interpreter
            (CPU correctness tests).
    """
    b, n, f = x2.shape
    # three independent key streams via _prep_em: NMF init, EM iterations,
    # WF expectation (see its docstring for why fold_in would be wrong)
    x2, mask, (w, h, g), decoder, _, (_, k_em, k_wf) = _prep_em(
        decoder, x2, mask, cfg, y, nmf_init, decoder_mats, key)
    sd = jnp.bfloat16 if cfg.fast_stats else jnp.float32
    dec, energy, mh_step, mh_light = _make_mh_step(
        decoder, x2, y, cfg.var_rw, stats_dtype=sd
    )

    denom = jnp.maximum(jnp.sum(mask) * f, 1.0)

    def masked_cost(vx):
        # E[-log lik] over valid (r, b, n, f) cells (mcem.py:69-71)
        per = jnp.log(vx) + x2[None] / vx
        return jnp.sum(jnp.mean(per, axis=0) * mask[:, :, None]) / denom

    kernel_path = (
        decoder_mats is not None
        and bool(use_pallas)
        and (pallas_interpret or _on_tpu())
    )
    if kernel_path:
        from dvae_tpu.enhance.pallas_mcem import run_mh_chain

        l = z_init.shape[-1]
        x2_r = x2.reshape(b * n, f)
        y_r = None if y is None else y.reshape(b * n, -1)

        def chain(z, w, h, g, key, wf_mode):
            vb = compute_vb(w, h)
            out = run_mh_chain(
                decoder_mats,
                x2_r,
                vb.reshape(b * n, f),
                g.reshape(b * n),
                z.reshape(b * n, l),
                y_r,
                key,
                cfg.burnin_wf if wf_mode else cfg.burnin_e_step,
                cfg.nsamples_wf if wf_mode else cfg.nsamples_e_step,
                cfg.var_rw,
                wf_mode=wf_mode,
                interpret=pallas_interpret,
                tile=64,  # VMEM-safe: noise + samples blocks stay ~8 MB
            )
            return out, vb

        def em_iter_kernel(carry, key):
            z, w, h, g = carry
            (zf, vs_samples), vb = chain(z, w, h, g, key, wf_mode=False)
            z = zf.reshape(b, n, l)
            vs_samples = vs_samples.reshape(cfg.nsamples_e_step, b, n, f)
            w, h, g, vb = nmf_m_step(x2, vs_samples, w, h, g, mask, cfg.eps)
            vx = jnp.maximum(g[None, :, :, None] * vs_samples + vb[None], VX_FLOOR)
            return (z, w, h, g), masked_cost(vx)

        (z, w, h, g), cost = jax.lax.scan(
            em_iter_kernel, (z_init, w, h, g), jax.random.split(k_em, cfg.niter)
        )
        (zf, wfs_sum, wfn_sum), _ = chain(z, w, h, g, k_wf, wf_mode=True)
        z = zf.reshape(b, n, l)
        wfs = wfs_sum.reshape(b, n, f) / cfg.nsamples_wf
        wfn = wfn_sum.reshape(b, n, f) / cfg.nsamples_wf
        m3 = mask[:, :, None]
        return McemResult(wfs * m3, wfn * m3, cost, z, w, h, g)

    def em_iter(carry, key):
        z, w, h, g = carry
        vb = compute_vb(w, h)
        # the chain re-reads Vb every step: store it at the stats dtype
        vbe = vb.astype(sd)
        # Vs is a deterministic cache of z — it never rides a scan carry:
        # burn-in uses the light (z, e) carry and the cache is re-derived
        # only where samples are emitted (saves a (B,N,F) HBM round-trip
        # per burn-in step and per EM iteration).
        e = energy(z, dec(z), vbe, g)  # refresh: vb/g changed since last iter

        def mh(c, k):
            return mh_light(c, k, vbe, g)

        def mh_collect(c, k):
            c, _ = mh_step(c, k, vbe, g)
            return c, c[1].astype(sd)  # emit accepted Vs sample

        kb, ks = jax.random.split(key)
        # burn-in with the light (z, e) carry, then re-derive the Vs cache
        (z, e), _ = jax.lax.scan(
            mh, (z, e), jax.random.split(kb, cfg.burnin_e_step)
        )
        vs = dec(z)
        (z, vs, e), vs_samples = jax.lax.scan(
            mh_collect, (z, vs, e), jax.random.split(ks, cfg.nsamples_e_step)
        )  # vs_samples: (R, B, N, F) at the stats dtype
        # (measured neutral, don't retry: carrying vs at the stats dtype
        # through this scan — 352 vs 350 ms device time — the engine is not
        # limited by the collect carry's bandwidth)

        w, h, g, vb = nmf_m_step(x2, vs_samples, w, h, g, mask, cfg.eps)
        vx = jnp.maximum(g[None, :, :, None] * vs_samples + vb[None], VX_FLOOR)
        cost = masked_cost(vx)
        return (z, w, h, g), cost

    (z, w, h, g), cost = jax.lax.scan(
        em_iter, (z_init, w, h, g), jax.random.split(k_em, cfg.niter)
    )

    # ----- Wiener-filter expectation over a fresh MH chain (mcem.py:310-329)
    wfs, wfn, z = _wf_expectation(
        dec, energy, mh_step, mh_light, x2, mask, z, w, h, g, k_wf, cfg, sd)
    return McemResult(wfs, wfn, cost, z, w, h, g)
