"""Shared CLI plumbing for the entry-point scripts.

The reference configures each script through an edited ``SETTINGS`` constant
block (e.g. training_M1.py:18-67); here every script is an argparse CLI with
the same defaults, and the reference's name-mangling scheme is preserved so
artifact paths stay comparable (SURVEY §5 config system)."""

from __future__ import annotations

import argparse
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def add_common(ap: argparse.ArgumentParser, training: bool = False,
               host_job: bool = False):
    ap.add_argument("--dataset-size", default="subset", choices=["subset", "complete"])
    ap.add_argument("--labels", default="vad_labels",
                    choices=["vad_labels", "ibm_labels"])
    ap.add_argument("--data-root", default="data")
    ap.add_argument("--models-root", default="models")
    # Data builders are host-side I/O jobs (the reference's are pure
    # numpy/librosa, e.g. create_train_set.py:152): their per-utterance
    # STFTs are transfer-bound, so dispatching them to a remote-attached
    # accelerator is both slower and needlessly coupled to its availability.
    # They default to CPU; pass --platform explicitly to override.
    ap.add_argument("--platform", default="cpu" if host_job else None,
                    help="force a jax platform before first use"
                         + (" (builders default to cpu — host-side I/O jobs)"
                            if host_job else " (e.g. cpu)"))
    ap.add_argument("--no-jit-cache", action="store_true",
                    help="disable the persistent XLA compilation cache "
                         "(default ~/.cache/dvae_tpu/jit; cold compiles of "
                         "the big programs cost minutes, warm loads seconds)")
    if training:
        ap.add_argument("--batch-size", type=int, default=128)
        ap.add_argument("--learning-rate", type=float, default=1e-4)
        ap.add_argument("--start-epoch", type=int, default=1)
        ap.add_argument("--end-epoch", type=int, default=500)
        ap.add_argument("--log-interval", type=int, default=250)
        ap.add_argument("--seed", type=int, default=0)
        ap.add_argument("--std-norm", action="store_true")
        ap.add_argument("--no-in-memory", action="store_true",
                        help="stream frame batches from the HDF5 instead of "
                             "loading the whole X/Y matrices into host RAM "
                             "(the complete-corpus h5 is multi-GB; the "
                             "reference used h5 chunk-cache random access, "
                             "training_M1.py:38-43 rdcc tuning)")
        ap.add_argument("--steps-per-dispatch", type=int, default=1,
                        help="optimizer steps per device dispatch (lax.scan); "
                             "amortizes host round-trips, identical math")
        ap.add_argument("--device-data", action="store_true",
                        help="upload each split to the device once and feed "
                             "the train step int32 INDICES (rows gathered "
                             "on-device) instead of shipping batch stacks "
                             "every dispatch — same math/shuffle/keys, "
                             "~500x less wire traffic at F=513 (frame "
                             "trainers; needs the in-memory dataset)")
        ap.add_argument("--run-name", default=None,
                        help="override the auto-mangled run dir name (use when "
                             "resuming with --start-epoch and a new --end-epoch)")
        ap.add_argument("--z-dim", type=int, default=16)
        ap.add_argument("--h-dim", type=int, nargs="+", default=[128, 128])
        ap.add_argument("--data-parallel", action="store_true",
                        help="shard batches over all visible devices")
        ap.add_argument("--multihost", action="store_true",
                        help="join a multi-process JAX runtime "
                             "(jax.distributed.initialize with cluster "
                             "auto-detection) before building the mesh; "
                             "implies --data-parallel")
    return ap


def enable_jit_cache(cache_dir: str | None = None):
    """Persistent XLA compilation cache, keyed by HLO hash.

    Cold jit of the big programs costs minutes (remote-attached TPU: the
    MCEM scan measured 173.6 s cold vs 9.4 s from a warm cache in a fresh
    process — 18x), and every CLI invocation is a fresh process. Respects an
    externally-set JAX_COMPILATION_CACHE_DIR; defaults to
    ``~/.cache/dvae_tpu/jit``. Safe across code changes (HLO-hash keys)."""
    import os

    import jax

    cache = (cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
             or os.path.join(os.path.expanduser("~"), ".cache", "dvae_tpu", "jit"))
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def maybe_force_platform(args):
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    if not getattr(args, "no_jit_cache", False):
        enable_jit_cache()
    else:
        # actually OFF, even when the environment inherited
        # JAX_COMPILATION_CACHE_DIR (jax reads the env var as the config
        # default, so skipping enable_jit_cache alone is not enough).
        # Matters beyond hygiene: serializing an AOT executable that
        # compile() silently satisfied from a persistent-cache entry of a
        # DIFFERENT device topology produced blobs that misexecute
        # ('Buffer Definition Event ... not found' on XLA:CPU).
        import jax

        jax.config.update("jax_compilation_cache_dir", None)
    if getattr(args, "multihost", False):
        # must run BEFORE anything initializes the XLA backend (model init,
        # jax.devices(), ...) — scripts call this right after arg parsing
        from dvae_tpu.parallel import distributed_init

        if not distributed_init():
            raise RuntimeError(
                "--multihost was requested but no multi-process runtime was "
                "detected (jax.distributed auto-detection found no cluster; "
                "set JAX_COORDINATOR_ADDRESS / run under a pod or SLURM "
                "launcher). Refusing to continue: every host would silently "
                "train an independent copy. For single-process multi-device "
                "runs use --data-parallel."
            )


def y_dim_for(labels: str) -> int:
    return 1 if labels == "vad_labels" else 513


def add_ablation(ap: argparse.ArgumentParser):
    """--ablation flag shared by the evaluate_ntcd_* CLIs: the reference's
    oracle-latent experiment modes (commented write lines at its
    evaluate_ntcd_M1.py:184-188; the `Zclean` overrides in mcem.py:297/:307;
    shipped golden wavs `*_clean_z_nomcem_*`)."""
    ap.add_argument(
        "--ablation", default="none",
        choices=["none", "clean-z", "clean-z-nomcem"],
        help="oracle-latent ablations: 'clean-z' starts the MH chain from "
             "the CLEAN spectrogram's encoding (Zclean) instead of the "
             "mixture's; 'clean-z-nomcem' pins the latent there and skips "
             "the Monte-Carlo machinery entirely (EM fits only the NMF "
             "noise model; deterministic Wiener masks). Outputs carry the "
             "reference's golden prefix, e.g. sa1_clean_z_nomcem_s_est.wav")
    return ap


def ablation_of(args) -> str:
    return args.ablation.replace("-", "_")


def default_out_dir(args, ckpt_path: str) -> str:
    """Enhanced-output destination shared by the evaluate_ntcd_* CLIs.

    Defaults under --models-root (never under --data-root, which may point
    at a read-only corpus); layout mirrors the reference's
    models/<model_name>/<ckpt>/... convention (evaluate_ntcd_M1.py:79-82) —
    the model-dir name must stay in the path or different models sharing a
    checkpoint prefix (M2 vs M2-info both write M2_epoch_*) would collide."""
    model_name = os.path.basename(os.path.normpath(
        args.model_dir or os.path.dirname(ckpt_path)))
    return args.output_dir or os.path.join(
        args.models_root, "enhanced", model_name,
        os.path.splitext(os.path.basename(ckpt_path))[0])


def frame_h5_path(args) -> str:
    return os.path.join(args.data_root, args.dataset_size, "processed",
                        "ntcd_timit", f"Clean_{args.labels}_upsampled.h5")


def add_std_norm_eval(ap: argparse.ArgumentParser):
    ap.add_argument("--std-norm", action="store_true",
                    help="the model was trained with --std-norm: normalize "
                         "the encoder input with the training h5's "
                         "X_train_mean/X_train_std for the latent init. "
                         "(The reference loads these statistics at eval but "
                         "never applies them — the '#TODO: if std_norm' at "
                         "its evaluate_ntcd_M1.py:145; this flag completes "
                         "that path.)")
    ap.add_argument("--norm-h5", default=None,
                    help="frame h5 holding X_train_mean/X_train_std for "
                         "--std-norm; defaults to the frame h5 of this "
                         "command's --labels — pass this when the model was "
                         "trained on a different label type's h5 than the "
                         "eval sweep reads")


def add_mcem_budgets(ap: argparse.ArgumentParser):
    """The MCEM sampling budgets of the reference's SETTINGS blocks
    (evaluate_ntcd_M1.py:57-65: niter, nsamples/burnin for the E-step and
    the Wiener-filter expectation, the random-walk variance, NMF rank).
    Defaults = the reference's nominal production values; None sentinels
    let McemConfig own the defaults in one place."""
    ap.add_argument("--niter", type=int, default=100,
                    help="EM iterations (reference production 100; the "
                         "paper's tables used 500)")
    ap.add_argument("--nmf-rank", type=int, default=10)
    ap.add_argument("--nsamples-e-step", type=int, default=None,
                    help="MH samples per E-step (default 10)")
    ap.add_argument("--burnin-e-step", type=int, default=None,
                    help="MH burn-in per E-step (default 30)")
    ap.add_argument("--nsamples-wf", type=int, default=None,
                    help="MH samples for the Wiener expectation (default 25)")
    ap.add_argument("--burnin-wf", type=int, default=None,
                    help="MH burn-in for the Wiener expectation (default 75)")
    ap.add_argument("--var-rw", type=float, default=None,
                    help="MH random-walk proposal variance (default 0.01)")
    ap.add_argument("--engine", choices=("mcem", "peem", "peem-wf", "pmcem"),
                    default="mcem",
                    help="E-step inference: 'mcem' = the reference's "
                         "Metropolis-Hastings Monte-Carlo EM; 'peem' = "
                         "gradient-based point-estimate EM (MAP latent, "
                         "deterministic masks, several-fold faster — "
                         "beyond-reference; see enhance/mcem.py:run_peem; "
                         "validity bounded, PARITY.md 2b); 'peem-wf' = "
                         "PEEM iterations + MCEM's sampled final Wiener "
                         "expectation (run_peem_wf — recovers the "
                         "posterior-averaged masks at ~PEEM cost); "
                         "'pmcem' = parallel-chain MCEM (R chains, one "
                         "batched decoder pass per MH step — same sample "
                         "budget as mcem with ~10x fewer sequential HBM "
                         "sweeps; run_pmcem)")
    ap.add_argument("--peem-steps", type=int, default=None,
                    help="[--engine peem] Adam steps on the latent per EM "
                         "iteration (default 4)")
    ap.add_argument("--peem-lr", type=float, default=None,
                    help="[--engine peem] Adam learning rate (default 0.01)")
    ap.add_argument("--pmcem-chains", type=int, default=None,
                    help="[--engine pmcem] parallel MH chains (default 10)")
    ap.add_argument("--pmcem-steps", type=int, default=None,
                    help="[--engine pmcem] MH steps per EM iteration, all "
                         "chains together (default 4)")
    return ap


def warn_peem_family(args, model_class: str, y_dim: int = 1) -> None:
    """Operational guard from the round-3/4 engine-quality matrices
    (PARITY.md §2b/§2c): the non-default engines measured well below MCEM
    on IBM-conditioned M2 (y_dim=513) and v3-class checkpoints — exactly
    the families whose posteriors are informative: peem/peem-wf
    -2.7…-5.0 dB (point-estimate MAP collapse), pmcem -3.9 dB at matched
    budget (-11 sigma; shallow sequential MH depth per EM iteration,
    evidence/pmcem_quality_matrix.json). Warn when --engine
    peem/peem-wf/pmcem targets one, so an operator runs a paired check
    before trusting the speedup. ``model_class``: m1/m2/m2v2/v3/v4/v5."""
    import warnings

    engine = getattr(args, "engine", "mcem")
    if engine not in ("peem", "peem-wf", "pmcem"):
        return
    risky = model_class == "v3" or (model_class in ("m2", "m2v2")
                                    and y_dim == 513)
    if risky:
        deficit = ("measured -3.9 dB SI-SDR (-11 sigma at matched sample "
                   "budget) BELOW MCEM on this family class (PARITY.md 2c, "
                   "evidence/pmcem_quality_matrix.json)" if engine == "pmcem"
                   else "measured 2.7-5.0 dB BELOW MCEM on this family "
                   "class (PARITY.md 2b, evidence/peem_quality_matrix.json)")
        warnings.warn(
            f"--engine {engine} on an "
            f"{'IBM-conditioned' if y_dim == 513 else model_class}-class "
            f"model: the engine-quality matrix {deficit}. Run a paired "
            "MCEM check on your checkpoint before relying on these "
            "outputs; MCEM is the quality-safe default.",
            stacklevel=2)


def mcem_config_of(args, **overrides):
    """McemConfig from the add_mcem_budgets flags (None = class default).

    Also the one place every enhancement surface (evaluate_ntcd_*,
    enhance_wav, serve) passes through, so the PEEM budget footgun is
    guarded HERE: under ``--engine peem`` a reduced ``--niter`` was
    measured per-utterance UNSTABLE (NMF underfit, +6/−3.5 dB SI-SDR
    swings at niter=20 — evidence/realchip_peem_engine.json), unlike
    MCEM whose quality degrades gracefully. PEEM's speedup comes from
    cheap iterations, not fewer of them."""
    import warnings

    from dvae_tpu.enhance.mcem import McemConfig

    if getattr(args, "engine", "mcem") in ("peem", "peem-wf") \
            and args.niter < 100:
        warnings.warn(
            f"--engine {args.engine} with --niter {args.niter} < 100: PEEM "
            "quality (and peem-wf's — it runs the identical PEEM EM loop) "
            "was measured UNSTABLE at reduced EM budgets (per-utterance "
            "SI-SDR swings of +6/-3.5 dB at niter=20; the NMF noise model "
            "underfits without the full EM schedule). Keep --niter >= 100 "
            "under peem — its speedup comes from cheaper iterations, not "
            "fewer. Proceeding as requested.",
            stacklevel=2)

    kw = dict(niter=args.niter, nmf_rank=args.nmf_rank)
    for field in ("nsamples_e_step", "burnin_e_step", "nsamples_wf",
                  "burnin_wf", "var_rw", "peem_steps", "peem_lr",
                  "pmcem_chains", "pmcem_steps"):
        v = getattr(args, field, None)
        if v is not None:
            kw[field] = v
    kw.update(overrides)
    return McemConfig(**kw)


def add_shard(ap: argparse.ArgumentParser):
    ap.add_argument("--shard", default=None, metavar="K/N",
                    help="enhance only the K-th of N contiguous chunks of "
                         "the utterance list (0-based) — coordination-free "
                         "fan-out across machines into a shared output tree "
                         "(the reference's np.array_split process sharding, "
                         "evaluate_ntcd_M1.py:249); combine with "
                         "resume-by-skip for elastic restarts")


def shard_of(args) -> tuple[int, int] | None:
    s = getattr(args, "shard", None)
    if s is None:
        return None
    try:
        k, n = (int(p) for p in s.split("/"))
    except ValueError:
        raise SystemExit(f"--shard must be K/N (got {s!r})")
    if not 0 <= k < n:
        # fail at parse time, not minutes later inside the sweep after the
        # checkpoint load / cold compile
        raise SystemExit(f"--shard K/N needs 0 <= K < N (got {s!r})")
    return k, n


def norm_stats_if(args):
    """(mean, std) from the training frame h5 when --std-norm, else None."""
    if not getattr(args, "std_norm", False):
        return None
    import h5py

    with h5py.File(getattr(args, "norm_h5", None) or frame_h5_path(args),
                   "r") as f:
        return f["X_train_mean"][:], f["X_train_std"][:]


def processed_dir(args) -> str:
    return os.path.join(args.data_root, args.dataset_size, "processed")


def raw_dir(args) -> str:
    return os.path.join(args.data_root, args.dataset_size, "raw")


def mangle(prefix: str, args, extra: str = "") -> str:
    """Reference naming scheme, e.g.
    ntcd_M1_nonorm_hdim_128_128_zdim_016_end_epoch_500 (training_M1.py:60).

    ``--run-name`` overrides it — needed when resuming with a different
    --end-epoch, since the auto name bakes end_epoch in."""
    if getattr(args, "run_name", None):
        return args.run_name
    norm = "norm" if getattr(args, "std_norm", False) else "nonorm"
    hdim = "_".join(f"{h:03d}" for h in args.h_dim)
    name = f"{prefix}_{extra + '_' if extra else ''}{norm}_hdim_{hdim}_zdim_{args.z_dim:03d}_end_epoch_{args.end_epoch:03d}"
    return name


def make_mesh_if(args):
    if getattr(args, "multihost", False) or getattr(args, "data_parallel", False):
        # under --multihost the runtime was already joined in
        # maybe_force_platform, so jax.devices() is the global device list
        from dvae_tpu.parallel import make_mesh

        return make_mesh()
    return None


def add_model_family(ap: argparse.ArgumentParser):
    """Flags describing a trained model of any family — shared by the
    serving surfaces (enhance_wav.py, serve.py), which take a checkpoint
    directly instead of walking the corpus/models tree."""
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--model-dir", default=None,
                    help="training output dir (best checkpoint auto-selected)")
    ap.add_argument("--model-class", default="m1",
                    choices=["m1", "m2", "m2v2", "v3", "v4", "v5"],
                    help="m1 = unconditional VAE; m2/m2v2 = label-conditioned "
                         "CVAEs; v3/v4/v5 = the M2-info families (own x->y "
                         "classifier, so self-soft labels need no label input)")
    ap.add_argument("--y-dim", type=int, default=1,
                    help="label width for conditional classes (1=VAD, 513=IBM)")
    ap.add_argument("--z-dim", type=int, default=16)
    ap.add_argument("--h-dim", type=int, nargs="+", default=[128, 128])


def family_model_template(args, abstract: bool = False):
    """(model, params_template) for the add_model_family flags.

    ``abstract=True`` builds the template with ``jax.eval_shape`` instead
    of a real flax init: identical tree structure/shapes/dtypes (pinned
    directly by tests/test_scripts.py::
    test_family_template_abstract_matches_concrete) but ZERO device
    compute — no init program is compiled or executed."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dvae_tpu.models import (CVAE, CVAE_v2, CVAE_v3, CVAE_v4,
                                 DisentangledVAE, VAE, init_params)

    cls = {"m1": VAE, "m2": CVAE, "m2v2": CVAE_v2, "v3": CVAE_v3,
           "v4": CVAE_v4, "v5": DisentangledVAE}[args.model_class]
    if args.model_class != "m1":
        model = cls(x_dim=513, y_dim=args.y_dim, z_dim=args.z_dim,
                    h_dim=tuple(args.h_dim))
        shapes = ((4, 513), (4, args.y_dim))
    else:
        model = cls(x_dim=513, z_dim=args.z_dim, h_dim=tuple(args.h_dim))
        shapes = ((4, 513),)
    if abstract:
        key_s = jax.ShapeDtypeStruct((2,), np.uint32)
        arg_s = [jax.ShapeDtypeStruct(s, np.float32) for s in shapes]
        params_t = jax.eval_shape(
            lambda k1, k2, *a: init_params(
                model, {"params": k1, "sample": k2}, *a),
            key_s, key_s, *arg_s)
    else:
        params_t = init_params(
            model,
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            *[jnp.ones(s) for s in shapes])
    return model, params_t


def load_family_model(args, abstract: bool = False):
    """(model, params, checkpoint_path) from the add_model_family flags.

    Call after maybe_force_platform (first jax use binds the platform).

    ``abstract=True`` builds the checkpoint-load template with
    ``jax.eval_shape`` (see family_model_template) — the serving-boot
    fast path (serve.py): a real init was measured at 6 s of the boot's
    model_load phase on this host's CPU, pure compile+dispatch overhead
    for values the checkpoint immediately overwrites. The default stays
    concrete for trainers that may use the init values (fresh runs)."""
    from dvae_tpu.train import checkpoint as ckpt

    model, params_t = family_model_template(args, abstract=abstract)
    path = args.checkpoint or ckpt.best_checkpoint(args.model_dir)
    return model, ckpt.load_checkpoint(path, params_t), path
