"""Checkpointing with the reference's naming/metadata semantics.

The reference saves a state_dict per epoch with the validation loss baked
into the filename (training_M1.py:195-196, 'M1_epoch_{:03d}_vloss_{:.2f}.pt')
and supports substring-filtered partial loads for transfer learning
(training_M2_info_vad_pretrain.py:103-113) and submodule extraction
(evaluate_ntcd_M2_info_vad.py:322-324).

Here a checkpoint is a single msgpack file (flax.serialization) of the
params pytree — optionally with optimizer state — plus a JSON sidecar with
epoch/metrics. Partial loads filter by key-path substring on the flattened
tree, which subsumes both reference patterns.
"""

from __future__ import annotations

import json
import pathlib

import jax
import jax.numpy as jnp
from flax import serialization, traverse_util


def checkpoint_name(prefix: str, epoch: int, vloss: float) -> str:
    return f"{prefix}_epoch_{epoch:03d}_vloss_{vloss:.2f}"


def save_checkpoint(model_dir, name: str, params, opt_state=None, metadata: dict | None = None):
    """Write <model_dir>/<name>.msgpack (+ .json metadata)."""
    model_dir = pathlib.Path(model_dir)
    model_dir.mkdir(parents=True, exist_ok=True)
    payload = {"params": jax.device_get(params)}
    if opt_state is not None:
        payload["opt_state"] = jax.device_get(opt_state)
    path = model_dir / f"{name}.msgpack"
    # atomic: a kill mid-write must not leave a truncated .msgpack that the
    # newest-mtime resume rule (loop._resume_checkpoint) would then pick
    tmp = path.with_suffix(".msgpack.tmp")
    tmp.write_bytes(serialization.to_bytes(payload))
    tmp.replace(path)
    if metadata is not None:
        (model_dir / f"{name}.json").write_text(json.dumps(metadata, indent=1))
    return path


def load_checkpoint(path, params_template, opt_state_template=None):
    """Restore params (and optionally optimizer state) from a checkpoint.

    Tolerates both payload layouts: params-only and params+opt_state (a
    params-only load of a params+opt_state file simply ignores the
    optimizer state). A ``.pt`` path is a REFERENCE torch checkpoint
    (``torch.save(model.state_dict())``, training_M1.py:195) and loads
    through the weight bridge — users of the reference can point any CLI's
    --checkpoint at their existing .pt files (params only; torch
    checkpoints never carry optimizer state, SURVEY §5)."""
    path = pathlib.Path(path)
    if path.suffix == ".pt":
        from dvae_tpu.train.torch_import import load_torch_state_dict

        params = load_torch_state_dict(params_template, str(path))
        if opt_state_template is not None:
            raise ValueError(
                f"{path} is a reference torch checkpoint: it has no "
                "optimizer state to resume from"
            )
        return params
    raw = serialization.msgpack_restore(path.read_bytes())
    params = serialization.from_state_dict(params_template, raw["params"])
    if opt_state_template is not None:
        if "opt_state" not in raw:
            raise ValueError(
                f"{path} has no optimizer state (params-only checkpoint)"
            )
        opt_state = serialization.from_state_dict(opt_state_template, raw["opt_state"])
        return params, opt_state
    return params


def partial_load(path, params_template, key_substring: str):
    """Load only parameters whose '/'-joined path contains ``key_substring``;

    everything else keeps the template's values (the reference's filtered
    ``state_dict`` update, training_M2_info_vad_pretrain.py:103-113). Works
    for reference ``.pt`` checkpoints too: the bridge applies the filter
    itself so entries outside the filtered region (possibly from a model
    with different dims) are ignored rather than strict-matched."""
    path = pathlib.Path(path)
    if path.suffix == ".pt":
        from dvae_tpu.train.torch_import import load_torch_state_dict

        flat_old = traverse_util.flatten_dict(params_template)
        if not any(key_substring in "/".join(map(str, k)) for k in flat_old):
            raise KeyError(
                f"filter {key_substring!r} matches no parameter path in the "
                "template (wrong layout or typo?)"
            )
        return load_torch_state_dict(
            params_template, str(path), filter_substring=key_substring
        )
    # Flatten the raw msgpack tree and merge only the filtered region —
    # NOT a full strict from_state_dict first, which would reject a donor
    # checkpoint whose structure differs OUTSIDE the filtered region (e.g.
    # transferring 'classifier' from a model with different encoder dims),
    # a case the .pt branch above already tolerates.
    raw = serialization.msgpack_restore(path.read_bytes())
    flat_new = traverse_util.flatten_dict(raw.get("params", raw))
    flat_old = traverse_util.flatten_dict(params_template)
    if not any(key_substring in "/".join(map(str, k)) for k in flat_old):
        # a filter matching nothing would silently return the template —
        # a typo'd/wrong-layout warm-start must fail loudly, not no-op
        raise KeyError(
            f"filter {key_substring!r} matches no parameter path in the "
            "template (wrong layout or typo?)"
        )
    merged = {}
    for k, v in flat_old.items():
        if key_substring in "/".join(map(str, k)):
            if k not in flat_new:
                raise KeyError(
                    f"{path} has no entry {'/'.join(map(str, k))} matching "
                    f"filter {key_substring!r}"
                )
            arr = jnp.asarray(flat_new[k])
            if arr.shape != jnp.shape(v):
                raise ValueError(
                    f"shape mismatch for {'/'.join(map(str, k))}: checkpoint "
                    f"{arr.shape} vs template {jnp.shape(v)}"
                )
            merged[k] = arr
        else:
            merged[k] = v
    return traverse_util.unflatten_dict(merged)


def extract_submodule(params, *path_keys):
    """Pull a nested submodule out of a param tree (e.g. 'params', 'enc_dec_clf')

    — the reference's post-load submodule extraction
    (evaluate_ntcd_M2_info_vad.py:322-324)."""
    sub = params
    for k in path_keys:
        sub = sub[k]
    return sub


def best_checkpoint(model_dir, prefix: str | None = None) -> pathlib.Path:
    """The checkpoint with the lowest vloss encoded in its filename.

    Considers our ``.msgpack`` checkpoints and the reference's ``.pt`` ones
    alike (same ``<prefix>_epoch_{e}_vloss_{v}`` naming scheme), so a
    --model-dir full of reference-trained checkpoints works unchanged."""
    if model_dir is None:
        raise SystemExit(
            "no checkpoint source: pass --checkpoint <file> or "
            "--model-dir <dir of <prefix>_epoch_*_vloss_* checkpoints>"
        )
    model_dir = pathlib.Path(model_dir)
    cands = []
    for p in list(model_dir.glob("*.msgpack")) + list(model_dir.glob("*.pt")):
        stem = p.stem
        if prefix and not stem.startswith(prefix):
            continue
        try:
            vloss = float(stem.rsplit("_vloss_", 1)[1])
        except (IndexError, ValueError):
            continue
        cands.append((vloss, p))
    if not cands:
        raise FileNotFoundError(f"no checkpoints under {model_dir}")
    return min(cands, key=lambda t: t[0])[1]
