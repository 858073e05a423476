"""Two-way weight bridge to the reference's torch checkpoints.

A user of the reference switching to this framework brings ``.pt``
checkpoints saved by ``torch.save(model.state_dict())``
(training_M1.py:195-196 and siblings). :func:`load_torch_state_dict` maps
them onto our Flax parameter trees; :func:`export_torch_state_dict` is the
inverse (used by the cross-engine parity harness to run the reference's
MCEM with our weights).

The mapping is structural, not per-model: both frameworks mirror the
reference's module hierarchy, so a Flax path translates to the torch
parameter name by two rules —

* ``layers_{i}``      -> ``{i}``           (nn.ModuleList indexing:
  Encoder/Decoder ``hidden`` lists, models.py:98/:117)
* ``hidden_{i}``      -> ``hidden.{i}``    (our Classifier's flattened
  naming vs the reference's ModuleList, models.py:54)

plus kernel/bias -> transposed weight/bias (torch nn.Linear stores
(out, in)). This covers every family: M1 (``encoder.*``/``decoder.*``),
M2 variants (+ ``classifier.*``, ``auxiliary.*``) and the disentangled v5
(``enc_dec_clf.*`` + ``auxiliary.*``) — verified by strict round-trips
through the reference's own classes in tests/test_torch_bridge.py.
"""

from __future__ import annotations

import re

import jax
import numpy as np


def _torch_name(path) -> str:
    parts = []
    for p in path:
        if p.startswith("layers_") and p[7:].isdigit():
            parts.append(p[7:])
        elif re.fullmatch(r"hidden_\d+", p):
            parts.extend(["hidden", p.split("_")[1]])
        else:
            parts.append(p)
    return ".".join(parts)


def _walk_dense(tree, path=()):
    """Yield (path, leaf_dict) for every Dense-style {kernel, bias} leaf."""
    if isinstance(tree, dict) and "kernel" in tree:
        yield path, tree
        return
    if isinstance(tree, dict):
        for k in sorted(tree):
            yield from _walk_dense(tree[k], path + (k,))


def export_torch_state_dict(params):
    """Flax params -> reference-named torch ``state_dict`` (tensors).

    Raises if the tree holds leaves the Dense walk cannot express (e.g. an
    LSTM cell or BatchNorm collections) — an incomplete state_dict must
    fail HERE, not later as a confusing strict-load error (or worse, a
    silent lenient load) on the torch side. Every reference model family is
    all-Dense, so this only fires for genuinely unsupported trees."""
    import torch

    tree = params.get("params", params)
    sd = {}
    covered = 0
    for path, leaf in _walk_dense(tree):
        name = _torch_name(path)
        sd[name + ".weight"] = torch.tensor(np.asarray(leaf["kernel"]).T.copy())
        sd[name + ".bias"] = torch.tensor(np.asarray(leaf["bias"]).copy())
        covered += len(leaf)  # kernel + bias (+ any extra keys in the leaf)
    total = len(jax.tree.leaves(tree))
    if covered != total:
        raise ValueError(
            f"export covers {covered} of {total} array leaves — the tree "
            "holds non-Dense parameters (LSTM/BatchNorm/...) the reference "
            "state_dict naming cannot express"
        )
    return sd


def load_torch_state_dict(params_template, state_dict,
                          strict: bool = True,
                          filter_substring: str | None = None):
    """Reference torch ``state_dict`` (or ``.pt`` path) -> Flax params.

    ``params_template`` is a freshly initialized params tree of the matching
    model (shapes define the expectation). ``strict=True`` additionally
    requires every checkpoint entry to be consumed — catching family
    mismatches (e.g. loading an M2 checkpoint into an M1).

    ``filter_substring`` restricts the load to parameters whose
    '/'-joined Flax path contains the substring; everything else keeps the
    template's values and unconsumed checkpoint entries OUTSIDE the
    filtered region are expected (the reference's transfer-learning trick,
    training_M2_info_vad_pretrain.py:103-113). The match runs against the
    full flattened path incl. the 'params' prefix and kernel/bias leaf —
    the same strings ``checkpoint.partial_load`` matches for msgpack
    checkpoints, so e.g. 'params/enc_dec_clf' or 'hidden_0/kernel' work
    identically for both formats. Shape mismatches inside the filtered
    region still raise, as do (under ``strict``) checkpoint entries inside
    the region that map to nothing in the template (e.g. a donor
    classifier with more layers than the recipient).
    """
    import jax.numpy as jnp

    if isinstance(state_dict, (str, bytes)) or hasattr(state_dict, "__fspath__"):
        import torch

        state_dict = torch.load(state_dict, map_location="cpu", weights_only=True)
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    has_params_key = "params" in params_template
    tree = {"params": params_template["params"]} if has_params_key else dict(params_template)
    consumed = set()

    prefix = ("params",) if has_params_key else ()

    def leaf_in_filter(path, leaf):
        # match against the same strings checkpoint.partial_load uses for
        # msgpack checkpoints: 'params/<module path>/{kernel,bias}'. Kernel
        # and bias are filtered INDEPENDENTLY, mirroring the msgpack
        # flattened-leaf semantics ('hidden_0/kernel' loads only the kernel).
        return filter_substring in "/".join(prefix + path) + "/" + leaf

    def rebuild(t, path=()):
        if isinstance(t, dict) and "kernel" in t:
            load = {
                leaf: not filter_substring or leaf_in_filter(path, leaf)
                for leaf in ("kernel", "bias")
            }
            if not any(load.values()):
                return t  # outside the filtered region: keep template values
            name = _torch_name(path)
            out = dict(t)
            src = {"kernel": name + ".weight", "bias": name + ".bias"}
            missing = [src[leaf] for leaf in src if load[leaf] and src[leaf] not in sd]
            if missing:
                if strict or (name + ".weight" in sd or name + ".bias" in sd):
                    # a half-present Dense is an error even lenient: silently
                    # pairing a loaded weight with a template bias (or vice
                    # versa) would produce a frankenmodel
                    raise KeyError(f"checkpoint is missing {missing[0]}")
                return out
            for leaf in ("kernel", "bias"):
                if not load[leaf]:
                    continue
                v = sd[src[leaf]].T if leaf == "kernel" else sd[src[leaf]]
                if v.shape != t[leaf].shape:
                    raise ValueError(
                        f"shape mismatch for {src[leaf]}: checkpoint "
                        f"{v.shape} vs model {t[leaf].shape}"
                    )
                out[leaf] = jnp.asarray(v, t[leaf].dtype)
                consumed.add(src[leaf])
            return out
        if isinstance(t, dict):
            return {k: rebuild(v, path + (k,)) for k, v in t.items()}
        return t

    inner = rebuild(tree["params"] if has_params_key else tree)
    leftovers = set(sd) - consumed
    if filter_substring:
        # entries outside the filtered region are expected leftovers, but an
        # in-region entry the template never consumed means the donor's
        # filtered submodule is structurally bigger (e.g. more hidden
        # layers) — a half-transfer the reference's strict load would catch.
        filt_parts = [q for q in filter_substring.strip("/").split("/") if q]
        leaf_only = {"kernel": ".weight", "bias": ".bias"}.get(
            filt_parts[-1] if filt_parts else "")
        frag = _torch_name(tuple(
            q for q in filt_parts if q not in ("params", "kernel", "bias")
        ))
        frag_parts = frag.split(".") if frag else []

        def in_region(key):
            # anchor the fragment on dot-separated name components — a bare
            # index fragment like '0' (from 'layers_0') must match the
            # component '0', not any digit 0 anywhere in the key
            base = key[: -len(".weight")] if key.endswith(".weight") else \
                key[: -len(".bias")] if key.endswith(".bias") else key
            kparts = base.split(".")
            hit = not frag_parts or any(
                kparts[i : i + len(frag_parts)] == frag_parts
                for i in range(len(kparts) - len(frag_parts) + 1)
            )
            if hit and leaf_only:
                # a leaf-specific filter ('.../kernel') deliberately leaves
                # the sibling leaf unconsumed
                hit = key.endswith(leaf_only)
            return hit

        leftovers = {k for k in leftovers if in_region(k)}
    if strict and leftovers:
        raise KeyError(
            f"checkpoint entries not consumed by the model: {sorted(leftovers)[:6]}"
            f"{'...' if len(leftovers) > 6 else ''} — wrong model family/dims?"
        )
    if has_params_key:
        out = dict(params_template)
        out["params"] = inner
        return out
    return inner
