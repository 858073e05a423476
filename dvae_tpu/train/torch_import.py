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
    """Flax params -> reference-named torch ``state_dict`` (tensors)."""
    import torch

    sd = {}
    for path, leaf in _walk_dense(params.get("params", params)):
        name = _torch_name(path)
        sd[name + ".weight"] = torch.tensor(np.asarray(leaf["kernel"]).T.copy())
        sd[name + ".bias"] = torch.tensor(np.asarray(leaf["bias"]).copy())
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

    def in_filter(path):
        # match against the same strings checkpoint.partial_load uses for
        # msgpack checkpoints: 'params/<module path>/{kernel,bias}'
        full = "/".join(prefix + path)
        return (filter_substring in full + "/kernel"
                or filter_substring in full + "/bias")

    def rebuild(t, path=()):
        if isinstance(t, dict) and "kernel" in t:
            if filter_substring and not in_filter(path):
                return t  # outside the filtered region: keep template values
            name = _torch_name(path)
            out = dict(t)
            if name + ".weight" in sd:
                w = sd[name + ".weight"].T
                b = sd[name + ".bias"]
                if w.shape != t["kernel"].shape or b.shape != t["bias"].shape:
                    raise ValueError(
                        f"shape mismatch for {name}: checkpoint "
                        f"{w.shape}/{b.shape} vs model "
                        f"{t['kernel'].shape}/{t['bias'].shape}"
                    )
                out["kernel"] = jnp.asarray(w, t["kernel"].dtype)
                out["bias"] = jnp.asarray(b, t["bias"].dtype)
                consumed.update({name + ".weight", name + ".bias"})
            elif strict:
                raise KeyError(f"checkpoint is missing {name}.weight")
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
        frag = _torch_name(tuple(
            q for q in filter_substring.strip("/").split("/")
            if q and q not in ("params", "kernel", "bias")
        ))
        leftovers = {k for k in leftovers if frag and frag in k}
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
