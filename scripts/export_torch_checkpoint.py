#!/usr/bin/env python
"""Export a dvae-tpu checkpoint as a reference-named torch .pt state_dict.

The reverse direction of the .pt import bridge (dvae_tpu/train/torch_import.py):
weights trained HERE become a ``torch.save``'d state_dict that the reference's
own model classes strict-load (``VariationalAutoencoder([513,16,[128,128]])
.load_state_dict(torch.load(out))`` — reference reconstruct_M1.py:97), so a
reference user can take dvae-tpu-trained models back into their torch
infrastructure. Name/transpose mapping is the same structural walk the import
uses; round-trips through the reference classes are pinned in
tests/test_torch_bridge.py.
"""

import argparse
import os

from _lib import maybe_force_platform


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True,
                    help=".msgpack checkpoint (as written by the trainers)")
    ap.add_argument("--out", default=None,
                    help="output .pt path (default: checkpoint with .pt)")
    ap.add_argument("--model", default="m1",
                    choices=["m1", "m2", "m2v2", "m2v3", "m2v4", "m2v5"],
                    help="model family the checkpoint belongs to (decides "
                         "the parameter-tree template): m1=VAE, "
                         "m2=DeepGenerativeModel, m2v2..v5 = the _v2.._v5 "
                         "classes (reference models.py:125-439)")
    ap.add_argument("--y-dim", type=int, default=1)
    ap.add_argument("--z-dim", type=int, default=16)
    ap.add_argument("--h-dim", type=int, nargs="+", default=[128, 128])
    ap.add_argument("--platform", default="cpu",
                    help="conversion is host work; default cpu")
    ap.add_argument("--no-jit-cache", action="store_true")
    args = ap.parse_args()
    maybe_force_platform(args)

    import jax
    import jax.numpy as jnp
    import torch

    from dvae_tpu.models import (CVAE, CVAE_v2, CVAE_v3, CVAE_v4,
                                 DisentangledVAE, VAE, init_params)
    from dvae_tpu.train import checkpoint as ckpt
    from dvae_tpu.train.torch_import import export_torch_state_dict

    cls = {"m1": VAE, "m2": CVAE, "m2v2": CVAE_v2, "m2v3": CVAE_v3,
           "m2v4": CVAE_v4, "m2v5": DisentangledVAE}[args.model]
    kw = dict(x_dim=513, z_dim=args.z_dim, h_dim=tuple(args.h_dim))
    if args.model != "m1":
        kw["y_dim"] = args.y_dim
    model = cls(**kw)
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    xa = jnp.ones((4, 513))
    if args.model == "m1":
        template = init_params(model, rngs, xa)
    else:
        template = init_params(model, rngs, xa, jnp.ones((4, args.y_dim)))

    params = ckpt.load_checkpoint(args.checkpoint, template)
    sd = export_torch_state_dict(params)
    out = args.out or os.path.splitext(args.checkpoint)[0] + ".pt"
    torch.save(sd, out)
    print(f"exported {len(sd)} tensors -> {out}")


if __name__ == "__main__":
    main()
