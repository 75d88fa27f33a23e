"""x2 -> x4 generator weight surgery (reference: codes/SRN/scripts/
transfer_params.py): copy every parameter that exists with matching shape
from a source checkpoint into a freshly-initialized target model (the extra
x4 upsampler stage keeps its init)."""

from __future__ import annotations

import argparse

import jax
import numpy as np


def transfer(src_tree, dst_tree):
    """Copy shape-matching leaves from src into dst by matching paths."""
    src_flat = dict(jax.tree_util.tree_flatten_with_path(src_tree)[0])
    dst_flat, treedef = jax.tree_util.tree_flatten_with_path(dst_tree)
    out = []
    copied = 0
    for path, leaf in dst_flat:
        s = src_flat.get(path)
        if s is not None and np.shape(s) == np.shape(leaf):
            out.append(np.asarray(s))
            copied += 1
        else:
            out.append(np.asarray(leaf))
    return jax.tree_util.tree_unflatten(treedef, out), copied


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True, help="source (.pth or orbax dir)")
    p.add_argument("--out", required=True, help="output orbax dir")
    p.add_argument("--src_nb", type=int, default=23)
    p.add_argument("--dst_nf", type=int, default=64)
    p.add_argument("--dst_nb", type=int, default=23)
    p.add_argument("--dst_gc", type=int, default=32)
    p.add_argument("--dst_scale", type=int, default=4)
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from dasr_tpu.nn.generators import RRDBNet
    from dasr_tpu.train.checkpoints import (
        import_rrdbnet_params,
        restore_checkpoint,
        save_checkpoint,
    )

    if args.src.endswith(".pth"):
        src = import_rrdbnet_params(args.src, nb=args.src_nb)
    else:
        restored, _ = restore_checkpoint(args.src)
        src = restored["g"] if "g" in restored else restored

    model = RRDBNet(
        nf=args.dst_nf, nb=args.dst_nb, gc=args.dst_gc, upscale=args.dst_scale
    )
    dst = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
    merged, copied = transfer(src, dst)
    save_checkpoint(args.out, merged, step=0)
    print(f"copied {copied} matching tensors -> {args.out}")


if __name__ == "__main__":
    main()
