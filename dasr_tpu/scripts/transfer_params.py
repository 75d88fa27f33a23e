"""Generator weight surgery.

Two modes, mirroring the two reference scripts:

  * default — x2 -> x4 RRDB transfer (codes/SRN/scripts/transfer_params.py):
    copy every parameter that exists with matching shape from a source
    checkpoint into a freshly-initialized target model (the extra x4
    upsampler stage keeps its init);
  * ``--sft`` — SRResNet/SRGAN -> SFT-net initialization
    (codes/SRN/scripts/transfer_params_sft.py): re-init an SFT net with
    kaiming-normal*0.1 weights / zero biases, then graft the pretrained
    torso — conv0, the 16 residual blocks' convs into
    ``sft_branch.{i}.conv{0,1}``, the trunk conv into
    ``sft_branch.{nb+1}``, and the HR branch (``model.{2,5,8,10}`` ->
    ``HR_branch.{0,3,6,8}``). The SFT layers and CondNet keep their fresh
    init. Output is a torch ``.pth`` loadable by both the reference and
    ``import_sftnet_params`` (cli/sftgan_test).
"""

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


def _kaiming_reinit(sd, rng):
    """Reference raw-net init (transfer_params_sft.py:8-15): weights
    kaiming_normal(a=0, fan_in)*0.1, biases zero. OIHW fan_in = I*kh*kw."""
    out = {}
    for k, v in sd.items():
        a = np.asarray(v)
        if k.endswith(".weight") and a.ndim == 4:
            fan_in = a.shape[1] * a.shape[2] * a.shape[3]
            std = float(np.sqrt(2.0 / fan_in)) * 0.1
            out[k] = rng.standard_normal(a.shape).astype(np.float32) * std
        else:
            out[k] = np.zeros_like(a, dtype=np.float32)
    return out


def sft_surgery(src_sd, n_blocks: int = 16, seed: int = 0):
    """Build an SFT-net torch state dict initialized from a pretrained
    SRResNet/SRGAN ``model.*`` state dict (transfer_params_sft.py:17-37)."""
    import jax.numpy as jnp

    from dasr_tpu.nn.sft import SFTNet
    from dasr_tpu.train.checkpoints import export_sftnet_state_dict

    variables = SFTNet(n_blocks=n_blocks).init(
        jax.random.key(seed),
        jnp.zeros((1, 8, 8, 3)),
        jnp.zeros((1, 32, 32, 8)),
    )
    raw = _kaiming_reinit(
        export_sftnet_state_dict(variables, n_blocks=n_blocks),
        np.random.default_rng(seed),
    )

    copy = {"conv0": "model.0"}
    for i in range(n_blocks):
        copy[f"sft_branch.{i}.conv0"] = f"model.1.sub.{i}.res.0"
        copy[f"sft_branch.{i}.conv1"] = f"model.1.sub.{i}.res.2"
    copy[f"sft_branch.{n_blocks + 1}"] = f"model.1.sub.{n_blocks}"
    for dst, src in zip((0, 3, 6, 8), (2, 5, 8, 10)):
        copy[f"HR_branch.{dst}"] = f"model.{src}"
    for dst, src in copy.items():
        for suffix in (".weight", ".bias"):
            raw[dst + suffix] = np.asarray(src_sd[src + suffix], dtype=np.float32)
    return raw


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True, help="source (.pth or orbax dir)")
    p.add_argument("--out", required=True,
                   help="output orbax dir (default mode) or .pth (--sft)")
    p.add_argument("--sft", action="store_true",
                   help="SRResNet/SRGAN .pth -> SFT-net init .pth")
    p.add_argument("--src_nb", type=int, default=23)
    p.add_argument("--dst_nf", type=int, default=64)
    p.add_argument("--dst_nb", type=int, default=23)
    p.add_argument("--dst_gc", type=int, default=32)
    p.add_argument("--dst_scale", type=int, default=4)
    p.add_argument("--sft_nb", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    if args.sft:
        import torch

        from dasr_tpu.train.checkpoints import load_torch_state_dict

        src_sd = load_torch_state_dict(args.src)
        out_sd = sft_surgery(src_sd, n_blocks=args.sft_nb, seed=args.seed)
        torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in out_sd.items()},
                   args.out)
        print(f"SFT init written -> {args.out}")
        return

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
