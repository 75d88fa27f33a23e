"""DSN single-model test CLI (reference: codes/DSN/test.py:87-152).

Loads a trained DSN generator (orbax dir or reference ``.tar``) and runs it
over a folder, saving the degraded outputs; optionally also saves the
discriminator's realness maps. The reference's ``test.py`` is stale (it
constructs the D with a removed signature, DSN/test.py:90); this CLI is the
working equivalent.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description="Apply a trained DSN model to a folder")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--input_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--generator", default="DeResnet")
    p.add_argument("--num_res_blocks", type=int, default=8)
    p.add_argument("--upscale_factor", type=int, default=4, choices=[4, 1, 2])
    p.add_argument("--save_realness", action="store_true",
                   help="also run the FSD discriminator and save DDMs")
    p.add_argument("--discriminator", default="FSD")
    p.add_argument("--filter", default="gau")
    p.add_argument("--norm_layer", default="Instance")
    p.add_argument("--kernel_size", type=int, default=5)
    args = p.parse_args(argv)

    from dasr_tpu.utils.runtime import setup_runtime

    setup_runtime()

    import jax
    import jax.numpy as jnp

    from dasr_tpu.data.io import list_images, read_img, save_img
    from dasr_tpu.nn.discriminators import FSDiscriminator
    from dasr_tpu.nn.generators import DSGANGenerator, DeResnet
    from dasr_tpu.ops.rf_splat import CONVNETS, ddm_shape_for, ddm_splat
    from dasr_tpu.train.checkpoints import (
        import_deresnet_params,
        import_dsgan_generator_params,
        import_fsd_discriminator_params,
        load_dsn_tar,
        restore_checkpoint,
    )

    if args.generator == "DSGAN":
        g_model = DSGANGenerator(n_res_blocks=args.num_res_blocks)
    else:
        g_model = DeResnet(n_res_blocks=args.num_res_blocks, scale=args.upscale_factor)

    vars_d = None
    if os.path.isdir(args.checkpoint):
        restored, step = restore_checkpoint(args.checkpoint)
        params_g = restored["g"]["params"]
        if args.save_realness:
            vars_d = restored["d_target"]["params"]
        print(f"Using orbax checkpoint at step {step}")
    else:
        ckpt = load_dsn_tar(args.checkpoint)
        sd_g = ckpt.get("model_g_state_dict", ckpt)
        if args.generator == "DSGAN":
            params_g = import_dsgan_generator_params(sd_g, args.num_res_blocks)
        else:
            params_g = import_deresnet_params(
                sd_g, args.num_res_blocks, args.upscale_factor
            )
        if args.save_realness:
            vars_d = import_fsd_discriminator_params(
                ckpt.get("models_d_state_dict", ckpt), norm_layer=args.norm_layer
            )

    g_apply = jax.jit(g_model.apply)
    os.makedirs(args.output_dir, exist_ok=True)
    d_model = None
    if args.save_realness:
        d_model = FSDiscriminator(
            d_arch=args.discriminator, filter_type=args.filter,
            kernel_size=args.kernel_size, norm_layer=args.norm_layer,
            use_running_average=True,
        )
        d_apply = jax.jit(d_model.apply)

    from dasr_tpu.utils.transfer import pipelined

    def dispatch(path):
        img = read_img(path)
        out_dev = g_apply(params_g, jnp.asarray(img)[None])[0]
        ddm = None
        if d_model is not None:
            scores = d_apply(vars_d, out_dev[None])[0, :, :, 0]
            h, w = ddm_shape_for(args.filter, out_dev.shape[0], out_dev.shape[1])
            ddm = ddm_splat(scores, h, w, CONVNETS[args.discriminator])
        return out_dev, ddm

    for path, (out_dev, ddm) in pipelined(list_images(args.input_dir), dispatch):
        base = os.path.basename(path)
        save_img(np.asarray(out_dev), os.path.join(args.output_dir, base))
        if ddm is not None:
            np.save(
                os.path.join(args.output_dir, base.split(".")[0] + "_ddm"),
                np.asarray(ddm)[None, None],
            )
        print(base)


if __name__ == "__main__":
    main()
