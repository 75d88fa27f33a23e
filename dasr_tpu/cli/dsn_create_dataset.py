"""Dataset + domain-distance-map generation CLI.

Reference-compatible ``python -m dasr_tpu.cli.dsn_create_dataset
--checkpoint ... --name ...`` mirroring codes/DSN/create_dataset_modified.py:
runs the trained DSN generator over every target HR image to produce
pseudo-paired LRs (``imgs_from_target/*.png``) and back-projects the
discriminator's patch scores into per-pixel DDMs (``ddm_target/*.npy``,
shape (1,1,h,w) like the reference), optionally also for source images.

TPU-native differences: the whole-image G/D forward runs tiled
(dasr_tpu.ops.tiled) when images exceed the memory budget — the reference
pushes full 2K images through un-tiled (create_dataset_modified.py:156) and
simply OOMs on large inputs; the DDM splat is two MXU matmuls instead of a
Python loop (dasr_tpu.ops.rf_splat).
"""

from __future__ import annotations

import argparse
import os
import shutil

import numpy as np


def build_argparser():
    p = argparse.ArgumentParser(description="Apply the trained model to create a dataset")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--generator", type=str, default="DeResnet")
    p.add_argument("--num_res_blocks", type=int, default=8)
    p.add_argument("--discriminator", type=str, default="FSD")
    p.add_argument("--kernel_size", type=int, default=5)
    p.add_argument("--wgan", action="store_true")
    p.add_argument("--no_highpass", dest="highpass", action="store_false")
    p.add_argument("--filter", type=str, default="gau")
    p.add_argument("--cat_or_sum", type=str, default="cat")
    p.add_argument("--norm_layer", type=str, default="Instance")
    p.add_argument("--artifacts", type=str, default="tdsr")
    p.add_argument("--name", type=str, default="0603_DSN_LRs")
    p.add_argument("--dataset", type=str, default="aim2019")
    p.add_argument("--including_source_ddm", action="store_true")
    p.add_argument("--no_ddm", action="store_true",
                   help="legacy FSSR mode: generate LRs only, no DDMs "
                        "(reference: codes/DSN/create_dataset.py)")
    p.add_argument("--transfer_uint8", action="store_true",
                   help="upload HR images as uint8 (4x less transfer; cast "
                        "to f32/255 on device, exact)")
    p.add_argument("--mesh", type=int, default=0,
                   help="fan the generator's tile batch over N devices "
                        "(ops/tiled.tiled_apply over the mesh 'data' axis); "
                        "also lowers the tiling threshold so every "
                        "multi-tile image parallelizes")
    p.add_argument("--pad_bucket", type=int, default=0,
                   help="round image sizes up to multiples of N (reflect "
                        "pad) so distinct shapes share one compilation — "
                        "large speedup on varied-size sets at the cost of "
                        "tiny border deviations; 0 = exact per-shape")
    p.add_argument("--upscale_factor", type=int, default=4, choices=[4, 1, 2])
    p.add_argument("--paths_yml", type=str, default=None,
                   help="dataset registry (defaults to the repo's paths.yml)")
    p.add_argument("--results_root", type=str, default="../../DSN_results")
    p.add_argument("--source_dir", type=str, default=None,
                   help="override source dir (else from paths.yml)")
    p.add_argument("--target_dir", type=str, default=None)
    return p


# dataset-name -> (registry dataset, artifact) used by the reference CLI
_DATASET_KEYS = {
    "aim2019": ("aim2019", "tdsr"),
    "ntire2020": ("ntire2020", "tdsr"),
    "realsr_tddiv2k": ("realsr", "tddiv2k"),
    "realsr_tdrealsr": ("realsr", "tdrealsr"),
    "realsr_tdrealsr_2x": ("realsr", "tdrealsr_x2"),
    "camerasr": ("camerasr", "tdsr"),
}


def main(argv=None):
    opt = build_argparser().parse_args(argv)

    from dasr_tpu.utils.runtime import setup_runtime

    setup_runtime()

    import jax
    import jax.numpy as jnp

    from dasr_tpu.core.config import dataset_paths
    from dasr_tpu.data.io import list_images, read_img, read_img_u8, save_img
    from dasr_tpu.nn.discriminators import FSDiscriminator
    from dasr_tpu.nn.generators import DSGANGenerator, DeResnet
    from dasr_tpu.ops.rf_splat import CONVNETS, ddm_shape_for, ddm_splat
    from dasr_tpu.ops.tiled import tiled_apply
    from dasr_tpu.train.checkpoints import (
        import_deresnet_params,
        import_dsgan_generator_params,
        import_fsd_discriminator_params,
        load_dsn_tar,
        restore_checkpoint,
    )

    if opt.source_dir and opt.target_dir:
        source_dir, target_dir = opt.source_dir, opt.target_dir
    else:
        key = _DATASET_KEYS.get(opt.dataset)
        if key is None:
            raise SystemExit(f"unknown --dataset {opt.dataset}")
        paths_yml = opt.paths_yml or os.path.join(
            os.path.dirname(__file__), "..", "..", "paths.yml"
        )
        reg = dataset_paths(paths_yml, *key)
        source_dir, target_dir = reg["source"], reg["target"]

    source_files = list_images(source_dir)
    target_files = list_images(target_dir)

    out_dir = os.path.join(opt.results_root, opt.name)
    img_dir = os.path.join(out_dir, "imgs_from_target")
    ddm_t_dir = os.path.join(out_dir, "ddm_target")
    ddm_s_dir = os.path.join(out_dir, "ddm_source")
    for d in (img_dir, ddm_t_dir, ddm_s_dir):
        os.makedirs(d, exist_ok=True)

    # --- build nets ---
    if opt.generator == "DSGAN":
        g_model = DSGANGenerator(n_res_blocks=opt.num_res_blocks)
    elif opt.generator == "DeResnet":
        g_model = DeResnet(n_res_blocks=opt.num_res_blocks, scale=opt.upscale_factor)
    else:
        raise SystemExit(f"Generator model [{opt.generator}] not recognized")
    d_model = FSDiscriminator(
        d_arch=opt.discriminator,
        filter_type=opt.filter if opt.highpass else None,
        kernel_size=opt.kernel_size,
        cs=opt.cat_or_sum,
        norm_layer=opt.norm_layer,
        wgan=opt.wgan,
        use_running_average=True,
    )
    convnet = CONVNETS[opt.discriminator]

    # --- load checkpoint (orbax dir or reference .tar) ---
    if opt.checkpoint is None:
        raise SystemExit("Use --checkpoint to define the model parameters used")
    if os.path.isdir(opt.checkpoint):
        restored, step = restore_checkpoint(opt.checkpoint)
        params_g = restored["g"]["params"]
        vars_d = restored["d_target"]["params"]
        print(f"Using orbax checkpoint at step {step}")
    else:
        ckpt = load_dsn_tar(opt.checkpoint)
        sd_g = ckpt.get("model_g_state_dict", ckpt)
        sd_d = ckpt.get("models_d_state_dict", ckpt)
        if opt.generator == "DSGAN":
            params_g = import_dsgan_generator_params(sd_g, opt.num_res_blocks)
        else:
            params_g = import_deresnet_params(
                sd_g, opt.num_res_blocks, opt.upscale_factor
            )
        vars_d = import_fsd_discriminator_params(sd_d, norm_layer=opt.norm_layer)
        if "epoch" in ckpt:
            print(f"Using model at epoch {ckpt['epoch']}")
        shutil.copyfile(opt.checkpoint, os.path.join(out_dir, opt.name + ".tar"))

    mesh = None
    if opt.mesh:
        from dasr_tpu.core import mesh as meshlib

        mesh = meshlib.make_mesh(n_data=opt.mesh)
        params_g = meshlib.replicate(mesh, params_g)
        vars_d = meshlib.replicate(mesh, vars_d)

    g_apply = jax.jit(g_model.apply)
    d_apply = jax.jit(d_model.apply)
    scale = opt.upscale_factor

    import math

    def to_device(img):
        # uint8 images upload 4x smaller and are cast on device (exact)
        x = jnp.asarray(img)[None]
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) / 255.0
        return x

    def run_g_dev(img):
        """G forward; returns the fake LR as a DEVICE array (no fence)."""
        h0, w0 = img.shape[0], img.shape[1]
        x = to_device(img)
        if opt.pad_bucket:
            bh = math.ceil(h0 / opt.pad_bucket) * opt.pad_bucket
            bw = math.ceil(w0 / opt.pad_bucket) * opt.pad_bucket
            x = jnp.pad(
                x, ((0, 0), (0, bh - h0), (0, bw - w0), (0, 0)), mode="reflect"
            )
        tile = 256 if mesh is not None else 512
        threshold = tile * tile if mesh is not None else 1024 * 1024
        if x.shape[1] * x.shape[2] > threshold:  # tile large HRs
            out = tiled_apply(
                x, lambda t: g_apply(params_g, t),
                scale=1.0 / scale, tile=tile, halo=16 * scale, mesh=mesh,
            )
        else:
            out = g_apply(params_g, x)
        return out[0, : math.ceil(h0 / scale), : math.ceil(w0 / scale), :]

    def ddm_dev(img_lr_dev):
        """D + receptive-field splat, all on device from the device fake
        (the old path read the fake back and re-uploaded it)."""
        scores = d_apply(vars_d, img_lr_dev[None])[0, :, :, 0]
        h, w = ddm_shape_for(opt.filter if opt.highpass else "gau",
                             img_lr_dev.shape[0], img_lr_dev.shape[1])
        return ddm_splat(scores, h, w, convnet)

    # software pipeline: dispatch image i, then drain image i-1 — the
    # readback fences overlap the next image's device work (each fence
    # costs a tunnel round-trip; see BENCH_NOTES.md)
    def drain(entry):
        base, fake_dev, ddm_arr = entry
        save_img(np.asarray(fake_dev), os.path.join(img_dir, base))
        if ddm_arr is not None:
            np.save(
                os.path.join(ddm_t_dir, base.split(".")[0]),
                np.asarray(ddm_arr)[None, None],  # (1,1,h,w) like the reference
            )

    reader = read_img_u8 if opt.transfer_uint8 else read_img
    inflight = None
    for i, path in enumerate(target_files):
        hr = reader(path)
        fake_dev = run_g_dev(hr)
        ddm_arr = None if opt.no_ddm else ddm_dev(fake_dev)
        prev, inflight = inflight, (os.path.basename(path), fake_dev, ddm_arr)
        if prev is not None:
            drain(prev)
        if (i + 1) % 50 == 0 or i == len(target_files) - 1:
            print(f"[target {i + 1}/{len(target_files)}]")
    if inflight is not None:
        drain(inflight)

    if opt.including_source_ddm:
        prev_s = None
        for i, path in enumerate(source_files):
            lr = reader(path)
            ddm_arr = ddm_dev(to_device(lr)[0])
            out_path = os.path.join(
                ddm_s_dir, os.path.basename(path).split(".")[0]
            )
            if prev_s is not None:
                np.save(prev_s[0], np.asarray(prev_s[1])[None, None])
            prev_s = (out_path, ddm_arr)
            if (i + 1) % 50 == 0 or i == len(source_files) - 1:
                print(f"[source {i + 1}/{len(source_files)}]")
        if prev_s is not None:
            np.save(prev_s[0], np.asarray(prev_s[1])[None, None])


if __name__ == "__main__":
    main()
