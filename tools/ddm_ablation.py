"""DDM-mechanism ablation (VERDICT r2 #3): two otherwise-identical scaled
DASR runs — ``multiweights`` on vs off — on a corpus whose degradation is
confined to locally-textured regions (make_synth_corpus --noise_mode
textured), so the domain gap is content-localizable by the patch D.

Pipeline (all through the production CLIs):
  1. DSN GAN training (scaled epochs) on the ablation corpus;
  2. pseudo-LR + DDM generation;
  3. DDM localization check: correlation between each fake-LR's DDM and its
     texture mask (does the discriminator actually see the gap?);
  4. srn_train twice (multiweights true/false, same seed/data/budget),
     val logging PSNR+SSIM+LPIPS;
  5. region-split eval on valid: PSNR inside the degraded (textured) region
     vs the clean (flat) region for both runs.

Run (real chip, ~40 min at the default budgets):
  PYTHONPATH=/root/repo JAX_COMPILATION_CACHE_DIR=/root/.jax_cache \\
  python tools/ddm_ablation.py --corpus /tmp/abl --work /tmp/abl_work
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", required=True, help="make_synth_corpus --out dir")
    p.add_argument("--work", required=True)
    p.add_argument("--dsn_epochs", type=int, default=30)
    p.add_argument("--niter", type=int, default=4000)
    p.add_argument("--skip_dsn", action="store_true")
    p.add_argument("--skip_dataset", action="store_true")
    p.add_argument("--skip_train", action="store_true")
    args = p.parse_args(argv)

    os.makedirs(args.work, exist_ok=True)
    src = os.path.join(args.corpus, "source")
    tgt = os.path.join(args.corpus, "target")
    vhr = os.path.join(args.corpus, "valid_hr")
    vlr = os.path.join(args.corpus, "valid_lr")
    exp = os.path.join(args.work, "DSN_experiments")
    res = os.path.join(args.work, "DSN_results")
    img_dir = os.path.join(res, "abl", "imgs_from_target")
    ddm_dir = os.path.join(res, "abl", "ddm_target")

    from dasr_tpu.cli import dsn_create_dataset, dsn_train

    # --- stage 1: DSN (launcher hyperparams, scaled epochs) ---
    if not args.skip_dsn:
        dsn_train.main([
            "--source_dir", src, "--target_dir", tgt,
            "--valid_hr_dir", vhr, "--valid_lr_dir", vlr,
            "--generator", "DeResnet", "--discriminator", "FSD",
            "--filter", "avg_pool", "--w_tex", "0.006",
            "--batch_size", "8", "--num_workers", "8", "--crop_size", "256",
            "--num_epochs", str(args.dsn_epochs),
            "--num_decay_epochs", str(max(1, args.dsn_epochs // 3)),
            "--val_interval", "10", "--save_model_interval", "10",
            "--transfer_uint8", "--device_bicubic",
            "--decode_cache_gb", "8",
            "--experiments_root", exp, "--save_path", "dsn_abl",
        ])

    # --- stage 2: LR + DDM generation ---
    if not args.skip_dataset:
        dsn_create_dataset.main([
            "--source_dir", src, "--target_dir", tgt,
            "--checkpoint", os.path.join(exp, "dsn_abl", "checkpoints"),
            "--generator", "DeResnet", "--discriminator", "FSD",
            "--filter", "avg_pool", "--name", "abl", "--results_root", res,
            "--transfer_uint8",
        ])

    # --- stage 3: does the DDM localize the gap? ---
    import numpy as np

    from dasr_tpu.data.io import list_images, read_img
    from make_synth_corpus import texture_mask

    corrs, means_t, means_f = [], [], []
    for f in sorted(list_images(img_dir))[:40]:
        base = os.path.splitext(os.path.basename(f))[0]
        fake = read_img(f)
        ddm = np.load(os.path.join(ddm_dir, base + ".npy"))[0, 0]
        m = texture_mask(fake)
        mh, mw = min(ddm.shape[0], m.shape[0]), min(ddm.shape[1], m.shape[1])
        d, m = ddm[:mh, :mw].ravel(), m[:mh, :mw].ravel()
        if d.std() > 1e-6 and m.std() > 1e-6:
            corrs.append(float(np.corrcoef(d, m)[0, 1]))
        means_t.append(float(d[m > 0.5].mean()) if (m > 0.5).any() else np.nan)
        means_f.append(float(d[m < 0.1].mean()) if (m < 0.1).any() else np.nan)
    ddm_stats = {
        "corr_ddm_vs_texture_mean": float(np.mean(corrs)) if corrs else None,
        "ddm_mean_textured": float(np.nanmean(means_t)),
        "ddm_mean_flat": float(np.nanmean(means_f)),
    }
    print("[ablation] DDM localization:", json.dumps(ddm_stats))

    # --- stage 4: two DASR runs, multiweights on/off ---
    from dasr_tpu.cli import srn_train

    template = os.path.join(
        os.path.dirname(__file__), "..", "dasr_tpu", "configs",
        "train_DASR_auto_reproduce.json",
    )
    with open(template) as fh:
        base_cfg = json.load(fh)
    runs = {}
    for mw in (True, False):
        name = f"abl_mw_{'on' if mw else 'off'}"
        cfg = json.loads(json.dumps(base_cfg))
        cfg["name"] = name
        cfg["multiweights"] = mw
        cfg["val_lpips"] = True
        cfg["datasets"]["train"].update(
            dataroot_HR=tgt, dataroot_fake_LR=img_dir, dataroot_real_LR=src,
            dataroot_fake_weights=ddm_dir,
        )
        cfg["datasets"]["val"].update(dataroot_HR=vhr, dataroot_LR=vlr)
        cfg["path"]["root"] = os.path.join(args.work, "SRN_experiments")
        cfg["train"]["niter"] = args.niter
        cfg["train"]["val_freq"] = max(1, args.niter // 4)
        cfg["logger"]["save_checkpoint_freq"] = args.niter
        cfg["max_val_images"] = 8
        cfg_path = os.path.join(args.work, f"{name}.json")
        with open(cfg_path, "w") as fh:
            json.dump(cfg, fh, indent=1)
        if not args.skip_train:
            srn_train.main(
                ["-opt", cfg_path, "--steps_per_call", "8",
                 "--transfer_uint8", "--decode_cache_gb", "8"]
            )
        runs[name] = os.path.join(args.work, "SRN_experiments", name)

    # --- stage 5: region-split eval on the val set ---
    from dasr_tpu.core.config import dict_to_nonedict
    from dasr_tpu.eval.evaluate import to_uint8
    from dasr_tpu.models.registry import create_model
    from dasr_tpu.ops.metrics import calculate_psnr

    def masked_psnr(sr_u8, hr_u8, region):
        d = (sr_u8.astype(np.float64) - hr_u8.astype(np.float64)) ** 2
        sel = d[region]
        if sel.size == 0:
            return float("nan")
        mse = sel.mean()
        return float(10 * np.log10(255.0**2 / mse)) if mse > 0 else float("inf")

    results = {"ddm_stats": ddm_stats, "runs": {}}
    hr_files = sorted(list_images(vhr))
    lr_files = sorted(list_images(vlr))
    for name, root in runs.items():
        # rebuild the run's own config so the orbax restore template
        # matches the saved train-state structure exactly
        with open(os.path.join(args.work, f"{name}.json")) as fh:
            eval_cfg = json.load(fh)
        eval_cfg["chop"] = False
        eval_cfg.setdefault("path", {})["pretrain_model_G"] = os.path.join(
            root, "training_state"
        )
        eval_cfg["path"]["root"] = root
        model = create_model(dict_to_nonedict(eval_cfg))
        model.init()
        model.load()
        rows = []
        for hf, lf in zip(hr_files, lr_files):
            hr, lr = read_img(hf), read_img(lf)
            m = texture_mask(lr)
            sr = np.asarray(model.test(lr))
            h = min(sr.shape[0], hr.shape[0]); w = min(sr.shape[1], hr.shape[1])
            sr8, hr8 = to_uint8(sr[:h, :w]), to_uint8(hr[:h, :w])
            up = np.kron(m, np.ones((4, 4), np.float32))[:h, :w, None]
            up = np.broadcast_to(up, sr8.shape)
            rows.append({
                "psnr_full": calculate_psnr(sr8.astype(float), hr8.astype(float)),
                "psnr_degraded": masked_psnr(sr8, hr8, up > 0.5),
                "psnr_clean": masked_psnr(sr8, hr8, up < 0.1),
            })
        agg = {k: float(np.nanmean([r[k] for r in rows])) for k in rows[0]}
        results["runs"][name] = agg
        print(f"[ablation] {name}: {json.dumps(agg)}")

    out = os.path.join(args.work, "ablation_results.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"[ablation] wrote {out}")


if __name__ == "__main__":
    main()
