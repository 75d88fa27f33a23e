"""LPIPS 2AFC training / BAPPS evaluation CLI.

Reference drivers: codes/PerceptualSimilarity/train.py (trains the
linear-calibration heads + ranking net on 2AFC human judgements, 5 epochs
at base LR + 5 linearly decayed) and test_dataset_model.py (scores a
distance model on 2AFC / JND dataset directories).

  python -m dasr_tpu.cli.lpips_train train --datasets <2afc dirs> ...
  python -m dasr_tpu.cli.lpips_train eval  --datasets <dirs> --dataset_mode 2afc
"""

from __future__ import annotations

import argparse
import json
import os


def _dist_fn_from_args(args):
    import numpy as np

    from dasr_tpu.losses.lpips import create_dist_model

    fn = create_dist_model(
        model=args.model, net=args.net, version=args.version,
        backbone_path=args.backbone,
    )

    def compute(a, b):  # NHWC [-1,1] batches -> (N,) distances
        return np.asarray(fn(a, b)).reshape(-1)

    return compute


def _cmd_eval(args):
    from dasr_tpu.data.bapps import (
        JNDDataset, TwoAFCDataset, score_2afc, score_jnd,
    )

    dist = _dist_fn_from_args(args)
    results = {}
    for root in args.datasets:
        if args.dataset_mode == "2afc":
            score, _ = score_2afc(
                dist, TwoAFCDataset(root, args.load_size), args.batch_size
            )
        else:
            score, _ = score_jnd(
                dist, JNDDataset(root, args.load_size), args.batch_size
            )
        results[root] = score
        print(f"  Dataset [{root}]: {100.0 * score:.2f}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    return results


def _export_lin_heads(path, trainable, net):
    """Write the trained heads in the reference's bundled-weights format
    (keys ``lin{k}.model.1.weight``, shape (1, C, 1, 1))."""
    import torch

    sd = {}
    for name, w in trainable["lins"].items():
        k = int(name[len("lin"):])
        t = torch.from_numpy(__import__("numpy").asarray(w, dtype="float32"))
        sd[f"lin{k}.model.1.weight"] = t.reshape(1, -1, 1, 1)
    torch.save(sd, path)


def _cmd_train(args):
    import jax
    import numpy as np

    from dasr_tpu.data.bapps import TwoAFCDataset, score_2afc
    from dasr_tpu.losses.lpips import LPIPS, load_lpips_params
    from dasr_tpu.losses.lpips_train import TwoAFCTrainer

    os.makedirs(args.save_dir, exist_ok=True)
    train_set = TwoAFCDataset(args.datasets, args.load_size)
    steps_per_epoch = max(1, len(train_set) // args.batch_size)
    print(f"Loading {len(train_set)} instances from {args.datasets}")

    # reference LR regime: constant for nepoch, then linear to 0 over
    # nepoch_decay (train.py:23-24 + dist_model.update_learning_rate)
    def schedule(step):
        import jax.numpy as jnp

        ep = step / steps_per_epoch
        frac = (ep - args.nepoch) / max(1, args.nepoch_decay)
        return args.lr * jnp.clip(1.0 - frac, 0.0, 1.0)

    trainer = TwoAFCTrainer(net=args.net, lr=schedule, beta1=0.5)
    lpips_vars = LPIPS(net=args.net).init(
        jax.random.key(0),
        np.zeros((1, args.load_size, args.load_size, 3), np.float32),
        np.zeros((1, args.load_size, args.load_size, 3), np.float32),
    )
    if not args.from_scratch:
        lpips_vars = load_lpips_params(
            net=args.net, lin_path=args.lin_path,
            backbone_path=args.backbone, base_params=lpips_vars,
        )
    trainable, backbone, opt_state = trainer.init(jax.random.key(1), lpips_vars)

    rng = np.random.default_rng(0)
    total_steps = 0
    for epoch in range(1, args.nepoch + args.nepoch_decay + 1):
        order = rng.permutation(len(train_set))
        for lo in range(0, steps_per_epoch * args.batch_size, args.batch_size):
            idx = order[lo : lo + args.batch_size]
            items = [train_set[int(i)] for i in idx]
            batch = {
                k: np.stack([it[k] for it in items])
                for k in ("ref", "p0", "p1")
            }
            batch["judge"] = np.stack(
                [it["judge"] for it in items]
            ).reshape(-1, 1, 1, 1)
            trainable, opt_state, m = trainer.step(
                trainable, opt_state, backbone, batch
            )
            total_steps += 1
            if total_steps % args.print_freq == 0:
                print(
                    f"epoch {epoch} step {total_steps}: "
                    f"loss {float(m['loss']):.4f} acc {float(m['acc']):.3f}"
                )
        _export_lin_heads(
            os.path.join(args.save_dir, "latest_net_.pth"), trainable, args.net
        )
        print(f"End of epoch {epoch} / {args.nepoch + args.nepoch_decay}")

    if args.val_datasets:
        variables = {
            "params": {**trainable["lins"], "backbone": backbone}
        }
        model = LPIPS(net=args.net)

        def dist(a, b):
            return np.asarray(model.apply(variables, a, b)).reshape(-1)

        for root in args.val_datasets:
            score, _ = score_2afc(
                dist, TwoAFCDataset(root, args.load_size), args.batch_size
            )
            print(f"  Dataset [{root}]: {100.0 * score:.2f}")
    return trainable


def main(argv=None):
    p = argparse.ArgumentParser(description="LPIPS 2AFC training / eval")
    sub = p.add_subparsers(dest="cmd", required=True)

    tr = sub.add_parser("train")
    tr.add_argument("--datasets", nargs="+", required=True,
                    help="2AFC dataset roots (ref/ p0/ p1/ judge/)")
    tr.add_argument("--val_datasets", nargs="+", default=None)
    tr.add_argument("--net", default="alex", choices=["alex", "vgg", "squeeze"])
    tr.add_argument("--nepoch", type=int, default=5)
    tr.add_argument("--nepoch_decay", type=int, default=5)
    tr.add_argument("--batch_size", type=int, default=50)
    tr.add_argument("--lr", type=float, default=1e-4)
    tr.add_argument("--load_size", type=int, default=64)
    tr.add_argument("--print_freq", type=int, default=100)
    tr.add_argument("--save_dir", default="checkpoints/tmp")
    tr.add_argument("--lin_path", default=None)
    tr.add_argument("--backbone", default=None)
    tr.add_argument("--from_scratch", action="store_true")
    tr.set_defaults(fn=_cmd_train)

    ev = sub.add_parser("eval")
    ev.add_argument("--datasets", nargs="+", required=True)
    ev.add_argument("--dataset_mode", default="2afc", choices=["2afc", "jnd"])
    ev.add_argument("--model", default="net-lin",
                    choices=["net-lin", "net", "l2", "L2", "ssim", "DSSIM"])
    ev.add_argument("--net", default="alex", choices=["alex", "vgg", "squeeze"])
    ev.add_argument("--version", default="0.1", choices=["0.0", "0.1"])
    ev.add_argument("--backbone", default=None)
    ev.add_argument("--batch_size", type=int, default=50)
    ev.add_argument("--load_size", type=int, default=64)
    ev.add_argument("--out", default=None, help="JSON results path")
    ev.set_defaults(fn=_cmd_eval)

    args = p.parse_args(argv)

    from dasr_tpu.utils.runtime import setup_runtime

    setup_runtime()
    return args.fn(args)


if __name__ == "__main__":
    main()
