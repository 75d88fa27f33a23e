"""Checkpoint-sweep tester (reference: codes/SRN/auto_test.py:10-33).

Takes a test options JSON and a directory of saved generator checkpoints,
rewrites ``pretrain_model_G`` for each, and runs srn_test — batch-testing
many training snapshots in one command.
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-opt", required=True, help="test options JSON template")
    p.add_argument("--models_dir", required=True,
                   help="directory with {iter}_G.pth files or orbax step dirs")
    p.add_argument("--iters", type=str, default=None,
                   help="comma-separated iteration list (default: all found)")
    args = p.parse_args(argv)

    from dasr_tpu.cli import srn_test

    with open(args.opt) as f:
        template = json.load(f)

    if args.iters:
        candidates = [it.strip() for it in args.iters.split(",")]
    else:
        candidates = sorted(
            {
                e.split("_")[0]
                for e in os.listdir(args.models_dir)
                if e.endswith("_G.pth") or e.isdigit()
            },
            key=lambda s: int(s) if s.isdigit() else 0,
        )
    if not candidates:
        raise SystemExit(f"no checkpoints found under {args.models_dir}")

    base_name = template.get("name", "auto_test")
    for it in candidates:
        pth = os.path.join(args.models_dir, f"{it}_G.pth")
        ckpt = pth if os.path.exists(pth) else args.models_dir
        cfg = json.loads(json.dumps(template))
        cfg["name"] = f"{base_name}_{it}"
        cfg.setdefault("path", {})["pretrain_model_G"] = ckpt
        with tempfile.NamedTemporaryFile(
            "w", suffix=".json", delete=False
        ) as tmp:
            json.dump(cfg, tmp)
            tmp_path = tmp.name
        print(f"===== testing checkpoint {it} =====")
        srn_test.main(["-opt", tmp_path])
        os.unlink(tmp_path)


if __name__ == "__main__":
    main()
