"""LPIPS 2AFC training-step parity vs a torch functional oracle.

Completes oracle coverage of the last trainer-like path: a from-scratch
torch replica of DistModel's training mode (reference:
codes/PerceptualSimilarity/models/dist_model.py:88-130 +
networks_basic.py:114-141) — PNetLin distances d0/d1 with a frozen
backbone, Dist2LogitLayer (3x 1x1 convs, LeakyReLU 0.2, sigmoid), BCE
ranking loss on ``per = (judge*2-1+1)/2``, Adam(0.5, 0.999) over the
linear heads + ranking net, then ``clamp_weights`` pinning the heads
nonnegative. 3 steps from one shared init must agree on the loss
trajectory and the updated heads/rank params.
"""

import jax
import numpy as np
import torch
import torch.nn.functional as F

from test_dasr_step_oracle import _lpips_alex_t, _lpips_params_t

from dasr_tpu.losses.lpips import LPIPS
from dasr_tpu.losses.lpips_train import TwoAFCTrainer

B = 4
PATCH = 64


def _rank_to_torch(rank_params):
    flat = {}
    for name, node in rank_params.items():
        k = np.asarray(node["kernel"])  # (1,1,cin,cout) -> (cout,cin,1,1)
        flat[name + "/kernel"] = torch.from_numpy(
            np.ascontiguousarray(np.transpose(k, (3, 2, 0, 1)))
        )
        flat[name + "/bias"] = torch.from_numpy(np.asarray(node["bias"]).copy())
    return flat


def _rank_t(rp, d0, d1, eps=0.1):
    x = torch.cat([d0, d1, d0 - d1, d0 / (d1 + eps), d1 / (d0 + eps)], 1)
    x = F.leaky_relu(F.conv2d(x, rp["Conv_0/kernel"], rp["Conv_0/bias"]), 0.2)
    x = F.leaky_relu(F.conv2d(x, rp["Conv_1/kernel"], rp["Conv_1/bias"]), 0.2)
    return torch.sigmoid(F.conv2d(x, rp["Conv_2/kernel"], rp["Conv_2/bias"]))


def _batch(rng):
    return {
        "ref": (rng.random((B, PATCH, PATCH, 3)) * 2 - 1).astype(np.float32),
        "p0": (rng.random((B, PATCH, PATCH, 3)) * 2 - 1).astype(np.float32),
        "p1": (rng.random((B, PATCH, PATCH, 3)) * 2 - 1).astype(np.float32),
        "judge": rng.random((B, 1, 1, 1)).astype(np.float32),
    }


def test_twoafc_three_step_trajectory_matches_torch(rng):
    lpips = LPIPS(net="alex")
    z = np.zeros((1, PATCH, PATCH, 3), np.float32)
    lvars = lpips.init(jax.random.key(0), z, z)
    tr = TwoAFCTrainer(lr=1e-4, beta1=0.5)
    trainable, backbone, opt_state = tr.init(jax.random.key(1), lvars)

    convs, _ = _lpips_params_t(lvars)
    lins_t = [
        torch.from_numpy(np.asarray(trainable["lins"][f"lin{k}"]).copy())
        .requires_grad_()
        for k in range(5)
    ]
    rank_t = {k: v.clone().requires_grad_()
              for k, v in _rank_to_torch(trainable["rank"]).items()}
    opt = torch.optim.Adam(lins_t + list(rank_t.values()), lr=1e-4,
                           betas=(0.5, 0.999), eps=1e-8)

    def lpips_t(x0, x1):
        # _lpips_alex_t expects [0,1] (it applies 2v-1 itself); our trainer
        # feeds [-1,1] without normalize, so compensate. Returns per-image
        # (B,1,1,1) distances, matching LPIPS.__call__.
        return _lpips_alex_t(
            (convs, [w.reshape(-1) for w in lins_t]),
            (x0 + 1) / 2, (x1 + 1) / 2,
        )

    for i, b in enumerate([_batch(rng) for _ in range(3)]):
        trainable, opt_state, metrics = tr.step(
            trainable, opt_state, backbone, b
        )

        def t(name):
            return torch.from_numpy(
                np.ascontiguousarray(b[name].transpose(0, 3, 1, 2))
            )

        d0 = lpips_t(t("ref"), t("p0"))
        d1 = lpips_t(t("ref"), t("p1"))
        logit = torch.clamp(_rank_t(rank_t, d0, d1), 1e-7, 1 - 1e-7)
        per = torch.from_numpy(b["judge"].reshape(B, 1, 1, 1))
        loss = (-(per * logit.log() + (1 - per) * (1 - logit).log())).mean()
        opt.zero_grad()
        loss.backward()
        opt.step()
        with torch.no_grad():  # clamp_weights (dist_model.py:125-130)
            for w in lins_t:
                w.clamp_(min=0)
        np.testing.assert_allclose(
            float(metrics["loss"]), float(loss), rtol=2e-3, atol=2e-5,
            err_msg=f"step {i}",
        )

    for k in range(5):
        np.testing.assert_allclose(
            np.asarray(trainable["lins"][f"lin{k}"]),
            lins_t[k].detach().numpy(),
            atol=2e-5, err_msg=f"lin{k}",
        )
    ours_rank = _rank_to_torch(trainable["rank"])
    for k in rank_t:
        np.testing.assert_allclose(
            ours_rank[k].numpy(), rank_t[k].detach().numpy(),
            atol=2e-5, err_msg=f"rank {k}",
        )
