"""Checkpointing: orbax natively + torch-format importers for parity.

Native format: orbax checkpoints of the full train-state pytree (params,
opt states, step) — the TPU replacement for the reference's two formats:
  * DSN single ``.tar`` torch-pickle with model/optimizer/scheduler state
    (reference: codes/DSN/train.py:357-376, consumed by
    create_dataset_modified.py:131-136)
  * SRN per-network ``{iter}_{label}.pth`` CPU state dicts + ``{iter}.state``
    (reference: codes/SRN/models/base_model.py:50-74)

Importers read the *published* reference checkpoints (torch pickles) into
flax param pytrees so quality parity can be evaluated without retraining.
torch (CPU) is used purely as a pickle reader.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# orbax native save/restore
# ---------------------------------------------------------------------------


def save_checkpoint(path: str, state, step: int, keep: int = 5) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    with ocp.CheckpointManager(
        path, options=ocp.CheckpointManagerOptions(max_to_keep=keep)
    ) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()
    return os.path.join(path, str(step))


def restore_checkpoint(path: str, template=None, step: Optional[int] = None):
    """Restore a checkpoint; with ``template=None`` returns the raw pytree
    (nested dicts) — used by inference CLIs that only need params."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.CheckpointManager(path) as mgr:
        step = mgr.latest_step() if step is None else step
        if template is None:
            return mgr.restore(step), step
        return mgr.restore(step, args=ocp.args.StandardRestore(template)), step


# ---------------------------------------------------------------------------
# torch state-dict -> flax params
# ---------------------------------------------------------------------------


def _t2j_conv(w: np.ndarray) -> np.ndarray:
    """torch OIHW conv kernel -> flax HWIO."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.numpy() for k, v in obj.items() if hasattr(v, "numpy")}


def import_rrdbnet_params(path_or_sd, nb: int = 23) -> Dict[str, Any]:
    """Published ESRGAN/DASR ``*_G.pth`` -> flax RRDBNet params.

    The reference's sequential wrapping yields keys
    ``model.0.*`` (fea conv), ``model.1.sub.{i}.RDB{j}.conv{k}.0.*``,
    ``model.1.sub.{nb}.*`` (trunk conv), ``model.3/6.*`` (upconv convs),
    ``model.8.*`` (HR conv0), ``model.10.*`` (HR conv1)
    (layout from architecture.py:174-205 + block.py sequential/ShortcutBlock).
    """
    sd = (
        load_torch_state_dict(path_or_sd)
        if isinstance(path_or_sd, str)
        else path_or_sd
    )

    def conv(prefix):
        return {
            "kernel": jnp.asarray(_t2j_conv(sd[prefix + ".weight"])),
            "bias": jnp.asarray(sd[prefix + ".bias"]),
        }

    params: Dict[str, Any] = {}
    params["conv_block_0"] = {"Conv_0": conv("model.0")}
    for i in range(nb):
        rrdb: Dict[str, Any] = {}
        for j in range(3):
            rdb: Dict[str, Any] = {}
            for k in range(5):
                c = conv(f"model.1.sub.{i}.RDB{j+1}.conv{k+1}.0")
                rdb[f"conv{k}_kernel"] = c["kernel"]
                rdb[f"conv{k}_bias"] = c["bias"]
            rrdb[f"RDB5C_{j}"] = rdb
        params[f"RRDB_{i}"] = rrdb
    params["conv_block_1"] = {"Conv_0": conv(f"model.1.sub.{nb}")}
    params["upconv_0"] = {"conv_block_0": {"Conv_0": conv("model.3")}}
    params["upconv_1"] = {"conv_block_0": {"Conv_0": conv("model.6")}}
    params["conv_block_2"] = {"Conv_0": conv("model.8")}
    params["conv_block_3"] = {"Conv_0": conv("model.10")}
    return {"params": params}


def import_deresnet_params(sd: Dict[str, np.ndarray], n_res_blocks: int = 8,
                           scale: int = 4) -> Dict[str, Any]:
    """DSN ``model_g_state_dict`` (De_resnet) -> flax DeResnet params.

    torch names from DSN/model.py:25-55: block_input.0 (conv), block_input.1
    (PReLU), res_blocks.{i}.conv1/conv2 + .prelu, down_sample.{0,2} convs +
    {1,3} PReLUs, block_output.
    """

    def conv(prefix):
        return {
            "kernel": jnp.asarray(_t2j_conv(sd[prefix + ".weight"])),
            "bias": jnp.asarray(sd[prefix + ".bias"]),
        }

    def prelu(key):
        return {"slope": jnp.asarray(sd[key].reshape(()))}

    params: Dict[str, Any] = {
        "Conv_0": conv("block_input.0"),
        "PReLU_0": prelu("block_input.1.weight"),
    }
    for i in range(n_res_blocks):
        params[f"ResidualBlock_{i}"] = {
            "Conv_0": conv(f"res_blocks.{i}.conv1"),
            "PReLU_0": prelu(f"res_blocks.{i}.prelu.weight"),
            "Conv_1": conv(f"res_blocks.{i}.conv2"),
        }
    n_down = {1: 0, 2: 1, 4: 2}[scale]
    for d in range(n_down):
        params[f"Conv_{d + 1}"] = conv(f"down_sample.{2 * d}")
        params[f"PReLU_{d + 1}"] = prelu(f"down_sample.{2 * d + 1}.weight")
    params[f"Conv_{n_down + 1}"] = conv("block_output")
    return {"params": params}


def import_dsgan_generator_params(sd, n_res_blocks: int = 8):
    """DSN DSGAN Generator (model.py:7-22) -> flax DSGANGenerator params."""
    return import_deresnet_params(sd, n_res_blocks=n_res_blocks, scale=1)


def import_fsd_discriminator_params(
    sd: Dict[str, np.ndarray], norm_layer: str = "Instance"
) -> Dict[str, Any]:
    """DSN ``models_d_state_dict`` (FSD body) -> flax FSDiscriminator params.

    torch names net.net.{0,2,5,8}.weight for Instance norm (no norm params)
    or net.net.{0,2,5,8} with BatchNorm at 3,6 (model.py:173-210). The
    filter front-end has no learned params.
    """
    conv_keys = sorted(
        {
            int(m.group(1))
            for k in sd
            if (m := re.match(r"net\.net\.(\d+)\.weight$", k)) and sd[k].ndim == 4
        }
    )
    body: Dict[str, Any] = {}
    for j, i in enumerate(conv_keys):
        body[f"Conv_{j}"] = {
            "kernel": jnp.asarray(_t2j_conv(sd[f"net.net.{i}.weight"])),
            "bias": jnp.asarray(sd[f"net.net.{i}.bias"]),
        }
    out = {"params": {"DiscriminatorBasic_0": body}}
    if norm_layer.lower() == "batch":
        bn_keys = sorted(
            {
                int(m.group(1))
                for k in sd
                if (m := re.match(r"net\.net\.(\d+)\.running_mean$", k))
            }
        )
        stats: Dict[str, Any] = {}
        for j, i in enumerate(bn_keys):
            body[f"BatchNorm_{j}"] = {
                "scale": jnp.asarray(sd[f"net.net.{i}.weight"]),
                "bias": jnp.asarray(sd[f"net.net.{i}.bias"]),
            }
            stats[f"BatchNorm_{j}"] = {
                "mean": jnp.asarray(sd[f"net.net.{i}.running_mean"]),
                "var": jnp.asarray(sd[f"net.net.{i}.running_var"]),
            }
        out["batch_stats"] = {"DiscriminatorBasic_0": stats}
    return out


def load_dsn_tar(path: str) -> Dict[str, Any]:
    """Read a DSN ``.tar`` checkpoint's raw dict (torch pickle)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    out = dict(ckpt)
    for key in ("model_g_state_dict", "models_d_state_dict"):
        if key in out:
            out[key] = {k: v.numpy() for k, v in out[key].items()}
    return out
