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


def import_deresnet_srn_params(
    sd: Dict[str, np.ndarray],
    nb: int,
    scale: int = 4,
    act_type: Optional[str] = None,
    mode: str = "NAC",
    variant: str = "strided",
) -> Dict[str, Any]:
    """SRN ``arch.De_Resnet`` family ``*_G.pth`` -> flax DeResnetSRN params.

    The reference wraps everything in flattened ``B.sequential``s
    (architecture.py:51-171 + block.py:115-128), so torch key indices depend
    on which activations exist. With norm_type=None (all shipped configs):

      * ``model.0`` fea conv; ``model.1.sub.{i}.res.*`` ResNet blocks whose
        conv positions depend on (mode, act); ``model.1.sub.{nb}`` LR conv;
      * strided/x2: downsample convs then the two After_D convs at the
        following top indices (activations interleaved when present);
      * bilinear: After_D convs live under ``Afterconv.{0,1}`` instead.

    PReLU activations contribute ``.weight`` params and are imported; other
    activations are parameter-free.
    """
    has_act = act_type is not None
    prelu = has_act and act_type.lower() == "prelu"

    def conv(prefix):
        return {
            "kernel": jnp.asarray(_t2j_conv(sd[prefix + ".weight"])),
            "bias": jnp.asarray(sd[prefix + ".bias"]),
        }

    def prelu_p(key):
        return {"slope": jnp.asarray(sd[key].reshape(()))}

    params: Dict[str, Any] = {"conv_block_0": {"Conv_0": conv("model.0")}}

    # ResNetBlock internals: NAC => [act?, conv, act?, conv];
    # CNA => [conv, act?, conv] (second conv_block act is None in CNA)
    if mode == "NAC":
        c0, a0, c1, a1 = (1, 0, 3, 2) if has_act else (0, None, 1, None)
        second_has_act = has_act
    else:  # CNA / CNAC
        c0, a0, c1, a1 = (0, 1, 2, None) if has_act else (0, None, 1, None)
        second_has_act = False
    for i in range(nb):
        base = f"model.1.sub.{i}.res"
        blk: Dict[str, Any] = {
            "conv_block_0": {"Conv_0": conv(f"{base}.{c0}")},
            "conv_block_1": {"Conv_0": conv(f"{base}.{c1}")},
        }
        if prelu:
            if mode == "NAC":
                blk["conv_block_0"]["PReLU_0"] = prelu_p(f"{base}.{a0}.weight")
                blk["conv_block_1"]["PReLU_0"] = prelu_p(f"{base}.{a1}.weight")
            else:
                blk["conv_block_0"]["PReLU_0"] = prelu_p(f"{base}.{a0}.weight")
        params[f"ResNetBlock_{i}"] = blk
    params["conv_block_1"] = {"Conv_0": conv(f"model.1.sub.{nb}")}

    n_down = {"strided": {1: 0, 2: 1, 4: 2}[scale], "x2": 1, "bilinear": 0}[variant]
    step = 2 if has_act else 1  # downsample blocks are CNA: [conv, act?]
    idx = 2
    nblock = 2
    for d in range(n_down):
        blk = {"Conv_0": conv(f"model.{idx}")}
        if prelu:
            blk["PReLU_0"] = prelu_p(f"model.{idx + 1}.weight")
        params[f"conv_block_{nblock}"] = blk
        nblock += 1
        idx += step
    if variant == "bilinear":
        after = ["Afterconv.0", "Afterconv.1"]
    else:
        after = [f"model.{idx}", f"model.{idx + 1}"]
    for name in after:
        params[f"conv_block_{nblock}"] = {"Conv_0": conv(name)}
        nblock += 1
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


# ---------------------------------------------------------------------------
# two-way interop: key maps -> importers, exporters, optimizer-state mapping
# ---------------------------------------------------------------------------
#
# A "key map" is an ordered list of (torch_prefix, flax_path, kind) entries —
# ordered exactly like the reference module's parameter registration order,
# which is also the order torch's Adam indexes its per-parameter state
# (reference: codes/SRN/models/base_model.py:65-74 saves optimizer
# state_dicts whose 'state' keys are those indices). One table per network
# therefore yields the .pth importer, the .pth exporter AND the .state
# (optimizer) importer/exporter.


def _j2t_conv(w: np.ndarray) -> np.ndarray:
    """flax HWIO conv kernel -> torch OIHW."""
    return np.ascontiguousarray(np.transpose(w, (3, 2, 0, 1)))


def rrdbnet_key_map(nb: int = 23):
    """Ordered (torch_prefix, flax_path, kind) for RRDBNet (see
    import_rrdbnet_params docstring for the torch layout)."""
    out = [("model.0", ("conv_block_0", "Conv_0"), "conv")]
    for i in range(nb):
        for j in range(3):
            for k in range(5):
                out.append((
                    f"model.1.sub.{i}.RDB{j + 1}.conv{k + 1}.0",
                    (f"RRDB_{i}", f"RDB5C_{j}", f"conv{k}"),
                    "rdbconv",
                ))
    out += [
        (f"model.1.sub.{nb}", ("conv_block_1", "Conv_0"), "conv"),
        ("model.3", ("upconv_0", "conv_block_0", "Conv_0"), "conv"),
        ("model.6", ("upconv_1", "conv_block_0", "Conv_0"), "conv"),
        ("model.8", ("conv_block_2", "Conv_0"), "conv"),
        ("model.10", ("conv_block_3", "Conv_0"), "conv"),
    ]
    return out


def nlayer_d_key_map(n_layers: int = 3):
    """SRN NLayerDiscriminator (architecture.py:983-1024): sequential
    ``model.{idx}`` convs at 0, 2+3n (n=1..n_layers-1), 2+3(n_layers-1)+3
    stride-1, then the 1-channel head; InstanceNorm carries no params."""
    idxs = [0]
    for n in range(1, n_layers):
        idxs.append(2 + 3 * (n - 1))
    idxs.append(2 + 3 * (n_layers - 1))
    idxs.append(idxs[-1] + 3)
    return [
        (f"model.{t}", (f"Conv_{j}",), "conv") for j, t in enumerate(idxs)
    ]


def vgg128_d_key_map():
    """Discriminator_VGG_128 (architecture.py:442-495): conv{i}_{j} + bn
    after every conv except conv0_0, then linear1/linear2."""
    out = []
    ci = 0
    bi = 0
    for i in range(5):
        for j in range(2):
            out.append((f"conv{i}_{j}", (f"Conv_{ci}",), "conv"))
            if not (i == 0 and j == 0):
                out.append((f"bn{i}_{j}", (f"BatchNorm_{bi}",), "bn"))
                bi += 1
            ci += 1
    out += [
        # torch flattens NCHW (512,4,4); flax flattens NHWC (4,4,512) — the
        # first linear's input dim must be permuted accordingly
        ("linear1", ("Dense_0",), ("linear_chw", (512, 4, 4))),
        ("linear2", ("Dense_1",), "linear"),
    ]
    return out


def _set_path(tree: Dict, path, leaf_name: str, value):
    node = tree
    for p in path:
        node = node.setdefault(p, {})
    node[leaf_name] = value


def _get_path(tree: Dict, path):
    node = tree
    for p in path:
        node = node[p]
    return node


def import_params_from_key_map(sd: Dict[str, np.ndarray], key_map):
    """torch state dict -> flax variables via a key map. Returns
    {'params': ..., ['batch_stats': ...]}."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for tkey, fpath, kind in key_map:
        if kind in ("conv", "rdbconv"):
            k = jnp.asarray(_t2j_conv(sd[tkey + ".weight"]))
            has_bias = tkey + ".bias" in sd
            b = jnp.asarray(sd[tkey + ".bias"]) if has_bias else None
            if kind == "rdbconv":  # RDB5C declares raw convK_kernel params
                _set_path(params, fpath[:-1], fpath[-1] + "_kernel", k)
                _set_path(params, fpath[:-1], fpath[-1] + "_bias", b)
            else:
                _set_path(params, fpath, "kernel", k)
                if has_bias:
                    _set_path(params, fpath, "bias", b)
        elif kind == "linear":
            _set_path(params, fpath, "kernel",
                      jnp.asarray(np.transpose(sd[tkey + ".weight"])))
            _set_path(params, fpath, "bias", jnp.asarray(sd[tkey + ".bias"]))
        elif isinstance(kind, tuple) and kind[0] == "linear_chw":
            c, h, w = kind[1]
            wt = np.asarray(sd[tkey + ".weight"])  # (out, C*H*W)
            wt = wt.reshape(-1, c, h, w).transpose(0, 2, 3, 1).reshape(wt.shape[0], -1)
            _set_path(params, fpath, "kernel", jnp.asarray(np.transpose(wt)))
            _set_path(params, fpath, "bias", jnp.asarray(sd[tkey + ".bias"]))
        elif kind == "bn":
            _set_path(params, fpath, "scale", jnp.asarray(sd[tkey + ".weight"]))
            _set_path(params, fpath, "bias", jnp.asarray(sd[tkey + ".bias"]))
            _set_path(stats, fpath, "mean", jnp.asarray(sd[tkey + ".running_mean"]))
            _set_path(stats, fpath, "var", jnp.asarray(sd[tkey + ".running_var"]))
        elif kind == "prelu":
            _set_path(params, fpath, "slope", jnp.asarray(sd[tkey].reshape(())))
        else:
            raise ValueError(kind)
    out: Dict[str, Any] = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def export_params_to_state_dict(variables: Dict, key_map) -> Dict[str, "Any"]:
    """flax variables -> torch state dict (CPU tensors) via a key map, in
    the reference's registration order (base_model.py:50-58 layout)."""
    import torch

    params = variables.get("params", variables)
    stats = variables.get("batch_stats", {})
    sd: Dict[str, Any] = {}

    def t(v):
        return torch.from_numpy(np.array(v, dtype=np.float32, copy=True))

    for tkey, fpath, kind in key_map:
        if kind == "rdbconv":
            node = _get_path(params, fpath[:-1])
            sd[tkey + ".weight"] = t(_j2t_conv(np.asarray(node[fpath[-1] + "_kernel"])))
            sd[tkey + ".bias"] = t(node[fpath[-1] + "_bias"])
        elif kind == "conv":
            node = _get_path(params, fpath)
            sd[tkey + ".weight"] = t(_j2t_conv(np.asarray(node["kernel"])))
            if "bias" in node:  # bias-free convs stay bias-free (reference)
                sd[tkey + ".bias"] = t(node["bias"])
        elif kind == "linear":
            node = _get_path(params, fpath)
            sd[tkey + ".weight"] = t(np.transpose(np.asarray(node["kernel"])))
            sd[tkey + ".bias"] = t(node["bias"])
        elif isinstance(kind, tuple) and kind[0] == "linear_chw":
            c, h, w = kind[1]
            node = _get_path(params, fpath)
            wt = np.transpose(np.asarray(node["kernel"]))  # (out, H*W*C)
            wt = wt.reshape(-1, h, w, c).transpose(0, 3, 1, 2).reshape(wt.shape[0], -1)
            sd[tkey + ".weight"] = t(wt)
            sd[tkey + ".bias"] = t(node["bias"])
        elif kind == "bn":
            node = _get_path(params, fpath)
            sd[tkey + ".weight"] = t(node["scale"])
            sd[tkey + ".bias"] = t(node["bias"])
            snode = _get_path(stats, fpath)
            sd[tkey + ".running_mean"] = t(snode["mean"])
            sd[tkey + ".running_var"] = t(snode["var"])
            sd[tkey + ".num_batches_tracked"] = torch.tensor(0, dtype=torch.long)
        elif kind == "prelu":
            sd[tkey] = t(np.asarray(_get_path(params, fpath)["slope"]).reshape(1))
        else:
            raise ValueError(kind)
    return sd


def _tensor_paths(key_map, params=None):
    """Per-parameter (flax_path, leaf) list in torch registration order —
    the index order torch Adam uses for its per-param state. Bias-free
    convs (detected from ``params``) register no bias on the torch side."""
    p = None
    if params is not None:
        p = params.get("params", params)
    out = []
    for _tkey, fpath, kind in key_map:
        if kind == "rdbconv":
            out.append((fpath[:-1], fpath[-1] + "_kernel"))
            out.append((fpath[:-1], fpath[-1] + "_bias"))
        elif kind in ("conv", "linear") or (
            isinstance(kind, tuple) and kind[0] == "linear_chw"
        ):
            out.append((fpath, "kernel"))
            if p is None or "bias" in _get_path(p, fpath):
                out.append((fpath, "bias"))
        elif kind == "bn":
            out.append((fpath, "scale"))
            out.append((fpath, "bias"))
        elif kind == "prelu":
            out.append((fpath, "slope"))
    return out


def import_adam_state(adam_sd: Dict, key_map, params: Dict, opt_state):
    """torch Adam state_dict -> optax adam state matching ``params``.

    Moment tensors are reshaped through the same layout transforms as the
    parameters (OIHW->HWIO for convs, transpose for linears); ``count`` is
    taken from the per-param 'step'. Returns a new opt_state pytree with
    the same structure as ``opt_state`` (optax.adam = chain(scale_by_adam,
    scale_by_learning_rate))."""
    import optax

    paths = _tensor_paths(key_map, params)
    state = adam_sd["state"]
    # torch indexes params in param_groups order == registration order
    mu = jax.tree_util.tree_map(jnp.zeros_like, params)
    nu = jax.tree_util.tree_map(jnp.zeros_like, params)
    count = 0
    p = params.get("params", params)
    mu_p = mu.get("params", mu)
    nu_p = nu.get("params", nu)
    for idx, (fpath, leaf) in enumerate(paths):
        if idx not in state and str(idx) not in state:
            continue
        st = state.get(idx, state.get(str(idx)))
        count = max(count, int(st["step"]))
        exp_avg = np.asarray(st["exp_avg"])
        exp_avg_sq = np.asarray(st["exp_avg_sq"])
        if exp_avg.ndim == 4:
            exp_avg, exp_avg_sq = _t2j_conv(exp_avg), _t2j_conv(exp_avg_sq)
        elif exp_avg.ndim == 2:
            exp_avg, exp_avg_sq = np.transpose(exp_avg), np.transpose(exp_avg_sq)
        elif leaf == "slope":
            exp_avg, exp_avg_sq = exp_avg.reshape(()), exp_avg_sq.reshape(())
        tgt = _get_path(p, fpath)[leaf]
        _get_path(mu_p, fpath)[leaf] = jnp.asarray(exp_avg).astype(tgt.dtype)
        _get_path(nu_p, fpath)[leaf] = jnp.asarray(exp_avg_sq).astype(tgt.dtype)

    new_state = []
    for part in opt_state:
        if isinstance(part, optax.ScaleByAdamState):
            new_state.append(
                optax.ScaleByAdamState(
                    count=jnp.asarray(count, jnp.int32), mu=mu, nu=nu
                )
            )
        elif "count" in getattr(part, "_fields", ()):
            new_state.append(part._replace(count=jnp.asarray(count, jnp.int32)))
        else:
            new_state.append(part)
    return tuple(new_state)


def export_adam_state(opt_state, key_map, params: Dict) -> Dict:
    """optax adam state -> torch Adam state_dict (inverse of
    import_adam_state; param_groups carries the index list only)."""
    import optax
    import torch

    adam = None
    for part in opt_state:
        if isinstance(part, optax.ScaleByAdamState):
            adam = part
    assert adam is not None, "no ScaleByAdamState in opt_state"
    paths = _tensor_paths(key_map, params)
    mu = adam.mu.get("params", adam.mu) if isinstance(adam.mu, dict) else adam.mu["params"]
    nu = adam.nu.get("params", adam.nu) if isinstance(adam.nu, dict) else adam.nu["params"]
    step = int(adam.count)
    state = {}
    for idx, (fpath, leaf) in enumerate(paths):
        m = np.asarray(_get_path(mu, fpath)[leaf], dtype=np.float32)
        v = np.asarray(_get_path(nu, fpath)[leaf], dtype=np.float32)
        if m.ndim == 4:
            m, v = _j2t_conv(m), _j2t_conv(v)
        elif m.ndim == 2:
            m, v = np.transpose(m), np.transpose(v)
        elif leaf == "slope":
            m, v = m.reshape(1), v.reshape(1)
        state[idx] = {
            "step": step,
            "exp_avg": torch.from_numpy(np.ascontiguousarray(m)),
            "exp_avg_sq": torch.from_numpy(np.ascontiguousarray(v)),
        }
    return {
        "state": state,
        "param_groups": [{
            "lr": 1e-4, "betas": (0.9, 0.999), "eps": 1e-8,
            "weight_decay": 0, "amsgrad": False,
            "params": list(range(len(paths))),
        }],
    }


def save_reference_g_pth(path: str, variables: Dict, nb: int = 23) -> str:
    """Write a reference-consumable ``*_G.pth`` for RRDBNet params
    (base_model.py:50-58 format: CPU state_dict torch-pickle)."""
    import torch

    sd = export_params_to_state_dict(variables, rrdbnet_key_map(nb))
    torch.save(sd, path)
    return path


def save_reference_training_state(
    path: str, epoch: int, it: int, optimizer_sds, scheduler_states=None
) -> str:
    """Write a reference-format ``{iter}.state`` (base_model.py:65-74):
    {'epoch', 'iter', 'schedulers': [...], 'optimizers': [...]} pickle."""
    import torch

    state = {
        "epoch": epoch,
        "iter": it,
        "schedulers": scheduler_states or [],
        "optimizers": list(optimizer_sds),
    }
    torch.save(state, path)
    return path


def load_reference_training_state(path: str) -> Dict[str, Any]:
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def save_dsn_tar(
    path: str,
    g_variables: Dict,
    d_variables: Dict,
    epoch: int = 0,
    iteration: int = 0,
    fs_type: str = "avg_pool",
    fs_kernel_size: int = 5,
    d_type: str = "FSD",
    n_res_blocks: int = 8,
    scale: int = 4,
    norm_layer: str = "Instance",
) -> str:
    """Write a DSN-format ``.tar`` checkpoint (reference: codes/DSN/
    train.py:361-373 key schema, including the 'models_d_state_dict' [sic]
    key) consumable by the reference's create_dataset_modified.py."""
    import torch

    torch.save(
        {
            "epoch": epoch,
            "iteration": iteration,
            "fs_type": fs_type,
            "fs_kernel_size": fs_kernel_size,
            "D_type": d_type,
            "model_g_state_dict": export_deresnet_state_dict(
                g_variables, n_res_blocks=n_res_blocks, scale=scale
            ),
            "models_d_state_dict": export_fsd_state_dict(
                d_variables, norm_layer=norm_layer
            ),
        },
        path,
    )
    return path


def export_deresnet_state_dict(variables: Dict, n_res_blocks: int = 8,
                               scale: int = 4) -> Dict:
    """flax DeResnet params -> DSN torch naming (inverse of
    import_deresnet_params)."""
    import torch

    p = variables.get("params", variables)

    def t(v):
        return torch.from_numpy(np.array(v, dtype=np.float32, copy=True))

    sd = {
        "block_input.0.weight": t(_j2t_conv(np.asarray(p["Conv_0"]["kernel"]))),
        "block_input.0.bias": t(p["Conv_0"]["bias"]),
        "block_input.1.weight": t(np.asarray(p["PReLU_0"]["slope"]).reshape(1)),
    }
    for i in range(n_res_blocks):
        b = p[f"ResidualBlock_{i}"]
        sd[f"res_blocks.{i}.conv1.weight"] = t(_j2t_conv(np.asarray(b["Conv_0"]["kernel"])))
        sd[f"res_blocks.{i}.conv1.bias"] = t(b["Conv_0"]["bias"])
        sd[f"res_blocks.{i}.prelu.weight"] = t(np.asarray(b["PReLU_0"]["slope"]).reshape(1))
        sd[f"res_blocks.{i}.conv2.weight"] = t(_j2t_conv(np.asarray(b["Conv_1"]["kernel"])))
        sd[f"res_blocks.{i}.conv2.bias"] = t(b["Conv_1"]["bias"])
    n_down = {1: 0, 2: 1, 4: 2}[scale]
    for d in range(n_down):
        sd[f"down_sample.{2 * d}.weight"] = t(_j2t_conv(np.asarray(p[f"Conv_{d + 1}"]["kernel"])))
        sd[f"down_sample.{2 * d}.bias"] = t(p[f"Conv_{d + 1}"]["bias"])
        sd[f"down_sample.{2 * d + 1}.weight"] = t(
            np.asarray(p[f"PReLU_{d + 1}"]["slope"]).reshape(1))
    sd["block_output.weight"] = t(_j2t_conv(np.asarray(p[f"Conv_{n_down + 1}"]["kernel"])))
    sd["block_output.bias"] = t(p[f"Conv_{n_down + 1}"]["bias"])
    return sd


def export_fsd_state_dict(variables: Dict, norm_layer: str = "Instance") -> Dict:
    """flax FSDiscriminator(FSD body) params -> DSN torch naming
    ``net.net.{0,2,5,8}`` (+ BatchNorm at 3,6 when norm_layer='Batch';
    inverse of import_fsd_discriminator_params)."""
    import torch

    p = variables["params"]["DiscriminatorBasic_0"]

    def t(v):
        return torch.from_numpy(np.array(v, dtype=np.float32, copy=True))

    batch = norm_layer.lower() == "batch"
    conv_pos = (0, 2, 5, 8) if batch else (0, 2, 5, 8)
    sd = {}
    for j, i in enumerate(conv_pos):
        sd[f"net.net.{i}.weight"] = t(_j2t_conv(np.asarray(p[f"Conv_{j}"]["kernel"])))
        sd[f"net.net.{i}.bias"] = t(p[f"Conv_{j}"]["bias"])
    if batch:
        stats = variables.get("batch_stats", {}).get("DiscriminatorBasic_0", {})
        for j, i in enumerate((3, 6)):
            sd[f"net.net.{i}.weight"] = t(p[f"BatchNorm_{j}"]["scale"])
            sd[f"net.net.{i}.bias"] = t(p[f"BatchNorm_{j}"]["bias"])
            sd[f"net.net.{i}.running_mean"] = t(stats[f"BatchNorm_{j}"]["mean"])
            sd[f"net.net.{i}.running_var"] = t(stats[f"BatchNorm_{j}"]["var"])
            sd[f"net.net.{i}.num_batches_tracked"] = torch.tensor(0, dtype=torch.long)
    return sd


def import_nlayer_d_params(path_or_sd, n_layers: int = 3) -> Dict[str, Any]:
    """SRN ``*_D_target/_D_source.pth`` (NLayerDiscriminator) -> flax params."""
    sd = (load_torch_state_dict(path_or_sd)
          if isinstance(path_or_sd, str) else path_or_sd)
    return import_params_from_key_map(sd, nlayer_d_key_map(n_layers))


def import_vgg128_d_params(path_or_sd) -> Dict[str, Any]:
    """``*_D.pth`` (Discriminator_VGG_128) -> flax DiscriminatorVGG params."""
    sd = (load_torch_state_dict(path_or_sd)
          if isinstance(path_or_sd, str) else path_or_sd)
    return import_params_from_key_map(sd, vgg128_d_key_map())


def load_dsn_tar(path: str) -> Dict[str, Any]:
    """Read a DSN ``.tar`` checkpoint's raw dict (torch pickle)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    out = dict(ckpt)
    for key in ("model_g_state_dict", "models_d_state_dict"):
        if key in out:
            out[key] = {k: v.numpy() for k, v in out[key].items()}
    return out


def import_sftnet_params(path_or_sd, n_blocks: int = 16) -> Dict[str, Any]:
    """SFT-GAN ``SFTGAN_*.pth`` -> flax SFTNet params (nn/sft.py).

    Reference module names (sft_arch.py:40-75): ``conv0``,
    ``sft_branch.{0..15}.{sft0,sft1}.SFT_{scale,shift}_conv{0,1}`` +
    ``sft_branch.{0..15}.conv{0,1}``, trailing ``sft_branch.16`` (SFTLayer)
    and ``sft_branch.17`` (conv), ``HR_branch.{0,3,6,8}``,
    ``CondNet.{0,2,4,6,8}``.

    torch ``PixelShuffle(2)`` reads channels as (c, dy, dx) while the flax
    depth-to-space reshape reads (dy, dx, c), so the two HR upsample convs'
    output channels are permuted accordingly.
    """
    sd = (load_torch_state_dict(path_or_sd)
          if isinstance(path_or_sd, str) else path_or_sd)

    def conv(prefix):
        return {
            "kernel": _t2j_conv(sd[prefix + ".weight"]),
            "bias": sd[prefix + ".bias"],
        }

    def conv_ps(prefix, r: int = 2):
        # permute cout from torch's (c, dy, dx) to flax's (dy, dx, c)
        c = conv(prefix)
        k, b = c["kernel"], c["bias"]
        cout = k.shape[-1]
        cc = cout // (r * r)
        perm = (
            np.arange(cout)
            .reshape(cc, r, r)
            .transpose(1, 2, 0)
            .reshape(-1)
        )
        return {"kernel": np.ascontiguousarray(k[..., perm]),
                "bias": np.ascontiguousarray(b[perm])}

    def sft_layer(prefix):
        return {
            "scale_conv0": conv(prefix + ".SFT_scale_conv0"),
            "scale_conv1": conv(prefix + ".SFT_scale_conv1"),
            "shift_conv0": conv(prefix + ".SFT_shift_conv0"),
            "shift_conv1": conv(prefix + ".SFT_shift_conv1"),
        }

    params: Dict[str, Any] = {"conv0": conv("conv0")}
    for i in range(n_blocks):
        params[f"block{i}"] = {
            "sft0": sft_layer(f"sft_branch.{i}.sft0"),
            "conv0": conv(f"sft_branch.{i}.conv0"),
            "sft1": sft_layer(f"sft_branch.{i}.sft1"),
            "conv1": conv(f"sft_branch.{i}.conv1"),
        }
    params["sft_tail"] = sft_layer(f"sft_branch.{n_blocks}")
    params["conv_tail"] = conv(f"sft_branch.{n_blocks + 1}")
    params["up0"] = conv_ps("HR_branch.0")
    params["up1"] = conv_ps("HR_branch.3")
    params["hr_conv"] = conv("HR_branch.6")
    params["out_conv"] = conv("HR_branch.8")
    for i, j in enumerate((0, 2, 4, 6, 8)):
        params[f"cond{i}"] = conv(f"CondNet.{j}")
    return {"params": params}


def export_sftnet_state_dict(variables: Dict, n_blocks: int = 16) -> Dict:
    """flax SFTNet params -> SFT-GAN torch naming (inverse of
    import_sftnet_params; reference module names sft_arch.py:40-75).

    The two HR pixel-shuffle convs' output channels are permuted back from
    flax's depth-to-space order (dy, dx, c) to torch ``PixelShuffle(2)``
    order (c, dy, dx)."""
    import torch

    p = variables["params"]

    def t(v):
        return torch.from_numpy(np.array(v, dtype=np.float32, copy=True))

    def conv(prefix, node):
        return {
            prefix + ".weight": t(_j2t_conv(np.asarray(node["kernel"]))),
            prefix + ".bias": t(node["bias"]),
        }

    def conv_ps(prefix, node, r: int = 2):
        k = np.asarray(node["kernel"])
        b = np.asarray(node["bias"])
        cout = k.shape[-1]
        cc = cout // (r * r)
        perm = (
            np.arange(cout).reshape(cc, r, r).transpose(1, 2, 0).reshape(-1)
        )
        inv = np.argsort(perm)  # flax = torch[..., perm]  =>  torch = flax[..., inv]
        return {
            prefix + ".weight": t(_j2t_conv(np.ascontiguousarray(k[..., inv]))),
            prefix + ".bias": t(np.ascontiguousarray(b[inv])),
        }

    def sft_layer(prefix, node):
        sd = {}
        sd.update(conv(prefix + ".SFT_scale_conv0", node["scale_conv0"]))
        sd.update(conv(prefix + ".SFT_scale_conv1", node["scale_conv1"]))
        sd.update(conv(prefix + ".SFT_shift_conv0", node["shift_conv0"]))
        sd.update(conv(prefix + ".SFT_shift_conv1", node["shift_conv1"]))
        return sd

    sd: Dict[str, Any] = {}
    sd.update(conv("conv0", p["conv0"]))
    for i in range(n_blocks):
        blk = p[f"block{i}"]
        sd.update(sft_layer(f"sft_branch.{i}.sft0", blk["sft0"]))
        sd.update(conv(f"sft_branch.{i}.conv0", blk["conv0"]))
        sd.update(sft_layer(f"sft_branch.{i}.sft1", blk["sft1"]))
        sd.update(conv(f"sft_branch.{i}.conv1", blk["conv1"]))
    sd.update(sft_layer(f"sft_branch.{n_blocks}", p["sft_tail"]))
    sd.update(conv(f"sft_branch.{n_blocks + 1}", p["conv_tail"]))
    sd.update(conv_ps("HR_branch.0", p["up0"]))
    sd.update(conv_ps("HR_branch.3", p["up1"]))
    sd.update(conv("HR_branch.6", p["hr_conv"]))
    sd.update(conv("HR_branch.8", p["out_conv"]))
    for i, j in enumerate((0, 2, 4, 6, 8)):
        sd.update(conv(f"CondNet.{j}", p[f"cond{i}"]))
    return sd
