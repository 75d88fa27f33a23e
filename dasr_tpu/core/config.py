"""Configuration.

One structured config system (plain dicts with attribute-style access and a
schema of defaults per trainer), plus loaders for the reference's two legacy
formats so its CLIs keep working:

  * SRN commented-JSON options (reference: codes/SRN/options/options.py:8-91):
    JSON files with ``//`` comments, missing keys read as ``None``
    (``NoneDict``), phase/scale injection, debug-mode overrides when the
    experiment name contains ``"debug"``.
  * ``paths.yml`` dataset registry keyed
    ``[dataset][artifact][source|target|valid_hr|valid_lr]``
    (reference: codes/paths.yml:1-44).

Reference quirks normalized here (SURVEY.md §7 "hard parts" #6):
  * ``"model": "DASR_FS_ESRGAN_patchGAN"`` (written by Auto_Reproduce.py)
    does not match any registry entry in the reference — we map it, and any
    other ``DASR_*`` alias, to the ``DASR`` trainer.
  * ``DegrationModel`` / ``DegradationModel`` spelling both accepted.
"""

from __future__ import annotations

import json
import os
import re
from collections import OrderedDict
from typing import Any, Optional

import yaml

# ---------------------------------------------------------------------------
# NoneDict — schemaless access like the reference's options
# ---------------------------------------------------------------------------


class NoneDict(dict):
    """dict whose missing keys read as None (reference: options.py:76-83)."""

    def __missing__(self, key):
        return None

    def __getattr__(self, key):
        if key.startswith("__"):
            raise AttributeError(key)
        return self[key]


def dict_to_nonedict(opt: Any) -> Any:
    if isinstance(opt, dict):
        return NoneDict({k: dict_to_nonedict(v) for k, v in opt.items()})
    if isinstance(opt, (list, tuple)):
        return [dict_to_nonedict(v) for v in opt]
    return opt


# ---------------------------------------------------------------------------
# Legacy SRN JSON options
# ---------------------------------------------------------------------------

_MODEL_ALIASES = {
    # Auto_Reproduce writes this legacy name; the reference would crash on it.
    "dasr_fs_esrgan_patchgan": "DASR",
    "degrationmodel": "De_Resnet",
    "degradationmodel": "De_Resnet",
}


def normalize_model_name(name: str) -> str:
    if name is None:
        return name
    low = name.lower()
    if low in _MODEL_ALIASES:
        return _MODEL_ALIASES[low]
    if low.startswith("dasr_adaptive"):
        return "DASR_Adaptive_Model"
    if low.startswith("dasr"):
        return "DASR"
    return name


def _strip_json_comments(text: str) -> str:
    # Remove // comments outside string literals (reference JSONs use them
    # only at line level, so a line-based strip is faithful).
    out = []
    for line in text.splitlines():
        # keep '//' that appears inside quotes (e.g. URLs in paths)
        in_str = False
        for i, ch in enumerate(line):
            if ch == '"' and (i == 0 or line[i - 1] != "\\"):
                in_str = not in_str
            if not in_str and ch == "/" and line[i : i + 2] == "//":
                line = line[:i]
                break
        out.append(line)
    return "\n".join(out)


def parse_srn_options(json_path: str, is_train: bool = True) -> NoneDict:
    """Load an SRN options JSON (reference: codes/SRN/options/options.py:8-73).

    Reproduces: comment stripping, phase/scale injection into every dataset,
    lmdb detection, experiment-dir derivation, and debug-name overrides.
    """
    with open(json_path) as f:
        opt = json.loads(_strip_json_comments(f.read()), object_pairs_hook=OrderedDict)

    opt["is_train"] = is_train
    opt["model"] = normalize_model_name(opt.get("model"))
    scale = opt.get("scale", 4)

    for phase, dataset in (opt.get("datasets") or {}).items():
        phase_name = phase.split("_")[0]
        dataset["phase"] = phase_name
        dataset["scale"] = scale
        if dataset.get("dataroot_HR") is not None:
            dataset["dataroot_HR"] = os.path.expanduser(dataset["dataroot_HR"])
            if dataset["dataroot_HR"].endswith("lmdb"):
                dataset["data_type"] = "lmdb"
            else:
                dataset.setdefault("data_type", "img")
        if dataset.get("dataroot_LR") is not None:
            dataset["dataroot_LR"] = os.path.expanduser(dataset["dataroot_LR"])

    path = opt.setdefault("path", {})
    path["root"] = os.path.expanduser(path.get("root", "."))
    if is_train:
        experiments_root = os.path.join(path["root"], opt["name"])
        path["experiments_root"] = experiments_root
        path["models"] = os.path.join(experiments_root, "models")
        path["training_state"] = os.path.join(experiments_root, "training_state")
        path["log"] = experiments_root
        path["val_images"] = os.path.join(experiments_root, "val_images")
        if "debug" in opt["name"]:
            # debug overrides (reference: options.py:55-59)
            opt.setdefault("train", {})["val_freq"] = 8
            opt.setdefault("logger", {})["print_freq"] = 2
            opt.setdefault("logger", {})["save_checkpoint_freq"] = 8
    else:
        results_root = os.path.join(path["root"], "results", opt["name"])
        path["results_root"] = results_root
        path["log"] = results_root

    return dict_to_nonedict(opt)


def check_resume(opt: NoneDict, resume_iter: Optional[int] = None) -> NoneDict:
    """Rewire pretrain paths when resuming (reference: options.py:107-122)."""
    if opt["path"]["resume_state"]:
        state_path = opt["path"]["resume_state"]
        if resume_iter is None:
            m = re.search(r"(\d+)\.state$", os.path.basename(state_path))
            resume_iter = int(m.group(1)) if m else 0
        models = opt["path"]["models"]
        opt["path"]["pretrain_model_G"] = os.path.join(models, f"{resume_iter}_G.pth")
        if (opt.get("train") or {}).get("gan_H_target", 0):
            opt["path"]["pretrain_model_D_target"] = os.path.join(
                models, f"{resume_iter}_D_target.pth"
            )
        if (opt.get("train") or {}).get("gan_H_source", 0):
            opt["path"]["pretrain_model_D_source"] = os.path.join(
                models, f"{resume_iter}_D_source.pth"
            )
    return opt


# ---------------------------------------------------------------------------
# paths.yml dataset registry
# ---------------------------------------------------------------------------


def load_paths_yml(path: str) -> NoneDict:
    with open(path) as f:
        return dict_to_nonedict(yaml.safe_load(f))


def dataset_paths(paths_yml: str, dataset: str, artifact: str) -> NoneDict:
    reg = load_paths_yml(paths_yml)
    if dataset not in reg or artifact not in reg[dataset]:
        raise KeyError(f"paths.yml has no entry [{dataset}][{artifact}]")
    return reg[dataset][artifact]


# ---------------------------------------------------------------------------
# pretty printing (reference: options.py:94-104)
# ---------------------------------------------------------------------------


def dict2str(opt: dict, indent_l: int = 1) -> str:
    msg = ""
    for k, v in opt.items():
        if isinstance(v, dict):
            msg += " " * (indent_l * 2) + k + ":[\n"
            msg += dict2str(v, indent_l + 1)
            msg += " " * (indent_l * 2) + "]\n"
        else:
            msg += " " * (indent_l * 2) + k + ": " + str(v) + "\n"
    return msg
