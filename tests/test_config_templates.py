"""Every shipped config template parses and builds its networks.

The reference ships its option templates under codes/SRN/options/{train,test};
ours live in dasr_tpu/configs/{train,test}. This test keeps them honest:
each template must survive parse_srn_options (commented JSON, debug
overrides, model-name normalization) and its network sections must construct
through the models.registry factories, so a template can never drift from
the factory key surface.
"""

import glob
import os

import pytest

from dasr_tpu.core.config import parse_srn_options
from dasr_tpu.models import registry

CONFIG_ROOT = os.path.join(
    os.path.dirname(__file__), "..", "dasr_tpu", "configs"
)
TRAIN_TEMPLATES = sorted(glob.glob(os.path.join(CONFIG_ROOT, "train", "*.json")))
TEST_TEMPLATES = sorted(glob.glob(os.path.join(CONFIG_ROOT, "test", "*.json")))

# models the trainer registry recognizes (post-normalization)
REGISTRY_MODELS = {
    "sr", "srgan", "srragan", "De_Resnet", "De_patch_wavelet_GAN",
    "DASR", "DASR_Adaptive_Model",
}


def test_templates_present():
    # the reference's inventory: 5 test templates; train_sr_{0..3} are
    # dataroot-only copies of train_sr (documented in its header)
    assert len(TRAIN_TEMPLATES) >= 8
    assert len(TEST_TEMPLATES) == 5


@pytest.mark.parametrize(
    "path", TRAIN_TEMPLATES, ids=[os.path.basename(p) for p in TRAIN_TEMPLATES]
)
def test_train_template_parses_and_builds(path):
    opt = parse_srn_options(path, is_train=True)
    assert opt["is_train"] is True
    assert opt["model"] in REGISTRY_MODELS, opt["model"]
    # network factories accept the template's key surface
    g = registry.define_G(opt)
    assert g is not None
    if opt.get("network_D"):
        assert registry.define_D(opt) is not None
    if (opt.get("network_D") or {}).get("which_model_pairD"):
        assert registry.define_pairD(opt) is not None
    if opt.get("network_patchD"):
        assert registry.define_patchD(opt) is not None
    # training templates must carry a complete schedule block
    tr = opt["train"]
    assert tr["lr_G"] and tr["niter"] and tr["lr_scheme"] == "MultiStepLR"
    assert opt["logger"]["save_checkpoint_freq"]


@pytest.mark.parametrize(
    "path", TEST_TEMPLATES, ids=[os.path.basename(p) for p in TEST_TEMPLATES]
)
def test_test_template_parses_and_builds(path):
    opt = parse_srn_options(path, is_train=False)
    assert opt["is_train"] is False
    g = registry.define_G(opt)
    assert g is not None
    phases = [k for k in (opt.get("datasets") or {}) if k.startswith("test")]
    assert phases, "test template needs at least one test_N dataset"
    if opt["model"] in REGISTRY_MODELS:
        pass  # consumable by cli/srn_test
    else:
        # the DSGAN template: reference create_model crashes on it; our
        # equivalent driver is cli/dsn_test (header documents this)
        assert opt["model"] == "DSGAN"


def test_debug_override(tmp_path):
    # "debug_" names trigger the reference's short-run overrides
    src = open(TRAIN_TEMPLATES[0]).read().replace(
        '"name": "', '"name": "debug_', 1
    )
    p = tmp_path / "debug.json"
    p.write_text(src)
    opt = parse_srn_options(str(p), is_train=True)
    assert opt["train"]["val_freq"] <= 8
