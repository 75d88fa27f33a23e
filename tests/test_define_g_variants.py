"""define_G variant parity (VERDICT round-1 items #1-3).

Covers the SRN ``arch.De_Resnet`` family (strided / bilinear / x2), the
``De_RRDB`` -> De_Resnet mapping, and ``RRDB_SEAN``:
  * factory tests assert each config name builds the right network class
    and variant (reference: codes/SRN/models/networks.py:106-135);
  * torch *functional* oracles (written here from the documented layer
    semantics) validate the state-dict importer + forward numerics;
  * RRDBNetSEAN is checked for reference-exact parameter count (including
    the dormant ``f_conv_rep_beta`` stack the reference allocates but never
    uses, block.py:586-588).
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from dasr_tpu.models.registry import define_G
from dasr_tpu.nn.generators import DeResnetSRN, RRDBNetSEAN
from dasr_tpu.train.checkpoints import import_deresnet_srn_params


def _rand_conv(key, cin, cout, k=3):
    g = torch.Generator().manual_seed(key)
    return (
        torch.randn(cout, cin, k, k, generator=g) * 0.05,
        torch.randn(cout, generator=g) * 0.01,
    )


def _make_sd(nb, scale, act, variant, nf=8):
    """Build a torch state dict with the reference's flattened-sequential
    key layout (architecture.py:51-171)."""
    sd = {}
    idx = 0

    def add(name, cin, cout):
        nonlocal idx
        w, b = _rand_conv(idx, cin, cout)
        sd[name + ".weight"] = w
        sd[name + ".bias"] = b
        idx += 1

    def add_prelu(name):
        sd[name + ".weight"] = torch.tensor([0.19])

    prelu = act == "prelu"
    add("model.0", 3, nf)
    for i in range(nb):
        base = f"model.1.sub.{i}.res"
        if act:  # NAC: [act, conv, act, conv]
            if prelu:
                add_prelu(f"{base}.0")
            add(f"{base}.1", nf, nf)
            if prelu:
                add_prelu(f"{base}.2")
            add(f"{base}.3", nf, nf)
        else:
            add(f"{base}.0", nf, nf)
            add(f"{base}.1", nf, nf)
    add(f"model.1.sub.{nb}", nf, nf)
    n_down = {"strided": {2: 1, 4: 2}[scale], "x2": 1, "bilinear": 0}[variant]
    t = 2
    for _ in range(n_down):
        add(f"model.{t}", nf, nf)
        if prelu:
            add_prelu(f"model.{t + 1}")
        t += 2 if act else 1
    if variant == "bilinear":
        add("Afterconv.0", nf, nf)
        add("Afterconv.1", nf, 3)
    else:
        add(f"model.{t}", nf, nf)
        add(f"model.{t + 1}", nf, 3)
    return sd


def _torch_forward(sd, x, nb, scale, act, variant):
    """Functional De_Resnet-family forward per architecture.py semantics:
    NAC resnet trunk with long skip, then variant-specific downsampling and
    two After_D convs (no sigmoid)."""

    def a(v, key=None):
        if act == "prelu":
            return F.prelu(v, sd[key + ".weight"])
        if act == "relu":
            return F.relu(v)
        return v

    def c(p, v, stride=1):
        return F.conv2d(v, sd[p + ".weight"], sd[p + ".bias"], stride=stride, padding=1)

    fea = c("model.0", x)
    h = fea
    for i in range(nb):
        base = f"model.1.sub.{i}.res"
        if act:
            r = c(f"{base}.1", a(h, f"{base}.0"))
            r = c(f"{base}.3", a(r, f"{base}.2"))
        else:
            r = c(f"{base}.1", c(f"{base}.0", h))
        h = h + r
    h = fea + c(f"model.1.sub.{nb}", h)
    n_down = {"strided": {2: 1, 4: 2}[scale], "x2": 1, "bilinear": 0}[variant]
    t = 2
    for _ in range(n_down):
        h = c(f"model.{t}", h, stride=2)
        h = a(h, f"model.{t + 1}") if act else h
        t += 2 if act else 1
    if variant == "bilinear":
        h = F.interpolate(h, scale_factor=0.25, mode="bilinear")
        h = c("Afterconv.1", c("Afterconv.0", h))
    else:
        h = c(f"model.{t + 1}", c(f"model.{t}", h))
    return h


def _check_variant(variant, act, scale=4, nb=2, nf=8):
    sd = _make_sd(nb, scale, act, variant, nf)
    x = np.random.default_rng(0).random((1, 16, 16, 3)).astype(np.float32)
    want = _torch_forward(
        sd, torch.from_numpy(x.transpose(0, 3, 1, 2)), nb, scale, act, variant
    ).numpy().transpose(0, 2, 3, 1)

    params = import_deresnet_srn_params(
        {k: v.numpy() for k, v in sd.items()}, nb=nb, scale=scale,
        act_type=act, mode="NAC", variant=variant,
    )
    model = DeResnetSRN(
        nf=nf, nb=nb, downscale=scale, norm_type=None, act_type=act,
        mode="NAC", variant=variant,
    )
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_de_resnet_strided_prelu_oracle():
    _check_variant("strided", "prelu")


def test_de_resnet_strided_relu_oracle():
    # the De_RRDB mapping: arch.De_Resnet with act 'relu' (networks.py:124-127)
    _check_variant("strided", "relu")


def test_de_resnet_x2_oracle():
    _check_variant("x2", "relu", scale=2)


def test_de_resnet_bilinear_oracle():
    _check_variant("bilinear", "relu")


def test_de_resnet_no_act_oracle():
    # shipped configs pass act_type=None through NoneDict (train_De_Resnet.json)
    _check_variant("strided", None)


def _g(which, scale=4, extra=None):
    net = {"which_model_G": which, "nb": 2, "nf": 8, "gc": 4,
           "act_type": "prelu", "mode": "NAC", "norm_type": None}
    net.update(extra or {})
    return define_G({"network_G": net, "scale": scale, "bf16": False})


def test_factory_builds_right_networks():
    m = _g("De_Resnet")
    assert isinstance(m, DeResnetSRN) and m.variant == "strided"
    assert m.act_type == "prelu"
    m = _g("De_RRDB")
    assert isinstance(m, DeResnetSRN) and m.variant == "strided"
    assert m.act_type == "relu"  # networks.py:124-127 hardwires relu
    m = _g("De_Resnet_bilinear")
    assert isinstance(m, DeResnetSRN) and m.variant == "bilinear"
    assert m.act_type == "relu"
    m = _g("De_Resnet2xd", scale=2)
    assert isinstance(m, DeResnetSRN) and m.variant == "x2"
    m = _g("RRDB_SEAN", extra={"ada_nb": 1})
    assert isinstance(m, RRDBNetSEAN) and m.nb_ada == 1


def _count(tree):
    return sum(int(np.prod(a.shape)) for a in jax.tree_util.tree_leaves(tree))


def test_rrdbnet_sean_param_count_and_forward():
    """Reference param count, derived from architecture.py:873-918 +
    block.py:367-435,561-595 (nf=64, gc=32, x4, nb plain + nb_ada SEAN):

      RRDBNet base = fea/LR/up1/up2/HR0/HR1 convs + (nb+nb_ada)*3 RDB5C
      SEAN extra per ada block = 3 x (SEAN_Module + 64->64 conv), where a
      SEAN_Module = 1->64 ddm conv + 4 conv stacks of 2 x (64->64) + 2 alphas
      (incl. the dormant f_conv_rep_beta stack) = 2 + 640 + 8*36928.
    """
    nf, gc, nb, nb_ada = 64, 32, 1, 1
    conv = lambda cin, cout, k=3: k * k * cin * cout + cout  # noqa: E731
    rdb = sum(conv(nf + i * gc, gc if i < 4 else nf) for i in range(5))
    sean_mod = conv(1, nf) + 8 * conv(nf, nf) + 2
    sean_blk = 3 * (sean_mod + conv(nf, nf))
    want = (
        conv(3, nf) + (nb + nb_ada) * 3 * rdb + nb_ada * sean_blk
        + conv(nf, nf) * 4 + conv(nf, 3)
    )
    m = RRDBNetSEAN(nf=nf, nb=nb, gc=gc, nb_ada=nb_ada, upscale=4)
    x = jnp.zeros((1, 8, 8, 3))
    ddm = jnp.zeros((1, 8, 8, 1))
    v = m.init(jax.random.PRNGKey(0), x, ddm)
    assert _count(v) == want, (_count(v), want)
    y = m.apply(v, x, ddm)
    assert y.shape == (1, 32, 32, 3)
