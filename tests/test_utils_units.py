"""Direct unit tests for the small utility modules that were previously
only exercised through the CLIs: LR schedules (reference LambdaLR /
MultiStepLR parity), PRNG discipline, NaN guards, batch split/merge, and
the sub-image extraction script."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_dsn_linear_decay_matches_reference_lambda():
    """DSN LambdaLR parity (codes/DSN/train.py:152-157):
    factor(e) = 1 - max(0, e - (E - D)) / D, stepped per epoch."""
    from dasr_tpu.train.schedules import dsn_linear_decay

    base, E, D, spe = 1e-4, 10, 4, 7
    sched = dsn_linear_decay(base, E, D, spe)
    for epoch in range(E):
        want = base * (1.0 - max(0, epoch - (E - D)) / D)
        for step in (epoch * spe, epoch * spe + spe - 1):
            got = float(sched(jnp.asarray(step)))
            assert got == pytest.approx(want, rel=1e-6), (epoch, step)


def test_multistep_matches_reference():
    """MultiStepLR parity: halve at each milestone (DASR_model.py:146-149)."""
    from dasr_tpu.train.schedules import multistep

    sched = multistep(1e-4, [10, 20], gamma=0.5)
    assert float(sched(0)) == pytest.approx(1e-4)
    assert float(sched(9)) == pytest.approx(1e-4)
    assert float(sched(10)) == pytest.approx(5e-5)
    assert float(sched(19)) == pytest.approx(5e-5)
    assert float(sched(25)) == pytest.approx(2.5e-5)


def test_prng_keys_deterministic_and_distinct():
    from dasr_tpu.core import prng

    r = prng.root_key(0)
    k1, k1b = prng.step_key(r, 5), prng.step_key(r, 5)
    k2 = prng.step_key(r, 6)
    assert jax.random.uniform(k1) == jax.random.uniform(k1b)
    assert jax.random.uniform(k1) != jax.random.uniform(k2)
    a = prng.named_key(k1, "augment")
    b = prng.named_key(k1, "dropout")
    assert jax.random.uniform(a) != jax.random.uniform(b)


def test_guards_check_finite_and_tree():
    from dasr_tpu.utils import guards

    guards.check_finite({"a": 1.0, "b": -2.0}, 3)
    with pytest.raises(guards.NonFiniteError, match="loss/bad"):
        guards.check_finite({"ok": 0.0, "loss/bad": float("nan")}, 7)
    tree = {"x": jnp.ones((3,)), "y": jnp.zeros((2, 2))}
    assert bool(guards.tree_all_finite(tree))
    tree["y"] = tree["y"].at[0, 0].set(jnp.inf)
    assert not bool(guards.tree_all_finite(tree))


def test_batch_ops_split_merge_select(rng):
    from dasr_tpu.utils import batch_ops

    batch = rng.random((6, 4, 4, 3)).astype(np.float32)
    mask = [0, 0, 0, 1, 1, 1]  # the reference's static halves
    fake, real = batch_ops.b_split(batch, mask)
    np.testing.assert_array_equal(fake, batch[:3])
    np.testing.assert_array_equal(real, batch[3:])
    merged = batch_ops.b_merge(real, fake, mask)
    np.testing.assert_array_equal(merged, batch)

    # jit-safe elementwise select: mask==1 -> real row, 0 -> fake row
    real_j = jnp.asarray(rng.random((4, 2, 2, 3)).astype(np.float32))
    fake_j = jnp.asarray(rng.random((4, 2, 2, 3)).astype(np.float32))
    sel = np.asarray(batch_ops.b_select(real_j, fake_j, jnp.asarray([1, 0, 1, 0])))
    np.testing.assert_allclose(sel[0], real_j[0])
    np.testing.assert_allclose(sel[1], fake_j[1])


def test_extract_subimgs_single(tmp_path, rng):
    """Sub-image extraction parity with the reference's stride walk
    (codes/SRN/scripts/extract_subimgs_single.py): overlapping crop grid
    plus the tail crop when the remainder exceeds thres_sz."""
    from dasr_tpu.data.io import read_img, save_img
    from dasr_tpu.scripts import extract_subimgs_single as ex

    src, dst = tmp_path / "in", tmp_path / "out"
    src.mkdir(), dst.mkdir()
    save_img(rng.random((70, 100, 3)).astype(np.float32), str(src / "a.png"))

    ex.main(["--input_dir", str(src), "--save_dir", str(dst),
             "--crop_sz", "48", "--step", "24", "--thres_sz", "13"])
    outs = sorted(os.listdir(dst))
    # reference stride arithmetic: h_space = [0, 22] with no tail
    # (70 - (22 + 48) = 0 <= thres); w_space = [0, 24, 48] with no tail
    # (100 - (48 + 48) = 4 <= thres) -> 2 x 3 crops of 48x48
    assert len(outs) == 2 * 3
    crop = read_img(str(dst / outs[0]))
    assert crop.shape == (48, 48, 3)
