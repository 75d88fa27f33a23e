"""DDM receptive-field splat vs an independent brute-force replica."""

import jax.numpy as jnp
import math
import numpy as np
import pytest

from dasr_tpu.ops.rf_splat import CONVNETS, ddm_shape_for, ddm_splat, receptive_field


def _brute_rf(imsize, convnet):
    n, j, r, start = imsize, 1, 1, 0.5
    for k, s, p in convnet:
        n_out = math.floor((n - k + 2 * p) / s) + 1
        actual_p = (n_out - 1) * s - n + k
        p_left = math.floor(actual_p / 2)
        start += ((k - 1) / 2 - p_left) * j
        r += (k - 1) * j
        j *= s
        n = n_out
    return n, j, r, start


def _brute_splat(scores, out_h, out_w, convnet):
    """Direct loop re-derivation of the reference's weights_matrix/getWeights."""
    n_h, jump, rf, start = _brute_rf(out_h, convnet)
    n_w = _brute_rf(out_w, convnet)[0]
    num = np.zeros((out_h, out_w))
    cnt = np.zeros((out_h, out_w))
    for i in range(min(n_h, scores.shape[0])):
        for j in range(min(n_w, scores.shape[1])):
            hf = int(max(0, start + i * jump - rf // 2))
            ht = int(start + i * jump + rf - rf // 2)
            wf = int(max(0, start + j * jump - rf // 2))
            wt = int(start + j * jump + rf - rf // 2)
            num[hf:ht, wf:wt] += scores[i, j]
            cnt[hf:ht, wf:wt] += 1.0
    return num / cnt


@pytest.mark.parametrize("arch", ["FSD", "nld_s1", "nld_s2"])
@pytest.mark.parametrize("size", [(48, 40), (37, 53)])
def test_ddm_splat_matches_brute_force(rng, arch, size):
    convnet = CONVNETS[arch]
    out_h, out_w = size
    n_h = receptive_field(out_h, convnet)[0]
    n_w = receptive_field(out_w, convnet)[0]
    scores = rng.random((n_h, n_w)).astype(np.float32)
    got = np.asarray(ddm_splat(jnp.asarray(scores), out_h, out_w, convnet))
    want = _brute_splat(scores.astype(np.float64), out_h, out_w, convnet)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fsd_geometry():
    # FSD: four 5x5 stride-1 convs -> rf 17, jump 1, same-size output
    n, j, r, s = receptive_field(64, CONVNETS["FSD"])
    assert (n, j, r) == (64, 1, 17)
    assert s == 0.5


def test_constant_scores_give_constant_ddm(rng):
    convnet = CONVNETS["FSD"]
    scores = np.full((32, 32), 0.7, dtype=np.float32)
    ddm = np.asarray(ddm_splat(jnp.asarray(scores), 32, 32, convnet))
    np.testing.assert_allclose(ddm, 0.7, atol=1e-5)


def test_ddm_shape_for():
    assert ddm_shape_for("gau", 64, 48) == (64, 48)
    assert ddm_shape_for("avg_pool", 64, 48) == (64, 48)
    assert ddm_shape_for("wavelet", 64, 48) == (32, 24)


def test_batched_splat(rng):
    convnet = CONVNETS["FSD"]
    scores = rng.random((2, 16, 16)).astype(np.float32)
    out = np.asarray(ddm_splat(jnp.asarray(scores), 16, 16, convnet))
    for b in range(2):
        want = _brute_splat(scores[b].astype(np.float64), 16, 16, convnet)
        np.testing.assert_allclose(out[b], want, rtol=1e-4, atol=1e-5)
