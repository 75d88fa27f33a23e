"""Packed host->device transfer + single-readback metrics helpers."""

import jax
import jax.numpy as jnp
import numpy as np

from dasr_tpu.utils.transfer import device_put_packed, metrics_to_host


def test_device_put_packed_roundtrip():
    rng = np.random.default_rng(0)
    tree = {
        "a_f32": rng.random((2, 5, 7, 3)).astype(np.float32),
        "b_u8": rng.integers(0, 256, (3, 4, 4, 1), dtype=np.uint8),
        "c_scalarish": rng.random((6,)).astype(np.float32),
        "d_i32": rng.integers(-5, 5, (2, 3), dtype=np.int32),
    }
    out = device_put_packed(tree)
    np.testing.assert_array_equal(np.asarray(out["a_f32"]), tree["a_f32"])
    np.testing.assert_array_equal(
        np.asarray(out["b_u8"]), tree["b_u8"].astype(np.float32) / 255.0
    )
    assert out["b_u8"].dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(out["c_scalarish"]), tree["c_scalarish"])
    np.testing.assert_array_equal(np.asarray(out["d_i32"]), tree["d_i32"])
    assert out["d_i32"].dtype == jnp.int32


def test_device_put_packed_noncontiguous():
    base = np.arange(48, dtype=np.float32).reshape(6, 8)
    view = base[::2, 1:5]  # non-contiguous view
    out = device_put_packed({"v": view})
    np.testing.assert_array_equal(np.asarray(out["v"]), view)


def test_metrics_to_host_scalars_and_means():
    m = {
        "loss/a": jnp.float32(1.5),
        "loss/b": jnp.asarray(2.0, jnp.bfloat16),
    }
    host = metrics_to_host(m)
    assert host == {"loss/a": 1.5, "loss/b": 2.0}

    stacked = {
        "x": jnp.asarray([1.0, 3.0], jnp.float32),
        "y": jnp.asarray([10.0, 20.0], jnp.float32),
    }
    host = metrics_to_host(stacked, reduce_mean=True)
    assert host == {"x": 2.0, "y": 15.0}


def test_pipelined_order_and_lag():
    from dasr_tpu.utils.transfer import pipelined

    events = []

    def dispatch(i):
        events.append(("d", i))
        return i * 10

    out = []
    for item, res in pipelined(range(4), dispatch):
        events.append(("y", item))
        out.append((item, res))
    assert out == [(0, 0), (1, 10), (2, 20), (3, 30)]
    # item i is yielded only after item i+1 was dispatched (1-deep lag)
    assert events == [
        ("d", 0), ("d", 1), ("y", 0), ("d", 2), ("y", 1),
        ("d", 3), ("y", 2), ("y", 3),
    ]
    assert list(pipelined([], dispatch)) == []
    assert list(pipelined([7], lambda x: x)) == [(7, 7)]


def test_metrics_to_host_one_transfer(monkeypatch):
    """All values must come back in a single np.asarray call."""
    import dasr_tpu.utils.transfer as tr

    calls = {"n": 0}
    real = np.asarray

    def counting(x, *a, **k):
        if isinstance(x, jax.Array):
            calls["n"] += 1
        return real(x, *a, **k)

    monkeypatch.setattr(tr.np, "asarray", counting)
    m = {f"k{i}": jnp.float32(i) for i in range(9)}
    host = tr.metrics_to_host(m)
    assert len(host) == 9 and calls["n"] == 1
