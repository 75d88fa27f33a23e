"""Host<->device transfer helpers tuned for high-latency links.

Through the remote-TPU tunnel every ``device_put`` and every scalar
readback pays ~30-60 ms of round-trip latency regardless of payload size
(measured — BENCH_NOTES.md "End-to-end training"); a training loop that
ships 5 arrays and reads 9 metric floats per step spends most of its wall
clock in RTTs. These helpers make each direction a single transfer.
On a local-PCIe TPU they are merely tidy; on any remote link they are the
difference between 85 and 184 imgs/s (measured).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def device_put_packed(
    tree: Dict[str, np.ndarray], u8_to_f32: bool = True
) -> Dict[str, jax.Array]:
    """Upload a dict of numpy arrays as ONE byte buffer, then slice /
    bitcast / reshape on device (async dispatches, cheap).

    uint8 leaves (the ``transfer_uint8`` wire form) are cast to f32/255 on
    device (pass ``u8_to_f32=False`` to keep them uint8); other dtypes are
    bitcast back from their bytes — bit-exact."""
    names = sorted(tree)
    bufs, metas, off = [], {}, 0
    for n in names:
        a = np.ascontiguousarray(tree[n])
        b = a.view(np.uint8).reshape(-1)
        metas[n] = (off, b.size, a.dtype, a.shape)
        bufs.append(b)
        off += b.size
    flat = jnp.asarray(np.concatenate(bufs))
    out = {}
    for n in names:
        o, sz, dt, shp = metas[n]
        piece = jax.lax.slice(flat, (o,), (o + sz,))
        if dt == np.uint8:
            out[n] = (
                piece.reshape(shp).astype(jnp.float32) / 255.0
                if u8_to_f32
                else piece.reshape(shp)
            )
        else:
            out[n] = jax.lax.bitcast_convert_type(
                piece.reshape(shp + (np.dtype(dt).itemsize,)), dt
            )
    return out


def pipelined(items, dispatch):
    """Software-pipeline a per-item device loop: yields ``(item, result)``
    one item LATE, so the caller's readback/host work for item i overlaps
    item i+1's device execution (each fence costs a round-trip on remote
    links). ``dispatch(item)`` should queue device work and return the
    un-fenced result.

        for item, sr_dev in pipelined(dataset, lambda d: model.test_async(d)):
            process(item, np.asarray(sr_dev))
    """
    inflight = None
    for item in items:
        res = dispatch(item)
        prev, inflight = inflight, (item, res)
        if prev is not None:
            yield prev
    if inflight is not None:
        yield inflight


_METRIC_REDUCERS: Dict = {}


def metrics_to_host(metrics, reduce_mean: bool = False) -> Dict[str, float]:
    """One jitted reduction + ONE host readback for a metrics dict
    (``float(v)`` per metric costs one round-trip each)."""
    names = tuple(sorted(metrics))
    key = (names, reduce_mean)
    if key not in _METRIC_REDUCERS:

        def reduce(m):
            vals = [m[n] for n in names]
            if reduce_mean:
                vals = [jnp.mean(v) for v in vals]
            return jnp.stack(
                [jnp.asarray(v, jnp.float32).reshape(()) for v in vals]
            )

        _METRIC_REDUCERS[key] = jax.jit(reduce)
    vals = np.asarray(_METRIC_REDUCERS[key](metrics))
    return {n: float(v) for n, v in zip(names, vals)}


def pad_pair_to_bucket(a, b, bucket: int):
    """Zero-pad an HWC pair up to the next multiple of ``bucket`` in H and W.

    Returns ``(a_pad, b_pad, h, w)`` — the shared input form of the masked
    (shape-bucketed) device metrics (ops/metrics.py): one compiled program
    per bucket shape, true sizes passed as dynamic scalars."""
    import numpy as np

    h, w = a.shape[0], a.shape[1]
    ph = (h + bucket - 1) // bucket * bucket
    pw = (w + bucket - 1) // bucket * bucket
    pa = np.zeros((ph, pw, a.shape[2]), a.dtype)
    pb = np.zeros_like(pa)
    pa[:h, :w], pb[:h, :w] = a, b
    return pa, pb, h, w
