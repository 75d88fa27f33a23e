"""Large-image tiled inference.

Two paths:

* ``tiled_apply`` — the TPU-native path. Pads the image to a tile grid,
  extracts overlapping fixed-size tiles (one static shape -> one XLA
  compilation), runs the model over the tile batch (optionally sharded over
  a mesh axis so tiles fan out across chips), discards halos, reassembles.
  This replaces the reference's recursive quadrant chopper whose every
  recursion level changes shapes (and would recompile under jit).

* ``forward_chop`` — exact-semantics replica of the reference's recursive
  4-quadrant chopper (reference: codes/SRN/utils/util.py:87-147) for parity
  testing: same shave/min_size splitting decisions and the same
  even-size output rounding. Host-side recursion; each distinct quadrant
  shape compiles once.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def forward_chop(
    img: jax.Array,
    scale: int,
    model: Callable[[jax.Array], jax.Array],
    shave: int = 20,
    min_size: int = 160000,
) -> jax.Array:
    """Reference-parity recursive quadrant inference on NHWC images."""
    b, h, w, c = img.shape
    if h <= 2 * shave or w <= 2 * shave:
        # too small to quadrant with this shave — run directly. (The
        # reference slices degenerate quads here and torch.cat crashes,
        # SRN/utils/util.py:87-147; crash fixed per policy, equal output
        # for all sizes the reference handles.)
        return model(img)
    top = slice(0, h // 2 + shave)
    bottom = slice(h - h // 2 - shave, h)
    left = slice(0, w // 2 + shave)
    right = slice(w - w // 2 - shave, w)
    quads = [
        img[:, top, left, :],
        img[:, top, right, :],
        img[:, bottom, left, :],
        img[:, bottom, right, :],
    ]

    if h * w < 4 * min_size:
        batched = jnp.concatenate(quads, axis=0)
        out = model(batched)
        y_quads = [out[i * b : (i + 1) * b] for i in range(4)]
    else:
        y_quads = [
            forward_chop(q, scale, model, shave=shave, min_size=min_size)
            for q in quads
        ]

    oh, ow = round(h * scale), round(w * scale)
    # even-size rounding quirk (reference: utils/util.py:127-128)
    if oh % 2 != 0:
        oh += 1
    if ow % 2 != 0:
        ow += 1
    top_o = slice(0, oh // 2)
    bottom_o = slice(oh - oh // 2, oh)
    bottom_r = slice(oh // 2 - oh, None)
    left_o = slice(0, ow // 2)
    right_o = slice(ow - ow // 2, ow)
    right_r = slice(ow // 2 - ow, None)

    cy = y_quads[0].shape[-1]
    y = jnp.zeros((b, oh, ow, cy), dtype=y_quads[0].dtype)
    y = y.at[:, top_o, left_o, :].set(y_quads[0][:, top_o, left_o, :])
    y = y.at[:, top_o, right_o, :].set(y_quads[1][:, top_o, right_r, :])
    y = y.at[:, bottom_o, left_o, :].set(y_quads[2][:, bottom_r, left_o, :])
    y = y.at[:, bottom_o, right_o, :].set(y_quads[3][:, bottom_r, right_r, :])
    return y


def _extract_tiles(img: jax.Array, tile: int, halo: int) -> jax.Array:
    """(B,H,W,C) -> (B*nt, tile+2*halo, tile+2*halo, C), H,W multiples of tile."""
    b, h, w, c = img.shape
    nh, nw = h // tile, w // tile
    padded = jnp.pad(
        img, ((0, 0), (halo, halo), (halo, halo), (0, 0)), mode="reflect"
    )
    t = tile + 2 * halo
    # gather overlapping windows: rows then cols, static strides
    row_starts = np.arange(nh) * tile
    col_starts = np.arange(nw) * tile
    tiles = [
        padded[:, rs : rs + t, cs : cs + t, :] for rs in row_starts for cs in col_starts
    ]
    return jnp.concatenate(tiles, axis=0)


def tiled_apply(
    img: jax.Array,
    model: Callable[[jax.Array], jax.Array],
    scale: float,
    tile: int = 256,
    halo: int = 20,
    mesh: Optional[Mesh] = None,
    axis: str = "data",
    out_channels: Optional[int] = None,
) -> jax.Array:
    """Run ``model`` (an x`scale` NHWC->NHWC net) over a large image by tiles.

    The image is reflect-padded to a tile grid; every tile carries a ``halo``
    overlap that is discarded from the outputs, so any model whose receptive
    influence is < halo produces seam-free results. With ``mesh`` the tile
    batch is sharded over ``axis`` (tiles padded to a multiple of the axis
    size) — the TPU-native replacement for forward_chop's DataParallel
    scatter (reference: codes/SRN/utils/util.py:105-113).

    ``scale`` may be fractional (e.g. 0.25 for the DSN HR->LR generator);
    ``tile*scale`` and ``halo*scale`` must be integers. The final output is
    cropped to (ceil(H*scale), ceil(W*scale)) — matching the composition of
    the net's own strided-conv ceils.
    """
    b, h, w, c = img.shape
    ph = (tile - h % tile) % tile
    pw = (tile - w % tile) % tile
    if ph or pw:
        img_p = jnp.pad(img, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
    else:
        img_p = img
    hp, wp = h + ph, w + pw
    nh, nw = hp // tile, wp // tile

    tiles = _extract_tiles(img_p, tile, halo)
    n_tiles = tiles.shape[0]

    pad_n = 0
    if mesh is not None:
        n_dev = mesh.shape[axis]
        pad_n = (n_dev - n_tiles % n_dev) % n_dev
        if pad_n:
            # wrap-repeat the tile batch (pad_n may exceed n_tiles when
            # there are fewer tiles than devices)
            reps = -(-(n_tiles + pad_n) // n_tiles)
            tiles = jnp.concatenate([tiles] * reps, axis=0)[: n_tiles + pad_n]
        tiles = jax.device_put(tiles, NamedSharding(mesh, P(axis)))

    out_tiles = model(tiles)
    if pad_n:
        out_tiles = out_tiles[:n_tiles]

    th = int(round(scale * halo))
    st = int(round(scale * tile))
    assert abs(th - scale * halo) < 1e-9 and abs(st - scale * tile) < 1e-9, (
        "tile*scale and halo*scale must be integers"
    )
    inner = out_tiles[:, th : th + st, th : th + st, :]
    co = inner.shape[-1] if out_channels is None else out_channels
    # reassemble: (nh*nw*b, st, st, c) -> (b, nh, nw, st, st, c) -> image
    grid = inner.reshape(nh, nw, b, st, st, co).transpose(2, 0, 3, 1, 4, 5)
    out = grid.reshape(b, nh * st, nw * st, co)
    return out[:, : math.ceil(scale * h), : math.ceil(scale * w), :]
