"""Device-resident image banks: the whole decoded corpus in HBM, crops on-chip.

Motivation (BENCH_NOTES r3 "the DSN stage attacked"; A/B vs the host
loader in BENCH_NOTES r4 "device-resident banks"): through the remote
tunnel the DSN train step is WIRE-bound, not compute-bound — at bs 8 /
crop 256 each step ships ~1.7 MB of crops at the tunnel's 25-35 MB/s
(~60-80 ms/step of blocking upload against a 35.8 ms bf16 device step),
and the rate swings with tunnel weather. The corpus itself is small: the
full AIM2019-scale Auto_Reproduce corpus is ~8 GB decoded uint8 vs the
v5e's 16 GB HBM. So: upload every decoded image ONCE at startup (padded
to the corpus max size, uint8), and run crop selection + flip/rot augment
+ the u8->f32 cast inside the jitted train step. Per-step wire traffic
drops to the dispatch RTT (the int32 index vector rides along with the
step call), and ``--steps_per_call`` scan windows amortize even that.

This replaces the reference's host-side data workers
(codes/DSN/data_loader.py:12-59 random crops + torchvision transforms)
with an in-step formulation of the SAME sampling distribution: uniform
random clean image per noisy index, uniform crop offsets over the valid
range, independent 50% hflip/vflip/transpose per image (matching
codes/SRN/data/util.py:116-128 augment semantics). The random stream is
jax PRNG instead of numpy, so individual draws differ from the host path
run-to-run — exactly as two host seeds differ; the per-draw law is
identical (tests/test_device_bank.py pins the crop/augment mechanics).

Memory note: images are padded to the per-bank max (h, w). On corpora
with uniform sizes (DIV2K-style) padding waste is ~0; ``bank_nbytes``
reports the padded footprint before any decode so callers can gate on a
budget and fall back to the host loader.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Sequence

import numpy as np

from dasr_tpu.data.io import list_images, read_img_u8


class ImageBank(NamedTuple):
    """A pytree: (N, Hmax, Wmax, 3) uint8 images + (N, 2) int32 true sizes."""

    data: "np.ndarray | object"
    sizes: "np.ndarray | object"


def bank_nbytes(dir_or_files) -> int:
    """Padded uint8 footprint of a bank WITHOUT decoding (PIL header reads)."""
    from PIL import Image

    files = (
        list_images(dir_or_files)
        if isinstance(dir_or_files, (str, os.PathLike))
        else list(dir_or_files)
    )
    hmax = wmax = 0
    for f in files:
        with Image.open(f) as im:
            w, h = im.size
        hmax, wmax = max(hmax, h), max(wmax, w)
    return len(files) * hmax * wmax * 3


def bank_min_hw(dir_or_files) -> tuple[int, int]:
    """Smallest (h, w) over the bank's images WITHOUT decoding (PIL header
    reads) — lets callers gate on crop-size fit before committing to the
    bank path (the host loader's _rand_crop silently truncates on images
    smaller than the crop; the bank path has no equivalent, so the CLI
    falls back to the host loader instead)."""
    from PIL import Image

    files = (
        list_images(dir_or_files)
        if isinstance(dir_or_files, (str, os.PathLike))
        else list(dir_or_files)
    )
    hmin = wmin = 1 << 30
    for f in files:
        with Image.open(f) as im:
            w, h = im.size
        hmin, wmin = min(hmin, h), min(wmin, w)
    return hmin, wmin


def build_bank(dir_or_files, min_size: int | None = None) -> ImageBank:
    """Decode every image (through the in-RAM decode cache if enabled) into
    one padded uint8 array. ``min_size`` guards that every image can serve
    a full crop (the reference assumes corpus images >= crop size).

    ``DASR_BANK_HOST_CACHE=<dir>`` persists the padded array to disk and
    mmap-loads it on the next build of the SAME file list (keyed by the
    sorted paths) — relaunching after a tunnel failure then skips the
    multi-minute decode, and the mmap halves host RAM (pages stream from
    disk during the upload)."""
    files = (
        list_images(dir_or_files)
        if isinstance(dir_or_files, (str, os.PathLike))
        else list(dir_or_files)
    )
    if not files:
        raise ValueError(f"device bank: no images under {dir_or_files!r}")

    cache_root = os.environ.get("DASR_BANK_HOST_CACHE")
    cdir = None
    if cache_root:
        import hashlib

        key = hashlib.sha1("\n".join(files).encode()).hexdigest()[:16]
        cdir = os.path.join(cache_root, key)
        if os.path.exists(os.path.join(cdir, "sizes.npy")):
            sizes = np.load(os.path.join(cdir, "sizes.npy"))
            if min_size is not None and (sizes < min_size).any():
                raise ValueError(
                    f"device bank: an image is smaller than the "
                    f"{min_size}px crop"
                )
            return ImageBank(
                data=np.load(os.path.join(cdir, "data.npy"), mmap_mode="r"),
                sizes=sizes,
            )

    imgs = [read_img_u8(f) for f in files]
    sizes = np.array([im.shape[:2] for im in imgs], np.int32)
    if min_size is not None and (sizes < min_size).any():
        bad = files[int(np.argmin(sizes.min(axis=1)))]
        raise ValueError(
            f"device bank: {bad} is smaller than the {min_size}px crop"
        )
    hmax, wmax = int(sizes[:, 0].max()), int(sizes[:, 1].max())
    data = np.zeros((len(imgs), hmax, wmax, 3), np.uint8)
    for i, im in enumerate(imgs):
        data[i, : im.shape[0], : im.shape[1]] = im
    if cdir:
        os.makedirs(cdir, exist_ok=True)
        np.save(os.path.join(cdir, "data.npy"), data)
        np.save(os.path.join(cdir, "sizes.npy"), sizes)
    return ImageBank(data=data, sizes=sizes)


def crop_offsets(key, hw, crop: int):
    """Uniform (top, left) over the valid range for one image — the in-step
    equivalent of datasets._rand_crop's rng.integers(0, dim - crop + 1)."""
    import jax
    import jax.numpy as jnp

    u = jax.random.uniform(key, (2,))
    span = (hw - crop + 1).astype(jnp.float32)
    return jnp.minimum((u * span).astype(jnp.int32), hw - crop)


def sample_crops(
    bank: ImageBank, idx, key, crop: int, flips: bool = False,
    rotations: bool = False,
):
    """(B,) image indices -> (B, crop, crop, 3) uint8 random crops."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def one(i, k):
        k_off, k_aug = jax.random.split(k)
        tl = crop_offsets(k_off, bank.sizes[i], crop)
        sl = lax.dynamic_slice(
            bank.data, (i, tl[0], tl[1], jnp.int32(0)), (1, crop, crop, 3)
        )[0]
        if flips or rotations:
            # flips=False/rotations=False sub-cases follow the host augment
            # (hflip gated by flips, vflip+transpose by rotations)
            do = jax.random.uniform(k_aug, (3,)) < 0.5
            if flips:
                sl = jnp.where(do[0], sl[:, ::-1, :], sl)
            if rotations:
                sl = jnp.where(do[1], sl[::-1, :, :], sl)
                sl = jnp.where(do[2], sl.transpose(1, 0, 2), sl)
        return sl

    keys = jax.random.split(key, idx.shape[0])
    # UNROLLED over the (static) batch dim, not vmap: B plain dynamic_slice
    # DMAs instead of one batched gather. (The r4 full-bank-copy hunt,
    # BENCH_NOTES "device-resident banks": the 5.8 ms/step copy was the
    # entry-layout mismatch fixed by make_banked_step below, not the
    # gather — but unrolled slices keep the lowering simple and were never
    # slower, so they stay.)
    return jnp.stack([one(idx[b], keys[b]) for b in range(idx.shape[0])])


def sample_dsn_batch(
    clean_bank: ImageBank, noisy_bank: ImageBank, noisy_idx, key,
    crop: int, scale: int, flips: bool = False, rotations: bool = False,
):
    """In-step replica of DSNTrainDataset.__getitem__ (datasets.py:365-382,
    reference codes/DSN/data_loader.py:12-59): each noisy index pairs with
    a UNIFORM-random clean image; independent random crops and augments.
    Returns {"input": (B,crop,crop,3) u8, "disc": (B,crop/scale,...,3) u8};
    the trainer's u8->f32/255 cast and in-step MATLAB bicubic (the
    "bicubic" key is absent) complete the batch."""
    import jax

    k_pick, k_clean, k_noisy = jax.random.split(key, 3)
    n_clean = clean_bank.data.shape[0]
    clean_idx = jax.random.randint(
        k_pick, noisy_idx.shape, 0, n_clean, dtype=noisy_idx.dtype
    )
    crop = crop - crop % scale
    return {
        "input": sample_crops(clean_bank, clean_idx, k_clean, crop, flips, rotations),
        "disc": sample_crops(
            noisy_bank, noisy_idx, k_noisy, crop // scale, flips, rotations
        ),
    }


def build_ddm_bank(ddm_files: Sequence[str], lr_sizes) -> ImageBank:
    """Decode + bilinear-resize every DDM to its fake-LR's full size (the
    host path resizes the FULL map before cropping — fake_w_dataset.py:66
    via data/io.resize_linear — so resizing at bank-build time, then
    cropping in-step, is order-identical), then pad into one (N, Hmax,
    Wmax, 1) float32 array. ``lr_sizes``: the fake-LR bank's (N, 2) int32
    true sizes."""
    from dasr_tpu.data.io import load_ddm, resize_linear

    lr_sizes = np.asarray(lr_sizes)
    if len(ddm_files) != lr_sizes.shape[0]:
        raise ValueError(
            f"device bank: {len(ddm_files)} DDMs vs {lr_sizes.shape[0]} fake LRs"
        )
    maps = [
        resize_linear(load_ddm(f), int(w), int(h))
        for f, (h, w) in zip(ddm_files, lr_sizes)
    ]
    hmax = int(max(m.shape[0] for m in maps))
    wmax = int(max(m.shape[1] for m in maps))
    data = np.zeros((len(maps), hmax, wmax, 1), np.float32)
    for i, m in enumerate(maps):
        data[i, : m.shape[0], : m.shape[1]] = m
    return ImageBank(data=data, sizes=lr_sizes.astype(np.int32))


def sample_dasr_batch(
    fake_bank: ImageBank, hr_bank: ImageBank, real_bank: ImageBank,
    ddm_bank: "ImageBank | None", fake_idx, key, hr_size: int, scale: int,
    use_flip: bool = True, use_rot: bool = True,
):
    """In-step replica of DASRUnpairedDataset.__getitem__'s train branch
    (datasets.py:175-224, reference codes/SRN/data/
    LRHR_wavelet_unpairEq_fake_w_dataset.py:95-140): per fake index i —

      * aligned (top, left) over the joint valid range of fake-LR i and its
        PAIRED HR i (``_rand_crop_aligned``: the x`scale` HR window must fit),
      * the DDM crop tracks the fake-LR crop exactly,
      * an independent uniform real-LR (random image + random crop),
      * an independent uniform unpaired HR (random image + random crop),
      * one JOINT dihedral augment per item applied to all five tensors
        (hflip gated by use_flip, vflip+transpose by use_rot — the host
        ``_augment`` draws once per item, not per tensor).

    Returns the f32 batch the SRN train step consumes: LR_fake/LR_real
    (B, lr, lr, 3), HR/HR_unpair (B, hr, hr, 3) in [0,1], fake_w
    (B, lr, lr, 1) f32 (ones when ``ddm_bank`` is None — the UnpairDataset
    law computes weights online; the trainer ignores fake_w then)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    lr_size = hr_size // scale
    n_hr = hr_bank.data.shape[0]
    n_real = real_bank.data.shape[0]

    def one(i, k):
        ks = jax.random.split(k, 6)
        # aligned fake-LR/HR offsets (datasets._rand_crop_aligned)
        lh, lw = fake_bank.sizes[i, 0], fake_bank.sizes[i, 1]
        hh, hw = hr_bank.sizes[i, 0], hr_bank.sizes[i, 1]
        span = jnp.maximum(
            jnp.minimum(
                jnp.stack([lh, lw]) - lr_size,
                (jnp.stack([hh, hw]) - lr_size * scale) // scale,
            ),
            0,
        )
        u = jax.random.uniform(ks[0], (2,))
        tl = jnp.minimum((u * (span + 1).astype(jnp.float32)).astype(jnp.int32), span)
        z = jnp.int32(0)
        lr_fake = lax.dynamic_slice(
            fake_bank.data, (i, tl[0], tl[1], z), (1, lr_size, lr_size, 3)
        )[0]
        hr = lax.dynamic_slice(
            hr_bank.data, (i, tl[0] * scale, tl[1] * scale, z),
            (1, hr_size, hr_size, 3),
        )[0]
        if ddm_bank is not None:
            fake_w = lax.dynamic_slice(
                ddm_bank.data, (i, tl[0], tl[1], z), (1, lr_size, lr_size, 1)
            )[0]
        else:
            fake_w = jnp.ones((lr_size, lr_size, 1), jnp.float32)
        # independent real-LR pick + crop
        r = jax.random.randint(ks[1], (), 0, n_real, dtype=jnp.int32)
        tl_r = crop_offsets(ks[2], real_bank.sizes[r], lr_size)
        lr_real = lax.dynamic_slice(
            real_bank.data, (r, tl_r[0], tl_r[1], z), (1, lr_size, lr_size, 3)
        )[0]
        # independent unpaired-HR pick + crop
        j = jax.random.randint(ks[3], (), 0, n_hr, dtype=jnp.int32)
        tl_u = crop_offsets(ks[4], hr_bank.sizes[j], hr_size)
        hr_unpair = lax.dynamic_slice(
            hr_bank.data, (j, tl_u[0], tl_u[1], z), (1, hr_size, hr_size, 3)
        )[0]
        # one joint dihedral draw for all five tensors (datasets._augment)
        do = jax.random.uniform(ks[5], (3,)) < 0.5

        def aug(x):
            if use_flip:
                x = jnp.where(do[0], x[:, ::-1, :], x)
            if use_rot:
                x = jnp.where(do[1], x[::-1, :, :], x)
                x = jnp.where(do[2], x.transpose(1, 0, 2), x)
            return x

        return tuple(aug(t) for t in (lr_fake, lr_real, hr, hr_unpair, fake_w))

    keys = jax.random.split(key, fake_idx.shape[0])
    # unrolled over the (static) batch dim — B*5 plain dynamic_slice DMAs
    # (see sample_crops above for why not vmap)
    parts = [one(fake_idx[b], keys[b]) for b in range(fake_idx.shape[0])]

    def stack(sel, as_f32_255=True):
        x = jnp.stack([p[sel] for p in parts])
        return x.astype(jnp.float32) / 255.0 if as_f32_255 else x

    return {
        "LR_fake": stack(0),
        "LR_real": stack(1),
        "HR": stack(2),
        "HR_unpair": stack(3),
        "fake_w": stack(4, as_f32_255=False),
    }


def _pinned_put(x, fmt, slab_bytes: int = 128 << 20):
    """``jax.device_put`` pinned to ``fmt``, robust to transfer paths that
    SILENTLY IGNORE the explicit layout for large buffers.

    Observed through the remote tunnel (r4): a ~200 MiB uint8 bank uploads
    in the requested (0, 3, 1, 2) layout, but the 1.66 GiB clean bank comes
    back in the size-dependent default (1, 3, 0, 2) — and the layout-pinned
    jit then refuses the arg at call time ("Layout passed to jit does not
    match the layout on the respective arg"). Small banks made this
    invisible: their default layout coincides with the pin.

    Strategy: small arrays go through one direct put (verified). Large
    arrays are built ON DEVICE slab-by-slab — each slab is small enough
    for its put to be honored, and a donated in-place
    ``dynamic_update_slice`` writes it into a zeros-initialised pinned
    buffer, so wire traffic stays 1x the bank and peak HBM is
    bank + one slab (never 2x the bank). The last slab re-uploads a few
    overlapping rows instead of compiling a second (remainder-shaped)
    update program. A mismatched slab put falls back to a slab-sized
    on-device relayout copy.

    PIN-DROP HAZARDS (r4/r5, all observed live): custom layouts on this
    backend are best-effort at EVERY layer, so every product here is
    verified and repaired instead of trusted —

      * ``jax.device_put`` silently drops explicit layouts for GiB-scale
        buffers (r4) and for some small shapes whose pin differs from the
        tiled default (r5: an int32 (N, 2) pin of (0, 1) comes back
        (1, 0)-tiled) — hence ``put_checked``;
      * a persistent-compilation-cache HIT can return an executable whose
        custom OUTPUT layout was dropped (the cache key does not
        distinguish custom layouts; reproduced in isolation r5), so the
        helper programs compile with the cache disabled — they are
        trivial, a few seconds per bank, once per run;
      * even a fresh-compiled pinned program's output can come back in
        the default layout NON-DETERMINISTICALLY (r5: the same stage-3
        upload crashed at 14:17 after succeeding at 14:01 on identical
        code) — hence ``repin`` verifies after EVERY step and relayouts
        on the spot (a full-bank relayout is ~320 GB/s device-side, ~20
        ms worst case, and only runs when a drop actually happened).
    """
    import contextlib

    import jax
    import jax.numpy as jnp
    from jax import lax

    @contextlib.contextmanager
    def no_persistent_cache():
        prev = jax.config.jax_enable_compilation_cache
        jax.config.update("jax_enable_compilation_cache", False)
        try:
            yield
        finally:
            jax.config.update("jax_enable_compilation_cache", prev)

    # NO donation on the relayout: a donated identity jit may ALIAS input
    # to output and keep the input's layout, overriding out_shardings.
    # Without donation XLA must materialize a new buffer in the requested
    # layout (transient 2x the buffer, slab-sized in practice).
    relayout = jax.jit(lambda v: v, out_shardings=fmt)

    def with_transient_retry(f, what):
        # remote-backend puts/compiles fail transiently through the tunnel
        # (generic INVALID_ARGUMENT "TPU backend error" observed between
        # two successful identical runs); retry with backoff before
        # declaring the upload dead
        import time

        for attempt in range(7):
            try:
                return f()
            except jax.errors.JaxRuntimeError as e:
                if attempt == 6:
                    raise
                wait = 10.0 * 2 ** attempt  # 10s .. 640s: outlast tunnel blips
                print(f"_pinned_put: transient backend error during {what} "
                      f"({e!s:.120}); retry in {wait:.0f}s", flush=True)
                time.sleep(wait)

    def repin(d, what):
        for _ in range(4):
            if d.format.layout.major_to_minor == fmt.layout.major_to_minor:
                return d
            with no_persistent_cache():
                d = with_transient_retry(lambda: relayout(d), f"{what} relayout")
        # BEST EFFORT, not fatal: the backend refuses the pin for this
        # buffer right now (observed non-deterministically on the remote
        # tunnel). The caller derives the step's entry format from the
        # ACTUAL uploaded array, so a dropped pin costs an in-program
        # relayout bridge (measurable via probe_srn_e2e --hlo_check), not
        # a crash.
        print(f"_pinned_put: {what} layout would not pin after retries "
              f"({d.format.layout.major_to_minor} != "
              f"{fmt.layout.major_to_minor}); continuing unpinned",
              flush=True)
        return d

    def put_checked(a):
        def attempt():
            try:
                return jax.device_put(a, fmt)
            except jax.errors.JaxRuntimeError:
                # pinned put rejected outright: take the default-layout
                # path and let repin relayout on device
                return jax.device_put(
                    a, fmt.sharding if hasattr(fmt, "sharding") else None
                )

        return repin(with_transient_retry(attempt, "slab put"), "device_put")

    # tunnel-weather knobs: DASR_BANK_SLAB_MB shrinks the per-put transfer,
    # DASR_BANK_THROTTLE_S sleeps between slabs — a degraded tunnel that
    # still serves isolated ~100 MB puts can collapse under a sustained
    # multi-GiB upload stream (r5, hours of INVALID_ARGUMENT mid-upload)
    env_mb = os.environ.get("DASR_BANK_SLAB_MB")
    if env_mb:
        slab_bytes = int(float(env_mb) * 2**20)
    throttle = float(os.environ.get("DASR_BANK_THROTTLE_S", "0") or 0)

    n = x.shape[0]
    per_img = int(np.prod(x.shape[1:])) * x.dtype.itemsize
    slab = max(1, min(n, slab_bytes // max(1, per_img)))
    if x.nbytes <= slab_bytes or slab >= n:
        return put_checked(x)

    zeros = (0,) * (x.ndim - 1)
    with no_persistent_cache():
        dst = jax.jit(
            lambda: jnp.zeros(x.shape, x.dtype), out_shardings=fmt
        )()
        dst = repin(dst, "zeros init")
        # the slab updater carries NO layout constraints: entries are
        # inferred from whatever layouts the backend actually granted (a
        # hard (fmt, fmt) pin here crashed the 15:22 run the moment the
        # zeros init came back unpinned), and jit recompiles on a layout
        # change mid-loop — bounded by the handful of distinct layouts in
        # play. Donation keeps peak HBM at bank + one slab.
        upd = jax.jit(
            lambda d, s, i: lax.dynamic_update_slice(d, s, (i,) + zeros),
            donate_argnums=0,
        )
        for i in range(0, n, slab):
            i = min(i, n - slab)  # overlap the tail: one update program
            dst = upd(dst, put_checked(x[i : i + slab]), np.int32(i))
            if throttle:
                dst.block_until_ready()
                import time as _time

                _time.sleep(throttle)
    # one best-effort repin of the finished bank (skipped when already
    # pinned; transient 2x this bank's bytes when it runs)
    return repin(dst, "final bank")


def make_banked_step(trainer, clean_h: ImageBank, noisy_h: ImageBank):
    """Upload both banks ONCE (layout-pinned) and return the banked step.

    Left alone this costs a COPY OF THE WHOLE BANK per dispatch (measured
    5.2 + 0.65 ms/step on the 1.87 GiB AIM2019-scale banks, ~320 GB/s;
    BENCH_NOTES r4 "device-resident banks"): ``jax.device_put``'s default
    layout for a large (N, H, W, 3) uint8 array is major_to_minor
    (1, 3, 0, 2) — shape-dependent! small arrays get (0, 3, 1, 2) — while
    the step's dynamic-slice fusions consume (0, 3, 1, 2) (channel-planar
    per image), and XLA keeps the mismatched layout as the parameter's
    entry layout and bridges with an in-program relayout copy every call.
    The fix pins BOTH sides to the consumer layout: the banks are
    uploaded in an explicit Format((0, 3, 1, 2)) — via ``_pinned_put``,
    because a plain device_put's explicit layout is silently dropped for
    GiB-scale buffers through the tunnel — and the jit's entry format for
    the bank args is pinned to the same Format via ``in_shardings``:
    entry == upload == consumer, and the compiled HLO carries zero
    bank-sized copies (verified against the lowered text).

    Returns ``(step, clean_dev, noisy_dev)`` where
    ``step(state, idx, seed, crop, flips, rotations, do_g, do_d)``
    matches ``DSNTrainer.train_banked_step`` semantics. Single-device
    only — the multi-chip CLI path replicates default-layout banks and
    eats the relayout (documented known cost).
    """
    import functools

    import jax
    from jax.experimental.layout import Format, Layout

    dev = jax.devices()[0]
    sharding = jax.sharding.SingleDeviceSharding(dev)
    fmt4 = Format(Layout(major_to_minor=(0, 3, 1, 2)), sharding)
    # only the GiB-scale data arrays are layout-pinned. The KB-scale sizes
    # arrays ride device_put's default layout with an INFERRED jit entry:
    # pinning them buys nothing (a KB relayout is free) and device_put
    # pins are silently dropped for some shapes — an int32 (N, 2) pin of
    # (0, 1) comes back (1, 0)-tiled and the pinned jit then rejects the
    # arg (r5 stage-3 failure; see _pinned_put's cache note for the data
    # arrays' variant of the same disease).
    clean_dev = ImageBank(_pinned_put(clean_h.data, fmt4),
                          jax.device_put(clean_h.sizes, sharding))
    noisy_dev = ImageBank(_pinned_put(noisy_h.data, fmt4),
                          jax.device_put(noisy_h.sizes, sharding))
    # entry formats come from the ACTUAL uploaded arrays (entry == upload
    # by construction) — when every pin held this is exactly fmt4 and the
    # compiled HLO carries zero bank-sized copies; when the backend
    # refused a pin (best-effort _pinned_put) the step still compiles and
    # runs, paying only that bank's in-program relayout bridge
    in_sh = (
        None,  # state: inferred
        ImageBank(clean_dev.data.format, clean_dev.sizes.format),
        ImageBank(noisy_dev.data.format, noisy_dev.sizes.format),
        None, None, None,  # idx, seed, lpips: inferred
    )
    fn = functools.partial(trainer._train_banked.__wrapped__, trainer)
    jfn = jax.jit(fn, static_argnums=(6, 7, 8, 9, 10), in_shardings=in_sh)

    def step(state, idx, seed, crop, flips=False, rotations=False,
             do_g=True, do_d=True):
        # kwargs are not allowed alongside in_shardings -> positional
        return jfn(state, clean_dev, noisy_dev, idx, np.uint32(seed),
                   trainer.lpips_variables, crop, flips, rotations,
                   do_g, do_d)

    return step, clean_dev, noisy_dev


def make_banked_srn_step(trainer, fake_h: ImageBank, hr_h: ImageBank,
                         real_h: ImageBank, ddm_h: "ImageBank | None",
                         hr_size: int, use_flip: bool = True,
                         use_rot: bool = True):
    """SRN/DASR analog of ``make_banked_step``: upload the four stage-3
    banks ONCE (layout-pinned — same entry==upload==consumer pinning, see
    make_banked_step's docstring for the relayout-copy mechanism it kills)
    and return the banked window step.

    Returns ``(step, dev_banks)`` where ``step(state, fake_idx, seed,
    do_g, do_d)`` runs ``SRNTrainer._train_banked`` over a (K, B) int32
    fake-index window. Single-device only — the mesh path replicates
    default-layout banks (the facade handles that branch)."""
    import functools

    import jax
    from jax.experimental.layout import Format, Layout

    dev = jax.devices()[0]
    sharding = jax.sharding.SingleDeviceSharding(dev)
    fmt4 = Format(Layout(major_to_minor=(0, 3, 1, 2)), sharding)
    # sizes arrays: default layout + inferred entry (see make_banked_step)

    def put_bank(b):
        return ImageBank(_pinned_put(b.data, fmt4),
                         jax.device_put(b.sizes, sharding))

    fake_dev, hr_dev, real_dev = put_bank(fake_h), put_bank(hr_h), put_bank(real_h)
    ddm_dev = put_bank(ddm_h) if ddm_h is not None else None

    # entry formats from the ACTUAL uploaded arrays — entry == upload by
    # construction (see make_banked_step); a refused pin degrades to that
    # bank's in-program relayout bridge instead of a crash
    def bank_sh(b):
        return ImageBank(b.data.format, b.sizes.format)

    in_sh = (
        None,  # state: inferred
        bank_sh(fake_dev), bank_sh(hr_dev), bank_sh(real_dev),
        bank_sh(ddm_dev) if ddm_dev is not None else None,
        None, None, None,  # idx, seed, frozen: inferred
    )
    fn = functools.partial(trainer._train_banked.__wrapped__, trainer)
    jfn = jax.jit(fn, static_argnums=(8, 9, 10, 11, 12), in_shardings=in_sh)
    frozen = trainer._frozen()

    def step(state, fake_idx, seed, do_g=True, do_d=True):
        # kwargs are not allowed alongside in_shardings -> positional
        return jfn(state, fake_dev, hr_dev, real_dev, ddm_dev, fake_idx,
                   np.uint32(seed), frozen, hr_size, use_flip, use_rot,
                   do_g, do_d)

    # introspection hooks (tools/probe_srn_e2e.py --hlo_check lowers the
    # same program and scans the compiled text for bank-sized copies)
    step._jfn, step._frozen, step._hr_size = jfn, frozen, hr_size
    step._banks = (fake_dev, hr_dev, real_dev, ddm_dev)
    return step, step._banks
