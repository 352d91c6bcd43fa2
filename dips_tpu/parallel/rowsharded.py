"""Row-sharded single-stream processing: spatial parallelism over the mesh.

Data parallelism over streams (multistream.py) is the primary scaling axis,
but a single enormous stream (e.g. 8K/16K scientific captures) can also be
split *spatially*: each device owns a horizontal slab of every frame, and
the spatial median's stencil halo rows are exchanged between neighbouring
devices over ICI with ``jax.lax.ppermute`` before filtering — the sequence-
parallel analogue for this workload (frames have no sequence axis to split,
but they do have rows; SURVEY.md §2 calls every other axis N/A).

Everything else (temporal median, baseline capture, diff, emphasis, stats)
is row-local, so after the halo exchange each shard runs the standard
pipeline stages on its slab; per-frame statistics are reduced with ``psum``.

Semantics match ``ops/reference.batch_step`` exactly (same oracle) — tested
slab-for-slab against the single-device path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..properties import DiPsMethod, DiPsProperties, OutputMode
from ..ops import reference
from ..ops.networks import (quirk_window_select, separable_median,
                            window_median)


def _halo_exchange(slab: jnp.ndarray, p: int, axis: str) -> jnp.ndarray:
    """(..., Hs, W) -> (..., Hs + 2p, W): neighbours' boundary rows over ICI.

    The first shard's top halo and the last shard's bottom halo are zero
    (the pipeline's zero out-of-bounds stencil semantics).
    """
    n = lax.axis_size(axis)
    idx = lax.axis_index(axis)
    # send my bottom rows DOWN (to idx+1) -> they become his top halo
    down = [(i, (i + 1) % n) for i in range(n)]
    top_halo = lax.ppermute(slab[..., -p:, :], axis, down)
    # send my top rows UP (to idx-1) -> they become his bottom halo
    up = [(i, (i - 1) % n) for i in range(n)]
    bottom_halo = lax.ppermute(slab[..., :p, :], axis, up)
    zero = jnp.zeros_like(top_halo)
    top_halo = jnp.where(idx == 0, zero, top_halo)
    bottom_halo = jnp.where(idx == n - 1, zero, bottom_halo)
    return jnp.concatenate([top_halo, slab, bottom_halo], axis=-2)


def make_rowsharded_step(props: DiPsProperties, h: int, w: int, mesh: Mesh,
                         axis: str = "rows", backend: str = "xla",
                         slab_impl: str = "bands"):
    """Jitted single-stream step with the H axis sharded over ``mesh``.

    Maps raw u8 (T+B, 3, Hp, Wp), baseline (Hp, Wp) f32 (median modes) or
    (3, Hp, Wp) u8 (raw modes), flags (B,), heatmap (Hp, Wp), valid (B,)
    -> (out u8 (B, C, Hp, Wp), stats (B, NUM_STATS), new baseline, new
    heatmap); Hp must divide evenly by the mesh size.

    Median/emphasis modes exchange the spatial stencil's halo rows over
    ICI; RAW modes (absdiff/threshold/stats-only) have no stencil, so no
    halo at all — each shard diffs its slab independently and only the
    statistic reductions ride ICI (psum/pmax).  Row-sharding a raw mode
    is a BANDWIDTH play, not a stencil one: the absdiff kernel is
    HBM-DMA-bound (BASELINE.md roofline: ~55% of the v5e pin rate), so R
    row shards scale aggregate HBM bandwidth ~Rx for one enormous stream
    (the 8K-class deployment this module's docstring motivates).

    ``backend``: "xla" = the portable row-slab body; "pallas" = the fused
    slab kernels (median: the stacked kernel on owned-coordinate slabs
    with neighbour-band halo inputs, raw: the maskless integer kernel per
    slab; slabs must be 8-row aligned).  ``slab_impl`` (pallas median
    only): "bands" (default) / "extended" — see grid2d.make_grid_ring_step.
    """
    if slab_impl not in ("bands", "extended"):
        # validated for EVERY output mode (raw modes ignore the setting —
        # no stencil, no slabs to band — but a typo must still fail loudly)
        raise ValueError(f"unknown slab_impl {slab_impl!r}")
    raw_mode = props.output in (OutputMode.ABSDIFF, OutputMode.THRESHOLD,
                                OutputMode.STATS_ONLY)
    if raw_mode:
        return _make_rowsharded_raw_step(props, h, w, mesh, axis, backend)
    if backend == "pallas":
        from ..ops.reference import pad_geometry
        from .grid2d import slab_rows_ok
        hp = pad_geometry(h, w)[0]
        if not slab_rows_ok(hp, mesh.shape[axis]):
            raise ValueError(
                f"pallas row sharding needs 8-row-aligned slabs: padded "
                f"height {hp} / {mesh.shape[axis]} shards")

        def per_shard(raw, baseline, flags, heatmap, valid):
            from .grid2d import _pallas_slab_body, _pallas_slab_body_bands
            body = (_pallas_slab_body_bands if slab_impl == "bands"
                    else _pallas_slab_body)
            out, stats, nb, nh = body(
                props, h, w, raw[None], baseline[None], flags[None],
                heatmap[None], valid[None], axis)
            return out[0], stats[0], nb[0], nh[0]
    else:
        def per_shard(raw, baseline, flags, heatmap, valid):
            return _row_body(props, h, w, raw, baseline, flags, heatmap,
                             valid, axis)

    sharded = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(None, None, axis, None), P(axis, None), P(None),
                  P(axis, None), P(None)),
        out_specs=(P(None, None, axis, None), P(None), P(axis, None),
                   P(axis, None)),
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(1, 3))


def _raw_slab_bounds(props, h, w, hs: int, axis: str):
    """Shard-local roi row window [lo, hi) for a raw slab (no halo
    extension, so no offset — contrast grid2d._slab_row_bounds)."""
    row0 = lax.axis_index(axis) * hs
    y0, _, y1, _ = props.roi_bounds(h, w)
    lo = jnp.clip(jnp.int32(y0) - row0, 0, hs)
    hi = jnp.clip(jnp.int32(y1) - row0, 0, hs)
    return jnp.stack([lo, hi]).astype(jnp.int32)


def _raw_row_body(props, h, w, raw, baseline, flags, heatmap, valid, axis):
    """Portable XLA raw (absdiff/threshold/stats-only) slab body: integer
    diff on the owned rows, roi masking in GLOBAL row coordinates,
    statistics reduced over ``axis`` (psum/pmax).  Mirrors
    ops/reference.absdiff_step's conventions slab-locally."""
    t = props.temporal_size
    hs, wp = raw.shape[-2], raw.shape[-1]
    row0 = lax.axis_index(axis) * hs
    new = raw[t:]
    prev_raw = raw[t - 1:-1]
    if props.method == DiPsMethod.OVERALL:
        new_baseline, baselines = reference.capture_scan(baseline, new,
                                                         flags)
    else:
        new_baseline = baseline
        baselines = prev_raw

    signed = baselines.astype(jnp.int16) - new.astype(jnp.int16)
    d16 = jnp.abs(signed)
    d_u8 = d16.astype(jnp.uint8)
    dmax = jnp.max(d_u8, axis=1, keepdims=True)

    inv = jnp.float32(1.0 / (3 * props.analysis_pixels(h, w) * 255))
    sf = signed.astype(jnp.float32)
    af = d16.astype(jnp.float32)
    changed = (dmax[:, 0] >= jnp.uint8(props.change_threshold)
               ).astype(jnp.float32)
    if props.roi is not None:
        y0, x0, y1, x1 = props.roi_bounds(h, w)
        rows = lax.broadcasted_iota(jnp.int32, (hs, wp), 0) + row0
        cols = lax.broadcasted_iota(jnp.int32, (hs, wp), 1)
        rm = ((rows >= y0) & (rows < y1) & (cols >= x0)
              & (cols < x1)).astype(jnp.float32)
        sf = sf * rm
        af = af * rm
        changed = changed * rm
    stats = jnp.stack([
        lax.psum(jnp.sum(sf, axis=(1, 2, 3)), axis) * inv,
        lax.psum(jnp.sum(af, axis=(1, 2, 3)), axis) * inv,
        lax.pmax(jnp.max(af, axis=(1, 2, 3)), axis) * jnp.float32(1 / 255.),
        lax.psum(jnp.sum(changed, axis=(1, 2)), axis),
    ], axis=-1)
    vw = valid.astype(jnp.float32)[:, None, None]
    heatmap = heatmap + jnp.sum(
        jnp.sum(af, axis=1) * jnp.float32(1.0 / (3 * 255.0)) * vw, axis=0)

    if props.out_channels == 0:
        out = jnp.zeros((d_u8.shape[0], 0, hs, wp), jnp.uint8)
    elif props.output == OutputMode.THRESHOLD:
        out = jnp.where(dmax >= jnp.uint8(props.change_threshold),
                        jnp.uint8(255), jnp.uint8(0))
    else:
        out = d_u8
    return out, stats, new_baseline, heatmap


def _make_rowsharded_raw_step(props, h, w, mesh, axis, backend):
    """Raw-mode body of :func:`make_rowsharded_step` (no halo; the stats
    collectives are the only ICI traffic).  Baseline is u8 (3, Hp, Wp)."""
    from .grid2d import _combine_slab_stats, slab_rows_ok
    if backend == "pallas":
        from ..ops import pallas_fused
        hp = reference.pad_geometry(h, w)[0]
        if not slab_rows_ok(hp, mesh.shape[axis]):
            raise ValueError(
                f"pallas row sharding needs 8-row-aligned slabs: padded "
                f"height {hp} / {mesh.shape[axis]} shards")

        def per_shard(raw, baseline, flags, heatmap, valid):
            hs = raw.shape[-2]
            bounds = (None if props.roi is None
                      else _raw_slab_bounds(props, h, w, hs, axis))
            out, stats, nb, nh = pallas_fused._absdiff_step_impl(
                props, h, w, 1, raw, baseline, flags[None], heatmap,
                valid[None], row_bounds=bounds)
            return out, _combine_slab_stats(stats, axis)[0], nb, nh
    else:
        def per_shard(raw, baseline, flags, heatmap, valid):
            return _raw_row_body(props, h, w, raw, baseline, flags,
                                 heatmap, valid, axis)

    sharded = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(None, None, axis, None), P(None, axis, None), P(None),
                  P(axis, None), P(None)),
        out_specs=(P(None, None, axis, None), P(None), P(None, axis, None),
                   P(axis, None)),
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(1, 3))


def make_rowsharded_ring_step(props: DiPsProperties, h: int, w: int,
                              mesh: Mesh, axis: str = "rows",
                              slab_impl: str = "bands"):
    """Ring-carry twin of :func:`make_rowsharded_step` (Pallas body only):
    the filtered temporal ring, PER_FRAME previous plane, baseline and
    heatmap are carried device state sharded over ``axis``; the input is
    ONLY the B new frames (no tail re-upload, no tail re-filtering — the
    1-D ring protocol's T/(T+B) win on a row-sharded single stream).

    Median modes map raw u8 (B, 3, Hp, Wp), ring f32 (T, Hp, Wp),
    prev/baseline/heatmap f32 (Hp, Wp), flags/valid (B,), offset/seed i32
    scalars -> (out u8 (B, C, Hp, Wp), stats (B, NUM_STATS), new ring,
    new prev, new baseline, new heatmap) — DiPsEngine's ring-step
    signature with the row axis sharded.  RAW modes (no stencil, no ring
    array) instead map raw, prev u8 (3, Hp, Wp), baseline u8 (3, Hp, Wp),
    flags, heatmap, valid, seed -> (out, stats, new prev, new baseline,
    new heatmap) — absdiff_step_ring's signature.  Slabs must be 8-row
    aligned."""
    if props.output in (OutputMode.ABSDIFF, OutputMode.THRESHOLD,
                        OutputMode.STATS_ONLY):
        return _make_rowsharded_raw_ring_step(props, h, w, mesh, axis)
    from .grid2d import (_pallas_slab_body_ring,
                         _pallas_slab_body_ring_bands, slab_rows_ok)
    if slab_impl not in ("bands", "extended"):
        raise ValueError(f"unknown slab_impl {slab_impl!r}")
    hp = reference.pad_geometry(h, w)[0]
    if not slab_rows_ok(hp, mesh.shape[axis]):
        raise ValueError(
            f"pallas row sharding needs 8-row-aligned slabs: padded "
            f"height {hp} / {mesh.shape[axis]} shards")
    ring_body = (_pallas_slab_body_ring_bands if slab_impl == "bands"
                 else _pallas_slab_body_ring)

    def per_shard(raw, ring, prev, baseline, flags, heatmap, valid,
                  offset, seed):
        out, stats, nr, npv, nb, nh = ring_body(
            props, h, w, raw[None], ring[None], prev[None], baseline[None],
            flags[None], heatmap[None], valid[None], offset[None],
            seed[None], axis)
        return out[0], stats[0], nr[0], npv[0], nb[0], nh[0]

    sharded = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(None, None, axis, None),      # raw (B, 3, Hp, Wp)
                  P(None, axis, None),            # ring (T, Hp, Wp)
                  P(axis, None),                  # prev
                  P(axis, None),                  # baseline
                  P(None),                        # flags
                  P(axis, None),                  # heatmap
                  P(None),                        # valid
                  P(),                            # offset scalar
                  P()),                           # seed scalar
        out_specs=(P(None, None, axis, None), P(None),
                   P(None, axis, None), P(axis, None), P(axis, None),
                   P(axis, None)),
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(1, 2, 3, 5))


def _row_body(props, h, w, raw, baseline, flags, heatmap, valid, axis):
    """Single-stream row-slab pipeline body (shared with rowsharded.py's
    per_shard, factored for vmap over streams).

    Statistics here are reduced over ``axis`` only; the caller combines
    streams.
    """
    t = props.temporal_size
    window = props.window_size
    p = window // 2
    hs, wp = raw.shape[-2], raw.shape[-1]
    if hs < p:
        raise ValueError(f"row slab {hs} < halo {p}")
    row0 = lax.axis_index(axis) * hs

    planes = reference.intensity_planar(raw, props.chroma)
    if window > 1:
        ext = _halo_exchange(planes, p, axis)
        ext = jnp.pad(ext, [(0, 0), (0, 0), (p, p)])
        vtaps = [ext[:, dy:dy + hs, :] for dy in range(window)]

        def shift(x, dx):
            return x[..., p + dx:p + dx + wp]

        if props.quirk_compat:
            filtered = quirk_window_select(vtaps[:window - 1], shift,
                                           jnp.minimum, jnp.maximum)
        else:
            med = separable_median if props.approx_median else window_median
            filtered = med(vtaps, shift, jnp.minimum, jnp.maximum)
    else:
        filtered = planes
    if props.quirk_compat:
        # rgba8unorm store-back quantization before the temporal median
        # (see ops/reference.batch_step)
        filtered = jnp.float32(2.0) * jnp.rint(filtered * jnp.float32(0.5))
    cur_all = reference.temporal_median_windows(filtered, t)
    prev, cur = cur_all[:-1], cur_all[1:]

    if props.method == DiPsMethod.OVERALL:
        new_baseline, baselines = reference.capture_scan(baseline, cur, flags)
        raw_diff = (baselines - cur) * jnp.float32(reference.INTENSITY_SCALE)
    else:
        new_baseline = baseline
        raw_diff = (prev - cur) * jnp.float32(reference.INTENSITY_SCALE)

    rows = lax.broadcasted_iota(jnp.int32, (hs, wp), 0) + row0
    cols = lax.broadcasted_iota(jnp.int32, (hs, wp), 1)
    mask = ((rows < h) & (cols < w)).astype(jnp.float32)
    raw_diff = raw_diff * mask

    # statistics/heatmap reduce over the analysis region (roi bounds are
    # GLOBAL row coordinates — exactly what ``rows`` carries here); the
    # output path keeps the validity-masked full frame
    if props.roi is None:
        dm = raw_diff
    else:
        y0, x0, y1, x1 = props.roi_bounds(h, w)
        rm = ((rows >= y0) & (rows < y1) & (cols >= x0)
              & (cols < x1)).astype(jnp.float32)
        dm = raw_diff * rm
    a = jnp.abs(dm)
    thr = jnp.float32(props.change_threshold) / jnp.float32(255.0)
    inv_n = jnp.float32(1.0 / props.analysis_pixels(h, w))
    stats = jnp.stack([
        lax.psum(jnp.sum(dm, axis=(-2, -1)), axis) * inv_n,
        lax.psum(jnp.sum(a, axis=(-2, -1)), axis) * inv_n,
        lax.pmax(jnp.max(a, axis=(-2, -1)), axis),
        lax.psum(jnp.sum((a >= thr).astype(jnp.float32), axis=(-2, -1)),
                 axis),
    ], axis=-1)
    vw = valid.astype(jnp.float32)[:, None, None]
    heatmap = heatmap + jnp.sum(a * vw, axis=0)

    if props.out_channels == 0:
        # emit_maps=False: median-pipeline stats/heatmap, zero-channel maps
        out = jnp.zeros((raw_diff.shape[0], 0, hs, wp), jnp.uint8)
        return out, stats, new_baseline, heatmap
    d = reference.emphasize(raw_diff, props.filter,
                            props.sigmoid_horizontal_scalar,
                            props.sensitivity)
    out = reference.render_output(props, d, cur, flags)
    return out, stats, new_baseline, heatmap


def _make_rowsharded_raw_ring_step(props, h, w, mesh, axis):
    """Raw-mode ring body of :func:`make_rowsharded_ring_step`: the
    previous raw frame (PER_FRAME) and baseline are carried device state
    sharded over ``axis``; input = B new frames only, no halo (Pallas)."""
    from ..ops import pallas_fused
    from .grid2d import _combine_slab_stats, slab_rows_ok
    hp = reference.pad_geometry(h, w)[0]
    if not slab_rows_ok(hp, mesh.shape[axis]):
        raise ValueError(
            f"pallas row sharding needs 8-row-aligned slabs: padded "
            f"height {hp} / {mesh.shape[axis]} shards")

    def per_shard(raw, prev, baseline, flags, heatmap, valid, seed):
        hs = raw.shape[-2]
        bounds = (None if props.roi is None
                  else _raw_slab_bounds(props, h, w, hs, axis))
        out, stats, npv, nb, nh = pallas_fused._absdiff_step_impl(
            props, h, w, 1, raw, baseline, flags[None], heatmap,
            valid[None], prev=prev, seeds=seed[None], ring=True,
            row_bounds=bounds)
        return (out, _combine_slab_stats(stats, axis)[0], npv, nb, nh)

    sharded = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(None, None, axis, None),      # raw (B, 3, Hp, Wp)
                  P(None, axis, None),            # prev u8 (3, Hp, Wp)
                  P(None, axis, None),            # baseline u8 (3, Hp, Wp)
                  P(None),                        # flags
                  P(axis, None),                  # heatmap
                  P(None),                        # valid
                  P()),                           # seed scalar
        out_specs=(P(None, None, axis, None), P(None),
                   P(None, axis, None), P(None, axis, None),
                   P(axis, None)),
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(1, 2, 4))
