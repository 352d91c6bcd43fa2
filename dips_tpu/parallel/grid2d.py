"""Composite 2-D mesh sharding: streams x rows.

Combines the two parallel axes on one ``Mesh((S, R), ("stream", "rows"))``:
each device owns a horizontal slab of one subset of streams.  Stencil halos
travel between row-neighbours via ppermute (as in rowsharded.py), per-frame
statistics reduce over the row axis, and the optional global scalar reduces
over both axes — all collectives ride ICI.

This is the deployment shape for "many huge streams": e.g. 16 chips as a
(4 streams x 4 slabs) grid.

MEDIAN modes run two shard bodies: the portable XLA body (``_row_body``,
any backend) and the fused Pallas stacked-slab body
(``backend="pallas"``): each shard halo-exchanges an 8-row band of the
raw input over ICI, folds its local streams' slabs along the row axis of
ONE stacked kernel instance (ops/pallas_fused.py stacked mode with a
dynamic mask row window) — by default in OWNED coordinates with thin
neighbour-band kernel inputs (``slab_impl="bands"``), or via the legacy
halo-EXTENDED construction.  Everything after the spatial median is
row-local, so owned rows are bit-identical to the full-height kernel.

RAW modes (absdiff/threshold/stats-only) have no stencil at all: no
halo, no bands — each device diffs its slab of its streams independently
(``stacked_raw_call``) and only the statistic reductions ride ICI.  This
is the no-map events fleet on a pod.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..properties import DiPsProperties, OutputMode
from .rowsharded import _row_body

#: rows added above AND below each slab for the Pallas body: one 8-row
#: block keeps every section 8-aligned and covers the widest stencil halo
#: (window 7 -> p = 3 <= 8)
_EXT = 8

#: each extended section is additionally zero-padded at the BOTTOM to a
#: multiple of this, so the kernel's row-block ladder (divisors of the
#: section height) keeps {8, 16, 24, 48} available.  Without it the
#: ladder can degenerate — 1080p/1 shard gives hse = 1096 = 8 x 137
#: (137 prime), forcing bh=8, measured 0.66x the full-height kernel's
#: rate; padded to 1104 the optimal bh=24 is available again.  The
#: padding rows sit BELOW the bottom halo band: no owned row ever reads
#: them (stencil reach p <= 3 < _EXT) and the mask window excludes them.
_SECTION_ROUND = 48


def _section_height(hs: int) -> int:
    """Padded extended-section height for a hs-row owned slab."""
    return -(-(hs + 2 * _EXT) // _SECTION_ROUND) * _SECTION_ROUND


def grid_mesh(n_streams_axis: int, n_rows_axis: int,
              devices=None) -> Mesh:
    """A (stream, rows) 2-D mesh over the first S*R devices."""
    if n_streams_axis < 1 or n_rows_axis < 1:
        # numpy reshape(-1, R) would silently reinterpret a negative axis
        # into a valid-looking (but wrong-topology) mesh
        raise ValueError(
            f"mesh axes must be >= 1, got {n_streams_axis}x{n_rows_axis}")
    if devices is None:
        devices = jax.devices()
    need = n_streams_axis * n_rows_axis
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(n_streams_axis, n_rows_axis)
    return Mesh(arr, ("stream", "rows"))


def _band_exchange_u8(slab: jnp.ndarray, axis: str):
    """(..., Hs, W) u8 -> (top (..., 8, W), bot (..., 8, W)): the 8-row
    bands adjacent to this shard's slab, fetched from the row-neighbours
    over ICI (zero at the global top/bottom edges — the pipeline's zero
    out-of-bounds stencil semantics)."""
    n = lax.axis_size(axis)
    idx = lax.axis_index(axis)
    # my bottom band DOWN (to idx+1) -> the rows above his slab
    down = [(i, (i + 1) % n) for i in range(n)]
    top = lax.ppermute(slab[..., -_EXT:, :], axis, down)
    # my top band UP (to idx-1) -> the rows below his slab
    up = [(i, (i - 1) % n) for i in range(n)]
    bot = lax.ppermute(slab[..., :_EXT, :], axis, up)
    zero = jnp.zeros_like(top)
    return (jnp.where(idx == 0, zero, top),
            jnp.where(idx == n - 1, zero, bot))


def _halo_extend_u8(slab: jnp.ndarray, axis: str) -> jnp.ndarray:
    """(..., Hs, W) u8 -> (..., Hs + 2*_EXT, W): the neighbour bands
    concatenated around the slab (the legacy "extended" construction)."""
    top, bot = _band_exchange_u8(slab, axis)
    return jnp.concatenate([top, slab, bot], axis=-2)


def _slab_row_bounds(props: DiPsProperties, h: int, w: int, hs: int,
                     axis: str, ext: int = _EXT) -> jnp.ndarray:
    """Section-local [lo, hi) mask row window for this shard's slab: the
    global roi/validity rows intersected with the owned range, shifted by
    the extension offset (0 in band mode — owned coordinates).  Traced
    (depends on the shard's row index)."""
    row0 = lax.axis_index(axis) * hs  # global index of first owned row
    y0, _, y1, _ = props.roi_bounds(h, w)  # global rows, clipped to h
    lo = jnp.clip(jnp.int32(y0) - row0, 0, hs) + ext
    hi = jnp.clip(jnp.int32(y1) - row0, 0, hs) + ext
    return jnp.stack([lo, hi]).astype(jnp.int32)


def _combine_slab_stats(stats: jnp.ndarray, axis: str) -> jnp.ndarray:
    """(s, B, 4) per-slab partials -> full-frame stats replicated on every
    rows shard (matching _row_body's in-body reduction convention): the
    mean/mean-abs/count partials are sums over owned rows only, the max a
    max over them."""
    return jnp.stack([
        lax.psum(stats[..., 0], axis),
        lax.psum(stats[..., 1], axis),
        lax.pmax(stats[..., 2], axis),
        lax.psum(stats[..., 3], axis),
    ], axis=-1)


def _pallas_slab_body(props, h, w, raw, baseline, flags, heatmap, valid,
                      axis):
    """Stacked Pallas shard body on halo-extended row slabs (tail
    protocol).  raw (S_l, T+B, 3, Hs, Wp) u8, baseline/heatmap
    (S_l, Hs, Wp) f32, flags/valid (S_l, B) -> (out (S_l, B, C, Hs, Wp),
    stats (S_l, B, 4) full-frame, new baseline, new heatmap)."""
    from ..ops import pallas_fused

    s_l, tb = raw.shape[0], raw.shape[1]
    hs, wp = raw.shape[-2], raw.shape[-1]
    hse = _section_height(hs)
    extra = hse - (hs + 2 * _EXT)     # bottom ladder padding (zeros)
    raw_e = _halo_extend_u8(raw, axis)
    raw_e = jnp.pad(raw_e, ((0, 0),) * 3 + ((0, extra), (0, 0)))
    # fold local streams' extended slabs along the row axis of ONE kernel
    raw_st = raw_e.transpose(1, 2, 0, 3, 4).reshape(tb, 3, s_l * hse, wp)
    zp = ((0, 0), (_EXT, _EXT + extra), (0, 0))
    bl_st = jnp.pad(baseline, zp).reshape(s_l * hse, wp)
    hm_st = jnp.pad(heatmap, zp).reshape(s_l * hse, wp)
    bounds = _slab_row_bounds(props, h, w, hs, axis)
    out, stats, nb, nh = pallas_fused._batch_step_impl(
        props, h, w, s_l, raw_st, bl_st, flags, hm_st, valid,
        row_bounds=bounds)
    b, c = out.shape[0], out.shape[1]
    out = (out.reshape(b, c, s_l, hse, wp)[..., _EXT:_EXT + hs, :]
           .transpose(2, 0, 1, 3, 4))
    nb = nb.reshape(s_l, hse, wp)[:, _EXT:_EXT + hs]
    nh = nh.reshape(s_l, hse, wp)[:, _EXT:_EXT + hs]
    return out, _combine_slab_stats(stats, axis), nb, nh


def _pallas_slab_body_bands(props, h, w, raw, baseline, flags, heatmap,
                            valid, axis):
    """Band-mode stacked Pallas shard body (tail protocol): raw, carried
    state and outputs all stay in OWNED slab coordinates.  Instead of
    halo-extending the input, the two 8-row neighbour bands ride ICI as
    separate thin kernel inputs that feed the stencil's boundary taps
    (ops/pallas_fused._filtered_plane), so the extended-input copy, the
    state pads and the owned-row output slice all vanish — the slab
    kernel's data movement is exactly the full-height kernel's plus
    8/Hs of band traffic.  Owned rows are bit-identical to the
    full-height kernel (same taps, same order).

    raw (S_l, T+B, 3, Hs, Wp) u8, baseline/heatmap (S_l, Hs, Wp) f32,
    flags/valid (S_l, B) -> (out (S_l, B, C, Hs, Wp), stats (S_l, B, 4)
    full-frame, new baseline, new heatmap)."""
    from ..ops import pallas_fused

    s_l, tb = raw.shape[0], raw.shape[1]
    hs, wp = raw.shape[-2], raw.shape[-1]
    raw_st = raw.transpose(1, 2, 0, 3, 4).reshape(tb, 3, s_l * hs, wp)
    bands = None
    if props.window_size > 1:
        top, bot = _band_exchange_u8(raw, axis)    # (S_l, T+B, 3, 8, Wp)
        bands = (top.transpose(1, 2, 0, 3, 4).reshape(tb, 3, s_l * 8, wp),
                 bot.transpose(1, 2, 0, 3, 4).reshape(tb, 3, s_l * 8, wp))
    bl_st = baseline.reshape(s_l * hs, wp)
    hm_st = heatmap.reshape(s_l * hs, wp)
    bounds = _slab_row_bounds(props, h, w, hs, axis, ext=0)
    out, stats, nb, nh = pallas_fused._batch_step_impl(
        props, h, w, s_l, raw_st, bl_st, flags, hm_st, valid,
        row_bounds=bounds, bands=bands)
    b, c = out.shape[0], out.shape[1]
    out = out.reshape(b, c, s_l, hs, wp).transpose(2, 0, 1, 3, 4)
    return (out, _combine_slab_stats(stats, axis),
            nb.reshape(s_l, hs, wp), nh.reshape(s_l, hs, wp))


def _pallas_slab_body_ring_bands(props, h, w, raw, ring, prev, baseline,
                                 flags, heatmap, valid, offsets, seeds,
                                 axis):
    """Band-mode ring-carry stacked Pallas shard body: the ring twin of
    :func:`_pallas_slab_body_bands` — B new frames in, carried
    ring/prev/baseline/heatmap state in OWNED slab coordinates throughout
    (no pad/slice round trips at all; only the two 8-row raw bands ride
    ICI per batch).

    raw (S_l, B, 3, Hs, Wp) u8; ring (S_l, T, Hs, Wp),
    prev/baseline/heatmap (S_l, Hs, Wp) f32; flags/valid (S_l, B);
    offsets/seeds (S_l,) -> (out (S_l, B, C, Hs, Wp), stats (S_l, B, 4)
    full-frame, new ring, new prev, new baseline, new heatmap)."""
    from ..ops import pallas_fused

    s_l, b = raw.shape[0], raw.shape[1]
    t = ring.shape[1]
    hs, wp = raw.shape[-2], raw.shape[-1]
    raw_st = raw.transpose(1, 2, 0, 3, 4).reshape(b, 3, s_l * hs, wp)
    bands = None
    if props.window_size > 1:
        top, bot = _band_exchange_u8(raw, axis)      # (S_l, B, 3, 8, Wp)
        bands = (top.transpose(1, 2, 0, 3, 4).reshape(b, 3, s_l * 8, wp),
                 bot.transpose(1, 2, 0, 3, 4).reshape(b, 3, s_l * 8, wp))
    ring_st = ring.transpose(1, 0, 2, 3).reshape(t, s_l * hs, wp)
    pv_st = prev.reshape(s_l * hs, wp)
    bl_st = baseline.reshape(s_l * hs, wp)
    hm_st = heatmap.reshape(s_l * hs, wp)
    bounds = _slab_row_bounds(props, h, w, hs, axis, ext=0)
    out, stats, nr, npv, nb, nh = pallas_fused._batch_step_ring_impl(
        props, h, w, s_l, raw_st, ring_st, pv_st, bl_st, flags, hm_st,
        valid, offsets, seeds, row_bounds=bounds, bands=bands)
    c = out.shape[1]
    out = out.reshape(b, c, s_l, hs, wp).transpose(2, 0, 1, 3, 4)
    nr = nr.reshape(t, s_l, hs, wp).transpose(1, 0, 2, 3)
    return (out, _combine_slab_stats(stats, axis), nr,
            npv.reshape(s_l, hs, wp), nb.reshape(s_l, hs, wp),
            nh.reshape(s_l, hs, wp))


def _pallas_slab_body_ring(props, h, w, raw, ring, prev, baseline, flags,
                           heatmap, valid, offsets, seeds, axis):
    """Ring-carry stacked Pallas shard body on halo-extended row slabs.

    raw (S_l, B, 3, Hs, Wp) u8 — ONLY the B new frames (no tail upload);
    ring (S_l, T, Hs, Wp), prev/baseline/heatmap (S_l, Hs, Wp) f32 carried
    device state in OWNED-slab coordinates; flags/valid (S_l, B),
    offsets/seeds (S_l,) -> (out (S_l, B, C, Hs, Wp), stats (S_l, B, 4)
    full-frame, new ring, new prev, new baseline, new heatmap).

    Carried state stays in owned coordinates across batches: everything
    after the spatial filter is row-local (ops/pallas_fused.py slab-mode
    contract), so the _EXT extension rows' carried values are inert
    garbage — they are zero-padded in and sliced off every batch, which
    keeps host state shapes identical to the 1-D-mesh ring step (same
    reset/checkpoint/heatmap plumbing).  Only the RAW input needs real
    neighbour rows, exchanged per batch over ICI."""
    from ..ops import pallas_fused

    s_l, b = raw.shape[0], raw.shape[1]
    t = ring.shape[1]
    hs, wp = raw.shape[-2], raw.shape[-1]
    hse = _section_height(hs)
    extra = hse - (hs + 2 * _EXT)     # bottom ladder padding (zeros)
    raw_e = _halo_extend_u8(raw, axis)             # (S_l, B, 3, Hse, Wp)
    raw_e = jnp.pad(raw_e, ((0, 0),) * 3 + ((0, extra), (0, 0)))
    raw_st = raw_e.transpose(1, 2, 0, 3, 4).reshape(b, 3, s_l * hse, wp)
    zp = ((0, 0), (_EXT, _EXT + extra), (0, 0))
    ring_st = (jnp.pad(ring, ((0, 0),) + zp)
               .transpose(1, 0, 2, 3).reshape(t, s_l * hse, wp))
    pv_st = jnp.pad(prev, zp).reshape(s_l * hse, wp)
    bl_st = jnp.pad(baseline, zp).reshape(s_l * hse, wp)
    hm_st = jnp.pad(heatmap, zp).reshape(s_l * hse, wp)
    bounds = _slab_row_bounds(props, h, w, hs, axis)
    out, stats, nr, npv, nb, nh = pallas_fused._batch_step_ring_impl(
        props, h, w, s_l, raw_st, ring_st, pv_st, bl_st, flags, hm_st,
        valid, offsets, seeds, row_bounds=bounds)
    c = out.shape[1]
    own = slice(_EXT, _EXT + hs)
    out = (out.reshape(b, c, s_l, hse, wp)[..., own, :]
           .transpose(2, 0, 1, 3, 4))
    nr = nr.reshape(t, s_l, hse, wp)[..., own, :].transpose(1, 0, 2, 3)
    npv = npv.reshape(s_l, hse, wp)[:, own]
    nb = nb.reshape(s_l, hse, wp)[:, own]
    nh = nh.reshape(s_l, hse, wp)[:, own]
    return out, _combine_slab_stats(stats, axis), nr, npv, nb, nh


def stacked_raw_call(props, h, w, raw, baseline, flags, heatmap, valid,
                     prev=None, seeds=None, ring=False, row_bounds=None):
    """Stack per-stream/per-section arrays (leading axis S_l) along the
    row axis of ONE raw kernel instance and unstack the results — the
    ONE body behind every sharded raw path: the 1-D stream shards
    (multistream.make_sharded_step/_ring_step) pass no ``row_bounds``,
    the 2-D grid bodies below pass slab-local roi bounds.  Tail
    protocol: raw (S_l, T+B, 3, Hs, Wp) -> (out, stats, new baseline,
    new heatmap); ``ring``: raw covers only the B new frames, prev/seeds
    are carried state -> (out, stats, new prev, new baseline, new
    heatmap).  Returned stats (S_l, B, 4) are per-section partials, NOT
    reduced over any mesh axis."""
    from ..ops import pallas_fused

    s_l, nf = raw.shape[0], raw.shape[1]
    hs, wp = raw.shape[-2], raw.shape[-1]
    raw_st = raw.transpose(1, 2, 0, 3, 4).reshape(nf, 3, s_l * hs, wp)
    bl_st = baseline.transpose(1, 0, 2, 3).reshape(3, s_l * hs, wp)
    hm_st = heatmap.reshape(s_l * hs, wp)
    if ring:
        pv_st = prev.transpose(1, 0, 2, 3).reshape(3, s_l * hs, wp)
        out, stats, npv, nb, nh = pallas_fused._absdiff_step_impl(
            props, h, w, s_l, raw_st, bl_st, flags, hm_st, valid,
            prev=pv_st, seeds=seeds, ring=True, row_bounds=row_bounds)
    else:
        npv = None
        out, stats, nb, nh = pallas_fused._absdiff_step_impl(
            props, h, w, s_l, raw_st, bl_st, flags, hm_st, valid,
            row_bounds=row_bounds)
    b, c = out.shape[0], out.shape[1]
    out = out.reshape(b, c, s_l, hs, wp).transpose(2, 0, 1, 3, 4)
    nb = nb.reshape(3, s_l, hs, wp).transpose(1, 0, 2, 3)
    nh = nh.reshape(s_l, hs, wp)
    if ring:
        npv = npv.reshape(3, s_l, hs, wp).transpose(1, 0, 2, 3)
        return out, stats, npv, nb, nh
    return out, stats, nb, nh


def _raw_grid_bounds(props, h, w, hs, axis):
    from .rowsharded import _raw_slab_bounds
    return (None if props.roi is None
            else _raw_slab_bounds(props, h, w, hs, axis))


def _pallas_raw_grid_body(props, h, w, raw, baseline, flags, heatmap,
                          valid, axis):
    """Stacked raw (absdiff/threshold/stats-only) shard body, tail
    protocol.  Raw modes have NO stencil (the diff is pixel-local,
    /root/reference/dips/src/gpu/shaders/dips_shader.wgsl:213-236 is pure
    elementwise), so there is no halo, no bands, no extended construction:
    slabs live in owned coordinates and the only ICI traffic is the
    statistic reductions — row-sharding a raw fleet is a pure
    HBM-bandwidth play (see parallel/rowsharded.py).

    raw (S_l, T+B, 3, Hs, Wp) u8, baseline (S_l, 3, Hs, Wp) u8,
    heatmap (S_l, Hs, Wp) f32, flags/valid (S_l, B) ->
    (out (S_l, B, C, Hs, Wp) u8, stats (S_l, B, 4) full-frame, new
    baseline, new heatmap)."""
    out, stats, nb, nh = stacked_raw_call(
        props, h, w, raw, baseline, flags, heatmap, valid,
        row_bounds=_raw_grid_bounds(props, h, w, raw.shape[-2], axis))
    return out, _combine_slab_stats(stats, axis), nb, nh


def _pallas_raw_grid_body_ring(props, h, w, raw, prev, baseline, flags,
                               heatmap, valid, seeds, axis):
    """Ring-protocol twin of :func:`_pallas_raw_grid_body`: PER_FRAME's
    previous raw frame and the baseline are carried device state in owned
    slab coordinates; the input is ONLY the B new frames (no tail
    upload — raw modes' ring protocol has no ring array at all).

    raw (S_l, B, 3, Hs, Wp) u8; prev/baseline (S_l, 3, Hs, Wp) u8;
    flags/valid (S_l, B); heatmap (S_l, Hs, Wp) f32; seeds (S_l,) ->
    (out, stats (S_l, B, 4) full-frame, new prev, new baseline, new
    heatmap)."""
    out, stats, npv, nb, nh = stacked_raw_call(
        props, h, w, raw, baseline, flags, heatmap, valid, prev=prev,
        seeds=seeds, ring=True,
        row_bounds=_raw_grid_bounds(props, h, w, raw.shape[-2], axis))
    return out, _combine_slab_stats(stats, axis), npv, nb, nh


def _grid_gmean(stats, valid):
    """Valid-slot-masked global mean |diff| over BOTH mesh axes.  Stats
    are full-frame values replicated on every rows shard (the bodies
    reduce over "rows" internally), so the extra "rows" psum cancels
    between total and count."""
    vw = valid.astype(jnp.float32)
    total = lax.psum(lax.psum(jnp.sum(stats[..., 1] * vw), "rows"),
                     "stream")
    count = lax.psum(lax.psum(jnp.sum(vw), "rows"), "stream")
    return total / jnp.maximum(count, 1.0)


def _check_slab_alignment(h: int, w: int, mesh: Mesh) -> None:
    from ..ops.reference import pad_geometry
    hp = pad_geometry(h, w)[0]
    rows_ax = mesh.shape["rows"]
    if not slab_rows_ok(hp, rows_ax):
        raise ValueError(
            f"pallas 2-D grid needs 8-row-aligned slabs: padded height "
            f"{hp} / {rows_ax} row shards = {hp / rows_ax} rows")


def _make_grid_raw_step(props: DiPsProperties, h: int, w: int, mesh: Mesh,
                        backend: str):
    """Raw-mode (absdiff/threshold/stats-only) body of
    :func:`make_grid_step`: same signature, u8 (S, 3, Hp, Wp) baseline.
    This is the headline fleet-on-a-pod shape (many huge cameras in a
    no-map events fleet, BASELINE.md) when stream count alone cannot use
    all chips: S stream shards x R row slabs, no halo at all."""
    if backend == "pallas":
        _check_slab_alignment(h, w, mesh)

        def per_shard(raw, baseline, flags, heatmap, valid):
            out, stats, nb, nh = _pallas_raw_grid_body(
                props, h, w, raw, baseline, flags, heatmap, valid, "rows")
            return out, stats, nb, nh, _grid_gmean(stats, valid)
    else:
        from .rowsharded import _raw_row_body

        def per_shard(raw, baseline, flags, heatmap, valid):
            def one_stream(r, bl, fl, hm, vd):
                return _raw_row_body(props, h, w, r, bl, fl, hm, vd,
                                     "rows")
            out, stats, nb, nh = jax.vmap(one_stream)(
                raw, baseline, flags, heatmap, valid)
            return out, stats, nb, nh, _grid_gmean(stats, valid)

    sharded = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P("stream", None, None, "rows", None),   # raw
                  P("stream", None, "rows", None),         # baseline u8
                  P("stream"),                             # flags
                  P("stream", "rows", None),               # heatmap
                  P("stream")),                            # valid
        out_specs=(P("stream", None, None, "rows", None),  # out
                   P("stream", None, None),                # stats (row-dup)
                   P("stream", None, "rows", None),        # baseline
                   P("stream", "rows", None),              # heatmap
                   P()),                                   # global scalar
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(1, 3))


def _make_grid_raw_ring_step(props: DiPsProperties, h: int, w: int,
                             mesh: Mesh):
    """Raw-mode ring body of :func:`make_grid_ring_step`:
    multistream.make_sharded_ring_step's raw signature with the row axis
    additionally sharded — raw (S, B, 3, Hp, Wp), prev/baseline u8
    (S, 3, Hp, Wp), flags/valid (S, B), heatmap (S, Hp, Wp), seeds (S,)
    -> (out, stats, new prev, new baseline, new heatmap, gmean)."""
    _check_slab_alignment(h, w, mesh)

    def per_shard(raw, prev, baseline, flags, heatmap, valid, seeds):
        out, stats, npv, nb, nh = _pallas_raw_grid_body_ring(
            props, h, w, raw, prev, baseline, flags, heatmap, valid,
            seeds, "rows")
        return out, stats, npv, nb, nh, _grid_gmean(stats, valid)

    sharded = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P("stream", None, None, "rows", None),   # raw
                  P("stream", None, "rows", None),         # prev u8
                  P("stream", None, "rows", None),         # baseline u8
                  P("stream"),                             # flags
                  P("stream", "rows", None),               # heatmap
                  P("stream"),                             # valid
                  P("stream")),                            # seeds
        out_specs=(P("stream", None, None, "rows", None),  # out
                   P("stream", None, None),                # stats (row-dup)
                   P("stream", None, "rows", None),        # prev
                   P("stream", None, "rows", None),        # baseline
                   P("stream", "rows", None),              # heatmap
                   P()),                                   # global scalar
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(1, 2, 4))


def make_grid_ring_step(props: DiPsProperties, h: int, w: int, mesh: Mesh,
                        slab_impl: str = "bands"):
    """Ring-carry twin of :func:`make_grid_step` (Pallas body only).

    Same call signature as multistream.make_sharded_ring_step's median
    path — raw (S, B, 3, Hp, Wp), ring (S, T, Hp, Wp), prev/baseline/
    heatmap (S, Hp, Wp), flags/valid (S, B), offsets/seeds (S,) ->
    (out, stats, new ring, new prev, new baseline, new heatmap, global
    scalar) — so ``MultiStreamEngine.process_batch`` and checkpoint
    rebuild use it unchanged; only the mesh layout differs (each device
    owns a horizontal slab of a subset of streams, raw-input halos ride
    ICI per batch).  No tail re-upload, no tail re-filtering: the 1-D
    ring protocol's T/(T+B) win now applies to the 2-D grid.

    RAW modes route to :func:`_make_grid_raw_ring_step` (the 1-D raw
    ring signature — prev/baseline u8 (S, 3, Hp, Wp) carried state,
    seeds, no ring array — with the row axis additionally sharded; no
    halo, ``slab_impl`` is irrelevant).

    ``slab_impl``: "bands" (default) feeds the stencil's slab-boundary
    taps from two thin 8-row neighbour-band kernel inputs — raw, carried
    state and outputs stay in OWNED coordinates, eliminating the
    extended construction's ~1 GB/batch of copy traffic (measured +42%
    at 1080p (1x1), BASELINE.md); "extended" keeps the round-3/4
    halo-extended construction (same bit-exact results — see
    docs/DESIGN.md "Slab bands" for why bands wins even on degenerate
    owned-height ladders)."""
    if slab_impl not in ("bands", "extended"):
        raise ValueError(f"unknown slab_impl {slab_impl!r}")
    if props.output in (OutputMode.ABSDIFF, OutputMode.THRESHOLD,
                        OutputMode.STATS_ONLY):
        # raw modes: no stencil, no ring array — their own body/signature
        return _make_grid_raw_ring_step(props, h, w, mesh)
    _check_slab_alignment(h, w, mesh)
    ring_body = (_pallas_slab_body_ring_bands if slab_impl == "bands"
                 else _pallas_slab_body_ring)

    def per_shard(raw, ring, prev, baseline, flags, heatmap, valid,
                  offsets, seeds):
        out, stats, nr, npv, nb, nh = ring_body(
            props, h, w, raw, ring, prev, baseline, flags, heatmap, valid,
            offsets, seeds, "rows")
        return out, stats, nr, npv, nb, nh, _grid_gmean(stats, valid)

    sharded = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P("stream", None, None, "rows", None),   # raw
                  P("stream", None, "rows", None),         # ring
                  P("stream", "rows", None),               # prev
                  P("stream", "rows", None),               # baseline
                  P("stream"),                             # flags
                  P("stream", "rows", None),               # heatmap
                  P("stream"),                             # valid
                  P("stream"),                             # offsets
                  P("stream")),                            # seeds
        out_specs=(P("stream", None, None, "rows", None),  # out
                   P("stream", None, None),                # stats (row-dup)
                   P("stream", None, "rows", None),        # ring
                   P("stream", "rows", None),              # prev
                   P("stream", "rows", None),              # baseline
                   P("stream", "rows", None),              # heatmap
                   P()),                                   # global scalar
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(1, 2, 3, 5))


def slab_rows_ok(hp: int, rows_ax: int) -> bool:
    """True when the Pallas slab body can run: every slab 8-row aligned."""
    return hp % (8 * rows_ax) == 0


def make_grid_step(props: DiPsProperties, h: int, w: int, mesh: Mesh,
                   backend: str = "xla", slab_impl: str = "bands"):
    """Jitted step over a ("stream", "rows") mesh.

    Maps raw u8 (S, T+B, 3, Hp, Wp), baseline (S, Hp, Wp), flags (S, B),
    heatmap (S, Hp, Wp), valid (S, B) -> (out (S, B, C, Hp, Wp),
    stats (S, B, NUM_STATS), new baseline, new heatmap, global scalar).
    S must divide by the stream axis, Hp by the rows axis.

    RAW modes (absdiff/threshold/stats-only) carry a u8 (S, 3, Hp, Wp)
    baseline and need no halo at all (no stencil): each device diffs its
    slab of its streams independently and only the statistic reductions
    ride ICI (:func:`_make_grid_raw_step`) — the fleet-on-a-pod shape
    for many huge no-map cameras.

    ``backend``: "xla" = the portable vmap'd row-slab body; "pallas" = the
    fused stacked kernel on row slabs (TPU; slabs must be 8-row aligned —
    ``slab_rows_ok``).  ``slab_impl`` (pallas only): "bands" (default) =
    owned-coordinate slabs with thin neighbour-band halo inputs;
    "extended" = the legacy halo-extended construction (see
    :func:`make_grid_ring_step`).
    """
    if slab_impl not in ("bands", "extended"):
        raise ValueError(f"unknown slab_impl {slab_impl!r}")
    if props.output in (OutputMode.ABSDIFF, OutputMode.THRESHOLD,
                        OutputMode.STATS_ONLY):
        # raw modes: no stencil, no halo — their own body (u8 baseline)
        return _make_grid_raw_step(props, h, w, mesh, backend)
    if backend == "pallas":
        _check_slab_alignment(h, w, mesh)
    tail_body = (_pallas_slab_body_bands if slab_impl == "bands"
                 else _pallas_slab_body)

    def per_shard(raw, baseline, flags, heatmap, valid):
        if backend == "pallas":
            out, stats, new_b, new_h = tail_body(
                props, h, w, raw, baseline, flags, heatmap, valid, "rows")
        else:
            # raw: (S_local, T+B, 3, Hs, Wp) — vmap the row-slab body over
            # the local stream axis; collectives inside reference the
            # "rows" axis name, which vmap passes through untouched.
            def one_stream(r, bl, fl, hm, vd):
                return _row_body(props, h, w, r, bl, fl, hm, vd, "rows")
            out, stats, new_b, new_h = jax.vmap(one_stream)(
                raw, baseline, flags, heatmap, valid)
        return out, stats, new_b, new_h, _grid_gmean(stats, valid)

    sharded = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P("stream", None, None, "rows", None),
                  P("stream", "rows", None), P("stream"),
                  P("stream", "rows", None), P("stream")),
        out_specs=(P("stream", None, None, "rows", None),
                   P("stream", None, None), P("stream", "rows", None),
                   P("stream", "rows", None), P()),
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(1, 3))
