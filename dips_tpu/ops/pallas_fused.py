"""Fused Pallas TPU kernel: the whole DiPs per-frame pipeline in one pass.

Replaces the reference's two-dispatch-per-frame WGSL pipeline with blocking
readback (dips/src/gpu/mod.rs:218-397) by a single `pallas_call` per batch
that performs, per frame and per row-block, entirely in VMEM:

  uint8 planar RGB -> intensity -> spatial median (min/max selection
  network) -> temporal-ring median -> snapshot capture / diff -> sigmoid
  emphasis -> colorize/grayscale -> uint8 quantize + per-frame statistics
  + accumulated |diff| heatmap.

Design notes (see /opt/skills/guides/pallas_guide.md):

* **Grid** ``(row_blocks, (T+B)/F)`` — the frame axis is innermost and TPU
  grids run sequentially, so VMEM scratch legitimately carries the temporal
  ring, the pinned baseline, the previous-frame plane, and the heatmap
  across frame steps: the GPU ring-buffer-texture state machine
  (dips/src/gpu/bind_groups.rs:407-427) becomes scratch reuse inside one
  kernel.  Each grid step processes F frames (the largest divisor of
  gcd(T, B) <= 8, unrolled) to amortise per-step scheduling overhead;
  F | T keeps warm-up steps whole and F | B keeps emit steps whole.
* **Stencil halo** — each row-block reads its 8-row neighbours through thin
  extra BlockSpecs (block-index granularity 8 rows); x-taps use
  ``pltpu.roll`` whose wrap lands in the >= 4 dead zero lanes guaranteed by
  ``pad_geometry``, reproducing the reference's zero out-of-bounds taps
  (dips_shader.wgsl:135-137) with no masking.
* **Medians** — exact, data-independent: shared column sorts + rank-pruned
  odd-even merge plans from ``ops/networks.py``.
* **Outputs** — uint8 maps, plus per-(frame, row-block) statistic partials
  packed into (8,128) f32 tiles that XLA reduces outside.

The kernel matches ``ops/reference.batch_step``'s contract exactly and is
tested against the same oracle (bit-exact for min/max paths).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..properties import (ChromaFilter, DiPsMethod, DiPsProperties,
                          OutputMode)
from . import networks, tuning
from .reference import emphasize

# Per-(frame, row-block) raw-diff partials: sum, sum_abs, max_abs, count.
_PART = 4
# Per-step VMEM budgets (hardware limit 16M; leave compiler headroom).
# Measured split (B=64): the compute-bound median pipeline is fastest with
# the LARGEST blocks that fit 14M (fewer grid-step boundaries), while the
# HBM-bound absdiff kernel peaks near ~500KB of input block per grid step
# with a 16-row floor.  Sweep evidence (absdiff fps by block-height/
# input-block-bytes): 1080p 8/196K -> 21.3k, 16/393K -> 36.3k, 32/786K ->
# 33.2k, 64/1.5M -> 30.9k; 480p 16/172K -> 101k, 40/420K -> 172.8k,
# 48/516K -> 177k, 96/1.0M -> 168k; 720p 16/270K -> 57.3k, 24/406K -> 65k;
# 4K 8/372K -> 7.8k, 16/762K -> 8.8k, 24/1.14M -> 7.3k.  Sub-16-row blocks
# drown in per-step overhead; blocks past ~800KB pipeline poorly.
_VMEM_BUDGET = 14 * 1024 * 1024        # median/emphasis kernel
_VMEM_BUDGET_RAW = 10 * 1024 * 1024    # integer absdiff/threshold kernel
_VMEM_HARD = 16 * 1024 * 1024          # Mosaic's scoped-vmem hard limit
_RAW_TARGET_BLOCK_BYTES = 500 * 1024   # absdiff input-block sweet spot
_RAW_MIN_ROWS = 16                     # below this, step overhead dominates


def _frames_per_step(t: int, b: int) -> int:
    """F frames per grid step: the largest divisor of gcd(T, B) that is
    <= 8 (F | T keeps warm-up grid steps entirely warm-up; F | B keeps
    emit steps whole).  Halving the gcd is NOT correct here — e.g.
    gcd(9, 9) = 9 halves to 4, which divides neither."""
    g = math.gcd(t, b)
    f = 1
    for d in range(2, min(g, 8) + 1):
        if g % d == 0:
            f = d
    return f


def _pick_block_rows(hp: int, wp: int, window: int, t: int, c: int,
                     fpb: int, approx: bool = False,
                     slab_bands: bool = False) -> int:
    """Largest row-block (multiple of 8, divides Hp) that fits VMEM.

    Accounts for everything resident per grid step: the w*w live f32 tap
    planes of the selection network, the (T + base + prev + heat) f32
    scratch, the halo strip, and the double-buffered u8/f32 input/output
    blocks Pallas pipelines (2x each, F frames per block).  The two
    8-row halo input blocks are bh-INDEPENDENT, so they debit the budget
    up front instead of the per-row ledger (omitting them OOMed the ring
    kernels at 4K — see _ring_geometry; analytic estimates run ~2 MB
    under silicon, so the debit comes off the SOFT budget, not the hard
    ceiling).  The separable approximate median keeps ~window-3-level
    live planes regardless of ``window`` (the ring path models the same
    via its w3 caps).
    """
    taps = max(9 if approx else window * window, 1)
    bytes_per_row = wp * (4 * taps           # live network planes
                          + 4 * t            # ring scratch
                          + 4 * 3            # base/prev/heat scratch
                          + 4                # strip scratch
                          + 1 * 3 * fpb * 2  # u8 input block, dbl-buffered
                          + 1 * c * fpb * 2  # u8 output block, dbl-buffered
                          + 4 * 2 * 2        # base/heat inputs, dbl-buffered
                          + 4 * 2 * 2)       # base/heat outputs, dbl-buffered
    halo = 2 * 2 * 8 * 3 * fpb * wp          # two 8-row u8 halo blocks, 2x
    if slab_bands:
        halo *= 2    # plus two bh-independent 8-row neighbour-band blocks
    max_rows = max((_VMEM_BUDGET - halo) // bytes_per_row, 8)
    best = 8
    for d in range(1, hp // 8 + 1):
        bh = 8 * d
        if hp % bh == 0 and bh <= max_rows:
            best = bh
    return min(best, hp)


#: diff scale: filtering runs on the integer intensity scale [0, 510]
#: (oracle.INTENSITY_SCALE) carried in f32 — small integers are exact in
#: f32, so the medians (min/max selections) stay integer-exact, the diff
#: is an exact subtraction with ONE rounding (the * _SCALE), and the VPU
#: runs its fastest path.  Measured alternatives: int32 medians were
#: 2-5% slower (same lane width, extra converts); packed int16 medians
#: are blocked by Mosaic (tpu.dynamic_rotate is 32-bit only).
_SCALE = 1.0 / 510.0  # python float: jnp-wrapped at use (no captured consts)


def _intensity_i(rgb_u8: jnp.ndarray, chroma: ChromaFilter) -> jnp.ndarray:
    """(3, H, W) uint8 -> (H, W) f32 INTEGER-VALUED intensity in [0, 510]
    (uint8 -> f32 hops through int32 for Mosaic)."""
    f = rgb_u8.astype(jnp.int32)
    if chroma == ChromaFilter.RED:
        v = 2 * f[0]
    elif chroma == ChromaFilter.GREEN:
        v = 2 * f[1]
    elif chroma == ChromaFilter.BLUE:
        v = 2 * f[2]
    else:
        cmax = jnp.maximum(jnp.maximum(f[0], f[1]), f[2])
        cmin = jnp.minimum(jnp.minimum(f[0], f[1]), f[2])
        v = cmax + cmin
    return v.astype(jnp.float32)


def _shift_x(x: jnp.ndarray, dx: int) -> jnp.ndarray:
    """Shift columns by dx with wraparound; the wrap lands in dead zero
    lanes (pad_geometry guarantees >= 4), so semantics are zero-padded."""
    if dx == 0:
        return x
    wp = x.shape[1]
    return pltpu.roll(x, (-dx) % wp, 1)


def _stats_tile(vals) -> jnp.ndarray:
    """Pack the 4 per-frame statistic partials into one (8,128) f32 tile
    (row 0, lanes 0..3).  Scalar SMEM outputs would violate Mosaic's
    (8,128) block rule when n_hb > 1, so partials travel as tiles."""
    lane = lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    row0 = lax.broadcasted_iota(jnp.int32, (8, 128), 0) == 0
    tile = jnp.zeros((8, 128), jnp.float32)
    for k, v in enumerate(vals):
        tile = jnp.where(row0 & (lane == k), v, tile)
    return tile


def _filtered_plane(props: DiPsProperties, i: int, cur_ref, up_ref, dn_ref,
                    strip_ref, hb_in, n_hb_per: int, bh: int, wp: int,
                    bandtop_ref=None, bandbot_ref=None):
    """Shared front half of the median-pipeline kernels: intensity strip
    with p-row halos (zero at image/stream boundaries), then the spatial
    median (exact selection network or the separable approximation).
    Returns the filtered plane phi for within-block frame ``i``.

    ``bandtop_ref``/``bandbot_ref`` (slab-band mode, parallel/grid2d.py):
    8-row neighbour bands that replace the ZERO boundary fill — at the
    first/last row block of a stream section the stencil taps read the
    adjacent shard's rows (ppermuted over ICI by the caller) instead of
    zeros, so a row-sharded slab computes bit-identically to its rows in
    the full-height kernel with NO halo-extended input copy.  The bands
    are zeroed by the caller at the global top/bottom edge (the
    pipeline's zero out-of-bounds semantics)."""
    window = props.window_size
    p = window // 2
    strip_ref[8:8 + bh] = _intensity_i(cur_ref[i], props.chroma)
    if p > 0:
        # convert only the p halo rows the stencil actually reads
        up = _intensity_i(up_ref[i, :, 8 - p:8], props.chroma)
        dn = _intensity_i(dn_ref[i, :, 0:p], props.chroma)
        if bandtop_ref is not None:
            topfill = _intensity_i(bandtop_ref[i, :, 8 - p:8], props.chroma)
            botfill = _intensity_i(bandbot_ref[i, :, 0:p], props.chroma)
        else:
            topfill = botfill = jnp.zeros((p, wp), jnp.float32)
        strip_ref[8 - p:8] = jnp.where(hb_in > 0, up, topfill)
        strip_ref[8 + bh:8 + bh + p] = jnp.where(
            hb_in < n_hb_per - 1, dn, botfill)
    if props.quirk_compat:
        # bug-for-bug reference filter (networks.quirk_window_select) +
        # the rgba8unorm store-back quantization (even integers on the
        # [0, 510] scale, half-to-even) before the temporal median
        if window > 1:
            vtaps = [strip_ref[8 + dy - p:8 + dy - p + bh]
                     for dy in range(window - 1)]
            phi = networks.quirk_window_select(vtaps, _shift_x,
                                               jnp.minimum, jnp.maximum)
        else:
            phi = strip_ref[8:8 + bh]
        return jnp.float32(2.0) * jnp.rint(phi * jnp.float32(0.5))
    if window > 1:
        vtaps = [strip_ref[8 + dy - p:8 + dy - p + bh]
                 for dy in range(window)]
        med = (networks.separable_median if props.approx_median
               else networks.window_median)
        return med(vtaps, _shift_x, jnp.minimum, jnp.maximum)
    return strip_ref[8:8 + bh]


def _halo_specs(window: int, fpb: int, wp: int, bh8: int, n8_per: int,
                n_hb_per: int):
    """The two thin 8-row halo BlockSpecs of the stencil kernels, clamped
    to stream boundaries in stacked mode.  Window 1 has no stencil: no
    halo inputs (they would stream unread bytes every grid step)."""
    if window <= 1:
        return []

    def up_idx(hb, f, *_):
        lo = (hb // n_hb_per) * n8_per
        return (f, 0, jnp.maximum(hb * bh8 - 1, lo), 0)

    def dn_idx(hb, f, *_):
        hi = (hb // n_hb_per + 1) * n8_per - 1
        return (f, 0, jnp.minimum((hb + 1) * bh8, hi), 0)

    return [pl.BlockSpec((fpb, 3, 8, wp), up_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((fpb, 3, 8, wp), dn_idx, memory_space=pltpu.VMEM)]


def _reduce_stats(parts, b: int, s: int, n_hb_per: int, sum_scale,
                  max_scale=None) -> jnp.ndarray:
    """Reduce per-(frame, row-block) partial tiles to (s, B, 4) stats:
    scaled sums for mean/mean-abs, max (optionally scaled), raw count."""
    parts = parts[:, :, 0, :_PART].reshape(b, s, n_hb_per, _PART)
    mx = parts[..., 2].max(axis=2)
    if max_scale is not None:
        mx = mx * max_scale
    return jnp.stack([
        parts[..., 0].sum(axis=2) * sum_scale,
        parts[..., 1].sum(axis=2) * sum_scale,
        mx,
        parts[..., 3].sum(axis=2),
    ], axis=-1).transpose(1, 0, 2)


def _emit_median_frame(props: DiPsProperties, i: int, m, si, cur,
                       flags_ref, valid_ref, base_ref, prev_ref,
                       mask_ref, out_ref, stats_ref, heat_ref,
                       gate_state: bool) -> None:
    """Shared per-frame emit body of the median-pipeline kernels: baseline
    capture / per-frame diff, masked statistic partials, heatmap, emphasis,
    colorize/grayscale quantization.  ``i`` is the static within-block frame
    index, ``m`` the (traced) output-frame index used for flag lookup.

    ``gate_state`` (ring-carry mode) suppresses carried-state writes
    (baseline capture, prev update) for invalid padding frames: ring-carry
    state persists across batches, so padding replicas must not touch it.
    The tail kernel stays ungated, which is safe under two invariants its
    callers uphold: the temporal ring/prev state is rebuilt from the raw
    tail every batch (padding writes to them are inert), and the host
    NEVER sets a capture flag on an invalid frame (pipeline.py builds
    flags only for the n real frames) — the carried OVERALL baseline
    crosses batches even in the tail protocol, so a flagged padding
    replica WOULD corrupt it.

    ``out_ref is None`` (``props.emit_maps`` False, out_channels == 0):
    the emphasis/quantize/map-write half is skipped entirely — baseline
    capture, statistics and heatmap are untouched, so a fleet gets
    median-filtered, emphasis-domain stats with no map egress at all.
    """
    overall = props.method == DiPsMethod.OVERALL
    colorize = props.output == OutputMode.COLORIZE
    vw = valid_ref[si, m]

    if overall:
        flag = flags_ref[si, m] != 0
        if gate_state:
            flag = flag & (vw != 0)

        @pl.when(flag)
        def _():
            base_ref[:] = cur
        diff_i = base_ref[:] - cur       # exact: small ints in f32
    else:
        diff_i = prev_ref[:] - cur
        if gate_state:
            @pl.when(vw != 0)
            def _():
                prev_ref[:] = cur
        else:
            prev_ref[:] = cur  # only PER_FRAME reads it back
    # exact integer difference, scaled to [-1, 1] in one rounding
    raw_diff = diff_i * jnp.float32(_SCALE)

    # masked statistic partials
    dm = raw_diff * mask_ref[:]
    am = jnp.abs(dm)
    thr = (jnp.float32(props.change_threshold)
           * jnp.float32(1 / 255.))
    stats_ref[i, 0] = _stats_tile([jnp.sum(dm), jnp.sum(am), jnp.max(am),
                                   jnp.sum((am >= thr)
                                           .astype(jnp.float32))])
    heat_ref[:] = heat_ref[:] + am * vw.astype(jnp.float32)

    if out_ref is None:  # emit_maps=False: no emphasis/quantize/map writes
        return

    d = emphasize(raw_diff, props.filter,
                  props.sigmoid_horizontal_scalar,
                  props.sensitivity)

    def q8(x):
        # f32 -> u8 must hop through i32 for Mosaic; value is already
        # rounded and clipped to [0, 255].
        v = jnp.rint(jnp.clip(x, 0.0, 1.0) * jnp.float32(255.0))
        return v.astype(jnp.int32).astype(jnp.uint8)

    def write_normal():
        if colorize:
            # quantize the two distinct channel values once and select in
            # uint8 (== quantize-after-select exactly; saves one full
            # quantize chain per frame)
            sa = jnp.abs(d)
            hi8 = q8(jnp.float32(0.5) + sa * jnp.float32(0.5))
            lo8 = q8(jnp.float32(0.5) - sa * jnp.float32(0.5))
            neg = d < 0
            out_ref[i, 0] = jnp.where(neg, hi8, lo8)
            out_ref[i, 1] = jnp.where(neg, lo8, hi8)
            out_ref[i, 2] = lo8
        else:
            out_ref[i, 0] = q8(jnp.float32(0.5) - d)

    if overall:
        # capture frames render the fresh baseline as gray
        # (rare: a real branch beats per-pixel selects)
        @pl.when(flag)
        def _():
            cur8 = q8(cur * jnp.float32(_SCALE))
            for ch in range(3 if colorize else 1):
                out_ref[i, ch] = cur8

        @pl.when(jnp.logical_not(flag))
        def _():
            write_normal()
    else:
        write_normal()


def _make_kernel(props: DiPsProperties, h: int, w: int, t: int, b: int,
                 bh: int, wp: int, n_hb: int, fpb: int, s: int = 1,
                 dyn_rows: bool = False, slab_bands: bool = False):
    """``s`` > 1 = stacked-stream mode: the row axis carries s independent
    streams of n_hb/s row blocks each.  One kernel instance processes all
    of them (each row block's scratch is already independent), instead of
    vmap dispatching s kernel instances — measured ~2x multi-stream
    throughput on chip.  Capture/valid flags become per-stream (s, B) and
    halos stop at stream boundaries.

    ``dyn_rows``: row-slab mode (parallel/grid2d.py) — the stats/heatmap
    mask's row window comes from a traced scalar-prefetch pair
    (section-LOCAL [lo, hi), shared by every stacked section) instead of
    the static roi row bounds; column bounds stay static.  This is the
    ONLY kernel-side difference between a full-height stream and a
    halo-extended row slab: everything after the spatial filter is
    row-local, so slab halo rows just compute garbage that the caller
    masks (stats) or slices away (outputs).

    ``slab_bands``: slab-band mode — two extra 8-row band inputs feed the
    stencil's boundary taps (see _filtered_plane), so slabs stay in OWNED
    coordinates with no halo extension at all."""
    window = props.window_size
    p = window // 2
    overall = props.method == DiPsMethod.OVERALL
    emit_maps = props.out_channels > 0
    warm = t // fpb            # number of pure warm-up grid steps
    n_steps = (t + b) // fpb
    n_hb_per = n_hb // s       # row blocks per stream

    def kernel(flags_ref,                       # SMEM (S, B) int32
               valid_ref,                       # SMEM (S, B) int32
               *refs):
        # inputs: cur [, up, dn when p > 0] [, bandtop, bandbot],
        #         base_in, heat_in
        # outputs: [out when emit_maps,] stats, base_out, heat_out
        # scratch: ring, base, prev, heat, mask, strip
        if dyn_rows:
            rowb_ref, *refs = refs              # SMEM (2,) int32
        it = iter(refs)
        cur_ref = next(it)
        up_ref = next(it) if p > 0 else None
        dn_ref = next(it) if p > 0 else None
        bandtop_ref = next(it) if slab_bands else None
        bandbot_ref = next(it) if slab_bands else None
        base_in_ref = next(it)
        heat_in_ref = next(it)
        out_ref = next(it) if emit_maps else None
        (stats_ref, base_out_ref, heat_out_ref,
         ring_ref, base_ref, prev_ref, heat_ref, mask_ref,
         strip_ref) = it
        hb = pl.program_id(0)
        fs = pl.program_id(1)
        si = hb // n_hb_per          # which stream this row block belongs to
        hb_in = lax.rem(hb, n_hb_per)  # row block index within the stream

        @pl.when(fs == 0)
        def _seed():
            # carried baseline is f32 on the integer scale [0, 510]
            base_ref[:] = base_in_ref[:]
            heat_ref[:] = heat_in_ref[:]
            # validity mask is loop-invariant per row block: build it once
            # (row coordinates are stream-local in stacked mode)
            rows = lax.broadcasted_iota(jnp.int32, (bh, wp), 0) + hb_in * bh
            cols = lax.broadcasted_iota(jnp.int32, (bh, wp), 1)
            # stats/heatmap mask: the analysis region (props.roi) clipped
            # to the true geometry; the default roi IS the full frame, so
            # this stays the plain validity mask without one
            y0, x0, y1, x1 = props.roi_bounds(h, w)
            if dyn_rows:  # slab mode: roi rows folded into the bounds
                y0, y1 = rowb_ref[0], rowb_ref[1]
            mask_ref[:] = ((rows >= y0) & (rows < y1) & (cols >= x0)
                           & (cols < x1)).astype(jnp.float32)

        for i in range(fpb):
            gf = fs * fpb + i  # global frame index in [0, T+B)

            # ---- intensity strip + spatial median (shared helper) ------
            phi = _filtered_plane(props, i, cur_ref, up_ref, dn_ref,
                                  strip_ref, hb_in, n_hb_per, bh, wp,
                                  bandtop_ref, bandbot_ref)

            # ---- temporal ring (carried across sequential steps) -------
            ring_ref[lax.rem(gf, t)] = phi

            if i == fpb - 1 and not overall:
                # the last warm-up sub-frame completes window 0 (= the
                # previous frame's ring median, needed by PER_FRAME mode)
                @pl.when(fs == warm - 1)
                def _():
                    prev_ref[:] = networks.median_of(
                        [ring_ref[k] for k in range(t)],
                        jnp.minimum, jnp.maximum)

            @pl.when(fs >= warm)
            def _emit():
                m = gf - t  # output frame index in [0, B)
                cur = networks.median_of([ring_ref[k] for k in range(t)],
                                         jnp.minimum, jnp.maximum)
                _emit_median_frame(props, i, m, si, cur, flags_ref,
                                   valid_ref, base_ref, prev_ref, mask_ref,
                                   out_ref, stats_ref, heat_ref,
                                   gate_state=False)

        @pl.when(fs == n_steps - 1)
        def _finish():
            base_out_ref[:] = base_ref[:]
            heat_out_ref[:] = heat_ref[:]

    return kernel


def _batch_step_impl(props: DiPsProperties, h: int, w: int, s: int,
                     raw, baseline, flags2d, heatmap, valid2d,
                     row_bounds=None, bands=None):
    """Shared body: ``s`` streams stacked along the row axis.

    raw (T+B, 3, s*Hp, Wp) u8, baseline/heatmap (s*Hp, Wp) f32,
    flags/valid (s, B) -> (out (B, C, s*Hp, Wp) u8, stats (s, B, 4) f32,
    new baseline, new heatmap).

    ``row_bounds`` (traced i32 (2,), optional): row-slab mode — each
    stacked section is a horizontal slab and the stats/heatmap mask row
    window is [row_bounds[0], row_bounds[1]) in section-LOCAL rows (the
    caller folds the global roi/validity rows in); sums stay scaled by
    the FULL-image analysis_pixels so per-slab stats psum to the
    single-device values (parallel/grid2d.py).

    ``bands``: slab-BAND mode — ``(bandtop, bandbot)`` u8
    (T+B, 3, s*8, Wp) neighbour bands feed the stencil's boundary taps
    directly (see _batch_step_ring_impl), so slabs stay in OWNED
    coordinates (no halo-extended copy, no output slice)."""
    t = props.temporal_size
    b = raw.shape[0] - t
    hp_tot, wp = raw.shape[-2], raw.shape[-1]
    hp = hp_tot // s
    c = props.out_channels
    fpb = _frames_per_step(t, b)
    assert t % fpb == 0 and b % fpb == 0, (t, b, fpb)
    bh = _pick_block_rows(hp, wp, props.window_size, t, c, fpb,
                          approx=props.approx_median,
                          slab_bands=bands is not None)
    n_hb_per = hp // bh
    n_hb = s * n_hb_per
    n8_per = hp // 8
    bh8 = bh // 8
    warm = t // fpb

    flags_i32 = flags2d.astype(jnp.int32)
    valid_i32 = valid2d.astype(jnp.int32)
    dyn_rows = row_bounds is not None
    slab_bands = bands is not None
    if slab_bands and props.window_size <= 1:
        raise ValueError("slab bands apply only to stencil windows (> 1)")
    scalars = [flags_i32, valid_i32]
    if dyn_rows:
        scalars.append(row_bounds.astype(jnp.int32))
    kernel = _make_kernel(props, h, w, t, b, bh, wp, n_hb, fpb, s,
                          dyn_rows=dyn_rows, slab_bands=slab_bands)
    has_halo = props.window_size > 1
    halo_specs = _halo_specs(props.window_size, fpb, wp, bh8, n8_per,
                             n_hb_per)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(n_hb, (t + b) // fpb),
        in_specs=[
            pl.BlockSpec((fpb, 3, bh, wp), lambda hb, f, *_: (f, 0, hb, 0),
                         memory_space=pltpu.VMEM),
            *halo_specs,
            *(_band_specs(fpb, wp, n_hb_per) if slab_bands else []),
            pl.BlockSpec((bh, wp), lambda hb, f, *_: (hb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bh, wp), lambda hb, f, *_: (hb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            *([pl.BlockSpec(
                (fpb, c, bh, wp),
                lambda hb, f, *_: (jnp.clip(f - warm, 0, b // fpb - 1), 0,
                                   hb, 0),
                memory_space=pltpu.VMEM)] if c > 0 else []),
            pl.BlockSpec(
                (fpb, 1, 8, 128),
                lambda hb, f, *_: (jnp.clip(f - warm, 0, b // fpb - 1), hb,
                                   0, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec((bh, wp), lambda hb, f, *_: (hb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bh, wp), lambda hb, f, *_: (hb, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((t, bh, wp), jnp.float32),     # temporal ring
            pltpu.VMEM((bh, wp), jnp.float32),        # baseline
            pltpu.VMEM((bh, wp), jnp.float32),        # prev ring median
            pltpu.VMEM((bh, wp), jnp.float32),        # heatmap
            pltpu.VMEM((bh, wp), jnp.float32),        # validity mask
            pltpu.VMEM((bh + 16, wp), jnp.float32),   # halo'd intensity
        ],
    )

    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            *([jax.ShapeDtypeStruct((b, c, hp_tot, wp), jnp.uint8)]
              if c > 0 else []),
            jax.ShapeDtypeStruct((b, n_hb, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((hp_tot, wp), jnp.float32),
            jax.ShapeDtypeStruct((hp_tot, wp), jnp.float32),
        ],
        interpret=jax.default_backend() == "cpu",
    )(*scalars,
      *((raw, raw, raw) if has_halo else (raw,)),
      *(bands if slab_bands else ()), baseline, heatmap)
    if c == 0:
        # the zero-channel output array costs nothing; it keeps the
        # return contract shape-compatible for every consumer
        outs = [jnp.zeros((b, 0, hp_tot, wp), jnp.uint8), *outs]
    out, parts, new_baseline, new_heatmap = outs

    stats = _reduce_stats(parts, b, s, n_hb_per,
                          jnp.float32(1.0 / props.analysis_pixels(h, w)))
    # (s, B, 4)
    return out, stats, new_baseline, new_heatmap


@functools.partial(jax.jit, static_argnums=(0, 1, 2),
                   donate_argnums=(4, 6))  # baseline/heatmap update in place
def batch_step(props: DiPsProperties, h: int, w: int,
               raw: jnp.ndarray, baseline: jnp.ndarray,
               snap_flags: jnp.ndarray, heatmap: jnp.ndarray,
               valid: jnp.ndarray
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Drop-in fused-kernel equivalent of ``reference.batch_step``.

    Same protocol: raw uint8 (T+B, 3, Hp, Wp), f32 baseline/heatmap
    (Hp, Wp), bool (B,) capture/valid flags -> (uint8 (B, C, Hp, Wp),
    f32 (B, NUM_STATS), new baseline, new heatmap).
    """
    out, stats, nb, nh = _batch_step_impl(
        props, h, w, 1, raw, baseline, snap_flags[None], heatmap,
        valid[None])
    return out, stats[0], nb, nh


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3),
                   donate_argnums=(5, 7))  # baseline/heatmap update in place
def batch_step_stacked(props: DiPsProperties, h: int, w: int, s: int,
                       raw: jnp.ndarray, baseline: jnp.ndarray,
                       snap_flags: jnp.ndarray, heatmap: jnp.ndarray,
                       valid: jnp.ndarray):
    """``s`` independent streams stacked along the row axis in ONE kernel
    instance (vs vmap's s instances — measured ~2x multi-stream throughput).

    raw (T+B, 3, s*Hp, Wp) u8 (stream si occupies rows [si*Hp, (si+1)*Hp)),
    baseline/heatmap (s*Hp, Wp) f32, flags/valid (s, B) bool ->
    (out (B, C, s*Hp, Wp), stats (s, B, NUM_STATS), new baseline/heatmap).
    """
    return _batch_step_impl(props, h, w, s, raw, baseline, snap_flags,
                            heatmap, valid)


# ---------------------------------------------------------------------------
# Ring-carry variant: the filtered temporal ring as DEVICE state.
#
# The tail protocol re-uploads and re-filters the last T raw frames every
# batch (models/pipeline.py "Ring state via a raw-frame tail").  Here the
# ring of filtered intensity planes (plus the PER_FRAME previous-median
# plane) is carried across steps like the baseline/heatmap: the input is
# just the B new frames, T/(T+B) of the median work and of the tail H2D
# upload disappears, and the frames-per-step divisor stops depending on T
# (fpb = largest divisor of B <= 8 — T=9 with B=64 runs 8-frame steps
# instead of the tail kernel's forced fpb=1).
#
# Carried-state contract: invalid (padding-replica) frames never touch the
# ring, prev plane or baseline — their writes are gated on the valid flag
# (the tail kernel needs no gating: it rebuilds state from the raw tail).
# Slot convention: ``offset`` is the engine's processed-frame cursor mod T;
# frame m writes slot (offset + m) mod T.  ``seed`` = 1 replicates frame 0's
# filtered plane into every slot, reproducing the tail protocol's
# first-batch prefill (and the oracle's ring warm-up).
# ---------------------------------------------------------------------------


def _ring_frames_per_step(b: int, hp: int = 0, wp: int = 0) -> int:
    """Frames per grid step for the RAW (absdiff/threshold) ring kernel.

    Measured on v5e (bench.py, absdiff parity): at 480p a 4-frame block
    (thicker row slabs, fewer DMA segments) runs 202k fps vs 134k for the
    8-frame block; 720p very nearly ties with 4 slightly ahead (61.3k vs
    61.1k); 1080p mildly prefers 8 (36.7k vs 35.2k).  So target 4 frames
    up to and including 720p's padded geometry (720*1408 ~ 1.01 Mpx), 8
    for larger; always a divisor of B.
    """
    if _RAW_FPB_OVERRIDE is not None:  # joint-sweep probe hook
        return _RAW_FPB_OVERRIDE
    target = 4 if hp * wp and hp * wp <= 1_100_000 else 8
    f = 1
    for d in range(2, min(b, target) + 1):
        if b % d == 0:
            f = d
    return f


# Per-window caps on the row-block PLANE SIZE (wp * bh), measured on v5e
# through the bench path (jit of a fori_loop over the step; t=4, c=3,
# b=64).  Analytic scoped-VMEM ledgers repeatedly failed here — Mosaic's
# real footprint is not linear in any (bh, wp, taps) model we tried (w5
# schedules far tighter than its 20-wire nominal peak liveness, w7
# spills close to its 35-wire peak, and identical configs report ~2 MB
# more scoped VMEM under bare AOT .compile() than under the bench path).
# Silicon pins, RUNS vs OOM (reported scoped MB); wp is the PADDED width
# (480p=896, 720p=1408, 1080p=2048, 4K=3968):
#   w3: 896*48 ok, 1408*40 ok (25.5k fps), 2048*24 ok (11.5k fps)
#   w5: 896*48 ok (25.1k), 2048*24 ok (4.8k) | 1408*40 OOM 16.01
#   w7: 896*40 ok (10.9k), 1408*24 ok (4.6k), 2048*8 ok (2.3k)
#       | 896*48 OOM 16.18, 2048*24 OOM 19.14
# Each cap sits between its window's largest passing and smallest
# failing product.  w1 reuses w3's cap (strictly fewer live planes).
# PER_FRAME (two extra prev-plane blocks) fits in the margin at every
# cap edge — verified on silicon: pf w3 1408*40 ok (25.7k), pf w3
# 2048*24 ok (12.0k), pf w5 2048*24 ok (5.0k), pf w7 896*40 ok (11.1k).
_RING_BH_PRODUCT_CAPS = {1: 56_320, 3: 56_320, 5: 52_000, 7: 39_000}
#: the device kind the baked caps were measured on: on THIS kind a
#: smaller autotuned cap cannot shrink the pick (both are silicon lower
#: bounds of the same edge — an autotune walk on a coarse divisor ladder,
#: e.g. 1080p's 24->40 jump, measures 49152 where the true edge is 56320,
#: and preferring it would regress e.g. the 720p bh=40 pick to 24)
_PINNED_DEVICE_KIND = "TPU v5 lite"

# Probe hooks for ops/autotune.py ONLY: when set, the pickers return these
# verbatim.  Autotune builds a FRESH jit closure per probe (a module-level
# override would otherwise be invisible to jax's jit cache, which keys on
# the static args, not on this variable).
_RING_GEOMETRY_OVERRIDE: "Tuple[int, int] | None" = None   # (fpb, bh)
_RAW_BH_OVERRIDE: "int | None" = None                      # bh
_RAW_FPB_OVERRIDE: "int | None" = None                     # frames/step


def _ring_geometry(hp: int, wp: int, window: int, t: int, b: int,
                   approx: bool = False, s: int = 1,
                   slab_bands: bool = False) -> Tuple[int, int]:
    """(fpb, bh) for the median ring kernel.  ``s`` > 1 (stacked-stream
    mode) consults the stacked-shape autotune key first
    (``tuning.stacked_ring_cap``, ``python -m dips_tpu.autotune
    --stacked S``) before the single-stream cap path — per-block VMEM is
    stream-count-independent, but Mosaic's scheduling across s x n_hb
    row blocks can move the measured edge.

    Deliberately independent of the output-channel count and of
    OVERALL/PER_FRAME: the caps were pinned with c=3 and re-verified at
    every cap edge under PER_FRAME's two extra prev-plane blocks
    (BASELINE.md "window matrix"), so neither knob moves the geometry.

    bh: the largest divisor-of-hp row block whose plane size wp*bh stays
    under the window's measured product cap (table above), derated for
    temporal rings larger than the measured t=4 (ring blocks scale with
    t).  fpb: 8-frame steps (measured fastest), except 4 on 4K-class
    widths — the double-buffered 8-row halo input blocks cost 96*fpb*wp
    bytes regardless of bh, and at wp >= ~4000 that alone made fpb=8
    overflow scoped VMEM by 48 KB at the minimum block height (4K w3
    fpb=8 bh=8 OOMs at a reported 16.05 MB; fpb=4 runs for w3/w5/w7).

    ``slab_bands`` (row-sharded band-mode slabs, parallel/grid2d.py): the
    two extra double-buffered 8-row neighbour-band input blocks are
    bh-independent like the halo blocks and cost another 96*fpb*wp bytes;
    the cap is debited by the band bytes (the tail path's
    _pick_block_rows does the same) so cap-edge slab geometries can't
    overflow scoped VMEM at runtime.  For single-section shards (s == 1)
    a mesh-probed cap at this owned height (``python -m dips_tpu.autotune
    --mesh SxR``, measured WITH the bands resident) replaces the
    analytic debit — floored at the debited pin on the pinned device
    kind, like every other measured cap; stacked slab shards (s > 1)
    keep the conservative debit, since the probe runs one section and
    Mosaic scheduling across s x n_hb blocks can move the edge."""
    if _RING_GEOMETRY_OVERRIDE is not None:  # autotune probe (see above)
        return _RING_GEOMETRY_OVERRIDE
    # the separable approximate median keeps ~w3-level live planes (two
    # pruned median-of-w networks instead of the w*w merge) — verified on
    # silicon at every w3-cap edge: approx-w7 896*48 ok (50.5k fps),
    # 1408*40 ok (20.9k), 2048*24 ok (9.3k, +30% over the exact-w7 cap);
    # PER_FRAME fits too: pf approx-w7 896*48 ok (52.5k), 2048*24 (9.9k)
    win_key = 3 if approx else window
    fpb = min(b, 8)
    if wp >= 3000:
        fpb = min(fpb, 4)
    while b % fpb:
        fpb -= 1
    # analytic path: a measured per-device-kind cap (python -m
    # dips_tpu.autotune) overrides the baked-in v5e pin; stacked shapes
    # prefer their own measured key when one exists.  On the PINNED kind
    # the baked cap is itself a silicon lower bound, so the larger wins.
    measured = ((tuning.stacked_ring_cap(win_key) if s > 1 else None)
                or tuning.ring_product_cap(win_key))
    baked = _RING_BH_PRODUCT_CAPS[win_key]
    if measured is None:
        cap = baked
    elif tuning._device_kind() == _PINNED_DEVICE_KIND:
        cap = max(measured, baked)
    else:
        cap = measured
    if t > 4:  # ring in+working blocks are 12*t bytes/row-col at t=4 pins
        cap = cap * (48 + 12 * 4) // (48 + 12 * t)
    if slab_bands and window > 1:
        # two dbl-buffered 8-row 3-channel u8 band blocks = 96*fpb*wp
        # bytes, converted to product-cap units at the cap's effective
        # bytes-per-unit coefficient (96 at the t=4 pin, 48+12t after
        # the temporal derate above)
        unit = 48 + 12 * t if t > 4 else 96
        cap = max(cap - (96 * fpb * wp) // unit, 0)
        # a mesh-probed cap at this owned height (measured WITH the band
        # blocks resident — no debit needed) replaces the analytic
        # estimate.  The probe shape must match the shard shape: s == 1
        # consults the single-section key, stacked shards consult the
        # stacked-slab key (``--mesh SxR --stacked S_l`` — Mosaic
        # scheduling across s x n_hb blocks can move the edge, the
        # reason stacked_ring_cap exists); an unprobed shape keeps the
        # conservative debit.  On the pinned kind the analytic debit is
        # itself derived from a silicon lower bound, so a coarse-ladder
        # slab measurement cannot shrink the pick below it (mirrors the
        # max() above).
        slab_cap = (tuning.slab_ring_cap(win_key, hp) if s == 1
                    else tuning.stacked_slab_ring_cap(win_key, hp))
        if slab_cap is not None:
            if t > 4:
                slab_cap = slab_cap * (48 + 12 * 4) // (48 + 12 * t)
            cap = (max(slab_cap, cap)
                   if tuning._device_kind() == _PINNED_DEVICE_KIND
                   else slab_cap)
    max_rows = max(cap // wp, 8)
    bhs = [8 * d for d in range(1, hp // 8 + 1)
           if hp % (8 * d) == 0 and 8 * d <= max_rows]
    return fpb, (max(bhs) if bhs else 8)


def _make_ring_kernel(props: DiPsProperties, h: int, w: int, t: int, b: int,
                      bh: int, wp: int, n_hb: int, fpb: int, s: int = 1,
                      dyn_rows: bool = False, slab_bands: bool = False):
    """Ring-carry median-pipeline kernel (see the section comment above).
    Carried state (ring/prev/baseline/heatmap) lives directly in the
    fs-invariant output blocks — seeded from the input blocks at fs == 0,
    flushed to HBM once after the last frame step — so it costs no VMEM
    scratch.  ``dyn_rows``: row-slab mask window, see _make_kernel.
    ``slab_bands``: two extra 8-row band inputs replace the zero boundary
    fill of the spatial stencil (see _filtered_plane)."""
    window = props.window_size
    p = window // 2
    overall = props.method == DiPsMethod.OVERALL
    emit_maps = props.out_channels > 0
    n_hb_per = n_hb // s

    def kernel(flags_ref, valid_ref, off_ref, seed_ref, *refs):
        if dyn_rows:
            rowb_ref, *refs = refs              # SMEM (2,) int32
        # inputs: cur [, up, dn] [, bandtop, bandbot], ring_in
        #         [, prev_in], base_in, heat_in
        # outputs: [out when emit_maps,] stats, ring (working)
        #          [, prev (working)], base (working), heat (working)
        # scratch: mask, strip
        it = iter(refs)
        cur_ref = next(it)
        up_ref = next(it) if p > 0 else None
        dn_ref = next(it) if p > 0 else None
        bandtop_ref = next(it) if slab_bands else None
        bandbot_ref = next(it) if slab_bands else None
        ring_in_ref = next(it)
        prev_in_ref = None if overall else next(it)
        base_in_ref = next(it)
        heat_in_ref = next(it)
        out_ref = next(it) if emit_maps else None
        stats_ref = next(it)
        ring_ref = next(it)
        prev_ref = None if overall else next(it)
        base_ref = next(it)
        heat_ref = next(it)
        mask_ref = next(it)
        strip_ref = next(it)

        hb = pl.program_id(0)
        fs = pl.program_id(1)
        si = hb // n_hb_per
        hb_in = lax.rem(hb, n_hb_per)

        @pl.when(fs == 0)
        def _seed():
            ring_ref[:] = ring_in_ref[:]
            if not overall:
                prev_ref[:] = prev_in_ref[:]
            base_ref[:] = base_in_ref[:]
            heat_ref[:] = heat_in_ref[:]
            rows = lax.broadcasted_iota(jnp.int32, (bh, wp), 0) + hb_in * bh
            cols = lax.broadcasted_iota(jnp.int32, (bh, wp), 1)
            # stats/heatmap mask: the analysis region (props.roi) clipped
            # to the true geometry; the default roi IS the full frame, so
            # this stays the plain validity mask without one
            y0, x0, y1, x1 = props.roi_bounds(h, w)
            if dyn_rows:  # slab mode: roi rows folded into the bounds
                y0, y1 = rowb_ref[0], rowb_ref[1]
            mask_ref[:] = ((rows >= y0) & (rows < y1) & (cols >= x0)
                           & (cols < x1)).astype(jnp.float32)

        for i in range(fpb):
            gf = fs * fpb + i  # frame index in [0, B)

            # ---- intensity strip + spatial median (shared helper) ------
            phi = _filtered_plane(props, i, cur_ref, up_ref, dn_ref,
                                  strip_ref, hb_in, n_hb_per, bh, wp,
                                  bandtop_ref, bandbot_ref)

            # ---- carried ring: slot = (cursor + frame) mod T, writes
            # gated on valid so padding replicas can't pollute state ------
            slot = lax.rem(off_ref[si] + gf, t)

            @pl.when(valid_ref[si, gf] != 0)
            def _():
                ring_ref[slot] = phi

            if i == 0:
                # fresh stream: replicate frame 0 into every slot (the
                # tail protocol's first-batch prefill)
                @pl.when((fs == 0) & (seed_ref[si] != 0))
                def _():
                    for k in range(t):
                        ring_ref[k] = phi
                    if not overall:
                        prev_ref[:] = phi

            cur = networks.median_of([ring_ref[k] for k in range(t)],
                                     jnp.minimum, jnp.maximum)
            _emit_median_frame(props, i, gf, si, cur, flags_ref, valid_ref,
                               base_ref, prev_ref, mask_ref, out_ref,
                               stats_ref, heat_ref, gate_state=True)

    return kernel


def _band_specs(fpb: int, wp: int, n_hb_per: int):
    """BlockSpecs of the two 8-row slab-band inputs (b-frames, 3, s*8, wp):
    constant over a stream section's row blocks, indexed by stream."""
    def band_idx(hb, f, *_):
        return (f, 0, hb // n_hb_per, 0)
    return [pl.BlockSpec((fpb, 3, 8, wp), band_idx,
                         memory_space=pltpu.VMEM)] * 2


def _batch_step_ring_impl(props: DiPsProperties, h: int, w: int, s: int,
                          raw, ring, prev, baseline, flags2d, heatmap,
                          valid2d, offsets, seeds, row_bounds=None,
                          bands=None):
    """Shared ring-carry body; ``s`` streams stacked along the row axis.

    raw (B, 3, s*Hp, Wp) u8, ring (T, s*Hp, Wp) f32, prev/baseline/heatmap
    (s*Hp, Wp) f32, flags/valid (s, B) bool, offsets/seeds (s,) i32 ->
    (out (B, C, s*Hp, Wp) u8, stats (s, B, 4) f32, new ring, new prev,
    new baseline, new heatmap).

    ``row_bounds``: row-slab mask window (see _batch_step_impl) — with the
    legacy extended-slab construction the carried ring/prev/baseline state
    is the halo-EXTENDED slab shape; its extension rows hold zero-halo
    garbage that no owned row ever reads (everything after the spatial
    filter is row-local).

    ``bands``: slab-BAND mode (the default sharded construction,
    parallel/grid2d.py) — ``(bandtop, bandbot)`` u8 (B, 3, s*8, Wp)
    neighbour bands that feed the stencil's boundary taps directly, so
    raw, carried state and outputs all stay in OWNED slab coordinates
    (no extended-input copy, no state pad/slice, no output slice)."""
    t = props.temporal_size
    b = raw.shape[0]
    hp_tot, wp = raw.shape[-2], raw.shape[-1]
    hp = hp_tot // s
    c = props.out_channels
    overall = props.method == DiPsMethod.OVERALL
    fpb, bh = _ring_geometry(hp, wp, props.window_size, t, b,
                             approx=props.approx_median, s=s,
                             slab_bands=bands is not None)
    n_hb_per = hp // bh
    n_hb = s * n_hb_per
    n8_per = hp // 8
    bh8 = bh // 8

    flags_i32 = flags2d.astype(jnp.int32)
    valid_i32 = valid2d.astype(jnp.int32)
    off_i32 = offsets.astype(jnp.int32)
    seed_i32 = seeds.astype(jnp.int32)
    dyn_rows = row_bounds is not None
    slab_bands = bands is not None
    if slab_bands and props.window_size <= 1:
        raise ValueError("slab bands apply only to stencil windows (> 1)")
    scalars = [flags_i32, valid_i32, off_i32, seed_i32]
    if dyn_rows:
        scalars.append(row_bounds.astype(jnp.int32))
    kernel = _make_ring_kernel(props, h, w, t, b, bh, wp, n_hb, fpb, s,
                               dyn_rows=dyn_rows, slab_bands=slab_bands)
    has_halo = props.window_size > 1
    halo_specs = _halo_specs(props.window_size, fpb, wp, bh8, n8_per,
                             n_hb_per)
    plane_spec = pl.BlockSpec((bh, wp), lambda hb, f, *_: (hb, 0),
                              memory_space=pltpu.VMEM)
    ring_spec = pl.BlockSpec((t, bh, wp), lambda hb, f, *_: (0, hb, 0),
                             memory_space=pltpu.VMEM)
    prev_specs = [] if overall else [plane_spec]
    prev_shapes = ([] if overall
                   else [jax.ShapeDtypeStruct((hp_tot, wp), jnp.float32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(n_hb, b // fpb),
        in_specs=[
            pl.BlockSpec((fpb, 3, bh, wp), lambda hb, f, *_: (f, 0, hb, 0),
                         memory_space=pltpu.VMEM),
            *halo_specs,
            *(_band_specs(fpb, wp, n_hb_per) if slab_bands else []),
            ring_spec,
            *prev_specs,
            plane_spec,
            plane_spec,
        ],
        out_specs=[
            *([pl.BlockSpec((fpb, c, bh, wp),
                            lambda hb, f, *_: (f, 0, hb, 0),
                            memory_space=pltpu.VMEM)] if c > 0 else []),
            pl.BlockSpec((fpb, 1, 8, 128), lambda hb, f, *_: (f, hb, 0, 0),
                         memory_space=pltpu.VMEM),
            ring_spec,
            *prev_specs,
            plane_spec,
            plane_spec,
        ],
        scratch_shapes=[
            pltpu.VMEM((bh, wp), jnp.float32),        # validity mask
            pltpu.VMEM((bh + 16, wp), jnp.float32),   # halo'd intensity
        ],
    )

    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            *([jax.ShapeDtypeStruct((b, c, hp_tot, wp), jnp.uint8)]
              if c > 0 else []),
            jax.ShapeDtypeStruct((b, n_hb, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((t, hp_tot, wp), jnp.float32),
            *prev_shapes,
            jax.ShapeDtypeStruct((hp_tot, wp), jnp.float32),
            jax.ShapeDtypeStruct((hp_tot, wp), jnp.float32),
        ],
        interpret=jax.default_backend() == "cpu",
    )(*scalars,
      *((raw, raw, raw) if has_halo else (raw,)),
      *(bands if slab_bands else ()), ring,
      *([] if overall else [prev]), baseline, heatmap)

    if c == 0:
        # zero-channel output keeps the return contract shape-compatible
        outs = [jnp.zeros((b, 0, hp_tot, wp), jnp.uint8), *outs]
    if overall:
        out, parts, new_ring, new_baseline, new_heatmap = outs
        new_prev = prev
    else:
        out, parts, new_ring, new_prev, new_baseline, new_heatmap = outs

    stats = _reduce_stats(parts, b, s, n_hb_per,
                          jnp.float32(1.0 / props.analysis_pixels(h, w)))
    # (s, B, 4)
    return out, stats, new_ring, new_prev, new_baseline, new_heatmap


@functools.partial(jax.jit, static_argnums=(0, 1, 2),
                   donate_argnums=(4, 5, 6, 8))  # ring/prev/base/heat carry
def batch_step_ring(props: DiPsProperties, h: int, w: int,
                    raw: jnp.ndarray, ring: jnp.ndarray, prev: jnp.ndarray,
                    baseline: jnp.ndarray, snap_flags: jnp.ndarray,
                    heatmap: jnp.ndarray, valid: jnp.ndarray,
                    offset: jnp.ndarray, seed: jnp.ndarray):
    """Ring-carry device step: B new frames only, the filtered temporal
    ring carried as state (see the ring-carry section comment).

    raw u8 (B, 3, Hp, Wp), ring f32 (T, Hp, Wp), prev/baseline/heatmap f32
    (Hp, Wp), flags/valid bool (B,), offset/seed i32 scalars ->
    (out u8 (B, C, Hp, Wp), stats f32 (B, NUM_STATS), new ring, new prev,
    new baseline, new heatmap)."""
    out, stats, nr, npv, nb, nh = _batch_step_ring_impl(
        props, h, w, 1, raw, ring, prev, baseline, snap_flags[None],
        heatmap, valid[None], offset[None], seed[None])
    return out, stats[0], nr, npv, nb, nh


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3),
                   donate_argnums=(5, 6, 7, 9))  # ring/prev/base/heat carry
def batch_step_ring_stacked(props: DiPsProperties, h: int, w: int, s: int,
                            raw: jnp.ndarray, ring: jnp.ndarray,
                            prev: jnp.ndarray, baseline: jnp.ndarray,
                            snap_flags: jnp.ndarray, heatmap: jnp.ndarray,
                            valid: jnp.ndarray, offsets: jnp.ndarray,
                            seeds: jnp.ndarray):
    """Stacked-stream ring-carry step: ``s`` streams along the row axis,
    per-stream cursors/seeds (offsets/seeds i32 (s,), flags/valid (s, B))."""
    return _batch_step_ring_impl(props, h, w, s, raw, ring, prev, baseline,
                                 snap_flags, heatmap, valid, offsets, seeds)


# ---------------------------------------------------------------------------
# Raw uint8 fast path: fused ABSDIFF / THRESHOLD kernel (the cv2.absdiff
# parity surface, BASELINE.json metric) — pure integer math, one HBM pass.
# ---------------------------------------------------------------------------

def _make_raw_kernel(props: DiPsProperties, t: int, b: int,
                     fpb: int, n_hb_per: int = 1, ring: bool = False,
                     roi_geom=None, dyn_rows: bool = False):
    # Needs no geometry: the raw kernel has no stencil (no validity mask,
    # no halos — zero padding is zero in both operands, so it contributes
    # nothing to any reduction), so only the grid/step split (t, b, fpb)
    # and the stream-of-row-block divisor (n_hb_per) shape the body.
    # EXCEPT with an analysis region: props.roi needs ``roi_geom`` =
    # (bh, wp, h, w) to mask the statistic/heatmap reductions (outputs
    # stay full-frame).  The mask trace exists only in roi mode, so the
    # default kernel keeps its maskless shape (and speed).
    # ``dyn_rows`` (row-slab mode, roi only): the mask's ROW window comes
    # from a traced scalar-prefetch pair [lo, hi) in slab-LOCAL rows (the
    # caller folds the global roi rows in); columns stay static — exactly
    # the median kernels' slab contract (parallel/rowsharded.py).
    overall = props.method == DiPsMethod.OVERALL
    threshold_mode = props.output == OutputMode.THRESHOLD
    # STATS_ONLY / emit_maps=False: no output planes AT ALL — the out
    # blocks, their BlockSpecs and the per-frame output writes disappear,
    # so the kernel's only HBM writes are the 4 KB stats tiles and the
    # carried state flush.  The absdiff kernel is output-DMA-bound (the
    # output chain hides everything else), so this is the fleet fast path.
    emit_maps = props.out_channels > 0
    thr = props.change_threshold
    # OVERALL needs no temporal context at all (diff vs the pinned raw
    # baseline): the kernel's frame axis covers ONLY the B new frames and
    # the T-frame tail is never even DMA'd (T/(T+B) less input traffic).
    # Measured: fps unchanged at 1080p/B=64 — the kernel is bound by the
    # OUTPUT DMA chain, and the removed input-only steps were hiding under
    # it — but the skip is kept (strictly less traffic, fewer steps).
    # PER_FRAME warms its previous-frame cache from the tail's last frame —
    # unless ``ring`` (ring-carry protocol): then the previous raw frame is
    # carried device state (prev in/out blocks), the input axis covers only
    # the B new frames in both methods, and carried-state writes are gated
    # on the valid flag (padding replicas must not touch persistent state).
    t_in = 0 if (overall or ring) else t
    warm = t_in // fpb
    n_steps = (t_in + b) // fpb
    carry_prev = ring and not overall

    def kernel(*args):
        # scalar prefetch: flags, valid [, seeds when ring]
        #                  [, row_bounds when dyn_rows]  (S, B)/(S,) i32
        # inputs: cur [, prev_in when carry_prev], base_in, heat_in
        # outputs: out, stats [, prev_out when carry_prev], base_out,
        #          heat_out; scratch: base, ref32, heat
        if ring:
            flags_ref, valid_ref, seed_ref, *refs = args
        else:
            flags_ref, valid_ref, *refs = args
            seed_ref = None
        rowb_ref = None
        if dyn_rows:
            rowb_ref, *refs = refs              # SMEM (2,) int32
        it = iter(refs)
        cur_ref = next(it)                      # u8 (F, 3, BH, Wp)
        prev_in_ref = next(it) if carry_prev else None  # u8 (3, BH, Wp)
        base_in_ref = next(it)                  # u8 (3, BH, Wp)
        heat_in_ref = next(it)                  # f32 (BH, Wp)
        out_ref = next(it) if emit_maps else None  # u8 (F, C, BH, Wp)
        stats_ref = next(it)                    # f32 (F, 1, 8, 128)
        prev_out_ref = next(it) if carry_prev else None  # u8 (3, BH, Wp)
        base_out_ref = next(it)                 # u8 (3, BH, Wp)
        heat_out_ref = next(it)                 # f32 (BH, Wp)
        base_ref = next(it)                     # u8 scratch (3, BH, Wp)
        ref32_ref = next(it)                    # i32 scratch (3, BH, Wp)
        heat_ref = next(it)                     # f32 scratch (BH, Wp)

        fs = pl.program_id(1)
        si = pl.program_id(0) // n_hb_per  # stream of this row block
        hb_in = lax.rem(pl.program_id(0), n_hb_per)  # row block in stream

        @pl.when(fs == 0)
        def _seed():
            base_ref[:] = base_in_ref[:]
            heat_ref[:] = heat_in_ref[:]
            if overall:
                # cache the reference frame in i32 once; refreshed only on
                # capture — saves 3 uint8->int32 converts on every frame
                ref32_ref[:] = base_in_ref[:].astype(jnp.int32)
            elif carry_prev:
                ref32_ref[:] = prev_in_ref[:].astype(jnp.int32)

        for i in range(fpb):
            gf = fs * fpb + i

            if i == fpb - 1 and not overall and not ring:
                @pl.when(fs == warm - 1)
                def _():
                    ref32_ref[:] = cur_ref[i].astype(jnp.int32)

            if carry_prev and i == 0:
                # fresh stream: frame 0 diffs against itself (the tail
                # protocol's first-batch prefill)
                @pl.when((fs == 0) & (seed_ref[si] != 0))
                def _():
                    ref32_ref[:] = cur_ref[0].astype(jnp.int32)

            @pl.when(fs >= warm)
            def _emit():
                m = gf - t_in
                vw = valid_ref[si, m]
                cs = [cur_ref[i, ch].astype(jnp.int32) for ch in range(3)]
                if overall:
                    flag = flags_ref[si, m] != 0
                    if ring:
                        flag = flag & (vw != 0)

                    @pl.when(flag)
                    def _():
                        base_ref[:] = cur_ref[i]
                        for ch in range(3):
                            ref32_ref[ch] = cs[ch]

                sg = [ref32_ref[ch] - cs[ch] for ch in range(3)]
                ad = [jnp.abs(x) for x in sg]
                dmax = jnp.maximum(jnp.maximum(ad[0], ad[1]), ad[2])

                if not overall:
                    def _advance():
                        for ch in range(3):
                            ref32_ref[ch] = cs[ch]
                    if ring:
                        @pl.when(vw != 0)
                        def _():
                            _advance()
                    else:
                        _advance()

                if props.roi is None:
                    sg_m, ad_m, dmax_m = sg, ad, dmax
                else:
                    # analysis-region mask (stream-local rows); outputs
                    # below keep the unmasked planes
                    bh_, wp_, h_, w_ = roi_geom
                    y0, x0, y1, x1 = props.roi_bounds(h_, w_)
                    if dyn_rows:  # slab mode: roi rows folded into bounds
                        y0, y1 = rowb_ref[0], rowb_ref[1]
                    rows = (lax.broadcasted_iota(jnp.int32, (bh_, wp_), 0)
                            + hb_in * bh_)
                    cols = lax.broadcasted_iota(jnp.int32, (bh_, wp_), 1)
                    rm = ((rows >= y0) & (rows < y1) & (cols >= x0)
                          & (cols < x1)).astype(jnp.int32)
                    sg_m = [x * rm for x in sg]
                    ad_m = [x * rm for x in ad]
                    dmax_m = dmax * rm

                # channel-mean statistic partials (oracle._process_raw)
                s_signed = (jnp.sum(sg_m[0]) + jnp.sum(sg_m[1])
                            + jnp.sum(sg_m[2])).astype(jnp.float32)
                s_abs = (jnp.sum(ad_m[0]) + jnp.sum(ad_m[1])
                         + jnp.sum(ad_m[2])).astype(jnp.float32)
                s_max = jnp.max(dmax_m).astype(jnp.float32)
                changed = (dmax_m >= thr).astype(jnp.float32)
                s_cnt = jnp.sum(changed)
                stats_ref[i, 0] = _stats_tile([s_signed, s_abs, s_max,
                                               s_cnt])

                heat_ref[:] = heat_ref[:] + (
                    (ad_m[0] + ad_m[1] + ad_m[2]).astype(jnp.float32)
                    * jnp.float32(1.0 / (3 * 255.0))
                    * valid_ref[si, m].astype(jnp.float32))

                if not emit_maps:
                    pass  # STATS_ONLY: no map writes at all
                elif threshold_mode:
                    out_ref[i, 0] = jnp.where(
                        dmax >= thr, jnp.int32(255),
                        jnp.int32(0)).astype(jnp.uint8)
                else:
                    for ch in range(3):
                        out_ref[i, ch] = ad[ch].astype(jnp.uint8)

        @pl.when(fs == n_steps - 1)
        def _finish():
            base_out_ref[:] = base_ref[:]
            heat_out_ref[:] = heat_ref[:]
            if carry_prev:
                # ref32 holds the last valid frame (updates are gated);
                # values are 0..255 so the u8 cast is exact
                prev_out_ref[:] = ref32_ref[:].astype(jnp.uint8)

    return kernel


def _raw_block_rows(hp: int, wp: int, fpb: int, c: int, s: int = 1) -> int:
    """Row-block height for the raw (absdiff/threshold) kernel: the divisor
    of Hp (>= the row floor where possible) whose input block
    (3 x F x bh x Wp bytes) is nearest the measured DMA sweet spot (ties:
    larger block); a per-device-kind measured target
    (python -m dips_tpu.autotune) overrides the baked-in v5e pin, and
    stacked shapes (``s`` > 1) prefer their own ``--stacked`` key."""
    if _RAW_BH_OVERRIDE is not None:  # autotune probe (see above)
        return _RAW_BH_OVERRIDE
    # per-row VMEM: cur in + out (u8, F-deep, dbl-buffered), 2 u8 base
    # scratch + base in/out, heat f32 scratch + in/out, i32 temps ~6 planes
    bytes_per_row = wp * (3 * fpb * 2 + c * fpb * 2 + 3 * 4 + 4 * 5 + 4 * 6)
    max_rows = max(_VMEM_BUDGET_RAW // bytes_per_row, 8)
    in_row_bytes = 3 * fpb * wp
    target_bytes = ((tuning.stacked_raw_target_bytes() if s > 1 else None)
                    or tuning.raw_target_bytes() or _RAW_TARGET_BLOCK_BYTES)
    cands = [8 * d for d in range(1, hp // 8 + 1)
             if hp % (8 * d) == 0 and 8 * d <= max_rows]
    pool = [cd for cd in cands if cd >= _RAW_MIN_ROWS] or cands or [8]
    return min(pool, key=lambda cd: (abs(cd * in_row_bytes - target_bytes),
                                     -cd))


def _absdiff_step_impl(props: DiPsProperties, h: int, w: int, s: int,
                       raw, baseline_raw, flags2d, heatmap, valid2d,
                       prev=None, seeds=None, ring: bool = False,
                       row_bounds=None):
    """Shared body; ``s`` streams stacked along the row axis (see
    ``_batch_step_impl``).  ``ring`` selects the ring-carry protocol: raw
    covers only the B new frames and PER_FRAME's previous raw frame is the
    carried ``prev`` state (u8 (3, s*Hp, Wp)).

    ``row_bounds`` (traced i32 (2,), roi mode only): row-slab mode — the
    roi mask's row window is [row_bounds[0], row_bounds[1]) in slab-LOCAL
    rows (parallel/rowsharded.py folds the global roi rows in); only the
    statistic/heatmap reductions are affected, outputs stay slab-local
    full planes.  Without an roi the raw kernel is maskless and needs no
    bounds at all (zero padding is zero in both operands)."""
    t = props.temporal_size
    b = raw.shape[0] - (0 if ring else t)
    hp_tot, wp = raw.shape[-2], raw.shape[-1]
    hp = hp_tot // s
    emit_maps = props.out_channels > 0
    c = 1 if props.output == OutputMode.THRESHOLD else 3
    if ring:
        fpb = _ring_frames_per_step(b, hp, wp)
    else:
        fpb = _frames_per_step(t, b)
        assert t % fpb == 0 and b % fpb == 0, (t, b, fpb)
    bh = _raw_block_rows(hp, wp, fpb, c if emit_maps else 0, s=s)
    n_hb_per = hp // bh
    n_hb = s * n_hb_per

    flags_i32 = flags2d.astype(jnp.int32)
    valid_i32 = valid2d.astype(jnp.int32)
    dyn_rows = row_bounds is not None
    if dyn_rows and props.roi is None:
        raise ValueError("row_bounds applies only with an roi (the raw "
                         "kernel is maskless otherwise)")
    kernel = _make_raw_kernel(
        props, t, b, fpb, n_hb_per, ring,
        roi_geom=None if props.roi is None else (bh, wp, h, w),
        dyn_rows=dyn_rows)
    carry_prev = ring and props.method != DiPsMethod.OVERALL

    # OVERALL skips the tail entirely (see _make_raw_kernel): the grid's
    # frame axis covers only the B new frames and the input index map
    # offsets past the tail blocks.  Ring mode has no tail at all.
    t_in = 0 if (ring or props.method == DiPsMethod.OVERALL) else t
    t_off = 0 if ring else (t - t_in) // fpb
    warm = t_in // fpb

    base_spec = pl.BlockSpec((3, bh, wp), lambda hb, f, *_: (0, hb, 0),
                             memory_space=pltpu.VMEM)
    prev_specs = [base_spec] if carry_prev else []
    prev_shapes = ([jax.ShapeDtypeStruct((3, hp_tot, wp), jnp.uint8)]
                   if carry_prev else [])
    scalars = [flags_i32, valid_i32]
    if ring:
        scalars.append(seeds.astype(jnp.int32))
    if dyn_rows:
        scalars.append(row_bounds.astype(jnp.int32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(n_hb, (t_in + b) // fpb),
        in_specs=[
            pl.BlockSpec((fpb, 3, bh, wp),
                         lambda hb, f, *_: (f + t_off, 0, hb, 0),
                         memory_space=pltpu.VMEM),
            *prev_specs,
            base_spec,
            pl.BlockSpec((bh, wp), lambda hb, f, *_: (hb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            *([pl.BlockSpec(
                (fpb, c, bh, wp),
                lambda hb, f, *_: (jnp.clip(f - warm, 0, b // fpb - 1), 0,
                                   hb, 0),
                memory_space=pltpu.VMEM)] if emit_maps else []),
            pl.BlockSpec(
                (fpb, 1, 8, 128),
                lambda hb, f, *_: (jnp.clip(f - warm, 0, b // fpb - 1), hb,
                                   0, 0),
                memory_space=pltpu.VMEM),
            *prev_specs,
            base_spec,
            pl.BlockSpec((bh, wp), lambda hb, f, *_: (hb, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((3, bh, wp), jnp.uint8),
            pltpu.VMEM((3, bh, wp), jnp.int32),
            pltpu.VMEM((bh, wp), jnp.float32),
        ],
    )

    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            *([jax.ShapeDtypeStruct((b, c, hp_tot, wp), jnp.uint8)]
              if emit_maps else []),
            jax.ShapeDtypeStruct((b, n_hb, 8, 128), jnp.float32),
            *prev_shapes,
            jax.ShapeDtypeStruct((3, hp_tot, wp), jnp.uint8),
            jax.ShapeDtypeStruct((hp_tot, wp), jnp.float32),
        ],
        interpret=jax.default_backend() == "cpu",
    )(*scalars, raw, *([prev] if carry_prev else []), baseline_raw, heatmap)

    if not emit_maps:
        # the zero-channel output array costs nothing; it keeps the
        # return contract shape-compatible for every consumer
        outs = [jnp.zeros((b, 0, hp_tot, wp), jnp.uint8), *outs]
    if carry_prev:
        out, parts, new_prev, new_baseline, new_heatmap = outs
    else:
        out, parts, new_baseline, new_heatmap = outs
        new_prev = prev

    stats = _reduce_stats(
        parts, b, s, n_hb_per,
        jnp.float32(1.0 / (3 * props.analysis_pixels(h, w) * 255)),
        max_scale=jnp.float32(1 / 255.0))                 # (s, B, 4)
    if ring:
        return out, stats, new_prev, new_baseline, new_heatmap
    return out, stats, new_baseline, new_heatmap


@functools.partial(jax.jit, static_argnums=(0, 1, 2),
                   donate_argnums=(4, 6))  # baseline/heatmap update in place
def absdiff_step(props: DiPsProperties, h: int, w: int,
                 raw: jnp.ndarray, baseline_raw: jnp.ndarray,
                 snap_flags: jnp.ndarray, heatmap: jnp.ndarray,
                 valid: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                            jnp.ndarray]:
    """Fused-kernel equivalent of ``reference.absdiff_step`` (bit-exact
    uint8 |cur - baseline| per channel == cv2.absdiff; THRESHOLD mask)."""
    out, stats, nb, nh = _absdiff_step_impl(
        props, h, w, 1, raw, baseline_raw, snap_flags[None], heatmap,
        valid[None])
    return out, stats[0], nb, nh


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3),
                   donate_argnums=(5, 7))  # baseline/heatmap update in place
def absdiff_step_stacked(props: DiPsProperties, h: int, w: int, s: int,
                         raw: jnp.ndarray, baseline_raw: jnp.ndarray,
                         snap_flags: jnp.ndarray, heatmap: jnp.ndarray,
                         valid: jnp.ndarray):
    """``s`` streams stacked along the row axis in one kernel instance
    (see ``batch_step_stacked``); baseline_raw is u8 (3, s*Hp, Wp)."""
    return _absdiff_step_impl(props, h, w, s, raw, baseline_raw, snap_flags,
                              heatmap, valid)


@functools.partial(jax.jit, static_argnums=(0, 1, 2),
                   donate_argnums=(4, 5, 7))  # prev/base/heat carry
def absdiff_step_ring(props: DiPsProperties, h: int, w: int,
                      raw: jnp.ndarray, prev: jnp.ndarray,
                      baseline_raw: jnp.ndarray, snap_flags: jnp.ndarray,
                      heatmap: jnp.ndarray, valid: jnp.ndarray,
                      seed: jnp.ndarray):
    """Ring-protocol absdiff/threshold step: raw covers ONLY the B new
    frames (no tail upload); PER_FRAME's previous raw frame is carried
    device state ``prev`` (u8 (3, Hp, Wp), unused/passthrough in OVERALL).

    Returns (out, stats (B, NUM_STATS), new prev, new baseline, new
    heatmap)."""
    out, stats, npv, nb, nh = _absdiff_step_impl(
        props, h, w, 1, raw, baseline_raw, snap_flags[None], heatmap,
        valid[None], prev=prev, seeds=seed[None], ring=True)
    return out, stats[0], npv, nb, nh


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3),
                   donate_argnums=(5, 6, 8))  # prev/base/heat carry
def absdiff_step_ring_stacked(props: DiPsProperties, h: int, w: int, s: int,
                              raw: jnp.ndarray, prev: jnp.ndarray,
                              baseline_raw: jnp.ndarray,
                              snap_flags: jnp.ndarray, heatmap: jnp.ndarray,
                              valid: jnp.ndarray, seeds: jnp.ndarray):
    """Stacked-stream ring-protocol absdiff step (per-stream seeds (s,),
    flags/valid (s, B); prev/baseline u8 (3, s*Hp, Wp))."""
    return _absdiff_step_impl(props, h, w, s, raw, baseline_raw, snap_flags,
                              heatmap, valid, prev=prev, seeds=seeds,
                              ring=True)
