"""Deployment acceptance check: on-device parity against the numpy oracle.

``python -m dips_tpu.validate [--backend pallas|xla] [--quick]`` compiles the
pipeline on the CURRENT jax backend (TPU in production) and asserts the
numerics contract (DESIGN.md): integer modes byte-exact, f32 modes within
1 LSB, statistics and heatmaps to float tolerance.  Exit code 0 = the
installed jax/libtpu/dips_tpu stack produces correct results on this host.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from .models import DiPsEngine
from .ops.oracle import DiPsOracle
from .properties import (DiPsFilter, DiPsMethod, DiPsProperties,
                         OutputMode)


def _clip(n=10, h=24, w=140, seed=0):
    r = np.random.default_rng(seed)
    base = r.integers(0, 256, (h, w, 3), np.uint8)
    frames = np.empty((n, h, w, 3), np.uint8)
    for i in range(n):
        f = base.copy()
        f[(2 + 2 * i) % (h - 5):(2 + 2 * i) % (h - 5) + 5,
          (3 + 5 * i) % (w - 5):(3 + 5 * i) % (w - 5) + 5] = 255
        frames[i] = f
    return frames


CASES = [
    ("overall/colorize/sigmoid/w3/t4", DiPsProperties(), False),
    ("overall/colorize/unfiltered/w5/t2",
     DiPsProperties(window_size=5, temporal_size=2,
                    filter=DiPsFilter.UNFILTERED), True),
    ("per_frame/gray/inv_sig/w3/t3",
     DiPsProperties(method=DiPsMethod.PER_FRAME,
                    output=OutputMode.GRAYSCALE,
                    filter=DiPsFilter.INVERSE_SIGMOID, temporal_size=3),
     False),
    ("overall/absdiff (cv2 parity)",
     DiPsProperties(output=OutputMode.ABSDIFF, temporal_size=2), True),
    ("per_frame/threshold",
     DiPsProperties(method=DiPsMethod.PER_FRAME,
                    output=OutputMode.THRESHOLD, temporal_size=2,
                    change_threshold=20), True),
    ("overall/colorize/w7 + markers",
     DiPsProperties(window_size=7, temporal_size=2,
                    filter=DiPsFilter.UNFILTERED, refresh_markers=(5,)),
     True),
    ("overall/colorize/w7 approx-median",
     DiPsProperties(window_size=7, temporal_size=2,
                    filter=DiPsFilter.UNFILTERED, approx_median=True),
     True),
    ("overall/colorize/w5 quirk-compat",
     DiPsProperties(window_size=5, temporal_size=2,
                    filter=DiPsFilter.UNFILTERED, quirk_compat=True), True),
    ("overall/stats_only (no-map fleet mode)",
     DiPsProperties(output=OutputMode.STATS_ONLY, temporal_size=2,
                    refresh_markers=(5,)), True),
    ("overall/median no-maps (emit_maps=False)",
     DiPsProperties(window_size=3, temporal_size=2,
                    filter=DiPsFilter.UNFILTERED, emit_maps=False,
                    refresh_markers=(5,)), True),
    ("overall/absdiff + roi (analysis region)",
     DiPsProperties(output=OutputMode.ABSDIFF, temporal_size=2,
                    roi=(4, 10, 20, 120)), True),
    ("per_frame/colorize + roi",
     DiPsProperties(method=DiPsMethod.PER_FRAME, temporal_size=2,
                    filter=DiPsFilter.UNFILTERED, roi=(4, 10, 20, 120)),
     True),
]


def _record(results, case: str, ok: bool, t0: float, error=None):
    """Append one machine-readable case outcome (``--json`` artifact)."""
    if results is not None:
        results.append({"case": case, "ok": bool(ok),
                        "seconds": round(time.time() - t0, 2),
                        **({"error": str(error)[:500]} if error else {})})


def _run_stacked(verbose: bool, results=None) -> int:
    """Stacked-stream kernels (MultiStreamEngine's per-shard path): two
    streams in one kernel instance must match per-stream runs on THIS
    device."""
    import jax.numpy as jnp
    from .ops import pallas_fused
    from .ops.reference import pad_geometry

    t0 = time.time()
    try:
        s, t, b, h, w = 2, 2, 4, 24, 140
        hp, wp = pad_geometry(h, w)
        r = np.random.default_rng(1)
        raws = [jnp.asarray(r.integers(0, 256, (t + b, 3, hp, wp), np.uint8))
                for _ in range(s)]
        stacked = jnp.concatenate(raws, axis=2)
        flags = np.zeros((s, b), bool)
        flags[:, 0] = True
        valid = np.ones((s, b), bool)
        for st, one, base1, bases in [
            (pallas_fused.batch_step_stacked, pallas_fused.batch_step,
             lambda: jnp.zeros((hp, wp), jnp.float32),
             lambda: jnp.zeros((s * hp, wp), jnp.float32)),
            (pallas_fused.absdiff_step_stacked, pallas_fused.absdiff_step,
             lambda: jnp.zeros((3, hp, wp), jnp.uint8),
             lambda: jnp.zeros((3, s * hp, wp), jnp.uint8)),
        ]:
            props = (DiPsProperties(window_size=3, temporal_size=t,
                                    filter=DiPsFilter.UNFILTERED)
                     if one is pallas_fused.batch_step
                     else DiPsProperties(output=OutputMode.ABSDIFF,
                                         temporal_size=t))
            out_s, stats_s, _, _ = st(
                props, h, w, s, stacked, bases(), jnp.asarray(flags),
                jnp.zeros((s * hp, wp), jnp.float32), jnp.asarray(valid))
            for si in range(s):
                o1, st1, _, _ = one(
                    props, h, w, raws[si], base1(), jnp.asarray(flags[si]),
                    jnp.zeros((hp, wp), jnp.float32), jnp.asarray(valid[si]))
                d = np.abs(np.asarray(out_s[:, :, si * hp:(si + 1) * hp],
                                      np.int16)
                           - np.asarray(o1, np.int16))
                assert d.max() == 0, f"stacked stream {si} diff {d.max()}"
                np.testing.assert_allclose(np.asarray(stats_s[si]),
                                           np.asarray(st1), atol=1e-5)
        if verbose:
            print(f"  PASS {'stacked 2-stream kernels':<40s} "
                  f"({time.time() - t0:.1f}s)")
        _record(results, "stacked 2-stream kernels", True, t0)
        return 0
    except Exception as e:
        if verbose:
            print(f"  FAIL {'stacked 2-stream kernels':<40s} {e}")
        _record(results, "stacked 2-stream kernels", False, t0, e)
        return 1


def _run_slab(verbose: bool, results=None) -> int:
    """Row-slab kernel variant (parallel/grid2d.py's pallas body): the
    dynamic mask-row-window lowering (SMEM bounds) must be bit-identical
    to the static full-height kernel ON THIS DEVICE.  Emulates a 2-shard
    row split on one chip: the halo-extended slabs are built exactly as
    the ppermute exchange would deliver them (real neighbour rows
    interior, zeros at the global edges)."""
    import jax.numpy as jnp
    from .ops import pallas_fused
    from .ops.reference import pad_geometry

    t0 = time.time()
    try:
        t, b, h, w = 2, 4, 32, 140
        hp, wp = pad_geometry(h, w)
        hs = hp // 2  # 16-row slabs (8-aligned)
        ext = 8
        props = DiPsProperties(window_size=3, temporal_size=t,
                               filter=DiPsFilter.UNFILTERED,
                               roi=(4, 10, 28, 120))
        r = np.random.default_rng(2)
        raw = r.integers(0, 256, (t + b, 3, hp, wp), np.uint8)
        raw[..., h:, :] = 0
        raw[..., w:] = 0
        flags = np.zeros((b,), bool)
        flags[0] = True
        valid = np.ones((1, b), bool)
        zrow = np.zeros((t + b, 3, ext, wp), np.uint8)
        # slab 0: zero top halo | rows [0,16) | real rows [16,24)
        # slab 1: real rows [8,16) | rows [16,32) | zero bottom halo
        slab0 = np.concatenate([zrow, raw[..., :hs, :],
                                raw[..., hs:hs + ext, :]], axis=2)
        slab1 = np.concatenate([raw[..., hs - ext:hs, :], raw[..., hs:, :],
                                zrow], axis=2)
        y0, x0, y1, x1 = props.roi_bounds(h, w)
        outs, statss, nbs, nhs = [], [], [], []
        for k, slab in enumerate((slab0, slab1)):
            row0 = k * hs
            lo = np.clip(y0 - row0, 0, hs) + ext
            hi = np.clip(y1 - row0, 0, hs) + ext
            o, st, nb, nh = pallas_fused._batch_step_impl(
                props, h, w, 1, jnp.asarray(slab),
                jnp.zeros((hs + 2 * ext, wp), jnp.float32),
                jnp.asarray(flags[None]),
                jnp.zeros((hs + 2 * ext, wp), jnp.float32),
                jnp.asarray(valid),
                row_bounds=jnp.asarray([lo, hi], np.int32))
            outs.append(np.asarray(o)[..., ext:ext + hs, :])
            statss.append(np.asarray(st[0]))
            nbs.append(np.asarray(nb)[ext:ext + hs])
            nhs.append(np.asarray(nh)[ext:ext + hs])
        got_out = np.concatenate(outs, axis=-2)
        got_stats = statss[0] + statss[1]          # sum-partials add
        got_nb = np.concatenate(nbs, axis=-2)
        got_nh = np.concatenate(nhs, axis=-2)

        eo, es, eb, eh = pallas_fused.batch_step(
            props, h, w, jnp.asarray(raw), jnp.zeros((hp, wp), jnp.float32),
            jnp.asarray(flags), jnp.zeros((hp, wp), jnp.float32),
            jnp.asarray(valid[0]))
        assert (got_out == np.asarray(eo)).all(), "slab out != full kernel"
        np.testing.assert_allclose(got_stats[:, :2], np.asarray(es)[:, :2],
                                   atol=1e-5)
        np.testing.assert_allclose(
            np.maximum(statss[0][:, 2], statss[1][:, 2]),
            np.asarray(es)[:, 2], atol=1e-6)       # max combines by max
        np.testing.assert_allclose(got_stats[:, 3], np.asarray(es)[:, 3],
                                   atol=0)
        assert (got_nb == np.asarray(eb)).all(), "slab baseline diverged"
        assert (got_nh == np.asarray(eh)).all(), "slab heatmap diverged"
        if verbose:
            print(f"  PASS {'row-slab dyn-bounds kernel':<40s} "
                  f"({time.time() - t0:.1f}s)")
        _record(results, "row-slab dyn-bounds kernel", True, t0)
        return 0
    except Exception as e:
        if verbose:
            print(f"  FAIL {'row-slab dyn-bounds kernel':<40s} {e}")
        _record(results, "row-slab dyn-bounds kernel", False, t0, e)
        return 1


def _run_slab_bands(verbose: bool, results=None) -> int:
    """Band-mode slab construction on silicon (round 4 second pass,
    parallel/grid2d.py ``slab_impl="bands"``): the ring kernel's stacked
    sections read their boundary stencil taps from thin 8-row
    neighbour-band inputs instead of zeros.  Emulates a 2-shard row split
    of one stream on one chip: two stacked OWNED-coordinate sections with
    the band arrays built exactly as the ppermute exchange would deliver
    them must be bit-identical to the full-height ring kernel across two
    carried batches (window 5 reads 2 band rows; PER_FRAME carries
    prev)."""
    import jax.numpy as jnp
    from .ops import pallas_fused
    from .ops.reference import pad_geometry

    t0 = time.time()
    try:
        t, b, h, w = 2, 4, 32, 140
        hp, wp = pad_geometry(h, w)
        hs = hp // 2  # 16-row owned sections (8-aligned)
        props = DiPsProperties(window_size=5, temporal_size=t,
                               method=DiPsMethod.PER_FRAME,
                               filter=DiPsFilter.UNFILTERED)
        r = np.random.default_rng(5)
        flags = np.zeros((b,), bool)
        valid = np.ones((1, b), bool)
        zband = np.zeros((b, 3, 8, wp), np.uint8)
        ring = jnp.zeros((t, hp, wp), jnp.float32)     # stacked == full:
        prev = jnp.zeros((hp, wp), jnp.float32)        # contiguous halves
        base = jnp.zeros((hp, wp), jnp.float32)
        heat = jnp.zeros((hp, wp), jnp.float32)
        er, ep, eb, eh = ring, prev, base, heat
        offs, seeds = np.zeros(2, np.int32), np.ones(2, np.int32)
        for bi in range(2):
            raw = r.integers(0, 256, (b, 3, hp, wp), np.uint8)
            raw[..., h:, :] = 0
            raw[..., w:] = 0
            # the bands ppermute would deliver: zeros at the global edges,
            # the neighbour section's boundary rows interior
            btop = np.concatenate([zband, raw[..., hs - 8:hs, :]], axis=2)
            bbot = np.concatenate([raw[..., hs:hs + 8, :], zband], axis=2)
            fl = np.zeros((2, b), bool)
            out, stats, ring, prev, base, heat = (
                pallas_fused._batch_step_ring_impl(
                    props, h, w, 2, jnp.asarray(raw), ring, prev, base,
                    jnp.asarray(fl), heat, jnp.asarray(np.ones((2, b),
                                                               bool)),
                    jnp.asarray(offs), jnp.asarray(seeds),
                    row_bounds=jnp.asarray([0, hs], np.int32),
                    bands=(jnp.asarray(btop), jnp.asarray(bbot))))
            eo, es, er, ep, eb, eh = pallas_fused.batch_step_ring(
                props, h, w, jnp.asarray(raw), er, ep, eb,
                jnp.asarray(flags), eh, jnp.asarray(valid[0]),
                jnp.int32(offs[0]), jnp.int32(seeds[0]))
            assert (np.asarray(out) == np.asarray(eo)).all(), \
                f"batch {bi}: band-slab out != full-height ring kernel"
            got = np.asarray(stats)
            exp = np.asarray(es)
            np.testing.assert_allclose(got[0, :, :2] + got[1, :, :2],
                                       exp[:, :2], atol=1e-5)
            np.testing.assert_allclose(
                np.maximum(got[0, :, 2], got[1, :, 2]), exp[:, 2],
                atol=1e-6)
            np.testing.assert_allclose(got[0, :, 3] + got[1, :, 3],
                                       exp[:, 3], atol=0)
            for nm, a, e in (("ring", ring, er), ("prev", prev, ep),
                             ("baseline", base, eb), ("heatmap", heat, eh)):
                assert (np.asarray(a) == np.asarray(e)).all(), \
                    f"batch {bi}: band-slab {nm} state diverged"
            offs = (offs + b) % t
            seeds = np.zeros(2, np.int32)
        if verbose:
            print(f"  PASS {'slab-bands ring kernel (2-section)':<40s} "
                  f"({time.time() - t0:.1f}s)")
        _record(results, "slab-bands ring kernel (2-section)", True, t0)
        return 0
    except Exception as e:
        if verbose:
            print(f"  FAIL {'slab-bands ring kernel (2-section)':<40s} {e}")
        _record(results, "slab-bands ring kernel (2-section)", False, t0, e)
        return 1


def _run_raw_slab(verbose: bool, results=None) -> int:
    """Raw-kernel slab composition on silicon (the 2-D grid / rowsharded
    raw bodies, parallel/grid2d._pallas_raw_grid_body): a 2-shard row
    split of one stream — slab-local roi ``row_bounds`` through the
    scalar-prefetch window — must reproduce the full-height raw kernel:
    maps byte-exact, stats combining by sum/sum/max/sum.  Covers BOTH
    protocols: the tail body (OVERALL) and the ring body (PER_FRAME,
    carried prev/baseline slab state across two batches)."""
    import jax.numpy as jnp
    from .ops import pallas_fused
    from .ops.reference import pad_geometry

    t0 = time.time()
    try:
        t, b, h, w = 2, 4, 64, 140
        hp, wp = pad_geometry(h, w)
        hs = hp // 2
        props = DiPsProperties(output=OutputMode.ABSDIFF, temporal_size=t,
                               roi=(10, 4, 50, 36))
        y0, x0, y1, x1 = props.roi_bounds(h, w)
        r = np.random.default_rng(7)
        raw = r.integers(0, 256, (t + b, 3, hp, wp), np.uint8)
        raw[..., h:, :] = 0
        raw[..., w:] = 0
        flags = np.zeros((b,), bool)
        flags[0] = True
        valid = np.ones((1, b), bool)

        def bounds(k):
            row0 = k * hs
            return jnp.asarray([np.clip(y0 - row0, 0, hs),
                                np.clip(y1 - row0, 0, hs)], np.int32)

        # tail protocol (OVERALL): one call per emulated shard
        outs, statss, nhs = [], [], []
        for k in range(2):
            o, st, _, nh = pallas_fused._absdiff_step_impl(
                props, h, w, 1, jnp.asarray(raw[:, :, k * hs:(k + 1) * hs]),
                jnp.zeros((3, hs, wp), jnp.uint8), jnp.asarray(flags[None]),
                jnp.zeros((hs, wp), jnp.float32), jnp.asarray(valid),
                row_bounds=bounds(k))
            outs.append(np.asarray(o))
            statss.append(np.asarray(st[0]))
            nhs.append(np.asarray(nh))
        eo, es, _, eh = pallas_fused.absdiff_step(
            props, h, w, jnp.asarray(raw), jnp.zeros((3, hp, wp), jnp.uint8),
            jnp.asarray(flags), jnp.zeros((hp, wp), jnp.float32),
            jnp.asarray(valid[0]))
        got_out = np.concatenate(outs, axis=-2)
        assert (got_out == np.asarray(eo)).all(), "raw slab out != full"
        exp = np.asarray(es)
        np.testing.assert_allclose(statss[0][:, :2] + statss[1][:, :2],
                                   exp[:, :2], atol=1e-5)
        np.testing.assert_allclose(
            np.maximum(statss[0][:, 2], statss[1][:, 2]), exp[:, 2], atol=0)
        np.testing.assert_allclose(statss[0][:, 3] + statss[1][:, 3],
                                   exp[:, 3], atol=0)
        assert (np.concatenate(nhs, axis=-2) == np.asarray(eh)).all(), \
            "raw slab heatmap diverged"

        # the 2-D grid body's exact composition: TWO STREAMS' slabs
        # stacked along one kernel's row axis WITH the dyn-bounds window
        # (grid2d._pallas_raw_grid_body runs stacked sections sharing one
        # shard's bounds).  Full-height sections make the slab window
        # equal the roi rows, so each section must equal the plain roi
        # kernel byte-for-byte.
        raw2 = r.integers(0, 256, (t + b, 3, hp, wp), np.uint8)
        raw2[..., h:, :] = 0
        raw2[..., w:] = 0
        stacked = np.concatenate([raw, raw2], axis=2)
        fl2 = np.tile(flags[None], (2, 1))
        vd2 = np.ones((2, b), bool)
        o_s, st_s, _, nh_s = pallas_fused._absdiff_step_impl(
            props, h, w, 2, jnp.asarray(stacked),
            jnp.zeros((3, 2 * hp, wp), jnp.uint8), jnp.asarray(fl2),
            jnp.zeros((2 * hp, wp), jnp.float32), jnp.asarray(vd2),
            row_bounds=jnp.asarray([y0, y1], np.int32))
        for si, rw in enumerate((raw, raw2)):
            eo, es, _, eh = pallas_fused.absdiff_step(
                props, h, w, jnp.asarray(rw),
                jnp.zeros((3, hp, wp), jnp.uint8), jnp.asarray(flags),
                jnp.zeros((hp, wp), jnp.float32), jnp.asarray(valid[0]))
            sect = slice(si * hp, (si + 1) * hp)
            assert (np.asarray(o_s)[:, :, sect] == np.asarray(eo)).all(), \
                f"stacked+bounds stream {si} out"
            np.testing.assert_allclose(np.asarray(st_s[si]),
                                       np.asarray(es), atol=1e-5)
            assert (np.asarray(nh_s)[sect] == np.asarray(eh)).all(), \
                f"stacked+bounds stream {si} heatmap"

        # ring protocol (PER_FRAME): carried prev/baseline slab state
        props_r = DiPsProperties(output=OutputMode.ABSDIFF, temporal_size=t,
                                 method=DiPsMethod.PER_FRAME,
                                 roi=(10, 4, 50, 36))
        pv = [jnp.zeros((3, hs, wp), jnp.uint8) for _ in range(2)]
        bl = [jnp.zeros((3, hs, wp), jnp.uint8) for _ in range(2)]
        hm = [jnp.zeros((hs, wp), jnp.float32) for _ in range(2)]
        epv = jnp.zeros((3, hp, wp), jnp.uint8)
        ebl = jnp.zeros((3, hp, wp), jnp.uint8)
        ehm = jnp.zeros((hp, wp), jnp.float32)
        seed = np.ones((1,), np.int32)
        fl0 = np.zeros((b,), bool)
        for bi in range(2):
            rb = r.integers(0, 256, (b, 3, hp, wp), np.uint8)
            rb[..., h:, :] = 0
            rb[..., w:] = 0
            slab_out = []
            for k in range(2):
                o, st, pv[k], bl[k], hm[k] = pallas_fused._absdiff_step_impl(
                    props_r, h, w, 1,
                    jnp.asarray(rb[:, :, k * hs:(k + 1) * hs]),
                    bl[k], jnp.asarray(fl0[None]), hm[k],
                    jnp.asarray(valid), prev=pv[k],
                    seeds=jnp.asarray(seed), ring=True,
                    row_bounds=bounds(k))
                slab_out.append(np.asarray(o))
            eo, es, epv, ebl, ehm = pallas_fused.absdiff_step_ring(
                props_r, h, w, jnp.asarray(rb), epv, ebl,
                jnp.asarray(fl0), ehm, jnp.asarray(valid[0]),
                jnp.int32(seed[0]))
            assert (np.concatenate(slab_out, axis=-2)
                    == np.asarray(eo)).all(), f"ring batch {bi} out"
            assert (np.concatenate([np.asarray(p) for p in pv], axis=-2)
                    == np.asarray(epv)).all(), f"ring batch {bi} prev"
            assert (np.concatenate([np.asarray(x) for x in hm], axis=-2)
                    == np.asarray(ehm)).all(), f"ring batch {bi} heatmap"
            seed = np.zeros((1,), np.int32)
        if verbose:
            print(f"  PASS {'raw slab row-bounds (tail+stacked+ring)':<40s} "
                  f"({time.time() - t0:.1f}s)")
        _record(results, "raw slab row-bounds (tail+stacked+ring)", True, t0)
        return 0
    except Exception as e:
        if verbose:
            print(f"  FAIL {'raw slab row-bounds (tail+stacked+ring)':<40s} {e}")
        _record(results, "raw slab row-bounds (tail+stacked+ring)", False, t0, e)
        return 1


def _run_band_no_maps(verbose: bool, results=None) -> int:
    """Composition gate: band-mode slabs x emit_maps=False (the two
    round-4 surfaces together — a row-sharded no-map fleet).  The
    2-section band-mode ring kernel with zero output channels must
    reproduce the full-height no-maps ring kernel's statistics and every
    piece of carried state across two batches."""
    import jax.numpy as jnp
    from .ops import pallas_fused
    from .ops.reference import pad_geometry

    t0 = time.time()
    try:
        t, b, h, w = 2, 4, 32, 140
        hp, wp = pad_geometry(h, w)
        hs = hp // 2
        props = DiPsProperties(window_size=3, temporal_size=t,
                               filter=DiPsFilter.UNFILTERED,
                               emit_maps=False)
        assert props.out_channels == 0
        r = np.random.default_rng(9)
        valid = np.ones((1, b), bool)
        zband = np.zeros((b, 3, 8, wp), np.uint8)
        ring = jnp.zeros((t, hp, wp), jnp.float32)
        prev = jnp.zeros((hp, wp), jnp.float32)
        base = jnp.zeros((hp, wp), jnp.float32)
        heat = jnp.zeros((hp, wp), jnp.float32)
        # expected-path state must NOT alias the slab path's: in OVERALL
        # the impl returns its prev input unchanged, and batch_step_ring
        # DONATES its state args — an aliased buffer would be deleted
        # under the slab path's feet
        er = jnp.zeros((t, hp, wp), jnp.float32)
        ep = jnp.zeros((hp, wp), jnp.float32)
        eb = jnp.zeros((hp, wp), jnp.float32)
        eh = jnp.zeros((hp, wp), jnp.float32)
        offs, seeds = np.zeros(2, np.int32), np.ones(2, np.int32)
        for bi in range(2):
            raw = r.integers(0, 256, (b, 3, hp, wp), np.uint8)
            raw[..., h:, :] = 0
            raw[..., w:] = 0
            btop = np.concatenate([zband, raw[..., hs - 8:hs, :]], axis=2)
            bbot = np.concatenate([raw[..., hs:hs + 8, :], zband], axis=2)
            fl = np.zeros((2, b), bool)
            fl[:, 0] = bi == 0
            out, stats, ring, prev, base, heat = (
                pallas_fused._batch_step_ring_impl(
                    props, h, w, 2, jnp.asarray(raw), ring, prev, base,
                    jnp.asarray(fl), heat,
                    jnp.asarray(np.ones((2, b), bool)),
                    jnp.asarray(offs), jnp.asarray(seeds),
                    row_bounds=jnp.asarray([0, hs], np.int32),
                    bands=(jnp.asarray(btop), jnp.asarray(bbot))))
            assert out.shape[1] == 0, "no-maps run emitted map channels"
            eo, es, er, ep, eb, eh = pallas_fused.batch_step_ring(
                props, h, w, jnp.asarray(raw), er, ep, eb,
                jnp.asarray(fl[0]), eh, jnp.asarray(valid[0]),
                jnp.int32(offs[0]), jnp.int32(seeds[0]))
            got, exp = np.asarray(stats), np.asarray(es)
            np.testing.assert_allclose(got[0, :, :2] + got[1, :, :2],
                                       exp[:, :2], atol=1e-5)
            np.testing.assert_allclose(
                np.maximum(got[0, :, 2], got[1, :, 2]), exp[:, 2],
                atol=1e-6)
            np.testing.assert_allclose(got[0, :, 3] + got[1, :, 3],
                                       exp[:, 3], atol=0)
            for nm, a, e in (("ring", ring, er), ("prev", prev, ep),
                             ("baseline", base, eb), ("heatmap", heat, eh)):
                assert (np.asarray(a) == np.asarray(e)).all(), \
                    f"batch {bi}: band+no-maps {nm} state diverged"
            offs = (offs + b) % t
            seeds = np.zeros(2, np.int32)
        if verbose:
            print(f"  PASS {'band slabs x emit_maps=False':<40s} "
                  f"({time.time() - t0:.1f}s)")
        _record(results, "band slabs x emit_maps=False", True, t0)
        return 0
    except Exception as e:
        if verbose:
            print(f"  FAIL {'band slabs x emit_maps=False':<40s} {e}")
        _record(results, "band slabs x emit_maps=False", False, t0, e)
        return 1


def _run_hwc(frames, verbose: bool, results=None) -> int:
    """Device-side input layout on silicon: an ``hwc_bgr`` engine (raw
    bytes up, transpose+pad+BGR swap on device) must be BIT-EXACT vs the
    host-planarize engine — the transform is pure layout, any deviation
    is a lowering bug."""
    h, w = frames.shape[1:3]
    props = DiPsProperties(window_size=3, temporal_size=2,
                           filter=DiPsFilter.UNFILTERED)
    t0 = time.time()
    try:
        ep = DiPsEngine(props, h, w, batch=4, backend="pallas")
        eh = DiPsEngine(props, h, w, batch=4, backend="pallas",
                        input_layout="hwc_bgr")
        op, sp = ep.process_frames(list(frames))
        oh, sh = eh.process_frames([f[:, :, ::-1] for f in frames])
        assert np.array_equal(oh, op), "hwc_bgr maps != planar maps"
        np.testing.assert_allclose(sh, sp, atol=1e-6)
        if verbose:
            print(f"  PASS input-layout hwc_bgr (bit-exact)      "
                  f"({time.time() - t0:.1f}s)")
        _record(results, "input-layout hwc_bgr", True, t0)
        return 0
    except Exception as e:
        if verbose:
            print(f"  FAIL input-layout hwc_bgr                   {e}")
        _record(results, "input-layout hwc_bgr", False, t0, e)
        return 1


def _run_downscale(frames, verbose: bool, results=None) -> int:
    """On-device input decimation on silicon: a ``downscale=2`` engine fed
    full-res frames vs a plain engine fed host-pooled frames
    (`reference.pool_frame_host` is the decimate's host twin — checkpoint
    tails depend on the two staying identical): maps must be BIT-exact,
    statistics to float tolerance (their reduction order differs).  The
    CPU suite pins this on the interpreter (tests/test_downscale.py); this
    gate proves the fused layout-prep + box-mean lowering on Mosaic."""
    from .ops import reference
    h, w = frames.shape[1:3]
    k = 2
    props = DiPsProperties(window_size=3, temporal_size=2,
                           filter=DiPsFilter.UNFILTERED)
    t0 = time.time()
    try:
        ek = DiPsEngine(props, h, w, batch=4, backend="pallas", downscale=k)
        e1 = DiPsEngine(props, h // k, w // k, batch=4, backend="pallas")
        ok_, sk = ek.process_frames(list(frames))
        o1, s1 = e1.process_frames(
            [reference.pool_frame_host(f, k) for f in frames])
        assert np.array_equal(ok_, o1), "downscale maps != pre-pooled maps"
        np.testing.assert_allclose(sk, s1, atol=1e-6)
        if verbose:
            print(f"  PASS on-device downscale=2 (maps bit-exact) "
                  f"({time.time() - t0:.1f}s)")
        _record(results, "on-device downscale=2", True, t0)
        return 0
    except Exception as e:
        if verbose:
            print(f"  FAIL on-device downscale=2                  {e}")
        _record(results, "on-device downscale=2", False, t0, e)
        return 1


def soak(n_frames: int = 512, verbose: bool = True, results=None) -> int:
    """On-device streaming soak: run ``n_frames`` through BOTH step
    protocols (ring-carry vs tail) with refresh markers and a mid-stream
    checkpoint/restore, asserting batch-by-batch equality.

    The CPU fuzz suite covers this logic on the interpreter; this gate
    exercises the compiled Mosaic kernels' carried-state path at length on
    the real device (ring slot rotation across many wraps, marker
    re-captures, donation reuse) where interpreter coverage can't reach.
    """
    import jax
    t0 = time.time()
    h, w, batch = 48, 180, 16
    props = DiPsProperties(window_size=3, temporal_size=4,
                           refresh_markers=(37, 201, 202, 450))
    # ring engine always runs the Pallas ring-carry path (interpret on
    # CPU hosts — slower, but the gate must exercise the carried-state
    # code, not diff an engine against itself); the tail engine is the
    # portable XLA protocol
    ring_eng = DiPsEngine(props, h, w, batch=batch, backend="pallas",
                          ring_carry=True)
    tail_eng = DiPsEngine(props, h, w, batch=batch, backend="xla",
                          ring_carry=False)
    r = np.random.default_rng(0)
    base = r.integers(0, 256, (h, w, 3), np.uint8)
    ckpt = None
    # last batch boundary at-or-before the midpoint (always hit)
    ckpt_at = max(0, (n_frames // 2 // batch - 1) * batch)
    try:
        for start in range(0, n_frames, batch):
            n = min(batch, n_frames - start)
            frames = []
            for i in range(n):
                f = base.copy()
                y, x = (start + i) * 3 % (h - 6), (start + i) * 7 % (w - 6)
                f[y:y + 6, x:x + 6] = r.integers(0, 256, 3, np.uint8)
                frames.append(f)
            o_r, s_r = ring_eng.process_batch(frames)
            o_t, s_t = tail_eng.process_batch(frames)
            d = np.abs(o_r.astype(np.int16) - o_t.astype(np.int16))
            assert d.max() <= 1, (
                f"protocol divergence {d.max()} at frame {start}")
            np.testing.assert_allclose(s_r, s_t, atol=1e-4, rtol=1e-3)
            if start == ckpt_at:
                ckpt = ring_eng.state_dict()
        # rewind the ring engine to mid-stream and replay one batch
        # against a TAIL engine loaded from the same checkpoint: the
        # rebuilt carried ring state must reproduce the portable
        # protocol's history, so a broken _rebuild_ring_state cannot
        # cancel out (both engines rebuilding identically-wrong state
        # would pass a ring-vs-ring comparison)
        assert ckpt is not None
        ring_eng.load_state_dict(ckpt)
        replay = ring_eng.frame_index
        frames = []
        for i in range(batch):
            f = base.copy()
            y, x = (replay + i) * 3 % (h - 6), (replay + i) * 7 % (w - 6)
            f[y:y + 6, x:x + 6] = 0  # divergent content is fine: both
            frames.append(f)         # engines see the same frames
        fresh_tail = DiPsEngine(props, h, w, batch=batch, backend="xla",
                                ring_carry=False)
        fresh_tail.load_state_dict(ckpt)
        o_a, s_a = ring_eng.process_batch(frames)
        o_b, s_b = fresh_tail.process_batch(frames)
        d = np.abs(o_a.astype(np.int16) - o_b.astype(np.int16))
        assert d.max() <= 1, f"ckpt replay divergence {d.max()}"
        np.testing.assert_allclose(s_a, s_b, atol=1e-4, rtol=1e-3)
        if verbose:
            print(f"  PASS soak {n_frames}f ring-vs-tail + ckpt replay "
                  f"({time.time() - t0:.1f}s)")
        _record(results, f"soak {n_frames}f ring-vs-tail + ckpt", True, t0)
        return 0
    except Exception as e:
        if verbose:
            print(f"  FAIL soak: {e}")
        _record(results, f"soak {n_frames}f ring-vs-tail + ckpt", False,
                t0, e)
        return 1


def run(backend: str = "pallas", quick: bool = False,
        verbose: bool = True, results=None) -> int:
    import jax
    frames = _clip(n=6 if quick else 10)
    h, w = frames.shape[1:3]
    failures = 0
    if verbose:
        print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    cases = CASES[:3] if quick else CASES
    # pallas ships two step protocols: ring-carry (the streaming default on
    # TPU) and the tail protocol (sharded paths) — the gate covers both
    modes = ((True, False) if backend == "pallas" and not quick
             else (None,))
    for name, props, exact in cases:
      # the numpy oracle dominates each case's wall time and is protocol-
      # independent — run it once per case, not once per step protocol
      o = DiPsOracle(props)
      exp_out, exp_stats = o.run(frames)
      if exp_out.ndim == 3:
          exp_out = exp_out[..., None]
      for ring in modes:
        t0 = time.time()
        if ring is not None:
            name_m = f"{name} [{'ring' if ring else 'tail'}]"
        else:
            name_m = name
        try:
            eng = DiPsEngine(props, h, w, batch=4, backend=backend,
                             ring_carry=ring)
            got_out, got_stats = eng.process_frames(list(frames))
            diff = np.abs(got_out.astype(np.int16) - exp_out.astype(np.int16))
            raw = props.output in (OutputMode.ABSDIFF, OutputMode.THRESHOLD)
            if props.out_channels == 0:
                # map-suppressed modes: no map bytes to compare — the
                # contract is the empty shape + the stats/heatmap below
                assert got_out.shape == exp_out.shape, (
                    f"no-map shape {got_out.shape} != {exp_out.shape}")
            elif raw:
                assert diff.max() == 0, f"u8 diff {diff.max()} != 0"
            else:
                # f32 paths: <= 1 LSB (XLA FMA/distribution ulp drift can
                # flip exactly-x.5 rounding ties); pure min/max paths
                # (exact=True) must additionally have only RARE tie flips
                assert diff.max() <= 1, f"u8 diff {diff.max()} > 1"
                if exact:
                    frac = (diff != 0).mean()
                    assert frac <= 0.01, f"tie-flip fraction {frac:.3%}"
            np.testing.assert_allclose(got_stats[:, :3], exp_stats[:, :3],
                                       atol=1e-4, rtol=1e-3)
            # changed_count: exact in integer modes; f32 emphasis paths may
            # flip knife-edge pixels at the threshold boundary only
            cnt_tol = 0 if raw else 0.01 * h * w
            cnt_err = np.abs(got_stats[:, 3] - exp_stats[:, 3]).max()
            assert cnt_err <= cnt_tol, f"changed_count off by {cnt_err}"
            np.testing.assert_allclose(eng.heatmap(), o.heatmap, atol=1e-3)
            if verbose:
                print(f"  PASS {name_m:<40s} ({time.time() - t0:.1f}s)")
            _record(results, name_m, True, t0)
        except Exception as e:
            failures += 1
            if verbose:
                print(f"  FAIL {name_m:<40s} {e}")
            _record(results, name_m, False, t0, e)
    if backend == "pallas" and not quick:
        failures += _run_stacked(verbose, results)
        failures += _run_slab(verbose, results)
        failures += _run_slab_bands(verbose, results)
        failures += _run_raw_slab(verbose, results)
        failures += _run_band_no_maps(verbose, results)
        failures += _run_hwc(frames, verbose, results)
        failures += _run_downscale(frames, verbose, results)
    if verbose:
        print("PASS: device numerics match the oracle" if not failures
              else f"FAIL: {failures} case(s) diverged")
    return 1 if failures else 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="dips_tpu on-device numerics acceptance check")
    ap.add_argument("--backend", default="pallas",
                    choices=["pallas", "xla"])
    ap.add_argument("--quick", action="store_true",
                    help=f"3 cases instead of {len(CASES)} (fewer compiles)")
    ap.add_argument("--soak", type=int, nargs="?", const=512, default=None,
                    metavar="N",
                    help="streaming soak: N frames (default 512) through "
                         "both step protocols with markers + mid-stream "
                         "checkpoint replay, asserting equality")
    ap.add_argument("--json", metavar="PATH", default=None,
                    help="write a machine-readable result artifact (per-"
                         "case pass/fail + environment) to PATH")
    ap.add_argument("--with-soak", type=int, nargs="?", const=512,
                    default=None, metavar="N",
                    help="ALSO run the N-frame soak after the case matrix "
                         "(one artifact covering both)")
    from .utils.compilecache import (add_compile_cache_flag,
                                     apply_compile_cache_flag)
    add_compile_cache_flag(ap)
    args = ap.parse_args(argv)
    apply_compile_cache_flag(args)

    results = [] if args.json else None
    t0 = time.time()
    # Warm the relay's D2H fetch path ONCE, explicitly attributed (the
    # bench.py split, round 4): the FIRST device->host fetch in a process
    # pays a one-time per-process relay channel bring-up (measured 193.8 s
    # for a pre-compile zeros fetch that had run NO kernel) — without this
    # it lands inside whichever CASE runs first and makes its per-case
    # seconds incomparable to its siblings (VALIDATE_r04 case 1: 229 s).
    import jax.numpy as _jnp
    tw = time.time()
    np.asarray(_jnp.zeros((8, 128), _jnp.float32))
    relay_warmup_s = round(time.time() - tw, 1)
    print(f"relay D2H warmup: {relay_warmup_s}s (one-time per-process "
          f"fetch-path setup, environmental — not any case's cost)")
    if args.soak is not None:
        rc = soak(args.soak, results=results)
    else:
        rc = run(args.backend, args.quick, results=results)
        if args.with_soak is not None and rc == 0:
            rc |= soak(args.with_soak, results=results)
    if args.json:
        import jax
        doc = {
            "tool": "dips_tpu.validate",
            "backend_arg": args.backend,
            "jax_backend": jax.default_backend(),
            "devices": [str(d) for d in jax.devices()],
            "jax_version": jax.__version__,
            "quick": bool(args.quick),
            "relay_warmup_s": relay_warmup_s,
            "ok": rc == 0,
            "cases": results,
            "passed": sum(1 for r in results if r["ok"]),
            "failed": sum(1 for r in results if not r["ok"]),
            "elapsed_s": round(time.time() - t0, 1),
        }
        with open(args.json, "w") as f:
            json.dump(doc, f, indent=1)
            f.write("\n")
        print(f"wrote {args.json}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
