"""On-device kernel-geometry autotuner: ``python -m dips_tpu.autotune``.

The Pallas kernels' block geometries are measurement-driven (analytic
VMEM/bandwidth models failed repeatedly — BASELINE.md "silicon-pinned
block-geometry methodology"), and the baked-in numbers in
``ops/pallas_fused.py`` are TPU v5e measurements.  This tool reproduces the
methodology on the attached device so other TPU generations get their own
pins without code changes:

* **median ring kernel**: per-window row-block VMEM product caps
  (``_RING_BH_PRODUCT_CAPS``) — the largest ``wp * bh`` plane that compiles
  without a Mosaic scoped-VMEM overflow, found by hill-climbing from the
  v5e prior (each probe is a full compile, ~20-40 s, so the walk starts at
  the prior instead of bisecting from scratch);
* **raw absdiff kernel**: the DMA-sweet-spot input-block size
  (``_RAW_TARGET_BLOCK_BYTES``) — the kernel is DMA-bound, so every
  candidate block height is *timed* (device-resident ``lax.fori_loop``,
  min-of-3 two-point fit, the bench.py methodology) and the fastest block's
  byte size becomes the target;
* **band-mode slab ring kernel** (``--mesh SxR``): the same OOM-edge walk
  at the OWNED slab height a row-sharded deployment runs, with the
  neighbour-band input blocks resident — persisted per-(device-kind,
  window, owned-height) and consumed automatically by the sharded
  engines.

Results persist per device kind via :mod:`dips_tpu.ops.tuning`; the
geometry pickers consult that store before the baked-in pins, so running
this once per machine is sufficient and never required.  Probing uses the
picker override hooks with a FRESH jit closure per probe (the overrides
are invisible to jax's jit cache by design).
"""

from __future__ import annotations

import argparse
import logging
import sys
import time
from typing import Callable, Iterable, Optional, Tuple

from .ops import tuning
from .ops.reference import pad_geometry
from .properties import DiPsMethod, DiPsProperties, OutputMode

log = logging.getLogger("dips_tpu.autotune")


class ProbeOOM(Exception):
    """The probed geometry overflowed scoped VMEM (an expected outcome)."""


_OOM_MARKERS = ("vmem", "scoped", "resource_exhausted", "exceeds the limit",
                "out of memory")


def _looks_oom(e: BaseException) -> bool:
    msg = str(e).lower()
    return any(m in msg for m in _OOM_MARKERS)


def _bh_candidates(hp: int) -> list:
    """Row-block candidates: multiples of 8 dividing hp, ascending."""
    return [8 * d for d in range(1, hp // 8 + 1) if hp % (8 * d) == 0]


def find_largest_fitting(candidates: Iterable[int], prior: int,
                         fits: Callable[[int], bool]) -> Optional[int]:
    """Largest candidate for which ``fits`` holds, assuming fit is monotone
    (smaller always fits if larger does).  Walks from the candidate nearest
    ``prior`` — one probe when the prior is already the edge — instead of
    bisecting blind (each probe is a ~30 s compile on real hardware).
    Returns None when nothing fits."""
    cands = sorted(set(candidates))
    if not cands:
        return None
    i = min(range(len(cands)), key=lambda k: abs(cands[k] - prior))
    if fits(cands[i]):
        while i + 1 < len(cands) and fits(cands[i + 1]):
            i += 1
        return cands[i]
    while i > 0:
        i -= 1
        if fits(cands[i]):
            return cands[i]
    return None


def _two_point_fit(run: Callable[[int], None], iters: Tuple[int, int],
                   repeats: int = 3) -> float:
    """Seconds per loop iteration: min-of-``repeats`` two-point fit (the
    bench.py methodology — tunnel dispatch noise is additive, so the min
    of repeated runs and the n2-n1 delta cancel it).  The delta must also
    DOMINATE the ~30 ms per-call RPC noise (bench.py measured a +53%
    artifact from a noise-sized delta), or probes would be misranked."""
    n1, n2 = iters
    while True:
        times = []
        for n in (n1, n2):
            best = None
            for _ in range(repeats):
                t0 = time.time()
                run(n)
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            times.append(best)
        per = (times[1] - times[0]) / (n2 - n1)
        if per > 0 and times[1] - times[0] >= 0.25:
            return per
        n1, n2 = n1 * 4, n2 * 4
        log.info("noisy/non-positive fit, escalating to iters=(%d, %d)",
                 n1, n2)


def _ring_measure_factory(window: int, h: int, w: int, t: int, b: int,
                          approx: bool = False):
    """measure(fpb, bh) -> seconds/step for the median ring kernel at a
    forced geometry; raises ProbeOOM when Mosaic rejects the footprint."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from .ops import pallas_fused

    props = DiPsProperties(window_size=window, temporal_size=t,
                           method=DiPsMethod.OVERALL,
                           output=OutputMode.COLORIZE, approx_median=approx)
    hp, wp = pad_geometry(h, w)
    # zero frames: the kernels are data-independent (fixed selection
    # networks), so timing is content-blind — and a compressible upload
    # matters on relayed dev links (a 1080p b=64 random batch is ~400 MB,
    # tens of minutes at degraded tunnel bandwidth)
    raw = jnp.zeros((b, 3, hp, wp), jnp.uint8)
    # flags/valid/off/seed are CLOSED OVER by each probe's fresh jit
    # closure: they must be HOST (numpy) arrays.  A closed-over
    # jax.Array becomes an MLIR constant at lowering time and
    # materialising it is a device->host fetch costing MINUTES through
    # the axon relay — per probe (bench.py "Cold start anatomy").
    import numpy as np
    flags = np.zeros((1, b), bool)
    flags[0, 0] = True
    valid = np.ones((1, b), bool)
    off = np.zeros((1,), np.int32)
    seed = np.zeros((1,), np.int32)
    state0 = (jnp.zeros((t, hp, wp), jnp.float32),   # ring
              jnp.zeros((hp, wp), jnp.float32),      # prev
              jnp.zeros((hp, wp), jnp.float32),      # baseline
              jnp.zeros((hp, wp), jnp.float32))      # heatmap

    def measure(fpb: int, bh: int) -> float:
        @jax.jit  # fresh closure per probe: the override re-traces
        def loop(n, raw, st):
            def body(_, carry):
                (rg, pv, bl, hm), acc = carry
                out, stats, rg, pv, bl, hm = (
                    pallas_fused._batch_step_ring_impl(
                        props, h, w, 1, raw, rg, pv, bl, flags, hm, valid,
                        off, seed))
                # consume outputs so nothing is dead-code-eliminated
                return (rg, pv, bl, hm), acc + stats.sum() + out.ravel()[
                    0].astype(jnp.float32)
            return lax.fori_loop(0, n, body, (st, jnp.float32(0)))

        old = pallas_fused._RING_GEOMETRY_OVERRIDE
        pallas_fused._RING_GEOMETRY_OVERRIDE = (fpb, bh)
        try:
            try:
                float(loop(2, raw, state0)[1])  # compile + warm-up
            except ProbeOOM:
                raise
            except Exception as e:
                if _looks_oom(e):
                    raise ProbeOOM(f"bh={bh}: {str(e)[:160]}") from None
                raise
            return _two_point_fit(
                lambda n: float(loop(n, raw, state0)[1]), (4, 12))
        finally:
            pallas_fused._RING_GEOMETRY_OVERRIDE = old

    return measure, hp, wp


def _raw_measure_factory(h: int, w: int, t: int, b: int):
    """measure(bh) -> seconds/step for the raw absdiff ring kernel at a
    forced block height (fpb stays on the picker's rule)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from .ops import pallas_fused

    props = DiPsProperties(output=OutputMode.ABSDIFF, temporal_size=t,
                           method=DiPsMethod.OVERALL)
    hp, wp = pad_geometry(h, w)
    raw = jnp.zeros((b, 3, hp, wp), jnp.uint8)  # see _ring_measure_factory
    import numpy as np
    flags = np.zeros((1, b), bool)  # closed over: HOST arrays (see
    flags[0, 0] = True              # _ring_measure_factory)
    valid = np.ones((1, b), bool)
    seeds = np.zeros((1,), np.int32)
    base0 = jnp.zeros((3, hp, wp), jnp.uint8)
    heat0 = jnp.zeros((hp, wp), jnp.float32)

    def measure(bh: int) -> float:
        @jax.jit  # fresh closure per probe
        def loop(n, raw, bl, hm):
            def body(_, carry):
                bl, hm, acc = carry
                out, stats, _, bl, hm = pallas_fused._absdiff_step_impl(
                    props, h, w, 1, raw, bl, flags, hm, valid, prev=bl,
                    seeds=seeds, ring=True)
                return bl, hm, acc + stats.sum() + out.ravel()[0].astype(
                    jnp.float32)
            return lax.fori_loop(0, n, body, (bl, hm, jnp.float32(0)))

        old = pallas_fused._RAW_BH_OVERRIDE
        pallas_fused._RAW_BH_OVERRIDE = bh
        try:
            try:
                float(loop(2, raw, base0, heat0)[2])
            except Exception as e:
                if _looks_oom(e):
                    raise ProbeOOM(f"bh={bh}: {str(e)[:160]}") from None
                raise
            return _two_point_fit(
                lambda n: float(loop(n, raw, base0, heat0)[2]), (5, 15))
        finally:
            pallas_fused._RAW_BH_OVERRIDE = old

    return measure, hp, wp


def _stacked_ring_measure_factory(window: int, h: int, w: int, t: int,
                                  b: int, s: int, approx: bool = False):
    """measure(fpb, bh) -> seconds/step for the STACKED median ring kernel
    (s streams folded along the row axis — the coalesced-serving shape)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from .ops import pallas_fused

    props = DiPsProperties(window_size=window, temporal_size=t,
                           method=DiPsMethod.OVERALL,
                           output=OutputMode.COLORIZE, approx_median=approx)
    hp, wp = pad_geometry(h, w)
    raw = jnp.zeros((b, 3, s * hp, wp), jnp.uint8)  # zeros: see
    flags = np.zeros((s, b), bool)                  # _ring_measure_factory
    flags[:, 0] = True                              # (closed-over = HOST)
    valid = np.ones((s, b), bool)
    off = np.zeros((s,), np.int32)
    seed = np.zeros((s,), np.int32)
    state0 = (jnp.zeros((t, s * hp, wp), jnp.float32),
              jnp.zeros((s * hp, wp), jnp.float32),
              jnp.zeros((s * hp, wp), jnp.float32),
              jnp.zeros((s * hp, wp), jnp.float32))

    def measure(fpb: int, bh: int) -> float:
        @jax.jit  # fresh closure per probe
        def loop(n, raw, st):
            def body(_, carry):
                (rg, pv, bl, hm), acc = carry
                out, stats, rg, pv, bl, hm = (
                    pallas_fused._batch_step_ring_impl(
                        props, h, w, s, raw, rg, pv, bl, flags, hm, valid,
                        off, seed))
                return (rg, pv, bl, hm), acc + stats.sum() + out.ravel()[
                    0].astype(jnp.float32)
            return lax.fori_loop(0, n, body, (st, jnp.float32(0)))

        old = pallas_fused._RING_GEOMETRY_OVERRIDE
        pallas_fused._RING_GEOMETRY_OVERRIDE = (fpb, bh)
        try:
            try:
                float(loop(2, raw, state0)[1])
            except Exception as e:
                if _looks_oom(e):
                    raise ProbeOOM(f"bh={bh}: {str(e)[:160]}") from None
                raise
            return _two_point_fit(
                lambda n: float(loop(n, raw, state0)[1]), (4, 12))
        finally:
            pallas_fused._RING_GEOMETRY_OVERRIDE = old

    return measure, hp, wp


def _slab_ring_measure_factory(window: int, h: int, w: int, t: int,
                               b: int, rows_ax: int, approx: bool = False,
                               s: int = 1):
    """measure(fpb, bh) -> seconds/step for the BAND-MODE slab ring
    kernel at the owned height a ``rows_ax``-way row-sharded deployment
    runs (hs = padded_height / rows_ax), with the two 8-row neighbour-
    band input blocks RESIDENT — so a cap measured here already includes
    the band VMEM debit and is consumed verbatim by
    ``pallas_fused._ring_geometry(slab_bands=True)``.  One shard's body
    is probed on one chip (zero bands; the ppermute exchange is pure
    ICI traffic, irrelevant to the Mosaic VMEM edge).  ``s`` > 1 probes
    the STACKED slab shape (s streams' owned slabs folded along one
    kernel's row axis — the multi-stream-per-shard grid deployment)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from .ops import pallas_fused

    props = DiPsProperties(window_size=window, temporal_size=t,
                           method=DiPsMethod.OVERALL,
                           output=OutputMode.COLORIZE, approx_median=approx)
    if props.window_size <= 1:
        raise ValueError("band-mode slabs need a stencil window (> 1)")
    hp, wp = pad_geometry(h, w)
    if hp % (8 * rows_ax):
        raise ValueError(
            f"padded height {hp} / {rows_ax} row shards is not 8-row "
            f"aligned — pick a rows axis dividing {hp // 8} tiles")
    hs = hp // rows_ax
    raw = jnp.zeros((b, 3, s * hs, wp), jnp.uint8)  # zeros: compressible
    bands = (jnp.zeros((b, 3, s * 8, wp), jnp.uint8),
             jnp.zeros((b, 3, s * 8, wp), jnp.uint8))
    flags = np.zeros((s, b), bool)  # closed over: HOST arrays (see
    flags[:, 0] = True              # _ring_measure_factory)
    valid = np.ones((s, b), bool)
    off = np.zeros((s,), np.int32)
    seed = np.zeros((s,), np.int32)
    bounds = np.asarray([0, hs], np.int32)
    state0 = (jnp.zeros((t, s * hs, wp), jnp.float32),
              jnp.zeros((s * hs, wp), jnp.float32),
              jnp.zeros((s * hs, wp), jnp.float32),
              jnp.zeros((s * hs, wp), jnp.float32))

    def measure(fpb: int, bh: int) -> float:
        @jax.jit  # fresh closure per probe
        def loop(n, raw, st):
            def body(_, carry):
                (rg, pv, bl, hm), acc = carry
                out, stats, rg, pv, bl, hm = (
                    pallas_fused._batch_step_ring_impl(
                        props, h, w, s, raw, rg, pv, bl, flags, hm, valid,
                        off, seed, row_bounds=bounds, bands=bands))
                return (rg, pv, bl, hm), acc + stats.sum() + out.ravel()[
                    0].astype(jnp.float32)
            return lax.fori_loop(0, n, body, (st, jnp.float32(0)))

        old = pallas_fused._RING_GEOMETRY_OVERRIDE
        pallas_fused._RING_GEOMETRY_OVERRIDE = (fpb, bh)
        try:
            try:
                float(loop(2, raw, state0)[1])
            except Exception as e:
                if _looks_oom(e):
                    raise ProbeOOM(f"bh={bh}: {str(e)[:160]}") from None
                raise
            return _two_point_fit(
                lambda n: float(loop(n, raw, state0)[1]), (4, 12))
        finally:
            pallas_fused._RING_GEOMETRY_OVERRIDE = old

    return measure, hs, wp


def _stacked_raw_measure_factory(h: int, w: int, t: int, b: int, s: int):
    """measure(bh) -> seconds/step for the STACKED raw absdiff ring
    kernel at a forced block height."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from .ops import pallas_fused

    props = DiPsProperties(output=OutputMode.ABSDIFF, temporal_size=t,
                           method=DiPsMethod.OVERALL)
    hp, wp = pad_geometry(h, w)
    raw = jnp.zeros((b, 3, s * hp, wp), jnp.uint8)
    flags = np.zeros((s, b), bool)   # closed over: HOST arrays
    flags[:, 0] = True
    valid = np.ones((s, b), bool)
    seeds = np.zeros((s,), np.int32)
    base0 = jnp.zeros((3, s * hp, wp), jnp.uint8)
    heat0 = jnp.zeros((s * hp, wp), jnp.float32)

    def measure(bh: int) -> float:
        @jax.jit  # fresh closure per probe
        def loop(n, raw, bl, hm):
            def body(_, carry):
                bl, hm, acc = carry
                out, stats, _, bl, hm = pallas_fused._absdiff_step_impl(
                    props, h, w, s, raw, bl, flags, hm, valid, prev=bl,
                    seeds=seeds, ring=True)
                return bl, hm, acc + stats.sum() + out.ravel()[0].astype(
                    jnp.float32)
            return lax.fori_loop(0, n, body, (bl, hm, jnp.float32(0)))

        old = pallas_fused._RAW_BH_OVERRIDE
        pallas_fused._RAW_BH_OVERRIDE = bh
        try:
            try:
                float(loop(2, raw, base0, heat0)[2])
            except Exception as e:
                if _looks_oom(e):
                    raise ProbeOOM(f"bh={bh}: {str(e)[:160]}") from None
                raise
            return _two_point_fit(
                lambda n: float(loop(n, raw, base0, heat0)[2]), (5, 15))
        finally:
            pallas_fused._RAW_BH_OVERRIDE = old

    return measure, hp, wp


def probe_ring_caps(windows=(3, 5, 7), h: int = 1080, w: int = 1920,
                    t: int = 4, b: int = 64,
                    measure_factory=_ring_measure_factory) -> dict:
    """Per-window wp*bh product caps on THIS device (largest geometry that
    compiles; ties broken by Mosaic, not by us).  Returns
    {window: {"cap", "bh", "wp", "sec_per_step", "fps"}}.

    Stored caps use the t=4 convention _ring_geometry derates from
    (cap * 96 // (48 + 12t)); measuring at a different ``t`` normalizes
    the edge back, so runtime derating reproduces the measured fit
    instead of double-derating.  Windows are clamped to the kernel's
    odd 1..7 domain (the properties clamp) — an unclamped key would be
    persisted under a cache entry the runtime never consults."""
    from .ops.pallas_fused import _RING_BH_PRODUCT_CAPS
    from .properties import DiPsProperties
    results = {}
    windows = sorted({DiPsProperties(window_size=win).window_size
                      for win in windows})
    for win in windows:
        measure, hp, wp = measure_factory(win, h, w, t, b)
        fpb = 8 if wp < 3000 else 4
        while b % fpb:
            fpb -= 1
        timings = {}

        def fits(bh, _m=measure, _f=fpb, _tm=timings):
            try:
                _tm[bh] = _m(_f, bh)
                log.info("w%d bh=%d: %.4f s/step", win, bh, _tm[bh])
                return True
            except ProbeOOM as e:
                log.info("w%d bh=%d: OOM (%s)", win, bh, e)
                return False

        prior_cap = _RING_BH_PRODUCT_CAPS.get(win, 56_320)
        prior_bh = max(prior_cap // wp, 8)
        best = find_largest_fitting(_bh_candidates(hp), prior_bh, fits)
        if best is None:
            log.warning("w%d: no candidate fits at %dx%d — skipping", win,
                        h, w)
            continue
        sec = timings[best]
        cap_t4 = wp * best * (48 + 12 * t) // (48 + 12 * 4)
        results[win] = {"cap": cap_t4, "bh": best, "wp": wp,
                        "sec_per_step": sec, "fps": b / sec}
    return results


def probe_raw_target(h: int = 1080, w: int = 1920, t: int = 4, b: int = 64,
                     max_probes: int = 6,
                     measure_factory=_raw_measure_factory) -> Optional[dict]:
    """Fastest input-block size for the DMA-bound raw kernel on THIS
    device: times up to ``max_probes`` block heights around the prior and
    returns {"target_bytes", "bh", "fps"} for the winner."""
    from .ops.pallas_fused import (_RAW_TARGET_BLOCK_BYTES,
                                   _ring_frames_per_step)
    measure, hp, wp = measure_factory(h, w, t, b)
    fpb = _ring_frames_per_step(b, hp, wp)
    in_row_bytes = 3 * fpb * wp
    cands = _bh_candidates(hp)
    prior_bh = max(_RAW_TARGET_BLOCK_BYTES // in_row_bytes, 8)
    # probe the candidates nearest the prior, fanning outwards
    cands.sort(key=lambda bh: abs(bh - prior_bh))
    best = None
    for bh in cands[:max_probes]:
        try:
            sec = measure(bh)
        except ProbeOOM as e:
            log.info("raw bh=%d: OOM (%s)", bh, e)
            continue
        log.info("raw bh=%d (%d KB block): %.0f fps", bh,
                 bh * in_row_bytes // 1024, b / sec)
        if best is None or sec < best[1]:
            best = (bh, sec)
    if best is None:
        return None
    bh, sec = best
    return {"target_bytes": bh * in_row_bytes, "bh": bh, "fps": b / sec}


def probe_stacked_ring_caps(s: int, windows=(3,), h: int = 1080,
                            w: int = 1920, t: int = 4,
                            b: int = 64) -> dict:
    """Stacked-shape twin of :func:`probe_ring_caps` (s streams folded
    along the row axis — what the serve coalescer dispatches)."""
    return probe_ring_caps(
        windows, h, w, t, b,
        measure_factory=lambda win, h2, w2, t2, b2:
            _stacked_ring_measure_factory(win, h2, w2, t2, b2, s))


def probe_stacked_raw_target(s: int, h: int = 1080, w: int = 1920,
                             t: int = 4, b: int = 64,
                             max_probes: int = 6) -> Optional[dict]:
    """Stacked-shape twin of :func:`probe_raw_target`."""
    return probe_raw_target(
        h, w, t, b, max_probes=max_probes,
        measure_factory=lambda h2, w2, t2, b2:
            _stacked_raw_measure_factory(h2, w2, t2, b2, s))


def probe_slab_ring_caps(rows_ax: int, windows=(3, 5, 7), h: int = 1080,
                         w: int = 1920, t: int = 4, b: int = 64,
                         s: int = 1) -> dict:
    """Band-mode slab twin of :func:`probe_ring_caps` for a
    ``rows_ax``-way row-sharded deployment (``--mesh SxR``): probes the
    ring kernel at the OWNED slab height with the neighbour-band blocks
    resident, so the persisted cap is consumed verbatim by the sharded
    engines (no analytic band debit, no operator hand-runs at Hp/R).
    ``s`` > 1 probes the STACKED slab shape (``--mesh SxR --stacked
    S_l`` — shards holding several streams' slabs).  Window 1 is
    skipped — no stencil, no bands, no slab geometry."""
    windows = tuple(win for win in windows if win > 1)
    return probe_ring_caps(
        windows, h, w, t, b,
        measure_factory=lambda win, h2, w2, t2, b2:
            _slab_ring_measure_factory(win, h2, w2, t2, b2, rows_ax, s=s))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="dips-autotune",
        description="Measure Pallas kernel block geometries on the attached "
                    "TPU and persist per-device-kind overrides "
                    "(~1-5 min; each probe is a full kernel compile)")
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--windows", type=int, nargs="+", default=[3, 5, 7])
    ap.add_argument("--temporal", type=int, default=4)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--skip-ring", action="store_true")
    ap.add_argument("--skip-raw", action="store_true")
    ap.add_argument("--stacked", type=int, metavar="S", default=None,
                    help="ALSO probe the S-stream STACKED kernels (the "
                         "coalesced-serving shape: s streams folded along "
                         "the row axis) and persist stacked_* overrides "
                         "the coalescer's engine consumes.  Probe count "
                         "is bounded: one OOM-edge walk per --windows "
                         "entry (<= the row-block divisor ladder, "
                         "typically 3-6 compiles) + <= 6 timed raw "
                         "probes; see OPERATIONS.md")
    ap.add_argument("--mesh", metavar="SxR", default=None,
                    help="ALSO probe the band-mode slab ring kernel at the "
                         "owned height an SxR (stream x rows) grid runs "
                         "(padded height / R, neighbour-band blocks "
                         "resident) and persist per-(device-kind, "
                         "owned-height) slab caps the sharded engines "
                         "consume automatically — replaces the manual "
                         "'re-run autotune at Hp/R' runbook step.  The "
                         "stream axis S only validates the spec; the "
                         "probe is per-shard.  One OOM-edge walk per "
                         "--windows entry (window 1 skipped: no stencil). "
                         "Composes with --stacked S_l: ALSO probes the "
                         "stacked slab shape (shards holding S_l "
                         "streams' slabs) under its own cache key")
    ap.add_argument("--dry-run", action="store_true",
                    help="measure and report, but do not write the cache")
    from .utils.compilecache import (add_compile_cache_flag,
                                     apply_compile_cache_flag)
    add_compile_cache_flag(ap)
    args = ap.parse_args(argv)
    apply_compile_cache_flag(args)
    logging.basicConfig(level=logging.INFO, stream=sys.stderr,
                        format="%(message)s")

    import jax
    if jax.default_backend() != "tpu":
        print(f"autotune needs a TPU (backend is "
              f"{jax.default_backend()!r}: CPU/GPU have no Mosaic VMEM "
              f"limits to measure); the baked-in v5e pins remain in use",
              file=sys.stderr)
        return 1
    kind = jax.devices()[0].device_kind
    print(f"autotuning on {kind} at {args.width}x{args.height} "
          f"(t={args.temporal}, b={args.batch})", file=sys.stderr)

    ring_caps = {}
    if not args.skip_ring:
        res = probe_ring_caps(tuple(args.windows), args.height, args.width,
                              args.temporal, args.batch)
        for win, r in res.items():
            print(f"  ring w{win}: cap {r['cap']} (bh={r['bh']}, "
                  f"{r['fps']:.0f} fps)", file=sys.stderr)
            ring_caps[win] = r["cap"]
    raw = None
    if not args.skip_raw:
        raw = probe_raw_target(args.height, args.width, args.temporal,
                               args.batch)
        if raw:
            print(f"  raw target: {raw['target_bytes']} bytes "
                  f"(bh={raw['bh']}, {raw['fps']:.0f} fps)", file=sys.stderr)

    stacked_caps = {}
    stacked_raw = None
    if args.stacked:
        s = max(2, int(args.stacked))
        if not args.skip_ring:
            res = probe_stacked_ring_caps(s, tuple(args.windows),
                                          args.height, args.width,
                                          args.temporal, args.batch)
            for win, r in res.items():
                print(f"  stacked[{s}] ring w{win}: cap {r['cap']} "
                      f"(bh={r['bh']}, {r['fps'] * s:.0f} fps aggregate)",
                      file=sys.stderr)
                stacked_caps[win] = r["cap"]
        if not args.skip_raw:
            stacked_raw = probe_stacked_raw_target(
                s, args.height, args.width, args.temporal, args.batch)
            if stacked_raw:
                print(f"  stacked[{s}] raw target: "
                      f"{stacked_raw['target_bytes']} bytes "
                      f"(bh={stacked_raw['bh']}, "
                      f"{stacked_raw['fps'] * s:.0f} fps aggregate)",
                      file=sys.stderr)

    slab_caps = {}
    stacked_slab_caps = {}
    if args.mesh:
        try:
            s_ax, r_ax = (int(v) for v in args.mesh.lower().split("x"))
        except ValueError:
            print(f"bad --mesh {args.mesh!r} (want SxR, e.g. 2x4)",
                  file=sys.stderr)
            return 2
        if s_ax < 1 or r_ax < 1:
            print(f"--mesh axes must be >= 1, got {args.mesh!r}",
                  file=sys.stderr)
            return 2
        hp = pad_geometry(args.height, args.width)[0]
        if hp % (8 * r_ax):
            print(f"--mesh rows axis {r_ax} does not 8-row-align the "
                  f"padded height {hp} (pick a divisor of {hp // 8} "
                  f"tiles)", file=sys.stderr)
            return 2
        hs = hp // r_ax
        res = probe_slab_ring_caps(r_ax, tuple(args.windows), args.height,
                                   args.width, args.temporal, args.batch)
        for win, r in res.items():
            print(f"  slab[{args.mesh}] ring w{win}: cap {r['cap']} "
                  f"(owned {hs} rows, bh={r['bh']}, {r['fps']:.0f} "
                  f"fps/shard)", file=sys.stderr)
            slab_caps.setdefault(win, {})[hs] = r["cap"]
        if args.stacked:
            # --mesh + --stacked compose: probe the stacked slab shape
            # (shards holding --stacked streams' owned slabs), persisted
            # under its own key for s>1 grid shards
            s_l = max(2, int(args.stacked))
            res = probe_slab_ring_caps(r_ax, tuple(args.windows),
                                       args.height, args.width,
                                       args.temporal, args.batch, s=s_l)
            for win, r in res.items():
                print(f"  stacked[{s_l}]-slab[{args.mesh}] ring w{win}: "
                      f"cap {r['cap']} (owned {hs} rows, bh={r['bh']}, "
                      f"{r['fps'] * s_l:.0f} fps/shard aggregate)",
                      file=sys.stderr)
                stacked_slab_caps.setdefault(win, {})[hs] = r["cap"]

    if args.dry_run:
        print("dry run: cache not written", file=sys.stderr)
        return 0
    path = tuning.save(
        kind, ring_caps=ring_caps or None,
        raw_target=raw["target_bytes"] if raw else None,
        stacked_ring_caps=stacked_caps or None,
        stacked_raw_target=(stacked_raw["target_bytes"]
                            if stacked_raw else None),
        slab_ring_caps=slab_caps or None,
        stacked_slab_ring_caps=stacked_slab_caps or None,
        meta={"geometry": f"{args.width}x{args.height}",
              "temporal": args.temporal, "batch": args.batch,
              **({"stacked": int(args.stacked)} if args.stacked else {}),
              **({"mesh": args.mesh} if args.mesh else {}),
              "tool": "dips_tpu.autotune"})
    print(f"saved: {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
