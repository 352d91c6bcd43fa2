"""Ring-carry on the sharded slab paths (VERDICT r3 item 2).

`grid2d._pallas_slab_body_ring` carries the filtered temporal ring, the
PER_FRAME previous plane, the baseline and the heatmap as device state in
OWNED-slab coordinates: each batch uploads ONLY the B new raw frames,
halo-exchanges an 8-row band over ICI, and runs the stacked ring kernel
with a dynamic mask row window — the 1-D ring protocol's T/(T+B) win now
applies to the 2-D (stream x rows) grid and to row-sharded single streams.

Everything after the spatial median is row-local, so owned rows must be
BIT-IDENTICAL to the full-height ring kernel across multiple batches (the
extension rows of carried state are zero-padded in / sliced off per batch
and must stay inert).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dips_tpu.properties import (DiPsFilter, DiPsMethod, DiPsProperties,
                                 OutputMode)
from dips_tpu.ops import pallas_fused
from dips_tpu.ops.reference import pad_geometry
from dips_tpu.parallel.grid2d import grid_mesh, make_grid_ring_step

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device test mesh")


def _batches(props, h, w, s, b, n_batches=2, seed=3):
    hp, wp = pad_geometry(h, w)
    r = np.random.default_rng(seed)
    raws = []
    for _ in range(n_batches):
        raw = np.zeros((s, b, 3, hp, wp), np.uint8)
        raw[..., :h, :w] = r.integers(0, 256, (s, b, 3, h, w), np.uint8)
        raws.append(jnp.asarray(raw))
    return raws, hp, wp


def _zero_state(props, s, hp, wp):
    t = props.temporal_size
    return (jnp.zeros((s, t, hp, wp), jnp.float32),   # ring
            jnp.zeros((s, hp, wp), jnp.float32),      # prev
            jnp.zeros((s, hp, wp), jnp.float32),      # baseline
            jnp.zeros((s, hp, wp), jnp.float32))      # heatmap


@pytest.mark.parametrize("window", [1, 3, 5])
@pytest.mark.parametrize("method", [DiPsMethod.OVERALL,
                                    DiPsMethod.PER_FRAME])
def test_grid_ring_bit_identical_to_full_kernel(window, method):
    """Two consecutive ring batches on the grid == the full-height ring
    kernel, every output AND every piece of carried state, bit-exact."""
    props = DiPsProperties(window_size=window, temporal_size=2,
                           method=method, filter=DiPsFilter.UNFILTERED)
    h, w, s, b = 32, 40, 2, 4
    raws, hp, wp = _batches(props, h, w, s, b)
    mesh = grid_mesh(2, 4)
    step = make_grid_ring_step(props, h, w, mesh)

    flags = np.zeros((s, b), bool)
    flags[:, 0] = True
    valid = jnp.asarray(np.ones((s, b), bool))
    t = props.temporal_size

    ring, prev, bl, hm = _zero_state(props, s, hp, wp)
    offs = jnp.zeros((s,), jnp.int32)
    seeds = jnp.ones((s,), jnp.int32)
    exp_state = [
        (jnp.zeros((t, hp, wp), jnp.float32),
         jnp.zeros((hp, wp), jnp.float32),
         jnp.zeros((hp, wp), jnp.float32),
         jnp.zeros((hp, wp), jnp.float32)) for _ in range(s)]
    exp_off = [0] * s

    for bi, raw in enumerate(raws):
        fl = jnp.asarray(flags if bi == 0 else np.zeros((s, b), bool))
        out, stats, ring, prev, bl, hm, gmean = step(
            raw, ring, prev, bl, fl, hm, valid, offs, seeds)
        assert np.isfinite(float(gmean))
        for si in range(s):
            er, ep, eb, eh = exp_state[si]
            eo, es, er, ep, eb, eh = pallas_fused.batch_step_ring(
                props, h, w, raw[si], er, ep, eb, fl[si], eh, valid[si],
                jnp.int32(exp_off[si]), seeds[si])
            exp_state[si] = (er, ep, eb, eh)
            np.testing.assert_array_equal(np.asarray(out[si]),
                                          np.asarray(eo))
            np.testing.assert_allclose(np.asarray(stats[si]),
                                       np.asarray(es), atol=1e-6)
            np.testing.assert_array_equal(np.asarray(ring[si]),
                                          np.asarray(er))
            np.testing.assert_array_equal(np.asarray(bl[si]),
                                          np.asarray(eb))
            np.testing.assert_array_equal(np.asarray(hm[si]),
                                          np.asarray(eh))
            if method == DiPsMethod.PER_FRAME:
                np.testing.assert_array_equal(np.asarray(prev[si]),
                                              np.asarray(ep))
            exp_off[si] = (exp_off[si] + b) % t
        offs = jnp.asarray(exp_off, jnp.int32)
        seeds = jnp.zeros((s,), jnp.int32)


@pytest.mark.parametrize("method", [DiPsMethod.OVERALL,
                                    DiPsMethod.PER_FRAME])
def test_grid_ring_extended_impl_matches_bands(method):
    """The legacy halo-extended slab construction stays available and
    bit-matches the band-mode default (both are exact reconstructions of
    the full-height kernel, so they must agree on everything)."""
    props = DiPsProperties(window_size=5, temporal_size=2, method=method,
                           filter=DiPsFilter.UNFILTERED)
    h, w, s, b = 32, 40, 2, 4
    raws, hp, wp = _batches(props, h, w, s, b)
    mesh = grid_mesh(2, 4)
    flags = np.zeros((s, b), bool)
    flags[:, 0] = True
    valid = jnp.asarray(np.ones((s, b), bool))
    res = {}
    for impl in ("bands", "extended"):
        step = make_grid_ring_step(props, h, w, mesh, slab_impl=impl)
        ring, prev, bl, hm = _zero_state(props, s, hp, wp)
        offs = jnp.zeros((s,), jnp.int32)
        seeds = jnp.ones((s,), jnp.int32)
        outs = []
        for bi, raw in enumerate(raws):
            fl = jnp.asarray(flags if bi == 0 else np.zeros((s, b), bool))
            out, stats, ring, prev, bl, hm, _ = step(
                raw, ring, prev, bl, fl, hm, valid, offs, seeds)
            outs.append(np.asarray(out))
            offs = (offs + b) % props.temporal_size
            seeds = jnp.zeros((s,), jnp.int32)
        res[impl] = (outs, np.asarray(ring), np.asarray(prev),
                     np.asarray(bl), np.asarray(hm))
    for a, e in zip(res["bands"], res["extended"]):
        if isinstance(a, list):
            for x, y in zip(a, e):
                np.testing.assert_array_equal(x, y)
        else:
            np.testing.assert_array_equal(a, e)


@pytest.mark.parametrize("seed", range(4))
def test_grid_band_fuzz_vs_single_device(seed):
    """Seeded fuzz of the band-mode 2-D grid engine: random median-mode
    properties (window/temporal/method/filter/chroma/emit_maps/roi/
    approx) over a (2 streams x 4 rows) mesh must reproduce per-stream
    single-device engines exactly, both protocols."""
    from dips_tpu.models import DiPsEngine
    from dips_tpu.parallel.multistream import MultiStreamEngine
    from dips_tpu.properties import ChromaFilter, OutputMode
    from tests.conftest import make_clip

    r = np.random.default_rng(4200 + seed)
    h = 32                       # 4 row shards x 8-aligned slabs
    w = int(r.integers(20, 90))
    quirk = bool(r.integers(0, 3) == 0)
    props = DiPsProperties(
        method=r.choice([DiPsMethod.OVERALL, DiPsMethod.PER_FRAME]),
        output=r.choice([OutputMode.COLORIZE, OutputMode.GRAYSCALE]),
        filter=r.choice([DiPsFilter.SIGMOID, DiPsFilter.INVERSE_SIGMOID,
                         DiPsFilter.UNFILTERED]),
        chroma=r.choice(list(ChromaFilter)),
        window_size=int(r.integers(1, 8)),
        temporal_size=int(r.integers(1, 5)),
        emit_maps=bool(r.integers(0, 3) != 0),
        quirk_compat=quirk,
        approx_median=(not quirk) and bool(r.integers(0, 3) == 0),
        roi=((4, 2, 30, 18) if r.random() < 0.3 else None))
    batch = int(r.integers(2, 5))
    n = 2 * batch
    clips = [make_clip(n=n, h=h, w=w, seed=100 + 8 * seed + k)
             for k in range(2)]
    ms = MultiStreamEngine(props, h, w, n_streams=2, batch=batch,
                           mesh=grid_mesh(2, 4), backend="pallas",
                           ring_carry=bool(r.integers(0, 2)))
    outs, stats = [], []
    for i in range(0, n, batch):
        o, st, _ = ms.process_batch([list(c[i:i + batch]) for c in clips])
        outs.append(o)
        stats.append(st)
    out = np.concatenate(outs, axis=1)
    stat = np.concatenate(stats, axis=1)
    for k, c in enumerate(clips):
        eng = DiPsEngine(props, h, w, batch=batch, backend="pallas")
        exp_out, exp_stats = eng.process_frames(list(c))
        np.testing.assert_array_equal(out[k], exp_out)
        np.testing.assert_allclose(stat[k], exp_stats, atol=1e-5)


def test_grid_ring_roi_stats():
    """roi row bounds fold into the slab mask windows on the ring path."""
    props = DiPsProperties(window_size=3, temporal_size=2,
                           filter=DiPsFilter.UNFILTERED,
                           roi=(6, 4, 26, 36))
    h, w, s, b = 32, 40, 2, 4
    raws, hp, wp = _batches(props, h, w, s, b, n_batches=1)
    mesh = grid_mesh(2, 4)
    step = make_grid_ring_step(props, h, w, mesh)
    flags = jnp.asarray(np.concatenate(
        [np.ones((s, 1), bool), np.zeros((s, b - 1), bool)], axis=1))
    valid = jnp.asarray(np.ones((s, b), bool))
    ring, prev, bl, hm = _zero_state(props, s, hp, wp)
    out, stats, *_ = step(raws[0], ring, prev, bl, flags, hm, valid,
                          jnp.zeros((s,), jnp.int32),
                          jnp.ones((s,), jnp.int32))
    for si in range(s):
        eo, es, *_ = pallas_fused.batch_step_ring(
            props, h, w, raws[0][si], jnp.zeros((2, hp, wp), jnp.float32),
            jnp.zeros((hp, wp), jnp.float32),
            jnp.zeros((hp, wp), jnp.float32), flags[si],
            jnp.zeros((hp, wp), jnp.float32), valid[si], jnp.int32(0),
            jnp.int32(1))
        np.testing.assert_array_equal(np.asarray(out[si]), np.asarray(eo))
        np.testing.assert_allclose(np.asarray(stats[si]), np.asarray(es),
                                   atol=1e-6)


@pytest.mark.parametrize("layout", ["planar", "hwc"])
def test_engine_2d_mesh_ring_carry(layout):
    """MultiStreamEngine on a 2-D mesh with ring_carry matches the tail
    grid engine through the full engine surface (multi-batch: the carried
    ring state must reproduce the tail protocol's history), in both
    input layouts (hwc = device-side transpose+pad before the grid
    step)."""
    from dips_tpu.parallel.multistream import MultiStreamEngine
    props = DiPsProperties(window_size=3, temporal_size=2,
                           filter=DiPsFilter.UNFILTERED)
    h, w = 32, 40
    r = np.random.default_rng(7)
    clips = [[r.integers(0, 256, (h, w, 3), np.uint8) for _ in range(8)]
             for _ in range(2)]
    res = {}
    for ring in (True, False):
        eng = MultiStreamEngine(props, h, w, n_streams=2, batch=4,
                                mesh=grid_mesh(2, 4), backend="pallas",
                                ring_carry=ring, input_layout=layout)
        assert eng.ring_carry is ring
        outs, stats = [], []
        for k in (0, 1):
            o, st, g = eng.process_batch(
                [list(c[4 * k:4 * k + 4]) for c in clips])
            outs.append(o)
            stats.append(st)
        res[ring] = (np.concatenate(outs, axis=1),
                     np.concatenate(stats, axis=1), eng.heatmaps())
    np.testing.assert_array_equal(res[True][0], res[False][0])
    np.testing.assert_allclose(res[True][1], res[False][1], atol=1e-5)
    np.testing.assert_allclose(res[True][2], res[False][2], atol=1e-4)


def test_engine_2d_ring_checkpoint_roundtrip(tmp_path):
    """Grid ring engines rebuild carried slab state from checkpoint tails."""
    from dips_tpu.parallel.multistream import MultiStreamEngine
    props = DiPsProperties(window_size=3, temporal_size=2,
                           filter=DiPsFilter.UNFILTERED)
    h, w = 32, 40
    r = np.random.default_rng(9)
    clips = [[r.integers(0, 256, (h, w, 3), np.uint8) for _ in range(8)]
             for _ in range(2)]
    eng = MultiStreamEngine(props, h, w, n_streams=2, batch=4,
                            mesh=grid_mesh(2, 4), backend="pallas",
                            ring_carry=True)
    eng.process_batch([list(c[:4]) for c in clips])
    p = str(tmp_path / "grid_ring.npz")
    eng.save(p)
    eng2 = MultiStreamEngine(props, h, w, n_streams=2, batch=4,
                             mesh=grid_mesh(2, 4), backend="pallas",
                             ring_carry=True)
    eng2.load(p)
    o1, s1, _ = eng.process_batch([list(c[4:]) for c in clips])
    o2, s2, _ = eng2.process_batch([list(c[4:]) for c in clips])
    np.testing.assert_array_equal(o1, o2)
    np.testing.assert_array_equal(s1, s2)


def test_engine_slab_impl_passthrough():
    """MultiStreamEngine(slab_impl=...) reaches the grid step builders:
    both impls produce identical results through the engine surface."""
    from dips_tpu.parallel.multistream import MultiStreamEngine
    from tests.conftest import make_clip
    props = DiPsProperties(window_size=3, temporal_size=2,
                           filter=DiPsFilter.UNFILTERED)
    h, w = 32, 40
    clips = [make_clip(n=4, h=h, w=w, seed=s) for s in range(2)]
    res = {}
    for impl in ("bands", "extended"):
        eng = MultiStreamEngine(props, h, w, n_streams=2, batch=4,
                                mesh=grid_mesh(2, 4), backend="pallas",
                                ring_carry=True, slab_impl=impl)
        o, st, _ = eng.process_batch([list(c) for c in clips])
        res[impl] = (o, st)
    np.testing.assert_array_equal(res["bands"][0], res["extended"][0])
    np.testing.assert_allclose(res["bands"][1], res["extended"][1],
                               atol=1e-6)
    with pytest.raises(ValueError, match="slab_impl"):
        MultiStreamEngine(props, h, w, n_streams=2, batch=4,
                          mesh=grid_mesh(2, 4), backend="pallas",
                          ring_carry=True, slab_impl="nope")


def test_grid_ring_guards():
    """xla backend cannot take the 2-D ring path; raw modes route to
    their own ring body (tests/test_grid2d_raw.py) and must respect the
    slab alignment guard."""
    from dips_tpu.parallel.multistream import MultiStreamEngine
    props = DiPsProperties(window_size=3, temporal_size=2)
    with pytest.raises(ValueError, match="ring_carry"):
        MultiStreamEngine(props, 32, 40, n_streams=2, batch=2,
                          mesh=grid_mesh(2, 4), backend="xla",
                          ring_carry=True)
    with pytest.raises(ValueError, match="8-row-aligned"):
        make_grid_ring_step(
            DiPsProperties(output=OutputMode.ABSDIFF), 24, 40,
            grid_mesh(2, 4))


def test_rowsharded_ring_bit_identical():
    """make_rowsharded_ring_step == full-height ring kernel across two
    batches (single giant stream spatially split over 8 shards)."""
    from dips_tpu.parallel.rowsharded import make_rowsharded_ring_step
    from jax.sharding import Mesh
    props = DiPsProperties(window_size=3, temporal_size=2,
                           filter=DiPsFilter.UNFILTERED)
    h, w, b, t = 64, 40, 4, 2
    hp, wp = pad_geometry(h, w)
    r = np.random.default_rng(11)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("rows",))
    step = make_rowsharded_ring_step(props, h, w, mesh)

    ring = er = jnp.zeros((t, hp, wp), jnp.float32)
    prev = ep = jnp.zeros((hp, wp), jnp.float32)
    bl = eb = jnp.zeros((hp, wp), jnp.float32)
    hm = eh = jnp.zeros((hp, wp), jnp.float32)
    off, seed = jnp.int32(0), jnp.int32(1)
    valid = jnp.asarray(np.ones((b,), bool))
    for bi in range(2):
        raw = np.zeros((b, 3, hp, wp), np.uint8)
        raw[..., :h, :w] = r.integers(0, 256, (b, 3, h, w), np.uint8)
        raw = jnp.asarray(raw)
        flags = jnp.asarray([bi == 0] + [False] * (b - 1))
        out, stats, ring, prev, bl, hm = step(raw, ring, prev, bl, flags,
                                              hm, valid, off, seed)
        eo, es, er, ep, eb, eh = pallas_fused.batch_step_ring(
            props, h, w, raw, er, ep, eb, flags, eh, valid, off, seed)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(eo))
        np.testing.assert_allclose(np.asarray(stats), np.asarray(es),
                                   atol=1e-6)
        np.testing.assert_array_equal(np.asarray(ring), np.asarray(er))
        np.testing.assert_array_equal(np.asarray(bl), np.asarray(eb))
        np.testing.assert_array_equal(np.asarray(hm), np.asarray(eh))
        off = jnp.int32((int(off) + b) % t)
        seed = jnp.int32(0)


def test_rowsharded_ring_guards():
    from dips_tpu.parallel.rowsharded import make_rowsharded_ring_step
    from jax.sharding import Mesh
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("rows",))
    # raw modes route to the raw ring body (tests/test_rowsharded_raw.py);
    # misaligned slabs are rejected on both bodies
    with pytest.raises(ValueError, match="8-row-aligned"):
        make_rowsharded_ring_step(
            DiPsProperties(output=OutputMode.ABSDIFF), 24, 40, mesh)
    with pytest.raises(ValueError, match="8-row-aligned"):
        make_rowsharded_ring_step(
            DiPsProperties(window_size=3, temporal_size=2), 24, 40, mesh)
