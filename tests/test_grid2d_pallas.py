"""Fused Pallas body on the 2-D (stream x rows) grid (VERDICT r2 item 6).

The slab body (parallel/grid2d.py `_pallas_slab_body`) must be BIT-IDENTICAL
to the full-height stacked kernel: each shard halo-extends its slab by an
8-row ICI band, runs the stacked kernel with a dynamic mask row window, and
slices the owned rows back out.  Everything after the spatial median is
row-local, so this is an exact-equality contract, not a tolerance one.

Cross-backend (vs the XLA grid body / oracle) comparisons crop to the true
geometry like every other pallas-vs-oracle test: the kernel's wraparound
column taps differ from the oracle's zero-pad only in dead padding lanes.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dips_tpu.properties import (DiPsFilter, DiPsMethod, DiPsProperties,
                                 OutputMode)
from dips_tpu.ops import pallas_fused, reference
from dips_tpu.ops.reference import pad_geometry
from dips_tpu.parallel.grid2d import grid_mesh, make_grid_step, slab_rows_ok

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device test mesh")


def _inputs(props, h, w, s, b, seed=3):
    t = props.temporal_size
    hp, wp = pad_geometry(h, w)
    r = np.random.default_rng(seed)
    raw = np.zeros((s, t + b, 3, hp, wp), np.uint8)
    raw[..., :h, :w] = r.integers(0, 256, (s, t + b, 3, h, w), np.uint8)
    flags = np.zeros((s, b), bool)
    flags[:, 0] = True
    valid = np.ones((s, b), bool)
    return (jnp.asarray(raw), jnp.asarray(flags), jnp.asarray(valid),
            hp, wp)


def _run_grid(props, h, w, mesh, raw, flags, valid, hp, wp, backend):
    s = raw.shape[0]
    step = make_grid_step(props, h, w, mesh, backend=backend)
    return step(raw, jnp.zeros((s, hp, wp), jnp.float32), flags,
                jnp.zeros((s, hp, wp), jnp.float32), valid)


@pytest.mark.parametrize("window", [1, 3, 5])
@pytest.mark.parametrize("method", [DiPsMethod.OVERALL, DiPsMethod.PER_FRAME])
def test_slab_bit_identical_to_full_kernel(window, method):
    """grid-pallas == full-height pallas kernel, every output, bit-exact."""
    props = DiPsProperties(window_size=window, temporal_size=2,
                           method=method, filter=DiPsFilter.UNFILTERED)
    h, w, s, b = 32, 40, 2, 4
    raw, flags, valid, hp, wp = _inputs(props, h, w, s, b)
    mesh = grid_mesh(2, 4)
    out, stats, nb, nh, gmean = _run_grid(props, h, w, mesh, raw, flags,
                                          valid, hp, wp, "pallas")
    for si in range(s):
        eo, es, eb, eh = pallas_fused.batch_step(
            props, h, w, raw[si], jnp.zeros((hp, wp), jnp.float32),
            flags[si], jnp.zeros((hp, wp), jnp.float32), valid[si])
        np.testing.assert_array_equal(np.asarray(out[si]), np.asarray(eo))
        np.testing.assert_allclose(np.asarray(stats[si]), np.asarray(es),
                                   atol=1e-6)
        np.testing.assert_array_equal(np.asarray(nb[si]), np.asarray(eb))
        np.testing.assert_array_equal(np.asarray(nh[si]), np.asarray(eh))


def test_slab_extended_impl_matches_bands():
    """The legacy halo-extended tail construction stays available and
    bit-matches the band-mode default."""
    props = DiPsProperties(window_size=5, temporal_size=2,
                           method=DiPsMethod.PER_FRAME,
                           filter=DiPsFilter.UNFILTERED)
    h, w, s, b = 32, 40, 2, 4
    raw, flags, valid, hp, wp = _inputs(props, h, w, s, b)
    mesh = grid_mesh(2, 4)
    res = {}
    for impl in ("bands", "extended"):
        step = make_grid_step(props, h, w, mesh, backend="pallas",
                              slab_impl=impl)
        res[impl] = step(raw, jnp.zeros((s, hp, wp), jnp.float32), flags,
                         jnp.zeros((s, hp, wp), jnp.float32), valid)
    for a, e in zip(res["bands"], res["extended"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(e))


def test_slab_matches_xla_grid_cropped():
    """pallas grid == xla grid on the true geometry + stats + gmean."""
    props = DiPsProperties(window_size=3, temporal_size=2,
                           filter=DiPsFilter.UNFILTERED)
    h, w, s, b = 32, 40, 2, 4
    raw, flags, valid, hp, wp = _inputs(props, h, w, s, b)
    mesh = grid_mesh(2, 4)
    op, sp, nbp, nhp, gp = _run_grid(props, h, w, mesh, raw, flags, valid,
                                     hp, wp, "pallas")
    ox, sx, nbx, nhx, gx = _run_grid(props, h, w, mesh, raw, flags, valid,
                                     hp, wp, "xla")
    np.testing.assert_array_equal(np.asarray(op)[..., :h, :w],
                                  np.asarray(ox)[..., :h, :w])
    np.testing.assert_allclose(np.asarray(sp), np.asarray(sx), atol=1e-5)
    np.testing.assert_allclose(np.asarray(nhp)[..., :h, :w],
                               np.asarray(nhx)[..., :h, :w], atol=1e-4)
    np.testing.assert_allclose(float(gp), float(gx), rtol=1e-5)


def test_slab_roi_stats():
    """roi row bounds fold correctly into the slab mask windows (the roi
    spans a strict subset of the row shards)."""
    props = DiPsProperties(window_size=3, temporal_size=2,
                           filter=DiPsFilter.UNFILTERED,
                           roi=(6, 4, 26, 36))  # rows 6..26 over 4x8-row slabs
    h, w, s, b = 32, 40, 2, 4
    raw, flags, valid, hp, wp = _inputs(props, h, w, s, b)
    mesh = grid_mesh(2, 4)
    out, stats, nb, nh, gmean = _run_grid(props, h, w, mesh, raw, flags,
                                          valid, hp, wp, "pallas")
    for si in range(s):
        eo, es, eb, eh = pallas_fused.batch_step(
            props, h, w, raw[si], jnp.zeros((hp, wp), jnp.float32),
            flags[si], jnp.zeros((hp, wp), jnp.float32), valid[si])
        np.testing.assert_array_equal(np.asarray(out[si]), np.asarray(eo))
        np.testing.assert_allclose(np.asarray(stats[si]), np.asarray(es),
                                   atol=1e-6)
        np.testing.assert_array_equal(np.asarray(nh[si]), np.asarray(eh))


def test_slab_multi_batch_baseline_carry():
    """OVERALL baseline captured in batch 1 drives batch 2's diffs (the
    carried slab state round-trips the slice/pad cycle losslessly)."""
    props = DiPsProperties(window_size=3, temporal_size=2,
                           filter=DiPsFilter.UNFILTERED)
    h, w, s, b = 32, 40, 2, 4
    t = props.temporal_size
    raw1, flags, valid, hp, wp = _inputs(props, h, w, s, b, seed=5)
    raw2 = _inputs(props, h, w, s, b, seed=6)[0]
    mesh = grid_mesh(2, 4)
    step = make_grid_step(props, h, w, mesh, backend="pallas")
    no_flags = jnp.zeros((s, b), bool)

    bl = jnp.zeros((s, hp, wp), jnp.float32)
    hm = jnp.zeros((s, hp, wp), jnp.float32)
    _, _, bl, hm, _ = step(raw1, bl, flags, hm, valid)
    out2, stats2, _, _, _ = step(raw2, bl, no_flags, hm, valid)

    for si in range(s):
        eb = jnp.zeros((hp, wp), jnp.float32)
        eh = jnp.zeros((hp, wp), jnp.float32)
        _, _, eb, eh = pallas_fused.batch_step(props, h, w, raw1[si], eb,
                                               flags[si], eh, valid[si])
        eo, es, _, _ = pallas_fused.batch_step(props, h, w, raw2[si], eb,
                                               no_flags[si], eh, valid[si])
        np.testing.assert_array_equal(np.asarray(out2[si]), np.asarray(eo))
        np.testing.assert_allclose(np.asarray(stats2[si]), np.asarray(es),
                                   atol=1e-6)


def test_engine_2d_mesh_pallas_backend():
    """MultiStreamEngine on a 2-D mesh accepts backend='pallas' and matches
    the xla grid body through the full engine surface."""
    from dips_tpu.parallel.multistream import MultiStreamEngine
    props = DiPsProperties(window_size=3, temporal_size=2,
                           filter=DiPsFilter.UNFILTERED)
    h, w = 32, 40
    r = np.random.default_rng(7)
    clips = [[r.integers(0, 256, (h, w, 3), np.uint8) for _ in range(4)]
             for _ in range(2)]
    outs = {}
    for backend in ("pallas", "xla"):
        eng = MultiStreamEngine(props, h, w, n_streams=2, batch=4,
                                mesh=grid_mesh(2, 4), backend=backend)
        assert eng.backend == backend
        outs[backend] = eng.process_batch([list(c) for c in clips])
    op, sp, gp = outs["pallas"]
    ox, sx, gx = outs["xla"]
    np.testing.assert_array_equal(op, ox)
    np.testing.assert_allclose(sp, sx, atol=1e-5)
    np.testing.assert_allclose(gp, gx, rtol=1e-5)


def test_slab_alignment_guard():
    """Explicit pallas on a misaligned rows axis raises; slab_rows_ok
    reports the same predicate."""
    props = DiPsProperties(window_size=3, temporal_size=2)
    # h=24 -> hp=24; 24/4 = 6 rows per slab: not 8-aligned
    hp = pad_geometry(24, 40)[0]
    assert not slab_rows_ok(hp, 4)
    with pytest.raises(ValueError, match="8-row-aligned"):
        make_grid_step(props, 24, 40, grid_mesh(2, 4), backend="pallas")


def test_grid_raw_mode_pallas_accepted():
    """Round 5: raw (stencil-free) modes RUN on the 2-D pallas path
    (tests/test_grid2d_raw.py pins the numerics); misaligned slabs are
    still rejected with a clear error through the engine."""
    from dips_tpu.parallel.multistream import MultiStreamEngine
    props = DiPsProperties(output=OutputMode.ABSDIFF, temporal_size=2)
    eng = MultiStreamEngine(props, 32, 40, n_streams=2, batch=2,
                            mesh=grid_mesh(2, 4), backend="pallas")
    assert eng.backend == "pallas" and eng.ring_carry
    with pytest.raises(ValueError, match="8-row-aligned"):
        MultiStreamEngine(props, 24, 40, n_streams=2, batch=2,
                          mesh=grid_mesh(2, 4), backend="pallas")


def test_rowsharded_pallas_bit_identical():
    """make_rowsharded_step(backend='pallas') == full-height pallas kernel
    (single giant stream spatially split over 8 shards)."""
    from dips_tpu.parallel.rowsharded import make_rowsharded_step
    from jax.sharding import Mesh
    props = DiPsProperties(window_size=3, temporal_size=2,
                           filter=DiPsFilter.UNFILTERED)
    h, w, b = 64, 40, 4
    raw, flags, valid, hp, wp = _inputs(props, h, w, 1, b)
    raw, flags, valid = raw[0], flags[0], valid[0]
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("rows",))
    step = make_rowsharded_step(props, h, w, mesh, backend="pallas")
    out, stats, nb, nh = step(raw, jnp.zeros((hp, wp), jnp.float32), flags,
                              jnp.zeros((hp, wp), jnp.float32), valid)
    eo, es, eb, eh = pallas_fused.batch_step(
        props, h, w, raw, jnp.zeros((hp, wp), jnp.float32), flags,
        jnp.zeros((hp, wp), jnp.float32), valid)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(eo))
    np.testing.assert_allclose(np.asarray(stats), np.asarray(es), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(nb), np.asarray(eb))
    np.testing.assert_array_equal(np.asarray(nh), np.asarray(eh))


def test_rowsharded_pallas_alignment_guard():
    from dips_tpu.parallel.rowsharded import make_rowsharded_step
    from jax.sharding import Mesh
    props = DiPsProperties(window_size=3, temporal_size=2)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("rows",))
    # hp = 24 over 8 shards -> 3-row slabs: not 8-aligned
    with pytest.raises(ValueError, match="8-row-aligned"):
        make_rowsharded_step(props, 24, 40, mesh, backend="pallas")
