"""Stacked-stream kernel mode: s independent streams folded along the row
axis of ONE kernel instance (vs vmap's s instances).  Each stream must be
bit-identical to its own single-stream run — including stream-local halos
(no leakage across the stream boundary), per-stream capture flags and
per-stream statistics."""

import numpy as np
import jax.numpy as jnp
import pytest

from dips_tpu.ops import pallas_fused
from dips_tpu.ops.reference import pad_geometry
from dips_tpu.properties import (DiPsFilter, DiPsMethod, DiPsProperties,
                                 OutputMode)


def _stacked_inputs(s, t, b, hp, wp, seed=0):
    rng = np.random.default_rng(seed)
    raws = [jnp.asarray(rng.integers(0, 256, (t + b, 3, hp, wp), np.uint8))
            for _ in range(s)]
    stacked = jnp.concatenate(raws, axis=2)  # rows: stream-major
    return raws, stacked


@pytest.mark.parametrize("window", [1, 3, 7])
def test_stacked_batch_matches_per_stream(window):
    """Full pipeline: staggered per-stream flags + uneven validity."""
    s, t, b, h, w = 3, 2, 4, 16, 24
    hp, wp = pad_geometry(h, w)
    props = DiPsProperties(window_size=window, temporal_size=t,
                           filter=DiPsFilter.UNFILTERED)
    raws, stacked = _stacked_inputs(s, t, b, hp, wp, seed=window)
    flags = np.array([[True, False, False, False],
                      [False, True, False, False],   # late capture
                      [True, False, True, False]])   # refresh mid-batch
    valid = np.array([[True] * 4, [True, True, False, False],
                      [True] * 4])

    out_s, stats_s, nb_s, nh_s = pallas_fused.batch_step_stacked(
        props, h, w, s, stacked, jnp.zeros((s * hp, wp), jnp.float32),
        jnp.asarray(flags), jnp.zeros((s * hp, wp), jnp.float32),
        jnp.asarray(valid))

    for si in range(s):
        out1, stats1, nb1, nh1 = pallas_fused.batch_step(
            props, h, w, raws[si], jnp.zeros((hp, wp), jnp.float32),
            jnp.asarray(flags[si]), jnp.zeros((hp, wp), jnp.float32),
            jnp.asarray(valid[si]))
        np.testing.assert_array_equal(
            np.asarray(out_s[:, :, si * hp:(si + 1) * hp]),
            np.asarray(out1), err_msg=f"stream {si} w={window}")
        np.testing.assert_allclose(np.asarray(stats_s[si]),
                                   np.asarray(stats1), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(nb_s[si * hp:(si + 1) * hp]), np.asarray(nb1),
            atol=0)
        np.testing.assert_allclose(
            np.asarray(nh_s[si * hp:(si + 1) * hp]), np.asarray(nh1),
            atol=1e-6)


def test_stacked_halo_isolation():
    """A bright band at one stream's bottom edge must not bleed into the
    next stream's top rows through the spatial median halo."""
    s, t, b, h, w = 2, 1, 2, 16, 24
    hp, wp = pad_geometry(h, w)
    props = DiPsProperties(window_size=7, temporal_size=t,
                           filter=DiPsFilter.UNFILTERED)
    raw0 = np.zeros((t + b, 3, hp, wp), np.uint8)
    raw0[:, :, h - 3:h, :w] = 255          # bottom band in stream 0
    raw1 = np.zeros((t + b, 3, hp, wp), np.uint8)
    raw1[1:, :, 0:2, :w] = 200             # top band appears in stream 1
    stacked = jnp.concatenate([jnp.asarray(raw0), jnp.asarray(raw1)], axis=2)
    flags = jnp.asarray([[True, False], [True, False]])
    valid = jnp.ones((2, b), bool)
    out_s, _, _, _ = pallas_fused.batch_step_stacked(
        props, 16, 24, 2, stacked, jnp.zeros((2 * hp, wp), jnp.float32),
        flags, jnp.zeros((2 * hp, wp), jnp.float32), valid)
    out1, _, _, _ = pallas_fused.batch_step(
        props, 16, 24, jnp.asarray(raw1), jnp.zeros((hp, wp), jnp.float32),
        jnp.asarray([True, False]), jnp.zeros((hp, wp), jnp.float32),
        jnp.ones((b,), bool))
    np.testing.assert_array_equal(np.asarray(out_s[:, :, hp:]),
                                  np.asarray(out1))


@pytest.mark.parametrize("output", [OutputMode.ABSDIFF, OutputMode.THRESHOLD])
def test_stacked_absdiff_matches_per_stream(output):
    s, t, b, h, w = 4, 2, 4, 12, 40
    hp, wp = pad_geometry(h, w)
    props = DiPsProperties(output=output, temporal_size=t,
                           method=DiPsMethod.OVERALL)
    raws, stacked = _stacked_inputs(s, t, b, hp, wp, seed=9)
    flags = np.zeros((s, b), bool)
    flags[:, 0] = True
    flags[2, 2] = True  # stream-specific refresh
    valid = np.ones((s, b), bool)
    valid[1, 3] = False

    out_s, stats_s, nb_s, nh_s = pallas_fused.absdiff_step_stacked(
        props, h, w, s, stacked, jnp.zeros((3, s * hp, wp), jnp.uint8),
        jnp.asarray(flags), jnp.zeros((s * hp, wp), jnp.float32),
        jnp.asarray(valid))
    for si in range(s):
        out1, stats1, nb1, nh1 = pallas_fused.absdiff_step(
            props, h, w, raws[si], jnp.zeros((3, hp, wp), jnp.uint8),
            jnp.asarray(flags[si]), jnp.zeros((hp, wp), jnp.float32),
            jnp.asarray(valid[si]))
        np.testing.assert_array_equal(
            np.asarray(out_s[:, :, si * hp:(si + 1) * hp]),
            np.asarray(out1), err_msg=f"stream {si}")
        np.testing.assert_allclose(np.asarray(stats_s[si]),
                                   np.asarray(stats1), atol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(nb_s[:, si * hp:(si + 1) * hp]), np.asarray(nb1))
        np.testing.assert_allclose(
            np.asarray(nh_s[si * hp:(si + 1) * hp]), np.asarray(nh1),
            atol=1e-6)


def test_stacked_per_frame_method():
    s, t, b, h, w = 2, 3, 3, 10, 30
    hp, wp = pad_geometry(h, w)
    props = DiPsProperties(method=DiPsMethod.PER_FRAME, temporal_size=t,
                           output=OutputMode.GRAYSCALE,
                           filter=DiPsFilter.UNFILTERED)
    raws, stacked = _stacked_inputs(s, t, b, hp, wp, seed=3)
    flags = np.zeros((s, b), bool)
    valid = np.ones((s, b), bool)
    out_s, stats_s, _, _ = pallas_fused.batch_step_stacked(
        props, h, w, s, stacked, jnp.zeros((s * hp, wp), jnp.float32),
        jnp.asarray(flags), jnp.zeros((s * hp, wp), jnp.float32),
        jnp.asarray(valid))
    for si in range(s):
        out1, stats1, _, _ = pallas_fused.batch_step(
            props, h, w, raws[si], jnp.zeros((hp, wp), jnp.float32),
            jnp.asarray(flags[si]), jnp.zeros((hp, wp), jnp.float32),
            jnp.asarray(valid[si]))
        np.testing.assert_array_equal(
            np.asarray(out_s[:, :, si * hp:(si + 1) * hp]),
            np.asarray(out1))
        np.testing.assert_allclose(np.asarray(stats_s[si]),
                                   np.asarray(stats1), atol=1e-6)


@pytest.mark.parametrize("seed", range(4))
def test_stacked_fuzz(seed):
    """Random configs + random per-stream flags/validity: stacked must
    stay bit-identical to per-stream runs (both kernels)."""
    import sys
    sys.path.insert(0, "tests")
    from test_fuzz_configs import _random_props

    r = np.random.default_rng(5000 + seed)
    props = _random_props(r)
    s = int(r.integers(2, 5))
    t, b = props.temporal_size, int(r.integers(1, 6))
    h, w = int(r.integers(9, 26)), int(r.integers(20, 100))
    hp, wp = pad_geometry(h, w)
    raws = [jnp.asarray(r.integers(0, 256, (t + b, 3, hp, wp), np.uint8))
            for _ in range(s)]
    stacked = jnp.concatenate(raws, axis=2)
    flags = r.random((s, b)) < 0.3
    flags[:, 0] |= True
    valid = r.random((s, b)) < 0.8
    raw_mode = props.output in (OutputMode.ABSDIFF, OutputMode.THRESHOLD)
    if raw_mode:
        st, one = pallas_fused.absdiff_step_stacked, pallas_fused.absdiff_step
        base1 = lambda: jnp.zeros((3, hp, wp), jnp.uint8)
        bases = lambda: jnp.zeros((3, s * hp, wp), jnp.uint8)
    else:
        st, one = pallas_fused.batch_step_stacked, pallas_fused.batch_step
        base1 = lambda: jnp.zeros((hp, wp), jnp.float32)
        bases = lambda: jnp.zeros((s * hp, wp), jnp.float32)
    out_s, stats_s, _, nh_s = st(
        props, h, w, s, stacked, bases(), jnp.asarray(flags),
        jnp.zeros((s * hp, wp), jnp.float32), jnp.asarray(valid))
    for si in range(s):
        o1, st1, _, nh1 = one(props, h, w, raws[si], base1(),
                              jnp.asarray(flags[si]),
                              jnp.zeros((hp, wp), jnp.float32),
                              jnp.asarray(valid[si]))
        np.testing.assert_array_equal(
            np.asarray(out_s[:, :, si * hp:(si + 1) * hp]), np.asarray(o1))
        np.testing.assert_allclose(np.asarray(stats_s[si]), np.asarray(st1),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(nh_s[si * hp:(si + 1) * hp]),
                                   np.asarray(nh1), atol=1e-5)
