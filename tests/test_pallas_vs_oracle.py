"""Fused Pallas kernel vs the streaming oracle (interpret mode on CPU).

Mirrors test_engine_vs_oracle.py with backend="pallas"; on CPU the kernel
runs in the Pallas interpreter, on TPU it compiles via Mosaic (exercised by
bench.py / __graft_entry__.py on the real chip).
"""

import numpy as np
import pytest

from dips_tpu.models import DiPsEngine
from dips_tpu.ops.oracle import DiPsOracle
from dips_tpu.properties import (ChromaFilter, DiPsFilter, DiPsMethod,
                                 DiPsProperties, OutputMode)
from tests.conftest import make_clip
from tests.test_engine_vs_oracle import assert_close

CASES = [
    (DiPsMethod.OVERALL, OutputMode.COLORIZE, DiPsFilter.UNFILTERED, 3, 2,
     ChromaFilter.ALL, True),
    (DiPsMethod.OVERALL, OutputMode.COLORIZE, DiPsFilter.SIGMOID, 3, 4,
     ChromaFilter.ALL, False),
    (DiPsMethod.OVERALL, OutputMode.GRAYSCALE, DiPsFilter.INVERSE_SIGMOID, 1,
     2, ChromaFilter.RED, False),
    (DiPsMethod.PER_FRAME, OutputMode.COLORIZE, DiPsFilter.SIGMOID, 5, 3,
     ChromaFilter.ALL, False),
    (DiPsMethod.PER_FRAME, OutputMode.GRAYSCALE, DiPsFilter.UNFILTERED, 1, 1,
     ChromaFilter.GREEN, True),
    (DiPsMethod.OVERALL, OutputMode.COLORIZE, DiPsFilter.UNFILTERED, 7, 4,
     ChromaFilter.BLUE, True),
]


@pytest.mark.parametrize(
    "method,output,filt,window,temporal,chroma,exact", CASES)
def test_pallas_matches_oracle(method, output, filt, window, temporal,
                               chroma, exact, clip):
    props = DiPsProperties(method=method, output=output, filter=filt,
                           window_size=window, temporal_size=temporal,
                           chroma=chroma)
    o = DiPsOracle(props)
    exp_out, exp_stats = o.run(clip)
    if exp_out.ndim == 3:
        exp_out = exp_out[..., None]
    eng = DiPsEngine(props, clip.shape[1], clip.shape[2], batch=5,
                     backend="pallas")
    got_out, got_stats = eng.process_frames(list(clip))
    assert_close(exp_out, exp_stats, got_out, got_stats, exact,
                 clip.shape[1] * clip.shape[2])


def test_pallas_refresh_markers(clip):
    props = DiPsProperties(refresh_markers=(4, 7), window_size=3,
                           temporal_size=2, filter=DiPsFilter.UNFILTERED)
    o = DiPsOracle(props)
    exp_out, exp_stats = o.run(clip)
    eng = DiPsEngine(props, clip.shape[1], clip.shape[2], batch=3,
                     backend="pallas")
    got_out, got_stats = eng.process_frames(list(clip))
    assert_close(exp_out, exp_stats, got_out, got_stats, True,
                 clip.shape[1] * clip.shape[2])


def test_pallas_multi_rowblock():
    """Geometry forcing >1 row block exercises the halo specs."""
    frames = make_clip(n=6, h=24, w=130, seed=5)
    props = DiPsProperties(window_size=5, temporal_size=2,
                           filter=DiPsFilter.UNFILTERED)
    o = DiPsOracle(props)
    exp_out, exp_stats = o.run(frames)
    import dips_tpu.ops.pallas_fused as pf
    old = pf._VMEM_BUDGET
    try:
        pf._VMEM_BUDGET = 25 * 256 * 4 * 8 * 4  # force tiny row blocks
        eng = DiPsEngine(props, 24, 130, batch=3, backend="pallas")
        got_out, got_stats = eng.process_frames(list(frames))
    finally:
        pf._VMEM_BUDGET = old
    assert_close(exp_out, exp_stats, got_out, got_stats, True, 24 * 130)


def test_pallas_subframe_batching_t4_b8(clip):
    """T=4, B=8 -> 4 frames per grid step; parity must hold across the
    warm-up/emit step boundary."""
    props = DiPsProperties(window_size=3, temporal_size=4,
                           filter=DiPsFilter.UNFILTERED)
    o = DiPsOracle(props)
    exp_out, exp_stats = o.run(clip)
    eng = DiPsEngine(props, clip.shape[1], clip.shape[2], batch=8,
                     backend="pallas")
    got_out, got_stats = eng.process_frames(list(clip))
    assert_close(exp_out, exp_stats, got_out, got_stats, True,
                 clip.shape[1] * clip.shape[2])


@pytest.mark.parametrize("method", [DiPsMethod.OVERALL, DiPsMethod.PER_FRAME])
@pytest.mark.parametrize("output", [OutputMode.ABSDIFF, OutputMode.THRESHOLD])
def test_pallas_raw_modes_bit_exact(method, output, clip):
    """The fused integer absdiff kernel is byte-equal to the oracle (and
    thus to cv2.absdiff)."""
    props = DiPsProperties(method=method, output=output, change_threshold=25,
                           temporal_size=2)
    o = DiPsOracle(props)
    exp_out, exp_stats = o.run(clip)
    if exp_out.ndim == 3:
        exp_out = exp_out[..., None]
    eng = DiPsEngine(props, clip.shape[1], clip.shape[2], batch=4,
                     backend="pallas")
    got_out, got_stats = eng.process_frames(list(clip))
    np.testing.assert_array_equal(got_out, exp_out)
    np.testing.assert_allclose(got_stats, exp_stats, atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(eng.heatmap(), o.heatmap, atol=1e-4)


def test_pallas_max_temporal_ring(clip):
    """T=16 (the reference's MAX_TEMPORAL_ARRAY_SIZE) with B=8 -> fpb=8."""
    props = DiPsProperties(window_size=1, temporal_size=16,
                           filter=DiPsFilter.UNFILTERED)
    o = DiPsOracle(props)
    exp_out, exp_stats = o.run(clip)
    eng = DiPsEngine(props, clip.shape[1], clip.shape[2], batch=8,
                     backend="pallas")
    got_out, got_stats = eng.process_frames(list(clip))
    assert_close(exp_out, exp_stats, got_out, got_stats, True,
                 clip.shape[1] * clip.shape[2])
