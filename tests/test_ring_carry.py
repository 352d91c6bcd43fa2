"""Ring-carry mode: the filtered temporal ring as device state.

The ring-carry kernels (ops/pallas_fused.batch_step_ring / absdiff_step_ring)
must be bit-identical to the tail protocol (the oracle-pinned batch_step /
absdiff_step) on every frame of a stream, for every batch split — including
partial batches, whose padding replicas must NOT pollute the carried state.
Checkpoints store the raw tail in both modes, so they round-trip between
ring-carry and tail engines.
"""

import numpy as np
import pytest

from dips_tpu.models import DiPsEngine
from dips_tpu.properties import (ChromaFilter, DiPsFilter, DiPsMethod,
                                 DiPsProperties, OutputMode)
from tests.conftest import make_clip

H, W = 12, 140


def run_engine(props, clip, batch, ring_carry, splits=None):
    """Feed ``clip`` through an engine; ``splits`` optionally forces uneven
    sub-batch sizes (exercising partial-batch padding)."""
    eng = DiPsEngine(props, H, W, batch=batch, backend="pallas",
                     ring_carry=ring_carry)
    if splits is None:
        out, stats = eng.process_frames(list(clip))
        return out, stats, eng
    outs, stats = [], []
    i = 0
    for n in splits:
        o, s = eng.process_batch([clip[i + k] for k in range(n)])
        outs.append(o)
        stats.append(s)
        i += n
    assert i == len(clip)
    return np.concatenate(outs), np.concatenate(stats), eng


def assert_equal_runs(props, clip, batch, splits=None):
    exp_out, exp_stats, exp_eng = run_engine(props, clip, batch, False,
                                             splits)
    got_out, got_stats, got_eng = run_engine(props, clip, batch, True,
                                             splits)
    np.testing.assert_array_equal(got_out, exp_out)
    np.testing.assert_allclose(got_stats, exp_stats, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_eng._heatmap),
                               np.asarray(exp_eng._heatmap), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_eng._baseline),
                               np.asarray(exp_eng._baseline))


CASES = [
    DiPsProperties(method=DiPsMethod.OVERALL, output=OutputMode.COLORIZE,
                   filter=DiPsFilter.UNFILTERED, window_size=3,
                   temporal_size=2),
    DiPsProperties(method=DiPsMethod.PER_FRAME, output=OutputMode.GRAYSCALE,
                   filter=DiPsFilter.SIGMOID, window_size=5,
                   temporal_size=3, chroma=ChromaFilter.RED),
    DiPsProperties(method=DiPsMethod.OVERALL, output=OutputMode.COLORIZE,
                   filter=DiPsFilter.UNFILTERED, window_size=1,
                   temporal_size=4, refresh_markers=(5,)),
    DiPsProperties(method=DiPsMethod.OVERALL, output=OutputMode.ABSDIFF,
                   temporal_size=2, refresh_markers=(6,)),
    DiPsProperties(method=DiPsMethod.PER_FRAME, output=OutputMode.ABSDIFF,
                   temporal_size=4),
    DiPsProperties(method=DiPsMethod.PER_FRAME, output=OutputMode.THRESHOLD,
                   temporal_size=3, change_threshold=20),
]


@pytest.mark.parametrize("props", CASES)
@pytest.mark.parametrize("batch", [4, 13])
def test_ring_matches_tail(props, batch, clip):
    clip13 = make_clip(n=13, h=H, w=W)
    assert_equal_runs(props, clip13, batch)


def test_partial_batches_do_not_pollute_state():
    """Uneven sub-batches force padding replicas every dispatch; ring-carry
    gates its state writes on the valid flags, so results must still match
    the tail engine fed the same splits."""
    clip = make_clip(n=11, h=H, w=W)
    for props in (CASES[0], CASES[1], CASES[4]):
        assert_equal_runs(props, clip, 4, splits=(1, 3, 2, 4, 1))


def test_coprime_temporal_and_batch():
    """T=9 with B=8: the tail kernel is forced to fpb=1; ring mode runs
    8-frame steps.  Both must agree."""
    props = DiPsProperties(method=DiPsMethod.OVERALL, window_size=3,
                           temporal_size=9)
    clip = make_clip(n=16, h=H, w=W)
    assert_equal_runs(props, clip, 8)


def test_ring_buffer_layout():
    props = CASES[0]
    ring_eng = DiPsEngine(props, H, W, batch=4, backend="pallas",
                          ring_carry=True)
    tail_eng = DiPsEngine(props, H, W, batch=4, backend="pallas",
                          ring_carry=False)
    assert ring_eng.tail_rows == 0
    assert tail_eng.tail_rows == props.temporal_size
    assert ring_eng.new_batch_buffer().shape[0] == 4
    assert tail_eng.new_batch_buffer().shape[0] == 4 + props.temporal_size


def test_ring_carry_requires_pallas():
    with pytest.raises(ValueError):
        DiPsEngine(CASES[0], H, W, backend="xla", ring_carry=True)
    # auto: xla backend resolves ring_carry off
    eng = DiPsEngine(CASES[0], H, W, backend="xla")
    assert not eng.ring_carry


@pytest.mark.parametrize("props", [CASES[1], CASES[2], CASES[4]])
def test_checkpoint_roundtrip_across_modes(props, tmp_path):
    """Save mid-stream from a tail engine, resume in a ring engine (and the
    reverse); the continuation must equal an uninterrupted run."""
    clip = make_clip(n=12, h=H, w=W)
    ref_out, ref_stats, _ = run_engine(props, clip, 4, True)

    for save_ring, load_ring in ((False, True), (True, False), (True, True)):
        src = DiPsEngine(props, H, W, batch=4, backend="pallas",
                         ring_carry=save_ring)
        src.process_frames(list(clip[:8]))
        path = str(tmp_path / f"ck_{save_ring}_{load_ring}.npz")
        src.save(path)

        dst = DiPsEngine(props, H, W, batch=4, backend="pallas",
                         ring_carry=load_ring)
        dst.load(path)
        out2, stats2 = dst.process_frames(list(clip[8:]))
        np.testing.assert_array_equal(out2, ref_out[8:])
        np.testing.assert_allclose(stats2, ref_stats[8:], atol=1e-5)


def test_snapshot_in_ring_mode():
    """The forced SnapShot re-capture works identically in ring mode."""
    props = CASES[0]
    clip = make_clip(n=8, h=H, w=W)
    outs = {}
    for ring in (False, True):
        eng = DiPsEngine(props, H, W, batch=4, backend="pallas",
                         ring_carry=ring)
        eng.process_frames(list(clip[:4]))
        eng.snapshot()
        out, _ = eng.process_frames(list(clip[4:]))
        outs[ring] = out
    np.testing.assert_array_equal(outs[True], outs[False])
    # the forced capture renders frame 4 as gray (baseline re-capture)
    assert np.array_equal(outs[True][0, ..., 0], outs[True][0, ..., 1])


def test_reset_clears_ring_state():
    props = CASES[1]
    clip = make_clip(n=6, h=H, w=W)
    eng = DiPsEngine(props, H, W, batch=3, backend="pallas", ring_carry=True)
    first, first_stats = eng.process_frames(list(clip))
    eng.reset()
    again, again_stats = eng.process_frames(list(clip))
    np.testing.assert_array_equal(first, again)
    np.testing.assert_allclose(first_stats, again_stats)


# ---------------------------------------------------------------------------
# MultiStreamEngine ring-carry (stacked ring kernels under shard_map)
# ---------------------------------------------------------------------------

def _ms_feeds(n_streams, n_frames, start=0):
    clips = [make_clip(n=start + n_frames, h=H, w=W, seed=s)
             for s in range(n_streams)]
    return clips


@pytest.mark.parametrize("props", [CASES[0], CASES[1], CASES[4]])
def test_multistream_ring_matches_xla(props):
    from dips_tpu.parallel import MultiStreamEngine
    clips = _ms_feeds(8, 6)
    res = {}
    for ring in (False, True):
        ms = MultiStreamEngine(props, H, W, n_streams=8, batch=3,
                               backend="pallas", ring_carry=ring)
        assert ms.ring_carry == ring
        outs, stats = [], []
        for i in range(0, 6, 3):
            o, st, g = ms.process_batch(
                [[c[i + k] for k in range(3)] for c in clips])
            outs.append(o)
            stats.append(st)
        res[ring] = (np.concatenate(outs, axis=1),
                     np.concatenate(stats, axis=1), ms.heatmaps())
    np.testing.assert_array_equal(res[True][0], res[False][0])
    np.testing.assert_allclose(res[True][1], res[False][1], atol=1e-5)
    np.testing.assert_allclose(res[True][2], res[False][2], atol=1e-4)


def test_multistream_ring_staggered_and_recovery():
    """Staggered starts (a stream joins late), a mid-run bad frame
    (isolation), reset_stream restart — ring state must track each stream's
    own cursor and never leak across streams."""
    from dips_tpu.parallel import MultiStreamEngine
    props = CASES[0]
    clips = _ms_feeds(8, 9)

    def drive(ring):
        ms = MultiStreamEngine(props, H, W, n_streams=8, batch=3,
                               backend="pallas", ring_carry=ring)
        recs = [[] for _ in range(8)]
        # batch 1: stream 3 missing (late start), others feed 3 frames
        feeds = [[c[k] for k in range(3)] for c in clips]
        feeds[3] = []
        o, st, _ = ms.process_batch(feeds)
        for si in range(8):
            if si != 3:
                recs[si].append(o[si, :3])
        # batch 2: stream 3 joins from ITS frame 0; stream 5 sends garbage
        feeds = [[c[3 + k] for k in range(3)] for c in clips]
        feeds[3] = [clips[3][k] for k in range(3)]
        feeds[5] = [np.zeros((2, 2, 3), np.uint8)]
        o, st, _ = ms.process_batch(feeds)
        assert 5 in ms.failed
        for si in range(8):
            if si != 5:
                recs[si].append(o[si, :3])
        # batch 3: stream 5 restarted fresh
        ms.reset_stream(5)
        feeds = [[c[6 + k] for k in range(3)] for c in clips]
        feeds[3] = [clips[3][3 + k] for k in range(3)]
        feeds[5] = [clips[5][k] for k in range(3)]
        o, st, _ = ms.process_batch(feeds)
        for si in range(8):
            recs[si].append(o[si, :3])
        return [np.concatenate(r) for r in recs]

    got = drive(True)
    exp = drive(False)
    for si in range(8):
        np.testing.assert_array_equal(got[si], exp[si], err_msg=f"s{si}")

    # cross-check stream 3 and restarted stream 5 against single-stream runs
    for si, n in ((3, 6), (5, 3)):
        single = DiPsEngine(props, H, W, batch=3, backend="pallas",
                            ring_carry=True)
        sout, _ = single.process_frames(list(clips[si][:n]))
        np.testing.assert_array_equal(got[si][-n:], sout)


def test_multistream_ring_checkpoint_roundtrip(tmp_path):
    from dips_tpu.parallel import MultiStreamEngine
    props = CASES[1]
    clips = _ms_feeds(8, 6)

    def feeds(i, n):
        return [[c[i + k] for k in range(n)] for c in clips]

    ref = MultiStreamEngine(props, H, W, n_streams=8, batch=3,
                            backend="pallas", ring_carry=True)
    ref.process_batch(feeds(0, 3))
    ro, rs, _ = ref.process_batch(feeds(3, 3))

    for save_ring, load_ring in ((True, False), (False, True), (True, True)):
        src = MultiStreamEngine(props, H, W, n_streams=8, batch=3,
                                backend="pallas", ring_carry=save_ring)
        src.process_batch(feeds(0, 3))
        path = str(tmp_path / f"ms_{save_ring}_{load_ring}.npz")
        src.save(path)
        dst = MultiStreamEngine(props, H, W, n_streams=8, batch=3,
                                backend="pallas", ring_carry=load_ring)
        dst.load(path)
        o2, s2, _ = dst.process_batch(feeds(3, 3))
        np.testing.assert_array_equal(o2, ro)
        np.testing.assert_allclose(s2, rs, atol=1e-5)


def test_validate_soak_smoke():
    """The --soak acceptance gate passes on this backend (small N)."""
    from dips_tpu import validate
    assert validate.soak(48, verbose=False) == 0


def test_ring_geometry_silicon_pins():
    """The (fpb, bh) picker must reproduce the silicon-pinned choices for
    every preset geometry (see _RING_BH_PRODUCT_CAPS provenance): the
    known-good blocks stay, the measured-OOM holes stay excluded."""
    from dips_tpu.ops.pallas_fused import _ring_geometry
    from dips_tpu.ops.reference import pad_geometry
    expect = {
        (480, 854): {3: (8, 48), 5: (8, 48), 7: (8, 40)},
        (720, 1280): {3: (8, 40), 5: (8, 24), 7: (8, 24)},
        (1080, 1920): {3: (8, 24), 5: (8, 24), 7: (8, 8)},
        (2160, 3840): {3: (4, 8), 5: (4, 8), 7: (4, 8)},
    }
    for (h, w), per_win in expect.items():
        hp, wp = pad_geometry(h, w)
        for win, want in per_win.items():
            got = _ring_geometry(hp, wp, win, 4, 64)
            assert got == want, (h, w, win, got, want)
    # t derating: a 16-deep ring at 1080p must shrink the block
    assert _ring_geometry(1080, 2048, 3, 16, 64)[1] <= 8
    # fpb always divides b
    for b in (1, 2, 3, 5, 6, 12, 64):
        fpb, _ = _ring_geometry(480, 896, 3, 4, b)
        assert b % fpb == 0, (b, fpb)


def test_raw_ring_fpb_rule():
    """Raw (absdiff) ring kernel frame-per-step targets: 4-frame blocks up
    to 720p's padded geometry, 8 above (measured DMA-shape rule)."""
    from dips_tpu.ops.pallas_fused import _ring_frames_per_step
    from dips_tpu.ops.reference import pad_geometry
    for (h, w), want in (((480, 854), 4), ((720, 1280), 4),
                         ((1080, 1920), 8), ((2160, 3840), 8)):
        hp, wp = pad_geometry(h, w)
        assert _ring_frames_per_step(64, hp, wp) == want, (h, w)
    # always a divisor of b
    for b in (1, 3, 5, 6, 10, 64):
        f = _ring_frames_per_step(b, 480, 896)
        assert b % f == 0
