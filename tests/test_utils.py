"""utils: circular index parity and stage timers."""

import time

import pytest

from dips_tpu.utils import StageTimers, UCircularIndex, trace


def test_ucircular_index_wraps():
    i = UCircularIndex(0, 4)
    for expected in [1, 2, 3, 0, 1]:
        i += 1
        assert int(i) == expected
    i += 6
    assert int(i) == 3
    assert i == 3


def test_ucircular_index_validation():
    with pytest.raises(ValueError):
        UCircularIndex(0, 0)
    assert int(UCircularIndex(7, 4)) == 3  # constructor wraps


def test_stage_timers_accumulate():
    t = StageTimers()
    with t.stage("a"):
        time.sleep(0.01)
    with t.stage("a"):
        pass
    t.add_frames(5)
    s = t.summary()
    assert s["a"]["calls"] == 2
    assert s["a"]["total_s"] >= 0.01
    assert s["_overall"]["frames"] == 5
    assert s["_overall"]["fps"] > 0
    assert "a" in str(t)


def test_trace_noop():
    with trace(None):
        pass  # must be a no-op without a logdir


def test_cli_profile_flag(tmp_path, capsys):
    from dips_tpu.cli import main as cli_main
    from dips_tpu.io import moving_square_clip, write_clip
    path = str(tmp_path / "in.avi")
    write_clip(moving_square_clip(n=6, height=32, width=48), path)
    rc = cli_main(["--input", path, "--output", str(tmp_path / "o.avi"),
                   "--profile", "--temporal=2", "--batch=3"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "StageTimers" in out and "device" in out


def test_validate_tool():
    """The deployment acceptance check passes on this backend."""
    from dips_tpu import validate
    assert validate.run(backend="xla", quick=True, verbose=False) == 0


def test_remaining_builder_aliases_and_spectrum():
    """Touch the last unreferenced public surfaces: builder aliases and the
    FFT spectrum view."""
    import numpy as np
    from dips_tpu import DiPsJob, DiPsProperties
    from dips_tpu.ops.analysis import fft_magnitude_spectrum

    p = DiPsProperties().with_change_threshold(500)
    assert p.change_threshold == 255  # clamped
    assert DiPsProperties().with_approx_median().approx_median
    job = DiPsJob().with_properties(p).with_video_backend("opencv")
    assert job.properties.change_threshold == 255
    assert job.video_backend == "opencv"

    img = np.zeros((16, 32), np.uint8)
    img[::2] = 255  # strong vertical frequency
    spec = np.asarray(fft_magnitude_spectrum(img))
    assert spec.shape == (16, 32) and np.isfinite(spec).all()
    assert spec.max() > spec.min()
