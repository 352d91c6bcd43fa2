"""Analysis ops (temporal DFT, FFT denoise) and heatmap accumulation."""

import numpy as np
import pytest

from dips_tpu.models import DiPsEngine
from dips_tpu.ops import analysis
from dips_tpu.ops.oracle import DiPsOracle
from dips_tpu.properties import DiPsFilter, DiPsMethod, DiPsProperties, OutputMode
from tests.conftest import make_clip


def test_temporal_dft_matches_numpy():
    r = np.random.default_rng(0)
    traces = r.standard_normal((16, 6, 7)).astype(np.float32)
    mag, phase = analysis.temporal_dft(traces)
    f = np.fft.rfft(traces, axis=0)
    np.testing.assert_allclose(np.asarray(mag), np.abs(f), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(phase), np.angle(f), rtol=1e-3,
                               atol=1e-3)


def test_temporal_dft_reference_vector():
    """The reference's dft.py analyses [0, 1, 0, -1]: energy only at k=1."""
    mag, _ = analysis.temporal_dft(np.array([0., 1., 0., -1.], np.float32))
    np.testing.assert_allclose(np.asarray(mag), [0.0, 2.0, 0.0], atol=1e-5)


def test_fft_denoise_matches_reference_recipe():
    r = np.random.default_rng(1)
    img = r.integers(0, 256, (64, 80)).astype(np.float32)
    radius = 10
    got = np.asarray(analysis.fft_denoise(img, radius))
    # the reference recipe in numpy (image_denoise.py:13-30)
    f = np.fft.fftshift(np.fft.fft2(img))
    rows, cols = img.shape
    mask = np.zeros_like(img)
    mask[rows // 2 - radius:rows // 2 + radius,
         cols // 2 - radius:cols // 2 + radius] = 1
    exp = np.abs(np.fft.ifft2(np.fft.ifftshift(f * mask)))
    np.testing.assert_allclose(got, exp, rtol=1e-3, atol=1e-2)


def test_fft_denoise_removes_high_frequency():
    x = np.zeros((64, 64), np.float32)
    x += np.sin(np.arange(64) * np.pi)[None, :] * 50  # checkerboard columns
    x += 100.0
    out = np.asarray(analysis.fft_denoise(x, radius=4))
    assert np.abs(out - 100.0).max() < 1.0  # high-freq stripe removed


@pytest.mark.parametrize("output",
                         [OutputMode.COLORIZE, OutputMode.ABSDIFF])
def test_engine_heatmap_matches_oracle(output, clip):
    props = DiPsProperties(output=output, window_size=1, temporal_size=1,
                           filter=DiPsFilter.UNFILTERED)
    o = DiPsOracle(props)
    o.run(clip)
    eng = DiPsEngine(props, clip.shape[1], clip.shape[2], batch=5)
    eng.process_frames(list(clip))
    np.testing.assert_allclose(eng.heatmap(), o.heatmap, atol=1e-5)
    assert eng.heatmap().max() > 0  # the moving square left a trail


def test_pallas_heatmap_matches_oracle(clip):
    props = DiPsProperties(window_size=3, temporal_size=2,
                           filter=DiPsFilter.UNFILTERED)
    o = DiPsOracle(props)
    o.run(clip)
    eng = DiPsEngine(props, clip.shape[1], clip.shape[2], batch=5,
                     backend="pallas")
    eng.process_frames(list(clip))
    np.testing.assert_allclose(eng.heatmap(), o.heatmap, atol=1e-5)


def test_denoise_frames_batched(rng):
    frames = rng.integers(0, 256, (3, 24, 32, 3), np.uint8)
    out = np.asarray(analysis.denoise_frames(frames, 6))
    assert out.shape == frames.shape and out.dtype == np.uint8
    # low-pass: variance must drop
    assert out.std() < frames.std()


def test_cli_denoise_and_dft(tmp_path, capsys):
    import json
    from dips_tpu.cli import main as cli_main
    from dips_tpu.io import moving_square_clip, write_clip
    path = str(tmp_path / "in.avi")
    write_clip(moving_square_clip(n=8, height=32, width=48), path)
    dft = str(tmp_path / "dft.json")
    rc = cli_main(["--input", path, "--output", str(tmp_path / "o.avi"),
                   "--temporal=2", "--batch=4", "--denoise", "8",
                   "--dft-json", dft])
    assert rc == 0
    d = json.load(open(dft))
    assert len(d["magnitude"]) == 8 // 2 + 1
