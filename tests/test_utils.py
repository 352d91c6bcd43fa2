"""utils: circular index parity and stage timers."""

import os
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


# ---------------------------------------------------------------------------
# persistent compilation cache
# ---------------------------------------------------------------------------

@pytest.fixture
def _cache_config_guard():
    """Snapshot + restore the jax compilation-cache config so enabling the
    cache inside a test cannot leak into the rest of the in-process suite
    (the cache dir is a tmp_path that pytest deletes afterwards)."""
    import jax

    keys = ("jax_compilation_cache_dir",
            "jax_persistent_cache_min_compile_time_secs",
            "jax_persistent_cache_min_entry_size_bytes")
    old = {k: getattr(jax.config, k) for k in keys}
    yield
    for k, v in old.items():
        jax.config.update(k, v)


def test_enable_compile_cache_writes_entries(tmp_path, _cache_config_guard):
    import jax
    import jax.numpy as jnp
    from dips_tpu.utils.compilecache import enable_compile_cache

    d = tmp_path / "xla-cache"
    got = enable_compile_cache(str(d))
    # the suite pins jax to the CPU platform (conftest), so the cache is
    # partitioned under a per-host subdir: x86 AOT executables written on
    # one machine can SIGILL on another (the loader only warns)
    assert os.path.dirname(got) == str(d)
    assert os.path.basename(got).startswith("host-")
    assert os.path.isdir(got)
    assert jax.config.jax_compilation_cache_dir == got

    # a fresh jit lowers + compiles -> at least one persisted executable
    f = jax.jit(lambda x: x * 3 - jnp.float32(1.5))
    f(jnp.ones((8, 128), jnp.float32)).block_until_ready()
    assert os.listdir(got), "no cache entries written"
    # idempotent re-enable
    assert enable_compile_cache(str(d)) == got


def test_enable_compile_cache_after_prior_compiles(tmp_path,
                                                   _cache_config_guard):
    """Enabling the cache AFTER this process already compiled something
    must still take effect: jax latches its persistent-cache init on the
    first compile, and without the reset in enable_compile_cache a
    dir configured later is silently ignored (the full-suite ordering
    bug — any earlier test's compile disabled the cache for good)."""
    import jax
    import jax.numpy as jnp
    from dips_tpu.utils.compilecache import enable_compile_cache

    # force the latch: one compile with whatever state the suite left
    jax.jit(lambda x: x - jnp.float32(0.25))(
        jnp.ones((8, 128), jnp.float32)).block_until_ready()

    d = tmp_path / "late-cache"
    got = enable_compile_cache(str(d))
    jax.jit(lambda x: x * jnp.float32(7.0) + 2)(
        jnp.ones((8, 128), jnp.float32)).block_until_ready()
    assert os.listdir(got), "late-enabled cache wrote no entries"


def test_compile_cache_flag_plumbing(tmp_path, monkeypatch,
                                     _cache_config_guard):
    import argparse

    from dips_tpu.utils.compilecache import (add_compile_cache_flag,
                                             apply_compile_cache_flag,
                                             default_cache_dir)

    ap = argparse.ArgumentParser()
    add_compile_cache_flag(ap)

    # flag absent + env unset -> disabled
    monkeypatch.delenv("DIPS_COMPILE_CACHE", raising=False)
    assert apply_compile_cache_flag(ap.parse_args([])) is None

    # explicit dir (cpu-pinned suite -> per-host subdir of it)
    d = tmp_path / "explicit"
    got = apply_compile_cache_flag(
        ap.parse_args(["--compile-cache", str(d)]))
    assert os.path.dirname(got) == str(d) and d.is_dir()

    # bare flag -> default dir (routed through env for the test)
    envd = tmp_path / "from-env"
    monkeypatch.setenv("DIPS_COMPILE_CACHE", str(envd))
    assert default_cache_dir() == str(envd)
    assert os.path.dirname(apply_compile_cache_flag(
        ap.parse_args(["--compile-cache"]))) == str(envd)

    # env-only opt-in (no CLI flag at all)
    assert os.path.dirname(
        apply_compile_cache_flag(ap.parse_args([]))) == str(envd)


def test_compile_cache_host_partition_cpu_only(tmp_path, monkeypatch,
                                               _cache_config_guard):
    """Per-host partitioning applies ONLY to CPU-pinned processes: TPU
    executables are host-portable and must stay warm across host swaps,
    while x86 AOT entries can SIGILL on a host with fewer CPU features."""
    from dips_tpu.utils import compilecache as cc

    d = tmp_path / "shared"
    monkeypatch.setattr(cc, "_platform_selection", lambda: "tpu")
    assert cc.enable_compile_cache(str(d)) == str(d)

    monkeypatch.setattr(cc, "_platform_selection", lambda: "cpu")
    got = cc.enable_compile_cache(str(d))
    assert os.path.dirname(got) == str(d) and got != str(d)
    # deterministic on a given host
    assert cc.enable_compile_cache(str(d)) == got
    assert cc._host_fingerprint() == cc._host_fingerprint()


def test_cli_and_serve_accept_compile_cache_flag():
    """The flag is installed on every frontend parser."""
    from dips_tpu.cli import build_parser

    args = build_parser().parse_args(["--input", "x.avi", "--compile-cache"])
    assert args.compile_cache == ""
    args = build_parser().parse_args(["--input", "x.avi"])
    assert args.compile_cache is None


def test_tuning_malformed_entries_degrade_to_no_override(tmp_path,
                                                         monkeypatch):
    """Wrong-typed (hand-edited) autotune cache entries must degrade to
    'no override' at trace time, never crash the pipeline."""
    import json

    from dips_tpu.ops import tuning

    path = tmp_path / "autotune.json"
    path.write_text(json.dumps({
        "ListKind": ["oops"],
        "BadCaps": {"ring_caps": {"3": "oops"}, "raw_target_bytes": "x"},
    }))
    monkeypatch.setenv("DIPS_TPU_AUTOTUNE_CACHE", str(path))
    tuning.invalidate()
    assert tuning.device_entry("ListKind") == {}
    assert tuning.ring_product_cap(3, kind="BadCaps") is None
    assert tuning.raw_target_bytes(kind="BadCaps") is None
    # save() merges OVER the malformed entries without crashing
    tuning.save("BadCaps", ring_caps={3: 1000}, raw_target=2000)
    assert tuning.ring_product_cap(3, kind="BadCaps") == 1000
    assert tuning.raw_target_bytes(kind="BadCaps") == 2000


def test_tuning_save_rereads_file(tmp_path, monkeypatch):
    """save() must merge against the FILE, not a stale in-memory copy —
    concurrent autotune runs accumulate, not clobber."""
    import json

    from dips_tpu.ops import tuning

    path = tmp_path / "autotune.json"
    monkeypatch.setenv("DIPS_TPU_AUTOTUNE_CACHE", str(path))
    tuning.invalidate()
    assert tuning.ring_product_cap(3, kind="K") is None  # loads (empty)
    # another process writes an entry behind our back
    path.write_text(json.dumps({"K": {"ring_caps": {"5": 7777}}}))
    tuning.save("K", ring_caps={3: 1111})
    data = json.loads(path.read_text())
    assert data["K"]["ring_caps"] == {"3": 1111, "5": 7777}


def test_gui_thumbnail_cache_freshness(tmp_path):
    import os
    import time

    from dips_tpu.gui import thumbnail_cache_valid

    video = tmp_path / "v.avi"
    thumb = tmp_path / "v.avi.thumb.png"
    video.write_bytes(b"x")
    assert not thumbnail_cache_valid(str(video), str(thumb))  # no thumb
    thumb.write_bytes(b"t")
    assert thumbnail_cache_valid(str(video), str(thumb))
    # re-record the video AFTER the thumbnail -> cache is stale
    later = time.time() + 10
    os.utime(video, (later, later))
    assert not thumbnail_cache_valid(str(video), str(thumb))


def test_dat_dir_skips_alien_d_files(tmp_path):
    """A stray 'D' file that is not a dump must be skipped, not abort the
    batch."""
    import numpy as np

    from dips_tpu.io.datfiles import read_dat_dir

    w, h = 4, 6
    for i in range(2):
        rgba = np.full((h, w, 4), 10 * (i + 1), np.uint8)
        (tmp_path / f"Dat_{i}.d").write_bytes(b"\0" * 4 + rgba.tobytes())
    (tmp_path / "DESIGN.md").write_text("not a dump")
    frames = list(read_dat_dir(str(tmp_path), width=w, height=h))
    assert len(frames) == 2
    assert frames[0][0, 0, 0] == 10 and frames[1][0, 0, 0] == 20


def test_subsample_rejects_bad_target_seconds(tmp_path):
    from dips_tpu.io.subsample import subsample_video

    with pytest.raises(ValueError, match="target_seconds"):
        subsample_video("in.avi", "out.avi", keep_every=2, target_seconds=0)


def test_doctor_report(capsys, monkeypatch):
    """The doctor collects every section and renders hints; --json emits
    one machine-readable object."""
    import json

    from dips_tpu import doctor

    monkeypatch.delenv("DIPS_COMPILE_CACHE", raising=False)
    info = doctor.collect()
    assert set(info) == {"jax", "native", "opencv", "gstreamer",
                         "autotune", "compile_cache", "report"}
    assert info["jax"]["processes"] == 1  # single-process topology
    assert info["jax"]["backend"] == "cpu"  # conftest forces CPU
    assert not info["jax"]["ok"] and "XLA path" in info["jax"]["hint"]
    assert info["compile_cache"]["hint"]  # off by default

    # a not-ok section (the CPU-forced jax backend here) drives a
    # NON-ZERO exit so health-check scripts see the failure
    assert doctor.main([]) == 1
    out = capsys.readouterr().out
    assert "[!!] jax:" in out and "[ok] opencv:" in out

    assert doctor.main(["--json"]) == 1
    parsed = json.loads(capsys.readouterr().out)
    assert parsed["opencv"]["ok"]

    # all-ok report -> exit 0
    monkeypatch.setattr(doctor, "collect",
                        lambda **kw: {"jax": {"ok": True}})
    assert doctor.main([]) == 0


def test_doctor_reports_hung_backend(monkeypatch):
    """A hung accelerator tunnel blocks jax.devices() forever; the doctor
    must DIAGNOSE that (watchdog timeout) instead of inheriting the hang."""
    import time

    import jax

    from dips_tpu import doctor

    monkeypatch.setattr(jax, "devices", lambda *a, **k: time.sleep(3.0))
    info = doctor.collect(timeout_s=0.2)
    assert not info["jax"]["ok"]
    assert "did not answer" in info["jax"]["hint"]
    assert info["jax"]["backend"] is None
    # the rest of the report still renders
    assert info["opencv"]["ok"] and "compile_cache" in info


def test_doctor_survives_broken_section(monkeypatch):
    """A crashing component is reported as ok=false, not a traceback —
    the broken hosts are the ones that need the doctor."""
    from dips_tpu import doctor
    from dips_tpu.io import gstreamer

    def boom():
        raise RuntimeError("plugin scan failed")

    monkeypatch.setattr(gstreamer, "available", boom)
    info = doctor.collect(timeout_s=5.0)
    assert not info["gstreamer"]["ok"]
    assert "plugin scan failed" in info["gstreamer"]["error"]
    # every other section is still present and intact
    assert set(info) >= {"jax", "native", "opencv", "autotune",
                         "compile_cache"}
    assert info["opencv"]["ok"]


def test_pad_lanes_stats_fetch_round_trip():
    """The lane-aligned stats D2H helper (models/pipeline._pad_lanes) pads
    the minor dim to 128 and the fetch slice restores the values exactly
    (the CPU backend skips the pad at runtime — force the padded path)."""
    import jax.numpy as jnp
    from dips_tpu.models.pipeline import _pad_lanes

    stats = jnp.arange(64 * 4, dtype=jnp.float32).reshape(64, 4) / 7.0
    padded = _pad_lanes(stats)
    assert padded.shape == (64, 128)
    import numpy as np
    np.testing.assert_array_equal(np.asarray(padded)[:, :4],
                                  np.asarray(stats))
    assert (np.asarray(padded)[:, 4:] == 0).all()
    # 3-D multistream shape (S, B, NUM_STATS)
    s3 = jnp.ones((2, 8, 4), jnp.float32)
    assert _pad_lanes(s3).shape == (2, 8, 128)
