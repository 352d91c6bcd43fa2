"""Autotuner + tuning store: search logic, persistence, picker overrides.

The real probes need a TPU (they measure Mosaic VMEM edges and DMA
timings); here the measurement is faked and the search/persistence logic —
the part that must be correct on every device — is exercised on CPU.
"""

import json

import pytest

from dips_tpu import autotune
from dips_tpu.autotune import ProbeOOM, find_largest_fitting
from dips_tpu.ops import tuning


@pytest.fixture()
def cache(tmp_path, monkeypatch):
    path = str(tmp_path / "autotune.json")
    monkeypatch.setenv("DIPS_TPU_AUTOTUNE_CACHE", path)
    tuning.invalidate()
    yield path
    tuning.invalidate()


# -- tuning store -----------------------------------------------------------

def test_store_roundtrip(cache):
    tuning.save("TPU vX", ring_caps={3: 111_000, 7: 30_000},
                raw_target=640_000, meta={"tool": "test"})
    assert tuning.ring_product_cap(3, kind="TPU vX") == 111_000
    assert tuning.ring_product_cap(5, kind="TPU vX") is None
    assert tuning.raw_target_bytes(kind="TPU vX") == 640_000
    assert tuning.ring_product_cap(3, kind="other") is None
    # partial update merges, never clobbers
    tuning.save("TPU vX", ring_caps={5: 52_000})
    assert tuning.ring_product_cap(3, kind="TPU vX") == 111_000
    assert tuning.ring_product_cap(5, kind="TPU vX") == 52_000
    assert tuning.raw_target_bytes(kind="TPU vX") == 640_000
    # ring caps merge by MAX (every passing compile is a valid lower bound
    # of the true edge; a coarser divisor ladder must not shrink the cap)
    tuning.save("TPU vX", ring_caps={3: 90_000, 5: 60_000})
    assert tuning.ring_product_cap(3, kind="TPU vX") == 111_000
    assert tuning.ring_product_cap(5, kind="TPU vX") == 60_000
    with open(cache) as f:
        assert "meta" in json.load(f)["TPU vX"]


def test_store_stacked_keys(cache):
    """--stacked probes persist their own keys; the stacked pickers
    prefer them and fall back to the single-stream keys."""
    tuning.save("TPU vX", ring_caps={3: 50_000}, raw_target=500_000,
                stacked_ring_caps={3: 40_000}, stacked_raw_target=300_000)
    assert tuning.stacked_ring_cap(3, kind="TPU vX") == 40_000
    assert tuning.stacked_ring_cap(5, kind="TPU vX") is None
    assert tuning.stacked_raw_target_bytes(kind="TPU vX") == 300_000
    # max-merge applies to stacked caps too
    tuning.save("TPU vX", stacked_ring_caps={3: 30_000, 5: 20_000})
    assert tuning.stacked_ring_cap(3, kind="TPU vX") == 40_000
    assert tuning.stacked_ring_cap(5, kind="TPU vX") == 20_000
    # single-stream keys untouched
    assert tuning.ring_product_cap(3, kind="TPU vX") == 50_000
    assert tuning.raw_target_bytes(kind="TPU vX") == 500_000


def test_stacked_geometry_prefers_stacked_keys(cache, monkeypatch):
    from dips_tpu.ops import pallas_fused, tuning as tn
    monkeypatch.setattr(tn, "_device_kind", lambda: "TPU vST")
    tn.save("TPU vST", ring_caps={3: 2048 * 72},
            stacked_ring_caps={3: 2048 * 40})
    # single-stream pick uses the plain cap; stacked pick its own key
    assert pallas_fused._ring_geometry(1080, 2048, 3, 4, 64) == (8, 72)
    assert pallas_fused._ring_geometry(1080, 2048, 3, 4, 64, s=2) == (8, 40)
    # no stacked key for w5 -> falls back to the plain cap path
    tn.save("TPU vST", ring_caps={5: 2048 * 24})
    assert pallas_fused._ring_geometry(1080, 2048, 5, 4, 64, s=2) == (8, 24)
    # raw picker: stacked target wins only when present
    tn.save("TPU vST", raw_target=2 * 1024 * 1024)
    assert pallas_fused._raw_block_rows(960, 2048, 8, 3, s=2) == 32
    tn.save("TPU vST", stacked_raw_target=500_000)
    assert pallas_fused._raw_block_rows(960, 2048, 8, 3, s=2) == 16
    assert pallas_fused._raw_block_rows(960, 2048, 8, 3) == 32


def test_store_slab_keys(cache):
    """--mesh probes persist nested {window: {owned_hp: cap}} keys with
    the same max-merge discipline."""
    tuning.save("TPU vX", slab_ring_caps={3: {272: 40_000}})
    assert tuning.slab_ring_cap(3, 272, kind="TPU vX") == 40_000
    assert tuning.slab_ring_cap(3, 544, kind="TPU vX") is None
    assert tuning.slab_ring_cap(5, 272, kind="TPU vX") is None
    tuning.save("TPU vX", slab_ring_caps={3: {272: 30_000, 544: 50_000},
                                          5: {272: 20_000}})
    assert tuning.slab_ring_cap(3, 272, kind="TPU vX") == 40_000  # max-merge
    assert tuning.slab_ring_cap(3, 544, kind="TPU vX") == 50_000
    assert tuning.slab_ring_cap(5, 272, kind="TPU vX") == 20_000


def test_ring_geometry_band_debit(cache, monkeypatch):
    """slab_bands must debit the two bh-independent double-buffered 8-row
    band input blocks (96*fpb*wp bytes) from the ring kernel's product
    cap, mirroring _pick_block_rows on the tail path (advisor r4 medium:
    omitting it risks scoped-VMEM overflow at cap-edge slab geometries)."""
    from dips_tpu.ops import pallas_fused
    # 1080p-class: baked w3 cap 56320, wp=2048 -> plain pick bh=24;
    # band debit 96*8*2048 bytes / 96 B-per-unit = 16384 units -> 39936
    # -> max 19 rows -> next divisor of 1080 down the ladder is 8
    assert pallas_fused._ring_geometry(1080, 2048, 3, 4, 64) == (8, 24)
    assert pallas_fused._ring_geometry(1080, 2048, 3, 4, 64,
                                       slab_bands=True) == (8, 8)
    # window 1 has no stencil, hence no bands: no debit
    assert pallas_fused._ring_geometry(1080, 2048, 1, 4, 64,
                                       slab_bands=True) == (8, 24)
    # t > 4: the band bytes convert at the derated 48+12t coefficient
    fpb, bh = pallas_fused._ring_geometry(1080, 2048, 3, 8, 64,
                                          slab_bands=True)
    cap8 = 56320 * 96 // 144 - (96 * 8 * 2048) // 144
    assert bh == max([8 * d for d in range(1, 136)
                      if 1080 % (8 * d) == 0 and 8 * d <= cap8 // 2048],
                     default=8)


def test_ring_geometry_prefers_measured_slab_cap(cache, monkeypatch):
    """A --mesh-probed cap at this owned height (measured WITH bands) is
    consulted first and needs no analytic debit."""
    from dips_tpu.ops import pallas_fused
    monkeypatch.setattr(tuning, "_device_kind", lambda: "TPU vSLAB")
    # owned height 272 (1080p-class / 4 shards): 272 = 8*34 -> bh ladder
    # {8, 16, 136, 272}.  The analytic path (no slab key) picks 16:
    # baked 56320/2048 = 27 rows minus the 8-row band debit -> 19.
    assert pallas_fused._ring_geometry(272, 2048, 3, 4, 64,
                                       slab_bands=True)[1] == 16
    # a measured slab cap at this owned height is authoritative (no
    # debit: the bands were resident during the probe)
    tuning.save("TPU vSLAB", slab_ring_caps={3: {272: 2048 * 136}})
    assert pallas_fused._ring_geometry(272, 2048, 3, 4, 64,
                                       slab_bands=True)[1] == 136
    # ...but only at ITS owned height and only in band mode
    assert pallas_fused._ring_geometry(544, 2048, 3, 4, 64,
                                       slab_bands=True)[1] <= \
        pallas_fused._ring_geometry(544, 2048, 3, 4, 64)[1]
    assert pallas_fused._ring_geometry(272, 2048, 3, 4, 64)[1] == 16


def test_pinned_kind_caps_floor_at_baked_pins(cache, monkeypatch):
    """On the device kind the baked caps were measured on, a SMALLER
    autotuned cap (a coarse-ladder lower bound, e.g. 1080p's 24->40 jump
    stopping at 49152 where the true edge is 56320) must not shrink the
    pick — both are silicon lower bounds, the max wins.  On any OTHER
    kind the measured cap is authoritative."""
    from dips_tpu.ops import pallas_fused
    pin = pallas_fused._PINNED_DEVICE_KIND
    monkeypatch.setattr(tuning, "_device_kind", lambda: pin)
    tuning.save(pin, ring_caps={3: 2048 * 24})  # 49152 < baked 56320
    # 720p-class: wp=1408, hp=720 -> baked cap allows bh=40
    assert pallas_fused._ring_geometry(720, 1408, 3, 4, 64)[1] == 40
    # a LARGER measured cap still wins on the pinned kind
    tuning.save(pin, ring_caps={3: 1408 * 48})
    assert pallas_fused._ring_geometry(720, 1408, 3, 4, 64)[1] == 48
    # other kinds: measured-only (may be smaller than the v5e pins)
    monkeypatch.setattr(tuning, "_device_kind", lambda: "TPU vOTHER")
    tuning.save("TPU vOTHER", ring_caps={3: 1408 * 24})
    assert pallas_fused._ring_geometry(720, 1408, 3, 4, 64)[1] == 24


def test_probe_stacked_with_fake_measure(monkeypatch):
    """probe_stacked_* delegate to the plain probes with stacked
    factories; the s parameter reaches the factory."""
    seen = {}

    def fake_factory(win, h, w, t, b, s, approx=False):
        seen["s"] = s

        def measure(fpb, bh):
            if bh > 16:
                raise ProbeOOM(f"bh={bh}")
            return 0.001 * bh
        return measure, 48, 2048

    monkeypatch.setattr(autotune, "_stacked_ring_measure_factory",
                        fake_factory)
    res = autotune.probe_stacked_ring_caps(4, windows=(3,), h=48, w=1920,
                                           b=64)
    assert res[3]["cap"] == 16 * 2048 and seen["s"] == 4


def test_store_corrupt_file_is_ignored(cache):
    with open(cache, "w") as f:
        f.write("{not json")
    tuning.invalidate()
    assert tuning.ring_product_cap(3, kind="TPU vX") is None
    tuning.save("TPU vX", ring_caps={3: 1})  # and save still works
    assert tuning.ring_product_cap(3, kind="TPU vX") == 1


def test_store_no_device_kind_means_no_override(cache):
    """Off-TPU (this CPU test run) the store must never activate."""
    tuning.save("TPU vX", ring_caps={3: 1})
    assert tuning.ring_product_cap(3) is None  # kind=None on CPU
    assert tuning.raw_target_bytes() is None


# -- search logic -----------------------------------------------------------

def test_find_largest_fitting_walks_from_prior():
    cands = [8, 16, 24, 32, 40, 48]
    calls = []

    def fits(x):
        calls.append(x)
        return x <= 24

    # prior already at the edge: probes 24 (pass) and 32 (fail) only
    assert find_largest_fitting(cands, 24, fits) == 24
    assert calls == [24, 32]
    # prior too high: descends to the edge
    assert find_largest_fitting(cands, 48, lambda x: x <= 16) == 16
    # prior too low: climbs to the top candidate
    assert find_largest_fitting(cands, 8, lambda x: True) == 48
    # nothing fits
    assert find_largest_fitting(cands, 24, lambda x: False) is None
    assert find_largest_fitting([], 24, lambda x: True) is None


def test_probe_ring_caps_with_fake_measure():
    """The probe finds each window's OOM edge and reports wp*bh caps."""
    edges = {3: 24, 5: 16, 7: 8}  # max fitting bh per window

    def factory(win, h, w, t, b):
        def measure(fpb, bh):
            assert fpb in (4, 8) and b % fpb == 0
            if bh > edges[win]:
                raise ProbeOOM(f"bh={bh}")
            return 0.001 * bh
        return measure, 48, 2048  # hp, wp

    res = autotune.probe_ring_caps(windows=(3, 5, 7), h=48, w=1920, b=64,
                                   measure_factory=factory)
    assert {w_: r["cap"] for w_, r in res.items()} == {
        3: 24 * 2048, 5: 16 * 2048, 7: 8 * 2048}
    assert res[3]["fps"] == pytest.approx(64 / 0.024)


def test_probe_ring_caps_skips_impossible_window():
    def factory(win, h, w, t, b):
        def measure(fpb, bh):
            raise ProbeOOM("always")
        return measure, 48, 2048

    assert autotune.probe_ring_caps(windows=(7,), h=48, w=1920,
                                    measure_factory=factory) == {}


def test_probe_raw_target_picks_fastest():
    # fastest at bh=16; bh=40 OOMs (must be skipped, not fatal)
    times = {8: 0.004, 16: 0.002, 24: 0.003, 32: 0.005}

    def factory(h, w, t, b):
        def measure(bh):
            if bh not in times:
                raise ProbeOOM(f"bh={bh}")
            return times[bh]
        return measure, 48, 2048

    res = autotune.probe_raw_target(h=48, w=1920, b=64, max_probes=6,
                                    measure_factory=factory)
    assert res["bh"] == 16
    fpb = 8  # hp*wp = 48*2048 < 1.1M -> 4... (rule lives in pallas_fused)
    from dips_tpu.ops.pallas_fused import _ring_frames_per_step
    fpb = _ring_frames_per_step(64, 48, 2048)
    assert res["target_bytes"] == 16 * 3 * fpb * 2048
    assert res["fps"] == pytest.approx(64 / 0.002)


# -- picker integration ------------------------------------------------------

def test_ring_geometry_honors_measured_cap(cache, monkeypatch):
    from dips_tpu.ops import pallas_fused
    monkeypatch.setattr(tuning, "_device_kind", lambda: "TPU vTEST")
    base = pallas_fused._ring_geometry(1080, 2048, 3, 4, 64)
    assert base == (8, 24)  # the baked-in v5e pin
    tuning.save("TPU vTEST", ring_caps={3: 2048 * 72})
    assert pallas_fused._ring_geometry(1080, 2048, 3, 4, 64) == (8, 72)
    # max-merge: a later smaller measurement cannot shrink the cap...
    tuning.save("TPU vTEST", ring_caps={3: 2048 * 8})
    assert pallas_fused._ring_geometry(1080, 2048, 3, 4, 64) == (8, 72)
    # ...but a genuinely small-cap device (fresh kind) is honored
    monkeypatch.setattr(tuning, "_device_kind", lambda: "TPU vSMALL")
    tuning.save("TPU vSMALL", ring_caps={3: 2048 * 8})
    assert pallas_fused._ring_geometry(1080, 2048, 3, 4, 64) == (8, 8)


def test_raw_block_rows_honors_measured_target(cache, monkeypatch):
    # hp=960 admits bh in {8,16,24,32} under the VMEM budget, so the
    # target actually has freedom (1080p's divisor ladder only has {8,24})
    from dips_tpu.ops import pallas_fused
    monkeypatch.setattr(tuning, "_device_kind", lambda: "TPU vTEST")
    fpb = 8
    base = pallas_fused._raw_block_rows(960, 2048, fpb, 3)
    assert base == 16  # nearest the baked-in ~500KB target
    tuning.save("TPU vTEST", raw_target=2 * 1024 * 1024)
    assert pallas_fused._raw_block_rows(960, 2048, fpb, 3) == 32


def test_geometry_overrides_are_scoped(monkeypatch):
    """The probe hooks force exactly what they are told and restore."""
    from dips_tpu.ops import pallas_fused
    monkeypatch.setattr(pallas_fused, "_RING_GEOMETRY_OVERRIDE", (4, 16))
    assert pallas_fused._ring_geometry(1080, 2048, 7, 4, 64) == (4, 16)
    monkeypatch.setattr(pallas_fused, "_RAW_BH_OVERRIDE", 40)
    assert pallas_fused._raw_block_rows(1080, 2048, 8, 3) == 40


def test_autotune_cli_refuses_cpu(capsys):
    assert autotune.main([]) == 1
    assert "needs a TPU" in capsys.readouterr().err


def test_probe_ring_caps_normalizes_temporal_to_t4():
    """Code-review regression: caps measured at t != 4 are stored in the
    t=4 convention _ring_geometry derates from — otherwise the runtime
    double-derates the measured edge."""
    def factory(win, h, w, t, b):
        def measure(fpb, bh):
            if bh > 16:
                raise ProbeOOM(f"bh={bh}")
            return 0.001 * bh
        return measure, 48, 2048

    res8 = autotune.probe_ring_caps(windows=(3,), h=48, w=1920, t=8, b=64,
                                    measure_factory=factory)
    # measured edge 16*2048 at t=8 -> stored as t=4 units: * 144/96
    assert res8[3]["cap"] == 16 * 2048 * 144 // 96
    # runtime derate back to t=8 reproduces the measured product
    assert res8[3]["cap"] * 96 // 144 == 16 * 2048


def test_probe_ring_caps_clamps_window_keys():
    """Even / out-of-range windows measure the clamped kernel; the cache
    key must be the clamped window the runtime actually consults."""
    seen = []

    def factory(win, h, w, t, b):
        seen.append(win)

        def measure(fpb, bh):
            if bh > 8:
                raise ProbeOOM(f"bh={bh}")
            return 0.001 * bh
        return measure, 48, 2048

    res = autotune.probe_ring_caps(windows=(9, 4, 3), h=48, w=1920, b=64,
                                   measure_factory=factory)
    assert sorted(res) == [3, 7] and seen == [3, 7]  # clamped + deduped


def test_autotune_cli_refuses_gpu(capsys, monkeypatch):
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "gpu")
    assert autotune.main([]) == 1
    assert "needs a TPU" in capsys.readouterr().err


def test_probe_slab_ring_caps_with_fake_measure(monkeypatch):
    """probe_slab_ring_caps delegates with the rows axis, skips the
    stencil-free window 1, and reports owned-height caps."""
    seen = {}

    def fake_factory(win, h, w, t, b, rows_ax, approx=False, s=1):
        seen["rows"] = rows_ax

        def measure(fpb, bh):
            if bh > 16:
                raise ProbeOOM(f"bh={bh}")
            return 0.001 * bh
        return measure, 48, 2048  # owned hs, wp

    monkeypatch.setattr(autotune, "_slab_ring_measure_factory",
                        fake_factory)
    res = autotune.probe_slab_ring_caps(4, windows=(1, 3), h=192, w=1920,
                                        b=64)
    assert 1 not in res  # no stencil -> no bands -> no slab geometry
    assert res[3]["cap"] == 16 * 2048 and seen["rows"] == 4


def test_slab_ring_measure_factory_compiles(monkeypatch):
    """The slab probe's kernel composition (band inputs + row bounds at
    the owned height) actually compiles and runs (interpret on CPU)."""
    monkeypatch.setattr(autotune, "_two_point_fit",
                        lambda run, iters, repeats=3: 0.01)
    measure, hs, wp = autotune._slab_ring_measure_factory(
        3, 16, 24, t=2, b=4, rows_ax=2)
    assert hs == 8
    assert measure(2, 8) == 0.01  # compile+warmup ran inside
    with pytest.raises(ValueError, match="8-row"):
        autotune._slab_ring_measure_factory(3, 16, 24, t=2, b=4,
                                            rows_ax=3)
    with pytest.raises(ValueError, match="stencil"):
        autotune._slab_ring_measure_factory(1, 16, 24, t=2, b=4,
                                            rows_ax=2)


def test_slab_cap_scope(cache, monkeypatch):
    """Code-review r5: the s=1-probed slab cap is floored at the debited
    pin on the pinned device kind (coarse-ladder measurements cannot
    shrink the pick) and is NOT consumed by stacked slab shards (s > 1),
    whose Mosaic scheduling the probe did not cover."""
    from dips_tpu.ops import pallas_fused
    pin = pallas_fused._PINNED_DEVICE_KIND
    monkeypatch.setattr(tuning, "_device_kind", lambda: pin)
    # analytic debited path at owned 272 / wp 2048 picks 16
    assert pallas_fused._ring_geometry(272, 2048, 3, 4, 64,
                                       slab_bands=True)[1] == 16
    # a coarse slab cap BELOW the debited pin: floor holds
    tuning.save(pin, slab_ring_caps={3: {272: 2048 * 8}})
    assert pallas_fused._ring_geometry(272, 2048, 3, 4, 64,
                                       slab_bands=True)[1] == 16
    # a larger measured slab cap wins...
    tuning.save(pin, slab_ring_caps={3: {272: 2048 * 136}})
    assert pallas_fused._ring_geometry(272, 2048, 3, 4, 64,
                                       slab_bands=True)[1] == 136
    # ...but only for single-section shards: s > 1 keeps the debit
    assert pallas_fused._ring_geometry(272, 2048, 3, 4, 64, s=2,
                                       slab_bands=True)[1] == 16


def test_grid_mesh_rejects_nonpositive_axes():
    """Code-review r5: numpy reshape(-1, R) would silently reinterpret a
    negative axis into a wrong-topology mesh."""
    import pytest as _pytest
    from dips_tpu.parallel.grid2d import grid_mesh
    for s_ax, r_ax in ((-1, 4), (0, 4), (2, 0), (2, -2)):
        with _pytest.raises(ValueError, match=">= 1"):
            grid_mesh(s_ax, r_ax)


def test_stacked_slab_cap_keys_and_picker(cache, monkeypatch):
    """--mesh --stacked probes persist stacked_slab_ring_caps; stacked
    slab shards (s > 1) consult them, single-section shards don't."""
    from dips_tpu.ops import pallas_fused
    monkeypatch.setattr(tuning, "_device_kind", lambda: "TPU vSS")
    tuning.save("TPU vSS", stacked_slab_ring_caps={3: {272: 2048 * 136}})
    assert tuning.stacked_slab_ring_cap(3, 272, kind="TPU vSS") == 2048 * 136
    assert tuning.stacked_slab_ring_cap(3, 544, kind="TPU vSS") is None
    # s > 1 band shard: the stacked-slab measurement is authoritative
    assert pallas_fused._ring_geometry(272, 2048, 3, 4, 64, s=2,
                                       slab_bands=True)[1] == 136
    # s == 1 keeps the single-section path (no s=1 key saved -> debit)
    assert pallas_fused._ring_geometry(272, 2048, 3, 4, 64,
                                       slab_bands=True)[1] == 16
    # max-merge
    tuning.save("TPU vSS", stacked_slab_ring_caps={3: {272: 2048 * 16}})
    assert tuning.stacked_slab_ring_cap(3, 272, kind="TPU vSS") == 2048 * 136


def test_probe_slab_ring_caps_stacked_s_reaches_factory(monkeypatch):
    seen = {}

    def fake_factory(win, h, w, t, b, rows_ax, approx=False, s=1):
        seen["rows"], seen["s"] = rows_ax, s

        def measure(fpb, bh):
            if bh > 16:
                raise ProbeOOM(f"bh={bh}")
            return 0.001 * bh
        return measure, 48, 2048

    monkeypatch.setattr(autotune, "_slab_ring_measure_factory",
                        fake_factory)
    res = autotune.probe_slab_ring_caps(4, windows=(3,), h=192, w=1920,
                                        b=64, s=3)
    assert res[3]["cap"] == 16 * 2048 and seen == {"rows": 4, "s": 3}


def test_stacked_slab_measure_factory_compiles(monkeypatch):
    """The stacked slab probe's kernel composition (2 sections x bands x
    row bounds) compiles and runs (interpret on CPU)."""
    monkeypatch.setattr(autotune, "_two_point_fit",
                        lambda run, iters, repeats=3: 0.01)
    measure, hs, wp = autotune._slab_ring_measure_factory(
        3, 16, 24, t=2, b=4, rows_ax=2, s=2)
    assert hs == 8
    assert measure(2, 8) == 0.01
