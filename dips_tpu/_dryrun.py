"""Hermetic multi-chip dry run: the driver-facing sharding validation.

Run as ``python -m dips_tpu._dryrun N``: forces an N-device **virtual CPU
mesh** before any JAX backend is initialised — regardless of parent-process
environment (the axon sitecustomize pins ``JAX_PLATFORMS=axon``; a parent
may already hold the real TPU) — then compiles + executes every multi-chip
path on tiny shapes:

  1. data parallelism over streams (shard_map + psum over ICI),
     on both the XLA twin and the fused Pallas kernel (interpret on CPU),
     plus the multi-host engine's global-array plumbing in BOTH step
     protocols (XLA tail and the production pallas ring-carry);
  2. spatial row sharding of one stream with ppermute halo exchange;
  3. the composite 2-D (stream x rows) grid (median modes, tail + ring);
  4. raw (absdiff) fleet modes on the rows mesh and the 2-D grid.

``__graft_entry__.dryrun_multichip`` invokes this module in a fresh
subprocess so the platform forcing can never race a pre-initialised backend
(the round-1 in-process guard keyed off env vars and silently landed the
mesh work on the real chip).  Failures propagate loudly: non-zero exit,
traceback on stderr.
"""

from __future__ import annotations

import os
import sys


def run(n_devices: int) -> None:
    """The mesh workload.  Requires >= n_devices JAX devices (the caller is
    responsible for platform setup; see :func:`main`)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from dips_tpu.parallel import (MultiStreamEngine, make_rowsharded_step,
                                   stream_mesh)
    from dips_tpu.parallel.grid2d import grid_mesh, make_grid_step
    from dips_tpu.properties import DiPsFilter, DiPsProperties
    from dips_tpu.ops.reference import pad_geometry

    have = len(jax.devices())
    if have < n_devices:
        raise RuntimeError(
            f"dryrun needs {n_devices} devices, backend "
            f"{jax.default_backend()!r} provides {have}")

    props = DiPsProperties(window_size=3, temporal_size=2,
                           filter=DiPsFilter.SIGMOID)
    h, w = 16, 24
    s = n_devices
    rng = np.random.default_rng(0)
    feeds = [[rng.integers(0, 256, (h, w, 3), np.uint8) for _ in range(2)]
             for _ in range(s)]

    # 1. stream-axis data parallelism: XLA twin + fused Pallas kernel in
    # both step protocols (ring-carry = the TPU streaming default, tail =
    # the sharded-path protocol), plus the device-side hwc input layout
    mesh = stream_mesh(n_devices)
    for backend, ring, layout in (("xla", None, "planar"),
                                  ("pallas", False, "planar"),
                                  ("pallas", True, "planar"),
                                  ("pallas", True, "hwc")):
        eng = MultiStreamEngine(props, h, w, n_streams=s, batch=2,
                                mesh=mesh, backend=backend, ring_carry=ring,
                                input_layout=layout)
        out, stats, gmean = eng.process_batch(feeds)
        assert out.shape == (s, 2, h, w, 3), (backend, out.shape)
        assert np.isfinite(stats).all() and np.isfinite(gmean), backend

    # 1b. the multi-host engine (pod scale-out path): in a single process
    # it degenerates to every stream being local, but the global-array
    # plumbing (make_array_from_single_device_arrays in, addressable-shard
    # gather out) is exactly what runs per host on a pod.  BOTH protocols:
    # the portable XLA tail step AND the production pallas ring-carry step
    # (the default on every single-host TPU deployment) must compile and
    # run through the global-array plumbing — two batches so the carried
    # ring state crosses a step boundary inside global arrays
    from dips_tpu.parallel import MultiHostStreamEngine
    for mh_backend, mh_ring in (("xla", None), ("pallas", True)):
        mh = MultiHostStreamEngine(props, h, w, n_streams=s, batch=2,
                                   mesh=mesh, backend=mh_backend,
                                   ring_carry=mh_ring)
        assert mh.local_stream_ids == list(range(s))
        assert mh.ring_carry is (mh_ring or False)
        feed = mh.local_frames_template()
        for si in mh.local_stream_ids:
            feed[si] = feeds[si]
        for _ in range(2):
            mout, mstats, mgmean = mh.process_batch(feed)
            assert mout.shape == (s, 2, h, w, 3), mout.shape
            assert np.isfinite(mstats).all() and np.isfinite(mgmean)

    # 1c. multi-host raw fleet (the pod events-fleet shape): the raw ring
    # protocol's carried u8 prev/baseline state through global arrays
    from dips_tpu.properties import OutputMode as _OM
    rawp_mh = DiPsProperties(output=_OM.STATS_ONLY, temporal_size=2)
    mhr = MultiHostStreamEngine(rawp_mh, h, w, n_streams=s, batch=2,
                                mesh=mesh, backend="pallas",
                                ring_carry=True)
    feed = mhr.local_frames_template()
    for si in mhr.local_stream_ids:
        feed[si] = feeds[si]
    for _ in range(2):
        mout, mstats, mgmean = mhr.process_batch(feed)
        assert mout.shape == (s, 2, h, w, 0), mout.shape
        assert np.isfinite(mstats).all() and np.isfinite(mgmean)

    # 2. spatial row sharding with ICI halo exchange (ppermute)
    rows_mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:n_devices]),
                                  ("rows",))
    hh = max(8 * n_devices, 16)  # >= 1 tile row per device
    hp, wp = pad_geometry(hh, 24)
    t, b = props.temporal_size, 2
    step = make_rowsharded_step(props, hh, 24, rows_mesh)
    raw = jnp.asarray(rng.integers(0, 256, (t + b, 3, hp, wp), np.uint8))
    out2, stats2, _, _ = step(
        raw, jnp.zeros((hp, wp), jnp.float32),
        jnp.asarray([True, False]), jnp.zeros((hp, wp), jnp.float32),
        jnp.ones((b,), bool))
    assert out2.shape[0] == b and np.isfinite(np.asarray(stats2)).all()

    # 3. composite 2-D grid: streams x row slabs on one mesh
    s_ax = 2 if n_devices % 2 == 0 and n_devices >= 2 else 1
    r_ax = n_devices // s_ax
    gmesh = grid_mesh(s_ax, r_ax)
    gh = 8 * r_ax
    ghp, gwp = pad_geometry(gh, 24)
    graw = jnp.asarray(
        rng.integers(0, 256, (s_ax, t + b, 3, ghp, gwp), np.uint8))
    for gbackend in ("xla", "pallas"):  # both 2-D shard bodies must compile
        gstep = make_grid_step(props, gh, 24, gmesh, backend=gbackend)
        gout, gstats, _, _, gscalar = gstep(
            graw, jnp.zeros((s_ax, ghp, gwp), jnp.float32),
            jnp.asarray([[True, False]] * s_ax),
            jnp.zeros((s_ax, ghp, gwp), jnp.float32),
            jnp.ones((s_ax, b), bool))
        assert gout.shape[:2] == (s_ax, b)
        assert np.isfinite(np.asarray(gstats)).all() and np.isfinite(gscalar)

    # 3b. ring-carry on the 2-D grid (carried slab state + per-batch raw
    # halo exchange) through the full engine surface, two batches so the
    # carried ring state actually crosses a step boundary
    geng = MultiStreamEngine(props, gh, 24, n_streams=s_ax, batch=b,
                             mesh=gmesh, backend="pallas", ring_carry=True)
    assert geng.ring_carry
    gfeeds = [[rng.integers(0, 256, (gh, 24, 3), np.uint8)
               for _ in range(b)] for _ in range(s_ax)]
    for _ in range(2):
        gout, gstats, ggm = geng.process_batch(gfeeds)
        assert gout.shape == (s_ax, b, gh, 24, 3)
        assert np.isfinite(gstats).all() and np.isfinite(ggm)

    # 3c. ring-carry row-sharded single stream
    from dips_tpu.parallel import make_rowsharded_ring_step
    rstep = make_rowsharded_ring_step(props, hh, 24, rows_mesh)
    rout, rstats, rr, rp, rb2, rh2 = rstep(
        jnp.asarray(rng.integers(0, 256, (b, 3, hp, wp), np.uint8)),
        jnp.zeros((t, hp, wp), jnp.float32),
        jnp.zeros((hp, wp), jnp.float32),
        jnp.zeros((hp, wp), jnp.float32),
        jnp.asarray([True, False]), jnp.zeros((hp, wp), jnp.float32),
        jnp.ones((b,), bool), jnp.int32(0), jnp.int32(1))
    assert rout.shape[0] == b and np.isfinite(np.asarray(rstats)).all()

    # 4. raw (absdiff) modes on the rows mesh: no halo, stats over ICI —
    # the 8K-class single-enormous-stream shape (tiny stand-in geometry),
    # tail + ring protocols
    from dips_tpu.properties import OutputMode
    rawp = DiPsProperties(output=OutputMode.ABSDIFF, temporal_size=t)
    astep = make_rowsharded_step(rawp, hh, 24, rows_mesh, backend="pallas")
    araw = jnp.asarray(rng.integers(0, 256, (t + b, 3, hp, wp), np.uint8))
    aout, astats, _, _ = astep(
        araw, jnp.zeros((3, hp, wp), jnp.uint8), jnp.asarray([True, False]),
        jnp.zeros((hp, wp), jnp.float32), jnp.ones((b,), bool))
    assert aout.shape[0] == b and np.isfinite(np.asarray(astats)).all()
    arstep = make_rowsharded_ring_step(rawp, hh, 24, rows_mesh)
    aout2, astats2, _, _, _ = arstep(
        araw[t:], jnp.zeros((3, hp, wp), jnp.uint8),
        jnp.zeros((3, hp, wp), jnp.uint8), jnp.asarray([True, False]),
        jnp.zeros((hp, wp), jnp.float32), jnp.ones((b,), bool),
        jnp.int32(1))
    assert aout2.shape[0] == b and np.isfinite(np.asarray(astats2)).all()

    # 4b. raw modes on the 2-D (stream x rows) grid — the fleet-on-a-pod
    # shape (many huge no-map cameras): tail bodies on both backends, then
    # ring-carry through the full engine surface (two batches)
    graw_r = jnp.asarray(
        rng.integers(0, 256, (s_ax, t + b, 3, ghp, gwp), np.uint8))
    for gbackend in ("xla", "pallas"):
        grstep = make_grid_step(rawp, gh, 24, gmesh, backend=gbackend)
        gro, grs, _, _, grg = grstep(
            graw_r, jnp.zeros((s_ax, 3, ghp, gwp), jnp.uint8),
            jnp.asarray([[True, False]] * s_ax),
            jnp.zeros((s_ax, ghp, gwp), jnp.float32),
            jnp.ones((s_ax, b), bool))
        assert gro.shape[:2] == (s_ax, b)
        assert np.isfinite(np.asarray(grs)).all() and np.isfinite(grg)
    rgeng = MultiStreamEngine(rawp, gh, 24, n_streams=s_ax, batch=b,
                              mesh=gmesh, backend="pallas",
                              ring_carry=True)
    assert rgeng.ring_carry
    rgfeeds = [[rng.integers(0, 256, (gh, 24, 3), np.uint8)
                for _ in range(b)] for _ in range(s_ax)]
    for _ in range(2):
        rgo, rgs, rgg = rgeng.process_batch(rgfeeds)
        assert rgo.shape == (s_ax, b, gh, 24, 3)
        assert np.isfinite(rgs).all() and np.isfinite(rgg)


def main(argv=None) -> int:
    args = sys.argv[1:] if argv is None else argv
    n = int(args[0]) if args else 8

    # Platform forcing MUST precede any backend initialisation.  Replace any
    # inherited host-device-count flag with ours, then pin the CPU platform
    # via jax.config (the env var is overridden by the axon sitecustomize).
    # No try/except: if the config update fails the backend was already
    # initialised and this process cannot honestly dry-run — fail loudly.
    flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    os.environ["XLA_FLAGS"] = " ".join(
        [f"--xla_force_host_platform_device_count={n}"] + flags)
    import jax
    jax.config.update("jax_platforms", "cpu")

    # Persistent compile cache (keyed on platform, so CPU entries never
    # collide with the TPU ones bench.py writes): the driver dry-runs this
    # cold every round.
    from dips_tpu.utils.compilecache import enable_compile_cache
    enable_compile_cache()

    run(n)
    print("DRYRUN-OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
