"""Multi-stream sharding: batch many videos across a TPU mesh.

The reference is strictly one process / one GPU / one stream (SURVEY.md §2
parallelism inventory).  The meaningful TPU parallelism for this workload is
**data parallelism over streams**: stack S independent video streams, shard
the stream axis over a 1-D device mesh with ``jax.shard_map``, run the fused
per-stream pipeline on each shard, and reduce global statistics over ICI with
``psum`` — XLA inserts the collectives (no NCCL/MPI analogue needed;
SURVEY.md §2 "Communication backend" row).

Tensor/pipeline/sequence/expert parallelism are N/A for this workload (no
matmuls, no sequence attention — SURVEY.md §2): a frame's pixel math is
local, so the only cross-device axes are streams (here) and, for a single
giant stream, row-sharding (possible but unnecessary: one v5e chip already
sustains >1080p line rate).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..errors import StreamError
from ..properties import DiPsProperties, OutputMode
from ..ops import reference
from ..ops.oracle import NUM_STATS

_RAW_MODES = (OutputMode.ABSDIFF, OutputMode.THRESHOLD,
              OutputMode.STATS_ONLY)


def stream_mesh(n_devices: Optional[int] = None,
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """A 1-D mesh over the stream axis (ICI-adjacent device order)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            if n_devices > len(devices):
                raise ValueError(
                    f"stream_mesh: {n_devices} devices requested, only "
                    f"{len(devices)} available")
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("stream",))


def make_sharded_step(props: DiPsProperties, h: int, w: int, mesh: Mesh,
                      backend: str = "auto"):
    """Build a jitted multi-stream step sharded over ``mesh``.

    The returned function maps
      raw (S, T+B, 3, Hp, Wp) u8, baseline (S, [3,] Hp, Wp), flags (S, B)
    -> (out (S, B, C, Hp, Wp) u8, stats (S, B, NUM_STATS) f32, new baseline,
        global_mean_abs_diff scalar)
    with S sharded over the stream axis; the scalar is a cross-chip ``psum``
    mean (rides ICI).
    """
    raw_mode = props.output in _RAW_MODES
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"

    if backend == "pallas":
        # stacked-stream mode: the shard's local streams fold along the row
        # axis of ONE kernel instance instead of vmap dispatching one kernel
        # per stream — measured ~2x multi-stream throughput on chip
        # (BASELINE.md).  Layout conversions are device-side transposes.
        from ..ops import pallas_fused
        from .grid2d import stacked_raw_call

        def per_shard(raw, baseline, flags, heatmap, valid):
            if raw_mode:
                # shared stack/call/unstack body (grid2d.stacked_raw_call
                # — the 2-D grid raw bodies use the same one)
                out, stats, nb, nh = stacked_raw_call(
                    props, h, w, raw, baseline, flags, heatmap, valid)
                return out, stats, nb, nh, _gmean_impl(stats, valid)
            s_l, tb = raw.shape[0], raw.shape[1]
            hp, wp = raw.shape[-2], raw.shape[-1]
            raw_st = raw.transpose(1, 2, 0, 3, 4).reshape(
                tb, 3, s_l * hp, wp)
            bl_st = baseline.reshape(s_l * hp, wp)
            hm_st = heatmap.reshape(s_l * hp, wp)
            out, stats, nb, nh = pallas_fused._batch_step_impl(
                props, h, w, s_l, raw_st, bl_st, flags, hm_st, valid)
            b, c = out.shape[0], out.shape[1]
            out = out.reshape(b, c, s_l, hp, wp).transpose(2, 0, 1, 3, 4)
            nb = nb.reshape(s_l, hp, wp)
            nh = nh.reshape(s_l, hp, wp)
            return out, stats, nb, nh, _gmean_impl(stats, valid)
    else:
        step = (reference.absdiff_step if raw_mode
                else reference.batch_step).__wrapped__

        def per_shard(raw, baseline, flags, heatmap, valid):
            out, stats, new_b, new_h = jax.vmap(
                lambda r, b, f, hm, v: step(props, h, w, r, b, f, hm, v))(
                    raw, baseline, flags, heatmap, valid)
            return out, stats, new_b, new_h, _gmean_impl(stats, valid)

    # check_vma=False: pallas_call out_shapes don't carry varying-mesh-axis
    # annotations; the specs below are the full contract.
    sharded = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P("stream"), P("stream"), P("stream"), P("stream"),
                  P("stream")),
        out_specs=(P("stream"), P("stream"), P("stream"), P("stream"), P()),
        check_vma=False)
    # baseline/heatmap carries update in place across steps
    return jax.jit(sharded, donate_argnums=(1, 3))


def _gmean_impl(stats, valid):
    """Global mean |diff| over VALID slots only (psum over ICI): padding
    replicas and dead streams must not pollute the aggregate."""
    vw = valid.astype(jnp.float32)
    total = jax.lax.psum(jnp.sum(stats[..., 1] * vw), axis_name="stream")
    count = jax.lax.psum(jnp.sum(vw), axis_name="stream")
    return total / jnp.maximum(count, 1.0)


def make_sharded_ring_step(props: DiPsProperties, h: int, w: int,
                           mesh: Mesh):
    """Ring-carry twin of :func:`make_sharded_step` (Pallas only).

    Carried state (filtered ring / previous frame, baseline, heatmap) lives
    on device per stream; the input is only the B new frames per stream.
    Each shard folds its local streams along the row axis of ONE stacked
    ring kernel instance with per-stream cursors/seeds.

    Median modes map
      raw (S, B, 3, Hp, Wp) u8, ring (S, T, Hp, Wp) f32, prev (S, Hp, Wp),
      baseline (S, Hp, Wp), flags/valid (S, B), offsets/seeds (S,)
    -> (out, stats, new ring, new prev, new baseline, new heatmap, gmean);
    raw modes carry prev as (S, 3, Hp, Wp) u8 and have no ring/offsets.
    """
    raw_mode = props.output in _RAW_MODES

    if raw_mode:
        from .grid2d import stacked_raw_call

        def per_shard(raw, prev, baseline, flags, heatmap, valid, seeds):
            # shared stack/call/unstack body (grid2d.stacked_raw_call)
            out, stats, npv, nb, nh = stacked_raw_call(
                props, h, w, raw, baseline, flags, heatmap, valid,
                prev=prev, seeds=seeds, ring=True)
            return out, stats, npv, nb, nh, _gmean_impl(stats, valid)

        sharded = jax.shard_map(
            per_shard, mesh=mesh,
            in_specs=(P("stream"),) * 7,
            out_specs=(P("stream"),) * 5 + (P(),),
            check_vma=False)
        return jax.jit(sharded, donate_argnums=(1, 2, 4))

    from ..ops import pallas_fused

    def per_shard(raw, ring, prev, baseline, flags, heatmap, valid,
                  offsets, seeds):
        s_l, b = raw.shape[0], raw.shape[1]
        t = ring.shape[1]
        hp, wp = raw.shape[-2], raw.shape[-1]
        raw_st = raw.transpose(1, 2, 0, 3, 4).reshape(b, 3, s_l * hp, wp)
        ring_st = ring.transpose(1, 0, 2, 3).reshape(t, s_l * hp, wp)
        pv_st = prev.reshape(s_l * hp, wp)
        bl_st = baseline.reshape(s_l * hp, wp)
        hm_st = heatmap.reshape(s_l * hp, wp)
        out, stats, nr, npv, nb, nh = pallas_fused._batch_step_ring_impl(
            props, h, w, s_l, raw_st, ring_st, pv_st, bl_st, flags, hm_st,
            valid, offsets, seeds)
        c = out.shape[1]
        out = out.reshape(b, c, s_l, hp, wp).transpose(2, 0, 1, 3, 4)
        nr = nr.reshape(t, s_l, hp, wp).transpose(1, 0, 2, 3)
        npv = npv.reshape(s_l, hp, wp)
        nb = nb.reshape(s_l, hp, wp)
        nh = nh.reshape(s_l, hp, wp)
        return out, stats, nr, npv, nb, nh, _gmean_impl(stats, valid)

    sharded = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P("stream"),) * 9,
        out_specs=(P("stream"),) * 6 + (P(),),
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(1, 2, 3, 5))


class MultiStreamEngine:
    """Batch runner over S parallel streams with per-stream failure isolation.

    Mirrors ``DiPsEngine`` but the leading axis is streams; feed one frame
    list per stream.  A stream that errors on the host side (short video,
    bad frame) is masked out and reported — it does not abort the batch
    (SURVEY.md §5 'Failure detection': the reference panics instead).
    """

    #: multi-host engines set this: the jitted step contains COLLECTIVES,
    #: so every "nothing to do locally" shortcut (no tails to rebuild, an
    #: all-empty process_batch round) must still enter the step — one
    #: process skipping it while a peer runs it deadlocks the mesh
    _lockstep_collectives = False

    def __init__(self, props: DiPsProperties, height: int, width: int,
                 n_streams: int, batch: int = 8,
                 mesh: Optional[Mesh] = None, backend: str = "auto",
                 ring_carry: Optional[bool] = None,
                 packed_wire: bool = False,
                 input_layout: str = "planar",
                 downscale: int = 1,
                 slab_impl: str = "bands"):
        self.props = props
        if slab_impl not in ("bands", "extended"):
            # validated on EVERY mesh shape (a 1-D stream mesh ignores the
            # setting, but a typo'd fleet launch must still fail loudly)
            raise ValueError(f"unknown slab_impl {slab_impl!r}")
        if packed_wire and (props.output != OutputMode.THRESHOLD
                            or props.out_channels == 0):
            raise ValueError("packed_wire requires THRESHOLD output with "
                             "emit_maps=True (there must be masks to pack)")
        self.packed_wire = bool(packed_wire)
        self._raw_mode = props.output in _RAW_MODES
        #: on-device input decimation per stream (mirrors DiPsEngine):
        #: frames arrive at the full input geometry, the pipeline runs at
        #: height/k x width/k (the hwc upload path is implied)
        self.downscale = int(downscale)
        if self.downscale < 1:
            raise ValueError(f"downscale must be >= 1, got {downscale}")
        self.in_height, self.in_width = int(height), int(width)
        if self.downscale > 1:
            k = self.downscale
            if height % k or width % k:
                raise ValueError(
                    f"downscale {k} must divide the input geometry "
                    f"{height}x{width}")
            height, width = height // k, width // k
            if input_layout == "planar":
                input_layout = "hwc"  # decimation runs in the device prep
        self.height, self.width = int(height), int(width)
        self.hp, self.wp = reference.pad_geometry(height, width)
        self.batch = int(batch)
        self.input_layout, self._swap_rb, self._hwc_prep = (
            reference.make_layout_prep(input_layout, self.height,
                                       self.width, self.hp, self.wp,
                                       downscale=self.downscale))
        self.mesh = mesh if mesh is not None else stream_mesh()
        if "rows" in self.mesh.axis_names:
            # composite 2-D (stream x rows) grid: each device owns a
            # horizontal slab of a subset of streams (grid2d.make_grid_step)
            # with a choice of shard body: the fused Pallas stacked-slab
            # kernel (owned-coordinate slabs with neighbour-band halo
            # inputs, TPU; ring-carry or tail protocol) or the portable
            # XLA body (tail only)
            from .grid2d import (make_grid_ring_step, make_grid_step,
                                 slab_rows_ok)
            n_shard = self.mesh.shape["stream"]
            rows_ax = self.mesh.shape["rows"]
            if self.hp % rows_ax:
                raise ValueError(
                    f"rows axis {rows_ax} must divide the padded height "
                    f"{self.hp}")
            resolved = backend
            if resolved == "auto":
                resolved = ("pallas" if jax.default_backend() == "tpu"
                            and slab_rows_ok(self.hp, rows_ax) else "xla")
            if ring_carry is None:
                ring_carry = resolved == "pallas"
            if ring_carry and resolved != "pallas":
                raise ValueError(
                    "ring_carry on a 2-D mesh requires the pallas backend")
            if ring_carry:
                self._step = make_grid_ring_step(props, height, width,
                                                 self.mesh,
                                                 slab_impl=slab_impl)
            else:
                self._step = make_grid_step(props, height, width, self.mesh,
                                            backend=resolved,
                                            slab_impl=slab_impl)
        else:
            n_shard = self.mesh.devices.size
            resolved = backend
            if resolved == "auto":
                resolved = ("pallas" if jax.default_backend() == "tpu"
                            else "xla")
            if ring_carry is None:
                ring_carry = resolved == "pallas"
            if ring_carry and resolved != "pallas":
                raise ValueError("ring_carry requires the pallas backend")
            if ring_carry:
                self._step = make_sharded_ring_step(props, height, width,
                                                    self.mesh)
            else:
                self._step = make_sharded_step(props, height, width,
                                               self.mesh, backend)
        if n_streams % n_shard:
            raise ValueError(
                f"n_streams={n_streams} must be a multiple of the stream "
                f"axis size {n_shard}")
        self.ring_carry = bool(ring_carry) and resolved == "pallas"
        self.backend = resolved
        self.n_streams = int(n_streams)
        self._stage_bufs = None        # lazily-built persistent staging
        self._stage_written = set()    # rows holding stale frame bytes
        self.reset()

    # -- device-array hooks ---------------------------------------------------
    # The multi-host subclass (parallel/multihost.py) overrides these three
    # to lift host buffers into GLOBAL jax.Arrays (this process contributes
    # only its addressable shards) and to read back only the local shards.
    # Single-process engines map host<->device 1:1.
    def _zeros(self, shape, dtype):
        """Carried device state, leading axis = streams."""
        return jnp.zeros(shape, dtype)

    def _to_device(self, x):
        """Host->device for step inputs, leading axis = streams."""
        return jnp.asarray(x)

    def _fetch(self, x, n: Optional[int] = None):
        """Device->host; ``n`` optionally slices the second (frame) axis
        before the transfer."""
        return np.asarray(x if n is None else x[:, :n])

    # -- host staging hooks ---------------------------------------------------
    # Host-side staging buffers hold only the streams THIS process feeds:
    # a single-process engine stages all of them; the multi-host subclass
    # stages its local share (a 16-host pod must not zero 16x the memory).
    def _staging(self, hwc: bool, tr: int):
        """Persistent host staging buffers for :meth:`process_batch`.

        Allocating + page-faulting these fresh per batch is real hot-path
        cost (the planar tail-protocol buffer is S*(T+B)*3*Hp*Wp bytes —
        gigabytes at 1080p): reuse instead.  Safe because process_batch
        blocks on the step's OUTPUTS before returning, so the previous
        step can no longer be reading a (possibly zero-copy-aliased on
        the CPU backend) input when the buffers are refilled; donation
        only ever applies to carried state, never the raw input.  Rows a
        batch does not write are re-zeroed from ``_stage_written`` so the
        staged bytes stay bitwise identical to fresh zeros."""
        if self._stage_bufs is None:
            sh, t, b = self._stage_rows(), self.props.temporal_size, \
                self.batch
            if hwc:
                buf = np.zeros((sh, b, self.in_height, self.in_width, 3),
                               np.uint8)
                tails = (np.zeros((sh, t, 3, self.hp, self.wp), np.uint8)
                         if tr else None)
            else:
                buf = np.zeros((sh, tr + b, 3, self.hp, self.wp), np.uint8)
                tails = None
            self._stage_bufs = (buf, tails,
                                np.zeros((sh, b), np.bool_),
                                np.zeros((sh, b), np.bool_),
                                np.zeros((sh,), np.int32))
        buf, tails, flags, valid, seeds = self._stage_bufs
        flags[:] = False
        valid[:] = False
        seeds[:] = 0
        return buf, tails, flags, valid, seeds

    def _stage_rows(self) -> int:
        """Leading dim of host staging buffers."""
        return self.n_streams

    def _stage_index(self, si: int) -> int:
        """Staging-buffer row for global stream ``si``; -1 = not ours."""
        return si

    def _stage_gather(self, seq) -> np.ndarray:
        """Per-global-stream host values -> staging order."""
        return np.asarray(seq)

    def reset(self) -> None:
        self.frame_cursors = [0] * self.n_streams
        self._tails = [None] * self.n_streams
        if self._raw_mode:
            self._baseline = self._zeros(
                (self.n_streams, 3, self.hp, self.wp), jnp.uint8)
        else:
            self._baseline = self._zeros((self.n_streams, self.hp, self.wp),
                                         jnp.float32)
        self._heatmap = self._zeros((self.n_streams, self.hp, self.wp),
                                    jnp.float32)
        self._ring = self._prev = None
        self._ring_offs = [0] * self.n_streams
        if self.ring_carry:
            t = self.props.temporal_size
            if self._raw_mode:
                self._prev = self._zeros(
                    (self.n_streams, 3, self.hp, self.wp), jnp.uint8)
            else:
                self._ring = self._zeros(
                    (self.n_streams, t, self.hp, self.wp), jnp.float32)
                self._prev = self._zeros((self.n_streams, self.hp, self.wp),
                                         jnp.float32)
        self._snap_pending = [False] * self.n_streams
        self.failed: dict[int, StreamError] = {}

    def snapshot(self, stream: Optional[int] = None) -> None:
        """Force baseline re-capture on the next processed frame — for one
        stream, or all of them (the multi-stream GUI-SnapShot analogue;
        mirrors ``DiPsEngine.snapshot``)."""
        if stream is None:
            self._snap_pending = [True] * self.n_streams
        else:
            self._snap_pending[stream] = True

    @property
    def frame_index(self) -> int:
        """Furthest per-stream cursor (streams advance independently)."""
        return max(self.frame_cursors, default=0)

    # -- per-stream failure recovery (SURVEY.md §5 'Failure detection /
    #    elastic recovery': the reference panics; here a stream can rejoin) --
    def revive(self, stream: int) -> None:
        """Clear a stream's failure and let it continue from its old state
        (cursor, baseline and ring tail are preserved)."""
        self.failed.pop(stream, None)

    def reset_stream(self, stream: int) -> None:
        """Clear a stream's failure AND restart it fresh: cursor back to 0
        (so its next frame re-captures the baseline), ring tail dropped,
        baseline/heatmap rows zeroed.  Sibling streams are untouched."""
        self.failed.pop(stream, None)
        self.frame_cursors[stream] = 0
        self._snap_pending[stream] = False
        self._tails[stream] = None
        self._baseline = self._baseline.at[stream].set(0)
        self._heatmap = self._heatmap.at[stream].set(0)
        self._ring_offs[stream] = 0
        if self._ring is not None:
            self._ring = self._ring.at[stream].set(0)
        if self._prev is not None:
            self._prev = self._prev.at[stream].set(0)

    def heatmaps(self) -> np.ndarray:
        """(S, H, W) accumulated |diff| heatmaps, cropped (multi-host
        engines return only this process's streams)."""
        return self._fetch(self._heatmap)[:, :self.height, :self.width]

    # -- checkpoint / resume (SURVEY.md §5; mirrors DiPsEngine) -------------
    def state_dict(self) -> dict:
        return {
            "frame_cursors": list(self.frame_cursors),
            "baseline": self._fetch(self._baseline),
            "heatmap": self._fetch(self._heatmap),
            "tails": [np.stack(t) if t is not None else None
                      for t in self._tails],
            "failed": sorted(self.failed),
        }

    def load_state_dict(self, state: dict) -> None:
        bl = np.asarray(state["baseline"])
        expect = ((self.n_streams, 3, self.hp, self.wp) if self._raw_mode
                  else (self.n_streams, self.hp, self.wp))
        if bl.shape != expect:
            raise ValueError(
                f"checkpoint baseline shape {bl.shape} != engine's "
                f"expected {expect}")
        if len(state["frame_cursors"]) != self.n_streams:
            raise ValueError("checkpoint stream count mismatch")
        self.frame_cursors = [int(c) for c in state["frame_cursors"]]
        self._baseline = self._to_device(np.asarray(state["baseline"]))
        self._heatmap = self._to_device(np.asarray(state["heatmap"]))
        self._tails = [list(t) if t is not None else None
                       for t in state["tails"]]
        self.failed = {
            int(si): StreamError(int(si),
                                 RuntimeError("restored from checkpoint"))
            for si in state.get("failed", ())}
        # a snapshot requested before the restore must not fire after it
        # (it would re-capture every baseline and discard the checkpoint's);
        # mirrors the per-stream load_stream_state
        self._snap_pending = [False] * self.n_streams
        if self.ring_carry:
            self._rebuild_ring_state()
        else:
            self._ring_offs = [0] * self.n_streams

    def _rebuild_ring_state(self) -> None:
        """Reconstruct carried device ring/prev state from the raw tails
        (checkpoints store tails, so they stay portable across modes and
        backends; mirrors DiPsEngine._rebuild_ring_state).  Streams without
        a tail keep zero state and re-seed on their first real frame."""
        t = self.props.temporal_size
        s = self.n_streams
        self._ring_offs = [0] * s
        if self._raw_mode:
            self._prev = self._zeros((s, 3, self.hp, self.wp), jnp.uint8)
        else:
            self._ring = self._zeros((s, t, self.hp, self.wp), jnp.float32)
            self._prev = self._zeros((s, self.hp, self.wp), jnp.float32)
        has = [tl is not None for tl in self._tails]
        if not any(has) and not self._lockstep_collectives:
            # multi-host engines can't take this shortcut: the step's psum
            # is a COLLECTIVE, and one process skipping it while a peer
            # (which has tails) runs it would deadlock the mesh
            return
        sh = self._stage_rows()
        buf = np.zeros((sh, t, 3, self.hp, self.wp), np.uint8)
        for si, tl in enumerate(self._tails):
            row = self._stage_index(si)
            if row >= 0 and tl is not None:
                buf[row] = np.stack(tl)
        has_l = self._stage_gather(has)
        flags = self._to_device(np.zeros((sh, t), bool))
        valid = self._to_device(np.tile(has_l[:, None], (1, t)))
        seeds = self._to_device(has_l.astype(np.int32))
        scratch_hm = self._zeros((s, self.hp, self.wp), jnp.float32)
        if self._raw_mode:
            _, _, self._prev, self._baseline, _, _ = self._step(
                self._to_device(buf), self._prev, self._baseline, flags,
                scratch_hm, valid, seeds)
        else:
            offsets = self._to_device(np.zeros((sh,), np.int32))
            _, _, self._ring, self._prev, self._baseline, _, _ = self._step(
                self._to_device(buf), self._ring, self._prev, self._baseline,
                flags, scratch_hm, valid, offsets, seeds)

    # -- per-stream checkpointing (DiPsEngine-compatible format) ------------
    def stream_state_dict(self, stream: int) -> dict:
        """One slot's streaming state, in ``DiPsEngine.state_dict`` form —
        a slot checkpoint restores into a single-stream engine and vice
        versa (the serve daemon uses this to park/restore coalesced
        sessions to disk)."""
        tl = self._tails[stream]
        return {
            "frame_index": self.frame_cursors[stream],
            "baseline": np.asarray(self._baseline[stream]),
            "heatmap": np.asarray(self._heatmap[stream]),
            "tail": np.stack(tl) if tl is not None else None,
        }

    def load_stream_state(self, stream: int, state: dict) -> None:
        """Restore ONE slot from a ``DiPsEngine``-format state dict; sibling
        slots keep their live state (their device ring is rebuilt bit-exactly
        from the raw tails the engine already carries for checkpointing)."""
        bl = np.asarray(state["baseline"])
        expect = ((3, self.hp, self.wp) if self._raw_mode
                  else (self.hp, self.wp))
        if bl.shape != expect:
            raise ValueError(
                f"checkpoint baseline shape {bl.shape} != engine's "
                f"expected per-stream {expect}")
        t = self.props.temporal_size
        tail = state.get("tail")
        if tail is not None:
            tl = [np.asarray(f) for f in tail][-t:]
            if len(tl) < t:  # short tail: replicate the oldest (seeding rule)
                tl = [tl[0]] * (t - len(tl)) + tl
            if tl[0].shape != (3, self.hp, self.wp):
                raise ValueError(
                    f"checkpoint tail frame shape {tl[0].shape} != "
                    f"{(3, self.hp, self.wp)}")
            self._tails[stream] = tl
        else:
            self._tails[stream] = None
        self.failed.pop(stream, None)
        self._snap_pending[stream] = False
        self.frame_cursors[stream] = int(state["frame_index"])
        self._baseline = self._baseline.at[stream].set(jnp.asarray(bl))
        hm = state.get("heatmap")
        if hm is not None:
            self._heatmap = self._heatmap.at[stream].set(jnp.asarray(hm))
        self._ring_offs[stream] = 0
        if self.ring_carry:
            self._rebuild_ring_state()

    def save_stream(self, stream: int, path: str) -> None:
        """Checkpoint one slot to disk — byte-compatible with
        ``DiPsEngine.save`` (same npz keys), so sessions migrate between a
        dedicated server and a coalesced slot."""
        s = self.stream_state_dict(stream)
        np.savez_compressed(
            path, frame_index=s["frame_index"], baseline=s["baseline"],
            heatmap=s["heatmap"],
            tail=s["tail"] if s["tail"] is not None
            else np.zeros((0,), np.uint8),
            geometry=np.asarray([self.height, self.width], np.int64))

    def load_stream(self, stream: int, path: str) -> None:
        z = np.load(path)
        if "geometry" in z.files:
            gh, gw = (int(v) for v in z["geometry"])
            if (gh, gw) != (self.height, self.width):
                raise ValueError(
                    f"checkpoint geometry {gh}x{gw} != engine "
                    f"{self.height}x{self.width}")
        tail = z["tail"]
        self.load_stream_state(stream, {
            "frame_index": int(z["frame_index"]),
            "baseline": z["baseline"],
            "heatmap": z["heatmap"],
            "tail": tail if tail.size else None,
        })

    def save(self, path: str) -> None:
        s = self.state_dict()
        t = self.props.temporal_size
        tails = np.stack([
            tl if tl is not None else np.zeros((t, 3, self.hp, self.wp),
                                               np.uint8)
            for tl in s["tails"]])
        has_tail = np.asarray([tl is not None for tl in s["tails"]])
        np.savez_compressed(
            path, frame_cursors=np.asarray(s["frame_cursors"]),
            baseline=s["baseline"], heatmap=s["heatmap"], tails=tails,
            has_tail=has_tail, failed=np.asarray(s["failed"], np.int64))

    def load(self, path: str) -> None:
        z = np.load(path)
        self.load_state_dict({
            "frame_cursors": z["frame_cursors"].tolist(),
            "baseline": z["baseline"],
            "heatmap": z["heatmap"],
            "tails": [z["tails"][i] if z["has_tail"][i] else None
                      for i in range(z["tails"].shape[0])],
            "failed": z["failed"].tolist(),
        })

    def _planarize(self, frame: np.ndarray) -> np.ndarray:
        if frame.shape[:2] != (self.height, self.width):
            raise ValueError(
                f"frame shape {frame.shape} != "
                f"{(self.height, self.width, 3)}")
        # single-pass native layout transform (numpy fallback inside)
        from .. import native
        return native.planarize(frame, self.hp, self.wp)

    def process_batch(self, frames_per_stream: Sequence[Sequence[np.ndarray]]
                      ) -> Tuple[np.ndarray, np.ndarray, float]:
        """Process up to ``batch`` frames for each of the S streams.

        All live streams must supply the same number of frames n (dead or
        exhausted streams pass an empty list and are replayed with zeros).
        Returns (out (S, n, H, W, C), stats (S, n, NUM_STATS), global mean);
        multi-host engines return only this process's S_local streams.
        """
        s = self.n_streams
        if len(frames_per_stream) != s:
            raise ValueError(f"expected {s} streams")
        n = max((len(f) for f in frames_per_stream), default=0)
        if n == 0 and not self._lockstep_collectives:
            # multi-host engines run an all-invalid step instead: a host
            # whose cameras all stalled this round must still enter the
            # collective or its peers deadlock in the psum
            return (np.zeros((self._stage_rows(), 0, self.height,
                              self.width, self.props.out_channels),
                             np.uint8),
                    np.zeros((self._stage_rows(), 0, NUM_STATS),
                             np.float32), 0.0)
        if n > self.batch:
            raise ValueError(f"{n} frames > batch {self.batch}")
        t, b = self.props.temporal_size, self.batch
        tr = 0 if self.ring_carry else t
        hwc = self.input_layout == "hwc"

        # hwc: raw HWC frames; transpose+pad runs on device (one XLA op).
        # Only the checkpoint tails pay a host planarize (<= t/stream).
        buf, tails_prev, flags, valid, seeds = self._staging(hwc, tr)
        offsets = self._stage_gather(self._ring_offs).astype(np.int32)
        written = set()
        for si, frames in enumerate(frames_per_stream):
            row = self._stage_index(si)
            if row < 0 or si in self.failed:
                continue  # remote or dead stream: nothing to stage
            try:
                if hwc:
                    from .. import native
                    if self.downscale > 1:
                        # checkpoint tails at the analysis geometry (the
                        # bit-identical host twin of the device pool)
                        pl = lambda f: native.planarize(
                            reference.pool_frame_host(f, self.downscale),
                            self.hp, self.wp, swap_rb=self._swap_rb)
                    else:
                        pl = lambda f: native.planarize(
                            f, self.hp, self.wp, swap_rb=self._swap_rb)
                    for f in frames:
                        if f.shape != (self.in_height, self.in_width, 3):
                            raise ValueError(
                                f"frame shape {f.shape} != "
                                f"{(self.in_height, self.in_width, 3)}")
                    # planar tail bookkeeping only (checkpoint format,
                    # always RGB planes)
                    planar = [pl(f) for f in frames[-t:]]
                    if frames and len(frames) > t:
                        first_pl = pl(frames[0])
                    elif planar:
                        first_pl = planar[0]
                else:
                    planar = [self._planarize(f) for f in frames]
                    first_pl = planar[0] if planar else None
            except Exception as e:  # bad frame: isolate the stream
                self.failed[si] = StreamError(si, e)
                continue
            n_si = len(frames)
            if n_si:
                if self._tails[si] is None:
                    self._tails[si] = [first_pl] * t
                    seeds[row] = 1
                if tr:
                    tp = np.stack(self._tails[si])
                    if hwc:
                        tails_prev[row] = tp
                    else:
                        buf[row, :t] = tp
                for i in range(b):
                    if hwc:
                        buf[row, i] = frames[min(i, n_si - 1)]
                    else:
                        buf[row, tr + i] = planar[min(i, n_si - 1)]
                valid[row, :n_si] = True
                # markers fire on each stream's OWN cursor, so staggered
                # starts and stalled streams stay correct
                cursor = self.frame_cursors[si]
                for i in range(n_si):
                    flags[row, i] = (cursor + i == 0 or
                                     (cursor + i) in
                                     self.props.refresh_markers)
                if self._snap_pending[si]:
                    flags[row, 0] = True
                    self._snap_pending[si] = False
                self._tails[si] = (self._tails[si] + planar)[-t:]
                self.frame_cursors[si] = cursor + n_si
                self._ring_offs[si] = (self._ring_offs[si] + n_si) % t
                written.add(row)

        # persistent buffers: rows staged on a PREVIOUS batch but not this
        # one (stream died / went empty) would otherwise leak stale frames
        # into the step — re-zero them so the staged bytes are bitwise
        # identical to freshly-zeroed buffers
        for row in self._stage_written - written:
            buf[row] = 0
            if tails_prev is not None:
                tails_prev[row] = 0
        self._stage_written = written

        if hwc:
            raw_dev = self._hwc_prep(self._to_device(buf))
            if tr:  # tail protocol: prepend the planar tails on device
                raw_dev = jnp.concatenate(
                    [self._to_device(tails_prev), raw_dev], axis=1)
        else:
            raw_dev = self._to_device(buf)
        if self.ring_carry:
            if self._raw_mode:
                (out, stats, self._prev, self._baseline, self._heatmap,
                 gmean) = self._step(
                    raw_dev, self._prev, self._baseline,
                    self._to_device(flags), self._heatmap,
                    self._to_device(valid), self._to_device(seeds))
            else:
                (out, stats, self._ring, self._prev, self._baseline,
                 self._heatmap, gmean) = self._step(
                    raw_dev, self._ring, self._prev,
                    self._baseline, self._to_device(flags), self._heatmap,
                    self._to_device(valid), self._to_device(offsets),
                    self._to_device(seeds))
        else:
            out, stats, self._baseline, self._heatmap, gmean = self._step(
                raw_dev, self._baseline, self._to_device(flags),
                self._heatmap, self._to_device(valid))

        if self.packed_wire:
            # bit-pack masks on device before the download (ops/wire.py:
            # 8 rows -> one byte-plane row, minor dim stays 128-aligned),
            # unpack + crop on the host
            from ..ops import wire
            packed = np.asarray(wire.pack_mask(out[:, :n]))
            out = wire.unpack_mask(packed)[
                :, :, :, :self.height, :self.width]
        elif out.shape[2] == 0:
            # STATS_ONLY: no map bytes on device — skip the zero-size D2H
            # (degenerate transfers can stall for minutes through remote-
            # device relays); only stats/heatmap travel
            out = np.empty((out.shape[0], n, 0, self.height, self.width),
                           np.uint8)
        else:
            # download the PADDED array and crop on the host: slicing the
            # minor dims on device would make the D2H minor dim the true
            # width (rarely 128-aligned), the pathological transfer shape
            # ops/wire.py documents (~2000x slower on the dev tunnel)
            out = self._fetch(out, n)[:, :, :, :self.height, :self.width]
        out = np.moveaxis(out, 2, -1)
        return out, self._fetch_stats(stats, n), float(gmean)

    def _fetch_stats(self, stats, n: int) -> np.ndarray:
        """Lane-aligned stats D2H (see models/pipeline._pad_lanes: an
        unaligned-minor-dim fetch pays a catastrophic per-shape setup
        through remote-device relays)."""
        k = stats.shape[-1]
        if k % 128 == 0 or jax.default_backend() == "cpu":
            return self._fetch(stats, n)
        from ..models.pipeline import _pad_lanes
        return self._fetch(_pad_lanes(stats), n)[..., :k]
