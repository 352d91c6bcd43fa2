"""Composite 2-D mesh sharding: streams x rows.

Combines the two parallel axes on one ``Mesh((S, R), ("stream", "rows"))``:
each device owns a horizontal slab of one subset of streams.  Stencil halos
travel between row-neighbours via ppermute (as in rowsharded.py), per-frame
statistics reduce over the row axis, and the optional global scalar reduces
over both axes — all collectives ride ICI.

This is the deployment shape for "many huge streams": e.g. 16 chips as a
(4 streams x 4 slabs) grid.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..properties import DiPsProperties, OutputMode
from .rowsharded import _row_body


def grid_mesh(n_streams_axis: int, n_rows_axis: int,
              devices=None) -> Mesh:
    """A (stream, rows) 2-D mesh over the first S*R devices."""
    if devices is None:
        devices = jax.devices()
    need = n_streams_axis * n_rows_axis
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(n_streams_axis, n_rows_axis)
    return Mesh(arr, ("stream", "rows"))


def make_grid_step(props: DiPsProperties, h: int, w: int, mesh: Mesh):
    """Jitted step over a ("stream", "rows") mesh.

    Maps raw u8 (S, T+B, 3, Hp, Wp), baseline (S, Hp, Wp), flags (S, B),
    heatmap (S, Hp, Wp), valid (S, B) -> (out (S, B, C, Hp, Wp),
    stats (S, B, NUM_STATS), new baseline, new heatmap, global scalar).
    S must divide by the stream axis, Hp by the rows axis.
    """
    if props.output in (OutputMode.ABSDIFF, OutputMode.THRESHOLD):
        raise ValueError("2-D grid applies to the median pipeline modes")

    def per_shard(raw, baseline, flags, heatmap, valid):
        # raw: (S_local, T+B, 3, Hs, Wp) — vmap the row-slab body over the
        # local stream axis; collectives inside reference the "rows" axis
        # name, which vmap passes through untouched.
        def one_stream(r, bl, fl, hm, vd):
            return _row_body(props, h, w, r, bl, fl, hm, vd, "rows")
        out, stats, new_b, new_h = jax.vmap(one_stream)(
            raw, baseline, flags, heatmap, valid)
        # valid-slot-masked global mean (stats are already row-reduced inside
        # _row_body, so the extra "rows" psum cancels between total and count)
        vw = valid.astype(jnp.float32)
        total = lax.psum(lax.psum(jnp.sum(stats[..., 1] * vw), "rows"),
                         "stream")
        count = lax.psum(lax.psum(jnp.sum(vw), "rows"), "stream")
        return out, stats, new_b, new_h, total / jnp.maximum(count, 1.0)

    sharded = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P("stream", None, None, "rows", None),
                  P("stream", "rows", None), P("stream"),
                  P("stream", "rows", None), P("stream")),
        out_specs=(P("stream", None, None, "rows", None),
                   P("stream", None, None), P("stream", "rows", None),
                   P("stream", "rows", None), P()),
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(1, 3))
