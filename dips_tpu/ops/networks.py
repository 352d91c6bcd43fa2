"""Compare-exchange selection networks for exact medians on the VPU.

The reference computes medians with data-dependent bubble sorts inside each
GPU thread (dips/src/gpu/shaders/dips_shader.wgsl:151-166).  Data-dependent
control flow is hostile to the TPU vector unit, so the rebuild replaces each
per-pixel sort with a *fixed* compare-exchange network applied elementwise to
whole tap planes: every comparator is one ``minimum`` + one ``maximum`` over
(H, W) arrays — pure VPU work with no branches.  The network is generated at
trace time and specialised per (window², temporal) size, the TPU-idiomatic
analogue of the reference's WGSL codegen/override specialisation
(dips_alt/src/dips_compute/dynamic_texture_array.rs:10-128).

Construction: Batcher odd-even mergesort for the next power of two, restricted
to the first ``n`` wires (valid because virtual +inf values on wires >= n can
never move down: every comparator sends the max to the higher wire), then
pruned backwards to the comparators that can influence the requested output
positions.  Medians via min/max networks are exact — no floating-point
reassociation is involved.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

# A comparator (i, j): position i receives min, position j receives max.
Comparator = Tuple[int, int]
# A pruned op: (i, j, need_min, need_max).
PrunedOp = Tuple[int, int, bool, bool]


def _batcher_pow2(n: int) -> List[Comparator]:
    """Batcher odd-even mergesort comparators for n a power of two."""
    net: List[Comparator] = []

    def merge(lo: int, cnt: int, r: int) -> None:
        step = r * 2
        if step < cnt:
            merge(lo, cnt, step)
            merge(lo + r, cnt, step)
            for i in range(lo + r, lo + cnt - r, step):
                net.append((i, i + r))
        else:
            net.append((lo, lo + r))

    def sort(lo: int, cnt: int) -> None:
        if cnt > 1:
            m = cnt // 2
            sort(lo, m)
            sort(lo + m, m)
            merge(lo, cnt, 1)

    sort(0, n)
    return net


@functools.lru_cache(maxsize=None)
def sorting_network(n: int) -> Tuple[Comparator, ...]:
    """A sorting network for ``n`` wires (ascending: wire 0 gets the min)."""
    if n <= 1:
        return ()
    p2 = 1
    while p2 < n:
        p2 *= 2
    return tuple((i, j) for (i, j) in _batcher_pow2(p2) if i < n and j < n)


@functools.lru_cache(maxsize=None)
def selection_network(n: int, outputs: Tuple[int, ...]) -> Tuple[PrunedOp, ...]:
    """Prune :func:`sorting_network` to comparators feeding ``outputs``.

    Walks the network backwards keeping a live-set of wire positions; a
    comparator is kept iff it writes a live wire, and we record whether its
    min and/or max result is actually consumed so the applier can emit a
    single ``minimum``/``maximum`` when only one side is needed.
    """
    net = sorting_network(n)
    live = set(outputs)
    kept: List[PrunedOp] = []
    for (i, j) in reversed(net):
        need_min = i in live
        need_max = j in live
        if not (need_min or need_max):
            continue
        kept.append((i, j, need_min, need_max))
        live.add(i)
        live.add(j)
    kept.reverse()
    return tuple(kept)


@functools.lru_cache(maxsize=None)
def median_network(n: int) -> Tuple[PrunedOp, ...]:
    """Selection network for the pipeline's median convention: index n // 2
    of the ascending order (exact median for odd n, upper median for even n —
    matching ops/oracle.py)."""
    return selection_network(n, (n // 2,))


def apply_network(values: Sequence, ops: Sequence[PrunedOp], minimum, maximum):
    """Apply a pruned network to a list of array-likes; returns a new list.

    ``minimum``/``maximum`` are the binary ops (np.minimum/np.maximum,
    jnp.minimum/jnp.maximum — usable identically under jit, in Pallas kernel
    bodies, and in plain numpy).
    """
    vals = list(values)
    for (i, j, need_min, need_max) in ops:
        a, b = vals[i], vals[j]
        if need_min:
            vals[i] = minimum(a, b)
        if need_max:
            vals[j] = maximum(a, b)
    return vals


def median_of(values: Sequence, minimum, maximum):
    """Exact elementwise median (index n//2 convention) of ``values``."""
    n = len(values)
    if n == 1:
        return values[0]
    out = apply_network(values, median_network(n), minimum, maximum)
    return out[n // 2]
