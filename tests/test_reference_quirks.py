"""Documents the reference's WGSL quirks and the rebuild's clean semantics.

SURVEY.md §7 ("Hard parts") chose *intended* math over bug-for-bug
compatibility.  These tests replicate the reference shader behaviour in
numpy to make the divergence explicit and reviewable:

* dips_shader.wgsl:132-133 iterates ``i in [-w/2, w/2)`` — an off-center
  (w-1)x(w-1) window for odd w;
* the unfilled tail of the 9-element ``median_array`` stays zero (WGSL
  ``var`` arrays are zero-initialised), so for w=3 the "median" is taken
  over 4 taps + 5 zeros;
* dips_shader.wgsl:168 picks index ``(n/2)+1``, one past the median.

Net effect: the reference's w=3 "median filter" is strongly dark-biased
(usually the 2nd smallest of a 2x2 neighbourhood), not a median.  The
rebuild implements the true centered odd-window median (ops/oracle.py),
pinned by these tests.
"""

import numpy as np

from dips_tpu.ops import oracle


def wgsl_replica_spatial_filter(plane: np.ndarray, window: int) -> np.ndarray:
    """Bug-for-bug numpy replica of spatial_median_filter
    (dips/src/gpu/shaders/dips_shader.wgsl:122-170), minus the
    out-of-bounds bubble-sort read (undefined even in WGSL)."""
    h, w = plane.shape
    half = window // 2
    n2 = window * window
    out = np.empty_like(plane)
    for y in range(h):
        for x in range(w):
            arr = np.zeros(n2, np.float32)  # WGSL zero-init
            for i in range(-half, half):    # note: excludes +half
                for j in range(-half, half):
                    yy, xx = y + j, x + i
                    v = plane[yy, xx] if (0 <= yy < h and 0 <= xx < w) else 0.0
                    arr[(i + half) + window * (j + half)] = v
            arr.sort()
            idx = min(n2 // 2 + 1, n2 - 1)  # ref picks (n/2)+1
            out[y, x] = arr[idx]
    return out


def test_reference_window_is_offcenter_and_zero_padded():
    """For w=3 the replica uses a 2x2 window + 5 structural zeros, so on a
    bright constant image it returns ~the darkest junk, not the value."""
    plane = np.full((6, 6), 0.8, np.float32)
    ref = wgsl_replica_spatial_filter(plane, 3)
    ours = oracle.spatial_median(plane, 3)
    # clean median of a constant interior is the constant
    assert np.all(ours[1:-1, 1:-1] == np.float32(0.8))
    # the replica's sorted array is [0,0,0,0,0,.8,.8,.8,.8]; index 5 -> 0.8
    # BUT one dark tap poisons it:
    plane[2, 2] = 0.1
    ref2 = wgsl_replica_spatial_filter(plane, 3)
    ours2 = oracle.spatial_median(plane, 3)
    # true median of the 3x3 around (3,3) (8 bright + 1 dark) stays bright
    assert ours2[3, 3] == np.float32(0.8)
    # the replica at (3,3) sees taps {(2,2),(3,2),(2,3),(3,3)} -> one dark
    # value lands at sorted index 5 of [0,0,0,0,0,.1,.8,.8,.8] -> 0.1
    assert ref2[3, 3] == np.float32(0.1)


def test_reference_median_pick_is_biased():
    """The (n/2)+1 pick is one past the true median even on full arrays."""
    vals = np.arange(9, dtype=np.float32)
    true_median = np.sort(vals)[9 // 2]        # 4
    ref_pick = np.sort(vals)[9 // 2 + 1]       # 5
    assert true_median == 4 and ref_pick == 5


def test_clean_median_matches_numpy():
    r = np.random.default_rng(0)
    plane = r.random((12, 15)).astype(np.float32)
    ours = oracle.spatial_median(plane, 3)
    # interior pixels: true median of the 3x3 neighbourhood
    for y in range(1, 11):
        for x in range(1, 14):
            assert ours[y, x] == np.median(plane[y - 1:y + 2, x - 1:x + 2])
