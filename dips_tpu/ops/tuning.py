"""Persisted per-device-kind kernel tuning store.

The Pallas kernels' block geometries are set by measured device behaviour,
not analytic models (BASELINE.md "silicon-pinned block-geometry
methodology"): per-window VMEM product caps for the median ring kernel and
a DMA-sweet-spot input-block size for the raw absdiff kernel.  The baked-in
constants in ``ops/pallas_fused.py`` are the TPU v5e measurements; on a
different TPU generation (other VMEM size / DMA engine behaviour) run

    python -m dips_tpu.autotune

once to measure this device and persist the results here.  The geometry
pickers consult this store first and fall back to the v5e pins, so the
cache file is an override, never a requirement.

Cache location: ``$DIPS_TPU_AUTOTUNE_CACHE`` or
``~/.cache/dips_tpu/autotune.json``.  Schema (one entry per device kind)::

    {"TPU v6 lite": {
        "ring_caps": {"3": 56320, "5": 52000, "7": 39000},
        "raw_target_bytes": 512000,
        "stacked_ring_caps": {"3": 56320},        # --stacked S probes
        "stacked_raw_target_bytes": 512000,       # (coalesced shapes)
        "slab_ring_caps": {"3": {"272": 56320}},  # --mesh SxR probes
        "meta": {...provenance...}}}              # (band-mode owned slabs)

This module is import-cycle free (no jax/pallas imports at module level):
``pallas_fused`` reads through it at trace time.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Optional

log = logging.getLogger("dips_tpu.tuning")

_ENV = "DIPS_TPU_AUTOTUNE_CACHE"
_cache: Optional[dict] = None          # parsed file, loaded once
_cache_path_loaded: Optional[str] = None


def cache_path() -> str:
    return os.environ.get(
        _ENV, os.path.expanduser("~/.cache/dips_tpu/autotune.json"))


def _load() -> dict:
    """Parsed cache file ({} when absent/corrupt), reloaded if the
    configured path changed (tests point the env var at tmp files)."""
    global _cache, _cache_path_loaded
    path = cache_path()
    if _cache is not None and path == _cache_path_loaded:
        return _cache
    data: dict = {}
    try:
        with open(path) as f:
            data = json.load(f)
        if not isinstance(data, dict):
            raise ValueError("autotune cache root must be an object")
    except FileNotFoundError:
        pass
    except Exception as e:  # corrupt cache must never break the pipeline
        log.warning("ignoring unreadable autotune cache %s: %s", path, e)
        data = {}
    _cache = data
    _cache_path_loaded = path
    return data


def invalidate() -> None:
    """Drop the in-memory copy (after a save, or in tests)."""
    global _cache, _cache_path_loaded
    _cache = None
    _cache_path_loaded = None


def _device_kind() -> Optional[str]:
    """Current accelerator kind, or None off-TPU / before backend init.

    Only consulted on the pallas path, so jax is already imported; still,
    any backend error degrades to 'no override' rather than failing."""
    try:
        import jax
        if jax.default_backend() != "tpu":
            return None
        return jax.devices()[0].device_kind
    except Exception:
        return None


def device_entry(kind: Optional[str] = None) -> dict:
    kind = kind if kind is not None else _device_kind()
    if kind is None:
        return {}
    entry = _load().get(kind, {})
    if not isinstance(entry, dict):
        # wrong-typed (hand-edited) entries must degrade to "no override"
        # like every other cache defect — these are read at TRACE time
        log.warning("ignoring malformed autotune entry for %r", kind)
        return {}
    return entry


def ring_product_cap(window: int,
                     kind: Optional[str] = None) -> Optional[int]:
    """Measured wp*bh product cap for the median ring kernel at this
    window on this device kind, or None (use the baked-in pin)."""
    caps = device_entry(kind).get("ring_caps", {})
    if not isinstance(caps, dict):
        return None
    v = caps.get(str(window))
    try:
        return int(v) if v else None
    except (TypeError, ValueError):
        log.warning("ignoring malformed ring cap %r for window %d", v,
                    window)
        return None


def raw_target_bytes(kind: Optional[str] = None) -> Optional[int]:
    """Measured DMA-sweet-spot input-block size for the raw absdiff
    kernel on this device kind, or None (use the baked-in pin)."""
    v = device_entry(kind).get("raw_target_bytes")
    try:
        return int(v) if v else None
    except (TypeError, ValueError):
        log.warning("ignoring malformed raw_target_bytes %r", v)
        return None


def stacked_ring_cap(window: int,
                     kind: Optional[str] = None) -> Optional[int]:
    """Measured wp*bh product cap for the STACKED median ring kernel
    (s streams folded along the row axis — the coalesced-serving
    production shape, ``python -m dips_tpu.autotune --stacked S``), or
    None (fall back to the single-stream cap/pins).  Per-block VMEM is
    stream-count-independent, but Mosaic's scheduling across s x n_hb
    row blocks can move the real edge — hence a separate measured key."""
    caps = device_entry(kind).get("stacked_ring_caps", {})
    if not isinstance(caps, dict):
        return None
    v = caps.get(str(window))
    try:
        return int(v) if v else None
    except (TypeError, ValueError):
        log.warning("ignoring malformed stacked ring cap %r for window %d",
                    v, window)
        return None


def slab_ring_cap(window: int, owned_hp: int,
                  kind: Optional[str] = None) -> Optional[int]:
    """Measured wp*bh product cap for the BAND-MODE slab ring kernel at
    this window and this owned (padded-height / row-shards) slab height —
    ``python -m dips_tpu.autotune --mesh SxR`` probes it with the two
    neighbour-band input blocks resident, so the band VMEM debit is
    inside the measurement.  None = fall back to the single-stream cap
    with the analytic band debit (``pallas_fused._ring_geometry``)."""
    caps = device_entry(kind).get("slab_ring_caps", {})
    if not isinstance(caps, dict):
        return None
    per_h = caps.get(str(window))
    if not isinstance(per_h, dict):
        return None
    v = per_h.get(str(owned_hp))
    try:
        return int(v) if v else None
    except (TypeError, ValueError):
        log.warning("ignoring malformed slab ring cap %r for window %d "
                    "owned_hp %d", v, window, owned_hp)
        return None


def stacked_slab_ring_cap(window: int, owned_hp: int,
                          kind: Optional[str] = None) -> Optional[int]:
    """Measured cap for the STACKED band-mode slab ring kernel (several
    streams' owned slabs folded along one kernel's row axis — the
    multi-stream-per-shard grid shape, ``dips-autotune --mesh SxR
    --stacked S_l``).  None = fall back to the analytic band debit;
    separate from :func:`slab_ring_cap` because Mosaic scheduling across
    s x n_hb row blocks can move the VMEM edge."""
    caps = device_entry(kind).get("stacked_slab_ring_caps", {})
    if not isinstance(caps, dict):
        return None
    per_h = caps.get(str(window))
    if not isinstance(per_h, dict):
        return None
    v = per_h.get(str(owned_hp))
    try:
        return int(v) if v else None
    except (TypeError, ValueError):
        log.warning("ignoring malformed stacked slab ring cap %r for "
                    "window %d owned_hp %d", v, window, owned_hp)
        return None


def stacked_raw_target_bytes(kind: Optional[str] = None) -> Optional[int]:
    """Measured input-block sweet spot for the STACKED raw kernel, or
    None (fall back to the single-stream target/pin)."""
    v = device_entry(kind).get("stacked_raw_target_bytes")
    try:
        return int(v) if v else None
    except (TypeError, ValueError):
        log.warning("ignoring malformed stacked_raw_target_bytes %r", v)
        return None


def save(kind: str, ring_caps: Optional[dict] = None,
         raw_target: Optional[int] = None,
         stacked_ring_caps: Optional[dict] = None,
         stacked_raw_target: Optional[int] = None,
         slab_ring_caps: Optional[dict] = None,
         stacked_slab_ring_caps: Optional[dict] = None,
         meta: Optional[dict] = None) -> str:
    """Merge measurements for ``kind`` into the cache file; returns the
    path written.  Partial updates keep the other family's entries.

    Ring caps (plain, stacked and slab) merge by MAX: a cap is "largest
    wp*bh plane observed to compile", and any passing compile is a valid
    lower bound of the true VMEM edge — so probing several geometries
    (whose divisor ladders are coarse in different places) accumulates
    the least-conservative safe cap.  ``slab_ring_caps`` is nested
    {window: {owned_hp: cap}} (the --mesh probes).  The raw targets are
    timed optima (not monotone-safe): the last run wins, so run autotune
    at the geometry you deploy."""
    path = cache_path()
    invalidate()        # re-read the FILE: another process (a concurrent
    data = _load().copy()  # autotune run) may have written since we loaded
    raw_entry = data.get(kind, {})
    entry = dict(raw_entry) if isinstance(raw_entry, dict) else {}
    for key, caps in (("ring_caps", ring_caps),
                      ("stacked_ring_caps", stacked_ring_caps)):
        if not caps:
            continue
        prior = entry.get(key, {})
        merged = dict(prior) if isinstance(prior, dict) else {}
        for k, v in caps.items():
            try:
                prev = int(merged.get(str(k), 0))
            except (TypeError, ValueError):
                prev = 0
            merged[str(k)] = max(int(v), prev)
        entry[key] = merged
    for key, caps2 in (("slab_ring_caps", slab_ring_caps),
                       ("stacked_slab_ring_caps", stacked_slab_ring_caps)):
        if not caps2:
            continue
        prior = entry.get(key, {})
        merged = dict(prior) if isinstance(prior, dict) else {}
        for win, per_h in caps2.items():
            pw = merged.get(str(win), {})
            pw = dict(pw) if isinstance(pw, dict) else {}
            for hp_k, v in per_h.items():
                try:
                    prev = int(pw.get(str(hp_k), 0))
                except (TypeError, ValueError):
                    prev = 0
                pw[str(hp_k)] = max(int(v), prev)
            merged[str(win)] = pw
        entry[key] = merged
    if raw_target:
        entry["raw_target_bytes"] = int(raw_target)
    if stacked_raw_target:
        entry["stacked_raw_target_bytes"] = int(stacked_raw_target)
    if meta:
        entry["meta"] = meta
    data[kind] = entry
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
    os.replace(tmp, path)
    invalidate()
    return path
