"""Environment diagnosis: one command that answers "why is this host
slow / failing?" before reading any logs.

    python -m dips_tpu.doctor [--json]

Reports the accelerator (backend, device kind, chip count), the native
host module (SSSE3 layout kernels vs numpy fallback), the media stack
(OpenCV build, GStreamer availability), and the persisted tuning /
compilation caches.  Read it top to bottom: each line names the knob to
fix it (see docs/OPERATIONS.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def collect() -> dict:
    """Gather the report as a dict (importable for tests/tools)."""
    info: dict = {}

    import jax
    backend = jax.default_backend()
    devs = jax.devices()
    info["jax"] = {
        "version": jax.__version__,
        "backend": backend,
        "devices": len(devs),
        "device_kind": devs[0].device_kind if devs else None,
        "ok": backend == "tpu",
        "hint": None if backend == "tpu" else
            "not a TPU backend: kernels run the portable XLA path "
            "(correct but far slower)",
    }

    from . import native
    info["native"] = {
        "available": native.NATIVE_AVAILABLE,
        "ok": native.NATIVE_AVAILABLE,
        "hint": None if native.NATIVE_AVAILABLE else
            "native module not built (no toolchain?): host layout "
            "transforms fall back to numpy (~3x slower at 1080p)",
    }

    import cv2
    info["opencv"] = {"version": cv2.__version__, "ok": True,
                      "hint": None}

    from .io import gstreamer
    info["gstreamer"] = {
        "available": gstreamer.available(),
        "ok": True,  # optional either way
        "hint": None if gstreamer.available() else
            "GStreamer absent: OpenCV/FFmpeg handles files and URIs; "
            "PTS-preserving avimux egress unavailable",
    }

    from .ops import tuning
    kind = info["jax"]["device_kind"]
    entry = tuning.device_entry(kind) if info["jax"]["ok"] else {}
    info["autotune"] = {
        "cache_path": tuning.cache_path(),
        "entry_present": bool(entry),
        "ok": True,
        "hint": None if (entry or not info["jax"]["ok"]) else
            f"no autotune entry for {kind!r}: baked-in v5e pins in use "
            f"(run python -m dips_tpu.autotune once on non-v5e)",
    }

    from .utils import compilecache
    cc_dir = os.path.expanduser(compilecache.default_cache_dir())
    enabled = bool(os.environ.get("DIPS_COMPILE_CACHE"))
    try:
        entries = len(os.listdir(cc_dir))
    except OSError:
        entries = 0
    info["compile_cache"] = {
        "dir": cc_dir, "env_enabled": enabled, "entries": entries,
        "ok": True,
        "hint": None if enabled else
            "persistent compile cache off by default: set "
            "DIPS_COMPILE_CACHE or pass --compile-cache to skip jit "
            "compiles across restarts",
    }
    return info


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="dips-doctor", description="environment diagnosis")
    ap.add_argument("--json", action="store_true",
                    help="machine-readable report")
    args = ap.parse_args(argv)
    info = collect()
    if args.json:
        print(json.dumps(info))
    else:
        for section, d in info.items():
            mark = "ok" if d.get("ok") else "!!"
            detail = ", ".join(f"{k}={v}" for k, v in d.items()
                               if k not in ("ok", "hint") and v is not None)
            print(f"[{mark}] {section}: {detail}")
            if d.get("hint"):
                print(f"     -> {d['hint']}")
    bad = [s for s, d in info.items() if not d.get("ok")]
    if bad:
        print(f"attention: {', '.join(bad)}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
