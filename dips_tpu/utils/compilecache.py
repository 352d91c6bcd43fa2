"""Persistent XLA compilation cache.

The reference specializes its WGSL pipelines at startup every run
(``dips/src/gpu/mod.rs:101-109`` — shader compilation is paid on every
process launch).  On TPU the analogous cost is far larger: the first jit
compile of the fused kernel takes tens of seconds (minutes on congested
pods), and a restarted serving daemon pays it again for every geometry
it warms.  JAX ships a persistent compilation cache keyed on the HLO +
compile options + platform; pointing it at a directory makes every
restart after the first a cache hit.

``enable_compile_cache`` is idempotent and safe to call before or after
backend initialization (the cache is consulted at compile time, not at
backend init).  Frontends expose it as ``--compile-cache [DIR]``; the
``DIPS_COMPILE_CACHE`` environment variable provides a default so fleet
deployments can turn it on without touching unit files.
"""

from __future__ import annotations

import os
from typing import Optional

_DEFAULT_DIR = os.path.join("~", ".cache", "dips_tpu", "xla")


def _host_fingerprint() -> str:
    """A short digest of the host CPU (machine arch + feature flags).

    XLA:CPU persists AOT-compiled x86 executables whose cache key does
    not cover the full host feature set: an entry written on one machine
    can be loaded on another with fewer features, where it aborts with
    SIGILL instead of recompiling (the AOT loader only warns).  Cache
    directories that may hold CPU executables are therefore partitioned
    per host fingerprint; TPU executables are device code and survive
    host swaps, so they stay shared.
    """
    import hashlib
    import platform as _plat

    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.lower().startswith(("flags", "features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    raw = f"{_plat.machine()}|{feats}".encode()
    return hashlib.sha256(raw).hexdigest()[:12]


def _platform_selection() -> str:
    """The explicitly selected jax platform ('' when auto-detected)."""
    sel = ""
    try:
        import jax
        sel = getattr(jax.config, "jax_platforms", None) or ""
    except Exception:
        pass
    sel = sel or os.environ.get("JAX_PLATFORMS", "")
    return sel.split(",")[0].strip().lower()


def default_cache_dir() -> str:
    """The cache directory used when none is given: the
    ``DIPS_COMPILE_CACHE`` environment variable, else
    ``~/.cache/dips_tpu/xla``."""
    return os.environ.get("DIPS_COMPILE_CACHE") or _DEFAULT_DIR


def enable_compile_cache(path: Optional[str] = None) -> str:
    """Enable JAX's persistent compilation cache rooted at ``path``.

    Returns the absolute EFFECTIVE cache directory: the root itself, or
    a per-host subdirectory when the process is pinned to the CPU
    backend (see :func:`_host_fingerprint` for why CPU executables must
    not cross hosts).  Every compile (including the
    sub-second CPU ones exercised by tests) is cached: the cache lives in
    a dedicated directory, so the usual "don't cache trivial compiles"
    heuristics only cost restart latency here.
    """
    import jax

    resolved = os.path.abspath(os.path.expanduser(path or default_cache_dir()))
    if _platform_selection() == "cpu":
        # Processes pinned to the CPU backend (tests, the hermetic
        # multichip dryrun) compile x86 AOT executables that must not
        # cross hosts — see _host_fingerprint.  Auto/TPU processes share
        # the root so device executables stay warm across host swaps.
        resolved = os.path.join(resolved, "host-" + _host_fingerprint())
    os.makedirs(resolved, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", resolved)
    # jax initializes its persistent cache AT MOST ONCE, on the first
    # compile: if any compile already happened in this process with no
    # cache dir configured, the init latched "disabled" and the config
    # update above would be silently ignored.  reset_cache() drops the
    # latch so the next compile re-initializes against the new dir.
    try:
        from jax._src import compilation_cache as _cc
        active = getattr(_cc, "_cache", None)
        if getattr(_cc, "_cache_initialized", False) and (
                active is None
                or str(getattr(active, "_path", "")) != resolved):
            _cc.reset_cache()
    except Exception:
        pass  # internal API drift: worst case is the pre-existing behavior
    # Cache everything: a daemon restart should hit for every kernel it
    # compiled before, not only the slow ones.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return resolved


def add_compile_cache_flag(parser) -> None:
    """Install ``--compile-cache [DIR]`` on an argparse parser."""
    parser.add_argument(
        "--compile-cache", nargs="?", const="", default=None, metavar="DIR",
        help="persist compiled XLA executables under DIR (default "
             "$DIPS_COMPILE_CACHE or ~/.cache/dips_tpu/xla) so restarts "
             "skip jit compilation")


def apply_compile_cache_flag(args) -> Optional[str]:
    """Honor the flag installed by :func:`add_compile_cache_flag`.

    Returns the cache dir when enabled, else None.  ``--compile-cache``
    with no value uses the default directory; the flag absent but
    ``DIPS_COMPILE_CACHE`` set in the environment also enables it (fleet
    opt-in without CLI changes).
    """
    val = getattr(args, "compile_cache", None)
    if val is None and not os.environ.get("DIPS_COMPILE_CACHE"):
        return None
    return enable_compile_cache(val or None)
