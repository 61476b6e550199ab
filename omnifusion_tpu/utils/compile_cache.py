"""Host-keyed persistent-compile-cache directory.

The working tree (and its cache dirs) survives across sessions that may run
on DIFFERENT host machines.  XLA:CPU caches AOT-compiled machine code whose
cache key does NOT include the host CPU features, so an entry compiled on
another machine loads here with ``cpu_aot_loader`` feature-mismatch errors
and can SIGILL mid-run (observed round 2: the committed dryrun cache killed
bench attempts).  Keying the cache directory by a fingerprint of the host
CPU makes foreign entries unreachable: a new host simply starts cold.

Deliberately jax-free so it can be imported before jax initializes.

Known benign noise: reloading any XLA:CPU AOT entry — including one this
same host wrote seconds earlier — prints two ``cpu_aot_loader`` errors
("Target machine feature +prefer-no-scatter/+prefer-no-gather is not
supported on the host machine").  Those are compile-time tuning
pseudo-features the runtime host-feature probe never reports, so the
loader's feature-set comparison can never match on them (verified
empirically: fresh cache dir, compile, reload in a new process on the
same machine → same two lines, correct results).  Real poisoning shows as
mismatches in actual ISA features (avx512*, amx-*) and SIGILL; the
host-keyed directory prevents that case.
"""

from __future__ import annotations

import hashlib
import os


def _host_fingerprint() -> str:
    # round-3 hardening: the flags line alone collided across this fleet's
    # hosts (identical ISA lists, different XLA-detected feature sets ->
    # cpu_aot_loader feature-mismatch warnings on load), so fold in the CPU
    # identity lines and the jaxlib version (XLA:CPU's AOT format tracks it)
    try:
        with open("/proc/cpuinfo") as f:
            text = f.read()
        keys = ("flags", "Features", "model name", "cpu family", "model\t", "stepping", "microcode")
        # whole file, key lines only, deduped: raw bytes would fold in
        # run-volatile lines ("cpu MHz", "bogomips") and make the key — and
        # therefore the cache dir — unstable across runs on the same host
        lines = sorted({l for l in text.splitlines() if l.startswith(keys)})
        ident = "\n".join(lines)
    except OSError:
        ident = ""
    if not ident:
        import platform

        ident = f"{platform.machine()} {platform.processor()}"
    try:
        from importlib.metadata import version  # no jax import

        ident += "\njaxlib=" + version("jaxlib")
    except Exception:
        pass
    return hashlib.sha256(ident.encode()).hexdigest()[:12]


def host_cache_dir(base: str) -> str:
    """``base/host-<cpu-fingerprint>``, created if missing."""
    path = os.path.join(base, f"host-{_host_fingerprint()}")
    os.makedirs(path, exist_ok=True)
    return path


def enable_persistent_cache(base: str) -> str:
    """Point jax's persistent compilation cache at the host-keyed dir."""
    import jax

    path = host_cache_dir(base)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    return path
