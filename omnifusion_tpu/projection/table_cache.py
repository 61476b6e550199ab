"""On-disk cache for the precomputed projection tables.

The static sparse tables (spec.py) are pure functions of the
ProjectionSpec, built host-side in float64 — minutes of single-core work
at the flagship config and ~4x that at 1024x2048/nrows 6.  The reference
re-derives its grids on CPU inside EVERY forward call
(equi_pers/equi2pers_v3.py:29-111); we build once per process via
lru_cache, and this module extends that to once per MACHINE: a versioned
``.npz`` per (builder, spec) under ``.table_cache/``.

Safety rules:

- the key is ``sha256(repr((VERSION, builder, spec)))`` — ProjectionSpec
  is a frozen dataclass of scalars, so its repr is deterministic and
  total.  **Bump VERSION whenever any builder's output changes** (weights
  layout, capping policy, vjp packing, ...); stale entries from older
  code versions then miss by construction.
- writes are atomic (tempfile + os.replace), so concurrent builders
  (e.g. the measurement queue and the test suite) can never observe a
  torn file; loads validate the spec echo stored in the file and fall
  back to a rebuild on ANY error.
- numeric parity is exact: arrays are stored bit-for-bit
  (uncompressed savez) and materialized on load, so the cached path is
  indistinguishable from a fresh build (tests/test_table_cache.py).

Env:
  OMNIFUSION_TABLE_CACHE=<dir>  cache directory (default <repo>/.table_cache)
  OMNIFUSION_TABLE_CACHE=0      disable (every process rebuilds)
"""

from __future__ import annotations

import hashlib
import os
import tempfile

import numpy as np

# Bump when any table builder's OUTPUT changes (spec.py builders or their
# helpers).  The key covers inputs only; this covers the code.
VERSION = 1

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cache_dir() -> str | None:
    d = os.environ.get("OMNIFUSION_TABLE_CACHE")
    if d is not None:
        return None if d in ("", "0") else d
    return os.path.join(_REPO, ".table_cache")


def _path(builder: str, spec) -> str | None:
    d = cache_dir()
    if d is None:
        return None
    key = hashlib.sha256(repr((VERSION, builder, spec)).encode()).hexdigest()[:24]
    return os.path.join(d, f"{builder}-{key}.npz")


def load(builder: str, spec) -> dict[str, np.ndarray] | None:
    """Arrays for (builder, spec), or None on miss/disable/any error."""
    path = _path(builder, spec)
    if path is None or not os.path.exists(path):
        return None
    try:
        with np.load(path, allow_pickle=False) as z:
            if str(z["__spec__"]) != repr(spec):  # hash collision / stale key
                return None
            return {k: np.array(z[k]) for k in z.files if k != "__spec__"}
    except Exception:
        return None  # torn/corrupt file: rebuild (and overwrite) below


def save(builder: str, spec, arrays: dict[str, np.ndarray]) -> None:
    """Atomically persist arrays for (builder, spec); best-effort."""
    path = _path(builder, spec)
    if path is None:
        return
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
        try:
            with os.fdopen(fd, "wb") as f:
                np.savez(f, __spec__=repr(spec), **arrays)
            os.replace(tmp, path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
    except OSError:
        pass  # read-only/full disk: the lru_cache still covers this process
