"""The on-disk projection-table cache must be bit-exact and fail-safe.

The cached path replaces minutes of host-side f64 table building per
process (the reference re-derives grids inside every forward call,
equi_pers/equi2pers_v3.py:29-111); anything short of bit-identical arrays
would silently skew every projection, so the roundtrip is checked with
array_equal on every table including the vjp/capped tuples.
"""

import numpy as np
import pytest

from omnifusion_tpu.projection import ProjectionSpec, table_cache
from omnifusion_tpu.projection.spec import (
    build_equi2pers_grids,
    build_pers2equi_grids,
)

SPEC = ProjectionSpec.create((32, 64), (16, 16), (80, 80), nrows=4)


def _fresh(monkeypatch, tmp_path):
    monkeypatch.setenv("OMNIFUSION_TABLE_CACHE", str(tmp_path / "tables"))
    build_equi2pers_grids.cache_clear()
    build_pers2equi_grids.cache_clear()


def _assert_grids_equal(a, b):
    la, lb = list(vars(a).items()), list(vars(b).items())
    assert [k for k, _ in la] == [k for k, _ in lb]
    for (k, va), (_, vb) in zip(la, lb):
        if k == "spec":
            assert va == vb
        elif k in ("vjp", "capped"):
            if va is None or vb is None:
                assert va is None and vb is None
                continue
            for xa, xb in zip(va, vb):
                np.testing.assert_array_equal(xa, xb)
                assert xa.dtype == xb.dtype
        else:
            np.testing.assert_array_equal(va, vb)
            assert va.dtype == vb.dtype


@pytest.mark.parametrize("builder", [build_equi2pers_grids, build_pers2equi_grids])
def test_roundtrip_bit_exact(builder, monkeypatch, tmp_path):
    _fresh(monkeypatch, tmp_path)
    fresh = builder(SPEC)  # builds + writes
    builder.cache_clear()  # simulate a new process
    cached = builder(SPEC)  # loads from disk
    assert (tmp_path / "tables").exists()
    _assert_grids_equal(fresh, cached)


def test_disabled_never_touches_disk(monkeypatch, tmp_path):
    monkeypatch.setenv("OMNIFUSION_TABLE_CACHE", "0")
    build_equi2pers_grids.cache_clear()
    build_equi2pers_grids(SPEC)
    assert table_cache.cache_dir() is None
    assert not (tmp_path / "tables").exists()


def test_corrupt_file_falls_back_to_rebuild(monkeypatch, tmp_path):
    _fresh(monkeypatch, tmp_path)
    fresh = build_equi2pers_grids(SPEC)
    # truncate every cache file in place
    paths = list((tmp_path / "tables").iterdir())
    assert paths
    for p in paths:
        p.write_bytes(p.read_bytes()[:100])
    build_equi2pers_grids.cache_clear()
    rebuilt = build_equi2pers_grids(SPEC)  # must not raise
    _assert_grids_equal(fresh, rebuilt)


def test_key_covers_spec_and_version(monkeypatch, tmp_path):
    _fresh(monkeypatch, tmp_path)
    p1 = table_cache._path("e2p", SPEC)
    p2 = table_cache._path("e2p", ProjectionSpec.create((32, 64), (16, 16), (80, 80), nrows=3))
    assert p1 != p2
    monkeypatch.setattr(table_cache, "VERSION", table_cache.VERSION + 1)
    assert table_cache._path("e2p", SPEC) != p1
