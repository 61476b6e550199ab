"""Tests for the native C++ EXR reader.

A small pure-python EXR *writer* (implementing the OpenEXR scanline spec:
chlist/box2i attributes, offset table, NONE/ZIP/ZIPS chunks with the
delta+interleave predictor) generates ground-truth files; the C++ reader
must decode them exactly.
"""

import struct
import zlib

import numpy as np
import pytest

native = pytest.importorskip("omnifusion_tpu.native")


def _attr(name: str, type_: str, data: bytes) -> bytes:
    return name.encode() + b"\0" + type_.encode() + b"\0" + struct.pack("<i", len(data)) + data


def _chlist(channels, pixel_type: int) -> bytes:
    out = b""
    for name in channels:
        out += name.encode() + b"\0"
        out += struct.pack("<i", pixel_type)  # 1=HALF, 2=FLOAT
        out += struct.pack("<BBBB", 0, 0, 0, 0)  # pLinear + reserved
        out += struct.pack("<ii", 1, 1)  # x/y sampling
    return out + b"\0"


def _zip_encode(raw: bytes) -> bytes:
    # inverse of OpenEXR's zip postprocess: interleave-split then predictor
    arr = np.frombuffer(raw, np.uint8)
    half = (len(arr) + 1) // 2
    split = np.empty_like(arr)
    split[:half] = arr[0::2]
    split[half:] = arr[1::2]
    enc = split.astype(np.int32)
    enc[1:] = (enc[1:] - split[:-1].astype(np.int32) + 128) % 256
    return zlib.compress(enc.astype(np.uint8).tobytes())


def write_exr(path, channel_data: dict, pixel_type: int, compression: int):
    """channel_data: {name: (H, W) float array}; channels stored sorted."""
    names = sorted(channel_data)
    h, w = channel_data[names[0]].shape
    lines_per_block = 16 if compression == 3 else 1

    header = struct.pack("<I", 20000630) + struct.pack("<I", 2)
    header += _attr("channels", "chlist", _chlist(names, pixel_type))
    header += _attr("compression", "compression", struct.pack("<B", compression))
    box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    header += _attr("dataWindow", "box2i", box)
    header += _attr("displayWindow", "box2i", box)
    header += _attr("lineOrder", "lineOrder", b"\0")
    header += _attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    header += _attr("screenWindowCenter", "v2f", struct.pack("<ff", 0, 0))
    header += _attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    header += b"\0"  # end of header

    np_type = np.float16 if pixel_type == 1 else np.float32
    blocks = []
    for y0 in range(0, h, lines_per_block):
        nlines = min(lines_per_block, h - y0)
        raw = b""
        for line in range(y0, y0 + nlines):
            for name in names:
                raw += channel_data[name][line].astype(np_type).tobytes()
        payload = raw if compression == 0 else _zip_encode(raw)
        if compression != 0 and len(payload) >= len(raw):
            payload = raw  # EXR stores uncompressed if zip doesn't shrink
        blocks.append(struct.pack("<ii", y0, len(payload)) + payload)

    n_blocks = len(blocks)
    table_off = len(header) + 8 * n_blocks
    offsets = []
    pos = table_off
    for b in blocks:
        offsets.append(pos)
        pos += len(b)
    with open(path, "wb") as f:
        f.write(header)
        for o in offsets:
            f.write(struct.pack("<Q", o))
        for b in blocks:
            f.write(b)


@pytest.mark.parametrize("compression", [0, 2, 3], ids=["none", "zips", "zip"])
@pytest.mark.parametrize("pixel_type", [1, 2], ids=["half", "float"])
def test_exr_roundtrip(tmp_path, compression, pixel_type):
    rng = np.random.default_rng(compression * 10 + pixel_type)
    h, w = 37, 53  # odd sizes exercise partial last block
    data = {
        "R": (rng.random((h, w)) * 8).astype(np.float32),
        "G": rng.random((h, w)).astype(np.float32),
        "B": rng.random((h, w)).astype(np.float32),
    }
    path = str(tmp_path / "test.exr")
    write_exr(path, data, pixel_type, compression)

    got = native.read_exr_channel(path, "R")
    assert got.shape == (h, w)
    expected = data["R"].astype(np.float16).astype(np.float32) if pixel_type == 1 else data["R"]
    np.testing.assert_allclose(got, expected, atol=0)

    g = native.read_exr_channel(path, "G")
    exp_g = data["G"].astype(np.float16).astype(np.float32) if pixel_type == 1 else data["G"]
    np.testing.assert_allclose(g, exp_g, atol=0)


def test_exr_missing_channel(tmp_path):
    data = {"R": np.zeros((4, 4), np.float32)}
    path = str(tmp_path / "t.exr")
    write_exr(path, data, 2, 0)
    with pytest.raises(RuntimeError, match="channel not found"):
        native.read_exr_channel(path, "Z")


def test_exr_not_a_file(tmp_path):
    p = tmp_path / "bad.exr"
    p.write_bytes(b"not an exr")
    with pytest.raises(RuntimeError, match="bad EXR header|cannot"):
        native.read_exr_channel(str(p), "R")


def test_dataset_read_exr_uses_native(tmp_path):
    from omnifusion_tpu.data.datasets import read_exr_r

    data = {"R": (np.arange(12, dtype=np.float32)).reshape(3, 4)}
    path = str(tmp_path / "d.exr")
    write_exr(path, data, 2, 3)
    np.testing.assert_allclose(read_exr_r(path), data["R"])
