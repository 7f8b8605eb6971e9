"""Fault injection (SURVEY.md §5 "Failure detection"): truncation, bad
markers, invalid Huffman codes must raise defined errors — no hangs, no
crashes. The entropy decoder is the classic place decoders break."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).parent))
from corpus import make_jpeg  # noqa: E402

import tpujpeg  # noqa: E402
from tpujpeg.errors import JpegError  # noqa: E402

PY_CFG = tpujpeg.DecodeConfig(entropy_engine="python")


def test_truncated_scan_raises():
    data = make_jpeg(64, 64, subsampling=2)
    with pytest.raises(JpegError):
        tpujpeg.decode(data[: len(data) // 2], PY_CFG)


def test_garbage_raises():
    with pytest.raises(JpegError):
        tpujpeg.decode(b"\x00" * 100, PY_CFG)
    with pytest.raises(JpegError):
        tpujpeg.decode(b"", PY_CFG)


def test_corrupt_entropy_defined_error():
    """Flipping bytes mid-scan must either decode (resyncable corruption)
    or raise JpegError — never hang or throw a non-JpegError."""
    data = bytearray(make_jpeg(64, 64, subsampling=2, seed=7))
    # Corrupt a run of bytes in the scan body (last quarter of the file).
    start = 3 * len(data) // 4
    for i in range(start, min(start + 16, len(data) - 2)):
        data[i] ^= 0xA5
    try:
        tpujpeg.decode(bytes(data), PY_CFG)
    except JpegError:
        pass


def test_missing_huffman_table():
    data = bytearray(make_jpeg(32, 32))
    # Point the scan at an undefined DC table id (Td=3).
    i = data.find(b"\xff\xda")
    assert i > 0
    # SOS: marker(2) len(2) ns(1) then (cs, tdta)...
    data[i + 6] = (3 << 4) | (data[i + 6] & 0x0F)
    with pytest.raises(JpegError):
        tpujpeg.decode(bytes(data), PY_CFG)
