"""Bitstream fault injection across engines (SURVEY.md §5 "Failure
detection": truncation, bad marker, invalid Huffman code must yield a
defined JpegError — never a hang, crash, or silent garbage)."""

import numpy as np
import pytest

from corpus import make_jpeg, pil_decode

from tpujpeg import bitstream, huffman
from tpujpeg.config import DecodeConfig
from tpujpeg.decoder import decode
from tpujpeg.errors import JpegError
from tpujpeg.native import entropy as native_entropy
from tpujpeg.kernels import wavefront_pallas as wp


BASE = make_jpeg(96, 80, seed=42, subsampling=2, restart_blocks=3)


def _mutations():
    rng = np.random.default_rng(7)
    data = bytearray(BASE)
    out = []
    # Truncations at varied depths.
    for frac in (0.1, 0.35, 0.6, 0.9, 0.99):
        out.append(bytes(data[: int(len(data) * frac)]))
    # Single-byte corruptions (header and scan regions).
    for _ in range(30):
        pos = int(rng.integers(2, len(data) - 2))
        mut = bytearray(data)
        mut[pos] ^= int(rng.integers(1, 256))
        out.append(bytes(mut))
    # Byte deletions / duplications.
    for _ in range(10):
        pos = int(rng.integers(2, len(data) - 2))
        mut = bytearray(data)
        del mut[pos]
        out.append(bytes(mut))
    return out


@pytest.mark.parametrize("engine", ["native", "python", "wavefront"])
def test_fuzz_never_hangs_or_crashes(engine):
    cfg = DecodeConfig(entropy_engine=engine)
    ref = pil_decode(BASE)
    for i, mut in enumerate(_mutations()):
        try:
            out = decode(mut, cfg)
        except JpegError:
            continue  # defined failure
        # Decoded without error: output shape must at least be sane.
        assert out.ndim in (2, 3) and out.shape[0] > 0, f"mutation {i}"


def test_fuzz_batch_on_device_isolates_every_failure():
    import tpujpeg

    muts = _mutations()[:12]
    datas = [BASE] + muts + [BASE]
    res = tpujpeg.decode_batch_on_device(datas)
    # The two clean copies always decode bit-exactly.
    ref = pil_decode(BASE)
    np.testing.assert_array_equal(res.images[0], ref)
    np.testing.assert_array_equal(res.images[-1], ref)
    for i in res.errors:
        assert isinstance(res.errors[i], JpegError)


PROG_BASE = make_jpeg(96, 80, seed=43, subsampling=2, progressive=True,
                      restart_blocks=4)
NORST_BASE = make_jpeg(160, 128, seed=44, subsampling=2)  # no markers


def _mutate(base, n=24, seed=9):
    rng = np.random.default_rng(seed)
    out = []
    for frac in (0.2, 0.5, 0.8, 0.97):
        out.append(base[: int(len(base) * frac)])
    for _ in range(n - 4):
        pos = int(rng.integers(2, len(base) - 2))
        mut = bytearray(base)
        mut[pos] ^= int(rng.integers(1, 256))
        out.append(bytes(mut))
    return out


def test_fuzz_progressive_device_engine():
    """Corrupt progressive streams through the device scan kernels:
    defined JpegError or sane output — never a hang or crash (the
    kernels' while-loops are step-bounded by construction)."""
    cfg = DecodeConfig(entropy_engine="wavefront")
    for i, mut in enumerate(_mutate(PROG_BASE)):
        try:
            out = decode(mut, cfg)
        except JpegError:
            continue
        assert out.ndim in (2, 3) and out.shape[0] > 0, f"mutation {i}"


def test_fuzz_norst_device_engine():
    """Corrupt marker-free streams through the skeleton-scan device
    path: the host pre-scan or the kernel must flag the error."""
    cfg = DecodeConfig(entropy_engine="wavefront")
    for i, mut in enumerate(_mutate(NORST_BASE, seed=10)):
        try:
            out = decode(mut, cfg)
        except JpegError:
            continue
        assert out.ndim in (2, 3) and out.shape[0] > 0, f"mutation {i}"
