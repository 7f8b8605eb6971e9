"""Unit tests: Huffman table build + bit reader + EXTEND (SURVEY.md §4,
T.81 Annex C worked-example style)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

import tpujpeg.huffman as hm  # noqa: E402
from tpujpeg.bitstream import HuffSpec  # noqa: E402
from tpujpeg.errors import JpegHuffmanError  # noqa: E402


def _spec(counts, values):
    c = np.zeros(16, dtype=np.uint8)
    c[: len(counts)] = counts
    return HuffSpec(0, 0, c, np.array(values, dtype=np.uint8))


def test_canonical_code_assignment():
    # counts: one 1-bit code, two 3-bit codes → codes 0, 100, 101.
    spec = _spec([1, 0, 2], [7, 3, 9])
    t = hm.HuffTable.from_spec(spec)
    # Code '0' (1 bit) covers the lower half of the 16-bit index space.
    assert t.lut_sym[0x0000] == 7 and t.lut_len[0x0000] == 1
    assert t.lut_sym[0x7FFF] == 7 and t.lut_len[0x7FFF] == 1
    # '100' → index range [0x8000, 0xA000).
    assert t.lut_sym[0x8000] == 3 and t.lut_len[0x8000] == 3
    # '101' → [0xA000, 0xC000).
    assert t.lut_sym[0xA000] == 9 and t.lut_len[0xA000] == 3
    # '11x...' is unassigned → invalid.
    assert t.lut_len[0xC000] == 0


def test_decode_symbol_stream():
    spec = _spec([1, 0, 2], [7, 3, 9])
    t = hm.HuffTable.from_spec(spec)
    # Bits: 0 100 101 0 → byte 0b01001010 = 0x4A
    r = hm.BitReader(bytes([0b01001010]))
    assert hm.decode_symbol(r, t) == 7
    assert hm.decode_symbol(r, t) == 3
    assert hm.decode_symbol(r, t) == 9
    assert hm.decode_symbol(r, t) == 7


def test_invalid_code_raises():
    spec = _spec([1, 0, 2], [7, 3, 9])
    t = hm.HuffTable.from_spec(spec)
    r = hm.BitReader(bytes([0b11000000]))
    with pytest.raises(JpegHuffmanError):
        hm.decode_symbol(r, t)


def test_extend():
    # T.81 §F.2.2.1 EXTEND table semantics.
    assert hm.extend(0, 0) == 0
    assert hm.extend(1, 1) == 1
    assert hm.extend(0, 1) == -1
    assert hm.extend(0b11, 2) == 3
    assert hm.extend(0b00, 2) == -3
    assert hm.extend(0b10, 2) == 2
    assert hm.extend(0b01, 2) == -2
    for size in range(1, 12):
        vals = [hm.extend(v, size) for v in range(1 << size)]
        lo = [v for v in vals if v < 0]
        hi = [v for v in vals if v > 0]
        assert min(lo) == -(1 << size) + 1
        assert max(hi) == (1 << size) - 1


def test_bitreader_receive_and_overrun():
    r = hm.BitReader(b"\xa5")  # 10100101
    assert r.receive(3) == 0b101
    assert r.receive(5) == 0b00101
    assert not r.overrun()
    r.receive(9)  # forces fabricated bits
    assert r.overrun()
