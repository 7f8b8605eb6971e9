"""Unit tests: marker parser + segment scanner (SURVEY.md §4 unit rows)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
from corpus import make_jpeg  # noqa: E402

import tpujpeg.bitstream as bs  # noqa: E402
from tpujpeg.errors import JpegSyntaxError, JpegUnsupportedError  # noqa: E402


def test_parse_baseline_420():
    data = make_jpeg(64, 48, subsampling=2)
    j = bs.parse(data)
    f = j.frame
    assert (f.width, f.height) == (64, 48)
    assert not f.progressive
    assert f.n_components == 3
    y, cb, cr = f.components
    assert (y.h, y.v) == (2, 2)
    assert (cb.h, cb.v) == (1, 1)
    assert f.mcus_x == 4 and f.mcus_y == 3
    assert y.padded_wb == 8 and y.padded_hb == 6
    assert cb.dwidth == 32 and cb.dheight == 24
    assert len(j.scans) == 1
    assert j.scans[0].interleaved
    assert set(j.qtables) >= {0, 1} or len(j.qtables) >= 1


def test_parse_progressive_has_multiple_scans():
    data = make_jpeg(64, 48, subsampling=2, progressive=True)
    j = bs.parse(data)
    assert j.frame.progressive
    assert len(j.scans) > 3
    # First scan must be the DC scan (T.81 §G.1: DC before AC).
    assert j.scans[0].ss == 0
    # AC scans are single-component.
    for s in j.scans:
        if s.ss > 0:
            assert s.n_comps == 1


def test_restart_offsets_and_segments():
    data = make_jpeg(129, 65, subsampling=2, restart_blocks=4)
    j = bs.parse(data)
    scan = j.scans[0]
    assert j.restart_interval == 4
    total_mcus = j.frame.mcus_x * j.frame.mcus_y
    expected_segments = -(-total_mcus // 4)
    assert len(scan.rst_offsets) == expected_segments - 1
    segs = bs.split_restart_segments(scan)
    assert len(segs) == expected_segments
    # Destuffing removes exactly one 0x00 per stuffed 0xFF and the two
    # RST marker bytes per boundary.
    n_stuffed = sum(
        1
        for i in range(len(scan.data) - 1)
        if scan.data[i] == 0xFF and scan.data[i + 1] == 0x00
    )
    assert sum(len(s) for s in segs) == (
        len(scan.data) - n_stuffed - 2 * len(scan.rst_offsets)
    )


def test_bad_soi_rejected():
    with pytest.raises(JpegSyntaxError):
        bs.parse(b"\x89PNG\r\n")


def test_truncated_rejected():
    data = make_jpeg(64, 48)
    with pytest.raises(Exception):
        bs.parse(data[:20])


def test_unsupported_sof_rejected():
    data = bytearray(make_jpeg(16, 16))
    # Rewrite SOF0 marker to SOF3 (lossless).
    i = data.find(b"\xff\xc0")
    assert i > 0
    data[i + 1] = 0xC3
    with pytest.raises(JpegUnsupportedError):
        bs.parse(bytes(data))


def test_zigzag_is_involution_pair():
    assert np.array_equal(bs.ZIGZAG[bs.NATURAL_TO_ZIGZAG], np.arange(64))
    assert np.array_equal(bs.NATURAL_TO_ZIGZAG[bs.ZIGZAG], np.arange(64))


# ---------------------------------------------------------------------------
# Property test: vectorized _find_scan_end vs a byte-serial reference
# (VERDICT round 1: "equivalence is argued, not tested")
# ---------------------------------------------------------------------------


def _find_scan_end_serial(data: bytes, start: int):
    """Byte-serial reference walk per T.81 §B.1.1.5 / §E.2.4: advance one
    byte at a time; at 0xFF classify the next byte as stuffed data (0x00),
    fill (0xFF), RSTn (record, skip marker), or scan terminator."""
    pos = start
    n = len(data)
    rsts = []
    while pos < n - 1:
        if data[pos] != 0xFF:
            pos += 1
            continue
        nxt = data[pos + 1]
        if nxt == 0x00:
            pos += 2  # stuffed pair: both bytes belong to the scan
        elif nxt == 0xFF:
            pos += 1  # fill byte: re-examine from the second 0xFF
        elif bs.M_RST0 <= nxt <= bs.M_RST7:
            rsts.append(pos - start)
            pos += 2
        else:
            return pos, rsts  # real marker terminates the scan
    return n, rsts


def _native_find_scan_end(data: bytes, start: int):
    from tpujpeg.native import entropy as native_entropy

    # Tiny initial capacity on purpose: exercises the re-call-with-true-
    # count path on FF-dense soup.
    lib = native_entropy.build_mod.get_lib()
    import ctypes

    cap = 2
    while True:
        out = np.empty(cap, dtype=np.int64)
        n_rst = ctypes.c_int64(0)
        end = lib.tj_find_scan_end(
            data, len(data), start,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            cap, ctypes.byref(n_rst),
        )
        if n_rst.value <= cap:
            return int(end), out[: n_rst.value]
        cap = int(n_rst.value)


def test_find_scan_end_matches_serial_reference():
    rng = np.random.default_rng(20260817)
    for trial in range(1000):
        k = int(rng.integers(0, 200))
        # FF-dense soup: half the bytes are 0xFF or marker-adjacent
        # values so every classification branch gets hammered.
        raw = rng.integers(0, 256, size=k, dtype=np.int64)
        dense = rng.choice(
            [0xFF, 0x00, 0xD0, 0xD7, 0xD9, 0xDA, 0xC4, 0xFE], size=k
        )
        pick = rng.random(k) < 0.5
        data = np.where(pick, dense, raw).astype(np.uint8).tobytes()
        start = int(rng.integers(0, max(k, 1))) if k else 0
        end_v, rst_v = bs._find_scan_end(data, start)
        end_s, rst_s = _find_scan_end_serial(data, start)
        assert end_v == end_s, (trial, data.hex(), start)
        assert list(rst_v) == rst_s, (trial, data.hex(), start)
        end_n, rst_n = _native_find_scan_end(data, start)
        assert end_n == end_s, (trial, data.hex(), start)
        assert list(rst_n) == rst_s, (trial, data.hex(), start)


def _scan_walk_serial(data: bytes, start: int):
    """Byte-serial reference for the FUSED walk (tj_scan_walk): the
    _find_scan_end_serial classification plus T.81 §B.1.1.5 destuffing
    into per-segment byte lists."""
    pos = start
    n = len(data)
    rsts = []
    segs = [bytearray()]
    while pos < n - 1:
        b = data[pos]
        if b != 0xFF:
            segs[-1].append(b)
            pos += 1
            continue
        nxt = data[pos + 1]
        if nxt == 0x00:
            segs[-1].append(0xFF)  # stuffed pair decodes as one 0xFF
            pos += 2
        elif nxt == 0xFF:
            segs[-1].append(0xFF)  # fill byte stays in the stream
            pos += 1
        elif bs.M_RST0 <= nxt <= bs.M_RST7:
            rsts.append(pos - start)
            segs.append(bytearray())
            pos += 2
        else:
            return pos, rsts, segs  # real marker terminates the scan
    segs[-1].extend(data[pos:n])  # truncated: trailing byte is data
    return n, rsts, segs


def test_scan_walk_matches_serial_reference():
    from tpujpeg.native import entropy as native_entropy

    rng = np.random.default_rng(20260820)
    for trial in range(1000):
        k = int(rng.integers(0, 200))
        raw = rng.integers(0, 256, size=k, dtype=np.int64)
        dense = rng.choice(
            [0xFF, 0x00, 0xD0, 0xD7, 0xD9, 0xDA, 0xC4, 0xFE], size=k
        )
        pick = rng.random(k) < 0.5
        data = np.where(pick, dense, raw).astype(np.uint8).tobytes()
        start = int(rng.integers(0, max(k, 1))) if k else 0
        end_s, rst_s, segs_s = _scan_walk_serial(data, start)
        end_n, rst_n, dest_n, starts_n = native_entropy.scan_walk(
            data, start
        )
        assert end_n == end_s, (trial, data.hex(), start)
        assert list(rst_n) == rst_s, (trial, data.hex(), start)
        ref = b"".join(bytes(s) for s in segs_s)
        assert dest_n.tobytes() == ref, (trial, data.hex(), start)
        lens = [len(s) for s in segs_s]
        ref_starts = np.concatenate([[0], np.cumsum(lens)])
        assert list(starts_n) == list(ref_starts), (
            trial, data.hex(), start,
        )


def test_destuff_segments_caches_on_scan():
    """destuff_segments caches its buffer on the Scan (the skeleton
    flow destuffs repeatedly) and the cache matches the python
    split+destuff reference byte for byte."""
    from corpus import make_jpeg
    from tpujpeg.native import entropy as native_entropy

    for kw in [
        dict(),
        dict(progressive=True),
        dict(restart_blocks=0),
        dict(subsampling=1, restart_rows=2),
    ]:
        data = make_jpeg(168, 120, seed=4, quality=90, **kw)
        j = bs.parse(data)
        for scan in j.scans:
            assert scan.destuffed is None  # parse stays two-pass
            buf, starts = native_entropy.destuff_segments(scan)
            assert scan.destuffed is not None
            buf2, starts2 = native_entropy.destuff_segments(scan)
            assert buf2 is buf and starts2 is starts  # served from cache
            pieces = bs.split_restart_segments(scan)
            assert scan.destuffed.tobytes() == b"".join(pieces)
            lens = [len(p) for p in pieces]
            ref = np.concatenate([[0], np.cumsum(lens)])
            n_rst = len(scan.rst_offsets)
            got = np.asarray(scan.dseg_starts)
            assert list(got[: n_rst + 1]) == list(ref[: n_rst + 1])
            assert got[n_rst + 1] == ref[-1]


def test_find_scan_end_handcrafted_cases():
    cases = [
        (b"", 0),
        (b"\xff", 0),
        (b"\xff\x00", 0),
        (b"\xff\xff\xd9", 0),                    # fill byte then EOI
        (b"\xab\xff\x00\xff\xd0\xcd\xff\xd9", 0),  # stuffed, RST0, EOI
        (b"\xff\xd0\xff\xd1\xff\xd9", 0),          # back-to-back RSTn
        (b"\xff\x00\x00\xff\xff\xff\xd7\xff\xda", 0),
        (b"\x00\xff", 0),                        # trailing lone 0xFF
    ]
    for data, start in cases:
        assert bs._find_scan_end(data, start)[0] == _find_scan_end_serial(data, start)[0]
        assert list(bs._find_scan_end(data, start)[1]) == _find_scan_end_serial(data, start)[1]


def test_dht_code_overflow_rejected():
    """A DHT whose BITS counts overflow the canonical code space must
    die at parse with a defined error (libjpeg jdhuff.c's exact bound —
    PIL rejects the same streams, keeping the error oracle aligned)."""
    from corpus import make_jpeg

    data = bytearray(make_jpeg(64, 64, seed=1, subsampling=2))
    # Find the first DHT segment and corrupt its BITS: 3 codes of
    # length 1 can never fit (2^1 = 2).
    i = 2
    while data[i + 1] != 0xC4:
        i += 2 + ((data[i + 2] << 8) | data[i + 3])
    data[i + 5] = 3  # counts[0] (length-1 codes) = 3
    with pytest.raises(JpegSyntaxError):
        bs.parse(bytes(data))
