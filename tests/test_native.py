"""Native C++ entropy decoder vs the pure-Python oracle (SURVEY.md §4:
the M2 native path must reproduce M0's coefficients exactly; full-decode
bit-exactness vs PIL then follows from the shared transform stage)."""

import numpy as np
import pytest

from corpus import make_jpeg, pil_decode

from tpujpeg import bitstream, huffman
from tpujpeg.config import DecodeConfig
from tpujpeg.decoder import decode
from tpujpeg.errors import JpegError, JpegTruncatedError
from tpujpeg.native import entropy as native_entropy


CASES = [
    dict(w=64, h=48, subsampling=2),
    dict(w=129, h=65, subsampling=2),            # odd dims, MCU padding
    dict(w=96, h=80, subsampling=1),             # 4:2:2
    dict(w=96, h=80, subsampling=0),             # 4:4:4
    dict(w=120, h=88, subsampling=2, restart_blocks=5),   # restart markers
    dict(w=200, h=144, subsampling=2, restart_rows=1),
    dict(w=64, h=64, subsampling=2, mode="L"),   # grayscale
    dict(w=160, h=112, subsampling=2, progressive=True),
    dict(w=128, h=96, subsampling=0, progressive=True),
    dict(w=144, h=96, subsampling=2, progressive=True, restart_blocks=7),
    dict(w=80, h=56, subsampling=2, quality=25, kind="noise"),
    dict(w=80, h=56, subsampling=2, quality=98),
]


@pytest.mark.parametrize("case", CASES, ids=[str(i) for i in range(len(CASES))])
def test_native_matches_python_oracle(case):
    kw = dict(case)
    w, h = kw.pop("w"), kw.pop("h")
    data = make_jpeg(w, h, seed=3, **kw)
    jpeg = bitstream.parse(data)

    ref = huffman.decode_all_scans(jpeg)
    got = native_entropy.decode_all_scans(jpeg)
    for ci, (a, b) in enumerate(zip(ref, got)):
        np.testing.assert_array_equal(a, b, err_msg=f"component {ci}")


@pytest.mark.parametrize("threads", [1, 4])
def test_native_threaded_restart_segments(threads):
    data = make_jpeg(320, 240, seed=9, subsampling=2, restart_rows=1)
    jpeg = bitstream.parse(data)
    ref = huffman.decode_all_scans(jpeg)
    got = native_entropy.decode_all_scans(jpeg, n_threads=threads)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(a, b)


def test_native_full_decode_bit_exact():
    data = make_jpeg(200, 120, seed=5, subsampling=2, restart_rows=1)
    out = decode(data, DecodeConfig(entropy_engine="native"))
    np.testing.assert_array_equal(out, pil_decode(data))


def test_native_truncated_raises():
    data = make_jpeg(128, 96, seed=1, subsampling=2)
    jpeg = bitstream.parse(data)
    # Chop most of the scan payload off.
    scan = jpeg.scans[0]
    scan.data = scan.data[: len(scan.data) // 4]
    with pytest.raises(JpegError):
        native_entropy.decode_all_scans(jpeg)


def test_native_garbage_scan_raises():
    data = make_jpeg(64, 64, seed=2, subsampling=2)
    jpeg = bitstream.parse(data)
    jpeg.scans[0].data = bytes(len(jpeg.scans[0].data))  # all zero bits
    with pytest.raises(JpegError):
        native_entropy.decode_all_scans(jpeg)


def test_destuff_segments_matches_python():
    data = make_jpeg(200, 144, seed=4, subsampling=2, restart_rows=1)
    jpeg = bitstream.parse(data)
    scan = jpeg.scans[0]
    buf, starts = native_entropy.destuff_segments(scan)
    pieces = bitstream.split_restart_segments(scan)
    assert len(starts) == len(pieces) + 1
    for i, p in enumerate(pieces):
        got = buf[starts[i] : starts[i + 1]].tobytes()
        assert got == p, f"segment {i}"


def test_destuff_rows_matches_segments():
    """tj_destuff_rows (fixed-width byte-swapped word rows) must agree
    with tj_destuff_segments byte-for-byte, padding with 0xFF."""
    data = make_jpeg(200, 144, seed=4, subsampling=2, restart_blocks=3)
    jpeg = bitstream.parse(data)
    scan = jpeg.scans[0]
    buf, starts = native_entropy.destuff_segments(scan)
    n_seg = len(starts) - 1
    lens = np.diff(np.asarray(starts[: n_seg + 1]))
    W = int(lens.max()) // 4 + 2
    rows = np.empty((n_seg, W), dtype=np.int32)
    bits = np.zeros(n_seg, dtype=np.int32)
    native_entropy.destuff_rows(scan, n_seg, W, rows, bits)
    np.testing.assert_array_equal(bits, lens * 8)
    # Un-byteswap and compare each row's payload + 0xFF padding.
    raw = rows.view(np.uint32).byteswap().view(np.uint8).reshape(n_seg, W * 4)
    for s in range(n_seg):
        seg = np.asarray(buf[starts[s] : starts[s + 1]])
        np.testing.assert_array_equal(raw[s, : lens[s]], seg)
        assert (raw[s, lens[s] :] == 0xFF).all()


def test_rows_from_dest_matches_destuff_rows():
    """tj_rows_from_dest (memcpy row fill from the fused walk's
    destuffed buffer) is bit-identical to tj_destuff_rows (memchr
    re-walk of the stuffed stream), including overflow behavior."""
    data = make_jpeg(200, 144, seed=4, subsampling=2, restart_blocks=3)
    jpeg = bitstream.parse(data)
    scan = jpeg.scans[0]
    native_entropy.destuff_segments(scan)  # populate the Scan cache
    assert scan.destuffed is not None
    n_seg = len(scan.rst_offsets) + 1
    lens = np.diff(np.asarray(scan.dseg_starts[: n_seg + 1]))
    W = int(lens.max()) // 4 + 2
    a_rows = np.empty((n_seg, W), dtype=np.int32)
    a_bits = np.zeros(n_seg, dtype=np.int32)
    b_rows = np.empty((n_seg, W), dtype=np.int32)
    b_bits = np.zeros(n_seg, dtype=np.int32)
    native_entropy.destuff_rows(scan, n_seg, W, a_rows, a_bits)
    native_entropy.rows_from_dest(
        scan.destuffed, scan.dseg_starts, 0, n_seg, W, b_rows, b_bits
    )
    np.testing.assert_array_equal(a_rows, b_rows)
    np.testing.assert_array_equal(a_bits, b_bits)
    with pytest.raises(JpegTruncatedError):
        native_entropy.rows_from_dest(
            scan.destuffed, scan.dseg_starts, 0, n_seg, 2,
            np.empty((n_seg, 2), np.int32), b_bits,
        )


def test_native_scan_split_matches_python_walk():
    """tj_scan_split (skeleton scan, round-2 addition) vs the
    pure-python walker: identical bit offsets AND per-lane DC predictor
    values on marker-free and restart-segmented streams."""
    from tpujpeg.kernels.wavefront_pallas import _skeleton_walk_py

    for kw in (dict(), dict(restart_blocks=64)):
        data = make_jpeg(160, 128, seed=17, subsampling=2, **kw)
        jpeg = bitstream.parse(data)
        scan = jpeg.scans[0]
        dest, starts = native_entropy.destuff_segments(scan)
        total, _sp = native_entropy._blocks_sp(jpeg, scan)
        ri = scan.restart_interval or total
        mcu = 0
        si = 0
        while mcu < total:
            n_m = min(ri, total - mcu)
            sub = dest[int(starts[si]) : int(starts[si + 1])]
            got, got_dc = native_entropy.scan_split_buf(
                sub, jpeg, scan, n_m, 7
            )
            want, want_dc = _skeleton_walk_py(
                bytes(sub), jpeg, scan, n_m, 7
            )
            np.testing.assert_array_equal(got, want)
            np.testing.assert_array_equal(got_dc, want_dc)
            mcu += n_m
            si += 1


def test_native_scan_split_dc_matches_full_decode():
    """The skeleton scan's DC predictor records equal the REAL decoder's
    predictor state at the same MCUs (oracle: dequantized-DC deltas from
    the python full decode) — the contract that lets lane_dc0 prime the
    fused kernel with true DCs."""
    from tpujpeg import huffman as hf

    data = make_jpeg(160, 96, seed=31, subsampling=2)
    jpeg = bitstream.parse(data)
    scan = jpeg.scans[0]
    dest, _ = native_entropy.destuff_segments(scan)
    total, _sp = native_entropy._blocks_sp(jpeg, scan)
    every = 5
    offs, dcs = native_entropy.scan_split_buf(dest, jpeg, scan, total, every)
    # Oracle: raw (pre-dequant) DC coefficients from the full decode are
    # the predictor values AFTER each MCU; predictor AT MCU m's start is
    # the last DC of each component in MCUs [0, m).
    frame = jpeg.frame
    coeffs = [
        np.zeros((c.padded_hb * c.padded_wb, 64), np.int32)
        for c in frame.components
    ]
    hf.decode_baseline_scan(jpeg, scan, coeffs)
    for li in range(len(dcs)):
        m = li * every
        for p, ci in enumerate(scan.comp_indices):
            c = frame.components[ci]
            nb = c.h * c.v  # blocks of ci per MCU
            if m == 0:
                want = 0
            else:
                # Last block of component ci within the first m MCUs, in
                # MCU-interleaved order == block index m*nb-1 of ci.
                grid = coeffs[ci]
                my, mx = frame.mcus_y, frame.mcus_x
                # grid is [padded blocks, 64] in raster block order:
                # recover MCU-order index of block m*nb-1.
                k = m * nb - 1
                mcu_i, bi = divmod(k, nb)
                ry, rx = divmod(mcu_i, mx)
                dv, dh = divmod(bi, c.h)
                row = ry * c.v + dv
                col = rx * c.h + dh
                want = int(grid[row * c.padded_wb + col, 0])
            assert int(dcs[li, p]) == want, (li, p)


def test_native_scan_split_truncation_detected():
    from tpujpeg.errors import JpegError

    data = make_jpeg(96, 96, seed=18, subsampling=2)
    jpeg = bitstream.parse(data)
    scan = jpeg.scans[0]
    dest, _ = native_entropy.destuff_segments(scan)
    total, _sp = native_entropy._blocks_sp(jpeg, scan)
    with pytest.raises(JpegError):
        native_entropy.scan_split_buf(dest[: len(dest) // 4], jpeg, scan,
                                      total, 8)


def test_native_scan_split_spec_matches_serial():
    """The speculative parallel skeleton scan (tj_scan_split_spec —
    SURVEY.md §5 long-context item 4, the PAPERS.md:5/7 self-sync
    technique) is bit-identical to the serial walk across content
    classes, subsamplings and sampling strides."""
    cases = [
        dict(w=640, h=480, subsampling=2, kind="photo"),
        dict(w=640, h=480, subsampling=2, kind="noise"),
        dict(w=640, h=480, subsampling=2, kind="flat"),
        dict(w=512, h=384, subsampling=0),
        dict(w=384, h=256, mode="L"),
        dict(w=333, h=77, subsampling=1),
    ]
    for ci, kw in enumerate(cases):
        w, h = kw.pop("w"), kw.pop("h")
        data = make_jpeg(w, h, seed=200 + ci, quality=85, **kw)
        jpeg = bitstream.parse(data)
        scan = jpeg.scans[0]
        dest, _ = native_entropy.destuff_segments(scan)
        total, _sp = native_entropy._blocks_sp(jpeg, scan)
        for every in (1, 16, 257):
            a, a_dc = native_entropy.scan_split_buf(
                dest, jpeg, scan, total, every, n_threads=1
            )
            b, b_dc = native_entropy.scan_split_buf(
                dest, jpeg, scan, total, every, n_threads=4
            )
            np.testing.assert_array_equal(
                a, b, err_msg=f"case {ci} every {every}"
            )
            np.testing.assert_array_equal(
                a_dc, b_dc, err_msg=f"case {ci} every {every} (dc)"
            )


def test_native_scan_split_spec_error_parity():
    """Truncated and corrupted streams produce the SAME error class (or
    the same offsets, when the corruption happens to stay decodable) as
    the serial walk — speculation never changes observable behavior."""
    from tpujpeg.errors import JpegError

    data = make_jpeg(512, 512, seed=19, subsampling=2)
    jpeg = bitstream.parse(data)
    scan = jpeg.scans[0]
    dest, _ = native_entropy.destuff_segments(scan)
    total, _sp = native_entropy._blocks_sp(jpeg, scan)

    rng = np.random.default_rng(7)
    for trial in range(8):
        bad = np.array(dest, copy=True)
        if trial % 2 == 0:
            bad = bad[: rng.integers(8, len(bad))]
        else:
            at = int(rng.integers(0, max(1, len(bad) - 64)))
            bad[at : at + 32] = rng.integers(0, 256, 32, dtype=np.uint8)
        try:
            a = native_entropy.scan_split_buf(
                bad, jpeg, scan, total, 16, n_threads=1
            )
            serial_err = None
        except JpegError as e:
            a, serial_err = None, type(e)
        try:
            b = native_entropy.scan_split_buf(
                bad, jpeg, scan, total, 16, n_threads=4
            )
            spec_err = None
        except JpegError as e:
            b, spec_err = None, type(e)
        assert serial_err is spec_err, f"trial {trial}"
        if a is not None:
            np.testing.assert_array_equal(
                a[0], b[0], err_msg=f"trial {trial}"
            )
            np.testing.assert_array_equal(
                a[1], b[1], err_msg=f"trial {trial} (dc)"
            )
