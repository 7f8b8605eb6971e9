"""Device wavefront entropy decoder vs the Python oracle (SURVEY.md §3.4;
§4 unit rows). Runs on the CPU backend — the XLA formulation is
platform-independent by construction."""

import numpy as np
import pytest

from corpus import make_jpeg, pil_decode

from tpujpeg import bitstream, huffman
from tpujpeg.config import DecodeConfig
from tpujpeg.decoder import decode
from tpujpeg.errors import JpegError, JpegUnsupportedError
from tpujpeg.kernels import wavefront


CASES = [
    dict(w=64, h=48, subsampling=2),
    dict(w=129, h=65, subsampling=2),                    # MCU padding
    dict(w=120, h=88, subsampling=2, restart_blocks=5),  # many lanes
    dict(w=200, h=144, subsampling=2, restart_rows=1),
    dict(w=96, h=80, subsampling=1, restart_blocks=3),   # 4:2:2
    dict(w=96, h=80, subsampling=0),                     # 4:4:4
    dict(w=64, h=64, subsampling=2, mode="L"),           # grayscale
    dict(w=80, h=56, subsampling=2, quality=98),         # dense coeffs
    dict(w=80, h=56, subsampling=2, quality=25, kind="noise"),
]


@pytest.mark.parametrize("case", CASES, ids=[str(i) for i in range(len(CASES))])
def test_wavefront_matches_python_oracle(case):
    kw = dict(case)
    w, h = kw.pop("w"), kw.pop("h")
    data = make_jpeg(w, h, seed=3, **kw)
    jpeg = bitstream.parse(data)
    ref = huffman.decode_all_scans(jpeg)
    got = wavefront.decode_all_scans(jpeg)
    for ci, (a, b) in enumerate(zip(ref, got)):
        np.testing.assert_array_equal(a, b, err_msg=f"component {ci}")


def test_wavefront_full_decode_bit_exact():
    data = make_jpeg(200, 120, seed=5, subsampling=2, restart_rows=1)
    out = decode(data, DecodeConfig(entropy_engine="wavefront"))
    np.testing.assert_array_equal(out, pil_decode(data))


def test_wavefront_progressive_unsupported():
    data = make_jpeg(64, 64, seed=1, subsampling=2, progressive=True)
    jpeg = bitstream.parse(data)
    with pytest.raises(JpegUnsupportedError):
        wavefront.decode_all_scans(jpeg)


def test_wavefront_garbage_scan_raises():
    data = make_jpeg(64, 64, seed=2, subsampling=2)
    jpeg = bitstream.parse(data)
    jpeg.scans[0].data = bytes(len(jpeg.scans[0].data))  # all-zero bits
    with pytest.raises(JpegError):
        wavefront.decode_all_scans(jpeg)


def test_wavefront_truncated_raises():
    data = make_jpeg(128, 96, seed=1, subsampling=2)
    jpeg = bitstream.parse(data)
    jpeg.scans[0].data = jpeg.scans[0].data[: len(jpeg.scans[0].data) // 4]
    with pytest.raises(JpegError):
        wavefront.decode_all_scans(jpeg)


def test_wavefront_batched_multi_image_single_launch():
    """Several images (different sizes, tables, segment structures)
    merged into ONE wavefront launch (SURVEY.md §3.5)."""
    import jax.numpy as jnp

    datas = [
        make_jpeg(64, 48, seed=1, subsampling=2),
        make_jpeg(120, 88, seed=2, subsampling=2, restart_blocks=5),
        make_jpeg(96, 80, seed=3, subsampling=0, quality=40),
        make_jpeg(64, 64, seed=4, subsampling=2, mode="L"),
    ]
    jpegs = [bitstream.parse(d) for d in datas]
    got, failures = wavefront.decode_batch_to_device(jpegs, strict=False)
    assert not failures
    for i, jpeg in enumerate(jpegs):
        ref = huffman.decode_all_scans(jpeg)
        for ci, (a, b) in enumerate(zip(ref, got[i])):
            np.testing.assert_array_equal(
                a, np.asarray(b), err_msg=f"image {i} component {ci}"
            )


def test_decode_batch_on_device_bit_exact_and_isolated():
    """Full on-chip path: one wavefront launch + bucketed Pallas
    transform; corrupt images are isolated, good ones bit-exact."""
    from tpujpeg.parallel import batch as batch_lib

    datas = [
        make_jpeg(120, 88, seed=1, subsampling=2),
        b"garbage",
        make_jpeg(120, 88, seed=2, subsampling=2, kind="noise"),
        make_jpeg(96, 64, seed=3, subsampling=0),  # different bucket
    ]
    res = batch_lib.decode_batch_on_device(datas)
    assert set(res.errors) == {1}
    for i in (0, 2, 3):
        np.testing.assert_array_equal(res.images[i], pil_decode(datas[i]))


def test_decode_batch_on_device_corrupt_stream_isolated():
    from tpujpeg.parallel import batch as batch_lib

    good = make_jpeg(64, 48, seed=5, subsampling=2)
    bad = bytearray(make_jpeg(64, 48, seed=6, subsampling=2))
    bad = bytes(bad[: len(bad) // 2]) + b"\x00" * 10 + b"\xff\xd9"
    res = batch_lib.decode_batch_on_device([good, bad])
    assert 0 not in res.errors
    np.testing.assert_array_equal(res.images[0], pil_decode(good))


def test_wavefront_dense_stream_overflow_retry():
    """A q100 noise image runs far over the heuristic symbol bound and
    must take the hard-bound retry path, still bit-exact."""
    data = make_jpeg(48, 48, seed=9, subsampling=0, quality=100, kind="noise")
    jpeg = bitstream.parse(data)
    plan = wavefront.build_batch_plan([jpeg])
    assert plan.hard_max_steps > plan.max_steps
    ref = huffman.decode_all_scans(jpeg)
    got = wavefront.decode_all_scans(jpeg)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(a, b)
