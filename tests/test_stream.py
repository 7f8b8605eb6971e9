"""Pipelined host-prep/device-decode stream (SURVEY.md §2.3 PP row;
parallel/stream.py). Correctness contract: identical output to PIL and
to the unpipelined batch path, in-order chunks, per-image fault
isolation across prep and decode stages."""

import io

import numpy as np
from PIL import Image

import tpujpeg
from corpus import make_jpeg


def _pil(d):
    return np.asarray(Image.open(io.BytesIO(d)))


def test_stream_bit_exact_and_in_order():
    datas = [
        make_jpeg(128, 96, seed=s, subsampling=2, quality=85, restart_blocks=8)
        for s in range(10)
    ]
    seen = []
    for chunk in tpujpeg.decode_stream(datas, chunk_size=4, depth=2):
        assert not chunk.failures
        for k, i in enumerate(chunk.members):
            assert np.array_equal(np.asarray(chunk.images[k]), _pil(datas[i]))
        seen.extend(chunk.members)
    assert seen == list(range(10))


def test_stream_fault_isolation():
    good = make_jpeg(96, 96, seed=1, subsampling=2, restart_blocks=8)
    datas = [
        good,
        b"not a jpeg",          # parse failure in prep stage
        good[:200],             # truncated: fails in prep or decode
        good,
    ]
    res = tpujpeg.decode_batch_pipelined(datas, chunk_size=2)
    assert set(res.errors) >= {1}
    assert res.images[0] is not None and res.images[3] is not None
    assert np.array_equal(np.asarray(res.images[0]), _pil(good))
    assert np.array_equal(np.asarray(res.images[3]), _pil(good))
    for i in res.errors:
        assert res.images[i] is None
        assert isinstance(res.errors[i], tpujpeg.JpegError)


def test_stream_fallback_chunk():
    # Progressive images can't take the fused kernel; the chunk must
    # fall back (engine != wavefront-fused) and still decode bit-exact.
    datas = [
        make_jpeg(96, 96, seed=s, subsampling=2, progressive=True)
        for s in range(3)
    ]
    chunks = list(tpujpeg.decode_stream(datas, chunk_size=3))
    assert len(chunks) == 1
    ch = chunks[0]
    assert ch.engine == "fallback"
    assert not ch.failures
    for k, i in enumerate(ch.members):
        assert np.array_equal(np.asarray(ch.images[k]), _pil(datas[i]))


def test_stream_matches_batch_on_device():
    datas = [
        make_jpeg(160, 128, seed=s, subsampling=0, quality=90, restart_blocks=4)
        for s in range(6)
    ]
    a = tpujpeg.decode_batch_pipelined(datas, chunk_size=3)
    b = tpujpeg.decode_batch_on_device(datas)
    assert not a.errors and not b.errors
    for x, y in zip(a.images, b.images):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_stream_uneven_tail_chunk():
    datas = [
        make_jpeg(96, 64, seed=s, subsampling=2, restart_blocks=8)
        for s in range(5)
    ]
    res = tpujpeg.decode_batch_pipelined(datas, chunk_size=2)
    assert not res.errors
    for d, img in zip(datas, res.images):
        assert np.array_equal(np.asarray(img), _pil(d))


def test_stream_packed16_layout_bytes_are_raster():
    # layout="packed16": planar uint16 whose little-endian bytes are the
    # planar u8 raster (the chain ends at the color kernel). Both 4:2:0
    # and 4:2:2 take the packed path; bitcast and compare vs PIL.
    datas = [
        make_jpeg(128, 96, seed=s, subsampling=2, restart_blocks=4)
        for s in range(2)
    ] + [
        make_jpeg(128, 96, seed=9, subsampling=1, restart_blocks=4)
    ]
    for d in datas:
        chunks = list(
            tpujpeg.decode_stream([d], chunk_size=1, layout="packed16")
        )
        ch = chunks[0]
        assert ch.layout == "packed16"
        got = np.ascontiguousarray(np.asarray(ch.images[0]))
        assert got.dtype == np.uint16 and got.shape == (3, 96, 64)
        planar = got.view(np.uint8).reshape(3, 96, 128)
        assert np.array_equal(np.moveaxis(planar, 0, 2), _pil(d))


def test_stream_packed16_falls_back_to_nhwc_when_inapplicable():
    # 4:4:4 has no packed path: the chunk must come back nhwc uint8.
    d = make_jpeg(64, 64, seed=3, subsampling=0, restart_blocks=4)
    ch = next(iter(tpujpeg.decode_stream([d], layout="packed16")))
    assert ch.layout == "nhwc"
    assert np.array_equal(np.asarray(ch.images[0]), _pil(d))


def test_stream_norst_chunk_uses_device_ladder():
    """Marker-free streams reject the shared fused plan (oversize
    segment), but the fallback is now the DEVICE ladder: per-image
    DC-primed fused decode, not host entropy. Bit-exact either way."""
    datas = [make_jpeg(256, 192, seed=s, subsampling=2) for s in range(2)]
    res = tpujpeg.decode_batch_pipelined(datas, chunk_size=2)
    assert not res.errors
    for i, d in enumerate(datas):
        assert np.array_equal(np.asarray(res.images[i]), _pil(d))
