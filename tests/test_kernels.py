"""Pallas kernel correctness (SURVEY.md §4 unit rows): interpret-mode
kernels must match the jnp semantic reference bit-for-bit, and the full
kernel pipeline must match PIL end-to-end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from corpus import make_jpeg, pil_decode

from tpujpeg import bitstream, transform
from tpujpeg.config import DecodeConfig
from tpujpeg.decoder import decode
from tpujpeg.kernels import idct as idct_k
from tpujpeg.kernels import pipeline as pipe_k
from tpujpeg.kernels import sample_color as sc_k


@pytest.fixture(scope="module")
def blocks(rng=None):
    r = np.random.default_rng(77)
    coeffs = r.integers(-1024, 1024, size=(300, 64)).astype(np.int32)
    # Realistic sparsity: most high-frequency coeffs are zero.
    mask = r.random((300, 64)) < 0.7
    coeffs[mask] = 0
    qtab = r.integers(1, 255, size=(64,)).astype(np.int32)
    return coeffs, qtab


def test_idct_islow_kernel_bit_exact(blocks):
    coeffs, qtab = blocks
    ref = transform.idct8x8_islow(
        transform.dequantize(jnp.asarray(coeffs), jnp.asarray(qtab))
    )
    got = idct_k.dequant_idct_islow(
        jnp.asarray(coeffs), jnp.asarray(qtab), interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_idct_matmul_conformance():
    """MXU variant: IEEE-1180-style tolerance vs the exact islow path
    (off-by-one rounding allowed on a tiny fraction of samples).
    Coefficients are forward-DCT'd real pixel blocks, so dequantized
    magnitudes stay in the range a conforming JPEG stream can produce
    (T.81 sample domain), unlike unconstrained random int32s."""
    r = np.random.default_rng(78)
    pix = r.integers(0, 256, size=(300, 8, 8)).astype(np.float64) - 128
    c = np.zeros((8, 8))
    for u in range(8):
        a = np.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            c[u, x] = a * np.cos((2 * x + 1) * u * np.pi / 16.0)
    freq = np.einsum("ux,vy,nxy->nuv", c, c, pix)  # forward 2-D DCT
    qtab = r.integers(1, 64, size=(64,)).astype(np.int32)
    qnat = qtab[np.asarray(bitstream.NATURAL_TO_ZIGZAG)].reshape(8, 8)
    quant = np.round(freq / qnat).astype(np.int32).reshape(300, 64)
    coeffs = quant[:, np.asarray(bitstream.ZIGZAG)]  # back to zigzag order
    ref = np.asarray(
        transform.idct8x8_islow(
            transform.dequantize(jnp.asarray(coeffs), jnp.asarray(qtab))
        )
    ).astype(np.int32)
    got = np.asarray(
        idct_k.dequant_idct_matmul(jnp.asarray(coeffs), jnp.asarray(qtab))
    ).astype(np.int32)
    diff = np.abs(ref - got)
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.05


def _pad_edge(a, h, w):
    return np.pad(a, ((0, h - a.shape[0]), (0, w - a.shape[1])), mode="edge")


def test_upsample_color_h2v2_matches_reference():
    r = np.random.default_rng(5)
    hc, wc = 64, 128  # already aligned
    cb = r.integers(0, 256, size=(hc, wc)).astype(np.uint8)
    cr = r.integers(0, 256, size=(hc, wc)).astype(np.uint8)
    y = r.integers(0, 256, size=(2 * hc, 2 * wc)).astype(np.uint8)
    ref = transform.ycc_to_rgb(
        jnp.asarray(y),
        transform.upsample_h2v2_fancy(jnp.asarray(cb)),
        transform.upsample_h2v2_fancy(jnp.asarray(cr)),
    )
    got = sc_k.upsample_color_h2v2(
        jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr), interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(got).transpose(1, 2, 0), np.asarray(ref)
    )


def test_upsample_color_h2v1_matches_reference():
    r = np.random.default_rng(6)
    h, wc = 64, 128
    cb = r.integers(0, 256, size=(h, wc)).astype(np.uint8)
    cr = r.integers(0, 256, size=(h, wc)).astype(np.uint8)
    y = r.integers(0, 256, size=(h, 2 * wc)).astype(np.uint8)
    ref = transform.ycc_to_rgb(
        jnp.asarray(y),
        transform.upsample_h2v1_fancy(jnp.asarray(cb)),
        transform.upsample_h2v1_fancy(jnp.asarray(cr)),
    )
    got = sc_k.upsample_color_h2v1(
        jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr), interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(got).transpose(1, 2, 0), np.asarray(ref)
    )


PIPE_CASES = [
    dict(w=120, h=88, subsampling=2),   # h2v2, odd-ish dims
    dict(w=64, h=48, subsampling=1),    # h2v1
    dict(w=80, h=80, subsampling=0),    # 444
    dict(w=56, h=56, subsampling=2, mode="L"),  # grayscale
]


@pytest.mark.parametrize("case", PIPE_CASES, ids=["420", "422", "444", "gray"])
def test_pipeline_bit_exact_vs_pil(case):
    kw = dict(case)
    w, h = kw.pop("w"), kw.pop("h")
    data = make_jpeg(w, h, seed=11, **kw)
    out = decode(data, DecodeConfig(transform_engine="pallas"))
    np.testing.assert_array_equal(out, pil_decode(data))


def test_pipeline_matmul_idct_close_to_pil():
    data = make_jpeg(96, 64, seed=12, subsampling=2)
    out = decode(
        data, DecodeConfig(transform_engine="pallas", idct="matmul")
    ).astype(np.int32)
    ref = pil_decode(data).astype(np.int32)
    # Color conversion amplifies a +-1 IDCT LSB slightly; stay tight.
    assert np.abs(out - ref).max() <= 3
    assert (out != ref).mean() < 0.2


def test_batched_pipeline_matches_single():
    """One bucket, one dispatch: batched kernel path must equal per-image
    decode and PIL for mixed content (SURVEY.md §3.5)."""
    import tpujpeg

    datas = [
        make_jpeg(120, 88, seed=s, subsampling=2, kind=k)
        for s, k in [(1, "photo"), (2, "noise"), (3, "flat")]
    ]
    res = tpujpeg.decode_batch(datas, DecodeConfig(transform_engine="pallas"))
    assert not res.errors
    for d, img in zip(datas, res.images):
        np.testing.assert_array_equal(img, pil_decode(d))


def test_batched_pipeline_fault_isolation():
    import tpujpeg

    datas = [
        make_jpeg(64, 48, seed=1, subsampling=2),
        b"not a jpeg",
        make_jpeg(64, 48, seed=2, subsampling=2),
    ]
    res = tpujpeg.decode_batch(datas, DecodeConfig(transform_engine="pallas"))
    assert set(res.errors) == {1}
    np.testing.assert_array_equal(res.images[0], pil_decode(datas[0]))
    np.testing.assert_array_equal(res.images[2], pil_decode(datas[2]))
    assert res.images[1] is None


def test_batched_progressive_via_native_entropy():
    """Progressive files in a batch: host native entropy (all four scan
    kinds) + fused Pallas transform, bit-exact."""
    import tpujpeg

    datas = [
        make_jpeg(120, 88, seed=s, subsampling=2, progressive=True)
        for s in range(3)
    ]
    res = tpujpeg.decode_batch(datas, DecodeConfig(transform_engine="pallas"))
    assert not res.errors
    for d, img in zip(datas, res.images):
        np.testing.assert_array_equal(img, pil_decode(d))
