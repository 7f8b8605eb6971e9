"""Unit tests: IDCT accuracy + upsample/color semantics (SURVEY.md §4
unit rows — IEEE-1180-style accuracy harness + numpy references)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

import jax.numpy as jnp  # noqa: E402

import tpujpeg.transform as tf  # noqa: E402


def _float_idct_ref(block: np.ndarray) -> np.ndarray:
    """Exact float64 2-D DCT-III reference (orthonormal JPEG scaling)."""
    n = 8
    c = np.ones(n)
    c[0] = 1.0 / np.sqrt(2.0)
    basis = np.zeros((n, n))
    for x in range(n):
        for u in range(n):
            basis[x, u] = 0.5 * c[u] * np.cos((2 * x + 1) * u * np.pi / 16)
    return basis @ block @ basis.T


def test_idct_accuracy_ieee1180_style(rng):
    """Random coefficient blocks: islow output within ±1 of the exact
    float IDCT (+128, clamped) — IEEE 1180 permits |err|<=1 pointwise."""
    n = 512
    coef = rng.integers(-256, 257, size=(n, 8, 8)).astype(np.int32)
    got = np.asarray(tf.idct8x8_islow(jnp.asarray(coef))).astype(np.int64)
    want = np.stack([_float_idct_ref(b.astype(np.float64)) for b in coef])
    want = np.clip(np.round(want) + 128, 0, 255)
    err = np.abs(got - want)
    assert err.max() <= 1
    assert err.mean() < 0.07


def test_idct_dc_only_exact():
    """DC-only blocks must produce the flat value exactly:
    out = clamp(round(dc/8) + 128)."""
    dcs = np.arange(-1024, 1025, 37, dtype=np.int32)
    blocks = np.zeros((len(dcs), 8, 8), dtype=np.int32)
    blocks[:, 0, 0] = dcs
    got = np.asarray(tf.idct8x8_islow(jnp.asarray(blocks)))
    # libjpeg DESCALE rounding: (dc*2^16 + 2^17) >> 18 == round-half-up(dc/8)...
    want = np.clip(((dcs.astype(np.int64) << 15) + (1 << 17) >> 18) + 128, 0, 255)
    # Compute directly as the islow math would: descale(dc<<13<<2<<..., 18)
    want = np.clip(((dcs.astype(np.int64) * (1 << 15)) + (1 << 17) >> 18) + 128, 0, 255)
    assert np.array_equal(got[:, 0, 0], want.astype(np.uint8))
    assert (got == got[:, :1, :1]).all()  # flat blocks


def test_zero_block_is_128():
    z = np.zeros((1, 8, 8), dtype=np.int32)
    out = np.asarray(tf.idct8x8_islow(jnp.asarray(z)))
    assert (out == 128).all()


def _h2v1_ref(row: np.ndarray) -> np.ndarray:
    """Scalar port of jdsample.c h2v1_fancy_upsample for one row."""
    w = len(row)
    out = np.zeros(2 * w, dtype=np.int64)
    for i in range(w):
        v = int(row[i]) * 3
        prev = int(row[i - 1]) if i > 0 else int(row[0])
        nxt = int(row[i + 1]) if i < w - 1 else int(row[w - 1])
        out[2 * i] = (v + prev + 1) >> 2
        out[2 * i + 1] = (v + nxt + 2) >> 2
    out[0] = row[0]
    out[-1] = row[-1]
    return out


def test_h2v1_fancy_matches_scalar_ref(rng):
    plane = rng.integers(0, 256, size=(5, 17)).astype(np.uint8)
    got = np.asarray(tf.upsample_h2v1_fancy(jnp.asarray(plane)))
    for r in range(5):
        assert np.array_equal(got[r].astype(np.int64), _h2v1_ref(plane[r]))


def _h2v2_ref(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    out = np.zeros((2 * h, 2 * w), dtype=np.int64)
    p = plane.astype(np.int64)
    for r in range(h):
        for v in range(2):
            adj = max(r - 1, 0) if v == 0 else min(r + 1, h - 1)
            cs = 3 * p[r] + p[adj]
            orow = out[2 * r + v]
            orow[0] = (cs[0] * 4 + 8) >> 4
            orow[2 * w - 1] = (cs[w - 1] * 4 + 7) >> 4
            for i in range(w):
                if i > 0:
                    orow[2 * i] = (3 * cs[i] + cs[i - 1] + 8) >> 4
                if i < w - 1:
                    orow[2 * i + 1] = (3 * cs[i] + cs[i + 1] + 7) >> 4
    return out


def test_h2v2_fancy_matches_scalar_ref(rng):
    plane = rng.integers(0, 256, size=(6, 9)).astype(np.uint8)
    got = np.asarray(tf.upsample_h2v2_fancy(jnp.asarray(plane)))
    assert np.array_equal(got.astype(np.int64), _h2v2_ref(plane))


def test_int_upsample():
    p = np.arange(6, dtype=np.uint8).reshape(2, 3)
    got = np.asarray(tf.upsample_int(jnp.asarray(p), 2, 3))
    assert got.shape == (6, 6)
    assert (got[0:3, 0:2] == p[0, 0]).all()


def test_ycc_to_rgb_fixed_point(rng):
    y = rng.integers(0, 256, size=(16, 16)).astype(np.uint8)
    cb = rng.integers(0, 256, size=(16, 16)).astype(np.uint8)
    cr = rng.integers(0, 256, size=(16, 16)).astype(np.uint8)
    got = np.asarray(tf.ycc_to_rgb(jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr)))

    def fix(x):
        return int(x * 65536 + 0.5)

    yi = y.astype(np.int64)
    cbi = cb.astype(np.int64) - 128
    cri = cr.astype(np.int64) - 128
    r = yi + ((fix(1.40200) * cri + 32768) >> 16)
    b = yi + ((fix(1.77200) * cbi + 32768) >> 16)
    g = yi + ((-fix(0.34414) * cbi - fix(0.71414) * cri + 32768) >> 16)
    want = np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)
    assert np.array_equal(got, want)


def test_ycc_neutral_chroma_is_gray():
    y = np.arange(256, dtype=np.uint8).reshape(16, 16)
    c = np.full((16, 16), 128, dtype=np.uint8)
    got = np.asarray(tf.ycc_to_rgb(jnp.asarray(y), jnp.asarray(c), jnp.asarray(c)))
    assert (got[..., 0] == y).all() and (got[..., 1] == y).all() and (got[..., 2] == y).all()
