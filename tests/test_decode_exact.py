"""Integration: full decode must be bit-exact vs PIL/libjpeg-turbo
(SURVEY.md §4 integration row; BASELINE.json:5 correctness bar). Covers
all BASELINE.json config variants that fit in unit-test time: 4:2:0 /
4:2:2 / 4:4:4, progressive, restart intervals, grayscale, odd sizes."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
from corpus import make_jpeg, pil_decode  # noqa: E402

import tpujpeg  # noqa: E402

PY_CFG = tpujpeg.DecodeConfig(entropy_engine="python")

CASES = [
    # (name, kwargs) — BASELINE.json:7 config-1 style and variants.
    ("420_base", dict(w=64, h=48, subsampling=2)),
    ("422_base", dict(w=64, h=48, subsampling=1)),
    ("444_base", dict(w=64, h=48, subsampling=0)),
    ("420_prog", dict(w=64, h=48, subsampling=2, progressive=True)),
    ("422_prog", dict(w=64, h=48, subsampling=1, progressive=True)),
    ("444_prog", dict(w=64, h=48, subsampling=0, progressive=True)),
    ("odd_dims_q95", dict(w=67, h=45, subsampling=2, quality=95)),
    ("odd_dims_q50_422", dict(w=67, h=45, subsampling=1, quality=50)),
    ("tiny_8x8", dict(w=8, h=8, subsampling=2)),
    ("tiny_1x1", dict(w=1, h=1, subsampling=0)),
    ("restart_blocks", dict(w=129, h=65, subsampling=2, restart_blocks=16)),
    ("restart_rows", dict(w=129, h=65, subsampling=2, restart_rows=1)),
    ("gray", dict(w=64, h=48, mode="L")),
    ("prog_restart", dict(w=64, h=48, subsampling=2, progressive=True, restart_blocks=8)),
    ("noise_q92", dict(w=80, h=80, subsampling=2, kind="noise", quality=92)),
    ("flat", dict(w=80, h=80, subsampling=0, kind="flat")),
]


@pytest.mark.parametrize("name,kw", CASES, ids=[c[0] for c in CASES])
def test_bit_exact_vs_pil(name, kw):
    data = make_jpeg(seed=hash(name) % 1000, **kw)
    ours = tpujpeg.decode(data, PY_CFG)
    ref = pil_decode(data)
    assert ours.shape == ref.shape
    assert ours.dtype == ref.dtype
    np.testing.assert_array_equal(ours, ref)


def test_decode_stats():
    data = make_jpeg(64, 48, subsampling=2, restart_blocks=4)
    out, stats = tpujpeg.decode(data, PY_CFG, return_stats=True)
    assert stats.width == 64 and stats.height == 48
    assert stats.n_segments > 1
    assert stats.entropy_engine == "python"
    assert stats.megapixels == pytest.approx(64 * 48 / 1e6)


def test_decode_returns_numpy_uint8():
    data = make_jpeg(32, 32)
    out = tpujpeg.decode(data, PY_CFG)
    assert isinstance(out, np.ndarray)
    assert out.dtype == np.uint8
    assert out.shape == (32, 32, 3)
