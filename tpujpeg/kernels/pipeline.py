"""Kernel-path whole-frame transform (DecodeConfig.transform_engine=
'pallas'): fused Pallas dequant+IDCT, then fused upsample+color, with
jnp fallbacks for layouts the kernels don't cover (exotic sampling
ratios, 4-component, non-fancy upsampling). Must produce byte-identical
output to transform.transform_frame — tests/test_kernels.py asserts it.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from .. import bitstream, transform as T
from ..config import DecodeConfig
from . import idct as idct_k
from . import sample_color as sc_k


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _cm_to_plane(out_cm: jnp.ndarray, hb: int, wb: int) -> jnp.ndarray:
    """[64, hb*wb] coefficient-major samples -> [hb*8, wb*8] raster."""
    return (
        out_cm.reshape(8, 8, hb, wb).transpose(2, 0, 3, 1).reshape(hb * 8, wb * 8)
    )


def _edge_pad(plane: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Pad to (h, w) replicating the bottom/right edges, so the fancy
    filters' neighbor taps in the padding region replicate libjpeg's
    edge behavior and padded outputs are discarded by the final crop."""
    return jnp.pad(
        plane, ((0, h - plane.shape[0]), (0, w - plane.shape[1])), mode="edge"
    )


@functools.lru_cache(maxsize=128)
def _build(key: Tuple, idct_variant: str, fancy: bool, interpret: bool):
    height, width, comps = key
    frame = bitstream.Frame(
        progressive=False,
        precision=8,
        height=height,
        width=width,
        components=[
            bitstream.Component(index=i, cid=i, h=h, v=v, tq=0)
            for i, (h, v, *_rest) in enumerate(comps)
        ],
    )
    frame.finalize()

    expansions = [
        (frame.hmax // c.h, frame.vmax // c.v) for c in frame.components
    ]

    def fn(coeffs: Sequence[jnp.ndarray], qtabs: Sequence[jnp.ndarray]):
        planes: List[jnp.ndarray] = []
        for ci, c in enumerate(frame.components):
            if idct_variant == "matmul":
                samples = idct_k.dequant_idct_matmul(coeffs[ci], qtabs[ci])
                plane = T.blocks_to_plane(samples, c.padded_hb, c.padded_wb)
            else:
                nb = c.padded_hb * c.padded_wb
                pad = (-nb) % idct_k.LANE_TILE
                cm = jnp.pad(coeffs[ci], ((0, pad), (0, 0))).T
                out_cm = idct_k.dequant_idct_islow_cm(
                    cm, qtabs[ci], interpret=interpret
                )
                plane = _cm_to_plane(out_cm[:, :nb], c.padded_hb, c.padded_wb)
            planes.append(plane[: c.dheight, : c.dwidth])

        if frame.n_components == 1:
            return planes[0][: frame.height, : frame.width]

        if frame.n_components == 3 and fancy:
            y, cb, cr = planes
            if expansions == [(1, 1), (2, 2), (2, 2)]:
                hc = _round_up(cb.shape[0], sc_k.ROW_TILE)
                wc = _round_up(cb.shape[1], 128)
                rgb = sc_k.upsample_color_h2v2(
                    _edge_pad(y, 2 * hc, 2 * wc),
                    _edge_pad(cb, hc, wc),
                    _edge_pad(cr, hc, wc),
                    interpret=interpret,
                )
            elif expansions == [(1, 1), (2, 1), (2, 1)]:
                h = _round_up(cb.shape[0], sc_k.ROW_TILE)
                wc = _round_up(cb.shape[1], 128)
                rgb = sc_k.upsample_color_h2v1(
                    _edge_pad(y, h, 2 * wc),
                    _edge_pad(cb, h, wc),
                    _edge_pad(cr, h, wc),
                    interpret=interpret,
                )
            elif expansions == [(1, 1), (1, 1), (1, 1)]:
                h = _round_up(y.shape[0], sc_k.ROW_TILE)
                w = _round_up(y.shape[1], 128)
                rgb = sc_k.color_444(
                    _edge_pad(y, h, w),
                    _edge_pad(cb, h, w),
                    _edge_pad(cr, h, w),
                    interpret=interpret,
                )
            else:
                rgb = None
            if rgb is not None:
                return rgb[:, : frame.height, : frame.width].transpose(1, 2, 0)

        # jnp fallback: replicate transform_frame's tail exactly.
        ups = []
        for ci, c in enumerate(frame.components):
            he, ve = expansions[ci]
            up = T.upsample_component(planes[ci], he, ve, fancy=fancy)
            ups.append(up[: frame.height, : frame.width])
        if frame.n_components == 3:
            return T.ycc_to_rgb(ups[0], ups[1], ups[2])
        return jnp.stack(ups, axis=-1)

    return jax.jit(fn)


def transform_frame(
    frame: bitstream.Frame,
    coeffs: Sequence,
    qtabs: Sequence,
    config: DecodeConfig,
):
    key = (
        frame.height,
        frame.width,
        tuple((c.h, c.v) for c in frame.components),
    )
    interpret = jax.default_backend() != "tpu"
    fn = _build(key, config.idct, config.fancy_upsampling, interpret)
    return fn(
        [jnp.asarray(c) for c in coeffs], [jnp.asarray(q) for q in qtabs]
    )
