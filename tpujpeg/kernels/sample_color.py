"""Fused chroma-upsample + YCbCr->RGB Pallas kernels (SURVEY.md §2.1
components 15-16 as one device pass; §7.1 M1).

Strip-parallel formulation: the image is processed in horizontal strips
(grid dimension = strip index). For h2v2 the one-row vertical halos a
strip's triangular filter needs are delivered through extra BlockSpecs
whose index maps clamp at the image edge — the same replicate-edge
semantics libjpeg's fancy upsampler applies, so interior strips are
bit-exact and global edges match too. Horizontal neighbor context is
whole rows, so it lives inside the block.

Arithmetic is the same libjpeg fixed-point as transform.py (h2v1/h2v2
fancy filter biases, 16-bit color constants) — bit-exact vs the jnp
reference and therefore vs libjpeg/PIL.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import transform as T

# Chroma rows per strip (h2v2) / luma rows per strip (h2v1, 444).
ROW_TILE = 64

_FIX_R_CR = T._fix(1.40200)
_FIX_B_CB = T._fix(1.77200)
_FIX_G_CB = -T._fix(0.34414)
_FIX_G_CR = -T._fix(0.71414)


def _color_rows(y, cb, cr):
    """int32 rows -> (r, g, b) uint8 rows; jdcolor.c fixed point."""
    yi = y.astype(jnp.int32)
    cbi = cb.astype(jnp.int32) - 128
    cri = cr.astype(jnp.int32) - 128
    r = yi + ((_FIX_R_CR * cri + T.ONE_HALF) >> T.SCALEBITS)
    b = yi + ((_FIX_B_CB * cbi + T.ONE_HALF) >> T.SCALEBITS)
    g = yi + ((_FIX_G_CB * cbi + _FIX_G_CR * cri + T.ONE_HALF) >> T.SCALEBITS)
    clip = lambda v: jnp.clip(v, 0, 255).astype(jnp.uint8)
    return clip(r), clip(g), clip(b)


def _h2_cols(cs, bias_even, bias_odd, bits):
    """Horizontal x2 triangular upsample of column-sum rows [.., W2] ->
    [.., 2*W2] (same as transform._h2_fancy_cols, inlined for Pallas)."""
    left = jnp.concatenate([cs[:, :1], cs[:, :-1]], axis=1)
    right = jnp.concatenate([cs[:, 1:], cs[:, -1:]], axis=1)
    even = (3 * cs + left + bias_even) >> bits
    odd = (3 * cs + right + bias_odd) >> bits
    out = jnp.stack([even, odd], axis=-1)
    return out.reshape(cs.shape[0], cs.shape[1] * 2)


def _kernel_h2v2(y_ref, cbc_ref, cba_ref, cbb_ref, crc_ref, cra_ref, crb_ref,
                 r_ref, g_ref, b_ref):
    """One strip: T2 chroma rows + 8-row halo blocks -> 2*T2 RGB rows.

    Halo blocks are 8 rows tall (Mosaic requires sublane-divisible block
    shapes); the needed single row is selected in-kernel. At the global
    top/bottom strip the filter replicates the strip's own edge row —
    libjpeg's edge behavior."""
    t2 = cbc_ref.shape[0]
    i = pl.program_id(0)
    n = pl.num_programs(0)

    def upsample(c_ref, a_ref, b_ref_):
        c = c_ref[:].astype(jnp.int32)
        # Row above the strip: last row of the 8-row block ending at
        # i*T2-1 (only valid when i > 0); else replicate own row 0.
        above_row = jnp.where(
            i > 0, a_ref[7:8].astype(jnp.int32), c[0:1]
        )
        below_row = jnp.where(
            i < n - 1, b_ref_[0:1].astype(jnp.int32), c[t2 - 1 : t2]
        )
        above = jnp.concatenate([above_row, c[:-1]], axis=0)
        below = jnp.concatenate([c[1:], below_row], axis=0)
        cs_even = 3 * c + above  # feeds output rows 2t
        cs_odd = 3 * c + below  # feeds output rows 2t+1
        oe = _h2_cols(cs_even, 8, 7, 4)
        oo = _h2_cols(cs_odd, 8, 7, 4)
        w2 = oe.shape[1]
        return jnp.stack([oe, oo], axis=1).reshape(2 * t2, w2)

    cb_up = upsample(cbc_ref, cba_ref, cbb_ref)
    cr_up = upsample(crc_ref, cra_ref, crb_ref)
    r, g, b = _color_rows(y_ref[:], cb_up, cr_up)
    r_ref[:] = r
    g_ref[:] = g
    b_ref[:] = b


def _kernel_h2v1(y_ref, cb_ref, cr_ref, r_ref, g_ref, b_ref):
    """One strip of T luma rows; chroma is half-width, full-height."""
    cb_up = _h2_cols(cb_ref[:].astype(jnp.int32), 1, 2, 2)
    cr_up = _h2_cols(cr_ref[:].astype(jnp.int32), 1, 2, 2)
    r, g, b = _color_rows(y_ref[:], cb_up, cr_up)
    r_ref[:] = r
    g_ref[:] = g
    b_ref[:] = b


def _kernel_444(y_ref, cb_ref, cr_ref, r_ref, g_ref, b_ref):
    r, g, b = _color_rows(y_ref[:], cb_ref[:], cr_ref[:])
    r_ref[:] = r
    g_ref[:] = g
    b_ref[:] = b


@functools.partial(jax.jit, static_argnames=("interpret",))
def upsample_color_h2v2(y, cb, cr, interpret: bool = False):
    """y: uint8[2*Hc, 2*Wc]; cb, cr: uint8[Hc, Wc]. Hc a multiple of
    ROW_TILE, Wc of 128 (caller edge-pads). Returns uint8[3, 2Hc, 2Wc]."""
    hc, wc = cb.shape
    assert hc % ROW_TILE == 0 and y.shape == (2 * hc, 2 * wc), (y.shape, cb.shape)
    t2 = ROW_TILE
    grid = (hc // t2,)
    nrows = hc // t2

    center = pl.BlockSpec((t2, wc), lambda i: (i, 0), memory_space=pltpu.VMEM)
    # Halo blocks: 8-row windows (Mosaic-legal) whose edge row is the
    # strip's vertical neighbor; clamped at the global edges (the kernel
    # replicates its own edge row there instead).
    n8 = t2 // 8
    above = pl.BlockSpec(
        (8, wc), lambda i: (jnp.maximum(i * n8 - 1, 0), 0),
        memory_space=pltpu.VMEM,
    )
    below = pl.BlockSpec(
        (8, wc), lambda i: (jnp.minimum((i + 1) * n8, hc // 8 - 1), 0),
        memory_space=pltpu.VMEM,
    )
    ospec = pl.BlockSpec((2 * t2, 2 * wc), lambda i: (i, 0), memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct((2 * hc, 2 * wc), jnp.uint8)
    r, g, b = pl.pallas_call(
        _kernel_h2v2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((2 * t2, 2 * wc), lambda i: (i, 0), memory_space=pltpu.VMEM),
            center, above, below, center, above, below,
        ],
        out_specs=(ospec, ospec, ospec),
        out_shape=(oshape, oshape, oshape),
        interpret=interpret,
    )(y, cb, cb, cb, cr, cr, cr)
    return jnp.stack([r, g, b])


@functools.partial(jax.jit, static_argnames=("interpret",))
def upsample_color_h2v1(y, cb, cr, interpret: bool = False):
    """y: uint8[H, 2*Wc]; cb, cr: uint8[H, Wc], H multiple of ROW_TILE."""
    h, wc = cb.shape
    assert h % ROW_TILE == 0 and y.shape == (h, 2 * wc)
    t = ROW_TILE
    grid = (h // t,)
    ospec = pl.BlockSpec((t, 2 * wc), lambda i: (i, 0), memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct((h, 2 * wc), jnp.uint8)
    r, g, b = pl.pallas_call(
        _kernel_h2v1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((t, 2 * wc), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, wc), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, wc), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(ospec, ospec, ospec),
        out_shape=(oshape, oshape, oshape),
        interpret=interpret,
    )(y, cb, cr)
    return jnp.stack([r, g, b])


@functools.partial(jax.jit, static_argnames=("interpret",))
def color_444(y, cb, cr, interpret: bool = False):
    """Full-resolution planes -> RGB. H multiple of ROW_TILE."""
    h, w = y.shape
    assert h % ROW_TILE == 0
    t = ROW_TILE
    grid = (h // t,)
    spec = pl.BlockSpec((t, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct((h, w), jnp.uint8)
    r, g, b = pl.pallas_call(
        _kernel_444,
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=(oshape, oshape, oshape),
        interpret=interpret,
    )(y, cb, cr)
    return jnp.stack([r, g, b])
