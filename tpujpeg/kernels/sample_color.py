"""Fused chroma-upsample + YCbCr->RGB Pallas kernels (SURVEY.md §2.1
components 15-16 as one device pass; §7.1 M1).

Strip-parallel, **phase-separated** formulation: Mosaic has no cheap
lane/sublane interleave (stack+reshape does not lower), so the kernel
never interleaves. For h2v2 it computes the four output phases
(even/odd row x even/odd col of the x2 upsampled grid) as four
same-shape elementwise arrays — neighbor taps are whole-array shifts
expressed with concatenate, which lowers cleanly — converts each phase
to RGB against the matching phase of the luma plane, and writes
[4, T, W] phase stacks. One XLA transpose outside the kernel performs
the 2x2 interleave on uint8 output. Vertical strip halos arrive through
8-row halo BlockSpecs (Mosaic-legal) whose edge row is selected
in-kernel; global edges replicate, matching libjpeg.

All kernels are batched: inputs carry a leading image axis and the grid
is (image, strip), so a whole same-geometry bucket decodes in ONE
device dispatch (SURVEY.md §3.5 batching; dispatch round-trips are
expensive on tunneled runtimes). Single-image wrappers pass N=1.

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


def _pick_tile(width: int) -> int:
    """Strip height scaled so the kernel's VMEM working set stays
    bounded for wide images (blocks span the full row width)."""
    t = ROW_TILE
    while t > 8 and t * width > 131072:
        t //= 2
    return t

_FIX_R_CR = T._fix(1.40200)
_FIX_B_CB = T._fix(1.77200)
_FIX_G_CB = -T._fix(0.34414)
_FIX_G_CR = -T._fix(0.71414)


def _color_i32(y, cb, cr):
    """int32 arrays -> (r, g, b) int32 clipped to [0, 255]; jdcolor.c
    fixed point. Stays in int32: a uint8 round-trip here costs a byte
    pack + unpack relayout per component per phase (12 per phase pair)
    before the u16 word pack that follows."""
    yi = y.astype(jnp.int32)
    cbi = cb - 128
    cri = cr - 128
    r = yi + ((_FIX_R_CR * cri + T.ONE_HALF) >> T.SCALEBITS)
    b = yi + ((_FIX_B_CB * cbi + T.ONE_HALF) >> T.SCALEBITS)
    g = yi + ((_FIX_G_CB * cbi + _FIX_G_CR * cri + T.ONE_HALF) >> T.SCALEBITS)
    clip = lambda v: jnp.clip(v, 0, 255)
    return clip(r), clip(g), clip(b)


def _color(y, cb, cr):
    """int32 arrays -> (r, g, b) uint8; jdcolor.c fixed point."""
    return tuple(v.astype(jnp.uint8) for v in _color_i32(y, cb, cr))


def _left(v):
    return jnp.concatenate([v[:, :1], v[:, :-1]], axis=1)


def _right(v):
    return jnp.concatenate([v[:, 1:], v[:, -1:]], axis=1)


def _color_u16pair(y_e, y_o, cb_e, cb_o, cr_e, cr_o):
    """RGB for an (even col, odd col) phase pair, packed per component
    as uint16 words (low byte = even column). The pack costs three
    integer ops in registers here; done outside the kernel it is a
    full extra HBM pass over the RGB (the old stack + u16-pack stages,
    ~half the measured color-tail time)."""
    out = []
    for e, o in zip(
        _color_i32(y_e, cb_e, cr_e), _color_i32(y_o, cb_o, cr_o)
    ):
        out.append((e | (o << 8)).astype(jnp.uint16))
    return out  # [r16, g16, b16]


def _kernel_h2v2(y_ref, cbc_ref, cba_ref, cbb_ref, crc_ref, cra_ref, crb_ref,
                 out_ref):
    """One strip of one image: T2 chroma rows + 8-row halo blocks ->
    [3, T2, 2*Wc] uint16 column-packed RGB. Output-row parity lives in
    the Wc-wide COLUMN HALVES of the minor dim (parity p, word w at
    column p*Wc+w): (t, p*Wc+w) linearizes to t*2Wc + p*Wc + w =
    (2t+p)*Wc + w, so the post-kernel row interleave is still a pure
    reshape to [3, 2*T2, Wc] — and unlike the earlier [T2, 2, Wc] form
    the block's minor dims (T2, 2Wc) tile cleanly onto (8, 128); the
    size-2 sublane dim cost ~45% of the kernel's runtime in padded
    stores (round-3 probe tools/color_probe.py).
    y_ref: [1, 4, T2, Wc] phase-split."""
    t2 = cbc_ref.shape[1]
    wc = cbc_ref.shape[2]
    i = pl.program_id(1)
    n = pl.num_programs(1)

    def phases(c_ref, a_ref, b_ref_):
        c = c_ref[0].astype(jnp.int32)
        above_row = jnp.where(
            i > 0, a_ref[0, 7:8].astype(jnp.int32), c[0:1]
        )
        below_row = jnp.where(
            i < n - 1, b_ref_[0, 0:1].astype(jnp.int32), c[t2 - 1 : t2]
        )
        above = jnp.concatenate([above_row, c[:-1]], axis=0)
        below = jnp.concatenate([c[1:], below_row], axis=0)
        v0 = 3 * c + above  # feeds output rows 2t
        v1 = 3 * c + below  # feeds output rows 2t+1
        # Column phases (jdsample.c h2v2 biases 8/7, shift 4).
        ee = (3 * v0 + _left(v0) + 8) >> 4
        eo = (3 * v0 + _right(v0) + 7) >> 4
        oe = (3 * v1 + _left(v1) + 8) >> 4
        oo = (3 * v1 + _right(v1) + 7) >> 4
        return ee, eo, oe, oo

    cb4 = phases(cbc_ref, cba_ref, cbb_ref)
    cr4 = phases(crc_ref, cra_ref, crb_ref)
    # Phase order in y_ref matches _phase_split(y, 2, 2): (row, col) =
    # (e,e), (e,o), (o,e), (o,o).
    for rp, (pe, po) in enumerate(((0, 1), (2, 3))):
        rgb = _color_u16pair(
            y_ref[0, pe], y_ref[0, po],
            cb4[pe], cb4[po], cr4[pe], cr4[po],
        )
        for c in range(3):
            out_ref[0, c, :, pl.ds(rp * wc, wc)] = rgb[c]


def _kernel_h2v1(y_ref, cb_ref, cr_ref, out_ref):
    """One strip of T rows; two column phases (biases 1/2, shift 2) ->
    [3, T, Wc] uint16 column-packed RGB."""
    cb = cb_ref[0].astype(jnp.int32)
    cr = cr_ref[0].astype(jnp.int32)
    cb2 = ((3 * cb + _left(cb) + 1) >> 2, (3 * cb + _right(cb) + 2) >> 2)
    cr2 = ((3 * cr + _left(cr) + 1) >> 2, (3 * cr + _right(cr) + 2) >> 2)
    rgb = _color_u16pair(
        y_ref[0, 0], y_ref[0, 1], cb2[0], cb2[1], cr2[0], cr2[1]
    )
    for c in range(3):
        out_ref[0, c] = rgb[c]


def _kernel_444(y_ref, cb_ref, cr_ref, out_ref):
    r, g, b = _color(
        y_ref[0], cb_ref[0].astype(jnp.int32), cr_ref[0].astype(jnp.int32)
    )
    out_ref[0, 0] = r
    out_ref[0, 1] = g
    out_ref[0, 2] = b


def _phase_split(y: jnp.ndarray, ph: int, pw: int) -> jnp.ndarray:
    """[N, ph*H, pw*W] -> [N, ph*pw, H, W]: phase (a, b) = y[:, a::ph, b::pw].

    Column phases come from a uint16 bitcast (low byte = even column)
    instead of a transpose with a trailing length-2 minor dim — XLA
    tile-pads such a dim 2 -> 128 when it materializes the copy (a 16 GiB
    temp for a 16K luma plane). Row phases are mid-dim slices (no minor
    padding)."""
    n = y.shape[0]
    h, w = y.shape[1] // ph, y.shape[2] // pw
    if pw == 2:
        pairs = jax.lax.bitcast_convert_type(
            y.reshape(n, y.shape[1], w, 2), jnp.uint16
        )  # [n, ph*H, W]
        even = (pairs & 0xFF).astype(jnp.uint8)
        odd = (pairs >> 8).astype(jnp.uint8)
        cols = [even, odd]
    else:
        cols = [y]
    phases = []
    for a in range(ph):
        for b in range(pw):
            plane = cols[b] if pw == 2 else cols[0]
            phases.append(plane.reshape(n, h, ph, w)[:, :, a])
    return jnp.stack(phases, axis=1)


def _unpack_cols(packed: jnp.ndarray) -> jnp.ndarray:
    """[..., W] uint16 column-packed (low byte = even col) -> [..., 2W]
    uint8. A bitcast + contiguous merge: free (little-endian byte order
    puts the even column first)."""
    u8 = jax.lax.bitcast_convert_type(packed, jnp.uint8)
    return u8.reshape(*packed.shape[:-1], packed.shape[-1] * 2)


@functools.partial(
    jax.jit, static_argnames=("interpret", "packed_words")
)
def upsample_color_h2v2_batch(y, cb, cr, interpret: bool = False,
                              packed_words: bool = False):
    """y: uint8[N, 2Hc, 2Wc]; cb, cr: uint8[N, Hc, Wc]. Hc a multiple of
    ROW_TILE, Wc of 128 (caller edge-pads). Returns uint8[N, 3, 2Hc, 2Wc],
    or with packed_words the kernel's column-packed uint16
    [N, 3, 2Hc, Wc] whose little-endian BYTES are exactly the planar u8
    raster — consumers bitcast for free, and the chain skips the u16->u8
    retiling copy XLA otherwise materializes."""
    n, hc, wc = cb.shape
    assert hc % ROW_TILE == 0 and y.shape == (n, 2 * hc, 2 * wc), (y.shape, cb.shape)
    t2 = _pick_tile(wc)
    grid = (n, hc // t2)
    y4 = _phase_split(y, 2, 2)  # [N, 4, Hc, Wc]

    center = pl.BlockSpec(
        (1, t2, wc), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    # Halo blocks: 8-row windows (Mosaic-legal) whose edge row is the
    # strip's vertical neighbor; clamped at the image edges (the kernel
    # replicates its own edge row there instead).
    n8 = t2 // 8
    above = pl.BlockSpec(
        (1, 8, wc), lambda b, i: (b, jnp.maximum(i * n8 - 1, 0), 0),
        memory_space=pltpu.VMEM,
    )
    below = pl.BlockSpec(
        (1, 8, wc), lambda b, i: (b, jnp.minimum((i + 1) * n8, hc // 8 - 1), 0),
        memory_space=pltpu.VMEM,
    )
    pspec = pl.BlockSpec(
        (1, 4, t2, wc), lambda b, i: (b, 0, i, 0), memory_space=pltpu.VMEM
    )
    ospec = pl.BlockSpec(
        (1, 3, t2, 2 * wc), lambda b, i: (b, 0, i, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        _kernel_h2v2,
        grid=grid,
        in_specs=[pspec, center, above, below, center, above, below],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((n, 3, hc, 2 * wc), jnp.uint16),
        interpret=interpret,
    )(y4, cb, cb, cb, cr, cr, cr)
    # Row interleave: row parity sits in the minor dim's column halves
    # (kernel layout), so this is a pure reshape; the column unpack is
    # a bitcast+merge. The old path paid a 1.6 GB transposed copy here.
    rows = out.reshape(n, 3, 2 * hc, wc)
    if packed_words:
        return rows
    return _unpack_cols(rows)


@functools.partial(
    jax.jit, static_argnames=("interpret", "packed_words")
)
def upsample_color_h2v1_batch(y, cb, cr, interpret: bool = False,
                              packed_words: bool = False):
    """y: uint8[N, H, 2Wc]; cb, cr: uint8[N, H, Wc], H mult of ROW_TILE.
    packed_words: as upsample_color_h2v2_batch."""
    n, h, wc = cb.shape
    assert h % ROW_TILE == 0 and y.shape == (n, h, 2 * wc)
    t = _pick_tile(wc)
    grid = (n, h // t)
    y2 = _phase_split(y, 1, 2)  # [N, 2, H, Wc]
    cspec = pl.BlockSpec(
        (1, t, wc), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    pspec = pl.BlockSpec(
        (1, 2, t, wc), lambda b, i: (b, 0, i, 0), memory_space=pltpu.VMEM
    )
    ospec = pl.BlockSpec(
        (1, 3, t, wc), lambda b, i: (b, 0, i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _kernel_h2v1,
        grid=grid,
        in_specs=[pspec, cspec, cspec],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((n, 3, h, wc), jnp.uint16),
        interpret=interpret,
    )(y2, cb, cr)
    if packed_words:
        return out
    return _unpack_cols(out)  # no row phases: unpack alone finishes


@functools.partial(jax.jit, static_argnames=("interpret",))
def color_444_batch(y, cb, cr, interpret: bool = False):
    """Full-resolution planes [N, H, W] -> [N, 3, H, W]. H mult of ROW_TILE."""
    n, h, w = y.shape
    assert h % ROW_TILE == 0
    t = _pick_tile(w)
    grid = (n, h // t)
    spec = pl.BlockSpec(
        (1, t, w), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    ospec = pl.BlockSpec(
        (1, 3, t, w), lambda b, i: (b, 0, i, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _kernel_444,
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((n, 3, h, w), jnp.uint8),
        interpret=interpret,
    )(y, cb, cr)


# Single-image wrappers (N=1), keeping the original API.


def upsample_color_h2v2(y, cb, cr, interpret: bool = False):
    return upsample_color_h2v2_batch(
        y[None], cb[None], cr[None], interpret=interpret
    )[0]


def upsample_color_h2v1(y, cb, cr, interpret: bool = False):
    return upsample_color_h2v1_batch(
        y[None], cb[None], cr[None], interpret=interpret
    )[0]


def color_444(y, cb, cr, interpret: bool = False):
    return color_444_batch(y[None], cb[None], cr[None], interpret=interpret)[0]
