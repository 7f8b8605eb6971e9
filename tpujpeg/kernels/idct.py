"""Fused dequant + un-zigzag + 8x8 IDCT + level-shift/clamp Pallas kernel
(SURVEY.md §2.1 components 11-14 as ONE device pass; §7.1 M1).

TPU-first layout: coefficients are processed **coefficient-major** as
[64, N] — one *lane* per 8x8 block, one sublane row per coefficient
position. Every butterfly of the libjpeg islow IDCT then becomes a
row-wise elementwise op at full VPU width with zero intra-lane shuffles;
the only data movement is the two static sublane regroupings inherent to
a separable 2-D transform. This replaces the reference's one-OpenCL-work-
item-per-block NDRange formulation (SURVEY.md §1 L2) with the lane-per-
block vector formulation.

Bit-exactness: identical int32 arithmetic to transform.idct8x8_islow
(libjpeg jidctint.c constants), so kernel output == jnp reference ==
libjpeg, byte for byte. Verified by tests/test_kernels.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..bitstream import NATURAL_TO_ZIGZAG
from .. import transform as T

# Lane-dimension tile: blocks per grid step.
LANE_TILE = 1024

_NAT2ZZ = [int(x) for x in NATURAL_TO_ZIGZAG]


def _idct_rows(s, descale_bits):
    """transform._idct_1d on [8, T] row groups (same arithmetic)."""
    return T._idct_1d(s, descale_bits)


def _kernel(q_ref, c_ref, o_ref):
    """q_ref: SMEM int32[64] zigzag-order quantizer.
    c_ref: VMEM int32[64, T] zigzag-order coefficients (lane = block).
    o_ref: VMEM uint8[64, T] natural-order samples (+128, clamped)."""
    # Dequant + un-zigzag: natural row n comes from zigzag row zz(n),
    # scaled by q[zz(n)]. Static row indices -> pure sublane selects.
    deq = [c_ref[_NAT2ZZ[n], :] * q_ref[_NAT2ZZ[n]] for n in range(64)]

    # Pass 1 (columns): frequency i feeds natural rows i*8+c, c=0..7.
    # Group as 8 stacked [8, T] arrays; the butterfly runs across all
    # 8 columns x T blocks at once.
    s = [jnp.stack(deq[i * 8 : (i + 1) * 8], axis=0) for i in range(8)]
    ws = _idct_rows(s, T.CONST_BITS - T.PASS1_BITS)
    # ws[r][c] = workspace at spatial row r, column c: shape [8(c), T].

    # Pass 2 (rows): for output row r, frequency c sits at ws[r][c].
    # Regroup so each frequency c is an [8(r), T] array.
    s2 = [jnp.stack([ws[r][c, :] for r in range(8)], axis=0) for c in range(8)]
    o = _idct_rows(s2, T.CONST_BITS + T.PASS1_BITS + 3)
    # o[j][r] = output sample at row r, column j: shape [8(r), T].

    for r in range(8):
        for j in range(8):
            v = jnp.clip(o[j][r, :] + 128, 0, 255)
            o_ref[r * 8 + j, :] = v.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def dequant_idct_islow_cm(
    coeffs_cm: jnp.ndarray, qtab_zz: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Coefficient-major fused transform.

    coeffs_cm: int32[64, N] zigzag-order coefficients, N a multiple of
    LANE_TILE (caller pads). qtab_zz: int32[64]. Returns uint8[64, N]
    natural-order samples, where row r*8+j is pixel (r, j) of each block.
    """
    n = coeffs_cm.shape[1]
    assert n % LANE_TILE == 0, n
    grid = (n // LANE_TILE,)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((64, LANE_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (64, LANE_TILE), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((64, n), jnp.uint8),
        interpret=interpret,
    )(qtab_zz, coeffs_cm)


def dequant_idct_islow(
    coeffs_zz: jnp.ndarray, qtab_zz: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Block-major convenience wrapper matching the jnp reference API:
    int32[N, 64] zigzag coefficients -> uint8[N, 8, 8] samples."""
    n = coeffs_zz.shape[0]
    pad = (-n) % LANE_TILE
    cm = jnp.pad(coeffs_zz, ((0, pad), (0, 0))).T
    out_cm = dequant_idct_islow_cm(cm, qtab_zz, interpret=interpret)
    return out_cm.T[:n].reshape(n, 8, 8)


# ---------------------------------------------------------------------------
# MXU matmul variant (config idct='matmul'): dequant + zigzag + IDCT as
# one [N,64] @ [64,64] matmul — libjpeg-conformant tolerance, not
# bit-exact (float basis), SURVEY.md §2.1 #13 "matmul-form".
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _idct_matrix_zz() -> np.ndarray:
    """M[k, n]: contribution of zigzag coefficient k to natural pixel n,
    i.e. the 64x64 Kronecker IDCT basis with the zigzag permutation
    folded into the rows (so inputs stay in zigzag order)."""
    c = np.zeros((8, 8), dtype=np.float64)  # c[u, x] = basis
    for u in range(8):
        a = np.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            c[u, x] = a * np.cos((2 * x + 1) * u * np.pi / 16.0)
    # pixel (x, y) = sum_{u,v} C[u,x] C[v,y] F[u,v];  natural n = x*8+y,
    # natural freq m = u*8+v -> M_nat[m, n] = C[u,x]*C[v,y].
    m_nat = np.einsum("ux,vy->uvxy", c, c).reshape(64, 64)
    # Fold zigzag: input row k holds natural frequency ZIGZAG[k].
    from ..bitstream import ZIGZAG

    return m_nat[np.asarray(ZIGZAG)].astype(np.float32)


def dequant_idct_matmul(
    coeffs_zz: jnp.ndarray, qtab_zz: jnp.ndarray
) -> jnp.ndarray:
    """MXU path: int32[N, 64] zigzag coeffs -> uint8[N, 8, 8]."""
    m = jnp.asarray(_idct_matrix_zz())
    deq = (coeffs_zz * qtab_zz).astype(jnp.float32)
    pix = jax.lax.dot_general(
        deq, m, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    out = jnp.round(pix) + 128
    return jnp.clip(out, 0, 255).astype(jnp.uint8).reshape(-1, 8, 8)
