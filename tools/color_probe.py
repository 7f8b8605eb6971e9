"""Round-3 color-tail probe: the packed16 color stage measured 42 ms /
537 MP in the bench chain (chip_profile D-B) — ~10x HBM speed-of-light
for its ~2.4 GB of traffic. Times each piece on staged synthetic planes
and A/B-tests output layouts:

  P0  input checksum baseline
  P1  _phase_split(y) alone
  K_cur   current kernel: out [N,3,hc,2,wc] u16 (size-2 sublane dim)
  K_cols  variant: out [N,3,hc,2*wc] u16, parity in wc column halves
          (well-tiled (t2, 2wc) minor dims; same linearization, so the
          row interleave stays a free reshape)

Env: BENCH_SIZE, BENCH_BATCH, T2 (strip tile override).
One JSON line.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main() -> int:
    size = int(os.environ.get("BENCH_SIZE", "2048"))
    nimg = int(os.environ.get("BENCH_BATCH", "128"))
    total_mp = size * size * nimg / 1e6

    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from tpujpeg.kernels import sample_color as sc

    interpret = jax.default_backend() != "tpu"
    rng = np.random.default_rng(0)
    hc = size // 2
    wc = hc
    y = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (nimg, size, size), dtype=np.uint8)))
    cb = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (nimg, hc, wc), dtype=np.uint8)))
    cr = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (nimg, hc, wc), dtype=np.uint8)))
    _ = np.asarray(y)[:1, :1, :1]

    t2 = int(os.environ.get("T2", sc._pick_tile(wc)))
    center = pl.BlockSpec(
        (1, t2, wc), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    n8 = t2 // 8
    above = pl.BlockSpec(
        (1, 8, wc), lambda b, i: (b, jnp.maximum(i * n8 - 1, 0), 0),
        memory_space=pltpu.VMEM,
    )
    below = pl.BlockSpec(
        (1, 8, wc),
        lambda b, i: (b, jnp.minimum((i + 1) * n8, hc // 8 - 1), 0),
        memory_space=pltpu.VMEM,
    )
    pspec = pl.BlockSpec(
        (1, 4, t2, wc), lambda b, i: (b, 0, i, 0), memory_space=pltpu.VMEM
    )

    def run_cur(y4, cbp, crp):
        # The landed module kernel (column-halves layout since a9a99aa).
        n = cbp.shape[0]
        ospec = pl.BlockSpec(
            (1, 3, t2, 2 * wc), lambda b, i: (b, 0, i, 0),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            sc._kernel_h2v2,
            grid=(n, hc // t2),
            in_specs=[pspec, center, above, below, center, above, below],
            out_specs=ospec,
            out_shape=jax.ShapeDtypeStruct((n, 3, hc, 2 * wc), jnp.uint16),
            interpret=interpret,
        )(y4, cbp, cbp, cbp, crp, crp, crp)

    def _kernel_h2v2_cols(y_ref, cbc_ref, cba_ref, cbb_ref, crc_ref,
                          cra_ref, crb_ref, out_ref):
        t2_ = cbc_ref.shape[1]
        i = pl.program_id(1)
        nprog = pl.num_programs(1)

        def phases(c_ref, a_ref, b_ref_):
            c = c_ref[0].astype(jnp.int32)
            above_row = jnp.where(
                i > 0, a_ref[0, 7:8].astype(jnp.int32), c[0:1]
            )
            below_row = jnp.where(
                i < nprog - 1, b_ref_[0, 0:1].astype(jnp.int32),
                c[t2_ - 1: t2_]
            )
            ab = jnp.concatenate([above_row, c[:-1]], axis=0)
            be = jnp.concatenate([c[1:], below_row], axis=0)
            v0 = 3 * c + ab
            v1 = 3 * c + be
            ee = (3 * v0 + sc._left(v0) + 8) >> 4
            eo = (3 * v0 + sc._right(v0) + 7) >> 4
            oe = (3 * v1 + sc._left(v1) + 8) >> 4
            oo = (3 * v1 + sc._right(v1) + 7) >> 4
            return ee, eo, oe, oo

        cb4 = phases(cbc_ref, cba_ref, cbb_ref)
        cr4 = phases(crc_ref, cra_ref, crb_ref)
        for rp, (pe, po) in enumerate(((0, 1), (2, 3))):
            rgb = sc._color_u16pair(
                y_ref[0, pe], y_ref[0, po],
                cb4[pe], cb4[po], cr4[pe], cr4[po],
            )
            for c in range(3):
                out_ref[0, c, :, pl.ds(rp * wc, wc)] = rgb[c]

    def run_cols(y4, cbp, crp):
        n = cbp.shape[0]
        ospec = pl.BlockSpec(
            (1, 3, t2, 2 * wc), lambda b, i: (b, 0, i, 0),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            _kernel_h2v2_cols,
            grid=(n, hc // t2),
            in_specs=[pspec, center, above, below, center, above, below],
            out_specs=ospec,
            out_shape=jax.ShapeDtypeStruct((n, 3, hc, 2 * wc), jnp.uint16),
            interpret=interpret,
        )(y4, cbp, cbp, cbp, crp, crp, crp)

    def _kernel_h2v2_fused(yp_ref, cbc_ref, cba_ref, cbb_ref, crc_ref,
                           cra_ref, crb_ref, out_ref):
        """yp_ref: (1, 2*t2, wc) uint16 — the raw luma rows bitcast to
        column pairs (low byte = even col). Row phases via mid-dim
        reshape-slice (lowers), column phases via mask/shift
        (elementwise) — no XLA-side phase_split pass at all."""
        t2_ = cbc_ref.shape[1]
        i = pl.program_id(1)
        nprog = pl.num_programs(1)

        def phases(c_ref, a_ref, b_ref_):
            c = c_ref[0].astype(jnp.int32)
            above_row = jnp.where(
                i > 0, a_ref[0, 7:8].astype(jnp.int32), c[0:1]
            )
            below_row = jnp.where(
                i < nprog - 1, b_ref_[0, 0:1].astype(jnp.int32),
                c[t2_ - 1: t2_]
            )
            ab = jnp.concatenate([above_row, c[:-1]], axis=0)
            be = jnp.concatenate([c[1:], below_row], axis=0)
            v0 = 3 * c + ab
            v1 = 3 * c + be
            ee = (3 * v0 + sc._left(v0) + 8) >> 4
            eo = (3 * v0 + sc._right(v0) + 7) >> 4
            oe = (3 * v1 + sc._left(v1) + 8) >> 4
            oo = (3 * v1 + sc._right(v1) + 7) >> 4
            return ee, eo, oe, oo

        cb4 = phases(cbc_ref, cba_ref, cbb_ref)
        cr4 = phases(crc_ref, cra_ref, crb_ref)
        yrows = yp_ref[0].reshape(t2_, 2, wc)
        for rp, (pe, po) in enumerate(((0, 1), (2, 3))):
            yr = yrows[:, rp].astype(jnp.int32)
            y_e = yr & 0xFF
            y_o = yr >> 8
            rgb = sc._color_u16pair(
                y_e, y_o, cb4[pe], cb4[po], cr4[pe], cr4[po],
            )
            for c in range(3):
                out_ref[0, c, :, pl.ds(rp * wc, wc)] = rgb[c]

    def run_fused(y, cbp, crp):
        n = cbp.shape[0]
        yp = jax.lax.bitcast_convert_type(
            y.reshape(n, 2 * hc, wc, 2), jnp.uint16
        )  # [n, 2hc, wc]
        yspec = pl.BlockSpec(
            (1, 2 * t2, wc), lambda b, i: (b, i, 0),
            memory_space=pltpu.VMEM,
        )
        ospec = pl.BlockSpec(
            (1, 3, t2, 2 * wc), lambda b, i: (b, 0, i, 0),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            _kernel_h2v2_fused,
            grid=(n, hc // t2),
            in_specs=[yspec, center, above, below, center, above, below],
            out_specs=ospec,
            out_shape=jax.ShapeDtypeStruct((n, 3, hc, 2 * wc), jnp.uint16),
            interpret=interpret,
        )(yp, cbp, cbp, cbp, crp, crp, crp)

    def cks(x):
        return jnp.sum(x[..., -1].astype(jnp.int32))

    @jax.jit
    def p0(y, cb, cr):
        return cks(y) + cks(cb) + cks(cr)

    @jax.jit
    def p1(y, cb, cr):
        y4 = sc._phase_split(y, 2, 2)
        return cks(y4) + cks(cb) + cks(cr)

    @jax.jit
    def k_cur(y, cb, cr):
        y4 = sc._phase_split(y, 2, 2)
        out = run_cur(y4, cb, cr)
        return cks(out)

    @jax.jit
    def k_cols(y, cb, cr):
        y4 = sc._phase_split(y, 2, 2)
        out = run_cols(y4, cb, cr)
        return cks(out)

    @jax.jit
    def k_fused(y, cb, cr):
        out = run_fused(y, cb, cr)
        return cks(out)

    # yp staged on device: isolates the fused kernel from the XLA-side
    # u8->u16 bitcast pass.
    yp_staged = jax.device_put(
        jax.jit(lambda y: jax.lax.bitcast_convert_type(
            y.reshape(nimg, 2 * hc, wc, 2), jnp.uint16))(y)
    )
    _ = np.asarray(yp_staged[:1, :1, :1])

    def run_fused_pre(yp, cbp, crp):
        n = cbp.shape[0]
        yspec = pl.BlockSpec(
            (1, 2 * t2, wc), lambda b, i: (b, i, 0),
            memory_space=pltpu.VMEM,
        )
        ospec = pl.BlockSpec(
            (1, 3, t2, 2 * wc), lambda b, i: (b, 0, i, 0),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            _kernel_h2v2_fused,
            grid=(n, hc // t2),
            in_specs=[yspec, center, above, below, center, above, below],
            out_specs=ospec,
            out_shape=jax.ShapeDtypeStruct((n, 3, hc, 2 * wc), jnp.uint16),
            interpret=interpret,
        )(yp, cbp, cbp, cbp, crp, crp, crp)

    @jax.jit
    def k_fused_pre(yp, cb, cr):
        return cks(run_fused_pre(yp, cb, cr))

    def timed(fn):
        v = fn(y, cb, cr)
        _ = int(v)
        times = []
        for _i in range(3):
            t0 = time.perf_counter()
            v = fn(y, cb, cr)
            _ = int(v)
            times.append(time.perf_counter() - t0)
        s = min(times)
        return {"s": round(s, 4), "mp_per_s": round(total_mp / s, 1)}

    # Equivalence of the two layouts (same linearization).
    a = np.asarray(
        jax.jit(lambda y, cb, cr: run_cur(sc._phase_split(y, 2, 2), cb, cr))(
            y[:2], cb[:2], cr[:2])
    ).reshape(2, 3, 2 * hc, wc)
    b = np.asarray(
        jax.jit(lambda y, cb, cr: run_cols(sc._phase_split(y, 2, 2), cb, cr))(
            y[:2], cb[:2], cr[:2])
    ).reshape(2, 3, 2 * hc, wc)
    assert np.array_equal(a, b), "layout variants disagree"
    f = np.asarray(
        jax.jit(run_fused)(y[:2], cb[:2], cr[:2])
    ).reshape(2, 3, 2 * hc, wc)
    assert np.array_equal(a, f), "fused variant disagrees"

    res = {
        "total_mp": total_mp,
        "t2": t2,
        "P0_inputs": timed(p0),
        "P1_phase_split": timed(p1),
        "K_cur": timed(k_cur),
        "K_cols": timed(k_cols),
        "K_fused": timed(k_fused),
    }

    def timed_pre():
        v = k_fused_pre(yp_staged, cb, cr)
        _ = int(v)
        times = []
        for _i in range(3):
            t0 = time.perf_counter()
            v = k_fused_pre(yp_staged, cb, cr)
            _ = int(v)
            times.append(time.perf_counter() - t0)
        s = min(times)
        return {"s": round(s, 4), "mp_per_s": round(total_mp / s, 1)}

    res["K_fused_prestaged"] = timed_pre()
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())
