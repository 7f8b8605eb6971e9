"""Fine-grained cost split of the fused upsample/color stage (h2v2),
measured on staged synthetic planes so the wavefront kernel stays out
of the picture. Stages (each ends in a small checksum; differences
isolate one op):

  S0  checksum of the inputs only (baseline readback cost)
  S1  _phase_split(y) alone
  S2  + the h2v2 Pallas kernel (u16 column-packed phase output)
  S3  + row-interleave transpose
  S4  + column unpack (the full upsample_color_h2v2_batch)
  S5  S4 + NHWC transpose + crop (what _color_stage returns)

One JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main() -> int:
    size = int(os.environ.get("BENCH_SIZE", "2048"))
    nimg = int(os.environ.get("BENCH_BATCH", "64"))
    total_mp = size * size * nimg / 1e6

    import jax
    import jax.numpy as jnp
    from tpujpeg.kernels import sample_color as sc

    interpret = jax.default_backend() != "tpu"
    rng = np.random.default_rng(0)
    hc = size // 2
    y = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (nimg, size, size), dtype=np.uint8)))
    cb = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (nimg, hc, hc), dtype=np.uint8)))
    cr = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (nimg, hc, hc), dtype=np.uint8)))
    _ = np.asarray(y)[:1, :1, :1]

    t2 = sc._pick_tile(hc)

    def run_kernel(y4, cbp, crp):
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        n = nimg
        wc = hc
        grid = (n, hc // t2)
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
            (1, 4, t2, wc), lambda b, i: (b, 0, i, 0),
            memory_space=pltpu.VMEM,
        )
        ospec = pl.BlockSpec(
            (1, 3, 2, t2, wc), lambda b, i: (b, 0, 0, i, 0),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            sc._kernel_h2v2,
            grid=grid,
            in_specs=[pspec, center, above, below, center, above, below],
            out_specs=ospec,
            out_shape=jax.ShapeDtypeStruct((n, 3, 2, hc, wc), jnp.uint16),
            interpret=interpret,
        )(y4, cbp, cbp, cbp, crp, crp, crp)

    def cks(x):
        # Plain reduction: strided u8 slices in checksums OOM HBM on
        # this backend (CLAUDE.md gotcha).
        return jnp.sum(x.astype(jnp.int32))

    @jax.jit
    def s0(y, cb, cr):
        return cks(y) + cks(cb) + cks(cr)

    @jax.jit
    def s1(y, cb, cr):
        y4 = sc._phase_split(y, 2, 2)
        return jnp.sum(y4.astype(jnp.int32)) + cks(cb) + cks(cr)

    @jax.jit
    def s2(y, cb, cr):
        y4 = sc._phase_split(y, 2, 2)
        out = run_kernel(y4, cb, cr)
        return jnp.sum(out.astype(jnp.int64) & 0xFF)

    @jax.jit
    def s3(y, cb, cr):
        y4 = sc._phase_split(y, 2, 2)
        out = run_kernel(y4, cb, cr)
        rows = out.transpose(0, 1, 3, 2, 4).reshape(nimg, 3, size, hc)
        return jnp.sum(rows.astype(jnp.int64) & 0xFF)

    @jax.jit
    def s4(y, cb, cr):
        rgb = sc.upsample_color_h2v2_batch(y, cb, cr, interpret=interpret)
        return jnp.sum(rgb.astype(jnp.int32))

    @jax.jit
    def s5(y, cb, cr):
        rgb = sc.upsample_color_h2v2_batch(y, cb, cr, interpret=interpret)
        nhwc = rgb.transpose(0, 2, 3, 1)
        return jnp.sum(nhwc.astype(jnp.int32))

    def timed(fn):
        v = fn(y, cb, cr)
        _ = int(v)
        times = []
        for _i in range(3):
            t0 = time.perf_counter()
            v = fn(y, cb, cr)
            _ = int(v)
            times.append(time.perf_counter() - t0)
        return round(min(times), 4)

    res = {
        "total_mp": total_mp,
        "S0_inputs": timed(s0),
        "S1_phase_split": timed(s1),
        "S2_plus_kernel": timed(s2),
        "S3_plus_row_transpose": timed(s3),
        "S4_full": timed(s4),
        "S5_plus_nhwc": timed(s5),
    }
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())
