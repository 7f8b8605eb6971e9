"""Where does the post-kernel tail really go? Times chain PREFIXES that
each RETURN their last big array (so XLA must materialize it — no
checksum-fusion mirages), synced by a tiny dependent slice readback.

  V5  kernel only                     -> per-comp int32 word tiles
  V4  + pixel assembly (stacked)      -> planes u8
  V3  + phase split of Y              -> y4 + chroma planes
  V2  + h2v2 Pallas color kernel      -> [N, 3, 2, Hc, Wc] u16
  V1r + row-interleave transpose      -> [N, 3, 2Hc, Wc] u16
  V1  + col unpack (planar RGB)       -> [N, 3, H, W] u8
  V0  + crop + NHWC transpose         -> [N, H, W, 3] u8  (current chain)

Every variant pays the same ~2 relay round-trips (dispatch + slice
sync); deltas between variants isolate one stage. One JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np


def main() -> int:
    from corpus import make_jpeg

    size = int(os.environ.get("BENCH_SIZE", "2048"))
    nimg = int(os.environ.get("BENCH_BATCH", "64"))
    rst = int(os.environ.get("BENCH_RESTART_BLOCKS", "4"))
    datas = [
        make_jpeg(size, size, seed=7 + i, quality=85, subsampling=2,
                  restart_blocks=rst)
        for i in range(nimg)
    ]
    total_mp = size * size * nimg / 1e6

    import jax
    import jax.numpy as jnp
    from tpujpeg import bitstream
    from tpujpeg.kernels import sample_color as sc
    from tpujpeg.kernels import wavefront_pallas as wp

    interpret = jax.default_backend() != "tpu"
    jpegs = [bitstream.parse(d) for d in datas]
    plan = wp.build_block_plan(jpegs)
    geoms = tuple(wp.ImageGeom.of(j) for j in jpegs)
    shape = (plan.blocks_per_mcu, plan.n_mcus, plan.n_groups)
    plan_static = plan.static_key("pixels")

    bits = jax.device_put(jnp.asarray(plan.bits))
    lane_m = jax.device_put(jnp.asarray(plan.lane_m))
    seg_bits = jax.device_put(jnp.asarray(plan.seg_bits))
    lane_q = jax.device_put(jnp.asarray(plan.lane_qset))
    _ = np.asarray(lane_m)[:1]

    def kern(b, m, s, q):
        out, err = wp.run_wavefront(
            b, m, s, plan_static, plan.n_groups, interpret, q
        )
        return out

    def v5(b, m, s, q):
        return kern(b, m, s, q)

    def v4(b, m, s, q):
        return tuple(wp.assemble_pixels_stacked(shape, kern(b, m, s, q), geoms))

    def split_y(planes):
        y, cb, cr = planes
        y4 = sc._phase_split(y, 2, 2)
        return y4, cb, cr

    def v3(b, m, s, q):
        return split_y(v4(b, m, s, q))

    def color_kernel(y4, cb, cr):
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        n, hc, wc = cb.shape
        t2 = sc._pick_tile(wc)
        grid = (n, hc // t2)
        center = pl.BlockSpec(
            (1, t2, wc), lambda bb, i: (bb, i, 0), memory_space=pltpu.VMEM
        )
        n8 = t2 // 8
        above = pl.BlockSpec(
            (1, 8, wc), lambda bb, i: (bb, jnp.maximum(i * n8 - 1, 0), 0),
            memory_space=pltpu.VMEM,
        )
        below = pl.BlockSpec(
            (1, 8, wc),
            lambda bb, i: (bb, jnp.minimum((i + 1) * n8, hc // 8 - 1), 0),
            memory_space=pltpu.VMEM,
        )
        pspec = pl.BlockSpec(
            (1, 4, t2, wc), lambda bb, i: (bb, 0, i, 0),
            memory_space=pltpu.VMEM,
        )
        ospec = pl.BlockSpec(
            (1, 3, t2, 2, wc), lambda bb, i: (bb, 0, i, 0, 0),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            sc._kernel_h2v2,
            grid=grid,
            in_specs=[pspec, center, above, below, center, above, below],
            out_specs=ospec,
            out_shape=jax.ShapeDtypeStruct((n, 3, hc, 2, wc), jnp.uint16),
            interpret=interpret,
        )(y4, cb, cb, cb, cr, cr, cr)

    def v2(b, m, s, q):
        y4, cb, cr = v3(b, m, s, q)
        return color_kernel(y4, cb, cr)

    def v1r(b, m, s, q):
        out = v2(b, m, s, q)
        n, _3, hc, _2, wc = out.shape
        return out.reshape(n, 3, 2 * hc, wc)

    def v1(b, m, s, q):
        return sc._unpack_cols(v1r(b, m, s, q))

    def v0(b, m, s, q):
        from tpujpeg.config import DecodeConfig
        from tpujpeg.kernels import pipeline as kernel_pipeline

        planes = v4(b, m, s, q)
        return kernel_pipeline.transform_planes_batch(
            jpegs[0].frame, list(planes), DecodeConfig(transform_engine="pallas")
        )

    def timed(fn, label):
        jfn = jax.jit(fn)
        r = jfn(bits, lane_m, seg_bits, lane_q)
        leaf = jax.tree_util.tree_leaves(r)[0]
        _ = np.asarray(leaf.reshape(-1)[:1])  # warm + sync
        times = []
        for _i in range(3):
            t0 = time.perf_counter()
            r = jfn(bits, lane_m, seg_bits, lane_q)
            leaf = jax.tree_util.tree_leaves(r)[0]
            _ = np.asarray(leaf.reshape(-1)[:1])
            times.append(time.perf_counter() - t0)
        return round(min(times), 4)

    res = {"total_mp": total_mp}
    for name, fn in [
        ("V5_kernel", v5), ("V4_assembly", v4), ("V3_physplit", v3),
        ("V2_colorkernel", v2), ("V1r_rowT", v1r), ("V1_planar", v1),
        ("V0_nhwc", v0),
    ]:
        try:
            res[name] = timed(fn, name)
        except Exception as e:  # noqa: BLE001
            res[name] = f"ERROR: {str(e)[:120]}"
        print(name, res[name], file=sys.stderr, flush=True)
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())
