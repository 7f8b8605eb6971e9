"""Fine-grained cost split of pixel assembly (the chain's dominant
non-kernel cost, chip_profile: ~135 ms vs 135 ms kernel at batch 64).

Stages timed, each as kernel + prefix-of-assembly so differences
isolate one op:

  A   kernel only
  A1  + the big lane transpose (px: [B,G,M,512,K] -> [B,lane,M,64])
  A2  + per-image sub slicing/reshape (no raster transpose)
  A3  + per-image block->raster transposes (full assemble_pixels)
  B   + jnp.stack over images (what the chain feeds color)

Each stage ends in a tiny checksum reduction; XLA may fuse the
reduction into the last transpose, so treat numbers as lower bounds on
the materialized cost — the B-vs-A3 and A3-vs-A1 gaps are still the
signal. One JSON line.
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
    from tpujpeg.kernels import wavefront_pallas as wp

    interpret = jax.default_backend() != "tpu"
    jpegs = [bitstream.parse(d) for d in datas]
    plan = wp.build_block_plan(jpegs)
    geoms = tuple(wp.ImageGeom.of(j) for j in jpegs)
    frame = geoms[0].frame
    B = plan.blocks_per_mcu
    M = plan.n_mcus
    G = plan.n_groups
    K = wp.LANE_GROUP // wp.SUBLANES
    shape = (B, M, G)
    plan_static = (
        B, plan.blk_tables, plan.n_words, M, "pixels", plan.qsets,
    )

    bits = jax.device_put(jnp.asarray(plan.bits))
    lane_m = jax.device_put(jnp.asarray(plan.lane_m))
    seg_bits = jax.device_put(jnp.asarray(plan.seg_bits))
    lane_q = jax.device_put(jnp.asarray(plan.lane_qset))
    _ = np.asarray(lane_m)[:1]

    def wf(bits, lane_m, seg_bits, lane_q):
        return wp.run_wavefront(
            bits, lane_m, seg_bits, plan_static, G, interpret, lane_q
        )

    def big_transpose(out):
        x32 = jax.lax.bitcast_convert_type(
            out.reshape(B, G, M * 64, wp.SUBLANES, K // 4, 4), jnp.int32
        )
        t = x32.transpose(0, 1, 3, 4, 2)
        u = jax.lax.bitcast_convert_type(t, jnp.uint8)
        return (
            u.transpose(0, 1, 2, 3, 5, 4)
            .reshape(B, G * wp.LANE_GROUP, M, 64)
        )

    @jax.jit
    def prog_a(bits, lane_m, seg_bits, lane_q):
        out, err = wf(bits, lane_m, seg_bits, lane_q)
        return jnp.sum(out[:, :64, -1].astype(jnp.int32)), err

    @jax.jit
    def prog_a1(bits, lane_m, seg_bits, lane_q):
        out, err = wf(bits, lane_m, seg_bits, lane_q)
        px = big_transpose(out)
        return jnp.sum(px.astype(jnp.int32)), err

    @jax.jit
    def prog_a3(bits, lane_m, seg_bits, lane_q):
        out, err = wf(bits, lane_m, seg_bits, lane_q)
        per = wp.assemble_pixels(shape, out, geoms)
        acc = jnp.int32(0)
        for i in range(nimg):
            for p in per[i]:
                acc = acc + jnp.sum(p.astype(jnp.int32))
        return acc, err

    @jax.jit
    def prog_b(bits, lane_m, seg_bits, lane_q):
        out, err = wf(bits, lane_m, seg_bits, lane_q)
        per = wp.assemble_pixels(shape, out, geoms)
        acc = jnp.int32(0)
        for ci in range(frame.n_components):
            st = jnp.stack([per[i][ci] for i in range(nimg)])
            acc = acc + jnp.sum(st.astype(jnp.int32))
        return acc, err

    def timed(fn):
        v, err = fn(bits, lane_m, seg_bits, lane_q)
        _ = int(v)
        times = []
        for _i in range(3):
            t0 = time.perf_counter()
            v, err = fn(bits, lane_m, seg_bits, lane_q)
            _ = int(v)
            times.append(time.perf_counter() - t0)
        best = min(times)
        return {"s": round(best, 4), "mp_per_s": round(total_mp / best, 1)}

    res = {
        "total_mp": total_mp,
        "A_kernel": timed(prog_a),
        "A1_plus_lane_transpose": timed(prog_a1),
        "A3_full_assembly": timed(prog_a3),
        "B_plus_stack": timed(prog_b),
    }
    res["lane_transpose_s"] = round(
        res["A1_plus_lane_transpose"]["s"] - res["A_kernel"]["s"], 4
    )
    res["raster_s"] = round(
        res["A3_full_assembly"]["s"] - res["A1_plus_lane_transpose"]["s"], 4
    )
    res["stack_s"] = round(
        res["B_plus_stack"]["s"] - res["A3_full_assembly"]["s"], 4
    )
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())
