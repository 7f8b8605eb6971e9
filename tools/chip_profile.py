"""Chip-side cost split of the fused decode chain (round-2 perf probe
for the aligned-layout lever, BASELINE.md "known gaps"): times three
staged programs on the cached bench geometry —

  A  wavefront+IDCT kernel only            (out stays in kernel layout)
  B  kernel + pixel assembly               (u8 planes per component)
  C  full chain (+ fused upsample/color)   (the bench program)

B-A isolates the u8 assembly transposes; C-B the upsample/color tail.
Prints one JSON line. Uses the same corpus seeds as bench.py chunk 0 so
every program hits the persistent compile cache where possible.
"""

from __future__ import annotations

import io
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
    from tpujpeg.config import DecodeConfig
    from tpujpeg.kernels import pipeline as kernel_pipeline
    from tpujpeg.kernels import wavefront_pallas as wp

    cfg = DecodeConfig(transform_engine="pallas")
    interpret = jax.default_backend() != "tpu"
    jpegs = [bitstream.parse(d) for d in datas]
    plan = wp.build_block_plan(jpegs)
    geoms = tuple(wp.ImageGeom.of(j) for j in jpegs)
    frame = geoms[0].frame
    shape = (plan.blocks_per_mcu, plan.n_mcus, plan.n_groups)
    plan_static = plan.static_key("pixels")

    bits = jax.device_put(jnp.asarray(plan.bits))
    lane_m = jax.device_put(jnp.asarray(plan.lane_m))
    seg_bits = jax.device_put(jnp.asarray(plan.seg_bits))
    lane_q = jax.device_put(jnp.asarray(plan.lane_qset))
    _ = np.asarray(lane_m)[:1]

    @jax.jit
    def prog_a(bits, lane_m, seg_bits, lane_q):
        out, err = wp.run_wavefront(
            bits, lane_m, seg_bits, plan_static, plan.n_groups, interpret,
            lane_q,
        )
        # Depend on out so the kernel isn't dead-code-eliminated: a tiny
        # slice-sum forces the full decode.
        dep = sum(jnp.sum(o[..., -1].astype(jnp.int32)) for o in out)
        return dep + jnp.sum(err), err

    @jax.jit
    def prog_b(bits, lane_m, seg_bits, lane_q):
        out, err = wp.run_wavefront(
            bits, lane_m, seg_bits, plan_static, plan.n_groups, interpret,
            lane_q,
        )
        stacked = wp.assemble_pixels_stacked(shape, out, geoms)
        acc = jnp.int32(0)
        for st in stacked:
            acc = acc + jnp.sum(st.astype(jnp.int32))
        return acc, err

    @jax.jit
    def prog_c(bits, lane_m, seg_bits, lane_q):
        out, err = wp.run_wavefront(
            bits, lane_m, seg_bits, plan_static, plan.n_groups, interpret,
            lane_q,
        )
        stacked = wp.assemble_pixels_stacked(shape, out, geoms)
        rgb = kernel_pipeline.transform_planes_batch(frame, stacked, cfg)
        return jnp.sum(rgb.astype(jnp.int32)), err

    @jax.jit
    def prog_d(bits, lane_m, seg_bits, lane_q):
        # The bench chain: packed16 output (decode_stream layout,
        # chain ends AT the color kernel — no u16->u8 retile, no NHWC).
        out, err = wp.run_wavefront(
            bits, lane_m, seg_bits, plan_static, plan.n_groups, interpret,
            lane_q,
        )
        stacked = wp.assemble_pixels_stacked(shape, out, geoms)
        rgb = kernel_pipeline.transform_planes_batch(
            frame, stacked, cfg, packed=True
        )
        return jnp.sum(rgb[..., -1, :].astype(jnp.int32)), err

    def timed(fn, label):
        v, err = fn(bits, lane_m, seg_bits, lane_q)
        _ = int(v)  # compile + warm, true sync
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
        "A_kernel_only": timed(prog_a, "A"),
        "B_kernel_plus_assembly": timed(prog_b, "B"),
        "C_full_chain": timed(prog_c, "C"),
        "D_packed16_chain": timed(prog_d, "D"),
    }
    res["assembly_s"] = round(
        res["B_kernel_plus_assembly"]["s"] - res["A_kernel_only"]["s"], 4
    )
    res["color_tail_s"] = round(
        res["C_full_chain"]["s"] - res["B_kernel_plus_assembly"]["s"], 4
    )
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())
