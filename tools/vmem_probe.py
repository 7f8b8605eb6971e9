"""Probe the scoped-VMEM wall (session-3 finding: lockstep groups are
free throughput with width — 2048->8192 was +16% kernel-only — but
fused chains cap at 4096 because XLA co-schedules neighboring fusions
into the pallas call's 16 MB scoped-vmem pool). If the compiler honors
a larger pool via per-jit compiler_options (xla_tpu_scoped_vmem_limit_kib
— works through the axon remote-compile path iff the option rides the
compile request, not the env), wider groups become legal inside chains.

Env: TJ_VMEM_BUDGET_MB (client-side _pick_group budget, default 10),
TJ_SCOPED_KIB (compiler pool, default 16384), WIDTHS, BENCH_*.
Times kernel-only AND the full rgb chain at each width.
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
    scoped_kib = int(os.environ.get("TJ_SCOPED_KIB", "16384"))
    widths = [
        int(w) for w in os.environ.get("WIDTHS", "8192").split(",")
    ]
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

    copts = {"xla_tpu_scoped_vmem_limit_kib": str(scoped_kib)}
    interpret = jax.default_backend() != "tpu"
    jpegs = [bitstream.parse(d) for d in datas]
    cfg = DecodeConfig(transform_engine="pallas")

    out = {"scoped_kib": scoped_kib,
           "budget_mb": wp.VMEM_BUDGET_MB}
    saved_group = (wp.LANE_GROUP, wp.MAX_GROUP)
    try:
        _probe_widths(out, widths, wp, jpegs, cfg, copts, interpret, total_mp)
    finally:
        wp.LANE_GROUP, wp.MAX_GROUP = saved_group
    print(json.dumps(out))
    return 0


def _probe_widths(out, widths, wp, jpegs, cfg, copts, interpret, total_mp):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpujpeg.kernels import pipeline as kernel_pipeline

    for width in widths:
        wp.MAX_GROUP = width
        wp.LANE_GROUP = min(2048, width)
        plan = wp.build_block_plan(jpegs)
        if plan.lane_group != width:
            out[f"w{width}"] = {
                "skipped": f"_pick_group chose {plan.lane_group}"
            }
            print(json.dumps({f"w{width}": out[f"w{width}"]}), flush=True)
            continue
        plan_static = plan.static_key("pixels")
        geoms = tuple(wp.ImageGeom.of(j) for j in jpegs)
        frame = geoms[0].frame
        shape = (plan.blocks_per_mcu, plan.n_mcus, plan.n_groups)
        b = jax.device_put(jnp.asarray(plan.bits))
        lm = jax.device_put(jnp.asarray(plan.lane_m))
        sb = jax.device_put(jnp.asarray(plan.seg_bits))
        lq = jax.device_put(jnp.asarray(plan.lane_qset))
        _ = np.asarray(lm)[:1]

        def kernel_only(bits, lane_m, seg_bits, lane_q):
            o, err = wp.run_wavefront(
                bits, lane_m, seg_bits, plan_static, plan.n_groups,
                interpret, lane_q,
            )
            dep = sum(jnp.sum(x[..., -1].astype(jnp.int32)) for x in o)
            return dep + jnp.sum(err), err

        def chain(bits, lane_m, seg_bits, lane_q):
            o, err = wp.run_wavefront(
                bits, lane_m, seg_bits, plan_static, plan.n_groups,
                interpret, lane_q,
            )
            stacked = wp.assemble_pixels_stacked(shape, o, geoms)
            rgb = kernel_pipeline.transform_planes_batch(frame, stacked, cfg)
            return jnp.sum(rgb.astype(jnp.int32)), err

        row = {}
        for name, fn in (("kernel", kernel_only), ("chain", chain)):
            jf = jax.jit(fn, compiler_options=copts)
            try:
                v, err = jf(b, lm, sb, lq)
                _ = int(v)
            except Exception as e:  # compile OOM or rejected option
                row[name] = {"error": str(e)[:200]}
                continue
            times = []
            for _i in range(3):
                t0 = time.perf_counter()
                v, err = jf(b, lm, sb, lq)
                _ = int(v)
                times.append(time.perf_counter() - t0)
            assert not np.asarray(err).any(), (width, name)
            s = min(times)
            row[name] = {"s": round(s, 4),
                         "mp_per_s": round(total_mp / s, 1)}
        out[f"w{width}"] = row
        print(json.dumps({f"w{width}": row}), flush=True)


if __name__ == "__main__":
    sys.exit(main())
