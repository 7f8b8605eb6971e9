"""Size the divergence-sort prize: time the fused wavefront kernel with
lanes in natural (raster) order vs sorted by bits-per-MCU density.

The kernel's AC while_loop runs to the slowest lane of each 2048-lane
group, so ~43% of AC steps are wasted on group-max divergence
(BASELINE.md round-3 levers). Sorting lanes groups similar workloads,
shrinking each group's max toward its mean. This probe permutes the
plan's lane arrays host-side and times kernel-only (prog_a style) both
ways — OUTPUT LANE ORDER IS WRONG in the sorted run (no inverse
permutation); this is a timing probe, not a decoder.

Prints one JSON line with both rates; the delta is the upper bound a
real sorted path (which must pay a device gather to unsort) can win.
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
    plan_static = plan.static_key("pixels")

    def flat(a):
        return a.reshape(plan.n_groups * plan.lane_group, *a.shape[3:])

    def grouped(a):
        return a.reshape(
            plan.n_groups, wp.SUBLANES, plan.lane_group // wp.SUBLANES,
            *a.shape[1:],
        )

    bits_f = flat(plan.bits)
    segb_f = flat(plan.seg_bits)
    lm_f = flat(plan.lane_m)
    lq_f = flat(plan.lane_qset)

    # Sort key: bits per MCU (pads: +inf keeps them in trailing groups).
    key = np.where(
        lm_f > 0, segb_f / np.maximum(lm_f, 1), np.inf
    )
    perm = np.argsort(key, kind="stable")

    def run(order):
        b = jnp.asarray(grouped(bits_f[order]))
        sb = jnp.asarray(grouped(segb_f[order]))
        lm = jnp.asarray(grouped(lm_f[order]))
        lq = jnp.asarray(grouped(lq_f[order]))
        b = jax.device_put(b)
        sb, lm, lq = map(jax.device_put, (sb, lm, lq))
        _ = np.asarray(lm)[:1]

        @jax.jit
        def prog(bits, lane_m, seg_bits, lane_q):
            out, err = wp.run_wavefront(
                bits, lane_m, seg_bits, plan_static, plan.n_groups,
                interpret, lane_q,
            )
            dep = sum(jnp.sum(o[..., -1].astype(jnp.int32)) for o in out)
            return dep + jnp.sum(err), err

        v, err = prog(b, lm, sb, lq)
        _ = int(v)  # compile + sync
        times = []
        for _i in range(3):
            t0 = time.perf_counter()
            v, err = prog(b, lm, sb, lq)
            _ = int(v)
            times.append(time.perf_counter() - t0)
        nerr = int(np.count_nonzero(np.asarray(err)))
        return min(times), nerr

    nat_s, nat_err = run(np.arange(len(perm)))
    srt_s, srt_err = run(perm)
    print(json.dumps({
        "total_mp": total_mp,
        "natural": {"s": round(nat_s, 4),
                    "mp_per_s": round(total_mp / nat_s, 1),
                    "err_lanes": nat_err},
        "sorted": {"s": round(srt_s, 4),
                   "mp_per_s": round(total_mp / srt_s, 1),
                   "err_lanes": srt_err},
        "speedup": round(nat_s / srt_s, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
