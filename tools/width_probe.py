"""Probe lane-group width: if the wavefront kernel is latency-bound on
its per-trip dependency chain (scatter halving and lane sorting both
moved nothing), widening each lockstep group multiplies the parallel
work per vector op and should raise throughput near-linearly until a
VMEM or divergence wall. Times kernel-only at LANE_GROUP widths.
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
    widths = [
        int(w) for w in os.environ.get("WIDTHS", "2048,4096,8192").split(",")
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
    from tpujpeg.kernels import wavefront_pallas as wp

    interpret = jax.default_backend() != "tpu"
    jpegs = [bitstream.parse(d) for d in datas]

    out = {}
    for width in widths:
        wp.MAX_GROUP = width
        wp.LANE_GROUP = min(2048, width)
        plan = wp.build_block_plan(jpegs)
        assert plan.lane_group == width, (plan.lane_group, width)
        plan_static = plan.static_key("pixels")
        b = jax.device_put(jnp.asarray(plan.bits))
        lm = jax.device_put(jnp.asarray(plan.lane_m))
        sb = jax.device_put(jnp.asarray(plan.seg_bits))
        lq = jax.device_put(jnp.asarray(plan.lane_qset))
        _ = np.asarray(lm)[:1]

        @jax.jit
        def prog(bits, lane_m, seg_bits, lane_q):
            o, err = wp.run_wavefront(
                bits, lane_m, seg_bits, plan_static, plan.n_groups,
                interpret, lane_q,
            )
            dep = sum(jnp.sum(x[..., -1].astype(jnp.int32)) for x in o)
            return dep + jnp.sum(err), err

        v, err = prog(b, lm, sb, lq)
        _ = int(v)
        times = []
        for _i in range(3):
            t0 = time.perf_counter()
            v, err = prog(b, lm, sb, lq)
            _ = int(v)
            times.append(time.perf_counter() - t0)
        assert not np.asarray(err).any(), width
        s = min(times)
        out[f"lanes{width}"] = {
            "s": round(s, 4), "mp_per_s": round(total_mp / s, 1),
            "groups": plan.n_groups,
        }
        print(json.dumps({f"lanes{width}": out[f"lanes{width}"]}),
              flush=True)
    wp.LANE_GROUP, wp.MAX_GROUP = 2048, 8192
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
