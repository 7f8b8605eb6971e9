"""Size the per-symbol word-load (refill) cost: the register-window
refill does one binary-fold load over P = next_pow2(W) words per
symbol, so kernel time vs W measures the fold's share. W=96 and W=128
share P=128; W=160 doubles P to 256 — if refill were X% of the kernel
at P=128, the W=160 run should be ~(1+X)% slower. Prints one JSON line.
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

    def run(min_words):
        plan = wp.build_block_plan(jpegs, min_words=min_words)
        plan_static = plan.static_key("pixels")
        b = jax.device_put(jnp.asarray(plan.bits))
        lm = jax.device_put(jnp.asarray(plan.lane_m))
        sb = jax.device_put(jnp.asarray(plan.seg_bits))
        lq = jax.device_put(jnp.asarray(plan.lane_qset))
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
        _ = int(v)
        times = []
        for _i in range(3):
            t0 = time.perf_counter()
            v, err = prog(b, lm, sb, lq)
            _ = int(v)
            times.append(time.perf_counter() - t0)
        assert not np.asarray(err).any()
        return plan.n_words, min(times)

    out = {}
    for mw in (0, 160):
        W, s = run(mw)
        out[f"W{W}"] = {"s": round(s, 4), "mp_per_s": round(total_mp / s, 1)}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
