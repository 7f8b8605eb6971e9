"""A/B probe: table-DYNAMIC vs table-baked AC-first progressive scan
kernels (VERDICT r4 next #4).

Builds the progressive bench corpus (one file repeated PROG_BATCH
times, same params as benchmarks/progressive.py), extracts every
AC-first scan, and runs each scan's kernel twice — once with the
Huffman table baked into the program (run_ac_first_jit) and once with
the table as a [3, 64] runtime operand (run_ac_first_dyn_jit) — inside
one jitted chain per variant. Asserts the outputs are IDENTICAL, then
times both chains (readback-synced).

If the dynamic kernel loses < 2x, it becomes the default for
singleton-table groups (killing the 10-30 min per-table-set compile);
either way the verdict lands in BASELINE.md.

Usage: python tools/prog_dyn_probe.py -> one JSON line.
Env: PROG_SIZE (default 4096), PROG_BATCH (default 8),
PROG_RST_BLOCKS (default 4), PROG_REPEATS (default 3).
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

    size = int(os.environ.get("PROG_SIZE", "4096"))
    batch = int(os.environ.get("PROG_BATCH", "8"))
    rst = int(os.environ.get("PROG_RST_BLOCKS", "4"))
    repeats = int(os.environ.get("PROG_REPEATS", "3"))

    data = make_jpeg(size, size, seed=17, quality=85, subsampling=2,
                     progressive=True, restart_blocks=rst)
    datas = [data] * batch

    import jax
    import jax.numpy as jnp
    from tpujpeg import bitstream
    from tpujpeg.kernels import wavefront_prog as wprog

    interpret = jax.default_backend() != "tpu"
    jpegs = [bitstream.parse(d) for d in datas]
    scans = jpegs[0].scans
    ac_first = [
        k for k, s in enumerate(scans) if s.ss != 0 and s.ah == 0
    ]
    assert ac_first, "corpus has no AC-first scans"

    # Per-scan plan arrays, staged in HBM.
    staged = []
    mcus = 0
    for k in ac_first:
        plan = wprog.ScanPlan(jpegs, k)
        sk = wprog._scan_static(jpegs, k, plan)
        assert sk.kind == "ac_first"
        bits = jax.device_put(jnp.asarray(plan.bits))
        lane_m = jax.device_put(jnp.asarray(plan.lane_m))
        seg_bits = jax.device_put(jnp.asarray(plan.seg_bits))
        tbl = jax.device_put(
            jnp.asarray(wprog.dyn_table_pack(sk.tbls[0])[None])
        )
        static_baked = (sk.tbls, sk.W, sk.ss, sk.se, sk.al, sk.lane_group)
        static_dyn = (sk.W, sk.ss, sk.se, sk.al, sk.lane_group)
        staged.append((k, plan, sk, bits, lane_m, seg_bits, tbl,
                       static_baked, static_dyn))
        mcus += int(plan.lane_m.sum())
    _ = np.asarray(staged[0][4])[:1]  # force uploads

    def chain(dyn: bool):
        @jax.jit
        def run(arrs):
            dep = jnp.int32(0)
            outs = []
            for (k, plan, sk, _b, _l, _s, _t, stb, std), (
                bits, lane_m, seg_bits, tbl
            ) in zip(staged, arrs):
                if dyn:
                    out, err = wprog._run_ac_first(
                        bits, lane_m, seg_bits, std,
                        plan.n_groups, plan.n_mcus, interpret, tbl,
                    )
                else:
                    out, err = wprog._run_ac_first(
                        bits, lane_m, seg_bits, stb,
                        plan.n_groups, plan.n_mcus, interpret,
                    )
                dep = dep + jnp.sum(err)
                outs.append((out, err))
            return dep, outs

        return run

    arrs = [(b, l, s, t) for (_k, _p, _sk, b, l, s, t, _stb, _std)
            in staged]
    run_baked = chain(False)
    run_dyn = chain(True)

    # Compile + warm + CORRECTNESS: outputs must be identical.
    dep_b, outs_b = run_baked(arrs)
    _ = int(dep_b)
    dep_d, outs_d = run_dyn(arrs)
    _ = int(dep_d)
    for (ob, eb), (od, ed) in zip(outs_b, outs_d):
        np.testing.assert_array_equal(np.asarray(eb), np.asarray(ed))
        np.testing.assert_array_equal(np.asarray(ob), np.asarray(od))

    def timed(run):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            dep, _outs = run(arrs)
            _ = int(dep)  # readback sync
            best = min(best, time.perf_counter() - t0)
        return best

    t_baked = timed(run_baked)
    t_dyn = timed(run_dyn)

    print(json.dumps({
        "metric": "prog_ac_first_table_dynamic_vs_baked",
        "corpus": f"{batch}x{size}^2 q85 420 prog rst{rst}",
        "ac_first_scans": len(staged),
        "outputs_identical": True,
        "baked_s": round(t_baked, 4),
        "dynamic_s": round(t_dyn, 4),
        "dynamic_over_baked": round(t_dyn / t_baked, 3),
        "platform": jax.devices()[0].platform,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
