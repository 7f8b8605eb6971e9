"""Which scan KIND owns progressive chip time? Builds three jitted
chain prefixes at the progressive-benchmark conditions (batch 4,
4096^2, rst 4) and times them warm:

  P1  scans[:1]            DC-first kernel only
  P2  scans[:n_first]      + every AC-first kernel
  P3  scans[:]             + DC-refine ORs + every AC-refine kernel

Marginals P2-P1 and P3-P2 split the chain into first-pass vs
refinement cost (conversions included where they occur). Drives the
round-3 decision: the AC-refine phase machine consumes ONE bit per
lockstep trip in its ADVANCE/TAIL phases, and a prefix-sum
reformulation would vectorize whole runs — but only if refinement
actually dominates.

Usage: python tools/prog_scan_split.py -> one JSON line.
Env: PROG_SIZE (4096), PROG_RST_BLOCKS (4), PROG_BATCH (4).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from corpus import make_jpeg

    size = int(os.environ.get("PROG_SIZE", "4096"))
    rst = int(os.environ.get("PROG_RST_BLOCKS", "4"))
    batch = int(os.environ.get("PROG_BATCH", "4"))
    data = make_jpeg(size, size, seed=17, quality=85, subsampling=2,
                     progressive=True, restart_blocks=rst)
    datas = [data] * batch
    mp = size * size / 1e6 * batch

    import jax
    import jax.numpy as jnp
    from tpujpeg import bitstream
    from tpujpeg.kernels import wavefront_prog as wprog

    interpret = jax.default_backend() != "tpu"
    jpegs = [bitstream.parse(d) for d in datas]
    scans = jpegs[0].scans
    n_scans = len(scans)
    n_first = sum(1 for s in scans if s.ah == 0)
    kinds = [
        ("dc" if s.ss == 0 else "ac")
        + ("_first" if s.ah == 0 else "_refine")
        + f"[c{s.comp_indices}]ss{s.ss}-{s.se}"
        for s in scans
    ]

    fn_full, arrs, masks, kernel_plans = wprog.build_chain_inputs(jpegs)
    arrs = jax.device_put(arrs)
    masks = jax.device_put(masks)
    for leaf in jax.tree_util.tree_leaves((arrs, masks)):
        _ = int(jnp.sum(leaf.reshape(-1)[:1].astype(jnp.int32)))

    # Rebuild the group static so prefixes key their own chains.
    plans = [None] * n_scans
    ki = 0
    for k in range(n_scans):
        if not (scans[k].ss == 0 and scans[k].ah != 0):
            plans[k] = kernel_plans[ki]
            ki += 1
    sks = tuple(
        wprog._scan_static(jpegs, k, plans[k]) for k in range(n_scans)
    )
    frame = jpegs[0].frame

    def chain_for(prefix: int):
        gs = wprog._GroupStatic(
            n_images=len(jpegs),
            mcus_x=frame.mcus_x,
            mcus_y=frame.mcus_y,
            comps=wprog._comps_static(frame),
            scans=sks[:prefix],
        )
        return wprog._prog_chain(gs, interpret)

    _scal = jax.jit(lambda x: jnp.sum(x.reshape(-1)[:8].astype(jnp.int32)))

    def timed(prefix: int) -> float:
        fn = chain_for(prefix)
        a, m = arrs[:prefix], masks[:prefix]
        states, _dcs, _errs = fn(a, m)  # compile + warm
        for ci in range(frame.n_components):
            _ = int(_scal(states[0][ci]))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            states, _dcs, _errs = fn(a, m)
            for ci in range(frame.n_components):
                _ = int(_scal(states[0][ci]))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(1)
    t2 = timed(n_first)
    t3 = timed(n_scans)
    # Finer refine cuts: first AC-refine scan alone, then the DC-refine
    # OR — isolates the phase-machine kernel from the state-update cost.
    t6 = timed(n_first + 1)
    t7 = timed(n_first + 2)

    # DC-first kernel + lane flatten only, NO state scatter: isolates
    # the .at[:, 0].set column write into the [blocks, 64] state.
    sk = sks[0]

    def dc_kernel_only(a):
        bits, lane_m, seg_bits = a
        static = (sk.blk_sp, sk.tbls, sk.W, sk.al, sk.lane_group)
        out, err = wprog.run_dc_first_jit(
            bits, lane_m, seg_bits, static, sk.G, sk.M, interpret
        )
        return wprog._flat_lanes(out, sk.G, sk.M, len(sk.blk_sp)), err

    fn_k = jax.jit(dc_kernel_only)
    flat, _err = fn_k(arrs[0])
    _ = int(_scal(flat))
    best_k = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        flat, _err = fn_k(arrs[0])
        _ = int(_scal(flat))
        best_k = min(best_k, time.perf_counter() - t0)

    print(json.dumps({
        "metric": f"prog_scan_split_{size}x{size}_batch{batch}",
        "scan_kinds": kinds,
        "n_first": n_first,
        "dc_first_s": round(t1, 4),
        "dc_first_kernel_only_s": round(best_k, 4),
        "ac_first_marginal_s": round(t2 - t1, 4),
        "ac_refine_luma1_marginal_s": round(t6 - t2, 4),
        "dc_refine_marginal_s": round(t7 - t6, 4),
        "refine_rest_marginal_s": round(t3 - t7, 4),
        "full_chain_s": round(t3, 4),
        "mp": mp,
        "full_chain_mp_per_s": round(mp / t3, 1),
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
