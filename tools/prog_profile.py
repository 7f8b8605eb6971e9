"""Chip-side cost split for device progressive decode: raw scan kernels
vs the full per-scan path (kernels + lane<->grid conversions + state
updates) vs the final Pallas transform. Drives the decision of where the
next progressive optimization goes (CLAUDE.md round-3 candidates).

Usage: python tools/prog_profile.py   -> one JSON line.
Env: PROG_SIZE (default 4096), PROG_RST_BLOCKS (default 4).
"""

import io
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
    batch = int(os.environ.get("PROG_BATCH", "1"))
    data = make_jpeg(size, size, seed=17, quality=85, subsampling=2,
                     progressive=True, restart_blocks=rst)
    mp = size * size / 1e6 * batch

    import jax
    import jax.numpy as jnp
    from tpujpeg import bitstream
    from tpujpeg.config import DecodeConfig
    from tpujpeg.kernels import pipeline as kernel_pipeline
    from tpujpeg.kernels import wavefront_prog as wprog

    cfg = DecodeConfig(transform_engine="pallas")
    interpret = jax.default_backend() != "tpu"

    jpeg = bitstream.parse(data)
    jpegs = [bitstream.parse(data) for _ in range(batch)]
    frame = jpeg.frame
    n_scans = len(jpeg.scans)
    plans = [
        None if jpeg.scans[k].ss == 0 and jpeg.scans[k].ah != 0
        else wprog.ScanPlan(jpegs, k)
        for k in range(n_scans)
    ]
    for p in plans:
        if p is not None:
            wprog.stage_plan(p)
            _ = np.asarray(p.lane_m)[:1]

    # Sync discipline: a tiny device-side reduction whose readback
    # forces completion — reading the full array would measure the
    # ~33 MB/s relay, not the chip (CLAUDE.md). Slice leading dims
    # rather than reshape(-1): flattening a big NHWC u8 array makes XLA
    # materialize a (8,128)-tiled copy of the WHOLE array (measured:
    # 16 GB HBM OOM on [8,4096,4096,3] u8 — 42.7x tile-padding).
    _scal = jax.jit(
        lambda x: jnp.sum(
            jax.lax.slice(
                x, (0,) * x.ndim,
                (1,) * (x.ndim - 1) + (min(8, x.shape[-1]),),
            ).astype(jnp.int32)
        )
    )

    def sync(x):
        return int(_scal(x))

    def _kind_of(scan):
        if scan.ss == 0:
            return "dc_refine" if scan.ah != 0 else "dc_first"
        return "ac_refine" if scan.ah != 0 else "ac_first"

    # --- A: raw scan kernels only (no conversions, no state updates),
    # optionally restricted to one scan KIND (per-kind breakdown).
    def kernels_only(only_kind=None):
        outs = []
        for k, plan in enumerate(plans):
            scan = jpeg.scans[k]
            if plan is None:
                continue
            if only_kind is not None and _kind_of(scan) != only_kind:
                continue
            is_dc = scan.ss == 0
            if is_dc:
                blk_sp = []
                for sp, ci in enumerate(scan.comp_indices):
                    c = frame.components[ci]
                    blk_sp += [sp] * (c.h * c.v)
                static = (
                    tuple(blk_sp), wprog._tables_for_scan(scan, dc=True),
                    plan.n_words, scan.al, plan.lane_group,
                )
                out, err = wprog.run_dc_first_jit(
                    jnp.asarray(plan.bits), jnp.asarray(plan.lane_m),
                    jnp.asarray(plan.seg_bits), static, plan.n_groups,
                    plan.n_mcus, interpret,
                )
            else:
                static = (
                    wprog._tables_for_scan(scan, dc=False), plan.n_words,
                    scan.ss, scan.se, scan.al, plan.lane_group,
                )
                if scan.ah == 0:
                    out, err = wprog.run_ac_first_jit(
                        jnp.asarray(plan.bits), jnp.asarray(plan.lane_m),
                        jnp.asarray(plan.seg_bits), static, plan.n_groups,
                        plan.n_mcus, interpret,
                    )
                else:
                    prior = jnp.zeros(
                        (plan.n_groups, plan.n_mcus, 64, 8,
                         plan.bits.shape[2]),
                        jnp.int32,
                    )
                    out, err = wprog.run_ac_refine_jit(
                        jnp.asarray(plan.bits), jnp.asarray(plan.lane_m),
                        jnp.asarray(plan.seg_bits), prior, static,
                        plan.n_groups, plan.n_mcus, interpret,
                    )
            outs.append(err)
        return outs

    outs = kernels_only()
    for e in outs:
        sync(e)
    t0 = time.perf_counter()
    outs = kernels_only()
    for e in outs:
        sync(e)
    t_kernels = time.perf_counter() - t0

    # Per-kind split of A (scan counts differ per kind; absolute
    # seconds are what the lever decision needs).
    t_kind = {}
    n_kind = {}
    for kind in ("dc_first", "ac_first", "ac_refine"):
        n_kind[kind] = sum(
            1 for k, p in enumerate(plans)
            if p is not None and _kind_of(jpeg.scans[k]) == kind
        )
        if not n_kind[kind]:
            t_kind[kind] = 0.0
            continue
        outs = kernels_only(kind)
        for e in outs:
            sync(e)
        t0 = time.perf_counter()
        outs = kernels_only(kind)
        for e in outs:
            sync(e)
        t_kind[kind] = time.perf_counter() - t0

    # --- B: the full per-scan path (entropy state machine end-to-end).
    def full_entropy():
        states = [
            [
                jnp.zeros((c.padded_hb * c.padded_wb, 64), jnp.int32)
                for c in frame.components
            ]
            for _ in range(batch)
        ]
        dcs = [
            [
                jnp.zeros((c.padded_hb * c.padded_wb,), jnp.int32)
                for c in frame.components
            ]
            for _ in range(batch)
        ]
        errs = []
        for k in range(n_scans):
            wprog.apply_scan_batch(
                jpegs, k, states, dcs, interpret, plan=plans[k],
                errs_out=errs,
            )
        return states, dcs, errs

    states, dcs, errs = full_entropy()
    state, dc = states[0], dcs[0]
    for ci in range(frame.n_components):
        sync(state[ci])
    t0 = time.perf_counter()
    states, dcs, errs = full_entropy()
    state, dc = states[0], dcs[0]
    for ci in range(frame.n_components):
        sync(state[ci])
    t_full = time.perf_counter() - t0

    # --- B2: the production one-jit chain (same work as B, one
    # dispatch — the gap is the eager per-op dispatch tax).
    fn, arrs, masks, kernel_plans = wprog.build_chain_inputs(jpegs, plans)
    arrs = jax.device_put(arrs)
    masks = jax.device_put(masks)
    states2, dcs2, errs2 = fn(arrs, masks)
    for ci in range(frame.n_components):
        sync(states2[0][ci])
    t0 = time.perf_counter()
    states2, dcs2, errs2 = fn(arrs, masks)
    for ci in range(frame.n_components):
        sync(states2[0][ci])
    t_chain = time.perf_counter() - t0

    # --- C: transform from device-resident coefficients.
    qtabs = [jnp.asarray(jpeg.qtables[c.tq]) for c in frame.components]

    def transform():
        return kernel_pipeline.transform_batch(
            frame,
            [
                jnp.stack([st[ci] for st in states])
                for ci in range(frame.n_components)
            ],
            qtabs, cfg,
            dcs=[
                jnp.stack([d[ci] for d in dcs])
                for ci in range(frame.n_components)
            ],
        )

    rgb = transform()
    sync(rgb)
    t0 = time.perf_counter()
    rgb = transform()
    sync(rgb)
    t_transform = time.perf_counter() - t0

    exact = None
    try:
        from PIL import Image

        exact = bool(
            np.array_equal(
                np.asarray(rgb[0]),
                np.asarray(Image.open(io.BytesIO(data))),
            )
        )
    except Exception:
        pass

    print(
        json.dumps(
            {
                "metric": f"prog_profile_{size}x{size}_batch{batch}",
                "scan_kernels_s": round(t_kernels, 4),
                "scan_kernels_by_kind_s": {
                    k: round(v, 4) for k, v in t_kind.items()
                },
                "scans_by_kind": n_kind,
                "full_entropy_eager_s": round(t_full, 4),
                "full_entropy_chain_s": round(t_chain, 4),
                "eager_dispatch_tax_s": round(t_full - t_chain, 4),
                "transform_s": round(t_transform, 4),
                "total_mp_per_s": round(mp / (t_chain + t_transform), 1),
                "bit_exact_vs_pil": exact,
                "platform": __import__("jax").devices()[0].platform,
            }
        )
    )


if __name__ == "__main__":
    main()
