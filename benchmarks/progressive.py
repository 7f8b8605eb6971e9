"""Device-side progressive decode benchmark (config 4, BASELINE.json:10):
restart-segmented progressive JPEGs, all four scan kinds as wavefront
kernels over an HBM-resident coefficient state, then the Pallas
transform — full decode on chip. With PROG_BATCH > 1, the whole batch's
scans ride the cross-image batched launches (scan k of every image in
one kernel call).

Methodology matches bench.py: plan arrays are staged in HBM before the
clock (the localhost relay upload is a harness artifact), host plan
building is timed separately, and the chip loop syncs through one small
readback at the end (deferred error vectors + RGB checksum).

Usage: python benchmarks/progressive.py -> one JSON line.
Env: PROG_SIZE (default 4096), PROG_RST_BLOCKS (default 4),
PROG_BATCH (default 4).
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
    batch = int(os.environ.get("PROG_BATCH", "4"))
    # One file repeated: libjpeg emits per-image OPTIMIZED Huffman
    # tables for progressive, and the batched launches require shared
    # tables (scan_group_key), so the cross-image case this measures is
    # the duplicated-asset / fixed-table-encoder one. Work per image is
    # identical to the single-image benchmark either way.
    data = make_jpeg(size, size, seed=17, quality=85, subsampling=2,
                     progressive=True, restart_blocks=rst)
    datas = [data] * batch
    mp = size * size / 1e6 * batch

    from PIL import Image

    Image.open(io.BytesIO(datas[0])).load()  # warm
    t0 = time.perf_counter()
    for d in datas:
        Image.open(io.BytesIO(d)).load()
    anchor = mp / (time.perf_counter() - t0)

    import jax
    import jax.numpy as jnp
    from tpujpeg import bitstream
    from tpujpeg.config import DecodeConfig
    from tpujpeg.kernels import pipeline as kernel_pipeline
    from tpujpeg.kernels import wavefront_prog as wprog

    cfg = DecodeConfig(transform_engine="pallas")
    interpret = jax.default_backend() != "tpu"
    csum = jax.jit(lambda x: jnp.sum(x.astype(jnp.int32)))

    jpegs = [bitstream.parse(d) for d in datas]
    frame = jpegs[0].frame
    keys = {wprog.scan_group_key(j) for j in jpegs}
    assert len(keys) == 1, "corpus must share one scan structure"
    n_scans = len(jpegs[0].scans)

    # Host prep rate: plans + masks + the ONE-dispatch to-RGB chain
    # (scan kernels + DC merges + transform in a single jitted program —
    # the separate transform dispatch cost a device round-trip per
    # batch). packed16 output when the frame qualifies, as bench.py.
    t0 = time.perf_counter()
    gs, arrs, masks, kernel_plans = wprog._chain_statics(jpegs)
    color = bitstream.color_space(jpegs[0])
    packed = kernel_pipeline.packed_layout_applies(frame, cfg, color)
    tkey = (cfg.idct, cfg.fancy_upsampling, color, packed, False)
    fn = wprog._prog_rgb_chain(gs, tkey, interpret)
    qtabs = [jnp.asarray(jpegs[0].qtables[c.tq]) for c in frame.components]
    plan_s = time.perf_counter() - t0

    # Stage the chain inputs in HBM (excluded, see docstring).
    t0 = time.perf_counter()
    arrs = jax.device_put(arrs)
    masks = jax.device_put(masks)
    qtabs = jax.device_put(qtabs)
    for leaf in jax.tree_util.tree_leaves((arrs, masks, qtabs)):
        _ = int(jnp.sum(leaf.reshape(-1)[:1].astype(jnp.int32)))  # force
    upload_s = time.perf_counter() - t0

    def chip_decode():
        return fn(arrs, masks, qtabs)

    rgb, errs = chip_decode()
    _ = int(csum(rgb))  # compile + warm, true sync
    for err, plan in zip(errs, kernel_plans):
        wprog._check_err(err, plan)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        rgb, errs = chip_decode()
        _ = int(csum(rgb))
        times.append(time.perf_counter() - t0)
    value = mp / min(times)

    def as_nhwc(x):
        if not packed:
            return np.asarray(x)
        u8 = np.asarray(x).view(np.uint8)
        return u8.reshape(3, size, size).transpose(1, 2, 0)

    exact = all(
        np.array_equal(
            as_nhwc(rgb[i]), np.asarray(Image.open(io.BytesIO(datas[i])))
        )
        for i in range(batch)
    )
    print(
        json.dumps(
            {
                "metric": (
                    f"progressive_onchip_decode_mp_per_s_{size}x{size}"
                    f"_batch{batch}"
                ),
                "value": round(value, 1),
                "unit": "MP/s",
                "vs_baseline": round(value / anchor, 3),
                "detail": {
                    "libjpeg_turbo_1core_mp_per_s": round(anchor, 1),
                    "bit_exact_vs_pil": exact,
                    "n_scans": n_scans,
                    "batch": batch,
                    "host_plan_build_mp_per_s": round(mp / plan_s, 1),
                    "staged_upload_s": round(upload_s, 3),
                    "platform": jax.devices()[0].platform,
                    "includes": (
                        "all scan kernels (cross-image batched) +"
                        " DC-refine OR + Pallas transform as ONE jitted"
                        " program (single dispatch), packed16 output,"
                        " inputs staged in HBM, one sync"
                    ),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
