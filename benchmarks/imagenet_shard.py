"""Config-3 benchmark (BASELINE.json:9): a mixed-size shard of baseline
JPEGs decoded through the geometry-bucketed fused path — per bucket, ONE
XLA program runs wavefront entropy + dequant + IDCT + assembly +
upsample/color, RGB resident in HBM.

Methodology matches bench.py: host prep (parse + bucketing + plan
build) is timed separately, bitstream plan arrays are staged in HBM
before the clock (the localhost relay's ~33 MB/s is a harness artifact,
not the decoder), and the chip loop dispatches every bucket then syncs
through one tiny readback per bucket.

Usage: python benchmarks/imagenet_shard.py -> one JSON line.
Env: SHARD_IMAGES (default 96).
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

    n = int(os.environ.get("SHARD_IMAGES", "96"))
    # Mixed-size shard: four geometry buckets, weighted toward small
    # images like a real photo/ImageNet shard (config 3 says "1024
    # mixed-size JPEGs" — run with SHARD_IMAGES=1024 for the contract
    # number; the default stays small for quick checks).
    sizes = (
        [(512, 512)] * 4 + [(768, 512)] * 3 + [(1024, 1024)] * 2
        + [(2048, 2048)] * 1
    )
    datas = []
    for i in range(n):
        w, h = sizes[i % len(sizes)]
        datas.append(
            make_jpeg(w, h, seed=100 + i, quality=85, subsampling=2,
                      restart_blocks=4)
        )
    mp = sum(
        sizes[i % len(sizes)][0] * sizes[i % len(sizes)][1]
        for i in range(n)
    ) / 1e6

    from PIL import Image

    for d in datas[: len(sizes)]:
        Image.open(io.BytesIO(d)).load()
    t0 = time.perf_counter()
    for d in datas:
        Image.open(io.BytesIO(d)).load()
    anchor = mp / (time.perf_counter() - t0)

    import jax
    import jax.numpy as jnp
    from tpujpeg import bitstream
    from tpujpeg.config import DecodeConfig
    from tpujpeg.kernels import wavefront_pallas as wp
    from tpujpeg.parallel.batch import _bucket_key

    cfg = DecodeConfig(transform_engine="pallas")
    interpret = jax.default_backend() != "tpu"
    csum = jax.jit(lambda x: jnp.sum(x.astype(jnp.int32)))

    # Host prep: parse + bucket + plan build (the pipelined stage).
    def prep():
        jpegs = [bitstream.parse(d) for d in datas]
        buckets = {}
        for i, j in enumerate(jpegs):
            buckets.setdefault(_bucket_key(j), []).append(i)
        out = []
        for members in buckets.values():
            sub = [jpegs[i] for i in members]
            out.append((members, sub, wp.build_block_plan(sub)))
        return out

    prep()  # warm the native lib
    t0 = time.perf_counter()
    bucket_plans = prep()
    host_prep_s = time.perf_counter() - t0

    # Stage every bucket's plan arrays in HBM (excluded, see docstring).
    # Buckets the fused path can't take count as fallbacks (none in
    # this synthetic corpus; the counter proves it rather than assumes).
    t0 = time.perf_counter()
    staged = []
    fallback_images = 0
    for members, sub, plan in bucket_plans:
        try:
            fn = wp._rgb_chain(plan, sub, cfg, interpret)
        except Exception:
            fallback_images += len(members)
            continue
        args = tuple(
            jax.device_put(jnp.asarray(x))
            for x in (plan.bits, plan.lane_m, plan.seg_bits, plan.lane_qset)
        )
        _ = int(csum(args[1]))
        staged.append((members, plan, fn, args))
    upload_s = time.perf_counter() - t0

    def chip_decode():
        outs = []
        for members, plan, fn, args in staged:
            rgb, err = fn(*args)
            outs.append((rgb, err, plan))
        return outs

    outs = chip_decode()  # compile + warm
    for rgb, err, plan in outs:
        assert not np.asarray(err).reshape(-1)[: plan.n_lanes].any()

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = chip_decode()
        for rgb, _err, _plan in outs:
            _ = int(csum(rgb[0, :8, :8]))  # tiny readback per bucket
        times.append(time.perf_counter() - t0)
    value = mp / min(times)
    ips = n / min(times)

    # Bit-exactness: one image per bucket vs PIL.
    exact = True
    for members, plan, fn, args in staged:
        rgb, _err = fn(*args)
        i0 = members[0]
        exact &= bool(
            np.array_equal(
                np.asarray(rgb[0]),
                np.asarray(Image.open(io.BytesIO(datas[i0]))),
            )
        )
    print(
        json.dumps(
            {
                "metric": f"mixed_shard_onchip_decode_{n}imgs",
                "value": round(ips, 1),
                "unit": "images/s",
                "vs_baseline": round(value / anchor, 3),
                "detail": {
                    "mp_per_s": round(value, 1),
                    "libjpeg_turbo_1core_mp_per_s": round(anchor, 1),
                    "bit_exact_vs_pil": exact,
                    "buckets": len(staged),
                    "bucket_images": [len(m) for m, _p, _f, _a in staged],
                    "bucket_lanes": [p.n_lanes for _m, p, _f, _a in staged],
                    "fallback_images": fallback_images,
                    "host_prep_mp_per_s": round(mp / host_prep_s, 1),
                    "staged_upload_s": round(upload_s, 3),
                    "includes": (
                        "on-chip decode of staged bitstreams, one fused"
                        " launch per geometry bucket; host prep timed"
                        " separately (relay upload excluded, see"
                        " docstring)"
                    ),
                    "platform": jax.devices()[0].platform,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
