"""Config-3 benchmark (BASELINE.json:9): a mixed-size shard of baseline
JPEGs decoded with decode_batch_on_device — geometry buckets, one fused
wavefront+IDCT+color launch per bucket, outputs resident in HBM.

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
    sizes = [(512, 512), (1024, 1024)]
    datas = []
    for i in range(n):
        w, h = sizes[i % len(sizes)]
        datas.append(
            make_jpeg(w, h, seed=100 + i, quality=85, subsampling=2,
                      restart_blocks=4)
        )
    mp = sum(w * h for (w, h), _ in
             [(sizes[i % len(sizes)], 0) for i in range(n)]) / 1e6

    from PIL import Image

    for d in datas[: len(sizes)]:
        Image.open(io.BytesIO(d)).load()
    t0 = time.perf_counter()
    for d in datas:
        Image.open(io.BytesIO(d)).load()
    anchor = mp / (time.perf_counter() - t0)

    import jax
    import tpujpeg
    from tpujpeg.config import DecodeConfig

    cfg = DecodeConfig(transform_engine="pallas", to_numpy=False)
    res = tpujpeg.decode_batch_on_device(datas, cfg)  # compile + warm
    assert not res.errors, res.errors

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = tpujpeg.decode_batch_on_device(datas, cfg)
        # Sync through small readbacks (one per geometry bucket).
        _ = np.asarray(res.images[0])[:1, :1]
        _ = np.asarray(res.images[1])[:1, :1]
        times.append(time.perf_counter() - t0)
    value = mp / min(times)
    ips = n / min(times)

    exact = bool(
        np.array_equal(
            np.asarray(res.images[0]),
            np.asarray(Image.open(io.BytesIO(datas[0]))),
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
                    "includes": "parse + plan + relay upload + on-chip decode",
                    "platform": jax.devices()[0].platform,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
