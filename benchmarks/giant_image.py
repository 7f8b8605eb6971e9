"""Giant-image decode benchmark (config 5 family, BASELINE.json:11):
one huge restart-segmented JPEG decoded fully on-chip — every restart
segment becomes a wavefront lane, so a single image saturates the chip
the same way a batch does. (True multi-host MCU-row sharding with ICI
halo exchange lives in tpujpeg/parallel/halo.py and benchmarks/
scaling.py; this measures the single-chip giant-image path.)

Usage: python benchmarks/giant_image.py  -> one JSON line.
Env: GIANT_SIZE (default 8192), GIANT_RST_BLOCKS (default 2).
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

    size = int(os.environ.get("GIANT_SIZE", "8192"))
    rst = int(os.environ.get("GIANT_RST_BLOCKS", "2"))
    data = make_jpeg(size, size, seed=11, quality=85, subsampling=2,
                     restart_blocks=rst)
    mp = size * size / 1e6

    from PIL import Image

    im = Image.open(io.BytesIO(data)); im.load()  # warm
    t0 = time.perf_counter()
    im = Image.open(io.BytesIO(data)); im.load()
    anchor = mp / (time.perf_counter() - t0)

    import jax
    import jax.numpy as jnp
    import tpujpeg
    from tpujpeg import bitstream
    from tpujpeg.config import DecodeConfig
    from tpujpeg.kernels import wavefront_pallas as wp

    cfg = DecodeConfig(transform_engine="pallas")
    csum = jax.jit(lambda x: jnp.sum(x.astype(jnp.int32)))

    jpeg = bitstream.parse(data)
    rgb, failures = wp.decode_batch_to_rgb([jpeg], cfg)
    _ = int(csum(rgb))  # compile + warm (true sync)
    assert not failures

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        jpeg = bitstream.parse(data)
        rgb, _f = wp.decode_batch_to_rgb([jpeg], cfg)
        _ = int(csum(rgb))
        times.append(time.perf_counter() - t0)
    value = mp / min(times)

    exact = bool(np.array_equal(np.asarray(rgb[0]), np.asarray(im)))
    print(
        json.dumps(
            {
                "metric": f"giant_image_onchip_decode_mp_per_s_{size}x{size}",
                "value": round(value, 1),
                "unit": "MP/s",
                "vs_baseline": round(value / anchor, 3),
                "detail": {
                    "libjpeg_turbo_1core_mp_per_s": round(anchor, 1),
                    "bit_exact_vs_pil": exact,
                    "includes": "parse + plan + relay upload + full on-chip decode",
                    "platform": jax.devices()[0].platform,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
