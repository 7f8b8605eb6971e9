"""Headline benchmark: decode MP/s on baseline 4:2:0 JPEG (BASELINE.json:2).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MP/s", "vs_baseline": N}

vs_baseline is measured against the same workload decoded by
PIL/libjpeg-turbo on one CPU core of this host — the ×1 anchor from
BASELINE.md (the reference publishes no numbers; BASELINE.json:13).
The north-star target is vs_baseline > 2.0 per chip (BASELINE.json:5).
"""

from __future__ import annotations

import io
import json
import os
import sys
import time

import numpy as np


def _pil_mp_per_s(data: bytes, mp: float, repeats: int) -> float:
    from PIL import Image

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        im = Image.open(io.BytesIO(data))
        im.load()
        times.append(time.perf_counter() - t0)
    return mp / min(times)


def main() -> int:
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from corpus import make_jpeg

    size = int(os.environ.get("BENCH_SIZE", "2048"))
    quality = int(os.environ.get("BENCH_QUALITY", "85"))
    repeats = int(os.environ.get("BENCH_REPEATS", "5"))

    # Restart markers every MCU row: the segment-parallel substrate the
    # wavefront decoder exploits (SURVEY.md §3.4); libjpeg decodes the
    # same file, so the anchor is apples-to-apples.
    data = make_jpeg(
        size, size, seed=7, quality=quality, subsampling=2, restart_rows=1
    )
    mp = size * size / 1e6

    import tpujpeg

    # Warm-up: trigger compilation + engine selection.
    out, stats = tpujpeg.decode(data, return_stats=True)
    pil = __import__("PIL.Image", fromlist=["Image"]).open(io.BytesIO(data))
    exact = bool(np.array_equal(out, np.asarray(pil)))

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        tpujpeg.decode(data)
        times.append(time.perf_counter() - t0)
    ours = mp / min(times)

    anchor = _pil_mp_per_s(data, mp, repeats)

    print(
        json.dumps(
            {
                "metric": f"decode_mp_per_s_{size}x{size}_q{quality}_420_baseline",
                "value": round(ours, 2),
                "unit": "MP/s",
                "vs_baseline": round(ours / anchor, 3),
                "detail": {
                    "libjpeg_turbo_1core_mp_per_s": round(anchor, 2),
                    "bit_exact_vs_pil": exact,
                    "entropy_engine": stats.entropy_engine,
                    "transform_engine": stats.transform_engine,
                    "platform": __import__("jax").devices()[0].platform,
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
