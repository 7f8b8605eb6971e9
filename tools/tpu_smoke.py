"""Compiled-mode (real TPU) regression smoke (VERDICT round-1 weak #3:
the test suite runs interpret-mode Pallas only, which hides Mosaic
lowering breakage — CLAUDE.md gotcha list).

Runs the two hot paths ON THE REAL CHIP against the PIL oracle:
  1. fused path   — decode_batch_on_device (wavefront+IDCT Pallas kernel
                    + fused upsample/color), bit-exact check
  2. coeff path   — decode(entropy=wavefront, transform=pallas):
                    coefficient-emitting kernel + separate transform

Writes one JSON line to stdout and to TPU_SMOKE.json at the repo root.
Geometries are fixed so repeat runs hit the persistent compile cache
(first run of a fresh cache compiles for minutes — this is expected).

Usage: python tools/tpu_smoke.py            (must see a TPU backend)
       python tools/tpu_smoke.py --allow-cpu  (logic check only)
"""

from __future__ import annotations

import io
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> int:
    from corpus import make_jpeg
    from PIL import Image

    import jax
    import tpujpeg
    from tpujpeg.config import DecodeConfig

    platform = jax.devices()[0].platform
    if platform not in ("tpu", "axon") and "--allow-cpu" not in sys.argv:
        print(json.dumps({"ok": False, "error": f"no TPU (got {platform})"}))
        return 1

    result = {"platform": platform, "checks": {}, "ok": True}

    def check(name, fn):
        t0 = time.perf_counter()
        try:
            exact = bool(fn())
            result["checks"][name] = {
                "exact": exact, "s": round(time.perf_counter() - t0, 2),
            }
            result["ok"] = result["ok"] and exact
        except Exception as e:
            result["checks"][name] = {
                "error": repr(e), "s": round(time.perf_counter() - t0, 2),
            }
            result["ok"] = False

    datas = [
        make_jpeg(512, 512, seed=s, quality=85, subsampling=2,
                  restart_blocks=8)
        for s in (1, 2)
    ]
    oracle = [np.asarray(Image.open(io.BytesIO(d))) for d in datas]

    def fused():
        res = tpujpeg.decode_batch_on_device(datas)
        assert not res.errors, res.errors
        engines = {s.entropy_engine for s in res.stats if s}
        result["checks"]["fused_engines"] = sorted(engines)
        return all(
            np.array_equal(np.asarray(img), ref)
            for img, ref in zip(res.images, oracle)
        )

    def coeff():
        cfg = DecodeConfig(entropy_engine="wavefront",
                           transform_engine="pallas")
        img, st = tpujpeg.decode(datas[0], cfg, return_stats=True)
        result["checks"]["coeff_engine"] = st.entropy_engine
        return np.array_equal(np.asarray(img), oracle[0])

    def norst():
        # Marker-free stream through the DC-primed fused pixels path
        # (skeleton-split lanes, lane_dc0 priming, full fused chain).
        from tpujpeg import bitstream
        from tpujpeg.kernels import wavefront_pallas as wp

        data = make_jpeg(512, 512, seed=3, quality=85, subsampling=2)
        ref = np.asarray(Image.open(io.BytesIO(data)))
        jpeg = bitstream.parse(data)
        assert len(jpeg.scans[0].rst_offsets) == 0
        rgb = wp.decode_norst_to_rgb(jpeg)
        return np.array_equal(np.asarray(rgb), ref)

    check("fused_batch_decode", fused)
    check("coeff_mode_decode", coeff)
    check("norst_fused_decode", norst)

    line = json.dumps(result)
    print(line)
    with open(os.path.join(REPO, "TPU_SMOKE.json"), "w") as f:
        f.write(line + "\n")
    return 0 if result["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
