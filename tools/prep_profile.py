"""Host-prep cost split (round-3 lever: prep binds the pipelined
headline when the shared host is loaded). Times the three stages of
prep on the bench corpus, single thread:

  parse     bitstream.parse (markers, scan-end walk, rst offsets)
  destuff   native tj_destuff_rows into word rows (isolated rerun)
  plan      build_block_plan total (includes destuff; plan-only is
            plan_total - destuff)

Prints one JSON line of ms per 268 MP-equivalent and MP/s.
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
    repeats = int(os.environ.get("REPEATS", "3"))
    datas = [
        make_jpeg(size, size, seed=7 + i, quality=85, subsampling=2,
                  restart_blocks=rst)
        for i in range(nimg)
    ]
    total_mp = size * size * nimg / 1e6
    total_bytes = sum(len(d) for d in datas)

    from tpujpeg import bitstream
    from tpujpeg.kernels import wavefront_pallas as wp
    from tpujpeg.native import entropy as native_entropy

    native_entropy.destuff_rows  # build the lib before timing

    def best(fn):
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    jpegs = [bitstream.parse(d) for d in datas]
    parse_s = best(lambda: [bitstream.parse(d) for d in datas])

    plan = wp.build_block_plan(jpegs)
    plan_s = best(lambda: wp.build_block_plan(jpegs))

    # Row fill alone, same W as the plan used. Since the fused scan
    # walk (tj_scan_walk) parse destuffs inline, the plan's fill is
    # rows_from_dest (memcpy+pad+bswap); time both it and the old
    # memchr re-walk for the delta.
    W = plan.n_words

    def rows_only():
        for j in jpegs:
            scan = j.scans[0]
            n_seg = len(scan.rst_offsets) + 1
            rows = np.empty((n_seg, W), np.int32)
            sb = np.zeros(n_seg, np.int32)
            if scan.destuffed is not None:
                native_entropy.rows_from_dest(
                    scan.destuffed, scan.dseg_starts, 0, n_seg, W,
                    rows, sb,
                )
            else:
                native_entropy.destuff_rows(scan, n_seg, W, rows, sb)

    def destuff_rows_old():
        for j in jpegs:
            scan = j.scans[0]
            n_seg = len(scan.rst_offsets) + 1
            rows = np.empty((n_seg, W), np.int32)
            sb = np.zeros(n_seg, np.int32)
            native_entropy.destuff_rows(scan, n_seg, W, rows, sb)

    destuff_s = best(rows_only)
    destuff_old_s = best(destuff_rows_old)

    print(json.dumps({
        "total_mp": total_mp,
        "jpeg_mb": round(total_bytes / 1e6, 1),
        "parse": {"s": round(parse_s, 4),
                  "mp_per_s": round(total_mp / parse_s, 1)},
        "rows_fill": {"s": round(destuff_s, 4),
                      "mp_per_s": round(total_mp / destuff_s, 1)},
        "destuff_rows_old_s": round(destuff_old_s, 4),
        "plan_total": {"s": round(plan_s, 4),
                       "mp_per_s": round(total_mp / plan_s, 1)},
        "plan_minus_destuff_s": round(plan_s - destuff_s, 4),
        "prep_total_s": round(parse_s + plan_s, 4),
        "prep_mp_per_s": round(total_mp / (parse_s + plan_s), 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
