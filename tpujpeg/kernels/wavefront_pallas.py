"""Block-synchronous wavefront Huffman decoder as a single Pallas TPU
kernel (SURVEY.md §7.2 hard-part 1 — the "speed-of-light" entropy path;
BASELINE.json:5 "wavefront Huffman entropy decoder ... into HBM").

Why a second formulation: the XLA wavefront (wavefront.py) spends its
time on per-symbol kernel launches (gathers break fusion) and on the
final sorted scatter. This kernel keeps the whole decode in VMEM with
ZERO gathers, scatters, or sorts:

  * lanes (restart segments) advance in lockstep through ONE MCU per
    grid step; the B block positions of the MCU are a static python
    loop, so components, tables and geometry are compile-time constants;
  * within a block, the DC symbol is a lockstep step for every lane and
    the AC symbols run under a while_loop with per-lane done masks — at
    any instant every active lane is doing the same kind of work;
  * Huffman decode is canonical (T.81 F.2.2.3): code length from 16
    static maxcode comparisons, symbol value from a static binary
    select tree over huffval (equal-subtree pruning keeps it ~100 ops);
  * the bitstream is pre-sliced into per-lane rows; the 64-bit window
    is fetched by a one-hot masked reduction over the row's words;
  * coefficients accumulate into a dense [64, lanes] block register via
    a one-hot(k) update and are written ONCE per block to the dense
    output — no emission buffers, no sort, no scatter. The output
    [group, mcu, b, 64, lane] maps onto the coefficient tensor with
    static reshape/transposes (kernels/wavefront_pallas.assemble).

Scope: uniform batches (every scan shares geometry/tables — the batch
bucket case). Non-uniform batches use the XLA wavefront or the native
host decoder. Lanes per group and words per lane are bounded by VMEM;
oversize segments fall back too.
"""

from __future__ import annotations

import collections
import dataclasses
import functools
import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import bitstream
from ..config import DEFAULT_CONFIG, DecodeConfig
from ..errors import (
    JpegHuffmanError,
    JpegSyntaxError,
    JpegTruncatedError,
    JpegUnsupportedError,
)
from . import wavefront as wf_xla

LANE_GROUP = 2048          # default lanes per kernel grid group
MAX_GROUP = 8192           # widest group the VMEM budget allows
SUBLANES = 8

# AC symbols decoded per while_loop trip. The hot loop is LATENCY-bound
# on its dependency chain (CLAUDE.md, session-3 probes); loop state
# lives in VMEM scratch refs, so every trip pays a scratch read/write
# round plus the cond's any-reduce. Unrolling two symbols per trip
# keeps (cur, k, err, w0, w1) in registers between the pair and
# amortizes those per-trip costs over two symbols. Env knob for A/B
# profiling on the chip (build-time constant; tools run one per proc).
# Measured (v5e, 2048^2 q85 4:2:0 batch 64, width 4096, kernel-only):
# 1 sym/trip 4596 MP/s -> 2 syms/trip 4728 MP/s (+2.9%); 3/trip 4702
# (divergence waste outgrows the amortization — 2 is the knee). Post-
# unroll, wider groups no longer help either: 8192 = 4678, 16384 = 4485
# (tools/vmem_probe.py with the scoped pool raised to 48 MB), so the
# unroll and the width were hiding the SAME per-trip latency.
AC_SYMS_PER_TRIP = max(1, int(os.environ.get("TJ_AC_SYMS", "2")))
MAX_WORDS = 512            # per-lane bitstream words cap (VMEM)
MAX_QSETS = 8              # distinct quantizer sets one fused launch takes
# _pick_group's scoped-VMEM budget (MB); see its docstring.
VMEM_BUDGET_MB = int(os.environ.get("TJ_VMEM_BUDGET_MB", "10"))


def _pick_group(W: int, n_lanes: int, out_words: int) -> int:
    """Lanes per lockstep group. The per-symbol hot loop is LATENCY-bound
    on its dependency chain (measured: halving the scatter's vector-op
    count moved nothing, while 4x wider groups ran ~16% faster), so wider
    groups are free throughput up to the 16 MB scoped-VMEM wall. Budget
    model, validated against the compiler's own OOM report (13.55 MB for
    the 4:2:0 pixels kernel at 8192 lanes, W=96): the bitstream input
    block and the output blocks are double-buffered by Mosaic; scratch
    (32-row packed accumulator + ~8 rows of loop state) is not.
    out_words = output words per lane per MCU (pixels: sum of v*8*h*2
    per scan component; coeff: blocks_per_mcu * 64).

    The budget is 10 MB, not the 16 MB hardware limit: inside a fused
    chain XLA overlaps the pallas call with neighboring fusions that
    share the scoped-vmem pool (measured: the same kernel that fit in
    13.55 MB standalone was charged 19.76 MB inside bench's rgb chain
    and OOM'd), so the kernel must leave headroom for co-scheduled
    copies. TJ_VMEM_BUDGET_MB overrides for probes that also raise the
    compiler's pool via xla_tpu_scoped_vmem_limit_kib (tools/
    vmem_probe.py — per-jit compiler_options DOES ride the axon remote
    compile: 8192/16384-lane chains compiled fine at a 48 MB pool, but
    post-unroll they time WORSE than 4096, so the default stays put)."""
    if jax.default_backend() != "tpu":
        # Interpret mode (CPU tests) executes REAL vector work
        # proportional to lane_group: padding a tiny test image's ~30
        # lanes to the TPU's 2048-lane lockstep group made every
        # interpret-mode kernel pay ~64x the arithmetic — measured
        # 415 s to EXECUTE one 48x40 progressive chain, which is what
        # actually made the cold suite hours long (round-4 blamed
        # compiles; phase-split measurement says execution). Mosaic's
        # (8, 128) tiling doesn't apply in interpret mode, so the
        # group shrinks to the real lane count.
        return max(SUBLANES, -(-n_lanes // SUBLANES) * SUBLANES)
    per_lane = 4 * (2 * W + 2 * max(out_words, 1) + 40)
    g = MAX_GROUP
    budget = VMEM_BUDGET_MB << 20
    while g > LANE_GROUP and g * per_lane > budget:
        g //= 2
    # Don't pad a small batch past the next power of two.
    while g > LANE_GROUP and g >= 2 * max(n_lanes, 1):
        g //= 2
    return g

_ERR_BADCODE = 1
_ERR_RUN = 2
_ERR_TRUNC = 4


# ---------------------------------------------------------------------------
# Static Huffman table data (python constants baked into the kernel)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class CanonTable:
    """Canonical decode constants for one Huffman table: maxcode /
    valoffset per code length (T.81 F.2.2.3) + the symbol list."""

    maxcode: Tuple[int, ...]    # [17], -1 where no codes
    valoffset: Tuple[int, ...]  # [17]
    huffval: Tuple[int, ...]    # [256] padded

    @staticmethod
    def from_spec(spec: bitstream.HuffSpec) -> "CanonTable":
        key = spec.counts.tobytes() + spec.values.tobytes()
        hit = _CANON_CACHE.get(key)
        if hit is not None:
            return hit
        out = CanonTable._build(spec)
        _CANON_CACHE[key] = out
        return out

    @staticmethod
    def _build(spec: bitstream.HuffSpec) -> "CanonTable":
        maxcode = [-1] * 17
        valoffset = [0] * 17
        code = 0
        k = 0
        for l in range(1, 17):
            n = int(spec.counts[l - 1])
            if n:
                valoffset[l] = k - code
                code += n
                k += n
                maxcode[l] = code - 1
            code <<= 1
        hv = [int(v) for v in spec.values] + [0] * (256 - len(spec.values))
        return CanonTable(tuple(maxcode), tuple(valoffset), tuple(hv))


_CANON_CACHE: Dict[bytes, "CanonTable"] = {}


def _select_tree(idx: jnp.ndarray, values: Sequence[int]) -> jnp.ndarray:
    """values[idx] with a static binary select tree (no gather). Equal
    subtrees are pruned, which collapses the padded tail of sparse
    tables. idx must be in [0, len(values))."""
    vals: List = list(values)
    bit = 1
    while len(vals) > 1:
        nv = []
        for i in range(0, len(vals), 2):
            a, b = vals[i], vals[i + 1]
            if isinstance(a, int) and isinstance(b, int) and a == b:
                nv.append(a)
            else:
                nv.append(jnp.where((idx & bit) != 0, b, a))
        vals = nv
        bit <<= 1
    out = vals[0]
    if isinstance(out, int):
        return jnp.full_like(idx, out)
    return out


def _select_bytes(idx: jnp.ndarray, values: Sequence[int]) -> jnp.ndarray:
    """values[idx] for byte-sized values: pack 4 values per int32 so the
    select tree is 4x shallower (63 selects for 256 entries instead of
    255 — the tree was the single hottest op in the wavefront hot loop),
    then extract the byte by (idx & 3). Bit-identical to _select_tree."""
    assert len(values) % 4 == 0 and all(0 <= v <= 255 for v in values)
    packed = [
        values[i] | (values[i + 1] << 8) | (values[i + 2] << 16)
        | (values[i + 3] << 24)
        for i in range(0, len(values), 4)
    ]
    # Keep int32 range: bit 31 set means a negative python int32 literal.
    packed = [p - (1 << 32) if p >= (1 << 31) else p for p in packed]
    word = _select_tree(idx >> 2, packed)
    sh = (idx & 3) << 3
    # Arithmetic >> on possibly-negative words: the final & 0xFF masks
    # the sign-extension away.
    return (word >> sh) & 0xFF


# ---------------------------------------------------------------------------
# Plan
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class BlockPlan:
    bits: np.ndarray        # int32[G, 8, K, W] per-lane bitstream rows
    seg_bits: np.ndarray    # int32[G, 8, K] true bit length per lane
    lane_m: np.ndarray      # int32[G, 8, K] MCUs per lane
    n_groups: int
    n_mcus: int             # grid MCU rounds (max lane MCUs)
    n_words: int            # W
    blocks_per_mcu: int
    # Static per-block-position: (comp_index, dc CanonTable, ac CanonTable)
    blk_tables: Tuple[Tuple[int, CanonTable, CanonTable], ...]
    # Static per-scan-component (ci, h, v) in scan order — the pixels
    # emit layout writes one output per scan component, tiled
    # [v*8 rows, h*2 words] per MCU. Non-interleaved scans use (ci,1,1).
    comp_hv: Tuple[Tuple[int, int, int], ...]
    # Geometry for assembly:
    frame_key: Tuple
    lane_meta: np.ndarray   # int32[L, 3]: (img, first_mcu, n_mcus)
    n_lanes: int
    images: int
    # Static zigzag quantizer per block position of the FIRST quantizer
    # set (kept for single-set callers/back-compat; None only when the
    # batch has more than MAX_QSETS distinct sets).
    qtabs: Optional[Tuple[Tuple[int, ...], ...]] = None
    # All distinct quantizer sets in the batch + each image's index into
    # them: the pixels-mode kernel selects dequant constants per lane by
    # one-hot over qsets, so a q85/q86 pair shares one fused launch.
    qsets: Tuple[Tuple[Tuple[int, ...], ...], ...] = ()
    img_qset: Tuple[int, ...] = ()
    lane_qset: Optional[np.ndarray] = None  # int32[G, 8, K]
    # No-restart plans only: starting bit of each lane within its word
    # row (lanes split at skeleton-scan bit offsets), and MCUs per lane.
    bit0: Optional[np.ndarray] = None  # int32[G, 8, K]
    # No-restart plans only: ABSOLUTE DC predictor value per component
    # at each lane's first MCU, computed by the host skeleton scan. The
    # kernel primes pred_ref with it, so lanes decode TRUE DCs — the
    # fused pixels emit (IDCT in-kernel) works and coeff mode needs no
    # post-hoc prefix fixup.
    lane_dc0: Optional[np.ndarray] = None  # int32[G, 4, 8, K]
    norst_every: int = 0
    # Marker-segment id per lane + first lane of each marker segment:
    # DC predictors reset at marker boundaries, so the prefix fixup is a
    # SEGMENTED exclusive cumsum over these groups.
    lane_seg: Optional[np.ndarray] = None  # int64[L]
    seg_first: Optional[np.ndarray] = None  # int64[n_marker_segments]
    # Lanes per lockstep group this plan's arrays are shaped for
    # (_pick_group); kernels and assembly read it from here.
    lane_group: int = LANE_GROUP

    def static_key(self, emit: str) -> Tuple:
        """The static config tuple run_wavefront/_make_kernel key on."""
        if emit == "coeff":
            return (
                self.blocks_per_mcu, self.blk_tables, self.n_words,
                self.n_mcus, "coeff", None, (), self.lane_group,
            )
        return (
            self.blocks_per_mcu, self.blk_tables, self.n_words,
            self.n_mcus, "pixels", self.qsets, self.comp_hv,
            self.lane_group,
        )


def _comp_hv_of(frame, scan) -> Tuple[Tuple[int, int, int], ...]:
    """(ci, h, v) per scan component for the pixels emit layout."""
    if scan.interleaved:
        return tuple(
            (ci, frame.components[ci].h, frame.components[ci].v)
            for ci in scan.comp_indices
        )
    return ((scan.comp_indices[0], 1, 1),)


def build_block_plan(
    jpegs: Sequence[bitstream.JpegData],
    min_words: int = 0,
    emit_hint: str = "pixels",
) -> BlockPlan:
    """Uniform-batch plan for the Pallas kernel. Raises
    JpegUnsupportedError when the batch doesn't fit the kernel's scope
    (caller falls back to the XLA wavefront / native decoder)."""
    if not jpegs:
        raise JpegUnsupportedError("empty batch")
    f0 = jpegs[0].frame
    key0 = (
        f0.height, f0.width, tuple((c.h, c.v) for c in f0.components),
    )

    seg_rows: List[np.ndarray] = []
    seg_bits: List[np.ndarray] = []
    lane_meta: List[np.ndarray] = []
    blk_tables: Optional[Tuple] = None
    max_words = 0
    max_mcus = 0
    qset_index: Dict[Tuple, int] = {}
    qset_values: List[Tuple] = []
    img_qset: List[int] = []

    for img_i, jpeg in enumerate(jpegs):
        frame = jpeg.frame
        if frame.progressive:
            raise JpegUnsupportedError("pallas wavefront: baseline only")
        key = (
            frame.height, frame.width,
            tuple((c.h, c.v) for c in frame.components),
        )
        if key != key0:
            raise JpegUnsupportedError("pallas wavefront: mixed geometry")
        if len(jpeg.scans) != 1:
            raise JpegUnsupportedError("pallas wavefront: one scan only")
        scan = jpeg.scans[0]
        if not scan.interleaved and frame.n_components != 1:
            raise JpegUnsupportedError(
                "pallas wavefront: non-interleaved multi-component scan"
            )

        tables: List[Tuple[int, CanonTable, CanonTable]] = []
        if scan.interleaved:
            for sp, ci in enumerate(scan.comp_indices):
                c = frame.components[ci]
                dk, ak = (0, scan.dc_ids[sp]), (1, scan.ac_ids[sp])
                if dk not in scan.huff or ak not in scan.huff:
                    raise JpegSyntaxError("missing Huffman table")
                dct = CanonTable.from_spec(scan.huff[dk])
                act = CanonTable.from_spec(scan.huff[ak])
                for _v in range(c.v):
                    for _h in range(c.h):
                        tables.append((ci, dct, act))
        else:
            dk, ak = (0, scan.dc_ids[0]), (1, scan.ac_ids[0])
            if dk not in scan.huff or ak not in scan.huff:
                raise JpegSyntaxError("missing Huffman table")
            tables.append(
                (
                    scan.comp_indices[0],
                    CanonTable.from_spec(scan.huff[dk]),
                    CanonTable.from_spec(scan.huff[ak]),
                )
            )
        tables_t = tuple(tables)
        if blk_tables is None:
            blk_tables = tables_t
        elif blk_tables != tables_t:
            raise JpegUnsupportedError("pallas wavefront: mixed tables")

        # Key distinct quantizer sets by raw table bytes (cheap); the
        # int-tuple form the kernel closes over is built once per
        # distinct set, not per image (host-prep hot path).
        qkey = tuple(
            jpeg.qtables[frame.components[ci].tq].tobytes()
            for ci, _d, _a in tables
        )
        idx = qset_index.get(qkey)
        if idx is None:
            idx = len(qset_index)
            qset_index[qkey] = idx
            qset_values.append(
                tuple(
                    tuple(int(x) for x in jpeg.qtables[frame.components[ci].tq])
                    for ci, _d, _a in tables
                )
            )
        img_qset.append(idx)

        if scan.interleaved:
            total_mcus = frame.mcus_x * frame.mcus_y
        else:
            c0 = frame.components[scan.comp_indices[0]]
            total_mcus = c0.width_blocks * c0.height_blocks
        # Per-image restart intervals are fine: the kernel's lanes carry
        # their own MCU counts and predictors, and assembly slices each
        # image's lanes to its own rows-per-lane before flattening.
        ri = scan.restart_interval or total_mcus
        n_seg = -(-total_mcus // ri)
        if len(scan.rst_offsets) + 1 < n_seg:
            raise JpegTruncatedError("missing restart segments")
        if (
            scan.destuffed is not None
            and scan.dseg_starts is not None
            and len(scan.dseg_starts) >= n_seg + 1
        ):
            # parse()'s fused walk already destuffed: size rows by the
            # EXACT segment lengths (can be a 32-word bucket tighter
            # than the stuffed bound, and the kernel's per-symbol word
            # walk prices every row word).
            ds = scan.dseg_starts
            stuffed = ds[1 : n_seg + 1] - ds[:n_seg]
        else:
            # Stuffed segment lengths bound the destuffed row size
            # (never expands), so rows can be sized without destuffing.
            ro = np.asarray(scan.rst_offsets[: n_seg - 1], dtype=np.int64)
            offs_r = np.concatenate([ro, [len(scan.data)]])
            starts_r = np.concatenate([[0], ro + 2])
            stuffed = offs_r - starts_r
        seg_rows.append((scan, n_seg))
        fm = np.arange(n_seg, dtype=np.int64) * ri
        nm = np.minimum(ri, total_mcus - fm).astype(np.int32)
        lane_meta.append(
            np.stack(
                [np.full(n_seg, img_i, np.int32), fm.astype(np.int32), nm],
                axis=1,
            )
        )
        max_words = max(
            max_words, int(stuffed.max()) // 4 + 2 if n_seg else 0
        )
        max_mcus = max(max_mcus, int(nm.max()) if n_seg else 0)

    max_words = max(max_words, min_words)
    if max_words > MAX_WORDS:
        raise JpegUnsupportedError(
            f"pallas wavefront: segment too long ({max_words} words)"
        )
    # Quantize the row width to 32-word buckets: W is the max *stuffed*
    # segment length, which jitters with image content, and W is a
    # static shape in the jitted chain — without bucketing, every chunk
    # of a stream would compile its own program (minutes each through a
    # remote-compile backend). The bucket also prices the kernel's
    # per-symbol word load, which walks all W words per lane (one-hot),
    # so a tight bucket is chip time: 64-word buckets cost the q85
    # bench corpus (~94-word segments) a 128-word walk, 36% more than
    # the 96 words a 32-bucket gives it.
    max_words = min(-(-max_words // 32) * 32, MAX_WORDS)

    lane_meta = np.concatenate(lane_meta, axis=0)
    L = len(lane_meta)
    W = max_words
    comp_hv = _comp_hv_of(jpegs[0].frame, jpegs[0].scans[0])
    if emit_hint == "coeff":
        out_words = len(blk_tables) * 64
    else:
        out_words = sum(v * 8 * h * 2 for _ci, h, v in comp_hv)
    lane_group = _pick_group(W, L, out_words)
    G = -(-L // lane_group)
    K = lane_group // SUBLANES

    # Destuff every segment straight into fixed-width byte-swapped word
    # rows — one threaded native pass per image (tj_destuff_rows); the
    # pure-python fallback packs rows with a masked scatter.
    bits_flat = np.empty((G * lane_group, W), dtype=np.int32)
    seg_bits = np.zeros(G * lane_group, dtype=np.int32)
    lane0 = 0
    try:
        from ..native import entropy as native_entropy

        native_entropy.destuff_rows  # force the lazy lib build early
        lane0 = 0
        for scan, n_seg in seg_rows:
            # len() guard mirrors the sizing paths: protects the C-side
            # seg_starts[s+1] read from a short cache (see _fill_rows).
            if (
                scan.destuffed is not None
                and scan.dseg_starts is not None
                and len(scan.dseg_starts) >= n_seg + 1
            ):
                # Fused-walk parse: rows are a memcpy + pad + byte-swap
                # of the already-destuffed buffer (no memchr re-walk).
                native_entropy.rows_from_dest(
                    scan.destuffed, scan.dseg_starts, 0, n_seg, W,
                    bits_flat[lane0 : lane0 + n_seg],
                    seg_bits[lane0 : lane0 + n_seg],
                )
            else:
                native_entropy.destuff_rows(
                    scan, n_seg, W,
                    bits_flat[lane0 : lane0 + n_seg],
                    seg_bits[lane0 : lane0 + n_seg],
                )
            lane0 += n_seg
    # The native build can fail many ways (no g++: OSError /
    # CalledProcessError, not just ImportError); the pure-python row
    # packer below handles all of them. Genuine decode errors (JpegError)
    # are not build failures and must surface.
    except JpegSyntaxError:
        raise
    except Exception:
        lane0 = 0
        for scan, n_seg in seg_rows:
            pieces = bitstream.split_restart_segments(scan)[:n_seg]
            lens = np.asarray([len(pc) for pc in pieces], np.int64)
            rows_u8 = np.full((n_seg, W * 4), 0xFF, np.uint8)
            mask = np.arange(W * 4, dtype=np.int64)[None, :] < lens[:, None]
            rows_u8[mask] = np.frombuffer(b"".join(pieces), np.uint8)
            bits_flat[lane0 : lane0 + n_seg] = (
                rows_u8.view(">u4").astype(np.uint32).view(np.int32)
            )
            seg_bits[lane0 : lane0 + n_seg] = (lens * 8).astype(np.int32)
            lane0 += n_seg
    # Pad lanes: all-ones bitstream, zero MCUs (never decoded).
    if lane0 < G * lane_group:
        bits_flat[lane0:] = -1
    bits = bits_flat.reshape(G, SUBLANES, K, W)
    sb = seg_bits
    lm = np.zeros(G * lane_group, np.int32)
    lm[:L] = lane_meta[:, 2]

    qsets = tuple(qset_values)  # insertion-ordered: index s -> qset s
    lq = np.zeros(G * lane_group, np.int32)
    lq[:L] = np.asarray(img_qset, np.int32)[lane_meta[:, 0]]

    return BlockPlan(
        bits=bits,
        seg_bits=sb.reshape(G, SUBLANES, K),
        lane_m=lm.reshape(G, SUBLANES, K),
        n_groups=G,
        n_mcus=max_mcus,
        n_words=W,
        blocks_per_mcu=len(blk_tables),
        blk_tables=blk_tables,
        comp_hv=comp_hv,
        frame_key=key0,
        lane_meta=lane_meta,
        n_lanes=L,
        images=len(jpegs),
        qtabs=qsets[0] if len(qsets) == 1 else None,
        qsets=qsets if len(qsets) <= MAX_QSETS else (),
        img_qset=tuple(img_qset),
        lane_qset=lq.reshape(G, SUBLANES, K),
        lane_group=lane_group,
    )


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _window64(bits, cur, W):
    """64-bit window at bit offset `cur` ([8,K] int32) from the
    lane's word row (int32 storage): two binary-fold loads, no gather.
    Mosaic can't reduce unsigned ints, so the select runs in int32 and
    the result is bitcast to uint32 for logical shifts."""
    w = cur >> 5
    hi = jax.lax.bitcast_convert_type(_load_word(bits, w, W), jnp.uint32)
    lo = jax.lax.bitcast_convert_type(
        _load_word(bits, w + 1, W), jnp.uint32
    )
    sh = (cur & 31).astype(jnp.uint32)
    win = (hi << sh) | jnp.where(
        sh == 0, jnp.uint32(0), lo >> (np.uint32(32) - sh)
    )
    return win


def _decode_symbol_win(win, tbl: CanonTable):
    """One canonical Huffman symbol for every lane from a ready 32-bit
    window. Returns (sym, code_len) — code_len 17 marks an invalid
    code."""
    length = jnp.full(win.shape, 17, jnp.int32)
    idx = jnp.zeros(win.shape, jnp.int32)
    # Walk lengths high to low so the SHORTEST valid length wins; the
    # huffval index (code + valoffset) rides along in the same pass.
    for l in range(16, 0, -1):
        if tbl.maxcode[l] < 0:
            continue
        peek = (win >> np.uint32(32 - l)).astype(jnp.int32)
        sel = peek <= tbl.maxcode[l]
        length = jnp.where(sel, l, length)
        idx = jnp.where(sel, peek + tbl.valoffset[l], idx)
    idx = jnp.clip(idx, 0, 255)
    sym = _select_bytes(idx, tbl.huffval)
    return sym, length


def _decode_symbol(bits, cur, tbl: CanonTable, W):
    """One canonical Huffman symbol for every lane. Returns
    (sym, code_len, window) — code_len 17 marks an invalid code."""
    win = _window64(bits, cur, W)
    sym, length = _decode_symbol_win(win, tbl)
    return sym, length, win


def _load_word(bits, w, W):
    """bits[w] per lane ([8, K] int32 indices) via an MSB-first binary
    fold: ~P selects for P = next pow2 >= W — the gather emulation on
    the per-symbol hot path, ~3x fewer vector ops than the one-hot
    masked reduction it replaces (compare+mul+reduce = 3W).

    Out-of-range w (W / W+1, reached only at stream end where every
    consumer lane is masked) reads a deterministic in-bounds slot —
    same don't-care contract as the one-hot's zero."""
    P = 1 << max(W - 1, 1).bit_length()
    A = bits
    if P != W:
        A = jnp.concatenate(
            [A, jnp.zeros((P - W,) + bits.shape[1:], bits.dtype)], axis=0
        )
    half = P // 2
    while half >= 1:
        sel = (w & half) != 0
        lo, hi = A[:half], A[half:]
        if half > 1:
            A = jnp.where(sel[None], hi, lo)
        else:
            A = jnp.where(sel, hi[0], lo[0])
        half //= 2
    return A


def _win_from_regs(w0, w1, cur):
    """32-bit window at `cur` from the register word pair (w0, w1) =
    bits[cur>>5], bits[(cur>>5)+1] — no VMEM one-hot on the hot path."""
    hi = jax.lax.bitcast_convert_type(w0, jnp.uint32)
    lo = jax.lax.bitcast_convert_type(w1, jnp.uint32)
    sh = (cur & 31).astype(jnp.uint32)
    return (hi << sh) | jnp.where(
        sh == 0, jnp.uint32(0), lo >> (np.uint32(32) - sh)
    )


def _advance_regs(bits, w0, w1, cur, cur2, W):
    """Slide the register pair after consuming cur2-cur (< 33) bits: at
    most one word boundary is crossed per symbol (code<=17 + magnitude
    <=15 bits), so w0 inherits w1 on a crossing and w1 reloads — ONE
    one-hot load per symbol where the stateless window paid two."""
    crossed = (cur2 >> 5) != (cur >> 5)
    # When not crossed, (cur2>>5)+1 is w1's own index: the load returns
    # w1 again, so the unconditional assignment is correct either way.
    w1n = _load_word(bits, (cur2 >> 5) + 1, W)
    return jnp.where(crossed, w1, w0), w1n


def _receive_extend(win, length, size):
    """Magnitude bits follow the code inside the same window."""
    after = (win << length.astype(jnp.uint32)).astype(jnp.uint32)
    mag = jnp.where(
        size > 0,
        (after >> (np.uint32(32) - size.astype(jnp.uint32))).astype(
            jnp.int32
        ),
        0,
    )
    return jnp.where(
        (size > 0) & (mag < (1 << jnp.maximum(size - 1, 0))),
        mag - (1 << size) + 1,
        mag,
    )


def _make_kernel(plan_static):
    """Build the kernel function for one static config. plan_static =
    (B, blk_tables, W, n_mcus, emit, qsets, comp_hv): emit='coeff'
    writes zigzag coefficient blocks; emit='pixels' fuses dequant +
    islow IDCT + level-shift into the epilogue (the completed block's
    coefficients are already in registers, so the butterflies are
    nearly free and the int32 coefficient round-trip through HBM
    disappears) and writes, PER SCAN COMPONENT, int32 words of 4
    raster-adjacent uint8 samples tiled [v*8 rows, h*2 words] per MCU —
    the whole MCU row of a component is raster-contiguous in the
    output, which turns downstream assembly into two large-granule
    int32 transposes (see assemble_pixels). qsets (pixels mode only) is the tuple of distinct
    static quantizer sets in the batch; each lane picks its set via a
    one-hot over its lane_qset index, so mixed-quantizer batches still
    share one fused launch (a single set degenerates to bare
    constants)."""
    (B, blk_tables, W, n_mcus, emit, qsets, comp_hv,
     lane_group) = plan_static
    K = lane_group // SUBLANES

    receive_extend = _receive_extend

    # Block position -> (scan comp index, dv, dh); blk_tables is built
    # per scan component in v-major then h order (build_block_plan).
    b_pos: List[Tuple[int, int, int]] = []
    if emit == "pixels":
        for sp, (_ci, h, v) in enumerate(comp_hv):
            for dv in range(v):
                for dh in range(h):
                    b_pos.append((sp, dv, dh))
        assert len(b_pos) == B, (len(b_pos), B)

    def kernel(lane_m_ref, bits_ref, lane_q_ref, bit0_ref, dc0_ref, outs,
               err_ref, cur_ref, end_ref, pred_ref, err_acc_ref,
               w0_ref, w1_ref, acc_ref, k_ref):
        m = pl.program_id(1)
        bits = bits_ref[0]          # [W, 8, K]
        lane_m = lane_m_ref[0]      # [8, K]
        nq = len(qsets) if emit == "pixels" else 0
        if nq > 1:
            lane_q = lane_q_ref[0]  # [8, K] quantizer-set index per lane
            qsel = [
                (lane_q == s).astype(jnp.int32) for s in range(nq)
            ]

        @pl.when(m == 0)
        def _init():
            # bit0: starting bit within the lane's word row — zero for
            # restart segments (rows start at marker boundaries), the
            # sub-word offset for no-restart streams split at arbitrary
            # skeleton-scan bit positions.
            c0 = bit0_ref[0]
            cur_ref[:] = c0
            # dc0: zero for restart segments (T.81 predictor reset at
            # markers); the host skeleton scan's absolute predictor for
            # no-restart lanes split mid-stream — primed lanes decode
            # TRUE DCs, so fused IDCT needs no post-hoc fixup.
            pred_ref[:] = dc0_ref[0]
            err_acc_ref[:] = jnp.zeros((SUBLANES, K), jnp.int32)
            w0_ref[:] = _load_word(bits, c0 >> 5, W)
            w1_ref[:] = _load_word(bits, (c0 >> 5) + 1, W)

        active = m < lane_m          # [8, K] lanes that have this MCU
        # The AC accumulator packs TWO 16-bit coefficients per int32 row
        # (row r holds zigzag 2r in the low half, 2r+1 in the high half):
        # every (run,size) symbol writes exactly one never-before-written
        # slot (k is strictly increasing within a block), so the scatter
        # can OR instead of ADD — no carries between halves — and the
        # [64, 8, K] one-hot update becomes a [32, 8, K] one, halving the
        # hot loop's biggest per-symbol cost. Magnitudes fit int16 by
        # construction (size <= 15 -> EXTEND range (-32768, 32767]).
        # (A true int16 accumulator was tried first: v5e Mosaic rejects
        # i16 vector compares — "Target does not support this
        # comparison" — so the packing stays int32-typed.)
        kiota = jax.lax.broadcasted_iota(
            jnp.int32, (32, SUBLANES, K), 0
        )

        for b in range(B):
            ci, dct, act = blk_tables[b]
            cur = cur_ref[:]
            w0 = w0_ref[:]
            w1 = w1_ref[:]
            err = err_acc_ref[:]
            ok = active & (err == 0)

            # --- DC: one lockstep symbol for every lane. ---
            win = _win_from_regs(w0, w1, cur)
            t, dlen = _decode_symbol_win(win, dct)
            bad = ok & ((dlen > 16) | (t > 15))
            t = jnp.where(t > 15, 0, t)
            diff = receive_extend(win, dlen, t)
            pred = pred_ref[ci] + jnp.where(ok, diff, 0)
            pred_ref[ci] = pred
            cur2 = cur + jnp.where(ok, dlen + t, 0)
            w0, w1 = _advance_regs(bits, w0, w1, cur, cur2, W)
            cur = cur2
            err = jnp.where(bad, _ERR_BADCODE, err)

            # ALL loop state lives in VMEM scratch refs, updated in
            # place: Mosaic copies while_loop carries every trip, which
            # for the old 512 KB accumulator carry alone was ~20% of
            # kernel time. The carry is just the trip counter.
            acc_ref[:] = jnp.zeros((32, SUBLANES, K), jnp.int32)
            cur_ref[:] = cur
            w0_ref[:] = w0
            w1_ref[:] = w1
            err_acc_ref[:] = err
            k_ref[:] = jnp.where(ok, 1, 64)  # done lanes skip the loop

            # --- AC: while any lane's block is unfinished. ---
            def cond(step):
                busy = ok & (k_ref[:] < 64) & (err_acc_ref[:] == 0)
                return jnp.any(busy) & (step < 64)

            def sym_step(_cur, _k, _err, _w0, _w1):
                """One AC symbol for every lane, registers in/out.
                Returns the new state plus this symbol's OR-term for the
                packed accumulator (folded into one acc_ref write per
                trip by the caller)."""
                busy = ok & (_k < 64) & (_err == 0)
                awin = _win_from_regs(_w0, _w1, _cur)
                rs, alen = _decode_symbol_win(awin, act)
                badc = busy & (alen > 16)
                run = rs >> 4
                size = rs & 0x0F
                val = receive_extend(awin, alen, size)
                is_eob = (size == 0) & (run != 15)
                is_zrl = (size == 0) & (run == 15)
                nk = _k + jnp.where(size > 0, run, 0)
                overrun = busy & (size > 0) & (nk > 63)
                emit = busy & (size > 0) & (nk <= 63)
                # Fold the emit mask into the value ([8,K], cheap) so
                # the [32,8,K] scatter is one compare + one select+or:
                # a non-emitting lane may still match kiota but ORs 0.
                # Slot = (row nk>>1, half nk&1); each slot is written at
                # most once per block, so OR never sees a carry.
                vmask = jnp.where(emit, val & 0xFFFF, 0) << (
                    (nk & 1) << 4
                )
                orterm = jnp.where(
                    kiota == (nk >> 1)[None], vmask[None], 0
                )
                nc = _cur + jnp.where(busy, alen + size, 0)
                _w0, _w1 = _advance_regs(bits, _w0, _w1, _cur, nc, W)
                _k = jnp.where(
                    busy,
                    jnp.where(
                        is_eob, 64,
                        jnp.where(is_zrl, _k + 16, nk + 1),
                    ),
                    _k,
                )
                _err = jnp.where(badc, _ERR_BADCODE, _err)
                _err = jnp.where(overrun, _ERR_RUN, _err)
                return nc, _k, _err, _w0, _w1, orterm

            def body(step):
                st = (cur_ref[:], k_ref[:], err_acc_ref[:],
                      w0_ref[:], w1_ref[:])
                oracc = acc_ref[:]
                for _s in range(AC_SYMS_PER_TRIP):
                    *st, orterm = sym_step(*st)
                    oracc = oracc | orterm
                acc_ref[:] = oracc
                cur_ref[:], k_ref[:], err_acc_ref[:] = st[0], st[1], st[2]
                w0_ref[:], w1_ref[:] = st[3], st[4]
                return step + 1

            jax.lax.while_loop(cond, body, jnp.int32(0))
            acc = acc_ref[:]
            cur = cur_ref[:]
            err = err_acc_ref[:]
            dc_row = jnp.where(ok, pred, 0)

            def coeff_at(zz):
                # Unpack zigzag coefficient zz from the 16-bit-paired
                # accumulator row (arithmetic shifts sign-extend).
                row = acc[zz >> 1]
                return (row >> 16) if (zz & 1) else ((row << 16) >> 16)

            if emit == "coeff":
                outs[0][0, 0, b] = jnp.stack(
                    [dc_row] + [coeff_at(z) for z in range(1, 64)],
                    axis=0,
                )
            else:
                # Fused dequant + islow IDCT (same arithmetic as
                # transform.idct8x8_islow, bit-exact) on the block
                # register. acc rows are zigzag; un-zigzag via static
                # row indexing, butterflies on [8, 8, K] row groups.
                from .. import transform as T
                from ..bitstream import NATURAL_TO_ZIGZAG

                deq = []
                for n in range(64):
                    zz = int(NATURAL_TO_ZIGZAG[n])
                    cv = dc_row if zz == 0 else coeff_at(zz)
                    if nq == 1:
                        deq.append(cv * qsets[0][b][zz])
                    else:
                        # Per-lane quantizer: one-hot select over the
                        # batch's distinct sets (all static constants).
                        qv = qsel[0] * qsets[0][b][zz]
                        for s in range(1, nq):
                            qv = qv + qsel[s] * qsets[s][b][zz]
                        deq.append(cv * qv)
                grp = [
                    jnp.stack(deq[i * 8 : (i + 1) * 8], axis=0)
                    for i in range(8)
                ]  # [8(c), 8, K] per frequency row i
                ws = T._idct_1d(grp, T.CONST_BITS - T.PASS1_BITS)
                s2 = [
                    jnp.stack([ws[r][c] for r in range(8)], axis=0)
                    for c in range(8)
                ]  # [8(r), 8, K] per column frequency c
                o = T._idct_1d(s2, T.CONST_BITS + T.PASS1_BITS + 3)
                # Pack 4 raster-adjacent pixel columns into one int32
                # word IN REGISTERS (byte 0 = lowest column) and store
                # the block into its component's [v*8, h*2] MCU word
                # tile: every downstream assembly transpose then moves
                # int32 elements already in raster byte order — no
                # byte-wide VPU shuffles, and the final u8 raster view
                # is a free bitcast (assemble_pixels). Packing costs 3
                # shift-ors per word here; unpacked u8 output cost
                # ~60 ms/268 MP of byte-shuffle transposes outside the
                # kernel.
                sp, dv, dh = b_pos[b]
                for q in range(2):
                    rows_q = jnp.concatenate(
                        [
                            jnp.clip(o[4 * q + 0][r] + 128, 0, 255)
                            | (jnp.clip(o[4 * q + 1][r] + 128, 0, 255) << 8)
                            | (jnp.clip(o[4 * q + 2][r] + 128, 0, 255) << 16)
                            | (jnp.clip(o[4 * q + 3][r] + 128, 0, 255) << 24)
                            for r in range(8)
                        ],
                        axis=0,
                    )  # [64, K]: row r at sublane rows r*8..r*8+8
                    outs[sp][
                        0, dv * 8 : (dv + 1) * 8, 0, dh * 2 + q
                    ] = rows_q.reshape(8, SUBLANES, K)
            cur_ref[:] = cur
            err_acc_ref[:] = err

        # Truncation: consumed beyond the segment (+7 pad bits legal).
        trunc = (cur_ref[:] > end_ref[0] + 7) & (lane_m > 0)
        err_ref[0] = err_acc_ref[:] | jnp.where(trunc, _ERR_TRUNC, 0)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("plan_static", "n_groups", "interpret")
)
def run_wavefront(
    bits, lane_m, seg_bits, plan_static, n_groups: int, interpret: bool,
    lane_qset=None, bit0=None, dc0=None,
):
    """Returns (out, err). emit='coeff': out is one int32 array
    [G, M, B, 64, 8, K]. emit='pixels': out is a TUPLE of per-scan-
    component int32 word arrays [G, v*8, M, h*2, 8, K] (4 raster
    pixels per word)."""
    (B, blk_tables, W, n_mcus, emit, qsets, comp_hv,
     lane_group) = plan_static
    K = lane_group // SUBLANES
    base = _make_kernel(plan_static)
    # Device-side layout change: [G, 8, K, W] host order -> the
    # kernel's word-major [G, W, 8, K].
    bits = jnp.transpose(bits, (0, 3, 1, 2))
    if lane_qset is None:
        lane_qset = jnp.zeros((n_groups, SUBLANES, K), jnp.int32)
    if bit0 is None:
        bit0 = jnp.zeros((n_groups, SUBLANES, K), jnp.int32)
    if dc0 is None:
        dc0 = jnp.zeros((n_groups, 4, SUBLANES, K), jnp.int32)

    n_out = len(comp_hv) if emit == "pixels" else 1

    def kernel(lane_m_ref, bits_ref, end_ref, lane_q_ref, bit0_ref,
               dc0_ref, *rest):
        outs = rest[:n_out]
        err_ref = rest[n_out]
        (cur_ref, pred_ref, err_acc_ref, w0_ref, w1_ref,
         acc_ref, k_ref) = rest[n_out + 1 :]
        base(
            lane_m_ref, bits_ref, lane_q_ref, bit0_ref, dc0_ref, outs,
            err_ref, cur_ref, end_ref, pred_ref, err_acc_ref, w0_ref,
            w1_ref, acc_ref, k_ref,
        )

    lane_spec = pl.BlockSpec(
        (1, SUBLANES, K), lambda g, m: (g, 0, 0), memory_space=pltpu.VMEM
    )
    if emit == "coeff":
        out_specs = (
            pl.BlockSpec(
                (1, 1, B, 64, SUBLANES, K),
                lambda g, m: (g, m, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        )
        out_shapes = (
            jax.ShapeDtypeStruct(
                (n_groups, n_mcus, B, 64, SUBLANES, K), jnp.int32
            ),
        )
    else:
        out_specs = tuple(
            pl.BlockSpec(
                (1, v * 8, 1, h * 2, SUBLANES, K),
                lambda g, m: (g, 0, m, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
            for _ci, h, v in comp_hv
        )
        out_shapes = tuple(
            jax.ShapeDtypeStruct(
                (n_groups, v * 8, n_mcus, h * 2, SUBLANES, K), jnp.int32
            )
            for _ci, h, v in comp_hv
        )

    grid = (n_groups, n_mcus)
    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            lane_spec,
            pl.BlockSpec(
                (1, W, SUBLANES, K), lambda g, m: (g, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            lane_spec,
            lane_spec,
            lane_spec,
            pl.BlockSpec(
                (1, 4, SUBLANES, K), lambda g, m: (g, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=out_specs + (lane_spec,),
        out_shape=out_shapes
        + (jax.ShapeDtypeStruct((n_groups, SUBLANES, K), jnp.int32),),
        scratch_shapes=[
            pltpu.VMEM((SUBLANES, K), jnp.int32),      # cursor
            pltpu.VMEM((4, SUBLANES, K), jnp.int32),   # DC predictors
            pltpu.VMEM((SUBLANES, K), jnp.int32),      # error flags
            pltpu.VMEM((SUBLANES, K), jnp.int32),      # window word 0
            pltpu.VMEM((SUBLANES, K), jnp.int32),      # window word 1
            # AC accumulator: two 16-bit coeffs per int32 row (_make_kernel)
            pltpu.VMEM((32, SUBLANES, K), jnp.int32),
            pltpu.VMEM((SUBLANES, K), jnp.int32),      # AC k index
        ],
        interpret=interpret,
    )(lane_m, bits, seg_bits, lane_qset, bit0, dc0)
    err = res[-1]
    if emit == "coeff":
        return res[0], err
    return tuple(res[:-1]), err


# ---------------------------------------------------------------------------
# Assembly: dense kernel output -> per-component coefficient tensors
# ---------------------------------------------------------------------------


def assemble(
    shape: Tuple[int, int, int], out: jnp.ndarray,
    geoms: Sequence["ImageGeom"],
) -> List[List[jnp.ndarray]]:
    """[G, M, B, 64, 8, K] -> per image, per component [nb, 64] zigzag
    coefficient arrays (device-resident), via static transposes only.
    `shape` = (blocks_per_mcu, n_mcus, n_groups).

    Each image's lanes are sliced to that image's own MCUs-per-lane
    (its restart interval) before flattening, so images with different
    restart intervals coexist in one launch (SURVEY.md §3.5)."""
    B, M, n_groups = shape
    K = out.shape[-1]  # lane group = SUBLANES * K (plan.lane_group)

    # [G, M, B, 64, 8, K] -> [lane, M, B, 64], lane = g*group + s*K + j.
    # (M, B, 64) merge before the transpose: see assemble_pixels.
    flat = (
        out.reshape(n_groups, M * B * 64, SUBLANES, K)
        .transpose(0, 2, 3, 1)
        .reshape(n_groups * SUBLANES * K, M, B, 64)
    )

    results: List[List[jnp.ndarray]] = []
    lane0 = 0
    for scan in geoms:
        frame = scan.frame
        interleaved = scan.interleaved
        if interleaved:
            total_mcus = frame.mcus_x * frame.mcus_y
        else:
            c0 = frame.components[scan.comp_indices[0]]
            total_mcus = c0.width_blocks * c0.height_blocks
        rows = min(scan.restart_interval or total_mcus, total_mcus)
        nseg = -(-total_mcus // rows)
        lanes = flat[lane0 : lane0 + nseg, :rows]  # [nseg, rows, B, 64]
        lane0 += nseg
        # MCU-linear coefficient stream for this image.
        mcus = lanes.reshape(nseg * rows, B, 64)[:total_mcus]

        by_ci: Dict[int, jnp.ndarray] = {}
        b0 = 0
        if interleaved:
            for sp, ci in enumerate(scan.comp_indices):
                c = frame.components[ci]
                nb = c.h * c.v
                sub = mcus[:, b0 : b0 + nb]  # [mcus, v*h, 64]
                b0 += nb
                sub = sub.reshape(frame.mcus_y, frame.mcus_x, c.v, c.h, 64)
                sub = sub.transpose(0, 2, 1, 3, 4).reshape(
                    c.padded_hb * c.padded_wb, 64
                )
                by_ci[ci] = sub
            comps = [by_ci[c.index] for c in frame.components]
        else:
            ci = scan.comp_indices[0]
            c = frame.components[ci]
            grid = mcus[:, 0].reshape(c.height_blocks, c.width_blocks, 64)
            pad_r = c.padded_hb - c.height_blocks
            pad_c = c.padded_wb - c.width_blocks
            grid = jnp.pad(grid, ((0, pad_r), (0, pad_c), (0, 0)))
            comps = [grid.reshape(c.padded_hb * c.padded_wb, 64)]
        results.append(comps)
    return results


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------


_COEFF_CHAIN_CACHE: "collections.OrderedDict[Tuple, object]" = (
    collections.OrderedDict()
)
_COEFF_CHAIN_MAX = 64


def _coeff_chain(plan: BlockPlan, geoms, interpret: bool):
    """One jitted program for kernel + coefficient assembly: eagerly the
    per-image assembly transposes were a dispatch each — dozens of relay
    round-trips per mixed-table bucket (the coeff fallback's common
    customer). Keyed by static geometry only; closures capture ImageGeom
    (no bitstreams)."""
    plan_static = plan.static_key("coeff")
    shape = (plan.blocks_per_mcu, plan.n_mcus, plan.n_groups)
    key = (
        plan_static, plan.n_groups,
        tuple(
            (g.frame.height, g.frame.width,
             tuple((c.h, c.v) for c in g.frame.components),
             g.interleaved, g.comp_indices, g.restart_interval)
            for g in geoms
        ),
        interpret,
    )
    fn = _COEFF_CHAIN_CACHE.get(key)
    if fn is None:
        n_groups = plan.n_groups

        @jax.jit
        def fn(bits, lane_m, seg_bits):
            out, err = run_wavefront(
                bits, lane_m, seg_bits, plan_static, n_groups, interpret
            )
            return assemble(shape, out, geoms), err

        _COEFF_CHAIN_CACHE[key] = fn
        while len(_COEFF_CHAIN_CACHE) > _COEFF_CHAIN_MAX:
            _COEFF_CHAIN_CACHE.popitem(last=False)
    else:
        _COEFF_CHAIN_CACHE.move_to_end(key)
    return fn


def decode_batch_to_device(
    jpegs: Sequence[bitstream.JpegData],
    config: DecodeConfig = DEFAULT_CONFIG,
    strict: bool = True,
) -> Tuple[List[Optional[List[jnp.ndarray]]], Dict[int, Exception]]:
    """Uniform-batch device decode via the Pallas kernel. Same contract
    as wavefront.decode_batch_to_device."""
    plan = build_block_plan(jpegs, emit_hint="coeff")
    interpret = jax.default_backend() != "tpu"
    geoms = tuple(ImageGeom.of(j) for j in jpegs)
    fn = _coeff_chain(plan, geoms, interpret)
    assembled, err = fn(
        jnp.asarray(plan.bits),
        jnp.asarray(plan.lane_m),
        jnp.asarray(plan.seg_bits),
    )

    errs = np.asarray(err).reshape(-1)[: plan.n_lanes]
    failures = failures_from_err(errs, plan.lane_meta)
    if strict and failures:
        raise failures[min(failures)]

    results: List[Optional[List[jnp.ndarray]]] = []
    for i in range(len(jpegs)):
        results.append(None if i in failures else assembled[i])
    return results, failures


def failures_from_err(
    errs: np.ndarray, lane_meta: np.ndarray
) -> Dict[int, Exception]:
    """Map the kernel's per-lane error codes to one exception per failed
    image (first failing lane wins). `errs` must already be trimmed to
    the real lane count."""
    failures: Dict[int, Exception] = {}
    for lane in np.nonzero(errs)[0]:
        img = int(lane_meta[int(lane)][0])
        if img in failures:
            continue
        code = int(errs[lane])
        if code & _ERR_BADCODE:
            failures[img] = JpegHuffmanError(
                f"invalid Huffman code in segment {int(lane)} (image {img})"
            )
        elif code & _ERR_RUN:
            failures[img] = JpegHuffmanError(
                f"AC run past end of block in segment {int(lane)} (image {img})"
            )
        else:
            failures[img] = JpegTruncatedError(
                f"entropy segment {int(lane)} truncated (image {img})"
            )
    return failures


def decode_all_scans(
    jpeg: bitstream.JpegData, config: DecodeConfig = DEFAULT_CONFIG
) -> List[np.ndarray]:
    if jpeg.frame.progressive:
        # Device-side progressive: the four T.81 §G scan kinds run as
        # wavefront kernels over restart-segment lanes (wavefront_prog).
        from . import wavefront_prog

        acs, dcs = wavefront_prog.decode_all_scans(jpeg, config)
        out = []
        for ac, dc in zip(acs, dcs):
            arr = np.array(ac)  # writable host copy
            arr[:, 0] = np.asarray(dc)
            out.append(arr)
        return out
    if (
        not jpeg.frame.progressive
        and len(jpeg.scans) > 1
        and all(s.n_comps == 1 for s in jpeg.scans)
    ):
        # Baseline split into per-component scans (T.81 permits it):
        # decode each scan on device as its own single-component frame.
        return [
            np.asarray(c) for c in decode_multiscan_to_device(jpeg, config)
        ]
    try:
        comps, _ = decode_batch_to_device([jpeg], config, strict=True)
        return [np.asarray(c) for c in comps[0]]
    except JpegUnsupportedError:
        # Segments too long for one VMEM row lane (marker-free streams
        # or huge restart intervals): split them with the host skeleton
        # scan and decode the pieces as lanes with a DC prefix fixup.
        scan = jpeg.scans[0] if jpeg.scans else None
        if (
            scan is not None
            and not jpeg.frame.progressive
            and len(jpeg.scans) == 1
        ):
            return [
                np.asarray(c) for c in decode_norst_to_device(jpeg, config)
            ]
        raise


# ---------------------------------------------------------------------------
# Fused pixels path: wavefront + dequant + IDCT in one kernel
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ImageGeom:
    """The slice of (frame, first-scan) geometry that pixel assembly
    needs. Deliberately free of the entropy payload so jitted chains can
    close over it without pinning whole bitstreams in the chain cache."""

    frame: bitstream.Frame
    interleaved: bool
    comp_indices: Tuple[int, ...]
    restart_interval: int

    @classmethod
    def of(cls, jpeg: bitstream.JpegData) -> "ImageGeom":
        s = jpeg.scans[0]
        return cls(
            jpeg.frame, s.interleaved, tuple(s.comp_indices),
            s.restart_interval,
        )


def _comp_lanes(arr: jnp.ndarray) -> jnp.ndarray:
    """One component's kernel output [G, v8, M, w2, 8, K] int32 ->
    [lane, v8, M, w2] per-lane word tiles. XLA merges (v8, M, w2) and
    (8, K), so this is ONE clean 2-D int32 transpose with kilobyte-scale
    granules — the only whole-data transpose between the decode kernel
    and the raster."""
    G, v8, M, w2 = arr.shape[0], arr.shape[1], arr.shape[2], arr.shape[3]
    return arr.transpose(0, 4, 5, 1, 2, 3).reshape(
        G * arr.shape[-2] * arr.shape[-1], v8, M, w2
    )


def _words_to_plane(a: jnp.ndarray) -> jnp.ndarray:
    """[..., W4] int32 raster words -> [..., W4*4] uint8 raster (free
    little-endian bitcast: byte 0 of each word is its lowest column)."""
    u = jax.lax.bitcast_convert_type(a, jnp.uint8)
    return u.reshape(*a.shape[:-1], a.shape[-1] * 4)


def _raster_words(
    lanes: jnp.ndarray, mcus_y: int, mcus_x: int, rows: int,
    total_mcus: int, pad_hb8: int, pad_w2: int
) -> jnp.ndarray:
    """One image's, one component's lane tiles [nseg, v8, M, w2] ->
    raster word grid [pad_hb8, pad_w2] int32 (leading batch dims pass
    through). `rows` = MCUs actually covered per lane (<= M).

    Fast path: when every lane covers `rows` consecutive MCUs of ONE
    MCU row (rows divides mcus_x), the raster transpose's minor run is
    the whole (M, w2) tile — 64+ byte granules. Otherwise MCU-linear."""
    lead = lanes.shape[:-4]
    nseg, v8, M, w2 = lanes.shape[-4:]
    lanes = lanes[..., :rows, :]
    if mcus_x % rows == 0 and nseg * rows >= mcus_y * mcus_x:
        sx = mcus_x // rows
        a = lanes.reshape(*lead, mcus_y, sx, v8, rows, w2)
        nd = len(lead)
        perm = tuple(range(nd)) + tuple(
            nd + i for i in (0, 2, 1, 3, 4)
        )
        a = a.transpose(*perm).reshape(
            *lead, mcus_y * v8, sx * rows * w2
        )
    else:
        nd = len(lead)
        # MCU-linear: (nseg, rows) merge needs v8 moved out from
        # between them first.
        perm = tuple(range(nd)) + tuple(nd + i for i in (0, 2, 1, 3))
        a = lanes.transpose(*perm).reshape(*lead, nseg * rows, v8, w2)[
            ..., :total_mcus, :, :
        ]
        a = a.reshape(*lead, mcus_y, mcus_x, v8, w2)
        a = a.transpose(*perm).reshape(
            *lead, mcus_y * v8, mcus_x * w2
        )
    pr = pad_hb8 - a.shape[-2]
    pc = pad_w2 - a.shape[-1]
    if pr or pc:
        a = jnp.pad(
            a, ((0, 0),) * len(lead) + ((0, pr), (0, pc))
        )
    return a


def assemble_pixels(
    shape: Tuple[int, int, int],
    out: Sequence[jnp.ndarray],
    geoms: Sequence[ImageGeom],
) -> List[List[jnp.ndarray]]:
    """Per-scan-component kernel outputs [G, v8, M, w2, 8, K] int32
    (4 raster-adjacent pixels per word, MCU tiles packed in-register by
    the kernel epilogue) -> per image, per component sample planes
    [padded_h, padded_w] uint8 (device-resident). Every transpose moves
    int32 elements whose bytes are already in raster order, so no
    byte-granular shuffle ever runs and the final u8 view is a bitcast.
    `shape` = (blocks_per_mcu, n_mcus, n_groups). Per-image restart
    intervals are honored by slicing each image's lanes to its own
    MCUs-per-lane before flattening."""
    B, M, G = shape
    comps_lanes = [_comp_lanes(arr) for arr in out]

    results: List[List[jnp.ndarray]] = []
    lane0 = 0
    for geom in geoms:
        frame = geom.frame
        scan = geom
        if scan.interleaved:
            total_mcus = frame.mcus_x * frame.mcus_y
            mcus_y, mcus_x = frame.mcus_y, frame.mcus_x
        else:
            c0 = frame.components[scan.comp_indices[0]]
            total_mcus = c0.width_blocks * c0.height_blocks
            mcus_y, mcus_x = c0.height_blocks, c0.width_blocks
        rows = min(scan.restart_interval or total_mcus, total_mcus)
        nseg = -(-total_mcus // rows)

        by_ci: Dict[int, jnp.ndarray] = {}
        for sp, ci in enumerate(
            scan.comp_indices if scan.interleaved else scan.comp_indices[:1]
        ):
            c = frame.components[ci]
            sub = comps_lanes[sp][lane0 : lane0 + nseg]
            grid = _raster_words(
                sub, mcus_y, mcus_x, rows, total_mcus,
                c.padded_hb * 8, c.padded_wb * 2,
            )
            by_ci[ci] = _words_to_plane(grid)
        lane0 += nseg
        if scan.interleaved:
            planes = [by_ci[c.index] for c in frame.components]
        else:
            planes = [by_ci[scan.comp_indices[0]]]
        results.append(planes)
    return results


def assemble_pixels_stacked(
    shape: Tuple[int, int, int],
    out: jnp.ndarray,
    geoms: Sequence[ImageGeom],
) -> List[jnp.ndarray]:
    """assemble_pixels + stack-over-images in one shot: per component, a
    [n_images, padded_h, padded_w] uint8 plane batch (what
    transform_planes_batch consumes).

    When every image shares one geometry AND one restart interval (the
    steady state of batched streams), the image axis stays a leading dim
    through a SINGLE raster transpose per component — chip_profile
    measured the per-image assemble + 64-way jnp.stack at ~103 ms/268 MP
    (the whole chain's dominant non-kernel cost) while the batched
    transpose is ~free, because XLA materializes one well-tiled copy
    instead of 64 slice+transpose ops feeding a concatenate. Mixed
    restart intervals fall back to the per-image path + stack."""
    B, M, G = shape
    g0 = geoms[0]
    frame = g0.frame
    aligned = all(
        g.frame is frame or (
            g.frame.height == frame.height
            and g.frame.width == frame.width
            and g.interleaved == g0.interleaved
            and g.comp_indices == g0.comp_indices
            and g.restart_interval == g0.restart_interval
        )
        for g in geoms[1:]
    )
    if not aligned:
        per = assemble_pixels(shape, out, geoms)
        return [
            jnp.stack([per[i][ci] for i in range(len(geoms))])
            for ci in range(frame.n_components)
        ]

    n = len(geoms)
    if g0.interleaved:
        total_mcus = frame.mcus_x * frame.mcus_y
        mcus_y, mcus_x = frame.mcus_y, frame.mcus_x
    else:
        c0 = frame.components[g0.comp_indices[0]]
        total_mcus = c0.width_blocks * c0.height_blocks
        mcus_y, mcus_x = c0.height_blocks, c0.width_blocks
    rows = min(g0.restart_interval or total_mcus, total_mcus)
    nseg = -(-total_mcus // rows)

    # Same clean 2-D int32 lane transpose as assemble_pixels; the
    # per-image slicing becomes one reshape since every image owns
    # exactly `nseg` consecutive lanes.
    stacked: List[jnp.ndarray] = []
    by_ci: Dict[int, jnp.ndarray] = {}
    comp_cis = g0.comp_indices if g0.interleaved else g0.comp_indices[:1]
    for sp, ci in enumerate(comp_cis):
        c = frame.components[ci]
        lanes = _comp_lanes(out[sp])[: n * nseg]
        v8, w2 = lanes.shape[1], lanes.shape[3]
        lanes = lanes.reshape(n, nseg, v8, M, w2)
        grid = _raster_words(
            lanes, mcus_y, mcus_x, rows, total_mcus,
            c.padded_hb * 8, c.padded_wb * 2,
        )
        by_ci[ci] = _words_to_plane(grid)
    if g0.interleaved:
        stacked = [by_ci[c.index] for c in frame.components]
    else:
        stacked = [by_ci[g0.comp_indices[0]]]
    return stacked


# Cache of jitted end-to-end chains (kernel + assembly + color) keyed by
# every shape/static-relevant property: compiling the WHOLE chain as one
# XLA program lets the assembly transposes fuse with the kernels' pads
# and crops (~+30% chip rate vs separate dispatch chains). The cached
# closures capture only static geometry (ImageGeom), never bitstreams,
# and the cache is LRU-bounded so pathological shape churn can't grow it
# without limit.
_CHAIN_CACHE: "collections.OrderedDict[Tuple, object]" = collections.OrderedDict()
_CHAIN_CACHE_MAX = 64


def _rgb_chain(plan: BlockPlan, jpegs, config, interpret: bool,
               packed: bool = False):
    """packed: emit the color kernels' column-packed planar uint16
    (bytes = the u8 raster; see pipeline.packed_layout_applies) —
    callers must have checked the predicate themselves.

    No-restart plans (plan.bit0 set — lanes split at skeleton-scan bit
    offsets with DC-primed predictors) run the SAME fused chain; the
    jitted fn then takes two extra args (bit0, dc0) and assembly treats
    `norst_every` MCUs per lane as the effective restart interval."""
    from . import pipeline as kernel_pipeline

    norst = plan.bit0 is not None
    if norst:
        geoms = tuple(
            dataclasses.replace(
                ImageGeom.of(j), restart_interval=plan.norst_every
            )
            for j in jpegs
        )
    else:
        geoms = tuple(ImageGeom.of(j) for j in jpegs)
    frame = geoms[0].frame
    color = bitstream.color_space(jpegs[0])
    shape = (plan.blocks_per_mcu, plan.n_mcus, plan.n_groups)
    n_images = len(jpegs)
    packed = packed and kernel_pipeline.packed_layout_applies(
        frame, config, color
    )
    plan_static = plan.static_key("pixels")
    key = (
        plan_static, plan.n_groups, plan.frame_key, n_images,
        # Per-image scan geometry: lane counts alone can collide for
        # different restart intervals (ceil(T/ri) is not injective).
        tuple(
            (g.interleaved, g.comp_indices, g.restart_interval)
            for g in geoms
        ),
        plan.img_qset, norst,
        config.fancy_upsampling, interpret, color, packed,
    )
    fn = _CHAIN_CACHE.get(key)
    if fn is None:
        n_groups = plan.n_groups

        def run(bits, lane_m, seg_bits, lane_qset, bit0=None, dc0=None):
            out, err = run_wavefront(
                bits, lane_m, seg_bits, plan_static, n_groups, interpret,
                lane_qset, bit0=bit0, dc0=dc0,
            )
            stacked = assemble_pixels_stacked(shape, out, geoms)
            if frame.height * frame.width > 100_000_000:
                # Giant single images: stop XLA fusing the color stage's
                # u16 phase-split bitcast INTO the assembly copies — the
                # fused form materializes the tile-padded 6-D interleave
                # temps at double width (u16), which alone overflows HBM
                # at 16K. The barrier keeps assembly temps u8.
                stacked = list(jax.lax.optimization_barrier(tuple(stacked)))
            rgb = kernel_pipeline.transform_planes_batch(
                frame, stacked, config, color=color, packed=packed
            )
            return rgb, err

        fn = jax.jit(run)
        _CHAIN_CACHE[key] = fn
        while len(_CHAIN_CACHE) > _CHAIN_CACHE_MAX:
            _CHAIN_CACHE.popitem(last=False)
    else:
        _CHAIN_CACHE.move_to_end(key)
    return fn


def decode_batch_to_rgb(
    jpegs: Sequence[bitstream.JpegData],
    config: DecodeConfig = DEFAULT_CONFIG,
    defer_errors: bool = False,
) -> Tuple[Optional[jnp.ndarray], object]:
    """Fully fused on-chip decode: ONE XLA program runs the wavefront+
    IDCT kernel, pixel assembly and the upsample/color kernels — RGB in
    HBM, coefficients never materialized. Returns ([N, H, W, 3] or
    [N, H, W] device array, failures). With defer_errors the second
    element is the opaque (err, plan) pair for resolve_rgb_errors —
    nothing is read back, so a caller can dispatch several buckets'
    chains and the device overlaps them instead of serializing on
    per-bucket error syncs."""
    plan = build_block_plan(jpegs)
    if not plan.qsets:
        raise JpegUnsupportedError(
            f"fused pixels mode takes at most {MAX_QSETS} distinct "
            "quantizer sets per batch"
        )
    interpret = jax.default_backend() != "tpu"
    fn = _rgb_chain(plan, jpegs, config, interpret)
    rgb, err = fn(
        jnp.asarray(plan.bits),
        jnp.asarray(plan.lane_m),
        jnp.asarray(plan.seg_bits),
        jnp.asarray(plan.lane_qset),
    )
    if defer_errors:
        return rgb, (err, plan)
    return rgb, resolve_rgb_errors(err, plan)


def resolve_rgb_errors(err, plan: "BlockPlan") -> Dict[int, Exception]:
    """Force a deferred decode_batch_to_rgb error vector (the chain's
    first readback) and map it to per-image failures."""
    errs = np.asarray(err).reshape(-1)[: plan.n_lanes]
    return failures_from_err(errs, plan.lane_meta)


# ---------------------------------------------------------------------------
# No-restart streams on device (SURVEY.md §5 long-context item 3/4;
# BASELINE.json:5 "DC-predictor state via ICI collectives")
#
# A marker-free baseline scan is one serial Huffman chain. A fast host
# skeleton scan (native tj_scan_split: symbol lengths only, no stores)
# records the bit offset of every k-th MCU; the kernel then decodes
# those segments as ordinary wavefront lanes starting at arbitrary bit
# offsets with LOCAL DC predictors (starting at 0), and the true DCs are
# recovered afterwards by an exclusive prefix sum of per-lane DC totals
# — on one chip as a jnp.cumsum, across shards via halo.dc_prefix_fixup.
# ---------------------------------------------------------------------------


def _skeleton_walk_py(dest: bytes, jpeg, scan, total: int, every: int):
    """Pure-python skeleton walk over one destuffed (sub-)buffer.
    Returns (offs_i64, dcs_i32): bit offsets of every `every`-th MCU plus
    the total, and the DC predictor value per scan component at each of
    those points (the per-lane priming for the fused pixels kernel)."""
    from .. import huffman as hf

    tbls = hf.build_tables(scan.huff)
    frame = jpeg.frame
    if scan.interleaved:
        sps: List[int] = []
        for p, ci in enumerate(scan.comp_indices):
            c = frame.components[ci]
            sps += [p] * (c.h * c.v)
    else:
        sps = [0]
    dcts = [tbls[(0, scan.dc_ids[p])] for p in range(scan.n_comps)]
    acs = [tbls[(1, scan.ac_ids[p])] for p in range(scan.n_comps)]
    r = hf.BitReader(bytes(dest))
    offs = []
    dcs = []
    pred = [0] * scan.n_comps
    for m in range(total):
        if m % every == 0:
            offs.append(r.pos * 8 + r.pad_bits - r.cnt)
            dcs.append(list(pred))
        for sp in sps:
            t = hf.decode_symbol(r, dcts[sp])
            if t > 15:
                raise JpegHuffmanError("bad DC size")
            pred[sp] += hf.extend(r.receive(t), t)
            k = 1
            while k < 64:
                rs = hf.decode_symbol(r, acs[sp])
                run, size = rs >> 4, rs & 15
                if size == 0:
                    if run == 15:
                        k += 16
                        continue
                    break
                k += run
                if k > 63:
                    raise JpegHuffmanError("AC run past end of block")
                r.receive(size)
                k += 1
    offs.append(r.pos * 8 + r.pad_bits - r.cnt)
    dcs.append(list(pred))
    if r.overrun():
        raise JpegTruncatedError("entropy stream truncated")
    return (
        np.asarray(offs, np.int64),
        np.asarray(dcs, np.int32).reshape(len(offs), scan.n_comps),
    )


def _scan_split_host(jpeg, scan, every: int):
    """Skeleton scan of EVERY restart segment (or of the single
    marker-free stream), native with a pure-python fallback. Returns
    (destuffed uint8 array, int64 ABSOLUTE bit offsets [n_lanes+1],
    first-lane index of each marker segment, int32 per-lane DC
    predictors [n_lanes, n_scan_comps] — the value of each scan
    component's predictor at the lane's first MCU, resetting to zero at
    marker boundaries per T.81). Lane boundaries fall at every `every`
    MCUs within a marker segment and always at marker boundaries (the
    caller picks `every` dividing the DRI)."""
    from ..errors import JpegError as _JE

    frame = jpeg.frame
    if scan.interleaved:
        total = frame.mcus_x * frame.mcus_y
    else:
        c0 = frame.components[scan.comp_indices[0]]
        total = c0.width_blocks * c0.height_blocks
    ri = scan.restart_interval or total

    native = None
    try:
        from ..native import entropy as ne

        ne.destuff_rows  # force the lazy build; failures fall through
        native = ne
    except _JE:
        raise
    except Exception:
        native = None

    if native is not None:
        dest, seg_starts = native.destuff_segments(scan)
    else:
        pieces = bitstream.split_restart_segments(scan)
        seg_starts = np.zeros(len(pieces) + 1, np.int64)
        np.cumsum([len(p) for p in pieces], out=seg_starts[1:])
        dest = np.frombuffer(b"".join(bytes(p) for p in pieces), np.uint8)

    offs_all = []
    dcs_all = []
    seg_first = []
    lane0 = 0
    mcu = 0
    si = 0
    while mcu < total:
        n_m = min(ri, total - mcu)
        s0 = int(seg_starts[si])
        s1 = int(seg_starts[si + 1])
        sub = dest[s0:s1]
        if native is not None:
            offs, dcs = native.scan_split_buf(sub, jpeg, scan, n_m, every)
        else:
            offs, dcs = _skeleton_walk_py(
                bytes(sub), jpeg, scan, n_m, every
            )
        seg_first.append(lane0)
        lane0 += len(offs) - 1
        offs_all.append(offs[:-1] + s0 * 8)
        dcs_all.append(dcs[:-1])
        last_end = offs[-1] + s0 * 8
        mcu += n_m
        si += 1
    offs_flat = np.concatenate(offs_all + [[last_end]])
    dcs_flat = np.concatenate(dcs_all)
    return dest, offs_flat, np.asarray(seg_first, np.int64), dcs_flat


def build_norst_plan(
    jpeg: bitstream.JpegData, every: int = 0
) -> BlockPlan:
    """Plan a baseline scan as wavefront lanes split at skeleton-scan
    bit offsets — for marker-FREE streams (the whole scan is one serial
    chain) and for restart-segmented streams whose segments exceed the
    VMEM row cap (huge DRIs). `every` is snapped to a divisor of the
    restart interval so every lane covers exactly `every` MCUs (only the
    stream's final lane is short), keeping assembly reshape-only. Lanes
    start mid-word (plan.bit0) with predictors PRIMED to the skeleton
    scan's absolute DC values (plan.lane_dc0, resetting at marker
    boundaries per T.81) — the kernel emits true DCs directly, so both
    coeff and fused-pixels emit work with no post-hoc prefix fixup.
    (decode_norst_sharded instead keeps local predictors + the ICI
    dc_prefix_fixup collective, ignoring lane_dc0.)"""
    frame = jpeg.frame
    if frame.progressive:
        raise JpegUnsupportedError("pallas wavefront: baseline only")
    if len(jpeg.scans) != 1:
        raise JpegUnsupportedError("pallas wavefront: one scan only")
    scan = jpeg.scans[0]
    if not scan.interleaved and frame.n_components != 1:
        raise JpegUnsupportedError(
            "pallas wavefront: non-interleaved multi-component scan"
        )

    if scan.interleaved:
        total_mcus = frame.mcus_x * frame.mcus_y
    else:
        c0 = frame.components[scan.comp_indices[0]]
        total_mcus = c0.width_blocks * c0.height_blocks
    if total_mcus <= 0:
        raise JpegUnsupportedError("empty scan")
    ri = scan.restart_interval or total_mcus

    def snap_divisor(e: int) -> int:
        e = max(1, min(e, ri))
        while ri % e:
            e -= 1
        return e

    avg_bits = max(1, len(scan.data) * 8 // total_mcus)
    if every <= 0:
        # Target roughly half the VMEM row per lane so content skew has
        # headroom; clamp so tiny images still split into >= 2 lanes.
        every = max(1, (MAX_WORDS * 32 // 2) // avg_bits)
    every = snap_divisor(every)

    dest = offs = seg_first = dcs = None
    W = MAX_WORDS + 1
    for _ in range(6):
        dest, offs, seg_first, dcs = _scan_split_host(jpeg, scan, every)
        start_words = (offs[:-1] >> 5).astype(np.int64)
        end_rel = offs[1:] - (start_words << 5)
        W = int(-(-int(end_rel.max()) // 32)) + 1
        W = min(-(-W // 32) * 32, MAX_WORDS + 32)
        if W <= MAX_WORDS or every == 1:
            break
        every = snap_divisor(every // 2)
    if W > MAX_WORDS:
        raise JpegUnsupportedError(
            "skeleton split: a sub-segment exceeds the VMEM row cap"
        )

    L = len(offs) - 1
    G = -(-L // LANE_GROUP)
    K = LANE_GROUP // SUBLANES

    start_byte = (start_words * 4).astype(np.int64)
    # Row l is dest[start_byte[l] : +W*4], 0xFF past the stream end: a
    # sliding-window VIEW + one row gather. (The obvious [L, W*4] index
    # matrix materializes L*W*4 int64s — half a GB at 32K lanes — and
    # was the no-restart host-prep bottleneck once the skeleton scan
    # went parallel.)
    row_bytes = W * 4
    dest_pad = np.concatenate(
        [dest, np.full(row_bytes + 8, 0xFF, np.uint8)]
    )
    windows = np.lib.stride_tricks.sliding_window_view(dest_pad, row_bytes)
    rows_full = np.full((G * LANE_GROUP, row_bytes), 0xFF, np.uint8)
    rows_full[:L] = windows[start_byte]
    bits = (
        np.ascontiguousarray(rows_full)
        .view(">u4")
        .astype(np.uint32)
        .view(np.int32)
        .reshape(G, SUBLANES, K, W)
    )

    seg_bits = np.zeros(G * LANE_GROUP, np.int32)
    seg_bits[:L] = end_rel.astype(np.int32)
    bit0 = np.zeros(G * LANE_GROUP, np.int32)
    bit0[:L] = (offs[:-1] - (start_words << 5)).astype(np.int32)
    # Per-lane DC predictor priming, spread from scan-component order to
    # the kernel's pred_ref component-index rows.
    dc0 = np.zeros((G * LANE_GROUP, 4), np.int32)
    prime_cis = (
        scan.comp_indices if scan.interleaved else scan.comp_indices[:1]
    )
    for p, ci in enumerate(prime_cis):
        dc0[:L, ci] = dcs[:, p]
    lane_dc0 = np.ascontiguousarray(
        dc0.reshape(G, SUBLANES, K, 4).transpose(0, 3, 1, 2)
    )

    fm = np.arange(L, dtype=np.int64) * every
    nm = np.minimum(every, total_mcus - fm).astype(np.int32)
    lane_meta = np.stack(
        [np.zeros(L, np.int32), fm.astype(np.int32), nm], axis=1
    )
    lm = np.zeros(G * LANE_GROUP, np.int32)
    lm[:L] = nm

    # Tables / quantizers: same construction as build_block_plan.
    tables: List[Tuple[int, CanonTable, CanonTable]] = []
    if scan.interleaved:
        for sp, ci in enumerate(scan.comp_indices):
            c = frame.components[ci]
            dk, ak = (0, scan.dc_ids[sp]), (1, scan.ac_ids[sp])
            if dk not in scan.huff or ak not in scan.huff:
                raise JpegSyntaxError("missing Huffman table")
            dct = CanonTable.from_spec(scan.huff[dk])
            act = CanonTable.from_spec(scan.huff[ak])
            for _v in range(c.v):
                for _h in range(c.h):
                    tables.append((ci, dct, act))
    else:
        dk, ak = (0, scan.dc_ids[0]), (1, scan.ac_ids[0])
        if dk not in scan.huff or ak not in scan.huff:
            raise JpegSyntaxError("missing Huffman table")
        tables.append(
            (
                scan.comp_indices[0],
                CanonTable.from_spec(scan.huff[dk]),
                CanonTable.from_spec(scan.huff[ak]),
            )
        )
    q_t = tuple(
        tuple(int(x) for x in jpeg.qtables[frame.components[ci].tq])
        for ci, _d, _a in tables
    )

    return BlockPlan(
        bits=bits,
        seg_bits=seg_bits.reshape(G, SUBLANES, K),
        lane_m=lm.reshape(G, SUBLANES, K),
        n_groups=G,
        n_mcus=int(nm.max()),
        n_words=W,
        blocks_per_mcu=len(tables),
        blk_tables=tuple(tables),
        comp_hv=_comp_hv_of(frame, scan),
        frame_key=(
            frame.height, frame.width,
            tuple((c.h, c.v) for c in frame.components),
        ),
        lane_meta=lane_meta,
        n_lanes=L,
        images=1,
        qtabs=q_t,
        qsets=(q_t,),
        img_qset=(0,),
        lane_qset=np.zeros((G, SUBLANES, K), np.int32),
        bit0=bit0.reshape(G, SUBLANES, K),
        lane_dc0=lane_dc0,
        norst_every=every,
        lane_seg=(fm // ri).astype(np.int64),
        seg_first=seg_first,
    )


def _norst_dc_add(flat, lane_m, blk_tables, extra_base=None,
                  lane_seg=None, seg_first=None):
    """flat: [L, M, B, 64] lane-local coefficients. Returns flat with
    every block's DC raised by the exclusive prefix of per-lane DC
    totals (per component) — converting lane-local predictors into the
    true running predictor of the serial stream. With lane_seg/seg_first
    (restart-segmented streams split at sub-segment offsets) the prefix
    resets at each marker segment, matching the T.81 predictor reset.
    extra_base: optional {ci: scalar} added on top (the cross-shard base
    from halo.dc_prefix_fixup)."""
    dc = flat[..., 0]  # [L, M, B]
    last_mcu = jnp.maximum(lane_m - 1, 0)  # [L]
    cis = sorted({ci for ci, _d, _a in blk_tables})
    last_b = {ci: max(b for b, t in enumerate(blk_tables) if t[0] == ci)
              for ci in cis}
    segmented = (
        lane_seg is not None
        and seg_first is not None
        and len(seg_first) > 1
    )
    if segmented:
        # jnp.asarray().astype(): works for host arrays AND tracers
        # (this runs under the jitted norst chain).
        seg_first_j = jnp.asarray(seg_first).astype(jnp.int32)
        lane_seg_j = jnp.asarray(lane_seg).astype(jnp.int32)
    off_by_ci = {}
    for ci in cis:
        tot = jnp.take_along_axis(
            dc[:, :, last_b[ci]], last_mcu[:, None], axis=1
        )[:, 0]
        tot = jnp.where(lane_m > 0, tot, 0)
        off = jnp.cumsum(tot) - tot  # exclusive prefix over lanes
        if segmented:
            # Subtract the prefix at each lane's marker-segment start.
            off = off - off[seg_first_j][lane_seg_j]
        if extra_base is not None:
            off = off + extra_base[ci]
        off_by_ci[ci] = off
    add_b = jnp.stack(
        [off_by_ci[blk_tables[b][0]] for b in range(len(blk_tables))],
        axis=-1,
    )  # [L, B]
    return flat.at[..., 0].add(add_b[:, None, :])


def _norst_geom(jpeg) -> Tuple:
    """Light static geometry for _norst_assemble_g / the jitted norst
    chain (no JpegData references pinned in closures or cache keys)."""
    frame = jpeg.frame
    scan = jpeg.scans[0]
    return (
        scan.interleaved, tuple(scan.comp_indices),
        frame.mcus_x, frame.mcus_y,
        tuple(
            (c.h, c.v, c.padded_hb, c.padded_wb, c.height_blocks,
             c.width_blocks)
            for c in frame.components
        ),
    )


def _norst_assemble_g(geom: Tuple, B: int, rows: int, M: int, flat):
    """MCU-linear assembly of the fixed-up [L, M, B, 64] lanes into
    per-component [padded_blocks, 64] zigzag grids (single image)."""
    interleaved, comp_indices, mcus_x, mcus_y, comps = geom
    if interleaved:
        total_mcus = mcus_x * mcus_y
    else:
        _h, _v, _phb, _pwb, hb, wb = comps[comp_indices[0]]
        total_mcus = wb * hb
    mcus = flat[:, : min(rows, M)].reshape(-1, B, 64)[:total_mcus]

    if interleaved:
        by_ci: Dict[int, jnp.ndarray] = {}
        b0 = 0
        for sp, ci in enumerate(comp_indices):
            h, v, phb, pwb, _hb, _wb = comps[ci]
            nb = h * v
            sub = mcus[:, b0 : b0 + nb]
            b0 += nb
            sub = sub.reshape(mcus_y, mcus_x, v, h, 64)
            sub = sub.transpose(0, 2, 1, 3, 4).reshape(phb * pwb, 64)
            by_ci[ci] = sub
        return [by_ci[ci] for ci in range(len(comps))]
    ci = comp_indices[0]
    _h, _v, phb, pwb, hb, wb = comps[ci]
    grid = mcus[:, 0].reshape(hb, wb, 64)
    grid = jnp.pad(grid, ((0, phb - hb), (0, pwb - wb), (0, 0)))
    return [grid.reshape(phb * pwb, 64)]


def _norst_assemble(plan: BlockPlan, flat, jpeg) -> List[jnp.ndarray]:
    return _norst_assemble_g(
        _norst_geom(jpeg), plan.blocks_per_mcu, plan.norst_every,
        plan.n_mcus, flat,
    )


_NORST_CHAIN_CACHE: "collections.OrderedDict[Tuple, object]" = (
    collections.OrderedDict()
)
_NORST_CHAIN_MAX = 32


def _norst_chain(plan: BlockPlan, jpeg, interpret: bool):
    """One jitted program for the whole no-restart device path: the
    wavefront kernel + lane transpose + DC prefix fixup + assembly.
    Eagerly those were a dozen dispatched ops per decode — on this
    rig's relay backend the per-op round-trips rival the kernel time
    (same lesson as the progressive chain). Keyed by geometry only."""
    geom = _norst_geom(jpeg)
    key = (
        geom, plan.n_groups, plan.n_mcus, plan.n_words,
        plan.blocks_per_mcu, plan.blk_tables, plan.n_lanes,
        plan.norst_every, len(plan.seg_first), interpret,
    )
    fn = _NORST_CHAIN_CACHE.get(key)
    if fn is not None:
        _NORST_CHAIN_CACHE.move_to_end(key)
        return fn

    G, M, W = plan.n_groups, plan.n_mcus, plan.n_words
    B = plan.blocks_per_mcu
    n_lanes, rows = plan.n_lanes, plan.norst_every
    plan_static = plan.static_key("coeff")
    lg = plan.lane_group

    def run(bits, lane_m, seg_bits, bit0, dc0):
        # dc0 primes each lane's predictors with the skeleton scan's
        # absolute values: the kernel writes TRUE DCs directly, no
        # post-hoc prefix fixup pass.
        out, err = run_wavefront(
            bits, lane_m, seg_bits, plan_static, G, interpret, bit0=bit0,
            dc0=dc0,
        )
        flat = (
            out.reshape(G, M * B * 64, SUBLANES, lg // SUBLANES)
            .transpose(0, 2, 3, 1)
            .reshape(G * lg, M, B, 64)
        )[:n_lanes]
        return _norst_assemble_g(geom, B, rows, M, flat), err

    fn = jax.jit(run)
    _NORST_CHAIN_CACHE[key] = fn
    while len(_NORST_CHAIN_CACHE) > _NORST_CHAIN_MAX:
        _NORST_CHAIN_CACHE.popitem(last=False)
    return fn


def decode_norst_to_device(
    jpeg: bitstream.JpegData,
    config: DecodeConfig = DEFAULT_CONFIG,
    every: int = 0,
) -> List[jnp.ndarray]:
    """Device entropy decode of a no-restart baseline scan: skeleton
    scan -> lanes at bit offsets with DC-primed predictors -> wavefront
    kernel -> assembled coefficient grids (device-resident). Raises on
    data errors (strict)."""
    plan = build_norst_plan(jpeg, every)
    interpret = jax.default_backend() != "tpu"
    fn = _norst_chain(plan, jpeg, interpret)
    coeffs, err = fn(
        jnp.asarray(plan.bits), jnp.asarray(plan.lane_m),
        jnp.asarray(plan.seg_bits), jnp.asarray(plan.bit0),
        jnp.asarray(plan.lane_dc0),
    )
    errs = np.asarray(err).reshape(-1)[: plan.n_lanes]
    failures = failures_from_err(errs, plan.lane_meta)
    if failures:
        raise failures[min(failures)]
    return coeffs


def decode_multiscan_to_device(
    jpeg: bitstream.JpegData, config: DecodeConfig = DEFAULT_CONFIG
) -> List[jnp.ndarray]:
    """Baseline image split into per-component non-interleaved scans
    (T.81 §B.2.3 permits any scan partition; VERDICT r4 missing #5):
    each scan decodes ON DEVICE as its own single-component frame — the
    non-interleaved scan of component ci is bit-identical to a
    grayscale scan over ci's (dwidth, dheight) sample grid — and the
    block grid pads back into the true frame's MCU-padded geometry.
    Oversize/marker-free scans take the skeleton-split lanes like any
    other stream. Returns per-component [padded_blocks, 64] zigzag
    coefficient arrays (device-resident)."""
    frame = jpeg.frame
    out: List[jnp.ndarray] = []
    grids: Dict[int, jnp.ndarray] = {}
    for scan in jpeg.scans:
        if scan.n_comps != 1:
            raise JpegUnsupportedError(
                "pallas wavefront: interleaved sub-scan in multi-scan file"
            )
        ci = scan.comp_indices[0]
        c = frame.components[ci]
        subframe = bitstream.Frame(
            progressive=False,
            precision=frame.precision,
            height=c.dheight,
            width=c.dwidth,
            components=[
                bitstream.Component(index=0, cid=c.cid, h=1, v=1, tq=c.tq)
            ],
        )
        subframe.finalize()
        subscan = dataclasses.replace(scan, comp_indices=[0])
        sub = bitstream.JpegData(
            frame=subframe,
            scans=[subscan],
            qtables=jpeg.qtables,
            restart_interval=scan.restart_interval,
        )
        try:
            comps, _ = decode_batch_to_device([sub], config, strict=True)
            grid = comps[0][0]
        except JpegUnsupportedError:
            grid = decode_norst_to_device(sub, config)[0]
        sc = subframe.components[0]
        grid = grid.reshape(sc.padded_hb, sc.padded_wb, 64)
        grid = jnp.pad(
            grid,
            (
                (0, c.padded_hb - sc.padded_hb),
                (0, c.padded_wb - sc.padded_wb),
                (0, 0),
            ),
        )
        grids[ci] = grid.reshape(-1, 64)
    for ci, c in enumerate(frame.components):
        if ci not in grids:
            raise JpegTruncatedError(
                f"multi-scan file has no scan for component {ci}"
            )
        out.append(grids[ci])
    return out


def decode_norst_to_rgb(
    jpeg: bitstream.JpegData,
    config: DecodeConfig = DEFAULT_CONFIG,
    every: int = 0,
    packed: bool = False,
):
    """FUSED decode of a no-restart (or oversize-DRI) baseline scan:
    skeleton-split lanes with DC-PRIMED predictors run the same
    wavefront+IDCT+upsample+color chain as restart-segmented streams —
    marker-free images get the full speed-of-light pixels path instead
    of dropping to coeff mode + separate transform. Returns a
    device-resident [H, W, 3]/[H, W] raster (or, with packed=True on an
    applicable layout, the planar column-packed uint16 [3, H, W//2]
    whose bytes are the u8 raster). Raises on data errors (strict)."""
    plan = build_norst_plan(jpeg, every)
    if not plan.qsets:
        raise JpegUnsupportedError("too many quantizer sets")
    interpret = jax.default_backend() != "tpu"
    fn = _rgb_chain(plan, [jpeg], config, interpret, packed=packed)
    rgb, err = fn(
        jnp.asarray(plan.bits),
        jnp.asarray(plan.lane_m),
        jnp.asarray(plan.seg_bits),
        jnp.asarray(plan.lane_qset),
        jnp.asarray(plan.bit0),
        jnp.asarray(plan.lane_dc0),
    )
    errs = np.asarray(err).reshape(-1)[: plan.n_lanes]
    failures = failures_from_err(errs, plan.lane_meta)
    if failures:
        raise failures[min(failures)]
    return rgb[0]


def decode_norst_sharded(
    jpeg: bitstream.JpegData,
    config: DecodeConfig = DEFAULT_CONFIG,
    every: int = 0,
    axis: str = "lanes",
    mesh=None,
) -> List[jnp.ndarray]:
    """No-restart entropy decode SHARDED over the device mesh: each
    device wavefront-decodes a contiguous chunk of skeleton-scan lanes
    with local predictors; the cross-shard DC base travels over ICI via
    halo.dc_prefix_fixup (BASELINE.json:5 "DC-predictor state via ICI
    collectives"), and a local exclusive prefix finishes the fixup.
    Returns device-resident per-component coefficient grids."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel import halo

    if mesh is None:
        mesh = jax.make_mesh((jax.device_count(),), (axis,))
    d = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    if jpeg.scans and len(jpeg.scans[0].rst_offsets):
        # The cross-shard base collective assumes one continuous
        # predictor chain; restart-segmented oversize streams use the
        # single-device segmented path instead.
        raise JpegUnsupportedError(
            "sharded skeleton decode: marker-free streams only"
        )
    plan = build_norst_plan(jpeg, every)

    # Pad the group axis to a multiple of the mesh: padding groups hold
    # zero-MCU lanes that decode nothing and contribute zero DC totals.
    G = plan.n_groups
    Gp = -(-G // d) * d
    lg = plan.lane_group

    def gpad(a, fill=0):
        out = np.full((Gp,) + a.shape[1:], fill, a.dtype)
        out[:G] = a
        return out

    bits = gpad(plan.bits, -1)
    lane_m = gpad(plan.lane_m)
    seg_bits = gpad(plan.seg_bits)
    bit0 = gpad(plan.bit0)
    gd = Gp // d  # groups per device
    M, B = plan.n_mcus, plan.blocks_per_mcu
    plan_static = plan.static_key("coeff")
    interpret = jax.default_backend() != "tpu"
    blk_tables = plan.blk_tables
    cis = sorted({ci for ci, _d2, _a in blk_tables})
    last_b = {ci: max(b for b, t in enumerate(blk_tables) if t[0] == ci)
              for ci in cis}

    def local(bits_l, lane_m_l, seg_bits_l, bit0_l):
        out, err = run_wavefront(
            bits_l, lane_m_l, seg_bits_l, plan_static, gd, interpret,
            bit0=bit0_l,
        )
        flat = (
            out.reshape(gd, M * B * 64, SUBLANES, lg // SUBLANES)
            .transpose(0, 2, 3, 1)
            .reshape(gd * lg, M, B, 64)
        )
        lm = lane_m_l.reshape(-1)
        dc = flat[..., 0]
        last_mcu = jnp.maximum(lm - 1, 0)
        # Per-shard DC-delta totals per component -> the ICI collective.
        local_tots = []
        off_local = {}
        for ci in cis:
            tot = jnp.take_along_axis(
                dc[:, :, last_b[ci]], last_mcu[:, None], axis=1
            )[:, 0]
            tot = jnp.where(lm > 0, tot, 0)
            off_local[ci] = jnp.cumsum(tot) - tot
            local_tots.append(jnp.sum(tot))
        base = halo.dc_prefix_fixup(
            jnp.stack(local_tots).astype(jnp.int32), axis
        )  # [C]: sum of every previous shard's totals
        add_b = jnp.stack(
            [
                off_local[blk_tables[b][0]]
                + base[cis.index(blk_tables[b][0])]
                for b in range(B)
            ],
            axis=-1,
        )  # [Ld, B]
        flat = flat.at[..., 0].add(
            jnp.where((lm > 0)[:, None], add_b, 0)[:, None, :]
        )
        return flat, err

    fn = jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P(axis)),
            check_vma=False,
        )
    )
    flat, err = fn(
        jnp.asarray(bits), jnp.asarray(lane_m), jnp.asarray(seg_bits),
        jnp.asarray(bit0),
    )
    errs = np.asarray(err).reshape(-1)[: plan.n_lanes]
    failures = failures_from_err(errs, plan.lane_meta)
    if failures:
        raise failures[min(failures)]
    # Assembly slices at lane granularity (not shard-aligned): gather the
    # corrected lanes first. The downstream transform resharrds by MCU
    # rows anyway (halo.decode_sharded), so this is the natural exchange
    # point between lane sharding and row sharding.
    from jax.sharding import NamedSharding

    flat = jax.device_put(flat, NamedSharding(mesh, P()))
    return _norst_assemble(plan, flat[: plan.n_lanes], jpeg)


def decode_batch_to_rgb_sharded(
    jpegs: Sequence[bitstream.JpegData],
    config: DecodeConfig = DEFAULT_CONFIG,
    axis: str = "data",
    mesh=None,
):
    """Data-parallel fused decode across a device mesh (config 3 at
    multi-chip scale, SURVEY.md §2.3 DP row): the image list splits into
    one contiguous chunk per device, each device runs the SAME fused
    wavefront+IDCT+color program on its chunk under shard_map, and the
    result is an [N, H, W(,3)] array sharded on the batch axis.

    Requires a uniform batch and len(jpegs) divisible by the mesh size.
    Returns (rgb, failures)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from . import pipeline as kernel_pipeline

    if mesh is None:
        mesh = jax.make_mesh((jax.device_count(),), (axis,))
    d = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    n = len(jpegs)
    if n % d != 0:
        raise JpegUnsupportedError(
            f"sharded decode needs len(jpegs) % {d} == 0, got {n}"
        )
    per = n // d
    chunks = [jpegs[i * per : (i + 1) * per] for i in range(d)]
    plans = [build_block_plan(c) for c in chunks]
    w_max = max(p.n_words for p in plans)
    plans = [build_block_plan(c, min_words=w_max) for c in chunks]
    p0 = plans[0]
    if not p0.qsets:
        raise JpegUnsupportedError("sharded decode: too many quantizer sets")
    for p in plans[1:]:
        if (
            p.bits.shape != p0.bits.shape
            or p.blk_tables != p0.blk_tables
            or p.qsets != p0.qsets
            or p.img_qset != p0.img_qset
            or p.n_mcus != p0.n_mcus
        ):
            raise JpegUnsupportedError(
                "sharded decode needs identical chunk structure"
            )

    plan_static = p0.static_key("pixels")
    interpret = jax.default_backend() != "tpu"
    frame = chunks[0][0].frame

    def local(bits, lane_m, seg_bits, lane_qset):
        # One device's chunk: [1, ...] shard -> squeeze the device dim.
        out, err = run_wavefront(
            bits[0], lane_m[0], seg_bits[0], plan_static, p0.n_groups,
            interpret, lane_qset[0],
        )
        stacked = assemble_pixels_stacked(
            (p0.blocks_per_mcu, p0.n_mcus, p0.n_groups),
            out,
            tuple(ImageGeom.of(j) for j in chunks[0]),
        )
        rgb = kernel_pipeline.transform_planes_batch(
            frame, stacked, config, color=bitstream.color_space(chunks[0][0])
        )
        return rgb, err[None]

    fn = jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P(axis)),
            check_vma=False,
        )
    )
    bits = jnp.asarray(np.stack([p.bits for p in plans]))
    lane_m = jnp.asarray(np.stack([p.lane_m for p in plans]))
    seg_bits = jnp.asarray(np.stack([p.seg_bits for p in plans]))
    lane_qset = jnp.asarray(np.stack([p.lane_qset for p in plans]))
    rgb, err = fn(bits, lane_m, seg_bits, lane_qset)

    failures: Dict[int, Exception] = {}
    errs = np.asarray(err)
    for di in range(d):
        e = errs[di].reshape(-1)[: plans[di].n_lanes]
        for img, exc in failures_from_err(e, plans[di].lane_meta).items():
            failures.setdefault(di * per + img, exc)
    return rgb, failures
