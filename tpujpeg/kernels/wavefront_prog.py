"""Progressive scans on device (SURVEY.md §2.1 #10, §3.3): the four
T.81 §G scan kinds applied to an HBM-resident coefficient state by
block-synchronous wavefront kernels over restart-segment lanes.

Layering mirrors tpujpeg/huffman.py's progressive controller exactly
(it is the bit-exactness oracle — tests/test_prog_device.py):

  DC first   kernel: per-MCU lockstep DC symbol + EXTEND, pred<<Al
  DC refine  no kernel: one bit per block at a STATIC bit position, so
             the correction mask is a vectorized host unpack + device OR
  AC first   kernel: per-block (run,size)/EOBn state machine, lane-local
             EOB-run carried across MCUs in scratch
  AC refine  kernel: lockstep phase machine (DECODE/ADVANCE/TAIL) over
             the band, reading the prior coefficients of each block from
             HBM and emitting the corrected block

Scope: restart-segmented progressive streams (segments = lanes, the
same parallelism substrate as baseline, SURVEY.md §3.4). Marker-free
progressive scans fall back to the host engines.
"""

from __future__ import annotations

import collections
import dataclasses
import functools
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
from .wavefront_pallas import (
    AC_SYMS_PER_TRIP,
    LANE_GROUP,
    MAX_WORDS,
    SUBLANES,
    _pick_group,
    CanonTable,
    _ERR_BADCODE,
    _ERR_RUN,
    _ERR_TRUNC,
    _advance_regs,
    _decode_symbol,
    _decode_symbol_win,
    _load_word,
    _receive_extend,
    _win_from_regs,
    _window64,
    failures_from_err,
)

# ---------------------------------------------------------------------------
# Per-scan plan: restart segments -> lane rows (same layout as baseline).
# Batch-first: a ScanPlan covers scan index k of a GROUP of images whose
# scan scripts match — every image's restart segments become lanes of ONE
# kernel launch, so a batch of progressive files pays one dispatch per
# scan index instead of one per (image, scan).
# ---------------------------------------------------------------------------


def _seg_geometry(jpeg, scan):
    """(total_mcus, restart_interval, n_segments) for one scan, with the
    same validity checks every device-progressive path needs."""
    frame = jpeg.frame
    if scan.interleaved:
        total = frame.mcus_x * frame.mcus_y
    else:
        c0 = frame.components[scan.comp_indices[0]]
        total = c0.width_blocks * c0.height_blocks
    ri = scan.restart_interval or total
    n_seg = -(-total // ri)
    if len(scan.rst_offsets) + 1 < n_seg:
        raise JpegTruncatedError("missing restart segments")
    if n_seg == 1 and total > 1 and len(scan.data) > MAX_WORDS * 4 - 8:
        raise JpegUnsupportedError(
            "progressive scan without restart segmentation"
        )
    return total, ri, n_seg


def _stuffed_width(scan, n_seg) -> int:
    """Word row width that fits the longest segment (exact destuffed
    lengths when parse's fused walk ran, stuffed bound otherwise)."""
    if (
        scan.destuffed is not None
        and scan.dseg_starts is not None
        and len(scan.dseg_starts) >= n_seg + 1
    ):
        ds = scan.dseg_starts
        lens = ds[1 : n_seg + 1] - ds[:n_seg]
        return int(lens.max()) // 4 + 2 if n_seg else 2
    ro = np.asarray(scan.rst_offsets[: n_seg - 1], dtype=np.int64)
    offs_r = np.concatenate([ro, [len(scan.data)]])
    starts_r = np.concatenate([[0], ro + 2])
    stuffed = offs_r - starts_r
    return int(stuffed.max()) // 4 + 2 if n_seg else 2


def _fill_rows(scan, n_seg, W, out_words, out_bits) -> None:
    """Destuff one scan's segments into fixed-width word rows (native
    fast path, pure-python fallback)."""
    try:
        from ..native import entropy as native_entropy

        native_entropy.destuff_rows  # force lazy build
        # Guard the cache like the sizing paths do: a short dseg_starts
        # would make rows_from_dest read seg_starts[s+1] out of bounds
        # C-side (today unreachable — _seg_geometry raises first — but
        # don't rely on that non-local invariant here).
        if (
            scan.destuffed is not None
            and scan.dseg_starts is not None
            and len(scan.dseg_starts) >= n_seg + 1
        ):
            native_entropy.rows_from_dest(
                scan.destuffed, scan.dseg_starts, 0, n_seg, W,
                out_words, out_bits,
            )
        else:
            native_entropy.destuff_rows(
                scan, n_seg, W, out_words, out_bits
            )
    except JpegSyntaxError:
        raise
    except Exception:
        pieces = bitstream.split_restart_segments(scan)[:n_seg]
        lens = np.asarray([len(pc) for pc in pieces], np.int64)
        rows_u8 = np.full((n_seg, W * 4), 0xFF, np.uint8)
        mask = np.arange(W * 4, dtype=np.int64)[None, :] < lens[:, None]
        rows_u8[mask] = np.frombuffer(b"".join(pieces), np.uint8)
        out_words[:] = rows_u8.view(">u4").astype(np.uint32).view(np.int32)
        out_bits[:] = (lens * 8).astype(np.int32)


class ScanPlan:
    """Lane plan for scan index k across a group of images. Lanes are
    image-major (image i's segments are contiguous); `img_view[i]` is
    (lane0, n_seg, rows, total_mcus) for slicing kernel outputs back to
    per-image block grids."""

    def __init__(self, jpegs, k: int, w_snap: bool = False):
        geo = [_seg_geometry(j, j.scans[k]) for j in jpegs]
        W = 2
        for j, (_total, _ri, n_seg) in zip(jpegs, geo):
            W = max(W, _stuffed_width(j.scans[k], n_seg))
        W = min(-(-W // 32) * 32, MAX_WORDS + 32)
        if W > MAX_WORDS:
            raise JpegUnsupportedError(
                f"progressive segment too long ({W} words)"
            )
        if w_snap:
            # Table-dynamic chains: snap the row width to a coarse
            # ladder so files that differ only in payload density share
            # one compiled chain (W is part of the kernel's shape).
            for step in (32, 64, 128, 256, 384, MAX_WORDS):
                if W <= step:
                    W = step
                    break

        L = sum(n_seg for (_t, _r, n_seg) in geo)
        # Group width by the widest VMEM block this scan kind's kernel
        # holds per lane: DC-first writes B<=16 words, AC-first a 64-row
        # block, AC-refine a 64-row prior in AND out (see _pick_group —
        # wider lockstep groups are ~free throughput, the hot loop being
        # latency-bound).
        scan0 = jpegs[0].scans[k]
        if scan0.ss == 0:
            out_words = 16
        elif scan0.ah == 0:
            out_words = 64
        else:
            out_words = 128
        lane_group = _pick_group(W, L, out_words)
        K = lane_group // SUBLANES
        G = -(-L // lane_group)
        bits_flat = np.empty((G * lane_group, W), dtype=np.int32)
        seg_bits = np.zeros(G * lane_group, dtype=np.int32)
        lm = np.zeros(G * lane_group, np.int32)
        meta = np.zeros((L, 3), np.int32)
        self.img_view = []
        lane0 = 0
        for ii, (j, (total, ri, n_seg)) in enumerate(zip(jpegs, geo)):
            scan = j.scans[k]
            _fill_rows(
                scan, n_seg, W,
                bits_flat[lane0 : lane0 + n_seg],
                seg_bits[lane0 : lane0 + n_seg],
            )
            fm = np.arange(n_seg, dtype=np.int64) * ri
            nm = np.minimum(ri, total - fm).astype(np.int32)
            lm[lane0 : lane0 + n_seg] = nm
            meta[lane0 : lane0 + n_seg, 0] = ii
            meta[lane0 : lane0 + n_seg, 1] = fm.astype(np.int32)
            meta[lane0 : lane0 + n_seg, 2] = nm
            self.img_view.append((lane0, n_seg, min(ri, total), total))
            lane0 += n_seg
        bits_flat[lane0:] = -1

        self.bits = bits_flat.reshape(G, SUBLANES, K, W)
        self.seg_bits = seg_bits.reshape(G, SUBLANES, K)
        self.lane_m = lm.reshape(G, SUBLANES, K)
        self.lane_meta = meta
        self.n_groups = G
        self.n_lanes = L
        self.n_words = W
        self.n_mcus = int(lm.max()) if L else 0
        self.lane_group = lane_group


def _tables_for_scan(scan, dc: bool) -> Tuple:
    out = []
    for sp in range(scan.n_comps):
        key = (0, scan.dc_ids[sp]) if dc else (1, scan.ac_ids[sp])
        if key not in scan.huff:
            raise JpegSyntaxError("missing Huffman table")
        out.append(CanonTable.from_spec(scan.huff[key]))
    return tuple(out)


# ---------------------------------------------------------------------------
# DC first kernel
# ---------------------------------------------------------------------------


def _make_dc_first_kernel(static, dyn: bool = False):
    if dyn:
        blk_sp, W, al, lane_group = static
        dc_tbls = None
    else:
        blk_sp, dc_tbls, W, al, lane_group = static
    K = lane_group // SUBLANES
    B = len(blk_sp)
    n_sp = max(blk_sp) + 1

    def kernel(lane_m_ref, bits_ref, tbl_ref, out_ref, err_ref, cur_ref,
               end_ref, pred_ref, err_acc_ref, w0_ref, w1_ref):
        m = pl.program_id(1)
        bits = bits_ref[0]
        lane_m = lane_m_ref[0]
        tbls = (
            [_dyn_table_load(tbl_ref, sp) for sp in range(n_sp)]
            if dyn else dc_tbls
        )

        @pl.when(m == 0)
        def _init():
            cur_ref[:] = jnp.zeros((SUBLANES, K), jnp.int32)
            pred_ref[:] = jnp.zeros((4, SUBLANES, K), jnp.int32)
            err_acc_ref[:] = jnp.zeros((SUBLANES, K), jnp.int32)
            zero = jnp.zeros((SUBLANES, K), jnp.int32)
            w0_ref[:] = _load_word(bits, zero, W)
            w1_ref[:] = _load_word(bits, zero + 1, W)

        active = m < lane_m
        for b in range(B):
            sp = blk_sp[b]
            cur = cur_ref[:]
            err = err_acc_ref[:]
            ok = active & (err == 0)
            win = _win_from_regs(w0_ref[:], w1_ref[:], cur)
            t, dlen = _decode_symbol_win_any(win, tbls[sp])
            bad = ok & ((dlen > 16) | (t > 15))
            t = jnp.where(t > 15, 0, t)
            diff = _receive_extend(win, dlen, t)
            pred = pred_ref[sp] + jnp.where(ok, diff, 0)
            pred_ref[sp] = pred
            cur2 = cur + jnp.where(ok, dlen + t, 0)
            w0_ref[:], w1_ref[:] = _advance_regs(
                bits, w0_ref[:], w1_ref[:], cur, cur2, W
            )
            cur_ref[:] = cur2
            err_acc_ref[:] = jnp.where(bad, _ERR_BADCODE, err)
            out_ref[0, 0, b] = jnp.where(ok, pred << al, 0)

        trunc = (cur_ref[:] > end_ref[0] + 7) & (lane_m > 0)
        err_ref[0] = err_acc_ref[:] | jnp.where(trunc, _ERR_TRUNC, 0)

    return kernel


def _run_dc_first(bits, lane_m, seg_bits, static, n_groups, n_mcus,
                  interpret, tbl=None):
    dyn = tbl is not None
    if dyn:
        blk_sp, W, al, lane_group = static
    else:
        blk_sp, dc_tbls, W, al, lane_group = static
    K = lane_group // SUBLANES
    B = len(blk_sp)
    kern = _make_dc_first_kernel(static, dyn=dyn)
    bits = jnp.transpose(bits, (0, 3, 1, 2))

    if dyn:
        def kernel(lane_m_ref, bits_ref, end_ref, tbl_ref, out_ref,
                   err_ref, cur_ref, pred_ref, err_acc_ref, w0_ref,
                   w1_ref):
            kern(lane_m_ref, bits_ref, tbl_ref, out_ref, err_ref,
                 cur_ref, end_ref, pred_ref, err_acc_ref, w0_ref,
                 w1_ref)
    else:
        def kernel(lane_m_ref, bits_ref, end_ref, out_ref, err_ref,
                   cur_ref, pred_ref, err_acc_ref, w0_ref, w1_ref):
            kern(lane_m_ref, bits_ref, None, out_ref, err_ref, cur_ref,
                 end_ref, pred_ref, err_acc_ref, w0_ref, w1_ref)

    in_specs = [
        pl.BlockSpec((1, SUBLANES, K), lambda g, m: (g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, W, SUBLANES, K), lambda g, m: (g, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, SUBLANES, K), lambda g, m: (g, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = (lane_m, bits, seg_bits)
    if dyn:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands = operands + (tbl,)

    out, err = pl.pallas_call(
        kernel,
        grid=(n_groups, n_mcus),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, 1, B, SUBLANES, K),
                         lambda g, m: (g, m, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUBLANES, K), lambda g, m: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(
                (n_groups, n_mcus, B, SUBLANES, K), jnp.int32
            ),
            jax.ShapeDtypeStruct((n_groups, SUBLANES, K), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((SUBLANES, K), jnp.int32),
            pltpu.VMEM((4, SUBLANES, K), jnp.int32),
            pltpu.VMEM((SUBLANES, K), jnp.int32),
            pltpu.VMEM((SUBLANES, K), jnp.int32),  # window word 0
            pltpu.VMEM((SUBLANES, K), jnp.int32),  # window word 1
        ],
        interpret=interpret,
    )(*operands)
    return out, err


run_dc_first_jit = jax.jit(
    _run_dc_first,
    static_argnames=("static", "n_groups", "n_mcus", "interpret"),
)


# ---------------------------------------------------------------------------
# AC first kernel (single component, one block per MCU)
# ---------------------------------------------------------------------------


def _receive_raw(win, length, nbits):
    """nbits unsigned bits following the code (no EXTEND)."""
    after = (win << length.astype(jnp.uint32)).astype(jnp.uint32)
    return jnp.where(
        nbits > 0,
        (after >> (np.uint32(32) - nbits.astype(jnp.uint32))).astype(
            jnp.int32
        ),
        0,
    )


def _make_ac_first_kernel(static, dyn: bool = False):
    """AC-first scan kernel. With dyn=True the Huffman table is a
    [1, 3, 64] RUNTIME operand (SMEM ref, extra kernel arg) instead of
    compile-time constants — one compiled program serves every table
    set of the same scan-script geometry (see the table-dynamic section
    below)."""
    if dyn:
        W, ss, se, al, lane_group = static
        ac_tbl = None
    else:
        (ac_tbl,), W, ss, se, al, lane_group = static
    K = lane_group // SUBLANES

    def kernel(lane_m_ref, bits_ref, tbl_ref, out_ref, err_ref, cur_ref,
               end_ref, eob_ref, err_acc_ref, w0_ref, w1_ref, acc_ref,
               k_ref):
        m = pl.program_id(1)
        bits = bits_ref[0]
        lane_m = lane_m_ref[0]
        # Scalar table loads happen ONCE here, outside the hot loop:
        # re-issuing 96 SMEM reads per symbol put the dynamic kernel at
        # 3.06x baked; hoisted it measures 1.20x (tools/prog_dyn_probe).
        tbl = _dyn_table_load(tbl_ref, 0) if dyn else ac_tbl

        @pl.when(m == 0)
        def _init():
            cur_ref[:] = jnp.zeros((SUBLANES, K), jnp.int32)
            eob_ref[:] = jnp.zeros((SUBLANES, K), jnp.int32)
            err_acc_ref[:] = jnp.zeros((SUBLANES, K), jnp.int32)
            zero = jnp.zeros((SUBLANES, K), jnp.int32)
            w0_ref[:] = _load_word(bits, zero, W)
            w1_ref[:] = _load_word(bits, zero + 1, W)

        active = m < lane_m
        kiota = jax.lax.broadcasted_iota(jnp.int32, (64, SUBLANES, K), 0)

        cur = cur_ref[:]
        err = err_acc_ref[:]
        eob = eob_ref[:]
        ok = active & (err == 0)
        skip = ok & (eob > 0)
        eob = jnp.where(skip, eob - 1, eob)
        busy0 = ok & ~skip

        # Loop state lives in scratch refs, updated in place: Mosaic
        # copies while_loop carries every trip, and the [64,8,K]
        # accumulator carry alone was ~20% of the baseline kernel's
        # time before the same fix landed there (wavefront_pallas).
        acc_ref[:] = jnp.zeros((64, SUBLANES, K), jnp.int32)
        k_ref[:] = jnp.where(busy0, ss, 65)
        eob_ref[:] = eob
        err_acc_ref[:] = err

        def cond(step):
            busy = busy0 & (k_ref[:] <= se) & (err_acc_ref[:] == 0)
            return jnp.any(busy) & (step < 80)

        def sym_step(_cur, _k, _err, _eob, _w0, _w1):
            """One AC-first symbol per lane, registers in/out; returns
            the new state plus this symbol's add-term for the
            accumulator (folded into one acc_ref write per trip)."""
            busy = busy0 & (_k <= se) & (_err == 0)
            win = _win_from_regs(_w0, _w1, _cur)
            rs, alen = _decode_symbol_win_any(win, tbl)
            badc = busy & (alen > 16)
            r = rs >> 4
            s = rs & 0x0F
            val = _receive_extend(win, alen, s)
            is_eob = (s == 0) & (r < 15)
            is_zrl = (s == 0) & (r == 15)
            nk = _k + jnp.where(s > 0, r, 0)
            over = busy & (s > 0) & (nk > se)
            emit = busy & (s > 0) & (nk <= se)
            vmask = jnp.where(emit, val << al, 0)
            addterm = jnp.where(kiota == nk[None], vmask[None], 0)
            extra = _receive_raw(win, alen, jnp.where(is_eob, r, 0))
            new_eob = jnp.left_shift(1, r) - 1 + extra
            _eob = jnp.where(busy & is_eob, new_eob, _eob)
            consumed = alen + jnp.where(
                s > 0, s, jnp.where(is_eob, r, 0)
            )
            nc = _cur + jnp.where(busy, consumed, 0)
            _w0, _w1 = _advance_regs(bits, _w0, _w1, _cur, nc, W)
            _k = jnp.where(
                busy,
                jnp.where(is_eob, 65, jnp.where(is_zrl, _k + 16, nk + 1)),
                _k,
            )
            _err = jnp.where(badc, _ERR_BADCODE, _err)
            _err = jnp.where(over, _ERR_RUN, _err)
            return nc, _k, _err, _eob, _w0, _w1, addterm

        def body(step):
            st = (cur_ref[:], k_ref[:], err_acc_ref[:], eob_ref[:],
                  w0_ref[:], w1_ref[:])
            adds = acc_ref[:]
            for _s in range(AC_SYMS_PER_TRIP):
                *st, addterm = sym_step(*st)
                adds = adds + addterm
            acc_ref[:] = adds
            cur_ref[:], k_ref[:], err_acc_ref[:] = st[0], st[1], st[2]
            eob_ref[:], w0_ref[:], w1_ref[:] = st[3], st[4], st[5]
            return step + 1

        cur_ref[:] = cur
        jax.lax.while_loop(cond, body, jnp.int32(0))

        out_ref[0, 0] = acc_ref[:]
        err = err_acc_ref[:]

        trunc = (cur_ref[:] > end_ref[0] + 7) & (lane_m > 0)
        err_ref[0] = err | jnp.where(trunc, _ERR_TRUNC, 0)

    return kernel


def _run_ac_first(bits, lane_m, seg_bits, static, n_groups, n_mcus,
                  interpret, tbl=None):
    """With tbl=None the Huffman table is baked from `static`; with a
    [1, 3, 64] int32 `tbl` operand the table-dynamic kernel runs (the
    baked call keeps its exact historical HLO so cached programs stay
    valid)."""
    dyn = tbl is not None
    if dyn:
        W, ss, se, al, lane_group = static
    else:
        _tbls, W, ss, se, al, lane_group = static
    K = lane_group // SUBLANES
    kern = _make_ac_first_kernel(static, dyn=dyn)
    bits = jnp.transpose(bits, (0, 3, 1, 2))

    if dyn:
        def kernel(lane_m_ref, bits_ref, end_ref, tbl_ref, out_ref,
                   err_ref, cur_ref, eob_ref, err_acc_ref, w0_ref,
                   w1_ref, acc_ref, k_ref):
            kern(lane_m_ref, bits_ref, tbl_ref, out_ref, err_ref,
                 cur_ref, end_ref, eob_ref, err_acc_ref, w0_ref, w1_ref,
                 acc_ref, k_ref)
    else:
        def kernel(lane_m_ref, bits_ref, end_ref, out_ref, err_ref,
                   cur_ref, eob_ref, err_acc_ref, w0_ref, w1_ref,
                   acc_ref, k_ref):
            kern(lane_m_ref, bits_ref, None, out_ref, err_ref, cur_ref,
                 end_ref, eob_ref, err_acc_ref, w0_ref, w1_ref, acc_ref,
                 k_ref)

    in_specs = [
        pl.BlockSpec((1, SUBLANES, K), lambda g, m: (g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, W, SUBLANES, K), lambda g, m: (g, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, SUBLANES, K), lambda g, m: (g, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = (lane_m, bits, seg_bits)
    if dyn:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands = operands + (tbl,)

    out, err = pl.pallas_call(
        kernel,
        grid=(n_groups, n_mcus),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, 1, 64, SUBLANES, K),
                         lambda g, m: (g, m, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUBLANES, K), lambda g, m: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(
                (n_groups, n_mcus, 64, SUBLANES, K), jnp.int32
            ),
            jax.ShapeDtypeStruct((n_groups, SUBLANES, K), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((SUBLANES, K), jnp.int32),  # cursor
            pltpu.VMEM((SUBLANES, K), jnp.int32),  # EOB run
            pltpu.VMEM((SUBLANES, K), jnp.int32),  # error flags
            pltpu.VMEM((SUBLANES, K), jnp.int32),  # window word 0
            pltpu.VMEM((SUBLANES, K), jnp.int32),  # window word 1
            pltpu.VMEM((64, SUBLANES, K), jnp.int32),  # accumulator
            pltpu.VMEM((SUBLANES, K), jnp.int32),  # k index
        ],
        interpret=interpret,
    )(*operands)
    return out, err


run_ac_first_jit = jax.jit(
    _run_ac_first,
    static_argnames=("static", "n_groups", "n_mcus", "interpret"),
)


# ---------------------------------------------------------------------------
# Table-DYNAMIC AC-first kernel (VERDICT r4 next #4): Huffman tables as
# runtime operands instead of compile-time constants. libjpeg emits
# per-image OPTIMIZED tables for progressive, so with baked tables every
# distinct file costs a fresh 10-30 min chain compile; a table-dynamic
# kernel compiles ONCE per (geometry, scan-script shape) and takes the
# tables as data. The per-symbol price vs baked:
#   * maxcode/valoffset: 16 scalar compares either way, but no pruning
#     of empty lengths (baked skips ~2-5) and the constants come from
#     SREGs instead of immediates;
#   * huffval: a 63-deep dynamic select tree over 64 packed SMEM words
#     (same shape as the baked _select_bytes tree, but no equal-subtree
#     pruning).
# Measured on chip by tools/prog_dyn_probe.py — see BASELINE.md.
# ---------------------------------------------------------------------------


def dyn_table_pack(tbl) -> np.ndarray:
    """Pack one CanonTable into the [3, 64] int32 runtime operand the
    dynamic kernels read from SMEM: row 0 maxcode[l] (-1 where empty),
    row 1 valoffset[l], row 2 huffval packed 4 bytes/word (the
    _select_bytes layout)."""
    out = np.zeros((3, 64), np.int32)
    out[0, :] = -1
    out[0, : len(tbl.maxcode)] = np.asarray(tbl.maxcode, np.int64).astype(
        np.int32
    )
    out[1, : len(tbl.valoffset)] = np.asarray(
        tbl.valoffset, np.int64
    ).astype(np.int32)
    hv = list(tbl.huffval)
    for i in range(64):
        w = (
            hv[4 * i]
            | (hv[4 * i + 1] << 8)
            | (hv[4 * i + 2] << 16)
            | (hv[4 * i + 3] << 24)
        )
        out[2, i] = w - (1 << 32) if w >= (1 << 31) else w
    return out


def _dyn_table_load(tbl_ref, i: int):
    """Read table i of the [n_tbl, 3, 64] operand into scalar values
    ONCE (at kernel top, outside the hot loop): the while_loop body
    must not re-issue 96 SMEM reads per symbol on the latency-bound
    chain (measured: hoisting took the dynamic AC-first kernel from
    3.06x to 1.20x baked)."""
    mc = [tbl_ref[i, 0, l] for l in range(17)]
    vo = [tbl_ref[i, 1, l] for l in range(17)]
    hv = [tbl_ref[i, 2, w] for w in range(64)]
    return mc, vo, hv


def _decode_symbol_win_any(win, tbl):
    """Dispatch on table form: compile-time CanonTable constants or the
    (mc, vo, hv) scalar tuple of a runtime operand."""
    if isinstance(tbl, CanonTable):
        return _decode_symbol_win(win, tbl)
    return _decode_symbol_win_dyn(win, tbl)


def _dyn_select_bytes(idx, hv):
    """values[idx] for a runtime table: binary select tree over the 64
    packed scalar words (row 2 of dyn_table_pack), then byte extract —
    the dynamic twin of _select_bytes."""
    idx2 = idx >> 2
    vals = list(hv)
    bit = 1
    while len(vals) > 1:
        vals = [
            jnp.where((idx2 & bit) != 0, vals[i + 1], vals[i])
            for i in range(0, len(vals), 2)
        ]
        bit <<= 1
    sh = (idx & 3) << 3
    return (vals[0] >> sh) & 0xFF


def _decode_symbol_win_dyn(win, tbl):
    """_decode_symbol_win against a runtime table (mc, vo, hv) of
    scalars pre-loaded by _dyn_table_load."""
    mc, vo, hv = tbl
    length = jnp.full(win.shape, 17, jnp.int32)
    idx = jnp.zeros(win.shape, jnp.int32)
    for l in range(16, 0, -1):
        peek = (win >> np.uint32(32 - l)).astype(jnp.int32)
        # maxcode[l] == -1 (no codes) can never match: peek >= 0.
        sel = peek <= mc[l]
        length = jnp.where(sel, l, length)
        idx = jnp.where(sel, peek + vo[l], idx)
    idx = jnp.clip(idx, 0, 255)
    sym = _dyn_select_bytes(idx, hv)
    return sym, length


# ---------------------------------------------------------------------------
# AC refine kernel: per trip, one (run,size)/EOBn symbol PLUS up to 32
# correction bits, vectorized over the whole 64-coefficient band.
#
# The old phase machine consumed ONE bit (or examined one coefficient)
# per lockstep trip, so a full-band luma refinement scan walked up to
# ~70 trips per block. This formulation exploits what T.81 §G.1.2.3's
# serial loop hides: given the band's zero/nonzero pattern, the entire
# advance is data-independent —
#   * the stop position after a (run,size) symbol is the (r+1)-th zero
#     (16th for ZRL) at or after k: one cumsum over the zeros + a min;
#   * every nonzero coefficient strictly before the stop consumes one
#     correction bit, in k order — its bit index is its RANK among
#     those nonzeros: a cumsum turns the 32-bit register window into
#     all the correction bits at once;
#   * an EOB tail is the same thing with the stop pinned past se.
# Blocks needing more than 32 correction bits for one symbol continue
# in chunks of 32 (rank windows) on later trips — rare in practice.
# ---------------------------------------------------------------------------

_MODE_SYMBOL = 0   # needs a Huffman symbol decoded
_MODE_RANGE = 1    # consuming a range's correction bits
_MODE_DONE = 2


def _cumsum64(x):
    """Inclusive cumsum along axis 0 (size 64) via 6 doubling steps —
    concatenate on the major dim lowers on Mosaic where strided/
    interleaved forms do not (CLAUDE.md)."""
    for sh in (1, 2, 4, 8, 16, 32):
        x = x + jnp.concatenate(
            [jnp.zeros((sh,) + x.shape[1:], x.dtype), x[:-sh]], axis=0
        )
    return x


def _make_ac_refine_kernel(static, dyn: bool = False):
    if dyn:
        W, ss, se, al, lane_group = static
        ac_tbl = None
    else:
        (ac_tbl,), W, ss, se, al, lane_group = static
    K = lane_group // SUBLANES
    p1 = 1 << al
    m1 = (-1) << al

    def kernel(lane_m_ref, bits_ref, prior_ref, tbl_ref, out_ref,
               err_ref, cur_ref, end_ref, eob_ref, err_acc_ref, w0_ref,
               w1_ref, k_ref, kstop_ref, place_ref, tail_ref, mode_ref,
               done_ref):
        m = pl.program_id(1)
        bits = bits_ref[0]
        lane_m = lane_m_ref[0]
        tbl = _dyn_table_load(tbl_ref, 0) if dyn else ac_tbl

        @pl.when(m == 0)
        def _init():
            cur_ref[:] = jnp.zeros((SUBLANES, K), jnp.int32)
            eob_ref[:] = jnp.zeros((SUBLANES, K), jnp.int32)
            err_acc_ref[:] = jnp.zeros((SUBLANES, K), jnp.int32)
            zero = jnp.zeros((SUBLANES, K), jnp.int32)
            w0_ref[:] = _load_word(bits, zero, W)
            w1_ref[:] = _load_word(bits, zero + 1, W)

        active = m < lane_m
        kiota = jax.lax.broadcasted_iota(jnp.int32, (64, SUBLANES, K), 0)

        # The updated coefficient band lives in the OUTPUT block ref
        # (not a while carry): Mosaic copies carries every trip, and
        # this one is 512 KB (the same fix as the baseline kernel's
        # accumulator, wavefront_pallas).
        out_ref[0, 0] = prior_ref[0, 0]

        eob0 = eob_ref[:]
        ok = active & (err_acc_ref[:] == 0)
        entry_tail = ok & (eob0 > 0)
        # Block entry: a pending EOB run means the whole band [ss..se]
        # is one correction-bit range (the tail); otherwise decode.
        mode_ref[:] = jnp.where(
            ok, jnp.where(entry_tail, _MODE_RANGE, _MODE_SYMBOL),
            _MODE_DONE,
        )
        k_ref[:] = jnp.full((SUBLANES, K), ss, jnp.int32)
        kstop_ref[:] = jnp.full((SUBLANES, K), se + 1, jnp.int32)
        place_ref[:] = jnp.zeros((SUBLANES, K), jnp.int32)
        tail_ref[:] = jnp.where(entry_tail, 1, 0)
        done_ref[:] = jnp.zeros((SUBLANES, K), jnp.int32)

        def cond(step):
            return jnp.any(mode_ref[:] != _MODE_DONE) & (step < 128)

        def substep(cv, cur, rw0, rw1, k, kstop, place, tail, eob, mode,
                    err, done):
            """One symbol + one <=32-bit correction chunk for every
            lane, registers in/out. cv is the [64, 8, K] band block,
            carried in REGISTERS across the trip's substeps (safe: every
            update this substep makes lands at positions < the next
            substep's k, and all band tests are masked to kiota >= k, so
            substep 2 never reads a row substep 1 wrote); body() writes
            it back to out_ref once per trip."""

            # --- Symbol decode (mode SYMBOL). ---
            dec = mode == _MODE_SYMBOL
            win = _win_from_regs(rw0, rw1, cur)
            rs, alen = _decode_symbol_win_any(win, tbl)
            badc = dec & (alen > 16)
            rr = rs >> 4
            ds = rs & 0x0F
            bads = dec & (ds > 1)  # refine sizes are 0 or 1 (T.81 G.1.2.3)
            sign = _receive_raw(win, alen, jnp.where(ds > 0, 1, 0))
            nval = jnp.where(sign > 0, p1, m1)
            is_eob = (ds == 0) & (rr < 15)
            extra = _receive_raw(win, alen, jnp.where(is_eob, rr, 0))
            dec_bits = alen + jnp.where(
                ds > 0, 1, jnp.where(is_eob, rr, 0)
            )
            cur1 = cur + jnp.where(dec, dec_bits, 0)
            eob = jnp.where(
                dec & is_eob, jnp.left_shift(1, rr) + extra, eob
            )

            # Stop position: the (r+1)-th zero at/after k ((16)th for
            # ZRL) — or past the band for EOB / exhausted runs. One
            # cumsum serves both jobs this substep: zeros for decode
            # lanes' stop search, nonzeros for range lanes' bit ranks
            # (derived arithmetically below).
            run = dec & ~is_eob
            in_lo = kiota >= k[None]
            # ONE windowed mask serves both jobs (saves a full second
            # [64,..] mask + select — this kernel is ISSUE-bound on its
            # band-shaped ops, unlike the latency-bound baseline): run
            # lanes count ZEROS in [k..se], EOB/range lanes count
            # NONZEROS in [k..kstop_eff) — (cv==0) XOR ~run folds the
            # two value tests into one compare pair.
            kstop_eff = jnp.where(dec, se + 1, kstop)
            mask = (
                ((cv == 0) ^ (~run[None])) & in_lo
                & (kiota < kstop_eff[None])
            ).astype(jnp.int32)
            mcum = _cumsum64(mask)
            # Nonzeros in the whole [k..bound) window, closed form — the
            # bottom row of the cumsum (static slice, no reduce).
            row_se = mcum[se]
            target = jnp.where(ds > 0, rr + 1, 16)
            # Stop position, closed form: mcum is monotone, so the count
            # of rows with mcum < target IS the 0-based index of the
            # target-th zero (count 64 = not in band). Replaces the old
            # where(hit)+min-reduce with one compare + sum-reduce.
            kstop_found = jnp.sum(
                (mcum < target[None]).astype(jnp.int32), axis=0
            )
            notfound = kstop_found >= 64
            err = jnp.where(badc | bads, _ERR_BADCODE, err)
            err = jnp.where(run & (ds > 0) & notfound, _ERR_RUN, err)
            kstop = jnp.where(
                dec, jnp.where(run & ~notfound, kstop_found, se + 1),
                kstop,
            )
            place = jnp.where(
                dec, jnp.where((ds > 0) & ~notfound, nval, 0), place
            )
            tail = jnp.where(dec, jnp.where(is_eob, 1, 0), tail)
            done = jnp.where(dec, 0, done)
            mode = jnp.where(dec, _MODE_RANGE, mode)
            rw0, rw1 = _advance_regs(bits, rw0, rw1, cur, cur1, W)

            # Total correction bits this range owes, closed form:
            # run-found lanes have exactly (target-1) zeros before the
            # stop, so nonzeros = span - zeros; everyone else counts
            # nonzeros directly in the cumsum's bottom row.
            total_nz = jnp.where(
                run,
                jnp.where(
                    notfound, (se + 1 - k) - row_se,
                    kstop - k - (target - 1),
                ),
                row_se,
            )

            # --- Range correction bits (everyone now in RANGE):
            # ranks [done, done+32) of the range's nonzeros map to the
            # window's bits MSB-first. ---
            rng = (mode == _MODE_RANGE) & (err == 0)
            win2 = _win_from_regs(rw0, rw1, cur1)
            nz_j = (cv != 0) & in_lo & (kiota < kstop[None])
            # Rank of each nonzero among the range's nonzeros, 0-based:
            # decode lanes derive it from the zeros cumsum (positions -
            # zeros), range-continuation lanes read it directly.
            ncum = jnp.where(
                run[None], (kiota - k[None] + 1) - mcum, mcum
            )
            rank = ncum - 1 - done[None]
            in_chunk = nz_j & rng[None] & (rank >= 0) & (rank < 32)
            rank_c = jnp.clip(rank, 0, 31)
            bit = (
                (win2[None] >> (np.uint32(31) - rank_c.astype(jnp.uint32)))
                .astype(jnp.int32)
                & 1
            )
            do_fix = in_chunk & (bit > 0) & ((cv & p1) == 0)
            delta = jnp.where(cv >= 0, p1, m1)
            left = total_nz - done
            consumed = jnp.where(rng, jnp.clip(left, 0, 32), 0)
            complete = rng & (left <= 32)
            # Placement of the newly-significant coefficient at kstop
            # happens when its range completes (kstop <= se only for
            # placing lanes; EOB/ZRL ranges carry place == 0).
            placing = complete & (place != 0)
            cv = (
                cv
                + jnp.where(do_fix, delta, 0)
                + jnp.where(
                    (kiota == kstop[None]) & placing[None],
                    place[None], 0,
                )
            )
            cur2 = cur1 + consumed
            rw0, rw1 = _advance_regs(bits, rw0, rw1, cur1, cur2, W)

            # >32-bit ranges keep k/kstop and continue at done+32.
            done = jnp.where(rng & ~complete, done + 32, done)
            k = jnp.where(complete, kstop + 1, k)
            eob = jnp.where(complete & (tail > 0), eob - 1, eob)
            mode = jnp.where(
                complete,
                jnp.where((tail > 0) | (k > se), _MODE_DONE, _MODE_SYMBOL),
                mode,
            )
            mode = jnp.where(err != 0, _MODE_DONE, mode)
            return (cv, cur2, rw0, rw1, k, kstop, place, tail, eob,
                    mode, err, done)

        def body(step):
            # Band block read ONCE per trip into registers, written once
            # at the end (was a read+write per substep); it must NOT be
            # a while-loop carry — Mosaic copies carries every trip.
            st = (out_ref[0, 0], cur_ref[:], w0_ref[:], w1_ref[:],
                  k_ref[:], kstop_ref[:], place_ref[:], tail_ref[:],
                  eob_ref[:], mode_ref[:], err_acc_ref[:], done_ref[:])
            for _ in range(2):  # two substeps amortize the scratch
                st = substep(*st)  # round + the cond's any-reduce
            (out_ref[0, 0], cur_ref[:], w0_ref[:], w1_ref[:], k_ref[:],
             kstop_ref[:], place_ref[:], tail_ref[:], eob_ref[:],
             mode_ref[:], err_acc_ref[:], done_ref[:]) = st
            return step + 1

        jax.lax.while_loop(cond, body, jnp.int32(0))
        err = err_acc_ref[:]

        trunc = (cur_ref[:] > end_ref[0] + 7) & (lane_m > 0)
        err_ref[0] = err | jnp.where(trunc, _ERR_TRUNC, 0)

    return kernel


def _run_ac_refine(bits, lane_m, seg_bits, prior, static, n_groups,
                   n_mcus, interpret, tbl=None):
    dyn = tbl is not None
    if dyn:
        W, ss, se, al, lane_group = static
    else:
        _tbls, W, ss, se, al, lane_group = static
    K = lane_group // SUBLANES
    kern = _make_ac_refine_kernel(static, dyn=dyn)
    bits = jnp.transpose(bits, (0, 3, 1, 2))

    if dyn:
        def kernel(lane_m_ref, bits_ref, end_ref, prior_ref, tbl_ref,
                   out_ref, err_ref, cur_ref, eob_ref, err_acc_ref,
                   w0_ref, w1_ref, k_ref, kstop_ref, place_ref,
                   tail_ref, mode_ref, done_ref):
            kern(lane_m_ref, bits_ref, prior_ref, tbl_ref, out_ref,
                 err_ref, cur_ref, end_ref, eob_ref, err_acc_ref,
                 w0_ref, w1_ref, k_ref, kstop_ref, place_ref, tail_ref,
                 mode_ref, done_ref)
    else:
        def kernel(lane_m_ref, bits_ref, end_ref, prior_ref, out_ref,
                   err_ref, cur_ref, eob_ref, err_acc_ref, w0_ref,
                   w1_ref, k_ref, kstop_ref, place_ref, tail_ref,
                   mode_ref, done_ref):
            kern(lane_m_ref, bits_ref, prior_ref, None, out_ref,
                 err_ref, cur_ref, end_ref, eob_ref, err_acc_ref,
                 w0_ref, w1_ref, k_ref, kstop_ref, place_ref, tail_ref,
                 mode_ref, done_ref)

    in_specs = [
        pl.BlockSpec((1, SUBLANES, K), lambda g, m: (g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, W, SUBLANES, K), lambda g, m: (g, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, SUBLANES, K), lambda g, m: (g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 64, SUBLANES, K),
                     lambda g, m: (g, m, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = (lane_m, bits, seg_bits, prior)
    if dyn:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands = operands + (tbl,)

    out, err = pl.pallas_call(
        kernel,
        grid=(n_groups, n_mcus),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, 1, 64, SUBLANES, K),
                         lambda g, m: (g, m, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUBLANES, K), lambda g, m: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(
                (n_groups, n_mcus, 64, SUBLANES, K), jnp.int32
            ),
            jax.ShapeDtypeStruct((n_groups, SUBLANES, K), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((SUBLANES, K), jnp.int32),  # cursor
            pltpu.VMEM((SUBLANES, K), jnp.int32),  # EOB run
            pltpu.VMEM((SUBLANES, K), jnp.int32),  # error flags
            pltpu.VMEM((SUBLANES, K), jnp.int32),  # window word 0
            pltpu.VMEM((SUBLANES, K), jnp.int32),  # window word 1
            pltpu.VMEM((SUBLANES, K), jnp.int32),  # k (range start)
            pltpu.VMEM((SUBLANES, K), jnp.int32),  # kstop (range end)
            pltpu.VMEM((SUBLANES, K), jnp.int32),  # pending insert value
            pltpu.VMEM((SUBLANES, K), jnp.int32),  # tail flag
            pltpu.VMEM((SUBLANES, K), jnp.int32),  # mode
            pltpu.VMEM((SUBLANES, K), jnp.int32),  # bits done in range
        ],
        interpret=interpret,
    )(*operands)
    return out, err


run_ac_refine_jit = jax.jit(
    _run_ac_refine,
    static_argnames=("static", "n_groups", "n_mcus", "interpret"),
)


# ---------------------------------------------------------------------------
# Lane-layout <-> grid-layout conversions
# ---------------------------------------------------------------------------


def _flat_lanes(out, G: int, M: int, B: int):
    """[G, M, B, 8, K] kernel output -> [G*group, M, B] lane-major.
    (M, B) merge before the transpose keeps the minor dim a 128-multiple
    — separate tiny minor dims get tile-padded up to 64x when XLA
    materializes the copy (see wavefront_pallas.assemble_pixels)."""
    K = out.shape[-1]
    return (
        out.reshape(G, M * B, SUBLANES, K)
        .transpose(0, 2, 3, 1)
        .reshape(G * SUBLANES * K, M, B)
    )


def _grids_to_lanes_s(img_view, G: int, n_lanes: int, M: int, grids,
                      lane_group: int):
    """Per-image [height_blocks, width_blocks, 64] grids -> one
    [G, M, 64, 8, K] kernel input (the AC-refine prior). Images' lanes
    are contiguous, so this is a concat, not a scatter."""
    K = lane_group // SUBLANES
    chunks = []
    for (lane0, n_seg, rows, total), grid in zip(img_view, grids):
        flat = grid.reshape(-1, 64)
        pad = n_seg * rows - total
        if pad:
            flat = jnp.pad(flat, ((0, pad), (0, 0)))
        flat = flat.reshape(n_seg, rows, 64)
        if rows < M:
            flat = jnp.pad(flat, ((0, 0), (0, M - rows), (0, 0)))
        chunks.append(flat)
    lane_pad = G * lane_group - n_lanes
    if lane_pad:
        chunks.append(jnp.zeros((lane_pad, M, 64), chunks[0].dtype))
    flat = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, axis=0)
    return (
        flat.reshape(G, SUBLANES, K, M * 64)
        .transpose(0, 3, 1, 2)
        .reshape(G, M, 64, SUBLANES, K)
    )


# ---------------------------------------------------------------------------
# Scan dispatch over the HBM-resident coefficient state
# ---------------------------------------------------------------------------


def _check_err(err, plan: ScanPlan):
    errs = np.asarray(err).reshape(-1)[: plan.n_lanes]
    failures = failures_from_err(errs, plan.lane_meta)
    if failures:
        raise failures[min(failures)]


def stage_plan(plan: ScanPlan) -> None:
    """Move the plan's kernel inputs to the device ahead of time
    (benchmarks exclude the relay upload this way; jnp.asarray on an
    already-device array is a no-op at apply time)."""
    plan.bits = jnp.asarray(plan.bits)
    plan.lane_m = jnp.asarray(plan.lane_m)
    plan.seg_bits = jnp.asarray(plan.seg_bits)


def _dc_refine_masks(jpeg, scan) -> List[Tuple[int, np.ndarray]]:
    """DC refinement has one STATIC bit per block, so no kernel: unpack
    the correction bits on the host into per-component OR-masks
    ([padded_blocks] int32, bit already shifted to position Al). The
    device work is a plain `state |= mask` — which is why the whole
    multi-scan sequence can compile as ONE jitted chain (the masks are
    data inputs, not control flow)."""
    frame = jpeg.frame
    total, ri, n_seg = _seg_geometry(jpeg, scan)
    al = scan.al
    pieces = bitstream.split_restart_segments(scan)
    bits_all = []
    mcu = 0
    bpm = (
        sum(
            frame.components[ci].h * frame.components[ci].v
            for ci in scan.comp_indices
        )
        if scan.interleaved
        else 1
    )
    for seg in pieces[:n_seg]:
        n_m = min(ri, total - mcu)
        need = n_m * bpm
        got = np.unpackbits(np.frombuffer(seg, np.uint8), count=None)
        if len(got) < need:
            raise JpegTruncatedError("DC refinement scan truncated")
        bits_all.append(got[:need])
        mcu += n_m
    bits_np = np.concatenate(bits_all) if bits_all else np.zeros(0, np.uint8)
    p1 = 1 << al
    masks: List[Tuple[int, np.ndarray]] = []
    if scan.interleaved:
        # bits laid out MCU-major, block-within-MCU minor.
        per_mcu = bits_np.reshape(total, bpm)
        b0 = 0
        for sp, ci in enumerate(scan.comp_indices):
            c = frame.components[ci]
            nb = c.h * c.v
            sub = per_mcu[:, b0 : b0 + nb]
            b0 += nb
            sub = sub.reshape(frame.mcus_y, frame.mcus_x, c.v, c.h)
            sub = sub.transpose(0, 2, 1, 3).reshape(
                c.padded_hb * c.padded_wb
            )
            masks.append((ci, sub.astype(np.int32) * p1))
    else:
        ci = scan.comp_indices[0]
        c = frame.components[ci]
        grid = np.zeros((c.padded_hb, c.padded_wb), np.int32)
        sub = bits_np.reshape(c.height_blocks, c.width_blocks)
        grid[: c.height_blocks, : c.width_blocks] = sub.astype(np.int32)
        masks.append((ci, grid.reshape(-1) * p1))
    return masks


# Light static descriptions of a group's scan script: everything the
# traced chain needs, with NO references to JpegData/Scan objects (a
# cached jit closure must not pin scan bitstreams in memory — the
# round-1 advisor flagged exactly that leak shape on the baseline
# chain cache).


@dataclasses.dataclass(frozen=True)
class _ScanStatic:
    kind: str  # 'dc_first' | 'dc_refine' | 'ac_first' | 'ac_refine'
    comp_indices: Tuple[int, ...]
    interleaved: bool
    ss: int
    se: int
    al: int
    blk_sp: Tuple[int, ...]  # dc_first only
    tbls: Tuple              # CanonTables (dc for DC-first, ac for AC)
    # Plan geometry (kernel scans only):
    G: int = 0
    M: int = 0
    W: int = 0
    n_lanes: int = 0
    img_view: Tuple = ()
    lane_group: int = LANE_GROUP
    # Table-dynamic kernels: tbls is () and each kernel takes its
    # Huffman tables as a [n_tbl, 3, 64] runtime operand, so ONE
    # compiled chain serves every table set of this scan-script shape.
    dyn: bool = False


@dataclasses.dataclass(frozen=True)
class _GroupStatic:
    n_images: int
    mcus_x: int
    mcus_y: int
    # Per component: (h, v, padded_hb, padded_wb, height_blocks,
    # width_blocks)
    comps: Tuple[Tuple[int, int, int, int, int, int], ...]
    scans: Tuple[_ScanStatic, ...]
    frame_hw: Tuple[int, int] = (0, 0)  # true (height, width) for crop


def _comps_static(frame) -> Tuple:
    return tuple(
        (c.h, c.v, c.padded_hb, c.padded_wb, c.height_blocks,
         c.width_blocks)
        for c in frame.components
    )


def _scan_static(jpegs, k: int, plan: Optional[ScanPlan],
                 dyn: bool = False) -> _ScanStatic:
    scan = jpegs[0].scans[k]
    frame = jpegs[0].frame
    is_dc = scan.ss == 0
    refining = scan.ah != 0
    if is_dc and refining:
        return _ScanStatic(
            "dc_refine", tuple(scan.comp_indices), scan.interleaved,
            scan.ss, scan.se, scan.al, (), (),
        )
    blk_sp: Tuple[int, ...] = ()
    if is_dc:
        bl: List[int] = []
        if scan.interleaved:
            for sp, ci in enumerate(scan.comp_indices):
                c = frame.components[ci]
                bl += [sp] * (c.h * c.v)
        else:
            bl = [0]
        blk_sp = tuple(bl)
        tbls = () if dyn else _tables_for_scan(scan, dc=True)
        kind = "dc_first"
    else:
        tbls = () if dyn else _tables_for_scan(scan, dc=False)
        kind = "ac_first" if not refining else "ac_refine"
    return _ScanStatic(
        kind, tuple(scan.comp_indices), scan.interleaved,
        scan.ss, scan.se, scan.al, blk_sp, tbls,
        G=plan.n_groups, M=plan.n_mcus, W=plan.n_words,
        n_lanes=plan.n_lanes, img_view=tuple(plan.img_view),
        lane_group=plan.lane_group, dyn=dyn,
    )


def _img_lanes_s(img_view: Tuple, flat, ii: int, B: int):
    lane0, n_seg, rows, total = img_view[ii]
    return flat[lane0 : lane0 + n_seg, :rows].reshape(-1, B)[:total]


def _scatter_dc_s(flat, sk: _ScanStatic, gs: _GroupStatic, dcs: List):
    """Write one image's DC-first output ([total_mcus, B]) into its
    per-component DC vectors. DC lives in a separate [padded_blocks]
    column, NOT in the [padded_blocks, 64] AC state: a column write
    into the big state (`.at[:, 0].set`) touches every (8,128) tile of
    a ~67 MB array and measured ~50 ms/batch-4-4096² on chip
    (tools/prog_scan_split.py); the standalone vector is ~1/64 the
    traffic, and the transform stage merges it for free inside its
    coefficient-major transpose (pipeline._build_batch)."""
    if sk.interleaved:
        b0 = 0
        for sp, ci in enumerate(sk.comp_indices):
            h, v, phb, pwb, _hb, _wb = gs.comps[ci]
            nb = h * v
            sub = flat[:, b0 : b0 + nb]
            b0 += nb
            sub = sub.reshape(gs.mcus_y, gs.mcus_x, v, h)
            sub = sub.transpose(0, 2, 1, 3).reshape(-1)
            dcs[ci] = sub
    else:
        ci = sk.comp_indices[0]
        _h, _v, phb, pwb, hb, wb = gs.comps[ci]
        grid = flat[:, 0].reshape(hb, wb)
        grid = jnp.pad(grid, ((0, phb - hb), (0, pwb - wb)))
        dcs[ci] = grid.reshape(-1)


def _apply_static(
    gs: _GroupStatic, sk: _ScanStatic, states: List[List], dcs: List[List],
    arrs, masks, interpret: bool,
):
    """One scan of the group against the (traced or eager) coefficient
    states. states[i][ci] holds the AC coefficients ([padded_blocks,
    64] zigzag, column 0 always zero); dcs[i][ci] the DC column
    ([padded_blocks]) — kept separate so DC scans never pay a column
    write into the big state (see _scatter_dc_s). arrs = (bits, lane_m,
    seg_bits) for kernel scans, None for DC refinement; masks =
    per-image tuples of OR-masks for DC refinement, () otherwise.
    Returns the kernel's error vector, or None for DC refinement. Pure
    function of its inputs given the statics — the whole scan sequence
    jits as one chain."""
    if sk.kind == "dc_refine":
        for ii in range(gs.n_images):
            for j, mask in enumerate(masks[ii]):
                ci = sk.comp_indices[j] if sk.interleaved else sk.comp_indices[0]
                dcs[ii][ci] = dcs[ii][ci] | mask
        return None

    bits, lane_m, seg_bits = arrs[:3]
    tbl = arrs[3] if sk.dyn else None
    if sk.kind == "dc_first":
        if sk.dyn:
            static = (sk.blk_sp, sk.W, sk.al, sk.lane_group)
        else:
            static = (sk.blk_sp, sk.tbls, sk.W, sk.al, sk.lane_group)
        out, err = run_dc_first_jit(
            bits, lane_m, seg_bits, static, sk.G, sk.M, interpret,
            tbl=tbl,
        )
        B = len(sk.blk_sp)
        flat = _flat_lanes(out, sk.G, sk.M, B)
        for ii in range(gs.n_images):
            _scatter_dc_s(
                _img_lanes_s(sk.img_view, flat, ii, B), sk, gs, dcs[ii]
            )
        return err

    # AC scans: single component (parser-enforced).
    ci = sk.comp_indices[0]
    _h, _v, phb, pwb, hb, wb = gs.comps[ci]
    if sk.dyn:
        static = (sk.W, sk.ss, sk.se, sk.al, sk.lane_group)
    else:
        static = (sk.tbls, sk.W, sk.ss, sk.se, sk.al, sk.lane_group)

    if sk.kind == "ac_first":
        out, err = run_ac_first_jit(
            bits, lane_m, seg_bits, static, sk.G, sk.M, interpret,
            tbl=tbl,
        )
        flat = _flat_lanes(out, sk.G, sk.M, 64)
        for ii in range(gs.n_images):
            grid = _img_lanes_s(sk.img_view, flat, ii, 64).reshape(
                hb, wb, 64
            )
            full = states[ii][ci].reshape(phb, pwb, 64)
            full = full.at[:hb, :wb].add(grid)
            states[ii][ci] = full.reshape(-1, 64)
        return err

    # AC refine: prior band values ride into the kernel per block.
    fulls = []
    priors = []
    for ii in range(gs.n_images):
        full = states[ii][ci].reshape(phb, pwb, 64)
        fulls.append(full)
        priors.append(full[:hb, :wb])
    prior = _grids_to_lanes_s(
        sk.img_view, sk.G, sk.n_lanes, sk.M, priors, sk.lane_group
    )
    out, err = run_ac_refine_jit(
        bits, lane_m, seg_bits, prior, static, sk.G, sk.M, interpret,
        tbl=tbl,
    )
    flat = _flat_lanes(out, sk.G, sk.M, 64)
    for ii in range(gs.n_images):
        grid = _img_lanes_s(sk.img_view, flat, ii, 64).reshape(hb, wb, 64)
        full = fulls[ii].at[:hb, :wb].set(grid)
        states[ii][ci] = full.reshape(-1, 64)
    return err


def apply_scan_batch(
    jpegs: Sequence, k: int, states: List[List], dcs: List[List],
    interpret: bool,
    plan: Optional[ScanPlan] = None,
    errs_out: Optional[list] = None,
) -> None:
    """Apply scan index k of every image in the group to its
    device-resident coefficient grids (states[i][ci]:
    int32[padded_hb*padded_wb, 64] AC-only jnp arrays; dcs[i][ci]:
    int32[padded_hb*padded_wb] DC columns), mutating in place —
    the EAGER driver over _apply_static (decode_all_scans_batch runs
    the same logic as one jitted chain instead). With errs_out, error
    vectors are appended for a single deferred readback."""
    scan0 = jpegs[0].scans[k]
    if scan0.ss == 0 and scan0.ah != 0:
        sk = _scan_static(jpegs, k, None)
        masks = tuple(
            tuple(m for _ci, m in _dc_refine_masks(j, j.scans[k]))
            for j in jpegs
        )
        arrs = None
    else:
        if plan is None:
            plan = ScanPlan(jpegs, k)
        sk = _scan_static(jpegs, k, plan)
        masks = ()
        arrs = (
            jnp.asarray(plan.bits), jnp.asarray(plan.lane_m),
            jnp.asarray(plan.seg_bits),
        )
    gs = _GroupStatic(
        n_images=len(jpegs),
        mcus_x=jpegs[0].frame.mcus_x,
        mcus_y=jpegs[0].frame.mcus_y,
        comps=_comps_static(jpegs[0].frame),
        scans=(sk,),
    )
    err = _apply_static(gs, sk, states, dcs, arrs, masks, interpret)
    if err is not None:
        if errs_out is None:
            _check_err(err, plan)
        else:
            errs_out.append((err, plan))


def scan_group_key(jpeg: bitstream.JpegData, tables: bool = True) -> Tuple:
    """Images whose keys match can share every scan's kernel launch:
    same frame geometry and an identical scan script — kind, band,
    successive-approximation position, component, and the bytes of each
    Huffman table a kernel will close over. Restart intervals and
    segment lengths may differ (lanes carry their own MCU counts).
    With tables=False the table bytes are EXCLUDED — the compatibility
    key of the table-DYNAMIC chain, which takes tables as runtime
    operands (per-image optimized-table files of one scan-script shape
    then share a single compiled program)."""
    frame = jpeg.frame
    parts: list = [
        frame.height, frame.width,
        tuple((c.h, c.v) for c in frame.components),
    ]
    for scan in jpeg.scans:
        is_dc = scan.ss == 0
        refining = scan.ah != 0
        if is_dc and refining:
            tabs: Tuple = ()  # no entropy tables in a DC refinement scan
        elif is_dc:
            tabs = tuple(
                _spec_bytes(scan.huff.get((0, scan.dc_ids[sp])))
                for sp in range(scan.n_comps)
            )
        else:
            tabs = (_spec_bytes(scan.huff.get((1, scan.ac_ids[0]))),)
        parts.append(
            (
                scan.interleaved, tuple(scan.comp_indices),
                scan.ss, scan.se, scan.ah, scan.al,
                tabs if tables else (),
            )
        )
    return tuple(parts)


def _spec_bytes(spec) -> Optional[bytes]:
    if spec is None:
        return None
    return spec.counts.tobytes() + spec.values.tobytes()


# One jitted chain per group structure: the ENTIRE multi-scan decode
# (every scan kernel + every lane<->grid conversion + every state
# update) compiles as a single XLA program, so a 10-scan image costs
# one dispatch instead of dozens of eager op dispatches — on this
# rig's relay backend the eager per-op round-trips were roughly half
# of single-image progressive wall time. Keyed by _GroupStatic, which
# holds plain tuples only (no bitstream references pinned).
_PROG_CHAIN_CACHE: "collections.OrderedDict[Tuple, object]" = (
    collections.OrderedDict()
)
_PROG_CHAIN_MAX = 32


def _prog_chain(gs: _GroupStatic, interpret: bool):
    key = (gs, interpret)
    fn = _PROG_CHAIN_CACHE.get(key)
    if fn is not None:
        _PROG_CHAIN_CACHE.move_to_end(key)
        return fn

    def run(arrs, masks):
        return _run_scans(gs, arrs, masks, interpret)

    fn = jax.jit(run)
    _PROG_CHAIN_CACHE[key] = fn
    while len(_PROG_CHAIN_CACHE) > _PROG_CHAIN_MAX:
        _PROG_CHAIN_CACHE.popitem(last=False)
    return fn


def _run_scans(gs: _GroupStatic, arrs, masks, interpret: bool):
    """Traced body shared by the entropy-only and to-RGB chains: zero
    states through every scan of the script."""
    states = [
        [
            jnp.zeros((phb * pwb, 64), jnp.int32)
            for (_h, _v, phb, pwb, _hb, _wb) in gs.comps
        ]
        for _ in range(gs.n_images)
    ]
    dcs = [
        [
            jnp.zeros((phb * pwb,), jnp.int32)
            for (_h, _v, phb, pwb, _hb, _wb) in gs.comps
        ]
        for _ in range(gs.n_images)
    ]
    errs = []
    for k, sk in enumerate(gs.scans):
        err = _apply_static(gs, sk, states, dcs, arrs[k], masks[k],
                            interpret)
        if err is not None:
            errs.append(err)
    return states, dcs, tuple(errs)


def _prog_rgb_chain(gs: _GroupStatic, tkey: Tuple, interpret: bool):
    """Like _prog_chain but the ONE jitted program continues through the
    transform stage: scan kernels + DC merges + dequant/IDCT +
    upsample/color. A progressive group decodes to RGB in a single
    dispatch — on this rig's relay backend the separate transform
    dispatch alone cost ~28 ms per batch, and one program lets XLA
    schedule the transform against the tail of the scan chain. tkey =
    (idct, fancy, color, packed, per_image_q)."""
    key = (gs, tkey, interpret, "rgb")
    fn = _PROG_CHAIN_CACHE.get(key)
    if fn is not None:
        _PROG_CHAIN_CACHE.move_to_end(key)
        return fn
    idct, fancy, color, packed, per_image_q = tkey

    def run(arrs, masks, qtabs):
        from . import pipeline as kp

        states, dcs, errs = _run_scans(gs, arrs, masks, interpret)
        n = gs.n_images
        ncomp = len(gs.comps)
        coeff_stack = [
            jnp.stack([states[i][ci] for i in range(n)])
            for ci in range(ncomp)
        ]
        dc_stack = [
            jnp.stack([dcs[i][ci] for i in range(n)])
            for ci in range(ncomp)
        ]
        frame_key = (
            gs.frame_hw[0], gs.frame_hw[1],
            tuple((h, v) for (h, v, *_rest) in gs.comps),
        )
        tfn = kp._build_batch(
            frame_key, idct, fancy, interpret, color,
            has_dc=True, packed=packed, per_image_q=per_image_q,
        )
        rgb = tfn(coeff_stack, qtabs, dc_stack)
        return rgb, errs

    fn = jax.jit(run)
    _PROG_CHAIN_CACHE[key] = fn
    while len(_PROG_CHAIN_CACHE) > _PROG_CHAIN_MAX:
        _PROG_CHAIN_CACHE.popitem(last=False)
    return fn


def _chain_statics(
    jpegs: Sequence[bitstream.JpegData],
    plans: Optional[List[Optional[ScanPlan]]] = None,
    dyn: bool = False,
):
    """Shared host prep for the jitted whole-sequence chains: per-scan
    plans -> (gs, arrs, masks, kernel_plans). With dyn=True the scan
    statics carry NO Huffman tables (they ride in arrs as [n_tbl,3,64]
    operands) and plan widths snap to a coarse ladder, so one compiled
    chain serves every per-image optimized-table file of this scan
    script shape."""
    n_scans = len(jpegs[0].scans)
    if plans is None:
        plans = [
            None
            if jpegs[0].scans[k].ss == 0 and jpegs[0].scans[k].ah != 0
            else ScanPlan(jpegs, k, w_snap=dyn)
            for k in range(n_scans)
        ]
    sks = tuple(
        _scan_static(jpegs, k, plans[k], dyn=dyn) for k in range(n_scans)
    )
    gs = _GroupStatic(
        n_images=len(jpegs),
        mcus_x=jpegs[0].frame.mcus_x,
        mcus_y=jpegs[0].frame.mcus_y,
        comps=_comps_static(jpegs[0].frame),
        scans=sks,
        frame_hw=(jpegs[0].frame.height, jpegs[0].frame.width),
    )

    def _tbl_operand(k):
        scan = jpegs[0].scans[k]
        dc = scan.ss == 0
        return jnp.asarray(np.stack([
            dyn_table_pack(t) for t in _tables_for_scan(scan, dc=dc)
        ]))

    arrs = tuple(
        None if p is None
        else (
            jnp.asarray(p.bits), jnp.asarray(p.lane_m),
            jnp.asarray(p.seg_bits),
        ) + ((_tbl_operand(k),) if dyn else ())
        for k, p in enumerate(plans)
    )
    masks = tuple(
        tuple(
            tuple(m for _ci, m in _dc_refine_masks(j, j.scans[k]))
            for j in jpegs
        )
        if sks[k].kind == "dc_refine"
        else ()
        for k in range(n_scans)
    )
    kernel_plans = [p for p in plans if p is not None]
    return gs, arrs, masks, kernel_plans


def build_chain_inputs(
    jpegs: Sequence[bitstream.JpegData],
    plans: Optional[List[Optional[ScanPlan]]] = None,
):
    """Host prep for the jitted whole-sequence chain: per-scan plans,
    the chain function, and its inputs. Returns (fn, arrs, masks,
    kernel_plans); call `fn(arrs, masks)` -> (states, dcs, errs), where
    errs aligns with kernel_plans for failure mapping. Benchmarks stage
    `arrs` in HBM before the clock."""
    interpret = jax.default_backend() != "tpu"
    gs, arrs, masks, kernel_plans = _chain_statics(jpegs, plans)
    return _prog_chain(gs, interpret), arrs, masks, kernel_plans


def decode_all_scans_batch(
    jpegs: Sequence[bitstream.JpegData],
    config: DecodeConfig = DEFAULT_CONFIG,
) -> Tuple[List[Optional[List[jnp.ndarray]]], Dict[int, Exception]]:
    """Device-resident progressive entropy decode of a GROUP of images
    with matching `scan_group_key`s: scan k of every image decodes in
    one wavefront launch (SURVEY.md §2.1 #10, §3.3 — cross-image
    batching of the multi-scan controller), and the WHOLE scan sequence
    runs as one jitted chain. Returns (states, dcs, failures):
    states[i] is the per-component [padded_blocks, 64] zigzag AC grid
    list for image i (column 0 zero) and dcs[i] the matching
    [padded_blocks] DC columns — merged by the transform stage
    (pipeline.transform_batch(dcs=...)) or on host — or None when
    failures[i] holds its exception. Error vectors are read back once
    at the end — a bad image poisons only its own lanes."""
    for jpeg in jpegs:
        if not jpeg.frame.progressive:
            raise JpegUnsupportedError("not a progressive frame")
    fn, arrs, masks, kernel_plans = build_chain_inputs(jpegs)
    states, dcs, errs = fn(arrs, masks)
    failures: Dict[int, Exception] = {}
    for err, plan in zip(errs, kernel_plans):
        e = np.asarray(err).reshape(-1)[: plan.n_lanes]
        for img, exc in failures_from_err(e, plan.lane_meta).items():
            failures.setdefault(img, exc)
    for img in failures:
        states[img] = None
        dcs[img] = None
    return states, dcs, failures


def decode_all_scans_to_rgb_batch(
    jpegs: Sequence[bitstream.JpegData],
    config: DecodeConfig = DEFAULT_CONFIG,
    packed: bool = False,
    defer_errors: bool = False,
    dyn: bool = False,
) -> Tuple[jnp.ndarray, str, object]:
    """Full progressive decode of a matching group as ONE jitted
    program: every scan kernel, the DC merges, dequant+IDCT and
    upsample/color in a single dispatch (the entropy-chain +
    separate-transform split cost an extra device round-trip per
    group, and XLA can overlap the transform with the scan tail).
    Returns (rgb, layout, failures): rgb[i] is image i's decode
    (garbage when failures has i), layout 'nhwc' or 'packed16' (the
    latter only when `packed` and the frame qualifies —
    pipeline.packed_layout_applies). Mixed per-image quantizers are
    fine (per-image dequant in XLA); Huffman tables must match across
    the group (scan_group_key). With defer_errors the third element is
    instead the opaque (errs, kernel_plans) pair for
    resolve_scan_errors — no readback happens, so a caller can
    dispatch many groups back to back and the device overlaps them."""
    from . import pipeline as kp

    for jpeg in jpegs:
        if not jpeg.frame.progressive:
            raise JpegUnsupportedError("not a progressive frame")
    interpret = jax.default_backend() != "tpu"
    gs, arrs, masks, kernel_plans = _chain_statics(jpegs, dyn=dyn)
    frame = jpegs[0].frame
    color = bitstream.color_space(jpegs[0])
    want_packed = packed and kp.packed_layout_applies(
        frame, config, color
    )
    qkeys = {
        tuple(j.qtables[c.tq].tobytes() for c in frame.components)
        for j in jpegs
    }
    per_image_q = len(qkeys) > 1
    if per_image_q:
        qtabs = [
            jnp.asarray(
                np.stack([j.qtables[c.tq] for j in jpegs])
            )
            for c in frame.components
        ]
    else:
        qtabs = [
            jnp.asarray(jpegs[0].qtables[c.tq]) for c in frame.components
        ]
    tkey = (
        config.idct, config.fancy_upsampling, color, want_packed,
        per_image_q,
    )
    fn = _prog_rgb_chain(gs, tkey, interpret)
    rgb, errs = fn(arrs, masks, qtabs)
    layout = "packed16" if want_packed else "nhwc"
    if defer_errors:
        # Async contract: nothing is read back here, so a caller can
        # DISPATCH several groups' chains before resolving any — on a
        # high-dispatch-latency runtime the groups then overlap on
        # device instead of serializing on per-group error syncs (the
        # common progressive batch is all singleton groups: libjpeg
        # optimizes Huffman tables per image).
        return rgb, layout, (errs, kernel_plans)
    return rgb, layout, resolve_scan_errors(errs, kernel_plans)


def resolve_scan_errors(errs, kernel_plans) -> Dict[int, Exception]:
    """Force the deferred error vectors (the first readback of the
    group's chain) and map them to per-image failures."""
    failures: Dict[int, Exception] = {}
    for err, plan in zip(errs, kernel_plans):
        e = np.asarray(err).reshape(-1)[: plan.n_lanes]
        for img, exc in failures_from_err(e, plan.lane_meta).items():
            failures.setdefault(img, exc)
    return failures


def decode_all_scans(
    jpeg: bitstream.JpegData, config: DecodeConfig = DEFAULT_CONFIG
) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
    """Device-resident progressive entropy decode: every scan kind runs
    on device (DC refinement is a host bit-unpack + device OR — the bit
    positions are static). Returns (acs, dcs): per-component
    [padded_blocks, 64] zigzag AC grids (column 0 zero) and
    [padded_blocks] DC columns (device arrays)."""
    states, dcs, failures = decode_all_scans_batch([jpeg], config)
    if failures:
        raise failures[0]
    return states[0], dcs[0]
