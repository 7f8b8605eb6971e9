"""Wavefront Huffman entropy decoder on device (SURVEY.md §3.4, §7.2
hard-part 1; BASELINE.json:5 "wavefront Huffman entropy decoder").

One decode *lane* per restart segment: T.81 §E.2.4 resets DC predictors
and byte-aligns at every RSTn, so segments share no state and thousands
of lanes can advance in lockstep. Each wavefront step decodes one
Huffman symbol (code + magnitude bits) per lane from a shared packed
LUT, updates per-lane cursors/predictors, and scatters at most one
coefficient per lane into the flat coefficient tensor.

This is the XLA formulation (jnp ops under jax.jit + lax.while_loop):
it runs identically on CPU (the conformance/test path, config 1) and
TPU. All data-dependent control flow is expressed as masked vector
arithmetic — the TPU-native shape of a bit-serial algorithm.

Layout notes:
  * the destuffed bitstream ships to the device as big-endian uint32
    words; a lane reads a 32-bit window at any bit offset from two
    adjacent words (code<=16 + magnitude<=15 bits never crosses it);
  * Huffman tables ship as one packed [8, 65536] uint16 LUT
    (len<<8 | symbol), indexed by table id and the next 16 stream bits
    (SURVEY.md §2.1 #4: flat LUTs shared with the device decoder);
  * per-(MCU, block) output positions are precomputed host-side into an
    int32 table — the "segment index table" of SURVEY.md §3.4 extended
    to block granularity, so the device never does geometry arithmetic.

Scope: baseline (sequential) scans. Progressive scans fall back to the
native host decoder (SURVEY.md §7.2 hard-part 5: refinement stays
host-side until profiling says otherwise).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import bitstream, huffman
from ..config import DEFAULT_CONFIG, DecodeConfig
from ..errors import (
    JpegHuffmanError,
    JpegSyntaxError,
    JpegTruncatedError,
    JpegUnsupportedError,
)

LANE_PAD = 128  # pad lane count so state tensors are lane-aligned

_ERR_NONE = 0
_ERR_BADCODE = 1
_ERR_RUN = 2


# ---------------------------------------------------------------------------
# Host-side plan construction
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class ScanPlan:
    """Static device inputs for one scan's wavefront launch."""

    words: np.ndarray          # uint32[nwords] big-endian bitstream
    lut: np.ndarray            # uint16[8, 65536] packed (len<<8|sym)
    out_block: np.ndarray      # int32[total_mcus * B] flat block ids
    seg_bit_start: np.ndarray  # int32[L]
    seg_bit_len: np.ndarray    # int32[L]
    first_mcu: np.ndarray      # int32[L]
    lane_mcus: np.ndarray      # int32[L]
    sp_of_blk: np.ndarray      # int32[B] scan-component of block position
    dc_tid: np.ndarray         # int32[B] LUT row for DC table
    ac_tid: np.ndarray         # int32[B] LUT row for AC table
    n_lanes: int
    blocks_per_mcu: int
    max_steps: int


def _pack_luts(huff: Dict[Tuple[int, int], bitstream.HuffSpec]) -> np.ndarray:
    lut = np.zeros((8, 65536), dtype=np.uint16)
    for (tc, th), spec in huff.items():
        if tc > 1 or th > 3:
            continue
        t = huffman.HuffTable.from_spec(spec)
        lut[tc * 4 + th] = (
            t.lut_len.astype(np.uint16) << 8
        ) | t.lut_sym.astype(np.uint16)
    return lut


def build_scan_plan(
    jpeg: bitstream.JpegData, scan: bitstream.Scan
) -> ScanPlan:
    frame = jpeg.frame
    if frame.progressive:
        raise JpegUnsupportedError(
            "wavefront engine decodes baseline scans only"
        )

    # Destuffed bitstream + segment table: native scanner when available,
    # Python fallback otherwise (same output, tests assert so).
    try:
        from ..native import entropy as native_entropy

        buf, starts = native_entropy.destuff_segments(scan)
        buf = np.asarray(buf)
        seg_starts = np.asarray(starts)
    except Exception:
        pieces = bitstream.split_restart_segments(scan)
        buf = np.frombuffer(b"".join(pieces), dtype=np.uint8)
        seg_starts = np.zeros(len(pieces) + 1, dtype=np.int64)
        np.cumsum([len(p) for p in pieces], out=seg_starts[1:])

    # Geometry / MCU accounting.
    interleaved = scan.n_comps > 1
    if interleaved:
        total_mcus = frame.mcus_x * frame.mcus_y
    else:
        c0 = frame.components[scan.comp_indices[0]]
        total_mcus = c0.width_blocks * c0.height_blocks
    ri = scan.restart_interval or total_mcus

    n_seg_needed = -(-total_mcus // ri)
    n_seg_have = len(seg_starts) - 1
    if n_seg_have < n_seg_needed:
        raise JpegTruncatedError(
            f"scan has {n_seg_have} segments, needs {n_seg_needed}"
        )

    # Lane tables.
    L = n_seg_needed
    first_mcu = (np.arange(L, dtype=np.int64) * ri).astype(np.int32)
    lane_mcus = np.minimum(ri, total_mcus - first_mcu).astype(np.int32)
    seg_bit_start = (seg_starts[:L] * 8).astype(np.int32)
    seg_bit_len = ((seg_starts[1 : L + 1] - seg_starts[:L]) * 8).astype(
        np.int32
    )

    # Per-block-position metadata (T.81 §A.2.3 order).
    comp_block_offset = np.zeros(frame.n_components, dtype=np.int64)
    acc = 0
    for ci, c in enumerate(frame.components):
        comp_block_offset[ci] = acc
        acc += c.padded_hb * c.padded_wb

    sp_of_blk: List[int] = []
    dc_tid: List[int] = []
    ac_tid: List[int] = []
    blk_meta: List[Tuple[int, int, int]] = []  # (ci, dv, dh)
    if interleaved:
        for sp, ci in enumerate(scan.comp_indices):
            c = frame.components[ci]
            for v in range(c.v):
                for h in range(c.h):
                    sp_of_blk.append(sp)
                    dc_tid.append(0 * 4 + scan.dc_ids[sp])
                    ac_tid.append(1 * 4 + scan.ac_ids[sp])
                    blk_meta.append((ci, v, h))
    else:
        sp_of_blk.append(0)
        dc_tid.append(0 * 4 + scan.dc_ids[0])
        ac_tid.append(1 * 4 + scan.ac_ids[0])
        blk_meta.append((scan.comp_indices[0], 0, 0))
    B = len(blk_meta)

    # Validate referenced tables exist (syntax errors surface on host).
    for sp in range(scan.n_comps):
        if (0, scan.dc_ids[sp]) not in scan.huff:
            raise JpegSyntaxError(f"missing DC Huffman table {scan.dc_ids[sp]}")
        if (1, scan.ac_ids[sp]) not in scan.huff:
            raise JpegSyntaxError(f"missing AC Huffman table {scan.ac_ids[sp]}")

    # Flat output block id per (mcu, block position), vectorized.
    m = np.arange(total_mcus, dtype=np.int64)
    out_block = np.empty((total_mcus, B), dtype=np.int64)
    if interleaved:
        my, mx = m // frame.mcus_x, m % frame.mcus_x
        for b, (ci, dv, dh) in enumerate(blk_meta):
            c = frame.components[ci]
            out_block[:, b] = (
                comp_block_offset[ci]
                + (my * c.v + dv) * c.padded_wb
                + (mx * c.h + dh)
            )
    else:
        ci = scan.comp_indices[0]
        c = frame.components[ci]
        by, bx = m // c.width_blocks, m % c.width_blocks
        out_block[:, 0] = comp_block_offset[ci] + by * c.padded_wb + bx

    # Bitstream as big-endian words, padded with 0xFF + guard word.
    nbytes = len(buf)
    pad = (-nbytes) % 4 + 8
    padded = np.concatenate([buf, np.full(pad, 0xFF, dtype=np.uint8)])
    words = padded.view(">u4").astype(np.uint32)

    # Upper bound on wavefront steps for the busiest lane: every
    # coefficient of every block + one EOB per block.
    max_steps = int(lane_mcus.max()) * B * 65 if L else 0

    return ScanPlan(
        words=words,
        lut=_pack_luts(scan.huff),
        out_block=out_block.reshape(-1).astype(np.int32),
        seg_bit_start=seg_bit_start,
        seg_bit_len=seg_bit_len,
        first_mcu=first_mcu,
        lane_mcus=lane_mcus,
        sp_of_blk=np.asarray(sp_of_blk, dtype=np.int32),
        dc_tid=np.asarray(dc_tid, dtype=np.int32),
        ac_tid=np.asarray(ac_tid, dtype=np.int32),
        n_lanes=L,
        blocks_per_mcu=B,
        max_steps=max_steps,
    )


# ---------------------------------------------------------------------------
# Device wavefront loop
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("n_lanes", "blocks_per_mcu", "max_steps", "total_coeffs"),
)
def _wavefront_decode(
    words: jnp.ndarray,
    lut: jnp.ndarray,
    out_block: jnp.ndarray,
    seg_bit_start: jnp.ndarray,
    seg_bit_len: jnp.ndarray,
    first_mcu: jnp.ndarray,
    lane_mcus: jnp.ndarray,
    sp_of_blk: jnp.ndarray,
    dc_tid: jnp.ndarray,
    ac_tid: jnp.ndarray,
    n_lanes: int,
    blocks_per_mcu: int,
    max_steps: int,
    total_coeffs: int,
):
    """Run the lockstep wavefront. Returns (coeff_flat, err, consumed,
    mcu_done) — validation happens on host."""
    L = n_lanes
    B = blocks_per_mcu

    def window32(bitpos):
        """32-bit MSB-first window at absolute bit offset, per lane.
        Pure uint32 arithmetic (x64 is disabled in JAX by default): the
        sh==0 case is special-cased because a >>32 is not defined."""
        w = bitpos >> 5
        sh = (bitpos & 31).astype(jnp.uint32)
        hi = jnp.take(words, w, mode="clip")
        lo = jnp.take(words, w + 1, mode="clip")
        lo_part = jnp.where(
            sh == 0, jnp.uint32(0), lo >> (np.uint32(32) - sh)
        )
        return (hi << sh) | lo_part

    # State: [L] vectors.
    state = dict(
        bit=seg_bit_start.astype(jnp.int32),      # absolute bit cursor
        mcu=first_mcu.astype(jnp.int32),          # current global MCU
        mcu_done=jnp.zeros(L, jnp.int32),         # MCUs finished in lane
        blk=jnp.zeros(L, jnp.int32),              # block position in MCU
        k=jnp.zeros(L, jnp.int32),                # next coeff (0 => DC)
        pred=jnp.zeros((L, 4), jnp.int32),        # DC predictors
        err=jnp.zeros(L, jnp.int32),
        coeff=jnp.zeros(total_coeffs, jnp.int32),
        step=jnp.asarray(0, jnp.int32),
    )

    lut_flat = lut.reshape(-1).astype(jnp.int32)

    def active_mask(s):
        return (s["mcu_done"] < lane_mcus) & (s["err"] == _ERR_NONE)

    def cond(s):
        return jnp.any(active_mask(s)) & (s["step"] < max_steps)

    def body(s):
        act = active_mask(s)
        bit = s["bit"]
        blk = s["blk"]
        k = s["k"]
        is_dc = k == 0

        sp = jnp.take(sp_of_blk, blk, mode="clip")
        tid = jnp.where(
            is_dc,
            jnp.take(dc_tid, blk, mode="clip"),
            jnp.take(ac_tid, blk, mode="clip"),
        )

        win = window32(bit)
        idx16 = (win >> np.uint32(16)).astype(jnp.int32)
        entry = jnp.take(lut_flat, tid * 65536 + idx16, mode="clip")
        clen = entry >> 8
        sym = entry & 0xFF
        bad = act & (clen == 0)

        run = sym >> 4
        size = jnp.where(is_dc, sym, sym & 0x0F)

        # Magnitude bits follow the code inside the same 32-bit window
        # (code<=16 bits + magnitude<=15 bits): shift the code out, then
        # take the top `size` bits. size==0 guarded (>>32 undefined).
        after = win << clen.astype(jnp.uint32)
        mag = jnp.where(
            size > 0,
            (after >> (np.uint32(32) - size.astype(jnp.uint32))).astype(
                jnp.int32
            ),
            0,
        )
        # EXTEND (T.81 §F.2.2.1).
        val = jnp.where(
            (size > 0) & (mag < (1 << jnp.maximum(size - 1, 0))),
            mag - (1 << size) + 1,
            mag,
        )

        # --- DC path ---
        new_pred_val = s["pred"][jnp.arange(L), sp] + val
        dc_emit = act & is_dc
        pred = s["pred"].at[jnp.arange(L), sp].set(
            jnp.where(dc_emit, new_pred_val, s["pred"][jnp.arange(L), sp])
        )

        # --- AC path ---
        is_eob = (~is_dc) & (size == 0) & (run != 15)
        is_zrl = (~is_dc) & (size == 0) & (run == 15)
        ac_k = k + jnp.where(is_dc, 0, run)
        ac_overrun = act & (~is_dc) & (size > 0) & (ac_k > 63)
        ac_emit = act & (~is_dc) & (size > 0) & (ac_k <= 63)

        # Coefficient scatter (at most one per lane per step).
        blk_out = jnp.take(
            out_block, s["mcu"] * B + blk, mode="clip"
        )
        emit = dc_emit | ac_emit
        emit_k = jnp.where(is_dc, 0, ac_k)
        emit_val = jnp.where(is_dc, new_pred_val, val)
        # Non-emitting lanes point PAST the array: mode='drop' discards
        # out-of-bounds scatters, but a negative index would WRAP to the
        # end of the tensor and corrupt the last coefficient.
        pos = jnp.where(emit, blk_out * 64 + emit_k, total_coeffs)
        coeff = s["coeff"].at[pos].set(emit_val, mode="drop")

        # Cursor advance.
        consumed = jnp.where(act, clen + size, 0)
        bit = bit + consumed

        # Next-k state machine.
        k_next = jnp.where(
            is_dc,
            1,
            jnp.where(
                is_eob,
                64,
                jnp.where(is_zrl, k + 16, ac_k + 1),
            ),
        )
        block_done = act & (k_next >= 64)
        blk_next = jnp.where(block_done, blk + 1, blk)
        mcu_wrap = blk_next >= B
        blk_next = jnp.where(mcu_wrap, 0, blk_next)
        mcu_next = jnp.where(block_done & mcu_wrap, s["mcu"] + 1, s["mcu"])
        mcu_done = s["mcu_done"] + jnp.where(block_done & mcu_wrap, 1, 0)
        k_next = jnp.where(block_done, 0, k_next)

        err = s["err"]
        err = jnp.where(bad, _ERR_BADCODE, err)
        err = jnp.where(ac_overrun, _ERR_RUN, err)

        return dict(
            bit=jnp.where(act, bit, s["bit"]),
            mcu=jnp.where(act, mcu_next, s["mcu"]),
            mcu_done=jnp.where(act, mcu_done, s["mcu_done"]),
            blk=jnp.where(act, blk_next, s["blk"]),
            k=jnp.where(act, k_next, s["k"]),
            pred=pred,
            err=err,
            coeff=coeff,
            step=s["step"] + 1,
        )

    final = jax.lax.while_loop(cond, body, state)
    consumed = final["bit"] - seg_bit_start
    return final["coeff"], final["err"], consumed, final["mcu_done"]


# ---------------------------------------------------------------------------
# Public entry: all scans of one image
# ---------------------------------------------------------------------------


def decode_all_scans(
    jpeg: bitstream.JpegData, config: DecodeConfig = DEFAULT_CONFIG
) -> List[np.ndarray]:
    frame = jpeg.frame
    if frame.progressive:
        raise JpegUnsupportedError(
            "wavefront engine decodes baseline scans only (progressive "
            "uses the native host decoder, SURVEY.md §7.2 #5)"
        )

    comp_blocks = [c.padded_hb * c.padded_wb for c in frame.components]
    total_coeffs = sum(comp_blocks) * 64
    flat = np.zeros(total_coeffs, dtype=np.int32)

    for scan in jpeg.scans:
        plan = build_scan_plan(jpeg, scan)
        coeff, err, consumed, mcu_done = _wavefront_decode(
            jnp.asarray(plan.words),
            jnp.asarray(plan.lut),
            jnp.asarray(plan.out_block),
            jnp.asarray(plan.seg_bit_start),
            jnp.asarray(plan.seg_bit_len),
            jnp.asarray(plan.first_mcu),
            jnp.asarray(plan.lane_mcus),
            jnp.asarray(plan.sp_of_blk),
            jnp.asarray(plan.dc_tid),
            jnp.asarray(plan.ac_tid),
            n_lanes=plan.n_lanes,
            blocks_per_mcu=plan.blocks_per_mcu,
            max_steps=plan.max_steps,
            total_coeffs=total_coeffs,
        )
        err = np.asarray(err)
        consumed = np.asarray(consumed)
        mcu_done = np.asarray(mcu_done)
        if (err == _ERR_BADCODE).any():
            raise JpegHuffmanError(
                f"invalid Huffman code in segment {int(np.argmax(err == _ERR_BADCODE))}"
            )
        if (err == _ERR_RUN).any():
            raise JpegHuffmanError(
                f"AC run past end of block in segment {int(np.argmax(err == _ERR_RUN))}"
            )
        if (mcu_done < plan.lane_mcus).any():
            raise JpegTruncatedError("wavefront decode did not converge")
        # Overrun: consumed more bits than the segment holds (a trailing
        # partial byte of padding is legal, T.81 §F.1.2.3).
        over = consumed > plan.seg_bit_len + 7
        if over.any():
            raise JpegTruncatedError(
                f"entropy segment {int(np.argmax(over))} truncated"
            )
        flat |= np.asarray(coeff)  # scans touch disjoint components

    out: List[np.ndarray] = []
    off = 0
    for nb in comp_blocks:
        out.append(flat[off * 64 : (off + nb) * 64].reshape(nb, 64).copy())
        off += nb
    return out
