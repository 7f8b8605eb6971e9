"""Synthetic JPEG corpus generator (SURVEY.md §4 integration row):
images are generated with PIL at varied quality / subsampling / restart /
progressive settings; PIL (libjpeg-turbo) is also the bit-exact oracle."""

from __future__ import annotations

import io
from typing import Optional

import numpy as np
from PIL import Image

# PIL subsampling codes.
SS_444 = 0
SS_422 = 1
SS_420 = 2


def make_image(
    w: int, h: int, seed: int = 0, mode: str = "RGB", kind: str = "photo"
) -> Image.Image:
    """Deterministic synthetic test image: smooth gradients + structured
    detail + noise, so every frequency band carries energy."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    r = 128 + 100 * np.sin(xx / 23.0) * np.cos(yy / 17.0)
    g = 128 + 100 * np.cos(xx / 11.0 + yy / 29.0)
    b = (xx + yy) % 256
    img = np.stack([r, g, b], axis=-1)
    if kind == "photo":
        img += rng.normal(0, 12, img.shape)
    elif kind == "flat":
        img = np.full((h, w, 3), 127.0)
    elif kind == "noise":
        img = rng.uniform(0, 255, img.shape)
    arr = np.clip(img, 0, 255).astype(np.uint8)
    im = Image.fromarray(arr, "RGB")
    if mode != "RGB":
        im = im.convert(mode)
    return im


def encode(
    im: Image.Image,
    quality: int = 85,
    subsampling: int = SS_420,
    progressive: bool = False,
    restart_blocks: int = 0,
    restart_rows: int = 0,
    optimize: bool = False,
) -> bytes:
    buf = io.BytesIO()
    kw = dict(format="JPEG", quality=quality, subsampling=subsampling)
    if progressive:
        kw["progressive"] = True
    if optimize:
        kw["optimize"] = True
    if restart_blocks:
        kw["restart_marker_blocks"] = restart_blocks
    if restart_rows:
        kw["restart_marker_rows"] = restart_rows
    im.save(buf, **kw)
    return buf.getvalue()


def make_jpeg(
    w: int,
    h: int,
    seed: int = 0,
    quality: int = 85,
    subsampling: int = SS_420,
    progressive: bool = False,
    restart_blocks: int = 0,
    restart_rows: int = 0,
    mode: str = "RGB",
    kind: str = "photo",
) -> bytes:
    return encode(
        make_image(w, h, seed=seed, mode=mode, kind=kind),
        quality=quality,
        subsampling=subsampling,
        progressive=progressive,
        restart_blocks=restart_blocks,
        restart_rows=restart_rows,
    )


def pil_decode(data: bytes) -> np.ndarray:
    """Oracle decode via PIL/libjpeg-turbo (islow DCT, fancy upsampling —
    the library defaults our fixed-point path reproduces bit-exactly)."""
    im = Image.open(io.BytesIO(data))
    im.load()
    return np.asarray(im)


# ---------------------------------------------------------------------------
# Baseline MULTI-SCAN generator (T.81 permits a baseline image split into
# per-component non-interleaved scans; libjpeg decodes them but PIL can't
# ENCODE them, so we re-encode a PIL baseline file scan-by-scan). The
# Huffman tables are self-built COMPLETE flat tables (every DC size at
# one code length, every AC (run,size) at another) — valid canonical
# tables that can encode any coefficient stream; compression quality is
# irrelevant for a conformance corpus.
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing (T.81 B.1.1.5)

    def align(self) -> None:
        if self.n:
            self.put(0x7F, 8 - self.n)  # 1-fill padding


def _flat_table(symbols, length):
    """Canonical table with every symbol at one code length: counts has
    a single nonzero entry, codes are 0..n-1 (the all-ones code stays
    unused since n < 2**length). Returns (counts16, values, enc_map)."""
    n = len(symbols)
    assert n < (1 << length)
    counts = [0] * 16
    counts[length - 1] = n
    enc = {s: (i, length) for i, s in enumerate(symbols)}
    return bytes(counts), bytes(symbols), enc


def _mag_bits(v: int):
    """(size, raw bits) of a coefficient/diff per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    size = abs(v).bit_length()
    return size, v if v > 0 else v + (1 << size) - 1


def make_multiscan_jpeg(
    w: int,
    h: int,
    seed: int = 0,
    quality: int = 85,
    subsampling: int = SS_420,
    restart_blocks: int = 0,
) -> bytes:
    """Baseline 3-component JPEG re-encoded as THREE non-interleaved
    scans (one per component). Copies the PIL file's headers (minus DHT/
    DRI), swaps in flat complete Huffman tables, and re-encodes the
    oracle-decoded coefficients per component in raster block order
    with fresh DC predictors per scan/restart (T.81 E.2.4)."""
    import sys as _sys
    import os as _os

    _sys.path.insert(
        0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "..")
    )
    from tpujpeg import bitstream, huffman

    base = make_jpeg(w, h, seed=seed, quality=quality,
                     subsampling=subsampling)
    jpeg = bitstream.parse(base)
    frame = jpeg.frame
    assert not frame.progressive and frame.n_components == 3
    coeffs = huffman.decode_all_scans(jpeg)
    scan0 = jpeg.scans[0]

    # Copy every pre-SOS segment except DHT (we write our own) and DRI.
    out = bytearray(b"\xff\xd8")
    i = 2
    while i + 4 <= len(base):
        assert base[i] == 0xFF
        marker = base[i + 1]
        if marker == 0xDA:
            break
        seglen = (base[i + 2] << 8) | base[i + 3]
        if marker not in (0xC4, 0xDD):  # DHT, DRI
            out += base[i : i + 2 + seglen]
        i += 2 + seglen

    dc_counts, dc_vals, dc_enc = _flat_table(list(range(12)), 5)
    ac_syms = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ]
    ac_counts, ac_vals, ac_enc = _flat_table(ac_syms, 9)

    def dht(tc, th, counts, vals):
        body = bytes([(tc << 4) | th]) + counts + vals
        return b"\xff\xc4" + (len(body) + 2).to_bytes(2, "big") + body

    out += dht(0, 0, dc_counts, dc_vals)
    out += dht(1, 0, ac_counts, ac_vals)
    if restart_blocks:
        out += b"\xff\xdd\x00\x04" + restart_blocks.to_bytes(2, "big")

    for sp, ci in enumerate(scan0.comp_indices):
        c = frame.components[ci]
        out += (
            b"\xff\xda\x00\x08\x01"
            + bytes([c.cid, 0x00])  # Td=0, Ta=0 (the flat tables)
            + b"\x00\x3f\x00"      # Ss=0 Se=63 Ah/Al=0
        )
        bw = _BitWriter()
        pred = 0
        written = 0
        seg = 0
        for bi in range(c.width_blocks * c.height_blocks):
            if restart_blocks and written == restart_blocks:
                bw.align()
                bw.out += bytes([0xFF, 0xD0 + (seg % 8)])
                seg += 1
                pred = 0
                written = 0
            by, bx = divmod(bi, c.width_blocks)
            row = coeffs[ci][by * c.padded_wb + bx]
            diff = int(row[0]) - pred
            pred = int(row[0])
            size, bits = _mag_bits(diff)
            code, length = dc_enc[size]
            bw.put(code, length)
            if size:
                bw.put(bits, size)
            nz = np.nonzero(row[1:])[0]
            k = 1
            for p in nz:
                zz = int(p) + 1
                run = zz - k
                while run > 15:
                    code, length = ac_enc[0xF0]  # ZRL
                    bw.put(code, length)
                    run -= 16
                size, bits = _mag_bits(int(row[zz]))
                code, length = ac_enc[(run << 4) | size]
                bw.put(code, length)
                bw.put(bits, size)
                k = zz + 1
            if k < 64:
                code, length = ac_enc[0x00]  # EOB
                bw.put(code, length)
            written += 1
        bw.align()
        out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def make_synth_jpeg(
    w: int,
    h: int,
    hv=((1, 2), (1, 1), (1, 1)),
    seed: int = 0,
    qval: int = 16,
    restart_blocks: int = 0,
) -> bytes:
    """Fully synthetic baseline JPEG with ARBITRARY sampling factors
    (4:4:0, 4:1:1, ... — shapes PIL cannot ENCODE but libjpeg decodes),
    written as per-component non-interleaved scans from random
    coefficients. PIL is the pixel oracle for the exotic-upsampler
    paths (replication for non-h2 ratios, per jdsample.c)."""
    rng = np.random.default_rng(seed)
    ncomp = len(hv)
    hmax = max(x for x, _ in hv)
    vmax = max(y for _, y in hv)

    out = bytearray(b"\xff\xd8")
    # JFIF APP0 so color_space resolves to ycbcr for 3 components.
    out += b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    # DQT: one flat 8-bit table.
    out += b"\xff\xdb\x00\x43\x00" + bytes([qval] * 64)
    # SOF0.
    body = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes(
        [ncomp]
    )
    for i, (ch, cv) in enumerate(hv):
        body += bytes([i + 1, (ch << 4) | cv, 0])
    out += b"\xff\xc0" + (len(body) + 2).to_bytes(2, "big") + body
    # Flat complete Huffman tables (see make_multiscan_jpeg).
    dc_counts, dc_vals, dc_enc = _flat_table(list(range(12)), 5)
    ac_syms = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ]
    ac_counts, ac_vals, ac_enc = _flat_table(ac_syms, 9)
    body = bytes([0x00]) + dc_counts + dc_vals
    out += b"\xff\xc4" + (len(body) + 2).to_bytes(2, "big") + body
    body = bytes([0x10]) + ac_counts + ac_vals
    out += b"\xff\xc4" + (len(body) + 2).to_bytes(2, "big") + body
    if restart_blocks:
        out += b"\xff\xdd\x00\x04" + restart_blocks.to_bytes(2, "big")

    import math

    for i, (ch, cv) in enumerate(hv):
        dw = math.ceil(w * ch / hmax)
        dh = math.ceil(h * cv / vmax)
        wb, hb = math.ceil(dw / 8), math.ceil(dh / 8)
        out += (
            b"\xff\xda\x00\x08\x01" + bytes([i + 1, 0x00])
            + b"\x00\x3f\x00"
        )
        bw = _BitWriter()
        pred = 0
        written = 0
        seg = 0
        for _bi in range(wb * hb):
            if restart_blocks and written == restart_blocks:
                bw.align()
                bw.out += bytes([0xFF, 0xD0 + (seg % 8)])
                seg += 1
                pred = 0
                written = 0
            # Sparse random block: DC walk + a few small ACs.
            row = np.zeros(64, np.int64)
            row[0] = int(rng.integers(-80, 81))
            nz = rng.integers(0, 5)
            pos = rng.choice(np.arange(1, 64), size=nz, replace=False)
            row[pos] = rng.integers(-30, 31, size=nz)
            diff = int(row[0]) - pred
            pred = int(row[0])
            size, bits = _mag_bits(diff)
            code, length = dc_enc[size]
            bw.put(code, length)
            if size:
                bw.put(bits, size)
            nzp = np.nonzero(row[1:])[0]
            k = 1
            for p in sorted(int(x) for x in nzp):
                zz = p + 1
                run = zz - k
                while run > 15:
                    code, length = ac_enc[0xF0]
                    bw.put(code, length)
                    run -= 16
                size, bits = _mag_bits(int(row[zz]))
                code, length = ac_enc[(run << 4) | size]
                bw.put(code, length)
                bw.put(bits, size)
                k = zz + 1
            if k < 64:
                code, length = ac_enc[0x00]
                bw.put(code, length)
            written += 1
        bw.align()
        out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
