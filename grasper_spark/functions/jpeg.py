"""Baseline JPEG (SOF0) codec — from-scratch numpy, public ITU T.81 spec.

Encoder twin + decoder, the same closed-form-synthesis oracle discipline
as the PNG/GIF/AVI codecs in `multimodal.py`: the engine synthesizes
pixels from SQL-expressible formulas, pushes them through REAL JPEG
bytes (FDCT, quantization, canonical Huffman entropy coding with the
Annex K standard tables, 0xFF byte stuffing), and decodes them back
through the full marker walk + Huffman + dequant + IDCT + color
convert. A decoder bug is a ledger mismatch, not a silent pass.

Exactness contract (floats-never-hash): the IDCT is not bit-exact
across implementations, so hashed ledger rows use images built from
FLAT 8x8 blocks under an all-ones quantization table — there the DCT
domain is exactly representable (DC = 8*(v-128), every AC = 0) and any
IDCT with per-pixel error < 0.5 reconstructs the block value exactly.
Non-flat images are covered by tolerance unit tests, not hashes.

Supported: baseline DCT (SOF0), 8-bit samples, 1-component grayscale
and 3-component YCbCr at 4:4:4 / 4:2:2 / 4:2:0, multiple DQT/DHT
segments, restart intervals (DRI/RSTn). Progressive (SOF2), extended
sequential (SOF1), arithmetic coding, 16-bit DQT and unexpected
component counts raise ValueError — refused rather than silently wrong,
like the rest of the media module.

Reference parity note: yaobaiwei/Grasper has no media code at all —
this is part of the training-data-pipeline surface built on top of the
graph engine (SURVEY.md §2 extensions), with JPEG semantics from the
public ITU-T T.81 standard (Annex K tables, F.1/F.2 entropy coding).
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: position i in the scan -> index into the
# row-major 8x8 block (ITU T.81 Figure 5)
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
_UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.1 standard quantization tables (row-major natural order)
QUANT_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QUANT_CHROM = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)
# all-ones table: the exactness table for flat-block ledger images
QUANT_FLAT = np.ones(64, dtype=np.int64)

# Annex K.3 standard Huffman tables: (bits[1..16], huffval)
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROM_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# 8-point DCT-II basis matrix: M[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
_DCT_M = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _DCT_M[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)
_M00_F = float(_DCT_M[0, 0])  # scalar twin for the pure-Python DC path


def rgb_to_ycbcr_int(px: np.ndarray) -> np.ndarray:
    """Integer fixed-point RGB->YCbCr (8.8); gray inputs (R=G=B=v) map
    to exactly (v, 128, 128), which is what makes gray-valued color
    JPEGs hashable end-to-end."""
    p = px.astype(np.int64)
    r, g, b = p[..., 0], p[..., 1], p[..., 2]
    y = (77 * r + 150 * g + 29 * b + 128) >> 8
    cb = 128 + ((-43 * r - 85 * g + 128 * b + 128) >> 8)
    cr = 128 + ((128 * r - 107 * g - 21 * b + 128) >> 8)
    return np.clip(np.stack([y, cb, cr], axis=-1), 0, 255).astype(np.uint8)


def ycbcr_to_rgb_int(px: np.ndarray) -> np.ndarray:
    """Integer fixed-point YCbCr->RGB, the exact inverse on gray
    (Cb=Cr=128 -> R=G=B=Y)."""
    p = px.astype(np.int64)
    y, cb, cr = p[..., 0], p[..., 1] - 128, p[..., 2] - 128
    r = y + ((359 * cr + 128) >> 8)
    g = y - ((88 * cb + 183 * cr + 128) >> 8)
    b = y + ((454 * cb + 128) >> 8)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def _build_codes(bits, vals):
    """Canonical Huffman: (bits, huffval) -> {symbol: (code, length)}."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


# the standard tables never change — build their encode dicts once at
# import (rebuilding them per jpeg_bytes call was 28% of encode time)
_DC_L_CODES = _build_codes(_DC_LUM_BITS, _DC_LUM_VALS)
_AC_L_CODES = _build_codes(_AC_LUM_BITS, _AC_LUM_VALS)
_DC_C_CODES = _build_codes(_DC_CHROM_BITS, _DC_CHROM_VALS)
_AC_C_CODES = _build_codes(_AC_CHROM_BITS, _AC_CHROM_VALS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _magnitude(v: int):
    """JPEG magnitude coding: value -> (size, bits)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _fdct_blocks(plane: np.ndarray) -> np.ndarray:
    """Level-shift + 2-D DCT over every 8x8 block of an (H, W) plane
    (H, W multiples of 8). Returns (n_blocks_y, n_blocks_x, 8, 8).
    matmul broadcasting (M @ B @ M.T) beats einsum ~2x on the tiny
    block counts the ledger images carry."""
    h, w = plane.shape
    b = plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).astype(np.float64)
    b -= 128.0
    return _DCT_M @ b @ _DCT_M.T


def _idct_blocks(coef: np.ndarray) -> np.ndarray:
    """Inverse of _fdct_blocks: (..., 8, 8) coefficient blocks ->
    rounded, clipped uint8 spatial blocks (vectorized matmul)."""
    spat = _DCT_M.T @ coef.astype(np.float64) @ _DCT_M
    return np.clip(np.rint(spat) + 128, 0, 255).astype(np.uint8)


def _encode_block(coef_zz, dc_pred, dc_codes, ac_codes, bw):
    """Huffman-encode one quantized block (64 coefs in zigzag order).
    Iterates only the NONZERO AC positions (np.nonzero) — on the
    sparse blocks real quantization produces, and especially on the
    DC-only flat ledger blocks, this skips the 63-slot scan."""
    dc = int(coef_zz[0])
    diff = dc - dc_pred
    size, bits = _magnitude(diff)
    code, length = dc_codes[size]
    bw.write(code, length)
    if size:
        bw.write(bits, size)
    nz = np.nonzero(coef_zz[1:])[0]
    prev = 0  # last written zigzag position
    for idx in nz:
        k = int(idx) + 1
        run = k - prev - 1
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        size, bits = _magnitude(int(coef_zz[k]))
        code, length = ac_codes[(run << 4) | size]
        bw.write(code, length)
        bw.write(bits, size)
        prev = k
    if prev < 63:
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return dc


def _pad_replicate(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Pad a plane to multiples of (mh, mw) by edge replication."""
    h, w = plane.shape
    ph = (mh - h % mh) % mh
    pw = (mw - w % mw) % mw
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _prep_components(pixels, quant, subsampling):
    """Shared encoder front half: pixels -> (comps meta, per-component
    quantized zigzag block grids, luma/chroma tables, MCU grid dims,
    h, w, gray)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    if px.ndim != 3 or px.shape[2] not in (1, 3):
        raise ValueError(f"expected (H,W), (H,W,1) or (H,W,3), got {px.shape}")
    h, w = px.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image dimensions")
    gray = px.shape[2] == 1
    if quant is None:
        qt_l = qt_c = QUANT_FLAT
    elif isinstance(quant, tuple):
        qt_l, qt_c = (np.asarray(q, dtype=np.int64) for q in quant)
    else:
        qt_l = qt_c = np.asarray(quant, dtype=np.int64)

    if gray:
        comps = [("Y", px[:, :, 0], 1, 1, 0)]
    else:
        ycc = rgb_to_ycbcr_int(px)
        sh, sv = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}[subsampling]
        yp = ycc[:, :, 0]
        # chroma downsample: integer box mean with round-half-up —
        # exact on constant regions (the gray-valued hash contract)
        cbp, crp = ycc[:, :, 1], ycc[:, :, 2]
        if sh > 1 or sv > 1:
            cph = _pad_replicate(cbp, sv, sh)
            crh = _pad_replicate(crp, sv, sh)
            hh, ww = cph.shape

            def down(p):
                q = p.astype(np.int64).reshape(hh // sv, sv, ww // sh, sh)
                return ((q.sum(axis=(1, 3)) + sv * sh // 2) // (sv * sh)).astype(np.uint8)

            cbp, crp = down(cph), down(crh)
        comps = [("Y", yp, sh, sv, 0), ("Cb", cbp, 1, 1, 1), ("Cr", crp, 1, 1, 1)]

    max_h = max(c[2] for c in comps)
    max_v = max(c[3] for c in comps)
    mcu_w, mcu_h = 8 * max_h, 8 * max_v
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h

    # per-component quantized zigzag blocks, indexed [by][bx]
    comp_blocks = []
    for _, plane, hi, vi, tq in comps:
        need_w, need_h = mcus_x * hi * 8, mcus_y * vi * 8
        p = _pad_replicate(plane, 8, 8)
        if p.shape[0] < need_h or p.shape[1] < need_w:
            p = np.pad(
                p, ((0, need_h - p.shape[0]), (0, need_w - p.shape[1])), mode="edge"
            )
        coef = _fdct_blocks(p)
        qt = (qt_l if tq == 0 else qt_c).reshape(8, 8)
        q = np.round(coef / qt).astype(np.int64)
        # flatten each block to zigzag scan order
        comp_blocks.append(q.reshape(q.shape[0], q.shape[1], 64)[:, :, ZIGZAG])
    return comps, comp_blocks, qt_l, qt_c, mcus_x, mcus_y, h, w, gray


def _common_headers(sof_marker, comps, qt_l, qt_c, h, w, gray):
    """SOI + JFIF APP0 + DQT + SOF + DHT-independent prefix shared by
    the baseline and progressive encoders."""
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, qt in ((0, qt_l),) + (() if gray else ((1, qt_c),)):
        body = bytes([tq]) + qt[ZIGZAG].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for i, (_, _, hi, vi, tq) in enumerate(comps):
        sof += bytes([i + 1, (hi << 4) | vi, tq])
    out += sof_marker + struct.pack(">H", len(sof) + 2) + sof
    return out


def jpeg_bytes(
    pixels, quant=None, subsampling: str = "444", restart_interval: int = 0
) -> bytes:
    """Encode an image as a real baseline JFIF payload.

    pixels: (H, W) / (H, W, 1) grayscale, or (H, W, 3) RGB uint8.
    quant: 64-entry table (natural order) for luma — chroma shares it —
           or a (luma, chroma) pair; default QUANT_FLAT (all ones, the
           exactness table for flat-block oracle images).
    subsampling: '444', '422' or '420' (color only).
    restart_interval: MCUs between RSTn markers (0 = none).
    """
    (comps, comp_blocks, qt_l, qt_c, mcus_x, mcus_y, h, w, gray) = (
        _prep_components(pixels, quant, subsampling)
    )

    # ---- headers ----
    out = _common_headers(b"\xff\xc0", comps, qt_l, qt_c, h, w, gray)
    tables = [(0, 0, _DC_LUM_BITS, _DC_LUM_VALS), (1, 0, _AC_LUM_BITS, _AC_LUM_VALS)]
    if not gray:
        tables += [
            (0, 1, _DC_CHROM_BITS, _DC_CHROM_VALS),
            (1, 1, _AC_CHROM_BITS, _AC_CHROM_VALS),
        ]
    for tc, th, bits, vals in tables:
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([len(comps)])
    for i in range(len(comps)):
        td_ta = 0x00 if comps[i][4] == 0 else 0x11
        sos += bytes([i + 1, td_ta])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    # ---- entropy-coded scan (module-level prebuilt code tables) ----
    dc_l, ac_l, dc_c, ac_c = _DC_L_CODES, _AC_L_CODES, _DC_C_CODES, _AC_C_CODES
    bw = _BitWriter()
    preds = [0] * len(comps)
    rst = 0
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                bw.flush()
                out += bw.out
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * len(comps)
            for ci, (_, _, hi, vi, tq) in enumerate(comps):
                dcs, acs = (dc_l, ac_l) if tq == 0 else (dc_c, ac_c)
                for by in range(vi):
                    for bx in range(hi):
                        blk = comp_blocks[ci][my * vi + by, mx * hi + bx]
                        preds[ci] = _encode_block(blk, preds[ci], dcs, acs, bw)
            n_mcu += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


#: progressive AC code table: Annex K's baseline AC tables define no
#: EOBn symbols (r<<4, s=0, r=1..14), which progressive EOB-run coding
#: needs — use one flat canonical table covering every symbol the
#: encoder can emit (s=0 row incl. EOBn+ZRL, s=1..11 at all runs), all
#: at 9 bits (192 codes * 2^-9 < 1 satisfies Kraft; incomplete codes
#: are legal and the decoder reads whatever DHT declares)
_AC_PROG_VALS = sorted(
    [r << 4 for r in range(16)]
    + [(r << 4) | s for r in range(16) for s in range(1, 12)]
)
_AC_PROG_BITS = [0] * 16
_AC_PROG_BITS[8] = len(_AC_PROG_VALS)  # all length-9
_AC_PROG_CODES = _build_codes(_AC_PROG_BITS, _AC_PROG_VALS)


def jpeg_progressive_bytes(
    pixels, quant=None, subsampling: str = "444",
    scans=None, restart_interval: int = 0,
) -> bytes:
    """Encode an image as a REAL progressive (SOF2) JFIF payload —
    the decoder's spectral-selection + successive-approximation paths
    get a from-scratch encode twin, so progressive transport is
    round-trip testable against the baseline encoding of the SAME
    quantized coefficients.

    scans: list of (comp_indices, Ss, Se, Ah, Al); default script
    covers every decode path: interleaved DC first (Al=1), DC
    refinement, per-component AC first scans in two bands (Al=1), and
    a per-component AC refinement scan to Al=0.
    """
    (comps, comp_blocks, qt_l, qt_c, mcus_x, mcus_y, h, w, gray) = (
        _prep_components(pixels, quant, subsampling)
    )
    ncomp = len(comps)
    if scans is None:
        allc = list(range(ncomp))
        scans = [(allc, 0, 0, 0, 1), (allc, 0, 0, 1, 0)]
        for c in range(ncomp):
            scans += [([c], 1, 5, 0, 1), ([c], 6, 63, 0, 1),
                      ([c], 1, 63, 1, 0)]

    out = _common_headers(b"\xff\xc2", comps, qt_l, qt_c, h, w, gray)
    tables = [(0, 0, _DC_LUM_BITS, _DC_LUM_VALS),
              (1, 0, _AC_PROG_BITS, _AC_PROG_VALS)]
    if not gray:
        tables.append((0, 1, _DC_CHROM_BITS, _DC_CHROM_VALS))
    for tc, th, bits, vals in tables:
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    fh, fw = h, w
    max_h = max(c[2] for c in comps)
    max_v = max(c[3] for c in comps)

    def comp_bdims(ci):
        _, _, hi, vi, _ = comps[ci]
        cw = (fw * hi + max_h - 1) // max_h
        ch = (fh * vi + max_v - 1) // max_v
        return (ch + 7) // 8, (cw + 7) // 8

    for sel, ss, se, ah, al in scans:
        if not (0 <= ss <= se <= 63):
            raise ValueError(f"invalid spectral selection {ss}..{se}")
        if ss > 0 and len(sel) != 1:
            raise ValueError("progressive AC scan must be single-component")
        sos = bytes([len(sel)])
        for ci in sel:
            td_ta = ((0 if comps[ci][4] == 0 else 1) << 4) | 0
            sos += bytes([ci + 1, td_ta])
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
        out += _encode_prog_scan(
            comps, comp_blocks, sel, ss, se, ah, al, restart_interval,
            mcus_x, mcus_y, comp_bdims,
        )
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _ProgWriter(_BitWriter):
    """BitWriter + the deferred EOB-run / correction-bit state AC
    progressive scans carry (T.81 G.1.2.2-3)."""

    def __init__(self):
        super().__init__()
        self.eobrun = 0
        self.pend = []  # correction bits riding the pending EOB run

    def emit_eobrun(self):
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            code, length = _AC_PROG_CODES[nbits << 4]
            self.write(code, length)
            if nbits:
                self.write(self.eobrun - (1 << nbits), nbits)
            self.eobrun = 0
        for b in self.pend:
            self.write(b, 1)
        self.pend = []


def _encode_prog_scan(
    comps, comp_blocks, sel, ss, se, ah, al, ri, mcus_x, mcus_y, comp_bdims
):
    """Entropy data for one progressive scan (+ RSTn interleaving)."""
    body = bytearray()
    bw = _ProgWriter()
    preds = {ci: 0 for ci in sel}
    rst = 0
    n_units = 0

    def restart_boundary():
        nonlocal bw, rst
        bw.emit_eobrun()
        bw.flush()
        body.extend(bw.out)
        body.extend((0xFF, 0xD0 + rst))
        rst = (rst + 1) % 8
        bw = _ProgWriter()
        for ci in preds:
            preds[ci] = 0

    def dc_first(ci, blk):
        dcs = _DC_L_CODES if comps[ci][4] == 0 else _DC_C_CODES
        v = int(blk[0]) >> al  # arithmetic shift: the DC point transform
        diff = v - preds[ci]
        preds[ci] = v
        size, bits_ = _magnitude(diff)
        code, length = dcs[size]
        bw.write(code, length)
        if size:
            bw.write(bits_, size)

    def dc_refine(blk):
        bw.write((int(blk[0]) >> al) & 1, 1)

    def ac_first(blk):
        # point transform: sign(v) * (|v| >> Al) (T.81 G.1.2.1)
        r = 0
        wrote = False
        for k in range(ss, se + 1):
            v = int(blk[k])
            t = abs(v) >> al
            if t == 0:
                r += 1
                continue
            bw.emit_eobrun()
            while r > 15:
                code, length = _AC_PROG_CODES[0xF0]
                bw.write(code, length)
                r -= 16
            if v < 0:
                t = -t
            size, bits_ = _magnitude(t)
            code, length = _AC_PROG_CODES[(r << 4) | size]
            bw.write(code, length)
            bw.write(bits_, size)
            r = 0
            wrote = True
        if r > 0 or not wrote:
            bw.eobrun += 1
            if bw.eobrun == 0x7FFF:
                bw.emit_eobrun()

    def ac_refine(blk):
        # decoder-mirror encoding: the refinement decoder reads
        # correction bits for already-nonzero coefficients INTERLEAVED
        # as its advance loop passes them, so emit them in exactly
        # that position order (a trailing-buffer design misplaces a
        # correction that sits past a ZRL's 16-zero span)
        absv = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
        n = len(absv)
        newly = [i for i, t in enumerate(absv) if t == 1]
        if not newly:
            # EOB block: every visible coefficient's correction bit
            # rides the pending EOB run
            bw.eobrun += 1
            bw.pend.extend(t & 1 for t in absv if t > 1)
            if bw.eobrun == 0x7FFF:
                bw.emit_eobrun()
            return
        bw.emit_eobrun()
        pos = 0
        for p in newly:
            r = sum(1 for i in range(pos, p) if absv[i] == 0)
            while r > 15:
                code, length = _AC_PROG_CODES[0xF0]
                bw.write(code, length)
                zeros = 0
                while zeros < 16:  # decoder consumes 16 zero-history
                    if absv[pos] == 0:
                        zeros += 1
                    else:
                        bw.write(absv[pos] & 1, 1)
                    pos += 1
                r -= 16
            code, length = _AC_PROG_CODES[(r << 4) | 1]
            bw.write(code, length)
            bw.write(0 if int(blk[ss + p]) < 0 else 1, 1)
            while pos < p:  # corrections interleaved with the r zeros
                if absv[pos] > 1:
                    bw.write(absv[pos] & 1, 1)
                pos += 1
            pos = p + 1
        if pos < n:
            # tail after the last newly-nonzero: decoder expects one
            # more unit — an EOB whose span carries the tail corrections
            bw.eobrun += 1
            bw.pend.extend(absv[i] & 1 for i in range(pos, n) if absv[i] > 1)
            if bw.eobrun == 0x7FFF:
                bw.emit_eobrun()

    if ss == 0 and len(sel) > 1:  # interleaved DC scan
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if ri and n_units and n_units % ri == 0:
                    restart_boundary()
                for ci in sel:
                    _, _, hi, vi, _ = comps[ci]
                    for by in range(vi):
                        for bx in range(hi):
                            blk = comp_blocks[ci][my * vi + by, mx * hi + bx]
                            if ah == 0:
                                dc_first(ci, blk)
                            else:
                                dc_refine(blk)
                n_units += 1
    else:  # single-component scan over the component's own block grid
        ci = sel[0]
        cbh, cbw = comp_bdims(ci)
        for by in range(cbh):
            for bx in range(cbw):
                if ri and n_units and n_units % ri == 0:
                    restart_boundary()
                blk = comp_blocks[ci][by, bx]
                if ss == 0:
                    if ah == 0:
                        dc_first(ci, blk)
                    else:
                        dc_refine(blk)
                else:
                    if ah == 0:
                        ac_first(blk)
                    else:
                        ac_refine(blk)
                n_units += 1
    bw.emit_eobrun()
    bw.flush()
    body.extend(bw.out)
    return bytes(body)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _HuffTable:
    """Canonical Huffman decode per ITU T.81 F.2.2.3 (mincode/maxcode/
    valptr arrays), plus a lazily built 16-bit prefix LUT: every JPEG
    code is <= 16 bits, so one table index replaces the per-length scan
    (the scan loop was ~3 us/symbol; the LUT is ~0.3 us). Entries pack
    (length << 8) | symbol; 0 marks an unassigned prefix. The LUT
    builds on FIRST decode use and is cached with the table, so
    corpora reusing the Annex K tables pay the ~2 ms build once."""

    __slots__ = ("mincode", "maxcode", "valptr", "vals", "bits", "lut")

    def __init__(self, bits, vals):
        self.vals = vals
        self.bits = bits
        self.lut = None
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1

    def build_lut(self):
        lut = np.zeros(65536, dtype=np.int32)
        code = 0
        k = 0
        for length in range(1, 17):
            span = 1 << (16 - length)
            for _ in range(self.bits[length - 1]):
                base = code << (16 - length)
                lut[base:base + span] = (length << 8) | self.vals[k]
                code += 1
                k += 1
            code <<= 1
        self.lut = lut.tolist()  # list indexing beats np scalar indexing
        return self.lut


_HUFF_CACHE: dict = {}
_DQT_CACHE: dict = {}
#: whole-DHT-segment parse cache: corpora repeat the Annex K tables in
#: every payload, so the per-payload list/sum/slice parse of the DHT
#: body (~15 us) collapses to one dict lookup on the raw segment bytes
_DHT_SEG_CACHE: dict = {}
#: scan-order -> row-major scatter index cache for multi-block MCUs:
#: the 4-way arange broadcast costs ~10 us per component per image and
#: depends only on the MCU grid geometry
_POS_CACHE: dict = {}


class _BitReader:
    """MSB-first bit reader over an already-unstuffed byte segment."""

    __slots__ = ("data", "pos", "acc", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self, need: int):
        while self.n < need:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy-coded segment")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.n += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        self.n -= n
        v = (self.acc >> self.n) & ((1 << n) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def huff(self, tbl: _HuffTable) -> int:
        """Canonical decode via the table's 16-bit prefix LUT: buffer
        up to 16 bits, one list index resolves (length, symbol). Short
        reads near the segment end zero-pad the window; a decoded
        length longer than the available bits is a truncation."""
        data, pos = self.data, self.pos
        acc, n = self.acc, self.n
        ln = len(data)
        while n < 16 and pos < ln:
            acc = (acc << 8) | data[pos]
            pos += 1
            n += 8
        self.pos = pos
        lut = tbl.lut
        if lut is None:
            lut = tbl.build_lut()
        if n >= 16:
            e = lut[(acc >> (n - 16)) & 0xFFFF]
        else:
            e = lut[(acc << (16 - n)) & 0xFFFF]
        length = e >> 8
        if length == 0:
            raise ValueError("invalid Huffman code in scan")
        if length > n:
            raise ValueError("truncated entropy-coded segment")
        self.n = n - length
        self.acc = acc & ((1 << self.n) - 1)
        return e & 0xFF


def _extend(bits: int, size: int) -> int:
    """Magnitude decode (ITU T.81 F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def _parse_dqt(body, qts):
    """Parse one DQT segment body into qts (natural-order int64
    tables, cached — corpora repeat tables)."""
    i = 0
    while i < len(body):
        pq, tq = body[i] >> 4, body[i] & 0x0F
        if pq != 0:
            raise ValueError("16-bit quantization tables unsupported")
        if i + 65 > len(body):
            raise ValueError("truncated DQT")
        raw = bytes(body[i + 1:i + 65])
        nat = _DQT_CACHE.get(raw)
        if nat is None:
            zz = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
            nat = np.zeros(64, dtype=np.int64)
            nat[ZIGZAG] = zz  # store in natural order
            nat.setflags(write=False)
            if len(_DQT_CACHE) < 64:
                _DQT_CACHE[raw] = nat
        qts[tq] = nat
        i += 65


def _parse_dht(body, huffs):
    """Parse one DHT segment body into huffs, via the segment- and
    table-level caches (corpora reuse the Annex K tables in every
    payload — decode arrays build once per distinct table, not once
    per image; only complete parses are cached, so malformed bodies
    keep raising every time)."""
    seg = _DHT_SEG_CACHE.get(body)
    if seg is None:
        seg = {}
        i = 0
        while i < len(body):
            tc, th = body[i] >> 4, body[i] & 0x0F
            raw = bytes(body[i + 1:i + 17])
            if len(raw) != 16:
                raise ValueError("truncated DHT")
            bits = list(raw)
            n = sum(bits)
            vals = list(body[i + 17:i + 17 + n])
            if len(vals) != n:
                raise ValueError("truncated DHT")
            ck = raw + bytes(vals)
            tbl = _HUFF_CACHE.get(ck)
            if tbl is None:
                tbl = _HuffTable(bits, vals)
                if len(_HUFF_CACHE) < 64:
                    _HUFF_CACHE[ck] = tbl
            seg[(tc, th)] = tbl
            i += 17 + n
        if len(_DHT_SEG_CACHE) < 64:
            _DHT_SEG_CACHE[body] = seg
    huffs.update(seg)


def _parse_sof(body):
    """Parse a SOF0/SOF2 segment body -> (fh, fw, comps) with
    per-component [cid, hi, vi, tq, td, ta] (td/ta filled by SOS)."""
    if len(body) < 6:
        raise ValueError("truncated SOF header")
    prec, fh, fw, nc = body[0], *struct.unpack(">HH", body[1:5]), body[5]
    if prec != 8:
        raise ValueError(f"{prec}-bit samples unsupported (8-bit only)")
    if fh == 0 or fw == 0:
        raise ValueError("empty image dimensions")
    if nc not in (1, 3):
        raise ValueError(f"{nc}-component JPEG unsupported")
    comps = []
    for c in range(nc):
        cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
        hi, vi = hv >> 4, hv & 0x0F
        if hi not in (1, 2) or vi not in (1, 2):
            raise ValueError(f"sampling factor {hi}x{vi} unsupported")
        comps.append([cid, hi, vi, tq, None, None])
    return (fh, fw, comps)


#: memoized parses of complete plain-baseline header prefixes
#: (SOI..SOS): corpora repeat the exact header bytes across images —
#: and across every frame of an MJPEG video — so the marker walk runs
#: once per distinct header. A complete header is self-delimiting
#: (the bytes up to its SOS fully determine where entropy data
#: starts), so a byte-exact prefix match at a cached length is
#: definitive. Values: (qts, comp_meta, frame, ri, hdr_len, geom).
_HDR_CACHE: dict = {}
_HDR_LENS: list = []


def _parse_baseline_header(payload: bytes):
    """Walk markers up to and including the first SOS of a plain
    BASELINE (SOF0) frame. Returns None for anything else — progressive
    frames, malformed segments, unexpected markers — so the caller
    falls back to the full decode_jpeg walk (which raises the canonical
    errors for malformed input)."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    pos = 2
    qts: dict = {}
    huffs: dict = {}
    frame = None
    ri = 0
    try:
        while pos + 4 <= len(payload):
            if payload[pos] != 0xFF:
                return None
            marker = payload[pos + 1]
            if marker == 0xFF:  # fill byte
                pos += 1
                continue
            pos += 2
            if marker == 0xD9 or 0xD0 <= marker <= 0xD7:
                return None
            if pos + 2 > len(payload):
                return None
            (seglen,) = struct.unpack(">H", payload[pos:pos + 2])
            body = payload[pos + 2:pos + seglen]
            if len(body) != seglen - 2:
                return None
            if marker == 0xDB:
                _parse_dqt(body, qts)
            elif marker == 0xC4:
                _parse_dht(body, huffs)
            elif marker == 0xC0:
                frame = _parse_sof(body)
            elif marker == 0xDD:
                if len(body) < 2:
                    return None
                (ri,) = struct.unpack(">H", body[:2])
            elif marker == 0xDA:  # SOS — the header ends here
                if frame is None or len(body) < 1:
                    return None
                ns = body[0]
                if not 1 <= ns <= 4 or len(body) < 1 + 2 * ns + 3:
                    return None
                comps = frame[2]
                if ns != len(comps):
                    return None
                for c in range(ns):
                    cs, tdta = body[1 + 2 * c], body[2 + 2 * c]
                    for comp in comps:
                        if comp[0] == cs:
                            comp[4], comp[5] = tdta >> 4, tdta & 0x0F
                            break
                    else:
                        return None
                for _, hi, vi, tq, _, _ in comps:
                    if tq not in qts:
                        return None
                comp_meta = _scan_comp_meta(comps, huffs)
                fh, fw, _ = frame
                max_h = max(c[1] for c in comps)
                max_v = max(c[2] for c in comps)
                geom = (
                    (fw + 8 * max_h - 1) // (8 * max_h),
                    (fh + 8 * max_v - 1) // (8 * max_v),
                    max_h,
                    max_v,
                )
                # freeze comps: the cached header is shared between
                # decodes and must never be mutated
                frame = (fh, fw, tuple(tuple(c) for c in comps))
                return (qts, comp_meta, frame, ri, pos + seglen, geom)
            elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9,
                            0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None  # progressive/extended: full walk
            pos += seglen
    except ValueError:
        return None
    return None


def _baseline_header(payload: bytes):
    """Memoized _parse_baseline_header (see _HDR_CACHE)."""
    for ln in _HDR_LENS:
        hit = _HDR_CACHE.get(payload[:ln])
        if hit is not None:
            return hit
    parsed = _parse_baseline_header(payload)
    if parsed is None:
        return None
    hlen = parsed[4]
    if len(_HDR_CACHE) < 256:
        _HDR_CACHE[payload[:hlen]] = parsed
        if hlen not in _HDR_LENS:
            _HDR_LENS.append(hlen)
    return parsed


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline (SOF0) or progressive (SOF2) JFIF payload to
    (H, W, 1) grayscale or (H, W, 3) RGB uint8. Full marker walk
    (APPn/COM skipped, multiple DQT/DHT segments, DRI + RSTn restart
    handling, 0xFF00 unstuffing); progressive scans accumulate
    spectral-selection bands and successive-approximation bits per
    T.81 G.2 (DC first/refine, AC first/refine with EOB-run coding)
    before one dequant+IDCT. Extended/lossless/arithmetic frames,
    16-bit quant tables and sampling factors outside {1, 2} raise
    ValueError."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    # plain-baseline fast path: a memoized header parse (corpora repeat
    # exact header bytes) + the same entropy/plane/assemble code the
    # full walk runs. Only taken when the byte after the scan is EOI
    # (or the payload ends) — i.e. exactly the payloads for which the
    # full walk would do nothing else; anything unusual falls through.
    hdr = _baseline_header(payload)
    if hdr is not None:
        h_qts, comp_meta, h_frame, h_ri, hlen, geom = hdr
        mcus_x, mcus_y, max_h, max_v = geom
        dcs, sparse, end_pos = _entropy_decode(
            payload, hlen, h_frame[2], comp_meta, h_ri, mcus_x, mcus_y
        )
        if (end_pos + 4 > len(payload)
                or payload[end_pos:end_pos + 2] == b"\xff\xd9"):
            planes = _scan_planes(
                h_frame[2], h_qts, dcs, sparse, mcus_x, mcus_y
            )
            return _assemble(h_frame, (planes, geom))
    frame, qts, progressive, prog_grids, scan = _decode_jpeg_walk(payload)
    if progressive:
        planes = _dense_planes(frame[2], prog_grids, qts)
        max_h = max(c[1] for c in frame[2])
        max_v = max(c[2] for c in frame[2])
        mx = (frame[1] + 8 * max_h - 1) // (8 * max_h)
        my = (frame[0] + 8 * max_v - 1) // (8 * max_v)
        return _assemble(frame, (planes, (mx, my, max_h, max_v)))
    return _assemble(frame, scan)


def _decode_jpeg_walk(payload):
    """The full marker walk of decode_jpeg, stopping before the final
    plane assembly: returns (frame, qts, progressive, prog_grids,
    scan) with progressive quant tables already validated."""
    pos = 2
    qts = {}
    huffs = {}
    frame = None
    ri = 0
    scan = None
    progressive = False
    prog_grids = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7:
            raise ValueError("RST marker outside entropy-coded scan")
        if pos + 2 > len(payload):
            raise ValueError("truncated marker segment")
        (seglen,) = struct.unpack(">H", payload[pos:pos + 2])
        body = payload[pos + 2:pos + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated marker segment")
        if marker == 0xDB:  # DQT
            _parse_dqt(body, qts)
        elif marker == 0xC4:  # DHT
            _parse_dht(body, huffs)
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            frame = _parse_sof(body)
            fh, fw, comps = frame
            progressive = marker == 0xC2
            if progressive:
                # coefficient accumulators shared by every scan
                max_h = max(c[1] for c in comps)
                max_v = max(c[2] for c in comps)
                mx = (fw + 8 * max_h - 1) // (8 * max_h)
                my = (fh + 8 * max_v - 1) // (8 * max_v)
                # plain nested lists, not numpy: the scan loops touch
                # single coefficients (blk[k] reads/writes), where
                # numpy scalar indexing costs ~10x a list index;
                # _dense_planes converts to an ndarray once at the end
                prog_grids = [
                    [[[0] * 64 for _ in range(mx * hi)]
                     for _ in range(my * vi)]
                    for _, hi, vi, _, _, _ in comps
                ]
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"non-baseline frame marker 0xFF{marker:02X} unsupported "
                "(extended/lossless/arithmetic)"
            )
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise ValueError("truncated DRI segment")
            (ri,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            if len(body) < 1:
                raise ValueError("truncated SOS header")
            ns = body[0]
            if not 1 <= ns <= 4 or len(body) < 1 + 2 * ns + 3:
                raise ValueError("truncated SOS header")
            if not progressive and ns != len(frame[2]):
                raise ValueError("non-interleaved scans unsupported")
            scan_sel = []
            for c in range(ns):
                cs, tdta = body[1 + 2 * c], body[2 + 2 * c]
                for ci, comp in enumerate(frame[2]):
                    if comp[0] == cs:
                        comp[4], comp[5] = tdta >> 4, tdta & 0x0F
                        scan_sel.append(ci)
                        break
                else:
                    raise ValueError(f"SOS references unknown component {cs}")
            scan_start = pos + seglen
            if progressive:
                ss, se, ahal = body[1 + 2 * ns:4 + 2 * ns]
                pos = _decode_scan_progressive(
                    payload, scan_start, frame, scan_sel, ss, se,
                    ahal >> 4, ahal & 0x0F, ri, prog_grids, huffs,
                )
                scan = True  # at least one scan decoded
            else:
                scan, pos = _decode_scan(payload, scan_start, frame, qts, huffs, ri)
            continue
        # APPn (E0-EF), COM (FE) and anything else with a length: skip
        pos += seglen
    if scan is None:
        raise ValueError("no scan data (missing SOS)")
    if progressive:
        for _, hi, vi, tq, _, _ in frame[2]:
            if tq not in qts:
                raise ValueError(f"missing quantization table {tq}")
    return frame, qts, progressive, prog_grids, scan


def decode_jpeg_batch(payloads):
    """Decode a sequence of JPEG payloads — result-identical to
    ``[decode_jpeg(p) for p in payloads]`` (same arrays, same
    ValueErrors), but payloads that share one memoized baseline header
    (same geometry and tables — a corpus of same-shape thumbnails, or
    every frame of an MJPEG video) and whose blocks are all DC-only
    run the dequant + spatial construction and the crop/upsample/color
    assembly ONCE per group as whole-batch numpy ops, instead of ~20
    small per-image array calls. Anything else (progressive, AC
    coefficients, unusual trailers) decodes through the scalar path
    element-wise."""
    out = [None] * len(payloads)
    groups: dict = {}
    for i, p in enumerate(payloads):
        hdr = _baseline_header(p) if (
            len(p) >= 4 and p[:2] == b"\xff\xd8"
        ) else None
        if hdr is not None:
            qts, comp_meta, frame, ri, hlen, geom = hdr
            mcus_x, mcus_y, _, _ = geom
            dcs, sparse, end_pos = _entropy_decode(
                p, hlen, frame[2], comp_meta, ri, mcus_x, mcus_y
            )
            if (end_pos + 4 > len(p)
                    or p[end_pos:end_pos + 2] == b"\xff\xd9"):
                if any(sparse):
                    planes = _scan_planes(
                        frame[2], qts, dcs, sparse, mcus_x, mcus_y
                    )
                    out[i] = _assemble(frame, (planes, geom))
                else:
                    groups.setdefault(
                        id(hdr), (frame, qts, geom, True, [])
                    )[4].append((i, dcs))
                continue
            # unusual trailer: the full walk decides what follows
        frame, qts, progressive, prog_grids, scan = _decode_jpeg_walk(p)
        if not progressive:
            out[i] = _assemble(frame, scan)
            continue
        comps = frame[2]
        max_h = max(c[1] for c in comps)
        max_v = max(c[2] for c in comps)
        geom = (
            (frame[1] + 8 * max_h - 1) // (8 * max_h),
            (frame[0] + 8 * max_v - 1) // (8 * max_v),
            max_h, max_v,
        )
        # extract row-major DC lists when every block of every (small)
        # grid is DC-only — the batched-assembly domain; anything else
        # finishes through the scalar dense-planes path
        dc_lists = []
        for gl in prog_grids:
            dcl = None
            if len(gl) * len(gl[0]) <= 64:
                dcl = []
                for grow in gl:
                    for b in grow:
                        if any(b[1:]):
                            dcl = None
                            break
                        dcl.append(b[0])
                    if dcl is None:
                        break
            if dcl is None:
                dc_lists = None
                break
            dc_lists.append(dcl)
        if dc_lists is None:
            planes = _dense_planes(comps, prog_grids, qts)
            out[i] = _assemble(frame, (planes, geom))
            continue
        key = (
            frame[0], frame[1],
            tuple((c[1], c[2], id(qts[c[3]])) for c in comps),
        )
        groups.setdefault(
            key, (frame, qts, geom, False, [])
        )[4].append((i, dc_lists))
    for frame, qts, geom, scan_order, items in groups.values():
        _assemble_dc_group(frame, qts, geom, scan_order, items, out)
    return out


def _assemble_dc_group(frame, qts, geom, scan_order, items, out):
    """Batched DC-only plane construction + assembly for a group of
    decodes sharing one geometry + quant tables: identical float ops
    to _dc_only_plane / _scan_planes / _dense_planes / _assemble
    (rint((M00*dcq)*M00)+128, clip, 8x repeat, crop, chroma upsample,
    gray-in-color fast path), lifted to a leading batch axis.
    scan_order=True marks baseline DC lists (MCU scan order, scattered
    to row-major); progressive grids arrive row-major already."""
    fh, fw, comps = frame
    mcus_x, mcus_y, max_h, max_v = geom
    n = len(items)
    m00 = _DCT_M[0, 0]
    planes = []
    for ci, (_, hi, vi, tq, _, _) in enumerate(comps):
        nby, nbx = mcus_y * vi, mcus_x * hi
        dcm = np.array([dcs[ci] for _, dcs in items], dtype=np.int64)
        if not scan_order or (hi, vi) == (1, 1):
            rm = dcm  # row-major already (or one block per MCU)
        else:
            pkey = (mcus_y, mcus_x, vi, hi)
            pos = _POS_CACHE.get(pkey)
            if pos is None:
                myi = np.arange(mcus_y)[:, None, None, None]
                mxi = np.arange(mcus_x)[None, :, None, None]
                byi = np.arange(vi)[None, None, :, None]
                bxi = np.arange(hi)[None, None, None, :]
                pos = ((myi * vi + byi) * nbx + mxi * hi + bxi).ravel()
                if len(_POS_CACHE) < 256:
                    _POS_CACHE[pkey] = pos
            rm = np.empty_like(dcm)
            rm[:, pos] = dcm
        dcq = (rm * int(qts[tq][0])).astype(np.float64)
        spat = np.clip(np.rint((m00 * dcq) * m00) + 128, 0, 255)
        blkmap = spat.astype(np.uint8).reshape(n, nby, nbx)
        planes.append(blkmap.repeat(8, axis=1).repeat(8, axis=2))
    out_planes = []
    for ci, (_, hi, vi, _, _, _) in enumerate(comps):
        cw = (fw * hi + max_h - 1) // max_h
        ch = (fh * vi + max_v - 1) // max_v
        p = planes[ci][:, :ch, :cw]
        if hi != max_h or vi != max_v:
            p = p.repeat(max_v // vi, axis=1).repeat(max_h // hi, axis=2)
        out_planes.append(p[:, :fh, :fw])
    if len(out_planes) == 1:
        gray = out_planes[0][:, :, :, None]
        for j, (i, _) in enumerate(items):
            out[i] = gray[j]
        return
    y, cb, cr = out_planes
    gray_ok = (cb == 128).all(axis=(1, 2)) & (cr == 128).all(axis=(1, 2))
    rep = np.repeat(y[:, :, :, None], 3, axis=-1) if gray_ok.any() else None
    for j, (i, _) in enumerate(items):
        if gray_ok[j]:
            out[i] = rep[j]
        else:
            out[i] = ycbcr_to_rgb_int(np.stack([y[j], cb[j], cr[j]], axis=-1))


def _split_segments(payload, start):
    """Split an entropy-coded scan into restart segments, unstuffing
    0xFF00 — bulk-copy between 0xFF sightings (bytes.find) instead of
    a per-byte Python loop. Returns (segments, position of the marker
    that ended the scan)."""
    segments = []
    cur = bytearray()
    pos = start
    end_pos = len(payload)
    plen = len(payload)
    while pos < plen:
        ff = payload.find(b"\xff", pos)
        if ff < 0:
            cur += payload[pos:]
            pos = plen
            break
        cur += payload[pos:ff]
        if ff + 1 >= plen:
            cur.append(0xFF)
            pos = plen
            break
        nxt = payload[ff + 1]
        if nxt == 0x00:
            cur.append(0xFF)
            pos = ff + 2
        elif 0xD0 <= nxt <= 0xD7:  # RSTn
            segments.append(bytes(cur))
            cur = bytearray()
            pos = ff + 2
        else:
            end_pos = ff  # a real marker ends the scan
            pos = ff
            break
    segments.append(bytes(cur))
    return segments, end_pos


def _decode_scan(payload, start, frame, qts, huffs, ri):
    """Entropy-decode the scan: returns (per-component coefficient
    block grids, position after the scan)."""
    fh, fw, comps = frame
    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    mcus_x = (fw + 8 * max_h - 1) // (8 * max_h)
    mcus_y = (fh + 8 * max_v - 1) // (8 * max_v)

    for _, hi, vi, tq, _, _ in comps:
        if tq not in qts:
            raise ValueError(f"missing quantization table {tq}")
    comp_meta = _scan_comp_meta(comps, huffs)
    dcs, sparse, end_pos = _entropy_decode(
        payload, start, comps, comp_meta, ri, mcus_x, mcus_y
    )
    planes = _scan_planes(comps, qts, dcs, sparse, mcus_x, mcus_y)
    return (planes, (mcus_x, mcus_y, max_h, max_v)), end_pos


def _scan_comp_meta(comps, huffs):
    """Resolve per-component (dc LUT, ac LUT, blocks-per-MCU) for a
    baseline scan; raises like the scan decode when a table is
    missing."""
    comp_meta = []
    for _, hi, vi, tq, td, ta in comps:
        if (0, td) not in huffs or (1, ta) not in huffs:
            raise ValueError("missing Huffman table for scan")
        dct, act = huffs[(0, td)], huffs[(1, ta)]
        dlut = dct.lut if dct.lut is not None else dct.build_lut()
        alut = act.lut if act.lut is not None else act.build_lut()
        comp_meta.append((dlut, alut, hi * vi))
    return comp_meta


def _entropy_decode(payload, start, comps, comp_meta, ri, mcus_x, mcus_y):
    """Scalar baseline entropy decode over the scan's restart segments.
    Returns (dcs, sparse, end_pos): per-component DC values in SCAN
    order + sparse ACs as (scan_block_index, zigzag_k, value) — no
    per-block numpy."""
    segments, end_pos = _split_segments(payload, start)
    dcs: list[list[int]] = [[] for _ in comps]
    sparse: list[list[tuple[int, int, int]]] = [[] for _ in comps]

    # the MCU loop keeps the ENTIRE bit-reader state in locals (data,
    # pos, acc, n) and resolves Huffman codes by direct LUT index —
    # method dispatch per symbol (br.huff / br.bits) was ~2x the
    # arithmetic on small images. Semantics identical to _BitReader's
    # huff/bits (truncation -> ValueError, invalid code -> ValueError);
    # the component/restart structure is unchanged.
    comp_meta = [
        (dlut, alut, nblk, dcs[ci], sparse[ci])
        for ci, (dlut, alut, nblk) in enumerate(comp_meta)
    ]
    seg_i = 0
    data = segments[0]
    ln = len(data)
    pos = acc = n = 0
    preds = [0] * len(comps)
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if ri and n_mcu and n_mcu % ri == 0:
                seg_i += 1
                if seg_i >= len(segments):
                    raise ValueError("missing restart segment")
                data = segments[seg_i]
                ln = len(data)
                pos = acc = n = 0
                preds = [0] * len(comps)
            for ci, (dlut, alut, nblk, cd, sp) in enumerate(comp_meta):
                pred = preds[ci]
                for _ in range(nblk):
                    # ---- DC: huff(dlut) ----
                    while n < 16 and pos < ln:
                        acc = (acc << 8) | data[pos]
                        pos += 1
                        n += 8
                    e = dlut[(acc >> (n - 16)) & 0xFFFF] if n >= 16 else \
                        dlut[(acc << (16 - n)) & 0xFFFF]
                    length = e >> 8
                    if length == 0:
                        raise ValueError("invalid Huffman code in scan")
                    if length > n:
                        raise ValueError("truncated entropy-coded segment")
                    n -= length
                    acc &= (1 << n) - 1
                    size = e & 0xFF
                    if size > 11:
                        raise ValueError(
                            f"invalid DC magnitude category {size}"
                        )
                    if size:
                        while n < size:
                            if pos >= ln:
                                raise ValueError(
                                    "truncated entropy-coded segment"
                                )
                            acc = (acc << 8) | data[pos]
                            pos += 1
                            n += 8
                        n -= size
                        v = (acc >> n) & ((1 << size) - 1)
                        acc &= (1 << n) - 1
                        pred += v if v >= (1 << (size - 1)) else \
                            v - (1 << size) + 1
                    # ---- ACs: run-length loop over huff(alut) ----
                    b = len(cd)
                    k = 1
                    while k < 64:
                        while n < 16 and pos < ln:
                            acc = (acc << 8) | data[pos]
                            pos += 1
                            n += 8
                        e = alut[(acc >> (n - 16)) & 0xFFFF] if n >= 16 \
                            else alut[(acc << (16 - n)) & 0xFFFF]
                        length = e >> 8
                        if length == 0:
                            raise ValueError("invalid Huffman code in scan")
                        if length > n:
                            raise ValueError(
                                "truncated entropy-coded segment"
                            )
                        n -= length
                        acc &= (1 << n) - 1
                        rs = e & 0xFF
                        size = rs & 0x0F
                        if size == 0:
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += rs >> 4
                        if k >= 64:
                            raise ValueError("AC run past end of block")
                        while n < size:
                            if pos >= ln:
                                raise ValueError(
                                    "truncated entropy-coded segment"
                                )
                            acc = (acc << 8) | data[pos]
                            pos += 1
                            n += 8
                        n -= size
                        v = (acc >> n) & ((1 << size) - 1)
                        acc &= (1 << n) - 1
                        sp.append((
                            b, k,
                            v if v >= (1 << (size - 1))
                            else v - (1 << size) + 1,
                        ))
                        k += 1
                    cd.append(pred)
                preds[ci] = pred
            n_mcu += 1
    return dcs, sparse, end_pos


def _scan_planes(comps, qts, dcs, sparse, mcus_x, mcus_y):
    """Scatter scan-order blocks into row-major grids, dequantize,
    dezigzag and IDCT per component. Components where EVERY block is
    DC-only (the flat-block exact domain, and common in real images)
    skip the matmul IDCT: a DC-only block is spatially constant at
    ((M00*dcq)*M00) — the same left-associated float product the
    matmul computes — so the plane is one rint/clip over the block
    grid plus an 8x repeat."""
    planes = []
    m00 = _DCT_M[0, 0]
    for ci, (_, hi, vi, tq, _, _) in enumerate(comps):
        nby, nbx = mcus_y * vi, mcus_x * hi
        if (hi, vi) == (1, 1):
            pos = None  # one block per MCU: scan order IS row-major
        else:
            # multi-block MCUs: scan order walks (by, bx) inside each
            # MCU, row-major does not — scatter via index math (cached
            # by grid geometry; rebuilding the 4-way broadcast costs
            # ~10 us per component per image)
            pkey = (mcus_y, mcus_x, vi, hi)
            pos = _POS_CACHE.get(pkey)
            if pos is None:
                myi = np.arange(mcus_y)[:, None, None, None]
                mxi = np.arange(mcus_x)[None, :, None, None]
                byi = np.arange(vi)[None, None, :, None]
                bxi = np.arange(hi)[None, None, None, :]
                pos = ((myi * vi + byi) * nbx + mxi * hi + bxi).ravel()
                if len(_POS_CACHE) < 256:
                    _POS_CACHE[pkey] = pos
        qt = qts[tq]
        if not sparse[ci]:
            if nby * nbx <= 64:  # tiny grid: pure-Python DC path
                if pos is None:
                    dc_rm = dcs[ci]
                else:
                    pl = pos.tolist()
                    dc_rm = [0] * (nby * nbx)
                    for i, v in enumerate(dcs[ci]):
                        dc_rm[pl[i]] = v
                planes.append(_dc_only_plane(dc_rm, int(qt[0]), nby, nbx))
                continue
            dc_scan = np.asarray(dcs[ci], dtype=np.int64)
            dc_rm = dc_scan if pos is None else np.empty_like(dc_scan)
            if pos is not None:
                dc_rm[pos] = dc_scan
            dcq = (dc_rm * qt[0]).astype(np.float64)
            spat = np.clip(np.rint((m00 * dcq) * m00) + 128, 0, 255)
            blkmap = spat.astype(np.uint8).reshape(nby, nbx)
            plane = np.repeat(np.repeat(blkmap, 8, axis=0), 8, axis=1)
            planes.append(plane)
            continue
        dc_scan = np.asarray(dcs[ci], dtype=np.int64)
        flat = np.zeros((nby * nbx, 64), dtype=np.int64)
        rows = pos if pos is not None else slice(None)
        flat[rows, 0] = dc_scan
        if pos is None:
            for b, k, v in sparse[ci]:
                flat[b, k] = v
        else:
            for b, k, v in sparse[ci]:
                flat[pos[b], k] = v
        deq = flat * qt[ZIGZAG][None, :]
        coef = deq[:, _UNZIGZAG].reshape(nby, nbx, 8, 8)
        spat = _idct_blocks(coef)
        plane = spat.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        planes.append(plane)
    return planes


def _dc_only_plane(dc_rm, qt0, nby, nbx):
    """Spatial plane for a DC-only component from ROW-MAJOR dc values
    (Python ints). A DC-only block is constant at rint((M00*dcq)*M00)+128
    — identical float ops to the numpy formulation (Python floats are
    the same IEEE doubles, round() is the same half-even rule), but for
    the tiny grids of thumbnail-class images the ~12 ufunc calls of the
    array version cost more than the arithmetic, so small grids run as
    a plain Python loop into one frombuffer."""
    if nby * nbx <= 64:
        m00 = _M00_F
        vals = bytearray(nby * nbx)
        for i, dc in enumerate(dc_rm):
            v = int(round((m00 * (dc * qt0)) * m00)) + 128
            vals[i] = 0 if v < 0 else 255 if v > 255 else v
        blkmap = np.frombuffer(bytes(vals), dtype=np.uint8).reshape(nby, nbx)
    else:
        dcq = (np.asarray(dc_rm, dtype=np.int64) * qt0).astype(np.float64)
        m00 = _DCT_M[0, 0]
        spat = np.clip(np.rint((m00 * dcq) * m00) + 128, 0, 255)
        blkmap = spat.astype(np.uint8).reshape(nby, nbx)
    return np.repeat(np.repeat(blkmap, 8, axis=0), 8, axis=1)


def _comp_block_dims(frame, ci):
    """A component's OWN block-grid size (cbh, cbw) — the traversal
    domain of non-interleaved progressive scans (T.81 A.2.2: ceil of
    the component's sample dimensions over 8)."""
    fh, fw, comps = frame
    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    _, hi, vi, _, _, _ = comps[ci]
    cw = (fw * hi + max_h - 1) // max_h
    ch = (fh * vi + max_v - 1) // max_v
    return (ch + 7) // 8, (cw + 7) // 8


def _decode_scan_progressive(
    payload, start, frame, scan_sel, ss, se, ah, al, ri, grids, huffs
):
    """One progressive (SOF2) scan: accumulate coefficient bits into
    `grids` (zigzag order, natural block positions) per T.81 G.2 —
    DC first/refinement scans (interleaved or single-component), AC
    first/refinement scans (single-component, EOB-run coded). Returns
    the payload position after the scan."""
    fh, fw, comps = frame
    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    mcus_x = (fw + 8 * max_h - 1) // (8 * max_h)
    mcus_y = (fh + 8 * max_v - 1) // (8 * max_v)
    if not (0 <= ss <= se <= 63):
        raise ValueError(f"invalid spectral selection {ss}..{se}")
    if ah and ah != al + 1:
        raise ValueError(f"invalid successive approximation Ah={ah} Al={al}")
    segments, end_pos = _split_segments(payload, start)
    seg_i = 0
    br = _BitReader(segments[0])

    def _restart(n_units):
        nonlocal seg_i, br
        if ri and n_units and n_units % ri == 0:
            seg_i += 1
            if seg_i >= len(segments):
                raise ValueError("missing restart segment")
            br = _BitReader(segments[seg_i])
            return True
        return False

    if ss == 0:  # DC scan
        if se != 0:
            raise ValueError("progressive DC scan with Se != 0")
        dtabs = {}
        for ci in scan_sel:
            td = comps[ci][4]
            if ah == 0:
                if (0, td) not in huffs:
                    raise ValueError("missing Huffman table for scan")
                dtabs[ci] = huffs[(0, td)]
        preds = {ci: 0 for ci in scan_sel}
        interleaved = len(scan_sel) > 1

        def dc_block(ci, by, bx):
            blk = grids[ci][by][bx]
            if ah == 0:  # first scan: DIFF of (DC >> Al)
                size = br.huff(dtabs[ci])
                if size > 11:
                    raise ValueError(f"invalid DC magnitude category {size}")
                preds[ci] += _extend(br.bits(size), size)
                blk[0] = preds[ci] << al
            else:  # refinement: one bit
                if br.bits(1):
                    blk[0] |= 1 << al

        if interleaved:
            n_mcu = 0
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    if _restart(n_mcu):
                        for ci in scan_sel:
                            preds[ci] = 0
                    for ci in scan_sel:
                        _, hi, vi, _, _, _ = comps[ci]
                        for by in range(vi):
                            for bx in range(hi):
                                dc_block(ci, my * vi + by, mx * hi + bx)
                    n_mcu += 1
        else:
            ci = scan_sel[0]
            cbh, cbw = _comp_block_dims(frame, ci)
            n_blk = 0
            for by in range(cbh):
                for bx in range(cbw):
                    if _restart(n_blk):
                        preds[ci] = 0
                    dc_block(ci, by, bx)
                    n_blk += 1
        return end_pos

    # AC scan: single component only (T.81 G.1.1.1.1)
    if len(scan_sel) != 1:
        raise ValueError("progressive AC scan must be single-component")
    ci = scan_sel[0]
    ta = comps[ci][5]
    if (1, ta) not in huffs:
        raise ValueError("missing Huffman table for scan")
    act = huffs[(1, ta)]
    cbh, cbw = _comp_block_dims(frame, ci)
    grid = grids[ci]
    eobrun = 0
    p1 = 1 << al
    m1 = -p1
    n_blk = 0
    for by in range(cbh):
        for bx in range(cbw):
            if _restart(n_blk):
                eobrun = 0
            n_blk += 1
            blk = grid[by][bx]
            if ah == 0:  # AC first scan
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = br.huff(act)
                    r, size = rs >> 4, rs & 0x0F
                    if size == 0:
                        if r == 15:  # ZRL
                            k += 16
                            continue
                        eobrun = (1 << r) - 1  # EOBn: this block + n-1
                        if r:
                            eobrun += br.bits(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError("AC run past spectral band")
                    blk[k] = _extend(br.bits(size), size) << al
                    k += 1
            else:  # AC refinement scan (T.81 G.1.2.3 / libjpeg shape)
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = br.huff(act)
                        r, size = rs >> 4, rs & 0x0F
                        val = 0
                        if size == 0:
                            if r != 15:  # EOBn
                                eobrun = 1 << r
                                if r:
                                    eobrun += br.bits(r)
                                break
                            # r == 15: advance over 16 zero-history slots
                        else:
                            if size != 1:
                                raise ValueError(
                                    "AC refinement magnitude must be 1"
                                )
                            val = p1 if br.bits(1) else m1
                        while k <= se:
                            c = blk[k]
                            if c != 0:
                                # correction bit for already-nonzero coef
                                if br.bits(1) and (c & p1) == 0:
                                    blk[k] = c + (p1 if c > 0 else m1)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if val:
                            if k > se:
                                raise ValueError("AC run past spectral band")
                            blk[k] = val
                        k += 1
                if eobrun > 0:
                    # EOB span: correction bits still arrive for the
                    # remaining nonzero-history coefficients
                    while k <= se:
                        c = blk[k]
                        if c != 0:
                            if br.bits(1) and (c & p1) == 0:
                                blk[k] = c + (p1 if c > 0 else m1)
                        k += 1
                    eobrun -= 1
    return end_pos


def _dense_planes(comps, grids, qts):
    """Dequantize + dezigzag + IDCT dense per-component block grids
    (the progressive accumulators) into spatial planes. Components
    where EVERY block is DC-only (flat-block exact domain; common in
    real images' chroma) skip the matmul IDCT — a DC-only block is
    spatially constant at (M00*dcq)*M00, the same left-associated
    product the matmul computes (mirrors _decode_scan's fast path)."""
    planes = []
    m00 = _DCT_M[0, 0]
    for ci, (_, hi, vi, tq, _, _) in enumerate(comps):
        # the scan loops accumulate into nested Python lists (scalar
        # indexing dominates there); densify here — but for tiny grids
        # (thumbnail-class images) walk the blocks in Python instead:
        # the asarray + fancy-index + ufunc chain costs more than the
        # arithmetic it vectorizes
        gl = grids[ci]
        nby, nbx = len(gl), len(gl[0])
        qt = qts[tq]
        if nby * nbx <= 64:
            ac_any = False
            dc_rm = []
            for grow in gl:
                for b in grow:
                    if any(b[1:]):
                        ac_any = True
                        break
                    dc_rm.append(b[0])
                if ac_any:
                    break
            if not ac_any:
                planes.append(_dc_only_plane(dc_rm, int(qt[0]), nby, nbx))
                continue
        g = np.asarray(gl, dtype=np.int64)
        if not g[:, :, 1:].any():
            dcq = (g[:, :, 0] * qt[0]).astype(np.float64)
            spat = np.clip(np.rint((m00 * dcq) * m00) + 128, 0, 255)
            blkmap = spat.astype(np.uint8)
            planes.append(np.repeat(np.repeat(blkmap, 8, axis=0), 8, axis=1))
            continue
        deq = g * qt[ZIGZAG][None, None, :]
        coef = deq[:, :, _UNZIGZAG].reshape(*deq.shape[:2], 8, 8)
        spat = _idct_blocks(coef)
        nby, nbx = spat.shape[:2]
        planes.append(spat.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8))
    return planes


def _assemble(frame, scan):
    """Crop, upsample and color-convert decoded planes."""
    fh, fw, comps = frame
    (planes, (mcus_x, mcus_y, max_h, max_v)) = scan
    out_planes = []
    for ci, (_, hi, vi, tq, _, _) in enumerate(comps):
        cw = (fw * hi + max_h - 1) // max_h
        ch = (fh * vi + max_v - 1) // max_v
        p = planes[ci][:ch, :cw]
        if hi != max_h or vi != max_v:
            p = np.repeat(np.repeat(p, max_v // vi, axis=0), max_h // hi, axis=1)
        out_planes.append(p[:fh, :fw])
    if len(out_planes) == 1:
        return out_planes[0][:, :, None]
    # gray-in-color fast path: Cb=Cr=128 maps to R=G=B=Y EXACTLY under
    # ycbcr_to_rgb_int (all three chroma terms are (128*0+128)>>8 = 0),
    # so replicate Y instead of running the fixed-point conversion —
    # identical bytes, and the common case for gray-valued color JPEGs
    # (the ledger's 4:2:0 arm) and near-gray flat regions
    cb, cr = out_planes[1], out_planes[2]
    if (cb == 128).all() and (cr == 128).all():
        return np.repeat(out_planes[0][:, :, None], 3, axis=-1)
    ycc = np.stack(out_planes, axis=-1)
    return ycbcr_to_rgb_int(ycc)


def synth_jpg_pixels(media_id: int) -> np.ndarray:
    """Grayscale flat-8x8-block image from SQL-expressible closed
    forms: w = 8*(1 + id%3), h = 8*(1 + id%2), block (bx, by) value
    v = (37*id + 11*bx + 23*by) % 256. Flat blocks under QUANT_FLAT are
    the JPEG-exact domain (DC-only, integer-representable), so the
    DuckDB oracle recomputes decoded features exactly — the same
    discipline as the PNG/GIF/AVI synth twins."""
    bw_, bh_ = 1 + media_id % 3, 1 + media_id % 2
    bx = np.arange(bw_, dtype=np.int64)[None, :]
    by = np.arange(bh_, dtype=np.int64)[:, None]
    v = (37 * media_id + 11 * bx + 23 * by) % 256
    return np.repeat(np.repeat(v.astype(np.uint8), 8, axis=0), 8, axis=1)
