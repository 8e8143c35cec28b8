"""FLAC (Free Lossless Audio Codec) — real decode + encode twin,
from the public format spec (RFC 9639 / xiph.org).

FLAC is LOSSLESS integer coding, so unlike JPEG there is no
approximation domain: decode(encode(samples)) == samples exactly for
ANY input, which makes every feature integer-exact and hashable
cross-engine. Implemented from scratch:

- ``flac_bytes``   — encoder: STREAMINFO + frames with fixed
                     predictors (per-frame best of orders 0-2), rice
                     residuals, independent / left-side / right-side /
                     mid-side stereo, 8/16-bit, frame CRC-8/CRC-16 and
                     the STREAMINFO MD5 of the raw samples
- ``decode_flac``  — decoder: metadata-block walk, frame-header parse
                     (UTF-8-style coded numbers, all block-size /
                     sample-rate / sample-size codes), constant /
                     verbatim / fixed(0-4) / LPC subframes, wasted
                     bits, partitioned rice residuals with escape
                     codes, all four stereo decorrelation modes,
                     CRC-8 + CRC-16 + final MD5 verification —
                     malformed streams raise ValueError, never return
                     silently-wrong audio

The reference system has no media code; FLAC belongs to the
training-data-pipeline surface (multimodal audio columns). The
remaining transform codecs (AAC/Vorbis in Ogg, MP3's PCM synthesis)
stay behind multimodal.decode_real's honest NotImplementedError.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_CRC8_TBL = []
for _b in range(256):
    _c = _b
    for _ in range(8):
        _c = ((_c << 1) ^ 0x07) & 0xFF if _c & 0x80 else (_c << 1) & 0xFF
    _CRC8_TBL.append(_c)

_CRC16_TBL = []
for _b in range(256):
    _c = _b << 8
    for _ in range(8):
        _c = ((_c << 1) ^ 0x8005) & 0xFFFF if _c & 0x8000 else (_c << 1) & 0xFFFF
    _CRC16_TBL.append(_c)


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8_TBL[c ^ b]
    return c


# 16-bit-at-a-time CRC-16 table: _CRC16_TBL2[x] advances a 16-bit CRC
# state over two zero data bytes, so pairs of payload bytes fold in one
# lookup (the frame CRC runs over every frame byte — the per-byte loop
# was ~13% of decode_flac)
_CRC16_TBL2 = []
for _x in range(65536):
    _h = _CRC16_TBL[_x >> 8]
    _CRC16_TBL2.append(_CRC16_TBL[((_h >> 8) ^ _x) & 0xFF] ^ ((_h << 8) & 0xFFFF))


def _crc16(data: bytes) -> int:
    c = 0
    n2 = len(data) >> 1
    if n2:
        tbl2 = _CRC16_TBL2
        # one xor + one lookup per big-endian 16-bit word; the word
        # split happens in C (struct), not per-byte Python indexing
        for w in struct.unpack(f">{n2}H", data[:n2 * 2]):
            c = tbl2[c ^ w]
    if len(data) & 1:
        c = _CRC16_TBL[((c >> 8) ^ data[-1]) & 0xFF] ^ ((c << 8) & 0xFFFF)
    return c


# ---------------------------------------------------------------------------
# bit I/O (MSB-first)
# ---------------------------------------------------------------------------

class _Writer:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, v: int, n: int):
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.n += n
        while self.n >= 8:
            self.out.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def unary(self, q: int):
        while q >= 32:
            self.bits(0, 32)
            q -= 32
        self.bits(1, q + 1)  # q zeros then a 1

    def align(self):
        if self.n:
            self.bits(0, 8 - self.n)


class _Reader:
    __slots__ = ("data", "pos", "acc", "n")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def bits(self, n: int) -> int:
        while self.n < n:
            if self.pos >= len(self.data):
                raise ValueError("truncated FLAC bitstream")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.n += 8
        self.n -= n
        v = (self.acc >> self.n) & ((1 << n) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def sbits(self, n: int) -> int:
        v = self.bits(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        """Count leading zeros word-wise (bit_length on the buffered
        window) instead of one bits(1) call per zero — rice decode's
        hottest path."""
        q = 0
        while True:
            if self.n == 0:
                take = min(len(self.data) - self.pos, 8)
                if take == 0:
                    raise ValueError("truncated FLAC bitstream")
                self.acc = int.from_bytes(
                    self.data[self.pos:self.pos + take], "big"
                )
                self.n = take * 8
                self.pos += take
            if self.acc == 0:
                q += self.n
                self.n = 0
                if q > 1 << 24:
                    raise ValueError("unary run overflow (corrupt rice code)")
                continue
            bl = self.acc.bit_length()
            q += self.n - bl
            self.n = bl - 1
            self.acc &= (1 << self.n) - 1
            return q

    def align(self):
        # advance to the next STREAM byte boundary, giving back whole
        # buffered bytes (bulk refills may buffer up to 63 bits)
        consumed = self.pos * 8 - self.n
        self.pos = (consumed + 7) // 8
        self.n = 0
        self.acc = 0

    def byte_pos(self) -> int:
        if self.n % 8:
            raise ValueError("reader not byte-aligned")
        return self.pos - self.n // 8


# ---------------------------------------------------------------------------
# rice coding
# ---------------------------------------------------------------------------

def _zigzag(v: np.ndarray) -> np.ndarray:
    return np.where(v >= 0, v << 1, ((-v) << 1) - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


def _rice_write(w: _Writer, res: np.ndarray, param: int):
    """Vectorized rice WRITE (r9): unlike the decode side — where every
    sample's position depends on the previous one — the write side
    knows every bit position upfront (cumsum of per-sample code
    lengths), so the whole residual partition scatters into one bit
    array and packs with np.packbits. Byte-identical to the per-sample
    unary+bits loop (kept below as the pathological-quotient fallback);
    the loop was ~27 s cum of the sf1 media build's 210 s CPU."""
    n = len(res)
    if n == 0:
        return
    u = _zigzag(res.astype(np.int64))
    q = u >> param
    nbits = q + 1 + param
    total = int(nbits.sum())
    if total > (1 << 26):  # degenerate residuals: bound the bit array
        for uu in u:
            uu = int(uu)
            w.unary(uu >> param)
            if param:
                w.bits(uu & ((1 << param) - 1), param)
        return
    pend = w.n  # _Writer.bits flushes at 8, so 0..7 pending bits
    bits = np.zeros(pend + total, dtype=np.uint8)
    for i in range(pend):
        bits[i] = (w.acc >> (pend - 1 - i)) & 1
    ends = np.cumsum(nbits)
    seps = pend + ends - (1 + param)  # the '1' terminating each unary run
    bits[seps] = 1
    if param:
        rem_pos = seps[:, None] + 1 + np.arange(param)[None, :]
        rem_bits = (u[:, None] >> np.arange(param - 1, -1, -1)[None, :]) & 1
        bits[rem_pos.ravel()] = rem_bits.ravel().astype(np.uint8)
    nb_total = pend + total
    full = nb_total >> 3
    w.out += np.packbits(bits[: full * 8]).tobytes()
    acc = 0
    for b in bits[full * 8:]:
        acc = (acc << 1) | int(b)
    w.acc = acc
    w.n = nb_total & 7


def _rice_scalar(r: _Reader, n: int, param: int) -> list[int]:
    """Inlined unary+remainder loop over local variables — the method
    dispatch per sample was ~3x the arithmetic."""
    data, pos, acc, nb = r.data, r.pos, r.acc, r.n
    ln = len(data)
    mask_p = (1 << param) - 1
    out = []
    append = out.append
    for _ in range(n):
        q = 0
        while True:  # unary: count leading zeros word-wise
            if nb == 0:
                take = min(ln - pos, 8)
                if take == 0:
                    raise ValueError("truncated FLAC bitstream")
                acc = int.from_bytes(data[pos:pos + take], "big")
                nb = take * 8
                pos += take
            if acc == 0:
                q += nb
                nb = 0
                if q > 1 << 24:
                    raise ValueError("unary run overflow (corrupt rice code)")
                continue
            bl = acc.bit_length()
            q += nb - bl
            nb = bl - 1
            acc &= (1 << nb) - 1
            break
        if param:
            while nb < param:
                if pos >= ln:
                    raise ValueError("truncated FLAC bitstream")
                acc = (acc << 8) | data[pos]
                pos += 1
                nb += 8
            nb -= param
            u = (q << param) | ((acc >> nb) & mask_p)
            acc &= (1 << nb) - 1
        else:
            u = q
        append((u >> 1) if (u & 1) == 0 else -((u + 1) >> 1))
    r.pos, r.acc, r.n = pos, acc, nb
    return out


def _rice_read(r: _Reader, n: int, param: int) -> list[int]:
    """Rice decode via _rice_scalar. Two vectorized formulations were
    measured SLOWER: r8's unpackbits + per-bit separator walk, and
    r9's set-bit-positions + C-bisect terminator chase with batch
    quotient/remainder extraction (scalar 21/57/240 us vs numpy
    35/74/274 at n=64/128/512 — the scalar loop's ~0.4 us/sample beats
    per-sample bisect plus the unpack/gather overhead at every
    realistic partition size)."""
    return _rice_scalar(r, n, param)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _best_fixed_order(x: np.ndarray) -> int:
    best, best_cost = 0, None
    r = x.astype(np.int64)
    for order in (0, 1, 2):
        if len(x) <= order:
            break
        cost = int(np.abs(r).sum())
        if best_cost is None or cost < best_cost:
            best, best_cost = order, cost
        r = np.diff(r)
    return best


def _rice_param_for(res: np.ndarray) -> int:
    if len(res) == 0:
        return 0
    mean = float(np.abs(res.astype(np.int64)).mean())
    p = 0
    while (1 << p) < mean + 1 and p < 14:
        p += 1
    return p


def _encode_subframe(w: _Writer, x: np.ndarray, bps: int):
    x64 = x.astype(np.int64)
    if len(x64) and (x64 == x64[0]).all():
        w.bits(0, 1)  # zero bit
        w.bits(0b000000, 6)  # constant
        w.bits(0, 1)  # no wasted bits
        w.bits(int(x64[0]) & ((1 << bps) - 1), bps)
        return
    order = _best_fixed_order(x64)
    w.bits(0, 1)
    w.bits(0b001000 | order, 6)  # fixed, order
    w.bits(0, 1)  # no wasted bits
    for i in range(order):
        w.bits(int(x64[i]) & ((1 << bps) - 1), bps)
    res = x64.copy()
    for _ in range(order):
        res = np.diff(res)
    param = _rice_param_for(res)
    w.bits(0b00, 2)  # residual method: 4-bit rice
    w.bits(0, 4)  # partition order 0
    w.bits(param, 4)
    _rice_write(w, res, param)


def _utf8_number(n: int) -> bytes:
    """FLAC's UTF-8-style coded number (frame/sample index)."""
    if n < 0x80:
        return bytes([n])
    cap = {2: 11, 3: 16, 4: 21, 5: 26, 6: 31, 7: 36}
    nbytes = 2
    while n >= (1 << cap[nbytes]):
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out = [(lead | (n >> shift)) & 0xFF]
    for _ in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


#: (code, field_bits) for the block sizes the encoder emits
_SR_CODES = {88200: 0x1, 176400: 0x2, 192000: 0x3, 8000: 0x4, 16000: 0x5,
             22050: 0x6, 24000: 0x7, 32000: 0x8, 44100: 0x9, 48000: 0xA,
             96000: 0xB}


def flac_bytes(
    samples, sample_rate: int = 8000, bps: int = 16,
    block_size: int = 256, stereo_mode: str = "independent",
) -> bytes:
    """Encode int PCM as a real FLAC stream. samples: (n,) mono or
    (n, 2) stereo int16-range array. stereo_mode: 'independent',
    'left-side', 'right-side' or 'mid-side' (decorrelation — exactly
    invertible, exercised by the decoder's four reconstruction
    paths)."""
    s = np.asarray(samples, dtype=np.int64)
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2 or s.shape[1] not in (1, 2):
        raise ValueError(f"expected (n,) or (n, 2) samples, got {s.shape}")
    if bps not in (8, 16):
        raise ValueError("encoder supports 8/16 bits per sample")
    nch = s.shape[1]
    n = s.shape[0]
    if stereo_mode != "independent" and nch != 2:
        raise ValueError("stereo_mode needs 2 channels")

    md5 = hashlib.md5()
    if bps == 16:
        md5.update(s.astype("<i2").tobytes())
    else:
        md5.update((s & 0xFF).astype(np.uint8).tobytes())

    out = bytearray(b"fLaC")
    info = _Writer()
    info.bits(block_size, 16)
    info.bits(block_size, 16)
    info.bits(0, 24)  # min frame size unknown
    info.bits(0, 24)
    info.bits(sample_rate, 20)
    info.bits(nch - 1, 3)
    info.bits(bps - 1, 5)
    info.bits(n, 36)
    body = bytes(info.out) + md5.digest()
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body  # last block

    for fi, start in enumerate(range(0, n, block_size)):
        blk = s[start:start + block_size]
        bs = blk.shape[0]
        hdr = _Writer()
        hdr.bits(0b11111111111110, 14)
        hdr.bits(0, 1)  # reserved
        hdr.bits(0, 1)  # fixed blocksize strategy
        if bs == block_size and bs in (192, 576, 1152, 2304, 4608, 256, 512,
                                       1024, 2048, 4096, 8192, 16384, 32768):
            if bs == 192:
                bs_code, bs_extra = 1, None
            elif bs in (576, 1152, 2304, 4608):
                bs_code, bs_extra = 2 + (576, 1152, 2304, 4608).index(bs), None
            else:
                bs_code = 8 + (256, 512, 1024, 2048, 4096, 8192, 16384,
                               32768).index(bs)
                bs_extra = None
        else:
            bs_code, bs_extra = 0b0111, bs - 1  # 16-bit field follows
        hdr.bits(bs_code, 4)
        sr_code = _SR_CODES.get(sample_rate, 0)
        hdr.bits(sr_code, 4)
        if stereo_mode == "independent":
            ch_code = nch - 1
        else:
            ch_code = {"left-side": 0b1000, "right-side": 0b1001,
                       "mid-side": 0b1010}[stereo_mode]
        hdr.bits(ch_code, 4)
        hdr.bits({8: 0b001, 16: 0b100}[bps], 3)
        hdr.bits(0, 1)  # reserved
        head = bytes(hdr.out) + _utf8_number(fi)
        if bs_extra is not None:
            head += struct.pack(">H", bs_extra)
        head += bytes([_crc8(head)])

        fw = _Writer()
        left = blk[:, 0]
        if nch == 1:
            chans = [(left, bps)]
        elif stereo_mode == "independent":
            chans = [(left, bps), (blk[:, 1], bps)]
        elif stereo_mode == "left-side":
            chans = [(left, bps), (left - blk[:, 1], bps + 1)]
        elif stereo_mode == "right-side":
            chans = [(left - blk[:, 1], bps + 1), (blk[:, 1], bps)]
        else:  # mid-side
            mid = (left + blk[:, 1]) >> 1
            side = left - blk[:, 1]
            chans = [(mid, bps), (side, bps + 1)]
        for cx, cbps in chans:
            _encode_subframe(fw, cx, cbps)
        fw.align()
        frame = head + bytes(fw.out)
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


def synth_flac_samples(media_id: int) -> np.ndarray:
    """Closed-form stereo int16 samples for the ledger arm
    (n = 64 + id % 64):
    ch0[i] = (id*7919 + i*104729) % 65536 - 32768
    ch1[i] = (id*104729 + i*7919) % 65536 - 32768
    — SQL-re-derivable, and ch0 equals the wav arm's formula so the
    two audio paths cross-check."""
    n = 64 + media_id % 64
    i = np.arange(n, dtype=np.int64)
    ch0 = (media_id * 7919 + i * 104729) % 65536 - 32768
    ch1 = (media_id * 104729 + i * 7919) % 65536 - 32768
    return np.stack([ch0, ch1], axis=1)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

_BPS_CODES = {0b001: 8, 0b010: 12, 0b100: 16, 0b101: 20, 0b110: 24, 0b111: 32}
_SR_DECODE = {0x1: 88200, 0x2: 176400, 0x3: 192000, 0x4: 8000, 0x5: 16000,
              0x6: 22050, 0x7: 24000, 0x8: 32000, 0x9: 44100, 0xA: 48000,
              0xB: 96000}


def _read_utf8_number(r: _Reader) -> int:
    first = r.bits(8)
    if first < 0x80:
        return first
    nbytes = 0
    mask = 0x80
    while first & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("invalid coded number")
    v = first & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        b = r.bits(8)
        if (b & 0xC0) != 0x80:
            raise ValueError("invalid coded-number continuation")
        v = (v << 6) | (b & 0x3F)
    return v


def _decode_residuals(r: _Reader, bs: int, order: int) -> list[int]:
    method = r.bits(2)
    if method not in (0, 1):
        raise ValueError(f"reserved residual coding method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    part_order = r.bits(4)
    nparts = 1 << part_order
    if bs % nparts != 0 or (bs >> part_order) <= order:
        if not (part_order == 0 and bs - order >= 0):
            raise ValueError("invalid rice partition order")
    res: list[int] = []
    for p in range(nparts):
        cnt = (bs >> part_order) - (order if p == 0 else 0)
        if cnt < 0:
            raise ValueError("invalid rice partition order")
        param = r.bits(pbits)
        if param == escape:
            nb = r.bits(5)  # verbatim residuals at nb bits
            res.extend(r.sbits(nb) if nb else 0 for _ in range(cnt))
        else:
            res.extend(_rice_read(r, cnt, param))
    return res


def _decode_subframe(r: _Reader, bs: int, bps: int) -> np.ndarray:
    if r.bits(1):
        raise ValueError("subframe sync bit set")
    tp = r.bits(6)
    wasted = 0
    if r.bits(1):  # wasted-bits flag: unary count - 1
        wasted = 1
        while r.bits(1) == 0:
            wasted += 1
    ebps = bps - wasted
    if tp == 0b000000:  # constant
        v = r.bits(ebps)
        if v >= 1 << (ebps - 1):
            v -= 1 << ebps
        out = np.full(bs, v, dtype=np.int64)
    elif tp == 0b000001:  # verbatim
        out = np.array([r.sbits(ebps) for _ in range(bs)], dtype=np.int64)
    elif 0b001000 <= tp <= 0b001100:  # fixed order 0-4
        order = tp & 0x07
        warm = [r.sbits(ebps) for _ in range(order)]
        res = _decode_residuals(r, bs, order)
        # a fixed predictor of order k makes the residual the k-th
        # forward difference, so reconstruction is k iterated cumsums
        # seeded by the warmup differences — vectorized, not a Python
        # loop per sample
        if order == 0:
            out = np.asarray(res, dtype=np.int64)
        else:
            diffs = [np.asarray(warm, dtype=np.int64)]
            for _ in range(order - 1):
                diffs.append(np.diff(diffs[-1]))
            arr = np.asarray(res, dtype=np.int64)
            for k in range(order, 0, -1):
                seed = int(diffs[k - 1][0])
                arr = np.concatenate(([seed], seed + np.cumsum(arr)))
            out = arr
    elif tp >= 0b100000:  # LPC, order = (tp & 31) + 1
        order = (tp & 0x1F) + 1
        warm = [r.sbits(ebps) for _ in range(order)]
        prec = r.bits(4)
        if prec == 0b1111:
            raise ValueError("invalid LPC precision code")
        prec += 1
        shift = r.bits(5)
        if shift >= 1 << 4:
            shift -= 1 << 5  # signed; negative shifts are invalid
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [r.sbits(prec) for _ in range(order)]
        res = _decode_residuals(r, bs, order)
        out = np.empty(bs, dtype=np.int64)
        out[:order] = warm
        for i in range(order, bs):
            acc = 0
            for j, c in enumerate(coefs):
                acc += c * int(out[i - 1 - j])
            out[i] = (acc >> shift) + res[i - order]
    else:
        raise ValueError(f"reserved subframe type {tp:06b}")
    return out << wasted if wasted else out


def decode_flac(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode a FLAC stream -> (sample_rate, samples (n, channels)
    int32). Verifies frame-header CRC-8, frame CRC-16, and the
    STREAMINFO MD5 of the decoded audio; every malformed construct
    raises ValueError."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("truncated metadata block header")
        hdr = payload[pos]
        blen = int.from_bytes(payload[pos + 1:pos + 4], "big")
        btype = hdr & 0x7F
        last = bool(hdr & 0x80)
        body = payload[pos + 4:pos + 4 + blen]
        if len(body) != blen:
            raise ValueError("truncated metadata block")
        if btype == 0:
            if blen != 34:
                raise ValueError("bad STREAMINFO length")
            r = _Reader(body)
            r.bits(16)
            max_bs = r.bits(16)
            r.bits(24)
            r.bits(24)
            sr = r.bits(20)
            nch = r.bits(3) + 1
            bps = r.bits(5) + 1
            total = r.bits(36)
            md5 = body[18:34]
            streaminfo = (sr, nch, bps, total, md5, max_bs)
        elif btype == 127:
            raise ValueError("invalid metadata block type 127")
        pos += 4 + blen
        if last:
            break
    if streaminfo is None:
        raise ValueError("missing STREAMINFO")
    sr, nch, bps, total, md5_want, _ = streaminfo
    if sr == 0 or nch < 1 or bps < 4:
        raise ValueError("invalid STREAMINFO parameters")

    chans_all: list[list[np.ndarray]] = []
    got = 0
    while pos < len(payload) and (total == 0 or got < total):
        fstart = pos
        r = _Reader(payload, pos)
        if r.bits(14) != 0b11111111111110:
            raise ValueError(f"lost frame sync at byte {fstart}")
        r.bits(1)
        r.bits(1)  # blocking strategy
        bs_code = r.bits(4)
        sr_code = r.bits(4)
        ch_code = r.bits(4)
        bps_code = r.bits(3)
        if r.bits(1):
            raise ValueError("frame header reserved bit set")
        _read_utf8_number(r)
        if bs_code == 0:
            raise ValueError("reserved block size code")
        elif bs_code == 1:
            bs = 192
        elif bs_code <= 5:
            bs = 576 << (bs_code - 2)
        elif bs_code == 6:
            bs = r.bits(8) + 1
        elif bs_code == 7:
            bs = r.bits(16) + 1
        else:
            bs = 256 << (bs_code - 8)
        if sr_code == 0:
            fsr = sr
        elif sr_code in _SR_DECODE:
            fsr = _SR_DECODE[sr_code]
        elif sr_code == 0xC:
            fsr = r.bits(8) * 1000
        elif sr_code == 0xD:
            fsr = r.bits(16)
        elif sr_code == 0xE:
            fsr = r.bits(16) * 10
        else:
            raise ValueError("invalid sample rate code")
        if fsr != sr:
            raise ValueError("frame sample rate differs from STREAMINFO")
        if bps_code == 0:
            fbps = bps
        elif bps_code in _BPS_CODES:
            fbps = _BPS_CODES[bps_code]
        else:
            raise ValueError("reserved sample size code")
        if fbps != bps:
            raise ValueError("frame bit depth differs from STREAMINFO")
        head_end = r.byte_pos()
        if head_end >= len(payload):
            raise ValueError("truncated frame header (missing CRC-8)")
        if _crc8(payload[fstart:head_end]) != payload[head_end]:
            raise ValueError("frame header CRC-8 mismatch")
        r = _Reader(payload, head_end + 1)

        if ch_code <= 0b0111:
            fnch = ch_code + 1
            if fnch != nch:
                raise ValueError("frame channel count differs from STREAMINFO")
            chans = [_decode_subframe(r, bs, bps) for _ in range(fnch)]
        elif ch_code in (0b1000, 0b1001, 0b1010):
            if nch != 2:
                raise ValueError("stereo decorrelation in non-stereo stream")
            if ch_code == 0b1000:  # left-side
                left = _decode_subframe(r, bs, bps)
                side = _decode_subframe(r, bs, bps + 1)
                chans = [left, left - side]
            elif ch_code == 0b1001:  # right-side
                side = _decode_subframe(r, bs, bps + 1)
                right = _decode_subframe(r, bs, bps)
                chans = [right + side, right]
            else:  # mid-side: l+r = (mid<<1)|(side&1), side = l-r
                mid = _decode_subframe(r, bs, bps)
                side = _decode_subframe(r, bs, bps + 1)
                left = (((mid << 1) | (side & 1)) + side) >> 1
                chans = [left, left - side]
        else:
            raise ValueError("reserved channel assignment")
        r.align()
        fend = r.byte_pos()
        if fend + 2 > len(payload):
            raise ValueError("truncated frame footer")
        want = struct.unpack(">H", payload[fend:fend + 2])[0]
        if _crc16(payload[fstart:fend]) != want:
            raise ValueError("frame CRC-16 mismatch")
        pos = fend + 2
        chans_all.append(chans)
        got += bs
    if total and got != total:
        raise ValueError("decoded sample count differs from STREAMINFO")
    if not chans_all:
        raise ValueError("no FLAC frames")
    samples = np.concatenate(
        [np.stack(ch, axis=1) for ch in chans_all], axis=0
    ).astype(np.int64)
    md5 = hashlib.md5()
    if bps == 16:
        md5.update(samples.astype("<i2").tobytes())
    elif bps == 8:
        md5.update((samples & 0xFF).astype(np.uint8).tobytes())
    else:
        md5 = None  # other depths: skip audio-MD5 verification
    if md5 is not None and md5_want != b"\x00" * 16 and md5.digest() != md5_want:
        raise ValueError("decoded audio MD5 mismatch")
    return sr, samples.astype(np.int32)
