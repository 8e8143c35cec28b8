"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real pipelines store image/audio/video as `binary` columns with a
metadata struct, and run decode / feature-extraction as Arrow-batched
Pandas UDFs over `mapInPandas`.

Decode is REAL for every container format a numpy+stdlib environment
can parse byte-for-byte:
- WAV / RIFF PCM (8- and 16-bit): full chunk walk (`decode_wav`)
- BMP, 24bpp uncompressed, bottom-up or top-down (`decode_bmp`)
- PNG, 8-bit non-interlaced, all five color types (gray / RGB /
  palette-through-PLTE / gray+alpha / RGBA): CRC-checked chunk walk,
  stdlib-zlib IDAT inflate, all five scanline filters reversed
  (`decode_png`)
- GIF 87a/89a, single- AND multi-frame: full block walk (extensions
  skipped by sub-block length, global/local color tables),
  from-scratch LZW decode (variable code widths, cScSc case,
  dictionary resets), 4-pass de-interlacing (`decode_gif` /
  `gif_frames`; partial-canvas animation patches are refused, not
  silently mis-decoded)
- AVI (RIFF): hdrl/strl/movi walk, fps from strh; uncompressed 24bpp
  DIB video (bottom-up/top-down BGR stride decode) AND MJPEG streams
  (one real baseline JPEG per frame chunk, decoded through
  `jpeg.decode_jpeg`) — `decode_avi`; real video frame sampling via
  `video_frame_features`
- JPEG baseline (SOF0), from-scratch Huffman + dequant + IDCT +
  YCbCr->RGB, grayscale and 4:4:4/4:2:2/4:2:0 color, restart markers
  plus PROGRESSIVE (SOF2) — spectral selection, successive
  approximation, EOB-run coding — with a from-scratch encode twin
  (`jpeg.decode_jpeg`, re-exported here; extended/arithmetic raise)
- MP3: a REAL MPEG-1/2 audio frame-header walk (`mpeg_audio`) — sync
  validation, bitrate/sample-rate tables, exact frame stepping, ID3v2/
  ID3v1 skip — yielding the frame-count/bitrate/duration metadata a
  corpus pipeline extracts without decoding audio
Codecs needing licensed/stateful transform decoders beyond that
(FLAC/AAC/H.264, MP3's PCM synthesis...) require ffmpeg, which is NOT
in this container — `decode_real` stays the honestly-labeled
NotImplementedError hook for those, and `media_decode_features` routes
unknown magic bytes there (or to an `error` row under the production
`on_error='null'` policy, so one corrupt file cannot kill a 100 TB
job).

`_decode_batch` (byte statistics) remains the codec-agnostic fake used
where tests need a payload-independent feature contract.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("byte_sum", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("first_byte", T.IntegerType()),
    ]
)


def byte_stats(payloads):
    """Vectorized per-payload byte statistics over a batch: returns
    (lens, sums, firsts) int64 arrays. One concatenated buffer + ONE
    reduceat over the starts of the NON-EMPTY payloads — empty/null
    segments never enter the index list, so they can't truncate a
    neighbor's segment (offset-clipping corrupted the LAST non-empty
    payload when a batch ended with empties)."""
    import numpy as np

    ps = [p if p is not None else b"" for p in payloads]
    lens = np.fromiter((len(p) for p in ps), dtype=np.int64, count=len(ps))
    sums = np.zeros(len(ps), dtype=np.int64)
    firsts = np.full(len(ps), -1, dtype=np.int64)
    nz = lens > 0
    if nz.any():
        buf = np.frombuffer(b"".join(ps), dtype=np.uint8)
        offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))
        starts = offsets[nz]  # strictly increasing, every one < len(buf)
        # dtype=int64 makes reduceat ACCUMULATE in int64 over the uint8
        # view directly — no 8x materialized copy of the batch buffer
        sums[nz] = np.add.reduceat(buf, starts, dtype=np.int64)
        firsts[nz] = buf[starts]
    return lens, sums, firsts


def decode_real(payload: bytes) -> bytes:  # pragma: no cover
    """Production decode hook for codecs needing licensed/stateful
    transform decoders (Ogg/Vorbis, AAC, H.264, and MP3's PCM
    synthesis) — requires ffmpeg, absent here. WAV, BMP, PNG, GIF,
    AVI, baseline+progressive JPEG and FLAC decode ARE implemented
    (decode_wav / decode_bmp / decode_png / decode_gif / decode_avi /
    decode_jpeg / flac.decode_flac), and MP3 gets a REAL frame-header
    walk for metadata (mpeg_audio.mp3_features) — only its audio
    transform stays behind this hook."""
    raise NotImplementedError("compressed-media decode libs not available in this environment")


# ---------------------------------------------------------------------------
# real decoders (numpy-only): RIFF/WAV PCM and BMP 24bpp
# ---------------------------------------------------------------------------

def wav_bytes(samples, sample_rate: int = 8000, channels: int = 1) -> bytes:
    """Encode int16 PCM samples as a canonical RIFF/WAV byte payload."""
    import struct

    import numpy as np

    s = np.asarray(samples, dtype="<i2")
    data = s.tobytes()
    block_align = channels * 2
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, channels, sample_rate,
        sample_rate * block_align, block_align, 16,
    )
    body = b"WAVE" + fmt + struct.pack("<4sI", b"data", len(data)) + data
    if len(data) % 2:
        body += b"\x00"  # RIFF chunks are word-aligned
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def decode_wav(payload: bytes):
    """Parse a RIFF/WAV payload: returns (sample_rate, channels,
    samples[int16 numpy, interleaved]). Full chunk walk — unknown chunks
    (LIST/INFO/fact...) are skipped with word-alignment padding, exactly
    like a production demuxer. PCM 16-bit and 8-bit (unsigned,
    rebased to signed) supported; anything else raises ValueError."""
    import struct

    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, min(len(payload), 8 + struct.unpack("<I", payload[4:8])[0])
    fmt = data = None
    while pos + 8 <= end:
        cid, size = struct.unpack("<4sI", payload[pos:pos + 8])
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # word-aligned chunk boundaries
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format != 1:
        raise ValueError(f"compressed WAV (format {audio_format}) unsupported")
    if bits == 16:
        samples = np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2")
    elif bits == 8:
        samples = np.frombuffer(data, dtype=np.uint8).astype(np.int16) - 128
    else:
        raise ValueError(f"{bits}-bit PCM unsupported")
    return sample_rate, channels, samples


def bmp_bytes(pixels) -> bytes:
    """Encode an HxWx3 uint8 RGB array as a 24bpp bottom-up BMP."""
    import struct

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape[0], px.shape[1]
    stride = (w * 3 + 3) // 4 * 4
    # whole pixel block in one vectorized write: bottom-up row order,
    # BGR channel order, zero-padded to the 4-byte stride
    block = np.zeros((h, stride), dtype=np.uint8)
    block[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)
    rows = block.tobytes()
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(rows), 0, 0, 14 + 40)
    return header + info + rows


def decode_bmp(payload: bytes):
    """Parse a 24bpp uncompressed BMP into an HxWx3 uint8 RGB array.
    Handles bottom-up (positive height) and top-down (negative) layouts
    and the 4-byte row stride padding; anything compressed or not 24bpp
    raises ValueError."""
    import struct

    import numpy as np

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack("<I", payload[10:14])[0]
    hdr_size, w, h = struct.unpack("<Iii", payload[14:26])
    planes, bpp, compression = struct.unpack("<HHI", payload[26:34])
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    raw = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=data_offset)
    rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


PNG_SIG = b"\x89PNG\r\n\x1a\n"
JPEG_SIG = b"\xff\xd8"

# baseline JPEG codec lives in its own module; re-exported here so the
# media surface (sniff, features, synth twins) stays one import
from grasper_spark.functions.jpeg import (  # noqa: E402,F401
    decode_jpeg,
    jpeg_bytes,
    synth_jpg_pixels,
)


def _paeth_predict(left, up, upleft):
    """Vectorized Paeth predictor (PNG spec §9.4): pick the neighbor
    closest to left + up - upleft, ties resolved left > up > upleft."""
    import numpy as np

    a = left.astype(np.int16)
    b = up.astype(np.int16)
    c = upleft.astype(np.int16)
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft))


ADAM7 = (
    # (x_start, x_step, y_start, y_step) per pass, ITU/W3C PNG spec §8.2
    (0, 8, 0, 8), (4, 8, 0, 8), (0, 4, 4, 8), (2, 4, 0, 4),
    (0, 2, 2, 4), (1, 2, 0, 2), (0, 1, 1, 2),
)


def _filter_scanlines(raw, bpp, filter_seed):
    """Filter an (h, w_bytes) uint8 byte-plane into a PNG scanline
    stream; the filter type cycles (row + filter_seed) % 5 so every
    filter is exercised. `bpp` is the per-pixel byte width (channels x
    bytes-per-sample) — the spec's left/upleft distance."""
    import numpy as np

    h = raw.shape[0]
    stream = bytearray()
    prev = np.zeros(raw.shape[1], dtype=np.uint8)
    for y in range(h):
        line = raw[y]
        # left/upleft neighbors shifted by one PIXEL (bpp bytes); uint8
        # subtraction wraps mod 256, exactly the spec's filter output
        left = np.concatenate([np.zeros(bpp, dtype=np.uint8), line[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, dtype=np.uint8), prev[:-bpp]])
        f = (y + filter_seed) % 5
        if f == 0:
            filt = line
        elif f == 1:
            filt = line - left
        elif f == 2:
            filt = line - prev
        elif f == 3:
            filt = line - ((left.astype(np.int16) + prev.astype(np.int16)) // 2).astype(np.uint8)
        else:
            filt = line - _paeth_predict(left, prev, upleft)
        stream += bytes([f]) + filt.tobytes()
        prev = line
    return stream


def png_bytes(pixels, filter_seed: int = 0, bit_depth: int = 8,
              interlace: bool = False) -> bytes:
    """Encode a pixel array as a real PNG: CRC-checked chunks,
    zlib-compressed IDAT, 8- or 16-bit, optionally Adam7-interlaced.
    Channel count picks the color type: HxW or HxWx1 -> grayscale (0),
    HxWx2 -> gray+alpha (4), HxWx3 -> RGB (2), HxWx4 -> RGBA (6).
    Each scanline's filter type cycles (row + filter_seed) % 5, so a
    payload taller than 4 rows exercises every filter
    (None/Sub/Up/Average/Paeth) through the decoder. 16-bit samples
    are stored big-endian per the spec."""
    import struct
    import zlib

    import numpy as np

    if bit_depth not in (8, 16):
        raise ValueError(f"bit_depth must be 8 or 16, got {bit_depth}")
    px = np.asarray(pixels, dtype=np.uint8 if bit_depth == 8 else np.uint16)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    if ch not in (1, 2, 3, 4):
        raise ValueError(f"expected 1-4 channels, got {ch}")
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    bpp = ch * (bit_depth // 8)

    def byte_plane(sub):
        """(ph, pw, ch) samples -> (ph, pw*bpp) big-endian byte rows."""
        ph, pw = sub.shape[:2]
        if bit_depth == 8:
            return np.ascontiguousarray(sub).reshape(ph, pw * ch)
        be = np.ascontiguousarray(sub.astype(">u2"))
        return np.frombuffer(be.tobytes(), dtype=np.uint8).reshape(ph, pw * bpp)

    stream = bytearray()
    if interlace:
        for x0, xs, y0, ys in ADAM7:
            sub = px[y0::ys, x0::xs]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue  # empty pass contributes no scanlines (spec)
            stream += _filter_scanlines(byte_plane(sub), bpp, filter_seed)
    else:
        stream += _filter_scanlines(byte_plane(px), bpp, filter_seed)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    ihdr = struct.pack(
        ">IIBBBBB", w, h, bit_depth, color_type, 0, 0, 1 if interlace else 0
    )
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(stream)))
        + chunk(b"IEND", b"")
    )


def _unfilter_small(arr, w_bytes, bpp):
    """Pure-Python unfilter for NARROW scanlines (thumbnails, interlace
    passes of tiny images): per-byte int arithmetic on bytearrays beats
    the numpy path ~3x below ~64 bytes/line, where per-op numpy
    dispatch overhead dominates the actual byte work. Bit-identical to
    _unfilter_pass (shared fuzz + roundtrip tests cover both)."""
    import numpy as np

    h = arr.shape[0]
    row = 1 + w_bytes
    data = arr.tobytes()
    recon = np.empty((h, w_bytes), dtype=np.uint8)
    prev = b"\x00" * w_bytes
    for y in range(h):
        off = y * row
        f = data[off]
        line = data[off + 1:off + row]
        cur = bytearray(w_bytes)
        if f == 0:
            cur[:] = line
        elif f == 1:  # Sub
            for x in range(w_bytes):
                a = cur[x - bpp] if x >= bpp else 0
                cur[x] = (line[x] + a) & 0xFF
        elif f == 2:  # Up
            for x in range(w_bytes):
                cur[x] = (line[x] + prev[x]) & 0xFF
        elif f == 3:  # Average
            for x in range(w_bytes):
                a = cur[x - bpp] if x >= bpp else 0
                cur[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(w_bytes):
                a = cur[x - bpp] if x >= bpp else 0
                c = prev[x - bpp] if x >= bpp else 0
                b = prev[x]
                p = a + b - c
                pa = p - a if p >= a else a - p
                pb = p - b if p >= b else b - p
                pc = p - c if p >= c else c - p
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"invalid scanline filter type {f}")
        recon[y] = np.frombuffer(bytes(cur), dtype=np.uint8)
        prev = cur
    return recon


def _unfilter_pass(arr, w_bytes, bpp):
    """Reverse PNG scanline filters over one (interlace) pass.
    arr: (h, 1 + w_bytes) uint8 — filter byte + filtered line per row.
    bpp: per-pixel byte width (the spec's left/upleft distance).
    Returns (h, w_bytes) reconstructed bytes."""
    import numpy as np

    if w_bytes <= 64:
        return _unfilter_small(arr, w_bytes, bpp)
    h = arr.shape[0]
    ftypes, data = arr[:, 0], arr[:, 1:]
    n_px = w_bytes // bpp
    recon = np.zeros((h, w_bytes), dtype=np.uint8)
    prev = np.zeros(w_bytes, dtype=np.uint8)
    for y in range(h):
        f, line = int(ftypes[y]), data[y]
        if f == 0:
            cur = line.copy()
        elif f == 1:  # Sub: recon[x] = filt[x] + recon[x-bpp] == per-lane cumsum mod 256
            cur = (
                line.reshape(n_px, bpp).cumsum(axis=0, dtype=np.int64) % 256
            ).astype(np.uint8).reshape(w_bytes)
        elif f == 2:  # Up: wraps mod 256 in uint8
            cur = line + prev
        elif f == 3:  # Average: true left recurrence -> per-pixel loop
            cur = np.zeros(w_bytes, dtype=np.uint8)
            left = np.zeros(bpp, dtype=np.int16)
            for x in range(n_px):
                sl = slice(x * bpp, (x + 1) * bpp)
                cur[sl] = (
                    line[sl].astype(np.int16)
                    + (left + prev[sl].astype(np.int16)) // 2
                ).astype(np.uint8)
                left = cur[sl].astype(np.int16)
        elif f == 4:  # Paeth: left/upleft recurrence -> per-pixel loop
            cur = np.zeros(w_bytes, dtype=np.uint8)
            left = np.zeros(bpp, dtype=np.uint8)
            upleft = np.zeros(bpp, dtype=np.uint8)
            for x in range(n_px):
                sl = slice(x * bpp, (x + 1) * bpp)
                up = prev[sl]
                cur[sl] = line[sl] + _paeth_predict(left, up, upleft)
                left, upleft = cur[sl], up
        else:
            raise ValueError(f"invalid scanline filter type {f}")
        recon[y] = cur
        prev = cur
    return recon


def decode_png(payload: bytes):
    """Parse an 8- or 16-bit PNG (color types 0 gray / 2 RGB /
    3 palette / 4 gray+alpha / 6 RGBA), non-interlaced OR
    Adam7-interlaced, into an HxWxC array (uint8 for 8-bit, uint16 for
    16-bit; C = 1/3/3/2/4 — palette indices expand through PLTE to
    RGB). Full chunk walk with CRC32 verification, multi-IDAT
    concatenation, stdlib-zlib inflate, and all five scanline filters
    reversed per pass (None/Sub/Up/Average/Paeth — Sub vectorizes as a
    per-lane cumsum; Average/Paeth carry a true left-pixel recurrence,
    so they run a per-pixel loop over bpp-wide lanes). Sub-byte depths
    (1/2/4) raise ValueError, as do truncated or CRC-corrupt chunks
    and out-of-range palette indices."""
    import struct
    import zlib

    import numpy as np

    if len(payload) < 8 or payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    plte = None
    idat = bytearray()
    saw_iend = False
    while pos + 8 <= len(payload):
        size, ctype = struct.unpack(">I4s", payload[pos:pos + 8])
        body = payload[pos + 8:pos + 8 + size]
        if len(body) != size or pos + 12 + size > len(payload):
            raise ValueError(f"truncated {ctype.decode('latin1')} chunk")
        (crc,) = struct.unpack(">I", payload[pos + 8 + size:pos + 12 + size])
        if crc != zlib.crc32(ctype + body):
            raise ValueError(f"CRC mismatch in {ctype.decode('latin1')} chunk")
        if ctype == b"IHDR":
            if len(body) != 13:
                raise ValueError("bad IHDR length")
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            if size % 3 or size > 768:
                raise ValueError("bad PLTE length")
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            saw_iend = True
            break
        pos += 12 + size
    if ihdr is None:
        raise ValueError("missing IHDR")
    if not saw_iend:
        raise ValueError("missing IEND")
    w, h, depth, color_type, comp, filt_method, interlace = ihdr
    if w == 0 or h == 0:
        # A zero-dim PNG (valid CRCs, empty IDAT) must stay on the
        # decode/error path: downstream feature math indexes [0, 0]
        # outside the on_error try, so returning an empty array would
        # escape the per-row error policy and kill the whole job.
        raise ValueError("empty image dimensions")
    if depth not in (8, 16):
        raise ValueError(f"{depth}-bit PNG unsupported (8/16-bit only)")
    if color_type not in (0, 2, 3, 4, 6):
        raise ValueError(f"color type {color_type} unsupported")
    if color_type == 3 and depth == 16:
        raise ValueError("16-bit palette PNG is not a legal combination")
    if color_type == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE chunk")
    if comp != 0 or filt_method != 0:
        raise ValueError("nonstandard compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"interlace method {interlace} unsupported")
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    bpp = ch * (depth // 8)
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"corrupt IDAT stream: {exc}") from exc

    def to_samples(recon, ph, pw):
        """(ph, pw*bpp) bytes -> (ph, pw, ch) samples."""
        if depth == 8:
            return recon.reshape(ph, pw, ch)
        u16 = np.frombuffer(recon.tobytes(), dtype=">u2")
        return u16.astype(np.uint16).reshape(ph, pw, ch)

    if interlace == 0:
        passes = [(0, 1, 0, 1)]
    else:
        passes = list(ADAM7)
    want = 0
    dims = []
    for x0, xs, y0, ys in passes:
        pw = (w - x0 + xs - 1) // xs if w > x0 else 0
        ph = (h - y0 + ys - 1) // ys if h > y0 else 0
        dims.append((pw, ph))
        if pw and ph:
            want += ph * (1 + pw * bpp)
    if len(raw) != want:
        raise ValueError(f"IDAT size mismatch: got {len(raw)}, want {want}")
    out = np.zeros((h, w, ch), dtype=np.uint8 if depth == 8 else np.uint16)
    off = 0
    for (x0, xs, y0, ys), (pw, ph) in zip(passes, dims):
        if not (pw and ph):
            continue
        nbytes = ph * (1 + pw * bpp)
        arr = np.frombuffer(raw, np.uint8, nbytes, off).reshape(ph, 1 + pw * bpp)
        off += nbytes
        recon = _unfilter_pass(arr, pw * bpp, bpp)
        out[y0::ys, x0::xs] = to_samples(recon, ph, pw)
    if color_type == 3:  # palette: index plane -> RGB through PLTE
        if out.size and int(out.max()) >= len(plte):
            raise ValueError("palette index out of range")
        out = plte[out[:, :, 0]]
    return out


GIF_SIGS = (b"GIF87a", b"GIF89a")


def _lzw_encode(indices, min_code_size: int) -> bytes:
    """GIF-variant LZW: variable 3..12-bit codes, LSB-first packing,
    CLEAR emitted first, dictionary reset at 4096 entries."""
    clear = 1 << min_code_size
    end = clear + 1
    out_bits: list[tuple[int, int]] = []  # (code, width)
    width = min_code_size + 1
    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    out_bits.append((clear, width))
    buf: tuple = ()
    for sym in indices:
        cand = buf + (int(sym),)
        if cand in table:
            buf = cand
            continue
        out_bits.append((table[buf], width))
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            out_bits.append((clear, width))
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        buf = (int(sym),)
    if buf:
        out_bits.append((table[buf], width))
    out_bits.append((end, width))
    # LSB-first bit packing
    acc = n = 0
    data = bytearray()
    for code, w in out_bits:
        acc |= code << n
        n += w
        while n >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        data.append(acc & 0xFF)
    return bytes(data)


def _lzw_decode(data: bytes, min_code_size: int, limit: int):
    """Inverse of _lzw_encode; stops at END or after `limit` pixels.
    Raises ValueError on any malformed code stream."""
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = n = pos = 0
    prev: bytes | None = None
    while len(out) < limit:
        while n < width:
            if pos >= len(data):
                raise ValueError("truncated LZW stream")
            acc |= data[pos] << n
            pos += 1
            n += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        n -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("LZW code before any literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the cScSc special case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"LZW code {code} out of range")
        if len(table) == (1 << width) and width < 12:
            width += 1
        out += entry
        prev = entry
    return bytes(out[:limit])


def gif_bytes(indices, palette) -> bytes:
    """Encode uint8 index frame(s) + an Nx3 palette as a real GIF89a
    (global color table, LZW-compressed image data, 255-byte
    sub-blocks). `indices` is one HxW array (single image) or a list
    of same-shaped HxW arrays (animation: one full-canvas image
    descriptor per frame)."""
    import struct

    import numpy as np

    frames = indices if isinstance(indices, (list, tuple)) else [indices]
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    pal = np.asarray(palette, dtype=np.uint8)
    h, w = frames[0].shape
    if any(f.shape != (h, w) for f in frames):
        raise ValueError("all GIF frames must share the canvas shape")
    n = len(pal)
    bits = max(1, (n - 1).bit_length())
    gct_size = 1 << bits
    pal_full = np.zeros((gct_size, 3), dtype=np.uint8)
    pal_full[:n] = pal
    mcs = max(2, bits)
    out = bytearray(
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0)
        + pal_full.tobytes()
    )
    for idx in frames:
        lzw = _lzw_encode(idx.reshape(-1), mcs)
        blocks = bytearray()
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            blocks += bytes([len(chunk)]) + chunk
        out += (
            struct.pack("<sHHHHB", b",", 0, 0, w, h, 0)  # image descriptor
            + bytes([mcs])
            + bytes(blocks)
            + b"\x00"  # block terminator
        )
    return bytes(out + b";")


def gif_frames(payload: bytes, max_frames: int | None = None):
    """Demux a GIF87a/GIF89a payload: yields one HxWx3 uint8 RGB array
    per frame, in order. Full block walk (logical screen descriptor,
    global/local color tables, extensions skipped by sub-block length),
    from-scratch LZW decode (variable code widths, the cScSc case,
    dictionary resets), standard 4-pass de-interlacing. Animated GIFs
    whose frames are full-canvas decode exactly; PARTIAL-canvas frames
    (patch optimization needing disposal-method compositing) raise
    ValueError — honestly out of scope rather than silently wrong.
    Malformed payloads raise ValueError."""
    import struct

    import numpy as np

    if len(payload) < 13 or payload[:6] not in GIF_SIGS:
        raise ValueError("not a GIF payload")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        size = 1 << ((flags & 0x07) + 1)
        if pos + 3 * size > len(payload):
            raise ValueError("truncated global color table")
        gct = np.frombuffer(payload, np.uint8, 3 * size, pos).reshape(size, 3)
        pos += 3 * size
    frames = []
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:  # extension: label + sub-blocks until 0
            pos += 2
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            if pos + 10 > len(payload):
                raise ValueError("truncated image descriptor")
            fx, fy, w, h, iflags = struct.unpack("<HHHHB", payload[pos + 1:pos + 10])
            pos += 10
            pal = gct
            if iflags & 0x80:  # local color table
                size = 1 << ((iflags & 0x07) + 1)
                if pos + 3 * size > len(payload):
                    raise ValueError("truncated local color table")
                pal = np.frombuffer(payload, np.uint8, 3 * size, pos).reshape(size, 3)
                pos += 3 * size
            if pal is None:
                raise ValueError("no color table for image")
            if w == 0 or h == 0:
                raise ValueError("empty image dimensions")
            # frame 1 stands alone (returned as the image, whatever its
            # size); LATER frames would need disposal-method compositing
            # onto the previous canvas when partial — out of scope,
            # refused rather than silently wrong
            if frames and ((fx, fy) != (0, 0) or w != sw or h != sh):
                raise ValueError(
                    "partial-canvas GIF frame (disposal compositing) unsupported"
                )
            if pos >= len(payload):
                raise ValueError("truncated before LZW data")
            mcs = payload[pos]
            pos += 1
            lzw = bytearray()
            while pos < len(payload) and payload[pos] != 0:
                ln = payload[pos]
                block = payload[pos + 1:pos + 1 + ln]
                if len(block) != ln:
                    raise ValueError("truncated LZW sub-block")
                lzw += block
                pos += 1 + ln
            pos += 1  # block terminator
            idx = np.frombuffer(_lzw_decode(bytes(lzw), mcs, w * h), np.uint8)
            if len(idx) < w * h:
                raise ValueError("LZW stream ended short of the frame")
            if int(idx.max()) >= len(pal):
                raise ValueError("color index out of palette range")
            rows = idx.reshape(h, w)
            if iflags & 0x40:  # de-interlace: standard 4-pass order
                order = np.concatenate([
                    np.arange(0, h, 8), np.arange(4, h, 8),
                    np.arange(2, h, 4), np.arange(1, h, 2),
                ])
                out = np.empty_like(rows)
                out[order] = rows
                rows = out
            frames.append(pal[rows].astype(np.uint8))
            if max_frames is not None and len(frames) >= max_frames:
                return frames
        elif b == 0x3B:  # trailer
            if not frames:
                raise ValueError("GIF contains no image frame")
            return frames
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
    raise ValueError("truncated GIF (no trailer)")


def decode_gif(payload: bytes):
    """First frame of a GIF payload as an HxWx3 uint8 RGB array — the
    single-image fast path over :func:`gif_frames`."""
    return gif_frames(payload, max_frames=1)[0]


# ---------------------------------------------------------------------------
# AVI (RIFF) demux: uncompressed 24bpp DIB frames — real video decode
# ---------------------------------------------------------------------------

def avi_bytes(frames, fps: int = 10, codec: str = "DIB ") -> bytes:
    """Encode a list of HxWx3 uint8 RGB frames as a real RIFF/AVI file:
    hdrl (avih + strl/strh/strf) + movi with one chunk per frame.
    codec='DIB ' (default) stores uncompressed 24bpp bottom-up BGR with
    4-byte row stride in '00db' chunks, exactly like BMP; codec='MJPG'
    stores each frame as a REAL baseline JPEG (4:4:4, all-ones quant —
    gray-valued frames roundtrip exactly) in '00dc' chunks. Any other
    codec raises ValueError."""
    import struct

    import numpy as np

    fs = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not fs:
        raise ValueError("need at least one frame")
    h, w, _ = fs[0].shape
    if any(f.shape != (h, w, 3) for f in fs):
        raise ValueError("all frames must be HxWx3 with one shape")
    stride = (w * 3 + 3) // 4 * 4
    if codec == "DIB ":
        chunk_id = b"00db"
        frame_bytes = []
        for f in fs:
            block = np.zeros((h, stride), dtype=np.uint8)
            block[:, : w * 3] = f[::-1, :, ::-1].reshape(h, w * 3)
            frame_bytes.append(block.tobytes())
    elif codec == "MJPG":
        from grasper_spark.functions.jpeg import jpeg_bytes

        chunk_id = b"00dc"
        frame_bytes = [jpeg_bytes(f, subsampling="444") for f in fs]
    else:
        raise ValueError(f"unsupported AVI codec {codec!r} (DIB /MJPG)")

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return struct.pack("<4sI", cid, len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack(
        "<IIIIIIIIIIIIII", 10**6 // fps, 0, 0, 0x10, len(fs), 0, 1, 0,
        w, h, 0, 0, 0, 0,
    )
    fourcc = codec.encode("ascii")
    compression = 0 if codec == "DIB " else struct.unpack("<I", fourcc)[0]
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh", b"vids", fourcc, 0, 0, 0, 0, 1, fps,
        0, len(fs), 0, 0xFFFFFFFF, 0, 0, 0, w, h,
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, compression,
                       stride * h, 2835, 2835, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(chunk_id, fb) for fb in frame_bytes))
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


def _avi_demux(payload: bytes):
    """RIFF/AVI walk shared by decode_avi and mjpeg_frame_bytes:
    returns (fps, w, h, bpp, compression, top_down, mjpeg,
    [(frame_lo, frame_hi)]). Malformed payloads raise ValueError."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")

    def walk(lo: int, hi: int):
        pos = lo
        while pos + 8 <= hi:
            cid, size = struct.unpack("<4sI", payload[pos:pos + 8])
            body_lo = pos + 8
            body_hi = min(body_lo + size, hi)
            yield cid, body_lo, body_hi
            pos = body_lo + size + (size % 2)

    fps = None
    w = h = bpp = compression = None
    top_down = False
    mjpeg = False
    frames = []
    # strides of state discovered during the walk
    def handle_list(lo, hi):
        nonlocal fps, w, h, bpp, compression, top_down, mjpeg
        kind = payload[lo:lo + 4]
        for cid, blo, bhi in walk(lo + 4, hi):
            if cid == b"LIST":
                handle_list(blo, bhi)
            elif cid == b"strh" and bhi - blo >= 32:
                typ, codec = struct.unpack("<4s4s", payload[blo:blo + 8])
                if typ == b"vids":
                    rate, = struct.unpack("<I", payload[blo + 24:blo + 28])
                    scale, = struct.unpack("<I", payload[blo + 20:blo + 24])
                    if scale and rate:
                        fps = rate // scale
                    if codec not in (b"DIB ", b"\x00\x00\x00\x00", b"MJPG"):
                        raise ValueError(
                            f"compressed AVI codec {codec!r} unsupported"
                        )
                    mjpeg = codec == b"MJPG"
            elif cid == b"strf" and bhi - blo >= 40:
                _sz, bw, bh = struct.unpack("<Iii", payload[blo:blo + 12])
                _planes, bits, comp = struct.unpack("<HHI", payload[blo + 12:blo + 20])
                # biHeight sign is orientation: positive = bottom-up DIB
                # (rows flipped on emit), negative = top-down (stored in
                # display order, no flip) — same contract as decode_bmp.
                w, h, bpp, compression = bw, abs(bh), bits, comp
                top_down = bh < 0
            elif cid in (b"00db", b"00dc"):
                frames.append((blo, bhi))

    for cid, blo, bhi in walk(12, min(len(payload), 8 + struct.unpack("<I", payload[4:8])[0])):
        if cid == b"LIST":
            handle_list(blo, bhi)
    if w is None or bpp is None:
        raise ValueError("missing strf (video format) chunk")
    return fps, w, h, bpp, compression, top_down, mjpeg, frames


_MJPG_CC = 1196444237  # struct.unpack("<I", b"MJPG")[0]


def mjpeg_frame_bytes(payload: bytes):
    """(fps, [per-frame JPEG bytes]) for an MJPG AVI — the demux half
    of decode_avi, exposed so callers can BATCH the frame decodes
    across payloads (jpeg.decode_jpeg_batch groups same-header frames).
    Returns None for a non-MJPG AVI (callers use decode_avi); raises
    exactly like decode_avi for malformed/inconsistent payloads."""
    fps, w, h, bpp, compression, top_down, mjpeg, frames = _avi_demux(payload)
    if not (mjpeg or compression == _MJPG_CC):
        return None
    if not (mjpeg and compression == _MJPG_CC):
        raise ValueError("inconsistent MJPG codec/compression fields")
    if not frames:
        raise ValueError("no video frames in movi list")
    return (fps or 0), [payload[blo:bhi] for blo, bhi in frames]


def decode_avi(payload: bytes):
    """Demux a RIFF/AVI payload: returns (fps, [HxWx3 uint8 RGB
    frames]). Walks RIFF LISTs like the WAV chunk walk (word-aligned),
    reads BITMAPINFOHEADER from strf. Uncompressed 24bpp DIB streams
    decode via the stride/orientation path; MJPG streams decode each
    frame chunk through the real baseline JPEG decoder
    (jpeg.decode_jpeg — grayscale frames expand to RGB). Any other
    codec is rejected with the same honesty as decode_bmp. Malformed
    payloads raise ValueError."""
    import numpy as np

    fps, w, h, bpp, compression, top_down, mjpeg, frames = _avi_demux(payload)
    if mjpeg or compression == _MJPG_CC:
        if not (mjpeg and compression == _MJPG_CC):
            raise ValueError("inconsistent MJPG codec/compression fields")
        if not frames:
            raise ValueError("no video frames in movi list")
        from grasper_spark.functions.jpeg import decode_jpeg

        out = []
        for blo, bhi in frames:
            px = decode_jpeg(payload[blo:bhi])
            if px.shape[2] == 1:  # grayscale JPEG frame -> RGB
                px = np.repeat(px, 3, axis=2)
            out.append(px)
        return (fps or 0), out
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported AVI video (bpp={bpp}, compression={compression})")
    if not frames:
        raise ValueError("no video frames in movi list")
    stride = (w * 3 + 3) // 4 * 4
    out = []
    for blo, bhi in frames:
        if bhi - blo < stride * h:
            raise ValueError("truncated video frame chunk")
        raw = np.frombuffer(payload, np.uint8, stride * h, blo)
        rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        if not top_down:
            rows = rows[::-1]  # bottom-up DIB stores rows last-first
        out.append(rows[:, :, ::-1].copy())  # BGR -> RGB
    return (fps or 0), out


def image_resize_nn(rgb, out_h: int, out_w: int):
    """Nearest-neighbor resize of an HxWxC uint8 array — the standard
    thumbnail/feature-grid step after decode. Pure integer index math
    (src_y = y*H // out_h), so resized features stay exactly
    reproducible cross-engine."""
    import numpy as np

    px = np.asarray(rgb)
    h, w = px.shape[0], px.shape[1]
    ys = (np.arange(out_h, dtype=np.int64) * h) // out_h
    xs = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return px[ys][:, xs]


def audio_decimate(samples, factor: int):
    """Decimate PCM by an integer factor (every factor-th sample) — the
    cheap resample used for fingerprinting/dedup sketches. (A proper
    low-pass resample needs scipy; this is the exact-integer kernel.)"""
    import numpy as np

    if factor < 1:
        raise ValueError(f"factor must be >= 1, got {factor}")
    return np.asarray(samples)[::factor]


def luma_int(rgb) -> "object":
    """Integer BT.601-ish luma (77R + 150G + 29B) >> 8 — exact on any
    engine (pure int arithmetic; the floats-never-hash contract).

    Computed as one int64 matmul over the channel axis instead of three
    ufunc passes (identical integers, ~2x fewer kernel launches — this
    runs per decoded frame in the multimodal feature path). Extra
    channels beyond RGB (alpha) are ignored, as before."""
    import numpy as np

    global _LUMA_W
    if _LUMA_W is None:
        _LUMA_W = np.array([77, 150, 29], dtype=np.int64)
    px = np.asarray(rgb, dtype=np.int64)[..., :3]
    return (px @ _LUMA_W) >> 8


_LUMA_W = None


# deterministic synthesis formulas — these ARE the cross-engine
# contract: the DuckDB oracle recomputes the features straight from the
# closed forms below while Spark routes the bytes through the real
# decoders, so a decode bug (stride, sign, chunk walk, row order) is a
# ledger mismatch, not a silent pass.
WAV_SR = 8000


def synth_wav_samples(media_id: int):
    """n = 64 + id%64 samples; s[i] = (id*7919 + i*104729) % 65536 - 32768."""
    import numpy as np

    n = 64 + media_id % 64
    i = np.arange(n, dtype=np.int64)
    return ((media_id * 7919 + i * 104729) % 65536 - 32768).astype(np.int16)


def synth_bmp_pixels(media_id: int):
    """w = 4 + id%5 (exercises row padding), h = 3 + id%4;
    r=(id+3x+7y)%256, g=(2id+5x+y)%256, b=(x*y+id)%256."""
    import numpy as np

    w, h = 4 + media_id % 5, 3 + media_id % 4
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    return np.stack(
        [
            (media_id + 3 * x + 7 * y) % 256,
            (2 * media_id + 5 * x + y) % 256,
            (x * y + media_id) % 256,
        ],
        axis=-1,
    ).astype("uint8")


def synth_png_pixels(media_id: int):
    """w = 3 + id%5, h = 2 + id%4; RGBA when id%4==3 else RGB.
    r=(5id+x+2y)%256, g=(id+4x+3y)%256, b=(x*y+2id)%256,
    a=(id+x+y)%256 — SQL-expressible closed forms, like the BMP/WAV
    twins, so the oracle recomputes features the real decoder must
    reproduce byte-for-byte."""
    import numpy as np

    w, h = 3 + media_id % 5, 2 + media_id % 4
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    planes = [
        (5 * media_id + x + 2 * y) % 256,
        (media_id + 4 * x + 3 * y) % 256,
        (x * y + 2 * media_id) % 256,
    ]
    if media_id % 4 == 3:
        planes.append((media_id + x + y) % 256)
    return np.stack([np.broadcast_to(p, (h, w)) for p in planes], axis=-1).astype("uint8")


def synth_mjpg_frames(media_id: int):
    """Gray-valued (R=G=B) flat-block MJPEG frames from closed forms:
    n = 2 frames of 16x8 (two 8x8 blocks), block value
    v(bx, f) = (41*id + 13*bx + 57*f) % 256. Gray-valued flat blocks
    are the JPEG-exact domain even through the color path (integer
    YCbCr: Y=v, Cb=Cr=128), so the decoded luma is SQL-recomputable."""
    import numpy as np

    frames = []
    for f in range(2):
        vals = [(41 * media_id + 13 * bx + 57 * f) % 256 for bx in (0, 1)]
        row = np.repeat(np.asarray(vals, dtype=np.uint8), 8)
        plane = np.tile(row, (8, 1))
        frames.append(np.stack([plane] * 3, axis=-1))
    return frames


def synth_png16_pixels(media_id: int):
    """16-bit grayscale closed forms for the deep-color PNG arm:
    w = 3 + id%5, h = 2 + id%4, v(x,y) = (1000*id + 257x + 513y) %
    65536 — SQL-expressible like the 8-bit twins, and the odd
    multipliers make the big-endian byte pair differ from its
    little-endian misread on almost every pixel."""
    import numpy as np

    w, h = 3 + media_id % 5, 2 + media_id % 4
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    v = (1000 * media_id + 257 * x + 513 * y) % 65536
    return np.broadcast_to(v, (h, w)).astype(np.uint16)[:, :, None]


def synth_avi_frames(media_id: int):
    """n = 2 + id%3 frames, w = 3 + id%4, h = 2 + id%3;
    r=(id+5f+x+3y)%256, g=(2id+f+2x+y)%256, b=(fx+y+3id)%256 —
    SQL-expressible per-frame closed forms for the video ledger arm."""
    import numpy as np

    n, w, h = 2 + media_id % 3, 3 + media_id % 4, 2 + media_id % 3
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    frames = []
    for f in range(n):
        frames.append(
            np.stack(
                [
                    np.broadcast_to((media_id + 5 * f + x + 3 * y) % 256, (h, w)),
                    np.broadcast_to((2 * media_id + f + 2 * x + y) % 256, (h, w)),
                    np.broadcast_to((f * x + y + 3 * media_id) % 256, (h, w)),
                ],
                axis=-1,
            ).astype(np.uint8)
        )
    return frames


def synth_gif_frame(media_id: int):
    """(indices, palette) closed forms: 16-color palette
    pal[c] = ((7c+id)%256, (11c+2id)%256, (13c+3id)%256); frame
    w = 4 + id%4, h = 3 + id%3, idx(x,y) = (x + 2y + id) % 16 —
    SQL-expressible, like the PNG/BMP/WAV twins."""
    import numpy as np

    c = np.arange(16, dtype=np.int64)
    pal = np.stack(
        [(7 * c + media_id) % 256, (11 * c + 2 * media_id) % 256,
         (13 * c + 3 * media_id) % 256], axis=-1,
    ).astype(np.uint8)
    w, h = 4 + media_id % 4, 3 + media_id % 3
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    idx = np.broadcast_to((x + 2 * y + media_id) % 16, (h, w)).astype(np.uint8)
    return idx, pal


def synthetic_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One media row per document: even ids get a PCM WAV payload, odd
    ids a 24bpp BMP (id%4==1) or a real zlib-compressed PNG (id%4==3,
    RGBA), and ids % 97 == 0 a FLAC-magic stub payload (the
    unimplemented-codec path — MP3 frame headers walk for real now, so
    FLAC keeps decode_real's NotImplementedError hook exercised).
    Payload bytes are REAL containers built by
    wav_bytes/bmp_bytes/png_bytes from the synth_* closed forms."""
    from typing import Iterator as _It

    ids = docs.select(F.col(id_col).cast("long").alias("media_id"))

    def fn(batches: "_It[pd.DataFrame]") -> "_It[pd.DataFrame]":
        from grasper_spark.functions.multimodal import (
            WAV_SR, bmp_bytes, png_bytes, synth_bmp_pixels,
            synth_png_pixels, synth_wav_samples, wav_bytes,
        )

        for pdf in batches:
            payloads, kinds = [], []
            for mid in pdf["media_id"]:
                mid = int(mid)
                if mid % 97 == 0:
                    # Ogg container magic: sniffs to no implemented
                    # decoder -> decode_real's NotImplementedError
                    # (FLAC decodes for real now — flac.decode_flac)
                    payloads.append(b"OggS\x00\x02" + b"\x00" * 16)
                    kinds.append("audio")
                elif mid % 2 == 0:
                    payloads.append(wav_bytes(synth_wav_samples(mid), WAV_SR))
                    kinds.append("audio")
                elif mid % 4 == 3:
                    payloads.append(png_bytes(synth_png_pixels(mid), filter_seed=mid))
                    kinds.append("image")
                else:
                    payloads.append(bmp_bytes(synth_bmp_pixels(mid)))
                    kinds.append("image")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "payload": payloads,
                    "media_type": kinds,
                }
            )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("media_type", T.StringType()),
        ]
    )
    return ids.mapInPandas(fn, schema)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType()),
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("luma_sum", T.LongType()),
    ]
)


def video_frame_features(
    media: DataFrame, every_n: int = 1, on_error: str = "null"
) -> DataFrame:
    """REAL frame sampling over video payloads: demux AVI (uncompressed
    DIB) or animated GIF from magic bytes, keep every `every_n`-th
    frame, and emit one row per sampled frame —
    ('frame', media_id, frame_idx, width, height, sum(luma)) — exact
    int64 features, like media_decode_features. Decode-only on_error
    policy: a malformed payload becomes ('error', id, -1, -1, -1, -1)
    under 'null'; other codecs route to decode_real."""
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")
    if on_error not in ("null", "raise"):
        raise ValueError(f"on_error must be 'null' or 'raise', got {on_error!r}")
    if not media.isStreaming and media.rdd.getNumPartitions() == 1:
        target = min(8, media.sparkSession.sparkContext.defaultParallelism)
        media = media.repartition(target)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from grasper_spark.functions.multimodal import (
            GIF_SIGS, decode_avi, decode_real, gif_frames, luma_int,
        )

        for pdf in batches:
            out = {k: [] for k in
                   ("op", "media_id", "frame_idx", "width", "height", "luma_sum")}

            def emit(op, mid, fi, w, h, ls):
                out["op"].append(op)
                out["media_id"].append(mid)
                out["frame_idx"].append(fi)
                out["width"].append(w)
                out["height"].append(h)
                out["luma_sum"].append(ls)

            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                mid = int(mid)
                p = bytes(payload) if payload is not None else b""
                try:  # decode ONLY under the error policy
                    if p[:4] == b"RIFF" and p[8:12] == b"AVI ":
                        _fps, frames = decode_avi(p)
                    elif p[:6] in GIF_SIGS:
                        frames = gif_frames(p)
                    else:
                        decode_real(p)
                        continue  # pragma: no cover
                except Exception:
                    if on_error == "raise":
                        raise
                    emit("error", mid, -1, -1, -1, -1)
                    continue
                for fi in range(0, len(frames), every_n):
                    px = frames[fi]
                    lu = (
                        px[..., 0].astype(np.int64)
                        if px.shape[2] < 3 else luma_int(px[..., :3])
                    )
                    emit("frame", mid, fi, px.shape[1], px.shape[0], int(lu.sum()))
            yield pd.DataFrame(out)

    return media.mapInPandas(fn, FRAME_SCHEMA)


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType()),
        T.StructField("media_id", T.LongType()),
        T.StructField("a", T.LongType()),
        T.StructField("b", T.LongType()),
        T.StructField("c", T.LongType()),
        T.StructField("d", T.LongType()),
    ]
)


def media_decode_features(media: DataFrame, on_error: str = "null") -> DataFrame:
    """REAL decode + integer features over mapInPandas, codec sniffed
    from magic bytes (a demuxer's job — metadata lies at corpus scale):

    - RIFF/WAV  -> ('wav',  id, sample_rate, n_samples, sum(s^2), max|s|)
    - BMP       -> ('bmp',  id, width, height, sum(luma), luma[0,0])
    - PNG       -> ('png',  id, width, height, sum(luma),
                    sum(alpha) if RGBA else luma[0,0])
    - GIF       -> ('gif',  id, width, height, sum(luma), luma[0,0])
    - JPEG      -> ('jpg',  id, width, height, sum(luma), luma[0,0])
    - MP3       -> ('mp3',  id, n_frames, bitrate_kbps, sample_rate,
                    duration_ms) — REAL frame-header walk
                    (mpeg_audio.mp3_features): the metadata a corpus
                    pipeline needs, without the audio transform
    - FLAC      -> ('flc',  id, sample_rate, n_samples, sum(s^2),
                    max|s|) over every channel — REAL lossless decode
                    (flac.decode_flac: fixed/LPC subframes, rice
                    partitions, stereo decorrelation, CRC+MD5 verified)
    - Ogg/other -> decode_real (NotImplementedError), which under
      on_error='null' (production posture: a corrupt or unsupported file
      must not kill the job) becomes ('error', id, -1, -1, -1, -1);
      on_error='raise' propagates.

    Only the DECODE step sits under the on_error policy — a bug in the
    feature math is a programming error and always surfaces; only
    malformed/unsupported payloads become 'error' rows.

    Every feature is exact int64 (sum-of-squares of int16 needs < 2^41
    at any real duration) — nothing float ever leaves the decoder."""
    if on_error not in ("null", "raise"):
        raise ValueError(f"on_error must be 'null' or 'raise', got {on_error!r}")
    # stateless op — runs unchanged over streaming inputs, where .rdd
    # is illegal (micro-batch partitioning is the source's business)
    if not media.isStreaming and media.rdd.getNumPartitions() == 1:
        target = min(8, media.sparkSession.sparkContext.defaultParallelism)
        media = media.repartition(target)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from grasper_spark.functions.flac import decode_flac
        from grasper_spark.functions.mpeg_audio import mp3_features
        from grasper_spark.functions.multimodal import (
            GIF_SIGS, JPEG_SIG, PNG_SIG, decode_bmp, decode_gif,
            decode_jpeg, decode_png, decode_real, decode_wav, luma_int,
        )

        for pdf in batches:
            out = {"op": [], "media_id": [], "a": [], "b": [], "c": [], "d": []}

            def emit(op, mid, a, b, c, d):
                out["op"].append(op)
                out["media_id"].append(mid)
                out["a"].append(a)
                out["b"].append(b)
                out["c"].append(c)
                out["d"].append(d)

            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                mid = int(mid)
                p = bytes(payload) if payload is not None else b""
                try:
                    # ONLY decode sits in the try: on_error='null' is a
                    # malformed-payload policy, not a bug-swallower —
                    # feature math below runs outside the except path
                    if p[:4] == b"RIFF":
                        kind, decoded = "wav", decode_wav(p)
                    elif p[:2] == b"BM":
                        kind, decoded = "bmp", decode_bmp(p)
                    elif p[:8] == PNG_SIG:
                        kind, decoded = "png", decode_png(p)
                    elif p[:6] in GIF_SIGS:
                        kind, decoded = "gif", decode_gif(p)
                    elif p[:2] == JPEG_SIG:
                        kind, decoded = "jpg", decode_jpeg(p)
                    elif p[:4] == b"fLaC":
                        kind, decoded = "flc", decode_flac(p)
                    elif p[:3] == b"ID3" or (
                        len(p) >= 2 and p[0] == 0xFF and (p[1] & 0xE0) == 0xE0
                    ):
                        kind, decoded = "mp3", mp3_features(p)
                    else:
                        decode_real(p)
                        continue  # pragma: no cover — decode_real raises
                except Exception:
                    if on_error == "raise":
                        raise
                    emit("error", mid, -1, -1, -1, -1)
                    continue
                if kind == "mp3":
                    nf, br, sr, dur = decoded
                    emit("mp3", mid, nf, br, sr, dur)
                elif kind == "flc":
                    fsr, fs = decoded
                    f64 = fs.astype(np.int64)
                    emit("flc", mid, fsr, fs.shape[0],
                         int((f64 * f64).sum()),
                         int(np.abs(f64).max()) if fs.size else 0)
                elif kind == "wav":
                    sr, ch, s = decoded
                    s64 = s.astype(np.int64)
                    emit("wav", mid, sr, len(s),
                         int((s64 * s64).sum()), int(np.abs(s64).max()) if len(s64) else 0)
                else:
                    px = decoded
                    ch2 = px.shape[2]
                    if ch2 < 3:  # grayscale PNG: the gray plane IS the luma
                        lu = px[..., 0].astype(np.int64)
                    else:
                        lu = luma_int(px[..., :3])
                    if kind == "png" and ch2 in (2, 4):  # alpha plane sum
                        d = int(px[..., -1].astype(np.int64).sum())
                    else:
                        d = int(lu[0, 0])
                    emit(kind, mid, px.shape[1], px.shape[0], int(lu.sum()), d)
            yield pd.DataFrame(out)

    return media.mapInPandas(fn, DECODED_SCHEMA)


def _decode_batch(payloads: pd.Series) -> pd.DataFrame:
    """Deterministic fake decode: byte statistics (vectorized numpy)."""
    import numpy as np

    n_bytes, byte_sum, first = [], [], []
    for p in payloads:
        arr = np.frombuffer(p, dtype=np.uint8) if p else np.array([], dtype=np.uint8)
        n_bytes.append(len(arr))
        byte_sum.append(int(arr.sum()))
        first.append(int(arr[0]) if len(arr) else -1)
    n = pd.Series(n_bytes)
    s = pd.Series(byte_sum)
    return pd.DataFrame(
        {
            "n_bytes": n.astype("int32"),
            "byte_sum": s.astype("int64"),
            # raw int/int division: deterministic on any engine (exact
            # operands < 2^53); pandas .round(6) is half-EVEN and C
            # engines round half-away, so rounding here would diverge
            "byte_mean": s / n.clip(lower=1),
            "first_byte": pd.Series(first).astype("int32"),
        }
    )


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction — Arrow batches in, Arrow batches
    out; scales with partitions (repartition upstream for 100 TB).

    The closure imports the shared `byte_stats` kernel from this module
    (one implementation for every byte-stat surface) — workers need the
    package importable, like any shipped pipeline (--py-files / pip)."""
    # single-partition local inputs serialize the whole stage; a bounded
    # fan-out keeps Arrow batches large while using several workers
    if media.rdd.getNumPartitions() == 1:
        target = min(8, media.sparkSession.sparkContext.defaultParallelism)
        media = media.repartition(target)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pandas as pd

        from grasper_spark.functions.multimodal import byte_stats

        for pdf in batches:
            # fully vectorized: one concatenated buffer + reduceat, no
            # per-row numpy allocation (≈4× over the row loop at 5k rows)
            lens, sums, firsts = byte_stats(pdf["payload"])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "n_bytes": lens.astype("int32"),
                    "byte_sum": sums.astype("int64"),
                    "first_byte": firsts.astype("int32"),
                }
            )

    raw_schema = T.StructType([f for f in FEATURE_SCHEMA if f.name != "byte_mean"])
    out = media.mapInPandas(fn, raw_schema)
    # derive the mean JVM-side as the RAW division: exact int operands
    # < 2^53 through one IEEE divide is bit-identical on any engine,
    # while any rounding step (HALF_UP vs banker's vs multiply-based)
    # can diverge on identical inputs
    return out.withColumn(
        "byte_mean",
        F.col("byte_sum") / F.greatest(F.col("n_bytes"), F.lit(1)),
    ).select([f.name for f in FEATURE_SCHEMA])


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter used in tests/bench: documents.text encoded as the binary
    payload (deterministic), with plausible metadata."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("image").alias("media_type"),
        F.struct(
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit("fake").alias("codec"),
        ).alias("meta"),
    )


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    timestamp (decode stubbed; timestamps derived from metadata)."""
    return media.filter(F.col("meta.duration_ms").isNotNull()).select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
