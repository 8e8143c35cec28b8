"""ZIP and TAR archive walks — dataset-dump ingestion (the other
common corpus containers next to WARC: wiki dumps, code corpora,
The-Pile-style collections ship as .zip / .tar / .tar.gz).

Implemented from the public formats with stdlib zlib only:

- ``zip_members``  — central-directory walk (the authoritative index,
                     per spec): EOCD search, CD entries, local-header
                     offset check, stored and deflate members, CRC-32
                     verified
- ``zip_bytes``    — encode twin (stored or deflate per member)
- ``tar_members``  — ustar 512-byte header walk: octal sizes, name +
                     prefix fields, checksum verification, regular
                     files only (dirs/symlinks skipped), optional
                     gzip wrapper (.tar.gz)
- ``tar_bytes``    — encode twin
- ``archive_to_documents`` — the Spark operator: one Arrow pass over
                     binary archive blobs -> one row per member file,
                     magic-sniffed (zip/tar/tar.gz), per-BLOB
                     on_error='null'

Scale posture matches warc.py: parallelism unit = one archive blob;
members stream inside the worker. The reference system has no archive
ingestion (HDFS text only) — this is training-data-pipeline surface.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


# ---------------------------------------------------------------------------
# ZIP
# ---------------------------------------------------------------------------

def zip_bytes(members: list[tuple[str, bytes]], compress: bool = True) -> bytes:
    """Encode twin: a minimal, spec-correct ZIP with the given
    (name, data) members — deflate when `compress` (raw deflate,
    wbits=-15) else stored."""
    out = bytearray()
    cd = bytearray()
    for name, data in members:
        nb = name.encode("utf-8")
        crc = zlib.crc32(data) & 0xFFFFFFFF
        if compress:
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            payload = co.compress(data) + co.flush()
            method = 8
        else:
            payload = data
            method = 0
        off = len(out)
        local = struct.pack(
            "<IHHHHHIIIHH", 0x04034B50, 20, 0, method, 0, 0x21,
            crc, len(payload), len(data), len(nb), 0,
        )
        out += local + nb + payload
        cd += struct.pack(
            "<IHHHHHHIIIHHHHHII", 0x02014B50, 20, 20, 0, method, 0, 0x21,
            crc, len(payload), len(data), len(nb), 0, 0, 0, 0, 0, off,
        ) + nb
    cd_off = len(out)
    out += cd
    out += struct.pack(
        "<IHHHHIIH", 0x06054B50, 0, 0, len(members), len(members),
        len(cd), cd_off, 0,
    )
    return bytes(out)


def zip_members(blob: bytes) -> list[tuple[str, bytes]]:
    """Walk a ZIP via its central directory (the spec's authoritative
    index — local headers alone are not trustworthy), decompressing
    stored/deflate members and verifying each CRC-32. Raises
    ValueError on any malformed structure; other compression methods
    are refused, not skipped."""
    eocd = blob.rfind(b"PK\x05\x06")
    if eocd < 0:
        raise ValueError("missing ZIP end-of-central-directory")
    if eocd + 22 > len(blob):
        raise ValueError("truncated EOCD record")
    (_, _, _, total, cd_len, cd_off, _) = struct.unpack(
        "<HHHHIIH", blob[eocd + 4:eocd + 22]
    )
    if cd_off + cd_len > len(blob):
        raise ValueError("central directory extends past blob")
    if total == 0:
        # an EOCD-only blob still sniffs as ZIP: surface it instead of
        # returning [] (archive_to_documents would emit NO row for the
        # blob, silently losing it from per-blob accounting)
        raise ValueError("ZIP archive has no members")
    out = []
    pos = cd_off
    for _ in range(total):
        if blob[pos:pos + 4] != b"PK\x01\x02":
            raise ValueError("bad central-directory entry signature")
        (_, _, _, method, _, _, crc, clen, ulen, nlen, xlen, cmlen,
         _, _, _, off) = struct.unpack("<HHHHHHIIIHHHHHII", blob[pos + 4:pos + 46])
        name = blob[pos + 46:pos + 46 + nlen].decode("utf-8", "replace")
        pos += 46 + nlen + xlen + cmlen
        if blob[off:off + 4] != b"PK\x03\x04":
            raise ValueError(f"bad local header for member {name!r}")
        lnlen, lxlen = struct.unpack("<HH", blob[off + 26:off + 30])
        dstart = off + 30 + lnlen + lxlen
        payload = blob[dstart:dstart + clen]
        if len(payload) != clen:
            raise ValueError(f"truncated member data for {name!r}")
        if method == 0:
            data = payload
        elif method == 8:
            try:
                data = zlib.decompress(payload, wbits=-15)
            except zlib.error as e:
                raise ValueError(f"corrupt deflate member {name!r}: {e}") from None
        else:
            raise ValueError(f"unsupported compression method {method}")
        if len(data) != ulen:
            raise ValueError(f"member {name!r} size mismatch")
        if (zlib.crc32(data) & 0xFFFFFFFF) != crc:
            raise ValueError(f"member {name!r} CRC-32 mismatch")
        out.append((name, data))
    return out


# ---------------------------------------------------------------------------
# TAR (ustar)
# ---------------------------------------------------------------------------

def _octal(field: bytes) -> int:
    s = field.split(b"\x00")[0].strip()
    if not s:
        return 0
    try:
        return int(s, 8)
    except ValueError:
        raise ValueError(f"bad octal field {field!r}") from None


def tar_bytes(members: list[tuple[str, bytes]], gz: bool = False) -> bytes:
    """Encode twin: ustar archive of regular files (+ optional gzip)."""
    out = bytearray()
    for name, data in members:
        nb = name.encode("utf-8")
        if len(nb) > 100:
            raise ValueError("name over 100 bytes needs the prefix field")
        hdr = bytearray(512)
        hdr[0:len(nb)] = nb
        hdr[100:108] = b"0000644\x00"
        hdr[108:116] = b"0000000\x00"
        hdr[116:124] = b"0000000\x00"
        hdr[124:136] = f"{len(data):011o}\x00".encode()
        hdr[136:148] = b"00000000000\x00"
        hdr[148:156] = b" " * 8  # checksum placeholder
        hdr[156] = 0x30  # '0' regular file
        hdr[257:263] = b"ustar\x00"
        hdr[263:265] = b"00"
        ck = sum(hdr)
        hdr[148:156] = f"{ck:06o}\x00 ".encode()
        out += hdr + data
        pad = (512 - len(data) % 512) % 512
        out += b"\x00" * pad
    out += b"\x00" * 1024  # end-of-archive
    if gz:
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        return co.compress(bytes(out)) + co.flush()
    return bytes(out)


def tar_members(blob: bytes) -> list[tuple[str, bytes]]:
    """Walk a (possibly gzipped) ustar archive: header checksums
    verified, octal sizes parsed, 512-byte block stepping; regular
    files returned, directories/links skipped, unknown type flags
    refused. Raises ValueError on malformed headers or truncation."""
    if blob[:2] == b"\x1f\x8b":
        # multi-member gzip: decompress EVERY member (a concatenation
        # of .tar.gz files is itself valid gzip — silently stopping at
        # the first member would truncate the archive)
        buf = bytearray()
        data = blob
        while data[:2] == b"\x1f\x8b":
            d = zlib.decompressobj(wbits=31)
            try:
                buf += d.decompress(data)
            except zlib.error as e:
                raise ValueError(f"corrupt gzip wrapper: {e}") from None
            if not d.eof:
                raise ValueError("truncated gzip wrapper")
            data = d.unused_data
        if data:
            raise ValueError("trailing non-gzip bytes after gzip members")
        blob = bytes(buf)
    out = []
    pos = 0
    n = len(blob)
    saw_end = False
    while pos + 512 <= n:
        hdr = blob[pos:pos + 512]
        if hdr == b"\x00" * 512:
            # end-of-archive marker — keep scanning (GNU --ignore-zeros
            # semantics) so CONCATENATED tars parse fully instead of
            # silently dropping every archive after the first
            saw_end = True
            pos += 512
            continue
        saw_end = False
        name = hdr[0:100].split(b"\x00")[0].decode("utf-8", "replace")
        prefix = hdr[345:500].split(b"\x00")[0].decode("utf-8", "replace")
        if prefix:
            name = prefix + "/" + name
        want = _octal(hdr[148:156])
        ck = sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:])
        if ck != want:
            raise ValueError(f"tar header checksum mismatch at offset {pos}")
        size = _octal(hdr[124:136])
        typ = hdr[156:157]
        pos += 512
        data = blob[pos:pos + size]
        if len(data) != size:
            raise ValueError(f"truncated tar member {name!r}")
        pos += size + (512 - size % 512) % 512
        if typ in (b"0", b"\x00"):
            out.append((name, data))
        elif typ in (b"5", b"1", b"2"):  # dir / hard / sym link: skip
            continue
        else:
            raise ValueError(f"unsupported tar entry type {typ!r}")
    if not saw_end:
        raise ValueError("missing tar end-of-archive marker")
    if not out:
        raise ValueError("no regular files in archive")
    return out


# ---------------------------------------------------------------------------
# Spark operator
# ---------------------------------------------------------------------------

ARCHIVE_DOC_SCHEMA = T.StructType([
    T.StructField("blob_id", T.LongType()),
    T.StructField("member_idx", T.IntegerType()),
    T.StructField("name", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("body", T.BinaryType()),
])


def archive_to_documents(
    blobs: DataFrame, blob_col: str = "blob", id_col: str = "blob_id",
    on_error: str = "null",
) -> DataFrame:
    """ZIP / TAR / TAR.GZ blobs -> one row per member file, format
    sniffed from magic bytes. A malformed blob becomes one
    (id, -1, null, -1, null) error row under on_error='null'."""
    if on_error not in ("null", "raise"):
        raise ValueError(f"on_error must be 'null' or 'raise', got {on_error!r}")
    sel = blobs.select(id_col, blob_col)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.name: [] for k in ARCHIVE_DOC_SCHEMA.fields}

            def emit(bid, idx, name, nb, body):
                rows["blob_id"].append(bid)
                rows["member_idx"].append(idx)
                rows["name"].append(name)
                rows["n_bytes"].append(nb)
                rows["body"].append(body)

            for bid, blob in zip(pdf[id_col], pdf[blob_col]):
                bid = int(bid)
                b = bytes(blob) if blob is not None else b""
                try:
                    if b[:2] == b"PK":
                        members = zip_members(b)
                    elif b[:2] == b"\x1f\x8b" or (
                        len(b) >= 263 and b[257:262] == b"ustar"
                    ):
                        members = tar_members(b)
                    else:
                        raise ValueError("unknown archive magic")
                except Exception:
                    if on_error == "raise":
                        raise
                    emit(bid, -1, None, -1, None)
                    continue
                for idx, (name, data) in enumerate(members):
                    emit(bid, idx, name, len(data), data)
            yield pd.DataFrame(rows)

    return sel.mapInPandas(fn, ARCHIVE_DOC_SCHEMA)
