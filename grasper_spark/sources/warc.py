"""WARC (Web ARChive, ISO 28500) ingestion — the Common Crawl corpus
pattern: WARC blobs -> HTTP responses -> document rows.

A 100 TB web-text pipeline starts from .warc.gz archives. This module
implements the PUBLIC container format from scratch:

- ``warc_bytes``       — encode twin: WARC/1.0 records (+ per-record
                         gzip members, the standard .warc.gz layout)
- ``warc_records``     — record walk: version line, header block,
                         Content-Length-delimited payload, record
                         separator; multi-member gzip sniffed and
                         streamed via zlib (wbits=31)
- ``http_response``    — split a msgtype=response payload into
                         (status, headers, body); identity and
                         chunked transfer encodings
- ``warc_to_documents``— the Spark operator: mapInPandas over a
                         binary WARC-blob column -> one row per
                         response record (uri, date, status,
                         content_type, body) — Arrow-batched, decode
                         errors per-BLOB under on_error='null' (one
                         corrupt archive cannot kill the job)

Scale note: this operator parallelizes per BLOB (per .warc.gz file —
the natural Common Crawl unit, ~1 GB each). The current walk
DECOMPRESSES THE WHOLE ARCHIVE in the worker before parsing (peak
memory per task ≈ the decompressed archive, ~4-5 GB for a real crawl
shard — size executor memory or shrink blobs accordingly); a
rolling-buffer record walk and CDX-offset record splitting are the
two production upgrades, noted honestly rather than claimed.

The reference system has no ingestion beyond its HDFS text loader
(/root/reference/utils/hdfs_core.cpp); WARC belongs to the
training-data-pipeline surface this engine adds.
"""

from __future__ import annotations

import zlib
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_CRLF = b"\r\n"


def _gzip_members(blob: bytes) -> bytes:
    """Decompress concatenated gzip members (the .warc.gz layout)."""
    out = bytearray()
    data = blob
    while data[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        try:
            out += d.decompress(data)
        except zlib.error as e:
            raise ValueError(f"corrupt gzip member: {e}") from None
        if not d.eof:
            raise ValueError("truncated gzip member")
        data = d.unused_data
    if data:
        raise ValueError("trailing non-gzip bytes after gzip members")
    return bytes(out)


def warc_records(blob: bytes) -> list[dict]:
    """Walk every record of a WARC/1.0 (or 1.1) blob, plain or
    .warc.gz (multi-member gzip, sniffed). Returns one dict per record:
    ``{"headers": {name: value}, "payload": bytes}`` with header names
    lower-cased. Raises ValueError on malformed version lines, header
    blocks, lengths, or separators — a corrupt archive must land on
    the error path, never silently truncate."""
    if blob[:2] == b"\x1f\x8b":
        blob = _gzip_members(blob)
    records = []
    pos = 0
    n = len(blob)
    while pos < n:
        eol = blob.find(_CRLF, pos)
        if eol < 0:
            raise ValueError("missing WARC version line terminator")
        version = blob[pos:eol]
        if not version.startswith(b"WARC/1."):
            raise ValueError(f"bad WARC version line {version[:20]!r}")
        pos = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = blob.find(_CRLF, pos)
            if eol < 0:
                raise ValueError("unterminated WARC header block")
            line = blob[pos:eol]
            pos = eol + 2
            if not line:
                break  # blank line ends headers
            colon = line.find(b":")
            if colon <= 0:
                raise ValueError(f"malformed WARC header {line[:40]!r}")
            headers[line[:colon].decode("ascii", "replace").strip().lower()] = (
                line[colon + 1:].decode("utf-8", "replace").strip()
            )
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("missing/invalid Content-Length") from None
        if clen < 0 or pos + clen > n:
            raise ValueError("record payload extends past blob")
        payload = blob[pos:pos + clen]
        pos += clen
        if blob[pos:pos + 4] != b"\r\n\r\n":
            raise ValueError("missing WARC record separator")
        pos += 4
        records.append({"headers": headers, "payload": payload})
    if not records:
        raise ValueError("no WARC records")
    return records


def http_response(payload: bytes) -> tuple[int, dict[str, str], bytes]:
    """Split a raw HTTP response (a WARC response record's payload)
    into (status_code, headers, body). Supports identity and chunked
    transfer encodings; raises ValueError on malformed status lines,
    header blocks, or chunk framing."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        raise ValueError("missing HTTP header/body separator")
    head, body = payload[:sep], payload[sep + 4:]
    lines = head.split(_CRLF)
    status_parts = lines[0].split(None, 2)
    if len(status_parts) < 2 or not status_parts[0].startswith(b"HTTP/"):
        raise ValueError(f"malformed HTTP status line {lines[0][:40]!r}")
    try:
        status = int(status_parts[1])
    except ValueError:
        raise ValueError(f"non-numeric HTTP status {status_parts[1]!r}") from None
    headers: dict[str, str] = {}
    for line in lines[1:]:
        colon = line.find(b":")
        if colon <= 0:
            raise ValueError(f"malformed HTTP header {line[:40]!r}")
        headers[line[:colon].decode("ascii", "replace").strip().lower()] = (
            line[colon + 1:].decode("utf-8", "replace").strip()
        )
    if headers.get("transfer-encoding", "").lower() == "chunked":
        out = bytearray()
        pos = 0
        while True:
            eol = body.find(_CRLF, pos)
            if eol < 0:
                raise ValueError("unterminated chunk-size line")
            size_tok = body[pos:eol].split(b";")[0].strip()
            try:
                size = int(size_tok, 16)
            except ValueError:
                raise ValueError(f"bad chunk size {size_tok[:16]!r}") from None
            pos = eol + 2
            if size == 0:
                break  # terminal chunk (trailers ignored)
            if pos + size > len(body):
                raise ValueError("chunk extends past body")
            out += body[pos:pos + size]
            pos += size
            if body[pos:pos + 2] != _CRLF:
                raise ValueError("missing chunk terminator")
            pos += 2
        body = bytes(out)
    return status, headers, body


def warc_bytes(records: list[dict], gzip_records: bool = True) -> bytes:
    """Encode twin: records are dicts with keys ``warc_type`` (e.g.
    'response'), ``target_uri``, ``date``, ``payload`` (bytes), and
    optional ``content_type``/``record_id``. gzip_records=True emits
    one gzip member per record — the standard .warc.gz layout."""
    out = bytearray()
    for i, r in enumerate(records):
        payload = r["payload"]
        rid = r.get("record_id", f"<urn:uuid:00000000-0000-0000-0000-{i:012d}>")
        head = (
            b"WARC/1.0\r\n"
            + f"WARC-Type: {r.get('warc_type', 'response')}\r\n".encode()
            + f"WARC-Record-ID: {rid}\r\n".encode()
            + f"WARC-Date: {r.get('date', '2024-01-01T00:00:00Z')}\r\n".encode()
        )
        if r.get("target_uri"):
            head += f"WARC-Target-URI: {r['target_uri']}\r\n".encode()
        head += (
            f"Content-Type: {r.get('content_type', 'application/http;msgtype=response')}\r\n".encode()
            + f"Content-Length: {len(payload)}\r\n\r\n".encode()
        )
        rec = head + payload + b"\r\n\r\n"
        if gzip_records:
            co = zlib.compressobj(6, zlib.DEFLATED, 31)
            out += co.compress(rec) + co.flush()
        else:
            out += rec
    return bytes(out)


def http_response_bytes(
    body: bytes, status: int = 200, content_type: str = "text/html",
    chunked: bool = False, chunk_size: int = 64,
) -> bytes:
    """Encode twin for HTTP response payloads (identity or chunked)."""
    head = (
        f"HTTP/1.1 {status} OK\r\n"
        f"Content-Type: {content_type}\r\n"
    ).encode()
    if chunked:
        head += b"Transfer-Encoding: chunked\r\n\r\n"
        out = bytearray(head)
        for i in range(0, len(body), chunk_size):
            chunk = body[i:i + chunk_size]
            out += f"{len(chunk):x}\r\n".encode() + chunk + _CRLF
        out += b"0\r\n\r\n"
        return bytes(out)
    head += f"Content-Length: {len(body)}\r\n\r\n".encode()
    return head + body


WARC_DOC_SCHEMA = T.StructType([
    T.StructField("blob_id", T.LongType()),
    T.StructField("record_idx", T.IntegerType()),
    T.StructField("target_uri", T.StringType()),
    T.StructField("warc_date", T.StringType()),
    T.StructField("status", T.IntegerType()),
    T.StructField("content_type", T.StringType()),
    T.StructField("body", T.BinaryType()),
])


def warc_to_documents(
    blobs: DataFrame, blob_col: str = "blob", id_col: str = "blob_id",
    on_error: str = "null",
) -> DataFrame:
    """WARC blobs -> one row per HTTP response record. Non-response
    records (warcinfo, request, metadata) are skipped — the standard
    extraction posture. Error containment is TWO-LEVEL under
    on_error='null': a broken record WALK yields one
    (id, -1, ...) row for the blob, while a single malformed HTTP
    record yields one (id, record_idx, uri, date, -1, null, null) row
    for that record and every other record still extracts;
    'raise' propagates either."""
    if on_error not in ("null", "raise"):
        raise ValueError(f"on_error must be 'null' or 'raise', got {on_error!r}")
    sel = blobs.select(id_col, blob_col)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.name: [] for k in WARC_DOC_SCHEMA.fields}

            def emit(bid, idx, uri, date, status, ctype, body):
                rows["blob_id"].append(bid)
                rows["record_idx"].append(idx)
                rows["target_uri"].append(uri)
                rows["warc_date"].append(date)
                rows["status"].append(status)
                rows["content_type"].append(ctype)
                rows["body"].append(body)

            for bid, blob in zip(pdf[id_col], pdf[blob_col]):
                bid = int(bid)
                try:
                    recs = warc_records(bytes(blob))
                except Exception:
                    # container-level failure (the record walk itself
                    # broke): one error row for the whole blob
                    if on_error == "raise":
                        raise
                    emit(bid, -1, None, None, -1, None, None)
                    continue
                for idx, rec in enumerate(recs):
                    h = rec["headers"]
                    if h.get("warc-type") != "response":
                        continue
                    try:
                        # RECORD-level failure (one colon-less HTTP
                        # header among 50k records): an error row for
                        # THAT record only — a 1 GB archive's good
                        # documents must not vanish with it
                        status, hh, body = http_response(rec["payload"])
                    except Exception:
                        if on_error == "raise":
                            raise
                        emit(bid, idx, h.get("warc-target-uri"),
                             h.get("warc-date"), -1, None, None)
                        continue
                    emit(bid, idx, h.get("warc-target-uri"),
                         h.get("warc-date"), status,
                         hh.get("content-type"), body)
            yield pd.DataFrame(rows)

    return sel.mapInPandas(fn, WARC_DOC_SCHEMA)
