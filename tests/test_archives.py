"""ZIP / TAR archive walks: encode-twin round trips, CRC/checksum
integrity, gzip wrappers, corruption fuzz (ValueError-only), and the
Spark operator with per-blob error rows."""

import struct
import zlib

import pytest

from grasper_spark.sources.archives import (
    archive_to_documents,
    tar_bytes,
    tar_members,
    zip_bytes,
    zip_members,
)

MEMBERS = [
    ("a.txt", b"hello world"),
    ("dir/b.bin", bytes(range(256)) * 5),
    ("empty", b""),
]


@pytest.mark.parametrize("compress", [True, False])
def test_zip_round_trip(compress):
    got = zip_members(zip_bytes(MEMBERS, compress=compress))
    assert got == MEMBERS


@pytest.mark.parametrize("gz", [True, False])
def test_tar_round_trip(gz):
    got = tar_members(tar_bytes(MEMBERS, gz=gz))
    assert got == MEMBERS


def test_zip_crc_and_structure_errors():
    blob = bytearray(zip_bytes(MEMBERS))
    # corrupt one payload byte of the first member -> CRC mismatch
    q = bytearray(blob)
    q[40] ^= 0xFF
    with pytest.raises(ValueError):
        zip_members(bytes(q))
    with pytest.raises(ValueError, match="end-of-central"):
        zip_members(b"PK\x03\x04 but no directory")
    with pytest.raises(ValueError, match="method"):
        # method 99 in both CD and local header
        b = bytearray(zip_bytes([("x", b"data")], compress=False))
        b[8:10] = struct.pack("<H", 99)
        cd = b.rfind(b"PK\x01\x02")
        b[cd + 10:cd + 12] = struct.pack("<H", 99)
        zip_members(bytes(b))


def test_tar_checksum_and_type_errors():
    blob = bytearray(tar_bytes(MEMBERS))
    q = bytearray(blob)
    q[0] ^= 0x01  # corrupt name -> checksum mismatch
    with pytest.raises(ValueError, match="checksum"):
        tar_members(bytes(q))
    q = bytearray(blob)
    # flip type flag to an unsupported one and refresh the checksum
    hdr = bytearray(q[:512])
    hdr[156] = ord("7")
    hdr[148:156] = b" " * 8
    hdr[148:156] = f"{sum(hdr):06o}\x00 ".encode()
    q[:512] = hdr
    with pytest.raises(ValueError, match="entry type"):
        tar_members(bytes(q))
    with pytest.raises(ValueError):
        tar_members(blob[:700])  # truncated member


def test_fuzz_bitflips_valueerror_only():
    for blob in (zip_bytes(MEMBERS), tar_bytes(MEMBERS, gz=True)):
        for i in range(0, len(blob), 5):
            q = bytearray(blob)
            q[i] ^= 0x55
            try:
                if q[:2] == b"PK":
                    zip_members(bytes(q))
                else:
                    tar_members(bytes(q))
            except ValueError:
                pass


def test_archive_to_documents_all_formats(spark):
    from pyspark.sql import types as T

    blobs = [
        (1, bytearray(zip_bytes(MEMBERS))),
        (2, bytearray(tar_bytes(MEMBERS, gz=True))),
        (3, bytearray(tar_bytes(MEMBERS, gz=False))),
        (4, bytearray(b"garbage that is no archive")),
    ]
    schema = T.StructType([
        T.StructField("blob_id", T.LongType()),
        T.StructField("blob", T.BinaryType()),
    ])
    out = archive_to_documents(spark.createDataFrame(blobs, schema)).collect()
    by_blob = {}
    for r in out:
        by_blob.setdefault(r["blob_id"], []).append(r)
    for bid in (1, 2, 3):
        rows = sorted(by_blob[bid], key=lambda r: r["member_idx"])
        assert [(r["name"], bytes(r["body"])) for r in rows] == MEMBERS
        assert [r["n_bytes"] for r in rows] == [len(d) for _, d in MEMBERS]
    assert by_blob[4][0]["member_idx"] == -1
    with pytest.raises(Exception):
        archive_to_documents(
            spark.createDataFrame(blobs, schema), on_error="raise"
        ).collect()


def test_concatenated_tar_gz_members_all_parse():
    # r8 review: concatenated .tar.gz files are valid gzip AND valid
    # (--ignore-zeros) tar — both members must come back, never a
    # silent first-archive-only truncation
    a = tar_bytes([("a.txt", b"AAA")], gz=True)
    b = tar_bytes([("b.txt", b"BBB")], gz=True)
    got = tar_members(a + b)
    assert got == [("a.txt", b"AAA"), ("b.txt", b"BBB")]
    # plain concatenated tars too
    got = tar_members(tar_bytes([("a", b"1")]) + tar_bytes([("b", b"2")]))
    assert got == [("a", b"1"), ("b", b"2")]
    with pytest.raises(ValueError, match="trailing non-gzip"):
        tar_members(a + b"junk after gzip")


def test_empty_zip_surfaces_as_error():
    # r8 review: an EOCD-only blob sniffs as ZIP; zip_members must
    # raise (not return []) so the Spark operator emits an error row
    eocd = struct.pack("<IHHHHIIH", 0x06054B50, 0, 0, 0, 0, 0, 0, 0)
    with pytest.raises(ValueError, match="no members"):
        zip_members(eocd)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False


if _HYP:

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.text(
                    alphabet="abcdefghij_/.", min_size=1, max_size=30
                ).filter(lambda s: not s.startswith("/")),
                st.binary(max_size=2000),
            ),
            min_size=1, max_size=6,
        ),
        st.booleans(),
        st.booleans(),
    )
    def test_round_trip_property(members, use_zip, flag):
        names = [f"{i}_{n}" for i, (n, _) in enumerate(members)]
        ms = [(nm, d) for nm, (_, d) in zip(names, members)]
        if use_zip:
            got = zip_members(zip_bytes(ms, compress=flag))
        else:
            got = tar_members(tar_bytes(ms, gz=flag))
        assert got == ms
