"""FLAC codec: lossless round trips (exactness holds for ARBITRARY
audio, unlike the transform codecs), all four stereo decorrelation
modes, handcrafted streams for the decoder paths the encoder never
emits (LPC subframes, rice escape codes, multi-partition residuals,
wasted bits), CRC/MD5 integrity, corruption fuzz, and the pipeline
dispatch row."""

import struct

import numpy as np
import pytest

from grasper_spark.functions.flac import (
    _crc8,
    _crc16,
    _Writer,
    _utf8_number,
    decode_flac,
    flac_bytes,
    synth_flac_samples,
)


def test_mono_round_trip_exact():
    rng = np.random.default_rng(1)
    for n in (1, 5, 255, 256, 257, 1000):
        s = rng.integers(-32768, 32768, n, dtype=np.int64)
        sr, got = decode_flac(flac_bytes(s, 8000))
        assert sr == 8000 and got.shape == (n, 1)
        assert np.array_equal(got[:, 0], s)


def test_fixed_predictor_families():
    # constant, linear ramp, random walk: orders 0-2 all round-trip
    rng = np.random.default_rng(2)
    for s in (
        np.full(300, 1234, dtype=np.int64),
        np.arange(300, dtype=np.int64) * 3 - 400,
        np.cumsum(rng.integers(-5, 6, 300)).astype(np.int64),
        np.array([-32768, 32767] * 150, dtype=np.int64),
    ):
        sr, got = decode_flac(flac_bytes(s, 44100))
        assert np.array_equal(got[:, 0], s)


@pytest.mark.parametrize(
    "mode", ["independent", "left-side", "right-side", "mid-side"]
)
def test_stereo_decorrelation_modes(mode):
    rng = np.random.default_rng(hash(mode) % 100)
    st = rng.integers(-32768, 32768, (777, 2), dtype=np.int64)
    sr, got = decode_flac(flac_bytes(st, 48000, stereo_mode=mode))
    assert np.array_equal(got, st)


def test_8bit_and_odd_block_sizes():
    rng = np.random.default_rng(3)
    s8 = rng.integers(-128, 128, 100, dtype=np.int64)
    _, got = decode_flac(flac_bytes(s8, 16000, bps=8))
    assert np.array_equal(got[:, 0], s8)
    s = rng.integers(-1000, 1000, 777, dtype=np.int64)
    _, got = decode_flac(flac_bytes(s, 8000, block_size=100))
    assert np.array_equal(got[:, 0], s)


def _frame_stream(body_writer, bs, bps=16, nch=1, sr=8000):
    """Assemble a single-frame FLAC stream around a handcrafted
    subframe body (for decoder paths the encoder never emits)."""
    info = _Writer()
    info.bits(bs, 16)
    info.bits(bs, 16)
    info.bits(0, 24)
    info.bits(0, 24)
    info.bits(sr, 20)
    info.bits(nch - 1, 3)
    info.bits(bps - 1, 5)
    info.bits(bs, 36)
    out = bytearray(b"fLaC")
    body = bytes(info.out) + b"\x00" * 16  # zero MD5: decoder skips check
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body
    hdr = _Writer()
    hdr.bits(0b11111111111110, 14)
    hdr.bits(0, 2)
    hdr.bits(0b0111, 4)  # 16-bit block size follows
    hdr.bits(0x4, 4)     # 8000 Hz
    hdr.bits(nch - 1, 4)
    hdr.bits(0b100 if bps == 16 else 0b001, 3)
    hdr.bits(0, 1)
    head = bytes(hdr.out) + _utf8_number(0) + struct.pack(">H", bs - 1)
    head += bytes([_crc8(head)])
    fw = _Writer()
    body_writer(fw)
    fw.align()
    frame = head + bytes(fw.out)
    out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


def test_handcrafted_lpc_subframe():
    # order-2 LPC: coefs (3, -1), shift 1, warmup (10, 20), residuals 0
    # => x[i] = (3*x[i-1] - x[i-2]) >> 1
    bs = 16

    def body(w):
        w.bits(0, 1)
        w.bits(0b100000 | 1, 6)  # LPC, order = (tp & 31) + 1 = 2
        w.bits(0, 1)
        for v in (10, 20):
            w.bits(v, 16)
        w.bits(3, 4)  # precision - 1 = 3 -> 4-bit coefs
        w.bits(1, 5)  # shift 1
        w.bits(3, 4)  # coef 3
        w.bits(-1 & 0xF, 4)  # coef -1
        w.bits(0b00, 2)
        w.bits(0, 4)
        w.bits(0, 4)  # rice param 0
        for _ in range(bs - 2):
            w.bits(1, 1)  # zigzag 0 = unary q=0 -> single 1 bit

    sr, got = decode_flac(_frame_stream(body, bs))
    exp = [10, 20]
    for _ in range(bs - 2):
        exp.append((3 * exp[-1] - exp[-2]) >> 1)
    assert got[:, 0].tolist() == exp


def test_handcrafted_rice_escape_and_partitions():
    # partition order 1 (two partitions): first rice param 0, second an
    # ESCAPE (verbatim 5-bit residuals)
    bs = 8

    def body(w):
        w.bits(0, 1)
        w.bits(0b001001, 6)  # fixed order 1
        w.bits(0, 1)
        w.bits(7, 16)  # warmup sample
        w.bits(0b00, 2)
        w.bits(1, 4)  # partition order 1
        w.bits(0, 4)  # partition 1: rice param 0
        for _ in range(bs // 2 - 1):
            w.bits(1, 1)  # residual 0
        w.bits(0xF, 4)  # partition 2: escape
        w.bits(5, 5)    # 5-bit verbatim residuals
        for v in (1, -2, 3, -4):
            w.bits(v & 0x1F, 5)

    sr, got = decode_flac(_frame_stream(body, bs))
    exp = [7, 7, 7, 7, 8, 6, 9, 5]  # order-1: x[i] = x[i-1] + res
    assert got[:, 0].tolist() == exp


def test_handcrafted_wasted_bits():
    # verbatim subframe with 2 wasted bits: stored at 14 bits, output
    # shifted left by 2
    bs = 4
    vals = [4, -8, 12, -16]  # all divisible by 4

    def body(w):
        w.bits(0, 1)
        w.bits(0b000001, 6)  # verbatim
        w.bits(1, 1)  # wasted-bits flag
        w.bits(1, 2)  # unary 2: one 0 then 1 -> wasted = 2
        for v in vals:
            w.bits((v >> 2) & 0x3FFF, 14)

    sr, got = decode_flac(_frame_stream(body, bs))
    assert got[:, 0].tolist() == vals


def test_integrity_crc_and_md5():
    s = np.arange(500, dtype=np.int64) % 97 - 48
    p = bytearray(flac_bytes(s, 8000))
    # flip one bit inside frame data -> CRC-16 (or rice) failure
    q = bytearray(p)
    q[-10] ^= 0x01
    with pytest.raises(ValueError):
        decode_flac(bytes(q))
    # tamper the STREAMINFO MD5 -> decoded-audio MD5 mismatch
    q = bytearray(p)
    q[8 + 18] ^= 0xFF  # first MD5 byte (4 magic + 4 header + 18 info)
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(q))


def test_fuzz_every_byte_valueerror_or_exact():
    rng = np.random.default_rng(5)
    s = rng.integers(-32768, 32768, (120, 2), dtype=np.int64)
    p = bytearray(flac_bytes(s, 44100, stereo_mode="mid-side"))
    silent_wrong = 0
    for i in range(len(p)):
        q = bytearray(p)
        q[i] ^= 0x55
        try:
            _, got = decode_flac(bytes(q))
            if not np.array_equal(got, s):
                silent_wrong += 1
        except ValueError:
            pass
    assert silent_wrong == 0  # CRC-8/CRC-16/MD5 leave no silent path


def test_synth_closed_forms():
    for mid in (2, 4, 17, 96, 100):
        st = synth_flac_samples(mid)
        assert st.shape == (64 + mid % 64, 2)
        i = np.arange(st.shape[0], dtype=np.int64)
        assert np.array_equal(
            st[:, 0], (mid * 7919 + i * 104729) % 65536 - 32768
        )
        for mode in ("independent", "left-side", "right-side", "mid-side"):
            _, got = decode_flac(flac_bytes(st, 8000, stereo_mode=mode))
            assert np.array_equal(got, st)


def test_pipeline_flc_rows_route(spark):
    from pyspark.sql import types as T

    from grasper_spark.functions.multimodal import media_decode_features

    st = synth_flac_samples(4)
    rows = [(1, bytearray(flac_bytes(st, 8000, stereo_mode="mid-side")))]
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ])
    out = media_decode_features(spark.createDataFrame(rows, schema)).collect()
    s64 = st.astype(np.int64)
    assert out[0]["op"] == "flc"
    assert (out[0]["a"], out[0]["b"]) == (8000, st.shape[0])
    assert out[0]["c"] == int((s64 * s64).sum())
    assert out[0]["d"] == int(np.abs(s64).max())


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st_

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False


if _HYP:

    @settings(max_examples=40, deadline=None)
    @given(
        st_.lists(st_.integers(min_value=-32768, max_value=32767),
                  min_size=1, max_size=600),
        st_.sampled_from([8000, 44100, 12345]),
        st_.sampled_from([64, 256, 192]),
    )
    def test_lossless_property_mono(samples, sr, bs):
        s = np.array(samples, dtype=np.int64)
        got_sr, got = decode_flac(flac_bytes(s, sr, block_size=bs))
        assert got_sr == sr
        assert np.array_equal(got[:, 0], s)

    @settings(max_examples=30, deadline=None)
    @given(
        st_.integers(min_value=0, max_value=2**31 - 1),
        st_.sampled_from(
            ["independent", "left-side", "right-side", "mid-side"]
        ),
    )
    def test_lossless_property_stereo(seed, mode):
        rng = np.random.default_rng(seed)
        s = rng.integers(-32768, 32768,
                         (int(rng.integers(1, 500)), 2), dtype=np.int64)
        _, got = decode_flac(flac_bytes(s, 8000, stereo_mode=mode))
        assert np.array_equal(got, s)
