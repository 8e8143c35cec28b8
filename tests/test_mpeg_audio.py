"""MPEG audio frame-header walk: encode-twin round trips over
version/layer/bitrate/sample-rate combinations, ID3v2/ID3v1 tag
skipping, VBR streams, exact duration math, corruption fuzz
(ValueError-only), and the media_decode_features dispatch row."""

import pytest

from grasper_spark.functions.mpeg_audio import (
    _BITRATES, _SAMPLE_RATES, _SAMPLES_PER_FRAME, mp3_bytes, mp3_features,
    mp3_frames,
)


def test_cbr_round_trip_all_tables():
    for (ver, layer), brs in _BITRATES.items():
        for sr in _SAMPLE_RATES[ver]:
            for br in (brs[0], brs[len(brs) // 2], brs[-1]):
                p = mp3_bytes([br] * 3, sr, version=ver, layer=layer)
                nf, got_br, got_sr, dur = mp3_features(p)
                assert (nf, got_br, got_sr) == (3, br, sr)
                assert dur == 3 * _SAMPLES_PER_FRAME[(ver, layer)] * 1000 // sr


def test_vbr_reports_first_frame_bitrate_and_every_frame():
    p = mp3_bytes([96, 320, 128, 40], 44100)
    frames = mp3_frames(p)
    assert [f[2] for f in frames] == [96, 320, 128, 40]
    nf, br, sr, dur = mp3_features(p)
    assert (nf, br, sr) == (4, 96, 44100)
    assert dur == 4 * 1152 * 1000 // 44100


def test_id3v2_and_id3v1_tags_skipped():
    plain = mp3_bytes([128] * 2, 48000)
    tagged = mp3_bytes([128] * 2, 48000, id3v2_size=99, id3v1=True)
    assert len(tagged) == len(plain) + 10 + 99 + 128
    assert mp3_features(tagged) == mp3_features(plain)


def test_padding_bit_tracks_441_remainder():
    # at 44100 Hz, 144*128000/44100 is fractional: CBR frames MUST
    # alternate padded/unpadded lengths (417/418) or the walk drifts
    p = mp3_bytes([128] * 10, 44100)
    lens = set()
    frames = mp3_frames(p)
    assert len(frames) == 10
    # re-walk manually to collect lengths
    pos = 0
    while pos < len(p):
        b3 = p[pos + 2]
        padding = (b3 >> 1) & 1
        lens.add(144 * 128000 // 44100 + padding)
        pos += 144 * 128000 // 44100 + padding
    assert lens == {417, 418}


def test_malformed_payloads_raise_valueerror_only():
    good = mp3_bytes([128] * 3, 44100, id3v2_size=20)
    cases = [
        b"",
        b"\xff",
        b"\xff\xfb\x90",
        good[:-1],                      # truncated final frame
        b"ID3\x04\x00\x00\x00\x00\x01\x00",  # tag past payload
        b"ID3\x04\x00\x00\x80\x00\x00\x00",  # non-syncsafe size byte
        b"\xff\xfb\x00\x44" + b"\x00" * 400,   # free-format bitrate
        b"\xff\xfb\xf0\x44" + b"\x00" * 400,   # invalid bitrate index
        b"\xff\xfb\x9c\x44" + b"\x00" * 400,   # reserved sample-rate idx
        b"\xff\xf9\x90\x44" + b"\x00" * 400,   # reserved layer bits (fb->f9)
        b"\xe0\xfb\x90\x44",                   # no sync at all
        good + b"\x00\x01\x02",               # trailing garbage < header
    ]
    for payload in cases:
        with pytest.raises(ValueError):
            mp3_frames(payload)


def test_sync_lost_midstream_raises():
    p = bytearray(mp3_bytes([128] * 3, 44100))
    # corrupt the SECOND frame's sync byte (first frame is 417 or 418
    # bytes depending on its padding bit)
    pos = 144 * 128000 // 44100 + ((p[2] >> 1) & 1)
    p[pos] = 0x00
    with pytest.raises(ValueError, match="lost frame sync"):
        mp3_frames(bytes(p))


def test_mixed_sample_rate_stream_rejected():
    a = mp3_bytes([128], 44100)
    b = mp3_bytes([128], 48000)
    # frame walk succeeds (each frame is self-describing)...
    assert len(mp3_frames(a + b)) == 2
    # ...but the features contract refuses to average mixed streams
    with pytest.raises(ValueError, match="mixed"):
        mp3_features(a + b)


def test_encoder_rejects_invalid_parameters():
    with pytest.raises(ValueError, match="bitrate"):
        mp3_bytes([123], 44100)
    with pytest.raises(ValueError, match="sample rate"):
        mp3_bytes([128], 22050)  # MPEG-2 rate with version=1
    with pytest.raises(ValueError, match="version/layer"):
        mp3_bytes([64], 22050, version=2, layer=1)


def test_pipeline_mp3_rows_and_ogg_error(spark):
    from pyspark.sql import types as T

    from grasper_spark.functions.multimodal import media_decode_features

    rows = [
        (1, bytearray(mp3_bytes([160, 96], 32000, id3v2_size=12))),
        (2, bytearray(b"OggS\x00\x02" + b"\x00" * 16)),
    ]
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    out = {r["media_id"]: r for r in media_decode_features(
        spark.createDataFrame(rows, schema)
    ).collect()}
    assert out[1]["op"] == "mp3"
    assert (out[1]["a"], out[1]["b"], out[1]["c"]) == (2, 160, 32000)
    assert out[1]["d"] == 2 * 1152 * 1000 // 32000
    # Ogg: no implemented decoder -> decode_real -> error row
    assert out[2]["op"] == "error"


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False


if _HYP:

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(st.sampled_from(_BITRATES[(1, 3)]), min_size=1, max_size=8),
        st.sampled_from(_SAMPLE_RATES[1]),
        st.integers(min_value=0, max_value=200),
        st.booleans(),
        st.integers(min_value=0, max_value=2**31 - 1),
    )
    def test_walk_round_trip_property(brs, sr, id3v2, id3v1, seed):
        p = mp3_bytes([int(b) for b in brs], sr, id3v2_size=id3v2,
                      id3v1=id3v1, fill_seed=seed)
        frames = mp3_frames(p)
        assert [f[2] for f in frames] == list(brs)
        assert all(f[3] == sr for f in frames)

    @settings(max_examples=60, deadline=None)
    @given(st.binary(min_size=0, max_size=600))
    def test_fuzz_raises_valueerror_only(junk):
        try:
            mp3_frames(junk)
        except ValueError:
            pass  # the only permitted failure mode
