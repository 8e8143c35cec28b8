"""Real WAV/BMP decode: byte-level round-trips, chunk walking, stride
padding, error policy, and the Spark mapInPandas pipeline."""

import struct

import numpy as np
import pytest


def test_wav_round_trip_exact():
    from grasper_spark.functions.multimodal import decode_wav, wav_bytes

    s = np.array([0, 1, -1, 32767, -32768, 12345], dtype=np.int16)
    sr, ch, got = decode_wav(wav_bytes(s, sample_rate=44100))
    assert (sr, ch) == (44100, 1)
    assert np.array_equal(got, s)


def test_wav_odd_data_length_word_aligned():
    from grasper_spark.functions.multimodal import decode_wav, wav_bytes

    # 3 samples -> 6 data bytes (even), craft an odd-size unknown chunk
    # AFTER fmt and BEFORE data to force the aligned walk
    s = np.array([5, -5, 7], dtype=np.int16)
    payload = wav_bytes(s)
    # splice a 3-byte 'junk' chunk right after the fmt chunk (ends at
    # 12 + 8 + 16 = 36)
    junk = struct.pack("<4sI", b"junk", 3) + b"abc" + b"\x00"  # padded
    spliced = payload[:36] + junk + payload[36:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    sr, ch, got = decode_wav(spliced)
    assert np.array_equal(got, s)


def test_wav_8bit_pcm_rebased():
    from grasper_spark.functions.multimodal import decode_wav

    data = bytes([128, 129, 127, 255, 0])
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 8000, 8000, 1, 8)
    body = b"WAVE" + fmt + struct.pack("<4sI", b"data", len(data)) + data + b"\x00"
    payload = struct.pack("<4sI", b"RIFF", len(body)) + body
    _, _, got = decode_wav(payload)
    assert got.tolist() == [0, 1, -1, 127, -128]


def test_wav_rejects_compressed_and_garbage():
    from grasper_spark.functions.multimodal import decode_wav

    with pytest.raises(ValueError):
        decode_wav(b"\xff\xd8\xff\xe0 not riff")
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 7, 1, 8000, 8000, 1, 8)  # mu-law
    body = b"WAVE" + fmt + struct.pack("<4sI", b"data", 1) + b"\x00" + b"\x00"
    with pytest.raises(ValueError, match="compressed WAV"):
        decode_wav(struct.pack("<4sI", b"RIFF", len(body)) + body)


def test_truncated_payloads():
    """Production posture: a WAV whose data chunk is cut mid-sample
    decodes the complete samples present (demuxer behavior); a BMP with
    a truncated pixel array raises (caught by on_error='null')."""
    from grasper_spark.functions.multimodal import (
        bmp_bytes, decode_bmp, decode_wav, wav_bytes,
    )

    s = np.array([100, -200, 300, -400], dtype=np.int16)
    payload = wav_bytes(s)
    # cutting 3 bytes leaves 5 data bytes -> 2 complete samples
    _, _, got = decode_wav(payload[:-3])
    assert got.tolist() == [100, -200]
    px = np.ones((4, 4, 3), dtype=np.uint8)
    with pytest.raises(ValueError):
        decode_bmp(bmp_bytes(px)[:-10])


@pytest.mark.parametrize("w,h", [(4, 3), (5, 2), (6, 4), (7, 1), (1, 1)])
def test_bmp_round_trip_all_strides(w, h):
    from grasper_spark.functions.multimodal import bmp_bytes, decode_bmp

    rng = np.random.default_rng(w * 100 + h)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(bmp_bytes(px)), px)


def test_bmp_top_down_layout():
    from grasper_spark.functions.multimodal import bmp_bytes, decode_bmp

    px = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    payload = bytearray(bmp_bytes(px))
    # flip the height sign to -2 (top-down) and reverse the stored rows
    payload[22:26] = struct.pack("<i", -2)
    stride = (2 * 3 + 3) // 4 * 4
    off = 54
    r0, r1 = payload[off:off + stride], payload[off + stride:off + 2 * stride]
    payload[off:off + 2 * stride] = r1 + r0
    assert np.array_equal(decode_bmp(bytes(payload)), px)


def test_bmp_rejects_unsupported():
    from grasper_spark.functions.multimodal import bmp_bytes, decode_bmp

    px = np.zeros((2, 2, 3), dtype=np.uint8)
    payload = bytearray(bmp_bytes(px))
    payload[28:30] = struct.pack("<H", 8)  # 8bpp palette
    with pytest.raises(ValueError, match="unsupported BMP"):
        decode_bmp(bytes(payload))
    with pytest.raises(ValueError):
        decode_bmp(b"PK\x03\x04 definitely a zip")


def test_synth_formulas_match_decoders():
    from grasper_spark.functions.multimodal import (
        bmp_bytes, decode_bmp, decode_wav, synth_bmp_pixels,
        synth_wav_samples, wav_bytes,
    )

    for mid in (0, 1, 2, 17, 96, 97, 128):
        s = synth_wav_samples(mid)
        assert len(s) == 64 + mid % 64
        _, _, got = decode_wav(wav_bytes(s))
        assert np.array_equal(got, s)
        px = synth_bmp_pixels(mid)
        assert px.shape == (3 + mid % 4, 4 + mid % 5, 3)
        assert np.array_equal(decode_bmp(bmp_bytes(px)), px)


def test_pipeline_decodes_and_flags_errors(spark):
    from grasper_spark.functions.multimodal import (
        luma_int, media_decode_features, synth_bmp_pixels,
        synth_wav_samples, synthetic_media,
    )

    docs = spark.createDataFrame([(i,) for i in range(40)] + [(97,)], ["doc_id"])
    rows = {r.media_id: r for r in
            media_decode_features(synthetic_media(docs)).collect()}
    assert len(rows) == 41
    # id 0 and 97: Ogg magic -> error rows under the null policy
    assert rows[0].op == "error" and rows[0].a == -1
    assert rows[97].op == "error"
    # even ids: wav features equal the closed form
    s = synth_wav_samples(2).astype(np.int64)
    assert rows[2].op == "wav" and rows[2].a == 8000
    assert rows[2].b == len(s) and rows[2].c == int((s * s).sum())
    assert rows[2].d == int(np.abs(s).max())
    # odd ids % 4 == 1: bmp features equal the closed form
    lu = luma_int(synth_bmp_pixels(5))
    assert rows[5].op == "bmp"
    assert (rows[5].a, rows[5].b) == (4 + 5 % 5, 3 + 5 % 4)  # (w=4, h=4)
    assert rows[5].c == int(lu.sum()) and rows[5].d == int(lu[0, 0])
    # odd ids % 4 == 3: real zlib-compressed PNG (RGBA)
    from grasper_spark.functions.multimodal import synth_png_pixels

    ppx = synth_png_pixels(7)
    plu = luma_int(ppx[..., :3])
    assert rows[7].op == "png"
    assert (rows[7].a, rows[7].b) == (ppx.shape[1], ppx.shape[0])
    assert rows[7].c == int(plu.sum())
    assert rows[7].d == int(ppx[..., 3].astype(np.int64).sum())


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False


if _HYP:

    @settings(max_examples=50, deadline=None)
    @given(
        st.lists(st.integers(min_value=-32768, max_value=32767), max_size=300),
        st.sampled_from([8000, 16000, 44100]),
    )
    def test_wav_round_trip_property(samples, sr):
        from grasper_spark.functions.multimodal import decode_wav, wav_bytes

        s = np.array(samples, dtype=np.int16)
        got_sr, ch, got = decode_wav(wav_bytes(s, sample_rate=sr))
        assert got_sr == sr and ch == 1
        assert np.array_equal(got, s)

    @settings(max_examples=40, deadline=None)
    @given(
        st.integers(min_value=1, max_value=9),
        st.integers(min_value=1, max_value=9),
        st.integers(min_value=0, max_value=2**32 - 1),
        st.lists(
            st.tuples(
                st.binary(min_size=4, max_size=4),
                st.binary(min_size=0, max_size=9),
            ),
            max_size=3,
        ),
    )
    def test_bmp_and_chunk_walk_property(w, h, seed, junk_chunks):
        """BMP round-trips at every stride; WAV survives arbitrary junk
        chunks spliced between fmt and data (word-aligned walk)."""
        import struct

        from grasper_spark.functions.multimodal import (
            bmp_bytes, decode_bmp, decode_wav, wav_bytes,
        )

        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(bmp_bytes(px)), px)

        s = rng.integers(-32768, 32768, size=int(seed % 17), dtype=np.int64).astype(np.int16)
        payload = wav_bytes(s)
        splice = b""
        for cid, body in junk_chunks:
            if cid in (b"fmt ", b"data", b"RIFF", b"WAVE"):
                cid = b"junk"
            splice += struct.pack("<4sI", cid, len(body)) + body
            if len(body) % 2:
                splice += b"\x00"
        spliced = payload[:36] + splice + payload[36:]
        spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
        _, _, got = decode_wav(spliced)
        assert np.array_equal(got, s)


def test_image_resize_nn_exact_indices():
    from grasper_spark.functions.multimodal import image_resize_nn

    px = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(6, 4, 3)
    rz = image_resize_nn(px, 2, 2)
    # ys = (0*6//2, 1*6//2) = (0, 3); xs = (0, 2)
    assert rz.shape == (2, 2, 3)
    assert np.array_equal(rz[0, 0], px[0, 0]) and np.array_equal(rz[0, 1], px[0, 2])
    assert np.array_equal(rz[1, 0], px[3, 0]) and np.array_equal(rz[1, 1], px[3, 2])
    # identity resize
    assert np.array_equal(image_resize_nn(px, 6, 4), px)
    # upscale duplicates nearest rows/cols
    up = image_resize_nn(px[:2, :2], 4, 4)
    assert np.array_equal(up[0], up[1]) and np.array_equal(up[:, 0], up[:, 1])


def test_audio_decimate():
    from grasper_spark.functions.multimodal import audio_decimate

    s = np.arange(10, dtype=np.int16)
    assert audio_decimate(s, 1).tolist() == s.tolist()
    assert audio_decimate(s, 4).tolist() == [0, 4, 8]
    assert audio_decimate(s, 3).tolist() == [0, 3, 6, 9]
    with pytest.raises(ValueError):
        audio_decimate(s, 0)


def test_dec_rsz_oracle_arms_match_library():
    """The entry's dec/rsz DuckDB closed forms must equal the library
    kernels applied to the decoded arrays — checked here without Spark."""
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd

    import __spark_entry__ as e
    from grasper_spark.functions.multimodal import (
        audio_decimate, image_resize_nn, luma_int, synth_bmp_pixels,
        synth_wav_samples,
    )

    ids = [1, 2, 3, 4, 17, 96, 98, 101]
    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"doc_id": ids, "text": ["x"] * len(ids)}))
    sql = e.oracle_sql()["multimodal_features"]
    got = {
        (r[0], r[1]): tuple(r[2:])
        for r in con.execute(sql).fetchall()
        if r[0] in ("dec", "rsz")
    }
    for mid in ids:
        if mid % 97 == 0:
            continue
        if mid % 2 == 0:
            d4 = audio_decimate(synth_wav_samples(mid).astype(np.int64), 4)
            assert got[("dec", mid)] == (
                4, len(d4), int((d4 * d4).sum()), int(np.abs(d4).max())
            )
        else:
            rz = luma_int(image_resize_nn(synth_bmp_pixels(mid), 2, 2))
            assert got[("rsz", mid)] == (2, 2, int(rz.sum()), int(rz[0, 0]))


def test_byte_stats_trailing_empty_does_not_corrupt_neighbor():
    """Regression: offset-clipped reduceat truncated the LAST non-empty
    payload's segment whenever the batch ended with empty payloads
    ([b'abc', b''] summed 195 instead of 294)."""
    from grasper_spark.functions.multimodal import byte_stats

    lens, sums, firsts = byte_stats([b"abc", b""])
    assert sums.tolist() == [294, 0] and lens.tolist() == [3, 0]
    assert firsts.tolist() == [97, -1]
    lens, sums, firsts = byte_stats([b"abc", None, b"", b"zz", b"", None])
    assert sums.tolist() == [294, 0, 0, 244, 0, 0]
    lens, sums, firsts = byte_stats([b"", None])
    assert sums.tolist() == [0, 0] and firsts.tolist() == [-1, -1]
    lens, sums, firsts = byte_stats([])
    assert len(lens) == 0


def test_wav_truncated_fmt_raises_valueerror():
    from grasper_spark.functions.multimodal import decode_wav, wav_bytes

    import numpy as _np

    payload = wav_bytes(_np.array([1, 2], dtype=_np.int16))
    # cut INSIDE the fmt body (fmt chunk spans bytes 12..36)
    with pytest.raises(ValueError, match="truncated fmt"):
        decode_wav(payload[:30])


def test_extract_features_vectorized_handles_empty_payloads(spark):
    from pyspark.sql import functions as F

    from grasper_spark.functions.multimodal import extract_features

    media = spark.createDataFrame(
        [(1, b"abc"), (2, b""), (3, None), (4, b"\x00"), (5, b"zz")],
        ["media_id", "payload"],
    ).withColumn("media_type", F.lit("image"))
    rows = {r.media_id: r for r in extract_features(media).collect()}
    assert (rows[1].n_bytes, rows[1].byte_sum, rows[1].first_byte) == (3, 294, 97)
    for mid in (2, 3):  # empty and null payloads mid-batch
        assert (rows[mid].n_bytes, rows[mid].byte_sum, rows[mid].first_byte) == (0, 0, -1)
    assert (rows[4].n_bytes, rows[4].byte_sum, rows[4].first_byte) == (1, 0, 0)
    assert (rows[5].n_bytes, rows[5].byte_sum, rows[5].first_byte) == (2, 244, 122)


def test_streaming_media_decode_matches_batch(spark, tmp_path):
    """media_decode_features is stateless mapInPandas, so it runs
    unchanged over a stream — the decode twin for ingest pipelines."""
    from grasper_spark.functions.multimodal import (
        media_decode_features, synthetic_media,
    )

    docs = spark.createDataFrame([(i,) for i in range(1, 9)], ["doc_id"])
    src = str(tmp_path / "media_stream")
    synthetic_media(docs).write.parquet(src)
    stream = spark.readStream.schema(
        "media_id long, payload binary, media_type string"
    ).parquet(src)
    q = (
        media_decode_features(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("media_decode_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(tuple(r) for r in spark.sql("select * from media_decode_out").collect())
    want = sorted(
        tuple(r)
        for r in media_decode_features(
            spark.read.parquet(src)
        ).collect()
    )
    assert got == want and len(got) == 8


def test_pipeline_raise_policy_propagates(spark):
    from grasper_spark.functions.multimodal import media_decode_features, synthetic_media

    docs = spark.createDataFrame([(0,)], ["doc_id"])  # 0 % 97 == 0 -> Ogg stub
    with pytest.raises(Exception, match="NotImplementedError|decode libs"):
        media_decode_features(synthetic_media(docs), on_error="raise").collect()
    with pytest.raises(ValueError, match="on_error"):
        media_decode_features(synthetic_media(docs), on_error="ignore")
