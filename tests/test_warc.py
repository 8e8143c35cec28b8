"""WARC/HTTP ingestion + html_to_text: encode-twin round trips,
multi-member gzip, chunked transfer decode, record-type filtering,
error policy, and the Spark/DuckDB extraction parity contract."""

import numpy as np
import pytest

from grasper_spark.sources.warc import (
    http_response,
    http_response_bytes,
    warc_bytes,
    warc_records,
    warc_to_documents,
)


def _mk_blob(texts, gz=True, chunked=False, status=200):
    recs = []
    for i, t in enumerate(texts):
        payload = http_response_bytes(
            t.encode(), status=status, chunked=chunked
        )
        recs.append({
            "warc_type": "response",
            "target_uri": f"http://example.org/{i}",
            "payload": payload,
        })
    return warc_bytes(recs, gzip_records=gz)


@pytest.mark.parametrize("gz", [False, True])
@pytest.mark.parametrize("chunked", [False, True])
def test_round_trip(gz, chunked):
    texts = ["hello world", "", "x" * 300]
    blob = _mk_blob(texts, gz=gz, chunked=chunked)
    recs = warc_records(blob)
    assert len(recs) == 3
    for i, rec in enumerate(recs):
        assert rec["headers"]["warc-type"] == "response"
        assert rec["headers"]["warc-target-uri"] == f"http://example.org/{i}"
        status, hh, body = http_response(rec["payload"])
        assert status == 200
        assert body == texts[i].encode()


def test_non_response_records_exist_and_parse():
    recs = [
        {"warc_type": "warcinfo", "payload": b"software: test\r\n",
         "content_type": "application/warc-fields"},
        {"warc_type": "request", "target_uri": "http://e.org/",
         "payload": b"GET / HTTP/1.1\r\n\r\n"},
        {"warc_type": "response", "target_uri": "http://e.org/",
         "payload": http_response_bytes(b"body")},
    ]
    parsed = warc_records(warc_bytes(recs))
    assert [r["headers"]["warc-type"] for r in parsed] == [
        "warcinfo", "request", "response"
    ]


def test_mixed_gzip_members_and_sizes():
    # every record its own member, bodies from tiny to multi-KB
    texts = ["a", "b" * 5000, "c d e"]
    blob = _mk_blob(texts, gz=True)
    assert blob[:2] == b"\x1f\x8b"
    assert [http_response(r["payload"])[2].decode()
            for r in warc_records(blob)] == texts


def test_malformed_blobs_raise_valueerror_only():
    good = _mk_blob(["content here"], gz=False)
    cases = [
        b"",
        b"WARC/9.9\r\n\r\n",
        good[:-2],                       # missing separator bytes
        good.replace(b"Content-Length", b"X-Nope", 1),
        good.replace(b"WARC/1.0", b"HTTP/1.1", 1),
        b"\x1f\x8b" + b"\x00" * 30,      # corrupt gzip
        _mk_blob(["x"], gz=True) + b"junk",  # trailing non-gzip bytes
    ]
    for blob in cases:
        with pytest.raises(ValueError):
            warc_records(blob)


def test_fuzz_bitflips_valueerror_only():
    blob = bytearray(_mk_blob(["some page text", "more"], gz=True))
    for i in range(0, len(blob), 3):
        q = bytearray(blob)
        q[i] ^= 0x55
        try:
            recs = warc_records(bytes(q))
            for r in recs:  # payload parse must also stay ValueError-only
                try:
                    http_response(r["payload"])
                except ValueError:
                    pass
        except ValueError:
            pass


def test_chunked_framing_errors():
    with pytest.raises(ValueError, match="chunk"):
        http_response(b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nzz\r\n")
    with pytest.raises(ValueError, match="status"):
        http_response(b"NOPE\r\n\r\nbody")


def test_warc_to_documents_rows_and_error_row(spark):
    from pyspark.sql import types as T

    blobs = [
        (1, bytearray(_mk_blob(["alpha beta", "gamma"], gz=True))),
        (2, bytearray(_mk_blob(["delta"], gz=False, chunked=True))),
        (3, bytearray(b"not a warc at all")),
    ]
    schema = T.StructType([
        T.StructField("blob_id", T.LongType()),
        T.StructField("blob", T.BinaryType()),
    ])
    out = warc_to_documents(spark.createDataFrame(blobs, schema)).collect()
    by_blob = {}
    for r in out:
        by_blob.setdefault(r["blob_id"], []).append(r)
    assert len(by_blob[1]) == 2
    assert sorted(bytes(r["body"]).decode() for r in by_blob[1]) == [
        "alpha beta", "gamma"
    ]
    assert by_blob[1][0]["status"] == 200
    assert bytes(by_blob[2][0]["body"]) == b"delta"
    assert by_blob[3][0]["record_idx"] == -1 and by_blob[3][0]["status"] == -1
    with pytest.raises(Exception):
        warc_to_documents(
            spark.createDataFrame(blobs, schema), on_error="raise"
        ).collect()


def test_one_bad_record_does_not_sink_the_archive(spark):
    # r8 review: record-level containment — one malformed HTTP record
    # among good ones yields ONE per-record error row, and every other
    # document still extracts
    from pyspark.sql import types as T

    recs = [
        {"warc_type": "response", "target_uri": "http://e.org/0",
         "payload": http_response_bytes(b"good one")},
        {"warc_type": "response", "target_uri": "http://e.org/bad",
         "payload": b"HTTP/1.1 200 OK\r\nno-colon-header\r\n\r\nbody"},
        {"warc_type": "response", "target_uri": "http://e.org/2",
         "payload": http_response_bytes(b"good two")},
    ]
    blobs = [(1, bytearray(warc_bytes(recs)))]
    schema = T.StructType([
        T.StructField("blob_id", T.LongType()),
        T.StructField("blob", T.BinaryType()),
    ])
    out = sorted(
        warc_to_documents(spark.createDataFrame(blobs, schema)).collect(),
        key=lambda r: r["record_idx"],
    )
    assert len(out) == 3
    assert bytes(out[0]["body"]) == b"good one"
    assert out[1]["status"] == -1 and out[1]["body"] is None
    assert out[1]["target_uri"] == "http://e.org/bad"
    assert bytes(out[2]["body"]) == b"good two"


def test_html_to_text_extraction(spark):
    from pyspark.sql import functions as F

    from grasper_spark.functions.text import html_to_text

    html = (
        '<html><!-- note --><head><title>My Page</title>'
        '<style type="text/css">p { color: red }</style></head>'
        "<body><p>Hello&nbsp;&lt;world&gt; &amp; friends</p>"
        "<script>var x = 1 < 2;</script>"
        "<div>line\n two</div></body></html>"
    )
    df = spark.createDataFrame([(html,)], ["h"])
    got = df.select(html_to_text(F.col("h")).alias("t")).collect()[0]["t"]
    assert got == "My Page Hello <world> & friends line two"


def test_html_to_text_matches_duckdb_re2(spark):
    """Parity contract: the DuckDB oracle runs the SAME regex/replace
    chain — both engines must extract identical text (RE2-compatible
    patterns; this is what makes the warc ledger arm hashable)."""
    import duckdb
    from pyspark.sql import functions as F

    from grasper_spark.functions.text import (
        HTML_ENTITIES, HTML_STRIP_PATTERNS, html_to_text,
    )

    rng = np.random.default_rng(5)
    words = ["alpha", "beta", "<b>bold</b>", "&amp;", "x<y", "1>0", "q&a"]
    docs = []
    for i in range(12):
        body = " ".join(rng.choice(words, size=rng.integers(1, 9)))
        docs.append(
            f"<html><head><title>t{i}</title><style>s{{x}}</style></head>"
            f"<body><p>{body}</p><script>if (1 &lt; 2) x();</script></body></html>"
        )
    df = spark.createDataFrame([(d,) for d in docs], ["h"])
    spark_out = [
        r["t"] for r in
        df.select(html_to_text(F.col("h")).alias("t")).collect()
    ]
    con = duckdb.connect()
    expr = "h"
    for pat, rep in HTML_STRIP_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', ' ', 'g')"
    for ent, ch in HTML_ENTITIES:
        lit = ch.replace("'", "''")
        expr = f"replace({expr}, '{ent}', '{lit}')"
    expr = f"trim(regexp_replace({expr}, '\\s+', ' ', 'g'))"
    duck_out = [
        con.execute(f"SELECT {expr} FROM (SELECT ? AS h)", [d]).fetchone()[0]
        for d in docs
    ]
    assert spark_out == duck_out
