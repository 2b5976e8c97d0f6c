"""HTML/binary ingestion helpers (reference tests:43-70 and :73-127 analogues)."""

from pyspark.sql import functions as F

from daft_minhash_dedupe_spark.functions.html import (
    html_to_text,
    lenient_utf8_decode,
    remove_http_headers,
)


def test_remove_http_headers(spark):
    rows = [
        ("Header-A: x\r\nHeader-B: y\r\n\r\n<body>hi</body>",),
        ("no-headers-here",),
        (None,),
        ("",),
    ]
    df = spark.createDataFrame(rows, "warc_content string")
    got = [r["h"] for r in df.select(remove_http_headers(F.col("warc_content")).alias("h")).collect()]
    assert got == ["<body>hi</body>", "", "", ""]


def test_lenient_utf8_decode(spark):
    rows = [(b"hello",), (b"caf\xc3\xa9",), (b"bad\xff\xfebytes",), (None,)]
    df = spark.createDataFrame(rows, "b binary")
    got = [r["s"] for r in df.select(lenient_utf8_decode(F.col("b")).alias("s")).collect()]
    assert got[0] == "hello"
    assert got[1] == "café"
    assert "bad" in got[2] and "�" in got[2]
    assert got[3] is None


def test_html_to_text(spark):
    html = """<html><head><style>.x{color:red}</style><script>var a=1;</script>
    <title>Title</title></head>
    <body><h1>Head&amp;er</h1><p>Hello <b>world</b>.</p>
    <noscript>ignore me</noscript><!-- comment -->
    </body></html>"""
    df = spark.createDataFrame([(html,)], "html string")
    got = df.select(html_to_text(F.col("html")).alias("t")).first()["t"]
    assert "Title" in got and "Head&er" in got and "Hello world" in got
    assert "ignore me" not in got and "color:red" not in got and "var a=1" not in got
