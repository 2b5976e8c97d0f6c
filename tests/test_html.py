"""HTML/binary ingestion helpers (reference tests:43-70 and :73-127 analogues)."""

from pyspark.sql import functions as F

from daft_minhash_dedupe_spark.functions.html import (
    explode_blocks,
    extract_blocks,
    html_to_text,
    lenient_utf8_decode,
    remove_http_headers,
)


def _blocks(spark, html):
    df = spark.createDataFrame([(html,)], "html string")
    return df.select(extract_blocks(F.col("html")).alias("b")).first()["b"]


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


def test_extract_blocks_basic(spark):
    # reference pin (tests/test_minhash_dedupe_unit.py:73-97): exactly 2
    # blocks; "Hello world ." tokenization; noscript dropped
    html = """<html><head><style>.x{color:red}</style><script>var a=1</script></head>
    <body>
    <h1>Title</h1>
    <p>Hello <b>world</b>.</p>
    <noscript>ignore me</noscript>
    </body></html>"""
    blocks = _blocks(spark, html)
    assert len(blocks) == 2
    assert "Title" in blocks
    assert "Hello world ." in blocks
    assert all("ignore me" not in b for b in blocks)


def test_extract_blocks_more_tags(spark):
    # reference pin (tests:101-116): caption extracted; no empty blocks;
    # void-element selectors (img[alt], meta) contribute nothing
    html = (
        '<html><head>'
        '<meta name="description" content="desc">'
        '<meta property="og:title" content="ogt">'
        '<meta property="og:description" content="ogd">'
        '</head><body>'
        '<img alt="pic" />'
        '<figure><figcaption>caption</figcaption></figure>'
        '</body></html>'
    )
    blocks = _blocks(spark, html)
    assert any("caption" in b for b in blocks)
    assert all(len(b) > 0 for b in blocks)


def test_extract_blocks_strips_script_style_noscript(spark):
    # reference pin (tests:119-127)
    html = (
        '<html><head><style>.x{color:red}</style><script>var a=1;</script></head>'
        '<body><noscript>nope</noscript><p>ok</p></body></html>'
    )
    blocks = _blocks(spark, html)
    assert any("ok" in b for b in blocks)
    assert all("nope" not in b for b in blocks)


def test_extract_blocks_nested_and_table(spark):
    # nested selector matches emit both texts (tree.css semantics);
    # th/td match only inside a table
    html = (
        '<div>outer <p>inner</p></div>'
        '<table><tr><th>H</th><td>C</td></tr></table>'
    )
    blocks = _blocks(spark, html)
    assert "outer inner" in blocks and "inner" in blocks
    assert "H" in blocks and "C" in blocks


def test_extract_blocks_unclosed_and_entities(spark):
    blocks = _blocks(spark, "<p>a &amp; b<p>second")
    assert "a & b" in blocks and "second" in blocks
    assert _blocks(spark, None if False else "") == []


def test_explode_blocks_ids(spark):
    df = spark.createDataFrame(
        [(7, "<h1>A</h1><p>B</p>"), (9, "<p></p>")],
        "record_id long, content_raw string",
    )
    rows = {
        (r["block_id"], r["block_text"])
        for r in explode_blocks(df, id_col="record_id").collect()
    }
    assert rows == {("7-0", "A"), ("7-1", "B")}


def test_canonical_url(spark):
    from daft_minhash_dedupe_spark.functions.url import canonical_url

    cases = [
        ("HTTPS://Site1.Example/p/9#frag", "https://site1.example/p/9"),
        ("http://a.com:80/x/", "http://a.com/x"),
        ("https://b.com:443/?utm_source=x&id=1", "https://b.com?id=1"),
        ("http://c.com/p?utm_a=1&utm_b=2", "http://c.com/p"),
        ("http://c.com/p?id=1&gclid=zz", "http://c.com/p?id=1"),
        ("https://d.com/p/q", "https://d.com/p/q"),
        ("no-scheme.com/x", "no-scheme.com/x"),
        # tracking-name anchored to separator: longer param names untouched
        ("http://e.com/p?foo_gclid=5&b=2", "http://e.com/p?foo_gclid=5&b=2"),
        ("http://e.com/p?my_utm_source=1", "http://e.com/p?my_utm_source=1"),
        # consecutive tracking params leave no && / trailing & residue
        ("http://f.com/p?utm_a=1&utm_b=2&c=3", "http://f.com/p?c=3"),
        ("http://f.com/p?a=1&utm_x=2", "http://f.com/p?a=1"),
        ("http://f.com/p?gclid=5&foo_gclid=7", "http://f.com/p?foo_gclid=7"),
        # default ports are scheme-matched: cross-scheme ports are real ports
        ("http://h.com:443/x", "http://h.com:443/x"),
        ("https://h.com:80/x", "https://h.com:80/x"),
    ]
    df = spark.createDataFrame(cases, "url string, want string")
    rows = df.select("url", "want", canonical_url(F.col("url")).alias("got")).collect()
    for r in rows:
        assert r["got"] == r["want"], f'{r["url"]}: {r["got"]} != {r["want"]}'


def test_canonical_url_properties(spark):
    """Randomized structural properties over ~400 generated URLs, one Spark
    job: canonicalization is idempotent, never leaves a fragment, a bare
    tracking param, or ?&/&&/trailing-& residue, and preserves every
    non-tracking param (including tracking-name lookalikes) verbatim."""
    import random
    import re

    from daft_minhash_dedupe_spark.functions.url import canonical_url

    rng = random.Random(42)
    tracking = ["utm_source=a", "utm_b=2", "fbclid=xx", "gclid=1", "mc_cid=9"]
    keepers = ["id=7", "q=hello", "foo_gclid=5", "my_utm_source=1", "page=2"]
    urls = []
    for _ in range(400):
        scheme = rng.choice(["http", "https", "HTTP", "HTTPS"])
        host = rng.choice(["Example.COM", "a.b.example", "x.io"])
        port = rng.choice(["", ":80", ":443", ":8080"])
        path = rng.choice(["", "/p", "/p/q", "/p/"])
        params = rng.sample(tracking, rng.randint(0, 3)) + rng.sample(
            keepers, rng.randint(0, 3)
        )
        rng.shuffle(params)
        query = "?" + "&".join(params) if params else rng.choice(["", "?"])
        frag = rng.choice(["", "#top", "#a/b?c=1"])
        urls.append(scheme + "://" + host + port + path + query + frag)

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = canonical_url(F.col("url"))
    rows = df.select(
        "url", once.alias("c1"), canonical_url(once).alias("c2")
    ).collect()
    bare_tracking = re.compile(r"[?&](utm_[a-z]+|fbclid|gclid|msclkid|mc_cid|mc_eid)=")
    for r in rows:
        u, c1, c2 = r["url"], r["c1"], r["c2"]
        assert c1 == c2, f"not idempotent: {u} -> {c1} -> {c2}"
        assert "#" not in c1, (u, c1)
        assert not bare_tracking.search(c1), (u, c1)
        assert "&&" not in c1 and "?&" not in c1, (u, c1)
        assert not c1.endswith(("&", "?")), (u, c1)
        kept = [p for p in u.split("#")[0].partition("?")[2].split("&") if p]
        for p in kept:
            if not bare_tracking.match("?" + p) and p:
                assert p in c1, f"dropped non-tracking param {p}: {u} -> {c1}"


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


def test_utf8_decode_error_modes(spark):
    from daft_minhash_dedupe_spark.functions.html import utf8_decode

    rows = [(b"ok",), (b"bad \xff byte",), (None,)]
    df = spark.createDataFrame(rows, "b binary")
    kept = [r["s"] for r in df.select(utf8_decode(F.col("b"), "replace").alias("s")).collect()]
    assert kept == ["ok", "bad � byte", None]
    nulled = [r["s"] for r in df.select(utf8_decode(F.col("b"), "null").alias("s")).collect()]
    assert nulled == ["ok", None, None]  # reference try_decode semantics
    import pytest as _pytest

    with _pytest.raises(ValueError):
        utf8_decode(F.col("b"), "ignore")
