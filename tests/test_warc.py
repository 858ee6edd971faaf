"""WARC ingestion (sources/warc.py) + HTML extraction (functions/html.py):
record round-trips, multi-member gzip, HTTP chunked/content-encoding,
charset sniffing, entity decoding, block segmentation/classification, the
distributed read path, and failure totality."""

from __future__ import annotations

import zlib

import pytest

from avro_diff_spark.functions import html as H
from avro_diff_spark.sources import warc as W

TEXT = (
    "the quick brown fox jumps over a lazy dog and then it runs to the "
    "barn for a nap in the warm hay by the door"
)  # 20+ words, stopword-rich, >80 chars -> classifies good


# ---------------------------------------------------------------------------
# gzip members
# ---------------------------------------------------------------------------


def test_gzip_member_deterministic_and_stdlib_readable():
    m1, m2 = W.gzip_member(b"hello world"), W.gzip_member(b"hello world")
    assert m1 == m2  # MTIME pinned to 0
    import gzip

    assert gzip.decompress(m1) == b"hello world"


def test_gunzip_multi_member_and_errors():
    data = W.gzip_member(b"one") + W.gzip_member(b"") + W.gzip_member(b"three")
    assert W.gunzip_members(data) == b"onethree"
    with pytest.raises(ValueError):
        W.gunzip_members(W.gzip_member(b"x") + b"junk")
    with pytest.raises((ValueError, zlib.error)):
        W.gunzip_members(W.gzip_member(b"hello world" * 100)[:-8])


# ---------------------------------------------------------------------------
# WARC record grammar
# ---------------------------------------------------------------------------


def test_record_roundtrip_plain_and_gz():
    recs = [
        W.build_record(
            "resource",
            b"payload bytes",
            record_id="00000001-0000-4000-8000-000000000000",
            target_uri="https://example.org/r",
            content_type="text/plain",
        ),
        W.build_record(
            "metadata",
            b"",
            record_id="00000001-0000-4000-8000-000000000001",
        ),
    ]
    for gz in (False, True):
        parsed = W.parse_warc(W.build_warc(recs, gzip_per_record=gz))
        assert [r["headers"]["warc-type"] for r in parsed] == ["resource", "metadata"]
        assert parsed[0]["payload"] == b"payload bytes"
        assert parsed[0]["headers"]["warc-target-uri"] == "https://example.org/r"
        assert parsed[1]["payload"] == b""


def test_parse_rejects_truncated_and_non_warc():
    rec = W.build_record("resource", b"x" * 50, record_id="a")
    with pytest.raises(ValueError):
        W.parse_warc(rec[:-30])  # payload overruns buffer after truncation
    with pytest.raises(ValueError):
        W.parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")


def test_parse_payload_containing_crlf_crlf():
    # Content-Length framing, not sniffing: a payload containing the
    # record separator must not split the record
    body = b"AB\r\n\r\nCD\r\n\r\nEF"
    rec = W.build_record("resource", body, record_id="a")
    parsed = W.parse_warc(rec + rec)
    assert len(parsed) == 2 and all(r["payload"] == body for r in parsed)


def test_header_continuation_folds():
    raw = (
        b"WARC/1.0\r\nWARC-Type: resource\r\nX-Long: first\r\n"
        b"\t second\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
    )
    parsed = W.parse_warc(raw)
    assert parsed[0]["headers"]["x-long"] == "first second"


# ---------------------------------------------------------------------------
# HTTP parsing
# ---------------------------------------------------------------------------


def _http(body: bytes, *headers: str) -> bytes:
    head = "\r\n".join(["HTTP/1.1 200 OK", *headers])
    return head.encode() + b"\r\n\r\n" + body


def test_http_plain_chunked_gzip_deflate():
    plain = b"<html>hi</html>"
    st, hh, body = W.parse_http_response(_http(plain, "Content-Type: text/html"))
    assert (st, body) == (200, plain)
    chunked = b"5\r\n<html\r\na;ext=1\r\n>hi</html>\r\n0\r\nX-Trailer: t\r\n\r\n"
    st, hh, body = W.parse_http_response(
        _http(chunked, "Transfer-Encoding: chunked")
    )
    assert body == plain
    st, hh, body = W.parse_http_response(
        _http(W.gzip_member(plain), "Content-Encoding: gzip")
    )
    assert body == plain
    for raw in (zlib.compress(plain), _raw_deflate(plain)):
        st, hh, body = W.parse_http_response(
            _http(raw, "Content-Encoding: deflate")
        )
        assert body == plain


def _raw_deflate(data: bytes) -> bytes:
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    return co.compress(data) + co.flush()


def test_http_bad_messages_raise():
    with pytest.raises(ValueError):
        W.parse_http_response(b"no separator here")
    with pytest.raises(ValueError):
        W.parse_http_response(b"NOTHTTP 200\r\n\r\nbody")
    with pytest.raises(ValueError):
        W.parse_http_response(
            _http(b"zz\r\nbody", "Transfer-Encoding: chunked")[:-2] + b"xx"
        )


# ---------------------------------------------------------------------------
# charset sniffing + decode
# ---------------------------------------------------------------------------


def test_charset_authority_order():
    assert W.sniff_charset(None, b"\xef\xbb\xbfhello") == "utf-8-sig"
    assert W.sniff_charset("text/html; charset=latin-1", b"\xff\xfex\x00") == "utf-16-le"
    assert W.sniff_charset("text/html; charset=ISO-8859-1", b"abc") == "latin-1"
    assert (
        W.sniff_charset("text/html", b'<head><meta charset="UTF-8"></head>') == "utf-8"
    )
    assert (
        W.sniff_charset(
            None,
            b'<meta http-equiv="Content-Type" content="text/html; charset=windows-1252">',
        )
        == "cp1252"
    )
    assert W.sniff_charset(None, b"plain") == "utf-8"


def test_decode_body_total():
    assert W.decode_body(b"\xff\xfeh\x00i\x00", "utf-16-le") == "hi"
    assert W.decode_body(b"caf\xe9", "latin-1") == "café"
    assert W.decode_body(b"\xff\xff\xff", "utf-8") == "���"
    assert W.decode_body(b"ok", "no-such-charset") == "ok"


# ---------------------------------------------------------------------------
# HTML extraction
# ---------------------------------------------------------------------------


def test_entities_subset_and_passthrough():
    assert H.decode_entities("a &amp; b &lt;c&gt; &quot;d&quot; &apos;e&apos;") == (
        "a & b <c> \"d\" 'e'"
    )
    assert H.decode_entities("x&#32;y&#x41;") == "x yA"
    assert H.decode_entities("&bogus; & &#xD800; &#0;") == "&bogus; & &#xD800; &#0;"
    assert H.decode_entities("n&nbsp;b") == "n\xa0b"


def test_blocks_segmentation_and_skips():
    html = (
        "<html><head><title>T</title><style>p{}</style></head><body>"
        "<nav><a href='/'>Home</a> <a href='/x'>More</a></nav>"
        "<h1>Head</h1><p>one  two\n three</p><!-- gone -->"
        "<script>var a = '<p>not text</p>';</script>"
        "<div><a>Next</a></div></body></html>"
    )
    blocks = H.html_blocks(html)
    assert [t for t, _ in blocks] == ["Home More", "Head", "one two three", "Next"]
    # link accounting: nav and footer fully linked, content not at all
    assert blocks[0][1] >= len("Home More") - 1
    assert blocks[2][1] == 0
    assert blocks[3][1] == len("Next")


def test_classify_integer_law():
    long_prose = TEXT  # stopword-rich
    assert H.classify_block(long_prose, 0)
    assert not H.classify_block(long_prose, len(long_prose))  # all linked
    assert not H.classify_block("short but the a of", 0)  # < 80 chars
    keyword_list = "spark hadoop kafka flink presto trino hive impala druid pinot " * 3
    assert not H.classify_block(keyword_list.strip(), 0)  # no stopwords


def test_extract_text_drops_boilerplate_keeps_content():
    page = W.synth_page_html(3, TEXT)
    text, n_blocks, n_good = H.extract_text(page)
    assert (n_blocks, n_good) == (4, 1)
    assert text == TEXT
    # id % 7 == 0: spaces spelled as &#32; entities decode back losslessly
    page7 = W.synth_page_html(7, TEXT)
    assert "&#32;" in page7
    assert H.extract_text(page7)[0] == TEXT


def test_extract_malformed_is_total():
    for bad in ("", "<", "<html", "<p>unclosed", "a &broken", "<!-- open", "<a>x"):
        text, nb, ng = H.extract_text(bad)
        assert isinstance(text, str) and nb >= 0


# ---------------------------------------------------------------------------
# synth http/warc variants land on the same text
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("doc_id", [0, 1, 2, 3, 5, 6, 7, 10, 14, 15])
def test_synth_variants_roundtrip(doc_id):
    payload = W.synth_warc_payload(doc_id, TEXT)
    recs = W.parse_warc(payload)
    assert [r["headers"]["warc-type"] for r in recs] == [
        "warcinfo",
        "request",
        "response",
    ]
    st, hh, body = W.parse_http_response(recs[2]["payload"])
    assert st == 200
    cs = W.sniff_charset(hh.get("content-type"), body)
    html = W.decode_body(body, cs)
    assert H.extract_text(html)[0] == TEXT
    if doc_id % 5 == 0:
        assert cs == "utf-16-le"


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------


def test_read_warc_distributed(spark, tmp_path):
    for shard in range(3):
        recs = [
            W.build_record(
                "response",
                W.synth_http_response(i, W.synth_page_html(i, f"doc {shard}-{i} " + TEXT)),
                record_id=f"{shard:04d}{i:04d}-0000-4000-8000-000000000000",
                target_uri=f"https://example.org/{shard}/{i}",
                content_type="application/http;msgtype=response",
            )
            for i in range(4)
        ]
        (tmp_path / f"shard{shard}.warc.gz").write_bytes(W.build_warc(recs))
    df = W.read_warc(spark, str(tmp_path / "*.warc.gz"))
    rows = df.collect()
    assert len(rows) == 12
    assert all(r.http_status == 200 for r in rows)
    assert all(r.warc_file.endswith(".warc.gz") for r in rows)
    texts = sorted(r.body_text for r in rows)
    assert all("<html>" in t or "<!DOCTYPE" in t for t in texts)
    # extraction over the scanned records reproduces the content
    from avro_diff_spark.functions.html import extract_text_df

    ext = extract_text_df(df, "body_text", keep=("target_uri",))
    got = {r.target_uri: r.text for r in ext.collect()}
    assert got["https://example.org/1/2"] == "doc 1-2 " + TEXT


def test_warc_records_null_payload_yields_no_rows(spark):
    df = spark.createDataFrame(
        [(1, None), (2, W.synth_warc_payload(2, TEXT))],
        "media_id long, payload binary",
    )
    rows = W.warc_records(df, "payload", keep=("media_id",)).collect()
    assert {r.media_id for r in rows} == {2}
    assert len(rows) == 3


def test_cli_extract_command(spark, tmp_path, capsys):
    from avro_diff_spark.cli import extract_main

    recs = [
        W.build_record(
            "response",
            W.synth_http_response(i, W.synth_page_html(i, f"shardtext {i} " + TEXT)),
            record_id=f"{i:08d}-0000-4000-8000-000000000000",
            target_uri=f"https://example.org/{i}",
            content_type="application/http;msgtype=response",
        )
        for i in range(5)
    ]
    (tmp_path / "crawl.warc.gz").write_bytes(W.build_warc(recs))
    out = str(tmp_path / "docs.parquet")
    rc = extract_main([str(tmp_path / "crawl.warc.gz"), out])
    assert rc == 0
    assert "documents: 5" in capsys.readouterr().out
    docs = {r.target_uri: r.text for r in spark.read.parquet(out).collect()}
    assert docs["https://example.org/2"] == "shardtext 2 " + TEXT
    # --min-chars raised above the content length drops everything
    rc = extract_main(
        [str(tmp_path / "crawl.warc.gz"), str(tmp_path / "d2.parquet"),
         "--min-chars", "5000"]
    )
    assert "documents: 0" in capsys.readouterr().out


def test_write_warc_roundtrip_distributed(spark, tmp_path):
    """Distributed sink -> distributed scan round trip: every (uri,
    body) survives; NULL rows are skipped; deterministic record ids."""
    rows = [
        (f"https://example.org/p/{i}", f"<html><body><p>{'x' * i}</p></body></html>".encode())
        for i in range(10)
    ] + [(None, b"skipped"), ("https://example.org/null", None)]
    df = spark.createDataFrame(rows, "target_uri string, body binary").repartition(3)
    out = str(tmp_path / "sink")
    W.write_warc(df, out)
    back = W.read_warc(spark, out + "/*.warc.gz")
    got = {r.target_uri: bytes(r.body) for r in back.collect()}
    want = {u: b for u, b in rows if u is not None and b is not None}
    assert got == want
    assert all(r.http_status == 200 for r in back.collect())
    # plain (non-gzip) shape too
    out2 = str(tmp_path / "sink2")
    W.write_warc(df, out2, gzip_per_record=False)
    back2 = W.read_warc(spark, out2 + "/*.warc")
    assert {r.target_uri for r in back2.collect()} == set(want)


# ---------------------------------------------------------------------------
# link extraction + RFC 3986 resolution
# ---------------------------------------------------------------------------


def test_iter_links_attribute_forms_and_skips():
    html = (
        "<html><head><a href='/in-head'>x</a></head><body>"
        '<a href="/a">1</a> <a href=\'/b\'>2</a> <a href=/c>3</a>'
        "<a name='no-href'>4</a> <a href='x&amp;y=1'>5</a>"
        "<!-- <a href='/comment'>gone</a> -->"
        "<script>var s = \"<a href='/script'>gone</a>\";</script>"
        "</body></html>"
    )
    assert H.iter_links(html) == ["/a", "/b", "/c", "x&y=1"]


def test_resolve_url_matches_stdlib_fuzz():
    """The from-scratch RFC 3986 resolver against urllib.parse.urljoin
    (stdlib as TEST oracle only) over the RFC's own §5.4 examples plus
    fuzzed combinations."""
    from urllib.parse import urljoin

    bases = [
        "http://a/b/c/d;p?q",
        "https://example.org/doc/42",
        "https://example.org/",
        "https://u.example/a/b/",
    ]
    refs = [
        "g", "./g", "g/", "/g", "//g", "?y", "g?y", "#s", "g#s", "g?y#s",
        ";x", "g;x", "", ".", "./", "..", "../", "../g", "../..", "../../",
        "../../g", "../../../g", "./../g", "g.", ".g", "g..", "..g",
        "./g/.", "g/./h", "g/../h", "http:g" if False else "http://h/x",
        "foo/bar?a=b#c", "/rooted/../x",
    ]
    for b in bases:
        for r in refs:
            assert H.resolve_url(b, r) == urljoin(b, r), (b, r)


def test_extract_links_df_resolves(spark):
    rows = [
        (1, "https://example.org/doc/1",
         "<body><a href='/x'>a</a><a href='../y'>b</a><a href='z?q=1'>c</a></body>"),
        (2, None, "<body><a href='/x'>a</a></body>"),
        (3, "https://example.org/", None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, base string, html string")
    got = sorted(
        (r.doc_id, r.link)
        for r in H.extract_links_df(df, "html", "base", keep=("doc_id",)).collect()
    )
    assert got == [
        (1, "https://example.org/doc/z?q=1"),
        (1, "https://example.org/x"),
        (1, "https://example.org/y"),
    ]


def test_html_meta_fields_and_totality():
    html = (
        '<html LANG="EN-us"><head><title> My &amp; Page \n title </title>'
        '<meta name="description" content="A &quot;nice&quot; page">'
        "</head><body><p>x</p></body></html>"
    )
    assert H.html_meta(html) == ("My & Page title", 'A "nice" page', "en-us")
    assert H.html_meta("<p>no head</p>") == (None, None, None)
    assert H.html_meta("<title></title>") == (None, None, None)
    assert H.html_meta("") == (None, None, None)
    # single-quoted + unquoted content forms
    assert H.html_meta("<meta name='description' content='d1'>")[1] == "d1"
    assert H.html_meta("<meta name=description content=d2>")[1] == "d2"


def test_html_meta_df(spark):
    rows = [
        (1, "<html lang='de'><head><title>T1</title></head></html>"),
        (2, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {
        r.doc_id: (r.title, r.meta_description, r.declared_lang)
        for r in H.html_meta_df(df, "html", keep=("doc_id",)).collect()
    }
    assert got == {1: ("T1", None, "de"), 2: (None, None, None)}


# ---------------------------------------------------------------------------
# code-review hardening (round 11)
# ---------------------------------------------------------------------------


def test_http_bare_lf_header_framing():
    msg = b"HTTP/1.1 200 OK\nContent-Type: text/html\n\n<html>lf</html>"
    st, hh, body = W.parse_http_response(msg)
    assert (st, hh["content-type"], body) == (200, "text/html", b"<html>lf</html>")


def test_warc_records_contains_malformed_http(spark):
    """One malformed HTTP response degrades to NULL http fields + raw
    payload; the scan and the other records survive."""
    good = W.build_record(
        "response",
        W.synth_http_response(2, W.synth_page_html(2, TEXT)),
        record_id="g",
        target_uri="https://e/g",
        content_type="application/http;msgtype=response",
    )
    bad = W.build_record(
        "response",
        b"GARBAGE WITHOUT SEPARATOR",
        record_id="b",
        target_uri="https://e/b",
        content_type="application/http;msgtype=response",
    )
    df = spark.createDataFrame(
        [(1, W.build_warc([good, bad]))], "media_id long, payload binary"
    )
    rows = {r.target_uri: r for r in W.warc_records(df, "payload").collect()}
    assert rows["https://e/g"].http_status == 200
    assert rows["https://e/b"].http_status is None
    assert bytes(rows["https://e/b"].body) == b"GARBAGE WITHOUT SEPARATOR"
    assert rows["https://e/b"].body_text is None


def test_entities_uppercase_hex():
    assert H.decode_entities("x&#X41;y&#x42;z") == "xAyBz"


def test_href_not_matched_in_data_href():
    html = "<body><a class=x data-href='/phantom' href='/real'>1</a>" \
           "<a data-href='/only-phantom'>2</a></body>"
    assert H.iter_links(html) == ["/real"]


def test_write_warc_skips_null_status_and_sanitizes_ctype(spark, tmp_path):
    rows = [
        ("https://e/1", b"ok", 200, "text/html"),
        ("https://e/2", b"nostatus", None, "text/html"),
        ("https://e/3", b"odd", 200, "text/html; x= "),
    ]
    df = spark.createDataFrame(
        rows, "target_uri string, body binary, http_status int, ctype string"
    )
    out = str(tmp_path / "sink")
    W.write_warc(df, out, status_col="http_status", content_type_col="ctype")
    back = {r.target_uri for r in W.read_warc(spark, out + "/*.warc.gz").collect()}
    assert back == {"https://e/1", "https://e/3"}


def test_extract_empty_text_three_blocks():
    text, n_blocks, n_good = H.extract_text(W.synth_page_html(9, ""))
    assert (text, n_blocks, n_good) == ("", 3, 0)


def test_bm25_sql_escapes_quotes():
    from avro_diff_spark.operators.text_index import bm25_score_sql

    sql = bm25_score_sql([(1, "o'brien mc'donald")])
    assert "'o''brien'" in sql
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT 1::BIGINT AS doc_id, 'x' AS text")
    con.execute(sql)  # parses and runs


def test_wet_roundtrip_matches_extract_text(spark, tmp_path):
    """write_wet over a crawled WARC directory yields conversion records
    whose payload text equals extract_text of the original pages, with
    WARC-Refers-To naming the source response record."""
    from avro_diff_spark.functions.html import extract_text
    from avro_diff_spark.sources.warc import read_warc, synth_page_html, write_warc, write_wet

    pages = [
        (i, f"https://ex.com/p{i}", synth_page_html(i, f"this is the story {i} of a test that it tells for the reader " * 5))
        for i in range(12)
    ]
    df = spark.createDataFrame(
        [(u, h.encode()) for _, u, h in pages], "target_uri string, body binary"
    ).repartition(3)
    write_warc(df, str(tmp_path / "warc"))

    recs = read_warc(spark, str(tmp_path / "warc"))
    write_wet(recs, str(tmp_path / "wet"))

    wet = read_warc(spark, str(tmp_path / "wet"))
    rows = wet.collect()
    assert all(r.warc_type == "conversion" for r in rows)
    assert all(r.content_type == "text/plain" for r in rows)
    got = {r.target_uri: bytes(r.body).decode("utf-8") for r in rows}
    want = {u: extract_text(h)[0] for _, u, h in pages}
    # pages whose extraction yields text appear with the exact law output
    assert set(got) == {u for u, t in want.items()}
    assert got == want
    # Refers-To links back to real response record ids
    from avro_diff_spark.sources.warc import parse_warc

    resp_ids = {r.record_id for r in recs.collect()}
    for part in sorted((tmp_path / "wet").glob("part-*.warc.wet.gz")):
        for rec in parse_warc(part.read_bytes()):
            assert rec["headers"].get("warc-refers-to") in resp_ids
