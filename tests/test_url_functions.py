"""URL canonicalization (functions/urls.py): every normalize_url rule
pinned on literal URLs, percent-encoding normalization, registrable
domains, host extraction, and idempotence over the synthesized messy
corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from avro_diff_spark.functions.urls import (
    normalize_url,
    pct_normalize,
    registrable_domain,
    synth_url,
    url_host,
)

# (raw, expected_canonical) — one pair per rule in the module docstring
NORM_CASES = [
    # scheme + host case, fragment
    ("HTTP://Example.COM/Path#frag", "http://example.com/Path"),
    # userinfo dropped
    ("http://user:pw@example.com/x", "http://example.com/x"),
    # default ports stripped, cross-scheme defaults kept
    ("http://example.com:80/x", "http://example.com/x"),
    ("https://example.com:443/x", "https://example.com/x"),
    ("https://example.com:80/x", "https://example.com:80/x"),
    ("http://example.com:8080/x", "http://example.com:8080/x"),
    # trailing host dot, single leading www
    ("http://example.com./x", "http://example.com/x"),
    ("http://www.example.com/x", "http://example.com/x"),
    ("http://www.www.example.com/x", "http://www.example.com/x"),
    # path: empty -> /, run collapse, trailing strip, root survives
    ("http://example.com", "http://example.com/"),
    ("http://example.com/", "http://example.com/"),
    ("http://example.com//a///b//", "http://example.com/a/b"),
    ("http://example.com/a/", "http://example.com/a"),
    # query: tracking dropped, sort, empty dropped, idref anchored-safe
    (
        "http://example.com/x?utm_source=a&b=2&a=1&gclid=zz",
        "http://example.com/x?a=1&b=2",
    ),
    ("http://example.com/x?fbclid=1&ref=tw&mc_cid=9&mc_eid=8&utm_x=1",
     "http://example.com/x"),
    # bare 'utm' is NOT utm_* — the anchored regex keeps it
    ("http://example.com/x?utm=1", "http://example.com/x?utm=1"),
    ("http://example.com/x?idref=7&ref=tw", "http://example.com/x?idref=7"),
    ("http://example.com/x?", "http://example.com/x"),
    ("http://example.com/x?b=2&a=1&&", "http://example.com/x?a=1&b=2"),
    # percent-encoding: unreserved decode, hex uppercase, junk kept
    ("http://example.com/a%7eb", "http://example.com/a~b"),
    ("http://example.com/a%2fb", "http://example.com/a%2Fb"),
    ("http://example.com/%41%42?v=%31", "http://example.com/AB?v=1"),
    ("http://example.com/a%zzb%3", "http://example.com/a%zzb%3"),
    # non-http(s) passes through trimmed
    ("  mailto:a@b.c  ", "mailto:a@b.c"),
    ("ftp://Host/File", "ftp://Host/File"),
    ("/relative/path", "/relative/path"),
]


def test_normalize_url_rules(spark):
    df = spark.createDataFrame([(r, e) for r, e in NORM_CASES], "raw string, want string")
    rows = df.select("raw", "want", normalize_url(F.col("raw")).alias("got")).collect()
    bad = [(r.raw, r.got, r.want) for r in rows if r.got != r.want]
    assert not bad, bad


def test_normalize_url_idempotent_on_messy_corpus(spark):
    """normalize(normalize(u)) == normalize(u) over 400 synthesized
    messy URLs — canonical forms are fixed points."""
    df = spark.range(0, 400).select(synth_url(F.col("id")).alias("raw"))
    once = normalize_url(F.col("raw"))
    rows = df.select(
        once.alias("c1"), normalize_url(once).alias("c2")
    ).collect()
    assert all(r.c1 == r.c2 for r in rows)


def test_pct_normalize_cases(spark):
    cases = [
        ("a%7eb%2fc%2Fd%41e%zz%3", "a~b%2Fc%2FdAe%zz%3"),
        ("", ""),
        ("%", "%"),
        ("no-pct", "no-pct"),
        ("%2D%2e%5F%7E", "-._~"),
        ("%00%1f%7f", "%00%1F%7F"),
    ]
    df = spark.createDataFrame(cases, "raw string, want string")
    rows = df.select("want", pct_normalize(F.col("raw")).alias("got")).collect()
    assert all(r.got == r.want for r in rows), [
        (r.want, r.got) for r in rows if r.got != r.want
    ]


def test_registrable_domain_and_host(spark):
    cases = [
        ("http://news0.example.com:8080/x?a=1", "news0.example.com", "example.com"),
        ("https://a.b.bbc.co.uk/y", "a.b.bbc.co.uk", "bbc.co.uk"),
        ("http://co.uk/", "co.uk", "co.uk"),
        ("http://localhost/", "localhost", "localhost"),
        ("http://u@h.example.org:99/p", "h.example.org", "example.org"),
    ]
    df = spark.createDataFrame(cases, "url string, h string, d string")
    rows = df.select(
        "h",
        "d",
        url_host(F.col("url")).alias("gh"),
        registrable_domain(url_host(F.col("url"))).alias("gd"),
    ).collect()
    assert all(r.gh == r.h and r.gd == r.d for r in rows), [
        (r.h, r.gh, r.d, r.gd) for r in rows
    ]


def test_synth_url_canonical_closed_form(spark):
    """The law the url_dedup oracle replays: canonical identity is
    (g = doc_id % 89, https iff doc_id % 3 = 1), every junk axis —
    including the round-13 dot segments and IDN hosts —
    normalization-invariant."""
    from avro_diff_spark.functions.urls import apply_idn, idn_to_ascii

    df = apply_idn(
        spark.range(0, 300).select(
            F.col("id").alias("d"),
            normalize_url(synth_url(F.col("id"))).alias("c"),
        ),
        "c",
    )
    for r in df.collect():
        g = r.d % 89
        scheme = "https" if r.d % 3 == 1 else "http"
        port = ":8080" if g % 7 == 0 else ""
        host = (
            idn_to_ascii(f"münchen{g % 40}") + ".example.com"
            if g % 5 == 2
            else f"news{g % 40}.example.com"
        )
        want = (
            f"{scheme}://{host}{port}"
            f"/articles/item-{g}~?a=1&id={g % 10}&z=%2Fp"
        )
        assert r.c == want, (r.d, r.c, want)


def test_remove_dot_segments_rfc_cases(spark):
    from avro_diff_spark.functions.urls import normalize_url

    cases = [
        ("http://h/a/b/c/./../../g", "http://h/a/g"),      # RFC 3986 §5.4.2 spirit
        ("http://h/a/b/../c", "http://h/a/c"),
        ("http://h/./a", "http://h/a"),
        ("http://h/../a", "http://h/a"),                    # excess .. dropped
        ("http://h/../../a", "http://h/a"),
        ("http://h/a/..", "http://h/"),                     # collapses to root
        ("http://h/a/.", "http://h/a"),
        ("http://h/a/%2E%2E/b", "http://h/b"),              # encoded dots decode first
        ("http://h/..", "http://h/"),
        ("http://h/a//../b", "http://h/b"),                 # after slash collapse: /a/../b
    ]
    df = spark.createDataFrame(cases, "u string, want string")
    rows = df.select("u", "want", normalize_url(F.col("u")).alias("got")).collect()
    assert all(r.got == r.want for r in rows), [
        (r.u, r.got, r.want) for r in rows if r.got != r.want
    ]


def test_idn_to_ascii_matches_stdlib_punycode():
    from avro_diff_spark.functions.urls import idn_to_ascii

    assert idn_to_ascii("bücher.example.com") == "xn--bcher-kva.example.com"
    assert idn_to_ascii("münchen.de") == "xn--mnchen-3ya.de"
    assert idn_to_ascii("ascii.example.com") == "ascii.example.com"
    # existing A-labels pass through (idempotence)
    assert idn_to_ascii("xn--bcher-kva.example.com") == "xn--bcher-kva.example.com"
    assert idn_to_ascii(idn_to_ascii("bücher.example.com")) == (
        "xn--bcher-kva.example.com"
    )
    # pin against CPython's own RFC 3492 codec per label
    for label in ("bücher", "münchen3", "héllo-wörld", "日本語"):
        assert idn_to_ascii(label) == "xn--" + label.encode("punycode").decode()


def test_idn_to_ascii_hypothesis_roundtrip():
    """Every encoded label decodes back through the stdlib RFC 3492
    decoder — the encode side can't be lossy."""
    from hypothesis import given, strategies as st

    from avro_diff_spark.functions.urls import idn_to_ascii

    @given(
        st.text(
            alphabet=st.characters(
                min_codepoint=ord("a"),
                max_codepoint=0x2FF,
                exclude_characters=".",
            ),
            min_size=1,
            max_size=20,
        ).map(str.lower)
    )
    def check(label):
        enc = idn_to_ascii(label)
        if enc == label:
            assert all(ord(c) < 128 for c in label)
        else:
            assert enc.startswith("xn--")
            assert enc[4:].encode("ascii").decode("punycode") == label

    check()


def test_apply_idn_rewrites_host_only(spark):
    from avro_diff_spark.functions.urls import apply_idn

    df = spark.createDataFrame(
        [
            ("http://bücher.example.com/bücher?x=bücher",),
            ("http://plain.example.com/a",),
            ("https://münchen.de:8080/p?q=1",),
        ],
        "u string",
    )
    got = sorted(r.u for r in apply_idn(df, "u").collect())
    assert got == [
        # path/query untouched — only the authority rewrites
        "http://plain.example.com/a",
        "http://xn--bcher-kva.example.com/bücher?x=bücher",
        "https://xn--mnchen-3ya.de:8080/p?q=1",
    ]
