"""robots.txt (functions/robots.py): RFC 9309 grammar, group selection,
longest-pattern precedence, wildcard/anchor matching, totality, and the
distributed gate."""

from __future__ import annotations

from avro_diff_spark.functions import robots as R

TXT = """
# comment line
User-agent: trainbot
Disallow: /private
Allow: /private/ok$
Disallow: /tmp/*

User-agent: otherbot
User-agent: thirdbot
Disallow: /shared

User-agent: *
Disallow: /
Sitemap: https://example.org/sitemap.xml
Crawl-delay: 10
"""


def test_parse_groups_and_sitemaps():
    r = R.parse_robots(TXT)
    assert set(r["groups"]) == {"trainbot", "otherbot", "thirdbot", "*"}
    assert r["groups"]["otherbot"] == r["groups"]["thirdbot"] == [(False, "/shared")]
    assert r["sitemaps"] == ["https://example.org/sitemap.xml"]
    assert (False, "/private") in r["groups"]["trainbot"]
    assert (True, "/private/ok$") in r["groups"]["trainbot"]


def test_precedence_and_patterns():
    r = R.parse_robots(TXT)
    assert not R.is_allowed(r, "TrainBot", "/private/123")  # case-insensitive token
    assert R.is_allowed(r, "trainbot", "/private/ok")  # longer Allow wins
    assert not R.is_allowed(r, "trainbot", "/private/ok2")  # $ anchor
    assert not R.is_allowed(r, "trainbot", "/tmp/anything")  # * wildcard
    assert R.is_allowed(r, "trainbot", "/public/x")  # no match -> allowed
    assert not R.is_allowed(r, "otherbot", "/shared/doc")
    assert R.is_allowed(r, "otherbot", "/else")  # own group shadows *
    assert not R.is_allowed(r, "unknownbot", "/anything")  # falls to *: Disallow /


def test_tie_allow_wins_and_merge_rule():
    r = R.parse_robots(
        "User-agent: bot\nDisallow: /a/b\nAllow: /a/c\n\n"
        "User-agent: bot\nDisallow: /d\n"
    )
    # same-length tie: construct one explicitly
    r2 = R.parse_robots("User-agent: bot\nDisallow: /x\nAllow: /x\n")
    assert R.is_allowed(r2, "bot", "/x/1")
    # two groups for the same agent merge
    assert not R.is_allowed(r, "bot", "/d/e")
    assert not R.is_allowed(r, "bot", "/a/b/z")
    assert R.is_allowed(r, "bot", "/a/c/z")


def test_totality_edges():
    assert R.is_allowed(R.parse_robots(""), "bot", "/x")  # empty file
    r = R.parse_robots("Disallow: /orphan\nUser-agent: bot\nDisallow:\n")
    # orphan rule before any group is ignored; empty pattern matches nothing
    assert R.is_allowed(r, "bot", "/orphan/x")
    assert R.is_allowed(r, "bot", "/anything")
    # malformed lines skipped
    assert R.is_allowed(R.parse_robots("garbage\n:::\nUser-agent bot\n"), "b", "/")


def test_url_path_extraction():
    assert R._url_path("https://h.example/a/b?q=1#frag") == "/a/b?q=1"
    assert R._url_path("https://h.example") == "/"
    assert R._url_path("/already/path") == "/already/path"


def test_robots_filter_df(spark):
    rows = [
        (1, "https://h.example/private/1", TXT),
        (2, "https://h.example/private/ok", TXT),
        (3, "https://h.example/public/3", TXT),
        (4, "https://h.example/anything", None),  # unavailable -> allowed
        (5, None, TXT),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, robots string")
    got = {
        r.doc_id: r.allowed
        for r in R.robots_filter_df(
            df, "url", "robots", "trainbot", keep=("doc_id",)
        ).collect()
    }
    assert got == {1: False, 2: True, 3: True, 4: True, 5: None}


def test_parse_sitemap_urlset_and_index():
    urlset = """<?xml version="1.0"?>
    <urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      <url><loc>https://e.org/a?x=1&amp;y=2</loc><lastmod>2026-01-01</lastmod></url>
      <url><loc>
        https://e.org/b
      </loc></url>
    </urlset>"""
    kind, locs = R.parse_sitemap(urlset)
    assert kind == "urlset"
    assert locs == ["https://e.org/a?x=1&y=2", "https://e.org/b"]
    index = """<sitemapindex><sitemap><loc>https://e.org/s1.xml</loc></sitemap>
    <sitemap><loc>https://e.org/s2.xml</loc></sitemap></sitemapindex>"""
    kind, locs = R.parse_sitemap(index)
    assert kind == "index" and locs == ["https://e.org/s1.xml", "https://e.org/s2.xml"]
    assert R.parse_sitemap("not xml at all") == ("urlset", [])
    assert R.parse_sitemap("<urlset><url><loc></loc></url></urlset>") == ("urlset", [])


def test_crawl_delay_parse_and_group_selection():
    """Round 15: the de-facto Crawl-delay directive — attaches to the
    open group like a rule, adjacent agents share it, malformed and
    negative values are skipped (totality), the last valid value per
    group wins, and group selection mirrors is_allowed: a MATCHED
    agent group without a delay means NO delay, never a fallthrough
    to *'s."""
    from avro_diff_spark.functions.robots import crawl_delay, parse_robots

    r = parse_robots(
        "User-agent: a\nUser-agent: b\nDisallow: /x\nCrawl-delay: 2.5\n"
        "User-agent: *\nCrawl-delay: 7\nCrawl-delay: bogus\n"
        "Crawl-delay: -1\nCrawl-delay: 10  # comment\n"
        "User-agent: quiet\nDisallow: /y\n"
        "Crawl-delay-before-any-group: ignored\n"
    )
    assert r["delays"] == {"a": 2.5, "b": 2.5, "*": 10.0}
    assert crawl_delay(r, "A") == 2.5
    assert crawl_delay(r, "b") == 2.5
    # matched group without a delay -> None (no fallthrough to *)
    assert crawl_delay(r, "quiet") is None
    # unmatched agent -> the * group's delay
    assert crawl_delay(r, "other") == 10.0
    # no groups at all -> None
    assert crawl_delay(parse_robots(""), "x") is None
    # a delay before any user-agent line is ignored (ABNF posture)
    r2 = parse_robots("Crawl-delay: 3\nUser-agent: *\nDisallow: /z\n")
    assert r2["delays"] == {}


def test_robots_delays_df(spark):
    from avro_diff_spark.functions.robots import robots_delays_df

    df = spark.createDataFrame(
        [
            ("h0", "User-agent: bot\nCrawl-delay: 4\n"),
            ("h1", "User-agent: *\nCrawl-delay: 1.5\n"),
            ("h2", "User-agent: bot\nDisallow: /x\n"),  # matched, no delay
            ("h3", None),  # unavailable robots
        ],
        "host string, robots string",
    )
    got = {
        r.host: r.crawl_delay
        for r in robots_delays_df(df, "robots", "bot", keep=("host",)).collect()
    }
    assert got == {"h0": 4.0, "h1": 1.5, "h2": None, "h3": None}


def test_compiled_rules_equal_uncompiled():
    """The precompiled matcher cache robots_filter_df uses (optimization
    round 15 — one parse + regex compile per distinct robots text, not
    per URL) must give verdicts identical to the reference evaluator
    for every (robots, agent, path) — group selection, longest-match
    precedence, Allow-on-tie, empty patterns, anchors and wildcards."""
    import random

    pats = ["", "/", "/p/", "/p/*", "*.gif$", "/a*b$", "$", "/*/x",
            "/q?r=1", "*", "/P/"]
    agents = ["trainbot", "*", "other"]
    paths = ["/", "/p/1", "/p/", "/a/x/b", "/img.gif", "/q?r=1", "/P/2",
             "/ab", ""]
    rng = random.Random(7)
    for _ in range(200):
        lines = []
        for _g in range(rng.randint(0, 3)):
            for a in rng.sample(agents, rng.randint(1, 2)):
                lines.append(f"User-agent: {a}")
            for _r in range(rng.randint(0, 4)):
                lines.append(f"{rng.choice(['Allow', 'Disallow'])}: {rng.choice(pats)}")
        parsed = R.parse_robots("\n".join(lines))
        comp = R._compiled_rules(parsed, "trainbot")
        for p in paths:
            assert R.is_allowed(parsed, "trainbot", p) == R._is_allowed_compiled(comp, p)
