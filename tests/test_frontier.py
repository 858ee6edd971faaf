"""Frontier expansion (operators/frontier.py) + the pure-Column
sitemap loc extractor (functions/robots.sitemap_locs): law parity with
parse_sitemap, channel counts, visited filtering, robots gating, and
totality edges."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from avro_diff_spark.functions import robots as R
from avro_diff_spark.operators.frontier import expand_frontier

SITEMAP_SAMPLES = [
    """<?xml version="1.0"?><urlset><url><loc>https://e.org/a?x=1&amp;y=2</loc>
    <lastmod>2026-01-01</lastmod></url><url><loc>
      https://e.org/b
    </loc></url></urlset>""",
    "<sitemapindex><sitemap><loc>https://e.org/s1.xml</loc></sitemap></sitemapindex>",
    "not xml at all",
    "<urlset><url><loc></loc></url></urlset>",
    "<URLSET><LOC>https://e.org/C</LOC></URLSET>",
    "<loc>&lt;&gt;&quot;&apos;&amp;</loc>",
    "",
]


def test_sitemap_locs_matches_parse_sitemap(spark):
    """The Column twin extracts exactly parse_sitemap's locs (same
    regex, same entity replacement order) on every sample."""
    df = spark.createDataFrame([(s,) for s in SITEMAP_SAMPLES], "xml string")
    got = [r.locs for r in df.select(R.sitemap_locs("xml").alias("locs")).collect()]
    want = [R.parse_sitemap(s)[1] for s in SITEMAP_SAMPLES]
    assert got == want


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet="ab<>&; /:l.oc%#\tx",
            max_size=30,
        ),
        max_size=4,
    )
)
def test_sitemap_locs_fuzz_parity(spark, pieces):
    xml = "<urlset>" + "".join(f"<loc>{p}</loc>" for p in pieces) + "</urlset>"
    df = spark.createDataFrame([(xml,)], "xml string")
    got = df.select(R.sitemap_locs("xml").alias("locs")).collect()[0].locs
    assert got == R.parse_sitemap(xml)[1]


def _frontier_fixture(spark):
    pages = spark.createDataFrame(
        [
            (
                "http://h0.test/dir/page0",
                '<a href="/p/9">a</a> <a href=\'q7?ref=1&id=2\'>b</a>',
            ),
            (
                "http://h1.test/dir/page1",
                '<a href="/p/9">a</a> <a href="http://h0.test/p/9">c</a>',
            ),
        ],
        "url string, html string",
    )
    robots = spark.createDataFrame(
        [
            ("h0.test", "User-agent: trainbot\nDisallow: /p/\n"),
            # h1.test absent -> unavailable -> allowed
        ],
        "host string, robots string",
    )
    sm = spark.createDataFrame(
        [
            (
                "<urlset><loc> http://h1.test/sm/5 </loc>"
                "<loc>HTTP://H1.test/sm/5/</loc>"
                "<loc>http://h0.test/dir/page0</loc></urlset>",
            )
        ],
        "xml string",
    )
    return pages, robots, sm


def test_expand_frontier_counts_gates_and_visited(spark):
    pages, robots, sm = _frontier_fixture(spark)
    out = {
        r.url: (r.n_refs, r.from_links, r.from_sitemaps)
        for r in expand_frontier(
            pages, robots, agent="trainbot", sitemaps=sm,
            visited=pages.select("url"),
        ).collect()
    }
    assert out == {
        # page0's /p/9 (h0) and page1's explicit h0.test/p/9 are blocked
        # (trainbot group, Disallow /p/); page1's relative /p/9 lands on
        # h1 (absent from robots -> allowed) with its single reference
        "http://h1.test/p/9": (1, 1, 0),
        # relative q7 resolves under /dir/, tracking param dropped
        "http://h0.test/dir/q7?id=2": (1, 1, 0),
        # two sitemap spellings collapse; the visited self-loc vanishes
        "http://h1.test/sm/5": (2, 0, 2),
    }


def test_expand_frontier_no_sitemaps_no_visited(spark):
    pages, robots, _ = _frontier_fixture(spark)
    out = {r.url for r in expand_frontier(pages, robots, agent="trainbot").collect()}
    assert out == {"http://h1.test/p/9", "http://h0.test/dir/q7?id=2"}


def test_expand_frontier_empty_pages_total(spark):
    pages = spark.createDataFrame([], "url string, html string")
    robots = spark.createDataFrame([], "host string, robots string")
    assert expand_frontier(pages, robots, agent="x").count() == 0


def test_maintain_frontier_stream_batch_equivalent_exactly_once(spark, tmp_path):
    """Streaming frontier == batch expansion over all pages (counts
    merge-added across batches), fetched accumulates the page URLs,
    next_wave == batch expansion with visited = every page, and a
    checkpoint replay publishes nothing new."""
    from avro_diff_spark.operators.frontier import (
        frontier_next_wave,
        maintain_frontier_stream,
    )
    from avro_diff_spark.sources import versioned as V

    pages, robots, _ = _frontier_fixture(spark)
    # make batch boundaries likely: one input file per page row
    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    fr, fe = str(tmp_path / "frontier"), str(tmp_path / "fetched")
    pages.repartition(2).write.parquet(src)

    stream = spark.readStream.schema(pages.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = maintain_frontier_stream(
        stream, fr, fe, robots, agent="trainbot", checkpoint=ck
    )
    q.awaitTermination(120)

    def rows(df):
        return {tuple(r) for r in df.collect()}

    from avro_diff_spark.operators.frontier import expand_frontier

    assert rows(V.read_version(spark, fr)) == rows(
        expand_frontier(pages, robots, agent="trainbot")
    )
    assert rows(V.read_version(spark, fe)) == {
        (r.url,) for r in pages.select("url").collect()
    }
    assert rows(frontier_next_wave(spark, fr, fe)) == rows(
        expand_frontier(pages, robots, agent="trainbot", visited=pages.select("url"))
    )

    # replay: same checkpoint, no new files -> no new commits
    vf, vt = V.latest_version(fr), V.latest_version(fe)
    q2 = maintain_frontier_stream(
        spark.readStream.schema(pages.schema).parquet(src),
        fr, fe, robots, agent="trainbot", checkpoint=ck,
    )
    q2.awaitTermination(120)
    assert (V.latest_version(fr), V.latest_version(fe)) == (vf, vt)


def test_cli_search_frontier_lineage(spark, tmp_path, capsys):
    """Round-12 CLI surface: search build/query/delete (scores shift
    when N drops), frontier wave to parquet, lineage report."""
    from avro_diff_spark.cli import frontier_main, lineage_main, search_main
    from avro_diff_spark.operators.lineage import record_run

    docs = spark.createDataFrame(
        [(i, f"fast table scan doc{i} dog") for i in range(8)],
        "doc_id long, text string",
    )
    dp, idx = str(tmp_path / "docs"), str(tmp_path / "idx")
    docs.write.parquet(dp)
    assert search_main(["build", dp, idx]) == 0
    assert search_main(["query", idx, "fast dog", "--k", "3"]) == 0
    out1 = capsys.readouterr().out
    assert "doc 0" in out1
    s1 = int(out1.split("score")[1].split()[0])
    assert search_main(["delete", idx, "3", "4"]) == 0
    assert search_main(["query", idx, "fast dog", "--k", "3"]) == 0
    s2 = int(capsys.readouterr().out.split("score")[1].split()[0])
    assert s2 != s1  # N dropped -> idf moved

    pages, robots, _ = _frontier_fixture(spark)
    pp, rp, wp = (str(tmp_path / x) for x in ("pages", "robots", "wave"))
    pages.write.parquet(pp)
    robots.write.parquet(rp)
    assert frontier_main([pp, rp, wp, "--agent", "trainbot"]) == 0
    assert spark.read.parquet(wp).count() == 2

    lin = str(tmp_path / "lin")
    record_run(spark, lin, 0, [("raw", 10), ("kept", 5)])
    assert lineage_main([lin]) == 0
    rep = capsys.readouterr().out
    assert "retained   50.00%" in rep


def test_expand_frontier_drops_non_fetchable_schemes(spark):
    """mailto:/javascript:/tel: anchors (and fragment-only refs that
    resolve back to the page) must never enter the frontier."""
    pages = spark.createDataFrame(
        [(
            "http://h9.test/p",
            '<a href="mailto:a@b.c">m</a><a href="javascript:void(0)">j</a>'
            '<a href="tel:+123">t</a><a href="/ok">k</a>',
        )],
        "url string, html string",
    )
    robots = spark.createDataFrame([], "host string, robots string")
    out = {r.url for r in expand_frontier(pages, robots, agent="x").collect()}
    assert out == {"http://h9.test/ok"}


def test_fetch_schedule_per_host_cap_and_order(spark):
    from avro_diff_spark.operators.frontier import fetch_schedule

    rows = [
        (f"http://h{i % 3}.test/p{i}", 10 - i) for i in range(12)
    ]
    df = spark.createDataFrame(rows, "url string, n_refs int")
    out = fetch_schedule(df, per_host=2, priority_col="n_refs").collect()
    # cap: no (host, wave) bucket exceeds per_host
    from collections import Counter

    c = Counter((r.host, r.wave) for r in out)
    assert max(c.values()) <= 2
    # priority: within a host, waves are ordered by n_refs desc
    by_host = {}
    for r in out:
        by_host.setdefault(r.host, []).append((r.wave, -r.n_refs, r.url))
    for host, items in by_host.items():
        assert sorted(items) == sorted(items, key=lambda t: (t[0], t[1], t[2]))
        waves = sorted({w for w, _, _ in items})
        assert waves == list(range(len(waves)))  # dense wave numbering

    import pytest

    with pytest.raises(ValueError):
        fetch_schedule(df, per_host=0)


def test_fetch_schedule_two_level_equals_plain_window(spark):
    """The bucketed (skew-safe) rank path is VALUE-identical to the
    plain per-host window — bucket boundaries affect only balance
    (the prefix.py contract), including null priorities (desc sorts
    them last; the bucketed path gives them the trailing bucket)."""
    from avro_diff_spark.operators.frontier import fetch_schedule

    rows = [
        (f"http://h{i % 2}.test/p{i:03d}", None if i % 17 == 0 else (i * 7) % 5)
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "url string, n_refs int")

    def key(r):
        return (r.url, r.host, r.n_refs, r.wave)

    plain = fetch_schedule(df, per_host=3, priority_col="n_refs", buckets=1)
    bucketed = fetch_schedule(df, per_host=3, priority_col="n_refs", buckets=8)
    assert sorted(map(key, plain.collect())) == sorted(map(key, bucketed.collect()))
    # and the priority-less form (order by url only)
    p2 = fetch_schedule(df, per_host=3, buckets=1)
    b2 = fetch_schedule(df, per_host=3, buckets=8)
    assert sorted(map(key, p2.collect())) == sorted(map(key, b2.collect()))
    assert plain.columns == bucketed.columns


def test_fetch_schedule_overwrites_existing_host_column(spark):
    """An input that already carries a host column is overwritten from
    the URL, not duplicated (round-13 ADVICE: select('*', host) made the
    window's partitionBy('host') ambiguous)."""
    from avro_diff_spark.operators.frontier import fetch_schedule

    df = spark.createDataFrame(
        [("http://a.test/x", "stale", 1), ("http://b.test/y", "stale", 2)],
        "url string, host string, n_refs int",
    )
    out = fetch_schedule(df, per_host=1, priority_col="n_refs").collect()
    assert sorted(r.host for r in out) == ["a.test", "b.test"]


def test_fetch_schedule_bucketed_window_keys_include_bucket(spark):
    """Skew pin: with buckets > 1 and real cuts, the ranking window
    partitions by (host, bucket) — a mega-host's rows spread over many
    tasks instead of serializing into one (round-13 verdict item 8)."""
    from avro_diff_spark.operators.frontier import fetch_schedule

    rows = [(f"http://mega.test/p{i:04d}", i % 9) for i in range(400)]
    df = spark.createDataFrame(rows, "url string, n_refs int")
    out = fetch_schedule(df, per_host=5, priority_col="n_refs", buckets=8)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "__fs_bkt" in plan  # bucketed two-level path engaged
    waves = {}
    for r in out.collect():
        waves.setdefault(r.wave, []).append(r)
    assert all(len(v) <= 5 for v in waves.values())
    # wave k holds ranks 5k+1..5k+5 of the (n_refs desc, url asc) order
    ordered = sorted(rows, key=lambda t: (-t[1], t[0]))
    for w, members in waves.items():
        expect = {u for u, _ in ordered[w * 5 : w * 5 + 5]}
        assert {r.url for r in members} == expect


def _waves_fixture(spark):
    """Tiny two-host corpus where wave 1 discovers /a/<k> pages and the
    fetcher links each to /b/<k+1> — closed-form, so expectations are
    written out by hand."""
    pages = spark.createDataFrame(
        [
            ("http://h0.test/seed0", '<a href="/a/1">x</a><a href="/a/2">y</a>'),
            ("http://h1.test/seed1", '<a href="/a/1">x</a>'),
        ],
        "url string, html string",
    )
    robots = spark.createDataFrame(
        [("h0.test", "User-agent: *\nDisallow: /blocked\n")],
        "host string, robots string",
    )

    def fetch_html(url):
        k = F.regexp_extract(url, r"([0-9]+)$", 1).cast("long")
        return F.concat(
            F.lit('<a href="/b/'), (k + 1).cast("string"), F.lit('">n</a>')
        )

    return pages, robots, fetch_html


def test_crawl_waves_two_wave_law_and_visited_feed_forward(spark):
    from avro_diff_spark.operators.frontier import crawl_waves

    pages, robots, fetch_html = _waves_fixture(spark)
    out = crawl_waves(
        pages, robots, agent="bot", fetch_html=fetch_html, n_waves=2
    )
    got = {
        (r.wave, r.url, r.n_refs, r.from_links, r.from_sitemaps)
        for r in out.collect()
    }
    assert got == {
        (1, "http://h0.test/a/1", 1, 1, 0),
        (1, "http://h0.test/a/2", 1, 1, 0),
        (1, "http://h1.test/a/1", 1, 1, 0),
        (2, "http://h0.test/b/2", 1, 1, 0),
        (2, "http://h0.test/b/3", 1, 1, 0),
        (2, "http://h1.test/b/2", 1, 1, 0),
    }

    # wave 2 expansion filters against seeds + wave 1: a fetcher that
    # points straight back at a wave-1 URL discovers nothing new
    def loop_back(url):
        k = F.regexp_extract(url, r"([0-9]+)$", 1).cast("long")
        return F.concat(F.lit('<a href="/a/'), k.cast("string"), F.lit('">n</a>'))

    looped = crawl_waves(
        pages, robots, agent="bot", fetch_html=loop_back, n_waves=2
    )
    assert looped.where(F.col("wave") == 2).count() == 0

    import pytest

    with pytest.raises(ValueError):
        crawl_waves(pages, robots, agent="bot", fetch_html=fetch_html, n_waves=0)


def test_run_crawl_waves_versioned_state_matches_pure_loop(spark, tmp_path):
    """The versioned variant equals the pure composition row-for-row,
    lands ONE waves commit + ONE visited commit per wave (per-wave
    lineage), and the visited table accumulates exactly the discovered
    URLs."""
    from avro_diff_spark.operators.frontier import crawl_waves, run_crawl_waves
    from avro_diff_spark.sources.versioned import latest_version, read_version

    pages, robots, fetch_html = _waves_fixture(spark)
    state = str(tmp_path / "crawl")
    stored = run_crawl_waves(
        spark, pages, robots, state, agent="bot", fetch_html=fetch_html, n_waves=2
    )
    pure = crawl_waves(pages, robots, agent="bot", fetch_html=fetch_html, n_waves=2)
    key = lambda r: (r.wave, r.url, r.n_refs, r.from_links, r.from_sitemaps)
    assert sorted(map(key, stored.collect())) == sorted(map(key, pure.collect()))
    # one commit per wave on both tables (versions are 0-based)
    assert latest_version(f"{state}/waves") == 1
    assert latest_version(f"{state}/visited") == 1
    # round 15: the stored visited is the loop's full seen state —
    # seeds + every wave's discoveries (continue_crawl resumes from it)
    visited = {r.url for r in read_version(spark, f"{state}/visited").collect()}
    assert visited == {r.url for r in pure.select("url").collect()} | {
        r.url for r in pages.collect()
    }
    # time travel: version 0 holds exactly wave 1
    v0 = read_version(spark, f"{state}/waves", version=0)
    assert {r.wave for r in v0.collect()} == {1}


def test_fetch_schedule_group_cols_schedule_each_group_independently(spark):
    """group_cols (round 14): one call schedules every group as if it
    were its own frontier — equal to per-group calls, on both the plain
    and the bucketed path."""
    from avro_diff_spark.operators.frontier import fetch_schedule

    rows = [
        (g, f"http://h{i % 2}.test/p{i:03d}", (i * 7 + g) % 5)
        for g in (1, 2)
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "grp int, url string, n_refs int")

    def key(r):
        return (r.grp, r.url, r.host, r.n_refs, r.wave)

    for buckets in (1, 8):
        grouped = fetch_schedule(
            df, per_host=3, priority_col="n_refs",
            group_cols=["grp"], buckets=buckets,
        )
        per_group = []
        for g in (1, 2):
            sub = fetch_schedule(
                df.where(F.col("grp") == g), per_host=3,
                priority_col="n_refs", buckets=buckets,
            )
            per_group.extend(map(key, sub.collect()))
        assert sorted(map(key, grouped.collect())) == sorted(per_group), buckets


def test_run_crawl_waves_rerun_replaces_not_doubles(spark, tmp_path):
    """Re-running the same loop on existing state REPLACES it (wave 1
    is a REPLACE snapshot), never doubles rows — and the prior crawl
    stays one time-travel hop away."""
    from avro_diff_spark.operators.frontier import run_crawl_waves
    from avro_diff_spark.sources.versioned import read_version

    pages, robots, fetch_html = _waves_fixture(spark)
    state = str(tmp_path / "crawl")
    first = run_crawl_waves(
        spark, pages, robots, state, agent="bot", fetch_html=fetch_html, n_waves=2
    ).collect()
    again = run_crawl_waves(
        spark, pages, robots, state, agent="bot", fetch_html=fetch_html, n_waves=2
    ).collect()
    key = lambda r: tuple(r)
    assert sorted(map(key, first)) == sorted(map(key, again))
    # time travel: the pre-rerun state (versions 0-1) is intact
    old = read_version(spark, f"{state}/waves", version=1).collect()
    assert sorted(map(key, old)) == sorted(map(key, first))


def test_cli_frontier_schedule_and_card(spark, tmp_path, capsys):
    """Round-14 CLI surface: frontier --schedule-per-host emits the
    politeness columns; card emits the corpus summary and card --diff
    the per-metric key_diff."""
    from avro_diff_spark.cli import card_main, frontier_main

    pages, robots, _ = _frontier_fixture(spark)
    pp, rp, wp = (str(tmp_path / x) for x in ("pages", "robots", "wave"))
    pages.write.parquet(pp)
    robots.write.parquet(rp)
    assert frontier_main(
        [pp, rp, wp, "--agent", "trainbot", "--schedule-per-host", "1"]
    ) == 0
    wave = spark.read.parquet(wp)
    assert {"url", "host", "wave"} <= set(wave.columns)
    assert wave.groupBy("host", "wave").count().agg(
        F.max("count")
    ).collect()[0][0] == 1

    docs = spark.createDataFrame(
        [(i, f"doc text {i % 3}", "en", "web", 10) for i in range(9)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d0, d1, c0, cd = (str(tmp_path / x) for x in ("d0", "d1", "c0", "cd"))
    docs.write.parquet(d0)
    docs.where(F.col("doc_id") < 3).write.parquet(d1)  # one doc per text
    assert card_main([d0, c0]) == 0
    out = capsys.readouterr().out
    assert "n_docs: 9" in out and "distinct_texts: 3" in out
    assert card_main([d0, cd, "--diff", d1]) == 0
    out = capsys.readouterr().out
    assert "n_docs: 9 -> 3 (changed)" in out
    assert "distinct_texts: 3 -> 3 (unchanged)" in out


def test_crawl_two_waves_oracle_fixture_invariants(spark, sf_dir):
    """Round 15 (ADVICE): CRAWL_TWO_WAVES_SQL's wave-2 closed form skips
    the robots filter, the visited anti-join and URL normalization, and
    CASTs a regexp_extract to BIGINT — each omission is valid only under
    a fixture invariant. Pin those invariants HERE so a fixture tweak
    fails with a pointer at the cause instead of an opaque oracle
    hash-mismatch (or a DuckDB ''-cast error):

      (a) every wave-1 URL carries a trailing number (the fetcher's
          regexp_extract + CAST never sees ''),
      (b) every wave-2 candidate (host + '/n/' + K) is already in RFC
          3986 normal form (normalize_url is the identity on it),
      (c) no wave-2 candidate was visited before wave 2 (seeds, wave 1),
      (d) every wave-2 candidate is robots-allowed for the fixture agent
          ('/n/' paths are never disallowed on any fixture host).
    """
    from pyspark.sql import functions as F

    from avro_diff_spark.functions.robots import is_allowed, parse_robots
    from avro_diff_spark.functions.urls import normalize_url
    from avro_diff_spark.pipelines import _crawl_fixture, q_crawl_two_waves

    pages, _sm, robots, n = _crawl_fixture(spark, sf_dir)
    tw = q_crawl_two_waves(spark, sf_dir).localCheckpoint()
    w1 = tw.where(F.col("wave") == 1)

    # (a) trailing number present on EVERY wave-1 url
    assert (
        w1.where(
            F.regexp_extract(F.col("url"), r"([0-9]+)(\?.*)?$", 1) == ""
        ).count()
        == 0
    )

    # wave-2 candidates exactly as the fetcher law derives them
    k = F.regexp_extract(F.col("url"), r"([0-9]+)(\?.*)?$", 1).cast("long")
    cand = w1.select(
        F.concat(
            F.regexp_extract(F.col("url"), r"^(https?://[^/?#]*)", 1),
            F.lit("/n/"),
            ((k * 13 + 5) % n).cast("string"),
        ).alias("url")
    ).distinct()

    # (b) already normalized
    assert cand.where(normalize_url(F.col("url")) != F.col("url")).count() == 0

    # (c) never visited before wave 2: seeds + wave 1
    visited = pages.select("url").unionByName(w1.select("url"))
    assert cand.join(visited, "url", "semi").count() == 0

    # (d) robots-allowed for the fixture agent on every host
    rb = {r["host"]: parse_robots(r["robots"]) for r in robots.collect()}
    for r in cand.collect():
        host = r.url.split("//")[1].split("/")[0]
        path = "/" + r.url.split("//")[1].split("/", 1)[1]
        assert is_allowed(rb[host], "trainbot", path), r.url

    # and the engine's wave 2 is exactly the candidate set (counts fold
    # per url in the oracle; urls must match 1:1)
    w2 = tw.where(F.col("wave") == 2).select("url").distinct()
    assert cand.exceptAll(w2).count() == 0 and w2.exceptAll(cand).count() == 0


def test_continue_crawl_equals_uninterrupted_run(spark, tmp_path):
    """Round 15 (round-14 verdict item 5): resuming a stored crawl is
    indistinguishable from never having stopped —
    continue_crawl(k) ∘ run_crawl_waves(j) ≡ run_crawl_waves(j+k)
    row-for-row on BOTH state tables, wave numbering continues after
    the stored maximum, and resume lands one append commit per new
    wave (the stored prefix is untouched)."""
    from avro_diff_spark.operators.frontier import continue_crawl, run_crawl_waves
    from avro_diff_spark.sources.versioned import latest_version, read_version

    pages, robots, fetch_html = _waves_fixture(spark)
    full_state = str(tmp_path / "full")
    split_state = str(tmp_path / "split")

    full = run_crawl_waves(
        spark, pages, robots, full_state, agent="bot",
        fetch_html=fetch_html, n_waves=3,
    )
    run_crawl_waves(
        spark, pages, robots, split_state, agent="bot",
        fetch_html=fetch_html, n_waves=2,
    )
    v_before = latest_version(f"{split_state}/waves")
    resumed = continue_crawl(
        spark, split_state, robots, agent="bot",
        fetch_html=fetch_html, n_more_waves=1,
    )

    key = lambda r: (r.wave, r.url, r.n_refs, r.from_links, r.from_sitemaps)
    assert sorted(map(key, resumed.collect())) == sorted(map(key, full.collect()))
    assert {r.wave for r in resumed.collect()} == {1, 2, 3}
    # one append commit per new wave; the stored prefix intact
    assert latest_version(f"{split_state}/waves") == v_before + 1
    old = read_version(spark, f"{split_state}/waves", version=v_before)
    assert {r.wave for r in old.collect()} == {1, 2}
    # visited state matches the uninterrupted run's exactly
    va = {r.url for r in read_version(spark, f"{full_state}/visited").collect()}
    vb = {r.url for r in read_version(spark, f"{split_state}/visited").collect()}
    assert va == vb

    # resuming twice keeps extending (wave numbering continues)
    more = continue_crawl(
        spark, split_state, robots, agent="bot",
        fetch_html=fetch_html, n_more_waves=1,
    )
    assert max(r.wave for r in more.collect()) >= 3

    import pytest

    with pytest.raises(ValueError, match="n_more_waves"):
        continue_crawl(
            spark, split_state, robots, agent="bot",
            fetch_html=fetch_html, n_more_waves=0,
        )


def test_fetch_schedule_delay_pacing(spark):
    """Round 15: delay_col adds not_before = wave * coalesce(delay,
    default) on BOTH rank paths (plain window and bucketed), changing
    no wave value."""
    from avro_diff_spark.operators.frontier import fetch_schedule

    rows = [
        (f"http://h{i % 3}.test/p{i:03d}", float(i % 3 + 1) if i % 3 else None)
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "url string, crawl_delay double")
    for buckets in (1, 8):
        out = fetch_schedule(
            df, per_host=4, buckets=buckets,
            delay_col="crawl_delay", default_delay=2.0,
        ).collect()
        assert out
        for r in out:
            d = r.crawl_delay if r.crawl_delay is not None else 2.0
            assert r.not_before == r.wave * d, r
        # pacing never perturbs the rank law
        plain = {
            (r.url, r.wave)
            for r in fetch_schedule(df, per_host=4, buckets=buckets).collect()
        }
        assert {(r.url, r.wave) for r in out} == plain
