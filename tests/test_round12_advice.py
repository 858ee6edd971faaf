"""Round-11 ADVICE fixes: RFC 9309 blank lines between adjacent
User-agent lines, HTML implied-end-of-head + title-outside-head, and
the WARC oracle whitespace law matching Python's str.split() set."""

from __future__ import annotations

import duckdb
import pytest

from avro_diff_spark.functions.html import extract_text, html_blocks
from avro_diff_spark.functions.robots import is_allowed, parse_robots
from avro_diff_spark.pipelines import _PY_WS_SQL


def test_robots_blank_line_between_adjacent_agents():
    """RFC 9309 ABNF allows emptylines BETWEEN the User-agent lines of
    one group: 'User-agent: a\\n\\nUser-agent: b\\nDisallow: /x' is ONE
    group covering both agents; before the fix agent a was left with an
    empty rule set that allowed everything."""
    r = parse_robots("User-agent: a\n\nUser-agent: b\nDisallow: /x\n")
    assert r["groups"]["a"] == [(False, "/x")]
    assert r["groups"]["b"] == [(False, "/x")]
    assert not is_allowed(r, "a", "/x/page")
    assert not is_allowed(r, "b", "/x/page")
    assert is_allowed(r, "a", "/y")


def test_robots_blank_line_still_separates_rule_blocks():
    """A blank line after a RULE line changes nothing either way: the
    next User-agent line opens a fresh group (last_was_agent was already
    cleared by the rule), so the pre-fix behavior for the common layout
    is preserved."""
    txt = "User-agent: a\nDisallow: /a\n\nUser-agent: b\nDisallow: /b\n"
    r = parse_robots(txt)
    assert r["groups"]["a"] == [(False, "/a")]
    assert r["groups"]["b"] == [(False, "/b")]


def test_html_unterminated_head_implied_close():
    """A malformed page with <head> but no </head> and no <body>/<html>
    afterwards (common crawl HTML) must still extract its body text: the
    first body-level block tag implies the end of head (HTML5 implied
    end tag), instead of the whole document being swallowed as head."""
    prose = (
        "the cat sat on the mat and it was a fine day for all of the "
        "animals in the house by the sea with a warm wind"
    )
    page = f"<head><title>T</title><p>{prose}</p>"
    text, n_blocks, n_good = extract_text(page)
    assert text == prose
    assert n_good == 1
    # the title text never leaks into a block
    assert all("T" != t and not t.startswith("T ") for t, _ in html_blocks(page))


def test_html_title_without_head_is_not_body_text():
    """A bare <title> with no <head> element is metadata, not corpus
    text: it must be consumed like script/style instead of leaking into
    the first body block."""
    prose = (
        "the dog ran to the park and it was a good day for a walk in "
        "the sun with all of the friends by the gate"
    )
    page = f"<title>Site Title</title><p>{prose}</p>"
    blocks = html_blocks(page)
    assert [t for t, _ in blocks] == [prose]
    text, _, n_good = extract_text(page)
    assert text == prose and n_good == 1


@pytest.mark.parametrize(
    "s",
    [
        "a\tb\x0bc\x0cd\x85e\xa0f g　h  i\nj\x1ck",
        "  x   y ",
        "plain text no oddities",
        "",
        " \xa0 ",
    ],
)
def test_warc_oracle_whitespace_law_matches_python_split(s):
    """WARC_TEXT_EXTRACTION_SQL / CRAWL_ATTRITION_SQL normalize with
    _PY_WS_SQL, which must equal Python's str.split() whitespace set
    exactly — the Spark side normalizes via ' '.join(s.split()) inside
    html_blocks, and a decoded &nbsp; (\\xa0) or vertical tab in a
    fixture document must not desynchronize the engines."""
    py = " ".join(s.split())
    got = duckdb.sql(
        f"SELECT trim(regexp_replace(?, '{_PY_WS_SQL}', ' ', 'g'))",
        params=[s],
    ).fetchone()[0]
    assert got == py


def test_py_ws_sql_is_exactly_the_isspace_set():
    """The RE2 class enumerates precisely the code points Python's
    str.isspace() accepts (over the BMP range that matters) — no more,
    no fewer — so the law cannot drift if either side changes."""
    expected = {c for c in range(0x11000) if chr(c).isspace()}
    got = set()
    for cp in expected | {0x41, 0x2001, 0x200B, 0x2060, 0xFEFF, 0x00, 0x7F}:
        hit = duckdb.sql(
            f"SELECT regexp_matches(?, '{_PY_WS_SQL}')", params=[chr(cp)]
        ).fetchone()[0]
        got.add(cp) if hit else None
    assert got == expected
