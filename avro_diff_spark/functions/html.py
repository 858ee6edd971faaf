"""HTML -> text extraction: boilerplate removal for web-corpus ingestion.

The second stage of a Common-Crawl-class pipeline (WARC decode ->
**this** -> documents table): segment an HTML page into text blocks and
keep only the content-bearing ones, dropping navigation, footers, link
farms and chrome. The block-classification rules follow the jusText
family (Pomikalek 2011, "Removing boilerplate and duplicate content from
web corpora") and the C4/Gopher cleaning tradition (Raffel et al. 2020;
Rae et al. 2021): boilerplate blocks are short, link-dense, and
stopword-poor; body text is long, link-free, and stopword-rich.

Determinism discipline (the house rule shared with
``pipelines.gopher_quality``): every threshold is an integer
cross-multiplication — ``link_x * link_chars <= n_chars`` instead of a
float density compare — so a DuckDB oracle reproduces the classification
bit-for-bit and no libm is involved.

The tokenizer is a small from-scratch scanner (tags, comments, CDATA,
doctype, script/style skipping, a bounded entity subset) rather than a
DOM parser: a corpus pass needs segmentation + link accounting, not a
spec-complete tree, and real crawl HTML is malformed too often for a
strict parser to be the robust choice. Unknown named entities pass
through verbatim (documented; crawl-robustness over spec coverage).

Scale shape: pure per-document Python over Arrow-batched
``mapInPandas`` — embarrassingly parallel, no shuffle, the same honest
shape as the media decoders in ``avro_diff_spark/multimodal.py``.

No reference parity (yuana97/Avro_Diff has no ingestion surface);
beyond-reference LLM-pipeline tier per SURVEY.md north star.
"""

from __future__ import annotations

import re
from collections.abc import Iterator, Sequence
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

#: Compact English stopword list — deliberately tiny and FROZEN: the
#: classification law is part of query oracles, so growing this set is a
#: semantic change, not a tuning tweak.
STOPWORDS_EN = frozenset(
    "a the of to and in is it on for with as was at by".split()
)

#: Tags that open/close a text block (HTML block-level display set).
BLOCK_TAGS = frozenset(
    (
        "address article aside blockquote body br caption dd div dl dt "
        "fieldset figcaption figure footer form h1 h2 h3 h4 h5 h6 head "
        "header hr html li main nav ol option p pre section select "
        "table tbody td tfoot th thead tr ul"
    ).split()
)

#: Raw-text containers whose content is never corpus text.
SKIP_TAGS = frozenset("script style noscript template textarea".split())

_ENTITIES = {
    "amp": "&",
    "lt": "<",
    "gt": ">",
    "quot": '"',
    "apos": "'",
    "nbsp": "\xa0",
}

_ENT_RE = re.compile(r"&(#[xX][0-9a-fA-F]{1,6}|#[0-9]{1,7}|[a-zA-Z][a-zA-Z0-9]{1,31});")
_WORD_RE = re.compile(r"[a-z]+")


def decode_entities(s: str) -> str:
    """Decode the bounded entity subset: ``&amp; &lt; &gt; &quot;
    &apos; &nbsp;`` plus numeric ``&#NN;`` / ``&#xHH;`` references.
    Anything else (unknown names, unterminated ``&``) passes through
    verbatim — crawl HTML is full of bare ampersands and a hard error
    would reject real pages."""

    def _sub(m: re.Match[str]) -> str:
        body = m.group(1)
        if body.startswith("#x") or body.startswith("#X"):
            cp = int(body[2:], 16)
        elif body.startswith("#"):
            cp = int(body[1:], 10)
        else:
            return _ENTITIES.get(body.lower(), m.group(0))
        if 0 < cp <= 0x10FFFF and not (0xD800 <= cp <= 0xDFFF):
            return chr(cp)
        return m.group(0)

    return _ENT_RE.sub(_sub, s)


_TAG_NAME_RE = re.compile(r"^/?\s*([a-zA-Z][a-zA-Z0-9:-]*)")


def _scan_events(html: str):
    """The ONE tag scanner both :func:`html_blocks` and
    :func:`iter_links` consume (so "what is content" cannot
    desynchronize between them): yields ``("text", decoded_piece)`` for
    text outside head/skip regions, and ``("tag", name, closing, raw)``
    for structural events — ``head``/``body``/``html`` always (state
    transitions), other tags only outside ``<head>``.
    Comments/CDATA/doctype and SKIP_TAGS content are consumed silently;
    an unterminated tag ends the document."""
    in_head = False
    skip_until: str | None = None  # lowercased closing tag we're inside
    i, n = 0, len(html)
    while i < n:
        lt = html.find("<", i)
        if lt == -1:
            if not in_head and skip_until is None:
                yield ("text", decode_entities(html[i:]), None, None)
            break
        if lt > i and not in_head and skip_until is None:
            yield ("text", decode_entities(html[i:lt]), None, None)
        # comment / doctype / CDATA
        if html.startswith("<!--", lt):
            end = html.find("-->", lt + 4)
            i = n if end == -1 else end + 3
            continue
        if html.startswith("<![CDATA[", lt):
            end = html.find("]]>", lt + 9)
            i = n if end == -1 else end + 3
            continue
        if html.startswith("<!", lt) or html.startswith("<?", lt):
            end = html.find(">", lt + 2)
            i = n if end == -1 else end + 1
            continue
        gt = html.find(">", lt + 1)
        if gt == -1:  # unterminated tag: treat the rest as markup
            break
        raw = html[lt + 1 : gt]
        m = _TAG_NAME_RE.match(raw)
        i = gt + 1
        if not m:
            continue
        name = m.group(1).lower()
        closing = raw.lstrip().startswith("/")
        if skip_until is not None:
            if closing and name == skip_until:
                skip_until = None
            continue
        if name in SKIP_TAGS or (name == "title" and not in_head):
            # title outside <head> (bare crawl pages with no head element)
            # is metadata, not body text — consume it like script/style so
            # it cannot leak into the first content block.
            if not closing and not raw.rstrip().endswith("/"):
                skip_until = name
            continue
        if name == "head":
            yield ("tag", name, closing, raw)
            in_head = not closing
            continue
        if name in ("body", "html"):
            yield ("tag", name, closing, raw)
            in_head = False
            continue
        if in_head:
            if not closing and name in BLOCK_TAGS:
                # HTML5 implied end tag: body-level block content after an
                # unterminated <head> implicitly closes it — otherwise a
                # malformed page with <head> but no </head>/<body>/<html>
                # would extract to empty text.
                in_head = False
                yield ("tag", name, closing, raw)
            continue
        yield ("tag", name, closing, raw)


def html_blocks(html: str) -> list[tuple[str, int]]:
    """Segment ``html`` into text blocks: ``[(normalized_text,
    link_chars), ...]``. Block boundaries are open/close of any
    BLOCK_TAGS member; script/style/comment/CDATA/doctype content and
    everything inside ``<head>`` are skipped; inline tags (``a``,
    ``span``, ``b``, ...) do not break blocks. ``link_chars`` counts
    decoded text characters that sat inside an ``<a>`` element (raw,
    pre-normalization — an upper bound on their share of the normalized
    block, which is the conservative direction for the link-density
    veto). Whitespace is normalized per block (runs collapse to one
    space, ends trimmed); empty blocks are dropped."""
    out: list[tuple[str, int]] = []
    buf: list[str] = []
    link_chars = 0
    link_depth = 0

    def _flush() -> None:
        nonlocal buf, link_chars
        text = " ".join("".join(buf).split())
        if text:
            out.append((text, link_chars))
        buf = []
        link_chars = 0

    for kind, a, closing, _raw in _scan_events(html):
        if kind == "text":
            buf.append(a)
            if link_depth > 0:
                link_chars += len(a)
            continue
        name = a
        if name == "head":
            _flush()
        elif name in ("body", "html"):
            _flush()
            link_depth = 0
        elif name == "a":
            link_depth = max(0, link_depth + (-1 if closing else 1))
        elif name in BLOCK_TAGS:
            # block boundary also closes any (malformed) anchor spanning it
            _flush()
            link_depth = 0
    _flush()
    return out


def classify_block(
    text: str,
    link_chars: int,
    *,
    stopwords: frozenset[str] = STOPWORDS_EN,
    min_chars: int = 80,
    link_x: int = 5,
    stop_x: int = 12,
) -> bool:
    """jusText-class good/boilerplate verdict as pure integer
    cross-multiplications:

    - length gate:       ``len(text) >= min_chars``
    - link-density veto: ``link_x * link_chars <= len(text)``
      (default: linked chars exceed 1/5 of the block -> boilerplate)
    - stopword support:  ``stop_x * n_stopwords >= n_words``
      (default: at least 1/12 of words are stopwords -> prose, not a
      keyword/navigation list)

    Words are ASCII ``[a-z]+`` runs of the lowercased text — the same
    frozen tokenization the oracle SQL replays."""
    n_chars = len(text)
    if n_chars < min_chars or link_x * link_chars > n_chars:
        return False
    words = _WORD_RE.findall(text.lower())
    n_stop = sum(1 for w in words if w in stopwords)
    return stop_x * n_stop >= len(words)


def extract_text(
    html: str,
    *,
    stopwords: frozenset[str] = STOPWORDS_EN,
    min_chars: int = 80,
    link_x: int = 5,
    stop_x: int = 12,
) -> tuple[str, int, int]:
    """Full-page extraction: ``(extracted_text, n_blocks, n_good)``.
    ``extracted_text`` is the good blocks joined by newline."""
    blocks = html_blocks(html)
    good = [
        t
        for t, lc in blocks
        if classify_block(
            t, lc, stopwords=stopwords, min_chars=min_chars, link_x=link_x, stop_x=stop_x
        )
    ]
    return "\n".join(good), len(blocks), len(good)


def extract_text_df(
    df: DataFrame,
    html_col: str,
    *,
    keep: Sequence[str] = (),
    stopwords: frozenset[str] = STOPWORDS_EN,
    min_chars: int = 80,
    link_x: int = 5,
    stop_x: int = 12,
) -> DataFrame:
    """Distributed extraction over an HTML string column via
    Arrow-batched ``mapInPandas``: ``keep`` columns pass through,
    plus ``text`` (extracted), ``n_blocks``, ``n_good_blocks``.
    NULL html extracts to ('', 0, 0) — a fetch miss is an empty page,
    not a crashed pass."""
    import pandas as pd  # noqa: F401  (executor-side)

    keep = list(keep)
    narrow = df.select(*keep, html_col)
    out_schema = ", ".join(
        [f"`{c}` {narrow.schema[c].dataType.simpleString()}" for c in keep]
        + ["text string", "n_blocks long", "n_good_blocks long"]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for b in batches:
            texts, nb, ng = [], [], []
            for h in b[html_col]:
                if h is None:
                    texts.append("")
                    nb.append(0)
                    ng.append(0)
                    continue
                t, n_blocks, n_good = extract_text(
                    h,
                    stopwords=stopwords,
                    min_chars=min_chars,
                    link_x=link_x,
                    stop_x=stop_x,
                )
                texts.append(t)
                nb.append(n_blocks)
                ng.append(n_good)
            res = b[keep].copy() if keep else pd.DataFrame(index=b.index)
            res["text"] = texts
            res["n_blocks"] = nb
            res["n_good_blocks"] = ng
            yield res

    return narrow.mapInPandas(run, schema=out_schema)


# ---------------------------------------------------------------------------
# link extraction + RFC 3986 reference resolution (the web-graph builder)
# ---------------------------------------------------------------------------

_HREF_RE = re.compile(
    # (?<![\w-]) guards against attributes merely ENDING in href
    # (data-href, ng-href) being read as real links
    r"""(?<![\w-])href\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""", re.IGNORECASE
)


def iter_links(html: str) -> list[str]:
    """href values of ``<a>`` elements in document order (entity-decoded,
    whitespace-trimmed; empty hrefs dropped). Anchors inside skipped
    regions (head, script/style, comments) are skipped with them — the
    SAME :func:`_scan_events` scanner :func:`html_blocks` consumes, so
    the two passes agree on what is content by construction."""
    out: list[str] = []
    for kind, name, closing, raw in _scan_events(html):
        if kind != "tag" or name != "a" or closing:
            continue
        hm = _HREF_RE.search(raw)
        if hm:
            val = hm.group(2) or hm.group(3) or hm.group(4) or ""
            val = decode_entities(val).strip()
            if val:
                out.append(val)
    return out


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 — the normative algorithm, transcribed."""
    inp, out = path, []
    while inp:
        if inp.startswith("../"):
            inp = inp[3:]
        elif inp.startswith("./"):
            inp = inp[2:]
        elif inp.startswith("/./"):
            inp = "/" + inp[3:]
        elif inp == "/.":
            inp = "/"
        elif inp.startswith("/../"):
            inp = "/" + inp[4:]
            if out:
                out.pop()
        elif inp == "/..":
            inp = "/"
            if out:
                out.pop()
        elif inp in (".", ".."):
            inp = ""
        else:
            nxt = inp.find("/", 1)
            seg, inp = (inp, "") if nxt == -1 else (inp[:nxt], inp[nxt:])
            out.append(seg)
    return "".join(out)


def _split_uri(uri: str):
    """(scheme, authority, path, query, fragment) per RFC 3986 appendix B
    — the reference regex, decomposed by hand (no urllib in the law)."""
    scheme = authority = query = fragment = None
    rest = uri
    h = rest.find("#")
    if h != -1:
        rest, fragment = rest[:h], rest[h + 1 :]
    q = rest.find("?")
    if q != -1:
        rest, query = rest[:q], rest[q + 1 :]
    c = rest.find(":")
    if c > 0 and re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*$", rest[:c]):
        scheme, rest = rest[:c], rest[c + 1 :]
    if rest.startswith("//"):
        e = len(rest)
        for ch in "/?#":
            p = rest.find(ch, 2)
            if p != -1:
                e = min(e, p)
        authority, rest = rest[2:e], rest[e:]
    return scheme, authority, rest, query, fragment


def resolve_url(base: str, ref: str) -> str:
    """RFC 3986 §5.3 reference resolution (strict): absolute refs pass
    through, network-path/absolute-path/relative refs and bare
    query/fragment refs merge against the base, dot segments removed by
    the §5.2.4 algorithm. Pytest-pinned against the stdlib resolver over
    fuzzed cases (the stdlib is the TEST oracle, never the
    implementation)."""
    b_scheme, b_auth, b_path, b_query, _ = _split_uri(base)
    r_scheme, r_auth, r_path, r_query, r_frag = _split_uri(ref)
    if r_scheme is not None:
        scheme, auth, path, query = r_scheme, r_auth, _remove_dot_segments(r_path), r_query
    elif r_auth is not None:
        scheme, auth, path, query = b_scheme, r_auth, _remove_dot_segments(r_path), r_query
    elif not r_path:
        scheme, auth, path = b_scheme, b_auth, b_path
        query = r_query if r_query is not None else b_query
    else:
        scheme, auth = b_scheme, b_auth
        if r_path.startswith("/"):
            path = _remove_dot_segments(r_path)
        else:
            if b_auth is not None and not b_path:
                merged = "/" + r_path
            else:
                merged = b_path[: b_path.rfind("/") + 1] + r_path
            path = _remove_dot_segments(merged)
        query = r_query
    out = ""
    if scheme is not None:
        out += scheme + ":"
    if auth is not None:
        out += "//" + auth
    out += path
    if query is not None:
        out += "?" + query
    if r_frag is not None:
        out += "#" + r_frag
    return out


def extract_links_df(
    df: DataFrame,
    html_col: str,
    base_col: str,
    *,
    keep: Sequence[str] = (),
) -> DataFrame:
    """One row per (document, resolved out-link): ``keep`` columns +
    ``link`` (the href resolved against ``base_col`` per RFC 3986).
    Arrow-batched ``mapInPandas``, map-only — the Common Crawl link-graph
    extraction pass; feed the result to ``operators/graph.py`` for
    PageRank/components over the real web graph. NULL html or base
    yields no rows."""
    import pandas as pd  # noqa: F401

    keep = list(keep)
    narrow = df.select(*keep, html_col, base_col)
    out_schema = ", ".join(
        [f"`{c}` {narrow.schema[c].dataType.simpleString()}" for c in keep]
        + ["link string"]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for b in batches:
            rows = []
            for tup in b.itertuples(index=False, name=None):
                kept, html, base = tup[: len(keep)], tup[len(keep)], tup[len(keep) + 1]
                if html is None or base is None:
                    continue
                for href in iter_links(html):
                    rows.append(kept + (resolve_url(base, href),))
            yield pd.DataFrame.from_records(rows, columns=keep + ["link"])

    return narrow.mapInPandas(run, schema=out_schema)


# ---------------------------------------------------------------------------
# document metadata (title / description / declared language)
# ---------------------------------------------------------------------------

_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title\s*>", re.IGNORECASE | re.DOTALL)
_META_DESC_RE = re.compile(
    r"""<meta[^>]+name\s*=\s*["']?description["']?[^>]*>""", re.IGNORECASE
)
_CONTENT_RE = re.compile(r"""content\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""", re.IGNORECASE)
_HTML_LANG_RE = re.compile(
    r"""<html[^>]+lang\s*=\s*["']?\s*([a-zA-Z][a-zA-Z0-9\-]*)""", re.IGNORECASE
)


def html_meta(html: str) -> tuple[str | None, str | None, str | None]:
    """(title, meta_description, declared_lang) — the header fields a
    documents table wants next to the extracted text: <title> content
    (entity-decoded, whitespace-normalized), <meta name="description">'s
    content attribute, and <html lang="...">'s declared language
    (lowercased primary subtag form, e.g. 'en', 'pt-br'). Declared
    language is METADATA (sites lie) — the content-based check is
    functions/text.py's n-gram language ID; shipping both is exactly
    what lets a pipeline MEASURE the disagreement rate. Absent fields
    are None; the scan is regex-bounded and total on malformed input."""
    title = None
    m = _TITLE_RE.search(html)
    if m:
        t = " ".join(decode_entities(m.group(1)).split())
        title = t or None
    desc = None
    dm = _META_DESC_RE.search(html)
    if dm:
        cm = _CONTENT_RE.search(dm.group(0))
        if cm:
            d = " ".join(
                decode_entities(cm.group(2) or cm.group(3) or cm.group(4) or "").split()
            )
            desc = d or None
    lang = None
    lm = _HTML_LANG_RE.search(html)
    if lm:
        lang = lm.group(1).lower()
    return title, desc, lang


def html_meta_df(
    df: DataFrame, html_col: str, *, keep: Sequence[str] = ()
) -> DataFrame:
    """``keep`` columns + (title, meta_description, declared_lang) via
    Arrow-batched ``mapInPandas``; NULL html yields all-None fields."""
    import pandas as pd  # noqa: F401

    keep = list(keep)
    narrow = df.select(*keep, html_col)
    out_schema = ", ".join(
        [f"`{c}` {narrow.schema[c].dataType.simpleString()}" for c in keep]
        + ["title string", "meta_description string", "declared_lang string"]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for b in batches:
            metas = [
                html_meta(h) if h is not None else (None, None, None)
                for h in b[html_col]
            ]
            res = b[keep].copy() if keep else pd.DataFrame(index=b.index)
            res["title"] = [m[0] for m in metas]
            res["meta_description"] = [m[1] for m in metas]
            res["declared_lang"] = [m[2] for m in metas]
            yield res

    return narrow.mapInPandas(run, schema=out_schema)
