"""WARC (ISO 28500 / WARC/1.0-1.1) web-archive ingestion.

The FIRST stage of a 100 TB training-data pipeline: Common Crawl ships
as ``.warc.gz`` — per-record gzip members concatenated into ~1 GB files,
each member one WARC record (warcinfo / request / response / ...), the
response records carrying full HTTP messages whose bodies are the HTML.
This module is a from-scratch reader/writer for that stack:

- **WARC record grammar**: ``WARC/1.x`` version line, CRLF-terminated
  named headers (``WARC-Type``, ``WARC-Target-URI``, ``WARC-Date``,
  ``Content-Length``, ...), CRLF blank line, ``Content-Length`` payload
  bytes, CRLF CRLF record separator.
- **Multi-member gzip**: each record its own member (the standard CC
  layout, which is what makes per-record random access possible);
  reading loops ``zlib.decompressobj(wbits=31)`` over ``unused_data``.
  Written members use a fixed MTIME=0 header — byte-deterministic
  output, the house determinism rule.
- **HTTP/1.x message parsing**: status line, case-insensitive headers,
  ``Transfer-Encoding: chunked`` de-chunking, ``Content-Encoding:
  gzip/deflate`` decompression (stdlib zlib, the ocf.py precedent).
- **Charset sniffing** in document order of authority: BOM (UTF-8/
  UTF-16LE/BE), ``Content-Type`` header ``charset=`` parameter, HTML
  ``<meta charset>`` / ``<meta http-equiv="Content-Type">`` within the
  first 2 KiB; UTF-8-with-replacement fallback (a crawl pass must be
  total — a mislabeled page yields replacement chars, never a crash).

Spark shape: ``read_warc`` scans files via ``binaryFile`` and decodes
with Arrow-batched ``mapInPandas`` — the distributed pure-Python decode
pattern of ``sources/avro.py``'s fallback path. Parallelism is
file-granular: gzip members carry no sync markers, so a ``.warc.gz`` is
not byte-range splittable without an external index; the corpus-scale
answer (and Common Crawl's actual layout) is many ~1 GB files, which
fan out across executors naturally. This is the honest posture — a
fake byte-range split would decode garbage mid-member.

No reference parity (yuana97/Avro_Diff has no ingestion surface);
beyond-reference LLM-pipeline tier per SURVEY.md north star and the
round-10 verdict's top-next item.
"""

from __future__ import annotations

import re
import struct
import zlib
from collections.abc import Iterator, Sequence
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame, SparkSession, functions as F

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

CRLF = b"\r\n"

# ---------------------------------------------------------------------------
# gzip members (deterministic writer, multi-member reader)
# ---------------------------------------------------------------------------


def gzip_member(data: bytes, *, level: int = 6) -> bytes:
    """One deterministic gzip member: fixed header (MTIME=0, XFL=0,
    OS=255/unknown) + raw deflate + CRC32 + ISIZE. ``zlib.compress``
    with a gzip wbits would stamp the current time into MTIME — a
    nondeterminism this codebase bans from every byte it writes."""
    co = zlib.compressobj(level, zlib.DEFLATED, -15)
    body = co.compress(data) + co.flush()
    header = b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\xff"
    trailer = struct.pack("<II", zlib.crc32(data) & 0xFFFFFFFF, len(data) & 0xFFFFFFFF)
    return header + body + trailer


def gunzip_members(data: bytes) -> bytes:
    """Decompress a concatenation of gzip members (the .warc.gz layout).
    Raises on a corrupt member; trailing garbage that is not a gzip
    magic is an error too (truncated archives should fail loudly)."""
    out = []
    while data:
        if data[:2] != b"\x1f\x8b":
            raise ValueError(f"not a gzip member at offset (magic={data[:2]!r})")
        d = zlib.decompressobj(31)
        out.append(d.decompress(data))
        out.append(d.flush())
        if not d.eof:
            raise ValueError("truncated gzip member")
        data = d.unused_data
    return b"".join(out)


def is_gzip(data: bytes) -> bool:
    return data[:2] == b"\x1f\x8b"


# ---------------------------------------------------------------------------
# WARC record build / parse
# ---------------------------------------------------------------------------


def build_record(
    warc_type: str,
    payload: bytes,
    *,
    record_id: str,
    date: str = "2026-01-01T00:00:00Z",
    target_uri: str | None = None,
    content_type: str | None = None,
    extra: Sequence[tuple[str, str]] = (),
) -> bytes:
    """Serialize one WARC/1.0 record (ISO 28500 §4): version line,
    named fields, blank line, payload, record separator."""
    lines = [b"WARC/1.0"]
    fields: list[tuple[str, str]] = [
        ("WARC-Type", warc_type),
        ("WARC-Record-ID", f"<urn:uuid:{record_id}>"),
        ("WARC-Date", date),
    ]
    if target_uri is not None:
        fields.append(("WARC-Target-URI", target_uri))
    if content_type is not None:
        fields.append(("Content-Type", content_type))
    fields.extend(extra)
    fields.append(("Content-Length", str(len(payload))))
    for k, v in fields:
        lines.append(f"{k}: {v}".encode())
    return CRLF.join(lines) + CRLF + CRLF + payload + CRLF + CRLF


def build_warc(records: Sequence[bytes], *, gzip_per_record: bool = True) -> bytes:
    """Concatenate serialized records into a .warc / .warc.gz payload.
    ``gzip_per_record=True`` emits one gzip member per record — the
    standard Common Crawl layout."""
    if gzip_per_record:
        return b"".join(gzip_member(r) for r in records)
    return b"".join(records)


def parse_warc(data: bytes) -> list[dict[str, Any]]:
    """Parse a .warc or .warc.gz byte string into records:
    ``{"headers": {lowercase-name: value}, "payload": bytes}``.
    Tolerates LF-only header framing (seen in the wild) and extra
    CRLF padding between records; a record whose declared
    Content-Length overruns the buffer raises (truncation must not
    silently drop tail records)."""
    if is_gzip(data):
        data = gunzip_members(data)
    records: list[dict[str, Any]] = []
    i, n = 0, len(data)
    while i < n:
        # skip inter-record padding
        while i < n and data[i : i + 1] in (b"\r", b"\n"):
            i += 1
        if i >= n:
            break
        eol = data.find(b"\n", i)
        if eol == -1:
            raise ValueError("missing version line terminator")
        version = data[i:eol].strip(b"\r").decode("ascii", "replace")
        if not version.startswith("WARC/"):
            raise ValueError(f"expected WARC/ version line, got {version!r}")
        i = eol + 1
        headers: dict[str, str] = {}
        while True:
            eol = data.find(b"\n", i)
            if eol == -1:
                raise ValueError("unterminated WARC header block")
            line = data[i:eol].strip(b"\r")
            i = eol + 1
            if not line:
                break
            if line[:1] in (b" ", b"\t") and headers:
                # RFC-style header continuation folds into the last field
                headers[last] += " " + line.strip().decode("utf-8", "replace")  # noqa: F821
                continue
            k, _, v = line.partition(b":")
            last = k.strip().decode("ascii", "replace").lower()
            headers[last] = v.strip().decode("utf-8", "replace")
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError as e:
            raise ValueError(f"bad Content-Length {headers.get('content-length')!r}") from e
        if i + length > n:
            raise ValueError("record payload overruns buffer (truncated WARC)")
        payload = data[i : i + length]
        i += length
        records.append({"version": version, "headers": headers, "payload": payload})
    return records


# ---------------------------------------------------------------------------
# HTTP/1.x response parsing
# ---------------------------------------------------------------------------


def _dechunk(body: bytes) -> bytes:
    """Decode Transfer-Encoding: chunked (RFC 9112 §7.1), including
    chunk extensions and trailer section."""
    out = []
    i, n = 0, len(body)
    while True:
        eol = body.find(b"\r\n", i)
        if eol == -1:
            raise ValueError("unterminated chunk-size line")
        size_token = body[i:eol].split(b";", 1)[0].strip()
        size = int(size_token, 16)
        i = eol + 2
        if size == 0:
            # consume optional trailers until blank line
            while i < n:
                eol = body.find(b"\r\n", i)
                if eol == -1 or eol == i:
                    break
                i = eol + 2
            break
        if i + size > n:
            raise ValueError("chunk overruns buffer")
        out.append(body[i : i + size])
        i += size
        if body[i : i + 2] != b"\r\n":
            raise ValueError("missing chunk terminator")
        i += 2
    return b"".join(out)


def parse_http_response(message: bytes) -> tuple[int, dict[str, str], bytes]:
    """Parse a full HTTP/1.x response message into (status, headers,
    decoded body): de-chunks ``Transfer-Encoding: chunked`` and
    decompresses ``Content-Encoding: gzip | deflate`` (raw-deflate
    fallback for the servers that send it bare)."""
    sep = message.find(b"\r\n\r\n")
    body_off = sep + 4
    if sep == -1:
        # bare-LF header framing (seen in old crawls) — tolerate, like
        # parse_warc's LF tolerance
        sep = message.find(b"\n\n")
        if sep == -1:
            raise ValueError("no HTTP header/body separator")
        body_off = sep + 2
    head_lines = [ln.strip(b"\r") for ln in message[:sep].split(b"\n")]
    status_line = head_lines[0].decode("ascii", "replace")
    parts = status_line.split(None, 2)
    if len(parts) < 2 or not parts[0].startswith("HTTP/"):
        raise ValueError(f"bad status line {status_line!r}")
    try:
        status = int(parts[1])
    except ValueError as e:
        raise ValueError(f"bad status code in {status_line!r}") from e
    headers: dict[str, str] = {}
    for raw in head_lines[1:]:
        k, _, v = raw.partition(b":")
        headers[k.strip().decode("ascii", "replace").lower()] = v.strip().decode(
            "utf-8", "replace"
        )
    body = message[body_off:]
    if "chunked" in headers.get("transfer-encoding", "").lower():
        body = _dechunk(body)
    enc = headers.get("content-encoding", "").strip().lower()
    if enc == "gzip":
        body = gunzip_members(body)
    elif enc == "deflate":
        try:
            body = zlib.decompress(body)
        except zlib.error:
            body = zlib.decompress(body, -15)
    return status, headers, body


_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]+)""", re.IGNORECASE
)
_HDR_CHARSET_RE = re.compile(r"charset\s*=\s*\"?([a-zA-Z0-9_\-]+)", re.IGNORECASE)


def sniff_charset(content_type: str | None, body: bytes) -> str:
    """Charset in order of authority: BOM > Content-Type header param >
    <meta> declaration in the first 2 KiB > utf-8 default. Returns a
    Python codec name."""
    if body[:3] == b"\xef\xbb\xbf":
        return "utf-8-sig"
    if body[:2] == b"\xff\xfe":
        return "utf-16-le"
    if body[:2] == b"\xfe\xff":
        return "utf-16-be"
    if content_type:
        m = _HDR_CHARSET_RE.search(content_type)
        if m:
            return _norm_charset(m.group(1))
    m = _META_CHARSET_RE.search(body[:2048])
    if m:
        return _norm_charset(m.group(1).decode("ascii", "replace"))
    return "utf-8"


def _norm_charset(name: str) -> str:
    name = name.strip().lower()
    aliases = {
        "utf8": "utf-8",
        "utf-16": "utf-16",  # codec consumes the BOM itself
        "latin1": "latin-1",
        "iso-8859-1": "latin-1",
        "windows-1252": "cp1252",
        "us-ascii": "ascii",
    }
    return aliases.get(name, name)


def decode_body(body: bytes, charset: str) -> str:
    """Total decode: BOM consumed where the codec does so; unknown or
    lying charsets degrade to utf-8 with replacement, never raise."""
    if charset in ("utf-16-le", "utf-16-be") and body[:2] in (b"\xff\xfe", b"\xfe\xff"):
        body = body[2:]
    try:
        return body.decode(charset, "replace")
    except LookupError:
        return body.decode("utf-8", "replace")


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

WARC_RECORDS_SCHEMA_TAIL = (
    "record_id string, warc_type string, target_uri string, "
    "warc_date string, content_type string, http_status int, "
    "http_content_type string, charset string, body binary, body_text string"
)


def warc_records(
    df: DataFrame, payload_col: str = "payload", *, keep: Sequence[str] = ()
) -> DataFrame:
    """Explode a column of .warc/.warc.gz payloads into one row per
    WARC record via Arrow-batched ``mapInPandas``. For ``response``
    records carrying an HTTP message, the HTTP layer is parsed and the
    body fully decoded (chunked + content-encoding + charset):
    ``http_status``, ``charset``, raw ``body`` bytes and ``body_text``
    are populated; other record types carry their raw payload with NULL
    http fields. A NULL payload cell yields no rows (an absent fetch is
    an absent fetch)."""
    keep = list(keep)
    narrow = df.select(*keep, payload_col)
    out_schema = ", ".join(
        [f"`{c}` {narrow.schema[c].dataType.simpleString()}" for c in keep]
        + [WARC_RECORDS_SCHEMA_TAIL]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        cols = keep + [
            "record_id",
            "warc_type",
            "target_uri",
            "warc_date",
            "content_type",
            "http_status",
            "http_content_type",
            "charset",
            "body",
            "body_text",
        ]
        for b in batches:
            rows: list[tuple] = []
            for tup in b.itertuples(index=False, name=None):
                kept, payload = tup[: len(keep)], tup[len(keep)]
                if payload is None:
                    continue
                for rec in parse_warc(bytes(payload)):
                    h = rec["headers"]
                    wtype = h.get("warc-type")
                    ctype = h.get("content-type")
                    status = None
                    http_ct = None
                    charset = None
                    body = rec["payload"]
                    text = None
                    if wtype == "response" and (ctype or "").startswith(
                        "application/http"
                    ):
                        # per-record containment: one malformed HTTP
                        # message degrades to NULL http fields + raw
                        # payload instead of killing the whole scan (a
                        # crawl pass must be total)
                        try:
                            status, hh, body = parse_http_response(rec["payload"])
                            http_ct = hh.get("content-type")
                            charset = sniff_charset(http_ct, body)
                            text = decode_body(body, charset)
                        except Exception:  # noqa: BLE001
                            status = http_ct = charset = text = None
                            body = rec["payload"]
                    rows.append(
                        kept
                        + (
                            h.get("warc-record-id"),
                            wtype,
                            h.get("warc-target-uri"),
                            h.get("warc-date"),
                            ctype,
                            status,
                            http_ct,
                            charset,
                            body,
                            text,
                        )
                    )
                if len(rows) >= 2048:  # bound memory per Arrow batch
                    yield pd.DataFrame.from_records(rows, columns=cols)
                    rows = []
            if rows:
                yield pd.DataFrame.from_records(rows, columns=cols)

    return narrow.mapInPandas(run, schema=out_schema)


def write_wet(
    records: DataFrame,
    path: str,
    *,
    date: str = "2026-01-01T00:00:00Z",
    gzip_per_record: bool = True,
    via: str = "auto",
) -> None:
    """WET sidecar generation — the Common Crawl companion artifact
    (``*.warc.wet.gz``): one WARC ``conversion`` record per fetched
    ``response``, whose payload is the page's EXTRACTED PLAIN TEXT
    (functions/html.py ``extract_text`` — the same boilerplate-removal
    law ``warc_text_extraction`` pins against its oracle) and whose
    ``WARC-Refers-To`` names the source response record. Input is the
    output of :func:`read_warc`/:func:`warc_records`; non-response rows
    are skipped. Encoding and commit ride the exact ``write_warc``
    plumbing (sources/sink.py executor / staged / driver-fs routes, atomic
    tmp+rename), so the op is one Arrow extraction pass + one encode
    pass per partition — WET generation at 100 TB is map-only.
    Round-trip pinned in tests/test_warc.py: reading the WET directory
    back yields conversion records whose text matches extract_text of
    the originals."""
    import hashlib

    from avro_diff_spark.functions.html import extract_text_df
    from avro_diff_spark.sources.sink import write_parts

    resp = records.where(F.col("warc_type") == "response")
    txt = extract_text_df(
        resp, "body_text", keep=("record_id", "target_uri")
    ).select("record_id", "target_uri", "text")
    suffix = ".warc.wet.gz" if gzip_per_record else ".warc.wet"

    def encode(idx: int, it, out) -> bool:
        recs = []
        for n, row in enumerate(it):
            if row["target_uri"] is None or row["text"] is None:
                continue
            rid = hashlib.md5(f"wet|{row['target_uri']}|{idx}|{n}".encode()).hexdigest()
            rid = f"{rid[:8]}-{rid[8:12]}-{rid[12:16]}-{rid[16:20]}-{rid[20:]}"
            recs.append(
                build_record(
                    "conversion",
                    row["text"].encode("utf-8"),
                    record_id=rid,
                    date=date,
                    target_uri=str(row["target_uri"]),
                    content_type="text/plain",
                    # record_id round-trips verbatim (already the full
                    # '<urn:uuid:...>' header value from the scan)
                    extra=(("WARC-Refers-To", row["record_id"]),)
                    if row["record_id"]
                    else (),
                )
            )
        if not recs:
            return False
        out.write(build_warc(recs, gzip_per_record=gzip_per_record))
        return True

    write_parts(
        txt,
        path,
        encode,
        suffix,
        stale_suffixes=(".warc.wet", ".warc.wet.gz"),
        via=via,
    )


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC scan: ``binaryFile`` over the path/glob, then
    :func:`warc_records` per file. One task per file (gzip members are
    not range-splittable without an index — the Common Crawl answer is
    many ~1 GB files, see module docstring); the ``warc_file`` column
    keeps provenance for dedup/repro."""
    raw = (
        spark.read.format("binaryFile")
        .load(path)
        .selectExpr("path AS warc_file", "content AS payload")
    )
    return warc_records(raw, "payload", keep=("warc_file",))


# ---------------------------------------------------------------------------
# Deterministic synthesis (test/bench fixtures — the multimodal.py pattern)
# ---------------------------------------------------------------------------


def escape_html(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def synth_page_html(doc_id: int, text: str) -> str:
    """One deterministic HTML page around ``text`` as its sole content
    paragraph, wrapped in classic boilerplate (nav links, heading,
    link-footer, comment, script) — the closed-form law the extraction
    oracle replays: exactly 4 non-empty blocks, of which only the
    paragraph can classify good. ``doc_id % 7 == 0`` spells every space
    of the paragraph as ``&#32;`` to force the entity decoder onto the
    hash path."""
    body_text = escape_html(text)
    if doc_id % 7 == 0:
        body_text = body_text.replace(" ", "&#32;")
    if doc_id % 5 == 1:
        meta = (
            '<meta http-equiv="Content-Type" '
            'content="text/html; charset=utf-8">'
        )
    else:
        meta = '<meta charset="utf-8">'
    return (
        "<!DOCTYPE html>\n<html>\n<head>\n"
        f"{meta}\n<title>Doc {doc_id}</title>\n"
        "<style>p { margin: 0; }</style>\n</head>\n<body>\n"
        '<nav><a href="/">Home &amp; Start</a> <a href="/about">About</a> '
        '<a href="/contact">Contact</a></nav>\n'
        f"<h1>Document {doc_id}</h1>\n"
        f"<p>{body_text}</p>\n"
        "<!-- tracking pixel removed -->\n"
        "<script>var x = 1 < 2 && 3 > 2;</script>\n"
        '<div><a href="/next">Next page</a> <a href="/prev">Previous page</a></div>\n'
        "</body>\n</html>\n"
    )


def synth_http_response(doc_id: int, html: str) -> bytes:
    """Deterministic HTTP/1.1 200 message for the page, cycling the
    transfer variants a real crawl contains: ``doc_id % 3`` picks
    gzip Content-Encoding / chunked Transfer-Encoding / plain, and
    ``doc_id % 5 == 0`` serves UTF-16LE with BOM (header-declared
    charset=utf-16) instead of UTF-8 — every decode path lands on the
    same final text, so the oracle is unchanged while the parser is
    fully exercised."""
    if doc_id % 5 == 0:
        body = b"\xff\xfe" + html.encode("utf-16-le")
        ctype = "text/html; charset=utf-16"
    else:
        body = html.encode("utf-8")
        ctype = "text/html"
    headers = [f"Content-Type: {ctype}"]
    if doc_id % 3 == 0:
        body = gzip_member(body)
        headers.append("Content-Encoding: gzip")
        headers.append(f"Content-Length: {len(body)}")
    elif doc_id % 3 == 1:
        chunks = [body[i : i + 500] for i in range(0, len(body), 500)] or [b""]
        body = (
            b"".join(b"%x\r\n%s\r\n" % (len(c), c) for c in chunks) + b"0\r\n\r\n"
        )
        headers.append("Transfer-Encoding: chunked")
    else:
        headers.append(f"Content-Length: {len(body)}")
    head = "\r\n".join(["HTTP/1.1 200 OK", "Server: synth/1.0", *headers])
    return head.encode("ascii") + b"\r\n\r\n" + body


def synth_warc_payload(doc_id: int, text: str) -> bytes:
    """One .warc.gz payload (3 gzip members: warcinfo + request +
    response) for a document row."""
    uri = f"https://example.org/doc/{doc_id}"
    date = "2026-01-01T00:00:00Z"
    info = build_record(
        "warcinfo",
        b"software: avro-diff-spark synth\r\nformat: WARC File Format 1.0\r\n",
        record_id=f"{doc_id:08d}-0000-4000-8000-000000000000",
        date=date,
        content_type="application/warc-fields",
    )
    req = build_record(
        "request",
        (
            f"GET /doc/{doc_id} HTTP/1.1\r\nHost: example.org\r\n"
            "User-Agent: synth/1.0\r\n\r\n"
        ).encode("ascii"),
        record_id=f"{doc_id:08d}-0000-4000-8000-000000000001",
        date=date,
        target_uri=uri,
        content_type='application/http;msgtype=request',
    )
    resp = build_record(
        "response",
        synth_http_response(doc_id, synth_page_html(doc_id, text)),
        record_id=f"{doc_id:08d}-0000-4000-8000-000000000002",
        date=date,
        target_uri=uri,
        content_type='application/http;msgtype=response',
    )
    return build_warc([info, req, resp])


def synth_warc_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(media_id, payload) with payload a full 3-record .warc.gz, built
    executor-side via Arrow-batched ``mapInPandas`` from just the id and
    text columns."""
    narrow = df.select(id_col, text_col)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for b in batches:
            yield pd.DataFrame(
                {
                    "media_id": b[id_col].astype("int64"),
                    "payload": [
                        synth_warc_payload(int(i), "" if t is None else str(t))
                        for i, t in zip(b[id_col], b[text_col])
                    ],
                }
            )

    return narrow.mapInPandas(run, schema="media_id long, payload binary")


def write_warc(
    df: DataFrame,
    path: str,
    *,
    uri_col: str = "target_uri",
    body_col: str = "body",
    status_col: str | None = None,
    content_type_col: str | None = None,
    date: str = "2026-01-01T00:00:00Z",
    gzip_per_record: bool = True,
    via: str = "auto",
) -> None:
    """Distributed WARC sink (the ``write_avro`` shape): ``path``
    becomes a directory of one ``part-NNNNN.warc.gz`` per non-empty
    partition, each encoded executor-side as standard response records
    (HTTP 200 envelope with Content-Length; the status/content-type
    columns override the defaults). Record ids derive from
    md5(uri|part|row) — deterministic, no uuid4. :func:`read_warc`
    reads the directory back transparently (round-trip pytest-pinned).
    Empty partitions write no file; rows with NULL uri or body are
    skipped (a crawl archive has no entry for an unfetched page).

    Parts commit atomically (tmp + rename) through
    :func:`sources.sink.write_parts`: plain local paths write
    executor-direct, while ``hdfs://`` / ``s3a://`` / any other Hadoop
    URI routes through the JVM ``FileSystem`` API, so parts land at the
    destination on multi-node clusters with executor-local disks too
    (``via='auto'`` dispatch; see sources/sink.py for the three routes'
    contracts)."""
    import hashlib

    from avro_diff_spark.sources.sink import write_parts

    cols = [uri_col, body_col]
    if status_col:
        cols.append(status_col)
    if content_type_col:
        cols.append(content_type_col)
    narrow = df.select(*cols)
    suffix = ".warc.gz" if gzip_per_record else ".warc"

    def encode(idx: int, it, out) -> bool:
        recs = []
        for n, row in enumerate(it):
            uri, body = row[uri_col], row[body_col]
            if uri is None or body is None:
                continue
            if status_col and row[status_col] is None:
                continue  # no status = no valid response to archive
            body = bytes(body) if not isinstance(body, (bytes, bytearray)) else body
            status = int(row[status_col]) if status_col else 200
            ctype = (row[content_type_col] if content_type_col else None) or "text/html"
            reason = "OK" if status == 200 else ""
            http = (
                f"HTTP/1.1 {status} {reason}\r\nContent-Type: {ctype}\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode("ascii", "replace") + bytes(body)
            rid = hashlib.md5(f"{uri}|{idx}|{n}".encode()).hexdigest()
            rid = f"{rid[:8]}-{rid[8:12]}-{rid[12:16]}-{rid[16:20]}-{rid[20:]}"
            recs.append(
                build_record(
                    "response",
                    http,
                    record_id=rid,
                    date=date,
                    target_uri=str(uri),
                    content_type="application/http;msgtype=response",
                )
            )
        if not recs:
            return False
        out.write(build_warc(recs, gzip_per_record=gzip_per_record))
        return True

    write_parts(
        narrow, path, encode, suffix, stale_suffixes=(".warc", ".warc.gz"), via=via
    )
