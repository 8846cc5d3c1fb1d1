"""Minimal HTTP/1.x request carving for Snort ``http_*`` buffer modifiers.

Snort's HTTP inspector normalizes and splits a reassembled request into
sticky buffers (``http_method``, ``http_uri``, ``http_header``,
``http_client_body``, ``http_cookie``); rule contents tagged with a
buffer modifier match against that buffer only.  This stream scanner has
no TCP reassembly or normalization stage, so the carve here is the
CONSERVATIVE subset that is exact without either:

* one request per payload, parsed at payload start: request line
  ``METHOD SP URI SP HTTP/x[.y]`` (known methods only), header block up
  to the first blank line, body = the rest;
* every buffer is a verbatim SLICE of the payload (no URI decoding, no
  header folding, no chunked-encoding reassembly) — so a buffered
  content is always a literal substring of the payload, which keeps the
  raw-stream AC prefilter a sound superset;
* a payload that does not parse as an HTTP request has NO buffers, and
  buffered contents then fail (Snort: the buffer is absent).

``api.SnortMatcher`` documents which rule shapes remain unenforced
(e.g. relative byte ops chained after a buffered content — Snort's
per-buffer DOE pointer semantics) and flags them in
``enforcement_report`` rather than approximating them.
"""

from __future__ import annotations

from typing import NamedTuple

__all__ = ["HttpBuffers", "parse_http_request", "HTTP_METHODS"]

HTTP_METHODS = frozenset({
    b"GET", b"POST", b"HEAD", b"PUT", b"DELETE", b"OPTIONS", b"TRACE",
    b"CONNECT", b"PATCH", b"PROPFIND", b"PROPPATCH", b"MKCOL", b"COPY",
    b"MOVE", b"LOCK", b"UNLOCK", b"REPORT", b"SEARCH", b"SUBSCRIBE",
    b"NOTIFY",
})


class HttpBuffers(NamedTuple):
    """(start, end) payload spans per buffer; a span of None = absent.
    Spans (not copies) so verifiers can report payload offsets."""

    method: tuple[int, int]
    uri: tuple[int, int]
    header: tuple[int, int] | None       # raw header block (after req line)
    client_body: tuple[int, int] | None
    cookie: tuple[int, int] | None       # first Cookie: header's value


def parse_http_request(payload: bytes) -> HttpBuffers | None:
    """Carve one HTTP/1.x request at payload start, or None.

    Tolerates a missing header/body section (request line only).  Line
    endings: CRLF or bare LF (as Snort's inspector tolerates)."""
    # request line
    eol = payload.find(b"\n")
    line_end = eol if eol != -1 else len(payload)
    line = payload[:line_end]
    if line.endswith(b"\r"):
        line = line[:-1]
    sp1 = line.find(b" ")
    if sp1 <= 0 or line[:sp1].upper() not in HTTP_METHODS:
        return None
    sp2 = line.rfind(b" ")
    if sp2 <= sp1 or not line[sp2 + 1:].startswith(b"HTTP/"):
        return None
    method = (0, sp1)
    uri = (sp1 + 1, sp2)
    if uri[0] >= uri[1]:
        return None
    if eol == -1:
        return HttpBuffers(method, uri, None, None, None)

    # header block: up to the first blank line
    hdr_start = eol + 1
    body_start = None
    blank_at = None
    i = hdr_start
    n = len(payload)
    while i < n:
        j = payload.find(b"\n", i)
        if j == -1:
            i = n
            break
        stripped = payload[i:j]
        if stripped in (b"", b"\r"):
            blank_at = i    # header block ends BEFORE the blank line
            body_start = j + 1
            break
        i = j + 1
    hdr_end = blank_at if blank_at is not None else i
    header = (hdr_start, max(hdr_start, min(hdr_end, n))) \
        if hdr_start <= n else None
    if header is not None and header[0] >= header[1]:
        header = None

    client_body = None
    if body_start is not None and body_start < n:
        client_body = (body_start, n)

    cookie = None
    if header is not None:
        h0, h1 = header
        pos = h0
        while pos < h1:
            j = payload.find(b"\n", pos, h1 + 1)
            line_e = j if j != -1 else h1
            raw_line = payload[pos:line_e]
            name_end = raw_line.find(b":")
            if name_end > 0 and raw_line[:name_end].strip().lower() == b"cookie":
                v0 = pos + name_end + 1
                v1 = line_e
                while v0 < v1 and payload[v0] in b" \t":
                    v0 += 1
                while v1 > v0 and payload[v1 - 1] in b"\r \t":
                    v1 -= 1
                if v0 < v1:
                    cookie = (v0, v1)
                break
            if j == -1:
                break
            pos = j + 1

    return HttpBuffers(method, uri, header, client_body, cookie)
