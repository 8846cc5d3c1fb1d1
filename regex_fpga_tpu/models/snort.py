"""Snort ``.rules`` front-end: parse rules, scan with the AC prefilter +
per-rule verification pipeline.

The reference's second ruleset image, ``CSR_BlockMem_snort_16.coe``, derives
from Snort IDS rules (`/root/reference/Block_Mem/`, SURVEY.md §2.1 #14), but
the compiler that produced it was never published.  This module closes the
loop on the *source* side: read real Snort rule files and scan traffic with
the same two-stage architecture Snort itself uses —

  1. **multi-pattern prefilter** (device): every rule's ``content``
     literals go into one Aho–Corasick automaton (``models/literals.py``)
     scanned by the fast MXU engines; a rule is a candidate only if ALL its
     non-negated contents occur in the stream.  Case-insensitive
     (``nocase``) contents are handled by a second automaton over the
     case-folded stream.
  2. **per-rule verification** (host, candidates only): ordered occurrence
     of the contents (each must match after the previous one ends), absence
     of negated contents, and the rule's ``pcre`` (if present) checked with
     this framework's own DFA regex engine where the pattern compiles
     (PCRE constructs outside the supported subset leave the rule
     content-verified only, flagged in the result).

Supported + ENFORCED rule options: ``msg``, ``sid``, ``content`` (with
``|hex|`` escapes, ``!`` negation, the ``nocase`` modifier, and the
positional modifiers ``offset``/``depth`` — absolute window from payload
start — and ``distance``/``within`` — window relative to the previous
content match's end), ``pcre``.  The verifier backtracks across content
occurrences, so a rule matches whenever ANY assignment of occurrences
satisfies every window (greedy-first would wrongly refuse some rules).
Remaining options (byte_test, flow, http_* buffers, …) are preserved in
``SnortRule.options`` but not enforced — this is a stream scanner, not a
full packet IDS.
"""

from __future__ import annotations

import dataclasses
import re as _pyre

__all__ = [
    "SnortContent",
    "SnortRule",
    "parse_snort_rules",
    "load_snort_rules",
]


@dataclasses.dataclass(frozen=True)
class SnortContent:
    pattern: bytes
    nocase: bool = False
    negated: bool = False
    #: positional modifiers (ENFORCED by the matcher, ``api.SnortMatcher``):
    #: ``offset``/``depth`` window the search absolutely from payload start
    #: (depth is measured from offset, per Snort); ``distance``/``within``
    #: window it relative to the END of the previous content match
    #: (``within`` bounds the current match's END, Suricata-compatible).
    #: None = unconstrained.  Variable (byte_extract) values stay None.
    offset: int | None = None
    depth: int | None = None
    distance: int | None = None
    within: int | None = None


@dataclasses.dataclass(frozen=True)
class SnortRule:
    action: str
    proto: str
    header: str                       # the full "src -> dst" header text
    msg: str
    sid: int | None
    contents: tuple[SnortContent, ...]
    pcre: str | None                  # raw /pattern/flags text, or None
    options: tuple[tuple[str, str | None], ...]  # every option, in order


_HEX_CHUNK = _pyre.compile(r"\|([0-9A-Fa-f\s]*)\|")


def _decode_content(text: str) -> bytes:
    """Snort content string → bytes: ``|41 42|`` hex chunks, backslash
    escapes for ``; " \\ :`` and literal bytes otherwise."""
    out = bytearray()
    i = 0
    while i < len(text):
        c = text[i]
        if c == "|":
            m = _HEX_CHUNK.match(text, i)
            if not m:
                raise ValueError(f"unterminated |hex| in content: {text!r}")
            for tok in m.group(1).split():
                if len(tok) % 2:
                    raise ValueError(f"odd-length hex token in content: {tok!r}")
                for j in range(0, len(tok), 2):
                    out.append(int(tok[j:j + 2], 16))
            i = m.end()
        elif c == "\\" and i + 1 < len(text):
            out.append(ord(text[i + 1]))
            i += 2
        else:
            out.append(ord(c))
            i += 1
    return bytes(out)


def _split_options(body: str) -> list[tuple[str, str | None]]:
    """Split a rule body on ``;`` outside quotes; each option is
    ``name[:value]``."""
    opts: list[tuple[str, str | None]] = []
    cur = []
    in_q = False
    i = 0
    while i < len(body):
        c = body[i]
        if c == '"' and (i == 0 or body[i - 1] != "\\"):
            in_q = not in_q
            cur.append(c)
        elif c == ";" and not in_q:
            tok = "".join(cur).strip()
            if tok:
                name, _, val = tok.partition(":")
                opts.append((name.strip(), val.strip() if _ else None))
            cur = []
        else:
            cur.append(c)
        i += 1
    tok = "".join(cur).strip()
    if tok:
        name, _, val = tok.partition(":")
        opts.append((name.strip(), val.strip() if _ else None))
    return opts


def _unquote(val: str) -> tuple[str, bool]:
    """Strip optional leading ``!`` and surrounding quotes; returns
    (text, negated)."""
    negated = False
    v = val.strip()
    if v.startswith("!"):
        negated = True
        v = v[1:].strip()
    if len(v) >= 2 and v[0] == '"' and v[-1] == '"':
        v = v[1:-1]
    return v, negated


def parse_snort_rules(text: str) -> list[SnortRule]:
    """Parse a Snort rules file (comments, blank lines, ``\\`` line
    continuations).  Lines without a ``( ... )`` option body are skipped
    (preprocessor directives, variables)."""
    rules: list[SnortRule] = []
    logical: list[str] = []
    pending = ""
    for raw in text.splitlines():
        line = pending + raw
        pending = ""
        if line.rstrip().endswith("\\"):
            pending = line.rstrip()[:-1]
            continue
        logical.append(line)
    if pending:
        logical.append(pending)

    for line in logical:
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        lp = line.find("(")
        rp = line.rfind(")")
        if lp == -1 or rp == -1 or rp < lp:
            continue
        head = line[:lp].split()
        if len(head) < 2:
            continue
        action, proto = head[0], head[1]
        header = " ".join(head[2:])
        opts = _split_options(line[lp + 1 : rp])

        msg = ""
        sid: int | None = None
        pcre: str | None = None
        contents: list[SnortContent] = []
        for name, val in opts:
            if name == "msg" and val is not None:
                msg = _unquote(val)[0]
            elif name == "sid" and val is not None:
                try:
                    sid = int(val)
                except ValueError:
                    pass
            elif name == "content" and val is not None:
                s, neg = _unquote(val)
                contents.append(
                    SnortContent(pattern=_decode_content(s), negated=neg)
                )
            elif name == "nocase" and contents:
                contents[-1] = dataclasses.replace(contents[-1], nocase=True)
            elif (name in ("offset", "depth", "distance", "within")
                  and contents and val is not None):
                try:
                    contents[-1] = dataclasses.replace(
                        contents[-1], **{name: int(val)}
                    )
                except ValueError:
                    pass  # byte_extract variable: left unenforced (None)
            elif name == "pcre" and val is not None:
                pcre = _unquote(val)[0]
        rules.append(
            SnortRule(
                action=action,
                proto=proto,
                header=header,
                msg=msg,
                sid=sid,
                contents=tuple(contents),
                pcre=pcre,
                options=tuple(opts),
            )
        )
    return rules


def load_snort_rules(path: str) -> list[SnortRule]:
    with open(path, "r", errors="surrogateescape") as f:
        return parse_snort_rules(f.read())


def pcre_to_pattern(pcre: str) -> str | None:
    """Best-effort ``/pattern/flags`` → this framework's regex subset.
    Returns None when the flags or constructs are outside the subset
    (caller then relies on content verification alone)."""
    if not pcre.startswith("/"):
        return None
    end = pcre.rfind("/")
    if end <= 0:
        return None
    body, flags = pcre[1:end], pcre[end + 1 :]
    if set(flags) - set("ism"):  # x/R/U/B… not implemented
        return None
    # common PCRE-only constructs the compiler rejects anyway — fail fast
    # (\b IS supported — it routes the rule to the host Pike-VM verifier,
    # as do (?m) line anchors)
    if _pyre.search(r"\(\?<|\(\?=|\(\?!|\\[1-9]", body):
        return None
    prefix = ("(?i)" if "i" in flags else "") \
        + ("(?s)" if "s" in flags else "") \
        + ("(?m)" if "m" in flags else "")
    return prefix + body
