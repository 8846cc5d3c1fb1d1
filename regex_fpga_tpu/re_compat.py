"""``regex_fpga_tpu.re_compat`` — a drop-in subset of Python's ``re``
module backed by the TPU DFA engines.

The reference design has no software API at all (SURVEY.md §0 — it is pure
RTL); this module is the "switch your code over" surface a regex-engine
user expects: ``compile/search/match/fullmatch/findall/finditer/split/sub``
with ``re``-style signatures, plus the engine-native extras ``count``
(``grep -c`` throughput mode) and ``scan``.

Semantics differences vs ``re`` (inherent to DFA matching):
  * spans are POSIX leftmost-LONGEST, not backtracking leftmost-first —
    ``ab|abc`` on ``"abc"`` matches ``abc`` here, ``ab`` in ``re``;
  * capture groups are not tracked (``Match.group(0)`` only); patterns may
    still *contain* groups — they match, they just don't capture;
  * patterns and subjects are byte-oriented: ``str`` input is UTF-8 encoded
    and spans are byte offsets.

Supported flags: ``IGNORECASE`` (ASCII folding, as ``(?i)``).  ``MULTILINE``
and ``DOTALL`` are not implemented and raise.
"""

from __future__ import annotations

import functools

from .api import DfaMatcher, Match, compile_regex

__all__ = [
    "compile",
    "search",
    "match",
    "fullmatch",
    "findall",
    "finditer",
    "split",
    "sub",
    "subn",
    "count",
    "purge",
    "IGNORECASE",
    "I",
    "Pattern",
    "Match",
    "error",
]

IGNORECASE = I = 2  # value mirrors re.IGNORECASE for interchangeability

from .models.regex import RegexError as error  # noqa: E402  (re.error analogue)


class Pattern:
    """Compiled pattern wrapper; see module docstring for semantics."""

    def __init__(self, pattern: str | bytes, flags: int = 0):
        if flags & ~IGNORECASE:
            raise ValueError(
                f"unsupported flags {flags:#x}: only IGNORECASE is implemented"
            )
        self._text_mode = isinstance(pattern, str)
        pat = pattern.encode("utf-8") if self._text_mode else bytes(pattern)
        if flags & IGNORECASE and not pat.startswith(b"(?i)"):
            pat = b"(?i)" + pat
        self.pattern = pattern
        self.flags = flags
        self._m: DfaMatcher = compile_regex(pat)

    # -- helpers ---------------------------------------------------------
    def _enc(self, data):
        return data.encode("utf-8") if isinstance(data, str) else data

    def _dec(self, b: bytes):
        return b.decode("utf-8", errors="surrogateescape") if self._text_mode else b

    # -- re API ----------------------------------------------------------
    def search(self, string) -> Match | None:
        return self._m.search(self._enc(string))

    def match(self, string) -> Match | None:
        return self._m.match(self._enc(string))

    def fullmatch(self, string) -> Match | None:
        return self._m.fullmatch(self._enc(string))

    def finditer(self, string):
        raw = self._enc(string)
        for a, b in self._m.finditer(raw):
            yield Match(raw, a, b)

    def findall(self, string) -> list:
        return [self._dec(g) for g in self._m.findall(self._enc(string))]

    def split(self, string, maxsplit: int = 0) -> list:
        return [self._dec(p) for p in self._m.split(self._enc(string), maxsplit)]

    def sub(self, repl, string, count: int = 0):
        return self.subn(repl, string, count)[0]

    def subn(self, repl, string, count: int = 0):
        if callable(repl):
            f = repl
            r = lambda m: self._enc(f(m))  # noqa: E731
        else:
            r = self._enc(repl)
        out, n = self._m.subn(r, self._enc(string), count)
        return self._dec(out), n

    # -- engine-native extras -------------------------------------------
    def count(self, string) -> int:
        """Total match-end count at k-gram engine throughput (``grep -c``)."""
        return self._m.count(self._enc(string))

    def scan(self, string):
        """Full per-state ScanReport from the fast DFA engine."""
        return self._m.scan(self._enc(string))

    def __repr__(self) -> str:
        return f"re_compat.compile({self.pattern!r})"


@functools.lru_cache(maxsize=512)
def _compile_cached(pattern, flags: int) -> Pattern:
    return Pattern(pattern, flags)


def compile(pattern, flags: int = 0) -> Pattern:  # noqa: A001 (re parity)
    return _compile_cached(pattern, flags)


def purge() -> None:
    _compile_cached.cache_clear()


def search(pattern, string, flags: int = 0):
    return compile(pattern, flags).search(string)


def match(pattern, string, flags: int = 0):
    return compile(pattern, flags).match(string)


def fullmatch(pattern, string, flags: int = 0):
    return compile(pattern, flags).fullmatch(string)


def findall(pattern, string, flags: int = 0):
    return compile(pattern, flags).findall(string)


def finditer(pattern, string, flags: int = 0):
    return compile(pattern, flags).finditer(string)


def split(pattern, string, maxsplit: int = 0, flags: int = 0):
    return compile(pattern, flags).split(string, maxsplit)


def sub(pattern, repl, string, count: int = 0, flags: int = 0):
    return compile(pattern, flags).sub(repl, string, count)


def subn(pattern, repl, string, count: int = 0, flags: int = 0):
    return compile(pattern, flags).subn(repl, string, count)


def count(pattern, string, flags: int = 0) -> int:
    return compile(pattern, flags).count(string)
