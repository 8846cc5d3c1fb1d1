"""Host backtracking regex engine: backreferences + lookaround.

Backreferences make a pattern non-regular (the copy language), and
lookaround needs to consult bytes past the current position — neither fits
the device DFA/NFA engines or the tagged Pike VM (``models/captures.py``),
whose thread-merge step is only sound when the future is a function of
(state, position).  Patterns containing either therefore run on this
classic recursive-descent backtracker with **Python ``re`` semantics**:
leftmost-FIRST disambiguation, greedy/lazy quantifier ordering, fixed-width
lookbehind, capture persistence out of positive lookahead, and the empty-
match iteration rules (validated by a directed + fuzz suite against ``re``
itself, ``tests/test_backtrack.py``).

This is deliberately the one engine family with super-linear worst cases
(catastrophic backtracking exists in every backtracking engine, including
``re``); everything device-routed stays linear.  The reference has no
regex front-end at all (SURVEY.md §0 — pure RTL), so this layer is part of
the "usable framework" surface built on top of its semantics, like the
rest of the ``re``-compat stack.

Compilation: each AST node lowers once to a closure
``f(data, pos, k) -> end | None`` where ``k(pos2)`` is the continuation;
group state lives in a shared list the closures save/restore around
backtracking.
"""

from __future__ import annotations

from .regex import (
    Alt, Anchor, Backref, Bound, Cat, Group, Lit, Look, ParsedPattern,
    RegexError, Rep, parse_pattern,
)

__all__ = ["BacktrackProgram"]

_WORD = frozenset(
    list(range(ord("a"), ord("z") + 1))
    + list(range(ord("A"), ord("Z") + 1))
    + list(range(ord("0"), ord("9") + 1))
    + [ord("_")]
)


def _width(node) -> tuple[int, int | None]:
    """(min, max) matched byte width; max None = unbounded."""
    if isinstance(node, Lit):
        return 1, 1
    if isinstance(node, Cat):
        lo = hi = 0
        for p in node.parts:
            a, b = _width(p)
            lo += a
            hi = None if (hi is None or b is None) else hi + b
        return lo, hi
    if isinstance(node, Alt):
        ws = [_width(o) for o in node.options]
        los = [a for a, _ in ws]
        his = [b for _, b in ws]
        return min(los), (None if any(b is None for b in his) else max(his))
    if isinstance(node, Rep):
        a, b = _width(node.node)
        return (a * node.lo,
                None if (b is None or node.hi is None) else b * node.hi)
    if isinstance(node, Group):
        return _width(node.node)
    if isinstance(node, Backref):
        return 0, None  # depends on what the group captured
    return 0, 0  # Bound / Anchor / Look are zero-width


class BacktrackProgram:
    """Compiled backtracking matcher for one parsed pattern."""

    def __init__(self, pattern_or_parsed):
        pp = (pattern_or_parsed
              if isinstance(pattern_or_parsed, ParsedPattern)
              else parse_pattern(pattern_or_parsed))
        self.pp = pp
        self.num_groups = pp.num_groups
        self.group_names = dict(pp.group_names)
        self._fold = pp.ignore_case
        self._multiline = pp.multiline
        # groups[i] = (start, end, seq) | None; seq orders lastindex
        self._groups: list = [None] * (pp.num_groups + 1)
        self._seq = 0
        self._data = b""
        self._body = self._compile(pp.node)

    # -- node lowering ---------------------------------------------------

    def _compile(self, node):
        if isinstance(node, Lit):
            chars = node.chars

            def f(d, p, k, chars=chars):
                return k(p + 1) if p < len(d) and d[p] in chars else None

            return f
        if isinstance(node, Cat):
            fs = [self._compile(p) for p in node.parts]

            def f(d, p, k, fs=fs):
                def step(i, p2):
                    if i == len(fs):
                        return k(p2)
                    return fs[i](d, p2, lambda p3, i=i: step(i + 1, p3))

                return step(0, p)

            return f
        if isinstance(node, Alt):
            fs = [self._compile(o) for o in node.options]

            def f(d, p, k, fs=fs):
                for sub in fs:
                    r = sub(d, p, k)
                    if r is not None:
                        return r
                return None

            return f
        if isinstance(node, Rep) and isinstance(node.node, Lit):
            # iterative fast path: a repeated character class needs no
            # per-iteration recursion (the general path recurses once per
            # byte, which would hit Python's recursion limit on long runs)
            chars = node.node.chars
            lo, hi, lazy = node.lo, node.hi, node.lazy

            def f(d, p, k, chars=chars, lo=lo, hi=hi, lazy=lazy):
                n = len(d)
                m = 0
                limit = n - p if hi is None else min(hi, n - p)
                while m < limit and d[p + m] in chars:
                    m += 1
                if m < lo:
                    return None
                counts = range(lo, m + 1) if lazy else range(m, lo - 1, -1)
                for cnt in counts:
                    r = k(p + cnt)
                    if r is not None:
                        return r
                return None

            return f
        if isinstance(node, Rep):
            sub = self._compile(node.node)
            lo, hi, lazy = node.lo, node.hi, node.lazy

            def f(d, p, k, sub=sub, lo=lo, hi=hi, lazy=lazy):
                def rep(count, p2):
                    can_more = hi is None or count < hi
                    done_ok = count >= lo

                    def again(p3, count=count, p2=p2):
                        if p3 == p2 and count + 1 >= lo:
                            # empty iteration past the minimum: stop
                            # looping (re's empty-repeat rule)
                            return k(p3)
                        return rep(count + 1, p3)

                    if lazy:
                        if done_ok:
                            r = k(p2)
                            if r is not None:
                                return r
                        return sub(d, p2, again) if can_more else None
                    if can_more:
                        r = sub(d, p2, again)
                        if r is not None:
                            return r
                    return k(p2) if done_ok else None

                return rep(0, p)

            return f
        if isinstance(node, Group):
            sub = self._compile(node.node)
            idx = node.index

            def f(d, p, k, sub=sub, idx=idx):
                old = self._groups[idx]

                def k2(p2):
                    self._seq += 1
                    self._groups[idx] = (p, p2, self._seq)
                    r = k(p2)
                    if r is None:
                        self._groups[idx] = old
                    return r

                r = sub(d, p, k2)
                if r is None:
                    self._groups[idx] = old
                return r

            return f
        if isinstance(node, Backref):
            idx = node.index
            fold = self._fold

            def f(d, p, k, idx=idx, fold=fold):
                g = self._groups[idx]
                if g is None:
                    return None  # unmatched group: backref fails (as in re)
                ref = d[g[0] : g[1]]
                cand = d[p : p + len(ref)]
                if len(cand) != len(ref):
                    return None
                if cand != ref and not (
                    fold and cand.lower() == ref.lower()
                ):
                    return None
                return k(p + len(ref))

            return f
        if isinstance(node, Bound):
            neg = node.negate

            def f(d, p, k, neg=neg):
                before = p > 0 and d[p - 1] in _WORD
                after = p < len(d) and d[p] in _WORD
                return k(p) if (before != after) != neg else None

            return f
        if isinstance(node, Anchor):
            kind = node.kind

            def f(d, p, k, kind=kind):
                if kind == "^":
                    ok = p == 0 or d[p - 1] == 0x0A
                elif kind == "$":
                    ok = p == len(d) or d[p] == 0x0A
                elif kind == "A":
                    ok = p == 0
                else:  # "Z": absolute end, no trailing-newline allowance
                    ok = p == len(d)
                return k(p) if ok else None

            return f
        if isinstance(node, Look):
            sub = self._compile(node.node)
            if node.behind:
                wlo, whi = _width(node.node)
                if whi is None or wlo != whi:
                    raise RegexError(
                        "look-behind requires a fixed-width sub-pattern "
                        "(same rule as Python re)"
                    )
                w = wlo

                def f(d, p, k, sub=sub, w=w, neg=node.negate):
                    snap = list(self._groups)
                    hit = (p - w >= 0 and
                           sub(d, p - w, lambda p2: p2 if p2 == p else None)
                           is not None)
                    if hit == neg:
                        self._groups[:] = snap
                        return None
                    if neg:  # captures inside a failed branch don't leak
                        self._groups[:] = snap
                    return k(p)

                return f

            def f(d, p, k, sub=sub, neg=node.negate):
                snap = list(self._groups)
                hit = sub(d, p, lambda p2: p2) is not None
                if hit == neg:
                    self._groups[:] = snap
                    return None
                if neg:
                    self._groups[:] = snap
                return k(p)

            return f
        raise TypeError(node)

    # -- matching --------------------------------------------------------

    def match_at(self, data: bytes, pos: int, full: bool = False):
        """Leftmost-first anchored match at ``pos``: returns
        ``(end, groups, lastindex)`` with ``groups[i] = (start, end) |
        None`` and ``groups[0]`` the whole span, or None.  Honors the
        pattern's whole-pattern ``$``; ``full=True`` additionally requires
        the match to consume the whole buffer (``re.fullmatch`` — the
        engine backtracks into shorter-preferred alternatives to reach
        end-of-buffer)."""
        self._groups = [None] * (self.num_groups + 1)
        self._seq = 0
        if full or self.pp.end_anchored:
            k = lambda p2: p2 if p2 == len(data) else None  # noqa: E731
        else:
            k = lambda p2: p2  # noqa: E731
        end = self._body(data, pos, k)
        if end is None:
            return None
        groups = [(pos, end)] + [
            (g[0], g[1]) if g is not None else None
            for g in self._groups[1:]
        ]
        seqs = [(g[2], i) for i, g in enumerate(self._groups) if i and g]
        lastindex = max(seqs)[1] if seqs else None
        return end, groups, lastindex

    def search_spans(self, data: bytes, start_at: int = 0):
        """Leftmost match at/after ``start_at`` (None if none)."""
        n = len(data)
        last = 0 if self.pp.start_anchored else n
        for s in range(start_at, min(last, n) + 1):
            m = self.match_at(data, s)
            if m is not None:
                return (s,) + m
        return None

    def finditer_spans(self, data: bytes):
        """Non-overlapping (start, end) spans, Python ``re`` iteration
        rules (empty match advances one byte)."""
        out = []
        pos = 0
        n = len(data)
        while pos <= n:
            m = self.search_spans(data, pos)
            if m is None:
                break
            s, e = m[0], m[1]
            out.append((s, e))
            pos = e + 1 if e == s else e
            if self.pp.start_anchored:
                break
        return out
