"""Capture-group extraction: a tagged Pike VM over device-found spans.

The reference design reports only accept-state indices (`Design/FPGA.v:210-226`
— there is no notion of sub-spans in the RTL), and the TPU scan engines are
(subset-)DFAs, which cannot track capture groups.  This module supplies the
two-stage design used by production DFA engines (RE2, Hyperscan): the device
engines find match SPANS at full throughput; group sub-spans are then
recovered host-side by re-walking just the matched bytes — O(span × NFA
states), and spans are short.

Disambiguation: the overall span is fixed by the caller (the engines are
POSIX leftmost-longest); WITHIN that span, group assignment follows greedy
(Perl/PCRE) thread priority — alternation prefers the leftmost branch,
quantifiers prefer more repetitions, and a repeated group captures its last
repetition.  This matches Python ``re`` whenever Python agrees on the span.

Construction: the parsed AST (``models/regex.py``, including ``Group`` nodes)
is lowered to an eps-NFA whose eps out-edges are *priority-ordered* and may
carry a tag id; tag ``2k`` / ``2k+1`` records the open / close byte offset of
group ``k+1``.  Simulation is the classic Pike VM: an ordered thread list per
position, state-deduplicated so the highest-priority thread owns each state.
"""

from __future__ import annotations

from .regex import Alt, Cat, Group, Lit, ParsedPattern, Rep, parse_pattern

__all__ = ["CaptureProgram"]

_UNSET = -1


class _Prog:
    """Tagged eps-NFA with ordered successors.

    ``char[s]`` = (charset, dst) for byte-consuming states, else None.
    ``eps[s]``  = ordered list of (dst, tag|None); tag writes the current
    byte offset into slot ``tag`` when the edge is traversed.
    """

    def __init__(self):
        self.char: list[tuple[frozenset, int] | None] = []
        self.eps: list[list[tuple[int, int | None]]] = []

    def new(self) -> int:
        self.char.append(None)
        self.eps.append([])
        return len(self.char) - 1


def _lower(prog: _Prog, node) -> tuple[int, int]:
    """Lower one AST fragment; returns (entry, exit).  Eps edges are appended
    in PRIORITY order: earlier edge = preferred path (greedy)."""
    if isinstance(node, Lit):
        a, b = prog.new(), prog.new()
        prog.char[a] = (node.chars, b)
        return a, b
    if isinstance(node, Cat):
        if not node.parts:
            a = prog.new()
            return a, a
        entry, cur = _lower(prog, node.parts[0])
        for part in node.parts[1:]:
            na, nb = _lower(prog, part)
            prog.eps[cur].append((na, None))
            cur = nb
        return entry, cur
    if isinstance(node, Alt):
        a, b = prog.new(), prog.new()
        for opt in node.options:  # textual order = priority order
            fa, fb = _lower(prog, opt)
            prog.eps[a].append((fa, None))
            prog.eps[fb].append((b, None))
        return a, b
    if isinstance(node, Rep):
        lo, hi = node.lo, node.hi
        a = prog.new()
        cur = a
        for _ in range(lo):
            fa, fb = _lower(prog, node.node)
            prog.eps[cur].append((fa, None))
            cur = fb
        if hi is None:
            # greedy loop: from the loop head, prefer another iteration
            loop = prog.new()
            prog.eps[cur].append((loop, None))
            fa, fb = _lower(prog, node.node)
            prog.eps[loop].append((fa, None))  # 1st: take the body
            prog.eps[fb].append((loop, None))
            out = prog.new()
            prog.eps[loop].append((out, None))  # 2nd: leave
            return a, out
        out = prog.new()
        tail_skips = []
        for _ in range(hi - lo):
            fa, fb = _lower(prog, node.node)
            prog.eps[cur].append((fa, None))  # 1st: take this optional copy
            tail_skips.append(cur)
            cur = fb
        prog.eps[cur].append((out, None))
        for s in tail_skips:
            prog.eps[s].append((out, None))  # 2nd: skip out (lower priority)
        return a, out
    if isinstance(node, Group):
        a, b = prog.new(), prog.new()
        fa, fb = _lower(prog, node.node)
        k = node.index - 1
        prog.eps[a].append((fa, 2 * k))
        prog.eps[fb].append((b, 2 * k + 1))
        return a, b
    raise TypeError(node)


class CaptureProgram:
    """Compiled capture extractor for one pattern.

    ``extract(data, start, end)`` re-matches ``data[start:end]`` (anchored at
    both ends — the span is already known to match) and returns one
    ``(open, close)`` absolute-offset pair per capture group, or ``None`` for
    groups not reached on the winning path.
    """

    def __init__(self, pattern_or_parsed: str | bytes | ParsedPattern):
        pp = (
            pattern_or_parsed
            if isinstance(pattern_or_parsed, ParsedPattern)
            else parse_pattern(pattern_or_parsed)
        )
        self.num_groups = pp.num_groups
        self.group_names = dict(pp.group_names)
        prog = _Prog()
        self._entry, self._accept = _lower(prog, pp.node)
        self._prog = prog

    # -- Pike VM -----------------------------------------------------------

    def _close(self, threads, state, tags, last, pos, seen):
        """Priority-ordered eps closure: DFS appending byte-consuming states
        (and the accept state) to the ordered thread list.  ``last`` tracks
        the chronologically last tag written on the thread's path — the
        source of ``Match.lastindex`` (Python ``re``'s "lastmark")."""
        if state in seen:
            return
        seen.add(state)
        if self._prog.char[state] is not None or state == self._accept:
            threads.append((state, tags, last))
        for dst, tag in self._prog.eps[state]:
            nt, nl = tags, last
            if tag is not None:
                nt = list(tags)
                nt[tag] = pos
                nl = tag
            self._close(threads, dst, nt, nl, pos, seen)

    def extract(
        self, data: bytes | bytearray | memoryview, start: int, end: int
    ) -> tuple[list[tuple[int, int] | None], int | None]:
        """Returns ``(group_spans, lastindex)``."""
        if self.num_groups == 0:
            return [], None
        threads: list = []
        self._close(
            threads, self._entry, [_UNSET] * (2 * self.num_groups), None,
            start, set(),
        )
        for pos in range(start, end):
            b = data[pos]
            nxt: list = []
            seen: set = set()
            for state, tags, last in threads:
                edge = self._prog.char[state]
                if edge is not None and b in edge[0]:
                    self._close(nxt, edge[1], tags, last, pos + 1, seen)
            threads = nxt
            if not threads:
                break
        for state, tags, last in threads:
            if state == self._accept:
                spans = [
                    None
                    if tags[2 * k] == _UNSET or tags[2 * k + 1] == _UNSET
                    else (tags[2 * k], tags[2 * k + 1])
                    for k in range(self.num_groups)
                ]
                return spans, (None if last is None else last // 2 + 1)
        # span was produced by the same language — should be unreachable
        return [None] * self.num_groups, None
