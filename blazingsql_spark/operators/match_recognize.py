"""MATCH_RECOGNIZE — the SQL spelling of row-pattern matching, mapped
onto the repo's CEP core (streaming/patterns.py compiles the same
pattern syntax to a Thompson NFA; queries/relational.py carries the
regexp-shaped batch twin `events_pattern_match`).

The reference engine has no row-pattern surface at all (its Calcite
fork parses none of SQL:2016 §R; engine/src/parser has no pattern
kernels), so this is a beyond-reference convenience for migrating users
who type the standard spelling. Scope — the deterministic core that
covers the common funnel/sessionization queries:

- ``PARTITION BY`` keys, ``ORDER BY`` keys (ASC, with stable tiebreak
  columns listed explicitly);
- ``PATTERN`` over the regular core: symbols, concatenation, ``|``,
  ``(...)``, postfix ``* + ?`` (greedy) and their SQL:2016 RELUCTANT
  forms ``*? +? ?? {n,m}?`` (late r12 — preferment prefers the shortest
  accept; such patterns always route through the priority scanners),
  and ``PERMUTE(A, B, ...)`` (expanded to the alternation of all
  orderings, <= 6 elements);
- ``AFTER MATCH SKIP``: PAST LAST ROW (default, non-overlapping),
  TO NEXT ROW (overlapping matches), TO FIRST/LAST <sym> (resume at a
  mapped row; the SQL:2016 runtime errors — unmapped symbol, resume at
  the match's own first row — raise inside the scan);
- ``DEFINE`` with arbitrary Spark SQL boolean expressions per symbol,
  evaluated row-at-a-time, plus ``PREV(col[, n])`` / ``NEXT(col[, n])``
  navigation with PHYSICAL-offset semantics (the previous/next row of
  the ordered partition, whatever symbol it classified as — running
  semantics). SYMBOL-RELATIVE navigation — ``PREV(A.price)``,
  ``FIRST(V.ts)``, ``LAST(B.amount, 2)``, bare ``A.price`` — is also
  supported: such predicates cannot be pre-evaluated (which rows are
  "mapped to A" depends on the match attempt in progress), so any
  DEFINE containing one routes the whole operator through the
  IN-AUTOMATON path: symbols without navigation still classify through
  one vectorized codegen projection (per-symbol boolean flags), and the
  navigation predicates are compiled by operators/mr_expr.py to scalar
  closures evaluated during the NFA scan with the current row
  tentatively mapped to the symbol under test (SQL:2016 running
  semantics; mr_expr's docstring states the grammar). SYMBOL
  ASSIGNMENT: on the vectorized path (no navigation in DEFINE) a row
  may satisfy SEVERAL predicates and the PATTERN decides the mapping,
  per SQL:2016 PREFERMENT order (r12) — greedy quantifiers prefer
  consuming more, alternation prefers the LEFT branch even when a
  right branch would match longer (``A | B C`` matches just A,
  Oracle/Flink behavior; the classic Oracle V-shape with an undefined
  STRT finds BOTH Vs; see find_match_spans_nd). Partitions whose rows
  each satisfy at most one symbol — the overwhelmingly common
  mutually-exclusive DEFINEs — take the deterministic set-scan when
  the pattern is alternation-free (where preferment and longest
  coincide), byte-identical to the pre-r11 behavior; a user-written
  ``|`` routes even deterministic partitions through the priority
  scanner so preferment holds. The IN-AUTOMATON path (symbol-relative
  navigation in DEFINE) ALSO resolves nondeterministic assignment
  (r12, second half): the cheap deterministic scan (first-true
  classification — DEFINEd symbols in define order, undefined last)
  runs first, and the moment a row satisfies two or more symbols the
  PATTERN could both consume (undefined always-true symbols included),
  the partition re-scans through scan_rows_in_automaton_nd — a Pike-VM
  whose threads each carry their OWN copy-on-write tentative mapping,
  so ``C AS v > LAST(A.v)`` is evaluated against the rows THAT
  THREAD assigned to A, in the same preferment order as the vectorized
  scanner. Histories make state-dedup unsound, so the thread count is
  capped (default 256) with a loud raise — the one genuinely
  exponential corner (several always-true navigation symbols under a
  shared quantifier). Pattern-level preferment (which accepted prefix
  of an attempt's code string wins) is honored on the deterministic
  scan too via ordered-thread stepping when the pattern carries
  ``|``. WITHIN no longer
  forces that path: the duration bound is enforced identically by
  every scanner (_within_breaks), so nav-free WITHIN queries keep the
  vectorized classification and nondeterministic assignment. A row
  matching no symbol breaks any in-flight match on both paths.
- ``MEASURES``: MATCH_NUMBER(), CLASSIFIER(), COUNT(*), COUNT(S.*),
  FIRST/LAST(col [, n]) with the SQL:2016 logical offset,
  FIRST/LAST(S.col [, n]), and the FINAL aggregates
  SUM/AVG/MIN/MAX(col) / SUM/AVG/MIN/MAX(S.col) (NULL-skipping; NULL
  over zero eligible rows); ONE ROW PER MATCH or ALL ROWS PER MATCH.
  Under ALL ROWS PER MATCH measures follow SQL:2016 semantics: the
  unprefixed default is RUNNING (each row sees the measure evaluated
  over its own prefix of the match; bare CLASSIFIER() is per-row), and
  a ``FINAL`` prefix requests the whole-match constant. MATCH_NUMBER()
  is prefix-invariant. Under ONE ROW PER MATCH running and final
  coincide (last-row evaluation).
- ``SUBSET W = (A, B)``: union pattern variables, resolvable anywhere
  a symbol name is (MEASURES, DEFINE navigation, SKIP TO).
- ``WITHIN <interval|number>`` (the Flink extension): bounds the match
  duration against the first ORDER BY key, enforced inside the scan so
  arbitrary vectorized DEFINEs keep working.

Scale shape: classification is one codegen CASE projection; matching is
one applyInPandas over the PARTITION BY key — per-key event history in
memory, the same bound as every MATCH_RECOGNIZE implementation
(Flink/Oracle both require a partition key for parallelism; skewed keys
are the user's modeling problem there too). The NFA scan is O(events)
per key for the patterns the syntax admits.
"""

from __future__ import annotations

import re
from typing import NamedTuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from blazingsql_spark.streaming.patterns import (
    RELUCTANT_PROBE,
    _Nfa,
    compile_pattern,
    ordered_closure,
)

_NO_SYM = "\x00"  # classification miss: breaks any in-flight match


class InAutomatonAmbiguity(ValueError):
    """The deterministic in-automaton scan met a row that satisfies two
    or more symbols the PATTERN could both consume at the current match
    position — first-true classification would diverge from SQL:2016
    nondeterministic symbol assignment there. Raised by the classifier
    as a ROUTING SIGNAL: callers catch it and re-scan the partition with
    :func:`scan_rows_in_automaton_nd` (per-thread tentative mappings).
    Subclasses ValueError so an uncaught escape is still a loud,
    self-explaining error rather than a silent first-true answer."""


_SKIP_PAST = ("past",)


def _skip_resume(skip, pos: int, last_acc: int, span_codes: str) -> int:
    """Next scan position after a match [pos, last_acc) under an AFTER
    MATCH SKIP mode (('past',) | ('next',) | ('first'|'last', char)).
    Raises on the SQL:2016 runtime errors: skipping to a symbol the
    match never mapped, or to the match's own first row (infinite
    loop)."""
    kind = skip[0]
    if kind == "past":
        return last_acc
    if kind == "next":
        return pos + 1
    chs = skip[1]
    hits = [i for i, c in enumerate(span_codes) if c in chs]
    idx = (hits[0] if kind == "first" else hits[-1]) if hits else -1
    if idx < 0:
        raise ValueError(
            f"MATCH_RECOGNIZE: AFTER MATCH SKIP TO {kind.upper()} names a "
            f"symbol the match did not map any row to"
        )
    if idx == 0:
        raise ValueError(
            "MATCH_RECOGNIZE: AFTER MATCH SKIP TO the first row of the "
            "match would loop forever (SQL:2016 runtime error)"
        )
    return pos + idx


def _within_breaks(within, j: int, pos: int) -> bool:
    """True when row ``j`` falls outside the attempt-at-``pos``'s
    match-duration budget (``within=(order_key_values, dur)``) — or
    either key is NULL (x != x catches NaT/nan without a pandas call
    per row). Shared by all three scanners so the bound's semantics
    cannot drift between them."""
    if within is None:
        return False
    tv, dur = within
    tj, tp = tv[j], tv[pos]
    return (
        tj is None or tj != tj or tp is None or tp != tp or tj - tp > dur
    )


def _strip_anchors(pattern: str) -> tuple[str, bool, bool]:
    """SQL:2016 partition anchors, TOP-LEVEL only: a leading ``^``
    (match must start at the partition's first row) and/or a trailing
    ``$`` (match must end at its last row). Returns (pattern without
    anchors, anchor_start, anchor_end); anchors anywhere else reach
    compile_symbols' metacharacter rejection and raise loudly."""
    p = pattern.strip()
    a_start = a_end = False
    if p.startswith("^"):
        a_start, p = True, p[1:].lstrip()
    if p.endswith("$"):
        a_end, p = True, p[:-1].rstrip()
    return p, a_start, a_end


def find_match_spans(
    nfa: _Nfa,
    s: str,
    skip=_SKIP_PAST,
    within=None,
    anchor_start: bool = False,
    anchor_end: bool = False,
) -> list[tuple[int, int]]:
    """Leftmost-longest match spans [(start, end)), the same scan
    discipline as StreamMatcher._scan at end-of-input. ``skip`` selects
    the AFTER MATCH resume point: ('past',) gives the classic
    non-overlapping spans; ('next',) and ('first'|'last', char) allow
    overlapping matches per SQL:2016. ``within=(order_keys, dur)``
    enforces the Flink-style match-duration bound (the accepted prefix
    still emits), identical to scan_rows_in_automaton's.
    ``anchor_start`` restricts attempts to position 0; ``anchor_end``
    accepts only matches ending at the last row (SQL:2016 ^/$)."""
    spans: list[tuple[int, int]] = []
    start_closure = nfa.closure(frozenset([nfa.start]))
    pos, size = 0, len(s)
    while pos < size:
        states = start_closure
        last_acc = -1
        j = pos
        while j < size:
            if within is not None and _within_breaks(within, j, pos):
                break
            nxt = nfa.step(states, s[j])
            if not nxt:
                break
            states = nxt
            j += 1
            if nfa.accept in states and (not anchor_end or j == size):
                last_acc = j
        if last_acc > pos:
            spans.append((pos, last_acc))
            pos = _skip_resume(skip, pos, last_acc, s[pos:last_acc])
        else:
            pos += 1
        if anchor_start:
            break  # only the partition's first row can start a match
    return spans


# ordered_closure moved next to _Nfa (streaming/patterns.py) in r12 so
# StreamMatcherND can share it without a circular import; the local
# name is kept for the scanners below.
_ordered_closure = ordered_closure


def find_match_spans_nd(
    nfa: _Nfa,
    truth,
    size: int,
    skip=_SKIP_PAST,
    within=None,
    anchor_start: bool = False,
    anchor_end: bool = False,
) -> list[tuple[int, int, str]]:
    """Nondeterministic-classification scan (SQL:2016): a row may
    satisfy SEVERAL symbols — ``truth(j, ch)`` says whether row ``j``
    can be consumed as symbol char ``ch`` — and the PATTERN decides the
    assignment. Returns ``[(start, end, codes)]`` with the preferred
    assignment per match in SQL:2016 PREFERMENT order (r12, closing the
    ADVICE-r11 finding): the choice points rank greedy-quantifier
    continuation and the LEFT alternation branch first, exactly the
    eps/trans edge order compile_pattern emits — so ``A | B C`` matches
    just ``A`` even though ``B C`` would be longer (Oracle/Flink
    behavior), while greedy-only patterns still take the longest match
    (every preference there is "consume more"). Mechanically: when the
    highest-priority live thread reaches accept, its match is recorded
    and every LOWER-priority thread is cut (any match they could
    produce ranks below the recorded one); surviving higher-priority
    threads keep extending, and a later accept from one of them
    overrides unconditionally (it ranks above everything recorded).
    With deterministic truth and no alternation in the pattern the
    spans are exactly find_match_spans' (property-tested), so the
    vectorized fast path only routes here when a partition contains an
    ambiguous row or the pattern carries a user-written ``|``.

    Priority-thread simulation (Pike-VM shape): threads are an ordered
    list of NFA states deduplicated first-wins, each carrying its
    assignment as an immutable (char, parent) chain, so per-row work is
    O(states × edges) and reconstruction is O(span) — no backtracking
    blowup on adversarial patterns."""
    spans: list[tuple[int, int, str]] = []
    start_list = _ordered_closure(nfa, [nfa.start])
    # closures are per-state constants: memoize across rows/attempts
    # (the inner loop asks for the same handful of target states
    # millions of times on a long ambiguous partition)
    closure_memo: dict[int, list[int]] = {}

    def closure_of(state: int) -> list[int]:
        got = closure_memo.get(state)
        if got is None:
            got = closure_memo[state] = _ordered_closure(nfa, [state])
        return got

    pos = 0
    while pos < size:
        threads: list[tuple[int, tuple | None]] = [
            (st, None) for st in start_list
        ]
        best_end, best_node = -1, None
        j = pos
        while j < size and threads:
            if within is not None and _within_breaks(within, j, pos):
                break
            new_threads: list[tuple[int, tuple | None]] = []
            seen: set[int] = set()
            for st, node in threads:
                for want, to in nfa.trans.get(st, ()):
                    if want is not None and not truth(j, want):
                        continue
                    nxt_node = (want if want is not None else ".", node)
                    for c in closure_of(to):
                        if c not in seen:
                            seen.add(c)
                            new_threads.append((c, nxt_node))
            threads = new_threads
            j += 1
            if anchor_end and j != size:
                continue  # $-anchored: only size-ending accepts count
            for idx, (st, node) in enumerate(threads):
                if st == nfa.accept:
                    # SQL:2016 preferment: everything still alive is
                    # higher-priority than any accept recorded so far,
                    # so a new accept overrides unconditionally — and
                    # the threads BELOW this accept are cut (their
                    # eventual matches rank under the recorded one).
                    best_end, best_node = j, node
                    del threads[idx + 1:]
                    break
        if best_end > pos:
            chars: list[str] = []
            node = best_node
            while node is not None:
                chars.append(node[0])
                node = node[1]
            codes = "".join(reversed(chars))
            spans.append((pos, best_end, codes))
            pos = _skip_resume(skip, pos, best_end, codes)
        else:
            pos += 1
        if anchor_start:
            break  # only the partition's first row can start a match
    return spans


_MEASURE_FORMS = re.compile(
    r"^(?:(?P<mn>MATCH_NUMBER\(\))"
    r"|(?P<clf>CLASSIFIER\(\))"
    r"|COUNT\(\s*(?:\*|(?P<csym>\w+)\.\*"
    r"|(?:(?P<ccsym>\w+)\.)?(?P<cccol>\w+))\s*\)"
    r"|(?P<agg>SUM|AVG|MIN|MAX|STDDEV_SAMP|STDDEV_POP|STDDEV"
    r"|VAR_SAMP|VAR_POP|VARIANCE)\(\s*(?:(?P<gsym>\w+)\.)?(?P<gcol>\w+)\s*\)"
    r"|(?P<pn>PREV|NEXT)\(\s*"
    r"(?:(?P<pnfl>FIRST|LAST)\(\s*(?:(?P<pnflsym>\w+)\.)?(?P<pnflcol>\w+)"
    r"(?:\s*,\s*(?P<pnfloff>\d+))?\s*\)"
    r"|(?:(?P<pnsym>\w+)\.)?(?P<pncol>\w+))"
    r"(?:\s*,\s*(?P<pnoff>\d+))?\s*\)"
    r"|(?P<fl>FIRST|LAST)\(\s*(?:(?P<sym>\w+)\.)?(?P<col>\w+)"
    r"(?:\s*,\s*(?P<floff>\d+))?\s*\))$",
    re.IGNORECASE,
)

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


_SEMANTICS_PREFIX = re.compile(r"^(RUNNING|FINAL)\s+", re.IGNORECASE)


class _Measure(NamedTuple):
    alias: str
    ev: object  # (span_pdf, span_codes, match_no) -> scalar
    ty: object  # (input schema) -> Spark DataType
    running: bool  # explicit RUNNING prefix
    is_clf: bool  # CLASSIFIER() measure
    explicit_final: bool  # explicit FINAL prefix
    prefix_inv: bool = False  # prefix-invariant (MATCH_NUMBER())
    # O(span) cumulative RUNNING evaluator: (span_pdf, span_codes,
    # match_no) -> list of len(span) prefix values, bit-identical to
    # calling ev on every prefix (VERDICT r10 "What's wrong" #3: the
    # per-prefix loop is O(span^2) per measure — fine for funnels, a
    # scale killer when a greedy B* makes span ~ partition size).
    # None -> the per-prefix fallback (property-tested equal).
    run_ev: object = None


def _parse_measure(
    expr: str, alias: str, sym_chars: dict[str, str], part_ctx=None
):
    """Compile one measure into a _Measure. The evaluator gets
    (span_pdf, span_codes, match_no). Under ALL ROWS PER MATCH the
    SQL:2016 default applies: an UNPREFIXED (or RUNNING) measure is
    re-evaluated over each row's PREFIX of the match, bare CLASSIFIER()
    is the per-row symbol, and only an explicit FINAL prefix yields the
    whole-match constant (FINAL CLASSIFIER() is the last-row symbol).
    MATCH_NUMBER() is prefix-invariant and skips the per-prefix loop.
    Under ONE ROW PER MATCH running and final coincide. Besides the
    atomic forms, NUMERIC arithmetic over them is supported
    (Oracle/Flink parity): e.g. `LAST(value) - FIRST(value)`,
    `SUM(A.price) / COUNT(A.*)`, `100 * AVG(x)` — see
    :func:`_compile_arith_measure` for the semantics.

    ``part_ctx`` is the partition-context holder ({"pdf": sorted
    partition frame, "lo": current span start}) that run() keeps
    current; PREV/NEXT measures read it because physical navigation can
    reach rows OUTSIDE the match (SQL:2016: navigation in MEASURES is
    over the row pattern partition, positioned at the last row of the
    match — FINAL — or of the current prefix — RUNNING)."""
    expr = expr.strip()
    pm = _SEMANTICS_PREFIX.match(expr)
    running = explicit_final = False
    if pm:
        running = pm.group(1).upper() == "RUNNING"
        explicit_final = not running
        expr = expr[pm.end():].strip()
    quad = _compile_single(expr, sym_chars, part_ctx)
    if quad is None:
        quad = _compile_arith_measure(expr, sym_chars, part_ctx)
    if quad is None:
        raise ValueError(
            f"MATCH_RECOGNIZE: unsupported measure {expr!r} (supported: "
            f"MATCH_NUMBER(), CLASSIFIER(), COUNT(*), COUNT(S.*), "
            f"COUNT([S.]col), "
            f"FIRST/LAST(col [, n]), FIRST/LAST(S.col [, n]), "
            f"PREV/NEXT(col [, n]), PREV/NEXT(S.col [, n]), "
            f"PREV/NEXT(FIRST/LAST([S.]col [, m]) [, n]), "
            f"SUM/AVG/MIN/MAX/STDDEV[_SAMP|_POP]/VARIANCE/VAR_SAMP/VAR_POP(col), "
            f"SUM/AVG/MIN/MAX(S.col), and numeric + - * / % arithmetic "
            f"over those forms and literals)"
        )
    ev, ty, is_clf, prefix_inv, run_ev = quad
    return _Measure(
        alias, ev, ty, running, is_clf, explicit_final, prefix_inv, run_ev
    )


def _compile_single(expr: str, sym_chars: dict[str, str], part_ctx=None):
    """Compile ONE atomic measure form; returns (ev, ty, is_clf,
    prefix_inv, run_ev) or None when the text is not an atomic form
    (semantic errors inside a recognized form still raise loudly).
    run_ev is the O(span) cumulative RUNNING evaluator (None only for
    CLASSIFIER(), which the ALL ROWS branch handles per-row itself)."""

    def mk(ev, ty, is_clf=False, prefix_inv=False, run_ev=None):
        return (ev, ty, is_clf, prefix_inv, run_ev)

    m = _MEASURE_FORMS.match(expr)
    if not m:
        return None
    if m.group("mn"):
        return mk(
            lambda pdf, codes, n: n,
            lambda sch: T.LongType(),
            prefix_inv=True,
            run_ev=lambda pdf, codes, n: [n] * len(pdf),
        )
    if m.group("clf"):
        # ONE ROW PER MATCH: classifier of the match's LAST row (final
        # semantics); ALL ROWS PER MATCH overrides this per-row in run().
        # Union (SUBSET) names never classify rows: keep the FIRST name
        # per char (pattern symbols precede unions in measure_syms), so
        # a single-member union can never shadow its symbol.
        names_by_char: dict[str, str] = {}
        for s_, c_ in sym_chars.items():
            if len(c_) == 1:
                names_by_char.setdefault(c_, s_)
        return mk(
            lambda pdf, codes, n, _m=names_by_char: _m.get(codes[-1]),
            lambda sch: T.StringType(),
            is_clf=True,
        )
    if m.group("agg"):
        # FINAL aggregate over the match's rows (optionally restricted to
        # one symbol's rows), NULL-skipping like SQL aggregates; SUM/AVG/
        # MIN/MAX over zero eligible rows is NULL
        agg = m.group("agg").upper()
        sym, col = m.group("gsym"), m.group("gcol")
        if sym is not None and sym not in sym_chars:
            raise ValueError(f"MATCH_RECOGNIZE: {agg} over unknown symbol {sym!r}")
        ch = sym_chars.get(sym) if sym else None

        sample = agg in ("STDDEV", "STDDEV_SAMP", "VARIANCE", "VAR_SAMP")
        want_std = agg.startswith("STDDEV")
        is_var = agg.startswith(("STDDEV", "VAR"))

        def _welford(vals, _sample=sample, _std=want_std):
            # sequential Welford — the cumulative RUNNING evaluator
            # accumulates with the identical recurrence, so per-prefix
            # and cumulative evaluation stay bit-identical (the repo's
            # measure discipline); sample variance needs >= 2 rows
            import math

            cnt, mean, m2 = 0, 0.0, 0.0
            for v in vals:
                v = float(v)
                cnt += 1
                d = v - mean
                mean += d / cnt
                m2 += d * (v - mean)
            if cnt < (2 if _sample else 1):
                return None
            var = m2 / (cnt - 1) if _sample else m2 / cnt
            return math.sqrt(var) if _std else var

        def ev_agg(pdf, codes, n, _ch=ch, _col=col, _agg=agg):
            rows = pdf if _ch is None else pdf[[c in _ch for c in codes]]
            vals = rows[_col].dropna()
            if is_var:
                return _welford(vals)
            if len(vals) == 0:
                return None
            if _agg in ("SUM", "AVG"):
                # sequential left fold, NOT pandas' pairwise .sum(): the
                # O(span) cumulative RUNNING evaluator below accumulates
                # sequentially, and per-prefix vs cumulative must be
                # bit-identical for floats (property-tested)
                total = None
                for v in vals:
                    total = v if total is None else total + v
                return float(total / len(vals)) if _agg == "AVG" else total
            return vals.min() if _agg == "MIN" else vals.max()

        def run_agg(pdf, codes, n, _ch=ch, _col=col, _agg=agg):
            import math

            import pandas as pd

            if is_var:
                # running Welford: identical recurrence to _welford, so
                # the final prefix equals the whole-match value bit-wise
                out, cnt, mean, m2 = [], 0, 0.0, 0.0
                min_cnt = 2 if sample else 1
                for i, v in enumerate(pdf[_col]):
                    if (_ch is None or codes[i] in _ch) and not pd.isna(v):
                        v = float(v)
                        cnt += 1
                        d = v - mean
                        mean += d / cnt
                        m2 += d * (v - mean)
                    if cnt < min_cnt:
                        out.append(None)
                    else:
                        var = m2 / (cnt - 1) if sample else m2 / cnt
                        out.append(math.sqrt(var) if want_std else var)
                return out
            out, total, cnt = [], None, 0
            for i, v in enumerate(pdf[_col]):
                if (_ch is None or codes[i] in _ch) and not pd.isna(v):
                    cnt += 1
                    if _agg in ("SUM", "AVG"):
                        total = v if total is None else total + v
                    elif _agg == "MIN":
                        total = v if total is None or v < total else total
                    else:
                        total = v if total is None or v > total else total
                if total is None:
                    out.append(None)
                elif _agg == "AVG":
                    out.append(float(total / cnt))
                else:
                    out.append(total)
            return out

        def ty_agg(sch, _col=col, _agg=agg):
            dt = sch[_col].dataType
            if _agg == "AVG" or is_var:
                return T.DoubleType()
            if _agg == "SUM":
                # Spark's sum widening for the common cases; decimals
                # keep their input type (documented narrow scope)
                if isinstance(dt, _INTEGRAL):
                    return T.LongType()
                if isinstance(dt, (T.FloatType, T.DoubleType)):
                    return T.DoubleType()
            return dt

        return mk(ev_agg, ty_agg, run_ev=run_agg)
    if m.group("csym") is not None or expr.strip().upper().startswith("COUNT"):
        sym = m.group("csym")
        if m.group("cccol") is not None:
            # SQL:2016 COUNT(col) / COUNT(S.col): NON-NULL count of the
            # column over the match's (or symbol's) rows — the SQL
            # aggregate semantics, unlike COUNT(*)'s row count
            csym2, ccol = m.group("ccsym"), m.group("cccol")
            if csym2 is not None and csym2 not in sym_chars:
                raise ValueError(
                    f"MATCH_RECOGNIZE: COUNT over unknown symbol {csym2!r}"
                )
            cch = sym_chars.get(csym2) if csym2 else None

            def ev_ccol(pdf, codes, n, _ch=cch, _col=ccol):
                rows = (
                    pdf if _ch is None else pdf[[c in _ch for c in codes]]
                )
                return int(rows[_col].count())

            def run_ccol(pdf, codes, n, _ch=cch, _col=ccol):
                import pandas as pd

                out, c = [], 0
                for i, v in enumerate(pdf[_col]):
                    if (_ch is None or codes[i] in _ch) and not pd.isna(v):
                        c += 1
                    out.append(c)
                return out

            return mk(
                ev_ccol, lambda sch: T.LongType(), run_ev=run_ccol
            )
        if sym is None:
            return mk(
                lambda pdf, codes, n: len(pdf),
                lambda sch: T.LongType(),
                run_ev=lambda pdf, codes, n: list(range(1, len(pdf) + 1)),
            )
        if sym not in sym_chars:
            raise ValueError(f"MATCH_RECOGNIZE: COUNT over unknown symbol {sym!r}")
        ch = sym_chars[sym]

        def run_count(pdf, codes, n, _ch=ch):
            out, c = [], 0
            for ci in codes:
                if ci in _ch:
                    c += 1
                out.append(c)
            return out

        return mk(
            lambda pdf, codes, n: sum(1 for c in codes if c in ch),
            lambda sch: T.LongType(),
            run_ev=run_count,
        )
    if m.group("pn"):
        # PREV/NEXT in MEASURES (SQL:2016 / Oracle): PHYSICAL navigation
        # over the row pattern PARTITION — the target row may lie
        # outside the match. The inner anchor is the last row of the
        # evaluation prefix (bare col; under FINAL that is the match's
        # last row, under RUNNING the current row), the last row mapped
        # to SYM (SYM.col), or a nested FIRST/LAST logical position;
        # the physical offset then walks the partition, and the value
        # is read from the FULL partition frame via part_ctx.
        is_prev = m.group("pn").upper() == "PREV"
        off = int(m.group("pnoff")) if m.group("pnoff") else 1
        nfl = m.group("pnfl")
        if nfl is not None:
            in_first = nfl.upper() == "FIRST"
            in_sym = m.group("pnflsym")
            col = m.group("pnflcol")
            in_off = int(m.group("pnfloff")) if m.group("pnfloff") else 0
        else:
            in_first = False  # bare/SYM form anchors at the LAST position
            in_sym = m.group("pnsym")
            col = m.group("pncol")
            in_off = 0
        if in_sym is not None and in_sym not in sym_chars:
            raise ValueError(
                f"MATCH_RECOGNIZE: {m.group('pn').upper()} over unknown "
                f"symbol {in_sym!r}"
            )
        in_ch = sym_chars.get(in_sym) if in_sym else None
        bare = nfl is None and in_sym is None
        if part_ctx is None:
            raise ValueError(
                "MATCH_RECOGNIZE: PREV/NEXT measures need the partition "
                "context (internal: _parse_measure called without "
                "part_ctx)"
            )

        def _pn_value(anchor_abs, _col=col, _prev=is_prev, _off=off):
            import pandas as pd

            full = part_ctx["pdf"]
            if anchor_abs is None:
                return None
            tgt = anchor_abs - _off if _prev else anchor_abs + _off
            if not 0 <= tgt < len(full):
                return None
            val = full[_col].iloc[tgt]
            return None if pd.isna(val) else val

        def ev_pn(
            pdf, codes, n, _bare=bare, _ch=in_ch, _in_first=in_first,
            _in_off=in_off,
        ):
            L = len(pdf)
            if L == 0:
                return None
            lo = part_ctx["lo"]
            if _bare:
                return _pn_value(lo + L - 1)
            idxs = (
                list(range(L))
                if _ch is None
                else [i for i in range(L) if codes[i] in _ch]
            )
            if len(idxs) <= _in_off:
                return None
            pos = idxs[_in_off] if _in_first else idxs[-1 - _in_off]
            return _pn_value(lo + pos)

        def run_pn(
            pdf, codes, n, _bare=bare, _ch=in_ch, _in_first=in_first,
            _in_off=in_off,
        ):
            lo = part_ctx["lo"]
            out, idxs = [], []
            for i in range(len(pdf)):
                if _bare:
                    out.append(_pn_value(lo + i))
                    continue
                if _ch is None or codes[i] in _ch:
                    idxs.append(i)
                if len(idxs) <= _in_off:
                    out.append(None)
                else:
                    pos = idxs[_in_off] if _in_first else idxs[-1 - _in_off]
                    out.append(_pn_value(lo + pos))
            return out

        return mk(
            ev_pn,
            lambda sch, _col=col: sch[_col].dataType,
            run_ev=run_pn,
        )
    first = m.group("fl").upper() == "FIRST"
    sym, col = m.group("sym"), m.group("col")
    if sym is not None and sym not in sym_chars:
        raise ValueError(f"MATCH_RECOGNIZE: measure over unknown symbol {sym!r}")
    ch = sym_chars.get(sym) if sym else None
    # SQL:2016 logical offset: FIRST(col, n) is the (n+1)-th eligible
    # row, LAST(col, n) the (n+1)-th from the end; NULL when the match
    # (or the symbol's rows) has fewer than n+1 rows
    off = int(m.group("floff")) if m.group("floff") else 0

    def ev(pdf, codes, n, _ch=ch, _col=col, _first=first, _off=off):
        import pandas as pd

        rows = (
            pdf
            if _ch is None
            else pdf[[c in _ch for c in codes]]
        )
        if len(rows) <= _off:
            return None
        val = rows[_col].iloc[_off if _first else -1 - _off]
        # a NULL cell must come back as SQL NULL, not the container's
        # missing sentinel (float NaN / pandas NA / NaT) — those leak
        # into arithmetic as NaN and into Arrow as a non-null cell
        return None if pd.isna(val) else val

    def ty(sch, _col=col):
        return sch[_col].dataType

    def run_fl(pdf, codes, n, _ch=ch, _col=col, _first=first, _off=off):
        import pandas as pd

        eligible, out = [], []
        for i, v in enumerate(pdf[_col]):
            if _ch is None or codes[i] in _ch:
                eligible.append(v)
            if len(eligible) <= _off:
                out.append(None)
            else:
                val = eligible[_off] if _first else eligible[-1 - _off]
                out.append(None if pd.isna(val) else val)
        return out

    return mk(ev, ty, run_ev=run_fl)


_MEXPR_ATOM = re.compile(
    r"MATCH_NUMBER\s*\(\s*\)"
    # PREV/NEXT first (allows ONE nested FIRST/LAST inside)
    r"|(?:PREV|NEXT)\s*\(\s*(?:(?:FIRST|LAST)\s*\(\s*[^()]*\s*\)"
    r"(?:\s*,\s*\d+)?|[^()]*)\s*\)"
    r"|(?:COUNT|SUM|AVG|MIN|MAX|FIRST|LAST|STDDEV_SAMP|STDDEV_POP"
    r"|STDDEV|VAR_SAMP|VAR_POP|VARIANCE)\s*\(\s*[^()]*\s*\)",
    re.IGNORECASE,
)
_MEXPR_NUM = re.compile(r"\d+(?:\.\d+)?")


def _compile_arith_measure(
    expr: str, sym_chars: dict[str, str], part_ctx=None
):
    """Compile a NUMERIC arithmetic combination of atomic measures and
    literals — `LAST(value) - FIRST(value)`, `SUM(A.price) /
    COUNT(A.*)`, `-2 * (AVG(x) + 1)` — the measure-expression subset
    Oracle/Flink users lean on most. Semantics match the engine's SQL
    surface: NULL propagates through every operator, `/` always yields
    DOUBLE and is NULL on a zero divisor, `%` is truncated (C-style)
    modulo and NULL on zero, integer-only `+ - * %` stays BIGINT.
    Operands must be numeric (a timestamp FIRST/LAST in arithmetic
    raises — interval arithmetic is out of scope, compute it on the
    output columns instead). Returns (ev, ty, False, prefix_inv,
    run_ev) or None when the text is not an arithmetic measure; the
    whole expression is prefix-invariant only when every atom is, so
    RUNNING re-evaluation under ALL ROWS sees running aggregates
    inside the arithmetic, per the standard."""
    masked = _mask_literals(expr)
    tokens: list[tuple[str, object]] = []
    i = 0
    while i < len(masked):
        if masked[i].isspace():
            i += 1
            continue
        am = _MEXPR_ATOM.match(masked, i)
        if am:
            quad = _compile_single(
                expr[i : am.end()].strip(), sym_chars, part_ctx
            )
            if quad is None:
                return None  # e.g. COUNT(a, b) — not a measure form
            tokens.append(("atom", quad))
            i = am.end()
            continue
        nm = _MEXPR_NUM.match(masked, i)
        if nm:
            txt = nm.group(0)
            val = float(txt) if "." in txt else int(txt)
            tokens.append(
                ("atom", (lambda pdf, codes, n, _v=val: _v,
                          lambda sch, _f=isinstance(val, float): (
                              T.DoubleType() if _f else T.LongType()
                          ),
                          False, True,
                          lambda pdf, codes, n, _v=val: [_v] * len(pdf)))
            )
            i = nm.end()
            continue
        if masked[i] in "+-*/%()":
            tokens.append((masked[i], None))
            i += 1
            continue
        return None  # anything else: not an arithmetic measure
    ops = {t for t, _ in tokens if t in "+-*/%"}
    if not ops or not any(t == "atom" for t, _ in tokens):
        return None  # a lone atom/number is _compile_single's business

    def type_kind(dt):
        if isinstance(dt, _INTEGRAL):
            return "i"
        if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
            return "f"
        raise ValueError(
            f"MATCH_RECOGNIZE: arithmetic measure over non-numeric type "
            f"{dt.simpleString()} in {expr!r} (numeric operands only)"
        )

    def _int_like(x):
        import numpy as np

        return isinstance(x, (int, np.integer)) and not isinstance(x, bool)

    def _scalar_op(a, b, op):
        if a is None or b is None:
            return None
        if op == "/":
            return float(a) / float(b) if b else None
        if _int_like(a) and _int_like(b):
            a, b = int(a), int(b)
        else:
            a, b = float(a), float(b)
        if op == "+":
            return a + b
        if op == "-":
            return a - b
        if op == "*":
            return a * b
        # truncated modulo, NULL on zero divisor (mr_expr parity)
        if b == 0:
            return None
        r = abs(a) % abs(b)
        return r if a >= 0 else -r

    def combine(ea, ta, ra, eb, tb, rb, op):
        def ty(sch, _ta=ta, _tb=tb, _op=op):
            ka, kb = type_kind(_ta(sch)), type_kind(_tb(sch))
            if _op == "/" or "f" in (ka, kb):
                return T.DoubleType()
            return T.LongType()

        def ev(pdf, codes, n, _ea=ea, _eb=eb, _op=op):
            return _scalar_op(_ea(pdf, codes, n), _eb(pdf, codes, n), _op)

        run = None
        if ra is not None and rb is not None:
            # O(span) RUNNING composes elementwise: the same scalar op
            # over each operand's prefix-value lists
            def run(pdf, codes, n, _ra=ra, _rb=rb, _op=op):
                return [
                    _scalar_op(x, y, _op)
                    for x, y in zip(_ra(pdf, codes, n), _rb(pdf, codes, n))
                ]

        return ev, ty, run

    pos = 0

    def peek():
        return tokens[pos][0] if pos < len(tokens) else None

    def parse_factor():
        nonlocal pos
        t, payload = tokens[pos] if pos < len(tokens) else (None, None)
        if t == "+":  # unary plus: no-op (`+2 * SUM(x)` is valid SQL)
            pos += 1
            return parse_factor()
        if t == "-":
            pos += 1
            ev, ty, _, pinv, run = parse_factor()

            def neg(pdf, codes, n, _e=ev):
                v = _e(pdf, codes, n)
                return None if v is None else -v

            neg_run = None
            if run is not None:
                def neg_run(pdf, codes, n, _r=run):
                    return [
                        None if v is None else -v for v in _r(pdf, codes, n)
                    ]

            return neg, ty, False, pinv, neg_run
        if t == "(":
            pos += 1
            out = parse_expr()
            if peek() != ")":
                raise ValueError(
                    f"MATCH_RECOGNIZE: unbalanced parens in measure {expr!r}"
                )
            pos += 1
            return out
        if t == "atom":
            pos += 1
            ev, ty, is_clf, pinv, run = payload
            if is_clf:
                raise ValueError(
                    "MATCH_RECOGNIZE: CLASSIFIER() cannot appear in "
                    "arithmetic measures"
                )
            return ev, ty, False, pinv, run
        raise ValueError(
            f"MATCH_RECOGNIZE: cannot parse measure expression {expr!r}"
        )

    def parse_term():
        nonlocal pos
        ev, ty, _, pinv, run = parse_factor()
        while peek() in ("*", "/", "%"):
            op = peek()
            pos += 1
            ev2, ty2, _, pinv2, run2 = parse_factor()
            ev, ty, run = combine(ev, ty, run, ev2, ty2, run2, op)
            pinv = pinv and pinv2
        return ev, ty, False, pinv, run

    def parse_expr():
        nonlocal pos
        ev, ty, _, pinv, run = parse_term()
        while peek() in ("+", "-"):
            op = peek()
            pos += 1
            ev2, ty2, _, pinv2, run2 = parse_term()
            ev, ty, run = combine(ev, ty, run, ev2, ty2, run2, op)
            pinv = pinv and pinv2
        return ev, ty, False, pinv, run

    out = parse_expr()
    if pos != len(tokens):
        raise ValueError(
            f"MATCH_RECOGNIZE: trailing tokens in measure expression "
            f"{expr!r}"
        )
    return out


_PERMUTE_KW = re.compile(r"\bPERMUTE\s*\(", re.IGNORECASE)


def _expand_permute(pattern: str) -> str:
    """Expand SQL:2016 ``PERMUTE(...)`` into the alternation of all
    orderings — lexicographic by argument position, the standard's
    preference order, which under this scanner's leftmost-longest
    discipline only matters for equal-length alternatives anyway.
    Arguments may be QUANTIFIED or GROUPED sub-patterns
    (``PERMUTE(A+, B)``, ``PERMUTE((A B)?, C)``) and PERMUTE may nest —
    each argument is parenthesized in the expansion so alternation
    precedence is preserved. Bounded at 6 elements (720 branches)."""
    import itertools

    while True:
        m = _PERMUTE_KW.search(pattern)
        if m is None:
            if re.search(r"\bPERMUTE\b", pattern, re.IGNORECASE):
                # a bare PERMUTE word (no parenthesis — e.g. the typo
                # `A PERMUTE B`) would otherwise become an always-true
                # pattern SYMBOL and silently match wrong rows
                raise ValueError(
                    f"MATCH_RECOGNIZE: malformed PERMUTE in {pattern!r} — "
                    f"expected PERMUTE(arg, ...)"
                )
            return pattern
        depth, i = 1, m.end()
        while i < len(pattern) and depth:
            if pattern[i] == "(":
                depth += 1
            elif pattern[i] == ")":
                depth -= 1
            i += 1
        if depth:
            raise ValueError(
                f"MATCH_RECOGNIZE: unbalanced PERMUTE( in {pattern!r}"
            )
        body = pattern[m.end() : i - 1]
        if _PERMUTE_KW.search(body):
            body = _expand_permute(body)  # innermost-first for nesting
        parts = _split_top(body)
        if not parts:
            raise ValueError("MATCH_RECOGNIZE: empty PERMUTE()")
        if len(parts) > 6:
            raise ValueError(
                f"MATCH_RECOGNIZE: PERMUTE of {len(parts)} elements expands "
                f"to {len(parts)}! branches — 6 is the supported maximum"
            )
        expansion = (
            "("
            + "|".join(
                " ".join(f"({p})" for p in o)
                for o in itertools.permutations(parts)
            )
            + ")"
        )
        pattern = pattern[: m.start()] + expansion + pattern[i:]


def _extract_exclusions(pattern: str) -> tuple[str, frozenset[str]]:
    """SQL:2016 pattern exclusion ``{- ... -}``: rows matched by the
    excluded region still participate in matching and in measures, but
    are OMITTED from ALL ROWS PER MATCH output. This implementation
    supports whole-symbol exclusion — every symbol inside an exclusion
    must appear ONLY inside exclusions (the common spelling,
    ``A {- B+ -} C``); a symbol used both inside and outside would need
    per-region row tracking in the NFA and raises loudly instead.
    Returns ``(pattern_with_exclusions_as_groups, excluded_symbols)``;
    nesting and unbalanced markers raise."""
    clean: list[str] = []
    excluded: set[str] = set()
    outside: set[str] = set()
    i, n, depth = 0, len(pattern), 0
    while i < n:
        if pattern.startswith("{-", i):
            if depth:
                raise ValueError(
                    f"MATCH_RECOGNIZE: nested {{- -}} exclusions in "
                    f"{pattern!r}"
                )
            depth += 1
            clean.append("(")
            i += 2
        elif pattern.startswith("-}", i):
            if not depth:
                raise ValueError(
                    f"MATCH_RECOGNIZE: '-}}' without '{{-' in {pattern!r}"
                )
            depth -= 1
            clean.append(")")
            i += 2
        else:
            # symbols are identifiers ([A-Za-z_]\w*) — a bare \w+ here
            # would also swallow the digits of a bounded quantifier
            # (A{2} {- B -} C spuriously collected '2' as a symbol and
            # tripped the inside/outside check below)
            m = re.match(r"[A-Za-z_]\w*", pattern[i:])
            if m:
                (excluded if depth else outside).add(m.group(0))
                clean.append(m.group(0))
                i += m.end()
            else:
                clean.append(pattern[i])
                i += 1
    if depth:
        raise ValueError(
            f"MATCH_RECOGNIZE: '{{-' without '-}}' in {pattern!r}"
        )
    both = excluded & outside
    if both:
        raise ValueError(
            f"MATCH_RECOGNIZE: symbols {sorted(both)} appear both inside "
            f"and outside {{- -}} exclusions — only whole-symbol "
            f"exclusion is supported (use a distinct symbol name for the "
            f"excluded occurrence)"
        )
    return "".join(clean), frozenset(excluded)


def compile_symbols(
    pattern: str, define: dict[str, str]
) -> tuple[list[str], dict[str, str], _Nfa]:
    """Resolve PATTERN symbols to the single-char NFA alphabet (a-z then
    A-Z — letters only; indexing past 'z' into NFA metacharacters like
    '|' would silently change the pattern's meaning) and compile the
    NFA. PERMUTE(A, B, ...) expands to the alternation of all orderings
    first. Shared by the batch operator and the streaming twin."""
    alphabet = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    pattern = _expand_permute(pattern)
    # identifiers only ([A-Za-z_]\w*): a bare \w+ would collect the
    # digits of a bounded quantifier (A{2}) as phantom symbol names
    names = list(dict.fromkeys(re.findall(r"[A-Za-z_]\w*", pattern)))
    if not names:
        raise ValueError(f"MATCH_RECOGNIZE: empty PATTERN {pattern!r}")
    if len(names) > len(alphabet):
        raise ValueError(
            f"MATCH_RECOGNIZE: at most {len(alphabet)} distinct symbols "
            f"supported, PATTERN has {len(names)}"
        )
    for s in define:
        if s not in names:
            raise ValueError(f"MATCH_RECOGNIZE: DEFINE of unknown symbol {s!r}")
    sym_chars = {s: alphabet[i] for i, s in enumerate(names)}
    char_pattern = re.sub(
        r"[A-Za-z_]\w*", lambda m: sym_chars[m.group(0)], pattern
    ).replace(" ", "")
    # Loud rejection of the silent-wrong class: an unrecognized
    # metacharacter (SQL:2016 ^/$ anchors, character classes, '.')
    # used to compile to a LITERAL char transition that no classified
    # row can ever produce, so the pattern silently matched nothing.
    # (Reluctant quantifiers — *?, +?, ??, {n,m}? — were rejected here
    # until late r12; SQL:2016 preferment order makes them well-defined,
    # so compile_pattern now encodes them as inverted edge priority and
    # callers route such patterns through the priority scanners.)
    bad = sorted(set(re.sub(r"[A-Za-z0-9(){}|*+?,]", "", char_pattern)))
    if bad:
        raise ValueError(
            f"MATCH_RECOGNIZE: unsupported PATTERN metacharacters "
            f"{bad} in {pattern!r} (supported: symbols, ( ) | * + ?, "
            f"bounded quantifiers {{n}}/{{n,m}}, PERMUTE, {{- -}} "
            f"exclusions, and TOP-LEVEL ^/$ partition anchors in the "
            f"batch operator; nested anchors, character classes, and "
            f"streaming anchors are not)"
        )
    return names, sym_chars, compile_pattern(char_pattern)


_NAV = re.compile(r"\b(PREV|NEXT)\s*\(\s*(\w+)\s*(?:,\s*(\d+)\s*)?\)", re.I)

_ORDER_DIR = re.compile(r"^(.*?)\s+(ASC|DESC)$", re.IGNORECASE)


def _parse_order_keys(order_by: list[str]) -> tuple[list[str], list[bool]]:
    """Split ``col [ASC|DESC]`` order items into (columns, ascending
    flags) — the SQL spelling passes direction suffixes through and the
    operator API may too."""
    cols: list[str] = []
    asc: list[bool] = []
    for item in order_by:
        item = item.strip()
        m = _ORDER_DIR.match(item)
        if m:
            cols.append(m.group(1).strip())
            asc.append(m.group(2).upper() == "ASC")
        else:
            cols.append(item)
            asc.append(True)
    return cols, asc


def classify_symbols(
    df: DataFrame,
    names: list[str],
    sym_chars: dict[str, str],
    define: dict[str, str],
    partition_by: list[str] | None = None,
    order_by: list[str] | None = None,
    allow_navigation: bool = True,
) -> DataFrame:
    """Deterministic first-true classification: add ``__sym`` (one NFA
    alphabet char per row; the NUL sentinel for rows matching no
    symbol). DEFINEd symbols test first (in define order), undefined
    (always-true) symbols last, in pattern order.

    PREV(col[, n]) / NEXT(col[, n]) navigation in DEFINE is rewritten to
    lag/lead helper columns over the (partition, order) window BEFORE
    classification — physical-offset semantics (the previous/next ROW in
    the partition, regardless of which symbol it classified as). The
    window shares the downstream groupBy's partition key, so it rides
    the same exchange. ``allow_navigation=False`` rejects PREV/NEXT
    (the streaming twin: lag/lead need the whole ordered partition)."""
    define, nav_df, nav_names = _physical_nav_rewrite(
        df, define, partition_by, order_by, allow_navigation
    )
    clf = None
    for s in list(define) + [n for n in names if n not in define]:
        pred = F.expr(define[s]) if s in define else F.lit(True)
        clf = (
            F.when(pred, F.lit(sym_chars[s]))
            if clf is None
            else clf.when(pred, F.lit(sym_chars[s]))
        )
    return nav_df.withColumn("__sym", F.coalesce(clf, F.lit(_NO_SYM))).drop(
        *nav_names
    )


def _physical_nav_rewrite(
    df: DataFrame,
    define: dict[str, str],
    partition_by: list[str] | None,
    order_by: list[str] | None,
    allow_navigation: bool,
) -> tuple[dict[str, str], DataFrame, list[str]]:
    """Rewrite physical PREV(col[, n])/NEXT(col[, n]) atoms in DEFINE
    predicates to lag/lead helper columns; returns (rewritten define,
    df with helper columns attached, helper column names to drop)."""
    nav_cols: dict[str, Column] = {}

    def _rewrite_nav(pred_sql: str) -> str:
        def sub(m: re.Match) -> str:
            fn, col, off = m.group(1).upper(), m.group(2), int(m.group(3) or 1)
            if not allow_navigation:
                raise ValueError(
                    f"MATCH_RECOGNIZE: {fn}() navigation is not supported "
                    f"here (streaming DEFINE is row-local)"
                )
            if col not in df.columns:
                raise ValueError(
                    f"MATCH_RECOGNIZE: {fn}({col!r}) references an unknown "
                    f"column"
                )
            name = f"__nav_{fn.lower()}_{col}_{off}"
            if name not in nav_cols:
                ocols, oasc = _parse_order_keys(list(order_by or []))
                w = Window.partitionBy(*(partition_by or [])).orderBy(
                    *(
                        F.col(c).asc() if a else F.col(c).desc()
                        for c, a in zip(ocols, oasc)
                    )
                )
                nav_cols[name] = (
                    F.lag(col, off).over(w)
                    if fn == "PREV"
                    else F.lead(col, off).over(w)
                )
            return name

        return _NAV.sub(sub, pred_sql)

    define = {s: _rewrite_nav(p) for s, p in define.items()}
    nav_df = df
    for name, colexpr in nav_cols.items():
        nav_df = nav_df.withColumn(name, colexpr)
    return define, nav_df, list(nav_cols)


def build_classifier(test_order, flags, compiled, ctx, names_by_char=None):
    """Per-attempt first-true classifier over one ordered partition.

    ``test_order`` is [(kind, char)] in classification order — kind is
    'vec' (precomputed boolean list in ``flags``), 'rel' (compiled
    mr_expr closure in ``compiled``), or 'any' (undefined symbol,
    always true). The returned ``classify(j, pos, tent)`` mutates
    ``ctx`` and, on success, records ``j`` in ``tent`` under the chosen
    symbol (SQL:2016 running semantics: the row under test is
    tentatively mapped to the symbol being tried; a mapping left behind
    by an attempt the NFA then kills is never read again).

    AMBIGUITY IS A ROUTING SIGNAL (r12): the deterministic in-automaton
    scan cannot do SQL:2016 nondeterministic symbol assignment, so a
    row whose predicates make TWO OR MORE symbols true (undefined
    always-true symbols included) — BOTH of which the NFA could consume
    at the current match position (``consumable``) — raises
    :class:`InAutomatonAmbiguity`; the callers catch it and re-scan the
    partition with :func:`scan_rows_in_automaton_nd`, which resolves
    the assignment with per-thread tentative mappings in SQL:2016
    preferment order. The consumability gate keeps the classic Oracle
    start-symbol idiom on the cheap deterministic scan: ``PATTERN (S
    D+) DEFINE S AS TRUE, D AS price < PREV(price)`` has rows
    satisfying both S and D, but the pattern never admits both at once,
    so the assignment is forced at every row. Classification is
    CONSUMABILITY-FIRST (r12, fixing a first-true divergence the
    vectorized path never had): with exactly one consumable true
    symbol the SQL:2016 assignment is forced and DEFINE order is
    irrelevant — a row that satisfies a non-consumable symbol earlier
    in DEFINE order no longer ends an attempt a consumable symbol
    could extend. Mutually-exclusive DEFINEs (the common case)
    classify exactly as before, byte-identically."""
    import pandas as pd

    def classify(j, pos, tent, consumable=None):
        ctx.j, ctx.pos, ctx.tent = j, pos, tent
        first_true = None  # first truthy symbol, consumable or not
        chosen = None  # first truthy symbol the NFA can consume here
        for kind, ch in test_order:
            if kind == "any":
                truthy = True
            elif kind == "vec":
                v = flags[ch][j]
                truthy = v is not None and not pd.isna(v) and bool(v)
            else:
                lst = tent.setdefault(ch, [])
                lst.append(j)
                truthy = bool(compiled[ch](ctx))
                lst.pop()
            if truthy:
                if first_true is None:
                    first_true = ch
                if consumable is None or ch in consumable:
                    if chosen is not None:
                        nm = names_by_char or {}
                        raise InAutomatonAmbiguity(
                            "MATCH_RECOGNIZE: row satisfies multiple "
                            "DEFINEd symbols "
                            f"({nm.get(chosen, chosen)!r} and "
                            f"{nm.get(ch, ch)!r}) that the PATTERN could "
                            "both consume at this match position — "
                            "deterministic classification would diverge "
                            "from SQL:2016 nondeterministic symbol "
                            "assignment (callers fall back to the "
                            "per-thread nondeterministic scan)"
                        )
                    chosen = ch
        # the NFA-consumable true symbol wins (SQL:2016: the PATTERN
        # decides the assignment — with exactly one consumable true
        # symbol the choice is forced, classification order is
        # irrelevant); with no consumable true symbol, any true symbol
        # ends the attempt just the same, so return the first
        out = chosen if chosen is not None else first_true
        if out is not None:
            tent.setdefault(out, []).append(j)
        return out

    return classify


def scan_rows_in_automaton(
    nfa: _Nfa,
    classify,
    size: int,
    final: bool = True,
    skip=_SKIP_PAST,
    within=None,
    anchor_start: bool = False,
    anchor_end: bool = False,
    preferment: bool = False,
) -> tuple[list[tuple[int, int, str]], int | None]:
    """Greedy scan with PER-ATTEMPT classification (the in-automaton
    twin of :func:`find_match_spans`). Returns ``(spans, carry_start)``:
    spans are ``(lo, hi, codes)`` triples; with ``final=False`` (the
    streaming caller) a live in-flight attempt at end-of-input is NOT
    resolved — its start index comes back as ``carry_start`` so the
    caller can persist the suffix, exactly the StreamMatcher._scan
    contract. ``within=(tvals, dur)`` enforces the Flink-style
    match-duration bound: a row whose order-key value exceeds the
    attempt's first row by more than ``dur`` (or whose key is NULL)
    ends the attempt — the accepted prefix still emits.

    ``preferment=False`` (default) accepts the LONGEST extension of
    each attempt via the set-scan — correct for alternation-free
    patterns, where every greedy preference is "consume more".
    ``preferment=True`` (r12; set by callers when the user pattern
    carries ``|``) steps an ORDERED thread list instead: when the
    highest-priority thread accepts, lower-priority threads are cut and
    the match is recorded; a later accept from a surviving
    higher-priority thread overrides — SQL:2016 preferment, so
    ``A | A B`` over a row satisfying both stops at ``A``.
    Classification itself is path-independent (one symbol per row per
    attempt), so the two modes differ only in which accepted PREFIX of
    the attempt's code string wins."""
    start_closure = nfa.closure(frozenset([nfa.start]))
    start_threads = _ordered_closure(nfa, [nfa.start])
    closure_memo: dict[int, list[int]] = {}

    def closure_of(state: int) -> list[int]:
        got = closure_memo.get(state)
        if got is None:
            got = closure_memo[state] = _ordered_closure(nfa, [state])
        return got

    # consumable-char sets memoized by live-state set: an NFA visits few
    # distinct state sets, so the per-row ambiguity-gate cost collapses
    # to one dict hit instead of an O(states x edges) walk
    cons_memo: dict = {}

    def consumable_of(key, live) -> set[str] | None:
        got = cons_memo.get(key, False)
        if got is False:
            cs: set[str] | None = set()
            for s in live:
                for want, _to in nfa.trans.get(s, ()):
                    if want is None:
                        cs = None  # wildcard: everything consumable
                        break
                    cs.add(want)
                if cs is None:
                    break
            got = cons_memo[key] = cs
        return got

    spans: list[tuple[int, int, str]] = []
    pos = 0
    while pos < size:
        states = start_closure
        threads: list[int] = list(start_threads)
        tent: dict[str, list[int]] = {}
        codes: list[str] = []
        last_acc = -1
        j = pos
        while j < size:
            if within is not None and _within_breaks(within, j, pos):
                break
            # chars the NFA could consume from the current position —
            # the classifier's ambiguity check raises only when >=2
            # TRUE symbols are both in this set (first-true vs a
            # non-consumable symbol is not a divergence; see
            # build_classifier)
            if preferment:
                cons = consumable_of(tuple(threads), threads)
            else:
                cons = consumable_of(states, states)
            c = classify(j, pos, tent, cons)
            if c is None:
                break
            if preferment:
                new_threads: list[int] = []
                seen: set[int] = set()
                for st in threads:
                    for want, to in nfa.trans.get(st, ()):
                        if want is not None and want != c:
                            continue
                        for cl in closure_of(to):
                            if cl not in seen:
                                seen.add(cl)
                                new_threads.append(cl)
                if not new_threads:
                    break
                threads = new_threads
                codes.append(c)
                j += 1
                if not anchor_end or j == size:
                    for idx, st in enumerate(threads):
                        if st == nfa.accept:
                            last_acc = j
                            del threads[idx + 1:]
                            break
            else:
                nxt = nfa.step(states, c)
                if not nxt:
                    break
                codes.append(c)
                states = nxt
                j += 1
                if nfa.accept in states and (not anchor_end or j == size):
                    last_acc = j
        else:
            # attempt hit end-of-input with live states: in-flight only
            # if some live state can still consume a character
            live = threads if preferment else states
            if not final and any(nfa.trans[s] for s in live):
                return spans, pos
        if last_acc > pos:
            span_codes = "".join(codes[: last_acc - pos])
            spans.append((pos, last_acc, span_codes))
            pos = _skip_resume(skip, pos, last_acc, span_codes)
        else:
            pos += 1
        if anchor_start:
            break  # only the partition's first row can start a match
    return spans, None


def build_truth_nd(test_order, flags, compiled, cols, size):
    """Per-thread truth oracle for :func:`scan_rows_in_automaton_nd`:
    ``truth(j, pos, ch, tent)`` says whether row ``j`` of an attempt
    starting at ``pos`` can be consumed as symbol ``ch`` GIVEN the
    thread's own tentative mapping ``tent`` ({char: row-index sequence},
    WITHOUT ``j`` appended — the oracle appends it itself before
    evaluating a navigation predicate, per mr_expr's contract).
    Vectorized flags and undefined symbols ignore ``tent`` entirely, so
    only navigation predicates pay the per-thread evaluation."""
    import pandas as pd

    kind_by_char = {ch: kind for kind, ch in test_order}
    from blazingsql_spark.operators import mr_expr

    ctx = mr_expr.MatchCtx(cols, 0, 0, size, {})

    def truth(j, pos, ch, tent):
        kind = kind_by_char.get(ch)
        if kind == "any":
            return True
        if kind == "vec":
            v = flags[ch][j]
            return v is not None and not pd.isna(v) and bool(v)
        ctx.j, ctx.pos = j, pos
        ctx.tent = {**tent, ch: mr_expr.ImmutableRows(j, tent.get(ch))}
        return bool(compiled[ch](ctx))

    return truth


def scan_rows_in_automaton_nd(
    nfa: _Nfa,
    truth,
    size: int,
    final: bool = True,
    skip=_SKIP_PAST,
    within=None,
    anchor_start: bool = False,
    anchor_end: bool = False,
    max_threads: int = 256,
    names_by_char=None,
    read_chars: frozenset | None = None,
) -> tuple[list[tuple[int, int, str]], int | None]:
    """SQL:2016 NONDETERMINISTIC symbol assignment for the in-automaton
    (navigation-DEFINE) path — the per-thread twin of
    :func:`find_match_spans_nd`, closing the r11/r12 documented
    restriction that navigation DEFINEs required mutually-exclusive
    predicates. Each Pike-VM thread carries its OWN tentative mapping
    (copy-on-write dict of persistent O(1)-append row sequences —
    mr_expr.ImmutableRows), so a navigation predicate like
    ``C AS v > LAST(A.v)`` is evaluated against the rows THAT THREAD
    assigned to A — different assignment histories legitimately diverge,
    which is why threads here cannot be deduplicated by NFA state
    alone. They CAN be deduplicated by (state, the projection of the
    mapping onto ``read_chars``) — the symbol chars whose tentative
    rows some navigation predicate actually READS
    (mr_expr closure.used_sym_chars): histories agreeing there have
    identical futures, and first-wins keeps the preferment order. With
    no navigation reads (``read_chars=frozenset()``) this collapses to
    find_match_spans_nd's state-dedup exactly; ``read_chars=None``
    (unknown reads) disables cross-thread dedup entirely. Residual
    blowup — k symbols under a quantifier whose mappings ARE all read —
    is inherently exponential and bounded by ``max_threads``; exceeding
    it raises loudly (no row-pattern engine resolves that case without
    a bound). Preferment order is identical to find_match_spans_nd:
    threads are priority-ordered, the highest accept cuts everything
    below it, and a later accept from a surviving higher thread
    overrides.

    ``truth(j, pos, ch, tent)`` is :func:`build_truth_nd`'s oracle.
    Returns ``(spans, carry_start)`` with scan_rows_in_automaton's
    streaming contract: under ``final=False`` an attempt still alive at
    end-of-input comes back as ``carry_start`` (the attempt is replayed
    from its first row next micro-batch — per-thread state never needs
    to persist because the mapping is a pure function of the attempt's
    rows, which the carry keeps)."""
    from blazingsql_spark.operators.mr_expr import (
        ImmutableRows as _ImmutableRows,
    )

    start_list = _ordered_closure(nfa, [nfa.start])
    closure_memo: dict[int, list[int]] = {}

    def closure_of(state: int) -> list[int]:
        got = closure_memo.get(state)
        if got is None:
            got = closure_memo[state] = _ordered_closure(nfa, [state])
        return got

    read_order = tuple(sorted(read_chars)) if read_chars is not None else None

    spans: list[tuple[int, int, str]] = []
    empty_tent: dict = {}
    pos = 0
    while pos < size:
        # thread = (state, node, tent): node is the (char, parent)
        # assignment chain (codes reconstruction), tent the mapping the
        # navigation predicates read. All start threads share the empty
        # history.
        threads: list[tuple[int, tuple | None, dict]] = [
            (st, None, empty_tent) for st in start_list
        ]
        best_end, best_node = -1, None
        j = pos
        while j < size and threads:
            if within is not None and _within_breaks(within, j, pos):
                break
            new_threads: list[tuple[int, tuple | None, dict]] = []
            seen: set = set()
            for st, node, tent in threads:
                per_want: dict = {}
                for want, to in nfa.trans.get(st, ()):
                    ent = per_want.get(want, False)
                    if ent is False:
                        if want is not None and not truth(j, pos, want, tent):
                            per_want[want] = None
                            continue
                        if want is None:
                            ntent = tent
                            nnode = (".", node)
                        else:
                            # O(1) persistent append (a tuple concat
                            # would make one long attempt quadratic)
                            ntent = {
                                **tent,
                                want: _ImmutableRows(j, tent.get(want)),
                            }
                            nnode = (want, node)
                        # dedup key: full history when reads are
                        # unknown, else the read-projection — histories
                        # agreeing on every
                        # char a predicate reads share all futures.
                        # ImmutableRows compares by IDENTITY: shared
                        # lineage dedups (the common case — threads that
                        # diverged only on unread symbols), equal-content
                        # distinct-lineage under-merges, which is sound
                        # and cap-guarded
                        proj = (
                            id(nnode)
                            if read_order is None
                            else tuple(ntent.get(c) for c in read_order)
                        )
                        ent = per_want[want] = (nnode, ntent, proj)
                    elif ent is None:
                        continue
                    nnode, ntent, proj = ent
                    for cl in closure_of(to):
                        k = (cl, proj)
                        if k not in seen:
                            seen.add(k)
                            new_threads.append((cl, nnode, ntent))
            if len(new_threads) > max_threads:
                raise ValueError(
                    "MATCH_RECOGNIZE: nondeterministic symbol assignment "
                    f"over navigation DEFINEs exceeded {max_threads} "
                    "concurrent assignment histories at one row — the "
                    "PATTERN admits exponentially many mappings whose "
                    "navigation predicates all stay live (e.g. several "
                    "always-true symbols under a quantifier). Make the "
                    "DEFINE predicates more selective or mutually "
                    "exclusive"
                )
            threads = new_threads
            j += 1
            if threads and (not anchor_end or j == size):
                for idx, (st, node, _tent) in enumerate(threads):
                    if st == nfa.accept:
                        # preferment: record the highest-priority accept,
                        # cut everything below it; surviving higher
                        # threads may override later
                        best_end, best_node = j, node
                        del threads[idx + 1:]
                        break
        else:
            # attempt hit end-of-input with live threads: in-flight only
            # if some thread can still consume a character
            if (
                not final
                and threads
                and any(nfa.trans[st] for st, _n, _t in threads)
            ):
                return spans, pos
        if best_end > pos:
            chars: list[str] = []
            node = best_node
            while node is not None:
                chars.append(node[0])
                node = node[1]
            codes = "".join(reversed(chars))
            spans.append((pos, best_end, codes))
            pos = _skip_resume(skip, pos, best_end, codes)
        else:
            pos += 1
        if anchor_start:
            break  # only the partition's first row can start a match
    return spans, None


def _sort_partition(pdf, order_cols, order_asc):
    """Order one partition's rows by the ORDER BY keys — semantically
    ``pdf.sort_values(order_cols, ascending=order_asc, kind="mergesort",
    na_position="last")``, which is also the fallback. The fast path is
    ``np.lexsort`` (stable, like mergesort) on the key arrays directly:
    pandas' multi-key sort builds a Categorical per key per call, which
    profiling shows DOMINATES the whole scan worker on many-small-group
    inputs (1500 groups × ~70 rows: 1.6 s of 2.2 s total, vs 0.3 s for
    the NFA scan itself). Restricted to ALL-ASCENDING, null-free
    numeric/datetime/bool keys — so NaN/NaT placement (pandas puts them
    LAST; raw lexsort would put NaT first) and descending-negation
    overflow corners can never diverge; anything else takes the pandas
    path unchanged."""
    import numpy as np

    keys = []
    if all(order_asc):
        for c in order_cols:
            a = pdf[c].to_numpy()
            if a.dtype.kind in "mM":
                a = a.view("int64")
                if (a == np.iinfo(np.int64).min).any():  # NaT sentinel
                    keys = None
                    break
            elif a.dtype.kind == "f":
                if np.isnan(a).any():
                    keys = None
                    break
            elif a.dtype.kind not in "biu":
                keys = None  # strings/objects/nullable-ext: pandas path
                break
            keys.append(a)
    else:
        keys = None
    if keys is None:
        return pdf.sort_values(
            order_cols, ascending=order_asc, kind="mergesort"
        )
    # lexsort sorts by the LAST key first
    return pdf.take(np.lexsort(tuple(reversed(keys))))


def _parse_within(spec):
    """WITHIN budget: an interval string ("8 HOUR", "INTERVAL '30'
    MINUTE") -> pandas Timedelta for timestamp order keys, or a plain
    number for numeric order keys."""
    import pandas as pd

    from blazingsql_spark.operators.mr_expr import _UNITS

    if isinstance(spec, (int, float)) and not isinstance(spec, bool):
        return spec
    txt = str(spec).strip()
    m = re.match(
        r"^(?:INTERVAL\s+)?'?(\d+(?:\.\d+)?)'?\s+(\w+)$", txt, re.IGNORECASE
    )
    if m:
        unit = m.group(2).upper()
        base = unit[:-1] if unit.endswith("S") and unit not in _UNITS else unit
        if base in _UNITS:
            return pd.Timedelta(**{_UNITS[base]: float(m.group(1))})
    try:
        return float(txt)
    except ValueError:
        raise ValueError(
            f"MATCH_RECOGNIZE: unsupported WITHIN {spec!r} (use an "
            f"interval like \"8 HOUR\" / \"INTERVAL '30' MINUTE\" or a "
            f"plain number for numeric order keys)"
        ) from None


def match_recognize(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[str],
    measures: list[tuple[str, str]],
    pattern: str,
    define: dict[str, str] | None = None,
    all_rows: bool = False,
    unmatched: bool = False,
    after_match: str = "PAST LAST ROW",
    subset: dict[str, list[str]] | None = None,
    within: str | int | float | None = None,
    _force_in_automaton: bool = False,
) -> DataFrame:
    """Row-pattern matching (see module docstring for the supported
    surface). ``measures`` is [(expr, alias)]; ``define`` maps symbol ->
    Spark SQL boolean (ordered; symbols missing from it default to
    always-true and classify LAST). ``all_rows=False`` is ONE ROW PER
    MATCH (partition keys + measures); ``all_rows=True`` is ALL ROWS
    PER MATCH — every matched input row is emitted with its full
    original columns, unprefixed measures RUNNING per SQL:2016 (FINAL
    opts into the whole-match constant), and CLASSIFIER() per-row.
    ``{- ... -}`` exclusions in PATTERN omit the excluded region's rows
    from ALL ROWS output (matching and measures still see them;
    whole-symbol exclusions only — see :func:`_extract_exclusions`).
    ``unmatched=True`` is SQL:2016 ``ALL ROWS PER MATCH WITH UNMATCHED
    ROWS``: input rows belonging to NO match are emitted too, with
    every measure NULL — requires ``all_rows`` and is incompatible with
    exclusions (the standard's restriction: an excluded row is matched,
    so its omission would be indistinguishable from unmatched).

    ``subset`` declares SQL:2016 union pattern variables
    (``SUBSET W = (A, B)``): a union name ranges over every row its
    member symbols mapped, and works anywhere a symbol name does —
    MEASURES (COUNT(W.*), FIRST/LAST/SUM/AVG/MIN/MAX(W.col)), DEFINE
    navigation (FIRST(W.ts)), and AFTER MATCH SKIP TO FIRST/LAST W.
    Union names never classify rows (they are read-only views over the
    mapping).

    ``within`` bounds the match DURATION (the Flink extension): every
    row of a match must have its first ORDER BY key within ``within``
    of the attempt's first row — an interval string ('8 HOUR',
    "INTERVAL '30' MINUTE") against timestamp keys or a plain number
    against numeric keys. Enforced INSIDE the scan (a row beyond the
    budget ends the attempt; the accepted prefix still emits), so
    arbitrary vectorized Spark-SQL DEFINEs keep working — unlike
    rewriting the bound into each symbol's predicate, which would force
    every DEFINE into the restricted navigation grammar.

    ``after_match`` selects the SQL:2016 AFTER MATCH SKIP mode: 'PAST
    LAST ROW' (default, non-overlapping), 'TO NEXT ROW' (the scan
    resumes one row after the match START — overlapping matches), or
    'TO FIRST <sym>' / 'TO LAST <sym>' (resume AT the first/last row
    the match mapped to that symbol; the SQL:2016 runtime errors —
    symbol unmapped, or resume at the match's own first row — raise).

    DEFINEs with symbol-relative navigation (``PREV(A.price)``,
    ``FIRST(V.ts)``, bare ``A.price``) route through the in-automaton
    scan: classification happens per match ATTEMPT (running semantics),
    so a failed attempt restarts cleanly at the next row — worst case
    O(rows²) per partition on degenerate inputs, the same bound as any
    backtracking row-pattern scan; typical inputs stay O(rows) because
    attempts fail on their first row. ``_force_in_automaton`` is a test
    hook: it routes nav-free DEFINEs (which must then fit mr_expr's
    grammar) through the same scan to property-check the two paths
    agree."""
    import pandas as pd

    from blazingsql_spark.operators import mr_expr

    define = dict(define or {})
    # SQL:2016 {- ... -} exclusions: expand PERMUTE first (so excluded
    # PERMUTE arguments resolve to symbols), then strip the markers —
    # the excluded region still matches and feeds measures; its rows
    # are dropped from ALL ROWS output below (no-op under ONE ROW)
    pattern, anchor_start, anchor_end = _strip_anchors(pattern)
    # user-written alternation or a reluctant quantifier, detected
    # BEFORE PERMUTE expansion (PERMUTE's generated branches are
    # equal-length permutations, where preferment and longest
    # coincide): either forces the priority scanner even on
    # deterministic partitions — SQL:2016 preferment means `A | A B`
    # matches just A and `A+? B` stops at the first B, neither of which
    # the longest-discipline set-scan can express. The reluctant probe
    # tolerates whitespace (`A+ ?` ≡ `A+?` after compile_symbols strips
    # spaces).
    user_alt = "|" in pattern or bool(RELUCTANT_PROBE.search(pattern))
    pattern, excluded_syms = _extract_exclusions(_expand_permute(pattern))
    names, sym_chars, nfa = compile_symbols(pattern, define)
    excluded_chars = frozenset(
        sym_chars[s] for s in excluded_syms if s in sym_chars
    )
    if unmatched and not all_rows:
        raise ValueError(
            "MATCH_RECOGNIZE: WITH UNMATCHED ROWS requires ALL ROWS PER "
            "MATCH"
        )
    if unmatched and excluded_chars:
        raise ValueError(
            "MATCH_RECOGNIZE: {- -} exclusions cannot be combined with "
            "WITH UNMATCHED ROWS (SQL:2016 restriction — an excluded row "
            "is matched, so omitting it would be indistinguishable from "
            "an unmatched row)"
        )

    # SUBSET union variables: name -> concatenation of member chars.
    # measure_syms is the lookup every symbol-name surface (MEASURES,
    # DEFINE navigation, SKIP TO) resolves through.
    measure_syms = dict(sym_chars)
    for uname, members in (subset or {}).items():
        if uname in sym_chars:
            raise ValueError(
                f"MATCH_RECOGNIZE: SUBSET name {uname!r} collides with a "
                f"pattern symbol"
            )
        if not members:
            raise ValueError(f"MATCH_RECOGNIZE: SUBSET {uname!r} is empty")
        for m_ in members:
            if m_ not in sym_chars:
                raise ValueError(
                    f"MATCH_RECOGNIZE: SUBSET {uname!r} references unknown "
                    f"pattern symbol {m_!r}"
                )
        measure_syms[uname] = "".join(
            dict.fromkeys(sym_chars[m_] for m_ in members)
        )

    m_skip = re.match(
        r"^\s*(?:PAST\s+LAST\s+ROW|(?P<next>TO\s+NEXT\s+ROW)"
        r"|TO\s+(?P<fl>FIRST|LAST)\s+(?P<sym>\w+))\s*$",
        after_match,
        re.IGNORECASE,
    )
    if not m_skip:
        raise ValueError(
            f"MATCH_RECOGNIZE: unsupported AFTER MATCH SKIP {after_match!r} "
            f"(supported: PAST LAST ROW, TO NEXT ROW, TO FIRST <sym>, "
            f"TO LAST <sym>)"
        )
    if m_skip.group("fl"):
        sym = m_skip.group("sym")
        if sym not in measure_syms:
            raise ValueError(
                f"MATCH_RECOGNIZE: AFTER MATCH SKIP TO unknown symbol {sym!r}"
            )
        skip = (m_skip.group("fl").lower(), measure_syms[sym])
    elif m_skip.group("next"):
        skip = ("next",)
    else:
        skip = _SKIP_PAST

    symrel_preds = {
        s: p
        for s, p in define.items()
        if _force_in_automaton
        or mr_expr.is_symbol_relative(p, list(measure_syms))
    }
    order_cols, order_asc = _parse_order_keys(list(order_by))
    within_dur = _parse_within(within) if within is not None else None
    if within_dur is not None:
        import pandas as pd_

        if not order_asc[0]:
            raise ValueError(
                "MATCH_RECOGNIZE: WITHIN requires the first ORDER BY key "
                "ascending (a match duration against a descending key is "
                "ill-defined)"
            )
        key_t = df.schema[order_cols[0]].dataType
        is_time = isinstance(
            key_t, (T.TimestampType, T.TimestampNTZType, T.DateType)
        )
        if is_time != isinstance(within_dur, pd_.Timedelta):
            raise ValueError(
                f"MATCH_RECOGNIZE: WITHIN {within!r} does not fit the "
                f"first ORDER BY key {order_cols[0]!r} of type "
                f"{key_t.simpleString()} — use an INTERVAL for "
                f"timestamp/date keys and a plain number for numeric keys"
            )
    # WITHIN no longer forces the in-automaton path (r11): the duration
    # bound is enforced identically by all three scanners via
    # _within_breaks, so nav-free WITHIN queries keep the vectorized
    # classification (cheaper) AND get nondeterministic symbol
    # assignment consistently with their unbounded twins.
    route_auto = bool(symrel_preds)
    if route_auto:
        vec_define = {s: p for s, p in define.items() if s not in symrel_preds}
        vdef, nav_df, nav_names = _physical_nav_rewrite(
            df, vec_define, partition_by, order_by, allow_navigation=True
        )
        coded = nav_df
        flag_cols: dict[str, str] = {}
        for s, p in vdef.items():
            # keyed by symbol index, not char: Spark resolves columns
            # case-insensitively, so __p_a and __p_A would collide for
            # patterns with >26 distinct symbols
            cname = f"__p_{names.index(s)}"
            coded = coded.withColumn(cname, F.expr(p))
            flag_cols[sym_chars[s]] = cname
        coded = coded.drop(*nav_names)
        compiled: dict[str, object] = {}
        used_cols: set[str] = set()
        nav_read_chars: frozenset[str] = frozenset()
        for s, p in symrel_preds.items():
            closure, used = mr_expr.compile_predicate(
                p, df.columns, measure_syms
            )
            compiled[sym_chars[s]] = closure
            used_cols |= used
            nav_read_chars |= closure.used_sym_chars
        # classification order: DEFINEd symbols in define order, then
        # undefined (always-true) symbols in pattern order — identical
        # to classify_symbols' CASE
        test_order: list[tuple[str, str]] = []
        for s in list(define) + [n for n in names if n not in define]:
            ch = sym_chars[s]
            kind = (
                "rel" if s in symrel_preds else "vec" if s in define else "any"
            )
            test_order.append((kind, ch))
        aux_cols = list(flag_cols.values())
    else:
        # Vectorized path (no symbol-relative navigation, no WITHIN):
        # ONE codegen projection of per-symbol boolean flags (replacing
        # the pre-r11 single first-true CASE column). At scan time each
        # partition checks whether any row satisfies >1 symbol: if not
        # (the overwhelmingly common mutually-exclusive DEFINEs), codes
        # derive first-true and the deterministic set-scan runs exactly
        # as before; if so, the priority scanner resolves the SQL:2016
        # nondeterministic symbol assignment (the pre-r11 documented
        # restriction, now lifted on this path).
        vdef, nav_df, nav_names = _physical_nav_rewrite(
            df, dict(define), partition_by, order_by, allow_navigation=True
        )
        coded = nav_df
        flag_cols = {}
        for s, p in vdef.items():
            cname = f"__p_{names.index(s)}"
            coded = coded.withColumn(cname, F.expr(p))
            flag_cols[sym_chars[s]] = cname
        coded = coded.drop(*nav_names)
        test_order = [
            ("vec" if s in define else "any", sym_chars[s])
            for s in list(define) + [n for n in names if n not in define]
        ]
        aux_cols = list(flag_cols.values())

    # partition-context holder for PREV/NEXT measures (physical
    # navigation may leave the match): run() keeps pdf/lo current
    part_ctx: dict = {"pdf": None, "lo": 0}
    parsed = [
        _parse_measure(e, a, measure_syms, part_ctx) for e, a in measures
    ]
    in_schema = df.schema
    shadowed = set(in_schema.fieldNames()) if all_rows else set(partition_by)
    clashes = {m_.alias for m_ in parsed} & shadowed
    if clashes:
        raise ValueError(
            f"MATCH_RECOGNIZE: measure aliases shadow "
            f"{'input' if all_rows else 'partition'} columns: "
            f"{sorted(clashes)}"
        )
    if all_rows:
        out_schema = T.StructType(
            list(in_schema)
            + [T.StructField(m_.alias, m_.ty(in_schema)) for m_ in parsed]
        )
    else:
        out_schema = T.StructType(
            [in_schema[k] for k in partition_by]
            + [T.StructField(m_.alias, m_.ty(in_schema)) for m_ in parsed]
        )
    names_by_char = {c: s for s, c in sym_chars.items()}

    def scan_in_automaton(pdf) -> list[tuple[int, int, str]]:
        size = len(pdf)
        cols = {c: pdf[c].tolist() for c in used_cols}
        flags = {ch: pdf[cn].tolist() for ch, cn in flag_cols.items()}
        ctx = mr_expr.MatchCtx(cols, 0, 0, size, {})
        classify = build_classifier(
            test_order, flags, compiled, ctx, names_by_char
        )
        bound = (
            (pdf[order_cols[0]].tolist(), within_dur)
            if within_dur is not None
            else None
        )
        try:
            spans, _ = scan_rows_in_automaton(
                nfa, classify, size, final=True, skip=skip, within=bound,
                anchor_start=anchor_start, anchor_end=anchor_end,
                preferment=user_alt,
            )
        except InAutomatonAmbiguity:
            # a row satisfied >=2 consumable symbols: re-scan the whole
            # partition with per-thread tentative mappings — true
            # SQL:2016 nondeterministic assignment over navigation
            # DEFINEs (r12; unambiguous partitions never pay for this)
            truth = build_truth_nd(test_order, flags, compiled, cols, size)
            spans, _ = scan_rows_in_automaton_nd(
                nfa, truth, size, final=True, skip=skip, within=bound,
                anchor_start=anchor_start, anchor_end=anchor_end,
                names_by_char=names_by_char, read_chars=nav_read_chars,
            )
        return spans

    def run(key, pdf):
        import numpy as np

        pdf = _sort_partition(pdf, order_cols, order_asc)
        part_ctx["pdf"] = pdf
        if route_auto:
            spans = scan_in_automaton(pdf)
        else:
            size = len(pdf)
            bound = (
                (pdf[order_cols[0]].tolist(), within_dur)
                if within_dur is not None
                else None
            )
            flags = {
                ch: pdf[cn].fillna(False).to_numpy(dtype=bool)
                for ch, cn in flag_cols.items()
            }
            n_undef = sum(1 for kind, _ch in test_order if kind == "any")
            n_true = sum(flags.values()) + n_undef if flags else (
                np.full(size, n_undef)
            )
            if size and np.max(n_true, initial=0) > 1:
                # ambiguous partition: SQL:2016 nondeterministic symbol
                # assignment via the priority scanner
                def truth(j, ch, _f=flags):
                    arr = _f.get(ch)
                    return True if arr is None else bool(arr[j])

                spans = find_match_spans_nd(
                    nfa, truth, size, skip=skip, within=bound,
                    anchor_start=anchor_start, anchor_end=anchor_end,
                )
            else:
                # deterministic rows: first-true codes + the set-scan,
                # byte-identical to the pre-r11 single-CASE path.
                # Sentinel is '#', NOT _NO_SYM ("\x00"): numpy <U1
                # stores "\x00" as the EMPTY string, so join() would
                # drop those positions and shift every span index.
                # '#' is outside the letters-only symbol alphabet, so
                # like _NO_SYM it breaks any in-flight match.
                code_arr = np.full(size, "#", dtype="<U1")
                for _kind, ch in reversed(test_order):
                    arr = flags.get(ch)
                    if arr is None:
                        code_arr[:] = ch
                    else:
                        code_arr[arr] = ch
                codes = "".join(code_arr)
                if user_alt:
                    # user alternation: SQL:2016 preferment can pick a
                    # SHORTER branch (`A | A B` stops at A) — the
                    # longest-discipline set-scan cannot, so run the
                    # priority scanner over the deterministic codes
                    spans = find_match_spans_nd(
                        nfa,
                        lambda j, ch, _s=codes: _s[j] == ch,
                        size, skip=skip, within=bound,
                        anchor_start=anchor_start, anchor_end=anchor_end,
                    )
                else:
                    spans = [
                        (lo, hi, codes[lo:hi])
                        for lo, hi in find_match_spans(
                            nfa, codes, skip=skip, within=bound,
                            anchor_start=anchor_start, anchor_end=anchor_end,
                        )
                    ]
        if all_rows:
            frames = []
            for n, (lo, hi, scodes) in enumerate(spans, start=1):
                part_ctx["lo"] = lo
                span = pdf.iloc[lo:hi].drop(columns=aux_cols)
                for m_ in parsed:
                    a, ev = m_.alias, m_.ev
                    if m_.is_clf and not m_.explicit_final:
                        # bare (or RUNNING) CLASSIFIER(): per-row symbol;
                        # an explicit FINAL CLASSIFIER() falls through to
                        # the constant last-row evaluation
                        vals = [names_by_char.get(c) for c in scodes]
                    elif (
                        m_.running or not m_.explicit_final
                    ) and not m_.prefix_inv:
                        # RUNNING — the SQL:2016 DEFAULT for unprefixed
                        # measures under ALL ROWS PER MATCH. The compiled
                        # run_ev evaluates all prefixes in ONE O(span)
                        # pass (cumulative fold, bit-identical to the
                        # per-prefix loop by construction: the FINAL
                        # aggregate folds sequentially too); the per-
                        # prefix O(span²) loop stays as the fallback for
                        # any measure without one and as the property-
                        # test reference. Only an explicit FINAL (or a
                        # prefix-invariant MATCH_NUMBER()) takes the
                        # constant whole-match evaluation below.
                        if m_.run_ev is not None:
                            vals = m_.run_ev(pdf.iloc[lo:hi], scodes, n)
                        else:
                            vals = [
                                ev(
                                    pdf.iloc[lo : lo + i + 1],
                                    scodes[: i + 1],
                                    n,
                                )
                                for i in range(hi - lo)
                            ]
                    else:
                        vals = ev(pdf.iloc[lo:hi], scodes, n)
                    # object dtype like the ONE ROW branch: a None among
                    # numeric values must stay a NULL, not collapse the
                    # column to float64 (NaN semantics, int64 precision
                    # loss past 2^53, and pandas concat FutureWarnings
                    # against the all-NA unmatched frames)
                    col = vals if isinstance(vals, list) else [vals] * len(span)
                    span = span.assign(
                        **{a: pd.Series(col, dtype=object, index=span.index)}
                    )
                if excluded_chars:
                    # {- -}: excluded rows fed the match and the measures
                    # above; they just never reach the output
                    span = span[[c not in excluded_chars for c in scodes]]
                frames.append(span)
            if unmatched:
                # WITH UNMATCHED ROWS: rows in NO match come back with
                # every measure NULL (matched positions masked off; a
                # TO NEXT ROW overlap marks a row matched if ANY match
                # covered it)
                hit = [False] * len(pdf)
                for lo, hi, _ in spans:
                    for j in range(lo, hi):
                        hit[j] = True
                un = pdf.iloc[[j for j, h in enumerate(hit) if not h]].drop(
                    columns=aux_cols
                )
                if len(un):
                    frames.append(
                        un.assign(**{m_.alias: None for m_ in parsed})
                    )
            if not frames:
                # object-dtype empties: a zero-match partition must not
                # surface float64 columns Arrow cannot cast to the output
                # schema's timestamp/string measure types
                return pd.DataFrame(
                    {
                        c: pd.Series([], dtype=object)
                        for c in out_schema.fieldNames()
                    }
                )
            return pd.concat(frames)
        out = {c: [] for c in out_schema.fieldNames()}
        for n, (lo, hi, scodes) in enumerate(spans, start=1):
            part_ctx["lo"] = lo
            span = pdf.iloc[lo:hi]
            for k, v in zip(partition_by, key):
                out[k].append(v)
            # ONE ROW PER MATCH: running == final (last-row evaluation)
            for m_ in parsed:
                out[m_.alias].append(m_.ev(span, scodes, n))
        # object dtype throughout: values carry their own types (Arrow
        # casts per value), and zero-match groups stay castable to ANY
        # measure type instead of defaulting to float64
        return pd.DataFrame(
            {k: pd.Series(v, dtype=object) for k, v in out.items()}
        )

    # pin the exchange width: AQE's bytes-based coalescing would shrink
    # this shuffle to a couple of tasks on small-byte inputs, but the
    # downstream stage is a PYTHON scan whose cost is rows×pattern work,
    # not bytes — an explicit repartition-by-num carries a
    # REPARTITION_BY_NUM hint AQE respects, and groupBy reuses the hash
    # partitioning (no second exchange; plan-asserted)
    try:
        n_part = int(
            coded.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    except ValueError:  # e.g. 'auto' under AQE auto-optimized shuffle
        n_part = coded.sparkSession.sparkContext.defaultParallelism
    coded = coded.repartition(n_part, *partition_by)
    return coded.groupBy(*partition_by).applyInPandas(run, out_schema)


# ---------------------------------------------------------------------------
# SQL spelling: rewrite `<table> MATCH_RECOGNIZE ( ... ) [AS alias]` into a
# temp view produced by the operator, then hand the remaining SQL to Spark.
# ---------------------------------------------------------------------------

_MR_KW = re.compile(r"\bMATCH_RECOGNIZE\s*\(", re.IGNORECASE)
_CLAUSE = re.compile(
    r"PARTITION\s+BY\s+(?P<part>.+?)\s+"
    r"ORDER\s+BY\s+(?P<order>.+?)\s+"
    # MEASURES is optional per SQL:2016: without it ONE ROW PER MATCH
    # emits the partition keys only, ALL ROWS the original columns
    r"(?:MEASURES\s+(?P<meas>.+?)\s+)?"
    r"(?:(?P<rows>ONE\s+ROW|ALL\s+ROWS)\s+PER\s+MATCH"
    r"(?:\s+(?P<emis>WITH\s+UNMATCHED\s+ROWS|SHOW\s+EMPTY\s+MATCHES"
    r"|OMIT\s+EMPTY\s+MATCHES))?\s+)?"
    r"(?:AFTER\s+MATCH\s+SKIP\s+(?P<skip>PAST\s+LAST\s+ROW"
    r"|TO\s+NEXT\s+ROW|TO\s+(?:FIRST|LAST)\s+\w+)\s+)?"
    r"PATTERN\s*\(\s*(?P<pat>.+?)\s*\)"
    # matched against the MASKED body: a quoted magnitude ('8') has its
    # contents blanked, so accept '...' wholesale; _orig() recovers it
    r"(?:\s+WITHIN\s+(?P<win>(?:INTERVAL\s+)?(?:'[^']*'|[\d.]+)\s+\w+"
    r"|[\d.]+))?"
    r"(?:\s+SUBSET\s+(?P<sub>.+?))?"
    r"(?:\s+DEFINE\s+(?P<def>.+))?$",
    re.IGNORECASE | re.DOTALL,
)


def _mask_literals(s: str) -> str:
    """Same-length copy with the CONTENTS of SQL string literals
    ('single', with '' escapes, and "double") blanked to spaces, so
    positional regex/paren scans never trip on quoted text. Positions
    map 1:1 back to the original."""
    out = list(s)
    i, n = 0, len(s)
    while i < n:
        q = s[i]
        if q in ("'", '"'):
            j = i + 1
            while j < n:
                if s[j] == q:
                    if q == "'" and j + 1 < n and s[j + 1] == "'":
                        j += 2  # '' escape inside a single-quoted literal
                        continue
                    break
                j += 1
            for k in range(i + 1, min(j, n)):
                out[k] = " "
            i = j + 1
        else:
            i += 1
    return "".join(out)


def _split_top(s: str, sep: str = ",") -> list[str]:
    """Split on `sep` outside parentheses AND string literals."""
    masked = _mask_literals(s)
    out, depth, start = [], 0, 0
    for i, ch in enumerate(masked):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == sep and depth == 0:
            piece = s[start:i].strip()
            if piece:
                out.append(piece)
            start = i + 1
    tail = s[start:].strip()
    if tail:
        out.append(tail)
    return out


_SQL_FACTOR_KEYWORDS = frozenset(
    {
        "FROM", "JOIN", "ON", "WHERE", "AND", "OR", "SELECT", "UNION",
        "ALL", "CROSS", "INNER", "LEFT", "RIGHT", "FULL", "OUTER",
        "LATERAL", "USING", "EXCEPT", "INTERSECT", "BY", "AS",
    }
)


def _locate_factor(masked: str, query: str, kw_start: int):
    """Scan LEFT from a MATCH_RECOGNIZE keyword for its table factor.

    Accepts the standard shapes: a (possibly qualified) table/view name
    or a parenthesized derived table `(SELECT …)`, each optionally
    followed by `[AS] alias`. Returns ``(factor_start, source, alias)``
    where source is ``('table', name)`` or ``('subquery', sql_text)``
    and alias is the consumed alias or None — the rewriter re-emits it
    after the replacement view so outer `alias.col` references keep
    binding."""

    def skip_ws(p: int) -> int:
        while p > 0 and masked[p - 1].isspace():
            p -= 1
        return p

    def read_ident(p: int) -> tuple[int, str]:
        q = p
        while q > 0 and (masked[q - 1].isalnum() or masked[q - 1] in "_."):
            q -= 1
        return q, masked[q:p]

    def scan_subquery(close: int, alias):
        depth, q = 1, close - 1
        while q >= 0 and depth:
            if masked[q] == ")":
                depth += 1
            elif masked[q] == "(":
                depth -= 1
            q -= 1
        if depth:
            raise ValueError(
                "MATCH_RECOGNIZE: unbalanced parentheses in the derived-"
                "table factor before the clause"
            )
        open_ = q + 1
        inner = query[open_ + 1 : close].strip()
        if not inner:
            raise ValueError(
                "MATCH_RECOGNIZE: empty derived-table factor before the "
                "clause"
            )
        return open_, ("subquery", inner), alias

    p = skip_ws(kw_start)
    if p > 0 and masked[p - 1] == ")":
        return scan_subquery(p - 1, None)
    q, ident = read_ident(p)
    if not ident:
        raise ValueError(
            "MATCH_RECOGNIZE: expected a table name or (SELECT …) "
            "derived table before the clause"
        )
    r = skip_ws(q)
    had_as = False
    r2, ident2 = read_ident(r)
    if ident2.upper() == "AS":
        had_as = True
        r = skip_ws(r2)
        r2, ident2 = read_ident(r)
    if r > 0 and masked[r - 1] == ")":
        # `(SELECT …) [AS] alias MATCH_RECOGNIZE` — ident was the alias
        return scan_subquery(r - 1, ident)
    if had_as or (
        ident2 and ident2.upper() not in _SQL_FACTOR_KEYWORDS
    ):
        # `<table> [AS] <alias> MATCH_RECOGNIZE` — ident was the alias,
        # ident2 the (possibly qualified) table name. Without this,
        # `FROM events AS e MATCH_RECOGNIZE (…)` would look up table
        # 'e' — or silently bind to an unrelated view named 'e'.
        return r2, ("table", ident2), ident
    return q, ("table", ident), None


def _leading_ctes(
    masked: str, query: str
) -> tuple[bool, list[tuple[str, str, int]]]:
    """Parse a LEADING top-level ``WITH`` clause (masked-scan, so quoted
    text never confuses it). Returns ``(recursive, items)`` where each
    item is ``(name, full item text 'name [(cols)] AS (body)', end)`` —
    ``end`` the offset just past the item in ``query``. Empty when the
    query does not start with WITH or the clause is malformed (callers
    then skip the prefix rather than guess)."""
    m = re.match(r"\s*WITH\s+(RECURSIVE\s+)?", masked, re.IGNORECASE)
    if not m:
        return False, []
    recursive = bool(m.group(1))
    out: list[tuple[str, str, int]] = []
    i, n = m.end(), len(masked)
    while True:
        mm = re.match(
            r"(\s*)(\w+)\s*(\([^()]*\))?\s*AS\s*\(", masked[i:], re.IGNORECASE
        )
        if not mm:
            return False, []
        item_start = i + len(mm.group(1))
        j = i + mm.end()  # just past the CTE body's opening paren
        depth = 1
        while j < n and depth:
            if masked[j] == "(":
                depth += 1
            elif masked[j] == ")":
                depth -= 1
            j += 1
        if depth:
            return False, []
        out.append((mm.group(2), query[item_start:j], j))
        sep = re.match(r"\s*,", masked[j:])
        if sep is None:
            return recursive, out
        i = j + sep.end()


def _prepend_visible_ctes(
    masked: str, query: str, factor_start: int, sub_sql: str
) -> str:
    """Make the outer query's leading CTEs visible to a derived-table
    MATCH_RECOGNIZE factor: ``spark.sql`` plans the factor's subquery
    standalone, so ``WITH c AS (...) SELECT ... FROM (SELECT * FROM c)
    MATCH_RECOGNIZE (...)`` would otherwise fail analysis on ``c``.
    Textually prepends the CTEs whose definition ends before the factor
    (SQL scoping: a CTE body sees only earlier CTEs), merging with the
    subquery's own WITH clause when present; inner names shadow outer
    ones (the duplicate outer CTE is dropped from the prefix)."""
    recursive, items = _leading_ctes(masked, query)
    visible = [(nm, txt) for nm, txt, end in items if end <= factor_start]
    if not visible:
        return sub_sql
    sub_masked = _mask_literals(sub_sql)
    inner = re.match(r"\s*WITH\s+(RECURSIVE\s+)?", sub_masked, re.IGNORECASE)
    if inner:
        _, inner_items = _leading_ctes(sub_masked, sub_sql)
        inner_names = {nm.lower() for nm, _txt, _end in inner_items}
        visible = [
            (nm, txt) for nm, txt in visible if nm.lower() not in inner_names
        ]
        if not visible:
            return sub_sql
        recursive = recursive or bool(inner.group(1))
        rest = sub_sql[inner.end() :]
    else:
        rest = None
    kw = "WITH RECURSIVE " if recursive else "WITH "
    prefix = kw + ", ".join(txt for _nm, txt in visible)
    if rest is not None:
        return prefix + ", " + rest
    return prefix + " " + sub_sql


_AS_KW = re.compile(r"\sAS\s", re.IGNORECASE)


def _split_as(item: str) -> tuple[str, str]:
    """Split `expr AS alias` on the LAST top-level AS keyword (outside
    parens and literals); returns ('', '') when no AS is present."""
    masked = _mask_literals(item)
    last = None
    for m in _AS_KW.finditer(masked):
        d = masked[: m.start()].count("(") - masked[: m.start()].count(")")
        if d == 0:
            last = m
    if last is None:
        return "", ""
    return item[: last.start()].strip(), item[last.end() :].strip()


def rewrite_match_recognize(spark, query: str) -> str:
    """Replace every `<factor> MATCH_RECOGNIZE (...)` table factor in
    ``query`` with a temp view computed by :func:`match_recognize`, and
    return the rewritten SQL (a no-op when the spelling is absent). The
    factor may be a (qualified) table/view name OR a derived table
    `(SELECT …) [AS alias]` — the subquery is planned with spark.sql
    and fed to the operator directly. Nested spellings compose: an
    inner MATCH_RECOGNIZE inside the derived table is rewritten first
    (innermost keyword found first), then the outer pass sees its view.
    String literals are masked before scanning, so quoted text
    containing commas, AS, or even 'MATCH_RECOGNIZE (' never confuses
    the parse. View names carry a per-call uuid so concurrent
    Context.sql calls on one session cannot bind to each other's
    rewrites."""
    import uuid

    while True:
        masked = _mask_literals(query)
        head = _MR_KW.search(masked)
        if head is None:
            return query
        # NB: named factor_alias, not alias — the measures loop below
        # reuses `alias` for each measure's AS name
        factor_start, src, factor_alias = _locate_factor(
            masked, query, head.start()
        )
        # find the balanced closing paren of the MATCH_RECOGNIZE body
        depth, i = 1, head.end()
        while i < len(masked) and depth:
            if masked[i] == "(":
                depth += 1
            elif masked[i] == ")":
                depth -= 1
            i += 1
        if depth:
            raise ValueError("MATCH_RECOGNIZE: unbalanced parentheses")
        body = query[head.end() : i - 1].strip()
        m = _CLAUSE.match(_mask_literals(body))
        if m is None:
            raise ValueError(
                "MATCH_RECOGNIZE: expected PARTITION BY … ORDER BY … "
                "MEASURES … PATTERN (…) [DEFINE …] (got: "
                f"{body[:120]!r}…)"
            )

        def _orig(grp: str) -> str | None:
            # map the masked match's span back onto the unmasked body
            return body[m.start(grp) : m.end(grp)] if m.group(grp) else None

        measures = []
        for item in _split_top(_orig("meas") or ""):
            expr, alias = _split_as(item)
            if not expr:
                raise ValueError(
                    f"MATCH_RECOGNIZE: measure needs an AS alias: {item!r}"
                )
            measures.append((expr, alias))
        subset = {}
        if m.group("sub"):
            for item in _split_top(_orig("sub")):
                sm = re.match(r"^(\w+)\s*=\s*\(\s*(.+?)\s*\)$", item, re.S)
                if not sm:
                    raise ValueError(
                        f"MATCH_RECOGNIZE: SUBSET needs `NAME = (A, B)`: "
                        f"{item!r}"
                    )
                subset[sm.group(1)] = [
                    w.strip() for w in sm.group(2).split(",")
                ]
        define = {}
        if m.group("def"):
            for item in _split_top(_orig("def")):
                # DEFINE splits on the FIRST AS: the symbol is a bare
                # identifier, the predicate may itself contain AS-free
                # text and literals
                masked_item = _mask_literals(item)
                kw = _AS_KW.search(masked_item)
                if kw is None:
                    raise ValueError(
                        f"MATCH_RECOGNIZE: DEFINE needs `SYM AS pred`: {item!r}"
                    )
                define[item[: kw.start()].strip()] = item[kw.end() :].strip()
        if src[0] == "table":
            # a bare CTE name as the factor (`WITH c AS (...) SELECT ...
            # FROM c MATCH_RECOGNIZE (...)`) is not a catalog table —
            # spark.table would fail analysis; route it through the same
            # CTE-prepending path as derived-table factors (ADVICE r11)
            _rec, _items = _leading_ctes(masked, query)
            cte_names = {
                nm.lower() for nm, _txt, end in _items if end <= factor_start
            }
            if "." not in src[1] and src[1].lower() in cte_names:
                src_df = spark.sql(
                    _prepend_visible_ctes(
                        masked, query, factor_start,
                        f"SELECT * FROM {src[1]}",
                    )
                )
            else:
                src_df = spark.table(src[1])
        else:
            src_df = spark.sql(
                _prepend_visible_ctes(masked, query, factor_start, src[1])
            )
        out = match_recognize(
            src_df,
            partition_by=list(_split_top(_orig("part"))),
            order_by=list(_split_top(_orig("order"))),
            measures=measures,
            pattern=m.group("pat"),
            define=define,
            all_rows=bool(
                m.group("rows") and m.group("rows").upper().startswith("ALL")
            ),
            # WITH UNMATCHED ROWS maps through; SHOW/OMIT EMPTY MATCHES
            # are accepted no-ops — the NFA rejects empty-matching
            # patterns, so empty matches cannot exist and the two modes
            # coincide
            unmatched=bool(
                m.group("emis") and m.group("emis").upper().startswith("WITH")
            ),
            after_match=m.group("skip") or "PAST LAST ROW",
            subset=subset,
            within=_orig("win"),
        )
        view = f"__match_recognize_{uuid.uuid4().hex[:12]}"
        out.createOrReplaceTempView(view)
        replacement = (
            view if factor_alias is None else f"{view} AS {factor_alias}"
        )
        query = query[:factor_start] + replacement + query[i:]
