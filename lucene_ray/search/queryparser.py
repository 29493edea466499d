"""Classic query parser: string -> Query tree.

Reimplements the documented syntax and clause semantics of the
reference's classic parser (``queryparser/classic/QueryParserBase.java``,
grammar ``QueryParser.jj``; conformance cases transcribed from
``queryparser/util/QueryParserTestBase.java``):

- ``a AND b`` -> +a +b, ``a OR b`` -> a b, ``a AND NOT b`` -> +a -b
- prefix modifiers ``+`` ``-`` ``!`` (adjacent to the operand)
- ``field:term``, ``field:(...)``, ``field:"phrase"``
- ``"a b"`` phrase, ``"a b"~N`` sloppy phrase
- ``term*`` prefix, ``te?m*`` wildcard, ``/regex/`` regexp
- ``term~`` fuzzy (maxEdits 2), ``term~1``, ``term~0.7`` (legacy
  float -> FuzzyQuery.floatToEdits, ``search/FuzzyQuery.java:261``)
- ``[a TO b]`` / ``{a TO b}`` term ranges, ``*`` = open bound
- ``^2.0`` boosts on any atom or group, ``( ... )`` grouping

The clause-modifier algorithm is QueryParserBase.addClause
(``QueryParserBase.java:365-409``): AND promotes the previous clause to
MUST; with a default-AND operator OR demotes it back to SHOULD.
"""

from __future__ import annotations

import re

from .query import (
    BooleanQuery,
    BoostQuery,
    ComplexPhraseQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    PhraseQuery,
    PrefixQuery,
    Query,
    RegexpQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)

_CONJ_NONE, _CONJ_AND, _CONJ_OR = 0, 1, 2
_MOD_NONE, _MOD_REQ, _MOD_NOT = 0, 1, 2

_TOKEN = re.compile(r"""
    (?P<ws>\s+)
  | (?P<and>AND\b|&&)
  | (?P<or>OR\b|\|\|)
  | (?P<not>NOT\b)
  | (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<plus>\+(?=\S))
  | (?P<minus>-(?=\S))
  | (?P<bang>!(?=\S))
  | (?P<phrase>"(?:[^"\\]|\\.)*"(?:~(?P<slop>\d+(?:\.\d+)?))?)
  | (?P<regex>/(?:[^/\\]|\\.)+/)
  | (?P<range>[\[\{]\s*(?P<lo>[^\s\]\}]+)\s+TO\s+(?P<hi>[^\s\]\}]+)\s*[\]\}])
  | (?P<gboost>\^(?:\d+(?:\.\d+)?|\.\d+))
  | (?P<term>(?:[^\s()"^\\]|\\.)+)
""", re.VERBOSE)

_BOOST = re.compile(r"\^(?P<boost>\d+(?:\.\d+)?|\.\d+)")
_FUZZY_SUFFIX = re.compile(r"(?<!\\)~(?P<sim>\d+(?:\.\d+)?)?$")


class ParseException(ValueError):
    pass


def _unescape(s: str) -> str:
    r"""discardEscapeChar (QueryParserBase.java:907): drop backslashes,
    decode ``\uXXXX`` unicode escapes."""
    out = []
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n:
            if (s[i + 1] == "u" and i + 6 <= n
                    and all(ch in "0123456789abcdefABCDEF"
                            for ch in s[i + 2:i + 6])):
                out.append(chr(int(s[i + 2:i + 6], 16)))
                i += 6
                continue
            out.append(s[i + 1])
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _float_to_edits(sim: float, term_len: int) -> int:
    """FuzzyQuery.floatToEdits (search/FuzzyQuery.java:261-271)."""
    if sim >= 1.0:
        if sim != int(sim):
            raise ParseException(
                f"fractional edit distances are not allowed: {sim}")
        return min(int(sim), 2)
    if sim == 0.0:
        return 0
    return min(int((1.0 - sim) * term_len), 2)


class QueryParser:
    """``QueryParser(default_field).parse("+a -b title:(c OR d)")``.

    ``analyzer``: callable ``text -> list[str]`` applied to bare terms
    and phrase contents (default: the engine's StandardAnalyzer).
    ``default_operator``: "OR" (classic default) or "AND"."""

    def __init__(self, default_field: str = "text", analyzer=None,
                 default_operator: str = "OR"):
        if analyzer is None:
            from ..analysis import StandardAnalyzer
            analyzer = StandardAnalyzer()
        self.analyzer = analyzer
        self.default_field = default_field
        assert default_operator in ("OR", "AND")
        self.default_or = default_operator == "OR"

    # -- lexer --------------------------------------------------------------
    def _lex(self, s: str):
        out = []
        i = 0
        while i < len(s):
            m = _TOKEN.match(s, i)
            if m is None:
                raise ParseException(f"cannot lex at {s[i:]!r}")
            i = m.end()
            kind = m.lastgroup if m.lastgroup in (
                "ws", "and", "or", "not", "lparen", "rparen", "plus",
                "minus", "bang", "gboost") else None
            if kind == "ws":
                continue
            if kind:
                out.append((kind, m.group(0), None))
                continue
            for k in ("phrase", "regex", "range", "term"):
                if m.group(k) is not None:
                    tok = (k, m.group(0), m)
                    break
            # postfix boost binds to the atom
            bm = _BOOST.match(s, i)
            boost = None
            if bm:
                boost = float(bm.group("boost"))
                i = bm.end()
            out.append((tok[0], tok[1], (tok[2], boost)))
        return out

    # -- parser -------------------------------------------------------------
    def parse(self, s: str) -> Query:
        self._toks = self._lex(s)
        self._pos = 0
        q = self._parse_boolean(self.default_field)
        if self._pos < len(self._toks):
            raise ParseException(f"unbalanced input near "
                                 f"{self._toks[self._pos][1]!r}")
        if q is None:
            return BooleanQuery()  # matches nothing (all terms analyzed away)
        return q

    def _peek(self):
        return self._toks[self._pos] if self._pos < len(self._toks) else None

    def _next(self):
        t = self._toks[self._pos]
        self._pos += 1
        return t

    def _parse_boolean(self, field: str) -> Query | None:
        clauses: list[tuple[str, Query]] = []  # (occur, query)
        first = True
        while True:
            t = self._peek()
            if t is None or t[0] == "rparen":
                break
            conj = _CONJ_NONE
            if t[0] == "and":
                self._next()
                conj = _CONJ_AND
            elif t[0] == "or":
                self._next()
                conj = _CONJ_OR
            mods = _MOD_NONE
            t = self._peek()
            if t is not None and t[0] in ("plus", "minus", "bang", "not"):
                self._next()
                mods = _MOD_REQ if t[0] == "plus" else _MOD_NOT
            q = self._parse_atom(field)
            self._add_clause(clauses, conj, mods, q)
            first = False
        if not clauses:
            return None
        if len(clauses) == 1 and clauses[0][0] == "should":
            return clauses[0][1]
        return BooleanQuery(
            must=tuple(q for o, q in clauses if o == "must"),
            should=tuple(q for o, q in clauses if o == "should"),
            must_not=tuple(q for o, q in clauses if o == "must_not"))

    def _add_clause(self, clauses, conj, mods, q):
        """QueryParserBase.addClause semantics (:365-409)."""
        if clauses and conj == _CONJ_AND:
            occ, pq = clauses[-1]
            if occ != "must_not":
                clauses[-1] = ("must", pq)
        if clauses and not self.default_or and conj == _CONJ_OR:
            occ, pq = clauses[-1]
            if occ != "must_not":
                clauses[-1] = ("should", pq)
        if q is None:
            return
        if self.default_or:
            prohibited = mods == _MOD_NOT
            required = mods == _MOD_REQ or (conj == _CONJ_AND and not prohibited)
        else:
            prohibited = mods == _MOD_NOT
            required = not prohibited and conj != _CONJ_OR
        occ = "must_not" if prohibited else ("must" if required else "should")
        clauses.append((occ, q))

    def _parse_atom(self, field: str) -> Query | None:
        t = self._peek()
        if t is None:
            raise ParseException("unexpected end of input")
        kind, text, extra = t
        if kind == "lparen":
            self._next()
            q = self._parse_boolean(field)
            t2 = self._peek()
            if t2 is None or t2[0] != "rparen":
                raise ParseException("expected ')'")
            self._next()
            # boost directly after the group
            boost = self._group_boost()
            # flexible-parser group min-should-match: "(a b c)@2"
            # (queryparser/flexible/standard/StandardSyntaxParser.jj
            # <AT> NumberToken -> setMinimumNumberShouldMatch)
            msm = self._group_msm()
            if q is None:
                return None
            if msm is not None and isinstance(q, BooleanQuery):
                from dataclasses import replace as _rep
                q = _rep(q, min_should_match=msm)
            return BoostQuery(q, boost) if boost is not None else q
        if kind in ("phrase", "regex", "range", "term"):
            self._next()
            m, boost = extra
            q = self._atom_query(kind, m, field)
            if q is not None and boost is not None:
                q = BoostQuery(q, boost)
            return q
        raise ParseException(f"unexpected token {text!r}")

    def _group_boost(self):
        t = self._peek()
        if t is not None and t[0] == "gboost":
            self._next()
            return float(t[1][1:])
        return None

    def _group_msm(self):
        # "@N" right after a group lexes as a term token; consume it
        # ONLY in that position (elsewhere '@' stays a term character,
        # so emails etc. are unaffected)
        t = self._peek()
        if t is not None and t[0] == "term" and \
                re.fullmatch(r"@\d+", t[1]):
            self._next()
            return int(t[1][1:])
        return None

    def _norm_field(self, fld):
        return None if fld == self.default_field else fld

    def _atom_query(self, kind: str, m, field: str) -> Query | None:
        fld = field
        if kind == "phrase":
            raw = m.group("phrase")
            body = raw[1:raw.rindex('"')]
            slop = int(float(m.group("slop"))) if m.group("slop") else 0
            if hasattr(self.analyzer, "analyze_spans"):
                return self._graph_phrase(
                    self.analyzer.analyze_spans(_unescape(body)), slop,
                    self._norm_field(fld))
            terms = self.analyzer(_unescape(body))
            if not terms:
                return None
            if len(terms) == 1:
                return TermQuery(terms[0], field=self._norm_field(fld))
            return PhraseQuery(tuple(terms), slop=slop, field=self._norm_field(fld))
        if kind == "regex":
            return RegexpQuery(m.group("regex")[1:-1], field=self._norm_field(fld))
        if kind == "range":
            def bound(x):
                if len(x) >= 2 and x[0] == '"' and x[-1] == '"':
                    x = x[1:-1]
                return _unescape(x)
            lo = bound(m.group("lo"))
            hi = bound(m.group("hi"))
            raw = m.group("range")
            inc_lo = raw.lstrip()[0] == "["
            inc_hi = raw.rstrip()[-1] == "]"
            return TermRangeQuery(
                None if lo == "*" else lo.lower(),
                None if hi == "*" else hi.lower(),
                include_lower=inc_lo, include_upper=inc_hi,
                field=self._norm_field(fld))
        # term-ish: maybe field-qualified; recurse for the qualified atom
        text = m.group("term")
        fm = re.match(r"(?P<f>(?:[^\s()\"^\\:~*?]|\\.)+):(?P<rest>.*)", text)
        if fm and fm.group("rest"):
            fld = _unescape(fm.group("f"))
            rest = fm.group("rest")
            sub = self._relex_atom(rest)
            if sub is not None:
                return self._atom_query(sub[0], sub[1], fld)
            text = rest
        elif fm and not fm.group("rest"):
            # 'field:(...)' or 'field:"..."' — qualify the next atom
            fld = _unescape(fm.group("f"))
            return self._parse_atom(fld)
        return self._term_query(text, fld)

    def _relex_atom(self, s: str):
        m = _TOKEN.match(s)
        if m and m.end() == len(s) and m.lastgroup in ("phrase", "regex",
                                                       "range"):
            return (m.lastgroup, m)
        return None

    def _term_query(self, text: str, field: str) -> Query | None:
        fz = _FUZZY_SUFFIX.search(text)
        if fz:
            base = _unescape(text[:fz.start()]).lower()
            if not base:
                raise ParseException(f"fuzzy with empty term: {text!r}")
            sim = fz.group("sim")
            edits = 2 if sim is None else _float_to_edits(float(sim),
                                                          len(base))
            return FuzzyQuery(base, max_edits=edits, field=self._norm_field(field))
        has_wild = re.search(r"(?<!\\)[*?]", text) is not None
        if has_wild:
            pat = text.lower()
            if pat == "*":
                return MatchAllDocsQuery()
            if pat.endswith("*") and not re.search(r"(?<!\\)[*?]",
                                                   pat[:-1]):
                return PrefixQuery(_unescape(pat[:-1]),
                                   field=self._norm_field(field))
            # escapes stay IN the pattern (\* = literal star), matching
            # WildcardQuery.toString semantics
            return WildcardQuery(pat, field=self._norm_field(field))
        if hasattr(self.analyzer, "analyze_spans"):
            return self._graph_boolean(
                self.analyzer.analyze_spans(_unescape(text)),
                self._norm_field(field))
        terms = self.analyzer(_unescape(text))
        if not terms:
            return None
        if len(terms) == 1:
            return TermQuery(terms[0], field=self._norm_field(field))
        return PhraseQuery(tuple(terms), field=self._norm_field(field))

    # --- QueryBuilder.analyzeGraphBoolean / analyzeGraphPhrase ----------
    # (util/QueryBuilder.java; reference tests TestSynonymGraphFilter /
    # TestQueryParser synonym cases). Spans are the graph's articulation
    # decomposition — see analysis/syngraph.py.

    _MAX_GRAPH_PATHS = 128  # IndexSearcher.maxClauseCount role

    def _graph_boolean(self, spans, field) -> Query | None:
        """One query atom whose analysis is a graph: per span, a
        disjunction over paths (term / phrase); spans joined by the
        parser's default operator (analyzeGraphBoolean)."""
        if not spans:
            return None

        def path_q(p):
            return TermQuery(p[0], field=field) if len(p) == 1 else \
                PhraseQuery(tuple(p), field=field)

        qs = []
        for alts in spans:
            subs = [path_q(p) for p in alts]
            qs.append(subs[0] if len(subs) == 1
                      else BooleanQuery(should=tuple(subs)))
        if len(qs) == 1:
            return qs[0]
        return (BooleanQuery(should=tuple(qs)) if self.default_or
                else BooleanQuery(must=tuple(qs)))

    def _graph_phrase(self, spans, slop, field) -> Query | None:
        """Quoted phrase whose analysis is a graph: disjunction of the
        full phrase paths (analyzeGraphPhrase; the reference builds
        SpanNear trees — a phrase-per-path disjunction has the same
        match set for acyclic synonym graphs)."""
        if not spans:
            return None
        paths = [()]
        for alts in spans:
            paths = [p + a for p in paths for a in alts]
            if len(paths) > self._MAX_GRAPH_PATHS:
                raise ParseException(
                    f"synonym graph expands to > {self._MAX_GRAPH_PATHS} "
                    "phrase paths")
        qs = [TermQuery(p[0], field=field) if len(p) == 1 else
              PhraseQuery(tuple(p), slop=slop, field=field) for p in paths]
        return qs[0] if len(qs) == 1 else BooleanQuery(should=tuple(qs))


class ComplexPhraseQueryParser(QueryParser):
    """Classic parser that re-parses quoted-phrase contents for embedded
    sub-syntax (``queryparser/complexPhrase/ComplexPhraseQueryParser
    .java``; tests ``TestComplexPhraseQuery.java``): ``"data mer*"``,
    ``"(john jonathon) smith"``, ``"foo bar~1"``, ``"a b*"~2``.

    Phrase elements: a parenthesized group is a slot of alternatives;
    other elements classify like classic term atoms (prefix / wildcard
    / fuzzy keep their multi-term query, plain terms analyze; a
    stop-worded-away element drops its slot). Lowering to concrete
    terms happens at search time against the term dictionary
    (``Searcher.rewrite`` on :class:`ComplexPhraseQuery`)."""

    _ELEM = re.compile(r"\(([^()]*)\)|\S+")

    def _phrase_slot(self, text: str, field):
        """One element -> list of slot entries (str | Query), or None to
        drop the slot (stop word)."""
        q = self._term_query(text, field)
        if q is None:
            return None
        if isinstance(q, TermQuery):
            return [q.term]
        if isinstance(q, PhraseQuery):
            # multi-token analysis output -> consecutive singleton slots
            return [[t] for t in q.terms]
        if isinstance(q, MatchAllDocsQuery):
            raise ParseException('bare "*" inside a phrase')
        return [q]

    def _atom_query(self, kind: str, m, field: str) -> Query | None:
        if kind != "phrase":
            return super()._atom_query(kind, m, field)
        raw = m.group("phrase")
        body = raw[1:raw.rindex('"')]
        slop = int(float(m.group("slop"))) if m.group("slop") else 0
        fld = self._norm_field(field)
        slots: list[tuple] = []
        plain = True
        for em in self._ELEM.finditer(body):
            if em.group(1) is not None:  # (alt alt ...) group
                alts: list = []
                for alt in em.group(1).split():
                    entry = self._phrase_slot(alt, field)
                    if entry is None:
                        continue
                    if isinstance(entry[0], list):
                        raise ParseException(
                            f"multi-token alternative in group: {alt!r}")
                    alts.extend(entry)
                if alts:
                    slots.append(tuple(alts))
                    plain = plain and len(alts) == 1 and isinstance(
                        alts[0], str)
            else:
                entry = self._phrase_slot(em.group(0), field)
                if entry is None:
                    continue
                if entry and isinstance(entry[0], list):
                    slots.extend(tuple(e) for e in entry)  # analyzed run
                else:
                    slots.append(tuple(entry))
                    plain = plain and isinstance(entry[0], str)
        if not slots:
            return None
        if len(slots) == 1 and len(slots[0]) == 1:
            e = slots[0][0]
            return TermQuery(e, field=fld) if isinstance(e, str) else e
        if plain:
            return PhraseQuery(tuple(s[0] for s in slots), slop=slop,
                               field=fld)
        return ComplexPhraseQuery(tuple(slots), slop=slop, field=fld)


def parse_query(s: str, default_field: str = "text",
                default_operator: str = "OR", analyzer=None) -> Query:
    return QueryParser(default_field, analyzer, default_operator).parse(s)


def parse_complex_phrase_query(s: str, default_field: str = "text",
                               default_operator: str = "OR",
                               analyzer=None) -> Query:
    return ComplexPhraseQueryParser(default_field, analyzer,
                                    default_operator).parse(s)
