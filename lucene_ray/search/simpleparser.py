"""SimpleQueryParser — the lenient end-user query syntax
(``lucene/queryparser/src/java/org/apache/lucene/queryparser/simple/
SimpleQueryParser.java``; tests ``TestSimpleQueryParser.java``).

Supported operators (each individually disableable via ``flags``,
like the reference's feature bitmask):
  ``+``        AND (also the implicit whitespace operator when
               ``default_operator='must'``)
  ``|``        OR (lowest precedence: ``a b | c`` == ``(a b) | c``)
  ``-``        NOT (prefix on a term/phrase/group)
  ``"..."``    phrase, optional ``~N`` slop suffix
  ``term*``    prefix query
  ``term~N``   fuzzy query (N edits)
  ``( ... )``  grouping
  ``\\x``      escape

NEVER raises: malformed syntax degrades to literal terms (the
reference's defining property — it is safe to feed raw user input)."""

from __future__ import annotations

from .query import (
    BooleanQuery, FuzzyQuery, MatchAllDocsQuery, PhraseQuery, PrefixQuery,
    Query, TermQuery,
)

PHRASE_OP = 1
PREFIX_OP = 2
AND_OP = 4
OR_OP = 8
NOT_OP = 16
FUZZY_OP = 32
ALL_OP = PHRASE_OP | PREFIX_OP | AND_OP | OR_OP | NOT_OP | FUZZY_OP


def _tokenize(expr: str, flags: int):
    """Lexer -> tokens: ('op', c) | ('term', text) | ('phrase', text,
    slop). Lenient: unbalanced quotes swallow to end-of-string;
    operators not in ``flags`` lex as literal characters."""
    toks = []
    i, n = 0, len(expr)
    buf = []

    def flush():
        if buf:
            toks.append(("term", "".join(buf)))
            buf.clear()

    while i < n:
        c = expr[i]
        if c == "\\" and i + 1 < n:
            # NUL marker: the next char is literal, never an operator
            buf.append("\x00" + expr[i + 1])
            i += 2
            continue
        if c.isspace():
            flush()
            i += 1
            continue
        if c == '"' and flags & PHRASE_OP:
            flush()
            j = expr.find('"', i + 1)
            if j < 0:
                j = n
            body = expr[i + 1:j]
            i = j + 1
            slop = 0
            if i < n and expr[i] == "~":
                k = i + 1
                while k < n and expr[k].isdigit():
                    k += 1
                if k > i + 1:
                    slop = int(expr[i + 1:k])
                    i = k
            toks.append(("phrase", body, slop))
            continue
        if c in "()" :
            flush()
            toks.append(("op", c))
            i += 1
            continue
        if c == "+" and flags & AND_OP and not buf:
            flush()
            toks.append(("op", "+"))
            i += 1
            continue
        if c == "-" and flags & NOT_OP and not buf:
            flush()
            toks.append(("op", "-"))
            i += 1
            continue
        if c == "|" and flags & OR_OP:
            flush()
            toks.append(("op", "|"))
            i += 1
            continue
        buf.append(c)
        i += 1
    flush()
    return toks


def _term_query(text: str, flags: int, analyzer) -> Query | None:
    fuzzy = 0
    if flags & FUZZY_OP and "~" in text:
        base, _, suf = text.rpartition("~")
        if base and suf.isdigit() and not base.endswith("\x00"):
            text, fuzzy = base, min(int(suf), 2)
    prefix = False
    if flags & PREFIX_OP and text.endswith("*") and len(text) > 1 \
            and not text.endswith("\x00*"):
        text, prefix = text[:-1], True
    text = text.replace("\x00", "")  # drop escape markers
    terms = analyzer(text) if analyzer else [text.lower()]
    if not terms:
        return None
    if prefix:
        return PrefixQuery(terms[-1])
    if fuzzy:
        return FuzzyQuery(terms[0], max_edits=fuzzy)
    if len(terms) == 1:
        return TermQuery(terms[0])
    return PhraseQuery(tuple(terms))  # multi-token term -> phrase


def parse_simple_query(expr: str, default_operator: str = "should",
                       flags: int = ALL_OP, analyzer=None) -> Query:
    """Parse; empty/all-noise input -> MatchAllDocsQuery (the
    reference returns a match-all for empty input)."""
    if analyzer is None:
        from ..analysis.analyzer import StandardAnalyzer
        analyzer = StandardAnalyzer()
    toks = _tokenize(expr, flags)

    def parse_group(pos: int):
        """-> (or_groups, pos): list of lists of (negated, Query)."""
        groups = [[]]
        while pos < len(toks):
            t = toks[pos]
            if t[0] == "op":
                c = t[1]
                if c == ")":
                    return groups, pos + 1
                if c == "|":
                    groups.append([])
                    pos += 1
                    continue
                if c in "+":
                    pos += 1
                    continue
                if c == "-":
                    if pos + 1 < len(toks) and toks[pos + 1][0] != "op":
                        q = _leaf(toks[pos + 1])
                        if q is not None:
                            groups[-1].append((True, q))
                        pos += 2
                        continue
                    if pos + 1 < len(toks) and toks[pos + 1] == ("op", "("):
                        sub, pos2 = parse_group(pos + 2)
                        q = _combine(sub)
                        if q is not None:
                            groups[-1].append((True, q))
                        pos = pos2
                        continue
                    pos += 1  # dangling '-': lenient drop
                    continue
                if c == "(":
                    sub, pos = parse_group(pos + 1)
                    q = _combine(sub)
                    if q is not None:
                        groups[-1].append((False, q))
                    continue
                pos += 1
                continue
            q = _leaf(t)
            if q is not None:
                groups[-1].append((False, q))
            pos += 1
        return groups, pos

    def _leaf(t):
        if t[0] == "term":
            return _term_query(t[1], flags, analyzer)
        if t[0] == "phrase":
            terms = tuple(analyzer(t[1]))
            if not terms:
                return None
            if len(terms) == 1:
                return TermQuery(terms[0])
            return PhraseQuery(terms, slop=t[2])
        return None

    def _combine(groups) -> Query | None:
        alts = []
        for g in groups:
            pos_q = [q for neg, q in g if not neg]
            neg_q = [q for neg, q in g if neg]
            if not pos_q and not neg_q:
                continue
            if default_operator == "must":
                inner = BooleanQuery(must=tuple(pos_q),
                                     must_not=tuple(neg_q))
            else:
                if neg_q:
                    inner = BooleanQuery(should=tuple(pos_q),
                                         must_not=tuple(neg_q))
                elif len(pos_q) == 1:
                    inner = pos_q[0]
                else:
                    inner = BooleanQuery(should=tuple(pos_q))
            if default_operator == "must" and not neg_q \
                    and len(pos_q) == 1:
                inner = pos_q[0]
            alts.append(inner)
        if not alts:
            return None
        if len(alts) == 1:
            return alts[0]
        return BooleanQuery(should=tuple(alts))

    groups, _ = parse_group(0)
    q = _combine(groups)
    return q if q is not None else MatchAllDocsQuery()
