"""XML query parser — the ``queryparser/xml`` module's CoreParser role
(``lucene/queryparser/src/java/org/apache/lucene/queryparser/xml/
CoreParser.java`` and its builders package; tests
``TestCoreParser.java`` with the ``*.xml`` query fixtures).

Element set (the CoreParser default builder registry, mapped to this
engine's Query types):

  <TermQuery field= boost=>text</TermQuery>
  <TermsQuery field=>space-separated terms</TermsQuery>      (TermInSet)
  <BooleanQuery>
      <Clause occurs="must|should|mustNot|filter"> <...> </Clause> ...
  </BooleanQuery>                          (+ minimumNumberShouldMatch)
  <PhraseQuery field= slop=>quoted phrase text</PhraseQuery>
  <PointRangeQuery field= lowerTerm= upperTerm=/>   (numeric range)
  <RangeQuery field= lowerTerm= upperTerm= includeLower= includeUpper=/>
  <PrefixQuery field= prefix=/>  <WildcardQuery field=>pat*</WildcardQuery>
  <FuzzyQuery field= maxEdits=>term</FuzzyQuery>
  <MatchAllDocsQuery/>
  <ConstantScoreQuery boost=> <...> </ConstantScoreQuery>
  <DisjunctionMaxQuery tieBreaker=> <...> <...> </DisjunctionMaxQuery>
  <SpanNear slop= inOrder=> <SpanTerm>t</SpanTerm>... </SpanNear>
  <BoostingTermQuery ...> is intentionally not carried (deprecated).

Any ``boost`` attribute wraps the built query in a BoostQuery, like the
reference's common-attrs handling.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from .query import (
    BooleanQuery,
    BoostQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    NumericRangeQuery,
    PhraseQuery,
    PrefixQuery,
    Query,
    SpanNearQuery,
    TermInSetQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)


class XMLParseError(ValueError):
    pass


def _bool_attr(el, name, default):
    v = el.get(name)
    if v is None:
        return default
    return v.strip().lower() in ("true", "yes", "1")


class XMLQueryParser:
    """Parse an XML query document into a Query tree."""

    def __init__(self, default_field: str = "text", analyzer=None):
        from ..analysis import StandardAnalyzer
        self.default_field = default_field
        self.analyzer = analyzer or StandardAnalyzer()

    # field=None means "the default field" in this engine's Query types
    def _field(self, el) -> str | None:
        f = el.get("fieldName") or el.get("field") or self.default_field
        return None if f == self.default_field else f

    def parse(self, xml: str) -> Query:
        try:
            root = ET.fromstring(xml)
        except ET.ParseError as e:
            raise XMLParseError(str(e)) from e
        q = self._build(root)
        if q is None:
            raise XMLParseError("query parsed to nothing")
        return q

    def _children(self, el):
        return [c for c in el if isinstance(c.tag, str)]

    def _build(self, el) -> Query | None:
        tag = el.tag
        boost = el.get("boost")
        build = getattr(self, f"_b_{tag}", None)
        if build is None:
            raise XMLParseError(f"unknown query element <{tag}>")
        q = build(el)
        # ConstantScoreQuery consumes its own boost attribute (it IS
        # the constant); everything else gets the generic boost wrap
        if q is not None and boost is not None \
                and tag != "ConstantScoreQuery":
            q = BoostQuery(q, float(boost))
        return q

    # --- leaf builders ------------------------------------------------

    def _b_TermQuery(self, el):
        terms = self.analyzer((el.text or "").strip())
        if not terms:
            return None
        if len(terms) != 1:
            raise XMLParseError("TermQuery text analyzed to several terms")
        return TermQuery(terms[0], field=self._field(el))

    def _b_TermsQuery(self, el):
        terms = self.analyzer((el.text or "").strip())
        return TermInSetQuery(tuple(terms), field=self._field(el)) \
            if terms else None

    def _b_PhraseQuery(self, el):
        terms = self.analyzer((el.text or "").strip())
        if not terms:
            return None
        slop = int(el.get("slop", "0"))
        if len(terms) == 1:
            return TermQuery(terms[0], field=self._field(el))
        return PhraseQuery(tuple(terms), slop=slop, field=self._field(el))

    def _b_PrefixQuery(self, el):
        pre = el.get("prefix") or (el.text or "").strip()
        if not pre:
            raise XMLParseError("PrefixQuery needs prefix")
        return PrefixQuery(pre.lower(), field=self._field(el))

    def _b_WildcardQuery(self, el):
        pat = (el.text or "").strip()
        if not pat:
            raise XMLParseError("WildcardQuery needs a pattern")
        return WildcardQuery(pat.lower(), field=self._field(el))

    def _b_FuzzyQuery(self, el):
        term = (el.text or "").strip().lower()
        if not term:
            raise XMLParseError("FuzzyQuery needs a term")
        return FuzzyQuery(term, max_edits=int(el.get("maxEdits", "2")),
                          prefix_length=int(el.get("prefixLength", "0")),
                          field=self._field(el))

    def _b_RangeQuery(self, el):
        lo = el.get("lowerTerm")
        hi = el.get("upperTerm")
        return TermRangeQuery(
            lo.lower() if lo else None, hi.lower() if hi else None,
            include_lower=_bool_attr(el, "includeLower", True),
            include_upper=_bool_attr(el, "includeUpper", True),
            field=self._field(el))

    _b_TermRangeQuery = _b_RangeQuery

    def _b_PointRangeQuery(self, el):
        lo, hi = el.get("lowerTerm"), el.get("upperTerm")
        col = el.get("fieldName") or el.get("field")
        if not col:
            raise XMLParseError("PointRangeQuery needs fieldName")
        return NumericRangeQuery(
            col, float(lo) if lo is not None else None,
            float(hi) if hi is not None else None,
            include_lower=_bool_attr(el, "includeLower", True),
            include_upper=_bool_attr(el, "includeUpper", True))

    def _b_MatchAllDocsQuery(self, el):
        return MatchAllDocsQuery()

    # --- composite builders --------------------------------------------

    def _b_BooleanQuery(self, el):
        must, should, must_not, filt = [], [], [], []
        for c in self._children(el):
            if c.tag != "Clause":
                raise XMLParseError("BooleanQuery children must be <Clause>")
            occurs = (c.get("occurs") or "should").strip()
            subs = self._children(c)
            if len(subs) != 1:
                raise XMLParseError("Clause must hold exactly one query")
            q = self._build(subs[0])
            if q is None:
                continue
            buckets = {"must": must, "should": should,
                       "mustNot": must_not, "filter": filt}
            if occurs not in buckets:
                # CoreParser raises ParserException for unknown values;
                # silently demoting e.g. 'MUST' to should would flip a
                # required clause to optional
                raise XMLParseError(
                    f"unrecognised occurs value {occurs!r} "
                    "(expected must|should|mustNot|filter)")
            buckets[occurs].append(q)
        msm = int(el.get("minimumNumberShouldMatch", "0"))
        if not (must or should or must_not or filt):
            return None
        return BooleanQuery(must=tuple(must), should=tuple(should),
                            must_not=tuple(must_not), filter=tuple(filt),
                            min_should_match=msm)

    def _b_ConstantScoreQuery(self, el):
        from .query import ConstantScoreQuery
        subs = self._children(el)
        if len(subs) != 1:
            raise XMLParseError("ConstantScoreQuery holds one query")
        return ConstantScoreQuery(self._build(subs[0]),
                                  float(el.get("boost", "1.0")))

    def _b_DisjunctionMaxQuery(self, el):
        from .query import DisjunctionMaxQuery
        subs = [self._build(c) for c in self._children(el)]
        subs = [q for q in subs if q is not None]
        if not subs:
            return None
        return DisjunctionMaxQuery(tuple(subs),
                                   float(el.get("tieBreaker", "0.0")))

    def _b_SpanNear(self, el):
        terms = []
        for c in self._children(el):
            if c.tag != "SpanTerm":
                raise XMLParseError("SpanNear children must be <SpanTerm>")
            got = self.analyzer((c.text or "").strip())
            if len(got) != 1:
                raise XMLParseError("SpanTerm must analyze to one term")
            terms.append(got[0])
        return SpanNearQuery(tuple(terms), slop=int(el.get("slop", "0")),
                             in_order=_bool_attr(el, "inOrder", True),
                             field=self._field(el))

    _b_SpanNearQuery = _b_SpanNear


def parse_xml_query(xml: str, default_field: str = "text",
                    analyzer=None) -> Query:
    return XMLQueryParser(default_field, analyzer).parse(xml)
