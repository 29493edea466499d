"""Query-time synonym graph analysis.

Reference semantics: ``SynonymGraphFilter``
(``lucene/analysis/common/src/java/org/apache/lucene/analysis/synonym/
SynonymGraphFilter.java``, tests ``TestSynonymGraphFilter.java``)
consumed at query time via ``util/QueryBuilder.java``
``analyzeGraphBoolean`` / ``analyzeGraphPhrase`` (tests
``queryparser/.../TestQueryParser.java`` synonym cases): when the query
analyzer's output is a token GRAPH (stacked synonyms, possibly
multi-word), a bare term atom becomes a disjunction over graph paths
(single-token path -> TermQuery, multi-token path -> PhraseQuery) and a
quoted phrase becomes a disjunction of phrase paths.

Here the graph is represented directly as its articulation-point
decomposition — a list of SPANS, each span a list of alternative term
paths — because the side paths a synonym map introduces always rejoin
the base stream at match boundaries (exactly QueryBuilder's
articulation points). This keeps path enumeration local to a span and
bounded.
"""

from __future__ import annotations

from .analyzer import StandardAnalyzer


class SynonymGraphAnalyzer:
    """Analysis chain whose query-side output is a synonym graph.

    ``synonyms``: dict mapping a phrase (space-separated string) to a
    list of synonym phrases; both sides are analyzed with the base
    chain at construction. Matching is greedy-longest over the base
    token stream, originals are kept (SynonymGraphFilter expand mode).

    ``__call__`` returns the BASE terms (no expansion) — index-side
    expansion stays the job of ``SynonymFilter``; this class is the
    query side of the pair.
    """

    def __init__(self, synonyms: dict, base=None, stop_words=frozenset()):
        self._std = base or StandardAnalyzer(stop_words=stop_words)
        self.stop_words = getattr(self._std, "stop_words", frozenset())
        self.max_token_length = getattr(self._std, "max_token_length", 255)
        self.map: dict[tuple, list[tuple]] = {}
        for src, dsts in synonyms.items():
            key = tuple(self._std(src))
            if not key:
                continue
            outs = [tuple(self._std(d)) for d in
                    (dsts if isinstance(dsts, (list, tuple, set)) else [dsts])]
            outs = [o for o in outs if o]
            if outs:
                self.map.setdefault(key, []).extend(outs)
        self.max_key_len = max((len(k) for k in self.map), default=1)

    def __call__(self, text: str) -> list[str]:
        return self._std(text)

    def analyze_batch(self, texts):
        return [self(t or "") for t in texts]

    def analyze_spans(self, text: str) -> list[list[tuple[str, ...]]]:
        """Greedy longest-match scan -> list of spans; each span is the
        list of alternative paths through that graph region (original
        path first)."""
        terms = self._std(text)
        spans: list[list[tuple[str, ...]]] = []
        i, n = 0, len(terms)
        while i < n:
            matched = None
            for ln in range(min(self.max_key_len, n - i), 0, -1):
                key = tuple(terms[i:i + ln])
                if key in self.map:
                    matched = (ln, self.map[key])
                    break
            if matched is None:
                spans.append([(terms[i],)])
                i += 1
            else:
                ln, outs = matched
                alts = [tuple(terms[i:i + ln])]
                for o in outs:
                    if o not in alts:
                        alts.append(o)
                spans.append(alts)
                i += ln
        return spans
