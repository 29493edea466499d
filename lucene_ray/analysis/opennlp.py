"""OpenNLP-module roles (``lucene/analysis/opennlp/src/java/org/apache/
lucene/analysis/opennlp/``): sentence detection (OpenNLPSentenceBreak
Iterator / OpenNLPTokenizer sentence pass), per-sentence POS tagging
(OpenNLPPOSFilter — tags ride the token TYPE slot), lemmatization
(OpenNLPLemmatizerFilter: dictionary first, tagger-model fallback) and
chunking (OpenNLPChunkerFilter).

The reference wires trained MaxEnt models (opennlp-tools .bin files);
no models are shippable offline, so each op takes a MODEL CALLABLE —
the same pluggable-model pattern as the multimodal decoders — and
ships a deterministic rule-based default clearly marked as such:
sentence detection is fully real (terminator scan with an abbreviation
list and trailing-close handling); the default POS tagger is a
documented suffix/shape heuristic; the default lemmatizer is
dictionary-only. A real model plugs in as ``model=lambda tokens:
tags`` with no other change.
"""

from __future__ import annotations

from dataclasses import dataclass

# common sentence-internal abbreviations (the sentence model's role of
# suppressing false terminators)
_ABBREVIATIONS = frozenset("""
mr mrs ms dr prof sr jr st no vs etc e.g i.e u.s a.m p.m inc ltd co
fig vol pp cf al
""".split())

_TERMINATORS = frozenset(".!?")
_CLOSERS = frozenset("\"')]}’”")


def detect_sentences(text: str) -> list[tuple[int, int]]:
    """(start, end) character spans of sentences — the
    OpenNLPSentenceBreakIterator role: break after . ! ? (plus any
    trailing quotes/brackets), unless the dot ends a known
    abbreviation, a single initial, or sits inside a number."""
    spans = []
    n = len(text)
    start = 0
    i = 0
    while i < n:
        c = text[i]
        if c in _TERMINATORS:
            if c == ".":
                # number-internal dot (3.14) never terminates
                if 0 < i < n - 1 and text[i - 1].isdigit() \
                        and text[i + 1].isdigit():
                    i += 1
                    continue
                j = i - 1
                while j >= 0 and not text[j].isspace():
                    j -= 1
                word = text[j + 1:i].lower()
                if word.rstrip(".") in _ABBREVIATIONS or \
                        (len(word) == 1 and word.isalpha()):
                    i += 1
                    continue
            k = i + 1
            while k < n and text[k] in _CLOSERS:
                k += 1
            # require whitespace-or-end after the terminator run
            if k < n and not text[k].isspace():
                i += 1
                continue
            spans.append((start, k))
            while k < n and text[k].isspace():
                k += 1
            start = k
            i = k
        else:
            i += 1
    if start < n and text[start:].strip():
        spans.append((start, n))
    return spans


def _heuristic_pos(tokens: list[str]) -> list[str]:
    """Deterministic suffix/shape POS fallback (Penn-style tags) —
    a DOCUMENTED STAND-IN for a trained tagger, not a model."""
    out = []
    for i, t in enumerate(tokens):
        low = t.lower()
        if not t or not t[0].isalnum():
            out.append(".")
        elif t[0].isdigit():
            out.append("CD")
        elif low in ("the", "a", "an"):
            out.append("DT")
        elif low in ("is", "are", "was", "were", "be", "been", "am"):
            out.append("VBZ" if low == "is" else "VB")
        elif low in ("in", "on", "at", "of", "to", "for", "with", "by"):
            out.append("IN")
        elif low in ("and", "or", "but"):
            out.append("CC")
        elif low.endswith("ly"):
            out.append("RB")
        elif low.endswith("ing"):
            out.append("VBG")
        elif low.endswith("ed"):
            out.append("VBD")
        elif low.endswith("s") and len(low) > 3:
            out.append("NNS")
        elif t[0].isupper() and i > 0:
            out.append("NNP")
        else:
            out.append("NN")
    return out


@dataclass(frozen=True)
class TaggedToken:
    term: str
    type: str        # POS tag (the TypeAttribute slot)
    sentence: int    # SentenceAttribute role


class OpenNLPPOSFilter:
    """OpenNLPPOSFilter.java role: tag SENTENCE AT A TIME (the model
    sees one sentence's tokens together) and carry the tag in the
    token type. ``model``: callable tokens -> tags; default heuristic
    documented above."""

    def __init__(self, model=None):
        self.model = model or _heuristic_pos

    def tag_text(self, text: str) -> list[TaggedToken]:
        from .analyzer import StandardAnalyzer
        an = StandardAnalyzer()
        out = []
        for si, (lo, hi) in enumerate(detect_sentences(text)):
            toks = an(text[lo:hi])
            for term, tag in zip(toks, self.model(toks)):
                out.append(TaggedToken(term, tag, si))
        return out

    def __call__(self, terms: list[str]) -> list[str]:
        # chain form: terms pass through; tags available via tag_text
        return list(terms)


class OpenNLPLemmatizerFilter:
    """OpenNLPLemmatizerFilter.java role: dictionary lemmas first
    (form[_tag] -> lemma), optional model callable as fallback,
    pass-through on miss."""

    def __init__(self, dictionary: dict[str, str] | None = None,
                 model=None):
        self.dictionary = dictionary or {}
        self.model = model

    def __call__(self, terms: list[str]) -> list[str]:
        out = []
        for t in terms:
            lemma = self.dictionary.get(t)
            if lemma is None and self.model is not None:
                lemma = self.model(t)
            out.append(lemma if lemma else t)
        return out


class OpenNLPChunkerFilter:
    """OpenNLPChunkerFilter.java role: per-sentence chunk labels
    (B-NP/I-NP/B-VP/...) from POS tags; default chunker groups
    determiner/adjective/noun runs into NPs and verb runs into VPs —
    a documented stand-in for the trained chunker model."""

    def __init__(self, pos_model=None, model=None):
        self.pos = OpenNLPPOSFilter(pos_model)
        self.model = model or self._heuristic_chunks

    @staticmethod
    def _heuristic_chunks(tags: list[str]) -> list[str]:
        out = []
        prev = "O"
        for tag in tags:
            if tag in ("DT", "JJ", "NN", "NNS", "NNP", "CD"):
                out.append("I-NP" if prev == "NP" else "B-NP")
                prev = "NP"
            elif tag.startswith("VB"):
                out.append("I-VP" if prev == "VP" else "B-VP")
                prev = "VP"
            else:
                out.append("O")
                prev = "O"
        return out

    def chunk_text(self, text: str) -> list[TaggedToken]:
        tagged = self.pos.tag_text(text)
        out = []
        i = 0
        while i < len(tagged):
            j = i
            while j < len(tagged) and tagged[j].sentence == \
                    tagged[i].sentence:
                j += 1
            chunks = self.model([t.type for t in tagged[i:j]])
            for t, ch in zip(tagged[i:j], chunks):
                out.append(TaggedToken(t.term, ch, t.sentence))
            i = j
        return out
