"""Per-language analyzer presets — the analysis/common language
packages' role (``lucene/analysis/common/src/java/org/apache/lucene/
analysis/{de,fr,es,...}/*Analyzer.java``): snowball stop list +
snowball stemmer behind one constructor.

Stop lists are the BSD-licensed snowballstem.org lists the reference
ships under ``analysis/common/src/resources/.../snowball/*_stop.txt``
(format: one word at line start, ``|`` comments), vendored under
``stopwords/`` so the package stands alone.
"""

from __future__ import annotations

import os
from functools import lru_cache

_STOP_DIR = os.path.join(os.path.dirname(__file__), "stopwords")

_STEMMERS = {
    "da": "danish", "de": "german", "en": "english", "es": "spanish",
    "fi": "finnish", "hu": "hungarian", "it": "italian",
    "nl": "dutch", "no": "norwegian", "pt": "portuguese",
    "ro": "romanian", "ru": "russian", "sv": "swedish",
    "tr": "turkish", "ga": "irish", "ne": "nepali",
}
_STOP_FILES = {**{k: v for k, v in _STEMMERS.items()},
               "fr": "french", "id": "indonesian"}


@lru_cache(maxsize=None)
def stop_words(lang: str) -> frozenset:
    """Snowball-format stop list for a language code (or full name)."""
    name = _STOP_FILES.get(lang, lang)
    path = os.path.join(_STOP_DIR, f"{name}_stop.txt")
    if not os.path.exists(path):
        raise KeyError(f"no stop list for {lang!r}")
    out = set()
    with open(path, encoding="utf-8") as f:
        for line in f:
            word = line.split("|", 1)[0].strip().split()
            if word:
                out.add(word[0])
    return frozenset(out)


def stemmer_for(lang: str):
    """The language's snowball stemmer callable (KeyError if absent)."""
    from . import snowball
    name = _STEMMERS.get(lang, lang)
    fn = getattr(snowball, f"{name}_stem", None)
    if fn is None:
        raise KeyError(f"no snowball stemmer for {lang!r}")
    return fn


def language_analyzer(lang: str, *, use_stop_words: bool = True,
                      char_filters: tuple = ()):
    """StandardTokenizer -> [stop filter] -> snowball stemmer chain
    (the GermanAnalyzer/FrenchAnalyzer/... constructor shape)."""
    from .snowball import SnowballStemFilter as _SF
    from .stemmer import AnalyzerChain
    stops = stop_words(lang) if use_stop_words else frozenset()
    try:
        filters = (_SF(stemmer_for(lang)),)
    except KeyError:
        filters = ()
    return AnalyzerChain(*filters, stop_words=stops,
                         char_filters=char_filters)
