"""Snowball stemmers vs the snowballstem.org conformance vocabularies
(public-domain golden data; the reference ships the same pairs as
``analysis/common/src/test/.../snowball/<lang>.zip``, consumed by
``TestSnowballVocab.java``). Implemented from the published algorithm
specs — every word of every shipped vocabulary must match."""

import os

import pytest

from lucene_ray.analysis.snowball import (
    SnowballStemFilter,
    danish_stem,
    dutch_stem,
    english_stem,
    finnish_stem,
    german_stem,
    hungarian_stem,
    italian_stem,
    norwegian_stem,
    portuguese_stem,
    romanian_stem,
    russian_stem,
    spanish_stem,
    swedish_stem,
)

_DATA = os.path.join(os.path.dirname(__file__), "data", "snowball")

_STEMMERS = {
    "german": german_stem,
    "swedish": swedish_stem,
    "norwegian": norwegian_stem,
    "danish": danish_stem,
    "spanish": spanish_stem,
    "russian": russian_stem,
    "italian": italian_stem,
    "portuguese": portuguese_stem,
    "dutch": dutch_stem,
    "romanian": romanian_stem,
    "hungarian": hungarian_stem,
    "finnish": finnish_stem,
    "english": english_stem,
}


@pytest.mark.parametrize("lang", sorted(_STEMMERS))
def test_full_vocabulary_conformance(lang):
    stem = _STEMMERS[lang]
    with open(os.path.join(_DATA, f"{lang}.voc.txt")) as f:
        voc = f.read().split()
    with open(os.path.join(_DATA, f"{lang}.out.txt")) as f:
        out = f.read().split()
    assert len(voc) == len(out) and len(voc) >= 1999
    bad = [(v, stem(v), o) for v, o in zip(voc, out) if stem(v) != o]
    assert not bad, f"{len(bad)} mismatches, first: {bad[:5]}"


def test_filter_plugs_into_chain(ray_session):
    from lucene_ray.analysis.stemmer import AnalyzerChain
    chain = AnalyzerChain(SnowballStemFilter(german_stem))
    assert chain("Die Zuhörers betrachten Drohungen") == \
        ["die", "zuhor", "betracht", "drohung"]
