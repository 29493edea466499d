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
    german2_stem,
    german_stem,
    lovins_stem,
    hungarian_stem,
    italian_stem,
    norwegian_stem,
    portuguese_stem,
    romanian_stem,
    russian_stem,
    spanish_stem,
    swedish_stem,
    turkish_stem,
    irish_stem,
    nepali_stem,
)

_DATA = os.path.join(os.path.dirname(__file__), "data", "snowball")

_STEMMERS = {
    "german": german_stem,
    "german2": german2_stem,
    "lovins": lovins_stem,
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
    "turkish": turkish_stem,
    "irish": irish_stem,
    "nepali": nepali_stem,
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


def test_language_analyzer_presets(ray_session):
    from lucene_ray.analysis.lang import language_analyzer, stop_words
    assert "und" in stop_words("de") and "dans" in stop_words("fr")
    assert language_analyzer("de")(
        "Die Zuhörers betrachten die Drohungen") == \
        ["zuhor", "betracht", "drohung"]
    assert language_analyzer("ru")("новости читают люди") == \
        ["новост", "чита", "люд"]
    # no stemmer for fr in this set: stop filtering still applies
    assert language_analyzer("fr")("les chats et les chiens") == \
        ["chats", "chiens"]


def test_language_analyzer_indexes_end_to_end(ray_session,
                                              tmp_path_factory):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_ray.analysis.lang import language_analyzer
    from lucene_ray.index import build_index
    from lucene_ray.search import IndexReader, Searcher, TermQuery
    texts = ["die drohungen wachsen", "eine drohung bleibt",
             "ganz andere worte"]
    t = pa.table({"doc_id": pa.array(np.arange(3, dtype=np.int64)),
                  "text": pa.array(texts)})
    d = tmp_path_factory.mktemp("lang")
    pq.write_table(t, str(d / "docs.parquet"))
    build_index(str(d / "docs.parquet"), str(d / "idx"),
                analyzer=language_analyzer("de"))
    s = Searcher(IndexReader(str(d / "idx")))
    # singular and plural collapse to one stem; stop word gone
    assert s.match_docs(TermQuery("drohung")).tolist() == [0, 1]
    assert s.match_docs(TermQuery("die")).tolist() == []
