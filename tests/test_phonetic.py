"""Soundex (NARA) + Metaphone (Philips 1990) conformance."""

import pytest

from lucene_ray.analysis.phonetic import PhoneticFilter, metaphone, soundex


# the canonical NARA coding examples (the same rule set commons-codec's
# US_ENGLISH Soundex implements, incl. H/W transparency)
@pytest.mark.parametrize("word,code", [
    ("Robert", "R163"), ("Rupert", "R163"),
    ("Ashcraft", "A261"), ("Ashcroft", "A261"),   # H-transparency
    ("Tymczak", "T522"),                           # CZ same-code collapse
    ("Pfister", "P236"),                           # first-letter collapse
    ("Jackson", "J250"), ("Washington", "W252"),
    ("Lee", "L000"), ("Gutierrez", "G362"),
    ("Honeyman", "H555"),                          # vowels break runs
    ("", ""),
])
def test_soundex_golden(word, code):
    assert soundex(word) == code


def test_soundex_case_and_punct_insensitive():
    assert soundex("o'brien") == soundex("OBrien") == soundex("O'BRIEN")


# hand-derived from the published rule set (documented in phonetic.py)
@pytest.mark.parametrize("word,code", [
    ("metaphone", "MTFN"),    # PH->F
    ("Xavier", "SFR"),        # initial X->S, V->F
    ("school", "SKL"),        # SCH->K
    ("knight", "NT"),         # initial KN->N, silent GH
    ("wright", "RT"),         # initial WR->R
    ("phone", "FN"),
    ("church", "XRX"),        # CH->X
    ("science", "SSNS"),      # CE/CI->S
    ("dumb", "TM"),           # terminal MB->M
    ("quick", "KK"),          # Q->K, CK->K
    ("judge", "JJ"),          # DGE->J
    ("aero", "ER"),           # initial AE->E
    ("thought", "0T"),        # TH->theta, silent GH
    ("", ""),
])
def test_metaphone_golden(word, code):
    assert metaphone(word) == code


@pytest.mark.parametrize("a,b", [
    ("Smith", "Smyth"), ("wright", "rite"), ("phish", "fish"),
])
def test_metaphone_homophones(a, b):
    assert metaphone(a) == metaphone(b)


def test_phonetic_filter_inject_and_replace():
    inj = PhoneticFilter("metaphone", inject=True)
    assert inj(["smith", "the"]) == ["smith", "sm0", "the", "0"]
    rep = PhoneticFilter("soundex", inject=False)
    assert rep(["robert"]) == ["r163"]


def test_phonetic_in_analyzer_chain():
    from lucene_ray.analysis.stemmer import AnalyzerChain
    chain = AnalyzerChain(PhoneticFilter("metaphone", inject=True))
    toks = chain("Smith writes")
    assert "smith" in toks and "sm0" in toks
