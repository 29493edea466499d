"""Korean morphological analysis (nori role) — same lattice engine as
the Japanese module over a Korean mini lexicon."""

from lucene_ray.analysis.korean import (KoreanAnalyzer, KoreanTokenizer,
                                        mini_dictionary_ko)


def surf(t, s):
    return [x.surface for x in t.tokenize(s) if x.surface.strip()]


def test_josa_splits():
    t = KoreanTokenizer()
    assert surf(t, "서울에") == ["서울", "에"]
    assert surf(t, "학생은 한국어를 공부했다") == \
        ["학생", "은", "한국어", "를", "공부", "했다"]


def test_verb_endings():
    t = KoreanTokenizer()
    assert surf(t, "친구와 김치를 먹었다") == \
        ["친구", "와", "김치", "를", "먹", "었", "다"]


def test_pos_tags():
    t = KoreanTokenizer()
    toks = [x for x in t.tokenize("서울에") if x.surface.strip()]
    assert [x.pos for x in toks] == ["NNG", "J"]


def test_analyzer_drops_particles():
    a = KoreanAnalyzer()
    assert a("학생은 한국어를 공부했다 Seoul") == \
        ["학생", "한국어", "공부", "seoul"]
    assert a("") == []
    kept = KoreanAnalyzer(keep_particles=True)("서울에")
    assert kept == ["서울", "에"]


def test_unknown_hangul_survives():
    a = KoreanAnalyzer()
    out = a("블록체인 기술")  # not in the mini lexicon
    assert "".join(out).replace(" ", "") != ""
    assert all(tok.strip() for tok in out)
