"""ICU folding / normalization / script-run roles."""

from lucene_ray.analysis.icu import (ICUFoldingFilter,
                                     ICUNormalizer2Filter, icu_fold,
                                     nfkc_cf, script_runs)


def test_fold_accents_and_case():
    assert icu_fold("Café") == "cafe"
    assert icu_fold("ÀÉÎÕÜ") == "aeiou"
    assert icu_fold("Ǆungla") == "dzungla"     # compat digraph + case
    assert icu_fold("ｆｕｌｌｗｉｄｔｈ") == "fullwidth"  # width fold
    assert icu_fold("Straße") == "strasse"     # case fold expands ß
    assert icu_fold("ΣΊΣΥΦΟΣ") == "σισυφοσ"    # final sigma folds


def test_nfkc_cf():
    assert nfkc_cf("Ⅻ") == "xii"  # roman numeral compat + fold
    assert nfkc_cf("Ａｂｃ") == "abc"


def test_filters():
    f = ICUFoldingFilter()
    assert f(["Crème", "BRÛLÉE"]) == ["creme", "brulee"]
    n = ICUNormalizer2Filter()
    assert n(["ﬁle"]) == ["file"]  # fi ligature


def test_script_runs():
    text = "abcĐ積んでおく123хлеб"
    runs = script_runs(text)
    # Đ is LATIN; 123 (COMMON) attaches to the active HIRAGANA run
    assert runs == [(0, 4, "LATIN"), (4, 5, "HAN"),
                    (5, 12, "HIRAGANA"), (12, 16, "CYRILLIC")]
    assert text[5:12] == "んでおく123"
    # offsets tile the string
    assert runs[0][0] == 0 and runs[-1][1] == len(text)
    assert all(r1[1] == r2[0] for r1, r2 in zip(runs, runs[1:]))


def test_script_runs_empty_and_common_only():
    assert script_runs("") == []
    assert script_runs("123 456") == [(0, 7, "COMMON")]


def test_script_routing_analyzer():
    from lucene_ray.analysis.icu import ScriptRoutingAnalyzer
    a = ScriptRoutingAnalyzer()
    got = a("Café 北京大学 서울에 すもももももも")
    # latin folded; Han via the zh lattice; Hangul via ko (josa
    # dropped); kana via ja (particles dropped)
    assert "cafe" in got
    assert "北京" in got and "大学" in got
    assert "서울" in got and "에" not in got
    assert "すもも" in got and "もも" in got
    assert a("") == []
