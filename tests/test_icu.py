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


def test_script_routing_end_to_end(ray_session, tmp_path):
    """Multilingual corpus indexed through the routing analyzer: one
    index answers term queries in four scripts."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from lucene_ray.analysis.icu import ScriptRoutingAnalyzer
    from lucene_ray.index import build_index
    from lucene_ray.search import IndexReader, Searcher, TermQuery
    sents = ["Café society in Paris", "我们在北京大学学习中文",
             "私は東京都に住む", "학생은 한국어를 공부했다",
             "mixed 北京 and tokyo texts"]
    p = str(tmp_path / "ml.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(len(sents), dtype=np.int64)),
        "text": pa.array(sents, pa.string())}), p)
    out = str(tmp_path / "mlidx")
    build_index(p, out, analyzer=ScriptRoutingAnalyzer(), batch_size=4)
    s = Searcher(IndexReader(out))
    assert s.search(TermQuery("cafe"), 5).doc_ids.tolist() == [0]
    assert sorted(s.search(TermQuery("北京"), 5).doc_ids.tolist()) == [1, 4]
    assert s.search(TermQuery("東京"), 5).doc_ids.tolist() == [2]
    assert s.search(TermQuery("한국어"), 5).doc_ids.tolist() == [3]
