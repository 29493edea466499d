"""Chinese segmentation (smartcn role) over the shared lattice."""

from lucene_ray.analysis.chinese import ChineseAnalyzer, ChineseTokenizer


def surf(t, s):
    return [x.surface for x in t.tokenize(s)]


def test_lattice_segmentation():
    t = ChineseTokenizer(mode="normal")
    assert surf(t, "我们在北京大学学习中文") == \
        ["我们", "在", "北京大学", "学习", "中文"]
    assert surf(t, "今天天气很好") == ["今天", "天气", "很好"]


def test_search_mode_decompounds():
    tn = ChineseTokenizer(mode="normal")
    ts = ChineseTokenizer(mode="search")
    assert surf(tn, "中华人民共和国") == ["中华人民共和国"]
    assert surf(ts, "中华人民共和国") == ["中华", "人民", "共和国"]
    assert surf(ts, "北京大学") == ["北京", "大学"]


def test_oov_falls_back_to_single_chars():
    t = ChineseTokenizer()
    out = surf(t, "鲲鹏")  # not in the mini lexicon
    assert out == ["鲲", "鹏"]


def test_analyzer():
    a = ChineseAnalyzer()
    assert a("我们在北京大学学习中文 hello") == \
        ["我们", "北京", "大学", "学习", "中文", "hello"]
    assert a("") == []
