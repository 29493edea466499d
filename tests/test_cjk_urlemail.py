"""CJK bigram filter/analyzer (cjk/CJKBigramFilter.java,
CJKAnalyzer.java semantics) and URL/email-preserving tokenization
(email/UAX29URLEmailTokenizer.java role)."""

import pyarrow as pa
import pytest

from lucene_ray.analysis import (
    CJKAnalyzer,
    CJKBigramFilter,
    UAX29URLEmailAnalyzer,
    tokenize_urlemail,
)
from lucene_ray.analysis.tokenizer import IDEOGRAPHIC


class TestCJKBigram:
    def test_han_hiragana_bigrams(self):
        # TestCJKBigramFilter.testHanOnly-style stream: every adjacent
        # pair of buffered CJK codepoints becomes one bigram
        out = CJKAnalyzer()("多くの学生が試験に落ちた")
        assert out == ["多く", "くの", "の学", "学生", "生が", "が試",
                       "試験", "験に", "に落", "落ち", "ちた"]

    def test_runs_contribute_every_codepoint(self):
        # Hangul/Katakana runs are multi-char tokens; bigrams span them
        assert CJKAnalyzer()("안녕하세요") == ["안녕", "녕하", "하세", "세요"]

    def test_non_cjk_passthrough_breaks_buffer(self):
        out = CJKAnalyzer()("中文 abc 字典")
        assert out == ["中文", "abc", "字典"]

    def test_isolated_char_emits_single_unigram(self):
        assert CJKAnalyzer()("一 word") == ["一", "word"]

    def test_output_unigrams_interleaves(self):
        assert CJKAnalyzer(output_unigrams=True)("中文字") == [
            "中", "中文", "文", "文字", "字"]

    def test_script_subset(self):
        # han-only: hiragana/katakana tokens pass through unbigram'd
        f = CJKBigramFilter(scripts={IDEOGRAPHIC})
        assert f.terms("中文とカナ") == ["中文", "と", "カナ"]

    def test_cross_script_bigram_when_enabled(self):
        assert CJKAnalyzer()("カナ中") == ["カナ", "ナ中"]

    def test_stop_filter_applies(self):
        assert CJKAnalyzer(stop_words={"abc"})("中文 ABC") == ["中文"]

    def test_analyze_batch_none(self):
        assert CJKAnalyzer().analyze_batch([None, "中文"]) == [[], ["中文"]]


class TestURLEmail:
    def _types(self, s):
        return [(t.text, t.type) for t in tokenize_urlemail(s)]

    def test_url_kept_whole(self):
        got = self._types("Visit https://example.com/path?q=1#top now")
        assert ("https://example.com/path?q=1#top", "<URL>") in got
        assert got[0] == ("Visit", "<ALPHANUM>")

    def test_email_kept_whole(self):
        got = self._types("mail john.doe+x@sub.example.co.uk please")
        assert ("john.doe+x@sub.example.co.uk", "<EMAIL>") in got

    def test_quoted_local_part(self):
        got = self._types('"john the dev"@example.com wrote')
        assert got[0] == ('"john the dev"@example.com', "<EMAIL>")

    def test_trailing_punct_trimmed(self):
        got = self._types("go to http://x.io/a, or www.test.org.")
        texts = [t for t, ty in got if ty == "<URL>"]
        assert texts == ["http://x.io/a", "www.test.org"]

    def test_wiki_parens_balanced(self):
        got = self._types("(see http://en.wikipedia.org/wiki/Foo_(bar)) ok")
        assert ("http://en.wikipedia.org/wiki/Foo_(bar)", "<URL>") in got

    def test_port_and_ftp(self):
        got = self._types("ftp://files.example.org:2121/pub stuff")
        assert got[0] == ("ftp://files.example.org:2121/pub", "<URL>")

    def test_gap_text_standard_rules(self):
        got = self._types("can't reach a@b.co via 3.14 paths")
        texts = [t for t, _ in got]
        assert "can't" in texts and "3.14" in texts and "a@b.co" in texts

    def test_no_spans_matches_standard(self):
        from lucene_ray.analysis import StandardAnalyzer
        s = "plain text only, nothing special 42 times"
        assert UAX29URLEmailAnalyzer()(s) == StandardAnalyzer()(s)

    def test_analyzer_lowercases_urls(self):
        out = UAX29URLEmailAnalyzer()("HTTP://EXample.COM/Path here")
        assert out[0] == "http://example.com/path"

    def test_overlong_span_skipped(self):
        url = "http://x.io/" + "a" * 300
        out = tokenize_urlemail(f"pre {url} post", max_token_length=255)
        texts = [t.text for t in out]
        assert "pre" in texts and "post" in texts
        assert not any(t.type == "<URL>" for t in out)


class TestIndexIntegration:
    def test_build_with_cjk_analyzer(self, ray_session, tmp_path):
        """End-to-end: CJKAnalyzer plugged into build_index, bigram
        terms searchable; isolated chars searchable as unigrams."""
        import pyarrow.parquet as pq
        from lucene_ray.index import build_index
        from lucene_ray.search import IndexReader, Searcher, TermQuery

        docs = pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["多くの学生", "学生 abc", "abc def"]),
        })
        src = str(tmp_path / "docs.parquet")
        pq.write_table(docs, src)
        idx = str(tmp_path / "idx")
        build_index(src, idx, batch_size=10, analyzer=CJKAnalyzer())
        s = Searcher(IndexReader(idx))
        assert set(s.search(TermQuery("学生"), k=10).doc_ids.tolist()) == {0, 1}
        assert set(s.search(TermQuery("abc"), k=10).doc_ids.tolist()) == {1, 2}
        # single-codepoint unigram never produced when inside a run
        assert s.count(TermQuery("学")) == 0

    def test_build_with_urlemail_analyzer(self, ray_session, tmp_path):
        import pyarrow.parquet as pq
        from lucene_ray.index import build_index
        from lucene_ray.search import IndexReader, Searcher, TermQuery

        docs = pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["reach me at dev@example.com now",
                              "docs at https://example.com/docs today"]),
        })
        src = str(tmp_path / "docs.parquet")
        pq.write_table(docs, src)
        idx = str(tmp_path / "idx")
        build_index(src, idx, batch_size=10,
                    analyzer=UAX29URLEmailAnalyzer())
        s = Searcher(IndexReader(idx))
        assert s.search(TermQuery("dev@example.com"),
                        k=10).doc_ids.tolist() == [0]
        assert s.search(TermQuery("https://example.com/docs"),
                        k=10).doc_ids.tolist() == [1]
        # the host fragment alone is NOT a term (span stayed whole)
        assert s.count(TermQuery("example.com")) == 0
