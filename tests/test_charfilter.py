"""HTMLStripCharFilter conformance (charfilter/HTMLStripCharFilter.jflex
contract as encoded by TestHTMLStripCharFilter.java: inline elements
strip clean, block elements separate, script/style vanish with content,
entities decode) + the AnalyzerChain char-filter slot end-to-end."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from lucene_ray.analysis.charfilter import html_strip
from lucene_ray.analysis.stemmer import AnalyzerChain


def test_inline_elements_strip_without_separator():
    # TestHTMLStripCharFilter: inline elements leave no gap
    assert html_strip("find<b>jim</b>") == "findjim"
    assert html_strip("a<span class=x>b</span>c") == "abc"


def test_block_elements_become_separators():
    assert html_strip("one<p>two") == "one\ntwo"
    assert html_strip("a<br>b<br/>c") == "a\nb\nc"
    assert html_strip("<html><body>test</body></html>").strip() == "test"


def test_script_and_style_content_removed():
    s = "before<script type='text/javascript'>var x = '<p>';</script>after"
    assert html_strip(s) == "before\nafter"
    assert html_strip("a<style>p { color: red }</style>b") == "a\nb"


def test_entities_decode():
    # TestHTMLStripCharFilter.testEntities (gold transcribed)
    test = "&nbsp; &lt;foo&gt; &Uuml;bermensch &#61; &Gamma; bar &#x393;"
    gold = "  <foo> Übermensch = Γ bar Γ"
    assert html_strip(test) == gold


def test_comments_and_doctype_stripped():
    assert html_strip("hello<!-- a <b> comment -->world") == "helloworld"
    assert html_strip("<!DOCTYPE html>x<?php y ?>z") == "xz"


def test_cdata_markers_stripped_content_kept():
    assert html_strip("a<![CDATA[keep this]]>b") == "akeep thisb"


def test_bytes_input_decodes_utf8():
    assert html_strip("café <b>bar</b>".encode()) == "café bar"


def test_analyzer_chain_charfilter_slot():
    chain = AnalyzerChain(char_filters=(html_strip,))
    assert chain("<p>Hello <b>World</b></p>") == ["hello", "world"]
    # inline tags must not split tokens
    assert chain("find<b>jim</b>") == ["findjim"]


def test_end_to_end_build_over_html_column(ray_session, tmp_path_factory):
    """The input_hint's html:binary column indexed through the char
    filter: term stats equal those of the hand-stripped text."""
    from lucene_ray.index import build_index
    from lucene_ray.search import IndexReader, Searcher, TermQuery
    pages = [
        "<html><head><title>Alpha Page</title>"
        "<script>skip me entirely</script></head>"
        "<body><p>alpha beta</p><div>gamma</div></body></html>",
        "<p>beta &amp; delta</p><!-- hidden words -->",
        "plain text no markup alpha",
    ]
    t = pa.table({
        "doc_id": pa.array(np.arange(3, dtype=np.int64)),
        "html": pa.array([p.encode() for p in pages], pa.binary()),
    })
    d = tmp_path_factory.mktemp("html")
    pq.write_table(t, str(d / "pages.parquet"))
    build_index(str(d / "pages.parquet"), str(d / "idx"),
                text_col="html",
                analyzer=AnalyzerChain(char_filters=(html_strip,)))
    s = Searcher(IndexReader(str(d / "idx")))
    assert s.match_docs(TermQuery("alpha")).tolist() == [0, 2]
    assert s.match_docs(TermQuery("beta")).tolist() == [0, 1]
    assert s.match_docs(TermQuery("skip")).tolist() == []      # script
    assert s.match_docs(TermQuery("hidden")).tolist() == []    # comment
    assert s.match_docs(TermQuery("title")).tolist() == []
    assert s.match_docs(TermQuery("delta")).tolist() == [1]
