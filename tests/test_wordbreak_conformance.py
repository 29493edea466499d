"""Exhaustive conformance against the reference's generated Unicode
12.1 word-break and emoji tokenization suites (1821 + 4022 cases).
Skipped when the reference checkout is unavailable."""

import os

import pytest

WB = ("/root/reference/lucene/test-framework/src/java/org/apache/lucene/"
      "tests/analysis/standard/WordBreakTestUnicode_12_1_0.java")
EMOJI = ("/root/reference/lucene/test-framework/src/java/org/apache/lucene/"
         "tests/analysis/standard/EmojiTokenizationTestUnicode_12_1.java")


@pytest.mark.skipif(not os.path.exists(WB), reason="reference not available")
def test_wordbreak_suite_100_percent():
    from tools.wordbreak_conformance import load_cases
    from lucene_ray.analysis import tokenize
    cases = load_cases(WB)
    assert len(cases) > 1800
    fails = [(t, e, [x.text for x in tokenize(t)])
             for t, e in cases if [x.text for x in tokenize(t)] != e]
    assert fails == []


@pytest.mark.skipif(not os.path.exists(EMOJI), reason="reference not available")
def test_emoji_suite_100_percent():
    from tools.wordbreak_conformance import load_emoji_cases
    from lucene_ray.analysis import tokenize
    cases = load_emoji_cases(EMOJI)
    assert len(cases) > 4000
    fails = [(t, e, [x.text for x in tokenize(t)])
             for t, e in cases if [x.text for x in tokenize(t)] != e]
    assert fails == []
