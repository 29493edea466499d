"""Property tests: the vectorized Gopher kernel against a slow
pure-python reference, and 3-term ordered intervals against brute
enumeration (hypothesis-driven)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_ray.pipelines.webtext import ENGLISH_STOP_WORDS, GopherQuality

WORDS = ["a", "the", "cat", "dog", "xx", "spark", "merge", "b", "zz9"]
texts_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=30)
    .map(" ".join),
    min_size=1, max_size=8)


def _ref_gopher(text):
    toks = [t for t in text.split(" ") if t]
    n = len(toks)
    chars = sum(len(t) for t in toks)
    alpha = sum(1 for t in toks if any(c.isalpha() and c.isascii()
                                       for c in t) or any(
        "a" <= c.lower() <= "z" for c in t))
    stop = sum(1 for t in toks if t in set(ENGLISH_STOP_WORDS))

    def ngram_stats(width):
        grams = {}
        for i in range(n - width + 1):
            g = tuple(toks[i:i + width])
            grams[g] = grams.get(g, 0) + 1
        if not grams:
            return 0, 0, 0
        top = max(grams.values())
        top_chars = max(c * (sum(len(w) for w in g) + width - 1)
                        for g, c in grams.items() if c == top)
        dup = sum(c * (sum(len(w) for w in g) + width - 1)
                  for g, c in grams.items() if c >= 2)
        return top, top_chars, dup

    t2, t2c, d2 = ngram_stats(2)
    _, _, d5 = ngram_stats(5)
    return dict(n_words=n, word_chars=chars, n_alpha_words=alpha,
                n_stop_words=stop, top2gram_count=t2, top2gram_chars=t2c,
                dup2gram_chars=d2, dup5gram_chars=d5)


@settings(max_examples=120, deadline=None)
@given(texts_strategy)
def test_gopher_kernel_matches_reference(texts):
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = GopherQuality()(t).to_pylist()
    for row, text in zip(out, texts):
        want = _ref_gopher(text)
        for k, v in want.items():
            assert row[k] == v, (k, text, row[k], v)


@settings(max_examples=120, deadline=None)
@given(st.lists(st.sampled_from(["a", "b", "c", "x"]),
                min_size=3, max_size=24))
def test_ordered_three_terms_brute(toks):
    from lucene_ray.search.intervals import Ordered, Term
    arr = np.asarray(toks)
    pos = {w: np.flatnonzero(arr == w).astype(np.int64)
           for w in ("a", "b", "c")}
    iv = Ordered((Term("a"), Term("b"), Term("c"))).intervals(pos)
    # brute: greedy chain per a-start, then minimality
    cands = []
    for s in pos["a"]:
        nb = pos["b"][pos["b"] > s]
        if not len(nb):
            continue
        nc = pos["c"][pos["c"] > nb[0]]
        if not len(nc):
            continue
        cands.append((int(s), int(nc[0])))
    minimal = [iv1 for iv1 in sorted(set(cands))
               if not any(s2 >= iv1[0] and e2 <= iv1[1] and (s2, e2) != iv1
                          for s2, e2 in set(cands))]
    assert [tuple(r) for r in iv.tolist()] == sorted(minimal)
