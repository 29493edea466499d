"""Naive-Bayes + kNN classifiers vs plain-Python oracles."""

import math
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.pipelines.classify import (
    classify_naive_bayes, classify_knn, train_naive_bayes,
)


@pytest.fixture(scope="module")
def cls_corpus(ray_session, tmp_path_factory):
    # class-discriminative vocab + shared noise words
    rng = np.random.default_rng(11)
    class_words = {"aa": ["apple", "avocado"], "bb": ["banana", "berry"],
                   "cc": ["cherry", "citrus"]}
    noise = ["the", "of", "and", "data"]
    texts, langs = [], []
    for i in range(240):
        c = ["aa", "bb", "cc"][i % 3]
        words = list(rng.choice(class_words[c], 6)) + \
            list(rng.choice(noise, 4))
        rng.shuffle(words)
        texts.append(" ".join(words))
        langs.append(c)
    d = tmp_path_factory.mktemp("classify")
    path = str(d / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(240, dtype=np.int64)),
        "text": pa.array(texts), "lang": pa.array(langs)}), path)
    return path, texts, langs


def _brute_nb(texts, langs, query_tokens):
    classes = sorted(set(langs))
    tf = {c: Counter() for c in classes}
    for t, c in zip(texts, langs):
        tf[c].update(t.split())
    vocab = set()
    for t in texts:
        vocab.update(t.split())
    V = len(vocab)
    pri = Counter(langs)
    n = len(texts)
    best, bs = None, -math.inf
    for c in classes:
        tot = sum(tf[c].values())
        s = math.log(pri[c] / n)
        for w in query_tokens:
            s += math.log(tf[c].get(w, 0) + 1) - math.log(tot + V)
        if s > bs:
            best, bs = c, s
    return best


def test_nb_matches_brute_and_is_accurate(cls_corpus):
    path, texts, langs = cls_corpus
    got = classify_naive_bayes(path, max_doc_id=60).to_pylist()
    assert len(got) == 60
    correct = 0
    for r in got:
        i = r["doc_id"]
        assert r["pred"] == _brute_nb(texts, langs, texts[i].split())
        correct += r["pred"] == langs[i]
    # discriminative corpus -> classifier must actually work
    assert correct >= 58


def test_nb_model_shapes(cls_corpus):
    path, texts, langs = cls_corpus
    m = train_naive_bayes(path)
    assert m.classes == ["aa", "bb", "cc"]
    V = len({w for t in texts for w in t.split()})
    assert m.log_tf1.shape == (3, V)
    # class totals recoverable: exp(log_denom) - V == token totals
    tot = np.exp(m.log_denom) - V
    want = Counter()
    for t, c in zip(texts, langs):
        want[c] += len(t.split())
    assert np.allclose(tot, [want["aa"], want["bb"], want["cc"]])


def test_knn_classifier_accuracy(cls_corpus):
    path, texts, langs = cls_corpus
    ids = list(range(30))
    got = classify_knn(path, ids, k=9)
    preds = {r["doc_id"]: r["pred"] for r in got.to_pylist()}
    correct = sum(preds[i] == langs[i] for i in ids)
    assert correct >= 28  # neighbours share class-specific vocab
