"""Driver-memory bounds for the corpus-LM ops (VERDICT r3 items 2-3):
surprisal_topk and train_naive_bayes must never pull the full
vocabulary to the driver — both cap at top_v terms (with OOV floors /
full-|V| smoothing kept exact via distributed aggregates)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def corpus(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("boundcorpus")
    rng = np.random.default_rng(7)
    # Zipf-ish vocab of ~2000 terms over 600 docs, 2 "languages"
    vocab = np.array([f"t{i:04d}" for i in range(2000)])
    probs = 1.0 / np.arange(1, 2001)
    probs /= probs.sum()
    texts, langs = [], []
    for i in range(600):
        n = rng.integers(20, 60)
        texts.append(" ".join(rng.choice(vocab, n, p=probs)))
        langs.append("aa" if i % 2 == 0 else "bb")
    p = os.path.join(d, "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(600, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    }), p)
    return p


def test_nb_vocab_capped_but_smoothing_exact(corpus):
    from lucene_ray.pipelines.classify import train_naive_bayes
    full = train_naive_bayes(corpus, "lang")
    capped = train_naive_bayes(corpus, "lang", top_v=300)
    # the driver-side model holds at most top_v terms
    assert len(capped.vocab) <= 300
    assert len(full.vocab) > 300
    # smoothing denominator still uses the FULL |V| and FULL class
    # token totals -> identical to the uncapped model's
    np.testing.assert_allclose(capped.log_denom, full.log_denom)
    np.testing.assert_allclose(capped.log_prior, full.log_prior)
    # kept terms carry identical weights
    pos = np.searchsorted(full.vocab, capped.vocab)
    np.testing.assert_allclose(capped.log_tf1,
                               full.log_tf1[:, pos])


def test_nb_exact_when_vocab_fits(corpus):
    from lucene_ray.pipelines.classify import train_naive_bayes
    full = train_naive_bayes(corpus, "lang")
    wide = train_naive_bayes(corpus, "lang", top_v=10_000)
    np.testing.assert_array_equal(full.vocab, wide.vocab)
    np.testing.assert_allclose(full.log_tf1, wide.log_tf1)


def test_surprisal_capped_still_ranks(corpus):
    from lucene_ray.pipelines.webtext import surprisal_topk
    full = surprisal_topk(corpus, 10)
    capped = surprisal_topk(corpus, 10, top_v=150)
    assert full.num_rows == 10 and capped.num_rows == 10
    # exact when the vocab fits
    wide = surprisal_topk(corpus, 10, top_v=1_000_000)
    assert full.column("doc_id").to_pylist() == \
        wide.column("doc_id").to_pylist()


def test_winnowing_guarantee(corpus, ray_session):
    """Schleimer et al. guarantee: two docs sharing a word run of
    length >= k + w - 1 share at least one fingerprint."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    from lucene_ray.pipelines.dedup import winnowing_fingerprints
    d = os.path.dirname(corpus)
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            "x1 x2 x3 " + shared + " y1 y2",
            "z9 z8 " + shared + " q7 q6 q5",
            "totally different words with no overlap at all here",
        ], pa.string()),
    })
    p = os.path.join(d, "winnow.parquet")
    pq.write_table(t, p)
    rows = winnowing_fingerprints(p, k=5, w=4).take_all()
    fps = {}
    for r in rows:
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    assert fps[0] & fps[1], "shared 8-word run must share a fingerprint"
    assert not (fps[0] & fps[2])
    assert not (fps[1] & fps[2])


def test_build_driver_sees_metadata_only(corpus, tmp_path_factory):
    """The build's driver-materialized output is one tiny metadata row
    per segment — segment payloads go actor->disk, never through the
    driver (the ds.stats() audit as a regression guard)."""
    import ray
    from lucene_ray.index import build_index
    out = str(tmp_path_factory.mktemp("audit") / "idx")
    captured = {}
    orig = ray.data.Dataset.take_all

    def cap(self, *a, **k):
        rows = orig(self, *a, **k)
        captured["rows"] = rows
        return rows

    ray.data.Dataset.take_all = cap
    try:
        m = build_index(corpus, out, batch_size=128)
    finally:
        ray.data.Dataset.take_all = orig
    rows = captured["rows"]
    assert len(rows) == len(m.segments)
    import sys
    # every driver-received row is metadata (well under 1 KB)
    for r in rows:
        assert sum(sys.getsizeof(str(v)) for v in r.values()) < 1024
