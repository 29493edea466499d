"""Learned BPE (Sennrich et al. 2016): trainer vs from-scratch brute,
the paper's toy corpus, encode properties, distributed counting."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.pipelines.bpe import (
    EOW,
    BpeEncoder,
    train_bpe_from_counts,
)


def _brute_train(word_counts, n_merges):
    """Reference trainer: recount every pair from scratch per merge."""
    words = {i: tuple(w) + (EOW,) for i, (w, _) in enumerate(word_counts)}
    freqs = {i: n for i, (_, n) in enumerate(word_counts)}
    merges = []
    for _ in range(n_merges):
        from collections import Counter
        pc = Counter()
        for i, syms in words.items():
            for p in zip(syms, syms[1:]):
                pc[p] += freqs[i]
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        for i, syms in words.items():
            out, j = [], 0
            while j < len(syms):
                if (j + 1 < len(syms) and syms[j] == best[0]
                        and syms[j + 1] == best[1]):
                    out.append(best[0] + best[1])
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = tuple(out)
    return merges


def test_sennrich_toy_corpus():
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_bpe_from_counts(wc, 5)
    assert merges[:3] == [("e", "s"), ("es", "t"), ("est", EOW)]
    assert ("l", "o") in merges[3:5]


def test_incremental_matches_brute():
    rng = np.random.default_rng(71)
    letters = "abcdef"
    wc = []
    seen = set()
    for _ in range(80):
        w = "".join(rng.choice(list(letters),
                               int(rng.integers(2, 8))))
        if w not in seen:
            seen.add(w)
            wc.append((w, int(rng.integers(1, 50))))
    for n in (5, 20, 60):
        assert train_bpe_from_counts(wc, n) == _brute_train(wc, n)


def test_encode_roundtrip_and_rank_order():
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_bpe_from_counts(wc, 8)
    enc = BpeEncoder(merges)
    for w in ("newest", "lowest", "wider", "zzz"):
        toks = enc.encode_word(w)
        assert "".join(toks) == w + EOW  # lossless
    # a fully-learned word collapses to few symbols
    assert len(enc.encode_word("newest")) <= 2
    # text encode = concatenation of word encodes
    assert enc.encode("low newest") == \
        list(enc.encode_word("low")) + list(enc.encode_word("newest"))


def test_distributed_training_and_counts(ray_session, tmp_path):
    from lucene_ray.pipelines.bpe import (bpe_token_counts,
                                          corpus_word_counts, train_bpe)
    rng = np.random.default_rng(73)
    vocab = ["low", "lower", "newest", "widest", "data", "merge"]
    texts = [" ".join(rng.choice(vocab, int(rng.integers(3, 30))))
             for _ in range(500)]
    t = pa.table({"doc_id": pa.array(np.arange(500, dtype=np.int64)),
                  "text": pa.array(texts, pa.string())})
    p = str(tmp_path / "docs.parquet")
    pq.write_table(t, p)
    # distributed word counts == local Counter
    wc = dict(corpus_word_counts(p))
    from collections import Counter
    want = Counter(w for t_ in texts for w in t_.split())
    assert wc == dict(want)
    merges = train_bpe(p, 12)
    assert merges == train_bpe_from_counts(
        sorted(want.items(), key=lambda kv: (-kv[1], kv[0])), 12)
    # distributed token counts == local encode
    got = bpe_token_counts(p, merges).to_pandas() \
        .set_index("doc_id")["n_bpe_tokens"]
    enc = BpeEncoder(merges)
    for i in (0, 7, 123, 499):
        assert got[i] == len(enc.encode(texts[i]))
