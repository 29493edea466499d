"""TermAutomatonQuery vs brute token-list scans."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.search.automaton import TermAutomatonQuery, term_automaton_docs


@pytest.fixture(scope="module")
def auto_corpus(ray_session, tmp_path_factory):
    from lucene_ray.index import build_index
    rng = np.random.default_rng(61)
    vocab = ["data", "merge", "window", "spark", "key", "row"]
    texts = [" ".join(rng.choice(vocab, int(rng.integers(2, 15))))
             for _ in range(400)]
    t = pa.table({"doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                  "text": pa.array(texts, pa.string())})
    d = tmp_path_factory.mktemp("auto")
    path = str(d / "docs.parquet")
    pq.write_table(t, path)
    out = str(d / "idx")
    build_index(path, out, batch_size=64, index_positions=True)
    from lucene_ray.search import IndexReader, Searcher
    return Searcher(IndexReader(out)), [t.split(" ") for t in texts]


def test_gap_automaton(auto_corpus):
    s, toks = auto_corpus
    q = TermAutomatonQuery()
    q.add_transition(0, 1, "data")
    q.add_any_transition(1, 2)
    q.add_transition(2, 3, "merge")
    q.set_accept(3)
    got = term_automaton_docs(s, q.finish()).tolist()
    want = [i for i, tk in enumerate(toks)
            if any(tk[j] == "data" and j + 2 < len(tk)
                   and tk[j + 2] == "merge" for j in range(len(tk)))]
    assert got == want and len(want) > 0


def test_alternation_automaton(auto_corpus):
    s, toks = auto_corpus
    q = TermAutomatonQuery()
    q.add_transition(0, 1, "data")
    q.add_transition(1, 2, "merge")
    q.add_transition(1, 2, "window")
    q.set_accept(2)
    got = term_automaton_docs(s, q.finish()).tolist()
    want = [i for i, tk in enumerate(toks)
            if any(tk[j] == "data" and j + 1 < len(tk)
                   and tk[j + 1] in ("merge", "window")
                   for j in range(len(tk)))]
    assert got == want and len(want) > 0


def test_loop_automaton(auto_corpus):
    """data (ANY)* merge — an ANY self-loop (exercises cycle guard)."""
    s, toks = auto_corpus
    q = TermAutomatonQuery()
    q.add_transition(0, 1, "data")
    q.add_any_transition(1, 1)
    q.add_transition(1, 2, "merge")
    q.set_accept(2)
    got = term_automaton_docs(s, q.finish()).tolist()
    want = [i for i, tk in enumerate(toks)
            if "data" in tk and "merge" in tk
            and tk.index("data") < len(tk) - 1 - tk[::-1].index("merge")]
    assert got == want and len(want) > 0


def test_automaton_validation():
    q = TermAutomatonQuery()
    q.add_transition(0, 1, "x")
    with pytest.raises(ValueError):
        q.finish()  # no accept state
    q2 = TermAutomatonQuery()
    q2.add_any_transition(0, 1)
    q2.set_accept(1)
    with pytest.raises(ValueError):
        q2.finish()  # only-ANY automaton rejected
