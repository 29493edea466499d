"""Index lifecycle APIs (index/lifecycle.py): SearcherManager NRT
refresh, addIndexes grafting, snapshot listing + rollback."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.index import build_index
from lucene_ray.index.lifecycle import (
    SearcherManager,
    add_indexes,
    rollback,
    snapshots,
)
from lucene_ray.search import IndexReader, Searcher, TermQuery


def _write(tmp, name, ids, texts):
    path = str(tmp / f"{name}.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts)}), path)
    return path


@pytest.fixture()
def two_indexes(ray_session, tmp_path):
    a = _write(tmp_path, "a", [0, 1], ["alpha beta", "alpha gamma"])
    b = _write(tmp_path, "b", [100, 101], ["delta beta", "epsilon x"])
    ia, ib = str(tmp_path / "ia"), str(tmp_path / "ib")
    build_index(a, ia, batch_size=10)
    build_index(b, ib, batch_size=10)
    return tmp_path, a, ia, ib


class TestSearcherManager:
    def test_refresh_only_on_new_generation(self, two_indexes):
        tmp, a_path, ia, _ = two_indexes
        mgr = SearcherManager(ia)
        s0 = mgr.acquire()
        assert mgr.maybe_refresh() is False
        assert mgr.acquire() is s0
        # commit a new generation (append more docs)
        c = _write(tmp, "c", [50, 51], ["alpha zeta", "beta zeta"])
        build_index(c, ia, batch_size=10)  # create_or_append
        assert mgr.maybe_refresh() is True
        s1 = mgr.acquire()
        assert s1 is not s0
        # the old searcher still answers over its pinned snapshot
        assert s0.count(TermQuery("zeta")) == 0
        assert s1.count(TermQuery("zeta")) == 2


class TestAddIndexes:
    def test_graft_and_search(self, two_indexes):
        _, _, ia, ib = two_indexes
        m = add_indexes(ia, ib)
        s = Searcher(IndexReader(ia))
        assert s.count(TermQuery("beta")) == 2   # one from each source
        assert s.count(TermQuery("epsilon")) == 1
        assert m.num_docs == 4

    def test_overlap_rejected(self, two_indexes, tmp_path):
        _, _, ia, _ = two_indexes
        dup = _write(tmp_path, "dup", [1, 2], ["x", "y"])  # id 1 overlaps
        idup = str(tmp_path / "idup")
        build_index(dup, idup, batch_size=10)
        with pytest.raises(ValueError, match="overlaps"):
            add_indexes(ia, idup)

    def test_field_mismatch_rejected(self, two_indexes, tmp_path):
        _, _, ia, _ = two_indexes
        other = str(tmp_path / "other.parquet")
        pq.write_table(pa.table({
            "doc_id": pa.array([900], pa.int64()),
            "body": pa.array(["zzz"])}), other)
        io = str(tmp_path / "io")
        build_index(other, io, text_col="body", batch_size=10)
        with pytest.raises(ValueError, match="field"):
            add_indexes(ia, io)


class TestSnapshots:
    def test_rollback_restores_old_state(self, two_indexes):
        tmp, _, ia, ib = two_indexes
        g0 = snapshots(ia)[-1]
        add_indexes(ia, ib)
        assert snapshots(ia)[-1] == g0 + 1
        assert Searcher(IndexReader(ia)).count(TermQuery("epsilon")) == 1
        m = rollback(ia, g0)
        # rollback is itself a new commit, not a deletion
        assert m.generation == g0 + 2
        assert snapshots(ia) == [g0, g0 + 1, g0 + 2]
        s = Searcher(IndexReader(ia))
        assert s.count(TermQuery("epsilon")) == 0
        assert s.count(TermQuery("alpha")) == 2
        # the intermediate snapshot stays openable
        mid = Searcher(IndexReader(ia, generation=g0 + 1))
        assert mid.count(TermQuery("epsilon")) == 1

    def test_rollback_unknown_generation(self, two_indexes):
        _, _, ia, _ = two_indexes
        with pytest.raises(ValueError):
            rollback(ia, 999)


def test_split_index_parts_union_to_original(ray_session,
                                             tmp_path_factory):
    """IndexSplitter/MultiPassIndexSplitter role: three doc-range parts
    whose per-part matches concatenate to exactly the original's, with
    boundary segments handled by fake deletes."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from lucene_ray.index import build_index
    from lucene_ray.index.lifecycle import split_index
    from lucene_ray.search import IndexReader, Searcher, TermQuery
    n = 500
    texts = [f"data w{i % 11}" if i % 3 else f"merge w{i % 11}"
             for i in range(n)]
    t = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                  "text": pa.array(texts, pa.string())})
    d = tmp_path_factory.mktemp("split")
    p = str(d / "docs.parquet")
    pq.write_table(t, p)
    src = str(d / "idx")
    build_index(p, src, batch_size=128)  # 4 segments of 128/116
    outs = [str(d / f"part{i}") for i in range(3)]
    ms = split_index(src, outs, [100, 300])  # boundaries INSIDE segments
    assert len(ms) == 3
    whole = Searcher(IndexReader(src))
    for term in ("data", "merge"):
        want = whole.match_docs(TermQuery(term)).tolist()
        got = []
        for o in outs:
            got.extend(Searcher(IndexReader(o))
                       .match_docs(TermQuery(term)).tolist())
        assert sorted(got) == want
    # ranges are disjoint and boundaries respected
    a = Searcher(IndexReader(outs[0])).match_docs(TermQuery("data"))
    b = Searcher(IndexReader(outs[1])).match_docs(TermQuery("data"))
    c = Searcher(IndexReader(outs[2])).match_docs(TermQuery("data"))
    assert a.max() < 100 and 100 <= b.min() and b.max() < 300 \
        and c.min() >= 300
    # hard links: source deletion survival
    import shutil as _sh
    _sh.rmtree(src)
    again = Searcher(IndexReader(outs[1])).match_docs(TermQuery("data"))
    np.testing.assert_array_equal(again, b)
