"""Replicator module analog: revision file sets, delta copy,
manifest-last atomic publish, replica reads equal source reads."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.index import build_index
from lucene_ray.index.replicator import current_revision, gc_replica, replicate
from lucene_ray.search import IndexReader, Searcher, TermQuery


def _write_docs(path, start, n, seed):
    rng = np.random.default_rng(seed)
    vocab = ["data", "merge", "window", "spark", "block", "ray"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(3, 9)))
             for _ in range(n)]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(start, start + n), pa.int64()),
        "text": pa.array(texts)}), path)


@pytest.fixture(scope="module")
def src(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("repl")
    p1 = str(d / "part1.parquet")
    _write_docs(p1, 0, 300, seed=7)
    out = str(d / "src_idx")
    build_index(p1, out, batch_size=100)
    return str(d), out


def _topdocs(idx, term="data", k=10):
    s = Searcher(IndexReader(idx), similarity="bm25_exact64")
    td = s.search(TermQuery(term), k=k)
    return list(zip(td.doc_ids.tolist(), td.scores.tolist()))


def test_initial_replication_and_equality(src, tmp_path):
    _, src_idx = src
    dst = str(tmp_path / "replica")
    stats = replicate(src_idx, dst)
    assert stats["copied"] > 0 and stats["skipped"] == 0
    assert _topdocs(dst) == _topdocs(src_idx)
    # idempotent: second sync copies nothing
    stats2 = replicate(src_idx, dst)
    assert stats2["copied"] == 0 and stats2["skipped"] > 0


def test_incremental_replication_copies_only_new(src, tmp_path):
    d, src_idx = src
    dst = str(tmp_path / "replica2")
    replicate(src_idx, dst)
    old_seg_files = {os.path.join(r, f)
                     for r, _, fs in os.walk(os.path.join(dst, "segments"))
                     for f in fs}
    mtimes = {p: os.path.getmtime(p) for p in old_seg_files}
    # append a second batch -> new generation on the source
    p2 = os.path.join(d, "part2.parquet")
    _write_docs(p2, 1000, 200, seed=11)
    build_index(p2, src_idx, batch_size=100, mode="create_or_append")
    stats = replicate(src_idx, dst)
    assert stats["generation"] > 0
    assert stats["copied"] > 0            # the new segments + manifest
    # delta session: every pre-existing segment file is untouched
    for p, t in mtimes.items():
        assert os.path.getmtime(p) == t, p
    assert stats["skipped"] >= len(old_seg_files)
    assert _topdocs(dst) == _topdocs(src_idx)


def test_manifest_last_crash_safety(src, tmp_path):
    _, src_idx = src
    dst = str(tmp_path / "replica3")
    # simulate a crash: copy data files but never the manifest
    rev = current_revision(src_idx)
    for rel in rev.files[:2]:
        s, t = os.path.join(src_idx, rel), os.path.join(dst, rel)
        os.makedirs(os.path.dirname(t), exist_ok=True)
        import shutil
        shutil.copyfile(s, t)
    with pytest.raises(FileNotFoundError):
        IndexReader(dst)  # no manifest -> no readable generation
    # recovery: a full replicate completes the revision
    replicate(src_idx, dst)
    assert _topdocs(dst) == _topdocs(src_idx)


def test_gc_drops_unreferenced(src, tmp_path):
    _, src_idx = src
    dst = str(tmp_path / "replica4")
    replicate(src_idx, dst)
    junk = os.path.join(dst, "segments", "stale-file.parquet")
    open(junk, "wb").write(b"x")
    removed = gc_replica(dst)
    assert "segments/stale-file.parquet" in [r.replace(os.sep, "/")
                                             for r in removed]
    assert not os.path.exists(junk)
    assert _topdocs(dst) == _topdocs(src_idx)
