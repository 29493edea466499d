"""Segment merge: results identical pre/post merge (FIXTURES.md F4b),
index invariants hold (CheckIndex pattern), salted path equivalent."""

import pytest

from lucene_ray.index import build_index
from lucene_ray.index.merge import merge_segments, plan_merges
from lucene_ray.index.validate import validate_index
from lucene_ray.search import IndexReader, Searcher, TermQuery, and_query, or_query


@pytest.fixture(scope="module")
def merged_setup(ray_session, small_pages, tmp_path_factory):
    src_dir, paths = small_pages
    out = str(tmp_path_factory.mktemp("idx_for_merge"))
    m = build_index(paths, out, batch_size=250)  # 8 segments
    assert len(m.segments) >= 4
    return out, m


def _snapshot(searcher, queries, k=50):
    out = []
    for q in queries:
        td = searcher.search(q, k=k)
        out.append((td.doc_ids.tolist(), td.scores.tolist()))
    return out


def _queries(reader):
    # pick real terms from the index
    sr = reader.segment(reader.segment_infos[0].seg_id)
    terms = list(sr.terms())[:40]
    hot = max(terms, key=lambda t: sr.df(t))
    t2 = terms[len(terms) // 2]
    t3 = terms[-1]
    return [TermQuery(hot), and_query([hot, t2]), or_query([hot, t2, t3])]


def test_merge_preserves_results(merged_setup):
    out, m0 = merged_setup
    r0 = IndexReader(out)
    qs = _queries(r0)
    before = _snapshot(Searcher(r0), qs)

    m1 = merge_segments(out, segs_per_tier=4)
    assert m1.generation == m0.generation + 1
    assert len(m1.segments) < len(m0.segments)
    after = _snapshot(Searcher(IndexReader(out)), qs)
    assert before == after

    errs = validate_index(out)
    assert errs == []


def test_merge_salted_equivalent(merged_setup, tmp_path_factory):
    out, _ = merged_setup
    r = IndexReader(out, generation=0)
    qs = _queries(r)
    base = _snapshot(Searcher(r), qs)

    import shutil, os
    out2 = str(tmp_path_factory.mktemp("idx_salted"))
    shutil.copytree(out, out2, dirs_exist_ok=True)
    # drop newer generations so the salted merge starts from gen 0
    for f in os.listdir(out2):
        if f.startswith("manifest_") and f != "manifest_0.json":
            os.remove(os.path.join(out2, f))
    merge_segments(out2, segs_per_tier=8, salt_buckets=3)
    after = _snapshot(Searcher(IndexReader(out2)), qs)
    assert base == after
    assert validate_index(out2) == []


def test_merge_repack_equivalent(merged_setup, tmp_path_factory):
    out, _ = merged_setup
    r = IndexReader(out, generation=0)
    qs = _queries(r)
    base = _snapshot(Searcher(r), qs)

    import shutil, os
    out3 = str(tmp_path_factory.mktemp("idx_repack"))
    shutil.copytree(out, out3, dirs_exist_ok=True)
    for f in os.listdir(out3):
        if f.startswith("manifest_") and f != "manifest_0.json":
            os.remove(os.path.join(out3, f))
    m = merge_segments(out3, segs_per_tier=100, repack=True)  # forceMerge(1)
    assert len(m.segments) == 1
    # full 128-blocking: single chunk per term
    rr = IndexReader(out3)
    sr = rr.segment(m.segments[0].seg_id)
    some_term = next(iter(sr.terms()))
    assert len(sr.get_postings(some_term).chunk_doc_counts) == 1
    after = _snapshot(Searcher(rr), qs)
    assert base == after
    assert validate_index(out3) == []


def test_plan_merges_tiers():
    from lucene_ray.index.manifest import SegmentInfo
    segs = [SegmentInfo(f"s{i}", 100, i * 100, i * 100 + 99, 1000, 50)
            for i in range(25)]
    groups = plan_merges(segs, segs_per_tier=10, max_merged_docs=10**9)
    assert [len(g) for g in groups] == [10, 10, 5]
    groups = plan_merges(segs, segs_per_tier=10, max_merged_docs=350)
    assert all(sum(s.num_docs for s in g) <= 350 for g in groups)
