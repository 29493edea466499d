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


def test_merge_auto_salt_engages(merged_setup, tmp_path_factory, monkeypatch):
    """Zipf-head detection: with the hot-term payload threshold lowered
    to less than any term's estimated payload, salt_buckets=None derives
    a salted two-level shuffle AUTOMATICALLY from the global df column
    stats, and its output is identical to the unsalted merge."""
    import os
    import shutil

    import pyarrow.parquet as pq

    from lucene_ray.index import merge as merge_mod
    from lucene_ray.index.manifest import read_manifest

    out, _ = merged_setup
    r = IndexReader(out, generation=0)
    qs = _queries(r)
    base = _snapshot(Searcher(r), qs)

    dirs = []
    for tag in ("auto", "flat"):
        d = str(tmp_path_factory.mktemp(f"idx_autosalt_{tag}"))
        shutil.copytree(out, d, dirs_exist_ok=True)
        for f in os.listdir(d):
            if f.startswith("manifest_") and f != "manifest_0.json":
                os.remove(os.path.join(d, f))
        dirs.append(d)
    out_a, out_b = dirs

    ma = read_manifest(out_a)
    groups = plan_merges(ma.segments, 8, 10_000_000)
    # this corpus has no 64MB-payload term: auto stays single-level
    assert merge_mod.auto_salt_buckets(out_a, ma, groups) == 1
    # lower the threshold below the hottest term's payload: engages
    monkeypatch.setattr(merge_mod, "HOT_TERM_PAYLOAD_BYTES", 64)
    assert merge_mod.auto_salt_buckets(out_a, ma, groups) > 1

    merge_segments(out_a, segs_per_tier=8)                  # auto (salted)
    merge_segments(out_b, segs_per_tier=8, salt_buckets=1)  # forced flat

    assert _snapshot(Searcher(IndexReader(out_a)), qs) == base
    assert validate_index(out_a) == []

    # merged postings identical to the unsalted run, term by term
    for d in (out_a, out_b):
        assert read_manifest(d).generation == 1
    seg_a = read_manifest(out_a).segments
    seg_b = read_manifest(out_b).segments
    assert [s.seg_id for s in seg_a] == [s.seg_id for s in seg_b]
    for sa in seg_a:
        pa_dir = os.path.join(out_a, "segments", sa.seg_id,
                              "postings.parquet")
        pb_dir = os.path.join(out_b, "segments", sa.seg_id,
                              "postings.parquet")
        if not os.path.isdir(pa_dir):
            continue  # group too small to merge: untouched segment
        ta = pq.read_table(pa_dir).sort_by("term")
        tb = pq.read_table(pb_dir).sort_by("term")
        assert ta.equals(tb)


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
