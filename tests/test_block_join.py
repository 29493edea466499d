"""Parent/child block join (join/ToParentBlockJoinQuery.java,
TestBlockJoin.java semantics): children-first parent-last blocks,
nearest-parent-above join, ScoreMode combination."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.search import IndexReader, Searcher, TermQuery
from lucene_ray.search.join import (
    block_join_parents,
    block_join_topk,
    build_block_index,
)


@pytest.fixture(scope="module")
def block_index(ray_session, tmp_path_factory):
    parents = pa.table({
        "pkey": pa.array([10, 20, 30, 40], pa.int64()),
        "name": pa.array(["orderten", "ordertwenty", "orderthirty",
                          "orderforty"], pa.string()),
    })
    children = pa.table({
        "ckey": pa.array([10, 10, 20, 30, 30, 30], pa.int64()),
        "flag": pa.array(["red hot", "blue cold", "red cold",
                          "red hot", "red hot", "green cold"], pa.string()),
    })
    d = str(tmp_path_factory.mktemp("bj"))
    # tiny batch size forces blocks to straddle segment boundaries
    build_block_index(parents, children, d, parent_key="pkey",
                      child_key="ckey", parent_text=lambda r: r["name"],
                      child_text=lambda r: r["flag"],
                      stored_parent=("pkey",), batch_size=3)
    return d


def test_join_matching_parents(block_index):
    s = Searcher(IndexReader(f"{block_index}/idx"))
    docs, scores = block_join_parents(s, TermQuery("red"))
    # parents of red children: blocks 10, 20, 30 (not 40: no children)
    sr_keys = set()
    for info in s.reader.segment_infos:
        sr = s.reader.segment(info.seg_id)
        inb = [d for d in docs if info.min_doc <= d <= info.max_doc]
        if inb:
            sr_keys.update(sr.stored(np.asarray(inb, np.int64), "block_key"))
    assert sr_keys == {10, 20, 30}
    # child query matching the PARENT text must not leak: parents are
    # excluded from the child space
    docs2, _ = block_join_parents(s, TermQuery("orderten"))
    assert len(docs2) == 0


def test_score_modes(block_index):
    s = Searcher(IndexReader(f"{block_index}/idx"))
    d_tot, s_tot = block_join_parents(s, TermQuery("red"), "total")
    d_max, s_max = block_join_parents(s, TermQuery("red"), "max")
    d_avg, s_avg = block_join_parents(s, TermQuery("red"), "avg")
    d_none, s_none = block_join_parents(s, TermQuery("red"), "none")
    assert d_tot.tolist() == d_max.tolist() == d_avg.tolist()
    # block 30 has TWO red children -> total > max there, equal elsewhere
    assert (s_tot >= s_max - 1e-6).all()
    assert (s_tot > s_max).any()
    assert (s_none == 0).all()
    # avg <= max everywhere
    assert (s_avg <= s_max + 1e-6).all()
    td = block_join_topk(s, TermQuery("red"), k=2, score_mode="total")
    assert len(td.doc_ids) == 2


def test_blocks_straddle_segments(block_index):
    # batch_size=3 over 10 docs -> several segments; joins still exact
    reader = IndexReader(f"{block_index}/idx")
    assert len(reader.segment_infos) > 1


def test_stream_builder_million_children(ray_session, tmp_path_factory):
    """build_block_index_stream assembles blocks from a >1M-child corpus
    through Dataset ops only (hash shuffle + partition-local sweep) — no
    driver materialization of the input tables — and the join answers
    match the key-level oracle."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    import ray.data
    from lucene_ray.search.join import build_block_index_stream

    n_parents = 150_000
    per = 7  # 1.05M children
    d = tmp_path_factory.mktemp("bj_big")
    pkeys = np.arange(n_parents, dtype=np.int64)
    pq.write_table(pa.table({"pkey": pa.array(pkeys)}),
                   str(d / "parents.parquet"), row_group_size=65536)
    ckeys = np.repeat(pkeys, per)
    flags = np.where(ckeys % 11 == 0, "redflag", "blueflag")
    pq.write_table(pa.table({"ckey": pa.array(ckeys),
                             "flag": pa.array(flags, pa.string())}),
                   str(d / "children.parquet"), row_group_size=65536)

    out = str(d / "bj")
    build_block_index_stream(
        str(d / "parents.parquet"), str(d / "children.parquet"), out,
        parent_key="pkey", child_key="ckey",
        parent_text_fn=lambda b: pa.array(["parentdoc"] * len(b)),
        child_text_fn=lambda b: b["flag"].combine_chunks(),
        stored_parent=("pkey",), num_partitions=16, batch_size=32768)

    s = Searcher(IndexReader(f"{out}/idx"))
    docs, _ = block_join_parents(s, TermQuery("redflag"), "none")
    assert len(docs) == (pkeys % 11 == 0).sum()
    keys = []
    for info in s.reader.segment_infos:
        sr = s.reader.segment(info.seg_id)
        inb = docs[(docs >= info.min_doc) & (docs <= info.max_doc)]
        if len(inb):
            keys.extend(sr.stored(inb, "pkey"))
    assert sorted(keys) == pkeys[pkeys % 11 == 0].tolist()


def test_to_child_block_join(ray_session, tmp_path_factory):
    """ToChildBlockJoinQuery: parent hits join DOWN to all their
    children; children inherit the parent score; parents never appear
    in the child result."""
    import numpy as np
    import pyarrow as pa
    from lucene_ray.search import IndexReader, Searcher
    from lucene_ray.search.join import block_join_children, build_block_index
    from lucene_ray.search.query import NumericRangeQuery

    parents = pa.table({
        "pkey": pa.array([10, 20, 30], pa.int64()),
        "text": pa.array(["parent red", "parent blue", "parent red"]),
    })
    children = pa.table({
        "ckey": pa.array([10, 10, 20, 30, 30, 30], pa.int64()),
        "text": pa.array(["c1", "c2", "c3", "c4", "c5", "c6"]),
    })
    out = str(tmp_path_factory.mktemp("tocb"))
    build_block_index(parents, children, out, parent_key="pkey",
                      child_key="ckey", stored_parent=("pkey",),
                      parent_text=lambda r: r["text"],
                      child_text=lambda r: r["text"])
    s = Searcher(IndexReader(f"{out}/idx"), similarity="bm25_exact64")
    kids, scores = block_join_children(
        s, NumericRangeQuery("pkey", 10, 20))
    # block_key of each child row identifies its parent
    got = []
    for info in s.reader.segment_infos:
        sr = s.reader.segment(info.seg_id)
        inb = kids[(kids >= info.min_doc) & (kids <= info.max_doc)]
        got.extend(sr.stored(inb, "block_key"))
    assert sorted(got) == [10, 10, 20]
    # parent-only selection: range matching no parents -> no children
    kids2, _ = block_join_children(s, NumericRangeQuery("pkey", 99, 100))
    assert len(kids2) == 0
    # all parents -> every child, none of the parents
    kids3, _ = block_join_children(s, NumericRangeQuery("pkey", 0, 99))
    assert len(kids3) == 6
