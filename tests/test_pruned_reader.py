"""Term-pruned postings reads (VERDICT r1 item 1): the reader must not
materialize whole postings tables — a query's bytes are bounded by its
terms' row groups (row-group min/max term stats = the FST index analog,
``codecs/lucene90/blocktree/Lucene90BlockTreeTermsReader.java``)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.index import build_index
from lucene_ray.index.merge import merge_segments
from lucene_ray.index.builder import POSTINGS_ROW_GROUP
from lucene_ray.search import (
    BooleanQuery,
    IndexReader,
    PrefixQuery,
    Searcher,
    TermQuery,
)


@pytest.fixture(scope="module")
def wide_vocab_index(ray_session, tmp_path_factory):
    """~6k distinct terms across 4 segments, so postings files have many
    row groups and pruning is observable."""
    rng = np.random.default_rng(11)
    n = 4000
    texts = []
    for i in range(n):
        words = [f"w{int(rng.integers(0, 6000)):05d}" for _ in range(12)]
        words.append("anchor")  # in every doc
        texts.append(" ".join(words))
    t = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                  "text": pa.array(texts, pa.string())})
    d = tmp_path_factory.mktemp("pruned")
    path = str(d / "docs.parquet")
    pq.write_table(t, path)
    out = str(d / "idx")
    build_index(path, out, batch_size=1000)
    return out, texts


def _brute_count(texts, terms, mode):
    n = 0
    for t in texts:
        ws = set(t.split())
        hit = all(w in ws for w in terms) if mode == "and" else \
            any(w in ws for w in terms)
        n += hit
    return n


def test_two_term_query_materializes_bounded_rows(wide_vocab_index):
    out, texts = wide_vocab_index
    reader = IndexReader(out)
    s = Searcher(reader)
    q = BooleanQuery(must=(TermQuery("w00042"), TermQuery("anchor")))
    got = s.count(q)
    assert got == _brute_count(texts, ["w00042", "anchor"], "and")
    total_rows = sum(sr.rows_loaded for sr in reader.segments())
    total_terms = sum(sr.num_terms for sr in reader.segments())
    # 2 terms -> at most 2 row groups per segment postings file
    n_segs = len(reader.segment_infos)
    assert total_rows <= 2 * POSTINGS_ROW_GROUP * n_segs
    assert total_rows < total_terms / 2, (total_rows, total_terms)


def test_pruning_after_merge_bucket_routing(ray_session, wide_vocab_index,
                                            tmp_path_factory):
    out, texts = wide_vocab_index
    import shutil
    d = str(tmp_path_factory.mktemp("merged_idx"))
    shutil.rmtree(d)
    shutil.copytree(out, d, symlinks=True)
    merge_segments(d)
    reader = IndexReader(d)
    segs = list(reader.segments())
    assert any(sr._postings.is_dir for sr in segs)  # merged shards exist
    assert all(sr._postings.n_buckets for sr in segs
               if sr._postings.is_dir)  # _BUCKETS.json routing present
    s = Searcher(reader)
    q = BooleanQuery(must=(TermQuery("w00042"), TermQuery("anchor")))
    assert s.count(q) == _brute_count(texts, ["w00042", "anchor"], "and")
    total_rows = sum(sr.rows_loaded for sr in reader.segments())
    # bucket routing: each term touches ONE shard's row group(s) per seg
    n_files = sum(len(sr._postings._paths) for sr in segs)
    assert total_rows <= 2 * POSTINGS_ROW_GROUP * len(segs), \
        (total_rows, n_files)


def test_vocab_range_pruned_expansion(wide_vocab_index):
    out, texts = wide_vocab_index
    reader = IndexReader(out)
    s = Searcher(reader)
    td = s.search(PrefixQuery("w0004"), k=5000)
    want = {i for i, t in enumerate(texts)
            if any(w.startswith("w0004") for w in t.split())}
    assert set(td.doc_ids.tolist()) == want
    # the vocab scan read only the prefix's range, not the whole dict
    vocab = reader.vocab("w0004", "w0005")
    assert all(v.startswith("w000") for v in vocab)


def test_term_stats_incremental(wide_vocab_index):
    out, texts = wide_vocab_index
    reader = IndexReader(out)
    st = reader.term_stats(["anchor", "w00042", "nosuchterm"])
    assert st["anchor"][0] == len(texts)
    assert st["nosuchterm"] == (0, 0)
    df = sum(1 for t in texts if "w00042" in t.split())
    assert st["w00042"][0] == df
    # cache is incremental, not whole-vocab
    assert len(reader._ts_cache) <= 8


def test_termset_skips_absent_terms(wide_vocab_index):
    out, texts = wide_vocab_index
    reader = IndexReader(out)
    sr = next(reader.segments())
    # absent terms: fingerprint rejects without a single row-group read
    sr.ensure_terms(["zz_not_there", "also_missing"])
    assert sr.rg_reads == 0 and sr.rows_loaded == 0
    assert sr.get_postings("zz_not_there") is None
    # present terms still load
    sr.ensure_terms(["anchor"])
    assert sr.get_postings("anchor") is not None
    assert sr.rg_reads >= 1
