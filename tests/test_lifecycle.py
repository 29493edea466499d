"""End-to-end index lifecycle stress: the web-corpus refresh cycle —
build -> append -> delete -> merge -> update -> merge again — verified
against a brute-force live-document model after every step."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.index import build_index
from lucene_ray.index.deletes import delete_by_key, update_by_key
from lucene_ray.index.manifest import read_manifest
from lucene_ray.index.merge import merge_segments
from lucene_ray.index.validate import validate_index
from lucene_ray.search import (
    IndexReader,
    MatchAllDocsQuery,
    Searcher,
    TermQuery,
)


def _write(d, docs, name):
    t = pa.table({
        "doc_id": pa.array([x[0] for x in docs], pa.int64()),
        "text": pa.array([x[1] for x in docs], pa.string()),
        "url": pa.array([x[2] for x in docs], pa.string()),
    })
    p = str(d / name)
    pq.write_table(t, p)
    return p


def _check(out, live, rng):
    """live: dict doc_id -> (text, url). Verify counts + matches."""
    s = Searcher(IndexReader(out))
    assert s.count(MatchAllDocsQuery()) == len(live)
    vocab = sorted({w for t, _ in live.values() for w in t.split()})
    for term in rng.choice(vocab, size=min(6, len(vocab)), replace=False):
        want = sorted(d for d, (t, _) in live.items()
                      if term in t.split())
        got = s.match_docs(TermQuery(str(term))).tolist()
        assert got == want, term
    assert validate_index(out) == []


def test_refresh_cycle(ray_session, tmp_path):
    rng = np.random.default_rng(53)
    words = [f"w{i}" for i in range(30)]

    def mk(doc_id):
        return (doc_id, " ".join(rng.choice(words, 6)), f"u{doc_id % 120}")

    # 1) initial build
    docs = [mk(i) for i in range(400)]
    live = {d: (t, u) for d, t, u in docs}
    out = str(tmp_path / "idx")
    build_index(_write(tmp_path, docs, "b0.parquet"), out,
                batch_size=64, stored_cols=("url",))
    _check(out, live, rng)

    # 2) append a second crawl
    docs2 = [mk(i) for i in range(400, 600)]
    live.update({d: (t, u) for d, t, u in docs2})
    build_index(_write(tmp_path, docs2, "b1.parquet"), out,
                batch_size=64, stored_cols=("url",))
    _check(out, live, rng)

    # 3) delete a url cohort
    dead_urls = ["u3", "u17", "u44"]
    delete_by_key(out, "url", dead_urls)
    live = {d: v for d, v in live.items() if v[1] not in dead_urls}
    _check(out, live, rng)

    # 4) merge (reclaims tombstones)
    merge_segments(out, segs_per_tier=6)
    assert read_manifest(out).num_deleted == 0
    _check(out, live, rng)

    # 5) update a url cohort with replacement docs
    upd = [(1000 + i, " ".join(rng.choice(words, 6)), f"u{7 + i}")
           for i in range(3)]
    for d, t, u in upd:
        live = {k: v for k, v in live.items() if v[1] != u}
        live[d] = (t, u)
    update_by_key(out, _write(tmp_path, upd, "b2.parquet"), "url",
                  batch_size=64)
    _check(out, live, rng)

    # 6) final merge round
    merge_segments(out, segs_per_tier=4)
    assert read_manifest(out).num_deleted == 0
    _check(out, live, rng)
