"""Numeric doc-values updates (updateNumericDocValue analog):
overlay semantics on every serving path + merge fold."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.index import build_index
from lucene_ray.index.dv_updates import update_numeric_dv
from lucene_ray.search import IndexReader, Searcher
from lucene_ray.search.query import NumericRangeQuery


def _mk(tmp, n=300, seed=31):
    rng = np.random.default_rng(seed)
    texts = [" ".join(rng.choice(["alpha", "beta", "gamma"], 5))
             for _ in range(n)]
    years = rng.integers(1990, 2030, n)
    path = str(tmp / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts), "year": pa.array(years)}), path)
    out = str(tmp / "idx")
    build_index(path, out, batch_size=64, stored_cols=("year",),
                doc_value_cols=("year",))
    return out, years.copy()


def test_update_reflected_in_range_and_stored(ray_session, tmp_path):
    out, years = _mk(tmp_path)
    updates = {5: 2050, 77: 1900, 150: 2011, 299: 2050}
    update_numeric_dv(out, "year", updates)
    for d, v in updates.items():
        years[d] = v
    s = Searcher(IndexReader(out))
    got = set(s.match_docs(NumericRangeQuery("year", 2040, None)).tolist())
    assert got == {i for i, y in enumerate(years) if y >= 2040}
    got2 = set(s.match_docs(NumericRangeQuery("year", None, 1995)).tolist())
    assert got2 == {i for i, y in enumerate(years) if y <= 1995}
    # stored / doc_values path
    vals = s.doc_values(np.array([5, 6, 77, 150]), "year")
    assert vals.tolist() == [2050.0, float(years[6]), 1900.0, 2011.0]


def test_second_update_wins(ray_session, tmp_path):
    out, years = _mk(tmp_path, seed=32)
    update_numeric_dv(out, "year", {10: 2100, 20: 2100})
    update_numeric_dv(out, "year", {10: 1800})
    s = Searcher(IndexReader(out))
    hi = set(s.match_docs(NumericRangeQuery("year", 2050, None)).tolist())
    assert hi == {20}
    lo = set(s.match_docs(NumericRangeQuery("year", None, 1850)).tolist())
    assert lo == {10}


def test_topk_by_field_sees_updates(ray_session, tmp_path):
    from lucene_ray.search.facets import topk_by_field
    out, years = _mk(tmp_path, seed=33)
    update_numeric_dv(out, "year", {7: 1500, 200: 1501})
    years[7], years[200] = 1500, 1501
    r = IndexReader(out)
    t = topk_by_field(r, "year", k=5, ascending=True)
    order = np.lexsort((np.arange(len(years)), years))[:5]
    assert t["doc_id"].to_pylist() == [int(i) for i in order]
    assert t["year"].to_pylist() == [int(years[i]) for i in order]


def test_merge_folds_updates(ray_session, tmp_path):
    from lucene_ray.index.merge import merge_segments
    out, years = _mk(tmp_path, seed=34)
    updates = {3: 2077, 120: 1888, 250: 2078}
    update_numeric_dv(out, "year", updates)
    for d, v in updates.items():
        years[d] = v
    m = merge_segments(out, segs_per_tier=2)
    s = Searcher(IndexReader(out))
    got = set(s.match_docs(NumericRangeQuery("year", 2070, None)).tolist())
    assert got == {3, 250}
    vals = s.doc_values(np.array([120]), "year")
    assert vals.tolist() == [1888.0]


def test_update_with_deletes_interplay(ray_session, tmp_path):
    from lucene_ray.index.deletes import delete_by_query
    out, years = _mk(tmp_path, seed=35)
    update_numeric_dv(out, "year", {40: 2090, 41: 2090})
    delete_by_query(out, NumericRangeQuery("year", 2090, None))
    s = Searcher(IndexReader(out))
    got = set(s.match_docs(NumericRangeQuery("year", 2080, None)).tolist())
    assert got == set()  # both updated docs were deleted by the query
