"""WARC (ISO 28500 / Common Crawl layout) ingestion source:
record round trips, gzip member streams, HTTP header stripping,
non-response skipping, and the Ray Data read path feeding the
extract -> index pipeline."""

import os

import numpy as np
import pytest

from lucene_ray.sources.warc import (
    parse_warc,
    read_warc,
    warc_record_bytes,
    write_warc,
)


def _recs(n, salt=""):
    return [(f"https://ex{salt}.org/p/{i}",
             f"2026-01-0{i % 9 + 1}T0{i % 10}:00:00Z",
             f"<html><body><p>doc {salt}{i} text</p></body></html>"
             .encode()) for i in range(n)]


def test_roundtrip_compressed_and_plain(tmp_path):
    recs = _recs(5)
    for compress in (True, False):
        p = str(tmp_path / f"f{compress}.warc.gz")
        write_warc(p, recs, compress=compress)
        got = parse_warc(open(p, "rb").read())
        assert [(g["url"], g["warc_ts"], g["html"]) for g in got] == recs


def test_http_headers_stripped():
    blob = warc_record_bytes("https://x.org", "2026-01-01T00:00:00Z",
                             b"<html>hi</html>")
    got = parse_warc(blob)
    assert got[0]["html"] == b"<html>hi</html>"
    assert b"HTTP/1.1" not in got[0]["html"]


def test_non_response_records_skipped():
    # hand-build a warcinfo record followed by a response
    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
            b"Content-Length: 4\r\n\r\ninfo\r\n\r\n")
    resp = warc_record_bytes("https://y.org", "2026-01-02T00:00:00Z",
                             b"<p>y</p>", compress=False)
    got = parse_warc(info + resp)
    assert len(got) == 1 and got[0]["url"] == "https://y.org"


def test_deterministic_bytes():
    a = warc_record_bytes("https://z.org", "2026-01-01T00:00:00Z", b"x")
    b = warc_record_bytes("https://z.org", "2026-01-01T00:00:00Z", b"x")
    assert a == b  # gzip mtime pinned -> stable fixtures


def test_read_warc_to_index(ray_session, tmp_path):
    from lucene_ray.analysis.charfilter import html_strip
    from lucene_ray.index import build_index
    from lucene_ray.search import IndexReader, Searcher, TermQuery

    paths = []
    all_recs = []
    for part in range(3):
        recs = _recs(40, salt=str(part))
        p = str(tmp_path / f"part{part}.warc.gz")
        write_warc(p, recs)
        paths.append(p)
        all_recs.extend(recs)

    ds = read_warc(paths)
    rows = ds.to_pandas()
    assert len(rows) == 120
    assert sorted(rows["url"]) == sorted(u for u, _, _ in all_recs)
    assert rows["warc_ts"].notna().all()

    # end-to-end: html -> text -> index -> search
    import pyarrow as pa

    def to_docs(batch: pa.Table) -> pa.Table:
        texts = [html_strip(h.decode()) for h in
                 batch.column("html").to_pylist()]
        ids = [int(u.rsplit("/", 1)[1]) + (1000 if "ex1" in u else 0)
               + (2000 if "ex2" in u else 0)
               for u in batch.column("url").to_pylist()]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        })

    # materialize the extraction so the builder's own actor pool does
    # not have to share the 4-CPU test session with two upstream pools
    # (pool-chain CPU reservation deadlock at tiny cpu budgets)
    docs = ds.map_batches(to_docs, batch_format="pyarrow").materialize()
    out = str(tmp_path / "idx")
    build_index(docs, out, batch_size=64)
    s = Searcher(IndexReader(out), similarity="bm25_exact64")
    assert s.count(TermQuery("doc")) == 120
    assert s.count(TermQuery("text")) == 120
