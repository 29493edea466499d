"""North-star pipeline as a submittable Ray job.

``ray job submit -- python tools/job_entry.py`` (or plain ``python``)
runs the full production path over a Common-Crawl-style pages
directory:

  1. html -> text extraction check (byte-identity per url, sampled)
  2. resumable segment build (checkpoint lineage; re-runs skip
     finished shards)
  3. tiered merge (groupby-on-term shuffle)
  4. CheckIndex validation
  5. BM25 query suite (local + distributed worker pool)

Env knobs: ``JOB_CORPUS_DIR`` (default: a deterministic synthetic
corpus), ``JOB_INDEX_DIR`` (default /tmp/lucene_ray_job/index),
``JOB_DOCS`` (synthetic corpus size, default 100_000),
``JOB_NUM_CPUS`` (ray.init cpus when not already in a cluster).
Prints ONE JSON line of stage metrics; exits nonzero on any failure.
Re-running with the same dirs resumes: finished build shards are
skipped via their lineage markers.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import ray
    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 num_cpus=int(os.environ.get("JOB_NUM_CPUS", "8")),
                 include_dashboard=False, logging_level="ERROR")

    from lucene_ray.index.resumable import build_index_resumable
    from lucene_ray.index.merge import merge_segments
    from lucene_ray.index.validate import validate_index
    from lucene_ray.pipelines.webtext import verify_extraction
    from lucene_ray.search import IndexReader, Searcher, TermQuery, or_query
    from lucene_ray.search.distributed import RaySearcher

    corpus = os.environ.get("JOB_CORPUS_DIR")
    metrics: dict = {"job": "lucene_ray_index_build"}
    if not corpus:
        from lucene_ray.sources import write_pages
        n = int(os.environ.get("JOB_DOCS", "100000"))
        corpus = f"/tmp/lucene_ray_job/pages-{n}"
        if not os.path.isdir(corpus) or not os.listdir(corpus):
            write_pages(corpus, n_rows=n, n_parts=max(8, n // 25000))
        metrics["synthetic_docs"] = n
    out = os.environ.get("JOB_INDEX_DIR", "/tmp/lucene_ray_job/index")

    # 1. extraction invariant (the north-star per-row check)
    t0 = time.perf_counter()
    ext = verify_extraction(corpus)
    metrics["extract_check_sec"] = round(time.perf_counter() - t0, 3)
    metrics["extract_rows"] = ext["n_rows"]
    metrics["extract_mismatch"] = ext["n_mismatch"]
    if ext["n_mismatch"]:
        print(json.dumps(metrics))
        return 1

    # 2. resumable build (re-runs skip finished shards)
    t0 = time.perf_counter()
    m = build_index_resumable(corpus, out, rows_per_shard=4096)
    metrics["build_sec"] = round(time.perf_counter() - t0, 3)
    metrics["num_docs"] = m.num_docs
    metrics["num_segments"] = len(m.segments)

    # 3. tiered merge
    t0 = time.perf_counter()
    m2 = merge_segments(out)
    metrics["merge_sec"] = round(time.perf_counter() - t0, 3)
    metrics["segments_after_merge"] = len(m2.segments)

    # 4. validation
    t0 = time.perf_counter()
    errs = validate_index(out)
    metrics["checkindex_sec"] = round(time.perf_counter() - t0, 3)
    metrics["checkindex_errors"] = errs
    if errs:
        print(json.dumps(metrics))
        return 1

    # 5. query suite (local + distributed)
    reader = IndexReader(out)
    s = Searcher(reader)
    vocab = sorted(reader.all_term_stats().items(),
                   key=lambda kv: -kv[1][0])
    hot = [t for t, _ in vocab[:5]]
    queries = [TermQuery(hot[0]), or_query(hot[:3]),
               or_query(hot[2:5])]
    lat = []
    s.search(queries[0], k=10)
    for q in queries:
        t0 = time.perf_counter()
        s.search(q, k=10)
        lat.append(time.perf_counter() - t0)
    metrics["query_p50_ms"] = round(
        sorted(lat)[len(lat) // 2] * 1000, 3)
    rs = RaySearcher(out, num_workers=4)
    a = s.search(queries[1], k=10)
    b = rs.search(queries[1], k=10)
    metrics["dist_equals_local"] = bool(
        a.doc_ids.tolist() == b.doc_ids.tolist())
    print(json.dumps(metrics))
    return 0 if metrics["dist_equals_local"] else 1


if __name__ == "__main__":
    rc = main()
    import ray
    if ray.is_initialized():
        ray.shutdown()
    raise SystemExit(rc)
