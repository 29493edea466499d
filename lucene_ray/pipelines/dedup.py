"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

All are streaming Ray Data pipelines. Shuffle keys are *hashes*, never
raw text: the exact-dedup groupby moves (md5, doc_id) pairs only; the
LSH groupbys move (band_key, doc_id). At 100 TB this keeps exchange
volume ~1% of corpus size.
"""

from __future__ import annotations

import hashlib
import zlib
from itertools import combinations

import numpy as np
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Count, Min

from ..analysis import StandardAnalyzer
from ..util import cached_callable
from .text_analysis import read_documents

# deterministic 61-bit Mersenne prime universe for minhash permutations
_MERSENNE = (1 << 61) - 1


def _text_hash_batch(batch: pa.Table) -> pa.Table:
    return pa.table({
        "doc_id": batch["doc_id"],
        "h": pa.array([hashlib.md5((t or "").encode()).hexdigest()
                       for t in batch["text"].to_pylist()], pa.string()),
    })


def exact_dedup(path: str) -> ray.data.Dataset:
    """Keeper doc per distinct text: min doc_id (delete-by-term analog,
    IndexWriter.java:1828 updateDocument). Returns (doc_id) rows."""
    ds = read_documents(path).map_batches(_text_hash_batch, batch_format="pyarrow")
    return (ds.groupby("h").aggregate(Min("doc_id", alias_name="doc_id"))
            .select_columns(["doc_id"]))


def first_per_group(path: str, keys=("lang", "source")) -> ray.data.Dataset:
    """Min doc_id per group key — generic first-per-key dedup."""
    ds = read_documents(path, columns=["doc_id", *keys])
    return ds.groupby(list(keys)).aggregate(Min("doc_id", alias_name="doc_id"))


# --- MinHash + LSH ---------------------------------------------------------

def _shingles(terms: list[str], k: int) -> np.ndarray:
    if len(terms) < k:
        joined = [" ".join(terms)] if terms else []
    else:
        joined = [" ".join(terms[i:i + k]) for i in range(len(terms) - k + 1)]
    return np.unique(np.array(
        [zlib.crc32(s.encode()) for s in joined], dtype=np.uint64))


class MinHashSigs:
    """Per-doc minhash signature over word k-shingles; emits one row per
    LSH band: (band, key, doc_id)."""

    def __init__(self, num_perm=64, bands=16, shingle_k=3, seed=7):
        assert num_perm % bands == 0
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm, self.bands, self.k = num_perm, bands, shingle_k
        self.rows_per_band = num_perm // bands
        self.analyzer = StandardAnalyzer()

    def signature(self, text: str) -> np.ndarray | None:
        sh = _shingles(self.analyzer(text or ""), self.k)
        if len(sh) == 0:
            return None
        # h_i(x) = (a_i * x + b_i) mod p, vectorized (num_perm x n_shingles)
        vals = (self.a[:, None] * sh[None, :] + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_band, out_key, out_doc = [], [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            sig = self.signature(t)
            if sig is None:
                continue
            for b in range(self.bands):
                band = sig[b * self.rows_per_band:(b + 1) * self.rows_per_band]
                out_band.append(b)
                out_key.append(hashlib.md5(band.tobytes()).hexdigest()[:16])
                out_doc.append(d)
        return pa.table({
            "band": pa.array(out_band, pa.int32()),
            "key": pa.array(out_key, pa.string()),
            "doc_id": pa.array(out_doc, pa.int64()),
        })


def _bucket_pairs(group: pa.Table) -> pa.Table:
    docs = sorted(set(group["doc_id"].to_pylist()))
    a, b = [], []
    for x, y in combinations(docs, 2):
        a.append(x)
        b.append(y)
    return pa.table({"doc_a": pa.array(a, pa.int64()),
                     "doc_b": pa.array(b, pa.int64())})


def minhash_lsh_candidates(path: str, num_perm=64, bands=16,
                           shingle_k=3) -> ray.data.Dataset:
    """Candidate near-duplicate pairs: docs sharing >=1 LSH band bucket.
    Returns distinct (doc_a, doc_b) with doc_a < doc_b."""
    sig = read_documents(path).map_batches(
        cached_callable(MinHashSigs, num_perm=num_perm, bands=bands,
                        shingle_k=shingle_k),
        batch_format="pyarrow")
    pairs = sig.groupby(["band", "key"]).map_groups(
        _bucket_pairs, batch_format="pyarrow")
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(Count(alias_name="n_bands")) \
        .select_columns(["doc_a", "doc_b"])


def jaccard_verify(path: str, pairs: list[tuple[int, int]],
                   shingle_k=3) -> ray.data.Dataset:
    """Exact n-gram Jaccard for candidate pairs: broadcast the (small)
    involved-doc shingle sets via ray.put, map over the pair list."""
    involved = sorted({d for p in pairs for d in p})
    inv_set = set(involved)
    sh_map = {}
    analyzer = StandardAnalyzer()
    for batch in read_documents(path).iter_batches(batch_format="pyarrow"):
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            if d in inv_set:
                sh_map[d] = _shingles(analyzer(t or ""), shingle_k)
    ref = ray.put(sh_map)

    def score(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        jac = []
        for a, b in zip(batch["doc_a"].to_pylist(), batch["doc_b"].to_pylist()):
            sa, sb = m.get(a), m.get(b)
            if sa is None or sb is None or (len(sa) == 0 and len(sb) == 0):
                jac.append(0.0)
                continue
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            jac.append(inter / (len(sa) + len(sb) - inter))
        return batch.append_column("jaccard", pa.array(jac, pa.float64()))

    pair_ds = ray.data.from_items(
        [{"doc_a": a, "doc_b": b} for a, b in pairs])
    return pair_ds.map_batches(score, batch_format="pyarrow")


# --- SimHash ---------------------------------------------------------------

class SimHash:
    """64-bit simhash over term frequencies; emits (doc_id, simhash,
    band0..band3) — 16-bit bands for hamming<=3 blocking."""

    def __init__(self):
        self.analyzer = StandardAnalyzer()

    def simhash(self, text: str) -> int:
        acc = np.zeros(64, dtype=np.int64)
        terms = self.analyzer(text or "")
        if not terms:
            return 0
        from collections import Counter
        for t, c in Counter(terms).items():
            h = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little")
            bits = np.unpackbits(np.frombuffer(h.to_bytes(8, "little"),
                                               dtype=np.uint8))
            acc += c * (2 * bits.astype(np.int64) - 1)
        out = 0
        for i, v in enumerate(acc):
            if v > 0:
                out |= (1 << i)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        hs = [self.simhash(t) for t in batch["text"].to_pylist()]
        return pa.table({
            "doc_id": batch["doc_id"],
            "simhash": pa.array([h & 0x7FFFFFFFFFFFFFFF for h in hs], pa.int64()),
            **{f"band{i}": pa.array([(h >> (16 * i)) & 0xFFFF for h in hs],
                                    pa.int32()) for i in range(4)},
        })


def simhash_table(path: str) -> ray.data.Dataset:
    return read_documents(path).map_batches(
        cached_callable(SimHash), batch_format="pyarrow")


def _explode_simhash_bands(t: pa.Table) -> pa.Table:
    """wide (doc_id, simhash, band0..3) -> long (band, key, doc_id, simhash).

    One chained map stage — a union of four branches sharing the
    simhash stage would make the executor instantiate that stage per
    branch and deadlock a small cluster on pool reservations."""
    parts = []
    for i in range(4):
        parts.append(pa.table({
            "band": pa.array([i] * len(t), pa.int32()),
            "key": t.column(f"band{i}"),
            "doc_id": t.column("doc_id"),
            "simhash": t.column("simhash"),
        }))
    return pa.concat_tables(parts)


def simhash_candidates(path: str, max_hamming=3) -> ray.data.Dataset:
    """Near-dup pairs by simhash: docs sharing any 16-bit band (pigeonhole
    for hamming<=3 over 64 bits in 4 bands), verified by true hamming."""
    allb = simhash_table(path).map_batches(_explode_simhash_bands,
                                           batch_format="pyarrow")

    def pairs_verified(group: pa.Table) -> pa.Table:
        rows = sorted(zip(group["doc_id"].to_pylist(),
                          group["simhash"].to_pylist()))
        a, b, hd = [], [], []
        for (d1, h1), (d2, h2) in combinations(rows, 2):
            ham = bin(h1 ^ h2).count("1")
            if ham <= max_hamming:
                a.append(d1)
                b.append(d2)
                hd.append(ham)
        return pa.table({"doc_a": pa.array(a, pa.int64()),
                         "doc_b": pa.array(b, pa.int64()),
                         "hamming": pa.array(hd, pa.int32())})

    cand = allb.groupby(["band", "key"]).map_groups(pairs_verified,
                                                    batch_format="pyarrow")
    return cand.groupby(["doc_a", "doc_b"]).aggregate(
        Min("hamming", alias_name="hamming"))


# --- embedding near-dup ----------------------------------------------------

def embedding_neardup(path: str, threshold=0.95) -> ray.data.Dataset:
    """Pairs with cosine >= threshold. The (n_vectors x dim) matrix is
    broadcast once via ray.put; each batch matmuls against it (fine to a
    few hundred thousand vectors; beyond that use the LSH variant in
    similarity.py)."""
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    mat = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, mat))

    def find(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(ref)
        bids = batch["vec_id"].to_numpy()
        bmat = np.stack(batch["embedding"].to_pylist()).astype(np.float64)
        bmat /= np.maximum(np.linalg.norm(bmat, axis=1, keepdims=True), 1e-12)
        sims = bmat @ all_mat.T
        ii, jj = np.nonzero(sims >= threshold)
        keep = bids[ii] < all_ids[jj]  # dedupe (a<b) and self-pairs
        return pa.table({
            "vec_a": pa.array(bids[ii][keep], pa.int64()),
            "vec_b": pa.array(all_ids[jj][keep], pa.int64()),
            "cosine": pa.array(sims[ii, jj][keep], pa.float64()),
        })

    return ray.data.read_parquet(path, columns=["vec_id", "embedding"]) \
        .map_batches(find, batch_format="pyarrow")
