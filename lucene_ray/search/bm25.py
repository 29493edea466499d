"""BM25 scoring — exact float32 reproduction of the reference formula.

``search/similarities/BM25Similarity.java``:
- idf:   ``(float) Math.log(1 + (docCount - docFreq + 0.5) / (docFreq + 0.5))`` (:104)
- avgdl: ``(float) (sumTotalTermFreq / (double) docCount)`` (:110)
- cache: ``cache[i] = 1f / (k1 * ((1 - b) + b * LENGTH_TABLE[i] / avgdl))`` (:204-207)
- score: ``weight - weight / (1 + freq * cache[norm & 0xFF])`` (:240-247),
  float (not double) arithmetic order preserved via numpy float32.

Multi-term scores are summed in double then cast to float
(DisjunctionSumScorer/ConjunctionScorer accumulate in double).

A float64 "exact-dl" variant (no norm quantization) is provided for the
SQL-oracle correctness gate, where DuckDB computes the same expression
in double precision.
"""

from __future__ import annotations

import math

import numpy as np

from ..analysis.smallfloat import LENGTH_TABLE

K1 = 1.2
B = 0.75


def idf(doc_freq: int, doc_count: int) -> np.float32:
    return np.float32(math.log(1 + (doc_count - doc_freq + 0.5) / (doc_freq + 0.5)))


def avg_field_length(sum_total_term_freq: int, doc_count: int) -> np.float32:
    return np.float32(sum_total_term_freq / float(doc_count))


def norm_inverse_cache(avgdl: np.float32, k1: float = K1, b: float = B) -> np.ndarray:
    """float32[256]: 1 / (k1 * ((1-b) + b * LENGTH_TABLE[i] / avgdl))."""
    k1 = np.float32(k1)
    b = np.float32(b)
    one = np.float32(1)
    return (one / (k1 * ((one - b) + b * LENGTH_TABLE / np.float32(avgdl)))).astype(np.float32)


def term_weight(boost: float, df: int, doc_count: int) -> np.float32:
    return np.float32(np.float32(boost) * idf(df, doc_count))


def score_freqs(freqs: np.ndarray, norm_bytes: np.ndarray, weight: np.float32,
                cache: np.ndarray) -> np.ndarray:
    """Vectorized float32 ``weight - weight / (1 + freq * normInverse)``."""
    norm_inv = cache[np.asarray(norm_bytes, dtype=np.uint8)]
    f = np.asarray(freqs, dtype=np.float32)
    one = np.float32(1)
    return (weight - weight / (one + f * norm_inv)).astype(np.float32)


def max_block_scores(imp_freqs: np.ndarray, imp_norms: np.ndarray,
                     imp_offsets: np.ndarray, weight: np.float32,
                     cache: np.ndarray) -> np.ndarray:
    """Per-block score upper bounds from impact skylines
    (MaxScoreCache.java:60-130 semantics): max over competitive
    (freq, norm) pairs of the float32 score."""
    if len(imp_freqs) == 0:
        return np.empty(0, dtype=np.float32)
    pair_scores = score_freqs(imp_freqs, imp_norms, weight, cache)
    offs = np.asarray(imp_offsets)
    # segment max per block; guard empty blocks (offsets may repeat)
    valid = offs[:-1] < offs[1:]
    out = np.zeros(len(offs) - 1, dtype=np.float32)
    if valid.any():
        red = np.maximum.reduceat(pair_scores, offs[:-1][valid])
        out[valid] = red
    return out


# --- float64 exact-dl variant (SQL-oracle mode) ---------------------------

def score64(tf: np.ndarray, dl: np.ndarray, df: int, doc_count: int,
            avgdl: float, k1: float = K1, b: float = B) -> np.ndarray:
    """Double-precision BM25 with exact doc lengths (no norm byte), the
    same expression an ANSI-SQL oracle computes:
    ``ln(1 + (N-df+0.5)/(df+0.5)) * tf / (tf + k1*(1-b+b*dl/avgdl))``."""
    w = math.log(1 + (doc_count - df + 0.5) / (df + 0.5))
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    return w * tf / (tf + k1 * (1 - b + b * dl / avgdl))
