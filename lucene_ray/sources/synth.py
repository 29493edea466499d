"""Deterministic synthetic Common-Crawl-style pages table (FIXTURES.md F1).

Schema per BASELINE.json input_hint:
(url: string, warc_ts: timestamp[us], html: binary, text: string,
lang: string) + a monotone int64 ``doc_id`` (the global docID).

Zipf-distributed vocabulary (s~1.1, ~10k terms), 5-500 tokens per doc,
2% of docs salted with Unicode edge cases; seed-fixed => byte-identical
across runs.
"""

from __future__ import annotations

import datetime
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_UNICODE_SALT = [
    "O'Reilly don't 21.35 216.239.63.104",
    "我是中国人 仮名遣い カタカナ",
    "안녕하세요 한글입니다",
    "การที่ได้ต้องแสดงว่างานดี",
    "Վիքիպեդիայի 13 միլիոն",
    "💩 👩‍❤️‍👩 🇺🇸 3️⃣",
    "moͤchte İstanbul ΣΟΦΟΣ",
    "A:B_A:B 1.2_1.2 some-dashed-phrase",
]


def _vocab(n_terms: int, rng: np.random.Generator) -> list[str]:
    letters = "abcdefghijklmnopqrstuvwxyz"
    out = []
    seen = set()
    while len(out) < n_terms:
        ln = int(rng.integers(2, 11))
        w = "".join(letters[i] for i in rng.integers(0, 26, size=ln))
        if w not in seen:
            seen.add(w)
            out.append(w)
    return out


def synth_pages(n_rows: int, seed: int = 42, n_terms: int = 10_000,
                start: int = 0, vocab_seed: int | None = None) -> pa.Table:
    """``start`` offsets doc_id/url/warc_ts so large corpora can be
    generated part-by-part without holding everything in RAM;
    ``vocab_seed`` keeps ONE shared Zipf vocabulary across parts."""
    rng = np.random.default_rng(seed)
    vocab = np.array(_vocab(n_terms, np.random.default_rng(
        seed if vocab_seed is None else vocab_seed)))
    # Zipf s~1.1 over ranks
    ranks = np.arange(1, n_terms + 1, dtype=np.float64)
    probs = ranks ** -1.1
    probs /= probs.sum()
    lens = rng.integers(5, 501, size=n_rows)
    total = int(lens.sum())
    flat = rng.choice(n_terms, size=total, p=probs)
    offs = np.concatenate([[0], np.cumsum(lens)])
    texts = []
    for i in range(n_rows):
        words = vocab[flat[offs[i]:offs[i + 1]]]
        t = " ".join(words.tolist())
        if i % 50 == 7:  # ~2% unicode salt
            t = t + " " + _UNICODE_SALT[i % len(_UNICODE_SALT)]
        texts.append(t)
    base_ts = datetime.datetime(2024, 1, 1)
    ids = range(start, start + n_rows)
    urls = [f"https://site{i % 97}.example/p/{i}" for i in ids]
    return pa.table({
        "doc_id": pa.array(np.arange(start, start + n_rows, dtype=np.int64)),
        "url": pa.array(urls, type=pa.string()),
        "warc_ts": pa.array(
            [base_ts + datetime.timedelta(seconds=int(i)) for i in ids],
            type=pa.timestamp("us")),
        "html": pa.array([b"<html><body>" + t.encode() + b"</body></html>"
                          for t in texts], type=pa.binary()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array([("en", "de", "zh", "")[i % 20 % 4] if i % 20 < 4 else "en"
                          for i in ids], type=pa.string()),
    })


def write_pages(out_dir: str, n_rows: int, n_parts: int = 1, seed: int = 42,
                n_terms: int = 10_000) -> list[str]:
    """Write the pages table as ``n_parts`` parquet files (doc_id-ordered,
    generated part-by-part to bound RAM; deterministic per-part seeds)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    per = (n_rows + n_parts - 1) // n_parts
    for p in range(n_parts):
        n = min(per, n_rows - p * per)
        if n <= 0:
            break
        t = synth_pages(n, seed=seed * 100_003 + p, n_terms=n_terms,
                        start=p * per, vocab_seed=seed)
        path = os.path.join(out_dir, f"pages-{p:05d}.parquet")
        pq.write_table(t, path)
        paths.append(path)
    return paths
