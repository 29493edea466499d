"""Suggest: prefix completion (AnalyzingSuggester role) + spell
correction (DirectSpellChecker role)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.index import build_index
from lucene_ray.search import IndexReader
from lucene_ray.search.suggest import complete_prefix, spell_correct


@pytest.fixture(scope="module")
def sugg_index(ray_session, tmp_path_factory):
    texts = (["merge sort"] * 10 + ["merged lists"] * 5 + ["memory map"] * 3
             + ["metric space"] * 7 + ["zebra"] * 2)
    t = pa.table({"doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                  "text": pa.array(texts, pa.string())})
    d = tmp_path_factory.mktemp("sugg")
    path = str(d / "docs.parquet")
    pq.write_table(t, path)
    out = str(d / "idx")
    build_index(path, out, batch_size=10)
    return IndexReader(out)


def test_complete_prefix_df_order(sugg_index):
    got = complete_prefix(sugg_index, "me", k=10).to_pylist()
    assert [r["term"] for r in got] == ["merge", "metric", "merged", "memory"]
    assert [r["df"] for r in got] == [10, 7, 5, 3]
    assert complete_prefix(sugg_index, "zz", 5).num_rows == 0


def test_spell_correct_ranking(sugg_index):
    got = spell_correct(sugg_index, "merge", k=5).to_pylist()
    assert got[0]["term"] == "merge" and got[0]["distance"] == 0
    got = spell_correct(sugg_index, "merg", k=5).to_pylist()
    # distance 1 candidates ranked by df desc: merge(10) before merged(2 ed)
    assert got[0]["term"] == "merge"
    # transpositions: "mrege" is 1 OSA edit from "merge"
    got = spell_correct(sugg_index, "mrege", k=3).to_pylist()
    assert got[0]["term"] == "merge" and got[0]["distance"] == 1
    got = spell_correct(sugg_index, "mrege", k=3,
                        transpositions=False).to_pylist()
    assert got[0]["distance"] == 2  # plain Levenshtein needs 2


def test_freetext_suggester(ray_session, tmp_path_factory):
    """FreeTextSuggester role: bigram-LM next-word ranking with unigram
    backoff (suggest/analyzing/FreeTextSuggester.java;
    TestFreeTextSuggester.java shapes)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from lucene_ray.pipelines.text_analysis import suggest_freetext

    texts = (["data merge now"] * 5          # data->merge x5
             + ["data model here"] * 3      # data->model x3
             + ["big merge job"] * 4        # merge unigrams, no data ctx
             + ["data x metric"])           # metric unigram only
    d = tmp_path_factory.mktemp("freetext")
    path = str(d / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts)}), path)
    got = suggest_freetext(path, "data", "m", k=10).to_pylist()
    terms = [r["term"] for r in got]
    # bigram hits first (merge 5 > model 3), then backoff by unigram
    assert terms[:2] == ["merge", "model"]
    assert got[0]["bg_count"] == 5 and got[0]["ug_count"] == 9
    assert got[1]["bg_count"] == 3
    # backoff candidate: metric (no data-bigram), unigram 1
    assert ("metric", 0) in [(r["term"], r["bg_count"]) for r in got]
    assert [r["rank"] for r in got] == list(range(1, len(got) + 1))


def test_context_completions(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from lucene_ray.search.suggest import (build_context_completions,
                                           suggest_context)
    rng = np.random.default_rng(91)
    vocab = ["spark", "sort", "scan", "small", "merge", "data"]
    texts, langs = [], []
    for i in range(300):
        texts.append(" ".join(rng.choice(vocab, int(rng.integers(2, 9)))))
        langs.append(str(rng.choice(["en", "de"])))
    t = pa.table({"doc_id": pa.array(np.arange(300, dtype=np.int64)),
                  "text": pa.array(texts, pa.string()),
                  "lang": pa.array(langs, pa.string())})
    p = str(tmp_path / "docs.parquet")
    pq.write_table(t, p)
    out = str(tmp_path / "ctx")
    build_context_completions(p, out)
    got = suggest_context(out, "s", "en", 10).to_pylist()
    from collections import Counter
    want = Counter()
    for txt, lg in zip(texts, langs):
        if lg != "en":
            continue
        for w in set(txt.split()):
            if w.startswith("s"):
                want[w] += 1
    ranked = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r["term"], r["df"]) for r in got] == ranked
    # a context with no matching terms
    assert len(suggest_context(out, "zz", "en", 5)) == 0
