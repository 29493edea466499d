"""Term suggestion: prefix completion + fuzzy spell correction.

Plays the role of the reference's suggest/spellcheck modules
(``lucene/suggest/.../analyzing/AnalyzingSuggester.java`` for
completion, ``lucene/suggest/.../DirectSpellChecker.java`` for
did-you-mean): candidates come from the term dictionary (range-pruned
vocab reads), ranked by popularity (df) for completion and by
(edit distance, -df, term) for correction — DirectSpellChecker's
score ordering.
"""

from __future__ import annotations

import pyarrow as pa

from .query import _edit_distance, _prefix_upper
from .reader import IndexReader


def complete_prefix(reader: IndexReader, prefix: str, k: int = 10) -> pa.Table:
    """Top-k completions of ``prefix`` by document frequency
    (ties: term asc). Reads only the prefix's vocab row groups."""
    terms = reader.vocab(prefix, _prefix_upper(prefix))
    terms = [t for t in terms if t.startswith(prefix)]
    stats = reader.term_stats(terms)
    ranked = sorted(terms, key=lambda t: (-stats[t][0], t))[:k]
    return pa.table({
        "term": pa.array(ranked, pa.string()),
        "df": pa.array([stats[t][0] for t in ranked], pa.int64()),
    })


def spell_correct(reader: IndexReader, word: str, k: int = 5,
                  max_edits: int = 2, prefix_length: int = 1,
                  min_df: int = 1, transpositions: bool = True) -> pa.Table:
    """DirectSpellChecker analog: dictionary terms within
    ``max_edits`` (OSA distance, like FuzzyQuery), sharing the first
    ``prefix_length`` chars (the reference's default of 1 keeps the
    scan bounded), ranked by (distance, -df, term)."""
    pfx = word[:prefix_length]
    vocab = reader.vocab(pfx, _prefix_upper(pfx)) if pfx \
        else reader.vocab(None, None)
    cands = []
    for t in vocab:
        if pfx and not t.startswith(pfx):
            continue
        if abs(len(t) - len(word)) > max_edits:
            continue
        d = _edit_distance(t, word, max_edits, transpositions=transpositions)
        if d <= max_edits:
            cands.append((t, d))
    stats = reader.term_stats([t for t, _ in cands])
    cands = [(t, d) for t, d in cands if stats[t][0] >= min_df]
    cands.sort(key=lambda td: (td[1], -stats[td[0]][0], td[0]))
    cands = cands[:k]
    return pa.table({
        "term": pa.array([t for t, _ in cands], pa.string()),
        "distance": pa.array([d for _, d in cands], pa.int64()),
        "df": pa.array([stats[t][0] for t, _ in cands], pa.int64()),
    })


def _min_prefix_lev(q: str, t: str) -> int:
    """min over prefixes p of t of levenshtein(q, p) — one DP over
    (q x t), answer = min of the final row. This is FuzzySuggester's
    automaton acceptance test in DP form: a completion matches if SOME
    consumed prefix of it is within max_edits of the query."""
    nq, nt = len(q), len(t)
    prev = list(range(nt + 1))
    for i in range(1, nq + 1):
        cur = [i] + [0] * nt
        qi = q[i - 1]
        for j in range(1, nt + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (qi != t[j - 1]))
        prev = cur
    return min(prev)


def suggest_fuzzy(reader: IndexReader, query: str, k: int = 10,
                  max_edits: int = 1, non_fuzzy_prefix: int = 1,
                  min_fuzzy_length: int = 3) -> pa.Table:
    """AnalyzingSuggester + FuzzySuggester role
    (``lucene/suggest/src/java/org/apache/lucene/search/suggest/
    analyzing/AnalyzingSuggester.java:100``, ``FuzzySuggester.java:60``):
    completions of the ANALYZED query allowing up to ``max_edits``
    edits against the consumed prefix of each candidate, with the
    reference's defaults — the first ``non_fuzzy_prefix`` chars exact,
    and queries shorter than ``min_fuzzy_length`` fall back to exact
    prefix completion. Ranked by weight (df desc, term asc).

    Uses plain Levenshtein (no transpositions) so the DuckDB oracle
    (min over generate_series prefixes) reproduces the match set."""
    from ..analysis.analyzer import StandardAnalyzer

    toks = StandardAnalyzer(stop_words=frozenset())(query)
    q = toks[0] if toks else query.lower()
    if len(q) < min_fuzzy_length:
        return complete_prefix(reader, q, k)
    pfx = q[:non_fuzzy_prefix]
    vocab = reader.vocab(pfx, _prefix_upper(pfx)) if pfx \
        else reader.vocab(None, None)
    cands = []
    for t in vocab:
        if pfx and not t.startswith(pfx):
            continue
        if _min_prefix_lev(q, t) <= max_edits:
            cands.append(t)
    stats = reader.term_stats(cands)
    ranked = sorted(cands, key=lambda t: (-stats[t][0], t))[:k]
    return pa.table({
        "term": pa.array(ranked, pa.string()),
        "df": pa.array([stats[t][0] for t in ranked], pa.int64()),
    })


def complete_infix(reader: IndexReader, fragment: str,
                   k: int = 10) -> pa.Table:
    """Infix completion — the AnalyzingInfixSuggester role
    (``lucene/suggest/.../analyzing/AnalyzingInfixSuggester.java``,
    tests ``TestAnalyzingInfixSuggester.java``): dictionary terms
    CONTAINING ``fragment`` anywhere, weighted by popularity (df),
    ties by term asc. Unlike the prefix suggester the whole vocabulary
    is scanned (the reference builds a dedicated n-gram index; the
    vocab here is row-group-resident and the scan is one pass)."""
    terms = [t for t in reader.vocab(None, None) if fragment in t]
    stats = reader.term_stats(terms)
    ranked = sorted(terms, key=lambda t: (-stats[t][0], t))[:k]
    return pa.table({
        "term": pa.array(ranked, pa.string()),
        "df": pa.array([stats[t][0] for t in ranked], pa.int64()),
    })


def word_breaks(reader: IndexReader, word: str, k: int = 5,
                min_suggestion_len: int = 2) -> pa.Table:
    """Word-break suggestions — ``suggest/spell/WordBreakSpellChecker
    .java`` ``suggestWordBreaks`` role: split ``word`` into two
    dictionary terms (both with df > 0, each at least
    ``min_suggestion_len`` chars), ranked by combined popularity
    (df_left + df_right desc, then left term asc)."""
    cands = []
    for cut in range(min_suggestion_len,
                     len(word) - min_suggestion_len + 1):
        a, b = word[:cut], word[cut:]
        st = reader.term_stats([a, b])
        if st[a][0] > 0 and st[b][0] > 0:
            cands.append((a, b, st[a][0] + st[b][0]))
    cands.sort(key=lambda t: (-t[2], t[0]))
    cands = cands[:k]
    return pa.table({
        "lterm": pa.array([a for a, _, _ in cands], pa.string()),
        "rterm": pa.array([b for _, b, _ in cands], pa.string()),
        "df_sum": pa.array([s for _, _, s in cands], pa.int64()),
    })


def word_combinations(reader: IndexReader, terms: list[str],
                      k: int = 5) -> pa.Table:
    """``suggestWordCombinations``: adjacent query-term pairs whose
    concatenation is a dictionary term, ranked by the combined term's
    df desc, then position asc."""
    pairs = [(i, terms[i] + terms[i + 1])
             for i in range(len(terms) - 1)]
    st = reader.term_stats([w for _, w in pairs])
    cands = [(i, w, st[w][0]) for i, w in pairs if st[w][0] > 0]
    cands.sort(key=lambda t: (-t[2], t[0]))
    cands = cands[:k]
    return pa.table({
        "position": pa.array([i for i, _, _ in cands], pa.int64()),
        "combined": pa.array([w for _, w, _ in cands], pa.string()),
        "df": pa.array([d for _, _, d in cands], pa.int64()),
    })


# --- context-aware completion (suggest/document/ContextQuery role) ---------

def build_context_completions(doc_path: str, out_dir: str, *,
                              text_col: str = "text",
                              context_col: str = "lang",
                              batch_size: int = 4096) -> None:
    """Completion sidecar keyed by (context, term) -> df — the FST
    context-prefix trick (``ContextQuery.java`` prepends the context
    to the completion key) as a (context, term)-sorted parquet whose
    row-group stats prune BOTH dimensions. One map-combine pass:
    per-batch distinct (context, term, doc) partial dfs, one groupby
    shuffle of (context, term, n) rows."""
    import numpy as np
    import pyarrow.compute as pc

    import ray.data

    def partial(batch: pa.Table) -> pa.Table:
        flat = pc.split_pattern_regex(
            batch[text_col].combine_chunks().cast(pa.string()), r"\s+")
        ctxs = batch[context_col].to_pylist()
        terms_l, ctx_l = [], []
        for c, toks in zip(ctxs, flat.to_pylist()):
            for t in set(toks):
                if t:
                    terms_l.append(t)
                    ctx_l.append(c if c is not None else "")
        if not terms_l:
            return pa.table({"context": pa.array([], pa.string()),
                             "term": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        ctx = np.asarray(ctx_l, dtype=object)
        trm = np.asarray(terms_l, dtype=object)
        order = np.lexsort((trm.astype(str), ctx.astype(str)))
        ctx, trm = ctx[order].astype(str), trm[order].astype(str)
        new = np.empty(len(ctx), dtype=bool)
        new[0] = True
        new[1:] = (ctx[1:] != ctx[:-1]) | (trm[1:] != trm[:-1])
        starts = np.nonzero(new)[0]
        counts = np.diff(np.append(starts, len(ctx)))
        return pa.table({"context": pa.array(ctx[starts], pa.string()),
                         "term": pa.array(trm[starts], pa.string()),
                         "n": pa.array(counts.astype(np.int64))})

    (ray.data.read_parquet(doc_path, columns=[text_col, context_col])
     .map_batches(partial, batch_format="pyarrow",
                  batch_size=batch_size)
     .groupby(["context", "term"]).sum("n")
     .sort(["context", "term"])
     .write_parquet(out_dir, row_group_size=4096))


def suggest_context(index_dir: str, prefix: str, context: str,
                    k: int = 10) -> pa.Table:
    """Top-k completions of ``prefix`` among docs with ``context``
    (df desc, term asc) — a pruned read of the (context, term) sidecar."""
    import pyarrow.parquet as pq

    upper = _prefix_upper(prefix)
    filters = [("context", "=", context), ("term", ">=", prefix)]
    if upper is not None:
        filters.append(("term", "<", upper))
    t = pq.read_table(index_dir, filters=filters)
    terms = t["term"].to_pylist()
    dfs = t["sum(n)"].to_pylist()
    ranked = sorted(zip(terms, dfs), key=lambda kv: (-kv[1], kv[0]))[:k]
    return pa.table({
        "term": pa.array([t for t, _ in ranked], pa.string()),
        "df": pa.array([int(n) for _, n in ranked], pa.int64()),
    })


def jaro_winkler(s1: str, s2: str, p: float = 0.1,
                 boost_threshold: float = 0.7) -> float:
    """Jaro-Winkler similarity (Winkler 1990) — the
    ``JaroWinklerDistance`` StringDistance of the spellchecker module
    (``suggest/spell/JaroWinklerDistance.java``): standard Jaro with
    the common-prefix (<= 4) bonus applied above the 0.7 threshold.
    Matches DuckDB's ``jaro_winkler_similarity`` bit-for-bit on
    non-empty strings (the oracle kernel)."""
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    if not l1 or not l2:
        return 0.0
    md = max(l1, l2) // 2 - 1
    m1 = [False] * l1
    m2 = [False] * l2
    matches = 0
    for i in range(l1):
        lo, hi = max(0, i - md), min(i + md + 1, l2)
        for j in range(lo, hi):
            if not m2[j] and s1[i] == s2[j]:
                m1[i] = m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    j = (matches / l1 + matches / l2 + (matches - t) / matches) / 3.0
    if j > boost_threshold:
        pre = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            pre += 1
        j += pre * p * (1 - j)
    return j


def spell_correct_jw(reader: IndexReader, word: str, k: int = 5,
                     max_edits: int = 2) -> pa.Table:
    """DirectSpellChecker with the JaroWinkler StringDistance
    (``setDistance(new JaroWinklerDistance())`` configuration):
    candidates within ``max_edits`` plain Levenshtein of the word,
    ranked by Jaro-Winkler similarity desc (quantized integer grid),
    term asc on ties; the word itself excluded."""
    import numpy as np

    from .query import FuzzyQuery, expand_terms, expansion_range

    fq = FuzzyQuery(word, max_edits=max_edits, prefix_length=0,
                    transpositions=False)
    lo, hi = expansion_range(fq)
    cands = [t for t in expand_terms(fq, reader.vocab(lo, hi))
             if t != word]
    if not cands:
        return pa.table({"term": pa.array([], pa.large_string()),
                         "rank": pa.array([], pa.int64())})
    keys = np.array([int(np.floor(jaro_winkler(word, t) * 1e9))
                     for t in cands], dtype=np.int64)
    terms = np.array(cands)
    order = np.lexsort((terms, -keys))[:k]
    return pa.table({
        "term": pa.array(terms[order].tolist(), pa.large_string()),
        "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
    })
