"""Multi-field documents: per-field indexes sharing global docIDs.

The reference keeps per-field postings/norms/stats inside one segment
(``index/FieldInfos.java``; per-field terms in the same .tim). The
Ray-Data-first layout builds one single-field index PER FIELD under
``<out>/fields/<name>/`` — same global docIDs throughout, so cross-
field boolean queries combine on docID with exact per-field BM25 stats
(per-field avgdl/idf/norms fall out for free). Each field can carry its
own analyzer (body: StandardAnalyzer, url/lang: KeywordAnalyzer).

Field builds are sequential Ray jobs over column-pruned reads; at scale
each is the same streaming build pipeline, and a field only reads its
own column.
"""

from __future__ import annotations

import json
import os

from .builder import build_index
from .manifest import IndexManifest


def build_multi_field_index(
    source,
    out_dir: str,
    fields: dict,  # field name -> analyzer (None = StandardAnalyzer)
    *,
    id_col: str = "doc_id",
    stored_cols: tuple = (),
    stop_words: frozenset = frozenset(),
    batch_size: int = 4096,
    index_positions: bool = False,
    mode: str = "create_or_append",
) -> dict[str, IndexManifest]:
    """Build (or append to) one index per field. Returns manifests by
    field. ``fields`` order matters: the FIRST field is the default
    search field."""
    os.makedirs(out_dir, exist_ok=True)
    manifests = {}
    for f, analyzer in fields.items():
        fdir = os.path.join(out_dir, "fields", f)
        manifests[f] = build_index(
            source, fdir, text_col=f, id_col=id_col,
            stored_cols=stored_cols, stop_words=stop_words,
            batch_size=batch_size, index_positions=index_positions,
            analyzer=analyzer, mode=mode)
    meta = {"fields": list(fields.keys()), "default_field": next(iter(fields))}
    with open(os.path.join(out_dir, "multi_field.json"), "w") as fh:
        json.dump(meta, fh)
    return manifests


def read_multi_field_meta(out_dir: str) -> dict:
    with open(os.path.join(out_dir, "multi_field.json")) as fh:
        return json.load(fh)
