"""Index manifest: generation-numbered, atomically-written checkpoint.

Plays the role of the reference's ``segments_N`` two-phase commit
(``index/SegmentInfos.java:55-64,132-134``, ``IndexWriter.java:4020``):
write ``pending_manifest_N.json``, fsync, atomic rename to
``manifest_N.json``; readers open the highest complete generation.
Each segment entry records its input lineage (source file/row-range or
doc range + row count) so an interrupted build can skip finished
segments on resume.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field


@dataclass
class SegmentInfo:
    seg_id: str
    num_docs: int  # maxDoc-like: all docs in the segment incl. tombstoned
    min_doc: int
    max_doc: int
    sum_doc_len: int
    num_terms: int
    lineage: str = ""  # input provenance (file/row-range fingerprint)
    field_doc_count: int = 0  # docs with >=1 term (CollectionStatistics.docCount)
    # live-docs generation (Lucene90LiveDocsFormat analog): deletes live
    # in segments/<id>/deletes_gen<del_gen>.parquet; -1 = none
    del_gen: int = -1
    del_count: int = 0
    # numeric doc-values update generation (the .dvd-gen analog,
    # IndexWriter.updateNumericDocValue): overlay rows live in
    # segments/<id>/dv_updates_gen<dvu_gen>.parquet; -1 = none
    dvu_gen: int = -1

    @property
    def live_docs(self) -> int:
        return self.num_docs - self.del_count

    @property
    def paths(self):
        return (f"segments/{self.seg_id}/postings.parquet",
                f"segments/{self.seg_id}/docs.parquet")


@dataclass
class IndexManifest:
    generation: int
    num_docs: int
    sum_doc_len: int
    field: str
    stop_words: list[str]
    segments: list[SegmentInfo] = field(default_factory=list)
    field_doc_count: int = 0

    @property
    def num_deleted(self) -> int:
        return sum(s.del_count for s in self.segments)

    @property
    def live_docs(self) -> int:
        return self.num_docs - self.num_deleted

    @property
    def avgdl_stats(self):
        # docCount counts docs that actually contain the field
        # (CollectionStatistics semantics, BM25Similarity.java:110)
        return {"doc_count": self.field_doc_count,
                "sum_total_term_freq": self.sum_doc_len}

    def to_json(self) -> str:
        d = asdict(self)
        return json.dumps(d, indent=1, sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "IndexManifest":
        d = json.loads(s)
        d["segments"] = [SegmentInfo(**x) for x in d["segments"]]
        return IndexManifest(**d)


def write_manifest(index_dir: str, m: IndexManifest) -> str:
    """Two-phase commit: pending file + fsync + atomic rename."""
    os.makedirs(index_dir, exist_ok=True)
    pending = os.path.join(index_dir, f"pending_manifest_{m.generation}.json")
    final = os.path.join(index_dir, f"manifest_{m.generation}.json")
    with open(pending, "w") as f:
        f.write(m.to_json())
        f.flush()
        os.fsync(f.fileno())
    os.rename(pending, final)
    return final


def latest_generation(index_dir: str) -> int:
    gens = []
    if not os.path.isdir(index_dir):
        return -1
    for name in os.listdir(index_dir):
        if name.startswith("manifest_") and name.endswith(".json"):
            try:
                gens.append(int(name[len("manifest_"):-len(".json")]))
            except ValueError:
                pass
    return max(gens) if gens else -1


def read_manifest(index_dir: str, generation: int | None = None) -> IndexManifest:
    gen = latest_generation(index_dir) if generation is None else generation
    if gen < 0:
        raise FileNotFoundError(f"no manifest in {index_dir}")
    with open(os.path.join(index_dir, f"manifest_{gen}.json")) as f:
        return IndexManifest.from_json(f.read())
