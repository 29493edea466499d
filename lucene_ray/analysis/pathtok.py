"""Path-hierarchy tokenizer (``lucene/analysis/common/src/java/org/
apache/lucene/analysis/path/PathHierarchyTokenizer.java:45``): turn
``/a/b/c`` into the growing prefixes ``/a``, ``/a/b``, ``/a/b/c`` —
the facet-path ingestion staple. ``delimiter`` chars are rewritten to
``replacement`` in the emitted tokens; ``skip`` drops the first N
delimiter-separated components (offsets shift accordingly); a trailing
delimiter emits one final token that includes it. The first token has
position increment 1, every longer prefix 0 (all at one position).

The state machine below mirrors the reference's incrementToken() char
loop (same skipped/endDelimiter bookkeeping), so the transcribed
goldens from ``TestPathHierarchyTokenizer.java`` hold verbatim.
"""

from __future__ import annotations

from dataclasses import dataclass

DEFAULT_DELIMITER = "/"
DEFAULT_SKIP = 0


@dataclass(frozen=True)
class PathToken:
    term: str
    start: int
    end: int
    pos_inc: int


class PathHierarchyTokenizer:
    def __init__(self, delimiter: str = DEFAULT_DELIMITER,
                 replacement: str | None = None, skip: int = DEFAULT_SKIP):
        if skip < 0:
            raise ValueError("skip cannot be negative")
        if len(delimiter) != 1:
            raise ValueError("delimiter must be a single char")
        self.delimiter = delimiter
        self.replacement = delimiter if replacement is None else replacement
        self.skip = skip

    def tokenize(self, text: str) -> list[PathToken]:
        out: list[PathToken] = []
        d, rep, skip = self.delimiter, self.replacement, self.skip
        it = iter(text)
        result = ""          # resultToken: the running prefix
        start_position = 0
        skipped = 0
        end_delimiter = False
        eof = False
        while not eof:
            term = result
            pos_inc = 1 if not result else 0
            added = False
            if end_delimiter:
                term += rep
                end_delimiter = False
                added = True
            while True:
                c = next(it, None)
                if c is None:
                    eof = True
                    if skipped > skip:
                        if added:
                            result = term
                            out.append(PathToken(term, start_position,
                                                 start_position + len(term),
                                                 pos_inc))
                    break
                if not added:
                    added = True
                    skipped += 1
                    if skipped > skip:
                        term += rep if c == d else c
                    else:
                        start_position += 1
                elif c == d:
                    if skipped > skip:
                        end_delimiter = True
                        break
                    skipped += 1
                    if skipped > skip:
                        term += rep
                    else:
                        start_position += 1
                else:
                    if skipped > skip:
                        term += c
                    else:
                        start_position += 1
            if not eof:
                out.append(PathToken(term, start_position,
                                     start_position + len(term), pos_inc))
                result = term
        return out

    def __call__(self, text: str) -> list[str]:
        return [t.term for t in self.tokenize(text)]


class ReversePathHierarchyTokenizer:
    """Domain-like hierarchies (``path/ReversePathHierarchyTokenizer
    .java:48``): ``www.site.co.uk`` -> ``www.site.co.uk``,
    ``site.co.uk``, ``co.uk``, ``uk`` — suffixes starting after each
    delimiter, all ending at the last kept position; ``skip`` drops the
    trailing N components."""

    def __init__(self, delimiter: str = DEFAULT_DELIMITER,
                 replacement: str | None = None, skip: int = DEFAULT_SKIP):
        if skip < 0:
            raise ValueError("skip cannot be negative")
        if len(delimiter) != 1:
            raise ValueError("delimiter must be a single char")
        self.delimiter = delimiter
        self.replacement = delimiter if replacement is None else replacement
        self.skip = skip

    def tokenize(self, text: str) -> list[PathToken]:
        buf = text.replace(self.delimiter, self.replacement)
        positions = [0]
        for i, c in enumerate(text):
            if c == self.delimiter:
                positions.append(i + 1)
        if positions[-1] < len(text):
            positions.append(len(text))
        count = len(positions)
        idx = count - 1 - self.skip
        if idx < 0:
            return []
        end = positions[idx]
        out = []
        for si in range(count - self.skip - 1):
            start = positions[si]
            out.append(PathToken(buf[start:end], start, end,
                                 1 if si == 0 else 0))
        return out

    def __call__(self, text: str) -> list[str]:
        return [t.term for t in self.tokenize(text)]
