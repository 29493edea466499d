"""Japanese morphological tokenization — the kuromoji role.

Plays the part of ``lucene/analysis/kuromoji/src/java/org/apache/
lucene/analysis/ja/JapaneseTokenizer.java:58``: a Viterbi lattice over
a morpheme dictionary in the public MeCab/IPADIC CSV shape
``surface,left_id,right_id,word_cost,pos,...``, with a connection-cost
matrix between context ids, unknown-word entries driven by character
classes (char.def role), and kuromoji's SEARCH mode decomposition
penalty (long kanji runs pay ``(len-2)*3000``, long other runs
``(len-7)*1700`` — the published ViterbiNBest constants) so compound
nouns split into searchable parts.

The production IPADIC/UniDic binary is NOT bundled (no network, and
the point here is the engine): ``JapaneseTokenizer`` accepts any
dictionary in the CSV shape via :func:`load_dictionary`, and ships a
small self-authored ``MINI_LEXICON`` (common particles, copulas,
pronouns, and a noun vocabulary) whose goldens in
``tests/test_japanese.py`` exercise the lattice mechanics: minimal-
cost segmentation beating greedy longest-match, unknown-word grouping
by script class, and search-mode compound splitting. The algorithm is
the published MeCab lattice (Kudo et al. 2004), not a translation of
the Java.

Scale shape: the dictionary object is picklable and built once per
actor (``__init__`` of the indexing stage / the ``analyzer=`` hook of
``build_index``); tokenization is pure CPU per batch.
"""

from __future__ import annotations

import os
import unicodedata
from dataclasses import dataclass

# character classes (CharacterDefinition role)
KANJI, HIRAGANA, KATAKANA, ALPHA, DIGIT, SYMBOL, SPACE = range(7)

# unknown-word handling per class:
# (invoke_always, group_run, max_len, word_cost)
# (char.def semantics: KATAKANA/ALPHA/DIGIT runs group into one token;
# KANJI unknowns are per-character; HIRAGANA unknown runs are capped
# at 2 chars, as in the IPADIC char.def, so unknown grouping can never
# swallow a segmentable phrase)
_UNK = {
    KANJI: (False, False, 1, 11000),
    HIRAGANA: (False, True, 2, 12000),
    KATAKANA: (True, True, 16, 9000),
    ALPHA: (True, True, 16, 9000),
    DIGIT: (True, True, 16, 9000),
    SYMBOL: (True, True, 16, 13000),
    SPACE: (True, True, 16, 0),
}

# search-mode decomposition penalty (ViterbiNBest.java:82-103)
SEARCH_MODE_KANJI_LENGTH = 2
SEARCH_MODE_OTHER_LENGTH = 7
SEARCH_MODE_KANJI_PENALTY = 3000
SEARCH_MODE_OTHER_PENALTY = 1700


def char_class(c: str) -> int:
    o = ord(c)
    if 0x3040 <= o <= 0x309F:
        return HIRAGANA
    if 0x30A0 <= o <= 0x30FF or 0x31F0 <= o <= 0x31FF or o == 0xFF70 or \
            0xFF66 <= o <= 0xFF9D:
        return KATAKANA
    if 0x4E00 <= o <= 0x9FFF or 0x3400 <= o <= 0x4DBF or o == 0x3005:
        return KANJI
    if c.isspace():
        return SPACE
    if c.isdigit() or 0xFF10 <= o <= 0xFF19:
        return DIGIT
    cat = unicodedata.category(c)
    if cat.startswith("L"):
        return ALPHA
    return SYMBOL


@dataclass(frozen=True)
class Morpheme:
    surface: str
    left_id: int
    right_id: int
    cost: int
    pos: str


class JapaneseDictionary:
    """Morpheme entries + connection costs.

    ``entries``: list of Morpheme. ``conn``: dict
    ``(right_id_of_prev, left_id_of_next) -> cost`` with a default.
    Context ids here are small POS-derived classes (a full IPADIC
    matrix plugs in unchanged — the lookup is by id pair)."""

    def __init__(self, entries, conn=None, default_conn: int = 0):
        self.by_first: dict[str, list[Morpheme]] = {}
        for m in entries:
            self.by_first.setdefault(m.surface[0], []).append(m)
        for v in self.by_first.values():
            v.sort(key=lambda m: (-len(m.surface), m.cost))
        self.conn = conn or {}
        self.default_conn = default_conn

    def prefix_matches(self, text: str, pos: int):
        for m in self.by_first.get(text[pos], ()):
            if text.startswith(m.surface, pos):
                yield m

    def connection(self, right_prev: int, left_next: int) -> int:
        return self.conn.get((right_prev, left_next), self.default_conn)


def load_dictionary(csv_lines, conn=None,
                    default_conn: int = 0) -> JapaneseDictionary:
    """MeCab/IPADIC CSV shape: surface,left_id,right_id,cost,pos[,...]"""
    entries = []
    for line in csv_lines:
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        p = line.split(",")
        entries.append(Morpheme(p[0], int(p[1]), int(p[2]), int(p[3]),
                                p[4] if len(p) > 4 else ""))
    return JapaneseDictionary(entries, conn, default_conn)


# context-id classes for the mini lexicon (a real IPADIC matrix has
# ~1300 ids; the lattice only ever looks ids up pairwise)
_ID_NOUN, _ID_PARTICLE, _ID_VERB, _ID_AUX, _ID_PRONOUN, _ID_SUFFIX = \
    range(6)

# small self-authored lexicon: surface,left,right,cost,pos
MINI_LEXICON = [
    # nouns
    *(f"{w},{_ID_NOUN},{_ID_NOUN},{c},名詞" for w, c in [
        ("東京", 3000), ("京都", 3000), ("大阪", 3000), ("日本", 3000),
        ("関西", 3500), ("国際", 3500), ("空港", 3500), ("関西国際空港", 9000),
        ("大学", 3000), ("学生", 3000), ("日本語", 4000), ("語", 5000),
        ("電車", 3000), ("駅", 4000), ("すもも", 3500), ("もも", 3600),
        ("うち", 3800), ("雨", 4000), ("天気", 3500), ("今日", 3200),
        ("寿司", 3500), ("犬", 4000), ("猫", 4000), ("本", 4500),
    ]),
    # suffixes (都/府/県 after place nouns)
    *(f"{w},{_ID_SUFFIX},{_ID_NOUN},{c},接尾" for w, c in [
        ("都", 4500), ("府", 4500), ("県", 4500),
    ]),
    # pronouns
    *(f"{w},{_ID_PRONOUN},{_ID_PRONOUN},{c},代名詞" for w, c in [
        ("私", 3500), ("彼", 3800), ("彼女", 3800),
    ]),
    # particles
    *(f"{w},{_ID_PARTICLE},{_ID_PARTICLE},{c},助詞" for w, c in [
        ("は", 2500), ("が", 2500), ("を", 2500), ("に", 2500),
        ("の", 2500), ("で", 2600), ("と", 2600), ("も", 2500),
        ("へ", 2600), ("から", 2800), ("まで", 2800),
    ]),
    # verbs / auxiliaries
    *(f"{w},{_ID_VERB},{_ID_VERB},{c},動詞" for w, c in [
        ("行く", 4000), ("行き", 4200), ("住む", 4000), ("食べ", 4200),
        ("食べる", 4000), ("見る", 4000), ("勉強", 3800), ("し", 4800),
    ]),
    *(f"{w},{_ID_AUX},{_ID_AUX},{c},助動詞" for w, c in [
        ("です", 3000), ("でし", 3400), ("ます", 3000), ("まし", 3400),
        ("た", 3200), ("て", 3200), ("ない", 3400),
    ]),
]

# connection preferences: particles bind tightly after nouns/pronouns,
# suffixes after nouns, auxiliaries after verbs; noun-noun adjacency
# pays a little (so single known compounds win, but search mode still
# splits long ones)
MINI_CONN = {
    (_ID_NOUN, _ID_PARTICLE): -1500,
    (_ID_PRONOUN, _ID_PARTICLE): -1500,
    (_ID_NOUN, _ID_SUFFIX): -2000,
    (_ID_VERB, _ID_AUX): -2000,
    (_ID_AUX, _ID_AUX): -1000,
    (_ID_PARTICLE, _ID_NOUN): -500,
    (_ID_PARTICLE, _ID_VERB): -500,
    (_ID_NOUN, _ID_NOUN): 1200,
}


def mini_dictionary() -> JapaneseDictionary:
    return load_dictionary(MINI_LEXICON, MINI_CONN, default_conn=0)


def load_matrix_def(lines) -> dict:
    """MeCab ``matrix.def``: header ``L R`` then ``left right cost``
    triplets; lookup key is (right_id of previous, left_id of next) —
    the ConnectionCosts.get(forwardId, backwardId) contract
    (``kuromoji/.../dict/ConnectionCosts.java``)."""
    conn = {}
    it = iter(lines)
    header = next(it, "").split()
    if len(header) != 2 or not all(x.isdigit() for x in header):
        raise ValueError("matrix.def must start with 'L R' header")
    for line in it:
        line = line.strip()
        if not line:
            continue
        l, r, c = line.split()
        conn[(int(l), int(r))] = int(c)
    return conn


def parse_char_def(lines) -> dict[str, list[tuple[int, int]]]:
    """MeCab ``char.def``: category declarations + codepoint ranges
    ``0xLO..0xHI CATEGORY``. Returns {category: [(lo, hi), ...]}."""
    ranges: dict[str, list[tuple[int, int]]] = {}
    for line in lines:
        line = line.split("#")[0].strip()
        if not line or not line.startswith("0x"):
            continue
        parts = line.split()
        span, cat = parts[0], parts[1]
        if ".." in span:
            lo, hi = span.split("..")
        else:
            lo = hi = span
        ranges.setdefault(cat, []).append((int(lo, 16), int(hi, 16)))
    return ranges


def parse_unk_def(lines) -> dict[str, tuple[int, int, int, str]]:
    """MeCab ``unk.def``: per-category unknown-word entries in the same
    CSV shape (CATEGORY,left,right,cost,features...)."""
    out = {}
    for line in lines:
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        p = line.split(",")
        out.setdefault(p[0], (int(p[1]), int(p[2]), int(p[3]),
                              p[4] if len(p) > 4 else ""))
    return out


def load_mecab_dir(path: str, encoding: str = "utf-8") \
        -> JapaneseDictionary:
    """Production-dictionary load path: build a JapaneseDictionary from
    a REAL-format MeCab/IPADIC (or mecab-ko-dic) directory — ``*.csv``
    morpheme entries (13-field IPADIC rows work as-is), ``matrix.def``
    connection costs, and optional ``char.def``/``unk.def`` (parsed and
    attached as ``.char_ranges``/``.unk_entries``; the tokenizer's
    built-in unknown-word model already implements the IPADIC char.def
    semantics, so those files are validated rather than re-wired).
    Mirrors the reference's own external-dictionary flow
    (``kuromoji/.../dict/TestExternalDictionary.java:40-71``,
    ``DictionaryBuilder.build(IPADIC, dir, ...)``). A full IPADIC /
    mecab-ko-dic download drops in unchanged."""
    import glob as _glob
    csv_lines: list[str] = []
    for p in sorted(_glob.glob(os.path.join(path, "*.csv"))):
        with open(p, encoding=encoding) as f:
            csv_lines.extend(f.read().splitlines())
    if not csv_lines:
        raise ValueError(f"no *.csv dictionary entries under {path}")
    conn = {}
    mpath = os.path.join(path, "matrix.def")
    if os.path.exists(mpath):
        with open(mpath, encoding=encoding) as f:
            conn = load_matrix_def(f.read().splitlines())
    d = load_dictionary(csv_lines, conn, default_conn=0)
    for name, parser, attr in (("char.def", parse_char_def,
                                "char_ranges"),
                               ("unk.def", parse_unk_def,
                                "unk_entries")):
        fp = os.path.join(path, name)
        if os.path.exists(fp):
            with open(fp, encoding=encoding) as f:
                setattr(d, attr, parser(f.read().splitlines()))
    return d


@dataclass(frozen=True)
class JaToken:
    surface: str
    start: int
    end: int
    pos: str


_UNK_LEFT_ID = 99  # context id for unknown words (one class)


class JapaneseTokenizer:
    """Viterbi lattice tokenizer (JapaneseTokenizer.java role).

    ``mode``: "normal" = pure minimal cost; "search" = kuromoji search
    mode — long tokens pay the published decomposition penalty so
    compounds split when parts exist in the dictionary."""

    def __init__(self, dictionary: JapaneseDictionary | None = None,
                 mode: str = "search"):
        self.dict = dictionary or mini_dictionary()
        if mode not in ("normal", "search"):
            raise ValueError(mode)
        self.mode = mode

    def _penalty(self, surface: str) -> int:
        if self.mode != "search":
            return 0
        n = len(surface)
        if n > SEARCH_MODE_KANJI_LENGTH and \
                all(char_class(c) == KANJI for c in surface):
            return (n - SEARCH_MODE_KANJI_LENGTH) * SEARCH_MODE_KANJI_PENALTY
        if n > SEARCH_MODE_OTHER_LENGTH:
            return (n - SEARCH_MODE_OTHER_LENGTH) * SEARCH_MODE_OTHER_PENALTY
        return 0

    def tokenize(self, text: str) -> list[JaToken]:
        """Node-based Viterbi (the MeCab lattice, Kudo et al. 2004):
        one node per (morpheme, start); a node's best cost minimizes
        over all nodes ending at its start with the connection cost
        between their context ids — exact, not greedy."""
        n = len(text)
        if n == 0:
            return []
        # node: [cost, start, end, left_id, right_id, morpheme, back]
        bos = [0, 0, 0, 0, 0, None, None]
        ends: list[list] = [[] for _ in range(n + 1)]
        ends[0].append(bos)
        for i in range(n):
            prevs = ends[i]
            if not prevs:
                continue

            def _add(m, j, surf, left, rgt, wcost):
                best_c, best_p = None, None
                for p in prevs:
                    c = p[0] + self.dict.connection(p[4], left)
                    if best_c is None or c < best_c:
                        best_c, best_p = c, p
                node = [best_c + wcost + self._penalty(surf),
                        i, j, left, rgt, m, best_p]
                ends[j].append(node)

            matched_len_1 = False
            any_match = False
            for m in self.dict.prefix_matches(text, i):
                any_match = True
                if len(m.surface) == 1:
                    matched_len_1 = True
                _add(m, i + len(m.surface), m.surface,
                     m.left_id, m.right_id, m.cost)
            # unknown-word entries by character class (char.def role)
            cls = char_class(text[i])
            invoke, group, max_len, ucost = _UNK[cls]
            if invoke or not any_match or not matched_len_1:
                if group:
                    j = i + 1
                    while j < n and j - i < max_len and \
                            char_class(text[j]) == cls:
                        j += 1
                else:
                    j = i + 1
                _add(None, j, text[i:j], _UNK_LEFT_ID, _UNK_LEFT_ID,
                     ucost)
        # best path into EOS
        tail = min((nd for nd in ends[n]), key=lambda nd: nd[0],
                   default=None)
        out = []
        nd = tail
        while nd is not None and nd is not bos:
            m = nd[5]
            out.append(JaToken(text[nd[1]:nd[2]], nd[1], nd[2],
                               m.pos if m is not None else "未知語"))
            nd = nd[6]
        out.reverse()
        return out


class JapaneseAnalyzer:
    """JapaneseAnalyzer role: tokenize, drop spaces/symbols and
    particle/auxiliary stopwords, lowercase latin runs. Pluggable as
    ``build_index(analyzer=...)``."""

    STOP_POS = ("助詞", "助動詞")

    def __init__(self, dictionary: JapaneseDictionary | None = None,
                 mode: str = "search", keep_particles: bool = False):
        self.tokenizer = JapaneseTokenizer(dictionary, mode)
        self.keep_particles = keep_particles

    def __call__(self, text: str) -> list[str]:
        out = []
        for t in self.tokenizer.tokenize(text or ""):
            c = char_class(t.surface[0])
            if c in (SPACE, SYMBOL):
                continue
            if not self.keep_particles and t.pos in self.STOP_POS:
                continue
            out.append(t.surface.lower() if c == ALPHA else t.surface)
        return out

    def analyze_batch(self, texts) -> list[list[str]]:
        return [self(t) for t in texts]
