"""Thai word segmentation — the ThaiTokenizer/ThaiAnalyzer role
(``lucene/analysis/common/src/java/org/apache/lucene/analysis/th/
ThaiTokenizer.java``, which delegates to the JRE/ICU Thai
dictionary-based BreakIterator; ``ThaiAnalyzer.java`` adds lowercase +
the 115-word Thai stop set). Thai is written without spaces, so
tokenization IS dictionary segmentation.

Here: minimal-cost Viterbi over a word lexicon (the same shortest-path
formulation as the ja/ko/zh lattices — known words cost 1, unknown
characters cost 100 and merge into one token per unknown run), applied
to THAI-script runs only; non-Thai runs go through the standard UAX#29
tokenizer, matching ICU's per-script rule dispatch. The in-repo mini
lexicon covers the reference test corpus + the full stop list; a real
word list (one word per line, e.g. libthai's tdict) plugs in via
``load_lexicon`` / the ``lexicon=`` slot.

Stop list: the reference's vendored Thai stopwords (public list from
Sukhum, Nitsuwat & Haruechaiyasak, cited in the resource header) —
same vendoring as the 17 European stop lists.
"""

from __future__ import annotations

from dataclasses import dataclass

THAI_STOP_WORDS = frozenset("""
ไว้ ไม่ ไป ได้ ให้ ใน โดย แห่ง แล้ว และ แรก แบบ แต่ เอง เห็น เลย เริ่ม เรา
เมื่อ เพื่อ เพราะ เป็นการ เป็น เปิดเผย เปิด เนื่องจาก เดียวกัน เดียว เช่น
เฉพาะ เคย เข้า เขา อีก อาจ อะไร ออก อย่าง อยู่ อยาก หาก หลาย หลังจาก หลัง
หรือ หนึ่ง ส่วน ส่ง สุด สําหรับ ว่า วัน ลง ร่วม ราย รับ ระหว่าง รวม ยัง มี
มาก มา พร้อม พบ ผ่าน ผล บาง น่า นี้ นํา นั้น นัก นอกจาก ทุก ที่สุด ที่
ทําให้ ทํา ทาง ทั้งนี้ ทั้ง ถ้า ถูก ถึง ต้อง ต่างๆ ต่าง ต่อ ตาม ตั้งแต่
ตั้ง ด้าน ด้วย ดัง ซึ่ง ช่วง จึง จาก จัด จะ คือ ความ ครั้ง คง ขึ้น ของ ขอ
ขณะ ก่อน ก็ การ กับ กัน กว่า กล่าว
""".split())

# content words for the reference test corpus + common vocabulary; the
# stop words above are real words and join the lexicon too
_CONTENT_WORDS = """
แสดง งาน ดี ภาษา ไทย บริษัท ชื่อ คุย ว่าง คน บ้าน เมือง รัก น้ำ ข้าว รถ
หนังสือ เรียน สอน พูด อ่าน เขียน เดิน วิ่ง นอน กิน ซื้อ ขาย ใหญ่ เล็ก
ใหม่ เก่า สวย เร็ว ช้า ร้อน เย็น กรุงเทพ ประเทศ โรงเรียน มหาวิทยาลัย
ตลาด อาหาร เวลา ปี เดือน สัปดาห์ ชั่วโมง นาที
""".split()

MINI_LEXICON_TH = frozenset(_CONTENT_WORDS) | THAI_STOP_WORDS

_UNKNOWN_COST = 100
_WORD_COST = 1


def is_thai(ch: str) -> bool:
    return "฀" <= ch <= "๿"


def load_lexicon(path: str, encoding: str = "utf-8") -> frozenset:
    """Real-dictionary slot: one word per line (libthai tdict /
    ICU thaidict shape); comments (#) and blanks skipped."""
    words = set()
    with open(path, encoding=encoding) as f:
        for line in f:
            w = line.strip()
            if w and not w.startswith("#"):
                words.add(w)
    return frozenset(words)


@dataclass(frozen=True)
class ThToken:
    term: str
    start: int
    end: int


class ThaiTokenizer:
    #: codepoint predicate for the script this segmenter owns; other
    #: runs go to the UAX#29 tokenizer. Subclasses (Khmer/Lao/Myanmar,
    #: ``analysis/sea.py``) override this — the Viterbi core is shared.
    _in_script = staticmethod(is_thai)

    def __init__(self, lexicon=None):
        self.lexicon = frozenset(lexicon) if lexicon is not None \
            else self._default_lexicon()
        self.by_first: dict[str, list[str]] = {}
        for w in self.lexicon:
            self.by_first.setdefault(w[0], []).append(w)
        for v in self.by_first.values():
            v.sort(key=len, reverse=True)
        self.max_len = max((len(w) for w in self.lexicon), default=1)

    def _segment_thai(self, run: str, base: int) -> list[ThToken]:
        """Minimal-cost DP: dp[i] = cheapest segmentation of run[:i];
        known words cost 1, an unknown char costs 100 (so the path
        maximizes dictionary coverage first, then prefers fewer
        words — the dictionary-BreakIterator behavior)."""
        n = len(run)
        INF = float("inf")
        dp = [INF] * (n + 1)
        back: list[tuple[int, bool] | None] = [None] * (n + 1)
        dp[0] = 0
        for i in range(n):
            if dp[i] == INF:
                continue
            for w in self.by_first.get(run[i], ()):
                if run.startswith(w, i):
                    j = i + len(w)
                    c = dp[i] + _WORD_COST
                    if c < dp[j]:
                        dp[j] = c
                        back[j] = (i, True)
            j = i + 1  # unknown char fallback
            c = dp[i] + _UNKNOWN_COST
            if c < dp[j]:
                dp[j] = c
                back[j] = (i, False)
        cuts: list[tuple[int, int, bool]] = []
        j = n
        while j > 0:
            i, known = back[j]
            cuts.append((i, j, known))
            j = i
        cuts.reverse()
        out: list[ThToken] = []
        for i, j, known in cuts:
            if not known and out and not getattr(out[-1], "_known", True):
                # merge adjacent unknown chars into one token
                prev = out.pop()
                tok = ThToken(prev.term + run[i:j], prev.start, base + j)
                object.__setattr__(tok, "_known", False)
                out.append(tok)
                continue
            tok = ThToken(run[i:j], base + i, base + j)
            object.__setattr__(tok, "_known", known)
            out.append(tok)
        return out

    @staticmethod
    def _default_lexicon():
        return MINI_LEXICON_TH

    def tokenize(self, text: str) -> list[ThToken]:
        from .tokenizer import tokenize as std_tokenize
        ins = self._in_script
        out: list[ThToken] = []
        i, n = 0, len(text)
        while i < n:
            if ins(text[i]):
                j = i
                while j < n and ins(text[j]):
                    j += 1
                out.extend(self._segment_thai(text[i:j], i))
                i = j
            else:
                j = i
                while j < n and not ins(text[j]):
                    j += 1
                for t in std_tokenize(text[i:j]):
                    out.append(ThToken(t.text, i + t.start, i + t.end))
                i = j
        return out

    def __call__(self, text: str) -> list[str]:
        return [t.term for t in self.tokenize(text)]


class ThaiAnalyzer:
    """ThaiAnalyzer role: segment -> Java-semantics lowercase -> stop
    filter (default: the vendored Thai stop set; pass
    ``stop_words=frozenset()`` for none, or any set — e.g. the English
    stop set, as the reference's position-increment test does)."""

    def __init__(self, stop_words=THAI_STOP_WORDS, lexicon=None):
        self.stop_words = stop_words
        self._tok = ThaiTokenizer(lexicon)

    def tokens_with_positions(self, text: str):
        """(term, start, end, pos_inc) after lowercase + stop removal —
        the StopFilter posInc-carry semantics."""
        from .props import java_lowercase
        out = []
        inc = 1
        for t in self._tok.tokenize(text):
            term = java_lowercase(t.term)
            if term in self.stop_words:
                inc += 1
                continue
            out.append((term, t.start, t.end, inc))
            inc = 1
        return out

    def __call__(self, text: str) -> list[str]:
        return [term for term, _s, _e, _i in
                self.tokens_with_positions(text or "")]

    def analyze_batch(self, texts):
        return [self(t or "") for t in texts]
