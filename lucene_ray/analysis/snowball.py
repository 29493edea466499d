"""Snowball language stemmers, implemented from the published algorithm
descriptions at snowballstem.org (the same algorithms the reference
compiles to Java via the Snowball compiler —
``lucene/analysis/common/src/java/org/apache/lucene/analysis/snowball/
SnowballFilter.java``, generated stemmers under ``tartarus/snowball/
ext/``; conformance data ``analysis/snowball/{german,spanish,...}.zip``,
test ``TestSnowballVocab.java``).

Provenance: the LOGIC here is hand-written Python following the
published algorithm prose (regions, longest-match amongs, condition
chains) — none of the generated Java's cursor/limit machinery is
reproduced. The suffix TABLES (linguistic data from the public Snowball
project) were cross-checked against the reference's generated Among
arrays to get exact word lists, and every stemmer is gated by the full
public-domain 2000-word conformance vocabulary per language.

Each ``<lang>_stem(word)`` expects a lowercase word and returns its
stem. ``SnowballStemFilter`` plugs any of them into an AnalyzerChain.
"""

from __future__ import annotations

# --- shared helpers -------------------------------------------------------


def _r_regions(word: str, vowels: str) -> tuple[int, int]:
    """Standard R1/R2: R1 starts after the first non-vowel following a
    vowel; R2 likewise within R1. Returns (r1, r2) start indices
    (== len(word) when the region is empty)."""
    n = len(word)

    def after_vc(start: int) -> int:
        i = start
        while i < n and word[i] not in vowels:
            i += 1
        while i < n and word[i] in vowels:
            i += 1
        # i is at first non-vowel after a vowel (or end)
        return min(i + 1, n) if i < n else n

    # find first vowel, then first non-vowel after it
    i = 0
    while i < n and word[i] not in vowels:
        i += 1
    while i < n and word[i] in vowels:
        i += 1
    r1 = i + 1 if i < n else n
    j = r1
    while j < n and word[j] not in vowels:
        j += 1
    while j < n and word[j] in vowels:
        j += 1
    r2 = j + 1 if j < n else n
    return r1, r2


# --- German (snowballstem.org/algorithms/german/stemmer.html) -------------

_DE_VOWELS = "aeiouyäöü"
_DE_S_END = set("bdfghklmnrt")
_DE_ST_END = _DE_S_END - {"r"}


def german_stem(word: str) -> str:
    if len(word) < 2:
        return word
    w = word.replace("ß", "ss")
    # mark u/y between vowels as consonants (upper case)
    chars = list(w)
    for i in range(1, len(chars) - 1):
        if chars[i] in "uy" and chars[i - 1] in _DE_VOWELS \
                and chars[i + 1] in _DE_VOWELS:
            chars[i] = chars[i].upper()
    w = "".join(chars)
    # marked U/Y are consonants: compute regions on the MARKED word
    r1, r2 = _r_regions(w, _DE_VOWELS)
    r1 = max(r1, 3)  # region before R1 must hold >= 3 letters

    def in_r1(idx: int) -> bool:
        return idx >= r1

    def in_r2(idx: int) -> bool:
        return idx >= r2

    # step 1 (longest suffix wins; no fallback to shorter on failure)
    lw = w.lower()
    for suf, grp in (("ern", "a"), ("em", "a"), ("er", "a"),
                     ("en", "b"), ("es", "b"), ("e", "b"), ("s", "c")):
        if lw.endswith(suf):
            cut = len(w) - len(suf)
            if grp == "c" and (cut == 0 or lw[cut - 1] not in _DE_S_END):
                break
            if in_r1(cut):
                w = w[:cut]
                lw = lw[:cut]
                if grp == "b" and lw.endswith("niss"):
                    w = w[:-1]
                    lw = lw[:-1]
            break

    # step 2
    for suf, grp in (("est", "a"), ("en", "a"), ("er", "a"), ("st", "b")):
        if lw.endswith(suf):
            cut = len(w) - len(suf)
            if grp == "b" and cut < 4:  # valid st-ending needs >=3 before
                break
            if grp == "b" and lw[cut - 1] not in _DE_ST_END:
                break
            if in_r1(cut):
                w = w[:cut]
                lw = lw[:cut]
            break

    # step 3 (d-suffixes)
    for suf in ("isch", "lich", "heit", "keit", "end", "ung", "ig", "ik"):
        if not lw.endswith(suf):
            continue
        cut = len(w) - len(suf)
        if suf in ("end", "ung"):
            if in_r2(cut):
                w = w[:cut]
                lw = lw[:cut]
                if lw.endswith("ig") and not lw.endswith("eig") \
                        and in_r2(len(lw) - 2):
                    w = w[:-2]
                    lw = lw[:-2]
        elif suf in ("ig", "ik", "isch"):
            if in_r2(cut) and (cut == 0 or lw[cut - 1] != "e"):
                w = w[:cut]
                lw = lw[:cut]
        elif suf in ("lich", "heit"):
            if in_r2(cut):
                w = w[:cut]
                lw = lw[:cut]
                for pre in ("er", "en"):
                    if lw.endswith(pre) and in_r1(len(lw) - 2):
                        w = w[:-2]
                        lw = lw[:-2]
                        break
        else:  # keit
            if in_r2(cut):
                w = w[:cut]
                lw = lw[:cut]
                for pre in ("lich", "ig"):
                    if lw.endswith(pre) and in_r2(len(lw) - len(pre)):
                        w = w[:len(lw) - len(pre)]
                        lw = w.lower()
                        break
        break

    # finalize: unmark U/Y, strip umlauts
    out = []
    for c in w:
        if c == "U":
            out.append("u")
        elif c == "Y":
            out.append("y")
        elif c == "ä":
            out.append("a")
        elif c == "ö":
            out.append("o")
        elif c == "ü":
            out.append("u")
        else:
            out.append(c)
    return "".join(out)


# --- German variant "german2" (snowballstem.org german2; reference
# ships it as tartarus/snowball/ext/German2Stemmer.java + golden
# analysis/snowball/german2.zip). Same suffix steps as German; the
# prelude additionally folds the digraph umlaut spellings ae/oe/ue to
# a-umlaut/o-umlaut/u-umlaut ("qu" protects a following ue, and a
# u marked as consonant-U between vowels is never digraph-folded).

def german2_stem(word: str) -> str:
    if not word:
        return word
    # pass 1: mark u/y between vowels (on the ORIGINAL text)
    chars = list(word)
    for i in range(1, len(chars) - 1):
        if chars[i] in "uy" and chars[i - 1] in _DE_VOWELS \
                and chars[i + 1] in _DE_VOWELS:
            chars[i] = chars[i].upper()
    # pass 2: left-to-right longest-match digraph/sharp-s fold
    s = "".join(chars)
    out, i, n = [], 0, len(s)
    while i < n:
        pair = s[i:i + 2]
        if s[i] == "ß":
            out.append("ss")
            i += 1
        elif pair == "qu":
            out.append("qu")
            i += 2
        elif pair == "ae":
            out.append("ä")
            i += 2
        elif pair == "oe":
            out.append("ö")
            i += 2
        elif pair == "ue":
            out.append("ü")
            i += 2
        else:
            out.append(s[i])
            i += 1
    w = "".join(out)
    r1, r2 = _r_regions(w, _DE_VOWELS)
    r1 = max(r1, 3)

    lw = w.lower()
    # step 1 (a_2: ern/em/er group a; en/es/e group b + nis-s; s group c)
    for suf, grp in (("ern", "a"), ("em", "a"), ("er", "a"),
                     ("en", "b"), ("es", "b"), ("e", "b"), ("s", "c")):
        if lw.endswith(suf):
            cut = len(w) - len(suf)
            if grp == "c" and (cut == 0 or lw[cut - 1] not in _DE_S_END):
                break
            if cut >= r1:
                w, lw = w[:cut], lw[:cut]
                if grp == "b" and lw.endswith("niss"):
                    w, lw = w[:-1], lw[:-1]
            break

    # step 2 (a_3: est/en/er; st with st-ending and >= 3 chars before)
    for suf, grp in (("est", "a"), ("en", "a"), ("er", "a"), ("st", "b")):
        if lw.endswith(suf):
            cut = len(w) - len(suf)
            if grp == "b" and (cut < 4 or lw[cut - 1] not in _DE_ST_END):
                break
            if cut >= r1:
                w, lw = w[:cut], lw[:cut]
            break

    # step 3 (a_5 d-suffixes)
    for suf in ("isch", "lich", "heit", "keit", "end", "ung", "ig", "ik"):
        if not lw.endswith(suf):
            continue
        cut = len(w) - len(suf)
        if suf in ("end", "ung"):
            if cut >= r2:
                w, lw = w[:cut], lw[:cut]
                if lw.endswith("ig") and not lw.endswith("eig") \
                        and len(lw) - 2 >= r2:
                    w, lw = w[:-2], lw[:-2]
        elif suf in ("ig", "ik", "isch"):
            if cut >= r2 and (cut == 0 or lw[cut - 1] != "e"):
                w, lw = w[:cut], lw[:cut]
        elif suf in ("lich", "heit"):
            if cut >= r2:
                w, lw = w[:cut], lw[:cut]
                for pre in ("er", "en"):
                    if lw.endswith(pre) and len(lw) - 2 >= r1:
                        w, lw = w[:-2], lw[:-2]
                        break
        else:  # keit
            if cut >= r2:
                w, lw = w[:cut], lw[:cut]
                for pre in ("lich", "ig"):
                    if lw.endswith(pre) and len(lw) - len(pre) >= r2:
                        w = w[:len(w) - len(pre)]
                        lw = w.lower()
                        break
        break

    # postlude: unmark U/Y, strip umlauts
    return (w.replace("U", "u").replace("Y", "y")
            .replace("ä", "a").replace("ö", "o").replace("ü", "u"))


class SnowballStemFilter:
    """Token filter applying a snowball stemmer (SnowballFilter role)."""

    def __init__(self, stem):
        self.stem = stem

    def __call__(self, terms):
        return [self.stem(t) for t in terms]


# --- region-limited longest match (Snowball `setlimit tomark p1
# for ([substring]) among(...)`: the suffix must lie entirely inside the
# region; no fallback to shorter suffixes when the branch action fails)

def _longest_in(w: str, suffixes, region_start: int) -> str | None:
    best = None
    for suf in suffixes:
        if len(w) - len(suf) >= region_start and w.endswith(suf):
            if best is None or len(suf) > len(best):
                best = suf
    return best


# --- Swedish (snowballstem.org/algorithms/swedish/stemmer.html) -----------

_SV_VOWELS = "aeiouy\u00e4\u00e5\u00f6"
_SV_S_END = set("bcdfghjklmnoprtvy")
_SV_STEP1 = """a arna erna heterna orna ad e ade ande arne are aste en
anden aren heten ern ar er heter or as arnas ernas ornas es ades andes
ens arens hetens erns at andet het ast s""".split()
_SV_STEP2 = ("dd", "gd", "nn", "dt", "gt", "kt", "tt")
_SV_STEP3 = ("lig", "ig", "els", "l\u00f6st", "fullt")


def swedish_stem(word: str) -> str:
    w = word
    r1, _ = _r_regions(w, _SV_VOWELS)
    r1 = max(r1, 3)
    suf = _longest_in(w, _SV_STEP1, r1)
    if suf == "s":
        if len(w) >= 2 and w[-2] in _SV_S_END:
            w = w[:-1]
    elif suf is not None:
        w = w[:len(w) - len(suf)]
    if _longest_in(w, _SV_STEP2, r1):
        w = w[:-1]
    suf = _longest_in(w, _SV_STEP3, r1)
    if suf == "l\u00f6st":
        w = w[:-1]
    elif suf == "fullt":
        w = w[:-1]
    elif suf is not None:
        w = w[:len(w) - len(suf)]
    return w


# --- Norwegian (snowballstem.org/algorithms/norwegian/stemmer.html) -------

_NO_VOWELS = "aeiouyæåø"
_NO_S_END = set("bcdfghjlmnoprtvyz")
_NO_STEP1 = """a e ede ande ende ane ene hetene en heten ar er heter as
es edes endes enes hetenes ens hetens ers ets et het ast s erte
ert""".split()
_NO_STEP3 = """leg eleg ig eig lig elig els lov elov slov
hetslov""".split()


def norwegian_stem(word: str) -> str:
    w = word
    r1, _ = _r_regions(w, _NO_VOWELS)
    r1 = max(r1, 3)
    suf = _longest_in(w, _NO_STEP1, r1)
    if suf == "s":
        prev = w[-2] if len(w) >= 2 else ""
        ok = prev in _NO_S_END or (
            prev == "k" and (len(w) < 3 or w[-3] not in _NO_VOWELS))
        if ok:
            w = w[:-1]
    elif suf in ("erte", "ert"):
        w = w[:len(w) - len(suf)] + "er"
    elif suf is not None:
        w = w[:len(w) - len(suf)]
    if _longest_in(w, ("dt", "vt"), r1):
        w = w[:-1]
    suf = _longest_in(w, _NO_STEP3, r1)
    if suf is not None:
        w = w[:len(w) - len(suf)]
    return w


# --- Danish (snowballstem.org/algorithms/danish/stemmer.html) -------------

_DA_VOWELS = "aeiouyæåø"
_DA_S_END = set("abcdfghjklmnoprtvyzå")
_DA_STEP1 = """hed ethed ered e erede ende erende ene erne ere en heden
eren er heder erer heds es endes erendes enes ernes eres ens hedens
erens ers ets erets et eret s""".split()


def danish_stem(word: str) -> str:
    w = word
    r1, _ = _r_regions(w, _DA_VOWELS)
    r1 = max(r1, 3)
    suf = _longest_in(w, _DA_STEP1, r1)
    if suf == "s":
        if len(w) >= 2 and w[-2] in _DA_S_END:
            w = w[:-1]
    elif suf is not None:
        w = w[:len(w) - len(suf)]

    def step2(w: str) -> str:
        if _longest_in(w, ("gd", "dt", "gt", "kt"), r1):
            return w[:-1]
        return w

    w = step2(w)
    if w.endswith("igst"):
        w = w[:-2]
    suf = _longest_in(w, ("ig", "lig", "elig", "els"), r1)
    if suf is not None:
        w = w[:len(w) - len(suf)]
        w = step2(w)
    elif _longest_in(w, ("løst",), r1):
        w = w[:-1]
    # step 4: undouble a final double consonant in R1
    if len(w) >= 2 and w[-1] == w[-2] and w[-1] not in _DA_VOWELS \
            and len(w) - 1 >= r1:
        w = w[:-1]
    return w


# --- Spanish (snowballstem.org/algorithms/spanish/stemmer.html) -----------

_ES_VOWELS = "aeiouáéíóúü"
_ES_PRON = """me se sela selo selas selos la le lo las les los
nos""".split()
_ES_PRE_ACC = {"iéndo": "iendo", "ándo": "ando", "ár": "ar", "ér": "er",
               "ír": "ir"}
_ES_PRE_PLAIN = ("ando", "iendo", "ar", "er", "ir")
_ES_STEP1 = {  # suffix -> case number (spec rule group)
    **{s: 1 for s in """anza anzas ico ica icos icas ismo ismos able
       ables ible ibles ista istas oso osa osos osas amiento amientos
       imiento imientos""".split()},
    **{s: 2 for s in """adora ador ación adoras adores aciones ante
       antes ancia ancias""".split()},
    "logía": 3, "logías": 3, "ución": 4, "uciones": 4,
    "encia": 5, "encias": 5, "amente": 6, "mente": 7,
    "idad": 8, "idades": 8,
    **{s: 9 for s in ("iva", "ivo", "ivas", "ivos")},
}
_ES_2A = """ya ye yan yen yeron yendo yo yó yas yes yais
yamos""".split()
_ES_2B_GU = ("en", "es", "éis", "emos")
_ES_2B = """arían arías arán arás aríais aría aréis aríamos aremos ará
aré erían erías erán erás eríais ería eréis eríamos eremos erá eré
irían irías irán irás iríais iría iréis iríamos iremos irá iré aba ada
ida ía ara iera ad ed id ase iese aste iste an aban ían aran ieran asen
iesen aron ieron ado ido ando iendo ió ar er ir as abas adas idas ías
aras ieras ases ieses ís áis abais arais ierais íais aseis ieseis
asteis isteis ados idos amos ábamos áramos iéramos íamos ásemos
iésemos imos""".split()
_ES_UNACCENT = str.maketrans("áéíóú", "aeiou")


def _rv_standard(w: str, vowels: str) -> int:
    """Shared RV: after the 3rd letter when the word starts
    consonant-vowel; after the next vowel when the 2nd letter is a
    consonant; after the next consonant when the first two are vowels
    (Spanish/Italian/Portuguese RV definition)."""
    n = len(w)
    if n < 3:
        return n
    if w[1] not in vowels:
        i = 2
        while i < n and w[i] not in vowels:
            i += 1
        return min(i + 1, n)
    if w[0] in vowels and w[1] in vowels:
        i = 2
        while i < n and w[i] in vowels:
            i += 1
        return min(i + 1, n)
    return 3


def spanish_stem(word: str) -> str:
    w = word
    r1, r2 = _r_regions(w, _ES_VOWELS)
    rv = _rv_standard(w, _ES_VOWELS)

    # step 0: attached pronoun (matching limited to RV)
    pron = _longest_in(w, _ES_PRON, rv)
    if pron is not None:
        base = w[:len(w) - len(pron)]
        done = False
        for acc, rep in _ES_PRE_ACC.items():
            if base.endswith(acc) and len(base) - len(acc) >= rv:
                w = base[:len(base) - len(acc)] + rep
                done = True
                break
        if not done:
            for pre in _ES_PRE_PLAIN:
                if base.endswith(pre) and len(base) - len(pre) >= rv:
                    w = base
                    done = True
                    break
        if not done and base.endswith("yendo") and \
                len(base) - 5 >= rv and base[-6:-5] == "u":
            w = base

    # step 1: standard suffixes (unlimited match; R1/R2 in conditions)
    n0 = len(w)
    suf = _longest_in(w, list(_ES_STEP1), 0)
    if suf is not None:
        case = _ES_STEP1[suf]
        cut = len(w) - len(suf)

        def inr2(i):
            return i >= r2

        if case == 1 and inr2(cut):
            w = w[:cut]
        elif case == 2 and inr2(cut):
            w = w[:cut]
            if w.endswith("ic") and inr2(len(w) - 2):
                w = w[:-2]
        elif case == 3 and inr2(cut):
            w = w[:cut] + "log"
        elif case == 4 and inr2(cut):
            w = w[:cut] + "u"
        elif case == 5 and inr2(cut):
            w = w[:cut] + "ente"
        elif case == 6 and cut >= r1:
            w = w[:cut]
            if w.endswith("iv") and inr2(len(w) - 2):
                w = w[:-2]
                if w.endswith("at") and inr2(len(w) - 2):
                    w = w[:-2]
            else:
                for pre in ("os", "ic", "ad"):
                    if w.endswith(pre) and inr2(len(w) - 2):
                        w = w[:-2]
                        break
        elif case == 7 and inr2(cut):
            w = w[:cut]
            for pre in ("ante", "able", "ible"):
                if w.endswith(pre) and inr2(len(w) - 4):
                    w = w[:-4]
                    break
        elif case == 8 and inr2(cut):
            w = w[:cut]
            for pre in ("abil", "ic", "iv"):
                if w.endswith(pre) and inr2(len(w) - len(pre)):
                    w = w[:len(w) - len(pre)]
                    break
        elif case == 9 and inr2(cut):
            w = w[:cut]
            if w.endswith("at") and inr2(len(w) - 2):
                w = w[:-2]
    removed1 = len(w) != n0

    if not removed1:
        # step 2a: y-verb suffixes in RV, preceded by u
        n1 = len(w)
        suf = _longest_in(w, _ES_2A, rv)
        if suf is not None:
            cut = len(w) - len(suf)
            if cut >= 1 and w[cut - 1] == "u":
                w = w[:cut]
        if len(w) == n1:
            # step 2b: other verb suffixes in RV
            suf = _longest_in(w, _ES_2B + list(_ES_2B_GU), rv)
            if suf is not None:
                w = w[:len(w) - len(suf)]
                if suf in _ES_2B_GU and w.endswith("gu"):
                    w = w[:-1]

    # step 3: residual suffix in RV
    suf = _longest_in(w, ["a", "e", "o", "os", "á", "é", "í", "ó"], rv)
    if suf is not None:
        w = w[:len(w) - len(suf)]
        if suf in ("e", "é") and w.endswith("gu") and len(w) - 1 >= rv:
            w = w[:-1]
    return w.translate(_ES_UNACCENT)


# --- Russian (snowballstem.org/algorithms/russian/stemmer.html) -----------

_RU_VOWELS = "аеиоуыэюя"
_RU_PGERUND_1 = ("в", "вши", "вшись")            # need preceding а/я
_RU_PGERUND_2 = ("ив", "ивши", "ившись", "ыв", "ывши", "ывшись")
_RU_ADJ = """ее ие ое ые ими ыми ей ий ой ый ем им ом ым его ого ему
ому их ых ею ою ую юю ая яя""".split()
_RU_PART_1 = ("ем", "нн", "вш", "ющ", "щ")       # need preceding а/я
_RU_PART_2 = ("ивш", "ывш", "ующ")
_RU_VERB_1 = """ла на ете йте ли й л ем н ло но ет ют ны ть ешь
нно""".split()                                   # need preceding а/я
_RU_VERB_2 = """ила ыла ена ейте уйте ите или ыли ей уй ил ыл им ым ен
ило ыло ено ят ует уют ит ыт ены ить ыть ишь ую ю""".split()
_RU_NOUN = """а ев ов е ие ье и еи ии ами ями иями й ей ией ий ой ам
ем ием ом ям иям о у ах ях иях ы ь ю ию ью я ия ья""".split()


def russian_stem(word: str) -> str:
    w = word.replace("ё", "е")
    n = len(w)
    i = 0
    while i < n and w[i] not in _RU_VOWELS:
        i += 1
    rv = i + 1 if i < n else n
    _, r2 = _r_regions(w, _RU_VOWELS)

    def try_del(sufs_plain, sufs_ay) -> bool:
        """Delete the longest matching suffix (groups merged for the
        longest-match rule); group-1 suffixes need а/я before them (the
        а/я stays). Returns True if something was removed."""
        nonlocal w
        best, ay = None, False
        for s in sufs_plain:
            if w.endswith(s) and len(w) - len(s) >= rv:
                if best is None or len(s) > len(best):
                    best, ay = s, False
        for s in sufs_ay:
            cut = len(w) - len(s)
            if w.endswith(s) and cut - 1 >= 0 and w[cut - 1] in "ая" \
                    and cut - 1 >= rv:
                if best is None or len(s) > len(best):
                    best, ay = s, True
        if best is None:
            return False
        w = w[:len(w) - len(best)]
        return True

    # step 1: perfective gerund, else (reflexive then adj/verb/noun)
    if not try_del(_RU_PGERUND_2, _RU_PGERUND_1):
        for refl in ("сь", "ся"):
            if w.endswith(refl) and len(w) - 2 >= rv:
                w = w[:-2]
                break
        if try_del(_RU_ADJ, ()):
            try_del(_RU_PART_2, _RU_PART_1)
        elif try_del(_RU_VERB_2, _RU_VERB_1):
            pass
        else:
            try_del(_RU_NOUN, ())

    # step 2: final и
    if w.endswith("и") and len(w) - 1 >= rv:
        w = w[:-1]
    # step 3: derivational ост/ость in R2
    for suf in ("ость", "ост"):
        if w.endswith(suf) and len(w) - len(suf) >= r2:
            w = w[:len(w) - len(suf)]
            break
    # step 4: superlative / undouble / soft sign
    suf = _longest_in(w, ("ейше", "ейш", "нн", "ь"), rv)
    if suf in ("ейше", "ейш"):
        w = w[:len(w) - len(suf)]
        if w.endswith("нн") and len(w) - 1 >= rv:
            w = w[:-1]
    elif suf == "нн":
        w = w[:-1]
    elif suf == "ь":
        w = w[:-1]
    return w


# --- Italian (snowballstem.org/algorithms/italian/stemmer.html) -----------

_IT_VOWELS = "aeiouàèìòù"
_IT_ACUTE = str.maketrans("áéíóú", "àèìòù")
_IT_PRON = """ci gli la le li lo mi ne si ti vi sene gliela gliele
glieli glielo gliene mela mele meli melo mene tela tele teli telo tene
cela cele celi celo cene vela vele veli velo vene""".split()
_IT_STEP1 = {
    **{s: 1 for s in """anza anze ico ici ica ice iche ichi ismo ismi
       abile abili ibile ibili ista iste isti istà istè istì oso osi
       osa ose mente atrice atrici ante anti""".split()},
    **{s: 2 for s in ("azione", "azioni", "atore", "atori")},
    "logia": 3, "logie": 3,
    **{s: 4 for s in ("uzione", "uzioni", "usione", "usioni")},
    "enza": 5, "enze": 5,
    **{s: 6 for s in ("amento", "amenti", "imento", "imenti")},
    "amente": 7, "ità": 8,
    **{s: 9 for s in ("ivo", "ivi", "iva", "ive")},
}
_IT_STEP2 = """isca enda ata ita uta ava eva iva erebbe irebbe isce
ende are ere ire asse ate avate evate ivate ete erete irete ite ereste
ireste ute erai irai isci endi erei irei assi ati iti eresti iresti
uti avi evi ivi isco ando endo Yamo iamo avamo evamo ivamo eremo iremo
assimo ammo emmo eremmo iremmo immo ano iscano avano evano ivano
eranno iranno ono iscono arono erono irono erebbero irebbero assero
essero issero ato ito uto avo evo ivo ar ir erà irà erò irò""".split()


def italian_stem(word: str) -> str:
    w = word.translate(_IT_ACUTE)
    chars = list(w)
    for i in range(1, len(chars) - 1):
        if chars[i] in "ui" and chars[i - 1] in _IT_VOWELS \
                and chars[i + 1] in _IT_VOWELS:
            chars[i] = chars[i].upper()
    for i in range(1, len(chars)):
        if chars[i] == "u" and chars[i - 1] == "q":
            chars[i] = "U"
    w = "".join(chars)
    r1, r2 = _r_regions(w, _IT_VOWELS)
    rv = _rv_standard(w, _IT_VOWELS)

    # step 0: attached pronoun (RV-limited)
    lw = w.lower()
    pron = _longest_in(lw, _IT_PRON, rv)
    if pron is not None:
        base = lw[:len(lw) - len(pron)]
        for pre, case in (("ando", 1), ("endo", 1), ("ar", 2),
                          ("er", 2), ("ir", 2)):
            if base.endswith(pre) and len(base) - len(pre) >= rv:
                w = w[:len(w) - len(pron)]
                if case == 2:
                    w += "e"
                lw = w.lower()
                break

    # step 1 (unlimited match; R1/R2/RV in conditions)
    n0 = len(w)
    suf = _longest_in(lw, list(_IT_STEP1), 0)
    if suf is not None:
        case = _IT_STEP1[suf]
        cut = len(w) - len(suf)

        def inr2(i):
            return i >= r2

        if case == 1 and inr2(cut):
            w = w[:cut]
        elif case == 2 and inr2(cut):
            w = w[:cut]
            if w.lower().endswith("ic") and inr2(len(w) - 2):
                w = w[:-2]
        elif case == 3 and inr2(cut):
            w = w[:cut] + "log"
        elif case == 4 and inr2(cut):
            w = w[:cut] + "u"
        elif case == 5 and inr2(cut):
            w = w[:cut] + "ente"
        elif case == 6 and cut >= rv:
            w = w[:cut]
        elif case == 7 and cut >= r1:
            w = w[:cut]
            if w.lower().endswith("iv") and inr2(len(w) - 2):
                w = w[:-2]
                if w.lower().endswith("at") and inr2(len(w) - 2):
                    w = w[:-2]
            else:
                for pre in ("os", "ic", "abil"):
                    if w.lower().endswith(pre) and \
                            inr2(len(w) - len(pre)):
                        w = w[:len(w) - len(pre)]
                        break
        elif case == 8 and inr2(cut):
            w = w[:cut]
            for pre in ("abil", "ic", "iv"):
                if w.lower().endswith(pre) and inr2(len(w) - len(pre)):
                    w = w[:len(w) - len(pre)]
                    break
        elif case == 9 and inr2(cut):
            w = w[:cut]
            if w.lower().endswith("at") and inr2(len(w) - 2):
                w = w[:-2]
                if w.lower().endswith("ic") and inr2(len(w) - 2):
                    w = w[:-2]
    if len(w) == n0:
        # step 2: verb suffixes in RV (note Yamo matches marked Y)
        suf = _longest_in(w, _IT_STEP2, rv)
        if suf is not None:
            w = w[:len(w) - len(suf)]

    # step 3a: final vowel (and preceding i) in RV
    if w and w[-1] in "aeioàèìò" and len(w) - 1 >= rv:
        w = w[:-1]
        if w.endswith("i") and len(w) - 1 >= rv:
            w = w[:-1]
    # step 3b: ch -> c, gh -> g in RV
    for pre in ("ch", "gh"):
        if w.endswith(pre) and len(w) - 2 >= rv:
            w = w[:-1]
            break
    return w.replace("I", "i").replace("U", "u")


# --- Portuguese (snowballstem.org/algorithms/portuguese/stemmer.html) -----

_PT_VOWELS = "aeiouáéíóúâêô"
_PT_STEP1 = {
    **{s: 1 for s in """eza ezas ico ica icos icas ismo ismos ável ível
       ista istas oso osa osos osas amento amentos imento imentos
       adora ador aça~o adoras adores aço~es ante antes
       ância""".split()},
    "logia": 2, "logias": 2, "uça~o": 3, "uço~es": 3,
    "ência": 4, "ências": 4, "amente": 5, "mente": 6,
    "idade": 7, "idades": 7,
    **{s: 8 for s in ("iva", "ivo", "ivas", "ivos")},
    "ira": 9, "iras": 9,
}
_PT_STEP2 = """ada ida ia aria eria iria ara era ira ava asse esse isse
aste este iste ei arei erei irei am iam ariam eriam iriam aram eram
iram avam em arem erem irem assem essem issem ado ido ando endo indo
ara~o era~o ira~o ar er ir as adas idas ias arias erias irias aras
eras iras avas es ardes erdes irdes ares eres ires asses esses isses
astes estes istes is ais eis areis ereis ireis áreis éreis íreis
ásseis ésseis ísseis áveis íeis aríeis eríeis iríeis ados idos amos
áramos éramos íramos ávamos íamos aríamos eríamos iríamos emos aremos
eremos iremos ássemos êssemos íssemos imos armos ermos irmos ámos arás
erás irás eu iu ou ará erá irá""".split()


def portuguese_stem(word: str) -> str:
    w = word.replace("ã", "a~").replace("õ", "o~")
    r1, r2 = _r_regions(w, _PT_VOWELS)
    rv = _rv_standard(w, _PT_VOWELS)
    altered = False

    n0 = len(w)
    suf = _longest_in(w, list(_PT_STEP1), 0)
    if suf is not None:
        case = _PT_STEP1[suf]
        cut = len(w) - len(suf)

        def inr2(i):
            return i >= r2

        if case == 1 and inr2(cut):
            w = w[:cut]
        elif case == 2 and inr2(cut):
            w = w[:cut] + "log"
        elif case == 3 and inr2(cut):
            w = w[:cut] + "u"
        elif case == 4 and inr2(cut):
            w = w[:cut] + "ente"
        elif case == 5 and cut >= r1:
            w = w[:cut]
            if w.endswith("iv") and inr2(len(w) - 2):
                w = w[:-2]
                if w.endswith("at") and inr2(len(w) - 2):
                    w = w[:-2]
            else:
                for pre in ("os", "ic", "ad"):
                    if w.endswith(pre) and inr2(len(w) - 2):
                        w = w[:-2]
                        break
        elif case == 6 and inr2(cut):
            w = w[:cut]
            for pre in ("ante", "avel", "ível"):
                if w.endswith(pre) and inr2(len(w) - len(pre)):
                    w = w[:len(w) - len(pre)]
                    break
        elif case == 7 and inr2(cut):
            w = w[:cut]
            for pre in ("abil", "ic", "iv"):
                if w.endswith(pre) and inr2(len(w) - len(pre)):
                    w = w[:len(w) - len(pre)]
                    break
        elif case == 8 and inr2(cut):
            w = w[:cut]
            if w.endswith("at") and inr2(len(w) - 2):
                w = w[:-2]
        elif case == 9 and cut >= rv and cut >= 1 and w[cut - 1] == "e":
            w = w[:cut] + "ir"
    altered = len(w) != n0

    if not altered:
        suf = _longest_in(w, _PT_STEP2, rv)
        if suf is not None:
            w = w[:len(w) - len(suf)]
            altered = True

    if altered:
        # step 3: i preceded by c, in RV
        if w.endswith("i") and len(w) - 1 >= rv and len(w) >= 2 \
                and w[-2] == "c":
            w = w[:-1]
    else:
        # step 4 residual: a i o os á í ó in RV
        suf = _longest_in(w, ["a", "i", "o", "os", "á", "í", "ó"], rv)
        if suf is not None:
            w = w[:len(w) - len(suf)]

    # step 5: final e/é/ê in RV (+ gu/ci undouble); ç -> c
    suf = _longest_in(w, ["e", "é", "ê"], rv)
    if suf is not None:
        w = w[:-1]
        if (w.endswith("gu") or w.endswith("ci")) and len(w) - 1 >= rv:
            w = w[:-1]
    elif w.endswith("ç"):
        w = w[:-1] + "c"
    return w.replace("a~", "ã").replace("o~", "õ")


# --- Dutch (snowballstem.org/algorithms/dutch/stemmer.html) ---------------

_NL_VOWELS = "aeiouyè"
_NL_DEACCENT = str.maketrans("äëïöüáéíóú", "aeiouaeiou")


def _nl_undouble(w: str) -> str:
    return w[:-1] if w[-2:] in ("kk", "dd", "tt") else w


def dutch_stem(word: str) -> str:
    w = word.translate(_NL_DEACCENT)
    chars = list(w)
    if chars and chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _NL_VOWELS:
            chars[i] = "Y"
        if chars[i] == "i" and chars[i - 1] in _NL_VOWELS \
                and i + 1 < len(chars) and chars[i + 1] in _NL_VOWELS:
            chars[i] = "I"
    w = "".join(chars)
    r1, r2 = _r_regions(w, _NL_VOWELS)
    r1 = max(r1, 3)

    def valid_s_end(i):  # non-vowel other than j
        return i >= 1 and w[i - 1] not in _NL_VOWELS and w[i - 1] != "j"

    def valid_en_end(i):  # non-vowel, and not gem-
        return i >= 1 and w[i - 1] not in _NL_VOWELS \
            and not w[:i].endswith("gem")

    # step 1
    suf = _longest_in(w, ["heden", "ene", "en", "se", "s"], r1)
    if suf == "heden":
        w = w[:-5] + "heid"
    elif suf in ("ene", "en"):
        cut = len(w) - len(suf)
        if valid_en_end(cut):
            w = _nl_undouble(w[:cut])
    elif suf in ("se", "s"):
        cut = len(w) - len(suf)
        if valid_s_end(cut):
            w = w[:cut]

    # step 2
    e_found = False
    if w.endswith("e") and len(w) - 1 >= r1 and len(w) >= 2 \
            and w[-2] not in _NL_VOWELS:
        w = _nl_undouble(w[:-1])
        e_found = True

    # step 3a: heid
    if w.endswith("heid") and len(w) - 4 >= r2 and \
            (len(w) < 5 or w[-5] != "c"):
        w = w[:-4]
        if w.endswith("en") and len(w) - 2 >= r1 and \
                valid_en_end(len(w) - 2):
            w = _nl_undouble(w[:-2])

    # step 3b: d-suffixes
    suf = _longest_in(w, ["end", "ing", "lijk", "baar", "bar", "ig"], r2)
    if suf in ("end", "ing"):
        w = w[:-3]
        if w.endswith("ig") and len(w) - 2 >= r2 and \
                (len(w) < 3 or w[-3] != "e"):
            w = w[:-2]
        else:
            w = _nl_undouble(w)
    elif suf == "ig":
        if len(w) < 3 or w[-3] != "e":
            w = w[:-2]
    elif suf == "lijk":
        w = w[:-4]
        if w.endswith("e") and len(w) - 1 >= r1 and len(w) >= 2 \
                and w[-2] not in _NL_VOWELS:
            w = _nl_undouble(w[:-1])
    elif suf == "baar":
        w = w[:-4]
    elif suf == "bar":
        if e_found:
            w = w[:-3]

    # step 4: undouble vowel in C V V D
    if len(w) >= 4 and w[-4] not in _NL_VOWELS \
            and w[-1] not in _NL_VOWELS and w[-1] != "I" \
            and w[-2] == w[-3] and w[-2] in "aeou":
        w = w[:-2] + w[-1]
    return w.replace("I", "i").replace("Y", "y")


# --- Romanian (snowballstem.org/algorithms/romanian/stemmer.html) ---------
# cedilla forms (ş U+015F, ţ U+0163) as in the conformance vocabulary

_RO_VOWELS = "aăâeiîou"
_RO_STEP0 = {
    "ul": 1, "ului": 1, "aua": 2, "ea": 3, "ele": 3, "elor": 3,
    "ii": 4, "iua": 4, "iei": 4, "iile": 4, "iilor": 4, "ilor": 4,
    "ile": 5, "atei": 6, "aţia": 7, "aţie": 7,
}
_RO_STEP1 = {
    **{s: "abil" for s in ("abilitate", "abilitati", "abilităi",
                           "abilităţi")},
    "ibilitate": "ibil",
    **{s: "iv" for s in ("ivitate", "ivitati", "ivităi", "ivităţi")},
    **{s: "ic" for s in ("icitate", "icitati", "icităi", "icităţi",
                         "icator", "icatori", "iciv", "iciva", "icive",
                         "icivi", "icivă", "ical", "icala", "icale",
                         "icali", "icală")},
    **{s: "at" for s in ("ativ", "ativa", "ative", "ativi", "ativă",
                         "aţiune", "atoare", "ator", "atori", "ătoare",
                         "ător", "ători")},
    **{s: "it" for s in ("itiv", "itiva", "itive", "itivi", "itivă",
                         "iţiune", "itoare", "itor", "itori")},
}
_RO_STEP2_DEL = """ica abila ibila oasa ata ita anta uta iva ic ice
abile ibile oase ate itate ite ante ute ive ici abili ibili atori osi
ati itati iti anti uti ivi ităi oşi ităţi abil ibil ator os at it ant
ut iv ică abilă ibilă oasă ată ită antă ută ivă""".split()
_RO_STEP2_IST = """ism isme ist ista iste isti istă işti""".split()
_RO_VERB_CONS = """ea ia esc ăsc ind ând are ere ire âre ase ise use
âse eşte ăşte eze ai eai iai eşti ăşti ui ezi âi aşi aseşi iseşi useşi
âseşi işi uşi âşi eaţi iaţi arăţi aserăţi iserăţi userăţi âserăţi irăţi
urăţi ârăţi am eam iam asem isem usem âsem arăm aserăm iserăm userăm
âserăm irăm urăm ârăm au eau iau indu ându ez ească ară aseră iseră
useră âseră iră ură âră ează""".split()
_RO_VERB_PLAIN = """se sese sei seşi seseşi aţi eţi iţi âţi serăţi
seserăţi em sesem im âm ăm serăm seserăm seră seseră""".split()


def romanian_stem(word: str) -> str:
    chars = list(word)
    for i in range(1, len(chars) - 1):
        if chars[i] in "iu" and chars[i - 1] in _RO_VOWELS \
                and chars[i + 1] in _RO_VOWELS:
            chars[i] = chars[i].upper()
    w = "".join(chars)
    r1, r2 = _r_regions(w, _RO_VOWELS)
    rv = _rv_standard(w, _RO_VOWELS)

    # steps 0/1/2/4 match the longest suffix UNLIMITED; the region check
    # gates the action (no fallback to shorter) — the verb step alone
    # limits matching to RV (generated stemmer: limit_backward = I_pV)

    # step 0: plural/article removal (R1 gate)
    suf = _longest_in(w, list(_RO_STEP0), 0)
    if suf is not None and len(w) - len(suf) >= r1:
        case = _RO_STEP0[suf]
        cut = len(w) - len(suf)
        if case == 1:
            w = w[:cut]
        elif case == 2:
            w = w[:cut] + "a"
        elif case == 3:
            w = w[:cut] + "e"
        elif case == 4:
            w = w[:cut] + "i"
        elif case == 5:
            if not w[:cut].endswith("ab"):
                w = w[:cut] + "i"
        else:  # 6, 7
            w = w[:cut] + "aţi"

    # step 1: combining suffixes, repeated until stable (R1 gate)
    standard_removed = False
    while True:
        suf = _longest_in(w, list(_RO_STEP1), 0)
        if suf is None or len(w) - len(suf) < r1:
            break
        w = w[:len(w) - len(suf)] + _RO_STEP1[suf]
        standard_removed = True

    # step 2: standard suffixes (R2 gate)
    suf = _longest_in(w, _RO_STEP2_DEL + _RO_STEP2_IST + ["iune", "iuni"],
                      0)
    if suf is not None and len(w) - len(suf) >= r2:
        if suf in ("iune", "iuni"):
            cut = len(w) - len(suf)
            if cut >= 1 and w[cut - 1] == "ţ":
                w = w[:cut - 1] + "t"
                standard_removed = True
        elif suf in _RO_STEP2_IST:
            w = w[:len(w) - len(suf)] + "ist"
            standard_removed = True
        else:
            w = w[:len(w) - len(suf)]
            standard_removed = True

    # step 3: verb suffixes, matching LIMITED to RV
    if not standard_removed:
        best, kind = None, None
        for st, knd in ((_RO_VERB_CONS, "cons"),
                        (_RO_VERB_PLAIN, "plain")):
            for sfx in st:
                if w.endswith(sfx) and len(w) - len(sfx) >= rv:
                    if best is None or len(sfx) > len(best):
                        best, kind = sfx, knd
        if best is not None:
            cut = len(w) - len(best)
            if kind == "plain":
                w = w[:cut]
            elif cut - 1 >= rv and (w[cut - 1] not in _RO_VOWELS
                                    or w[cut - 1] in "uU"):
                w = w[:cut]

    # step 4: final vowel (RV gate, unlimited match)
    suf = _longest_in(w, ["a", "e", "ie", "i", "ă"], 0)
    if suf is not None and len(w) - len(suf) >= rv:
        w = w[:len(w) - len(suf)]
    return w.replace("I", "i").replace("U", "u")


# --- Hungarian (snowballstem.org/algorithms/hungarian/stemmer.html) -------

_HU_VOWELS = "aáeéiíoóöőuúüű"
_HU_DIGRAPHS = ("dzs", "cs", "gy", "ly", "ny", "sz", "ty", "zs")
_HU_DOUBLES = ("ccs", "ggy", "lly", "nny", "ssz", "tty", "zzs", "bb",
               "cc", "dd", "ff", "gg", "jj", "kk", "ll", "mm", "nn",
               "pp", "rr", "ss", "tt", "vv", "zz")
_HU_CASE = """ba ra be re ig nak nek val vel ul nál nél ból ról tól ül
ből ről től n an ban en ben képpen on ön képp kor t at et ként anként
enként onként ot ért öt hez hoz höz vá vé""".split()
_HU_OWNED = {"éi": 1, "é": 1, "ké": 1, "aké": 1, "eké": 1, "oké": 1,
             "öké": 1, "ééi": 2, "éké": 2, "éé": 2, "áéi": 3, "áké": 3}
_HU_SING = {**{s: 1 for s in """a ja d ad ed od öd e je nk unk ünk uk
             juk ük jük m am em om o""".split()},
            **{s: 2 for s in ("ád", "ánk", "ájuk", "ám", "á")},
            **{s: 3 for s in ("éd", "énk", "éjük", "ém", "é")}}
_HU_PLUR = {**{s: 1 for s in """id aid jaid eid jeid i ai jai ei jei
             itek eitek jeitek ik aik jaik eik jeik ink aink jaink
             eink jeink aitok jaitok im aim jaim eim jeim""".split()},
            **{s: 2 for s in ("áid", "ái", "áik", "áink", "áitok",
                              "áim")},
            **{s: 3 for s in ("éid", "éi", "éitek", "éik", "éink",
                              "éim")}}


def _hu_r1(w: str) -> int:
    n = len(w)
    if not n:
        return n
    if w[0] in _HU_VOWELS:
        i = 0
        while i < n and w[i] in _HU_VOWELS:
            i += 1
        if i >= n:
            return n
        for dg in _HU_DIGRAPHS:  # consonant digraph counts as one unit
            if w.startswith(dg, i):
                return i + len(dg)
        return i + 1
    i = 0
    while i < n and w[i] not in _HU_VOWELS:
        i += 1
    return i + 1 if i < n else n


def hungarian_stem(word: str) -> str:
    w = word
    r1 = _hu_r1(w)

    def in_r1(cut):
        return cut >= r1

    def double_before(cut):
        return any(w[:cut].endswith(d) for d in _HU_DOUBLES)

    def undouble(x):
        return x[:-2] + x[-1] if len(x) >= 2 else x

    # instrum: al/el after a double consonant -> delete + undouble
    for suf in ("al", "el"):
        if w.endswith(suf) and in_r1(len(w) - 2) \
                and double_before(len(w) - 2):
            w = undouble(w[:-2])
            break
    # case endings, then á->a / é->e
    suf = _longest_in(w, _HU_CASE, 0)
    if suf is not None and in_r1(len(w) - len(suf)):
        w = w[:len(w) - len(suf)]
        if w.endswith("á") and in_r1(len(w) - 1):
            w = w[:-1] + "a"
        elif w.endswith("é") and in_r1(len(w) - 1):
            w = w[:-1] + "e"
    # case_special: én -> e; án, ánként -> a
    suf = _longest_in(w, ["ánként", "án", "én"], 0)
    if suf is not None and in_r1(len(w) - len(suf)):
        w = w[:len(w) - len(suf)] + ("e" if suf == "én" else "a")
    # case_other: stul/stül family
    suf = _longest_in(w, ["astul", "estül", "ástul", "éstül", "stul",
                          "stül"], 0)
    if suf is not None and in_r1(len(w) - len(suf)):
        rep = {"ástul": "a", "éstül": "e"}.get(suf, "")
        w = w[:len(w) - len(suf)] + rep
    # factive: á/é after a double -> delete + undouble
    for suf in ("á", "é"):
        if w.endswith(suf) and in_r1(len(w) - 1) \
                and double_before(len(w) - 1):
            w = undouble(w[:-1])
            break
    # owned / sing_owner / plur_owner / plural
    for table in (_HU_OWNED, _HU_SING, _HU_PLUR,
                  {"k": 1, "ak": 1, "ek": 1, "ok": 1, "ök": 1,
                   "ák": 2, "ék": 3}):
        suf = _longest_in(w, list(table), 0)
        if suf is not None and in_r1(len(w) - len(suf)):
            case = table[suf]
            w = w[:len(w) - len(suf)]
            if table is _HU_OWNED:
                w += {1: "", 2: "e", 3: "a"}[case]
            elif case == 2:
                w += "a"
            elif case == 3:
                w += "e"
    return w


# --- Finnish (snowballstem.org/algorithms/finnish/stemmer.html) -----------

_FI_V1 = "aeiouyäö"
_FI_V2 = "aeiouäö"
_FI_AEI = "aeiä"
_FI_C = "bcdfghjklmnpqrstvwxz"
_FI_PARTICLE_END = "aeinotuyäö"
_FI_LONG = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")
_FI_P1_CASES = """lla na ssa ta lta sta llä nä ssä tä ltä stä lle ine
ksi""".split()


def finnish_stem(word: str) -> str:
    w = word
    r1, r2 = _r_regions(w, _FI_V1)

    # particle etc. (R1-limited match)
    suf = _longest_in(w, ["kaan", "kään", "sti", "han", "hän", "kin",
                          "pa", "pä", "ko", "kö"], r1)
    if suf == "sti":
        if len(w) - 3 >= r2:
            w = w[:-3]
    elif suf is not None:
        cut = len(w) - len(suf)
        if cut >= 1 and w[cut - 1] in _FI_PARTICLE_END:
            w = w[:cut]

    # possessive (R1-limited)
    suf = _longest_in(w, ["nsa", "nsä", "mme", "nne", "ni", "si", "an",
                          "än", "en"], r1)
    if suf == "si":
        if not (len(w) >= 3 and w[-3] == "k"):
            w = w[:-2]
    elif suf == "ni":
        w = w[:-2]
        if w.endswith("kse"):
            w = w[:-3] + "ksi"
    elif suf in ("nsa", "nsä", "mme", "nne"):
        w = w[:-3]
    elif suf == "an":
        if any(w[:-2].endswith(p) for p in
               ("lla", "na", "ssa", "ta", "lta", "sta")):
            w = w[:-2]
    elif suf == "än":
        if any(w[:-2].endswith(p) for p in
               ("llä", "nä", "ssä", "tä", "ltä", "stä")):
            w = w[:-2]
    elif suf == "en":
        if any(w[:-2].endswith(p) for p in ("lle", "ine")):
            w = w[:-2]

    ending_removed = False

    # case endings (R1-limited). The among carries CONDITION functions
    # on seen/den/tten/siin (LONG / VI tested while still limited);
    # when one fails the among BACKTRACKS to a shorter suffix — switch-
    # case failures (h-harmony, tta-e, a/ä-vc) do not backtrack.
    h_map = {"han": "a", "hen": "e", "hin": "i", "hon": "o",
             "hän": "ä", "hön": "ö"}
    all_sufs = sorted(_FI_P1_CASES + list(h_map) +
                      ["seen", "den", "tten", "siin",
                       "tta", "ttä", "a", "ä", "n"],
                      key=len, reverse=True)
    chosen = None
    for suf in all_sufs:
        cut = len(w) - len(suf)
        if cut < r1 or not w.endswith(suf):
            continue
        if suf == "seen" and not (cut - 2 >= r1 and
                                  w[cut - 2:cut] in _FI_LONG):
            continue
        if suf in ("den", "tten", "siin") and not (
                cut - 2 >= r1 and w[cut - 1] == "i"
                and w[cut - 2] in _FI_V2):
            continue
        chosen = suf
        break
    if chosen is not None:
        suf = chosen
        cut = len(w) - len(suf)
        if suf in _FI_P1_CASES or suf in ("seen", "den", "tten",
                                          "siin"):
            w = w[:cut]
            ending_removed = True
        elif suf in h_map:
            if cut >= 1 and w[cut - 1] == h_map[suf]:
                w = w[:cut]
                ending_removed = True
        elif suf in ("tta", "ttä"):
            if cut >= 1 and w[cut - 1] == "e":
                w = w[:cut]
                ending_removed = True
        elif suf == "n":
            if w[:cut].endswith(_FI_LONG) or w[:cut].endswith("ie"):
                cut -= 1  # the long pair's second vowel goes too
            w = w[:cut]
            ending_removed = True
        else:  # a / ä preceded by (consonant, vowel)
            if cut >= 2 and w[cut - 1] in _FI_V1 \
                    and w[cut - 2] in _FI_C:
                w = w[:cut]
                ending_removed = True

    # other endings (R2-limited)
    suf = _longest_in(w, ["imma", "impa", "immi", "impi", "immä",
                          "impä", "eja", "ejä", "mma", "mpa", "mmi",
                          "mpi", "mmä", "mpä"], r2)
    if suf is not None:
        cut = len(w) - len(suf)
        if suf in ("mma", "mpa", "mmi", "mpi", "mmä", "mpä"):
            if not w[:cut].endswith("po"):
                w = w[:cut]
        else:
            w = w[:cut]

    # plurals
    if ending_removed:
        if w and w[-1] in "ij" and len(w) - 1 >= r1:
            w = w[:-1]
    else:
        if w.endswith("t") and len(w) - 1 >= r1 and len(w) >= 2 \
                and w[-2] in _FI_V1:
            w = w[:-1]
            suf = _longest_in(w, ["imma", "mma"], r2)
            if suf == "imma":
                w = w[:-4]
            elif suf == "mma" and not w[:-3].endswith("po"):
                w = w[:-3]

    # tidy (R1-limited INCLUDING the tested preceding chars, except
    # the final undouble which runs unlimited)
    if w.endswith(_FI_LONG) and len(w) - 2 >= r1:
        w = w[:-1]
    if w and w[-1] in _FI_AEI and len(w) - 2 >= r1 and len(w) >= 2 \
            and w[-2] in _FI_C:
        w = w[:-1]
    if (w.endswith("oj") or w.endswith("uj")) and len(w) - 2 >= r1:
        w = w[:-1]
    if w.endswith("jo") and len(w) - 2 >= r1:
        w = w[:-1]
    # undouble the consonant pair before the trailing vowel run
    i = len(w)
    while i > 0 and w[i - 1] in _FI_V1:
        i -= 1
    if i >= 2 and w[i - 1] in _FI_C and w[i - 2] == w[i - 1]:
        w = w[:i - 1] + w[i:]
    return w


# --- English / Porter2 (snowballstem.org/algorithms/english/stemmer.html)

_EN_VOWELS = "aeiouy"
_EN_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_EN_LI_END = set("cdeghkmnrt")
_EN_EXC1 = {"skis": "ski", "skies": "sky", "dying": "die",
            "lying": "lie", "tying": "tie", "idly": "idl",
            "gently": "gentl", "ugly": "ugli", "early": "earli",
            "only": "onli", "singly": "singl", "sky": "sky",
            "news": "news", "howe": "howe", "atlas": "atlas",
            "cosmos": "cosmos", "bias": "bias", "andes": "andes"}
_EN_EXC2 = frozenset(("inning", "outing", "canning", "herring",
                      "earring", "proceed", "exceed", "succeed"))
_EN_STEP2 = {"tional": "tion", "enci": "ence", "anci": "ance",
             "abli": "able", "entli": "ent", "izer": "ize",
             "ization": "ize", "ational": "ate", "ation": "ate",
             "ator": "ate", "alism": "al", "aliti": "al", "alli": "al",
             "fulness": "ful", "fulli": "ful", "ousli": "ous",
             "ousness": "ous", "iveness": "ive", "iviti": "ive",
             "biliti": "ble", "bli": "ble", "ogi": "og",
             "lessli": "less", "li": ""}
_EN_STEP3 = {"tional": "tion", "ational": "ate", "alize": "al",
             "icate": "ic", "iciti": "ic", "ical": "ic", "ful": "",
             "ness": "", "ative": ""}
_EN_STEP4 = """al ance ence er ic able ible ant ement ment ent ism ate
iti ous ive ize ion""".split()


def _en_short_syllable(w: str, i: int) -> bool:
    """Is a short syllable ending at index i (inclusive)?"""
    if i == 1 and w[0] in _EN_VOWELS and w[1] not in _EN_VOWELS:
        return True
    return (i >= 2 and w[i] not in _EN_VOWELS and w[i] not in "wxY"
            and w[i - 1] in _EN_VOWELS and w[i - 2] not in _EN_VOWELS)


def english_stem(word: str) -> str:
    w = word
    if len(w) <= 2:
        return w
    if w in _EN_EXC1:
        return _EN_EXC1[w]
    if w.startswith("'"):
        w = w[1:]
    # mark consonant y
    chars = list(w)
    if chars and chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _EN_VOWELS:
            chars[i] = "Y"
    w = "".join(chars)
    # R1 with gener/commun/arsen exception
    r1 = None
    for pre in ("gener", "commun", "arsen"):
        if w.startswith(pre):
            r1 = len(pre)
            break
    if r1 is None:
        r1, _ = _r_regions(w, _EN_VOWELS)
        r2 = _r_regions(w, _EN_VOWELS)[1]
    else:
        # R2 computed inside the forced R1
        j = r1
        n = len(w)
        while j < n and w[j] not in _EN_VOWELS:
            j += 1
        while j < n and w[j] in _EN_VOWELS:
            j += 1
        r2 = j + 1 if j < n else n

    def has_vowel(s):
        return any(c in _EN_VOWELS for c in s)

    # step 0: apostrophe forms
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[:len(w) - len(suf)]
            break
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ied") or w.endswith("ies"):
        w = w[:-3] + ("i" if len(w) - 3 > 1 else "ie")
    elif w.endswith("ss") or w.endswith("us"):
        pass
    elif w.endswith("s"):
        if has_vowel(w[:-2]):
            w = w[:-1]
    if w in _EN_EXC2:
        return w
    # step 1b
    suf = _longest_in(w, ["eedly", "ingly", "edly", "eed", "ed",
                          "ing"], 0)
    if suf in ("eed", "eedly"):
        if len(w) - len(suf) >= r1:
            w = w[:len(w) - len(suf)] + "ee"
    elif suf is not None:
        base = w[:len(w) - len(suf)]
        if has_vowel(base):
            w = base
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif w.endswith(_EN_DOUBLES):
                w = w[:-1]
            elif r1 >= len(w) and len(w) >= 2 and \
                    _en_short_syllable(w, len(w) - 1):
                w += "e"
    # step 1c: y -> i after a non-vowel that isn't word-initial
    if len(w) > 2 and w[-1] in "yY" and w[-2] not in _EN_VOWELS:
        w = w[:-1] + "i"
    # step 2 (R1)
    suf = _longest_in(w, list(_EN_STEP2), 0)
    if suf is not None and len(w) - len(suf) >= r1:
        cut = len(w) - len(suf)
        if suf == "ogi":
            if cut >= 1 and w[cut - 1] == "l":
                w = w[:cut] + "og"
        elif suf == "li":
            if cut >= 1 and w[cut - 1] in _EN_LI_END:
                w = w[:cut]
        else:
            w = w[:cut] + _EN_STEP2[suf]
    # step 3 (R1; ative needs R2)
    suf = _longest_in(w, list(_EN_STEP3), 0)
    if suf is not None and len(w) - len(suf) >= r1:
        cut = len(w) - len(suf)
        if suf == "ative":
            if cut >= r2:
                w = w[:cut]
        else:
            w = w[:cut] + _EN_STEP3[suf]
    # step 4 (R2)
    suf = _longest_in(w, _EN_STEP4, 0)
    if suf is not None and len(w) - len(suf) >= r2:
        cut = len(w) - len(suf)
        if suf == "ion":
            if cut >= 1 and w[cut - 1] in "st":
                w = w[:cut]
        else:
            w = w[:cut]
    # step 5
    if w.endswith("e"):
        if len(w) - 1 >= r2 or (len(w) - 1 >= r1 and not (
                len(w) >= 3 and _en_short_syllable(w, len(w) - 2))):
            w = w[:-1]
    elif w.endswith("l") and len(w) - 1 >= r2 and len(w) >= 2 \
            and w[-2] == "l":
        w = w[:-1]
    return w.replace("Y", "y")


# --- Turkish (snowballstem.org/algorithms/turkish/stemmer.html) -----------
# Çilden's suffix-stripping stemmer: every candidate suffix is gated by a
# vowel-harmony check against the nearest preceding harmony-group vowel;
# nominal-verb suffixes strip first, then chained noun suffixes (with the
# recursive "ki" chain, which can delete a MIDDLE segment while keeping the
# already-matched tail), then a postlude (reserved words ad/soyad, append
# ı/i/u/ü after final d/g, undo final-consonant voicing b/c/d/ğ → p/ç/t/k).
# Conformance: turkish.zip golden (reference TestSnowballVocab.java).

_TR_VOWELS = set("aeıioöuü")
_TR_U = set("ıiuü")
_TR_HARMONY = {
    "a": set("aıou"), "e": set("eiöü"),
    "ı": set("aı"), "i": set("ei"),
    "o": set("ou"), "ö": set("öü"),
    "u": set("ou"), "ü": set("öü"),
}
_TR_POSS = ("miz", "niz", "muz", "nuz", "müz", "nüz",
            "mız", "nız", "m", "n")
_TR_LARI = ("leri", "ları")
_TR_NU = ("ni", "nu", "nü", "nı")
_TR_NUN = ("in", "un", "ün", "ın")
_TR_YA = ("a", "e")
_TR_NA = ("na", "ne")
_TR_DA = ("da", "ta", "de", "te")
_TR_NDA = ("nda", "nde")
_TR_DAN = ("dan", "tan", "den", "ten")
_TR_NDAN = ("ndan", "nden")
_TR_YLA = ("la", "le")
_TR_NCA = ("ca", "ce")
_TR_YUM = ("im", "um", "üm", "ım")
_TR_SUN = ("sin", "sun", "sün", "sın")
_TR_YUZ = ("iz", "uz", "üz", "ız")
_TR_SUNUZ = ("siniz", "sunuz", "sünüz", "sınız")
_TR_LAR = ("lar", "ler")
_TR_NUZ = ("niz", "nuz", "nüz", "nız")
_TR_DUR = ("dir", "tir", "dur", "tur", "dür", "tür",
           "dır", "tır")
_TR_CASINA = ("casına", "cesine")
_TR_YDU = ("dik", "tik", "duk", "tuk", "dük", "tük",
           "dık", "tık", "dim", "tim", "dum", "tum",
           "düm", "tüm", "dım", "tım", "din",
           "tin", "dun", "tun", "dün", "tün", "dın",
           "tın", "di", "ti", "du", "tu", "dü", "tü",
           "dı", "tı")
_TR_YSA = ("sak", "sek", "sam", "sem", "san", "sen", "sa", "se")
_TR_YMUS = ("miş", "muş", "müş", "mış")


def _tr_among(w, c, suffixes):
    """Longest suffix of w[:c] in `suffixes`; returns its start or None.
    Lists are pre-ordered longest-first where lengths differ."""
    for s in suffixes:
        n = len(s)
        if c >= n and w[c - n:c] == s:
            return c - n
    return None


def _tr_harmony(w, c):
    """Vowel harmony: the last vowel of w[:c] must have a member of its
    harmony group somewhere to its left."""
    i = c - 1
    while i >= 0 and w[i] not in _TR_VOWELS:
        i -= 1
    if i < 0:
        return False
    grp = _TR_HARMONY[w[i]]
    for j in range(i - 1, -1, -1):
        if w[j] in grp:
            return True
    return False


def _tr_opt_cons(w, c, ch):
    """Optional suffix-initial consonant ch (n/s/y): consume it when
    preceded by a vowel; reject when present but not vowel-preceded, or
    absent without a vowel two back (Snowball
    mark_suffix_with_optional_*_consonant)."""
    if c >= 1 and w[c - 1] == ch:
        if c >= 2 and w[c - 2] in _TR_VOWELS:
            return c - 1
        return None
    if c >= 2 and w[c - 2] in _TR_VOWELS:
        return c
    return None


def _tr_opt_U(w, c):
    """Optional suffix-initial U vowel (ı/i/u/ü), mirrored logic: consume
    when preceded by a non-vowel."""
    if c >= 1 and w[c - 1] in _TR_U:
        if c >= 2 and w[c - 2] not in _TR_VOWELS:
            return c - 1
        return None
    if c >= 2 and w[c - 2] not in _TR_VOWELS:
        return c
    return None


def _tr_mark_poss(w, c):
    c2 = _tr_among(w, c, _TR_POSS)
    return _tr_opt_U(w, c2) if c2 is not None else None


def _tr_mark_sU(w, c):
    if not _tr_harmony(w, c):
        return None
    if c >= 1 and w[c - 1] in _TR_U:
        return _tr_opt_cons(w, c - 1, "s")
    return None


def _tr_mark_yU(w, c):
    if not _tr_harmony(w, c):
        return None
    if c >= 1 and w[c - 1] in _TR_U:
        return _tr_opt_cons(w, c - 1, "y")
    return None


def _tr_harmony_among(w, c, suffixes):
    if not _tr_harmony(w, c):
        return None
    return _tr_among(w, c, suffixes)


def _tr_mark_lArI(w, c):
    return _tr_among(w, c, _TR_LARI)


def _tr_mark_nUn(w, c):
    c2 = _tr_harmony_among(w, c, _TR_NUN)
    return _tr_opt_cons(w, c2, "n") if c2 is not None else None


def _tr_mark_yA(w, c):
    c2 = _tr_harmony_among(w, c, _TR_YA)
    return _tr_opt_cons(w, c2, "y") if c2 is not None else None


def _tr_mark_ylA(w, c):
    c2 = _tr_harmony_among(w, c, _TR_YLA)
    return _tr_opt_cons(w, c2, "y") if c2 is not None else None


def _tr_mark_ncA(w, c):
    c2 = _tr_harmony_among(w, c, _TR_NCA)
    return _tr_opt_cons(w, c2, "n") if c2 is not None else None


def _tr_mark_yUm(w, c):
    c2 = _tr_harmony_among(w, c, _TR_YUM)
    return _tr_opt_cons(w, c2, "y") if c2 is not None else None


def _tr_mark_yUz(w, c):
    c2 = _tr_harmony_among(w, c, _TR_YUZ)
    return _tr_opt_cons(w, c2, "y") if c2 is not None else None


def _tr_mark_yDU(w, c):
    c2 = _tr_harmony_among(w, c, _TR_YDU)
    return _tr_opt_cons(w, c2, "y") if c2 is not None else None


def _tr_mark_ysA(w, c):
    c2 = _tr_among(w, c, _TR_YSA)
    return _tr_opt_cons(w, c2, "y") if c2 is not None else None


def _tr_mark_ymUs(w, c):
    c2 = _tr_harmony_among(w, c, _TR_YMUS)
    return _tr_opt_cons(w, c2, "y") if c2 is not None else None


def _tr_mark_yken(w, c):
    if c >= 3 and w[c - 3:c] == "ken":
        return _tr_opt_cons(w, c - 3, "y")
    return None


def _tr_nominal_verb(w):
    """Strip one nominal-verb suffix chain from the end. Returns
    (word, continue_with_noun_suffixes)."""
    n = len(w)
    for m in (_tr_mark_ymUs, _tr_mark_yDU, _tr_mark_ysA, _tr_mark_yken):
        c = m(w, n)
        if c is not None:
            return w[:c], True
    c = _tr_among(w, n, _TR_CASINA)
    if c is not None:
        base = c
        for m in (lambda w, c: _tr_among(w, c, _TR_SUNUZ),
                  lambda w, c: _tr_harmony_among(w, c, _TR_LAR),
                  _tr_mark_yUm,
                  lambda w, c: _tr_harmony_among(w, c, _TR_SUN),
                  _tr_mark_yUz):
            c2 = m(w, c)
            if c2 is not None:
                base = c2
                break
        c3 = _tr_mark_ymUs(w, base)
        if c3 is not None:
            return w[:c3], True
    c = _tr_harmony_among(w, n, _TR_LAR)
    if c is not None:
        w = w[:c]
        for m in (lambda w, c: _tr_harmony_among(w, c, _TR_DUR),
                  _tr_mark_yDU, _tr_mark_ysA, _tr_mark_ymUs):
            c2 = m(w, len(w))
            if c2 is not None:
                w = w[:c2]
                break
        return w, False
    c = _tr_harmony_among(w, n, _TR_NUZ)
    if c is not None:
        c2 = _tr_mark_yDU(w, c)
        if c2 is None:
            c2 = _tr_mark_ysA(w, c)
        if c2 is not None:
            return w[:c2], True
    for m in (lambda w, c: _tr_among(w, c, _TR_SUNUZ),
              _tr_mark_yUz,
              lambda w, c: _tr_harmony_among(w, c, _TR_SUN),
              _tr_mark_yUm):
        c = m(w, n)
        if c is not None:
            w = w[:c]
            c2 = _tr_mark_ymUs(w, len(w))
            if c2 is not None:
                w = w[:c2]
            return w, True
    c = _tr_harmony_among(w, n, _TR_DUR)
    if c is None:
        return w, True
    w = w[:c]
    base = len(w)
    for m in (lambda w, c: _tr_among(w, c, _TR_SUNUZ),
              lambda w, c: _tr_harmony_among(w, c, _TR_LAR),
              _tr_mark_yUm,
              lambda w, c: _tr_harmony_among(w, c, _TR_SUN),
              _tr_mark_yUz):
        c2 = m(w, len(w))
        if c2 is not None:
            base = c2
            break
    c3 = _tr_mark_ymUs(w, base)
    if c3 is not None:
        w = w[:c3]
    return w, True


def _tr_del(w, c, x):
    """Delete w[x:c] (suffix segment ending at cursor c, tail preserved)."""
    return w[:x] + w[c:], x


def _tr_chain_ki(w, c):
    """The recursive suffix-chain-before-"ki" walk. Matching happens at
    cursor c (which may be mid-string when recursing through an already
    matched tail); deletions remove segments ENDING at the cursor.
    Returns (word, cursor, handled)."""
    if not (c >= 2 and w[c - 2:c] == "ki"):
        return w, c, False
    k = c - 2
    c2 = _tr_harmony_among(w, k, _TR_DA)
    if c2 is not None:
        w, c = _tr_del(w, c, c2)
        c3 = _tr_harmony_among(w, c, _TR_LAR)
        if c3 is not None:
            w, c = _tr_del(w, c, c3)
            w, c, _ = _tr_chain_ki(w, c)
        else:
            c4 = _tr_mark_poss(w, c)
            if c4 is not None:
                w, c = _tr_del(w, c, c4)
                c5 = _tr_harmony_among(w, c, _TR_LAR)
                if c5 is not None:
                    w, c = _tr_del(w, c, c5)
                    w, c, _ = _tr_chain_ki(w, c)
        return w, c, True
    c2 = _tr_mark_nUn(w, k)
    if c2 is not None:
        w, c = _tr_del(w, c, c2)
        c3 = _tr_mark_lArI(w, c)
        if c3 is not None:
            w, c = _tr_del(w, c, c3)
            return w, c, True
        c4 = _tr_mark_poss(w, c)
        if c4 is None:
            c4 = _tr_mark_sU(w, c)
        if c4 is not None:
            w, c = _tr_del(w, c, c4)
            c5 = _tr_harmony_among(w, c, _TR_LAR)
            if c5 is not None:
                w, c = _tr_del(w, c, c5)
                w, c, _ = _tr_chain_ki(w, c)
            return w, c, True
        w, c, _ = _tr_chain_ki(w, c)
        return w, c, True
    c2 = _tr_harmony_among(w, k, _TR_NDA)
    if c2 is None:
        return w, c, False
    c3 = _tr_mark_lArI(w, c2)
    if c3 is not None:
        w, c = _tr_del(w, c, c3)
        return w, c, True
    c4 = _tr_mark_sU(w, c2)
    if c4 is not None:
        w, c = _tr_del(w, c, c4)
        c5 = _tr_harmony_among(w, c, _TR_LAR)
        if c5 is not None:
            w, c = _tr_del(w, c, c5)
            w, c, _ = _tr_chain_ki(w, c)
        return w, c, True
    w2, c2b, ok = _tr_chain_ki(w, c2)
    if not ok:
        return w, c, False
    return w2, c2b, True


def _tr_noun_suffixes(w):
    """Strip the (first matching) noun-suffix chain from the end; the
    branch order mirrors the algorithm's alternatives exactly."""
    n = len(w)
    c = _tr_harmony_among(w, n, _TR_LAR)
    if c is not None:
        w = w[:c]
        w, _, _ = _tr_chain_ki(w, len(w))
        return w
    c = _tr_mark_ncA(w, n)
    if c is not None:
        w = w[:c]
        c2 = _tr_mark_lArI(w, len(w))
        if c2 is not None:
            return w[:c2]
        c3 = _tr_mark_poss(w, len(w))
        if c3 is None:
            c3 = _tr_mark_sU(w, len(w))
        if c3 is not None:
            w = w[:c3]
            c4 = _tr_harmony_among(w, len(w), _TR_LAR)
            if c4 is not None:
                w = w[:c4]
                w, _, _ = _tr_chain_ki(w, len(w))
            return w
        c5 = _tr_harmony_among(w, len(w), _TR_LAR)
        if c5 is not None:
            w = w[:c5]
            w, _, _ = _tr_chain_ki(w, len(w))
        return w
    c = _tr_harmony_among(w, n, _TR_NDA)
    if c is None:
        c = _tr_harmony_among(w, n, _TR_NA)
    if c is not None:
        c2 = _tr_mark_lArI(w, c)
        if c2 is not None:
            return w[:c2]
        c3 = _tr_mark_sU(w, c)
        if c3 is not None:
            w = w[:c3]
            c4 = _tr_harmony_among(w, len(w), _TR_LAR)
            if c4 is not None:
                w = w[:c4]
                w, _, _ = _tr_chain_ki(w, len(w))
            return w
        w2, _, ok = _tr_chain_ki(w, c)
        if ok:
            return w2
    c = _tr_harmony_among(w, n, _TR_NDAN)
    if c is None:
        c = _tr_harmony_among(w, n, _TR_NU)
    if c is not None:
        c2 = _tr_mark_sU(w, c)
        if c2 is not None:
            w = w[:c2]
            c3 = _tr_harmony_among(w, len(w), _TR_LAR)
            if c3 is not None:
                w = w[:c3]
                w, _, _ = _tr_chain_ki(w, len(w))
            return w
        c4 = _tr_mark_lArI(w, c)
        if c4 is not None:
            return w[:c4]
    c = _tr_harmony_among(w, n, _TR_DAN)
    if c is not None:
        w = w[:c]
        c2 = _tr_mark_poss(w, len(w))
        if c2 is not None:
            w = w[:c2]
            c3 = _tr_harmony_among(w, len(w), _TR_LAR)
            if c3 is not None:
                w = w[:c3]
                w, _, _ = _tr_chain_ki(w, len(w))
        else:
            c4 = _tr_harmony_among(w, len(w), _TR_LAR)
            if c4 is not None:
                w = w[:c4]
                w, _, _ = _tr_chain_ki(w, len(w))
            else:
                w, _, _ = _tr_chain_ki(w, len(w))
        return w
    c = _tr_mark_nUn(w, n)
    if c is None:
        c = _tr_mark_ylA(w, n)
    if c is not None:
        w = w[:c]
        done = False
        c2 = _tr_harmony_among(w, len(w), _TR_LAR)
        if c2 is not None:
            w = w[:c2]
            w, _, ok = _tr_chain_ki(w, len(w))
            if ok:
                done = True
        if not done:
            c3 = _tr_mark_poss(w, len(w))
            if c3 is None:
                c3 = _tr_mark_sU(w, len(w))
            if c3 is not None:
                w = w[:c3]
                c4 = _tr_harmony_among(w, len(w), _TR_LAR)
                if c4 is not None:
                    w = w[:c4]
                    w, _, _ = _tr_chain_ki(w, len(w))
            else:
                w, _, _ = _tr_chain_ki(w, len(w))
        return w
    c = _tr_mark_lArI(w, n)
    if c is not None:
        return w[:c]
    w2, _, ok = _tr_chain_ki(w, n)
    if ok:
        return w2
    c = _tr_harmony_among(w, n, _TR_DA)
    if c is None:
        c = _tr_mark_yU(w, n)
    if c is None:
        c = _tr_mark_yA(w, n)
    if c is not None:
        w = w[:c]
        c2 = _tr_mark_poss(w, len(w))
        if c2 is not None:
            w = w[:c2]
            c3 = _tr_harmony_among(w, len(w), _TR_LAR)
            if c3 is not None:
                w = w[:c3]
            w, _, _ = _tr_chain_ki(w, len(w))
        else:
            c4 = _tr_harmony_among(w, len(w), _TR_LAR)
            if c4 is not None:
                w = w[:c4]
                w, _, _ = _tr_chain_ki(w, len(w))
        return w
    c = _tr_mark_poss(w, n)
    if c is None:
        c = _tr_mark_sU(w, n)
    if c is not None:
        w = w[:c]
        c2 = _tr_harmony_among(w, len(w), _TR_LAR)
        if c2 is not None:
            w = w[:c2]
            w, _, _ = _tr_chain_ki(w, len(w))
    return w


_TR_DEVOICE = {"b": "p", "c": "ç", "d": "t", "ğ": "k"}


def turkish_stem(word: str) -> str:
    w = word
    if sum(ch in _TR_VOWELS for ch in w) < 2:
        return w
    w, cont = _tr_nominal_verb(w)
    if not cont:
        return w
    w = _tr_noun_suffixes(w)
    # postlude
    if w in ("ad", "soyad"):
        return w
    if w.endswith(("d", "g")):
        i = len(w) - 1
        while i >= 0 and w[i] not in _TR_VOWELS:
            i -= 1
        if i >= 0:
            v = w[i]
            if v in "aı":
                w += "ı"
            elif v in "ei":
                w += "i"
            elif v in "ou":
                w += "u"
            else:
                w += "ü"
    if w and w[-1] in _TR_DEVOICE:
        w = w[:-1] + _TR_DEVOICE[w[-1]]
    return w


# --- Irish (snowballstem.org/algorithms/irish/stemmer.html) ---------------
# O'Regan's stemmer: strip initial mutation/eclipsis (bhf- → f-, gc- → c-,
# t-prefix etc.), then one noun-suffix, one derivational and one verb-suffix
# pass from the end, gated by the standard RV/R1/R2 regions computed on the
# de-mutated word. Conformance: irish.zip golden.

_GA_VOWELS = set("aeiouáéíóú")
_GA_INITIAL = (  # (prefix, replacement); scanned longest-first
    ("d'fh", "f"), ("bhf", "f"),
    ("b'", ""), ("bh", "b"), ("bp", "p"), ("ch", "c"), ("d'", ""),
    ("dh", "d"), ("dt", "t"), ("fh", "f"), ("gc", "c"), ("gh", "g"),
    ("h-", ""), ("m'", ""), ("mb", "b"), ("mh", "m"), ("n-", ""),
    ("nd", "d"), ("ng", "g"), ("ph", "p"), ("sh", "s"), ("t-", ""),
    ("th", "t"), ("ts", "s"),
)
_GA_NOUN = (  # (suffix, region): 1 = R1 delete, 2 = R2 delete
    ("aíochta", 1), ("íochta", 1), ("aíocht", 1), ("íocht", 1),
    ("aire", 2), ("ire", 2), ("airí", 2), ("irí", 2),
    ("eabh", 1), ("abh", 1), ("aibh", 1), ("ibh", 1),
    ("eamh", 1), ("amh", 1), ("aimh", 1), ("imh", 1),
)
_GA_DERIV = (  # (suffix, action): 1 = R2 delete, else replacement string
    ("grafaíochtaí", "graf"), ("grafaíochta", "graf"),
    ("grafaíocht", "graf"), ("grafaíoch", "graf"),
    ("arcachtaí", "arc"), ("arcachta", "arc"), ("arcacht", "arc"),
    ("óideacha", "óid"), ("óideach", "óid"), ("óidigh", "óid"),
    ("patacha", "paite"), ("pataigh", "paite"), ("patach", "paite"),
    ("paite", "paite"),
    ("gineach", "gin"), ("gineas", "gin"), ("ginis", "gin"),
    ("eachtúil", 1), ("achtúil", 1), ("eachta", 1), ("achta", 1),
    ("eacht", 1), ("acht", 1), ("each", 1), ("ach", 1),
)
_GA_VERB = (  # (suffix, region): 1 = RV delete, 2 = R1 delete
    ("aimid", 1), ("imid", 1), ("aímid", 1), ("ímid", 1),
    ("faidh", 1), ("fidh", 1),
    ("eadh", 2), ("adh", 2), ("áil", 2), ("ain", 2),
    ("tear", 2), ("tar", 2),
)


def _ga_longest(w, table):
    best = None
    for s, v in table:
        if w.endswith(s) and (best is None or len(s) > len(best[0])):
            best = (s, v)
    return best


def irish_stem(word: str) -> str:
    w = word
    for pre, rep in _GA_INITIAL:
        if w.startswith(pre):
            w = rep + w[len(pre):]
            break
    n = len(w)
    i = 0
    while i < n and w[i] not in _GA_VOWELS:
        i += 1
    pv = i + 1 if i < n else n
    p1, p2 = _r_regions(w, "".join(_GA_VOWELS))
    m = _ga_longest(w, _GA_NOUN)
    if m is not None:
        start = len(w) - len(m[0])
        if start >= (p1 if m[1] == 1 else p2):
            w = w[:start]
    m = _ga_longest(w, _GA_DERIV)
    if m is not None:
        start = len(w) - len(m[0])
        if m[1] == 1:
            if start >= p2:
                w = w[:start]
        else:
            w = w[:start] + m[1]
    m = _ga_longest(w, _GA_VERB)
    if m is not None:
        start = len(w) - len(m[0])
        if start >= (pv if m[1] == 1 else p1):
            w = w[:start]
    return w


# --- Nepali (snowballstem.org/algorithms/nepali/stemmer.html) -------------
# Bal Krishna Bal's stemmer: one postposition pass (category 1; the का
# series survives after a preceding ए/े), then a loop alternating the
# conditional nasal/ै marks (category 2) with verb-suffix removal
# (category 3) until no verb suffix remains. Conformance: nepali.zip.

# Suffix tables (linguistic data from the public Snowball project,
# cross-checked against the generated Among arrays; see module doc).
_NE_CAT1 = [  # (suffix, category): 1 = delete, 2 = delete unless after E
    ("\u0932\u093e\u0907", 1),
    ("\u0932\u093e\u0908", 1),
    ("\u0938\u0901\u0917", 1),
    ("\u0938\u0902\u0917", 1),
    ("\u092e\u093e\u0930\u094d\u092b\u0924", 1),
    ("\u0930\u0924", 1),
    ("\u0915\u093e", 2),
    ("\u092e\u093e", 1),
    ("\u0926\u094d\u0935\u093e\u0930\u093e", 1),
    ("\u0915\u093f", 2),
    ("\u092a\u091b\u093f", 1),
    ("\u0915\u0940", 2),
    ("\u0932\u0947", 1),
    ("\u0915\u0948", 2),
    ("\u0938\u0901\u0917\u0948", 1),
    ("\u092e\u0948", 1),
    ("\u0915\u094b", 2),
]
_NE_CAT2_MARKS = ("\u0901", "\u0902", "\u0948")
_NE_CAT3 = [
    "\u0925\u093f\u090f", "\u091b", "\u0907\u091b", "\u090f\u091b",
    "\u093f\u091b", "\u0947\u091b", "\u0928\u0947\u091b", "\u0939\u0941\u0928\u0947\u091b",
    "\u0907\u0928\u094d\u091b", "\u093f\u0928\u094d\u091b", "\u0939\u0941\u0928\u094d\u091b", "\u090f\u0915\u093e",
    "\u0907\u090f\u0915\u093e", "\u093f\u090f\u0915\u093e", "\u0947\u0915\u093e", "\u0928\u0947\u0915\u093e",
    "\u0926\u093e", "\u0907\u0926\u093e", "\u093f\u0926\u093e", "\u0926\u0947\u0916\u093f",
    "\u092e\u093e\u0925\u093f", "\u090f\u0915\u0940", "\u0907\u090f\u0915\u0940", "\u093f\u090f\u0915\u0940",
    "\u0947\u0915\u0940", "\u0926\u0947\u0916\u0940", "\u0925\u0940", "\u0926\u0940",
    "\u091b\u0941", "\u090f\u091b\u0941", "\u0947\u091b\u0941", "\u0928\u0947\u091b\u0941",
    "\u0928\u0941", "\u0939\u0930\u0941", "\u0939\u0930\u0942", "\u091b\u0947",
    "\u0925\u0947", "\u0928\u0947", "\u090f\u0915\u0948", "\u0947\u0915\u0948",
    "\u0928\u0947\u0915\u0948", "\u0926\u0948", "\u0907\u0926\u0948", "\u093f\u0926\u0948",
    "\u090f\u0915\u094b", "\u0907\u090f\u0915\u094b", "\u093f\u090f\u0915\u094b", "\u0947\u0915\u094b",
    "\u0928\u0947\u0915\u094b", "\u0926\u094b", "\u0907\u0926\u094b", "\u093f\u0926\u094b",
    "\u092f\u094b", "\u0907\u092f\u094b", "\u092d\u092f\u094b", "\u093f\u092f\u094b",
    "\u0925\u093f\u092f\u094b", "\u0926\u093f\u092f\u094b", "\u0925\u094d\u092f\u094b", "\u091b\u094c",
    "\u0907\u091b\u094c", "\u090f\u091b\u094c", "\u093f\u091b\u094c", "\u0947\u091b\u094c",
    "\u0928\u0947\u091b\u094c", "\u092f\u094c", "\u0925\u093f\u092f\u094c", "\u091b\u094d\u092f\u094c",
    "\u0925\u094d\u092f\u094c", "\u091b\u0928\u094d", "\u0907\u091b\u0928\u094d", "\u090f\u091b\u0928\u094d",
    "\u093f\u091b\u0928\u094d", "\u0947\u091b\u0928\u094d", "\u0928\u0947\u091b\u0928\u094d", "\u0932\u093e\u0928\u094d",
    "\u091b\u093f\u0928\u094d", "\u0925\u093f\u0928\u094d", "\u092a\u0930\u094d", "\u0907\u0938\u094d",
    "\u0925\u093f\u0907\u0938\u094d", "\u091b\u0938\u094d", "\u0907\u091b\u0938\u094d", "\u090f\u091b\u0938\u094d",
    "\u093f\u091b\u0938\u094d", "\u0947\u091b\u0938\u094d", "\u0928\u0947\u091b\u0938\u094d", "\u093f\u0938\u094d",
    "\u0925\u093f\u0938\u094d", "\u091b\u0947\u0938\u094d", "\u0939\u094b\u0938\u094d",
]
_NE_E_PRECED = ("\u090f", "\u0947")
_NE_CAT2A_COND = ("\u092f\u094c", "\u091b\u094c", "\u0928\u094c", "\u0925\u0947")
_NE_CAT2B_COND = ("\u0924\u094d\u0930",)


def nepali_stem(word: str) -> str:
    w = word
    best = None
    for s, v in _NE_CAT1:
        if w.endswith(s) and (best is None or len(s) > len(best[0])):
            best = (s, v)
    if best is not None:
        s, v = best
        rest = w[:len(w) - len(s)]
        if v == 1 or not rest.endswith(_NE_E_PRECED):
            w = rest
    while True:
        if w.endswith(_NE_CAT2_MARKS):
            rest = w[:-1]
            if w[-1] == _NE_CAT2_MARKS[2]:
                if rest.endswith(_NE_CAT2B_COND):
                    w = rest
            elif rest.endswith(_NE_CAT2A_COND):
                w = rest
        best3 = None
        for s in _NE_CAT3:
            if w.endswith(s) and (best3 is None or len(s) > len(best3)):
                best3 = s
        if best3 is None:
            break
        w = w[:len(w) - len(best3)]
    return w


# --- Lovins (English, 1968) ------------------------------------------------
# J.B. Lovins, "Development of a Stemming Algorithm", Mechanical
# Translation and Computational Linguistics 11 (1968) 22-31; the
# snowball rendering is shipped by the reference as
# ``tartarus/snowball/ext/LovinsStemmer.java`` with golden data
# ``analysis/snowball/lovins.zip``. One pass: remove the longest of the
# 294 Table-A endings whose context condition (A..CC) holds on the
# remaining stem, then undouble a final bb/dd/gg/ll/mm/nn/pp/rr/ss/tt,
# then apply the longest-match respell (Table C) with its letter
# guards (a failed guard respells nothing, per the snowball rendering).

# (ending, condition) — Lovins 1968 Table A endings + conditions
_LOVINS_ENDINGS = (
    ("s'", 'A'),
    ('a', 'A'),
    ('ia', 'A'),
    ('ata', 'A'),
    ('ic', 'A'),
    ('aic', 'A'),
    ('allic', 'BB'),
    ('aric', 'A'),
    ('atic', 'B'),
    ('itic', 'H'),
    ('antic', 'C'),
    ('istic', 'A'),
    ('alistic', 'B'),
    ('aristic', 'A'),
    ('ivistic', 'A'),
    ('ed', 'E'),
    ('anced', 'B'),
    ('enced', 'A'),
    ('ished', 'A'),
    ('ied', 'A'),
    ('ened', 'E'),
    ('ioned', 'A'),
    ('ated', 'I'),
    ('ented', 'C'),
    ('ized', 'F'),
    ('arized', 'A'),
    ('oid', 'A'),
    ('aroid', 'A'),
    ('hood', 'A'),
    ('ehood', 'A'),
    ('ihood', 'A'),
    ('elihood', 'E'),
    ('ward', 'A'),
    ('e', 'A'),
    ('ae', 'A'),
    ('ance', 'B'),
    ('icance', 'A'),
    ('ence', 'A'),
    ('ide', 'L'),
    ('icide', 'A'),
    ('otide', 'A'),
    ('age', 'B'),
    ('able', 'A'),
    ('atable', 'A'),
    ('izable', 'E'),
    ('arizable', 'A'),
    ('ible', 'A'),
    ('encible', 'A'),
    ('ene', 'E'),
    ('ine', 'M'),
    ('idine', 'I'),
    ('one', 'R'),
    ('ature', 'E'),
    ('eature', 'Z'),
    ('ese', 'A'),
    ('wise', 'A'),
    ('ate', 'A'),
    ('entiate', 'A'),
    ('inate', 'A'),
    ('ionate', 'D'),
    ('ite', 'AA'),
    ('ive', 'A'),
    ('ative', 'A'),
    ('ize', 'F'),
    ('alize', 'A'),
    ('icalize', 'A'),
    ('ialize', 'A'),
    ('entialize', 'A'),
    ('ionalize', 'A'),
    ('arize', 'A'),
    ('ing', 'N'),
    ('ancing', 'B'),
    ('encing', 'A'),
    ('aging', 'B'),
    ('ening', 'E'),
    ('ioning', 'A'),
    ('ating', 'I'),
    ('enting', 'C'),
    ('ying', 'B'),
    ('izing', 'F'),
    ('arizing', 'A'),
    ('ish', 'C'),
    ('yish', 'A'),
    ('i', 'A'),
    ('al', 'BB'),
    ('ical', 'A'),
    ('aical', 'A'),
    ('istical', 'A'),
    ('oidal', 'A'),
    ('eal', 'Y'),
    ('ial', 'A'),
    ('ancial', 'A'),
    ('arial', 'A'),
    ('ential', 'A'),
    ('ional', 'A'),
    ('ational', 'B'),
    ('izational', 'A'),
    ('ental', 'A'),
    ('ful', 'A'),
    ('eful', 'A'),
    ('iful', 'A'),
    ('yl', 'R'),
    ('ism', 'B'),
    ('icism', 'A'),
    ('oidism', 'A'),
    ('alism', 'B'),
    ('icalism', 'A'),
    ('ionalism', 'A'),
    ('inism', 'J'),
    ('ativism', 'A'),
    ('um', 'U'),
    ('ium', 'A'),
    ('ian', 'A'),
    ('ician', 'A'),
    ('en', 'F'),
    ('ogen', 'A'),
    ('on', 'S'),
    ('ion', 'Q'),
    ('ation', 'B'),
    ('ication', 'G'),
    ('entiation', 'A'),
    ('ination', 'A'),
    ('isation', 'A'),
    ('arisation', 'A'),
    ('entation', 'A'),
    ('ization', 'F'),
    ('arization', 'A'),
    ('action', 'G'),
    ('o', 'A'),
    ('ar', 'X'),
    ('ear', 'Y'),
    ('ier', 'A'),
    ('ariser', 'A'),
    ('izer', 'F'),
    ('arizer', 'A'),
    ('or', 'T'),
    ('ator', 'A'),
    ('s', 'W'),
    ("'s", 'A'),
    ('as', 'B'),
    ('ics', 'A'),
    ('istics', 'A'),
    ('es', 'E'),
    ('ances', 'B'),
    ('ences', 'A'),
    ('ides', 'L'),
    ('oides', 'A'),
    ('ages', 'B'),
    ('ies', 'P'),
    ('acies', 'A'),
    ('ancies', 'A'),
    ('encies', 'A'),
    ('aries', 'A'),
    ('ities', 'A'),
    ('alities', 'A'),
    ('ivities', 'A'),
    ('ines', 'M'),
    ('nesses', 'A'),
    ('ates', 'A'),
    ('atives', 'A'),
    ('ings', 'N'),
    ('is', 'A'),
    ('als', 'BB'),
    ('ials', 'A'),
    ('entials', 'A'),
    ('ionals', 'A'),
    ('isms', 'B'),
    ('ians', 'A'),
    ('icians', 'A'),
    ('ions', 'B'),
    ('ations', 'B'),
    ('arisations', 'A'),
    ('entations', 'A'),
    ('izations', 'A'),
    ('arizations', 'A'),
    ('ars', 'O'),
    ('iers', 'A'),
    ('izers', 'F'),
    ('ators', 'A'),
    ('less', 'A'),
    ('eless', 'A'),
    ('ness', 'A'),
    ('eness', 'E'),
    ('ableness', 'A'),
    ('eableness', 'E'),
    ('ibleness', 'A'),
    ('ateness', 'A'),
    ('iteness', 'A'),
    ('iveness', 'A'),
    ('ativeness', 'A'),
    ('ingness', 'A'),
    ('ishness', 'A'),
    ('iness', 'A'),
    ('ariness', 'E'),
    ('alness', 'A'),
    ('icalness', 'A'),
    ('antialness', 'A'),
    ('entialness', 'A'),
    ('ionalness', 'A'),
    ('fulness', 'A'),
    ('lessness', 'A'),
    ('ousness', 'A'),
    ('eousness', 'A'),
    ('iousness', 'A'),
    ('itousness', 'A'),
    ('entness', 'A'),
    ('ants', 'B'),
    ('ists', 'A'),
    ('icists', 'A'),
    ('us', 'V'),
    ('ous', 'A'),
    ('eous', 'A'),
    ('aceous', 'A'),
    ('antaneous', 'A'),
    ('ious', 'A'),
    ('acious', 'B'),
    ('itous', 'A'),
    ('ant', 'B'),
    ('icant', 'A'),
    ('ent', 'C'),
    ('ement', 'A'),
    ('izement', 'A'),
    ('ist', 'A'),
    ('icist', 'A'),
    ('alist', 'A'),
    ('icalist', 'A'),
    ('ialist', 'A'),
    ('ionist', 'A'),
    ('entist', 'A'),
    ('y', 'B'),
    ('acy', 'A'),
    ('ancy', 'B'),
    ('ency', 'A'),
    ('ly', 'B'),
    ('ealy', 'Y'),
    ('ably', 'A'),
    ('ibly', 'A'),
    ('edly', 'E'),
    ('iedly', 'A'),
    ('ely', 'E'),
    ('ately', 'A'),
    ('ively', 'A'),
    ('atively', 'A'),
    ('ingly', 'B'),
    ('atingly', 'A'),
    ('ily', 'A'),
    ('lily', 'A'),
    ('arily', 'A'),
    ('ally', 'B'),
    ('ically', 'A'),
    ('aically', 'A'),
    ('allically', 'C'),
    ('istically', 'A'),
    ('alistically', 'B'),
    ('oidally', 'A'),
    ('ially', 'A'),
    ('entially', 'A'),
    ('ionally', 'A'),
    ('ationally', 'B'),
    ('izationally', 'B'),
    ('entally', 'A'),
    ('fully', 'A'),
    ('efully', 'A'),
    ('ifully', 'A'),
    ('enly', 'E'),
    ('arly', 'K'),
    ('early', 'Y'),
    ('lessly', 'A'),
    ('ously', 'A'),
    ('eously', 'A'),
    ('iously', 'A'),
    ('ently', 'A'),
    ('ary', 'F'),
    ('ery', 'E'),
    ('icianry', 'A'),
    ('atory', 'A'),
    ('ity', 'A'),
    ('acity', 'A'),
    ('icity', 'A'),
    ('eity', 'A'),
    ('ality', 'A'),
    ('icality', 'A'),
    ('iality', 'A'),
    ('antiality', 'A'),
    ('entiality', 'A'),
    ('ionality', 'A'),
    ('elity', 'A'),
    ('ability', 'A'),
    ('izability', 'A'),
    ('arizability', 'A'),
    ('ibility', 'A'),
    ('inity', 'CC'),
    ('arity', 'B'),
    ('ivity', 'A'),
)

_LOVINS_COND = {
    "A": lambda s: len(s) >= 2,
    "B": lambda s: len(s) >= 3,
    "C": lambda s: len(s) >= 4,
    "D": lambda s: len(s) >= 5,
    "E": lambda s: len(s) >= 2 and s[-1] != "e",
    "F": lambda s: len(s) >= 3 and s[-1] != "e",
    "G": lambda s: len(s) >= 3 and s[-1] == "f",
    "H": lambda s: len(s) >= 2 and (s.endswith("t") or s.endswith("ll")),
    "I": lambda s: len(s) >= 2 and s[-1] not in "oe",
    "J": lambda s: len(s) >= 2 and s[-1] not in "ae",
    "K": lambda s: len(s) >= 3 and (s[-1] in "li"
                                    or (s[-1] == "e" and s[-3] == "u")),
    "L": lambda s: len(s) >= 2 and s[-1] not in "ux"
        and (s[-1] != "s" or (len(s) >= 2 and s[-2] == "o")),
    "M": lambda s: len(s) >= 2 and s[-1] not in "acem",
    "N": lambda s: len(s) >= 3 and (s[-3] != "s" or len(s) >= 4),
    "O": lambda s: len(s) >= 2 and s[-1] in "li",
    "P": lambda s: len(s) >= 2 and s[-1] != "c",
    "Q": lambda s: len(s) >= 3 and s[-1] not in "ln",
    "R": lambda s: len(s) >= 2 and s[-1] in "nr",
    "S": lambda s: len(s) >= 2 and (s.endswith("dr")
        or (s[-1] == "t" and not s.endswith("tt"))),
    "T": lambda s: len(s) >= 2 and (s[-1] == "s"
        or (s[-1] == "t" and not s.endswith("ot"))),
    "U": lambda s: len(s) >= 2 and s[-1] in "lmnr",
    "V": lambda s: len(s) >= 2 and s[-1] == "c",
    "W": lambda s: len(s) >= 2 and s[-1] not in "su",
    "X": lambda s: len(s) >= 2 and (s[-1] in "li"
        or (s[-1] == "e" and len(s) >= 3 and s[-3] == "u")),
    "Y": lambda s: len(s) >= 2 and s.endswith("in"),
    "Z": lambda s: len(s) >= 2 and s[-1] != "f",
    "AA": lambda s: len(s) >= 2 and any(s.endswith(e) for e in (
        "d", "f", "ph", "th", "l", "er", "or", "es", "t")),
    "BB": lambda s: len(s) >= 3 and not s.endswith("met")
        and not s.endswith("ryst"),
    "CC": lambda s: len(s) >= 2 and s[-1] == "l",
}

_LOVINS_BY_LEN = sorted(_LOVINS_ENDINGS, key=lambda p: -len(p[0]))

_LOVINS_UNDOUBLE = ("bb", "dd", "gg", "ll", "mm", "nn", "pp", "rr",
                    "ss", "tt")

# (suffix, replacement, guard) — guard(stem_before_suffix) must be True
# to respell; a failed guard leaves the word untouched (no fallback)
_LOVINS_RESPELL = (
    ("iev", "ief", None),
    ("uct", "uc", None),
    ("umpt", "um", None),
    ("rpt", "rb", None),
    ("urs", "ur", None),
    ("istr", "ister", None),
    ("metr", "meter", None),
    ("olv", "olut", None),
    ("ul", "l", lambda p: not p or p[-1] not in "aio"),
    ("bex", "bic", None),
    ("dex", "dic", None),
    ("pex", "pic", None),
    ("tex", "tic", None),
    ("ax", "ac", None),
    ("ex", "ec", None),
    ("ix", "ic", None),
    ("lux", "luc", None),
    ("uad", "uas", None),
    ("vad", "vas", None),
    ("cid", "cis", None),
    ("lid", "lis", None),
    ("erid", "eris", None),
    ("pand", "pans", None),
    ("end", "ens", lambda p: not p or p[-1] != "s"),
    ("ond", "ons", None),
    ("lud", "lus", None),
    ("rud", "rus", None),
    ("her", "hes", lambda p: not p or p[-1] not in "pt"),
    ("mit", "mis", None),
    ("ent", "ens", lambda p: not p or p[-1] != "m"),
    ("ert", "ers", None),
    ("et", "es", lambda p: not p or p[-1] != "n"),
    ("yt", "ys", None),
    ("yz", "ys", None),
)
_LOVINS_RESPELL_BY_LEN = sorted(_LOVINS_RESPELL, key=lambda r: -len(r[0]))


def lovins_stem(word: str) -> str:
    w = word
    # step 1: longest ending whose condition holds on the stem;
    # condition failure falls through to shorter matching endings
    # (the among parent-chain backtrack)
    for end, cond in _LOVINS_BY_LEN:
        if w.endswith(end):
            stem = w[:len(w) - len(end)]
            if _LOVINS_COND[cond](stem):
                w = stem
                break
    # step 2: undouble a final double consonant
    if w[-2:] in _LOVINS_UNDOUBLE:
        w = w[:-1]
    # step 3: respell (longest suffix match; guard failure = no-op)
    for suf, rep, guard in _LOVINS_RESPELL_BY_LEN:
        if w.endswith(suf):
            pre = w[:len(w) - len(suf)]
            if guard is None or guard(pre):
                w = pre + rep
            break
    return w
