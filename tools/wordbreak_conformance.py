"""Run the tokenizer against the reference's exhaustive generated
word-break / emoji test suites (Unicode 12.1 WordBreakTest data) and
report conformance. Usage: python tools/wordbreak_conformance.py [-v]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

WB = ("/root/reference/lucene/test-framework/src/java/org/apache/lucene/"
      "tests/analysis/standard/WordBreakTestUnicode_12_1_0.java")
EMOJI = ("/root/reference/lucene/test-framework/src/java/org/apache/lucene/"
         "tests/analysis/standard/EmojiTokenizationTestUnicode_12_1.java")

_CALL_RE = re.compile(
    r'assertAnalyzesTo\(\s*analyzer,\s*"((?:[^"\\]|\\.)*)",\s*'
    r"new String\[\] \{([^}]*)\}", re.S)
_STR_RE = re.compile(r'"((?:[^"\\]|\\.)*)"')


def decode_java(s: str) -> str:
    out = []
    i = 0
    units: list[int] = []

    def flush_units():
        nonlocal units
        if units:
            out.append("".join(chr(u) for u in _combine_surrogates(units)))
            units = []

    while i < len(s):
        c = s[i]
        if c == "\\":
            e = s[i + 1]
            if e == "u":
                units.append(int(s[i + 2:i + 6], 16))
                i += 6
                continue
            flush_units()
            mapping = {"n": "\n", "r": "\r", "t": "\t", "\\": "\\",
                       '"': '"', "'": "'", "f": "\f", "b": "\b", "0": "\0"}
            out.append(mapping.get(e, e))
            i += 2
        else:
            flush_units()
            out.append(c)
            i += 1
    flush_units()
    return "".join(out)


def _combine_surrogates(units: list[int]) -> list[int]:
    cps = []
    i = 0
    while i < len(units):
        u = units[i]
        if 0xD800 <= u <= 0xDBFF and i + 1 < len(units) \
                and 0xDC00 <= units[i + 1] <= 0xDFFF:
            cps.append(0x10000 + ((u - 0xD800) << 10) + (units[i + 1] - 0xDC00))
            i += 2
        else:
            cps.append(u)
            i += 1
    return cps


def load_cases(path: str):
    src = open(path, encoding="utf-8").read()
    cases = []
    for m in _CALL_RE.finditer(src):
        text = decode_java(m.group(1))
        expected = [decode_java(x.group(1)) for x in _STR_RE.finditer(m.group(2))]
        cases.append((text, expected))
    return cases


def load_emoji_cases(path: str):
    """EmojiTokenizationTestUnicode: TESTS = {comment, text, ...}; every
    text must tokenize to exactly [text] with type <EMOJI>."""
    src = open(path, encoding="utf-8").read()
    body = src.split("TESTS =", 1)[1]
    strings = [decode_java(m.group(1)) for m in _STR_RE.finditer(body)]
    cases = []
    for i in range(0, len(strings) - 1, 2):
        text = strings[i + 1]
        cases.append((text, [text]))
    return cases


def run(path: str, label: str, verbose: bool = False, emoji: bool = False):
    from lucene_ray.analysis import tokenize
    cases = load_emoji_cases(path) if emoji else load_cases(path)
    ok = 0
    fails = []
    for text, expected in cases:
        got = [t.text for t in tokenize(text)]
        if got == expected:
            ok += 1
        else:
            fails.append((text, expected, got))
    pct = 100.0 * ok / len(cases) if cases else 0.0
    print(f"{label}: {ok}/{len(cases)} = {pct:.2f}% conformant")
    if verbose:
        for text, want, got in fails[:40]:
            print("  text:", [hex(ord(c)) for c in text])
            print("   want:", want, " got:", got)
    return pct, fails


if __name__ == "__main__":
    v = "-v" in sys.argv
    run(WB, "WordBreakTestUnicode_12_1_0", v)
    run(EMOJI, "EmojiTokenizationTestUnicode_12_1", v, emoji=True)
