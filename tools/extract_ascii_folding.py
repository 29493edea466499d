"""Extract the ASCII-folding conformance table from the reference's
TestASCIIFoldingFilter.testAllFoldings (public conformance data: which
non-ASCII char folds to which ASCII string) into a TSV fixture.

Usage: python tools/extract_ascii_folding.py \
           > lucene_ray/analysis/data/ascii_folding.tsv
"""
import re
import sys

SRC = ("/root/reference/lucene/analysis/common/src/test/org/apache/lucene/"
       "analysis/miscellaneous/TestASCIIFoldingFilter.java")

text = open(SRC, encoding="utf-8").read()
start = text.index("String[] foldings = {")
body = text[start:text.index("};", start)]

# strip // comments (they never contain quotes we care about beyond names)
body = re.sub(r"//[^\n]*", "", body)

# tokenise: string literals, '+' concatenation, ',' separators
toks = re.findall(r'"(?:\\.|[^"\\])*"|[+,]', body)


def unescape(lit: str) -> str:
    s = lit[1:-1]
    out, i = [], 0
    while i < len(s):
        c = s[i]
        if c == "\\":
            n = s[i + 1]
            if n == "u":
                out.append(chr(int(s[i + 2:i + 6], 16)))
                i += 6
            else:
                out.append({"n": "\n", "t": "\t", "\\": "\\", '"': '"',
                            "'": "'"}[n])
                i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


entries = []  # alternating: chars-to-fold, folded-result
cur = []
for t in toks:
    if t == "+":
        continue
    if t == ",":
        if cur:
            entries.append("".join(cur))
            cur = []
    else:
        cur.append(unescape(t))
if cur:
    entries.append("".join(cur))

assert len(entries) % 2 == 0, len(entries)
pairs = {}
for i in range(0, len(entries), 2):
    src, dst = entries[i], entries[i + 1]
    for ch in src:
        assert ch not in pairs or pairs[ch] == dst, (hex(ord(ch)), dst)
        pairs[ch] = dst

for ch in sorted(pairs):
    sys.stdout.write(f"{ord(ch):04X}\t{pairs[ch]}\n")
sys.stderr.write(f"{len(pairs)} mappings\n")
