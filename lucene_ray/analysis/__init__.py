"""Analysis chain: StandardAnalyzer-conformant tokenization + norms."""

from .analyzer import (ENGLISH_STOP_WORDS, AnalyzedToken, KeywordAnalyzer,
                       StandardAnalyzer)
from .smallfloat import (
    LENGTH_TABLE,
    byte4_to_int,
    int_to_byte4,
    int_to_byte4_array,
)
from .tokenizer import (
    ALPHANUM,
    DEFAULT_MAX_TOKEN_LENGTH,
    EMOJI,
    HANGUL,
    HIRAGANA,
    IDEOGRAPHIC,
    KATAKANA,
    NUM,
    SOUTHEAST_ASIAN,
    Token,
    tokenize,
)
from .props import java_lowercase
from .cjk import CJKAnalyzer, CJKBigramFilter
from .urlemail import UAX29URLEmailAnalyzer, tokenize_urlemail

__all__ = [
    "CJKAnalyzer",
    "CJKBigramFilter",
    "UAX29URLEmailAnalyzer",
    "tokenize_urlemail",
    "KeywordAnalyzer",
    "ENGLISH_STOP_WORDS",
    "AnalyzedToken",
    "StandardAnalyzer",
    "LENGTH_TABLE",
    "byte4_to_int",
    "int_to_byte4",
    "int_to_byte4_array",
    "Token",
    "tokenize",
    "java_lowercase",
    "ALPHANUM",
    "NUM",
    "SOUTHEAST_ASIAN",
    "IDEOGRAPHIC",
    "HIRAGANA",
    "KATAKANA",
    "HANGUL",
    "EMOJI",
    "DEFAULT_MAX_TOKEN_LENGTH",
]
