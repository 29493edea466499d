"""Payload analysis — the ``analysis/payloads`` package role.

``DelimitedPayloadTokenFilter`` (``analysis/common/src/java/org/apache/
lucene/analysis/payloads/DelimitedPayloadTokenFilter.java``, tests
``TestDelimitedPayloadTokenFilter.java``): each token of the form
``text<delimiter>payload`` is split into the bare term plus a payload
decoded by an encoder (FloatEncoder / IntegerEncoder /
IdentityEncoder roles). Tokens without the delimiter pass through
with no payload (None).
"""

from __future__ import annotations


def delimited_payloads(tokens, delimiter: str = "|",
                       encoder: str = "float"):
    """Split ``text|payload`` tokens -> (terms, payloads).

    ``payloads[i]`` is None when token i carried no delimiter. The
    LAST delimiter splits (PayloadHelper semantics: the payload is
    everything after the final delimiter)."""
    if encoder == "float":
        dec = float
    elif encoder == "int":
        dec = int
    elif encoder == "identity":
        dec = str
    else:
        raise ValueError(f"unknown payload encoder {encoder!r}")
    terms, payloads = [], []
    for tok in tokens:
        j = tok.rfind(delimiter)
        if j < 0:
            terms.append(tok)
            payloads.append(None)
        else:
            terms.append(tok[:j])
            payloads.append(dec(tok[j + len(delimiter):]))
    return terms, payloads


class DelimitedPayloadTokenFilter:
    """Chain-slot form: callable over a token list, keeping the decoded
    payloads on ``self.last_payloads`` (the token-attribute analog)."""

    def __init__(self, delimiter: str = "|", encoder: str = "float"):
        self.delimiter = delimiter
        self.encoder = encoder
        self.last_payloads = None

    def __call__(self, tokens):
        terms, payloads = delimited_payloads(tokens, self.delimiter,
                                             self.encoder)
        self.last_payloads = payloads
        return terms
