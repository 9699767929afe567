"""Text extraction + tokenization (SURVEY.md §2.B1, §2.B2).

Semantics re-expressed from the reference's delegated Elasticsearch layer
(ES 5.x standard analyzer: Unicode word segmentation + lowercase, no
stopwords, no stemming — the reference's mapping did not override the
analyzer; SURVEY.md §2.B2 [R]).

Extraction invariant (BASELINE.json:15): byte-identical extracted text per
url — if the `text` column is non-null it is used verbatim; otherwise a
deterministic utf-8 decode + tag-strip of `html` is applied. Both the pure
scalar functions (unit-tested for byte identity) and the Arrow-vectorized
wrappers used in the Spark build path live here. No per-row Python UDFs
anywhere (BASELINE.json:15).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# Unicode word characters, excluding underscore (approximation of the ES
# standard analyzer's UAX#29 word segmentation documented in SURVEY.md §2.B2;
# exact for the fixture vocabulary which is [a-z]+).
_TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)
# Deterministic tag strip for the html fallback path: drop script/style
# blocks, then all tags. No whitespace normalization (byte identity).
_SCRIPT_STYLE_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_TAG_RE = re.compile(r"<[^>]*>")


def extract_text(url: str | None, html: bytes | None, text: str | None) -> str:
    """Pure extraction function. `text` passthrough wins; else tag-strip html.

    Invariant (BASELINE.json:15): output is byte-identical per url across
    runs/parallelism — it is a pure function of (html, text).
    """
    if text is not None:
        return text
    if html is None:
        return ""
    decoded = html.decode("utf-8", errors="replace")
    decoded = _SCRIPT_STYLE_RE.sub("", decoded)
    return _TAG_RE.sub("", decoded)


def tokenize(text: str) -> list[str]:
    """Pure tokenizer: lowercase + Unicode word segmentation (no stopwords,
    no stemming). Matches the analyzer contract in SURVEY.md §2.B2."""
    if not text:
        return []
    return _TOKEN_RE.findall(text.lower())


# ---------------------------------------------------------------------------
# Vectorized (pandas / Arrow-batch) forms used inside mapInPandas stages.
# ---------------------------------------------------------------------------


def extract_series(
    url: pd.Series, html: pd.Series, text: pd.Series
) -> pd.Series:
    """Vectorized extraction: passthrough where text is non-null, tag-strip
    decode only on the (usually rare) null-text rows."""
    out = text.copy()
    missing = text.isna()
    if missing.any():
        fallback = html[missing].map(
            lambda h: extract_text(None, h, None), na_action=None
        )
        out[missing] = fallback
    return out.fillna("")


def tokenize_series(text: pd.Series) -> pd.Series:
    """Vectorized tokenizer: pandas str ops (C-level), one findall pass."""
    return text.fillna("").str.lower().str.findall(_TOKEN_RE)


def doc_lengths(tokens: pd.Series) -> np.ndarray:
    return tokens.str.len().fillna(0).to_numpy(dtype=np.int64)
