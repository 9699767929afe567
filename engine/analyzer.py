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


# Sentinel token used by tokenize_flat to mark document boundaries in the
# single-pass joined scan. It is itself a valid token (word chars) and is
# removed from the output; a (pathological) document containing it verbatim
# is handled by the per-doc fallback.
_DOC_SENTINEL = "zzqxjdocsepvqkzz"


def tokenize_flat(texts) -> tuple[np.ndarray, np.ndarray]:
    """Single-pass batch tokenizer: lowercase + findall over ONE joined
    string (C-level, no per-row regex calls or intermediate Series), then
    split back on sentinel positions. Returns (flat_tokens object array,
    per-doc token counts). Semantically identical to tokenize() per doc —
    asserted by tests and guarded by a fallback when the sentinel collides.
    """
    tl = [t if isinstance(t, str) else "" for t in texts]
    n = len(tl)
    if n == 0:
        return np.empty(0, dtype=object), np.empty(0, dtype=np.int64)
    joined = (" " + _DOC_SENTINEL + " ").join(tl)
    flat = _TOKEN_RE.findall(joined.lower())
    arr = np.asarray(flat, dtype=object)
    bounds = np.flatnonzero(arr == _DOC_SENTINEL)
    if len(bounds) != n - 1:  # sentinel collision — per-doc slow path
        per_doc = [_TOKEN_RE.findall(t.lower()) for t in tl]
        dls = np.asarray([len(p) for p in per_doc], dtype=np.int64)
        flat_arr = (
            np.concatenate([np.asarray(p, dtype=object) for p in per_doc])
            if dls.sum()
            else np.empty(0, dtype=object)
        )
        return flat_arr, dls
    dls = np.diff(np.concatenate(([-1], bounds, [len(arr)]))) - 1
    if len(bounds):
        keep = np.ones(len(arr), dtype=bool)
        keep[bounds] = False
        arr = arr[keep]
    return arr, dls.astype(np.int64)
