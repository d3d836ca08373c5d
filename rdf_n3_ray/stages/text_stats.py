"""Text-analysis stages for large-scale training-data pipelines.

Beyond the reference's operator set (per the build brief): language ID,
quality scoring, token counting, document fingerprinting — each a
vectorized map_batches stage over the `documents` table
(doc_id, text, lang, source, n_chars).

All kernels are pure pandas/numpy vector ops (no per-row Python in the
hot path except the n-gram language scorer, which runs over a small
profile dict per row segment and is wrapped in an actor so profiles
compile once per worker).
"""
from __future__ import annotations

import re

import numpy as np
import pandas as pd

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "von", "mit", "den", "nicht"},
    "fr": {"le", "la", "les", "et", "de", "un", "une", "est", "pour"},
    "es": {"el", "la", "los", "de", "y", "que", "en", "un", "una", "es"},
}


def quality_scores(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Length / punctuation / stopword-ratio quality features."""
    text = batch[text_col].fillna("")
    n_chars = text.str.len().astype("int64")
    words = text.str.split()
    n_words = words.str.len().fillna(0).astype("int64")
    n_punct = text.str.count(r"[^\w\s]").astype("int64")
    n_upper = text.str.count(r"[A-Z]").astype("int64")
    n_digit = text.str.count(r"[0-9]").astype("int64")
    # chars EXCLUDING separators / words — n_chars/n_words would count
    # whitespace into "word length" ('aa bb' -> 2.5 instead of 2.0).
    # (relational.doc_quality keeps the gross-chars form to match its
    # SQL oracle; this is the library-quality metric.)
    n_ws = text.str.count(r"\s").astype("int64")
    mean_word_len = ((n_chars - n_ws) / n_words.replace(0, 1)).astype("float64")
    punct_ratio = (n_punct / n_chars.replace(0, 1)).astype("float64")
    upper_ratio = (n_upper / n_chars.replace(0, 1)).astype("float64")
    digit_ratio = (n_digit / n_chars.replace(0, 1)).astype("float64")
    out = batch.copy()
    out["n_words"] = n_words
    out["mean_word_len"] = mean_word_len
    out["punct_ratio"] = punct_ratio
    out["upper_ratio"] = upper_ratio
    out["digit_ratio"] = digit_ratio
    return out


_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"


def token_counts(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Whitespace + BPE-ish regex token counts (vectorized str.count)."""
    text = batch[text_col].fillna("")
    out = batch.copy()
    out["ws_tokens"] = text.str.split().str.len().fillna(0).astype("int64")
    out["re_tokens"] = text.str.count(_TOKEN_RE).astype("int64")
    return out


def fingerprints(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """64-bit content fingerprint (stable across runs/workers) + a
    rolling-hash style normalized fingerprint (lowercased, whitespace
    collapsed) for near-identical detection."""
    text = batch[text_col].fillna("")
    norm = text.str.lower().str.replace(r"\s+", " ", regex=True).str.strip()
    out = batch.copy()
    # stages/keys.hash64 carries the categorize=False invariant (the
    # default hasher truncates at an embedded NUL, which would give
    # binary-ish documents sharing a prefix ONE fingerprint — these
    # columns are identity, not buckets, so that is a wrong answer)
    from .keys import hash64

    out["fp_exact"] = hash64(text)
    out["fp_norm"] = hash64(norm)
    return out


class LangId:
    """Stopword/character n-gram heuristic language ID; actor-pool stage
    (profiles built once per actor, SURVEY.md §2.4 pattern)."""

    def __init__(self):
        self.word_re = re.compile(r"[a-zA-Zäöüßéèêàçñ]+")
        self.profiles = {
            lang: frozenset(words) for lang, words in _STOPWORDS.items()
        }

    def classify(self, text: str) -> str:
        words = [w.lower() for w in self.word_re.findall(text or "")][:200]
        if not words:
            return "und"
        best, best_score = "und", 0
        for lang, stops in self.profiles.items():
            score = sum(1 for w in words if w in stops)
            if score > best_score:
                best, best_score = lang, score
        return best

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["lang_pred"] = [self.classify(t) for t in batch["text"].fillna("")]
        return out


def add_text_stats(ds, batch_size: int = 4096):
    """documents Dataset -> + quality/token/fingerprint columns."""
    ds = ds.map_batches(quality_scores, batch_format="pandas", batch_size=batch_size)
    ds = ds.map_batches(token_counts, batch_format="pandas", batch_size=batch_size)
    ds = ds.map_batches(fingerprints, batch_format="pandas", batch_size=batch_size)
    return ds
