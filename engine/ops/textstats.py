"""Text analysis for training-data curation: token counting, quality
scoring, language-ID, document fingerprinting.

All stages are map_batches transforms; the regex-based ones are callable
CLASSES (actor pools) so patterns compile once per worker, per the
stateful-stage rule. SQL-expressible components (counts, ratios) carry
DuckDB oracles; heuristics (langid score, winnowing fingerprints) are
pytest-oracled rows-only.
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# ------------------------------------------------------ token counting --

# BPE-ish pre-tokenizer (GPT-2 style, ASCII approximation: contractions,
# letter runs, digit runs, punctuation runs, whitespace)
BPE_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"


class TokenCounter:
    """n_tokens_ws (whitespace) + n_tokens_bpe (BPE-ish regex) per doc."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.pat = re.compile(BPE_PATTERN)
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t[self.text_col].to_pylist()
        ws = pc.list_value_length(
            pc.split_pattern_regex(pc.utf8_trim_whitespace(t[self.text_col]), r"\s+")
        )
        bpe = np.fromiter((len(self.pat.findall(x)) for x in texts), dtype=np.int64, count=len(texts))
        return pa.table({
            self.id_col: t[self.id_col],
            "n_tokens_ws": pc.cast(ws, pa.int64()),
            "n_tokens_bpe": pa.array(bpe),
        })


# ------------------------------------------------------ quality scoring --

STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been it this that for on with as at by from".split()
)


class QualityScorer:
    """Length / punctuation / digit / stopword / word-length heuristics.
    Emits raw components (SQL-checkable, exact ints) + a composite score.
    Score (frozen): 0.25*len_norm + 0.25*(1-digit_ratio) +
    0.25*(1-punct_ratio) + 0.25*stop_norm, rounded to 6."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.stop_set = pa.array(sorted(STOPWORDS))
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t[self.text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        # counts are vectorized RE2 kernels over the whole column (each
        # pattern matches exactly one char, so match count == char count)
        n_chars = pc.utf8_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
        n_space = pc.count_substring_regex(col, r"\s").to_numpy(zero_copy_only=False)
        n_nonspace = n_chars - n_space.astype(np.int64)
        n_digits = pc.count_substring_regex(col, r"[0-9]").to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_punct = pc.count_substring_regex(col, r"[^\sA-Za-z0-9]").to_numpy(
            zero_copy_only=False).astype(np.int64)
        # stopword ratio, fully vectorized: [A-Za-z]+ findall == the
        # non-empty segments of lowercase text split on [^a-z]+, so flatten
        # the split lists and segment-sum word/stopword masks by offsets
        words = pc.split_pattern_regex(pc.utf8_lower(col), "[^a-z]+")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.values  # raw child array: offsets index into it as-is
        offs = words.offsets.to_numpy().astype(np.int64)
        is_word = pc.greater(pc.utf8_length(flat), 0)
        is_stop = pc.and_(pc.is_in(flat, value_set=self.stop_set), is_word)
        cum_w = np.zeros(len(flat) + 1, np.int64)
        cum_s = np.zeros(len(flat) + 1, np.int64)
        np.cumsum(is_word.to_numpy(zero_copy_only=False).astype(np.int64), out=cum_w[1:])
        np.cumsum(is_stop.to_numpy(zero_copy_only=False).astype(np.int64), out=cum_s[1:])
        n_words = cum_w[offs[1:]] - cum_w[offs[:-1]]
        n_stop = cum_s[offs[1:]] - cum_s[offs[:-1]]
        stop_ratio = np.where(n_words > 0, n_stop / np.maximum(n_words, 1), 0.0)
        nz = np.maximum(n_nonspace, 1)
        len_norm = np.minimum(n_chars / 500.0, 1.0)
        score = (
            0.25 * len_norm
            + 0.25 * (1.0 - n_digits / nz)
            + 0.25 * (1.0 - n_punct / nz)
            + 0.25 * np.minimum(stop_ratio * 2.0, 1.0)
        )
        return pa.table({
            self.id_col: t[self.id_col],
            "n_chars": pa.array(n_chars),
            "n_nonspace": pa.array(n_nonspace),
            "n_digits": pa.array(n_digits),
            "n_punct": pa.array(n_punct),
            "quality_score": pa.array(np.round(score, 6)),
        })


# ---------------------------------------------------------- language id --

# Tiny embedded char-trigram profiles (top trigrams from public word
# frequency lists; deterministic, no external data at runtime).
_PROFILES = {
    "en": ["the", "ing", "and", "ion", "ent", "her", "for", "tha", "tio", "ere"],
    "de": ["der", "ein", "sch", "ich", "nde", "die", "che", "ung", "gen", "und"],
    "fr": ["les", "ent", "des", "que", "ion", "eur", "ait", "ans", "our", "ois"],
    "es": ["que", "ent", "ion", "los", "ado", "con", "res", "cio", "nte", "era"],
}


class LangId:
    """N-gram-overlap heuristic language ID with confidence score.

    Vectorized: one `pc.count_substring` kernel call per profile gram
    (40 calls per BATCH, each C over the whole column) instead of 40
    Python `str.count` calls per DOCUMENT."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.profiles = {
            lang: {g: 1.0 / (r + 1) for r, g in enumerate(grams)} for lang, grams in _PROFILES.items()
        }
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, t: pa.Table) -> pa.Table:
        col = pc.utf8_lower(t[self.text_col])
        n = len(col)
        lang_names = list(self.profiles)
        scores = np.zeros((len(lang_names), n))
        for li, lang in enumerate(lang_names):
            for g, w in self.profiles[lang].items():
                scores[li] += w * pc.count_substring(col, g).to_numpy(zero_copy_only=False)
        # str.count semantics == non-overlapping substring count == pc.count_substring
        best_i = scores.argmax(axis=0) if n else np.zeros(0, np.int64)
        best = scores[best_i, np.arange(n)] if n else np.zeros(0)
        langs = np.where(best > 0, np.asarray(lang_names, dtype=object)[best_i], "und")
        lens = pc.utf8_length(col).to_numpy(zero_copy_only=False).astype(np.float64)
        norm = best / np.maximum(1.0, lens / 10.0)
        out_scores = np.round(np.minimum(norm, 1.0), 6)
        return pa.table({
            self.id_col: t[self.id_col],
            "pred_lang": pa.array(langs.tolist(), type=pa.string()),
            "lang_score": pa.array(out_scores, type=pa.float64()),
        })


# --------------------------------------------------------- fingerprints --

def winnow_fingerprints(text: str, k: int = 8, w: int = 4) -> np.ndarray:
    """Winnowing (Schleimer et al. 2003): crc32 of each k-gram, min per
    sliding window of w hashes, deduplicated — a document sketch robust
    to local edits."""
    b = text.encode("utf-8")
    if len(b) < k:
        return np.array([zlib.crc32(b)], dtype=np.int64)
    hs = np.fromiter(
        (zlib.crc32(b[i : i + k]) for i in range(len(b) - k + 1)), dtype=np.int64
    )
    if len(hs) <= w:
        return np.unique(hs.min(keepdims=True))
    mins = pd.Series(hs).rolling(w).min().to_numpy()[w - 1 :]
    return np.unique(mins.astype(np.int64))


class Fingerprinter:
    def __init__(self, id_col: str = "doc_id", text_col: str = "text", k: int = 8, w: int = 4):
        self.id_col, self.text_col, self.k, self.w = id_col, text_col, k, w

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t[self.text_col].to_pylist()
        fps = [winnow_fingerprints(x, self.k, self.w) for x in texts]
        return pa.table({
            self.id_col: t[self.id_col],
            "n_fingerprints": pa.array([len(f) for f in fps], type=pa.int64()),
            "min_fingerprint": pa.array([int(f.min()) for f in fps], type=pa.int64()),
        })
