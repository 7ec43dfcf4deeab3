"""Text analysis for training-data curation: token counting, quality
scoring, language-ID, document fingerprinting.

All stages are map_batches transforms; the regex-based ones are callable
CLASSES (actor pools) so patterns compile once per worker, per the
stateful-stage rule. SQL-expressible components (counts, ratios) carry
DuckDB oracles; heuristics (langid score, winnowing fingerprints) are
pytest-oracled rows-only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from engine.ops.decontam import _kept_tokens

# ------------------------------------------------------ token counting --

# BPE-ish pre-tokenizer (GPT-2 style, ASCII approximation: contractions,
# letter runs, digit runs, punctuation runs, whitespace)
BPE_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"
# Count-equivalent form without the lookahead (RE2 has none). Dropping
# `\s+(?!\S)` mostly just moves a TOKEN BOUNDARY (trailing space glued to
# the next word vs. kept in the whitespace run), which leaves the match
# COUNT — all we emit — unchanged. The one case where the count does
# change: a >=2-char whitespace run ending in a non-space whitespace char
# directly before a word ("x\t\nmix") tokenizes as TWO whitespace tokens
# under the lookahead (run head, then the unjoinable last char) but ONE
# under plain `\s+`. Each such run matches `\s[\t\n\r\f]\S` exactly once,
# so the true count is count(BPE_COUNT_PATTERN) + count(BPE_COUNT_FIXUP).
# Parity vs. Python findall is pytest-oracled on real + adversarial text.
# Caveat: RE2's \s is ASCII-only while Python's is Unicode-aware, so
# counts can differ on exotic whitespace (U+00A0, \v); the parity
# contract covers common ASCII text.
BPE_COUNT_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"
BPE_COUNT_FIXUP = r"\s[\t\n\r\f]\S"


class TokenCounter:
    """n_tokens_ws (whitespace) + n_tokens_bpe (BPE-ish regex) per doc.
    Both counts are single vectorized RE2 kernels over the whole batch —
    no per-document findall loop."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t[self.text_col]
        ws = pc.list_value_length(
            pc.split_pattern_regex(pc.utf8_trim_whitespace(col), r"\s+")
        )
        bpe = pc.add(pc.count_substring_regex(col, BPE_COUNT_PATTERN),
                     pc.count_substring_regex(col, BPE_COUNT_FIXUP))
        return pa.table({
            self.id_col: t[self.id_col],
            "n_tokens_ws": pc.cast(ws, pa.int64()),
            "n_tokens_bpe": pc.cast(bpe, pa.int64()),
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
        # DuckDB-compatible ROUND (half AWAY from zero, not np.round's
        # half-even): x*1e6 can land exactly on a dyadic .5 (e.g. score
        # 0.7105625 -> 710562.5) where the two conventions diverge
        score = np.trunc(score * 1e6 + 0.5) / 1e6
        return pa.table({
            self.id_col: t[self.id_col],
            "n_chars": pa.array(n_chars),
            "n_nonspace": pa.array(n_nonspace),
            "n_digits": pa.array(n_digits),
            "n_punct": pa.array(n_punct),
            "quality_score": pa.array(score),
        })


class GopherFilter:
    """Gopher-rule quality gate (Rae et al. 2022, appendix A1 subset —
    the rules expressible over this corpus's flat token text): word-count
    bounds, mean-word-length bounds, minimum stopword ratio. Emits only
    SURVIVING docs plus the decision components, all computed with the
    same word semantics as QualityScorer ([a-z]+ over lowercased text),
    so the DuckDB oracle (list_filter/list_transform over
    string_split_regex) matches value-exactly. One vectorized pass per
    batch — split once, segment-sum word count / word chars / stop hits
    by list offsets; no per-doc loop."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text",
                 min_words: int = 40, max_words: int = 100_000,
                 min_mean_wl: float = 3.0, max_mean_wl: float = 10.0,
                 min_stop_ratio: float = 0.01):
        self.stop_set = pa.array(sorted(STOPWORDS))
        self.id_col, self.text_col = id_col, text_col
        self.min_words, self.max_words = min_words, max_words
        self.min_mean_wl, self.max_mean_wl = min_mean_wl, max_mean_wl
        self.min_stop_ratio = min_stop_ratio

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t[self.text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        words = pc.split_pattern_regex(pc.utf8_lower(col), "[^a-z]+")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.values
        offs = words.offsets.to_numpy().astype(np.int64)
        wl = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        is_word = wl > 0
        is_stop = pc.and_(pc.is_in(flat, value_set=self.stop_set),
                          pa.array(is_word)).to_numpy(zero_copy_only=False)

        def seg(x):
            cum = np.zeros(len(flat) + 1, np.int64)
            np.cumsum(x, out=cum[1:])
            return cum[offs[1:]] - cum[offs[:-1]]

        n_words = seg(is_word.astype(np.int64))
        n_stop = seg(is_stop.astype(np.int64))
        wchars = seg(wl)  # empty segments contribute 0 chars by definition
        nz = np.maximum(n_words, 1)
        mean_wl = wchars / nz
        stop_ratio = n_stop / nz
        keep = ((n_words >= self.min_words) & (n_words <= self.max_words)
                & (mean_wl >= self.min_mean_wl) & (mean_wl <= self.max_mean_wl)
                & (stop_ratio >= self.min_stop_ratio))
        m = pa.array(keep)
        return pa.table({
            self.id_col: col_take(t[self.id_col], m),
            "n_words": pa.array(n_words[keep]),
            "mean_word_len": pa.array(np.round(mean_wl[keep], 6)),
            "stop_ratio": pa.array(np.round(stop_ratio[keep], 6)),
        })


def col_take(col, mask: pa.Array):
    """filter a possibly-chunked column by a boolean mask."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.filter(mask)


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
        # half-away rounding (DuckDB ROUND semantics; see QualityScorer)
        out_scores = np.trunc(np.minimum(norm, 1.0) * 1e6 + 0.5) / 1e6
        return pa.table({
            self.id_col: t[self.id_col],
            "pred_lang": pa.array(langs.tolist(), type=pa.string()),
            "lang_score": pa.array(out_scores, type=pa.float64()),
        })


# ----------------------------------------------------- repetition stats --


class RepetitionStats:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1):
    duplicate-line mass and most-frequent-word-2-gram mass per document.

    All outputs are exact INTEGERS (fractions are left to the consumer)
    so the DuckDB oracle matches value-exactly with no float rounding:

      n_lines         non-empty lines ('\\n' split segments, len > 0)
      n_line_chars    total characters across those lines
      n_dup_lines     occurrences of any line value appearing >= 2x
      dup_line_chars  characters in those occurrences
      top2gram_chars  max over word-2-grams g of count(g) * len(g)
                      (counted with multiplicity; 0 with < 2 tokens)

    Vectorized: one split kernel per batch per axis, one SipHash C pass,
    one lexsort; per-doc sums/maxima via bincount / run reduction. Line
    and gram identity is by 64-bit hash (collision-negligible)."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col

    @staticmethod
    def _runs(h: np.ndarray, doc: np.ndarray):
        """Sort by (doc, h); return run starts, run sizes, sorted doc/idx."""
        order = np.lexsort((h, doc))
        d, v = doc[order], h[order]
        new = np.empty(d.size, bool)
        new[0] = True
        new[1:] = (d[1:] != d[:-1]) | (v[1:] != v[:-1])
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, d.size))
        return order, d, starts, sizes

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t[self.text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_large_string(col.type):
            col = col.cast(pa.string())
        n = len(col)
        zeros = lambda: np.zeros(n, np.int64)  # noqa: E731
        n_lines, n_line_chars, n_dup, dup_chars, top2 = (
            zeros(), zeros(), zeros(), zeros(), zeros())

        # ---- duplicate lines ----
        parts = pc.split_pattern(col, "\n")
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        poffs = parts.offsets.to_numpy().astype(np.int64)
        flat = parts.values.slice(poffs[0], poffs[-1] - poffs[0])
        poffs = poffs - poffs[0]
        lens_all = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = lens_all > 0
        doc_all = np.repeat(np.arange(n, dtype=np.int64), np.diff(poffs))
        ldoc, llen = doc_all[keep], lens_all[keep]
        if ldoc.size:
            lh = pd.util.hash_array(flat.filter(pa.array(keep)).to_numpy(zero_copy_only=False))
            order, d, starts, sizes = self._runs(lh, ldoc)
            rdoc, rlen = d[starts], llen[order][starts]
            n_lines = np.bincount(ldoc, minlength=n)
            n_line_chars = np.bincount(ldoc, weights=llen, minlength=n).astype(np.int64)
            dup = sizes >= 2
            n_dup = np.bincount(rdoc[dup], weights=sizes[dup], minlength=n).astype(np.int64)
            dup_chars = np.bincount(rdoc[dup], weights=(sizes * rlen)[dup],
                                    minlength=n).astype(np.int64)

        # ---- top word-2-gram mass ----
        toks, _toffs, tdoc = _kept_tokens(col)
        F = len(toks)
        if F >= 2:
            th = pd.util.hash_array(toks.to_numpy(zero_copy_only=False))
            tlen = pc.utf8_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
            valid = tdoc[:-1] == tdoc[1:]
            if valid.any():
                gh = (th[:-1] * np.uint64(1099511628211) + th[1:])[valid]
                glen = (tlen[:-1] + tlen[1:] + 1)[valid]
                gdoc = tdoc[:-1][valid]
                order, d, starts, sizes = self._runs(gh, gdoc)
                mass = sizes * glen[order][starts]
                rdoc = d[starts]
                doc_start = np.empty(rdoc.size, bool)
                doc_start[0] = True
                doc_start[1:] = rdoc[1:] != rdoc[:-1]
                top2[rdoc[doc_start]] = np.maximum.reduceat(
                    mass, np.flatnonzero(doc_start))

        return pa.table({
            self.id_col: t[self.id_col],
            "n_lines": pa.array(n_lines.astype(np.int64)),
            "n_line_chars": pa.array(n_line_chars),
            "n_dup_lines": pa.array(n_dup),
            "dup_line_chars": pa.array(dup_chars),
            "top2gram_chars": pa.array(top2),
        })


# --------------------------------------------------------- fingerprints --

# Rolling polynomial k-gram hash (Rabin-Karp style, FNV-prime base, mod
# 2^64, masked to 63 bits for int64 storage). Chosen over crc32 because
# the whole batch's hashes come out of k shifted multiply-adds over the
# raw utf-8 buffer — crc32 forced one Python call per BYTE per document.
_FP_BASE = np.uint64(1099511628211)
_FP_MASK = np.uint64(0x7FFFFFFFFFFFFFFF)


def _poly_kgram_hashes(b: np.ndarray, k: int) -> np.ndarray:
    """Hashes of every k-gram of a uint8 array (vectorized; len-k+1 out).
    In-place multiply-add: the naive `h = h*B + x` form reallocates two
    full-size temporaries per round and measured ~30x slower."""
    n = b.size - k + 1
    h = np.zeros(n, dtype=np.uint64)
    bu = b.astype(np.uint64)
    for j in range(k):
        np.multiply(h, _FP_BASE, out=h)
        np.add(h, bu[j : j + n], out=h)
    np.bitwise_and(h, _FP_MASK, out=h)
    return h


def _window_min(h: np.ndarray, w: int) -> np.ndarray:
    """Min over each sliding window of w hashes (w-1 vector mins)."""
    m = h[: h.size - w + 1].copy()
    for j in range(1, w):
        np.minimum(m, h[j : j + m.size], out=m)
    return m


def winnow_fingerprints(text: str, k: int = 8, w: int = 4) -> np.ndarray:
    """Winnowing (Schleimer et al. 2003): hash of each k-gram, min per
    sliding window of w hashes, deduplicated — a document sketch robust
    to local edits. Reference per-document form; `Fingerprinter` computes
    the identical values for a whole batch in one pass (parity-tested)."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if b.size < k:
        h = np.uint64(0)
        for v in b.astype(np.uint64):
            h = h * _FP_BASE + v
        return np.array([np.int64(h & _FP_MASK)], dtype=np.int64)
    hs = _poly_kgram_hashes(b, k)
    if hs.size <= w:
        return np.array([np.int64(hs.min())], dtype=np.int64)
    return np.unique(_window_min(hs, w).astype(np.int64))


class Fingerprinter:
    """Batch winnowing: ONE rolling-hash + windowed-min pass over the
    batch's concatenated utf-8 buffer (zero-copy from Arrow), per-doc
    results carved out by the string offsets — k-grams and windows never
    cross a document boundary because each doc's valid ranges are sliced
    from the global arrays. Per-doc output: number of distinct
    fingerprints + the minimum fingerprint."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text", k: int = 8, w: int = 4):
        self.id_col, self.text_col, self.k, self.w = id_col, text_col, k, w

    def __call__(self, t: pa.Table) -> pa.Table:
        k, w = self.k, self.w
        col = t[self.text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_large_string(col.type):
            col = col.cast(pa.string())
        n_docs = len(col)
        offs = np.frombuffer(col.buffers()[1], dtype=np.int32)[
            col.offset : col.offset + n_docs + 1].astype(np.int64)
        data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
        lens = np.diff(offs)

        vals_parts, docs_parts = [], []
        long = np.nonzero(lens >= k)[0]
        if long.size:
            hs = _poly_kgram_hashes(data, k) if data.size >= k else np.empty(0, np.uint64)
            # docs with more than w k-grams: winnowed window minima
            big = long[lens[long] - k + 1 > w]
            if big.size:
                mins = _window_min(hs, w)
                cnt = lens[big] - k - w + 2            # windows per doc
                tot = int(cnt.sum())
                # concatenated ranges: [offs[d], offs[d]+cnt[d]) for each d
                idx = np.repeat(offs[big], cnt) + (
                    np.arange(tot) - np.repeat(np.cumsum(cnt) - cnt, cnt))
                vals_parts.append(mins[idx].astype(np.int64))
                docs_parts.append(np.repeat(big, cnt))
            # docs with 1..w k-grams: single min over all their hashes
            small = long[lens[long] - k + 1 <= w]
            if small.size:
                cnt = lens[small] - k + 1
                seg = np.array([hs[o : o + c].min() for o, c in zip(offs[small], cnt)],
                               dtype=np.uint64)
                vals_parts.append(seg.astype(np.int64))
                docs_parts.append(small)
        tiny = np.nonzero(lens < k)[0]
        for d in tiny:  # rare: docs shorter than one k-gram
            h = np.uint64(0)
            for v in data[offs[d] : offs[d + 1]].astype(np.uint64):
                h = h * _FP_BASE + v
            vals_parts.append(np.array([np.int64(h & _FP_MASK)]))
            docs_parts.append(np.array([d], dtype=np.int64))

        if vals_parts:
            vals = np.concatenate(vals_parts)
            docs = np.concatenate(docs_parts)
            order = np.lexsort((vals, docs))
            vals, docs = vals[order], docs[order]
            new = np.concatenate([[True], (docs[1:] != docs[:-1]) | (vals[1:] != vals[:-1])])
            n_fp = np.bincount(docs[new], minlength=n_docs)
            doc_start = np.concatenate([[True], docs[1:] != docs[:-1]])
            min_fp = np.zeros(n_docs, dtype=np.int64)
            min_fp[docs[doc_start]] = vals[doc_start]
        else:
            n_fp = np.zeros(n_docs, dtype=np.int64)
            min_fp = np.zeros(n_docs, dtype=np.int64)
        return pa.table({
            self.id_col: t[self.id_col],
            "n_fingerprints": pa.array(n_fp.astype(np.int64)),
            "min_fingerprint": pa.array(min_fp),
        })


# ----------------------------------------------------- n-gram counting --

def _bigram_partial(t: pa.Table, text_col: str) -> pa.Table:
    """Per-batch partial bigram counts (combiner): tokenize lower-cased
    text on non-letter runs, join adjacent tokens with one vectorized
    binary_join_element_wise, np.unique-count — so the groupby that
    follows only moves (bigram, partial_count) rows, never token streams."""
    toks = pc.split_pattern_regex(pc.utf8_lower(t[text_col]), "[^a-z]+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    # .values ignores slicing: clamp to this batch's token range and
    # rebase the offsets so they index into `flat`
    flat = toks.values.slice(offs[0], offs[-1] - offs[0])
    offs = offs - offs[0]
    n_flat = len(flat)
    if n_flat < 2:
        return pa.table({"bigram": pa.array([], type=pa.string()),
                         "cnt": pa.array([], type=pa.int64())})
    # adjacency mask: pair (i, i+1) valid iff same doc and both non-empty
    lens = pc.binary_length(flat).to_numpy(zero_copy_only=False)
    same_doc = np.ones(n_flat - 1, dtype=bool)
    bnd = offs[1:-1] - 1  # last token of each doc pairs across docs
    same_doc[bnd[bnd >= 0]] = False
    ok = same_doc & (lens[:-1] > 0) & (lens[1:] > 0)
    idx = np.flatnonzero(ok)
    if idx.size == 0:
        return pa.table({"bigram": pa.array([], type=pa.string()),
                         "cnt": pa.array([], type=pa.int64())})
    lhs = flat.take(pa.array(idx))
    rhs = flat.take(pa.array(idx + 1))
    pairs = pc.binary_join_element_wise(lhs, rhs, " ")
    grams, counts = np.unique(pairs.to_numpy(zero_copy_only=False), return_counts=True)
    return pa.table({"bigram": pa.array(grams, type=pa.string()),
                     "cnt": pa.array(counts.astype(np.int64))})


def top_bigrams(ds, text_col: str = "text", k: int = 50):
    """Global top-k word bigrams by count, ties broken by bigram asc —
    partial counts inside map_batches, ONE small groupby-sum exchange,
    then a driver-side top-k over the (distinct-bigram-sized) result."""
    partial = ds.map_batches(lambda t: _bigram_partial(t, text_col),
                             batch_format="pyarrow", zero_copy_batch=True)
    total = partial.groupby("bigram").sum("cnt")

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["bigram", "cnt"])

    total = total.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)
    return total.sort(["cnt", "bigram"], descending=[True, False]).limit(k)


# ------------------------------------------------------------ tf-idf --

def _doc_term_codes(t: pa.Table, id_col: str, text_col: str):
    """Tokenize a batch and return per-(doc, term) distinct counts,
    fully vectorized: split on non-letter runs, per-batch
    dictionary-encode the token stream, collapse (doc_idx, code) pairs
    with one np.unique.  Returns (u_doc, u_code, tf, dictionary) or
    None for a token-free batch.  Rows come out sorted by (doc, code),
    so each document's terms are contiguous."""
    toks = pc.split_pattern_regex(pc.utf8_lower(t[text_col]), "[^a-z]+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = toks.values.slice(offs[0], offs[-1] - offs[0])
    offs = offs - offs[0]
    if len(flat) == 0:
        return None
    doc_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), np.diff(offs))
    keep = pc.binary_length(flat).to_numpy(zero_copy_only=False) > 0
    if not keep.any():
        return None
    enc = flat.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)[keep]
    doc_idx = doc_idx[keep]
    nd = len(enc.dictionary)
    ukey, tf = np.unique(doc_idx * nd + codes, return_counts=True)
    return ukey // nd, ukey % nd, tf.astype(np.int64), enc.dictionary


def _df_partial(t: pa.Table, text_col: str) -> pa.Table:
    """Per-batch partial document frequencies (combiner): the count of
    batch documents containing each term — so the vocab groupby that
    follows moves (term, partial_df) rows, never the token stream."""
    empty = pa.table({"term": pa.array([], type=pa.string()),
                      "df": pa.array([], type=pa.int64())})
    got = _doc_term_codes(t, "", text_col)
    if got is None:
        return empty
    _, u_code, _, dictionary = got
    codes, dfs = np.unique(u_code, return_counts=True)
    return pa.table({"term": dictionary.take(pa.array(codes)),
                     "df": pa.array(dfs.astype(np.int64))})


def tfidf_top_terms(ds, k: int = 5, id_col: str = "doc_id", text_col: str = "text",
                    n_docs: int | None = None, max_vocab: int = 20_000_000):
    """Per-document top-k terms by TF-IDF, 100-TB shape:

    - pass 1: map-side partial document frequencies + ONE vocab-sized
      groupby-sum -> the (term, df) map, broadcast once via ``ray.put``
      (for vocabularies beyond driver memory the alternative is a
      term-keyed join; at web scale a [a-z]+ vocabulary stays ~1e7).
    - pass 2: re-scan the corpus, score tf·ln((N+1)/(df+1)) per
      (doc, term), pick top-k inside the batch (documents never span
      batches) — no doc×term shuffle anywhere.

    The score is quantized to int64 ``floor(score·1e6)`` because numpy
    log and DuckDB ln differ in the final ulp (measured ~25% of values
    on this host); ranking and the hash-compared output use only exact
    integers.  Ties at equal score break by term ascending (code-point
    order == UTF-8 byte order, and terms are [a-z]+ anyway).
    Oracle: queries_ml._TFIDF_ORACLE (value-exact)."""
    import ray

    if n_docs is None:
        n_docs = ds.count()
    df_tbl = (ds.map_batches(lambda t: _df_partial(t, text_col),
                             batch_format="pyarrow", zero_copy_batch=True)
                .groupby("term").sum("df"))
    df_pd = df_tbl.to_pandas()
    if len(df_pd) > max_vocab:
        raise ValueError(
            f"vocabulary of {len(df_pd)} terms exceeds max_vocab={max_vocab} "
            f"for the driver-side broadcast; raise max_vocab or add a min-df "
            f"floor (rare terms score high but a df=1 long tail dominates "
            f"vocab size at corpus scale)")
    df_map = dict(zip(df_pd.iloc[:, 0], df_pd.iloc[:, 1].astype(np.int64)))
    ref = ray.put(df_map)
    logn = np.float64(n_docs) + 1.0

    out_schema = pa.schema([
        ("doc_id", pa.int64()), ("term", pa.string()), ("tf", pa.int64()),
        ("df", pa.int64()), ("score_q", pa.int64())])

    def score(t: pa.Table) -> pa.Table:
        got = _doc_term_codes(t, id_col, text_col)
        if got is None:
            return pa.table({f.name: pa.array([], type=f.type) for f in out_schema},
                            schema=out_schema)
        u_doc, u_code, tf, dictionary = got
        dfm = ray.get(ref)
        # df lookup + sort-rank once per UNIQUE term in the batch
        terms_py = dictionary.to_pylist()
        udf = np.array([dfm.get(term, 0) for term in terms_py], dtype=np.int64)
        term_rank = np.empty(len(terms_py), dtype=np.int64)
        term_rank[np.argsort(np.array(terms_py, dtype=object))] = np.arange(len(terms_py))
        dfv = udf[u_code]
        score_q = np.floor(tf * np.log(logn / (dfv + 1.0)) * 1e6).astype(np.int64)
        order = np.lexsort((term_rank[u_code], -score_q, u_doc))
        sd = u_doc[order]
        # rank within each contiguous doc run; keep rank < k
        starts = np.flatnonzero(np.r_[True, sd[1:] != sd[:-1]])
        rank = np.arange(sd.size) - np.repeat(starts, np.diff(np.r_[starts, sd.size]))
        sel = order[rank < k]
        doc_ids = t[id_col].combine_chunks().take(pa.array(u_doc[sel]))
        return pa.table({
            "doc_id": doc_ids, "term": dictionary.take(pa.array(u_code[sel])),
            "tf": pa.array(tf[sel]), "df": pa.array(dfv[sel]),
            "score_q": pa.array(score_q[sel])}, schema=out_schema)

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def _tf_rows(t: pa.Table, id_col: str, text_col: str) -> pa.Table:
    """(doc_id, term, tf) rows for a batch — the map-side input of the
    join-based tf-idf path."""
    empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                      "term": pa.array([], type=pa.string()),
                      "tf": pa.array([], type=pa.int64())})
    got = _doc_term_codes(t, id_col, text_col)
    if got is None:
        return empty
    u_doc, u_code, tf, dictionary = got
    return pa.table({
        "doc_id": t[id_col].combine_chunks().take(pa.array(u_doc)),
        "term": dictionary.take(pa.array(u_code)),
        "tf": pa.array(tf)})


def tfidf_top_terms_join(ds, k: int = 5, id_col: str = "doc_id",
                         text_col: str = "text", n_docs: int | None = None,
                         num_partitions: int | None = None):
    """Join-based tf-idf scale path for vocabularies too large to
    broadcast: (doc, term, tf) rows join the (term, df) aggregate on a
    term-keyed exchange, scores are computed map-side post-join, and the
    per-doc top-k finishes with the two-level ``grouped_topk`` (local
    in-batch top-k shrinks the doc-keyed exchange to ≤k rows per doc per
    block).  Two shuffles of the doc×term table vs the broadcast path's
    zero — use ``tfidf_top_terms`` until the vocab outgrows worker
    memory.  Output-identical to the broadcast path (parity-tested in
    tests/test_tfidf_split.py)."""
    from engine.ops.agg import grouped_topk
    from engine.ops.join import equi_join

    if n_docs is None:
        n_docs = ds.count()
    logn = np.float64(n_docs) + 1.0
    tf_rows = ds.map_batches(lambda t: _tf_rows(t, id_col, text_col),
                             batch_format="pyarrow", zero_copy_batch=True)
    df_tbl = (ds.map_batches(lambda t: _df_partial(t, text_col),
                             batch_format="pyarrow", zero_copy_batch=True)
                .groupby("term").sum("df")
                .map_batches(lambda t: t.rename_columns(["term", "df"]),
                             batch_format="pyarrow", zero_copy_batch=True))
    joined = equi_join(tf_rows, df_tbl, on="term",
                       num_partitions=num_partitions)

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("score_q", pa.array([], type=pa.int64()))
        tf = t["tf"].to_numpy(zero_copy_only=False)
        dfv = t["df"].to_numpy(zero_copy_only=False)
        sq = np.floor(tf * np.log(logn / (dfv + 1.0)) * 1e6).astype(np.int64)
        return t.append_column("score_q", pa.array(sq))

    scored = joined.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    out = grouped_topk(scored, id_col, "score_q", k, descending=True, tie_break="term")
    return out.select_columns(["doc_id", "term", "tf", "df", "score_q"])
