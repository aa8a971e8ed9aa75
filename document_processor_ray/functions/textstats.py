"""Text-analysis operators over a flat document table (doc_id, text, ...).

Large-scale training-data pipeline primitives: token counting, character-class
stats, quality scoring, language ID (n-gram/stopword heuristic — the pure-data
analog of the reference's EasyOCR lang pack fr/de/es/en,
``app/services/dl_converter.py:26``), and winnowing document fingerprints.

All stages are stateless vectorized ``map_batches`` transforms except LangId,
which is a callable class (compiled profiles once per actor).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# token = maximal run of non-whitespace; matches the oracle SQL
#   array_length(regexp_split_to_array(trim(text), '[ \t\n\r\f]+'))
TOKEN_PAT = r"[^ \t\n\r\f]+"
PUNCT_PAT = r"[!-/:-@\[-`{-~]"  # ASCII punctuation, RE2-literal class
DIGIT_PAT = r"[0-9]"
UPPER_PAT = r"[A-Z]"


def text_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append n_tokens / n_chars_seen / n_punct / n_digit / n_upper columns.
    Pure pyarrow.compute; every column SQL-replicable for the correctness gate."""
    t = batch[text_col]
    batch = batch.append_column("n_tokens", pc.cast(
        pc.count_substring_regex(t, pattern=TOKEN_PAT), pa.int64()))
    batch = batch.append_column("n_chars_seen", pc.cast(pc.utf8_length(t), pa.int64()))
    for name, pat in (("n_punct", PUNCT_PAT), ("n_digit", DIGIT_PAT),
                      ("n_upper", UPPER_PAT)):
        batch = batch.append_column(name, pc.cast(
            pc.count_substring_regex(t, pattern=pat), pa.int64()))
    return batch


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic quality score in [0,1]: favors mid-length docs with low
    punctuation/digit density and a healthy mean word length (C4-style filters)."""
    t = batch[text_col]
    n_tok = pc.count_substring_regex(t, pattern=TOKEN_PAT).to_numpy(zero_copy_only=False).astype(np.float64)
    n_chr = pc.utf8_length(t).to_numpy(zero_copy_only=False).astype(np.float64)
    n_pun = pc.count_substring_regex(t, pattern=PUNCT_PAT).to_numpy(zero_copy_only=False).astype(np.float64)
    n_dig = pc.count_substring_regex(t, pattern=DIGIT_PAT).to_numpy(zero_copy_only=False).astype(np.float64)
    mean_wl = np.where(n_tok > 0, (n_chr - np.maximum(n_tok - 1, 0)) / np.maximum(n_tok, 1), 0.0)
    len_score = np.clip(n_tok / 50.0, 0.0, 1.0) * np.clip((5000.0 - n_tok) / 5000.0, 0.0, 1.0)
    wl_score = np.clip(1.0 - np.abs(mean_wl - 5.0) / 5.0, 0.0, 1.0)
    noise = np.where(n_chr > 0, (n_pun + n_dig) / np.maximum(n_chr, 1), 1.0)
    score = 0.4 * len_score + 0.3 * wl_score + 0.3 * np.clip(1.0 - 4.0 * noise, 0.0, 1.0)
    return batch.append_column("quality", pa.array(np.round(score, 6)))


# Stopword profiles for the langid heuristic (public common-word lists).
_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for", "was",
           "on", "are", "with", "as", "his", "they", "at", "be", "this"},
    "fr": {"le", "la", "les", "de", "des", "et", "un", "une", "du", "est", "en",
           "que", "qui", "dans", "pour", "sur", "pas", "au", "avec", "être"},
    "de": {"der", "die", "das", "und", "ist", "von", "den", "im", "für", "mit",
           "nicht", "ein", "eine", "auf", "als", "auch", "sich", "des", "zu", "dem"},
    "es": {"el", "la", "los", "las", "de", "y", "que", "en", "un", "una", "es",
           "del", "por", "con", "para", "no", "su", "al", "lo", "se"},
}


class LangId:
    """Actor-pool language-ID stage: profiles compiled once per actor
    (``map_batches(LangId, concurrency=N)``). Prediction = argmax stopword-hit
    ratio; 'und' (undetermined) when no profile scores ≥ min_ratio."""

    def __init__(self, text_col: str = "text", min_ratio: float = 0.03):
        self.text_col = text_col
        self.min_ratio = min_ratio
        self.word_re = re.compile(r"[a-zà-ÿäöüßñ']+")
        self.profiles = sorted(_PROFILES.items())  # deterministic tie order

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds, scores = [], []
        for text in batch[self.text_col].to_pylist():
            toks = self.word_re.findall((text or "").lower())
            if not toks:
                preds.append("und")
                scores.append(0.0)
                continue
            best_lang, best = "und", 0.0
            for lang, prof in self.profiles:
                r = sum(1 for w in toks if w in prof) / len(toks)
                if r > best:
                    best_lang, best = lang, r
            if best < self.min_ratio:
                best_lang = "und"
            preds.append(best_lang)
            scores.append(round(best, 6))
        return batch.append_column("pred_lang", pa.array(preds, pa.string())) \
                    .append_column("lang_score", pa.array(scores, pa.float64()))


def fingerprint_batch(batch: pa.Table, text_col: str = "text", k: int = 8,
                      window: int = 4) -> pa.Table:
    """Winnowing fingerprint (Schleimer et al., SIGMOD'03): k-gram rolling hashes,
    per-window minima, sha256 over the selected hash set → 16-hex digest."""
    out = []
    for text in batch[text_col].to_pylist():
        data = (text or "").encode("utf-8")
        if len(data) < k:
            out.append(hashlib.sha256(data).hexdigest()[:16])
            continue
        arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
        # polynomial rolling hash over all k-grams, vectorized
        h = np.zeros(len(arr) - k + 1, dtype=np.uint64)
        for i in range(k):
            h = h * np.uint64(257) + arr[i : len(arr) - k + 1 + i]
        if len(h) >= window:
            win = np.lib.stride_tricks.sliding_window_view(h, window)
            sel = np.unique(win.min(axis=1))
        else:
            sel = np.unique(h)
        out.append(hashlib.sha256(sel.tobytes()).hexdigest()[:16])
    return batch.append_column("fingerprint", pa.array(out, pa.string()))
