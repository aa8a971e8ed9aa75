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


def quality_raw(batch: pa.Table, text_col: str = "text") -> np.ndarray:
    """Un-rounded quality score; every operation is a plain IEEE double op in
    a fixed order, so a SQL mirror of the same expression is bit-identical
    (the basis of the `quality_score` hash check)."""
    t = batch[text_col]
    n_tok = pc.count_substring_regex(t, pattern=TOKEN_PAT).to_numpy(zero_copy_only=False).astype(np.float64)
    n_chr = pc.utf8_length(t).to_numpy(zero_copy_only=False).astype(np.float64)
    n_pun = pc.count_substring_regex(t, pattern=PUNCT_PAT).to_numpy(zero_copy_only=False).astype(np.float64)
    n_dig = pc.count_substring_regex(t, pattern=DIGIT_PAT).to_numpy(zero_copy_only=False).astype(np.float64)
    mean_wl = np.where(n_tok > 0, (n_chr - np.maximum(n_tok - 1, 0)) / np.maximum(n_tok, 1), 0.0)
    len_score = np.clip(n_tok / 50.0, 0.0, 1.0) * np.clip((5000.0 - n_tok) / 5000.0, 0.0, 1.0)
    wl_score = np.clip(1.0 - np.abs(mean_wl - 5.0) / 5.0, 0.0, 1.0)
    noise = np.where(n_chr > 0, (n_pun + n_dig) / np.maximum(n_chr, 1), 1.0)
    return 0.4 * len_score + 0.3 * wl_score + 0.3 * np.clip(1.0 - 4.0 * noise, 0.0, 1.0)


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic quality score in [0,1]: favors mid-length docs with low
    punctuation/digit density and a healthy mean word length (C4-style filters)."""
    return batch.append_column(
        "quality", pa.array(np.round(quality_raw(batch, text_col), 6)))


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
    ratio; 'und' (undetermined) when no profile scores ≥ min_ratio.

    Fully vectorized: tokenization is one RE2 split over the batch, per-token
    profile membership is ``pc.is_in`` over the flattened token array, and
    per-doc hit counts come from ``np.bincount`` on the list parent indices —
    no per-row/per-token Python loop. Tie semantics match the scalar spec:
    profiles in sorted language order, first maximum wins."""

    def __init__(self, text_col: str = "text", min_ratio: float = 0.03,
                 emit_n_toks: bool = False):
        self.text_col = text_col
        self.min_ratio = min_ratio
        self.emit_n_toks = emit_n_toks  # integer token count (SQL-checkable)
        # complement split of the scalar tokenizer [a-zà-ÿäöüßñ']+ (same
        # codepoint-class semantics in RE2 and Python re)
        self.sep_pat = r"[^a-zà-ÿäöüßñ']+"
        profiles = sorted(_PROFILES.items())  # deterministic tie order
        self.langs = np.array([lang for lang, _ in profiles])
        self.sets = [pa.array(sorted(prof)) for _, prof in profiles]

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..core import limit_arrow_threads

        limit_arrow_threads(1)
        n = batch.num_rows
        if n == 0:
            out = batch.append_column("pred_lang", pa.array([], pa.string())) \
                       .append_column("lang_score", pa.array([], pa.float64()))
            if self.emit_n_toks:
                out = out.append_column("n_toks", pa.array([], pa.int64()))
            return out
        col = batch[self.text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lower = pc.utf8_lower(pc.fill_null(col, ""))
        toks = pc.split_pattern_regex(lower, pattern=self.sep_pat)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        nonempty = pc.not_equal(flat, "")
        mask = nonempty.to_numpy(zero_copy_only=False).astype(bool)
        par = parent[mask]
        flat_ne = flat.filter(nonempty)
        ntok = np.bincount(par, minlength=n).astype(np.float64)
        ratios = np.zeros((len(self.langs), n))
        for li, value_set in enumerate(self.sets):
            hits = pc.is_in(flat_ne, value_set=value_set).to_numpy(
                zero_copy_only=False).astype(np.float64)
            ratios[li] = np.bincount(par, weights=hits, minlength=n)
        ratios /= np.maximum(ntok, 1.0)
        best_idx = np.argmax(ratios, axis=0)  # first max == scalar strict-> loop
        best = ratios[best_idx, np.arange(n)]
        preds = np.where(best >= self.min_ratio, self.langs[best_idx], "und")
        out = batch.append_column(
            "pred_lang", pa.array(preds.tolist(), pa.string())
        ).append_column("lang_score", pa.array(np.round(best, 6), pa.float64()))
        if self.emit_n_toks:
            out = out.append_column(
                "n_toks", pa.array(ntok.astype(np.int64), pa.int64()))
        return out


def compression_ratio_batch(batch: pa.Table, text_col: str = "text",
                            level: int = 6) -> pa.Table:
    """Deflate-compressibility quality signal: ``ratio_ppm =
    1e6 · len(zlib(text)) / len(text)`` (int64; 0 for empty docs). Highly
    compressible text (low ratio) is boilerplate/repetitive machine junk —
    the cheap single-pass cousin of the Gopher repetition stats, used the
    same way as a pre-training filter. Per-row zlib is a C call on the blob
    (GIL-released), the same inherent per-blob cost class as the media codec;
    fixed ``level`` keeps the output deterministic across runs/machines."""
    import zlib

    ratios = []
    for text in batch[text_col].to_pylist():
        data = (text or "").encode("utf-8")
        if not data:
            ratios.append(0)
            continue
        comp = len(zlib.compress(data, level))
        ratios.append(int(comp * 1_000_000 // len(data)))
    return pa.table({c: batch[c] for c in batch.column_names
                     if c != text_col} | {
        "compress_ppm": pa.array(ratios, pa.int64())})


def _winnow_md5_grams(text: str | None, k: int, window: int) -> np.ndarray:
    """Winnowing-selected md5-low-64 character k-gram hashes of one doc,
    unique-sorted ascending (u64). Shared kernel of `fingerprint_grams_batch`
    and `fingerprint_digest_batch`; rules documented on the former."""
    t = text or ""
    n = len(t) - k + 1
    if n <= 0:
        return np.array([int.from_bytes(
            hashlib.md5(t.encode()).digest()[8:], "little")], np.uint64)
    hs = np.fromiter(
        (int.from_bytes(hashlib.md5(t[i:i + k].encode()).digest()[8:],
                        "little") for i in range(n)),
        np.uint64, count=n)
    if n >= window:
        win = np.lib.stride_tricks.sliding_window_view(hs, window)
        return np.unique(win.min(axis=1))
    return np.unique(hs)


def fingerprint_digest_batch(batch: pa.Table, text_col: str = "text",
                             k: int = 8, window: int = 4) -> pa.Table:
    """SQL-hash-checkable winnowing DIGEST: md5 hex of the comma-joined
    unsigned decimal values of the selected gram hashes in ascending order —
    one string per doc, computed in the same shuffle-free pass as the gram
    selection. DuckDB mirror: ``md5(string_agg(CAST(u AS VARCHAR), ','
    ORDER BY u))`` over the `fingerprint_grams` gram set viewed unsigned.
    The production sha256/rolling-hash digest stays `fingerprint_batch`."""
    out = []
    for text in batch[text_col].to_pylist():
        hs = _winnow_md5_grams(text, k, window)
        joined = ",".join(str(int(v)) for v in hs)
        out.append(hashlib.md5(joined.encode()).hexdigest())
    tbl = batch.drop_columns([text_col])
    return tbl.append_column("fingerprint", pa.array(out, pa.string()))


def fingerprint_grams_batch(batch: pa.Table, text_col: str = "text",
                            k: int = 8, window: int = 4) -> pa.Table:
    """SQL-mirrorable winnowing witness: the SELECTED k-gram hashes themselves
    (long (doc_id, gram) rows) instead of `fingerprint_batch`'s sha256 digest.
    Grams are CHARACTER k-grams hashed with md5-low-64 (= DuckDB
    ``md5_number_lower(substr(text, i, k))``, character-based on both
    engines), selection is the winnowing rule — distinct per-window minima
    over full windows; docs with 0 < n_grams < window keep all distinct gram
    hashes; docs shorter than k hash the whole text — so DuckDB reproduces
    the exact row set (SQL_FINGERPRINT_GRAMS). u64 hashes ship as int64
    bit-views."""
    doc_ids: list = []
    grams: list[np.ndarray] = []
    dids = batch["doc_id"].to_pylist()
    for did, text in zip(dids, batch[text_col].to_pylist()):
        hs = _winnow_md5_grams(text, k, window)
        doc_ids.extend([did] * len(hs))
        grams.append(hs)
    flat = (np.concatenate(grams) if grams
            else np.array([], np.uint64)).view(np.int64)
    return pa.table({"doc_id": pa.array(doc_ids, batch["doc_id"].type),
                     "gram": pa.array(flat)})


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
