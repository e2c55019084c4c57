"""Text analysis operators: token counts, quality scoring, language ID,
document fingerprinting.

Reference analogues: free-text detection by word-count thresholds
(lib_profiler/datamart_profiler/profile_types.py:241-356), top-word
histograms (core.py:422-444 splitting on \\W+ + lowercase), sha1 content
keys (apiserver/profile.py:54-56). All per-batch vectorized; stateful
tables (stopword profiles) are built once per actor.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from auctus_ray.tokenize import tokenize_array

# minimal per-language stopword profiles for the n-gram/stopword heuristic
STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "fr": {"le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"},
    "es": {"el", "la", "los", "y", "de", "un", "una", "es", "que", "para"},
    "de": {"der", "die", "das", "und", "von", "ein", "eine", "ist", "zu", "mit"},
}


def token_stats_batch(batch: pa.Table, *, id_col: str = "doc_id",
                      text_col: str = "text") -> pa.Table:
    """Exact integer stats per doc: n_tokens (simple analyzer), n_chars,
    n_digits — SQL-oracle-expressible (regexp_extract_all counts)."""
    text = batch[text_col]
    toks = tokenize_array(text, "simple")
    n_tokens = pc.list_value_length(toks).cast(pa.int64())
    n_chars = pc.utf8_length(pc.fill_null(text, "")).cast(pa.int64())
    digits = pc.count_substring_regex(pc.fill_null(text, ""), pattern="[0-9]")
    return pa.table(
        {
            id_col: batch[id_col],
            "n_tokens": n_tokens,
            "n_chars": n_chars,
            "n_digits": digits.cast(pa.int64()),
        }
    )


class QualityScorer:
    """Actor-pool stage: quality metrics per doc (length / punctuation /
    stopword ratios — the usual pre-training quality filters).

    Integer counts are exact (SQL-comparable); `stop_cnt` counts tokens
    in the English stopword list.
    """

    def __init__(self, id_col: str = "doc_id", text_col: str = "text",
                 stop_lang: str = "en"):
        self.id_col = id_col
        self.text_col = text_col
        self.stops = sorted(STOPWORDS[stop_lang])

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch[self.text_col], "")
        toks = tokenize_array(text, "simple")
        n_tokens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = toks.flatten()
        is_stop = pc.is_in(flat, value_set=pa.array(self.stops))
        # per-doc stopword counts via offset segmentation
        offsets = toks.offsets.to_numpy(zero_copy_only=False)
        stop_np = is_stop.to_numpy(zero_copy_only=False).astype(np.int64)
        cum = np.concatenate([[0], np.cumsum(stop_np)])
        stop_cnt = cum[offsets[1:] - offsets[0]] - cum[offsets[:-1] - offsets[0]]
        n_punct = pc.count_substring_regex(text, pattern=r"[^\w\s]").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "n_tokens": pa.array(n_tokens),
                "n_chars": pa.array(n_chars),
                "stop_cnt": pa.array(stop_cnt),
                "punct_cnt": pa.array(n_punct),
            }
        )


class LangId:
    """Stopword-profile language identifier (n-gram-free heuristic):
    argmax over languages of stopword-hit ratio; 'und' when no evidence.
    Profiles compiled once per actor (reference T2 pattern)."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col = id_col
        self.text_col = text_col
        self.profiles = {lg: frozenset(ws) for lg, ws in STOPWORDS.items()}

    def predict(self, text: str) -> str:
        from auctus_ray.tokenize import tokenize_text

        toks = tokenize_text(text or "", "simple")
        if not toks:
            return "und"
        best, best_hits = "und", 0
        for lg in sorted(self.profiles):
            hits = sum(t in self.profiles[lg] for t in toks)
            if hits > best_hits:
                best, best_hits = lg, hits
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self.predict(t) for t in batch[self.text_col].to_pylist()]
        return pa.table(
            {self.id_col: batch[self.id_col], "lang_pred": pa.array(preds, pa.string())}
        )


def fingerprint_batch(batch: pa.Table, *, id_col: str = "doc_id",
                      text_col: str = "text", window: int = 8) -> pa.Table:
    """Winnowing-style document fingerprint: rolling blake2b over token
    windows, keep the minimum hash per doc plus the full-content sha256.
    Deterministic; rows-only oracle (not SQL-expressible)."""
    from auctus_ray.tokenize import tokenize_text

    ids = batch[id_col].to_pylist()
    texts = batch[text_col].to_pylist()
    mins, shas = [], []
    for t in texts:
        toks = tokenize_text(t or "", "simple")
        if len(toks) < window:
            grams = [" ".join(toks)] if toks else []
        else:
            grams = [" ".join(toks[i : i + window]) for i in range(len(toks) - window + 1)]
        hs = [
            int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(), "big") >> 1
            for g in grams
        ]
        mins.append(min(hs) if hs else 0)
        shas.append(hashlib.sha256((t or "").encode()).hexdigest())
    return pa.table(
        {
            id_col: pa.array(ids, pa.int64()),
            "fingerprint_min": pa.array(mins, pa.int64()),
            "content_sha256": pa.array(shas, pa.string()),
        }
    )
