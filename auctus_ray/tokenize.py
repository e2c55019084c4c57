"""Code-aware tokenization, vectorized over Arrow string arrays.

Mirrors the reference analyzer semantics:
  * ES chain ``standard tokenizer -> lowercase`` for indexed text
    (coordinator/coordinator/elasticsearch.yml:2-31 in /root/reference)
  * Auctus's own identifier splitter ``expand_attribute_name``
    (lib_profiler/datamart_profiler/core.py:100-123): split on
    punctuation/whitespace, at digit<->alpha boundaries, and at
    lower->UPPER camelCase boundaries.

Two analyzers:
  * ``code``   — the full chain above (camelCase/digit sub-splitting), used
                 for the source-code corpus. Oracle and engine share this
                 exact function, so rank-identity is testable.
  * ``simple`` — lowercase + runs of [a-z0-9]; exactly expressible in
                 DuckDB as ``regexp_extract_all(lower(x), '[a-z0-9]+')``,
                 used for pipelines that are cross-checked by SQL oracles.

All functions are pure and deterministic. The Arrow implementations use
pyarrow.compute kernels only (no per-row Python in the hot path).
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

# lower|digit -> UPPER boundary; alpha -> digit; digit -> alpha
_RE_CAMEL = r"([a-z0-9])([A-Z])"
_RE_ALPHA_DIGIT = r"([A-Za-z])([0-9])"
_RE_DIGIT_ALPHA = r"([0-9])([A-Za-z])"
_SPLIT_PATTERN = r"[^a-z0-9]+"

ANALYZERS = ("code", "simple", "code_stem", "text_en")
# "code_stem" = code chain + Porter stemming; "text_en" = html_strip +
# lowercase + [a-z0-9]+ + Porter stemming — the reference's full ES
# index-time chain (elasticsearch.yml:2-31) for natural-language text.


def tokenize_array(arr: pa.Array | pa.ChunkedArray, analyzer: str = "code") -> pa.Array:
    """Tokenize a string array -> ListArray<string> of terms (vectorized).

    Null inputs are treated as empty strings (no tokens) — the reference
    coerces missing cells to '' (lib_profiler core.py:199, na_filter=False).
    """
    arr = pc.fill_null(arr, "")
    if analyzer in ("code", "code_stem"):
        x = pc.replace_substring_regex(arr, pattern=_RE_CAMEL, replacement=r"\1 \2")
        x = pc.replace_substring_regex(x, pattern=_RE_ALPHA_DIGIT, replacement=r"\1 \2")
        x = pc.replace_substring_regex(x, pattern=_RE_DIGIT_ALPHA, replacement=r"\1 \2")
    elif analyzer == "simple":
        x = arr
    elif analyzer == "text_en":
        # html_strip char filter (per-row Python; only for text corpora)
        from auctus_ray.functions.scalars import strip_html

        x = pa.array([strip_html(s) for s in arr.to_pylist()], pa.string())
    else:
        raise ValueError(f"unknown analyzer {analyzer!r}")
    x = pc.utf8_lower(x)
    toks = pc.split_pattern_regex(x, pattern=_SPLIT_PATTERN)
    # split leaves empty strings at the edges (e.g. leading separator);
    # drop them with a vectorized list filter: flatten -> mask -> rebuild.
    out = _drop_empty_tokens(toks)
    if analyzer in ("code_stem", "text_en"):
        out = stem_list_array(out)
    return out


def stem_list_array(list_arr: pa.Array) -> pa.Array:
    """Porter-stem a ListArray<string>: stem only the dictionary of unique
    tokens, then map back — amortizes the per-token Python cost."""
    from auctus_ray.functions.stemmer import porter_stem

    if isinstance(list_arr, pa.ChunkedArray):
        list_arr = list_arr.combine_chunks()
    flat = list_arr.flatten()
    if len(flat) == 0:
        return list_arr
    enc = flat.dictionary_encode()
    stemmed_dict = pa.array(
        [porter_stem(t) for t in enc.dictionary.to_pylist()], pa.string()
    )
    new_flat = stemmed_dict.take(enc.indices)
    # flatten() re-bases values to 0; a SLICED input's offsets don't
    # start at 0, so rebase them too (the _drop_empty_tokens discipline)
    offsets = pc.subtract(list_arr.offsets, list_arr.offsets[0])
    return pa.ListArray.from_arrays(offsets.cast(pa.int32()), new_flat)


def _drop_empty_tokens(list_arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    if isinstance(list_arr, pa.ChunkedArray):
        list_arr = list_arr.combine_chunks()
    flat = list_arr.flatten()
    keep = pc.not_equal(flat, "")
    # new offsets = prefix sum of kept counts per list
    import numpy as np

    offsets = list_arr.offsets.to_numpy(zero_copy_only=False)
    keep_np = keep.to_numpy(zero_copy_only=False)
    kept_cum = np.concatenate([[0], np.cumsum(keep_np)])
    new_offsets = kept_cum[offsets - offsets[0]].astype(np.int32)
    new_values = flat.filter(keep)
    return pa.ListArray.from_arrays(pa.array(new_offsets, type=pa.int32()), new_values)


def tokenize_text(text: str, analyzer: str = "code") -> list[str]:
    """Single-string tokenizer — same semantics as tokenize_array BY
    CONSTRUCTION: it delegates to the vectorized path on a 1-element
    array. A hand-written Python twin drifted on Unicode
    special-casing (str.lower() maps U+0130 to 'i'+combining-dot while
    Arrow's utf8_lower maps it to 'i'), splitting query tokenization
    away from index tokenization on such codepoints.

    Used by the query layer and the brute-force oracle so engine and
    oracle share one tokenization definition (SURVEY.md §7.2).
    """
    if text is None:
        return []
    out = tokenize_array(pa.array([text], pa.string()), analyzer)
    return out[0].as_py() if len(out) else []
