"""Vectorized text-analysis kernels for the documents table.

All kernels operate on whole Arrow/pandas batches inside ``map_batches`` —
no per-row Python in the hot path except where hashing inherently iterates
(fingerprints), which is C-speed per row via hashlib.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

# explicit ASCII whitespace class: Python's Unicode \S and RE2's ASCII
# \S (DuckDB oracles) disagree on NBSP/U+2028 etc.; naming the set pins
# token boundaries identically on both engines for ANY input
_TOKEN_RE = re.compile(r"[^ \t\n\r\f\v]+")
# BPE-ish subword splitter: words, numbers, punctuation runs (ASCII digit
# classes so the DuckDB oracle regex is byte-identical)
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^ \t\n\r\f\vA-Za-z0-9]")

# tiny public stopword sets for the language-ID heuristic
_STOPWORDS = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "du", "que"},
    "es": {"el", "la", "los", "las", "es", "un", "una", "que", "de", "y"},
    "zh": set(),  # CJK handled by script detection
}


def token_count_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, lang, token_count) — whitespace tokens, vectorized."""
    text = batch.column("text").to_pandas().fillna("")
    counts = text.str.count(_TOKEN_RE).astype("int64")
    return pa.table({"doc_id": batch.column("doc_id"),
                     "lang": batch.column("lang"),
                     "token_count": pa.array(counts.to_numpy(), pa.int64())})


def bpe_token_count_batch(batch: pa.Table) -> pa.Table:
    text = batch.column("text").to_pandas().fillna("")
    counts = text.str.count(_BPE_RE).astype("int64")
    return pa.table({"doc_id": batch.column("doc_id"),
                     "bpe_token_count": pa.array(counts.to_numpy(), pa.int64())})


def quality_batch(batch: pa.Table) -> pa.Table:
    """Per-doc quality metrics (rounded for cross-engine comparability)."""
    text = batch.column("text").to_pandas().fillna("")
    length = text.str.len().astype("int64")
    denom = length.clip(lower=1).astype("float64")
    alpha = text.str.count(r"[a-zA-Z]").astype("float64")
    space = text.str.count(r" ").astype("float64")
    punct = text.str.count(r"[^ \t\n\r\f\vA-Za-z0-9]").astype("float64")
    # raw IEEE-754 ratios: a/b in float64 is bit-identical across engines,
    # while decimal rounding differs (banker's vs half-away)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "text_len": pa.array(length.to_numpy(), pa.int64()),
        "alpha_ratio": pa.array((alpha / denom).to_numpy(), pa.float64()),
        "space_ratio": pa.array((space / denom).to_numpy(), pa.float64()),
        "punct_ratio": pa.array((punct / denom).to_numpy(), pa.float64()),
    })


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, fp) — md5 content fingerprint (matches SQL md5())."""
    texts = batch.column("text").to_pylist()
    fps = [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts]
    return pa.table({"doc_id": batch.column("doc_id"),
                     "fp": pa.array(fps, pa.string())})


def rolling_fingerprint_batch(batch: pa.Table, window: int = 64) -> pa.Table:
    """Rolling-hash document fingerprint: min-sampled Rabin-style hashes of
    fixed windows — robust to local edits (used for near-dup prescreening)."""
    texts = batch.column("text").to_pylist()
    out = []
    for t in texts:
        data = (t or "").encode("utf-8")
        if len(data) <= window:
            out.append(hashlib.sha1(data).hexdigest()[:16])
            continue
        arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
        # polynomial rolling hash over all windows, vectorized via cumulative
        # products is overkill; stride-sample instead (every window//2)
        step = window // 2
        hashes = []
        for start in range(0, len(data) - window + 1, step):
            h = np.uint64(1469598103934665603)
            chunk = arr[start:start + window]
            for v in chunk[::8]:  # sparse sample within window
                h = np.uint64((int(h) ^ int(v)) * 1099511628211 & (2**64 - 1))
            hashes.append(int(h))
        out.append(f"{min(hashes):016x}")
    return pa.table({"doc_id": batch.column("doc_id"),
                     "rolling_fp": pa.array(out, pa.string())})


def langid_batch(batch: pa.Table) -> pa.Table:
    """Heuristic language ID: CJK script share + stopword votes."""
    texts = batch.column("text").to_pandas().fillna("")
    langs = []
    for t in texts:
        if t and sum(1 for ch in t[:200] if "一" <= ch <= "鿿") > 5:
            langs.append("zh")
            continue
        tokens = set(t.lower().split()[:200])
        best, best_score = "en", -1
        for lang, sw in _STOPWORDS.items():
            if not sw:
                continue
            score = len(tokens & sw)
            if score > best_score:
                best, best_score = lang, score
        langs.append(best)
    return pa.table({"doc_id": batch.column("doc_id"),
                     "lang_pred": pa.array(langs, pa.string()),
                     "lang_true": batch.column("lang")})
