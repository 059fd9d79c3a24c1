"""Deduplication kernels: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Designed for the 100 TB shape: signatures are computed embarrassingly
parallel in ``map_batches``; candidate generation is a *bucket* groupby
(band hash / simhash prefix), never an all-pairs product; only bucket-local
pairs are verified.  All hashing is seeded and deterministic.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

N_PERM = 64          # minhash permutations
BANDS = 16           # 16 bands x 4 rows
ROWS_PER_BAND = N_PERM // BANDS
SHINGLE_K = 3        # word shingles
_MERSENNE = (1 << 61) - 1


def _perm_params(n_perm: int = N_PERM, seed: int = 42):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=n_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=n_perm, dtype=np.int64).astype(np.uint64)
    return a, b


_PERM_A, _PERM_B = _perm_params()


def _shingles(text: str, k: int = SHINGLE_K) -> np.ndarray:
    toks = text.split()
    if len(toks) < k:
        toks = toks + [""] * (k - len(toks))
    hashes = np.fromiter(
        (int.from_bytes(
            hashlib.blake2b(" ".join(toks[i:i + k]).encode(), digest_size=8)
            .digest(), "big") & ((1 << 61) - 1)
         for i in range(max(1, len(toks) - k + 1))),
        dtype=np.uint64)
    return hashes


def minhash_signature(text: str) -> np.ndarray:
    sh = _shingles(text)
    # (a*x + b) mod p for all perms x all shingles, take min per perm
    x = sh[None, :].astype(np.uint64)
    vals = (_PERM_A[:, None] * x + _PERM_B[:, None]) % np.uint64(_MERSENNE)
    return vals.min(axis=1)


def minhash_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, sig: list<uint64-as-int64>)"""
    texts = batch.column("text").to_pylist()
    sigs = [minhash_signature(t or "").astype(np.int64).tolist()
            for t in texts]
    return pa.table({"doc_id": batch.column("doc_id"),
                     "sig": pa.array(sigs, pa.list_(pa.int64()))})


def band_explode_batch(batch: pa.Table) -> pa.Table:
    """(band, band_hash, doc_id, sig) — one row per band per doc."""
    doc_ids = batch.column("doc_id").to_pylist()
    sigs = batch.column("sig").to_pylist()
    out_band, out_hash, out_doc, out_sig = [], [], [], []
    for doc_id, sig in zip(doc_ids, sigs):
        arr = np.asarray(sig, dtype=np.int64)
        for band in range(BANDS):
            chunk = arr[band * ROWS_PER_BAND:(band + 1) * ROWS_PER_BAND]
            h = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
            out_band.append(band)
            out_hash.append(h)
            out_doc.append(doc_id)
            out_sig.append(sig)
    return pa.table({"band": pa.array(out_band, pa.int32()),
                     "band_hash": pa.array(out_hash, pa.string()),
                     "doc_id": pa.array(out_doc),
                     "sig": pa.array(out_sig, pa.list_(pa.int64()))})


def bucket_pairs_group(group: pa.Table, threshold: float = 0.5) -> pa.Table:
    """Within one (band, band_hash) bucket: verify candidate pairs by
    estimated Jaccard (signature agreement)."""
    doc_ids = group.column("doc_id").to_pylist()
    sigs = [np.asarray(s, dtype=np.int64)
            for s in group.column("sig").to_pylist()]
    a_out, b_out, j_out = [], [], []
    n = len(doc_ids)
    if n > 1:
        order = np.argsort(np.asarray(doc_ids, dtype=object))
        for ii in range(n):
            for jj in range(ii + 1, n):
                i, j = order[ii], order[jj]
                if doc_ids[i] == doc_ids[j]:
                    continue
                est = float(np.mean(sigs[i] == sigs[j]))
                if est >= threshold:
                    a_out.append(doc_ids[i])
                    b_out.append(doc_ids[j])
                    j_out.append(round(est, 6))
    id_type = group.column("doc_id").type
    return pa.table({"doc_a": pa.array(a_out, id_type),
                     "doc_b": pa.array(b_out, id_type),
                     "jaccard_est": pa.array(j_out, pa.float64())})


def simhash_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, simhash hex) — 64-bit simhash over tokens."""
    texts = batch.column("text").to_pylist()
    out = []
    for t in texts:
        toks = (t or "").split()
        if not toks:
            out.append("0" * 16)
            continue
        hs = np.fromiter(
            (int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8)
                            .digest(), "big") for tok in toks),
            dtype=np.uint64, count=len(toks))
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)).astype(np.int32)
        v = (bits * 2 - 1).sum(axis=0)
        sim = 0
        for bit in np.nonzero(v > 0)[0]:
            sim |= (1 << int(bit))
        out.append(f"{sim:016x}")
    return pa.table({"doc_id": batch.column("doc_id"),
                     "simhash": pa.array(out, pa.string())})


def ngram_set(text: str, k: int = SHINGLE_K) -> set:
    toks = text.split()
    return {" ".join(toks[i:i + k]) for i in range(max(1, len(toks) - k + 1))}


def exact_jaccard_pairs_group(group: pa.Table,
                              threshold: float = 0.4) -> pa.Table:
    """Within a candidate bucket, exact n-gram Jaccard verification."""
    doc_ids = group.column("doc_id").to_pylist()
    sets = [ngram_set(t or "") for t in group.column("text").to_pylist()]
    a_out, b_out, j_out = [], [], []
    n = len(doc_ids)
    order = sorted(range(n), key=lambda i: doc_ids[i])
    for ii in range(n):
        for jj in range(ii + 1, n):
            i, j = order[ii], order[jj]
            u = len(sets[i] | sets[j])
            jac = (len(sets[i] & sets[j]) / u) if u else 0.0
            if jac >= threshold:
                a_out.append(doc_ids[i])
                b_out.append(doc_ids[j])
                j_out.append(round(jac, 6))
    id_type = group.column("doc_id").type
    return pa.table({"doc_a": pa.array(a_out, id_type),
                     "doc_b": pa.array(b_out, id_type),
                     "jaccard": pa.array(j_out, pa.float64())})
