"""Deduplication kernels: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Designed for the 100 TB shape: signatures are computed embarrassingly
parallel in ``map_batches``; candidate generation is a *bucket* groupby
(band hash / simhash prefix), never an all-pairs product; only bucket-local
pairs are verified.  All hashing is seeded and deterministic.
"""

from __future__ import annotations

import hashlib
import logging

import numpy as np
import pandas as pd
import pyarrow as pa

# the ONE canonical ASCII whitespace tokenizer — shared with every
# other operator so the Python side and the DuckDB oracles can never
# desync on token boundaries (see functions/textops.py)
from .textops import _TOKEN_RE


def _tokens(text):
    return _TOKEN_RE.findall(text or "")


def drop_tokenless_batch(batch: pa.Table) -> pa.Table:
    """Filter out documents with zero tokens (empty/whitespace/null
    text).  The SQL oracles' toks CTEs yield no rows for such docs, so
    they have NO fingerprint in the oracle's world — keeping them would
    assign 0x0 and pair unrelated empty documents as near-duplicates."""
    t = batch.column("text").to_pandas().fillna("")
    keep = t.str.contains(_TOKEN_RE, regex=True).to_numpy()
    return batch.filter(pa.array(keep))

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


# odd 64-bit mix constants (splitmix64 / xxhash family, public domain)
_MIX = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                 0x165667B19E3779F9, 0x27D4EB2F165667C5,
                 0x85EBCA77C2B2AE63], dtype=np.uint64)
_MASK61 = np.uint64((1 << 61) - 1)


def _token_hashes(toks: list[str], cache: dict) -> np.ndarray:
    """64-bit token hashes; blake2b computed once per *unique* token
    (corpus vocabularies are tiny relative to token counts)."""
    out = np.empty(len(toks), dtype=np.uint64)
    get = cache.get
    for i, tok in enumerate(toks):
        h = get(tok)
        if h is None:
            h = int.from_bytes(
                hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big")
            cache[tok] = h
        out[i] = h
    return out


def _shingles(text: str, k: int = SHINGLE_K, cache: dict | None = None
              ) -> np.ndarray:
    """k-gram shingle hashes: per-token 64-bit hashes combined with a
    vectorized position-weighted mix (wraparound uint64 arithmetic) —
    no per-shingle digest calls in the hot loop."""
    toks = _tokens(text)
    if len(toks) < k:
        toks = toks + [""] * (k - len(toks))
    th = _token_hashes(toks, cache if cache is not None else {})
    n = max(1, len(toks) - k + 1)
    acc = th[0:n] * _MIX[0]
    for j in range(1, k):
        acc = acc + th[j:n + j] * _MIX[j % len(_MIX)]
    # finalizer so nearby mixes decorrelate, then fold into 61 bits
    acc = acc ^ (acc >> np.uint64(29))
    acc = acc * _MIX[4]
    return (acc ^ (acc >> np.uint64(32))) & _MASK61


def minhash_signature(text: str, cache: dict | None = None) -> np.ndarray:
    sh = _shingles(text, cache=cache)
    # (a*x + b) mod p for all perms x all shingles, take min per perm
    x = sh[None, :].astype(np.uint64)
    vals = (_PERM_A[:, None] * x + _PERM_B[:, None]) % np.uint64(_MERSENNE)
    return vals.min(axis=1)


def minhash_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, sig: list<uint64-as-int64>)"""
    texts = batch.column("text").to_pylist()
    cache: dict = {}   # token-hash cache shared across the batch
    sigs = [minhash_signature(t or "", cache).astype(np.int64).tolist()
            for t in texts]
    return pa.table({"doc_id": batch.column("doc_id"),
                     "sig": pa.array(sigs, pa.list_(pa.int64()))})


def band_explode_batch(batch: pa.Table) -> pa.Table:
    """(band, band_hash, doc_id, sig) — one row per band per doc.
    Band hashes are computed for the whole batch in one vectorized mix."""
    n = batch.num_rows
    if n == 0:
        return pa.table({"band": pa.array([], pa.int32()),
                         "band_hash": pa.array([], pa.int64()),
                         "part": pa.array([], pa.int32()),
                         "doc_id": pa.array([], batch.column("doc_id").type),
                         "sig": pa.array([], pa.list_(pa.int64()))})
    sigs = batch.column("sig").to_pylist()
    S = np.asarray(sigs, dtype=np.int64).astype(np.uint64)   # (n, N_PERM)
    S = S.reshape(n, BANDS, ROWS_PER_BAND)
    h = np.zeros((n, BANDS), dtype=np.uint64)
    for r in range(ROWS_PER_BAND):
        h = (h + S[:, :, r]) * _MIX[r % len(_MIX)]
    h = ((h ^ (h >> np.uint64(31)))
         & np.uint64((1 << 63) - 1)).astype(np.int64)   # non-negative
    band_idx = np.tile(np.arange(BANDS, dtype=np.int32), n)
    doc_idx = np.repeat(np.arange(n), BANDS)
    flat = h.reshape(-1)
    return pa.table({
        "band": pa.array(band_idx, pa.int32()),
        "band_hash": pa.array(flat, pa.int64()),
        "part": pa.array(flat % N_BUCKET_PARTS, pa.int32()),
        "doc_id": batch.column("doc_id").take(pa.array(doc_idx)),
        "sig": batch.column("sig").take(pa.array(doc_idx))})


N_BUCKET_PARTS = 64   # coarse hash partitions for bucket-local pair search


MAX_BUCKET = 1024     # hot-bucket cap for the pair-verify kernels
_LOG = logging.getLogger(__name__)


def _run_pairs(rows: np.ndarray, run_starts: np.ndarray,
               run_ends: np.ndarray, max_bucket: int, what: str
               ) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized candidate-pair expansion over lexsort runs (buckets):
    for each run emit all within-run row pairs (a before b in run
    order) via one triu_indices per multi-row run — no nested Python
    loops over rows.  A run larger than ``max_bucket`` (a stop-shingle /
    stop-band bucket: non-discriminative, O(b^2) candidates) degrades to
    a CHAIN of consecutive rows (O(b) pairs, keeps the bucket connected
    for component-style dedup) and logs what was dropped."""
    lens = run_ends - run_starts
    multi = np.flatnonzero(lens >= 2)
    a_parts: list = []
    b_parts: list = []
    for r in multi:
        s, e = int(run_starts[r]), int(run_ends[r])
        bsz = e - s
        if bsz > max_bucket:
            _LOG.warning(
                "hot %s bucket: %d rows > cap %d — degrading to chain "
                "pairs (%d instead of %d candidates)", what, bsz,
                max_bucket, bsz - 1, bsz * (bsz - 1) // 2)
            a_parts.append(rows[s:e - 1])
            b_parts.append(rows[s + 1:e])
        else:
            x, y = np.triu_indices(bsz, 1)
            a_parts.append(rows[s + x])
            b_parts.append(rows[s + y])
    if not a_parts:
        z = np.empty(0, dtype=rows.dtype)
        return z, z
    return np.concatenate(a_parts), np.concatenate(b_parts)


def _dedup_pairs(a_rows: np.ndarray, b_rows: np.ndarray, doc_ids
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Drop same-doc pairs and cross-bucket duplicates (C-level)."""
    da, db = doc_ids[a_rows], doc_ids[b_rows]
    keep = da != db
    a_rows, b_rows = a_rows[keep], b_rows[keep]
    dup = pd.DataFrame({"a": doc_ids[a_rows],
                        "b": doc_ids[b_rows]}).duplicated().to_numpy()
    return a_rows[~dup], b_rows[~dup]


def bucket_pairs_partition(group: pa.Table, threshold: float = 0.5,
                           max_bucket: int = MAX_BUCKET) -> pa.Table:
    """One coarse partition of LSH buckets (all rows whose band_hash maps
    to this partition).  Buckets are recovered as *runs* of a vectorized
    lexsort; candidate pairs expand via triu_indices per run; signature
    agreement is verified for ALL candidates in one matrix comparison —
    no per-pair Python.  Hot buckets degrade to chains (see _run_pairs)."""
    n = group.num_rows
    id_type = group.column("doc_id").type
    empty = pa.table({"doc_a": pa.array([], id_type),
                      "doc_b": pa.array([], id_type),
                      "jaccard_est": pa.array([], pa.float64())})
    if n < 2:
        return empty
    bands = np.asarray(group.column("band"), dtype=np.int64)
    hashes = np.asarray(group.column("band_hash"), dtype=np.int64)
    doc_ids = group.column("doc_id").to_pandas().to_numpy()
    order = np.lexsort((doc_ids, bands, hashes))
    bs, hs = bands[order], hashes[order]
    run_starts = np.flatnonzero(
        np.concatenate(([True], (bs[1:] != bs[:-1]) | (hs[1:] != hs[:-1]))))
    run_ends = np.concatenate((run_starts[1:], [n]))
    a_rows, b_rows = _run_pairs(order, run_starts, run_ends,
                                max_bucket, "minhash band")
    if len(a_rows) == 0:
        return empty
    a_rows, b_rows = _dedup_pairs(a_rows, b_rows, doc_ids)
    if len(a_rows) == 0:
        return empty
    sig_list = group.column("sig").combine_chunks()
    flat = np.asarray(sig_list.flatten(), dtype=np.int64)
    S = flat.reshape(n, flat.size // n)
    est = np.round((S[a_rows] == S[b_rows]).mean(axis=1), 6)
    good = est >= threshold
    return pa.table({
        "doc_a": pa.array(doc_ids[a_rows[good]], id_type),
        "doc_b": pa.array(doc_ids[b_rows[good]], id_type),
        "jaccard_est": pa.array(est[good], pa.float64())})


def simhash_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, simhash hex) — 64-bit simhash over tokens.

    Token hash = first 8 bytes of md5 so the DuckDB oracle can reproduce
    it bit-for-bit (('0x'||substr(md5(tok),1,16))::UBIGINT).  Fully
    batch-vectorized: one flat (token, doc_idx) pass, md5 once per
    UNIQUE token, per-doc bit votes via a segmented add — no per-doc
    Python loop."""
    n_docs = batch.num_rows
    texts = batch.column("text").to_pylist()
    toks_per_doc = [_tokens(t) for t in texts]
    lens = np.fromiter((len(t) for t in toks_per_doc), np.int64, n_docs)
    flat = [tok for toks in toks_per_doc for tok in toks]
    if not flat:
        return pa.table({"doc_id": batch.column("doc_id"),
                         "simhash": pa.array(["0" * 16] * n_docs,
                                             pa.string())})
    doc_idx = np.repeat(np.arange(n_docs), lens)
    uniq, inv = np.unique(np.asarray(flat, dtype=object),
                          return_inverse=True)
    uh = np.fromiter(
        (int.from_bytes(hashlib.md5(u.encode()).digest()[:8], "big")
         for u in uniq), dtype=np.uint64, count=len(uniq))
    hs = uh[inv]
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int32) * 2 - 1
    votes = np.zeros((n_docs, 64), dtype=np.int64)
    np.add.at(votes, doc_idx, bits)
    sim = ((votes > 0).astype(np.uint64)
           << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1,
                                                           dtype=np.uint64)
    sim[lens == 0] = np.uint64(0)
    out = [f"{int(v):016x}" for v in sim]
    return pa.table({"doc_id": batch.column("doc_id"),
                     "simhash": pa.array(out, pa.string())})


SIMHASH_BANDS = 4            # 4 x 16-bit bands
_SIMHASH_MAX_DIST = 3        # pigeonhole: <=3 flipped bits leave >=1
                             # of the 4 bands intact -> complete recall
_POPCNT8 = np.array([bin(i).count("1") for i in range(256)],
                    dtype=np.uint8)


def _hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit Hamming distance via a per-byte popcount LUT
    (numpy 1.x has no bitwise_count).  int64 views are fine: XOR is
    bit-identical regardless of sign interpretation."""
    x = (a.astype(np.uint64) ^ b.astype(np.uint64))
    by = np.frombuffer(x.tobytes(), dtype=np.uint8).reshape(-1, 8)
    return _POPCNT8[by].sum(axis=1).astype(np.int64)


def simhash_band_explode(batch: pa.Table) -> pa.Table:
    """(band, band_val, part, doc_id, sim64) — one row per 16-bit band
    per doc.  Two fingerprints within Hamming distance ``_SIMHASH_MAX_
    DIST`` of each other collide in at least one band bucket, so the
    bucket-local verify below has complete recall (same guarantee
    structure as MinHash banding, but deterministic)."""
    n = batch.num_rows
    id_type = batch.column("doc_id").type
    if n == 0:
        return pa.table({"band": pa.array([], pa.int32()),
                         "band_val": pa.array([], pa.int64()),
                         "part": pa.array([], pa.int32()),
                         "doc_id": pa.array([], id_type),
                         "sim64": pa.array([], pa.int64())})
    h = np.array([int(x, 16) for x in
                  batch.column("simhash").to_pylist()], dtype=np.uint64)
    band_idx = np.tile(np.arange(SIMHASH_BANDS, dtype=np.int64), n)
    doc_idx = np.repeat(np.arange(n), SIMHASH_BANDS)
    hh = np.repeat(h, SIMHASH_BANDS)
    band_val = ((hh >> (band_idx.astype(np.uint64) * np.uint64(16)))
                & np.uint64(0xFFFF)).astype(np.int64)
    bucket = band_idx * 65536 + band_val
    return pa.table({
        "band": pa.array(band_idx.astype(np.int32), pa.int32()),
        "band_val": pa.array(band_val, pa.int64()),
        "part": pa.array((bucket % N_BUCKET_PARTS).astype(np.int32),
                         pa.int32()),
        "doc_id": batch.column("doc_id").take(pa.array(doc_idx)),
        "sim64": pa.array(hh.astype(np.int64), pa.int64())})


def simhash_pairs_partition(group: pa.Table,
                            max_dist: int = _SIMHASH_MAX_DIST,
                            max_bucket: int = MAX_BUCKET) -> pa.Table:
    """One coarse partition of simhash band buckets -> verified
    near-dup pairs (exact 64-bit Hamming <= max_dist).  Same run-lexsort
    + triu candidate expansion as the MinHash path; the within-run
    doc_id sort makes doc_a < doc_b canonical."""
    n = group.num_rows
    id_type = group.column("doc_id").type
    empty = pa.table({"doc_a": pa.array([], id_type),
                      "doc_b": pa.array([], id_type),
                      "hamming": pa.array([], pa.int64())})
    if n < 2:
        return empty
    bands = np.asarray(group.column("band"), dtype=np.int64)
    vals = np.asarray(group.column("band_val"), dtype=np.int64)
    doc_ids = group.column("doc_id").to_pandas().to_numpy()
    order = np.lexsort((doc_ids, bands, vals))
    bs, vs = bands[order], vals[order]
    run_starts = np.flatnonzero(
        np.concatenate(([True], (bs[1:] != bs[:-1]) | (vs[1:] != vs[:-1]))))
    run_ends = np.concatenate((run_starts[1:], [n]))
    a_rows, b_rows = _run_pairs(order, run_starts, run_ends,
                                max_bucket, "simhash band")
    if len(a_rows) == 0:
        return empty
    a_rows, b_rows = _dedup_pairs(a_rows, b_rows, doc_ids)
    if len(a_rows) == 0:
        return empty
    sim = np.asarray(group.column("sim64"), dtype=np.int64)
    ham = _hamming64(sim[a_rows], sim[b_rows])
    good = ham <= max_dist
    return pa.table({
        "doc_a": pa.array(doc_ids[a_rows[good]], id_type),
        "doc_b": pa.array(doc_ids[b_rows[good]], id_type),
        "hamming": pa.array(ham[good], pa.int64())})


def shingles_flat(texts: list, cache: dict, k: int = SHINGLE_K
                  ) -> tuple[np.ndarray, np.ndarray]:
    """All k-gram shingle hashes for a BATCH of texts in one vectorized
    pass: returns flat ``(doc_idx, shingle_hash)`` arrays with shingles
    that would cross a document boundary masked out (a doc with < k
    tokens contributes nothing, matching the string-shingle semantics).
    Same mix/finalizer as ``_shingles`` so hashes are comparable across
    callers; 61-bit, collisions negligible at corpus scale."""
    import itertools
    toks = [_tokens(t) for t in texts]
    lens = np.fromiter((len(x) for x in toks), dtype=np.int64,
                       count=len(toks))
    flat = list(itertools.chain.from_iterable(toks))
    n = len(flat)
    if n < k:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    th = _token_hashes(flat, cache)
    m = n - k + 1
    acc = th[0:m] * _MIX[0]
    for j in range(1, k):
        acc = acc + th[j:m + j] * _MIX[j % len(_MIX)]
    acc = acc ^ (acc >> np.uint64(29))
    acc = acc * _MIX[4]
    sh = (acc ^ (acc >> np.uint64(32))) & _MASK61
    doc_of = np.repeat(np.arange(len(toks), dtype=np.int64), lens)
    valid = doc_of[0:m] == doc_of[k - 1:n]
    return doc_of[0:m][valid], sh[valid]


def ngram_set(text: str, k: int = SHINGLE_K) -> set:
    toks = _tokens(text)
    return {" ".join(toks[i:i + k]) for i in range(max(1, len(toks) - k + 1))}


N_PREFIX_PARTS = 16   # prefix-join partitions; scale with cluster width


def shingle_prefix_explode(batch: pa.Table, threshold: float = 0.4,
                           n_parts: int = N_PREFIX_PARTS) -> pa.Table:
    """Prefix-filtering explode for the exact set-similarity join
    (SSJoin/PPJoin principle): shingle sets sorted in a global order
    (ascending hash); any pair with Jaccard >= t must share an element
    within each set's first ``|S| - ceil(t*|S|) + 1`` shingles, so
    bucketing by prefix shingle has *provably complete* recall — unlike a
    single min-shingle bucket.

    Payload discipline: ONE row per (partition, doc) — a doc's prefix
    shingles are grouped by their hash partition and shipped together
    with a single copy of the full set, so the shuffled bytes scale with
    ``#distinct partitions hit`` (~n_parts) instead of prefix length
    (~0.6|S|).  Skew note: frequency-ordered prefixes (rarest first)
    would shrink hot buckets further; hash order keeps it one-pass."""
    import math
    doc_ids_col = batch.column("doc_id")
    texts = batch.column("text").to_pylist()
    cache: dict = {}
    out_part, out_doc_idx, out_sets, out_prefix = [], [], [], []
    for i, t in enumerate(texts):
        sh = np.unique(_shingles(t or "", cache=cache))  # sorted distinct
        p = len(sh) - math.ceil(threshold * len(sh)) + 1
        p = max(1, min(p, len(sh)))
        prefix = sh[:p]
        sh_list = sh.astype(np.int64).tolist()
        parts = prefix % np.uint64(n_parts)
        for part in np.unique(parts):
            out_part.append(int(part))
            out_doc_idx.append(i)
            out_sets.append(sh_list)
            out_prefix.append(prefix[parts == part].astype(np.int64)
                              .tolist())
    idx = pa.array(out_doc_idx, pa.int32())
    return pa.table({
        "part": pa.array(out_part, pa.int32()),
        "doc_id": doc_ids_col.take(idx),
        "prefix": pa.array(out_prefix, pa.list_(pa.int64())),
        "sh": pa.array(out_sets, pa.list_(pa.int64()))})


def prefix_pairs_partition(group: pa.Table, threshold: float = 0.4,
                           max_bucket: int = MAX_BUCKET) -> pa.Table:
    """One prefix-join partition: rows are (doc, prefix shingles in this
    partition, full set).  Candidate generation is fully vectorized:
    explode prefixes C-level, lexsort by (shingle, doc_id), expand each
    shingle-run's pairs via triu_indices (hot stop-shingle runs degrade
    to chains, see _run_pairs), dedup pairs C-level; only the exact
    Jaccard verify touches Python — one numpy intersect per *surviving
    candidate* (prefix filtering bounds these), never O(bucket^2)."""
    n = group.num_rows
    id_type = group.column("doc_id").type
    empty = pa.table({"doc_a": pa.array([], id_type),
                      "doc_b": pa.array([], id_type),
                      "jaccard": pa.array([], pa.float64())})
    if n < 2:
        return empty
    doc_ids = group.column("doc_id").to_pandas().to_numpy()
    pl = group.column("prefix").combine_chunks()
    pflat = np.asarray(pl.flatten(), dtype=np.int64)
    plens = np.asarray(pl.value_lengths(), dtype=np.int64)
    row_of = np.repeat(np.arange(n, dtype=np.int64), plens)
    order = np.lexsort((doc_ids[row_of], pflat))
    sflat, srow = pflat[order], row_of[order]
    m = len(sflat)
    run_starts = np.flatnonzero(
        np.concatenate(([True], sflat[1:] != sflat[:-1])))
    run_ends = np.concatenate((run_starts[1:], [m]))
    a_rows, b_rows = _run_pairs(srow, run_starts, run_ends,
                                max_bucket, "prefix shingle")
    if len(a_rows) == 0:
        return empty
    a_rows, b_rows = _dedup_pairs(a_rows, b_rows, doc_ids)
    sh_list = group.column("sh").combine_chunks()
    sh_flat = np.asarray(sh_list.flatten(), dtype=np.int64)
    offs = np.concatenate(
        ([0], np.cumsum(np.asarray(sh_list.value_lengths(),
                                   dtype=np.int64))))
    a_out, b_out, j_out = [], [], []
    for i, j in zip(a_rows.tolist(), b_rows.tolist()):
        si = sh_flat[offs[i]:offs[i + 1]]
        sj = sh_flat[offs[j]:offs[j + 1]]
        inter = np.intersect1d(si, sj, assume_unique=True).size
        u = si.size + sj.size - inter
        jac = inter / u if u else 0.0
        if jac >= threshold:
            a_out.append(doc_ids[i])
            b_out.append(doc_ids[j])
            j_out.append(round(jac, 6))
    return pa.table({"doc_a": pa.array(a_out, id_type),
                     "doc_b": pa.array(b_out, id_type),
                     "jaccard": pa.array(j_out, pa.float64())})
