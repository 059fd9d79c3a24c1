"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — the query matrix is broadcast once via
``ray.put`` and every ``map_batches`` task computes a vectorized partial
top-k against its batch (numpy matmul); partials are merged in a final
small groupby.  Scale path: IVF — deterministic k-means coarse quantizer,
bucket assignment as a batch transform, probe-limited exact search.

Similarities are rounded to 6 decimals *before* ranking so ranking is
reproducible across engines (ties broken by neighbor id).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _matrix(batch_col) -> np.ndarray:
    arr = batch_col.to_pylist()
    return np.asarray(arr, dtype=np.float64)


def normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class BruteForcePartialTopK:
    """map_batches stage: partial top-k of each batch vs broadcast queries."""

    def __init__(self, queries_ref, k: int):
        import ray
        q = ray.get(queries_ref)
        self.query_ids = q["ids"]
        self.qmat = normalize(np.asarray(q["vecs"], dtype=np.float64))
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("vec_id").to_pylist())
        mat = normalize(_matrix(batch.column("embedding")))
        sims = np.round(self.qmat @ mat.T, 6)   # (n_query, n_batch)
        out_q, out_n, out_s = [], [], []
        k = min(self.k, sims.shape[1])
        for qi, qid in enumerate(self.query_ids):
            row = sims[qi]
            # exclude self-matches
            mask = ids != qid
            cand_idx = np.nonzero(mask)[0]
            if len(cand_idx) == 0:
                continue
            vals = row[cand_idx]
            take = min(k, len(cand_idx))
            # rank with the final ordering (sim DESC, neighbor_id ASC) so
            # exact ties at the k-th value keep the smaller id — matching
            # the oracle's ORDER BY before candidates are discarded
            part = cand_idx[np.lexsort((ids[cand_idx], -vals))[:take]]
            for i in part:
                out_q.append(int(qid))
                out_n.append(int(ids[i]))
                out_s.append(float(row[i]))
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})


def merge_topk_group(group: pa.Table, k: int) -> pa.Table:
    """groupby(query_id).map_groups: merge partial candidates -> final top-k."""
    qid = group.column("query_id")[0].as_py()
    neigh = np.asarray(group.column("neighbor_id").to_pylist())
    sims = np.asarray(group.column("sim").to_pylist())
    order = np.lexsort((neigh, -sims))[:k]
    return pa.table({
        "query_id": pa.array([qid] * len(order), pa.int64()),
        "neighbor_id": pa.array(neigh[order], pa.int64()),
        "sim": pa.array(np.round(sims[order], 6), pa.float64())})


# ---- blocked exact pair-join (near-dup) -----------------------------------

def blockpair_explode(batch: pa.Table, n_blocks: int) -> pa.Table:
    """Explode each vector row to its ``n_blocks`` unordered block-pair
    groups: block(v) = vec_id % n_blocks; row v joins group
    (min(block, j), max(block, j)) for every j.  Every vector *pair* then
    lands in exactly one group, so the downstream pair search is exact and
    duplicate-free with no full-matrix broadcast — the O(n^2) work is
    sliced into B(B+1)/2 bounded-memory tasks (B scales with n so a group
    = 2 blocks fits a worker's heap)."""
    n = batch.num_rows
    ids = np.asarray(batch.column("vec_id"), dtype=np.int64)
    block = (ids % n_blocks).astype(np.int32)
    j = np.tile(np.arange(n_blocks, dtype=np.int32), n)
    b = np.repeat(block, n_blocks)
    idx = pa.array(np.repeat(np.arange(n), n_blocks))
    return pa.table({
        "ga": pa.array(np.minimum(b, j), pa.int32()),
        "gb": pa.array(np.maximum(b, j), pa.int32()),
        "block": pa.array(b, pa.int32()),
        "vec_id": batch.column("vec_id").take(idx),
        "embedding": batch.column("embedding").take(idx)})


def blockpair_pairs_group(group: pa.Table, threshold: float) -> pa.Table:
    """One block-pair group: vectorized cosine pair search.  Intra-block
    (ga == gb) takes the upper triangle; cross-block pairs left x right."""
    ga = group.column("ga")[0].as_py()
    gb = group.column("gb")[0].as_py()
    ids = np.asarray(group.column("vec_id"), dtype=np.int64)
    blocks = np.asarray(group.column("block"), dtype=np.int64)
    mat = normalize(_matrix(group.column("embedding")))
    if ga == gb:
        sims = np.round(mat @ mat.T, 6)
        ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
        a, b, s = ids[ii], ids[jj], sims[ii, jj]
    else:
        lm, rm = blocks == ga, blocks == gb
        sims = np.round(mat[lm] @ mat[rm].T, 6)
        ii, jj = np.nonzero(sims >= threshold)
        a, b, s = ids[lm][ii], ids[rm][jj], sims[ii, jj]
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    keep = lo != hi
    return pa.table({"id_a": pa.array(lo[keep], pa.int64()),
                     "id_b": pa.array(hi[keep], pa.int64()),
                     "sim": pa.array(s[keep], pa.float64())})


# ---- bounded index-build inputs --------------------------------------------

def bounded_sample(path: str, column: str, cap: int) -> np.ndarray:
    """Read at most ``cap`` rows of one list<float> column by streaming
    parquet row groups and stopping at the cap — the index-build sampler.
    Never materializes the full column: at 10^12 rows this touches the
    first row group(s) of the first file only (O(cap) memory)."""
    import pyarrow.parquet as pq
    pf = pq.ParquetFile(path)
    rows: list = []
    for rb in pf.iter_batches(columns=[column]):
        rows.extend(rb.column(0).to_pylist())
        if len(rows) >= cap:
            break
    return np.asarray(rows[:cap], dtype=np.float64)


def dim_minmax_partial(batch: pa.Table, column: str = "embedding"
                       ) -> pa.Table:
    """map_batches stage: per-batch per-dimension min/max partial — one
    output row per batch, so the downstream reduce is O(n_batches), not
    O(n_rows).  The combiner half of the ann_quantized range aggregate."""
    m = np.asarray(batch.column(column).to_pylist(), dtype=np.float64)
    return pa.table({
        "lo": pa.array([m.min(axis=0).tolist()],
                       pa.list_(pa.float64())),
        "hi": pa.array([m.max(axis=0).tolist()],
                       pa.list_(pa.float64()))})


def dim_minmax_fold(batch: pa.Table) -> pa.Table:
    """Fold stage for the min/max partials: elementwise min of the lo
    rows / max of the hi rows -> ONE row.  Run between repartitions, it
    keeps the driver-side collect O(1) regardless of input block count
    (same tree-fold shape as the join module's hot-key census)."""
    lo = np.asarray(batch.column("lo").to_pylist(), dtype=np.float64)
    hi = np.asarray(batch.column("hi").to_pylist(), dtype=np.float64)
    return pa.table({
        "lo": pa.array([lo.min(axis=0).tolist()],
                       pa.list_(pa.float64())),
        "hi": pa.array([hi.max(axis=0).tolist()],
                       pa.list_(pa.float64()))})


# ---- IVF ------------------------------------------------------------------

def kmeans_fit(vectors: np.ndarray, n_clusters: int, n_iter: int = 8,
               seed: int = 42) -> np.ndarray:
    """Deterministic k-means (first-n init shuffled by seeded RNG)."""
    rng = np.random.RandomState(seed)
    idx = rng.permutation(len(vectors))[:n_clusters]
    centers = vectors[np.sort(idx)].copy()
    for _ in range(n_iter):
        d = ((vectors[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(n_clusters):
            members = vectors[assign == c]
            if len(members):
                centers[c] = members.mean(axis=0)
    return centers


class IvfAssign:
    """map_batches: assign each vector to its nearest coarse centroid."""

    def __init__(self, centers_ref):
        import ray
        self.centers = ray.get(centers_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _matrix(batch.column("embedding"))
        d = ((mat[:, None, :] - self.centers[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1).astype(np.int32)
        return batch.append_column("bucket", pa.array(assign, pa.int32()))


def ivf_bucket_topk_group(group: pa.Table, queries: dict, probes: dict,
                          k: int) -> pa.Table:
    """groupby(bucket).map_groups stage: one inverted-list partition.
    Only queries probing THIS bucket compute similarities here — the
    bucket-partitioned search layout (at scale the assignment is a
    one-time index build written bucket-partitioned, and query fan-out
    touches n_probe partitions instead of every row)."""
    bucket = group.column("bucket")[0].as_py()
    qsel = [i for i, qid in enumerate(queries["ids"])
            if bucket in probes[int(qid)]]
    if not qsel:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "neighbor_id": pa.array([], pa.int64()),
                         "sim": pa.array([], pa.float64())})
    ids = np.asarray(group.column("vec_id"), dtype=np.int64)
    mat = normalize(_matrix(group.column("embedding")))
    qmat = normalize(np.asarray(queries["vecs"], dtype=np.float64))[qsel]
    sims = np.round(qmat @ mat.T, 6)
    out_q, out_n, out_s = [], [], []
    for row, qi in enumerate(qsel):
        qid = int(queries["ids"][qi])
        mask = ids != qid
        cand = np.nonzero(mask)[0]
        if len(cand) == 0:
            continue
        vals = sims[row][cand]
        take = min(k, len(cand))
        part = cand[np.lexsort((ids[cand], -vals))[:take]]
        out_q.extend([qid] * len(part))
        out_n.extend(int(ids[i]) for i in part)
        out_s.extend(float(sims[row][i]) for i in part)
    return pa.table({"query_id": pa.array(out_q, pa.int64()),
                     "neighbor_id": pa.array(out_n, pa.int64()),
                     "sim": pa.array(out_s, pa.float64())})




# ---- random-hyperplane LSH (bucketed cosine search) ------------------------

def lsh_planes(dim: int, n_tables: int, n_bits: int,
               seed: int = 1234) -> np.ndarray:
    """Deterministic random hyperplanes, one (n_bits, dim) block per hash
    table, stacked to (n_tables*n_bits, dim)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables * n_bits, dim))


def _lsh_signatures(mat: np.ndarray, planes: np.ndarray, n_tables: int,
                    n_bits: int) -> np.ndarray:
    """(n, n_tables) int64 signatures: sign pattern of the projections,
    one n_bits-wide code per table."""
    proj = mat @ planes.T > 0.0                      # (n, L*b)
    bits = proj.reshape(len(mat), n_tables, n_bits)
    weights = (np.int64(1) << np.arange(n_bits, dtype=np.int64))
    return (bits * weights).sum(axis=2, dtype=np.int64)


def _lsh_bucket_ids(sigs: np.ndarray, n_bits: int) -> np.ndarray:
    """Table-major global bucket id: (table << n_bits) | signature, so
    every (table, code) cell is a distinct groupby key."""
    n_tables = sigs.shape[1]
    table = np.arange(n_tables, dtype=np.int64)[None, :]
    return (table << np.int64(n_bits)) | sigs


class LshAssign:
    """map_batches index-build stage: replicate each vector into its
    n_tables hash buckets (vectorized sign projections).  The xL blow-up
    is the LSH index layout — at 10^12 scale this is a one-time build
    written bucket-partitioned to storage; the query path then reads only
    probed buckets, never the full table."""

    def __init__(self, planes_ref, n_tables: int, n_bits: int):
        import ray
        self.planes = ray.get(planes_ref)
        self.L = n_tables
        self.b = n_bits

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _matrix(batch.column("embedding"))
        buckets = _lsh_bucket_ids(
            _lsh_signatures(normalize(mat), self.planes, self.L, self.b),
            self.b)                                   # (n, L)
        idx = pa.array(np.repeat(np.arange(len(mat)), self.L))
        return pa.table({
            "bucket": pa.array(buckets.ravel(), pa.int64()),
            "vec_id": batch.column("vec_id").take(idx),
            "embedding": batch.column("embedding").take(idx)})


def lsh_probe_sets(qvecs: np.ndarray, qids, planes: np.ndarray,
                   n_tables: int, n_bits: int,
                   multiprobe: bool = True) -> dict:
    """Per-query probe-bucket sets: the exact bucket in every table plus
    (optionally) every 1-bit flip of its code — standard multi-probe LSH,
    recovering most of the recall lost to boundary-crossing neighbors for
    (1 + n_bits) * n_tables probes per query."""
    sigs = _lsh_signatures(normalize(qvecs), planes, n_tables, n_bits)
    probes = {}
    for i, qid in enumerate(qids):
        buckets = set(_lsh_bucket_ids(sigs[i:i + 1], n_bits).ravel()
                      .tolist())
        if multiprobe:
            for t in range(n_tables):
                base = np.int64(t << n_bits)
                code = sigs[i, t]
                for bit in range(n_bits):
                    buckets.add(int(base | (code ^ (1 << bit))))
        probes[int(qid)] = buckets
    return probes


def lsh_merge_topk_group(group: pa.Table, k: int) -> pa.Table:
    """groupby(query_id).map_groups: merge per-bucket candidates into the
    final top-k, deduplicating neighbors first (a vector shares >1 probed
    bucket with a query whenever several tables agree)."""
    qid = group.column("query_id")[0].as_py()
    neigh = np.asarray(group.column("neighbor_id").to_pylist())
    sims = np.asarray(group.column("sim").to_pylist())
    uniq, first = np.unique(neigh, return_index=True)
    order = np.lexsort((uniq, -sims[first]))[:k]
    return pa.table({
        "query_id": pa.array([qid] * len(order), pa.int64()),
        "neighbor_id": pa.array(uniq[order], pa.int64()),
        "sim": pa.array(np.round(sims[first][order], 6), pa.float64())})
